"""Media transforms over opaque binary columns: feature-extract,
resize, and video frame-sampling plumbing (SURVEY.md §2B "LLM-pipeline
— multimodal": "decode / feature-extract / resize / frame-sample as
Pandas UDFs over mapInPandas").

Division of real vs stubbed, per the multimodal module's contract
(`plans/multimodal.py`): everything Spark-side — schemas, Arrow batch
transfer, 1→N row generation, error rows, partitioning — is REAL and
tested, and so is every pixel operation expressible over RAW bitmaps
(numpy suffices; an image LIBRARY is only needed for compressed
codecs):

- ``byte_histogram_features`` is fully real (no stub): a 16-bin byte
  histogram as ``array<double>`` per blob — the cheap content
  fingerprint real pipelines use for corrupt-file triage and
  modality detection, computed vectorized in numpy per Arrow batch.
- ``resize_raw`` is a REAL resampler over ``RAW0`` raw-bitmap
  containers (magic + 8-hex width + 8-hex height + 2-hex channels +
  width·height·channels pixel bytes): nearest-neighbor and bilinear
  interpolation as vectorized numpy index/weight math, verified
  against a from-scratch pure-Python oracle in tests/test_media.py.
- ``resize_blobs`` handles COMPRESSED formats (IMG0-wrapped codec
  payloads): container round-trip is real, and ``real_resample=True``
  decodes + resamples PNG payloads (from-scratch stdlib codec,
  ``operators/png.py``), baseline JPEG payloads (from-scratch codec,
  ``operators/jpeg.py`` — Annex-K Huffman + IDCT + chroma
  upsampling) AND WebP-lossless payloads (from-scratch VP8L codec,
  ``operators/vp8l.py`` — prefix codes + LZ77 + all four transforms)
  for REAL. Compressed audio decodes for real too
  (``operators/adpcm.py`` IMA-ADPCM via ``audio_features``). Only
  codecs whose decompression genuinely needs an external library
  (lossy-VP8/AVIF/mp3) remain declared stubs,
  surfaced as ``codec_unsupported`` error rows.
- ``sample_frames`` is the row-GENERATOR stage (one input blob → one
  row per sampled frame) over a deterministic frame container
  (``VID0`` magic + 8-hex frame size + 8-hex frame count + payload):
  the shape a video pipeline needs, with the frame bytes treated as
  opaque.

At 100 TB the same stages run unchanged: blobs stay in executors
(Arrow batches, never the driver), each stage is embarrassingly
parallel, and callers repartition to cluster parallelism before the
opaque boundary exactly as the document pipeline does
(`operators/documents.py`).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from etfconstituentextractor_spark.operators.adpcm import (
    ADP_MAGIC,
    parse_adpcm,
)

#: video-container magic: VID0 | frame_size (8 hex) | n_frames (8 hex) | frames.
VID_MAGIC = b"VID0"

#: raw-bitmap magic: RAW0 | width (8 hex) | height (8 hex) |
#: channels (2 hex) | width*height*channels pixel bytes (row-major,
#: interleaved channels) — the uncompressed layout pixel math runs on.
RAW_MAGIC = b"RAW0"

#: raw-audio magic: AUD0 | sample_rate (8 hex) | channels (2 hex) |
#: interleaved signed-int16 little-endian PCM samples — the
#: uncompressed layout waveform math runs on.
AUD_MAGIC = b"AUD0"

#: number of byte-histogram bins (256 byte values / 16 per bin).
N_BINS = 16

FEATURE_SCHEMA = "doc_id bigint, error string, n_bytes bigint, features array<double>"
RESIZE_SCHEMA = (
    "doc_id bigint, error string, width int, height int, payload_md5 string"
)
RAW_RESIZE_SCHEMA = (
    "doc_id bigint, error string, width int, height int, blob binary, "
    "payload_md5 string"
)
FRAME_SCHEMA = (
    "doc_id bigint, error string, frame_idx int, frame_md5 string, frame_len int"
)
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, error string, sample_rate int, n_channels int, "
    "n_frames bigint, duration_s double, rms double, peak int, zcr double, "
    "spectral_centroid_hz double"
)
MOTION_SCHEMA = (
    "doc_id bigint, error string, n_frames int, frame_len int, "
    "mean_motion double, max_motion double"
)


def _null_blob_row(doc_id, n_feature_cols: int) -> tuple:
    """Error row for a NULL blob value. Without this guard,
    ``bytes(None)`` raises inside the generator and fails the whole
    task — a single NULL cell would take down the stage, contradicting
    the R22 contract (corrupt input yields error ROWS, never task
    failure)."""
    return (doc_id, "null_blob") + (None,) * n_feature_cols


def pack_audio(sample_rate: int, channels: int, samples: bytes) -> bytes:
    """Build an AUD0 raw-PCM container (int16 LE, interleaved)."""
    if sample_rate < 1 or not 1 <= channels <= 255:
        raise ValueError(f"bad audio params {sample_rate}Hz x{channels}")
    if len(samples) % (2 * channels):
        raise ValueError(
            f"payload {len(samples)} not a whole number of {channels}-channel "
            "int16 frames"
        )
    return AUD_MAGIC + f"{sample_rate:08x}{channels:02x}".encode("ascii") + samples


def parse_aud0(b: bytes) -> tuple[int, int, np.ndarray]:
    """(rate, channels, int16 sample array) of an AUD0 blob — THE
    validation/decode for raw-PCM containers, shared by every consumer
    (audio_features here, audio_fp.audio_fingerprints) so the accept/
    reject behavior can never drift between them. ValueError on a
    malformed container."""
    if b[:4] != AUD_MAGIC:
        raise ValueError("not an AUD0 container")
    try:
        rate = int(b[4:12].decode("ascii"), 16)
        nch = int(b[12:14].decode("ascii"), 16)
    except (ValueError, UnicodeDecodeError):
        raise ValueError("bad AUD0 header hex")
    if rate < 1 or nch < 1:
        raise ValueError(f"bad params {rate}Hz x{nch}")
    payload = b[14:]
    if len(payload) % (2 * nch):
        raise ValueError(f"payload {len(payload)} not whole {nch}-channel frames")
    return rate, nch, np.frombuffer(payload, dtype="<i2")


def parse_vid0(b: bytes) -> tuple[int, int, bytes]:
    """(frame_size, n_frames, frame bytes) of a VID0 container — the
    shared validation for sample_frames, frame_motion, and
    phash.video_phashes. ValueError on a malformed container."""
    if b[:4] != VID_MAGIC:
        raise ValueError("not a VID0 container")
    try:
        size = int(b[4:12].decode("ascii"), 16)
        count = int(b[12:20].decode("ascii"), 16)
    except (ValueError, UnicodeDecodeError):
        raise ValueError("bad VID0 header hex")
    frames = b[20:]
    if len(frames) != size * count:
        raise ValueError(f"payload {len(frames)} != {size}x{count}")
    return size, count, frames


def parse_img0(b: bytes) -> bytes:
    """Codec payload of an IMG0 wrapper (magic + 8-hex length) — the
    shared container validation for resize_blobs and phash_blobs.
    ValueError on a malformed wrapper."""
    if b[:4] != b"IMG0":
        raise ValueError("bad_magic")
    try:
        n = int(b[4:12].decode("ascii"), 16)
    except (ValueError, UnicodeDecodeError):
        raise ValueError("bad IMG0 header hex")
    payload = b[12:]
    if len(payload) != n:
        raise ValueError(f"length {len(payload)} != header {n}")
    return payload


def audio_features(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """REAL waveform feature extraction over AUD0 raw-PCM and ADP0
    IMA-ADPCM containers — the audio leg of the multimodal surface
    (SURVEY.md §2B: "decode / feature-extract ... as Pandas UDFs").
    ADP0 payloads decode through the from-scratch IMA codec
    (operators/adpcm.py) before the same feature math; an external
    library is only needed for perceptual codecs (mp3/ogg):

    - ``rms``: root-mean-square amplitude of the channel-mean mix —
      the loudness feature quality filters threshold on;
    - ``peak``: max absolute raw sample across channels (clipping
      detection);
    - ``zcr``: zero-crossing rate of the mix, crossings / (frames−1)
      — the cheap voiced/unvoiced/noise discriminator;
    - ``spectral_centroid_hz``: amplitude-weighted mean frequency of
      the mix's magnitude spectrum (DC bin excluded) — the
      brightness feature; real FFT math (numpy.fft), checked against
      a from-scratch O(n²) DFT oracle in tests. Null for silent or
      single-frame signals.

    rms/zcr round to 6 dp, the centroid to 4 (module determinism
    convention; FFT summation order differs from a naive DFT at
    ~1e-12 relative). Empty payloads are valid containers with zero
    frames: feature columns are null, duration 0 — presence is the
    caller's concern (generator contract). Corrupt containers yield
    error rows (R22 semantics).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 8))
                    continue
                b = bytes(blob)
                if b[:4] == ADP_MAGIC:
                    # compressed path: from-scratch IMA-ADPCM decode
                    # (operators/adpcm.py) straight into the same PCM
                    # feature math — no external codec library.
                    try:
                        rate, nch, samples = parse_adpcm(b)
                    except ValueError as exc:
                        rows.append(
                            (
                                doc_id,
                                f"bad_adpcm: {exc}",
                                None, None, None, None, None, None, None, None,
                            )
                        )
                        continue
                    pcm = np.array(samples, dtype=np.int16)
                elif b[:4] != AUD_MAGIC:
                    rows.append(
                        (doc_id, "bad_magic", None, None, None, None, None, None,
                         None, None)
                    )
                    continue
                else:
                    try:
                        rate, nch, pcm = parse_aud0(b)
                    except ValueError as exc:
                        rows.append(
                            (
                                doc_id,
                                f"bad_header: {exc}",
                                None, None, None, None, None, None, None, None,
                            )
                        )
                        continue
                n_frames = len(pcm) // nch
                if n_frames == 0:
                    rows.append(
                        (doc_id, None, rate, nch, 0, 0.0, None, None, None, None)
                    )
                    continue
                mix = pcm.reshape(n_frames, nch).astype(np.float64).mean(axis=1)
                rms = float(np.sqrt(np.mean(mix * mix)))
                peak = int(np.max(np.abs(pcm.astype(np.int32))))
                if n_frames > 1:
                    signs = mix >= 0
                    zcr = float(np.count_nonzero(signs[1:] != signs[:-1])) / (
                        n_frames - 1
                    )
                else:
                    zcr = 0.0
                centroid = None
                if n_frames > 1:
                    mags = np.abs(np.fft.rfft(mix))[1:]  # drop DC
                    total = float(mags.sum())
                    if total > 0:
                        freqs = np.arange(1, len(mags) + 1) * rate / n_frames
                        centroid = round(float((freqs * mags).sum() / total), 4)
                rows.append(
                    (
                        doc_id,
                        None,
                        rate,
                        nch,
                        n_frames,
                        round(n_frames / rate, 6),
                        round(rms, 6),
                        peak,
                        round(zcr, 6),
                        centroid,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "error", "sample_rate", "n_channels",
                    "n_frames", "duration_s", "rms", "peak", "zcr",
                    "spectral_centroid_hz",
                ],
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=AUDIO_FEATURE_SCHEMA)


def frame_motion(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Temporal motion metric over VID0 containers: mean absolute
    byte difference between consecutive frames — the cheap scene-
    change / static-content discriminator a video curation pipeline
    thresholds on, computed as one vectorized numpy diff over the
    whole frame stack. Needs >= 2 frames (null metrics otherwise);
    corrupt containers yield error rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 4))
                    continue
                b = bytes(blob)
                if b[:4] != VID_MAGIC:
                    rows.append((doc_id, "bad_magic", None, None, None, None))
                    continue
                try:
                    size, count, frames = parse_vid0(b)
                except ValueError as exc:
                    rows.append((doc_id, f"bad_header: {exc}", None, None, None, None))
                    continue
                if count < 2 or size == 0:
                    rows.append((doc_id, None, count, size, None, None))
                    continue
                stack = np.frombuffer(frames, dtype=np.uint8).reshape(count, size)
                diffs = np.abs(np.diff(stack.astype(np.int16), axis=0)).mean(axis=1)
                rows.append(
                    (
                        doc_id,
                        None,
                        count,
                        size,
                        round(float(diffs.mean()), 6),
                        round(float(diffs.max()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "error", "n_frames", "frame_len",
                    "mean_motion", "max_motion",
                ],
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=MOTION_SCHEMA)


def pack_raw(width: int, height: int, channels: int, payload: bytes) -> bytes:
    """Build a RAW0 raw-bitmap container (row-major, interleaved)."""
    if width < 1 or height < 1 or not 1 <= channels <= 255:
        raise ValueError(f"bad dimensions {width}x{height}x{channels}")
    if len(payload) != width * height * channels:
        raise ValueError(
            f"payload {len(payload)} != {width}x{height}x{channels}"
        )
    return RAW_MAGIC + f"{width:08x}{height:08x}{channels:02x}".encode("ascii") + payload


def _parse_raw(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, (h, w, c) uint8 array) of a RAW0 blob."""
    w = int(b[4:12].decode("ascii"), 16)
    h = int(b[12:20].decode("ascii"), 16)
    c = int(b[20:22].decode("ascii"), 16)
    if w < 1 or h < 1 or c < 1:
        raise ValueError(f"bad dimensions {w}x{h}x{c}")
    payload = b[22:]
    if len(payload) != w * h * c:
        raise ValueError(f"payload {len(payload)} != {w}x{h}x{c}")
    return w, h, c, np.frombuffer(payload, dtype=np.uint8).reshape(h, w, c)


def _resample(img: np.ndarray, out_w: int, out_h: int, method: str) -> np.ndarray:
    """REAL pixel resample, (h, w, c) uint8 → (out_h, out_w, c) uint8.

    Vectorized numpy index/weight math — no image library involved;
    codecs are only needed to DECOMPRESS, not to resample. Half-pixel
    sample centers (the align_corners=False convention shared by PIL,
    OpenCV and torch): source coordinate of output cell i is
    (i + 0.5) · in/out − 0.5, clamped to the edge. Bilinear output
    rounds half-UP via floor(x + 0.5) — an explicit convention so the
    pure-Python oracle in tests replays it bit-for-bit (np.round's
    banker's rounding would be equally valid but harder to restate).
    """
    in_h, in_w = img.shape[0], img.shape[1]
    if method == "nearest":
        ys = np.minimum(
            ((np.arange(out_h) + 0.5) * in_h / out_h).astype(np.int64), in_h - 1
        )
        xs = np.minimum(
            ((np.arange(out_w) + 0.5) * in_w / out_w).astype(np.int64), in_w - 1
        )
        return img[ys][:, xs]
    if method != "bilinear":
        raise ValueError(f"unknown method {method!r}")

    def grid(n_out: int, n_in: int):
        c = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
        c = np.clip(c, 0.0, n_in - 1.0)
        lo = np.floor(c).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        return lo, hi, c - lo

    y0, y1, wy = grid(out_h, in_h)
    x0, x1, wx = grid(out_w, in_w)
    f = img.astype(np.float64)
    wxc = wx[None, :, None]
    top = f[y0][:, x0] * (1.0 - wxc) + f[y0][:, x1] * wxc
    bot = f[y1][:, x0] * (1.0 - wxc) + f[y1][:, x1] * wxc
    out = top * (1.0 - wy)[:, None, None] + bot * wy[:, None, None]
    return np.floor(out + 0.5).astype(np.uint8)


def resize_raw(
    blobs: DataFrame,
    width: int,
    height: int,
    method: str = "bilinear",
    blob_col: str = "blob",
) -> DataFrame:
    """Real resize stage over RAW0 raw-bitmap containers: parses the
    container, resamples the pixels (``_resample``), and emits a new
    RAW0 container at the target dimensions plus the resampled
    payload's fingerprint. Corrupt containers yield error rows (R22
    semantics). One Python call per Arrow batch, never per row."""
    if width < 1 or height < 1:
        raise ValueError(f"bad target {width}x{height}")
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown method {method!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 4))
                    continue
                b = bytes(blob)
                if b[:4] != RAW_MAGIC:
                    rows.append((doc_id, "bad_magic", None, None, None, None))
                    continue
                try:
                    _, _, c, img = _parse_raw(b)
                except Exception as exc:
                    rows.append(
                        (doc_id, f"bad_header: {exc}", None, None, None, None)
                    )
                    continue
                payload = _resample(img, width, height, method).tobytes()
                rows.append(
                    (
                        doc_id,
                        None,
                        width,
                        height,
                        pack_raw(width, height, c, payload),
                        hashlib.md5(payload).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "error", "width", "height", "blob", "payload_md5"],
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=RAW_RESIZE_SCHEMA)


def pack_video(frames: list[bytes]) -> bytes:
    """Build a VID0 container from equal-length frame payloads (test
    fixture helper; a real ingest would land containers as-is)."""
    if not frames:
        return VID_MAGIC + b"00000000" + b"00000000"
    size = len(frames[0])
    if any(len(f) != size for f in frames):
        raise ValueError("all frames must have equal length")
    header = f"{size:08x}{len(frames):08x}".encode("ascii")
    return VID_MAGIC + header + b"".join(frames)


def byte_histogram_features(
    blobs: DataFrame, blob_col: str = "blob", id_col: str = "doc_id"
) -> DataFrame:
    """16-bin byte histogram (L1-normalized) per blob — a REAL feature
    extractor (pure byte math, no media library): numpy bincount per
    Arrow batch, one Python call per batch, never per row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 2))
                    continue
                b = bytes(blob)
                if not b:
                    rows.append((doc_id, "empty_blob", 0, None))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_BINS).astype(np.float64)
                rows.append((doc_id, None, len(b), (hist / hist.sum()).tolist()))
            yield pd.DataFrame(rows, columns=["doc_id", "error", "n_bytes", "features"])

    return blobs.select(
        blobs[id_col].alias("doc_id"), blobs[blob_col].alias(blob_col)
    ).mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_blobs(
    blobs: DataFrame,
    width: int,
    height: int,
    blob_col: str = "blob",
    real_resample: bool = False,
    method: str = "bilinear",
) -> DataFrame:
    """Resize stage over IMG0 blobs (`plans/multimodal.py` container):
    validates the container, emits the TARGET dimensions plus the
    payload fingerprint.

    Default (metadata) mode keeps the pixel resample stubbed — the md5
    is of the ORIGINAL payload, deterministic and test-checkable.
    ``real_resample=True`` decodes PNG payloads (from-scratch stdlib
    codec, ``operators/png.py``: zlib inflate + per-scanline unfilter),
    baseline JPEG payloads (from-scratch codec, ``operators/jpeg.py``:
    Annex-K Huffman decode + dequantize + IDCT + chroma upsampling)
    AND WebP-lossless payloads (from-scratch codec,
    ``operators/vp8l.py``: canonical prefix codes + color cache +
    LZ77 + predictor/color/subtract-green/palette transforms) for
    real, then resamples through the same ``_resample`` math as
    resize_raw — the md5 is then of the RESAMPLED pixel bytes. Only
    payloads in codecs that genuinely need an external library
    (lossy-VP8/AVIF/mp3...) yield the declared
    ``codec_unsupported`` error row."""
    if method not in ("nearest", "bilinear"):
        raise ValueError(f"unknown method {method!r}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etfconstituentextractor_spark.operators.gif import decode_gif, is_gif
        from etfconstituentextractor_spark.operators.jpeg import decode_jpeg
        from etfconstituentextractor_spark.operators.png import (
            PNG_SIGNATURE,
            decode_png,
        )
        from etfconstituentextractor_spark.operators.vp8l import decode_vp8l, is_vp8l

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 3))
                    continue
                b = bytes(blob)
                if b[:4] != b"IMG0":
                    rows.append((doc_id, "bad_magic", None, None, None))
                    continue
                try:
                    payload = parse_img0(b)
                except ValueError as exc:
                    rows.append((doc_id, f"bad_header: {exc}", None, None, None))
                    continue
                if not real_resample:
                    rows.append(
                        (doc_id, None, width, height, hashlib.md5(payload).hexdigest())
                    )
                    continue
                if payload.startswith(PNG_SIGNATURE):
                    try:
                        _, _, _, img = decode_png(payload)
                    except Exception as exc:
                        rows.append((doc_id, f"bad_png: {exc}", None, None, None))
                        continue
                elif payload[:2] == b"\xff\xd8":
                    # baseline JPEG: from-scratch codec
                    # (operators/jpeg.py — Huffman + IDCT, 4:4:4/4:2:0)
                    try:
                        img = decode_jpeg(payload)
                    except Exception as exc:
                        rows.append((doc_id, f"bad_jpeg: {exc}", None, None, None))
                        continue
                elif is_vp8l(payload):
                    # WebP lossless: from-scratch VP8L codec
                    # (operators/vp8l.py — prefix codes + LZ77 + the
                    # four transforms). Lossy 'VP8 ' and non-WEBP RIFF
                    # payloads fail the sniff and stay in the declared
                    # codec_unsupported category below.
                    try:
                        img = decode_vp8l(payload)
                    except Exception as exc:
                        rows.append((doc_id, f"bad_webp: {exc}", None, None, None))
                        continue
                elif is_gif(payload):
                    # GIF 87a/89a: from-scratch codec (operators/gif.py
                    # — LZW + interlace + transparency; first frame)
                    try:
                        img = decode_gif(payload)
                    except Exception as exc:
                        rows.append((doc_id, f"bad_gif: {exc}", None, None, None))
                        continue
                else:
                    rows.append(
                        (
                            doc_id,
                            "codec_unsupported: payload is not PNG, JPEG "
                            "(baseline or progressive), VP8L WebP, or GIF; "
                            "perceptual codecs (AVIF/lossy-VP8/mp3/...) need "
                            "an external library (declared stub)",
                            None, None, None,
                        )
                    )
                    continue
                resampled = _resample(img, width, height, method).tobytes()
                rows.append(
                    (doc_id, None, width, height, hashlib.md5(resampled).hexdigest())
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "error", "width", "height", "payload_md5"]
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=RESIZE_SCHEMA)


def sample_frames(
    blobs: DataFrame, every_n: int, blob_col: str = "blob"
) -> DataFrame:
    """Frame-sampling row generator: each VID0 container yields one row
    per every_n-th frame (frame 0 always included) — the 1→N expansion
    a video pipeline needs, streaming through Arrow batches. Corrupt
    containers yield exactly one error row (reference R22 semantics:
    failures are data, not prints)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append(_null_blob_row(doc_id, 3))
                    continue
                b = bytes(blob)
                if b[:4] != VID_MAGIC:
                    rows.append((doc_id, "bad_magic", None, None, None))
                    continue
                try:
                    size, count, frames = parse_vid0(b)
                except ValueError as exc:
                    rows.append((doc_id, f"bad_header: {exc}", None, None, None))
                    continue
                for i in range(0, count, every_n):
                    frame = frames[i * size : (i + 1) * size]
                    rows.append(
                        (doc_id, None, i, hashlib.md5(frame).hexdigest(), size)
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "error", "frame_idx", "frame_md5", "frame_len"],
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=FRAME_SCHEMA)
