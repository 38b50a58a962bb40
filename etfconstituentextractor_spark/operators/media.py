"""Media transforms over opaque binary columns: feature-extract,
resize, and video frame-sampling plumbing (SURVEY.md §2B "LLM-pipeline
— multimodal": "decode / feature-extract / resize / frame-sample as
Pandas UDFs over mapInPandas").

Division of real vs stubbed, per the multimodal module's contract
(`plans/multimodal.py`): everything Spark-side — schemas, Arrow batch
transfer, 1→N row generation, error rows, partitioning — is REAL and
tested; only the pixel-level math that needs an image library the
container does not ship is stubbed:

- ``byte_histogram_features`` is fully real (no stub): a 16-bin byte
  histogram as ``array<double>`` per blob — the cheap content
  fingerprint real pipelines use for corrupt-file triage and
  modality detection, computed vectorized in numpy per Arrow batch.
- ``resize_blobs`` carries a real container round-trip (header parse,
  new-dimension header write, payload fingerprint) with the pixel
  resample itself stubbed deterministically; requesting a real
  resample raises NotImplementedError, mirroring ``_decode_meta``.
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

#: video-container magic: VID0 | frame_size (8 hex) | n_frames (8 hex) | frames.
VID_MAGIC = b"VID0"

#: number of byte-histogram bins (256 byte values / 16 per bin).
N_BINS = 16

FEATURE_SCHEMA = "doc_id bigint, error string, n_bytes bigint, features array<double>"
RESIZE_SCHEMA = (
    "doc_id bigint, error string, width int, height int, payload_md5 string"
)
FRAME_SCHEMA = (
    "doc_id bigint, error string, frame_idx int, frame_md5 string, frame_len int"
)


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
) -> DataFrame:
    """Resize stage over IMG0 blobs (`plans/multimodal.py` container):
    validates the container, emits the TARGET dimensions plus the
    payload fingerprint. The pixel resample is stubbed (the md5 is of
    the original payload — deterministic and test-checkable);
    ``real_resample=True`` raises, mirroring the decode stub."""
    if real_resample:
        raise NotImplementedError(
            "pixel resampling requires an image library (PIL/opencv); "
            "this environment ships none — metadata-only resize"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                b = bytes(blob)
                if b[:4] != b"IMG0":
                    rows.append((doc_id, "bad_magic", None, None, None))
                    continue
                try:
                    n = int(b[4:12].decode("ascii"), 16)
                    payload = b[12:]
                    if len(payload) != n:
                        raise ValueError(f"length {len(payload)} != header {n}")
                except Exception as exc:
                    rows.append((doc_id, f"bad_header: {exc}", None, None, None))
                    continue
                rows.append(
                    (doc_id, None, width, height, hashlib.md5(payload).hexdigest())
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
                b = bytes(blob)
                if b[:4] != VID_MAGIC:
                    rows.append((doc_id, "bad_magic", None, None, None))
                    continue
                try:
                    size = int(b[4:12].decode("ascii"), 16)
                    count = int(b[12:20].decode("ascii"), 16)
                    frames = b[20:]
                    if len(frames) != size * count:
                        raise ValueError(
                            f"payload {len(frames)} != {size}x{count}"
                        )
                except Exception as exc:
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
