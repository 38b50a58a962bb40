"""Perceptual image hashing (pHash) — image near-dup detection across
codecs, the multimodal analogue of the text MinHash family: two
encodings of the same picture (PNG vs JPEG q75, resized, slightly
noisy) land within a few bits of Hamming distance, unrelated pictures
~32/64 bits apart.

Construction (the classic DCT pHash): decode → grayscale (ITU-R 601
luma, the same weights as jpeg.py's YCbCr) → integer-boundary
box-AVERAGE to 32×32 (``_box_reduce``; not bilinear point-sampling,
which aliases high frequencies into the threshold — see the helper's
measurement) → 32-point DCT-II
(orthonormal, same construction as jpeg._C at size 32) → keep the
top-left 8×8 low-frequency block → threshold each coefficient against
the MEDIAN of the 63 non-DC coefficients → 64-bit hash (row-major,
MSB first).

Spark posture: hashing is a mapInPandas stage over IMG0 blobs (decode
is Python by necessity — the codecs are ours); MATCHING is pure
codegen — the hash is a bigint column, Hamming distance is
``bit_count(a ^ b)``, a JVM intrinsic in Spark AND DuckDB, so the
pairing stage (self-join within blocking buckets, e.g. the hash's top
byte) never touches Python. ``phash_pairs`` demonstrates the
bucketed pairing; at corpus scale the 8-bit prefix blocks play the
role LSH bands play for text (a true near-dup differs in few bits,
so multi-probe = enumerate prefix neighbors).

No reference counterpart (the reference has no image data).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 32-point orthonormal DCT-II basis, same construction as jpeg._C.
_C32 = np.array([
    [
        (np.sqrt(1 / 32) if k == 0 else np.sqrt(2 / 32))
        * np.cos((2 * n + 1) * k * np.pi / 64)
        for n in range(32)
    ]
    for k in range(32)
])

PHASH_SCHEMA = "doc_id bigint, error string, phash bigint"


def _box_reduce(gray: np.ndarray, n: int = 32) -> np.ndarray:
    """Area-average downsample to n×n: each output pixel is the mean
    of its integer-boundary source box. Averaging (not point
    sampling) is load-bearing for hash STABILITY — bilinear at 32×32
    aliases high frequencies, and that noise lands exactly on the
    median threshold (measured: codec-roundtrip Hamming 6-8 bits with
    bilinear, <=3 with box averaging)."""
    h, w = gray.shape
    ys = [min(h, max(i * h // n, 0)) for i in range(n + 1)]
    xs = [min(w, max(j * w // n, 0)) for j in range(n + 1)]
    out = np.zeros((n, n))
    for i in range(n):
        y0, y1 = ys[i], max(ys[i + 1], ys[i] + 1)
        for j in range(n):
            x0, x1 = xs[j], max(xs[j + 1], xs[j] + 1)
            out[i, j] = gray[min(y0, h - 1) : max(y1, 1), min(x0, w - 1) : max(x1, 1)].mean()
    return out


def phash_of_pixels(img: np.ndarray) -> int:
    """64-bit pHash of an (h, w, c) uint8 array (c in 1..4; alpha
    ignored). Deterministic: IEEE doubles + a median threshold with
    strict > (ties hash to 0)."""
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[2]
    if c >= 3:
        gray = (
            0.299 * img[..., 0].astype(np.float64)
            + 0.587 * img[..., 1].astype(np.float64)
            + 0.114 * img[..., 2].astype(np.float64)
        )
    else:
        gray = img[..., 0].astype(np.float64)
    small = _box_reduce(gray, 32)
    coef = _C32 @ small @ _C32.T
    block = coef[:8, :8].flatten()
    med = float(np.median(block[1:]))
    bits = 0
    for i, v in enumerate(block):
        bits = (bits << 1) | (1 if v > med else 0)
    # two's-complement into a signed 64-bit (Spark LongType)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def phash_blobs(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(doc_id, error, phash) over IMG0-wrapped PNG/JPEG payloads —
    decode via the from-scratch codecs, hash via phash_of_pixels.
    Corrupt or unsupported payloads yield error rows (R22)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etfconstituentextractor_spark.operators.gif import decode_gif, is_gif
        from etfconstituentextractor_spark.operators.jpeg import decode_jpeg
        from etfconstituentextractor_spark.operators.media import parse_img0
        from etfconstituentextractor_spark.operators.png import (
            PNG_SIGNATURE,
            decode_png,
        )
        from etfconstituentextractor_spark.operators.vp8l import decode_vp8l, is_vp8l

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append((doc_id, "null_blob", None))
                    continue
                b = bytes(blob)
                if b[:4] != b"IMG0":
                    rows.append((doc_id, "bad_magic", None))
                    continue
                try:
                    payload = parse_img0(b)
                except ValueError as exc:
                    rows.append((doc_id, f"bad_header: {exc}", None))
                    continue
                try:
                    if payload.startswith(PNG_SIGNATURE):
                        _, _, _, img = decode_png(payload)
                    elif payload[:2] == b"\xff\xd8":
                        img = decode_jpeg(payload)
                    elif is_vp8l(payload):
                        img = decode_vp8l(payload)  # VP8L WebP lossless
                    elif is_gif(payload):
                        img = decode_gif(payload)  # GIF 87a/89a
                    else:
                        rows.append((doc_id, "codec_unsupported", None))
                        continue
                    rows.append((doc_id, None, phash_of_pixels(img)))
                except Exception as exc:
                    rows.append((doc_id, f"bad_image: {exc}", None))
            yield pd.DataFrame(rows, columns=["doc_id", "error", "phash"])

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=PHASH_SCHEMA)


def phash_pairs(hashes: DataFrame, max_hamming: int = 6) -> DataFrame:
    """(doc_a, doc_b, hamming) for hash pairs within ``max_hamming``
    bits, blocked on the hash's top byte — all codegen: the join
    carries (doc_id, bigint) rows and the distance is
    ``bit_count(a ^ b)``, a JVM intrinsic. A true near-dup rarely
    flips a high-order (lowest-frequency) bit, so the prefix block
    keeps recall high while bounding the pairwise stage; exhaustive
    recall would multi-probe neighboring prefixes, exactly like LSH
    band enumeration."""
    h = hashes.filter(F.col("phash").isNotNull()).select(
        "doc_id", "phash", F.expr("shiftright(phash, 56) & 255").alias("bucket")
    )
    a, b = h.alias("a"), h.alias("b")
    ham = F.expr("bit_count(a.phash ^ b.phash)")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


VIDEO_FP_SCHEMA = "doc_id bigint, error string, n_frames int, phashes array<bigint>"


def video_phashes(
    blobs: DataFrame, width: int, height: int, blob_col: str = "blob", every_n: int = 1
) -> DataFrame:
    """(doc_id, error, n_frames, phashes) over VID0 containers whose
    frames are raw width×height GRAYSCALE bitmaps — the VIDEO member
    of the fingerprint family (phash per sampled frame; audio_fp.py
    is the audio member). Containers whose frame_size doesn't equal
    width·height yield error rows, like every other malformed
    container (R22)."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etfconstituentextractor_spark.operators.media import parse_vid0

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append((doc_id, "null_blob", None, None))
                    continue
                try:
                    size, count, frames = parse_vid0(bytes(blob))
                    if size != width * height:
                        raise ValueError(
                            f"frame size {size} != {width}x{height}"
                        )
                except ValueError as exc:
                    rows.append((doc_id, f"bad_container: {exc}", None, None))
                    continue
                hs = []
                for i in range(0, count, every_n):
                    frame = np.frombuffer(
                        frames[i * size : (i + 1) * size], dtype=np.uint8
                    ).reshape(height, width)
                    hs.append(phash_of_pixels(frame))
                rows.append((doc_id, None, len(hs), hs))
            yield pd.DataFrame(rows, columns=["doc_id", "error", "n_frames", "phashes"])

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=VIDEO_FP_SCHEMA)


def video_hamming(a: str, b: str) -> F.Column:
    """Mean per-frame Hamming distance between two aligned
    ``array<bigint>`` frame-hash columns — pure codegen (bit_count on
    64-bit words needs no masking), NULL when either side is empty.
    Same-content videos across mild per-frame distortion sit a few
    bits apart per frame; unrelated videos ~32."""
    common = f"least(size({a}), size({b}))"
    bits = (
        f"aggregate(zip_with(slice({a}, 1, {common}), slice({b}, 1, {common}), "
        "(x, y) -> bit_count(x ^ y)), 0, (acc, v) -> acc + v)"
    )
    return F.when(
        F.expr(common) > 0,
        F.expr(bits) / F.expr(common),
    )
