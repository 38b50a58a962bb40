"""Perceptual image hash (operators/phash.py): the same picture must
hash near-identically across codecs and mild transforms (the whole
point), different pictures must be far apart, the scalar math must
match an independent direct-sum construction, and the pairing stage
must be pure codegen over bigint hashes."""

from __future__ import annotations

import numpy as np
import pytest

from etfconstituentextractor_spark.operators.jpeg import encode_jpeg
from etfconstituentextractor_spark.operators.phash import (
    phash_blobs,
    phash_of_pixels,
    phash_pairs,
)
from etfconstituentextractor_spark.operators.png import encode_png


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _photo(h=48, w=64, seed=7):
    """Deterministic structured 'photo': smooth gradients + blobs —
    NOT noise (pHash is a low-frequency fingerprint; i.i.d. noise has
    no low-frequency identity for it to hash)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (
        110
        + 70 * np.sin(2 * np.pi * (xx / w + 0.3 * np.sin(seed)))
        + 60 * np.cos(2 * np.pi * (yy / h) * (1 + (seed % 3)))
        + 40 * np.exp(-(((xx - w * 0.3) ** 2 + (yy - h * 0.6) ** 2) / (w * h / 8)))
    )
    rgb = np.stack([img, np.roll(img, seed, axis=1), img[::-1]], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def _wrap(payload: bytes) -> bytes:
    return b"IMG0" + f"{len(payload):08x}".encode() + payload


def test_same_image_across_codecs_hashes_close():
    img = _photo()
    from etfconstituentextractor_spark.operators.png import decode_png
    h_ref = phash_of_pixels(img)
    from etfconstituentextractor_spark.operators.jpeg import decode_jpeg
    # <=8 bits is the classic "same image" pHash threshold; measured
    # 2-6 here (vs 14-28 between different images) — quant noise near
    # the median threshold flips a few borderline coefficients.
    h_jpeg = phash_of_pixels(decode_jpeg(encode_jpeg(img, quality=75, subsampling="420")))
    assert _hamming(h_ref, h_jpeg) <= 8, _hamming(h_ref, h_jpeg)
    # mild resize (another common duplicate transform)
    from etfconstituentextractor_spark.operators.media import _resample
    h_small = phash_of_pixels(_resample(img, 40, 30, "bilinear"))
    assert _hamming(h_ref, h_small) <= 8, _hamming(h_ref, h_small)


def test_different_images_hash_far():
    hs = [phash_of_pixels(_photo(seed=s)) for s in (1, 2, 5, 9)]
    for i in range(len(hs)):
        for j in range(i + 1, len(hs)):
            assert _hamming(hs[i], hs[j]) >= 12, (i, j, _hamming(hs[i], hs[j]))


def test_matches_independent_direct_sum_dct():
    """Replay the hash from the definition: 32x32 luma via scalar
    integer-boundary box averaging, direct double-sum DCT, median
    threshold — no shared transform code."""
    img = _photo(seed=3)
    gray = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    )
    h, w = gray.shape
    small = np.zeros((32, 32))
    for i in range(32):
        for j in range(32):
            y0, y1 = i * h // 32, max((i + 1) * h // 32, i * h // 32 + 1)
            x0, x1 = j * w // 32, max((j + 1) * w // 32, j * w // 32 + 1)
            acc, cnt = 0.0, 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    acc += gray[y, x]
                    cnt += 1
            small[i, j] = acc / cnt
    coef = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = (1 / 32) ** 0.5 if u == 0 else (2 / 32) ** 0.5
            cv = (1 / 32) ** 0.5 if v == 0 else (2 / 32) ** 0.5
            acc = 0.0
            for x in range(32):
                for y in range(32):
                    acc += (
                        small[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 64)
                        * np.cos((2 * y + 1) * v * np.pi / 64)
                    )
            coef[u, v] = cu * cv * acc
    flat = coef.flatten()
    med = float(np.median(flat[1:]))
    want = 0
    for vv in flat:
        want = (want << 1) | (1 if vv > med else 0)
    if want >= 1 << 63:
        want -= 1 << 64
    assert phash_of_pixels(img) == want


def test_distributed_phash_and_codegen_pairing(spark):
    imgs = {
        1: _photo(seed=1),
        2: _photo(seed=1),   # same picture, different codec below
        3: _photo(seed=9),
    }
    rows = [
        (1, _wrap(encode_png(imgs[1]))),
        (2, _wrap(encode_jpeg(imgs[2], quality=80))),
        (3, _wrap(encode_jpeg(imgs[3], quality=80))),
        # AVIF-ish ISO-BMFF box: genuinely unsupported (GIF now decodes
        # for real — operators/gif.py — so it no longer fits here)
        (4, _wrap(b"\x00\x00\x00\x1cftypavif\x00\x00\x00\x00avifmif1")),
        (5, None),
        (6, _wrap(b"GIF89a\x00\x01")),  # truncated GIF: decode ERROR
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, blob binary")
    hashes = phash_blobs(df)
    got = {r["doc_id"]: r for r in hashes.collect()}
    assert got[4]["error"] == "codec_unsupported"
    assert got[5]["error"] == "null_blob"
    assert got[6]["error"].startswith("bad_image")
    assert all(got[i]["error"] is None for i in (1, 2, 3))
    # python replay of the distributed hash
    assert got[1]["phash"] == phash_of_pixels(imgs[1])

    pairs = phash_pairs(hashes, max_hamming=6)
    found = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert (1, 2) in found and found[(1, 2)] <= 4
    assert (1, 3) not in found and (2, 3) not in found

    plan = pairs._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan.split("MapInPandas")[-1]
    assert "bit_count" in plan


def test_video_phashes_and_codegen_matching(spark):
    """VIDEO fingerprint: per-frame pHash sequences — the same footage
    under mild per-frame brightness distortion matches at a few bits
    per frame, unrelated footage sits near 32; matching is codegen
    (64-bit bit_count, no masking needed); malformed containers and
    frame-size mismatches yield error rows. The python replay pins the
    distributed hashes exactly."""
    from pyspark.sql import functions as F

    from etfconstituentextractor_spark.operators.media import pack_video
    from etfconstituentextractor_spark.operators.phash import (
        phash_of_pixels,
        video_hamming,
        video_phashes,
    )

    w, h, n_frames = 32, 24, 6

    def frames(seed, shift=0):
        out = []
        for f in range(n_frames):
            img = _photo(h, w, seed=seed + f)[..., 0]  # gray plane, evolving
            out.append(np.clip(img.astype(int) + shift, 0, 255).astype(np.uint8).tobytes())
        return out

    vids = {
        1: pack_video(frames(1)),
        2: pack_video(frames(1, shift=6)),   # same footage, brightened
        3: pack_video(frames(40)),           # different footage
        4: b"VID0zzzzzzzzzzzzzzzz",
        5: pack_video([b"\x00" * 10] * 2),   # wrong frame size
    }
    df = spark.createDataFrame(list(vids.items()), "doc_id bigint, blob binary")
    fps = video_phashes(df, w, h)
    got = {r["doc_id"]: r for r in fps.collect()}
    assert all(got[i]["error"] is None for i in (1, 2, 3))
    assert got[1]["n_frames"] == n_frames
    assert got[4]["error"].startswith("bad_container")
    assert got[5]["error"].startswith("bad_container")
    # python replay of frame 0's hash
    img0 = np.frombuffer(frames(1)[0], dtype=np.uint8).reshape(h, w)
    assert got[1]["phashes"][0] == phash_of_pixels(img0)

    a = fps.filter("doc_id = 1").select(F.col("doc_id").alias("doc_a"), F.col("phashes").alias("pa"))
    b = fps.filter("doc_id in (2, 3)").select(F.col("doc_id").alias("doc_b"), F.col("phashes").alias("pb"))
    scored = a.crossJoin(b).select("doc_a", "doc_b", video_hamming("pa", "pb").alias("mh"))
    out = {r["doc_b"]: r["mh"] for r in scored.collect()}
    assert out[2] <= 8, out
    assert out[3] >= 14, out
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "bit_count" in plan
