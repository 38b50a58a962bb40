"""Baseline JPEG codec (operators/jpeg.py): encode→decode roundtrips
within PSNR bounds at both chroma samplings, a DC-only image decodes
EXACTLY, the DCT/Huffman internals agree with independent scalar
constructions, the metadata probe reads SOF without decoding,
unsupported profiles and truncations fail loudly, and IMG0-wrapped
JPEG payloads flow through resize_blobs(real_resample=True)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from etfconstituentextractor_spark.operators.jpeg import (
    AC_LUMA_SPEC,
    ZIGZAG,
    _fdct,
    _huff_codes,
    _idct,
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)
from etfconstituentextractor_spark.operators.media import _resample, resize_blobs


def _gradient(h=37, w=53):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            ((xx + yy) * 255 // (w + h - 2)).astype(np.uint8),
        ],
        axis=-1,
    )


def _psnr(a, b):
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 99.0 if mse == 0 else 10 * np.log10(255**2 / mse)


def test_roundtrip_psnr_both_samplings():
    img = _gradient()
    for sub, floor in (("444", 40.0), ("420", 33.0)):
        out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=sub))
        assert out.shape == img.shape
        assert _psnr(out, img) > floor, sub
    # quality ladder: better quality, higher fidelity
    p70 = _psnr(decode_jpeg(encode_jpeg(img, quality=70)), img)
    p95 = _psnr(decode_jpeg(encode_jpeg(img, quality=95)), img)
    assert p95 > p70


def test_flat_image_decodes_exactly():
    """A uniform image has only DC energy; the whole pipeline (level
    shift → DCT → quantize → Huffman → inverse) must be lossless for
    it up to YCbCr rounding — grayscale is bit-exact."""
    g = np.full((16, 24), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=85))
    assert out.shape == (16, 24, 1)
    assert np.array_equal(out[..., 0], g)
    rgb = np.full((16, 24, 3), [120, 200, 64], dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(rgb, quality=90))
    assert int(np.max(np.abs(out.astype(int) - rgb.astype(int)))) <= 1


def test_grayscale_and_odd_dimensions():
    yy, xx = np.mgrid[0:33, 0:41]
    g = ((xx * yy) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (33, 41, 1)
    assert _psnr(out[..., 0], g) > 30
    # 1x1 edge case
    one = decode_jpeg(encode_jpeg(np.full((1, 1), 42, dtype=np.uint8)))
    assert one.shape == (1, 1, 1) and int(one[0, 0, 0]) == 42


def test_progressive_decodes_identically_to_baseline():
    """The strongest oracle a progressive codec can have: the SOF2
    scan script (DC first/refine + per-component AC bands at Al=1
    refined to Al=0, per-scan optimized Huffman tables, cross-block
    EOB runs) carries the IDENTICAL quantized coefficients as the
    baseline encoding, so both decodes must be bit-for-bit equal —
    any error in spectral selection, successive approximation,
    EOBRUN accounting, or refinement bit order breaks the equality."""
    import numpy as np

    rng = np.random.default_rng(17)
    cases = [
        ((8, 8, 1), "444"),     # single block, grayscale
        ((16, 16, 3), "444"),   # multi-block color
        ((37, 53, 3), "420"),   # subsampled, ragged dims
        ((20, 28, 3), "420"),   # luma non-interleaved grid < MCU grid
        ((1, 1, 1), "444"),     # degenerate
    ]
    for shape, sub in cases:
        for q in (70, 90):
            img = rng.integers(0, 256, shape, np.uint8)
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=sub))
            prog = decode_jpeg(
                encode_jpeg(img, quality=q, subsampling=sub, progressive=True)
            )
            assert np.array_equal(base, prog), (shape, sub, q)
    # structured content too (gradients exercise long EOB runs)
    grad = _gradient(24, 40)
    assert np.array_equal(
        decode_jpeg(encode_jpeg(grad, quality=85)),
        decode_jpeg(encode_jpeg(grad, quality=85, progressive=True)),
    )


def test_restart_markers_decode_identically_and_validate_sequence():
    """DRI/RSTn support (the camera-file norm): restart-segmented
    encodings carry the same coefficients as the plain encoding, so
    decodes must be exactly equal at ANY interval; the RSTn modulo-8
    sequence is validated and a stray RST without DRI is an error."""
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=80, subsampling="420"))
    for ri in (1, 3, 7, 1000):
        b = encode_jpeg(img, quality=80, subsampling="420", restart_interval=ri)
        assert np.array_equal(plain, decode_jpeg(b)), ri
        if ri == 1:
            assert b"\xff\xd0" in b and b"\xff\xdd" in b  # RST0 + DRI

    bad = bytearray(encode_jpeg(img, quality=80, restart_interval=1))
    i = bad.find(b"\xff\xd0")
    bad[i + 1] = 0xD5
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bytes(bad))

    # RST marker in a stream that declared no interval
    plain_b = bytearray(encode_jpeg(img, quality=80))
    sos = plain_b.find(b"\xff\xda")
    plain_b[sos + 20 : sos + 20] = b"\xff\xd0"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(plain_b))


def test_progressive_stream_shape_and_errors():
    import numpy as np

    img = _gradient(16, 16)
    b = encode_jpeg(img, quality=80, progressive=True)
    assert b[:2] == b"\xff\xd8"
    assert b"\xff\xc2" in b  # SOF2
    assert b.count(b"\xff\xda") >= 5  # multi-scan script
    # dimensions probe reads SOF2 like SOF0
    assert jpeg_dimensions(b)[:2] == (16, 16)
    # truncated progressive stream is an error, not garbage
    with pytest.raises(ValueError):
        decode_jpeg(b[: len(b) // 2])
    # it still decodes through the generic entry point (the media
    # dispatch path: payload sniff says JPEG, decoder picks SOF2)
    out = decode_jpeg(b)
    assert out.shape == decode_jpeg(encode_jpeg(img, quality=80)).shape


def test_dct_matrix_is_orthonormal_and_matches_definition():
    rng_free = np.arange(64, dtype=np.float64).reshape(8, 8) - 31.5
    # independent direct-sum DCT-II
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = (1 / 8) ** 0.5 if u == 0 else (2 / 8) ** 0.5
            cv = (1 / 8) ** 0.5 if v == 0 else (2 / 8) ** 0.5
            acc = 0.0
            for x in range(8):
                for y in range(8):
                    acc += (
                        rng_free[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[u, v] = cu * cv * acc
    assert np.allclose(_fdct(rng_free), want)
    assert np.allclose(_idct(_fdct(rng_free)), rng_free)


def test_huffman_codes_are_canonical_and_prefix_free():
    codes = _huff_codes(AC_LUMA_SPEC)
    assert len(codes) == len(AC_LUMA_SPEC[1])
    as_bits = {f"{c:0{ln}b}" for c, ln in codes.values()}
    assert len(as_bits) == len(codes)
    for a in as_bits:
        for b in as_bits:
            if a is not b:
                assert not b.startswith(a) or a == b
    # zigzag is a permutation of 0..63
    assert sorted(ZIGZAG.tolist()) == list(range(64))


def test_dimensions_probe_and_error_paths():
    img = _gradient(24, 31)
    b = encode_jpeg(img, quality=80, subsampling="420")
    assert jpeg_dimensions(b) == (24, 31, 3)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + b[4:])
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b[:-30])
    # a baseline body mislabeled SOF2 routes to the progressive
    # decoder, whose scan validation rejects the baseline full-band
    # interleaved scan (progressive itself is SUPPORTED since round 6)
    prog = bytearray(b)
    i = prog.find(b"\xff\xc0")
    prog[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(bytes(prog))


def test_resize_blobs_decodes_jpeg_for_real(spark):
    """IMG0-wrapped JPEG payloads must decode + resample through the
    same math as resize_raw, with the md5 of the RESAMPLED pixels; a
    non-codec payload still gets the declared codec_unsupported row."""
    img = _gradient(20, 28)
    payload = encode_jpeg(img, quality=90)
    wrapped = b"IMG0" + f"{len(payload):08x}".encode() + payload
    junk = b"\x00\x01notacodec"
    wrapped_junk = b"IMG0" + f"{len(junk):08x}".encode() + junk
    df = spark.createDataFrame(
        [(1, wrapped), (2, wrapped_junk)], "doc_id bigint, blob binary"
    )
    rows = {
        r["doc_id"]: r
        for r in resize_blobs(df, 10, 8, real_resample=True).collect()
    }
    assert rows[1]["error"] is None
    want = hashlib.md5(
        _resample(decode_jpeg(payload), 10, 8, "bilinear").tobytes()
    ).hexdigest()
    assert rows[1]["payload_md5"] == want
    assert rows[2]["error"].startswith("codec_unsupported")

    # PROGRESSIVE payloads flow through the same dispatch (the JPEG
    # sniff routes on FFD8; the decoder picks SOF2) and, carrying the
    # same coefficients, resample to the identical md5
    prog_payload = encode_jpeg(img, quality=90, progressive=True)
    wrapped_prog = b"IMG0" + f"{len(prog_payload):08x}".encode() + prog_payload
    pdf = spark.createDataFrame([(7, wrapped_prog)], "doc_id bigint, blob binary")
    prow = resize_blobs(pdf, 10, 8, real_resample=True).collect()[0]
    assert prow["error"] is None
    assert prow["payload_md5"] == want
