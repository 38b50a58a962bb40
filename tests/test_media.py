"""Media transform plumbing (operators/media.py): byte-histogram
features (real math), REAL raw-bitmap resampling vs a from-scratch
pure-Python oracle, the codec-metadata resize round-trip, and the
frame-sample row generator over the VID0 container."""

from __future__ import annotations

import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.media import (
    byte_histogram_features,
    pack_raw,
    pack_video,
    resize_blobs,
    resize_raw,
    sample_frames,
)


def _img_blob(payload: bytes) -> bytes:
    return b"IMG0" + f"{len(payload):08x}".encode() + payload


def _blob_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, blob binary")


def test_byte_histogram_is_normalized_and_deterministic(spark):
    df = _blob_df(spark, [(1, b"\x00\x00\xff\xf0"), (2, b""), (3, b"abc")])
    out = {r.doc_id: r for r in byte_histogram_features(df).collect()}
    assert out[2].error == "empty_blob" and out[2].features is None
    f1 = out[1].features
    assert len(f1) == 16 and abs(sum(f1) - 1.0) < 1e-12
    # 0x00,0x00 -> bin 0; 0xff,0xf0 -> bin 15
    assert f1[0] == 0.5 and f1[15] == 0.5
    assert out[3].n_bytes == 3


def test_resize_validates_container_and_stubs_resample(spark):
    good = _img_blob(b"pixels")
    bad = b"XXX0whatever"
    out = {
        r.doc_id: r
        for r in resize_blobs(_blob_df(spark, [(1, good), (2, bad)]), 64, 48).collect()
    }
    assert out[1].error is None
    assert (out[1].width, out[1].height) == (64, 48)
    assert out[1].payload_md5 == hashlib.md5(b"pixels").hexdigest()
    assert out[2].error == "bad_magic"
    # real mode: a non-PNG payload is the DECLARED remaining stub —
    # an error row, never a task failure
    real = resize_blobs(
        _blob_df(spark, [(1, good)]), 64, 48, real_resample=True
    ).collect()[0]
    assert real.error.startswith("codec_unsupported")


def _py_resample(pixels, in_w, in_h, c, out_w, out_h, method):
    """From-scratch scalar reimplementation of the resampler contract
    (half-pixel centers, edge clamp, bilinear rounds half-up) —
    independent of numpy broadcasting."""
    def px(x, y, ch):
        return pixels[(y * in_w + x) * c + ch]

    out = []
    for j in range(out_h):
        for i in range(out_w):
            if method == "nearest":
                sy = min(int((j + 0.5) * in_h / out_h), in_h - 1)
                sx = min(int((i + 0.5) * in_w / out_w), in_w - 1)
                out.extend(px(sx, sy, ch) for ch in range(c))
                continue
            cy = min(max((j + 0.5) * in_h / out_h - 0.5, 0.0), in_h - 1.0)
            cx = min(max((i + 0.5) * in_w / out_w - 0.5, 0.0), in_w - 1.0)
            y0, x0 = int(math.floor(cy)), int(math.floor(cx))
            y1, x1 = min(y0 + 1, in_h - 1), min(x0 + 1, in_w - 1)
            wy, wx = cy - y0, cx - x0
            for ch in range(c):
                top = px(x0, y0, ch) * (1 - wx) + px(x1, y0, ch) * wx
                bot = px(x0, y1, ch) * (1 - wx) + px(x1, y1, ch) * wx
                out.append(int(math.floor(top * (1 - wy) + bot * wy + 0.5)))
    return bytes(out)


@pytest.mark.parametrize("method", ["nearest", "bilinear"])
def test_resize_raw_matches_python_oracle(spark, method):
    rng = random.Random(42)
    in_w, in_h, c = 7, 5, 3
    pixels = bytes(rng.randrange(256) for _ in range(in_w * in_h * c))
    blob = pack_raw(in_w, in_h, c, pixels)
    for out_w, out_h in [(3, 4), (14, 10), (7, 5), (1, 1)]:
        got = resize_raw(
            _blob_df(spark, [(1, blob)]), out_w, out_h, method=method
        ).collect()[0]
        want = _py_resample(pixels, in_w, in_h, c, out_w, out_h, method)
        assert got.error is None
        assert (got.width, got.height) == (out_w, out_h)
        assert bytes(got.blob) == pack_raw(out_w, out_h, c, want)
        assert got.payload_md5 == hashlib.md5(want).hexdigest()


def test_resize_raw_identity_and_known_values(spark):
    # identity: same-dimension bilinear resample is exact
    pixels = bytes(range(24))
    blob = pack_raw(4, 2, 3, pixels)
    out = resize_raw(_blob_df(spark, [(1, blob)]), 4, 2).collect()[0]
    assert bytes(out.blob) == blob
    # hand-computed 1-D bilinear upscale: [0, 100] -> [0, 25, 75, 100]
    up = resize_raw(
        _blob_df(spark, [(1, pack_raw(2, 1, 1, bytes([0, 100])))]), 4, 1
    ).collect()[0]
    assert list(bytes(up.blob)[22:]) == [0, 25, 75, 100]
    # hand-computed nearest downscale: [10,20,30,40] -> [20, 40]
    dn = resize_raw(
        _blob_df(spark, [(1, pack_raw(4, 1, 1, bytes([10, 20, 30, 40])))]),
        2,
        1,
        method="nearest",
    ).collect()[0]
    assert list(bytes(dn.blob)[22:]) == [20, 40]


def test_resize_raw_error_rows(spark):
    bad_magic = b"IMG0" + b"x" * 20
    bad_header = b"RAW0" + f"{3:08x}{2:08x}{1:02x}".encode() + b"short"
    out = {
        r.doc_id: r
        for r in resize_raw(
            _blob_df(spark, [(1, bad_magic), (2, bad_header)]), 2, 2
        ).collect()
    }
    assert out[1].error == "bad_magic" and out[1].blob is None
    assert out[2].error.startswith("bad_header")


def test_frame_sampler_expands_rows(spark):
    frames = [bytes([i]) * 8 for i in range(10)]
    vid = pack_video(frames)
    truncated = vid[:-4]  # payload shorter than header claims
    df = _blob_df(spark, [(1, vid), (2, truncated), (3, b"IMG0nope")])
    out = sample_frames(df, every_n=3).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # every 3rd frame from 10: indices 0,3,6,9
    got = sorted(r.frame_idx for r in by_doc[1])
    assert got == [0, 3, 6, 9]
    for r in by_doc[1]:
        assert r.frame_md5 == hashlib.md5(frames[r.frame_idx]).hexdigest()
        assert r.frame_len == 8
    assert len(by_doc[2]) == 1 and by_doc[2][0].error.startswith("bad_header")
    assert len(by_doc[3]) == 1 and by_doc[3][0].error == "bad_magic"


def test_frame_sampler_composes_with_decode_fixture(spark, sf_dir):
    # build containers from the corpus (JVM-side), sample on executors:
    # the full multimodal chain shape — build -> opaque stage -> rows.
    from etfconstituentextractor_spark.sources.tables import load

    d = load(spark, sf_dir, "documents").limit(20)
    frames = 4
    # frame payload: the text bytes, repeated as equal frames
    pad = F.encode(F.rpad(F.substring("text", 1, 16), 16, "x"), "UTF-8")
    blob = F.concat(
        F.encode(F.lit("VID0"), "UTF-8"),
        F.encode(F.lpad(F.hex(F.octet_length(pad)), 8, "0"), "UTF-8"),
        F.encode(F.lpad(F.hex(F.lit(frames)), 8, "0"), "UTF-8"),
        *[pad for _ in range(frames)],
    )
    out = sample_frames(d.select("doc_id", blob.alias("blob")), every_n=2)
    rows = out.collect()
    assert len(rows) == 20 * 2  # frames 0 and 2 per doc
    assert all(r.error is None for r in rows)


def test_media_stages_have_single_python_boundary(spark):
    df = _blob_df(spark, [(1, _img_blob(b"x"))])
    plan = (
        byte_histogram_features(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 1


def _py_audio_features(samples, nch, rate):
    """From-scratch scalar oracle for rms/peak/zcr over int16 frames."""
    frames = [samples[i : i + nch] for i in range(0, len(samples), nch)]
    mix = [sum(f) / nch for f in frames]
    rms = math.sqrt(sum(x * x for x in mix) / len(mix))
    peak = max(abs(s) for s in samples)
    crossings = sum(
        1 for a, b in zip(mix, mix[1:]) if (a >= 0) != (b >= 0)
    )
    zcr = crossings / (len(mix) - 1) if len(mix) > 1 else 0.0
    return round(rms, 6), peak, round(zcr, 6), round(len(mix) / rate, 6)


def test_audio_features_match_python_oracle(spark):
    import struct

    from etfconstituentextractor_spark.operators.media import audio_features, pack_audio

    rng = random.Random(7)
    samples = [rng.randrange(-32768, 32768) for _ in range(2 * 500)]  # stereo
    blob = pack_audio(16000, 2, struct.pack(f"<{len(samples)}h", *samples))
    out = audio_features(_blob_df(spark, [(1, blob)])).collect()[0]
    rms, peak, zcr, dur = _py_audio_features(samples, 2, 16000)
    assert out.error is None
    assert (out.sample_rate, out.n_channels, out.n_frames) == (16000, 2, 500)
    assert (out.rms, out.peak, out.zcr, out.duration_s) == (rms, peak, zcr, dur)


def test_audio_features_known_values_and_errors(spark):
    import struct

    from etfconstituentextractor_spark.operators.media import audio_features, pack_audio

    # mono square wave at half amplitude: rms == amplitude, zcr: signs
    # + + - - + + - - ... -> a crossing every 2 frames
    wave = [1000, 1000, -1000, -1000] * 4
    blob = pack_audio(8, 1, struct.pack(f"<{len(wave)}h", *wave))
    empty = pack_audio(8, 1, b"")
    truncated = b"AUD0" + f"{8:08x}{2:02x}".encode() + b"\x01"  # odd bytes
    out = {
        r.doc_id: r
        for r in audio_features(
            _blob_df(spark, [(1, blob), (2, empty), (3, truncated), (4, b"IMG0x")])
        ).collect()
    }
    assert out[1].rms == 1000.0 and out[1].peak == 1000
    assert out[1].zcr == round(7 / 15, 6) and out[1].duration_s == 2.0
    assert out[2].n_frames == 0 and out[2].rms is None and out[2].error is None
    assert out[3].error.startswith("bad_header")
    assert out[4].error == "bad_magic"


class TestResampleProperties:
    """Hypothesis invariants on the pure-numpy resampler core (no
    Spark job per example, so examples are cheap): bilinear output is
    a convex combination of inputs (range-bounded), constant images
    are fixpoints, nearest only ever emits input values, and same-size
    resampling is the identity."""

    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    dims = st.integers(min_value=1, max_value=9)

    @staticmethod
    def _img(rng_bytes, w, h, c):
        import numpy as np

        need = w * h * c
        data = (rng_bytes * (need // len(rng_bytes) + 1))[:need]
        return np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, c)

    @settings(max_examples=120, deadline=None)
    @given(
        st.binary(min_size=1, max_size=64),
        dims, dims, st.integers(1, 3), dims, dims,
        st.sampled_from(["nearest", "bilinear"]),
    )
    def test_range_bounded_and_dtype(self, data, w, h, c, ow, oh, method):
        from etfconstituentextractor_spark.operators.media import _resample

        img = self._img(data, w, h, c)
        out = _resample(img, ow, oh, method)
        assert out.shape == (oh, ow, c) and out.dtype == img.dtype
        assert out.min() >= img.min() and out.max() <= img.max()
        if method == "nearest":
            assert set(out.ravel().tolist()) <= set(img.ravel().tolist())

    @settings(max_examples=60, deadline=None)
    @given(st.integers(0, 255), dims, dims, dims, dims,
           st.sampled_from(["nearest", "bilinear"]))
    def test_constant_image_is_fixpoint(self, v, w, h, ow, oh, method):
        import numpy as np

        from etfconstituentextractor_spark.operators.media import _resample

        img = np.full((h, w, 1), v, dtype=np.uint8)
        assert (_resample(img, ow, oh, method) == v).all()

    @settings(max_examples=60, deadline=None)
    @given(st.binary(min_size=1, max_size=64), dims, dims,
           st.sampled_from(["nearest", "bilinear"]))
    def test_same_size_is_identity(self, data, w, h, method):
        from etfconstituentextractor_spark.operators.media import _resample

        img = self._img(data, w, h, 2)
        assert (_resample(img, w, h, method) == img).all()


def test_frame_sampler_empty_container_contract(spark):
    """A VALID container with zero frames yields zero rows (one row
    per sampled frame — nothing to sample, no error); presence
    tracking belongs to the caller's left join, like any generator."""
    df = _blob_df(spark, [(1, pack_video([]))])
    assert sample_frames(df, every_n=2).count() == 0


def test_spectral_centroid_matches_naive_dft(spark):
    """The FFT-based centroid vs a from-scratch O(n^2) DFT: same
    magnitude spectrum, same amplitude-weighted mean frequency."""
    import struct

    from etfconstituentextractor_spark.operators.media import audio_features, pack_audio

    rng = random.Random(11)
    n, rate = 64, 8000
    samples = [rng.randrange(-2000, 2000) for _ in range(n)]
    blob = pack_audio(rate, 1, struct.pack(f"<{n}h", *samples))
    got = audio_features(_blob_df(spark, [(1, blob)])).collect()[0]

    num = den = 0.0
    for k in range(1, n // 2 + 1):
        re = sum(samples[t] * math.cos(2 * math.pi * k * t / n) for t in range(n))
        im = -sum(samples[t] * math.sin(2 * math.pi * k * t / n) for t in range(n))
        mag = math.hypot(re, im)
        num += (k * rate / n) * mag
        den += mag
    assert got.spectral_centroid_hz == round(num / den, 4)


def test_spectral_centroid_pure_tone_and_silence(spark):
    import struct

    from etfconstituentextractor_spark.operators.media import audio_features, pack_audio

    n, rate = 32, 3200
    # pure tone at bin 4 -> centroid exactly 4 * rate / n = 400 Hz
    tone = [int(1000 * math.cos(2 * math.pi * 4 * t / n)) for t in range(n)]
    silent = [0] * n
    blobs = [
        (1, pack_audio(rate, 1, struct.pack(f"<{n}h", *tone))),
        (2, pack_audio(rate, 1, struct.pack(f"<{n}h", *silent))),
    ]
    out = {r.doc_id: r for r in audio_features(_blob_df(spark, blobs)).collect()}
    assert abs(out[1].spectral_centroid_hz - 400.0) < 0.5
    assert out[2].spectral_centroid_hz is None and out[2].rms == 0.0


def test_frame_motion_hand_computed(spark):
    from etfconstituentextractor_spark.operators.media import frame_motion

    # frames: [0,0], [10,30], [10,30] -> diffs: mean(|10|,|30|)=20, then 0
    frames = [bytes([0, 0]), bytes([10, 30]), bytes([10, 30])]
    vid = pack_video(frames)
    static = pack_video([bytes([7, 7])] * 4)
    single = pack_video([bytes([1, 2])])
    out = {
        r.doc_id: r
        for r in frame_motion(
            _blob_df(spark, [(1, vid), (2, static), (3, single), (4, b"IMG0x")])
        ).collect()
    }
    assert (out[1].mean_motion, out[1].max_motion) == (10.0, 20.0)
    assert (out[2].mean_motion, out[2].max_motion) == (0.0, 0.0)
    assert out[3].mean_motion is None and out[3].n_frames == 1
    assert out[4].error == "bad_magic"


def test_null_blob_yields_error_row_not_task_failure(spark):
    """A NULL blob cell must become a 'null_blob' error ROW (R22:
    failures are data) — bytes(None) would otherwise raise inside the
    generator and fail the whole task, taking every other row in the
    batch down with it."""
    from etfconstituentextractor_spark.operators.media import (
        audio_features,
        byte_histogram_features,
        frame_motion,
        resize_blobs,
        resize_raw,
        sample_frames,
    )

    df = spark.createDataFrame(
        [(1, None), (2, pack_video([bytes([5, 5])] * 3))],
        "doc_id int, blob binary",
    )
    for op in (
        lambda d: audio_features(d),
        lambda d: frame_motion(d),
        lambda d: resize_raw(d, 2, 2),
        lambda d: byte_histogram_features(d),
        lambda d: resize_blobs(d, 2, 2),
        lambda d: sample_frames(d, 1),
    ):
        rows = {r.doc_id: r for r in op(df).collect()}
        assert rows[1].error == "null_blob", rows[1]
        assert 2 in rows  # the good row survived the batch
