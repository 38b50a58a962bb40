"""IMA-ADPCM codec (operators/adpcm.py): decode must match an
INDEPENDENT scalar implementation of the published standard nibble
for nibble, encode→decode must track the waveform within the
adaptive-step error bound, the ADP0 path through audio_features must
produce features close to the uncompressed AUD0 ground truth, and
malformed containers must surface as error rows."""

from __future__ import annotations

import math
import struct

import pytest

from etfconstituentextractor_spark.operators.adpcm import (
    ADP_MAGIC,
    STEP_TABLE,
    adpcm_decode,
    adpcm_encode,
    pack_adpcm,
    parse_adpcm,
)
from etfconstituentextractor_spark.operators.media import audio_features, pack_audio


def _waveform(n=2000, rate=8000):
    """Deterministic test signal: two tones + a ramp, int16."""
    out = []
    for i in range(n):
        v = (
            0.55 * math.sin(2 * math.pi * 440 * i / rate)
            + 0.25 * math.sin(2 * math.pi * 1310 * i / rate)
            + 0.1 * (i / n)
        )
        out.append(max(-32768, min(32767, int(v * 20000))))
    return out


def _reference_decode(data: bytes, n: int, predictor=0, index=0):
    """Independent scalar IMA decoder, written straight from the 1992
    IMA ADPCM specification text (step table lookup, vpdiff
    accumulation via bit tests, sign bit 8, index table
    [-1,-1,-1,-1,2,4,6,8]) — deliberately NOT sharing code with the
    operator."""
    index_adjust = [-1, -1, -1, -1, 2, 4, 6, 8]
    out = []
    for i in range(n):
        byte = data[i // 2]
        nib = byte & 0x0F if i % 2 == 0 else (byte >> 4) & 0x0F
        step = STEP_TABLE[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        predictor = predictor - diff if nib & 8 else predictor + diff
        predictor = max(-32768, min(32767, predictor))
        index = max(0, min(88, index + index_adjust[nib & 7]))
        out.append(predictor)
    return out


def test_decode_matches_independent_reference():
    samples = _waveform()
    data = adpcm_encode(samples)
    assert adpcm_decode(data, len(samples)) == _reference_decode(data, len(samples))
    # and from a nonzero initial state
    assert adpcm_decode(data, len(samples), 1234, 40) == _reference_decode(
        data, len(samples), 1234, 40
    )


def test_roundtrip_tracks_waveform():
    samples = _waveform()
    decoded = adpcm_decode(adpcm_encode(samples), len(samples))
    rms_sig = math.sqrt(sum(s * s for s in samples) / len(samples))

    def rms_err(skip):
        err = [a - b for a, b in zip(samples[skip:], decoded[skip:])]
        return math.sqrt(sum(e * e for e in err) / len(err))

    # 4:1 lossy with an adaptive step: ~20 dB SNR once the step has
    # ramped (IMA's documented ballpark). Whole-signal bound includes
    # the cold-start attack from step 7; the tail bound pins steady
    # state.
    assert rms_err(0) < rms_sig * 0.10, (rms_err(0), rms_sig)
    assert rms_err(200) < rms_sig * 0.07, (rms_err(200), rms_sig)


def test_container_roundtrip_and_guards():
    samples = _waveform(501)  # odd length exercises the padding nibble
    blob = pack_adpcm(8000, samples)
    rate, nch, got = parse_adpcm(blob)
    assert (rate, nch) == (8000, 1)
    assert got == adpcm_decode(adpcm_encode(samples), len(samples))
    with pytest.raises(ValueError, match="magic|container"):
        parse_adpcm(b"AUD0" + blob[4:])
    with pytest.raises(ValueError, match="truncated"):
        parse_adpcm(blob[:-10])
    with pytest.raises(ValueError, match="mono"):
        parse_adpcm(blob[:12] + b"02" + blob[14:])


def test_audio_features_decodes_adp0_like_aud0(spark):
    """The compressed container's features must approximate the raw
    container's (lossy codec, tight bound), and corrupt ADP0 blobs
    must yield error rows, not task failures."""
    samples = _waveform()
    raw = pack_audio(8000, 1, struct.pack(f"<{len(samples)}h", *samples))
    comp = pack_adpcm(8000, samples)
    df = spark.createDataFrame(
        [(1, raw), (2, comp), (3, ADP_MAGIC + b"zz"), (4, comp[:40])],
        "doc_id bigint, blob binary",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[1]["error"] is None and rows[2]["error"] is None
    assert rows[2]["sample_rate"] == 8000 and rows[2]["n_channels"] == 1
    assert rows[2]["n_frames"] == len(samples)
    # centroid is the loosest bound: ADPCM's quantization noise is
    # broadband, so ~20 dB SNR drags the amplitude-weighted mean
    # frequency visibly upward (measured +14% on this signal)
    for col, tol in [("rms", 0.02), ("zcr", 0.05), ("spectral_centroid_hz", 0.20)]:
        a, b = rows[1][col], rows[2][col]
        assert abs(a - b) <= tol * max(abs(a), 1), (col, a, b)
    assert rows[3]["error"].startswith("bad_adpcm")
    assert rows[4]["error"].startswith("bad_adpcm")


def test_signed_hex_header_rejected():
    """int(b'-1', 16) parses in Python — a sign character in the hex
    header must not sneak a negative index past the range check into
    STEP_TABLE[-1] garbage decoding."""
    blob = bytearray(pack_adpcm(8000, _waveform(100)))
    blob[26:28] = b"-1"  # index field
    with pytest.raises(ValueError, match="hex"):
        parse_adpcm(bytes(blob))
    blob = bytearray(pack_adpcm(8000, _waveform(100)))
    blob[22:26] = b"-999"  # predictor field
    with pytest.raises(ValueError, match="hex"):
        parse_adpcm(bytes(blob))
