"""IMA-ADPCM audio codec, from scratch (stdlib only) — closes the
compressed-AUDIO half of the media codec stub the way operators/png.py
closed the lossless-image half: a real decode path for a real
compressed format, leaving only perceptual codecs (mp3 etc., which
genuinely need an external library) as declared stubs.

IMA/DVI ADPCM (IMA Digital Audio Compression Standard, 1992; the
format inside WAV fmt 0x11 and AIFF-C 'ima4'): 16-bit PCM compressed
4:1 to 4-bit nibbles via an adaptive step-size predictor. The decoder
is ~20 lines of integer math — bit-exact, no floating point — so the
distributed decode (mapInPandas in operators/media.py) is replayed
against an independent scalar implementation in tests, nibble for
nibble.

Container (``ADP0``, following the RAW0/AUD0/VID0 hex-header
convention): magic | sample_rate (8 hex) | channels (2 hex, mono
supported) | n_samples (8 hex) | initial predictor (4 hex, int16 two's
complement) | initial index (2 hex) | packed nibbles (low nibble
first; the final byte's high nibble is padding when n_samples is odd).
"""

from __future__ import annotations

ADP_MAGIC = b"ADP0"

#: IMA step-size table (89 entries) — fixed by the standard.
STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]

#: index adjustment per nibble magnitude — fixed by the standard.
INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _decode_nibble(nibble: int, predictor: int, index: int) -> tuple[int, int, int]:
    """One IMA step: (new_sample, new_predictor==new_sample, new_index)."""
    step = STEP_TABLE[index]
    vpdiff = step >> 3
    if nibble & 4:
        vpdiff += step
    if nibble & 2:
        vpdiff += step >> 1
    if nibble & 1:
        vpdiff += step >> 2
    predictor = _clamp16(predictor - vpdiff if nibble & 8 else predictor + vpdiff)
    index = min(88, max(0, index + INDEX_TABLE[nibble & 7]))
    return predictor, predictor, index


def adpcm_decode(
    data: bytes, n_samples: int, predictor: int = 0, index: int = 0
) -> list[int]:
    """Decode packed IMA nibbles (low nibble first) to int16 samples."""
    out = []
    for i in range(n_samples):
        byte = data[i >> 1]
        nibble = (byte & 0x0F) if (i & 1) == 0 else (byte >> 4)
        sample, predictor, index = _decode_nibble(nibble, predictor, index)
        out.append(sample)
    return out


def adpcm_encode(
    samples: list[int], predictor: int = 0, index: int = 0
) -> bytes:
    """Encode int16 samples to packed IMA nibbles (low nibble first).

    The standard greedy quantizer: pick the nibble whose reconstruction
    lands nearest the target by accumulating step fractions — then run
    the DECODER's update so encoder and decoder states stay locked.
    """
    nibbles = []
    for s in samples:
        step = STEP_TABLE[index]
        diff = s - predictor
        nibble = 0
        if diff < 0:
            nibble = 8
            diff = -diff
        if diff >= step:
            nibble |= 4
            diff -= step
        if diff >= step >> 1:
            nibble |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nibble |= 1
        _, predictor, index = _decode_nibble(nibble, predictor, index)
        nibbles.append(nibble)
    if len(nibbles) & 1:
        nibbles.append(0)
    return bytes(
        (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )


def pack_adpcm(
    sample_rate: int, samples: list[int], predictor: int = 0, index: int = 0
) -> bytes:
    """Build an ADP0 container from int16 samples (mono)."""
    header = f"{sample_rate:08x}{1:02x}{len(samples):08x}".encode("ascii")
    state = f"{predictor & 0xFFFF:04x}{index:02x}".encode("ascii")
    return ADP_MAGIC + header + state + adpcm_encode(samples, predictor, index)


def parse_adpcm(b: bytes) -> tuple[int, int, list[int]]:
    """(sample_rate, channels, decoded int16 samples) of an ADP0 blob.

    Raises ValueError on a malformed container (wrong magic, short
    header, or fewer nibble bytes than n_samples requires) — callers
    in the mapInPandas layer surface that as an error ROW, never a
    task failure (the R22 corrupt-input contract).
    """
    if b[:4] != ADP_MAGIC:
        raise ValueError("not an ADP0 container")
    if len(b) < 4 + 18 + 6:
        raise ValueError("short ADP0 header")
    hexdigits = b"0123456789abcdefABCDEF"
    if any(ch not in hexdigits for ch in b[4:28]):
        # int(b'-1', 16) would PARSE — a sign character must not slip
        # a negative index/predictor past the range checks below
        # (STEP_TABLE[-1] silently decodes garbage via negative
        # indexing)
        raise ValueError("bad ADP0 header hex")
    rate = int(b[4:12], 16)
    channels = int(b[12:14], 16)
    n = int(b[14:22], 16)
    predictor = int(b[22:26], 16)
    index = int(b[26:28], 16)
    if channels != 1:
        raise ValueError(f"ADP0 supports mono, got {channels} channels")
    if index > 88:
        raise ValueError(f"ADP0 index {index} out of range")
    if predictor >= 0x8000:
        predictor -= 0x10000
    data = b[28:]
    if len(data) < (n + 1) // 2:
        raise ValueError("truncated ADP0 payload")
    return rate, channels, adpcm_decode(data, n, predictor, index)
