"""From-scratch PNG codec (stdlib zlib + numpy) — closes the media
surface's last declared stub for the one compressed format whose
decompression needs no external library (SURVEY.md §2B "LLM-pipeline —
multimodal": the decode step; PNG's pixel stream is DEFLATE, which
``zlib`` ships, plus five per-scanline byte filters restated below
from the public spec, RFC 2083 §6).

Scope: non-interlaced, 8-bit-per-sample images, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA) — the layouts training-data image
pipelines actually see; palette (3), 16-bit, and Adam7 interlace raise
a clear error. Baseline JPEG has its own from-scratch codec
(operators/jpeg.py); WebP/mp3 remain declared stubs (they need external
codec libraries; ``operators/media.py``).

The decoder is the production path (vectorized where the filter's
data dependencies allow: Up/None are whole-row numpy ops, Sub/Avg/
Paeth carry a per-pixel prefix dependency by construction and run a
bounded per-byte loop). The encoder exists for fixtures and sinks; it
can pin a per-row filter type so tests can exercise every decode
branch against hand-computed expectations.

No reference counterpart (the reference never touches binary media);
cited for parity bookkeeping: ETFQuarterlyHoldingsExtractor.py has no
media path at all.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

#: 8-byte PNG file signature (RFC 2083 §3.1).
PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type -> samples per pixel (8-bit depth only).
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunks(b: bytes):
    """Yield (type, payload) for each chunk; stops after IEND.

    CRCs are not verified: the decoder's contract is deterministic
    decode-or-raise on structure, and corrupt pixel data already fails
    at zlib/length checks; a CRC pass would double the byte reads for
    fixtures this code path sees.
    """
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        payload = b[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        yield ctype, payload
        pos += 12 + length  # length + type + payload + crc
        if ctype == b"IEND":
            return
    raise ValueError("missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (RFC 2083 §6.6): nearest of left/up/up-left to
    the linear estimate a + b - c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(b: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, (h, w, c) uint8 array) of a PNG blob.

    Raises ValueError on anything outside the supported profile OR
    malformed data — callers (``media.resize_blobs``) turn that into
    an error ROW, the R22 contract. Lower layers raise zlib.error /
    struct.error / IndexError on corrupt streams; those are converted
    here so ``except ValueError`` really is the whole contract.
    """
    import zlib as _zlib

    try:
        return _decode_png_unchecked(b)
    except ValueError:
        raise
    except (_zlib.error, struct.error, IndexError) as exc:
        raise ValueError(f"malformed PNG: {exc}") from exc


def _decode_png_unchecked(b: bytes) -> tuple[int, int, int, np.ndarray]:
    if b[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, payload in _chunks(b):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported color type {color}")
            if interlace != 0:
                raise ValueError("Adam7 interlace unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(payload)
    if width is None:
        raise ValueError("missing IHDR chunk")
    if width < 1 or height < 1:
        raise ValueError(f"bad dimensions {width}x{height}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"pixel stream {len(raw)} != {height}x(1+{stride}) expected"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — no intra-row dependency: one vector add
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: left-prefix dependency
            cur = np.zeros(stride, np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                up = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:
                    cur[i] = (line[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (line[i] + ((a + up) >> 1)) & 0xFF
                else:
                    cur[i] = (line[i] + _paeth(a, up, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype} on row {y}")
        out[y] = cur.astype(np.uint8)
    return width, height, channels, out.reshape(height, width, channels)


def _filter_row(
    ftype: int, line: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to an unfiltered row (encoder side)."""
    cur = line.astype(np.int32)
    pr = prev.astype(np.int32)
    n = len(cur)
    out = np.zeros(n, np.int32)
    for i in range(n):
        a = cur[i - bpp] if i >= bpp else 0
        up = pr[i]
        c = pr[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = cur[i]
        elif ftype == 1:
            out[i] = cur[i] - a
        elif ftype == 2:
            out[i] = cur[i] - up
        elif ftype == 3:
            out[i] = cur[i] - ((a + up) >> 1)
        elif ftype == 4:
            out[i] = cur[i] - _paeth(a, up, c)
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return (out & 0xFF).astype(np.uint8)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload))
    )


def encode_png(
    img: np.ndarray, row_filters: list[int] | int = 0
) -> bytes:
    """Encode an (h, w, c) uint8 array as a non-interlaced 8-bit PNG.

    ``row_filters`` pins the per-row filter type (int for all rows, or
    one per row) so tests can exercise every decoder branch; real
    encoders pick per-row heuristically, which matters for ratio, not
    correctness.
    """
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    filters = [row_filters] * h if isinstance(row_filters, int) else list(row_filters)
    if len(filters) != h:
        raise ValueError(f"{len(filters)} row filters for {h} rows")
    flat = img.reshape(h, w * c)
    raw = bytearray()
    for y in range(h):
        prev = flat[y - 1] if y > 0 else np.zeros(w * c, np.uint8)
        raw.append(filters[y])
        raw.extend(_filter_row(filters[y], flat[y], prev, c).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
