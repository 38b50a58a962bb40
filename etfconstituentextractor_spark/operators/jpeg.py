"""JPEG codec, from scratch (stdlib + numpy) — closes the
compressed-IMAGE half of the media codec stub for the dominant lossy
format, the way ``operators/png.py`` closed the lossless half and
``operators/adpcm.py`` the compressed-audio half.

Scope: ITU-T T.81 baseline sequential DCT (SOF0/1) AND progressive
DCT (SOF2, Annex G — spectral selection, successive approximation
with DC/AC first + refinement scans, cross-block EOB runs): 8-bit
samples, Huffman entropy coding, 1 (grayscale) or 3 (YCbCr)
components, 4:4:4 and 4:2:0 chroma sampling, arbitrary dimensions
(right/bottom edge replication), JFIF/APP/COM segments skipped, and
RESTART MARKERS in baseline scans (DRI interval → per-segment DC
reset, RSTn modulo-8 sequence validated). NOT handled, surfaced as
ValueError (→ error rows in the mapInPandas layer): arithmetic
coding, 12-bit, hierarchical, restarts inside progressive scans (the
rare combination; baseline restarts are the camera-file norm).

The ENCODER exists to make the decoder testable without any external
image library (the same reason png.py carries one): it writes
standard Annex-K quantization tables (quality-scaled per the IJG
formula) and Annex-K Huffman tables, 4:4:4 or 4:2:0, so any
third-party decoder opens its output — and tests round-trip
encode→decode with PSNR bounds plus an exact DC-only case.
``progressive=True`` emits an SOF2 scan script (per-scan OPTIMIZED
Huffman tables — EOBRUN symbols aren't in the baseline Annex-K set)
carrying the IDENTICAL quantized coefficients as the baseline
encoding, which gives the strongest possible oracle: the two decodes
must be bit-for-bit equal.

Design notes: the DCT is the separable 8×8 orthonormal transform as
two matrix products (numpy); Huffman decode is a bit-cursor over the
de-stuffed scan (FF 00 → FF) with a (length, code)→symbol table; MCU
layout follows per-component sampling factors. Everything is
deterministic — no float trickery beyond IEEE doubles and a final
round/clip to uint8.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

#: Annex-K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

#: separable orthonormal 8-point DCT-II basis: C[k, n].
_C = np.array([
    [
        (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
        * np.cos((2 * n + 1) * k * np.pi / 16)
        for n in range(8)
    ]
    for k in range(8)
])


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _huff_codes(spec: tuple[list[int], list[int]]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    bits, vals = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_lookup(spec: tuple[list[int], list[int]]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(spec).items()}


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → Annex-K table, 100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table.astype(np.int64) * s + 50) // 100
    return np.clip(q, 1, 255)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128, ycc[..., 2] - 128
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _pad_to(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """JPEG bytes for an (h, w) or (h, w, 1|3) uint8 array.

    Grayscale input → 1-component scan; RGB → YCbCr, 4:4:4 or 4:2:0
    per ``subsampling``. Standard tables throughout, so any conformant
    decoder opens the output. ``progressive=True`` emits an SOF2
    stream with a spectral-selection + successive-approximation scan
    script (DC first/refine interleaved, per-component AC bands at
    Al=1 then refined to Al=0) — the SAME quantized coefficients as
    the baseline encoding, so both decode to identical pixels (the
    oracle tests/test_jpeg.py leans on).
    """
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if not 0 <= restart_interval <= 0xFFFF:
        raise ValueError(
            f"restart_interval must be in [0, 65535], got {restart_interval}"
        )
    if progressive and restart_interval:
        raise ValueError(
            "restart markers inside progressive scans are unsupported "
            "(baseline restarts only)"
        )
    if img.ndim == 2:
        img = img[..., None]
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] not in (1, 3):
        raise ValueError(f"need (h, w, 1|3) uint8, got {img.shape} {img.dtype}")
    h, w, ncomp = img.shape
    if h < 1 or w < 1:
        raise ValueError("empty image")
    gray = ncomp == 1

    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)
    sub = 2 if (subsampling == "420" and not gray) else 1

    if gray:
        planes = [img[..., 0].astype(np.float64) - 128]
        qtabs = [ql]
        samp = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(img)
        y = ycc[..., 0]
        cb, cr = ycc[..., 1], ycc[..., 2]
        if sub == 2:
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y - 128, cb - 128, cr - 128]
        qtabs = [ql, qc, qc]
        samp = [(sub, sub), (1, 1), (1, 1)]

    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, b"\x00" + bytes(int(v) for v in ql.flatten()[ZIGZAG]))
    if not gray:
        out += _seg(0xDB, b"\x01" + bytes(int(v) for v in qc.flatten()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for i, (sx, sy) in enumerate(samp):
        sof += struct.pack(">BBB", i + 1, (sx << 4) | sy, 0 if i == 0 else 1)
    out += _seg(0xC2 if progressive else 0xC0, sof)

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return _seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))

    out += dht(0, 0, DC_LUMA_SPEC) + dht(1, 0, AC_LUMA_SPEC)
    if not gray:
        out += dht(0, 1, DC_CHROMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)

    dc_c = [_huff_codes(DC_LUMA_SPEC)] + [_huff_codes(DC_CHROMA_SPEC)] * 2
    ac_c = [_huff_codes(AC_LUMA_SPEC)] + [_huff_codes(AC_CHROMA_SPEC)] * 2

    mcu_w = 8 * hmax
    mcu_h = 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    # quantized coefficient grids, zigzag order, padded to full MCU
    # coverage — SHARED by the baseline and progressive scan bodies so
    # both encodings carry the identical data
    coefs = []
    for p, (sx, sy), q in zip(planes, samp, qtabs):
        p8 = _pad_to(p, 8, 8)
        need_h, need_w = mcus_y * 8 * sy, mcus_x * 8 * sx
        p8 = np.pad(
            p8, ((0, need_h - p8.shape[0]), (0, need_w - p8.shape[1])), mode="edge"
        )
        by_n, bx_n = need_h // 8, need_w // 8
        grid = np.zeros((by_n, bx_n, 64), dtype=np.int64)
        for by in range(by_n):
            for bx in range(bx_n):
                block = p8[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                cq = np.round(_fdct(block) / q).astype(np.int64)
                grid[by, bx] = cq.flatten()[ZIGZAG]
        coefs.append(grid)

    if progressive:
        out += _emit_progressive_scans(
            coefs, samp, (h, w), (hmax, vmax), (mcus_y, mcus_x), dc_c, ac_c, gray
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(planes)])
    for i in range(len(planes)):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    mcus = [(my, mx) for my in range(mcus_y) for mx in range(mcus_x)]
    step = restart_interval or len(mcus)
    for seg_idx in range(0, len(mcus), step):
        if seg_idx:  # RSTn between intervals, n cycling 0..7
            out += bytes([0xFF, 0xD0 + ((seg_idx // step - 1) % 8)])
        wtr = _BitWriter()
        preds = [0] * len(planes)  # DC predictors reset per interval
        for my, mx in mcus[seg_idx : seg_idx + step]:
            for ci, (sx, sy) in enumerate(samp):
                for by in range(sy):
                    for bx in range(sx):
                        zz = coefs[ci][my * sy + by, mx * sx + bx]
                        preds[ci] = _encode_block_zz(
                            wtr, zz, preds[ci], dc_c[ci], ac_c[ci]
                        )
        out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _encode_block_zz(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict
) -> int:
    """Baseline block encoding from an already-zigzagged coefficient
    vector (the shared grid `encode_jpeg` builds)."""
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, ln = dc_codes[cat]
    w.write(code, ln)
    if cat:
        w.write(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | cat]
        w.write(code, ln)
        w.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


# ---------------------------------------------------------------------------
# progressive scan emission (T.81 Annex G / the libjpeg scan logic)
# ---------------------------------------------------------------------------


class _NullWriter:
    """Bit sink for the tally pass (symbol frequencies only)."""

    def write(self, value: int, length: int) -> None:
        pass


class _TallyCodes(dict):
    """Stand-in code map that counts symbol usage during the tally
    pass; every lookup 'encodes' as a 1-bit placeholder."""

    def __init__(self):
        super().__init__()
        self.counts: dict[int, int] = {}

    def __getitem__(self, sym: int):
        self.counts[sym] = self.counts.get(sym, 0) + 1
        return (0, 1)


def _optimized_spec(counts: dict[int, int]) -> tuple[list[int], list[int]]:
    """JPEG-legal optimized Huffman table from symbol frequencies:
    length-limited to 16 (halve-and-retry) with the reserved dummy
    symbol 256 so no real symbol gets the all-1-bits code (the
    libjpeg 'optimize coding' construction), returned as the DHT
    (bits, vals) form."""
    import heapq

    freqs = dict(counts) or {0x00: 1}
    freqs[256] = 1  # reserve the all-ones code
    cur = dict(freqs)
    while True:
        if len(cur) == 1:
            lengths = {next(iter(cur)): 1}
        else:
            heap: list[tuple[int, int, object]] = [
                (c, s, s) for s, c in sorted(cur.items())
            ]
            heapq.heapify(heap)
            tiebreak = 512
            while len(heap) > 1:
                c1, _, n1 = heapq.heappop(heap)
                c2, _, n2 = heapq.heappop(heap)
                heapq.heappush(heap, (c1 + c2, tiebreak, (n1, n2)))
                tiebreak += 1
            lengths = {}
            stack = [(heap[0][2], 0)]
            while stack:
                node, depth = stack.pop()
                if isinstance(node, int):
                    lengths[node] = max(depth, 1)
                else:
                    stack.append((node[0], depth + 1))
                    stack.append((node[1], depth + 1))
        if max(lengths.values()) <= 16:
            break
        cur = {s: (c + 1) // 2 for s, c in cur.items()}
    # canonical order: by (length, symbol) — the dummy 256 sorts last
    # within the max length, so it owns the all-ones code; drop it
    # from the transmitted table (the code space it held stays unused)
    ordered = sorted(lengths.items(), key=lambda kv: (kv[1], kv[0]))
    bits = [0] * 16
    vals: list[int] = []
    for sym, ln in ordered:
        if sym == 256:
            continue
        bits[ln - 1] += 1
        vals.append(sym)
    return bits, vals


class _AcFirstState:
    """Cross-block EOBRUN accumulator for an AC 'first' scan."""

    def __init__(self, w: _BitWriter, codes: dict):
        self.w = w
        self.codes = codes
        self.eobrun = 0

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.codes[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0


def _emit_ac_first_block(st: _AcFirstState, zz, ss: int, se: int, al: int) -> None:
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        vals.append(t if v >= 0 else -t)
    if not any(vals):
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()
        return
    st.flush()
    run = 0
    last = max(i for i, v in enumerate(vals) if v)
    for i, v in enumerate(vals):
        if i > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = st.codes[0xF0]
            st.w.write(code, ln)
            run -= 16
        cat, bits = _magnitude(v)
        code, ln = st.codes[(run << 4) | cat]
        st.w.write(code, ln)
        st.w.write(bits, cat)
        run = 0
    if last < len(vals) - 1:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


class _AcRefineState:
    """Cross-block EOBRUN + buffered correction bits for an AC
    refinement scan."""

    def __init__(self, w: _BitWriter, codes: dict):
        self.w = w
        self.codes = codes
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            code, ln = self.codes[r << 4]
            self.w.write(code, ln)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []


def _emit_ac_refine_block(st: _AcRefineState, zz, ss: int, se: int, al: int) -> None:
    temps = []
    signs = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        temps.append(abs(v) >> al)
        signs.append(1 if v >= 0 else 0)
    eob = -1
    for i, t in enumerate(temps):
        if t == 1:
            eob = i
    run = 0
    br: list[int] = []
    for i, t in enumerate(temps):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            st.flush()
            code, ln = st.codes[0xF0]
            st.w.write(code, ln)
            run -= 16
            for b in br:
                st.w.write(b, 1)
            br = []
        if t > 1:  # already significant: buffer its correction bit
            br.append(t & 1)
            continue
        # newly significant at this bit
        st.flush()
        code, ln = st.codes[(run << 4) | 1]
        st.w.write(code, ln)
        st.w.write(signs[i], 1)
        for b in br:
            st.w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        st.eobrun += 1
        st.pending.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush()


def _comp_block_dims(
    size: tuple[int, int], samp: tuple[int, int], smax: tuple[int, int]
) -> tuple[int, int]:
    """Non-interleaved block grid of a component: ceil over the
    component's own sample dimensions (NOT the MCU-padded grid)."""
    h, w = size
    sx, sy = samp
    hmax, vmax = smax
    cw = -(-(w * sx) // hmax)
    ch = -(-(h * sy) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _emit_progressive_scans(
    coefs, samp, size, smax, mcus, dc_c, ac_c, gray: bool
) -> bytes:
    """The scan script: interleaved DC first (Al=1) + DC refine, then
    per-component AC band scans at Al=1 refined to Al=0 (component 0's
    band split 1-5 / 6-63 for spectral-selection coverage)."""
    mcus_y, mcus_x = mcus
    ncomp = len(coefs)
    out = bytearray()

    def sos_header(comp_ids, ss, se, ah, al) -> bytes:
        seg = bytes([len(comp_ids)])
        for ci in comp_ids:
            td = 0 if ci == 0 else 1
            seg += bytes([ci + 1, (td << 4) | td])
        return _seg(0xDA, seg + bytes([ss, se, (ah << 4) | al]))

    # --- DC first, interleaved, Al=1
    out += sos_header(list(range(ncomp)), 0, 0, 0, 1)
    w = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sx, sy) in enumerate(samp):
                for by in range(sy):
                    for bx in range(sx):
                        dc = int(coefs[ci][my * sy + by, mx * sx + bx][0]) >> 1
                        cat, bits = _magnitude(dc - preds[ci])
                        code, ln = dc_c[ci][cat]
                        w.write(code, ln)
                        if cat:
                            w.write(bits, cat)
                        preds[ci] = dc
    out += w.flush()

    bands = {0: [(1, 5), (6, 63)]}
    for ci in range(1, ncomp):
        bands[ci] = [(1, 63)]

    def ac_scan(ci: int, ss: int, se: int, refine: bool) -> bytes:
        """Two passes: tally symbol frequencies, build an optimized
        per-scan Huffman table (EOBRUN symbols aren't in the Annex-K
        baseline tables), transmit it as a DHT redefinition, then
        emit the scan for real."""
        bh, bw_ = _comp_block_dims(size, samp[ci], smax)
        state_cls = _AcRefineState if refine else _AcFirstState
        al = 0 if refine else 1

        def run(codes, writer):
            st = state_cls(writer, codes)
            emit = _emit_ac_refine_block if refine else _emit_ac_first_block
            for by in range(bh):
                for bx in range(bw_):
                    emit(st, coefs[ci][by, bx], ss, se, al)
            st.flush()

        tally = _TallyCodes()
        run(tally, _NullWriter())
        bits, vals = _optimized_spec(tally.counts)
        td = 0 if ci == 0 else 1
        chunk = _seg(0xC4, bytes([(1 << 4) | td] + bits + vals))
        chunk += sos_header([ci], ss, se, 1 if refine else 0, al)
        w = _BitWriter()
        run(_huff_codes((bits, vals)), w)
        return chunk + w.flush()

    # --- AC first scans, Al=1
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            out += ac_scan(ci, ss, se, refine=False)

    # --- DC refine, interleaved, Ah=1 → Al=0
    out += sos_header(list(range(ncomp)), 0, 0, 1, 0)
    w = _BitWriter()
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (sx, sy) in enumerate(samp):
                for by in range(sy):
                    for bx in range(sx):
                        w.write(int(coefs[ci][my * sy + by, mx * sx + bx][0]) & 1, 1)
    out += w.flush()

    # --- AC refine scans, Ah=1 → Al=0
    for ci in range(ncomp):
        for ss, se in bands[ci]:
            out += ac_scan(ci, ss, se, refine=True)

    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _read_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _parse_dqt(seg: bytes, qtables: dict) -> None:
    """DQT segment → 8×8 int tables (shared by the baseline and
    progressive decoders so precision/length validation can't drift)."""
    p = 0
    while p < len(seg):
        pq, tq = seg[p] >> 4, seg[p] & 0x0F
        if pq != 0:
            raise ValueError("16-bit quant tables unsupported")
        vals = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
        if len(vals) != 64:
            raise ValueError("short DQT")
        t = np.zeros(64, dtype=np.int64)
        t[ZIGZAG] = vals
        qtables[tq] = t.reshape(8, 8)
        p += 65


def _parse_dht(seg: bytes, htables: dict) -> None:
    """DHT segment → (class, id) → decode tables (shared for the same
    reason; progressive streams redefine tables between scans)."""
    p = 0
    while p < len(seg):
        cls, tid = seg[p] >> 4, seg[p] & 0x0F
        bits = list(seg[p + 1 : p + 17])
        n = sum(bits)
        vals = list(seg[p + 17 : p + 17 + n])
        if len(vals) != n:
            raise ValueError("short DHT")
        htables[(cls, tid)] = _huff_lookup((bits, vals))
        p += 17 + n


def decode_jpeg(data: bytes) -> np.ndarray:
    """(h, w, ncomp) uint8 array from baseline JPEG bytes.

    Raises ValueError on anything outside the supported profile (see
    module docstring) or on malformed/truncated streams — including
    streams whose corruption surfaces as struct.error / IndexError in
    the marker parser, converted here so ``except ValueError`` is the
    whole contract.
    """
    try:
        return _decode_jpeg_unchecked(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _decode_jpeg_unchecked(data: bytes) -> np.ndarray:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    scan = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:  # DHT
            _parse_dht(seg, htables)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit samples unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component images unsupported")
            comps = []
            for i in range(nc):
                cid, sfac, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sfac >> 4, sfac & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:  # SOF2: progressive — dedicated decoder
            return _decode_progressive(data)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline and progressive Huffman JPEG are supported"
            )
        elif marker == 0xDD:  # DRI: restart interval in MCUs
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cs, tables >> 4, tables & 0x0F))
            scan = (scomps, data[pos + seglen :])
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("missing SOF/SOS")
    h, w, comps = frame
    scomps, ecs = scan
    if len(scomps) != len(comps):
        raise ValueError("interleaved scan must cover all components")

    # de-stuff the entropy-coded data up to the next marker, splitting
    # into restart segments at RSTn markers when DRI declared one
    # (each segment decodes with fresh DC predictors)
    segments, _ = _destuff(ecs, 0, split_restarts=restart_interval > 0)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for cid, sx, sy, tq in comps:
        planes.append(np.zeros((mcus_y * 8 * sy, mcus_x * 8 * sx)))
    dc_t, ac_t, q_t = [], [], []
    for (cid, sx, sy, tq), (cs, td, ta) in zip(comps, scomps):
        if cs != cid:
            raise ValueError("scan/frame component order mismatch")
        if (0, td) not in htables or (1, ta) not in htables or tq not in qtables:
            raise ValueError("missing Huffman/quant table")
        dc_t.append(htables[(0, td)])
        ac_t.append(htables[(1, ta)])
        q_t.append(qtables[tq])

    seg_iter = iter(segments)
    r = _BitReader(next(seg_iter))
    preds = [0] * len(comps)
    mcu_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_interval == restart_interval:
                # interval boundary: fresh entropy segment, reset DC
                try:
                    r = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("missing restart segment") from None
                preds = [0] * len(comps)
                mcu_in_interval = 0
            mcu_in_interval += 1
            for ci, (cid, sx, sy, tq) in enumerate(comps):
                for by in range(sy):
                    for bx in range(sx):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = _read_symbol(r, dc_t[ci])
                        preds[ci] += _extend(r.read_bits(cat), cat)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(r, ac_t[ci])
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, cat = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(r.read_bits(cat), cat)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * q_t[ci])
                        y0 = (my * sy + by) * 8
                        x0 = (mx * sx + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block

    # upsample to full resolution, crop, color-convert
    out_planes = []
    for p, (cid, sx, sy, tq) in zip(planes, comps):
        if sx != hmax or sy != vmax:
            p = np.repeat(np.repeat(p, vmax // sy, axis=0), hmax // sx, axis=1)
        out_planes.append(p[:h, :w] + 128)
    if len(out_planes) == 1:
        img = out_planes[0][..., None]
    else:
        img = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive decoder (SOF2: spectral selection + successive
# approximation, T.81 Annex G; restart markers are supported in
# BASELINE scans only — inside progressive scans they stay a declared
# error, the rare combination)
# ---------------------------------------------------------------------------


def _destuff(
    data: bytes, pos: int, split_restarts: bool = False
) -> tuple[list[bytes], int]:
    """De-stuffed entropy segments + position of the next marker,
    starting at ``pos``. The ONE FF-stuffing scanner both decoders
    share: with ``split_restarts`` the data splits at RSTn markers
    (modulo-8 sequence validated); without it any RST is an error."""
    segments: list[bytes] = []
    body = bytearray()
    expected_rst = 0
    i = pos
    while i < len(data):
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1] if i + 1 < len(data) else 0xD9
            if nxt == 0x00:
                body.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                if not split_restarts:
                    raise ValueError(
                        "unexpected RST marker (no DRI interval, or inside "
                        "a progressive scan)"
                    )
                if nxt - 0xD0 != expected_rst:
                    raise ValueError(
                        f"restart marker out of sequence: FF{nxt:02x}, "
                        f"expected FFD{expected_rst}"
                    )
                expected_rst = (expected_rst + 1) % 8
                segments.append(bytes(body))
                body = bytearray()
                i += 2
                continue
            break
        body.append(b)
        i += 1
    segments.append(bytes(body))
    return segments, min(i, len(data))


def _scan_segment(data: bytes, pos: int) -> tuple[bytes, int]:
    """Single de-stuffed entropy segment (no restarts allowed) + next
    marker position — the progressive decoder's per-scan body."""
    segments, nxt = _destuff(data, pos, split_restarts=False)
    return segments[0], nxt


def _refine_nonzero(r: _BitReader, coef: np.ndarray, k: int, p1: int) -> None:
    if r.read_bit():
        if (int(coef[k]) & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else -p1


def _decode_dc_scan(r, blocks, order, dc_tables, preds, ah: int, al: int) -> None:
    for ci, zz in order:
        if ah == 0:  # first pass: Huffman-coded diffs in the shifted domain
            cat = _read_symbol(r, dc_tables[ci])
            preds[ci] += _extend(r.read_bits(cat), cat)
            zz[0] = preds[ci] << al
        else:  # refinement: one bit per block
            zz[0] = int(zz[0]) | (r.read_bit() << al)


def _decode_ac_first(r, zz, ac_table, ss, se, al, eobrun: int) -> int:
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _read_symbol(r, ac_table)
        run, cat = sym >> 4, sym & 0x0F
        if cat == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << run) - 1
            if run:
                eobrun += r.read_bits(run)
            break
        k += run
        if k > se:
            raise ValueError("AC index overflow in progressive scan")
        zz[k] = _extend(r.read_bits(cat), cat) << al
        k += 1
    return eobrun


def _decode_ac_refine(r, zz, ac_table, ss, se, al, eobrun: int) -> int:
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _read_symbol(r, ac_table)
            run, cat = sym >> 4, sym & 0x0F
            if cat == 0:
                if run != 15:
                    # NOTE: unlike the first-scan case there is NO -1
                    # here — the tail below must still read the
                    # CURRENT block's correction bits (even for EOB0)
                    # and then consumes one run unit
                    eobrun = 1 << run
                    if run:
                        eobrun += r.read_bits(run)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                if cat != 1:
                    raise ValueError("bad newly-significant category in refinement")
                newval = p1 if r.read_bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(r, zz, k, p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(r, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(data: bytes) -> np.ndarray:
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    coefs = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:
            _parse_dqt(seg, qtables)
        elif marker == 0xC4:
            _parse_dht(seg, htables)
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit samples unsupported")
            if nc not in (1, 3):
                raise ValueError(f"{nc}-component images unsupported")
            comps = []
            for i in range(nc):
                cid, sfac, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, sfac >> 4, sfac & 0x0F, tq))
            frame = (h, w, comps)
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            coefs = [
                np.zeros((mcus_y * sy, mcus_x * sx, 64), dtype=np.int64)
                for _, sx, sy, _ in comps
            ]
            dc_preds = [0] * nc
            comp_tables: list = [None] * nc
        elif marker == 0xDD:
            if struct.unpack(">H", seg[:2])[0] != 0:
                raise ValueError("restart markers unsupported")
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF2")
            h, w, comps = frame
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
                scomps.append((cs, tables >> 4, tables & 0x0F))
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            body, nxt = _scan_segment(data, pos + seglen)
            r = _BitReader(body)
            cids = [c[0] for c in comps]
            sel = [cids.index(cs) for cs, _, _ in scomps]
            if ss == 0:  # DC scan (interleaved or single-component)
                if se != 0:
                    raise ValueError("DC scan must have Se=0")
                for ci, (cs, td, ta) in zip(sel, scomps):
                    if (0, td) not in htables and ah == 0:
                        raise ValueError("missing DC Huffman table")
                    comp_tables[ci] = htables.get((0, td))
                if ah == 0:
                    dc_preds = [0] * len(comps)
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
                mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
                if len(sel) > 1:
                    for my in range(mcus_y):
                        for mx in range(mcus_x):
                            order = []
                            for ci in sel:
                                _, sx, sy, _ = comps[ci]
                                for by in range(sy):
                                    for bx in range(sx):
                                        order.append(
                                            (ci, coefs[ci][my * sy + by, mx * sx + bx])
                                        )
                            _decode_dc_scan(
                                r, None, order, comp_tables, dc_preds, ah, al
                            )
                else:
                    ci = sel[0]
                    _, sx, sy, _ = comps[ci]
                    bh, bw_ = _comp_block_dims((h, w), (sx, sy), (hmax, vmax))
                    for by in range(bh):
                        for bx in range(bw_):
                            _decode_dc_scan(
                                r,
                                None,
                                [(ci, coefs[ci][by, bx])],
                                comp_tables,
                                dc_preds,
                                ah,
                                al,
                            )
            else:  # AC scan: single component only
                if len(sel) != 1:
                    raise ValueError("AC progressive scan must be non-interleaved")
                ci = sel[0]
                _, _, ta = scomps[0]
                if (1, ta) not in htables:
                    raise ValueError("missing AC Huffman table")
                table = htables[(1, ta)]
                _, sx, sy, _ = comps[ci]
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                bh, bw_ = _comp_block_dims((h, w), (sx, sy), (hmax, vmax))
                eobrun = 0
                for by in range(bh):
                    for bx in range(bw_):
                        zz = coefs[ci][by, bx]
                        if ah == 0:
                            eobrun = _decode_ac_first(r, zz, table, ss, se, al, eobrun)
                        else:
                            eobrun = _decode_ac_refine(r, zz, table, ss, se, al, eobrun)
            pos = nxt
            continue
        pos += seglen
    if frame is None or coefs is None:
        raise ValueError("missing SOF2/SOS")

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    out_planes = []
    for (cid, sx, sy, tq), grid in zip(comps, coefs):
        if tq not in qtables:
            raise ValueError("missing quant table")
        q = qtables[tq]
        by_n, bx_n = grid.shape[:2]
        plane = np.zeros((by_n * 8, bx_n * 8))
        for by in range(by_n):
            for bx in range(bx_n):
                coef = np.zeros(64, dtype=np.int64)
                coef[ZIGZAG] = grid[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _idct(
                    coef.reshape(8, 8) * q
                )
        if sx != hmax or sy != vmax:
            plane = np.repeat(np.repeat(plane, vmax // sy, axis=0), hmax // sx, axis=1)
        out_planes.append(plane[:h, :w] + 128)
    if len(out_planes) == 1:
        img = out_planes[0][..., None]
    else:
        img = _ycbcr_to_rgb(np.stack(out_planes, axis=-1))
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def jpeg_dimensions(data: bytes) -> tuple[int, int, int]:
    """(height, width, ncomp) from the SOF header alone — the cheap
    metadata probe a 100 TB pipeline runs instead of full decode.
    ValueError on malformed input (struct.error converted)."""
    try:
        return _jpeg_dimensions_unchecked(data)
    except ValueError:
        raise
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG: {exc}") from exc


def _jpeg_dimensions_unchecked(data: bytes) -> tuple[int, int, int]:
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, h, w, nc = struct.unpack(">BHHB", data[pos + 2 : pos + 8])
            return h, w, nc
        pos += seglen
    raise ValueError("no SOF marker found")
