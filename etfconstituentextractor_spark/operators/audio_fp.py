"""Audio fingerprinting (Haitsma & Kalker 2002, "A Highly Robust
Audio Fingerprint System" — the Philips fingerprint): per-frame
32-bit sub-fingerprints from the signs of time- and band-differenced
spectral energies. The audio identity survives lossy compression
(ADPCM here; mp3 in the paper), which text/embedding hashes cannot
give you for audio blobs — the AUDIO analogue of phash.py.

Construction per the paper, sized down to the test corpus: frame the
mono mix (FRAME_S-second windows every HOP_S seconds — wall-clock
framing, so the frame count is rate-independent), Hann-window + FFT,
integrate the magnitude-squared spectrum into ``n_bands + 1``
log-spaced bands over the FIXED [F_LO_HZ, F_HI_HZ] range (band
identity is physical frequency, not bin index — the same clip stored
at 8 kHz and 16 kHz fingerprints alike), then

  bit(n, m) = 1  iff  (E[n,m] − E[n,m+1]) − (E[n−1,m] − E[n−1,m+1]) > 0

(first frame differences against zero). A doc's fingerprint is an
``array<int>`` of per-frame words; two clips match when the bit error
rate (BER) over aligned frames is well under 0.35 (the paper's
threshold — random audio pairs sit at ~0.5).

Spark posture mirrors phash: EXTRACTION is mapInPandas (decode +
FFT, numpy per Arrow batch); MATCHING is pure codegen —
``fingerprint_ber`` is a zip_with + bit_count fold over the two int
arrays, a JVM intrinsic, so the candidate-pair scoring stage never
touches Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FP_SCHEMA = "doc_id bigint, error string, n_frames int, fingerprint array<int>"


#: fixed physical analysis parameters (Haitsma-Kalker posture): frame
#: and hop are WALL-CLOCK durations and band edges are in HZ, so the
#: same content fingerprints identically at any sample rate.
FRAME_S = 0.032
HOP_S = 0.016
F_LO_HZ = 50.0
F_HI_HZ = 3500.0


def _band_edges(frame: int, rate: int, n_bands: int) -> list[int]:
    """n_bands+2 STRICTLY increasing FFT-bin edges, log-spaced over
    [F_LO_HZ, F_HI_HZ]. A forward max(prev+1, target) pass guarantees
    every band integrates at least one distinct bin — np.unique-style
    rounding collapses low-frequency edges (measured: 26 of 34
    survive at frame=256) and padding with a repeated last bin would
    make the top bands' differences constant-zero bits."""
    n_bins = frame // 2 + 1
    if n_bins - 1 < n_bands + 2:
        raise ValueError(f"frame {frame} too small for {n_bands} bands")
    lo = max(1, int(round(F_LO_HZ * frame / rate)))
    hi = min(n_bins - 1, max(lo + n_bands + 1, int(round(F_HI_HZ * frame / rate))))
    targets = np.geomspace(lo, hi, n_bands + 2)
    edges = []
    prev = lo - 1
    for k, t in enumerate(targets):
        e = max(prev + 1, int(round(t)))
        # keep enough headroom that the remaining edges still fit
        e = min(e, hi - (n_bands + 1 - k))
        edges.append(e)
        prev = e
    return edges


def fingerprint_of_samples(
    samples: np.ndarray,
    rate: int,
    *,
    n_bands: int = 32,
) -> list[int]:
    """Per-frame 32-bit sub-fingerprints (as signed int32) of a mono
    float/int array. Empty list when fewer than one frame. Frame/hop
    are FRAME_S/HOP_S seconds and bands are fixed in Hz, so the same
    content matches across sample rates."""
    if rate < 1:
        raise ValueError(f"bad sample rate {rate}")
    x = np.asarray(samples, dtype=np.float64)
    frame = max(2, int(round(FRAME_S * rate)))
    hop = max(1, int(round(HOP_S * rate)))
    if len(x) < frame:
        return []
    n_frames = 1 + (len(x) - frame) // hop
    win = np.hanning(frame)
    edges = _band_edges(frame, rate, n_bands)
    energies = np.zeros((n_frames, n_bands + 1))
    for i in range(n_frames):
        seg = x[i * hop : i * hop + frame] * win
        spec = np.abs(np.fft.rfft(seg)) ** 2
        for b in range(n_bands + 1):
            energies[i, b] = spec[edges[b] : edges[b + 1]].sum()
    words = []
    prev_diff = np.zeros(n_bands)
    for i in range(n_frames):
        diff = energies[i, :-1] - energies[i, 1:]
        bits = diff - prev_diff > 0
        word = 0
        for bit in bits:
            word = (word << 1) | int(bit)
        words.append(word - (1 << 32) if word >= (1 << 31) else word)
        prev_diff = diff
    return words


def audio_fingerprints(blobs: DataFrame, blob_col: str = "blob") -> DataFrame:
    """(doc_id, error, n_frames, fingerprint) over AUD0 raw-PCM and
    ADP0 IMA-ADPCM containers (decoded via operators/adpcm.py).
    Corrupt containers yield error rows (R22)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etfconstituentextractor_spark.operators.adpcm import (
            ADP_MAGIC,
            parse_adpcm,
        )
        from etfconstituentextractor_spark.operators.media import (
            AUD_MAGIC,
            parse_aud0,
        )

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf[blob_col]):
                if blob is None:
                    rows.append((doc_id, "null_blob", None, None))
                    continue
                b = bytes(blob)
                try:
                    if b[:4] == ADP_MAGIC:
                        rate, _, samples = parse_adpcm(b)
                        mix = np.array(samples, dtype=np.float64)
                    elif b[:4] == AUD_MAGIC:
                        rate, nch, pcm = parse_aud0(b)
                        mix = (
                            pcm.reshape(len(pcm) // nch, nch)
                            .astype(np.float64)
                            .mean(axis=1)
                        )
                    else:
                        rows.append((doc_id, "bad_magic", None, None))
                        continue
                except ValueError as exc:
                    rows.append((doc_id, f"bad_container: {exc}", None, None))
                    continue
                fp = fingerprint_of_samples(mix, rate)
                rows.append((doc_id, None, len(fp), fp))
            yield pd.DataFrame(
                rows, columns=["doc_id", "error", "n_frames", "fingerprint"]
            )

    return blobs.select("doc_id", blob_col).mapInPandas(gen, schema=FP_SCHEMA)


def fingerprint_ber(a: str, b: str) -> Column:
    """Bit error rate between two aligned ``array<int>`` fingerprint
    columns — pure codegen: bit_count over per-frame XORs, folded
    JVM-side, divided by total compared bits. NULL when either side
    is empty."""
    common = f"least(size({a}), size({b}))"
    # Spark's bit_count SIGN-EXTENDS its argument to 64 bits
    # (bit_count(CAST(-1 AS INT)) = 64, pinned in tests), so a
    # negative XOR word would count 32 phantom bits — mask to the low
    # 32 after an explicit BIGINT cast.
    bits = (
        f"aggregate(zip_with(slice({a}, 1, {common}), slice({b}, 1, {common}), "
        "(x, y) -> bit_count(CAST(x ^ y AS BIGINT) & 4294967295)), "
        "0, (acc, v) -> acc + v)"
    )
    return F.when(
        F.expr(common) > 0,
        F.expr(bits) / (F.expr(common) * F.lit(32.0)),
    )
