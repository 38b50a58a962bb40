"""Property tests for the Bloom filter's bit packing and probe-side
bit test (operators/bloom.py): the packed-bytes layout the build
writes must be exactly the layout the codegen bit test reads, for
arbitrary key sets — a disagreement in word/byte/bit addressing is a
silent false-negative generator, the one failure mode a Bloom
pre-filter must never have."""

from __future__ import annotations

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etfconstituentextractor_spark.operators.bloom import (
    bloom_build,
    bloom_params,
    bloom_prefilter,
)


def _bit(blob: bytes, p: int) -> int:
    """Pure-Python reference for the codegen test: little-endian word
    packing puts global bit p at byte p>>3, bit p&7."""
    return (blob[p >> 3] >> (p & 7)) & 1


def test_packing_layout_matches_reference():
    """Hand-built word list -> struct-packed bytes -> every set bit
    readable at byte p>>3, bit p&7 (the addressing bloom_prefilter
    compiles into the plan)."""
    # one word with a known pattern per position class; bit 63 is the
    # sign bit of the signed long Spark's bit_or hands back, exactly
    # as bloom_build receives it
    words = [1 << 0, 1 << 7, 1 << 8, -(1 << 63)]
    blob = struct.pack("<4q", *words)
    assert _bit(blob, 0) == 1  # word 0 bit 0
    assert _bit(blob, 64 + 7) == 1  # word 1 bit 7 -> byte 8
    assert _bit(blob, 128 + 8) == 1  # word 2 bit 8 -> byte 17
    assert _bit(blob, 192 + 63) == 1  # word 3 bit 63 -> byte 31, bit 7
    # and nothing else is set
    assert sum(_bit(blob, p) for p in range(256)) == 4


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=1, max_size=60, unique=True),
    extra=st.lists(st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=60, unique=True),
    fpp=st.sampled_from([1e-2, 1e-4]),
)
def test_no_false_negatives_for_arbitrary_key_sets(spark, keys, extra, fpp):
    """For ANY build key set, every build key passes the prefilter —
    the unconditional-correctness half of the operator, exercised
    across negative keys, sign boundaries, and both registered fpp
    rates (k=7 and k=13 probe families)."""
    m, k = bloom_params(len(keys), fpp)
    build = spark.createDataFrame([(x,) for x in keys], "k bigint")
    blob = bloom_build(build, "k", m_bits=m, k=k)
    probe_keys = sorted(set(keys) | set(extra))
    probe = spark.createDataFrame([(x,) for x in probe_keys], "k bigint")
    passed = {r.k for r in bloom_prefilter(probe, blob, "k", m_bits=m, k=k).collect()}
    assert set(keys) <= passed
