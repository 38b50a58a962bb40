"""Deterministic-HLL sketch (operators/hll.py): the Spark build, the
DuckDB spelling, and a from-scratch pure-Python replay must agree
bit-for-bit on registers, dyadic sums, and estimates — that triple
agreement is what lets q36 sit under the full value-hash oracle."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

from etfconstituentextractor_spark.operators.hll import (
    _consts,
    hll_distinct,
    sql_hll_distinct,
)


def _py_hll(values, p):
    """Pure-Python replay of the identical construction."""
    m, wbits, rmax, alpha_num = _consts(p)
    regs: dict[int, int] = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        b = h & (m - 1)
        w = h >> p
        rho = rmax if w == 0 else wbits - w.bit_length() + 1
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (rmax - r) for r in regs.values()) + (m - len(regs)) * (1 << rmax)
    zeros = m - len(regs)
    e_raw = alpha_num / s
    if e_raw <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    else:
        est = e_raw
    return round(est, 4), s, zeros


@pytest.mark.parametrize("p,n", [(12, 2000), (8, 500), (12, 40)])
def test_hll_three_way_agreement(spark, p, n):
    vals = [(i % 7, f"v{i}") for i in range(n)]
    df = spark.createDataFrame(vals, "g int, v string")
    got = {
        r.g: (r.hll_est, r.hll_sum_dyadic, r.hll_zero_regs)
        for r in hll_distinct(df, ["g"], "v", p=p).collect()
    }
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(vals, columns=["g", "v"]))
    sql = sql_hll_distinct("t", "g", "v", p=p)
    ducked = {r[0]: (r[1], r[2], r[3]) for r in con.sql(sql).fetchall()}
    for g in range(7):
        expected = _py_hll([v for gg, v in vals if gg == g], p)
        assert got[g] == expected, (g, got[g], expected)
        assert ducked[g] == expected, (g, ducked[g], expected)


def test_hll_accuracy_and_null_handling(spark):
    # 5000 distinct + nulls: estimate within ~3 sigma (3*1.04/sqrt(m))
    # of truth, and NULLs never touch a register (sketch state equals
    # the null-free build's).
    vals = [(0, f"doc-{i}") for i in range(5000)] + [(0, None)] * 50
    df = spark.createDataFrame(vals, "g int, v string")
    row = hll_distinct(df, ["g"], "v", p=12).collect()[0]
    sigma = 1.04 / math.sqrt(4096)
    assert abs(row.hll_est - 5000) <= 3 * sigma * 5000, row
    clean = hll_distinct(df.filter("v IS NOT NULL"), ["g"], "v", p=12).collect()[0]
    assert (row.hll_sum_dyadic, row.hll_zero_regs) == (
        clean.hll_sum_dyadic,
        clean.hll_zero_regs,
    )


def test_hll_registers_merge_to_full_corpus_state(spark):
    """The at-scale claim in the docstring: HLL registers are
    mergeable by max. Build the sketch over two disjoint halves,
    merge register-wise in Python, and the merged dyadic sum + zero
    count must equal the one-pass full-corpus build — which is what
    makes partial (map-side / per-partition / per-day) sketches
    combinable without rescanning."""
    m, _, rmax, _ = _consts(12)
    vals = [(0, f"v{i}") for i in range(3000)]
    df = spark.createDataFrame(vals, "g int, v string")

    def regs_of(rows):
        # reconstruct registers from the pure-Python replay
        import hashlib as h

        regs: dict[int, int] = {}
        for _, v in rows:
            x = int(h.md5(v.encode()).hexdigest()[:15], 16)
            b = x & (m - 1)
            w = x >> 12
            rho = rmax if w == 0 else (60 - 12) - w.bit_length() + 1
            regs[b] = max(regs.get(b, 0), rho)
        return regs

    half_a, half_b = vals[:1500], vals[1500:]
    merged: dict[int, int] = {}
    for part in (regs_of(half_a), regs_of(half_b)):
        for b, r in part.items():
            merged[b] = max(merged.get(b, 0), r)
    merged_sum = sum(1 << (rmax - r) for r in merged.values()) + (
        m - len(merged)
    ) * (1 << rmax)

    full = hll_distinct(df, ["g"], "v", p=12).collect()[0]
    assert full.hll_sum_dyadic == merged_sum
    assert full.hll_zero_regs == m - len(merged)


def test_hll_rejects_bad_precision(spark):
    df = spark.createDataFrame([(1, "a")], "g int, v string")
    with pytest.raises(ValueError):
        hll_distinct(df, ["g"], "v", p=3)
