"""Z-order layout clustering (operators/zorder.py): the Morton math
must match a pure-Python bit-interleave exactly, bucketing must handle
edges, and the LAYOUT CLAIM must hold on executed-plan scan metrics —
a Z-ordered copy prunes row groups on BOTH dimensions while a
single-column-sorted copy prunes only its own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.zorder import (
    py_z_value,
    write_zordered,
    z_value,
    zorder_layout,
)
from etfconstituentextractor_spark.sources.tables import load


def test_z_value_matches_python_reference(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 4095) for b in (0, 2, 9, 4095)]
    df = spark.createDataFrame(rows, "a bigint, b bigint")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", z_value(F.col("a"), F.col("b"), 12)).collect()
    }
    for (a, b), z in got.items():
        assert z == py_z_value(a, b, 12), (a, b)
    # z is monotone along each axis when the other is fixed
    assert got[(5, 2)] < got[(255, 2)] and got[(5, 2)] < got[(5, 9)]


def test_z_value_rejects_bad_bits(spark):
    df = spark.createDataFrame([(1, 1)], "a bigint, b bigint")
    with pytest.raises(ValueError, match="bits"):
        z_value(F.col("a"), F.col("b"), 17)


def test_zorder_layout_buckets_and_guards(spark):
    df = spark.createDataFrame(
        [(0, 100.0), (50, 100.0), (100, 100.0)], "a bigint, b double"
    )
    out = zorder_layout(df, "a", "b", bits=4).collect()
    # constant b column collapses to bucket 0 -> z has only a-bits set
    for r in out:
        assert r["__z"] == py_z_value(min(r.a * 16 // 100, 15) if r.a < 100 else 15, 0, 4)
    with pytest.raises(ValueError, match="__z"):
        zorder_layout(zorder_layout(df, "a", "b"), "a", "b")


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """The reason to Z-order: cluster lineitem on (l_partkey,
    l_suppkey). The partkey-sorted copy prunes partkey filters but
    reads EVERYTHING for a suppkey filter; the Z-ordered copy prunes
    both (executed-plan scan output metric, same matches each way)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    total = li.count()
    single_p = str(tmp_path / "single")
    zord_p = str(tmp_path / "zord")
    (
        li.repartition(1)
        .sortWithinPartitions("l_partkey")
        .write.option("parquet.block.size", 16 * 1024)
        .parquet(single_p)
    )
    write_zordered(
        li, zord_p, "l_partkey", "l_suppkey", bits=12, block_size=16 * 1024
    )

    def scan_output(path, col, lo, hi):
        df = spark.read.parquet(path).filter(F.col(col).between(lo, hi))
        matches = df.count()
        df.collect()
        leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
        return leaf.metrics().apply("numOutputRows").value(), matches

    # percentile band on the SECOND dimension (suppkey)
    lo, hi = (int(x) for x in li.approxQuantile("l_suppkey", [0.25, 0.30], 0.001))
    s_out, s_match = scan_output(single_p, "l_suppkey", lo, hi)
    z_out, z_match = scan_output(zord_p, "l_suppkey", lo, hi)
    assert s_match == z_match  # identical answers either way
    assert s_out == total, "partkey-sorted copy cannot prune suppkey"
    assert z_out < total * 0.7, (z_out, total)

    # and the FIRST dimension still prunes on the z-ordered copy
    lo, hi = (int(x) for x in li.approxQuantile("l_partkey", [0.25, 0.30], 0.001))
    z1_out, z1_match = scan_output(zord_p, "l_partkey", lo, hi)
    s1_out, s1_match = scan_output(single_p, "l_partkey", lo, hi)
    assert z1_match == s1_match
    assert z1_out < total * 0.7, (z1_out, total)


def test_z_value_n_matches_python_reference_3d(spark):
    """Round 11: the N-dimensional interleave (bit i of dim d at
    position i*N + d) against the pure-Python reference, 3 dims."""
    import random

    from pyspark.sql import functions as F

    from etfconstituentextractor_spark.operators.zorder import (
        py_z_value_n,
        z_value_n,
    )

    rng = random.Random(7)
    bits = 8
    rows = [
        (rng.randrange(1 << bits), rng.randrange(1 << bits), rng.randrange(1 << bits))
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "a int, b int, c int")
    got = df.select(
        "a", "b", "c",
        z_value_n([F.col("a"), F.col("b"), F.col("c")], bits).alias("z"),
    ).collect()
    for r in got:
        assert r["z"] == py_z_value_n([r["a"], r["b"], r["c"]], bits)


def test_z_value_n_2d_fast_path_equals_general(spark):
    from pyspark.sql import functions as F

    from etfconstituentextractor_spark.operators.zorder import py_z_value, z_value_n

    df = spark.createDataFrame([(i, 255 - i) for i in range(256)], "a int, b int")
    got = df.select(
        "a", "b", z_value_n([F.col("a"), F.col("b")], 8).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == py_z_value(r["a"], r["b"], 8)


def test_zorder_layout_caps_bits_for_many_dims(spark):
    """4 dims at the 16-bit default would need 64 key bits — the
    layout must CLAMP to 63//4 = 15 bits/dim (round-11 third review:
    the prior test's arithmetic never reached the clamp branch)."""
    from etfconstituentextractor_spark.operators.zorder import zorder_layout

    df = spark.createDataFrame(
        [(i % 7, (i * 3) % 11, i % 5, i % 3, f"p{i}") for i in range(100)],
        "x int, y int, w int, u int, payload string",
    )
    laid = zorder_layout(df, "x", "y", "w", "u", bits=16)  # 64 > 63 -> 15
    zs = [r["__z"] for r in laid.collect()]
    assert len(zs) == 100
    # 15 bits x 4 dims = 60 key bits: every key fits and is non-negative
    assert all(0 <= z < (1 << 60) for z in zs)
    with __import__("pytest").raises(ValueError, match="at least 2"):
        zorder_layout(df, "x")


def test_z_value_n_two_dims_wide_bits_uses_general_path(spark):
    """Round-11 second review: bits in 17..31 are legal for 2 dims
    under the 63-bit contract — the 16-bit fast path must not leak
    its own cap as a ValueError."""
    from pyspark.sql import functions as F

    from etfconstituentextractor_spark.operators.zorder import py_z_value, z_value_n

    df = spark.createDataFrame(
        [(1 << 18, 3), (123456, 654321)], "a bigint, b bigint"
    )
    got = df.select(
        "a", "b", z_value_n([F.col("a"), F.col("b")], 20).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == py_z_value(r["a"], r["b"], 20)
