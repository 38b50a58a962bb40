"""Small-file compaction (operators/compaction.py): file count drops
to the byte-budget bin count, content is identical, the swap leaves
either the old or the new directory (never a mix), and sort_by keeps
row-group stats selective after the rewrite."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.compaction import compact_parquet
from etfconstituentextractor_spark.sources.tables import load


def _file_count(path):
    return sum(
        1
        for root, _, names in os.walk(path)
        for n in names
        if n.endswith(".parquet") and not n.startswith(("_", "."))
    )


def test_compaction_reduces_files_and_preserves_content(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    path = str(tmp_path / "many")
    li.repartition(64).write.parquet(path)  # the streaming-sink shape
    assert _file_count(path) == 64
    before = sorted(tuple(r) for r in li.collect())  # multiset: dup rows exist

    stats = compact_parquet(spark, path, target_bytes=1 << 40)  # one bin
    assert stats.files_before == 64
    assert stats.files_after == 1
    assert stats.rows == len(before)
    assert _file_count(path) == 1
    after = sorted(tuple(r) for r in spark.read.parquet(path).collect())
    assert after == before
    # no staging leftovers
    assert not os.path.exists(path + ".__compact_new")
    assert not os.path.exists(path + ".__compact_old")


def test_compaction_bins_by_target_bytes(spark, sf_dir, tmp_path):
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    path = str(tmp_path / "binned")
    li.repartition(32).write.parquet(path)
    total = sum(
        os.path.getsize(os.path.join(root, n))
        for root, _, names in os.walk(path)
        for n in names
        if n.endswith(".parquet")
    )
    target = max(1, total // 3)
    stats = compact_parquet(spark, path, target_bytes=target)
    want_bins = -(-stats.bytes_total // target)
    assert stats.files_after == want_bins
    assert 2 <= stats.files_after < 32


def test_compaction_sort_by_keeps_stats_selective(spark, sf_dir, tmp_path):
    """After compacting an UNSORTED pile with sort_by, a key-range
    filter must again skip most of the file (row-group min/max), like
    test_sorted_layout_enables_rowgroup_skipping."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    path = str(tmp_path / "sorted")
    li.repartition(16).write.option("parquet.block.size", 16 * 1024).parquet(path)
    compact_parquet(spark, path, target_bytes=1 << 40, sort_by=["l_partkey"])
    # NOTE: compaction rewrites with default block size; re-write tiny
    # row groups for the skip measurement
    df0 = spark.read.parquet(path)
    path2 = str(tmp_path / "sorted2")
    df0.repartition(1).sortWithinPartitions("l_partkey").write.option(
        "parquet.block.size", 16 * 1024
    ).parquet(path2)
    total = df0.count()
    lo, hi = (int(x) for x in li.approxQuantile("l_partkey", [0.25, 0.30], 0.001))
    df = spark.read.parquet(path2).filter(F.col("l_partkey").between(lo, hi))
    df.collect()
    leaf = df._jdf.queryExecution().executedPlan().collectLeaves().apply(0)
    out_rows = leaf.metrics().apply("numOutputRows").value()
    assert out_rows < total / 2, (out_rows, total)


def test_compaction_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="no such directory"):
        compact_parquet(spark, str(tmp_path / "missing"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        compact_parquet(spark, str(empty))
    with pytest.raises(ValueError, match="target_bytes"):
        compact_parquet(spark, str(empty), target_bytes=0)


def test_compaction_refuses_unsafe_layouts(spark, sf_dir, tmp_path):
    """Scope guards are refusals, not silent damage: streaming-sink
    manifests, hive partitions, and leftover swap staging are all
    hard errors."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")

    sink = tmp_path / "sink"
    li.limit(10).write.parquet(str(sink))
    (sink / "_spark_metadata").mkdir()
    (sink / "_spark_metadata" / "0").write_text("{}")
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet(spark, str(sink))

    # an EMPTY manifest dir yields no listFiles entries but must still
    # trip the refusal (ADVICE r6: fs.exists probe, not inference)
    sink2 = tmp_path / "sink_empty_manifest"
    li.limit(10).write.parquet(str(sink2))
    (sink2 / "_spark_metadata").mkdir()
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet(spark, str(sink2))

    # subdirectory-only manifest (compacted-batch layout) likewise
    sink3 = tmp_path / "sink_subdir_manifest"
    li.limit(10).write.parquet(str(sink3))
    (sink3 / "_spark_metadata" / "9.compact.d").mkdir(parents=True)
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet(spark, str(sink3))

    parts = tmp_path / "parts"
    li.write.partitionBy("l_returnflag").parquet(str(parts))
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, str(parts))

    flat = tmp_path / "flat"
    li.limit(10).write.parquet(str(flat))
    stale = tmp_path / "flat.__compact_old"
    stale.mkdir()
    with pytest.raises(RuntimeError, match="previous compaction failed"):
        compact_parquet(spark, str(flat))
