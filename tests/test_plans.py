"""Physical-plan assertions: the 100 TB posture, checked in CI.

Correctness says the right rows come out; these tests pin HOW — that
filters and projections reach the parquet scan, small dimensions
broadcast instead of shuffling the fact side, global top-k compiles to
TakeOrderedAndProject (k per partition, never a full sort), and the
relational hot paths contain zero Python evaluation. A regression in
any of these would still pass the oracle checks while quietly becoming
a scale bottleneck — exactly the failure mode plan tests exist for.
"""

from __future__ import annotations

import os

import pytest

from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog

load_catalog()


def _plan(spark, sf_dir, name: str) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_q01_filter_and_projection_reach_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # 7 referenced columns — the 11-column lineitem scan must be pruned
    # (read from the scan's output attribute list; ReadSchema can be
    # truncated in toString output)
    i = plan.find("FileScan parquet [")
    cols = plan[i + len("FileScan parquet [") : plan.find("]", i)]
    assert cols.count(",") + 1 == 7, cols


def test_q02_equality_filter_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_project_filter")
    assert "EqualTo(o_orderstatus,F)" in plan


def test_q20_dimensions_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q20_join_star_revenue")
    # customer/nation/region broadcast; the lineitem<->orders join may
    # be SMJ or (with AQE at tiny SF) broadcast — but the fact side
    # must never appear on the build side of a broadcast exchange.
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" in plan or plan.count("BroadcastHashJoin") >= 4


def test_q38_global_topk_is_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q38_sort_limit_topk")
    assert "TakeOrderedAndProject" in plan
    # a global Sort would be the scale bug this test exists to catch
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_q26_band_join_broadcasts_small_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q26_join_range_band")
    assert "BroadcastNestedLoopJoin" in plan


@pytest.mark.parametrize(
    "name",
    [
        "q01_pricing_summary",
        "q20_join_star_revenue",
        "q30_agg_rollup_cube_gsets",
        "q44_window_frames",
        "q60_dedup_exact_family",
        "q62_dedup_minhash_lsh",
        "q80_text_stats",
    ],
)
def test_hot_paths_have_no_python_eval(spark, sf_dir, name):
    """Relational + LLM-text/dedup paths are built-ins only: no
    BatchEvalPython (row UDF) / ArrowEvalPython (pandas UDF) / Python
    map stages anywhere in their physical plans."""
    plan = _plan(spark, sf_dir, name)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert marker not in plan, f"{name}: unexpected {marker}"


def test_q50_prunes_before_udtf_boundary(spark, sf_dir):
    """The UDTF stage is opaque to Catalyst — the plan must show the
    explicit projection AND the pinned repartition feeding
    MapInPandas: an aggregate-built document index coalesces to ~1
    partition, which would serialize the Python parse onto one task."""
    plan = _plan(spark, sf_dir, "q50_doc_extract_holdings")
    assert "MapInPandas" in plan
    i = plan.find("MapInPandas")
    assert "hashpartitioning(filing_id" in plan[i:], plan[i : i + 800]


def test_q71_bucket_expr_contains_no_md5(spark, sf_dir):
    """q71's hyperplane signs are precomputed on the driver — the plan
    must not recompute md5 per (row, plane, dim)."""
    plan = _plan(spark, sf_dir, "q71_similarity_lsh_ann")
    assert "md5" not in plan.lower()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Bucketing is the co-located-join tool at 100 TB: both sides
    bucketed by the join key -> sort-merge join with NO Exchange on
    either side (the shuffle happened once, at write time)."""
    from etfconstituentextractor_spark.plans.registry import QUERIES  # noqa: F401
    from etfconstituentextractor_spark.sources.tables import load
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    spark.sql("DROP TABLE IF EXISTS b_li")
    spark.sql("DROP TABLE IF EXISTS b_o")
    # a fresh derby metastore may not know tables whose warehouse dirs
    # survived a previous test process — clear the locations too
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_li", "b_o"):
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("b_li")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("b_o")

    # disable broadcast so the co-located SMJ is the observable plan
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("b_li").join(
            spark.table("b_o"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan[:1500]
    # and the result is right
    assert j.count() == li.count()


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting spreads a hot key over factor sub-partitions without
    changing the join's result."""
    from etfconstituentextractor_spark.operators.skew import salted_join
    from etfconstituentextractor_spark.sources.tables import load
    from pyspark.sql import functions as F

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = (
        li.join(o, "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    salted = (
        salted_join(li, o, ["l_orderkey"], salt_from=F.col("l_linenumber"), factor=4)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
