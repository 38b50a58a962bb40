"""Aggregation family (SURVEY.md §2B "Aggregations" — all absent from
the reference, whose only accumulation is a dict-key overwrite,
ETFQuarterlyHoldingsExtractor.py:28/:158).

Spark's HashAggregate does partial (map-side) + final aggregation
automatically — at 100 TB each groupBy here shuffles only the partial
per-key states, not rows. Decimal casts keep the partial/final merge
exact (functions/parity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.functions.parity import dec, dsum
from etfconstituentextractor_spark.operators.hll import hll_distinct, sql_hll_distinct
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q30 — multi-dimensional aggregation shapes, tagged union of all
# three: ROLLUP over the region→nation hierarchy, CUBE over two
# independent lineitem dimensions, and explicit GROUPING SETS (SQL
# form). grouping(a)*2 + grouping(b) is spelled identically in both
# engines (portable, unlike grouping_id()'s engine-specific forms).
# Each shape is one Expand+HashAggregate — the union evaluates them
# independently; nothing shuffles twice.
# ---------------------------------------------------------------------------
@query(
    "q30_agg_rollup_cube_gsets",
    oracle="""
    SELECT 'rollup' AS shape, r_name AS key1, n_name AS key2,
           grouping(r_name)*2 + grouping(n_name) AS gid,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_val
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    UNION ALL
    SELECT 'cube', l_returnflag, l_linestatus,
           grouping(l_returnflag)*2 + grouping(l_linestatus),
           COUNT(*),
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE)
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    UNION ALL
    SELECT 'gsets', l_returnflag, l_linestatus,
           grouping(l_returnflag)*2 + grouping(l_linestatus),
           COUNT(*),
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE)
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q30_agg_rollup_cube_gsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    li = load(spark, sf_dir, "lineitem")

    rollup = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            (F.grouping("r_name") * 2 + F.grouping("n_name")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(dec("c_acctbal"), "sum_val"),
        )
        .select(
            F.lit("rollup").alias("shape"),
            F.col("r_name").alias("key1"),
            F.col("n_name").alias("key2"),
            "gid",
            "n",
            "sum_val",
        )
    )
    cube = (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus")).alias("gid"),
            F.count(F.lit(1)).alias("n"),
            dsum(dec("l_quantity"), "sum_val"),
        )
        .select(
            F.lit("cube").alias("shape"),
            F.col("l_returnflag").alias("key1"),
            F.col("l_linestatus").alias("key2"),
            "gid",
            "n",
            "sum_val",
        )
    )
    li.createOrReplaceTempView("gs_lineitem")
    gsets = spark.sql(
        """
        SELECT 'gsets' AS shape, l_returnflag AS key1, l_linestatus AS key2,
               grouping(l_returnflag)*2 + grouping(l_linestatus) AS gid,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_val
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )
    return rollup.unionByName(cube).unionByName(gsets)


# ---------------------------------------------------------------------------
# q34 — collect_set / collect_list + exact multi-column
# COUNT(DISTINCT) in one aggregate (consolidated from the former
# q33/q34 pair — round-3 registry budget). The set/list output is
# emitted as a sorted joined string: collection order is
# nondeterministic in a distributed engine, so the deterministic
# projection IS the operator's contract. Two distinct columns force
# Spark's Expand-based multi-distinct plan (partial + re-shuffle per
# distinct branch) — at scale this is the plan to watch for skew; AQE
# handles the re-shuffle.
# ---------------------------------------------------------------------------
def _q34_oracle() -> str:
    from etfconstituentextractor_spark.operators.sketch import sql_kmv_distinct

    kmv = sql_kmv_distinct(
        "(SELECT n_name, c_custkey FROM customer "
        "JOIN nation ON c_nationkey = n_nationkey)",
        "n_name",
        "c_custkey",
    )
    return f"""
    WITH kmv AS ({kmv})
    SELECT n_name,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           COUNT(DISTINCT c_custkey) AS n_cust,
           ANY_VALUE(kmv_est) AS kmv_cust_est,
           COUNT(*) AS n
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN kmv USING (n_name)
    GROUP BY n_name
    """


@query("q34_agg_collect_distinct", oracle=_q34_oracle())
def q34_agg_collect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect/distinct family + the deterministic KMV distinct sketch
    (operators/sketch.py) beside the exact count on the same grain —
    like q36's deterministic HLL, the md5-based KMV estimate
    hash-matches the oracle exactly (the two sketches trade accuracy
    for state differently: KMV keeps k hashes, HLL m registers)."""
    from etfconstituentextractor_spark.operators.sketch import kmv_distinct

    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    kmv = kmv_distinct(joined, ["n_name"], "c_custkey")
    return (
        joined.groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.countDistinct("c_custkey").alias("n_cust"),
            F.count(F.lit(1)).alias("n"),
        )
        .join(F.broadcast(kmv), "n_name")
        .select(
            "n_name",
            "segments",
            "n_segments",
            "n_cust",
            F.col("kmv_est").alias("kmv_cust_est"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# q35 — min_by/max_by (argmin/argmax; the reference's "first match
# wins" semantic R9 made deterministic with a composite ordering key)
# plus exact interpolated percentiles (median / p90 per group). The
# percentiles run on integer cents so the q-position interpolation is
# ulp-exact across engines — see the oracle comment. At scale, exact
# percentile is a sort-based aggregate per group (bounded here by
# orders-per-customer); the sketch alternative for corpus-wide
# quantiles is the q36 HLL family's territory (approx_percentile),
# engine-specific and therefore rows-only.
# ---------------------------------------------------------------------------
@query(
    "q35_agg_min_max_by",
    oracle="""
    -- DuckDB arg_min/arg_max reject composite (struct) ordering keys,
    -- so the oracle spells the same deterministic argmin via windows.
    -- Percentiles run on integer CENTS: with integral inputs, linear
    -- interpolation at q=0.5/0.9 yields multiples of 0.1, so a
    -- 3-decimal round is ulp-safe in both engines (a double price
    -- would put interpolation midpoints on rounding boundaries).
    WITH ranked AS (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn_a,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn_d,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey) AS rn_h
      FROM orders
    )
    SELECT o_custkey,
           MAX(CASE WHEN rn_a = 1 THEN o_orderkey END) AS first_order,
           MAX(CASE WHEN rn_d = 1 THEN o_orderkey END) AS last_order,
           COUNT(*) AS n_orders,
           CAST(ROUND(quantile_cont(cents, 0.5), 3) AS DOUBLE) AS median_cents,
           CAST(ROUND(quantile_cont(cents, 0.9), 3) AS DOUBLE) AS p90_cents,
           CAST(ROUND(quantile_cont(cents, 0.5) FILTER (rn_h <= 8), 3) AS DOUBLE) AS sk_median_cents
    FROM ranked
    GROUP BY o_custkey
    """,
)
def q35_agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 6 adds ``sk_median_cents``: the median over each group's
    deterministic bottom-8 sample by (md5(o_orderkey), o_orderkey) —
    the KMV-style SAMPLED quantile sketch beside the exact one. Like
    q34's KMV distinct estimate, the hash-ordered sample makes a
    normally-approximate sketch an exact cross-engine function: at
    scale the bottom-k rows per group are a mergeable partial
    aggregate (min-heap on the hash), bounded memory per group, while
    the exact percentile must sort every value."""
    o = load(spark, sf_dir, "orders")
    key = F.struct("o_orderdate", "o_orderkey")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    wh = W.partitionBy("o_custkey").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), "o_orderkey"
    )
    return (
        o.withColumn("cents", cents)
        .withColumn("__rn_h", F.row_number().over(wh))
        .groupBy("o_custkey")
        .agg(
            F.min_by("o_orderkey", key).alias("first_order"),
            F.max_by("o_orderkey", key).alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.percentile("cents", F.lit(0.5)), 3).cast("double").alias("median_cents"),
            F.round(F.percentile("cents", F.lit(0.9)), 3).cast("double").alias("p90_cents"),
            F.round(
                F.percentile(F.when(F.col("__rn_h") <= 8, F.col("cents")), F.lit(0.5)), 3
            )
            .cast("double")
            .alias("sk_median_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q36 — the approximate-sketch family, now FULLY under the hash
# oracle (was rows-only through round 6). Three sketches side by side:
# (1) the deterministic md5-based HLL (operators/hll.py) whose exact
#     dyadic register sum + estimate DuckDB replays bit-for-bit;
# (2) the engine's own HLL++ (`approx_count_distinct`) — its estimate
#     is engine-specific, so what goes under the oracle is its
#     ACCURACY CONTRACT: a boolean "within 3 sigma of exact" that each
#     engine computes against its OWN sketch (both must say true);
# (3) likewise the engine quantile sketch (`approx_percentile` /
#     DuckDB approx_quantile) as a within-5% band boolean, beside the
#     exact interpolated median on integer cents (q35's ulp-safe
#     rounding trick).
# At 100 TB these are the one-pass mergeable-sketch alternatives to
# the exact (sort/Expand-based) aggregates: fixed memory per group,
# partial-merge friendly. The lineitem scan runs twice (raw-row aggs
# vs register build); the 3-row HLL frame broadcasts back.
# ---------------------------------------------------------------------------
@query(
    "q36_agg_approx_count_distinct",
    oracle=f"""
    WITH hll AS ({sql_hll_distinct("lineitem", "l_returnflag", "l_partkey", p=12)}),
    base AS (
      SELECT l_returnflag,
             COUNT(DISTINCT l_partkey) AS exact_parts,
             approx_count_distinct(l_partkey) AS __acd,
             approx_quantile(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5) AS __apx_med,
             CAST(ROUND(quantile_cont(CAST(ROUND(l_extendedprice * 100) AS BIGINT), 0.5), 3)
                  AS DOUBLE) AS exact_median_cents
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT b.l_returnflag, exact_parts,
           hll_est AS hll_parts, hll_sum_dyadic, hll_zero_regs,
           abs(hll_est - exact_parts) <= CAST(0.05 AS DOUBLE) * exact_parts AS hll_ok,
           abs(__acd - exact_parts) <= CAST(0.06 AS DOUBLE) * exact_parts AS acd_ok,
           abs(CAST(__apx_med AS DOUBLE) - exact_median_cents)
             <= CAST(0.05 AS DOUBLE) * abs(exact_median_cents) AS apx_median_ok,
           exact_median_cents
    FROM base b JOIN hll USING (l_returnflag)
    """,
)
def q36_agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").withColumn(
        "cents", F.round(F.col("l_extendedprice") * 100).cast("bigint")
    )
    base = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("__acd"),
        F.approx_percentile("cents", F.lit(0.5), F.lit(10_000)).alias("__apx_med"),
        F.round(F.percentile("cents", F.lit(0.5)), 3).cast("double").alias(
            "exact_median_cents"
        ),
    )
    hll = hll_distinct(li, ["l_returnflag"], "l_partkey", p=12)
    return base.join(F.broadcast(hll), "l_returnflag").select(
        "l_returnflag",
        "exact_parts",
        F.col("hll_est").alias("hll_parts"),
        "hll_sum_dyadic",
        "hll_zero_regs",
        (
            F.abs(F.col("hll_est") - F.col("exact_parts"))
            <= F.lit(0.05) * F.col("exact_parts")
        ).alias("hll_ok"),
        (
            F.abs(F.col("__acd") - F.col("exact_parts"))
            <= F.lit(0.06) * F.col("exact_parts")
        ).alias("acd_ok"),
        (
            F.abs(F.col("__apx_med").cast("double") - F.col("exact_median_cents"))
            <= F.lit(0.05) * F.abs(F.col("exact_median_cents"))
        ).alias("apx_median_ok"),
        "exact_median_cents",
    )


# ---------------------------------------------------------------------------
# q37 — pivot (wide conditional aggregation). Spark's pivot with an
# explicit value list compiles to the same conditional-agg plan the
# oracle spells out — no second pass to discover values (important at
# scale: implicit pivot triggers a distinct scan).
# ---------------------------------------------------------------------------
@query(
    "q37_agg_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(14,4)) END), 2) AS DOUBLE) AS qty_O,
           CAST(ROUND(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(14,4)) END), 2) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q37_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(dec("l_quantity")), 2).cast("double"))
    )
    return pivoted.select(
        "l_returnflag",
        F.col("O").alias("qty_O"),
        F.col("F").alias("qty_F"),
    )


# Global sort+limit top-k (the former q38) now lives as the 'global'
# leg of windows.py::q40_topk_family — round-3 registry consolidation.
# Its TakeOrderedAndProject plan shape is still pinned by
# tests/test_plans.py (global_topk helper).
