"""Core relational queries: scan/filter/project/string/date/math/JSON/
set-ops/sink round-trip (SURVEY.md §2A R3-R6, R14-R16, R19-R21 and the
core rows of §2B).

Every query here is a pure DataFrame program — Catalyst handles filter
pushdown, column pruning and constant folding; nothing collects to the
driver. Scale notes are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from etfconstituentextractor_spark.functions.parity import dec, dec_rate, dsum, davg
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q01 — flagship: TPC-H-Q1-shaped pricing summary.
# scan → pushed filter → hash agg (partial+final, map-side combine) → sort.
# At 100 TB: single shuffle on the 6-value group key; decimal aggs keep
# partial/final merge exact. Filter + 7-column projection reach the
# parquet scan (PushedFilters/ReadSchema).
# ---------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(14,4))), 2) AS DOUBLE)      AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(14,4))
                          * CAST(1 - l_discount AS DECIMAL(8,6))), 2) AS DOUBLE) AS sum_disc_price,
           -- inner CAST widens the first product: DuckDB keeps decimal
           -- multiply in 18 digits unless the operand forces more
           CAST(ROUND(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,4))
                               * CAST(1 - l_discount AS DECIMAL(8,6)) AS DECIMAL(28,10))
                          * CAST(1 + l_tax AS DECIMAL(8,6))), 2) AS DOUBLE)      AS sum_charge,
           CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
           CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,4))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_price,
           CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / COUNT(*), 4) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    one_minus_disc = (F.lit(1) - F.col("l_discount")).cast("decimal(8,6)")
    one_plus_tax = (F.lit(1) + F.col("l_tax")).cast("decimal(8,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(dec("l_extendedprice") * one_minus_disc, "sum_disc_price"),
            dsum(dec("l_extendedprice") * one_minus_disc * one_plus_tax, "sum_charge"),
            davg(dec("l_quantity"), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec_rate("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q04 — projection + filter family, a two-leg tagged union (merged from
# the former q02+q04 — round-4 registry budget; both legs keep their own
# pushed scans, so the union concatenates two already-filtered reads
# with zero shuffle):
#   * 'proj' leg (was q02; reference R3: build the filing-index frame
#     from 4 of ~14 fields with display names,
#     ETFQuarterlyHoldingsExtractor.py:46-51; R4:
#     df[df["Form Type"] == "NPORT-P"], :52) — projection / rename /
#     computed columns behind an equality filter on orders. Catalyst
#     makes both manual optimizations automatic: ReadSchema shows only
#     the 4 referenced columns, PushedFilters=[EqualTo(o_orderstatus,F)]
#     reaches the scan.
#   * 'filt' leg: range / IN / null-ness (§2B — the reference's README
#     promises a 5-year window it never implements) and string patterns
#     contains / LIKE / RLIKE (reference R9's substring anchors
#     :68/:87/:100, CIK validation regex :163) on part. All conjuncts
#     and the LIKE/contains disjunction push to the parquet scan.
# Column map: k1 = order_key | p_partkey, k2 = cust_key | p_size,
# s1 = priority_uc | p_name, s2/s3 = NULL | p_brand/p_type,
# val = marked_up | p_retailprice.
# ---------------------------------------------------------------------------
@query(
    "q04_filter_family",
    oracle="""
    SELECT 'proj' AS leg,
           o_orderkey AS k1,
           o_custkey AS k2,
           UPPER(o_orderpriority) AS s1,
           CAST(NULL AS VARCHAR) AS s2,
           CAST(NULL AS VARCHAR) AS s3,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(14,4)) * CAST(1.1 AS DECIMAL(3,2)), 2) AS DOUBLE) AS val
    FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT 'filt' AS leg,
           p_partkey AS k1,
           CAST(p_size AS BIGINT) AS k2,
           p_name AS s1,
           p_brand AS s2,
           p_type AS s3,
           CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    WHERE p_size BETWEEN 10 AND 40
      AND p_brand IN ('Brand#11', 'Brand#12', 'Brand#21', 'Brand#22', 'Brand#31')
      AND p_retailprice IS NOT NULL
      AND (p_type LIKE '%BRASS%'
           OR contains(p_name, 'green')
           OR regexp_matches(p_type, '^STANDARD.*'))
    """,
)
def q04_filter_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    proj = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            F.lit("proj").alias("leg"),
            F.col("o_orderkey").alias("k1"),
            F.col("o_custkey").alias("k2"),
            F.upper("o_orderpriority").alias("s1"),
            F.lit(None).cast("string").alias("s2"),
            F.lit(None).cast("string").alias("s3"),
            F.round(dec("o_totalprice") * F.lit(1.1).cast("decimal(3,2)"), 2)
            .cast("double")
            .alias("val"),
        )
    )
    filt = (
        load(spark, sf_dir, "part")
        .filter(
            F.col("p_size").between(10, 40)
            & F.col("p_brand").isin("Brand#11", "Brand#12", "Brand#21", "Brand#22", "Brand#31")
            & F.col("p_retailprice").isNotNull()
            & (
                F.col("p_type").like("%BRASS%")
                | F.col("p_name").contains("green")
                | F.col("p_type").rlike(r"^STANDARD.*")
            )
        )
        .select(
            F.lit("filt").alias("leg"),
            F.col("p_partkey").alias("k1"),
            F.col("p_size").cast("bigint").alias("k2"),
            F.col("p_name").alias("s1"),
            F.col("p_brand").alias("s2"),
            F.col("p_type").alias("s3"),
            F.col("p_retailprice").cast("double").alias("val"),
        )
    )
    return proj.unionByName(filt)


# ---------------------------------------------------------------------------
# q06 — the customer-grain scalar + ranking family, one pass over
# customer (consolidated from the former q06/q09/q43 trio — round-3
# registry budget; same table, same grain, so the merge is a wider
# select + one window shuffle, not a union). String leg: reference R5
# dash-strip :58, R6 concat :58/:141, R14 trim, R21 validation :163.
# Conditional leg: R15 `is not None` extraction guards :95-127, R16
# drop-all-null records :129-130. Ranking leg (was q43):
# rank/dense_rank over a tie-ful ordering (exact tie semantics),
# ntile/row_number over a total ordering (deterministic assignment
# requires one); both windows share the c_nationkey partitioning →
# ONE Exchange serves all four ranking functions, and the scalar
# columns ride through it untouched.
# ---------------------------------------------------------------------------
@query(
    "q06_scalar_ranking_family",
    oracle="""
    SELECT c_custkey,
           replace(c_name, '#', '-')                         AS name_dashed,
           concat('cust:', CAST(c_custkey AS VARCHAR))       AS name_tagged,
           trim(upper(c_mktsegment))                         AS seg_uc,
           lower(substring(c_name, 1, 8))                    AS name_prefix,
           length(c_name)                                    AS name_len,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0')         AS cik_style,
           (regexp_matches(lpad(CAST(c_custkey AS VARCHAR), 10, '0'), '^[0-9]{10}$')) AS cik_valid,
           CASE WHEN c_acctbal < 0 THEN 'debit'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END                           AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           levenshtein(c_mktsegment, 'MACHINERY')            AS seg_edit_dist,
           CASE WHEN c_acctbal IS NULL THEN 0.0 ELSE c_acctbal END AS bal_filled,
           rank()       OVER wt AS bal_rank,
           dense_rank() OVER wt AS bal_dense_rank,
           ntile(4)     OVER wo AS bal_quartile,
           row_number() OVER wo AS bal_rownum
    FROM customer
    WHERE coalesce(c_name, c_mktsegment) IS NOT NULL
    WINDOW wt AS (PARTITION BY c_nationkey ORDER BY round(c_acctbal / 1000) DESC),
           wo AS (PARTITION BY c_nationkey ORDER BY round(c_acctbal / 1000) DESC, c_custkey)
    """,
)
def q06_scalar_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    cik = F.lpad(F.col("c_custkey").cast("string"), 10, "0")
    coarse = F.round(F.col("c_acctbal") / 1000)
    wt = W.partitionBy("c_nationkey").orderBy(coarse.desc())
    wo = W.partitionBy("c_nationkey").orderBy(coarse.desc(), F.col("c_custkey"))
    return c.filter(F.coalesce("c_name", "c_mktsegment").isNotNull()).select(
        "c_custkey",
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.concat(F.lit("cust:"), F.col("c_custkey").cast("string")).alias("name_tagged"),
        F.trim(F.upper("c_mktsegment")).alias("seg_uc"),
        F.lower(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        cik.alias("cik_style"),
        cik.rlike(r"^[0-9]{10}$").alias("cik_valid"),
        F.when(F.col("c_acctbal") < 0, "debit")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        # full Wagner-Fischer edit distance in both engines (round 6)
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).alias("seg_edit_dist"),
        F.when(F.col("c_acctbal").isNull(), F.lit(0.0))
        .otherwise(F.col("c_acctbal"))
        .alias("bal_filled"),
        F.rank().over(wt).alias("bal_rank"),
        F.dense_rank().over(wt).alias("bal_dense_rank"),
        F.ntile(4).over(wo).alias("bal_quartile"),
        F.row_number().over(wo).alias("bal_rownum"),
    )


# ---------------------------------------------------------------------------
# q08 — scalar math AND date/time functions on one lineitem scan (§2B:
# the reference keeps dates as raw strings :48/:76 and never parses its
# numeric strings :117-127; these are the typed ops boundary parsing
# unlocks, §1.2). Consolidated from the former q07+q08 pair (round-4
# registry budget): same fact table, same row grain — the merge is a
# wider select on one scan, no extra shuffle. ceil/floor are cast to
# BIGINT on both sides (DuckDB returns DOUBLE); date outputs are
# emitted as ISO strings / INTs because Spark DateType and DuckDB DATE
# materialize differently in pandas.
# ---------------------------------------------------------------------------
@query(
    "q08_math_date_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_quantity AS DECIMAL(14,4)) * CAST(l_extendedprice AS DECIMAL(14,4)), 2) AS DOUBLE) AS gross,
           abs(l_discount - 0.05)                  AS disc_dev,
           CAST(ceil(l_quantity) AS BIGINT)        AS qty_ceil,
           CAST(floor(l_quantity) AS BIGINT)       AS qty_floor,
           l_linenumber % 3                        AS line_mod,
           CAST(ROUND(sqrt(l_extendedprice), 6) AS DOUBLE) AS price_sqrt,
           CAST(year(l_shipdate) AS INT)           AS ship_year,
           CAST(quarter(l_shipdate) AS INT)        AS ship_quarter,
           CAST(month(l_shipdate) AS INT)          AS ship_month,
           date_trunc('month', l_shipdate)         AS ship_month_start,
           datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS ship_day_no,
           strftime(CAST(l_shipdate AS DATE) + 30, '%Y-%m-%d') AS due_date
    FROM lineitem
    """,
)
def q08_math_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(dec("l_quantity") * dec("l_extendedprice"), 2).cast("double").alias("gross"),
        F.abs(F.col("l_discount") - F.lit(0.05)).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.round(F.sqrt("l_extendedprice"), 6).cast("double").alias("price_sqrt"),
        F.year("l_shipdate").alias("ship_year"),
        F.quarter("l_shipdate").alias("ship_quarter"),
        F.month("l_shipdate").alias("ship_month"),
        F.date_trunc("month", F.col("l_shipdate")).cast("timestamp_ntz").alias("ship_month_start"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "ship_day_no"
        ),
        F.date_format(F.date_add(F.col("l_shipdate").cast("date"), 30), "yyyy-MM-dd").alias(
            "due_date"
        ),
    )


# ---------------------------------------------------------------------------
# q12 — set operations, tagged union of all three (§2B; the reference's
# dict-of-frames accumulator :28 is morally a union). subtract == SQL
# EXCEPT (distinct); exceptAll would keep multiplicity differences.
# ---------------------------------------------------------------------------
@query(
    "q12_set_ops",
    oracle="""
    SELECT 'union' AS set_op, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'intersect', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT 'except', nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT SELECT s_nationkey FROM supplier)
    """,
)
def q12_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    tagged = [
        c.union(s).distinct().select(F.lit("union").alias("set_op"), "nationkey"),
        c.intersect(s).select(F.lit("intersect").alias("set_op"), "nationkey"),
        c.subtract(s).select(F.lit("except").alias("set_op"), "nationkey"),
    ]
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


# ---------------------------------------------------------------------------
# q15 — partitioned sink round-trips: CSV, Parquet, ORC, JSON-lines
# (reference R20: one CSV per reporting date, :136-143; §2B "Sinks").
# The engine
# writes `partitionBy(key)` — the same per-key layout as the
# reference's per-date files, but parallel, atomic-per-task, and
# partition-pruned on read-back. CSV round-trips values exactly by
# writing decimals as text; Parquet and ORC round-trip the typed
# schema natively (ORC is the second columnar format warehouses
# actually run; DuckDB can't read it, so the oracle restates the same
# aggregate — the round-trip itself is what the leg certifies).
# ---------------------------------------------------------------------------
@query(
    "q15_sink_roundtrip",
    oracle="""
    SELECT sink, o_orderstatus, n_orders, sum_total FROM (
      SELECT 'csv' AS sink, o_orderstatus, COUNT(*) AS n_orders,
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE) AS sum_total
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'parquet', o_orderstatus, COUNT(*),
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'orc', o_orderstatus, COUNT(*),
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'jsonl', o_orderstatus, COUNT(*),
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      SELECT 'zorder', o_orderstatus, COUNT(*),
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
      FROM orders GROUP BY o_orderstatus
      UNION ALL
      -- 'snaptxn' leg (round 10): the slice lands in a snapshot table
      -- through the exactly-once ingest handler with batch 1
      -- REDELIVERED and batch 0 replayed by a direct zombie-style
      -- commit; the oracle restates the slice's plain aggregate, so
      -- any double-append breaks the hash.
      SELECT 'snaptxn', o_orderstatus, COUNT(*),
             CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(14,4))), 2) AS DOUBLE)
      FROM orders WHERE o_orderkey % 10 = 0 GROUP BY o_orderstatus
    )
    """,
)
def q15_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        dec("o_totalprice").alias("o_totalprice"),
    )
    tag = os.path.basename(sf_dir.rstrip("/"))
    csv_out = os.path.join(tempfile.gettempdir(), f"etfce_csv_roundtrip_{tag}")
    pq_out = os.path.join(tempfile.gettempdir(), f"etfce_pq_roundtrip_{tag}")
    orc_out = os.path.join(tempfile.gettempdir(), f"etfce_orc_roundtrip_{tag}")
    json_out = os.path.join(tempfile.gettempdir(), f"etfce_jsonl_roundtrip_{tag}")
    (
        o.repartition("o_orderstatus")
        .write.mode("overwrite")
        .option("header", True)
        .partitionBy("o_orderstatus")
        .csv(csv_out)
    )
    (
        o.repartition("o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(pq_out)
    )
    (
        o.repartition("o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .orc(orc_out)
    )
    # JSON-lines: decimals serialize as JSON numbers; the typed
    # read-back schema restores them exactly (4 dp fits the source).
    (
        o.repartition("o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .json(json_out)
    )
    # Z-ORDERED parquet sink (operators/zorder.py): clustered on the
    # (o_orderkey, o_totalprice) Morton curve so row-group stats prune
    # filters on EITHER column — the lakehouse layout-service write,
    # under the same roundtrip oracle (the skip-metrics proof lives in
    # tests/test_zorder.py).
    from etfconstituentextractor_spark.operators.zorder import write_zordered

    z_out = os.path.join(tempfile.gettempdir(), f"etfce_zorder_roundtrip_{tag}")
    write_zordered(
        o.withColumn("o_totalprice", F.col("o_totalprice").cast("double")),
        z_out,
        "o_orderkey",
        "o_totalprice",
        bits=12,
        n_files=4,  # ranged Z-writes in parallel, like the other legs
    )
    # 'snaptxn' leg (round 10, sources/snapshot_table.py): EXACTLY-ONCE
    # ingest under the hash oracle — the o_orderkey%10 slice arrives as
    # three deterministic micro-batches through the foreachBatch-faithful
    # handler (direct (df, batch_id) calls: foreachBatch's own contract),
    # then batch 1 is REDELIVERED through the handler and batch 0 is
    # replayed as a DIRECT commit carrying its txn stamp (the zombie-
    # writer path — the guard inside snapshot_commit, not the handler's
    # pre-check, must catch it). The oracle restates the slice's plain
    # aggregate: one duplicated batch doubles a count and breaks the
    # hash. Fresh table per run (ingest mutates version history, the
    # q86 merge-leg convention); the real-stream + checkpoint-loss
    # drill stays in tests/test_snapshot_table.py.
    from etfconstituentextractor_spark.sources.snapshot_table import (
        snapshot_commit,
        snapshot_read,
        snapshot_stream_ingest,
    )
    from etfconstituentextractor_spark.sources.tables import scratch_dir

    slice_ = o.filter(F.col("o_orderkey") % 10 == 0)
    ttbl = scratch_dir("etfce_ingesttbl", sf_dir, unique=True)
    handler = snapshot_stream_ingest(ttbl, "q15-ingest")
    for b in range(3):
        handler(slice_.filter(F.col("o_orderkey") % 3 == b).coalesce(1), b)
    handler(slice_.filter(F.col("o_orderkey") % 3 == 1).coalesce(1), 1)  # redelivery
    snapshot_commit(  # zombie replay: no handler pre-check in the way
        slice_.filter(F.col("o_orderkey") % 3 == 0).coalesce(1),
        ttbl,
        mode="append",
        txn=("q15-ingest", 0),
    )
    snap_back = snapshot_read(spark, ttbl)

    csv_back = spark.read.option("header", True).schema(
        "o_orderkey bigint, o_totalprice decimal(14,4), o_orderstatus string"
    ).csv(csv_out)
    pq_back = spark.read.parquet(pq_out)
    orc_back = spark.read.orc(orc_out)
    json_back = spark.read.schema(
        "o_orderkey bigint, o_totalprice decimal(14,4), o_orderstatus string"
    ).json(json_out)
    z_back = spark.read.parquet(z_out)
    def summarize(df: DataFrame, sink: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice"), "sum_total"),
        ).select(F.lit(sink).alias("sink"), "o_orderstatus", "n_orders", "sum_total")
    return (
        summarize(csv_back, "csv")
        .unionByName(summarize(pq_back, "parquet"))
        .unionByName(summarize(orc_back, "orc"))
        .unionByName(summarize(json_back, "jsonl"))
        .unionByName(summarize(z_back, "zorder"))
        .unionByName(summarize(snap_back, "snaptxn"))
    )


# ---------------------------------------------------------------------------
# q16 — keep-last dedup (reference R19: dict-key overwrite :158 means a
# later amended filing replaces the earlier one for the same reporting
# date). Window rank on the partition key, latest wins; single shuffle
# on the key, streams at scale.
# ---------------------------------------------------------------------------
@query(
    "q16_keeplast_dedup",
    oracle="""
    SELECT user_id, event_id, event_type, ts
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def q16_keeplast_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


# ---------------------------------------------------------------------------
# q17 — JSON and map functions on one events scan (§2B "Scalar fns —
# JSON" / "Scalar fns — map"; reference R2: nested dict access
# `data.get("filings",{}).get("recent",{})`, :45 — here as
# get_json_object string-path access alongside the typed-map path).
# Consolidated from the former q10+q17 pair (round-4 registry budget):
# same table, same grain. events.props is read BOTH ways — raw
# get_json_object (the untyped R2 spelling) and from_json into a typed
# map, then map_keys / map_values / element_at / map aggregation, plus
# a constructed map (create_map) exploded to key/value rows. DuckDB
# has no first-class map over JSON, so the oracle spells the same
# semantics via json functions + a two-branch union for the explode.
# ---------------------------------------------------------------------------
@query(
    "q17_json_map_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           len(json_keys(props)) AS n_prop_keys,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_vals_sum,
           'type' AS key, event_type AS val
    FROM events
    UNION ALL
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT),
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10,
           len(json_keys(props)),
           CAST(json_extract_string(props, '$.k') AS BIGINT),
           'uid', CAST(user_id AS VARCHAR)
    FROM events
    """,
)
def q17_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    mapped = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_raw"),
        F.from_json("props", "map<string,bigint>").alias("pm"),
        F.create_map(
            F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
        ).alias("am"),
    )
    return mapped.select(
        "event_id",
        F.element_at("pm", F.lit("k")).alias("k_val"),
        (F.col("k_raw") % 10).alias("k_bucket"),
        F.size(F.map_keys("pm")).alias("n_prop_keys"),
        F.expr("aggregate(map_values(pm), 0L, (acc, x) -> acc + x)").alias("prop_vals_sum"),
        F.explode("am").alias("key", "val"),
    )
