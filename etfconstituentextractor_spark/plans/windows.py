"""Window functions (SURVEY.md §2B "Window" — absent from the
reference; its keep-last dict overwrite :158 is the motivating case,
implemented as q16).

Scale posture: every window here partitions by a key (single shuffle,
state bounded per key). The one global window (q42) runs over
pre-aggregated daily rows — thousands of rows regardless of input
scale — never over the raw fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.functions.parity import dec
from etfconstituentextractor_spark.operators.funnel import funnel, sql_funnel
from etfconstituentextractor_spark.operators.gapfill import gapfill, per_key_view
from etfconstituentextractor_spark.operators.timeseries import RESOLUTIONS, time_rollup

#: q42 'funnel' leg: the ordered path the events corpus supports
FUNNEL_STEPS = ("view", "click", "purchase")
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q40 — top-k family, both shapes in one tagged plan (consolidated
# from the former q38/q40 pair — round-3 registry budget):
# - 'group': per-group top-k = rank window + filter (Catalyst has no
#   native per-group top-k pushdown; this is the canonical composition
#   and AQE handles the single shuffle on the partition key);
# - 'global': orderBy().limit(k) compiles to TakeOrderedAndProject —
#   k per partition then a k·P driver merge, never a full global sort
#   (plan pinned in tests/test_plans.py via global_topk). The tiny
#   rank window after the limit runs over exactly k rows.
# ---------------------------------------------------------------------------
def global_topk(o: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k over orders by (price desc, key asc) — the
    TakeOrderedAndProject shape; rn assigned after the limit so the
    global window sees only k rows."""
    topk = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .limit(k)
    )
    w = W.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return topk.withColumn("rn", F.row_number().over(w))


@query(
    "q40_topk_family",
    oracle="""
    SELECT 'group' AS scope, o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 3
    UNION ALL
    SELECT 'global', o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    WHERE rn <= 10
    """,
)
def q40_topk_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    grouped = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.lit("group").alias("scope"), "o_custkey", "o_orderkey", "o_totalprice", "rn")
    )
    global_ = global_topk(o, 10).select(
        F.lit("global").alias("scope"), "o_custkey", "o_orderkey", "o_totalprice", "rn"
    )
    return grouped.unionByName(global_)


# ---------------------------------------------------------------------------
# q42 — time-axis aggregation family, two tagged legs (the driver caps
# the catalog at 50 registered queries — registry-budget pattern):
# - 'trailing' leg — RANGE frame: 7-day trailing revenue over the
#   daily series. Two-level plan: exact decimal daily rollup
#   (distributed), then the range window over day numbers. Both
#   engines get an integer day axis so the frame is engine-neutral.
# - 'rollup' leg (round 6) — the hypertable-style multi-resolution
#   rollup (operators/timeseries.py): OHLC bars at hour/day/week from
#   ONE events scan + ONE shuffle (GROUPING SETS → a single Expand +
#   HashAggregate, never R re-reads of the fact table). The oracle
#   replays each resolution as an independent DuckDB GROUP BY and
#   unions them — same answer, deliberately different (naive) plan.
# Unified columns: leg-specific ones are NULL on the other leg.
# ---------------------------------------------------------------------------
#: NULL tails for the gapfill-leg columns (round 11) on the legs that
#: don't carry them — the driver's compare sorts columns by name, so
#: every leg must emit the full unified set in both engines.
_GAPFILL_NULLS_SQL = """
           CAST(NULL AS VARCHAR) AS event_type, CAST(NULL AS BOOLEAN) AS gap,
           CAST(NULL AS DOUBLE) AS v_locf, CAST(NULL AS DOUBLE) AS v_interp"""


def _rollup_leg_sql(resolution: str) -> str:
    return f"""
    SELECT 'rollup' AS leg, CAST(NULL AS INTEGER) AS day_num,
           CAST(NULL AS DOUBLE) AS day_rev, CAST(NULL AS DOUBLE) AS trailing_7d,
           '{resolution}' AS resolution,
           strftime(date_trunc('{resolution}', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS v_sum,
           MIN(value) AS v_min, MAX(value) AS v_max,
           min_by(value, event_id) AS v_open,
           max_by(value, event_id) AS v_close,
           CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS INTEGER) AS stage,
           CAST(NULL AS BIGINT) AS funnel_sec,{_GAPFILL_NULLS_SQL}
    FROM events
    GROUP BY date_trunc('{resolution}', ts)
    """


def _funnel_leg_sql() -> str:
    return f"""
    UNION ALL
    SELECT 'funnel' AS leg, CAST(NULL AS INTEGER) AS day_num,
           CAST(NULL AS DOUBLE) AS day_rev, CAST(NULL AS DOUBLE) AS trailing_7d,
           CAST(NULL AS VARCHAR) AS resolution, CAST(NULL AS VARCHAR) AS bucket_start,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v_sum,
           CAST(NULL AS DOUBLE) AS v_min, CAST(NULL AS DOUBLE) AS v_max,
           CAST(NULL AS DOUBLE) AS v_open, CAST(NULL AS DOUBLE) AS v_close,
           user_id, stage, funnel_sec,{_GAPFILL_NULLS_SQL}
    FROM ({sql_funnel(FUNNEL_STEPS)})
    """


# 'gapfill' leg (round 11): dense-axis gap filling with LOCF + linear
# interpolation (operators/gapfill.py) over a SPARSE daily rollup (the
# user_id % 997 slice leaves missing (event_type, day) buckets, so all
# three fill paths — observed, interior gap, leading/trailing edge —
# genuinely execute). The oracle replays the dense axis with DuckDB
# generate_series and the fills with IGNORE NULLS windows; the
# interpolation arithmetic is the same double expression (cast before
# divide, prev + slope * dx, 9 dp), so the hash match covers every
# filled value, not just the axis shape.
def _gapfill_leg_sql(leg: str = "gapfill") -> str:
    # one template, two axis CTEs: 'gapfill' densifies every key over
    # the GLOBAL range; 'gapfill_pk' (round 12) over each key's OWN
    # observed [min, max] — same fills, both under the hash
    if leg == "gapfill":
        axis = """
        SELECT k.event_type, gs.d
        FROM (SELECT DISTINCT event_type FROM obs) k
        CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS d FROM bounds) gs
        """
    else:
        axis = """
        SELECT event_type, unnest(generate_series(lo, hi)) AS d
        FROM (SELECT event_type, MIN(day_num) AS lo, MAX(day_num) AS hi
              FROM obs GROUP BY 1)
        """
    return f"""
    UNION ALL
    SELECT '{leg}' AS leg, CAST(day_num AS INTEGER) AS day_num,
           CAST(NULL AS DOUBLE) AS day_rev, CAST(NULL AS DOUBLE) AS trailing_7d,
           CAST(NULL AS VARCHAR) AS resolution, CAST(NULL AS VARCHAR) AS bucket_start,
           CAST(NULL AS BIGINT) AS n, v_obs AS v_sum,
           CAST(NULL AS DOUBLE) AS v_min, CAST(NULL AS DOUBLE) AS v_max,
           CAST(NULL AS DOUBLE) AS v_open, CAST(NULL AS DOUBLE) AS v_close,
           CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS INTEGER) AS stage,
           CAST(NULL AS BIGINT) AS funnel_sec,
           event_type, gap, v_locf, CAST(v_interp AS DOUBLE) AS v_interp
    FROM (
      WITH obs AS (
        SELECT event_type,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))), 2) AS DOUBLE) AS v
        FROM events WHERE user_id % 997 = 0
        GROUP BY 1, 2
      ), bounds AS (
        SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM obs
      ), axis AS (
        {axis}
      ), filled AS (
        SELECT a.event_type, a.d AS day_num, o.v
        FROM axis a LEFT JOIN obs o
          ON a.event_type = o.event_type AND a.d = o.day_num
      )
      SELECT event_type, day_num, v AS v_obs, v IS NULL AS gap,
             last_value(v IGNORE NULLS) OVER back AS v_locf,
             CASE
               WHEN v IS NOT NULL THEN v
               WHEN last_value(v IGNORE NULLS) OVER back IS NOT NULL
                AND first_value(v IGNORE NULLS) OVER fwd IS NOT NULL
               THEN ROUND(
                 last_value(v IGNORE NULLS) OVER back
                 + (first_value(v IGNORE NULLS) OVER fwd
                    - last_value(v IGNORE NULLS) OVER back)
                 * (CAST(day_num - last_value(CASE WHEN v IS NOT NULL THEN day_num END
                                              IGNORE NULLS) OVER back AS DOUBLE)
                    / CAST(first_value(CASE WHEN v IS NOT NULL THEN day_num END
                                       IGNORE NULLS) OVER fwd
                           - last_value(CASE WHEN v IS NOT NULL THEN day_num END
                                        IGNORE NULLS) OVER back AS DOUBLE)), 9)
             END AS v_interp
      FROM filled
      WINDOW back AS (PARTITION BY event_type ORDER BY day_num
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             fwd AS (PARTITION BY event_type ORDER BY day_num
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    """


def _gapfill_null_cols():
    return [
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("boolean").alias("gap"),
        F.lit(None).cast("double").alias("v_locf"),
        F.lit(None).cast("double").alias("v_interp"),
    ]


@query(
    "q42_window_trailing_range",
    oracle="""
    WITH daily AS (
      SELECT datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS day_num,
             SUM(CAST(o_totalprice AS DECIMAL(14,4))) AS day_rev
      FROM orders GROUP BY 1
    )
    SELECT 'trailing' AS leg, day_num,
           CAST(ROUND(day_rev, 2) AS DOUBLE) AS day_rev,
           CAST(ROUND(SUM(day_rev) OVER (ORDER BY day_num
                RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS trailing_7d,
           CAST(NULL AS VARCHAR) AS resolution, CAST(NULL AS VARCHAR) AS bucket_start,
           CAST(NULL AS BIGINT) AS n, CAST(NULL AS DOUBLE) AS v_sum,
           CAST(NULL AS DOUBLE) AS v_min, CAST(NULL AS DOUBLE) AS v_max,
           CAST(NULL AS DOUBLE) AS v_open, CAST(NULL AS DOUBLE) AS v_close,
           CAST(NULL AS BIGINT) AS user_id, CAST(NULL AS INTEGER) AS stage,
           CAST(NULL AS BIGINT) AS funnel_sec,"""
    + _GAPFILL_NULLS_SQL
    + """
    FROM daily
    UNION ALL
    """
    + "\nUNION ALL\n".join(_rollup_leg_sql(r) for r in RESOLUTIONS)
    + _funnel_leg_sql()
    + _gapfill_leg_sql()
    + _gapfill_leg_sql("gapfill_pk"),
)
def q42_window_trailing_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).alias(
            "day_num"
        )
    ).agg(F.sum(dec("o_totalprice")).alias("day_rev"))
    w = W.orderBy("day_num").rangeBetween(-6, 0)
    trailing = daily.select(
        F.lit("trailing").alias("leg"),
        "day_num",
        F.round("day_rev", 2).cast("double").alias("day_rev"),
        F.round(F.sum("day_rev").over(w), 2).cast("double").alias("trailing_7d"),
        F.lit(None).cast("string").alias("resolution"),
        F.lit(None).cast("string").alias("bucket_start"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("v_sum"),
        F.lit(None).cast("double").alias("v_min"),
        F.lit(None).cast("double").alias("v_max"),
        F.lit(None).cast("double").alias("v_open"),
        F.lit(None).cast("double").alias("v_close"),
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("int").alias("stage"),
        F.lit(None).cast("bigint").alias("funnel_sec"),
        *_gapfill_null_cols(),
    )
    ev = load(spark, sf_dir, "events")
    rollup = time_rollup(ev).select(
        F.lit("rollup").alias("leg"),
        F.lit(None).cast("int").alias("day_num"),
        F.lit(None).cast("double").alias("day_rev"),
        F.lit(None).cast("double").alias("trailing_7d"),
        "resolution",
        "bucket_start",
        "n",
        "v_sum",
        "v_min",
        "v_max",
        "v_open",
        "v_close",
        F.lit(None).cast("bigint").alias("user_id"),
        F.lit(None).cast("int").alias("stage"),
        F.lit(None).cast("bigint").alias("funnel_sec"),
        *_gapfill_null_cols(),
    )
    # 'funnel' leg (round 7): the ordered view->click->purchase path
    # per user (operators/funnel.py) — chained-minimum semantics, one
    # exchange, MATCH_RECOGNIZE-class behavioral analytics beside the
    # time-bucket legs on the same events table.
    fn = funnel(ev, FUNNEL_STEPS).select(
        F.lit("funnel").alias("leg"),
        F.lit(None).cast("int").alias("day_num"),
        F.lit(None).cast("double").alias("day_rev"),
        F.lit(None).cast("double").alias("trailing_7d"),
        F.lit(None).cast("string").alias("resolution"),
        F.lit(None).cast("string").alias("bucket_start"),
        F.lit(None).cast("bigint").alias("n"),
        F.lit(None).cast("double").alias("v_sum"),
        F.lit(None).cast("double").alias("v_min"),
        F.lit(None).cast("double").alias("v_max"),
        F.lit(None).cast("double").alias("v_open"),
        F.lit(None).cast("double").alias("v_close"),
        "user_id",
        "stage",
        "funnel_sec",
        *_gapfill_null_cols(),
    )
    # 'gapfill' leg (round 11): see _gapfill_leg_sql above. The slice
    # is sparse BY CONSTRUCTION (user_id % 997), so the dense axis has
    # real interior gaps and per-key leading/trailing edges; the agg
    # is the distributed part, the fills run over the tiny rollup.
    # coalesce(1).localCheckpoint(): gapfill consumes the rollup twice
    # internally (axis bounds + the left join), and an uncheckpointed
    # frame would re-run the events scan per consumer
    sparse = (
        ev.filter(F.col("user_id") % 997 == 0)
        .groupBy(
            "event_type",
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day_num"),
        )
        .agg(F.round(F.sum(dec("value")), 2).cast("double").alias("v_sum"))
        .coalesce(1)
        .localCheckpoint()
    )

    def _gf_leg(leg: str, filled: DataFrame):
        return filled.select(
            F.lit(leg).alias("leg"),
            F.col("day_num").cast("int").alias("day_num"),
            F.lit(None).cast("double").alias("day_rev"),
            F.lit(None).cast("double").alias("trailing_7d"),
            F.lit(None).cast("string").alias("resolution"),
            F.lit(None).cast("string").alias("bucket_start"),
            F.lit(None).cast("bigint").alias("n"),
            F.col("v_obs").alias("v_sum"),
            F.lit(None).cast("double").alias("v_min"),
            F.lit(None).cast("double").alias("v_max"),
            F.lit(None).cast("double").alias("v_open"),
            F.lit(None).cast("double").alias("v_close"),
            F.lit(None).cast("bigint").alias("user_id"),
            F.lit(None).cast("int").alias("stage"),
            F.lit(None).cast("bigint").alias("funnel_sec"),
            "event_type",
            "gap",
            "v_locf",
            "v_interp",
        )

    # 'gapfill_pk' (round 12; round 13 shares the fill): the per-key-
    # bounds mode under the same hash — each key densified over its
    # OWN observed range, the 100TB-posture axis for long-lived tables
    # with short-lived keys. Since the GLOBAL fill is also computed,
    # the pk leg derives from it (operators/gapfill.py:per_key_view —
    # one tiny bounds agg + broadcast filter) instead of re-running
    # axis + join + two window sorts; the filled frame checkpoints
    # once (tiny: keys x global range) and feeds both legs.
    filled = gapfill(
        sparse, key_col="event_type", bucket_col="day_num",
        value_col="v_sum", bounds="global",
    ).coalesce(1).localCheckpoint()
    gf = _gf_leg("gapfill", filled)
    gfpk = _gf_leg(
        "gapfill_pk",
        per_key_view(filled, key_col="event_type", bucket_col="day_num"),
    )
    return (
        trailing.unionByName(rollup)
        .unionByName(fn)
        .unionByName(gf)
        .unionByName(gfpk)
    )


# ---------------------------------------------------------------------------
# q44 — ROWS-frame window family on one frame spec: running sum/count/
# min plus first_value/last_value (the reference's "first match wins"
# break at :77, window-formalized as first over the frame), PLUS the
# analytic lag/lead leg (consolidated from the former q41 — round-3
# registry budget) and the distribution-rank trio
# (ntile/percent_rank/cume_dist, round 6): prev/next value and the delta against the previous
# event. Decimal accumulation: window aggregation internals differ
# between engines (DuckDB uses segment trees — different summation
# order), so exactness requires the decimal cast. Both window specs
# share the (user_id | ts, event_id) partition+sort, so Catalyst plans
# ONE Exchange and one sort; lag/lead land in a sibling Window node on
# the same sorted partitions — no extra shuffle.
# ---------------------------------------------------------------------------
@query(
    "q44_window_frames",
    oracle="""
    SELECT user_id, event_id,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(14,4))) OVER w, 2) AS DOUBLE) AS running_value,
           COUNT(*) OVER w AS running_n,
           CAST(ROUND(min(value) OVER w, 4) AS DOUBLE) AS running_min,
           first_value(event_type) OVER w AS first_type,
           last_value(event_type)  OVER w AS latest_type,
           lag(value)  OVER wp AS prev_value,
           lead(value) OVER wp AS next_value,
           CAST(ROUND(CAST(value AS DECIMAL(14,4))
                - CAST(coalesce(lag(value) OVER wp, value) AS DECIMAL(14,4)), 2) AS DOUBLE) AS delta_prev,
           CAST(ntile(4) OVER wp AS INTEGER) AS quartile,
           CAST(ROUND(percent_rank() OVER wp, 9) AS DOUBLE) AS pct_rank,
           CAST(ROUND(cume_dist() OVER wp, 9) AS DOUBLE) AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wp AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q44_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wp = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(wp)
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum(dec("value")).over(w), 2).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
        F.round(F.min("value").over(w), 4).cast("double").alias("running_min"),
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("latest_type"),
        prev.alias("prev_value"),
        F.lead("value").over(wp).alias("next_value"),
        F.round(dec("value") - dec(F.coalesce(prev, F.col("value"))), 2)
        .cast("double")
        .alias("delta_prev"),
        # distribution-rank trio on the SAME partition+sort: ntile,
        # percent_rank ((rank-1)/(n-1)), cume_dist — another sibling
        # Window node, still no extra exchange; rounded at 9dp (module
        # convention) against engine division-order differences.
        F.ntile(4).over(wp).alias("quartile"),
        F.round(F.percent_rank().over(wp), 9).cast("double").alias("pct_rank"),
        F.round(F.cume_dist().over(wp), 9).cast("double").alias("cume"),
    )
