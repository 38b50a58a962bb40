"""Unit tests for composed operators against hand-computed micro-frames
(SURVEY.md §5.2 engine-side additions)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.asof import asof_join
from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog

load_catalog()


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_micro(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"), (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],
        "k bigint, lts timestamp_ntz, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 10.0), (1, _ts("2024-01-01T11:00:00"), 20.0),
         (1, _ts("2024-01-01T12:00:00"), 30.0), (2, _ts("2024-01-01T09:30:00"), 99.0)],
        "k bigint, rts timestamp_ntz, v double",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload={"rts": "rts", "v": "v"},
    ).orderBy("k", "lts").collect()
    # 10:00 -> 09:30 match; 12:00 -> 12:00 (>= includes simultaneous);
    # key 2 at 09:00 has no prior right row -> nulls
    assert [r.v for r in out] == [10.0, 30.0, None]


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"))], "k bigint, lts timestamp_ntz"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T06:00:00"), 7.0)], "k bigint, rts timestamp_ntz, v double"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload={"rts": "rts", "v": "v"},
        tolerance=F.expr("INTERVAL 1 HOUR"),
    ).collect()
    assert out[0].v is None  # match exists but is older than tolerance


def test_approx_count_distinct_bound(spark, sf_dir):
    rows = QUERIES["q36_agg_approx_count_distinct"](spark, sf_dir).collect()
    for r in rows:
        assert abs(r.approx_parts - r.exact_parts) <= max(3.0, 0.1 * r.exact_parts), r
