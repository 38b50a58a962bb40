"""Bucketed interval-overlap join: large×large range joins without the
nested-loop blowup.

A naive overlap join (``l_start <= r_end AND r_start <= l_end``) has no
equi-key, so Spark plans BroadcastNestedLoopJoin — quadratic and
broadcast-bound. The standard distributed formulation turns it into an
equi-join: explode each interval to the coarse buckets it spans, join
on (keys..., bucket), then verify the exact predicate. Cost is
linear in (intervals × buckets-per-interval + true pairs), and the
shuffle key gains the bucket — skew from hot key values spreads over
their time range.

De-duplication is arithmetic, not a shuffle: a pair overlapping k
shared buckets would emit k times, so the join keeps only the FIRST
shared bucket — ``bucket == max(floor(l_start/w), floor(r_start/w))``
— which every overlapping pair shares exactly once. (q28 keeps the
plain equi+predicate composition because its per-user span table is
tiny; this operator is the posture for the large×large case.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_width: int,
    on: list[str] | None = None,
) -> DataFrame:
    """Inner-join rows whose [start, end] intervals overlap (inclusive),
    optionally also matching equality keys ``on`` (same name on both
    sides). Interval bounds must be integral (epoch seconds/micros,
    day numbers, ...). Output: all left columns + all right columns.
    """
    on = list(on or [])
    overlap_names = (set(left.columns) & set(right.columns)) - set(on)
    if overlap_names:
        raise ValueError(
            f"bucketed_interval_join: rename overlapping non-key columns first: {sorted(overlap_names)}"
        )
    reserved = {"__bucket", "__lb", "__rb"}
    if reserved & (set(left.columns) | set(right.columns)):
        raise ValueError(f"bucketed_interval_join: reserved names in input: {reserved}")

    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")

    def floordiv(c: str) -> Column:
        # exact integer floor-division: `floor(col / w)` goes through a
        # double, which near 2^53/w can round up across an integer
        # boundary and misassign the bucket (epoch-micros inputs are in
        # that range). SQL DIV truncates toward zero, so shift negative
        # values down by (w-1) first to get floor semantics.
        v = f"CAST(`{c}` AS BIGINT)"
        return F.expr(f"IF({v} >= 0, {v} DIV {w}, ({v} - {w - 1}) DIV {w})")

    lb = left.withColumn("__lb", floordiv(l_start)).withColumn(
        "__bucket", F.explode(F.sequence(floordiv(l_start), floordiv(l_end)))
    )
    rb = right.withColumn("__rb", floordiv(r_start)).withColumn(
        "__bucket", F.explode(F.sequence(floordiv(r_start), floordiv(r_end)))
    )

    cond = [lb["__bucket"] == rb["__bucket"]]
    for k in on:
        cond.append(lb[k] == rb[k])

    joined = lb.join(rb, cond)
    out = joined.filter(
        (F.col(l_start) <= F.col(r_end))
        & (F.col(r_start) <= F.col(l_end))
        # first-shared-bucket: exactly one emission per overlapping pair
        & (lb["__bucket"] == F.greatest(F.col("__lb"), F.col("__rb")))
    )
    # resolve the duplicated key/bucket columns: keep the left copy
    keep = [lb[c].alias(c) for c in left.columns] + [
        rb[c].alias(c) for c in right.columns if c not in on
    ]
    return out.select(*keep)
