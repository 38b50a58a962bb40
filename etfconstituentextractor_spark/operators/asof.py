"""Distributed as-of join (nearest-prior-event join).

Spark has no native ASOF JOIN (DuckDB does — it is the oracle for
q27). The classic distributed formulation avoids both a range-join
blowup and per-group pandas: union the two inputs into one ordered
stream per key, then carry the most recent right-side payload forward
with ``last(..., ignorenulls=True)`` over an ordered window.

Cost at scale: ONE shuffle (window partitioning on the key) over
left+right — same order as a sort-merge join — and no skew-prone
range predicate. This beats ``pd.merge_asof`` inside
``applyInPandas`` (which shuffles the same data AND crosses the
Python boundary) and beats the naive non-equi join (quadratic per
key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: dict[str, str],
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (backward
    as-of, ties include the simultaneous right row). Unmatched left
    rows keep null payloads (LEFT semantics).

    right_payload maps output column name -> right column name.
    tolerance: optional max ``left_ts - right_ts`` as a Column
    (e.g. ``F.expr("INTERVAL 1 HOUR")``); older matches are nulled.
    right_tiebreak: right column that breaks ties among right rows
    sharing (key, right_ts) — the row with the LARGEST value wins.
    Defaults to the first right_payload source column, so the carried
    payload is deterministic even on duplicate-timestamp inputs.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    left_rest = [c for c in left.columns if c not in on_cols]

    if right_tiebreak is None:
        right_tiebreak = next(iter(right_payload.values()))

    # Reserved / output names must not collide with left columns:
    # withColumn on a duplicate name would silently overwrite the left
    # side with carried right payload instead of erroring.
    reserved = {"__t", "__side", "__tb"} | {f"__p_{o}" for o in right_payload}
    collisions = (set(right_payload) | reserved) & set(left.columns)
    if collisions:
        raise ValueError(
            f"asof_join: output/reserved names collide with left columns: {sorted(collisions)}"
        )

    lt = dict(zip(left.columns, left.schema.fields))
    rt = dict(zip(right.columns, right.schema.fields))

    payload_tmp = {out: f"__p_{out}" for out in right_payload}

    l_side = left.select(
        *on_cols,
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(rt[right_tiebreak].dataType).alias("__tb"),
        *[F.lit(None).cast(rt[rc].dataType).alias(tmp) for (out, rc), tmp in zip(right_payload.items(), payload_tmp.values())],
        *left_rest,
    )
    r_side = right.select(
        *on_cols,
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.col(right_tiebreak).alias("__tb"),
        *[F.col(rc).alias(payload_tmp[out]) for out, rc in right_payload.items()],
        *[F.lit(None).cast(lt[c].dataType).alias(c) for c in left_rest],
    )

    unioned = l_side.unionByName(r_side)
    # At equal timestamps the right row must sort first so the left row
    # sees it (>= semantics); __side desc does that. Among right rows
    # sharing (key, ts), __tb asc puts the largest tiebreak value last
    # in the frame, so last() carries it — deterministic on duplicates.
    w = (
        W.partitionBy(*on_cols)
        .orderBy(F.col("__t").asc(), F.col("__side").desc(), F.col("__tb").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    for out in right_payload:
        unioned = unioned.withColumn(out, F.last(payload_tmp[out], ignorenulls=True).over(w))

    result = unioned.filter(F.col("__side") == 0)

    if tolerance is not None:
        # Identify the carried right timestamp to apply the tolerance.
        ts_out = next(
            (out for out, rc in right_payload.items() if rc == right_ts), None
        )
        if ts_out is None:
            raise ValueError("tolerance requires right_ts to be part of right_payload")
        # materialize the flag first — nulling the carried timestamp
        # in-place would corrupt the condition for the later columns
        result = result.withColumn(
            "__too_old",
            F.col("__t").cast("timestamp") - F.col(ts_out).cast("timestamp") > tolerance,
        )
        for out in right_payload:
            result = result.withColumn(
                out, F.when(F.col("__too_old"), F.lit(None)).otherwise(F.col(out))
            )

    return result.select(
        *on_cols,
        *left_rest,
        *right_payload.keys(),
    )
