"""Time-series gap filling: dense bucket axis + LOCF + linear
interpolation (SURVEY.md §2B adjunct — the `time_bucket_gapfill` /
`locf` / `interpolate` operator family of timeseries stores
(TimescaleDB, QuestDB); no counterpart in the reference, whose only
time handling is a raw date string,
ETFQuarterlyHoldingsExtractor.py:76).

A sparse per-key series (one row per (key, bucket) with at least one
observation) becomes a DENSE series over the observed bucket range:
every key gets every bucket, missing buckets are flagged, and two
standard fill policies are computed side by side —

- ``v_locf``  — last-observation-carried-forward: the latest observed
  value at-or-before the bucket; NULL before a key's first
  observation (LOCF never invents a leading value).
- ``v_interp`` — linear interpolation between the nearest observed
  values either side of the gap; NULL when either endpoint is missing
  (no extrapolation past the key's observed range — the conservative
  contract; LOCF is the policy that extends rightward).

Scale posture: the dense axis is (distinct keys) x (global bucket
range) built by a sequence-explode against a ONE-ROW broadcast bounds
frame — never a driver-side loop; the observed series joins the axis
on (key, bucket) (one hash shuffle), and both fill policies are
per-key window functions (one Exchange on the key, state bounded per
key). Nothing here scales with raw-event count — callers aggregate to
buckets first (the distributed part), and the fill runs over the
rollup. Determinism: the bucket axis is integer, observed values are
rounded before filling, and the interpolation expression is the same
IEEE double arithmetic in the DuckDB oracle twin (q42 'gapfill' leg),
so results hash-match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def gapfill(
    series: DataFrame,
    *,
    key_col: str,
    bucket_col: str,
    value_col: str,
    bounds: str = "global",
) -> DataFrame:
    """Densify ``series`` (one row per observed (key, bucket)) over
    the [min, max] bucket range and fill gaps.

    ``bounds`` picks the densification axis (round-12 verdict nit):

    - ``'global'`` (default, the oracle-checked q42 contract): every
      key gets every bucket of the CORPUS-wide range — the shape SQL
      gapfill oracles and cross-key matrix consumers expect.
    - ``'per_key'``: each key is densified only over ITS OWN observed
      [min, max] — a short-lived key emits no rows outside its life.
      At 100x scale with long-lived tables and short-lived keys the
      global axis inflates output to keys x global-range even for
      keys alive in a sliver of it; this mode keeps output
      sum(per-key ranges). One extra per-key aggregate, no scalar
      frame, no crossJoin.

    ``bucket_col`` must be integral (a day number, an epoch-hour — the
    caller's bucketing already happened); one output row per
    (key, bucket) with columns: key, bucket, ``v_obs`` (the observed
    value or NULL), ``gap`` (true where the bucket had no
    observation), ``v_locf``, ``v_interp`` (9 dp — module rounding
    convention for derived doubles). Fills never extrapolate past a
    key's observed values in either mode (LOCF is NULL before the
    first observation; interpolation needs both endpoints).
    """
    if bounds not in ("global", "per_key"):
        raise ValueError(f"bounds must be 'global'|'per_key', got {bounds!r}")
    v = F.col("__v")
    b = F.col(bucket_col)
    # __seen marks bucket PRESENCE independent of value nullness
    # (round-14 advice): a (key, bucket) row whose value is NULL is
    # still an observation for axis/bounds purposes — both axis modes
    # already include it (min/max over the bucket column ignore only
    # bucket nulls), so the output must expose the distinction too,
    # or a derived per-key view re-computing bounds from the output
    # would shrink at NULL-valued edge observations.
    obs = series.select(
        F.col(key_col),
        b,
        F.col(value_col).cast("double").alias("__v"),
        F.lit(True).alias("__seen"),
    )
    if bounds == "per_key":
        # per-key axis: one hash agg on the key (same key the fill
        # windows shuffle on anyway), then sequence-explode the key's
        # own range — no scalar frame, no crossJoin
        axis = (
            obs.groupBy(key_col)
            .agg(F.min(b).alias("__lo"), F.max(b).alias("__hi"))
            .select(
                key_col,
                F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(
                    bucket_col
                ),
            )
        )
    else:
        # global bounds: ONE scalar row, broadcast into a cross join —
        # the axis is lazy plan algebra, never a driver-side range loop
        gbounds = obs.agg(F.min(b).alias("__lo"), F.max(b).alias("__hi"))
        axis = (
            obs.select(key_col)
            .distinct()
            .crossJoin(F.broadcast(gbounds))
            .select(
                key_col,
                F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias(
                    bucket_col
                ),
            )
        )
    filled = axis.join(obs, [key_col, bucket_col], "left")
    back = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    fwd = (
        W.partitionBy(key_col)
        .orderBy(bucket_col)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    prev_b = F.last(F.when(v.isNotNull(), b), ignorenulls=True).over(back)
    next_b = F.first(F.when(v.isNotNull(), b), ignorenulls=True).over(fwd)
    # the interpolation arithmetic is spelled identically in the
    # DuckDB oracle (double cast BEFORE the divide, prev + slope*dx)
    # so the 9 dp rounding is belt-and-braces, not load-bearing
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            F.round(
                prev_v
                + (next_v - prev_v)
                * ((b - prev_b).cast("double") / (next_b - prev_b).cast("double")),
                9,
            ),
        )
    )
    return filled.select(
        key_col,
        bucket_col,
        v.alias("v_obs"),
        v.isNull().alias("gap"),
        # observed = the (key, bucket) existed in the input, even with
        # a NULL value; gap keeps its oracle-pinned meaning (no usable
        # value). They differ exactly on NULL-valued observations.
        F.coalesce(F.col("__seen"), F.lit(False)).alias("observed"),
        prev_v.alias("v_locf"),
        interp.cast("double").alias("v_interp"),
    )


def per_key_view(filled: DataFrame, *, key_col: str, bucket_col: str) -> DataFrame:
    """Derive the ``bounds='per_key'`` result from an already-computed
    ``bounds='global'`` fill — ONE fill pass serves both shapes when a
    caller (q42) carries both legs (round-13 verdict ask; the equality
    this rests on is pinned in tests/test_gapfill.py: inside a key's
    observed [min, max] the global-axis fills match the per-key-axis
    fills exactly, because the extra global-axis rows outside the
    key's life carry only NULL observations, which the IGNORE NULLS
    windows skip, and interpolation needs both endpoints anyway).

    Per-key observed bounds come from the filled frame itself — its
    ``observed`` rows, NOT its non-gap rows (round-14 advice: gap
    means "no usable value", which also flags NULL-VALUED
    observations, so bounds from ~gap shrank at a key whose edge
    observation carried a NULL value; the direct ``bounds='per_key'``
    axis counts every observation row regardless of value nullness,
    and the derived view must match it there too). One tiny hash agg
    broadcast back onto the fill — O(keys) metadata against an
    O(keys x range) frame, vs. re-running axis + join + two window
    sorts for a second fill pass.

    The caller should localCheckpoint ``filled`` when also consuming
    it directly — this function reads it twice (bounds agg + join),
    and an uncheckpointed fill would otherwise recompute per branch
    (the ReuseExchange-never-fires rule from SNIPPETS)."""
    b = F.col(bucket_col)
    kb = (
        filled.filter(F.col("observed"))
        .groupBy(key_col)
        .agg(F.min(b).alias("__lo"), F.max(b).alias("__hi"))
    )
    return (
        filled.join(F.broadcast(kb), key_col)
        .filter(b.between(F.col("__lo"), F.col("__hi")))
        .drop("__lo", "__hi")
        .select(*filled.columns)
    )
