"""Incremental maintenance of HLL distinct-count sketches through a
CDC feed (SURVEY.md §2B "Aggregations — approx count distinct" ×
"snapshot diff" composition; round 11).

A COUNT(DISTINCT) materialized view cannot be maintained by the
(count, sum) delta algebra of `operators/incremental_agg.py` —
distinctness is not invertible. The standard production answer is a
MERGEABLE SKETCH as the view state: HLL registers are a per-(group,
bucket) MAX, so

- INSERT-only deltas maintain exactly: ``state' = max-merge(state,
  registers(delta))`` — O(|delta| + touched groups' registers), never
  a corpus re-scan, and the result is BIT-IDENTICAL to a full rebuild
  (max is commutative/associative/idempotent — re-delivered rows are
  even absorbed for free);
- UPDATE/DELETE deltas cannot be subtracted out of a max — the
  affected GROUPS rebuild from the current table state (O(rows of
  dirty groups), still far below O(corpus) for a sparse delta), while
  every untouched group keeps its state untouched.

``hll_cdc_maintain`` derives both paths from one
``snapshot_changes(include_values=True)`` feed. The maintained ==
recomputed identity is pinned REGISTER-FOR-REGISTER in
tests/test_incremental_hll.py, which is a stronger check than
estimate equality.

Scale posture: register state is at most m rows per group (fixed
memory, the mergeable-sketch property `operators/hll.py` documents);
the merge shuffles (group, bucket) register rows only; the rebuild
path scans only the dirty groups' rows via a broadcast semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.hll import (
    _consts,
    hll_registers,
)


def hll_merge_registers(
    state: DataFrame, delta_regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """max-merge two register frames (group, __b, __reg) — the
    mergeable-sketch union. Outer on (group, bucket), null-SAFE on
    the group columns: NULL is a real group and its registers on the
    two sides must merge, not duplicate (a plain USING join never
    matches NULL = NULL)."""
    on = [*group_cols, "__b"]
    a = state.select(
        *[F.col(c).alias(f"__a_{c}") for c in on], F.col("__reg").alias("__reg_a")
    )
    b = delta_regs.select(
        *[F.col(c).alias(f"__b_{c}") for c in on], F.col("__reg").alias("__reg_b")
    )
    cond = None
    for c in on:
        eq = a[f"__a_{c}"].eqNullSafe(b[f"__b_{c}"])
        cond = eq if cond is None else (cond & eq)
    return a.join(b, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"__a_{c}"), F.col(f"__b_{c}")).alias(c)
            for c in on
        ],
        F.greatest(
            F.coalesce(F.col("__reg_a"), F.lit(0)),
            F.coalesce(F.col("__reg_b"), F.lit(0)),
        ).alias("__reg"),
    )


def hll_cdc_maintain(
    state: DataFrame,
    feed: DataFrame,
    previous: DataFrame,
    current: DataFrame,
    keys: list[str],
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """The next register state given the previous ``state`` (group,
    __b, __reg), a change ``feed`` (snapshot_changes with
    ``include_values=True`` — rows carry ``change`` plus the NEW
    values), ``previous``/``current`` (the table at the feed's from-
    and to-versions — snapshot_read(v) frames; time travel makes the
    old version exactly as readable as the new).

    Insert rows merge into state; every group an update/delete
    touched REBUILDS from ``current`` (old contributions cannot be
    subtracted from a max). Dirty groups are keyed from BOTH
    versions: an update that moves a row between groups dirties its
    OLD group too, and a delete's group exists only in ``previous``
    — deriving dirty groups from the new side alone would leave
    stale contributions behind (a group whose every row was deleted
    simply drops, matching the recompute).

    NULL-KEY rows are outside the keyed-dataset contract (the same
    rule snapshot_replicate enforces): snapshot_diff's key join can
    never match them, so null-keyed tables surface phantom
    inserted+deleted pairs every version, and the dirty-key semi-
    joins below use plain (null-rejecting) equality. Feed rows with
    a NULL key are dropped here (round-12 advice) — give rows real
    keys if their changes must maintain the sketch.
    """
    nn = None
    for c in keys:
        p_ = F.col(c).isNotNull()
        nn = p_ if nn is None else (nn & p_)
    feed = feed.filter(nn)
    inserts = feed.filter(F.col("change") == "inserted")
    dirty_keys = (
        feed.filter(F.col("change") != "inserted").select(*keys).distinct()
    )
    dirty = (
        previous.join(F.broadcast(dirty_keys), keys, "left_semi")
        .select(*group_cols)
        .unionByName(
            current.join(F.broadcast(dirty_keys), keys, "left_semi").select(
                *group_cols
            )
        )
        .distinct()
        .localCheckpoint()
    )

    # NULL is a real group (hll_registers' groupBy keeps it, so the
    # recompute has it) — the dirty-group membership tests must be
    # null-SAFE or a dirty NULL group would neither rebuild nor drop,
    # stranding stale registers (round-11 review)
    def _semi(df, how):
        d = F.broadcast(dirty.select(*[F.col(c).alias(f"__d_{c}") for c in group_cols]))
        cond = None
        for c in group_cols:
            eq = df[c].eqNullSafe(d[f"__d_{c}"])
            cond = eq if cond is None else (cond & eq)
        return df.join(d, cond, how)

    # rebuild dirty groups from current; drop them from carried state
    rebuilt = hll_registers(
        _semi(current, "left_semi"), group_cols, value_col, p
    )
    kept = _semi(state, "left_anti")
    merged = hll_merge_registers(
        kept,
        hll_registers(_semi(inserts, "left_anti"), group_cols, value_col, p),
        group_cols,
    )
    return merged.unionByName(rebuilt)
