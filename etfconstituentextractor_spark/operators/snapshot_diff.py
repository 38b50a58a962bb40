"""Snapshot diff: inserted / deleted / updated rows between two
versions of a keyed dataset — the change-data-capture primitive for
incremental pipelines (re-dedup only what changed, re-pack only the
shards whose documents moved, audit a corpus refresh).

No reference counterpart (the reference regenerates everything per
run); SURVEY.md §2B "LLM-pipeline" tier adjunct.

Scale posture: both sides reduce to (key, md5-of-compared-columns)
BEFORE the join — the full-outer join shuffles 32-byte hashes plus
keys, never payloads, and equality is one string compare. Unchanged
rows (the overwhelming majority of a 100 TB refresh) are filtered
immediately after the join, so downstream consumers see only the
delta.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def payload_hash(cols: Sequence[str]) -> Column:
    """THE content-hash framing of the CDC family (snapshot_diff,
    scd2_history, incremental_agg's cdc_group_delta): md5 over the
    columns cast to string, null-sentineled (chr(0)+'null') and
    unit-separator-joined, so ('a', NULL) never collides with
    (NULL, 'a') or ('a,',). One definition — the engines' CDC
    operators must never disagree on framing."""
    sentinel = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00null")) for c in cols
    ]
    return F.md5(F.concat_ws("\x1f", *sentinel))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Rows that changed between ``old`` and ``new``: one row per key
    with ``change`` in {'inserted', 'deleted', 'updated'}; unchanged
    keys are omitted. ``compare_cols`` defaults to every shared
    non-key column. ``keys`` must identify rows uniquely on each side
    (the usual keyed-dataset contract) — duplicate keys would fan out
    through the full-outer join like any SQL join would.

    The content hash md5-concats the compared columns with null
    sentinels and a field separator, so (``'a'``, null) never
    collides with (null, ``'a'``) or (``'a,'``,).
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("no columns to compare (all shared columns are keys)")

    def hashed(df: DataFrame, out: str) -> DataFrame:
        return df.select(*keys, payload_hash(compare_cols).alias(out))

    o = hashed(old, "old_hash")
    n = hashed(new, "new_hash")
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        "old_hash",
        "new_hash",
        F.when(F.col("old_hash").isNull(), "inserted")
        .when(F.col("new_hash").isNull(), "deleted")
        .when(F.col("old_hash") != F.col("new_hash"), "updated")
        .alias("change"),
    ).filter(F.col("change").isNotNull())
