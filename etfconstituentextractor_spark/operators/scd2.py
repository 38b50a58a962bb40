"""SCD2 history build: collapse a sequence of keyed snapshots into
validity intervals — the warehouse-side complement of
``snapshot_diff`` (which emits one delta between TWO versions; this
materializes the full type-2 slowly-changing-dimension history across
N versions, the table an incremental 100 TB pipeline keeps instead of
re-deriving deltas per run).

No reference counterpart (the reference regenerates everything per
run); SURVEY.md §2B "LLM-pipeline — snapshot diff" tier adjunct.

Semantics (gaps-and-islands): per key, order its present-in-snapshot
rows by version; a new interval starts when the key (a) first
appears, (b) re-appears after an absent version (delete +
re-insert), or (c) changes content hash. Each interval reports
[valid_from, valid_to] in version numbers and ``is_current`` when it
reaches the latest version — so a deleted key's last interval closes
at its last present version, exactly.

Scale posture: each snapshot reduces to (key, version, md5) BEFORE
the union — the one shuffle partitions by key and carries 32-byte
hashes, never payloads; the island assignment is two window passes
over that narrow frame and the interval collapse is an ordinary
partial-aggregating groupBy. Same hash framing as snapshot_diff
(null sentinel + unit separator), so the two operators agree on what
"changed" means.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.snapshot_diff import payload_hash


def scd2_history(
    snapshots: Sequence[tuple[int, DataFrame]],
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """One row per (key, validity interval):
    (*keys, row_hash, valid_from, valid_to, is_current).

    ``snapshots`` is [(version, df), ...]; versions must be distinct.
    ``compare_cols`` defaults to the non-key columns shared by every
    snapshot. Keys must identify rows uniquely within each snapshot
    (the keyed-dataset contract shared with snapshot_diff).
    """
    keys = list(keys)
    if not snapshots:
        raise ValueError("need at least one snapshot")
    versions = [v for v, _ in snapshots]
    if len(set(versions)) != len(versions):
        raise ValueError(f"duplicate snapshot versions: {versions}")
    if compare_cols is None:
        shared = set(snapshots[0][1].columns)
        for _, df in snapshots[1:]:
            shared &= set(df.columns)
        compare_cols = [c for c in snapshots[0][1].columns if c in shared and c not in keys]
    if not compare_cols:
        raise ValueError("no columns to compare (all shared columns are keys)")
    latest = max(versions)

    def hashed(df: DataFrame, version: int) -> DataFrame:
        return df.select(
            *keys,
            F.lit(version).alias("__version"),
            payload_hash(compare_cols).alias("row_hash"),
        )

    rows = hashed(snapshots[0][1], snapshots[0][0])
    for v, df in snapshots[1:]:
        rows = rows.unionByName(hashed(df, v))

    w = W.partitionBy(*keys).orderBy("__version")
    new_island = (
        F.lag("__version").over(w).isNull()
        | (F.lag("__version").over(w) != F.col("__version") - 1)
        | (F.lag("row_hash").over(w) != F.col("row_hash"))
    ).cast("int")
    island = F.sum("__island_start").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        rows.withColumn("__island_start", new_island)
        .withColumn("__island", island)
        .groupBy(*keys, "__island")
        .agg(
            F.first("row_hash").alias("row_hash"),
            F.min("__version").alias("valid_from"),
            F.max("__version").alias("valid_to"),
        )
        .select(
            *keys,
            "row_hash",
            "valid_from",
            "valid_to",
            (F.col("valid_to") == latest).alias("is_current"),
        )
    )
