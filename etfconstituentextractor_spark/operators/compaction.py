"""Small-file compaction for FLAT parquet table directories
(SURVEY.md §4 "layout levers" adjunct; no reference counterpart — the
reference writes one CSV once, `ETFQuarterlyHoldingsExtractor.py:
135-143`).

The small-files problem is the standing operational tax of every
incremental 100 TB pipeline: per-batch writers, CDC appends, and
copied-out exports each produce files far below the row-group sweet
spot, and scan planning cost + open-per-file overhead grows with file
COUNT, not bytes. Compaction rewrites a directory to ~target-sized
files:

- sizes come from the Hadoop FileSystem API (works for local paths
  today and object stores unchanged — never a local-only os.walk);
- the rewrite is one `spark.read.parquet → repartition(n) → write`
  with the row count piggybacked on the SAME job via `observe` (no
  second scan); with ``sort_by`` the rewrite re-sorts within files so
  row-group min/max stats survive compaction (pair with
  `operators/zorder.py` for multi-dim clustering);
- the swap is WRITE-NEW → RENAME-OLD-ASIDE → RENAME-NEW-IN, and the
  old directory is removed only after the new one is in place.

Scope guards (refusals, not silent damage): directories holding a
streaming-sink `_spark_metadata` manifest are REJECTED — the manifest
is the sink's exactly-once source of truth and a blind rewrite would
both orphan it and resurrect uncommitted files (compact a streaming
sink by reading THROUGH the manifest into a new plain table instead).
Hive-partitioned (`key=value`) layouts are rejected too — flattening
them would silently destroy partition pruning; compact each leaf
partition directory instead. A leftover `.__compact_old` staging dir
from a previously failed swap is also a hard error (it may hold the
only copy of the data), never silently deleted.

Consistency contract, stated honestly: the two-rename swap is
CRASH-SAFE (every intermediate state keeps a complete copy of the
data somewhere recoverable) but not concurrent-reader-atomic — there
is a window where ``path`` does not exist, and object-store renames
are per-file copies. Concurrent readers need a catalog/manifest
indirection on top (which is exactly what table formats add); batch
maintenance windows do not.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Observation, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def _scan_tree(fs, hpath, jvm):
    """(parquet files [(path, size)], has_sink_manifest, partition_dirs).

    The manifest check probes ``fs.exists(path/_spark_metadata)``
    directly (ADVICE r6): an empty or subdirectory-only manifest dir
    yields no entries from ``listFiles`` and must still trip the
    streaming-sink refusal."""
    files = []
    part_dirs = []
    has_manifest = bool(
        fs.exists(jvm.org.apache.hadoop.fs.Path(hpath, "_spark_metadata"))
    )
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        p = st.getPath()
        name = p.getName()
        parent = p.getParent().getName()
        if parent == "_spark_metadata" or name == "_spark_metadata":
            has_manifest = True
            continue
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            files.append((p.toString(), st.getLen()))
            if "=" in parent:
                part_dirs.append(parent)
    return files, has_manifest, part_dirs


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the flat parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files. ``sort_by`` re-sorts
    within the new files so min/max stats stay selective. See the
    module docstring for the scope guards and the exact consistency
    contract of the rename swap."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    fs, hpath, jvm = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        raise ValueError(f"no such directory: {path}")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_old")
    if fs.exists(old):
        raise RuntimeError(
            f"{old} exists — a previous compaction failed mid-swap and that "
            "directory may hold the only copy of the data; recover it "
            "manually before compacting again"
        )
    files, has_manifest, part_dirs = _scan_tree(fs, hpath, jvm)
    if has_manifest:
        raise ValueError(
            f"{path} holds a streaming-sink _spark_metadata manifest; "
            "compacting in place would orphan the sink's exactly-once "
            "state — read through the manifest into a new table instead"
        )
    if part_dirs:
        raise ValueError(
            f"{path} is hive-partitioned ({sorted(set(part_dirs))[:3]}...); "
            "a flat rewrite would destroy partition pruning — compact each "
            "leaf partition directory instead"
        )
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(sz for _, sz in files)
    n_out = max(1, -(-total // target_bytes))

    obs = Observation("compaction_rows")
    df = spark.read.parquet(path).observe(obs, F.count(F.lit(1)).alias("rows"))
    out = df.repartition(n_out)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)

    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_new")
    if fs.exists(tmp):
        fs.delete(tmp, True)  # tmp never holds the only copy — safe
    out.write.mode("overwrite").parquet(tmp.toString())
    rows = int(obs.get["rows"])
    if not fs.rename(hpath, old):
        raise RuntimeError(f"could not stage old directory aside: {path}")
    if not fs.rename(tmp, hpath):
        # roll back: put the old directory back before failing
        if not fs.rename(old, hpath):
            raise RuntimeError(
                f"compaction swap AND rollback failed: {path} is missing; "
                f"the data is intact at {old} — restore it manually"
            )
        raise RuntimeError(f"could not move compacted directory into {path}")
    fs.delete(old, True)

    after = len(_scan_tree(fs, hpath, jvm)[0])
    return CompactionStats(
        files_before=len(files), files_after=after, bytes_total=total, rows=rows
    )
