"""Small-file compaction for parquet table directories (SURVEY.md §4
"layout levers" adjunct; no reference counterpart — the reference
writes one CSV once, `ETFQuarterlyHoldingsExtractor.py:135-143`).

The small-files problem is the standing operational tax of every
incremental 100 TB pipeline: streaming sinks (q57/q58's per-batch
parquet files), per-partition writers, and CDC appends each produce
files far below the row-group sweet spot, and scan planning cost +
open-per-file overhead grows with file COUNT, not bytes. Compaction
rewrites a directory to ~target-sized files:

- sizes come from the Hadoop FileSystem API (works for local paths
  today and object stores unchanged — never a local-only os.walk);
- the rewrite is one `spark.read.parquet → repartition(n) → write` —
  Spark's shuffle does the binning; with ``sort_by`` the rewrite
  re-sorts within files so row-group min/max stats survive compaction
  (pair with `operators/zorder.py` for multi-dim clustering);
- the swap is WRITE-NEW → RENAME-OLD-AWAY → RENAME-NEW-IN: readers
  either see the old complete directory or the new one, never a
  half-written mix, and the old directory is removed only after the
  new one is in place.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


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


def _parquet_files(fs, hpath):
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith(("_", ".")):
            out.append((st.getPath().toString(), st.getLen()))
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> CompactionStats:
    """Rewrite the parquet directory at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files, atomically (old or new
    directory, never a mix). ``sort_by`` re-sorts within the new
    files so min/max stats stay selective after compaction."""
    if target_bytes < 1:
        raise ValueError(f"target_bytes must be >= 1, got {target_bytes}")
    fs, hpath, jvm = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        raise ValueError(f"no such directory: {path}")
    files = _parquet_files(fs, hpath)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(sz for _, sz in files)
    n_out = max(1, -(-total // target_bytes))

    df = spark.read.parquet(path)
    rows = df.count()
    out = df.repartition(n_out)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)

    tmp = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_new")
    old = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + ".__compact_old")
    for stale in (tmp, old):
        if fs.exists(stale):
            fs.delete(stale, True)
    out.write.mode("overwrite").parquet(tmp.toString())
    if not fs.rename(hpath, old):
        raise RuntimeError(f"could not stage old directory aside: {path}")
    if not fs.rename(tmp, hpath):
        # roll back: put the old directory back before failing
        fs.rename(old, hpath)
        raise RuntimeError(f"could not move compacted directory into {path}")
    fs.delete(old, True)

    after = len(_parquet_files(fs, hpath))
    return CompactionStats(
        files_before=len(files), files_after=after, bytes_total=total, rows=rows
    )
