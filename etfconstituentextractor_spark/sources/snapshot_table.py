"""Versioned snapshot tables — manifest-committed parquet with
time-travel reads (SURVEY.md §4 "layout levers"; the catalog/manifest
indirection `operators/compaction.py`'s consistency contract says
concurrent readers need — no reference counterpart, the reference
overwrites one CSV per run, `ETFQuarterlyHoldingsExtractor.py:135-143`).

This is the lakehouse commit protocol (Iceberg/Delta's core idea) in
its minimal single-manifest form:

- every commit writes its data files to a fresh, never-reused
  directory (`data/v00000007-<uuid>/`) — data files are IMMUTABLE;
- a commit becomes visible by publishing ONE manifest
  (`_manifests/v00000007.json`) listing every file of that version —
  relative paths, so the table relocates;
- the manifest is written to a temp name and RENAMED into place;
  Hadoop rename-without-overwrite fails if the destination exists, so
  two racing committers serialize: exactly one wins the version, the
  loser gets ConcurrentCommitError and retries on the new latest.
  A crashed committer leaves only temp garbage and an orphaned data
  dir — never a partial manifest, never a corrupt table;
- readers resolve a version (default: latest) to its file list and
  read exactly those files: snapshot isolation for free, since no
  committed file is ever mutated. Time travel = read an older
  manifest.

Scale posture: data writes are ordinary distributed Spark writes; the
commit itself is O(1) metadata (one rename), independent of data
size; reads plan from the manifest's file list so a version's scan
never depends on directory listing races. All filesystem access goes
through the Hadoop FileSystem API (object-store parity, the
compaction.py discipline), with the single caveat real table formats
solve harder: rename-without-overwrite is atomic on HDFS/local but
only best-effort on some object stores — production systems use a
catalog conditional-swap there; the protocol shape is identical.

The honest scope line: one manifest per version (a real 100 TB table
shards manifests and adds column stats for pruning), and append and
overwrite commits only (no row-level MERGE — pair with
operators/snapshot_diff.py to compute deltas and rewrite).
``snapshot_vacuum`` is the retention sweep: expire old versions and
remove unreferenced data dirs, manifests-first so a crash can only
leave garbage, never break a readable version.
"""

from __future__ import annotations

import json
import posixpath
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "ConcurrentCommitError",
    "snapshot_commit",
    "snapshot_read",
    "snapshot_versions",
    "snapshot_vacuum",
]

_MANIFEST_RE = re.compile(r"^v(\d{8})\.json$")


class ConcurrentCommitError(RuntimeError):
    """Another committer published this version first — re-read the
    latest version and retry."""


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p, jvm


def _list_versions(fs, jvm, table: str) -> list[int]:
    mdir = jvm.org.apache.hadoop.fs.Path(posixpath.join(table, "_manifests"))
    if not fs.exists(mdir):
        return []
    out = []
    for st in fs.listStatus(mdir):
        m = _MANIFEST_RE.match(st.getPath().getName())
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _read_manifest(fs, jvm, table: str, version: int) -> dict:
    p = jvm.org.apache.hadoop.fs.Path(
        posixpath.join(table, "_manifests", f"v{version:08d}.json")
    )
    if not fs.exists(p):
        raise FileNotFoundError(f"version {version} of {table} does not exist")
    text = jvm.org.apache.commons.io.IOUtils.toString(fs.open(p), "UTF-8")
    return json.loads(text)


def snapshot_versions(spark: SparkSession, path: str) -> list[dict]:
    """Commit metadata for every version, oldest first."""
    fs, _, jvm = _fs_path(spark, path)
    return [
        {k: m[k] for k in ("version", "op", "n_files", "parent")}
        for m in (_read_manifest(fs, jvm, path, v) for v in _list_versions(fs, jvm, path))
    ]


def snapshot_commit(df: DataFrame, path: str, mode: str = "append") -> int:
    """Write ``df`` as the table's next version; returns the version.

    mode='append' extends the parent version's file list; 'overwrite'
    starts a fresh list (old versions stay readable — nothing is
    deleted). Raises ConcurrentCommitError if another writer published
    the same version first: data files are already written (orphaned,
    harmless), so the retry is cheap only in metadata — callers that
    expect contention should re-derive against the new latest before
    retrying, which is the table-format contract too."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    fs, _, jvm = _fs_path(spark, path)
    versions = _list_versions(fs, jvm, path)
    version = (versions[-1] + 1) if versions else 0
    parent = versions[-1] if versions else None
    if mode == "append" and parent is None:
        mode = "overwrite"  # first commit of a table is a plain write

    reldir = f"data/v{version:08d}-{uuid.uuid4().hex[:8]}"
    datadir = posixpath.join(path, reldir)
    df.write.parquet(datadir)
    files = [
        posixpath.join(reldir, st.getPath().getName())
        for st in fs.listStatus(jvm.org.apache.hadoop.fs.Path(datadir))
        if st.getPath().getName().endswith(".parquet")
    ]
    if mode == "append":
        files = _read_manifest(fs, jvm, path, parent)["files"] + files

    manifest = {
        "version": version,
        "op": mode,
        "parent": parent,
        "n_files": len(files),
        "files": sorted(files),
    }
    mdir = posixpath.join(path, "_manifests")
    tmp = jvm.org.apache.hadoop.fs.Path(
        posixpath.join(mdir, f".tmp-{uuid.uuid4().hex}")
    )
    final = jvm.org.apache.hadoop.fs.Path(
        posixpath.join(mdir, f"v{version:08d}.json")
    )
    out = fs.create(tmp, False)
    out.write(bytearray(json.dumps(manifest).encode("utf-8")))
    out.close()
    # Publishing the fully-written temp manifest under the version
    # name IS the commit, and it must be an ATOMIC no-overwrite claim:
    # exactly one writer can publish v{N}. The primitive is
    # filesystem-specific — POSIX rename() silently REPLACES an
    # existing destination (so Hadoop's local rename gives no
    # no-overwrite guarantee; caught by the race test), hence
    # hardlink-claim there (link(2) fails EEXIST atomically); HDFS
    # rename-without-overwrite is atomic as-is; an object store needs
    # a catalog conditional-put, which is exactly the extra piece real
    # table formats add. A loser's temp is removed and its data dir is
    # orphaned garbage for a retention sweep.
    if fs.getUri().getScheme() == "file":
        import os

        try:
            os.link(tmp.toUri().getPath(), final.toUri().getPath())
        except FileExistsError:
            fs.delete(tmp, False)
            raise ConcurrentCommitError(
                f"version {version} of {path} was committed concurrently"
            ) from None
        fs.delete(tmp, False)  # final shares the inode; also drops the .crc
    else:
        if not fs.rename(tmp, final):
            fs.delete(tmp, False)
            raise ConcurrentCommitError(
                f"version {version} of {path} was committed concurrently"
            )
    return version


def snapshot_vacuum(
    spark: SparkSession, path: str, keep_last: int | None = None
) -> dict:
    """The retention sweep the commit protocol defers to: optionally
    EXPIRE all but the last ``keep_last`` versions (delete their
    manifests — time travel past the horizon ends, exactly Iceberg's
    expire-snapshots contract), then delete every data directory no
    surviving manifest references (failed-commit orphans and
    expired-only data). Returns counts.

    Safety order matters and is the whole design: manifests are
    deleted FIRST, so a crash mid-vacuum can only leave unreferenced
    data (a later vacuum finishes the job), never a manifest whose
    files are gone. Files shared by surviving versions (append
    lineage) survive because liveness is computed from the union of
    surviving manifests' file lists, not from version ancestry. A
    concurrent committer can never lose data to vacuum: its data dir
    is unreferenced only until its manifest publishes, and vacuum
    snapshots the manifest list BEFORE listing data dirs — a dir
    created after the snapshot is newer than every manifest read and
    is skipped (left for the next sweep) rather than raced.
    """
    if keep_last is not None and keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    fs, _, jvm = _fs_path(spark, path)
    versions = _list_versions(fs, jvm, path)
    if not versions:
        raise FileNotFoundError(f"{path} has no committed versions")
    expired = versions[:-keep_last] if keep_last is not None else []
    for v in expired:
        fs.delete(
            jvm.org.apache.hadoop.fs.Path(
                posixpath.join(path, "_manifests", f"v{v:08d}.json")
            ),
            False,
        )
    survivors = [v for v in versions if v not in expired]
    live_dirs = set()
    for v in survivors:
        for f in _read_manifest(fs, jvm, path, v)["files"]:
            live_dirs.add(posixpath.dirname(f))
    ddir = jvm.org.apache.hadoop.fs.Path(posixpath.join(path, "data"))
    removed = 0
    if fs.exists(ddir):
        newest_manifest = max(survivors)
        for st in fs.listStatus(ddir):
            name = st.getPath().getName()
            if posixpath.join("data", name) in live_dirs:
                continue
            # skip dirs younger than the manifest snapshot we planned
            # from: they may belong to an in-flight commit
            mver = re.match(r"^v(\d{8})-", name)
            if mver and int(mver.group(1)) > newest_manifest:
                continue
            fs.delete(st.getPath(), True)
            removed += 1
    return {
        "expired_versions": len(expired),
        "removed_dirs": removed,
        "surviving_versions": survivors,
    }


def snapshot_read(
    spark: SparkSession, path: str, version: int | None = None, merge_schema: bool = False
) -> DataFrame:
    """The table at ``version`` (default: latest) — exactly that
    manifest's files, immune to concurrent commits and uncommitted
    writer garbage in the directory."""
    fs, _, jvm = _fs_path(spark, path)
    if version is None:
        versions = _list_versions(fs, jvm, path)
        if not versions:
            raise FileNotFoundError(f"{path} has no committed versions")
        version = versions[-1]
    m = _read_manifest(fs, jvm, path, version)
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[posixpath.join(path, f) for f in m["files"]])
