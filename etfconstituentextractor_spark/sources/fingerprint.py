"""Corpus-content cache keys shared by every derived-layout cache
(streaming replay staging, q22's bucketed tables, q86's snapshot
table).

One rule, learned once: a reuse marker must carry per-file
(name, size, mtime_ns) of the SOURCE table, not just a tag. The
round-4 postmortem in streaming/replay.py records the failure mode —
a content-blind marker kept replaying chunks staged before a corpus
refresh — and an mtime-only variant has the dual hole: a rewrite that
preserves mtimes (cp -p, rsync -t) keeps serving stale derived data.
Size + mtime_ns closes both.
"""

from __future__ import annotations

import glob
import os

__all__ = ["table_fingerprint"]


def table_fingerprint(sf_dir: str, table: str) -> str:
    """Identity string for ``<sf_dir>/<table>.parquet`` (single file
    or directory-partitioned layout): per-file (root-relative path,
    size, mtime_ns), order-stable. 'missing' if the table does not
    exist.

    ROOT-RELATIVE path, not basename (round-8 advice): in a
    partitioned layout, partition membership is part of the data —
    a file moved between partition subdirectories with size+mtime
    preserved (rsync -a reshuffle) changes every row's partition
    column, and a basename-keyed fingerprint would keep serving the
    stale derived caches built before the move."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    if os.path.isfile(p):
        paths = [p]
    elif os.path.isdir(p):
        paths = sorted(glob.glob(os.path.join(p, "**", "*.parquet"), recursive=True))
    else:
        paths = []
    parts = []
    for f in paths:
        st = os.stat(f)
        parts.append(f"{os.path.relpath(f, p)}:{st.st_size}:{st.st_mtime_ns}")
    return ";".join(parts) or "missing"
