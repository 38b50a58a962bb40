#!/usr/bin/env python
"""Streaming-class variance root-cause probe (round 12): q55/q58 swing
~30% across settled windows while CPU probes (JVM and Python) sit
near 1.0. Hypothesis: per-micro-batch checkpoint WAL writes (offset
log, commit log) fsync to /tmp's real disk, so host WRITE-LATENCY
state — not CPU — is the swinging resource for this query class.

Test: interleave (a) q55 end-to-end runs, (b) a pure fsync probe (20
small create+write+fsync cycles in /tmp, p50 reported), and (c) the
CPU py-probe, several reps. If q55's wall time tracks the fsync probe
and not the CPU probes, the class's variance is disk-latency noise —
the honest fix is exposing it in bench.py (an fsync probe column), not
hiding it (tmpfs checkpoints would benchmark a deployment nobody
runs)."""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load
from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def fsync_probe_ms() -> float:
    """p50 of 20 create+write+fsync+unlink cycles (ms)."""
    lat = []
    d = tempfile.gettempdir()
    for i in range(20):
        p = os.path.join(d, f".fsync_probe_{os.getpid()}_{i}")
        t0 = time.perf_counter()
        fd = os.open(p, os.O_CREAT | os.O_WRONLY, 0o600)
        os.write(fd, b"x" * 4096)
        os.fsync(fd)
        os.close(fd)
        lat.append((time.perf_counter() - t0) * 1000)
        os.unlink(p)
    lat.sort()
    return round(lat[len(lat) // 2], 3)


load_catalog()
spark = get_session(app_name="stream-variance-probe")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
load(spark, SF_DIR, "events").limit(1).write.format("noop").mode("overwrite").save()

rows = []
for rep in range(6):
    fs_before = fsync_probe_ms()
    t0 = time.perf_counter()
    spark.range(30_000_000).selectExpr("sum(sin(id * 1e-6))").collect()
    cpu = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    QUERIES["q55_stream_tumbling_sliding"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    q55 = round(time.perf_counter() - t0, 3)
    fs_after = fsync_probe_ms()
    rows.append(
        {"rep": rep, "fsync_ms_before": fs_before, "fsync_ms_after": fs_after,
         "cpu_probe_s": cpu, "q55_s": q55}
    )
    print(f"# rep {rep}: q55 {q55}s cpu {cpu}s fsync {fs_before}/{fs_after}ms",
          file=sys.stderr)

print(json.dumps({"sf_dir": SF_DIR, "rows": rows}, indent=1))
