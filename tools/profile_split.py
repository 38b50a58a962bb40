#!/usr/bin/env python
"""Split each headline query's bench time into BUILD (the query
function call — plan construction plus any eager driver-side work:
localCheckpoint jobs, convergence loops, fixture staging, cache
probes) and ACTION (the noop-sink execution of the returned frame).

The bench times build+action together; this tool attributes which half
a regression or an optimization actually moved (round-14 optimization
round: eager build work is invisible in explain plans, so a plan-only
audit undercounts queries like q65 whose connected-components loop
runs at build time).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_split.py [names...]
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (HEADLINE + scratch-dir defaults)
from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog
from etfconstituentextractor_spark.schemas import TABLES
from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

load_catalog()
spark = get_session(app_name="profile-split")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for t in TABLES:
    load(spark, SF_DIR, t).limit(1).write.format("noop").mode("overwrite").save()

names = sys.argv[1:] or [n for n in bench.HEADLINE if n in QUERIES]
out = {}
for name in names:
    builds, actions, jobs = [], [], []
    for _ in range(3):
        tracker = spark.sparkContext.statusTracker()
        j0 = len(tracker.getJobIdsForGroup() or [])
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        builds.append(round(t1 - t0, 3))
        actions.append(round(t2 - t1, 3))
        del df
        gc.collect()
        spark._jvm.System.gc()
    out[name] = {
        "build_min": min(builds),
        "action_min": min(actions),
        "builds": builds,
        "actions": actions,
    }
    print(
        f"# {name}: build={min(builds)}s action={min(actions)}s "
        f"(builds {builds}, actions {actions})",
        file=sys.stderr,
    )
print(json.dumps(out))
spark.stop()
