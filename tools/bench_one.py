#!/usr/bin/env python
"""Run one registered query bench-style (noop sink, min-of-N)."""
from __future__ import annotations
import gc, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog
from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load
from etfconstituentextractor_spark.schemas import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
load_catalog()
spark = get_session(app_name="bench-one")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for t in TABLES:
    load(spark, SF_DIR, t).limit(1).write.format("noop").mode("overwrite").save()
for name in sys.argv[1:]:
    runs = []
    for i in range(3):
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        del df
        gc.collect(); spark._jvm.System.gc()
    print(f"## {name}: min={min(runs)} runs={runs}", file=sys.stderr)
spark.stop()
