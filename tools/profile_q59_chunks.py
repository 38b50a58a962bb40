#!/usr/bin/env python
"""q59 replay-chunking sweep (round-12 verdict ask #4, the floor's
LAST lever): partition sweep (r6) and arrow-batch sweep (r11) were
both flat, leaving per-micro-batch fixed overhead x batch count as
the hypothesis. This times the q59 pipeline at n_chunks in {1, 2, 4}
data chunks (sentinel chunk always separate, so micro-batch count is
n_chunks + 1), three reps each, and cross-checks that every variant
produces IDENTICAL session rows (chunking preserves event-time
semantics — the oracle is batch-equivalence).

Verdict criterion: if coarser chunking moves the floor, adopt it in
the bench query (pytest keeps pinning the multi-batch path); if flat,
this file + its committed output is the closing dead-end note.
"""
from __future__ import annotations

import json
import os
import sys
import time
from datetime import timedelta

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load
from etfconstituentextractor_spark.plans.streaming_queries import (
    _FMT_US,
    _Q59_GAP_MIN,
    _Q59_SENTINEL_UID,
)
from etfconstituentextractor_spark.streaming.replay import (
    read_stream,
    run_to_parquet,
    stage_chunks,
)
from etfconstituentextractor_spark.streaming.stateful import sessionize

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="q59-chunk-sweep")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
load(spark, SF_DIR, "events").limit(1).write.format("noop").mode("overwrite").save()
# python worker pre-warm, mirroring bench.py round 12
import pandas as _pd

dp = spark.sparkContext.defaultParallelism
warm = spark.range(dp * 1000, numPartitions=dp)
warm.mapInPandas(lambda it: it, "id bigint").write.format("noop").mode(
    "overwrite"
).save()


def q59_variant(n_chunks: int):
    ev = load(spark, SF_DIR, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel_ts = max_ts + timedelta(minutes=_Q59_GAP_MIN + 60 + 60)
    sentinel = spark.createDataFrame(
        [(-999_000, sentinel_ts, _Q59_SENTINEL_UID, "sentinel", 0.0, "{}")],
        "event_id bigint, ts timestamp_ntz, user_id bigint, "
        "event_type string, value double, props string",
    )
    chunks = stage_chunks(
        spark, SF_DIR, tag=f"q59sweep{n_chunks}", n_chunks=n_chunks,
        extra_last_chunk=sentinel,
    )
    src = (
        read_stream(spark, chunks)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
        .select("user_id", "ts", "value")
    )
    sunk = run_to_parquet(sessionize(src, _Q59_GAP_MIN), f"q59sweep{n_chunks}", SF_DIR)
    return sunk.filter(F.col("user_id") != _Q59_SENTINEL_UID).select(
        "user_id",
        F.date_format("session_start", _FMT_US).alias("session_start"),
        F.date_format("session_end", _FMT_US).alias("session_end"),
        "n",
        F.round("sum_value", 2).alias("sum_value"),
    )


results = {}
hashes = {}
for n in (1, 2, 4):
    reps = []
    for rep in range(3):
        t0 = time.perf_counter()
        out = q59_variant(n)
        out.write.format("noop").mode("overwrite").save()
        reps.append(round(time.perf_counter() - t0, 3))
        if rep == 0:
            # value hash: row count + md5-xor over the sorted rows
            h = out.select(
                F.md5(F.concat_ws("|", *out.columns)).alias("h")
            ).agg(
                F.count("*").alias("n"),
                F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"),
            ).first()
            hashes[n] = (h["n"], str(h["s"]))
    results[f"n_chunks={n}"] = {"runs": reps, "min": min(reps)}
    print(f"# n_chunks={n}: min {min(reps)}s runs {reps}", file=sys.stderr)

equal = len(set(hashes.values())) == 1
print(json.dumps({
    "sweep": "q59 replay chunk count (micro-batches = n_chunks + 1 sentinel)",
    "sf_dir": SF_DIR,
    "results": results,
    "outputs_identical": equal,
    "value_hashes": {str(k): v for k, v in hashes.items()},
}, indent=1))
