#!/usr/bin/env python
"""Finer-grained q62 stream-leg phase timing: splits each micro-batch
into state-read/anti-join plan, checkpoint job, emptiness guard, and
the write job, plus the full/incremental legs — so the ≤4s budget work
names its slice before cutting (round-11 verdict ask #1)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="q62-profile-fine")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
load(spark, SF_DIR, "documents").limit(1).write.format("noop").mode("overwrite").save()

import etfconstituentextractor_spark.streaming.dedup_index as di
from etfconstituentextractor_spark.plans.llm_dedup import (
    _bands_from_mins,
    _shingle_mins,
    lsh_incremental_pairs,
)


def fine_handler(state_dir: str):
    def handle(batch_df, batch_id):
        t = {}
        t0 = time.perf_counter()
        spark_ = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        st = di._load_state(spark_, state_dir)
        if st is not None:
            st = st.filter(F.col("ingest_batch") < batch_id)
            base_sh = st.filter(F.col("kind") == "shingles").select("doc_id", "shingles")
            base_bands = st.filter(F.col("kind") == "bands").select("doc_id", "band", "sig")
            docs = docs.join(base_sh.select("doc_id"), "doc_id", "left_anti")
        else:
            base_sh = spark_.createDataFrame([], "doc_id bigint, shingles array<string>")
            base_bands = spark_.createDataFrame([], "doc_id bigint, band int, sig string")
        t["plan"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        sh_mins = _shingle_mins(
            docs, width=int(spark_.conf.get("spark.sql.shuffle.partitions"))
        ).localCheckpoint()
        t["ckpt"] = time.perf_counter() - t0

        t0 = time.perf_counter()
        empty = not sh_mins.take(1)
        t["guard"] = time.perf_counter() - t0
        if empty:
            return

        t0 = time.perf_counter()
        sh_d = sh_mins.select("doc_id", "shingles")
        bands_d = _bands_from_mins(sh_mins)
        pairs = lsh_incremental_pairs(
            None, docs, base_index=(base_sh, base_bands), delta_index=(sh_d, bands_d)
        )
        out = (
            di._tagged(pairs, "pairs")
            .unionByName(di._tagged(bands_d, "bands"))
            .unionByName(di._tagged(sh_d, "shingles"))
        )
        out.repartition(1).write.partitionBy("kind").mode("overwrite").parquet(
            f"{state_dir}/ingest_batch={batch_id}"
        )
        t["write"] = time.perf_counter() - t0
        print(
            f"    batch {batch_id}: "
            + " ".join(f"{k}={v:.3f}" for k, v in t.items()),
            file=sys.stderr,
        )

    return handle


di.lsh_index_batch_handler = fine_handler

from etfconstituentextractor_spark.plans import llm_dedup as ld

for rep in range(3):
    t0 = time.perf_counter()
    stream = ld._q62_stream_leg(spark, SF_DIR)
    t1 = time.perf_counter()
    stream.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    print(
        f"rep {rep}: leg-build (stage+drain) {t1 - t0:.3f}s, "
        f"pairs read-back {t2 - t1:.3f}s, total {t2 - t0:.3f}s",
        file=sys.stderr,
    )
spark.stop()
