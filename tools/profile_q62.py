#!/usr/bin/env python
"""Phase timing for q62's stream leg (round-11 verdict ask: the leg
reads 4.9-5.5s settled vs the r9-met 3.88s with no code change —
decompose before trimming). Times the leg's real phases in execution
order — staging (marker-cached), the streaming drain (with per-batch
handler wall time printed from inside foreachBatch), the pairs
read-back — then the OTHER two legs' shared band build, so the whole
q62 budget is named. Run after the full/incremental legs' plan is
warm (the bench runs q62 mid-catalog) is NOT reproduced here: this
isolates the leg on a fresh session, which is the comparable number
for bench_one.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="q62-profile")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()
load(spark, SF_DIR, "documents").limit(1).write.format("noop").mode("overwrite").save()

import etfconstituentextractor_spark.streaming.dedup_index as di

_orig_factory = di.lsh_index_batch_handler


def timed_factory(state_dir):
    inner = _orig_factory(state_dir)

    def handle(batch_df, batch_id):
        t0 = time.perf_counter()
        inner(batch_df, batch_id)
        print(f"    batch {batch_id}: {time.perf_counter() - t0:.3f}s", file=sys.stderr)

    return handle


di.lsh_index_batch_handler = timed_factory

_orig_drain = di.run_stream_dedup


def timed_drain(spark_, source_dir, state_dir, checkpoint_dir):
    t0 = time.perf_counter()
    _orig_drain(spark_, source_dir, state_dir, checkpoint_dir)
    print(f"  drain total: {time.perf_counter() - t0:.3f}s", file=sys.stderr)


di.run_stream_dedup = timed_drain

from etfconstituentextractor_spark.plans import llm_dedup as ld

ld.run_stream_dedup = timed_drain  # if imported by name inside the leg

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

# the other two legs for context: one shared band build + both pair jobs
t0 = time.perf_counter()
q = ld.q62_dedup_minhash_lsh
full_inc = None
d = load(spark, SF_DIR, "documents").select("doc_id", "text")
sh_v1, bands_v1 = ld._shingle_and_bands(d)
t1 = time.perf_counter()
ld._lsh_pairs_from(sh_v1, bands_v1).write.format("noop").mode("overwrite").save()
t2 = time.perf_counter()
print(
    f"batch legs: band build {t1 - t0:.3f}s, full-leg pairs {t2 - t1:.3f}s",
    file=sys.stderr,
)
spark.stop()
