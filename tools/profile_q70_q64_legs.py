#!/usr/bin/env python
"""Per-leg noop-sink timing for q70/q64 (round-15 measurement step):
which of the union legs actually carries the 2.3-2.6s these queries
cost, before the Arrow cosine kernel targets any of them.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_q70_q64_legs.py
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: F401,E402  (scratch-dir defaults)
from pyspark.sql import functions as F

from etfconstituentextractor_spark.plans.registry import load_catalog
from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import fanout, load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

load_catalog()
spark = get_session(app_name="profile-q70-q64")
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def timeit(label, fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        del df
        gc.collect()
        spark._jvm.System.gc()
    print(f"# {label}: min={min(runs)}s runs={runs}", file=sys.stderr)


from etfconstituentextractor_spark.plans import llm_similarity as sim
from etfconstituentextractor_spark.plans import llm_dedup as dd
from etfconstituentextractor_spark.operators.semdedup import (
    assign_clusters,
    semantic_dedup,
    semantic_seeds,
)

n_emb = load(spark, SF_DIR, "embeddings").count()
print(f"# embeddings rows: {n_emb}", file=sys.stderr)

# --- q70 legs ---------------------------------------------------------
def q70_float():
    emb = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    e = sim._vec(emb)
    q = e.filter(F.col("vec_id") < sim._N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    c = e.filter(F.col("vec_id") >= sim._N_QUERIES).select(
        F.col("vec_id").alias("candidate_id"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    dot = F.expr("aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x)")
    return c.crossJoin(F.broadcast(q)).select(
        "query_id", "candidate_id",
        F.round(dot / (F.col("qn") * F.col("cn")), 6).alias("score"),
    )


def q70_int8():
    from etfconstituentextractor_spark.operators.quantize import (
        int8_cosine_topk, quantize_int8,
    )
    emb = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    e = sim._vec(emb)
    qz = quantize_int8(e.select("vec_id", "v"), "v")
    return int8_cosine_topk(
        qz.filter(F.col("vec_id") >= sim._N_QUERIES).select(F.col("vec_id").alias("id"), "q"),
        qz.filter(F.col("vec_id") < sim._N_QUERIES).select(F.col("vec_id").alias("qid"), "q"),
        k=sim._TOP_K,
    )


def q70_pq():
    from etfconstituentextractor_spark.operators.pq import (
        pq_adc_join_topk, pq_encode, train_pq_codebooks,
    )
    emb = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    e = sim._vec(emb)
    cb = train_pq_codebooks(emb, m=sim._PQ_M, ksub=sim._PQ_KSUB, sample_n=sim._PQ_KSUB, iters=0)
    enc = pq_encode(emb.filter(F.col("vec_id") >= sim._N_QUERIES), cb, round_dp=9)
    return pq_adc_join_topk(
        enc, e.filter(F.col("vec_id") < sim._N_QUERIES).select("vec_id", "v"), cb,
        k=sim._TOP_K, qid_col="vec_id", qvec_col="v",
    )


def q70_pqfp():
    from etfconstituentextractor_spark.operators.pq_fixedpoint import (
        fixed_point_subvectors, pqfp_adc_topk, pqfp_assign, pqfp_train,
    )
    emb = load(spark, SF_DIR, "embeddings").repartition(
        spark.sparkContext.defaultParallelism, "vec_id"
    )
    fpts = fixed_point_subvectors(emb, m=sim._PQFP_M, dsub=sim._PQFP_DSUB, scale=sim._PQFP_SCALE)
    fcand = fpts.filter(F.col("vec_id") >= sim._N_QUERIES)
    fq = fpts.filter(F.col("vec_id") < sim._N_QUERIES).select(
        F.col("vec_id").alias("qid"), "sub_id", F.col("sv").alias("qv")
    )
    fcb = sim._pqfp_codebook_cached(spark, SF_DIR, fcand, pqfp_train)
    fcodes = pqfp_assign(fcand, fcb, dsub=sim._PQFP_DSUB).select("vec_id", "sub_id", "code")
    return pqfp_adc_topk(fcodes, fq, fcb, k=sim._TOP_K, dsub=sim._PQFP_DSUB)


# --- q64 legs ---------------------------------------------------------
def q64_pairs():
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    return dd.embedding_cosine_pairs(e)


def q64_semantic():
    e = load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    ev = fanout(e, "vec_id").withColumn(
        "nrm", F.sqrt(F.expr("aggregate(transform(v, x -> x * x), 0D, (acc, x) -> acc + x)")),
    )
    assigned = assign_clusters(ev, semantic_seeds(ev, dd._Q66_SEEDS)).localCheckpoint()
    return semantic_dedup(assigned, tau=dd._Q66_TAU, cap=dd._Q66_MAX_CLUSTER)


timeit("q70 float leg", q70_float)
timeit("q70 int8 leg", q70_int8)
timeit("q70 pq leg", q70_pq)
timeit("q70 pqfp leg", q70_pqfp)
timeit("q64 pairs leg", q64_pairs)
timeit("q64 semantic leg (incl assign ckpt)", q64_semantic)
spark.stop()
