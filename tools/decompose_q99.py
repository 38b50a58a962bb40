#!/usr/bin/env python
"""Per-stage timing for the q99 curation pipeline (round-11 verdict
ask: name which composed stage grew). Times CUMULATIVE PREFIXES of the
pipeline bench-style (noop sink, min-of-3) so stage cost = successive
difference — the same way the pipeline actually executes, including
cross-stage plan reuse.
"""
from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.components import connected_components
from etfconstituentextractor_spark.operators.contamination import ngram_contamination
from etfconstituentextractor_spark.operators.text import STOPWORDS, stopword_hits
from etfconstituentextractor_spark.plans.llm_dedup import lsh_pairs
from etfconstituentextractor_spark.session import get_session
from etfconstituentextractor_spark.sources.tables import load

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_session(app_name="q99-decompose")
spark.range(1_000_000).selectExpr("sum(id)").collect()
load(spark, SF_DIR, "documents").limit(1).write.format("noop").mode("overwrite").save()


def featured_frame():
    docs = load(spark, SF_DIR, "documents")
    toks = "split(text, ' ')"
    return docs.select(
        "doc_id",
        "text",
        "lang",
        F.expr(f"size({toks})").alias("n_tokens"),
        stopword_hits(toks, STOPWORDS).alias("stop_hits"),
        F.md5("text").alias("content_hash"),
    ).withColumn(
        "quality_pass",
        (F.col("n_tokens") >= 15) & (F.col("stop_hits") / F.col("n_tokens") >= 0.02),
    )


def with_contamination(featured):
    # MIRRORS pipeline/curation.py's shipped stage (materialized
    # contaminated-ids broadcast — round 11); this tool deliberately
    # restates the stage bodies so cumulative prefixes can be timed,
    # which means any curation.py stage change must be copied here or
    # the attribution measures a plan the pipeline no longer runs
    # (round-11 third review caught exactly that drift).
    docs = load(spark, SF_DIR, "documents")
    eval_docs = docs.filter((F.col("doc_id") % 43) == 0).select("doc_id", "text")
    cont_ids = (
        ngram_contamination(
            featured.filter(F.col("quality_pass")).select("doc_id", "text"),
            eval_docs,
            contaminated_at=8,
        )
        .filter(F.col("verdict") == "contaminated")
        .select("doc_id", F.lit(True).alias("contaminated"))
        .coalesce(8)
        .localCheckpoint()
    )
    return featured.join(F.broadcast(cont_ids), "doc_id", "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def with_exact(featured):
    eligible = F.col("quality_pass") & ~F.col("contaminated")
    w_exact = W.partitionBy("content_hash")
    return featured.withColumn(
        "is_exact_keeper",
        ~eligible
        | (F.col("doc_id") == F.min(F.when(eligible, F.col("doc_id"))).over(w_exact)),
    )


def stage(name, frame_fn):
    runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = frame_fn()
        df.write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
        del df
        gc.collect()
        spark._jvm.System.gc()
    print(f"## {name}: min={min(runs)} runs={runs}", file=sys.stderr)
    return min(runs)


def s1():
    return featured_frame()


def s2():
    return with_contamination(featured_frame())


def s3():
    return with_exact(with_contamination(featured_frame()))


def s4():
    flagged = with_exact(with_contamination(featured_frame()))
    eligible = F.col("quality_pass") & ~F.col("contaminated")
    survivors = flagged.filter(eligible & F.col("is_exact_keeper"))
    return lsh_pairs(survivors.select("doc_id", "text"))


def s5():
    flagged = with_exact(with_contamination(featured_frame()))
    eligible = F.col("quality_pass") & ~F.col("contaminated")
    survivors = flagged.filter(eligible & F.col("is_exact_keeper"))
    pairs = lsh_pairs(survivors.select("doc_id", "text"))
    return connected_components(
        pairs, src="doc_a", dst="doc_b", shuffle_partitions=8
    ).select(F.col("node").alias("doc_id"), "component")


def s6():
    from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog

    load_catalog()
    return QUERIES["q99_curation_pipeline_e2e"](spark, SF_DIR)


for name, fn in [
    ("1 featured (quality features)", s1),
    ("2 + contamination", s2),
    ("3 + exact-keeper window", s3),
    ("4 + lsh_pairs (survivors)", s4),
    ("5 + connected components", s5),
    ("6 full q99 (assembly + mix)", s6),
]:
    stage(name, fn)
spark.stop()
