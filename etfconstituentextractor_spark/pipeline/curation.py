"""End-to-end corpus curation: the LLM-training-data analogue of the
reference's ``run()`` orchestration (R23,
`ETFQuarterlyHoldingsExtractor.py:145-159` — fetch → filter →
extract → accumulate-with-dedup → save), recast over the engine's own
operators as ONE composition:

    quality-score → exact dedup → near-dup grouping → survivors

Every stage is an already-tested engine piece (operators/text.py
expression builders, the q60 keep-first window, q62's banded LSH
pairs, operators/components.py clustering); this module only wires
them and assigns each document a single, auditable verdict. Like the
reference's pipeline, the whole thing is lazy until an action — but
distributed, and with drop DECISIONS as data instead of silently
overwritten dict keys (:158).

Scale posture: every shuffle in the composition carries hashes, keys,
or band signatures — never document text except the one fanout
repartition before shingling; the clustering step's iterative joins
run on the (tiny) near-dup pair set only.

Drop-reason precedence (first applicable wins, so each doc has
exactly one verdict):
1. ``quality``   — fails the length/stopword-ratio gate;
2. ``exact_dup`` — identical content hash, not the smallest doc_id;
3. ``near_dup``  — in a near-dup group, not the representative;
4. ``kept``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.components import connected_components
from etfconstituentextractor_spark.operators.text import STOPWORDS, stopword_hits
from etfconstituentextractor_spark.plans.llm_dedup import lsh_pairs


def curate(
    docs: DataFrame,
    min_tokens: int = 15,
    min_stop_ratio: float = 0.02,
) -> DataFrame:
    """Audit frame for a (doc_id, text, ...) corpus: every input doc,
    its quality features, dedup flags, and a single ``verdict``.

    Survivors are ``verdict = 'kept'``; everything else names the
    first gate that dropped it. Near-dup grouping runs on the
    QUALITY-PASSING, EXACT-DEDUPED subset only — the pair/cluster
    work (the expensive stage) never sees documents an earlier,
    cheaper gate already dropped, which is the stage ordering a real
    corpus pipeline uses.
    """
    toks = "split(text, ' ')"
    featured = docs.select(
        "doc_id",
        "text",
        F.expr(f"size({toks})").alias("n_tokens"),
        stopword_hits(toks, STOPWORDS).alias("stop_hits"),
        F.md5("text").alias("content_hash"),
    ).withColumn(
        "quality_pass",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("stop_hits") / F.col("n_tokens") >= min_stop_ratio),
    )

    w_exact = W.partitionBy("content_hash")
    flagged = featured.withColumn(
        "is_exact_keeper",
        ~F.col("quality_pass")  # exact dedup judged among quality passers only
        | (
            F.col("doc_id")
            == F.min(F.when(F.col("quality_pass"), F.col("doc_id"))).over(w_exact)
        ),
    )

    survivors_in = flagged.filter(F.col("quality_pass") & F.col("is_exact_keeper"))
    pairs = lsh_pairs(survivors_in.select("doc_id", "text"))
    labels = connected_components(pairs, src="doc_a", dst="doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )

    audited = flagged.join(labels, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        "content_hash",
        "quality_pass",
        "is_exact_keeper",
        "component",
        F.when(~F.col("quality_pass"), F.lit("quality"))
        .when(~F.col("is_exact_keeper"), F.lit("exact_dup"))
        .when(
            F.col("component").isNotNull() & (F.col("component") != F.col("doc_id")),
            F.lit("near_dup"),
        )
        .otherwise(F.lit("kept"))
        .alias("verdict"),
    )
    return audited
