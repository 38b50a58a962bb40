"""Corpus-frequency boilerplate removal (line/paragraph dedup).

The CCNet / RefinedWeb cleaning stage: a line that recurs across many
documents (cookie banners, nav chrome, copyright footers) is template
boilerplate, not content — compute each line's document frequency over
the WHOLE corpus and strip lines at or above a threshold, preserving
the order of what remains.

Reference provenance: the reference engine has no corpus-level
cleaning stage (it processes one filing at a time,
ETFQuarterlyHoldingsExtractor.py:54-132); this operator belongs to the
LLM-pipeline surface (SURVEY.md §2B) modeled on the published CCNet
(Wenzek et al., 2020) and RefinedWeb (Penedo et al., 2023) pipelines.

Scale shape (100 TB): the frequency pass shuffles ONLY per-doc-distinct
64-bit line hashes — never text. The frequent set then flows back two
ways:

* ``strip_boilerplate`` — collapse the frequent set to ONE array row
  and broadcast it into a per-document array filter: document text
  never shuffles at all (zero Exchange on the documents side). Right
  whenever the number of DISTINCT frequent lines fits a broadcast —
  boilerplate is by definition few distinct strings repeated many
  times (CCNet's frequent set is thousands of lines even at web
  scale), so this is the default path.
* ``strip_boilerplate_antijoin`` — the no-broadcast-assumption
  fallback: posexplode lines, hash-only anti join against the frequent
  set, regroup by document. Costs a text shuffle on the regroup, but
  never materializes the frequent set on one executor; use when
  ``min_docs`` is small enough that the frequent set could be huge.

Both paths return identical rows (pinned by tests); 64-bit hash
collisions carry the usual 2^-64 caveat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# NOTE: `delim` is used with F.split, which treats it as a Java regex.
# The default "\n" is regex-safe; callers passing metacharacters must
# escape them.


def _lines(text_col: str, delim: str) -> Column:
    return F.split(F.col(text_col), delim)


def line_doc_frequencies(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Document frequency of each distinct line: (line_hash, n_docs).

    array_distinct runs per-document BEFORE the explode, so the shuffle
    carries at most one (doc, hash) pair per distinct line per doc and
    the aggregate is a plain count — no count-distinct Expand.
    """
    hashes = F.array_distinct(
        F.transform(_lines(text_col, delim), lambda s: F.xxhash64(s))
    )
    return (
        docs.select(F.explode(hashes).alias("line_hash"))
        .groupBy("line_hash")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def frequent_lines(
    docs: DataFrame,
    *,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
) -> DataFrame:
    """Hashes of lines appearing in >= min_docs documents."""
    if min_docs < 2:
        raise ValueError("min_docs < 2 would strip every line")
    return (
        line_doc_frequencies(docs, text_col=text_col, id_col=id_col, delim=delim)
        .filter(F.col("n_docs") >= min_docs)
        .select("line_hash")
    )


def strip_boilerplate(
    docs: DataFrame,
    *,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    out_col: str = "clean_text",
) -> DataFrame:
    """Broadcast-set path: all docs columns + out_col/n_lines/n_kept.

    The frequent set is aggregated to a single array row (always
    exactly one row, empty array when nothing is frequent) and
    broadcast-cross-joined in, so the per-document work is a pure
    array filter inside codegen — document text never shuffles.
    """
    bp = frequent_lines(
        docs, min_docs=min_docs, text_col=text_col, id_col=id_col, delim=delim
    ).agg(F.collect_set("line_hash").alias("__bp"))
    kept = F.filter(
        _lines(text_col, delim),
        lambda s: ~F.array_contains(F.col("__bp"), F.xxhash64(s)),
    )
    return (
        docs.crossJoin(F.broadcast(bp))
        .withColumn("__kept", kept)
        .select(
            *docs.columns,
            F.array_join(F.col("__kept"), delim).alias(out_col),
            F.size(_lines(text_col, delim)).cast("bigint").alias("n_lines"),
            F.size("__kept").cast("bigint").alias("n_kept"),
        )
    )


def strip_boilerplate_antijoin(
    docs: DataFrame,
    *,
    min_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    delim: str = "\n",
    out_col: str = "clean_text",
) -> DataFrame:
    """Shuffle path: same output as strip_boilerplate, no broadcast.

    Lines are exploded with positions, anti-joined on the 64-bit hash
    only, and reassembled in order by an array_sort over (pos, line)
    structs — surviving text shuffles exactly once (the regroup).
    """
    freq = frequent_lines(
        docs, min_docs=min_docs, text_col=text_col, id_col=id_col, delim=delim
    )
    pos = docs.select(
        F.col(id_col).alias("__id"),
        F.posexplode(_lines(text_col, delim)).alias("__pos", "__line"),
    ).withColumn("line_hash", F.xxhash64("__line"))
    clean = (
        pos.join(freq, "line_hash", "left_anti")
        .groupBy("__id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
                delim,
            ).alias(out_col),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    return (
        docs.join(clean, docs[id_col] == clean["__id"], "left")
        .select(
            *docs.columns,
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            F.size(_lines(text_col, delim)).cast("bigint").alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        )
    )
