"""Text-analysis queries over `documents` (SURVEY.md §2B
"LLM-pipeline — text analysis"; TESTDATA documents table).

Everything is built-in column expressions — at 100 TB these run inside
whole-stage codegen with zero Python. The only shuffle in the module
is q81's token groupBy (partial map-side counts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.text import (
    LANG_STOPWORDS,
    STOPWORDS,
    hex_to_long,
    minhash,
    simhash_bits,
    spark_shingles,
    sql_hex_to_long,
    sql_minhash,
    sql_shingles,
    sql_simhash_bits,
    sql_stopword_hits,
    sql_tokens,
    stopword_hits,
    tokens,
)
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load


# ---------------------------------------------------------------------------
# q80 — document quality scoring: token counts, average token length,
# stopword ratio, punctuation ratio → composite score + band. The
# standard "keep/filter" features of a pretraining data pipeline.
# ---------------------------------------------------------------------------
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

@query(
    "q80_text_quality_score",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id, lang, source,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) AS n_chars_m,
             {sql_stopword_hits(sql_tokens(), STOPWORDS)} AS stop_hits,
             length(text) - length(regexp_replace(text, '[.,;!?]', '', 'g')) AS punct_hits
      FROM documents
    )
    SELECT doc_id, lang, source, n_tokens,
           CAST(ROUND((n_chars_m - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), 4) AS DOUBLE) AS avg_token_len,
           CAST(ROUND(stop_hits / CAST(n_tokens AS DOUBLE), 4) AS DOUBLE) AS stop_ratio,
           CAST(ROUND(punct_hits / CAST(n_chars_m AS DOUBLE), 4) AS DOUBLE) AS punct_ratio,
           CASE WHEN n_tokens >= 40 AND stop_hits / CAST(n_tokens AS DOUBLE) >= 0.05 THEN 'keep'
                WHEN n_tokens >= 15 THEN 'review'
                ELSE 'drop' END AS quality_band
    FROM feats
    """,
)
def q80_text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = tokens()
    n_tokens = F.size(toks)
    n_chars_m = F.length("text")
    stop_hits = stopword_hits("split(text, ' ')", STOPWORDS)
    punct_hits = n_chars_m - F.length(F.regexp_replace("text", r"[.,;!?]", ""))
    stop_ratio = stop_hits / n_tokens.cast("double")
    return d.select(
        "doc_id",
        "lang",
        "source",
        n_tokens.alias("n_tokens"),
        F.round((n_chars_m - (n_tokens - 1)) / n_tokens.cast("double"), 4)
        .cast("double")
        .alias("avg_token_len"),
        F.round(stop_ratio, 4).cast("double").alias("stop_ratio"),
        F.round(punct_hits / n_chars_m.cast("double"), 4).cast("double").alias("punct_ratio"),
        F.when((n_tokens >= 40) & (stop_ratio >= 0.05), "keep")
        .when(n_tokens >= 15, "review")
        .otherwise("drop")
        .alias("quality_band"),
    )


# ---------------------------------------------------------------------------
# q81 — corpus token frequencies (tokenize → explode → count). The
# explode fans each document into its tokens; partial aggregation
# collapses them map-side before the single shuffle on token.
# ---------------------------------------------------------------------------
@query(
    "q81_text_token_counts",
    oracle="""
    SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING COUNT(*) >= 5
    """,
)
def q81_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(tokens()).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n") >= 5)
    )


# ---------------------------------------------------------------------------
# q82 — language identification: stopword-hit voting across per-language
# wordlists, deterministic precedence on ties. (The heuristic n-gram
# family of langid, expressed as pure column algebra.)
# ---------------------------------------------------------------------------
_LANGS = ("en", "es", "de", "fr", "zh")


@query(
    "q82_text_langid",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id, lang,
             {', '.join(f"{sql_stopword_hits(sql_tokens(), LANG_STOPWORDS[lg])} AS h_{lg}" for lg in _LANGS)}
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN h_en >= h_es AND h_en >= h_de AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                WHEN h_es >= h_de AND h_es >= h_fr AND h_es >= h_zh THEN 'es'
                WHEN h_de >= h_fr AND h_de >= h_zh THEN 'de'
                WHEN h_fr >= h_zh THEN 'fr'
                ELSE 'zh' END AS lang_guess,
           h_en + h_es + h_de + h_fr + h_zh AS total_hits
    FROM hits
    """,
)
def q82_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    tok_expr = "split(text, ' ')"
    hits = {lg: stopword_hits(tok_expr, LANG_STOPWORDS[lg]) for lg in _LANGS}
    h = {lg: F.col(f"h_{lg}") for lg in _LANGS}
    guess = (
        F.when(
            (h["en"] >= h["es"]) & (h["en"] >= h["de"]) & (h["en"] >= h["fr"]) & (h["en"] >= h["zh"]),
            "en",
        )
        .when((h["es"] >= h["de"]) & (h["es"] >= h["fr"]) & (h["es"] >= h["zh"]), "es")
        .when((h["de"] >= h["fr"]) & (h["de"] >= h["zh"]), "de")
        .when(h["fr"] >= h["zh"], "fr")
        .otherwise("zh")
    )
    return (
        d.select("doc_id", "lang", *[hits[lg].alias(f"h_{lg}") for lg in _LANGS])
        .select(
            "doc_id",
            "lang",
            guess.alias("lang_guess"),
            (h["en"] + h["es"] + h["de"] + h["fr"] + h["zh"]).alias("total_hits"),
        )
    )


# ---------------------------------------------------------------------------
# q83 — document fingerprinting: whole-doc content hash, 3-shingle
# minhash, and a 64-bit-ish integer fingerprint (hex→int of the hash
# prefix) for compact storage/joins.
# ---------------------------------------------------------------------------
@query(
    "q83_text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, {sql_tokens()} AS toks, md5(text) AS doc_md5 FROM documents)
    SELECT doc_id, doc_md5,
           {sql_hex_to_long("substr(doc_md5, 1, 8)")} AS fp_int,
           {sql_minhash(sql_shingles('toks'))} AS minhash_sig
    FROM t
    """,
)
def q83_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", tokens().alias("toks"), F.md5("text").alias("doc_md5"))
        .select(
            "doc_id",
            "doc_md5",
            hex_to_long("substring(doc_md5, 1, 8)").alias("fp_int"),
            minhash(spark_shingles("toks")).alias("minhash_sig"),
        )
    )


# ---------------------------------------------------------------------------
# q84 — simhash fingerprints + exact-bucket sizes (near-dup families
# collapse to the same 16-bit signature).
# ---------------------------------------------------------------------------
@query(
    "q84_text_simhash",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {sql_simhash_bits(sql_tokens())} AS simhash16 FROM documents
    )
    SELECT doc_id, simhash16,
           COUNT(*) OVER (PARTITION BY simhash16) AS bucket_size
    FROM s
    """,
)
def q84_text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    s = d.select("doc_id", simhash_bits("split(text, ' ')").alias("simhash16"))
    return s.withColumn("bucket_size", F.count(F.lit(1)).over(W.partitionBy("simhash16")))
