"""Corpus-mixing sampling queries over `documents`
(operators/sampling.py; SURVEY.md §2B "LLM-pipeline" tier).

Both legs select rows as a pure function of md5(doc_id) — the only
sampling that is reproducible across reruns and engines, which is
what makes a mixture auditable (and oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.packing import pack_sequences
from etfconstituentextractor_spark.operators.sampling import (
    BUCKETS,
    hash_oversample,
    hash_rate_sample,
    stratified_quota_sample,
)
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load

#: per-language mixture weights (keep-rate per stratum) — the
#: data-mixing step of a pretraining pipeline: oversample the scarce
#: languages, downsample the dominant one.
MIX_RATES = {"en": 0.35, "es": 0.8, "de": 0.6, "fr": 1.0, "zh": 0.15}

#: exact per-language quota for the fixed-size sample leg
QUOTA_K = 25

#: epochs-per-language duplication factors for the with-replacement
#: leg — scarce languages repeat (zh 2-3x, fr 1-2x), the dominant one
#: subsamples (en 40%) through the SAME bucket mechanism
OVER_RATES = {"en": 0.4, "es": 1.0, "de": 1.0, "fr": 1.5, "zh": 2.3}


def _sql_rate_case() -> str:
    return (
        "CASE lang "
        + " ".join(
            f"WHEN '{lg}' THEN {int(round(rate * BUCKETS))}"
            for lg, rate in sorted(MIX_RATES.items())
        )
        + " ELSE 0 END"
    )


def _sql_copies() -> str:
    """n_copies = floor(rate) + (bucket < frac(rate)·BUCKETS)."""
    floor_case = (
        "CASE lang "
        + " ".join(f"WHEN '{lg}' THEN {int(r)}" for lg, r in sorted(OVER_RATES.items()))
        + " ELSE 0 END"
    )
    frac_case = (
        "CASE lang "
        + " ".join(
            f"WHEN '{lg}' THEN {int(round((r - int(r)) * BUCKETS))}"
            for lg, r in sorted(OVER_RATES.items())
        )
        + " ELSE 0 END"
    )
    return f"{floor_case} + CASE WHEN bucket < {frac_case} THEN 1 ELSE 0 END"


# ---------------------------------------------------------------------------
# q83 — stratified mixture sampling, three shapes in one tagged plan:
# - 'rate' leg: deterministic Bernoulli(rate[lang]) via hash bucket —
#   a pure codegen filter, zero shuffle: the at-scale path;
# - 'quota' leg: exactly min(k, |stratum|) rows per language, the k
#   smallest hash buckets — one shuffle on the (low-cardinality)
#   stratum key; Catalyst's WindowGroupLimit pre-prunes map-side
#   (operators/sampling.py docstring);
# - 'oversample' leg: WITH-replacement duplication factors (epochs
#   per language: zh repeats 2-3x, en subsamples to 40%) — codegen
#   copy count + explode(sequence), zero shuffle; rn carries copy_id.
# The `bucket` column is part of the contract so the selection is
# auditable row-by-row; both engines derive it identically
# (md5 hex prefix → bigint → mod).
# ---------------------------------------------------------------------------
@query(
    "q83_sample_stratified_mix",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang, source,
             CAST('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':mix')), 1, 8) AS BIGINT)
               % {BUCKETS} AS bucket
      FROM documents
    )
    SELECT 'rate' AS leg, doc_id, lang, source, bucket, CAST(NULL AS INTEGER) AS rn
    FROM h
    WHERE bucket < {_sql_rate_case()}
    UNION ALL
    SELECT 'quota' AS leg, doc_id, lang, source, bucket, rn FROM (
      SELECT doc_id, lang, source, bucket,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY bucket, doc_id) AS INTEGER) AS rn
      FROM h
    )
    WHERE rn <= {QUOTA_K}
    UNION ALL
    SELECT 'oversample' AS leg, doc_id, lang, source, bucket,
           CAST(unnest(range(1, n_copies + 1)) AS INTEGER) AS rn
    FROM (SELECT h.*, {_sql_copies()} AS n_copies FROM h)
    WHERE n_copies >= 1
    """,
)
def q83_sample_stratified_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    rate_leg = hash_rate_sample(d, MIX_RATES, strat_col="lang", key_col="doc_id").select(
        F.lit("rate").alias("leg"),
        "doc_id",
        "lang",
        "source",
        "bucket",
        F.lit(None).cast("int").alias("rn"),
    )
    quota_leg = stratified_quota_sample(
        d, strat_col="lang", key_col="doc_id", k=QUOTA_K
    ).select(F.lit("quota").alias("leg"), "doc_id", "lang", "source", "bucket", "rn")
    over_leg = hash_oversample(d, OVER_RATES, strat_col="lang", key_col="doc_id").select(
        F.lit("oversample").alias("leg"),
        "doc_id",
        "lang",
        "source",
        "bucket",
        F.col("copy_id").cast("int").alias("rn"),
    )
    return rate_leg.unionByName(quota_leg).unionByName(over_leg)


# ---------------------------------------------------------------------------
# q85 — sequence packing (operators/packing.py, §2B "LLM-pipeline —
# sequence packing"): assign every document to a fixed-token-budget
# training sequence. The layout orders docs by (md5 bucket, doc_id)
# per language shard, lays them end-to-end, and cuts every `budget`
# tokens — a doc belongs to the bin its STARTING offset falls in, so
# bins overflow by at most one boundary document (the slack real
# packers truncate/pad). Deterministic across reruns, cluster sizes,
# and engines. Plan shape: ONE window shuffle on the shard key
# carrying (doc_id, n_tokens) — never text; the cumsum and bin
# arithmetic are codegen scalars. At 100 TB each shard packs
# independently — exactly the strat_col parameter.
# ---------------------------------------------------------------------------
PACK_BUDGET = 2048


@query(
    "q85_sequence_packing",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST('0x' || substr(md5(concat(CAST(doc_id AS VARCHAR), ':pack')), 1, 8) AS BIGINT)
               % {BUCKETS} AS bucket
      FROM documents
    ),
    laid AS (
      SELECT doc_id, lang, n_tokens,
             CAST(row_number() OVER w AS INTEGER) AS pack_order,
             sum(n_tokens) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS start_offset
      FROM t
      WINDOW w AS (PARTITION BY lang ORDER BY bucket, doc_id)
    )
    SELECT doc_id, lang, n_tokens, pack_order, start_offset,
           start_offset // {PACK_BUDGET} AS bin_id
    FROM laid
    """,
)
def q85_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    packed = pack_sequences(d, PACK_BUDGET, strat_col="lang", salt="pack")
    return packed.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.col("pack_order").cast("int").alias("pack_order"),
        "start_offset",
        "bin_id",
    )
