"""The flagship end-to-end query: the full corpus-curation pipeline
(pipeline/curation.py) as ONE registered, hash-verified plan.

This is the LLM-data analogue of the reference's ``run()``
orchestration (`ETFQuarterlyHoldingsExtractor.py:145-159`) promoted to
a driver-checked query: quality gate → benchmark decontamination →
exact dedup → near-dup grouping (banded MinHash LSH + connected
components) → deterministic mixture sampling, every input document
emerging with exactly one audited verdict.

The oracle is assembled from the already-verified per-stage oracle
fragments — q80's quality features, q82's contamination join, q60's
keeper window, q62's banded-LSH pair CTEs (applied to the survivor
subset), q65's recursive-CTE components, q83's hash threshold — so a
hash match here certifies the STAGE WIRING (gate precedence, subset
handoffs between stages), which no single-stage query checks.

Scale posture is inherited from the composed operators: every shuffle
carries hashes/keys/band signatures, the benchmark n-grams broadcast,
clustering iterates on the (tiny) pair set with lineage truncation,
and the mixture gate is a pure codegen filter. The plan scans the
documents table three times (feature pass, contamination train side,
eval side) — deliberate: parquet scans are linear, column-pruned and
embarrassingly parallel, while the alternative (materializing the
corpus between stages) pins 100 TB of text to disk/memory; re-scan
beats checkpoint for wide-text tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etfconstituentextractor_spark.operators.text import (
    STOPWORDS,
    sql_shingles,
    sql_stopword_hits,
    sql_tokens,
)
from etfconstituentextractor_spark.pipeline.curation import curate
from etfconstituentextractor_spark.plans.llm_dedup import (
    _SQL_PAIR_SELECT,
    sql_pair_ctes,
)
from etfconstituentextractor_spark.plans.llm_sampling import MIX_RATES, _sql_rate_case
from etfconstituentextractor_spark.plans.registry import query
from etfconstituentextractor_spark.sources.tables import load

_GRAMS4 = sql_shingles("string_split(text, ' ')", 4)


@query(
    "q99_curation_pipeline_e2e",
    oracle=f"""
    WITH RECURSIVE
    feat AS (
      SELECT doc_id, lang, text,
             CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
             {sql_stopword_hits(sql_tokens(), STOPWORDS)} AS stop_hits,
             md5(text) AS content_hash
      FROM documents
    ),
    q AS (
      SELECT *, (n_tokens >= 15 AND stop_hits / n_tokens >= 0.02) AS quality_pass
      FROM feat
    ),
    evg AS (
      SELECT DISTINCT unnest({_GRAMS4}) AS gram
      FROM documents WHERE doc_id % 43 = 0
    ),
    tg AS (
      SELECT doc_id, list_distinct({_GRAMS4}) AS grams
      FROM q WHERE quality_pass
    ),
    cont AS (
      SELECT doc_id
      FROM (SELECT doc_id, unnest(grams) AS gram FROM tg) x
      JOIN evg USING (gram)
      GROUP BY doc_id
      HAVING COUNT(*) >= 8
    ),
    flags AS (
      SELECT q.*,
             (quality_pass AND doc_id IN (SELECT doc_id FROM cont)) AS contaminated
      FROM q
    ),
    elig AS (
      SELECT *, (quality_pass AND NOT contaminated) AS eligible FROM flags
    ),
    keepers AS (
      SELECT *,
             (NOT eligible) OR
             (doc_id = MIN(CASE WHEN eligible THEN doc_id END)
                        OVER (PARTITION BY content_hash)) AS is_exact_keeper
      FROM elig
    ),
    surv AS (SELECT doc_id, text FROM keepers WHERE eligible AND is_exact_keeper),
    {sql_pair_ctes("surv")},
    pairs AS ({_SQL_PAIR_SELECT}),
    sym AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT a, a FROM sym
      UNION
      SELECT sym.b, reach.r FROM reach JOIN sym ON reach.node = sym.a
    ),
    comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
    pre AS (
      SELECT k.doc_id, k.lang, k.n_tokens, k.content_hash, k.quality_pass,
             k.contaminated, k.is_exact_keeper, comp.component,
             (CAST('0x' || substr(md5(concat(CAST(k.doc_id AS VARCHAR), ':mix')), 1, 8) AS BIGINT)
               % 10000) < {_sql_rate_case()} AS mix_sampled
      FROM keepers k LEFT JOIN comp ON comp.doc_id = k.doc_id
    )
    SELECT doc_id, n_tokens, content_hash, quality_pass, contaminated,
           is_exact_keeper, component, mix_sampled,
           CASE WHEN NOT quality_pass THEN 'quality'
                WHEN contaminated THEN 'contaminated'
                WHEN NOT is_exact_keeper THEN 'exact_dup'
                WHEN component IS NOT NULL AND component <> doc_id THEN 'near_dup'
                WHEN NOT mix_sampled THEN 'downsampled'
                ELSE 'kept' END AS verdict
    FROM pre
    """,
)
def q99_curation_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return curate(
        d,
        eval_docs=d.filter((F.col("doc_id") % 43) == 0).select("doc_id", "text"),
        contaminated_at=8,
        mix_rates=MIX_RATES,
        strat_col="lang",
    )
