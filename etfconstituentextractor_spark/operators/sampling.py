"""Deterministic sampling for corpus mixing: hash-rate (Bernoulli)
and exact per-stratum quota sampling.

A training-data pipeline ends with a *mixture*: each source/language
stratum contributes at its own rate (data-mixing weights). Random
sampling is useless at 100 TB — a re-run must select the SAME rows
(resumability, A/B comparisons), so selection is a pure function of
the row key: an md5-derived uniform bucket in [0, 10000).

No reference counterpart (the reference extracts everything it
scrapes); SURVEY.md §2B "LLM-pipeline" tier.

Scale posture:

- ``hash_rate_sample`` is a pure filter — whole-stage codegen, zero
  shuffle, trivially parallel at any scale. This is the at-scale
  path.
- ``stratified_quota_sample`` needs a per-stratum total order over
  the hash, i.e. one shuffle on the stratum key — but Catalyst's
  rank-limit pushdown (`WindowGroupLimit`, Spark ≥3.5) inserts a
  PARTIAL group-limit before the Exchange: every map task pre-prunes
  to its local k smallest buckets per stratum, so the shuffle moves
  at most k·tasks rows per stratum and the final per-stratum sort
  sees k·tasks rows, not the stratum (pinned in
  tests/test_plans.py). That is the two-phase "filter then exact
  top-k" a hand-rolled implementation would need — for free.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

#: bucket space for rate thresholds — rates quantized to 1/10000
BUCKETS = 10_000


def hash_bucket(key_col: str, salt: str = "mix") -> Column:
    """Uniform deterministic bucket in [0, BUCKETS) from md5(key:salt).

    First 8 hex chars → bigint → mod: portable (the DuckDB twin is
    ``('0x' || substr(md5(...), 1, 8))::BIGINT % 10000``) and uniform
    enough for sampling (md5 avalanche).
    """
    h = F.md5(F.concat(F.col(key_col).cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % BUCKETS


def rate_threshold(
    rates: Mapping[str, float], strat_col: str, default_rate: float = 0.0
) -> Column:
    """Per-row bucket threshold: rate(stratum)·BUCKETS as a CASE chain."""
    expr = None
    for stratum, rate in sorted(rates.items()):
        cond = F.col(strat_col) == stratum
        val = F.lit(int(round(rate * BUCKETS)))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    default = F.lit(int(round(default_rate * BUCKETS)))
    return expr.otherwise(default) if expr is not None else default


def hash_rate_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    *,
    strat_col: str,
    key_col: str,
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket < rate(stratum)·BUCKETS.

    Deterministic Bernoulli(rate) per stratum; appends the ``bucket``
    column so callers (and oracles) can audit the decision.
    """
    return df.withColumn("bucket", hash_bucket(key_col, salt)).filter(
        F.col("bucket") < rate_threshold(rates, strat_col, default_rate)
    )


def stratified_quota_sample(
    df: DataFrame,
    *,
    strat_col: str,
    key_col: str,
    k: int,
    salt: str = "mix",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen as the k
    smallest hash buckets (ties broken by key) — a deterministic
    uniform without-replacement sample. Appends ``bucket`` and the
    1-based ``rn`` rank within the stratum.
    """
    w = W.partitionBy(strat_col).orderBy(F.col("bucket").asc(), F.col(key_col).asc())
    return (
        df.withColumn("bucket", hash_bucket(key_col, salt))
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
