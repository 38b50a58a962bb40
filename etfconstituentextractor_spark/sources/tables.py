"""Typed parquet readers for the test corpus.

Design notes for scale (100 TB posture):

- Explicit schemas — no footer-merge schema inference job on wide
  directories (``spark.read.schema(...)``), and types are pinned so the
  oracle comparison is stable.
- The reader is just ``spark.read.parquet``: Catalyst pushes filters and
  prunes columns into the scan (verify with ``.explain`` —
  ``PushedFilters`` / ``ReadSchema``), and partition pruning applies
  when a table is directory-partitioned.
- ``events.ts`` arrives as parquet TIMESTAMP(NANOS); Spark reads it as
  a nanos long (legacy conf) and we convert with *integer* division
  (``ts DIV 1000`` — a double division would lose precision above
  2^53 ns) then ``timestamp_micros`` → ``timestamp_ntz``. This matches
  DuckDB's nanos→micros truncation bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etfconstituentextractor_spark import schemas
from etfconstituentextractor_spark.session import prep


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table as a typed DataFrame."""
    if name not in schemas.TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {schemas.TABLES}")
    prep(spark)
    df = spark.read.schema(schemas.TABLE_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # nanos long -> micros (exact integer division) -> ntz timestamp.
        # Session tz is pinned UTC by prep(), so TimestampType->NTZ cast
        # is an identity on the underlying micros.
        df = df.withColumn(
            "ts", F.expr("CAST(timestamp_micros(ts DIV 1000) AS timestamp_ntz)")
        )
    return df


def fanout(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Pin COMPUTE parallelism ahead of expensive per-row work (heavy
    HOF chains, hashing, shingling).

    A small single-file parquet scan is one input split — one task —
    so everything between the scan and the first shuffle runs on ONE
    core no matter how wide the cluster is (the same failure mode as
    the UDTF boundary, documents.py:parse_filings). Repartition only
    when the plan has FEWER partitions than the cluster's parallelism:
    at real scale the scan already has thousands of splits and this is
    a no-op, so we never *reduce* parallelism or add a shuffle where
    one isn't needed. Accessing ``df.rdd`` here only builds the RDD
    lineage to read its partition count — no job runs."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n, key)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table (lazy; no I/O until an action runs)."""
    return {name: load(spark, sf_dir, name) for name in schemas.TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all corpus tables as temp views (for the SQL API)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name + suffix)
