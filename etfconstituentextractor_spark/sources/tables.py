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


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every corpus table (lazy; no I/O until an action runs)."""
    return {name: load(spark, sf_dir, name) for name in schemas.TABLES}


def register_views(spark: SparkSession, sf_dir: str, suffix: str = "") -> None:
    """Register all corpus tables as temp views (for the SQL API)."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name + suffix)
