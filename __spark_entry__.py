"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual engine lives in ``etfconstituentextractor_spark``; the
query catalog is the decorator registry in
``etfconstituentextractor_spark/plans/`` — this file only adapts it to
the driver's function signatures.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable regardless of the driver's cwd.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from etfconstituentextractor_spark.plans.registry import (  # noqa: E402
    ORACLES,
    QUERIES,
    load_catalog,
)

load_catalog()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the end-to-end corpus-curation pipeline — the
    engine's `run()` analogue: every stage family (text features,
    dedup, clustering, sampling) in one audited plan.
    """
    return QUERIES["q99_curation_pipeline_e2e"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    return dict(ORACLES)
