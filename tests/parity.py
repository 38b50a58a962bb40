"""Local mirror of the driver's Spark-vs-DuckDB oracle comparison.

The driver compares row count + schema + order-insensitive value hash
(``__spark_entry__.py`` docstring). This helper is our in-repo version
of the same gate so parity failures surface in pytest before the
driver ever runs: both results are normalized (columns sorted by name,
rows sorted by stringified values) and compared cell-by-cell, exactly
for non-floats and to 1e-9 relative for floats.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

from etfconstituentextractor_spark.schemas import TABLES

_FLOAT_RTOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connection with the ten corpus tables registered as views,
    mirroring the driver's pre-registration."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (np.floating, float)):
        # pandas renders SQL NULL as NaN in float columns; fold back to
        # None so both engines' nulls normalize identically.
        return None if math.isnan(v) else float(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, (list, np.ndarray, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    rows = [tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple("\0" if v is None else str(v) for v in r))
    return cols, rows


def _cells_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return math.isclose(fa, fb, rel_tol=_FLOAT_RTOL, abs_tol=1e-9)
    if isinstance(a, datetime) and isinstance(b, datetime):
        return a.replace(tzinfo=None) == b.replace(tzinfo=None)
    if isinstance(a, date) and isinstance(b, date):
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    """Assert Spark result == oracle result (count, columns, values)."""
    spark_pdf = spark_df.toPandas()
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    s_cols, s_rows = _normalize(spark_pdf)
    o_cols, o_rows = _normalize(oracle_pdf)
    assert s_cols == o_cols, f"{name}: columns {s_cols} != {o_cols}"
    for i, (sr, orow) in enumerate(zip(s_rows, o_rows)):
        if not all(_cells_equal(a, b) for a, b in zip(sr, orow)):
            raise AssertionError(
                f"{name}: row {i} mismatch\n  spark : {sr}\n  oracle: {orow}\n  cols  : {s_cols}"
            )


def run_parity(spark, sf_dir: str, name: str, query_fn, oracle: str) -> None:
    con = duck_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    compare(query_fn(spark, sf_dir), oracle_pdf, name=name)
