"""The in-repo correctness gate: every registered query with an oracle
is compared against DuckDB at sf0.001, mirroring the driver's t2 check
(which runs the same pairs at sf0.01)."""

from __future__ import annotations

import pytest

from etfconstituentextractor_spark.plans.registry import ORACLES, QUERIES, load_catalog
from tests.parity import run_parity

load_catalog()

_WITH_ORACLE = sorted(ORACLES)
_ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    run_parity(spark, sf_dir, name, QUERIES[name], ORACLES[name])


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    # Mirror the driver's weaker check: runs, stable schema, >=0 rows.
    assert df.schema is not None
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_has_docstringed_registration():
    assert len(QUERIES) >= len(ORACLES)
    assert set(ORACLES) <= set(QUERIES)


def test_query_count_within_driver_check_budget():
    """The verify driver compares at most 50 registered queries (round 1
    registered 53 and exactly the last 3 in insertion order got no
    CORRECTNESS rows). Staying at <=50 keeps every operator under the
    driver's hash check; consolidate families before adding the 51st."""
    assert len(QUERIES) <= 50, sorted(QUERIES)
