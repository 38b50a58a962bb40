from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# the tests dir itself, for shared helpers (parity.py, ann_truth.py)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etfconstituentextractor_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # 8 threads is the sweet spot for the tiny test SF: less task
    # scheduling overhead than 32, still exercises parallelism.
    s = get_session(app_name="etfce-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
