#!/usr/bin/env python
"""Physical-plan audit over the whole query catalog.

Prints one line per registered batch query — exchanges, broadcasts,
scans, Python stages, and red flags (CartesianProduct, row-at-a-time
Python outside the deliberate UDF-surface queries) — so a plan
regression is visible at a glance, the same rules
`tests/test_plans.py::test_catalog_wide_plan_hygiene` enforces in CI.

    python tools/explain_audit.py [query_name ...]

With query names, dumps each query's FULL formatted plan instead of
the summary table. Streaming queries are skipped in the sweep (their
query functions run real replays when called); name one explicitly to
audit it anyway.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/explain_audit.py q01_pricing_summary
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog
from etfconstituentextractor_spark.session import get_session

PYTHON_OK = {"q90_udf_scalar_pandas", "q91_udtf_udaf"}
PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")


def summarize(name: str, plan: str) -> str:
    exchanges = len(re.findall(r"\bExchange hashpartitioning", plan))
    rangeex = len(re.findall(r"\bExchange rangepartitioning", plan))
    bcast = plan.count("BroadcastExchange")
    scans = plan.count("FileScan parquet")
    py = [m for m in PY_MARKERS if m in plan]
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CARTESIAN")
    if "BatchEvalPython" in plan and name not in PYTHON_OK:
        flags.append("ROW_PYTHON")
    return (
        f"{name:36s} shuffles={exchanges + rangeex:<2d} broadcasts={bcast:<2d} "
        f"scans={scans:<2d} python={','.join(py) or '-':30s} "
        f"{'!! ' + ' '.join(flags) if flags else 'ok'}"
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    load_catalog()
    spark = get_session(app_name="etfce-explain-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    wanted = sys.argv[1:]
    if wanted:
        for name in wanted:
            df = QUERIES[name](spark, sf_dir)
            print(f"=== {name} ===")
            df.explain("formatted")
        return

    for name in sorted(QUERIES):
        if "_stream_" in name:
            print(f"{name:36s} (skipped: streaming — runs a real replay on call)")
            continue
        plan = QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        print(summarize(name, plan))


if __name__ == "__main__":
    main()
