#!/usr/bin/env python
"""Dump `.explain("formatted")` for registered batch queries into
plans/<round>/<query>_<suffix>.txt — the judge-auditable plan evidence
(round-14 convention: plans/r14/*_before.txt; round 15 keeps before
AND after captures for every touched query).

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
        python tools/dump_plans.py r15 before [query ...]

Streaming queries are skipped in the sweep (their query functions run
real replays when called); name one explicitly to capture it anyway.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etfconstituentextractor_spark.plans.registry import QUERIES, load_catalog
from etfconstituentextractor_spark.session import get_session


def main() -> None:
    rnd, suffix = sys.argv[1], sys.argv[2]
    wanted = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)
    load_catalog()
    names = wanted or [n for n in sorted(QUERIES) if "_stream_" not in n]
    spark = get_session(app_name="etfce-dump-plans", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"# wrote {name}_{suffix}.txt ({len(plan)} bytes)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
