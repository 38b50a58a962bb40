#!/usr/bin/env python
"""Driver-style correctness audit: run EVERY registered query against
its DuckDB oracle at a chosen scale factor and print one
CORRECTNESS-shaped JSON line per query, plus a summary.

This is the same gate `tests/test_oracle_parity.py` enforces in CI
(shared comparison code, `tests/parity.py`), packaged as a CLI for
debugging a single red row without a pytest run:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/correctness_audit.py
    python tools/correctness_audit.py q55_stream_tumbling_sliding   # just one
"""

from __future__ import annotations

import json
import os
import sys
import traceback

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "tests"))

from etfconstituentextractor_spark.plans.registry import ORACLES, QUERIES, load_catalog
from etfconstituentextractor_spark.session import get_session
from parity import compare, duck_connection


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    load_catalog()
    spark = get_session(app_name="etfce-correctness-audit", cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    names = sys.argv[1:] or list(QUERIES)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        oracle = ORACLES.get(name)
        try:
            df = QUERIES[name](spark, sf_dir)
            if oracle is None:
                rows = df.count()
                print(json.dumps({"query": name, "status": "rows_only", "rows": rows}))
                n_rows_only += 1
                continue
            con = duck_connection(sf_dir)
            try:
                oracle_pdf = con.execute(oracle).fetchdf()
            finally:
                con.close()
            compare(df, oracle_pdf, name=name)
            print(json.dumps({"query": name, "status": "pass", "rows": len(oracle_pdf)}))
            n_pass += 1
        except Exception as exc:  # surface the first mismatch per query
            print(json.dumps({"query": name, "status": "FAIL", "err": str(exc)[:400]}))
            traceback.print_exc(limit=1, file=sys.stderr)
            n_fail += 1

    print(
        json.dumps(
            {"summary": {"pass": n_pass, "fail": n_fail, "rows_only": n_rows_only, "sf_dir": sf_dir}}
        )
    )
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
