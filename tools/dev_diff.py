"""Dev helper: run the oracle differential for a subset of queries.

Usage: python tools/dev_diff.py q219_decay_attribution q220_benford_digits
Optional env: DEV_DIFF_SF_DIR (default /root/testdata/sf0.01).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.oracle_compare import compare, duckdb_connect
from tytodb_spark import queries as Q
from tytodb_spark.session import get_spark


def main(names: list[str]) -> int:
    sf_dir = os.environ.get("DEV_DIFF_SF_DIR", "/root/testdata/sf0.01")
    # the project session builder, NOT a hand-rolled one: it pins
    # session.timeZone=UTC, nanosAsLong, Arrow, and ships the package
    # to Python workers — a bare builder makes hour()/date_trunc
    # queries fail the differential on any non-UTC machine
    spark = get_spark("dev-diff", cpus="8")
    con = duckdb_connect(sf_dir)
    rc = 0
    for name in names:
        qd = Q.REGISTRY[name]
        t0 = time.time()
        try:
            res = compare(qd.fn(spark, sf_dir), con, qd.oracle)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            rc = 1
            continue
        dt = time.time() - t0
        if res["ok"]:
            print(f"ok   {name} ({dt:.1f}s, {res['spark_rows']} rows)")
        else:
            rc = 1
            drop = {k: v for k, v in res.items() if k != "diff_sample"}
            print(f"FAIL {name} ({dt:.1f}s): {drop}")
            if "diff_sample" in res:
                print("  sample:", res["diff_sample"])
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
