"""Oracle-verify r11 A/B variant functions against the registry oracle
(sf0.01 + sf0.001) BEFORE applying them. Usage:

    python tools/verify_variants_r11.py <module> [<name> ...]

where <module> is e.g. ab_r11h / ab_r11i (must expose EXPERIMENTS).
"""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from tytodb_spark import queries as Q
from tytodb_spark.session import checkpoint_scope, get_spark


def main() -> None:
    mod = importlib.import_module(sys.argv[1])
    names = sys.argv[2:] or list(mod.EXPERIMENTS)
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
    )
    from oracle_compare import compare, duckdb_connect

    spark = get_spark("verify_variants_r11", cpus="8")
    n_fail = 0
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        con = duckdb_connect(sf_dir)
        for name in names:
            qd = Q.REGISTRY[name]
            with checkpoint_scope(spark):
                df = mod.EXPERIMENTS[name](spark, sf_dir)
                res = compare(df, con, qd.oracle)
            ok = res.get("ok")
            n_fail += 0 if ok else 1
            print(f"{sf_dir.rsplit('/',1)[-1]} {name}: {'MATCH' if ok else res}", flush=True)
        con.close()
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
