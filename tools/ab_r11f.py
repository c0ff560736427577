"""Round-11 A/B, part 6: parquet aggregate pushdown for q505.

q505_shuffle_advisor is five unfiltered per-table count/sum probes —
exactly the shape `spark.sql.parquet.aggregatePushdown` answers from
parquet footers (COUNT/MIN/MAX without filters or partial schemas).
This harness toggles the conf EXPLICITLY around each timed run (a
registry-fn wrapper can't, because planning happens at the action), so
baseline and variant never contaminate each other. The sum(n_chars)
probe is not pushable and keeps its scan either way.

Usage: python tools/ab_r11f.py
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark import queries as Q
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))
CONF = "spark.sql.parquet.aggregatePushdown"

# queries whose leaves are unfiltered scans feeding aggregates — the
# panel that could regress if footer-stat reads were slower
PANEL = ["q505_shuffle_advisor", "q173_bootstrap_ci", "q81_kmeans_clusters"]


def _time(spark, fn, pushdown: bool) -> float:
    spark.conf.set(CONF, "true" if pushdown else "false")
    try:
        with checkpoint_scope(spark):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            return time.perf_counter() - t0
    finally:
        spark.conf.set(CONF, "false")


def main() -> None:
    spark = get_spark("ab_r11f", cpus="32")
    warm_dir = "/root/testdata/sf0.001"
    for n in PANEL:
        for pd in (False, True):
            spark.conf.set(CONF, "true" if pd else "false")
            with checkpoint_scope(spark):
                Q.REGISTRY[n].fn(spark, warm_dir).count()
            spark.conf.set(CONF, "false")
    results = {n: ([], []) for n in PANEL}
    for rep in range(REPS):
        for n in PANEL:
            base, var = results[n]
            if rep % 2 == 0:
                base.append(_time(spark, Q.REGISTRY[n].fn, False))
                var.append(_time(spark, Q.REGISTRY[n].fn, True))
            else:
                var.append(_time(spark, Q.REGISTRY[n].fn, True))
                base.append(_time(spark, Q.REGISTRY[n].fn, False))
            print(
                f"rep{rep} {n}: base {base[-1]:.2f}s var {var[-1]:.2f}s",
                flush=True,
            )
    print("\n=== summary (min over reps) ===")
    for n, (base, var) in results.items():
        b, v = min(base), min(var)
        print(
            f"{n}: base {b:.2f}s -> var {v:.2f}s "
            f"({(1 - v / b) * 100:+.1f}% {'WIN' if v < b else 'LOSS'})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
