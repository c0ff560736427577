"""Capture `.explain("formatted")` for named registry queries into
plans/r{N}/<query>_<tag>.txt (tag = before/after; PLAN_ROUND env
picks N, default r12). Usage:

    python tools/capture_plans.py <tag> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tytodb_spark import queries as Q
from tytodb_spark.plans.inspect import formatted_plan
from tytodb_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_ROUND", "r12"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans", cpus="8")
    for name in names:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(formatted_plan(df))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
