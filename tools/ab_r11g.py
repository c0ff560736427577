"""Round-11 A/B, part 7: q436 support via UNDIRECTED common-neighbor
intersection.

support(u,v) = |N(u) ∩ N(v)| over the undirected co-purchase graph —
identical to the triangle-role accounting (base + two legs) but with
no per-triangle explode (~3.8M leg rows at sf0.1) and no global
support groupBy, and it skips the degree/orientation machinery
entirely: one symmetrized adjacency groupBy + two keyed joins + a
row-local intersect size. The support>0 filter matches the original's
implicit exclusion of triangle-free edges.

SCALE CAVEAT measured against guide §2.5 before applying: undirected
adjacency arrays are degree-sized (a 100 TB hub row is unbounded),
where the degree-ORIENTED arrays the registry uses are O(sqrt(|E|)).

Usage: python tools/ab_r11g.py
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.queries import _copurchase_edges
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def q436_undirected(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    sym = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    adj = (
        sym.groupBy("a")
        .agg(F.array_sort(F.collect_list("b")).alias("nb"))
        .localCheckpoint(eager=True)  # joined twice (u side + v side)
    )
    au = adj.select(F.col("a").alias("__u"), F.col("nb").alias("nb_u"))
    av = adj.select(F.col("a").alias("__v"), F.col("nb").alias("nb_v"))
    return (
        e.join(au, F.col("u") == F.col("__u"))
        .join(av, F.col("v") == F.col("__v"))
        .select(
            "u",
            "v",
            F.expr(
                "cast(size(array_intersect(nb_u, nb_v)) as bigint)"
            ).alias("support"),
        )
        .filter(F.col("support") > 0)
        .orderBy(F.col("support").desc(), "u", "v")
        .limit(20)
    )


EXPERIMENTS = {"q436_edge_support": q436_undirected}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main() -> None:
    spark = get_spark("ab_r11g", cpus="32")
    warm_dir = "/root/testdata/sf0.001"
    for n, var in EXPERIMENTS.items():
        for fn in (Q.REGISTRY[n].fn, var):
            with checkpoint_scope(spark):
                fn(spark, warm_dir).count()
        # row-level equivalence probe at warm scale before timing
        with checkpoint_scope(spark):
            a = sorted(map(tuple, Q.REGISTRY[n].fn(spark, warm_dir).collect()))
            b = sorted(map(tuple, var(spark, warm_dir).collect()))
            print(f"# {n} sf0.001 equivalence: {a == b} ({len(a)} rows)")
    results = {n: ([], []) for n in EXPERIMENTS}
    for rep in range(REPS):
        for n, var in EXPERIMENTS.items():
            base, v = results[n]
            if rep % 2 == 0:
                base.append(_time(spark, Q.REGISTRY[n].fn))
                v.append(_time(spark, var))
            else:
                v.append(_time(spark, var))
                base.append(_time(spark, Q.REGISTRY[n].fn))
            print(
                f"rep{rep} {n}: base {base[-1]:.2f}s var {v[-1]:.2f}s",
                flush=True,
            )
    print("\n=== summary (min over reps) ===")
    for n, (base, v) in results.items():
        b, w = min(base), min(v)
        print(
            f"{n}: base {b:.2f}s -> var {w:.2f}s "
            f"({(1 - w / b) * 100:+.1f}% {'WIN' if w < b else 'LOSS'})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
