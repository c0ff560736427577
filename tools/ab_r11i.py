"""Round-11 optimization A/B harness, part 9: hoist the
iteration-invariant e JOIN deg out of q413's unrolled PageRank loop.

The loop body plans `e.join(deg, "src")` in every one of the 3
iterations — the join's inputs never change, only `r` does. Exchanges
over e and deg are deduped by ReusedExchange, but the SortMergeJoin of
the edge list against the degree table is still executed per iteration.
Materializing `ed` (edge list with outdeg attached) ONCE as an eager
checkpoint removes 2 of the 3 edge-sized merge joins; each iteration
then joins only the node-sized rank vector into the prepared edges.

Usage: python tools/ab_r11i.py
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.queries import _t, _SUPP_PAIRS, _PR_TELEPORT
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def q413_ed_hoist(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    eu = (
        baskets.select(F.explode(F.expr(_SUPP_PAIRS)).alias("pr"))
        .select("pr.s1", "pr.s2")
        .distinct()
    )
    e = (
        eu.select(
            F.explode(
                F.expr(
                    "array(struct(s1 as src, s2 as dst),"
                    " struct(s2 as src, s1 as dst))"
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    # iteration-invariant: edges with the source's outdeg attached,
    # materialized once instead of re-joined every iteration
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src")).distinct().select(F.col("src").alias("s"))
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "s", F.expr("cast(1000000000 div n as bigint)").alias("r")
    )
    for _ in range(3):
        contrib = (
            ed.join(r.select(F.col("s").alias("src"), "r"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).cast("bigint").alias("v"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib.withColumnRenamed("dst", "s"), "s", "left")
            .select(
                "s",
                F.expr(
                    f"cast({_PR_TELEPORT}"
                    " + (85 * coalesce(v, 0)) div 100 as bigint)"
                ).alias("r"),
            )
        )
    return (
        r.select(F.col("s").alias("s_suppkey"), F.col("r").alias("rank_nano"))
        .orderBy(F.col("rank_nano").desc(), "s_suppkey")
        .limit(10)
    )


EXPERIMENTS = {
    "q413_pagerank_cosupply": q413_ed_hoist,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11i", cpus="32")
    todo = names or list(EXPERIMENTS)
    warm_dir = "/root/testdata/sf0.001"
    for n in todo:
        for fn in (Q.REGISTRY[n].fn, EXPERIMENTS[n]):
            try:
                with checkpoint_scope(spark):
                    fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warm FAIL {n}: {exc}")
    results = {n: ([], []) for n in todo}
    for rep in range(REPS):
        for n in todo:
            base, var = results[n]
            if rep % 2 == 0:
                base.append(_time(spark, Q.REGISTRY[n].fn))
                var.append(_time(spark, EXPERIMENTS[n]))
            else:
                var.append(_time(spark, EXPERIMENTS[n]))
                base.append(_time(spark, Q.REGISTRY[n].fn))
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
    main(sys.argv[1:])
