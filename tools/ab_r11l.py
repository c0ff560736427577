"""Round-11 optimization A/B harness, part 12: shuffled-hash hints on
the remaining iterative graph operators — pagerank_int (q124) and
kcore (q215). Same shape as the CC/q248/q413 wins: per-round joins of
an edge set against node-sized unique-keyed tables, SortMergeJoin by
default because the checkpointed inputs have unknown stats.

Usage: python tools/ab_r11l.py [exp ...]
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.operators import graph as G
from tytodb_spark.operators.graph import ONE
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


def pagerank_int_shj(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg").cache()
    n = nodes.count()
    teleport = ((damping_den - damping_num) * ONE) // (damping_den * n)
    pr = nodes.select("node", F.lit(ONE // n).cast("bigint").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(
                pr.join(nodes.hint("shuffle_hash"), "node")
                .select(
                    F.col("node").alias("src"),
                    F.expr("pr div deg").alias("c"),
                )
                .hint("shuffle_hash"),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = (
            nodes.select("node")
            .join(
                contrib.withColumnRenamed("dst", "node").hint("shuffle_hash"),
                "node",
                "left",
            )
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_num} * coalesce(s, 0)) div {damping_den}")
                ).cast("bigint").alias("pr"),
            )
        )
    return pr


def kcore_shj(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 32,
) -> DataFrame:
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.localCheckpoint(eager=True)
    prev = e.count()
    for _ in range(max_iter):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        e2 = (
            e.join(keep.hint("shuffle_hash"), "u", "left_semi")
            .join(
                keep.select(F.col("u").alias("v")).hint("shuffle_hash"),
                "v",
                "left_semi",
            )
            .localCheckpoint(eager=True)
        )
        cur = e2.count()
        e = e2
        if cur == prev:
            break
        prev = cur
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("u").alias("node"), "deg")
    )


class _patched_graph:
    def __enter__(self):
        self._pr = G.pagerank_int
        self._kc = G.kcore
        G.pagerank_int = pagerank_int_shj
        G.kcore = kcore_shj
        return self

    def __exit__(self, *exc):
        G.pagerank_int = self._pr
        G.kcore = self._kc
        return False


def q124_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _patched_graph():
        return Q.REGISTRY["q124_dup_graph_pagerank"].fn(spark, sf_dir)


def q215_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _patched_graph():
        return Q.REGISTRY["q215_kcore"].fn(spark, sf_dir)


EXPERIMENTS = {
    "q124_dup_graph_pagerank": q124_shj,
    "q215_kcore": q215_shj,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11l", cpus="32")
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
