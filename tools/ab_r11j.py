"""Round-11 optimization A/B harness, part 10: per-join shuffled-hash
hints on the remaining SortMergeJoin towers.

- q314: the part self-join (ps a JOIN ps b ON part) — the one q314 join
  the rejected GLOBAL preferSortMergeJoin sweep credited (+3.0%).
- q413: the plan holds 6 SortMergeJoins (e JOIN deg, JOIN r, and the
  nodes LEFT JOIN contrib, per unrolled iteration) — every sort is
  redundant work a per-partition hash build avoids. Tested two ways:
  hints alone, and hints + the iteration-invariant (e JOIN deg) hoisted
  into one eagerly-materialized `ed` table (ab_r11i measured the hoist
  alone: mean win, min-of-3 loss under box noise).

Usage: python tools/ab_r11j.py [exp ...]
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


def q314_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("int").alias("com")
    )
    ps = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    a = ps.select("part", F.col("supp").alias("s1"))
    b = ps.select("part", F.col("supp").alias("s2"))
    el0 = (
        a.hint("shuffle_hash")
        .join(b, "part")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    el = (
        el0.join(
            F.broadcast(sp.select(F.col("s_suppkey").alias("s1"), F.col("com").alias("c1"))),
            "s1",
        )
        .join(
            F.broadcast(sp.select(F.col("s_suppkey").alias("s2"), F.col("com").alias("c2"))),
            "s2",
        )
        .select("c1", "c2")
        .localCheckpoint(eager=True)
    )
    m = el.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    intra = (
        el.filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("com"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    deg = (
        el.select(F.col("c1").alias("com"))
        .unionByName(el.select(F.col("c2").alias("com")))
        .groupBy("com")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_tot"))
    )
    return (
        deg.join(intra, "com", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("com").alias("community"),
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_tot",
            F.expr(
                "coalesce(e_in, 0) * 1000000 div m"
                " - d_tot * d_tot * 250000 div (m * m)"
            )
            .cast("bigint")
            .alias("q_contrib_ppm"),
        )
    )


def _q413_common(spark: SparkSession, sf_dir: str):
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
    nodes = (
        e.select(F.col("src")).distinct().select(F.col("src").alias("s"))
        .localCheckpoint(eager=True)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "s", F.expr("cast(1000000000 div n as bigint)").alias("r")
    )
    return e, deg, nodes, nn, r


def _q413_tail(r: DataFrame) -> DataFrame:
    return (
        r.select(F.col("s").alias("s_suppkey"), F.col("r").alias("rank_nano"))
        .orderBy(F.col("rank_nano").desc(), "s_suppkey")
        .limit(10)
    )


def q413_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg0, nodes, nn, r = _q413_common(spark, sf_dir)
    deg = deg0.localCheckpoint(eager=True)
    for _ in range(3):
        contrib = (
            e.hint("shuffle_hash")
            .join(deg.hint("shuffle_hash"), "src")
            .join(r.select(F.col("s").alias("src"), "r").hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).cast("bigint").alias("v"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(
                contrib.withColumnRenamed("dst", "s").hint("shuffle_hash"),
                "s",
                "left",
            )
            .select(
                "s",
                F.expr(
                    f"cast({_PR_TELEPORT}"
                    " + (85 * coalesce(v, 0)) div 100 as bigint)"
                ).alias("r"),
            )
        )
    return _q413_tail(r)


def q413_hoist_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    e, deg0, nodes, nn, r = _q413_common(spark, sf_dir)
    ed = e.join(deg0, "src").localCheckpoint(eager=True)
    for _ in range(3):
        contrib = (
            ed.hint("shuffle_hash")
            .join(r.select(F.col("s").alias("src"), "r").hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).cast("bigint").alias("v"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(
                contrib.withColumnRenamed("dst", "s").hint("shuffle_hash"),
                "s",
                "left",
            )
            .select(
                "s",
                F.expr(
                    f"cast({_PR_TELEPORT}"
                    " + (85 * coalesce(v, 0)) div 100 as bigint)"
                ).alias("r"),
            )
        )
    return _q413_tail(r)


EXPERIMENTS = {
    "q314_modularity": q314_shj,
    "q413_pagerank_cosupply": q413_shj,
}

# second q413 variant exposed under an alias for verify/manual runs
EXPERIMENTS_EXTRA = {
    "q413_pagerank_cosupply__hoist_shj": q413_hoist_shj,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11j", cpus="32")
    todo = names or list(EXPERIMENTS)
    warm_dir = "/root/testdata/sf0.001"
    arms = {
        n: [Q.REGISTRY[n].fn, EXPERIMENTS[n]]
        + ([q413_hoist_shj] if n.startswith("q413") else [])
        for n in todo
    }
    for n, fns in arms.items():
        for fn in fns:
            try:
                with checkpoint_scope(spark):
                    fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warm FAIL {n}: {exc}")
    results = {n: [[] for _ in arms[n]] for n in todo}
    for rep in range(REPS):
        for n in todo:
            order = list(enumerate(arms[n]))
            if rep % 2 == 1:
                order = order[::-1]
            for i, fn in order:
                results[n][i].append(_time(spark, fn))
            print(
                f"rep{rep} {n}: "
                + " ".join(f"arm{i} {results[n][i][-1]:.2f}s" for i in range(len(arms[n]))),
                flush=True,
            )
    print("\n=== summary (min over reps; arm0=base) ===")
    for n, series in results.items():
        mins = [min(s) for s in series]
        b = mins[0]
        rel = " ".join(
            f"arm{i} {m:.2f}s ({(1 - m / b) * 100:+.1f}%)"
            for i, m in enumerate(mins)
        )
        print(f"{n}: {rel}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
