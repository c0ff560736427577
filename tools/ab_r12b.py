"""Round-12 A/B, part 2: q413 build-side discipline (the r11 ADVICE
item). Old shape hinted BOTH join sides (e and deg) with shuffle_hash,
letting the planner pick the build side from size stats — the full
edge list could become the non-spillable per-partition hash build.
New shape hints only the node-sized tables (deg/r/contrib).

Interleaved A/B in one warmed session; oracle check at sf0.01+sf0.001
runs first (any mismatch aborts).

Usage: python tools/ab_r12b.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.queries import _PR_TELEPORT, _SUPP_PAIRS, _t
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def q413_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-r12 shape: e hinted too (build side left to size stats)."""
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
    ).localCheckpoint(eager=True)
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
            e.hint("shuffle_hash")
            .join(deg.hint("shuffle_hash"), "src")
            .join(
                r.select(F.col("s").alias("src"), "r").hint("shuffle_hash"),
                "src",
            )
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
    return (
        r.select(F.col("s").alias("s_suppkey"), F.col("r").alias("rank_nano"))
        .orderBy(F.col("rank_nano").desc(), "s_suppkey")
        .limit(10)
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r12b", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    new = Q.REGISTRY["q413_pagerank_cosupply"].fn

    # oracle gate first
    from tests.oracle_compare import compare, duckdb_connect

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        con = duckdb_connect(sf)
        res = compare(new(spark, sf), con, Q.REGISTRY["q413_pagerank_cosupply"].oracle)
        con.close()
        print(f"oracle {sf}: ok={res['ok']}")
        if not res["ok"]:
            print(res)
            sys.exit(1)

    arms = {"old": q413_old, "new": new}
    for fn in arms.values():  # warm both
        with checkpoint_scope(spark):
            fn(spark, SF_DIR).count()
    times = {k: [] for k in arms}
    for rep in range(reps):
        for k, fn in arms.items():
            with checkpoint_scope(spark):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).count()
                times[k].append(time.perf_counter() - t0)
    for k, v in times.items():
        print(k, [round(x, 2) for x in v], "min", round(min(v), 2))
    spark.stop()


if __name__ == "__main__":
    main()
