"""Round-12 A/B, part 5: map-side power iteration (q168/q169).

Old shape: each iteration = (pos)-keyed Xv shuffle join + (id)-keyed
Xᵀa shuffle join + two groupBy exchanges. New shape (applied in
similarity.py): the d-dim vector is inlined as a literal, a = Xv is a
row-local array fold, w = Xᵀa is d map-side sums — zero exchanges per
iteration.

Interleaved A/B in one warmed session; oracle gate at sf0.01+sf0.001
runs first (any mismatch aborts).

Usage: python tools/ab_r12e.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def power_iteration_old(
    df: DataFrame, id_col: str, vec_col: str, iters: int = 4
) -> DataFrame:
    """Pre-r12 shape: exploded components, two shuffle joins/iteration."""
    xq = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(vec_col).alias("pos", "__x"),
        )
        .select(
            "__id",
            "pos",
            (F.col("__x").cast("double") * F.lit(1e7))
            .cast("bigint")
            .alias("xq"),
        )
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    dims = xq.select("pos").distinct()
    v = dims.select("pos", F.lit(1_000_000).cast("bigint").alias("vq"))
    for _ in range(iters):
        a = (
            xq.join(F.broadcast(v), "pos")
            .groupBy("__id")
            .agg(F.sum(F.col("xq") * F.col("vq")).alias("__a"))
        )
        am = a.agg(F.max(F.abs(F.col("__a"))).alias("__m"))
        aq = a.crossJoin(F.broadcast(am)).select(
            "__id",
            (F.col("__a").cast("double") * F.lit(1e6) / F.col("__m").cast("double"))
            .cast("bigint")
            .alias("aq"),
        )
        w = (
            xq.join(aq, "__id")
            .groupBy("pos")
            .agg(F.sum(F.col("xq") * F.col("aq")).alias("__w"))
        )
        wm = w.agg(F.max(F.abs(F.col("__w"))).alias("__m"))
        v = w.crossJoin(F.broadcast(wm)).select(
            "pos",
            (F.col("__w").cast("double") * F.lit(1e6) / F.col("__m").cast("double"))
            .cast("bigint")
            .alias("vq"),
        )
        rows = v.collect()
        v = spark.createDataFrame(rows, "pos int, vq bigint")
    return v.select(F.col("pos"), F.col("vq").alias("v_q"))


def q168_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    return power_iteration_old(
        Q._t(spark, sf_dir, "embeddings"), "vec_id", "embedding", iters=4
    )


def q169_old(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = Q._t(spark, sf_dir, "embeddings")
    v = power_iteration_old(emb, "vec_id", "embedding", iters=4)
    xq = emb.select(
        F.col("vec_id"), F.posexplode("embedding").alias("pos", "__x")
    ).select(
        "vec_id",
        "pos",
        (F.col("__x").cast("double") * F.lit(1e7)).cast("bigint").alias("xq"),
    )
    s = v.agg(F.sum(F.col("v_q") * F.col("v_q")).cast("bigint").alias("__s"))
    comp = xq.join(F.broadcast(v), "pos")
    c = comp.groupBy("vec_id").agg(
        F.sum(F.col("xq") * F.col("v_q")).cast("bigint").alias("__c")
    )
    corrected = (
        F.col("xq").cast("double") * F.col("__s").cast("double")
        - F.col("__c").cast("double") * F.col("v_q").cast("double")
    ) / F.col("__s").cast("double")
    return (
        comp.join(c, "vec_id")
        .crossJoin(F.broadcast(s))
        .select(
            "vec_id", "pos", corrected.cast("bigint").alias("corrected_q")
        )
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r12e", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tests.oracle_compare import compare, duckdb_connect

    for qname in ("q168_power_iteration", "q169_abtt_correction"):
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
            con = duckdb_connect(sf)
            res = compare(
                Q.REGISTRY[qname].fn(spark, sf), con, Q.REGISTRY[qname].oracle
            )
            con.close()
            print(f"oracle {qname} {sf}: ok={res['ok']}")
            if not res["ok"]:
                print(res)
                sys.exit(1)

    arms = {
        "q168_old": q168_old,
        "q168_new": Q.REGISTRY["q168_power_iteration"].fn,
        "q169_old": q169_old,
        "q169_new": Q.REGISTRY["q169_abtt_correction"].fn,
    }
    for fn in arms.values():  # warm all
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
