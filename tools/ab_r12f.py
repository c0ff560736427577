"""Round-12 A/B, part 6: shuffled-hash hints on q166's id-set joins.

The funnel's semi/anti/left joins pair corpus-scale frames against
checkpointed doc-id SET tables (keep / dup_b / clean); checkpointed
scans have unknown stats, so the planner defaults to SortMergeJoin —
both sides sorted every time. The r11 SHJ-hint wins (q413/q437/q314)
came from exactly this shape. Broadcast is NOT the scale answer here:
the id sets are survivor sets, corpus-sized at 100 TB; a per-partition
hash build of the id-set side is.

Interleaved A/B in one warmed session; oracle gate at sf0.01+sf0.001
runs first (any mismatch aborts).

Usage: python tools/ab_r12f.py [reps]
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


def q166_hinted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q166 with shuffle_hash hints on the id-set join sides."""
    from pyspark.sql import Window as W

    from tytodb_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
    from tytodb_spark.operators.textual import (
        decontaminate,
        lang_id,
        quality_score,
        token_count,
    )

    docs = Q._t(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    feats = raw.select(
        "doc_id",
        "text",
        (
            (lang_id(F.col("text")) == "en")
            & (quality_score(F.col("text")) >= 0.5)
        ).alias("pass_gate"),
        token_count(F.col("text")).cast("bigint").alias("n_tok"),
    )
    gated = feats.filter("pass_gate").select("doc_id", "text")
    keep = (
        exact_dedup_groups(gated, "doc_id", "text")
        .select(F.col("keep_id").alias("doc_id"), F.lit(True).alias("__keep"))
        .localCheckpoint(eager=True)
    )
    exact = gated.join(
        keep.select("doc_id").hint("shuffle_hash"), "doc_id", "left_semi"
    )
    dup_b = (
        minhash_lsh_pairs(exact, "doc_id", "text", shingle_n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
        .localCheckpoint(eager=True)
    )
    nd = exact.join(
        dup_b.select("doc_id").hint("shuffle_hash"), "doc_id", "left_anti"
    )
    clean_ids = (
        decontaminate(
            nd, docs.filter(F.col("source") == "src0"), "doc_id", "text", n=5
        )
        .select("doc_id")
        .withColumn("__clean", F.lit(True))
    )
    labels = (
        feats.join(keep.hint("shuffle_hash"), "doc_id", "left")
        .join(dup_b.hint("shuffle_hash"), "doc_id", "left")
        .join(clean_ids.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.col("pass_gate"),
            (F.col("pass_gate") & F.col("__keep").isNotNull()).alias("s_exact"),
            (
                F.col("pass_gate")
                & F.col("__keep").isNotNull()
                & F.col("__dup").isNull()
            ).alias("s_nd"),
            F.col("__clean").isNotNull().alias("s_clean"),
        )
        .localCheckpoint(eager=True)
    )
    counts = labels.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.col("pass_gate").cast("bigint")).cast("bigint").alias("n_gated"),
        F.sum(F.col("s_exact").cast("bigint")).cast("bigint").alias("n_exact"),
        F.sum(F.col("s_nd").cast("bigint")).cast("bigint").alias("n_neardup"),
        F.sum(F.col("s_clean").cast("bigint")).cast("bigint").alias("n_clean"),
        F.coalesce(F.sum(F.when(F.col("s_clean"), F.col("n_tok"))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    pw = (
        W.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seqs = (
        labels.filter("s_clean")
        .select(
            "doc_id",
            (F.col("doc_id") % 8).cast("bigint").alias("part"),
            "n_tok",
        )
        .select(
            "part",
            F.floor(
                F.coalesce(F.sum("n_tok").over(pw), F.lit(0)) / 512
            ).alias("seq"),
        )
        .agg(
            F.countDistinct("part", "seq").cast("bigint").alias("n_sequences")
        )
    )
    return counts.crossJoin(seqs)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("ab_r12f", cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from tests.oracle_compare import compare, duckdb_connect

    for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.001"):
        con = duckdb_connect(sf)
        res = compare(
            q166_hinted(spark, sf), con, Q.REGISTRY["q166_pipeline_funnel"].oracle
        )
        con.close()
        print(f"oracle q166_hinted {sf}: ok={res['ok']}")
        if not res["ok"]:
            print(res)
            sys.exit(1)

    arms = {
        "q166_old": Q.REGISTRY["q166_pipeline_funnel"].fn,
        "q166_new": q166_hinted,
    }
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
