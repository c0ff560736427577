"""Round-11 optimization A/B harness, part 3: iterative-query barrier
eagerness (q413, q314, q166) and the shuffled-hash-join config
experiment (guide §3.1 / §9: preferSortMergeJoin=false +
AQE SMJ->SHJ conversion) over a basket of shuffle-join-heavy queries.

Usage: python tools/ab_r11c.py [exp ...] | shj
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


# ---------------------------------------------------------------------------
# q413 v1: eager edge checkpoint (q437 lesson — the 4 broadcast(nn)
# subtrees race the lazy barrier) + eager tiny deg/nodes barriers so
# the per-iteration joins build from materialized supplier-sized
# tables.  v2 additionally broadcasts deg and r into each iteration
# (supplier-count sized — ~10k rows at sf1; bounded by the supplier
# dimension at any scale).
# ---------------------------------------------------------------------------


def _q413_core(spark, sf_dir, eager: bool, bcast: bool) -> DataFrame:
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
        .localCheckpoint(eager=eager)
    )
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    nodes = e.select(F.col("src")).distinct().select(F.col("src").alias("s"))
    if eager:
        deg = deg.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "s", F.expr("cast(1000000000 div n as bigint)").alias("r")
    )
    for _ in range(3):
        d = F.broadcast(deg) if bcast else deg
        rr = r.select(F.col("s").alias("src"), "r")
        if bcast:
            rr = F.broadcast(rr)
        contrib = (
            e.join(d, "src")
            .join(rr, "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).cast("bigint").alias("v"))
        )
        cc = contrib.withColumnRenamed("dst", "s")
        if bcast:
            cc = F.broadcast(cc)
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(cc, "s", "left")
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


def q413_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q413_core(spark, sf_dir, eager=True, bcast=False)


def q413_eager_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q413_core(spark, sf_dir, eager=True, bcast=True)


# ---------------------------------------------------------------------------
# q314: eager el barrier (4 consumers incl. a broadcast m — the race)
# ---------------------------------------------------------------------------


def q314_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        a.join(b, "part")
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


# ---------------------------------------------------------------------------
# q166: eager funnel barriers (keep / dup_b / labels each feed multiple
# consumers, incl. broadcast-side joins)
# ---------------------------------------------------------------------------


def q166_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
    from tytodb_spark.operators.textual import (
        decontaminate,
        lang_id,
        quality_score,
        token_count,
    )
    from pyspark.sql import Window as W

    docs = _t(spark, sf_dir, "documents")
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
    exact = gated.join(keep.select("doc_id"), "doc_id", "left_semi")
    dup_b = (
        minhash_lsh_pairs(exact, "doc_id", "text", shingle_n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
        .localCheckpoint(eager=True)
    )
    nd = exact.join(dup_b.select("doc_id"), "doc_id", "left_anti")
    clean_ids = (
        decontaminate(
            nd, docs.filter(F.col("source") == "src0"), "doc_id", "text", n=5
        )
        .select("doc_id")
        .withColumn("__clean", F.lit(True))
    )
    labels = (
        feats.join(keep, "doc_id", "left")
        .join(dup_b, "doc_id", "left")
        .join(clean_ids, "doc_id", "left")
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


EXPERIMENTS = {
    "q413_pagerank_cosupply": q413_eager,
    "q413_pagerank_cosupply@bcast": q413_eager_bcast,
    "q314_modularity": q314_eager,
    "q166_pipeline_funnel": q166_eager,
}

# Basket for the SHJ config experiment: shuffle-join-heavy queries
SHJ_BASKET = [
    "q437_cf_holdout_eval",
    "q414_item_item_cf",
    "q412_butterfly_count",
    "q166_pipeline_funnel",
    "q41_jaccard_pairs",
    "q81_kmeans_clusters",
    "q314_modularity",
    "q172_stream_heavy_hitters",
]

SHJ_CONF = {
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": "134217728",
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def run_variants(spark, names):
    todo = names or list(EXPERIMENTS)
    warm_dir = "/root/testdata/sf0.001"
    for n in todo:
        qn = n.split("@")[0]
        for fn in (Q.REGISTRY[qn].fn, EXPERIMENTS[n]):
            try:
                with checkpoint_scope(spark):
                    fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warm FAIL {n}: {exc}")
    results = {n: ([], []) for n in todo}
    for rep in range(REPS):
        for n in todo:
            qn = n.split("@")[0]
            base, var = results[n]
            if rep % 2 == 0:
                base.append(_time(spark, Q.REGISTRY[qn].fn))
                var.append(_time(spark, EXPERIMENTS[n]))
            else:
                var.append(_time(spark, EXPERIMENTS[n]))
                base.append(_time(spark, Q.REGISTRY[qn].fn))
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


def run_shj(spark):
    """Interleave the SAME registry fn with SHJ confs off (baseline) vs
    on (variant): a pure config A/B, toggled at runtime per arm."""

    def set_conf(on: bool):
        for k, v in SHJ_CONF.items():
            spark.conf.set(k, v if on else ("true" if "prefer" in k else "0"))

    warm_dir = "/root/testdata/sf0.001"
    for n in SHJ_BASKET:
        for on in (False, True):
            set_conf(on)
            try:
                with checkpoint_scope(spark):
                    Q.REGISTRY[n].fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warm FAIL {n}: {exc}")
    set_conf(False)
    results = {n: ([], []) for n in SHJ_BASKET}
    for rep in range(REPS):
        for n in SHJ_BASKET:
            base, var = results[n]
            order = (False, True) if rep % 2 == 0 else (True, False)
            for on in order:
                set_conf(on)
                t = _time(spark, Q.REGISTRY[n].fn)
                (var if on else base).append(t)
            set_conf(False)
            print(
                f"rep{rep} {n}: smj {base[-1]:.2f}s shj {var[-1]:.2f}s",
                flush=True,
            )
    print("\n=== summary (min over reps) ===")
    for n, (base, var) in results.items():
        b, v = min(base), min(var)
        print(
            f"{n}: smj {b:.2f}s -> shj {v:.2f}s "
            f"({(1 - v / b) * 100:+.1f}% {'WIN' if v < b else 'LOSS'})"
        )


def main(args: list[str]) -> None:
    spark = get_spark("ab_r11c", cpus="32")
    if args and args[0] == "shj":
        run_shj(spark)
    else:
        run_variants(spark, args)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
