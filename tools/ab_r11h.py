"""Round-11 optimization A/B harness, part 8: propagate the q414
shuffled-hash-join win to the rest of the brand-CF family, and re-test
q172's text-only staging standalone.

- q437/q468/q469 all join the eager-checkpointed (ck, brand) rollup to
  itself on ck — the exact join that won hint("shuffle_hash") on q414
  (+9.2% interleaved; checkpointed scans have unknown stats so the
  planner defaults to SortMergeJoin and sorts both sides for nothing).
- q172: stage ONLY the text column (the staged doc_id is never read by
  the batch handler or the recount). Previously measured a wash at
  sf0.1 INSIDE the fused-recount variant that lost; re-measured alone
  here — at warehouse scale it is a strict staged-bytes reduction.

Usage: python tools/ab_r11h.py [exp ...]
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from tytodb_spark import queries as Q
from tytodb_spark.queries import _t, _NDCG_GAIN, _NDCG_IDEAL
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


# ---------------------------------------------------------------------------
# q437: shuffle_hash hint on the train self-join on ck
# ---------------------------------------------------------------------------


def q437_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    ob = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.col("o_custkey").alias("ck"),
            F.col("p_brand").alias("b"),
            F.col("o_orderdate").alias("dt"),
        )
    )
    agg = (
        ob.groupBy("ck", "b")
        .agg(
            F.sum(
                F.expr(
                    "case when dt < timestamp'2001-01-01'"
                    " then 1 else 0 end"
                )
            )
            .cast("bigint")
            .alias("cnt"),
            F.max(
                F.expr(
                    "case when dt >= timestamp'2001-01-01'"
                    " then 1 else 0 end"
                )
            ).alias("is_test"),
        )
        .localCheckpoint(eager=True)
    )
    train = agg.filter("cnt > 0").select("ck", "b", "cnt")
    test = agg.filter("is_test = 1").select("ck", "b")
    n2 = train.groupBy("b").agg(
        F.sum(F.expr("cnt * cnt")).cast("bigint").alias("nrm")
    )
    a = train.select("ck", F.col("b").alias("b1"), F.col("cnt").alias("c1"))
    c = train.select(
        F.col("ck").alias("ck2"), F.col("b").alias("b2"),
        F.col("cnt").alias("c2"),
    )
    dots = (
        a.hint("shuffle_hash")
        .join(c, (F.col("ck") == F.col("ck2")) & (F.col("b1") != F.col("b2")))
        .groupBy("b1", "b2")
        .agg(F.sum(F.expr("c1 * c2")).cast("bigint").alias("dot"))
    )
    x = n2.select(F.col("b").alias("b1"), F.col("nrm").alias("n1"))
    yy = n2.select(F.col("b").alias("b2"), F.col("nrm").alias("n2_"))
    sims = (
        dots.join(F.broadcast(x), "b1")
        .join(F.broadcast(yy), "b2")
        .select(
            "b1",
            "b2",
            F.expr(
                "cast(floor(dot * 1000000"
                " / sqrt(cast(n1 as double) * n2_)) as bigint)"
            ).alias("cos_micro"),
        )
    )
    users = (
        agg.groupBy("ck")
        .agg(
            F.max(F.expr("case when cnt > 0 then 1 else 0 end")).alias(
                "__ht"
            ),
            F.max("is_test").alias("__hs"),
        )
        .filter("__ht = 1 and __hs = 1")
        .select("ck")
    )
    score = (
        train.join(users, "ck")
        .join(F.broadcast(sims), F.col("b") == F.col("b1"))
        .groupBy("ck", F.col("b2").alias("cand"))
        .agg(F.sum(F.expr("cnt * cos_micro")).cast("bigint").alias("sc"))
    )
    ranked = score.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("ck").orderBy(F.col("sc").desc(), "cand")
        ),
    ).filter("rnk <= 5")
    hits = ranked.join(
        test.select("ck", F.col("b").alias("cand")).withColumn(
            "hit", F.lit(1)
        ),
        ["ck", "cand"],
        "left",
    ).fillna({"hit": 0})
    gain_case = " ".join(
        f"when rnk = {r} then {g}" for r, g in _NDCG_GAIN.items()
    )
    peruser = hits.groupBy("ck").agg(
        F.sum("hit").cast("bigint").alias("n_hits"),
        F.sum(F.expr(f"hit * (case {gain_case} end)"))
        .cast("bigint")
        .alias("dcg_micro"),
    )
    hsz = (
        test.join(users, "ck")
        .groupBy("ck")
        .agg(
            F.expr(
                "case when count(*) >= 5 then 5"
                " else cast(count(*) as int) end"
            ).alias("h")
        )
    )
    ideal_case = " ".join(
        f"when h >= {k} then {v}"
        for k, v in sorted(_NDCG_IDEAL.items(), reverse=True)
    )
    return (
        peruser.join(hsz, "ck")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.expr(
                "cast(sum(case when n_hits > 0 then 1 else 0 end)"
                " * 1000000 div count(*) as bigint)"
            ).alias("hitrate_ppm"),
            F.expr(
                f"cast(sum((dcg_micro * 1000000) div (case {ideal_case}"
                " end)) div count(*) as bigint)"
            ).alias("mean_ndcg_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# q468: shuffle_hash hint on the m self-join on ck
# ---------------------------------------------------------------------------


def _brand_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )


def q468_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _brand_rollup(spark, sf_dir)
    n2 = m.groupBy("b").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("nrm")
    )
    dots = (
        m.alias("a")
        .hint("shuffle_hash")
        .join(m.alias("c"), F.col("a.ck") == F.col("c.ck"))
        .filter(F.col("a.b") != F.col("c.b"))
        .groupBy(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .agg(F.sum(F.col("a.cnt") * F.col("c.cnt")).cast("bigint").alias("dot"))
    )
    cosv = (
        dots.join(
            F.broadcast(n2.select(F.col("b").alias("b1"), F.col("nrm").alias("nrm1"))),
            "b1",
        )
        .join(
            F.broadcast(n2.select(F.col("b").alias("b2"), F.col("nrm").alias("nrm2"))),
            "b2",
        )
        .select(
            "b1",
            "b2",
            (
                F.col("dot")
                / F.sqrt(F.col("nrm1").cast("double") * F.col("nrm2"))
            ).alias("cosine"),
        )
    )
    recs = (
        cosv.withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("b1").orderBy(F.col("cosine").desc(), "b2")
            ),
        )
        .filter(F.col("rnk") <= 3)
        .localCheckpoint(eager=False)
    )
    pop = m.groupBy("b").agg(F.sum("cnt").cast("bigint").alias("n"))
    tot = pop.agg(
        F.sum("n").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )
    nov = (
        recs.join(F.broadcast(pop), recs.b2 == pop.b)
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                -F.log(F.col("n").cast("double") / F.col("t"))
                / F.log(F.lit(2.0))
                * 1e6
            )
            .cast("bigint")
            .alias("nov_q")
        )
    )
    cov = recs.agg(
        F.countDistinct("b2").cast("bigint").alias("n_recommended"),
        F.count(F.lit(1)).cast("bigint").alias("n_rec_slots"),
    )
    novagg = nov.agg(
        F.expr("cast(sum(nov_q) div count(*) as bigint)").alias(
            "mean_novelty_q"
        )
    )
    return (
        tot.crossJoin(F.broadcast(cov))
        .crossJoin(F.broadcast(novagg))
        .select(
            "n_items",
            "n_recommended",
            F.expr(
                "cast(n_recommended * 1000000 div n_items as bigint)"
            ).alias("coverage_ppm"),
            "mean_novelty_q",
            "n_rec_slots",
        )
    )


# ---------------------------------------------------------------------------
# q469: shuffle_hash hint on the m self-join on ck
# ---------------------------------------------------------------------------


def q469_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _brand_rollup(spark, sf_dir)
    n2 = m.groupBy("b").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("nrm")
    )
    dots = (
        m.alias("a")
        .hint("shuffle_hash")
        .join(m.alias("c"), F.col("a.ck") == F.col("c.ck"))
        .filter(F.col("a.b") != F.col("c.b"))
        .groupBy(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .agg(F.sum(F.col("a.cnt") * F.col("c.cnt")).cast("bigint").alias("dot"))
    )
    cosv = (
        dots.join(
            F.broadcast(n2.select(F.col("b").alias("b1"), F.col("nrm").alias("nrm1"))),
            "b1",
        )
        .join(
            F.broadcast(n2.select(F.col("b").alias("b2"), F.col("nrm").alias("nrm2"))),
            "b2",
        )
        .select(
            "b1",
            "b2",
            (
                F.col("dot")
                / F.sqrt(F.col("nrm1").cast("double") * F.col("nrm2"))
            ).alias("cosine"),
        )
        .localCheckpoint(eager=False)
    )
    recs = (
        cosv.withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("b1").orderBy(F.col("cosine").desc(), "b2")
            ),
        )
        .filter(F.col("rnk") <= 3)
        .select("b1", "b2", "rnk")
    )
    pairs = (
        recs.alias("a")
        .join(recs.alias("b"), F.col("a.b1") == F.col("b.b1"))
        .filter(F.col("a.rnk") < F.col("b.rnk"))
        .select(
            F.col("a.b1").alias("b1"),
            F.least(F.col("a.b2"), F.col("b.b2")).alias("lo"),
            F.greatest(F.col("a.b2"), F.col("b.b2")).alias("hi"),
        )
    )
    sim = pairs.join(
        cosv.select(
            F.col("b1").alias("lo"), F.col("b2").alias("hi"), "cosine"
        ),
        ["lo", "hi"],
    ).select(
        "b1",
        F.floor((F.lit(1.0) - F.col("cosine")) * 1e6)
        .cast("bigint")
        .alias("dis_q"),
    )
    per = sim.groupBy("b1").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("cast(sum(dis_q) div count(*) as bigint)").alias("ild_q"),
    )
    g = per.agg(
        F.expr("cast(sum(ild_q) div count(*) as bigint)").alias("mean_ild_q")
    )
    return (
        per.crossJoin(F.broadcast(g))
        .select(F.col("b1").alias("brand"), "n_pairs", "ild_q", "mean_ild_q")
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# q172: text-only staging, NO other change (the fused-recount variant
# that lost in ab_r11e bundled this with a recount rewrite)
# ---------------------------------------------------------------------------


def q172_text_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens
    from tytodb_spark.streaming.pipeline import _pin_to_driver, mg_compress

    docs = _t(spark, sf_dir, "documents")
    min_frac, n_files = 0.02, 4
    m = max(8, int(2.0 / min_frac))
    staging = tempfile.mkdtemp(prefix="tyto_shh_")
    try:
        src = docs.select(F.col("text"))
        src_dir = os.path.join(staging, "src")
        src.repartition(n_files).write.parquet(src_dir)
        state_dir = os.path.join(staging, "state")

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            batch_counts = (
                batch_df.select(F.explode(tokens(F.col("text"))).alias("term"))
                .groupBy("term")
                .agg(F.sum(F.lit(1)).cast("bigint").alias("c"))
            )
            if os.path.exists(state_dir):
                prev = spark.read.parquet(state_dir)
                combined = (
                    prev.unionByName(batch_counts)
                    .groupBy("term")
                    .agg(F.sum("c").cast("bigint").alias("c"))
                )
            else:
                combined = batch_counts
            compressed = mg_compress(combined, m)
            tmp = os.path.join(staging, f"state_tmp_{batch_id}")
            compressed.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = os.path.join(staging, f"state_old_{batch_id}")
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(tmp, state_dir)
            if os.path.exists(old):
                shutil.rmtree(old)

        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(staging, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        cand_rows = _pin_to_driver(
            spark.read.parquet(state_dir).select("term"),
            "Misra-Gries candidate set",
        )
        candidates = spark.createDataFrame(cand_rows or [(" ",)], "term string")
        toks = src.select(F.explode(tokens(F.col("text"))).alias("term"))
        total = toks.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        return (
            toks.join(F.broadcast(candidates), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("__n")))
            .select("term", "cnt")
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


EXPERIMENTS = {
    "q437_cf_holdout_eval": q437_shj,
    "q468_rec_coverage": q468_shj,
    "q469_intra_list_diversity": q469_shj,
    "q172_stream_heavy_hitters": q172_text_only,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11h", cpus="32")
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
