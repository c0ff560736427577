"""Round-11 optimization A/B harness, part 5: streaming-operator drain
costs and the bootstrap uniform projection.

- q172 stream_heavy_hitters: stage ONLY the text column (the staged
  doc_id is never read) and fuse the post-drain recount from two corpus
  tokenize passes (total + candidate counts) into ONE aggregate whose
  grouping key collapses non-candidate mass map-side.
- q193 stream_dedup: drain 4 micro-batches instead of 6 — the state is
  corpus-keyed, so every extra batch rewrites the full survivor map
  (the q506/q172 trim applied to the third state machine; output is
  batch-split independent by the merge algebra).
- q173 bootstrap: project the md5 uniform into a column BEFORE the
  ~10-term Poisson-CDF comparison sum, so codegen provably evaluates
  md5 once per (row, replicate) instead of relying on subexpression
  elimination.

Usage: python tools/ab_r11e.py [exp ...]
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
from tytodb_spark.queries import _t
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


# ---------------------------------------------------------------------------
# q172: text-only staging + fused single-pass recount
# ---------------------------------------------------------------------------


def q172_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens
    from tytodb_spark.streaming.pipeline import _pin_to_driver, mg_compress

    docs = _t(spark, sf_dir, "documents")
    min_frac, n_files = 0.02, 4
    m = max(8, int(2.0 / min_frac))
    staging = tempfile.mkdtemp(prefix="tyto_shh_")
    try:
        # stage ONLY text — the id column was written and streamed but
        # never read by the batch handler or the recount
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
        # fused recount: ONE tokenize pass. Non-candidate tokens group
        # under a NULL key (collapsed map-side to one partial per
        # partition); total = sum over ALL keys, candidates filter out.
        toks = src.select(F.explode(tokens(F.col("text"))).alias("term"))
        per_key = (
            toks.join(
                F.broadcast(candidates.withColumn("__c", F.lit(True))),
                "term",
                "left",
            )
            .groupBy(
                F.when(F.col("__c"), F.col("term")).alias("term")
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .localCheckpoint(eager=True)  # tiny (<= m+1 rows), 2 consumers
        )
        total = per_key.agg(F.sum("cnt").cast("bigint").alias("__n"))
        return (
            per_key.filter(F.col("term").isNotNull())
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("__n")))
            .select("term", "cnt")
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


# ---------------------------------------------------------------------------
# q193: 4 micro-batches instead of 6
# ---------------------------------------------------------------------------


def q193_four_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens
    from tytodb_spark.streaming.pipeline import stream_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.array_join(F.slice(tokens(F.col("text")), 1, 8), " "))
    return stream_exact_dedup(spark, docs, "doc_id", key, n_files=4)


# ---------------------------------------------------------------------------
# q173: project the md5 uniform before the CDF comparison chain
# ---------------------------------------------------------------------------


def q173_projected_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import _poisson1_cdf, md5_uniform52

    n_reps, lo_rank, hi_rank = 32, 2, 31
    cdf = _poisson1_cdf()
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    reps = F.broadcast(spark.range(n_reps).select(F.col("id").alias("__b")))
    v = ev.select(
        F.col("event_id").alias("__id"),
        F.floor(F.col("value").cast("double") * 100).cast("bigint").alias("__vc"),
    )
    u = md5_uniform52(
        F.concat(
            F.col("__id").cast("string"), F.lit(":"), F.col("__b").cast("string")
        )
    )
    expanded = v.crossJoin(reps).select(
        "__b", "__vc", u.alias("__u")  # md5 evaluated exactly once here
    )
    w = F.lit(0)
    for c in cdf:
        w = w + (F.col("__u") > F.lit(c)).cast("int")
    rep = (
        expanded.select("__b", w.cast("bigint").alias("__w"), "__vc")
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__vc")).cast("bigint").alias("__s"),
            F.sum("__w").cast("bigint").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .select(
            "__b",
            F.floor(F.col("__s") * F.lit(1000) / F.col("__n"))
            .cast("bigint")
            .alias("__m"),
        )
    )
    ranked = rep.withColumn(
        "__r", F.row_number().over(W.orderBy(F.col("__m"), F.col("__b")))
    )
    missing = F.raise_error(
        F.lit("poisson_bootstrap_ci: fewer than hi_rank non-empty replicates")
    ).cast("bigint")
    ci = ranked.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__m"))).alias("__hi"),
    ).select(
        F.coalesce(F.col("__lo"), missing).alias("lo_q"),
        F.coalesce(F.col("__hi"), missing).alias("hi_q"),
    )
    base = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.floor(F.sum("__vc") * F.lit(1000) / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_q"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        "mean_q",
        "lo_q",
        "hi_q",
        (
            (F.col("lo_q") <= F.col("mean_q"))
            & (F.col("mean_q") <= F.col("hi_q"))
        ).alias("ci_ok"),
    )


# ---------------------------------------------------------------------------
# q414: per-query shuffled-hash-join hint on the ck self-join — the one
# big solo win (+18.8%) from the rejected GLOBAL preferSortMergeJoin
# sweep, re-tested as a local hint (guide §3: pick per join).
# ---------------------------------------------------------------------------


def q414_shj_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    n2 = m.groupBy("b").agg(
        F.sum(F.expr("cnt * cnt")).cast("bigint").alias("nrm")
    )
    a = m.select("ck", F.col("b").alias("b1"), F.col("cnt").alias("cnt1"))
    c = m.select(
        F.col("ck").alias("ck2"),
        F.col("b").alias("b2"),
        F.col("cnt").alias("cnt2"),
    )
    dots = (
        a.hint("shuffle_hash")
        .join(c, (F.col("ck") == F.col("ck2")) & (F.col("b1") < F.col("b2")))
        .groupBy("b1", "b2")
        .agg(F.sum(F.expr("cnt1 * cnt2")).cast("bigint").alias("dot"))
    )
    x = n2.select(F.col("b").alias("b1"), F.col("nrm").alias("nrm1"))
    y = n2.select(F.col("b").alias("b2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(F.broadcast(x), "b1")
        .join(F.broadcast(y), "b2")
        .select(
            "b1",
            "b2",
            "dot",
            F.round(
                F.expr("dot / sqrt(cast(nrm1 as double) * nrm2)"), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "b1", "b2")
        .limit(15)
    )


EXPERIMENTS = {
    "q172_stream_heavy_hitters": q172_fused,
    "q193_stream_dedup": q193_four_batches,
    "q173_bootstrap_ci": q173_projected_u,
    "q414_item_item_cf": q414_shj_hint,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11e", cpus="32")
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
