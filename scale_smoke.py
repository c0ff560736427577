"""Scale-up smoke: run headline operators on k×-replicated inputs.

`bench.py` answers "how fast at sf0.1"; this answers the question the
100 TB target actually poses: does each plan's cost grow linearly in the
data (and stay shuffle-shaped the way the operator docstring claims)
when the input is 10-30× bigger than the test fixture? Replication is
IN-PLAN (crossJoin with a broadcast range + key shifting) so nothing is
written anywhere: the scan re-reads the same parquet k times, which also
makes per-row costs dominate — exactly what a bigger cluster would see.

Replication semantics per operator family:
- relational/agg/window: keys shifted per replica → cardinalities grow
  k×, group count grows k×, join fan-out stays 1:1 (no artificial k²).
- dedup: replicas are EXACT duplicates of each other (ids shifted) —
  the operator's job is to find them; group sizes grow k, groups stay
  constant, so the hash-groupBy cost model is exercised honestly.
- ANN: corpus grows k× with identical vectors under fresh ids; top-k
  contains replica copies, which is fine for a throughput measurement.
- pair-finding (MinHash/AllPairs): NOT scaled — replicating near-dup
  documents multiplies the true pair count by k² (every copy of A pairs
  with every copy of B), so runtime growth would measure the answer
  size, not the algorithm. bench.py covers these at 1×.

Usage: python scale_smoke.py [k]   (default 16; ~9.6M-row lineitem)
Prints one JSON line: {"k": k, "ops": {name: {"sec": s, "rows": n}}}.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables

DEC = "decimal(18,2)"
SHIFT = 10_000_000  # key offset per replica; far above any fixture key


def replicate(df: DataFrame, k: int, key_cols: list[str]) -> DataFrame:
    """k lazy copies with integer keys shifted per replica."""
    spark = df.sparkSession
    rep = F.broadcast(spark.range(k).select(F.col("id").alias("__rep")))
    out = df.crossJoin(rep)
    for c in key_cols:
        out = out.withColumn(c, F.col(c) + F.col("__rep") * F.lit(SHIFT))
    return out.drop("__rep")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    sf_dir = "/root/testdata/sf0.1"
    from tytodb_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    li = replicate(t["lineitem"], k, ["l_orderkey"])
    orders = replicate(t["orders"], k, ["o_orderkey", "o_custkey"])
    cust = replicate(t["customer"], k, ["c_custkey"])
    docs = replicate(t["documents"], k, ["doc_id"])
    emb = replicate(t["embeddings"], k, ["vec_id"])

    ops: dict[str, tuple[DataFrame, str]] = {}

    # hash aggregate over the fact table (partial agg map-side; the
    # shuffle carries |groups| rows regardless of k)
    ops["agg_pricing"] = (
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        ),
        "fact-side partial agg; shuffle size independent of k",
    )

    # broadcast join: dim stays 1× (parts are shared across replicas)
    ops["join_broadcast"] = (
        li.join(F.broadcast(t["part"]), li.l_partkey == t["part"].p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n")),
        "k× fact never shuffles; 1× dim ships once",
    )

    # shuffle join on a k×-growing key space (orders ⋈ customer)
    ops["join_shuffle"] = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("s")),
        "both sides shuffle on the join key; k× rows, k× groups",
    )

    # per-group top-k window over k× groups of constant size
    from tytodb_spark.operators.similarity import topk_per_key

    ops["window_topk"] = (
        topk_per_key(
            orders,
            "o_custkey",
            [F.col("o_totalprice").desc(), F.col("o_orderkey")],
            3,
        ),
        "partition count grows k×, partition size constant",
    )

    # exact dedup: replicas are true duplicates; group size grows k
    from tytodb_spark.operators.dedup import exact_dedup_groups

    ops["dedup_exact"] = (
        exact_dedup_groups(docs, "doc_id", "text"),
        "one shuffle on content hash; k-sized groups",
    )

    # tf-idf: k× docs (duplicated corpus; df grows k×, vocab constant)
    from tytodb_spark.queries import REGISTRY  # reuse the declared shape

    from tytodb_spark.operators.textual import spread, tokens

    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    ops["text_tf"] = (tf, "tokenize+count at k×; shuffle on (doc,term)")

    # ANN: brute-force k× corpus for 20 queries
    from tytodb_spark.operators.similarity import brute_force_knn

    ops["ann_brute"] = (
        brute_force_knn(
            t["embeddings"].filter(F.col("vec_id") < 20),
            emb,
            "vec_id",
            "embedding",
            k=10,
        ),
        "scan k× corpus once; two-phase top-k shuffles |q|·k·parts rows",
    )

    # distributed vector mean: rows grow k×, shuffle keys constant
    # (label × dim) — partial aggregation keeps the exchange flat
    ops["vector_centroids"] = (
        emb.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("c")),
        "k× component rows; (label,pos) key space constant",
    )

    # corpus top-k terms: k× token stream, constant vocabulary
    ops["top_terms"] = (
        spread(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20),
        "map-side combine collapses k× stream to constant vocab",
    )

    # sequence packing: shard count grows WITH the data (the scale
    # contract — per-shard window size stays constant as k grows)
    from tytodb_spark.operators.textual import token_count
    from pyspark.sql import Window as W

    n_shards = 8 * k
    pw = (
        W.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = (
        docs.select(
            "doc_id",
            (F.col("doc_id") % n_shards).alias("part"),
            token_count("text").cast("bigint").alias("n_tok"),
        )
        .select(
            "part",
            "n_tok",
            F.floor(F.coalesce(F.sum("n_tok").over(pw), F.lit(0)) / 512).alias(
                "seq_id"
            ),
        )
        .groupBy("part", "seq_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    ops["seq_packing"] = (
        packed,
        "shards grow k×, per-shard window constant",
    )

    # decontamination: train side grows k×, benchmark stays 1× — the
    # broadcast-probe plan's cost should track the train scan only
    from tytodb_spark.operators.textual import decontaminate

    ops["decontaminate"] = (
        decontaminate(
            docs.filter(F.col("source") != "src0"),
            t["documents"].filter(F.col("source") == "src0"),
            "doc_id",
            "text",
            n=5,
        ).select("doc_id"),
        "k× train side map-probes a 1× broadcast benchmark gram set",
    )

    # BM25: k× corpus, constant query-term set; the only corpus-sized
    # shuffle carries (id, len) pairs
    from tytodb_spark.operators.textual import bm25_scores

    ops["bm25"] = (
        bm25_scores(docs, "doc_id", "text", ["spark", "join", "dup"]),
        "k× tokenize pass; stats and df broadcast; narrow shuffles",
    )

    # temperature mix: k× corpus, constant domain count — selection is a
    # map-side filter under a broadcast probability table
    from tytodb_spark.operators.sampling import temperature_mix

    ops["domain_mix"] = (
        temperature_mix(docs, "doc_id", "source", 0.5, 0.5).select("doc_id"),
        "k× corpus never shuffles; |domains| keep-probs broadcast",
    )

    # CDC merge: k× base snapshot, 1× change batch — the base side must
    # stream through the anti-join without an exchange
    from tytodb_spark.operators.cdc import merge_apply

    base = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    ch = (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("op", F.lit("D"))
    )
    ops["cdc_merge"] = (
        merge_apply(base, ch, "o_orderkey", "op"),
        "k× base map-side anti-join; 1× change keys broadcast",
    )

    # embedding near-dup pairs: replicas land in k× DISJOINT label
    # blocks (both keys shifted), so true pairs grow k× — not the k²
    # a same-block replication would measure. build_rows forces the
    # keyed-shuffle path: the broadcast gate must not fire at scale.
    from tytodb_spark.operators.dedup import embedding_dup_pairs

    emb_blocked = replicate(t["embeddings"], k, ["vec_id", "label"])
    ops["embedding_dups"] = (
        embedding_dup_pairs(
            emb_blocked, "vec_id", "embedding", threshold=0.35,
            block_col="label", build_rows=10**9,
        ).select("id_a"),
        "k× disjoint blocks; per-block shuffle join, no broadcast",
    )

    # passage-level dedup: replicas are exact copies, so passage groups
    # grow k deep while the distinct-key space stays constant — the
    # honest dedup replication regime (cf. dedup_exact above)
    from tytodb_spark.operators.textual import passage_dedup_stats

    ops["passage_dedup"] = (
        passage_dedup_stats(docs, "doc_id", "text", 20).select("doc_id"),
        "k-deep passage groups; md5-key shuffle only",
    )

    # unigram LM scoring: k× token stream, constant vocabulary — the
    # vocab aggregate and broadcast stay fixed-size as k grows
    from tytodb_spark.operators.textual import unigram_nll

    ops["unigram_nll"] = (
        unigram_nll(docs, "doc_id", "text").select("doc_id"),
        "k× tokenize; constant vocab broadcast",
    )

    # incremental dedup: 1× new batch against a k× banded corpus — the
    # probe side stays constant; candidate growth tracks bucket depth
    from tytodb_spark.operators.dedup import minhash_lsh_pairs_incremental

    inc = docs.withColumn("__is_new", F.col("doc_id") < 100)
    ops["incremental_minhash"] = (
        minhash_lsh_pairs_incremental(
            inc, "doc_id", "text", "__is_new", shingle_n=3, threshold=0.5
        ).select("id_a"),
        "1× new batch probes k× banded corpus; no old×old pairs",
    )

    # duplicate-substring spans: replicas are exact copies — every
    # window key's count grows k deep, the distinct-key space stays
    # constant, islands per doc are unchanged (honest dedup regime)
    from tytodb_spark.operators.textual import duplicate_span_stats

    ops["dup_spans"] = (
        duplicate_span_stats(docs, "doc_id", "text", window=8).select("doc_id"),
        "k-deep window-hash groups; md5-key + int-position shuffles only",
    )

    # incremental rollup: k× base state merged with a 1× delta state —
    # merge cost tracks DISTINCT KEYS (constant here), not base rows
    from tytodb_spark.operators.incremental import merge_rollup, rollup_state

    ops["rollup_merge"] = (
        merge_rollup(
            rollup_state(li, ["l_returnflag", "l_linestatus"], ["l_quantity"]),
            rollup_state(
                t["lineitem"].filter(F.col("l_orderkey") % 10 == 0),
                ["l_returnflag", "l_linestatus"],
                ["l_quantity"],
            ),
            ["l_returnflag", "l_linestatus"],
        ),
        "k× base collapses map-side to constant state; merge is state-sized",
    )

    # heavy hitters: k× token stream, constant vocabulary — MG summaries
    # stay m-bounded per partition, the recount joins a constant
    # candidate set
    from tytodb_spark.operators.textual import frequent_tokens_exact

    ops["heavy_hitters"] = (
        frequent_tokens_exact(docs, "doc_id", "text", min_frac=0.02),
        "k× stream; bounded MG state per task; constant candidate set",
    )

    # NB scoring: model trained on the 1× corpus, applied to the k×
    # corpus — the scoring pass is a broadcast-model map join
    from tytodb_spark.operators.textual import nb_classify

    ops["nb_score"] = (
        nb_classify(t["documents"], docs, "doc_id", "text", "lang").select(
            "doc_id"
        ),
        "1× model broadcast; k× score side map-joins it",
    )

    # PageRank: k× disjoint replicas of the dup graph (both endpoints
    # shifted) — per-iteration join+agg work grows linearly, the
    # iteration count is fixed
    from tytodb_spark.operators.graph import pagerank_int

    pairs1 = (
        t["documents"]
        .select(
            F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
        )
        .filter(F.col("src") % 7 != 0)  # chains broken into components
    )
    und = pairs1.unionAll(
        pairs1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    edges_k = replicate(und, k, ["src", "dst"])
    ops["pagerank"] = (
        pagerank_int(edges_k, iters=5),
        "k× disjoint subgraphs; fixed iterations, linear join+agg each",
    )

    # token entropy: k× docs (replicas are fresh doc ids) — both
    # shuffles key on doc/doc+term, group count grows k×, size constant
    from tytodb_spark.operators.textual import token_entropy

    ops["token_entropy"] = (
        token_entropy(docs, "doc_id", "text").select("doc_id"),
        "k× docs; per-doc groups grow in count, not size",
    )

    # overlap chunking: zero-shuffle map-side expression work — cost is
    # the scan itself, the purest linear baseline here
    from tytodb_spark.operators.textual import chunk_with_overlap

    ops["chunk_overlap"] = (
        chunk_with_overlap(docs, "doc_id", "text").select("doc_id"),
        "zero shuffles; pure map-side chunking",
    )

    # EWMA: k× users (shifted), constant events per user — window
    # partitions grow in count, the LAG chain depth is fixed
    from tytodb_spark.operators.timeseries import ewma_truncated

    ev = replicate(t["events"], k, ["event_id", "user_id"])
    ops["ewma"] = (
        ewma_truncated(ev, "user_id", ["ts", "event_id"], "value").select(
            "event_id"
        ),
        "k× users; fixed-depth LAG chain per row",
    )

    # Bloom build + probe: k× key space — the build shuffle is capped at
    # m/32 words per task regardless of k; the probe is broadcast joins
    from tytodb_spark.operators.sketches import bloom_build, bloom_probe

    bl = bloom_build(orders, "o_custkey", m_bits=1 << 20)
    ops["bloom"] = (
        bloom_probe(cust, "c_custkey", bl, m_bits=1 << 20).select("bloom_hit"),
        "k× keys; build shuffle capped at m/32 words/task",
    )

    # skew report: k× rows, k× key space — count aggregate combines
    # map-side, top-k never globally sorts
    from tytodb_spark.operators.quality import key_skew_report

    ops["skew_report"] = (
        key_skew_report(orders, "o_custkey", top_n=5),
        "k× keys; combinable count + two-phase top-k",
    )

    # triangles: k× disjoint block graphs (both endpoints shifted) —
    # wedge and closing-join work grows linearly, never k²
    from tytodb_spark.operators.graph import triangle_count

    tri_e1 = docs.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    ).filter(F.expr("src div 50 = dst div 50"))
    tri_e2 = docs.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 2).alias("dst")
    ).filter(F.expr("src div 50 = dst div 50"))
    ops["triangles"] = (
        triangle_count(tri_e1.unionByName(tri_e2)),
        "k× disjoint blocks; oriented wedges grow linearly",
    )

    # quantile normalization: k× vectors — per-dim rank partitions grow
    # in SIZE (the documented caveat: parallelism = dim count)
    from tytodb_spark.operators.similarity import quantile_normalize

    ops["quantile_norm"] = (
        quantile_normalize(emb, "vec_id", "embedding").select("vec_id"),
        "k× rows per dim partition; parallelism = dim count",
    )

    # PMI: k× docs, constant vocabulary — presence rows per doc capped
    # by the broadcast vocab, pair work linear in docs
    from tytodb_spark.operators.textual import pmi_pairs

    ops["pmi"] = (
        pmi_pairs(docs, "doc_id", "text", vocab_k=30, min_pair=2),
        "k× docs; ≤k_vocab presence rows/doc; constant pair key space",
    )

    # exact KS: k× events — per-value counts grow k deep, the distinct
    # value domain (and so every bucketed-prefix stage) stays constant
    from tytodb_spark.operators.stats import ks_test

    ev_ks = replicate(t["events"], k, ["event_id"])
    ops["ks_test"] = (
        ks_test(
            ev_ks.filter(F.col("event_type").isin("click", "view")),
            F.floor(F.col("value") * 100).cast("bigint"),
            (F.col("event_type") == "click").cast("int"),
        ),
        "k-deep value counts; constant value domain → constant CDF stages",
    )

    # skip-gram pairs: k× docs, constant pair vocabulary — map-side
    # pairing, one combinable count, TakeOrdered top-k
    from tytodb_spark.operators.textual import tokens as _tk

    sg = spread(docs, "doc_id").select(_tk("text").alias("__t"))
    sg_pairs = sg.select(
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, greatest(size(__t)-1, 0)), "
                "slice(__t, 2, greatest(size(__t)-1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    ops["skipgram"] = (
        sg_pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(100),
        "k× pair stream collapses map-side to constant pair vocab",
    )

    # moments sketch: k× events, constant group count — pure partial-
    # aggregation; the shuffle carries |groups| power-sum rows
    ops["moment_sketch"] = (
        ev_ks.select(
            "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("vc").alias("s1"),
            F.sum(F.col("vc") * F.col("vc")).alias("s2"),
            F.sum((F.col("vc") * F.col("vc") * F.col("vc")).cast("decimal(38,0)")).alias("s3"),
        ),
        "k× rows combine map-side; shuffle = |groups| sum rows",
    )

    # bloom-prefiltered semi join: k× fact side, 1× key set — probe is
    # map-side against broadcast words; exact join broadcast too
    ops["bloom_semi_join"] = (
        bloom_probe(
            li.select("l_orderkey"),
            "l_orderkey",
            bloom_build(
                t["orders"].filter(F.col("o_totalprice") > 200000).select(
                    F.col("o_orderkey").alias("key")
                ),
                "key",
            ),
        ).filter(F.col("bloom_hit")).select("l_orderkey"),
        "k× fact map-probes a broadcast word table; no fact shuffle",
    )

    # round-5 operators ------------------------------------------------------
    from tytodb_spark.operators.stats import (
        auc_exact,
        cusum_per_key,
        grouped_quantiles,
        trimmed_mean_by,
    )

    ev = replicate(t["events"], k, ["event_id", "user_id"])
    # per-key CUSUM: k× keys of constant series length — window
    # partitions grow in count, never in size
    ops["cusum"] = (
        cusum_per_key(
            ev,
            F.col("user_id"),
            [F.col("ts"), F.col("event_id")],
            F.floor(F.col("value") * 1e6).cast("bigint"),
        ),
        "per-key windows; k× keys, constant series length",
    )
    # grouped CDF machinery: value domain constant, counts grow k —
    # the count-table working set is parallelism-friendly by design
    ops["grouped_quantiles"] = (
        grouped_quantiles(
            orders,
            F.col("o_orderstatus"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
            [("p50", 50, 100), ("p95", 95, 100)],
            bucket_width=1_000_000,
        ),
        "grouped bucketed prefix sums; |values| working set",
    )
    ops["trimmed_mean"] = (
        trimmed_mean_by(
            cust,
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint"),
        ),
        "count-arithmetic trim on the (group, value) table",
    )
    ops["auc"] = (
        auc_exact(
            ev,
            F.floor(F.col("value") * 1e4).cast("bigint"),
            (F.col("event_type") == "click").cast("int"),
            bucket_width=100,
        ),
        "global bucketed CDF; per-value count table only",
    )
    # aHash fingerprint build: linear explode fan-out, two keyed aggs;
    # the Hamming pair stage is excluded (replication inflates true
    # pair count k² — same exclusion rule as MinHash/AllPairs)
    from tytodb_spark.operators.multimodal import ahash48

    ops["ahash_build"] = (
        ahash48(docs, "doc_id", "text"),
        "48× narrow explode + 2 keyed aggs; codegen, no Python stage",
    )

    # round 5b — attribution pairing: users replicate with shifted ids,
    # so per-user touch×conversion fan-out stays constant and the pair
    # table grows k× (never k²)
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.unix_micros("ts").alias("conv_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    tch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", F.unix_micros("ts").alias("touch_us")
    )
    ops["decay_attribution_pairs"] = (
        conv.join(tch, "user_id")
        .filter(
            (F.col("touch_us") <= F.col("conv_us"))
            & (F.col("conv_us") - F.col("touch_us") < 604800000000)
        )
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("vc").alias("vc")),
        "equi-join on user; per-user fan-out constant, pairs grow k",
    )

    # round 5b — rolling autocorr: k× users, constant per-user history
    wq = W.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("x"),
    ).select(
        "user_id",
        "event_id",
        "x",
        F.lag("x").over(wq).alias("y"),
        F.sum("x").over(wq.rowsBetween(-23, 0)).alias("sx"),
    )
    ops["rolling_autocorr_windows"] = (
        lagged.filter(F.col("y").isNotNull()),
        "windows per user; partition count grows k, size constant",
    )

    # round 5b — grouped CDF (percent_rank machinery): distinct value
    # domain grows k× via per-REPLICA value shifts (replica index =
    # event_id div SHIFT, the replicate() key offset — NOT event_id %
    # k, which is constant across replicas whenever k divides SHIFT)
    from tytodb_spark.operators.stats import with_prefix_sums

    counts = (
        ev.select(
            "event_type",
            (
                F.floor(F.col("value") * 100 + 0.5).cast("bigint")
                + F.expr(f"(event_id div {SHIFT}) * 100000")
            ).alias("v"),
        )
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    ops["grouped_cdf_prefix"] = (
        with_prefix_sums(counts, 1000, ["cnt"], group_cols=["event_type"]),
        "per-value table grows k; bucket windows stay bounded",
    )

    # round 11b — Gram accumulation (q520's primitive): the corpus pass
    # is embarrassingly parallel (each Arrow batch emits d×d metadata),
    # the combine shuffle is a CONSTANT 2.1k rows regardless of k
    from tytodb_spark.operators.similarity import gram_partials

    ops["gram_partials"] = (
        gram_partials(emb, "embedding"),
        "k× corpus through the Python map; combine shuffle constant-size",
    )

    results: dict[str, dict[str, float | int]] = {}
    for name, (df, note) in ops.items():
        t0 = time.time()
        n = df.count()
        sec = round(time.time() - t0, 3)
        results[name] = {"sec": sec, "rows": n}
        print(f"# {name}: {sec}s rows={n} ({note})", file=sys.stderr)
    print(json.dumps({"k": k, "sf": 0.1, "ops": results}))


if __name__ == "__main__":
    main()
