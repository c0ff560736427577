"""Round-11 optimization A/B harness, part 2: operator-internal
re-plans (star-CC round fusion, checkpoint eagerness, self-join
barriers, broadcast half-steps). Same methodology as ab_r11.py:
interleaved same-session timing, min over >=3 reps, oracle check before
applying.

Usage: python tools/ab_r11b.py [exp ...]   (default: all experiments)
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.queries import _t
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


# ---------------------------------------------------------------------------
# Variant 1: connected_components_star with fused rounds (guide §2.4
# "remove shuffles outright"): the per-round large.distinct() and
# oriented.distinct() exchanges are REDUNDANT — large feeds only the
# oriented transform (distinct-of-f(x) == distinct-of-f(distinct(x)))
# and oriented feeds a min-aggregate (duplicate rows cannot change a
# min) plus a join whose duplicate outputs the final small.distinct()
# already removes. The und localCheckpoint also goes: und is
# small ∪ swap(small) over the ALREADY-checkpointed small, and its two
# consumers (neighborhood_min + the join probe) plan the identical
# Exchange(hash u), which ReusedExchange dedups — the extra
# materialization job per round bought nothing.
# ---------------------------------------------------------------------------


def star_v2(
    pairs_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 30,
) -> DataFrame:
    und = (
        pairs_df.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(pairs_df.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def neighborhood_min(edges: DataFrame) -> DataFrame:
        return edges.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    def signature(edges: DataFrame):
        row = edges.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return row["n"], row["h"]

    sig = signature(und)
    converged = False
    for _ in range(max_iters):
        lm = neighborhood_min(und)
        large = (
            und.join(lm, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        sm = neighborhood_min(oriented)
        small = (
            oriented.join(sm, "u")
            .select(F.col("v"), F.col("m"), F.col("u"))
            .select(
                F.explode(F.array(F.col("v"), F.col("u"))).alias("u"),
                F.col("m").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = signature(small)
        und = small.union(
            small.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError("star_v2 did not converge")
    stars = und.filter(F.col("u") > F.col("v"))
    members = stars.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
    roots = stars.select(F.col("v").alias("vertex")).distinct().withColumn(
        "component", F.col("vertex")
    )
    return members.groupBy("vertex").agg(F.min("component").alias("component")).union(
        roots
    ).groupBy("vertex").agg(F.min("component").alias("component"))


def q112_star_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = docs.alias("a"), docs.alias("b")
    edges = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.expr("a.doc_id div 40") == F.expr("b.doc_id div 40"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    comp = star_v2(edges, "id_a", "id_b")
    return comp.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("component").cast("bigint").alias("component"),
    )


def q171_star_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import connected_components

    ids = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")
    chain = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.expr("a.doc_id div 10") == F.expr("b.doc_id div 10"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    olde = chain.filter(F.col("id_b") < 300)
    newe = chain.filter(F.col("id_a") >= 300)
    bridges = (
        ids.filter((F.col("doc_id") >= 300) & (F.col("doc_id") % 97 == 0))
        .select(
            F.col("doc_id").alias("id_a"), (F.col("doc_id") - 300).alias("id_b")
        )
    )
    old_labels = connected_components(olde)
    star = old_labels.select(
        F.col("vertex").alias("id_a"), F.col("component").alias("id_b")
    ).filter(F.col("id_a") != F.col("id_b"))
    merged = star.unionByName(newe.unionByName(bridges).select("id_a", "id_b"))
    out = star_v2(merged, "id_a", "id_b")
    isolated = old_labels.join(
        out.select(F.col("vertex")), "vertex", "left_anti"
    )
    inc = out.unionByName(isolated)
    return inc.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("component").cast("bigint").alias("component"),
    )


# ---------------------------------------------------------------------------
# Variant 2: _oriented_adjacency with EAGER checkpoints ("the q437
# lesson", ADVICE r10): o and adj are lazy checkpoints consumed by
# CONCURRENT AQE broadcast-stage jobs (adj broadcasts twice into the
# intersection join), so the un-materialized barrier can be computed
# more than once. Eager materialization runs each subtree exactly once.
# ---------------------------------------------------------------------------


def _oriented_adjacency_eager(e: DataFrame):
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.select(F.col("node").alias("nu"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("nv"), F.col("d").alias("dv"))
    o = (
        e.join(du, F.col("u") == F.col("nu"))
        .join(dv, F.col("v") == F.col("nv"))
        .select(
            F.expr(
                "case when du < dv or (du = dv and u < v)"
                " then u else v end"
            ).alias("s"),
            F.expr(
                "case when du < dv or (du = dv and u < v)"
                " then v else u end"
            ).alias("t"),
        )
        .localCheckpoint(eager=True)
    )
    adj = o.groupBy("s").agg(
        F.array_sort(F.collect_list("t")).alias("nb")
    ).localCheckpoint(eager=True)
    return deg, o, adj


def q378_eager_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.queries import (
        _copurchase_edges,
        _triangles_by_intersection,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg, o, adj = _oriented_adjacency_eager(e)
    tri = _triangles_by_intersection(o, adj).agg(
        F.sum(F.expr("size(ws)")).cast("bigint").alias("n_tri")
    )
    stats = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    wt = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("bigint").alias("n_wedges")
    )
    return (
        stats.crossJoin(F.broadcast(wt))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_tri",
            F.expr(
                "cast(3 * n_tri * 1000000 div n_wedges as bigint)"
            ).alias("clustering_ppm"),
        )
    )


def q436_eager_adj(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.queries import (
        _copurchase_edges,
        _triangles_by_intersection,
    )

    e = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    _deg, o, adj = _oriented_adjacency_eager(e)
    tw = _triangles_by_intersection(o, adj)
    contrib = tw.select(
        F.explode(
            F.expr(
                "concat("
                " case when size(ws) > 0 then"
                "  array(struct(least(s, t) as u, greatest(s, t) as v,"
                "        cast(size(ws) as bigint) as c))"
                " else array() end,"
                " flatten(transform(ws, w -> array("
                "  struct(least(s, w) as u, greatest(s, w) as v,"
                "         cast(1 as bigint) as c),"
                "  struct(least(t, w) as u, greatest(t, w) as v,"
                "         cast(1 as bigint) as c)))))"
            )
        ).alias("ed")
    ).select("ed.u", "ed.v", "ed.c")
    return (
        contrib.groupBy("u", "v")
        .agg(F.sum("c").cast("bigint").alias("support"))
        .orderBy(F.col("support").desc(), "u", "v")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Variant 3: q41 jaccard_pairs with a barrier on the prefix table
# (guide §1.2/§2.4): the candidates self-join consumes `prefix` on both
# sides, and the captured before-plan shows the ENTIRE prefix subtree
# (posts explode + dfreq aggregate + per-doc rank Window) planned
# TWICE. A localCheckpoint on prefix runs it once.
# ---------------------------------------------------------------------------


def q41_prefix_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import shingle_table
    from pyspark.sql import Window as W

    df = _t(spark, sf_dir, "documents")
    id_col, text_col, n, threshold = "doc_id", "text", 3, 0.5
    shingled = shingle_table(df, id_col, text_col, n)
    posts = shingled.select("__id", "__n", F.explode("__sh").alias("__s"))
    dfreq = F.broadcast(posts.groupBy("__s").agg(F.count(F.lit(1)).alias("__df")))
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    prefix = (
        posts.join(dfreq, "__s")
        .withColumn(
            "__rk",
            F.row_number().over(W.partitionBy("__id").orderBy("__df", "__s")),
        )
        .filter(F.col("__rk") <= prefix_len)
        .select("__id", "__n", "__s")
        .localCheckpoint(eager=True)  # consumed by BOTH self-join sides
    )
    a = prefix.select(F.col("__id").alias("id_a"), F.col("__n").alias("n_a"), "__s")
    b = prefix.select(F.col("__id").alias("id_b"), F.col("__n").alias("n_b"), "__s")
    candidates = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.least("n_a", "n_b")
            >= F.lit(threshold) * F.greatest("n_a", "n_b") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sh = shingled.select("__id", "__sh", "__n")
    verified = (
        candidates.join(
            sh.select(
                F.col("__id").alias("id_a"),
                F.col("__sh").alias("sh_a"),
                F.col("__n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("__id").alias("id_b"),
                F.col("__sh").alias("sh_b"),
                F.col("__n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("__n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("__n_common") / (F.col("n_a") + F.col("n_b") - F.col("__n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


# ---------------------------------------------------------------------------
# Variant 4: q248 HITS with broadcast score tables (guide §3.1): the
# before-plan shuffles the edge list e through FOUR SortMergeJoins (one
# per half-step) because h1/h2q join without a hint while the _qnorm
# outputs sometimes broadcast. Every score table is node-metadata
# (|customers| or |suppliers| rows of two bigints) — orders of
# magnitude smaller than the edge fact — so broadcast all of them and
# e is never shuffled for a join at all; the only exchanges left are
# the per-node aggregates, which partial-aggregate map-side.
# ---------------------------------------------------------------------------


def q248_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    )
    e = (
        li.join(o, "ok")
        .select("c", "s")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _qnorm(df, key, val, out):
        m = df.agg(F.max(val).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            key, F.expr(f"({val} * 1000000) div m").cast("bigint").alias(out)
        )

    h1 = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("h"))
    a1 = (
        e.join(F.broadcast(h1), "c")
        .groupBy("s")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    a1q = _qnorm(a1, "s", "a", "aq")
    h2 = (
        e.join(F.broadcast(a1q), "s")
        .groupBy("c")
        .agg(F.sum("aq").cast("bigint").alias("h"))
    )
    h2q = _qnorm(h2, "c", "h", "hq")
    a2 = (
        e.join(F.broadcast(h2q), "c")
        .groupBy("s")
        .agg(F.sum("hq").cast("bigint").alias("a"))
    )
    a2q = _qnorm(a2, "s", "a", "aq")
    tops = (
        a2q.orderBy(F.col("aq").desc(), "s")
        .limit(20)
        .select(
            F.lit("authority").alias("role"),
            F.col("s").alias("node_id"),
            F.col("aq").alias("score_q"),
        )
    )
    toph = (
        h2q.orderBy(F.col("hq").desc(), "c")
        .limit(20)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.col("hq").alias("score_q"),
        )
    )
    return tops.unionByName(toph)


# ---------------------------------------------------------------------------
# Variant 5: q129 BPE with an EAGER barrier on each round's 1-row merge
# rule: without it, round k's corpus-replace lineage embeds rounds
# 1..k-1's full pair-count subtrees, and every consumer (the final
# union AND each later round's broadcast) re-plans them. Checkpointing
# the single-row `best` truncates that: each round is exactly one
# corpus pass (+ k map-side replaces), three corpus jobs total.
# ---------------------------------------------------------------------------


def q129_bpe_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, tokens

    df = _t(spark, sf_dir, "documents")
    id_col, joiner, n_merges = "doc_id", "~", 3
    cur = spread(df.select(id_col, "text"), id_col).select(
        F.col(id_col),
        F.concat(
            F.lit(" "), F.concat_ws(" ", tokens(F.col("text"))), F.lit(" ")
        ).alias("__t"),
    )
    results = []
    for k in range(1, n_merges + 1):
        toks = F.filter(F.split("__t", " "), lambda t: t != "")
        pairs = cur.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.struct(
                            F.element_at(toks, i.cast("int")).alias("w1"),
                            F.element_at(toks, (i + 1).cast("int")).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
            ).alias("p")
        ).select("p.w1", "p.w2")
        best = (
            pairs.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .withColumn("merge_idx", F.lit(k))
            .localCheckpoint(eager=True)  # 1 row; truncates round lineage
        )
        results.append(best.select("merge_idx", "w1", "w2", "cnt"))
        pat = F.concat(F.lit(" "), F.col("w1"), F.lit(" "), F.col("w2"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.col("w1"), F.lit(joiner), F.col("w2"), F.lit(" ")
        )
        merged = F.col("__t")
        for _ in range(3):
            merged = F.replace(merged, pat, rep)
        cur = (
            cur.crossJoin(F.broadcast(best.select("w1", "w2")))
            .select(F.col(id_col), merged.alias("__t"))
        )
    out = results[0]
    for r in results[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# Variant 6: q437 with broadcasts on the user-bounded side tables
# (guide §3.1): users (qualifying customers), test (holdout pairs) and
# hsz (per-user holdout size) are all bounded by the customer count —
# tiny next to the train fact — yet the before-plan runs them through
# SortMergeJoins with full exchanges. Broadcasting removes three
# exchange+sort pairs from the scoring path.
# ---------------------------------------------------------------------------


def q437_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _m

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    _NDCG_GAIN = {
        r: int(_m.floor(1e6 / _m.log2(r + 1))) for r in range(1, 6)
    }
    _NDCG_IDEAL = {
        h: sum(_NDCG_GAIN[r] for r in range(1, h + 1)) for h in range(1, 6)
    }
    from pyspark.sql import Window as W

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
        a.join(c, (F.col("ck") == F.col("ck2")) & (F.col("b1") != F.col("b2")))
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
        train.join(F.broadcast(users), "ck")
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
        F.broadcast(
            test.select("ck", F.col("b").alias("cand")).withColumn(
                "hit", F.lit(1)
            )
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
        test.join(F.broadcast(users), "ck")
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
        peruser.join(F.broadcast(hsz), "ck")
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


EXPERIMENTS = {
    "q112_star_clusters": q112_star_fused,
    "q171_incremental_cc": q171_star_fused,
    "q378_triangle_count": q378_eager_adj,
    "q436_edge_support": q436_eager_adj,
    "q41_jaccard_pairs": q41_prefix_barrier,
    "q248_hits_scores": q248_bcast,
    "q129_bpe_merges": q129_bpe_barrier,
    "q437_cf_holdout_eval": q437_bcast,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11b", cpus="32")
    todo = names or list(EXPERIMENTS)
    warm_dir = "/root/testdata/sf0.001"
    for n in todo:
        for fn in (Q.REGISTRY[n].fn, EXPERIMENTS[n]):
            try:
                with checkpoint_scope(spark):
                    fn(spark, warm_dir).count()
            except Exception as exc:
                print(f"# warm FAIL {n}: {exc}")
    results: dict[str, tuple[list[float], list[float]]] = {
        n: ([], []) for n in todo
    }
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
