"""Round-11 optimization A/B harness: interleaved same-session timing of
candidate re-plans vs the registry implementation.

Methodology (README bench section): never compare across sessions — run
baseline and variant alternately in ONE session, several reps, keep the
min per arm. Candidates that win AND pass the oracle differential get
applied to queries.py; losers are recorded in OPTIMIZATION_r11.md.

Usage: python tools/ab_r11.py [exp ...]   (default: all experiments)
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
# Variant implementations (basket-form pair generation for the co-supply
# family: one groupBy collect_set + map-side sorted-pair explode replaces
# the distinct + degree-join + self-join pipeline — guide §2.4 "remove
# shuffles outright", precedent: _copurchase_edges 5.7 -> 3.6 s).
# ---------------------------------------------------------------------------


_PAIRS = (
    "flatten(transform(ss, (x, i) ->"
    " transform(slice(ss, i + 2, size(ss)),"
    " y -> struct(x as s1, y as s2))))"
)


def q222_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss").between(2, 32))
    )
    pr = baskets.select(
        F.floor(F.lit(1000000.0) / F.log(F.size("ss")) + 0.5)
        .cast("bigint")
        .alias("w_q"),
        F.explode(F.expr(_PAIRS)).alias("pr"),
    )
    return (
        pr.select("pr.s1", "pr.s2", "w_q")
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum("w_q").cast("bigint").alias("aa_q"),
        )
        .orderBy(F.col("aa_q").desc(), "s1", "s2")
        .limit(100)
    )


def q467_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss").between(2, 32))
        .localCheckpoint(eager=False)  # reused: pair explode + sdeg
    )
    sdeg = (
        baskets.select(F.explode("ss").alias("supp"))
        .groupBy("supp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    pr = (
        baskets.select(
            F.floor(F.lit(1000000.0) / F.size("ss") + 0.5)
            .cast("bigint")
            .alias("ra_term"),
            F.explode(F.expr(_PAIRS)).alias("pr"),
        )
        .select("pr.s1", "pr.s2", "ra_term")
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("ra_term").cast("bigint").alias("ra_q"),
        )
    )
    return (
        pr.join(
            F.broadcast(
                sdeg.select(F.col("supp").alias("s1"), F.col("d").alias("d1"))
            ),
            "s1",
        )
        .join(
            F.broadcast(
                sdeg.select(F.col("supp").alias("s2"), F.col("d").alias("d2"))
            ),
            "s2",
        )
        .select(
            "s1",
            "s2",
            "cn",
            "ra_q",
            (F.col("d1") * F.col("d2")).cast("bigint").alias("pa"),
            F.expr("cast(cn * 1000000 div (d1 + d2 - cn) as bigint)").alias(
                "jaccard_ppm"
            ),
        )
        .orderBy(F.col("ra_q").desc(), "s1", "s2")
        .limit(50)
    )


def q466_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss").between(2, 32))
    )
    edges = (
        baskets.select(F.explode(F.expr(_PAIRS)).alias("pr"))
        .select(F.col("pr.s1").alias("u"), F.col("pr.s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)  # edge set, reused 4x
    )
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    top = (
        deg.filter(F.col("d") >= 2)
        .orderBy(F.col("d").desc(), F.col("n"))
        .limit(20)
        .localCheckpoint(eager=False)  # 20-row hub panel, reused 3x
    )
    nbr = (
        top.join(edges, top.n == edges.u)
        .select(F.col("n").alias("hub"), F.col("v").alias("nb"))
        .unionAll(
            top.join(edges, top.n == edges.v).select(
                F.col("n").alias("hub"), F.col("u").alias("nb")
            )
        )
        .localCheckpoint(eager=False)
    )
    tri = (
        edges.join(
            F.broadcast(nbr.select(F.col("hub"), F.col("nb").alias("u"))), "u"
        )
        .join(
            F.broadcast(nbr.select("hub", F.col("nb").alias("v"))),
            ["v", "hub"],
        )
        .groupBy("hub")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tri"))
    )
    return (
        top.join(tri, top.n == tri.hub, "left")
        .fillna(0, ["n_tri"])
        .select(
            F.col("n").alias("supp"),
            F.col("d").alias("degree"),
            F.col("n_tri").cast("bigint").alias("n_tri"),
            F.expr(
                "cast(2 * n_tri * 1000000 div (d * (d - 1)) as bigint)"
            ).alias("lcc_ppm"),
        )
        .orderBy(F.col("degree").desc(), "supp")
    )


def q314_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("int").alias("com")
    )
    baskets = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    el0 = (
        baskets.select(F.explode(F.expr(_PAIRS)).alias("pr"))
        .select("pr.s1", "pr.s2")
        .distinct()
    )
    el = (
        el0.join(
            F.broadcast(
                sp.select(F.col("s_suppkey").alias("s1"), F.col("com").alias("c1"))
            ),
            "s1",
        )
        .join(
            F.broadcast(
                sp.select(F.col("s_suppkey").alias("s2"), F.col("com").alias("c2"))
            ),
            "s2",
        )
        .select("c1", "c2")
        .localCheckpoint(eager=False)
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


def q413_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.queries import _PR_TELEPORT

    li = _t(spark, sf_dir, "lineitem")
    baskets = li.groupBy(F.col("l_partkey").alias("part")).agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    eu = (
        baskets.select(F.explode(F.expr(_PAIRS)).alias("pr"))
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
        .localCheckpoint(eager=False)  # reused every iteration
    )
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("outdeg")
    )
    nodes = e.select(F.col("src").alias("s")).distinct()
    nn = nodes.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "s", F.expr("cast(1000000000 div n as bigint)").alias("r")
    )
    for _ in range(3):
        contrib = (
            e.join(deg, "src")
            .join(r.select(F.col("s").alias("src"), "r"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("r div outdeg")).cast("bigint").alias("v"))
        )
        r = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib.withColumnRenamed("dst", "s"), "s", "left")
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


_BPAIRS = (
    "flatten(transform(bs, (x, i) ->"
    " transform(slice(bs, i + 2, size(bs)),"
    " y -> struct(x as b1, y as b2))))"
)


def q411_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=False)  # reused: n, item counts, pairs
    )
    nn = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ic = (
        baskets.select(F.explode("bs").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pr = (
        baskets.select(F.explode(F.expr(_BPAIRS)).alias("pr"))
        .select("pr.b1", "pr.b2")
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pn"))
        .filter("pn >= 20")
    )
    i1 = ic.select(F.col("b").alias("b1"), F.col("cnt").alias("cnt1"))
    i2 = ic.select(F.col("b").alias("b2"), F.col("cnt").alias("cnt2"))
    return (
        pr.join(F.broadcast(i1), "b1")
        .join(F.broadcast(i2), "b2")
        .crossJoin(F.broadcast(nn))
        .select(
            "b1",
            "b2",
            F.col("pn").alias("pair_n"),
            F.round(F.expr("cast(pn as double) / n"), 6).alias("support"),
            F.round(F.expr("cast(pn as double) / cnt1"), 6).alias(
                "confidence"
            ),
            F.round(
                F.expr(
                    "cast(pn as double) * n / (cast(cnt1 as double) * cnt2)"
                ),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "b1", "b2")
        .limit(20)
    )


def q412_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    baskets = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
        .localCheckpoint(eager=False)  # reused: edge count + wedges
    )
    wedge = (
        baskets.select(F.explode(F.expr(_BPAIRS)).alias("pr"))
        .select("pr.b1", "pr.b2")
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    edges = baskets.agg(
        F.sum(F.size("bs")).cast("bigint").alias("n_edges")
    )
    return (
        wedge.agg(
            F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("n_wedges"),
            F.coalesce(F.sum(F.expr("w * (w - 1) / 2")), F.lit(0))
            .cast("bigint")
            .alias("n_butterflies"),
        )
        .crossJoin(F.broadcast(edges))
        .select("n_edges", "n_wedges", "n_butterflies")
    )


_VPAIRS = (
    "flatten(transform(vs, (x, i) ->"
    " transform(slice(vs, i + 2, size(vs)),"
    " y -> struct(x.b as b1, y.b as b2, x.cnt * y.cnt as p))))"
)


def q414_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    m = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("o_custkey").alias("ck"), F.col("p_brand").alias("b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)  # reused: norms + vectors
    )
    n2 = m.groupBy("b").agg(
        F.sum(F.expr("cnt * cnt")).cast("bigint").alias("nrm")
    )
    vec = m.groupBy("ck").agg(
        F.array_sort(F.collect_list(F.struct("b", "cnt"))).alias("vs")
    )
    dots = (
        vec.select(F.explode(F.expr(_VPAIRS)).alias("pr"))
        .groupBy(F.col("pr.b1").alias("b1"), F.col("pr.b2").alias("b2"))
        .agg(F.sum("pr.p").cast("bigint").alias("dot"))
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


_IPAIRS = (
    "flatten(transform(ss, (x, i) ->"
    " transform(slice(ss, i + 2, size(ss)),"
    " y -> struct(x as item_a, y as item_b))))"
)


def q243_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ss"))
        .localCheckpoint(eager=False)  # reused: n, item counts, pairs
    )
    n = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    ic = (
        baskets.select(F.explode("ss").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    )
    pr = (
        baskets.select(F.explode(F.expr(_IPAIRS)).alias("pr"))
        .select("pr.item_a", "pr.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    s = (
        pr.join(
            F.broadcast(
                ic.select(
                    F.col("item").alias("item_a"), F.col("n_item").alias("n_a")
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                ic.select(
                    F.col("item").alias("item_b"), F.col("n_item").alias("n_b")
                )
            ),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        s.select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * 1000000 div n_a").cast("bigint").alias("conf_ab_ppm"),
            F.expr("n_ab * 1000000 div n_b").cast("bigint").alias("conf_ba_ppm"),
            F.expr("n_ab * n_orders * 1000 div (n_a * n_b)")
            .cast("bigint")
            .alias("lift_mils"),
        )
        .orderBy(F.col("lift_mils").desc(), "item_a", "item_b")
        .limit(100)
    )


EXPERIMENTS = {
    "q243_market_basket": q243_basket,
    "q414_item_item_cf": q414_basket,
    "q222_adamic_adar": q222_basket,
    "q467_link_prediction": q467_basket,
    "q466_local_clustering": q466_basket,
    "q314_modularity": q314_basket,
    "q413_pagerank_cosupply": q413_basket,
    "q411_market_basket": q411_basket,
    "q412_butterfly_count": q412_basket,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11", cpus="32")
    todo = names or list(EXPERIMENTS)
    # warm: codegen + python workers + page cache
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
            # alternate arm order between reps to cancel drift
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
