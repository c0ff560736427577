"""Round-11 optimization A/B harness, part 4: q466 hub-panel broadcast
+ barrier eagerness, half-pair dot mirroring for the brand-CF family
(q437/q468), q353 candidate-barrier eagerness.

Usage: python tools/ab_r11d.py [exp ...]
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W

from tytodb_spark import queries as Q
from tytodb_spark.queries import _t, _SUPP_PAIRS
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


# ---------------------------------------------------------------------------
# q466: (a) eager barriers — edges feeds two broadcast(nbr) stages and
# the tri probe (the q437-lesson race); (b) F.broadcast(top) into the
# nbr joins and broadcast(tri) into the final join: checkpointed
# frames scan as ExistingRDD with UNKNOWN stats, so the planner ran a
# 20-row hub panel through SortMergeJoins with full exchanges of the
# edge set (visible in the committed after-plan: SMJ LeftOuter over
# Exchange(2)/(16)).
# ---------------------------------------------------------------------------


def q466_bcast_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    baskets = (
        li.groupBy(F.col("l_partkey").alias("part"))
        .agg(F.array_sort(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss").between(2, 32))
    )
    edges = (
        baskets.select(F.explode(F.expr(_SUPP_PAIRS)).alias("pr"))
        .select(F.col("pr.s1").alias("u"), F.col("pr.s2").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
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
        .localCheckpoint(eager=True)
    )
    nbr = (
        F.broadcast(top).join(edges, top.n == edges.u)
        .select(F.col("n").alias("hub"), F.col("v").alias("nb"))
        .unionAll(
            F.broadcast(top).join(edges, top.n == edges.v).select(
                F.col("n").alias("hub"), F.col("u").alias("nb")
            )
        )
        .localCheckpoint(eager=True)
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
        top.join(F.broadcast(tri), top.n == tri.hub, "left")
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


# ---------------------------------------------------------------------------
# q468 / q437: the brand-CF dots self-join currently emits BOTH
# orientations per customer pair (a.b != c.b). The dot is symmetric,
# so join on a.b < c.b (half the join output feeding the partial
# aggregate) and mirror the 600-row aggregate afterwards — guide §2.3
# "shuffle fewer bytes" applied to the pre-aggregate row volume.
# ---------------------------------------------------------------------------


def _half_dots(m: DataFrame) -> DataFrame:
    half = (
        m.alias("a")
        .join(m.alias("c"), F.col("a.ck") == F.col("c.ck"))
        .filter(F.col("a.b") < F.col("c.b"))
        .groupBy(F.col("a.b").alias("b1"), F.col("c.b").alias("b2"))
        .agg(F.sum(F.col("a.cnt") * F.col("c.cnt")).cast("bigint").alias("dot"))
    )
    return half.unionAll(
        half.select(
            F.col("b2").alias("b1"), F.col("b1").alias("b2"), "dot"
        )
    )


def q468_half_dots(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("nrm")
    )
    dots = _half_dots(m)
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


def q437_half_dots(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    half = (
        train.alias("a")
        .join(
            train.select(
                F.col("ck").alias("ck2"), F.col("b").alias("b2"),
                F.col("cnt").alias("c2"),
            ),
            (F.col("ck") == F.col("ck2")) & (F.col("b") < F.col("b2")),
        )
        .groupBy(F.col("b").alias("b1"), "b2")
        .agg(F.sum(F.expr("cnt * c2")).cast("bigint").alias("dot"))
    )
    dots = half.unionAll(
        half.select(F.col("b2").alias("b1"), F.col("b1").alias("b2"), "dot")
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
# q353: eager candidate barrier — c feeds the broadcast(cand) subtree
# AND the crossJoin probe (the race); sims stays lazy (its first
# consumer is the sequential round-1 argmax collect).
# ---------------------------------------------------------------------------


def q353_eager(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(slice(embedding, 1, 64), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint))"
            ).alias("ea"),
        ),
        "vec_id",
    ).localCheckpoint(eager=True)
    cand = (
        c.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), F.col("ea").alias("cea"))
    )
    dot = " + ".join(
        f"element_at(ea, {i}) * element_at(cea, {i})" for i in range(1, 65)
    )
    sims = (
        c.crossJoin(F.broadcast(cand))
        .select(
            F.col("vec_id").alias("i"),
            "cid",
            F.expr(
                f"greatest(cast({dot} as bigint), cast(0 as bigint))"
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    g = sims.groupBy("cid").agg(F.sum("s").cast("bigint").alias("gain"))
    top = g.orderBy(F.col("gain").desc(), "cid").limit(1).collect()[0]
    picked = [(1, int(top["cid"]), int(top["gain"]))]
    b = sims.filter(F.col("cid") == top["cid"]).select(
        "i", F.col("s").alias("b")
    )
    for t in range(2, 5):
        chosen = [p[1] for p in picked]
        g = (
            sims.filter(~F.col("cid").isin(chosen))
            .join(b, "i")
            .groupBy("cid")
            .agg(
                F.sum(F.expr("greatest(s - b, 0)"))
                .cast("bigint")
                .alias("gain")
            )
        )
        top = g.orderBy(F.col("gain").desc(), "cid").limit(1).collect()[0]
        picked.append((t, int(top["cid"]), int(top["gain"])))
        nb = sims.filter(F.col("cid") == top["cid"]).select(
            "i", F.col("s").alias("ns")
        )
        b = (
            b.join(nb, "i")
            .select("i", F.expr("greatest(b, ns)").alias("b"))
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(picked, "step int, cid long, gain long")


EXPERIMENTS = {
    "q466_local_clustering": q466_bcast_eager,
    "q468_rec_coverage": q468_half_dots,
    "q437_cf_holdout_eval": q437_half_dots,
    "q353_facility_location": q353_eager,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11d", cpus="32")
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
