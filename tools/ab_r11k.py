"""Round-11 optimization A/B harness, part 11: shuffled-hash hints on
the remaining SortMergeJoin towers — q248's HITS half-steps (40 SMJs in
the final frame) and the per-round CC joins behind q112/q171.

Every candidate join has the q413 shape: an edge-sized probe side
joined to a node-sized, unique-keyed build side (degree/score/label
tables), both defaulting to SortMergeJoin because checkpointed scans
have unknown stats. The earlier q248 candidate (broadcast half-steps)
lost to sequential broadcast-build jobs; a shuffled hash build has no
driver round-trip.

The CC variants run through MONKEYPATCHED clones of
connected_components / connected_components_star so the A/B exercises
the registry query bodies unchanged.

Usage: python tools/ab_r11k.py [exp ...]
Env: AB_SF_DIR (default /root/testdata/sf0.1), AB_REPS (default 3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

from tytodb_spark import queries as Q
from tytodb_spark.operators import dedup as D
from tytodb_spark.queries import _t
from tytodb_spark.session import checkpoint_scope, get_spark

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))


# ---------------------------------------------------------------------------
# q248: shuffle_hash hints on the three half-step e-joins
# ---------------------------------------------------------------------------


def q248_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        e.join(h1.hint("shuffle_hash"), "c")
        .groupBy("s")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    a1q = _qnorm(a1, "s", "a", "aq")
    h2 = (
        e.join(a1q.hint("shuffle_hash"), "s")
        .groupBy("c")
        .agg(F.sum("aq").cast("bigint").alias("h"))
    )
    h2q = _qnorm(h2, "c", "h", "hq")
    a2 = (
        e.join(h2q.hint("shuffle_hash"), "c")
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
# CC clones with shuffle_hash hints on the node-sized build sides
# ---------------------------------------------------------------------------


def connected_components_shj(
    pairs_df: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 20,
) -> DataFrame:
    edges = (
        pairs_df.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(
            pairs_df.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex"))
    )
    for i in range(max_iters):
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.vertex)
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(
            neighbor_min.hint("shuffle_hash"), "vertex", "left"
        ).select(
            "vertex",
            F.col("component").alias("__prev"),
            F.least(
                F.col("component"),
                F.coalesce(F.col("nbr_component"), F.col("component")),
            ).alias("component"),
        )
        if i >= 2:
            root = labels.select(
                F.col("vertex").alias("__rv"),
                F.col("component").alias("__rc"),
            )
            stepped = stepped.join(
                root.hint("shuffle_hash"), stepped.component == root.__rv, "left"
            ).select(
                "vertex",
                "__prev",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("__rc"), F.col("component")),
                ).alias("component"),
            )
        stepped = stepped.localCheckpoint(eager=True)
        changed = (
            stepped.filter(F.col("component") != F.col("__prev")).limit(1).count()
        )
        labels = stepped.drop("__prev")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge within "
            f"max_iters={max_iters} (graph diameter exceeds the round "
            f"budget); raise max_iters or use connected_components_star"
        )
    return labels


def connected_components_star_shj(
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
            und.join(lm.hint("shuffle_hash"), "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        oriented = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        sm = neighborhood_min(oriented)
        small = (
            oriented.join(sm.hint("shuffle_hash"), "u")
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
        raise RuntimeError(
            f"connected_components_star: edge set did not reach a fixed "
            f"point within max_iters={max_iters}; labels would be "
            f"unreliable (raise max_iters or use cc='label')"
        )
    stars = und.filter(F.col("u") > F.col("v"))
    members = stars.select(F.col("u").alias("vertex"), F.col("v").alias("component"))
    roots = stars.select(F.col("v").alias("vertex")).distinct().withColumn(
        "component", F.col("vertex")
    )
    return members.groupBy("vertex").agg(F.min("component").alias("component")).union(
        roots
    ).groupBy("vertex").agg(F.min("component").alias("component"))


class _patched_cc:
    """Swap the CC implementations for their hinted clones for the
    duration of one variant run."""

    def __enter__(self):
        self._star = D.connected_components_star
        self._label = D.connected_components
        D.connected_components_star = connected_components_star_shj
        D.connected_components = connected_components_shj
        return self

    def __exit__(self, *exc):
        D.connected_components_star = self._star
        D.connected_components = self._label
        return False


def q112_cc_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _patched_cc():
        return Q.REGISTRY["q112_star_clusters"].fn(spark, sf_dir)


def q171_cc_shj(spark: SparkSession, sf_dir: str) -> DataFrame:
    with _patched_cc():
        return Q.REGISTRY["q171_incremental_cc"].fn(spark, sf_dir)


EXPERIMENTS = {
    "q248_hits_scores": q248_shj,
    "q112_star_clusters": q112_cc_shj,
    "q171_incremental_cc": q171_cc_shj,
}


def _time(spark, fn) -> float:
    with checkpoint_scope(spark):
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        return time.perf_counter() - t0


def main(names: list[str]) -> None:
    spark = get_spark("ab_r11k", cpus="32")
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
