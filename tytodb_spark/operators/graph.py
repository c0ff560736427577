"""Graph operators over edge DataFrames — centrality signals for
corpus curation (web-graph PageRank is a classic pretraining quality
prior) plus whatever the near-dup pair graph needs beyond connected
components (operators/dedup.py).

Determinism policy: PageRank is computed in exact INTEGER micro-units
(1e-12 of total mass) — every per-iteration quantity is a bigint and
every reduction is a bigint sum, so the result is bit-identical at any
partitioning and reproducible in any engine (the float formulation
diverges across engines in summation order and rounding mode; the q81
lesson applied to iteration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ONE = 1_000_000_000_000  # 1e12 integer mass units


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 5,
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Fixed-iteration PageRank with damping ``num/den`` (default
    17/20 = 0.85) in exact integer arithmetic:

        pr[v] <- teleport + num * (sum of pr[u] div deg[u]) div den

    where ``teleport = (den-num)*ONE div (den*N)`` and every division
    is integer `div` — all quantities are bigints, all sums exact, so
    the fixpoint trajectory is identical at any parallelism.

    Plan per iteration: one shuffle joining pr onto edges by ``src``
    (broadcast while pr fits — AQE decides), one aggregate shuffle on
    ``dst``. The node set is nodes-with-outgoing-edges (an undirected
    pair graph loaded in both orientations has no dangling nodes).
    ``pr`` is cached per iteration so lineage stays flat; at hundreds
    of iterations add a localCheckpoint every ~10.

    Output: (node, pr) with pr in 1e-12 mass units (bigint).
    """
    # cache the edge list: every iteration joins it, and without the
    # cache each iteration re-runs the (possibly expensive) upstream
    # edge-producing pipeline — e.g. the full LSH pair detection
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).cache()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    nodes = deg.select(F.col("src").alias("node"), "deg").cache()
    n = nodes.count()  # driver-side scalar: node count only
    teleport = ((damping_den - damping_num) * ONE) // (damping_den * n)
    pr = nodes.select("node", F.lit(ONE // n).cast("bigint").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(
                pr.join(nodes, "node").select(
                    F.col("node").alias("src"),
                    F.expr("pr div deg").alias("c"),
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        # pr is deliberately NOT cached: each iteration's output feeds
        # exactly one consumer (the next iteration), so the whole chain
        # evaluates as one job with shuffle boundaries as natural
        # stage breaks — caching it only adds memory-store overhead.
        # e/nodes (consumed every iteration) ARE cached above; at
        # hundreds of iterations add a localCheckpoint every ~10 to cap
        # lineage depth.
        pr = (
            nodes.select("node")
            .join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .select(
                "node",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_num} * coalesce(s, 0)) div {damping_den}")
                ).cast("bigint").alias("pr"),
            )
        )
    return pr
