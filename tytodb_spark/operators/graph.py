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


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Global triangle count via degree-free compact-forward: orient
    every undirected edge low→high id, build wedges (a<b<c) by joining
    the oriented edge set with itself on the middle vertex, then keep
    wedges whose closing edge (a,c) exists. Two equi-joins, no Python,
    no driver state.

    Scale shape: orientation bounds wedge generation by OUT-degree
    under the total id order (each wedge is generated exactly once, so
    no post-hoc dedup shuffle); the closing-edge join is an equi-join
    the planner can broadcast when the edge list is small or
    shuffle-hash otherwise. Hub vertices are the known hot spot — at
    100 TB-graph scale the standard refinement is ordering by degree
    instead of id, which this operator accepts by passing pre-relabeled
    ids. Output: 1 row (n_edges, n_wedges, n_triangles), all exact.
    """
    lo = F.least(F.col(src), F.col(dst))
    hi = F.greatest(F.col(src), F.col(dst))
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(lo.alias("u"), hi.alias("v"))
        .distinct()
    )
    ab = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    bc = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    wedges = ab.join(bc, "b")
    closing = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    n_edges = e.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    # one pass over wedges for both totals: left-join the closing edge
    # and count matches, instead of evaluating the wedge join twice
    probe = wedges.join(
        closing.withColumn("__hit", F.lit(True)), ["a", "c"], "left"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_wedges"),
        # coalesce: SUM over an empty (wedge-free) graph is NULL, not 0
        F.coalesce(F.sum(F.col("__hit").isNotNull().cast("bigint")), F.lit(0))
        .cast("bigint")
        .alias("n_triangles"),
    )
    return n_edges.crossJoin(probe)


def kcore(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 32,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop every
    node whose degree among SURVIVORS is < k until a fixpoint — the
    density filter that separates structurally-dense duplicate families
    from incidental chains (a chain of pairwise near-dups peels away;
    a clique of mutual near-dups survives).

    Plan per round: one degree aggregate over surviving edges + two
    semi-joins filtering the edge list — all hash-keyed, no window, no
    collect of node sets (the survivor frame stays distributed; only
    the convergence COUNT reaches the driver). The edge frame
    localCheckpoints per round so lineage stays flat across the loop
    (same discipline as connected-components / pagerank). Round count
    is bounded by the longest peel cascade, which is a property of
    graph STRUCTURE, not data volume — the fixture's block design
    keeps it constant across SFs.

    Output: (node, deg) for the surviving k-core, deg = within-core
    degree."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # both orientations: degree = undirected neighbor count
    e = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    e = e.localCheckpoint(eager=True)
    # convergence on EDGE count (no distinct shuffle): removing any
    # node removes its edges, so edge-count fixpoint == node fixpoint
    prev = e.count()
    for _ in range(max_iter):
        deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select("u")
        e2 = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
        cur = e2.count()
        e = e2
        if cur == prev:
            break
        prev = cur
    return (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .filter(F.col("deg") >= k)
        .select(F.col("u").alias("node"), "deg")
    )
