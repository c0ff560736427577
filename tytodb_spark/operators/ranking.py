"""Distributed total-order ranking — the building block Spark's window
functions DON'T give you at scale: `row_number() OVER (ORDER BY ...)`
with no partition key collapses the whole table into ONE task. The
two-phase construction here keeps ranking distributed:

1. range-repartition on the order key (range partitions are ordered by
   partition id), rank locally within each partition;
2. one tiny aggregate of per-partition row counts -> cumulative offsets
   (|partitions| rows — metadata-sized) broadcast back; global rank =
   offset + local rank.

The assigned ranks are partitioning-INDEPENDENT as long as the order
key is a total order (ties broken by a unique column): any range split
yields the same final ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def global_rank(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Append ``rank`` (1-based, dense total order over ``order_cols``,
    which must include a tie-breaking unique key). Two-phase: local
    row_number per range partition + broadcast offset join. No
    single-partition stage anywhere."""
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    d = df.repartitionByRange(n_parts, *cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    local = d.withColumn(
        "__lr", F.row_number().over(W.partitionBy("__pid").orderBy(*cols))
    )
    # per-partition counts -> cumulative offsets; |partitions| rows, so
    # the single-partition running sum here is metadata-sized by design
    offsets = (
        local.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__pid", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn("rank", (F.col("__off") + F.col("__lr")).cast("bigint"))
        .drop("__pid", "__lr", "__off")
    )


def equi_depth_histogram(
    df: DataFrame, value_col: str, tie_col: str, bins: int = 8
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram: rank every row in the
    (value, tie) total order and cut the rank space into ``bins``
    equal slices — per-bin counts differ by at most 1 and the bin
    edges are ACTUAL data values (min/max per bin), bit-identical
    across engines with no interpolation. The exact-rank audit path;
    at 100 TB swap the ranking for approx_percentile boundaries (same
    output shape, sketch-bounded error).

    Output: (bin, cnt, lo, hi).
    """
    ranked = global_rank(df.select(value_col, tie_col), [value_col, tie_col])
    n = ranked.agg(F.count(F.lit(1)).alias("__total"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .withColumn(
            "bin",
            F.floor((F.col("rank") - 1) * bins / F.col("__total")).cast("int"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.min(value_col).alias("lo"),
            F.max(value_col).alias("hi"),
        )
    )


def skyline2(
    df: DataFrame, id_col: str, max_col: str, min_col: str
) -> DataFrame:
    """Two-dimensional SKYLINE (Pareto frontier): rows not dominated by
    any other row, where A dominates B iff A.max_col >= B.max_col AND
    A.min_col <= B.min_col with at least one strict — the
    multi-objective selection a curation pass runs when no single score
    exists ("highest quality at every length budget"). Ties on BOTH
    coordinates dominate neither way, so duplicates of a frontier point
    all survive (deterministic at any partitioning).

    Distributed shape: the exact local skyline runs per partition
    (dominance is transitive, so pruning locally-dominated rows can
    never remove a global frontier point), then the global skyline runs
    once over the union of local survivors — frontier sizes are
    O(log n) expected for independent dims, so phase 2 is
    metadata-sized. The phase boundary is ``repartition(1)`` — a real
    shuffle Exchange — NOT ``coalesce(1)``: coalesce propagates the
    single-partition constraint BELOW the first mapInPandas and
    collapses both phases into one task (r03's committed plan did
    exactly that; the "per-partition" phase never ran in parallel).
    Both phases share one vectorized pandas kernel (sort by max desc /
    min asc, numpy cumulative-min prefix scan — no per-row Python).

    Output: (id_col, max_col, min_col) — the frontier rows.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    cols = [id_col, max_col, min_col]
    schema = ", ".join(f"{c} {t}" for c, t in
                       [(f.name, f.dataType.simpleString())
                        for f in df.select(*cols).schema.fields])

    def sky(batches):
        parts = [p for p in batches if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        s = pdf.sort_values(
            [max_col, min_col], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        q = s[max_col].to_numpy()
        t = s[min_col].to_numpy()
        n = len(s)
        if n == 0:  # defensive: the parts filter above makes this
            return  # unreachable, but the kernel must not index [0]
        # rows sort (q desc, t asc); group = run of equal q. A row
        # survives iff t == its group's min t (the group's first row,
        # since t ascends within the group) AND t < min t over all
        # STRICTLY higher q (= cumulative min of t over prior groups).
        is_start = np.empty(n, dtype=bool)
        is_start[0] = True
        is_start[1:] = q[1:] != q[:-1]
        start_idx = np.maximum.accumulate(
            np.where(is_start, np.arange(n), 0)
        )
        group_min_t = t[start_idx]
        prefix_min_t = np.minimum.accumulate(t)
        best_higher = np.where(
            start_idx > 0, prefix_min_t[np.maximum(start_idx - 1, 0)], np.inf
        )
        keep = (t < best_higher) & (t == group_min_t)
        yield s.loc[keep, cols]

    local = df.select(*cols).mapInPandas(sky, schema)
    return local.repartition(1).mapInPandas(sky, schema)
