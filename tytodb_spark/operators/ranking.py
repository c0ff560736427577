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
    metadata-sized. Both phases share one vectorized pandas kernel
    (sort by max desc / min asc, prefix-min scan).

    Output: (id_col, max_col, min_col) — the frontier rows.
    """
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
        keep = []
        best_higher = None  # min t among STRICTLY higher q
        group_q = None
        group_min_t = None
        for i in range(len(s)):
            if group_q is None or q[i] != group_q:
                # entering a new (lower) q group: previous group joins
                # the strictly-higher prefix
                if group_min_t is not None:
                    best_higher = (
                        group_min_t
                        if best_higher is None
                        else min(best_higher, group_min_t)
                    )
                group_q, group_min_t = q[i], t[i]
            survives = (best_higher is None or t[i] < best_higher) and (
                t[i] == group_min_t
            )
            keep.append(survives)
        yield s[pd.Series(keep, index=s.index)][cols]

    local = df.select(*cols).mapInPandas(sky, schema)
    return local.coalesce(1).mapInPandas(sky, schema)
