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
