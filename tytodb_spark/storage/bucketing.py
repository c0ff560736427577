"""Bucketed table layout — co-located joins with no exchange.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides
on the join key. Hive-style bucketing pays that shuffle ONCE at write
time: each side is hash-partitioned into N buckets on the key and saved
with the layout recorded in the catalog, so every later join/aggregate
on that key satisfies the required distribution for free — Catalyst
plans a sort-merge join with ZERO Exchange operators (asserted in
tests/test_bucketing.py via plans.inspect.num_shuffles).

Scale notes:
- Pick N so a bucket's share of the big table fits an executor's
  memory (e.g. 100 TB / 8192 buckets ≈ 12 GB per bucket side-pair).
- `sortBy` the key inside buckets: the merge phase then needs no sort
  either (the read path still re-sorts unless sources report ordering;
  the win at write amortizes over every downstream join).
- Both sides must use the same bucket count (Spark joins equal counts;
  mismatches fall back to a shuffle on one side).

Reference counterpart: none — the closest notion is the reference's
first-column chunked index (src/indexing.rs:33-40), which accelerates
point/range lookups on one table but has no join story at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
) -> None:
    """Save `df` as a catalog table bucketed (and optionally sorted)
    on `bucket_col`. Overwrites an existing table of the same name."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.mode("overwrite").format("parquet").bucketBy(num_buckets, bucket_col)
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two bucketed catalog tables. When both are bucketed on their
    join keys with equal bucket counts, the physical plan contains no
    Exchange — verify with plans.inspect.num_shuffles(df) == 0."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
