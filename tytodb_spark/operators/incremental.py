"""Incremental aggregate maintenance — mergeable partial-aggregate
states, the materialized-view pattern that avoids rescanning a 100 TB
base corpus when a delta batch lands.

The algebra: SUM and COUNT are commutative monoids, so a grouped
aggregate can be kept as per-key partial states and REFRESHED by
aggregating only the delta and merging states key-wise (one shuffle of
state-sized rows, never the base fact rows). AVG derives from
(SUM, COUNT) at read time; MIN/MAX merge the same way (append-only
only — deletes need retraction counts, the CDC path in operators/cdc).

Sums are carried as DECIMAL(18,2) so the merge is exact and
order-independent — the merged state is bit-identical to a cold
recompute (asserted by q123's oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def rollup_state(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Collapse fact rows to per-key mergeable state:
    (keys..., sum_<m>... as exact DECIMAL, cnt). Map-side combine makes
    this one narrow shuffle of distinct-key rows."""
    aggs = [
        F.sum(F.col(m).cast(DEC)).cast(DEC).alias(f"sum_{m}") for m in measures
    ] + [F.count(F.lit(1)).cast("bigint").alias("cnt")]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollup(state_a: DataFrame, state_b: DataFrame, keys: list[str]) -> DataFrame:
    """Merge two partial states key-wise. Cost is proportional to the
    number of DISTINCT KEYS, not base-table rows — the whole point:
    the 100 TB base is never rescanned, only its (tiny) state and the
    delta's state shuffle."""
    measures = [c for c in state_a.columns if c.startswith("sum_")]
    aggs = [F.sum(m).cast(DEC).alias(m) for m in measures] + [
        F.sum("cnt").cast("bigint").alias("cnt")
    ]
    return state_a.unionByName(state_b).groupBy(*keys).agg(*aggs)
