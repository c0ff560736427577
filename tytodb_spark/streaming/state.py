"""Streaming state-partition sizing.

The number of state partitions of a Structured Streaming query is taken
from ``spark.sql.shuffle.partitions`` when the query FIRST starts and is
then locked into the checkpoint for the query's lifetime. Each state
partition is both a unit of parallelism and a unit of state-store I/O:
every stateful operator writes one delta file per state partition per
micro-batch. For the bounded availableNow drains in this package (state
of a few thousand keys), 32 partitions means the checkpoint writes
dominate wall time — pinning a handful of partitions is a 3-4× win at
test scale with zero effect on results.

On a real cluster, size state partitions to total executor cores (pass
``None`` to inherit the session's ``spark.sql.shuffle.partitions``) —
the state itself shards accordingly, and a too-small count would
serialize both the aggregation and the checkpoint writes.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_CONF = "spark.sql.shuffle.partitions"


@contextmanager
def pinned_state_partitions(spark: SparkSession, n: int | None) -> Iterator[None]:
    """Pin the state-partition count for a streaming query started inside
    the block; restores the session conf on exit. ``None`` = inherit the
    session setting (no-op). Safe for the bounded drains here because the
    query runs to completion (awaitTermination) inside the block."""
    if n is None:
        yield
        return
    old = spark.conf.get(_CONF)
    spark.conf.set(_CONF, str(n))
    try:
        yield
    finally:
        spark.conf.set(_CONF, old)
