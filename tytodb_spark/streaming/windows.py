"""Structured Streaming surface over the `events` table.

The reference has no streaming at all (SURVEY §2.6) — this is the
BASELINE.json extension surface, built on the standard Spark shapes:
file source → event-time windowed aggregation → sink, with watermarks
for late-data bounds and `applyInPandasWithState`-style sessionization
expressed via the built-in `session_window` (JVM-side, no Python state).

Batch/stream parity: every streaming query here has a batch twin using
the same expressions, so the DuckDB oracle that checks the batch form
checks the streaming output too (complete mode + availableNow trigger
drains the full input deterministically).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tytodb_spark.streaming.state import pinned_state_partitions

DEC = "decimal(18,2)"


def windowed_counts(events: DataFrame) -> DataFrame:
    """The shared (batch == streaming) tumbling-window aggregation."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_window_counts(
    spark: SparkSession,
    events: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Run the windowed aggregation as a real streaming job: stage the
    input as parquet, readStream it back, drain with availableNow into
    a memory sink (complete mode — every window emitted), and return
    the sink table. Deterministic: equals the batch `windowed_counts`.

    ``state_partitions``: see streaming/state.py — default sized for
    bounded test drains; pass None on a real cluster to inherit.
    """
    staging = tempfile.mkdtemp(prefix="tyto_stream_")
    name = f"tyto_stream_{uuid.uuid4().hex[:12]}"
    try:
        # few staged files: each file is micro-batch planning overhead
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        with pinned_state_partitions(spark, state_partitions):
            q = (
                windowed_counts(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", f"{staging}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        # memory-sink rows live on the driver; safe to drop the staging dir
        return spark.table(name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def late_data_window_counts(
    spark: SparkSession,
    events: DataFrame,
    watermark: str = "2 hours",
    state_partitions: int | None = 4,
) -> DataFrame:
    """Append-mode variant with a watermark: only windows the watermark
    has passed are emitted (the late-data-bound shape you would run
    against a live source). The trailing window(s) are withheld by
    design — callers asserting totals must use `stream_window_counts`.
    """
    staging = tempfile.mkdtemp(prefix="tyto_stream_wm_")
    name = f"tyto_wm_{uuid.uuid4().hex[:12]}"
    try:
        # few staged files: each file is micro-batch planning overhead
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        agg = windowed_counts(stream.withWatermark("ts", watermark))
        with pinned_state_partitions(spark, state_partitions):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", f"{staging}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def session_windows(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows: activity separated by ≥`gap` starts a
    new session (built-in session_window — JVM stateful op; the custom
    `applyInPandasWithState` escape hatch is only needed for semantics
    Spark can't express, which this one can). Works batch or streaming."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("session_value"),
        )
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def sliding_window_counts(events: DataFrame) -> DataFrame:
    """The shared (batch == streaming) SLIDING-window aggregation: a
    10-minute window hopping every 5 minutes, so every event lands in
    exactly two windows. Hopping windows are the standard smoothing /
    rate-monitoring shape between tumbling (q34) and session (q35);
    state at stream scale is (windows-per-key x slide-horizon) bounded
    and the watermark expires closed windows."""
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def stream_sliding_window_counts(
    spark: SparkSession,
    events: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Streaming drain of the sliding-window aggregation (availableNow,
    complete mode) — equals the batch `sliding_window_counts`."""
    staging = tempfile.mkdtemp(prefix="tyto_slide_")
    name = f"tyto_slide_{uuid.uuid4().hex[:12]}"
    try:
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        with pinned_state_partitions(spark, state_partitions):
            q = (
                sliding_window_counts(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", f"{staging}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

def stream_session_windows(
    spark: SparkSession,
    events: DataFrame,
    gap: str = "30 minutes",
    state_partitions: int | None = 4,
) -> DataFrame:
    """Run gap-based sessionization as a real streaming job: stage the
    input as parquet (several files → several micro-batches), readStream
    it back, aggregate with the built-in `session_window` stateful
    operator, drain with availableNow into a memory sink, return the
    sink table.

    This is the one windowed shape where cross-batch state is
    NON-TRIVIAL: a session that straddles micro-batches must be merged
    by the state store (open sessions extend as adjacent events arrive),
    unlike tumbling windows where batch rows simply add into fixed
    buckets. Complete output mode emits every merged session at drain
    end, so the result provably equals the batch `session_windows`
    aggregate — which is what the declared oracle asserts.
    """
    staging = tempfile.mkdtemp(prefix="tyto_stream_sess_")
    name = f"tyto_sess_{uuid.uuid4().hex[:12]}"
    try:
        # few staged files: each file is micro-batch planning overhead
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        with pinned_state_partitions(spark, state_partitions):
            q = (
                session_windows(stream, gap=gap)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", f"{staging}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)

def stream_enriched_rollup(
    spark: SparkSession,
    events: DataFrame,
    dim: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Stream-STATIC enrichment join + keyed rollup: the standard
    serving-pipeline shape where a fact stream joins a slowly-changing
    dimension that fits in memory. The dim side is broadcast — each
    micro-batch joins map-side with NO stream-stream state (unlike
    q66/q156), so the only streaming state is the rollup aggregate.

    events are keyed to the dim via user_id % 25 = n_nationkey (the
    fixture's synthetic FK); the rollup counts per (day index, region).
    Complete-mode drain makes the result equal the batch aggregate —
    the declared oracle.
    """
    staging = tempfile.mkdtemp(prefix="tyto_stream_enrich_")
    name = f"tyto_enrich_{uuid.uuid4().hex[:12]}"
    try:
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        enriched = stream.join(
            F.broadcast(dim),
            (F.col("user_id") % 25).cast("int") == F.col("n_nationkey"),
        )
        agg = enriched.groupBy(
            F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
            F.col("n_regionkey").cast("int").alias("region"),
        ).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        with pinned_state_partitions(spark, state_partitions):
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", f"{staging}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        return spark.table(name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
