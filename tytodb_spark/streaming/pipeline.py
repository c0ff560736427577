"""Streaming pipeline shapes beyond windowed aggregation: stream-stream
joins, streaming deduplication, and a foreachBatch sink into the
snapshot warehouse.

The reference has no streaming (SURVEY §2.6); these are the
BASELINE.json extension surface in the standard Structured Streaming
idiom. Every function drains a bounded input with availableNow so the
result is deterministic and the batch twin / DuckDB oracle can check it.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tytodb_spark.storage.warehouse import Warehouse
from tytodb_spark.streaming.state import pinned_state_partitions

# Hard ceiling for driver-side state pins. The two pins below hold
# frames that are KEY-BOUNDED by construction (a per-key view state, an
# m-bounded Misra-Gries candidate set) — but "bounded by construction"
# is an invariant in a comment until it is enforced. 1M rows of skinny
# state is a few tens of MB on the driver; anything past it means the
# helper was reused on an unbounded key and must fail loudly, not OOM.
DRIVER_PIN_LIMIT = 1_000_000


def _pin_to_driver(df: DataFrame, what: str, limit: int = DRIVER_PIN_LIMIT):
    """Materialize a key-bounded frame on the driver. Counts FIRST
    (distributed, cheap) so a violated bound raises before the collect
    can OOM the driver."""
    n = df.count()
    if n > limit:
        raise ValueError(
            f"driver pin refused: {what} has {n} rows (> {limit}); "
            "this helper is only safe for key-bounded state"
        )
    return df.collect()


def _drain(
    stream_df: DataFrame,
    staging: str,
    mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """availableNow → memory sink; returns the sink table (driver-backed,
    safe to use after the staging dir is deleted)."""
    name = f"tyto_pipe_{uuid.uuid4().hex[:12]}"
    with pinned_state_partitions(stream_df.sparkSession, state_partitions):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", os.path.join(staging, f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return stream_df.sparkSession.table(name)


def signup_error_pairs(signups: DataFrame, errors: DataFrame) -> DataFrame:
    """The shared (batch == streaming) join expression: every error a
    user hits within one hour of a signup event. Event-time range
    constraint on both sides — in streaming this bounds join state; in
    batch Catalyst runs it as an equi-join on user with a range residual.
    """
    return signups.join(
        errors,
        F.expr(
            """
            s_user = e_user AND
            error_ts >= signup_ts AND
            error_ts <= signup_ts + interval 1 hour
            """
        ),
    ).select(
        F.col("s_user").alias("user_id"),
        F.unix_micros("signup_ts").alias("signup_us"),
        F.unix_micros("error_ts").alias("error_us"),
    )


def stream_stream_join(
    spark: SparkSession,
    events: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Stream-stream inner join with watermarks on both sides: signups ⋈
    errors within 1 hour, per user. The event-time range condition plus
    the two watermarks let Spark expire join state (without them,
    stream-stream state grows forever — the 100 TB failure mode).
    Bounded drain makes the output equal the batch twin.

    ``state_partitions``: stream-stream join keeps FOUR state stores per
    partition (left/right × keyed/key-to-value), so per-partition
    checkpoint overhead is the worst of any operator here — see
    streaming/state.py; default sized for bounded test drains, pass
    None on a real cluster to inherit session parallelism."""
    staging = tempfile.mkdtemp(prefix="tyto_ssj_")
    try:
        # stage only the join-relevant rows and columns (the filter +
        # projection belong below the stream source, same as predicate
        # pushdown in batch), in a handful of files — each staged file
        # is a unit of micro-batch planning overhead
        relevant = (
            events.filter(F.col("event_type").isin("signup", "error"))
            .select("user_id", "event_type", "ts")
            .repartition(4)
        )
        relevant.write.mode("overwrite").parquet(f"{staging}/in")
        staged_schema = relevant.schema

        def side(event_type: str, user: str, ts: str) -> DataFrame:
            return (
                spark.readStream.schema(staged_schema)
                .parquet(f"{staging}/in")
                .filter(F.col("event_type") == event_type)
                .select(
                    F.col("user_id").alias(user), F.col("ts").alias(ts)
                )
                .withWatermark(ts, "24 hours")
            )

        joined = signup_error_pairs(
            side("signup", "s_user", "signup_ts"),
            side("error", "e_user", "error_ts"),
        )
        return _drain(joined, staging, "append", state_partitions)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stream_dedup_keys(
    spark: SparkSession,
    events: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Streaming deduplication: first occurrence per (user_id,
    event_type) via dropDuplicatesWithinWatermark — the streaming form
    of exact dedup (state = one key per group, expired by watermark;
    unbounded-safe). Emitting only the KEY columns makes the drained
    output deterministic (which physical row survives is arrival-order
    dependent; the key set is not)."""
    staging = tempfile.mkdtemp(prefix="tyto_sdedup_")
    try:
        events.write.mode("overwrite").parquet(f"{staging}/in")
        stream = (
            spark.readStream.schema(events.schema)
            .parquet(f"{staging}/in")
            .withWatermark("ts", "24 hours")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
        )
        return _drain(stream, staging, "append", state_partitions)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stream_append_to_warehouse(
    spark: SparkSession,
    wh: Warehouse,
    table: str,
    source_dir: str,
    schema,
    select_exprs: list[str],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> int:
    """foreachBatch sink into a snapshot-warehouse table with
    exactly-once batch idempotence: the last committed batchId is
    persisted next to the table; a replayed micro-batch (foreachBatch is
    at-least-once on restart) is skipped instead of double-appended.
    Returns the number of batches committed this run."""
    marker = os.path.join(wh.root, table, "_stream_batch.json")

    def last_done() -> int:
        try:
            with open(marker) as f:
                return json.load(f)["batch_id"]
        except (OSError, ValueError, KeyError):
            return -1

    committed = 0

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal committed
        if batch_id <= last_done():
            return  # replay of an already-committed batch
        wh.append_df(table, batch_df.selectExpr(*select_exprs))
        tmp = marker + f".tmp_{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id}, f)
        os.rename(tmp, marker)
        committed += 1

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return committed


def segment_enrichment(events: DataFrame, customer: DataFrame) -> DataFrame:
    """The shared (batch == streaming) stream-static enrichment: events
    join the customer dimension and aggregate per market segment."""
    joined = events.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )


def stream_static_enrich(
    spark: SparkSession,
    events: DataFrame,
    customer: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Stream-static join — the standard streaming ENRICHMENT shape
    (the third join pattern next to q66's stream-stream and the batch
    joins): a fact stream joins a slowly-changing dimension TABLE.

    The static side needs no watermark and holds no join state — Spark
    re-plans the batch side each micro-batch (picking up dimension
    updates between batches) and the broadcast hash join runs map-side
    within every micro-batch, exactly like its batch twin. State exists
    only for the downstream aggregation.

    Deterministic bounded drain (availableNow, complete mode) equals
    the batch `segment_enrichment`, which is what the oracle checks.
    """
    staging = tempfile.mkdtemp(prefix="tyto_enrich_")
    try:
        events.repartition(4).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(events.schema).parquet(f"{staging}/in")
        return _drain(
            segment_enrichment(stream, customer),
            staging,
            "complete",
            state_partitions,
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stream_incremental_rollup(
    spark: SparkSession,
    source: DataFrame,
    keys: list[str],
    measures: list[str],
    n_files: int = 8,
) -> DataFrame:
    """Streaming materialized-view maintenance: each micro-batch is
    collapsed to its mergeable (SUM, COUNT) partial state
    (operators/incremental.rollup_state) and merged key-wise into the
    persisted view (merge_rollup) — per batch the work is
    batch-scan + state-sized merge, never a rescan of history. This is
    q123's incremental-refresh algebra driven by Structured Streaming:
    the snapshot-swap write keeps the view atomic between batches
    (crash mid-merge leaves the previous snapshot intact).

    The bounded availableNow drain (maxFilesPerTrigger=1 over an
    n_files staging copy) makes the run deterministic: the final state
    equals the cold single-pass aggregate — exactly what the oracle
    asserts. Output: the final view state (keys..., sum_<m>..., cnt);
    DECIMAL partials keep every merge exact, so the equality is
    bit-level, not approximate.
    """
    from tytodb_spark.operators.incremental import merge_rollup, rollup_state

    staging = tempfile.mkdtemp(prefix="tyto_incr_rollup_")
    try:
        src_dir = os.path.join(staging, "src")
        source.repartition(n_files).write.parquet(src_dir)
        state_dir = os.path.join(staging, "state")

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            batch_state = rollup_state(batch_df, keys, measures)
            if os.path.exists(state_dir):
                prev = spark.read.parquet(state_dir)
                new_state = merge_rollup(prev, batch_state, keys)
            else:
                new_state = batch_state
            tmp = os.path.join(staging, f"state_tmp_{batch_id}")
            # state is |groups| rows — one file per snapshot, not 32
            # near-empty shuffle-partition files (file-open cost
            # dominates metadata-sized state reads)
            new_state.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = os.path.join(staging, f"state_old_{batch_id}")
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(tmp, state_dir)  # snapshot swap: atomic dir rename
            if os.path.exists(old):
                shutil.rmtree(old)

        stream = (
            spark.readStream.schema(source.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(staging, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # the view state is key-bounded — pin it to the driver (guarded:
        # fails loudly past DRIVER_PIN_LIMIT) so staging can be reclaimed
        final = spark.read.parquet(state_dir)
        return spark.createDataFrame(
            _pin_to_driver(final, "materialized view state"), final.schema
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stream_stream_left_join(
    spark: SparkSession,
    events: DataFrame,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Stream-stream LEFT OUTER join with watermark state eviction:
    every signup, matched with its errors within 1 hour — or emitted
    with a NULL error once the watermark proves no match can still
    arrive. That deferred null-side emission is the point of the
    operator: outer-join state stays bounded on an unbounded stream
    because a left row is held only until the global watermark passes
    its last possible match time (signup_ts + 1 h), then emitted and
    dropped.

    With a 0-second delay the final watermark of a bounded drain is
    min(max signup ts, max error ts); Spark's no-data final micro-batch
    flushes every evictable row. Determinization for the check: rows
    whose eviction boundary EQUALS the final watermark are
    boundary-ambiguous across engine versions, so the drained output
    keeps null rows strictly below it (the oracle applies the same
    strict rule). The 1-row watermark lookup is driver-side check
    metadata, not operator cost.
    """
    staging = tempfile.mkdtemp(prefix="tyto_sslj_")
    try:
        relevant = (
            events.filter(F.col("event_type").isin("signup", "error"))
            .select("user_id", "event_type", "ts")
            .repartition(4)
        )
        relevant.write.mode("overwrite").parquet(f"{staging}/in")
        staged = spark.read.parquet(f"{staging}/in")
        wm_us = (
            staged.groupBy("event_type")
            .agg(F.max(F.unix_micros("ts")).alias("__m"))
            .agg(F.min("__m").alias("__wm"))
            .collect()[0]["__wm"]
        )

        def side(event_type: str, user: str, ts: str) -> DataFrame:
            return (
                spark.readStream.schema(staged.schema)
                .parquet(f"{staging}/in")
                .filter(F.col("event_type") == event_type)
                .select(F.col("user_id").alias(user), F.col("ts").alias(ts))
                .withWatermark(ts, "0 seconds")
            )

        joined = (
            side("signup", "s_user", "signup_ts")
            .join(
                side("error", "e_user", "error_ts"),
                F.expr(
                    """
                    s_user = e_user AND
                    error_ts >= signup_ts AND
                    error_ts <= signup_ts + interval 1 hour
                    """
                ),
                "leftOuter",
            )
            .select(
                F.col("s_user").alias("user_id"),
                F.unix_micros("signup_ts").alias("signup_us"),
                F.unix_micros("error_ts").alias("error_us"),
            )
        )
        out = _drain(joined, staging, "append", state_partitions)
        return out.filter(
            F.col("error_us").isNotNull()
            | (F.col("signup_us") + F.lit(3_600_000_000) < F.lit(wm_us))
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def stream_exact_dedup(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str,
    key_expr,
    n_files: int = 6,
    state_files: int | None = 4,
) -> DataFrame:
    """Streaming EXACT-DEDUP maintenance: the survivor table
    (content_key → keep_id, n_copies) kept fresh as document batches
    arrive — q40's batch answer as persistent stream state, the
    third snapshot-swap state machine next to the rollup (q136) and
    heavy-hitter (q172) ones.

    Per micro-batch: the batch collapses to its (key, min id, count)
    partial — the SAME mergeable shape as the state, so the merge is
    min/sum per key and per-batch work is batch-scan + state-sized
    merge, never a rescan of history. Because (min, sum) is a
    commutative-idempotent-free merge over associative partials, the
    FINAL state is independent of how rows landed in batches — it
    equals the cold one-pass aggregate, which is what the oracle
    asserts (the q136 determinism contract).

    Output: (content_key, keep_id, n_copies) — the full survivor map.
    """
    staging = tempfile.mkdtemp(prefix="tyto_sdedup_")
    try:
        src = docs.select(
            F.col(id_col).alias("__id"), key_expr.alias("content_key")
        )
        src_dir = os.path.join(staging, "src")
        src.repartition(n_files).write.parquet(src_dir)
        state_dir = os.path.join(staging, "state")

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            batch_state = batch_df.groupBy("content_key").agg(
                F.min("__id").alias("keep_id"),
                F.count(F.lit(1)).cast("bigint").alias("n_copies"),
            )
            if os.path.exists(state_dir):
                prev = spark.read.parquet(state_dir)
                merged = (
                    prev.unionByName(batch_state)
                    .groupBy("content_key")
                    .agg(
                        F.min("keep_id").alias("keep_id"),
                        F.sum("n_copies").cast("bigint").alias("n_copies"),
                    )
                )
            else:
                merged = batch_state
            tmp = os.path.join(staging, f"state_tmp_{batch_id}")
            # survivor map is corpus-keyed: bound the snapshot file
            # count at test scale (32 near-empty files/batch otherwise);
            # a warehouse-scale run passes state_files=None to keep the
            # key partitioning (the state dir IS the output table there)
            out_state = (
                merged if state_files is None else merged.coalesce(state_files)
            )
            out_state.write.mode("overwrite").parquet(tmp)
            old = os.path.join(staging, f"state_old_{batch_id}")
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(tmp, state_dir)  # snapshot swap: atomic dir rename
            if os.path.exists(old):
                shutil.rmtree(old)

        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(staging, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # materialize executor-side (localCheckpoint, NOT a driver
        # collect — the survivor map is corpus-keyed) so staging can be
        # reclaimed; at warehouse scale the state dir IS the output
        # table and stays on storage instead
        return spark.read.parquet(state_dir).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def mg_compress(counts: DataFrame, m: int) -> DataFrame:
    """One Misra-Gries summary-merge step over a (term, c) counter
    table: subtract the (m+1)-th largest count from every counter and
    drop non-positive rows — at most m rows survive, and any term with
    true mass ≥ total/m provably keeps a positive counter.

    The pivot (the (m+1)-th largest c) is found with a DISTRIBUTED
    top-(m+1): orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, one tiny final merge), so the input — which
    is state ∪ the micro-batch's full distinct vocab, NOT m rows —
    never funnels through a partition-less Window (r03's version did,
    making each batch's compress a single-task sort of the whole batch
    vocabulary). Ties need no break: the multiset of the top m+1
    VALUES is deterministic whatever row order, and only its min is
    used."""
    topk = counts.select("c").orderBy(F.col("c").desc()).limit(m + 1)
    pivot = topk.agg(
        F.when(F.count(F.lit(1)) == m + 1, F.min("c"))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("__pv")
    )
    return (
        counts.crossJoin(F.broadcast(pivot))
        .select("term", (F.col("c") - F.col("__pv")).alias("c"))
        .filter(F.col("c") > 0)
    )


def stream_heavy_hitters(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_frac: float = 0.02,
    n_files: int = 6,
) -> DataFrame:
    """Streaming heavy-hitter maintenance: a bounded Misra-Gries counter
    TABLE (at most m rows) persisted between micro-batches — the
    mergeable-summary shape of q136's rollup maintenance applied to the
    q125 frequency problem. Per batch: exact batch counts sum into the
    state, then the (m+1)-th largest count subtracts from all and
    non-positive rows drop (the MG summary merge) — state memory stays
    m rows no matter how much stream has passed, and the discarded mass
    keeps the guarantee that every item with true frequency >= N/m is
    still present. After the drain, the surviving candidate terms are
    exact-recounted against the accumulated corpus and thresholded, so
    the OUTPUT is exact (= the batch q125 answer, which is the oracle).

    Output: (term, cnt) — exact heavy hitters at ``min_frac``.

    ``id_col`` is accepted for call-site symmetry with the other
    streaming operators but not staged: the state and the recount are
    term-keyed, so only ``text_col`` crosses the staging write.
    """
    from tytodb_spark.operators.textual import tokens  # noqa: PLC0415

    m = max(8, int(2.0 / min_frac))
    staging = tempfile.mkdtemp(prefix="tyto_shh_")
    try:
        # stage ONLY the text column (round 11, guide §2.3): the id
        # column was written, streamed and re-read by every micro-batch
        # and the recount without ever being consumed — heavy-hitter
        # state is term-keyed. At warehouse scale this is a strict
        # staged-bytes reduction; at sf0.1 it measured +2.7% (min-of-3
        # interleaved; a second session measured a wash).
        src = docs.select(F.col(text_col))
        src_dir = os.path.join(staging, "src")
        src.repartition(n_files).write.parquet(src_dir)
        state_dir = os.path.join(staging, "state")

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            batch_counts = (
                batch_df.select(F.explode(tokens(F.col(text_col))).alias("term"))
                .groupBy("term")
                .agg(F.sum(F.lit(1)).cast("bigint").alias("c"))
            )
            if os.path.exists(state_dir):
                prev = spark.read.parquet(state_dir)
                combined = (
                    prev.unionByName(batch_counts)
                    .groupBy("term")
                    .agg(F.sum("c").cast("bigint").alias("c"))
                )
            else:
                combined = batch_counts
            compressed = mg_compress(combined, m)
            tmp = os.path.join(staging, f"state_tmp_{batch_id}")
            # MG state is <= m rows — a single snapshot file
            compressed.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = os.path.join(staging, f"state_old_{batch_id}")
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(tmp, state_dir)  # snapshot swap: atomic dir rename
            if os.path.exists(old):
                shutil.rmtree(old)

        stream = (
            spark.readStream.schema(src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(staging, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # candidate set is m-bounded — driver-side pin (guarded: fails
        # loudly past DRIVER_PIN_LIMIT) so the staging dir can be
        # reclaimed before the recount runs
        cand_rows = _pin_to_driver(
            spark.read.parquet(state_dir).select("term"),
            "Misra-Gries candidate set",
        )
        candidates = spark.createDataFrame(cand_rows or [(" ",)], "term string")
        toks = src.select(F.explode(tokens(F.col(text_col))).alias("term"))
        total = toks.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
        return (
            toks.join(F.broadcast(candidates), "term")
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("__n")))
            .select("term", "cnt")
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def decay_state(batch: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """Collapse a batch to its exponentially-decayed-count partial:
    (key, max_day, v) where v = sum over rows of 2^(day - max_day + 60)
    as DECIMAL(38,0). The 2^60 fixed-point makes every contribution an
    exact power-of-two integer for any event up to 60 days older than
    the partial's frontier, so merging partials (merge_decay) is exact
    integer halving — no float ever accumulates.

    VALIDITY WINDOW: a single batch must span at most 60 days per key
    (oldest event >= frontier - 60). Beyond that the shift amount goes
    negative, which Java shiftleft would silently wrap (mask to 6
    bits) into enormous wrong masses — so the expression raises loudly
    (assert_true) instead. An event >60 days older than the frontier
    contributes < 1 ulp of the fixed point anyway; callers with longer
    histories should pre-filter rather than expect silent decay."""
    mx = batch.groupBy(key_col).agg(F.max(day_col).alias("max_day"))
    return (
        batch.join(mx, key_col)
        .groupBy(key_col, "max_day")
        .agg(
            F.sum(
                # shiftleft, NOT pow()->decimal: casting the double 2^60
                # to decimal rounds at 17 significant digits (measured
                # +6 on a 3x30-day batch); the bigint shift is exact.
                # assert_true returns NULL on pass, so the CASE yields
                # the shifted value; a >60-day span raises instead of
                # letting shiftleft wrap the negative amount.
                F.expr(
                    "case when assert_true("
                    f"{day_col} - max_day + 60 >= 0,"
                    " 'decay_state: batch spans more than 60 days —"
                    " contribution would underflow the 2^60 fixed point"
                    " (shiftleft would wrap); pre-filter events older"
                    " than frontier - 60') is null"
                    " then cast(shiftleft(cast(1 as bigint),"
                    f" cast({day_col} - max_day + 60 as int))"
                    " as decimal(38,0)) end"
                )
            )
            .cast("decimal(38,0)")
            .alias("v")
        )
    )


def merge_decay(a: DataFrame, b: DataFrame, key_col: str) -> DataFrame:
    """Merge two decayed-count partials: per key the older frontier's
    mass halves once per day of frontier difference — exact integer
    division while every contribution still carries headroom in the
    2^60 fixed point. The operation is ASSOCIATIVE and COMMUTATIVE
    (it is just a change of fixed-point basis + add), so the final
    state is independent of micro-batch arrival order — the property
    the oracle equality and the partition sweep both lean on.

    VALIDITY WINDOW: exactness holds while every event stays within
    60 days of the merged frontier (so its dyadic term remains an
    integer after re-basing). Outside that window the decimal division
    would round HALF_UP — silently breaking the order-independence
    guarantee — and a frontier gap >= 64 days would wrap shiftleft
    entirely (divisor 1, no halving at all). Both conditions raise
    loudly via assert_true instead: the gap must be < 63 and the
    older mass must be exactly divisible by 2^gap."""
    u = a.select(key_col, "max_day", "v").unionByName(
        b.select(key_col, "max_day", "v")
    )
    mx = u.groupBy(key_col).agg(F.max("max_day").alias("__mx"))
    return (
        u.join(mx, key_col)
        .select(
            key_col,
            F.col("__mx").alias("max_day"),
            # least(gap, 62) keeps the divisibility probe's shiftleft
            # well-defined when the gap itself is out of range — the
            # `gap < 63` conjunct is what actually fires there.
            F.expr(
                "case when assert_true("
                " __mx - max_day < 63 and"
                " v % cast(shiftleft(cast(1 as bigint),"
                " cast(least(__mx - max_day, 62) as int))"
                " as decimal(38,0)) = 0,"
                " 'merge_decay: frontier gap exceeds the 60-day"
                " exactness window — halving would round (or shiftleft"
                " would wrap); expire stale partials before merging')"
                " is null"
                " then cast(v / cast(shiftleft(cast(1 as bigint),"
                " cast(__mx - max_day as int)) as decimal(38,0))"
                " as decimal(38,0)) end"
            ).alias("v"),
        )
        .groupBy(key_col, "max_day")
        .agg(F.sum("v").cast("decimal(38,0)").alias("v"))
    )


def stream_decayed_counts(
    spark: SparkSession,
    source: DataFrame,
    key_col: str,
    day_col: str,
    n_files: int = 8,
) -> DataFrame:
    """Streaming exponentially-decayed counts (half-life = 1 day) per
    key — the trending/recency score behind every 'what's hot NOW'
    ranking, maintained as mergeable state: each micro-batch collapses
    to its (key, frontier day, 2^60-fixed-point mass) partial
    (decay_state) and merges into the snapshot-swap state (merge_decay)
    — per batch the work is batch + |keys| state, never history.

    Because the merge is associative-commutative EXACT integer algebra
    (dyadic masses, frontier re-basing = integer halving), the final
    state provably equals the cold one-pass aggregate regardless of
    how the availableNow drain splits batches — which is exactly what
    the DuckDB oracle asserts, bit-for-bit. Validity window: exact
    while all events per key fall within 60 days of that key's final
    frontier (see decay_state / merge_decay — both raise loudly
    outside it rather than silently rounding or wrapping)."""
    staging = tempfile.mkdtemp(prefix="tyto_decay_")
    try:
        src_dir = os.path.join(staging, "src")
        source.repartition(n_files).write.parquet(src_dir)
        state_dir = os.path.join(staging, "state")

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            batch_state = decay_state(batch_df, key_col, day_col)
            if os.path.exists(state_dir):
                prev = spark.read.parquet(state_dir)
                new_state = merge_decay(prev, batch_state, key_col)
            else:
                new_state = batch_state
            tmp = os.path.join(staging, f"state_tmp_{batch_id}")
            new_state.coalesce(1).write.mode("overwrite").parquet(tmp)
            old = os.path.join(staging, f"state_old_{batch_id}")
            if os.path.exists(state_dir):
                os.rename(state_dir, old)
            os.rename(tmp, state_dir)  # snapshot swap
            if os.path.exists(old):
                shutil.rmtree(old)

        stream = (
            spark.readStream.schema(source.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", os.path.join(staging, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = spark.read.parquet(state_dir)
        return spark.createDataFrame(
            _pin_to_driver(final, "decayed-count state"), final.schema
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)
