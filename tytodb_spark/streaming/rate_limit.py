"""Per-key stream rate limiting via applyInPandasWithState.

The second custom stateful operator (stateful.py's anomaly detector is
the first): admit at most ``limit`` events per (user, clock-window),
dropping the overflow — the ingestion-throttle / spam-damper every
event pipeline runs in front of expensive downstream stages. The state
per user is just (current window start, admitted count), carried across
micro-batches.

Unlike the anomaly recurrence, this policy IS batch-expressible
(row_number over (user, window) ordered by event time ≤ limit), which
is exactly what makes it the strongest kind of driver row for a
stateful streaming operator: the streaming result hash-matches a plain
SQL oracle, no self-consistency gate needed.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from tytodb_spark.streaming.state import pinned_state_partitions

ADMIT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
    ]
)

#: (window_start_epoch_us, admitted_in_window)
RATE_STATE_SCHEMA = T.StructType(
    [T.StructField("win_us", T.LongType()), T.StructField("n", T.LongType())]
)


def _limiter(limit: int, window_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        win, n = state.get if state.exists else (-1, 0)
        out_event: list[int] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            # event-time window start, integer µs arithmetic (no float)
            ts_us = pdf["ts"].astype("int64") // (
                1 if pdf["ts"].dtype == "int64" else 1000
            )
            for event_id, t in zip(pdf["event_id"], ts_us):
                w = (int(t) // window_us) * window_us
                if w != win:
                    win, n = w, 0
                if n < limit:
                    n += 1
                    out_event.append(int(event_id))
        state.update((win, n))
        yield pd.DataFrame(
            {
                "user_id": pd.array([key[0]] * len(out_event), dtype="int64"),
                "event_id": pd.array(out_event, dtype="int64"),
            }
        )

    return fn


def rate_limit_stateful(
    spark: SparkSession,
    events: DataFrame,
    limit: int = 3,
    window_seconds: int = 3600,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the per-user rate limiter as a real Structured Streaming job
    (file source → applyInPandasWithState → memory sink, availableNow)
    and return the ADMITTED (user_id, event_id) rows.

    Windows are fixed clock windows (epoch-aligned, ``window_seconds``
    wide) computed in integer microseconds — no float time arithmetic,
    so the admit set is reproducible and equal to the SQL twin
    (row_number over (user, window) ordered by (ts, event_id) ≤ limit).

    Scale posture: state is two longs per live user; the shuffle is the
    groupBy(user) hash partition Structured Streaming needs anyway.
    Skewed users cost memory proportional to their per-batch event
    count only (rows stream through the limiter, nothing accumulates).

    NOTE on determinism: a single staged input file = one micro-batch,
    so each user's history arrives whole and (ts, event_id)-sorted; the
    per-window counter then admits the globally-first ``limit`` events
    of each window (multi-batch runs admit per-batch prefixes instead —
    same counts, split-point-dependent membership)."""
    staging = tempfile.mkdtemp(prefix="tyto_ratelimit_")
    name = f"tyto_rate_{uuid.uuid4().hex[:12]}"
    window_us = window_seconds * 1_000_000
    try:
        src = events.select("user_id", "event_id", "ts")
        src.coalesce(1).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{staging}/in")
        admitted = stream.groupBy("user_id").applyInPandasWithState(
            _limiter(limit, window_us),
            outputStructType=ADMIT_SCHEMA,
            stateStructType=RATE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        with pinned_state_partitions(spark, state_partitions):
            q = (
                admitted.writeStream.format("memory")
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
