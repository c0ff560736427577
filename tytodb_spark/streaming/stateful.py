"""Custom stateful streaming operator via applyInPandasWithState.

`session_window`/windowed aggs cover the built-in stateful shapes
(streaming/windows.py); this module is the escape hatch for semantics
Spark's operators can't express: an ORDER-DEPENDENT per-key state
machine. The example operator is a running anomaly detector — for each
user, flag events whose value exceeds ``factor ×`` the running mean of
that user's PRIOR events (the state is (count, sum) per user, carried
across micro-batches).

The rule has FEEDBACK: flagged anomalies are excluded from the running
mean, so the state after event *i* depends on the detector's own prior
decisions — that recurrence is not expressible as any window aggregate
(a window's frame cannot depend on computed output), which is exactly
when the applyInPandasWithState escape hatch earns its keep
(Arrow-batched per group, state store checkpointed across triggers).
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

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("running_mean_before", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)


def _detect(factor: float, min_history: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        out_user, out_event, out_value, out_mean = [], [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for event_id, value in zip(pdf["event_id"], pdf["value"]):
                if n >= min_history and value > factor * (total / n):
                    out_user.append(key[0])
                    out_event.append(event_id)
                    out_value.append(float(value))
                    out_mean.append(total / n)
                    continue  # feedback: anomalies don't enter the state
                n += 1
                total += float(value)
        state.update((n, total))
        # explicit dtypes: an empty untyped frame triggers pandas'
        # all-NA concat FutureWarning inside the Arrow serializer
        yield pd.DataFrame(
            {
                "user_id": pd.array(out_user, dtype="int64"),
                "event_id": pd.array(out_event, dtype="int64"),
                "value": pd.array(out_value, dtype="float64"),
                "running_mean_before": pd.array(out_mean, dtype="float64"),
            }
        )

    return fn


def anomalies_stateful(
    spark: SparkSession,
    events: DataFrame,
    factor: float = 3.0,
    min_history: int = 5,
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run the anomaly state machine as a real Structured Streaming job
    (file source → applyInPandasWithState → memory sink, availableNow)
    and return the flagged events.

    NOTE on determinism: state evolves in event order within each
    micro-batch (sorted by ts per group); with availableNow over one
    staged input the result is reproducible and equals
    :func:`anomalies_batch_reference`."""
    staging = tempfile.mkdtemp(prefix="tyto_stateful_")
    name = f"tyto_anom_{uuid.uuid4().hex[:12]}"
    try:
        src = events.select("user_id", "event_id", "ts", "value")
        # one file so a single micro-batch sees each user's full, ordered
        # history (multi-batch runs are split-point-dependent by design)
        src.coalesce(1).write.mode("overwrite").parquet(f"{staging}/in")
        stream = spark.readStream.schema(src.schema).parquet(f"{staging}/in")
        flagged = stream.groupBy("user_id").applyInPandasWithState(
            _detect(factor, min_history),
            outputStructType=ANOMALY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        # state_partitions also sets the Arrow/Python worker fan-out of
        # applyInPandasWithState — kept a bit higher than the pure-JVM
        # drains so the pandas work still parallelizes (state.py).
        with pinned_state_partitions(spark, state_partitions):
            q = (
                flagged.writeStream.format("memory")
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


def anomalies_batch(
    events: DataFrame, factor: float = 3.0, min_history: int = 5
) -> DataFrame:
    """DISTRIBUTED batch twin of the state machine: the identical
    recurrence as a grouped-map applyInPandas over each user's full
    (ts, event_id)-ordered history. Per-key sequential scanning is
    inherent to the semantics (the state feeds back into itself), so
    one worker per user-group IS the parallel decomposition; float
    arithmetic is the same pandas float64 sequence as the streaming
    operator, so flag decisions match bit-for-bit. q39 uses this as the
    independent implementation the streaming result must equal."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        n, total = 0, 0.0
        out_user, out_event, out_value, out_mean = [], [], [], []
        for user_id, event_id, value in zip(
            pdf["user_id"], pdf["event_id"], pdf["value"]
        ):
            if n >= min_history and value > factor * (total / n):
                out_user.append(user_id)
                out_event.append(event_id)
                out_value.append(float(value))
                out_mean.append(total / n)
                continue  # feedback: anomalies don't enter the state
            n += 1
            total += float(value)
        return pd.DataFrame(
            {
                "user_id": pd.array(out_user, dtype="int64"),
                "event_id": pd.array(out_event, dtype="int64"),
                "value": pd.array(out_value, dtype="float64"),
                "running_mean_before": pd.array(out_mean, dtype="float64"),
            }
        )

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, ANOMALY_SCHEMA)
    )


def anomalies_batch_reference(events: DataFrame, factor: float = 3.0, min_history: int = 5):
    """Driver-side pandas reference implementation (test oracle)."""
    pdf = (
        events.select("user_id", "event_id", "ts", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    out = []
    for user_id, g in pdf.groupby("user_id"):
        n, total = 0, 0.0
        for _, row in g.iterrows():
            if n >= min_history and row["value"] > factor * (total / n):
                out.append((user_id, row["event_id"], float(row["value"]), total / n))
                continue  # feedback: anomalies don't enter the state
            n += 1
            total += float(row["value"])
    return out
