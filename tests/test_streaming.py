"""Structured Streaming tests: batch/stream parity, watermark late-data
bounds, session windows (tytodb_spark/streaming/windows.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables
from tytodb_spark.streaming import windows as SW


def _canon(rows):
    return sorted(
        (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
        for r in rows
    )


def test_stream_equals_batch(spark, sf_dir):
    events = load_tables(spark, sf_dir)["events"]
    batch = SW.windowed_counts(events).collect()
    streamed = SW.stream_window_counts(spark, events).collect()
    assert _canon(streamed) == _canon(batch)
    assert len(batch) > 0


def test_watermark_withholds_trailing_windows(spark, sf_dir):
    events = load_tables(spark, sf_dir)["events"]
    batch = SW.windowed_counts(events).collect()
    appended = SW.late_data_window_counts(spark, events, watermark="2 hours").collect()
    got, full = _canon(appended), _canon(batch)
    # append mode emits only watermark-closed windows: a strict prefix
    assert len(got) < len(full)
    assert got == full[: len(got)]


def test_stateful_anomaly_detector(spark, sf_dir):
    from tytodb_spark.streaming.stateful import (
        anomalies_batch_reference,
        anomalies_stateful,
    )

    events = load_tables(spark, sf_dir)["events"]
    got = sorted(
        (r["user_id"], r["event_id"], r["value"], round(r["running_mean_before"], 9))
        for r in anomalies_stateful(spark, events, factor=3.0, min_history=5).collect()
    )
    want = sorted(
        (u, e, v, round(m, 9))
        for u, e, v, m in anomalies_batch_reference(events, factor=3.0, min_history=5)
    )
    assert got == want
    assert len(got) > 0  # the synthetic values do contain spikes


def test_session_windows_gap_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    mins = lambda m: t0 + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        Row(ts=mins(0), user_id=1, value=1.0),
        Row(ts=mins(10), user_id=1, value=1.0),   # same session (gap 10 < 30)
        Row(ts=mins(50), user_id=1, value=1.0),   # new session (gap 40 >= 30)
        Row(ts=mins(0), user_id=2, value=5.0),    # independent user
    ]
    df = spark.createDataFrame(rows)
    out = sorted(
        SW.session_windows(df, gap="30 minutes").collect(),
        key=lambda r: (r["user_id"], r["session_start"]),
    )
    assert [(r["user_id"], r["n_events"]) for r in out] == [(1, 2), (1, 1), (2, 1)]
    first = out[0]
    assert first["session_start"] == mins(0)
    assert first["session_end"] == mins(10 + 30)  # last event + gap
