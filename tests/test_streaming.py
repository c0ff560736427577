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


def test_batch_twin_equals_reference(spark, sf_dir):
    """The distributed grouped-map twin (q39's self-consistency side)
    reproduces the driver-side pandas reference exactly."""
    from tytodb_spark.streaming.stateful import (
        anomalies_batch,
        anomalies_batch_reference,
    )

    events = load_tables(spark, sf_dir)["events"]
    got = sorted(
        (r["user_id"], r["event_id"], r["value"], round(r["running_mean_before"], 9))
        for r in anomalies_batch(events, factor=3.0, min_history=5).collect()
    )
    want = sorted(
        (u, e, v, round(m, 9))
        for u, e, v, m in anomalies_batch_reference(events, factor=3.0, min_history=5)
    )
    assert got == want and got


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


def test_stream_stream_join_equals_batch(spark, sf_dir):
    from tytodb_spark.streaming import pipeline as P

    events = load_tables(spark, sf_dir)["events"]
    streamed = P.stream_stream_join(spark, events).collect()
    s = events.filter(F.col("event_type") == "signup").select(
        F.col("user_id").alias("s_user"), F.col("ts").alias("signup_ts")
    )
    e = events.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("error_ts")
    )
    batch = P.signup_error_pairs(s, e).collect()
    key = lambda r: (r["user_id"], r["signup_us"], r["error_us"])
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    assert len(batch) > 0


def test_stream_dedup_matches_distinct(spark, sf_dir):
    from tytodb_spark.streaming import pipeline as P

    events = load_tables(spark, sf_dir)["events"]
    got = P.stream_dedup_keys(spark, events).collect()
    want = events.select("user_id", "event_type").distinct().collect()
    key = lambda r: (r["user_id"], r["event_type"])
    assert sorted(map(key, got)) == sorted(map(key, want))
    # streaming dedup emitted each key exactly once
    assert len(got) == len(set(map(key, got)))


def test_stream_append_to_warehouse_idempotent(spark, sf_dir, tmp_path):
    from tytodb_spark.storage.warehouse import Warehouse
    from tytodb_spark.streaming import pipeline as P

    events = load_tables(spark, sf_dir)["events"].limit(300)
    src = str(tmp_path / "src")
    # three files -> three micro-batches at maxFilesPerTrigger=1
    events.repartition(3).write.mode("overwrite").parquet(src)

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.create_table("sink", [("event_id", "BIGINT"), ("user_id", "BIGINT")])
    exprs = ["event_id", "cast(user_id as bigint) AS user_id"]

    n = P.stream_append_to_warehouse(
        spark, wh, "sink", src, events.schema, exprs,
        checkpoint_dir=str(tmp_path / "ckpt1"),
    )
    assert n >= 1
    assert wh.read_committed("sink").count() == 300

    # a fresh run over the same data with a NEW checkpoint replays every
    # batch; the persisted batch marker must make the replay a no-op
    # (batch ids restart at 0 <= last committed id)
    n2 = P.stream_append_to_warehouse(
        spark, wh, "sink", src, events.schema, exprs,
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    assert n2 == 0
    assert wh.read_committed("sink").count() == 300


def test_stream_static_enrich_equals_batch(spark, sf_dir):
    from tytodb_spark.streaming import pipeline as P

    t = load_tables(spark, sf_dir)
    streamed = P.stream_static_enrich(spark, t["events"], t["customer"]).collect()
    batch = P.segment_enrichment(t["events"], t["customer"]).collect()
    key = lambda r: (r["c_mktsegment"], r["n_events"], r["total_value"])
    assert sorted(map(key, streamed)) == sorted(map(key, batch))
    assert len(batch) > 0


def test_rate_limit_stateful_admits_per_window(spark):
    """5 events in hour A, 2 in hour B for one user, limit 3: the
    window change resets the counter (3 + 2 admitted); a second user
    under the limit passes untouched."""
    import datetime as dt

    from tytodb_spark.streaming.rate_limit import rate_limit_stateful

    t0 = dt.datetime(2026, 1, 1, 10, 0, 0)
    rows = [
        # user 1: five in 10:xx, two in 11:xx
        *[(1, i, t0 + dt.timedelta(minutes=i)) for i in range(5)],
        (1, 10, t0 + dt.timedelta(hours=1)),
        (1, 11, t0 + dt.timedelta(hours=1, minutes=5)),
        # user 2: two events total
        (2, 20, t0),
        (2, 21, t0 + dt.timedelta(minutes=30)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = sorted(
        (r["user_id"], r["event_id"])
        for r in rate_limit_stateful(spark, ev, limit=3, window_seconds=3600).collect()
    )
    assert got == [(1, 0), (1, 1), (1, 2), (1, 10), (1, 11), (2, 20), (2, 21)]


def test_stream_incremental_rollup_equals_batch(spark):
    from tytodb_spark.operators.incremental import rollup_state
    from tytodb_spark.streaming.pipeline import stream_incremental_rollup

    df = spark.createDataFrame(
        [(("a" if i % 3 else "b"), float(i)) for i in range(100)],
        "k string, x double",
    )
    # n_files=5 forces 5 micro-batches through the foreachBatch merge
    out = stream_incremental_rollup(spark, df, ["k"], ["x"], n_files=5)
    expect = rollup_state(df, ["k"], ["x"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_sliding_windows_double_count(spark):
    from tytodb_spark.streaming.windows import sliding_window_counts

    df = spark.createDataFrame(
        [("2024-01-01 00:02:00", "a", 1.0), ("2024-01-01 00:07:00", "a", 2.0)],
        "ts_s string, event_type string, value double",
    ).select(F.to_timestamp("ts_s").alias("ts"), "event_type", "value")
    out = sorted(
        (r["window_start"], r["n_events"]) for r in sliding_window_counts(df).collect()
    )
    # 00:02 lands in windows starting 23:55 and 00:00; 00:07 in 00:00
    # and 00:05 -> [23:55]:1, [00:00]:2, [00:05]:1
    counts = [n for _, n in out]
    assert counts == [1, 2, 1]
    assert sum(counts) == 4  # every event exactly twice


def test_stream_outer_join_evicts_below_watermark(spark):
    from tytodb_spark.streaming.pipeline import stream_stream_left_join

    rows = [
        # u1: signup with an error in-window (matched)
        ("2024-01-01 00:00:00", 1, "signup"),
        ("2024-01-01 00:30:00", 1, "error"),
        # u2: signup with no error, old enough to evict (null emission)
        ("2024-01-01 01:00:00", 2, "signup"),
        # u3: signup with no error, within 1h of stream end (held in state)
        ("2024-01-01 09:30:00", 3, "signup"),
        # advance both watermarks to 10:00
        ("2024-01-01 10:00:00", 9, "error"),
        ("2024-01-01 10:00:00", 9, "signup"),
    ]
    df = spark.createDataFrame(
        [(t, u, e, 0.0, "{}") for t, u, e in rows],
        "ts_s string, user_id long, event_type string, value double, props string",
    ).select(F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value", "props")
    out = stream_stream_left_join(spark, df)
    got = {(r["user_id"], r["error_us"] is None) for r in out.collect()}
    # wm = min(max signup 10:00, max error 10:00) = 10:00
    assert (1, False) in got          # matched pair emitted
    assert (2, True) in got           # evicted unmatched -> null row
    assert (3, True) not in got       # still in state (9:30+1h > ... boundary) — not emitted
    # u9's signup at 10:00 has eviction boundary 11:00 > wm -> held
    assert (9, True) not in got


def test_stream_heavy_hitters_bounded_state_exact_output(spark):
    from tytodb_spark.operators.textual import frequent_tokens_exact
    from tytodb_spark.streaming.pipeline import stream_heavy_hitters

    rows = [(i, "hot " * 30 + f"rare{i} warm warm") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = stream_heavy_hitters(spark, df, "doc_id", "text", min_frac=0.05)
    batch = frequent_tokens_exact(df, "doc_id", "text", min_frac=0.05)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))
    got = {r["term"] for r in out.collect()}
    assert "hot" in got and "warm" in got and not any(t.startswith("rare") for t in got)


def test_stream_heavy_hitters_stages_text_only(spark):
    """Round 11 staged-bytes cut: the heavy-hitter stream stages ONLY
    the text column — state and recount are term-keyed, so the id
    column must never be touched. Pinned by passing an id_col that
    does not exist in the frame: any staging/recount reference to it
    would raise, and the output must still equal the batch answer."""
    from tytodb_spark.operators.textual import frequent_tokens_exact
    from tytodb_spark.streaming.pipeline import stream_heavy_hitters

    rows = [(i, "hot " * 30 + f"rare{i} warm warm") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = stream_heavy_hitters(
        spark, df.select("text"), "no_such_column", "text", min_frac=0.05
    )
    batch = frequent_tokens_exact(df, "doc_id", "text", min_frac=0.05)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))


def test_watermark_late_audit_matches_python_replay(spark, sf_dir):
    """q229's simulated watermark line vs a direct Python replay of the
    Structured Streaming rule (watermark before batch k = max event
    time over batches < k minus the delay; late iff t < watermark)."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["batch"]: (r["n_events"], r["n_late"], r["watermark_us"])
        for r in REGISTRY["q229_watermark_late_audit"]
        .fn(spark, sf_dir)
        .collect()
    }
    rows = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "(unix_micros(ts)"
            " + (conv(substr(md5(cast(event_id as string)), 1, 8), 16, 10)"
            "    % 7200) * 1000000) div 5400000000 as batch",
            "unix_micros(ts) as t",
        )
        .collect()
    )
    by_batch: dict[int, list[int]] = {}
    for r in rows:
        by_batch.setdefault(r["batch"], []).append(r["t"])
    wm = None
    seen_max = None
    for k in sorted(by_batch):
        ts = by_batch[k]
        exp_wm = -1 if wm is None else wm
        n_late = 0 if wm is None else sum(1 for t in ts if t < wm)
        assert got[k] == (len(ts), n_late, exp_wm), k
        seen_max = max(ts) if seen_max is None else max(seen_max, max(ts))
        wm = seen_max - 3600000000
    assert len(got) == len(by_batch)
    # the delay must actually drop something at this SF, or the audit
    # is vacuous
    assert sum(v[1] for v in got.values()) > 0


def test_driver_pin_guard_enforces_bound(spark):
    """_pin_to_driver refuses to collect past its row limit — the
    key-bounded invariant is enforced, not assumed (round-7 advice)."""
    import pytest as _pytest

    from tytodb_spark.streaming.pipeline import _pin_to_driver

    df = spark.range(10)
    assert len(_pin_to_driver(df, "tiny", limit=100)) == 10
    with _pytest.raises(ValueError, match="driver pin refused"):
        _pin_to_driver(df, "too big", limit=5)
