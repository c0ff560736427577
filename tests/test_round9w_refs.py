"""Round-9w reference tests: the streaming decayed-count operator
(q506) — pure-Python decay replica plus the merge-algebra properties
the stream-equals-batch claim rests on.
"""

from __future__ import annotations

import math
from collections import defaultdict

from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY
from tytodb_spark.streaming.pipeline import decay_state, merge_decay


def test_decayed_counts_match_python(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in REGISTRY["q506_stream_decayed_counts"]
        .fn(spark, sf_dir)
        .collect()
    }
    t = load_tables(spark, sf_dir)
    days = defaultdict(list)
    for r in t["events"].select("event_type", "ts").collect():
        days[r["event_type"]].append(int(r["ts"].timestamp() // 86400))
    for et, ds in days.items():
        mx = max(ds)
        decayed = sum(2.0 ** (d - mx) for d in ds)
        assert got[et]["max_day"] == mx
        assert got[et]["decayed_milli"] == math.floor(decayed * 1000)


def _day_frame(spark, rows):
    return spark.createDataFrame(rows, "event_type string, day long")


def test_merge_decay_is_order_independent(spark):
    """The stream-equals-batch claim: merging partials in ANY split /
    order yields the cold single-pass state (associativity +
    commutativity of the dyadic re-basing merge)."""
    rows = [
        ("a", 0), ("a", 0), ("a", 3), ("a", 7), ("a", 7), ("a", 29),
        ("b", 5), ("b", 5), ("b", 6), ("b", 29), ("b", 0),
    ]
    cold = {
        (r["event_type"], r["max_day"]): r["v"]
        for r in decay_state(_day_frame(spark, rows), "event_type", "day").collect()
    }
    splits = [
        (rows[:4], rows[4:]),
        (rows[:1], rows[1:]),
        (rows[10:], rows[:10]),  # late key arrives first
    ]
    for left, right in splits:
        a = decay_state(_day_frame(spark, left), "event_type", "day")
        b = decay_state(_day_frame(spark, right), "event_type", "day")
        for merged in (
            merge_decay(a, b, "event_type"),
            merge_decay(b, a, "event_type"),
        ):
            got = {
                (r["event_type"], r["max_day"]): r["v"]
                for r in merged.collect()
            }
            assert got == cold, (left, right)


def test_decay_state_raises_on_batch_over_60_day_span(spark):
    """A batch spanning >60 days per key would make the shift amount
    negative, which Java shiftleft silently masks to 6 bits — the
    guarded expression must raise instead of corrupting the mass."""
    import pytest

    rows = [("a", 0), ("a", 61)]
    with pytest.raises(Exception, match="decay_state"):
        decay_state(_day_frame(spark, rows), "event_type", "day").collect()
    # the 60-day boundary itself is still legal (contribution = 2^0)
    ok = decay_state(
        _day_frame(spark, [("a", 0), ("a", 60)]), "event_type", "day"
    ).collect()
    assert int(ok[0]["v"]) == 2**60 + 1


def test_merge_decay_raises_outside_exactness_window(spark):
    """A frontier gap that would round the halving (or wrap shiftleft
    at >=64 days) must raise, not silently break order-independence."""
    import pytest

    a = decay_state(_day_frame(spark, [("a", 0)]), "event_type", "day")
    # gap 61: mass 2^60 / 2^61 rounds — must raise
    b = decay_state(_day_frame(spark, [("a", 61)]), "event_type", "day")
    with pytest.raises(Exception, match="merge_decay"):
        merge_decay(a, b, "event_type").collect()
    # gap 70: shiftleft would wrap entirely — must also raise
    c = decay_state(_day_frame(spark, [("a", 70)]), "event_type", "day")
    with pytest.raises(Exception, match="merge_decay"):
        merge_decay(a, c, "event_type").collect()
    # gap 60 with a frontier-day event divides exactly — still legal
    d = decay_state(_day_frame(spark, [("a", 60)]), "event_type", "day")
    got = merge_decay(a, d, "event_type").collect()
    assert (got[0]["max_day"], int(got[0]["v"])) == (60, 2**60 + 1)


def test_decay_masses_are_exact_dyadic_integers(spark):
    """Every partial's mass is an integer multiple of 2^31 (the
    headroom that makes frontier re-basing exact integer halving for
    any <=29-day gap)."""
    rows = [("a", d) for d in range(30)] * 3
    st = decay_state(_day_frame(spark, rows), "event_type", "day").collect()
    for r in st:
        v = int(r["v"])
        assert v % (2**31) == 0
