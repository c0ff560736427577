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


def test_decay_masses_are_exact_dyadic_integers(spark):
    """Every partial's mass is an integer multiple of 2^31 (the
    headroom that makes frontier re-basing exact integer halving for
    any <=29-day gap)."""
    rows = [("a", d) for d in range(30)] * 3
    st = decay_state(_day_frame(spark, rows), "event_type", "day").collect()
    for r in st:
        v = int(r["v"])
        assert v % (2**31) == 0
