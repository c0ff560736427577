"""Unit tests for the as-of and interval join operators
(tytodb_spark/operators/joins.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row


T0 = dt.datetime(2024, 1, 1)


def _ts(s: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=s)


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        Row(sym="A", qts=_ts(0), px=10.0),
        Row(sym="A", qts=_ts(10), px=11.0),
        Row(sym="A", qts=_ts(20), px=12.0),
        Row(sym="B", qts=_ts(5), px=100.0),
    ]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        Row(sym="A", tts=_ts(9), qty=1),    # latest quote: t=0
        Row(sym="A", tts=_ts(10), qty=2),   # ties quote t=10
        Row(sym="A", tts=_ts(25), qty=3),   # latest quote: t=20
        Row(sym="B", tts=_ts(1), qty=4),    # before any quote -> NULL
        Row(sym="C", tts=_ts(1), qty=5),    # key with no quotes -> NULL
    ]
    return spark.createDataFrame(rows)


def test_asof_join_backward(spark, quotes, trades):
    from tytodb_spark.operators.joins import asof_join

    out = asof_join(trades, quotes, "sym", "tts", "qts", right_cols=["qts", "px"])
    got = {(r["sym"], r["qty"]): r["r_px"] for r in out.collect()}
    assert got[("A", 1)] == 10.0
    assert got[("A", 2)] == 11.0  # inclusive: equal timestamps match
    assert got[("A", 3)] == 12.0
    assert got[("B", 4)] is None
    assert got[("C", 5)] is None
    assert out.count() == 5  # left join keeps every trade


def test_asof_join_exclusive(spark, quotes, trades):
    from tytodb_spark.operators.joins import asof_join

    out = asof_join(
        trades, quotes, "sym", "tts", "qts", right_cols=["px"], inclusive=False
    )
    got = {(r["sym"], r["qty"]): r["r_px"] for r in out.collect()}
    assert got[("A", 2)] == 10.0  # strict <: the t=10 quote is not visible


def test_interval_join_bounds(spark):
    from tytodb_spark.operators.joins import interval_join

    left = spark.createDataFrame([Row(k=1, lts=_ts(100), tag="L")])
    right = spark.createDataFrame(
        [
            Row(k=1, rts=_ts(99), v="before"),
            Row(k=1, rts=_ts(100), v="at_lower"),
            Row(k=1, rts=_ts(400), v="inside"),
            Row(k=1, rts=_ts(700), v="at_upper"),
            Row(k=1, rts=_ts(701), v="after"),
            Row(k=2, rts=_ts(400), v="other_key"),
        ]
    )
    out = interval_join(left, right, "k", "lts", "rts", 0.0, 600.0)
    got = sorted(r["r_v"] for r in out.collect())
    assert got == ["at_lower", "at_upper", "inside"]


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from tytodb_spark.operators.joins import salted_join

    # heavily skewed fact: 90% of rows share key 0
    fact = spark.createDataFrame(
        [Row(k=(0 if i % 10 else i % 7), fid=i) for i in range(2000)]
    ).repartition(8)
    dim = spark.createDataFrame([Row(k=i, label=f"d{i}") for i in range(7)])
    got = sorted(
        (r["fid"], r["label"])
        for r in salted_join(fact, dim, "k", salt=8).collect()
    )
    want = sorted((r["fid"], r["label"]) for r in fact.join(dim, "k").collect())
    assert got == want


def test_interval_join_matches_naive(spark):
    """Bucketed construction equals the naive theta join on random data."""
    import random

    from pyspark.sql import functions as F

    from tytodb_spark.operators.joins import interval_join

    rng = random.Random(7)
    left = spark.createDataFrame(
        [Row(k=rng.randrange(3), lid=i, lts=_ts(rng.uniform(0, 5000))) for i in range(120)]
    )
    right = spark.createDataFrame(
        [Row(k=rng.randrange(3), rid=i, rts=_ts(rng.uniform(0, 5000))) for i in range(120)]
    )
    got = {
        (r["lid"], r["r_rid"])
        for r in interval_join(left, right, "k", "lts", "rts", -120.0, 300.0).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, "k")
        .filter(
            (F.col("rts") >= F.col("lts") - F.expr("INTERVAL 120 SECONDS"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 300 SECONDS"))
        )
        .collect()
    }
    assert got == naive


# ---------------------------------------------------------------------------
# CDC merge apply (operators/cdc.py)
# ---------------------------------------------------------------------------


def test_merge_apply_semantics(spark):
    from tytodb_spark.operators.cdc import merge_apply

    base = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    changes = spark.createDataFrame(
        [
            Row(k=2, v="b2", op="U"),   # update existing
            Row(k=3, v=None, op="D"),   # delete existing
            Row(k=9, v="new", op="I"),  # insert new key
            Row(k=1, v="a1", op="I"),   # mis-labeled op: still an upsert
        ]
    )
    out = {r.k: r.v for r in merge_apply(base, changes, "k").collect()}
    assert out == {1: "a1", 2: "b2", 9: "new"}


def test_merge_apply_base_never_shuffles(spark):
    from tytodb_spark.operators.cdc import merge_apply
    from tytodb_spark.plans.inspect import num_broadcast_joins, physical_plan

    base = spark.range(1000).withColumn("v", __import__("pyspark").sql.functions.lit("x"))
    changes = spark.createDataFrame([Row(id=5, v="y", op="U")])
    merged = merge_apply(base, changes, "id")
    plan = physical_plan(merged)
    assert num_broadcast_joins(merged) >= 1  # anti-join is broadcast
    assert "LeftAnti, BuildRight" in plan, plan
    # the only hash exchange is the changes-side key dedup (inside the
    # broadcast build) — the base scan itself never shuffles
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
