"""Bucketed co-located joins: layout written once, joins shuffle-free.

The zero-Exchange assertion is the point — it proves the 100 TB story
(pay the shuffle at write time, never again) rather than hoping for it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tytodb_spark.plans.inspect import num_shuffles
from tytodb_spark.storage.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # module-scoped (r12): every test only READS the two bucketed
    # tables; re-writing them per test repaid the bucketing shuffle
    # 4x for nothing (~30-40 s of suite wall)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    write_bucketed(orders, "b_orders", "o_custkey", 8)
    write_bucketed(customer, "b_customer", "c_custkey", 8)
    yield orders, customer
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # force SMJ (broadcast would also be exchange-free, but the claim
    # under test is that BUCKETING satisfies the distribution)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark,
            "b_orders",
            "b_customer",
            spark.table("b_orders")["o_custkey"]
            == spark.table("b_customer")["c_custkey"],
        )
        assert num_shuffles(joined) == 0
        assert "SortMergeJoin" in joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    orders, customer = bucketed_tables
    expected = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    got = (
        bucketed_join(
            spark,
            "b_orders",
            "b_customer",
            spark.table("b_orders")["o_custkey"]
            == spark.table("b_customer")["c_custkey"],
        )
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    # groupBy on the bucket key is also satisfied by the layout
    agg = (
        spark.table("b_orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )
    assert num_shuffles(agg) == 0
