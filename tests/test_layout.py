"""Physical-layout pruning: hive partitioning, Z-order clustering, and
runtime Bloom-filter join pruning.

These assert the SCALE claims from parquet footers and plan text — the
metadata a real scan consults — not from wall-clock timing.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables
from tytodb_spark.plans import inspect as P
from tytodb_spark.storage.layout import (
    file_column_bounds,
    write_partitioned,
    write_zordered,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="tyto_layout_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _overlap_fraction(bounds: list[dict], boxes: dict[str, tuple]) -> float:
    """Fraction of files whose stats intersect the box predicate —
    i.e. the files a pruning scan must actually open."""
    hit = 0
    for b in bounds:
        if all(b[c][0] <= hi and b[c][1] >= lo for c, (lo, hi) in boxes.items()):
            hit += 1
    return hit / len(bounds)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmpdir):
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    zpath = f"{tmpdir}/z"
    lpath = f"{tmpdir}/lead"
    write_zordered(li, zpath, ["l_orderkey", "l_partkey"], num_files=8)
    # the reference's layout: range-clustered on the FIRST column only
    (
        li.repartitionByRange(8, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    cols = ["l_orderkey", "l_partkey"]
    zb = file_column_bounds(zpath, cols)
    lb = file_column_bounds(lpath, cols)
    # the discriminating predicate: narrow on the SECOND dimension only
    # (~1/16 of its range). Lead-column sort leaves l_partkey spanning
    # the full range in every file — zero pruning; Z-order confines it.
    pkey_hi = max(b["l_partkey"][1] for b in lb)
    box = {"l_partkey": (0, pkey_hi // 16)}
    z_frac = _overlap_fraction(zb, box)
    l_frac = _overlap_fraction(lb, box)
    assert l_frac == 1.0  # first-column index is useless here (ref parity)
    assert z_frac < l_frac, (z_frac, l_frac)
    assert z_frac <= 0.5


def test_zorder_roundtrip_lossless(spark, sf_dir, tmpdir):
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    write_zordered(li, f"{tmpdir}/z", ["l_orderkey", "l_partkey"])
    back = spark.read.parquet(f"{tmpdir}/z")
    assert back.count() == li.count()
    assert set(back.columns) == set(li.columns)  # __zkey dropped


def test_partition_pruning_in_plan(spark, sf_dir, tmpdir):
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "event_type", "value"
    )
    path = f"{tmpdir}/ev"
    write_partitioned(ev, path, ["event_type"])
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = P.physical_plan(df)
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    # the data filter must NOT also run as a row-level filter — it is
    # fully resolved by partition pruning (no event_type in PushedFilters)
    pushed = " ".join(P.pushed_filters(df))
    assert "event_type" not in pushed


def test_runtime_bloom_filter_join(spark, sf_dir):
    """Runtime row-level Bloom-filter pruning: a selective dim filter
    is turned into a bloom filter applied on the fact side BEFORE the
    join shuffle — at 100 TB this drops most fact rows at the scan
    instead of shuffling them. Thresholds are lowered to make the
    optimizer inject it on test-sized data."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
        # force a shuffle join: broadcast joins reuse the broadcast as
        # the filter instead of a bloom filter
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    # load (and its tune()) FIRST — tune resets autoBroadcastJoinThreshold
    t = load_tables(spark, sf_dir)
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT")
        joined = t["lineitem"].join(orders, t["lineitem"].l_orderkey == orders.o_orderkey)
        plan = P.physical_plan(joined).lower()
        assert "bloomfilter" in plan or "might_contain" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_zorder_key_constant_column(spark):
    """A constant clustering column (span 0) must not divide by zero —
    it contributes nothing to the interleave and every row keeps a
    valid key."""
    from tytodb_spark.storage.layout import zorder_key

    df = spark.range(100).selectExpr("id AS a", "42 AS b")
    zdf, key = zorder_key(df, ["a", "b"], bits=8)
    rows = zdf.select(key).collect()
    assert len(rows) == 100
    assert all(r[0] is not None for r in rows)
