"""Source/sink tests: CSV/JSON lossless round-trips and the
fixed-width binary container reader (tytodb_spark/sources/)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables
from tytodb_spark.sources import io as IO
from tytodb_spark.sources import tyto_container as TC


@pytest.fixture()
def tricky(spark):
    rows = [
        Row(k=1, s='plain'),
        Row(k=2, s='comma, inside'),
        Row(k=3, s='quote " inside'),
        Row(k=4, s='newline\ninside'),
        Row(k=5, s=''),
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("fmt", ["csv", "json", "parquet", "orc"])
def test_roundtrip_tricky_strings(spark, tricky, tmp_path, fmt):
    path = os.path.join(str(tmp_path), f"t.{fmt}")
    IO.write_table(tricky, path, fmt)
    back = IO.read_table(spark, path, fmt, schema=tricky.schema)
    got = sorted((r["k"], r["s"]) for r in back.collect())
    want = sorted((r["k"], r["s"]) for r in tricky.collect())
    if fmt == "csv":
        # CSV cannot distinguish empty string from NULL — normalize
        got = [(k, s or "") for k, s in got]
        want = [(k, s or "") for k, s in want]
    assert got == want


def test_roundtrip_documents_csv(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir)["documents"]
    path = os.path.join(str(tmp_path), "docs.csv")
    IO.write_table(docs, path, "csv")
    back = IO.read_table(spark, path, "csv", schema=docs.schema)
    assert back.count() == docs.count()
    a = docs.agg(F.sum("n_chars"), F.count_distinct("lang")).collect()[0]
    b = back.agg(F.sum("n_chars"), F.count_distinct("lang")).collect()[0]
    assert tuple(a) == tuple(b)


def test_container_roundtrip_local(tmp_path):
    cols = [
        ("id", TC.BIGINT),
        ("qty", TC.INT),
        ("price", TC.FLOAT),
        ("ok", TC.BOOL),
        ("name", TC.string_code(100)),
    ]
    rows = [
        (1, 10, 1.5, True, "alpha"),
        (2, -3, -2.25, False, "héllo wörld"),  # multibyte utf-8
        (3, 0, 0.0, True, ""),
        (4, 7, 1e18, False, "x" * 500),  # truncated to the 100-byte slot
    ]
    path = str(tmp_path / "t.tysp")
    TC.write_container(path, cols, rows)
    pdf = TC.read_container_local(path).sort_values("id").reset_index(drop=True)
    assert list(pdf["qty"]) == [10, -3, 0, 7]
    assert list(pdf["price"]) == [1.5, -2.25, 0.0, 1e18]
    assert list(pdf["ok"]) == [True, False, True, False]
    assert pdf["name"][1] == "héllo wörld"
    assert pdf["name"][3] == "x" * 100  # bounded-string truncation


def test_container_distributed_read(spark, tmp_path):
    cols = [("id", TC.BIGINT), ("v", TC.FLOAT), ("tag", TC.string_code(10))]
    # several container files -> several input tasks
    for f in range(3):
        TC.write_container(
            str(tmp_path / f"part{f}.tysp"),
            cols,
            [(f * 100 + i, float(i) / 4, f"t{f}") for i in range(50)],
        )
    df = TC.read_containers(spark, str(tmp_path), cols)
    assert df.count() == 150
    assert df.schema == TC.schema_of(cols)
    got = df.groupBy("tag").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sorted((r["tag"], r["n"]) for r in got) == [("t0", 50), ("t1", 50), ("t2", 50)]


def test_container_distributed_write_roundtrip(spark, tmp_path):
    """write_containers shards per partition (no rows on the driver) and
    the shards read back to exactly the input rows."""
    cols = [("id", TC.BIGINT), ("v", TC.FLOAT), ("tag", TC.string_code(10))]
    src = spark.range(200).select(
        F.col("id"),
        (F.col("id") / 4.0).alias("v"),
        F.concat(F.lit("t"), (F.col("id") % 3).cast("string")).alias("tag"),
    ).repartition(4)
    out = str(tmp_path / "shards")
    manifest = TC.write_containers(src, out, cols).collect()
    assert len(manifest) == 4  # one shard per non-empty partition
    assert sum(m["n_rows"] for m in manifest) == 200
    assert all(os.path.exists(m["path"]) for m in manifest)
    back = TC.read_containers(spark, f"{out}/*.tysp", cols)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_container_schema_mismatch_raises(spark, tmp_path):
    cols = [("id", TC.BIGINT)]
    TC.write_container(str(tmp_path / "a.tysp"), cols, [(1,)])
    wrong = [("other", TC.BIGINT)]
    with pytest.raises(Exception):
        TC.read_containers(spark, str(tmp_path), wrong).collect()


def test_jsonl_corrupt_census_quarantines_exactly(spark, sf_dir):
    """q230: PERMISSIVE-mode quarantine catches exactly the truncated
    lines (event_id % 37) and no others."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    row = REGISTRY["q230_jsonl_corrupt_census"].fn(spark, sf_dir).collect()[0]
    ev = load_tables(spark, sf_dir)["events"]
    n = ev.count()
    n_corrupt = ev.filter("event_id % 37 = 0").count()
    assert row["n_corrupt"] == n_corrupt
    assert row["n_good"] == n - n_corrupt
    assert row["n_types"] == 5
