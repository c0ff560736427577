"""Unit tests for the data-validation operators (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from tytodb_spark.operators import quality as QA


def test_histogram_clamps_and_zero_fills(spark):
    df = spark.createDataFrame(
        [Row(x=-5.0), Row(x=0.0), Row(x=9.9), Row(x=10.0), Row(x=35.0),
         Row(x=99.0), Row(x=None)]
    )
    out = {r["bin"]: r for r in QA.equi_width_histogram(df, "x", 0.0, 40.0, 4).collect()}
    assert len(out) == 4                      # zero-count bins included
    assert out[0]["cnt"] == 3                 # -5 clamps low; 0.0 and 9.9 in-bin
    assert out[1]["cnt"] == 1 and out[2]["cnt"] == 0
    assert out[3]["cnt"] == 2                 # 35 in-bin; 99 clamps high
    assert out[1]["lo"] == 10.0 and out[1]["hi"] == 20.0


def test_check_constraints_single_pass_verdicts(spark):
    df = spark.createDataFrame(
        [Row(k=1, q=5.0), Row(k=2, q=-1.0), Row(k=None, q=3.0)]
    )
    out = {
        r["check"]: r
        for r in QA.check_constraints(
            df,
            {"k_not_null": F.col("k").isNotNull(), "q_positive": F.col("q") > 0},
        ).collect()
    }
    assert out["k_not_null"]["n_violations"] == 1 and not out["k_not_null"]["passed"]
    assert out["q_positive"]["n_violations"] == 1 and not out["q_positive"]["passed"]
    assert all(r["n_rows"] == 3 for r in out.values())


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame([Row(fk=1), Row(fk=1), Row(fk=9)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    r = QA.referential_integrity(child, parent, "fk", "pk").collect()[0]
    assert (r["n_child"], r["n_orphans"], r["passed"]) == (3, 1, False)


def test_exact_corr_matches_numpy(spark):
    import numpy as np

    xs = [1.0, 2.0, 3.0, 4.0, 5.5]
    ys = [2.0, 4.1, 5.9, 8.2, 10.9]
    df = spark.createDataFrame([("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double")
    r = QA.exact_corr(df, ["g"], "x", "y").collect()[0]
    assert r["n"] == 5
    assert abs(r["corr"] - np.corrcoef(xs, ys)[0, 1]) < 1e-5
    assert abs(r["covar_pop"] - np.cov(xs, ys, bias=True)[0, 1]) < 1e-5
    # partitioning invariance (the point of exact component sums)
    r8 = QA.exact_corr(df.repartition(8), ["g"], "x", "y").collect()[0]
    assert (r8["corr"], r8["covar_pop"]) == (r["corr"], r["covar_pop"])


def test_ols_fit_matches_numpy(spark):
    import numpy as np

    xs = [1.0, 2.0, 3.0, 4.0, 5.5]
    ys = [2.0, 4.1, 5.9, 8.2, 10.9]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in zip(xs, ys)], "g string, x double, y double"
    )
    r = QA.ols_fit(df, ["g"], "x", "y").collect()[0]
    slope, intercept = np.polyfit(xs, ys, 1)
    assert r["n"] == 5
    assert abs(r["slope"] - slope) < 1e-5
    assert abs(r["intercept"] - intercept) < 1e-5
    assert abs(r["r2"] - np.corrcoef(xs, ys)[0, 1] ** 2) < 1e-5
    # partitioning invariance (the point of exact component sums)
    r8 = QA.ols_fit(df.repartition(8), ["g"], "x", "y").collect()[0]
    assert (r8["slope"], r8["intercept"], r8["r2"]) == (
        r["slope"], r["intercept"], r["r2"],
    )


def test_merkle_root_matches_hashlib(spark, sf_dir):
    """q242's 4-level fold vs a direct hashlib recomputation from the
    q189-style bucket checksums."""
    import hashlib

    from tytodb_spark.queries import REGISTRY

    row = REGISTRY["q242_merkle_root"].fn(spark, sf_dir).collect()[0]
    parts = {
        r["bucket"]: r
        for r in REGISTRY["q189_partition_checksums"].fn(spark, sf_dir).collect()
    }
    lvl = {
        b: hashlib.md5(
            f"{b}:{parts[b]['checksum']}:{parts[b]['n_rows']}".encode()
        ).hexdigest()
        for b in parts
    }
    for _ in range(4):
        nxt = {}
        for i in sorted(lvl):
            g = i // 2
            if g in nxt:
                continue
            left = lvl.get(2 * g)
            right = lvl.get(2 * g + 1, left)
            nxt[g] = hashlib.md5((left + right).encode()).hexdigest()
        lvl = nxt
    assert row["n_leaves"] == len(parts)
    assert row["depth"] == 4
    assert row["root"] == lvl[0]


def test_incremental_join_mv_equals_full_recompute(spark, sf_dir):
    """q241's merged base+delta states vs a one-shot Spark recompute."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = sorted(
        map(tuple, REGISTRY["q241_incremental_join_mv"].fn(spark, sf_dir).collect())
    )
    t = load_tables(spark, sf_dir)
    full = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("revenue"),
        )
    )
    assert got == sorted(map(tuple, full.collect()))


def test_fixture_lineitem_orders_referential_integrity(spark, oracle_sf_dir):
    """Fixture-level RI guard (round-10 ADVICE item): q414/q437/q468/
    q469 roll brand popularity up from lineitem JOIN orders instead of
    scanning lineitem x part directly, so their novelty/popularity
    terms silently depend on every lineitem row having a parent order.
    TPC-H-shaped testdata guarantees it today; this pins the
    assumption so a future corpus change can't skew novelty without a
    red test. Uses the engine's own RI auditor (dogfooding q's
    quality surface) — one pass over lineitem's key column."""
    from tytodb_spark.catalog import load_tables

    t = load_tables(spark, oracle_sf_dir)
    r = QA.referential_integrity(
        t["lineitem"], t["orders"], "l_orderkey", "o_orderkey"
    ).collect()[0]
    assert r["passed"] and r["n_orphans"] == 0 and r["n_child"] > 0
