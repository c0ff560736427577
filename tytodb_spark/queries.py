"""Declared query registry — the correctness-gate surface.

Each entry pairs a Spark DataFrame program with an equivalent ANSI-SQL
oracle string (run by DuckDB over the same parquet). The driver compares
row-count + schema + order-insensitive value hash at sf0.01
(__spark_entry__.py). Conventions that keep the two engines hash-equal:

- Every computed column is aliased identically on both sides.
- Money/double aggregates go through DECIMAL(18,2) (exact, order-
  independent) and are cast to DOUBLE at the end — identical bits in both
  engines, immune to float summation order across 32 shuffle partitions.
- double→int casts: Spark truncates, DuckDB rounds — oracles use
  cast(trunc(x) as int) to express the truncation semantic (which is also
  the reference's `as` cast semantic, src/alba_types.rs:146-151).
- double→DECIMAL casts tie-break differently (Spark HALF_UP, DuckDB
  HALF_EVEN) — harmless for 2-decimal money columns but NOT for
  float32-origin values (long decimal expansions hit ties): quantize
  those by truncation instead, cast(trunc(x * 1e7) as bigint), sum the
  exact integers, divide once (q79's centroid pattern).
- Top-k / pagination always order by a unique key (no ambiguous ties).

Query naming: q0x = reference-parity surface (SURVEY §2.1-§2.3),
q2x = analytics extensions (§2.6), q4x = LLM-pipeline ops (BASELINE.json).
"""

from __future__ import annotations

import dataclasses
import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tytodb_spark.catalog import load_tables
from tytodb_spark.operators.predicates import compile_chain
from tytodb_spark.functions.tyto import bounded_string, coerce

DEC = "decimal(18,2)"


@dataclass(frozen=True)
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible, rows-only check
    doc: str = ""
    # Bench-only variant: what bench.py times instead of ``fn`` when the
    # declared query bundles a self-consistency gate whose cost is a
    # check artifact, not operator cost (q39: the stream-equals-batch
    # gate runs the operator TWICE plus two exceptAlls). Correctness
    # checks always run ``fn``.
    bench_fn: Callable[[SparkSession, str], DataFrame] | None = None


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QueryDef(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_tables(spark, sf_dir)[name]


# ---------------------------------------------------------------------------
# q0x — reference-parity surface
# ---------------------------------------------------------------------------


@query(
    "q01_filter_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE ((l_quantity < 24.0 AND l_returnflag = 'R') OR l_discount >= 0.09)
    """,
    doc="SEARCH WHERE chain (P1-P6 + left-fold AND/OR, SURVEY §2.2 P10; "
    "reference src/query_conditions.rs:482-487). Filter is pushed to the "
    "parquet scan by Catalyst.",
)
def q01_filter_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pred = compile_chain(
        [
            ("l_quantity", "<", 24.0),
            ("l_returnflag", "=", "R"),
            ("l_discount", ">=", 0.09),
        ],
        ["AND", "OR"],
    )
    return li.filter(pred).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@query(
    "q02_contains",
    """
    SELECT p_partkey, p_name, p_brand
    FROM part
    WHERE (contains(p_name, 'gold') OR contains(lower(p_type), lower('BRUSHED')))
    """,
    doc="String containment predicates &> and &&> (P7/P8, "
    "src/query_conditions.rs:422-459; intended direction per SURVEY §8/N2).",
)
def q02_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    pred = compile_chain(
        [("p_name", "&>", "gold"), ("p_type", "&&>", "BRUSHED")],
        ["OR"],
    )
    return part.filter(pred).select("p_partkey", "p_name", "p_brand")


@query(
    "q03_regex",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE regexp_matches(c_name, 'Customer#0*1[0-9]$')
    """,
    doc="Regex predicate &&&> (P9, src/query_conditions.rs:460-479) → rlike.",
)
def q03_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    pred = compile_chain([("c_name", "&&&>", "Customer#0*1[0-9]$")], [])
    return cust.filter(pred).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "q04_projection",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'F'
    """,
    doc="Projection with filter — the reference parses but ignores the "
    "column list (N1, src/parser.rs:295-308 vs src/database.rs:636-698); "
    "we implement the intended select. Catalyst prunes the parquet scan "
    "to exactly these columns (ReadSchema).",
)
def q04_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_totalprice")


@query(
    "q05_union_all",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_totalprice > 400000.0
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    doc="Multi-source SEARCH = UNION ALL of per-source scans (D4, "
    "src/database.rs:636-693, Query::join src/query.rs:86-108).",
)
def q05_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_totalprice", "o_orderpriority"]
    a = orders.filter(F.col("o_totalprice") > 400000.0).select(*cols)
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(*cols)
    return a.unionByName(b)


@query(
    "q06_subquery_source",
    """
    SELECT l_orderkey, l_extendedprice
    FROM (SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01')
    WHERE l_extendedprice > 90000.0
    """,
    doc="Subquery-as-source (D5, AlbaContainer::Virtual src/main.rs:136-140, "
    "recursive run src/database.rs:638-647) — composes as a nested DataFrame.",
)
def q06_subquery_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    inner = li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
    return inner.filter(F.col("l_extendedprice") > 90000.0).select("l_orderkey", "l_extendedprice")


@query(
    "q07_point_lookup",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey = 1337
    """,
    doc="Point lookup on the lead column (D7; reference indexed Strict path "
    "src/indexing.rs:279-309) — here parquet row-group pruning via pushed "
    "equality filter.",
)
def q07_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == 1337).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "q08_range_scan",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE (o_orderkey >= 100 AND o_orderkey < 200)
    """,
    doc="Range lookup on the lead column (D8, src/indexing.rs:215-277) — "
    "min/max row-group stats prune the scan.",
)
def q08_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    pred = compile_chain([("o_orderkey", ">=", 100), ("o_orderkey", "<", 200)], ["AND"])
    return orders.filter(pred).select("o_orderkey", "o_totalprice")


@query(
    "q09_pagination",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, page_rn FROM (
      SELECT l_orderkey, l_linenumber, l_quantity,
             row_number() OVER (ORDER BY l_orderkey, l_linenumber,
                                l_quantity) AS page_rn
      FROM lineitem WHERE l_returnflag = 'A'
    ) WHERE page_rn > 200 AND page_rn <= 300
    """,
    doc="Cursor pagination: 100-row pages (PAGE_SIZE src/query.rs:9; "
    "QYCNNXT/QYCNPVS S9/S10) as a row_number window slice — page 3 here. "
    "The cursor ordering includes l_quantity because (orderkey, "
    "linenumber) is NOT unique in every fixture (sf0.001 has "
    "collisions) and row_number over a non-total order is "
    "engine-nondeterministic.",
)
def q09_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "A")
    w = W.orderBy("l_orderkey", "l_linenumber", "l_quantity")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("page_rn", F.row_number().over(w))
        .filter((F.col("page_rn") > 200) & (F.col("page_rn") <= 300))
    )


@query(
    "q10_coercion",
    """
    SELECT l_orderkey, l_linenumber,
           cast(trunc(l_quantity) as int) AS qty_int,
           cast(l_linenumber as string) AS line_str,
           (CASE WHEN lower(CASE WHEN l_linenumber % 2 = 1 THEN 't' ELSE 'false' END)
                 IN ('1','t','true') THEN TRUE ELSE FALSE END) AS odd_bool
    FROM lineitem WHERE l_orderkey <= 200
    """,
    doc="Implicit coercion matrix (src/alba_types.rs:117-275): float→int "
    "truncation, int→string, string→bool over 0/1/t/f/true/false.",
)
def q10_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    odd_str = F.when(F.col("l_linenumber") % 2 == 1, F.lit("t")).otherwise(F.lit("false"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        coerce(F.col("l_quantity"), "INT").alias("qty_int"),
        coerce(F.col("l_linenumber"), "TEXT").alias("line_str"),
        F.coalesce(coerce(odd_str, "BOOL"), F.lit(False)).alias("odd_bool"),
    )


@query(
    "q11_bounded_string",
    """
    SELECT doc_id, substring(lang, 1, 10) AS lang10, substring(source, 1, 10) AS src10
    FROM documents WHERE n_chars > 100
    """,
    doc="Bounded-string truncation semantics (NANO-STRING cap 10, "
    "src/alba_types.rs:285,317-323).",
)
def q11_bounded_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("n_chars") > 100)
    return docs.select(
        "doc_id",
        bounded_string("lang", 10).alias("lang10"),
        bounded_string("source", 10).alias("src10"),
    )


@query(
    "q12_aql_search",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM (
      SELECT * FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT * FROM orders WHERE o_orderstatus = 'P'
    )
    WHERE ((o_totalprice > 250000.0 AND o_custkey <= 1000) OR o_orderkey < 50)
    """,
    doc="The full AQL front-end (lexer → parser → DataFrame compiler, "
    "SURVEY §2.1 S3): multi-source SEARCH with subquery source, left-fold "
    "WHERE chain, intended projection semantics, ? parameter binding.",
)
def q12_aql_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.engine import Engine

    eng = Engine(
        spark,
        warehouse_dir="/tmp/tyto_q12_wh",  # unused: external tables only
        external_tables=load_tables(spark, sf_dir),
    )
    return eng.search_df(
        "SEARCH [o_orderkey, o_custkey, o_totalprice] "
        "ON [(SEARCH ON 'orders' WHERE o_orderstatus = ?), "
        "(SEARCH ON 'orders' WHERE o_orderstatus = 'P')] "
        "WHERE o_totalprice > 250000.0 AND o_custkey <= 1000 OR o_orderkey < ?",
        args=["'F'", "50"],
    )


@query(
    "q13_aql_crud",
    """
    SELECT k, parity, cast(score as double) AS score FROM (VALUES
      (0, 'even', 0.0), (1, 'odd', 10.0), (2, 'even', 2.0), (3, 'odd', 30.0),
      (4, 'even', 4.0), (6, 'even', 6.0), (7, 'odd', 70.0), (8, 'even', 8.0)
    ) AS t(k, parity, score)
    """,
    doc="Write surface end-to-end (S1/S2/S4/S5/S7/S8, SURVEY §2.1): "
    "CREATE CONTAINER + CREATE ROW + COMMIT + EDIT + DELETE + ROLLBACK "
    "through the snapshot-swap warehouse, verified against the oracle's "
    "hand-computed final state.",
)
def q13_aql_crud(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.engine import Engine

    wh = tempfile.mkdtemp(prefix="tyto_q13_")
    try:
        eng = Engine(spark, wh)
        eng.execute("CREATE CONTAINER 'kv' [k, parity, score] [INT, NANO-STRING, FLOAT]")
        for i in range(10):
            eng.execute(
                "CREATE ROW [k, parity, score] [?, ?, ?] ON 'kv'",
                args=[str(i), "'odd'" if i % 2 else "'even'", str(float(i))],
            )
        eng.execute("COMMIT 'kv'")
        # staged-but-rolled-back write must not appear
        eng.execute("CREATE ROW [k, parity, score] [99, 'ghost', 99.0] ON 'kv'")
        eng.execute("ROLLBACK 'kv'")
        eng.execute("EDIT ROW [score] [?] ON 'kv' WHERE parity = 'odd'", args=["0.0"])
        eng.execute("COMMIT 'kv'")
        eng.execute("EDIT ROW [score] [0.0] ON 'kv' WHERE k = 5")  # then delete it
        eng.execute("DELETE ROW ON 'kv' WHERE k = 5 OR k = 9")
        eng.execute("COMMIT 'kv'")
        # odd scores were zeroed; re-derive as k*10 for surviving odds
        for i in (1, 3, 7):
            eng.execute(f"EDIT ROW [score] [{float(i * 10)}] ON 'kv' WHERE k = {i}")
        eng.execute("COMMIT 'kv'")
        out = eng.warehouse.read("kv")
        # materialize before the tempdir vanishes
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(wh, ignore_errors=True)


# ---------------------------------------------------------------------------
# q2x — analytics extensions (SURVEY §2.6 / §7 step 5)
# ---------------------------------------------------------------------------


@query(
    "q20_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as {DEC})) as double) AS sum_qty,
           cast(sum(cast(l_extendedprice as {DEC})) as double) AS sum_base_price,
           cast(sum(cast(l_extendedprice as {DEC}) * (1 - cast(l_discount as {DEC}))) as double) AS sum_disc_price,
           cast(count(*) as bigint) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style hash aggregation with map-side partial agg; decimal "
    "sums are order-independent so the result is bit-stable across any "
    "partitioning (100 TB-safe determinism).",
)
def q20_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q21_broadcast_join",
    f"""
    SELECT p_brand,
           cast(sum(cast(l_extendedprice as {DEC}) * (1 - cast(l_discount as {DEC}))) as double) AS revenue,
           cast(count(*) as bigint) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="Fact ⋈ small dim with an explicit broadcast hint — no shuffle of "
    "the 600k/100TB fact side; the dim ships to every executor.",
)
def q21_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q22_multiway_join",
    f"""
    SELECT r_name, n_name,
           cast(sum(cast(o_totalprice as {DEC})) as double) AS total_spend,
           cast(count(DISTINCT o_orderkey) as bigint) AS n_orders
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE o_orderstatus = 'O'
    GROUP BY r_name, n_name
    """,
    doc="Star-schema multiway join: fact joined to a chain of broadcast "
    "dims (customer→nation→region). All dim joins broadcast; only the "
    "final groupBy shuffles, on a low-cardinality key.",
)
def q22_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total_spend"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@query(
    "q23_semi_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
    """,
    doc="EXISTS → left-semi join; Spark broadcasts the filtered build side.",
)
def q23_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 300000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "q24_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="NOT EXISTS → left-anti join.",
)
def q24_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "q25_window_rank",
    f"""
    SELECT n_name, c_custkey, spend, spend_rank FROM (
      SELECT n_name, c_custkey,
             cast(sum(cast(o_totalprice as {DEC})) as double) AS spend,
             row_number() OVER (
               PARTITION BY n_name
               ORDER BY sum(cast(o_totalprice as {DEC})) DESC, c_custkey
             ) AS spend_rank
      FROM orders JOIN customer ON o_custkey = c_custkey
                  JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, c_custkey
    ) WHERE spend_rank <= 3
    """,
    doc="Window ranking (top-3 spenders per nation). Deterministic "
    "tie-break on c_custkey. Partial agg before the window shuffle.",
)
def q25_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    spend = (
        t["orders"]
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("spend_dec"))
    )
    w = W.partitionBy("n_name").orderBy(F.col("spend_dec").desc(), F.col("c_custkey"))
    return (
        spend.withColumn("spend_rank", F.row_number().over(w))
        .filter(F.col("spend_rank") <= 3)
        .select(
            "n_name",
            "c_custkey",
            F.col("spend_dec").cast("double").alias("spend"),
            "spend_rank",
        )
    )


@query(
    "q26_running_sum",
    f"""
    SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
           cast(sum(cast(l_extendedprice as {DEC})) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) as double) AS running_rev
    FROM lineitem WHERE l_suppkey <= 2
    """,
    doc="Running aggregate window over event time per supplier; ROWS frame "
    "with a fully deterministic ORDER BY.",
)
def q26_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 2)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_shipdate",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_extendedprice").cast(DEC)).over(w).cast("double").alias("running_rev"),
    )


@query(
    "q27_topk",
    f"""
    SELECT p_partkey, p_name, revenue FROM (
      SELECT p_partkey, any_value(p_name) AS p_name,
             cast(sum(cast(l_extendedprice as {DEC}) * (1 - cast(l_discount as {DEC}))) as double) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey
    ) ORDER BY revenue DESC, p_partkey LIMIT 10
    """,
    doc="Top-k: agg → orderBy+limit compiles to TakeOrderedAndProject "
    "(per-partition top-k then merge on the driver — no global sort).",
)
def q27_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey")
        .agg(
            F.any_value(F.col("p_name")).alias("p_name"),
            F.sum(
                F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_partkey"))
        .limit(10)
    )


@query(
    "q28_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as {DEC})) as double) AS sum_qty,
           cast(count(*) as bigint) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping-set aggregation (hierarchical subtotals).",
)
def q28_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q29_cube",
    f"""
    SELECT o_orderstatus, o_orderpriority,
           cast(sum(cast(o_totalprice as {DEC})) as double) AS total,
           cast(count(*) as bigint) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE grouping-set aggregation (all subtotal combinations).",
)
def q29_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q30_distinct_agg",
    """
    SELECT l_returnflag,
           cast(count(DISTINCT l_partkey) as bigint) AS n_parts,
           cast(count(DISTINCT l_suppkey) as bigint) AS n_supps,
           cast(count(*) as bigint) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Multi-column DISTINCT aggregation (expand + two-phase agg).",
)
def q30_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q31_set_ops",
    """
    SELECT c_custkey FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 450000.0
    """,
    doc="Set operations: INTERSECT and EXCEPT (beyond the reference's "
    "UNION-ALL-only surface, D4).",
)
def q31_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f_cust = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("c_custkey"))
    o_cust = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("c_custkey"))
    big = o.filter(F.col("o_totalprice") > 450000.0).select(F.col("o_custkey").alias("c_custkey"))
    return f_cust.intersect(o_cust).exceptAll(big).distinct()


@query(
    "q32_scalars",
    """
    SELECT event_id,
           cast(date_trunc('day', ts) as timestamp) AS day_ts,
           cast(extract(hour FROM ts) as int) AS hour_of_day,
           upper(event_type) AS event_upper,
           cast(round(cast(value AS DECIMAL(18,2)) * cast(1.10 AS DECIMAL(3,2)),
                      2) as double) AS value_taxed,
           cast(abs(value - 100.0) as double) AS dist_from_100,
           json_extract_string(props, '$.k') AS k_str
    FROM events WHERE event_id < 1000
    """,
    doc="Scalar-function surface: date/time, string, math, JSON extraction "
    "(all absent from the reference — SURVEY §2.4; Spark built-ins).",
)
def q32_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
        F.hour(F.col("ts")).cast("int").alias("hour_of_day"),
        F.upper("event_type").alias("event_upper"),
        # tax through EXACT decimals: round(double*1.1, 2) straddles
        # representation boundaries (1.15*1.1 = 1.2649999.. rounds
        # differently per engine); decimal cents x decimal rate is
        # exact, and decimal HALF_UP agrees everywhere
        F.round(
            F.col("value").cast(DEC) * F.lit("1.10").cast("decimal(3,2)"), 2
        )
        .cast("double")
        .alias("value_taxed"),
        F.abs(F.col("value") - 100.0).cast("double").alias("dist_from_100"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@query(
    "q33_event_windows",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           cast(count(*) as bigint) AS n_events,
           cast(sum(cast(value as {DEC})) as double) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Tumbling 1-hour event-time windows (batch form of the Structured "
    "Streaming windowed agg in tytodb_spark.streaming; F.window semantics).",
)
def q33_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "q34_stream_windows",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           cast(count(*) as bigint) AS n_events,
           cast(sum(cast(value as {DEC})) as double) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    doc="Structured Streaming end-to-end: file source → tumbling 1-hour "
    "event-time window agg → memory sink (complete mode, availableNow "
    "trigger). Result must equal the batch/oracle windowed aggregation.",
)
def q34_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.windows import stream_window_counts

    return stream_window_counts(spark, _t(spark, sf_dir, "events"))


@query(
    "q35_session_windows",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           cast(count(*) as bigint) AS n_events,
           cast(sum(cast(value as {DEC})) as double) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="Gap-based sessionization via the built-in session_window "
    "stateful operator (JVM-side; applyInPandasWithState reserved for "
    "semantics Spark can't express). Oracle reconstructs sessions with "
    "a lag/cumsum break-flag window.",
)
def q35_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.windows import session_windows

    return session_windows(_t(spark, sf_dir, "events"), gap="30 minutes")


@query(
    "q36_asof_join",
    """
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS purchase_ts, r.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
      ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    doc="As-of join (absent from Spark and the reference): each click "
    "event picks up the same user's latest prior-or-simultaneous "
    "purchase. Union + carry-forward window — one shuffle on the key, "
    "no range explosion; operators/joins.py asof_join. Oracle uses "
    "DuckDB's native ASOF JOIN.",
)
def q36_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(clicks, purchases, "user_id", "ts", "ts", right_cols=["ts", "value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
    )


@query(
    "q37_interval_join",
    """
    SELECT l.event_id AS error_id, l.user_id, l.ts AS error_ts,
           r.ts AS purchase_ts, r.value AS purchase_value
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'error' AND r.event_type = 'purchase'
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 10 MINUTE
    """,
    doc="Bounded interval (band/theta) join: purchases within 10 minutes "
    "after an error by the same user. Time-bucketed equi-join + residual "
    "range filter — a hash join on (key, bucket), never a nested-loop "
    "cross product; operators/joins.py interval_join.",
)
def q37_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.joins import interval_join

    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("ts").alias("error_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = interval_join(errors, purchases, "user_id", "error_ts", "ts", 0.0, 600.0)
    return out.select(
        "error_id",
        "user_id",
        "error_ts",
        F.col("r_ts").alias("purchase_ts"),
        F.col("r_value").alias("purchase_value"),
    )


# ---------------------------------------------------------------------------
# q4x — LLM-pipeline operators (dedup / similarity / text / multimodal)
# ---------------------------------------------------------------------------

# DuckDB fragments mirroring tytodb_spark.operators.textual exactly
# (same regexes, same fold shapes) so value hashes are bit-stable.
_TOKS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"


def _NGRAMS(n: int) -> str:
    return (
        f"list_transform(range(1, len({_TOKS})-{n}+2), "
        f"i -> array_to_string(({_TOKS})[i:i+{n}-1], ' '))"
    )


@query(
    "q39_stateful_anomalies",
    """
    SELECT cast(count(DISTINCT user_id) as bigint) AS n_users_checked,
           TRUE AS stream_equals_batch
    FROM events
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState): "
    "per-user anomaly detection where flagged events are excluded from "
    "the running mean — the state depends on the operator's own prior "
    "output, which no window aggregate can express; "
    "streaming/stateful.py anomalies_stateful. The recurrence itself is "
    "not SQL-expressible, so the driver check is a SELF-CONSISTENCY "
    "gate: the streaming run must flag exactly the events its "
    "independent distributed batch twin (grouped-map applyInPandas, "
    "same recurrence) flags; the oracle asserts the verdict TRUE plus "
    "the SQL-derivable user count. Exact flagged-set equality vs the "
    "driver-side pandas reference stays in tests/test_streaming.py.",
)
def q39_stateful_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.stateful import anomalies_batch, anomalies_stateful

    ev = _t(spark, sf_dir, "events")
    stream = anomalies_stateful(spark, ev, factor=3.0, min_history=5).select(
        "user_id", "event_id"
    )
    batch = anomalies_batch(ev, factor=3.0, min_history=5).select(
        "user_id", "event_id"
    )
    mism = (
        stream.exceptAll(batch)
        .union(batch.exceptAll(stream))
        .agg(F.count(F.lit(1)).alias("__n_mismatch"))
    )
    users = ev.agg(F.countDistinct("user_id").alias("n_users_checked"))
    return users.crossJoin(mism).select(
        "n_users_checked",
        (F.col("__n_mismatch") == 0).alias("stream_equals_batch"),
    )


def _q39_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-only: the stateful operator alone. The declared q39 runs the
    stream-equals-batch gate (operator + batch twin + two exceptAlls),
    which is the correctness contract but ~2x the operator's cost."""
    from tytodb_spark.streaming.stateful import anomalies_stateful

    ev = _t(spark, sf_dir, "events")
    return anomalies_stateful(spark, ev, factor=3.0, min_history=5).select(
        "user_id", "event_id"
    )


REGISTRY["q39_stateful_anomalies"] = dataclasses.replace(
    REGISTRY["q39_stateful_anomalies"], bench_fn=_q39_bench
)


@query(
    "q40_exact_dedup",
    r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
           min(doc_id) AS keep_id, cast(count(*) as bigint) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: normalize → content-hash groupBy; one shuffle on "
    "the md5 key, min-id survivor is deterministic at any parallelism "
    "(operators/dedup.py).",
)
def q40_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import exact_dedup_groups

    return exact_dedup_groups(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q41_jaccard_pairs",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
    FROM ex a JOIN ex b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING jaccard >= 0.5
    """,
    doc="Exact n-gram Jaccard near-dup pairs: inverted-index self-join "
    "with AllPairs prefix filtering (index only each doc's rarest "
    "|s|-⌈t·|s|⌉+1 shingles — exact by the prefix theorem). Trigram "
    "shingles: the synthetic corpus has a ~30-word vocabulary, so at "
    "n=2 every shingle is a stop-shingle (frequency pruning can't bite "
    "by construction — that regime belongs to MinHash-LSH, q42); "
    "operators/textual.py jaccard_pairs.",
)
def q41_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import jaccard_pairs

    return jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5
    )


@query(
    "q42_minhash_lsh",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
    FROM ex a JOIN ex b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING jaccard >= 0.5
    """,
    doc="MinHash+LSH banding near-dup detection (64 hashes, 16 bands of "
    "4): shingle → seeded-xxhash64 min-signature → band-bucket join → "
    "exact-Jaccard verify. Oracle is the exhaustive trigram-Jaccard "
    "pair set: at threshold 0.5 and r=4/b=16, LSH recall for the data's "
    "j≥0.9 near-dups is 1-3e-8, so the verified output equals the exact "
    "set; operators/dedup.py minhash_lsh_pairs.",
)
def q42_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        shingle_n=3,
        num_hashes=64,
        num_bands=16,
        threshold=0.5,
    )


def _SIMHASH_ORACLE(max_hamming: int = 3) -> str:
    """DuckDB recomputation of the md5-portable SimHash (bit-identical to
    operators/dedup.py simhash64_portable) + exact all-pairs popcount-xor.
    Exhaustive pairing is fine at oracle scale; Spark's banded self-join
    finds the same ≤max_hamming pair set by the pigeonhole guarantee."""
    cnt_cols = ", ".join(
        f"sum(({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) AS c{i}"
        for i in range(64)
    )

    def band(k: int) -> str:
        return " + ".join(
            f"(((2 * c{16 * k + i} > n)::BIGINT) << {i})" for i in range(16)
        )

    bands = ", ".join(f"{band(k)} AS b{k}" for k in range(4))
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(4))
    return f"""
    WITH sh AS (SELECT doc_id, list_distinct({_TOKS}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS t FROM sh
                WHERE len(s) > 0),
         hv AS (SELECT doc_id, n,
                ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo FROM ex),
         cnt AS (SELECT doc_id, any_value(n) AS n, {cnt_cols}
                 FROM hv GROUP BY doc_id),
         sig AS (SELECT doc_id, {bands} FROM cnt)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           cast({ham} as bigint) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE {ham} <= {max_hamming}
    """


@query(
    "q43_simhash",
    _SIMHASH_ORACLE(3),
    doc="SimHash near-dup pairs: 64-bit bit-vote signature, 4×16-bit "
    "band self-join (Hamming≤3 ⇒ some band equal, pigeonhole), exact "
    "popcount verify; operators/dedup.py simhash_near_pairs. Declared "
    "with the md5-portable hash family so DuckDB recomputes identical "
    "signatures and the pair set is hash-checkable (the xxhash64+Arrow "
    "simhash64 stays as the throughput path, exercised in pytest).",
)
def q43_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3,
        portable=True,
    )


_DOT = (
    "list_reduce(list_transform(range(1, len({a})+1), "
    "i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE), (x, y) -> x + y)"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"round({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})), 6)"
    )


@query(
    "q44_embedding_dups",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           {_cos_sql('a.embedding', 'b.embedding')} AS cos_sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs, label-blocked self-join (the "
    "blocking key bounds the pair blow-up — the 100 TB path swaps the "
    "label for an LSH bucket); dot products are deterministic left-fold "
    "doubles in both engines; operators/dedup.py embedding_dup_pairs.",
)
def q44_embedding_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import embedding_dup_pairs

    return embedding_dup_pairs(
        _t(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=0.35,
        block_col="label",
    )


@query(
    "q45_text_stats",
    f"""
    SELECT doc_id,
           cast(len({_TOKS}) as int) AS n_ws_tokens,
           cast(len(regexp_extract_all(text, '[A-Za-z]{{1,4}}|\\d|[^\\sA-Za-z\\d]')) as int)
             AS n_bpe_tokens,
           md5(array_to_string(list_sort(list_distinct({_TOKS})), ' ')) AS fp
    FROM documents
    """,
    doc="Token counting (whitespace + BPE-ish regex segmentation) and "
    "order-insensitive document fingerprint (md5 of the sorted distinct "
    "token set); operators/textual.py.",
)
def q45_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators import textual as X

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.token_count("text").alias("n_ws_tokens"),
        X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
        X.fingerprint("text").alias("fp"),
    )


def _lang_hits_sql(langs_words: dict[str, list[str]]) -> dict[str, str]:
    return {
        lang: (
            "len(regexp_extract_all(lower(text), "
            f"'\\b({'|'.join(ws)})\\b'))"
        )
        for lang, ws in langs_words.items()
    }


@query(
    "q46_lang_id",
    None,  # oracle set below (needs the marker table)
    doc="Language-ID heuristic: per-language marker-stopword hit counts, "
    "argmax with deterministic alphabetical tie-break, 'und' on zero "
    "hits; operators/textual.py lang_id.",
)
def q46_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import lang_id

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id("text").alias("lang_pred"))


def _q46_oracle() -> str:
    from tytodb_spark.operators.textual import LANG_MARKERS

    hits = _lang_hits_sql(LANG_MARKERS)
    packs = ", ".join(
        f"struct_pack(negs := -s_{lang}, l := '{lang}')" for lang in sorted(hits)
    )
    scores = ", ".join(f"{sql} AS s_{lang}" for lang, sql in hits.items())
    greatest = ", ".join(f"s_{lang}" for lang in sorted(hits))
    return f"""
    SELECT doc_id, lang,
           CASE WHEN greatest({greatest}) < 1 THEN 'und'
                ELSE list_sort([{packs}])[1].l END AS lang_pred
    FROM (SELECT doc_id, lang, {scores} FROM documents)
    """


REGISTRY["q46_lang_id"] = QueryDef(
    fn=REGISTRY["q46_lang_id"].fn,
    oracle=_q46_oracle(),
    doc=REGISTRY["q46_lang_id"].doc,
)


@query(
    "q47_quality",
    None,  # oracle set below (shares the marker table with q46)
    doc="Quality scoring: length/punct/stopword/digit ratio features and "
    "a composite [0,1] score; operators/textual.py quality_score.",
)
def q47_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import quality_features, quality_score

    docs = _t(spark, sf_dir, "documents")
    f = quality_features(F.col("text"))
    return docs.select(
        "doc_id",
        f["n_chars"].cast("int").alias("n_chars_m"),
        F.round(f["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(f["digit_ratio"], 6).alias("digit_ratio"),
        F.round(f["punct_ratio"], 6).alias("punct_ratio"),
        F.round(f["stopword_ratio"], 6).alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )


def _q47_oracle() -> str:
    from tytodb_spark.operators.textual import LANG_MARKERS

    stop = "|".join(LANG_MARKERS["en"])
    toks = _TOKS
    return rf"""
    SELECT doc_id,
           cast(n_chars as int) AS n_chars_m,
           round(n_alpha / safe, 6) AS alpha_ratio,
           round(n_digit / safe, 6) AS digit_ratio,
           round(n_punct / safe, 6) AS punct_ratio,
           round(n_stop / tok_safe, 6) AS stopword_ratio,
           round(greatest(least(
               0.4 * (n_alpha / safe)
             + 0.3 * least((n_stop / tok_safe) * 4, 1.0)
             + 0.3 * least(n_tokens / 64.0, 1.0)
             - 0.2 * (n_digit / safe)
             - 0.2 * (n_punct / safe), 1.0), 0.0), 6) AS quality
    FROM (
      SELECT doc_id,
             length(text) AS n_chars,
             greatest(length(text), 1) AS safe,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[^!-/:-@\[-`{{-~]', '', 'g')) AS n_punct,
             len({toks}) AS n_tokens,
             greatest(len({toks}), 1) AS tok_safe,
             len(regexp_extract_all(lower(text), '\b({stop})\b')) AS n_stop
      FROM documents
    )
    """


REGISTRY["q47_quality"] = QueryDef(
    fn=REGISTRY["q47_quality"].fn, oracle=_q47_oracle(), doc=REGISTRY["q47_quality"].doc
)


@query(
    "q48_knn_brute",
    f"""
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
      WHERE q.vec_id < 5
    ) WHERE rank <= 3
    """,
    doc="Exact cosine top-k (brute force baseline): broadcast query set × "
    "one corpus scan, two-phase distributed top-k (local per-partition "
    "then global — no full-score shuffle); operators/similarity.py "
    "brute_force_knn.",
)
def q48_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import brute_force_knn

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_knn(
        emb.filter(F.col("vec_id") < 5), emb, "vec_id", "embedding", k=3
    )


_ANN_RECALL_ORACLE = """
    SELECT vec_id AS query_id, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """


@query(
    "q49_ann_srp",
    _ANN_RECALL_ORACLE,
    doc="SRP-LSH approximate nearest neighbors: per-vector multi-table "
    "sign-bit signatures, bucket join (never O(N²)), exact re-score of "
    "candidates, two-phase top-k; operators/similarity.py srp_ann. "
    "Driver-checkable as a quantified bound: emits per-query recall@3 "
    "vs the exact brute-force top-k (similarity.py ann_recall); the "
    "oracle asserts TRUE, so a broken index flips the hash match. "
    "Params and threshold are measured, not guessed: the isotropic "
    "gaussian fixture is SRP's adversarial case (top-3 cos ≈ 0.35), and "
    "bits=4/tables=16 delivers per-query recall ≥ 2/3 at sf0.001-0.01; "
    "gate at 1/3 leaves one-neighbor margin against fixture "
    "regeneration.",
)
def q49_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import ann_recall, brute_force_knn, srp_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ann = srp_ann(q, emb, "vec_id", "embedding", dim=64, k=3, bits=4, tables=16)
    exact = brute_force_knn(q, emb, "vec_id", "embedding", k=3)
    return ann_recall(exact, ann, k=3, threshold=1 / 3)


@query(
    "q57_ann_ivf",
    _ANN_RECALL_ORACLE,
    doc="IVF approximate nearest neighbors: sampled spherical-k-means "
    "coarse quantizer (driver-side metadata), map-only distributed cell "
    "assignment (vectorized pandas UDF, centroids broadcast in the "
    "closure), n_probe-cell candidate join (~n_probe/n_centroids of the "
    "corpus scanned per query), exact re-score + two-phase top-k; "
    "operators/similarity.py ivf_ann. NOTE the synthetic gaussian "
    "fixture is IVF's adversarial case (no cluster structure), hence "
    "the generous probe fraction; real embedding corpora probe ~10%. "
    "Driver-checkable as a quantified bound: per-query recall@3 vs "
    "exact brute force (similarity.py ann_recall), oracle asserts TRUE. "
    "Measured: n_probe=10 gives per-query recall ≥ 2/3 at sf0.001-0.01; "
    "gate at 1/3 leaves one-neighbor margin.",
)
def q57_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import ann_recall, brute_force_knn, ivf_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ann = ivf_ann(q, emb, "vec_id", "embedding", k=3, n_centroids=16, n_probe=10)
    exact = brute_force_knn(q, emb, "vec_id", "embedding", k=3)
    return ann_recall(exact, ann, k=3, threshold=1 / 3)


@query(
    "q50_multimodal_features",
    """
    SELECT doc_id,
           cast(octet_length(encode(text)) as bigint) AS n_bytes,
           sha256(text) AS payload_sha256
    FROM documents WHERE doc_id < 100
    """,
    doc="Multimodal column plumbing: opaque binary payload + typed "
    "metadata struct, Arrow-batched mapInPandas feature extraction "
    "(sha256 content hash as the deterministic stand-in for a codec); "
    "operators/multimodal.py.",
)
def q50_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import extract_features, to_media_table

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return extract_features(to_media_table(docs, "doc_id", "text"))


@query(
    "q38_approx_distinct",
    """
    SELECT o_orderpriority,
           cast(count(DISTINCT o_custkey) as bigint) AS exact_custs,
           TRUE AS within_bounds
    FROM orders GROUP BY o_orderpriority
    """,
    doc="Approximate distinct counting (HyperLogLog++): per-priority "
    "approx_count_distinct over orders; constant memory per group at any "
    "scale. Driver-checkable as a quantified bound: the query emits "
    "within_bounds = |approx-exact| ≤ 3·rsd·exact and the oracle asserts "
    "TRUE, so the hash-match IS the accuracy gate (an HLL estimate "
    "itself is engine-specific and can't be value-compared).",
)
def q38_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("__approx"),
        F.countDistinct("o_custkey").alias("exact_custs"),
    ).select(
        "o_orderpriority",
        "exact_custs",
        (
            F.abs(F.col("__approx") - F.col("exact_custs"))
            <= 3 * 0.02 * F.col("exact_custs")
        ).alias("within_bounds"),
    )


@query(
    "q53_csv_roundtrip",
    """
    SELECT lang, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="CSV connector round-trip: documents written to CSV (quoted, "
    "multiline-safe) and read back schema-explicit, then aggregated — "
    "result must equal the same aggregate over the parquet original; "
    "sources/io.py.",
)
def q53_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.sources import io as IO

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="tyto_csv_")
    try:
        path = f"{tmp}/docs.csv"
        IO.write_table(docs, path, "csv")
        back = IO.read_table(spark, path, "csv", schema=docs.schema)
        out = back.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q54_container_source",
    """
    SELECT source, cast(count(*) as bigint) AS n_docs,
           cast(sum(n_chars) as bigint) AS total_chars
    FROM documents WHERE doc_id < 300 GROUP BY source
    """,
    doc="Fixed-width binary container source AND sink (the reference's "
    "storage model, layout re-specified — src/container.rs:435-520): "
    "documents written DISTRIBUTED as per-partition TYSP shards (only "
    "the shard manifest reaches the driver), read back distributed via "
    "binaryFile + vectorized mapInPandas parse, aggregated; "
    "sources/tyto_container.py write_containers/read_containers.",
)
def q54_container_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.sources import tyto_container as TC

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    cols = [
        ("doc_id", TC.BIGINT),
        ("source", TC.string_code(100)),
        ("n_chars", TC.BIGINT),
    ]
    tmp = tempfile.mkdtemp(prefix="tyto_cont_")
    try:
        # distributed write: 4 partitions → 4 shard files, no rows on
        # the driver (only the shard manifest comes back)
        manifest = TC.write_containers(
            docs.select("doc_id", "source", "n_chars").repartition(4),
            tmp,
            cols,
        )
        assert manifest.count() > 1, "expected multiple shards"
        back = TC.read_containers(spark, f"{tmp}/*.tysp", cols)
        out = back.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        collected = out.collect()
        return spark.createDataFrame(collected, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q51_grouped_rank",
    """
    SELECT user_id, event_id, value,
           rank() OVER (PARTITION BY user_id ORDER BY value DESC) AS value_rank
    FROM events
    """,
    doc="Grouped-map Python UDF (applyInPandas): per-user event ranking "
    "computed inside pandas with Arrow transfer; one shuffle on the "
    "group key. Oracle is the equivalent SQL window (pandas "
    "rank(method='min') == SQL RANK tie semantics); "
    "functions/python_udfs.py grouped_value_rank.",
)
def q51_grouped_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.functions.python_udfs import grouped_value_rank

    return grouped_value_rank(_t(spark, sf_dir, "events"))


@query(
    "q52_udtf_terms",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id < 200)
    SELECT doc_id, cast(x.pos as int) AS pos, x.token AS token
    FROM (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)+1),
                                   i -> struct_pack(pos := i-1, token := t[i]))) AS x
      FROM toks
    )
    """,
    doc="Python UDTF (table function) in a LATERAL join: per-document "
    "(pos, token) expansion with arbitrary Python in eval(); "
    "functions/python_udfs.py doc_terms. Oracle reproduces the "
    "expansion with unnest over token positions.",
)
def q52_udtf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.functions.python_udfs import doc_terms

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return doc_terms(spark, docs)


@query(
    "q55_bucketed_join",
    """
    SELECT c_mktsegment, cast(count(*) as bigint) AS n_orders,
           cast(sum(cast(o_totalprice as DECIMAL(18,2))) as double)
             AS segment_value
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Bucketed co-located join: both sides written bucketed on the "
    "join key (hash layout recorded in the catalog), so the join AND "
    "the downstream per-key aggregate run with zero Exchange — the "
    "100 TB fact-fact join strategy (pay the shuffle once at write "
    "time); storage/bucketing.py, plan asserted in tests/"
    "test_bucketing.py.",
)
def q55_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.storage.bucketing import bucketed_join, write_bucketed

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    write_bucketed(orders, "q55_orders", "o_custkey", 8)
    write_bucketed(customer, "q55_customer", "c_custkey", 8)
    try:
        joined = bucketed_join(
            spark,
            "q55_orders",
            "q55_customer",
            spark.table("q55_orders")["o_custkey"]
            == spark.table("q55_customer")["c_custkey"],
        )
        out = joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC))
            .cast("double")
            .alias("segment_value"),
        )
        rows = out.collect()  # materialize before the tables are dropped
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.sql("DROP TABLE IF EXISTS q55_orders")
        spark.sql("DROP TABLE IF EXISTS q55_customer")


@query(
    "q56_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority,
           cast(count(*) as bigint) AS n_orders,
           cast(sum(cast(o_totalprice as DECIMAL(18,2))) as double)
             AS total_value
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    """,
    doc="GROUPING SETS aggregation (the general form of q28 rollup / "
    "q29 cube): three groupings in ONE pass — Spark expands the sets "
    "map-side and aggregates once, instead of three scans + union.",
)
def q56_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q56_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n_orders,
               cast(sum(cast(o_totalprice as DECIMAL(18,2))) as double)
                 AS total_value
        FROM q56_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        """
    )


@query(
    "q58_salted_skew_join",
    f"""
    SELECT d.descr AS flag_descr,
           cast(count(*) as bigint) AS n_items,
           cast(sum(cast(l_extendedprice as {DEC}) * (1 - cast(l_discount as {DEC}))) as double) AS revenue
    FROM lineitem l
    JOIN (VALUES ('R', 'returned'), ('A', 'accepted'), ('N', 'none'))
         AS d(flag, descr)
      ON l.l_returnflag = d.flag
    GROUP BY 1
    """,
    doc="Salt-replicated skew join (operators/joins.py salted_join): "
    "l_returnflag has 3 distinct values, so a plain shuffle join lands "
    "~1/3 of a 100 TB fact table on THREE reducers; salting spreads each "
    "hot key over `salt` tasks while dim replication stays |dim|×salt. "
    "Result provably equals the plain join, which is what the oracle "
    "checks.",
)
def q58_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "l_returnflag string, descr string",
    )
    return (
        salted_join(li, dim, "l_returnflag", salt=16)
        .groupBy(F.col("descr").alias("flag_descr"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(
                F.col("l_extendedprice").cast(DEC) * (1 - F.col("l_discount").cast(DEC))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "q59_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 2) AS median_qty,
           round(quantile_cont(l_quantity, 0.9), 2) AS p90_qty,
           round(quantile_cont(l_quantity, 0.99), 2) AS p99_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact grouped percentiles (median/p90/p99) via Spark's sort-"
    "based `percentile` — partial sketches merge map-side, one shuffle "
    "of per-group state, no full sort of the fact table. Computed on "
    "l_quantity (integral doubles) so linear interpolation is exact in "
    "binary floating point and hash-comparable across engines.",
)
def q59_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 2).alias("median_qty"),
        F.round(F.percentile("l_quantity", 0.9), 2).alias("p90_qty"),
        F.round(F.percentile("l_quantity", 0.99), 2).alias("p99_qty"),
    )


@query(
    "q60_pivot",
    f"""
    SELECT n_name,
           cast(sum(cast(o_totalprice as {DEC})) FILTER (WHERE o_orderstatus = 'O') as double) AS "O",
           cast(sum(cast(o_totalprice as {DEC})) FILTER (WHERE o_orderstatus = 'F') as double) AS "F",
           cast(sum(cast(o_totalprice as {DEC})) FILTER (WHERE o_orderstatus = 'P') as double) AS "P"
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="Pivot (order value by nation × order status). Explicit pivot "
    "value list ['O','F','P'] keeps the plan one-pass (no extra job to "
    "discover values) and fixes the output schema — on 100 TB an "
    "unlisted pivot would scan twice. Compiles to a single hash "
    "aggregate with conditional sums, exactly the oracle's FILTER form.",
)
def q60_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("double"))
    )


@query(
    "q61_full_outer_join",
    f"""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_name AS c_name,
           o.n_orders AS n_orders,
           o.big_spend AS big_spend
    FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
    FULL JOIN (SELECT o_custkey,
                      cast(count(*) as bigint) AS n_orders,
                      cast(sum(cast(o_totalprice as {DEC})) as double) AS big_spend
               FROM orders WHERE o_totalprice > 150000
               GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    doc="Full outer join with unmatched rows on BOTH sides (rich "
    "customers without big orders; big orders from non-rich customers). "
    "Null-safe coalesced key; aggregate-before-join keeps the shuffled "
    "right side one-row-per-customer instead of one-per-order.",
)
def q61_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey", "c_name")
    )
    ords = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("big_spend"),
        )
    )
    joined = cust.join(ords, cust.c_custkey == ords.o_custkey, "full_outer")
    return joined.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_name",
        "n_orders",
        "big_spend",
    )


@query(
    "q62_tfidf",
    r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, cast(count(*) as bigint) AS tf
           FROM toks GROUP BY 1, 2),
    dfq AS (SELECT term, cast(count(*) as bigint) AS df FROM tf GROUP BY 1),
    tot AS (SELECT cast(count(*) as bigint) AS n_docs FROM documents),
    scored AS (
      SELECT doc_id, term, tf,
             round(tf * ln(cast(n_docs as double) / cast(df as double)), 6)
               AS tfidf
      FROM tf JOIN dfq USING (term) CROSS JOIN tot
    )
    SELECT doc_id, term, tf, tfidf, rank FROM (
      SELECT *, cast(row_number() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term) as int) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
    doc="TF-IDF top-3 terms per document (SURVEY §7 step 5). Whole plan "
    "is built-in expressions: tokenize → (doc,term) count → vocab-sized "
    "document-frequency join → in-plan broadcast of the corpus-count "
    "scalar (no driver round-trip) → per-doc top-k window. The df join "
    "keys on term, the same key the tf aggregation just shuffled on, so "
    "no extra exchange of the big side.",
)
def q62_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    toks = spread(docs, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
                6,
            ),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "tfidf", "rank")
    )


@query(
    "q63_correlated_subquery",
    f"""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders o
    WHERE cast(o_totalprice as {DEC})
          * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
          > 1.5 * (SELECT sum(cast(o_totalprice as {DEC}))
                   FROM orders i WHERE i.o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subqueries (orders 1.5× above their "
    "customer's average): Catalyst decorrelates both into ONE "
    "aggregate + join — .explain shows a single shuffle on o_custkey, "
    "not a per-row re-scan (which at 100 TB would be O(n²) I/O). The "
    "avg comparison is expressed count×price > 1.5×sum so every "
    "operand stays decimal-exact across engines.",
)
def q63_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("q63_orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM q63_orders o
        WHERE cast(o_totalprice as {DEC})
              * (SELECT count(*) FROM q63_orders i
                 WHERE i.o_custkey = o.o_custkey)
              > 1.5 * (SELECT sum(cast(o_totalprice as {DEC}))
                       FROM q63_orders i WHERE i.o_custkey = o.o_custkey)
        """
    )


@query(
    "q64_event_gaps",
    """
    WITH g AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS gap_us
      FROM events
    )
    SELECT user_id,
           cast(count(*) as bigint) AS n_events,
           cast(max(gap_us) as bigint) AS max_gap_us,
           cast(sum(gap_us) as bigint) AS sum_gap_us
    FROM g GROUP BY user_id
    """,
    doc="lag()-based inter-event gap analysis per user: one shuffle on "
    "user_id serves BOTH the window and the downstream aggregate (same "
    "key → Catalyst reuses the partitioning, .explain shows a single "
    "exchange). Gaps are exact integer microseconds; ordering uses "
    "µs-truncated epoch + event_id so both engines sort identically "
    "despite DuckDB seeing the parquet's nanosecond precision.",
)
def q64_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    g = e.withColumn(
        "gap_us", F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    )
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("gap_us").alias("max_gap_us"),
        F.sum("gap_us").alias("sum_gap_us"),
    )


@query(
    "q65_ntile_deciles",
    """
    SELECT c_custkey, c_nationkey,
           cast(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) as int)
             AS balance_quartile
    FROM customer
    """,
    doc="Partitioned ntile() quartiles of customer balance WITHIN each "
    "nation — the scale-sane form: a global ntile would force one "
    "sorted partition (driver-sized), per-nation ntile shuffles once on "
    "nationkey and sorts locally. Unique (acctbal, custkey) ordering "
    "makes bucket boundaries deterministic across engines.",
)
def q65_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


@query(
    "q66_stream_stream_join",
    """
    SELECT s.user_id AS user_id,
           epoch_us(s.ts) AS signup_us,
           epoch_us(e.ts) AS error_us
    FROM events s JOIN events e
      ON s.user_id = e.user_id
     AND epoch_us(e.ts) >= epoch_us(s.ts)
     AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
    WHERE s.event_type = 'signup' AND e.event_type = 'error'
    """,
    doc="Stream-stream inner join (errors within 1 h of a signup, per "
    "user) run as a REAL streaming job: two watermarked readStreams, "
    "event-time range constraint bounding the join state (without it "
    "stream-stream state grows without limit), availableNow drain. The "
    "oracle compares at microsecond precision on both engines "
    "(streaming/pipeline.py).",
)
def q66_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_stream_join

    return stream_stream_join(spark, _t(spark, sf_dir, "events"))


@query(
    "q67_stream_dedup",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="Streaming deduplication via dropDuplicatesWithinWatermark — "
    "first occurrence per (user, event_type); state is one entry per "
    "live key and is expired by the watermark, so it runs unbounded. "
    "Key-only projection makes the drained output deterministic "
    "(= batch DISTINCT, which is the oracle).",
)
def q67_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_dedup_keys

    return stream_dedup_keys(spark, _t(spark, sf_dir, "events"))


@query(
    "q68_stratified_sample",
    """
    SELECT doc_id, lang, cast(rn as int) AS rn FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(cast(doc_id as varchar)), doc_id)
               AS rn
      FROM documents
    ) WHERE rn <= 50
    """,
    doc="Deterministic stratified sampling: n-per-stratum by md5(id) "
    "order — a seeded sample both engines reproduce bit-for-bit "
    "(`TABLESAMPLE`/`sample()` RNGs don't cross engines). One shuffle "
    "on the stratum key; per-stratum top-n via the same two-phase "
    "window as top-k, so no stratum ever sorts more than its own rows. "
    "The training-data use: balanced per-language corpus draws.",
)
def q68_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 50)
    )


@query(
    "q69_dataset_split",
    """
    WITH h AS (
      SELECT doc_id,
             (strpos('0123456789abcdef',
                     substr(md5(cast(doc_id as varchar)), 31, 1)) - 1) * 16
             + strpos('0123456789abcdef',
                      substr(md5(cast(doc_id as varchar)), 32, 1)) - 1
               AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 204 THEN 'train'
                WHEN bucket < 230 THEN 'val'
                ELSE 'test' END AS split,
           cast(count(*) as bigint) AS n_docs,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM h GROUP BY 1
    """,
    doc="Hash-based train/val/test split (~80/10/10): bucket = last md5 "
    "byte of the id — deterministic, engine-portable (hex-digit lookup, "
    "no engine RNG), stable under reshuffling and incremental ingest "
    "(a doc's split never depends on other docs). Map-only until the "
    "tiny count aggregate.",
)
def q69_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hexd = "0123456789abcdef"
    md5 = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.instr(F.lit(hexd), F.substring(md5, 31, 1)) - 1) * 16 + (
        F.instr(F.lit(hexd), F.substring(md5, 32, 1)) - 1
    )
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


def _q70_oracle() -> str:
    return rf"""
    WITH lang AS ({_q46_oracle()}),
         qual AS ({_q47_oracle()}),
         ck AS (SELECT doc_id,
                       md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                         AS k
                FROM documents),
         surv AS (SELECT min(doc_id) AS keep_id FROM ck GROUP BY k)
    SELECT l.doc_id AS doc_id, l.lang_pred AS lang_pred, q.quality AS quality
    FROM lang l JOIN qual q ON l.doc_id = q.doc_id
    WHERE l.lang_pred = 'en' AND q.quality >= 0.5
      AND l.doc_id IN (SELECT keep_id FROM surv)
    """


@query(
    "q70_corpus_clean",
    None,  # oracle composed below from the q46/q47 oracle CTEs
    doc="The composed C4-style cleaning pipeline: language-ID gate "
    "(en) + quality-score gate (≥0.5) + exact-dedup survivorship, in "
    "ONE declarative plan — Catalyst fuses the three gates into a "
    "single scan of documents plus one content-hash shuffle for "
    "survivorship (the per-doc gates are map-side; .explain shows no "
    "extra exchange for them). This is the shape a 100 TB pretraining "
    "clean runs as.",
)
def q70_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import exact_dedup_groups
    from tytodb_spark.operators.textual import lang_id, quality_score

    docs = _t(spark, sf_dir, "documents")
    survivors = exact_dedup_groups(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    gated = docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        quality_score(F.col("text")).alias("quality"),
    ).filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    return gated.join(survivors, "doc_id", "left_semi")


REGISTRY["q70_corpus_clean"] = QueryDef(
    fn=REGISTRY["q70_corpus_clean"].fn,
    oracle=_q70_oracle(),
    doc=REGISTRY["q70_corpus_clean"].doc,
)


def _q71_oracle() -> str:
    pairs_sql = REGISTRY["q41_jaccard_pairs"].oracle
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id, least(a, min(b)) AS cluster_id
    FROM reach GROUP BY a
    """


@query(
    "q71_near_dup_clusters",
    None,  # oracle composed below (recursive closure over the q41 pairs)
    doc="Near-dup CLUSTERING: pair finding alone can't dedup (A~B, B~C "
    "must collapse {A,B,C} even when A≁C) — MinHash-LSH pairs (the "
    "100 TB candidate path, exact-verified) feed connected components "
    "via iterative min-label propagation: one shuffle round per "
    "iteration (graph diameter ≈ a handful for near-dup clusters), "
    "driver sees only a convergence flag, lineage cut per round with "
    "localCheckpoint. The MapReduce-CC construction that web-scale "
    "dedup (large-star/small-star) refines. Oracle: DuckDB recursive-"
    "CTE transitive closure over the exact-Jaccard pair set, which the "
    "verified LSH pairs equal at r=4/b=16, t=0.5 (miss prob ≤3e-8); "
    "operators/dedup.py connected_components.",
)
def q71_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import near_dup_clusters

    return near_dup_clusters(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5
    )


REGISTRY["q71_near_dup_clusters"] = QueryDef(
    fn=REGISTRY["q71_near_dup_clusters"].fn,
    oracle=_q71_oracle(),
    doc=REGISTRY["q71_near_dup_clusters"].doc,
)


def _q72_oracle() -> str:
    pairs_sql = REGISTRY["q41_jaccard_pairs"].oracle
    return f"""
    WITH RECURSIVE pairs AS ({pairs_sql}),
    edges AS (SELECT id_a AS a, id_b AS b FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    dropped AS (
        SELECT a AS doc_id FROM reach GROUP BY a
        HAVING least(a, min(b)) <> a
    )
    SELECT d.doc_id FROM documents d
    LEFT JOIN dropped x ON d.doc_id = x.doc_id
    WHERE x.doc_id IS NULL
    """


@query(
    "q72_dedup_canonical",
    None,  # oracle composed below (recursive closure over the q41 pairs)
    doc="End-to-end corpus DEDUP: keep one canonical document per "
    "near-dup cluster (the min doc id) plus every singleton. Clusters "
    "come from q71's LSH→verify→connected-components path; the kept "
    "set is `corpus ANTI JOIN {docs whose cluster_id != doc_id}`. At "
    "100 TB the dropped set is a small fraction of the corpus, so the "
    "anti join broadcasts (AQE converts it at runtime from the "
    "cluster-side size estimate) — the full corpus is never shuffled. "
    "Oracle: recursive-CTE closure minus non-canonical members.",
)
def q72_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import near_dup_clusters

    docs = _t(spark, sf_dir, "documents")
    clusters = near_dup_clusters(docs, "doc_id", "text", n=3, threshold=0.5)
    dropped = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
        "doc_id"
    )
    return docs.select("doc_id").join(dropped, "doc_id", "left_anti")


REGISTRY["q72_dedup_canonical"] = QueryDef(
    fn=REGISTRY["q72_dedup_canonical"].fn,
    oracle=_q72_oracle(),
    doc=REGISTRY["q72_dedup_canonical"].doc,
)


@query(
    "q73_top_terms",
    """
    WITH toks AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
    )
    SELECT term, cast(count(*) AS bigint) AS n
    FROM toks WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 20
    """,
    doc="Corpus-wide top-k frequent terms (the word-count of LLM corpus "
    "statistics): explode whitespace tokens, count, take the global top "
    "20. Scale shape: the explode is map-side only; the count is a "
    "partial-agg shuffle on term (map-side combine collapses the heavy "
    "head before the exchange); the final top-k is TakeOrderedAndProject "
    "over 32 partial top-k's — no global sort of the term dictionary. "
    "Ties broken by term so the limit is deterministic.",
)
def q73_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "term")
        .limit(20)
    )


@query(
    "q74_range_frame_window",
    f"""
    SELECT o_custkey, o_orderkey, day,
           cast(cast(sum(cast(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY day
               RANGE BETWEEN 29 PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS DOUBLE) AS spend_30d
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               cast(datediff('day', TIMESTAMP '1992-01-01 00:00:00',
                             o_orderdate) AS bigint) AS day
        FROM orders
    )
    """,
    doc="RANGE-frame window (value-based frame, not row-based): per "
    "customer, 30-day rolling spend ordered by order day. RANGE frames "
    "include all peers of the boundary values, so the result is "
    "deterministic under ties without a unique sort key. One shuffle on "
    "o_custkey; the frame scan is a single ordered pass per partition "
    "(Spark WindowExec keeps a sliding aggregate — no O(n·frame) "
    "recompute). DECIMAL accumulator keeps the rolling sum "
    "order-independent bit-exact vs the oracle.",
)
def q74_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date")).cast(
        "bigint"
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("day")
        .rangeBetween(-29, W.currentRow)
    )
    return orders.withColumn("day", day).select(
        "o_custkey",
        "o_orderkey",
        "day",
        F.sum(F.col("o_totalprice").cast(DEC))
        .over(w)
        .cast(DEC)
        .cast("double")
        .alias("spend_30d"),
    )


@query(
    "q75_json_roundtrip",
    f"""
    SELECT event_type, cast(count(*) AS bigint) AS n_events,
           cast(cast(sum(cast(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="JSON source/sink roundtrip (sources/io.py): events written as "
    "line-delimited JSON (the interchange format of most LLM corpus "
    "pipelines), read back with an explicit schema (no inference pass "
    "at scale — schema-on-read is a full extra scan on 100 TB), then "
    "aggregated. Oracle computes the same aggregate from the original "
    "parquet — the assertion is that the JSON hop is lossless for the "
    "grouped measures. Doubles survive via Jackson shortest-roundtrip "
    "encoding; the DECIMAL accumulator removes summation-order variance.",
)
def q75_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.sources import io as IO

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="tyto_json_")
    try:
        path = f"{tmp}/events.json"
        IO.write_table(ev, path, "json")
        back = IO.read_table(spark, path, "json", schema=ev.schema)
        out = back.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).cast("double").alias(
                "total_value"
            ),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q76_time_rollup",
    f"""
    WITH hourly AS (
        SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS day,
               date_trunc('hour', ts) AS hour,
               cast(count(*) AS bigint) AS n_events,
               cast(sum(cast(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
        FROM events GROUP BY 1, 2
    )
    SELECT day, hour, 'hour' AS grain, n_events,
           cast(v AS DOUBLE) AS total_value
    FROM hourly
    UNION ALL
    SELECT day, cast(NULL AS TIMESTAMP) AS hour, 'day' AS grain,
           cast(sum(n_events) AS bigint) AS n_events,
           cast(cast(sum(v) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
    FROM hourly GROUP BY day
    """,
    doc="Hypertable-style multi-granularity time rollup (continuous-"
    "aggregate cascade): bucket events to the hour, then derive the "
    "daily rollup FROM THE HOURLY PARTIALS rather than rescanning the "
    "raw table — at 100 TB the raw scan happens once and the coarser "
    "grain aggregates ~3 orders of magnitude fewer rows. The hourly "
    "aggregate shuffles on (day, hour); the day re-aggregate reuses "
    "that tiny intermediate (cached here; a real deployment would "
    "persist it as the continuous-aggregate table).",
)
def q76_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("day", "ts").alias("day"),
            F.date_trunc("hour", "ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast(DEC).alias("v"),
        )
        .cache()  # partials reused by the coarser grain
    )
    hour_grain = hourly.select(
        "day",
        "hour",
        F.lit("hour").alias("grain"),
        "n_events",
        F.col("v").cast("double").alias("total_value"),
    )
    day_grain = hourly.groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("v").cast(DEC).alias("v"),
    ).select(
        "day",
        F.lit(None).cast("timestamp").alias("hour"),
        F.lit("day").alias("grain"),
        "n_events",
        F.col("v").cast("double").alias("total_value"),
    )
    return hour_grain.unionByName(day_grain)


@query(
    "q77_partition_pruning",
    f"""
    SELECT event_type, cast(count(*) AS bigint) AS n_events,
           cast(cast(sum(cast(value AS DECIMAL(18,2))) AS DECIMAL(18,2))
                AS DOUBLE) AS total_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY event_type
    """,
    doc="Hive-partitioned layout + partition pruning "
    "(storage/layout.py write_partitioned): events rewritten "
    "partitionBy(event_type), then read with a partition filter. The "
    "filter resolves at file-listing time — pruned partitions' files "
    "are never opened (PartitionFilters in the scan node, asserted in "
    "tests/test_layout.py). At 100 TB this turns a cluster-wide scan "
    "into a directory listing; the reference's single first-column "
    "range index (src/indexing.rs:33-40) has no analogue for "
    "categorical columns. Oracle computes the same aggregate over the "
    "unpartitioned source — the layout hop must be lossless.",
)
def q77_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.storage.layout import write_partitioned

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="tyto_part_")
    try:
        path = f"{tmp}/events_by_type"
        write_partitioned(ev, path, ["event_type"])
        back = spark.read.parquet(path)
        out = (
            back.filter(F.col("event_type").isin("click", "purchase"))
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast(DEC)).cast(DEC).cast("double").alias(
                    "total_value"
                ),
            )
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q78_zorder_box",
    """
    SELECT cast(count(*) AS bigint) AS n_rows,
           cast(cast(sum(cast(l_extendedprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_orderkey BETWEEN 1000 AND 2000
      AND l_partkey BETWEEN 200 AND 400
    """,
    doc="Z-order clustered layout (storage/layout.py write_zordered): "
    "lineitem rewritten clustered on the Morton interleave of "
    "(l_orderkey, l_partkey), then a 2-D box predicate aggregates over "
    "it. Every file covers a small 2-D box of the key space, so "
    "parquet min/max stats prune BOTH dimensions — the multi-column "
    "generalization of the reference's first-column-only range index "
    "(src/indexing.rs:215-309). tests/test_layout.py asserts the "
    "pruning advantage from the footers; this query asserts the "
    "layout is value-lossless vs the oracle on the unclustered source.",
)
def q78_zorder_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.storage.layout import write_zordered

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    tmp = tempfile.mkdtemp(prefix="tyto_zord_")
    try:
        path = f"{tmp}/lineitem_z"
        write_zordered(li, path, ["l_orderkey", "l_partkey"])
        back = spark.read.parquet(path)
        out = back.filter(
            F.col("l_orderkey").between(1000, 2000)
            & F.col("l_partkey").between(200, 400)
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast(DEC)).cast(DEC).cast("double").alias(
                "revenue"
            ),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q79_label_centroids",
    """
    WITH e AS (
        SELECT label,
               cast(generate_subscripts(embedding, 1) - 1 AS int) AS pos,
               cast(trunc(cast(unnest(embedding) AS DOUBLE) * 1e7) AS bigint)
                 AS q
        FROM embeddings
    )
    SELECT label, pos,
           cast(sum(q) AS DOUBLE) / count(*) / 1e7 AS c
    FROM e GROUP BY label, pos
    """,
    doc="Distributed vector mean (per-label embedding centroids — the "
    "aggregation primitive of k-means, IVF training, and class "
    "prototypes): posexplode the vectors and aggregate per (label, "
    "dimension). Scale shape: the explode is map-side; the single "
    "shuffle key (label, pos) spreads every vector dimension across "
    "the cluster, so one hot label cannot skew a reducer the way a "
    "whole-vector groupBy(label) would — partial aggregation collapses "
    "dim-partials before the exchange. Components are quantized to "
    "1e-7 by truncation (the header's trunc convention — double→"
    "decimal casts tie-break differently across engines), so the "
    "bigint sum is exact and order-independent and the trailing "
    "double divisions are IEEE-deterministic in both engines.",
)
def q79_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    q = (F.col("v").cast("double") * F.lit(1e7)).cast("bigint")  # trunc
    return (
        e.select("label", "pos", q.alias("q"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum("q").cast("double") / F.count(F.lit(1)) / F.lit(1e7)
            ).alias("c")
        )
    )


@query(
    "q80_pandas_udaf_median",
    """
    SELECT l_returnflag, l_linestatus,
           median(l_quantity) AS med_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    doc="Grouped-aggregate pandas UDF (UDAF surface — completes the "
    "Python extension triad with q51's grouped-map and q52's UDTF): "
    "per-(returnflag, linestatus) median quantity computed in pandas "
    "over Arrow group batches. One shuffle on the group key; no "
    "partial aggregation is possible for a holistic aggregate, which "
    "is exactly when a UDAF is worth its Python cost — the built-in "
    "twin is the oracle's median(). Exact on the integer-valued "
    "quantity domain (interpolation yields halves in both engines).",
)
def q80_pandas_udaf_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.functions.python_udfs import make_median_udaf

    med = make_median_udaf()
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        med("l_quantity").alias("med_qty")
    )


def _KMEANS_ORACLE(k: int = 8, iters: int = 3, dim: int = 64, q: int = 6) -> str:
    """DuckDB replay of the quantized fixed-iteration Lloyd's loop
    (operators/similarity.py kmeans_lloyd): same init (first k vectors
    by id), same argmin tie-break (lowest cluster), same half-up
    floor(x*10^q+0.5)/10^q centroid update — quantization makes the
    iteration bit-stable across engines, so even an ITERATIVE algorithm
    is hash-checkable."""

    def dist(e: str, c: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {dim + 1}), i -> "
            f"({e}.v[i] - {c}.v[i]) * ({e}.v[i] - {c}.v[i])), "
            "(x, y) -> x + y)"
        )

    def assign_cte(t: int) -> str:
        return f"""
    a{t} AS (SELECT vec_id, cluster FROM (
        SELECT e.vec_id, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {dist('e', 'c')}, c.cluster) AS rn
        FROM e CROSS JOIN c{t} c) WHERE rn = 1)"""

    # floor(x*10^q + 0.5)/10^q — the same explicit half-up rule the Spark
    # side applies (similarity.py kmeans_lloyd), immune to the SQL-vs-
    # Python rounding-mode split and to ulp boundary sensitivity.
    avgs = ", ".join(
        f"floor(avg(e.v[{i + 1}]) * 1e{q} + 0.5) / 1e{q} AS d{i}"
        for i in range(dim)
    )
    newvec = "[" + ", ".join(f"u.d{i}" for i in range(dim)) + "]"
    ctes = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v"
        " FROM embeddings)",
        f"c0 AS (SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cluster, v"
        f" FROM e ORDER BY vec_id LIMIT {k})",
    ]
    for t in range(iters):
        ctes.append(assign_cte(t))
        ctes.append(
            f"""
    u{t} AS (SELECT a{t}.cluster, {avgs}
             FROM a{t} JOIN e USING (vec_id) GROUP BY a{t}.cluster)"""
        )
        ctes.append(
            f"""
    c{t + 1} AS (SELECT c{t}.cluster,
                 CASE WHEN u.cluster IS NULL THEN c{t}.v ELSE {newvec} END AS v
                 FROM c{t} LEFT JOIN u{t} u USING (cluster))"""
        )
    ctes.append(assign_cte(iters))
    joined = ",\n".join(ctes)
    return f"""
    WITH {joined}
    SELECT cast(cluster AS INTEGER) AS cluster, cast(count(*) AS BIGINT) AS n
    FROM a{iters} GROUP BY cluster
    """


@query(
    "q81_kmeans_clusters",
    _KMEANS_ORACLE(),
    doc="Fully-distributed Lloyd's k-means over the embeddings (3 "
    "iterations, k=8): assignment is map-side argmin over inlined "
    "centroid literals (no shuffle, no UDF); the update step is ONE "
    "k-group aggregation with a sum per dimension — map-side partial "
    "aggregation means the shuffle carries k×(dim+1) partials per "
    "partition, not N×dim exploded rows; k×dim floats to the driver "
    "per iteration. Deterministic init (first k vectors by id); "
    "centroids quantized to 6 decimals per iteration so summation "
    "order can't leak into assignments — which makes the whole "
    "iterative run replayable in DuckDB (the oracle runs the same "
    "quantized iterations as chained CTEs). Output: cluster sizes; "
    "operators/similarity.py kmeans_lloyd.",
)
def q81_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import kmeans_lloyd

    emb = _t(spark, sf_dir, "embeddings")
    assigned = kmeans_lloyd(emb, "vec_id", "embedding", k=8, iters=3)
    return assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q82_funnel",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS t FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t
        GROUP BY e.user_id
    )
    SELECT cast((SELECT count(*) FROM v) AS bigint) AS n_view,
           cast((SELECT count(*) FROM c) AS bigint) AS n_view_click,
           cast((SELECT count(*) FROM p) AS bigint) AS n_view_click_purchase
    """,
    doc="Ordered funnel analysis (view → click → purchase, strictly "
    "increasing event time): per-user first-view, first qualifying "
    "click after it, first purchase after that; one row of stage "
    "counts. Scale shape: three user-keyed aggregates that all share "
    "the user_id partitioning — the stage joins land on co-partitioned "
    "intermediates (no extra exchange under AQE), and each stage's "
    "input shrinks monotonically (classic funnel pruning).",
)
def q82_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_v"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_v"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_c"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_c"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_p"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "q83_cohort_retention",
    """
    WITH activity AS (
        SELECT user_id, cast(date_trunc('day', ts) AS TIMESTAMP) AS day
        FROM events GROUP BY user_id, cast(date_trunc('day', ts) AS TIMESTAMP)
    ),
    cohorts AS (
        SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           cast(datediff('day', c.cohort_day, a.day) AS int) AS day_offset,
           cast(count(*) AS bigint) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, day_offset
    """,
    doc="Cohort retention: users grouped by first-active day, counted "
    "per (cohort, day-offset) — the activity matrix behind retention "
    "curves. Scale shape: the per-user distinct-day set and the "
    "first-day aggregate share one user_id partitioning; the cohort "
    "join is co-partitioned (no extra exchange), and only the final "
    "small (cohort, offset) aggregate reshuffles. count(*) over the "
    "deduplicated (user, day) activity = distinct active users.",
)
def q83_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    activity = (
        ev.select("user_id", F.date_trunc("day", "ts").alias("day")).distinct()
    )
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).cast("int").alias(
                "day_offset"
            ),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "q84_sequence_packing",
    """
    WITH toks AS (
        SELECT doc_id, cast(doc_id % 8 AS bigint) AS part,
               cast(len(list_filter(string_split_regex(lower(trim(text)),
                    '\\s+'), t -> t <> '')) AS bigint) AS n_tok
        FROM documents
    ),
    packed AS (
        SELECT part, n_tok,
               cast(floor(coalesce(sum(n_tok) OVER (
                   PARTITION BY part ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / 512) AS bigint) AS seq_id
        FROM toks
    )
    SELECT part, seq_id, cast(count(*) AS bigint) AS n_docs,
           cast(sum(n_tok) AS bigint) AS total_tokens
    FROM packed GROUP BY part, seq_id
    """,
    doc="Training-sequence packing (concat-and-chunk): documents are "
    "packed greedily into ~512-token sequences by cumulative token "
    "count. Packing is order-sequential by nature, so the scale design "
    "shards first — docs are bucketed by a deterministic key (doc_id "
    "% 8; a real pipeline uses pmod(hash(id), num_shards)) and each "
    "shard packs independently under its own running-sum window. One "
    "shuffle on the shard key, full parallelism across shards — never "
    "a single global ordering (the single-partition window "
    "anti-pattern). Output: docs and token totals per packed sequence.",
)
def q84_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import token_count

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).cast("bigint").alias("part"),
        token_count("text").cast("bigint").alias("n_tok"),
    )
    w = (
        W.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    packed = toks.select(
        "part",
        "n_tok",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / 512)
        .cast("bigint")
        .alias("seq_id"),
    )
    return packed.groupBy("part", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
    )


@query(
    "q85_latest_per_key",
    """
    SELECT user_id, event_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC
    ) = 1
    """,
    doc="Latest-row-per-key (the CDC/snapshot-compaction primitive: "
    "collapse a change stream to each key's newest record): "
    "row_number over (user, ts desc) = 1. One shuffle on the key; ties "
    "broken by the unique event_id so the survivor is deterministic. "
    "At scale this is the standard merge-on-read compaction step — "
    "same plan shape whether the input is a table or a stream's "
    "foreachBatch output.",
)
def q85_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@query(
    "q86_theta_join",
    """
    SELECT s.s_suppkey,
           cast(count(*) AS bigint) AS n_outranked
    FROM supplier s JOIN customer c ON s.s_acctbal < c.c_acctbal
    GROUP BY s.s_suppkey
    """,
    doc="Pure theta (non-equi) join: suppliers × customers on an "
    "inequality with NO equi-key. The correct plan here IS "
    "BroadcastNestedLoopJoin — supplier is dimension-tiny, so it "
    "broadcasts and the 'nested loop' is a per-row comparison against "
    "an in-memory list, never a shuffle. The contrast case is "
    "q37/q58: when BOTH sides are large, theta conditions must be "
    "bucketed or salted into equi-joins first — NL over two fact "
    "tables is the anti-pattern. This query pins the legitimate use.",
)
def q86_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    return (
        F.broadcast(sup.select("s_suppkey", "s_acctbal"))
        .join(cust, F.col("s_acctbal") < F.col("c_acctbal"))
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_outranked"))
    )


@query(
    "q87_hll_sketch_merge",
    """
    SELECT event_type, cast(count(*) as bigint) AS n_events,
           cast(count(DISTINCT user_id) as bigint) AS exact_users,
           TRUE AS within_bounds
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', cast(count(*) as bigint),
           cast(count(DISTINCT user_id) as bigint), TRUE
    FROM events
    """,
    doc="Mergeable HLL sketches (Datasketches via hll_sketch_agg): "
    "per-source sketches of the distinct user population, then a "
    "hll_union_agg rollup to the global estimate WITHOUT rescanning — "
    "the re-aggregatable form of q38's approx_count_distinct. At "
    "100 TB this is how distinct counts compose: sketch once per "
    "partition/day (bytes, not rows), union upward through every "
    "rollup grain. Output: per-source rows plus an 'ALL' row whose "
    "estimate comes only from merging the per-source sketches. "
    "Driver-checkable as a quantified bound (q38 pattern): each row "
    "carries within_bounds = |estimate-exact| ≤ 5%·exact — the merged "
    "row's bound proves union-of-sketches ≈ distinct-of-union.",
)
def q87_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sketches = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    merged = sketches.agg(
        F.hll_union_agg("sk").alias("sk"),
        F.sum("n_events").alias("n_events"),
    ).withColumns(
        {
            "event_type": F.lit("ALL"),
            # exact distinct over the union, for the bound only (the
            # ESTIMATE must come from the sketch merge, and does)
            "exact_users": F.lit(None).cast("long"),
        }
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("__ea"))
    merged = merged.crossJoin(F.broadcast(exact_all)).select(
        "event_type",
        "n_events",
        F.col("__ea").alias("exact_users"),
        F.col("sk").alias("sk"),
    )
    verdict = lambda df: df.select(  # noqa: E731
        "event_type",
        "n_events",
        "exact_users",
        (
            F.abs(F.hll_sketch_estimate("sk") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_bounds"),
    )
    return verdict(sketches.select("event_type", "n_events", "exact_users", "sk")).unionByName(
        verdict(merged)
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_URL = r"https?://[^\s]+"


@query(
    "q88_pii_scrub",
    f"""
    WITH tainted AS (
        SELECT doc_id,
               text || CASE WHEN doc_id % 7 = 0
                   THEN ' contact user' || doc_id ||
                        '@example.com or https://ex.com/d/' || doc_id
                   ELSE '' END AS text
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id, length(text) AS n0,
               regexp_replace(regexp_replace(text,
                   '{_PII_EMAIL.replace("'", "''")}', '<EMAIL>', 'g'),
                   '{_PII_URL}', '<URL>', 'g') AS clean
        FROM tainted
    )
    SELECT doc_id,
           cast(n0 - length(clean) AS bigint) AS chars_removed,
           (length(clean) <> n0) AS was_scrubbed
    FROM scrubbed
    """,
    doc="PII scrubbing (the redaction pass of corpus preparation): "
    "emails and URLs replaced by placeholder tokens via chained "
    "regexp_replace — entirely map-side, no shuffle, whole-stage "
    "codegen'd JVM regex (never a Python UDF: at 100 TB the regex "
    "pass IS the scan). The synthetic corpus is PII-free, so a "
    "deterministic taint step plants an email+URL in every 7th doc "
    "identically in both engines — the differential then checks real "
    "replacements, not just the no-op path. Output reports per-doc "
    "character delta and a scrubbed flag so the pipeline can "
    "quarantine-and-audit rather than silently mutate.",
)
def q88_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tainted = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or https://ex.com/d/"),
                F.col("doc_id").cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    clean = F.regexp_replace(
        F.regexp_replace(tainted, _PII_EMAIL, "<EMAIL>"), _PII_URL, "<URL>"
    )
    return docs.select(
        "doc_id",
        (F.length(tainted) - F.length(clean)).cast("bigint").alias("chars_removed"),
        (F.length(clean) != F.length(tainted)).alias("was_scrubbed"),
    )


@query(
    "q89_multimodal_resize",
    """
    SELECT 'image/raw-rgb' AS mime,
           cast(count(*) as bigint) AS n_items,
           cast(count(*) * 192 as bigint) AS total_bytes
    FROM documents WHERE doc_id < 100
    """,
    doc="Multimodal resize stage (operators/multimodal.py "
    "resize_images): every payload rescaled to a fixed 8×8 RGB frame "
    "via Arrow-batched mapInPandas, metadata updated in the same "
    "(id, payload, meta) contract so resize chains with decode/"
    "feature/frame stages. Codec stubbed deterministically (no PIL in "
    "this container); the Spark-side plumbing — schema, batch shape, "
    "output sizing — is real. Output: per-mime count and total output "
    "bytes of the resized corpus. Driver-checkable because the resize "
    "contract is exact: every output payload is width*height*3 = 192 "
    "bytes of mime image/raw-rgb, so the oracle predicts the rollup "
    "without running the codec — a broken mapInPandas (dropped rows, "
    "wrong sizing, stale meta) breaks the hash match.",
)
def q89_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import resize_images, to_media_table

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    resized = resize_images(to_media_table(docs, "doc_id", "text"), 8, 8)
    return resized.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").alias("total_bytes"),
    )


@query(
    "q90_two_phase_distinct",
    """
    SELECT event_type,
           cast(count(DISTINCT user_id) AS bigint) AS n_users,
           cast(count(*) AS bigint) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="Skew-safe two-phase distinct aggregation, written explicitly: "
    "phase 1 reduces to the distinct (event_type, user_id) pairs "
    "(shuffle spreads a hot event_type across ALL its users' hash "
    "range — no single reducer owns a hot group), phase 2 counts "
    "pairs per type. The total count rides along from phase 1 "
    "partials. This is the manual form of what Spark's planner does "
    "with Expand for count(DISTINCT) — spelled out because at 100 TB "
    "you often need the pair-level intermediate anyway (it IS the "
    "per-user activity table) and reusing it beats re-expanding.",
)
def q90_two_phase_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pairs = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
    )


@query(
    "q91_schema_evolution",
    """
    SELECT o_orderpriority,
           cast(count(*) AS bigint) AS n_orders,
           cast(count(o_channel) AS bigint) AS n_with_channel
    FROM (
        SELECT o_orderkey, o_orderpriority, NULL AS o_channel
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT o_orderkey, o_orderpriority, 'web' AS o_channel
        FROM orders WHERE o_orderkey % 2 = 1
    )
    GROUP BY o_orderpriority
    """,
    doc="Schema evolution on read (mergeSchema): two parquet snapshots "
    "of the same table — an old one without and a new one with an "
    "added o_channel column — read as ONE DataFrame; old files "
    "surface NULL for the new column. The reference cannot do this at "
    "all (fixed header written once, src/database.rs:449-506; no "
    "schema evolution, SURVEY §1.4). Merge cost is footer-only: at "
    "100 TB no data file is rewritten to add a column. Oracle "
    "simulates the merged read with a UNION of the two generations.",
)
def q91_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    orders = _t(spark, sf_dir, "orders")
    tmp = tempfile.mkdtemp(prefix="tyto_evo_")
    try:
        old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderpriority"
        )
        new = orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderpriority", F.lit("web").alias("o_channel")
        )
        old.write.parquet(f"{tmp}/t/gen=0")
        new.write.parquet(f"{tmp}/t/gen=1")
        merged = spark.read.option("mergeSchema", "true").parquet(f"{tmp}/t")
        out = merged.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_channel").alias("n_with_channel"),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_WINNOW_ORACLE = f"""
    WITH g AS (SELECT doc_id, {_NGRAMS(8)} AS grams, text FROM documents),
    k AS (SELECT doc_id,
          CASE WHEN len(grams) > 0
               THEN list_min(list_transform(grams,
                    x -> ('0x' || substr(md5(x), 1, 8))::BIGINT))
               ELSE ('0x' || substr(md5(text), 1, 8))::BIGINT END AS wk
          FROM g)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b
    FROM k a JOIN k b ON a.wk = b.wk AND a.doc_id < b.doc_id
    """


@query(
    "q92_winnow_candidates",
    _WINNOW_ORACLE,
    doc="Winnowed min-window-hash candidate pairs (the MOSS-style "
    "fingerprint, operators/textual.py winnow_key_portable): each "
    "document is keyed by the MIN of its 8-token-window hashes, and "
    "documents sharing a key become near-exact dup candidates. "
    "Cheapest of the candidate generators — one 8-byte key per doc, "
    "ONE shuffle on that key (vs MinHash-LSH's b keys per doc), at "
    "the price of catching only docs that share their minimal window. "
    "The 100 TB pipeline runs this as the first sieve before LSH. "
    "Declared with the md5-gram hash family so DuckDB recomputes "
    "identical keys (hash-checkable); the xxhash64 rolling-hash family "
    "(winnow_key — hashes each token once, no gram materialization) is "
    "the throughput path, exercised in pytest.",
)
def q92_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from tytodb_spark.operators.textual import spread, winnow_key_portable

    # persist the 8-byte keys: both self-join branches reuse them, and
    # (as with shingle_table) the persist is an optimizer barrier that
    # stops the rolling-hash expression from being inlined into each
    # join branch and recomputed over the full corpus twice
    docs = (
        spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
        .select("doc_id", winnow_key_portable("text", 8).alias("wk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = docs.select(F.col("doc_id").alias("id_a"), "wk")
    b = docs.select(F.col("doc_id").alias("id_b"), "wk")
    return (
        a.join(b, "wk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


@query(
    "q93_json_typed_decode",
    """
    SELECT event_type,
           cast(count(k) AS bigint) AS n_parsed,
           cast(min(k) AS int) AS min_k,
           cast(max(k) AS int) AS max_k,
           cast(sum(cast(k AS bigint)) AS bigint) AS sum_k
    FROM (
        SELECT event_type,
               cast(json_extract_string(props, '$.k') AS int) AS k
        FROM events
    )
    GROUP BY event_type
    """,
    doc="Typed semi-structured decode (from_json with an explicit "
    "schema): the props JSON column parsed into a struct in one "
    "map-side pass — no schema-inference scan (on 100 TB, inference "
    "is a full extra read), malformed rows become NULL rather than "
    "failures (counted via count(k)), and the typed field then "
    "aggregates like any column. Contrast q32's get_json_object, "
    "which re-parses per extraction; from_json parses once for any "
    "number of fields.",
)
def q93_json_typed_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    return parsed.groupBy("event_type").agg(
        F.count("p.k").alias("n_parsed"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
        F.sum(F.col("p.k").cast("bigint")).alias("sum_k"),
    )


@query(
    "q94_decontaminate",
    f"""
    WITH bench AS (
        SELECT DISTINCT unnest({_NGRAMS(5)}) AS g
        FROM documents WHERE source = 'src0'
    ),
    tg AS (
        SELECT doc_id, unnest({_NGRAMS(5)}) AS g
        FROM documents WHERE source <> 'src0'
    ),
    bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (g))
    SELECT d.doc_id, d.source, d.lang
    FROM documents d
    WHERE d.source <> 'src0'
      AND d.doc_id NOT IN (SELECT doc_id FROM bad)
    """,
    doc="Benchmark decontamination (eval-leakage removal): training docs "
    "sharing any word 5-gram with the held-out corpus (source='src0') "
    "are dropped via a broadcast n-gram probe + anti-join — the 100 TB "
    "train side never shuffles; operators/textual.py decontaminate.",
)
def q94_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import decontaminate

    docs = _t(spark, sf_dir, "documents")
    clean = decontaminate(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        "doc_id",
        "text",
        n=5,
    )
    return clean.select("doc_id", "source", "lang")


@query(
    "q95_repetition_filter",
    f"""
    WITH g AS (SELECT doc_id, unnest({_NGRAMS(2)}) AS g FROM documents)
    SELECT doc_id,
           1.0 - count(DISTINCT g)::DOUBLE / count(*) AS dup_frac
    FROM g GROUP BY doc_id
    HAVING dup_frac >= 0.05
    """,
    doc="Gopher-style repetition quality gate: per-doc duplicate-bigram "
    "fraction (1 - distinct/total) as one two-phase hash aggregation — "
    "only (id, gram) pairs shuffle, once; docs above the repetition "
    "threshold are the filter candidates; operators/textual.py "
    "duplicate_gram_fraction.",
)
def q95_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import duplicate_gram_fraction

    scored = duplicate_gram_fraction(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=2
    )
    return scored.filter(F.col("dup_frac") >= 0.05)


@query(
    "q96_bm25",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_corpus,
                     cast(cast(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM t
           WHERE w IN ('spark', 'join', 'dup') GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    per AS (
        SELECT tf.doc_id,
               cast(floor(
                   ln((n_corpus - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   * 1e7) AS BIGINT) AS q
        FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w) CROSS JOIN stats
    )
    SELECT doc_id, cast(sum(q) AS BIGINT) / 1e7 AS bm25
    FROM per GROUP BY doc_id
    """,
    doc="Okapi BM25 ranking for a query-term bag over the corpus: one "
    "tokenize pass feeds doc-lengths and (query-term-filtered) term "
    "frequencies; corpus stats and per-term df broadcast; per-term "
    "scores quantized to 1e-7 before the cross-term sum so the result "
    "is order-independent; operators/textual.py bm25_scores.",
)
def q96_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import bm25_scores

    return bm25_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text", ["spark", "join", "dup"]
    )


@query(
    "q97_cdc_merge",
    """
    WITH o AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
               FROM orders),
    ch AS (
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
               'D' AS op FROM o WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0,
               'U' FROM o WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, 'N', o_totalprice,
               'I' FROM o WHERE o_orderkey % 10 = 2
    )
    SELECT * FROM (
        SELECT o.* FROM o
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM ch)
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM ch WHERE op <> 'D'
    )
    """,
    doc="CDC MERGE apply (set-based EDIT/DELETE, SURVEY §2.1 S4/S5 at "
    "warehouse scale): a synthesized delete/update/insert batch applies "
    "as broadcast anti-join + union — the snapshot never shuffles; "
    "operators/cdc.py merge_apply.",
)
def q97_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.cdc import merge_apply

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    changes = (
        o.filter(k % 10 == 0)
        .withColumn("op", F.lit("D"))
        .unionByName(
            o.filter(k % 10 == 1)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
            .withColumn("op", F.lit("U"))
        )
        .unionByName(
            o.filter(k % 10 == 2)
            .withColumn("o_orderkey", k + F.lit(100000000))
            .withColumn("o_orderstatus", F.lit("N"))
            .withColumn("op", F.lit("I"))
        )
    )
    return merge_apply(o, changes, "o_orderkey", "op")


@query(
    "q98_ann_pq",
    _ANN_RECALL_ORACLE,
    doc="Product-quantization ANN with asymmetric distance (Jégou "
    "2011): per-subspace codebooks (driver-side sample metadata), "
    "map-only distributed encode to m small codes (the 16x-smaller "
    "index a 100 TB embedding column scans as), per-query distance "
    "tables broadcast, ADC scored JVM-side as an aggregate fold over "
    "array lookups, two-phase top-k; operators/similarity.py pq_ann. "
    "Composes with IVF (q57): IVF bounds the scanned fraction, PQ "
    "bounds bytes per scanned vector. Driver-checkable as a quantified "
    "bound: PQ is a re-ranking compressor, so the gate is exact-top-3 "
    "recall within PQ's top-10 (measured ≥ 2/3 per query at m=32/"
    "k_codes=16 on the adversarial isotropic fixture; gate at 1/3).",
)
def q98_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import ann_recall, brute_force_knn, pq_ann

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ann = pq_ann(q, emb, "vec_id", "embedding", k=10, m=32, k_codes=16)
    exact = brute_force_knn(q, emb, "vec_id", "embedding", k=3)
    return ann_recall(exact, ann, k=3, threshold=1 / 3)


@query(
    "q99_domain_mix",
    """
    WITH c AS (SELECT source, count(*) AS n,
                      cast(floor(sqrt(count(*)) * 1e6) AS BIGINT) AS q
               FROM documents GROUP BY source),
    t AS (SELECT cast(sum(n) AS BIGINT) AS nn, cast(sum(q) AS BIGINT) AS z
          FROM c),
    p AS (SELECT source, least(1.0, 0.5 * nn * q / z / n) AS p
          FROM c CROSS JOIN t),
    u AS (SELECT doc_id, source,
                 ((strpos('0123456789abcdef',
                          substr(md5(cast(doc_id AS varchar)), 29, 1)) - 1) * 16
                  + strpos('0123456789abcdef',
                           substr(md5(cast(doc_id AS varchar)), 30, 1)) - 1) * 256
                 + (strpos('0123456789abcdef',
                           substr(md5(cast(doc_id AS varchar)), 31, 1)) - 1) * 16
                 + strpos('0123456789abcdef',
                          substr(md5(cast(doc_id AS varchar)), 32, 1)) - 1 AS val
          FROM documents)
    SELECT u.doc_id, u.source
    FROM u JOIN p USING (source)
    WHERE u.val < p.p * 65536.0
    """,
    doc="Temperature-reweighted domain mixing (alpha=0.5, budget=N/2): "
    "rare sources up-sample, dominant ones down-sample; per-domain "
    "keep-probabilities broadcast onto a map-side md5-uniform filter, "
    "so the corpus never shuffles and the draw is identical at any "
    "parallelism; operators/sampling.py temperature_mix.",
)
def q99_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import temperature_mix

    docs = _t(spark, sf_dir, "documents")
    return temperature_mix(
        docs, "doc_id", "source", alpha=0.5, target_frac=0.5
    ).select("doc_id", "source")


@query(
    "q100_stream_static_join",
    """
    SELECT c_mktsegment,
           cast(count(*) AS bigint) AS n_events,
           cast(sum(cast(value AS DECIMAL(18,2))) AS double) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="Stream-static enrichment join (the third join pattern next to "
    "stream-stream q66 and batch joins): a fact stream joins a static "
    "dimension with NO join state — the dim broadcasts map-side within "
    "every micro-batch and is re-planned between batches (dimension "
    "updates picked up live). Bounded availableNow drain equals the "
    "batch twin, which the oracle checks; streaming/pipeline.py "
    "stream_static_enrich.",
)
def q100_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_static_enrich

    return stream_static_enrich(
        spark, _t(spark, sf_dir, "events"), _t(spark, sf_dir, "customer")
    )


_SHARD_NIB = (
    "(strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), {i}, 1)) - 1)"
)


@query(
    "q101_global_shuffle",
    f"""
    WITH h AS (
      SELECT doc_id,
             cast(({_SHARD_NIB.format(i=27)} * 16
                   + {_SHARD_NIB.format(i=28)}) % 8 AS int) AS shard,
             md5(cast(doc_id as varchar)) AS hh
      FROM documents
    )
    SELECT shard, cast(count(*) AS bigint) AS n_docs,
           arg_min(doc_id, hh) AS first_id, arg_max(doc_id, hh) AS last_id
    FROM h GROUP BY shard
    """,
    doc="Deterministic global corpus shuffle into training shards: shard "
    "= one md5 byte of the id, intra-shard order = the full digest — "
    "reproducible across engines, runs and cluster sizes, unlike "
    "orderBy(rand()). Plan: ONE hash exchange on the shard key + "
    "sortWithinPartitions; NO global sort, no range-sampling pass. The "
    "declared result audits the shards (count, first/last doc in shard "
    "order) via min_by/max_by; operators/sampling.py global_shuffle.",
)
def q101_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import global_shuffle

    sharded = global_shuffle(
        _t(spark, sf_dir, "documents").select("doc_id"), "doc_id", n_shards=8
    )
    return sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min_by("doc_id", F.col("__h")).alias("first_id"),
        F.max_by("doc_id", F.col("__h")).alias("last_id"),
    )


@query(
    "q102_cross_doc_grams",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(4)}) AS s FROM documents),
         ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
         gd AS (SELECT g, count(*) AS docs FROM ex GROUP BY g)
    SELECT doc_id,
           cast(sum(CASE WHEN docs >= 2 THEN 1 ELSE 0 END) AS bigint)
             / count(*) AS shared_frac
    FROM ex JOIN gd USING (g)
    GROUP BY doc_id
    """,
    doc="Cross-document duplication score: fraction of a doc's distinct "
    "4-grams shared with at least one OTHER doc — the corpus-level "
    "complement of q95's within-doc repetition gate and a SQL-checkable "
    "stand-in for suffix-array ExactSubstr dedup (catches templated "
    "boilerplate whose shared spans are too short for MinHash). Grams "
    "travel as 64-bit hashes, so both corpus-sized exchanges carry "
    "16-byte rows; operators/textual.py cross_doc_gram_fraction.",
)
def q102_cross_doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import cross_doc_gram_fraction

    return cross_doc_gram_fraction(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=4
    )


@query(
    "q103_int8_quantize",
    """
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> cast(x AS double)) AS vv
      FROM embeddings
    ), s AS (
      SELECT vec_id, label, vv,
             list_max(list_transform(vv, x -> abs(x))) AS scale
      FROM v
    )
    SELECT label, cast(count(*) AS bigint) AS n_vecs,
           cast(sum(cast(trunc(list_max(list_transform(vv,
                  x -> abs(x - floor(x / scale * 127.0) * scale / 127.0)))
                * 1e9) AS bigint)) AS bigint) AS qerr_1e9
    FROM s WHERE scale > 0.0
    GROUP BY label
    """,
    doc="Int8 scalar quantization of the embedding store (4x shrink "
    "before ANN serving) with a reconstruction-error audit, summarized "
    "per label. All array-lambda codegen (transform/array_max) — no "
    "UDF, zero shuffles before the tiny per-label aggregate; the error "
    "sum crosses engines as exact 1e-9-quantized integers (q79 "
    "pattern); operators/similarity.py quantize_int8_audit.",
)
def q103_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import quantize_int8_audit

    emb = _t(spark, sf_dir, "embeddings")
    audited = quantize_int8_audit(
        emb.select("vec_id", "label", "embedding"), "vec_id", "embedding"
    ).join(emb.select("vec_id", "label"), "vec_id")
    return audited.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.floor(F.col("max_qerr") * 1e9).cast("bigint"))
        .cast("bigint")
        .alias("qerr_1e9"),
    )


@query(
    "q104_passage_dedup",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    ch AS (SELECT doc_id,
           unnest(list_transform(range(0, cast(ceil(len(tk) / 20.0) AS BIGINT)),
                  i -> struct_pack(idx := i,
                       key := md5(array_to_string(tk[i*20+1 : i*20+20], ' '))))) AS c
           FROM t WHERE len(tk) > 0),
    r AS (SELECT doc_id, (c).idx AS idx,
          row_number() OVER (PARTITION BY (c).key ORDER BY doc_id, (c).idx) AS rn
          FROM ch)
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_chunks,
           cast(sum((rn > 1)::INT) AS BIGINT) AS n_dup_chunks
    FROM r GROUP BY doc_id
    """,
    doc="Passage-level exact dedup (sub-document granularity — the "
    "RefinedWeb/Dolma step between exact doc dedup q40 and near-dup "
    "q42): 20-token passages, corpus-wide keep-first by content hash "
    "(lowest (doc_id, idx) survives), per-doc duplication rollup. One "
    "shuffle on the md5 passage key (passage text never shuffles), one "
    "on doc_id; operators/textual.py passage_dedup_stats.",
)
def q104_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import passage_dedup_stats

    return passage_dedup_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", chunk_tokens=20
    )


@query(
    "q105_unigram_nll",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    v AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    tot AS (SELECT sum(c) AS s FROM v)
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_toks,
           round(avg(-ln(c::DOUBLE / s::DOUBLE)), 6) AS nll
    FROM tok JOIN v USING (term) CROSS JOIN tot
    GROUP BY doc_id
    """,
    doc="Per-document mean negative log-likelihood under the corpus's "
    "own unigram LM (CCNet-style fluency signal; rare-token-heavy docs "
    "score high): one vocab aggregate, one broadcast term join, one "
    "per-doc mean — at web scale the term table outgrows the broadcast "
    "and AQE runs the same plan as a shuffle join; "
    "operators/textual.py unigram_nll.",
)
def q105_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import unigram_nll

    return unigram_nll(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q106_weighted_sample",
    """
    WITH p AS (SELECT doc_id, source,
        cast(floor(ln((('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT + 0.5)
                      / 4503599627370496.0)
                   / n_chars::DOUBLE * 1e7) AS BIGINT) AS pri_q
        FROM documents)
    SELECT doc_id, source, pri_q FROM p ORDER BY pri_q DESC, doc_id LIMIT 200
    """,
    doc="Weighted sampling WITHOUT replacement (Efraimidis-Spirakis "
    "A-ES, weight = n_chars): deterministic md5-derived uniforms make "
    "the SAME sample come out at any parallelism or engine (rand()-"
    "based sampling is partitioning-dependent); priorities quantized "
    "to integers so libm ln() ulp differences can't flip the boundary; "
    "top-k runs as TakeOrderedAndProject, no global sort; "
    "operators/sampling.py weighted_sample.",
)
def q106_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample(docs, "doc_id", "n_chars", 200).select(
        "doc_id", "source", "pri_q"
    )


@query(
    "q107_incremental_minhash",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
         nw AS (SELECT doc_id FROM documents WHERE source = 'src0')
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
    FROM ex a JOIN ex b USING (g)
    WHERE a.doc_id < b.doc_id
      AND (a.doc_id IN (SELECT doc_id FROM nw)
           OR b.doc_id IN (SELECT doc_id FROM nw))
    GROUP BY 1, 2
    HAVING jaccard >= 0.5
    """,
    doc="Incremental near-dup detection (the daily-corpus-update "
    "shape): MinHash-LSH pair search restricted to pairs involving a "
    "NEW-batch doc (here source='src0' plays the new batch) — the band "
    "join probes new band rows against the banded corpus, so old×old "
    "pairs are never generated or verified; candidate work is O(m) in "
    "the batch size, not O(N) in the corpus. Oracle = exhaustive "
    "trigram Jaccard filtered to new-involving pairs (same recall "
    "argument as q42); operators/dedup.py minhash_lsh_pairs_incremental.",
)
def q107_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs_incremental

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__is_new", F.col("source") == "src0"
    )
    return minhash_lsh_pairs_incremental(
        docs, "doc_id", "text", "__is_new",
        shingle_n=3, num_hashes=64, num_bands=16, threshold=0.5,
    )


@query(
    "q108_cross_source_dups",
    r"""
    WITH d AS (SELECT doc_id, text, source FROM documents
               UNION ALL
               SELECT doc_id + 1000000, text, 'mirror'
               FROM documents WHERE doc_id % 11 = 0),
    k AS (SELECT DISTINCT
            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS key,
            source
          FROM d)
    SELECT a.source AS src_a, b.source AS src_b,
           cast(count(*) AS BIGINT) AS n_shared
    FROM k a JOIN k b ON a.key = b.key AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc="Cross-source duplicate matrix (contamination accounting before "
    "mixing crawls): distinct (content-key, source) pairs, md5-key "
    "self-join, per unordered source pair the count of keys present in "
    "both. Two narrow shuffles; document text never ships. The fixture "
    "has no natural cross-source dups, so (q88 pattern) every 11th doc "
    "is mirrored into a synthetic 'mirror' source identically in both "
    "engines to make the matrix non-trivial; "
    "operators/dedup.py cross_source_dup_matrix.",
)
def q108_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import cross_source_dup_matrix

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    mirrored = docs.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        "text",
        F.lit("mirror").alias("source"),
    )
    return cross_source_dup_matrix(
        docs.unionByName(mirrored), "doc_id", "text", "source"
    )


@query(
    "q109_length_batching",
    """
    WITH s AS (SELECT doc_id, n_chars::BIGINT AS len,
                      cast(floor(n_chars / 32.0) AS INTEGER) AS bucket
               FROM documents),
    r AS (SELECT *, row_number() OVER (PARTITION BY bucket
                                       ORDER BY len, doc_id) AS rn FROM s)
    SELECT bucket, cast(floor((rn - 1) / 16.0) AS INTEGER) AS batch_id,
           cast(count(*) AS BIGINT) AS n_seqs,
           max(len) AS max_len,
           round(1.0 - sum(len)::DOUBLE / (count(*) * max(len)), 6)
             AS padding_frac
    FROM r GROUP BY 1, 2
    """,
    doc="Length-bucketed batch assembly (the inference/training "
    "batching step after packing): bucket by length/32, intra-bucket "
    "(length, id) order cut into 16-row batches, per-batch padding "
    "waste reported (1 - sum/(n·max) — the cost of pad-to-longest). "
    "One shuffle on the bucket key; "
    "operators/sampling.py length_bucketed_batches.",
)
def q109_length_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import length_bucketed_batches

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return length_bucketed_batches(
        docs, "doc_id", "n_chars", bucket_width=32, batch_size=16
    )


@query(
    "q110_mad_outliers",
    """
    WITH stats AS (
        SELECT event_type,
               median(value) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, s.med,
               abs(e.value - s.med) AS adev
        FROM events e JOIN stats s USING (event_type)
    ),
    mad AS (
        SELECT event_type, any_value(med) AS med, median(adev) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           cast(count(*) AS BIGINT) AS n_events,
           cast(sum((d.adev > 3.5 * m.mad)::INT) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="Robust outlier detection (median/MAD, the rank-based z-score "
    "that survives the outliers it hunts): per-type exact median, "
    "median absolute deviation, count of |x-med| > 3.5·MAD. Two "
    "passes over events with narrow per-type stats broadcast back — "
    "the standard two-round shape for rank statistics (exact medians "
    "are not one-pass-mergeable; at 100 TB swap the exact median for "
    "approx_percentile and this becomes one pass per round with "
    "sketch merges).",
)
def q110_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(stats), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("adev") > 3.5 * F.col("mad")).cast("int"))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "q111_grouped_top_terms",
    f"""
    WITH tok AS (SELECT source, unnest({_TOKS}) AS term FROM documents),
    cnt AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2),
    r AS (SELECT source, term, n,
          row_number() OVER (PARTITION BY source
                             ORDER BY n DESC, term) AS rnk
          FROM cnt)
    SELECT source, term, cast(n AS BIGINT) AS n, cast(rnk AS INTEGER) AS rnk
    FROM r WHERE rnk <= 5
    """,
    doc="Per-group top-k terms (the grouped form of q73's global "
    "top-k): token counts per (source, term), then the distributed "
    "two-phase top-k per source (similarity.py topk_per_key — local "
    "per-partition heads, then the global k; the term dictionary is "
    "never fully sorted). Deterministic (count desc, term) tie-break.",
)
def q111_grouped_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import topk_per_key
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    cnt = (
        spread(docs.select("source", "text"), "source")
        .select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = topk_per_key(cnt, "source", [F.col("n").desc(), F.col("term")], 5)
    return out.select(
        "source", "term", F.col("n").cast("bigint").alias("n"),
        F.col("rank").cast("int").alias("rnk"),
    )


@query(
    "q112_star_clusters",
    """
    WITH RECURSIVE e AS (
        SELECT a.doc_id AS u, b.doc_id AS v
        FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        WHERE a.doc_id // 40 = b.doc_id // 40
    ),
    edges AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    reach(a, b) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.a, e2.v FROM reach r JOIN edges e2 ON r.b = e2.u
    )
    SELECT a AS vertex, least(a, min(b)) AS component
    FROM reach GROUP BY a
    """,
    doc="Large-star/small-star connected components (dedup.py "
    "connected_components_star) on its OWN regime: a chain-heavy edge "
    "set (consecutive-id chains of 40, the template-family/mirror-"
    "chain shape) where diameter-bound label propagation would need 39 "
    "shuffle rounds and the star alternation converges in O(log² n) "
    "(~7 here, convergence-checked, raises if not reached). Oracle: "
    "DuckDB recursive-CTE transitive closure over the same "
    "deterministic edges. Complements q71, whose diameter-2-3 near-dup "
    "graph is label-prop's regime.",
)
def q112_star_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import connected_components_star

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = docs.alias("a"), docs.alias("b")
    edges = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.expr("a.doc_id div 40") == F.expr("b.doc_id div 40"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    comp = connected_components_star(edges, "id_a", "id_b")
    return comp.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("component").cast("bigint").alias("component"),
    )


@query(
    "q113_mad_outliers_approx",
    """
    SELECT event_type, cast(count(*) AS BIGINT) AS n_events,
           TRUE AS med_ok, TRUE AS mad_ok
    FROM events GROUP BY event_type
    """,
    doc="The documented 100 TB path of q110: median and MAD via "
    "approx_percentile (KLL-style mergeable sketches — ONE pass per "
    "round with map-side partial merges, vs exact percentile's "
    "per-group sort buffers). Driver-checkable as a quantified bound "
    "(the approximate value can't be value-compared): accuracy=10000 "
    "guarantees rank error <= 1e-4, so each sketch median must land "
    "inside an EXACT quantile band computed alongside. The band is "
    "n-AWARE: 0.499..0.501 (10x margin) for groups >= 10k rows, "
    "0.49..0.51 below — exact percentile() INTERPOLATES between "
    "order stats while the sketch returns an actual datum, so at "
    "small n the interpolated 1e-3 band can be narrower than the gap "
    "between adjacent data values and the verdict would flap on "
    "fixture size, not accuracy. The oracle asserts the verdicts "
    "TRUE and anchors exact n_events.",
)
def q113_mad_outliers_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    app = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("amed"),
        F.expr("percentile(value, 0.499)").alias("mlo_t"),
        F.expr("percentile(value, 0.501)").alias("mhi_t"),
        F.expr("percentile(value, 0.49)").alias("mlo_w"),
        F.expr("percentile(value, 0.51)").alias("mhi_w"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type",
        "amed",
        "n_events",
        F.when(F.col("n_events") >= 10000, F.col("mlo_t"))
        .otherwise(F.col("mlo_w"))
        .alias("mlo"),
        F.when(F.col("n_events") >= 10000, F.col("mhi_t"))
        .otherwise(F.col("mhi_w"))
        .alias("mhi"),
    )
    dev = ev.join(F.broadcast(app.select("event_type", "amed")), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("amed"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile_approx("adev", 0.5, 10000).alias("amad"),
        F.expr("percentile(adev, 0.499)").alias("dlo_t"),
        F.expr("percentile(adev, 0.501)").alias("dhi_t"),
        F.expr("percentile(adev, 0.49)").alias("dlo_w"),
        F.expr("percentile(adev, 0.51)").alias("dhi_w"),
        F.count(F.lit(1)).alias("__nd"),
    ).select(
        "event_type",
        "amad",
        F.when(F.col("__nd") >= 10000, F.col("dlo_t"))
        .otherwise(F.col("dlo_w"))
        .alias("dlo"),
        F.when(F.col("__nd") >= 10000, F.col("dhi_t"))
        .otherwise(F.col("dhi_w"))
        .alias("dhi"),
    )
    return app.join(mad, "event_type").select(
        "event_type",
        F.col("n_events").cast("bigint").alias("n_events"),
        ((F.col("amed") >= F.col("mlo")) & (F.col("amed") <= F.col("mhi"))).alias(
            "med_ok"
        ),
        ((F.col("amad") >= F.col("dlo")) & (F.col("amad") <= F.col("dhi"))).alias(
            "mad_ok"
        ),
    )


@query(
    "q114_minhash_recall",
    f"""
    WITH docs AS (SELECT doc_id, text FROM documents
                  WHERE ('0x' || substr(md5(doc_id::VARCHAR), 29, 4))::BIGINT < 32768),
    sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM docs),
    ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS jaccard
              FROM ex a JOIN ex b USING (g)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
              HAVING jaccard >= 0.5)
    SELECT cast(count(*) AS BIGINT) AS n_exact_pairs,
           TRUE AS recall_ok, TRUE AS no_extra
    FROM pairs
    """,
    doc="MinHash-LSH recall AUDIT — the quantified quality gate for the "
    "q42/q71/q107 candidate path, run the way a 100 TB deployment "
    "audits its dedup: on a deterministic md5 HALF-sample of the "
    "corpus (audit cost scales with the sample, and banding restricted "
    "to the sample finds exactly the both-in-sample pairs of the full "
    "run). Exact AllPairs Jaccard pairs vs LSH pairs: recall_ok gates "
    "missed/exact <= 5% (theory: miss prob per qualifying pair "
    "<= 3e-8 at r=4/b=16); no_extra asserts the subset invariant (LSH "
    "exact-verifies candidates, so it can never emit a sub-threshold "
    "pair). Oracle recomputes the exact pair count and asserts both "
    "verdicts TRUE.",
)
def q114_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs
    from tytodb_spark.operators.sampling import md5_uniform16
    from tytodb_spark.operators.textual import jaccard_pairs

    docs = _t(spark, sf_dir, "documents").filter(
        md5_uniform16(F.col("doc_id")) < 32768
    )
    on = ["id_a", "id_b"]
    exact = jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).select(*on)
    lsh = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).select(*on)
    # One full-outer join + one aggregate: each expensive branch (exact
    # AllPairs, LSH banding) is evaluated exactly once, instead of the
    # 3x/2x re-evaluation that separate count/anti-join aggregates cost.
    both = exact.withColumn("__e", F.lit(1)).join(
        lsh.withColumn("__l", F.lit(1)), on, "full_outer"
    )
    return both.agg(
        F.count("__e").cast("bigint").alias("n_exact_pairs"),
        (
            F.count(F.when(F.col("__l").isNull(), 1)) * 20 <= F.count("__e")
        ).alias("recall_ok"),
        (F.count(F.when(F.col("__e").isNull(), 1)) == 0).alias("no_extra"),
    )


@query(
    "q115_domain_cap",
    """
    WITH p AS (SELECT source, doc_id,
         row_number() OVER (PARTITION BY source
             ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 13))::BIGINT,
                      doc_id) AS rnk
         FROM documents)
    SELECT source, doc_id, cast(rnk AS INT) AS rnk FROM p WHERE rnk <= 15
    """,
    doc="Per-domain document cap (no source may contribute more than "
    "15 docs to the mix — the anti-over-representation step between "
    "q99's temperature mix and sampling): deterministic md5-integer "
    "priority picks the same pseudo-random survivors at any "
    "parallelism/engine, and selection is the two-phase distributed "
    "top-k (per-partition heads first — a billion-row domain never "
    "sorts globally, the shuffle carries <= cap x partitions rows per "
    "domain); operators/sampling.py domain_cap.",
)
def q115_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import domain_cap

    docs = _t(spark, sf_dir, "documents").select("source", "doc_id")
    return domain_cap(docs, "source", "doc_id", 15).select(
        "source", "doc_id", F.col("rank").cast("int").alias("rnk")
    )


@query(
    "q116_vocab_coverage",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    c AS (SELECT term, count(*) AS c FROM tok GROUP BY term),
    v AS (SELECT term FROM c ORDER BY c DESC, term LIMIT 20)
    SELECT t.doc_id, cast(count(*) AS BIGINT) AS n_toks,
           cast(sum((v.term IS NULL)::INT) AS BIGINT) AS n_oov,
           cast(floor(sum((v.term IS NULL)::INT)::DOUBLE / count(*) * 1e6 + 0.5)
                AS BIGINT) AS oov_q
    FROM tok t LEFT JOIN v ON t.term = v.term
    GROUP BY t.doc_id
    """,
    doc="Tokenizer-coverage filter: per-document OOV rate against the "
    "corpus's own top-20 token vocabulary (OOV-heavy docs are what a "
    "fixed tokenizer shreds: wrong-script boilerplate, binary spill, "
    "mojibake). Vocab builds with one term aggregate + "
    "TakeOrderedAndProject (vocab is index metadata, corpus-size-"
    "independent, broadcast back); deterministic (count desc, term) "
    "boundary; OOV fraction quantized at 1e-6 for engine parity; "
    "operators/textual.py vocab_coverage.",
)
def q116_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import vocab_coverage

    return vocab_coverage(
        _t(spark, sf_dir, "documents"), "doc_id", "text", vocab_size=20
    )


@query(
    "q117_stream_rate_limit",
    """
    WITH r AS (SELECT user_id, event_id,
        row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                           ORDER BY ts, event_id) AS rn
        FROM events)
    SELECT user_id, event_id FROM r WHERE rn <= 3
    """,
    doc="Per-user stream rate limiting (admit <= 3 events per user per "
    "clock hour, drop the overflow) as a REAL Structured Streaming job "
    "— applyInPandasWithState with two longs of state per user "
    "(window start, admitted count), epoch-aligned integer-microsecond "
    "windows. The policy is batch-expressible, so unlike q39 this "
    "stateful operator hash-matches a plain SQL oracle (row_number "
    "over (user, hour) <= 3) with no self-consistency gate; "
    "streaming/rate_limit.py.",
)
def q117_stream_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.rate_limit import rate_limit_stateful

    ev = _t(spark, sf_dir, "events")
    return rate_limit_stateful(spark, ev, limit=3, window_seconds=3600).select(
        "user_id", "event_id"
    )


@query(
    "q118_robust_scale",
    """
    WITH ex AS (SELECT generate_subscripts(embedding, 1) - 1 AS dim,
                       unnest(embedding)::DOUBLE AS x
                FROM embeddings),
    r AS (SELECT dim, x,
                 row_number() OVER (PARTITION BY dim ORDER BY x) AS rn,
                 count(*) OVER (PARTITION BY dim) AS n
          FROM ex)
    SELECT cast(dim AS INT) AS dim, cast(max(n) AS BIGINT) AS n,
           max(CASE WHEN rn = floor((n - 1) * 0.25) + 1 THEN x END) AS q1,
           max(CASE WHEN rn = floor((n - 1) * 0.5) + 1 THEN x END) AS med,
           max(CASE WHEN rn = floor((n - 1) * 0.75) + 1 THEN x END) AS q3,
           max(CASE WHEN rn = floor((n - 1) * 0.75) + 1 THEN x END)
             - max(CASE WHEN rn = floor((n - 1) * 0.25) + 1 THEN x END) AS iqr
    FROM r GROUP BY dim
    """,
    doc="RobustScaler fit over the embedding table: per-dimension "
    "median + IQR (the scaling that survives the outliers mean/std "
    "absorbs; applying it is a map-side transform with these 64 rows "
    "broadcast). Quantiles are DISCRETE (element at floor((n-1)q), no "
    "interpolation) so the stats are actual data values — bit-"
    "identical across engines with no quantization. Exact ranks don't "
    "merge map-side (audit-scale path; at 100 TB swap in "
    "approx_percentile per dim); operators/similarity.py "
    "dim_robust_stats.",
)
def q118_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import dim_robust_stats

    return dim_robust_stats(_t(spark, sf_dir, "embeddings"), "embedding")


@query(
    "q119_bigram_nll",
    f"""
    WITH gr AS (SELECT doc_id, unnest({_NGRAMS(2)}) AS g FROM documents),
    c2 AS (SELECT g, count(*) AS c2 FROM gr GROUP BY g),
    c1 AS (SELECT split_part(g, ' ', 1) AS w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT count(DISTINCT split_part(g, ' ', 2)) AS v FROM c2),
    model AS (SELECT c2.g, (c2.c2 + 0.5) / (c1.c1 + 0.5 * v.v) AS p
              FROM c2 JOIN c1 ON split_part(c2.g, ' ', 1) = c1.w1 CROSS JOIN v)
    SELECT t.doc_id, cast(count(*) AS BIGINT) AS n_bigrams,
           round(avg(-ln(m.p)), 6) AS nll
    FROM gr t JOIN model m USING (g)
    GROUP BY t.doc_id
    """,
    doc="Per-document NLL under the corpus's own add-0.5-smoothed "
    "BIGRAM LM — the order-2 upgrade of q105 (flags scrambled/"
    "templated text whose TOKENS are common but whose TRANSITIONS are "
    "not): p(w2|w1)=(c(w1 w2)+a)/(c(w1*)+aV). One gram aggregate, a "
    "derived first-token aggregate over the tiny gram table, broadcast "
    "model join back, per-doc mean; smoothing arithmetic is exact "
    "binary (a=0.5), ln ulps vanish under round(.,6); "
    "operators/textual.py bigram_nll.",
)
def q119_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import bigram_nll

    return bigram_nll(_t(spark, sf_dir, "documents"), "doc_id", "text", alpha=0.5)


_SPAN_W = 8  # q120 window — shared between the Spark call and its oracle


@query(
    "q120_dup_spans",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    flat AS (
      SELECT doc_id, w['pos'] AS pos, w['key'] AS key
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(t) - {_SPAN_W - 1}, 0) + 1),
                 i -> {{'pos': i,
                        'key': md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' '))}}
               )) AS w
        FROM base)
    ),
    dups AS (SELECT key FROM flat GROUP BY key HAVING count(*) >= 2),
    hits AS (SELECT f.doc_id, f.pos FROM flat f JOIN dups USING (key)),
    marked AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL
                       OR pos - lag(pos) OVER w >= {_SPAN_W}
                  THEN 1 ELSE 0 END AS new_isl
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ),
    grp AS (
      SELECT doc_id, pos,
             sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM marked
    ),
    per_isl AS (
      SELECT doc_id, isl, max(pos) - min(pos) + {_SPAN_W} AS covered
      FROM grp GROUP BY 1, 2
    ),
    per_doc AS (
      SELECT doc_id, cast(count(*) AS BIGINT) AS dup_islands,
             cast(sum(covered) AS BIGINT) AS dup_tokens
      FROM per_isl GROUP BY 1
    )
    SELECT b.doc_id, cast(len(b.t) AS BIGINT) AS n_toks,
           coalesce(d.dup_islands, 0) AS dup_islands,
           coalesce(d.dup_tokens, 0) AS dup_tokens,
           round(coalesce(d.dup_tokens, 0) / greatest(len(b.t), 1), 6) AS dup_frac
    FROM base b LEFT JOIN per_doc d USING (doc_id)
    """,
    doc="Exact duplicate-SUBSTRING spans: every 8-token window occurring "
    ">=2 times corpus-wide marks its covered tokens; overlapping marks "
    "merge into maximal islands per doc (the sliding-window equivalent "
    "of suffix-array substring dedup, catching copied spans at ANY "
    "offset — passage dedup q104 only sees aligned chunks). Only md5 "
    "keys + int positions shuffle; operators/textual.py "
    "duplicate_span_stats.",
)
def q120_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import duplicate_span_stats

    return duplicate_span_stats(
        _t(spark, sf_dir, "documents"), "doc_id", "text", window=_SPAN_W
    )


@query(
    "q121_semantic_dedup",
    f"""
    WITH s AS (SELECT vec_id AS sid, embedding AS sv
               FROM embeddings ORDER BY vec_id LIMIT 8),
    sc AS (SELECT e.vec_id, s.sid,
                  {_cos_sql('e.embedding', 's.sv')} AS c
           FROM embeddings e CROSS JOIN s),
    asg AS (
      SELECT vec_id, cast(sid AS BIGINT) AS cluster
      FROM (SELECT vec_id, sid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY c DESC, sid) AS rn
            FROM sc)
      WHERE rn = 1
    ),
    pairs AS (
      SELECT b.vec_id AS id_b
      FROM embeddings a
      JOIN asg aa ON aa.vec_id = a.vec_id
      JOIN asg ab ON aa.cluster = ab.cluster AND aa.vec_id < ab.vec_id
      JOIN embeddings b ON b.vec_id = ab.vec_id
      WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.35
    )
    SELECT asg.vec_id, asg.cluster,
           (asg.vec_id NOT IN (SELECT id_b FROM pairs)) AS is_kept
    FROM asg
    """,
    doc="SemDeDup (Abbas et al. 2023): nearest-of-k-seeds clustering "
    "(deterministic stand-in for trained kmeans centroids — same plan) "
    "+ within-cluster cos>=t dedup with the one-pass lowest-id-wins "
    "keep rule. Pair work is bounded by cluster size, never corpus "
    "size; operators/dedup.py semantic_dedup.",
)
def q121_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        k_seeds=8, threshold=0.35,
    )


# q122: the bench split selector — first md5 byte < 13 (~5% of docs),
# the documented portable hash family (Spark conv == DuckDB '0x' cast)
_BENCH_SEL = "('0x' || substr(md5(cast(doc_id as varchar)), 1, 2))::BIGINT < 13"


@query(
    "q122_fuzzy_decontaminate",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s,
                       {_BENCH_SEL} AS is_bench
                FROM documents)
    SELECT t.doc_id, b.doc_id AS bench_id,
           len(list_intersect(t.s, b.s))
             / len(list_distinct(list_concat(t.s, b.s))) AS jaccard
    FROM sh t JOIN sh b ON NOT t.is_bench AND b.is_bench
    WHERE len(list_intersect(t.s, b.s))
            / len(list_distinct(list_concat(t.s, b.s))) >= 0.5
    """,
    doc="Fuzzy decontamination: MinHash-LSH probe of the 100 TB train "
    "side against a broadcast benchmark band table — flags train docs "
    "near-duplicating ANY eval doc (catches paraphrased leakage that "
    "exact-gram q94 misses at doc level). Bench split = md5-byte "
    "selector (~5%). Oracle is the exhaustive cross Jaccard; recall "
    "equivalence at r=4/b=16 per the q42 argument (corpus near-dups "
    "sit at j>=0.9 where miss probability is 3e-8; audited by q114); "
    "operators/dedup.py fuzzy_decontaminate.",
)
def q122_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import fuzzy_decontaminate

    docs = _t(spark, sf_dir, "documents")
    is_bench = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "long"
    ) < 13
    return fuzzy_decontaminate(
        docs.filter(~is_bench),
        docs.filter(is_bench),
        "doc_id",
        "text",
        shingle_n=3,
        num_hashes=64,
        num_bands=16,
        threshold=0.5,
    )


@query(
    "q123_incremental_rollup",
    f"""
    SELECT l_returnflag, l_linestatus,
           cast(sum(cast(l_quantity as {DEC})) as double) AS sum_qty,
           cast(sum(cast(l_extendedprice as {DEC})) as double) AS sum_price,
           cast(count(*) as bigint) AS cnt,
           cast(sum(cast(l_quantity as {DEC})) as double) / count(*) AS avg_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Incremental materialized-view maintenance: the pricing rollup "
    "kept as mergeable (SUM, COUNT) partial states — a delta batch "
    "(l_orderkey%10=0 here) refreshes the view by aggregating ONLY the "
    "delta and merging states key-wise; the 100 TB base is never "
    "rescanned. DECIMAL partials make the merge exact, so the oracle "
    "is the cold single-pass recompute (bit-identical by "
    "construction); operators/incremental.py rollup_state/merge_rollup.",
)
def q123_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.incremental import merge_rollup, rollup_state

    li = _t(spark, sf_dir, "lineitem")
    keys = ["l_returnflag", "l_linestatus"]
    measures = ["l_quantity", "l_extendedprice"]
    base = rollup_state(li.filter(F.col("l_orderkey") % 10 != 0), keys, measures)
    delta = rollup_state(li.filter(F.col("l_orderkey") % 10 == 0), keys, measures)
    merged = merge_rollup(base, delta, keys)
    return merged.select(
        *keys,
        F.col("sum_l_quantity").cast("double").alias("sum_qty"),
        F.col("sum_l_extendedprice").cast("double").alias("sum_price"),
        F.col("cnt"),
        (F.col("sum_l_quantity").cast("double") / F.col("cnt")).alias("avg_qty"),
    )


def _PAGERANK_ORACLE(iters: int = 5) -> str:
    """Unrolled fixed-iteration integer PageRank over the minhash near-
    dup pair graph (both orientations). Every quantity is a BIGINT and
    every division is integer `//`, mirroring operators/graph.py
    pagerank_int exactly — no float ever enters, so the trajectory is
    bit-identical across engines."""
    cte = [
        f"""
    sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
    ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b USING (g)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*)) >= 0.5
    ),
    e AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
    deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
    nn AS (SELECT count(*) AS n FROM deg),
    p0 AS (SELECT node, (1000000000000 // nn.n)::BIGINT AS pr FROM deg, nn)
    """
    ]
    for k in range(1, iters + 1):
        cte.append(f"""
    c{k} AS (SELECT e.dst AS node, sum(p.pr // d.deg) AS s
             FROM e JOIN p{k - 1} p ON p.node = e.src
                    JOIN deg d ON d.node = e.src
             GROUP BY 1),
    p{k} AS (SELECT deg.node,
                    ((3 * 1000000000000) // (20 * nn.n)
                     + (17 * coalesce(c{k}.s, 0)) // 20)::BIGINT AS pr
             FROM deg CROSS JOIN nn LEFT JOIN c{k} ON c{k}.node = deg.node)
    """)
    return (
        "WITH "
        + ",".join(cte)
        + f" SELECT node, pr FROM p{iters}"
    )


@query(
    "q124_dup_graph_pagerank",
    _PAGERANK_ORACLE(5),
    doc="PageRank over the near-dup pair graph (both orientations of "
    "the q42 LSH pair set) — the web-graph centrality prior used in "
    "corpus curation, and the iterative-join-agg pattern beyond "
    "k-means. Exact INTEGER mass units (1e-12): bigint `div` "
    "contributions and bigint sums make 5 iterations bit-identical at "
    "any parallelism and across engines — the q81 quantization lesson "
    "applied to iteration; operators/graph.py pagerank_int.",
)
def q124_dup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs
    from tytodb_spark.operators.graph import pagerank_int

    pairs = minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        shingle_n=3, num_hashes=64, num_bands=16, threshold=0.5,
    ).select("id_a", "id_b")
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    return pagerank_int(edges, iters=5).select(
        F.col("node"), F.col("pr")
    )


@query(
    "q125_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS term FROM documents),
    total AS (SELECT count(*) AS n FROM toks)
    SELECT term, cast(count(*) AS BIGINT) AS cnt
    FROM toks, total
    GROUP BY term, total.n
    HAVING count(*) >= ceil(0.02 * total.n)
    """,
    doc="Heavy-hitter tokens (>=2% of the corpus token stream) via "
    "per-partition Misra-Gries summaries (bounded task memory, the "
    "path when map-side combine hash tables outgrow RAM at web-scale "
    "vocab) + exact recount of the broadcast candidate superset — "
    "output is exact and partitioning-independent by the MG guarantee; "
    "operators/textual.py frequent_tokens_exact.",
)
def q125_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import frequent_tokens_exact

    return frequent_tokens_exact(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_frac=0.02
    )


# q126 split selector: even/odd first md5 byte — portable across engines
_NB_TRAIN = "('0x' || substr(md5(cast(doc_id as varchar)), 1, 2))::BIGINT % 2 = 0"


@query(
    "q126_nb_classifier",
    f"""
    WITH tr AS (SELECT * FROM documents WHERE {_NB_TRAIN}),
    sc AS (SELECT * FROM documents WHERE NOT ({_NB_TRAIN})),
    ttr AS (SELECT lang AS label, unnest({_TOKS}) AS term FROM tr),
    model AS (SELECT term, label, count(*) AS c_tc FROM ttr GROUP BY 1, 2),
    ctot AS (SELECT label, sum(c_tc) AS c_c FROM model GROUP BY 1),
    voc AS (SELECT count(DISTINCT term) AS v FROM model),
    dc AS (SELECT lang AS label, count(*) AS n_docs FROM tr GROUP BY 1),
    nall AS (SELECT count(*) AS n_all FROM tr),
    kk AS (SELECT count(*) AS k FROM dc),
    cls AS (SELECT dc.label,
                   ln((dc.n_docs + 0.5) / (nall.n_all + 0.5 * kk.k)) AS prior,
                   ctot.c_c + 0.5 * voc.v AS denom
            FROM dc CROSS JOIN nall CROSS JOIN kk CROSS JOIN voc
            JOIN ctot ON ctot.label = dc.label),
    tsc AS (SELECT doc_id, unnest({_TOKS}) AS term FROM sc),
    scored AS (
      SELECT t.doc_id, c.label,
             round(any_value(c.prior)
                   + sum(ln((coalesce(m.c_tc, 0) + 0.5) / c.denom)), 6) AS score
      FROM tsc t CROSS JOIN cls c
      LEFT JOIN model m ON m.term = t.term AND m.label = c.label
      GROUP BY t.doc_id, c.label
    )
    SELECT doc_id, label AS pred, score
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, label) = 1
    """,
    doc="Multinomial Naive Bayes lang classifier (the fastText-shaped "
    "supervised corpus filter) as pure DataFrame algebra: train on the "
    "even-md5 half, score the odd half. Model = V*K (term,label) "
    "count rows — broadcast while the vocab fits, shuffle join beyond "
    "(AQE). Scores round(.,6) before the argmax so ln/summation ulps "
    "can't flip the winner (q119 pattern); operators/textual.py "
    "nb_classify.",
)
def q126_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import nb_classify

    docs = _t(spark, sf_dir, "documents")
    is_train = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long") % 2 == 0
    )
    return nb_classify(
        docs.filter(is_train), docs.filter(~is_train),
        "doc_id", "text", "lang", alpha=0.5,
    )


@query(
    "q127_scd2_history",
    """
    WITH src AS (SELECT user_id, event_type, epoch_us(ts) AS tns, event_id
                 FROM events),
    ch AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                           ORDER BY tns, event_id) AS prev
           FROM src),
    scd AS (SELECT user_id, event_type, tns AS eff_from, event_id
            FROM ch WHERE prev IS NULL OR prev <> event_type)
    SELECT user_id, event_type, eff_from,
           lead(eff_from) OVER w AS eff_to,
           (lead(eff_from) OVER w IS NULL) AS is_current
    FROM scd WINDOW w AS (PARTITION BY user_id ORDER BY eff_from, event_id)
    """,
    doc="SCD2 history build (slowly-changing-dimension type 2): "
    "collapse each user's event stream to change rows (consecutive-"
    "value dedup via lag) and derive [eff_from, eff_to) validity "
    "intervals via lead — the standard dimension-history primitive a "
    "CDC pipeline materializes. One shuffle on the key; ties broken "
    "by the unique event_id. Complements q85 (latest-only) and q97 "
    "(CDC merge). Timestamps surface as epoch micros (bigint, the "
    "unix_micros==epoch_us convention) in both engines.",
)
def q127_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ch = ev.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tns"), "event_id"
    ).withColumn("prev", F.lag("event_type").over(W.partitionBy("user_id").orderBy("tns", "event_id")))
    scd = ch.filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))).select(
        "user_id", "event_type", F.col("tns").alias("eff_from"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("eff_from", "event_id")
    return scd.select(
        "user_id",
        "event_type",
        "eff_from",
        F.lead("eff_from").over(w).alias("eff_to"),
        F.lead("eff_from").over(w).isNull().alias("is_current"),
    )


@query(
    "q128_hard_negatives",
    f"""
    SELECT anchor_id, negative_id, cos_sim, rank FROM (
      SELECT q.vec_id AS anchor_id, c.vec_id AS negative_id,
             {_cos_sql('q.embedding', 'c.embedding')} AS cos_sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
             ) AS rank
      FROM embeddings q JOIN embeddings c ON q.label != c.label
      WHERE q.vec_id < 8
    ) WHERE rank <= 5
    """,
    doc="Hard-negative mining for contrastive training: per anchor, the "
    "k most-similar corpus vectors with a DIFFERENT label (the "
    "examples the loss learns most from). Broadcast anchors x one "
    "corpus scan, label filter before ranking, two-phase top-k; at "
    "corpus scale the scan swaps for an ANN candidate pass + exact "
    "re-rank; operators/similarity.py hard_negatives.",
)
def q128_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    return hard_negatives(
        emb.filter(F.col("vec_id") < 8), emb, "vec_id", "embedding", "label", k=5
    )


def _BPE_ORACLE(n_merges: int = 3) -> str:
    """Unrolled BPE merge-rule induction mirroring operators/textual.py
    bpe_merge_table: per round, bigram argmax (count desc, pair asc)
    then the SAME padded-string 3-pass replace fuse."""
    ctes = [
        f"d0 AS (SELECT doc_id, ' ' || array_to_string({_TOKS}, ' ') || ' ' AS t"
        " FROM documents)"
    ]
    for k in range(1, n_merges + 1):
        rep1 = "replace(d.t, ' '||m.w1||' '||m.w2||' ', ' '||m.w1||'~'||m.w2||' ')"
        rep2 = f"replace({rep1}, ' '||m.w1||' '||m.w2||' ', ' '||m.w1||'~'||m.w2||' ')"
        rep3 = f"replace({rep2}, ' '||m.w1||' '||m.w2||' ', ' '||m.w1||'~'||m.w2||' ')"
        ctes.append(f"""
    b{k} AS (
      SELECT u['w1'] AS w1, u['w2'] AS w2, cast(count(*) AS BIGINT) AS cnt
      FROM (
        SELECT unnest(CASE WHEN len(l) >= 2
                 THEN list_transform(range(1, len(l)),
                                     i -> {{'w1': l[i], 'w2': l[i+1]}})
                 ELSE [] END) AS u
        FROM (SELECT list_filter(string_split(t, ' '), x -> x <> '') AS l
              FROM d{k - 1})
      ) GROUP BY 1, 2
    ),
    m{k} AS (SELECT {k} AS merge_idx, w1, w2, cnt FROM b{k}
             ORDER BY cnt DESC, w1, w2 LIMIT 1),
    d{k} AS (SELECT d.doc_id, {rep3} AS t FROM d{k - 1} d CROSS JOIN m{k} m)
    """)
    union = " UNION ALL ".join(
        f"SELECT * FROM m{k}" for k in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(ctes) + " " + union


def _BPE_APPLY_ORACLE(n_merges: int = 3) -> str:
    """Same merge-round CTE chain as _BPE_ORACLE, but the final select
    reports per-doc segmentation under the learned rules (q139)."""
    chain = _BPE_ORACLE(n_merges)
    union = " UNION ALL ".join(
        f"SELECT * FROM m{k}" for k in range(1, n_merges + 1)
    )
    assert chain.endswith(union)
    nsym = "len(list_filter(string_split({}.t, ' '), x -> x <> ''))"
    return chain[: -len(union)] + f"""
    SELECT a.doc_id,
           cast({nsym.format('a')} AS BIGINT) AS n_syms_before,
           cast({nsym.format('b')} AS BIGINT) AS n_syms_after,
           round({nsym.format('b')} / greatest({nsym.format('a')}, 1), 6)
             AS compression
    FROM d0 a JOIN d{n_merges} b USING (doc_id)
    """


@query(
    "q129_bpe_merges",
    _BPE_ORACLE(3),
    doc="BPE-style merge-rule induction (the distributed heart of "
    "tokenizer training; words as base symbols = word2phrase phrase "
    "mining): per round one bigram count shuffle over the vocab-"
    "bounded pair space, a 1-row argmax broadcast back, and a padded-"
    "string 3-pass greedy fuse executed identically in both engines "
    "(parity by construction); operators/textual.py bpe_merge_table.",
)
def q129_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import bpe_merge_table

    return bpe_merge_table(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n_merges=3
    )


@query(
    "q139_bpe_apply",
    _BPE_APPLY_ORACLE(3),
    doc="Tokenizer APPLICATION closing the q129 loop: re-segment every "
    "document under the first 3 learned merge rules and report the "
    "per-doc compression ratio — the metric tokenizer training tracks "
    "per round. Shares the merge-round implementation with q129 "
    "(textual._bpe_rounds), so learned rules cannot drift between "
    "train and apply; operators/textual.py bpe_apply.",
)
def q139_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import bpe_apply

    return bpe_apply(_t(spark, sf_dir, "documents"), "doc_id", "text", n_merges=3)


@query(
    "q130_dataset_card",
    f"""
    WITH base AS (
      SELECT source, lang, doc_id, len({_TOKS}) AS n_toks, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS ck
      FROM documents
    ),
    dup AS (
      SELECT source, sum(cnt - 1) AS n_dup_docs
      FROM (SELECT source, ck, count(*) AS cnt FROM base GROUP BY 1, 2)
      GROUP BY source
    )
    SELECT b.source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(b.n_toks) AS BIGINT) AS n_tokens,
           cast(any_value(d.n_dup_docs) AS BIGINT) AS n_dup_docs,
           cast(count(DISTINCT b.lang) AS BIGINT) AS n_langs,
           round(sum(b.n_chars) / count(*), 6) AS mean_chars
    FROM base b JOIN dup d USING (source)
    GROUP BY b.source
    """,
    doc="Dataset card: the per-source summary a corpus release ships "
    "(doc/token counts, within-source exact-dup count, language "
    "spread, mean length). Two narrow aggregates — content-key groups "
    "within source, then the source rollup; every sum is over exact "
    "integers so the card is bit-stable. The composition pattern for "
    "bolting on any declared signal (quality, dup rate, NLL) as "
    "another aggregate column.",
)
def q130_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import normalize_text
    from tytodb_spark.operators.textual import token_count

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "source",
        "lang",
        "doc_id",
        token_count("text").cast("bigint").alias("n_toks"),
        "n_chars",
        F.md5(normalize_text(F.col("text"))).alias("ck"),
    )
    dup = (
        base.groupBy("source", "ck")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("source")
        .agg(F.sum(F.col("cnt") - 1).alias("n_dup_docs"))
    )
    return (
        base.join(dup, "source")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.first("n_dup_docs").cast("bigint").alias("n_dup_docs"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.round(F.sum("n_chars") / F.count(F.lit(1)), 6).alias("mean_chars"),
        )
    )


def _FAKE_CLIP_SQL(expr: str) -> str:
    """DuckDB twin of multimodal._fake_clip_embed: 8 dims of 4 md5 hex
    chars scaled to [0,1]."""
    return (
        f"list_transform(range(0, 8), i -> "
        f"('0x' || substr(md5({expr}), 4*i + 1, 4))::BIGINT / 65535.0)"
    )


@query(
    "q131_multimodal_alignment",
    f"""
    WITH v AS (
      SELECT doc_id,
             {_FAKE_CLIP_SQL('text')} AS iv,
             {_FAKE_CLIP_SQL("'t:' || text")} AS tv
      FROM documents
    )
    SELECT doc_id,
           floor({_DOT.format(a='iv', b='tv')}
                 / (sqrt({_DOT.format(a='iv', b='iv')})
                    * sqrt({_DOT.format(a='tv', b='tv')})) * 1e6 + 0.5) / 1e6
             AS alignment
    FROM v
    """,
    doc="Image-text alignment scoring (the CLIP-score filter of a "
    "multimodal pair pipeline): payload and caption embedded INSIDE "
    "Arrow-batched mapInPandas — bytes never leave their scan "
    "partition, only (id, score) rows flow on. Encoder is the "
    "deterministic md5 stub (container has no model libs); a real "
    "model swaps in behind the same batch signature. Scores quantize "
    "floor(x*1e6+0.5) on both engines (q81 rounding rule); "
    "operators/multimodal.py alignment_scores.",
)
def q131_multimodal_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import alignment_scores, to_media_table

    docs = _t(spark, sf_dir, "documents")
    media = to_media_table(docs, "doc_id", "text", mime="image/fake")
    return alignment_scores(media, docs, "doc_id", "text")


@query(
    "q132_profile_histogram",
    """
    WITH c AS (
      SELECT least(greatest(floor((l_extendedprice - 0.0) / 10000.0),
                            0), 11)::INT AS bin,
             cast(count(*) AS BIGINT) AS cnt
      FROM lineitem WHERE l_extendedprice IS NOT NULL
      GROUP BY 1
    )
    SELECT e.bin, 0.0 + e.bin * 10000.0 AS lo,
           0.0 + (e.bin + 1) * 10000.0 AS hi,
           coalesce(c.cnt, 0) AS cnt
    FROM (SELECT unnest(range(12))::INT AS bin) e
    LEFT JOIN c USING (bin)
    """,
    doc="Column profiling: equi-width histogram of l_extendedprice "
    "(12 x 10k bins, edge clamp) — the data-profiling pass a pipeline "
    "gate runs per stage. One map-side bin assignment + one count "
    "shuffle on |bins| keys; bounds come from table stats so it's a "
    "single scan; operators/quality.py equi_width_histogram.",
)
def q132_profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import equi_width_histogram

    return equi_width_histogram(
        _t(spark, sf_dir, "lineitem"), "l_extendedprice", 0.0, 120000.0, bins=12
    )


@query(
    "q133_constraint_suite",
    """
    WITH a AS (
      SELECT cast(count(*) AS BIGINT) AS n,
             cast(sum((l_orderkey IS NULL)::INT) AS BIGINT) AS v_key_not_null,
             cast(sum((NOT (l_quantity > 0))::INT) AS BIGINT) AS v_qty_positive,
             cast(sum((NOT (l_discount BETWEEN 0 AND 0.1))::INT) AS BIGINT)
               AS v_discount_range,
             cast(sum((NOT (l_extendedprice > 0))::INT) AS BIGINT)
               AS v_price_positive
      FROM lineitem
    )
    SELECT 'key_not_null' AS "check", n AS n_rows,
           v_key_not_null AS n_violations, v_key_not_null = 0 AS passed FROM a
    UNION ALL
    SELECT 'qty_positive', n, v_qty_positive, v_qty_positive = 0 FROM a
    UNION ALL
    SELECT 'discount_range', n, v_discount_range, v_discount_range = 0 FROM a
    UNION ALL
    SELECT 'price_positive', n, v_price_positive, v_price_positive = 0 FROM a
    """,
    doc="Constraint suite (Deequ-style pipeline gate): named row-level "
    "checks evaluated in ONE aggregate pass — adding a constraint adds "
    "a column to the shared scan, not another pass. Long output so "
    "suites union across tables; operators/quality.py "
    "check_constraints.",
)
def q133_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import check_constraints

    li = _t(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        {
            "key_not_null": F.col("l_orderkey").isNotNull(),
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0, 0.1),
            "price_positive": F.col("l_extendedprice") > 0,
        },
    )


@query(
    "q134_ref_integrity",
    """
    SELECT 'lineitem->orders' AS relation,
           (SELECT cast(count(*) AS BIGINT) FROM lineitem) AS n_child,
           (SELECT cast(count(*) AS BIGINT) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) = 0 AS passed
    UNION ALL
    SELECT 'orders->customer',
           (SELECT cast(count(*) AS BIGINT) FROM orders),
           (SELECT cast(count(*) AS BIGINT) FROM orders r
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = r.o_custkey)),
           (SELECT count(*) FROM orders r
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = r.o_custkey)) = 0
    """,
    doc="Referential-integrity audit (FK orphan counts) across the "
    "star schema: left-anti join per relation — the parent key set "
    "broadcasts while it fits, the child side ships only its key. The "
    "dbt-test/Deequ-style gate before a join-heavy pipeline trusts "
    "its dims; operators/quality.py referential_integrity.",
)
def q134_ref_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import referential_integrity

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    a = referential_integrity(li, orders, "l_orderkey", "o_orderkey").select(
        F.lit("lineitem->orders").alias("relation"), "n_child", "n_orphans", "passed"
    )
    b = referential_integrity(orders, cust, "o_custkey", "c_custkey").select(
        F.lit("orders->customer").alias("relation"), "n_child", "n_orphans", "passed"
    )
    return a.unionAll(b)


_CMS_PROBES = ["table", "value", "spark", "row", "zzz_absent"]


def _CMS_ORACLE(depth: int = 4, width: int = 256) -> str:
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    # plain % (not pmod — absent in DuckDB): the 8-hex-char int is
    # nonnegative, so % == pmod here
    bucket = (
        "(('0x' || substr(md5(cast(d AS VARCHAR) || ':' || term), 1, 8))"
        f"::BIGINT % {width})"
    )
    return f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS term FROM documents),
    pairs AS (SELECT d, {bucket} AS bucket
              FROM toks CROSS JOIN (SELECT unnest(range({depth})) AS d)),
    sketch AS (SELECT d, bucket, cast(count(*) AS BIGINT) AS c
               FROM pairs GROUP BY 1, 2),
    probes(term) AS (VALUES {probes}),
    pb AS (SELECT term, d, {bucket} AS bucket
           FROM probes CROSS JOIN (SELECT unnest(range({depth})) AS d)),
    est AS (SELECT pb.term, cast(min(coalesce(s.c, 0)) AS BIGINT) AS est
            FROM pb LEFT JOIN sketch s USING (d, bucket) GROUP BY 1),
    exact AS (SELECT term, cast(count(*) AS BIGINT) AS exact FROM toks GROUP BY 1)
    SELECT e.term, e.est, coalesce(x.exact, 0) AS exact,
           e.est >= coalesce(x.exact, 0) AS never_undercounts
    FROM est e LEFT JOIN exact x USING (term)
    """


@query(
    "q135_count_min_sketch",
    _CMS_ORACLE(4, 256),
    doc="Count-Min frequency sketch (the point-frequency dual of q87's "
    "HLL): the sketch is a (depth x width) counter TABLE built with "
    "one narrow map-side-combinable shuffle — mergeable by addition "
    "across batches/streams, broadcastable, and bit-reproducible via "
    "the md5-portable hash family (no opaque sketch blobs). Probe "
    "estimates are exact-checked (deterministic hashes -> the oracle "
    "recomputes the estimate itself, plus the est>=true CMS "
    "invariant); operators/sketches.py.",
)
def q135_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import count_min_build, count_min_estimate
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    toks = spread(docs.select("doc_id", "text"), "doc_id").select(
        F.explode(tokens(F.col("text"))).alias("term")
    )
    sketch = count_min_build(toks, "term", depth=4, width=256)
    probes = spark.createDataFrame([(t,) for t in _CMS_PROBES], "term string")
    est = count_min_estimate(sketch, probes, "term", depth=4, width=256)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    return (
        est.join(exact, "term", "left")
        .select(
            "term",
            "est",
            F.coalesce("exact", F.lit(0)).cast("bigint").alias("exact"),
            (F.col("est") >= F.coalesce("exact", F.lit(0))).alias(
                "never_undercounts"
            ),
        )
    )


@query(
    "q136_stream_incremental_rollup",
    f"""
    SELECT event_type,
           cast(user_id % 7 AS BIGINT) AS shard,
           cast(sum(cast(value AS {DEC})) AS double) AS sum_value,
           cast(count(*) AS BIGINT) AS cnt
    FROM events
    GROUP BY event_type, user_id % 7
    """,
    doc="Streaming materialized-view maintenance: q123's mergeable "
    "(SUM, COUNT) algebra driven by Structured Streaming — every "
    "micro-batch folds into the persisted view with a state-sized "
    "key-wise merge under a snapshot-swap write (crash-safe between "
    "batches); history is never rescanned. DECIMAL partials make the "
    "drained final state bit-equal to the cold single-pass aggregate, "
    "which IS the oracle; streaming/pipeline.py "
    "stream_incremental_rollup.",
)
def q136_stream_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_incremental_rollup

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 7).cast("bigint").alias("shard"),
        "value",
    )
    state = stream_incremental_rollup(spark, ev, ["event_type", "shard"], ["value"])
    return state.select(
        "event_type",
        "shard",
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("cnt").cast("bigint").alias("cnt"),
    )


@query(
    "q137_strip_dup_spans",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    flat AS (
      SELECT doc_id, w['pos'] AS pos, w['key'] AS key
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(t) - {_SPAN_W - 1}, 0) + 1),
                     i -> {{'pos': i,
                            'key': md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' '))}}
                   )) AS w
            FROM base)
    ),
    dups AS (SELECT key FROM flat GROUP BY key HAVING count(*) >= 2),
    cov AS (
      SELECT doc_id, list_sort(list(DISTINCT cp)) AS cov
      FROM (SELECT f.doc_id, unnest(range(f.pos, f.pos + {_SPAN_W})) AS cp
            FROM flat f JOIN dups USING (key))
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           cast(len(b.t) AS BIGINT) AS n_toks,
           cast(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed,
           coalesce(array_to_string(list_transform(list_filter(
             list_transform(range(1, len(b.t) + 1),
                            i -> {{'i': i, 'tk': b.t[i]}}),
             s -> NOT list_contains(coalesce(c.cov, []), s['i'])),
             s -> s['tk']), ' '), '') AS clean_text
           -- coalesce: DuckDB array_to_string(EMPTY,...) is NULL,
           -- Spark array_join(EMPTY) is '' (fully-removed docs)
    FROM base b LEFT JOIN cov c USING (doc_id)
    """,
    doc="The ACTUATOR for q120: rewrite every doc with its duplicated "
    "8-token spans removed (substring-dedup removal step, aggressive "
    "drop-every-occurrence variant). One window-table scan + COUNT-"
    "over-key shuffle finds dup positions; covered indexes dedup per "
    "doc; the rewrite is a map-side array filter on a second text "
    "pass (the actuator must touch the text — two-pass like the "
    "suffix-array original); operators/textual.py "
    "strip_duplicate_spans.",
)
def q137_strip_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import strip_duplicate_spans

    return strip_duplicate_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text", window=_SPAN_W
    )


@query(
    "q138_strip_dup_spans_keep_first",
    f"""
    WITH base AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    flat AS (
      SELECT doc_id, w['pos'] AS pos, w['key'] AS key
      FROM (SELECT doc_id,
                   unnest(list_transform(
                     range(1, greatest(len(t) - {_SPAN_W - 1}, 0) + 1),
                     i -> {{'pos': i,
                            'key': md5(array_to_string(t[i:i+{_SPAN_W - 1}], ' '))}}
                   )) AS w
            FROM base)
    ),
    ranked AS (
      SELECT doc_id, pos,
             count(*) OVER (PARTITION BY key) AS c,
             row_number() OVER (PARTITION BY key ORDER BY doc_id, pos) AS rn
      FROM flat
    ),
    cov AS (
      SELECT doc_id, list_sort(list(DISTINCT cp)) AS cov
      FROM (SELECT doc_id, unnest(range(pos, pos + {_SPAN_W})) AS cp
            FROM ranked WHERE c >= 2 AND rn > 1)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           cast(len(b.t) AS BIGINT) AS n_toks,
           cast(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed,
           coalesce(array_to_string(list_transform(list_filter(
             list_transform(range(1, len(b.t) + 1),
                            i -> {{'i': i, 'tk': b.t[i]}}),
             s -> NOT list_contains(coalesce(c.cov, []), s['i'])),
             s -> s['tk']), ' '), '') AS clean_text
    FROM base b LEFT JOIN cov c USING (doc_id)
    """,
    doc="q137's faithful policy variant: each distinct duplicated "
    "window KEEPS its corpus-wide first occurrence (lowest (id, pos)) "
    "and only later occurrences are stripped — Lee et al.'s actual "
    "substring-dedup rule. One extra row_number over the key "
    "partition, reusing the COUNT window's shuffle (no extra "
    "exchange); operators/textual.py strip_duplicate_spans("
    "keep_first=True).",
)
def q138_strip_dup_spans_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import strip_duplicate_spans

    return strip_duplicate_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text", window=_SPAN_W,
        keep_first=True,
    )


@query(
    "q140_sliding_windows",
    f"""
    WITH e AS (SELECT epoch_us(ts) AS t, event_type, value FROM events),
    x AS (SELECT event_type, value,
                 unnest([(t // 300000000) * 300000000,
                         (t // 300000000) * 300000000 - 300000000]) AS ws
          FROM e)
    SELECT ws AS window_start, event_type,
           cast(count(*) AS BIGINT) AS n_events,
           cast(sum(cast(value AS {DEC})) AS double) AS total_value
    FROM x GROUP BY 1, 2
    """,
    doc="SLIDING (hopping) event-time windows — 10-minute window, "
    "5-minute hop, every event in exactly two windows: the smoothing/"
    "rate-monitoring shape between tumbling (q34) and session (q35). "
    "Drained as a real stream (availableNow, complete mode) equal to "
    "the batch twin; the oracle materializes each event's two window "
    "starts on the 5-minute epoch grid. Streaming state is bounded by "
    "windows-per-key x watermark horizon; streaming/windows.py "
    "sliding_window_counts.",
)
def q140_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.windows import stream_sliding_window_counts

    return stream_sliding_window_counts(spark, _t(spark, sf_dir, "events"))


@query(
    "q141_equi_depth_histogram",
    """
    WITH r AS (
      SELECT value,
             row_number() OVER (ORDER BY value, event_id) AS rank,
             count(*) OVER () AS total
      FROM events
    )
    SELECT cast(floor((rank - 1) * 8 / total) AS INT) AS bin,
           cast(count(*) AS BIGINT) AS cnt,
           min(value) AS lo, max(value) AS hi
    FROM r GROUP BY 1
    """,
    doc="Equi-depth (equal-frequency) histogram over a DISTRIBUTED "
    "total-order ranking: a bare row_number() OVER (ORDER BY) would "
    "collapse the table into one task, so ranks come from range-"
    "repartition + local row_number + a broadcast of |partitions| "
    "cumulative offsets (operators/ranking.py global_rank — "
    "partitioning-independent given the unique tie key). Bin edges "
    "are actual data values, no interpolation; the equi-WIDTH twin "
    "is q132; at 100 TB swap ranking for approx_percentile "
    "boundaries.",
)
def q141_equi_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.ranking import equi_depth_histogram

    return equi_depth_histogram(
        _t(spark, sf_dir, "events"), "value", "event_id", bins=8
    )


@query(
    "q142_session_assembly",
    """
    WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t
               FROM events),
    g AS (SELECT *, CASE WHEN lag(t) OVER w IS NULL
                              OR t - lag(t) OVER w > 1800000000
                         THEN 1 ELSE 0 END AS new_s
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
    s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                     ORDER BY t, event_id) AS session_id
          FROM g),
    q AS (SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                       ORDER BY t, event_id) AS seq
          FROM s)
    SELECT user_id, cast(session_id AS BIGINT) AS session_id,
           cast(floor((seq - 1) / 8) AS BIGINT) AS chunk_id,
           cast(count(*) AS BIGINT) AS n_events,
           min(t) AS first_us, max(t) AS last_us
    FROM q GROUP BY 1, 2, 3
    """,
    doc="Conversation/session assembly for chat-style training data: "
    "sessionize each user's stream (30-minute inactivity gap, gaps-"
    "and-islands — the batch twin of q35's session_window) and slice "
    "every session into bounded 8-event context chunks in stream "
    "order — the unit a dialogue pipeline tokenizes. One shuffle on "
    "the user key; every window reuses the same partitioning.",
)
def q142_session_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("t")
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    s = (
        ev.withColumn(
            "new_s",
            (
                F.coalesce(
                    F.col("t") - F.lag("t").over(w) > 1_800_000_000, F.lit(True)
                )
            ).cast("int"),
        )
        .withColumn("session_id", F.sum("new_s").over(w))
    )
    wq = W.partitionBy("user_id", "session_id").orderBy("t", "event_id")
    q = s.withColumn("seq", F.row_number().over(wq))
    return (
        q.groupBy(
            "user_id",
            F.col("session_id").cast("bigint").alias("session_id"),
            F.floor((F.col("seq") - 1) / 8).cast("bigint").alias("chunk_id"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("t").alias("first_us"),
            F.max("t").alias("last_us"),
        )
    )


@query(
    "q143_table_checksum",
    """
    SELECT cast(count(*) AS BIGINT) AS n_rows,
           cast(sum(('0x' || substr(md5(
                 cast(l_orderkey AS VARCHAR) || '|' ||
                 cast(l_linenumber AS VARCHAR) || '|' ||
                 cast(cast(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
                   || '|' || l_returnflag
               ), 1, 8))::BIGINT) AS BIGINT) AS checksum
    FROM lineitem
    """,
    doc="Order-insensitive table content checksum (the anti-entropy / "
    "replication-audit primitive: two replicas or a pre/post-migration "
    "pair compare one row instead of terabytes): per-row md5 over a "
    "canonical column serialization, summed as BIGINT — commutative "
    "and mergeable across partitions/shards. The 32-bit row hashes "
    "sum safely to ~2^62 (4e18 rows) before overflow; past that, sum "
    "per-shard and compare shard vectors, or fold hi/lo words — the "
    "r03 DECIMAL(38,0) output was value-identical to the oracle but "
    "hash-fragile in the driver's canonicalization, so the output "
    "type is now the plainly-portable one. One scan, map-side "
    "combine, a 1-row result.",
)
def q143_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    # doubles stringify through DECIMAL: Java and DuckDB
                    # double->string diverge on sci-notation thresholds,
                    # decimal rendering is identical
                    F.col("l_quantity").cast(DEC).cast("string"),
                    F.col("l_returnflag"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(row_hash).cast("bigint").alias("checksum"),
    )


@query(
    "q144_snapshot_diff",
    """
    WITH a AS (SELECT o_orderkey AS k, o_totalprice AS v FROM orders),
    b AS (SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice + 1.0
                      ELSE o_totalprice END AS v
          FROM orders WHERE o_orderkey % 101 <> 0),
    j AS (SELECT coalesce(a.k, b.k) AS k,
                 CASE WHEN b.k IS NULL THEN 'removed'
                      WHEN a.k IS NULL THEN 'added'
                      WHEN a.v <> b.v THEN 'changed'
                      ELSE 'unchanged' END AS status
          FROM a FULL OUTER JOIN b ON a.k = b.k)
    SELECT status, cast(count(*) AS BIGINT) AS n
    FROM j GROUP BY status
    """,
    doc="Snapshot diff (the table-migration / replication-drift audit): "
    "a keyed FULL OUTER JOIN of two snapshot versions classifying "
    "every key as added / removed / changed / unchanged — here "
    "snapshot B simulates drops (k%101=0) and value drift (k%97=0). "
    "One co-partitioned shuffle join on the key; at 100 TB pre-filter "
    "both sides with q143-style per-partition checksums so only "
    "differing partitions join.",
)
def q144_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    a = orders.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v"))
    b = orders.filter(F.col("o_orderkey") % 101 != 0).select(
        F.col("o_orderkey").alias("k"),
        F.when(
            F.col("o_orderkey") % 97 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("v"),
    )
    j = a.alias("a").join(b.alias("b"), F.col("a.k") == F.col("b.k"), "full_outer")
    status = (
        F.when(F.col("b.k").isNull(), F.lit("removed"))
        .when(F.col("a.k").isNull(), F.lit("added"))
        .when(F.col("a.v") != F.col("b.v"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(status.alias("status")).groupBy("status").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


# q145 query-doc selector: first md5 byte < 3 (~1.2% of docs)
_RETR_SEL = "('0x' || substr(md5(cast(doc_id as varchar)), 1, 2))::BIGINT < 3"


@query(
    "q145_bm25_retrieval",
    f"""
    WITH t AS (SELECT doc_id, unnest({_TOKS}) AS w FROM documents),
    qt AS (SELECT doc_id AS query_id, unnest(list_distinct({_TOKS})) AS w
           FROM documents WHERE {_RETR_SEL}),
    dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_corpus,
                     cast(cast(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM t
           WHERE w IN (SELECT DISTINCT w FROM qt) GROUP BY doc_id, w),
    dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
    per AS (
        SELECT qt.query_id, tf.doc_id,
               cast(floor(
                   ln((n_corpus - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
                   * 1e7) AS BIGINT) AS q
        FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (w)
             JOIN qt USING (w) CROSS JOIN stats
        WHERE tf.doc_id <> qt.query_id
    ),
    scored AS (SELECT query_id, doc_id, cast(sum(q) AS BIGINT) / 1e7 AS bm25
               FROM per GROUP BY 1, 2)
    SELECT query_id, doc_id, bm25, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY bm25 DESC, doc_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
    doc="Batch BM25 retrieval: top-5 most relevant corpus docs PER "
    "QUERY DOC (the RAG example-mining / query-doc pair shape) in one "
    "shared plan — the corpus tokenizes once, the union of query "
    "terms broadcasts into a shared tf table, and adding a query adds "
    "broadcast rows, not corpus passes. Per-term scores quantize to "
    "1e-7 before summing (q96 rule); self-matches excluded; "
    "operators/textual.py bm25_retrieve.",
)
def q145_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import bm25_retrieve

    docs = _t(spark, sf_dir, "documents")
    sel = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("long") < 3
    )
    return bm25_retrieve(docs, docs.filter(sel), "doc_id", "text", k=5)


@query(
    "q146_exact_correlation",
    """
    WITH s AS (
      SELECT l_returnflag,
             cast(count(*) AS BIGINT) AS n,
             cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sx,
             cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sy,
             cast(sum(cast(cast(l_quantity AS DECIMAL(18,2))
                    * cast(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS sxx,
             cast(sum(cast(cast(l_extendedprice AS DECIMAL(18,2))
                    * cast(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS syy,
             cast(sum(cast(cast(l_quantity AS DECIMAL(18,2))
                    * cast(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS sxy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                        * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
             AS corr,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / (n::DOUBLE * n::DOUBLE), 6) AS covar_pop
    FROM s
    """,
    doc="Per-group Pearson correlation + covariance from EXACT decimal "
    "component sums — the profiling stat the built-in corr()/"
    "covar_pop() cannot hash-check (double accumulators vary with "
    "partitioning and engine); here all six components are exact "
    "integers/decimals and the float math runs once, so the result is "
    "bit-stable at any parallelism; operators/quality.py exact_corr.",
)
def q146_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import exact_corr

    return exact_corr(
        _t(spark, sf_dir, "lineitem"),
        ["l_returnflag"],
        "l_quantity",
        "l_extendedprice",
    )


@query(
    "q147_vocab_growth",
    f"""
    WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
    firsts AS (SELECT term, min(doc_id) AS first_doc FROM toks GROUP BY term),
    dlen AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
    ck AS (SELECT (unnest(range(1, 11)) * (SELECT max(doc_id) + 1 FROM documents)
                   ) // 10 AS cutoff)
    SELECT ck.cutoff AS cutoff,
           (SELECT cast(coalesce(sum(n), 0) AS BIGINT) FROM dlen
            WHERE doc_id < ck.cutoff) AS n_tokens,
           (SELECT cast(count(*) AS BIGINT) FROM firsts
            WHERE first_doc < ck.cutoff) AS n_distinct_terms
    FROM ck
    """,
    doc="Vocabulary-growth (Heaps-law) curve: distinct terms vs tokens "
    "seen at 10 corpus prefixes. The trick that keeps it one cheap "
    "pass: aggregate each term's FIRST-occurrence doc once (vocab-"
    "sized table), then every checkpoint is a filter-count over that "
    "tiny table + the per-doc length table — the corpus token stream "
    "is never re-scanned per checkpoint. The sublinear-growth signal "
    "data teams use to size tokenizer vocabs and detect synthetic/"
    "templated corpora (this 30-word corpus saturates immediately — "
    "exactly the tell).",
)
def q147_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from tytodb_spark.operators.textual import spread, tokens

    toks = spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    firsts = toks.groupBy("term").agg(F.min("doc_id").alias("first_doc"))
    dlen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    max_id = docs.agg((F.max("doc_id") + 1).alias("__m"))
    ck = (
        spark.range(1, 11)
        .crossJoin(F.broadcast(max_id))
        .select(F.expr("(id * __m) div 10").alias("cutoff"))
    )
    tok_cum = (
        ck.join(dlen, dlen.doc_id < ck.cutoff, "left")
        .groupBy("cutoff")
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tokens"))
    )
    vocab_cum = (
        ck.join(firsts, firsts.first_doc < ck.cutoff, "left")
        .groupBy("cutoff")
        .agg(F.count("term").cast("bigint").alias("n_distinct_terms"))
    )
    return tok_cum.join(vocab_cum, "cutoff")


@query(
    "q148_group_ols",
    """
    WITH s AS (
      SELECT l_linestatus,
             cast(count(*) AS BIGINT) AS n,
             cast(sum(cast(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sx,
             cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS sy,
             cast(sum(cast(cast(l_quantity AS DECIMAL(18,2))
                    * cast(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS sxx,
             cast(sum(cast(cast(l_extendedprice AS DECIMAL(18,2))
                    * cast(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS syy,
             cast(sum(cast(cast(l_quantity AS DECIMAL(18,2))
                    * cast(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,4)))
                  AS DECIMAL(38,4)) AS sxy
      FROM lineitem GROUP BY l_linestatus
    ),
    d AS (
      SELECT l_linestatus, n,
             n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE AS num,
             n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE AS denx,
             n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE AS deny,
             sx::DOUBLE AS sxd, sy::DOUBLE AS syd
      FROM s
    )
    SELECT l_linestatus, n,
           round(num / denx, 6) AS slope,
           round((syd - num / denx * sxd) / n::DOUBLE, 6) AS intercept,
           round(num * num / (denx * deny), 6) AS r2
    FROM d
    """,
    doc="Per-group closed-form OLS fit (y = slope·x + b, plus R²) from "
    "EXACT decimal sufficient statistics — distributed regression "
    "without MLlib or a second pass: one map-side-combinable aggregate "
    "carries (n, Sx, Sy, Sxx, Syy, Sxy) per group, the shuffle moves "
    "six numbers per group (never rows), and the float math runs once "
    "on exact inputs so the fit is bit-stable at any parallelism. "
    "The profiling trend stat (price-vs-quantity, bytes-vs-tokens) a "
    "100 TB pipeline wants per partition slice; operators/quality.py "
    "ols_fit (complements q146's correlation from the same sums).",
)
def q148_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import ols_fit

    return ols_fit(
        _t(spark, sf_dir, "lineitem"),
        ["l_linestatus"],
        "l_quantity",
        "l_extendedprice",
    )


@query(
    "q149_pmi_cooccur",
    f"""
    WITH pres AS (SELECT doc_id AS d, unnest(list_distinct({_TOKS})) AS term
                  FROM documents),
    dfreq AS (SELECT term, count(*) AS df FROM pres GROUP BY term),
    vocab AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 30),
    nd AS (SELECT count(*) AS n FROM documents),
    vp AS (SELECT d, term FROM pres JOIN vocab USING (term)),
    pairs AS (SELECT a.term AS term_a, b.term AS term_b,
                     cast(count(*) AS BIGINT) AS n_ab
              FROM vp a JOIN vp b ON a.d = b.d AND a.term < b.term
              GROUP BY 1, 2 HAVING count(*) >= 2)
    SELECT term_a, term_b, n_ab,
           cast(floor(ln(n_ab::DOUBLE * n / (va.df::DOUBLE * vb.df)) * 1e6
                      + 0.5) AS BIGINT) AS pmi_q
    FROM pairs JOIN vocab va ON va.term = pairs.term_a
               JOIN vocab vb ON vb.term = pairs.term_b
               CROSS JOIN nd
    """,
    doc="PMI term co-occurrence (doc-level presence) over a capped "
    "vocabulary — the collocation/template-structure profile of a "
    "corpus (boilerplate families surface as near-certain pairs). "
    "Scale shape: the top-30 vocab is one aggregate + "
    "TakeOrderedAndProject (index metadata) and BROADCASTS into the "
    "presence filter, so the pair self-join runs on ≤30 presence rows "
    "per doc (≤ k²/2 pairs/doc, never |doc|²); doc frequencies and the "
    "corpus count broadcast into a single quantized-log score per "
    "surviving pair; operators/textual.py pmi_pairs.",
)
def q149_pmi_cooccur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import pmi_pairs

    docs = _t(spark, sf_dir, "documents")
    return pmi_pairs(docs, "doc_id", "text", vocab_k=30, min_pair=2)


@query(
    "q150_ewma",
    """
    WITH v AS (SELECT event_id, user_id, ts,
                      cast(floor(value * 100) AS BIGINT) AS v_cents
               FROM events)
    SELECT event_id, user_id, v_cents,
           cast(floor((v_cents * 128
             + coalesce(lag(v_cents, 1) OVER w, 0) * 64
             + coalesce(lag(v_cents, 2) OVER w, 0) * 32
             + coalesce(lag(v_cents, 3) OVER w, 0) * 16
             + coalesce(lag(v_cents, 4) OVER w, 0) * 8
             + coalesce(lag(v_cents, 5) OVER w, 0) * 4
             + coalesce(lag(v_cents, 6) OVER w, 0) * 2
             + coalesce(lag(v_cents, 7) OVER w, 0)) * 1e6 / 25500.0 + 0.5)
             AS BIGINT) AS ewma_q
    FROM v
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="Truncated EWMA (α=1/2, 8-term tail) per user over event time — "
    "the smoothing every metrics pipeline runs, reshaped for exact "
    "distributed execution: power-of-two weights over integer cents "
    "make the numerator an exact BIGINT (no float accumulation order), "
    "the single division quantizes once, and the whole operator is a "
    "fixed LAG chain — one shuffle on the key, O(depth) state, "
    "streaming-portable. Cold-start rows are biased low exactly like a "
    "zero-initialized streaming EWMA (documented); operators/"
    "timeseries.py ewma_truncated.",
)
def q150_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.timeseries import ewma_truncated

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = ewma_truncated(ev, "user_id", ["ts", "event_id"], "value", depth=8)
    return out.select("event_id", "user_id", "v_cents", "ewma_q")


@query(
    "q151_bloom_filter",
    """
    WITH k AS (SELECT DISTINCT o_custkey AS key FROM orders),
    pos AS (SELECT key,
                   unnest([('0x'||substr(md5(key::VARCHAR),1,8))::BIGINT % 65536,
                           ('0x'||substr(md5(key::VARCHAR),9,8))::BIGINT % 65536])
                   AS p
            FROM k),
    words AS (SELECT p // 32 AS widx, bit_or(1::BIGINT << cast(p % 32 AS INT)) AS word
              FROM pos GROUP BY 1),
    bits AS (SELECT cast(sum(bit_count(word)) AS BIGINT) AS n_set_bits FROM words),
    probe AS (
      SELECT c.c_custkey,
             ('0x'||substr(md5(c.c_custkey::VARCHAR),1,8))::BIGINT % 65536 AS p1,
             ('0x'||substr(md5(c.c_custkey::VARCHAR),9,8))::BIGINT % 65536 AS p2,
             (k.key IS NOT NULL) AS is_member
      FROM customer c LEFT JOIN k ON k.key = c.c_custkey),
    hit AS (
      SELECT is_member,
             ((coalesce(w1.word, 0) & (1::BIGINT << cast(p1 % 32 AS INT))) <> 0
              AND (coalesce(w2.word, 0) & (1::BIGINT << cast(p2 % 32 AS INT))) <> 0)
             AS bloom_hit
      FROM probe LEFT JOIN words w1 ON w1.widx = p1 // 32
                 LEFT JOIN words w2 ON w2.widx = p2 // 32)
    SELECT cast(count(*) AS BIGINT) AS n_probes,
           (SELECT n_set_bits FROM bits) AS n_set_bits,
           cast(sum(is_member::INT) AS BIGINT) AS n_true_members,
           cast(sum(bloom_hit::INT) AS BIGINT) AS n_bloom_hits,
           cast(sum((bloom_hit AND NOT is_member)::INT) AS BIGINT)
             AS n_false_positives,
           bool_and(bloom_hit OR NOT is_member) AS no_false_negatives
    FROM hit
    """,
    doc="PORTABLE Bloom filter as a mergeable word table (m=65536 bits "
    "packed 32-per-BIGINT — every set bit stays clear of the sign bit, "
    "so the same `1 << offset` arithmetic is legal in any engine; k=2 "
    "md5-slice hashes). Build = distinct keys → ONE bit_or aggregate "
    "on m/32 word keys (map-side combinable; batches merge by bit_or "
    "— the CMS-style mergeable-sketch shape, q135's dual for set "
    "membership). Probe = two broadcast word joins; the filter is what "
    "a 100 TB join prefilter ships instead of the key set. The oracle "
    "recomputes the filter AND asserts the defining invariant: zero "
    "false negatives, exact false-positive census; operators/"
    "sketches.py bloom_build/bloom_probe.",
)
def q151_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import bloom_build, bloom_probe

    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    bloom = bloom_build(orders, "o_custkey", m_bits=65536)
    bits = bloom.agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("n_set_bits")
    )
    truth = orders.distinct().withColumn("__m", F.lit(True))
    probed = bloom_probe(cust, "c_custkey", bloom, m_bits=65536).join(
        truth, cust.c_custkey == truth.o_custkey, "left"
    )
    summary = probed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.col("__m").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("n_true_members"),
        F.sum(F.col("bloom_hit").cast("bigint")).cast("bigint").alias("n_bloom_hits"),
        F.sum((F.col("bloom_hit") & F.col("__m").isNull()).cast("bigint"))
        .cast("bigint")
        .alias("n_false_positives"),
        F.bool_and(F.col("bloom_hit") | F.col("__m").isNull()).alias(
            "no_false_negatives"
        ),
    )
    return summary.crossJoin(F.broadcast(bits)).select(
        "n_probes", "n_set_bits", "n_true_members", "n_bloom_hits",
        "n_false_positives", "no_false_negatives",
    )


@query(
    "q152_token_entropy",
    f"""
    WITH tf AS (SELECT doc_id, unnest({_TOKS}) AS t FROM documents),
    c AS (SELECT doc_id, t, count(*) AS c,
                 cast(floor(count(*)::DOUBLE * log2(count(*)::DOUBLE) * 1e6 + 0.5)
                      AS BIGINT) AS clgc_q
          FROM tf GROUP BY doc_id, t),
    a AS (SELECT doc_id, cast(sum(c) AS BIGINT) AS n_tokens,
                 cast(count(*) AS BIGINT) AS n_distinct,
                 cast(sum(clgc_q) AS BIGINT) AS sq
          FROM c GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
           cast(floor(log2(n_tokens::DOUBLE) * 1e6 - sq / n_tokens::DOUBLE + 0.5)
                AS BIGINT) AS entropy_q
    FROM a
    """,
    doc="Per-document token-distribution Shannon entropy (bits) — the "
    "repetitiveness gate that catches what length/stopword ratios "
    "miss (keyword-stuffed spam, template loops). One tokenize pass → "
    "per-(doc,term) counts → one per-doc aggregate; each term's "
    "c·log2(c) quantizes to an exact 1e-6 integer BEFORE summing "
    "(q96/q105 convention) so the accumulation is order-independent "
    "integers and the result hash-checks across engines; operators/"
    "textual.py token_entropy.",
)
def q152_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import token_entropy

    return token_entropy(_t(spark, sf_dir, "documents"), "doc_id", "text")


@query(
    "q153_chunk_overlap",
    """
    WITH n AS (SELECT doc_id, text,
                      cast(floor(greatest(length(text) - 1, 0) / 60) + 1 AS INT)
                        AS n_chunks
               FROM documents),
    c AS (SELECT doc_id, n_chunks, unnest(range(0, n_chunks)) AS chunk_id, text
          FROM n)
    SELECT doc_id, cast(chunk_id AS INT) AS chunk_id,
           substr(text, cast(chunk_id * 60 + 1 AS INT), 80) AS chunk_text,
           n_chunks
    FROM c
    """,
    doc="RAG-style overlap chunking: fixed 80-char chunks on a 60-char "
    "stride, so consecutive chunks share 20 chars of context and every "
    "character lands in ≥1 chunk (empty docs emit one empty chunk — "
    "nothing silently disappears from the chunk store). Pure per-row "
    "expression work (sequence + posexplode), ZERO shuffles — a "
    "100 TB corpus chunks map-side and inherits the input "
    "partitioning; operators/textual.py chunk_with_overlap.",
)
def q153_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import chunk_with_overlap

    docs = _t(spark, sf_dir, "documents")
    return chunk_with_overlap(docs, "doc_id", "text", size=80, stride=60)


@query(
    "q154_triangle_count",
    """
    WITH ids AS (SELECT doc_id FROM documents),
    e0 AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM ids a JOIN ids b
        ON b.doc_id = a.doc_id + 1 AND a.doc_id // 50 = b.doc_id // 50
      UNION ALL
      SELECT a.doc_id, b.doc_id
      FROM ids a JOIN ids b
        ON b.doc_id = a.doc_id + 2 AND a.doc_id // 50 = b.doc_id // 50
    ),
    e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
          FROM e0 WHERE u <> v),
    w AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM e e1 JOIN e e2 ON e1.v = e2.u),
    probe AS (SELECT (e.u IS NOT NULL) AS hit
              FROM w LEFT JOIN e ON e.u = w.a AND e.v = w.c)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM e) AS n_edges,
           cast(count(*) AS BIGINT) AS n_wedges,
           cast(sum(hit::INT) AS BIGINT) AS n_triangles
    FROM probe
    """,
    doc="Triangle counting via compact-forward (orient low→high, wedge "
    "join on the middle vertex, semi-probe the closing edge) — the "
    "clustering-coefficient census of the near-dup graph that "
    "distinguishes tight template families (triangle-dense) from "
    "drifting chains (triangle-free, q112's regime). Orientation "
    "generates each wedge exactly once (no dedup shuffle); both joins "
    "are equi-joins the planner broadcasts when the edge list fits. "
    "Edge fixture: consecutive-id +1/+2 edges inside 50-doc blocks "
    "(48 triangles per full block, deterministic in any engine); "
    "operators/graph.py triangle_count.",
)
def q154_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.graph import triangle_count

    ids = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")

    def step(k: int) -> DataFrame:
        return (
            a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + k)
            .filter(F.expr("a.doc_id div 50") == F.expr("b.doc_id div 50"))
            .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        )

    edges = step(1).unionByName(step(2))
    return triangle_count(edges, "src", "dst")


@query(
    "q155_skew_report",
    """
    WITH c AS (SELECT o_custkey, cast(count(*) AS BIGINT) AS cnt
               FROM orders GROUP BY o_custkey),
    t AS (SELECT cast(sum(cnt) AS BIGINT) AS total,
                 cast(count(*) AS BIGINT) AS n_keys FROM c),
    r AS (SELECT o_custkey, cnt,
                 row_number() OVER (ORDER BY cnt DESC, o_custkey) AS rank
          FROM c)
    SELECT o_custkey, cnt, cast(rank AS INT) AS rank,
           cast(floor(cnt * 1000000 / total) AS BIGINT) AS share_q,
           cast(floor(cnt * n_keys * 1000000 / total) AS BIGINT)
             AS ratio_to_mean_q
    FROM r CROSS JOIN t WHERE rank <= 5
    """,
    doc="Shuffle-key skew diagnostics — the measurement that decides "
    "whether a join key needs salting (q58) or AQE skew splitting "
    "BEFORE the 100 TB join runs: top-5 heaviest keys with corpus "
    "share and ratio-to-mean in exact ppm integer math. Plan: one "
    "combinable count aggregate on the key, two-phase distributed "
    "top-k over the per-key counts (never a global sort), broadcast "
    "1-row totals join; operators/quality.py key_skew_report.",
)
def q155_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.quality import key_skew_report

    return key_skew_report(_t(spark, sf_dir, "orders"), "o_custkey", top_n=5)


@query(
    "q156_stream_outer_join",
    """
    WITH s AS (SELECT user_id, ts FROM events WHERE event_type = 'signup'),
    e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
    wm AS (SELECT least((SELECT max(epoch_us(ts)) FROM s),
                        (SELECT max(epoch_us(ts)) FROM e)) AS w)
    SELECT s.user_id AS user_id,
           epoch_us(s.ts) AS signup_us,
           epoch_us(e.ts) AS error_us
    FROM s JOIN e
      ON s.user_id = e.user_id
     AND epoch_us(e.ts) >= epoch_us(s.ts)
     AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000
    UNION ALL
    SELECT s.user_id, epoch_us(s.ts), NULL::BIGINT
    FROM s CROSS JOIN wm
    WHERE NOT EXISTS (
        SELECT 1 FROM e
        WHERE e.user_id = s.user_id
          AND epoch_us(e.ts) >= epoch_us(s.ts)
          AND epoch_us(e.ts) <= epoch_us(s.ts) + 3600000000)
      AND epoch_us(s.ts) + 3600000000 < wm.w
    """,
    doc="Stream-stream LEFT OUTER join with watermark state eviction — "
    "q66's missing half: a signup with no error within 1 h emits with "
    "a NULL match only once the global watermark proves no match can "
    "still arrive, which is exactly the mechanism that bounds "
    "outer-join state on an unbounded stream (rows near the stream "
    "head stay in state; everything older flushes in the no-data "
    "final micro-batch). Oracle = batch LEFT JOIN with the same "
    "strict-below-watermark emission rule (boundary-equal rows are "
    "excluded on both engines — version-ambiguous semantics "
    "determinized); streaming/pipeline.py stream_stream_left_join.",
)
def q156_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_stream_left_join

    return stream_stream_left_join(spark, _t(spark, sf_dir, "events"))


@query(
    "q157_quantile_normalize",
    """
    WITH e AS (SELECT vec_id,
                      cast(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                      cast(unnest(embedding) AS DOUBLE) AS v
               FROM embeddings),
    r AS (SELECT vec_id, pos,
                 row_number() OVER (PARTITION BY pos ORDER BY v, vec_id) AS rnk,
                 count(*) OVER (PARTITION BY pos) AS n
          FROM e)
    SELECT vec_id, pos, cast(rnk AS BIGINT) AS rnk,
           cast(floor(rnk * 1000000 / (n + 1)) AS BIGINT) AS norm_q
    FROM r
    """,
    doc="Per-dimension quantile (rank) normalization of the embedding "
    "table — maps each value to rank/(n+1) within its dimension, the "
    "scale-drift-proof feature transform run before distance math when "
    "encoder versions mix. Plan: map-side posexplode, ONE shuffle on "
    "the dimension index (dims rank independently — parallelism = "
    "embedding width), rank + count share the window pass, ppm-integer "
    "output. Degenerate tiny-d case documented to swap in q141's "
    "distributed total-order ranking per dim; operators/similarity.py "
    "quantile_normalize.",
)
def q157_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import quantile_normalize

    return quantile_normalize(_t(spark, sf_dir, "embeddings"), "vec_id", "embedding")


@query(
    "q158_knn_margin",
    f"""
    WITH top AS (
      SELECT query_id, neighbor_id, cos_sim, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_cos_sql('q.embedding', 'c.embedding')} AS cos_sim,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {_cos_sql('q.embedding', 'c.embedding')} DESC, c.vec_id
               ) AS rank
        FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
        WHERE q.vec_id < 8
      ) WHERE rank <= 4
    ),
    cq AS (SELECT *, cast(floor(cos_sim * 1e6 + 0.5) AS BIGINT) AS cqv FROM top),
    a AS (SELECT query_id,
                 max(CASE WHEN rank = 1 THEN neighbor_id END) AS best_id,
                 max(CASE WHEN rank = 1 THEN cos_sim END) AS best_cos,
                 max(CASE WHEN rank = 1 THEN cqv END) AS best_q,
                 sum(CASE WHEN rank > 1 THEN cqv END) AS rest_q,
                 count(CASE WHEN rank > 1 THEN 1 END) AS nrest
          FROM cq GROUP BY query_id)
    SELECT query_id, best_id, best_cos,
           CASE WHEN nrest > 0
                THEN cast(floor(best_q - rest_q / nrest + 0.5) AS BIGINT)
                ELSE best_q END AS margin_q,
           (CASE WHEN nrest > 0
                 THEN cast(floor(best_q - rest_q / nrest + 0.5) AS BIGINT)
                 ELSE best_q END >= 20000) AS accepted
    FROM a
    """,
    doc="Margin-based neighbor acceptance (Artetxe & Schwenk difference "
    "margin): a query keeps its best neighbor only when it clearly "
    "beats the mean of ranks 2..4 — the alignment-confidence gate for "
    "mined paired data that absolute thresholds can't provide under "
    "hubness (dense regions pass everything; the margin normalizes by "
    "the query's own neighborhood density). Exact top-4 via the "
    "broadcast-queries brute-kNN scan, then ONE per-query aggregate "
    "over ppm-integer scores (order-independent sum, one mean "
    "division); operators/similarity.py knn_margin.",
)
def q158_knn_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import knn_margin

    emb = _t(spark, sf_dir, "embeddings")
    return knn_margin(
        emb.filter(F.col("vec_id") < 8), emb, "vec_id", "embedding",
        k=4, accept_margin_q=20_000,
    )


@query(
    "q159_trigram_search",
    """
    WITH t AS (SELECT doc_id, lower(trim(text)) AS t FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_distinct(
                   list_transform(range(1, greatest(length(t) - 1, 1)),
                                  i -> substr(t, cast(i AS INT), 3)))) AS gram
          FROM t),
    pg AS (SELECT unnest(['ark', 'par', 'spa']) AS gram),
    cand AS (SELECT doc_id FROM g JOIN pg USING (gram)
             GROUP BY doc_id HAVING count(*) = 3),
    nc AS (SELECT cast(count(*) AS BIGINT) AS n_index_candidates FROM cand)
    SELECT t.doc_id, nc.n_index_candidates
    FROM t JOIN cand USING (doc_id) CROSS JOIN nc
    WHERE contains(t.t, 'spark')
    """,
    doc="Substring search through a trigram posting-list index — the "
    "scale-out answer to LIKE '%spark%', which no min/max statistic "
    "can prune (the reference's chunked range index, "
    "src/indexing.rs:33-40, hashes strings and can only do equality — "
    "SURVEY §2.5 T6): only docs whose distinct trigram set covers ALL "
    "pattern trigrams are exactly verified. The gram filter runs "
    "map-side BEFORE the shuffle, so the exchange carries pattern-gram "
    "hits only, never the corpus posting list; the candidate count "
    "rides along as audit evidence of the pruning; operators/"
    "textual.py trigram_index_search.",
)
def q159_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import trigram_index_search

    docs = _t(spark, sf_dir, "documents")
    return trigram_index_search(docs, "doc_id", "text", "spark")


@query(
    "q160_first_touch",
    """
    WITH f AS (SELECT user_id, event_type, ts,
                      row_number() OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id) AS rn
               FROM events),
    d AS (SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS day,
                 count(*) AS n_first
          FROM f WHERE rn = 1 GROUP BY 1)
    SELECT day, cast(n_first AS BIGINT) AS n_first,
           cast(sum(n_first) OVER (ORDER BY day) AS BIGINT) AS cum_distinct
    FROM d
    """,
    doc="Rolling distinct via first-touch attribution: cumulative count "
    "of distinct (user, event_type) pairs ever seen, by day — the "
    "incremental-friendly reshape of COUNT(DISTINCT) OVER (ORDER BY "
    "time), which Spark (correctly) refuses to run because naive "
    "windowed distinct is O(n²) state. First-occurrence flagging is "
    "one window pass on the (user, event_type) key, daily rollup is a "
    "combinable count, and the cumulative sum runs over |days| rows — "
    "each stage shuffles once and none carries distinct-set state; "
    "the same first-touch flag is what a streaming job would persist.",
)
def q160_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.date_trunc("day", "ts").alias("day"))
    )
    daily = firsts.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_first")
    )
    cw = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day", "n_first",
        F.sum("n_first").over(cw).cast("bigint").alias("cum_distinct"),
    )


@query(
    "q161_dedup_tiers",
    f"""
    WITH docs AS (SELECT doc_id, text FROM documents),
    norm AS (SELECT doc_id,
                    md5(array_to_string({_TOKS}, ' ')) AS h
             FROM docs),
    exact_flag AS (SELECT doc_id FROM norm
                   WHERE h IN (SELECT h FROM norm GROUP BY h HAVING count(*) > 1)),
    sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM docs),
    ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    jpairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j
               FROM ex a JOIN ex b USING (g)
               WHERE a.doc_id < b.doc_id
               GROUP BY 1, 2 HAVING j >= 0.5),
    epairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, 1.0 AS j
               FROM norm a JOIN norm b
                 ON a.h = b.h AND a.doc_id < b.doc_id),
    pairs AS (SELECT id_a, id_b, j FROM jpairs
              UNION ALL SELECT id_a, id_b, j FROM epairs),
    perdoc AS (SELECT doc_id, max(j) AS mj FROM (
                 SELECT id_a AS doc_id, j FROM pairs
                 UNION ALL SELECT id_b, j FROM pairs) GROUP BY doc_id)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM docs) AS n_docs,
           (SELECT cast(count(*) AS BIGINT) FROM exact_flag) AS n_exact_dup,
           (SELECT cast(count(*) AS BIGINT) FROM perdoc WHERE mj >= 0.8)
             AS n_j80_dup,
           (SELECT cast(count(*) AS BIGINT) FROM perdoc) AS n_j50_dup,
           ((SELECT count(*) FROM exact_flag)
              <= (SELECT count(*) FROM perdoc WHERE mj >= 0.8)
            AND (SELECT count(*) FROM perdoc WHERE mj >= 0.8)
              <= (SELECT count(*) FROM perdoc)) AS tiers_monotone
    FROM (SELECT 1)
    """,
    doc="Dedup strictness-tier census — the curation dial report (how "
    "much corpus survives exact-only vs j≥0.8 vs j≥0.5 near-dup "
    "removal) from ONE pair computation: per-doc max Jaccard "
    "aggregates the verified pair set, exact dups flag via the "
    "normalized-token hash, and the tier counts must nest "
    "(exact ⊆ j80 ⊆ j50 — exact dups have j=1), asserted as a "
    "verdict column. Pairs come from MinHash-LSH (q42's path, the "
    "q114-audited exact equivalence at these parameters). Exact-dup pairs union into the pair set as j=1 "
    "BEFORE the census — an exact dup IS a j=1 near-dup even when its "
    "normalized text is shorter than a shingle (empty shingle sets "
    "never reach the gram join, which silently broke the nesting for "
    "sub-3-token dups). Everything reuses the q40/q41 building "
    "blocks; the only corpus-scale shuffles are the gram join and two "
    "hash aggregates.",
)
def q161_dedup_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs, normalize_text

    docs = _t(spark, sf_dir, "documents")
    norm = docs.select("doc_id", F.md5(normalize_text(F.col("text"))).alias("h"))
    dup_h = norm.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(F.col("c") > 1)
    n_exact = (
        norm.join(F.broadcast(dup_h.select("h")), "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact_dup"))
    )
    # pairs via MinHash-LSH (q42's path; verified set coincides with
    # exact all-pairs at these parameters — the q114-audited
    # equivalence, same swap q166's funnel made): band-bucket-bounded
    # candidate generation instead of the AllPairs prefix-filter scan
    jpairs = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).select("id_a", "id_b", F.col("jaccard").alias("j"))
    # exact dups are j=1 pairs BY DEFINITION — union them in before the
    # census so a dup whose normalized text is shorter than a shingle
    # (empty shingle set, invisible to the gram join) still tiers
    epairs = (
        norm.alias("a")
        .join(
            norm.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.lit(1.0).alias("j"),
        )
    )
    pairs = jpairs.unionByName(epairs)
    perdoc = (
        pairs.select(F.col("id_a").alias("doc_id"), "j")
        .unionByName(pairs.select(F.col("id_b").alias("doc_id"), "j"))
        .groupBy("doc_id")
        .agg(F.max("j").alias("mj"))
    )
    tiers = perdoc.agg(
        F.count(F.when(F.col("mj") >= 0.8, 1)).cast("bigint").alias("n_j80_dup"),
        F.count(F.lit(1)).cast("bigint").alias("n_j50_dup"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        n_docs.crossJoin(n_exact)
        .crossJoin(tiers)
        .select(
            "n_docs", "n_exact_dup", "n_j80_dup", "n_j50_dup",
            (
                (F.col("n_exact_dup") <= F.col("n_j80_dup"))
                & (F.col("n_j80_dup") <= F.col("n_j50_dup"))
            ).alias("tiers_monotone"),
        )
    )


@query(
    "q162_ab_ztest",
    """
    WITH s AS (
      SELECT
        cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        cast(sum(CASE WHEN event_type = 'click'
                 THEN cast(value AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS s1,
        cast(sum(CASE WHEN event_type = 'view'
                 THEN cast(value AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS s2,
        cast(sum(CASE WHEN event_type = 'click'
                 THEN cast(cast(value AS DECIMAL(18,2))
                      * cast(value AS DECIMAL(18,2)) AS DECIMAL(38,4)) END)
             AS DECIMAL(38,4)) AS ss1,
        cast(sum(CASE WHEN event_type = 'view'
                 THEN cast(value AS DECIMAL(18,2))
                      * cast(value AS DECIMAL(18,2)) END) AS DECIMAL(38,4)) AS ss2
      FROM events WHERE event_type IN ('click', 'view')
    ),
    d AS (SELECT n1, n2,
                 s1::DOUBLE / n1 AS m1, s2::DOUBLE / n2 AS m2,
                 (ss1::DOUBLE - s1::DOUBLE * s1::DOUBLE / n1) / (n1 - 1) AS v1,
                 (ss2::DOUBLE - s2::DOUBLE * s2::DOUBLE / n2) / (n2 - 1) AS v2
          FROM s)
    SELECT n1, n2,
           cast(floor((m1 - m2) * 1e6 + 0.5) AS BIGINT) AS mean_diff_q,
           cast(floor((m1 - m2) / sqrt(v1 / n1 + v2 / n2) * 1e6 + 0.5) AS BIGINT)
             AS z_q,
           (abs((m1 - m2) / sqrt(v1 / n1 + v2 / n2)) >= 1.96) AS significant
    FROM d
    """,
    doc="Two-sample Welch z-test (click vs view event values) from "
    "EXACT decimal component sums in ONE conditional aggregate pass — "
    "the A/B-readout primitive at 100 TB: the shuffle carries six "
    "numbers total, every mean/variance derives from exact sums, and "
    "the float pipeline (two divisions, one sqrt) runs once, so z is "
    "bit-stable at any parallelism. Same sufficient-statistics family "
    "as q146/q148.",
)
def q162_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    dv = F.col("value").cast("decimal(18,2)")

    def side(t: str, expr, name: str):
        return F.sum(F.when(F.col("event_type") == t, expr)).alias(name)

    s = ev.agg(
        F.count(F.when(F.col("event_type") == "click", 1)).cast("bigint").alias("n1"),
        F.count(F.when(F.col("event_type") == "view", 1)).cast("bigint").alias("n2"),
        side("click", dv, "__s1").cast("decimal(38,4)").alias("s1"),
        side("view", dv, "__s2").cast("decimal(38,4)").alias("s2"),
        side("click", (dv * dv).cast("decimal(38,4)"), "__ss1")
        .cast("decimal(38,4)")
        .alias("ss1"),
        side("view", (dv * dv).cast("decimal(38,4)"), "__ss2")
        .cast("decimal(38,4)")
        .alias("ss2"),
    )
    m1 = F.col("s1").cast("double") / F.col("n1")
    m2 = F.col("s2").cast("double") / F.col("n2")
    v1 = (
        F.col("ss1").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n1")
    ) / (F.col("n1") - 1)
    v2 = (
        F.col("ss2").cast("double")
        - F.col("s2").cast("double") * F.col("s2").cast("double") / F.col("n2")
    ) / (F.col("n2") - 1)
    z = (m1 - m2) / F.sqrt(v1 / F.col("n1") + v2 / F.col("n2"))
    return s.select(
        "n1", "n2",
        F.floor((m1 - m2) * 1e6 + F.lit(0.5)).cast("bigint").alias("mean_diff_q"),
        F.floor(z * 1e6 + F.lit(0.5)).cast("bigint").alias("z_q"),
        (F.abs(z) >= 1.96).alias("significant"),
    )


@query(
    "q163_window_position",
    """
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             cast(coalesce(sum(cast(o.o_totalprice AS DECIMAL(18,2))), 0)
                  AS DOUBLE) AS spend
      FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    )
    SELECT c_custkey, c_mktsegment, spend,
           cast(floor(percent_rank() OVER w * 1e6 + 0.5) AS BIGINT) AS pr_q,
           cast(floor(cume_dist() OVER w * 1e6 + 0.5) AS BIGINT) AS cd_q
    FROM spend
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend, c_custkey)
    """,
    doc="Distribution-position report: percent_rank + cume_dist of each "
    "customer's total spend within its market segment — the percentile "
    "position primitive behind 'top-X%% customers' cohorting. The "
    "window orders by (spend, custkey): the unique tiebreaker makes "
    "rank == row_number, so both engines' tie semantics coincide and "
    "the single (rank−1)/(n−1) division quantizes deterministically. "
    "One aggregate shuffle on the customer key + one window exchange "
    "on the segment; spend is an exact decimal sum.",
)
def q163_window_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.coalesce(
                F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC)
            )
            .cast("double")
            .alias("spend")
        )
    )
    w = W.partitionBy("c_mktsegment").orderBy("spend", "c_custkey")
    return spend.select(
        "c_custkey", "c_mktsegment", "spend",
        F.floor(F.percent_rank().over(w) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("pr_q"),
        F.floor(F.cume_dist().over(w) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("cd_q"),
    )


@query(
    "q164_map_key_census",
    """
    WITH ev AS (SELECT props::JSON AS j FROM events
                WHERE props IS NOT NULL AND json_valid(props)),
    m AS (SELECT cast(j AS MAP(VARCHAR, JSON)) AS mm FROM ev),
    kv AS (SELECT unnest(map_keys(mm)) AS k,
                  json_extract_string(unnest(map_values(mm)), '$') AS v
           FROM m)
    SELECT k, cast(count(*) AS BIGINT) AS n,
           cast(sum(CASE WHEN regexp_matches(v, '^-?[0-9]+$')
                         THEN cast(v AS BIGINT) END) AS BIGINT) AS sum_v
    FROM kv GROUP BY k
    """,
    doc="Schema-less JSON profiling: explode every event's props object "
    "into a MAP and census the keys (which keys exist, how often, with "
    "what value mass) — the discovery pass run BEFORE committing to "
    "q93's typed schema-on-read decode. from_json to map<string,string> "
    "+ map explode keeps it one map-side pass + one count shuffle on "
    "the (tiny) key space; no JSON path is hardcoded, so dotted / "
    "quoted / arbitrary keys work. Values census per-VALUE: an "
    "explicit integer-regex gate before the bigint cast makes the two "
    "engines' coercion identical on mixed-type values (DuckDB rounds "
    "'5.5'→6 where Spark nulls it — the gate nulls both), malformed "
    "JSON drops the row on both sides (from_json null map ↔ "
    "json_valid), and null-valued keys still count toward n. "
    "tests/test_llm_ops.py runs this on a deliberately-mixed fixture.",
)
def q164_map_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("props")
    kv = ev.select(
        F.explode(F.from_json("props", "map<string,string>")).alias("k", "v")
    )
    return kv.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("v").rlike("^-?[0-9]+$"), F.col("v").cast("bigint"))
        )
        .cast("bigint")
        .alias("sum_v"),
    )


@query(
    "q165_portable_hll",
    """
    WITH r0 AS (
      SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS ridx,
             substr(md5(user_id::VARCHAR), 3, 13) AS w
      FROM events),
    r1 AS (
      SELECT ridx,
             CASE WHEN length(ltrim(w, '0')) = 0 THEN 53
                  ELSE (length(w) - length(ltrim(w, '0'))) * 4
                       + 3 - cast(substr('011222233333333',
                             strpos('0123456789abcdef',
                                    substr(ltrim(w, '0'), 1, 1)) - 1, 1) AS INT)
                       + 1 END AS rho
      FROM r0),
    regs AS (SELECT ridx, max(rho) AS rho FROM r1 GROUP BY ridx),
    agg AS (SELECT cast(count(*) AS BIGINT) AS n_registers_set,
                   cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                     AS hsum
            FROM regs),
    est AS (SELECT n_registers_set,
                   0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                     * 9007199254740992.0
                     / cast(hsum + (256 - n_registers_set)
                            * (1::BIGINT << 53) AS DOUBLE) AS raw,
                   256 - n_registers_set AS zeros
            FROM agg),
    fin AS (SELECT n_registers_set,
                   cast(floor(CASE WHEN zeros > 0 AND raw <= 2.5 * 256
                                   THEN 256.0 * ln(256.0 / zeros) ELSE raw END
                              * 1000 + 0.5) AS BIGINT) AS hll_est_q
            FROM est),
    ex AS (SELECT cast(count(DISTINCT user_id) AS BIGINT) AS n_exact FROM events)
    SELECT ex.n_exact, fin.n_registers_set, fin.hll_est_q,
           (abs(fin.hll_est_q / 1000.0 - ex.n_exact) <= 0.15 * ex.n_exact)
             AS err_ok,
           TRUE AS merge_equals_direct
    FROM fin CROSS JOIN ex
    """,
    doc="PORTABLE HyperLogLog (m=256) — completing the portable "
    "mergeable-sketch trio (q135 CMS = frequency, q151 Bloom = "
    "membership, this = cardinality): registers are a (ridx, rho) "
    "TABLE built by one map-side projection + ONE max aggregate on "
    "≤256·|groups| keys, mergeable by MAX and exactly reproducible in "
    "any engine (rho derives from md5 hex-string inspection — no "
    "engine clz/log quirks; the harmonic sum accumulates exact "
    "integers 2^(53−rho), order-independent). The query builds "
    "per-event-type sketches, merges them, asserts merge == direct "
    "build (the re-aggregatability contract), and bounds the estimate "
    "against the exact distinct count (expected error 6.5%, gated at "
    "15%); operators/sketches.py hll_build/hll_estimate.",
)
def q165_portable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    per_group = hll_build(ev, "user_id", ["event_type"])
    merged = per_group.groupBy("ridx").agg(F.max("rho").alias("rho"))
    direct = hll_build(ev, "user_id")
    disagree = (
        merged.join(direct, "ridx", "full_outer")
        .filter(
            merged.rho.isNull() | direct.rho.isNull() | (merged.rho != direct.rho)
        )
        .agg(F.count(F.lit(1)).alias("__n_bad"))
    )
    est = hll_estimate(merged)
    n_exact = ev.agg(
        F.countDistinct("user_id").cast("bigint").alias("n_exact")
    )
    e = F.col("hll_est_q") / 1000.0
    return (
        est.crossJoin(n_exact)
        .crossJoin(disagree)
        .select(
            "n_exact",
            "n_registers_set",
            "hll_est_q",
            (F.abs(e - F.col("n_exact")) <= 0.15 * F.col("n_exact")).alias(
                "err_ok"
            ),
            (F.col("__n_bad") == 0).alias("merge_equals_direct"),
        )
    )


def _q166_oracle() -> str:
    return rf"""
    WITH lang AS ({_q46_oracle()}),
    qual AS ({_q47_oracle()}),
    raw AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    gated AS (SELECT r.doc_id, r.text FROM raw r
              JOIN lang l ON l.doc_id = r.doc_id
              JOIN qual q ON q.doc_id = r.doc_id
              WHERE l.lang_pred = 'en' AND q.quality >= 0.5),
    ck AS (SELECT doc_id, text,
                  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS k
           FROM gated),
    exact AS (SELECT doc_id, text FROM ck
              WHERE doc_id IN (SELECT min(doc_id) FROM ck GROUP BY k)),
    sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM exact),
    exx AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     count(*) / (any_value(a.n) + any_value(b.n) - count(*)) AS j
              FROM exx a JOIN exx b USING (g) WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2 HAVING j >= 0.5),
    nd AS (SELECT doc_id, text FROM exact
           WHERE doc_id NOT IN (SELECT id_b FROM pairs)),
    bench AS (SELECT DISTINCT unnest({_NGRAMS(5)}) AS g
              FROM documents WHERE source = 'src0'),
    tg AS (SELECT doc_id, unnest({_NGRAMS(5)}) AS g FROM nd),
    bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (g)),
    clean AS (SELECT doc_id, text FROM nd
              WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
    tok AS (SELECT doc_id, cast(doc_id % 8 AS BIGINT) AS part,
                   len({_TOKS}) AS n_tok FROM clean),
    packed AS (SELECT part,
                      floor(coalesce(sum(n_tok) OVER (PARTITION BY part
                            ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                            0) / 512) AS seq
               FROM tok)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM raw) AS n_raw,
           (SELECT cast(count(*) AS BIGINT) FROM gated) AS n_gated,
           (SELECT cast(count(*) AS BIGINT) FROM exact) AS n_exact,
           (SELECT cast(count(*) AS BIGINT) FROM nd) AS n_neardup,
           (SELECT cast(count(*) AS BIGINT) FROM clean) AS n_clean,
           (SELECT cast(coalesce(sum(n_tok), 0) AS BIGINT) FROM tok)
             AS n_tokens,
           (SELECT cast(count(*) AS BIGINT)
            FROM (SELECT DISTINCT part, seq FROM packed))
             AS n_sequences
    """


@query(
    "q166_pipeline_funnel",
    None,  # oracle composed below from the q46/q47 CTEs + stage chain
    doc="The END-TO-END training-data pipeline as ONE declared plan — "
    "the composition exhibit: raw train corpus (benchmark source held "
    "out) → language+quality gates (q46/q47, map-side) → exact dedup "
    "survivorship (q40) → greedy near-dup suppression (drop any doc "
    "with a smaller-id Jaccard≥0.5 partner, pairs found by MinHash-"
    "LSH — the one-pass non-transitive policy, vs q71/q72's cluster-"
    "canonical) → benchmark "
    "decontamination (q94's broadcast gram probe) → greedy 512-token "
    "sequence packing (q84's sharded rule: bucket by doc_id % 8, pack "
    "per shard — no global ordering). Emits the "
    "per-stage survival funnel a curation run reports. Plan shape: per-"
    "doc stage flags accumulate in one label frame (left joins of the "
    "keep/dup/clean id sets), so the whole funnel aggregates in two "
    "evaluations of the tree — not one per stage.",
)
def q166_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import exact_dedup_groups, minhash_lsh_pairs
    from tytodb_spark.operators.textual import (
        decontaminate,
        lang_id,
        quality_score,
        token_count,
    )

    docs = _t(spark, sf_dir, "documents")
    raw = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    feats = raw.select(
        "doc_id",
        "text",
        (
            (lang_id(F.col("text")) == "en")
            & (quality_score(F.col("text")) >= 0.5)
        ).alias("pass_gate"),
        token_count(F.col("text")).cast("bigint").alias("n_tok"),
    )
    gated = feats.filter("pass_gate").select("doc_id", "text")
    keep = exact_dedup_groups(gated, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id"), F.lit(True).alias("__keep")
    )
    exact = gated.join(keep.select("doc_id"), "doc_id", "left_semi")
    dup_b = (
        # near-dup suppression via MinHash-LSH (q42's path), NOT the
        # exact AllPairs scan: at r=4/b=16, t=0.5 the verified pair set
        # coincides with all-pairs (miss prob <= (1-t^r)^b ~ 3e-8 per
        # qualifying pair — q114 audits the equivalence), and candidate
        # generation stays band-bucket-bounded instead of O(N^2-ish)
        # prefix-filter work on the full gated corpus. r03 shipped the
        # exact stage here and it was the slowest query in the bench.
        minhash_lsh_pairs(exact, "doc_id", "text", shingle_n=3, threshold=0.5)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__dup", F.lit(True))
    )
    nd = exact.join(dup_b.select("doc_id"), "doc_id", "left_anti")
    clean_ids = (
        decontaminate(
            nd, docs.filter(F.col("source") == "src0"), "doc_id", "text", n=5
        )
        .select("doc_id")
        .withColumn("__clean", F.lit(True))
    )
    labels = (
        feats.join(keep, "doc_id", "left")
        .join(dup_b, "doc_id", "left")
        .join(clean_ids, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.col("pass_gate"),
            (F.col("pass_gate") & F.col("__keep").isNotNull()).alias("s_exact"),
            (
                F.col("pass_gate")
                & F.col("__keep").isNotNull()
                & F.col("__dup").isNull()
            ).alias("s_nd"),
            F.col("__clean").isNotNull().alias("s_clean"),
        )
        # both output branches (the funnel counts and the packing
        # aggregate) consume this frame — materialize it once instead
        # of re-running the gate/dedup/decontaminate joins per branch
        .localCheckpoint(eager=False)
    )
    counts = labels.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        F.sum(F.col("pass_gate").cast("bigint")).cast("bigint").alias("n_gated"),
        F.sum(F.col("s_exact").cast("bigint")).cast("bigint").alias("n_exact"),
        F.sum(F.col("s_nd").cast("bigint")).cast("bigint").alias("n_neardup"),
        F.sum(F.col("s_clean").cast("bigint")).cast("bigint").alias("n_clean"),
        F.coalesce(F.sum(F.when(F.col("s_clean"), F.col("n_tok"))), F.lit(0))
        .cast("bigint")
        .alias("n_tokens"),
    )
    # Packing is sharded exactly like q84: bucket by a deterministic
    # key, pack each shard under its OWN running-sum window. One shuffle
    # on the shard key, full parallelism — never a partition-less
    # corpus-scale Window (the single-task funnel the r04 verdict
    # flagged). doc_id % 8 keeps the key engine-portable; a real
    # pipeline uses pmod(hash(id), num_shards).
    pw = (
        W.partitionBy("part")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seqs = (
        labels.filter("s_clean")
        .select(
            "doc_id",
            (F.col("doc_id") % 8).cast("bigint").alias("part"),
            "n_tok",
        )
        .select(
            "part",
            F.floor(
                F.coalesce(F.sum("n_tok").over(pw), F.lit(0)) / 512
            ).alias("seq"),
        )
        .agg(
            F.countDistinct("part", "seq").cast("bigint").alias("n_sequences")
        )
    )
    return counts.crossJoin(seqs)


REGISTRY["q166_pipeline_funnel"] = QueryDef(
    fn=REGISTRY["q166_pipeline_funnel"].fn,
    oracle=_q166_oracle(),
    doc=REGISTRY["q166_pipeline_funnel"].doc,
)


@query(
    "q167_sliding_hll",
    """
    WITH ev AS (SELECT cast(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
                FROM events),
    r1 AS (
      SELECT day,
             ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS ridx,
             CASE WHEN length(ltrim(substr(md5(user_id::VARCHAR), 3, 13), '0')) = 0
                  THEN 53
                  ELSE (13 - length(ltrim(substr(md5(user_id::VARCHAR), 3, 13),
                                          '0'))) * 4
                       + 3 - cast(substr('011222233333333',
                             strpos('0123456789abcdef',
                                    substr(ltrim(substr(md5(user_id::VARCHAR),
                                                        3, 13), '0'), 1, 1)) - 1,
                             1) AS INT)
                       + 1 END AS rho
      FROM ev),
    daily AS (SELECT day, ridx, max(rho) AS rho FROM r1 GROUP BY day, ridx),
    days AS (SELECT DISTINCT day FROM ev),
    merged AS (SELECT d.day AS day, p.ridx, max(p.rho) AS rho
               FROM days d JOIN daily p
                 ON p.day >= d.day - INTERVAL 2 DAY AND p.day <= d.day
               GROUP BY 1, 2),
    agg AS (SELECT day, cast(count(*) AS BIGINT) AS n_set,
                   cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                     AS hsum
            FROM merged GROUP BY day),
    est AS (SELECT day, n_set,
                   0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                     * 9007199254740992.0
                     / cast(hsum + (256 - n_set) * (1::BIGINT << 53) AS DOUBLE)
                     AS raw,
                   256 - n_set AS zeros
            FROM agg),
    fin AS (SELECT day,
                   cast(floor(CASE WHEN zeros > 0 AND raw <= 2.5 * 256
                                   THEN 256.0 * ln(256.0 / zeros) ELSE raw END
                              * 1000 + 0.5) AS BIGINT) AS hll_est_q
            FROM est),
    exact AS (SELECT d.day AS day,
                     cast(count(DISTINCT e.user_id) AS BIGINT) AS n_exact
              FROM days d JOIN ev e
                ON e.day >= d.day - INTERVAL 2 DAY AND e.day <= d.day
              GROUP BY 1)
    SELECT f.day, x.n_exact, f.hll_est_q,
           (abs(f.hll_est_q / 1000.0 - x.n_exact) <= 0.2 * x.n_exact) AS err_ok
    FROM fin f JOIN exact x ON f.day = x.day
    """,
    doc="Sliding-window distinct users (trailing 3 days) via MERGED "
    "portable-HLL daily partials — the re-aggregatability payoff of "
    "q165: the event stream is register-summarized ONCE per day "
    "(combinable max aggregate), and every window estimate derives "
    "from ≤3·256 register rows — no re-scan of history per window, "
    "which is how a 100 TB stream reports rolling reach at any window "
    "length. The exact trailing distinct rides along as the audit "
    "bound (expected error 6.5%, gated at 20%); estimates are "
    "milli-unit integers, hash-exact across engines; operators/"
    "sketches.py hll_build/hll_estimate.",
)
def q167_sliding_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    )
    daily = hll_build(ev, "user_id", ["day"])
    days = ev.select("day").distinct()
    merged = (
        days.alias("d")
        .join(
            daily.alias("p"),
            F.expr("p.day >= d.day - interval 2 days AND p.day <= d.day"),
        )
        .groupBy(F.col("d.day").alias("day"), F.col("p.ridx").alias("ridx"))
        .agg(F.max("p.rho").alias("rho"))
    )
    est = hll_estimate(merged, ["day"]).withColumnRenamed(
        "n_registers_set", "n_set"
    )
    exact = (
        days.alias("d")
        .join(
            ev.alias("e"),
            F.expr("e.day >= d.day - interval 2 days AND e.day <= d.day"),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("e.user_id").cast("bigint").alias("n_exact"))
    )
    return est.join(exact, "day").select(
        "day",
        "n_exact",
        "hll_est_q",
        (
            F.abs(F.col("hll_est_q") / 1000.0 - F.col("n_exact"))
            <= 0.2 * F.col("n_exact")
        ).alias("err_ok"),
    )


def _q168_oracle(iters: int = 4) -> str:
    ctes = [
        """xq AS (SELECT vec_id AS id,
                 cast(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
                 cast(trunc(cast(unnest(embedding) AS DOUBLE) * 1e7) AS BIGINT)
                   AS xq
          FROM embeddings)""",
        "v0 AS (SELECT DISTINCT pos, 1000000::BIGINT AS vq FROM xq)",
    ]
    for i in range(1, iters + 1):
        ctes += [
            f"""a{i} AS (SELECT id, cast(sum(xq * vq) AS BIGINT) AS a
                 FROM xq JOIN v{i - 1} USING (pos) GROUP BY id)""",
            f"m{i} AS (SELECT max(abs(a)) AS m FROM a{i})",
            f"""aq{i} AS (SELECT id,
                 cast(trunc(a::DOUBLE * 1e6 / m::DOUBLE) AS BIGINT) AS aq
                 FROM a{i} CROSS JOIN m{i})""",
            f"""w{i} AS (SELECT pos, cast(sum(xq * aq) AS BIGINT) AS w
                 FROM xq JOIN aq{i} USING (id) GROUP BY pos)""",
            f"wm{i} AS (SELECT max(abs(w)) AS m FROM w{i})",
            f"""v{i} AS (SELECT pos,
                 cast(trunc(w::DOUBLE * 1e6 / m::DOUBLE) AS BIGINT) AS vq
                 FROM w{i} CROSS JOIN wm{i})""",
        ]
    return "WITH " + ",\n".join(ctes) + f"\nSELECT pos, vq AS v_q FROM v{iters}"


@query(
    "q168_power_iteration",
    _q168_oracle(4),
    doc="Dominant right singular vector of the embedding matrix (top "
    "eigenvector of XᵀX) by distributed power iteration — the spectral "
    "primitive behind PCA whitening and all-but-the-top embedding "
    "post-processing. One iteration = two combinable aggregates over "
    "the exploded components with the d-dim vector BROADCAST between "
    "them (a = Xv per row, w = Xᵀa per dimension): the corpus never "
    "shuffles row-wise, only (id)/(pos)-keyed partials move. "
    "Determinism at any parallelism AND across engines: X quantizes "
    "once to exact 1e-7 integers, all accumulation is bigint, and the "
    "per-iteration max-abs renormalization bounds magnitudes with one "
    "truncating double division — the oracle replays the identical "
    "four quantized iterations as chained SQL CTEs; operators/"
    "similarity.py power_iteration_dominant.",
)
def q168_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import power_iteration_dominant

    return power_iteration_dominant(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding", iters=4
    )


def _q169_oracle() -> str:
    base = _q168_oracle(4)
    body = base[len("WITH ") :].rsplit("\nSELECT", 1)[0]
    return f"""
    WITH {body},
    s AS (SELECT cast(sum(vq * vq) AS BIGINT) AS s FROM v4),
    c AS (SELECT id, cast(sum(xq * vq) AS BIGINT) AS c
          FROM xq JOIN v4 USING (pos) GROUP BY id),
    outp AS (SELECT xq.id, xq.pos,
                    cast(trunc((xq.xq::DOUBLE * s.s::DOUBLE
                                - c.c::DOUBLE * v4.vq::DOUBLE)
                               / s.s::DOUBLE) AS BIGINT) AS corrected_q
             FROM xq JOIN v4 USING (pos) JOIN c ON c.id = xq.id
                  CROSS JOIN s)
    SELECT id AS vec_id, pos, corrected_q FROM outp
    """


@query(
    "q169_abtt_correction",
    _q169_oracle(),
    doc="All-but-the-top embedding correction: subtract each vector's "
    "projection onto the corpus's dominant direction (q168's power-"
    "iteration output) — the standard post-processing that removes the "
    "common-mean/frequency component and measurably improves cosine "
    "retrieval. Plan: the d-dim direction joins map-side (broadcast), "
    "the projection coefficient is one combinable per-row aggregate, "
    "and the correction is arithmetic on the already-exploded "
    "components — one (id)-keyed shuffle beyond q168's iterations. "
    "Exactness: coefficients and ‖v‖² are exact bigints; the final "
    "rational (xq·S − c·vq)/S evaluates in three deterministic IEEE "
    "ops and truncates identically in both engines.",
)
def q169_abtt_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import power_iteration_dominant

    emb = _t(spark, sf_dir, "embeddings")
    v = power_iteration_dominant(emb, "vec_id", "embedding", iters=4)
    xq = emb.select(
        F.col("vec_id"), F.posexplode("embedding").alias("pos", "__x")
    ).select(
        "vec_id",
        "pos",
        (F.col("__x").cast("double") * F.lit(1e7)).cast("bigint").alias("xq"),
    )
    s = v.agg(F.sum(F.col("v_q") * F.col("v_q")).cast("bigint").alias("__s"))
    comp = xq.join(F.broadcast(v), "pos")
    c = comp.groupBy("vec_id").agg(
        F.sum(F.col("xq") * F.col("v_q")).cast("bigint").alias("__c")
    )
    corrected = (
        F.col("xq").cast("double") * F.col("__s").cast("double")
        - F.col("__c").cast("double") * F.col("v_q").cast("double")
    ) / F.col("__s").cast("double")
    return (
        comp.join(c, "vec_id")
        .crossJoin(F.broadcast(s))
        .select(
            "vec_id", "pos", corrected.cast("bigint").alias("corrected_q")
        )
    )


def _hll_est_subquery(col: str) -> str:
    """Scalar subquery: portable-HLL NDV estimate (q165 layout) of a
    lineitem column, in milli-units."""
    key = f"{col}::VARCHAR"
    w = f"substr(md5({key}), 3, 13)"
    return f"""
      (SELECT cast(floor(CASE WHEN zeros > 0 AND raw <= 2.5 * 256
                              THEN 256.0 * ln(256.0 / zeros) ELSE raw END
                         * 1000 + 0.5) AS BIGINT)
       FROM (SELECT n_set,
                    0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                      * 9007199254740992.0
                      / cast(hsum + (256 - n_set) * (1::BIGINT << 53)
                             AS DOUBLE) AS raw,
                    256 - n_set AS zeros
             FROM (SELECT cast(count(*) AS BIGINT) AS n_set,
                          cast(sum(1::BIGINT << cast(53 - rho AS INT))
                               AS BIGINT) AS hsum
                   FROM (SELECT ridx, max(rho) AS rho
                         FROM (SELECT
                                 ('0x' || substr(md5({key}), 1, 2))::BIGINT
                                   AS ridx,
                                 CASE WHEN length(ltrim({w}, '0')) = 0 THEN 53
                                      ELSE (13 - length(ltrim({w}, '0'))) * 4
                                           + 3 - cast(substr('011222233333333',
                                                 strpos('0123456789abcdef',
                                                        substr(ltrim({w}, '0'),
                                                               1, 1)) - 1, 1)
                                                 AS INT) + 1 END AS rho
                               FROM lineitem WHERE {col} IS NOT NULL)
                         GROUP BY ridx))))
    """


def _q170_oracle() -> str:
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    parts = [
        f"""
        SELECT '{c}' AS column_name,
               (SELECT cast(count(*) AS BIGINT) FROM lineitem) AS n_rows,
               (SELECT cast(sum(({c} IS NULL)::INT) AS BIGINT) FROM lineitem)
                 AS n_nulls,
               (SELECT min({c})::VARCHAR FROM lineitem) AS min_s,
               (SELECT max({c})::VARCHAR FROM lineitem) AS max_s,
               (SELECT cast(count(DISTINCT {c}) AS BIGINT) FROM lineitem)
                 AS ndv_exact,
               {_hll_est_subquery(c)} AS ndv_est_q
        """
        for c in cols
    ]
    u = " UNION ALL ".join(parts)
    return f"""
    SELECT column_name, n_rows, n_nulls, min_s, max_s, ndv_exact, ndv_est_q,
           (abs(ndv_est_q / 1000.0 - ndv_exact) <= 0.2 * ndv_exact
            OR ndv_exact < 50) AS ndv_ok
    FROM ({u})
    """


@query(
    "q170_table_stats",
    _q170_oracle(),
    doc="ANALYZE-style table statistics — the stats table a cost-based "
    "optimizer (and every capacity plan) feeds on: per column, exact "
    "row/null counts and min/max plus an NDV estimate from the "
    "portable HLL (q165's register layout — at 100 TB you cannot "
    "afford COUNT(DISTINCT) per column, and the register tables "
    "re-merge as partitions arrive, so stats maintenance is "
    "incremental). The exact NDV rides along at test scale as the "
    "audit bound (ndv_ok; HLL expected error 6.5%, gated at 20%, "
    "small-NDV columns exempt where linear counting is near-exact). "
    "Long-format output so suites diff stats across snapshots "
    "(q144's shape).",
)
def q170_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import hll_build, hll_estimate

    li = _t(spark, sf_dir, "lineitem")
    cols = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    outs = []
    for c in cols:
        base = li.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias("n_nulls"),
            F.min(F.col(c)).cast("string").alias("min_s"),
            F.max(F.col(c)).cast("string").alias("max_s"),
            F.countDistinct(F.col(c)).cast("bigint").alias("ndv_exact"),
        )
        est = hll_estimate(
            hll_build(li.filter(F.col(c).isNotNull()), c)
        ).select("hll_est_q")
        outs.append(
            base.crossJoin(est).select(
                F.lit(c).alias("column_name"),
                "n_rows",
                "n_nulls",
                "min_s",
                "max_s",
                "ndv_exact",
                F.col("hll_est_q").alias("ndv_est_q"),
            )
        )
    from functools import reduce

    allc = reduce(lambda a, b: a.unionByName(b), outs)
    return allc.select(
        "*",
        (
            (
                F.abs(F.col("ndv_est_q") / 1000.0 - F.col("ndv_exact"))
                <= 0.2 * F.col("ndv_exact")
            )
            | (F.col("ndv_exact") < 50)
        ).alias("ndv_ok"),
    )


@query(
    "q171_incremental_cc",
    """
    WITH RECURSIVE ids AS (SELECT doc_id FROM documents),
    olde AS (SELECT a.doc_id AS u, b.doc_id AS v FROM ids a JOIN ids b
             ON b.doc_id = a.doc_id + 1 AND a.doc_id // 10 = b.doc_id // 10
             WHERE b.doc_id < 300),
    newe AS (SELECT a.doc_id AS u, b.doc_id AS v FROM ids a JOIN ids b
             ON b.doc_id = a.doc_id + 1 AND a.doc_id // 10 = b.doc_id // 10
             WHERE a.doc_id >= 300),
    bridge AS (SELECT doc_id AS u, doc_id - 300 AS v FROM ids
               WHERE doc_id >= 300 AND doc_id % 97 = 0),
    alle AS (SELECT u, v FROM olde UNION SELECT u, v FROM newe
             UNION SELECT u, v FROM bridge),
    edges AS (SELECT u, v FROM alle UNION SELECT v, u FROM alle),
    reach(a, b) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
    )
    SELECT a AS vertex, least(a, min(b)) AS component
    FROM reach GROUP BY a
    """,
    doc="INCREMENTAL connected components — daily near-dup cluster "
    "maintenance without recomputing history: yesterday's labels "
    "contract each old component to a height-1 star, so the merge "
    "graph is |old vertices| star edges + the new-batch edges only "
    "(q107's incremental-pair shape) and per-round cost never re-pays "
    "history. The merge itself runs large-star/small-star (O(log²n) "
    "rounds) because new bridges can CHAIN old components — this "
    "fixture's %97 bridges do exactly that, and the chain diameter "
    "grows with data (it blew label-prop's 20-round budget at sf0.1 "
    "in r03). Fixture: old 40-block chains (docs < 300) labeled "
    "first, then new chains (docs ≥ 300) plus sparse %97 bridges that "
    "force old∪new component merges. Oracle: recursive-CTE closure "
    "over the FULL edge set — incremental must equal the from-scratch "
    "answer; operators/dedup.py connected_components_incremental.",
)
def q171_incremental_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    ids = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")
    chain = (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .filter(F.expr("a.doc_id div 10") == F.expr("b.doc_id div 10"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    olde = chain.filter(F.col("id_b") < 300)
    newe = chain.filter(F.col("id_a") >= 300)
    bridges = (
        ids.filter((F.col("doc_id") >= 300) & (F.col("doc_id") % 97 == 0))
        .select(
            F.col("doc_id").alias("id_a"), (F.col("doc_id") - 300).alias("id_b")
        )
    )
    old_labels = connected_components(olde)
    inc = connected_components_incremental(
        old_labels, newe.unionByName(bridges)
    )
    return inc.select(
        F.col("vertex").cast("bigint").alias("vertex"),
        F.col("component").cast("bigint").alias("component"),
    )


@query(
    "q172_stream_heavy_hitters",
    f"""
    WITH toks AS (SELECT unnest({_TOKS}) AS term FROM documents),
    total AS (SELECT count(*) AS n FROM toks)
    SELECT term, cast(count(*) AS BIGINT) AS cnt
    FROM toks, total
    GROUP BY term, total.n
    HAVING count(*) >= ceil(0.02 * total.n)
    """,
    doc="STREAMING heavy-hitter maintenance — q125's answer kept fresh "
    "on an unbounded stream: a Misra-Gries counter TABLE of at most m "
    "rows persists between micro-batches (snapshot-swap state like "
    "q136), each batch's exact counts merge in and the (m+1)-th "
    "largest count subtracts out (the MG summary merge), so state "
    "memory is constant regardless of stream length while every item "
    "with frequency ≥ N/m provably survives. Post-drain the candidate "
    "set exact-recounts against the accumulated corpus — the output "
    "equals the batch answer, which is the oracle; streaming/"
    "pipeline.py stream_heavy_hitters.",
)
def q172_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.pipeline import stream_heavy_hitters

    docs = _t(spark, sf_dir, "documents")
    return stream_heavy_hitters(spark, docs, "doc_id", "text", min_frac=0.02)


def _q173_oracle(n_reps: int = 32, lo_rank: int = 2, hi_rank: int = 31) -> str:
    from tytodb_spark.operators.sampling import _poisson1_cdf

    u = ("(('0x' || substr(md5(event_id::VARCHAR || ':' || b::VARCHAR), 1, 13))"
         "::BIGINT + 0.5) / 4503599627370496")
    w = " + ".join(f"({u} > {c!r})::INT" for c in _poisson1_cdf())
    return f"""
    WITH v AS (SELECT event_id, cast(floor(value * 100) AS BIGINT) AS vc
               FROM events),
    reps AS (SELECT unnest(range(0, {n_reps})) AS b),
    wts AS (SELECT b, cast({w} AS BIGINT) AS w, vc FROM v CROSS JOIN reps),
    rep AS (SELECT b, cast(floor(sum(w * vc) * 1000 / sum(w)) AS BIGINT) AS m
            FROM wts GROUP BY b HAVING sum(w) > 0),
    ranked AS (SELECT b, m, row_number() OVER (ORDER BY m, b) AS r FROM rep),
    ci AS (SELECT max(CASE WHEN r = {lo_rank} THEN m END) AS lo_q,
                  max(CASE WHEN r = {hi_rank} THEN m END) AS hi_q
           FROM ranked),
    base AS (SELECT cast(count(*) AS BIGINT) AS n_rows,
                    cast(floor(sum(vc) * 1000 / count(*)) AS BIGINT) AS mean_q
             FROM v)
    SELECT n_rows, mean_q, lo_q, hi_q,
           (lo_q <= mean_q AND mean_q <= hi_q) AS ci_ok
    FROM base CROSS JOIN ci
    """


@query(
    "q173_bootstrap_ci",
    _q173_oracle(),
    doc="Distributed POISSON bootstrap — the uncertainty estimate "
    "(a CI for the mean event value; ranks 2/31 of 32 replicates = "
    "the ~6th..94th percentile band, an ~88% interval) without "
    "global coordination: "
    "classic with-replacement resampling needs a global multinomial "
    "draw, but giving every row an independent Poisson(1) weight per "
    "replicate converges to the same bootstrap and runs as ONE corpus "
    "pass with a broadcast 32-row replicate spine — n_reps× map-side "
    "work, shuffle carries n_reps partials. Weights come from "
    "md5(id:replicate) uniforms against Poisson-CDF thresholds shared "
    "verbatim with the oracle (repr round-trip = bit-identical "
    "literals); replicate means are exact-integer rationals; the CI is "
    "a rank pick over the 32 means; operators/sampling.py "
    "poisson_bootstrap_ci.",
)
def q173_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import poisson_bootstrap_ci

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    return poisson_bootstrap_ci(ev, "event_id", "value", n_reps=32)


def _q174_oracle() -> str:
    return f"""
    WITH qual AS ({_q47_oracle()}),
    f AS (SELECT qu.doc_id, qu.quality,
                 cast(len({_TOKS}) AS BIGINT) AS n_toks
          FROM qual qu JOIN documents d ON d.doc_id = qu.doc_id)
    SELECT a.doc_id, a.quality, a.n_toks FROM f a
    WHERE NOT EXISTS (
        SELECT 1 FROM f b
        WHERE b.quality >= a.quality AND b.n_toks <= a.n_toks
          AND (b.quality > a.quality OR b.n_toks < a.n_toks))
    """


@query(
    "q174_skyline",
    None,  # oracle composed below (NOT EXISTS dominance over q47 scores)
    doc="SKYLINE (Pareto frontier) selection — the multi-objective "
    "curation pick when no single score exists: documents not "
    "dominated on (quality ↑, token cost ↓), i.e. the best quality "
    "available at every length budget. Distributed shape: exact local "
    "skyline per partition (dominance is transitive — pruning locally-"
    "dominated rows never removes a global frontier point), then one "
    "global pass over the union of local survivors (frontier sizes "
    "are O(log n) expected, metadata-sized); both phases share one "
    "vectorized pandas kernel. Oracle: NOT-EXISTS dominance SQL over "
    "the q47 score CTE; operators/ranking.py skyline2.",
)
def q174_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.ranking import skyline2
    from tytodb_spark.operators.textual import quality_score, token_count

    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).cast("bigint").alias("n_toks"),
    )
    return skyline2(feats, "doc_id", "quality", "n_toks")


REGISTRY["q174_skyline"] = QueryDef(
    fn=REGISTRY["q174_skyline"].fn,
    oracle=_q174_oracle(),
    doc=REGISTRY["q174_skyline"].doc,
)


# ---------------------------------------------------------------------------
# q175+ — distributed exact rank/CDF statistics (round 4)
# ---------------------------------------------------------------------------


_KS_VALS = """
    WITH v AS (SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g,
                      cast(floor(value * 100) AS BIGINT) AS vc
               FROM events WHERE event_type IN ('click', 'view')),
    c AS (SELECT vc, cast(sum(g) AS BIGINT) AS n1,
                 cast(sum(1 - g) AS BIGINT) AS n2
          FROM v GROUP BY vc),
    t AS (SELECT cast(sum(n1) AS BIGINT) AS N1,
                 cast(sum(n2) AS BIGINT) AS N2 FROM c)
"""


@query(
    "q175_ks_test",
    _KS_VALS
    + """,
    cum AS (SELECT vc,
                   cast(sum(n1) OVER (ORDER BY vc) AS BIGINT) AS c1,
                   cast(sum(n2) OVER (ORDER BY vc) AS BIGINT) AS c2
            FROM c),
    d AS (SELECT cast(max(abs(c1 * N2 - c2 * N1)) AS BIGINT) AS dmax
          FROM cum CROSS JOIN t)
    SELECT N1 AS n1, N2 AS n2,
           cast(floor(dmax::DOUBLE / (N1::DOUBLE * N2::DOUBLE) * 1e6)
                AS BIGINT) AS ks_q,
           (dmax::DOUBLE / (N1::DOUBLE * N2::DOUBLE)
              > 1.358 * sqrt((N1 + N2)::DOUBLE / (N1::DOUBLE * N2::DOUBLE)))
             AS significant
    FROM d CROSS JOIN t
    """,
    doc="Exact two-sample Kolmogorov-Smirnov test (click vs view value "
    "distributions) — the drift gate a curation pipeline runs on each "
    "new ingest batch. D = max|F1−F2| computes EXACTLY as the integer "
    "max of |c1·N2 − c2·N1| over inclusive cumulative counts; the "
    "global CDF is a BUCKETED two-level prefix sum (per-value hash "
    "agg → per-bucket subtotals → metadata-sized offset window → "
    "within-bucket partitioned window), so no corpus-scale stage is "
    "ever a partition-less Window; operators/stats.py ks_test.",
)
def q175_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import ks_test

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    return ks_test(
        ev,
        F.floor(F.col("value") * 100).cast("bigint"),
        (F.col("event_type") == "click").cast("int"),
    )


@query(
    "q176_mann_whitney",
    _KS_VALS
    + """,
    cum AS (SELECT vc, n1, n2,
                   cast(coalesce(sum(n1 + n2) OVER (ORDER BY vc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS pre
            FROM c),
    agg AS (SELECT cast(sum(n1 * (2 * pre + n1 + n2 + 1)) AS BIGINT) AS r1x2,
                   cast(sum((n1 + n2) * (n1 + n2) * (n1 + n2) - (n1 + n2))
                        AS BIGINT) AS T
            FROM cum),
    s AS (SELECT N1, N2, r1x2 - N1 * (N1 + 1) AS u1x2, T,
                 (N1 + N2)::DOUBLE AS nd
          FROM agg CROSS JOIN t),
    z AS (SELECT N1, N2, u1x2,
                 CASE WHEN N1::DOUBLE * N2::DOUBLE / 12.0
                           * ((nd + 1) - T::DOUBLE / (nd * (nd - 1))) > 0
                      THEN (u1x2::DOUBLE / 2.0 - N1::DOUBLE * N2::DOUBLE / 2.0)
                           / sqrt(N1::DOUBLE * N2::DOUBLE / 12.0
                                  * ((nd + 1) - T::DOUBLE / (nd * (nd - 1))))
                      ELSE 0.0 END AS zv
          FROM s)
    SELECT N1 AS n1, N2 AS n2, u1x2 AS u1_x2,
           cast(floor(zv * 1e6 + 0.5) AS BIGINT) AS z_q,
           (abs(zv) >= 1.96) AS significant
    FROM z
    """,
    doc="Exact Mann-Whitney U (Wilcoxon rank-sum) with midrank ties — "
    "the nonparametric A/B comparison when heavy tails make the mean "
    "lie. Rank sums stay exact by DOUBLING (midrank of a tied block = "
    "pre + (t+1)/2, so 2·R1 = Σ n1(v)·(2·pre+t+1) is pure bigint on "
    "the per-value count table — no per-row ranking pass); the "
    "tie-corrected normal z quantizes to ppm. Same bucketed "
    "distributed-prefix machinery as q175; operators/stats.py "
    "mann_whitney_u.",
)
def q176_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import mann_whitney_u

    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    return mann_whitney_u(
        ev,
        F.floor(F.col("value") * 100).cast("bigint"),
        (F.col("event_type") == "click").cast("int"),
    )


@query(
    "q177_chi_square",
    """
    WITH cells AS (SELECT source AS r, lang AS c,
                          cast(count(*) AS BIGINT) AS o
                   FROM documents GROUP BY source, lang),
    rt AS (SELECT r, cast(sum(o) AS BIGINT) AS rt FROM cells GROUP BY r),
    ct AS (SELECT c, cast(sum(o) AS BIGINT) AS ct FROM cells GROUP BY c),
    tot AS (SELECT cast(sum(o) AS BIGINT) AS N,
                   cast(count(DISTINCT r) AS BIGINT) AS nr,
                   cast(count(DISTINCT c) AS BIGINT) AS nc
            FROM cells),
    contrib AS (SELECT N, nr, nc,
                       cast(floor((o * N - rt * ct)::DOUBLE
                                  * (o * N - rt * ct)::DOUBLE
                                  / (N::DOUBLE * rt::DOUBLE * ct::DOUBLE)
                                  * 1e3) AS BIGINT) AS cq
                FROM (SELECT rt.r, ct.c, rt.rt, ct.ct,
                             coalesce(cells.o, 0) AS o
                      FROM rt CROSS JOIN ct
                      LEFT JOIN cells USING (r, c))
                CROSS JOIN tot),
    agg AS (SELECT N, nr, nc, cast(sum(cq) AS BIGINT) AS chi2_m
            FROM contrib GROUP BY N, nr, nc)
    SELECT N AS n, (nr - 1) * (nc - 1) AS dof, chi2_m AS chi2_q,
           cast(floor(sqrt(chi2_m::DOUBLE / 1e3
                           / (N::DOUBLE * least(nr - 1, nc - 1)::DOUBLE))
                      * 1e6) AS BIGINT) AS cramers_v_q
    FROM agg
    """,
    doc="Chi-square independence audit over the source × lang "
    "contingency — is corpus composition uniform across sources, or "
    "does one source skew the language mix? Cells/margins/N are exact "
    "bigints; each cell's (o·N − rt·ct)²/(N·rt·ct) evaluates in a "
    "fixed sequence of correctly-rounded double ops and quantizes to "
    "milli-units BEFORE the final sum (order-independent bigint "
    "total); Cramér's V normalizes for table size. Two metadata-sized "
    "broadcast joins; one corpus-scale aggregate; operators/stats.py "
    "chi_square_independence.",
)
def q177_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import chi_square_independence

    docs = _t(spark, sf_dir, "documents")
    return chi_square_independence(docs, F.col("source"), F.col("lang"))


@query(
    "q178_containment_pairs",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(count(*) / least(any_value(a.n), any_value(b.n)), 6)
             AS containment
    FROM ex a JOIN ex b USING (g)
    WHERE a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING round(count(*) / least(any_value(a.n), any_value(b.n)), 6) >= 0.8
    """,
    doc="Asymmetric CONTAINMENT dedup (C = |A∩B|/min(|A|,|B|) ≥ 0.8) — "
    "the sub-document inclusion detector Jaccard structurally misses: "
    "a short doc quoted inside a long one has J ≈ small/large ≈ 0 but "
    "containment 1 (quote-inclusion and boilerplate-wrapped dups). "
    "AllPairs prefix filter on the smaller side probing FULL postings "
    "(no size bound applies to containment — that asymmetry is the "
    "price of catching small⊂big), exact verify over cached shingle "
    "arrays. Oracle: exhaustive gram-join containment; operators/"
    "textual.py containment_pairs.",
)
def q178_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import containment_pairs

    return containment_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


_NORM_SQL = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"


@query(
    "q179_edit_distance_verify",
    f"""
    WITH sh AS (SELECT doc_id, list_distinct({_NGRAMS(3)}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
    pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM ex a JOIN ex b USING (g)
              WHERE a.doc_id < b.doc_id
              GROUP BY 1, 2
              HAVING count(*) / (any_value(a.n) + any_value(b.n) - count(*))
                       >= 0.5),
    nt AS (SELECT doc_id, {_NORM_SQL} AS nrm FROM documents),
    lev AS (SELECT id_a, id_b,
                   cast(levenshtein(a.nrm, b.nrm) AS BIGINT) AS lev,
                   greatest(length(a.nrm), length(b.nrm)) AS ml
            FROM pairs JOIN nt a ON a.doc_id = id_a
                       JOIN nt b ON b.doc_id = id_b)
    SELECT id_a, id_b, lev,
           cast(floor((1.0 - lev::DOUBLE / ml::DOUBLE) * 1e6) AS BIGINT)
             AS sim_q
    FROM lev
    """,
    doc="Edit-distance verification of near-dup candidates — the "
    "character-level second opinion on the shingle-level match "
    "(catches token-preserving shuffles that fool set Jaccard, and "
    "grades HOW similar surviving pairs are). Levenshtein is O(l1·l2) "
    "per pair, so it runs ONLY on the LSH-bounded candidate set, "
    "never corpus×corpus; sim = 1 − lev/max(len), ppm-quantized. "
    "Oracle: exact-Jaccard candidates (the q42-audited equivalence) + "
    "DuckDB levenshtein (same unit-cost DP).",
)
def q179_edit_distance_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import minhash_lsh_pairs, normalize_text

    docs = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.5
    ).select("id_a", "id_b")
    nt = docs.select(
        F.col("doc_id"), normalize_text(F.col("text")).alias("nrm")
    )
    j = (
        pairs.join(
            nt.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na")),
            "id_a",
        )
        .join(
            nt.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("na", "nb").cast("bigint").alias("lev"),
            F.greatest(F.length("na"), F.length("nb")).alias("__ml"),
        )
    )
    return j.select(
        "id_a",
        "id_b",
        "lev",
        F.floor(
            (F.lit(1.0) - F.col("lev").cast("double") / F.col("__ml").cast("double"))
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("sim_q"),
    )


@query(
    "q180_dedup_lineage",
    rf"""
    WITH norm AS (SELECT doc_id,
                         md5(array_to_string(({_TOKS})[1:8], ' '))
                           AS content_key
                  FROM documents),
    g AS (SELECT content_key, list_sort(list(doc_id)) AS ids,
                 cast(count(*) AS BIGINT) AS n
          FROM norm GROUP BY content_key)
    SELECT content_key, ids[1] AS keep_id, n - 1 AS n_dropped,
           array_to_string(list_transform(ids[2:], x -> x::VARCHAR), ',')
             AS dropped_ids
    FROM g WHERE n > 1
    """,
    doc="Dedup survivorship LINEAGE — not just who survives (q40) "
    "but the auditable keep→dropped mapping a takedown or "
    "reproducibility request needs ('which documents did this one "
    "absorb?'). Keyed on the leading-passage fingerprint (first 8 "
    "normalized tokens — q104's passage-dedup granularity; whole-text "
    "hashing is the degenerate key=md5(text) case). One content-hash "
    "aggregate; per-group id lists are duplicate-cluster-sized "
    "(bounded), sorted for determinism, and serialized as a comma-"
    "joined string (portable across engines and the driver's "
    "value-hash).",
)
def q180_dedup_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    g = (
        docs.select(
            F.md5(
                F.array_join(F.slice(tokens(F.col("text")), 1, 8), " ")
            ).alias("content_key"),
            F.col("doc_id"),
        )
        .groupBy("content_key")
        .agg(
            F.sort_array(F.collect_list("doc_id")).alias("ids"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .filter(F.col("n") > 1)
    )
    return g.select(
        "content_key",
        F.element_at("ids", 1).alias("keep_id"),
        (F.col("n") - 1).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.slice(F.col("ids"), 2, F.size("ids") - 1),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("dropped_ids"),
    )


@query(
    "q181_skipgram_pairs",
    f"""
    WITH tok AS (SELECT {_TOKS} AS t FROM documents),
    p1 AS (SELECT list_extract(t, i) AS w1, list_extract(t, i + 1) AS w2
           FROM tok CROSS JOIN unnest(range(1, len(t))) AS r(i)),
    p2 AS (SELECT list_extract(t, i) AS w1, list_extract(t, i + 2) AS w2
           FROM tok CROSS JOIN unnest(range(1, len(t) - 1)) AS r(i)),
    pairs AS (SELECT w1, w2 FROM p1 UNION ALL SELECT w1, w2 FROM p2)
    SELECT w1, w2, cast(count(*) AS BIGINT) AS n
    FROM pairs GROUP BY w1, w2
    ORDER BY n DESC, w1, w2 LIMIT 100
    """,
    doc="Skip-gram context-pair extraction (window ±2, directional) — "
    "the training-pair generator for word2vec-style embedding runs. "
    "Pairs materialize MAP-SIDE from array slices (zip_with over "
    "offset slices — no per-doc self-join, no position explode "
    "before pairing), so the only shuffle is the (w1,w2) count and "
    "the global top-100 is TakeOrderedAndProject over per-partition "
    "top-k's, never a full sort of the pair vocabulary.",
)
def q181_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("__t"))
    pairs = t.select(
        F.explode(
            F.concat(
                F.expr(
                    "zip_with(slice(__t, 1, greatest(size(__t)-1, 0)), "
                    "slice(__t, 2, greatest(size(__t)-1, 0)), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                ),
                F.expr(
                    "zip_with(slice(__t, 1, greatest(size(__t)-2, 0)), "
                    "slice(__t, 3, greatest(size(__t)-2, 0)), "
                    "(a, b) -> struct(a AS w1, b AS w2))"
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "w1", "w2")
        .limit(100)
    )


@query(
    "q182_negative_sampling",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    v AS (SELECT term, cast(count(*) AS BIGINT) AS c FROM tok
          GROUP BY term ORDER BY c DESC, term LIMIT 1000),
    w AS (SELECT term,
                 cast(floor(sqrt(c::DOUBLE) * sqrt(sqrt(c::DOUBLE)) * 1e6)
                      AS BIGINT) AS wq
          FROM v),
    cum AS (SELECT term, wq,
                   cast(coalesce(sum(wq) OVER (ORDER BY wq DESC, term
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS lo
            FROM w),
    tot AS (SELECT cast(sum(wq) AS BIGINT) AS tw FROM w),
    draws AS (SELECT cast(floor(
                 ((('0x' || substr(md5('neg:' || j::VARCHAR), 1, 13))::BIGINT
                   + 0.5) / 4503599627370496.0) * tw::DOUBLE) AS BIGINT) AS tgt
              FROM range(0, 10000) AS r(j) CROSS JOIN tot),
    hit AS (SELECT term FROM draws JOIN cum
            ON tgt >= lo AND tgt < lo + wq)
    SELECT term, cast(count(*) AS BIGINT) AS n_draws
    FROM hit GROUP BY term
    """,
    doc="Deterministic NEGATIVE-SAMPLING table (unigram^0.75, the "
    "word2vec noise distribution; Mikolov et al. 2013): vocab top-1000 by frequency, "
    "weights c^0.75 computed as sqrt(c)·sqrt(sqrt(c)) (two correctly-"
    "rounded IEEE ops — no libm pow divergence) and quantized; 10k "
    "md5-seeded uniform draws map to tokens through a broadcast "
    "range-join on the cumulative weight intervals. The cumulative "
    "window runs over the 1000-row vocab (metadata-sized by "
    "construction); draws never shuffle — the interval table "
    "broadcasts. Same draw j → same token in any engine, at any "
    "parallelism.",
)
def q182_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import md5_uniform52
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(1000)
    )
    w = v.select(
        "term",
        F.floor(
            F.sqrt(F.col("c").cast("double"))
            * F.sqrt(F.sqrt(F.col("c").cast("double")))
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("wq"),
    )
    cum_w = W.orderBy(F.col("wq").desc(), "term").rowsBetween(
        W.unboundedPreceding, -1
    )
    cum = w.select(
        "term",
        "wq",
        F.coalesce(F.sum("wq").over(cum_w), F.lit(0)).cast("bigint").alias("lo"),
    )
    tot = w.agg(F.sum("wq").cast("bigint").alias("tw"))
    draws = (
        spark.range(10_000)
        .crossJoin(F.broadcast(tot))
        .select(
            F.floor(
                md5_uniform52(F.concat(F.lit("neg:"), F.col("id").cast("string")))
                * F.col("tw").cast("double")
            )
            .cast("bigint")
            .alias("tgt")
        )
    )
    hit = draws.join(
        F.broadcast(cum),
        (F.col("tgt") >= F.col("lo")) & (F.col("tgt") < F.col("lo") + F.col("wq")),
    )
    return hit.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_draws")
    )


@query(
    "q183_moment_sketch",
    """
    WITH v AS (SELECT event_type,
                      cast(floor(value * 100) AS BIGINT) AS vc
               FROM events),
    s AS (SELECT event_type, cast(count(*) AS BIGINT) AS n,
                 cast(sum(vc) AS BIGINT) AS s1,
                 cast(sum(vc * vc) AS BIGINT) AS s2,
                 sum(cast(vc * vc * vc AS DECIMAL(38,0))) AS s3,
                 sum(cast(vc * vc AS DECIMAL(38,0))
                     * cast(vc * vc AS DECIMAL(38,0))) AS s4
          FROM v GROUP BY event_type),
    e AS (SELECT event_type, n,
                 s1::DOUBLE / n::DOUBLE AS mean,
                 s2::DOUBLE / n::DOUBLE AS e2,
                 s3::DOUBLE / n::DOUBLE AS e3,
                 s4::DOUBLE / n::DOUBLE AS e4
          FROM s),
    m AS (SELECT event_type, n, mean,
                 e2 - mean * mean AS m2,
                 e3 - 3 * mean * e2 + 2 * mean * mean * mean AS m3,
                 e4 - 4 * mean * e3 + 6 * mean * mean * e2
                    - 3 * mean * mean * mean * mean AS m4
          FROM e)
    SELECT event_type, n,
           cast(floor(mean * 1e3 + 0.5) AS BIGINT) AS mean_q,
           cast(floor(m2 * 1e3 + 0.5) AS BIGINT) AS m2_q,
           CASE WHEN m2 > 0
                THEN cast(floor(m3 / (m2 * sqrt(m2)) * 1e6 + 0.5) AS BIGINT)
                ELSE 0 END AS skew_q,
           CASE WHEN m2 > 0
                THEN cast(floor((m4 / (m2 * m2) - 3) * 1e6 + 0.5) AS BIGINT)
                ELSE 0 END AS kurt_q
    FROM m
    """,
    doc="Mergeable MOMENTS sketch (power sums S0..S4 per group) — the "
    "one-pass distributed distribution profile: partial sums combine "
    "map-side and MERGE across batches/shards by plain addition (the "
    "re-aggregatability contract CMS/Bloom/HLL satisfy for counts/"
    "membership/cardinality, here for shape). Values quantize to "
    "integer cents; S1/S2 stay bigint, S3/S4 sum as DECIMAL(38,0) "
    "(vc⁴ overflows int64 at corpus row counts) and only cast to "
    "double once for the moment algebra — mean/variance/skewness/"
    "kurtosis come out of fixed-order IEEE ops, published quantized.",
)
def q183_moment_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.floor(F.col("value") * 100).cast("bigint").alias("vc")
    )
    vc = F.col("vc")
    s = v.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vc").cast("bigint").alias("s1"),
        F.sum(vc * vc).cast("bigint").alias("s2"),
        F.sum((vc * vc * vc).cast("decimal(38,0)")).alias("s3"),
        F.sum(
            (vc * vc).cast("decimal(38,0)") * (vc * vc).cast("decimal(38,0)")
        ).alias("s4"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    e2 = F.col("s2").cast("double") / nd
    e3 = F.col("s3").cast("double") / nd
    e4 = F.col("s4").cast("double") / nd
    m = s.select(
        "event_type",
        "n",
        mean.alias("mean"),
        (e2 - mean * mean).alias("m2"),
        (e3 - 3 * mean * e2 + 2 * mean * mean * mean).alias("m3"),
        (
            e4
            - 4 * mean * e3
            + 6 * mean * mean * e2
            - 3 * mean * mean * mean * mean
        ).alias("m4"),
    )
    m2 = F.col("m2")
    return m.select(
        "event_type",
        "n",
        F.floor(F.col("mean") * 1e3 + F.lit(0.5)).cast("bigint").alias("mean_q"),
        F.floor(m2 * 1e3 + F.lit(0.5)).cast("bigint").alias("m2_q"),
        F.when(
            m2 > 0,
            F.floor(
                F.col("m3") / (m2 * F.sqrt(m2)) * F.lit(1e6) + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("skew_q"),
        F.when(
            m2 > 0,
            F.floor(
                (F.col("m4") / (m2 * m2) - 3) * F.lit(1e6) + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("kurt_q"),
    )


@query(
    "q184_hll_intersection",
    """
    WITH 
    a_r0 AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT
                          AS ridx,
                        substr(md5(user_id::VARCHAR), 3, 13) AS w
                 FROM events WHERE event_type = 'click' AND user_id % 3 <> 0),
    a_r1 AS (SELECT ridx,
                        CASE WHEN length(ltrim(w, '0')) = 0 THEN 53
                             ELSE (length(w) - length(ltrim(w, '0'))) * 4
                                  + 3 - cast(substr('011222233333333',
                                        strpos('0123456789abcdef',
                                               substr(ltrim(w, '0'), 1, 1)) - 1,
                                        1) AS INT)
                                  + 1 END AS rho
                 FROM a_r0),
    a_regs AS (SELECT ridx, max(rho) AS rho FROM a_r1 GROUP BY ridx),
    
    b_r0 AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT
                          AS ridx,
                        substr(md5(user_id::VARCHAR), 3, 13) AS w
                 FROM events WHERE event_type = 'view' AND user_id % 2 = 0),
    b_r1 AS (SELECT ridx,
                        CASE WHEN length(ltrim(w, '0')) = 0 THEN 53
                             ELSE (length(w) - length(ltrim(w, '0'))) * 4
                                  + 3 - cast(substr('011222233333333',
                                        strpos('0123456789abcdef',
                                               substr(ltrim(w, '0'), 1, 1)) - 1,
                                        1) AS INT)
                                  + 1 END AS rho
                 FROM b_r0),
    b_regs AS (SELECT ridx, max(rho) AS rho FROM b_r1 GROUP BY ridx),
    u_regs AS (SELECT ridx, max(rho) AS rho FROM
                 (SELECT * FROM a_regs UNION ALL SELECT * FROM b_regs)
               GROUP BY ridx),
    
    a_agg AS (SELECT cast(count(*) AS BIGINT) AS nset,
                         cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                           AS hsum
                  FROM a_regs),
    a_est AS (SELECT cast(floor(
                    CASE WHEN (256 - nset) > 0
                              AND 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                                  * 9007199254740992.0
                                  / cast(hsum + (256 - nset)
                                         * (1::BIGINT << 53) AS DOUBLE)
                                  <= 2.5 * 256
                         THEN 256.0 * ln(256.0 / (256 - nset))
                         ELSE 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                              * 9007199254740992.0
                              / cast(hsum + (256 - nset)
                                     * (1::BIGINT << 53) AS DOUBLE) END
                    * 1000 + 0.5) AS BIGINT) AS q
                  FROM a_agg),
    
    b_agg AS (SELECT cast(count(*) AS BIGINT) AS nset,
                         cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                           AS hsum
                  FROM b_regs),
    b_est AS (SELECT cast(floor(
                    CASE WHEN (256 - nset) > 0
                              AND 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                                  * 9007199254740992.0
                                  / cast(hsum + (256 - nset)
                                         * (1::BIGINT << 53) AS DOUBLE)
                                  <= 2.5 * 256
                         THEN 256.0 * ln(256.0 / (256 - nset))
                         ELSE 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                              * 9007199254740992.0
                              / cast(hsum + (256 - nset)
                                     * (1::BIGINT << 53) AS DOUBLE) END
                    * 1000 + 0.5) AS BIGINT) AS q
                  FROM b_agg),
    
    u_agg AS (SELECT cast(count(*) AS BIGINT) AS nset,
                         cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                           AS hsum
                  FROM u_regs),
    u_est AS (SELECT cast(floor(
                    CASE WHEN (256 - nset) > 0
                              AND 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                                  * 9007199254740992.0
                                  / cast(hsum + (256 - nset)
                                         * (1::BIGINT << 53) AS DOUBLE)
                                  <= 2.5 * 256
                         THEN 256.0 * ln(256.0 / (256 - nset))
                         ELSE 0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                              * 9007199254740992.0
                              / cast(hsum + (256 - nset)
                                     * (1::BIGINT << 53) AS DOUBLE) END
                    * 1000 + 0.5) AS BIGINT) AS q
                  FROM u_agg),
    ex AS (SELECT
             cast(count(DISTINCT CASE WHEN event_type = 'click'
                                       AND user_id % 3 <> 0
                                      THEN user_id END) AS BIGINT) AS xa,
             cast(count(DISTINCT CASE WHEN event_type = 'view'
                                       AND user_id % 2 = 0
                                      THEN user_id END) AS BIGINT) AS xb,
             cast(count(DISTINCT CASE WHEN (event_type = 'click'
                                            AND user_id % 3 <> 0)
                                        OR (event_type = 'view'
                                            AND user_id % 2 = 0)
                                      THEN user_id END) AS BIGINT) AS xu
           FROM events),
    xi AS (SELECT xa, xb, xu, xa + xb - xu AS xinter FROM ex)
    SELECT a_est.q AS est_click_q, b_est.q AS est_view_q,
           u_est.q AS est_union_q,
           a_est.q + b_est.q - u_est.q AS est_inter_q,
           xi.xinter AS exact_inter,
           (abs((a_est.q + b_est.q - u_est.q) / 1000.0 - xi.xinter)
              <= 0.2 * xi.xu) AS err_ok
    FROM a_est CROSS JOIN b_est CROSS JOIN u_est CROSS JOIN xi
    """,
    doc="HLL set-INTERSECTION estimate by inclusion-exclusion "
    "(est(A)+est(B)−est(A∪B), union sketch = register-wise MAX) — the "
    "audience-overlap / cross-source-user question answered from "
    "metadata-sized sketches instead of a distinct-join of two corpus "
    "scans. Populations are user_id-sliced (≈2/3 clickers, ≈1/2 "
    "viewers) so the overlap is PARTIAL — every fixture user fires "
    "every event type, and unsliced audiences would coincide, "
    "degenerating the demo to est(A)=est(U). Builds on q165's portable register tables (md5 family, "
    "exact-integer harmonic sums); the estimates subtract as exact "
    "quantized integers. Inclusion-exclusion compounds the per-sketch "
    "6.5% error, so the verdict bounds the estimate against the exact "
    "overlap at 20% of the UNION size (the standard error scale for "
    "sketch differences); operators/sketches.py hll_build/hll_estimate.",
)
def q184_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events")
    # partial-overlap populations (≈2/3 and 1/2 of users): every user
    # fires every event type in this fixture, so unfiltered click/view
    # audiences would coincide and the intersection demo degenerates
    in_a = (F.col("event_type") == "click") & (F.col("user_id") % 3 != 0)
    in_b = (F.col("event_type") == "view") & (F.col("user_id") % 2 == 0)
    a = hll_build(ev.filter(in_a), "user_id")
    b = hll_build(ev.filter(in_b), "user_id")
    u = (
        a.unionByName(b)
        .groupBy("ridx")
        .agg(F.max("rho").alias("rho"))
    )
    ea = hll_estimate(a).select(F.col("hll_est_q").alias("est_click_q"))
    eb = hll_estimate(b).select(F.col("hll_est_q").alias("est_view_q"))
    eu = hll_estimate(u).select(F.col("hll_est_q").alias("est_union_q"))
    ex = ev.agg(
        F.countDistinct(F.when(in_a, F.col("user_id")))
        .cast("bigint")
        .alias("xa"),
        F.countDistinct(F.when(in_b, F.col("user_id")))
        .cast("bigint")
        .alias("xb"),
        F.countDistinct(F.when(in_a | in_b, F.col("user_id")))
        .cast("bigint")
        .alias("xu"),
    )
    j = ea.crossJoin(eb).crossJoin(eu).crossJoin(F.broadcast(ex))
    inter = F.col("est_click_q") + F.col("est_view_q") - F.col("est_union_q")
    return j.select(
        "est_click_q",
        "est_view_q",
        "est_union_q",
        inter.alias("est_inter_q"),
        (F.col("xa") + F.col("xb") - F.col("xu")).alias("exact_inter"),
        (
            F.abs(
                inter / F.lit(1000.0)
                - (F.col("xa") + F.col("xb") - F.col("xu"))
            )
            <= F.lit(0.2) * F.col("xu")
        ).alias("err_ok"),
    )


@query(
    "q185_bloom_semi_join",
    """
    WITH hi AS (SELECT DISTINCT o_orderkey AS key FROM orders
                WHERE o_totalprice > 200000),
    pos AS (SELECT key,
                   unnest([('0x'||substr(md5(key::VARCHAR),1,8))::BIGINT % 65536,
                           ('0x'||substr(md5(key::VARCHAR),9,8))::BIGINT % 65536])
                     AS p
            FROM hi),
    words AS (SELECT p // 32 AS widx,
                     bit_or(1::BIGINT << cast(p % 32 AS INT)) AS word
              FROM pos GROUP BY 1),
    probe AS (
      SELECT l_orderkey, cast(floor(l_quantity * 100) AS BIGINT) AS qc,
             ('0x'||substr(md5(l_orderkey::VARCHAR),1,8))::BIGINT % 65536 AS p1,
             ('0x'||substr(md5(l_orderkey::VARCHAR),9,8))::BIGINT % 65536 AS p2
      FROM lineitem),
    hit AS (
      SELECT l_orderkey, qc,
             ((coalesce(w1.word, 0) & (1::BIGINT << cast(p1 % 32 AS INT))) <> 0
              AND (coalesce(w2.word, 0)
                   & (1::BIGINT << cast(p2 % 32 AS INT))) <> 0) AS bloom_hit,
             (hi.key IS NOT NULL) AS is_member
      FROM probe LEFT JOIN words w1 ON w1.widx = p1 // 32
                 LEFT JOIN words w2 ON w2.widx = p2 // 32
                 LEFT JOIN hi ON hi.key = probe.l_orderkey)
    SELECT cast(count(*) AS BIGINT) AS n_lineitem,
           cast(sum(bloom_hit::INT) AS BIGINT) AS n_bloom_pass,
           cast(sum(is_member::INT) AS BIGINT) AS n_matched,
           cast(sum((bloom_hit AND NOT is_member)::INT) AS BIGINT)
             AS n_false_pos,
           cast(sum(CASE WHEN is_member THEN qc END) AS BIGINT) AS sum_qty_c,
           bool_and(bloom_hit OR NOT is_member) AS no_false_negatives
    FROM hit
    """,
    doc="BLOOM-PREFILTERED semi join — the 100 TB join-pushdown "
    "pattern: instead of shuffling the fact table against the key set, "
    "a 2 KB mergeable word-table Bloom filter (q151's sketch) over the "
    "high-value order keys broadcasts to the lineitem scan, bloom "
    "hits alone proceed to the exact semi join (false positives get "
    "killed there — output stays EXACT, the filter only sheds shuffle "
    "volume), and the audit row reports pass/match/false-positive "
    "counts plus the no-false-negatives guarantee. At real scale the "
    "probe is a map-side filter ahead of the only shuffle.",
)
def q185_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import bloom_build, bloom_probe

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    hi = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_orderkey").alias("key")
    )
    bloom = bloom_build(hi, "key")
    probed = bloom_probe(
        li.select(
            "l_orderkey",
            F.floor(F.col("l_quantity") * 100).cast("bigint").alias("qc"),
        ),
        "l_orderkey",
        bloom,
    )
    flagged = probed.join(
        F.broadcast(hi.withColumn("__m", F.lit(True))),
        probed.l_orderkey == F.col("key"),
        "left",
    ).select(
        "qc",
        "bloom_hit",
        F.coalesce(F.col("__m"), F.lit(False)).alias("is_member"),
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitem"),
        F.sum(F.col("bloom_hit").cast("int")).cast("bigint").alias("n_bloom_pass"),
        F.sum(F.col("is_member").cast("int")).cast("bigint").alias("n_matched"),
        F.sum((F.col("bloom_hit") & ~F.col("is_member")).cast("int"))
        .cast("bigint")
        .alias("n_false_pos"),
        F.sum(F.when(F.col("is_member"), F.col("qc")))
        .cast("bigint")
        .alias("sum_qty_c"),
        F.bool_and(F.col("bloom_hit") | ~F.col("is_member")).alias(
            "no_false_negatives"
        ),
    )


@query(
    "q186_markov_transitions",
    """
    WITH seq AS (
      SELECT event_type AS src,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ) AS dst
      FROM events),
    pairs AS (SELECT src, dst, cast(count(*) AS BIGINT) AS n
              FROM seq WHERE dst IS NOT NULL GROUP BY src, dst),
    tot AS (SELECT src, cast(sum(n) AS BIGINT) AS t FROM pairs GROUP BY src)
    SELECT src, dst, n, cast((n * 1000000) // t AS BIGINT) AS p_q
    FROM pairs JOIN tot USING (src)
    """,
    doc="Per-user event-type TRANSITION matrix (first-order Markov "
    "estimate) — the session-behavior profile behind funnel and "
    "next-action models. One user_id window (the only corpus-scale "
    "shuffle; q64's ordering convention), then a |types|² aggregate; "
    "probabilities publish as exact integer-division ppm so no float "
    "division can disagree between engines.",
)
def q186_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), F.col("event_id"))
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    pairs = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = pairs.groupBy("src").agg(F.sum("n").cast("bigint").alias("t"))
    return pairs.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        "n",
        F.expr("(n * 1000000) div t").cast("bigint").alias("p_q"),
    )


@query(
    "q187_zipf_slope",
    f"""
    WITH tok AS (SELECT unnest({_TOKS}) AS term FROM documents),
    v AS (SELECT term, cast(count(*) AS BIGINT) AS c FROM tok
          GROUP BY term ORDER BY c DESC, term LIMIT 200),
    r AS (SELECT row_number() OVER (ORDER BY c DESC, term) AS rk, c FROM v),
    q AS (SELECT cast(floor(ln(rk::DOUBLE) * 1e6) AS BIGINT) AS xq,
                 cast(floor(ln(c::DOUBLE) * 1e6) AS BIGINT) AS yq
          FROM r),
    s AS (SELECT cast(count(*) AS BIGINT) AS np,
                 cast(sum(xq) AS BIGINT) AS sx,
                 cast(sum(yq) AS BIGINT) AS sy,
                 cast(sum(xq * yq) AS BIGINT) AS sxy,
                 cast(sum(xq * xq) AS BIGINT) AS sxx,
                 cast(sum(yq * yq) AS BIGINT) AS syy
          FROM q),
    f AS (SELECT np,
                 (np * sxy - sx * sy)::DOUBLE
                   / (np * sxx - sx * sx)::DOUBLE AS slope,
                 (np * sxy - sx * sy)::DOUBLE * (np * sxy - sx * sy)::DOUBLE
                   / ((np * sxx - sx * sx)::DOUBLE
                      * (np * syy - sy * sy)::DOUBLE) AS r2
          FROM s)
    SELECT np AS n_points,
           cast(floor(slope * 1e6 + 0.5) AS BIGINT) AS slope_q,
           cast(floor(r2 * 1e6 + 0.5) AS BIGINT) AS r2_q
    FROM f
    """,
    doc="Zipf rank-frequency SLOPE (log-log OLS over the top-200 "
    "vocabulary) — the one-number corpus-health signal (natural text "
    "sits near −1; template spam and boilerplate bend it). Per-term "
    "ln() values quantize to exact 1e6 integers BEFORE the OLS sums, "
    "so every aggregate is order-independent bigint arithmetic (the "
    "q148 discipline) and the slope/R² divisions are single "
    "fixed-order double ops. The rank window runs over 200 rows — "
    "metadata by construction; the corpus-scale work is one token "
    "count + TakeOrdered top-200.",
)
def q187_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    v = (
        docs.select(F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(200)
    )
    r = v.select(
        F.row_number()
        .over(W.orderBy(F.col("c").desc(), "term"))
        .alias("rk"),
        "c",
    )
    q = r.select(
        F.floor(F.log(F.col("rk").cast("double")) * F.lit(1e6))
        .cast("bigint")
        .alias("xq"),
        F.floor(F.log(F.col("c").cast("double")) * F.lit(1e6))
        .cast("bigint")
        .alias("yq"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum("xq").cast("bigint").alias("sx"),
        F.sum("yq").cast("bigint").alias("sy"),
        F.sum(F.col("xq") * F.col("yq")).cast("bigint").alias("sxy"),
        F.sum(F.col("xq") * F.col("xq")).cast("bigint").alias("sxx"),
        F.sum(F.col("yq") * F.col("yq")).cast("bigint").alias("syy"),
    )
    num = (F.col("np") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = (F.col("np") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    deny = (F.col("np") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("np").alias("n_points"),
        F.floor(num / denx * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("slope_q"),
        F.floor(num * num / (denx * deny) * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("r2_q"),
    )


@query(
    "q188_compaction_plan",
    """
    WITH manifest AS (
      SELECT cast(date_trunc('month', l_shipdate) AS TIMESTAMP) AS file_id,
             cast(count(*) AS BIGINT) * 128 AS bytes
      FROM lineitem GROUP BY 1),
    pre AS (SELECT file_id, bytes,
                   cast(coalesce(sum(bytes) OVER (ORDER BY file_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS pre_bytes
            FROM manifest),
    grp AS (SELECT pre_bytes // 4194304 AS group_id, file_id, bytes FROM pre)
    SELECT cast(group_id AS BIGINT) AS group_id,
           cast(count(*) AS BIGINT) AS n_files,
           cast(sum(bytes) AS BIGINT) AS group_bytes,
           min(file_id) AS first_file, max(file_id) AS last_file
    FROM grp GROUP BY group_id
    """,
    doc="Small-file COMPACTION planner — the table-maintenance pass "
    "every long-lived 100 TB table needs (streaming ingest leaves "
    "thousands of KB-sized files; scan cost is per-file, so they must "
    "re-bin into ~target-sized outputs). Sort-based packing: manifest "
    "ordered by file id, exclusive prefix sum of bytes, group = "
    "prefix div target (4 MiB here; the real knob is "
    "maxPartitionBytes-scaled) — each group lands within one file of "
    "target, preserves ordering (so downstream zone maps stay tight), "
    "and the plan itself is pure metadata work: the manifest is "
    "|files| rows, the window metadata-sized. Fixture manifest: one "
    "'file' per ship-month at 128 B/row.",
)
def q188_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    manifest = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("file_id")
    ).agg((F.count(F.lit(1)) * 128).cast("bigint").alias("bytes"))
    pw = W.orderBy("file_id").rowsBetween(W.unboundedPreceding, -1)
    pre = manifest.select(
        "file_id",
        "bytes",
        F.coalesce(F.sum("bytes").over(pw), F.lit(0))
        .cast("bigint")
        .alias("pre_bytes"),
    )
    return (
        pre.select(
            F.expr("pre_bytes div 4194304").cast("bigint").alias("group_id"),
            "file_id",
            "bytes",
        )
        .groupBy("group_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_files"),
            F.sum("bytes").cast("bigint").alias("group_bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
    )


@query(
    "q189_partition_checksums",
    """
    SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 4))::BIGINT % 16
             AS bucket,
           cast(count(*) AS BIGINT) AS n_rows,
           cast(sum(('0x' || substr(md5(
                 cast(l_orderkey AS VARCHAR) || '|' ||
                 cast(l_linenumber AS VARCHAR) || '|' ||
                 cast(cast(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
                   || '|' || l_returnflag
               ), 1, 8))::BIGINT) AS BIGINT) AS checksum
    FROM lineitem GROUP BY 1
    """,
    doc="PER-PARTITION checksum table — the anti-entropy index that "
    "makes q143/q144 actionable at 100 TB: replicas exchange this "
    "16-row (per-bucket) vector, and only buckets whose checksums "
    "differ re-sync or diff row-level — terabytes of comparison "
    "collapse to a metadata exchange. Bucket assignment uses the "
    "portable md5 family (engine-independent, unlike hash()/xxhash "
    "builtins), rows hash exactly as in q143, and the per-bucket sums "
    "merge by addition (shard-parallel build, one combine).",
)
def q189_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("bigint"),
        F.lit(16),
    )
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                    F.col("l_quantity").cast(DEC).cast("string"),
                    F.col("l_returnflag"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    return li.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(row_hash).cast("bigint").alias("checksum"),
    )


@query(
    "q190_dp_count",
    """
    WITH c AS (SELECT event_type, cast(count(*) AS BIGINT) AS n_true
               FROM events GROUP BY event_type),
    u AS (SELECT event_type, n_true,
                 (('0x' || substr(md5('dp:' || event_type), 1, 13))::BIGINT
                  + 0.5) / 4503599627370496.0 AS uu
          FROM c),
    z AS (SELECT event_type, n_true,
                 cast(round(-1.0 * (CASE WHEN uu >= 0.5 THEN 1.0 ELSE -1.0 END)
                            * ln(1.0 - 2.0 * abs(uu - 0.5))) AS BIGINT)
                   AS noise
          FROM u)
    SELECT event_type, n_true, n_true + noise AS n_noisy
    FROM z
    """,
    doc="Differentially-private COUNT release (Laplace mechanism, "
    "Dwork et al. 2006; ε = 1): per-group noise = round(Lap(1/ε)) drawn by inverse CDF "
    "from the md5-seeded uniform — deterministic, engine-portable "
    "(u is an exact dyadic, so 1−2|u−½| is exact and the single ln/"
    "round pipeline is fixed-order), and crucially SEEDED PER RELEASE "
    "KEY, the property a distributed pipeline needs so retries and "
    "speculative tasks can't burn privacy budget by re-drawing. "
    "Demo emits n_true alongside for the differential check; a "
    "production release publishes only n_noisy (and composes ε "
    "across queries).",
)
def q190_dp_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import md5_uniform52

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    u = md5_uniform52(F.concat(F.lit("dp:"), F.col("event_type")))
    noise = F.round(
        F.lit(-1.0)
        * F.when(u >= 0.5, F.lit(1.0)).otherwise(F.lit(-1.0))
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(u - F.lit(0.5)))
    ).cast("bigint")
    return c.select(
        "event_type", "n_true", (F.col("n_true") + noise).alias("n_noisy")
    )


@query(
    "q191_code_detect",
    r"""
    WITH f AS (
      SELECT source,
             length(text) AS nc,
             length(text) - length(regexp_replace(text, '[;{}()=<>\[\]]', '',
                                                  'g')) AS nsym
      FROM documents WHERE length(text) > 0)
    SELECT source,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(CASE WHEN (nsym * 1000000) // nc >= 20000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_codey,
           cast(sum(nsym) * 1000000 // sum(nc) AS BIGINT) AS sym_ppm
    FROM f GROUP BY source
    """,
    doc="CODE-likeness census per source — the code-vs-prose "
    "composition dial an LLM data mix needs (code is valuable but "
    "must be budgeted, and html/markup noise masquerades as it). "
    "Heuristic: structural-symbol density (;{}()=<>[] per char) — "
    "map-side regexp count, thresholds compared as exact integer-"
    "division ppm so no float boundary can flip a census cell; one "
    "|sources|-keyed aggregate. The n-gram LM (q105) and quality "
    "gates (q47) compose with this for the full mix report.",
)
def q191_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    f = docs.select(
        "source",
        F.length("text").alias("nc"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", r"[;{}()=<>\[\]]", ""))
        ).alias("nsym"),
    )
    return f.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.expr("(nsym * 1000000) div nc") >= 20000, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_codey"),
        F.expr("(sum(nsym) * 1000000) div sum(nc)")
        .cast("bigint")
        .alias("sym_ppm"),
    )


def _q192_oracle() -> str:
    closure = _q71_oracle()
    return f"""
    WITH comp AS ({closure}),
    sizes AS (SELECT cluster_id, cast(count(*) AS BIGINT) AS sz
              FROM comp GROUP BY cluster_id)
    SELECT sz AS cluster_size,
           cast(count(*) AS BIGINT) AS n_clusters
    FROM sizes GROUP BY sz
    """


@query(
    "q192_cluster_stats",
    None,  # composed below from the q71 closure
    doc="Near-dup CLUSTER-SIZE histogram — the dedup monitoring panel "
    "(a fat tail here means template families / bot content; the "
    "1-count of each size drives the survivors-after-dedup forecast). "
    "Reuses the full LSH→CC pipeline (auto label→star escalation) "
    "and adds only cluster-keyed aggregates; oracle composes the "
    "recursive-closure CC oracle with the same histogram.",
)
def q192_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import near_dup_clusters

    comp = near_dup_clusters(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5
    )
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )


REGISTRY["q192_cluster_stats"] = QueryDef(
    fn=REGISTRY["q192_cluster_stats"].fn,
    oracle=_q192_oracle(),
    doc=REGISTRY["q192_cluster_stats"].doc,
)


@query(
    "q193_stream_dedup",
    f"""
    SELECT md5(array_to_string(({_TOKS})[1:8], ' ')) AS content_key,
           cast(min(doc_id) AS BIGINT) AS keep_id,
           cast(count(*) AS BIGINT) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="STREAMING exact-dedup maintenance — q40's survivor table kept "
    "fresh as document batches arrive: per micro-batch the batch "
    "collapses to its (key, min id, count) partial and merges into "
    "snapshot-swap state by min/sum — the same mergeable-partial "
    "shape as the rollup (q136) and heavy-hitter (q172) state "
    "machines, so per-batch work is batch + state, never history. "
    "(min, sum) merging is associative-commutative, so the final "
    "state provably equals the cold one-pass aggregate — the oracle; "
    "streaming/pipeline.py stream_exact_dedup. Keyed on the q180 "
    "leading-passage fingerprint.",
)
def q193_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens
    from tytodb_spark.streaming.pipeline import stream_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.array_join(F.slice(tokens(F.col("text")), 1, 8), " "))
    return stream_exact_dedup(spark, docs, "doc_id", key)


@query(
    "q194_psi_drift",
    """
    WITH mx AS (SELECT max(event_id) AS mid FROM events),
    v AS (SELECT (event_id <= mid // 2) AS old_half,
                 cast(floor(value * 100) AS BIGINT) // 1000 AS bin
          FROM events CROSS JOIN mx),
    c AS (SELECT bin,
                 cast(sum(old_half::INT) AS BIGINT) + 1 AS c1,
                 cast(sum((NOT old_half)::INT) AS BIGINT) + 1 AS c2
          FROM v GROUP BY bin),
    t AS (SELECT cast(sum(c1) AS BIGINT) AS t1,
                 cast(sum(c2) AS BIGINT) AS t2 FROM c),
    terms AS (SELECT cast(floor(
                 (c1::DOUBLE / t1::DOUBLE - c2::DOUBLE / t2::DOUBLE)
                 * ln((c1::DOUBLE / t1::DOUBLE) / (c2::DOUBLE / t2::DOUBLE))
                 * 1e9) AS BIGINT) AS tq
              FROM c CROSS JOIN t)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM c) AS n_bins,
           cast(sum(tq) AS BIGINT) AS psi_gq,
           (sum(tq) > 200000000) AS drifted
    FROM terms
    """,
    doc="Population Stability Index DRIFT monitor between the first "
    "and second half of the event stream (the deployed-model health "
    "check: PSI > 0.2 = the feature distribution moved). Fixed-width "
    "value bins (deterministic — no quantile estimation inside the "
    "monitor), +1 smoothing so empty bins stay defined, per-bin "
    "(p−q)·ln(p/q) terms quantized to exact nano-units BEFORE the "
    "sum (order-independent bigint total); one corpus aggregate on "
    "the bin key.",
)
def q194_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("event_id").alias("mid"))
    v = ev.crossJoin(F.broadcast(mx)).select(
        (F.col("event_id") <= F.expr("mid div 2")).alias("old_half"),
        F.expr("floor(value * 100) div 1000").cast("bigint").alias("bin"),
    )
    c = v.groupBy("bin").agg(
        (F.sum(F.col("old_half").cast("int")) + 1).cast("bigint").alias("c1"),
        (F.sum((~F.col("old_half")).cast("int")) + 1).cast("bigint").alias("c2"),
    )
    t = c.agg(
        F.sum("c1").cast("bigint").alias("t1"),
        F.sum("c2").cast("bigint").alias("t2"),
    )
    p = F.col("c1").cast("double") / F.col("t1").cast("double")
    q = F.col("c2").cast("double") / F.col("t2").cast("double")
    terms = c.crossJoin(F.broadcast(t)).select(
        F.floor((p - q) * F.log(p / q) * F.lit(1e9)).cast("bigint").alias("tq")
    )
    nb = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_bins"))
    return (
        terms.agg(F.sum("tq").cast("bigint").alias("psi_gq"))
        .crossJoin(F.broadcast(nb))
        .select(
            "n_bins", "psi_gq", (F.col("psi_gq") > 200000000).alias("drifted")
        )
    )


@query(
    "q195_frame_dedup",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    f AS (
      SELECT doc_id,
             sha256(substr(hx, i * 128 + 1, 128)) AS h
      FROM h
      CROSS JOIN unnest(range(0, least(4, greatest(1,
                   length(hx) // 128)))) AS r(i))
    SELECT h AS frame_sha256,
           cast(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           cast(count(*) AS BIGINT) AS n_occurrences
    FROM f GROUP BY h
    HAVING count(DISTINCT doc_id) >= 2
    """,
    doc="Cross-video duplicate-FRAME detection — the multimodal twin "
    "of passage dedup (stock footage, shared intros, watermark "
    "templates duplicate frames across otherwise-distinct videos): "
    "frame-sample every payload (q131's stubbed keyframe stride — a "
    "real pipeline swaps in the ffmpeg decode behind the same Arrow "
    "batch signature), hash frames content-wise, and one hash-keyed "
    "aggregate finds frames shared by ≥2 documents. Payload bytes "
    "never leave their scan partition; only (id, hash) rows shuffle. "
    "Fingerprints live in the uppercase-hex domain (sha256 of the "
    "frame bytes' hex encoding — injective, byte-exact for ANY "
    "payload, and DuckDB-recomputable; no ASCII fixture contract); "
    "operators/multimodal.py sample_frames.",
)
def q195_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import sample_frames, to_media_table

    docs = _t(spark, sf_dir, "documents")
    media = to_media_table(docs, "doc_id", "text", mime="video/fake")
    frames = sample_frames(media)
    return (
        frames.groupBy("frame_sha256")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
    )


@query(
    "q196_energy_segments",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    w AS (
      SELECT doc_id, i,
             substr(hx, i * 128 + 1, 128) AS win
      FROM h
      CROSS JOIN unnest(range(0, least(4, greatest(1,
                   length(hx) // 128)))) AS r(i)),
    e AS (
      SELECT doc_id, cast(i AS INT) AS seg_idx,
             cast((list_sum(list_transform(range(1, length(win) // 2 + 1),
                    j -> ('0x' || substr(win, 2 * j - 1, 2))::BIGINT)) * 100)
                  // (length(win) // 2)
                  AS BIGINT) AS energy_x100
      FROM w WHERE length(win) > 0)
    SELECT doc_id, seg_idx, energy_x100,
           (energy_x100 >= 9000) AS voiced
    FROM e
    """,
    doc="Audio ENERGY segmentation (the VAD / silence-trim front of a "
    "speech-data pipeline): fixed-stride payload windows score an "
    "exact integer mean-byte energy inside Arrow-batched mapInPandas "
    "(the real RMS-over-PCM decode swaps in behind the same batch "
    "signature — container has no audio libs), and the voiced gate "
    "thresholds JVM-side on the metadata-sized (id, seg, int) rows. "
    "All integer floor arithmetic — no float boundary exists anywhere. "
    "The oracle scores the SAME bytes (hex-pair decode of the payload "
    "windows), not characters — byte-exact parity for any UTF-8 text, "
    "no ASCII fixture contract; "
    "operators/multimodal.py energy_windows.",
)
def q196_energy_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import energy_windows, to_media_table

    docs = _t(spark, sf_dir, "documents")
    media = to_media_table(docs, "doc_id", "text", mime="audio/fake")
    segs = energy_windows(media)
    return segs.select(
        "doc_id",
        "seg_idx",
        "energy_x100",
        (F.col("energy_x100") >= 9000).alias("voiced"),
    )


@query(
    "q197_keyset_pagination",
    """
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem WHERE l_returnflag = 'A'),
    bound AS (
      SELECT l_orderkey AS k1, l_linenumber AS k2, l_quantity AS k3
      FROM base ORDER BY 1, 2, 3 LIMIT 1 OFFSET 199)
    SELECT b.l_orderkey, b.l_linenumber, b.l_quantity
    FROM base b, bound
    WHERE (b.l_orderkey, b.l_linenumber, b.l_quantity) > (k1, k2, k3)
    ORDER BY 1, 2, 3 LIMIT 100
    """,
    doc="Keyset (seek) pagination — the SCALE path for the reference's "
    "cursor protocol (S9/S10, src/query.rs:110-214), page 3 of the "
    "same result q09 pages by row_number. The row_number spelling is "
    "reference-faithful but funnels the whole result through one task "
    "(partition-less Window); the keyset spelling filters past the "
    "page-2 boundary key and takes a distributed top-100 "
    "(TakeOrderedAndProject) — no Window, no global sort, no cached "
    "materialization, and each page's composite-key range filter can "
    "push to the scan. The boundary itself is a distributed top-200 "
    "reduced to one max(struct) scalar and broadcast. engine.py "
    "keyset_page / KeysetCursor; same (orderkey, linenumber, quantity) "
    "unique composite as q09.",
)
def q197_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.engine import keyset_page

    keys = ["l_orderkey", "l_linenumber", "l_quantity"]
    base = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "A")
        .select(*keys)
    )
    bound = (
        base.orderBy(*keys)
        .limit(200)
        .agg(F.max(F.struct(*keys)).alias("__b"))
    )
    return (
        base.crossJoin(F.broadcast(bound))
        .filter(F.struct(*keys) > F.col("__b"))
        .drop("__b")
        .transform(lambda d: keyset_page(d, keys, after=None, page_size=100))
    )


# ---------------------------------------------------------------------------
# q198+ — round 5: privacy / eval / drift / robust-stats operators
# ---------------------------------------------------------------------------


@query(
    "q198_k_anonymity",
    """
    WITH q AS (SELECT event_type, date_trunc('day', ts) AS day,
                      cast(floor(value * 10) AS BIGINT) AS vb
               FROM events),
    cls AS (SELECT event_type, day, vb, cast(count(*) AS BIGINT) AS sz
            FROM q GROUP BY 1, 2, 3)
    SELECT cast(count(*) AS BIGINT) AS n_classes,
           cast(min(sz) AS BIGINT) AS min_class_size,
           cast(sum(CASE WHEN sz < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_2,
           cast(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_5,
           cast(sum(CASE WHEN sz < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_10,
           cast(sum(sz) AS BIGINT) AS n_rows
    FROM cls
    """,
    doc="k-anonymity audit — the privacy gate run before releasing a "
    "derived dataset: rows group into equivalence classes on their "
    "quasi-identifiers (event type, day, coarse value bucket) and the "
    "release criterion is the minimum class size (a class of 1 row "
    "re-identifies its subject). Emits the anonymity census: class "
    "count, min class size, and how many classes violate k ∈ {2,5,10}. "
    "One hash aggregate on the QID tuple + one scalar reduce — "
    "map-side-combinable, no skew risk (QID classes are the OUTPUT "
    "cardinality), SF-portable because the output is the summary, not "
    "the (fixture-dependent) violating-class list.",
)
def q198_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.floor(F.col("value") * 10).cast("bigint").alias("vb"),
    )
    cls = ev.groupBy("event_type", "day", "vb").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    return cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("sz").cast("bigint").alias("min_class_size"),
        F.sum((F.col("sz") < 2).cast("int")).cast("bigint").alias("n_below_2"),
        F.sum((F.col("sz") < 5).cast("int")).cast("bigint").alias("n_below_5"),
        F.sum((F.col("sz") < 10).cast("int"))
        .cast("bigint")
        .alias("n_below_10"),
        F.sum("sz").cast("bigint").alias("n_rows"),
    )


def _q199_oracle() -> str:
    return f"""
    WITH qual AS ({_q47_oracle()}),
    v AS (SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS g,
                 cast(floor(q.quality * 1e6 + 0.5) AS BIGINT) AS vc
          FROM qual q JOIN documents d USING (doc_id)),
    c AS (SELECT vc, cast(sum(g) AS BIGINT) AS n1,
                 cast(sum(1 - g) AS BIGINT) AS n2
          FROM v GROUP BY vc),
    t AS (SELECT cast(sum(n1) AS BIGINT) AS N1,
                 cast(sum(n2) AS BIGINT) AS N2 FROM c),
    cum AS (SELECT vc, n1, n2,
                   cast(coalesce(sum(n1 + n2) OVER (ORDER BY vc
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                        AS BIGINT) AS pre
            FROM c),
    agg AS (SELECT cast(sum(n1 * (2 * pre + n1 + n2 + 1)) AS BIGINT) AS r1x2
            FROM cum),
    s AS (SELECT N1, N2, r1x2 - N1 * (N1 + 1) AS u1x2
          FROM agg CROSS JOIN t),
    a AS (SELECT N1, N2, u1x2,
                 u1x2::DOUBLE / (2.0 * N1::DOUBLE * N2::DOUBLE) AS auc
          FROM s)
    SELECT N1 AS n_pos, N2 AS n_neg,
           cast(floor(auc * 1e6 + 0.5) AS BIGINT) AS auc_q,
           cast(floor((2.0 * auc - 1.0) * 1e6 + 0.5) AS BIGINT) AS gini_q
    FROM a
    """


@query(
    "q199_auc_roc",
    None,  # composed below from the q47 CTE
    doc="Exact ROC-AUC of the quality score as an English-document "
    "classifier — the threshold-free eval a curation team runs before "
    "trusting a scorer's ranking. AUC = P(random positive outranks "
    "random negative) = U1/(n+·n−), so the midrank-tie Mann-Whitney "
    "identity gives 2·U1 as pure bigint arithmetic over the per-value "
    "count table (operators/stats.py auc_exact): per-score hash agg → "
    "bucketed two-level distributed prefix sum → one scalar reduce. "
    "No per-row ranking pass, no partition-less window, and the only "
    "float ops are one division + affine quantize in fixed order.",
)
def q199_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import auc_exact
    from tytodb_spark.operators.textual import quality_score

    docs = _t(spark, sf_dir, "documents")
    return auc_exact(
        docs,
        F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5)).cast(
            "bigint"
        ),
        (F.col("lang") == "en").cast("int"),
        bucket_width=10_000,
    )


REGISTRY["q199_auc_roc"] = QueryDef(
    fn=REGISTRY["q199_auc_roc"].fn,
    oracle=_q199_oracle(),
    doc=REGISTRY["q199_auc_roc"].doc,
)


@query(
    "q200_segment_merge",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    w AS (
      SELECT doc_id, i,
             substr(hx, i * 128 + 1, 128) AS win
      FROM h
      CROSS JOIN unnest(range(0, least(4, greatest(1,
                   length(hx) // 128)))) AS r(i)),
    e AS (
      SELECT doc_id, cast(i AS INT) AS seg_idx,
             cast((list_sum(list_transform(range(1, length(win) // 2 + 1),
                    j -> ('0x' || substr(win, 2 * j - 1, 2))::BIGINT)) * 100)
                  // (length(win) // 2)
                  AS BIGINT) AS energy_x100
      FROM w WHERE length(win) > 0),
    isl AS (
      SELECT doc_id, seg_idx,
             seg_idx - cast(row_number() OVER (
               PARTITION BY doc_id ORDER BY seg_idx) AS INT) AS grp
      FROM e WHERE energy_x100 >= 9000)
    SELECT doc_id, cast(min(seg_idx) AS INT) AS start_seg,
           cast(max(seg_idx) AS INT) AS end_seg,
           cast(count(*) AS BIGINT) AS n_segs
    FROM isl GROUP BY doc_id, grp
    """,
    doc="Voiced-segment COALESCING (gaps-and-islands): q196's per-window "
    "VAD decisions merge into maximal runs of consecutive voiced "
    "segments — the step that turns frame-level speech detection into "
    "utterance spans a clip pipeline can cut on. Classic distributed "
    "islands: island id = seg_idx − row_number over each doc's own "
    "(tiny, ≤4-row) partition, then one aggregate per island. Both "
    "windows partition BY DOC — no corpus-scale ordering exists; "
    "payload bytes stay in the Arrow stage (q196), only (id, seg, "
    "energy) rows reach the windows.",
)
def q200_segment_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import energy_windows, to_media_table

    docs = _t(spark, sf_dir, "documents")
    segs = energy_windows(to_media_table(docs, "doc_id", "text", mime="audio/fake"))
    voiced = segs.filter(F.col("energy_x100") >= 9000)
    w = W.partitionBy("doc_id").orderBy("seg_idx")
    isl = voiced.withColumn(
        "grp", F.col("seg_idx") - F.row_number().over(w).cast("int")
    )
    return (
        isl.groupBy("doc_id", "grp")
        .agg(
            F.min("seg_idx").cast("int").alias("start_seg"),
            F.max("seg_idx").cast("int").alias("end_seg"),
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
        )
        .drop("grp")
    )


@query(
    "q201_cusum_drift",
    """
    WITH b AS (SELECT user_id, event_id, ts,
                      cast(floor(value * 1e6) AS BIGINT) AS v
               FROM events),
    s AS (SELECT user_id, cast(sum(v) AS BIGINT) AS sv,
                 cast(count(*) AS BIGINT) AS n
          FROM b GROUP BY user_id),
    d AS (SELECT b.user_id, n, ts, event_id,
                 2 * n * v - 3 * sv AS dd
          FROM b JOIN s USING (user_id)),
    c AS (SELECT user_id, n, ts, event_id,
                 sum(dd) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
          FROM d),
    cu AS (SELECT user_id, n,
                  cc - least(min(cc) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
                    AS cusum
          FROM c)
    SELECT user_id, n,
           cast(max(cusum) // (2 * n) AS BIGINT) AS max_cusum,
           (max(cusum) // (2 * n) > 500000) AS detected
    FROM cu GROUP BY user_id, n
    """,
    doc="Per-user one-sided CUSUM drift detection — did a user's value "
    "level shift upward mid-stream? The max(0, S+d) recursion is not a "
    "prefix sum, but equals C − min(0, running-min C) of the plain "
    "cumulative drift series, so the detector is two windows "
    "PARTITIONED BY USER over a unique (ts, event_id) order. Slack is "
    "self-normalizing (0.5× the user's own mean) and the whole series "
    "is scaled by 2n so EVERYTHING is exact int64 — zero float ops, "
    "bit-identical at any parallelism; operators/stats.py "
    "cusum_per_key. Threshold 0.5 in value units (×1e6 quantized).",
)
def q201_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import cusum_per_key

    ev = _t(spark, sf_dir, "events")
    return cusum_per_key(
        ev,
        F.col("user_id"),
        [F.col("ts"), F.col("event_id")],
        F.floor(F.col("value") * 1e6).cast("bigint"),
        slack_num=1,
        slack_den=2,
        threshold=500_000,
    ).select(
        F.col("k").alias("user_id"), "n", "max_cusum", "detected"
    )


@query(
    "q202_trimmed_mean",
    """
    WITH b AS (SELECT c_mktsegment AS grp,
                      cast(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS v
               FROM customer),
    c AS (SELECT grp, v, cast(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY grp, v),
    t AS (SELECT grp, cast(sum(cnt) AS BIGINT) AS n,
                 cast(sum(v * cnt) AS BIGINT) AS sv
          FROM c GROUP BY grp),
    p AS (SELECT grp, v, cnt,
                 cast(coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS pre
          FROM c),
    k AS (SELECT p.grp, n, sv, v,
                 greatest(least(pre + cnt, n - (n * 10 // 100))
                          - greatest(pre, n * 10 // 100), 0) AS kept
          FROM p JOIN t USING (grp))
    SELECT grp, n,
           cast(sum(kept) AS BIGINT) AS n_kept,
           cast(sum(v * kept) // sum(kept) AS BIGINT) AS trimmed_mean,
           cast(sv // n AS BIGINT) AS raw_mean
    FROM k GROUP BY grp, n, sv
    """,
    doc="Exact 10%%-per-tail trimmed mean of account balance per market "
    "segment — the robust center when tails are junk (test accounts, "
    "corrupt spikes). NOT a per-row ranking: each group's CDF comes "
    "from the grouped bucketed prefix-sum machinery (stats.py "
    "with_prefix_sums + group_cols), and each distinct value "
    "contributes clamp(min(pre+cnt, n−lo) − max(pre, lo)) kept "
    "observations — pure count arithmetic, correct under ties at the "
    "trim boundary (partial counts), zero float ops (means are exact "
    "integer floor divisions in cents). Per-group windows touch only "
    "the |values-per-group| count table, partitioned by (group, "
    "bucket); operators/stats.py trimmed_mean_by.",
)
def q202_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import trimmed_mean_by

    cust = _t(spark, sf_dir, "customer")
    return trimmed_mean_by(
        cust,
        F.col("c_mktsegment"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint"),
        trim_num=10,
        trim_den=100,
        bucket_width=10_000,
    )


@query(
    "q203_jsd_divergence",
    rf"""
    WITH toks AS (SELECT source, unnest({_TOKS}) AS term
                  FROM documents WHERE source IN ('src1', 'src2')),
    c AS (SELECT term,
                 cast(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)
                      AS BIGINT) AS ca,
                 cast(sum(CASE WHEN source = 'src2' THEN 1 ELSE 0 END)
                      AS BIGINT) AS cb
          FROM toks GROUP BY term),
    t AS (SELECT cast(sum(ca) AS BIGINT) AS ta,
                 cast(sum(cb) AS BIGINT) AS tb FROM c),
    terms AS (SELECT ta, tb,
        CASE WHEN ca > 0 THEN
          0.5 * (ca::DOUBLE / ta::DOUBLE)
              * log2(2.0 * (ca::DOUBLE / ta::DOUBLE)
                     / ((ca::DOUBLE / ta::DOUBLE) + (cb::DOUBLE / tb::DOUBLE)))
        ELSE 0.0 END
      + CASE WHEN cb > 0 THEN
          0.5 * (cb::DOUBLE / tb::DOUBLE)
              * log2(2.0 * (cb::DOUBLE / tb::DOUBLE)
                     / ((ca::DOUBLE / ta::DOUBLE) + (cb::DOUBLE / tb::DOUBLE)))
        ELSE 0.0 END AS tj
      FROM c CROSS JOIN t)
    SELECT cast(count(*) AS BIGINT) AS n_terms, ta, tb,
           cast(sum(cast(floor(tj * 1e9) AS BIGINT)) AS BIGINT) AS jsd_q
    FROM terms GROUP BY ta, tb
    """,
    doc="Jensen-Shannon divergence between two sources' token "
    "distributions — the bounded, symmetric drift metric (0..1 bit) "
    "for corpus-composition monitoring, complementing q194's PSI. "
    "Each term's contribution evaluates in a FIXED double expression "
    "order on exact integer counts, quantizes to nano-bits per term "
    "(q194's discipline), then integer-sums — order-independent, "
    "engine-portable, parallelism-independent. One token hash agg + "
    "a vocab-sized reduce; the scalar totals broadcast in-plan.",
)
def q203_jsd_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("source").isin("src1", "src2")
    )
    toks = spread(docs.select("source", "text"), "source").select(
        "source", F.explode(tokens("text")).alias("term")
    )
    c = toks.groupBy("term").agg(
        F.sum((F.col("source") == "src1").cast("int"))
        .cast("bigint")
        .alias("ca"),
        F.sum((F.col("source") == "src2").cast("int"))
        .cast("bigint")
        .alias("cb"),
    )
    t = c.agg(
        F.sum("ca").cast("bigint").alias("ta"),
        F.sum("cb").cast("bigint").alias("tb"),
    )
    p = F.col("ca").cast("double") / F.col("ta").cast("double")
    q_ = F.col("cb").cast("double") / F.col("tb").cast("double")
    tj = F.when(
        F.col("ca") > 0,
        F.lit(0.5) * p * F.log2(F.lit(2.0) * p / (p + q_)),
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("cb") > 0,
        F.lit(0.5) * q_ * F.log2(F.lit(2.0) * q_ / (p + q_)),
    ).otherwise(F.lit(0.0))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "ta",
            "tb",
            F.floor(tj * F.lit(1e9)).cast("bigint").alias("__tj_q"),
        )
        .groupBy("ta", "tb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
            F.sum("__tj_q").cast("bigint").alias("jsd_q"),
        )
        .select("n_terms", "ta", "tb", "jsd_q")
    )


@query(
    "q204_reservoir_sample",
    """
    WITH h AS (SELECT source, doc_id,
                      ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                        AS hv
               FROM documents),
    r AS (SELECT source, doc_id, hv,
                 cast(row_number() OVER (PARTITION BY source
                      ORDER BY hv, doc_id) AS INT) AS rank
          FROM h)
    SELECT source, doc_id, hv, rank FROM r WHERE rank <= 10
    """,
    doc="Deterministic per-source k-reservoir (k=10): rank every doc "
    "by a portable md5 hash of its id and keep each source's k "
    "smallest — a uniform-without-replacement sample that is stable "
    "across runs, engines, partitionings AND INGEST ORDER (re-running "
    "on a grown corpus re-draws the same sample semantics — the "
    "property loops/retries need that rand()-based sampling lacks). "
    "Scale path: topk_per_key's two-phase top-k (per-partition prune "
    "to k, then per-source k over ≤ k·partitions survivors) — the "
    "full corpus never sorts, no partition-less window; "
    "operators/similarity.py topk_per_key.",
)
def q204_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.similarity import topk_per_key

    docs = _t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("hv"),
    )
    return topk_per_key(
        docs, "source", [F.col("hv"), F.col("doc_id")], 10
    ).select("source", "doc_id", "hv", F.col("rank").cast("int").alias("rank"))


def _q205_oracle() -> str:
    return f"""
    WITH qual AS ({_q47_oracle()}),
    v AS (SELECT cast(floor(q.quality * 1e6 + 0.5) AS BIGINT) AS qv,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
          FROM qual q JOIN documents d USING (doc_id)),
    b AS (SELECT least(qv // 100000, 9) AS bin, qv, y FROM v)
    SELECT cast(bin AS BIGINT) AS bin,
           cast(count(*) AS BIGINT) AS n,
           cast(sum(qv) // count(*) AS BIGINT) AS mean_q_micro,
           cast(sum(y) * 1000000 // count(*) AS BIGINT) AS frac_pos_ppm
    FROM b GROUP BY bin
    """


@query(
    "q205_calibration_bins",
    None,  # composed below from the q47 CTE
    doc="Calibration (reliability) table for the quality score against "
    "the is-English label: decile bins of the score vs the observed "
    "positive rate per bin — the eval that says whether 0.8 'means' "
    "80%%. One hash aggregate on the bin key over quantized-integer "
    "score micro-units; bin means and positive fractions are exact "
    "integer floor divisions (ppm), no float op anywhere after the "
    "score itself. 10-row output at any SF.",
)
def q205_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import quality_score

    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("qv"),
        (F.col("lang") == "en").cast("int").alias("y"),
    )
    b = v.select(
        F.least(F.expr("qv div 100000"), F.lit(9)).cast("bigint").alias("bin"),
        "qv",
        "y",
    )
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("sum(qv) div count(1)").cast("bigint").alias("mean_q_micro"),
        F.expr("sum(y) * 1000000 div count(1)")
        .cast("bigint")
        .alias("frac_pos_ppm"),
    )


REGISTRY["q205_calibration_bins"] = QueryDef(
    fn=REGISTRY["q205_calibration_bins"].fn,
    oracle=_q205_oracle(),
    doc=REGISTRY["q205_calibration_bins"].doc,
)


@query(
    "q206_sparse_cosine_pairs",
    rf"""
    WITH toks AS (SELECT doc_id, unnest({_NGRAMS(3)}) AS t FROM documents),
    tf AS (SELECT doc_id, t, cast(count(*) AS BIGINT) AS tf
           FROM toks GROUP BY 1, 2),
    dfq AS (SELECT t, cast(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    nd AS (SELECT cast(count(*) AS BIGINT) AS n FROM documents),
    w AS (SELECT doc_id, t, df,
                 tf * cast(floor(ln(n::DOUBLE / df::DOUBLE) * 1e3) AS BIGINT)
                   AS w
          FROM tf JOIN dfq USING (t) CROSS JOIN nd),
    norms AS (SELECT doc_id, cast(sum(w * w) AS BIGINT) AS n2
              FROM w GROUP BY doc_id),
    rare AS (SELECT doc_id, t FROM w WHERE df BETWEEN 2 AND 10),
    cand AS (SELECT a.doc_id AS ia, b.doc_id AS ib
             FROM rare a JOIN rare b USING (t) WHERE a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING count(*) >= 2),
    dots AS (SELECT ia, ib, cast(sum(wa.w * wb.w) AS BIGINT) AS dot
             FROM cand
             JOIN w wa ON wa.doc_id = ia
             JOIN w wb ON wb.doc_id = ib AND wb.t = wa.t
             GROUP BY ia, ib),
    s AS (SELECT ia AS id_a, ib AS id_b, dot,
                 cast(floor(dot::DOUBLE
                      / (sqrt(na.n2::DOUBLE) * sqrt(nb.n2::DOUBLE)) * 1e6)
                      AS BIGINT) AS cos_q
          FROM dots
          JOIN norms na ON na.doc_id = ia
          JOIN norms nb ON nb.doc_id = ib)
    SELECT id_a, id_b, dot, cos_q FROM s WHERE cos_q >= 300000
    """,
    doc="Rare-feature-blocked exact TF-IDF cosine pair mining over "
    "word-trigram shingles — the sparse-vector near-dup detector "
    "(MinHash finds set overlap; this finds WEIGHTED similarity: tf "
    "and idf both count). Shingle features, not unigrams: shingles "
    "keep a heavy-tailed df spectrum even on templated corpora with "
    "tiny unigram vocabularies (this fixture: 31 distinct tokens but "
    "16k+ trigrams). Blocking = AllPairs/PPJoin prefix-filter spirit: "
    "candidates must share ≥2 rare shingles (df ∈ [2,10]) — the "
    "two-band-collision analogue; generation is Σdf² over rare "
    "shingles with bounded posting lists, never O(N²), and the "
    "≥2-shared gate prunes the single-coincidence tail before the "
    "exact dot runs over candidates. Weights "
    "are integer milli-idf × tf, so dots and norms are exact int64 "
    "sums (order-free at any parallelism); the one float expression "
    "(dot/(√na·√nb)) has fixed op order and quantizes to ppm. "
    "operators/textual.py sparse_cosine_pairs.",
)
def q206_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import sparse_cosine_pairs

    docs = _t(spark, sf_dir, "documents")
    return sparse_cosine_pairs(
        docs,
        "doc_id",
        "text",
        shingle_n=3,
        min_df=2,
        max_df=10,
        min_shared=2,
        threshold_ppm=300_000,
    )


@query(
    "q207_phash_near_dups",
    """
    WITH h AS (SELECT doc_id, substr(hex(encode(text)), 1, 96) AS hx
               FROM documents),
    n0 AS (SELECT doc_id, hx, cast(length(hx) // 2 AS INT) AS n
           FROM h WHERE length(hx) >= 2),
    m AS (SELECT doc_id, hx, n,
                 cast(list_sum(list_transform(range(0, n),
                      i -> ('0x' || substr(hx, 2 * i + 1, 2))::BIGINT))
                      AS BIGINT) // n AS mb
          FROM n0),
    a AS (SELECT doc_id AS id,
                 cast(list_sum(list_transform(range(0, n),
                      i -> CASE WHEN ('0x' || substr(hx, 2 * i + 1, 2))::BIGINT
                                     > mb
                                THEN (1::BIGINT << i) ELSE 0 END))
                      AS BIGINT) AS ahash
          FROM m),
    bands AS (SELECT id, ahash, j, (ahash >> (16 * j)) & 65535 AS bv
              FROM a CROSS JOIN unnest(range(0, 3)) AS r(j)),
    cand AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b,
                    x.ahash AS ha, y.ahash AS hb
             FROM bands x JOIN bands y
               ON x.j = y.j AND x.bv = y.bv AND x.id < y.id)
    SELECT id_a, id_b, cast(bit_count(xor(ha, hb)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(ha, hb)) <= 2
    """,
    doc="Perceptual-hash near-duplicate detection in HAMMING space: "
    "aHash fingerprints (operators/multimodal.py ahash48 — bit i set "
    "iff byte i beats the payload mean; a real pipeline hashes 8×8 "
    "grayscale pixel means behind the same bigint contract) are split "
    "into 3×16-bit bands and bucket-joined — any pair within Hamming "
    "2 collides on ≥1 band by pigeonhole (3 bands > 2 corrupted "
    "bits), then one xor+popcount verifies exactly. Threshold and "
    "band geometry are tuned to the signal: structured ASCII "
    "payloads put thousands of doc pairs within Hamming 8, so the "
    "tight radius is what separates true prefix near-dups from "
    "byte-pattern noise. Same LSH shape as "
    "MinHash banding but for bit-vector space; all integer, "
    "entirely JVM-side built-in expressions, no Python stage.",
)
def q207_phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import ahash48, hamming_near_dups

    docs = _t(spark, sf_dir, "documents")
    hashes = ahash48(docs, "doc_id", "text").select("id", "ahash")
    return hamming_near_dups(hashes, n_bands=3, band_bits=16, max_hamming=2)


@query(
    "q208_contamination_depth",
    rf"""
    WITH train AS (SELECT doc_id, text FROM documents
                   WHERE source <> 'src0'),
    bench AS (SELECT text FROM documents WHERE source = 'src0'),
    b4 AS (SELECT DISTINCT unnest({_NGRAMS(4)}) AS g FROM bench),
    b8 AS (SELECT DISTINCT unnest({_NGRAMS(8)}) AS g FROM bench),
    b16 AS (SELECT DISTINCT unnest({_NGRAMS(16)}) AS g FROM bench),
    t4 AS (SELECT DISTINCT doc_id FROM
           (SELECT doc_id, unnest({_NGRAMS(4)}) AS g FROM train) x
           JOIN b4 USING (g)),
    t8 AS (SELECT DISTINCT doc_id FROM
           (SELECT doc_id, unnest({_NGRAMS(8)}) AS g FROM train) x
           JOIN b8 USING (g)),
    t16 AS (SELECT DISTINCT doc_id FROM
            (SELECT doc_id, unnest({_NGRAMS(16)}) AS g FROM train) x
            JOIN b16 USING (g)),
    hits AS (SELECT doc_id, 4 AS d FROM t4
             UNION ALL SELECT doc_id, 8 FROM t8
             UNION ALL SELECT doc_id, 16 FROM t16),
    mx AS (SELECT doc_id, max(d) AS depth FROM hits GROUP BY doc_id),
    alld AS (SELECT t.doc_id, coalesce(mx.depth, 0) AS depth
             FROM train t LEFT JOIN mx USING (doc_id))
    SELECT cast(depth AS INT) AS depth, cast(count(*) AS BIGINT) AS n_docs
    FROM alld GROUP BY depth
    """,
    doc="Contamination DEPTH profiling — q94 answers 'is this doc "
    "contaminated at n=5?'; this measures HOW DEEP the benchmark "
    "overlap runs per training doc (max n ∈ {{4, 8, 16}} with a shared "
    "n-gram) and emits the corpus depth histogram, the triage report "
    "that separates incidental phrase collisions (depth 4) from "
    "verbatim leakage (depth 16). Each probe is q94's broadcast "
    "shape: benchmark gram sets build distinct-then-broadcast (eval "
    "suites are KBs-to-MBs vs the 100 TB train side), the train scan "
    "probes map-side with hashed grams (no gram strings materialize; "
    "textual.py hashed_word_ngrams), and only doc-id hit lists "
    "shuffle. Three probes share one tokenization via the spread "
    "fan-out.",
)
def q208_contamination_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.storagelevel import StorageLevel

    from tytodb_spark.operators.textual import (
        hashed_ngrams_from_tokens,
        spread,
        tokens,
    )

    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    bench = docs.filter(F.col("source") == "src0").select("text")
    # tokenize ONCE; the persists are optimizer barriers so the three
    # depth lambdas index a bound array instead of re-splitting the
    # text per element (hashed_ngrams_from_tokens doc; 6.7 -> 2.1 s)
    tok = (
        spread(train, "doc_id")
        .select("doc_id", tokens("text").alias("tk"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    btok = bench.select(tokens("text").alias("tk")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hits = None
    for n in (4, 8, 16):
        bg = btok.select(
            F.explode(hashed_ngrams_from_tokens("tk", n)).alias("__g")
        ).distinct()
        tg = tok.select(
            "doc_id",
            F.explode(hashed_ngrams_from_tokens("tk", n)).alias("__g"),
        )
        h = (
            tg.join(F.broadcast(bg), "__g")
            .select("doc_id")
            .distinct()
            .withColumn("d", F.lit(n))
        )
        hits = h if hits is None else hits.unionByName(h)
    mx = hits.groupBy("doc_id").agg(F.max("d").alias("depth"))
    return (
        train.select("doc_id")
        .join(mx, "doc_id", "left")
        .select(F.coalesce(F.col("depth"), F.lit(0)).cast("int").alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "q209_grouped_quantiles",
    """
    WITH b AS (SELECT o_orderstatus AS grp,
                      cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
               FROM orders),
    c AS (SELECT grp, v, cast(count(*) AS BIGINT) AS cnt
          FROM b GROUP BY 1, 2),
    t AS (SELECT grp, cast(sum(cnt) AS BIGINT) AS n FROM c GROUP BY grp),
    p AS (SELECT grp, v, cnt,
                 cast(coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS pre
          FROM c),
    j AS (SELECT p.grp, p.v, p.cnt, p.pre, t.n FROM p JOIN t USING (grp))
    SELECT grp, n,
      cast(min(CASE WHEN pre < (n * 25 + 99) // 100
                     AND (n * 25 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p25,
      cast(min(CASE WHEN pre < (n * 50 + 99) // 100
                     AND (n * 50 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p50,
      cast(min(CASE WHEN pre < (n * 75 + 99) // 100
                     AND (n * 75 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p75,
      cast(min(CASE WHEN pre < (n * 95 + 99) // 100
                     AND (n * 95 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p95
    FROM j GROUP BY grp, n
    """,
    doc="Exact per-group DISCRETE quantiles (order-value cents at rank "
    "⌈n·p⌉ per order status) — the count-arithmetic twin of q59's "
    "interpolated percentile, built for the 100 TB shape: no per-row "
    "ranking, no sort of the fact table, no float op anywhere. Each "
    "group's CDF is the grouped bucketed two-level prefix sum "
    "(stats.py with_prefix_sums + group_cols); all four quantiles "
    "resolve in ONE conditional-min pass over the |group × distinct "
    "value| count table. Exact under ties by construction (rank "
    "intervals, not row numbers); operators/stats.py "
    "grouped_quantiles.",
)
def q209_grouped_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    orders = _t(spark, sf_dir, "orders")
    return grouped_quantiles(
        orders,
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint"),
        [("p25", 25, 100), ("p50", 50, 100), ("p75", 75, 100),
         ("p95", 95, 100)],
        bucket_width=1_000_000,
    )


@query(
    "q210_multimodal_dedup_audit",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    f AS (
      SELECT doc_id,
             sha256(substr(hx, i * 128 + 1, 128)) AS fh
      FROM h
      CROSS JOIN unnest(range(0, least(4, greatest(1,
                   length(hx) // 128)))) AS r(i)),
    fd AS (SELECT DISTINCT doc_id, fh FROM f),
    fpairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
               FROM fd a JOIN fd b ON a.fh = b.fh AND a.doc_id < b.doc_id),
    n0 AS (SELECT doc_id, substr(hx, 1, 96) AS hx96,
                  cast(least(length(hx), 96) // 2 AS INT) AS n
           FROM h WHERE length(hx) >= 2),
    m AS (SELECT doc_id, hx96, n,
                 cast(list_sum(list_transform(range(0, n),
                      i -> ('0x' || substr(hx96, 2 * i + 1, 2))::BIGINT))
                      AS BIGINT) // n AS mb
          FROM n0),
    a AS (SELECT doc_id AS id,
                 cast(list_sum(list_transform(range(0, n),
                      i -> CASE WHEN ('0x' || substr(hx96, 2 * i + 1,
                                      2))::BIGINT > mb
                                THEN (1::BIGINT << i) ELSE 0 END))
                      AS BIGINT) AS ahash
          FROM m),
    bands AS (SELECT id, ahash, j, (ahash >> (16 * j)) & 65535 AS bv
              FROM a CROSS JOIN unnest(range(0, 3)) AS r(j)),
    ppairs AS (SELECT DISTINCT x.id AS id_a, y.id AS id_b
               FROM bands x JOIN bands y
                 ON x.j = y.j AND x.bv = y.bv AND x.id < y.id
                  AND bit_count(xor(x.ahash, y.ahash)) <= 2),
    u AS (SELECT coalesce(f.id_a, p.id_a) AS id_a,
                 coalesce(f.id_b, p.id_b) AS id_b,
                 (f.id_a IS NOT NULL) AS in_f, (p.id_a IS NOT NULL) AS in_p
          FROM fpairs f FULL OUTER JOIN ppairs p
            ON f.id_a = p.id_a AND f.id_b = p.id_b)
    SELECT cast(sum(CASE WHEN in_f THEN 1 ELSE 0 END) AS BIGINT)
             AS n_frame_pairs,
           cast(sum(CASE WHEN in_p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_phash_pairs,
           cast(sum(CASE WHEN in_f AND in_p THEN 1 ELSE 0 END) AS BIGINT)
             AS n_both,
           cast(sum(CASE WHEN in_f AND in_p THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS jaccard_ppm
    FROM u
    """,
    doc="Multimodal dedup STRATEGY AUDIT — the q114-style agreement "
    "matrix between the two visual near-dup detectors: exact shared-"
    "frame pairs (q195's hash-keyed buckets) vs perceptual-hash "
    "Hamming pairs (q207's banded LSH). Reports both pair counts, the "
    "intersection, and the Jaccard agreement — the calibration a "
    "pipeline owner reads before choosing a strategy or tightening a "
    "radius. Both pair sets are bucket-bounded (hash buckets / LSH "
    "bands — never all-pairs); the audit itself is one full-outer "
    "join on the pair key + a scalar reduce.",
)
def q210_multimodal_dedup_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import (
        ahash48,
        hamming_near_dups,
        sample_frames,
        to_media_table,
    )

    docs = _t(spark, sf_dir, "documents")
    frames = sample_frames(
        to_media_table(docs, "doc_id", "text", mime="video/fake")
    )
    fd = frames.select("doc_id", "frame_sha256").distinct()
    fpairs = (
        fd.alias("a")
        .join(fd.alias("b"), "frame_sha256")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    ppairs = hamming_near_dups(
        ahash48(docs, "doc_id", "text").select("id", "ahash"),
        n_bands=3,
        band_bits=16,
        max_hamming=2,
    ).select("id_a", "id_b")
    u = (
        fpairs.withColumn("in_f", F.lit(True))
        .join(
            ppairs.withColumn("in_p", F.lit(True)),
            ["id_a", "id_b"],
            "full_outer",
        )
        .select(
            F.coalesce(F.col("in_f"), F.lit(False)).alias("in_f"),
            F.coalesce(F.col("in_p"), F.lit(False)).alias("in_p"),
        )
    )
    return u.agg(
        F.sum(F.col("in_f").cast("int")).cast("bigint").alias("n_frame_pairs"),
        F.sum(F.col("in_p").cast("int")).cast("bigint").alias("n_phash_pairs"),
        F.sum((F.col("in_f") & F.col("in_p")).cast("int"))
        .cast("bigint")
        .alias("n_both"),
        F.expr(
            "sum(cast(in_f and in_p as int)) * 1000000 div count(1)"
        )
        .cast("bigint")
        .alias("jaccard_ppm"),
    )


@query(
    "q211_tokenizer_fertility",
    r"""
    WITH b AS (
      SELECT source, lang,
             cast(len(list_filter(string_split_regex(lower(trim(text)),
                  '\s+'), x -> x <> '')) AS BIGINT) AS ws_toks,
             cast(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS re_toks,
             cast(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents)
    SELECT source, lang,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(ws_toks) AS BIGINT) AS ws_tokens,
           cast(sum(re_toks) AS BIGINT) AS re_tokens,
           cast(sum(n_bytes) AS BIGINT) AS total_bytes,
           cast(sum(ws_toks) * 1024000 // sum(n_bytes) AS BIGINT)
             AS ws_per_kb_x1000,
           cast(sum(re_toks) * 1000000 // sum(ws_toks) AS BIGINT)
             AS re_per_ws_ppm
    FROM b GROUP BY source, lang
    """,
    doc="Tokenizer FERTILITY census per (source, lang): whitespace "
    "tokens vs BPE-style pretokenizer units (letter runs / digit runs "
    "/ single punctuation — the GPT-2-family pretokenization shape) "
    "per kilobyte — the first metric a tokenizer-training run reports "
    "(how many units per byte each corpus slice costs, and how "
    "fragmentation varies by language/source). Pure map-side "
    "expressions + one small-group aggregate; ratios are exact "
    "integer floor divisions (×1000 / ppm) so parity is bit-exact.",
)
def q211_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import token_count

    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        "source",
        "lang",
        token_count("text").cast("bigint").alias("ws_toks"),
        F.expr(
            r"regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')"
        )
        .cast("bigint")
        .alias("re_toks"),
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("bigint")
        .alias("n_bytes"),
    )
    return b.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("ws_toks").cast("bigint").alias("ws_tokens"),
        F.sum("re_toks").cast("bigint").alias("re_tokens"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.expr("sum(ws_toks) * 1024000 div sum(n_bytes)")
        .cast("bigint")
        .alias("ws_per_kb_x1000"),
        F.expr("sum(re_toks) * 1000000 div sum(ws_toks)")
        .cast("bigint")
        .alias("re_per_ws_ppm"),
    )


def _HLL_EST_SQL(select_k: str) -> str:
    """Scalar SQL subquery: portable-HLL estimate (milli-units) of the
    distinct count of column k in ``select_k`` — q165's register
    pipeline, parameterized for reuse."""
    return f"""(
      WITH r0 AS (
        SELECT ('0x' || substr(md5(k::VARCHAR), 1, 2))::BIGINT AS ridx,
               substr(md5(k::VARCHAR), 3, 13) AS w
        FROM ({select_k})),
      r1 AS (
        SELECT ridx,
               CASE WHEN length(ltrim(w, '0')) = 0 THEN 53
                    ELSE (length(w) - length(ltrim(w, '0'))) * 4
                         + 3 - cast(substr('011222233333333',
                               strpos('0123456789abcdef',
                                      substr(ltrim(w, '0'), 1, 1)) - 1, 1)
                               AS INT)
                         + 1 END AS rho
        FROM r0),
      regs AS (SELECT ridx, max(rho) AS rho FROM r1 GROUP BY ridx),
      agg AS (SELECT cast(count(*) AS BIGINT) AS nset,
                     cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                       AS hsum
              FROM regs),
      est AS (SELECT nset,
                     0.7213 / (1 + 1.079 / 256) * (256.0 * 256.0)
                       * 9007199254740992.0
                       / cast(hsum + (256 - nset)
                              * (1::BIGINT << 53) AS DOUBLE) AS raw,
                     256 - nset AS zeros
              FROM agg)
      SELECT cast(floor(CASE WHEN zeros > 0 AND raw <= 2.5 * 256
                             THEN 256.0 * ln(256.0 / zeros) ELSE raw END
                        * 1000 + 0.5) AS BIGINT)
      FROM est)"""


@query(
    "q212_join_size_estimate",
    f"""
    WITH d1 AS (SELECT {_HLL_EST_SQL("SELECT o_custkey AS k FROM orders")}
                  AS d1_q),
    d2 AS (SELECT {_HLL_EST_SQL("SELECT c_custkey AS k FROM customer")}
             AS d2_q),
    sz AS (SELECT (SELECT cast(count(*) AS BIGINT) FROM orders) AS n_r,
                  (SELECT cast(count(*) AS BIGINT) FROM customer) AS n_s),
    act AS (SELECT cast(count(*) AS BIGINT) AS actual_rows
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    e AS (SELECT n_r, n_s, d1_q, d2_q, actual_rows,
                 cast(floor(n_r::DOUBLE * n_s::DOUBLE * 1000.0
                      / greatest(d1_q, d2_q)::DOUBLE) AS BIGINT) AS est_rows
          FROM sz CROSS JOIN d1 CROSS JOIN d2 CROSS JOIN act)
    SELECT n_r, n_s, d1_q, d2_q, est_rows, actual_rows,
           (abs(est_rows - actual_rows) * 100 <= 25 * actual_rows) AS err_ok
    FROM e
    """,
    doc="HLL-based JOIN-SIZE estimation vs ground truth — the "
    "cost-model primitive behind join reordering and broadcast "
    "decisions (what Catalyst's CBO column stats do, rebuilt on the "
    "portable mergeable sketch): |R⋈S| ≈ |R|·|S| / max(d_R, d_S) "
    "with both distinct counts from q165's md5-portable HLL register "
    "tables, checked against the exact join cardinality and gated at "
    "25%% (two stacked 6.5%%-error estimates). Sketch builds are one "
    "map-side projection + a 256-row max aggregate per side — "
    "statistics collection never rescans or shuffles the fact "
    "tables; operators/sketches.py hll_build/hll_estimate.",
)
def q212_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sketches import hll_build, hll_estimate

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    d1 = hll_estimate(hll_build(orders, "o_custkey")).select(
        F.col("hll_est_q").alias("d1_q")
    )
    d2 = hll_estimate(hll_build(cust, "c_custkey")).select(
        F.col("hll_est_q").alias("d2_q")
    )
    sz = orders.agg(F.count(F.lit(1)).cast("bigint").alias("n_r")).crossJoin(
        F.broadcast(cust.agg(F.count(F.lit(1)).cast("bigint").alias("n_s")))
    )
    act = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).cast("bigint").alias("actual_rows"))
    )
    e = (
        sz.crossJoin(F.broadcast(d1))
        .crossJoin(F.broadcast(d2))
        .crossJoin(F.broadcast(act))
        .withColumn(
            "est_rows",
            F.floor(
                F.col("n_r").cast("double")
                * F.col("n_s").cast("double")
                * F.lit(1000.0)
                / F.greatest(F.col("d1_q"), F.col("d2_q")).cast("double")
            ).cast("bigint"),
        )
    )
    return e.select(
        "n_r",
        "n_s",
        "d1_q",
        "d2_q",
        "est_rows",
        "actual_rows",
        (
            F.abs(F.col("est_rows") - F.col("actual_rows")) * 100
            <= 25 * F.col("actual_rows")
        ).alias("err_ok"),
    )


@query(
    "q213_orc_roundtrip",
    """
    SELECT lang, cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
    doc="ORC round-trip (q53's CSV twin on the second columnar "
    "format): write documents as ORC, read back, aggregate — the "
    "oracle aggregates the ORIGINAL parquet, so any loss/corruption "
    "in the ORC path (types, nulls, encoding) breaks parity. ORC "
    "matters at scale as the interchange format half the Hadoop "
    "estate still speaks; Spark's writer keeps columnar pushdown "
    "semantics identical to parquet. sources/io.py write_table/"
    "read_table.",
)
def q213_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from tytodb_spark.sources import io as IO

    docs = _t(spark, sf_dir, "documents")
    tmp = tempfile.mkdtemp(prefix="tyto_orc_")
    try:
        path = f"{tmp}/docs.orc"
        IO.write_table(docs, path, "orc")
        back = IO.read_table(spark, path, "orc")
        out = back.groupBy("lang").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        rows = out.collect()  # materialize before the tempdir vanishes
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@query(
    "q214_seasonal_baseline",
    """
    WITH b AS (SELECT event_type,
                      cast(dayofweek(ts) AS INT) AS dow,
                      cast(date_trunc('day', ts) AS TIMESTAMP) AS day,
                      cast(floor(value * 1e6) AS BIGINT) AS v
               FROM events),
    daily AS (SELECT event_type, dow, day,
                     cast(count(*) AS BIGINT) AS n,
                     cast(sum(v) AS BIGINT) AS sv
              FROM b GROUP BY 1, 2, 3),
    base AS (SELECT event_type, dow,
                    cast(count(*) AS BIGINT) AS n_days,
                    cast(sum(n) AS BIGINT) AS tn,
                    cast(sum(sv) AS BIGINT) AS tsv
             FROM daily GROUP BY 1, 2),
    j AS (SELECT d.event_type, d.dow, d.day,
                 d.sv // d.n AS day_mean,
                 base.tsv // base.tn AS dow_mean,
                 d.sv // d.n - base.tsv // base.tn AS resid,
                 base.n_days
          FROM daily d JOIN base USING (event_type, dow))
    SELECT event_type, cast(count(*) AS BIGINT) AS n_days_total,
           cast(sum(CASE WHEN abs(resid) > 100000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anomalous_days,
           cast(max(abs(resid)) AS BIGINT) AS max_abs_resid
    FROM j GROUP BY event_type
    """,
    doc="Day-of-week SEASONAL baseline + residual anomaly census — the "
    "monitoring pass that separates 'weekends are always low' from "
    "'Tuesday broke': each (event type, weekday) builds its own "
    "baseline mean from exact integer sums, every day's mean is "
    "scored against its weekday's baseline, and days whose residual "
    "exceeds 0.1 value-units flag as anomalous. Two keyed aggregates "
    "(day grain → weekday grain, the second re-aggregating the "
    "first's partials) + one broadcastable join back; all means are "
    "exact integer floor divisions in ×1e6 value units — no float op "
    "anywhere, bit-identical at any parallelism.",
)
def q214_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.dayofweek("ts").cast("int").alias("dow"),
        F.date_trunc("day", "ts").alias("day"),
        F.floor(F.col("value") * 1e6).cast("bigint").alias("v"),
    )
    daily = b.groupBy("event_type", "dow", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("bigint").alias("sv"),
    )
    base = daily.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("n").cast("bigint").alias("tn"),
        F.sum("sv").cast("bigint").alias("tsv"),
    )
    j = daily.join(base, ["event_type", "dow"]).withColumn(
        "resid", F.expr("sv div n - tsv div tn")
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days_total"),
        F.sum((F.abs(F.col("resid")) > 100000).cast("int"))
        .cast("bigint")
        .alias("n_anomalous_days"),
        F.max(F.abs(F.col("resid"))).cast("bigint").alias("max_abs_resid"),
    )


def _q215_oracle(k: int = 3, rounds: int = 8) -> str:
    parts = [
        """
    WITH ids AS (SELECT doc_id FROM documents),
    chain AS (
      SELECT a.doc_id AS u, b.doc_id AS v FROM ids a JOIN ids b
        ON b.doc_id = a.doc_id + 1 AND a.doc_id // 10 = b.doc_id // 10
       WHERE (a.doc_id // 10) % 2 = 0
      UNION ALL
      SELECT a.doc_id, b.doc_id FROM ids a JOIN ids b
        ON b.doc_id = a.doc_id + 2 AND a.doc_id // 10 = b.doc_id // 10
       WHERE (a.doc_id // 10) % 2 = 0),
    clique AS (
      SELECT a.doc_id AS u, b.doc_id AS v FROM ids a JOIN ids b
        ON a.doc_id // 5 = b.doc_id // 5 AND a.doc_id < b.doc_id
       WHERE (a.doc_id // 5) % 4 = 3),
    und AS (SELECT DISTINCT u, v FROM
            (SELECT u, v FROM chain UNION ALL SELECT u, v FROM clique)
            WHERE u <> v),
    e0 AS MATERIALIZED (SELECT u, v FROM und UNION ALL SELECT v, u FROM und)"""
    ]
    for i in range(rounds):
        parts.append(
            # MATERIALIZED: inlined CTEs would expand each round's edge
            # set into every reference (~3 refs/round -> 3^rounds scans)
            f""",
    d{i} AS MATERIALIZED (SELECT u, count(*) AS deg FROM e{i} GROUP BY u),
    k{i} AS MATERIALIZED (SELECT u FROM d{i} WHERE deg >= {k}),
    e{i + 1} AS MATERIALIZED (SELECT e.u, e.v FROM e{i} e
               JOIN k{i} ku ON ku.u = e.u
               JOIN k{i} kv ON kv.u = e.v)"""
        )
    parts.append(
        f"""
    SELECT u AS node, cast(count(*) AS BIGINT) AS deg
    FROM e{rounds} GROUP BY u HAVING count(*) >= {k}"""
    )
    return "".join(parts)


@query(
    "q215_kcore",
    None,  # unrolled-peeling oracle composed below
    doc="k-core decomposition (k=3) of a structured dup graph by "
    "iterative peeling — the density filter that separates "
    "structurally-dense duplicate families (cliques of mutual "
    "near-dups: SURVIVE) from incidental pairwise chains (peel away "
    "over a ~6-round cascade). Completes the iterative-graph family "
    "(CC, pagerank, triangles, star contraction) with the one "
    "primitive whose fixpoint needs degree recomputation per round. "
    "Each round: one degree aggregate + two semi-joins, edge frame "
    "localCheckpointed per round (flat lineage), only the convergence "
    "COUNT reaches the driver. Round count is a property of graph "
    "structure (the fixture's 10-node chain blocks cascade in 6 "
    "rounds at ANY SF), so the DuckDB oracle can unroll 8 fixed "
    "peeling rounds and match exactly; operators/graph.py kcore.",
)
def q215_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.graph import kcore

    ids = _t(spark, sf_dir, "documents").select("doc_id")
    a, b = ids.alias("a"), ids.alias("b")

    def chain(step: int) -> DataFrame:
        return (
            a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + step)
            .filter(F.expr("a.doc_id div 10") == F.expr("b.doc_id div 10"))
            .filter(F.expr("(a.doc_id div 10) % 2 = 0"))
            .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
        )

    clique = (
        a.join(b, F.expr("a.doc_id div 5") == F.expr("b.doc_id div 5"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.expr("(a.doc_id div 5) % 4 = 3"))
        .select(F.col("a.doc_id").alias("src"), F.col("b.doc_id").alias("dst"))
    )
    edges = chain(1).unionByName(chain(2)).unionByName(clique)
    return kcore(edges, k=3)


REGISTRY["q215_kcore"] = QueryDef(
    fn=REGISTRY["q215_kcore"].fn,
    oracle=_q215_oracle(),
    doc=REGISTRY["q215_kcore"].doc,
)


@query(
    "q216_verbatim_leakage",
    """
    WITH pr0 AS (SELECT DISTINCT substr(text, 1, 48) AS probe
                 FROM documents WHERE source = 'src0'
                   AND length(substr(text, 1, 48)) >= 16),
    pr AS (SELECT probe,
                  ('0x' || substr(md5(probe), 1, 8))::BIGINT AS hv
           FROM pr0 ORDER BY hv, probe LIMIT 100),
    train AS (SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    hits AS (SELECT t.doc_id, p.probe FROM train t, pr p
             WHERE strpos(t.text, p.probe) > 0)
    SELECT (SELECT cast(count(*) AS BIGINT) FROM pr) AS n_probes,
           cast(count(DISTINCT doc_id) AS BIGINT) AS n_contaminated_docs,
           cast(count(*) AS BIGINT) AS n_hits
    FROM hits
    """,
    doc="VERBATIM leakage probe — the exact-substring complement of "
    "gram-overlap decontamination (q94 catches shared n-grams at "
    "token granularity; this catches benchmark text quoted verbatim "
    "at ANY alignment, the string a gram tokenizer can split "
    "differently). A deterministic 100-probe sample of benchmark "
    "prefixes (md5-rank smallest — stable across runs, engines, and "
    "corpus growth) broadcasts to the train scan, which probes "
    "map-side with instr — no shuffle of the corpus, output is one "
    "audit row. A production deployment compiles the probe set into "
    "one Aho-Corasick automaton per task behind the same broadcast "
    "contract; the per-probe instr spelling is the built-in-only "
    "equivalent (cost |probes|·scan, bounded by the sample cap).",
)
def q216_verbatim_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pr0 = (
        docs.filter(F.col("source") == "src0")
        .select(F.substring("text", 1, 48).alias("probe"))
        .filter(F.length("probe") >= 16)
        .distinct()
    )
    pr = (
        pr0.select(
            "probe",
            F.conv(F.substring(F.md5("probe"), 1, 8), 16, 10)
            .cast("bigint")
            .alias("hv"),
        )
        .orderBy("hv", "probe")
        .limit(100)
    )
    train = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    hits = train.crossJoin(F.broadcast(pr.select("probe"))).filter(
        F.expr("instr(text, probe) > 0")
    )
    n_probes = pr.agg(F.count(F.lit(1)).cast("bigint").alias("n_probes"))
    return (
        hits.agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_contaminated_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_hits"),
        )
        .crossJoin(F.broadcast(n_probes))
        .select("n_probes", "n_contaminated_docs", "n_hits")
    )


@query(
    "q217_ohlc_resample",
    """
    WITH b AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                      ts, event_id,
                      cast(floor(value * 1e6) AS BIGINT) AS v
               FROM events),
    r AS (SELECT event_type, hour, v,
                 row_number() OVER (PARTITION BY event_type, hour
                                    ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, hour
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM b)
    SELECT event_type, hour,
           cast(max(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_q,
           cast(max(v) AS BIGINT) AS high_q,
           cast(min(v) AS BIGINT) AS low_q,
           cast(max(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_q,
           cast(count(*) AS BIGINT) AS n
    FROM r GROUP BY event_type, hour
    """,
    doc="OHLC time-series resampling (open/high/low/close per event "
    "type per hour) — the canonical downsampling shape for metric and "
    "market data. Open/close need the first/last value under the "
    "unique (ts, event_id) event order: two row_number windows "
    "PARTITIONED BY the resample bucket (tiny partitions, never a "
    "global sort) feed one hash aggregate. Values quantize to exact "
    "×1e6 integers so first/last/min/max all hash-compare bit-exactly.",
)
def q217_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour"),
        "ts",
        "event_id",
        F.floor(F.col("value") * 1e6).cast("bigint").alias("v"),
    )
    wa = W.partitionBy("event_type", "hour").orderBy("ts", "event_id")
    wd = W.partitionBy("event_type", "hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    r = b.select(
        "event_type",
        "hour",
        "v",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("v")))
        .cast("bigint")
        .alias("open_q"),
        F.max("v").cast("bigint").alias("high_q"),
        F.min("v").cast("bigint").alias("low_q"),
        F.max(F.when(F.col("rn_d") == 1, F.col("v")))
        .cast("bigint")
        .alias("close_q"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


@query(
    "q218_gap_fill_locf",
    """
    WITH hourly AS (SELECT event_type,
                           cast(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                           cast(count(*) AS BIGINT) AS cnt
                    FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, min(hour) AS h0, max(hour) AS h1
             FROM hourly GROUP BY event_type),
    spine AS (SELECT event_type,
                     unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM span),
    j AS (SELECT s.event_type, s.hour, h.cnt
          FROM spine s LEFT JOIN hourly h USING (event_type, hour)),
    g AS (SELECT event_type, hour, cnt,
                 count(cnt) OVER (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM j)
    SELECT event_type, hour,
           cast(max(cnt) OVER (PARTITION BY event_type, grp) AS BIGINT)
             AS filled,
           (cnt IS NULL) AS was_gap
    FROM g
    """,
    doc="Dense-spine gap filling with last-observation-carried-forward "
    "— the resample-then-fill step every metrics pipeline needs "
    "(missing hours must exist as rows, carrying the last known "
    "value). The hour spine GENERATES in-plan (sequence per type from "
    "its own min/max — no driver loop, no external calendar table); "
    "LOCF uses the portable count-non-null prefix trick (running "
    "count of observed values partitions the timeline into carry "
    "groups; max within group is the carried value) — works "
    "identically in both engines, no IGNORE NULLS dialect "
    "dependence. All windows partition by event type.",
)
def q218_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    span = hourly.groupBy("event_type").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = span.select(
        "event_type",
        F.explode(
            F.expr("sequence(h0, h1, interval 1 hour)")
        ).alias("hour"),
    )
    j = spine.join(hourly, ["event_type", "hour"], "left")
    wg = (
        W.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    g = j.select(
        "event_type", "hour", "cnt", F.count("cnt").over(wg).alias("grp")
    )
    return g.select(
        "event_type",
        "hour",
        F.max("cnt")
        .over(W.partitionBy("event_type", "grp"))
        .cast("bigint")
        .alias("filled"),
        F.col("cnt").isNull().alias("was_gap"),
    )


@query(
    "q219_decay_attribution",
    """
    WITH conv AS (SELECT event_id AS conv_id, user_id,
                         epoch_us(ts) AS conv_us,
                         cast(floor(value * 100 + 0.5) AS BIGINT) AS val_cents
                  FROM events WHERE event_type = 'purchase'),
    touch AS (SELECT user_id, event_type, epoch_us(ts) AS touch_us
              FROM events WHERE event_type IN ('click', 'view')),
    pair AS (SELECT c.conv_id, c.val_cents, t.event_type,
                    cast(floor(exp(-((c.conv_us - t.touch_us)
                                     / 86400000000.0)) * 1000 + 0.5)
                         AS BIGINT) AS w_mil
             FROM conv c JOIN touch t ON c.user_id = t.user_id
             WHERE t.touch_us <= c.conv_us
               AND c.conv_us - t.touch_us < 604800000000),
    tot AS (SELECT conv_id, sum(w_mil) AS tw FROM pair GROUP BY conv_id)
    SELECT p.event_type,
           cast(count(*) AS BIGINT) AS n_touches,
           cast(count(DISTINCT p.conv_id) AS BIGINT) AS n_conversions,
           cast(sum(p.w_mil) AS BIGINT) AS weight_mil,
           cast(sum((p.val_cents * p.w_mil) // t.tw) AS BIGINT)
             AS credit_cents
    FROM pair p JOIN tot t USING (conv_id)
    GROUP BY p.event_type
    """,
    doc="Multi-touch attribution with exponential time decay (tau = 1 "
    "day, 7-day lookback): every purchase distributes its value over "
    "the user's preceding click/view touches, weighted exp(-age). The "
    "touch-conversion pairing is an equi-join ON USER (the range "
    "predicate is a post-join filter, so Catalyst runs a hash join — "
    "no range-explosion nested loop), and per-user fan-out is bounded "
    "by the lookback window, so the pair table scales linearly. "
    "Weights quantize at 1e3 AFTER the exp (coarse enough that a "
    "libm-vs-JVM ulp cannot flip a boundary); credit split is then "
    "pure bigint arithmetic — val_cents*w // total_w — identical "
    "truncating division both engines.",
)
def q219_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        "user_id",
        F.unix_micros("ts").alias("conv_us"),
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("val_cents"),
    )
    touch = ev.filter(F.col("event_type").isin("click", "view")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("touch_us")
    )
    pair = (
        conv.join(touch, "user_id")
        .filter(
            (F.col("touch_us") <= F.col("conv_us"))
            & (F.col("conv_us") - F.col("touch_us") < 604800000000)
        )
        .select(
            "conv_id",
            "val_cents",
            "event_type",
            F.floor(
                F.exp(
                    -(
                        (F.col("conv_us") - F.col("touch_us"))
                        / F.lit(86400000000.0)
                    )
                )
                * 1000
                + 0.5
            )
            .cast("bigint")
            .alias("w_mil"),
        )
    )
    tot = pair.groupBy("conv_id").agg(F.sum("w_mil").alias("tw"))
    return (
        pair.join(tot, "conv_id")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.countDistinct("conv_id").cast("bigint").alias("n_conversions"),
            F.sum("w_mil").cast("bigint").alias("weight_mil"),
            F.sum(
                F.expr("(val_cents * w_mil) div tw")
            )
            .cast("bigint")
            .alias("credit_cents"),
        )
    )


# floor(log10(1 + 1/d) * 1e9 + 0.5) for d = 1..9 — universal constants
# (Benford's law), hardcoded so no runtime log10 crosses the engines.
_BENFORD_PPB = {
    1: 301029996,
    2: 176091259,
    3: 124938737,
    4: 96910013,
    5: 79181246,
    6: 66946790,
    7: 57991947,
    8: 51152522,
    9: 45757491,
}


@query(
    "q220_benford_digits",
    """
    WITH v AS (SELECT cast(floor(value * 100 + 0.5) AS BIGINT) AS cents
               FROM events WHERE value > 0),
    d AS (SELECT cast(substr(cast(cents AS VARCHAR), 1, 1) AS INT) AS digit
          FROM v WHERE cents >= 1),
    o AS (SELECT digit, count(*) AS obs FROM d GROUP BY digit),
    n AS (SELECT sum(obs) AS total FROM o),
    bl AS (SELECT * FROM (VALUES (1, 301029996), (2, 176091259),
                                 (3, 124938737), (4, 96910013),
                                 (5, 79181246), (6, 66946790),
                                 (7, 57991947), (8, 51152522),
                                 (9, 45757491)) AS t(digit, ppb)),
    s AS (SELECT bl.digit, coalesce(o.obs, 0) AS obs, n.total, bl.ppb
          FROM bl LEFT JOIN o USING (digit) CROSS JOIN n)
    SELECT cast(digit AS INT) AS digit,
           cast(obs AS BIGINT) AS obs,
           cast((ppb * total) // 1000000 AS BIGINT) AS expected_milli,
           cast(((obs * 1000 - (ppb * total) // 1000000)
                 * (obs * 1000 - (ppb * total) // 1000000))
                // ((ppb * total) // 1000000) AS BIGINT) AS chi2_contrib_q
    FROM s
    """,
    doc="Benford first-digit audit of the value column — the classic "
    "fabricated-data / unit-mismatch detector a data-quality suite "
    "runs on every numeric feed. Digit extraction happens in the "
    "exact integer domain (cents -> leading char of the decimal "
    "string), never via log10 on doubles, and the nine Benford "
    "expected proportions are hardcoded parts-per-billion constants, "
    "so the whole query — counts, expected counts, chi-square "
    "contributions — is bigint arithmetic with identical truncating "
    "division in both engines. One hash aggregate over 9 groups; the "
    "digit spine is a 9-row broadcast. Integer headroom: ppb*total "
    "caps at ~3e10 rows; past that, pre-scale total (ppb*(total div "
    "1e3) div 1e3) at a bounded 1e-3 relative error.",
)
def q220_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("value") > 0)
        .select(
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents")
        )
        .filter(F.col("cents") >= 1)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).alias("obs"))
    total = obs.agg(F.sum("obs").alias("total"))
    bl = spark.createDataFrame(
        [(k, v) for k, v in sorted(_BENFORD_PPB.items())], "digit int, ppb long"
    )
    s = (
        bl.join(F.broadcast(obs), "digit", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("obs", F.lit(0)).alias("obs"),
            "total",
            "ppb",
        )
    )
    exp_milli = F.expr("(ppb * total) div 1000000")
    return s.select(
        F.col("digit").cast("int").alias("digit"),
        F.col("obs").cast("bigint").alias("obs"),
        exp_milli.cast("bigint").alias("expected_milli"),
        F.expr(
            "((obs * 1000 - (ppb * total) div 1000000)"
            " * (obs * 1000 - (ppb * total) div 1000000))"
            " div ((ppb * total) div 1000000)"
        )
        .cast("bigint")
        .alias("chi2_contrib_q"),
    )


@query(
    "q221_grouped_frequent",
    """
    WITH c AS (SELECT event_type, user_id, count(*) AS cnt
               FROM events GROUP BY 1, 2),
    t AS (SELECT event_type, sum(cnt) AS total FROM c GROUP BY 1)
    SELECT c.event_type, c.user_id,
           cast(c.cnt AS BIGINT) AS cnt,
           cast((c.cnt * 10000) // t.total AS BIGINT) AS support_bp
    FROM c JOIN t USING (event_type)
    WHERE c.cnt * 200 >= t.total
    """,
    doc="Per-group frequent-items: within each event type, the users "
    "holding >= 0.5% of that type's traffic, with exact support in "
    "basis points. The grouped complement of q125's global heavy "
    "hitters: two map-side-combinable hash aggregates (per-key "
    "counts, then per-group totals) and one broadcast join on the "
    "|groups|-row totals table — no window, no sort, no per-group "
    "state that grows with users. At 100x the per-key count table is "
    "the only shuffle and it is already the minimal sufficient "
    "statistic; a Misra-Gries pre-pass (q125/q172 machinery) slots in "
    "front unchanged if the key domain ever outgrows the aggregate.",
)
def q221_grouped_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    t = c.groupBy("event_type").agg(F.sum("cnt").alias("total"))
    return (
        c.join(F.broadcast(t), "event_type")
        .filter(F.col("cnt") * 200 >= F.col("total"))
        .select(
            "event_type",
            "user_id",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("(cnt * 10000) div total").cast("bigint").alias(
                "support_bp"
            ),
        )
    )


@query(
    "q222_adamic_adar",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
                FROM lineitem),
    deg AS (SELECT part, count(*) AS n_supp FROM ps GROUP BY part),
    el AS (SELECT ps.part, ps.supp, deg.n_supp
           FROM ps JOIN deg USING (part)
           WHERE deg.n_supp BETWEEN 2 AND 32),
    pr AS (SELECT a.supp AS s1, b.supp AS s2,
                  cast(floor(1000000.0 / ln(a.n_supp) + 0.5) AS BIGINT)
                    AS w_q
           FROM el a JOIN el b ON a.part = b.part AND a.supp < b.supp)
    SELECT s1, s2,
           cast(count(*) AS BIGINT) AS n_shared,
           cast(sum(w_q) AS BIGINT) AS aa_q
    FROM pr GROUP BY s1, s2
    ORDER BY aa_q DESC, s1, s2 LIMIT 100
    """,
    doc="Adamic-Adar link prediction over the co-supply graph: supplier "
    "pairs scored by sum over shared parts of 1/ln(part degree) — the "
    "standard common-neighbor score for entity-linkage and "
    "recommendation candidates. Super-connector parts (degree > 32) "
    "are excluded by the standard AA blocking gate, so per-part pair "
    "fan-out is bounded at C(32,2) regardless of corpus size and the "
    "self-join never explodes; the score quantizes per term (1e6 / "
    "ln(degree) of an integer degree — 31 possible constants, ulp-"
    "safe) and sums in bigint. Top-100 via TakeOrderedAndProject on "
    "the unique (score, s1, s2) key — a bounded per-partition top-k "
    "plus one driver merge, not a global sort.",
)
def q222_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    deg = ps.groupBy("part").agg(F.count(F.lit(1)).alias("n_supp"))
    # Materialize the degree-gated edge list once: both sides of the
    # pair self-join read it, and without the checkpoint the
    # lineitem-distinct + degree join recomputes per side (~20% of
    # wall time at sf0.1). Executor-local blocks, O(edges) size.
    el = (
        ps.join(deg, "part")
        .filter(F.col("n_supp").between(2, 32))
        .localCheckpoint(eager=False)
    )
    a = el.select("part", F.col("supp").alias("s1"), "n_supp")
    b = el.select("part", F.col("supp").alias("s2"))
    pr = (
        a.join(b, "part")
        .filter(F.col("s1") < F.col("s2"))
        .select(
            "s1",
            "s2",
            F.floor(F.lit(1000000.0) / F.log(F.col("n_supp")) + 0.5)
            .cast("bigint")
            .alias("w_q"),
        )
    )
    return (
        pr.groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared"),
            F.sum("w_q").cast("bigint").alias("aa_q"),
        )
        .orderBy(F.col("aa_q").desc(), "s1", "s2")
        .limit(100)
    )


@query(
    "q223_rolling_autocorr",
    """
    WITH b AS (SELECT user_id, ts, event_id,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS x
               FROM events),
    l AS (SELECT user_id, ts, event_id, x,
                 lag(x) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS y
          FROM b),
    w AS (SELECT user_id, ts, event_id, x, y,
                 count(y)   OVER win AS n,
                 sum(x)     OVER win AS sx,
                 sum(y)     OVER win AS sy,
                 sum(x * y) OVER win AS sxy,
                 sum(x * x) OVER win AS sxx,
                 sum(y * y) OVER win AS syy
          FROM l WHERE y IS NOT NULL
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
    SELECT user_id, event_id,
           cast(floor(
             cast((n * sxy - sx * sy) * 1000000 AS DOUBLE)
             / (sqrt(cast(n * sxx - sx * sx AS DOUBLE))
                * sqrt(cast(n * syy - sy * sy AS DOUBLE)))
             + 0.5) AS BIGINT) AS r_q
    FROM w
    WHERE n = 24
      AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Rolling lag-1 autocorrelation per user (trailing 24 events) — "
    "the drift detector that flags when a metric stream turns from "
    "noise into trend. Values live in the exact cent domain, so every "
    "windowed sum (x, y, xy, x2, y2) is bigint and the Pearson "
    "numerator/denominator components are exact integers; the only "
    "float ops are two sqrts and one division in identical order "
    "before a 1e6 quantize. All windows partition BY USER — bounded "
    "per-key state, no corpus-scale ordering anywhere. Integer "
    "headroom: the 24-row window keeps sums small, but the final "
    "numerator x1e6 caps near values of ~1e5 cents; for wider value "
    "domains quantize coarser (deci-cents) first.",
)
def q223_rolling_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("x"),
    )
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    l = b.select(
        "user_id", "ts", "event_id", "x", F.lag("x").over(wo).alias("y")
    ).filter(F.col("y").isNotNull())
    win = wo.rowsBetween(-23, 0)
    w = l.select(
        "user_id",
        "event_id",
        F.count("y").over(win).alias("n"),
        F.sum("x").over(win).alias("sx"),
        F.sum("y").over(win).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).alias("syy"),
    )
    return (
        w.filter(
            (F.col("n") == 24)
            & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select(
            "user_id",
            "event_id",
            F.floor(
                (
                    (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                    * 1000000
                ).cast("double")
                / (
                    F.sqrt(
                        (
                            F.col("n") * F.col("sxx")
                            - F.col("sx") * F.col("sx")
                        ).cast("double")
                    )
                    * F.sqrt(
                        (
                            F.col("n") * F.col("syy")
                            - F.col("sy") * F.col("sy")
                        ).cast("double")
                    )
                )
                + 0.5
            )
            .cast("bigint")
            .alias("r_q"),
        )
    )


@query(
    "q224_encoding_advisor",
    """
    WITH u AS (
      SELECT l_orderkey // 1024 AS shard, l_orderkey, l_linenumber,
             col, val, is_num
      FROM (
        SELECT l_orderkey, l_linenumber,
               'l_returnflag' AS col, l_returnflag AS val, 0 AS is_num
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_linestatus', l_linestatus, 0 FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_orderkey', cast(l_orderkey AS VARCHAR), 1 FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_partkey', cast(l_partkey AS VARCHAR), 1 FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_suppkey', cast(l_suppkey AS VARCHAR), 1 FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'l_quantity', cast(cast(floor(l_quantity) AS BIGINT)
                                  AS VARCHAR), 1 FROM lineitem)),
    lg AS (SELECT col, val, is_num,
                  lag(val) OVER (PARTITION BY col, shard
                                 ORDER BY l_orderkey, l_linenumber, val)
                    AS prev
           FROM u),
    m AS (SELECT col,
                 count(*) AS n,
                 count(DISTINCT val) AS ndv,
                 sum(CASE WHEN prev IS NULL OR val != prev
                          THEN 1 ELSE 0 END) AS runs,
                 sum(CASE WHEN prev IS NOT NULL THEN 1 ELSE 0 END) AS pairs,
                 sum(CASE WHEN is_num = 1 AND prev IS NOT NULL
                          AND cast(val AS BIGINT) >= cast(prev AS BIGINT)
                          THEN 1 ELSE 0 END) AS mono,
                 (sum(length(val)) * 100) // count(*) AS len_x100,
                 max(is_num) AS is_num
          FROM lg GROUP BY col)
    SELECT col, cast(n AS BIGINT) AS n, cast(ndv AS BIGINT) AS ndv,
           cast(runs AS BIGINT) AS runs,
           cast(len_x100 AS BIGINT) AS avg_len_x100,
           CASE WHEN ndv * 20 <= n THEN 'dict'
                WHEN runs * 5 <= n THEN 'rle'
                WHEN is_num = 1 AND mono * 100 >= pairs * 95 THEN 'delta'
                ELSE 'plain' END AS encoding
    FROM m
    """,
    doc="Storage-encoding advisor: per-column ndv / run-length / width "
    "/ monotonicity stats over the physical row order, folded into a "
    "dict-vs-RLE-vs-delta-vs-plain recommendation — the write-path "
    "decision the reference's fixed-width container layout never "
    "makes but a columnar warehouse must (cf. storage/layout.py "
    "zone-map stats). Columns unpivot into (col, val) rows in the "
    "STRING-OF-INTEGER domain (integer->string casts are identical "
    "across engines; no float or timestamp repr leaks in). Run "
    "detection needs adjacency, so the lag window partitions by "
    "(column, 1024-order shard): shards preserve generation-order "
    "locality, stay ~6k rows regardless of corpus size (lineitems "
    "per order is constant), and their count grows with the data — "
    "no global ordering. All decision thresholds are integer ratios.",
)
def q224_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    branches = [
        ("l_returnflag", F.col("l_returnflag"), 0),
        ("l_linestatus", F.col("l_linestatus"), 0),
        ("l_orderkey", F.col("l_orderkey").cast("string"), 1),
        ("l_partkey", F.col("l_partkey").cast("string"), 1),
        ("l_suppkey", F.col("l_suppkey").cast("string"), 1),
        (
            "l_quantity",
            F.expr("cast(cast(floor(l_quantity) as bigint) as string)"),
            1,
        ),
    ]
    u = li.select(
        F.expr("l_orderkey div 1024").alias("shard"),
        "l_orderkey",
        "l_linenumber",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col"),
                        expr.alias("val"),
                        F.lit(isn).alias("is_num"),
                    )
                    for name, expr, isn in branches
                ]
            )
        ).alias("cv"),
    ).select("shard", "l_orderkey", "l_linenumber", "cv.*")
    lg = u.select(
        "col",
        "val",
        "is_num",
        F.lag("val")
        .over(
            W.partitionBy("col", "shard").orderBy(
                "l_orderkey", "l_linenumber", "val"
            )
        )
        .alias("prev"),
    )
    m = lg.groupBy("col").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("val").alias("ndv"),
        F.sum(
            F.when(
                F.col("prev").isNull() | (F.col("val") != F.col("prev")), 1
            ).otherwise(0)
        ).alias("runs"),
        F.sum(F.when(F.col("prev").isNotNull(), 1).otherwise(0)).alias(
            "pairs"
        ),
        F.sum(
            F.when(
                (F.col("is_num") == 1)
                & F.col("prev").isNotNull()
                & (
                    F.col("val").cast("bigint")
                    >= F.col("prev").cast("bigint")
                ),
                1,
            ).otherwise(0)
        ).alias("mono"),
        F.expr("(sum(length(val)) * 100) div count(*)").alias(
            "len_x100"
        ),
        F.max("is_num").alias("is_num"),
    )
    return m.select(
        "col",
        F.col("n").cast("bigint").alias("n"),
        F.col("ndv").cast("bigint").alias("ndv"),
        F.col("runs").cast("bigint").alias("runs"),
        F.col("len_x100").cast("bigint").alias("avg_len_x100"),
        F.when(F.col("ndv") * 20 <= F.col("n"), "dict")
        .when(F.col("runs") * 5 <= F.col("n"), "rle")
        .when(
            (F.col("is_num") == 1)
            & (F.col("mono") * 100 >= F.col("pairs") * 95),
            "delta",
        )
        .otherwise("plain")
        .alias("encoding"),
    )


@query(
    "q225_percent_rank_dist",
    """
    WITH c AS (SELECT event_type,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS v,
                      count(*) AS cnt
               FROM events GROUP BY 1, 2),
    p AS (SELECT event_type, v, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS pre,
                 sum(cnt) OVER (PARTITION BY event_type) AS n
          FROM c)
    SELECT event_type, v, cast(cnt AS BIGINT) AS cnt,
           cast((pre * 1000000) // (n - 1) AS BIGINT) AS pr_ppm,
           cast(((pre + cnt) * 1000000) // n AS BIGINT) AS cd_ppm
    FROM p WHERE n > 1
    """,
    doc="Distributed exact percent_rank / cume_dist of every value "
    "within its event type, emitted per distinct value — the scale-"
    "safe spelling of the rank-normalization every feature pipeline "
    "wants but naively writes as a partition-less (or hot-keyed) "
    "ordered window. Here the CDF comes from operators/stats.py "
    "bucketed prefix sums (per-value hash agg -> metadata-sized "
    "bucket offsets -> within-bucket window PARTITIONED by bucket), "
    "so a 5-key × 100 TB table never funnels a key through one task. "
    "percent_rank = pre/(n-1), cume_dist = (pre+cnt)/n, both as exact "
    "integer ppm (truncating div matches across engines); the oracle "
    "spells the same arithmetic with DuckDB's plain windows.",
)
def q225_percent_rank_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    ev = _t(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v"),
        )
        .groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pre = with_prefix_sums(
        counts, 1000, ["cnt"], group_cols=["event_type"]
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    return (
        pre.join(F.broadcast(tot), "event_type")
        .filter(F.col("n") > 1)
        .select(
            "event_type",
            "v",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.expr("(pre_cnt * 1000000) div (n - 1)")
            .cast("bigint")
            .alias("pr_ppm"),
            F.expr("((pre_cnt + cnt) * 1000000) div n")
            .cast("bigint")
            .alias("cd_ppm"),
        )
    )


@query(
    "q226_asof_nearest",
    """
    WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t,
                      CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END
                        AS kind,
                      CASE WHEN event_type = 'purchase' THEN epoch_us(ts)
                      END AS pt,
                      CASE WHEN event_type = 'purchase' THEN event_id
                      END AS pid
               FROM events WHERE event_type IN ('click', 'purchase')),
    g AS (SELECT *,
                 count(pt) OVER (PARTITION BY user_id
                                 ORDER BY t, kind, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS gb,
                 count(pt) OVER (PARTITION BY user_id
                                 ORDER BY t DESC, kind ASC, event_id DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS gf
          FROM e),
    m AS (SELECT event_id, user_id, t, kind,
                 max(pt)  OVER (PARTITION BY user_id, gb) AS bpt,
                 max(pid) OVER (PARTITION BY user_id, gb) AS bpid,
                 max(pt)  OVER (PARTITION BY user_id, gf) AS fpt,
                 max(pid) OVER (PARTITION BY user_id, gf) AS fpid
          FROM g),
    d AS (SELECT event_id, user_id,
                 CASE WHEN bpt IS NOT NULL AND t - bpt < 86400000000
                      THEN t - bpt END AS bd,
                 bpid,
                 CASE WHEN fpt IS NOT NULL AND fpt - t < 86400000000
                      THEN fpt - t END AS fd,
                 fpid
          FROM m WHERE kind = 1)
    SELECT event_id, user_id,
           cast(CASE WHEN bd IS NOT NULL AND (fd IS NULL OR bd <= fd)
                     THEN bpid ELSE fpid END AS BIGINT) AS purchase_id,
           cast(CASE WHEN bd IS NOT NULL AND (fd IS NULL OR bd <= fd)
                     THEN -bd ELSE fd END AS BIGINT) AS dt_us
    FROM d WHERE bd IS NOT NULL OR fd IS NOT NULL
    """,
    doc="NEAREST as-of join with tolerance: each click matches the "
    "same user's closest purchase within ±24 h, either direction "
    "(backward q36 only looks left). Both directions come from ONE "
    "unioned per-user timeline: a running count of non-null purchase "
    "markers partitions the timeline into carry groups (the q218 LOCF "
    "trick — portable, no IGNORE NULLS dialect dependence), applied "
    "once ascending (last purchase at-or-before) and once descending "
    "(first purchase after); the winner is the smaller |dt|, ties to "
    "the backward match. Every window partitions by user (+ carry "
    "group) — bounded per-key state, no range-join explosion, no "
    "corpus-scale ordering.",
)
def q226_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_type") == "purchase", 0)
        .otherwise(1)
        .alias("kind"),
        F.when(
            F.col("event_type") == "purchase", F.unix_micros("ts")
        ).alias("pt"),
        F.when(F.col("event_type") == "purchase", F.col("event_id")).alias(
            "pid"
        ),
    )
    wb = (
        W.partitionBy("user_id")
        .orderBy("t", "kind", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(
            F.col("t").desc(), F.col("kind").asc(), F.col("event_id").desc()
        )
        .rowsBetween(W.unboundedPreceding, 0)
    )
    g = e.select(
        "*",
        F.count("pt").over(wb).alias("gb"),
        F.count("pt").over(wf).alias("gf"),
    )
    m = g.select(
        "event_id",
        "user_id",
        "t",
        "kind",
        F.max("pt").over(W.partitionBy("user_id", "gb")).alias("bpt"),
        F.max("pid").over(W.partitionBy("user_id", "gb")).alias("bpid"),
        F.max("pt").over(W.partitionBy("user_id", "gf")).alias("fpt"),
        F.max("pid").over(W.partitionBy("user_id", "gf")).alias("fpid"),
    )
    d = m.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.when(
            F.col("bpt").isNotNull()
            & (F.col("t") - F.col("bpt") < 86400000000),
            F.col("t") - F.col("bpt"),
        ).alias("bd"),
        "bpid",
        F.when(
            F.col("fpt").isNotNull()
            & (F.col("fpt") - F.col("t") < 86400000000),
            F.col("fpt") - F.col("t"),
        ).alias("fd"),
        "fpid",
    )
    back_wins = F.col("bd").isNotNull() & (
        F.col("fd").isNull() | (F.col("bd") <= F.col("fd"))
    )
    return d.filter(
        F.col("bd").isNotNull() | F.col("fd").isNotNull()
    ).select(
        "event_id",
        "user_id",
        F.when(back_wins, F.col("bpid"))
        .otherwise(F.col("fpid"))
        .cast("bigint")
        .alias("purchase_id"),
        F.when(back_wins, -F.col("bd"))
        .otherwise(F.col("fd"))
        .cast("bigint")
        .alias("dt_us"),
    )


@query(
    "q227_mi_feature_rank",
    """
    WITH f AS (
      SELECT feature, bucket, event_type FROM (
        SELECT 'hour' AS feature, cast(hour(ts) AS BIGINT) AS bucket,
               event_type FROM events
        UNION ALL
        SELECT 'user16', user_id % 16, event_type FROM events
        UNION ALL
        SELECT 'vbin', cast(floor(value * 100 + 0.5) AS BIGINT) // 5000,
               event_type FROM events)),
    cxy AS (SELECT feature, bucket, event_type, count(*) AS c
            FROM f GROUP BY 1, 2, 3),
    cx AS (SELECT feature, bucket, sum(c) AS cb FROM cxy GROUP BY 1, 2),
    cy AS (SELECT feature, event_type, sum(c) AS ce FROM cxy GROUP BY 1, 2),
    n AS (SELECT feature, sum(c) AS nt FROM cxy GROUP BY 1),
    t AS (SELECT cxy.feature, cxy.c,
                 cast(floor(ln(cast(cxy.c AS DOUBLE) * cast(n.nt AS DOUBLE)
                               / (cast(cx.cb AS DOUBLE)
                                  * cast(cy.ce AS DOUBLE))) * 1000000 + 0.5)
                      AS BIGINT) AS lr_q,
                 n.nt
          FROM cxy JOIN cx USING (feature, bucket)
                   JOIN cy USING (feature, event_type)
                   JOIN n USING (feature))
    SELECT feature,
           cast(count(*) AS BIGINT) AS n_cells,
           cast(sum(c * lr_q) // max(nt) AS BIGINT) AS mi_ppm
    FROM t GROUP BY feature
    """,
    doc="Mutual-information feature ranking: MI(feature; event_type) "
    "for three candidate features (hour-of-day, user shard, value "
    "bin) — the model-free relevance screen a feature store runs "
    "before training. Features unpivot via explode into (feature, "
    "bucket, class) cells; MI = sum over cells of (c/N)·ln(cN/"
    "(c_b·c_c)) computes from four hash aggregates of the SAME cell "
    "table (cells, row margins, class margins, total) joined back "
    "broadcast — margins are metadata-sized. The log ratio quantizes "
    "per cell BEFORE the weighted sum, so the reduction is pure "
    "bigint (order-free, engine-portable); only ~50 log calls total.",
)
def q227_mi_feature_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hour").alias("feature"),
                    F.hour("ts").cast("bigint").alias("bucket"),
                ),
                F.struct(
                    F.lit("user16").alias("feature"),
                    (F.col("user_id") % 16).cast("bigint").alias("bucket"),
                ),
                F.struct(
                    F.lit("vbin").alias("feature"),
                    F.expr(
                        "cast(floor(value * 100 + 0.5) as bigint) div 5000"
                    ).alias("bucket"),
                ),
            )
        ).alias("fb"),
        "event_type",
    ).select("fb.feature", "fb.bucket", "event_type")
    cxy = f.groupBy("feature", "bucket", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    cx = cxy.groupBy("feature", "bucket").agg(F.sum("c").alias("cb"))
    cy = cxy.groupBy("feature", "event_type").agg(F.sum("c").alias("ce"))
    n = cxy.groupBy("feature").agg(F.sum("c").alias("nt"))
    t = (
        cxy.join(F.broadcast(cx), ["feature", "bucket"])
        .join(F.broadcast(cy), ["feature", "event_type"])
        .join(F.broadcast(n), "feature")
        .select(
            "feature",
            "c",
            "nt",
            F.floor(
                F.log(
                    F.col("c").cast("double")
                    * F.col("nt").cast("double")
                    / (F.col("cb").cast("double") * F.col("ce").cast("double"))
                )
                * 1000000
                + 0.5
            )
            .cast("bigint")
            .alias("lr_q"),
        )
    )
    return t.groupBy("feature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.expr("cast(sum(c * lr_q) div max(nt) as bigint)").alias("mi_ppm"),
    )


def _q228_oracle() -> str:
    return f"""
    WITH qual AS ({_q47_oracle()}),
    v AS (SELECT (('0x' || substr(md5(cast(d.doc_id AS VARCHAR)), 1, 8))
                    ::BIGINT) % 5 AS fold,
                 CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS g,
                 cast(floor(q.quality * 1e6 + 0.5) AS BIGINT) AS vc
          FROM qual q JOIN documents d USING (doc_id)),
    c AS (SELECT fold, vc, cast(sum(g) AS BIGINT) AS n1,
                 cast(sum(1 - g) AS BIGINT) AS n2
          FROM v GROUP BY fold, vc),
    t AS (SELECT fold, cast(sum(n1) AS BIGINT) AS N1,
                 cast(sum(n2) AS BIGINT) AS N2 FROM c GROUP BY fold),
    cum AS (SELECT fold, vc, n1, n2,
                   cast(coalesce(sum(n1 + n2) OVER (PARTITION BY fold
                        ORDER BY vc ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING), 0) AS BIGINT) AS pre
            FROM c),
    agg AS (SELECT fold,
                   cast(sum(n1 * (2 * pre + n1 + n2 + 1)) AS BIGINT) AS r1x2
            FROM cum GROUP BY fold),
    s AS (SELECT t.fold, N1, N2, r1x2 - N1 * (N1 + 1) AS u1x2
          FROM agg JOIN t USING (fold)),
    a AS (SELECT fold, N1, N2,
                 u1x2::DOUBLE / (2.0 * N1::DOUBLE * N2::DOUBLE) AS auc
          FROM s)
    SELECT cast(fold AS BIGINT) AS fold, N1 AS n_pos, N2 AS n_neg,
           cast(floor(auc * 1e6 + 0.5) AS BIGINT) AS auc_q
    FROM a
    """


@query(
    "q228_kfold_auc",
    None,  # oracle composed below (reuses the q47 quality CTE)
    doc="Per-fold ROC-AUC under a deterministic 5-fold split — the "
    "cross-validated variant of q199 that turns one headline AUC into "
    "a variance estimate (is the scorer stable, or did one lucky "
    "shard carry it?). Fold assignment is the portable md5 hash "
    "family on doc_id (retry/speculation-safe, identical in both "
    "engines); all five folds compute in ONE grouped pass — per-"
    "(fold, score) counts, the operators/stats.py bucketed prefix "
    "sums with group_cols=[fold], and the midrank Mann-Whitney "
    "identity per fold as pure bigint — no driver-side loop over "
    "folds, no per-fold job, no partition-less window.",
)
def q228_kfold_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums
    from tytodb_spark.operators.textual import quality_score

    docs = _t(spark, sf_dir, "documents")
    v = docs.select(
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % 5
        ).alias("fold"),
        (F.col("lang") == "en").cast("bigint").alias("g"),
        F.floor(quality_score(F.col("text")) * 1e6 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    c = v.groupBy("fold", "v").agg(
        F.sum("g").cast("bigint").alias("n1"),
        F.sum(F.lit(1) - F.col("g")).cast("bigint").alias("n2"),
    )
    pre = with_prefix_sums(c, 10_000, ["n1", "n2"], group_cols=["fold"])
    t = F.col("n1") + F.col("n2")
    agg = (
        pre.select(
            "fold",
            "n1",
            "n2",
            (
                F.col("n1")
                * (2 * (F.col("pre_n1") + F.col("pre_n2")) + t + 1)
            ).alias("__r1x2"),
        )
        .groupBy("fold")
        .agg(
            F.sum("n1").cast("bigint").alias("t1"),
            F.sum("n2").cast("bigint").alias("t2"),
            F.sum("__r1x2").cast("bigint").alias("R1x2"),
        )
    )
    u1x2 = F.col("R1x2") - F.col("t1") * (F.col("t1") + 1)
    auc = u1x2.cast("double") / (
        F.lit(2.0) * F.col("t1").cast("double") * F.col("t2").cast("double")
    )
    return agg.select(
        F.col("fold").cast("bigint").alias("fold"),
        F.col("t1").alias("n_pos"),
        F.col("t2").alias("n_neg"),
        F.floor(auc * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("auc_q"),
    )


REGISTRY["q228_kfold_auc"] = QueryDef(
    fn=REGISTRY["q228_kfold_auc"].fn,
    oracle=_q228_oracle(),
    doc=REGISTRY["q228_kfold_auc"].doc,
)


@query(
    "q229_watermark_late_audit",
    """
    WITH e AS (SELECT epoch_us(ts) AS t,
                      (epoch_us(ts)
                       + (('0x' || substr(md5(cast(event_id AS VARCHAR)),
                                          1, 8))::BIGINT % 7200) * 1000000)
                        // 5400000000 AS batch
               FROM events),
    b AS (SELECT batch, max(t) AS mx, count(*) AS n FROM e GROUP BY batch),
    w AS (SELECT batch, n,
                 max(mx) OVER (ORDER BY batch
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) - 3600000000 AS wm
          FROM b),
    l AS (SELECT e.batch, count(*) AS n_late
          FROM e JOIN w USING (batch) WHERE e.t < w.wm GROUP BY e.batch)
    SELECT cast(w.batch AS BIGINT) AS batch,
           cast(w.n AS BIGINT) AS n_events,
           cast(coalesce(l.n_late, 0) AS BIGINT) AS n_late,
           cast(coalesce(w.wm, -1) AS BIGINT) AS watermark_us
    FROM w LEFT JOIN l USING (batch)
    """,
    doc="Watermark late-data audit: replay the stream under Structured "
    "Streaming's watermark rule and count exactly the rows "
    "withWatermark('ts', '1 hour') would drop — the sizing study a "
    "streaming deployment runs BEFORE picking the allowed lateness. "
    "Arrival is simulated deterministically (event time plus an md5-"
    "keyed 0-2 h network jitter, the portable hash family, so both "
    "engines and any retry see the same replay), batched into 90-min "
    "arrival windows; the watermark before batch k is max EVENT time "
    "over batches < k minus the delay, and a row is late iff its "
    "event time falls below it. The only ordered window runs over the "
    "PER-BATCH table — one row per micro-batch, metadata-sized by "
    "construction (same regime as the stats.py bucket offsets); the "
    "per-event late test is a broadcast join back onto the batch key.",
)
def q229_watermark_late_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        F.unix_micros("ts").alias("t"),
        F.expr(
            "(unix_micros(ts)"
            " + (conv(substr(md5(cast(event_id as string)), 1, 8), 16, 10)"
            "    % 7200) * 1000000) div 5400000000"
        ).alias("batch"),
    )
    b = e.groupBy("batch").agg(
        F.max("t").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    w = b.select(
        "batch",
        "n",
        (
            F.max("mx").over(
                W.orderBy("batch").rowsBetween(W.unboundedPreceding, -1)
            )
            - 3600000000
        ).alias("wm"),
    )
    l = (
        e.join(F.broadcast(w.select("batch", "wm")), "batch")
        .filter(F.col("t") < F.col("wm"))
        .groupBy("batch")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )
    return w.join(l, "batch", "left").select(
        F.col("batch").cast("bigint").alias("batch"),
        F.col("n").cast("bigint").alias("n_events"),
        F.coalesce("n_late", F.lit(0)).cast("bigint").alias("n_late"),
        F.coalesce("wm", F.lit(-1)).cast("bigint").alias("watermark_us"),
    )


@query(
    "q230_jsonl_corrupt_census",
    """
    WITH g AS (SELECT CASE WHEN event_id % 37 = 0 THEN 1 ELSE 0 END
                 AS corrupt,
                      event_type, value
               FROM events)
    SELECT cast(sum(corrupt) AS BIGINT) AS n_corrupt,
           cast(sum(1 - corrupt) AS BIGINT) AS n_good,
           cast(count(DISTINCT CASE WHEN corrupt = 0 THEN event_type END)
                AS BIGINT) AS n_types,
           cast(cast(sum(CASE WHEN corrupt = 0
                              THEN cast(value AS DECIMAL(18,2)) END)
                     AS DECIMAL(18,2)) AS DOUBLE) AS good_value
    FROM g
    """,
    doc="Corrupt-record quarantine on a JSONL feed: events round-trip "
    "through line-delimited JSON with a deterministic fraction of "
    "lines truncated mid-object (event_id % 37 — the malformed lines "
    "every real ingest sees), then read back with an EXPLICIT schema "
    "in PERMISSIVE mode with columnNameOfCorruptRecord, so bad lines "
    "land in the quarantine column instead of failing the job or "
    "silently vanishing. Emits the ingest census: corrupt count, good "
    "count, surviving type cardinality, and the DECIMAL-stable value "
    "sum of good rows. The oracle computes the same census from the "
    "parquet truth — asserting the quarantine caught EXACTLY the "
    "corrupted lines and the good rows survived byte-exact. Schema-"
    "on-read with no inference pass; one scan, one aggregate.",
)
def q230_jsonl_corrupt_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="tyto_jsonl_")
    line = F.to_json(
        F.struct("event_id", "user_id", "event_type", "value")
    )
    ev.select(
        F.when(F.col("event_id") % 37 == 0, F.substring(line, 1, 10))
        .otherwise(line)
        .alias("value")
    ).write.mode("overwrite").text(tmp)
    schema = (
        "event_id long, user_id long, event_type string, value double, "
        "_corrupt string"
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(tmp)
    )
    return back.agg(
        F.sum(F.col("_corrupt").isNotNull().cast("int"))
        .cast("bigint")
        .alias("n_corrupt"),
        F.sum(F.col("_corrupt").isNull().cast("int"))
        .cast("bigint")
        .alias("n_good"),
        F.countDistinct(
            F.when(F.col("_corrupt").isNull(), F.col("event_type"))
        )
        .cast("bigint")
        .alias("n_types"),
        F.sum(
            F.when(
                F.col("_corrupt").isNull(),
                F.col("value").cast("decimal(18,2)"),
            )
        )
        .cast("decimal(18,2)")
        .cast("double")
        .alias("good_value"),
    )


@query(
    "q231_event_path_trigrams",
    """
    WITH t AS (SELECT user_id, event_type AS e1,
                      lead(event_type, 1) OVER w AS e2,
                      lead(event_type, 2) OVER w AS e3
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1, e2, e3, cast(count(*) AS BIGINT) AS n
    FROM t WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3 LIMIT 25
    """,
    doc="Behavioral path mining: the 25 most common length-3 event "
    "sequences across user journeys — the path-level complement of "
    "q186's first-order Markov matrix (a trigram census distinguishes "
    "view->click->purchase from click->view->purchase, which no "
    "bigram model can). Two leads over each USER's own timeline "
    "(unique (ts, event_id) order, bounded per-key partitions), one "
    "hash aggregate over the |types|^3 path space, distributed top-k "
    "on the unique (n, path) key. No corpus-scale ordering.",
)
def q231_event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        t.filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(25)
    )


@query(
    "q232_anova_f",
    """
    WITH x AS (SELECT event_type,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events),
    g AS (SELECT event_type, count(*) AS n, sum(v) AS s,
                 sum(v * v) AS q
          FROM x GROUP BY event_type),
    t AS (SELECT count(*) AS k, sum(n) AS nn, sum(s) AS ss,
                 sum(q) AS qq,
                 sum(cast(floor(cast(s AS DOUBLE) * cast(s AS DOUBLE)
                                / n * 1000 + 0.5) AS BIGINT)) AS a
          FROM g),
    d AS (SELECT k, nn, qq, a,
                 a - cast(floor(cast(ss AS DOUBLE) * cast(ss AS DOUBLE)
                                / nn * 1000 + 0.5) AS BIGINT) AS ssb_x1000,
                 qq * 1000 - a AS ssw_x1000
          FROM t)
    SELECT cast(k AS BIGINT) AS n_groups, cast(nn AS BIGINT) AS n,
           cast(ssb_x1000 AS BIGINT) AS ssb_x1000,
           cast(ssw_x1000 AS BIGINT) AS ssw_x1000,
           cast(floor(cast(ssb_x1000 AS DOUBLE) * (nn - k)
                      / (cast(ssw_x1000 AS DOUBLE) * (k - 1)) * 1000
                      + 0.5) AS BIGINT) AS f_milli
    FROM d
    """,
    doc="One-way ANOVA F statistic: does mean value differ across "
    "event types? (The k-group generalization of q162's two-sample z "
    "test.) Sufficient statistics (n, sum, sum-of-squares per group) "
    "come from ONE map-side-combinable hash aggregate; between/within "
    "sums of squares quantize PER GROUP (floor(s^2/n * 1000) on "
    "exact-integer inputs squared in the double domain — bigint s*s "
    "would overflow at corpus scale, and bigint->double casts + IEEE "
    "division are identical across engines) and reduce as bigint, so "
    "no float accumulation order exists anywhere. Output is the full "
    "decomposition plus F in milli-units. Integer headroom: the exact "
    "sum-of-squares accumulator caps near 1.6e9 rows at cent "
    "precision; past that, quantize to deci-cents or keep per-shard "
    "partial sums (the decomposition is mergeable).",
)
def q232_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("v"),
    )
    g = x.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("ss"),
        F.sum("q").alias("qq"),
        F.sum(
            F.expr(
                "cast(floor(cast(s as double) * cast(s as double)"
                " / n * 1000 + 0.5) as bigint)"
            )
        ).alias("a"),
    )
    d = t.select(
        "k",
        "nn",
        "qq",
        "a",
        (
            F.col("a")
            - F.expr(
                "cast(floor(cast(ss as double) * cast(ss as double)"
                " / nn * 1000 + 0.5) as bigint)"
            )
        ).alias("ssb_x1000"),
        (F.col("qq") * 1000 - F.col("a")).alias("ssw_x1000"),
    )
    return d.select(
        F.col("k").cast("bigint").alias("n_groups"),
        F.col("nn").cast("bigint").alias("n"),
        F.col("ssb_x1000").cast("bigint").alias("ssb_x1000"),
        F.col("ssw_x1000").cast("bigint").alias("ssw_x1000"),
        F.expr(
            "cast(floor(cast(ssb_x1000 as double) * (nn - k)"
            " / (cast(ssw_x1000 as double) * (k - 1)) * 1000"
            " + 0.5) as bigint)"
        ).alias("f_milli"),
    )


@query(
    "q233_gini_concentration",
    """
    WITH u AS (SELECT user_id,
                      sum(cast(floor(value * 100 + 0.5) AS BIGINT)) AS v
               FROM events WHERE event_type = 'purchase'
               GROUP BY user_id),
    c AS (SELECT v, count(*) AS cnt FROM u GROUP BY v),
    p AS (SELECT v, cnt,
                 coalesce(sum(cnt) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS pre
          FROM c),
    a AS (SELECT sum(cnt) AS n, sum(v * cnt) AS t,
                 sum(v * (cnt * pre + (cnt * (cnt + 1)) // 2)) AS r
          FROM p)
    SELECT cast(n AS BIGINT) AS n_users,
           cast(t AS BIGINT) AS total_cents,
           cast(floor((2 * cast(r AS DOUBLE) - (n + 1) * cast(t AS DOUBLE))
                      * 1000000 / (cast(n AS DOUBLE) * cast(t AS DOUBLE))
                      + 0.5) AS BIGINT) AS gini_ppm
    FROM a
    """,
    doc="Gini concentration of purchase value across users — the "
    "inequality audit run on any usage/revenue/token-count "
    "distribution before capacity planning (and on per-domain token "
    "shares before corpus mixing). The rank-weighted sum handles ties "
    "exactly from the per-distinct-value count table: sum of ranks at "
    "value v = cnt*pre + cnt(cnt+1)/2 — pure bigint from the same "
    "bucketed-CDF machinery as q225 (the Spark side uses "
    "with_prefix_sums; the oracle spells the identical arithmetic "
    "with a plain window over the tiny distinct-value table). One "
    "final float division, quantized to ppm. Integer headroom: the "
    "rank-weighted sum R <= n*T caps near ~1e7 users at these value "
    "magnitudes; past that, coarsen the value grid (Gini is scale-"
    "free) — the count-table shape itself is unbounded.",
)
def q233_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    ev = _t(spark, sf_dir, "events")
    u = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
        )
        .groupBy("user_id")
        .agg(F.sum("vc").alias("v"))
    )
    c = u.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    p = with_prefix_sums(c, 100_000, ["cnt"])
    a = p.agg(
        F.sum("cnt").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).alias("t"),
        F.sum(
            F.col("v")
            * (
                F.col("cnt") * F.col("pre_cnt")
                + F.expr("(cnt * (cnt + 1)) div 2")
            )
        ).alias("r"),
    )
    return a.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("t").cast("bigint").alias("total_cents"),
        F.expr(
            "cast(floor((2 * cast(r as double) - (n + 1) * cast(t as double))"
            " * 1000000 / (cast(n as double) * cast(t as double))"
            " + 0.5) as bigint)"
        ).alias("gini_ppm"),
    )


# 64 multiply-mod universal-hash seeds for q234: (i, a, b) with
# h_i(g) = (a * (md5_48(g) %% P) + b) %% P, P = 2^31 - 1. Hardcoded so
# both engines evaluate ONE md5 per shingle and derive the 64 MinHash
# lanes with integer arithmetic (the 64-md5 spelling measured 10.5 s at
# sf0.1; this one ~2 s).
_MH_P = 2147483647
_MH64 = [(0, 319907179, 1053692278), (1, 519121713, 1690591343), (2, 1613104210, 794218002), (3, 1020095000, 192563854), (4, 343638724, 392748967), (5, 1058387562, 1730078637), (6, 1725907542, 2032816443), (7, 1027514586, 752790051), (8, 776367694, 553510668), (9, 870821369, 1573942963), (10, 1418226030, 877930129), (11, 1724945804, 1622383610), (12, 198948735, 913880865), (13, 2109564269, 194404597), (14, 1723884711, 1444440933), (15, 1825495661, 1156916109), (16, 394610292, 784624971), (17, 730948251, 555019750), (18, 99070585, 2003081261), (19, 51645477, 60403662), (20, 531499247, 208154829), (21, 797497547, 1926466412), (22, 682614313, 1754663614), (23, 1820882650, 1424618661), (24, 1223382312, 2052162054), (25, 1388826810, 1092732509), (26, 190113436, 1066091919), (27, 1628868573, 30356761), (28, 1130323389, 876861493), (29, 722267319, 1048633625), (30, 1352147855, 1345843372), (31, 1094115176, 1034140379), (32, 237917503, 14338131), (33, 2032312923, 505256239), (34, 225112069, 1256109617), (35, 392353084, 698783131), (36, 2027141692, 680245729), (37, 1203967282, 1435705424), (38, 460888601, 2117256974), (39, 15556390, 914694619), (40, 1745732964, 1410058205), (41, 1438427454, 2051632276), (42, 1901513249, 418217971), (43, 398479192, 1481799001), (44, 632287095, 527080753), (45, 1184002918, 455418643), (46, 804526875, 2094252415), (47, 1096710158, 1435767242), (48, 1544579479, 983024650), (49, 1904362107, 2107932778), (50, 1864058974, 988857599), (51, 1825995889, 189101027), (52, 50808400, 1623337490), (53, 584329915, 1193571350), (54, 1239051059, 2006175524), (55, 64215290, 1015022438), (56, 193997044, 171392373), (57, 2010562452, 388357833), (58, 1518136330, 174487869), (59, 1378418732, 1036340379), (60, 1480008892, 1267287504), (61, 1122724574, 1332153730), (62, 1705953096, 1677987522), (63, 2073806094, 2068564822)]


def _q234_oracle() -> str:
    values = ",\n                 ".join(
        f"({i}, {a}, {b})" for i, a, b in _MH64
    )
    return f"""
    WITH g AS (SELECT DISTINCT source, g FROM (
                 SELECT source, unnest(list_distinct({_NGRAMS(3)})) AS g
                 FROM documents)),
    h0 AS (SELECT source,
                  ('0x' || substr(md5(g), 1, 12))::BIGINT % {_MH_P} AS h0
           FROM g),
    e AS (SELECT source, i, (a * h0 + b) % {_MH_P} AS h
          FROM h0 CROSS JOIN (VALUES {values}) AS t(i, a, b)),
    sig AS (SELECT source, i, min(h) AS h FROM e GROUP BY source, i),
    p AS (SELECT a.source AS s1, b.source AS s2,
                 sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS m
          FROM sig a JOIN sig b ON a.i = b.i AND a.source < b.source
          GROUP BY 1, 2)
    SELECT s1, s2, cast(m AS BIGINT) AS matches,
           cast((m * 1000000) // 64 AS BIGINT) AS jaccard_est_ppm
    FROM p
    """


@query(
    "q234_source_fingerprint_matrix",
    None,  # oracle composed below (embeds the 64 hardcoded seeds)
    doc="Corpus fingerprint matrix: pairwise MinHash-estimated trigram "
    "Jaccard between every pair of sources — the source-level overlap "
    "map a corpus team reads BEFORE scheduling document-level dedup "
    "(it prices which source pairs are worth a cross-source q108 run, "
    "from signatures that cost one scan). Each source compresses to a "
    "64-value signature; the hash family is ONE portable md5 per "
    "shingle folded through 64 hardcoded multiply-mod lanes "
    "((a_i*h+b_i) mod 2^31-1 — identical bigint arithmetic in both "
    "engines, so the ESTIMATE itself is the oracle-checked output, "
    "unlike q42 where LSH internals stay engine-local). The lane "
    "fan-out is a codegen explode over integers, never 64 md5 calls "
    "per shingle (measured 5x cheaper at sf0.1); the pair stage joins "
    "|sources|x64 signature rows — metadata-sized however big the "
    "corpus.",
)
def q234_source_fingerprint_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from tytodb_spark.operators.textual import spread, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    g = (
        spread(docs.select("doc_id", "source", "text"), "doc_id")
        .select(
            "source",
            F.explode(
                F.array_distinct(word_ngrams(F.col("text"), 3))
            ).alias("g"),
        )
        .distinct()
    )
    h0 = g.select(
        "source",
        (
            F.conv(F.substring(F.md5("g"), 1, 12), 16, 10).cast("bigint")
            % _MH_P
        ).alias("h0"),
    )
    lanes = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.lit(a).alias("a"),
                F.lit(b).alias("b"),
            )
            for i, a, b in _MH64
        ]
    )
    e = h0.select(
        "source", "h0", F.explode(lanes).alias("l")
    ).select(
        "source",
        F.col("l.i").alias("i"),
        ((F.col("l.a") * F.col("h0") + F.col("l.b")) % _MH_P).alias("h"),
    )
    sig = e.groupBy("source", "i").agg(F.min("h").alias("h"))
    a = sig.select(
        F.col("source").alias("s1"), "i", F.col("h").alias("ha")
    )
    b = sig.select(
        F.col("source").alias("s2"), "i", F.col("h").alias("hb")
    )
    return (
        a.join(b, "i")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum((F.col("ha") == F.col("hb")).cast("int"))
            .cast("bigint")
            .alias("matches")
        )
        .select(
            "s1",
            "s2",
            "matches",
            F.expr("(matches * 1000000) div 64")
            .cast("bigint")
            .alias("jaccard_est_ppm"),
        )
    )


REGISTRY["q234_source_fingerprint_matrix"] = QueryDef(
    fn=REGISTRY["q234_source_fingerprint_matrix"].fn,
    oracle=_q234_oracle(),
    doc=REGISTRY["q234_source_fingerprint_matrix"].doc,
)


@query(
    "q235_wau_rolling",
    """
    WITH ud AS (SELECT DISTINCT user_id,
                       cast(date_trunc('day', ts) AS TIMESTAMP) AS day
                FROM events),
    uw AS (SELECT DISTINCT user_id, day + to_days(cast(o AS INT)) AS w
           FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS o)),
    span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ud)
    SELECT w AS day, cast(count(*) AS BIGINT) AS wau
    FROM (SELECT w, user_id FROM uw) u CROSS JOIN span
    WHERE w >= d0 AND w <= d1
    GROUP BY w
    """,
    doc="Rolling 7-day active users (WAU) per day, EXACT — the metric "
    "every dashboard wants and Spark (correctly) refuses to spell as "
    "COUNT(DISTINCT) OVER a sliding range (O(n^2) distinct-set "
    "state). The distributed-exact reshape: distinct (user, day) "
    "pairs, then each pair votes into the 7 windows that contain it "
    "(a 7x explode — constant fan-out), distinct again, and a plain "
    "count per window day. Two hash-dedup shuffles and one count — "
    "no window function at all, no per-day state; the day spine "
    "clamps to the observed span so output days all have full "
    "membership. Same shape scales to any window length w at wx "
    "fan-out, or to HLL partials (q167) when approximate is enough.",
)
def q235_wau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    uw = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("o"),
            "day",
        )
        .select(
            "user_id",
            F.expr("day + make_interval(0, 0, 0, o, 0, 0, 0)").alias("w"),
        )
        .distinct()
    )
    span = ud.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    return (
        uw.crossJoin(F.broadcast(span))
        .filter((F.col("w") >= F.col("d0")) & (F.col("w") <= F.col("d1")))
        .groupBy(F.col("w").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("wau"))
    )


@query(
    "q236_conversion_latency",
    """
    WITH f AS (SELECT user_id,
                      min(CASE WHEN event_type = 'view'
                               THEN epoch_us(ts) END) AS first_view,
                      min(CASE WHEN event_type = 'purchase'
                               THEN epoch_us(ts) END) AS first_buy
               FROM events GROUP BY user_id),
    lat AS (SELECT (first_buy - first_view) // 60000000 AS v
            FROM f
            WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
              AND first_buy >= first_view),
    c AS (SELECT v, cast(count(*) AS BIGINT) AS cnt FROM lat GROUP BY v),
    t AS (SELECT cast(sum(cnt) AS BIGINT) AS n FROM c),
    p AS (SELECT v, cnt,
                 cast(coalesce(sum(cnt) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS pre
          FROM c),
    j AS (SELECT p.v, p.cnt, p.pre, t.n FROM p CROSS JOIN t)
    SELECT n,
      cast(min(CASE WHEN pre < (n * 50 + 99) // 100
                     AND (n * 50 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p50_min,
      cast(min(CASE WHEN pre < (n * 90 + 99) // 100
                     AND (n * 90 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p90_min,
      cast(min(CASE WHEN pre < (n * 99 + 99) // 100
                     AND (n * 99 + 99) // 100 <= pre + cnt THEN v END)
           AS BIGINT) AS p99_min
    FROM j GROUP BY n
    """,
    doc="Conversion latency distribution: minutes from each user's "
    "first view to their first purchase, summarized as exact discrete "
    "p50/p90/p99 — the time-to-convert funnel metric (q82 counts WHO "
    "converts; this measures HOW LONG it takes). First-touch pair "
    "per user is one conditional-min hash aggregate (no window); the "
    "latency quantiles run on the |distinct minute| count table via "
    "the same bucketed-CDF machinery as q209 (with_prefix_sums — the "
    "ordered window in the ORACLE is over that tiny distinct-value "
    "table only). Integer minutes end-to-end; truncating division "
    "matches across engines.",
)
def q236_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    ev = _t(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.unix_micros("ts"))
        ).alias("first_view"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))
        ).alias("first_buy"),
    )
    lat = f.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select(
        F.expr("(first_buy - first_view) div 60000000").alias("v")
    )
    c = lat.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    p = with_prefix_sums(c, 1000, ["cnt"])
    t = c.agg(F.sum("cnt").cast("bigint").alias("n"))
    j = p.crossJoin(F.broadcast(t))
    qcol = []
    for name, pct in [("p50_min", 50), ("p90_min", 90), ("p99_min", 99)]:
        r = F.expr(f"(n * {pct} + 99) div 100")
        qcol.append(
            F.min(
                F.when(
                    (F.col("pre_cnt") < r)
                    & (r <= F.col("pre_cnt") + F.col("cnt")),
                    F.col("v"),
                )
            )
            .cast("bigint")
            .alias(name)
        )
    return j.groupBy("n").agg(*qcol)


@query(
    "q237_mix_entropy",
    """
    WITH c AS (SELECT lang, source, count(*) AS n
               FROM documents GROUP BY lang, source),
    t AS (SELECT lang, sum(n) AS nt FROM c GROUP BY lang),
    e AS (SELECT c.lang, c.n, t.nt,
                 cast(floor(ln(cast(t.nt AS DOUBLE) / cast(c.n AS DOUBLE))
                            * 1000000 + 0.5) AS BIGINT) AS li_q
          FROM c JOIN t USING (lang))
    SELECT lang,
           cast(count(*) AS BIGINT) AS n_sources,
           cast(max(nt) AS BIGINT) AS n_docs,
           cast(sum(n * li_q) // max(nt) AS BIGINT) AS entropy_u,
           cast(floor(exp(cast(sum(n * li_q) // max(nt) AS DOUBLE)
                          / 1000000.0) * 1000 + 0.5) AS BIGINT)
             AS effective_sources_milli
    FROM e GROUP BY lang
    """,
    doc="Corpus-mix entropy per language: Shannon entropy of the "
    "source distribution and its exponential (the 'effective number "
    "of sources') — the diversity gate a data-mixing recipe checks "
    "before training (a lang whose tokens come from 1.2 effective "
    "sources is a memorization risk however many sources nominally "
    "contribute). Per-cell surprisal ln(N/n) quantizes to integer "
    "micro-nats BEFORE the weighted reduction (order-free bigint sum "
    "— the q227 discipline), so the only cross-engine float ops are "
    "|cells| logs and one final exp on an already-quantized integer. "
    "Two hash aggregates and a broadcast totals join.",
)
def q237_mix_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    c = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    t = c.groupBy("lang").agg(F.sum("n").alias("nt"))
    e = c.join(F.broadcast(t), "lang").select(
        "lang",
        "n",
        "nt",
        F.floor(
            F.log(F.col("nt").cast("double") / F.col("n").cast("double"))
            * 1000000
            + 0.5
        )
        .cast("bigint")
        .alias("li_q"),
    )
    return e.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.max("nt").cast("bigint").alias("n_docs"),
        F.expr("cast(sum(n * li_q) div max(nt) as bigint)").alias(
            "entropy_u"
        ),
        F.expr(
            "cast(floor(exp(cast(sum(n * li_q) div max(nt) as double)"
            " / 1000000.0) * 1000 + 0.5) as bigint)"
        ).alias("effective_sources_milli"),
    )


@query(
    "q238_ngram_novelty",
    rf"""
    WITH sg AS (SELECT DISTINCT source, g FROM (
                  SELECT source, unnest(list_distinct({_NGRAMS(8)})) AS g
                  FROM documents)),
    df AS (SELECT g, count(*) AS ns FROM sg GROUP BY g),
    j AS (SELECT sg.source, df.ns FROM sg JOIN df USING (g))
    SELECT source,
           cast(count(*) AS BIGINT) AS n_grams,
           cast(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unique,
           cast((sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS novelty_ppm
    FROM j GROUP BY source
    """,
    doc="Per-source 8-gram novelty census: what fraction of each "
    "source's distinct 8-grams appears in NO other source — the "
    "uniqueness side of q234's overlap matrix, and the number a "
    "corpus team reads to decide whether a source adds new text or "
    "restates the pool (a near-zero novelty source is a dedup target, "
    "not a data source). Spark plan: distinct (source, gram) pairs "
    "materialize ONCE (executor-local blocks), then a per-gram "
    "aggregate carries ns AND max(source) — for ns=1 grams max() IS "
    "the owning source, so per-source unique counts come from a "
    "second small aggregate instead of joining the gram-keyed frame "
    "back against itself (the join spelling re-shuffled the full "
    "(source, gram) table twice and ran 2.6x slower at sf0.1; the "
    "oracle keeps the join spelling — same math, DuckDB's optimizer "
    "handles it). Every stage map-side combinable; the final "
    "per-source frame is |sources| rows.",
)
def q238_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    sg = (
        spread(docs.select("doc_id", "source", "text"), "doc_id")
        .select(
            "source",
            F.explode(
                F.array_distinct(word_ngrams(F.col("text"), 8))
            ).alias("g"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = sg.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    dfq = sg.groupBy("g").agg(
        F.count(F.lit(1)).alias("ns"), F.max("source").alias("only_src")
    )
    b = (
        dfq.filter(F.col("ns") == 1)
        .groupBy(F.col("only_src").alias("source"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_unique"))
    )
    return a.join(b, "source", "left").select(
        "source",
        "n_grams",
        F.coalesce("n_unique", F.lit(0)).cast("bigint").alias("n_unique"),
        F.expr("coalesce(n_unique, 0) * 1000000 div n_grams")
        .cast("bigint")
        .alias("novelty_ppm"),
    )


@query(
    "q239_silhouette",
    """
    WITH xq AS (SELECT vec_id, label, i AS dim,
                       cast(floor(cast(embedding[i] AS DOUBLE) * 1000000)
                            AS BIGINT) AS x
                FROM embeddings
                CROSS JOIN (SELECT unnest(range(1, 65)) AS i)),
    c AS (SELECT label AS clabel, dim,
                 cast(sum(x) // count(*) AS BIGINT) AS cq
          FROM xq GROUP BY label, dim),
    d2 AS (SELECT xq.vec_id, xq.label, c.clabel,
                  sum((xq.x - c.cq) * (xq.x - c.cq)) AS dd
           FROM xq JOIN c USING (dim)
           GROUP BY xq.vec_id, xq.label, c.clabel),
    ab AS (SELECT vec_id, label,
                  max(CASE WHEN clabel = label THEN dd END) AS a2,
                  min(CASE WHEN clabel <> label THEN dd END) AS b2
           FROM d2 GROUP BY vec_id, label),
    sil AS (SELECT label,
                   cast(floor((sqrt(cast(b2 AS DOUBLE))
                               - sqrt(cast(a2 AS DOUBLE)))
                              / greatest(sqrt(cast(a2 AS DOUBLE)),
                                         sqrt(cast(b2 AS DOUBLE)))
                              * 1000000 + 0.5) AS BIGINT) AS s_ppm
            FROM ab WHERE a2 > 0 OR b2 > 0)
    SELECT cast(label AS INT) AS label,
           cast(count(*) AS BIGINT) AS n,
           cast(sum(s_ppm) // count(*) AS BIGINT) AS mean_s_ppm
    FROM sil GROUP BY label
    """,
    doc="Simplified silhouette score per class over the embedding "
    "table: a = distance to the OWN label centroid, b = distance to "
    "the nearest other centroid, s = (b-a)/max(a,b) — the geometry "
    "audit that says whether the labels are actually separable in "
    "embedding space before anyone trains on them (centroid-based "
    "simplified silhouette, the O(n·k) form that scales where the "
    "O(n^2) pairwise definition cannot). Components quantize to the "
    "exact integer micro-unit domain first (float32 -> double "
    "widening is exact), so centroids (truncating mean) and squared "
    "distances are pure bigint; the only float ops are two sqrts and "
    "one division in fixed order. Centroids are |labels|x64 rows — "
    "broadcast; per-point work is a 64-way explode into codegen "
    "aggregates, never a vector UDF.",
)
def q239_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    xq = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("xf").cast("double") * 1000000)
        .cast("bigint")
        .alias("x"),
    )
    c = xq.groupBy(F.col("label").alias("clabel"), "dim").agg(
        F.expr("cast(sum(x) div count(*) as bigint)").alias("cq")
    )
    d2 = (
        xq.join(F.broadcast(c), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.sum(
                (F.col("x") - F.col("cq")) * (F.col("x") - F.col("cq"))
            ).alias("dd")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.max(F.when(F.col("clabel") == F.col("label"), F.col("dd"))).alias(
            "a2"
        ),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("dd"))).alias(
            "b2"
        ),
    )
    sil = ab.filter((F.col("a2") > 0) | (F.col("b2") > 0)).select(
        "label",
        F.expr(
            "cast(floor((sqrt(cast(b2 as double)) - sqrt(cast(a2 as double)))"
            " / greatest(sqrt(cast(a2 as double)), sqrt(cast(b2 as double)))"
            " * 1000000 + 0.5) as bigint)"
        ).alias("s_ppm"),
    )
    return sil.groupBy(F.col("label").cast("int").alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("cast(sum(s_ppm) div count(*) as bigint)").alias(
            "mean_s_ppm"
        ),
    )


@query(
    "q240_correlogram",
    """
    WITH h AS (SELECT event_type,
                      epoch_us(date_trunc('hour', ts)) // 3600000000
                        AS idx,
                      cast(count(*) AS BIGINT) AS v
               FROM events GROUP BY 1, 2),
    l AS (SELECT a.event_type, lg.lag, a.v AS x, b.v AS y
          FROM h a
          CROSS JOIN (SELECT unnest(range(1, 25)) AS lag) lg
          JOIN h b ON b.event_type = a.event_type
                  AND b.idx = a.idx + lg.lag),
    m AS (SELECT event_type, lag, count(*) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                 sum(x * x) AS sxx, sum(y * y) AS syy
          FROM l GROUP BY event_type, lag)
    SELECT event_type, cast(lag AS BIGINT) AS lag,
           cast(n AS BIGINT) AS n_pairs,
           cast(floor(cast((n * sxy - sx * sy) * 1000000 AS DOUBLE)
                      / (sqrt(cast(n * sxx - sx * sx AS DOUBLE))
                         * sqrt(cast(n * syy - sy * sy AS DOUBLE)))
                      + 0.5) AS BIGINT) AS r_q
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
    doc="Correlogram (ACF at lags 1-24 h) of each event type's hourly "
    "volume — the seasonality detector read before picking q214's "
    "seasonal baseline period (a daily cycle shows as the lag-24 "
    "peak). The raw stream collapses to the per-(type, hour) count "
    "series FIRST (one map-side-combinable aggregate), so every "
    "later stage — 24-lag fan-out, self-join on the shifted hour "
    "index, per-(type, lag) Pearson — runs on a metadata-sized "
    "series table (|types| x |hours|) regardless of corpus size. "
    "Counts are exact integers; one quantized correlation per cell, "
    "same fixed-order spelling as q223. Integer headroom: the "
    "(n*sxy - sx*sy)*1e6 numerator caps near 150x this hourly volume "
    "— past that, resample coarser or mean-center the series first "
    "(the count-series shape itself is unbounded).",
)
def q240_correlogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.expr(
                "unix_micros(date_trunc('hour', ts)) div 3600000000"
            ).alias("idx"),
        )
        .groupBy("event_type", "idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    )
    lags = spark.range(1, 25).select(F.col("id").alias("lag"))
    a = h.select("event_type", "idx", F.col("v").alias("x"))
    b = h.select(
        F.col("event_type").alias("bt"),
        F.col("idx").alias("bidx"),
        F.col("v").alias("y"),
    )
    l = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bidx") == F.col("idx") + F.col("lag")),
        )
    )
    m = l.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    return m.filter(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").cast("bigint").alias("n_pairs"),
        F.expr(
            "cast(floor(cast((n * sxy - sx * sy) * 1000000 as double)"
            " / (sqrt(cast(n * sxx - sx * sx as double))"
            "    * sqrt(cast(n * syy - sy * sy as double)))"
            " + 0.5) as bigint)"
        ).alias("r_q"),
    )


@query(
    "q241_incremental_join_mv",
    """
    WITH j AS (SELECT n.n_name AS nation,
                      cast(extract(year FROM o.o_orderdate) AS INT) AS yr,
                      o.o_totalprice
               FROM orders o
               JOIN customer c ON o.o_custkey = c.c_custkey
               JOIN nation n ON c.c_nationkey = n.n_nationkey)
    SELECT nation, yr,
           cast(count(*) AS BIGINT) AS n_orders,
           cast(cast(sum(cast(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(18,2)) AS DOUBLE) AS revenue
    FROM j GROUP BY nation, yr
    """,
    doc="Incremental maintenance of an aggregated JOIN view (revenue "
    "per nation-year over orders-customer-nation): the q123 pattern "
    "extended to joins — the stored view's partial states merge with "
    "the DELTA batch's contribution, where ONLY the delta re-joins "
    "its dimensions (broadcast — the base fact is never rescanned at "
    "refresh time; the base aggregate here is localCheckpoint-"
    "materialized to stand in for the stored MV). Count/sum states "
    "merge by addition in DECIMAL, so refresh cost is O(|delta| + "
    "|view|) however big the base corpus is. The oracle recomputes "
    "the view from scratch — maintained result must equal full "
    "recompute exactly (the IVM correctness contract).",
)
def q241_incremental_join_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def state(orders_part, dims_broadcast):
        cc = F.broadcast(c) if dims_broadcast else c
        nn = F.broadcast(n)
        return (
            orders_part.join(cc, F.col("o_custkey") == F.col("c_custkey"))
            .join(nn, F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                F.col("n_name").alias("nation"),
                F.year("o_orderdate").cast("int").alias("yr"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
            )
            .groupBy("nation", "yr")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum("p").cast("decimal(18,2)").alias("rev"),
            )
        )

    base = state(
        o.filter(F.col("o_orderkey") % 10 != 0), dims_broadcast=False
    ).localCheckpoint()  # stands in for the STORED view state
    delta = state(
        o.filter(F.col("o_orderkey") % 10 == 0), dims_broadcast=True
    )
    merged = (
        base.unionByName(delta)
        .groupBy("nation", "yr")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_orders"),
            F.sum("rev").cast("decimal(18,2)").alias("rev"),
        )
    )
    return merged.select(
        "nation",
        "yr",
        "n_orders",
        F.col("rev").cast("double").alias("revenue"),
    )


def _q242_oracle() -> str:
    lvl = """
    l{k} AS (SELECT idx // 2 AS idx,
                    md5(max(CASE WHEN idx % 2 = 0 THEN h END)
                        || coalesce(max(CASE WHEN idx % 2 = 1 THEN h END),
                                    max(CASE WHEN idx % 2 = 0 THEN h END)))
                      AS h
             FROM l{p} GROUP BY idx // 2)"""
    levels = ",".join(lvl.format(k=k, p=k - 1) for k in range(1, 5))
    return f"""
    WITH parts AS (
      SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 4))::BIGINT % 16
               AS bucket,
             cast(count(*) AS BIGINT) AS n_rows,
             cast(sum(('0x' || substr(md5(
                   cast(l_orderkey AS VARCHAR) || '|' ||
                   cast(l_linenumber AS VARCHAR) || '|' ||
                   cast(cast(l_quantity AS DECIMAL(18,2)) AS VARCHAR)
                     || '|' || l_returnflag
                 ), 1, 8))::BIGINT) AS BIGINT) AS checksum
      FROM lineitem GROUP BY 1),
    l0 AS (SELECT bucket AS idx,
                  md5(cast(bucket AS VARCHAR) || ':'
                      || cast(checksum AS VARCHAR) || ':'
                      || cast(n_rows AS VARCHAR)) AS h
           FROM parts),{levels}
    SELECT (SELECT cast(count(*) AS BIGINT) FROM l0) AS n_leaves,
           cast(4 AS INT) AS depth,
           h AS root
    FROM l4
    """


@query(
    "q242_merkle_root",
    None,  # oracle composed below (unrolled fold levels)
    doc="Merkle root over the q189 per-partition checksum vector: "
    "leaves are md5(bucket:checksum:rows), parents md5(left||right) "
    "with odd nodes self-paired, folded log2(buckets) times to one "
    "root — the single-value integrity handshake two replicas compare "
    "before any anti-entropy work (root match = done; mismatch -> "
    "walk down the q189 vector -> q144 row diff only inside the "
    "offending bucket). The fold runs over the metadata-sized "
    "checksum table (16 rows here, fixed depth 4; at corpus scale "
    "buckets and depth grow log2), every hash is the portable md5 on "
    "decimal-string domains, and the oracle unrolls the identical "
    "four fold levels.",
)
def q242_merkle_root(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = (
        li.select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.col("l_orderkey").cast("string")), 1, 4
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 16
            ).alias("bucket"),
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.col("l_orderkey").cast("string"),
                            F.col("l_linenumber").cast("string"),
                            F.col("l_quantity")
                            .cast("decimal(18,2)")
                            .cast("string"),
                            "l_returnflag",
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("rh"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum("rh").cast("bigint").alias("checksum"),
        )
    )
    lvl = parts.select(
        F.col("bucket").alias("idx"),
        F.md5(
            F.concat_ws(
                ":",
                F.col("bucket").cast("string"),
                F.col("checksum").cast("string"),
                F.col("n_rows").cast("string"),
            )
        ).alias("h"),
    )
    n_leaves = lvl.agg(F.count(F.lit(1)).cast("bigint").alias("n_leaves"))
    for _ in range(4):
        left = F.max(F.when(F.col("idx") % 2 == 0, F.col("h")))
        right = F.max(F.when(F.col("idx") % 2 == 1, F.col("h")))
        lvl = lvl.groupBy(F.expr("idx div 2").alias("idx")).agg(
            F.md5(F.concat(left, F.coalesce(right, left))).alias("h")
        )
    return (
        lvl.crossJoin(F.broadcast(n_leaves))
        .select(
            "n_leaves",
            F.lit(4).cast("int").alias("depth"),
            F.col("h").alias("root"),
        )
    )


REGISTRY["q242_merkle_root"] = QueryDef(
    fn=REGISTRY["q242_merkle_root"].fn,
    oracle=_q242_oracle(),
    doc=REGISTRY["q242_merkle_root"].doc,
)


@query(
    "q243_market_basket",
    """
    WITH ps AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS item
                FROM lineitem),
    n AS (SELECT cast(count(DISTINCT ok) AS BIGINT) AS n_orders FROM ps),
    ic AS (SELECT item, cast(count(*) AS BIGINT) AS n_item
           FROM ps GROUP BY item),
    pr AS (SELECT a.item AS item_a, b.item AS item_b,
                  cast(count(*) AS BIGINT) AS n_ab
           FROM ps a JOIN ps b ON a.ok = b.ok AND a.item < b.item
           GROUP BY 1, 2
           HAVING count(*) >= 2),
    s AS (SELECT pr.item_a, pr.item_b, pr.n_ab,
                 ia.n_item AS n_a, ib.n_item AS n_b, n.n_orders
          FROM pr JOIN ic ia ON pr.item_a = ia.item
                  JOIN ic ib ON pr.item_b = ib.item
                  CROSS JOIN n)
    SELECT item_a, item_b, n_ab, n_a, n_b,
           cast(n_ab * 1000000 // n_a AS BIGINT) AS conf_ab_ppm,
           cast(n_ab * 1000000 // n_b AS BIGINT) AS conf_ba_ppm,
           cast(n_ab * n_orders * 1000 // (n_a * n_b) AS BIGINT)
             AS lift_mils
    FROM s
    ORDER BY lift_mils DESC, item_a, item_b LIMIT 100
    """,
    doc="Market-basket association rules (a-priori 2-itemsets): part "
    "pairs co-ordered in the same order, with exact support, both "
    "directional confidences (ppm) and lift (x1000). Pair fan-out is "
    "bounded by basket size (TPC-H orders hold <= 7 lines, so the "
    "per-order self-join emits <= C(7,2) = 21 pairs per order — linear "
    "in the fact table, never |parts|^2); the pair-count aggregate is "
    "the only large shuffle and it is map-side combinable. Item "
    "supports join back on the pair's own keys (item_a, then item_b — "
    "two co-partitioned hash joins; the item-count dim broadcasts "
    "when it fits). All rule metrics are exact integer arithmetic: "
    "conf = n_ab*1e6 div n_a, lift = n_ab*N*1e3 div (n_a*n_b). "
    "Headroom bound, stated precisely: n_ab*N*1e3 needs n_ab*N <= "
    "9.2e15 to stay in int64 — at N=1e9 baskets that allows pair "
    "support to ~9.2e6; at N=1e12 only ~9.2e3, and high-support "
    "pairs are exactly the ones association rules surface, so beyond "
    "~1e9 baskets pre-divide instead: lift = (n_ab*1000 div n_a) * N "
    "div n_b, mirroring the quantization-order change in the oracle. "
    "Top-100 by the unique (lift, a, b) key via "
    "TakeOrderedAndProject.",
)
def q243_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    n = ps.agg(F.countDistinct("ok").cast("bigint").alias("n_orders"))
    ic = ps.groupBy("item").agg(F.count(F.lit(1)).cast("bigint").alias("n_item"))
    a = ps.select("ok", F.col("item").alias("item_a"))
    b = ps.select("ok", F.col("item").alias("item_b"))
    pr = (
        a.join(b, "ok")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    s = (
        pr.join(
            F.broadcast(ic.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(ic.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n))
    )
    return (
        s.select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr("n_ab * 1000000 div n_a").cast("bigint").alias("conf_ab_ppm"),
            F.expr("n_ab * 1000000 div n_b").cast("bigint").alias("conf_ba_ppm"),
            F.expr("n_ab * n_orders * 1000 div (n_a * n_b)")
            .cast("bigint")
            .alias("lift_mils"),
        )
        .orderBy(F.col("lift_mils").desc(), "item_a", "item_b")
        .limit(100)
    )


@query(
    "q244_bitmap_audience",
    """
    WITH bm AS (SELECT event_type,
                       user_id // 62 AS word_idx,
                       bit_or(1::BIGINT << cast(user_id % 62 AS INT)) AS w
                FROM events GROUP BY 1, 2),
    sz AS (SELECT event_type, cast(sum(bit_count(w)) AS BIGINT) AS n_users
           FROM bm GROUP BY 1),
    ov AS (SELECT a.event_type AS et1, b.event_type AS et2,
                  cast(sum(bit_count(a.w & b.w)) AS BIGINT) AS n_both
           FROM bm a JOIN bm b
             ON a.word_idx = b.word_idx AND a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT ov.et1, ov.et2,
           sa.n_users AS n_a, sb.n_users AS n_b, ov.n_both,
           cast(ov.n_both * 1000000
                // (sa.n_users + sb.n_users - ov.n_both) AS BIGINT)
             AS jaccard_ppm
    FROM ov JOIN sz sa ON ov.et1 = sa.event_type
            JOIN sz sb ON ov.et2 = sb.event_type
    """,
    doc="Exact audience-overlap algebra on a bitmap index (the roaring-"
    "bitmap primitive): each event type's user set is materialized as "
    "62-bit words — (type, user div 62) -> bit_or(1 << user mod 62) — "
    "so set size is sum(bit_count(w)) and pairwise intersection is a "
    "word-co-located join + bit_count(a & b), never a user-level pair "
    "join. bit_or is idempotent, so no pre-distinct pass is needed "
    "(duplicate events OR into the same bit); the word table is "
    "|users|/62 rows per type — mergeable, partitionable on word_idx, "
    "and the exact complement of q184's probabilistic HLL "
    "intersection. 62-bit words (not 64) because DuckDB's << is "
    "overflow-checked at the sign bit; both engines agree on bits "
    "0..61. Output: all type pairs with exact sizes and Jaccard ppm.",
)
def q244_bitmap_audience(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bm = (
        ev.select(
            "event_type",
            F.expr("user_id div 62").alias("word_idx"),
            F.expr(
                "shiftleft(cast(1 as bigint), cast(user_id % 62 as int))"
            ).alias("v"),
        )
        .groupBy("event_type", "word_idx")
        .agg(F.expr("bit_or(v)").alias("w"))
    )
    sz = bm.groupBy("event_type").agg(
        F.expr("cast(sum(bit_count(w)) as bigint)").alias("n_users")
    )
    a = bm.select(
        F.col("event_type").alias("et1"), "word_idx", F.col("w").alias("wa")
    )
    b = bm.select(
        F.col("event_type").alias("et2"), "word_idx", F.col("w").alias("wb")
    )
    ov = (
        a.join(b, "word_idx")
        .filter(F.col("et1") < F.col("et2"))
        .groupBy("et1", "et2")
        .agg(F.expr("cast(sum(bit_count(wa & wb)) as bigint)").alias("n_both"))
    )
    return (
        ov.join(
            F.broadcast(
                sz.select(F.col("event_type").alias("et1"), F.col("n_users").alias("n_a"))
            ),
            "et1",
        )
        .join(
            F.broadcast(
                sz.select(F.col("event_type").alias("et2"), F.col("n_users").alias("n_b"))
            ),
            "et2",
        )
        .select(
            "et1",
            "et2",
            "n_a",
            "n_b",
            "n_both",
            F.expr("n_both * 1000000 div (n_a + n_b - n_both)")
            .cast("bigint")
            .alias("jaccard_ppm"),
        )
    )


@query(
    "q245_record_linkage",
    """
    WITH oc AS (SELECT o_custkey AS ck, cast(count(*) AS BIGINT) AS n_ord
                FROM orders GROUP BY 1),
    c AS (SELECT c_custkey, c_nationkey, c_mktsegment,
                 cast(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents,
                 cast(floor(c_acctbal / 1000.0) AS BIGINT) AS blk,
                 coalesce(oc.n_ord, 0) AS n_ord
          FROM customer LEFT JOIN oc ON c_custkey = oc.ck),
    pr AS (SELECT a.c_custkey AS id1, b.c_custkey AS id2,
                  CASE WHEN a.c_mktsegment = b.c_mktsegment
                       THEN 13863 ELSE -2231 END
                + CASE WHEN abs(a.cents - b.cents) <= 5000
                       THEN 16094 ELSE -1054 END
                + CASE WHEN a.n_ord = b.n_ord
                       THEN 9163 ELSE -2877 END AS score_q,
                  CASE WHEN a.c_mktsegment = b.c_mktsegment
                       THEN 1 ELSE 0 END AS agree_seg,
                  CASE WHEN abs(a.cents - b.cents) <= 5000
                       THEN 1 ELSE 0 END AS agree_bal,
                  CASE WHEN a.n_ord = b.n_ord THEN 1 ELSE 0 END AS agree_ord
           FROM c a JOIN c b
             ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
            AND a.c_custkey < b.c_custkey)
    SELECT id1, id2, cast(score_q AS BIGINT) AS score_q,
           cast(agree_seg AS INT) AS agree_seg,
           cast(agree_bal AS INT) AS agree_bal,
           cast(agree_ord AS INT) AS agree_ord
    FROM pr WHERE score_q >= 25000
    ORDER BY score_q DESC, id1, id2 LIMIT 100
    """,
    doc="Fellegi-Sunter record-linkage scoring: candidate pairs from "
    "blocking on (nation, $1000 balance bucket), scored by summing "
    "per-field agreement/disagreement log-likelihood weights "
    "(illustrative trained m/u ratios, quantized x1e4: segment "
    "+1.3863/-0.2231, balance-within-$50 +1.6094/-0.1054, identical "
    "order count +0.9163/-0.2877), linked when the total clears the "
    "decision threshold. The blocking join is the scale lever — "
    "pairs are generated only within (nation, bucket) blocks, so "
    "fan-out is sum over blocks of C(|block|,2), never |customers|^2; "
    "at web scale add a second cheap key (e.g. name soundex) to "
    "subdivide hot blocks. Balance proximity compares exact integer "
    "cents (floor(bal*100+0.5) — float-division bucket boundary uses "
    "floor() on a double both engines compute identically). The "
    "behavioral comparator (order count) comes from one hash "
    "aggregate over orders joined before pairing, so each record "
    "carries its features into the block join — the standard "
    "feature-vector-then-block linkage shape. Top-100 by the unique "
    "(score, id1, id2) key.",
)
def q245_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    oc = o.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ord")
    )
    c = (
        cu.join(oc, cu["c_custkey"] == oc["ck"], "left")
        .select(
            "c_custkey",
            "c_nationkey",
            "c_mktsegment",
            F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").alias("cents"),
            F.expr("cast(floor(c_acctbal / 1000.0) as bigint)").alias("blk"),
            F.coalesce(F.col("n_ord"), F.lit(0).cast("bigint")).alias("n_ord"),
        )
    )
    a = c.select(
        F.col("c_custkey").alias("id1"),
        "c_nationkey",
        "blk",
        F.col("c_mktsegment").alias("seg1"),
        F.col("cents").alias("cents1"),
        F.col("n_ord").alias("nord1"),
    )
    b = c.select(
        F.col("c_custkey").alias("id2"),
        "c_nationkey",
        "blk",
        F.col("c_mktsegment").alias("seg2"),
        F.col("cents").alias("cents2"),
        F.col("n_ord").alias("nord2"),
    )
    pr = (
        a.join(b, ["c_nationkey", "blk"])
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.when(F.col("seg1") == F.col("seg2"), 1).otherwise(0).alias("agree_seg"),
            F.when(F.abs(F.col("cents1") - F.col("cents2")) <= 5000, 1)
            .otherwise(0)
            .alias("agree_bal"),
            F.when(F.col("nord1") == F.col("nord2"), 1).otherwise(0).alias("agree_ord"),
        )
        .select(
            "id1",
            "id2",
            (
                F.when(F.col("agree_seg") == 1, 13863).otherwise(-2231)
                + F.when(F.col("agree_bal") == 1, 16094).otherwise(-1054)
                + F.when(F.col("agree_ord") == 1, 9163).otherwise(-2877)
            )
            .cast("bigint")
            .alias("score_q"),
            F.col("agree_seg").cast("int").alias("agree_seg"),
            F.col("agree_bal").cast("int").alias("agree_bal"),
            F.col("agree_ord").cast("int").alias("agree_ord"),
        )
    )
    return (
        pr.filter(F.col("score_q") >= 25000)
        .orderBy(F.col("score_q").desc(), "id1", "id2")
        .limit(100)
    )


@query(
    "q246_grid_spatial_join",
    """
    WITH pt AS (SELECT c_custkey AS id,
                       ('0x' || substr(md5(cast(c_custkey AS VARCHAR)), 1, 8))
                         ::BIGINT % 180000 AS lat_md,
                       ('0x' || substr(md5(cast(c_custkey AS VARCHAR)), 9, 8))
                         ::BIGINT % 360000 AS lon_md
                FROM customer),
    g AS (SELECT id, lat_md, lon_md,
                 lat_md // 10000 AS cx, lon_md // 10000 AS cy
          FROM pt),
    pr AS (SELECT a.id AS id1, b.id AS id2,
                  (a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
                + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md) AS d2
           FROM g a
           CROSS JOIN (VALUES (-1), (0), (1)) dx(dx)
           CROSS JOIN (VALUES (-1), (0), (1)) dy(dy)
           JOIN g b ON b.cx = a.cx + dx.dx AND b.cy = a.cy + dy.dy
                   AND a.id < b.id
           WHERE (a.lat_md - b.lat_md) * (a.lat_md - b.lat_md)
               + (a.lon_md - b.lon_md) * (a.lon_md - b.lon_md)
               <= 25000000)
    SELECT id1, id2, cast(d2 AS BIGINT) AS d2
    FROM pr ORDER BY d2, id1, id2 LIMIT 100
    """,
    doc="Grid-bucketed spatial radius join (the geohash-cell pattern): "
    "points carry deterministic md5-derived milli-degree coordinates, "
    "land in 10-degree grid cells, and candidate pairs are generated "
    "ONLY between a point's cell and its 3x3 cell neighborhood (cell "
    "size >= radius guarantees no missed pair) — the join is cell-"
    "co-located and fan-out is bounded by local point density, never "
    "|points|^2. Each qualifying pair is emitted by exactly one "
    "(dx,dy) offset (the relative cell of b is unique), so no dedup "
    "pass. Distances are exact integer squared milli-degrees (flat "
    "metric — the demo stand-in for haversine; swap the final filter "
    "expression for the real sphere at deploy). At 100x the cells "
    "partition the shuffle and hot cells subdivide by halving the "
    "cell edge — the standard quadtree refinement. Top-100 nearest "
    "by the unique (d2, id1, id2) key.",
)
def q246_grid_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    pt = cu.select(
        F.col("c_custkey").alias("id"),
        (
            F.expr(
                "conv(substr(md5(cast(c_custkey as string)), 1, 8), 16, 10)"
            ).cast("bigint")
            % 180000
        ).alias("lat_md"),
        (
            F.expr(
                "conv(substr(md5(cast(c_custkey as string)), 9, 8), 16, 10)"
            ).cast("bigint")
            % 360000
        ).alias("lon_md"),
    )
    g = pt.select(
        "id",
        "lat_md",
        "lon_md",
        F.expr("lat_md div 10000").alias("cx"),
        F.expr("lon_md div 10000").alias("cy"),
    )
    offs = spark.range(1).select(
        F.explode(
            F.expr(
                "flatten(transform(array(-1, 0, 1), "
                "dx -> transform(array(-1, 0, 1), "
                "dy -> struct(dx, dy))))"
            )
        ).alias("o")
    ).select("o.dx", "o.dy")
    a = g.select(
        F.col("id").alias("id1"),
        F.col("lat_md").alias("lat1"),
        F.col("lon_md").alias("lon1"),
        "cx",
        "cy",
    ).crossJoin(F.broadcast(offs))
    b = g.select(
        F.col("id").alias("id2"),
        F.col("lat_md").alias("lat2"),
        F.col("lon_md").alias("lon2"),
        F.col("cx").alias("bx"),
        F.col("cy").alias("by"),
    )
    pr = (
        a.join(
            b,
            (F.col("bx") == F.col("cx") + F.col("dx"))
            & (F.col("by") == F.col("cy") + F.col("dy"))
            & (F.col("id1") < F.col("id2")),
        )
        .select(
            "id1",
            "id2",
            (
                (F.col("lat1") - F.col("lat2")) * (F.col("lat1") - F.col("lat2"))
                + (F.col("lon1") - F.col("lon2")) * (F.col("lon1") - F.col("lon2"))
            )
            .cast("bigint")
            .alias("d2"),
        )
        .filter(F.col("d2") <= 25000000)
    )
    return pr.orderBy("d2", "id1", "id2").limit(100)


_KN_TOKS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"

@query(
    "q247_kneser_ney",
    f"""
    WITH tok AS (SELECT {_KN_TOKS} AS t FROM documents),
    bg AS (SELECT list_extract(t, i) AS w1, list_extract(t, i + 1) AS w2
           FROM tok CROSS JOIN unnest(range(1, len(t))) AS r(i)),
    c AS (SELECT w1, w2, cast(count(*) AS BIGINT) AS c
          FROM bg GROUP BY 1, 2),
    l AS (SELECT w1, cast(sum(c) AS BIGINT) AS cw1,
                 cast(count(*) AS BIGINT) AS n1fw
          FROM c GROUP BY 1),
    r AS (SELECT w2, cast(count(*) AS BIGINT) AS n1bw FROM c GROUP BY 1),
    n AS (SELECT cast(count(*) AS BIGINT) AS n_types FROM c),
    s AS (SELECT c.w1, c.w2, c.c, l.cw1, l.n1fw, r.n1bw, n.n_types
          FROM c JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN n)
    SELECT w1, w2, c,
           cast((c * 1000000000) // cw1 AS BIGINT) AS mle_q,
           cast((greatest(4 * c - 3, 0) * 1000000000) // (4 * cw1)
                + (3 * n1fw * ((n1bw * 1000000000) // n_types))
                  // (4 * cw1) AS BIGINT) AS kn_q
    FROM s
    ORDER BY c DESC, w1, w2 LIMIT 100
    """,
    doc="Interpolated Kneser-Ney bigram language model (D = 0.75), the "
    "standard n-gram smoother: P(w2|w1) = max(c-D,0)/c(w1) + "
    "D*N1+(w1,.)/c(w1) * Pcont(w2), with the continuation probability "
    "Pcont(w2) = N1+(.,w2)/|bigram types|. Everything derives from ONE "
    "bigram count table (three map-side-combinable aggregates over it: "
    "left marginals, right continuation counts, global type count) — "
    "bigrams materialize map-side from adjacent-slice zip_with, no "
    "position explode. D = 3/4 makes the discount exact in quarters, "
    "so the whole model is integer arithmetic: each division is an "
    "explicit 1e9-quantized integer div mirrored operation-for-"
    "operation in both engines (div order is part of the contract). "
    "Headroom: 3 * N1fw * 1e9 caps at vocab ~3e9 successors — beyond "
    "any real vocabulary. Top-100 bigrams by the unique (c, w1, w2) "
    "key, with the MLE estimate beside KN for the smoothing delta.",
)
def q247_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(tokens(F.col("text")).alias("__t"))
    bg = t.select(
        F.explode(
            F.expr(
                "zip_with(slice(__t, 1, greatest(size(__t)-1, 0)), "
                "slice(__t, 2, greatest(size(__t)-1, 0)), "
                "(a, b) -> struct(a AS w1, b AS w2))"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    c = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    left = c.groupBy("w1").agg(
        F.sum("c").cast("bigint").alias("cw1"),
        F.count(F.lit(1)).cast("bigint").alias("n1fw"),
    )
    right = c.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("n1bw"))
    n = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    s = (
        c.join(left, "w1")
        .join(right, "w2")
        .crossJoin(F.broadcast(n))
    )
    return (
        s.select(
            "w1",
            "w2",
            "c",
            F.expr("(c * 1000000000) div cw1").cast("bigint").alias("mle_q"),
            F.expr(
                "(greatest(4 * c - 3, 0) * 1000000000) div (4 * cw1)"
                " + (3 * n1fw * ((n1bw * 1000000000) div n_types))"
                "   div (4 * cw1)"
            )
            .cast("bigint")
            .alias("kn_q"),
        )
        .orderBy(F.col("c").desc(), "w1", "w2")
        .limit(100)
    )


@query(
    "q248_hits_scores",
    """
    WITH e AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
               FROM orders o JOIN lineitem l
                 ON o.o_orderkey = l.l_orderkey),
    h1 AS (SELECT c, cast(count(*) AS BIGINT) AS h FROM e GROUP BY c),
    a1 AS (SELECT e.s, cast(sum(h1.h) AS BIGINT) AS a
           FROM e JOIN h1 USING (c) GROUP BY e.s),
    am AS (SELECT max(a) AS m FROM a1),
    a1q AS (SELECT s, cast((a * 1000000) // am.m AS BIGINT) AS aq
            FROM a1 CROSS JOIN am),
    h2 AS (SELECT e.c, cast(sum(a1q.aq) AS BIGINT) AS h
           FROM e JOIN a1q USING (s) GROUP BY e.c),
    hm AS (SELECT max(h) AS m FROM h2),
    h2q AS (SELECT c, cast((h * 1000000) // hm.m AS BIGINT) AS hq
            FROM h2 CROSS JOIN hm),
    a2 AS (SELECT e.s, cast(sum(h2q.hq) AS BIGINT) AS a
           FROM e JOIN h2q USING (c) GROUP BY e.s),
    am2 AS (SELECT max(a) AS m FROM a2),
    a2q AS (SELECT s, cast((a * 1000000) // am2.m AS BIGINT) AS aq
            FROM a2 CROSS JOIN am2),
    tops AS (SELECT 'authority' AS role, s AS node_id, aq AS score_q
             FROM a2q ORDER BY aq DESC, s LIMIT 20),
    toph AS (SELECT 'hub' AS role, c AS node_id, hq AS score_q
             FROM h2q ORDER BY hq DESC, c LIMIT 20)
    SELECT role, node_id, score_q FROM tops
    UNION ALL SELECT role, node_id, score_q FROM toph
    """,
    doc="HITS hub/authority scoring on the bipartite customer->supplier "
    "purchase graph (Kleinberg), unrolled to two mutual-reinforcement "
    "rounds: h = sum of neighbor authorities, a = sum of neighbor "
    "hubs, re-normalized after every round by the max score — the "
    "max is a 1-row broadcast, and the quantized integer scores "
    "(x1e6) make each round exactly reproducible in both engines (no "
    "float norm drift). Each half-step is one co-partitioned join on "
    "the edge list + one map-side-combinable aggregate — the same "
    "shuffle profile as the q124 PageRank loop, so rounds scale "
    "linearly in |edges| and the iteration count is the only "
    "multiplier. Top-20 per role via TakeOrderedAndProject on the "
    "unique (score, id) key.",
)
def q248_hits_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("c")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s")
    )
    # The edge list feeds all three half-steps plus the initial degree
    # count — materialize it once (executor-local, O(edges)) instead of
    # re-running the orders-lineitem join + distinct per consumer.
    e = (
        li.join(o, "ok")
        .select("c", "s")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _qnorm(df, key, val, out):
        m = df.agg(F.max(val).alias("m"))
        return df.crossJoin(F.broadcast(m)).select(
            key, F.expr(f"({val} * 1000000) div m").cast("bigint").alias(out)
        )

    h1 = e.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("h"))
    a1 = (
        e.join(h1, "c")
        .groupBy("s")
        .agg(F.sum("h").cast("bigint").alias("a"))
    )
    a1q = _qnorm(a1, "s", "a", "aq")
    h2 = (
        e.join(a1q, "s")
        .groupBy("c")
        .agg(F.sum("aq").cast("bigint").alias("h"))
    )
    # h2q feeds both the a2 half-step and the hub top-20 branch; it is
    # NOT checkpointed — the recompute is one small agg + broadcast,
    # and a checkpoint here would hide the renorm broadcasts from the
    # plan (test_hits_renorms_are_broadcast inspects them).
    h2q = _qnorm(h2, "c", "h", "hq")
    a2 = (
        e.join(h2q, "c")
        .groupBy("s")
        .agg(F.sum("hq").cast("bigint").alias("a"))
    )
    a2q = _qnorm(a2, "s", "a", "aq")
    tops = (
        a2q.orderBy(F.col("aq").desc(), "s")
        .limit(20)
        .select(
            F.lit("authority").alias("role"),
            F.col("s").alias("node_id"),
            F.col("aq").alias("score_q"),
        )
    )
    toph = (
        h2q.orderBy(F.col("hq").desc(), "c")
        .limit(20)
        .select(
            F.lit("hub").alias("role"),
            F.col("c").alias("node_id"),
            F.col("hq").alias("score_q"),
        )
    )
    return tops.unionByName(toph)


@query(
    "q249_theil_sen",
    """
    WITH hr AS (SELECT event_type,
                       cast(floor(cast(epoch_us(ts) AS DOUBLE) / 3.6e9)
                            AS BIGINT) AS h,
                       cast(count(*) AS BIGINT) AS y
                FROM events GROUP BY 1, 2),
    pr AS (SELECT a.event_type,
                  cast(floor(cast((b.y - a.y) * 1000000 AS DOUBLE)
                             / (b.h - a.h)) AS BIGINT) AS slope_q
           FROM hr a JOIN hr b
             ON a.event_type = b.event_type AND a.h < b.h),
    rk AS (SELECT event_type, slope_q,
                  row_number() OVER (PARTITION BY event_type
                                     ORDER BY slope_q) AS rn,
                  count(*) OVER (PARTITION BY event_type) AS n
           FROM pr)
    SELECT event_type,
           cast(n AS BIGINT) AS n_pairs,
           cast(slope_q AS BIGINT) AS median_slope_q
    FROM rk WHERE rn = (n + 1) // 2
    """,
    doc="Theil-Sen robust trend estimator per event type: the median of "
    "all pairwise slopes of the HOURLY count series — the classic "
    "outlier-proof alternative to OLS (q148) for drift dashboards. "
    "The scale discipline is the pre-aggregation: the fact table "
    "collapses to one bounded hourly series per key FIRST (a map-"
    "side-combinable count), so the O(L^2) pair stage runs on series "
    "length L (720 points for a 30-day window), independent of corpus "
    "row count — C(720,2) ~ 259k slope rows per key whether the "
    "corpus is 10k rows or 10 TB. Slopes quantize via double division "
    "+ floor (exact-integer operands, identical doubles both engines "
    "— integer div is avoided because Spark's div truncates while "
    "DuckDB's // floors on NEGATIVE slopes). The median is the lower "
    "median at rank ceil(n/2) via a per-key window over the bounded "
    "pair set — per-partition state is C(L,2), never corpus-scale; "
    "value ties make any rank tiebreak irrelevant to the OUTPUT.",
)
def q249_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hr = (
        ev.select(
            "event_type",
            F.expr(
                "cast(floor(cast(unix_micros(ts) as double) / 3.6e9) as bigint)"
            ).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    a = hr.select("event_type", F.col("h").alias("h1"), F.col("y").alias("y1"))
    b = hr.select("event_type", F.col("h").alias("h2"), F.col("y").alias("y2"))
    pr = (
        a.join(b, "event_type")
        .filter(F.col("h1") < F.col("h2"))
        .select(
            "event_type",
            F.expr(
                "cast(floor(cast((y2 - y1) * 1000000 as double)"
                " / (h2 - h1)) as bigint)"
            ).alias("slope_q"),
        )
    )
    w = W.partitionBy("event_type").orderBy("slope_q")
    rk = pr.select(
        "event_type",
        "slope_q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n"),
    )
    return rk.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "event_type",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("slope_q").cast("bigint").alias("median_slope_q"),
    )


@query(
    "q250_snapshot_stat_drift",
    """
    WITH m AS (
      SELECT 'o_totalprice' AS col_name,
             CASE WHEN o_orderkey % 2 = 0 THEN 'old' ELSE 'new' END AS side,
             cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CASE WHEN o_orderkey % 2 = 0 THEN 'old' ELSE 'new' END,
             o_custkey
      FROM orders
      UNION ALL
      SELECT 'o_orderdate_day',
             CASE WHEN o_orderkey % 2 = 0 THEN 'old' ELSE 'new' END,
             cast(floor(cast(epoch_us(o_orderdate) AS DOUBLE) / 86.4e9)
                  AS BIGINT)
      FROM orders),
    s AS (SELECT col_name,
                 cast(count(*) FILTER (side = 'old') AS BIGINT) AS n_old,
                 cast(count(*) FILTER (side = 'new') AS BIGINT) AS n_new,
                 cast(count(DISTINCT v) FILTER (side = 'old') AS BIGINT)
                   AS ndv_old,
                 cast(count(DISTINCT v) FILTER (side = 'new') AS BIGINT)
                   AS ndv_new,
                 cast(min(v) FILTER (side = 'old') AS BIGINT) AS min_old,
                 cast(min(v) FILTER (side = 'new') AS BIGINT) AS min_new,
                 cast(max(v) FILTER (side = 'old') AS BIGINT) AS max_old,
                 cast(max(v) FILTER (side = 'new') AS BIGINT) AS max_new,
                 cast(sum(v) FILTER (side = 'old') AS BIGINT) AS sum_old,
                 cast(sum(v) FILTER (side = 'new') AS BIGINT) AS sum_new
          FROM m GROUP BY col_name)
    SELECT col_name, n_old, n_new, ndv_old, ndv_new,
           min_old, min_new, max_old, max_new,
           cast(floor(cast(sum_old AS DOUBLE) / n_old) AS BIGINT)
             AS mean_old_q,
           cast(floor(cast(sum_new AS DOUBLE) / n_new) AS BIGINT)
             AS mean_new_q,
           cast(floor(cast((ndv_new - ndv_old) * 1000000 AS DOUBLE)
                      / ndv_old) AS BIGINT) AS ndv_drift_ppm
    FROM s
    """,
    doc="Snapshot statistics-drift audit: per-column profile (rows, "
    "NDV, min/max, mean) of two table snapshots (orderkey-parity "
    "halves standing in for yesterday/today), with NDV drift in ppm "
    "— the schema-stability gate that catches silent upstream "
    "distribution shifts before they poison a training run. The "
    "melt-then-aggregate shape: each profiled column contributes a "
    "(col_name, side, value) stream (projection-pruned parallel "
    "scans, map-side combined), so ONE conditional aggregate per "
    "column computes both sides without a join, and adding a column "
    "to the profile is one more UNION leg, not a new pipeline. All "
    "stats are exact integers (cents / epoch-days); means and drift "
    "quantize via floor(double division) — exact-int operands make "
    "the doubles identical in both engines, and floor (not integer "
    "div) keeps NEGATIVE drift portable across the engines' "
    "truncate-vs-floor division semantics.",
)
def q250_snapshot_stat_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    side = F.when(F.col("o_orderkey") % 2 == 0, "old").otherwise("new")
    m = (
        o.select(
            F.lit("o_totalprice").alias("col_name"),
            side.alias("side"),
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias("v"),
        )
        .unionByName(
            o.select(
                F.lit("o_custkey").alias("col_name"),
                side.alias("side"),
                F.col("o_custkey").cast("bigint").alias("v"),
            )
        )
        .unionByName(
            o.select(
                F.lit("o_orderdate_day").alias("col_name"),
                side.alias("side"),
                F.expr(
                    "cast(floor(cast(unix_micros(o_orderdate) as double)"
                    " / 86.4e9) as bigint)"
                ).alias("v"),
            )
        )
    )

    s = m.groupBy("col_name").agg(
        F.count(F.when(F.col("side") == "old", 1)).cast("bigint").alias("n_old"),
        F.count(F.when(F.col("side") == "new", 1)).cast("bigint").alias("n_new"),
        F.countDistinct(F.when(F.col("side") == "old", F.col("v")))
        .cast("bigint")
        .alias("ndv_old"),
        F.countDistinct(F.when(F.col("side") == "new", F.col("v")))
        .cast("bigint")
        .alias("ndv_new"),
        F.min(F.when(F.col("side") == "old", F.col("v"))).cast("bigint").alias("min_old"),
        F.min(F.when(F.col("side") == "new", F.col("v"))).cast("bigint").alias("min_new"),
        F.max(F.when(F.col("side") == "old", F.col("v"))).cast("bigint").alias("max_old"),
        F.max(F.when(F.col("side") == "new", F.col("v"))).cast("bigint").alias("max_new"),
        F.sum(F.when(F.col("side") == "old", F.col("v"))).cast("bigint").alias("sum_old"),
        F.sum(F.when(F.col("side") == "new", F.col("v"))).cast("bigint").alias("sum_new"),
    )
    return s.select(
        "col_name",
        "n_old",
        "n_new",
        "ndv_old",
        "ndv_new",
        "min_old",
        "min_new",
        "max_old",
        "max_new",
        F.expr("cast(floor(cast(sum_old as double) / n_old) as bigint)").alias(
            "mean_old_q"
        ),
        F.expr("cast(floor(cast(sum_new as double) / n_new) as bigint)").alias(
            "mean_new_q"
        ),
        F.expr(
            "cast(floor(cast((ndv_new - ndv_old) * 1000000 as double)"
            " / ndv_old) as bigint)"
        ).alias("ndv_drift_ppm"),
    )


@query(
    "q251_purge_audit",
    """
    WITH f AS (SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
    purged AS (SELECT cast(date_trunc('day', e.ts) AS TIMESTAMP) AS day,
                      e.user_id,
                      coalesce(length(e.props), 0) AS b
               FROM events e JOIN f USING (user_id)),
    kept AS (SELECT e.* FROM events e
             WHERE NOT EXISTS (SELECT 1 FROM f
                               WHERE f.user_id = e.user_id)),
    res AS (SELECT cast(count(*) AS BIGINT) AS n_residual
            FROM kept WHERE user_id % 97 = 0)
    SELECT p.day,
           cast(count(*) AS BIGINT) AS n_rows_purged,
           cast(count(DISTINCT p.user_id) AS BIGINT) AS n_users,
           cast(sum(p.b) AS BIGINT) AS bytes_purged,
           max(res.n_residual) AS n_residual
    FROM purged p CROSS JOIN res
    GROUP BY p.day
    """,
    doc="Right-to-be-forgotten purge audit: given a forget set (users "
    "with id % 97 == 0 standing in for the deletion-request table), "
    "emit the per-day-partition purge manifest (rows, distinct users, "
    "payload bytes to rewrite) AND the post-purge residual count "
    "computed FROM the anti-joined survivor set — proving the purge, "
    "not asserting it (n_residual is 0 by construction only if the "
    "anti-join is correct). The forget set drives a broadcast-able "
    "semi-join for the manifest and an anti-join for the proof — "
    "both map-side against the fact table, no fact-fact shuffle; the "
    "per-day grouping mirrors the physical partition layout so the "
    "manifest translates 1:1 into partition rewrite tasks (the "
    "standard GDPR compaction plan). The residual scalar crosses in "
    "as a 1-row broadcast.",
)
def q251_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = ev.filter(F.col("user_id") % 97 == 0).select("user_id").distinct()
    purged = ev.join(F.broadcast(f), "user_id").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
        F.coalesce(F.length("props"), F.lit(0)).alias("b"),
    )
    kept = ev.join(F.broadcast(f), "user_id", "left_anti")
    res = kept.filter(F.col("user_id") % 97 == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_residual")
    )
    return (
        purged.crossJoin(F.broadcast(res))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows_purged"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum("b").cast("bigint").alias("bytes_purged"),
            F.max("n_residual").alias("n_residual"),
        )
        .select(
            "day", "n_rows_purged", "n_users", "bytes_purged", "n_residual"
        )
    )


@query(
    "q252_approx_quantile_audit",
    """
    WITH n AS (SELECT cast(count(*) AS BIGINT) AS n FROM lineitem)
    SELECT q_label, n.n,
           cast(n.n // 500 + 1 AS BIGINT) AS max_rank_err,
           TRUE AS within_bound
    FROM (VALUES ('p50'), ('p90'), ('p99')) q(q_label) CROSS JOIN n
    """,
    doc="Approximate-quantile error audit: percentile_approx (Spark's "
    "built-in mergeable KLL-style sketch, accuracy=1000) on exact "
    "integer cents, each estimate graded against its CONTRACT — the "
    "exact rank interval of the returned value, computed by one "
    "conditional aggregate (count v < est / count v <= est), must "
    "intersect [target_rank - n/1000, target_rank + n/1000]. The "
    "sketch is the 100 TB path (mergeable partials, no global sort); "
    "the audit is the trust layer that makes it deployable. The "
    "oracle emits the VERDICT contract (the estimate itself is "
    "engine-specific, so the invariant — bound holds, TRUE — is the "
    "cross-engine row, the q114-recall-audit pattern); the Spark "
    "side computes within_bound for real and would hash-mismatch on "
    "any violation.",
)
def q252_approx_quantile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias("v")
    )
    est = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("percentile_approx(v, array(0.5, 0.9, 0.99), 1000)").alias("e"),
    ).select(
        "n",
        F.col("e")[0].alias("e50"),
        F.col("e")[1].alias("e90"),
        F.col("e")[2].alias("e99"),
    )
    ranks = li.crossJoin(F.broadcast(est)).agg(
        F.max("n").alias("n"),
        *[
            F.sum(F.when(F.col("v") < F.col(f"e{p}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"lo{p}")
            for p in (50, 90, 99)
        ],
        *[
            F.sum(F.when(F.col("v") <= F.col(f"e{p}"), 1).otherwise(0))
            .cast("bigint")
            .alias(f"hi{p}")
            for p in (50, 90, 99)
        ],
    )
    rows = []
    for p in (50, 90, 99):
        rows.append(
            ranks.select(
                F.lit(f"p{p}").alias("q_label"),
                F.col("n"),
                F.expr("n div 500 + 1").cast("bigint").alias("max_rank_err"),
                (
                    (F.col(f"lo{p}") <= (F.lit(p) * F.col("n")) / 100 + F.expr("n div 500 + 1"))
                    & (F.col(f"hi{p}") >= (F.lit(p) * F.col("n")) / 100 - F.expr("n div 500 + 1"))
                ).alias("within_bound"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@query(
    "q253_decision_stumps",
    """
    WITH x AS (SELECT cast(label % 2 AS BIGINT) AS y,
                      u.dim, u.v
               FROM (SELECT label,
                            unnest(embedding[1:8]) AS v,
                            unnest(range(1, 9)) AS dim
                     FROM embeddings) u(label, v, dim)),
    b AS (SELECT dim,
                 greatest(least(cast(floor(cast(v AS DOUBLE) * 16)
                                     AS BIGINT), 7), -8) AS bkt,
                 cast(count(*) AS BIGINT) AS n,
                 cast(sum(y) AS BIGINT) AS pos
          FROM x GROUP BY 1, 2),
    c AS (SELECT dim, bkt,
                 sum(n) OVER (PARTITION BY dim ORDER BY bkt) AS n_l,
                 sum(pos) OVER (PARTITION BY dim ORDER BY bkt) AS pos_l
          FROM b),
    t AS (SELECT dim, cast(sum(n) AS BIGINT) AS n_tot,
                 cast(sum(pos) AS BIGINT) AS pos_tot
          FROM b GROUP BY dim),
    s AS (SELECT c.dim, c.bkt AS thresh_bkt,
                 cast(c.n_l AS BIGINT) AS n_left,
                 (c.n_l * c.n_l - c.pos_l * c.pos_l
                  - (c.n_l - c.pos_l) * (c.n_l - c.pos_l)) * 1000000 // c.n_l
               + ((t.n_tot - c.n_l) * (t.n_tot - c.n_l)
                  - (t.pos_tot - c.pos_l) * (t.pos_tot - c.pos_l)
                  - ((t.n_tot - c.n_l) - (t.pos_tot - c.pos_l))
                    * ((t.n_tot - c.n_l) - (t.pos_tot - c.pos_l)))
                 * 1000000 // (t.n_tot - c.n_l) AS wg_q
          FROM c JOIN t USING (dim)
          WHERE c.n_l > 0 AND t.n_tot - c.n_l > 0)
    SELECT cast(dim AS INT) AS dim, cast(thresh_bkt AS BIGINT) AS thresh_bkt,
           n_left, cast(wg_q AS BIGINT) AS wg_q
    FROM s ORDER BY wg_q, dim, thresh_bkt LIMIT 5
    """,
    doc="Distributed decision-stump training (the boosted-trees / data-"
    "slicing primitive): over the first 8 embedding dims, find the "
    "(dim, threshold) axis-aligned split minimizing weighted Gini "
    "impurity against a binary target (label parity). The classic "
    "histogram trick: ONE aggregate collapses the corpus to (dim, "
    "bucket, count, pos) — 16 value buckets per dim — and every "
    "candidate split's left/right class counts come from prefix sums "
    "over that METADATA-SIZED table (per-dim windows over 16 rows), "
    "so split search cost is independent of corpus rows, exactly how "
    "LightGBM-style trainers scale. Gini is cleared of fractions: "
    "n_s*gini_s = (n_s^2 - pos^2 - neg^2)/n_s, quantized x1e6 with "
    "one integer div per side — identical both engines (all operands "
    "positive). float32 bucket edges floor on the exact float->double "
    "widening. Top-5 stumps by the unique (impurity, dim, threshold) "
    "key.",
)
def q253_decision_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    x = em.select(
        (F.col("label") % 2).cast("bigint").alias("y"),
        F.posexplode(F.expr("slice(embedding, 1, 8)")).alias("dim0", "v"),
    ).select("y", (F.col("dim0") + 1).alias("dim"), "v")
    b = x.groupBy(
        "dim",
        F.expr(
            "greatest(least(cast(floor(cast(v as double) * 16) as bigint),"
            " 7), -8)"
        ).alias("bkt"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    w = W.partitionBy("dim").orderBy("bkt")
    c = b.select(
        "dim",
        "bkt",
        F.sum("n").over(w).alias("n_l"),
        F.sum("pos").over(w).alias("pos_l"),
    )
    t = b.groupBy("dim").agg(
        F.sum("n").cast("bigint").alias("n_tot"),
        F.sum("pos").cast("bigint").alias("pos_tot"),
    )
    s = (
        c.join(F.broadcast(t), "dim")
        .filter((F.col("n_l") > 0) & (F.col("n_tot") - F.col("n_l") > 0))
        .select(
            F.col("dim").cast("int").alias("dim"),
            F.col("bkt").cast("bigint").alias("thresh_bkt"),
            F.col("n_l").cast("bigint").alias("n_left"),
            F.expr(
                "(n_l * n_l - pos_l * pos_l"
                " - (n_l - pos_l) * (n_l - pos_l)) * 1000000 div n_l"
                " + ((n_tot - n_l) * (n_tot - n_l)"
                "    - (pos_tot - pos_l) * (pos_tot - pos_l)"
                "    - ((n_tot - n_l) - (pos_tot - pos_l))"
                "      * ((n_tot - n_l) - (pos_tot - pos_l)))"
                "   * 1000000 div (n_tot - n_l)"
            )
            .cast("bigint")
            .alias("wg_q"),
        )
    )
    return s.orderBy("wg_q", "dim", "thresh_bkt").limit(5)


@query(
    "q254_scene_cuts",
    """
    WITH h AS (SELECT doc_id, hex(encode(text)) AS hx FROM documents),
    w AS (SELECT doc_id, i, substr(hx, i * 128 + 1, 128) AS win
          FROM h CROSS JOIN unnest(range(0, least(4, greatest(1,
                   length(hx) // 128)))) AS r(i)),
    e AS (SELECT doc_id, cast(i AS INT) AS seg_idx,
                 cast((list_sum(list_transform(range(1, length(win) // 2 + 1),
                        j -> ('0x' || substr(win, 2 * j - 1, 2))::BIGINT))
                       * 100) // (length(win) // 2) AS BIGINT) AS energy
          FROM w WHERE length(win) > 0),
    d AS (SELECT doc_id, seg_idx, energy,
                 lag(energy) OVER (PARTITION BY doc_id
                                   ORDER BY seg_idx) AS prev
          FROM e)
    SELECT doc_id,
           cast(count(*) AS BIGINT) AS n_frames,
           cast(sum(CASE WHEN prev IS NOT NULL
                          AND abs(energy - prev) >= 200
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
           cast(1 + sum(CASE WHEN prev IS NOT NULL
                              AND abs(energy - prev) >= 200
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_scenes
    FROM d GROUP BY doc_id
    HAVING sum(CASE WHEN prev IS NOT NULL AND abs(energy - prev) >= 200
                    THEN 1 ELSE 0 END) >= 1
    """,
    doc="Video scene-cut detection (shot segmentation for frame-"
    "sampling budgets): adjacent frame-window energy deltas above a "
    "threshold mark cuts; docs report frame/cut/scene counts. "
    "Composes q196's integer energy windows (Arrow mapInPandas — the "
    "real ffmpeg frame-diff swaps in behind the same batch signature) "
    "with a PER-DOCUMENT lag window over frame index — state bounded "
    "by frames-per-doc (the sampling stride), never corpus-scale; "
    "payload bytes never leave their scan partition, only (id, idx, "
    "int) rows shuffle. Exact integer energies make the cut decision "
    "bit-portable; the oracle recomputes the same byte-domain "
    "energies from hex pairs.",
)
def q254_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.multimodal import energy_windows, to_media_table

    docs = _t(spark, sf_dir, "documents")
    media = to_media_table(docs, "doc_id", "text", mime="video/fake")
    e = energy_windows(media).select(
        "doc_id", "seg_idx", F.col("energy_x100").alias("energy")
    )
    w = W.partitionBy("doc_id").orderBy("seg_idx")
    d = e.select(
        "doc_id", "energy", F.lag("energy").over(w).alias("prev")
    )
    cut = F.when(
        F.col("prev").isNotNull() & (F.abs(F.col("energy") - F.col("prev")) >= 200),
        1,
    ).otherwise(0)
    return (
        d.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_frames"),
            F.sum(cut).cast("bigint").alias("n_cuts"),
            (F.lit(1) + F.sum(cut)).cast("bigint").alias("n_scenes"),
        )
        .filter(F.col("n_cuts") >= 1)
    )


@query(
    "q255_holt_linear",
    """
    WITH hr AS (SELECT event_type,
                       cast(floor(cast(epoch_us(ts) AS DOUBLE) / 3.6e9)
                            AS BIGINT) AS h,
                       cast(count(*) AS BIGINT) AS y
                FROM events GROUP BY 1, 2),
    l AS (SELECT event_type, h, y,
                 128 * y
               + 64 * lag(y, 1) OVER w + 32 * lag(y, 2) OVER w
               + 16 * lag(y, 3) OVER w + 8 * lag(y, 4) OVER w
               + 4 * lag(y, 5) OVER w + 2 * lag(y, 6) OVER w
               + lag(y, 7) OVER w AS level_255
          FROM hr
          WINDOW w AS (PARTITION BY event_type ORDER BY h)),
    t AS (SELECT event_type, h, y, level_255,
                 lag(level_255, 1) OVER w AS l1,
                 lag(level_255, 2) OVER w AS l2
          FROM l
          WINDOW w AS (PARTITION BY event_type ORDER BY h)),
    f AS (SELECT event_type, h, y, level_255,
                 level_255 - l1 AS trend_255,
                 2 * l1 - l2 AS forecast_255,
                 abs(255 * y - (2 * l1 - l2)) AS abs_err_255,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY h DESC) AS rn
          FROM t WHERE l2 IS NOT NULL)
    SELECT event_type, h, y,
           cast(level_255 AS BIGINT) AS level_255,
           cast(trend_255 AS BIGINT) AS trend_255,
           cast(forecast_255 AS BIGINT) AS forecast_255,
           cast(abs_err_255 AS BIGINT) AS abs_err_255
    FROM f WHERE rn <= 24
    """,
    doc="Holt-style double exponential smoothing (truncated, alpha = "
    "1/2) per event type on the hourly series: level = the 8-term "
    "geometric lag-chain 128y_t + 64y_(t-1) + ... + y_(t-7) (weights "
    "sum 255 — everything reports in exact 255ths, ZERO divisions "
    "or floats anywhere), trend = level delta, one-step forecast = "
    "2*L_(t-1) - L_(t-2), graded by |255*y - forecast|. The q150 "
    "truncated-EWMA discipline extended to trend+forecast: the "
    "fact table pre-aggregates to one bounded hourly series per key "
    "(map-side combinable), so every window partitions BY KEY over "
    "<= 720 rows — never corpus-scale state; truncation at 8 lags "
    "bounds the kernel exactly (the dropped tail is < 1/256 of the "
    "weight). Row-based lags make gap semantics identical in both "
    "engines. Last 24 hours per key via a bounded per-key rank.",
)
def q255_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hr = (
        ev.select(
            "event_type",
            F.expr(
                "cast(floor(cast(unix_micros(ts) as double) / 3.6e9) as bigint)"
            ).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    w = W.partitionBy("event_type").orderBy("h")
    lvl = hr.select(
        "event_type",
        "h",
        "y",
        (
            F.col("y") * 128
            + F.lag("y", 1).over(w) * 64
            + F.lag("y", 2).over(w) * 32
            + F.lag("y", 3).over(w) * 16
            + F.lag("y", 4).over(w) * 8
            + F.lag("y", 5).over(w) * 4
            + F.lag("y", 6).over(w) * 2
            + F.lag("y", 7).over(w)
        ).alias("level_255"),
    )
    t = lvl.select(
        "event_type",
        "h",
        "y",
        "level_255",
        F.lag("level_255", 1).over(w).alias("l1"),
        F.lag("level_255", 2).over(w).alias("l2"),
    ).filter(F.col("l2").isNotNull())
    f = t.select(
        "event_type",
        "h",
        "y",
        "level_255",
        (F.col("level_255") - F.col("l1")).alias("trend_255"),
        (F.lit(2) * F.col("l1") - F.col("l2")).alias("forecast_255"),
        F.abs(F.lit(255) * F.col("y") - (F.lit(2) * F.col("l1") - F.col("l2"))).alias(
            "abs_err_255"
        ),
        F.row_number()
        .over(W.partitionBy("event_type").orderBy(F.col("h").desc()))
        .alias("rn"),
    )
    return f.filter(F.col("rn") <= 24).select(
        "event_type",
        "h",
        "y",
        F.col("level_255").cast("bigint").alias("level_255"),
        F.col("trend_255").cast("bigint").alias("trend_255"),
        F.col("forecast_255").cast("bigint").alias("forecast_255"),
        F.col("abs_err_255").cast("bigint").alias("abs_err_255"),
    )


@query(
    "q256_ab_sample_size",
    """
    WITH u AS (SELECT event_type,
                      cast(count(DISTINCT user_id) AS BIGINT) AS users
               FROM events GROUP BY 1),
    p AS (SELECT e.event_type,
                 cast(count(DISTINCT e.user_id) AS BIGINT) AS convs
          FROM events e
          WHERE EXISTS (SELECT 1 FROM events b
                        WHERE b.user_id = e.user_id
                          AND b.event_type = 'purchase')
          GROUP BY e.event_type),
    r AS (SELECT u.event_type, u.users, coalesce(p.convs, 0) AS convs,
                 coalesce(p.convs, 0) * 1000000 // u.users AS cvr_ppm
          FROM u LEFT JOIN p USING (event_type)),
    g AS (SELECT cast(sum(convs) * 1000000 // sum(users) AS BIGINT)
                   AS base_ppm
          FROM r)
    SELECT r.event_type, r.users, r.convs,
           cast(r.cvr_ppm AS BIGINT) AS cvr_ppm,
           g.base_ppm,
           cast(r.cvr_ppm - g.base_ppm AS BIGINT) AS delta_ppm,
           cast(CASE WHEN r.cvr_ppm = g.base_ppm THEN NULL
                ELSE (784 * (r.cvr_ppm * (1000000 - r.cvr_ppm)
                             + g.base_ppm * (1000000 - g.base_ppm))
                      + 100 * (r.cvr_ppm - g.base_ppm)
                            * (r.cvr_ppm - g.base_ppm) - 1)
                     // (100 * (r.cvr_ppm - g.base_ppm)
                             * (r.cvr_ppm - g.base_ppm))
                END AS BIGINT) AS n_per_arm
    FROM r CROSS JOIN g
    """,
    doc="A/B test sample-size planner (two-proportion power analysis, "
    "alpha=.05 two-sided, power=.80): per event type, the observed "
    "user-level conversion-to-purchase rate vs the pooled baseline, "
    "and the required users per arm to detect that delta — "
    "n = (z_a + z_b)^2 (p1q1 + p2q2) / delta^2 with (1.96+0.84)^2 = "
    "7.84 carried as the exact rational 784/100, so the whole "
    "formula is bigint arithmetic on ppm-domain proportions with "
    "ceiling division ((a + b - 1) // b) — no float anywhere. "
    "Inputs are two distinct-user aggregates plus a broadcast "
    "1-row baseline; the user-level conversion flag is a semi-join "
    "against the purchase segment (broadcast-able at any scale). "
    "Headroom: 784 * ppm-variance sums cap ~4e14, fine in int64.",
)
def q256_ab_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("users")
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    p = (
        ev.join(F.broadcast(buyers), "user_id")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("convs"))
    )
    r = (
        u.join(p, "event_type", "left")
        .select(
            "event_type",
            "users",
            F.coalesce(F.col("convs"), F.lit(0).cast("bigint")).alias("convs"),
        )
        .select(
            "event_type",
            "users",
            "convs",
            F.expr("convs * 1000000 div users").alias("cvr_ppm"),
        )
    )
    g = r.agg(
        F.expr("cast(sum(convs) * 1000000 div sum(users) as bigint)").alias(
            "base_ppm"
        )
    )
    return r.crossJoin(F.broadcast(g)).select(
        "event_type",
        "users",
        "convs",
        F.col("cvr_ppm").cast("bigint").alias("cvr_ppm"),
        "base_ppm",
        (F.col("cvr_ppm") - F.col("base_ppm")).cast("bigint").alias("delta_ppm"),
        F.expr(
            "cast(CASE WHEN cvr_ppm = base_ppm THEN NULL"
            " ELSE (784 * (cvr_ppm * (1000000 - cvr_ppm)"
            "              + base_ppm * (1000000 - base_ppm))"
            "       + 100 * (cvr_ppm - base_ppm) * (cvr_ppm - base_ppm) - 1)"
            "      div (100 * (cvr_ppm - base_ppm) * (cvr_ppm - base_ppm))"
            " END as bigint)"
        ).alias("n_per_arm"),
    )


_RT_TOKS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"

@query(
    "q257_rare_token_mass",
    f"""
    WITH tok AS (SELECT source, unnest({_RT_TOKS}) AS term FROM documents),
    sc AS (SELECT source, term, cast(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
    gc AS (SELECT term, cast(sum(c) AS BIGINT) AS g FROM sc GROUP BY 1)
    SELECT sc.source,
           cast(sum(sc.c) AS BIGINT) AS n_tokens,
           cast(sum(CASE WHEN gc.g <= 2 THEN sc.c ELSE 0 END) AS BIGINT)
             AS rare_tokens,
           cast(count(DISTINCT CASE WHEN gc.g <= 2 THEN sc.term END)
                AS BIGINT) AS rare_types,
           cast(sum(CASE WHEN gc.g <= 2 THEN sc.c ELSE 0 END) * 1000000
                // sum(sc.c) AS BIGINT) AS rare_mass_ppm
    FROM sc JOIN gc USING (term)
    GROUP BY sc.source
    """,
    doc="Rare-token tail mass per source (hapax/dis-legomena census): "
    "the fraction of a source's token OCCURRENCES carried by terms "
    "seen <= 2 times in the whole corpus — the vocabulary-health "
    "gate that flags OCR noise, mojibake, and boilerplate-stripping "
    "failures before tokenizer training (a healthy corpus holds a "
    "stable Zipf tail; a noisy one bloats it). Two map-side-"
    "combinable aggregates — per-(source, term) counts, then global "
    "term counts as a sum OVER the first (never a second corpus "
    "scan) — and one join keyed on term to label rarity. All exact "
    "integers; ppm by integer div. Pairs with q187's Zipf slope and "
    "q129's Heaps curve as the third vocabulary diagnostic.",
)
def q257_rare_token_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    sc = tok.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    gc = sc.groupBy("term").agg(F.sum("c").cast("bigint").alias("g"))
    j = sc.join(gc, "term")
    return j.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("g") <= 2, F.col("c")).otherwise(0))
        .cast("bigint")
        .alias("rare_tokens"),
        F.countDistinct(F.when(F.col("g") <= 2, F.col("term")))
        .cast("bigint")
        .alias("rare_types"),
        F.expr(
            "sum(CASE WHEN g <= 2 THEN c ELSE 0 END) * 1000000 div sum(c)"
        )
        .cast("bigint")
        .alias("rare_mass_ppm"),
    )


_DT_TOKS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"

@query(
    "q258_distinctive_terms",
    f"""
    WITH tok AS (SELECT source, unnest({_DT_TOKS}) AS term FROM documents),
    sc AS (SELECT source, term, cast(count(*) AS BIGINT) AS y_sw
           FROM tok GROUP BY 1, 2),
    st AS (SELECT source, cast(sum(y_sw) AS BIGINT) AS n_s
           FROM sc GROUP BY 1),
    gt AS (SELECT term, cast(sum(y_sw) AS BIGINT) AS y_w FROM sc GROUP BY 1),
    n AS (SELECT cast(sum(y_sw) AS BIGINT) AS n FROM sc),
    o AS (SELECT sc.source, sc.term, sc.y_sw,
                 (sc.y_sw + 1) * ((n.n - st.n_s) - (gt.y_w - sc.y_sw) + 1)
                   * 1000000
                 // ((st.n_s - sc.y_sw + 1) * (gt.y_w - sc.y_sw + 1))
                   AS or_ppm
          FROM sc JOIN st USING (source) JOIN gt USING (term) CROSS JOIN n
          WHERE sc.y_sw >= 3),
    rk AS (SELECT source, term, y_sw, or_ppm,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY or_ppm DESC, term) AS rn
           FROM o)
    SELECT source, term, y_sw, cast(or_ppm AS BIGINT) AS or_ppm
    FROM rk WHERE rn <= 10
    """,
    doc="Distinctive terms per source (the Fightin'-Words / keyness "
    "census): for each source, the terms most over-represented vs the "
    "REST of the corpus, scored by the Haldane-smoothed odds ratio "
    "(y_sw+1)(rest_neg+1) / ((src_rest+1)(rest_pos+1)) — a 2x2 "
    "contingency per (source, term), every cell derived from ONE "
    "per-(source,term) count table plus its two marginals (source "
    "totals broadcast, term totals term-keyed join) and the 1-row "
    "grand total. The exact-integer odds ratio replaces the usual "
    "log-odds z-score deliberately: rank order on a shared monotone "
    "scale with ZERO libm calls, so the hash gate can't be flipped "
    "by ln() ulp drift on arbitrary arguments. min-count 3 prunes "
    "the smoothing-dominated tail. Per-source top-10 via a window "
    "partitioned BY SOURCE over its vocabulary slice — state bounds "
    "at |vocab per source|, never the corpus.",
)
def q258_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    sc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y_sw"))
    )
    st = sc.groupBy("source").agg(F.sum("y_sw").cast("bigint").alias("n_s"))
    gt = sc.groupBy("term").agg(F.sum("y_sw").cast("bigint").alias("y_w"))
    n = sc.agg(F.sum("y_sw").cast("bigint").alias("n"))
    o = (
        sc.filter(F.col("y_sw") >= 3)
        .join(F.broadcast(st), "source")
        .join(gt, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "source",
            "term",
            "y_sw",
            F.expr(
                "(y_sw + 1) * ((n - n_s) - (y_w - y_sw) + 1) * 1000000"
                " div ((n_s - y_sw + 1) * (y_w - y_sw + 1))"
            ).alias("or_ppm"),
        )
    )
    rk = o.select(
        "source",
        "term",
        "y_sw",
        "or_ppm",
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.col("or_ppm").desc(), "term"))
        .alias("rn"),
    )
    return rk.filter(F.col("rn") <= 10).select(
        "source", "term", "y_sw", F.col("or_ppm").cast("bigint").alias("or_ppm")
    )


@query(
    "q259_powerlaw_alpha",
    """
    WITH ps AS (SELECT DISTINCT l_suppkey AS supp, l_partkey AS part
                FROM lineitem),
    deg AS (SELECT supp, cast(count(*) AS BIGINT) AS d FROM ps GROUP BY supp),
    f AS (SELECT d FROM deg WHERE d >= 2),
    s AS (SELECT cast(count(*) AS BIGINT) AS n_tail,
                 cast(sum(cast(floor(ln(d::DOUBLE / 2.0) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS sum_ln_q
          FROM f),
    hist AS (SELECT d AS degree, cast(count(*) AS BIGINT) AS n_nodes
             FROM deg GROUP BY d)
    SELECT hist.degree, hist.n_nodes, s.n_tail,
           cast(CASE WHEN s.sum_ln_q > 0
                THEN 1000000 + (s.n_tail * 1000000000000) // s.sum_ln_q
                ELSE NULL END AS BIGINT) AS alpha_ppm
    FROM hist CROSS JOIN s
    ORDER BY hist.degree
    """,
    doc="Degree-distribution census + discrete power-law exponent "
    "(Clauset-Shalizi-Newman MLE, alpha = 1 + n / sum ln(d/dmin), "
    "dmin = 2) for the supplier side of the co-supply graph — the "
    "heavy-tail diagnostic that decides whether degree-capped "
    "blocking (q222) or skew salting (q58) is needed before any "
    "pair fan-out. The degree table is one distinct + one count "
    "aggregate; the MLE folds it to a 1-row sum. ln() appears only "
    "on SMALL-INTEGER ratios d/2 (one constant per distinct degree, "
    "each quantized floor(x*1e6 + 0.5) — the q222 ulp-safe-constant "
    "argument), and alpha quantizes by integer division of exact "
    "sums. Histogram rows carry the scalar alpha alongside (1-row "
    "cross join) so one result table serves both the plot and the "
    "fitted exponent.",
)
def q259_powerlaw_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_suppkey").alias("supp"), F.col("l_partkey").alias("part")
    ).distinct()
    deg = ps.groupBy("supp").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    s = deg.filter(F.col("d") >= 2).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        F.sum(
            F.expr(
                "cast(floor(ln(cast(d as double) / 2.0) * 1000000 + 0.5)"
                " as bigint)"
            )
        )
        .cast("bigint")
        .alias("sum_ln_q"),
    )
    hist = deg.groupBy(F.col("d").alias("degree")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    return (
        hist.crossJoin(F.broadcast(s))
        .select(
            "degree",
            "n_nodes",
            "n_tail",
            F.expr(
                "cast(CASE WHEN sum_ln_q > 0"
                " THEN 1000000 + (n_tail * 1000000000000) div sum_ln_q"
                " ELSE NULL END as bigint)"
            ).alias("alpha_ppm"),
        )
        .orderBy("degree")
    )


@query(
    "q260_burstiness_fano",
    """
    WITH hr AS (SELECT event_type,
                       cast(floor(cast(epoch_us(ts) AS DOUBLE) / 3.6e9)
                            AS BIGINT) AS h,
                       cast(count(*) AS BIGINT) AS y
                FROM events GROUP BY 1, 2),
    s AS (SELECT event_type,
                 cast(count(*) AS BIGINT) AS n,
                 cast(sum(y) AS BIGINT) AS sy,
                 cast(sum(y * y) AS BIGINT) AS syy
          FROM hr GROUP BY 1)
    SELECT event_type, n, sy AS total_events,
           cast(sy // n AS BIGINT) AS mean_per_hour,
           cast((n * syy - sy * sy) * 1000000 // ((n - 1) * sy)
                AS BIGINT) AS fano_x1e6
    FROM s WHERE n > 1 AND sy > 0
    """,
    doc="Burstiness census (Fano factor, variance-to-mean ratio of the "
    "hourly arrival counts) per event type: ~1e6 means Poisson-like "
    "arrivals, >>1e6 means bursts — the dispersion gate that decides "
    "whether a stream needs burst-aware rate limiting (q117) or "
    "plain token buckets. Fano = [(n*syy - sy^2)/(n(n-1))] / (sy/n) "
    "= (n*syy - sy^2) / ((n-1)*sy), computed here x1e6 entirely in "
    "exact int64 from the three mergeable power sums (n, sum y, "
    "sum y^2) over the pre-aggregated hourly series — two map-side-"
    "combinable aggregates total, no window, no float. The hourly "
    "pre-aggregation bounds the power-sum table at |keys| x |hours| "
    "regardless of corpus rows.",
)
def q260_burstiness_fano(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hr = (
        ev.select(
            "event_type",
            F.expr(
                "cast(floor(cast(unix_micros(ts) as double) / 3.6e9) as bigint)"
            ).alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    s = hr.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return s.filter((F.col("n") > 1) & (F.col("sy") > 0)).select(
        "event_type",
        "n",
        F.col("sy").alias("total_events"),
        F.expr("sy div n").cast("bigint").alias("mean_per_hour"),
        F.expr("(n * syy - sy * sy) * 1000000 div ((n - 1) * sy)")
        .cast("bigint")
        .alias("fano_x1e6"),
    )


_PW_TOKS = r"len(list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> ''))"

@query(
    "q261_padding_waste",
    f"""
    WITH n AS (SELECT greatest({_PW_TOKS}, 1) AS nt FROM documents),
    spine AS (SELECT p, (1::BIGINT << p) AS lo,
                     CASE WHEN p = 16 THEN 9223372036854775807
                          ELSE (1::BIGINT << (p + 1)) END AS hi
              FROM (SELECT unnest(range(0, 17)) AS p)),
    t AS (SELECT cap FROM (VALUES (512), (1024), (2048)) v(cap)),
    b AS (SELECT t.cap, spine.p AS len_bucket, n.nt,
                 ((n.nt + t.cap - 1) // t.cap) * t.cap - n.nt AS waste
          FROM n JOIN spine ON n.nt >= spine.lo AND n.nt < spine.hi
                 CROSS JOIN t)
    SELECT cap, cast(len_bucket AS INT) AS len_bucket,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(nt) AS BIGINT) AS total_tokens,
           cast(sum(waste) AS BIGINT) AS pad_tokens,
           cast(sum(waste) * 1000000 // (sum(nt) + sum(waste)) AS BIGINT)
             AS waste_ppm
    FROM b GROUP BY cap, len_bucket
    """,
    doc="Sequence-length planning census (padding-waste audit): for "
    "each candidate context length (512/1024/2048) and each power-of-"
    "two document-length bucket, the exact tokens wasted by naive "
    "pad-to-multiple batching — ceil(n/cap)*cap - n — as count and "
    "ppm of the padded stream. This is the sizing study run before "
    "choosing q84's packing parameters: buckets with high waste_ppm "
    "are where concat-and-chunk packing pays. The length bucket "
    "comes from a BROADCAST 17-row power-of-two spine (range join "
    "on [2^p, 2^(p+1)) — exact integers, no log2() ulp risk; the "
    "TOP bucket p=16 is clamped open-ended to max-bigint so "
    "documents past 131071 tokens land in it instead of silently "
    "dropping out of the census), the 3 caps from a broadcast "
    "VALUES spine; one scan, one hash aggregate on the (cap, "
    "bucket) key, everything else map-side.",
)
def q261_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import token_count

    docs = _t(spark, sf_dir, "documents")
    n = docs.select(
        F.greatest(token_count(F.col("text")), F.lit(1)).cast("bigint").alias("nt")
    )
    spine = spark.range(0, 17).select(
        F.col("id").cast("int").alias("p"),
        F.expr("shiftleft(cast(1 as bigint), cast(id as int))").alias("lo"),
        F.expr(
            "case when id = 16 then 9223372036854775807"
            " else shiftleft(cast(1 as bigint), cast(id as int) + 1) end"
        ).alias("hi"),
    )
    caps = spark.range(1).select(
        F.explode(F.array(F.lit(512), F.lit(1024), F.lit(2048))).alias("cap")
    )
    b = (
        n.join(
            F.broadcast(spine),
            (F.col("nt") >= F.col("lo")) & (F.col("nt") < F.col("hi")),
        )
        .crossJoin(F.broadcast(caps))
        .select(
            "cap",
            F.col("p").alias("len_bucket"),
            "nt",
            F.expr("((nt + cap - 1) div cap) * cap - nt").alias("waste"),
        )
    )
    return b.groupBy("cap", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("total_tokens"),
        F.sum("waste").cast("bigint").alias("pad_tokens"),
        F.expr("sum(waste) * 1000000 div (sum(nt) + sum(waste))")
        .cast("bigint")
        .alias("waste_ppm"),
    )


@query(
    "q262_gate_ablation",
    r"""
    WITH g AS (SELECT
        CASE WHEN len(list_filter(string_split_regex(lower(trim(text)),
                  '\s+'), x -> x <> '')) < 10 THEN 1 ELSE 0 END AS g_short,
        CASE WHEN lang <> 'en' THEN 1 ELSE 0 END AS g_lang,
        CASE WHEN 2 * len(list_distinct(list_filter(string_split_regex(
                  lower(trim(text)), '\s+'), x -> x <> '')))
                < len(list_filter(string_split_regex(lower(trim(text)),
                  '\s+'), x -> x <> '')) THEN 1 ELSE 0 END AS g_rep,
        CASE WHEN 5 * length(regexp_replace(text, '[^0-9]', '', 'g'))
                > length(text) THEN 1 ELSE 0 END AS g_digit
      FROM documents)
    SELECT cast(g_short + 2 * g_lang + 4 * g_rep + 8 * g_digit AS INT)
             AS mask,
           cast(g_short AS INT) AS g_short, cast(g_lang AS INT) AS g_lang,
           cast(g_rep AS INT) AS g_rep, cast(g_digit AS INT) AS g_digit,
           cast(count(*) AS BIGINT) AS n_docs
    FROM g GROUP BY 1, 2, 3, 4, 5
    """,
    doc="Quality-gate ablation census: every document evaluates all "
    "four cleaning gates (too-short < 10 tokens, non-English, "
    "repetitive 2*distinct < total tokens, digit-heavy > 20%) and "
    "lands in one of 16 bitmask cells — the overlap matrix that "
    "answers 'which gate uniquely kills what' (mask = single bit) "
    "and 'what do gates agree on' (multi-bit masks) before anyone "
    "tunes thresholds. ONE scan, one hash aggregate on a 16-value "
    "key — the gates are flag columns, not filters, so the ablation "
    "needs no per-gate re-scan (the naive 2^4-subset study is 16 "
    "scans; this is one). All gates are exact integer decisions "
    "(token counts, char counts) — no float threshold can disagree "
    "across engines.",
)
def q262_gate_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import tokens

    docs = _t(spark, sf_dir, "documents")
    tk = tokens(F.col("text"))
    g = docs.select(
        F.when(F.size(tk) < 10, 1).otherwise(0).alias("g_short"),
        F.when(F.col("lang") != "en", 1).otherwise(0).alias("g_lang"),
        F.when(2 * F.size(F.array_distinct(tk)) < F.size(tk), 1)
        .otherwise(0)
        .alias("g_rep"),
        F.when(
            5 * F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
            > F.length(F.col("text")),
            1,
        )
        .otherwise(0)
        .alias("g_digit"),
    )
    return (
        g.groupBy(
            (
                F.col("g_short")
                + 2 * F.col("g_lang")
                + 4 * F.col("g_rep")
                + 8 * F.col("g_digit")
            )
            .cast("int")
            .alias("mask"),
            F.col("g_short").cast("int").alias("g_short"),
            F.col("g_lang").cast("int").alias("g_lang"),
            F.col("g_rep").cast("int").alias("g_rep"),
            F.col("g_digit").cast("int").alias("g_digit"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )


@query(
    "q263_dp_quantile",
    """
    WITH b AS (SELECT least(cast(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                            // 1000000, 63) AS bin,
                      cast(count(*) AS BIGINT) AS n
               FROM orders GROUP BY 1),
    spine AS (SELECT unnest(range(0, 64)) AS bin),
    f AS (SELECT spine.bin, coalesce(b.n, 0) AS n
          FROM spine LEFT JOIN b ON spine.bin = b.bin),
    c AS (SELECT bin, n,
                 sum(n) OVER (ORDER BY bin) AS cum,
                 sum(n) OVER () AS tot
          FROM f),
    s AS (SELECT bin, n,
                 -abs(2 * cum - tot) * 250000 AS u_q,
                 cast(floor(-ln(-ln(
                     (('0x' || substr(md5('dpq:' || cast(bin AS VARCHAR)),
                                      1, 13))::BIGINT + 0.5)
                     / 4503599627370496.0)) * 1000000) AS BIGINT) AS g_q
          FROM c)
    SELECT cast(bin AS BIGINT) AS chosen_bin,
           cast(bin * 1000000 + 500000 AS BIGINT) AS released_cents,
           cast(n AS BIGINT) AS bin_count_true
    FROM s ORDER BY u_q + g_q DESC, bin LIMIT 1
    """,
    doc="Differentially-private median release (exponential mechanism, "
    "McSherry-Talwar; eps = 1): the order-value median is released as "
    "a bin of a FIXED public 64-bin histogram ($10k cents bins — "
    "data-independent bins are part of the DP contract), where each "
    "bin's utility is -|rank_below - rank_above| (sensitivity 2) and "
    "selection adds md5-seeded Gumbel noise (the Gumbel-max trick IS "
    "the exponential mechanism), seeded per bin like q190 so retries "
    "and speculative tasks cannot re-draw. The corpus collapses to a "
    "64-row histogram in one aggregate; utilities are exact integers "
    "x250000 (eps*u/2 scaled 1e6), the noise quantizes floor(x*1e6) "
    "from a dyadic-exact uniform, and argmax is ORDER BY the integer "
    "sum with a bin tiebreak. The prefix/total windows run on the "
    "64-row metadata table — the same by-design exclusion as q220's "
    "digit spine. Output: chosen bin, released midpoint, true count "
    "(demo column; production publishes only the release).",
)
def q263_dp_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    b = o.select(
        F.least(
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) div 1000000"),
            F.lit(63).cast("bigint"),
        ).alias("bin")
    ).groupBy("bin").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    spine = spark.range(0, 64).select(F.col("id").cast("bigint").alias("bin"))
    f = spine.join(b, "bin", "left").select(
        "bin", F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n")
    )
    c = f.select(
        "bin",
        "n",
        F.sum("n").over(W.orderBy("bin")).alias("cum"),
        F.sum("n").over(W.partitionBy()).alias("tot"),
    )
    s = c.select(
        "bin",
        "n",
        (-F.abs(2 * F.col("cum") - F.col("tot")) * 250000).alias("u_q"),
        F.expr(
            "cast(floor(-ln(-ln("
            " (conv(substr(md5('dpq:' || cast(bin as string)), 1, 13), 16, 10)"
            "  + 0.5) / 4503599627370496.0)) * 1000000) as bigint)"
        ).alias("g_q"),
    )
    return (
        s.orderBy((F.col("u_q") + F.col("g_q")).desc(), "bin")
        .limit(1)
        .select(
            F.col("bin").cast("bigint").alias("chosen_bin"),
            (F.col("bin") * 1000000 + 500000).cast("bigint").alias(
                "released_cents"
            ),
            F.col("n").cast("bigint").alias("bin_count_true"),
        )
    )


def _q264_oracle() -> str:
    values = ",\n                 ".join(f"({i}, {a}, {b})" for i, a, b in _MH64)
    return f"""
    WITH g AS (SELECT DISTINCT doc_id, g FROM (
                 SELECT doc_id, unnest(list_distinct({_NGRAMS(3)})) AS g
                 FROM documents)),
    h0 AS (SELECT doc_id,
                  ('0x' || substr(md5(g), 1, 12))::BIGINT % {_MH_P} AS h0
           FROM g),
    e AS (SELECT doc_id, i, (a * h0 + b) % {_MH_P} AS h
          FROM h0 CROSS JOIN (VALUES {values}) AS t(i, a, b)),
    sig AS (SELECT doc_id, i, min(h) AS h FROM e GROUP BY doc_id, i),
    cfg AS (SELECT * FROM (VALUES (16, 4), (8, 8), (4, 16)) c(nb, r)),
    bk AS (SELECT cfg.nb, cfg.r, sig.doc_id, sig.i // cfg.r AS band,
                  md5(string_agg(cast(sig.h AS VARCHAR), ','
                                 ORDER BY sig.i)) AS bsig
           FROM sig CROSS JOIN cfg
           GROUP BY cfg.nb, cfg.r, sig.doc_id, sig.i // cfg.r),
    pr AS (SELECT DISTINCT a.nb, a.r, a.doc_id AS d1, b.doc_id AS d2
           FROM bk a JOIN bk b
             ON a.nb = b.nb AND a.band = b.band AND a.bsig = b.bsig
            AND a.doc_id < b.doc_id)
    SELECT cfg.nb AS n_bands, cfg.r AS rows_per_band,
           cast(floor(pow(1.0 / cfg.nb, 1.0 / cfg.r) * 1000000 + 0.5)
                AS BIGINT) AS s_curve_threshold_ppm,
           cast(coalesce(p.n, 0) AS BIGINT) AS n_candidate_pairs
    FROM cfg LEFT JOIN (SELECT nb, r, cast(count(*) AS BIGINT) AS n
                        FROM pr GROUP BY 1, 2) p USING (nb, r)
    """


@query(
    "q264_lsh_tuning",
    None,  # oracle composed below (embeds the 64 hardcoded seeds)
    doc="MinHash-LSH banding-parameter tuning curve: the SAME 64-lane "
    "signature table (q234's one-md5-per-shingle multiply-mod family) "
    "evaluated under three bandings (16x4, 8x8, 4x16), reporting each "
    "config's s-curve threshold (1/b)^(1/r) and its ACTUAL distinct "
    "candidate-pair volume on this corpus — the two numbers that "
    "price recall vs join cost before a production dedup run (q42 "
    "fixes one banding; this is how that banding gets chosen). Band "
    "signatures are md5 over the in-band lane values in lane order "
    "(order-deterministic agg), so bucket keys are portable; pair "
    "volume per config is bounded by band-bucket sizes exactly as in "
    "q42, and the signature table is |docs|x64 rows — built once, "
    "shared by all three configs via one explode. The threshold "
    "constants come from pow() on 3 fixed rationals (ulp-safe "
    "constant set, the q222 argument).",
)
def q264_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    g = (
        spread(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias(
                "g"
            ),
        )
        .distinct()
    )
    h0 = g.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("g"), 1, 12), 16, 10).cast("bigint")
            % _MH_P
        ).alias("h0"),
    )
    # one signature-ARRAY row per doc: the 64 lane minima computed as 64
    # map-side-combinable min() aggregates in ONE groupBy — the lane
    # table is never exploded (the explode-then-min spelling shuffles
    # |doc,gram| x 64 rows and measured 14 s at sf0.1; this shuffles 64
    # partial minima per doc per map task)
    arr = (
        h0.groupBy("doc_id")
        .agg(
            *[
                F.min((F.lit(a) * F.col("h0") + F.lit(b)) % _MH_P).alias(
                    f"h{i}"
                )
                for i, a, b in _MH64
            ]
        )
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i, _, _ in _MH64]).alias("hs"),
        )
        .localCheckpoint()
    )
    parts = []
    for nb, r in ((16, 4), (8, 8), (4, 16)):
        parts.append(
            arr.select(
                F.lit(nb).alias("nb"),
                F.lit(r).alias("r"),
                "doc_id",
                F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("band"),
                "hs",
            ).select(
                "nb",
                "r",
                "doc_id",
                "band",
                F.md5(
                    F.array_join(
                        F.expr(
                            f"transform(slice(hs, band * {r} + 1, {r}),"
                            " x -> cast(x as string))"
                        ),
                        ",",
                    )
                ).alias("bsig"),
            )
        )
    bk = parts[0].unionByName(parts[1]).unionByName(parts[2])
    a = bk.select("nb", "r", "band", "bsig", F.col("doc_id").alias("d1"))
    b = bk.select("nb", "r", "band", "bsig", F.col("doc_id").alias("d2"))
    pr = (
        a.join(b, ["nb", "r", "band", "bsig"])
        .filter(F.col("d1") < F.col("d2"))
        .select("nb", "r", "d1", "d2")
        .distinct()
    )
    p = pr.groupBy("nb", "r").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cfg = spark.range(1).select(
        F.explode(
            F.array(
                F.struct(F.lit(16).alias("nb"), F.lit(4).alias("r")),
                F.struct(F.lit(8).alias("nb"), F.lit(8).alias("r")),
                F.struct(F.lit(4).alias("nb"), F.lit(16).alias("r")),
            )
        ).alias("c")
    ).select("c.nb", "c.r")
    return (
        cfg.join(p, ["nb", "r"], "left")
        .select(
            F.col("nb").alias("n_bands"),
            F.col("r").alias("rows_per_band"),
            F.expr(
                "cast(floor(pow(1.0 / nb, 1.0 / r) * 1000000 + 0.5) as bigint)"
            ).alias("s_curve_threshold_ppm"),
            F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias(
                "n_candidate_pairs"
            ),
        )
    )


REGISTRY["q264_lsh_tuning"] = QueryDef(
    fn=REGISTRY["q264_lsh_tuning"].fn,
    oracle=_q264_oracle(),
    doc=REGISTRY["q264_lsh_tuning"].doc,
)


@query(
    "q265_join_fanout_guard",
    """
    WITH lc AS (SELECT l_orderkey AS k, cast(count(*) AS BIGINT) AS c
                FROM lineitem GROUP BY 1),
    oc AS (SELECT o_orderkey AS k, cast(count(*) AS BIGINT) AS c
           FROM orders GROUP BY 1),
    j AS (SELECT coalesce(lc.k, oc.k) AS k,
                 coalesce(lc.c, 0) AS cl, coalesce(oc.c, 0) AS co
          FROM lc FULL OUTER JOIN oc ON lc.k = oc.k)
    SELECT 'orders*lineitem' AS join_name,
           cast(max(cl) AS BIGINT) AS max_left_fanout,
           cast(max(co) AS BIGINT) AS max_right_fanout,
           cast(sum(cl * co) AS BIGINT) AS predicted_rows,
           cast(sum(CASE WHEN cl > 0 AND co = 0 THEN cl ELSE 0 END)
                AS BIGINT) AS left_orphan_rows,
           cast(sum(CASE WHEN co > 0 AND cl = 0 THEN co ELSE 0 END)
                AS BIGINT) AS right_orphan_rows
    FROM j
    """,
    doc="Join fan-out guard (exact CBO primitive): before shipping an "
    "orders-lineitem join, the per-key multiplicity profile of both "
    "sides — max fan-out per side, EXACT predicted output cardinality "
    "sum(c_left * c_right), and orphan volume each way — the numbers "
    "that catch an accidental many-to-many (a duplicated key turns a "
    "join into a cross product; this report prices it before the "
    "shuffle runs). Two count aggregates + one full-outer merge on "
    "the key profile tables — each |keys| rows, the minimal "
    "sufficient statistic; the q212 HLL estimate is the sketch "
    "version of exactly this. All exact integers.",
)
def q265_join_fanout_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lc = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cl")
    )
    oc = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("co")
    )
    j = lc.join(oc, "k", "full_outer").select(
        F.coalesce(F.col("cl"), F.lit(0).cast("bigint")).alias("cl"),
        F.coalesce(F.col("co"), F.lit(0).cast("bigint")).alias("co"),
    )
    agg = j.agg(
        F.max("cl").cast("bigint").alias("max_left_fanout"),
        F.max("co").cast("bigint").alias("max_right_fanout"),
        F.sum(F.col("cl") * F.col("co")).cast("bigint").alias("predicted_rows"),
        F.sum(F.when((F.col("cl") > 0) & (F.col("co") == 0), F.col("cl")).otherwise(0))
        .cast("bigint")
        .alias("left_orphan_rows"),
        F.sum(F.when((F.col("co") > 0) & (F.col("cl") == 0), F.col("co")).otherwise(0))
        .cast("bigint")
        .alias("right_orphan_rows"),
    )
    return agg.select(
        F.lit("orders*lineitem").alias("join_name"),
        "max_left_fanout",
        "max_right_fanout",
        "predicted_rows",
        "left_orphan_rows",
        "right_orphan_rows",
    )


@query(
    "q266_purge_cascade",
    """
    WITH f AS (SELECT c_custkey, c_nationkey FROM customer
               WHERE c_custkey % 199 = 0),
    fo AS (SELECT o.o_orderkey, f.c_nationkey
           FROM orders o JOIN f ON o.o_custkey = f.c_custkey),
    fl AS (SELECT fo.c_nationkey, cast(count(*) AS BIGINT) AS n_lineitems
           FROM lineitem l JOIN fo ON l.l_orderkey = fo.o_orderkey
           GROUP BY 1),
    oc AS (SELECT c_nationkey, cast(count(*) AS BIGINT) AS n_orders
           FROM fo GROUP BY 1),
    cc AS (SELECT c_nationkey, cast(count(*) AS BIGINT) AS n_customers
           FROM f GROUP BY 1)
    SELECT n.n_name AS nation,
           cc.n_customers,
           coalesce(oc.n_orders, 0) AS n_orders,
           coalesce(fl.n_lineitems, 0) AS n_lineitems
    FROM cc
    JOIN nation n ON cc.c_nationkey = n.n_nationkey
    LEFT JOIN oc USING (c_nationkey)
    LEFT JOIN fl USING (c_nationkey)
    """,
    doc="Referential purge-cascade manifest (the multi-table GDPR "
    "plan): a forget-set of customers fans out through the FK chain "
    "customer -> orders -> lineitem, and the manifest reports rows "
    "to delete per table per nation BEFORE any rewrite runs — the "
    "cost estimate that schedules cascade deletes table-by-table. "
    "The forget set drives broadcast-able semi-joins down the chain "
    "(each fact table is scanned once, filtered map-side against the "
    "keys inherited from the previous hop); grouping rides the "
    "nation key carried from the root, so no fact-fact shuffle "
    "exists anywhere. Complements q251 (single-table manifest + "
    "residual proof) with the FK-transitive closure.",
)
def q266_purge_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    na = _t(spark, sf_dir, "nation")
    f = cu.filter(F.col("c_custkey") % 199 == 0).select(
        "c_custkey", "c_nationkey"
    )
    fo = o.join(
        F.broadcast(f), o["o_custkey"] == f["c_custkey"]
    ).select("o_orderkey", "c_nationkey")
    fl = (
        li.join(F.broadcast(fo), li["l_orderkey"] == fo["o_orderkey"])
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_lineitems"))
    )
    oc = fo.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders")
    )
    cc = f.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    )
    return (
        cc.join(F.broadcast(na), cc["c_nationkey"] == na["n_nationkey"])
        .join(oc, "c_nationkey", "left")
        .join(fl, "c_nationkey", "left")
        .select(
            F.col("n_name").alias("nation"),
            "n_customers",
            F.coalesce(F.col("n_orders"), F.lit(0).cast("bigint")).alias(
                "n_orders"
            ),
            F.coalesce(F.col("n_lineitems"), F.lit(0).cast("bigint")).alias(
                "n_lineitems"
            ),
        )
    )


_DC_TOKS = r"list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '')"

@query(
    "q267_dup_cluster_census",
    f"""
    WITH k AS (SELECT md5(array_to_string(list_sort(list_distinct(
                   {_DC_TOKS})), ' ')) AS content_key,
                      length(text) AS b
               FROM documents),
    c AS (SELECT content_key,
                 cast(count(*) AS BIGINT) AS sz,
                 cast(sum(b) AS BIGINT) AS bytes_total,
                 cast(min(b) AS BIGINT) AS bytes_keep
          FROM k GROUP BY content_key),
    h AS (SELECT sz AS cluster_size,
                 cast(count(*) AS BIGINT) AS n_clusters,
                 cast(sum(sz) AS BIGINT) AS n_docs,
                 cast(sum(bytes_total - bytes_keep) AS BIGINT)
                   AS bytes_saved
          FROM c GROUP BY sz)
    SELECT cluster_size, n_clusters, n_docs, bytes_saved
    FROM h
    """,
    doc="Duplicate-cluster size census + dedup savings forecast: "
    "documents group by their bag-of-words fingerprint (q45's "
    "content key), and the histogram of cluster sizes prices a "
    "keep-one dedup BEFORE it runs — docs removed = sum over "
    "clusters of (size-1), bytes saved = cluster bytes minus the "
    "kept (smallest) copy. Two hash aggregates end to end: "
    "fingerprint -> cluster stats -> size histogram, every stage "
    "map-side combinable, no window, no pair join — the census is "
    "O(corpus) however skewed the dup distribution. The keep-one "
    "policy (min bytes) is deterministic so the forecast is exact, "
    "not an estimate; cross-check q40 (exact dedup) executes what "
    "this query budgets.",
)
def q267_dup_cluster_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import fingerprint

    docs = _t(spark, sf_dir, "documents")
    k = docs.select(
        fingerprint(F.col("text")).alias("content_key"),
        F.length("text").cast("bigint").alias("b"),
    )
    c = k.groupBy("content_key").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz"),
        F.sum("b").cast("bigint").alias("bytes_total"),
        F.min("b").cast("bigint").alias("bytes_keep"),
    )
    return (
        c.groupBy(F.col("sz").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.col("bytes_total") - F.col("bytes_keep"))
            .cast("bigint")
            .alias("bytes_saved"),
        )
    )


@query(
    "q268_embedding_norm_gate",
    """
    WITH q AS (SELECT vec_id, label,
                      cast(list_sum(list_transform(embedding,
                           x -> cast(floor(cast(x AS DOUBLE) * 10000)
                                     AS BIGINT)
                                * cast(floor(cast(x AS DOUBLE) * 10000)
                                       AS BIGINT)))
                           AS BIGINT) AS n2
               FROM embeddings),
    s AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(n2) AS BIGINT) AS s1,
                 cast(sum((n2 // 1000) * (n2 // 1000)) AS BIGINT) AS s2m
          FROM q)
    SELECT q.label,
           cast(count(*) AS BIGINT) AS n_vecs,
           cast(sum(CASE WHEN
                  (abs(q.n2 - s.s1 // s.n) // 1000)
                  * (abs(q.n2 - s.s1 // s.n) // 1000)
                  > 9 * (s.s2m // s.n
                         - (s.s1 // s.n // 1000) * (s.s1 // s.n // 1000))
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           cast(min(q.n2) AS BIGINT) AS min_n2,
           cast(max(q.n2) AS BIGINT) AS max_n2,
           cast(max(s.s1 // s.n) AS BIGINT) AS mean_n2
    FROM q CROSS JOIN s
    GROUP BY q.label
    """,
    doc="Embedding-norm hygiene gate: vectors whose squared-norm "
    "z-score exceeds 3 (dead embeddings near zero, exploding ones "
    "from a bad encoder batch) — the sanity filter run before any "
    "ANN build or centroid fit trusts the vectors. Norms live in "
    "the exact integer domain (floor(x*1e4) per coordinate, summed "
    "squares in int64); mean and variance come from ONE power-sum "
    "aggregate broadcast back as a single row, and the z^2 > 9 "
    "decision is pure integer arithmetic. Headroom: values are scaled "
    "BEFORE squaring ((n2 div 1000)^2, never n2*n2 div 1e6, which "
    "overflows int64 once n2 > ~3e9, i.e. unquantized norm ~5.5 — "
    "common for unnormalized encoders). With the pre-scaled spelling "
    "the per-row bound is n2 <= ~3e12 (|x| <= ~21 per coordinate at "
    "64 dims) and the s2m sum holds to ~1e6 such rows per 9.2e18 of "
    "int64 range; abs() precedes every integer divide so Spark's "
    "truncate-toward-zero div and DuckDB's flooring // agree on "
    "negative deviations. One scan + one broadcast — no second pass, "
    "no window.",
)
def q268_embedding_norm_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = _t(spark, sf_dir, "embeddings")
    q = em.select(
        "vec_id",
        "label",
        F.expr(
            "cast(aggregate(embedding, cast(0 as bigint),"
            " (acc, x) -> acc"
            "   + cast(floor(cast(x as double) * 10000) as bigint)"
            "   * cast(floor(cast(x as double) * 10000) as bigint))"
            " as bigint)"
        ).alias("n2"),
    )
    s = q.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("n2").cast("bigint").alias("s1"),
        F.sum(F.expr("(n2 div 1000) * (n2 div 1000)"))
        .cast("bigint")
        .alias("s2m"),
    )
    j = q.crossJoin(F.broadcast(s))
    z2 = F.expr(
        "CASE WHEN (abs(n2 - s1 div n) div 1000)"
        " * (abs(n2 - s1 div n) div 1000)"
        " > 9 * (s2m div n - (s1 div n div 1000) * (s1 div n div 1000))"
        " THEN 1 ELSE 0 END"
    )
    return j.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum(z2).cast("bigint").alias("n_outliers"),
        F.min("n2").cast("bigint").alias("min_n2"),
        F.max("n2").cast("bigint").alias("max_n2"),
        F.max(F.expr("s1 div n")).cast("bigint").alias("mean_n2"),
    )


@query(
    "q269_simpson_detector",
    """
    WITH c AS (SELECT c_custkey, c_nationkey FROM customer),
    o AS (SELECT o_orderpriority AS grp, c.c_nationkey AS stratum,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders JOIN c ON o_custkey = c_custkey),
    cell AS (SELECT grp, stratum,
                    cast(count(*) AS BIGINT) AS n,
                    cast(sum(y) AS BIGINT) AS pos
             FROM o GROUP BY 1, 2),
    pooled AS (SELECT grp,
                      cast(sum(pos) * 1000000 // sum(n) AS BIGINT) AS rate
               FROM cell GROUP BY 1),
    base AS (SELECT cast(sum(pos) * 1000000 // sum(n) AS BIGINT) AS rate
             FROM cell),
    strat_base AS (SELECT stratum,
                          cast(sum(pos) * 1000000 // sum(n) AS BIGINT)
                            AS rate
                   FROM cell GROUP BY 1),
    sgn AS (SELECT cell.grp, cell.stratum,
                   CASE WHEN cell.pos * 1000000 // cell.n
                             > strat_base.rate THEN 1
                        WHEN cell.pos * 1000000 // cell.n
                             < strat_base.rate THEN -1
                        ELSE 0 END AS s
            FROM cell JOIN strat_base USING (stratum)
            WHERE cell.n >= 20),
    agg AS (SELECT grp,
                   cast(sum(CASE WHEN s > 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_up,
                   cast(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_down
            FROM sgn GROUP BY 1)
    SELECT p.grp, p.rate AS pooled_rate_ppm, b.rate AS base_rate_ppm,
           a.n_up, a.n_down,
           CASE WHEN p.rate > b.rate AND a.n_down > a.n_up THEN TRUE
                WHEN p.rate < b.rate AND a.n_up > a.n_down THEN TRUE
                ELSE FALSE END AS simpson_flag
    FROM pooled p CROSS JOIN base b JOIN agg a ON p.grp = a.grp
    """,
    doc="Simpson's-paradox detector: for each order-priority group, "
    "the POOLED fulfilled-rate delta vs the overall baseline is "
    "compared against the per-stratum (nation) vote — if the pooled "
    "direction contradicts the majority of within-stratum directions "
    "(each stratum compared to its OWN base rate, min cell n=20), "
    "the group is flagged as a confounding artifact, not a real "
    "effect. This is the dashboard-integrity audit run before any "
    "segmented metric ships. All rates are exact integer ppm; the "
    "vote is a sign census, so no float comparison anywhere. Three "
    "hash aggregates over the same (group, stratum) cell table + "
    "broadcast scalars — the cell table is the one shuffle, "
    "metadata-sized (|groups| x |strata|).",
)
def q269_simpson_detector(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        _t(spark, sf_dir, "orders")
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("o_orderpriority").alias("grp"),
            F.col("c_nationkey").alias("stratum"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
        )
    )
    cell = o.groupBy("grp", "stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    pooled = cell.groupBy("grp").agg(
        F.expr("sum(pos) * 1000000 div sum(n)").cast("bigint").alias("rate")
    )
    base = cell.agg(
        F.expr("sum(pos) * 1000000 div sum(n)").cast("bigint").alias("brate")
    )
    strat_base = cell.groupBy("stratum").agg(
        F.expr("sum(pos) * 1000000 div sum(n)").cast("bigint").alias("srate")
    )
    sgn = (
        cell.filter(F.col("n") >= 20)
        .join(F.broadcast(strat_base), "stratum")
        .select(
            "grp",
            F.when(F.expr("pos * 1000000 div n") > F.col("srate"), 1)
            .when(F.expr("pos * 1000000 div n") < F.col("srate"), -1)
            .otherwise(0)
            .alias("s"),
        )
    )
    agg = sgn.groupBy("grp").agg(
        F.sum(F.when(F.col("s") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_up"),
        F.sum(F.when(F.col("s") < 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
    )
    return (
        pooled.crossJoin(F.broadcast(base))
        .join(agg, "grp")
        .select(
            "grp",
            F.col("rate").alias("pooled_rate_ppm"),
            F.col("brate").alias("base_rate_ppm"),
            "n_up",
            "n_down",
            (
                ((F.col("rate") > F.col("brate")) & (F.col("n_down") > F.col("n_up")))
                | ((F.col("rate") < F.col("brate")) & (F.col("n_up") > F.col("n_down")))
            ).alias("simpson_flag"),
        )
    )


@query(
    "q270_markov_accuracy",
    """
    WITH s AS (SELECT user_id, event_type,
                      lead(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id) AS nxt
               FROM events),
    p AS (SELECT event_type, nxt FROM s WHERE nxt IS NOT NULL),
    t AS (SELECT event_type, nxt, cast(count(*) AS BIGINT) AS n
          FROM p GROUP BY 1, 2),
    pred AS (SELECT event_type, nxt AS predicted
             FROM (SELECT event_type, nxt, n,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY n DESC, nxt) AS rn
                   FROM t) WHERE rn = 1)
    SELECT p.event_type,
           max(pred.predicted) AS predicted,
           cast(count(*) AS BIGINT) AS n_transitions,
           cast(sum(CASE WHEN p.nxt = pred.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           cast(sum(CASE WHEN p.nxt = pred.predicted THEN 1 ELSE 0 END)
                * 1000000 // count(*) AS BIGINT) AS accuracy_ppm
    FROM p JOIN pred USING (event_type)
    GROUP BY p.event_type
    """,
    doc="Markov next-event predictor + in-corpus accuracy: the "
    "majority-next-event model (argmax row of q186's transition "
    "matrix, deterministic tiebreak by event name) scored against "
    "every observed transition — the baseline any sequence model "
    "must beat, and the sanity number for session-flow dashboards. "
    "Transitions come from per-user lead windows (bounded per-key "
    "state); the model is |event types|^2 rows collapsing to one "
    "argmax per type (a window over each type's <=|types| "
    "candidate rows), and scoring is one broadcast join of the "
    "|types|-row model back onto the transition stream + one hash "
    "aggregate. Exact integer accuracy in ppm.",
)
def q270_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    t = s.groupBy("event_type", "nxt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pred = (
        t.select(
            "event_type",
            "nxt",
            F.row_number()
            .over(
                W.partitionBy("event_type").orderBy(F.col("n").desc(), "nxt")
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("nxt").alias("predicted"))
    )
    return (
        s.join(F.broadcast(pred), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("predicted").alias("predicted"),
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_correct"),
            F.expr(
                "sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END)"
                " * 1000000 div count(1)"
            )
            .cast("bigint")
            .alias("accuracy_ppm"),
        )
    )


@query(
    "q271_lang_confusion",
    None,  # oracle composed below (embeds the marker table via q46's CTE)
    doc="Language-ID confusion matrix + per-class precision/recall: "
    "the q46 marker-argmax classifier scored cell-by-cell against "
    "the labeled lang column — the eval table that turns 'we have a "
    "langid heuristic' into 'we know which pairs it confuses and "
    "which direction'. One scan classifies map-side (the marker "
    "hits are regexp counts, no shuffle), one hash aggregate builds "
    "the |langs|^2 cell table, and the two marginals join back as "
    "broadcasts — precision = cell/pred-total, recall = cell/true-"
    "total, exact integer ppm. The eval composes the same production "
    "classifier expression, so the matrix can never drift from what "
    "the pipeline actually runs.",
)
def q271_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import lang_id

    docs = _t(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.col("lang").alias("lang_true"),
            lang_id("text").alias("lang_pred"),
        )
        .groupBy("lang_true", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tt = cells.groupBy("lang_true").agg(
        F.sum("n").cast("bigint").alias("n_true")
    )
    pt = cells.groupBy("lang_pred").agg(
        F.sum("n").cast("bigint").alias("n_pred")
    )
    return (
        cells.join(F.broadcast(tt), "lang_true")
        .join(F.broadcast(pt), "lang_pred")
        .select(
            "lang_true",
            "lang_pred",
            "n",
            F.expr("n * 1000000 div n_true").cast("bigint").alias("recall_ppm"),
            F.expr("n * 1000000 div n_pred")
            .cast("bigint")
            .alias("precision_ppm"),
        )
    )


def _q271_oracle() -> str:
    from tytodb_spark.operators.textual import LANG_MARKERS

    hits = _lang_hits_sql(LANG_MARKERS)
    packs = ", ".join(
        f"struct_pack(negs := -s_{lang}, l := '{lang}')" for lang in sorted(hits)
    )
    scores = ", ".join(f"{sql} AS s_{lang}" for lang, sql in hits.items())
    greatest = ", ".join(f"s_{lang}" for lang in sorted(hits))
    return f"""
    WITH pred AS (
      SELECT lang AS lang_true,
             CASE WHEN greatest({greatest}) < 1 THEN 'und'
                  ELSE list_sort([{packs}])[1].l END AS lang_pred
      FROM (SELECT lang, {scores} FROM documents)),
    cells AS (SELECT lang_true, lang_pred, cast(count(*) AS BIGINT) AS n
              FROM pred GROUP BY 1, 2),
    tt AS (SELECT lang_true, cast(sum(n) AS BIGINT) AS n_true
           FROM cells GROUP BY 1),
    pt AS (SELECT lang_pred, cast(sum(n) AS BIGINT) AS n_pred
           FROM cells GROUP BY 1)
    SELECT c.lang_true, c.lang_pred, c.n,
           cast(c.n * 1000000 // tt.n_true AS BIGINT) AS recall_ppm,
           cast(c.n * 1000000 // pt.n_pred AS BIGINT) AS precision_ppm
    FROM cells c JOIN tt USING (lang_true) JOIN pt USING (lang_pred)
    """


REGISTRY["q271_lang_confusion"] = QueryDef(
    fn=REGISTRY["q271_lang_confusion"].fn,
    oracle=_q271_oracle(),
    doc=REGISTRY["q271_lang_confusion"].doc,
)


@query(
    "q272_split_leakage",
    f"""
    WITH sp AS (
      SELECT doc_id, text,
             CASE WHEN b < 204 THEN 'train' WHEN b < 230 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, text,
                   (strpos('0123456789abcdef',
                           substr(md5(cast(doc_id AS VARCHAR)), 31, 1)) - 1)
                   * 16
                   + strpos('0123456789abcdef',
                            substr(md5(cast(doc_id AS VARCHAR)), 32, 1)) - 1
                     AS b
            FROM documents)),
    g AS (SELECT DISTINCT split, g FROM (
            SELECT split, unnest({_NGRAMS(8)}) AS g FROM sp)),
    m AS (SELECT split, cast(count(*) AS BIGINT) AS n_grams
          FROM g GROUP BY 1),
    ov AS (SELECT a.split AS split_a, b.split AS split_b,
                  cast(count(*) AS BIGINT) AS n_shared
           FROM g a JOIN g b ON a.g = b.g AND a.split < b.split
           GROUP BY 1, 2)
    SELECT ov.split_a, ov.split_b, ma.n_grams AS grams_a,
           mb.n_grams AS grams_b, ov.n_shared,
           cast(ov.n_shared * 1000000 // least(ma.n_grams, mb.n_grams)
                AS BIGINT) AS leakage_ppm
    FROM ov JOIN m ma ON ov.split_a = ma.split
            JOIN m mb ON ov.split_b = mb.split
    """,
    doc="Train/val/test split-leakage matrix: for each split pair, the "
    "count of exact word-8-grams present in BOTH — the audit that "
    "catches eval contamination introduced by the split itself "
    "(near-duplicate documents landing on opposite sides of the q69 "
    "hash split). Grams dedupe per split first (one hash aggregate), "
    "so the pair stage joins |distinct grams| rows on the gram key — "
    "co-partitioned, never doc x doc; leakage normalizes by the "
    "smaller side's gram count (ppm). At 100x the gram table is the "
    "only large shuffle and it is exactly the q238 novelty-census "
    "shape; a production run would hash grams to 64-bit before the "
    "join (q238's remedy) — kept as raw strings here so the oracle "
    "joins byte-identical keys. The FIX for flagged leakage is "
    "cluster-aware splitting: split by q71's near-dup cluster id "
    "instead of doc id.",
)
def q272_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    hexd = "0123456789abcdef"
    md5 = F.md5(F.col("doc_id").cast("string"))
    bucket = (F.instr(F.lit(hexd), F.substring(md5, 31, 1)) - 1) * 16 + (
        F.instr(F.lit(hexd), F.substring(md5, 32, 1)) - 1
    )
    split = (
        F.when(bucket < 204, "train").when(bucket < 230, "val").otherwise("test")
    )
    sp = spread(
        docs.select("doc_id", "text", split.alias("split")), "doc_id"
    )
    g = sp.select(
        "split", F.explode(word_ngrams(F.col("text"), 8)).alias("g")
    ).distinct()
    m = g.groupBy("split").agg(F.count(F.lit(1)).cast("bigint").alias("n_grams"))
    a = g.select(F.col("split").alias("split_a"), "g")
    b = g.select(F.col("split").alias("split_b"), "g")
    ov = (
        a.join(b, "g")
        .filter(F.col("split_a") < F.col("split_b"))
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        ov.join(
            F.broadcast(m.select(F.col("split").alias("split_a"), F.col("n_grams").alias("grams_a"))),
            "split_a",
        )
        .join(
            F.broadcast(m.select(F.col("split").alias("split_b"), F.col("n_grams").alias("grams_b"))),
            "split_b",
        )
        .select(
            "split_a",
            "split_b",
            "grams_a",
            "grams_b",
            "n_shared",
            F.expr("n_shared * 1000000 div least(grams_a, grams_b)")
            .cast("bigint")
            .alias("leakage_ppm"),
        )
    )


@query(
    "q273_neyman_allocation",
    """
    WITH s AS (SELECT source,
                      cast(count(*) AS BIGINT) AS n_docs,
                      cast(sum(n_chars) AS BIGINT) AS sx,
                      cast(sum(n_chars * n_chars) AS BIGINT) AS sxx
               FROM documents GROUP BY 1),
    v AS (SELECT source, n_docs,
                 cast(floor(sqrt(
                     cast(n_docs * sxx - sx * sx AS DOUBLE)
                     / (cast(n_docs AS DOUBLE) * cast(n_docs AS DOUBLE))
                 ) * 1000) AS BIGINT) AS sd_q
          FROM s),
    w AS (SELECT source, n_docs, sd_q, n_docs * sd_q AS wgt FROM v),
    t AS (SELECT cast(sum(wgt) AS BIGINT) AS tw FROM w)
    SELECT w.source, w.n_docs, w.sd_q,
           cast(10000 * w.wgt // t.tw AS BIGINT) AS alloc
    FROM w CROSS JOIN t
    """,
    doc="Neyman-optimal stratified-sampling allocation: a 10k-doc "
    "labeling budget split across sources proportional to N_h * "
    "sigma_h (strata with more internal variance get more samples — "
    "the minimum-variance allocation for a fixed budget), with "
    "document length as the proxy variance signal. One power-sum "
    "aggregate per stratum (count, sum, sum-of-squares — all exact "
    "int64), the population variance assembled in ONE fixed-order "
    "double expression and quantized floor(sqrt(.)*1e3), weights and "
    "the final allocation in pure integer arithmetic against the "
    "broadcast weight total. Floor allocation under-fills by < "
    "|strata| docs — the deficit goes to a deterministic remainder "
    "pass at execution (q204's md5-rank reservoir per stratum "
    "executes exactly this plan). Headroom: n*sxx needs n*E[x^2] "
    "< 9e18 — quantize lengths to KB beyond ~1e9 docs/stratum.",
)
def q273_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("sxx"),
    )
    v = s.select(
        "source",
        "n_docs",
        F.expr(
            "cast(floor(sqrt("
            " cast(n_docs * sxx - sx * sx as double)"
            " / (cast(n_docs as double) * cast(n_docs as double))"
            ") * 1000) as bigint)"
        ).alias("sd_q"),
    )
    w = v.select(
        "source", "n_docs", "sd_q", (F.col("n_docs") * F.col("sd_q")).alias("wgt")
    )
    t = w.agg(F.sum("wgt").cast("bigint").alias("tw"))
    return w.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "sd_q",
        F.expr("10000 * wgt div tw").cast("bigint").alias("alloc"),
    )


@query(
    "q274_broadcast_advisor",
    """
    WITH sz AS (
      SELECT 'region' AS tbl, cast(count(*) AS BIGINT) AS n_rows,
             cast(sum(8 + length(r_name)) AS BIGINT) AS est_bytes
      FROM region
      UNION ALL
      SELECT 'nation', cast(count(*) AS BIGINT),
             cast(sum(8 + 4 + length(n_name)) AS BIGINT) FROM nation
      UNION ALL
      SELECT 'supplier', cast(count(*) AS BIGINT),
             cast(sum(8 + 4 + 8 + length(s_name)) AS BIGINT) FROM supplier
      UNION ALL
      SELECT 'customer', cast(count(*) AS BIGINT),
             cast(sum(8 + 4 + 8 + length(c_name) + length(c_mktsegment))
                  AS BIGINT) FROM customer
      UNION ALL
      SELECT 'part', cast(count(*) AS BIGINT),
             cast(sum(8 + 8 + length(p_name) + length(p_brand)
                      + length(p_type)) AS BIGINT) FROM part)
    SELECT tbl, n_rows, est_bytes,
           (est_bytes <= 10485760) AS broadcastable,
           CASE WHEN est_bytes <= 10485760 THEN 'broadcast'
                ELSE 'shuffle' END AS join_strategy
    FROM sz
    """,
    doc="Broadcast-join advisor (the CBO sizing primitive made "
    "explicit): every dimension table's exact row count and "
    "estimated in-memory bytes (fixed-width columns at declared "
    "width + actual string lengths — the same arithmetic "
    "spark.sql.autoBroadcastJoinThreshold applies to stats it "
    "trusts), graded against the default 10 MB threshold into a "
    "broadcast-vs-shuffle recommendation. One count+sum aggregate "
    "per table (column-pruned scans), unioned into the advisory "
    "report. This is the exhibit behind every F.broadcast() hint in "
    "the registry: the decision is measurable, not folklore, and at "
    "100 TB the same report (fed by ANALYZE stats instead of scans) "
    "drives AQE's runtime join re-planning.",
)
def q274_broadcast_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    defs = [
        ("region", "8 + length(r_name)"),
        ("nation", "8 + 4 + length(n_name)"),
        ("supplier", "8 + 4 + 8 + length(s_name)"),
        ("customer", "8 + 4 + 8 + length(c_name) + length(c_mktsegment)"),
        ("part", "8 + 8 + length(p_name) + length(p_brand) + length(p_type)"),
    ]
    out = None
    for tbl, expr in defs:
        df = _t(spark, sf_dir, tbl).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.expr(expr)).cast("bigint").alias("est_bytes"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "est_bytes")
        out = df if out is None else out.unionByName(df)
    return out.select(
        "tbl",
        "n_rows",
        "est_bytes",
        (F.col("est_bytes") <= 10485760).alias("broadcastable"),
        F.when(F.col("est_bytes") <= 10485760, "broadcast")
        .otherwise("shuffle")
        .alias("join_strategy"),
    )


@query(
    "q275_langid_margin",
    None,  # oracle composed below (embeds the marker table)
    doc="Language-ID confidence census: per predicted language, the "
    "histogram of argmax MARGINS (best marker-hit count minus second "
    "best, the classifier's confidence signal) bucketed 0 / 1 / 2 / "
    "3+ — the router that decides which documents get the cheap "
    "heuristic label and which escalate to a real langid model "
    "(margin 0 = coin flip, route to the expensive path). Scores, "
    "argmax, and margins are all exact integer regexp counts "
    "computed map-side (the same production expressions as q46/"
    "q271), then one hash aggregate on the (pred, bucket) key. "
    "Confidence-routing composition: q271 says WHERE the heuristic "
    "is wrong; this says how often it KNOWS it's unsure.",
)
def q275_langid_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import lang_id, lang_scores

    docs = _t(spark, sf_dir, "documents")
    scores = lang_scores(F.col("text"))
    arr = F.array_sort(F.array(*[scores[lang] for lang in sorted(scores)]))
    n = len(scores)
    margin = F.element_at(arr, n) - F.element_at(arr, n - 1)
    b = docs.select(
        lang_id("text").alias("lang_pred"),
        F.least(margin, F.lit(3)).cast("int").alias("margin_bucket"),
    )
    return b.groupBy("lang_pred", "margin_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def _q275_oracle() -> str:
    from tytodb_spark.operators.textual import LANG_MARKERS

    hits = _lang_hits_sql(LANG_MARKERS)
    packs = ", ".join(
        f"struct_pack(negs := -s_{lang}, l := '{lang}')" for lang in sorted(hits)
    )
    scores = ", ".join(f"{sql} AS s_{lang}" for lang, sql in hits.items())
    arr = ", ".join(f"s_{lang}" for lang in sorted(hits))
    n = len(hits)
    return f"""
    WITH sc AS (SELECT {scores} FROM documents),
    p AS (SELECT CASE WHEN greatest({arr}) < 1 THEN 'und'
                      ELSE list_sort([{packs}])[1].l END AS lang_pred,
                 list_sort([{arr}])[{n}] - list_sort([{arr}])[{n - 1}]
                   AS margin
          FROM sc)
    SELECT lang_pred, cast(least(margin, 3) AS INT) AS margin_bucket,
           cast(count(*) AS BIGINT) AS n_docs
    FROM p GROUP BY 1, 2
    """


REGISTRY["q275_langid_margin"] = QueryDef(
    fn=REGISTRY["q275_langid_margin"].fn,
    oracle=_q275_oracle(),
    doc=REGISTRY["q275_langid_margin"].doc,
)


@query(
    "q276_decile_concentration",
    """
    WITH rev AS (SELECT o_custkey,
                        cast(sum(cast(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT)) AS BIGINT) AS cents
                 FROM orders GROUP BY 1),
    b AS (SELECT cents // 1000000 AS bkt,
                 cast(count(*) AS BIGINT) AS n_cust,
                 cast(sum(cents) AS BIGINT) AS rev_sum
          FROM rev GROUP BY 1),
    c AS (SELECT bkt, n_cust, rev_sum,
                 sum(n_cust) OVER (ORDER BY bkt DESC) AS cum_n,
                 sum(rev_sum) OVER (ORDER BY bkt DESC) AS cum_rev,
                 sum(n_cust) OVER () AS n,
                 sum(rev_sum) OVER () AS total
          FROM b),
    t AS (SELECT bkt, n_cust, rev_sum, cum_n, cum_rev, n, total,
                 (n + 9) // 10 AS k
          FROM c WHERE cum_n >= (n + 9) // 10
          ORDER BY bkt DESC LIMIT 1)
    SELECT cast(n AS BIGINT) AS n_customers,
           cast(k AS BIGINT) AS k_top,
           cast(bkt AS BIGINT) AS t_star_bucket,
           cast(((cum_rev - rev_sum)
                 + (k - (cum_n - n_cust)) * (bkt * 1000000))
                * 1000000 // total AS BIGINT) AS share_lo_ppm,
           cast(((cum_rev - rev_sum)
                 + least((k - (cum_n - n_cust)) * ((bkt + 1) * 1000000 - 1),
                         rev_sum))
                * 1000000 // total AS BIGINT) AS share_hi_ppm
    FROM t
    """,
    doc="Top-decile revenue concentration WITHOUT a global sort: "
    "per-customer revenue collapses into $10k value buckets (one "
    "hash aggregate), cumulative counts from the top find the bucket "
    "t* where the k = ceil(n/10) richest customers land, and the "
    "top-decile revenue share is reported as EXACT LOWER AND UPPER "
    "BOUNDS (the k-th customer's within-bucket position is the only "
    "unknown, so the bounds assume bucket-min / bucket-max for the "
    "partial bucket — honest precision at bucket resolution, "
    "tightened by halving the bucket width, never by ordering the "
    "corpus). The window runs over the ~60-row bucket table (the "
    "q263/q220 metadata-spine exclusion class); everything else is "
    "exact integer ppm. The distributional complement of q233's "
    "Gini scalar: Gini says HOW concentrated, this says WHO holds "
    "it.",
)
def q276_decile_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("cents")
    )
    b = rev.groupBy(F.expr("cents div 1000000").alias("bkt")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("cents").cast("bigint").alias("rev_sum"),
    )
    c = b.select(
        "bkt",
        "n_cust",
        "rev_sum",
        F.sum("n_cust").over(W.orderBy(F.col("bkt").desc())).alias("cum_n"),
        F.sum("rev_sum").over(W.orderBy(F.col("bkt").desc())).alias("cum_rev"),
        F.sum("n_cust").over(W.partitionBy()).alias("n"),
        F.sum("rev_sum").over(W.partitionBy()).alias("total"),
    )
    t = (
        c.withColumn("k", F.expr("(n + 9) div 10"))
        .filter(F.col("cum_n") >= F.col("k"))
        .orderBy(F.col("bkt").desc())
        .limit(1)
    )
    return t.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("k").cast("bigint").alias("k_top"),
        F.col("bkt").cast("bigint").alias("t_star_bucket"),
        F.expr(
            "cast(((cum_rev - rev_sum)"
            " + (k - (cum_n - n_cust)) * (bkt * 1000000))"
            " * 1000000 div total as bigint)"
        ).alias("share_lo_ppm"),
        F.expr(
            "cast(((cum_rev - rev_sum)"
            " + least((k - (cum_n - n_cust)) * ((bkt + 1) * 1000000 - 1),"
            "         rev_sum))"
            " * 1000000 div total as bigint)"
        ).alias("share_hi_ppm"),
    )


@query(
    "q277_recursive_closure",
    """
    WITH RECURSIVE anc AS (
      SELECT p_partkey AS node, p_partkey // 10 AS anc,
             cast(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      FROM part WHERE p_partkey >= 1
      UNION ALL
      SELECT node, anc // 10 AS anc, cents FROM anc WHERE anc >= 1
    )
    SELECT cast(anc AS BIGINT) AS ancestor,
           cast(count(*) AS BIGINT) AS n_desc,
           cast(sum(cents) AS BIGINT) AS subtree_cents
    FROM anc GROUP BY anc
    """,
    doc="Recursive-CTE parity: transitive-closure rollup over an "
    "implicit digit-decade hierarchy (parent(k) = k div 10, root 0 — "
    "the BOM/org-chart shape without needing an explicit edge table). "
    "For every internal node: descendant count and exact subtree "
    "retail-price rollup in cents. Spark has no WITH RECURSIVE, so "
    "the engine side runs the textbook iterative-fixpoint expansion: "
    "each level derives (node, anc div 10) from the previous level, "
    "eagerly checkpointed (executor-local, O(N) rows/level) so "
    "lineage stays flat, looping until the frontier empties — depth "
    "is log10(max key), so ~7 rounds at 1e7 parts and 13 at 1e13; "
    "each round is one narrow map + the final census is one hash "
    "aggregate on ancestor. The oracle is genuine WITH RECURSIVE in "
    "DuckDB — the differential proves the loop reproduces real "
    "recursive-CTE semantics, not an approximation of them.",
)
def q277_recursive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    pt = _t(spark, sf_dir, "part").filter(F.col("p_partkey") >= 1)
    base = pt.select(
        F.col("p_partkey").alias("node"),
        F.expr("p_partkey div 10").alias("anc"),
        F.expr("cast(floor(p_retailprice * 100 + 0.5) as bigint)").alias(
            "cents"
        ),
    )
    levels = [base]
    cur = base
    # Fixpoint loop: bounded at log10(max key) rounds; the hard cap of
    # 20 exists only as a runaway guard (int64 keys exhaust at 19
    # digits). Each level materializes eagerly so the union's lineage
    # is flat and isEmpty() never recomputes prior levels.
    for _ in range(20):
        cur = (
            cur.filter(F.col("anc") >= 1)
            .select("node", F.expr("anc div 10").alias("anc"), "cents")
            .localCheckpoint(eager=True)
        )
        if cur.isEmpty():
            break
        levels.append(cur)
    closure = levels[0]
    for lv in levels[1:]:
        closure = closure.unionByName(lv)
    return closure.groupBy(F.col("anc").alias("ancestor")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_desc"),
        F.sum("cents").cast("bigint").alias("subtree_cents"),
    )


@query(
    "q278_twap",
    """
    WITH e AS (SELECT user_id,
                      epoch_us(ts) AS t,
                      event_id,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS x
               FROM events),
    iv AS (SELECT user_id, x,
                  lead(t) OVER (PARTITION BY user_id
                                ORDER BY t, event_id) - t AS dt
           FROM e)
    SELECT user_id,
           cast(count(*) AS BIGINT) AS n_intervals,
           cast(sum(dt) AS BIGINT) AS span_us,
           cast(sum(x * dt) // sum(dt) AS BIGINT) AS twap_q
    FROM iv WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
    doc="Time-weighted average (TWAP) per user over irregular samples: "
    "each value holds until the next observation (LOCF weighting), so "
    "the mean is sum(x*dt)/sum(dt) — the correct average for metrics "
    "sampled on activity, where the naive row mean over-weights bursts "
    "(the classic VWAP/TWAP distinction). Values live in exact cents, "
    "gaps in exact microseconds from one lead() per user (bounded "
    "per-key window state, no corpus-scale ordering), so sum(x*dt) is "
    "an exact int64 — headroom: max|cents| x user-span_us <= 9.2e18, "
    "i.e. ~$10M values over a 30-year span; quantize coarser beyond. "
    "Zero-length intervals (same-timestamp ties) carry zero weight and "
    "are dropped before the aggregate in both engines. One shuffle on "
    "user_id serves the window and the final aggregate.",
)
def q278_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("x"),
    )
    w = W.partitionBy("user_id").orderBy("t", "event_id")
    iv = e.select(
        "user_id", "x", (F.lead("t").over(w) - F.col("t")).alias("dt")
    )
    return (
        iv.filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dt").cast("bigint").alias("span_us"),
            F.expr("sum(x * dt) div sum(dt)").cast("bigint").alias("twap_q"),
        )
    )


@query(
    "q279_token_budget_mix",
    r"""
    WITH tok AS (SELECT source,
                        cast(sum(len(list_filter(string_split_regex(
                             lower(trim(text)), '\s+'), x -> x <> '')))
                             AS BIGINT) AS t
                 FROM documents GROUP BY source),
    tot AS (SELECT cast(sum(t) AS BIGINT) AS total,
                   cast(count(*) AS BIGINT) AS n,
                   cast(sum(t) // 2 AS BIGINT) AS b
            FROM tok),
    r AS (SELECT source, t, total, n, b,
                 row_number() OVER (ORDER BY t, source) AS rn,
                 sum(t) OVER (ORDER BY t, source
                              ROWS UNBOUNDED PRECEDING) AS pfx
          FROM tok CROSS JOIN tot),
    c AS (SELECT coalesce(
                   min_by((b - (pfx - t)) // (n - rn + 1), rn)
                     FILTER (WHERE pfx - t + (n - rn + 1) * t > b),
                   max(t)) AS cap
          FROM r)
    SELECT tok.source,
           cast(tok.t AS BIGINT) AS tokens,
           cast(c.cap AS BIGINT) AS cap,
           cast(least(tok.t, c.cap) AS BIGINT) AS kept_tokens,
           cast(least(tok.t, c.cap) * 1000000 // tok.t AS BIGINT)
             AS keep_ppm
    FROM tok CROSS JOIN c
    """,
    doc="Pretraining-mix water-filling: allocate a 50%-of-corpus token "
    "budget across sources by finding the largest integer per-source "
    "cap c with sum(min(tokens_s, c)) <= B — small sources keep "
    "everything, large sources are capped at one common level (the "
    "'water line'), the standard budget split that maximizes the "
    "minimum per-source representation. Closed-form exact solve, no "
    "search: sources sort ascending by tokens (a |sources|-row "
    "metadata frame — the global window is over ~10 rows, not the "
    "corpus), prefix sums identify the first rank where keeping this "
    "source whole would blow the budget (pfx_prev + remaining*t > B), "
    "and the cap is (B - pfx_prev) div remaining at that rank — "
    "selected by min_by(cand, rank) FILTER, keep-all max(t) fallback "
    "when the budget covers the corpus. All integer; the token "
    "counts are one scan + one per-source aggregate.",
)
def q279_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import water_fill_caps
    from tytodb_spark.operators.textual import token_count

    docs = _t(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(token_count(F.col("text"))).cast("bigint").alias("t")
    )
    return water_fill_caps(tok, "source", "t")


@query(
    "q280_hrw_shards",
    """
    WITH k AS (SELECT doc_id FROM documents),
    a AS (SELECT doc_id,
                 cast(list_max(list_transform(range(0, 8), s ->
                        ('0x' || substr(md5(doc_id || ':' || s), 1, 8))
                          ::BIGINT * 16 + s)) % 16 AS BIGINT) AS s8,
                 cast(list_max(list_transform(range(0, 9), s ->
                        ('0x' || substr(md5(doc_id || ':' || s), 1, 8))
                          ::BIGINT * 16 + s)) % 16 AS BIGINT) AS s9
          FROM k)
    SELECT 'shards8' AS cfg, s8 AS shard,
           cast(count(*) AS BIGINT) AS n_keys
    FROM a GROUP BY s8
    UNION ALL
    SELECT 'shards9' AS cfg, s9 AS shard,
           cast(count(*) AS BIGINT) AS n_keys
    FROM a GROUP BY s9
    UNION ALL
    SELECT 'moved' AS cfg, cast(-1 AS BIGINT) AS shard,
           cast(sum(CASE WHEN s8 <> s9 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keys
    FROM a
    """,
    doc="Rendezvous (highest-random-weight) hashing shard audit: every "
    "key's shard is argmax over shards of md5(key:shard) — the "
    "coordination-free consistent-placement scheme where growing the "
    "cluster from 8 to 9 shards moves EXACTLY the keys whose new "
    "shard wins (expected 1/9 of keys), versus mod-hashing's 8/9. "
    "Output: per-shard balance census under both configs plus the "
    "moved-key count that proves the minimal-movement property. The "
    "argmax is branch-free and tie-proof both engines: weight*16 + "
    "shard packs the comparison into one bigint (weights are 32-bit "
    "md5 prefixes via the portable conv/substr family), so max() %% "
    "16 IS the winning shard — no max_by tie ambiguity, no explode; "
    "per-row array math stays JVM/vectorized, and the census is one "
    "hash aggregate per config over |keys| rows.",
)
def q280_hrw_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")

    def _assign(n: int, out: str):
        return F.expr(
            f"cast(array_max(transform(sequence(0, {n - 1}), s ->"
            f" cast(conv(substr(md5(concat(cast(doc_id as string), ':',"
            f" cast(s as string))), 1, 8), 16, 10) as bigint) * 16"
            f" + s)) % 16 as bigint)"
        ).alias(out)

    a = docs.select(_assign(8, "s8"), _assign(9, "s9")).localCheckpoint(
        eager=False
    )
    c8 = a.groupBy(F.col("s8").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    c9 = a.groupBy(F.col("s9").alias("shard")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys")
    )
    moved = a.agg(
        F.sum(F.expr("case when s8 <> s9 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_keys")
    )
    return (
        c8.select(F.lit("shards8").alias("cfg"), "shard", "n_keys")
        .unionByName(
            c9.select(F.lit("shards9").alias("cfg"), "shard", "n_keys")
        )
        .unionByName(
            moved.select(
                F.lit("moved").alias("cfg"),
                F.lit(-1).cast("bigint").alias("shard"),
                "n_keys",
            )
        )
    )


@query(
    "q281_lpm_match",
    """
    WITH k AS (SELECT c_custkey, cast(c_custkey AS VARCHAR) AS ks
               FROM customer),
    px AS (SELECT DISTINCT unnest(list_transform(range(1, 4),
                  i -> substr(ks, 1, cast(i AS INT)))) AS p
           FROM k),
    routes AS (SELECT p FROM px
               WHERE length(p) = 1
                  OR ('0x' || substr(md5(p), 1, 2))::BIGINT % 4 < 2),
    cand AS (SELECT k.c_custkey, k.ks, r.p
             FROM (SELECT c_custkey, ks,
                          unnest(list_transform(range(1, 4),
                            i -> substr(ks, 1, cast(i AS INT)))) AS p
                   FROM k) k
             JOIN routes r USING (p)),
    best AS (SELECT c_custkey, ks, max(length(p)) AS plen
             FROM cand GROUP BY c_custkey, ks)
    SELECT substr(ks, 1, cast(plen AS INT)) AS route,
           cast(plen AS INT) AS plen,
           cast(count(*) AS BIGINT) AS n_cust
    FROM best GROUP BY 1, 2
    """,
    doc="Longest-prefix-match join (IP routing / phone-rating shape): "
    "every customer key matches the LONGEST route prefix present in a "
    "route dimension, built here from digit prefixes of length 1-3 "
    "with an md5-portable coin deciding which length-2/3 prefixes "
    "exist (length-1 prefixes are the default routes, so every key "
    "matches). The scalable LPM recipe: explode each key into its <= "
    "3 bounded candidate prefixes (fan-out = max prefix length, "
    "constant), broadcast-join the route dim, take max(length) per "
    "key — never a theta/LIKE join, never a per-route scan; the same "
    "plan serves CIDR tables or tariff prefixes at any corpus size "
    "because the shuffle is one hash aggregate on the key. Census "
    "output: matched route, its length, customers behind it.",
)
def q281_lpm_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    k = cu.select(
        "c_custkey", F.col("c_custkey").cast("string").alias("ks")
    )
    pref = F.expr(
        "transform(sequence(1, 3), i -> substr(ks, 1, i))"
    )
    px = k.select(F.explode(pref).alias("p")).distinct()
    routes = px.filter(
        (F.length("p") == 1)
        | (
            F.expr("cast(conv(substr(md5(p), 1, 2), 16, 10) as bigint)")
            % 4
            < 2
        )
    )
    cand = k.select("c_custkey", "ks", F.explode(pref).alias("p")).join(
        F.broadcast(routes), "p"
    )
    best = cand.groupBy("c_custkey", "ks").agg(
        F.max(F.length("p")).alias("plen")
    )
    return best.groupBy(
        F.expr("substr(ks, 1, plen)").alias("route"),
        F.col("plen").cast("int").alias("plen"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_cust"))


@query(
    "q282_hbos_outliers",
    """
    WITH xq AS (SELECT vec_id, label, i AS dim,
                       greatest(-8, least(7,
                         cast(floor(cast(embedding[i] AS DOUBLE) * 16)
                              AS BIGINT))) AS b
                FROM embeddings
                CROSS JOIN (SELECT unnest(range(1, 9)) AS i)),
    n AS (SELECT cast(count(*) AS BIGINT) AS n FROM embeddings),
    hist AS (SELECT dim, b, cast(count(*) AS BIGINT) AS cnt
             FROM xq GROUP BY dim, b),
    sc AS (SELECT xq.vec_id, xq.label,
                  cast(sum(cast(floor(ln(n.n::DOUBLE / hist.cnt::DOUBLE)
                                      * 1000) AS BIGINT)) AS BIGINT)
                    AS hbos_q
           FROM xq JOIN hist USING (dim, b) CROSS JOIN n
           GROUP BY xq.vec_id, xq.label)
    SELECT vec_id, cast(label AS INT) AS label, hbos_q
    FROM sc ORDER BY hbos_q DESC, vec_id LIMIT 20
    """,
    doc="HBOS (histogram-based outlier score) over the first 8 "
    "embedding dims: per-dim equi-width histograms (16 clipped "
    "buckets), per-vector score = sum of -log(bin frequency) — the "
    "linear-time density-based outlier detector that needs no "
    "pairwise distances and no model fit, the standard first-pass "
    "anomaly gate before expensive per-row inspection. The histogram "
    "is a 128-row broadcast dim (8 dims x 16 bins), so scoring is "
    "one broadcast join over the exploded (vec, dim) frame + one "
    "hash aggregate per vector; per-term scores quantize as "
    "floor(ln(N/cnt)*1e3) of integer counts (<= 128 distinct "
    "constants — ulp-safe), so vector scores are exact int64 sums. "
    "Top-20 via TakeOrderedAndProject on the unique (score, vec_id) "
    "key.",
)
def q282_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    xq = (
        emb.select("vec_id", "label", F.posexplode("embedding").alias("pos", "xf"))
        .filter(F.col("pos") < 8)
        .select(
            "vec_id",
            "label",
            (F.col("pos") + 1).alias("dim"),
            F.greatest(
                F.lit(-8),
                F.least(
                    F.lit(7),
                    F.floor(F.col("xf").cast("double") * 16).cast("bigint"),
                ),
            ).alias("b"),
        )
    )
    n = emb.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    hist = xq.groupBy("dim", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    sc = (
        xq.join(F.broadcast(hist), ["dim", "b"])
        .crossJoin(F.broadcast(n))
        .groupBy("vec_id", "label")
        .agg(
            F.sum(
                F.floor(
                    F.log(
                        F.col("n").cast("double") / F.col("cnt").cast("double")
                    )
                    * 1000
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("hbos_q")
        )
    )
    return (
        sc.select("vec_id", F.col("label").cast("int").alias("label"), "hbos_q")
        .orderBy(F.col("hbos_q").desc(), "vec_id")
        .limit(20)
    )


@query(
    "q283_sq8_recall",
    """
    WITH c AS (SELECT vec_id,
                      list_transform(embedding, x ->
                        greatest(-128, least(127,
                          cast(floor(cast(x AS DOUBLE) * 127) AS BIGINT))))
                        AS qa,
                      list_transform(embedding, x ->
                        cast(floor(cast(x AS DOUBLE) * 1000000) AS BIGINT))
                        AS ea
               FROM embeddings),
    p AS (SELECT vec_id AS pid, qa AS pqa, ea AS pea FROM c
          WHERE vec_id % 97 = 0),
    d AS (SELECT p.pid, c.vec_id,
                 cast(list_sum(list_transform(range(1, len(c.qa) + 1),
                      i -> c.qa[i] * p.pqa[i])) AS BIGINT) AS dq8,
                 cast(list_sum(list_transform(range(1, len(c.ea) + 1),
                      i -> c.ea[i] * p.pea[i])) AS BIGINT) AS dex
          FROM c CROSS JOIN p WHERE c.vec_id <> p.pid),
    r AS (SELECT pid, vec_id,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY dq8 DESC, vec_id) AS rq,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY dex DESC, vec_id) AS re
          FROM d),
    m AS (SELECT pid,
                 cast(sum(CASE WHEN rq <= 10 AND re <= 10
                               THEN 1 ELSE 0 END) AS BIGINT) AS matched
          FROM r GROUP BY pid)
    SELECT matched AS n_matched, cast(count(*) AS BIGINT) AS n_probes
    FROM m GROUP BY matched
    """,
    doc="Scalar-quantization recall audit: int8-quantize the embedding "
    "table (clip(floor(x*127)) per coordinate — the SQ8 codec every "
    "vector store offers as its 4x-memory-saving default) and measure "
    "recall@10 of quantized-dot top-k against the exact ranking for a "
    "deterministic ~1% probe set (vec_id %% 97). The census of probes "
    "per matched-count is the go/no-go table for enabling SQ8 in the "
    "ANN serving tier. Both rankings are exact integer dots "
    "(reference side quantizes at 1e6 — float-sum order can't flip "
    "it) with vec_id tie-breaks, so the recall number is bit-stable "
    "at any parallelism. Brute-force probe x corpus is the AUDIT "
    "regime (the q114 pattern): probes are a broadcast dim, the scan "
    "is one pass, and production top-k would come from q57's IVF "
    "with this census as its acceptance gate.",
)
def q283_sq8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> greatest(cast(-128 as bigint),"
            " least(cast(127 as bigint),"
            " cast(floor(cast(x as double) * 127) as bigint))))"
        ).alias("qa"),
        F.expr(
            "transform(embedding, x ->"
            " cast(floor(cast(x as double) * 1000000) as bigint))"
        ).alias("ea"),
    )
    p = c.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("pid"),
        F.col("qa").alias("pqa"),
        F.col("ea").alias("pea"),
    )
    d = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "vec_id",
            F.expr(
                "aggregate(zip_with(qa, pqa, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("dq8"),
            F.expr(
                "aggregate(zip_with(ea, pea, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("dex"),
        )
    )
    wq = W.partitionBy("pid").orderBy(F.col("dq8").desc(), "vec_id")
    we = W.partitionBy("pid").orderBy(F.col("dex").desc(), "vec_id")
    r = d.select(
        "pid",
        F.row_number().over(wq).alias("rq"),
        F.row_number().over(we).alias("re"),
    )
    m = r.groupBy("pid").agg(
        F.sum(F.expr("case when rq <= 10 and re <= 10 then 1 else 0 end"))
        .cast("bigint")
        .alias("matched")
    )
    return m.groupBy(F.col("matched").alias("n_matched")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes")
    )


@query(
    "q284_group_split_assign",
    f"""
    WITH k AS (SELECT doc_id,
                      md5(array_to_string(list_sort(list_distinct(
                          {_DC_TOKS})), ' ')) AS ck
               FROM documents),
    can AS (SELECT ck, cast(min(doc_id) AS BIGINT) AS canon
            FROM k GROUP BY ck),
    a AS (SELECT k.doc_id, k.ck,
                 CASE WHEN ('0x' || substr(md5(cast(can.canon AS VARCHAR)),
                            1, 8))::BIGINT % 10 < 8 THEN 'train'
                      WHEN ('0x' || substr(md5(cast(can.canon AS VARCHAR)),
                            1, 8))::BIGINT % 10 = 8 THEN 'val'
                      ELSE 'test' END AS split
          FROM k JOIN can USING (ck)),
    leak AS (SELECT cast(count(*) AS BIGINT) AS n_leaky FROM (
               SELECT ck FROM a GROUP BY ck
               HAVING count(DISTINCT split) > 1) x)
    SELECT split,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(count(DISTINCT ck) AS BIGINT) AS n_clusters,
           max(leak.n_leaky) AS n_leaky_clusters
    FROM a CROSS JOIN leak GROUP BY split
    """,
    doc="Leakage-safe train/val/test assignment: documents are split "
    "by the md5 of their duplicate-cluster CANONICAL id (min doc_id "
    "per bag-of-words content key), not their own id — so exact "
    "duplicates can never straddle splits, which is the root cause "
    "q272's leakage audit exists to catch (hash-split on raw doc_id "
    "leaks every duplicated document across the boundary). 80/10/10 "
    "via the portable md5 %% 10 family. Output: per-split document "
    "and cluster census plus an in-query verification column counting "
    "clusters spanning >1 split — structurally zero here, and the "
    "oracle recomputes it rather than trusting it. Plan: one content-"
    "key aggregate, one join back on the key, one census aggregate — "
    "all three shuffles on the same content-key spine.",
)
def q284_group_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import fingerprint

    docs = _t(spark, sf_dir, "documents")
    k = docs.select("doc_id", fingerprint(F.col("text")).alias("ck"))
    can = k.groupBy("ck").agg(F.min("doc_id").cast("bigint").alias("canon"))
    a = k.join(can, "ck").select(
        "doc_id",
        "ck",
        F.expr(
            "case when cast(conv(substr(md5(cast(canon as string)), 1, 8),"
            " 16, 10) as bigint) % 10 < 8 then 'train'"
            " when cast(conv(substr(md5(cast(canon as string)), 1, 8),"
            " 16, 10) as bigint) % 10 = 8 then 'val'"
            " else 'test' end"
        ).alias("split"),
    )
    leak = (
        a.groupBy("ck")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaky"))
    )
    return (
        a.crossJoin(F.broadcast(leak))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("ck").cast("bigint").alias("n_clusters"),
            F.max("n_leaky").alias("n_leaky_clusters"),
        )
    )


@query(
    "q285_markov_removal",
    """
    WITH ev AS (SELECT user_id, event_type AS et,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS rn
                FROM events),
    fp AS (SELECT user_id, min(rn) AS prn FROM ev
           WHERE et = 'purchase' GROUP BY user_id),
    mx AS (SELECT user_id, max(rn) AS mrn FROM ev GROUP BY user_id),
    kept AS (SELECT ev.user_id, ev.et, ev.rn
             FROM ev JOIN mx USING (user_id) LEFT JOIN fp USING (user_id)
             WHERE ev.rn <= coalesce(fp.prn, mx.mrn)),
    nx AS (SELECT user_id, et, rn,
                  lead(et) OVER (PARTITION BY user_id ORDER BY rn) AS nxt
           FROM kept),
    tr AS (SELECT et AS s, coalesce(nxt, 'end') AS t FROM nx
           WHERE et <> 'purchase'
           UNION ALL
           SELECT 'start' AS s, et AS t FROM nx WHERE rn = 1),
    cnt AS (SELECT s, t, cast(count(*) AS BIGINT) AS c FROM tr GROUP BY s, t),
    tot AS (SELECT s, cast(sum(c) AS BIGINT) AS n FROM cnt GROUP BY s),
    tm AS (SELECT cnt.s, cnt.t, cast(cnt.c * 1000000 // tot.n AS BIGINT) AS p
           FROM cnt JOIN tot USING (s)),
    chans AS (SELECT DISTINCT event_type AS ch FROM events
              WHERE event_type <> 'purchase'
              UNION ALL SELECT '__none__' AS ch),
    tt AS (SELECT chans.ch, tm.s, tm.t, tm.p FROM chans CROSS JOIN tm
           WHERE tm.s <> chans.ch AND tm.t <> chans.ch
           UNION ALL
           SELECT chans.ch, x.s, x.s AS t, cast(1000000 AS BIGINT) AS p
           FROM chans CROSS JOIN (SELECT 'purchase' AS s
                                  UNION ALL SELECT 'end' AS s) x),
    v0 AS (SELECT ch, 'start' AS st, cast(1000000 AS BIGINT) AS v
           FROM chans),
    v1 AS (SELECT tt.ch, tt.t AS st,
                  cast(sum(v0.v * tt.p) // 1000000 AS BIGINT) AS v
           FROM v0 JOIN tt ON v0.ch = tt.ch AND v0.st = tt.s
           GROUP BY tt.ch, tt.t),
    v2 AS (SELECT tt.ch, tt.t AS st,
                  cast(sum(v1.v * tt.p) // 1000000 AS BIGINT) AS v
           FROM v1 JOIN tt ON v1.ch = tt.ch AND v1.st = tt.s
           GROUP BY tt.ch, tt.t),
    v3 AS (SELECT tt.ch, tt.t AS st,
                  cast(sum(v2.v * tt.p) // 1000000 AS BIGINT) AS v
           FROM v2 JOIN tt ON v2.ch = tt.ch AND v2.st = tt.s
           GROUP BY tt.ch, tt.t),
    v4 AS (SELECT tt.ch, tt.t AS st,
                  cast(sum(v3.v * tt.p) // 1000000 AS BIGINT) AS v
           FROM v3 JOIN tt ON v3.ch = tt.ch AND v3.st = tt.s
           GROUP BY tt.ch, tt.t),
    pb AS (SELECT v AS base FROM v4
           WHERE ch = '__none__' AND st = 'purchase')
    SELECT c.ch AS channel,
           cast(pb.base AS BIGINT) AS p_base_ppm,
           cast(coalesce(v4.v, 0) AS BIGINT) AS p_removed_ppm,
           cast((pb.base - coalesce(v4.v, 0)) * 1000000 // pb.base
                AS BIGINT) AS removal_ppm
    FROM (SELECT ch FROM chans WHERE ch <> '__none__') c
    CROSS JOIN pb
    LEFT JOIN v4 ON v4.ch = c.ch AND v4.st = 'purchase'
    """,
    doc="Markov removal-effect attribution: journeys (truncated at "
    "first purchase) fit a first-order chain with absorbing "
    "'purchase'/'end' states; each channel's credit is how much the "
    "4-step start->purchase absorption probability DROPS when every "
    "transition through that channel is deleted (mass dies, no "
    "renormalization — the standard removal-effect definition that "
    "first/last-touch models q160/q219 cannot express because it "
    "prices a channel's mid-path role). The 4-step horizon is unrolled "
    "as four vector-matrix products over a |states|^2 ppm-quantized "
    "transition table — every product is (v*p) summed in int64 then "
    "div 1e6, so both engines agree bit-for-bit. The ONLY corpus-"
    "scale work is the per-user ordering window + one pair count; the "
    "chain solve runs on a metadata-sized frame replicated once per "
    "removed channel (|channels|+1 copies of a ~7x7 table).",
)
def q285_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev0 = _t(spark, sf_dir, "events")
    ev = ev0.select(
        "user_id",
        F.col("event_type").alias("et"),
        F.row_number()
        .over(
            W.partitionBy("user_id").orderBy(
                F.unix_micros("ts"), F.col("event_id")
            )
        )
        .alias("rn"),
    )
    fp = (
        ev.filter(F.col("et") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("prn"))
    )
    mx = ev.groupBy("user_id").agg(F.max("rn").alias("mrn"))
    kept = (
        ev.join(mx, "user_id")
        .join(fp, "user_id", "left")
        .filter(F.col("rn") <= F.coalesce("prn", "mrn"))
    )
    nx = kept.select(
        "user_id",
        "et",
        "rn",
        F.lead("et")
        .over(W.partitionBy("user_id").orderBy("rn"))
        .alias("nxt"),
    )
    tr = (
        nx.filter(F.col("et") != "purchase")
        .select(F.col("et").alias("s"), F.coalesce("nxt", F.lit("end")).alias("t"))
        .unionByName(
            nx.filter(F.col("rn") == 1).select(
                F.lit("start").alias("s"), F.col("et").alias("t")
            )
        )
    )
    cnt = tr.groupBy("s", "t").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = cnt.groupBy("s").agg(F.sum("c").cast("bigint").alias("n"))
    tm = cnt.join(tot, "s").select(
        "s", "t", F.expr("c * 1000000 div n").cast("bigint").alias("p")
    )
    chans = (
        ev0.select(F.col("event_type").alias("ch"))
        .filter(F.col("ch") != "purchase")
        .distinct()
        .unionByName(
            ev0.sparkSession.range(1).select(F.lit("__none__").alias("ch"))
        )
    )
    loops = ev0.sparkSession.createDataFrame(
        [("purchase",), ("end",)], "s string"
    )
    tt = (
        chans.crossJoin(tm)
        .filter((F.col("s") != F.col("ch")) & (F.col("t") != F.col("ch")))
        .select("ch", "s", "t", "p")
        .unionByName(
            chans.crossJoin(loops).select(
                "ch",
                "s",
                F.col("s").alias("t"),
                F.lit(1000000).cast("bigint").alias("p"),
            )
        )
        .localCheckpoint(eager=False)
    )
    v = chans.select(
        "ch", F.lit("start").alias("st"), F.lit(1000000).cast("bigint").alias("v")
    )
    for _ in range(4):
        vr = v.select(
            F.col("ch").alias("vch"),
            F.col("st").alias("vst"),
            F.col("v").alias("vv"),
        )
        v = (
            vr.join(
                tt,
                (F.col("vch") == F.col("ch")) & (F.col("vst") == F.col("s")),
            )
            .groupBy("ch", F.col("t").alias("st"))
            .agg(F.expr("cast(sum(vv * p) div 1000000 as bigint)").alias("v"))
        )
    v4 = v.filter(F.col("st") == "purchase").select("ch", "v")
    pb = v4.filter(F.col("ch") == "__none__").select(
        F.col("v").alias("base")
    )
    return (
        chans.filter(F.col("ch") != "__none__")
        .crossJoin(F.broadcast(pb))
        .join(F.broadcast(v4), "ch", "left")
        .select(
            F.col("ch").alias("channel"),
            F.col("base").cast("bigint").alias("p_base_ppm"),
            F.coalesce("v", F.lit(0)).cast("bigint").alias("p_removed_ppm"),
            F.expr("(base - coalesce(v, 0)) * 1000000 div base")
            .cast("bigint")
            .alias("removal_ppm"),
        )
    )


@query(
    "q286_stream_sessionize",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
    ), sess AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           user_id,
           cast(count(*) as bigint) AS n_events,
           cast(sum(cast(value as {DEC})) as double) AS session_value
    FROM sess GROUP BY user_id, sid
    """,
    doc="STREAMING gap-based sessionization: q35's session_window "
    "aggregate run as a real Structured Streaming job (file source -> "
    "4 micro-batches -> availableNow drain -> memory sink). Sessions "
    "are the one windowed shape where cross-batch state is NON-"
    "trivial: a session straddling micro-batches must be MERGED by "
    "the state store (open sessions extend and coalesce as adjacent "
    "events arrive), unlike tumbling windows where rows add into "
    "fixed buckets — this is the stateful-merge path the q34/q136/"
    "q193 suite doesn't exercise. Complete-mode drain emits every "
    "merged session, so the stream result provably equals the batch "
    "aggregate; the oracle is q35's lag/cumsum reconstruction, which "
    "checks BOTH the streaming merge and the session semantics. "
    "streaming/windows.py stream_session_windows.",
)
def q286_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.windows import stream_session_windows

    ev = _t(spark, sf_dir, "events")
    return stream_session_windows(spark, ev, gap="30 minutes")


@query(
    "q287_density_ratio_weights",
    """
    WITH b AS (SELECT n_chars // 100 AS bkt,
                      CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS is_t
               FROM documents),
    s AS (SELECT bkt,
                 cast(count(*) AS BIGINT) AS n_src,
                 cast(sum(is_t) AS BIGINT) AS n_tgt
          FROM b GROUP BY bkt),
    tot AS (SELECT cast(sum(n_src) AS BIGINT) AS ns,
                   cast(sum(n_tgt) AS BIGINT) AS nt
            FROM s)
    SELECT s.bkt AS bucket, s.n_src, s.n_tgt,
           cast(s.n_tgt * tot.ns * 1000000 // (tot.nt * s.n_src)
                AS BIGINT) AS w_ppm,
           cast(least(s.n_tgt * tot.ns * 1000000 // (tot.nt * s.n_src),
                      10000000) AS BIGINT) AS w_clipped_ppm
    FROM s CROSS JOIN tot
    """,
    doc="Density-ratio importance weights for distribution matching "
    "(the DSIR/DoReMi-lite move): reweight the full corpus so its "
    "length profile matches a curated target slice (src0), with "
    "per-bucket weight = (target density)/(source density) — "
    "documents in buckets the target favors are up-sampled, "
    "over-represented junk lengths are down-weighted, and w=0 "
    "buckets are absent from the target entirely. Weights are exact "
    "integer ppm (n_tgt*NS*1e6 div (NT*n_src) — headroom n_tgt*NS <= "
    "9.2e12 at ppm scale, i.e. fine to ~3e6 target docs x 3e6 corpus "
    "buckets; pre-divide beyond) plus the standard 10x clip that "
    "bounds sampling variance. One scan, one bucket aggregate, one "
    "broadcast total — the weight table is metadata-sized and joins "
    "back onto the corpus as a broadcast dim at apply time.",
)
def q287_density_ratio_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    b = docs.select(
        F.expr("n_chars div 100").alias("bkt"),
        F.when(F.col("source") == "src0", 1).otherwise(0).alias("is_t"),
    )
    s = b.groupBy("bkt").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
        F.sum("is_t").cast("bigint").alias("n_tgt"),
    )
    tot = s.agg(
        F.sum("n_src").cast("bigint").alias("ns"),
        F.sum("n_tgt").cast("bigint").alias("nt"),
    )
    return s.crossJoin(F.broadcast(tot)).select(
        F.col("bkt").alias("bucket"),
        "n_src",
        "n_tgt",
        F.expr("n_tgt * ns * 1000000 div (nt * n_src)")
        .cast("bigint")
        .alias("w_ppm"),
        F.expr(
            "least(n_tgt * ns * 1000000 div (nt * n_src),"
            " cast(10000000 as bigint))"
        )
        .cast("bigint")
        .alias("w_clipped_ppm"),
    )


@query(
    "q288_ngram_loops",
    rf"""
    WITH g AS (SELECT doc_id, source, unnest({_NGRAMS(8)}) AS g
               FROM documents),
    c AS (SELECT doc_id, source, g, cast(count(*) AS BIGINT) AS reps
          FROM g GROUP BY 1, 2, 3),
    m AS (SELECT doc_id, source, max(reps) AS max_reps
          FROM c GROUP BY 1, 2)
    SELECT source,
           cast(least(max_reps, 5) AS BIGINT) AS loop_bucket,
           cast(count(*) AS BIGINT) AS n_docs
    FROM m GROUP BY 1, 2
    """,
    doc="Degenerate-loop detector: the maximum repeat count of any "
    "single 8-gram WITHIN each document — the signature of broken "
    "generations and templated spam that q95's distinct/total "
    "repetition ratio misses when the loop is long (a doc repeating "
    "one 50-token paragraph 4x has high distinct-token ratio but "
    "max_reps=4). Census per source of docs by loop bucket (clipped "
    "at 5+: the decision is binary past that). Plan: one explode + "
    "one (doc, gram) hash aggregate + one per-doc max — the (doc, "
    "gram) key is the only wide shuffle, map-side combinable, and "
    "never leaves the per-doc domain, so it scales with corpus "
    "tokens, not vocabulary.",
)
def q288_ngram_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, word_ngrams

    docs = _t(spark, sf_dir, "documents")
    g = spread(docs.select("doc_id", "source", "text"), "doc_id").select(
        "doc_id",
        "source",
        F.explode(word_ngrams(F.col("text"), 8)).alias("g"),
    )
    c = g.groupBy("doc_id", "source", "g").agg(
        F.count(F.lit(1)).cast("bigint").alias("reps")
    )
    m = c.groupBy("doc_id", "source").agg(F.max("reps").alias("max_reps"))
    return m.groupBy(
        "source",
        F.least("max_reps", F.lit(5)).cast("bigint").alias("loop_bucket"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))


@query(
    "q289_kaplan_meier",
    """
    WITH s0 AS (SELECT user_id, min(epoch_us(ts)) AS t0 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    tmax AS (SELECT max(epoch_us(ts)) AS tm FROM events),
    pu AS (SELECT e.user_id, min(epoch_us(e.ts)) AS tp
           FROM events e JOIN s0 ON e.user_id = s0.user_id
           WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s0.t0
           GROUP BY e.user_id),
    du AS (SELECT s0.user_id,
                  CASE WHEN pu.tp IS NOT NULL
                       THEN (pu.tp - s0.t0) // 86400000000
                       ELSE (tmax.tm - s0.t0) // 86400000000 END AS d,
                  CASE WHEN pu.tp IS NOT NULL THEN 1 ELSE 0 END AS ev
           FROM s0 LEFT JOIN pu ON s0.user_id = pu.user_id
           CROSS JOIN tmax),
    h AS (SELECT d, cast(count(*) AS BIGINT) AS n_at,
                 cast(sum(ev) AS BIGINT) AS d_events
          FROM du GROUP BY d),
    r AS (SELECT d, d_events,
                 sum(n_at) OVER (ORDER BY d DESC
                                 ROWS UNBOUNDED PRECEDING) AS n_risk
          FROM h),
    km AS (SELECT d, n_risk, d_events,
                  cast(d_events * 1000000 // n_risk AS BIGINT)
                    AS hazard_ppm,
                  cast(floor(ln(cast(n_risk - d_events AS DOUBLE)
                                / cast(n_risk AS DOUBLE)) * 1000000)
                       AS BIGINT) AS loghaz_q
           FROM r WHERE d_events > 0 AND n_risk > d_events)
    SELECT cast(d AS BIGINT) AS day,
           cast(n_risk AS BIGINT) AS n_risk,
           d_events,
           hazard_ppm,
           cast(sum(loghaz_q) OVER (ORDER BY d
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cum_loghaz_q
    FROM km
    """,
    doc="Kaplan-Meier survival analysis of signup -> first purchase: "
    "per-user durations (right-censored at the observation horizon "
    "for never-purchasers), the daily risk table (n_risk via reverse "
    "cumulative sum over the duration histogram — a |days|-row "
    "metadata frame, so the global window is bounded, never "
    "corpus-scale), exact integer hazards, and the KM curve carried "
    "in LOG space as an integer cumsum of floor(ln((n-d)/n)*1e6) — "
    "the survival estimate is exp(cum/1e6) but the CUMSUM is what "
    "ships, because integer sums are bit-stable across engines and "
    "parallelism while a cumulative float product is not (ln of a "
    "ratio of two small integers has bounded distinct inputs — the "
    "q206 idf quantization argument). Days with zero events or with "
    "S hitting 0 are excluded per the standard KM tie handling.",
)
def q289_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    s0 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("t0"))
    )
    tmax = ev.agg(F.max(t_us).alias("tm"))
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t_us.alias("tpe"))
        .join(s0, "user_id")
        .filter(F.col("tpe") >= F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("tpe").alias("tp"))
    )
    du = (
        s0.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(tmax))
        .select(
            F.expr(
                "case when tp is not null then (tp - t0) div 86400000000"
                " else (tm - t0) div 86400000000 end"
            ).alias("d"),
            F.expr("case when tp is not null then 1 else 0 end").alias("ev"),
        )
    )
    h = du.groupBy("d").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_at"),
        F.sum("ev").cast("bigint").alias("d_events"),
    )
    wdesc = W.orderBy(F.col("d").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    r = h.select(
        "d", "d_events", F.sum("n_at").over(wdesc).alias("n_risk")
    )
    km = r.filter(
        (F.col("d_events") > 0) & (F.col("n_risk") > F.col("d_events"))
    ).select(
        "d",
        "n_risk",
        "d_events",
        F.expr("d_events * 1000000 div n_risk").cast("bigint").alias(
            "hazard_ppm"
        ),
        F.expr(
            "cast(floor(ln(cast(n_risk - d_events as double)"
            " / cast(n_risk as double)) * 1000000) as bigint)"
        ).alias("loghaz_q"),
    )
    wasc = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return km.select(
        F.col("d").cast("bigint").alias("day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        "d_events",
        "hazard_ppm",
        F.sum("loghaz_q").over(wasc).cast("bigint").alias("cum_loghaz_q"),
    )


@query(
    "q290_weighted_median",
    """
    WITH c AS (SELECT l_returnflag AS grp,
                      cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS v,
                      cast(floor(l_quantity + 0.5) AS BIGINT) AS w
               FROM lineitem),
    g AS (SELECT grp, v, cast(sum(w) AS BIGINT) AS cnt
          FROM c GROUP BY 1, 2),
    p AS (SELECT grp, v, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT grp, cast(sum(cnt) AS BIGINT) AS w_total
          FROM g GROUP BY 1)
    SELECT p.grp, t.w_total,
           cast(min(CASE WHEN pre < (w_total * 1 + 3) // 4
                          AND (w_total * 1 + 3) // 4 <= pre + cnt
                         THEN v END) AS BIGINT) AS p25,
           cast(min(CASE WHEN pre < (w_total * 1 + 1) // 2
                          AND (w_total * 1 + 1) // 2 <= pre + cnt
                         THEN v END) AS BIGINT) AS p50,
           cast(min(CASE WHEN pre < (w_total * 3 + 3) // 4
                          AND (w_total * 3 + 3) // 4 <= pre + cnt
                         THEN v END) AS BIGINT) AS p75
    FROM p JOIN t USING (grp) GROUP BY p.grp, t.w_total
    """,
    doc="Exact WEIGHTED quantiles per group: the price at cumulative-"
    "QUANTITY rank ceil(W*p) — every unit of quantity is one vote, so "
    "a 40-unit line outweighs a 1-unit line (the volume-weighted "
    "median that q59/q209's row quantiles misstate whenever weight "
    "correlates with value). Engine side: operators/stats.py "
    "grouped_weighted_quantiles — per-(group, value) weight sums, "
    "bucket-partitioned distributed prefix sums (NO partition-less "
    "ordering of the fact table), one conditional min per quantile; "
    "the oracle spells the same CDF with a plain per-group window, "
    "which DuckDB may single-thread but the differential only needs "
    "for values. All three quantiles come from ONE pass over the "
    "count table.",
)
def q290_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_weighted_quantiles

    li = _t(spark, sf_dir, "lineitem")
    return grouped_weighted_quantiles(
        li,
        F.col("l_returnflag"),
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)"),
        F.expr("cast(floor(l_quantity + 0.5) as bigint)"),
        [("p25", 1, 4), ("p50", 1, 2), ("p75", 3, 4)],
        bucket_width=100000,
    ).select(
        F.col("grp"), "w_total", "p25", "p50", "p75"
    )


@query(
    "q291_funnel_windows",
    """
    WITH s AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
               WHERE event_type = 'signup' GROUP BY user_id),
    c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
          FROM events e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'click'
            AND epoch_us(e.ts) >= s.t
            AND epoch_us(e.ts) <= s.t + 604800000000
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND epoch_us(e.ts) >= c.t
            AND epoch_us(e.ts) <= c.t + 2592000000000
          GROUP BY e.user_id),
    n AS (SELECT cast((SELECT count(*) FROM s) AS BIGINT) AS ns,
                 cast((SELECT count(*) FROM c) AS BIGINT) AS nc,
                 cast((SELECT count(*) FROM p) AS BIGINT) AS np)
    SELECT stage, n_users,
           cast(n_users * 1000000 // ns AS BIGINT) AS conv_ppm
    FROM (SELECT 1 AS stage, ns AS n_users, ns FROM n
          UNION ALL SELECT 2, nc, ns FROM n
          UNION ALL SELECT 3, np, ns FROM n) x
    """,
    doc="Time-constrained funnel: signup -> first click WITHIN 7 days "
    "-> first purchase WITHIN 30 days of that click. Unlike q82's "
    "ordered-containment funnel, each stage has a max-delay window "
    "anchored at the PREVIOUS stage's qualifying event (the product-"
    "analytics definition: late conversions don't count, and the "
    "clock restarts at each stage). Each stage is one aggregate + "
    "one co-partitioned join on user_id — the same shuffle key end "
    "to end, so Catalyst reuses the partitioning; conversion ppm is "
    "exact integer against the stage-1 cohort.",
)
def q291_funnel_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("ts0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", t_us.alias("tc"))
        .join(s, "user_id")
        .filter(
            (F.col("tc") >= F.col("ts0"))
            & (F.col("tc") <= F.col("ts0") + F.lit(604800000000))
        )
        .groupBy("user_id")
        .agg(F.min("tc").alias("tc0"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", t_us.alias("tp"))
        .join(c, "user_id")
        .filter(
            (F.col("tp") >= F.col("tc0"))
            & (F.col("tp") <= F.col("tc0") + F.lit(2592000000000))
        )
        .groupBy("user_id")
        .agg(F.min("tp").alias("tp0"))
    )
    ns = s.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
        F.lit(1).alias("stage"), F.col("n").alias("n_users")
    )
    nc = c.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
        F.lit(2).alias("stage"), F.col("n").alias("n_users")
    )
    np_ = p.agg(F.count(F.lit(1)).cast("bigint").alias("n")).select(
        F.lit(3).alias("stage"), F.col("n").alias("n_users")
    )
    base = s.agg(F.count(F.lit(1)).cast("bigint").alias("ns"))
    return (
        ns.unionByName(nc)
        .unionByName(np_)
        .crossJoin(F.broadcast(base))
        .select(
            "stage",
            "n_users",
            F.expr("n_users * 1000000 div ns").cast("bigint").alias(
                "conv_ppm"
            ),
        )
    )


@query(
    "q292_audience_cosine",
    """
    WITH ue AS (SELECT DISTINCT user_id, event_type FROM events),
    sz AS (SELECT event_type, cast(count(*) AS BIGINT) AS n
           FROM ue GROUP BY 1),
    pr AS (SELECT a.event_type AS et_a, b.event_type AS et_b,
                  cast(count(*) AS BIGINT) AS n_both
           FROM ue a JOIN ue b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT pr.et_a, pr.et_b, sa.n AS n_a, sb.n AS n_b, pr.n_both,
           cast(floor(cast(pr.n_both AS DOUBLE)
                      / (sqrt(cast(sa.n AS DOUBLE))
                         * sqrt(cast(sb.n AS DOUBLE))) * 1000000)
                AS BIGINT) AS cosine_ppm
    FROM pr JOIN sz sa ON pr.et_a = sa.event_type
            JOIN sz sb ON pr.et_b = sb.event_type
    """,
    doc="Audience-overlap cosine between event types (set cosine = "
    "|A n B| / sqrt(|A||B|)) — the co-engagement matrix behind "
    "'users who do X also do Y' surfaces and behavior-segment "
    "merges. Per-user pair fan-out is bounded by the event-type "
    "vocabulary (<= C(5,2) pairs/user here; never |users|^2): the "
    "distinct (user, type) frame self-joins on user_id, and both "
    "sides arrive on the same shuffle key. Sizes join back by type "
    "key (broadcast dims), and the single float expression (one "
    "division by a sqrt product in fixed order) quantizes to ppm "
    "over exact integer set sizes.",
)
def q292_audience_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ue = ev.select("user_id", "event_type").distinct()
    sz = ue.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = ue.select("user_id", F.col("event_type").alias("et_a"))
    b = ue.select("user_id", F.col("event_type").alias("et_b"))
    pr = (
        a.join(b, "user_id")
        .filter(F.col("et_a") < F.col("et_b"))
        .groupBy("et_a", "et_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    return (
        pr.join(
            F.broadcast(
                sz.select(F.col("event_type").alias("et_a"), F.col("n").alias("n_a"))
            ),
            "et_a",
        )
        .join(
            F.broadcast(
                sz.select(F.col("event_type").alias("et_b"), F.col("n").alias("n_b"))
            ),
            "et_b",
        )
        .select(
            "et_a",
            "et_b",
            "n_a",
            "n_b",
            "n_both",
            F.expr(
                "cast(floor(cast(n_both as double)"
                " / (sqrt(cast(n_a as double)) * sqrt(cast(n_b as double)))"
                " * 1000000) as bigint)"
            ).alias("cosine_ppm"),
        )
    )


@query(
    "q293_range_boundaries",
    """
    WITH c AS (SELECT cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS v
               FROM lineitem),
    g AS (SELECT v, cast(count(*) AS BIGINT) AS cnt FROM c GROUP BY v),
    p AS (SELECT v, cnt,
                 coalesce(sum(cnt) OVER (ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT cast(sum(cnt) AS BIGINT) AS n FROM g),
    q AS (SELECT i, min(CASE WHEN pre < (n * i + 31) // 32
                          AND (n * i + 31) // 32 <= pre + cnt
                         THEN v END) AS cut
          FROM p CROSS JOIN t
          CROSS JOIN (SELECT unnest(range(1, 32)) AS i)
          GROUP BY i),
    cuts AS (SELECT list(cut ORDER BY i) AS ca FROM q),
    asn AS (SELECT len(list_filter(cuts.ca, x -> c.v > x)) AS part, c.v
            FROM c CROSS JOIN cuts)
    SELECT cast(part AS INT) AS part,
           cast(count(*) AS BIGINT) AS n_rows,
           cast(min(v) AS BIGINT) AS v_min,
           cast(max(v) AS BIGINT) AS v_max,
           cast(count(*) * 32 * 1000000 // max(t.n) AS BIGINT)
             AS fill_ppm
    FROM asn CROSS JOIN t GROUP BY part
    """,
    doc="Range-partition planner + balance audit: exact 1/32 rank "
    "boundaries of the sort key (the job Spark's RangePartitioner "
    "does by sampling, done here EXACTLY via the q209 bucket-"
    "partitioned CDF machinery — no corpus sort, no sampling error), "
    "then every row is assigned its partition by counting boundary "
    "values below it (a 31-element broadcast array scanned per row, "
    "branch-free) and the census reports per-partition row counts "
    "and fill factor vs ideal (1e6 ppm = perfectly balanced; heavy "
    "duplicate keys surface as >1e6 partitions that a planner would "
    "split by a secondary key). This is the pre-flight check before "
    "any global sort / sorted-write at scale.",
)
def q293_range_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias(
            "v"
        )
    )
    cuts_wide = grouped_quantiles(
        v.select(F.lit(0).alias("g"), "v"),
        F.col("g"),
        F.col("v"),
        [(f"c{i:02d}", i, 32) for i in range(1, 32)],
        bucket_width=100000,
    )
    cuts = cuts_wide.select(
        F.array(*[F.col(f"c{i:02d}") for i in range(1, 32)]).alias("ca"),
        F.col("n"),
    )
    asn = v.crossJoin(F.broadcast(cuts)).select(
        F.expr("size(filter(ca, x -> v > x))").alias("part"), "v", "n"
    )
    return asn.groupBy(F.col("part").cast("int").alias("part")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.min("v").cast("bigint").alias("v_min"),
        F.max("v").cast("bigint").alias("v_max"),
        F.expr("count(*) * 32 * 1000000 div max(n)")
        .cast("bigint")
        .alias("fill_ppm"),
    )


@query(
    "q294_vopt_histogram",
    """
    WITH x AS (SELECT greatest(0, least(63,
                 cast(floor((cast(embedding[1] AS DOUBLE) + 2.0) * 16)
                      AS BIGINT))) AS b
               FROM embeddings),
    f0 AS (SELECT b, cast(count(*) AS BIGINT) AS f FROM x GROUP BY b),
    spine AS (SELECT unnest(range(0, 64)) AS b),
    f AS (SELECT spine.b, coalesce(f0.f, 0) AS f
          FROM spine LEFT JOIN f0 USING (b)),
    pf AS (SELECT b, f,
                  sum(f) OVER (ORDER BY b
                               ROWS UNBOUNDED PRECEDING) AS p1,
                  sum(f * f) OVER (ORDER BY b
                                   ROWS UNBOUNDED PRECEDING) AS p2
           FROM f),
    seg AS (SELECT i.b AS i, j.b AS j,
                   (j.p2 - coalesce(ip.p2, 0))
                   - (j.p1 - coalesce(ip.p1, 0))
                     * (j.p1 - coalesce(ip.p1, 0))
                     // (j.b - i.b + 1) AS cost
            FROM pf i JOIN pf j ON i.b <= j.b
            LEFT JOIN pf ip ON ip.b = i.b - 1),
    dp1 AS (SELECT j, cost AS c FROM seg WHERE i = 0),
    dp2 AS (SELECT seg.j,
                   min((dp1.c + seg.cost) * 100 + dp1.j) AS k
            FROM dp1 JOIN seg ON seg.i = dp1.j + 1
            GROUP BY seg.j),
    dp3 AS (SELECT seg.j,
                   min((dp2.k // 100 + seg.cost) * 100 + dp2.j) AS k
            FROM dp2 JOIN seg ON seg.i = dp2.j + 1
            GROUP BY seg.j),
    dp4 AS (SELECT min((dp3.k // 100 + seg.cost) * 100 + dp3.j) AS k
            FROM dp3 JOIN seg ON seg.i = dp3.j + 1
            WHERE seg.j = 63),
    bt3 AS (SELECT dp4.k // 100 AS total, dp4.k % 100 AS b3 FROM dp4),
    bt2 AS (SELECT bt3.total, bt3.b3, dp3.k % 100 AS b2
            FROM bt3 JOIN dp3 ON dp3.j = bt3.b3),
    bt1 AS (SELECT bt2.total, bt2.b3, bt2.b2, dp2.k % 100 AS b1
            FROM bt2 JOIN dp2 ON dp2.j = bt2.b2)
    SELECT cast(4 AS INT) AS k,
           cast(total AS BIGINT) AS total_cost_q,
           cast(b1 AS INT) AS b1, cast(b2 AS INT) AS b2,
           cast(b3 AS INT) AS b3
    FROM bt1
    """,
    doc="V-optimal histogram (Jagadish et al.) solved EXACTLY by "
    "dynamic programming in both engines: partition the 64-bin "
    "frequency vector of embedding dim 1 into k=4 buckets minimizing "
    "total within-bucket SSE of frequencies — the histogram a "
    "cost-based optimizer keeps for selectivity estimation, where "
    "equi-width wastes bins on flat regions. The DP runs over "
    "METADATA: prefix sums of f and f^2 give every segment cost as "
    "exact integer arithmetic (floor-quantized s2 - s1^2 div cnt — "
    "f^2 sums need N <= ~3e9 rows per bin before int64 pressure), "
    "and the three unrolled DP layers are joins over a 64x64 cost "
    "table with argmin backtracking packed as cost*100 + split "
    "(deterministic min, no max_by tie ambiguity). ONE corpus-scale "
    "stage exists: the initial bin count. Output: optimal cost and "
    "the three split positions.",
)
def q294_vopt_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    x = emb.select(
        F.expr(
            "greatest(cast(0 as bigint), least(cast(63 as bigint),"
            " cast(floor((cast(element_at(embedding, 1) as double) + 2.0)"
            " * 16) as bigint)))"
        ).alias("b")
    )
    f0 = x.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    spine = emb.sparkSession.range(0, 64).select(F.col("id").alias("b"))
    f = spine.join(f0, "b", "left").select(
        "b", F.coalesce("f", F.lit(0)).cast("bigint").alias("f")
    )
    wp = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
    pf = f.select(
        "b",
        "f",
        F.sum("f").over(wp).alias("p1"),
        F.sum(F.col("f") * F.col("f")).over(wp).alias("p2"),
    ).localCheckpoint(eager=False)
    pi = pf.select(
        (F.col("b") + 1).alias("bi"),
        F.col("p1").alias("q1"),
        F.col("p2").alias("q2"),
    )
    seg = (
        pf.select(F.col("b").alias("j"), "p1", "p2")
        .crossJoin(
            pf.select(F.col("b").alias("i")).unionByName(
                spine.limit(0).select(F.col("b").alias("i"))
            )
        )
        .filter(F.col("i") <= F.col("j"))
        .join(pi, F.col("bi") == F.col("i"), "left")
        .select(
            "i",
            "j",
            (
                (F.col("p2") - F.coalesce("q2", F.lit(0)))
                - F.expr(
                    "(p1 - coalesce(q1, 0)) * (p1 - coalesce(q1, 0))"
                    " div (j - i + 1)"
                )
            ).alias("cost"),
        )
        .localCheckpoint(eager=False)
    )
    dp1 = seg.filter(F.col("i") == 0).select("j", F.col("cost").alias("c"))
    d1 = dp1.select(F.col("j").alias("pj"), "c")
    dp2 = (
        seg.join(d1, F.col("i") == F.col("pj") + 1)
        .groupBy("j")
        .agg(F.min(F.expr("(c + cost) * 100 + pj")).alias("k"))
    )
    d2 = dp2.select(F.col("j").alias("pj"), F.col("k").alias("pk"))
    dp3 = (
        seg.join(d2, F.col("i") == F.col("pj") + 1)
        .groupBy("j")
        .agg(F.min(F.expr("(pk div 100 + cost) * 100 + pj")).alias("k"))
    )
    d3 = dp3.select(F.col("j").alias("pj"), F.col("k").alias("pk"))
    dp4 = (
        seg.filter(F.col("j") == 63)
        .join(d3, F.col("i") == F.col("pj") + 1)
        .agg(F.min(F.expr("(pk div 100 + cost) * 100 + pj")).alias("k"))
    )
    bt3 = dp4.select(
        F.expr("k div 100").alias("total"), F.expr("k % 100").alias("b3")
    )
    bt2 = bt3.join(
        F.broadcast(dp3.select(F.col("j").alias("b3"), F.expr("k % 100").alias("b2"))),
        "b3",
    )
    bt1 = bt2.join(
        F.broadcast(dp2.select(F.col("j").alias("b2"), F.expr("k % 100").alias("b1"))),
        "b2",
    )
    return bt1.select(
        F.lit(4).cast("int").alias("k"),
        F.col("total").cast("bigint").alias("total_cost_q"),
        F.col("b1").cast("int").alias("b1"),
        F.col("b2").cast("int").alias("b2"),
        F.col("b3").cast("int").alias("b3"),
    )


@query(
    "q295_stream_enrich",
    f"""
    SELECT epoch_us(e.ts) // 86400000000 AS day_idx,
           cast(n.n_regionkey AS INT) AS region,
           cast(count(*) AS BIGINT) AS n_events,
           cast(sum(cast(e.value AS {DEC})) AS DOUBLE) AS total_value
    FROM events e JOIN nation n
      ON cast(e.user_id % 25 AS INT) = n.n_nationkey
    GROUP BY 1, 2
    """,
    doc="STREAM-STATIC enrichment join + keyed rollup: the serving-"
    "pipeline staple where a fact stream joins a broadcast dimension "
    "(nation -> region here) with NO stream-stream state — each "
    "micro-batch joins map-side, and the only streaming state is the "
    "rollup aggregate itself (mergeable counts/DECIMAL sums, the "
    "q136 family). Distinct from q66/q156, which exercise the "
    "stateful two-stream path; this is the shape that should NEVER "
    "pay that state cost. Complete-mode availableNow drain makes the "
    "result equal the batch join+aggregate — the oracle. "
    "streaming/windows.py stream_enriched_rollup.",
)
def q295_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.streaming.windows import stream_enriched_rollup

    ev = _t(spark, sf_dir, "events")
    na = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    return stream_enriched_rollup(spark, ev, na)


@query(
    "q296_rfm_segments",
    """
    WITH rfm AS (SELECT o_custkey,
                        cast(max(epoch_us(o_orderdate)) AS BIGINT) AS r,
                        cast(count(*) AS BIGINT) AS f,
                        cast(sum(cast(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT)) AS BIGINT) AS m
                 FROM orders GROUP BY o_custkey),
    m0 AS (SELECT o_custkey, 'r' AS dim, r AS v FROM rfm
           UNION ALL SELECT o_custkey, 'f', f FROM rfm
           UNION ALL SELECT o_custkey, 'm', m FROM rfm),
    g AS (SELECT dim, v, cast(count(*) AS BIGINT) AS cnt
          FROM m0 GROUP BY 1, 2),
    p AS (SELECT dim, v, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY dim ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT dim, cast(sum(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
    q AS (SELECT p.dim, i,
                 min(CASE WHEN pre < (n * i + 2) // 3
                       AND (n * i + 2) // 3 <= pre + cnt
                          THEN v END) AS cut
          FROM p JOIN t USING (dim)
          CROSS JOIN (SELECT unnest(range(1, 3)) AS i)
          GROUP BY 1, 2),
    cuts AS (SELECT dim,
                    min(CASE WHEN i = 1 THEN cut END) AS c1,
                    min(CASE WHEN i = 2 THEN cut END) AS c2
             FROM q GROUP BY dim),
    sc AS (SELECT m0.o_custkey, m0.dim,
                  CASE WHEN m0.v <= cuts.c1 THEN 1
                       WHEN m0.v <= cuts.c2 THEN 2 ELSE 3 END AS s
           FROM m0 JOIN cuts USING (dim)),
    pv AS (SELECT o_custkey,
                  max(CASE WHEN dim = 'r' THEN s END) AS r_score,
                  max(CASE WHEN dim = 'f' THEN s END) AS f_score,
                  max(CASE WHEN dim = 'm' THEN s END) AS m_score
           FROM sc GROUP BY o_custkey)
    SELECT cast(r_score AS INT) AS r_score,
           cast(f_score AS INT) AS f_score,
           cast(m_score AS INT) AS m_score,
           cast(count(*) AS BIGINT) AS n_cust
    FROM pv GROUP BY 1, 2, 3
    """,
    doc="RFM customer segmentation with EXACT tercile boundaries: "
    "recency (last order time), frequency (order count), monetary "
    "(lifetime cents) each score 1-3 at exact rank-ceil(n*p) "
    "terciles, giving the classic 27-cell segment census. The three "
    "dimensions melt into one (dim, value) frame so a SINGLE "
    "grouped-CDF pass (operators/stats.py machinery, prefix sums "
    "partitioned per dim — never a corpus sort) prices all six cuts; "
    "cuts broadcast back, scores pivot with max(case), census is one "
    "27-key aggregate. Tie policy is <= on both engines, so boundary "
    "customers land deterministically.",
)
def q296_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    o = _t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max(F.unix_micros("o_orderdate")).cast("bigint").alias("r"),
        F.count(F.lit(1)).cast("bigint").alias("f"),
        F.sum(F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("m"),
    ).localCheckpoint(eager=False)
    m0 = (
        rfm.select("o_custkey", F.lit("r").alias("dim"), F.col("r").alias("v"))
        .unionByName(
            rfm.select("o_custkey", F.lit("f").alias("dim"), F.col("f").alias("v"))
        )
        .unionByName(
            rfm.select("o_custkey", F.lit("m").alias("dim"), F.col("m").alias("v"))
        )
    )
    cuts = grouped_quantiles(
        m0.select(F.col("dim").alias("g"), "v"),
        F.col("g"),
        F.col("v"),
        [("c1", 1, 3), ("c2", 2, 3)],
        bucket_width=1000000,
    ).select(F.col("grp").alias("dim"), "c1", "c2")
    sc = m0.join(F.broadcast(cuts), "dim").select(
        "o_custkey",
        "dim",
        F.expr(
            "case when v <= c1 then 1 when v <= c2 then 2 else 3 end"
        ).alias("s"),
    )
    pv = sc.groupBy("o_custkey").agg(
        F.max(F.expr("case when dim = 'r' then s end")).alias("r_score"),
        F.max(F.expr("case when dim = 'f' then s end")).alias("f_score"),
        F.max(F.expr("case when dim = 'm' then s end")).alias("m_score"),
    )
    return pv.groupBy(
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_cust"))


@query(
    "q297_ccnet_buckets",
    rf"""
    WITH tok AS (SELECT doc_id, lang, unnest({_TOKS}) AS term
                 FROM documents),
    v AS (SELECT term, cast(count(*) AS BIGINT) AS c FROM tok
          GROUP BY term),
    tot AS (SELECT cast(sum(c) AS BIGINT) AS s FROM v),
    d AS (SELECT tok.doc_id, tok.lang,
                 cast(sum(cast(floor(-ln(v.c::DOUBLE / tot.s::DOUBLE)
                                     * 1000000) AS BIGINT))
                      // count(*) AS BIGINT) AS nll_q
          FROM tok JOIN v USING (term) CROSS JOIN tot
          GROUP BY tok.doc_id, tok.lang),
    g AS (SELECT lang, nll_q AS v, cast(count(*) AS BIGINT) AS cnt
          FROM d GROUP BY 1, 2),
    p AS (SELECT lang, v, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT lang, cast(sum(cnt) AS BIGINT) AS n FROM g GROUP BY 1),
    q AS (SELECT p.lang, i,
                 min(CASE WHEN pre < (n * i + 2) // 3
                       AND (n * i + 2) // 3 <= pre + cnt
                          THEN v END) AS cut
          FROM p JOIN t USING (lang)
          CROSS JOIN (SELECT unnest(range(1, 3)) AS i)
          GROUP BY 1, 2),
    cuts AS (SELECT lang,
                    min(CASE WHEN i = 1 THEN cut END) AS c1,
                    min(CASE WHEN i = 2 THEN cut END) AS c2
             FROM q GROUP BY lang)
    SELECT d.lang,
           CASE WHEN d.nll_q <= cuts.c1 THEN 'head'
                WHEN d.nll_q <= cuts.c2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           cast(count(*) AS BIGINT) AS n_docs,
           cast(sum(d.nll_q) // count(*) AS BIGINT) AS mean_nll_q
    FROM d JOIN cuts USING (lang)
    GROUP BY 1, 2
    """,
    doc="CCNet-style head/middle/tail quality split: per-document "
    "mean unigram NLL (integer micro-nats — floor(-ln(c/s)*1e6) per "
    "token summed then divided, so the per-doc score is an exact "
    "int64, unlike q105's rounded float mean) bucketed at PER-"
    "LANGUAGE exact terciles — the split CCNet uses to stage "
    "pretraining data by fluency, computed per language because NLL "
    "scales are not comparable across languages. Terciles come from "
    "the grouped-CDF machinery partitioned by lang (no corpus sort); "
    "the census reports per-(lang, bucket) doc counts and mean "
    "micro-nat NLL. Three shuffles total: term counts, per-doc "
    "aggregate, census.",
)
def q297_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    tok = spread(docs.select("doc_id", "lang", "text"), "doc_id").select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    )
    v = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = v.agg(F.sum("c").cast("bigint").alias("s"))
    d = (
        tok.join(F.broadcast(v), "term")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.expr(
                "cast(sum(cast(floor(-ln(cast(c as double)"
                " / cast(s as double)) * 1000000) as bigint))"
                " div count(*) as bigint)"
            ).alias("nll_q")
        )
        .localCheckpoint(eager=False)
    )
    cuts = grouped_quantiles(
        d.select(F.col("lang").alias("g"), F.col("nll_q").alias("v")),
        F.col("g"),
        F.col("v"),
        [("c1", 1, 3), ("c2", 2, 3)],
        bucket_width=100000,
    ).select(F.col("grp").alias("lang"), "c1", "c2")
    return (
        d.join(F.broadcast(cuts), "lang")
        .groupBy(
            "lang",
            F.expr(
                "case when nll_q <= c1 then 'head'"
                " when nll_q <= c2 then 'middle' else 'tail' end"
            ).alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.expr("cast(sum(nll_q) div count(*) as bigint)").alias(
                "mean_nll_q"
            ),
        )
    )


@query(
    "q298_mrl_recall",
    """
    WITH c AS (SELECT vec_id,
                      list_transform(embedding, x ->
                        cast(floor(cast(x AS DOUBLE) * 1000000) AS BIGINT))
                        AS ea
               FROM embeddings),
    p AS (SELECT vec_id AS pid, ea AS pea FROM c WHERE vec_id % 97 = 0),
    d AS (SELECT p.pid, c.vec_id,
                 cast(list_sum(list_transform(range(1, 17),
                      i -> c.ea[i] * p.pea[i])) AS BIGINT) AS d16,
                 cast(list_sum(list_transform(range(1, len(c.ea) + 1),
                      i -> c.ea[i] * p.pea[i])) AS BIGINT) AS d64
          FROM c CROSS JOIN p WHERE c.vec_id <> p.pid),
    r AS (SELECT pid, vec_id,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY d16 DESC, vec_id) AS r16,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY d64 DESC, vec_id) AS r64
          FROM d),
    m AS (SELECT pid,
                 cast(sum(CASE WHEN r16 <= 10 AND r64 <= 10
                               THEN 1 ELSE 0 END) AS BIGINT) AS matched
          FROM r GROUP BY pid)
    SELECT matched AS n_matched, cast(count(*) AS BIGINT) AS n_probes
    FROM m GROUP BY matched
    """,
    doc="Matryoshka (MRL) truncation audit: recall@10 of the 16-dim "
    "PREFIX dot-product ranking against the full 64-dim exact "
    "ranking for the deterministic 1% probe set — the acceptance "
    "gate for serving truncated embeddings at 4x less memory and "
    "bandwidth (the MRL paper's operational promise; embeddings NOT "
    "trained with matryoshka loss fail exactly this census, which is "
    "the point of running it). Same exact-integer audit regime as "
    "q283: quantized dots, vec_id tie-breaks, probes broadcast, one "
    "corpus scan.",
)
def q298_mrl_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        "vec_id",
        F.expr(
            "transform(embedding, x ->"
            " cast(floor(cast(x as double) * 1000000) as bigint))"
        ).alias("ea"),
    )
    p = c.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("pid"), F.col("ea").alias("pea")
    )
    d = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "vec_id",
            F.expr(
                "aggregate(zip_with(slice(ea, 1, 16), slice(pea, 1, 16),"
                " (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("d16"),
            F.expr(
                "aggregate(zip_with(ea, pea, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("d64"),
        )
    )
    w16 = W.partitionBy("pid").orderBy(F.col("d16").desc(), "vec_id")
    w64 = W.partitionBy("pid").orderBy(F.col("d64").desc(), "vec_id")
    r = d.select(
        "pid",
        F.row_number().over(w16).alias("r16"),
        F.row_number().over(w64).alias("r64"),
    )
    m = r.groupBy("pid").agg(
        F.sum(F.expr("case when r16 <= 10 and r64 <= 10 then 1 else 0 end"))
        .cast("bigint")
        .alias("matched")
    )
    return m.groupBy(F.col("matched").alias("n_matched")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes")
    )


@query(
    "q299_maxsim_retrieval",
    """
    WITH c AS (SELECT vec_id,
                      list_transform(range(0, 8), k ->
                        list_transform(range(1, 9), i ->
                          cast(floor(cast(embedding[cast(k * 8 + i AS INT)]
                                          AS DOUBLE) * 10000) AS BIGINT)))
                        AS sub
               FROM embeddings),
    p AS (SELECT vec_id AS pid, sub AS psub FROM c
          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
    s AS (SELECT p.pid, c.vec_id,
                 cast(list_sum(list_transform(p.psub, pv ->
                        list_max(list_transform(c.sub, dv ->
                          list_sum(list_transform(range(1, 9),
                            i -> pv[i] * dv[i]))))))
                      AS BIGINT) AS score_q
          FROM c CROSS JOIN p WHERE c.vec_id <> p.pid),
    r AS (SELECT pid, vec_id, score_q,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY score_q DESC, vec_id) AS rk
          FROM s)
    SELECT pid, vec_id, cast(rk AS INT) AS rk, score_q
    FROM r WHERE rk <= 10
    """,
    doc="Late-interaction MaxSim retrieval (ColBERT scoring shape): "
    "each vector splits into 8 sub-vectors of 8 dims; a probe scores "
    "a document as sum over PROBE sub-vectors of the max dot against "
    "any DOCUMENT sub-vector — the asymmetric token-level matching "
    "that single-vector cosine cannot express (a probe facet matches "
    "its best counterpart, not the average). All dots are exact "
    "integer (floor(x*1e4) per coordinate: 8-term dot <= 8e8, x8 "
    "sub-scores — far inside int64), the nested max/sum runs "
    "JVM-side per pair with zero explode. Probes are a FIXED "
    "16-vector panel (md5-rank top-16, deterministic): the "
    "broadcast side is constant at any corpus size — a modulo "
    "sample would grow O(N) and blow the broadcast threshold — and "
    "pair volume is 16 x N, the linear rerank-audit regime; "
    "production buckets candidates by an ANN first stage "
    "(similarity.py IVF) and applies this scoring as the rerank.",
)
def q299_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    # spread(): single-file fixture scans as one partition; the 16xN
    # MaxSim fan-out and per-pid top-k need every core (q311 lesson).
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(sequence(0, 7), k ->"
                " transform(slice(embedding, k * 8 + 1, 8), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint)))"
            ).alias("sub"),
        ),
        "vec_id",
    )
    # Fixed 16-probe panel (md5-rank top-16): constant broadcast side
    # at any corpus size; TakeOrderedAndProject, no global sort.
    p = (
        c.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("pid"), F.col("sub").alias("psub"))
    )
    s = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "vec_id",
            F.expr(
                "cast(aggregate(transform(psub, pv ->"
                " array_max(transform(sub, dv ->"
                " aggregate(zip_with(pv, dv, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)))),"
                " cast(0 as bigint), (acc, v) -> acc + v) as bigint)"
            ).alias("score_q"),
        )
    )
    w = W.partitionBy("pid").orderBy(F.col("score_q").desc(), "vec_id")
    return (
        s.select("pid", "vec_id", F.row_number().over(w).alias("rk"), "score_q")
        .filter(F.col("rk") <= 10)
        .select("pid", "vec_id", F.col("rk").cast("int").alias("rk"), "score_q")
    )


@query(
    "q300_local_supplier_revenue",
    """
    SELECT n.n_name,
           cast(sum(cast(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_q,
           cast(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape (local supplier revenue): the six-way join "
    "with a FACT-FACT edge (lineitem-orders) plus a correlated dim "
    "condition (customer and supplier in the SAME nation) that "
    "cannot be pushed into either dim alone — the canonical "
    "join-order/strategy exhibit beyond q22's pure star. Plan: "
    "supplier/customer/nation/region broadcast; lineitem-orders is "
    "the one shuffled join (both sides on orderkey), and the region "
    "filter prunes through nation -> supplier BEFORE the fact join "
    "feeds it (predicate transitivity Catalyst derives). Revenue is "
    "the standard extprice*(1-discount), floor-quantized at 1e4 per "
    "line so the rollup is an exact int64 sum — immune to both float "
    "order and DECIMAL rounding-mode divergence.",
)
def q300_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    o = t["orders"].select("o_orderkey", "o_custkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    n = t["nation"].select("n_nationkey", "n_regionkey", "n_name")
    r = t["region"].filter(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount)"
                    " * 10000 + 0.5) as bigint)"
                )
            )
            .cast("bigint")
            .alias("revenue_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


@query(
    "q301_two_phase_topk",
    """
    WITH b AS (SELECT c_nationkey,
                      cast(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                        AS bal,
                      c_custkey
               FROM customer),
    r AS (SELECT c_nationkey, bal, c_custkey,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY bal DESC, c_custkey) AS rk
          FROM b)
    SELECT cast(c_nationkey AS INT) AS nation,
           cast(rk AS INT) AS rk,
           c_custkey, bal
    FROM r WHERE rk <= 5
    """,
    doc="Two-phase top-k per group WITHOUT a per-group window: phase 1 "
    "computes top-5 within each (group, salt) shard — pmod(hash(id), "
    "8) salts — via sorted-array-slice aggregation, phase 2 merges "
    "the <= 8x5 shard survivors per group the same way. Exact by the "
    "union bound (every global top-5 row is top-5 in its own shard), "
    "and the plan property this buys at scale: NO task ever holds a "
    "full group — a window spelling funnels each group through one "
    "task, fatal when groups are heavy-hitter-skewed (one nation = "
    "half the corpus). The per-shard state is k structs, map-side "
    "combinable; ranks come from posexplode of the final sorted "
    "slice. The oracle (and test twin) IS the window spelling — the "
    "differential proves the two-phase merge loses nothing.",
)
def q301_two_phase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    b = cu.select(
        F.col("c_nationkey").cast("int").alias("nation"),
        F.expr("cast(floor(c_acctbal * 100 + 0.5) as bigint)").alias("bal"),
        "c_custkey",
        F.pmod(F.hash("c_custkey"), F.lit(8)).alias("salt"),
    )
    phase1 = (
        b.groupBy("nation", "salt")
        .agg(
            F.expr(
                "slice(array_sort(collect_list(struct(-bal as nb,"
                " c_custkey as ck))), 1, 5)"
            ).alias("top")
        )
        .select("nation", F.explode("top").alias("t"))
        .select("nation", F.col("t.nb").alias("nb"), F.col("t.ck").alias("ck"))
    )
    phase2 = (
        phase1.groupBy("nation")
        .agg(
            F.expr(
                "slice(array_sort(collect_list(struct(nb, ck))), 1, 5)"
            ).alias("top")
        )
        .select("nation", F.posexplode("top").alias("pos", "t"))
        .select(
            "nation",
            (F.col("pos") + 1).cast("int").alias("rk"),
            F.col("t.ck").alias("c_custkey"),
            (-F.col("t.nb")).cast("bigint").alias("bal"),
        )
    )
    return phase2


@query(
    "q302_conformal_interval",
    """
    WITH e AS (SELECT event_type, user_id,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS cents,
                      ('0x' || substr(md5(cast(user_id AS VARCHAR)), 1, 8))
                        ::BIGINT % 4 AS fold
               FROM events),
    mu AS (SELECT event_type,
                  cast(sum(cents) // count(*) AS BIGINT) AS mu_q,
                  cast(count(*) AS BIGINT) AS n_train
           FROM e WHERE fold <= 1 GROUP BY event_type),
    cal AS (SELECT e.event_type, abs(e.cents - mu.mu_q) AS r
            FROM e JOIN mu USING (event_type) WHERE e.fold = 2),
    g AS (SELECT event_type, r, cast(count(*) AS BIGINT) AS cnt
          FROM cal GROUP BY 1, 2),
    p AS (SELECT event_type, r, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY event_type
                            ORDER BY r ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT event_type, cast(sum(cnt) AS BIGINT) AS n_cal
          FROM g GROUP BY 1),
    qh AS (SELECT p.event_type, t.n_cal,
                  min(CASE WHEN pre < least(((n_cal + 1) * 9 + 9) // 10,
                                            n_cal)
                        AND least(((n_cal + 1) * 9 + 9) // 10, n_cal)
                            <= pre + cnt
                           THEN r END) AS q_hat
           FROM p JOIN t USING (event_type)
           GROUP BY 1, 2),
    tst AS (SELECT e.event_type,
                   cast(count(*) AS BIGINT) AS n_test,
                   cast(sum(CASE WHEN abs(e.cents - mu.mu_q) <= qh.q_hat
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_cov
            FROM e JOIN mu USING (event_type) JOIN qh USING (event_type)
            WHERE e.fold = 3 GROUP BY 1)
    SELECT mu.event_type, mu.n_train, qh.n_cal, tst.n_test,
           mu.mu_q, cast(qh.q_hat AS BIGINT) AS q_hat,
           cast(tst.n_cov * 1000000 // tst.n_test AS BIGINT)
             AS coverage_ppm
    FROM mu JOIN qh USING (event_type) JOIN tst USING (event_type)
    """,
    doc="Split-conformal prediction intervals with a coverage audit: "
    "md5-deterministic user folds (train 0-1 / calibration 2 / test "
    "3), a per-event-type mean model, the conformal radius q_hat = "
    "the ceil((n_cal+1)*0.9)-th order statistic of calibration "
    "absolute residuals (clamped to n_cal — the finite-sample rank "
    "that guarantees >= 90% marginal coverage regardless of the "
    "residual distribution), and the measured test coverage that "
    "validates the guarantee end to end. The order statistic comes "
    "from the per-group residual CDF (exact integer cents; the Spark "
    "side uses the bucket-partitioned prefix machinery, the oracle a "
    "plain per-group window). This is the distribution-free "
    "uncertainty layer a serving pipeline puts on top of q148/q255 "
    "point forecasts.",
)
def q302_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("cents"),
        F.expr(
            "cast(conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10)"
            " as bigint) % 4"
        ).alias("fold"),
    ).localCheckpoint(eager=False)
    mu = (
        e.filter(F.col("fold") <= 1)
        .groupBy("event_type")
        .agg(
            F.expr("cast(sum(cents) div count(*) as bigint)").alias("mu_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
        )
    )
    cal = (
        e.filter(F.col("fold") == 2)
        .join(F.broadcast(mu), "event_type")
        .select(
            "event_type", F.abs(F.col("cents") - F.col("mu_q")).alias("v")
        )
    )
    g = cal.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    pre = with_prefix_sums(g, 100, ["cnt"], group_cols=["event_type"])
    t = g.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_cal")
    )
    qh = (
        pre.join(t, "event_type")
        .groupBy("event_type", "n_cal")
        .agg(
            F.min(
                F.when(
                    (
                        F.col("pre_cnt")
                        < F.expr("least(((n_cal + 1) * 9 + 9) div 10, n_cal)")
                    )
                    & (
                        F.expr("least(((n_cal + 1) * 9 + 9) div 10, n_cal)")
                        <= F.col("pre_cnt") + F.col("cnt")
                    ),
                    F.col("v"),
                )
            )
            .cast("bigint")
            .alias("q_hat")
        )
    )
    tst = (
        e.filter(F.col("fold") == 3)
        .join(F.broadcast(mu.select("event_type", "mu_q")), "event_type")
        .join(F.broadcast(qh.select("event_type", "q_hat")), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.expr(
                    "case when abs(cents - mu_q) <= q_hat then 1 else 0 end"
                )
            )
            .cast("bigint")
            .alias("n_cov"),
        )
    )
    return (
        mu.join(qh, "event_type")
        .join(tst, "event_type")
        .select(
            "event_type",
            "n_train",
            "n_cal",
            "n_test",
            "mu_q",
            "q_hat",
            F.expr("n_cov * 1000000 div n_test").cast("bigint").alias(
                "coverage_ppm"
            ),
        )
    )


@query(
    "q303_cuped_adjust",
    """
    WITH tb AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS tm
                FROM events),
    u AS (SELECT user_id,
                 cast(user_id % 2 AS INT) AS variant,
                 cast(sum(CASE WHEN epoch_us(ts) < tb.tm
                               THEN cast(floor(value * 100 + 0.5) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS x,
                 cast(sum(CASE WHEN epoch_us(ts) >= tb.tm
                               THEN cast(floor(value * 100 + 0.5) AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS y
          FROM events CROSS JOIN tb GROUP BY user_id),
    s AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(x) AS BIGINT) AS sx,
                 cast(sum(y) AS BIGINT) AS sy,
                 cast(sum(x * y) AS BIGINT) AS sxy,
                 cast(sum(x * x) AS BIGINT) AS sxx
          FROM u),
    th AS (SELECT n, sx,
                  cast((n * sxy - sx * sy) * 1000000
                       // (n * sxx - sx * sx) AS BIGINT) AS theta_q
           FROM s),
    adj AS (SELECT u.variant, u.y,
                   cast((u.y * 1000000
                         - th.theta_q * (u.x - th.sx // th.n)) // 1000000
                        AS BIGINT) AS yc
            FROM u CROSS JOIN th)
    SELECT variant,
           cast(count(*) AS BIGINT) AS n_users,
           cast(sum(y) * 1000 // count(*) AS BIGINT) AS mean_y_mc,
           cast(sum(yc) * 1000 // count(*) AS BIGINT) AS mean_cuped_mc,
           cast((count(*) * sum(y * y) - sum(y) * sum(y))
                // count(*) AS BIGINT) AS var_y,
           cast((count(*) * sum(yc * yc) - sum(yc) * sum(yc))
                // count(*) AS BIGINT) AS var_cuped
    FROM adj GROUP BY variant
    """,
    doc="CUPED variance reduction for A/B metrics: each user's post-"
    "period metric y is adjusted by theta*(x - mean_x) using their "
    "PRE-period metric x (timeline midpoint split), with theta = "
    "cov(x,y)/var(x) pooled across arms — the industry-standard "
    "trick that cuts experiment variance by the pre/post correlation "
    "squared without biasing the arm difference. Everything is exact "
    "integer: cents sums per user, one power-sum row for theta "
    "(quantized ppm — headroom n*Sxy <= 9.2e18 holds to ~1e7 users "
    "at $10k lifetime cents), adjusted values re-quantized to cents "
    "before the per-arm variance so y'^2 sums stay in int64. Output "
    "per arm: milli-cent means (raw vs CUPED) and the two exact "
    "variances — var_cuped/var_y IS the realized reduction. Three "
    "aggregates, one broadcast scalar row.",
)
def q303_cuped_adjust(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tb = ev.agg(
        F.expr(
            "(min(unix_micros(ts)) + max(unix_micros(ts))) div 2"
        ).alias("tm")
    )
    u = (
        ev.crossJoin(F.broadcast(tb))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.expr(
                    "case when unix_micros(ts) < tm"
                    " then cast(floor(value * 100 + 0.5) as bigint)"
                    " else 0 end"
                )
            )
            .cast("bigint")
            .alias("x"),
            F.sum(
                F.expr(
                    "case when unix_micros(ts) >= tm"
                    " then cast(floor(value * 100 + 0.5) as bigint)"
                    " else 0 end"
                )
            )
            .cast("bigint")
            .alias("y"),
        )
        .select(
            F.expr("cast(user_id % 2 as int)").alias("variant"), "x", "y"
        )
        .localCheckpoint(eager=False)
    )
    s = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    th = s.select(
        "n",
        "sx",
        F.expr(
            "cast((n * sxy - sx * sy) * 1000000"
            " div (n * sxx - sx * sx) as bigint)"
        ).alias("theta_q"),
    )
    adj = u.crossJoin(F.broadcast(th)).select(
        "variant",
        "y",
        F.expr(
            "cast((y * 1000000 - theta_q * (x - sx div n)) div 1000000"
            " as bigint)"
        ).alias("yc"),
    )
    return adj.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.expr("cast(sum(y) * 1000 div count(*) as bigint)").alias(
            "mean_y_mc"
        ),
        F.expr("cast(sum(yc) * 1000 div count(*) as bigint)").alias(
            "mean_cuped_mc"
        ),
        F.expr(
            "cast((count(*) * sum(y * y) - sum(y) * sum(y))"
            " div count(*) as bigint)"
        ).alias("var_y"),
        F.expr(
            "cast((count(*) * sum(yc * yc) - sum(yc) * sum(yc))"
            " div count(*) as bigint)"
        ).alias("var_cuped"),
    )


@query(
    "q304_cep_pattern",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id
               FROM events),
    w AS (SELECT user_id, event_type, t,
                 min(CASE WHEN event_type = 'purchase' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_p,
                 min(CASE WHEN event_type = 'error' THEN t END)
                   OVER (PARTITION BY user_id ORDER BY t, event_id
                         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS next_e
          FROM e),
    s AS (SELECT t // 86400000000 AS day_idx,
                 CASE WHEN next_p IS NOT NULL
                       AND next_p <= t + 604800000000
                       AND (next_e IS NULL OR next_e > next_p)
                      THEN 1 ELSE 0 END AS hit
          FROM w WHERE event_type = 'signup')
    SELECT cast(day_idx AS BIGINT) AS day_idx,
           cast(count(*) AS BIGINT) AS n_signups,
           cast(sum(hit) AS BIGINT) AS n_matched,
           cast(sum(hit) * 1000000 // count(*) AS BIGINT) AS match_ppm
    FROM s GROUP BY day_idx
    """,
    doc="Complex-event-processing pattern census (MATCH_RECOGNIZE "
    "shape): signup FOLLOWED BY purchase within 7 days with NO error "
    "in between — the negation clause is what funnels (q82/q291) "
    "cannot express, and the classic CEP spelling needs no pattern "
    "automaton: for each anchor event, the NEXT purchase time and "
    "NEXT error time come from two forward-looking min windows per "
    "user (bounded per-key state, one shuffle), and the pattern "
    "holds iff next_purchase <= anchor + 7d AND (no next_error OR "
    "next_error AFTER that purchase) — pure integer comparisons on "
    "exact microsecond times. Census by signup day.",
)
def q304_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        "event_id",
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(1, W.unboundedFollowing)
    )
    w = e.select(
        "event_type",
        "t",
        F.min(
            F.expr("case when event_type = 'purchase' then t end")
        ).over(wf).alias("next_p"),
        F.min(F.expr("case when event_type = 'error' then t end"))
        .over(wf)
        .alias("next_e"),
    )
    s = w.filter(F.col("event_type") == "signup").select(
        F.expr("t div 86400000000").alias("day_idx"),
        F.expr(
            "case when next_p is not null"
            " and next_p <= t + 604800000000"
            " and (next_e is null or next_e > next_p)"
            " then 1 else 0 end"
        ).alias("hit"),
    )
    return s.groupBy(F.col("day_idx").cast("bigint").alias("day_idx")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signups"),
        F.sum("hit").cast("bigint").alias("n_matched"),
        F.expr("sum(hit) * 1000000 div count(*)")
        .cast("bigint")
        .alias("match_ppm"),
    )


@query(
    "q305_phrase_search",
    rf"""
    WITH pos AS (SELECT doc_id, t.term, t.p
                 FROM documents,
                      LATERAL (SELECT unnest({_TOKS}) AS term,
                                      generate_subscripts({_TOKS}, 1) AS p)
                        AS t),
    ph AS (SELECT term, cast(p AS BIGINT) AS p
           FROM (SELECT unnest(['fast', 'table', 'scan']) AS term,
                        unnest([1, 2, 3]) AS p)),
    hits AS (SELECT pos.doc_id, pos.p - ph.p + 1 AS start_p
             FROM pos JOIN ph USING (term)
             GROUP BY pos.doc_id, pos.p - ph.p + 1
             HAVING count(*) = 3)
    SELECT doc_id, cast(count(*) AS BIGINT) AS n_occurrences,
           cast(min(start_p) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id
    """,
    doc="Positional phrase search ('fast table scan' as an exact "
    "consecutive-token phrase) via the POSITIONAL-INDEX join, the way "
    "a search engine answers phrase queries without rescanning text: "
    "the corpus becomes (doc, term, position) postings; each query "
    "term joins its posting list shifted by its in-phrase offset, and "
    "positions where ALL k terms land (count = k after the shift) are "
    "phrase starts. The join touches only the query terms' posting "
    "lists (term-keyed shuffle, pruned by the 3-term broadcast "
    "probe), never the full corpus — at 100 TB this is the inverted-"
    "index regime where cost tracks posting sizes, not corpus size. "
    "Exact counts + first position per matching document.",
)
def q305_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    pos = spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("p0", "term"),
    ).select("doc_id", "term", (F.col("p0") + 1).alias("p"))
    ph = docs.sparkSession.createDataFrame(
        [("fast", 1), ("table", 2), ("scan", 3)], "term string, p bigint"
    ).select("term", F.col("p").alias("qp"))
    hits = (
        pos.join(F.broadcast(ph), "term")
        .groupBy("doc_id", (F.col("p") - F.col("qp") + 1).alias("start_p"))
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") == 3)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        F.min("start_p").cast("bigint").alias("first_pos"),
    )


@query(
    "q306_slo_burn_rate",
    """
    WITH h AS (SELECT epoch_us(ts) // 3600000000 AS hr,
                      cast(count(*) AS BIGINT) AS n,
                      cast(sum(CASE WHEN event_type = 'error'
                                    THEN 1 ELSE 0 END) AS BIGINT) AS bad
               FROM events GROUP BY 1),
    w AS (SELECT hr, n, bad,
                 sum(n)   OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING
                                AND CURRENT ROW) AS n6,
                 sum(bad) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING
                                AND CURRENT ROW) AS bad6,
                 count(*) OVER (ORDER BY hr ROWS BETWEEN 5 PRECEDING
                                AND CURRENT ROW) AS k6
          FROM h),
    r AS (SELECT hr,
                 cast(bad * 1000000 // n AS BIGINT) AS err1_ppm,
                 cast(bad6 * 1000000 // n6 AS BIGINT) AS err6_ppm
          FROM w WHERE k6 = 6)
    SELECT hr AS hour_idx, err1_ppm, err6_ppm,
           TRUE AS page_alert
    FROM r
    WHERE err1_ppm > 240000 AND err6_ppm > 210000
    """,
    doc="Multi-window SLO burn-rate alerting (the SRE-workbook page "
    "rule): with a 20% error budget, page when the 1-hour rate burns "
    "at >1.2x budget AND the 6-hour rate at >1.05x — the short "
    "window high-threshold / long window low-threshold AND is what "
    "kills both flappy short spikes (long window vetoes) and "
    "slow burns alerted too late (short window confirms recency). "
    "Hourly error fractions are exact integer ppm; the rolling "
    "6-hour sums run over the HOURLY rollup (a metadata-sized series "
    "— the corpus-scale work is one hash aggregate on the hour key), "
    "and windows needing a full 6-hour history gate on the frame "
    "row count, so partial leading windows can't fire. Returns the "
    "paging hours.",
)
def q306_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        F.expr("unix_micros(ts) div 3600000000").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("case when event_type = 'error' then 1 else 0 end"))
        .cast("bigint")
        .alias("bad"),
    )
    w6 = W.orderBy("hr").rowsBetween(-5, 0)
    w = h.select(
        "hr",
        "n",
        "bad",
        F.sum("n").over(w6).alias("n6"),
        F.sum("bad").over(w6).alias("bad6"),
        F.count(F.lit(1)).over(w6).alias("k6"),
    )
    r = w.filter(F.col("k6") == 6).select(
        "hr",
        F.expr("bad * 1000000 div n").cast("bigint").alias("err1_ppm"),
        F.expr("bad6 * 1000000 div n6").cast("bigint").alias("err6_ppm"),
    )
    return r.filter(
        (F.col("err1_ppm") > 240000) & (F.col("err6_ppm") > 210000)
    ).select(
        F.col("hr").alias("hour_idx"),
        "err1_ppm",
        "err6_ppm",
        F.lit(True).alias("page_alert"),
    )


@query(
    "q307_srm_check",
    """
    WITH a AS (SELECT DISTINCT user_id,
                      cast(user_id % 2 AS INT) AS variant
               FROM events),
    c AS (SELECT variant, cast(count(*) AS BIGINT) AS n
          FROM a GROUP BY variant),
    s AS (SELECT cast(sum(n) AS BIGINT) AS total,
                 cast(max(CASE WHEN variant = 0 THEN n END) AS BIGINT)
                   AS n0,
                 cast(max(CASE WHEN variant = 1 THEN n END) AS BIGINT)
                   AS n1
          FROM c)
    SELECT n0, n1, total,
           cast((2 * n0 - total) * (2 * n0 - total) * 1000000
                // (2 * total) AS BIGINT) AS chi2_q,
           CASE WHEN (2 * n0 - total) * (2 * n0 - total) * 1000000
                     // (2 * total) > 3841459 THEN TRUE
                ELSE FALSE END AS srm_flag
    FROM s
    """,
    doc="Sample-ratio-mismatch (SRM) guardrail: before reading ANY "
    "experiment metric, verify the 50/50 split actually delivered "
    "50/50 users — chi-square with 1 dof against the design ratio "
    "((n0-E)^2/E + (n1-E)^2/E simplifies to (2*n0-total)^2/(2*total) "
    "exactly), flagged past the 0.05 critical value 3.841459 carried "
    "as an integer micro-threshold so the decision is pure bigint "
    "arithmetic. An SRM flag means assignment, logging, or bot "
    "filtering is broken and every downstream readout (q162/q303) is "
    "invalid — which is why this ships as its own query, not a "
    "column. One distinct + two metadata aggregates.",
)
def q307_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.expr("cast(user_id % 2 as int)").alias("variant")
    ).distinct()
    c = a.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s = c.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.max(F.expr("case when variant = 0 then n end"))
        .cast("bigint")
        .alias("n0"),
        F.max(F.expr("case when variant = 1 then n end"))
        .cast("bigint")
        .alias("n1"),
    )
    return s.select(
        "n0",
        "n1",
        "total",
        F.expr(
            "(2 * n0 - total) * (2 * n0 - total) * 1000000 div (2 * total)"
        )
        .cast("bigint")
        .alias("chi2_q"),
        F.expr(
            "case when (2 * n0 - total) * (2 * n0 - total) * 1000000"
            " div (2 * total) > 3841459 then true else false end"
        ).alias("srm_flag"),
    )


@query(
    "q308_approx_distinct_audit",
    """
    WITH x AS (SELECT event_type,
                      cast(count(DISTINCT user_id) AS BIGINT) AS exact_nd
               FROM events GROUP BY event_type)
    SELECT event_type, exact_nd,
           cast(exact_nd AS BIGINT) AS approx_nd,
           cast(0 AS BIGINT) AS abs_err,
           TRUE AS within_5pct
    FROM x
    """,
    doc="Approximate-distinct error audit: per event type, Spark's "
    "approx_count_distinct (HyperLogLog++, rsd=0.01) graded against "
    "the exact distinct count, with the |err| <= 5% acceptance "
    "VERDICT column — the audit run before replacing exact distincts "
    "with the sketch in dashboards (q38 uses the sketch; this "
    "certifies it). The ORACLE cannot reproduce Spark's HLL++ "
    "register layout, so (q114/q252 pattern) the oracle pins the "
    "EXACT side and emits the sketch's contract as literals: the "
    "Spark side REPLACES approx_nd/abs_err/within_5pct with the real "
    "sketch readings and fails the row-hash if the sketch drifts "
    "outside the contract (abs_err must be 0-coded via the verdict "
    "column: the hash compares within_5pct and exact_nd; approx "
    "columns are normalized to the exact value when the contract "
    "holds, so a contract breach — not sketch jitter — breaks the "
    "differential).",
)
def q308_approx_distinct_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    x = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_nd"),
        F.expr("approx_count_distinct(user_id, 0.01)")
        .cast("bigint")
        .alias("raw_approx"),
    )
    # Contract normalization: when the sketch lands within 5% of the
    # exact count (its certified envelope at rsd=0.01), report the
    # exact value in the approx columns so the differential hash is
    # sketch-jitter-free; a breach surfaces the RAW reading and fails
    # the hash loudly.
    return x.select(
        "event_type",
        "exact_nd",
        F.expr(
            "case when abs(raw_approx - exact_nd) * 20 <= exact_nd"
            " then exact_nd else raw_approx end"
        )
        .cast("bigint")
        .alias("approx_nd"),
        F.expr(
            "case when abs(raw_approx - exact_nd) * 20 <= exact_nd"
            " then cast(0 as bigint)"
            " else abs(raw_approx - exact_nd) end"
        )
        .cast("bigint")
        .alias("abs_err"),
        F.expr("abs(raw_approx - exact_nd) * 20 <= exact_nd").alias(
            "within_5pct"
        ),
    )


@query(
    "q309_retrieval_metrics",
    """
    WITH c AS (SELECT vec_id, label,
                      list_transform(embedding, x ->
                        cast(floor(cast(x AS DOUBLE) * 1000000) AS BIGINT))
                        AS ea
               FROM embeddings),
    p AS (SELECT vec_id AS pid, label AS plabel, ea AS pea FROM c
          WHERE vec_id % 97 = 0),
    d AS (SELECT p.pid, p.plabel, c.vec_id, c.label,
                 cast(list_sum(list_transform(range(1, len(c.ea) + 1),
                      i -> c.ea[i] * p.pea[i])) AS BIGINT) AS dot
          FROM c CROSS JOIN p WHERE c.vec_id <> p.pid),
    r AS (SELECT pid, plabel, label,
                 row_number() OVER (PARTITION BY pid
                                    ORDER BY dot DESC, vec_id) AS rk
          FROM d),
    t AS (SELECT pid,
                 cast(min(CASE WHEN label = plabel THEN rk END) AS BIGINT)
                   AS first_rel,
                 cast(sum(CASE WHEN rk <= 10 AND label = plabel
                               THEN 1000000000
                                    // cast(floor(ln(rk + 1) * 1000000)
                                            AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS dcg_q,
                 cast(sum(CASE WHEN rk <= 10 THEN
                               1000000000
                               // cast(floor(ln(rk + 1) * 1000000)
                                       AS BIGINT)
                               ELSE 0 END) AS BIGINT) AS idcg_q
          FROM r GROUP BY pid)
    SELECT cast(count(*) AS BIGINT) AS n_probes,
           cast(sum(CASE WHEN first_rel <= 10
                         THEN 1000000 // first_rel ELSE 0 END)
                // count(*) AS BIGINT) AS mrr10_ppm,
           cast(sum(dcg_q * 1000000 // idcg_q) // count(*) AS BIGINT)
             AS ndcg10_ppm
    FROM t
    """,
    doc="Retrieval-quality metrics (MRR@10 and nDCG@10) for the exact "
    "cosine ranking with same-label relevance — the evaluation layer "
    "that turns q48/q283/q298's rankings into a number a retrieval "
    "team can gate deploys on. Every term is exact integer: "
    "reciprocal ranks as 1e6 div rank, DCG discounts as 1e9 div "
    "floor(ln(rank+1)*1e6) (TEN distinct constants — the q206 "
    "bounded-input ulp argument), and the ideal DCG normalizer here "
    "is the all-relevant top-10 mass (labels are dense in this "
    "fixture; with sparse relevance the normalizer would cap at the "
    "per-probe relevant count — documented contract). Probe "
    "broadcast + one corpus scan, q283's audit regime.",
)
def q309_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    c = emb.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x ->"
            " cast(floor(cast(x as double) * 1000000) as bigint))"
        ).alias("ea"),
    )
    p = c.filter(F.col("vec_id") % 97 == 0).select(
        F.col("vec_id").alias("pid"),
        F.col("label").alias("plabel"),
        F.col("ea").alias("pea"),
    )
    d = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("vec_id") != F.col("pid"))
        .select(
            "pid",
            "plabel",
            "vec_id",
            "label",
            F.expr(
                "aggregate(zip_with(ea, pea, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ).alias("dot"),
        )
    )
    w = W.partitionBy("pid").orderBy(F.col("dot").desc(), "vec_id")
    r = d.select(
        "pid", "plabel", "label", F.row_number().over(w).alias("rk")
    )
    disc = (
        "1000000000 div cast(floor(ln(rk + 1) * 1000000) as bigint)"
    )
    t = r.groupBy("pid").agg(
        F.min(F.expr("case when label = plabel then rk end"))
        .cast("bigint")
        .alias("first_rel"),
        F.sum(
            F.expr(
                f"case when rk <= 10 and label = plabel then {disc}"
                " else 0 end"
            )
        )
        .cast("bigint")
        .alias("dcg_q"),
        F.sum(F.expr(f"case when rk <= 10 then {disc} else 0 end"))
        .cast("bigint")
        .alias("idcg_q"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.expr(
            "cast(sum(case when first_rel <= 10"
            " then 1000000 div first_rel else 0 end)"
            " div count(*) as bigint)"
        ).alias("mrr10_ppm"),
        F.expr(
            "cast(sum(dcg_q * 1000000 div idcg_q) div count(*) as bigint)"
        ).alias("ndcg10_ppm"),
    )


@query(
    "q310_heldout_perplexity",
    rf"""
    WITH d AS (SELECT doc_id, source, {_TOKS} AS tk,
                      ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))
                        ::BIGINT % 10 AS fold
               FROM documents),
    trtok AS (SELECT unnest(tk) AS term FROM d WHERE fold <= 7),
    v AS (SELECT term, cast(count(*) AS BIGINT) AS c FROM trtok
          GROUP BY term),
    tot AS (SELECT cast(sum(c) AS BIGINT) AS t,
                   cast(count(*) AS BIGINT) AS vsz
            FROM v),
    evtok AS (SELECT doc_id, source, unnest(tk) AS term
              FROM d WHERE fold > 7),
    sc AS (SELECT e.doc_id, e.source,
                  CASE WHEN v.c IS NULL THEN 1 ELSE 0 END AS oov,
                  cast(floor(-ln((coalesce(v.c, 0) + 1)::DOUBLE
                                 / (tot.t + tot.vsz + 1)::DOUBLE)
                             * 1000000) AS BIGINT) AS nll_q
           FROM evtok e LEFT JOIN v USING (term) CROSS JOIN tot)
    SELECT source,
           cast(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           cast(count(*) AS BIGINT) AS n_tokens,
           cast(sum(oov) AS BIGINT) AS n_oov,
           cast(sum(nll_q) // count(*) AS BIGINT) AS mean_nll_q
    FROM sc GROUP BY source
    """,
    doc="HELD-OUT unigram perplexity: an 80/20 md5 document split, "
    "add-1 (Laplace) smoothed unigram LM fit on train only, token-"
    "level NLL evaluated on the unseen 20% — the honest generaliza"
    "tion number q105/q119's in-corpus NLL cannot give (a memorized "
    "corpus scores perfectly in-corpus; held-out OOV mass and "
    "smoothing cost show up only here). Unseen tokens take the "
    "uniform smoothing floor 1/(T+V+1) rather than crashing the "
    "join. Integer micro-nat per-token scores (ln of integer "
    "rationals, the bounded-input quantization argument), per-source "
    "census with OOV counts. Train vocab broadcasts; at web scale "
    "the term join flips to shuffle-on-term with the same plan "
    "shape (AQE picks).",
)
def q310_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread, tokens

    docs = _t(spark, sf_dir, "documents")
    d = spread(docs.select("doc_id", "source", "text"), "doc_id").select(
        "doc_id",
        "source",
        tokens(F.col("text")).alias("tk"),
        F.expr(
            "cast(conv(substr(md5(cast(doc_id as string)), 1, 8), 16, 10)"
            " as bigint) % 10"
        ).alias("fold"),
    )
    trtok = d.filter(F.col("fold") <= 7).select(
        F.explode("tk").alias("term")
    )
    v = trtok.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = v.agg(
        F.sum("c").cast("bigint").alias("t"),
        F.count(F.lit(1)).cast("bigint").alias("vsz"),
    )
    evtok = d.filter(F.col("fold") > 7).select(
        "doc_id", "source", F.explode("tk").alias("term")
    )
    sc = (
        evtok.join(F.broadcast(v), "term", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "source",
            F.expr("case when c is null then 1 else 0 end").alias("oov"),
            F.expr(
                "cast(floor(-ln((coalesce(c, 0) + 1)"
                " / cast(t + vsz + 1 as double)) * 1000000) as bigint)"
            ).alias("nll_q"),
        )
    )
    return sc.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        F.expr("cast(sum(nll_q) div count(*) as bigint)").alias(
            "mean_nll_q"
        ),
    )


@query(
    "q311_hubness_audit",
    """
    WITH c AS (SELECT vec_id,
                      list_transform(range(1, 33), i ->
                        cast(floor(cast(embedding[i] AS DOUBLE) * 10000)
                             AS BIGINT)) AS ea
               FROM embeddings),
    q AS (SELECT vec_id, ea FROM c
          ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 256),
    d AS (SELECT q.vec_id AS qid, t.vec_id AS tid,
                 cast(list_sum(list_transform(range(1, 33),
                      i -> q.ea[i] * t.ea[i])) AS BIGINT) AS dot
          FROM q JOIN c t ON q.vec_id <> t.vec_id),
    r AS (SELECT qid, tid,
                 row_number() OVER (PARTITION BY qid
                                    ORDER BY dot DESC, tid) AS rk
          FROM d),
    ind AS (SELECT c.vec_id, cast(count(r.tid) AS BIGINT) AS indeg
            FROM c LEFT JOIN (SELECT tid FROM r WHERE rk <= 10) r
              ON c.vec_id = r.tid
            GROUP BY c.vec_id)
    SELECT CASE WHEN indeg = 0 THEN 'antihub_0'
                WHEN indeg <= 5 THEN 'normal_1_5'
                WHEN indeg <= 15 THEN 'popular_6_15'
                ELSE 'hub_16_plus' END AS bucket,
           cast(count(*) AS BIGINT) AS n_vectors,
           cast(min(indeg) AS BIGINT) AS min_indeg,
           cast(max(indeg) AS BIGINT) AS max_indeg
    FROM ind GROUP BY 1
    """,
    doc="Hubness audit: the in-degree distribution of the exact "
    "k-NN@10 graph (32-dim dot space) — how often each vector "
    "appears in OTHERS' top-10. High-dimensional similarity spaces "
    "degenerate into hub structure (a few vectors dominate every "
    "neighbor list while antihubs vanish), which silently wrecks "
    "kNN classifiers and dedup transitivity; this census (antihub / "
    "normal / popular / hub buckets, with extremes) is the "
    "diagnostic run before trusting any kNN-derived pipeline stage. "
    "In-degrees are estimated from a FIXED-CARDINALITY probe panel: "
    "the 256 vectors with the smallest md5(vec_id) rank (a "
    "deterministic uniform draw — hub structure shows up in any "
    "uniform query sample, and the full N^2 graph is never needed). "
    "Unlike a modulo sample, the panel does NOT grow with the "
    "corpus: the broadcast side is 256 rows at any N, pair volume "
    "is 256 x N (linear), and the TakeOrdered top-C never "
    "materializes a global sort. Dots are exact integers with tid "
    "tie-breaks, so the sampled graph and its census are "
    "bit-stable. The left join keeps zero-in-degree vectors "
    "visible — antihub count IS the finding.",
)
def q311_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    # spread() BEFORE the probe crossJoin: the single-file fixture scans
    # as one partition, which would serialize the 256xN dot fan-out and
    # the per-qid top-k behind it (measured 8.4s -> 2.0s at sf0.1).
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(slice(embedding, 1, 32), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint))"
            ).alias("ea"),
        ),
        "vec_id",
    ).localCheckpoint(eager=False)
    # Fixed-cardinality probe panel: md5-rank top-256 is a deterministic
    # uniform draw whose size does NOT grow with the corpus — the
    # broadcast below stays 256 rows at any N (a vec_id % k sample is
    # O(N/k) and eventually blows the broadcast threshold). limit()
    # compiles to TakeOrderedAndProject: per-partition top-C + one
    # C-row merge, never a global sort.
    q = (
        c.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(256)
        .select(F.col("vec_id").alias("qid"), F.col("ea").alias("qea"))
    )
    # Unrolled dot: higher-order aggregate/zip_with lambdas run
    # INTERPRETED per element (no whole-stage codegen); 32 explicit
    # element_at products codegen into one fused expression — measured
    # 6.5s -> 4.4s on the 3.6M-pair frame at sf0.1.
    dot = " + ".join(
        f"element_at(ea, {i}) * element_at(qea, {i})" for i in range(1, 33)
    )
    d = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("tid"), F.expr(dot).alias("dot"))
    )
    w = W.partitionBy("qid").orderBy(F.col("dot").desc(), "tid")
    top = (
        d.select("qid", "tid", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 10)
        .select("tid")
    )
    ind = (
        c.select("vec_id")
        .join(top, c["vec_id"] == top["tid"], "left")
        .groupBy("vec_id")
        .agg(F.count("tid").cast("bigint").alias("indeg"))
    )
    return ind.groupBy(
        F.expr(
            "case when indeg = 0 then 'antihub_0'"
            " when indeg <= 5 then 'normal_1_5'"
            " when indeg <= 15 then 'popular_6_15'"
            " else 'hub_16_plus' end"
        ).alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("indeg").cast("bigint").alias("min_indeg"),
        F.max("indeg").cast("bigint").alias("max_indeg"),
    )


def _q312_oracle(n_reps: int = 32, lo_rank: int = 2, hi_rank: int = 31) -> str:
    from tytodb_spark.operators.sampling import _poisson1_cdf

    u = (
        "(('0x' || substr(md5(user_id::VARCHAR || ':' || b::VARCHAR), 1, 13))"
        "::BIGINT + 0.5) / 4503599627370496"
    )
    w = " + ".join(f"({u} > {c!r})::INT" for c in _poisson1_cdf())
    return f"""
    WITH uy AS (SELECT user_id,
                       cast(user_id % 2 AS INT) AS variant,
                       cast(sum(cast(floor(value * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS y
                FROM events GROUP BY user_id),
    reps AS (SELECT unnest(range(0, {n_reps})) AS b),
    wts AS (SELECT b, variant, user_id, y, cast({w} AS BIGINT) AS w
            FROM uy CROSS JOIN reps),
    rep AS (SELECT b,
                   cast(floor(sum(CASE WHEN variant = 1 THEN w * y
                                       ELSE 0 END) * 1000
                              / sum(CASE WHEN variant = 1 THEN w
                                         ELSE 0 END))
                        - floor(sum(CASE WHEN variant = 0 THEN w * y
                                         ELSE 0 END) * 1000
                                / sum(CASE WHEN variant = 0 THEN w
                                           ELSE 0 END)) AS BIGINT)
                     AS d
            FROM wts GROUP BY b
            HAVING sum(CASE WHEN variant = 1 THEN w ELSE 0 END) > 0
               AND sum(CASE WHEN variant = 0 THEN w ELSE 0 END) > 0),
    ranked AS (SELECT d, row_number() OVER (ORDER BY d, b) AS r FROM rep),
    ci AS (SELECT max(CASE WHEN r = {lo_rank} THEN d END) AS lo_q,
                  max(CASE WHEN r = {hi_rank} THEN d END) AS hi_q
           FROM ranked),
    base AS (SELECT
               cast(floor(sum(CASE WHEN variant = 1 THEN y ELSE 0 END)
                          * 1000
                          / sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END))
                    - floor(sum(CASE WHEN variant = 0 THEN y ELSE 0 END)
                            * 1000
                            / sum(CASE WHEN variant = 0 THEN 1
                                       ELSE 0 END)) AS BIGINT) AS diff_q,
               cast(count(*) AS BIGINT) AS n_users
             FROM uy)
    SELECT n_users, diff_q, lo_q, hi_q,
           NOT (lo_q <= 0 AND 0 <= hi_q) AS significant
    FROM base CROSS JOIN ci
    """


@query(
    "q312_ab_bootstrap_diff",
    _q312_oracle(),
    doc="A/B uplift CI by CLUSTER (per-user) Poisson bootstrap: the "
    "difference of arm means resampled at the unit of randomization "
    "— every USER gets an md5-deterministic Poisson(1) weight per "
    "replicate, both arm means recompute per replicate from the "
    "weighted user totals, and the ~88% interval (ranks 2/31 of 32, "
    "the q173 convention) on the DIFFERENCE is the readout. Per-user "
    "resampling is what makes the interval honest when users "
    "contribute multiple events (row-level bootstrap understates "
    "variance by the intra-user correlation — the classic A/B "
    "mistake). One corpus pass to user totals, a broadcast 32-row "
    "replicate spine, replicate means as exact-integer rationals, "
    "rank pick over 32 diffs. 'significant' = the interval excludes "
    "zero.",
)
def q312_ab_bootstrap_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.sampling import _poisson1_cdf

    ev = _t(spark, sf_dir, "events")
    uy = ev.groupBy("user_id").agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("y")
    ).select(
        "user_id", F.expr("cast(user_id % 2 as int)").alias("variant"), "y"
    ).localCheckpoint(eager=False)
    reps = F.broadcast(
        ev.sparkSession.range(32).select(F.col("id").alias("b"))
    )
    u = (
        "(cast(conv(substr(md5(concat(cast(user_id as string), ':',"
        " cast(b as string))), 1, 13), 16, 10) as bigint) + 0.5)"
        " / 4503599627370496"
    )
    w = " + ".join(
        f"cast(({u} > {c!r}) as int)" for c in _poisson1_cdf()
    )
    wts = uy.crossJoin(reps).select(
        "b", "variant", "y", F.expr(f"cast({w} as bigint)").alias("w")
    )
    rep = (
        wts.groupBy("b")
        .agg(
            F.sum(F.expr("case when variant = 1 then w * y else 0 end"))
            .alias("s1"),
            F.sum(F.expr("case when variant = 1 then w else 0 end"))
            .alias("w1"),
            F.sum(F.expr("case when variant = 0 then w * y else 0 end"))
            .alias("s0"),
            F.sum(F.expr("case when variant = 0 then w else 0 end"))
            .alias("w0"),
        )
        .filter((F.col("w1") > 0) & (F.col("w0") > 0))
        .select(
            "b",
            F.expr(
                "cast(floor(s1 * 1000 / w1) - floor(s0 * 1000 / w0)"
                " as bigint)"
            ).alias("d"),
        )
    )
    ranked = rep.select(
        "d", F.row_number().over(W.orderBy("d", "b")).alias("r")
    )
    ci = ranked.agg(
        F.max(F.when(F.col("r") == 2, F.col("d"))).alias("lo_q"),
        F.max(F.when(F.col("r") == 31, F.col("d"))).alias("hi_q"),
    )
    base = uy.agg(
        F.expr(
            "cast(floor(sum(case when variant = 1 then y else 0 end)"
            " * 1000 / sum(case when variant = 1 then 1 else 0 end))"
            " - floor(sum(case when variant = 0 then y else 0 end)"
            " * 1000 / sum(case when variant = 0 then 1 else 0 end))"
            " as bigint)"
        ).alias("diff_q"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_users",
        "diff_q",
        "lo_q",
        "hi_q",
        (~((F.col("lo_q") <= 0) & (F.lit(0) <= F.col("hi_q")))).alias(
            "significant"
        ),
    )


@query(
    "q313_qte_deciles",
    """
    WITH e AS (SELECT cast(user_id % 2 AS INT) AS variant,
                      cast(floor(value * 100 + 0.5) AS BIGINT) AS v
               FROM events),
    g AS (SELECT variant, v, cast(count(*) AS BIGINT) AS cnt
          FROM e GROUP BY 1, 2),
    p AS (SELECT variant, v, cnt,
                 coalesce(sum(cnt) OVER (PARTITION BY variant ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), 0) AS pre
          FROM g),
    t AS (SELECT variant, cast(sum(cnt) AS BIGINT) AS n
          FROM g GROUP BY 1),
    q AS (SELECT p.variant, i,
                 min(CASE WHEN pre < (n * i + 9) // 10
                       AND (n * i + 9) // 10 <= pre + cnt
                          THEN v END) AS vq
          FROM p JOIN t USING (variant)
          CROSS JOIN (SELECT unnest(range(1, 10)) AS i)
          GROUP BY 1, 2)
    SELECT cast(a.i AS INT) AS decile,
           cast(a.vq AS BIGINT) AS v_control,
           cast(b.vq AS BIGINT) AS v_treat,
           cast(b.vq - a.vq AS BIGINT) AS qte_cents
    FROM q a JOIN q b ON a.i = b.i
    WHERE a.variant = 0 AND b.variant = 1
    """,
    doc="Quantile treatment effects: the per-decile difference between "
    "the treatment and control value distributions — the readout "
    "that shows WHERE an effect lives (a mean shift q162/q312 can't "
    "localize: a treatment that helps the p90 tail and hurts the "
    "median nets to zero in a t-test). Exact rank-ceil(n*i/10) "
    "deciles per arm from the grouped-CDF machinery (Spark side "
    "bucket-partitioned, oracle per-arm windows), all nine deciles "
    "priced in ONE pass over each arm's count table, and the QTE "
    "column is a pure integer difference in cents.",
)
def q313_qte_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        F.expr("cast(user_id % 2 as int)").alias("variant"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("v"),
    )
    qd = grouped_quantiles(
        e.select(F.col("variant").alias("g"), "v"),
        F.col("g"),
        F.col("v"),
        [(f"d{i}", i, 10) for i in range(1, 10)],
        bucket_width=100,
    )
    a = qd.filter(F.col("grp") == 0)
    b = qd.filter(F.col("grp") == 1)
    rows = []
    spine = ev.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("decile")
    )
    av = a.select(
        *[F.col(f"d{i}").alias(f"a{i}") for i in range(1, 10)]
    )
    bv = b.select(
        *[F.col(f"d{i}").alias(f"b{i}") for i in range(1, 10)]
    )
    wide = spine.crossJoin(F.broadcast(av)).crossJoin(F.broadcast(bv))
    vc = "".join(
        f" when decile = {i} then a{i}" for i in range(1, 10)
    )
    vt = "".join(
        f" when decile = {i} then b{i}" for i in range(1, 10)
    )
    return wide.select(
        "decile",
        F.expr(f"case{vc} end").cast("bigint").alias("v_control"),
        F.expr(f"case{vt} end").cast("bigint").alias("v_treat"),
        F.expr(f"(case{vt} end) - (case{vc} end)")
        .cast("bigint")
        .alias("qte_cents"),
    )


@query(
    "q314_modularity",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
                FROM lineitem),
    el0 AS (SELECT a.supp AS s1, b.supp AS s2
            FROM ps a JOIN ps b ON a.part = b.part AND a.supp < b.supp
            GROUP BY 1, 2),
    sn AS (SELECT s_suppkey, cast(s_nationkey AS INT) AS com
           FROM supplier),
    el AS (SELECT n1.com AS c1, n2.com AS c2
           FROM el0 JOIN sn n1 ON el0.s1 = n1.s_suppkey
                    JOIN sn n2 ON el0.s2 = n2.s_suppkey),
    m AS (SELECT cast(count(*) AS BIGINT) AS m FROM el),
    intra AS (SELECT c1 AS com, cast(count(*) AS BIGINT) AS e_in
              FROM el WHERE c1 = c2 GROUP BY 1),
    deg AS (SELECT com, cast(sum(d) AS BIGINT) AS d_tot FROM (
              SELECT c1 AS com, count(*) AS d FROM el GROUP BY 1
              UNION ALL
              SELECT c2 AS com, count(*) AS d FROM el GROUP BY 1) x
            GROUP BY com)
    SELECT deg.com AS community,
           cast(coalesce(intra.e_in, 0) AS BIGINT) AS e_in,
           deg.d_tot,
           cast(coalesce(intra.e_in, 0) * 1000000 // m.m
                - deg.d_tot * deg.d_tot * 250000 // (m.m * m.m)
                AS BIGINT) AS q_contrib_ppm
    FROM deg LEFT JOIN intra ON deg.com = intra.com CROSS JOIN m
    """,
    doc="Newman modularity of the supplier co-supply graph under the "
    "nation partition: per community, Q_i = e_in/m - (d_i/2m)^2 — "
    "the score that says whether a community assignment (here the "
    "natural nation grouping; in production q71/q171's components) "
    "beats random edge placement. Spelled exactly in integers: "
    "e_in*1e6 div m minus d^2*25e4 div m^2 (the 1/4 of (d/2m)^2 "
    "folded into the constant), so per-community contributions sum "
    "to quantized Q with zero float. Edge list is the q222-style "
    "part-bounded pair join (distinct co-supply edges); community "
    "stats are three metadata-sized aggregates. Positive q_contrib "
    "communities are denser than chance — the validation gate before "
    "using components for dedup canonicalization.",
)
def q314_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    sp = _t(spark, sf_dir, "supplier").select(
        "s_suppkey", F.col("s_nationkey").cast("int").alias("com")
    )
    ps = li.select(
        F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp")
    ).distinct()
    a = ps.select("part", F.col("supp").alias("s1"))
    b = ps.select("part", F.col("supp").alias("s2"))
    el0 = (
        a.join(b, "part")
        .filter(F.col("s1") < F.col("s2"))
        .select("s1", "s2")
        .distinct()
    )
    el = (
        el0.join(
            F.broadcast(sp.select(F.col("s_suppkey").alias("s1"), F.col("com").alias("c1"))),
            "s1",
        )
        .join(
            F.broadcast(sp.select(F.col("s_suppkey").alias("s2"), F.col("com").alias("c2"))),
            "s2",
        )
        .select("c1", "c2")
        .localCheckpoint(eager=False)
    )
    m = el.agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    intra = (
        el.filter(F.col("c1") == F.col("c2"))
        .groupBy(F.col("c1").alias("com"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_in"))
    )
    deg = (
        el.select(F.col("c1").alias("com"))
        .unionByName(el.select(F.col("c2").alias("com")))
        .groupBy("com")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_tot"))
    )
    return (
        deg.join(intra, "com", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("com").alias("community"),
            F.coalesce("e_in", F.lit(0)).cast("bigint").alias("e_in"),
            "d_tot",
            F.expr(
                "coalesce(e_in, 0) * 1000000 div m"
                " - d_tot * d_tot * 250000 div (m * m)"
            )
            .cast("bigint")
            .alias("q_contrib_ppm"),
        )
    )


@query(
    "q315_gsp_support",
    """
    WITH e AS (SELECT user_id, event_type AS et, epoch_us(ts) AS t
               FROM events),
    pr AS (SELECT DISTINCT a.user_id, a.et AS et_a, b.et AS et_b
           FROM e a JOIN e b
             ON a.user_id = b.user_id
            AND a.et <> b.et
            AND b.t > a.t
            AND b.t <= a.t + 86400000000),
    n AS (SELECT cast(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM e)
    SELECT pr.et_a, pr.et_b,
           cast(count(*) AS BIGINT) AS n_support,
           cast(count(*) * 1000000 // n.n_users AS BIGINT) AS support_ppm
    FROM pr CROSS JOIN n
    GROUP BY pr.et_a, pr.et_b, n.n_users
    """,
    doc="Sequential-pattern (GSP) 2-sequence support with a gap "
    "constraint: for each ordered event-type pair (A, B), the users "
    "where SOME A is followed by SOME B within 24h — unlike q186/"
    "q231's adjacent transitions, GSP sequences allow arbitrary "
    "intervening events, which is what makes them pattern mining "
    "rather than Markov statistics. The existence join is per-user "
    "(co-partitioned self-join on user_id; fan-out bounded by "
    "per-user activity squared, the sessionized-corpus regime) and "
    "collapses to DISTINCT (user, A, B) before counting, so support "
    "is exact user counts, ppm against the full user base. The "
    "|types|^2 output is the candidate-generation input for "
    "longer-pattern mining.",
)
def q315_gsp_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", F.col("event_type").alias("et"), F.unix_micros("ts").alias("t")
    )
    a = e.select("user_id", F.col("et").alias("et_a"), F.col("t").alias("ta"))
    b = e.select("user_id", F.col("et").alias("et_b"), F.col("t").alias("tb"))
    pr = (
        a.join(b, "user_id")
        .filter(
            (F.col("et_a") != F.col("et_b"))
            & (F.col("tb") > F.col("ta"))
            & (F.col("tb") <= F.col("ta") + F.lit(86400000000))
        )
        .select("user_id", "et_a", "et_b")
        .distinct()
    )
    n = e.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    return (
        pr.crossJoin(F.broadcast(n))
        .groupBy("et_a", "et_b", "n_users")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_support"))
        .select(
            "et_a",
            "et_b",
            "n_support",
            F.expr("n_support * 1000000 div n_users")
            .cast("bigint")
            .alias("support_ppm"),
        )
    )


@query(
    "q316_shipping_priority",
    """
    SELECT l.l_orderkey,
           cast(sum(cast(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_q,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue_q DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape (shipping priority): unshipped-as-of-date "
    "orders for one market segment, top-10 by revenue. Plan: the "
    "segment filter prunes customer BEFORE it broadcasts into orders "
    "(dim-side pushdown), the date filters reach both parquet scans "
    "as PushedFilters, and the only shuffle is lineitem-orders on "
    "orderkey. The top-10 is TakeOrderedAndProject — per-partition "
    "heaps then a driver merge of 32 x 10 rows, never a global sort. "
    "Revenue per-line floor-quantized at 1e4 (q300's discipline) so "
    "the sum is an exact int64; ties broken by orderkey.",
)
def q316_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = t["orders"].filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    li = t["lineitem"].filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount)"
                    " * 10000 + 0.5) as bigint)"
                )
            )
            .cast("bigint")
            .alias("revenue_q")
        )
        .select("l_orderkey", "revenue_q", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue_q").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "q317_market_share",
    """
    WITH b AS (
      SELECT year(o.o_orderdate) AS yr,
             cast(floor(l.l_extendedprice * (1 - l.l_discount)
                        * 10000 + 0.5) AS BIGINT) AS rev,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
                   AND r.r_name = 'AMERICA'
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
    )
    SELECT cast(yr AS INT) AS yr,
           cast(sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
                         ELSE 0 END) AS BIGINT) AS nation_rev_q,
           cast(sum(rev) AS BIGINT) AS total_rev_q,
           cast((sum(CASE WHEN supp_nation = 'NATION_5' THEN rev
                          ELSE 0 END) // 1000) * 1000000
                // greatest(sum(rev) // 1000, 1) AS BIGINT) AS share_ppm
    FROM b GROUP BY yr
    """,
    doc="TPC-H Q8 shape (national market share): one supplier "
    "nation's share of PROMO-part revenue sold into one region, by "
    "order year. The share is a conditional-aggregate ratio — one "
    "pass, no self-join — and the eight-way join keeps every dim "
    "broadcast (part included: it is partkey-metadata-sized relative "
    "to the fact) with lineitem-orders as the single shuffled edge. "
    "share_ppm pre-divides both operands by 1e3 before the 1e6 "
    "blow-up so the product stays inside int64 out to ~9e15 in "
    "quantized annual revenue (~1e11 lines at sf-average prices) — "
    "the q268 overflow lesson applied at design time; floor-division "
    "order is mirrored exactly in the oracle.",
)
def q317_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderdate")
    p = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    c = t["customer"].select("c_custkey", "c_nationkey")
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk")
    )
    r = t["region"].filter(F.col("r_name") == "AMERICA").select("r_regionkey")
    s = t["supplier"].select("s_suppkey", "s_nationkey")
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    b = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_rk") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            F.expr(
                "cast(floor(l_extendedprice * (1 - l_discount)"
                " * 10000 + 0.5) as bigint)"
            ).alias("rev"),
            "supp_nation",
        )
    )
    return (
        b.groupBy("yr")
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("rev")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("nation_rev_q"),
            F.sum("rev").cast("bigint").alias("total_rev_q"),
        )
        .select(
            "yr",
            "nation_rev_q",
            "total_rev_q",
            F.expr(
                "(nation_rev_q div 1000) * 1000000"
                " div greatest(total_rev_q div 1000, 1)"
            )
            .cast("bigint")
            .alias("share_ppm"),
        )
    )


@query(
    "q318_returned_items",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           cast(sum(cast(floor(l.l_extendedprice * (1 - l.l_discount)
                               * 10000 + 0.5) AS BIGINT)) AS BIGINT)
             AS lost_rev_q
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_rev_q DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape (returned-item reporting): revenue lost to "
    "returns per customer over a six-month window, top-20. The "
    "returnflag filter reaches the lineitem scan and the date range "
    "the orders scan (both PushedFilters); customer and nation "
    "broadcast; the lineitem-orders orderkey join is the one "
    "shuffle, and the final agg keys on c_custkey — customer-"
    "cardinality, far smaller than the fact. Top-20 via "
    "TakeOrderedAndProject (no global sort). Per-line 1e4 floor "
    "quantization keeps the sum exact-int64.",
)
def q318_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c = t["customer"].select("c_custkey", "c_name", "c_nationkey")
    n = t["nation"].select("n_nationkey", "n_name")
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = t["lineitem"].filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.expr(
                    "cast(floor(l_extendedprice * (1 - l_discount)"
                    " * 10000 + 0.5) as bigint)"
                )
            )
            .cast("bigint")
            .alias("lost_rev_q")
        )
        .orderBy(F.col("lost_rev_q").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "q319_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           cast(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS totalprice_q,
           cast(floor(sum(l.l_quantity) * 100 + 0.5) AS BIGINT) AS qty_q
    FROM lineitem l
    JOIN big ON l.l_orderkey = big.l_orderkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
             o.o_totalprice
    ORDER BY totalprice_q DESC, o.o_orderkey
    LIMIT 20
    """,
    doc="TPC-H Q18 shape (large-volume customers): orders whose total "
    "quantity clears a threshold, with their customers, top-20 by "
    "order value. The HAVING pre-aggregate runs fact-side (map-side "
    "combinable sum on the lineitem partitioning key) and survives "
    "as a ~0.3%-selectivity keyset that AQE converts to a broadcast "
    "on the re-join — the aggregate-then-semi-join shape that makes "
    "Q18 the canonical AQE exhibit. quantity sums are integral "
    "doubles (exact under float addition to 2^53, any order); both "
    "output measures floor-quantized to int64 at 1e2. The orderkey "
    "re-join is partition-aligned with the pre-aggregate so AQE can "
    "also elide the exchange when it materializes the same "
    "partitioning.",
)
def q319_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .filter(F.col("s") > 300)
        .select("l_orderkey")
    )
    o = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t["customer"].select("c_custkey", "c_name")
    return (
        li.join(big, "l_orderkey")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.expr("cast(floor(sum(l_quantity) * 100 + 0.5) as bigint)").alias(
                "qty_q"
            )
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
                "totalprice_q"
            ),
            "qty_q",
        )
        .orderBy(F.col("totalprice_q").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q320_cohens_kappa",
    """
    WITH lab AS (
      SELECT CASE WHEN n_chars >= 450 THEN 2
                  WHEN n_chars >= 250 THEN 1 ELSE 0 END AS ra,
             CASE WHEN length(text) - length(replace(text, ' ', '')) >= 70
                    THEN 2
                  WHEN length(text) - length(replace(text, ' ', '')) >= 38
                    THEN 1 ELSE 0 END AS rb
      FROM documents),
    cells AS (SELECT ra, rb, cast(count(*) AS BIGINT) AS n
              FROM lab GROUP BY ra, rb),
    tot AS (SELECT cast(sum(n) AS BIGINT) AS n,
                   cast(sum(CASE WHEN ra = rb THEN n ELSE 0 END) AS BIGINT)
                     AS agree
            FROM cells),
    na AS (SELECT ra AS c, cast(sum(n) AS BIGINT) AS n_a
           FROM cells GROUP BY ra),
    nb AS (SELECT rb AS c, cast(sum(n) AS BIGINT) AS n_b
           FROM cells GROUP BY rb),
    ch AS (SELECT cast(sum(na.n_a * nb.n_b) AS BIGINT) AS s
           FROM na JOIN nb ON na.c = nb.c)
    SELECT tot.n, tot.agree,
           cast(tot.agree * 1000000 // tot.n AS BIGINT) AS po_ppm,
           cast(((ch.s // tot.n) * 1000000
                 + (ch.s % tot.n) * 1000000 // tot.n) // tot.n AS BIGINT)
             AS pe_ppm,
           cast(((tot.agree - ch.s // tot.n) * 1000000
                 - (ch.s % tot.n) * 1000000 // tot.n)
                // greatest(tot.n - ch.s // tot.n, 1) AS BIGINT)
             AS kappa_ppm
    FROM tot CROSS JOIN ch
    """,
    doc="Cohen's kappa inter-rater agreement between two deterministic "
    "quality raters (length-tier vs whitespace-token-tier) — the "
    "chance-corrected agreement score that gates annotation-quality "
    "decisions (kappa near 0 = the raters agree no more than class "
    "priors force them to). One map-side scan labels both raters, a "
    "single |classes|^2 cell aggregate carries everything downstream "
    "— observed agreement is the cell diagonal, expected agreement "
    "the product of the two marginals — so the corpus is read once "
    "and all arithmetic happens on a 9-row frame. Integer spelling "
    "splits the marginal product as s = q*n + r (q = s//n) so "
    "pe_ppm = (q*1e6 + r*1e6//n) // n carries the remainder mass a "
    "bare (s//n)*1e6//n would drop — bias falls from <=1e6/n ppm "
    "(~100 ppm at bench n) to <=2 ppm-ulps — while every term stays "
    "<= n*1e6: safe to ~9e12 documents. Kappa's numerator gets the "
    "same remainder correction; its denominator keeps n - q (the "
    "dropped r/n < 1 biases kappa by <= kappa/(n*(1-pe)) — sub-ppm "
    "for n >= 1e6, documented, vanishing at deployed scale). "
    "Floor-division order mirrored exactly in the oracle.",
)
def q320_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lab = docs.select(
        F.expr(
            "case when n_chars >= 450 then 2"
            " when n_chars >= 250 then 1 else 0 end"
        ).alias("ra"),
        F.expr(
            "case when length(text) - length(replace(text, ' ', '')) >= 70"
            " then 2 when length(text) - length(replace(text, ' ', '')) >= 38"
            " then 1 else 0 end"
        ).alias("rb"),
    )
    cells = lab.groupBy("ra", "rb").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum(F.when(F.col("ra") == F.col("rb"), F.col("n")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("agree"),
    )
    na = cells.groupBy(F.col("ra").alias("c")).agg(
        F.sum("n").cast("bigint").alias("n_a")
    )
    nb = cells.groupBy(F.col("rb").alias("c")).agg(
        F.sum("n").cast("bigint").alias("n_b")
    )
    ch = (
        na.join(nb, "c")
        .agg(F.sum(F.col("n_a") * F.col("n_b")).cast("bigint").alias("s"))
    )
    return (
        tot.crossJoin(F.broadcast(ch))
        .select(
            "n",
            "agree",
            F.expr("agree * 1000000 div n").cast("bigint").alias("po_ppm"),
            F.expr(
                "((s div n) * 1000000 + (s % n) * 1000000 div n) div n"
            )
            .cast("bigint")
            .alias("pe_ppm"),
            F.expr(
                "((agree - s div n) * 1000000 - (s % n) * 1000000 div n)"
                " div greatest(n - s div n, 1)"
            )
            .cast("bigint")
            .alias("kappa_ppm"),
        )
    )


@query(
    "q321_mcnemar",
    """
    WITH lab AS (
      SELECT CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END AS y,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p1,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS p2
      FROM documents),
    ct AS (
      SELECT cast(sum(CASE WHEN p1 = y AND p2 = y THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_right,
             cast(sum(CASE WHEN p1 = y AND p2 <> y THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             cast(sum(CASE WHEN p1 <> y AND p2 = y THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             cast(sum(CASE WHEN p1 <> y AND p2 <> y THEN 1 ELSE 0 END)
                  AS BIGINT) AS both_wrong
      FROM lab)
    SELECT both_right, b, c, both_wrong,
           cast((b - c) * (b - c) * 1000 // greatest(b + c, 1) AS BIGINT)
             AS chi2_milli
    FROM ct
    """,
    doc="McNemar's paired test for comparing two classifiers on the "
    "SAME examples (here: language-metadata vs length-threshold, both "
    "predicting an English-marker ground truth): only the discordant "
    "cells b and c carry signal — the shared-correct mass that "
    "inflates naive accuracy deltas cancels by construction. One "
    "map-side labeling scan collapses to a single 2x2 contingency "
    "row (map-side-combinable conditional sums, no shuffle beyond "
    "the final 1-row reduce). chi2 = (b-c)^2/(b+c) in exact integer "
    "milli-units; the square is computed on the discordant DELTA "
    "(|b-c| <= discordant count), so the *1e3 spelling holds to "
    "~3e7 discordant pairs — beyond that, pre-divide the delta "
    "(the q268 lesson, noted here rather than discovered later).",
)
def q321_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lab = docs.select(
        F.expr("case when contains(text, ' the ') then 1 else 0 end").alias("y"),
        F.expr("case when lang = 'en' then 1 else 0 end").alias("p1"),
        F.expr("case when n_chars >= 300 then 1 else 0 end").alias("p2"),
    )
    ct = lab.agg(
        F.sum(F.expr("case when p1 = y and p2 = y then 1 else 0 end"))
        .cast("bigint")
        .alias("both_right"),
        F.sum(F.expr("case when p1 = y and p2 <> y then 1 else 0 end"))
        .cast("bigint")
        .alias("b"),
        F.sum(F.expr("case when p1 <> y and p2 = y then 1 else 0 end"))
        .cast("bigint")
        .alias("c"),
        F.sum(F.expr("case when p1 <> y and p2 <> y then 1 else 0 end"))
        .cast("bigint")
        .alias("both_wrong"),
    )
    return ct.select(
        "both_right",
        "b",
        "c",
        "both_wrong",
        F.expr("(b - c) * (b - c) * 1000 div greatest(b + c, 1)")
        .cast("bigint")
        .alias("chi2_milli"),
    )


@query(
    "q322_brier_decomposition",
    """
    WITH lab AS (
      SELECT least(n_chars // 60, 9) AS bin,
             CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END AS y
      FROM documents),
    g AS (SELECT bin, cast(count(*) AS BIGINT) AS n_k,
                 cast(sum(y) AS BIGINT) AS y_k
          FROM lab GROUP BY bin),
    t AS (SELECT cast(sum(y_k) * 1000 // sum(n_k) AS BIGINT) AS ybar_pm
          FROM g)
    SELECT cast(g.bin AS INT) AS bin, g.n_k,
           cast((2 * g.bin + 1) * 50 AS BIGINT) AS p_pm,
           cast(g.y_k * 1000 // g.n_k AS BIGINT) AS ybar_k_pm,
           cast(g.n_k * ((2 * g.bin + 1) * 50 - g.y_k * 1000 // g.n_k)
                      * ((2 * g.bin + 1) * 50 - g.y_k * 1000 // g.n_k)
                AS BIGINT) AS rel_contrib,
           cast(g.n_k * (g.y_k * 1000 // g.n_k - t.ybar_pm)
                      * (g.y_k * 1000 // g.n_k - t.ybar_pm)
                AS BIGINT) AS res_contrib
    FROM g CROSS JOIN t
    """,
    doc="Murphy decomposition of the Brier score (reliability / "
    "resolution terms per forecast bin): predictions are binned "
    "probabilities (length-derived, bin midpoint = (2k+1)/20), "
    "outcome an English-marker indicator. reliability penalizes "
    "bins whose observed rate strays from the stated probability; "
    "resolution rewards bins that separate from the base rate — "
    "together with uncertainty ybar(1-ybar) they reassemble the "
    "full Brier score, the sharper diagnostic than q205's raw "
    "calibration table. One labeling scan, one 10-row bin "
    "aggregate, base rate broadcast back. All terms exact integers "
    "in per-mille scale: n_k * delta_pm^2 <= n_k * 1e6, safe to "
    "~9e12 rows per bin with zero float.",
)
def q322_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lab = docs.select(
        F.expr("least(n_chars div 60, 9)").alias("bin"),
        F.expr("case when contains(text, ' the ') then 1 else 0 end").alias("y"),
    )
    g = lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_k"),
        F.sum("y").cast("bigint").alias("y_k"),
    )
    t = g.agg(
        F.expr("cast(sum(y_k) * 1000 div sum(n_k) as bigint)").alias("ybar_pm")
    )
    return (
        g.crossJoin(F.broadcast(t))
        .select(
            F.col("bin").cast("int").alias("bin"),
            "n_k",
            F.expr("cast((2 * bin + 1) * 50 as bigint)").alias("p_pm"),
            F.expr("cast(y_k * 1000 div n_k as bigint)").alias("ybar_k_pm"),
            F.expr(
                "cast(n_k * ((2 * bin + 1) * 50 - y_k * 1000 div n_k)"
                " * ((2 * bin + 1) * 50 - y_k * 1000 div n_k) as bigint)"
            ).alias("rel_contrib"),
            F.expr(
                "cast(n_k * (y_k * 1000 div n_k - ybar_pm)"
                " * (y_k * 1000 div n_k - ybar_pm) as bigint)"
            ).alias("res_contrib"),
        )
    )


@query(
    "q323_assortativity",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
                FROM lineitem),
    pd AS (SELECT part, cast(count(*) AS BIGINT) AS deg
           FROM ps GROUP BY part),
    sd AS (SELECT supp, cast(count(*) AS BIGINT) AS deg
           FROM ps GROUP BY supp),
    e AS (SELECT pd.deg AS pdeg, sd.deg AS sdeg
          FROM ps
          JOIN pd ON ps.part = pd.part
          JOIN sd ON ps.supp = sd.supp),
    j AS (SELECT pdeg AS dx, sdeg AS dy FROM e
          UNION ALL
          SELECT sdeg AS dx, pdeg AS dy FROM e),
    s AS (SELECT cast(count(*) AS BIGINT) AS m2,
                 cast(sum(dx) AS BIGINT) AS sx,
                 cast(sum(dy) AS BIGINT) AS sy,
                 cast(sum(dx * dx) AS BIGINT) AS sxx,
                 cast(sum(dy * dy) AS BIGINT) AS syy,
                 cast(sum(dx * dy) AS BIGINT) AS sxy
          FROM j)
    SELECT m2, sx, sxy,
           round((m2::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / sqrt((m2::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                      * (m2::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
                 6) AS assortativity
    FROM s
    """,
    doc="Degree assortativity of the bipartite part-supplier graph: "
    "the Pearson correlation of endpoint degrees over the (doubled) "
    "edge list — negative means high-degree parts attach to low-"
    "degree suppliers (hub-and-spoke, q171's star-contraction "
    "regime), positive means hubs cluster (dedup-component merging "
    "will be head-heavy). The bipartite form is the one that stays "
    "non-degenerate on dense co-occurrence data: the supplier-"
    "supplier projection is complete at small sf (every degree "
    "equal, correlation undefined), while bipartite degrees always "
    "vary with the data. Degrees come from two hash aggregates over "
    "the distinct edge list and broadcast back onto the fact-sized "
    "edges; each edge contributes both orientations (the standard "
    "estimator). q146's exact-component discipline: all five moment "
    "sums are exact bigints (m2*sxx inside int64 to ~1e9 edges at "
    "1e4 max degree), one final double division rounded to 6dp so "
    "libm can't flip a hash bit.",
)
def q323_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    pd = ps.groupBy("part").agg(F.count(F.lit(1)).cast("bigint").alias("pdeg"))
    sd = ps.groupBy("supp").agg(F.count(F.lit(1)).cast("bigint").alias("sdeg"))
    e = (
        ps.join(F.broadcast(pd), "part")
        .join(F.broadcast(sd), "supp")
        .select("pdeg", "sdeg")
    )
    j = e.select(
        F.col("pdeg").alias("dx"), F.col("sdeg").alias("dy")
    ).unionByName(e.select(F.col("sdeg").alias("dx"), F.col("pdeg").alias("dy")))
    s = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("dx").cast("bigint").alias("sx"),
        F.sum("dy").cast("bigint").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).cast("bigint").alias("sxy"),
    )
    return s.select(
        "m2",
        "sx",
        "sxy",
        F.round(
            (
                F.col("m2").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / F.sqrt(
                (
                    F.col("m2").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * (
                    F.col("m2").cast("double") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            ),
            6,
        ).alias("assortativity"),
    )


@query(
    "q324_l_diversity",
    """
    WITH q AS (SELECT event_type, date_trunc('day', ts) AS day,
                      cast(floor(value * 10) AS BIGINT) AS vb,
                      user_id
               FROM events),
    cls AS (SELECT event_type, day, vb,
                   cast(count(DISTINCT user_id) AS BIGINT) AS l,
                   cast(count(*) AS BIGINT) AS sz
            FROM q GROUP BY 1, 2, 3)
    SELECT cast(count(*) AS BIGINT) AS n_classes,
           cast(min(l) AS BIGINT) AS min_l,
           cast(sum(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_2,
           cast(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_3,
           cast(sum(CASE WHEN l < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_below_5,
           cast(sum(CASE WHEN l = sz THEN 1 ELSE 0 END) AS BIGINT)
             AS n_all_distinct
    FROM cls
    """,
    doc="l-diversity audit over q198's quasi-identifier classes "
    "(event_type, day, value-bucket) with user_id as the sensitive "
    "attribute: k-anonymity alone (q198) does not stop attribute "
    "disclosure — a class of 50 rows all naming ONE user is k=50 "
    "but l=1, fully identifying. Per-class distinct-sensitive "
    "counts come from one two-level aggregate (the distinct is "
    "partial-aggregated map-side on the (QI, user) composite before "
    "the class rollup — no row ever carries a set), and the release "
    "gate is the handful of threshold counters. Same shape at 1e12 "
    "rows: both aggregates key on the QI tuple, no skew beyond the "
    "QI classes themselves.",
)
def q324_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    q = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("day"),
        F.expr("cast(floor(value * 10) as bigint)").alias("vb"),
        "user_id",
    )
    cls = q.groupBy("event_type", "day", "vb").agg(
        F.countDistinct("user_id").cast("bigint").alias("l"),
        F.count(F.lit(1)).cast("bigint").alias("sz"),
    )
    return cls.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.min("l").cast("bigint").alias("min_l"),
        F.sum(F.expr("case when l < 2 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_below_2"),
        F.sum(F.expr("case when l < 3 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_below_3"),
        F.sum(F.expr("case when l < 5 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_below_5"),
        F.sum(F.expr("case when l = sz then 1 else 0 end"))
        .cast("bigint")
        .alias("n_all_distinct"),
    )


@query(
    "q325_bloom_fpp_audit",
    """
    WITH k AS (SELECT DISTINCT o_custkey AS key FROM orders),
    pos AS (SELECT key,
                   unnest([('0x'||substr(md5(key::VARCHAR),1,8))::BIGINT
                             % 65536,
                           ('0x'||substr(md5(key::VARCHAR),9,8))::BIGINT
                             % 65536]) AS p
            FROM k),
    words AS (SELECT p // 32 AS widx,
                     bit_or(1::BIGINT << cast(p % 32 AS INT)) AS word
              FROM pos GROUP BY p // 32),
    stats AS (SELECT cast(sum(bit_count(word)) AS BIGINT) AS ones
              FROM words),
    nmem AS (SELECT cast(count(*) AS BIGINT) AS n_members FROM k),
    probe AS (SELECT c_custkey + 10000000 AS key FROM customer),
    ppos AS (SELECT key,
                    unnest([('0x'||substr(md5(key::VARCHAR),1,8))::BIGINT
                              % 65536,
                            ('0x'||substr(md5(key::VARCHAR),9,8))::BIGINT
                              % 65536]) AS p
             FROM probe),
    hits AS (SELECT ppos.key,
                    cast(sum(CASE WHEN words.word IS NOT NULL
                         AND (words.word >> cast(ppos.p % 32 AS INT)) & 1 = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS nhit
             FROM ppos LEFT JOIN words ON ppos.p // 32 = words.widx
             GROUP BY ppos.key),
    fp AS (SELECT cast(count(*) AS BIGINT) AS n_probes,
                  cast(sum(CASE WHEN nhit = 2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_fp
           FROM hits)
    SELECT nmem.n_members, stats.ones AS ones_bits,
           fp.n_probes, fp.n_fp,
           cast(fp.n_fp * 1000000 // fp.n_probes AS BIGINT)
             AS fp_ppm_measured,
           cast((stats.ones * 1000 // 65536)
                * (stats.ones * 1000 // 65536) AS BIGINT)
             AS fp_ppm_theory
    FROM nmem CROSS JOIN stats CROSS JOIN fp
    """,
    doc="Bloom-filter false-positive audit: rebuild q151's 64Kibit "
    "k=2 filter over the member keyset, probe it with a DISJOINT "
    "keyset (custkey + 1e7 — provably non-members), and report "
    "measured FP rate against the occupancy-derived theoretical "
    "rate (ones/m)^k. The audit closes the loop q151 opened: the "
    "filter's usefulness claim (q185's bloom-prefiltered semi-join) "
    "rests on a fpp that should be MEASURED per deployment, not "
    "assumed from the textbook formula — saturated filters pass "
    "everything and silently turn the prefilter into a no-op. All "
    "probe verdicts come from one broadcast join of probe bit "
    "positions against the 2048-word filter table (the filter is "
    "metadata-sized BY CONSTRUCTION — that is what makes it a "
    "filter); md5-derived positions are engine-portable; both rates "
    "exact integer ppm (theory spelled per-mille-squared so the "
    "division order is identical in both engines).",
)
def q325_bloom_fpp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    k = t["orders"].select(F.col("o_custkey").alias("key")).distinct()
    h1 = "conv(substr(md5(cast(key as string)), 1, 8), 16, 10) % 65536"
    h2 = "conv(substr(md5(cast(key as string)), 9, 8), 16, 10) % 65536"
    pos = k.select(
        "key", F.explode(F.expr(f"array({h1}, {h2})")).alias("p")
    ).select("key", F.col("p").cast("bigint").alias("p"))
    words = (
        pos.groupBy(F.expr("p div 32").alias("widx"))
        .agg(
            F.expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 32 as int)))")
            .alias("word")
        )
        .localCheckpoint(eager=False)
    )
    stats = words.agg(
        F.sum(F.bit_count("word")).cast("bigint").alias("ones")
    )
    nmem = k.agg(F.count(F.lit(1)).cast("bigint").alias("n_members"))
    probe = t["customer"].select(
        (F.col("c_custkey") + F.lit(10000000)).alias("key")
    )
    ppos = probe.select(
        "key", F.explode(F.expr(f"array({h1}, {h2})")).alias("p")
    ).select("key", F.col("p").cast("bigint").alias("p"))
    hits = (
        ppos.join(
            F.broadcast(words), F.expr("p div 32") == F.col("widx"), "left"
        )
        .groupBy("key")
        .agg(
            F.sum(
                F.expr(
                    "case when word is not null and"
                    " (word >> cast(p % 32 as int)) & 1 = 1"
                    " then 1 else 0 end"
                )
            )
            .cast("bigint")
            .alias("nhit")
        )
    )
    fp = hits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.expr("case when nhit = 2 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_fp"),
    )
    return (
        nmem.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(fp))
        .select(
            "n_members",
            F.col("ones").alias("ones_bits"),
            "n_probes",
            "n_fp",
            F.expr("n_fp * 1000000 div n_probes")
            .cast("bigint")
            .alias("fp_ppm_measured"),
            F.expr(
                "(ones * 1000 div 65536) * (ones * 1000 div 65536)"
            )
            .cast("bigint")
            .alias("fp_ppm_theory"),
        )
    )


@query(
    "q326_unpivot_long",
    """
    WITH w AS (SELECT source,
                      cast(count(*) AS BIGINT) AS n_docs,
                      cast(sum(n_chars) AS BIGINT) AS total_chars,
                      cast(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_en
               FROM documents GROUP BY source)
    SELECT source, 'n_docs' AS metric, n_docs AS value FROM w
    UNION ALL
    SELECT source, 'total_chars' AS metric, total_chars AS value FROM w
    UNION ALL
    SELECT source, 'n_en' AS metric, n_en AS value FROM w
    """,
    doc="UNPIVOT (wide-to-long reshaping), the inverse of q60's "
    "pivot: per-source metrics computed ONCE in wide form, then "
    "melted to (source, metric, value) triples via stack() — the "
    "shape ingestion APIs and metric stores want. stack() is a "
    "generator expression, not a join: the wide frame is scanned "
    "once and each row fans out to |metrics| rows map-side, so the "
    "reshape adds zero shuffles on top of the source aggregate "
    "(the oracle's UNION ALL spelling would re-scan the aggregate "
    "3x — stack is the plan you want at scale). Metric names are "
    "string literals in the plan; values share one bigint type, "
    "the unpivot precondition.",
)
def q326_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum(F.expr("case when lang = 'en' then 1 else 0 end"))
        .cast("bigint")
        .alias("n_en"),
    )
    return w.select(
        "source",
        F.expr(
            "stack(3, 'n_docs', n_docs, 'total_chars', total_chars,"
            " 'n_en', n_en)"
        ).alias("metric", "value"),
    )


@query(
    "q327_binary_changepoint",
    """
    WITH h AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, hr, y,
                 cast(sum(y) OVER (PARTITION BY event_type ORDER BY hr
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                   AS pre,
                 cast(row_number() OVER (PARTITION BY event_type
                                         ORDER BY hr) AS BIGINT) AS i,
                 cast(sum(y) OVER (PARTITION BY event_type) AS BIGINT)
                   AS tot,
                 cast(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n
          FROM h),
    g AS (SELECT event_type, hr, i, n, pre, tot,
                 cast(pre * pre * 1000 // i
                      + (tot - pre) * (tot - pre) * 1000 // (n - i)
                      AS BIGINT) AS gain_q
          FROM s WHERE i < n),
    r AS (SELECT event_type, hr, gain_q,
                 cast(pre * 1000 // i AS BIGINT) AS mean_left_milli,
                 cast((tot - pre) * 1000 // (n - i) AS BIGINT)
                   AS mean_right_milli,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY gain_q DESC, hr) AS rk
          FROM g)
    SELECT event_type, hr AS split_hour, gain_q,
           mean_left_milli, mean_right_milli
    FROM r WHERE rk = 1
    """,
    doc="Single-changepoint detection by binary segmentation: per "
    "event type, the hour split that maximizes the two-segment "
    "fit gain sum(seg_total^2 / seg_len) — the exact argmax CUSUM-"
    "style scan statistics approximate, and the recursion step of "
    "full binary segmentation. Unlike q201's sequential CUSUM "
    "(drift ALARM), this names WHERE the level shifted and the "
    "before/after means. Prefix sums run in windows PARTITIONED BY "
    "event_type (series-bounded, never corpus-global — the "
    "operators/stats.py discipline), candidate evaluation is one "
    "more projection, and the per-series argmax is a k-row window. "
    "All gains exact integers: pre^2 * 1e3 holds to ~3e6 events "
    "per series; above that pre-divide the segment totals (the "
    "q268 lesson applied at design time, noted in-spelling).",
)
def q327_binary_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wo = W.partitionBy("event_type").orderBy("hr")
    wp = W.partitionBy("event_type")
    s = h.select(
        "event_type",
        "hr",
        F.sum("y").over(wo.rowsBetween(W.unboundedPreceding, 0))
        .cast("bigint")
        .alias("pre"),
        F.row_number().over(wo).cast("bigint").alias("i"),
        F.sum("y").over(wp).cast("bigint").alias("tot"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
    )
    g = s.filter(F.col("i") < F.col("n")).select(
        "event_type",
        "hr",
        F.expr(
            "cast(pre * pre * 1000 div i"
            " + (tot - pre) * (tot - pre) * 1000 div (n - i) as bigint)"
        ).alias("gain_q"),
        F.expr("cast(pre * 1000 div i as bigint)").alias("mean_left_milli"),
        F.expr("cast((tot - pre) * 1000 div (n - i) as bigint)").alias(
            "mean_right_milli"
        ),
    )
    rk = W.partitionBy("event_type").orderBy(F.col("gain_q").desc(), "hr")
    return (
        g.select(
            "event_type",
            "hr",
            "gain_q",
            "mean_left_milli",
            "mean_right_milli",
            F.row_number().over(rk).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("hr").alias("split_hour"),
            "gain_q",
            "mean_left_milli",
            "mean_right_milli",
        )
    )


@query(
    "q328_join_order_advisor",
    """
    WITH st AS (
      SELECT (SELECT cast(count(*) AS BIGINT) FROM customer) AS n_c,
             (SELECT cast(count(*) AS BIGINT) FROM orders) AS n_o,
             (SELECT cast(count(*) AS BIGINT) FROM lineitem) AS n_l,
             (SELECT cast(count(DISTINCT c_custkey) AS BIGINT)
              FROM customer) AS d_cc,
             (SELECT cast(count(DISTINCT o_custkey) AS BIGINT)
              FROM orders) AS d_oc,
             (SELECT cast(count(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS d_ok,
             (SELECT cast(count(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem) AS d_lk),
    act AS (
      SELECT (SELECT cast(count(*) AS BIGINT)
              FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey)
               AS a_co,
             (SELECT cast(count(*) AS BIGINT)
              FROM orders o JOIN lineitem l
                ON o.o_orderkey = l.l_orderkey) AS a_ol),
    cand AS (
      SELECT 'customer_orders_first' AS plan_order,
             cast(n_c * n_o // greatest(d_cc, d_oc) AS BIGINT) AS est_rows,
             a_co AS actual_rows
      FROM st CROSS JOIN act
      UNION ALL
      SELECT 'orders_lineitem_first' AS plan_order,
             cast(n_o * n_l // greatest(d_ok, d_lk) AS BIGINT) AS est_rows,
             a_ol AS actual_rows
      FROM st CROSS JOIN act
      UNION ALL
      SELECT 'customer_lineitem_cross' AS plan_order,
             cast(n_c * n_l AS BIGINT) AS est_rows,
             cast(n_c * n_l AS BIGINT) AS actual_rows
      FROM st CROSS JOIN act)
    SELECT plan_order, est_rows, actual_rows,
           cast(est_rows * 1000 // greatest(actual_rows, 1) AS BIGINT)
             AS est_ratio_milli,
           cast(row_number() OVER (ORDER BY est_rows, plan_order) AS INT)
             AS est_rank,
           cast(row_number() OVER (ORDER BY actual_rows, plan_order) AS INT)
             AS actual_rank
    FROM cand
    """,
    doc="Join-order advisor: for the customer-orders-lineitem chain, "
    "rank every first-join candidate (the two connected edges plus "
    "the disconnected cross product a naive enumerator would also "
    "consider) by estimated intermediate cardinality |R||S|/"
    "max(ndv_R, ndv_S), then audit the ranking against the TRUE "
    "intermediate sizes — est_rank vs actual_rank agreeing is "
    "exactly the property a cost-based join reorderer needs (q212 "
    "gates the estimator's absolute error; this gates the DECISION "
    "it feeds). Stats are metadata-scans (counts + exact ndv, one "
    "aggregate each); actuals for the connected edges are real join "
    "counts; the cross candidate's actual IS the product, computed "
    "arithmetically in both engines rather than materializing a "
    "9e10-row disaster. The 3-row advisor windows are driver-"
    "trivial; floor-division order mirrored exactly.",
)
def q328_join_order_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    c, o, li = t["customer"], t["orders"], t["lineitem"]
    st = (
        c.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_c"),
            F.countDistinct("c_custkey").cast("bigint").alias("d_cc"),
        )
        .crossJoin(
            F.broadcast(
                o.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_o"),
                    F.countDistinct("o_custkey").cast("bigint").alias("d_oc"),
                    F.countDistinct("o_orderkey").cast("bigint").alias("d_ok"),
                )
            )
        )
        .crossJoin(
            F.broadcast(
                li.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_l"),
                    F.countDistinct("l_orderkey").cast("bigint").alias("d_lk"),
                )
            )
        )
    )
    a_co = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("a_co"))
    )
    a_ol = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("a_ol"))
    )
    base = st.crossJoin(F.broadcast(a_co)).crossJoin(F.broadcast(a_ol))
    cand = base.select(
        F.expr(
            "stack(3,"
            " 'customer_orders_first',"
            "   cast(n_c * n_o div greatest(d_cc, d_oc) as bigint), a_co,"
            " 'orders_lineitem_first',"
            "   cast(n_o * n_l div greatest(d_ok, d_lk) as bigint), a_ol,"
            " 'customer_lineitem_cross',"
            "   cast(n_c * n_l as bigint), cast(n_c * n_l as bigint))"
        ).alias("plan_order", "est_rows", "actual_rows")
    )
    return cand.select(
        "plan_order",
        "est_rows",
        "actual_rows",
        F.expr("est_rows * 1000 div greatest(actual_rows, 1)")
        .cast("bigint")
        .alias("est_ratio_milli"),
        F.row_number()
        .over(W.orderBy("est_rows", "plan_order"))
        .cast("int")
        .alias("est_rank"),
        F.row_number()
        .over(W.orderBy("actual_rows", "plan_order"))
        .cast("int")
        .alias("actual_rank"),
    )


@query(
    "q329_seasonal_mad_anomalies",
    """
    WITH h AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(hour(ts) AS INT) AS hod,
                      cast(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2, 3),
    r AS (SELECT event_type, hr, hod, y,
                 row_number() OVER (PARTITION BY event_type, hod
                                    ORDER BY y, hr) AS rn,
                 count(*) OVER (PARTITION BY event_type, hod) AS n
          FROM h),
    med AS (SELECT event_type, hod,
                   cast(sum(CASE
                     WHEN n % 2 = 0 AND (rn = n / 2 OR rn = n / 2 + 1)
                       THEN y
                     WHEN n % 2 = 1 AND rn = (n + 1) / 2 THEN 2 * y
                     ELSE 0 END) AS BIGINT) AS med2
            FROM r GROUP BY 1, 2),
    d AS (SELECT r.event_type, r.hr, r.hod, r.y, med.med2,
                 abs(2 * r.y - med.med2) AS dev2
          FROM r JOIN med ON r.event_type = med.event_type
                         AND r.hod = med.hod),
    dr AS (SELECT *,
                  row_number() OVER (PARTITION BY event_type, hod
                                     ORDER BY dev2, hr) AS rn2,
                  count(*) OVER (PARTITION BY event_type, hod) AS n2
           FROM d),
    mad AS (SELECT event_type, hod,
                   cast(sum(CASE
                     WHEN n2 % 2 = 0 AND (rn2 = n2 / 2 OR rn2 = n2 / 2 + 1)
                       THEN dev2
                     WHEN n2 % 2 = 1 AND rn2 = (n2 + 1) / 2 THEN 2 * dev2
                     ELSE 0 END) AS BIGINT) AS mad4
            FROM dr GROUP BY 1, 2)
    SELECT d.event_type, d.hr, d.y, d.med2, d.dev2, mad.mad4
    FROM d JOIN mad ON d.event_type = mad.event_type
                   AND d.hod = mad.hod
    WHERE 2 * d.dev2 > 3 * mad.mad4
    """,
    doc="Seasonally-adjusted robust anomaly census: hourly event "
    "counts scored against the MEDIAN and MAD of their own hour-of-"
    "day cohort (3 a.m. is only anomalous relative to other 3 a.m.s "
    "— q110/q113's global MAD would flag every quiet night). Both "
    "medians are EXACT integer spellings carried at 2x/4x scale "
    "(med2 = sum of the two middle ranks, mad4 = doubled median of "
    "doubled deviations) so the 3-sigma-equivalent gate 2*dev2 > "
    "3*mad4 is pure int64 — zero float anywhere, hash-stable across "
    "engines. Every window is partitioned by (event_type, hour-of-"
    "day): cohort size = number of DAYS observed, so partitions "
    "stay bounded as the corpus widens and only grow with history "
    "length — the operators/stats.py partitioning discipline.",
)
def q329_seasonal_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hr"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wc = W.partitionBy("event_type", "hod")
    r = h.select(
        "event_type",
        "hr",
        "hod",
        "y",
        F.row_number().over(wc.orderBy("y", "hr")).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = r.groupBy("event_type", "hod").agg(
        F.sum(
            F.expr(
                "case when n % 2 = 0 and (rn = n div 2 or rn = n div 2 + 1)"
                " then y when n % 2 = 1 and rn = (n + 1) div 2 then 2 * y"
                " else 0 end"
            )
        )
        .cast("bigint")
        .alias("med2")
    )
    d = r.select("event_type", "hr", "hod", "y").join(
        med, ["event_type", "hod"]
    ).select(
        "event_type",
        "hr",
        "hod",
        "y",
        "med2",
        F.expr("abs(2 * y - med2)").alias("dev2"),
    )
    dr = d.select(
        "event_type",
        "hod",
        "dev2",
        F.row_number().over(wc.orderBy("dev2", "hr")).alias("rn2"),
        F.count(F.lit(1)).over(wc).alias("n2"),
    )
    mad = dr.groupBy("event_type", "hod").agg(
        F.sum(
            F.expr(
                "case when n2 % 2 = 0 and (rn2 = n2 div 2 or rn2 = n2 div 2 + 1)"
                " then dev2 when n2 % 2 = 1 and rn2 = (n2 + 1) div 2"
                " then 2 * dev2 else 0 end"
            )
        )
        .cast("bigint")
        .alias("mad4")
    )
    return (
        d.join(mad, ["event_type", "hod"])
        .filter(F.expr("2 * dev2 > 3 * mad4"))
        .select("event_type", "hr", "y", "med2", "dev2", "mad4")
    )


@query(
    "q330_predicate_selectivity",
    """
    WITH s AS (
      SELECT cast(count(*) AS BIGINT) AS n,
             cast(sum(CASE WHEN l_quantity < 25 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n1,
             cast(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n2,
             cast(sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n3,
             cast(sum(CASE WHEN l_quantity < 25 AND l_returnflag = 'R'
                            AND l_discount >= 0.05 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_joint
      FROM lineitem)
    SELECT n, n1, n2, n3, n_joint,
           cast(n1 * 1000000 // n AS BIGINT) AS sel1_ppm,
           cast(n2 * 1000000 // n AS BIGINT) AS sel2_ppm,
           cast(n3 * 1000000 // n AS BIGINT) AS sel3_ppm,
           cast(n_joint * 1000000 // n AS BIGINT) AS actual_joint_ppm,
           cast(((n1 * 1000000 // n) * (n2 * 1000000 // n) // 1000000)
                * (n3 * 1000000 // n) // 1000000 AS BIGINT)
             AS indep_joint_ppm
    FROM s
    """,
    doc="Conjunctive-predicate selectivity audit: per-predicate "
    "marginal selectivities, the TRUE joint selectivity, and the "
    "independence-assumption estimate (product of marginals) that "
    "every textbook cost model uses — the gap between the last two "
    "is the correlated-predicate error that misorders filter chains "
    "and mis-sizes scan outputs. One scan, five conditional sums "
    "(map-side combinable, single 1-row reduce); all selectivities "
    "exact integer ppm with the three-way product floor-folded in "
    "the same order both engines. The advisory read: apply the "
    "smallest sel first, and trust indep_joint only when it is "
    "within ~2x of actual_joint.",
)
def q330_predicate_selectivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("case when l_quantity < 25 then 1 else 0 end"))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.expr("case when l_returnflag = 'R' then 1 else 0 end"))
        .cast("bigint")
        .alias("n2"),
        F.sum(F.expr("case when l_discount >= 0.05 then 1 else 0 end"))
        .cast("bigint")
        .alias("n3"),
        F.sum(
            F.expr(
                "case when l_quantity < 25 and l_returnflag = 'R'"
                " and l_discount >= 0.05 then 1 else 0 end"
            )
        )
        .cast("bigint")
        .alias("n_joint"),
    )
    return s.select(
        "n",
        "n1",
        "n2",
        "n3",
        "n_joint",
        F.expr("n1 * 1000000 div n").cast("bigint").alias("sel1_ppm"),
        F.expr("n2 * 1000000 div n").cast("bigint").alias("sel2_ppm"),
        F.expr("n3 * 1000000 div n").cast("bigint").alias("sel3_ppm"),
        F.expr("n_joint * 1000000 div n").cast("bigint").alias("actual_joint_ppm"),
        F.expr(
            "((n1 * 1000000 div n) * (n2 * 1000000 div n) div 1000000)"
            " * (n3 * 1000000 div n) div 1000000"
        )
        .cast("bigint")
        .alias("indep_joint_ppm"),
    )


@query(
    "q331_wilson_ctr",
    """
    WITH h AS (SELECT cast(hour(ts) AS INT) AS hod,
                      cast(sum(CASE WHEN event_type = 'click' THEN 1
                               ELSE 0 END) AS BIGINT) AS clicks,
                      cast(sum(CASE WHEN event_type = 'view' THEN 1
                               ELSE 0 END) AS BIGINT) AS views
               FROM events
               WHERE event_type IN ('click', 'view')
               GROUP BY 1),
    p AS (SELECT hod, clicks, views, clicks + views AS n,
                 clicks::DOUBLE / (clicks + views)::DOUBLE AS ph
          FROM h WHERE clicks + views > 0)
    SELECT hod, clicks, views,
           cast(clicks * 1000000 // n AS BIGINT) AS rate_ppm,
           round((ph + 1.9208 / n
                  - 1.96 * sqrt(ph * (1 - ph) / n + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_lb,
           round((ph + 1.9208 / n
                  + 1.96 * sqrt(ph * (1 - ph) / n + 0.9604 / (n * n)))
                 / (1 + 3.8416 / n), 6) AS wilson_ub
    FROM p
    """,
    doc="Wilson-score interval for per-hour-of-day click share "
    "(clicks vs views): the CI that stays valid at small n and "
    "extreme rates where the naive normal interval collapses or "
    "escapes [0,1] — the ranking-safe uncertainty gate for rate "
    "metrics (sort by wilson_lb, not by raw rate, and low-traffic "
    "hours stop winning on noise). Counts reduce map-side to 24 "
    "rows in one conditional aggregate; the interval itself is "
    "pure per-row arithmetic on exact integer counts, with the "
    "only doubles confined to the final expression and rounded to "
    "6dp (q146's discipline) so libm ulp can't flip a hash. "
    "z = 1.96 constants pre-squared (1.9208 = z^2/2, 3.8416 = z^2, "
    "0.9604 = z^2/4) so both engines evaluate the identical "
    "literal tree.",
)
def q331_wilson_ctr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(F.hour("ts").cast("int").alias("hod"))
        .agg(
            F.sum(F.expr("case when event_type = 'click' then 1 else 0 end"))
            .cast("bigint")
            .alias("clicks"),
            F.sum(F.expr("case when event_type = 'view' then 1 else 0 end"))
            .cast("bigint")
            .alias("views"),
        )
    )
    p = h.filter(F.expr("clicks + views > 0")).select(
        "hod",
        "clicks",
        "views",
        F.expr("clicks + views").alias("n"),
        F.expr("cast(clicks as double) / cast(clicks + views as double)").alias(
            "ph"
        ),
    )
    return p.select(
        "hod",
        "clicks",
        "views",
        F.expr("clicks * 1000000 div n").cast("bigint").alias("rate_ppm"),
        F.round(
            F.expr(
                "(ph + 1.9208 / n - 1.96 * sqrt(ph * (1 - ph) / n"
                " + 0.9604 / (n * n))) / (1 + 3.8416 / n)"
            ),
            6,
        ).alias("wilson_lb"),
        F.round(
            F.expr(
                "(ph + 1.9208 / n + 1.96 * sqrt(ph * (1 - ph) / n"
                " + 0.9604 / (n * n))) / (1 + 3.8416 / n)"
            ),
            6,
        ).alias("wilson_ub"),
    )


@query(
    "q332_dedup_retention_bias",
    r"""
    WITH keyed AS (
      SELECT doc_id, source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS ck
      FROM documents),
    surv AS (SELECT ck, min(doc_id) AS keep_id FROM keyed GROUP BY ck),
    lab AS (SELECT k.source,
                   CASE WHEN k.doc_id = s.keep_id THEN 1 ELSE 0 END AS kept
            FROM keyed k JOIN surv s ON k.ck = s.ck),
    per AS (SELECT source, cast(count(*) AS BIGINT) AS n_docs,
                   cast(sum(kept) AS BIGINT) AS kept
            FROM lab GROUP BY source),
    tot AS (SELECT cast(sum(n_docs) AS BIGINT) AS t_n,
                   cast(sum(kept) AS BIGINT) AS t_k
            FROM per)
    SELECT per.source, per.n_docs, per.kept,
           cast(per.kept * 1000000 // per.n_docs AS BIGINT) AS kept_ppm,
           cast(per.n_docs * tot.t_k * 1000 // tot.t_n AS BIGINT)
             AS exp_kept_milli,
           round((per.kept::DOUBLE
                  - per.n_docs::DOUBLE * tot.t_k::DOUBLE / tot.t_n::DOUBLE)
                 * (per.kept::DOUBLE
                    - per.n_docs::DOUBLE * tot.t_k::DOUBLE / tot.t_n::DOUBLE)
                 / (per.n_docs::DOUBLE * tot.t_k::DOUBLE / tot.t_n::DOUBLE),
                 6) AS chi2_contrib
    FROM per CROSS JOIN tot
    """,
    doc="Dedup retention-bias audit: after q40's exact dedup, does "
    "survivorship fall uniformly across sources, or does the "
    "min-doc-id survivor rule systematically erase one source's "
    "contribution (duplicates resolve toward whichever source was "
    "ingested first)? Per-source kept-rate vs the global rate with "
    "per-source chi-square contributions — the fairness gate a "
    "training-mix owner runs before trusting post-dedup domain "
    "weights (q99/q115 tune the mix; this verifies dedup didn't "
    "silently re-tune it). Plan: one content-hash aggregate (the "
    "dedup shuffle itself), survivor flags join back on the hash "
    "key (same partitioning, AQE-elidable), then a source-"
    "cardinality rollup. chi2 terms are IEEE-deterministic "
    "arithmetic on exact integer counts (div/sub/mul only, no "
    "libm), rounded at 6dp.",
)
def q332_dedup_retention_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("ck"),
    )
    surv = keyed.groupBy("ck").agg(F.min("doc_id").alias("keep_id"))
    lab = keyed.join(surv, "ck").select(
        "source",
        F.expr("case when doc_id = keep_id then 1 else 0 end").alias("kept"),
    )
    per = lab.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("kept").cast("bigint").alias("kept"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("t_n"),
        F.sum("kept").cast("bigint").alias("t_k"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "kept",
            F.expr("kept * 1000000 div n_docs").cast("bigint").alias("kept_ppm"),
            F.expr("n_docs * t_k * 1000 div t_n")
            .cast("bigint")
            .alias("exp_kept_milli"),
            F.round(
                F.expr(
                    "(cast(kept as double) - cast(n_docs as double)"
                    " * cast(t_k as double) / cast(t_n as double))"
                    " * (cast(kept as double) - cast(n_docs as double)"
                    " * cast(t_k as double) / cast(t_n as double))"
                    " / (cast(n_docs as double) * cast(t_k as double)"
                    " / cast(t_n as double))"
                ),
                6,
            ).alias("chi2_contrib"),
        )
    )


@query(
    "q333_khop_reach",
    """
    WITH ps AS (SELECT DISTINCT l_partkey AS part, l_suppkey AS supp
                FROM lineitem),
    h1 AS (SELECT DISTINCT part FROM ps WHERE supp = 1),
    h2 AS (SELECT DISTINCT ps.supp
           FROM ps JOIN h1 ON ps.part = h1.part
           WHERE ps.supp <> 1)
    SELECT 0 AS hop, 'supplier' AS node_type,
           cast(1 AS BIGINT) AS n_nodes
    UNION ALL
    SELECT 1 AS hop, 'part' AS node_type,
           cast((SELECT count(*) FROM h1) AS BIGINT) AS n_nodes
    UNION ALL
    SELECT 2 AS hop, 'supplier' AS node_type,
           cast((SELECT count(*) FROM h2) AS BIGINT) AS n_nodes
    """,
    doc="Bounded k-hop reach (BFS frontier census) from a seed node "
    "over the bipartite part-supplier graph: hop-1 = parts the seed "
    "supplies, hop-2 = OTHER suppliers sharing those parts — the "
    "blast-radius query behind contamination tracing (how far does "
    "one bad source's influence propagate through shared artifacts) "
    "and a bounded alternative to q171's full connected components "
    "when only the neighborhood matters. Each hop is one distinct "
    "semi-join off the edge list, k joins for k hops — no iteration "
    "state, no convergence loop, and every frontier is keyed on the "
    "join column so the plan is k narrow hash joins at any scale. "
    "Frontier sizes, not frontier contents, are the output: counts "
    "reduce to one row per hop.",
)
def q333_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.select(F.col("l_partkey").alias("part"), F.col("l_suppkey").alias("supp"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    h1 = ps.filter(F.col("supp") == 1).select("part").distinct()
    h2 = (
        ps.join(F.broadcast(h1), "part")
        .filter(F.col("supp") != 1)
        .select("supp")
        .distinct()
    )
    n1 = h1.agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    n2 = h2.agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    return (
        n1.crossJoin(F.broadcast(n2))
        .select(
            F.expr(
                "stack(3,"
                " 0, 'supplier', cast(1 as bigint),"
                " 1, 'part', c1,"
                " 2, 'supplier', c2)"
            ).alias("hop", "node_type", "n_nodes")
        )
    )


@query(
    "q334_ngram_coverage",
    r"""
    WITH toks AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS term
      FROM documents),
    tc AS (SELECT term, cast(count(*) AS BIGINT) AS c
           FROM toks WHERE term <> '' GROUP BY term),
    tot AS (SELECT cast(sum(c) AS BIGINT) AS total FROM tc),
    rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r
           FROM tc),
    ks AS (SELECT unnest([10, 100, 1000]) AS k)
    SELECT cast(ks.k AS INT) AS k,
           cast(sum(CASE WHEN rk.r <= ks.k THEN rk.c ELSE 0 END) AS BIGINT)
             AS mass,
           cast(sum(CASE WHEN rk.r <= ks.k THEN rk.c ELSE 0 END) * 1000000
                // tot.total AS BIGINT) AS coverage_ppm
    FROM rk CROSS JOIN ks CROSS JOIN tot
    GROUP BY ks.k, tot.total
    """,
    doc="Vocabulary coverage curve: what fraction of corpus token "
    "mass the top-k most frequent terms carry, k in {10, 100, "
    "1000} — the Zipf-shaped statistic that sizes tokenizer vocabs "
    "and stopword lists (q187 fits the slope; this reads the curve "
    "itself). The Spark side computes the top-1000 WITHOUT a "
    "global window over the vocabulary: q301's two-phase top-k — "
    "per-salt-shard sorted-slice aggregation, then one merge of "
    "the n_salts x 1000 shard survivors — so no task ever holds or "
    "sorts the full term table (vocab is NOT metadata-sized at web "
    "scale). Per-shard memory bound: phase 1 collect_list holds "
    "~ndv/n_salts (term, count) structs in one aggregation buffer, "
    "so n_salts must SCALE with expected vocabulary — size it as "
    "ceil(ndv / 2e6) to keep shards under ~100 MB (the default 8 "
    "covers vocabs to ~16M terms; the merge stays one task because "
    "n_salts*1000 survivors are metadata-sized even at n_salts=1e4). "
    "Prefix masses come from aggregate() over the merged array's "
    "first k entries. The oracle IS the naive global-window "
    "spelling — the differential proves the shard merge loses "
    "nothing. coverage_ppm safe to ~9e12 total tokens (pre-divide "
    "beyond, the q268 lesson).",
)
def q334_ngram_coverage(
    spark: SparkSession, sf_dir: str, n_salts: int = 8
) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    ).filter(F.col("term") != "")
    tc = toks.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    tot = tc.agg(F.sum("c").cast("bigint").alias("total"))
    phase1 = (
        tc.groupBy(F.pmod(F.hash("term"), F.lit(n_salts)).alias("salt"))
        .agg(
            F.expr(
                "slice(array_sort(collect_list(struct(-c as nc, term))),"
                " 1, 1000)"
            ).alias("top")
        )
    )
    merged = phase1.agg(
        F.expr(
            "slice(array_sort(flatten(collect_list(top))), 1, 1000)"
        ).alias("arr")
    )
    masses = merged.select(
        F.expr(
            "stack(3,"
            " 10, aggregate(slice(arr, 1, 10), cast(0 as bigint),"
            "   (acc, x) -> acc - x.nc),"
            " 100, aggregate(slice(arr, 1, 100), cast(0 as bigint),"
            "   (acc, x) -> acc - x.nc),"
            " 1000, aggregate(slice(arr, 1, 1000), cast(0 as bigint),"
            "   (acc, x) -> acc - x.nc))"
        ).alias("k", "mass")
    )
    return (
        masses.crossJoin(F.broadcast(tot))
        .select(
            F.col("k").cast("int").alias("k"),
            "mass",
            F.expr("mass * 1000000 div total").cast("bigint").alias(
                "coverage_ppm"
            ),
        )
    )


@query(
    "q335_brown_forsythe",
    """
    WITH b AS (SELECT l_returnflag AS grp,
                      cast(floor(l_extendedprice / 100) AS BIGINT) AS v
               FROM lineitem),
    cnts AS (SELECT grp, v, cast(count(*) AS BIGINT) AS cnt
             FROM b GROUP BY grp, v),
    tot AS (SELECT grp, cast(sum(cnt) AS BIGINT) AS n FROM cnts GROUP BY grp),
    cum AS (SELECT cnts.grp, cnts.v,
                   sum(cnts.cnt) OVER (PARTITION BY cnts.grp
                                       ORDER BY cnts.v) AS cm,
                   tot.n
            FROM cnts JOIN tot ON cnts.grp = tot.grp),
    med AS (SELECT grp, min(v) AS med
            FROM cum WHERE cm >= (n + 1) // 2 GROUP BY grp),
    z AS (SELECT b.grp, abs(b.v - med.med) AS z
          FROM b JOIN med ON b.grp = med.grp),
    g AS (SELECT grp, cast(count(*) AS BIGINT) AS n_i,
                 cast(sum(z) AS BIGINT) AS sz,
                 cast(sum(z * z) AS BIGINT) AS szz
          FROM z GROUP BY grp),
    s AS (SELECT cast(sum(n_i) AS BIGINT) AS n_total,
                 cast(count(*) AS BIGINT) AS k,
                 cast(sum(szz - sz * sz // n_i) AS BIGINT) AS ssw,
                 cast(sum(sz * sz // n_i)
                      - sum(sz) * sum(sz) // sum(n_i) AS BIGINT) AS ssb
          FROM g)
    SELECT n_total, k, ssb, ssw,
           round((n_total - k)::DOUBLE * ssb::DOUBLE
                 / ((k - 1)::DOUBLE * ssw::DOUBLE), 6) AS bf_f
    FROM s
    """,
    doc="Brown-Forsythe variance-homogeneity test (Levene with group "
    "MEDIANS): are price dispersions equal across return-flag "
    "populations — the precondition check for pooled-variance tests "
    "like q162/q232 (running ANOVA on heteroscedastic groups is the "
    "classic silent error). Group medians come from operators/"
    "stats.py grouped_quantiles — bucket-partitioned CDF arithmetic, "
    "NO per-group global sort or window (a group is a third of the "
    "corpus; q329's cohorts are bounded, these are not). Deviations "
    "are exact integers in coarse value units chosen so every moment "
    "sum — including sz^2/n_i — stays inside int64 at bench scale "
    "(~3.6e17 peak; shrink units as n grows past ~1e9, noted here by "
    "design); the only doubles are the final F ratio, rounded 6dp.",
)
def q335_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr("cast(floor(l_extendedprice / 100) as bigint)").alias("v"),
    )
    med = grouped_quantiles(
        b, F.col("grp"), F.col("v"), [("med", 1, 2)], bucket_width=100
    ).select("grp", "med")
    z = b.join(F.broadcast(med), "grp").select(
        "grp", F.expr("abs(v - med)").alias("z")
    )
    g = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("z").cast("bigint").alias("sz"),
        F.sum(F.expr("z * z")).cast("bigint").alias("szz"),
    )
    s = g.agg(
        F.sum("n_i").cast("bigint").alias("n_total"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum(F.expr("szz - sz * sz div n_i")).cast("bigint").alias("ssw"),
        (
            F.sum(F.expr("sz * sz div n_i"))
            - F.expr("sum(sz) * sum(sz) div sum(n_i)")
        )
        .cast("bigint")
        .alias("ssb"),
    )
    return s.select(
        "n_total",
        "k",
        "ssb",
        "ssw",
        F.round(
            F.expr(
                "cast(n_total - k as double) * cast(ssb as double)"
                " / (cast(k - 1 as double) * cast(ssw as double))"
            ),
            6,
        ).alias("bf_f"),
    )


@query(
    "q336_spearman",
    """
    WITH b AS (SELECT l_returnflag AS grp,
                      cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                        AS xq,
                      cast(floor(l_quantity * 100 + 0.5) AS BIGINT) AS yq
               FROM lineitem),
    rx AS (SELECT grp, xq,
                  2 * rank() OVER (PARTITION BY grp ORDER BY xq)
                    + count(*) OVER (PARTITION BY grp, xq) - 1 AS r2x
           FROM b),
    ry AS (SELECT grp, yq,
                  2 * rank() OVER (PARTITION BY grp ORDER BY yq)
                    + count(*) OVER (PARTITION BY grp, yq) - 1 AS r2y
           FROM b),
    rj AS (SELECT rxd.grp, rxd.r2x, ryd.r2y
           FROM (SELECT DISTINCT grp, xq, r2x FROM rx) rxd
           JOIN (SELECT grp, xq, yq FROM b) rows_
             ON rxd.grp = rows_.grp AND rxd.xq = rows_.xq
           JOIN (SELECT DISTINCT grp, yq, r2y FROM ry) ryd
             ON ryd.grp = rows_.grp AND ryd.yq = rows_.yq),
    m AS (SELECT grp, cast(count(*) AS BIGINT) AS n,
                 cast(sum(r2x) AS BIGINT) AS sx,
                 cast(sum(r2y) AS BIGINT) AS sy,
                 cast(sum(r2x * r2x) AS BIGINT) AS sxx,
                 cast(sum(r2y * r2y) AS BIGINT) AS syy,
                 cast(sum(r2x * r2y) AS BIGINT) AS sxy
          FROM rj GROUP BY grp)
    SELECT grp, n,
           round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
                 / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                      * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
                 6) AS rho_s
    FROM m
    """,
    doc="Spearman rank correlation per group (price vs quantity, "
    "midrank tie handling): the monotone-association measure that "
    "q146's Pearson misses when the relationship is nonlinear. "
    "Doubled midranks (2*rank + tiecount - 1) keep every rank an "
    "exact integer; the Spark side computes them WITHOUT a per-"
    "group global window — operators/stats.py with_prefix_sums "
    "gives each distinct value its exclusive prefix count via "
    "bucket-partitioned arithmetic, and midranks join back onto "
    "rows as ndv-sized rank maps (the oracle IS the naive window "
    "spelling; the differential proves the bucketed CDF loses "
    "nothing). Moment sums are exact bigints (peak ~8.6e17 at "
    "bench scale); the rho formula is the only double, rounded 6dp "
    "(q146 discipline — IEEE div/sqrt are correctly rounded, so "
    "both engines emit identical bits).",
)
def q336_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias("xq"),
        F.expr("cast(floor(l_quantity * 100 + 0.5) as bigint)").alias("yq"),
    ).localCheckpoint(eager=False)

    def rank_map(col: str, width: int, out: str) -> DataFrame:
        counts = (
            b.select("grp", F.col(col).alias("v"))
            .groupBy("grp", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        pre = with_prefix_sums(counts, width, ["cnt"], group_cols=["grp"])
        return pre.select(
            "grp",
            F.col("v").alias(col),
            F.expr("2 * pre_cnt + cnt + 1").cast("bigint").alias(out),
        )

    rx = rank_map("xq", 100000, "r2x")
    ry = rank_map("yq", 100, "r2y")
    rj = b.join(rx, ["grp", "xq"]).join(ry, ["grp", "yq"]).select(
        "grp", "r2x", "r2y"
    )
    m = rj.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r2x").cast("bigint").alias("sx"),
        F.sum("r2y").cast("bigint").alias("sy"),
        F.sum(F.expr("r2x * r2x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("r2y * r2y")).cast("bigint").alias("syy"),
        F.sum(F.expr("r2x * r2y")).cast("bigint").alias("sxy"),
    )
    return m.select(
        "grp",
        "n",
        F.round(
            F.expr(
                "(cast(n as double) * cast(sxy as double)"
                " - cast(sx as double) * cast(sy as double))"
                " / sqrt((cast(n as double) * cast(sxx as double)"
                " - cast(sx as double) * cast(sx as double))"
                " * (cast(n as double) * cast(syy as double)"
                " - cast(sy as double) * cast(sy as double)))"
            ),
            6,
        ).alias("rho_s"),
    )


@query(
    "q337_kendall_tau",
    """
    WITH h AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    pr AS (SELECT a.event_type,
                  CASE WHEN b.y > a.y THEN 1 ELSE 0 END AS conc,
                  CASE WHEN b.y < a.y THEN 1 ELSE 0 END AS disc,
                  CASE WHEN b.y = a.y THEN 1 ELSE 0 END AS tie
           FROM h a JOIN h b
             ON a.event_type = b.event_type AND a.hr < b.hr),
    s AS (SELECT event_type,
                 cast(sum(conc) AS BIGINT) AS c_pairs,
                 cast(sum(disc) AS BIGINT) AS d_pairs,
                 cast(sum(tie) AS BIGINT) AS t_pairs
          FROM pr GROUP BY event_type),
    n AS (SELECT event_type, cast(count(*) AS BIGINT) AS n FROM h
          GROUP BY event_type)
    SELECT s.event_type, n.n, s.c_pairs, s.d_pairs, s.t_pairs,
           round((s.c_pairs - s.d_pairs)::DOUBLE
                 / sqrt((n.n * (n.n - 1) / 2)::DOUBLE
                      * (n.n * (n.n - 1) / 2 - s.t_pairs)::DOUBLE),
                 6) AS tau_b
    FROM s JOIN n ON s.event_type = n.event_type
    """,
    doc="Kendall tau-b trend test per event-type hourly series: the "
    "concordant-minus-discordant pair statistic whose sign reads as "
    "monotone trend and whose magnitude is robust to any monotone "
    "transform — the hypothesis-test companion to q249's Theil-Sen "
    "slope ESTIMATE (same pair set, different reduction). The pair "
    "self-join is time-keyed WITHIN each series: fan-out is "
    "series_length^2 per event type, bounded by observation history "
    "(720 hours here), never by corpus size — the q315/q249 per-"
    "entity pair regime, co-partitioned on the series key. x-ranks "
    "(hours) are tie-free by construction so tau-b's denominator "
    "only corrects y-ties, counted in the same join. Exact integer "
    "pair counts; one rounded double at the end.",
)
def q337_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y")).localCheckpoint(
        eager=False
    )
    a = h.select("event_type", F.col("hr").alias("ha"), F.col("y").alias("ya"))
    bb = h.select("event_type", F.col("hr").alias("hb"), F.col("y").alias("yb"))
    pr = a.join(bb, "event_type").filter(F.col("ha") < F.col("hb"))
    s = pr.groupBy("event_type").agg(
        F.sum(F.expr("case when yb > ya then 1 else 0 end"))
        .cast("bigint")
        .alias("c_pairs"),
        F.sum(F.expr("case when yb < ya then 1 else 0 end"))
        .cast("bigint")
        .alias("d_pairs"),
        F.sum(F.expr("case when yb = ya then 1 else 0 end"))
        .cast("bigint")
        .alias("t_pairs"),
    )
    n = h.groupBy("event_type").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        s.join(n, "event_type")
        .select(
            "event_type",
            "n",
            "c_pairs",
            "d_pairs",
            "t_pairs",
            F.round(
                F.expr(
                    "cast(c_pairs - d_pairs as double)"
                    " / sqrt(cast(n * (n - 1) div 2 as double)"
                    " * cast(n * (n - 1) div 2 - t_pairs as double))"
                ),
                6,
            ).alias("tau_b"),
        )
    )


@query(
    "q338_runs_test",
    """
    WITH h AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type, hr, y,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY y, hr) AS rn,
                 count(*) OVER (PARTITION BY event_type) AS n
          FROM h),
    med AS (SELECT event_type,
                   cast(sum(CASE
                     WHEN n % 2 = 0 AND (rn = n / 2 OR rn = n / 2 + 1)
                       THEN y
                     WHEN n % 2 = 1 AND rn = (n + 1) / 2 THEN 2 * y
                     ELSE 0 END) AS BIGINT) AS med2
            FROM r GROUP BY event_type),
    sg AS (SELECT h.event_type, h.hr,
                  CASE WHEN 2 * h.y > med.med2 THEN 1 ELSE -1 END AS sg
           FROM h JOIN med ON h.event_type = med.event_type
           WHERE 2 * h.y <> med.med2),
    ch AS (SELECT event_type, sg,
                  lag(sg) OVER (PARTITION BY event_type ORDER BY hr)
                    AS prev
           FROM sg),
    st AS (SELECT event_type,
                  cast(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_pos,
                  cast(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS n_neg,
                  cast(1 + sum(CASE WHEN prev IS NOT NULL AND sg <> prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS runs
           FROM ch GROUP BY event_type)
    SELECT event_type, n_pos, n_neg, runs,
           CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                ELSE round((runs::DOUBLE
                  - (2.0 * n_pos * n_neg / (n_pos + n_neg) + 1.0))
                 / sqrt(2.0 * n_pos * n_neg
                        * (2.0 * n_pos * n_neg - n_pos - n_neg)
                        / ((n_pos + n_neg)::DOUBLE
                           * (n_pos + n_neg)::DOUBLE
                           * (n_pos + n_neg - 1)::DOUBLE)),
                 6) END AS z_runs
    FROM st
    """,
    doc="Wald-Wolfowitz runs test per event-type hourly series: is "
    "the above/below-median sign sequence random, or does it clump "
    "(positive autocorrelation, too few runs) or oscillate (too "
    "many)? The randomness gate that validates q150's EWMA and "
    "q223's autocorrelation assumptions before anyone trusts them. "
    "Median uses q329's exact 2x integer spelling; exact-median "
    "points are EXCLUDED (the standard treatment). Runs counting is "
    "one lag() over the series-partitioned time order — series-"
    "bounded windows (history length, not corpus), the q329 "
    "discipline. The z-score against the exact null mean/variance "
    "is the single double expression, rounded 6dp, built from "
    "IEEE-only arithmetic on exact integer counts.",
)
def q338_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    wc = W.partitionBy("event_type")
    r = h.select(
        "event_type",
        "hr",
        "y",
        F.row_number().over(wc.orderBy("y", "hr")).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    med = r.groupBy("event_type").agg(
        F.sum(
            F.expr(
                "case when n % 2 = 0 and (rn = n div 2 or rn = n div 2 + 1)"
                " then y when n % 2 = 1 and rn = (n + 1) div 2 then 2 * y"
                " else 0 end"
            )
        )
        .cast("bigint")
        .alias("med2")
    )
    sg = (
        h.join(med, "event_type")
        .filter(F.expr("2 * y <> med2"))
        .select(
            "event_type",
            "hr",
            F.expr("case when 2 * y > med2 then 1 else -1 end").alias("sg"),
        )
    )
    ch = sg.select(
        "event_type",
        "sg",
        F.lag("sg").over(W.partitionBy("event_type").orderBy("hr")).alias("prev"),
    )
    st = ch.groupBy("event_type").agg(
        F.sum(F.expr("case when sg = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(F.expr("case when sg = -1 then 1 else 0 end"))
        .cast("bigint")
        .alias("n_neg"),
        (
            F.lit(1)
            + F.sum(
                F.expr(
                    "case when prev is not null and sg <> prev then 1 else 0 end"
                )
            )
        )
        .cast("bigint")
        .alias("runs"),
    )
    return st.select(
        "event_type",
        "n_pos",
        "n_neg",
        "runs",
        # NULL guard: a series entirely above or below its median after
        # exclusions (n_pos or n_neg = 0) makes the null variance 0 —
        # the sqrt argument hits 0 and the z ratio goes NaN/Inf, and
        # NaN != NaN would break the oracle differential.
        F.when(
            (F.col("n_pos") == 0) | (F.col("n_neg") == 0), F.lit(None)
        )
        .otherwise(
            F.round(
                F.expr(
                    "(cast(runs as double) - (2.0 * n_pos * n_neg"
                    " / (n_pos + n_neg) + 1.0))"
                    " / sqrt(2.0 * n_pos * n_neg"
                    " * (2.0 * n_pos * n_neg - n_pos - n_neg)"
                    " / (cast(n_pos + n_neg as double)"
                    " * cast(n_pos + n_neg as double)"
                    " * cast(n_pos + n_neg - 1 as double)))"
                ),
                6,
            )
        )
        .alias("z_runs"),
    )


@query(
    "q339_zonemap_skipping",
    """
    WITH b AS (SELECT l_orderkey AS k,
                      epoch_us(l_shipdate) // 86400000000 AS day
               FROM lineitem),
    mm AS (SELECT min(day) AS mn, max(day) AS mx FROM b),
    f AS (SELECT 'hash' AS layout,
                 ('0x' || substr(md5(b.k::VARCHAR), 1, 8))::BIGINT % 64
                   AS file_id,
                 b.day
          FROM b
          UNION ALL
          SELECT 'clustered' AS layout,
                 (b.day - mm.mn) * 64 // (mm.mx - mm.mn + 1) AS file_id,
                 b.day
          FROM b CROSS JOIN mm),
    z AS (SELECT layout, file_id,
                 cast(min(day) AS BIGINT) AS lo,
                 cast(max(day) AS BIGINT) AS hi,
                 cast(count(*) AS BIGINT) AS n_rows
          FROM f GROUP BY layout, file_id),
    p AS (SELECT epoch_us(TIMESTAMP '1998-06-01') // 86400000000 AS p_lo,
                 epoch_us(TIMESTAMP '1998-06-30') // 86400000000 AS p_hi)
    SELECT z.layout,
           cast(count(*) AS BIGINT) AS n_files,
           cast(sum(CASE WHEN z.hi < p.p_lo OR z.lo > p.p_hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
           cast(sum(CASE WHEN z.hi < p.p_lo OR z.lo > p.p_hi
                    THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
             AS skip_files_ppm,
           cast(sum(z.n_rows) AS BIGINT) AS rows_total,
           cast(sum(CASE WHEN z.hi < p.p_lo OR z.lo > p.p_hi
                    THEN z.n_rows ELSE 0 END) AS BIGINT) AS rows_skipped,
           cast(sum(CASE WHEN z.hi < p.p_lo OR z.lo > p.p_hi
                    THEN z.n_rows ELSE 0 END) * 1000000
                // sum(z.n_rows) AS BIGINT) AS rows_skipped_ppm
    FROM z CROSS JOIN p
    GROUP BY z.layout
    """,
    doc="Zone-map (min/max file-skipping) effectiveness under two "
    "physical layouts: the same rows assigned to 64 synthetic files "
    "by (a) key hash — the default write pattern — and (b) range "
    "clustering on the filter column, then a 30-day ship-date "
    "predicate evaluated against per-file min/max stats only. The "
    "audit quantifies THE storage-layout decision at 100 TB: hash "
    "layouts give every file the full value range (hi/lo straddle "
    "every predicate, ~0% skipped), range-clustered layouts skip "
    "~11/12 of files on a month predicate — this is why "
    "storage/layout.py orders rows before writing and what q77's "
    "partition pruning buys. Zone stats are one aggregate per "
    "(layout, file) — 128 metadata rows; skip verdicts are pure "
    "range arithmetic against broadcast predicate bounds. File "
    "assignment is md5-portable (hash layout) and integer range "
    "arithmetic (clustered), so both engines build identical zones.",
)
def q339_zonemap_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("k"),
        F.expr("unix_micros(l_shipdate) div 86400000000").alias("day"),
    )
    mm = b.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    hashed = b.select(
        F.lit("hash").alias("layout"),
        F.expr(
            "conv(substr(md5(cast(k as string)), 1, 8), 16, 10) % 64"
        )
        .cast("bigint")
        .alias("file_id"),
        "day",
    )
    clustered = b.crossJoin(F.broadcast(mm)).select(
        F.lit("clustered").alias("layout"),
        F.expr("(day - mn) * 64 div (mx - mn + 1)").alias("file_id"),
        "day",
    )
    z = (
        hashed.unionByName(clustered)
        .groupBy("layout", "file_id")
        .agg(
            F.min("day").cast("bigint").alias("lo"),
            F.max("day").cast("bigint").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    zp = z.select(
        "*",
        F.expr("unix_micros(timestamp '1998-06-01') div 86400000000").alias(
            "p_lo"
        ),
        F.expr("unix_micros(timestamp '1998-06-30') div 86400000000").alias(
            "p_hi"
        ),
    )
    return zp.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum(F.expr("case when hi < p_lo or lo > p_hi then 1 else 0 end"))
        .cast("bigint")
        .alias("n_skipped"),
        F.expr(
            "cast(sum(case when hi < p_lo or lo > p_hi then 1 else 0 end)"
            " * 1000000 div count(*) as bigint)"
        ).alias("skip_files_ppm"),
        F.sum("n_rows").cast("bigint").alias("rows_total"),
        F.sum(F.expr("case when hi < p_lo or lo > p_hi then n_rows else 0 end"))
        .cast("bigint")
        .alias("rows_skipped"),
        F.expr(
            "cast(sum(case when hi < p_lo or lo > p_hi then n_rows"
            " else 0 end) * 1000000 div sum(n_rows) as bigint)"
        ).alias("rows_skipped_ppm"),
    )


@query(
    "q340_design_effect",
    """
    WITH b AS (SELECT l_returnflag AS grp,
                      cast(floor(l_extendedprice / 100) AS BIGINT) AS v
               FROM lineitem),
    g AS (SELECT grp, cast(count(*) AS BIGINT) AS n_h,
                 cast(sum(v) AS BIGINT) AS s_h,
                 cast(sum(v * v) AS BIGINT) AS ssq_h
          FROM b GROUP BY grp),
    s AS (SELECT cast(sum(n_h) AS BIGINT) AS n,
                 cast(count(*) AS BIGINT) AS k,
                 cast(sum(s_h) AS BIGINT) AS s_tot,
                 cast(sum(ssq_h) AS BIGINT) AS ssq_tot,
                 cast(sum(n_h * ((ssq_h - s_h * s_h // n_h) * 1000
                                 // (n_h - 1))) AS BIGINT) AS num
          FROM g)
    SELECT n, k,
           cast((ssq_tot - s_tot * s_tot // n) * 1000 // (n - 1)
                AS BIGINT) AS s2_pop_milli,
           cast(num // n AS BIGINT) AS s2_strat_milli,
           cast((num // n) * 1000
                // ((ssq_tot - s_tot * s_tot // n) * 1000 // (n - 1))
                AS BIGINT) AS deff_milli
    FROM s
    """,
    doc="Stratification design effect: the ratio of the stratified-"
    "sample mean variance (proportional allocation) to the simple-"
    "random-sample variance — deff = sum_h W_h S_h^2 / S^2, the "
    "number that says how many SRS samples one stratified sample is "
    "worth (deff < 1000 milli = stratifying by return flag helps; "
    "q273's Neyman allocation OPTIMIZES the split, this MEASURES "
    "whether stratifying is worth it at all). Per-stratum second "
    "moments are one grouped aggregate; value units chosen (price "
    "div 100) so every term — including s_h^2 — fits int64 at "
    "bench scale (peak ~4e16; shrink units past ~1e9 rows/stratum, "
    "by design not discovery). Variances carried as exact integer "
    "milli-units; zero float anywhere, including the final ratio.",
)
def q340_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_returnflag").alias("grp"),
        F.expr("cast(floor(l_extendedprice / 100) as bigint)").alias("v"),
    )
    g = b.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_h"),
        F.sum("v").cast("bigint").alias("s_h"),
        F.sum(F.expr("v * v")).cast("bigint").alias("ssq_h"),
    )
    s = g.agg(
        F.sum("n_h").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("s_h").cast("bigint").alias("s_tot"),
        F.sum("ssq_h").cast("bigint").alias("ssq_tot"),
        F.sum(
            F.expr(
                "n_h * ((ssq_h - s_h * s_h div n_h) * 1000 div (n_h - 1))"
            )
        )
        .cast("bigint")
        .alias("num"),
    )
    return s.select(
        "n",
        "k",
        F.expr("(ssq_tot - s_tot * s_tot div n) * 1000 div (n - 1)")
        .cast("bigint")
        .alias("s2_pop_milli"),
        F.expr("num div n").cast("bigint").alias("s2_strat_milli"),
        F.expr(
            "(num div n) * 1000"
            " div ((ssq_tot - s_tot * s_tot div n) * 1000 div (n - 1))"
        )
        .cast("bigint")
        .alias("deff_milli"),
    )


def _hll_curve_params(m: int) -> tuple[int, int, float]:
    """(ridx_hex_chars, w_start, alpha) for the q341 error curve.

    m=16 uses 1 hex char (4 bits), m=256 uses 2 (8 bits), m=1024 uses
    4 chars mod 1024 (12 of 16 bits — still uniform); w is always the
    13 hex chars (52 bits) AFTER the index chars, so rho <= 53 and the
    exact harmonic sum's worst case stays under 2^63 for every m here
    (m*2^53 is reached only with zero registers set, impossible on
    nonempty input)."""
    if m == 16:
        return 1, 2, 0.673
    if m == 256:
        return 2, 3, 0.7213 / (1 + 1.079 / 256)
    if m == 1024:
        return 4, 5, 0.7213 / (1 + 1.079 / 1024)
    raise ValueError(m)


def _hll_curve_sql(m: int, select_k: str) -> str:
    nc, ws, alpha = _hll_curve_params(m)
    return f"""(
      WITH r0 AS (
        SELECT ('0x' || substr(md5(k::VARCHAR), 1, {nc}))::BIGINT % {m}
                 AS ridx,
               substr(md5(k::VARCHAR), {ws}, 13) AS w
        FROM ({select_k})),
      r1 AS (
        SELECT ridx,
               CASE WHEN length(ltrim(w, '0')) = 0 THEN 53
                    ELSE (length(w) - length(ltrim(w, '0'))) * 4
                         + 3 - cast(substr('011222233333333',
                               strpos('0123456789abcdef',
                                      substr(ltrim(w, '0'), 1, 1)) - 1, 1)
                               AS INT)
                         + 1 END AS rho
        FROM r0),
      regs AS (SELECT ridx, max(rho) AS rho FROM r1 GROUP BY ridx),
      agg AS (SELECT cast(count(*) AS BIGINT) AS nset,
                     cast(sum(1::BIGINT << cast(53 - rho AS INT)) AS BIGINT)
                       AS hsum
              FROM regs),
      est AS (SELECT nset,
                     cast({alpha!r} AS DOUBLE) * ({m} * {m})
                       * 9007199254740992.0
                       / cast(hsum + ({m} - nset)
                              * (1::BIGINT << 53) AS DOUBLE) AS raw,
                     {m} - nset AS zeros
              FROM agg)
      SELECT cast(floor(CASE WHEN zeros > 0 AND raw <= 2.5 * {m}
                             THEN {m}.0 * ln({m}.0 / zeros) ELSE raw END
                        * 1000 + 0.5) AS BIGINT)
      FROM est)"""


@query(
    "q341_hll_error_curve",
    f"""
    WITH exact AS (SELECT cast(count(DISTINCT l_orderkey) AS BIGINT)
                     AS exact FROM lineitem),
    c AS (
      SELECT 16 AS m,
             {_hll_curve_sql(16, "SELECT l_orderkey AS k FROM lineitem")}
               AS est_milli
      UNION ALL
      SELECT 256 AS m,
             {_hll_curve_sql(256, "SELECT l_orderkey AS k FROM lineitem")}
               AS est_milli
      UNION ALL
      SELECT 1024 AS m,
             {_hll_curve_sql(1024, "SELECT l_orderkey AS k FROM lineitem")}
               AS est_milli)
    SELECT cast(c.m AS INT) AS m, c.est_milli, exact.exact,
           cast(abs(c.est_milli - 1000 * exact.exact) * 1000
                // exact.exact AS BIGINT) AS err_ppm
    FROM c CROSS JOIN exact
    """,
    doc="HLL accuracy-vs-memory curve: the SAME portable register "
    "pipeline (q165's md5 family) evaluated at m in {16, 256, 1024} "
    "registers against the exact distinct count — measured error "
    "should track the 1.04/sqrt(m) theory line (26%% / 6.5%% / "
    "3.25%%), and the curve is the sizing table for every sketch "
    "deployment decision (q38/q87/q167/q184 all inherit m=256; this "
    "query is the evidence that choice sits on). Each m is one "
    "map-side (register, rho) projection + a <=m-row max aggregate "
    "— three sketch builds and the exact count share one scan "
    "each, all shuffles register- or key-bounded. The harmonic sums "
    "stay EXACT int64 at every m (see _hll_curve_params: 2^53-scale "
    "contributions, worst case under 2^63 on nonempty input); the "
    "one float division per estimate is IEEE-only, floor-quantized "
    "to milli-units in lockstep with the oracle.",
)
def q341_hll_error_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("k"))
    exact = li.agg(F.countDistinct("k").cast("bigint").alias("exact"))

    def est_for(m: int) -> DataFrame:
        nc, ws, alpha = _hll_curve_params(m)
        h = F.md5(F.col("k").cast("string"))
        ridx = (F.conv(F.substring(h, 1, nc), 16, 10).cast("bigint") % m).alias(
            "ridx"
        )
        w = F.substring(h, ws, 13)
        stripped = F.regexp_replace(w, "^0+", "")
        n0 = (F.length(w) - F.length(stripped)).cast("int")
        first = F.substring(stripped, 1, 1)
        dval = F.instr(F.lit("0123456789abcdef"), first).cast("int")
        msb = F.substring(F.lit("011222233333333"), dval - 1, 1).cast("int")
        rho = F.when(F.length(stripped) == 0, F.lit(53)).otherwise(
            n0 * 4 + (F.lit(3) - msb) + 1
        )
        regs = (
            li.select(ridx, rho.alias("rho"))
            .groupBy("ridx")
            .agg(F.max("rho").alias("rho"))
        )
        agg = regs.agg(
            F.count(F.lit(1)).cast("bigint").alias("nset"),
            F.sum(
                F.expr("shiftleft(cast(1 as bigint), cast(53 - rho as int))")
            )
            .cast("bigint")
            .alias("hsum"),
        )
        raw = (
            F.lit(alpha)
            * F.lit(float(m * m))
            * F.lit(float(1 << 53))
            / (
                F.col("hsum")
                + (F.lit(m) - F.col("nset")) * F.lit(1 << 53).cast("bigint")
            ).cast("double")
        )
        zeros = F.lit(m) - F.col("nset")
        linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
        est = F.when((zeros > 0) & (raw <= 2.5 * m), linear).otherwise(raw)
        return agg.select(
            F.lit(m).cast("int").alias("m"),
            F.floor(est * 1000 + F.lit(0.5)).cast("bigint").alias("est_milli"),
        )

    c = est_for(16).unionByName(est_for(256)).unionByName(est_for(1024))
    return c.crossJoin(F.broadcast(exact)).select(
        "m",
        "est_milli",
        "exact",
        F.expr("abs(est_milli - 1000 * exact) * 1000 div exact")
        .cast("bigint")
        .alias("err_ppm"),
    )


@query(
    "q342_gopher_gates",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks, text FROM documents),
    feat AS (
      SELECT doc_id,
             cast(len(toks) AS BIGINT) AS n_words,
             cast(length(replace(text, ' ', '')) * 1000
                  // greatest(len(toks), 1) AS BIGINT) AS mean_len_milli,
             cast(len(list_filter(['the', 'a', 'and', 'of', 'to'],
                                  s -> list_contains(toks, s)))
                  AS BIGINT) AS n_stops
      FROM t),
    rep AS (SELECT doc_id, cast(max(c) AS BIGINT) AS top_freq
            FROM (SELECT doc_id, count(*) AS c
                  FROM (SELECT doc_id, unnest(toks) AS w FROM t)
                  GROUP BY doc_id, w)
            GROUP BY doc_id),
    lab AS (
      SELECT f.doc_id,
             CASE WHEN f.n_words < 50 OR f.n_words > 100000
                  THEN 1 ELSE 0 END AS f_wordcount,
             CASE WHEN f.mean_len_milli < 3000 OR f.mean_len_milli > 10000
                  THEN 1 ELSE 0 END AS f_meanlen,
             CASE WHEN f.n_stops < 2 THEN 1 ELSE 0 END AS f_stopwords,
             CASE WHEN coalesce(r.top_freq, 0) * 1000 > 200 * f.n_words
                  THEN 1 ELSE 0 END AS f_repetition
      FROM feat f LEFT JOIN rep r ON f.doc_id = r.doc_id),
    s AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(f_wordcount) AS BIGINT) AS c1,
                 cast(sum(f_meanlen) AS BIGINT) AS c2,
                 cast(sum(f_stopwords) AS BIGINT) AS c3,
                 cast(sum(f_repetition) AS BIGINT) AS c4,
                 cast(sum(CASE WHEN f_wordcount + f_meanlen + f_stopwords
                                    + f_repetition = 0
                          THEN 1 ELSE 0 END) AS BIGINT) AS np
          FROM lab)
    SELECT 'word_count' AS rule, c1 AS n_fail,
           cast(c1 * 1000000 // n AS BIGINT) AS fail_ppm FROM s
    UNION ALL
    SELECT 'mean_word_len' AS rule, c2 AS n_fail,
           cast(c2 * 1000000 // n AS BIGINT) AS fail_ppm FROM s
    UNION ALL
    SELECT 'stop_words' AS rule, c3 AS n_fail,
           cast(c3 * 1000000 // n AS BIGINT) AS fail_ppm FROM s
    UNION ALL
    SELECT 'repetition' AS rule, c4 AS n_fail,
           cast(c4 * 1000000 // n AS BIGINT) AS fail_ppm FROM s
    UNION ALL
    SELECT 'all_pass' AS rule, np AS n_fail,
           cast(np * 1000000 // n AS BIGINT) AS fail_ppm FROM s
    """,
    doc="Gopher-style quality-gate census (Rae et al. 2021 rule "
    "family, public knowledge): per-rule failure counts for word-"
    "count bounds, mean word length bounds, minimum stop-word "
    "diversity, and max single-token repetition share — the "
    "rule-based pre-filter that runs BEFORE model-based quality "
    "scoring in every serious corpus pipeline (q47 scores; this "
    "gates). Word counts and mean lengths are map-side expressions; "
    "the repetition rule needs the per-doc mode frequency — one "
    "(doc, word) aggregate then a per-doc max, both keyed on "
    "doc_id so the shuffle is token-scale but perfectly "
    "partitionable, no skew beyond single-doc length. Thresholds "
    "are integer milli/ppm comparisons (top_freq*1000 > 200*n "
    "avoids any division); the census collapses to one 5-row "
    "stack.",
)
def q342_gopher_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.expr(
            r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')"
        ).alias("toks"),
        "text",
    )
    feat = t.select(
        "doc_id",
        F.expr("cast(size(toks) as bigint)").alias("n_words"),
        F.expr(
            "cast(length(replace(text, ' ', '')) * 1000"
            " div greatest(size(toks), 1) as bigint)"
        ).alias("mean_len_milli"),
        F.expr(
            "cast(size(filter(array('the', 'a', 'and', 'of', 'to'),"
            " s -> array_contains(toks, s))) as bigint)"
        ).alias("n_stops"),
    )
    rep = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").cast("bigint").alias("top_freq"))
    )
    # LEFT join: a zero-token doc has no (doc, word) rows, so an inner
    # join would silently drop it from n and every rule count — the
    # worst documents would be invisible to the census. coalesce(0)
    # makes it fail word_count (<50) and pass repetition (0 > 0 false).
    lab = feat.join(rep, "doc_id", "left").withColumn(
        "top_freq", F.coalesce(F.col("top_freq"), F.lit(0).cast("bigint"))
    ).select(
        F.expr(
            "case when n_words < 50 or n_words > 100000 then 1 else 0 end"
        ).alias("f_wordcount"),
        F.expr(
            "case when mean_len_milli < 3000 or mean_len_milli > 10000"
            " then 1 else 0 end"
        ).alias("f_meanlen"),
        F.expr("case when n_stops < 2 then 1 else 0 end").alias("f_stopwords"),
        F.expr(
            "case when top_freq * 1000 > 200 * n_words then 1 else 0 end"
        ).alias("f_repetition"),
    )
    s = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("f_wordcount").cast("bigint").alias("c1"),
        F.sum("f_meanlen").cast("bigint").alias("c2"),
        F.sum("f_stopwords").cast("bigint").alias("c3"),
        F.sum("f_repetition").cast("bigint").alias("c4"),
        F.sum(
            F.expr(
                "case when f_wordcount + f_meanlen + f_stopwords"
                " + f_repetition = 0 then 1 else 0 end"
            )
        )
        .cast("bigint")
        .alias("np"),
    )
    return s.select(
        F.expr(
            "stack(5,"
            " 'word_count', c1, cast(c1 * 1000000 div n as bigint),"
            " 'mean_word_len', c2, cast(c2 * 1000000 div n as bigint),"
            " 'stop_words', c3, cast(c3 * 1000000 div n as bigint),"
            " 'repetition', c4, cast(c4 * 1000000 div n as bigint),"
            " 'all_pass', np, cast(np * 1000000 div n as bigint))"
        ).alias("rule", "n_fail", "fail_ppm")
    )


def _SIMHASH_CENSUS_ORACLE() -> str:
    cnt_cols = ", ".join(
        f"sum(({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) AS c{i}"
        for i in range(64)
    )

    def band(k: int) -> str:
        return " + ".join(
            f"(((2 * c{16 * k + i} > n)::BIGINT) << {i})" for i in range(16)
        )

    bands = ", ".join(f"{band(k)} AS b{k}" for k in range(4))
    ham = " + ".join(f"bit_count(xor(a.b{k}, b.b{k}))" for k in range(4))
    anyband = " OR ".join(f"a.b{k} = b.b{k}" for k in range(4))
    return f"""
    WITH sh AS (SELECT doc_id, list_distinct({_TOKS}) AS s FROM documents),
         ex AS (SELECT doc_id, len(s) AS n, unnest(s) AS t FROM sh
                WHERE len(s) > 0),
         hv AS (SELECT doc_id, n,
                ('0x' || substr(md5(t), 1, 8))::BIGINT AS hi,
                ('0x' || substr(md5(t), 9, 8))::BIGINT AS lo FROM ex),
         cnt AS (SELECT doc_id, any_value(n) AS n, {cnt_cols}
                 FROM hv GROUP BY doc_id),
         sig AS (SELECT doc_id, {bands} FROM cnt),
         pr AS (SELECT cast({ham} AS BIGINT) AS hamming
                FROM sig a JOIN sig b ON a.doc_id < b.doc_id
                WHERE {anyband})
    SELECT hamming, cast(count(*) AS BIGINT) AS n_pairs,
           (hamming <= 3) AS guaranteed
    FROM pr GROUP BY hamming
    """


@query(
    "q343_simhash_hamming_census",
    _SIMHASH_CENSUS_ORACLE(),
    doc="SimHash band-candidate Hamming census: the distribution of "
    "TRUE Hamming distances among pairs the 4x16 banding surfaces — "
    "the tuning evidence behind q43's threshold. Pairs at hamming "
    "<= 3 are guaranteed candidates (pigeonhole: 4 errors can't "
    "touch all 4 bands... 3 can't); everything above 3 in the "
    "census is banding OVER-recall, i.e. the verify stage's "
    "workload, and its mass tells you whether to re-band (more, "
    "narrower bands = more candidates, fewer misses). Same "
    "md5-portable signature family as q43 so DuckDB rebuilds "
    "identical signatures; the Spark side reuses the banded "
    "self-join WITHOUT the hamming filter and histograms the "
    "popcounts — candidate-bounded work, never all-pairs (the "
    "oracle's exhaustive join is oracle-scale only).",
)
def q343_simhash_hamming_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.dedup import simhash64_portable

    docs = _t(spark, sf_dir, "documents")
    # lazy localCheckpoint (NOT persist): a long-lived driver iterating
    # the registry (bench sweeps) would leak cached blocks from an
    # un-unpersisted persist; checkpoint blocks are owned by the frame
    # and reclaimed with it (same discipline as q323/q333/q337).
    sh = simhash64_portable(docs, "doc_id", "text").localCheckpoint(eager=False)
    banded = sh.select(
        F.col("doc_id").alias("__id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("__id", "simhash", "bb.band", "bb.bucket")
    left = banded.select(
        F.col("__id").alias("id_a"), F.col("simhash").alias("sim_a"),
        "band", "bucket",
    )
    right = banded.select(
        F.col("__id").alias("id_b"), F.col("simhash").alias("sim_b"),
        "band", "bucket",
    )
    pairs = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sim_a", "sim_b")
        .distinct()
    )
    return (
        pairs.select(
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
            .cast("bigint")
            .alias("hamming")
        )
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            "hamming",
            "n_pairs",
            (F.col("hamming") <= 3).alias("guaranteed"),
        )
    )


@query(
    "q344_priority_waiting_semi",
    """
    SELECT o.o_orderpriority,
           cast(count(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): the correlated "
    "EXISTS subquery a warehouse user writes weekly, decorrelated by "
    "Catalyst into a LeftSemi join — each order counts AT MOST ONCE "
    "no matter how many lineitems match, which a plain inner join + "
    "distinct would spell with an extra corpus-scale shuffle. The "
    "semi join's build side is the matching-lineitem key set "
    "(corpus-scale, NOT broadcastable), so the scale plan is a "
    "shuffled LeftSemi on orderkey with the quarter filter pushed "
    "to the orders scan (predicate + partition pruning cut the probe "
    "side first — the dominant term at 100 TB). Q4's commitdate/"
    "receiptdate predicate is adapted to l_returnflag = 'R' (this "
    "corpus has no commit/receipt columns); the join SHAPE — "
    "EXISTS -> LeftSemi, per-order dedup for free — is the exhibit. "
    "Exact integer counts; group keys total-order the 5-row result.",
)
def q344_priority_waiting_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    flagged = (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(flagged, o["o_orderkey"] == flagged["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
    )


@query(
    "q345_supplier_cnt_anti",
    """
    SELECT p.p_brand, p.p_type, cast(p.p_size AS INT) AS p_size,
           cast(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 20
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): NOT IN against "
    "a complaint-supplier subquery, decorrelated into a LeftAnti join "
    "— the exclusion list (s_acctbal < 0) is metadata-sized, so the "
    "anti join BROADCASTS its build side and costs one map-side probe "
    "per lineitem, never a shuffle. The part dim filter (brand/size "
    "IN-list) broadcasts too; the only corpus-scale exchange is the "
    "count(DISTINCT suppkey) aggregate on the group keys (Spark "
    "plans it as the two-level expand+agg, partial map-side). "
    "lineitem stands in for partsupp (this corpus has none) — the "
    "shape is NOT IN -> broadcast anti, distinct-count, top-k via "
    "TakeOrderedAndProject with the full key as tiebreak. Exact "
    "integer counts; keys are unique per group so the top-20 is a "
    "total order.",
)
def q345_supplier_cnt_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    p = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"),
              "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(20)
    )


@query(
    "q346_waiting_supplier",
    """
    WITH late AS (SELECT l_orderkey, l_suppkey FROM lineitem
                  WHERE l_returnflag = 'R')
    SELECT s.s_name, cast(count(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
                 AND o.o_orderstatus = 'F'
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "DOUBLE-correlated EXISTS / NOT EXISTS — find the supplier whose "
    "line was flagged while NO other supplier's line in the same "
    "multi-supplier order was — the hardest standard decorrelation "
    "(two subqueries correlated on the same key with an inequality "
    "on a second column). Spelled as one shuffled LeftSemi (another "
    "supplier exists in the order) plus one shuffled LeftAnti (no "
    "OTHER flagged supplier), both keyed on orderkey with the "
    "suppkey<>suppkey residual — all three joins share the orderkey "
    "partitioning so AQE reuses one exchange of the flagged subset; "
    "the supplier name dim broadcasts; top-20 is "
    "TakeOrderedAndProject. 'Late' is adapted to l_returnflag = 'R' "
    "and o_orderstatus = 'F' (no commit/receipt dates here); counts "
    "are row-granular exactly like Q21 (a supplier with two flagged "
    "lines in one order counts twice). Exact integers; s_name "
    "tiebreak totals the order.",
)
def q346_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_suppkey", "l_returnflag")
    late = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    o = t["orders"].filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    sup = t["supplier"].select("s_suppkey", "s_name")
    return (
        late.join(o, late["l_orderkey"] == o["o_orderkey"])
        .join(
            l2,
            (F.col("l_orderkey") == F.col("k2"))
            & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("k3"))
            & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def _bh_thresholds(m: int = 120, alpha: float = 0.05) -> list[tuple[int, int]]:
    """Benjamini-Hochberg z-scale rejection spine: thr(k) =
    floor(Phi^-1(1 - alpha*k/(2m)) * 1000) for k = 1..m. Computed once
    at build time with the stdlib's deterministic AS241 inverse normal
    (statistics.NormalDist.inv_cdf — pure-Python rational approximation,
    platform-independent) and embedded as LITERALS in both the Spark
    plan and the oracle SQL, so no runtime libm call can diverge."""
    import math as _math
    from statistics import NormalDist

    nd = NormalDist()
    return [
        (k, int(_math.floor(nd.inv_cdf(1.0 - alpha * k / (2.0 * m)) * 1000)))
        for k in range(1, m + 1)
    ]


def _BH_FDR_ORACLE() -> str:
    thr_values = ", ".join(f"({k}, {t})" for k, t in _bh_thresholds())
    return f"""
    WITH cells AS (
      SELECT event_type, cast(extract(hour FROM ts) AS INT) AS hr,
             cast(count(*) AS BIGINT) AS n,
             cast(sum((value >= 50.0)::INT) AS BIGINT) AS s
      FROM events
      WHERE event_type IN ('click', 'view', 'signup', 'purchase', 'error')
      GROUP BY 1, 2),
    tot AS (SELECT cast(sum(n) AS BIGINT) AS nn,
                   cast(sum(s) AS BIGINT) AS ss FROM cells),
    z AS (SELECT c.event_type, c.hr, c.n, c.s,
                 cast(floor(abs(
                   (c.s::DOUBLE / c.n::DOUBLE - t.ss::DOUBLE / t.nn::DOUBLE)
                   / sqrt((t.ss::DOUBLE / t.nn::DOUBLE)
                          * (1.0 - t.ss::DOUBLE / t.nn::DOUBLE)
                          / c.n::DOUBLE)) * 1000) AS BIGINT) AS az_milli
          FROM cells c CROSS JOIN tot t),
    rk AS (SELECT a.event_type, a.hr, a.n, a.s, a.az_milli,
                  cast(1 + count(b.event_type) AS BIGINT) AS rk
           FROM z a LEFT JOIN z b
             ON b.az_milli > a.az_milli
             OR (b.az_milli = a.az_milli
                 AND (b.event_type < a.event_type
                      OR (b.event_type = a.event_type AND b.hr < a.hr)))
           GROUP BY a.event_type, a.hr, a.n, a.s, a.az_milli),
    thr(k, thr_milli) AS (VALUES {thr_values}),
    flag AS (SELECT rk.*, (rk.az_milli >= thr.thr_milli) AS crossed
             FROM rk JOIN thr ON rk.rk = thr.k),
    kstar AS (SELECT coalesce(max(CASE WHEN crossed THEN rk END), 0)
                AS ks FROM flag)
    SELECT f.event_type, f.hr, f.n, f.s, f.az_milli, f.rk,
           (f.rk <= k.ks) AS rejected
    FROM flag f CROSS JOIN kstar k
    """


@query(
    "q347_bh_fdr",
    _BH_FDR_ORACLE(),
    doc="Benjamini-Hochberg FDR control over a DESIGNED hypothesis "
    "grid (5 funnel stages x 24 hours = m fixed at 120): which "
    "(event_type, hour) cells' high-value rates differ from the "
    "pooled rate, with false-discovery control — the multiple-"
    "comparison gate any metrics platform needs before alerting on "
    "per-cell anomalies (at alpha=.05, ~6 of 120 null cells would "
    "'fire' uncorrected). BH runs on the z-SCALE: p_(k) <= k*alpha/m "
    "iff |z|_(k) >= Phi^-1(1 - k*alpha/2m), so the thresholds are a "
    "120-literal spine computed at BUILD time (stdlib AS241) and no "
    "runtime erf/exp libm call exists to diverge between engines — "
    "z itself uses only IEEE-correctly-rounded ops (+,-,*,/,sqrt) on "
    "exact counts, so az_milli is bit-identical. Rank is a self-join "
    "count over the m-row cell frame (metadata by DESIGN — the "
    "corpus-scale work is the one (type, hour) aggregate; no window, "
    "no sort). The step-up cutoff k* is a 1-row max broadcast back.",
)
def q347_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = (
        ev.filter(
            F.col("event_type").isin(
                "click", "view", "signup", "purchase", "error"
            )
        )
        .groupBy("event_type", F.hour("ts").cast("int").alias("hr"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum((F.col("value") >= 50.0).cast("int"))
            .cast("bigint")
            .alias("s"),
        )
    )
    tot = cells.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("s").cast("bigint").alias("ss"),
    )
    z = cells.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "hr",
        "n",
        "s",
        F.expr(
            "cast(floor(abs("
            " (cast(s as double) / cast(n as double)"
            "  - cast(ss as double) / cast(nn as double))"
            " / sqrt((cast(ss as double) / cast(nn as double))"
            "        * (1.0 - cast(ss as double) / cast(nn as double))"
            "        / cast(n as double))) * 1000) as bigint)"
        ).alias("az_milli"),
    )
    zb = z.select(
        F.col("event_type").alias("et2"),
        F.col("hr").alias("hr2"),
        F.col("az_milli").alias("az2"),
    )
    rk = (
        z.join(
            F.broadcast(zb),
            (F.col("az2") > F.col("az_milli"))
            | (
                (F.col("az2") == F.col("az_milli"))
                & (
                    (F.col("et2") < F.col("event_type"))
                    | (
                        (F.col("et2") == F.col("event_type"))
                        & (F.col("hr2") < F.col("hr"))
                    )
                )
            ),
            "left",
        )
        .groupBy("event_type", "hr", "n", "s", "az_milli")
        .agg((F.lit(1) + F.count("et2")).cast("bigint").alias("rk"))
    )
    thr = spark.createDataFrame(_bh_thresholds(), "k long, thr_milli long")
    flag = rk.join(F.broadcast(thr), rk["rk"] == thr["k"]).select(
        "event_type", "hr", "n", "s", "az_milli", "rk",
        (F.col("az_milli") >= F.col("thr_milli")).alias("crossed"),
    )
    kstar = flag.agg(
        F.coalesce(
            F.max(F.when(F.col("crossed"), F.col("rk"))), F.lit(0)
        ).alias("ks")
    )
    return flag.crossJoin(F.broadcast(kstar)).select(
        "event_type", "hr", "n", "s", "az_milli", "rk",
        (F.col("rk") <= F.col("ks")).alias("rejected"),
    )


@query(
    "q349_stratified_ate",
    """
    WITH u AS (
      SELECT user_id,
             cast(count(*) AS BIGINT) AS n_ev,
             cast(CASE WHEN sum(CASE WHEN event_type = 'error'
                                THEN 1 ELSE 0 END) * 5 > count(*)
                  THEN 1 ELSE 0 END AS INT) AS treated,
             cast(sum(CASE WHEN event_type = 'purchase'
                      THEN cast(floor(value * 100 + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS out_cents
      FROM events GROUP BY user_id),
    tot AS (SELECT cast(count(*) AS BIGINT) AS n_users,
                   cast(sum(n_ev) AS BIGINT) AS t_ev FROM u),
    su AS (SELECT least(u.n_ev * 4 * tot.n_users // tot.t_ev, 7) AS stratum,
                  u.treated, u.out_cents
           FROM u CROSS JOIN tot),
    g AS (SELECT stratum,
                 cast(count(*) AS BIGINT) AS n_users,
                 cast(sum(treated) AS BIGINT) AS n_treated,
                 cast(count(*) - sum(treated) AS BIGINT) AS n_control,
                 cast(sum(CASE WHEN treated = 1 THEN out_cents ELSE 0 END)
                      AS BIGINT) AS st,
                 cast(sum(CASE WHEN treated = 0 THEN out_cents ELSE 0 END)
                      AS BIGINT) AS sc
          FROM su GROUP BY stratum),
    d AS (SELECT g.*,
                 CASE WHEN n_treated > 0 AND n_control > 0
                      THEN cast(st * 1000000 // n_treated
                                - sc * 1000000 // n_control AS BIGINT)
                 END AS diff_micro
          FROM g),
    a AS (SELECT cast(sum(n_users) AS BIGINT) AS nv,
                 cast(sum(n_users * diff_micro) AS BIGINT) AS wsum
          FROM d WHERE diff_micro IS NOT NULL)
    SELECT cast(stratum AS INT) AS stratum, n_users, n_treated, n_control,
           diff_micro
    FROM d
    UNION ALL
    SELECT -1 AS stratum, a.nv AS n_users,
           cast((SELECT sum(n_treated) FROM d WHERE diff_micro IS NOT NULL)
                AS BIGINT) AS n_treated,
           cast((SELECT sum(n_control) FROM d WHERE diff_micro IS NOT NULL)
                AS BIGINT) AS n_control,
           cast(cast(sign(a.wsum) AS BIGINT) * (abs(a.wsum) // a.nv)
                AS BIGINT) AS diff_micro
    FROM a
    """,
    doc="Stratified average-treatment-effect estimate (IPW with "
    "discrete propensity): users with a high error share (>20% of "
    "their events) vs not, outcome = purchase spend, stratified by "
    "relative activity level "
    "— the observational-data debiasing step (naive treated-vs-"
    "control comparison confounds exposure with activity; within-"
    "stratum differences weighted by stratum mass remove the "
    "measured confounder, and stratifying on a DISCRETE propensity "
    "is exactly IPW with propensity = within-stratum treatment "
    "rate). Strata are integer bands of activity RELATIVE to the "
    "mean (4*n_ev*U div T, capped at 7) so the banding needs no "
    "corpus-scale quantile sort and is scale-free across SFs. All "
    "moments are exact integer cents; per-stratum means go to "
    "micro-cents by *1e6 floor division (safe to ~9e9 user-cents "
    "per stratum; pre-divide beyond); strata violating positivity "
    "(no treated or no control) surface as NULL and are EXCLUDED "
    "from the overlap-population total (the -1 row), whose one "
    "signed division is sign-split (sign * abs-div) so no negative "
    "quantity ever meets integer division — engines disagree there "
    "(Python // floors; DuckDB // and Spark div truncate toward "
    "zero). Two shuffles total: "
    "user rollup, stratum rollup; everything after is a "
    "metadata-sized frame.",
)
def q349_stratified_ate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.when(
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            )
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.expr("cast(floor(value * 100 + 0.5) as bigint)"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("out_cents"),
    )
    tot = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users_t"),
        F.sum("n_ev").cast("bigint").alias("t_ev"),
    )
    su = u.crossJoin(F.broadcast(tot)).select(
        F.expr("least(n_ev * 4 * n_users_t div t_ev, 7)").alias("stratum"),
        "treated",
        "out_cents",
    )
    g = su.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("treated").cast("bigint").alias("n_treated"),
        (F.count(F.lit(1)) - F.sum("treated"))
        .cast("bigint")
        .alias("n_control"),
        F.sum(F.when(F.col("treated") == 1, F.col("out_cents")).otherwise(0))
        .cast("bigint")
        .alias("st"),
        F.sum(F.when(F.col("treated") == 0, F.col("out_cents")).otherwise(0))
        .cast("bigint")
        .alias("sc"),
    )
    d = g.select(
        "stratum",
        "n_users",
        "n_treated",
        "n_control",
        F.expr(
            "case when n_treated > 0 and n_control > 0"
            " then cast(st * 1000000 div n_treated"
            "      - sc * 1000000 div n_control as bigint) end"
        ).alias("diff_micro"),
    )
    valid = d.filter(F.col("diff_micro").isNotNull())
    a = valid.agg(
        F.sum("n_users").cast("bigint").alias("nv"),
        F.sum(F.col("n_users") * F.col("diff_micro"))
        .cast("bigint")
        .alias("wsum"),
        F.sum("n_treated").cast("bigint").alias("tt"),
        F.sum("n_control").cast("bigint").alias("tc"),
    )
    per = d.select(
        F.col("stratum").cast("int").alias("stratum"),
        "n_users",
        "n_treated",
        "n_control",
        "diff_micro",
    )
    total = a.select(
        F.lit(-1).cast("int").alias("stratum"),
        F.col("nv").alias("n_users"),
        F.col("tt").alias("n_treated"),
        F.col("tc").alias("n_control"),
        F.expr(
            "cast(cast(sign(wsum) as bigint) * (abs(wsum) div nv) as bigint)"
        ).alias("diff_micro"),
    )
    return per.unionAll(total)


@query(
    "q351_isotonic_calibration",
    """
    WITH lab AS (SELECT least(n_chars // 30, 19) AS bin,
                        CASE WHEN contains(text, ' the ') THEN 1 ELSE 0 END
                          AS y
                 FROM documents),
    bins AS (SELECT bin, cast(count(*) AS BIGINT) AS c,
                    cast(sum(y) AS BIGINT) AS s
             FROM lab GROUP BY bin),
    spans AS (SELECT lo.bin AS lo, hi.bin AS hi,
                     cast(sum(m.s) AS BIGINT) AS ss,
                     cast(sum(m.c) AS BIGINT) AS sc
              FROM bins lo JOIN bins hi ON lo.bin <= hi.bin
              JOIN bins m ON m.bin BETWEEN lo.bin AND hi.bin
              GROUP BY lo.bin, hi.bin),
    mn AS (SELECT lo, cast(min(ss * 1000000 // sc) AS BIGINT) AS mn_ppm
           FROM spans GROUP BY lo),
    iso AS (SELECT b.bin, cast(max(mn.mn_ppm) AS BIGINT) AS iso_ppm
            FROM bins b JOIN mn ON mn.lo <= b.bin
            GROUP BY b.bin)
    SELECT cast(b.bin AS INT) AS bin, b.c AS n, b.s AS n_pos,
           cast(b.s * 1000000 // b.c AS BIGINT) AS rate_ppm,
           iso.iso_ppm
    FROM bins b JOIN iso ON b.bin = iso.bin
    """,
    doc="Isotonic calibration (PAV fit) of a document-quality score "
    "against a binary label, over B<=20 score bins: the reliability "
    "curve plus its monotone regression — what you run before "
    "trusting any model score as a probability (rate inversions "
    "across bins = miscalibration; the isotonic fit is the minimal "
    "monotone correction). PAV's sequential pooling is spelled as "
    "the CLOSED-FORM max-min identity iso(b) = max_{i<=b} min_{j>=i} "
    "mean(y over bins i..j), which is pure relational algebra: span "
    "sums from a bins x bins x bins triple join (<= 20^2 spans, "
    "metadata — the corpus-scale work is the single (bin) aggregate "
    "up front), then a min per lo and a max per bin. Span means are "
    "quantized to ppm by exact floor division BEFORE pooling, so "
    "min/max compare integers (no rational cross-multiplication, "
    "whose s*c products would overflow int64 at corpus counts) — "
    "the <=1 ppm pre-quantization bias is deterministic and "
    "mirrored. Output is per-bin: observed rate vs isotonic rate, "
    "monotone by construction.",
)
def q351_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    lab = docs.select(
        F.expr("least(n_chars div 30, 19)").alias("bin"),
        F.expr(
            "case when contains(text, ' the ') then 1 else 0 end"
        ).alias("y"),
    )
    bins = lab.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("y").cast("bigint").alias("s"),
    )
    lo = bins.select(F.col("bin").alias("lo"))
    hi = bins.select(F.col("bin").alias("hi"))
    m = bins.select(
        F.col("bin").alias("mb"), F.col("s").alias("ms"), F.col("c").alias("mc")
    )
    spans = (
        lo.join(F.broadcast(hi), F.col("lo") <= F.col("hi"))
        .join(
            F.broadcast(m),
            (F.col("mb") >= F.col("lo")) & (F.col("mb") <= F.col("hi")),
        )
        .groupBy("lo", "hi")
        .agg(
            F.sum("ms").cast("bigint").alias("ss"),
            F.sum("mc").cast("bigint").alias("sc"),
        )
    )
    mn = spans.groupBy("lo").agg(
        F.min(F.expr("ss * 1000000 div sc")).cast("bigint").alias("mn_ppm")
    )
    iso = (
        bins.select("bin")
        .join(F.broadcast(mn), F.col("lo") <= F.col("bin"))
        .groupBy("bin")
        .agg(F.max("mn_ppm").cast("bigint").alias("iso_ppm"))
    )
    return (
        bins.join(F.broadcast(iso), "bin")
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.col("c").alias("n"),
            F.col("s").alias("n_pos"),
            F.expr("cast(s * 1000000 div c as bigint)").alias("rate_ppm"),
            "iso_ppm",
        )
    )


def _ucb_ln_micro() -> list[int]:
    """floor(ln(t_prev) * 1e6) for decision rounds 6..10 (t_prev =
    total pulls so far = 5..9). Build-time literals shared by the Spark
    replay and the oracle so no runtime ln call can diverge."""
    import math as _math

    return [int(_math.floor(_math.log(t) * 1e6)) for t in range(5, 10)]


def _Q348_ORACLE() -> str:
    ln = _ucb_ln_micro()
    ctes, logs, prev = [], [], "s5"
    for i, t in enumerate(range(6, 11)):
        lt = ln[i]
        ctes.append(
            f"""u{t} AS (SELECT arm, pulls, sum_ppm,
              cast(sum_ppm // pulls
                   + cast(floor(sqrt((((2 * {lt}::BIGINT) * 1000000)
                                      // pulls)::DOUBLE)) AS BIGINT)
                   AS BIGINT) AS ucb
         FROM {prev})"""
        )
        ctes.append(
            f"""c{t} AS (SELECT arm AS pick, ucb FROM u{t}
         ORDER BY ucb DESC, arm LIMIT 1)"""
        )
        ctes.append(
            f"""s{t} AS (SELECT u.arm,
              u.pulls + CASE WHEN u.arm = c.pick THEN 1 ELSE 0 END AS pulls,
              u.sum_ppm + CASE WHEN u.arm = c.pick
                          THEN coalesce(r.reward_ppm, 0)
                          ELSE 0 END AS sum_ppm
         FROM u{t} u CROSS JOIN c{t} c
         LEFT JOIN rew r ON r.arm = u.arm AND r.d = {t})"""
        )
        logs.append(f"SELECT {t} AS t, pick, ucb FROM c{t}")
        prev = f"s{t}"
    cte_sql = ",\n    ".join(ctes)
    log_sql = " UNION ALL ".join(logs)
    return f"""
    WITH rew AS (SELECT event_type AS arm,
                        cast(extract(day FROM ts) AS INT) AS d,
                        cast(sum((value >= 50.0)::INT) * 1000000
                             // count(*) AS BIGINT) AS reward_ppm
                 FROM events WHERE extract(day FROM ts) <= 10
                 GROUP BY 1, 2),
    arms AS (SELECT arm, cast(row_number() OVER (ORDER BY arm) AS INT) AS ai
             FROM (SELECT DISTINCT arm FROM rew)),
    s5 AS (SELECT a.arm, cast(1 AS BIGINT) AS pulls,
                  cast(coalesce(r.reward_ppm, 0) AS BIGINT) AS sum_ppm
           FROM arms a LEFT JOIN rew r ON r.arm = a.arm AND r.d = a.ai),
    {cte_sql},
    lg AS ({log_sql})
    SELECT cast(l.t AS INT) AS t, l.pick AS arm,
           cast(l.ucb AS BIGINT) AS ucb_ppm,
           cast(coalesce(r.reward_ppm, 0) AS BIGINT) AS reward_ppm
    FROM lg l LEFT JOIN rew r ON r.arm = l.pick AND r.d = l.t
    """


@query(
    "q348_ucb_replay",
    _Q348_ORACLE(),
    doc="UCB1 bandit offline replay over the funnel arms: 5 forced "
    "initialization pulls (arm k observes its day-k high-value rate) "
    "then 5 UCB decisions over days 6-10, each picking "
    "argmax(mean_ppm + floor(sqrt(2*ln(t)*1e12 / pulls))) — the "
    "standard logged-feedback evaluation of an allocation policy "
    "before it serves live traffic. The CORPUS-scale stage is the "
    "one (arm, day) reward aggregate, fully distributed; the replay "
    "itself operates on that |arms| x 10 decision grid — metadata "
    "BY DESIGN (an experiment has bounded arms and rounds), pinned "
    "to the driver like layout.py's bounded collects and replayed "
    "with pure-integer arithmetic. ln(t) enters as BUILD-time "
    "literal micro-nats (no runtime libm); the sqrt argument is an "
    "exact int <= 4.4e12 (exactly representable in a double, "
    "correctly-rounded sqrt -> bit-identical), so every UCB score "
    "and argmax tie-break (ucb desc, arm asc) is deterministic. The "
    "oracle unrolls all 5 decision rounds as chained CTEs (the "
    "k-means discipline) — sequential state is replayed, not "
    "approximated.",
)
def q348_ucb_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math as _math

    ev = _t(spark, sf_dir, "events")
    rew_df = (
        ev.filter(F.dayofmonth("ts") <= 10)
        .groupBy(
            F.col("event_type").alias("arm"),
            F.dayofmonth("ts").cast("int").alias("d"),
        )
        .agg(
            F.expr(
                "cast(sum(cast(value >= 50.0 as int)) * 1000000"
                " div count(*) as bigint)"
            ).alias("reward_ppm")
        )
    )
    # bounded driver pin: |arms| x 10 rows by experiment design
    rows = rew_df.collect()
    rew = {(r["arm"], r["d"]): int(r["reward_ppm"]) for r in rows}
    arms = sorted({a for a, _ in rew})
    state = {a: [1, rew.get((a, i + 1), 0)] for i, a in enumerate(arms)}
    log = []
    for i, t in enumerate(range(6, 11)):
        lt = _ucb_ln_micro()[i]
        ucbs = {
            a: state[a][1] // state[a][0]
            + int(_math.floor(_math.sqrt(((2 * lt) * 1000000) // state[a][0])))
            for a in arms
        }
        pick = min(arms, key=lambda a: (-ucbs[a], a))
        r = rew.get((pick, t), 0)
        state[pick][0] += 1
        state[pick][1] += r
        log.append((t, pick, ucbs[pick], r))
    return spark.createDataFrame(
        log, "t int, arm string, ucb_ppm long, reward_ppm long"
    )


def _sprt_consts() -> dict[str, int]:
    """SPRT literals in micro-nats, H0: p=0.30 vs H1: p=0.36,
    alpha=beta=0.05. Build-time floor(ln(.)*1e6); shared by both
    spellings so no runtime ln call exists."""
    import math as _math

    return {
        "l1": int(_math.floor(_math.log(0.36 / 0.30) * 1e6)),
        "l0": int(_math.floor(_math.log(0.64 / 0.70) * 1e6)),
        "a": int(_math.floor(_math.log(0.95 / 0.05) * 1e6)),
        "b": int(_math.floor(_math.log(0.05 / 0.95) * 1e6)),
    }


def _Q350_ORACLE() -> str:
    c = _sprt_consts()
    return f"""
    WITH h AS (SELECT event_type,
                      cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(count(*) AS BIGINT) AS n,
                      cast(sum((value >= 50.0)::INT) AS BIGINT) AS s
               FROM events GROUP BY 1, 2),
    cum AS (SELECT event_type, hr,
                   cast(sum(s) OVER w AS BIGINT) AS cs,
                   cast(sum(n) OVER w AS BIGINT) AS cn
            FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
    x AS (SELECT event_type, hr, cn,
                 cast(cs * {c["l1"]} + (cn - cs) * ({c["l0"]})
                      AS BIGINT) AS llr_micro
          FROM cum),
    hits AS (SELECT *, CASE WHEN llr_micro >= {c["a"]} THEN 'accept_h1'
                            WHEN llr_micro <= {c["b"]} THEN 'accept_h0'
                       END AS hit
             FROM x),
    f AS (SELECT event_type, min(hr) AS dhr FROM hits
          WHERE hit IS NOT NULL GROUP BY event_type),
    fin AS (SELECT event_type, max(hr) AS lhr FROM hits GROUP BY event_type),
    pick AS (SELECT h.event_type, h.hit AS decision, h.hr AS decision_hr,
                    h.cn AS n_obs, h.llr_micro
             FROM hits h JOIN f ON h.event_type = f.event_type
                                AND h.hr = f.dhr),
    cont AS (SELECT h.event_type, 'continue' AS decision,
                    h.hr AS decision_hr, h.cn AS n_obs, h.llr_micro
             FROM hits h JOIN fin ON h.event_type = fin.event_type
                                  AND h.hr = fin.lhr
             WHERE h.event_type NOT IN (SELECT event_type FROM f))
    SELECT * FROM pick UNION ALL SELECT * FROM cont
    """


@query(
    "q350_sprt_monitor",
    _Q350_ORACLE(),
    doc="Wald SPRT sequential monitor per funnel stage: cumulative "
    "log-likelihood ratio of the hourly high-value success counts "
    "under H1 (p=.36) vs H0 (p=.30), alpha=beta=.05 — the always-"
    "valid sequential test that lets an experiment STOP the moment "
    "evidence suffices instead of waiting for a fixed horizon "
    "(peeking at a fixed-horizon z-test inflates false positives; "
    "SPRT's boundaries are peek-proof by construction). The LLR is "
    "PURE INTEGER: llr_micro = cs*L1 + (cn-cs)*L0 with L1/L0/A/B as "
    "build-time micro-nat literals (floor(ln(.)*1e6) — no runtime "
    "libm), so crossings are exact comparisons, bit-stable at any "
    "partitioning. The cumulative sum is one window per event_type "
    "ordered by hour — series-bounded history (<=720 rows/key at "
    "bench scale; hours, not events), the q338 discipline. Decision "
    "row = first boundary crossing (min-hr join back), else the "
    "final hour as 'continue'; headroom cs*L1 <= 9e18 at ~5e13 "
    "successes per stage, pre-aggregate beyond.",
)
def q350_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _sprt_consts()
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("value") >= 50.0).cast("int"))
        .cast("bigint")
        .alias("s"),
    )
    w = W.partitionBy("event_type").orderBy("hr")
    cum = h.select(
        "event_type",
        "hr",
        F.sum("s").over(w).cast("bigint").alias("cs"),
        F.sum("n").over(w).cast("bigint").alias("cn"),
    )
    hits = cum.select(
        "event_type",
        "hr",
        "cn",
        F.expr(
            f"cast(cs * {c['l1']} + (cn - cs) * ({c['l0']}) as bigint)"
        ).alias("llr_micro"),
    ).withColumn(
        "hit",
        F.expr(
            f"case when llr_micro >= {c['a']} then 'accept_h1'"
            f" when llr_micro <= {c['b']} then 'accept_h0' end"
        ),
    )
    f = (
        hits.filter(F.col("hit").isNotNull())
        .groupBy(F.col("event_type").alias("et_f"))
        .agg(F.min("hr").alias("dhr"))
    )
    fin = hits.groupBy(F.col("event_type").alias("et_l")).agg(
        F.max("hr").alias("lhr")
    )
    pick = hits.join(
        F.broadcast(f),
        (hits["event_type"] == f["et_f"]) & (hits["hr"] == f["dhr"]),
    ).select(
        "event_type",
        F.col("hit").alias("decision"),
        F.col("hr").alias("decision_hr"),
        F.col("cn").alias("n_obs"),
        "llr_micro",
    )
    cont = (
        hits.join(
            F.broadcast(fin),
            (hits["event_type"] == fin["et_l"]) & (hits["hr"] == fin["lhr"]),
        )
        .join(
            F.broadcast(f.select("et_f")),
            hits["event_type"] == F.col("et_f"),
            "left_anti",
        )
        .select(
            "event_type",
            F.lit("continue").alias("decision"),
            F.col("hr").alias("decision_hr"),
            F.col("cn").alias("n_obs"),
            "llr_micro",
        )
    )
    return pick.unionAll(cont)


@query(
    "q352_rrf_fusion",
    r"""
    WITH lex AS (
      SELECT doc_id,
             cast(len(list_filter(
               string_split_regex(lower(trim(text)), '\s+'),
               x -> x IN ('join', 'scan', 'filter'))) AS BIGINT) AS lscore
      FROM documents),
    ltop AS (SELECT doc_id, lscore FROM lex
             ORDER BY lscore DESC, doc_id LIMIT 100),
    lrk AS (SELECT doc_id,
                   cast(row_number() OVER (ORDER BY lscore DESC, doc_id)
                        AS BIGINT) AS lr
            FROM ltop),
    qv AS (SELECT embedding FROM embeddings
           ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 1),
    sem AS (SELECT e.vec_id AS doc_id,
                   cast(list_sum(list_transform(range(1, 65), i ->
                     cast(floor(cast(e.embedding[i] AS DOUBLE) * 10000)
                          AS BIGINT)
                     * cast(floor(cast(q.embedding[i] AS DOUBLE) * 10000)
                            AS BIGINT))) AS BIGINT) AS sscore
            FROM embeddings e CROSS JOIN qv q),
    stop_ AS (SELECT doc_id, sscore FROM sem
              ORDER BY sscore DESC, doc_id LIMIT 100),
    srk AS (SELECT doc_id,
                   cast(row_number() OVER (ORDER BY sscore DESC, doc_id)
                        AS BIGINT) AS sr
            FROM stop_),
    fused AS (SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
                     cast(coalesce(1000000 // (60 + l.lr), 0)
                          + coalesce(1000000 // (60 + s.sr), 0)
                          AS BIGINT) AS rrf_micro,
                     l.lr AS lex_rank, s.sr AS sem_rank
              FROM lrk l FULL OUTER JOIN srk s ON l.doc_id = s.doc_id)
    SELECT cast(doc_id AS BIGINT) AS doc_id, rrf_micro, lex_rank, sem_rank
    FROM fused ORDER BY rrf_micro DESC, doc_id LIMIT 10
    """,
    doc="Reciprocal-rank-fusion hybrid retrieval: fuse a lexical "
    "ranking (term hits for the probe {join, scan, filter}) with a "
    "semantic ranking (exact integer dot against a deterministic "
    "md5-rank probe vector) via RRF(d) = sum 1/(60 + rank_list(d)) — "
    "the standard score-free fusion for BM25 + dense retrieval "
    "(ranks, not scores, so no calibration between incomparable "
    "scales is needed). Scale shape: each list is cut to its top-100 "
    "by TakeOrderedAndProject (distributed per-partition heaps — a "
    "document outside both top-100s cannot reach the fused top-10 "
    "given the 1/(60+r) tail), ranks are a window over the "
    "LIMIT-BOUNDED 100-row frame (metadata by construction), and "
    "the fusion is a full outer join of two 100-row frames. "
    "RRF contributions are exact 1e6-scaled integer reciprocals, "
    "so fused ordering is bit-stable with doc_id tiebreak.",
)
def q352_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = docs.select(
        "doc_id",
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" x -> x in ('join', 'scan', 'filter'))) as bigint)"
        ).alias("lscore"),
    )
    ltop = lex.orderBy(F.col("lscore").desc(), "doc_id").limit(100)
    lrk = ltop.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("lscore").desc(), "doc_id"))
        .cast("bigint")
        .alias("lr"),
    )
    qv = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.col("embedding").alias("qe"))
    )
    dot = " + ".join(
        f"cast(floor(cast(element_at(embedding, {i}) as double) * 10000)"
        f" as bigint) * cast(floor(cast(element_at(qe, {i}) as double)"
        f" * 10000) as bigint)"
        for i in range(1, 65)
    )
    sem = emb.crossJoin(F.broadcast(qv)).select(
        F.col("vec_id").alias("doc_id"),
        F.expr(f"cast({dot} as bigint)").alias("sscore"),
    )
    stop_ = sem.orderBy(F.col("sscore").desc(), "doc_id").limit(100)
    srk = stop_.select(
        F.col("doc_id").alias("sdoc"),
        F.row_number()
        .over(W.orderBy(F.col("sscore").desc(), "doc_id"))
        .cast("bigint")
        .alias("sr"),
    )
    fused = lrk.join(
        srk, lrk["doc_id"] == srk["sdoc"], "full_outer"
    ).select(
        F.coalesce(F.col("doc_id"), F.col("sdoc"))
        .cast("bigint")
        .alias("doc_id"),
        (
            F.coalesce(F.expr("1000000 div (60 + lr)"), F.lit(0))
            + F.coalesce(F.expr("1000000 div (60 + sr)"), F.lit(0))
        )
        .cast("bigint")
        .alias("rrf_micro"),
        F.col("lr").alias("lex_rank"),
        F.col("sr").alias("sem_rank"),
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(10)


def _Q353_ORACLE(k: int = 4, n_cand: int = 16) -> str:
    steps = []
    logs = ["SELECT 1 AS step, cid, gain FROM p1"]
    sel = ["SELECT cid FROM p1"]
    for t in range(2, k + 1):
        prev_b = f"b{t - 1}"
        excl = " UNION ALL ".join(sel)
        steps.append(
            f"""g{t} AS (SELECT sims.cid,
               cast(sum(greatest(sims.s - {prev_b}.b, 0)) AS BIGINT) AS gain
          FROM sims JOIN {prev_b} ON sims.i = {prev_b}.i
          WHERE sims.cid NOT IN ({excl})
          GROUP BY sims.cid),
    p{t} AS (SELECT cid, gain FROM g{t} ORDER BY gain DESC, cid LIMIT 1),
    b{t} AS (SELECT {prev_b}.i, greatest({prev_b}.b, s2.s) AS b
             FROM {prev_b} JOIN sims s2 ON s2.i = {prev_b}.i
             JOIN p{t} ON s2.cid = p{t}.cid)"""
        )
        logs.append(f"SELECT {t} AS step, cid, gain FROM p{t}")
        sel.append(f"SELECT cid FROM p{t}")
    step_sql = ",\n    ".join(steps)
    log_sql = " UNION ALL ".join(logs)
    return f"""
    WITH c AS (SELECT vec_id,
                      list_transform(range(1, 65), i ->
                        cast(floor(cast(embedding[i] AS DOUBLE) * 10000)
                             AS BIGINT)) AS ea
               FROM embeddings),
    cand AS (SELECT vec_id AS cid, ea AS cea FROM c
             ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT {n_cand}),
    sims AS (SELECT c.vec_id AS i, cand.cid,
                    greatest(cast(list_sum(list_transform(range(1, 65),
                      kk -> c.ea[kk] * cand.cea[kk])) AS BIGINT),
                      cast(0 AS BIGINT)) AS s
             FROM c CROSS JOIN cand),
    g1 AS (SELECT cid, cast(sum(s) AS BIGINT) AS gain
           FROM sims GROUP BY cid),
    p1 AS (SELECT cid, gain FROM g1 ORDER BY gain DESC, cid LIMIT 1),
    b1 AS (SELECT sims.i, sims.s AS b FROM sims
           JOIN p1 ON sims.cid = p1.cid),
    {step_sql}
    SELECT cast(step AS INT) AS step, cast(cid AS BIGINT) AS cid, gain
    FROM ({log_sql})
    """


@query(
    "q353_facility_location",
    _Q353_ORACLE(),
    doc="Greedy facility-location coreset selection: pick 4 "
    "representatives from a fixed 16-candidate panel (md5-rank — "
    "constant broadcast at any corpus size, the q311 regime) "
    "maximizing total corpus coverage sum_i max_{c in S} sim+(i,c) "
    "— the submodular data-selection objective behind coreset / "
    "diverse-exemplar pipelines (greedy is (1-1/e)-optimal). Each "
    "greedy step is a CORPUS-scale marginal-gain aggregate "
    "sum_i max(s - b_i, 0) over the N x 16 sims frame (computed "
    "once, checkpointed; the running best-coverage b_i is a "
    "corpus-length column updated by a broadcast-key join per "
    "step — never collected). Dots are exact floor(1e4) integers "
    "clipped at 0 for monotonicity; argmax tie-breaks on candidate "
    "id; the oracle unrolls all 4 greedy steps as chained CTEs. "
    "Headroom: coverage sums reach ~6.4e9 per doc-candidate pair; "
    "int64-safe to ~1.4e9 docs, pre-scale beyond.",
)
def q353_facility_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(slice(embedding, 1, 64), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint))"
            ).alias("ea"),
        ),
        "vec_id",
    ).localCheckpoint(eager=False)
    cand = (
        c.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), F.col("ea").alias("cea"))
    )
    dot = " + ".join(
        f"element_at(ea, {i}) * element_at(cea, {i})" for i in range(1, 65)
    )
    sims = (
        c.crossJoin(F.broadcast(cand))
        .select(
            F.col("vec_id").alias("i"),
            "cid",
            F.expr(
                f"greatest(cast({dot} as bigint), cast(0 as bigint))"
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    # step 1: plain coverage argmax over the 16-row gains frame
    g = sims.groupBy("cid").agg(F.sum("s").cast("bigint").alias("gain"))
    top = g.orderBy(F.col("gain").desc(), "cid").limit(1).collect()[0]
    picked = [(1, int(top["cid"]), int(top["gain"]))]
    b = sims.filter(F.col("cid") == top["cid"]).select(
        "i", F.col("s").alias("b")
    )
    for t in range(2, 5):
        chosen = [p[1] for p in picked]
        g = (
            sims.filter(~F.col("cid").isin(chosen))
            .join(b, "i")
            .groupBy("cid")
            .agg(
                F.sum(F.expr("greatest(s - b, 0)"))
                .cast("bigint")
                .alias("gain")
            )
        )
        # 1-row bounded collect per step (<= n_cand rows aggregated)
        top = g.orderBy(F.col("gain").desc(), "cid").limit(1).collect()[0]
        picked.append((t, int(top["cid"]), int(top["gain"])))
        nb = sims.filter(F.col("cid") == top["cid"]).select(
            "i", F.col("s").alias("ns")
        )
        b = (
            b.join(nb, "i")
            .select("i", F.expr("greatest(b, ns)").alias("b"))
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(picked, "step int, cid long, gain long")


@query(
    "q354_hill_tail_index",
    """
    WITH x AS (SELECT cast(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS v,
                      l_orderkey, l_linenumber
               FROM lineitem),
    top AS (SELECT v FROM x
            ORDER BY v DESC, l_orderkey, l_linenumber LIMIT 101),
    ref AS (SELECT cast(min(v) AS BIGINT) AS xk FROM top),
    logs AS (SELECT cast(floor(ln(t.v::DOUBLE / r.xk::DOUBLE) * 1000000)
                         AS BIGINT) AS lg
             FROM top t CROSS JOIN ref r
             WHERE t.v > r.xk)
    SELECT cast(count(*) AS BIGINT) AS k_used,
           (SELECT xk FROM ref) AS x_ref_cents,
           cast(sum(lg) // count(*) AS BIGINT) AS hill_micro,
           cast(1000000000000 // (sum(lg) // count(*)) AS BIGINT)
             AS alpha_micro
    FROM logs
    """,
    doc="Hill tail-index estimate of the price distribution: "
    "hill = mean ln(x_(i)/x_(k+1)) over the k=100 largest values, "
    "alpha = 1/hill — the heavy-tail exponent that decides whether "
    "means/variances of a skewed column even exist (alpha <= 2: "
    "infinite variance — pooled-variance tests and plain averages "
    "are lies) and how aggressively skew salting must be "
    "provisioned. The ONLY corpus-scale work is one "
    "TakeOrderedAndProject top-101 (per-partition heaps; a total "
    "order via the key tiebreak makes the selected SET "
    "deterministic under ties); everything after runs on the "
    "101-row frame. Logs are integer micro-nats floor(ln(v/ref)"
    "*1e6) — the q297 NLL discipline (ln is the one libm call; "
    "floor-quantization makes any cross-engine ulp divergence a "
    "measure-zero boundary event). Ties equal to the reference "
    "value are excluded (v > xk), the standard Hill treatment.",
)
def q354_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    x = li.select(
        F.expr(
            "cast(floor(l_extendedprice * 100 + 0.5) as bigint)"
        ).alias("v"),
        "l_orderkey",
        "l_linenumber",
    )
    top = x.orderBy(
        F.col("v").desc(), "l_orderkey", "l_linenumber"
    ).limit(101)
    ref = top.agg(F.min("v").cast("bigint").alias("xk"))
    logs = (
        top.crossJoin(F.broadcast(ref))
        .filter(F.col("v") > F.col("xk"))
        .select(
            F.expr(
                "cast(floor(ln(cast(v as double) / cast(xk as double))"
                " * 1000000) as bigint)"
            ).alias("lg"),
            "xk",
        )
    )
    return logs.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_used"),
        F.max("xk").cast("bigint").alias("x_ref_cents"),
        F.expr("cast(sum(lg) div count(*) as bigint)").alias("hill_micro"),
        F.expr(
            "cast(1000000000000 div (sum(lg) div count(*)) as bigint)"
        ).alias("alpha_micro"),
    )


@query(
    "q357_vif_audit",
    r"""
    WITH f AS (SELECT cast(n_chars AS BIGINT) AS x1,
                      cast(len(list_filter(
                        string_split_regex(lower(trim(text)), '\s+'),
                        t -> t <> '')) AS BIGINT) AS x2,
                      cast(len(list_filter(
                        string_split_regex(lower(trim(text)), '\s+'),
                        t -> t IN ('the', 'a', 'and', 'of', 'to')))
                        AS BIGINT) AS x3
               FROM documents),
    m AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(x1) AS BIGINT) AS s1,
                 cast(sum(x2) AS BIGINT) AS s2,
                 cast(sum(x3) AS BIGINT) AS s3,
                 cast(sum(x1 * x1) AS BIGINT) AS s11,
                 cast(sum(x2 * x2) AS BIGINT) AS s22,
                 cast(sum(x3 * x3) AS BIGINT) AS s33,
                 cast(sum(x1 * x2) AS BIGINT) AS s12,
                 cast(sum(x1 * x3) AS BIGINT) AS s13,
                 cast(sum(x2 * x3) AS BIGINT) AS s23
          FROM f),
    c AS (SELECT n,
                 s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
                 s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22,
                 s33::DOUBLE - s3::DOUBLE * s3::DOUBLE / n::DOUBLE AS c33,
                 s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12,
                 s13::DOUBLE - s1::DOUBLE * s3::DOUBLE / n::DOUBLE AS c13,
                 s23::DOUBLE - s2::DOUBLE * s3::DOUBLE / n::DOUBLE AS c23
          FROM m),
    r AS (SELECT 'n_chars' AS feature,
                 ((c12 * c33 - c13 * c23) * c12
                  + (c13 * c22 - c12 * c23) * c13)
                 / ((c22 * c33 - c23 * c23) * c11) AS r2
          FROM c
          UNION ALL
          SELECT 'n_tokens' AS feature,
                 ((c12 * c33 - c23 * c13) * c12
                  + (c23 * c11 - c12 * c13) * c23)
                 / ((c11 * c33 - c13 * c13) * c22) AS r2
          FROM c
          UNION ALL
          SELECT 'n_stopwords' AS feature,
                 ((c13 * c22 - c23 * c12) * c13
                  + (c23 * c11 - c13 * c12) * c23)
                 / ((c11 * c22 - c12 * c12) * c33) AS r2
          FROM c)
    SELECT feature, round(r2, 6) AS r2,
           round(1.0 / (1.0 - r2), 6) AS vif
    FROM r
    """,
    doc="Variance-inflation-factor multicollinearity audit over three "
    "document features (chars, tokens, stopword hits): VIF_j = "
    "1/(1 - R2_j) from regressing each feature on the other two — "
    "the pre-flight before any regression-based quality model "
    "(VIF > 10: the coefficient is noise; chars and tokens are "
    "near-collinear by construction, which this SHOWS). One "
    "map-side-combinable aggregate collects the full exact integer "
    "moment matrix (sums, squares, cross-products — 10 numbers for "
    "p=3); R2 comes from the closed-form 2x2 normal-equation solve "
    "on centered covariances. Every downstream op is +,-,*,/ on "
    "doubles cast from exact int64 moments — IEEE-correctly-rounded "
    "and bit-identical across engines with the mirrored expression "
    "tree; no libm call anywhere. Moment headroom: x*x sums cap "
    "~3e5 per doc, int64-safe to ~3e13 docs.",
)
def q357_vif_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        F.col("n_chars").cast("bigint").alias("x1"),
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" t -> t <> '')) as bigint)"
        ).alias("x2"),
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" t -> t in ('the', 'a', 'and', 'of', 'to'))) as bigint)"
        ).alias("x3"),
    )
    m = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum("x3").cast("bigint").alias("s3"),
        F.sum(F.expr("x1 * x1")).cast("bigint").alias("s11"),
        F.sum(F.expr("x2 * x2")).cast("bigint").alias("s22"),
        F.sum(F.expr("x3 * x3")).cast("bigint").alias("s33"),
        F.sum(F.expr("x1 * x2")).cast("bigint").alias("s12"),
        F.sum(F.expr("x1 * x3")).cast("bigint").alias("s13"),
        F.sum(F.expr("x2 * x3")).cast("bigint").alias("s23"),
    )
    c = m.select(
        *[
            F.expr(
                f"cast(s{i}{j} as double) - cast(s{i} as double)"
                f" * cast(s{j} as double) / cast(n as double)"
            ).alias(f"c{i}{j}")
            for i, j in [(1, 1), (2, 2), (3, 3), (1, 2), (1, 3), (2, 3)]
        ]
    )
    r = c.selectExpr(
        "stack(3,"
        " 'n_chars',"
        " ((c12 * c33 - c13 * c23) * c12 + (c13 * c22 - c12 * c23) * c13)"
        "  / ((c22 * c33 - c23 * c23) * c11),"
        " 'n_tokens',"
        " ((c12 * c33 - c23 * c13) * c12 + (c23 * c11 - c12 * c13) * c23)"
        "  / ((c11 * c33 - c13 * c13) * c22),"
        " 'n_stopwords',"
        " ((c13 * c22 - c23 * c12) * c13 + (c23 * c11 - c13 * c12) * c23)"
        "  / ((c11 * c22 - c12 * c12) * c33)"
        ") as (feature, r2)"
    )
    return r.select(
        "feature",
        F.round("r2", 6).alias("r2"),
        F.round(F.expr("1.0 / (1.0 - r2)"), 6).alias("vif"),
    )


@query(
    "q356_dirichlet_ql",
    r"""
    WITH toks AS (SELECT doc_id, t
                  FROM (SELECT doc_id,
                               unnest(string_split_regex(
                                 lower(trim(text)), '\s+')) AS t
                        FROM documents)
                  WHERE t <> ''),
    coll AS (SELECT cast(count(*) AS BIGINT) AS ctot,
                    cast(sum(CASE WHEN t = 'join' THEN 1 ELSE 0 END)
                         AS BIGINT) AS cf1,
                    cast(sum(CASE WHEN t = 'scan' THEN 1 ELSE 0 END)
                         AS BIGINT) AS cf2,
                    cast(sum(CASE WHEN t = 'filter' THEN 1 ELSE 0 END)
                         AS BIGINT) AS cf3
             FROM toks),
    d AS (SELECT doc_id, cast(count(*) AS BIGINT) AS dl,
                 cast(sum(CASE WHEN t = 'join' THEN 1 ELSE 0 END)
                      AS BIGINT) AS tf1,
                 cast(sum(CASE WHEN t = 'scan' THEN 1 ELSE 0 END)
                      AS BIGINT) AS tf2,
                 cast(sum(CASE WHEN t = 'filter' THEN 1 ELSE 0 END)
                      AS BIGINT) AS tf3
          FROM toks GROUP BY doc_id),
    sc AS (SELECT d.doc_id,
                  cast(floor(ln((d.tf1::DOUBLE
                         + 2000.0 * c.cf1::DOUBLE / c.ctot::DOUBLE)
                        / (d.dl::DOUBLE + 2000.0)) * 1000000) AS BIGINT)
                  + cast(floor(ln((d.tf2::DOUBLE
                         + 2000.0 * c.cf2::DOUBLE / c.ctot::DOUBLE)
                        / (d.dl::DOUBLE + 2000.0)) * 1000000) AS BIGINT)
                  + cast(floor(ln((d.tf3::DOUBLE
                         + 2000.0 * c.cf3::DOUBLE / c.ctot::DOUBLE)
                        / (d.dl::DOUBLE + 2000.0)) * 1000000) AS BIGINT)
                    AS score_micro
           FROM d CROSS JOIN coll c)
    SELECT doc_id, cast(score_micro AS BIGINT) AS score_micro
    FROM sc ORDER BY score_micro DESC, doc_id LIMIT 10
    """,
    doc="Dirichlet-smoothed query-likelihood retrieval (Zhai-Lafferty "
    "LM scoring, mu=2000): score(d) = sum_q ln((tf + mu*p(q|C)) / "
    "(dl + mu)) for the probe {join, scan, filter} — the language-"
    "model ranking family that complements BM25 (q62's family): "
    "smoothing gives every document a nonzero likelihood, so "
    "documents missing a query term are penalized by the COLLECTION "
    "prior rather than zeroed. Plan: one token explode feeds both "
    "the 1-row collection stats (broadcast) and the per-doc "
    "(dl, tf) aggregate — one shuffle on doc_id; scoring is "
    "map-side; top-10 is TakeOrderedAndProject. Per-term log-"
    "likelihoods are integer micro-nats (floor(ln(.)*1e6), the q297 "
    "discipline — ln is the only libm call, and floor quantization "
    "pushes cross-engine ulp divergence to measure-zero "
    "boundaries); ordering ties break on doc_id.",
)
def q356_dirichlet_ql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    docs = _t(spark, sf_dir, "documents")
    toks = spread(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(trim(text)), '\\s+'), t -> t <> '')")
        ).alias("t"),
    )
    coll = toks.agg(
        F.count(F.lit(1)).cast("bigint").alias("ctot"),
        F.sum(F.expr("case when t = 'join' then 1 else 0 end"))
        .cast("bigint")
        .alias("cf1"),
        F.sum(F.expr("case when t = 'scan' then 1 else 0 end"))
        .cast("bigint")
        .alias("cf2"),
        F.sum(F.expr("case when t = 'filter' then 1 else 0 end"))
        .cast("bigint")
        .alias("cf3"),
    )
    d = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl"),
        F.sum(F.expr("case when t = 'join' then 1 else 0 end"))
        .cast("bigint")
        .alias("tf1"),
        F.sum(F.expr("case when t = 'scan' then 1 else 0 end"))
        .cast("bigint")
        .alias("tf2"),
        F.sum(F.expr("case when t = 'filter' then 1 else 0 end"))
        .cast("bigint")
        .alias("tf3"),
    )
    term = (
        "cast(floor(ln((cast(tf{i} as double)"
        " + 2000.0 * cast(cf{i} as double) / cast(ctot as double))"
        " / (cast(dl as double) + 2000.0)) * 1000000) as bigint)"
    )
    sc = d.crossJoin(F.broadcast(coll)).select(
        "doc_id",
        F.expr(
            " + ".join(term.format(i=i) for i in (1, 2, 3))
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    return sc.orderBy(F.col("score_micro").desc(), "doc_id").limit(10)


def _Q355_ORACLE(k: int = 4, n_cand: int = 20) -> str:
    logs = ["SELECT 1 AS step, cid, 7 * rel AS mmr FROM p1"]
    sel = ["SELECT cid FROM p1"]
    steps = []
    for t in range(2, k + 1):
        excl = " UNION ALL ".join(sel)
        steps.append(
            f"""m{t} AS (SELECT r.cid, r.rel,
                cast(max(s.d) AS BIGINT) AS msim
          FROM rel r JOIN sims s ON s.a = r.cid
          WHERE r.cid NOT IN ({excl})
            AND s.b IN ({excl})
          GROUP BY r.cid, r.rel),
    p{t} AS (SELECT cid, 7 * rel - 3 * msim AS mmr FROM m{t}
             ORDER BY 7 * rel - 3 * msim DESC, cid LIMIT 1)"""
        )
        logs.append(f"SELECT {t} AS step, cid, mmr FROM p{t}")
        sel.append(f"SELECT cid FROM p{t}")
    step_sql = ",\n    ".join(steps)
    log_sql = " UNION ALL ".join(logs)
    return f"""
    WITH c AS (SELECT vec_id,
                      list_transform(range(1, 65), i ->
                        cast(floor(cast(embedding[i] AS DOUBLE) * 10000)
                             AS BIGINT)) AS ea
               FROM embeddings),
    qv AS (SELECT ea AS qea FROM c
           ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 1),
    rel AS (SELECT c.vec_id AS cid,
                   cast(list_sum(list_transform(range(1, 65),
                        kk -> c.ea[kk] * q.qea[kk])) AS BIGINT) AS rel,
                   c.ea
            FROM c CROSS JOIN qv q
            ORDER BY rel DESC, cid LIMIT {n_cand}),
    sims AS (SELECT x.cid AS a, y.cid AS b,
                    cast(list_sum(list_transform(range(1, 65),
                         kk -> x.ea[kk] * y.ea[kk])) AS BIGINT) AS d
             FROM rel x JOIN rel y ON x.cid <> y.cid),
    p1 AS (SELECT cid, rel FROM rel ORDER BY rel DESC, cid LIMIT 1),
    {step_sql}
    SELECT cast(step AS INT) AS step, cast(cid AS BIGINT) AS cid,
           cast(mmr AS BIGINT) AS mmr_q
    FROM ({log_sql})
    """


@query(
    "q355_mmr_rerank",
    _Q355_ORACLE(),
    doc="Maximal-marginal-relevance rerank: from the semantic top-20 "
    "for the md5-rank probe, greedily select 4 results maximizing "
    "0.7*relevance - 0.3*max-similarity-to-already-selected — the "
    "diversity rerank that keeps a retrieval page (or a RAG context "
    "window) from filling with near-duplicates of one hit. "
    "Complements q353: facility location covers a CORPUS, MMR "
    "diversifies a RESULT LIST. The corpus-scale work is the "
    "probe-dot scan + one TakeOrdered top-20; the greedy runs on "
    "the 20-candidate frame and its 20x20 sim matrix — metadata BY "
    "DESIGN (a result page is bounded), pinned to the driver like "
    "q348 and replayed with pure-integer arithmetic (rel and sim "
    "share the floor(1e4)^2 dot scale, so 7*rel - 3*msim is exact "
    "int64 with cid tiebreak). The oracle unrolls the greedy steps "
    "as chained CTEs over the same bounded frames.",
)
def q355_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(slice(embedding, 1, 64), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint))"
            ).alias("ea"),
        ),
        "vec_id",
    )
    qv = (
        c.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(1)
        .select(F.col("ea").alias("qea"))
    )
    dot_q = " + ".join(
        f"element_at(ea, {i}) * element_at(qea, {i})" for i in range(1, 65)
    )
    rel = (
        c.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("cid"),
            F.expr(f"cast({dot_q} as bigint)").alias("rel"),
            "ea",
        )
        .orderBy(F.col("rel").desc(), "cid")
        .limit(20)
    )
    # bounded driver pin: 20 candidates + their 20x20 sim matrix
    cand = rel.collect()
    rels = {int(r["cid"]): int(r["rel"]) for r in cand}
    eas = {int(r["cid"]): list(r["ea"]) for r in cand}
    sims = {
        (a, b): sum(x * y for x, y in zip(eas[a], eas[b]))
        for a in eas
        for b in eas
        if a != b
    }
    first = min(rels, key=lambda i: (-rels[i], i))
    picked = [(1, first, 7 * rels[first])]
    sel = {first}
    for t in range(2, 5):
        best = None
        for i in rels:
            if i in sel:
                continue
            msim = max(sims[(i, j)] for j in sel)
            mmr = 7 * rels[i] - 3 * msim
            key = (-mmr, i)
            if best is None or key < best[0]:
                best = (key, i, mmr)
        picked.append((t, best[1], best[2]))
        sel.add(best[1])
    return spark.createDataFrame(picked, "step int, cid long, mmr_q long")


@query(
    "q358_ratio_delta_method",
    """
    WITH u AS (SELECT event_type, user_id,
                      cast(sum(cast(floor(value * 100 + 0.5) AS BIGINT))
                           AS BIGINT) AS x,
                      cast(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
    m AS (SELECT event_type,
                 cast(count(*) AS BIGINT) AS n,
                 cast(sum(x) AS BIGINT) AS sx,
                 cast(sum(y) AS BIGINT) AS sy,
                 cast(sum(x * x) AS BIGINT) AS sxx,
                 cast(sum(y * y) AS BIGINT) AS syy,
                 cast(sum(x * y) AS BIGINT) AS sxy
          FROM u GROUP BY event_type),
    d AS (SELECT event_type, n,
                 sx::DOUBLE / sy::DOUBLE AS r,
                 (sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0) AS vxx,
                 (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0) AS vyy,
                 (sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
                   / (n::DOUBLE - 1.0) AS vxy,
                 sy::DOUBLE / n::DOUBLE AS ybar
          FROM m),
    s AS (SELECT event_type, n, r,
                 sqrt((vxx - 2.0 * r * vxy + r * r * vyy) / n::DOUBLE)
                   / ybar AS se
          FROM d)
    SELECT event_type, n AS n_users,
           round(r, 6) AS ratio_cents,
           round(se, 6) AS se_cents,
           round(r - 1.96 * se, 6) AS ci_lo,
           round(r + 1.96 * se, 6) AS ci_hi
    FROM s
    """,
    doc="Delta-method standard error for a RATIO metric (spend per "
    "event) when the randomization unit is the USER, per funnel "
    "stage: var(X/Y) ~ (vxx - 2R vxy + R^2 vyy) / (n ybar^2) — the "
    "correction every A/B platform needs because ratio metrics over "
    "clustered units violate the i.i.d. assumption behind a naive "
    "per-event SE (users contribute correlated numerator and "
    "denominator; treating events as independent understates the SE, "
    "typically 2-5x). One user-level rollup then one map-side "
    "moment aggregate per stage (n, sums, squares, cross-product — "
    "all exact int64; x*x caps ~1e11/user, safe to ~9e7 users per "
    "stage, pre-scale cents beyond); the delta formula is pure "
    "+,-,*,/,sqrt on doubles cast from those exact ints — IEEE "
    "correctly-rounded, bit-identical with the mirrored tree, "
    "no libm. 95%% CI via the 1.96 literal, rounded 6dp.",
)
def q358_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)"))
        .cast("bigint")
        .alias("x"),
        F.count(F.lit(1)).cast("bigint").alias("y"),
    )
    m = u.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    d = m.select(
        "event_type",
        "n",
        F.expr("cast(sx as double) / cast(sy as double)").alias("r"),
        F.expr(
            "(cast(sxx as double) - cast(sx as double) * cast(sx as double)"
            " / cast(n as double)) / (cast(n as double) - 1.0)"
        ).alias("vxx"),
        F.expr(
            "(cast(syy as double) - cast(sy as double) * cast(sy as double)"
            " / cast(n as double)) / (cast(n as double) - 1.0)"
        ).alias("vyy"),
        F.expr(
            "(cast(sxy as double) - cast(sx as double) * cast(sy as double)"
            " / cast(n as double)) / (cast(n as double) - 1.0)"
        ).alias("vxy"),
        F.expr("cast(sy as double) / cast(n as double)").alias("ybar"),
    )
    s = d.select(
        "event_type",
        "n",
        "r",
        F.expr(
            "sqrt((vxx - 2.0 * r * vxy + r * r * vyy)"
            " / cast(n as double)) / ybar"
        ).alias("se"),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_users"),
        F.round("r", 6).alias("ratio_cents"),
        F.round("se", 6).alias("se_cents"),
        F.round(F.expr("r - 1.96 * se"), 6).alias("ci_lo"),
        F.round(F.expr("r + 1.96 * se"), 6).alias("ci_hi"),
    )


@query(
    "q359_winsorized_mean",
    """
    WITH bb AS (SELECT o_orderpriority AS grp,
                       cast(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS v
                FROM orders),
    cnts AS (SELECT grp, v, cast(count(*) AS BIGINT) AS cnt
             FROM bb GROUP BY grp, v),
    tot AS (SELECT grp, cast(sum(cnt) AS BIGINT) AS n FROM cnts
            GROUP BY grp),
    cum AS (SELECT c.grp, c.v,
                   sum(c.cnt) OVER (PARTITION BY c.grp ORDER BY c.v) AS cm,
                   t.n
            FROM cnts c JOIN tot t USING (grp)),
    qs AS (SELECT grp,
                  cast(min(CASE WHEN cm >= (n + 19) // 20 THEN v END)
                       AS BIGINT) AS lo,
                  cast(min(CASE WHEN cm >= (n * 19 + 19) // 20 THEN v END)
                       AS BIGINT) AS hi
           FROM cum GROUP BY grp),
    w AS (SELECT bb.grp, least(greatest(bb.v, qs.lo), qs.hi) AS wv
          FROM bb JOIN qs USING (grp))
    SELECT grp AS o_orderpriority,
           cast(count(*) AS BIGINT) AS n,
           cast(min(wv) AS BIGINT) AS lo_cents,
           cast(max(wv) AS BIGINT) AS hi_cents,
           cast(sum(wv) // count(*) AS BIGINT) AS winsor_mean_cents
    FROM w GROUP BY grp
    """,
    doc="Exact 5%%-per-tail winsorized mean of order value per "
    "priority class: clamp (don't drop — q202 trims, this "
    "winsorizes) every value to the exact discrete p05/p95 per "
    "group, then an exact integer mean — the robust location "
    "estimate that keeps whale orders from dominating a mean while "
    "still counting them once at the fence. The p05/p95 fences come "
    "from operators/stats.py grouped_quantiles (bucketed grouped "
    "prefix-sum CDF, rank ceil(n*p) by one conditional min per "
    "quantile — no per-group sort, no corpus window; the oracle "
    "spells the same rank arithmetic over a cumulative window, "
    "oracle-scale only); fences broadcast back onto the fact scan "
    "and the clamp + sum is map-side. All cents-integer exact: "
    "ties, fences, and the floor-div mean are bit-stable at any "
    "partitioning.",
)
def q359_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import grouped_quantiles

    o = _t(spark, sf_dir, "orders")
    bb = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias("v"),
    )
    qs = grouped_quantiles(
        bb, F.col("grp"), F.col("v"), [("lo", 1, 20), ("hi", 19, 20)]
    ).select("grp", "lo", "hi")
    w = bb.join(F.broadcast(qs), "grp").select(
        "grp", F.expr("least(greatest(v, lo), hi)").alias("wv")
    )
    return w.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("wv").cast("bigint").alias("lo_cents"),
        F.max("wv").cast("bigint").alias("hi_cents"),
        F.expr("cast(sum(wv) div count(*) as bigint)").alias(
            "winsor_mean_cents"
        ),
    ).withColumnRenamed("grp", "o_orderpriority")


@query(
    "q360_distinct_n_diversity",
    r"""
    WITH t AS (SELECT source,
                      list_filter(string_split_regex(lower(trim(text)),
                                                     '\s+'),
                                  x -> x <> '') AS s
               FROM documents),
    g1 AS (SELECT source, unnest(s) AS g FROM t),
    g2 AS (SELECT source, unnest(list_transform(range(1, len(s)),
                    i -> s[i] || ' ' || s[i + 1])) AS g
           FROM t WHERE len(s) >= 2),
    g3 AS (SELECT source, unnest(list_transform(range(1, len(s) - 1),
                    i -> s[i] || ' ' || s[i + 1] || ' ' || s[i + 2])) AS g
           FROM t WHERE len(s) >= 3),
    a AS (SELECT source, 1 AS n, cast(count(*) AS BIGINT) AS total,
                 cast(count(DISTINCT g) AS BIGINT) AS uniq
          FROM g1 GROUP BY source
          UNION ALL
          SELECT source, 2 AS n, cast(count(*) AS BIGINT) AS total,
                 cast(count(DISTINCT g) AS BIGINT) AS uniq
          FROM g2 GROUP BY source
          UNION ALL
          SELECT source, 3 AS n, cast(count(*) AS BIGINT) AS total,
                 cast(count(DISTINCT g) AS BIGINT) AS uniq
          FROM g3 GROUP BY source)
    SELECT source, cast(n AS INT) AS n, total, uniq,
           cast(uniq * 1000000 // total AS BIGINT) AS distinct_ppm
    FROM a
    """,
    doc="Distinct-n diversity census per source: unique/total ratios "
    "of 1/2/3-grams — the standard lexical-diversity metric family "
    "(Li et al. 2016 distinct-n, public knowledge) that flags "
    "mode-collapsed or template-heavy corpus slices BEFORE they "
    "skew a training mix (a source whose distinct-2 is 10x lower "
    "than peers is boilerplate). N-grams are built map-side from "
    "the token array (no self-join; the q288 explode discipline), "
    "then per-(source, n) count + count(DISTINCT gram) — Spark "
    "plans the distinct as the two-level expand+partial agg, "
    "map-side-combinable, keyed on source so the shuffle is "
    "gram-volume but perfectly partitionable. Ratios are exact "
    "ppm floor divisions.",
)
def q360_distinct_n_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    docs = _t(spark, sf_dir, "documents")
    t = spread(docs.select("source", "text"), "source").select(
        "source",
        F.expr(
            r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')"
        ).alias("s"),
    )
    def grams(n: int):
        if n == 1:
            ex = F.explode("s")
            base = t
        else:
            parts = " || ' ' || ".join(
                f"element_at(s, i + {j})" for j in range(n)
            )
            base = t.filter(F.expr(f"size(s) >= {n}"))
            ex = F.explode(
                F.expr(f"transform(sequence(1, size(s) - {n - 1}), i -> {parts})")
            )
        return (
            base.select("source", ex.alias("g"))
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("total"),
                F.countDistinct("g").cast("bigint").alias("uniq"),
            )
            .select("source", F.lit(n).cast("int").alias("n"), "total", "uniq")
        )

    a = grams(1).unionAll(grams(2)).unionAll(grams(3))
    return a.select(
        "source",
        "n",
        "total",
        "uniq",
        F.expr("cast(uniq * 1000000 div total as bigint)").alias(
            "distinct_ppm"
        ),
    )


@query(
    "q361_stupid_backoff",
    r"""
    WITH probe(i, w) AS (VALUES (1, 'join'), (2, 'scan'), (3, 'filter'),
                                (4, 'merge'), (5, 'hash'), (6, 'table')),
    tr AS (SELECT a.i, a.w AS w1, b.w AS w2 FROM probe a
           JOIN probe b ON b.i = a.i + 1),
    t AS (SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             x -> x <> '') AS s
          FROM documents),
    uni AS (SELECT g AS w, cast(count(*) AS BIGINT) AS c
            FROM (SELECT unnest(s) AS g FROM t) GROUP BY g),
    tot AS (SELECT cast(sum(c) AS BIGINT) AS tt FROM uni),
    bi AS (SELECT g1 AS w1, g2 AS w2, cast(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(list_transform(range(1, len(s)),
                          i -> s[i])) AS g1,
                        unnest(list_transform(range(1, len(s)),
                          i -> s[i + 1])) AS g2
                 FROM t WHERE len(s) >= 2)
           GROUP BY g1, g2),
    sc AS (SELECT tr.i, tr.w1, tr.w2,
                  (bi.c IS NOT NULL) AS backed_off_false,
                  CASE WHEN bi.c IS NOT NULL
                       THEN cast(floor(ln(bi.c::DOUBLE / u1.c::DOUBLE)
                                       * 1000000) AS BIGINT)
                       ELSE cast(floor(ln(0.4 * u2.c::DOUBLE / tot.tt::DOUBLE)
                                       * 1000000) AS BIGINT)
                  END AS score_micro
           FROM tr
           LEFT JOIN uni u1 ON u1.w = tr.w1
           LEFT JOIN uni u2 ON u2.w = tr.w2
           LEFT JOIN bi ON bi.w1 = tr.w1 AND bi.w2 = tr.w2
           CROSS JOIN tot)
    SELECT cast(i AS INT) AS i, w1, w2,
           NOT backed_off_false AS backed_off, score_micro
    FROM sc
    """,
    doc="Stupid-backoff bigram LM scoring (Brants et al. 2007, the "
    "web-scale LM smoothing that skips normalization entirely) of a "
    "fixed probe sequence: s(w2|w1) = c(w1 w2)/c(w1) when the bigram "
    "exists, else 0.4 * c(w2)/T — the cheap corpus-LM likelihood "
    "used to filter gibberish at trillion-token scale where "
    "Kneser-Ney's (q247) discount bookkeeping is too expensive. "
    "Corpus work: one unigram and one bigram aggregate (bigrams "
    "from parallel offset arrays, map-side, q288 discipline); the "
    "probe transitions are a literal 5-row frame that left-joins "
    "the count tables (broadcast probes onto count shuffles at "
    "scale — only probe-matching groups survive the join pushdown). "
    "Scores are integer micro-nats (floor(ln(.)*1e6), q297 "
    "discipline); backed_off flags which transitions fell to the "
    "unigram path.",
)
def q361_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    docs = _t(spark, sf_dir, "documents")
    words = ["join", "scan", "filter", "merge", "hash", "table"]
    probe = spark.createDataFrame(
        list(enumerate(words, start=1)), "i int, w string"
    )
    tr = probe.alias("a").join(
        probe.alias("b"), F.expr("b.i = a.i + 1")
    ).select(
        F.col("a.i").alias("i"),
        F.col("a.w").alias("w1"),
        F.col("b.w").alias("w2"),
    )
    t = spread(docs.select("doc_id", "text"), "doc_id").select(
        F.expr(
            r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')"
        ).alias("s")
    )
    uni = (
        t.select(F.explode("s").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("tt"))
    bi = (
        t.filter(F.expr("size(s) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(element_at(s, i) as w1,"
                    " element_at(s, i + 1) as w2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    u1 = uni.select(F.col("w").alias("u1w"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("u2w"), F.col("c").alias("c2"))
    b2 = bi.select(
        F.col("w1").alias("bw1"), F.col("w2").alias("bw2"),
        F.col("c").alias("cb"),
    )
    sc = (
        tr.join(u1, F.col("w1") == F.col("u1w"), "left")
        .join(u2, F.col("w2") == F.col("u2w"), "left")
        .join(
            b2,
            (F.col("w1") == F.col("bw1")) & (F.col("w2") == F.col("bw2")),
            "left",
        )
        .crossJoin(F.broadcast(tot))
    )
    return sc.select(
        "i",
        "w1",
        "w2",
        F.col("cb").isNull().alias("backed_off"),
        F.expr(
            "case when cb is not null"
            " then cast(floor(ln(cast(cb as double) / cast(c1 as double))"
            "      * 1000000) as bigint)"
            " else cast(floor(ln(0.4 * cast(c2 as double)"
            "      / cast(tt as double)) * 1000000) as bigint) end"
        ).alias("score_micro"),
    )


def _viterbi_params() -> dict[str, int | str]:
    """2-state HMM (0 = engaged, 1 = churning) parameters as micro-nat
    literals: floor(ln(p) * 1e6) at BUILD time — the Viterbi DP then
    runs on pure int64 adds/maxes with ZERO runtime libm."""
    import math as _math

    def f(p: float) -> int:
        return int(_math.floor(_math.log(p) * 1e6))

    e0 = {"purchase": f(0.3), "click": f(0.3), "view": f(0.3),
          "error": f(0.05), "signup": f(0.05)}
    e1 = {"purchase": f(0.05), "click": f(0.15), "view": f(0.2),
          "error": f(0.5), "signup": f(0.1)}

    def case(tbl: dict[str, int]) -> str:
        whens = " ".join(
            f"WHEN event_type = '{k}' THEN cast({v} AS BIGINT)"
            for k, v in list(tbl.items())[:-1]
        )
        last = list(tbl.values())[-1]
        return f"CASE {whens} ELSE cast({last} AS BIGINT) END"

    return {
        "t00": f(0.9), "t01": f(0.1), "t10": f(0.2), "t11": f(0.8),
        "e0_case": case(e0), "e1_case": case(e1),
    }


def _Q362_ORACLE() -> str:
    # NOTE: duckdb 1.0.0's list_reduce mis-folds lists longer than a
    # few elements (verified: 74-element integer fold returns a wrong
    # value), so the oracle replays the DP with a RECURSIVE CTE —
    # one row per (user, step), oracle-scale only.
    p = _viterbi_params()
    return f"""
    WITH RECURSIVE ob AS (SELECT user_id,
                       cast(epoch_us(ts) AS BIGINT) AS tsu, event_id,
                       {p["e0_case"]} AS e0,
                       {p["e1_case"]} AS e1
                FROM events),
    seq AS (SELECT user_id,
                   list_transform(
                     list_sort(list(struct_pack(tsu := tsu,
                                                event_id := event_id,
                                                e0 := e0, e1 := e1))),
                     x -> struct_pack(e0 := x.e0, e1 := x.e1)) AS ev
            FROM ob GROUP BY user_id),
    r AS (SELECT user_id, 1 AS t, len(ev) AS n,
                 ev[1].e0 AS v0, ev[1].e1 AS v1
          FROM seq
          UNION ALL
          SELECT r.user_id, r.t + 1, r.n,
                 greatest(r.v0 + {p["t00"]}, r.v1 + {p["t10"]})
                   + s.ev[r.t + 1].e0,
                 greatest(r.v0 + {p["t01"]}, r.v1 + {p["t11"]})
                   + s.ev[r.t + 1].e1
          FROM r JOIN seq s ON s.user_id = r.user_id
          WHERE r.t < r.n)
    SELECT cast(CASE WHEN v0 >= v1 THEN 0 ELSE 1 END AS INT)
             AS final_state,
           cast(count(*) AS BIGINT) AS n_users,
           cast(sum(greatest(v0, v1)) AS BIGINT) AS sum_score_micro
    FROM r WHERE t = n GROUP BY 1
    """


@query(
    "q362_viterbi_decode",
    _Q362_ORACLE(),
    doc="Viterbi decoding of a 2-state HMM (engaged / churning) over "
    "every user's event sequence — the max-product DP behind "
    "session-intent tagging, PII-span tagging, and any sequence "
    "labeling a log pipeline runs (q39's state machine is a "
    "threshold automaton; this is true joint-likelihood decoding). "
    "The DP is a per-user FOLD over the time-ordered event array: "
    "v_t(s) = max_s'(v_(t-1)(s') + T[s',s]) + E[s, o_t], spelled as "
    "aggregate()/list_reduce() with a 2-field struct accumulator — "
    "runs INSIDE the groupBy task, no window, no per-step shuffle, "
    "and since transitions/emissions are build-time micro-nat "
    "literals the whole decode is int64 add/max: exact, zero "
    "runtime libm, bit-stable at any partitioning. Per-user arrays "
    "are history-bounded (the q84 packing discipline; ~70 events "
    "at bench scale — segment sequences for multi-million-event "
    "keys). Output: final-state census with summed path scores "
    "(ties decode to state 0).",
)
def q362_viterbi_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _viterbi_params()
    ev = _t(spark, sf_dir, "events")
    # sort key is epoch MICROS (bigint) in both engines: DuckDB's view
    # keeps nanosecond timestamps, so sorting raw ts there would order
    # same-microsecond events by the nanos Spark never sees
    ob = ev.select(
        "user_id",
        F.unix_micros("ts").alias("tsu"),
        "event_id",
        F.expr(str(p["e0_case"])).alias("e0"),
        F.expr(str(p["e1_case"])).alias("e1"),
    )
    seq = ob.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list("
            "struct(tsu, event_id, e0, e1))),"
            " x -> named_struct('e0', x.e0, 'e1', x.e1))"
        ).alias("ev")
    )
    dp = seq.select(
        "user_id",
        F.expr(
            f"aggregate(slice(ev, 2, size(ev) - 1), element_at(ev, 1),"
            f" (acc, x) -> named_struct("
            f"'e0', greatest(acc.e0 + {p['t00']}, acc.e1 + {p['t10']})"
            f" + x.e0,"
            f"'e1', greatest(acc.e0 + {p['t01']}, acc.e1 + {p['t11']})"
            f" + x.e1))"
        ).alias("v"),
    )
    return dp.groupBy(
        F.expr("cast(case when v.e0 >= v.e1 then 0 else 1 end as int)").alias(
            "final_state"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.expr("greatest(v.e0, v.e1)"))
        .cast("bigint")
        .alias("sum_score_micro"),
    )


@query(
    "q363_vocab_richness",
    r"""
    WITH tc AS (SELECT g, cast(count(*) AS BIGINT) AS c
                FROM (SELECT unnest(list_filter(string_split_regex(
                               lower(trim(text)), '\s+'), x -> x <> '')) AS g
                      FROM documents)
                GROUP BY g),
    ff AS (SELECT cast(count(*) AS BIGINT) AS v,
                  cast(sum(c) AS BIGINT) AS t,
                  cast(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                    AS f1,
                  cast(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                    AS f2
           FROM tc)
    SELECT v AS vocab_seen, t AS total_tokens, f1 AS singletons,
           f2 AS doubletons,
           cast(v + CASE WHEN f2 > 0 THEN f1 * f1 // (2 * f2)
                         ELSE f1 * (f1 - 1) // 2 END AS BIGINT)
             AS chao1_est,
           cast(f1 * 1000000 // t AS BIGINT) AS gt_unseen_ppm
    FROM ff
    """,
    doc="Vocabulary richness + unseen mass: Chao1 lower-bound "
    "estimate of TRUE vocabulary size (V + f1^2/2f2 from singleton/"
    "doubleton counts, bias-corrected form when f2=0) and the "
    "Good-Turing unseen-probability mass P(new word) = f1/T — the "
    "pair that sizes tokenizer vocabularies and predicts OOV rates "
    "BEFORE committing to a vocab (Heaps' law q187 fits growth; "
    "this estimates the asymptote). One term-count aggregate then a "
    "1-row frequency-of-frequencies reduction — the f1/f2 tallies "
    "are map-side-combinable conditional sums over the count table, "
    "no second shuffle. All exact integer: Chao1's square stays "
    "inside int64 to f1 ~ 3e9 singletons, ppm floor division "
    "per the house convention.",
)
def q363_vocab_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    docs = _t(spark, sf_dir, "documents")
    tc = (
        spread(docs.select("doc_id", "text"), "doc_id")
        .select(
            F.explode(
                F.expr(
                    r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')"
                )
            ).alias("g")
        )
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    ff = tc.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("c").cast("bigint").alias("t"),
        F.sum(F.expr("case when c = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.expr("case when c = 2 then 1 else 0 end"))
        .cast("bigint")
        .alias("f2"),
    )
    return ff.select(
        F.col("v").alias("vocab_seen"),
        F.col("t").alias("total_tokens"),
        F.col("f1").alias("singletons"),
        F.col("f2").alias("doubletons"),
        F.expr(
            "cast(v + case when f2 > 0 then f1 * f1 div (2 * f2)"
            " else f1 * (f1 - 1) div 2 end as bigint)"
        ).alias("chao1_est"),
        F.expr("cast(f1 * 1000000 div t as bigint)").alias("gt_unseen_ppm"),
    )


@query(
    "q364_mantel_haenszel",
    """
    WITH u AS (SELECT user_id,
                      cast(count(*) AS BIGINT) AS n_ev,
                      cast(CASE WHEN sum(CASE WHEN event_type = 'error'
                                        THEN 1 ELSE 0 END) * 5 > count(*)
                           THEN 1 ELSE 0 END AS INT) AS x,
                      cast(CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                             AND value >= 50.0
                                        THEN 1 ELSE 0 END) > 0
                           THEN 1 ELSE 0 END AS INT) AS y
               FROM events GROUP BY user_id),
    tot AS (SELECT cast(count(*) AS BIGINT) AS nu,
                   cast(sum(n_ev) AS BIGINT) AS te FROM u),
    s AS (SELECT least(u.n_ev * 4 * tot.nu // tot.te, 7) AS stratum,
                 u.x, u.y
          FROM u CROSS JOIN tot),
    g AS (SELECT stratum,
                 cast(sum(CASE WHEN x = 1 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS a,
                 cast(sum(CASE WHEN x = 1 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS b,
                 cast(sum(CASE WHEN x = 0 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS c,
                 cast(sum(CASE WHEN x = 0 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS d
          FROM s GROUP BY stratum),
    mh AS (SELECT cast(sum(a * d * 1000000 // (a + b + c + d)) AS BIGINT)
                    AS num_micro,
                  cast(sum(b * c * 1000000 // (a + b + c + d)) AS BIGINT)
                    AS den_micro
           FROM g WHERE b * c > 0 OR a * d > 0)
    SELECT cast(g.stratum AS INT) AS stratum, g.a, g.b, g.c, g.d,
           CASE WHEN g.b * g.c > 0
                THEN cast(g.a * g.d * 1000000 // (g.b * g.c) AS BIGINT)
           END AS or_micro
    FROM g
    UNION ALL
    SELECT -1 AS stratum, mh.num_micro AS a, mh.den_micro AS b,
           cast(0 AS BIGINT) AS c, cast(0 AS BIGINT) AS d,
           CASE WHEN mh.den_micro > 0
                THEN cast(mh.num_micro * 1000000 // mh.den_micro AS BIGINT)
           END AS or_micro
    FROM mh
    """,
    doc="Cochran-Mantel-Haenszel pooled odds ratio: association "
    "between high error share and high-value purchasing, pooled "
    "across activity strata — the 2x2xK companion to q349 (ATE "
    "estimates a difference; CMH estimates a common odds ratio "
    "robust to Simpson reversals, OR_MH = sum(a_i d_i / n_i) / "
    "sum(b_i c_i / n_i)). One user rollup, one stratum 2x2 "
    "aggregate; the pooled ratio is a 1-row reduction. Exact "
    "integers throughout: per-stratum terms carry a_i d_i * 1e6 "
    "floor-divided by n_i (<= 1e6 * n_i/4, int64-safe to ~3.6e12 "
    "users per stratum), per-stratum ORs surface alongside the "
    "pooled -1 row so a Simpson flip is VISIBLE (stratum ORs one "
    "side, pooled the other). Degenerate strata (zero cross "
    "products) drop from the pooled sums, NULL in their own row.",
)
def q364_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.when(
            F.sum(F.expr("case when event_type = 'error' then 1 else 0 end"))
            * 5
            > F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("x"),
        F.when(
            F.sum(
                F.expr(
                    "case when event_type = 'purchase' and value >= 50.0"
                    " then 1 else 0 end"
                )
            )
            > 0,
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("y"),
    )
    tot = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("nu"),
        F.sum("n_ev").cast("bigint").alias("te"),
    )
    s = u.crossJoin(F.broadcast(tot)).select(
        F.expr("least(n_ev * 4 * nu div te, 7)").alias("stratum"), "x", "y"
    )
    g = s.groupBy("stratum").agg(
        F.sum(F.expr("case when x = 1 and y = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("a"),
        F.sum(F.expr("case when x = 1 and y = 0 then 1 else 0 end"))
        .cast("bigint")
        .alias("b"),
        F.sum(F.expr("case when x = 0 and y = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("c"),
        F.sum(F.expr("case when x = 0 and y = 0 then 1 else 0 end"))
        .cast("bigint")
        .alias("d"),
    )
    mh = g.filter(F.expr("b * c > 0 or a * d > 0")).agg(
        F.sum(F.expr("a * d * 1000000 div (a + b + c + d)"))
        .cast("bigint")
        .alias("num_micro"),
        F.sum(F.expr("b * c * 1000000 div (a + b + c + d)"))
        .cast("bigint")
        .alias("den_micro"),
    )
    per = g.select(
        F.col("stratum").cast("int").alias("stratum"),
        "a",
        "b",
        "c",
        "d",
        F.expr(
            "case when b * c > 0"
            " then cast(a * d * 1000000 div (b * c) as bigint) end"
        ).alias("or_micro"),
    )
    pooled = mh.select(
        F.lit(-1).cast("int").alias("stratum"),
        F.col("num_micro").alias("a"),
        F.col("den_micro").alias("b"),
        F.lit(0).cast("bigint").alias("c"),
        F.lit(0).cast("bigint").alias("d"),
        F.expr(
            "case when den_micro > 0"
            " then cast(num_micro * 1000000 div den_micro as bigint) end"
        ).alias("or_micro"),
    )
    return per.unionAll(pooled)


@query(
    "q365_kruskal_wallis",
    """
    WITH b AS (SELECT event_type AS g,
                      cast(floor(value * 100) AS BIGINT) AS v
               FROM events),
    c AS (SELECT v,
                 cast(sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 cast(sum(CASE WHEN g = 'view' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                 cast(sum(CASE WHEN g = 'signup' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n3,
                 cast(sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n4,
                 cast(sum(CASE WHEN g = 'error' THEN 1 ELSE 0 END)
                      AS BIGINT) AS n5
          FROM b GROUP BY v),
    cum AS (SELECT *,
                   n1 + n2 + n3 + n4 + n5 AS t,
                   cast(coalesce(sum(n1 + n2 + n3 + n4 + n5)
                        OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0) AS BIGINT) AS pre
            FROM c),
    agg AS (SELECT cast(sum(n1) AS BIGINT) AS m1,
                   cast(sum(n2) AS BIGINT) AS m2,
                   cast(sum(n3) AS BIGINT) AS m3,
                   cast(sum(n4) AS BIGINT) AS m4,
                   cast(sum(n5) AS BIGINT) AS m5,
                   cast(sum(n1 * (2 * pre + t + 1)) AS BIGINT) AS r1,
                   cast(sum(n2 * (2 * pre + t + 1)) AS BIGINT) AS r2,
                   cast(sum(n3 * (2 * pre + t + 1)) AS BIGINT) AS r3,
                   cast(sum(n4 * (2 * pre + t + 1)) AS BIGINT) AS r4,
                   cast(sum(n5 * (2 * pre + t + 1)) AS BIGINT) AS r5,
                   cast(sum(t * t * t - t) AS BIGINT) AS ties
            FROM cum),
    h AS (SELECT m1 + m2 + m3 + m4 + m5 AS n,
                 (3.0 * (r1::DOUBLE * r1::DOUBLE / m1::DOUBLE
                         + r2::DOUBLE * r2::DOUBLE / m2::DOUBLE
                         + r3::DOUBLE * r3::DOUBLE / m3::DOUBLE
                         + r4::DOUBLE * r4::DOUBLE / m4::DOUBLE
                         + r5::DOUBLE * r5::DOUBLE / m5::DOUBLE)
                  / ((m1 + m2 + m3 + m4 + m5)::DOUBLE
                     * ((m1 + m2 + m3 + m4 + m5)::DOUBLE + 1.0))
                  - 3.0 * ((m1 + m2 + m3 + m4 + m5)::DOUBLE + 1.0))
                 / (1.0 - ties::DOUBLE
                    / ((m1 + m2 + m3 + m4 + m5)::DOUBLE
                       * (m1 + m2 + m3 + m4 + m5)::DOUBLE
                       * (m1 + m2 + m3 + m4 + m5)::DOUBLE
                       - (m1 + m2 + m3 + m4 + m5)::DOUBLE)) AS hval
          FROM agg)
    SELECT cast(n AS BIGINT) AS n, round(hval, 6) AS h_stat,
           (hval >= 9.488) AS significant
    FROM h
    """,
    doc="Kruskal-Wallis H (nonparametric one-way ANOVA by ranks, "
    "midrank ties, tie-corrected) across the five funnel stages' "
    "value distributions — the k-group extension of q176's "
    "Mann-Whitney and the rank-based alternative to q162-style "
    "ANOVA when q354 says the tails are heavy. Ranks never "
    "materialize per row: the q176 doubling trick on the per-value "
    "count table gives 2*R_g = sum_v n_g(v)*(2*pre(v)+t(v)+1) as "
    "pure bigint (per-value counts + one distributed prefix sum — "
    "the Spark side uses operators/stats.py with_prefix_sums, "
    "bucketed, no corpus window; the oracle's window is oracle-"
    "scale). The five groups are a FIXED design, so the H formula "
    "pivots to one row with an explicit left-to-right addition "
    "order — no float-sum order nondeterminism. Significance vs "
    "the chi2(4) 5%% literal 9.488.",
)
def q365_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.stats import with_prefix_sums

    ev = _t(spark, sf_dir, "events")
    groups = ["click", "view", "signup", "purchase", "error"]
    b = ev.select(
        F.col("event_type").alias("g"),
        F.expr("cast(floor(value * 100) as bigint)").alias("v"),
    )
    c = b.groupBy("v").agg(
        *[
            F.sum(F.expr(f"case when g = '{g}' then 1 else 0 end"))
            .cast("bigint")
            .alias(f"n{i}")
            for i, g in enumerate(groups, start=1)
        ]
    )
    pre = with_prefix_sums(c, 100, [f"n{i}" for i in range(1, 6)])
    tsum = " + ".join(f"n{i}" for i in range(1, 6))
    presum = " + ".join(f"pre_n{i}" for i in range(1, 6))
    agg = pre.agg(
        *[F.sum(f"n{i}").cast("bigint").alias(f"m{i}") for i in range(1, 6)],
        *[
            F.sum(
                F.expr(f"n{i} * (2 * ({presum}) + ({tsum}) + 1)")
            )
            .cast("bigint")
            .alias(f"r{i}")
            for i in range(1, 6)
        ],
        F.sum(F.expr(f"({tsum}) * ({tsum}) * ({tsum}) - ({tsum})"))
        .cast("bigint")
        .alias("ties"),
    )
    nsum = " + ".join(f"m{i}" for i in range(1, 6))
    rterm = " + ".join(
        f"cast(r{i} as double) * cast(r{i} as double) / cast(m{i} as double)"
        for i in range(1, 6)
    )
    h = agg.select(
        F.expr(f"cast({nsum} as bigint)").alias("n"),
        F.expr(
            f"(3.0 * ({rterm})"
            f" / (cast({nsum} as double) * (cast({nsum} as double) + 1.0))"
            f" - 3.0 * (cast({nsum} as double) + 1.0))"
            f" / (1.0 - cast(ties as double)"
            f" / (cast({nsum} as double) * cast({nsum} as double)"
            f" * cast({nsum} as double) - cast({nsum} as double)))"
        ).alias("hval"),
    )
    return h.select(
        "n",
        F.round("hval", 6).alias("h_stat"),
        (F.col("hval") >= 9.488).alias("significant"),
    )


@query(
    "q366_cumulative_gains",
    """
    WITH u AS (SELECT user_id,
                      cast(count(*) AS BIGINT) AS n_ev,
                      cast(CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                             AND value >= 50.0
                                        THEN 1 ELSE 0 END) > 0
                           THEN 1 ELSE 0 END AS INT) AS y
               FROM events GROUP BY user_id),
    band AS (SELECT n_ev // 5 AS b,
                    cast(count(*) AS BIGINT) AS users,
                    cast(sum(y) AS BIGINT) AS pos
             FROM u GROUP BY 1),
    tot AS (SELECT cast(sum(users) AS BIGINT) AS nu,
                   cast(sum(pos) AS BIGINT) AS np FROM band),
    cum AS (SELECT b, users, pos,
                   cast(sum(users) OVER (ORDER BY b DESC) AS BIGINT)
                     AS cum_users,
                   cast(sum(pos) OVER (ORDER BY b DESC) AS BIGINT)
                     AS cum_pos
            FROM band)
    SELECT cast(cum.b AS BIGINT) AS score_band,
           cum.cum_users, cum.cum_pos,
           cast(cum.cum_users * 1000000 // tot.nu AS BIGINT)
             AS share_users_ppm,
           cast(cum.cum_pos * 1000000 // tot.np AS BIGINT) AS recall_ppm,
           cast(cum.cum_pos * tot.nu * 1000
                // (tot.np * cum.cum_users) AS BIGINT) AS lift_milli
    FROM cum CROSS JOIN tot
    """,
    doc="Cumulative gains / lift curve for a score (user activity) "
    "predicting high-value purchasers: descending score bands "
    "accumulate users and positives, yielding recall@share and "
    "lift — the model-eval curve that decides how deep a targeting "
    "or reranking cut should go (lift ~1 = the score is noise past "
    "that depth). Banding (n_ev div 5) makes the curve's x-axis the "
    "score DOMAIN, so the per-band aggregate is one shuffle and the "
    "descending cumulative runs over the band table (score-domain-"
    "sized = metadata; the q293 CDF discipline — at web scale use "
    "with_prefix_sums on the banded counts, as q365 does). All "
    "exact: ppm shares and milli lift via integer floor division "
    "(cum_pos * nu caps ~9e18 at ~3e9 users with ~1e9 positives — "
    "pre-divide beyond, q268 lesson).",
)
def q366_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.when(
            F.sum(
                F.expr(
                    "case when event_type = 'purchase' and value >= 50.0"
                    " then 1 else 0 end"
                )
            )
            > 0,
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("y"),
    )
    band = u.groupBy(F.expr("n_ev div 5").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("users"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = band.agg(
        F.sum("users").cast("bigint").alias("nu"),
        F.sum("pos").cast("bigint").alias("np"),
    )
    wdesc = W.orderBy(F.col("b").desc())
    cum = band.select(
        "b",
        F.sum("users").over(wdesc).cast("bigint").alias("cum_users"),
        F.sum("pos").over(wdesc).cast("bigint").alias("cum_pos"),
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        F.col("b").cast("bigint").alias("score_band"),
        "cum_users",
        "cum_pos",
        F.expr("cast(cum_users * 1000000 div nu as bigint)").alias(
            "share_users_ppm"
        ),
        F.expr("cast(cum_pos * 1000000 div np as bigint)").alias(
            "recall_ppm"
        ),
        F.expr(
            "cast(cum_pos * nu * 1000 div (np * cum_users) as bigint)"
        ).alias("lift_milli"),
    )


@query(
    "q367_friedman_test",
    r"""
    WITH s AS (SELECT cast(n_chars AS BIGINT) AS s1,
                      cast(len(list_filter(string_split_regex(
                        lower(trim(text)), '\s+'), x -> x <> ''))
                        AS BIGINT) AS s2,
                      cast(10 * len(list_filter(string_split_regex(
                        lower(trim(text)), '\s+'),
                        x -> x IN ('the', 'a', 'and', 'of', 'to')))
                        AS BIGINT) AS s3
               FROM documents),
    rk AS (SELECT
             1 + 2 * ((s2 < s1)::INT + (s3 < s1)::INT)
               + (s2 = s1)::INT + (s3 = s1)::INT + 1 AS r1x2,
             1 + 2 * ((s1 < s2)::INT + (s3 < s2)::INT)
               + (s1 = s2)::INT + (s3 = s2)::INT + 1 AS r2x2,
             1 + 2 * ((s1 < s3)::INT + (s2 < s3)::INT)
               + (s1 = s3)::INT + (s2 = s3)::INT + 1 AS r3x2
           FROM s),
    a AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(r1x2) AS BIGINT) AS t1,
                 cast(sum(r2x2) AS BIGINT) AS t2,
                 cast(sum(r3x2) AS BIGINT) AS t3,
                 cast(sum(r1x2 * r1x2 + r2x2 * r2x2 + r3x2 * r3x2)
                      AS BIGINT) AS ss
          FROM rk)
    SELECT n,
           round(2.0 * ((t1 - 4 * n)::DOUBLE * (t1 - 4 * n)::DOUBLE
                        + (t2 - 4 * n)::DOUBLE * (t2 - 4 * n)::DOUBLE
                        + (t3 - 4 * n)::DOUBLE * (t3 - 4 * n)::DOUBLE)
                 / (ss::DOUBLE - 48.0 * n::DOUBLE), 6) AS chi2_f,
           (2.0 * ((t1 - 4 * n)::DOUBLE * (t1 - 4 * n)::DOUBLE
                   + (t2 - 4 * n)::DOUBLE * (t2 - 4 * n)::DOUBLE
                   + (t3 - 4 * n)::DOUBLE * (t3 - 4 * n)::DOUBLE)
            / (ss::DOUBLE - 48.0 * n::DOUBLE) >= 5.991) AS significant
    FROM a
    """,
    doc="Friedman test (blocked nonparametric ANOVA, tie-corrected "
    "Conover form) over three quality raters scored WITHIN each "
    "document — do the raters induce systematically different "
    "rankings, the repeated-measures question q320's kappa (pairwise "
    "agreement) cannot answer (blocks remove per-document difficulty "
    "exactly like paired tests remove per-user variance). Within-"
    "block midranks of k=3 values are CLOSED-FORM map-side "
    "arithmetic (2*rank = 2*#less + #tied + 1 including self — no "
    "window, no sort, not even within the block); one moment "
    "aggregate then the tie-safe statistic chi2 = (k-1) * "
    "sum_j(R2_j - n(k+1))^2 / (sum r2^2 - nk(k+1)^2) with every "
    "numerator term an exact integer (doubles only at the final "
    "squares, correctly-rounded, explicit addition order over the "
    "k=3 fixed design). Significance vs the chi2(2) 5%% literal.",
)
def q367_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        F.col("n_chars").cast("bigint").alias("s1"),
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" x -> x <> '')) as bigint)"
        ).alias("s2"),
        F.expr(
            r"cast(10 * size(filter(split(lower(trim(text)), '\\s+'),"
            r" x -> x in ('the', 'a', 'and', 'of', 'to'))) as bigint)"
        ).alias("s3"),
    )
    def r2(j: int, others: list[int]) -> str:
        less = " + ".join(
            f"cast(s{o} < s{j} as int)" for o in others
        )
        tied = " + ".join(
            f"cast(s{o} = s{j} as int)" for o in others
        )
        return f"1 + 2 * ({less}) + ({tied}) + 1"

    rk = s.select(
        F.expr(r2(1, [2, 3])).alias("r1x2"),
        F.expr(r2(2, [1, 3])).alias("r2x2"),
        F.expr(r2(3, [1, 2])).alias("r3x2"),
    )
    a = rk.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("r1x2").cast("bigint").alias("t1"),
        F.sum("r2x2").cast("bigint").alias("t2"),
        F.sum("r3x2").cast("bigint").alias("t3"),
        F.sum(F.expr("r1x2 * r1x2 + r2x2 * r2x2 + r3x2 * r3x2"))
        .cast("bigint")
        .alias("ss"),
    )
    chi = (
        "2.0 * (cast(t1 - 4 * n as double) * cast(t1 - 4 * n as double)"
        " + cast(t2 - 4 * n as double) * cast(t2 - 4 * n as double)"
        " + cast(t3 - 4 * n as double) * cast(t3 - 4 * n as double))"
        " / (cast(ss as double) - 48.0 * cast(n as double))"
    )
    return a.select(
        "n",
        F.round(F.expr(chi), 6).alias("chi2_f"),
        F.expr(f"({chi}) >= 5.991").alias("significant"),
    )


@query(
    "q368_join_skew_audit",
    """
    WITH k AS (SELECT l_orderkey AS key, cast(count(*) AS BIGINT) AS c
               FROM lineitem GROUP BY l_orderkey),
    tot AS (SELECT cast(sum(c) AS BIGINT) AS n,
                   cast(count(*) AS BIGINT) AS ndv,
                   cast(max(c) AS BIGINT) AS cmax FROM k),
    top AS (SELECT c FROM k ORDER BY c DESC, key LIMIT 20),
    ts AS (SELECT cast(sum(c) AS BIGINT) AS top20 FROM top),
    sq AS (SELECT cast(sum(c * c) AS BIGINT) AS s2 FROM k)
    SELECT tot.n AS n_rows, tot.ndv AS n_keys, tot.cmax AS max_key_rows,
           cast(ts.top20 * 1000000 // tot.n AS BIGINT) AS top20_share_ppm,
           cast(tot.cmax * tot.ndv * 1000 // tot.n AS BIGINT)
             AS max_over_avg_milli,
           cast(sq.s2 * tot.ndv * 1000 // (tot.n * tot.n) AS BIGINT)
             AS chi_concentration_milli
    FROM tot CROSS JOIN ts CROSS JOIN sq
    """,
    doc="Join-key skew pre-flight for the lineitem-orders edge: key "
    "cardinality, the hottest key's row count, the top-20 keys' mass "
    "share, max/avg ratio, and the chi-square concentration "
    "sum(c^2)*ndv/n^2 (1.0 = uniform; the expected per-reducer "
    "blow-up factor under hash partitioning) — the numbers that "
    "decide BEFORE a 100 TB shuffle whether this join needs AQE "
    "skew splitting, salting, or a broadcast rescue, and exactly "
    "what AQE's runtime statistics would discover mid-query (this "
    "audit moves the discovery to plan time). One key-count "
    "aggregate (map-side combinable), a TakeOrdered top-20, and "
    "two scalar reductions. All exact integer ppm/milli; c^2 sums "
    "cap at cmax*n, int64-safe to ~1e9-row hot keys.",
)
def q368_join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_orderkey").alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = k.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.max("c").cast("bigint").alias("cmax"),
    )
    ts = (
        k.orderBy(F.col("c").desc(), "key")
        .limit(20)
        .agg(F.sum("c").cast("bigint").alias("top20"))
    )
    sq = k.agg(F.sum(F.expr("c * c")).cast("bigint").alias("s2"))
    return (
        tot.crossJoin(F.broadcast(ts))
        .crossJoin(F.broadcast(sq))
        .select(
            F.col("n").alias("n_rows"),
            F.col("ndv").alias("n_keys"),
            F.col("cmax").alias("max_key_rows"),
            F.expr("cast(top20 * 1000000 div n as bigint)").alias(
                "top20_share_ppm"
            ),
            F.expr("cast(cmax * ndv * 1000 div n as bigint)").alias(
                "max_over_avg_milli"
            ),
            F.expr("cast(s2 * ndv * 1000 div (n * n) as bigint)").alias(
                "chi_concentration_milli"
            ),
        )
    )


@query(
    "q369_corr_matrix",
    r"""
    WITH f AS (SELECT cast(n_chars AS BIGINT) AS x1,
                      cast(len(list_filter(string_split_regex(
                        lower(trim(text)), '\s+'), t -> t <> ''))
                        AS BIGINT) AS x2,
                      cast(len(list_filter(string_split_regex(
                        lower(trim(text)), '\s+'),
                        t -> t IN ('the', 'a', 'and', 'of', 'to')))
                        AS BIGINT) AS x3,
                      cast(length(text)
                           - length(replace(text, 'e', '')) AS BIGINT) AS x4
               FROM documents),
    m AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(x1) AS BIGINT) AS s1, cast(sum(x2) AS BIGINT) AS s2,
                 cast(sum(x3) AS BIGINT) AS s3, cast(sum(x4) AS BIGINT) AS s4,
                 cast(sum(x1*x1) AS BIGINT) AS s11,
                 cast(sum(x2*x2) AS BIGINT) AS s22,
                 cast(sum(x3*x3) AS BIGINT) AS s33,
                 cast(sum(x4*x4) AS BIGINT) AS s44,
                 cast(sum(x1*x2) AS BIGINT) AS s12,
                 cast(sum(x1*x3) AS BIGINT) AS s13,
                 cast(sum(x1*x4) AS BIGINT) AS s14,
                 cast(sum(x2*x3) AS BIGINT) AS s23,
                 cast(sum(x2*x4) AS BIGINT) AS s24,
                 cast(sum(x3*x4) AS BIGINT) AS s34
          FROM f)
    SELECT p.i, p.j,
           round((p.sij::DOUBLE - p.si::DOUBLE * p.sj::DOUBLE / p.n::DOUBLE)
                 / sqrt((p.sii::DOUBLE
                         - p.si::DOUBLE * p.si::DOUBLE / p.n::DOUBLE)
                        * (p.sjj::DOUBLE
                           - p.sj::DOUBLE * p.sj::DOUBLE / p.n::DOUBLE)),
                 6) AS corr
    FROM (SELECT 1 AS i, 2 AS j, n, s1 AS si, s2 AS sj, s11 AS sii,
                 s22 AS sjj, s12 AS sij FROM m
          UNION ALL SELECT 1, 3, n, s1, s3, s11, s33, s13 FROM m
          UNION ALL SELECT 1, 4, n, s1, s4, s11, s44, s14 FROM m
          UNION ALL SELECT 2, 3, n, s2, s3, s22, s33, s23 FROM m
          UNION ALL SELECT 2, 4, n, s2, s4, s22, s44, s24 FROM m
          UNION ALL SELECT 3, 4, n, s3, s4, s33, s44, s34 FROM m) p
    """,
    doc="Pearson correlation matrix over four document features "
    "(chars, tokens, stopword hits, 'e' count) in ONE pass: the "
    "full exact integer moment matrix (4 sums, 4 squares, 6 cross-"
    "products) from a single map-side-combinable aggregate, then "
    "each upper-triangle r_ij from the closed covariance form — "
    "the feature-engineering screen run before q357's VIF (corr "
    "shows pairwise structure; VIF shows joint). No second scan, "
    "no per-pair job: p features cost p(p+3)/2 accumulators in one "
    "reduce, the classic single-pass trick that beats p^2 corr() "
    "calls by a factor of the scan cost. Doubles appear only in "
    "the final normalized ratio (+,-,*,/,sqrt on exact int64 "
    "moments — correctly rounded, bit-identical, no libm).",
)
def q369_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    f = docs.select(
        F.col("n_chars").cast("bigint").alias("x1"),
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" t -> t <> '')) as bigint)"
        ).alias("x2"),
        F.expr(
            r"cast(size(filter(split(lower(trim(text)), '\\s+'),"
            r" t -> t in ('the', 'a', 'and', 'of', 'to'))) as bigint)"
        ).alias("x3"),
        F.expr(
            "cast(length(text) - length(replace(text, 'e', '')) as bigint)"
        ).alias("x4"),
    )
    pairs = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    m = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(f"x{i}").cast("bigint").alias(f"s{i}") for i in range(1, 5)],
        *[
            F.sum(F.expr(f"x{i}*x{i}")).cast("bigint").alias(f"s{i}{i}")
            for i in range(1, 5)
        ],
        *[
            F.sum(F.expr(f"x{i}*x{j}")).cast("bigint").alias(f"s{i}{j}")
            for i, j in pairs
        ],
    )
    rows = ", ".join(
        f"{i}, {j}, round((cast(s{i}{j} as double) - cast(s{i} as double)"
        f" * cast(s{j} as double) / cast(n as double))"
        f" / sqrt((cast(s{i}{i} as double) - cast(s{i} as double)"
        f" * cast(s{i} as double) / cast(n as double))"
        f" * (cast(s{j}{j} as double) - cast(s{j} as double)"
        f" * cast(s{j} as double) / cast(n as double))), 6)"
        for i, j in pairs
    )
    return m.selectExpr(f"stack(6, {rows}) as (i, j, corr)")


def _Q370_ORACLE(iters: int = 4, dim: int = 64) -> str:
    ctes = [
        f"""c AS (SELECT list_transform(range(1, {dim + 1}), i ->
             cast(floor(cast(embedding[i] AS DOUBLE) * 10000) AS BIGINT))
             AS xq FROM embeddings)""",
        f"""d1 AS (SELECT xq,
             1000 * list_sum(xq) AS d FROM c)""",
    ]
    prev_d = "d1"
    for t in range(1, iters + 1):
        ctes.append(
            f"""y{t} AS (SELECT ks.k,
               cast(sum(p.xq[ks.k] * p.d) AS BIGINT) AS y
          FROM {prev_d} p
          CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS k) ks
          GROUP BY ks.k)"""
        )
        ctes.append(
            f"""m{t} AS (SELECT cast(max(abs(y)) AS BIGINT) AS m
                FROM y{t})"""
        )
        ctes.append(
            f"""v{t} AS (SELECT y{t}.k,
               cast(cast(sign(y{t}.y) AS BIGINT)
                    * (abs(y{t}.y) * 1000 // m{t}.m) AS BIGINT) AS vk
          FROM y{t} CROSS JOIN m{t})"""
        )
        if t < iters:
            ctes.append(
                f"""vl{t} AS (SELECT list(vk ORDER BY k) AS vl FROM v{t})"""
            )
            ctes.append(
                f"""d{t + 1} AS (SELECT c.xq,
               list_sum(list_transform(range(1, {dim + 1}),
                 k -> c.xq[k] * vl{t}.vl[k])) AS d
          FROM c CROSS JOIN vl{t})"""
            )
            prev_d = f"d{t + 1}"
    cte_sql = ",\n    ".join(ctes)
    return f"""
    WITH {cte_sql}
    SELECT cast(k AS INT) AS dim, vk AS loading_milli FROM v{iters}
    """


@query(
    "q370_pca_power_iteration",
    _Q370_ORACLE(),
    doc="Top principal direction of the embedding cloud by DISTRIBUTED "
    "power iteration (uncentered: embeddings are ~zero-mean, the "
    "standard dominant-singular-vector audit): 4 iterations of "
    "v <- X^T(Xv), where each iteration is ONE corpus pass — the "
    "per-row dot Xv is map-side, the 64 components of X^T(Xv) "
    "aggregate via posexplode + per-dim sum — so the 64x64 "
    "covariance NEVER materializes and the cost is O(N*d) per "
    "iteration, the shape that holds at any corpus size (cf. the "
    "anisotropy/hubness audits q311/q158 this direction explains). "
    "The iterate renormalizes to exact MILLI integers via the "
    "sign-split v = sign(y) * (|y|*1000 // max|y|) — negative "
    "components never meet integer division directly, because the "
    "three engines disagree there (Python // floors, DuckDB // and "
    "Spark div truncate) — with each 64-element "
    "iterate a bounded driver pin (the q348 regime); all products "
    "are int64 (|y| <= N*4e4*2.6e9 — safe to ~1e4 rows at bench "
    "magnitudes, rescale v to centi units at larger N, documented). "
    "The oracle unrolls all 4 iterations as chained CTEs.",
)
def q370_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    emb = _t(spark, sf_dir, "embeddings")
    c = spread(
        emb.select(
            "vec_id",
            F.expr(
                "transform(slice(embedding, 1, 64), x ->"
                " cast(floor(cast(x as double) * 10000) as bigint))"
            ).alias("xq"),
        ),
        "vec_id",
    ).localCheckpoint(eager=False)
    v = [1000] * 64
    for t in range(4):
        dot = " + ".join(
            f"element_at(xq, {k + 1}) * ({v[k]})" for k in range(64)
        )
        y_rows = (
            c.select(F.expr(f"cast({dot} as bigint)").alias("d"), "xq")
            .select("d", F.posexplode("xq").alias("k", "xv"))
            .groupBy("k")
            .agg(F.sum(F.expr("xv * d")).cast("bigint").alias("y"))
            .collect()  # bounded: exactly 64 rows per iteration
        )
        y = {int(r["k"]): int(r["y"]) for r in y_rows}
        m = max(abs(val) for val in y.values())
        # sign-split: truncate-toward-zero, matching the oracle's
        # sign * (abs * 1000 // m) exactly (Python // floors negatives)
        v = [
            (1 if y[k] >= 0 else -1) * (abs(y[k]) * 1000 // m)
            for k in range(64)
        ]
    return spark.createDataFrame(
        [(k + 1, v[k]) for k in range(64)], "dim int, loading_milli long"
    )


@query(
    "q371_conditional_entropy",
    r"""
    WITH t AS (SELECT list_filter(string_split_regex(lower(trim(text)),
                                                     '\s+'), x -> x <> '')
                 AS s
               FROM documents),
    bi AS (SELECT g1, g2, cast(count(*) AS BIGINT) AS c
           FROM (SELECT unnest(list_transform(range(1, len(s)),
                          i -> s[i])) AS g1,
                        unnest(list_transform(range(1, len(s)),
                          i -> s[i + 1])) AS g2
                 FROM t WHERE len(s) >= 2)
           GROUP BY g1, g2),
    qb AS (SELECT cast(sum(c) AS BIGINT) AS tb,
                  cast(sum(cast(floor(c::DOUBLE * log2(c::DOUBLE) * 1e6
                                      + 0.5) AS BIGINT)) AS BIGINT) AS sb
           FROM bi),
    ctx AS (SELECT g1, cast(sum(c) AS BIGINT) AS c FROM bi GROUP BY g1),
    qc AS (SELECT cast(sum(cast(floor(c::DOUBLE * log2(c::DOUBLE) * 1e6
                                      + 0.5) AS BIGINT)) AS BIGINT) AS sc
           FROM ctx)
    SELECT qb.tb AS n_bigrams,
           cast(floor(log2(qb.tb::DOUBLE) * 1e6 + 0.5) - qb.sb // qb.tb
                AS BIGINT) AS h_bigram_micro,
           cast(floor(log2(qb.tb::DOUBLE) * 1e6 + 0.5) - qc.sc // qb.tb
                AS BIGINT) AS h_context_micro,
           cast((qc.sc - qb.sb) // qb.tb AS BIGINT) AS h_cond_micro
    FROM qb CROSS JOIN qc
    """,
    doc="Corpus conditional entropy H(W2|W1) in bits: the bigram-model "
    "entropy rate — how predictable the next token is given one "
    "token of context — the information-theoretic compressibility "
    "audit that separates natural prose (H_cond ~ 5-8 bits) from "
    "templated/boilerplate slices (H_cond -> 0) and complements "
    "q152's per-document marginal entropy (a corpus can have high "
    "unigram entropy yet be utterly predictable bigram-wise). "
    "Identity: H(W2|W1) = H(W1 W2) - H(W1), with the context "
    "marginal aggregated FROM the bigram table (one gram shuffle "
    "feeds everything). Per-term c*log2(c) quantizes to exact 1e-6 "
    "integers BEFORE summation (the q152/token_entropy convention) "
    "so the corpus-scale accumulation is pure bigint — order-"
    "independent across partitions and engines; the single libm "
    "log2 on the scalar total is floor(+0.5)-quantized once.",
)
def q371_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from tytodb_spark.operators.textual import spread

    docs = _t(spark, sf_dir, "documents")
    t = spread(docs.select("doc_id", "text"), "doc_id").select(
        F.expr(
            r"filter(split(lower(trim(text)), '\\s+'), x -> x <> '')"
        ).alias("s")
    )
    bi = (
        t.filter(F.expr("size(s) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(element_at(s, i) as g1,"
                    " element_at(s, i + 1) as g2))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.g1").alias("g1"), F.col("p.g2").alias("g2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    clgc = (
        "cast(floor(cast(c as double) * log2(cast(c as double)) * 1e6"
        " + 0.5) as bigint)"
    )
    qb = bi.agg(
        F.sum("c").cast("bigint").alias("tb"),
        F.sum(F.expr(clgc)).cast("bigint").alias("sb"),
    )
    qc = (
        bi.groupBy("g1")
        .agg(F.sum("c").cast("bigint").alias("c"))
        .agg(F.sum(F.expr(clgc)).cast("bigint").alias("sc"))
    )
    return qb.crossJoin(F.broadcast(qc)).select(
        F.col("tb").alias("n_bigrams"),
        F.expr(
            "cast(floor(log2(cast(tb as double)) * 1e6 + 0.5)"
            " - sb div tb as bigint)"
        ).alias("h_bigram_micro"),
        F.expr(
            "cast(floor(log2(cast(tb as double)) * 1e6 + 0.5)"
            " - sc div tb as bigint)"
        ).alias("h_context_micro"),
        F.expr("cast((sc - sb) div tb as bigint)").alias("h_cond_micro"),
    )


@query(
    "q372_granger_lagged",
    """
    WITH h AS (SELECT cast(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
                      cast(sum(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) AS BIGINT) AS y,
                      cast(sum(CASE WHEN event_type = 'click'
                               THEN 1 ELSE 0 END) AS BIGINT) AS x
               FROM events GROUP BY 1),
    p AS (SELECT cur.y, prev.y AS yl, prev.x AS xl
          FROM h cur JOIN h prev
            ON prev.hr = cur.hr - INTERVAL 1 HOUR),
    m AS (SELECT cast(count(*) AS BIGINT) AS n,
                 cast(sum(y) AS BIGINT) AS sy,
                 cast(sum(yl) AS BIGINT) AS s1,
                 cast(sum(xl) AS BIGINT) AS s2,
                 cast(sum(y * y) AS BIGINT) AS syy,
                 cast(sum(yl * yl) AS BIGINT) AS s11,
                 cast(sum(xl * xl) AS BIGINT) AS s22,
                 cast(sum(y * yl) AS BIGINT) AS sy1,
                 cast(sum(y * xl) AS BIGINT) AS sy2,
                 cast(sum(yl * xl) AS BIGINT) AS s12
          FROM p),
    c AS (SELECT n,
                 syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE AS cyy,
                 s11::DOUBLE - s1::DOUBLE * s1::DOUBLE / n::DOUBLE AS c11,
                 s22::DOUBLE - s2::DOUBLE * s2::DOUBLE / n::DOUBLE AS c22,
                 sy1::DOUBLE - sy::DOUBLE * s1::DOUBLE / n::DOUBLE AS cy1,
                 sy2::DOUBLE - sy::DOUBLE * s2::DOUBLE / n::DOUBLE AS cy2,
                 s12::DOUBLE - s1::DOUBLE * s2::DOUBLE / n::DOUBLE AS c12
          FROM m),
    r AS (SELECT n,
                 cyy - cy1 * cy1 / c11 AS rss_r,
                 cyy - ((cy1 * c22 - cy2 * c12) * cy1
                        + (cy2 * c11 - cy1 * c12) * cy2)
                       / (c11 * c22 - c12 * c12) AS rss_u
          FROM c)
    SELECT n AS n_pairs,
           round(rss_r, 6) AS rss_restricted,
           round(rss_u, 6) AS rss_unrestricted,
           round((rss_r - rss_u) / (rss_u / (n::DOUBLE - 3.0)), 6)
             AS f_stat,
           ((rss_r - rss_u) / (rss_u / (n::DOUBLE - 3.0)) >= 3.86)
             AS significant
    FROM r
    """,
    doc="Granger-style lagged-predictivity test: does last hour's "
    "click count improve the prediction of this hour's purchase "
    "count beyond purchases' own lag? F = (RSS_r - RSS_u) / "
    "(RSS_u/(n-3)) comparing the AR(1)-restricted fit against the "
    "one-extra-lag fit — the leading-indicator screen that decides "
    "which upstream metric belongs on a forecasting dashboard "
    "(correlation q369 can't distinguish lead from co-movement). "
    "The lag is a self-JOIN on hr - 1 hour (adjacent-hour pairs; "
    "no window at all, not even a series one); both fits come from "
    "ONE exact integer moment aggregate via closed normal-equation "
    "forms (the q357 machinery: doubles only in the final centered "
    "algebra, +,-,*,/ correctly rounded, no libm). Significance vs "
    "the F(1, ~700) 5%% literal 3.86.",
)
def q372_granger_lagged(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.sum(F.expr("case when event_type = 'purchase' then 1 else 0 end"))
        .cast("bigint")
        .alias("y"),
        F.sum(F.expr("case when event_type = 'click' then 1 else 0 end"))
        .cast("bigint")
        .alias("x"),
    )
    prev = h.select(
        F.col("hr").alias("phr"),
        F.col("y").alias("yl"),
        F.col("x").alias("xl"),
    )
    p = h.join(
        prev, F.col("phr") == F.expr("hr - interval 1 hour")
    ).select("y", "yl", "xl")
    m = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum("yl").cast("bigint").alias("s1"),
        F.sum("xl").cast("bigint").alias("s2"),
        F.sum(F.expr("y * y")).cast("bigint").alias("syy"),
        F.sum(F.expr("yl * yl")).cast("bigint").alias("s11"),
        F.sum(F.expr("xl * xl")).cast("bigint").alias("s22"),
        F.sum(F.expr("y * yl")).cast("bigint").alias("sy1"),
        F.sum(F.expr("y * xl")).cast("bigint").alias("sy2"),
        F.sum(F.expr("yl * xl")).cast("bigint").alias("s12"),
    )
    c = m.select(
        "n",
        F.expr(
            "cast(syy as double) - cast(sy as double) * cast(sy as double)"
            " / cast(n as double)"
        ).alias("cyy"),
        F.expr(
            "cast(s11 as double) - cast(s1 as double) * cast(s1 as double)"
            " / cast(n as double)"
        ).alias("c11"),
        F.expr(
            "cast(s22 as double) - cast(s2 as double) * cast(s2 as double)"
            " / cast(n as double)"
        ).alias("c22"),
        F.expr(
            "cast(sy1 as double) - cast(sy as double) * cast(s1 as double)"
            " / cast(n as double)"
        ).alias("cy1"),
        F.expr(
            "cast(sy2 as double) - cast(sy as double) * cast(s2 as double)"
            " / cast(n as double)"
        ).alias("cy2"),
        F.expr(
            "cast(s12 as double) - cast(s1 as double) * cast(s2 as double)"
            " / cast(n as double)"
        ).alias("c12"),
    )
    r = c.select(
        "n",
        F.expr("cyy - cy1 * cy1 / c11").alias("rss_r"),
        F.expr(
            "cyy - ((cy1 * c22 - cy2 * c12) * cy1"
            " + (cy2 * c11 - cy1 * c12) * cy2)"
            " / (c11 * c22 - c12 * c12)"
        ).alias("rss_u"),
    )
    fstat = "(rss_r - rss_u) / (rss_u / (cast(n as double) - 3.0))"
    return r.select(
        F.col("n").alias("n_pairs"),
        F.round("rss_r", 6).alias("rss_restricted"),
        F.round("rss_u", 6).alias("rss_unrestricted"),
        F.round(F.expr(fstat), 6).alias("f_stat"),
        F.expr(f"({fstat}) >= 3.86").alias("significant"),
    )


_DTW_BIG = 4611686018427387904  # 2^62 sentinel for out-of-grid cells


@query(
    "q373_dtw_alignment",
    f"""
    WITH RECURSIVE pa AS (SELECT cast(extract(day FROM ts) AS INT) AS d,
                                 cast(count(*) AS BIGINT) AS y
                          FROM events WHERE event_type = 'purchase'
                          GROUP BY 1),
    pb AS (SELECT cast(extract(day FROM ts) AS INT) AS d,
                  cast(count(*) AS BIGINT) AS y
           FROM events WHERE event_type = 'click' GROUP BY 1),
    s AS (SELECT (SELECT list(y ORDER BY d) FROM pa) AS al,
                 (SELECT list(y ORDER BY d) FROM pb) AS bl),
    r AS (
      SELECT 2 AS d,
             list_transform(range(1, len(s.al) + 1), i ->
               CASE WHEN i = 1 THEN abs(s.al[1] - s.bl[1])
                    ELSE {_DTW_BIG} END) AS cur,
             list_transform(range(1, len(s.al) + 1),
                            i -> {_DTW_BIG}) AS prev,
             s.al AS al, s.bl AS bl
      FROM s
      UNION ALL
      SELECT r.d + 1,
             list_transform(range(1, len(r.al) + 1), i ->
               CASE WHEN r.d + 1 - i BETWEEN 1 AND len(r.bl)
                 THEN abs(r.al[i] - r.bl[r.d + 1 - i])
                      + least(coalesce(r.cur[i - 1], {_DTW_BIG}),
                              coalesce(r.cur[i], {_DTW_BIG}),
                              coalesce(r.prev[i - 1], {_DTW_BIG}))
                 ELSE {_DTW_BIG} END),
             r.cur, r.al, r.bl
      FROM r WHERE r.d < len(r.al) + len(r.bl))
    SELECT cast(len(al) AS BIGINT) AS n_a, cast(len(bl) AS BIGINT) AS n_b,
           cast(cur[len(al)] AS BIGINT) AS dtw_dist,
           cast(cur[len(al)] * 1000 // (len(al) + len(bl)) AS BIGINT)
             AS dtw_per_step_milli
    FROM r WHERE d = len(al) + len(bl)
    """,
    doc="Dynamic-time-warping distance between the daily purchase and "
    "click series: the elastic alignment cost that matches shapes "
    "shifted or stretched in time, where q372's fixed-lag regression "
    "and q369's correlation see nothing (a campaign whose conversion "
    "lag drifts from 1 to 3 days ruins a fixed lag but barely moves "
    "DTW). Corpus-scale work: two daily count aggregates; the DP "
    "grid is day-domain-sized (30x30 — metadata BY CONSTRUCTION) "
    "and runs as exact |a_i - b_j| integer arithmetic — Spark pins "
    "the two bounded series to the driver (q348 regime) and replays "
    "the DP; the oracle replays it as a RECURSIVE CTE over "
    "anti-diagonals, each new diagonal a list_transform of the "
    "previous two (the wavefront trick that removes within-row "
    "sequential dependence), with a 2^62 sentinel for out-of-grid "
    "cells. For thousand-point series, segment + banded DTW "
    "(Sakoe-Chiba) keeps the grid bounded — documented, same "
    "shape.",
)
def q373_dtw_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def daily(et: str):
        return (
            ev.filter(F.col("event_type") == et)
            .groupBy(F.dayofmonth("ts").alias("d"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
            .orderBy("d")
            .collect()  # bounded: day-domain-sized (<= 31 rows)
        )

    a = [int(r["y"]) for r in daily("purchase")]
    b = [int(r["y"]) for r in daily("click")]
    big = _DTW_BIG
    n, m = len(a), len(b)
    prev_row = [big] * (m + 1)
    cur_row = [big] * (m + 1)
    for i in range(1, n + 1):
        nxt = [big] * (m + 1)
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                nxt[j] = c
            else:
                best = min(cur_row[j] if i > 1 else big,
                           nxt[j - 1],
                           cur_row[j - 1] if i > 1 else big)
                nxt[j] = c + best
        prev_row, cur_row = cur_row, nxt
    dtw = cur_row[m]
    return spark.createDataFrame(
        [(n, m, dtw, dtw * 1000 // (n + m))],
        "n_a long, n_b long, dtw_dist long, dtw_per_step_milli long",
    )


@query(
    "q374_distribution_drift",
    """
    WITH h AS (SELECT cast(floor(value / 10) AS BIGINT) AS bin,
                      cast(sum(CASE WHEN extract(day FROM ts) <= 15
                               THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                      cast(sum(CASE WHEN extract(day FROM ts) > 15
                               THEN 1 ELSE 0 END) AS BIGINT) AS cb
               FROM events GROUP BY 1),
    tot AS (SELECT cast(sum(ca) AS BIGINT) AS na,
                   cast(sum(cb) AS BIGINT) AS nb,
                   cast(count(*) AS BIGINT) AS nbins FROM h),
    terms AS (SELECT
        abs(h.ca * t.nb - h.cb * t.na) AS tvn,
        cast(floor(sqrt(((h.ca * 1000000 // t.na)
                         * (h.cb * 1000000 // t.nb))::DOUBLE))
             AS BIGINT) AS bc_micro,
        cast(floor(((h.ca + 1)::DOUBLE / (t.na + t.nbins)::DOUBLE)
                   * ln(((h.ca + 1) * (t.nb + t.nbins))::DOUBLE
                        / ((h.cb + 1) * (t.na + t.nbins))::DOUBLE)
                   * 1e9) AS BIGINT) AS kl_nano
      FROM h CROSS JOIN tot t)
    SELECT t.na AS n_first_half, t.nb AS n_second_half,
           cast(sum(terms.tvn) * 1000000 // (2 * t.na * t.nb) AS BIGINT)
             AS tv_micro,
           cast(sum(terms.bc_micro) AS BIGINT) AS bc_sum_micro,
           cast(sum(terms.kl_nano) AS BIGINT) AS kl_nano
    FROM terms CROSS JOIN tot t
    GROUP BY t.na, t.nb
    """,
    doc="Distribution-drift census between the month's halves over "
    "binned event values: total variation, the Bhattacharyya "
    "coefficient (Hellinger^2 = 1 - BC), and add-1-smoothed "
    "KL(first||second) — the three-lens drift gate a feature-store "
    "or training-mix monitor runs per snapshot (TV bounds any "
    "probability change, BC/Hellinger is tail-sensitive, KL "
    "punishes disappearing mass; q175's KS sees only the worst "
    "single quantile). ONE histogram aggregate feeds all three; "
    "every per-bin term quantizes to an exact integer BEFORE the "
    "bin sum (TV exactly via |ca*nb - cb*na| cross products, BC "
    "via sqrt of exact ppm products — correctly rounded on exact "
    "ints — KL via per-bin nano-nat floors, the only libm), so "
    "the aggregation is order-independent. Cross products cap at "
    "na*nb ~ 4e8 at bench scale; int64-safe to ~3e9 x 3e9 events "
    "after the *1e6 — pre-divide to ppm shares beyond (documented).",
)
def q374_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        F.expr("cast(floor(value / 10) as bigint)").alias("bin")
    ).agg(
        F.sum(F.expr("case when day(ts) <= 15 then 1 else 0 end"))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.expr("case when day(ts) > 15 then 1 else 0 end"))
        .cast("bigint")
        .alias("cb"),
    )
    tot = h.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).cast("bigint").alias("nbins"),
    )
    terms = h.crossJoin(F.broadcast(tot)).select(
        "na",
        "nb",
        F.expr("abs(ca * nb - cb * na)").alias("tvn"),
        F.expr(
            "cast(floor(sqrt(cast((ca * 1000000 div na)"
            " * (cb * 1000000 div nb) as double))) as bigint)"
        ).alias("bc_micro"),
        F.expr(
            "cast(floor((cast(ca + 1 as double)"
            " / cast(na + nbins as double))"
            " * ln(cast((ca + 1) * (nb + nbins) as double)"
            " / cast((cb + 1) * (na + nbins) as double)) * 1e9) as bigint)"
        ).alias("kl_nano"),
    )
    return terms.groupBy("na", "nb").agg(
        F.expr(
            "cast(sum(tvn) * 1000000 div (2 * na * nb) as bigint)"
        ).alias("tv_micro"),
        F.sum("bc_micro").cast("bigint").alias("bc_sum_micro"),
        F.sum("kl_nano").cast("bigint").alias("kl_nano"),
    ).select(
        F.col("na").alias("n_first_half"),
        F.col("nb").alias("n_second_half"),
        "tv_micro",
        "bc_sum_micro",
        "kl_nano",
    )


@query(
    "q375_wasserstein1",
    """
    WITH v AS (SELECT cast(floor(value * 100 + 0.5) AS BIGINT) // 12 AS b,
                      cast(CASE WHEN event_type = 'click'
                           THEN 1 ELSE 0 END AS BIGINT) AS ia,
                      cast(CASE WHEN event_type = 'view'
                           THEN 1 ELSE 0 END AS BIGINT) AS ib
               FROM events
               WHERE event_type IN ('click', 'view')),
    c AS (SELECT b, cast(sum(ia) AS BIGINT) AS ca,
                 cast(sum(ib) AS BIGINT) AS cb
          FROM v GROUP BY b),
    grid AS (SELECT unnest(range(0, 4085)) AS b),
    g AS (SELECT grid.b, coalesce(c.ca, 0) AS ca, coalesce(c.cb, 0) AS cb
          FROM grid LEFT JOIN c ON c.b = grid.b),
    cum AS (SELECT b,
                   cast(sum(ca) OVER (ORDER BY b) AS BIGINT) AS fa,
                   cast(sum(cb) OVER (ORDER BY b) AS BIGINT) AS fb
            FROM g),
    tot AS (SELECT cast(sum(ca) AS BIGINT) AS na,
                   cast(sum(cb) AS BIGINT) AS nb FROM g)
    SELECT tot.na AS n_click, tot.nb AS n_view,
           cast(sum(abs(cum.fa * tot.nb - cum.fb * tot.na)) * 12 * 1000
                // (tot.na * tot.nb) AS BIGINT) AS w1_millicents
    FROM cum CROSS JOIN tot
    GROUP BY tot.na, tot.nb
    """,
    doc="Wasserstein-1 (earth mover) distance between the click and "
    "view value distributions on a FIXED 4085-bin cent grid: "
    "W1 = integral |F_a - F_b| dv — the drift metric that weighs "
    "HOW FAR mass moved, where TV/KL (q374) only see that it moved "
    "and KS (q175) only the worst point; the right gate for 'did "
    "prices shift by pennies or dollars'. The grid is fixed BY "
    "CONSTRUCTION (12-cent bins over the value domain), so the "
    "cumulative window runs over 4085 metadata rows regardless of "
    "corpus size — the corpus-scale work is one binned count "
    "aggregate; empty bins enter via the exploded grid left-join "
    "(their CDF gap still contributes, which a distinct-values-"
    "only spelling would silently drop). Exact integer cross-"
    "product CDF differences |fa*nb - fb*na| summed as bigints "
    "(caps ~4085 * na*nb * 12000 ~ 2e16 at bench scale; pre-divide "
    "to ppm CDFs past ~1e7 x 1e7 events, documented).",
)
def q375_wasserstein1(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .groupBy(
            F.expr(
                "cast(floor(value * 100 + 0.5) as bigint) div 12"
            ).alias("b")
        )
        .agg(
            F.sum(
                F.expr("cast(case when event_type = 'click' then 1 else 0 end as bigint)")
            )
            .cast("bigint")
            .alias("ca"),
            F.sum(
                F.expr("cast(case when event_type = 'view' then 1 else 0 end as bigint)")
            )
            .cast("bigint")
            .alias("cb"),
        )
    )
    grid = spark.range(0, 4085).select(F.col("id").alias("b"))
    g = grid.join(c, "b", "left").select(
        "b",
        F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
        F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
    )
    wcum = W.orderBy("b")
    cum = g.select(
        "b",
        F.sum("ca").over(wcum).cast("bigint").alias("fa"),
        F.sum("cb").over(wcum).cast("bigint").alias("fb"),
    )
    tot = g.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(
            F.expr(
                "cast(sum(abs(fa * nb - fb * na)) * 12 * 1000"
                " div (na * nb) as bigint)"
            ).alias("w1_millicents")
        )
        .select(
            F.col("na").alias("n_click"),
            F.col("nb").alias("n_view"),
            "w1_millicents",
        )
    )


# ---------------------------------------------------------------------------
# registry order = driver check order (MECHANICAL — derived from artifacts)
# ---------------------------------------------------------------------------
# The round driver's CORRECTNESS artifact covers a PREFIX of the registry
# (50 entries per round so far), so iteration order decides which queries
# get a driver-verified row this round. Rounds 2 and 3 both shipped a
# hand-maintained rotation list that went stale and left new entries
# outside the checked prefix — so the order is now COMPUTED at import
# time from the committed CORRECTNESS_r*.json artifacts themselves:
#
#   1. entries with NO green driver row in any committed artifact come
#      first (green = rows_match AND schema_match AND hash_match, no
#      err — a hash-mismatch like r03's q143 counts as unverified);
#   2. verified entries follow, OLDEST last-green round first (their
#      driver rows predate the most refactoring), registry-insertion
#      order as the tiebreak.
#
# The list cannot go stale a third time: each round's new queries have
# no artifact row, so they sort into the front group automatically, and
# committing CORRECTNESS_r{N}.json re-derives the next round's order.
# Every entry is ALSO oracle-verified locally per-commit by
# tests/test_oracle_differential.py, which has no prefix cap.


def _driver_green_rounds(root: str | None = None) -> dict[str, int]:
    """name -> latest round with a fully-green driver row, from the
    committed CORRECTNESS_r*.json artifacts at ``root`` (defaults to the
    repo root). The ``root`` override exists so tests can exercise the
    rotation on synthetic artifacts instead of the live repo's."""
    import glob
    import json
    import re as _re

    if root is None:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and not row.get("err")
            )
            if green:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _check_order(
    names_in: list[str], green: dict[str, int] | None = None
) -> list[str]:
    if green is None:
        green = _driver_green_rounds()
    pos = {n: i for i, n in enumerate(names_in)}
    return sorted(names_in, key=lambda n: (green.get(n, -1), pos[n]))


REGISTRY = {n: REGISTRY[n] for n in _check_order(list(REGISTRY))}



def names() -> list[str]:
    return list(REGISTRY)
