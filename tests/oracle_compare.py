"""Local replica of the driver's DuckDB-oracle differential gate.

Runs a declared Spark query and its oracle SQL over the same parquet,
then compares: row count, column-name set, and an order-insensitive
value comparison (columns sorted by name, rows sorted, values normalized).
Stricter than needed is fine — if this passes, the driver's hash compare
should too.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from tytodb_spark.catalog import TABLES, table_path

PAGE = 100


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round-trip guard: compare doubles at 9 significant-ish decimals
        return round(v, 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    out = [tuple(_norm(r[c]) for c in cols) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [r.asDict(recursive=True) for r in spark_df.collect()]
    rel = con.sql(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = [dict(zip(duck_cols, row)) for row in rel.fetchall()]

    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_df.columns),
        "duck_cols": sorted(duck_cols),
    }
    result["count_match"] = result["spark_rows"] == result["duck_rows"]
    result["schema_match"] = result["spark_cols"] == result["duck_cols"]
    if result["count_match"] and result["schema_match"]:
        a, b = _canon(spark_rows), _canon(duck_rows)
        result["value_match"] = a == b
        if not result["value_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            result["first_diffs"] = diffs[:5]
    else:
        result["value_match"] = False
    result["ok"] = result["count_match"] and result["schema_match"] and result["value_match"]
    return result
