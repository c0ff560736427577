"""Catalog: map the testdata parquet tables to DataFrames / temp views.

Reference counterpart: TytoDB's `Database` holds a directory with one
fixed-width binary file per container (reference src/database.rs:99-108);
here a "database" is a directory of Parquet tables. Reads go through
`spark.read.parquet` so Catalyst gets predicate pushdown + column pruning
on every query (the reference's chunked scan + hand-rolled first-column
index, src/query.rs:234-370, are subsumed by Parquet row-group stats).
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType

from tytodb_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark reads them as
    long (spark.sql.legacy.parquet.nanosAsLong) and we convert to
    microsecond timestamps (truncation, matching DuckDB's ns→µs cast)."""
    schema = pq.read_schema(path)
    return tuple(f.name for f in schema if str(f.type) == "timestamp[ns]")


def _read_table(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    for c in _nanos_ts_columns(path):
        # integer `div`, not `/`: double division of ~1.7e18 ns loses the
        # low bits (53-bit mantissa) and can round the microsecond up
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    # Canonicalize event-time: micros-precision parquet timestamps read
    # natively as TIMESTAMP_NTZ, which unix_micros()/withWatermark() reject.
    # Session tz is UTC (session.py), so reinterpreting NTZ wall-clock as
    # instants matches DuckDB's epoch_us on the same files.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.to_timestamp(F.col(c)))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every testdata table present under ``sf_dir``."""
    tune(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            out[name] = _read_table(spark, path)
    return out


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> dict[str, DataFrame]:
    """Register each table as a temp view (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(prefix + name)
    return dfs
