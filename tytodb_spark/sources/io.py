"""Format-generic table IO: parquet / CSV / JSON readers and writers.

The reference's only "format" is its custom fixed-width binary file per
container (src/container.rs:435-520 — see sources/tyto_container.py for
a Spark reader of that style of layout). This module is the standard
connector surface an analytics engine owes its users: schema-explicit,
lossless round-trips, predicate pushdown where the format supports it
(parquet), plus the knobs that keep text formats unambiguous (quoting,
multiline, timestamp format).

Scale notes: every writer shards one file per partition (a
100 TB write is as parallel as its partitioning); CSV/JSON are
line-splittable on read, so a big file still fans out; parquet/ORC
carry column stats so filters prune row groups/stripes. Schemas are
always passed explicitly on read — inference is a full extra pass and
non-deterministic under sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_TEXT_OPTS = {
    "quote": '"',
    "escape": '"',
    "multiLine": "true",
    "header": "true",
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
}

FORMATS = ("parquet", "orc", "csv", "json")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite") -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    w = df.write.mode(mode)
    if fmt == "csv":
        w = w.options(**_TEXT_OPTS)
    elif fmt == "json":
        w = w.option("timestampFormat", _TEXT_OPTS["timestampFormat"])
    getattr(w, fmt)(path)


def read_table(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: T.StructType | None = None
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    if fmt == "csv":
        r = r.options(**_TEXT_OPTS)
    elif fmt == "json":
        r = r.option("timestampFormat", _TEXT_OPTS["timestampFormat"])
    return getattr(r, fmt)(path)
