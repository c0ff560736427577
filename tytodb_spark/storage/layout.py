"""Physical data layout for scan pruning: hive partitioning + Z-order.

The reference's only layout tool is a chunked range index on the first
column (src/indexing.rs:33-40) — one clustering dimension, maintained as
a separate artifact. On Parquet the same money comes from layout at
write time, and it generalizes past one dimension:

- **Hive partitioning** (`write_partitioned`): directory-level pruning
  for low-cardinality columns. A partition filter never opens the
  pruned files — at 100 TB this is the difference between a metadata
  operation and a cluster-wide scan.
- **Z-order clustering** (`write_zordered`): interleave the bits of k
  normalized sort keys into one Morton key, range-partition and sort by
  it. Every file then covers a small k-dimensional box of the key
  space, so Parquet row-group min/max stats prune multi-column box
  predicates — the reference's first-column-only index cannot serve the
  second column at all (src/indexing.rs:215-309 keys strictly on
  column 0). All arithmetic is JVM-side bit twiddling (shift/and/or)
  inside whole-stage codegen; no UDF.

Scale note: the per-column (min, max) normalization bounds are computed
with one tiny aggregate (2k scalars to the driver — metadata-sized, the
same stats a table format keeps in its manifest), never the data itself.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], fmt: str = "parquet"
) -> None:
    """Hive-style partitioned write: one directory per partition value.

    Partition columns should be low-cardinality (a date bucket, a
    source tag, a language) — each distinct tuple becomes a directory,
    and a filter on them prunes at the *file listing* level, before any
    parquet footer is read.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(path)


def _spread_bits(c: Column, bits: int, offset: int, step: int) -> Column:
    """Spread `bits` low bits of a long across positions offset + i*step."""
    parts = [
        F.shiftleft(F.shiftright(c, i).bitwiseAND(F.lit(1)), i * step + offset)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key column interleaving `cols`.

    Each column is affinely mapped onto [0, 2^bits) using its global
    (min, max) — one scalar aggregate — then the bit planes are
    interleaved: column j contributes bit i at position i*len(cols)+j.
    Returns (df_with_key, key_col_name).
    """
    k = len(cols)
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    top = float((1 << bits) - 1)
    spreads = []
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        span = (mx - mn) or 1.0
        scaled = (
            ((F.col(c).cast("double") - F.lit(mn)) / F.lit(span) * F.lit(top))
            .cast("long")
        )
        spreads.append(_spread_bits(scaled, bits, i, k))
    key = reduce(lambda a, b: a.bitwiseOR(b), spreads)
    return df.withColumn("__zkey", key), "__zkey"


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write `df` clustered on the Z-order of `cols`.

    repartitionByRange on the Morton key gives each output file a
    contiguous key range (a small k-D box); sortWithinPartitions makes
    row groups inside a file boxes too. Filters on ANY subset of `cols`
    then prune via parquet min/max stats — the multi-dimensional
    generalization of the reference's first-column range index.
    """
    zdf, keycol = zorder_key(df, cols, bits)
    (
        zdf.repartitionByRange(num_files, F.col(keycol))
        .sortWithinPartitions(keycol)
        .drop(keycol)
        .write.mode("overwrite")
        .parquet(path)
    )


def file_column_bounds(path: str, columns: list[str]) -> list[dict]:
    """Per-data-file (min, max) for `columns`, read from parquet footers.

    Test/inspection helper (pyarrow, driver-side): this is exactly the
    metadata a scan consults for pruning, so tests can assert layout
    quality — the fraction of files a box predicate must open — without
    timing anything.
    """
    import os

    import pyarrow.parquet as pq

    out: list[dict] = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        bounds = {c: [None, None] for c in columns}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                cname = col.path_in_schema
                if cname in bounds and col.statistics is not None:
                    st = col.statistics
                    lo, hi = bounds[cname]
                    bounds[cname] = [
                        st.min if lo is None else min(lo, st.min),
                        st.max if hi is None else max(hi, st.max),
                    ]
        out.append({"file": name, **{c: tuple(v) for c, v in bounds.items()}})
    return out
