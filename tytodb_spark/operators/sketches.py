"""Mergeable frequency sketches. HLL distinct-count sketches are
declared at q38/q87 (Spark's native approx_count_distinct partials);
this module adds Count-Min — the point-frequency dual — built as plain
DataFrame aggregates so the sketch itself is a (depth x width) counter
TABLE: mergeable by addition, shippable as a broadcast, and exactly
reproducible in any engine via the md5-portable hash family (no opaque
binary blobs, unlike sketch libraries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(term, d: int, width: int):
    """Row d's bucket for a term: first 8 md5 hex chars of 'd:term',
    mod width — the documented portable family (DuckDB:
    ('0x'||substr(md5(d||':'||t),1,8))::BIGINT % width)."""
    h = F.md5(F.concat(F.lit(f"{d}:"), term))
    return F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(width))


def count_min_build(
    items: DataFrame, term_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the CMS counter table over an item stream: one explode to
    (d, bucket) pairs + ONE narrow count shuffle on depth*width keys
    (map-side combinable — the shuffle carries at most depth*width rows
    per task regardless of stream size). Sketches over different
    corpora/batches merge by summing counters on (d, bucket) — the
    incremental/streaming path.

    Output: (d, bucket, c) — depth*width rows (absent cells are zero).
    """
    pairs = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(term_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.d", "p.bucket")
    return pairs.groupBy("d", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


def count_min_estimate(
    sketch: DataFrame, probes: DataFrame, term_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-frequency estimates for a probe set: each probe joins its
    depth buckets against the (tiny, broadcast) counter table and takes
    the min — the CMS guarantee est >= true, est <= true + eps*N w.h.p.
    Missing cells read as zero. Output: (term, est)."""
    probe_buckets = probes.select(
        F.col(term_col).alias("term"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(F.col(term_col), d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("p"),
    ).select("term", "p.d", "p.bucket")
    return (
        probe_buckets.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("bigint").alias("est"))
    )
