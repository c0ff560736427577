"""Join operators Spark lacks as built-ins: as-of joins and bounded
interval (band/theta) joins, built shuffle-scalably from DataFrame
primitives.

The reference has no relational joins at all — its `Query::join`
(src/query.rs:86-108) is page-list concatenation, i.e. UNION ALL. These
are extension operators (SURVEY §2.6 join checklist: as-of / interval /
theta), designed so neither ever degenerates into a broadcast
nested-loop join:

- as-of: ONE shuffle on the key, a single ordered window pass, no range
  explosion — the union-and-carry-forward construction.
- interval: equi-join on (key, time-bucket) with the left side exploded
  to the ≤⌈span/width⌉+1 buckets its window covers; the residual exact
  range predicate filters after the equi-join. Candidate count is
  bounded by real temporal locality, never |L|×|R| per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For every left row, attach the latest right row with
    right_ts <= left_ts (or strictly < when ``inclusive=False``) for the
    same key. Left-join semantics: left rows with no prior right row
    keep NULL right columns.

    Construction: tag and union both inputs, sort each key's timeline
    once (right rows before left at equal timestamps iff inclusive),
    carry the right payload forward with last(ignorenulls) over an
    ever-growing window, then keep the left rows. One shuffle on the
    key, linear in |L|+|R| — the standard scale-out as-of shape.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0 if inclusive else 2).alias("__tag"),
        F.lit(None).cast(
            l_tagged.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    timeline = l_tagged.unionByName(r_tagged)
    w = (
        W.partitionBy("__k")
        .orderBy("__ts", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = timeline.select(
        "__tag",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    ).filter(F.col("__tag") == 1)
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__r_{c}").alias(f"r_{c}") for c in right_cols],
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant fact ⋈ dim equi-join: the fact side gets a random
    salt in [0, salt), the dim side is replicated `salt` ways, and the
    join runs on (key, salt) — a single hot key spreads over `salt`
    tasks instead of melting one. Use when AQE's skew splitting isn't
    enough (one key ≫ everything, e.g. a null-ish default id at corpus
    scale); the dim replication cost is |dim|×salt, so keep the dim
    side small. Result equals the plain join (each fact row meets each
    matching dim row exactly once — the dim copy with its salt)."""
    f = fact.withColumn("__salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt)
    d = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    # shuffle_hash on the dim side pins the scale-correct physical plan: a
    # shuffle hash join on (key, salt) building on the replicated dim. It
    # also stops local-mode stats from "helpfully" broadcasting the FACT
    # side (tiny in tests, 100 TB in production), which would make the
    # demo plan the opposite of what ships.
    out = f.join(d.hint("shuffle_hash"), [key, "__salt"], how)
    return out.drop("__salt")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: float,
    upper_s: float,
) -> DataFrame:
    """All (left, right) pairs with the same key and
    right_ts ∈ [left_ts + lower_s, left_ts + upper_s] (seconds).

    The inequality is made equi-joinable by time-bucketing: each right
    row lands in exactly one bucket of width (upper_s - lower_s); each
    left row is exploded to every bucket its window overlaps (≤2 for a
    window exactly one bucket wide). The exact range predicate runs as
    a residual filter, so results equal the naive theta join while the
    join itself stays a hash join on (key, bucket).

    Output: all left columns plus right columns prefixed ``r_``.
    """
    width_us = int(round((upper_s - lower_s) * 1_000_000))
    lo_us = int(round(lower_s * 1_000_000))
    up_us = int(round(upper_s * 1_000_000))
    if width_us <= 0:
        raise ValueError("upper_s must exceed lower_s")

    def bucket(ts_us: Column) -> Column:
        return F.floor(ts_us / width_us)

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    l = left.withColumn("__lus", l_us).withColumn(
        "__bucket",
        F.explode(F.sequence(bucket(F.col("__lus") + lo_us), bucket(F.col("__lus") + up_us))),
    )
    r = right.select(
        F.col(key).alias("__rk"),
        r_us.alias("__rus"),
        bucket(r_us).alias("__bucket"),
        F.struct(*right.columns).alias("__r"),
    )
    joined = l.join(
        r,
        (F.col(key) == F.col("__rk")) & (l["__bucket"] == r["__bucket"]),
    ).filter(
        (F.col("__rus") >= F.col("__lus") + lo_us)
        & (F.col("__rus") <= F.col("__lus") + up_us)
    )
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__r.{c}").alias(f"r_{c}") for c in right.columns],
    )
