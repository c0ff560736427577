"""Time-series smoothing operators (BASELINE.json extension surface; no
reference counterpart — the reference has no time type at all,
src/alba_types.rs:9-27).

The classic EWMA recurrence s_n = α·x_n + (1−α)·s_{n−1} carries
unbounded history, which makes it (a) a sequential per-key scan and
(b) float-order-nondeterministic. The operator here is the truncated
form every production metrics pipeline actually runs: α = 1/2 with the
tail cut at `depth` terms, so weights are powers of two, state is
O(depth), and the whole thing is a fixed LAG-chain — pure window
expressions, one shuffle on the key, no Python, no recursion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def ewma_truncated(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    value_col: str,
    depth: int = 8,
) -> DataFrame:
    """Per-key truncated EWMA (α = 1/2, last `depth` observations):

        ewma_n ≈ Σ_{k=0..depth−1} x_{n−k} · 2^{depth−1−k} / (2^depth − 1)

    Values quantize to exact integer cents first, the weighted numerator
    is an exact BIGINT (weights are powers of two), and the single float
    division happens once per row — bit-stable at any parallelism and
    hash-checkable cross-engine, unlike a running double recurrence
    whose result depends on accumulation order. Rows younger than
    `depth` observations are biased low exactly like a zero-initialized
    streaming EWMA (documented cold-start semantics, not a bug).

    Scale shape: one shuffle (window partition on `key`), per-row work
    is `depth` LAGs over an already-sorted frame; 100 TB of events
    distribute by key with no driver involvement. `order_cols` must end
    in a unique tiebreaker so the LAG sequence is total-ordered.

    Output: input columns + (v_cents, ewma, ewma_q); `ewma` is the
    human-readable double, `ewma_q` the 1e-6-quantized BIGINT
    (floor(x·1e6 + 0.5) on the exact-integer-fed division — the repo's
    cross-engine hash convention).
    """
    if depth < 1 or depth > 30:
        raise ValueError("depth must be in [1, 30]")
    w = W.partitionBy(key).orderBy(*order_cols)
    v = F.floor(F.col(value_col).cast("double") * 100).cast("bigint")
    out = df.withColumn("v_cents", v)
    num: Column = F.lit(0).cast("bigint")
    for k in range(depth):
        num = num + F.coalesce(
            F.lag("v_cents", k).over(w), F.lit(0).cast("bigint")
        ) * F.lit(2 ** (depth - 1 - k)).cast("bigint")
    denom = float((2**depth - 1) * 100)
    return out.withColumn("ewma", F.round(num / F.lit(denom), 6)).withColumn(
        "ewma_q",
        F.floor(num * F.lit(1e6) / F.lit(denom) + F.lit(0.5)).cast("bigint"),
    )
