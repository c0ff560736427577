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


def _bloom_positions(key, m_bits: int):
    """k=2 bit positions from independent md5 slices (portable family:
    DuckDB ('0x'||substr(md5(k),1,8))::BIGINT % m)."""
    h = F.md5(key.cast("string"))
    h1 = F.pmod(F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(m_bits))
    h2 = F.pmod(F.conv(F.substring(h, 9, 8), 16, 10).cast("long"), F.lit(m_bits))
    return h1, h2


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 65536) -> DataFrame:
    """Build a PORTABLE Bloom filter over a key set as a word table:
    m_bits bits packed 32-per-BIGINT word (32 keeps every set bit far
    from the sign bit, so the same `1 << offset` arithmetic is legal in
    any engine). Plan: distinct keys → 2 bit positions each → ONE
    bit_or aggregate on m/32 word keys (map-side combinable — each task
    ships at most m/32 words regardless of key count). Filters over
    different batches MERGE by bit_or on word_idx — the same mergeable-
    counter-table shape as the CMS sketch, and the artifact a 100 TB
    join prefilter broadcasts instead of the key set itself.

    Output: (word_idx, word) — only non-zero words; absent words read 0.
    """
    h1, h2 = _bloom_positions(F.col(key_col), m_bits)
    pos = keys.select(F.col(key_col)).distinct().select(
        F.explode(F.array(h1, h2)).alias("__pos")
    )
    return (
        pos.select(
            (F.col("__pos") / 32).cast("int").alias("word_idx"),
            # SQL form: shiftleft's bit-count arg must be an expression,
            # not a Python literal, to vary per row
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 32 as int))")
            .alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__bit").alias("word"))
    )


def bloom_probe(
    probes: DataFrame, key_col: str, bloom: DataFrame, m_bits: int = 65536
) -> DataFrame:
    """Membership probe: each key's two words join against the (tiny,
    broadcast) word table; a key is a `bloom_hit` iff both its bits are
    set. No false negatives by construction; false-positive rate is
    governed by m_bits vs key count (k=2: fp ≈ (1−e^{−2n/m})²).
    Output: probes + bloom_hit."""
    h1, h2 = _bloom_positions(F.col(key_col), m_bits)
    with_pos = probes.withColumn("__p1", h1).withColumn("__p2", h2)
    w1 = bloom.select(
        F.col("word_idx").alias("__w1i"), F.col("word").alias("__w1")
    )
    w2 = bloom.select(
        F.col("word_idx").alias("__w2i"), F.col("word").alias("__w2")
    )
    out = (
        with_pos.join(
            F.broadcast(w1), (F.col("__p1") / 32).cast("int") == F.col("__w1i"), "left"
        )
        .join(
            F.broadcast(w2), (F.col("__p2") / 32).cast("int") == F.col("__w2i"), "left"
        )
        .withColumn(
            "bloom_hit",
            (
                F.coalesce("__w1", F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(cast(1 as bigint), cast(__p1 % 32 as int))")
                )
                != 0
            )
            & (
                F.coalesce("__w2", F.lit(0)).bitwiseAND(
                    F.expr("shiftleft(cast(1 as bigint), cast(__p2 % 32 as int))")
                )
                != 0
            ),
        )
    )
    return out.drop("__p1", "__p2", "__w1i", "__w1", "__w2i", "__w2")


# msb position lookup for a hex digit 1..15 ('0' never queried):
# digit d -> floor(log2(d)) WITHOUT floating log (log2 of an exact
# power of two is the classic off-by-ulp floor hazard)
_HEX_MSB = "011222233333333"
_HEX = "0123456789abcdef"


def _hll_fields(key, m: int):
    """(register_idx, rho) from the md5-portable family: low 2 hex chars
    (8 bits) pick one of m=256 registers; the NEXT 13 hex chars (52
    bits) feed rho = leading-zero count + 1, computed by hex-string
    inspection (4 bits per leading '0' char + a 15-entry msb lookup on
    the first non-zero digit) so no engine's log/clz quirks can differ.
    """
    if m != 256:
        raise ValueError("portable layout is fixed at m=256 (b=8)")
    h = F.md5(key.cast("string"))
    ridx = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    w = F.substring(h, 3, 13)  # 52 bits as hex text
    stripped = F.regexp_replace(w, "^0+", "")
    n0 = (F.length(w) - F.length(stripped)).cast("int")
    first = F.substring(stripped, 1, 1)
    dval = (F.instr(F.lit(_HEX), first)).cast("int")  # 1-based => value+1
    # _HEX_MSB is 1-indexed by DIGIT VALUE (1..15), so index dval-1
    msb = F.substring(F.lit(_HEX_MSB), dval - 1, 1).cast("int")
    rho = F.when(F.length(stripped) == 0, F.lit(53)).otherwise(
        n0 * 4 + (F.lit(3) - msb) + 1
    )
    return ridx, rho


def hll_build(keys: DataFrame, key_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """Build PORTABLE HyperLogLog registers (m=256) over a key column,
    optionally per group: one map-side (register, rho) projection + ONE
    max aggregate on at most 256·|groups| keys — the same mergeable-
    counter-table shape as the CMS and Bloom sketches (registers from
    different batches/sources merge by MAX on register_idx), and unlike
    binary HLL blobs the table is exactly reproducible in any engine
    via the md5 hash family.

    Output: (group_cols..., ridx, rho) — only touched registers; absent
    registers read rho=0.
    """
    gcols = group_cols or []
    ridx, rho = _hll_fields(F.col(key_col), 256)
    return (
        keys.select(*gcols, ridx.alias("ridx"), rho.alias("rho"))
        .groupBy(*gcols, "ridx")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Cardinality estimate from a register table (m=256), with the
    standard small-range linear-counting correction. Determinism: the
    harmonic sum accumulates EXACT integers 2^(53−rho) (order-
    independent bigint addition; max 256·2^52 < 2^63), and the float
    pipeline (one division per branch) runs once per group. Expected
    error 1.04/√256 ≈ 6.5%.

    Output: (group_cols..., n_registers_set, hll_est_q) where hll_est_q
    is the estimate in exact milli-units (⌊E·1000 + 0.5⌋).
    """
    gcols = group_cols or []
    m = 256
    pow_term = F.expr("shiftleft(cast(1 as bigint), cast(53 - rho as int))")
    agg = registers.groupBy(*gcols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_registers_set"),
        F.sum(pow_term).cast("bigint").alias("__hsum"),
    )
    # absent registers contribute 2^-0 = 1 each: add (m - set)·2^53
    full_sum = (
        F.col("__hsum")
        + (F.lit(m) - F.col("n_registers_set")) * F.lit(1 << 53).cast("bigint")
    )
    raw = (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(m))
        * F.lit(float(m * m))
        * F.lit(float(1 << 53))
        / full_sum.cast("double")
    )
    zeros = F.lit(m) - F.col("n_registers_set")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((zeros > 0) & (raw <= 2.5 * m), linear).otherwise(raw)
    return agg.select(
        *gcols,
        "n_registers_set",
        F.floor(est * 1000 + F.lit(0.5)).cast("bigint").alias("hll_est_q"),
    )
