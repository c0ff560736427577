"""Corpus sampling operators beyond per-stratum draws (q68) and hash
splits (q69): temperature-reweighted DOMAIN MIXING — the Pile/LLaMA-
style recipe that up-samples rare sources and down-samples dominant
ones when assembling a pretraining mix.

Everything is deterministic across engines and parallelism:

- randomness is a 16-bit uniform derived from md5(doc id) — both
  engines compute identical digests, unlike their `sample()` RNGs;
- the per-domain weight normalizer Σ n_d^α is summed as QUANTIZED
  integers (floor(·1e6)) so the cross-domain sum is order-independent,
  then divided once (the q79 centroid pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def md5_uniform16(id_col: Column | str) -> Column:
    """Deterministic 16-bit uniform in [0, 65536) from the LAST four hex
    chars of md5(id) — chars 1-2 feed q69's split bucket, so a mix
    drawn here is independent of the train/val/test assignment."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    md5 = F.md5(c.cast("string"))

    def nib(i: int) -> Column:
        return F.instr(F.lit(_HEX), F.substring(md5, i, 1)) - 1

    return ((nib(29) * 16 + nib(30)) * 256) + (nib(31) * 16 + nib(32))


def temperature_mix(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """Sample a corpus so domain d keeps ~budget·w_d rows, where
    w_d = n_d^α / Σ n^α and budget = target_frac·N — temperature α<1
    flattens the domain distribution (α=0 → uniform across domains,
    α=1 → the original mix, i.e. plain uniform sampling).

    Plan shape: domain counts are one narrow aggregation; the per-domain
    keep-probabilities (|domains| rows) broadcast back onto the corpus,
    so the selection itself is a map-side filter over the scan — the
    corpus never shuffles, and the same rows are kept at any
    parallelism or data layout.

    Returns the kept rows (all original columns).
    """
    if alpha == 0.5:
        w_raw: Column = F.sqrt(F.col("__n"))  # sqrt is correctly rounded
    else:  # pow may differ in the last ulp across libm implementations;
        w_raw = F.pow(F.col("__n"), F.lit(alpha))  # fine for rows-only use
    counts = (
        df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__q", F.floor(w_raw * 1e6).cast("bigint"))
    )
    totals = counts.agg(
        F.sum("__n").cast("bigint").alias("__nn"),
        F.sum("__q").cast("bigint").alias("__z"),
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        domain_col,
        F.least(
            F.lit(1.0),
            F.lit(target_frac)
            * F.col("__nn")
            * F.col("__q")
            / F.col("__z")
            / F.col("__n"),
        ).alias("__p"),
    )
    keep = md5_uniform16(id_col) < F.col("__p") * F.lit(65536.0)
    return df.join(F.broadcast(probs), domain_col).filter(keep).drop("__p")


def global_shuffle(df: DataFrame, id_col: str, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards:
    shard = one md5 byte of the id (hex chars 27-28 — disjoint from the
    q69 split nibbles and the md5_uniform16 draw, so shard, split and
    mix decisions are mutually independent), intra-shard order = the
    full md5 digest. This is the "shuffle the corpus before sequence
    packing" step of a pretraining pipeline, reproducible across runs,
    engines and cluster sizes — unlike `orderBy(rand())`.

    Plan shape at 100 TB: ONE hash exchange on the shard key (narrow —
    rows carry only their payload, no sort keys survive the exchange)
    followed by sortWithinPartitions — there is NO global sort, no
    range-exchange sampling pass, and shard files stream out sorted.
    Writing with partitionBy(shard) yields one self-contained shuffled
    shard per training-data file group.

    Adds (`shard` int, `__h` string sort key).
    """
    c = F.col(id_col)
    md5 = F.md5(c.cast("string"))

    def nib(i: int) -> Column:
        return F.instr(F.lit(_HEX), F.substring(md5, i, 1)) - 1

    shard = ((nib(27) * 16 + nib(28)) % n_shards).cast("int")
    return (
        df.withColumn("shard", shard)
        .withColumn("__h", md5)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("__h")
    )


def md5_uniform52(id_col: Column | str) -> Column:
    """Deterministic 52-bit uniform in (0, 1): the FIRST 13 md5 hex
    chars as an integer, +0.5, over 2^52 — numerator < 2^53 and the
    divisor is a power of two, so the double is EXACT and identical in
    any engine that has md5 (DuckDB mirror:
    `(('0x'||substr(md5(id),1,13))::BIGINT + 0.5) / 4503599627370496`).
    Disjoint from the hex ranges used by q69 splits / md5_uniform16 /
    global_shuffle only in purpose — it reads chars 1-13, which overlap
    q69's 1-2; don't combine this draw with the split assignment."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h52 = F.conv(F.substring(F.md5(c.cast("string")), 1, 13), 16, 10).cast("bigint")
    return (h52.cast("double") + F.lit(0.5)) / F.lit(float(1 << 52))


def weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, k: int
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row draws a deterministic uniform u from md5(id) and
    takes priority ln(u)/w — the k largest priorities are a weighted
    sample without replacement. Heavier rows get priorities closer to
    0, hence more likely into the top-k; the md5 draw makes the SAME
    sample come out at any parallelism, any engine, any run — unlike
    rand()-based sampling, which is not reproducible across
    partitionings.

    Priorities are quantized to integers (floor(·1e7)) with an id
    tie-break so a last-ulp ln() difference between libm
    implementations cannot reorder the boundary. Top-k runs as
    TakeOrderedAndProject (per-partition heads + driver merge of
    k·partitions rows — no global sort shuffle).

    Output: original columns + pri_q, the k sampled rows."""
    w = F.col(weight_col).cast("double")
    pri = F.log(md5_uniform52(id_col)) / w  # ln(u) < 0; larger = better
    pri_q = F.floor(pri * 1e7).cast("bigint")
    return (
        df.withColumn("pri_q", pri_q)
        .orderBy(F.col("pri_q").desc(), F.col(id_col))
        .limit(k)
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_width: int = 32,
    batch_size: int = 16,
) -> DataFrame:
    """Length-bucketed batch assembly (the inference/training batching
    step AFTER packing): bucket sequences by length/``bucket_width``,
    order within each bucket by (length, id), cut into
    ``batch_size``-row batches, and report per-batch padding waste
    (1 - Σlen / (n·maxlen) — what padding-to-longest costs).

    One shuffle on the bucket key for the intra-bucket window. A hot
    bucket (most docs the same length) serializes its window at
    extreme scale — there, split the order key into (bucket, salt)
    ranges or use repartitionByRange(len) instead; the fixture's
    buckets are balanced.

    Output: (bucket, batch_id, n_seqs, max_len, padding_frac)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("bucket").orderBy(F.col("__len"), F.col(id_col))
    seqs = (
        df.select(F.col(id_col), F.col(len_col).cast("bigint").alias("__len"))
        .withColumn("bucket", F.floor(F.col("__len") / bucket_width).cast("int"))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn("batch_id", F.floor((F.col("__rn") - 1) / batch_size).cast("int"))
    )
    return seqs.groupBy("bucket", "batch_id").agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.max("__len").alias("max_len"),
        F.round(
            F.lit(1.0)
            - F.sum("__len") / (F.count(F.lit(1)) * F.max("__len")),
            6,
        ).alias("padding_frac"),
    )


def domain_cap(
    df: DataFrame,
    key_col: str,
    id_col: str,
    cap: int,
) -> DataFrame:
    """Per-domain document cap — the anti-over-representation step of a
    pretraining mix (no single domain/source may contribute more than
    ``cap`` documents): keep a deterministic pseudo-random ``cap``-subset
    of each domain's documents.

    Survivor choice is the md5-integer priority (first 13 hex chars of
    md5(id) as a bigint, ties by id) — "random" but identical at any
    parallelism and in any engine with md5, unlike rand()-based
    reservoirs. Selection runs as the two-phase distributed top-k
    (similarity.py topk_per_key): per-partition heads first, so a domain
    with billions of rows never sorts globally — the shuffle carries at
    most cap×partitions rows per domain.

    Output: the input columns + ``rank`` (1..cap priority order)."""
    from tytodb_spark.operators.similarity import topk_per_key

    pri = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        .alias("__pri")
    )
    capped = topk_per_key(
        df.withColumn("__pri", pri),
        key_col,
        [F.col("__pri"), F.col(id_col)],
        cap,
    )
    return capped.drop("__pri")


def _poisson1_cdf(k_max: int = 9) -> list[float]:
    """Cumulative P(X<=k) for Poisson(1), k=0..k_max-1 — computed once
    here and reused verbatim by the SQL oracle (repr(float) round-trips
    exactly, so both engines compare against bit-identical literals)."""
    import math

    out, s, term = [], 0.0, math.exp(-1.0)
    for k in range(k_max):
        s += term
        out.append(s)
        term = term / (k + 1)
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    id_col: str,
    value_col: str,
    n_reps: int = 32,
    lo_rank: int = 2,
    hi_rank: int = 31,
) -> DataFrame:
    """Distributed bootstrap confidence interval for a mean by POISSON
    bootstrap — the standard way to bootstrap without global
    coordination: instead of resampling n rows with replacement (which
    needs a global multinomial draw), every row gets an independent
    Poisson(1) weight per replicate; for large n the replicate
    distributions converge to the true bootstrap. Weights derive from
    md5(id:replicate) uniforms against precomputed Poisson-CDF
    thresholds, so the whole procedure is deterministic and
    engine-portable.

    Plan: replicate spine (n_reps rows) broadcast-crosses the data
    map-side, each replicate's weighted sum/count aggregates exactly
    (integer cents), and the CI is a rank pick over n_reps replicate
    means — one corpus pass total, n_reps× map-side work, shuffle
    carries n_reps partials. Per-replicate means quantize to
    milli-cents; empty replicates (W=0) are excluded (probability
    e^{-n} — nil at any real n), and if exclusions ever leave fewer
    than ``hi_rank`` replicates the rank pick RAISES (coalesce →
    raise_error) instead of returning NULL bounds.

    Interval level: picking ranks ``lo_rank``/``hi_rank`` of ``n_reps``
    gives roughly the lo_rank/(n_reps+1) and hi_rank/(n_reps+1)
    percentile bounds — the defaults (2/31 of 32) are an ~88% interval
    (the 6th..94th percentile band), NOT 95%; widen n_reps or the
    ranks for tighter levels.

    Output: 1 row (n_rows, mean_q, lo_q, hi_q, ci_ok).
    """
    if not (1 <= lo_rank < hi_rank <= n_reps):
        raise ValueError(
            f"rank picks must satisfy 1 <= lo_rank < hi_rank <= n_reps "
            f"(got lo_rank={lo_rank}, hi_rank={hi_rank}, n_reps={n_reps})"
        )
    cdf = _poisson1_cdf()
    spark = df.sparkSession
    reps = F.broadcast(spark.range(n_reps).select(F.col("id").alias("__b")))
    v = df.select(
        F.col(id_col).alias("__id"),
        F.floor(F.col(value_col).cast("double") * 100).cast("bigint").alias(
            "__vc"
        ),
    )
    u = md5_uniform52(
        F.concat(F.col("__id").cast("string"), F.lit(":"), F.col("__b").cast("string"))
    )
    w: Column = F.lit(0)
    for c in cdf:
        w = w + (u > F.lit(c)).cast("int")
    rep = (
        v.crossJoin(reps)
        .select("__b", (w.cast("bigint")).alias("__w"), "__vc")
        .groupBy("__b")
        .agg(
            F.sum(F.col("__w") * F.col("__vc")).cast("bigint").alias("__s"),
            F.sum("__w").cast("bigint").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .select(
            "__b",
            F.floor(F.col("__s") * F.lit(1000) / F.col("__n"))
            .cast("bigint")
            .alias("__m"),
        )
    )
    ranked = rep.withColumn(
        "__r", F.row_number().over(W.orderBy(F.col("__m"), F.col("__b")))
    )
    missing = F.raise_error(
        F.lit(
            f"poisson_bootstrap_ci: fewer than hi_rank={hi_rank} "
            f"non-empty replicates survived the W=0 filter; CI ranks "
            f"are undefined (shrink hi_rank or raise n_reps)"
        )
    ).cast("bigint")
    ci = ranked.agg(
        F.max(F.when(F.col("__r") == lo_rank, F.col("__m"))).alias("__lo"),
        F.max(F.when(F.col("__r") == hi_rank, F.col("__m"))).alias("__hi"),
    ).select(
        F.coalesce(F.col("__lo"), missing).alias("lo_q"),
        F.coalesce(F.col("__hi"), missing).alias("hi_q"),
    )
    base = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.floor(F.sum("__vc") * F.lit(1000) / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_q"),
    )
    return base.crossJoin(F.broadcast(ci)).select(
        "n_rows",
        "mean_q",
        "lo_q",
        "hi_q",
        ((F.col("lo_q") <= F.col("mean_q")) & (F.col("mean_q") <= F.col("hi_q"))).alias(
            "ci_ok"
        ),
    )


def water_fill_caps(tok: DataFrame, key_col: str, t_col: str, budget_num: int = 1, budget_den: int = 2) -> DataFrame:
    """Exact integer water-filling: largest common per-key cap ``c`` with
    sum(min(t_k, c)) <= B, where B = total * budget_num // budget_den —
    the budget split that keeps small keys whole and caps large ones at
    one shared level (pretraining domain mixing, fair-share quota
    assignment).

    Closed-form solve over a |keys|-row metadata frame (the only global
    window in the plan is over that tiny frame): keys sort ascending by
    t, prefix sums find the FIRST rank where keeping this key whole
    exceeds B (pfx_prev + remaining * t > B); the cap at that rank is
    (B - pfx_prev) div remaining. If every rank fits, the budget covers
    the corpus and cap = max(t) (keep-all). Correctness argument for
    picking the first infeasible rank: allocated(c) = pfx_prev +
    remaining*c is nondecreasing and continuous across segment
    boundaries, and feasibility of rank i-1 guarantees the candidate
    lands >= t_{i-1}, so the segment is unique.

    Returns one row per key: (key, tokens, cap, kept_tokens, keep_ppm).
    """
    tot = tok.agg(
        F.sum(t_col).cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.expr(f"sum({t_col}) * {budget_num} div {budget_den}")
        .cast("bigint")
        .alias("__b"),
    )
    wo = W.orderBy(t_col, key_col)
    r = tok.crossJoin(F.broadcast(tot)).select(
        F.col(t_col).alias("__t"),
        "__n",
        "__b",
        F.row_number().over(wo).alias("__rn"),
        F.sum(t_col).over(wo.rowsBetween(W.unboundedPreceding, 0)).alias("__pfx"),
    )
    c = r.agg(
        F.expr(
            "coalesce("
            " min_by((__b - (__pfx - __t)) div (__n - __rn + 1), __rn)"
            "   FILTER (WHERE __pfx - __t + (__n - __rn + 1) * __t > __b),"
            " max(__t))"
        ).alias("cap")
    )
    return tok.crossJoin(F.broadcast(c)).select(
        F.col(key_col),
        F.col(t_col).cast("bigint").alias("tokens"),
        F.col("cap").cast("bigint").alias("cap"),
        F.least(t_col, "cap").cast("bigint").alias("kept_tokens"),
        F.expr(f"least({t_col}, cap) * 1000000 div {t_col}")
        .cast("bigint")
        .alias("keep_ppm"),
    )
