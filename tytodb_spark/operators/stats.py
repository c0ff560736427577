"""Distributed exact rank/CDF statistics.

The primitive every test here needs is a GLOBAL prefix sum over an
ordered value domain (an exact CDF). The naive Spark spelling — a
partition-less ``Window.orderBy(v)`` — funnels the whole value table
through one task, the same anti-pattern r03's Misra-Gries compress was
flagged for. Instead: values hash-aggregate to per-value counts, each
value maps to a fixed-width BUCKET, per-bucket subtotals (metadata-
sized: one row per bucket) prefix-sum in a single tiny task, and the
bucket offsets broadcast-join back so the within-bucket prefix runs as
a window PARTITIONED by bucket — every corpus-scale stage stays
distributed, deterministic at any parallelism.

All statistics compute from exact integer counts; the few double ops
(one division, sqrt) are correctly-rounded IEEE primitives applied in
a fixed expression order, so results are bit-identical across engines
and the published values are quantized integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def grouped_value_counts(
    df: DataFrame, value_col: Column, group_flag: Column
) -> DataFrame:
    """(v, n1, n2) — per-distinct-value counts of the flag=1 and flag=0
    populations. One hash aggregate; the output is |distinct values|
    rows, the working set for every rank statistic below."""
    return (
        df.select(value_col.alias("v"), group_flag.cast("bigint").alias("g"))
        .groupBy("v")
        .agg(
            F.sum("g").cast("bigint").alias("n1"),
            F.sum(F.lit(1) - F.col("g")).cast("bigint").alias("n2"),
        )
    )


def with_prefix_sums(
    counts: DataFrame,
    bucket_width: int,
    cols: list[str],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Append exact EXCLUSIVE prefix sums ``pre_<c>`` (totals over all
    strictly-smaller v) for each count column, distributed:

    1. bucket = floor(v / bucket_width) — fixed-width, deterministic;
    2. per-bucket subtotals aggregate (|buckets| rows — metadata);
    3. bucket offsets = exclusive prefix over the subtotal table (a
       window over metadata-sized input, by design — partitioned per
       group when ``group_cols`` is given);
    4. offsets broadcast-join back; within-bucket exclusive prefix is
       a window PARTITIONED by bucket.

    With ``group_cols`` every step keys by (group, …) as well, giving
    an independent CDF per group (grouped quantiles / trimmed stats)
    at the same cost shape: the offset table is |groups|×|buckets|
    rows — still metadata.

    No corpus-scale stage is single-task; results are independent of
    parallelism because every step is keyed arithmetic."""
    g = list(group_cols or [])
    c = counts.withColumn("__bkt", F.floor(F.col("v") / F.lit(bucket_width)))
    sub = c.groupBy(*g, "__bkt").agg(
        *[F.sum(col).cast("bigint").alias(f"__s_{col}") for col in cols]
    )
    off_w = (
        (W.partitionBy(*g) if g else W)
        .orderBy("__bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = sub.select(
        *g,
        "__bkt",
        *[
            F.coalesce(F.sum(f"__s_{col}").over(off_w), F.lit(0))
            .cast("bigint")
            .alias(f"__o_{col}")
            for col in cols
        ],
    )
    in_w = (
        W.partitionBy(*g, "__bkt")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    out = c.join(F.broadcast(offsets), [*g, "__bkt"])
    for col in cols:
        out = out.withColumn(
            f"pre_{col}",
            (
                F.col(f"__o_{col}")
                + F.coalesce(F.sum(col).over(in_w), F.lit(0))
            ).cast("bigint"),
        )
    return out.drop("__bkt", *[f"__o_{c2}" for c2 in cols])


def ks_test(
    df: DataFrame,
    value_col: Column,
    group_flag: Column,
    bucket_width: int = 100,
    alpha_c: float = 1.358,  # c(alpha) for alpha = 0.05
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance + decision — the
    distribution-drift test a curation pipeline runs when comparing a
    new ingest batch against the reference corpus (did the value
    distribution shift?).

    D = max_v |F1(v) - F2(v)| computed EXACTLY as integers:
    |c1·N2 − c2·N1| over the inclusive cumulative counts (prefix + own
    count), maxed in one aggregate; ks_q = that ratio in ppm. The
    decision compares against c(α)·sqrt((N1+N2)/(N1·N2)) — exact ints
    into two correctly-rounded double ops, engine-portable.

    Output: 1 row (n1, n2, ks_q, significant)."""
    counts = grouped_value_counts(df, value_col, group_flag)
    pre = with_prefix_sums(counts, bucket_width, ["n1", "n2"])
    tot = counts.agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
    )
    # global aggregate (no grouping keys): ALWAYS emits one row, so an
    # empty input yields NULL statistics — the same 1-row-of-NULLs
    # shape the SQL oracle's global max produces, not 0 rows
    dmax = (
        pre.crossJoin(F.broadcast(tot))
        .select(
            F.abs(
                (F.col("pre_n1") + F.col("n1")) * F.col("t2")
                - (F.col("pre_n2") + F.col("n2")) * F.col("t1")
            ).alias("__d")
        )
        .agg(F.max("__d").cast("bigint").alias("__dmax"))
    )
    d = dmax.crossJoin(F.broadcast(tot))
    ks = F.col("__dmax").cast("double") / (
        F.col("t1").cast("double") * F.col("t2").cast("double")
    )
    thr = F.lit(alpha_c) * F.sqrt(
        (F.col("t1") + F.col("t2")).cast("double")
        / (F.col("t1").cast("double") * F.col("t2").cast("double"))
    )
    return d.select(
        F.col("t1").alias("n1"),
        F.col("t2").alias("n2"),
        F.floor(ks * F.lit(1e6)).cast("bigint").alias("ks_q"),
        (ks > thr).alias("significant"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: Column,
    group_flag: Column,
    bucket_width: int = 100,
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) with midrank tie
    handling — the nonparametric A/B comparison when means mislead
    (heavy tails, outliers). Ranks stay EXACT by doubling: the midrank
    of a tied block of size t starting after c smaller items is
    c + (t+1)/2, so twice the rank-sum of group 1 is
    Σ_v n1(v)·(2·pre(v) + t(v) + 1) — pure bigint arithmetic on the
    per-value count table, no per-row ranking pass.

    The normal approximation uses the tie-corrected variance
    n1·n2/12·[(N+1) − Σ(t³−t)/(N(N−1))], where Σ(t³−t) aggregates as
    exact bigints; z then quantizes to ppm.

    Output: 1 row (n1, n2, u1_x2, z_q, significant)."""
    counts = grouped_value_counts(df, value_col, group_flag)
    pre = with_prefix_sums(counts, bucket_width, ["n1", "n2"])
    t = F.col("n1") + F.col("n2")
    agg = (
        pre.select(
            "n1",
            "n2",
            (
                F.col("n1")
                * (2 * (F.col("pre_n1") + F.col("pre_n2")) + t + 1)
            ).alias("__r1x2"),
            (t * t * t - t).alias("__ties"),
        )
        .agg(
            F.sum("n1").cast("bigint").alias("t1"),
            F.sum("n2").cast("bigint").alias("t2"),
            F.sum("__r1x2").cast("bigint").alias("R1x2"),
            F.sum("__ties").cast("bigint").alias("T"),
        )
    )
    n1d, n2d = F.col("t1").cast("double"), F.col("t2").cast("double")
    nd = n1d + n2d
    u1x2 = F.col("R1x2") - F.col("t1") * (F.col("t1") + 1)  # 2·U1, exact
    var = (
        n1d
        * n2d
        / F.lit(12.0)
        * ((nd + 1) - F.col("T").cast("double") / (nd * (nd - 1)))
    )
    # var == 0 iff every observation is tied on one value; then U1 is
    # exactly its null mean and z = 0 (no evidence), not a 0/0
    z = F.when(
        var > 0,
        (u1x2.cast("double") / 2.0 - n1d * n2d / 2.0) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col("t1").alias("n1"),
        F.col("t2").alias("n2"),
        u1x2.cast("bigint").alias("u1_x2"),
        F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("z_q"),
        (F.abs(z) >= F.lit(1.96)).alias("significant"),
    )


def chi_square_independence(
    df: DataFrame, row_col: Column, col_col: Column
) -> DataFrame:
    """Exact chi-square independence statistic over a two-way
    categorical contingency (is `lang` independent of `source`? — the
    corpus-composition audit). Cells, row totals, column totals and N
    are exact bigints; each cell's contribution
    (o·N − rt·ct)² / (N·rt·ct) evaluates as a fixed sequence of
    correctly-rounded double ops on exact-integer inputs (every
    intermediate ≤ 2^53 at any plausible category cardinality), then
    quantizes to milli-units BEFORE the final sum so the total is an
    order-independent bigint aggregate.

    Output: 1 row (n, dof, chi2_q, cramers_v_q)."""
    cells = (
        df.select(row_col.alias("r"), col_col.alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rt = cells.groupBy("r").agg(F.sum("o").cast("bigint").alias("rt"))
    ct = cells.groupBy("c").agg(F.sum("o").cast("bigint").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("N"),
        F.countDistinct("r").cast("bigint").alias("nr"),
        F.countDistinct("c").cast("bigint").alias("nc"),
    )
    # the full r × c grid, NOT just observed cells: an absent cell has
    # o = 0 but expectation rt·ct/N > 0 and still contributes — exactly
    # the cells that carry the signal under strong association
    j = (
        rt.crossJoin(ct)
        .join(cells, ["r", "c"], "left")
        .withColumn("o", F.coalesce(F.col("o"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    dev = (F.col("o") * F.col("N") - F.col("rt") * F.col("ct")).cast("double")
    contrib = (
        dev
        * dev
        / (
            F.col("N").cast("double")
            * F.col("rt").cast("double")
            * F.col("ct").cast("double")
        )
    )
    agg = j.select(
        "N",
        "nr",
        "nc",
        F.floor(contrib * F.lit(1e3)).cast("bigint").alias("__cq"),
    ).groupBy("N", "nr", "nc").agg(F.sum("__cq").cast("bigint").alias("__chi2_m"))
    chi2 = F.col("__chi2_m").cast("double") / 1e3
    mindim = F.least(F.col("nr") - 1, F.col("nc") - 1).cast("double")
    return agg.select(
        F.col("N").alias("n"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.col("__chi2_m").alias("chi2_q"),
        F.floor(
            F.sqrt(chi2 / (F.col("N").cast("double") * mindim)) * F.lit(1e6)
        )
        .cast("bigint")
        .alias("cramers_v_q"),
    )


def auc_exact(
    df: DataFrame,
    score_col: Column,
    label_col: Column,
    bucket_width: int = 100,
) -> DataFrame:
    """Exact ROC-AUC with midrank tie handling — the threshold-free
    quality-classifier eval (does the score actually separate positives
    from negatives?). AUC is the probability a random positive outranks
    a random negative, which is exactly the Mann-Whitney statistic:
    AUC = U1 / (n+·n−), so the doubled rank-sum identity from
    ``mann_whitney_u`` gives 2·U1 as pure bigint arithmetic on the
    per-value count table — no per-row ranking pass, no partition-less
    window (same bucketed distributed-prefix machinery).

    Output: 1 row (n_pos, n_neg, auc_q ppm, gini_q ppm)."""
    counts = grouped_value_counts(df, score_col, label_col)
    pre = with_prefix_sums(counts, bucket_width, ["n1", "n2"])
    t = F.col("n1") + F.col("n2")
    agg = pre.select(
        "n1",
        (
            F.col("n1") * (2 * (F.col("pre_n1") + F.col("pre_n2")) + t + 1)
        ).alias("__r1x2"),
        "n2",
    ).agg(
        F.sum("n1").cast("bigint").alias("t1"),
        F.sum("n2").cast("bigint").alias("t2"),
        F.sum("__r1x2").cast("bigint").alias("R1x2"),
    )
    u1x2 = F.col("R1x2") - F.col("t1") * (F.col("t1") + 1)  # 2·U1, exact
    auc = u1x2.cast("double") / (
        F.lit(2.0) * F.col("t1").cast("double") * F.col("t2").cast("double")
    )
    return agg.select(
        F.col("t1").alias("n_pos"),
        F.col("t2").alias("n_neg"),
        F.floor(auc * F.lit(1e6) + F.lit(0.5)).cast("bigint").alias("auc_q"),
        F.floor((F.lit(2.0) * auc - F.lit(1.0)) * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("gini_q"),
    )


def cusum_per_key(
    df: DataFrame,
    key_col: Column,
    order_cols: list[Column],
    value_int: Column,
    slack_num: int = 1,
    slack_den: int = 2,
    threshold: int = 0,
) -> DataFrame:
    """Per-key one-sided CUSUM drift detection over an ordered integer
    series (did this user's / sensor's level shift upward mid-stream?).

    The textbook recursion S_i = max(0, S_{i-1} + d_i) is not a prefix
    sum — but it equals C_i − min(0, min_{j≤i} C_j) for the plain
    cumulative C of the drift terms, so the whole detector is two
    partitioned windows (running sum + running min) over each key's own
    series: distributed across keys, deterministic because everything
    is exact integer arithmetic over a unique total order.

    Drift term: d_i = v_i − (1 + slack_num/slack_den)·mean_k, with
    mean_k the key's own mean (self-normalizing, no global parameter).
    To stay integral the whole series is scaled by den·n_k:
    d_i·den·n = den·n·v_i − (den+num)·S_k, and the final maximum
    rescales by integer division — NO floating-point op exists
    anywhere, so results are bit-identical at any parallelism and in
    any engine. Bound: |terms| ≤ den·n·max(v); with n ≤ 1e6 rows/key
    and v quantized to ≤ 1e9 this stays far inside int64 after the
    per-key prefix sum (document per-key series bounds at ingest).

    Output: one row per key (k, n, max_cusum, detected), max_cusum in
    v units."""
    base = df.select(key_col.alias("k"), value_int.alias("v"), *order_cols)
    oc = [c for c in base.columns if c not in ("k", "v")]
    stats = base.groupBy("k").agg(
        F.sum("v").cast("bigint").alias("__s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    run = W.partitionBy("k").orderBy(*oc).rowsBetween(W.unboundedPreceding, 0)
    j = base.join(stats, "k").withColumn(
        "__d",
        F.lit(slack_den) * F.col("n") * F.col("v")
        - F.lit(slack_den + slack_num) * F.col("__s"),
    )
    c = j.withColumn("__c", F.sum("__d").over(run)).withColumn(
        "__cusum", F.col("__c") - F.least(F.min("__c").over(run), F.lit(0))
    )
    return (
        c.groupBy("k", "n")
        .agg(F.max("__cusum").cast("bigint").alias("__mx"))
        .select(
            "k",
            "n",
            F.expr(f"__mx div ({slack_den} * n)")
            .cast("bigint")
            .alias("max_cusum"),
            (
                F.expr(f"__mx div ({slack_den} * n)") > F.lit(threshold)
            ).alias("detected"),
        )
    )


def trimmed_mean_by(
    df: DataFrame,
    group_col: Column,
    value_int: Column,
    trim_num: int = 10,
    trim_den: int = 100,
    bucket_width: int = 100,
) -> DataFrame:
    """Exact per-group trimmed mean over an integer value domain — the
    robust center a reporting pipeline uses when tails are junk
    (corrupt sensor spikes, test accounts). Trims floor(n·num/den)
    observations from EACH tail per group, exactly.

    NOT a per-row ranking: the group's CDF comes from the grouped
    bucketed prefix-sum machinery (``with_prefix_sums`` with
    group_cols), and each distinct value contributes
    kept = clamp(min(pre+cnt, n−lo) − max(pre, lo)) observations —
    pure count arithmetic on the (group, value, count) table. Handles
    ties across the trim boundary correctly (partial counts), uses no
    partition-less window, no float op anywhere (mean reported as an
    exact integer floor division in value units).

    Output: one row per group (grp, n, n_kept, trimmed_mean, raw_mean).
    """
    counts = (
        df.select(group_col.alias("grp"), value_int.alias("v"))
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pre = with_prefix_sums(counts, bucket_width, ["cnt"], group_cols=["grp"])
    tot = counts.groupBy("grp").agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.sum(F.col("v") * F.col("cnt")).cast("bigint").alias("sv"),
    )
    j = pre.join(tot, "grp").withColumn(
        "__lo", F.expr(f"n * {trim_num} div {trim_den}")
    )
    kept = F.greatest(
        F.least(F.col("pre_cnt") + F.col("cnt"), F.col("n") - F.col("__lo"))
        - F.greatest(F.col("pre_cnt"), F.col("__lo")),
        F.lit(0),
    )
    return (
        j.select(
            "grp",
            "n",
            "sv",
            kept.cast("bigint").alias("__k"),
            (F.col("v") * kept).cast("bigint").alias("__vk"),
        )
        .groupBy("grp", "n", "sv")
        .agg(
            F.sum("__k").cast("bigint").alias("n_kept"),
            F.sum("__vk").cast("bigint").alias("__sum_kept"),
        )
        .select(
            "grp",
            "n",
            "n_kept",
            F.expr("__sum_kept div n_kept").cast("bigint").alias("trimmed_mean"),
            F.expr("sv div n").cast("bigint").alias("raw_mean"),
        )
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: Column,
    value_int: Column,
    quantiles: list[tuple[str, int, int]],
    bucket_width: int = 100,
) -> DataFrame:
    """Exact per-group DISCRETE quantiles (value at rank ⌈n·p⌉) over an
    integer value domain — the count-arithmetic twin of q59's
    interpolated `percentile`: no per-row ranking, no sort of the fact
    table, no float anywhere. Each group's CDF comes from the grouped
    bucketed prefix sums; quantile q's answer is the unique v whose
    count interval (pre, pre+cnt] contains rank ⌈n·num/den⌉, picked by
    one conditional min aggregate per requested quantile — all
    quantiles in ONE pass over the count table.

    ``quantiles``: [(output_name, num, den), ...], p = num/den.
    Output: (grp, n, <name>...) — quantile values in the input's
    integer units."""
    counts = (
        df.select(group_col.alias("grp"), value_int.alias("v"))
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    pre = with_prefix_sums(counts, bucket_width, ["cnt"], group_cols=["grp"])
    tot = counts.groupBy("grp").agg(F.sum("cnt").cast("bigint").alias("n"))
    j = pre.join(tot, "grp")
    aggs = []
    for name, num, den in quantiles:
        r = F.expr(f"(n * {num} + {den} - 1) div {den}")  # ceil(n·p), ≥ 1
        aggs.append(
            F.min(
                F.when(
                    (F.col("pre_cnt") < r) & (r <= F.col("pre_cnt") + F.col("cnt")),
                    F.col("v"),
                )
            )
            .cast("bigint")
            .alias(name)
        )
    return j.groupBy("grp", "n").agg(*aggs)


def grouped_weighted_quantiles(
    df: DataFrame,
    group_col: Column,
    value_int: Column,
    weight_int: Column,
    quantiles: list[tuple[str, int, int]],
    bucket_width: int = 100,
) -> DataFrame:
    """Exact per-group WEIGHTED quantiles: the value at cumulative-
    weight rank ⌈W·p⌉, where each row contributes ``weight_int`` units
    of mass — the token-weighted/quantity-weighted generalization of
    `grouped_quantiles` (which is this with weight 1). Same scale
    shape: per-(group, value) weight sums, bucketed distributed prefix
    sums, one conditional min aggregate per quantile; no corpus-scale
    sort or single-task stage anywhere.

    ``quantiles``: [(output_name, num, den), ...], p = num/den.
    Output: (grp, w_total, <name>...) — values in input integer units.
    """
    counts = (
        df.select(
            group_col.alias("grp"),
            value_int.alias("v"),
            weight_int.cast("bigint").alias("w"),
        )
        .groupBy("grp", "v")
        .agg(F.sum("w").cast("bigint").alias("cnt"))
    )
    pre = with_prefix_sums(counts, bucket_width, ["cnt"], group_cols=["grp"])
    tot = counts.groupBy("grp").agg(
        F.sum("cnt").cast("bigint").alias("w_total")
    )
    j = pre.join(tot, "grp")
    aggs = []
    for name, num, den in quantiles:
        r = F.expr(f"(w_total * {num} + {den} - 1) div {den}")
        aggs.append(
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
    return j.groupBy("grp", "w_total").agg(*aggs)
