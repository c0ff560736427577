"""Data-quality / validation operators (Deequ-style): column profiling,
constraint suites with PASS/FAIL verdicts, and referential-integrity
audits. A training-data pipeline runs these as gates between stages —
cheap aggregates whose cost is one scan regardless of how many
constraints share it.

Everything is built-in expressions; constraint evaluation composes into
ONE aggregate per table (Catalyst collapses the shared scan), so adding
a constraint adds a column, not a pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_width_histogram(
    df: DataFrame, col: str, lo: float, hi: float, bins: int = 10
) -> DataFrame:
    """Fixed-width histogram of a numeric column over [lo, hi): one
    map-side bin assignment + one count shuffle on `bins` keys. Bounds
    are caller-supplied (profile metadata / table stats) so the plan is
    a single pass; out-of-range rows clamp into the edge bins, and
    every bin appears in the output (zero-count bins included) so
    downstream diffing of two profiles is positional.

    Output: (bin, lo, hi, cnt) with exact integer counts.
    """
    spark = df.sparkSession
    width = (hi - lo) / bins
    raw = F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width))
    bin_id = F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1)).cast("int")
    counts = (
        df.filter(F.col(col).isNotNull())
        .select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    edges = spark.range(bins).select(
        F.col("id").cast("int").alias("bin"),
        (F.lit(lo) + F.col("id") * F.lit(width)).alias("lo"),
        (F.lit(lo) + (F.col("id") + 1) * F.lit(width)).alias("hi"),
    )
    return (
        edges.join(counts, "bin", "left")
        .select("bin", "lo", "hi", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("cnt"))
    )


def check_constraints(
    df: DataFrame, checks: dict[str, Column]
) -> DataFrame:
    """Evaluate named row-level constraints in ONE aggregate pass:
    each check is a boolean Column; the result reports violations and a
    verdict per check. Long output format so suites diff/union across
    tables.

    Output: (check, n_rows, n_violations, passed).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")] + [
        F.sum((~c).cast("bigint")).cast("bigint").alias(f"__v_{name}")
        for name, c in checks.items()
    ]
    # ONE aggregate row, then explode per-check structs from it — a
    # union of per-check selects would re-execute the aggregate (and
    # its scan) once per constraint (verified by plan audit)
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col("__n").alias("n_rows"),
                F.coalesce(F.col(f"__v_{name}"), F.lit(0)).alias("n_violations"),
                (F.coalesce(F.col(f"__v_{name}"), F.lit(0)) == 0).alias("passed"),
            )
            for name in checks
        ]
    )
    return row.select(F.explode(entries).alias("e")).select(
        "e.check", "e.n_rows", "e.n_violations", "e.passed"
    )


def referential_integrity(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """FK audit: count child rows whose key has no parent (orphans).
    Plan: ONE pass over the child — a left OUTER join against the
    distinct parent keys (broadcast while they fit) feeds a single
    aggregate computing both the row count and the orphan count (a
    separate count + anti-join pair would scan the child twice; plan
    audit). The child ships only its key column.
    Output: 1 row (n_child, n_orphans, passed)."""
    probe = child.select(F.col(child_key).alias("__k")).join(
        parent.select(F.col(parent_key).alias("__k"))
        .distinct()
        .withColumn("__hit", F.lit(True)),
        "__k",
        "left",
    )
    return probe.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_child"),
        F.sum(F.col("__hit").isNull().cast("bigint")).cast("bigint").alias("n_orphans"),
    ).select(
        "n_child", "n_orphans", (F.col("n_orphans") == 0).alias("passed")
    )


def exact_corr(
    df: DataFrame, group_cols: list[str], x: str, y: str
) -> DataFrame:
    """Per-group Pearson correlation + population covariance computed
    from EXACT decimal component sums (n, Sx, Sy, Sxx, Syy, Sxy) — the
    profiling stat pairs (does length predict price? quality predict
    dup rate?) without the float-summation-order nondeterminism of the
    built-in corr()/covar_pop() (their double accumulators differ
    across partitionings and engines). One map-side-combinable
    aggregate; the float math happens ONCE on exact inputs, so results
    are bit-stable at any parallelism.

    Output: (group_cols..., n, corr, covar_pop), both rounded to 6.
    """
    dx = F.col(x).cast("decimal(18,2)")
    dy = F.col(y).cast("decimal(18,2)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).cast("decimal(38,4)").alias("sx"),
        F.sum(dy).cast("decimal(38,4)").alias("sy"),
        F.sum((dx * dx).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxx"),
        F.sum((dy * dy).cast("decimal(38,4)")).cast("decimal(38,4)").alias("syy"),
        F.sum((dx * dy).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxy"),
    )
    n = F.col("n").cast("double")
    num = n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    denx = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    deny = n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double")
    return agg.select(
        *group_cols,
        F.col("n"),
        F.round(num / F.sqrt(denx * deny), 6).alias("corr"),
        F.round(num / (n * n), 6).alias("covar_pop"),
    )


def ols_fit(
    df: DataFrame, group_cols: list[str], x: str, y: str
) -> DataFrame:
    """Per-group simple linear regression (y = slope·x + intercept) fit
    from the same EXACT decimal sufficient statistics as exact_corr —
    the distributed closed-form OLS: one map-side-combinable aggregate
    carries (n, Sx, Sy, Sxx, Syy, Sxy) and the fit happens once per
    group on exact inputs, so slope/intercept/R² are bit-stable at any
    parallelism. This is how a 100 TB profile fits trends (bytes vs
    tokens, price vs quantity) without MLlib or a second pass; the
    shuffle carries six numbers per group, never rows.

    Output: (group_cols..., n, slope, intercept, r2), rounded to 6.
    """
    dx = F.col(x).cast("decimal(18,2)")
    dy = F.col(y).cast("decimal(18,2)")
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dx).cast("decimal(38,4)").alias("sx"),
        F.sum(dy).cast("decimal(38,4)").alias("sy"),
        F.sum((dx * dx).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxx"),
        F.sum((dy * dy).cast("decimal(38,4)")).cast("decimal(38,4)").alias("syy"),
        F.sum((dx * dy).cast("decimal(38,4)")).cast("decimal(38,4)").alias("sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    denx = n * F.col("sxx").cast("double") - sx * sx
    deny = n * F.col("syy").cast("double") - sy * sy
    slope = num / denx
    return agg.select(
        *group_cols,
        F.col("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((num * num) / (denx * deny), 6).alias("r2"),
    )


def key_skew_report(df: DataFrame, key: str, top_n: int = 5) -> DataFrame:
    """Join/shuffle-key skew diagnostics — the measurement that decides
    whether a key needs salting (q58) or AQE skew handling before a
    100 TB join: per-key counts, then the `top_n` heaviest keys with
    their corpus share and ratio-to-mean, all in EXACT integer math
    (share_q = ⌊cnt·1e6/total⌋ ppm; ratio_q = ⌊cnt·n_keys·1e6/total⌋ =
    cnt/mean in ppm) so the report hash-checks in any engine.

    Plan: one count aggregate on the key (map-side combinable), a
    two-phase distributed top-k over the per-key counts (never a global
    sort), and a broadcast 1-row totals join. Output:
    (key, cnt, rank, share_q, ratio_to_mean_q).
    """
    from tytodb_spark.operators.similarity import topk_per_key  # noqa: PLC0415

    counts = df.groupBy(key).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").cast("bigint").alias("__total"),
        F.count(F.lit(1)).cast("bigint").alias("__n_keys"),
    )
    top = topk_per_key(
        counts.withColumn("__g", F.lit(1)),
        "__g",
        [F.col("cnt").desc(), F.col(key)],
        top_n,
    ).drop("__g")
    return top.crossJoin(F.broadcast(totals)).select(
        key,
        "cnt",
        F.col("rank").cast("int").alias("rank"),
        F.floor(F.col("cnt") * F.lit(1_000_000) / F.col("__total"))
        .cast("bigint")
        .alias("share_q"),
        F.floor(F.col("cnt") * F.col("__n_keys") * F.lit(1_000_000) / F.col("__total"))
        .cast("bigint")
        .alias("ratio_to_mean_q"),
    )
