"""Unit checks for the distributed rank/CDF statistics operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from tytodb_spark.operators.stats import (
    chi_square_independence,
    ks_test,
    mann_whitney_u,
    with_prefix_sums,
)


def test_prefix_sums_exclusive_and_partition_invariant(spark):
    df = spark.createDataFrame(
        [(v, 1, 2) for v in range(250)], "v long, n1 long, n2 long"
    )
    out = {
        r["v"]: (r["pre_n1"], r["pre_n2"])
        for r in with_prefix_sums(df, 100, ["n1", "n2"]).collect()
    }
    assert out[0] == (0, 0)
    assert out[99] == (99, 198)     # within first bucket
    assert out[100] == (100, 200)   # first row of second bucket
    assert out[249] == (249, 498)
    out8 = {
        r["v"]: (r["pre_n1"], r["pre_n2"])
        for r in with_prefix_sums(
            df.repartition(8), 100, ["n1", "n2"]
        ).collect()
    }
    assert out8 == out


def test_ks_identical_vs_shifted(spark):
    # block parity for the group flag: both groups see the full 0..99
    # value cycle -> identical empirical distributions, D = 0
    same = spark.createDataFrame(
        [(i, i % 100, (i // 100) % 2) for i in range(2000)],
        "id long, v long, g int",
    )
    r = ks_test(same, F.col("v"), F.col("g")).collect()[0]
    assert r["ks_q"] == 0 and not r["significant"]
    shifted = spark.createDataFrame(
        [
            (i, i % 100 + (100 if (i // 100) % 2 else 0), (i // 100) % 2)
            for i in range(2000)
        ],
        "id long, v long, g int",
    )
    r2 = ks_test(shifted, F.col("v"), F.col("g")).collect()[0]
    # disjoint supports -> D = 1 exactly
    assert r2["ks_q"] == 1_000_000 and r2["significant"]


def test_mann_whitney_known_small_case(spark):
    # group1 = {1,2,3}, group2 = {4,5,6}: R1 = 6, U1 = 0, 2*U1 = 0
    df = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 0), (5, 0), (6, 0)], "v long, g int"
    )
    r = mann_whitney_u(df, F.col("v"), F.col("g")).collect()[0]
    assert (r["n1"], r["n2"], r["u1_x2"]) == (3, 3, 0)
    # complete separation, n=3+3: z = -1.964 -> borderline significant
    assert r["z_q"] < -1_900_000
    # tie-heavy case: all values equal -> z = 0 via midranks, U1 = n1*n2/2
    ties = spark.createDataFrame(
        [(7, i % 2) for i in range(40)], "v long, g int"
    )
    rt = mann_whitney_u(ties, F.col("v"), F.col("g")).collect()[0]
    assert rt["u1_x2"] == 2 * (20 * 20 // 2)


def test_chi_square_independent_uniform_is_zero(spark):
    # perfectly independent 2x2 with equal margins: chi2 = 0
    rows = [("a", "x")] * 25 + [("a", "y")] * 25 + [("b", "x")] * 25 + [("b", "y")] * 25
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, F.col("r"), F.col("c")).collect()[0]
    assert out["n"] == 100 and out["dof"] == 1
    assert out["chi2_q"] == 0 and out["cramers_v_q"] == 0
    # perfect association: chi2 = n
    rows2 = [("a", "x")] * 50 + [("b", "y")] * 50
    out2 = chi_square_independence(
        spark.createDataFrame(rows2, "r string, c string"),
        F.col("r"),
        F.col("c"),
    ).collect()[0]
    assert out2["chi2_q"] == 100 * 1000  # chi2 = n, milli-units
    assert out2["cramers_v_q"] == 1_000_000


def test_ks_and_mw_match_numpy_reference_on_random_data(spark):
    """Exact-arithmetic cross-check against an independent pure-numpy
    implementation on seeded random datasets (ties included)."""
    import numpy as np

    for seed in (7, 42, 1234):
        rng = np.random.default_rng(seed)
        a = rng.integers(0, 60, size=400)           # heavy ties
        b = rng.integers(10, 70, size=300)
        rows = [(int(v), 1) for v in a] + [(int(v), 0) for v in b]
        df = spark.createDataFrame(rows, "v long, g int")

        # numpy KS: D = max |F1 - F2| over the pooled support
        vals = np.unique(np.concatenate([a, b]))
        f1 = np.searchsorted(np.sort(a), vals, side="right") / len(a)
        f2 = np.searchsorted(np.sort(b), vals, side="right") / len(b)
        d_ref = np.abs(f1 - f2).max()
        r = ks_test(df, F.col("v"), F.col("g"), bucket_width=16).collect()[0]
        assert r["ks_q"] == int(np.floor(d_ref * 1e6 + 1e-9)), (seed, d_ref)

        # numpy Mann-Whitney with midranks: U1 = R1 - n1(n1+1)/2
        pooled = np.concatenate([a, b])
        order = np.argsort(pooled, kind="mergesort")
        ranks = np.empty(len(pooled))
        sorted_vals = pooled[order]
        i = 0
        while i < len(sorted_vals):
            j = i
            while j < len(sorted_vals) and sorted_vals[j] == sorted_vals[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0  # midrank, 1-based avg
            i = j
        r1 = ranks[: len(a)].sum()
        u1x2_ref = int(round(2 * r1)) - len(a) * (len(a) + 1)
        m = mann_whitney_u(df, F.col("v"), F.col("g"), bucket_width=16).collect()[0]
        assert m["u1_x2"] == u1x2_ref, (seed, m["u1_x2"], u1x2_ref)


def test_ks_empty_input_one_null_row(spark):
    # operator/oracle row-shape parity on empty input: the SQL oracle's
    # global max emits one row of NULLs; the operator must match, not
    # return zero rows
    df = spark.createDataFrame([], "v long, g int")
    rows = ks_test(df, F.col("v"), F.col("g")).collect()
    assert len(rows) == 1
    assert rows[0]["ks_q"] is None and rows[0]["n1"] is None


def test_auc_matches_numpy_reference(spark):
    """auc_exact vs an independent midrank-AUC reference on random
    data with heavy ties."""
    import numpy as np

    from tytodb_spark.operators.stats import auc_exact

    rng = np.random.default_rng(7)
    v = rng.integers(0, 40, size=3000)
    y = (v + rng.integers(0, 25, size=3000) > 30).astype(int)  # correlated
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(v, y)], "v long, y int"
    )
    r = auc_exact(df, F.col("v"), F.col("y"), bucket_width=8).collect()[0]

    # numpy reference: midrank AUC = (R1 - n1(n1+1)/2) / (n1 n2)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v), dtype=float)
    sv = v[order]
    i = 0
    pos = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = int(y.sum()), int((1 - y).sum())
    r1 = float(ranks[y == 1].sum())
    auc = (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n2)
    assert (r["n_pos"], r["n_neg"]) == (n1, n2)
    assert abs(r["auc_q"] - round(auc * 1e6)) <= 1
    assert abs(r["gini_q"] - round((2 * auc - 1) * 1e6)) <= 2
    # sanity: a correlated score must separate better than chance
    assert r["auc_q"] > 600_000


def test_cusum_matches_direct_recursion(spark):
    """cusum_per_key's prefix-sum/running-min identity vs the textbook
    max(0, S+d) recursion computed directly in Python."""
    import numpy as np

    from tytodb_spark.operators.stats import cusum_per_key

    rng = np.random.default_rng(11)
    rows = []
    for k in range(20):
        n = int(rng.integers(5, 60))
        drift_at = n // 2 if k % 3 == 0 else None
        for i in range(n):
            v = int(rng.integers(100, 200))
            if drift_at is not None and i >= drift_at:
                v += 400  # upward shift the detector must flag
            rows.append((k, i, v))
    df = spark.createDataFrame(rows, "k long, i long, v long")
    got = {
        r["k"]: r
        for r in cusum_per_key(
            df, F.col("k"), [F.col("i")], F.col("v"), 1, 2, threshold=30
        ).collect()
    }
    import collections

    series = collections.defaultdict(list)
    for k, i, v in rows:
        series[k].append((i, v))
    for k, sv in series.items():
        sv.sort()
        vals = [v for _, v in sv]
        n, s = len(vals), sum(vals)
        cur = 0
        mx = 0
        for v in vals:
            d = 2 * n * v - 3 * s  # scaled drift term
            cur = max(0, cur + d)
            mx = max(mx, cur)
        expect = mx // (2 * n)
        assert got[k]["max_cusum"] == expect, k
        assert got[k]["detected"] == (expect > 30), k
        assert got[k]["n"] == n
    # drifted keys must actually be detected
    assert all(got[k]["detected"] for k in range(0, 20, 3))


def test_trimmed_mean_matches_numpy(spark):
    """trimmed_mean_by (count-arithmetic CDF trim) vs direct numpy
    sort-and-slice on tie-heavy groups."""
    import numpy as np

    from tytodb_spark.operators.stats import trimmed_mean_by

    rng = np.random.default_rng(3)
    rows = []
    for g in ("a", "b", "c"):
        vals = rng.integers(-50, 50, size=int(rng.integers(40, 200)))
        rows += [(g, int(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["grp"]: r
        for r in trimmed_mean_by(
            df, F.col("g"), F.col("v"), 10, 100, bucket_width=16
        ).collect()
    }
    import collections

    by = collections.defaultdict(list)
    for g, v in rows:
        by[g].append(v)
    for g, vals in by.items():
        vals.sort()
        n = len(vals)
        lo = n * 10 // 100
        kept = vals[lo : n - lo]
        assert got[g]["n"] == n
        assert got[g]["n_kept"] == len(kept)
        # Spark `div` truncates toward zero; match with int() on the quotient
        assert got[g]["trimmed_mean"] == int(sum(kept) / len(kept)) if sum(kept) < 0 else sum(kept) // len(kept)
        assert got[g]["raw_mean"] == (int(sum(vals) / n) if sum(vals) < 0 else sum(vals) // n)


def test_rolling_autocorr_matches_numpy(spark, sf_dir):
    """q223's windowed-sum Pearson spelling vs direct numpy corrcoef
    over explicit trailing-24 slices of one user's cent series."""
    import math

    import numpy as np

    from tytodb_spark.queries import REGISTRY

    got = {
        (r["user_id"], r["event_id"]): r["r_q"]
        for r in REGISTRY["q223_rolling_autocorr"].fn(spark, sf_dir).collect()
    }
    from tytodb_spark.catalog import load_tables

    ev = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "user_id",
            "event_id",
            "cast(floor(value * 100 + 0.5) as bigint) as cents",
            "unix_micros(ts) as us",
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r)
    checked = 0
    for uid, rows in sorted(by_user.items())[:5]:
        rows.sort(key=lambda r: (r["us"], r["event_id"]))
        xs = [r["cents"] for r in rows]
        for i in range(1, len(rows)):
            # pairs (x_j, x_{j-1}) for the trailing 24 lag-pairs ending at i
            lo = max(1, i - 23)
            pairs = [(xs[j], xs[j - 1]) for j in range(lo, i + 1)]
            key = (uid, rows[i]["event_id"])
            if len(pairs) < 24:
                assert key not in got
                continue
            x = np.array([p[0] for p in pairs], dtype=float)
            y = np.array([p[1] for p in pairs], dtype=float)
            if x.std() == 0 or y.std() == 0:
                assert key not in got
                continue
            r_ref = float(np.corrcoef(x, y)[0, 1])
            assert key in got
            assert abs(got[key] - math.floor(r_ref * 1e6 + 0.5)) <= 1, key
            checked += 1
    assert checked > 50


def test_decay_attribution_conserves_value(spark, sf_dir):
    """Each conversion's credited cents must sum to its value_cents
    minus at most one truncated cent per touch (bigint div floor)."""
    from tytodb_spark.queries import REGISTRY

    rows = REGISTRY["q219_decay_attribution"].fn(spark, sf_dir).collect()
    assert {r["event_type"] for r in rows} == {"click", "view"}
    total_credit = sum(r["credit_cents"] for r in rows)
    n_touches = sum(r["n_touches"] for r in rows)
    # conversions with >=1 touch, and their value, straight from the data
    from tytodb_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    conv = ev.filter("event_type = 'purchase'").selectExpr(
        "event_id as conv_id",
        "user_id",
        "unix_micros(ts) as conv_us",
        "cast(floor(value * 100 + 0.5) as bigint) as val_cents",
    )
    touch = ev.filter("event_type in ('click', 'view')").selectExpr(
        "user_id", "unix_micros(ts) as touch_us"
    )
    attributed = (
        conv.join(touch, "user_id")
        .filter(
            "touch_us <= conv_us and conv_us - touch_us < 604800000000"
        )
        .groupBy("conv_id")
        .agg(F.first("val_cents").alias("val_cents"))
        .agg(F.sum("val_cents").alias("s"))
        .collect()[0]["s"]
    )
    assert total_credit <= attributed
    assert total_credit >= attributed - n_touches


def test_benford_counts_are_complete(spark, sf_dir):
    """q220: all nine digits present; observed counts cover every
    positive-cent event; expected_milli totals within truncation."""
    from tytodb_spark.queries import REGISTRY

    rows = REGISTRY["q220_benford_digits"].fn(spark, sf_dir).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    from tytodb_spark.catalog import load_tables

    ev = load_tables(spark, sf_dir)["events"]
    n = ev.filter("floor(value * 100 + 0.5) >= 1").count()
    assert sum(r["obs"] for r in rows) == n
    exp_total = sum(r["expected_milli"] for r in rows)
    assert n * 1000 - 9000 <= exp_total <= n * 1000


def test_percent_rank_dist_matches_spark_window(spark, sf_dir):
    """q225's bucketed-prefix-sum percent_rank/cume_dist vs Spark's own
    percent_rank()/cume_dist() window functions (per distinct value):
    the distributed spelling must reproduce the classic one exactly."""
    from pyspark.sql import Window

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        (r["event_type"], r["v"]): (r["pr_ppm"], r["cd_ppm"])
        for r in REGISTRY["q225_percent_rank_dist"].fn(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir)["events"].selectExpr(
        "event_type", "cast(floor(value * 100 + 0.5) as bigint) as v"
    )
    w = Window.partitionBy("event_type").orderBy("v")
    ref = (
        ev.select(
            "event_type",
            "v",
            F.percent_rank().over(w).alias("pr"),
            F.cume_dist().over(w).alias("cd"),
        )
        .groupBy("event_type", "v")
        .agg(F.min("pr").alias("pr"), F.min("cd").alias("cd"))
        .collect()
    )
    assert len(ref) == len(got)
    for r in ref:
        pr_ppm, cd_ppm = got[(r["event_type"], r["v"])]
        # integer truncating div vs float: agree within 1 ppm
        assert abs(pr_ppm - r["pr"] * 1e6) < 1 + 1e-6
        assert abs(cd_ppm - r["cd"] * 1e6) < 1 + 1e-6


def test_asof_nearest_matches_brute_force(spark, sf_dir):
    """q226 vs per-user brute-force nearest-purchase search in Python."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["event_id"]: (r["purchase_id"], r["dt_us"])
        for r in REGISTRY["q226_asof_nearest"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_tables(spark, sf_dir)["events"]
        .filter("event_type in ('click', 'purchase')")
        .selectExpr(
            "event_id", "user_id", "event_type", "unix_micros(ts) as t"
        )
        .collect()
    )
    TOL = 86400000000
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    n_checked = 0
    for _uid, urows in by_user.items():
        purchases = [r for r in urows if r["event_type"] == "purchase"]
        for c in urows:
            if c["event_type"] != "purchase":
                # brute force: nearest purchase by |dt| within tolerance;
                # ties -> backward (dt <= 0), then q226's carry-group
                # pick: among equal-|dt| SAME-direction candidates the
                # backward winner is the latest-traversed purchase
                # (largest event_id), the forward winner the smallest
                best = None
                for p in purchases:
                    dt = p["t"] - c["t"]  # >0 forward, <=0 backward
                    if abs(dt) >= TOL:
                        continue
                    pid_rank = p["event_id"] if dt > 0 else -p["event_id"]
                    key = (abs(dt), dt > 0, pid_rank)
                    if best is None or key < best[0]:
                        best = (key, p["event_id"], dt)
                if best is None:
                    assert c["event_id"] not in got
                else:
                    pid, dt = got[c["event_id"]]
                    assert dt == best[2], c["event_id"]
                    assert pid == best[1], c["event_id"]
                    n_checked += 1
    assert n_checked > 50


def test_anova_f_matches_numpy(spark, sf_dir):
    """q232's quantized decomposition vs direct numpy one-way ANOVA."""
    import numpy as np

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    row = REGISTRY["q232_anova_f"].fn(spark, sf_dir).collect()[0]
    ev = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "event_type", "cast(floor(value * 100 + 0.5) as bigint) as v"
        )
        .collect()
    )
    groups: dict[str, list[int]] = {}
    for r in ev:
        groups.setdefault(r["event_type"], []).append(r["v"])
    arrs = [np.array(g, dtype=float) for g in groups.values()]
    nn = sum(len(a) for a in arrs)
    k = len(arrs)
    grand = sum(a.sum() for a in arrs) / nn
    ssb = sum(len(a) * (a.mean() - grand) ** 2 for a in arrs)
    ssw = sum(((a - a.mean()) ** 2).sum() for a in arrs)
    f = (ssb / (k - 1)) / (ssw / (nn - k))
    assert row["n_groups"] == k and row["n"] == nn
    # per-group quantization at x1000 loses < k/1000 on each SS
    assert abs(row["ssb_x1000"] / 1000 - ssb) < 1
    assert abs(row["ssw_x1000"] / 1000 - ssw) < 1
    assert abs(row["f_milli"] / 1000 - f) < 0.01


def test_gini_matches_numpy(spark, sf_dir):
    """q233 vs the direct sorted rank-weighted Gini on user totals."""
    import numpy as np

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    row = REGISTRY["q233_gini_concentration"].fn(spark, sf_dir).collect()[0]
    u = (
        load_tables(spark, sf_dir)["events"]
        .filter("event_type = 'purchase'")
        .selectExpr(
            "user_id", "cast(floor(value * 100 + 0.5) as bigint) as v"
        )
        .groupBy("user_id")
        .agg(F.sum("v").alias("t"))
        .collect()
    )
    x = np.sort(np.array([r["t"] for r in u], dtype=float))
    n = len(x)
    g = (2 * np.sum(np.arange(1, n + 1) * x) - (n + 1) * x.sum()) / (
        n * x.sum()
    )
    assert row["n_users"] == n
    assert row["total_cents"] == int(x.sum())
    assert abs(row["gini_ppm"] / 1e6 - g) < 1e-6


def test_source_fingerprint_tracks_exact_jaccard(spark, sf_dir):
    """q234's 64-hash MinHash estimate vs exact per-pair trigram
    Jaccard computed with Python sets (64 hashes -> se ~ 0.06; assert
    within 0.25 everywhere)."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.operators.textual import word_ngrams
    from tytodb_spark.queries import REGISTRY

    got = {
        (r["s1"], r["s2"]): r["jaccard_est_ppm"] / 1e6
        for r in REGISTRY["q234_source_fingerprint_matrix"]
        .fn(spark, sf_dir)
        .collect()
    }
    rows = (
        load_tables(spark, sf_dir)["documents"]
        .select(
            "source",
            F.explode(F.array_distinct(word_ngrams(F.col("text"), 3))).alias(
                "g"
            ),
        )
        .collect()
    )
    sets: dict[str, set] = {}
    for r in rows:
        sets.setdefault(r["source"], set()).add(r["g"])
    srcs = sorted(sets)
    n_pairs = 0
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            exact = len(sets[s1] & sets[s2]) / len(sets[s1] | sets[s2])
            assert abs(got[(s1, s2)] - exact) <= 0.25, (s1, s2, exact)
            n_pairs += 1
    assert n_pairs == len(got) == len(srcs) * (len(srcs) - 1) // 2


def test_wau_rolling_matches_python(spark, sf_dir):
    """q235's explode-vote WAU vs a direct per-day distinct scan."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["day"]: r["wau"]
        for r in REGISTRY["q235_wau_rolling"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr("user_id", "date_trunc('day', ts) as day")
        .distinct()
        .collect()
    )
    days = sorted({r["day"] for r in rows})
    import datetime as dt

    for d in days:
        active = {
            r["user_id"]
            for r in rows
            if dt.timedelta(0) <= d - r["day"] <= dt.timedelta(days=6)
        }
        assert got[d] == len(active), d
    assert len(got) == len(days)


def test_conversion_latency_matches_python(spark, sf_dir):
    """q236's CDF quantiles vs sorted ceil-rank picks in Python."""
    import math

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    row = REGISTRY["q236_conversion_latency"].fn(spark, sf_dir).collect()[0]
    f = (
        load_tables(spark, sf_dir)["events"]
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.unix_micros("ts"))
            ).alias("fv"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.unix_micros("ts")
                )
            ).alias("fb"),
        )
        .collect()
    )
    lats = sorted(
        (r["fb"] - r["fv"]) // 60000000
        for r in f
        if r["fv"] is not None and r["fb"] is not None and r["fb"] >= r["fv"]
    )
    n = len(lats)
    assert row["n"] == n
    for name, pct in [("p50_min", 50), ("p90_min", 90), ("p99_min", 99)]:
        assert row[name] == lats[math.ceil(n * pct / 100) - 1], name


def test_mix_entropy_matches_numpy(spark, sf_dir):
    """q237 vs direct Shannon entropy of each lang's source mix."""
    import math

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["lang"]: r
        for r in REGISTRY["q237_mix_entropy"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_tables(spark, sf_dir)["documents"]
        .groupBy("lang", "source")
        .count()
        .collect()
    )
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["count"])
    for lang, counts in by_lang.items():
        nt = sum(counts)
        h = sum(c / nt * math.log(nt / c) for c in counts)
        g = got[lang]
        assert g["n_sources"] == len(counts)
        assert g["n_docs"] == nt
        assert abs(g["entropy_u"] / 1e6 - h) < 1e-4
        assert abs(g["effective_sources_milli"] / 1e3 - math.exp(h)) < 0.01


def test_silhouette_matches_numpy(spark, sf_dir):
    """q239 vs direct numpy simplified silhouette in the same
    quantized-integer domain."""
    import numpy as np

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["label"]: r
        for r in REGISTRY["q239_silhouette"].fn(spark, sf_dir).collect()
    }
    rows = load_tables(spark, sf_dir)["embeddings"].collect()
    X = np.array(
        [np.floor(np.array(r["embedding"], dtype=np.float64) * 1e6) for r in rows]
    ).astype(np.int64)
    y = np.array([r["label"] for r in rows])
    labels = sorted(set(y.tolist()))
    cents = {}
    for lb in labels:
        sub = X[y == lb]
        # truncating integer mean, matching both engines' `sum div n`
        s = sub.sum(axis=0)
        n = len(sub)
        cents[lb] = np.where(s >= 0, s // n, -((-s) // n))
    per_label_sum = {lb: [] for lb in labels}
    for i in range(len(X)):
        dd = {lb: int(((X[i] - cents[lb]) ** 2).sum()) for lb in labels}
        a2 = dd[y[i]]
        b2 = min(v for lb, v in dd.items() if lb != y[i])
        if a2 == 0 and b2 == 0:
            continue
        import math

        sa, sb = math.sqrt(a2), math.sqrt(b2)
        s_ppm = math.floor((sb - sa) / max(sa, sb) * 1e6 + 0.5)
        per_label_sum[y[i]].append(s_ppm)
    for lb in labels:
        vals = per_label_sum[lb]
        g = got[lb]
        assert g["n"] == len(vals)
        tot = sum(vals)
        exp = tot // len(vals) if tot >= 0 else -((-tot) // len(vals))
        # Spark/DuckDB `div` truncates toward zero; python // floors
        exp_trunc = int(tot / len(vals))
        assert g["mean_s_ppm"] in (exp, exp_trunc)


def test_correlogram_matches_numpy(spark, sf_dir):
    """q240 vs numpy corrcoef of the hourly series at a few lags."""
    import math

    import numpy as np

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        (r["event_type"], r["lag"]): (r["n_pairs"], r["r_q"])
        for r in REGISTRY["q240_correlogram"].fn(spark, sf_dir).collect()
    }
    rows = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "event_type",
            "unix_micros(date_trunc('hour', ts)) div 3600000000 as idx",
        )
        .groupBy("event_type", "idx")
        .count()
        .collect()
    )
    series: dict[str, dict[int, int]] = {}
    for r in rows:
        series.setdefault(r["event_type"], {})[r["idx"]] = r["count"]
    n_checked = 0
    for et, sv in series.items():
        for lag in (1, 6, 24):
            pairs = [
                (v, sv[i + lag]) for i, v in sv.items() if i + lag in sv
            ]
            if len(pairs) < 3:
                continue
            x = np.array([p[0] for p in pairs], dtype=float)
            yv = np.array([p[1] for p in pairs], dtype=float)
            if x.std() == 0 or yv.std() == 0:
                assert (et, lag) not in got
                continue
            r_ref = float(np.corrcoef(x, yv)[0, 1])
            n, rq = got[(et, lag)]
            assert n == len(pairs)
            assert abs(rq - math.floor(r_ref * 1e6 + 0.5)) <= 1, (et, lag)
            n_checked += 1
    assert n_checked >= 10


def test_adamic_adar_matches_brute_force(spark, sf_dir):
    """q222 vs a direct Python recomputation of degree-capped AA from
    the distinct (part, supplier) edge list."""
    import math
    from itertools import combinations

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = [
        (r["s1"], r["s2"], r["n_shared"], r["aa_q"])
        for r in REGISTRY["q222_adamic_adar"].fn(spark, sf_dir).collect()
    ]
    ps = (
        load_tables(spark, sf_dir)["lineitem"]
        .selectExpr("l_partkey as part", "l_suppkey as supp")
        .distinct()
        .collect()
    )
    by_part: dict[int, set] = {}
    for r in ps:
        by_part.setdefault(r["part"], set()).add(r["supp"])
    scores: dict[tuple, list[int]] = {}
    for _part, supps in by_part.items():
        d = len(supps)
        if not (2 <= d <= 32):
            continue
        w = math.floor(1e6 / math.log(d) + 0.5)
        for a, b in combinations(sorted(supps), 2):
            scores.setdefault((a, b), [0, 0])
            scores[(a, b)][0] += 1
            scores[(a, b)][1] += w
    ref = sorted(
        ((v[1], k[0], k[1], v[0]) for k, v in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:100]
    assert [(s1, s2, n, aa) for aa, s1, s2, n in ref] == [
        (s1, s2, n, aa) for s1, s2, n, aa in got
    ]


def test_mi_feature_rank_matches_numpy(spark, sf_dir):
    """q227's per-cell-quantized MI vs direct numpy MI per feature."""
    import math

    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["feature"]: r
        for r in REGISTRY["q227_mi_feature_rank"].fn(spark, sf_dir).collect()
    }
    ev = (
        load_tables(spark, sf_dir)["events"]
        .selectExpr(
            "event_type",
            "hour(ts) as hour",
            "user_id % 16 as user16",
            "cast(floor(value * 100 + 0.5) as bigint) div 5000 as vbin",
        )
        .collect()
    )
    for feat in ("hour", "user16", "vbin"):
        cells: dict[tuple, int] = {}
        bx: dict[int, int] = {}
        by: dict[str, int] = {}
        for r in ev:
            k = (r[feat], r["event_type"])
            cells[k] = cells.get(k, 0) + 1
            bx[r[feat]] = bx.get(r[feat], 0) + 1
            by[r["event_type"]] = by.get(r["event_type"], 0) + 1
        n = len(ev)
        mi = sum(
            c / n * math.log(c * n / (bx[k[0]] * by[k[1]]))
            for k, c in cells.items()
        )
        g = got[feat]
        assert g["n_cells"] == len(cells)
        # per-cell 1e-6 quantization of the log ratio
        assert abs(g["mi_ppm"] / 1e6 - mi) < 1e-4, feat


def test_encoding_advisor_matches_pandas(spark, sf_dir):
    """q224's ndv / run / width stats vs a direct pandas recomputation
    of the same sharded-order definition."""
    from tytodb_spark.catalog import load_tables
    from tytodb_spark.queries import REGISTRY

    got = {
        r["col"]: r
        for r in REGISTRY["q224_encoding_advisor"].fn(spark, sf_dir).collect()
    }
    li = (
        load_tables(spark, sf_dir)["lineitem"]
        .selectExpr(
            "l_orderkey div 1024 as shard",
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            "cast(l_orderkey as string) as s_orderkey",
            "cast(l_partkey as string) as s_partkey",
            "cast(l_suppkey as string) as s_suppkey",
            "cast(cast(floor(l_quantity) as bigint) as string) as s_quantity",
        )
        .toPandas()
    )
    cols = {
        "l_returnflag": "l_returnflag",
        "l_linestatus": "l_linestatus",
        "l_orderkey": "s_orderkey",
        "l_partkey": "s_partkey",
        "l_suppkey": "s_suppkey",
        "l_quantity": "s_quantity",
    }
    for name, src in cols.items():
        sub = li[["shard", "l_orderkey", "l_linenumber", src]].copy()
        sub = sub.sort_values(["shard", "l_orderkey", "l_linenumber", src])
        runs = 0
        for _shard, grp in sub.groupby("shard", sort=False):
            vals = grp[src].tolist()
            runs += 1 + sum(
                1 for i in range(1, len(vals)) if vals[i] != vals[i - 1]
            )
        g = got[name]
        assert g["n"] == len(sub)
        assert g["ndv"] == sub[src].nunique()
        assert g["runs"] == runs, name
        assert g["avg_len_x100"] == (
            sub[src].str.len().sum() * 100
        ) // len(sub)
