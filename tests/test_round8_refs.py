"""Round-8 reference tests: recompute each new formula operator with an
independent Python implementation and compare exactly (or to float
tolerance where the query rounds doubles).

The DuckDB oracle is the per-commit differential gate; these tests
guard against SHARED blind spots — a formula mistake mirrored into the
oracle SQL passes the differential but fails here. Where the registry
query uses a closed-form identity, the reference here deliberately
re-derives the answer a DIFFERENT way:

- q351 isotonic: true sequential PAV pooling (stack of blocks with
  exact rational means) vs the query's max-min span identity.
- q365 Kruskal-Wallis: explicit sorted midranks vs the prefix-sum
  doubling trick.
- q367 Friedman: per-block sorted midranks + the textbook tie-corrected
  statistic vs the closed-form 2*rank arithmetic.
- q372 Granger: numpy lstsq residual sums vs the centered
  normal-equation algebra.
- q347 BH-FDR: erfc-based p-values and a bisection inverse normal vs
  the build-time AS241 threshold spine.
- q376 Haar: an actual pairwise-averaging wavelet cascade vs the
  one-shot block-sum spelling.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from fractions import Fraction

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def _phi(z: float) -> float:
    """Standard normal CDF via erfc — independent of AS241 inv_cdf."""
    return 0.5 * math.erfc(-z / math.sqrt(2.0))


def _inv_phi_upper(tail: float) -> float:
    """z with 1 - Phi(z) = tail, by bisection on the erfc-based CDF."""
    lo, hi = 0.0, 40.0
    for _ in range(200):
        mid = (lo + hi) / 2.0
        if 1.0 - _phi(mid) > tail:
            lo = mid
        else:
            hi = mid
    return (lo + hi) / 2.0


def _user_rollup(spark, sf_dir):
    """Shared q349/q364 user rollup: (n_ev, treated/x, any high-value
    purchase y, purchase cents) per user, plus the activity stratum."""
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "value"
    ).collect()
    acc: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for r in ev:
        a = acc[r["user_id"]]
        a[0] += 1
        if r["event_type"] == "error":
            a[1] += 1
        if r["event_type"] == "purchase":
            a[3] += math.floor(r["value"] * 100 + 0.5)
            if r["value"] >= 50.0:
                a[2] += 1
    nu = len(acc)
    te = sum(a[0] for a in acc.values())
    out = []
    for _, (n_ev, n_err, n_hi, cents) in acc.items():
        stratum = min(n_ev * 4 * nu // te, 7)
        treated = 1 if n_err * 5 > n_ev else 0
        out.append((stratum, treated, 1 if n_hi > 0 else 0, cents))
    return out


def test_bh_fdr_matches_python(spark, sf_dir):
    got = {
        (r["event_type"], r["hr"]): (
            r["n"], r["s"], r["az_milli"], r["rk"], r["rejected"]
        )
        for r in _rows(spark, sf_dir, "q347_bh_fdr")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts", "value"
    ).collect()
    cells: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] in ("click", "view", "signup", "purchase", "error"):
            c = cells[(r["event_type"], r["ts"].hour)]
            c[0] += 1
            if r["value"] >= 50.0:
                c[1] += 1
    nn = sum(v[0] for v in cells.values())
    ss = sum(v[1] for v in cells.values())
    p0 = ss / nn
    az = {
        k: math.floor(
            abs((s / n - p0) / math.sqrt(p0 * (1.0 - p0) / n)) * 1000
        )
        for k, (n, s) in cells.items()
    }
    order = sorted(cells, key=lambda k: (-az[k], k[0], k[1]))
    rk = {k: i + 1 for i, k in enumerate(order)}
    m = len(cells)
    assert m == 120  # 5 stages x 24 hours, the designed grid
    thr = {
        k: math.floor(_inv_phi_upper(0.05 * k / (2.0 * m)) * 1000)
        for k in range(1, m + 1)
    }
    ks = max((rk[k] for k in cells if az[k] >= thr[rk[k]]), default=0)
    ref = {
        k: (cells[k][0], cells[k][1], az[k], rk[k], rk[k] <= ks)
        for k in cells
    }
    assert got == ref


def test_stratified_ate_matches_python(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q349_stratified_ate")
    users = _user_rollup(spark, sf_dir)
    g: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for stratum, treated, _, cents in users:
        a = g[stratum]
        a[0] += 1
        a[1] += treated
        if treated:
            a[2] += cents
        else:
            a[3] += cents
    ref = {}
    nv = wsum = tt = tc = 0
    for s_, (n_users, n_tr, st, sc) in g.items():
        n_co = n_users - n_tr
        diff = (
            st * 1_000_000 // n_tr - sc * 1_000_000 // n_co
            if n_tr > 0 and n_co > 0
            else None
        )
        ref[s_] = (n_users, n_tr, n_co, diff)
        if diff is not None:
            nv += n_users
            wsum += n_users * diff
            tt += n_tr
            tc += n_co
    sign = 1 if wsum >= 0 else -1
    ref[-1] = (nv, tt, tc, sign * (abs(wsum) // nv))
    got = {
        r["stratum"]: (
            r["n_users"], r["n_treated"], r["n_control"], r["diff_micro"]
        )
        for r in rows
    }
    assert got == ref


def test_isotonic_matches_python_pav(spark, sf_dir):
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["rate_ppm"], r["iso_ppm"])
        for r in _rows(spark, sf_dir, "q351_isotonic_calibration")
    }
    docs = load_tables(spark, sf_dir)["documents"].select(
        "n_chars", "text"
    ).collect()
    bins: dict[int, list] = defaultdict(lambda: [0, 0])
    for r in docs:
        b = min(r["n_chars"] // 30, 19)
        bins[b][0] += 1
        bins[b][1] += 1 if " the " in r["text"] else 0
    # true sequential PAV: pool adjacent violators with exact rational
    # block means, then quantize the fitted value per bin to ppm
    order = sorted(bins)
    stack: list[list] = []  # [count, pos, n_bins]
    for b in order:
        c, s = bins[b]
        stack.append([c, s, 1])
        while len(stack) >= 2 and (
            Fraction(stack[-2][1], stack[-2][0])
            >= Fraction(stack[-1][1], stack[-1][0])
        ):
            c2, s2, k2 = stack.pop()
            stack[-1][0] += c2
            stack[-1][1] += s2
            stack[-1][2] += k2
    iso = {}
    i = 0
    for c, s, k in stack:
        for _ in range(k):
            iso[order[i]] = s * 1_000_000 // c
            i += 1
    ref = {
        b: (c, s, s * 1_000_000 // c, iso[b])
        for b, (c, s) in bins.items()
    }
    assert got == ref


def test_hill_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q354_hill_tail_index")[0]
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    ).collect()
    xs = sorted(
        (
            math.floor(r["l_extendedprice"] * 100 + 0.5),
            r["l_orderkey"],
            r["l_linenumber"],
        )
        for r in li
    )
    top = [v for v, _, _ in xs[-101:]][::-1]
    xk = min(top)
    logs = [
        math.floor(math.log(v / xk) * 1_000_000) for v in top if v > xk
    ]
    hill = sum(logs) // len(logs)
    assert (row["k_used"], row["x_ref_cents"]) == (len(logs), xk)
    assert row["hill_micro"] == hill
    assert row["alpha_micro"] == 1_000_000_000_000 // hill


def test_delta_method_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (
            r["n_users"], r["ratio_cents"], r["se_cents"],
            r["ci_lo"], r["ci_hi"],
        )
        for r in _rows(spark, sf_dir, "q358_ratio_delta_method")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "user_id", "value"
    ).collect()
    per: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in ev:
        a = per[(r["event_type"], r["user_id"])]
        a[0] += math.floor(r["value"] * 100 + 0.5)
        a[1] += 1
    by_et: dict[str, list] = defaultdict(list)
    for (et, _), (x, y) in per.items():
        by_et[et].append((x, y))
    assert set(got) == set(by_et)
    for et, pts in by_et.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        r_ = sx / sy
        vxx = (sum(x * x for x, _ in pts) - sx * sx / n) / (n - 1)
        vyy = (sum(y * y for _, y in pts) - sy * sy / n) / (n - 1)
        vxy = (sum(x * y for x, y in pts) - sx * sy / n) / (n - 1)
        se = math.sqrt((vxx - 2 * r_ * vxy + r_ * r_ * vyy) / n) / (sy / n)
        gn, gr, gs, glo, ghi = got[et]
        assert gn == n
        for gv, rv in (
            (gr, r_), (gs, se), (glo, r_ - 1.96 * se), (ghi, r_ + 1.96 * se),
        ):
            assert math.isclose(gv, rv, rel_tol=1e-8, abs_tol=1e-5)


def test_mantel_haenszel_matches_python(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q364_mantel_haenszel")
    users = _user_rollup(spark, sf_dir)
    g: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for stratum, x, y, _ in users:
        g[stratum][(1 - x) * 2 + (1 - y)] += 1  # a,b,c,d order
    ref = {}
    num = den = None  # sum over an empty frame is NULL in both engines
    for s_, (a, b, c, d) in g.items():
        n_i = a + b + c + d
        ref[s_] = (
            a, b, c, d,
            a * d * 1_000_000 // (b * c) if b * c > 0 else None,
        )
        if a * d > 0 or b * c > 0:
            num = (num or 0) + a * d * 1_000_000 // n_i
            den = (den or 0) + b * c * 1_000_000 // n_i
    ref[-1] = (
        num, den, 0, 0,
        num * 1_000_000 // den if den else None,
    )
    got = {
        r["stratum"]: (r["a"], r["b"], r["c"], r["d"], r["or_micro"])
        for r in rows
    }
    assert got == ref


def test_kruskal_wallis_matches_python_ranks(spark, sf_dir):
    row = _rows(spark, sf_dir, "q365_kruskal_wallis")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "value"
    ).collect()
    groups = ["click", "view", "signup", "purchase", "error"]
    obs = [
        (math.floor(r["value"] * 100), r["event_type"])
        for r in ev
        if r["event_type"] in groups
    ]
    # explicit midranks by sorting (independent of the doubling trick)
    obs.sort(key=lambda t: t[0])
    n = len(obs)
    rank_sum: Counter = Counter()
    ties = 0
    i = 0
    while i < n:
        j = i
        while j < n and obs[j][0] == obs[i][0]:
            j += 1
        t = j - i
        mid = (i + 1 + j) / 2.0  # average of ranks i+1..j
        for k in range(i, j):
            rank_sum[obs[k][1]] += mid
        ties += t * t * t - t
        i = j
    m = Counter(g for _, g in obs)
    h = (
        12.0 / (n * (n + 1.0))
        * sum(rank_sum[g] ** 2 / m[g] for g in groups)
        - 3.0 * (n + 1.0)
    ) / (1.0 - ties / (float(n) ** 3 - n))
    assert row["n"] == n
    assert math.isclose(row["h_stat"], h, rel_tol=1e-8, abs_tol=1e-5)
    assert row["significant"] == (h >= 9.488)


def test_cumulative_gains_matches_python(spark, sf_dir):
    got = {
        r["score_band"]: (
            r["cum_users"], r["cum_pos"], r["share_users_ppm"],
            r["recall_ppm"], r["lift_milli"],
        )
        for r in _rows(spark, sf_dir, "q366_cumulative_gains")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "value"
    ).collect()
    acc: dict[int, list] = defaultdict(lambda: [0, 0])
    for r in ev:
        acc[r["user_id"]][0] += 1
        if r["event_type"] == "purchase" and r["value"] >= 50.0:
            acc[r["user_id"]][1] += 1
    band: dict[int, list] = defaultdict(lambda: [0, 0])
    for n_ev, hi in acc.values():
        b = n_ev // 5
        band[b][0] += 1
        band[b][1] += 1 if hi > 0 else 0
    nu = sum(v[0] for v in band.values())
    np_ = sum(v[1] for v in band.values())
    ref = {}
    cu = cp = 0
    for b in sorted(band, reverse=True):
        cu += band[b][0]
        cp += band[b][1]
        ref[b] = (
            cu, cp,
            cu * 1_000_000 // nu,
            cp * 1_000_000 // np_,
            cp * nu * 1000 // (np_ * cu),
        )
    assert got == ref


def test_friedman_matches_python_ranks(spark, sf_dir):
    row = _rows(spark, sf_dir, "q367_friedman_test")[0]
    docs = load_tables(spark, sf_dir)["documents"].select(
        "n_chars", "text"
    ).collect()
    stop = {"the", "a", "and", "of", "to"}
    k = 3
    n = 0
    rank_tot = [0.0] * k
    ss = 0.0
    for r in docs:
        toks = _toks(r["text"])
        scores = [
            r["n_chars"],
            len(toks),
            10 * sum(1 for t in toks if t in stop),
        ]
        # textbook midranks within the block, by sorting
        ranks = []
        for j in range(k):
            less = sum(1 for o in scores if o < scores[j])
            tied = sum(1 for o in scores if o == scores[j])
            ranks.append(less + (tied + 1) / 2.0)
        n += 1
        for j in range(k):
            rank_tot[j] += ranks[j]
            ss += ranks[j] ** 2
    num = (k - 1) * sum((rj - n * (k + 1) / 2.0) ** 2 for rj in rank_tot)
    chi = num / (ss - n * k * (k + 1.0) ** 2 / 4.0)
    assert row["n"] == n
    assert math.isclose(row["chi2_f"], chi, rel_tol=1e-8, abs_tol=1e-5)
    assert row["significant"] == (chi >= 5.991)


def test_pca_power_iteration_matches_python(spark, sf_dir):
    got = {
        r["dim"]: r["loading_milli"]
        for r in _rows(spark, sf_dir, "q370_pca_power_iteration")
    }
    em = load_tables(spark, sf_dir)["embeddings"].select(
        "embedding"
    ).collect()
    xq = [
        [math.floor(float(x) * 10000) for x in r["embedding"][:64]]
        for r in em
    ]
    v = [1000] * 64
    for _ in range(4):
        y = [0] * 64
        for rowq in xq:
            d = sum(rowq[j] * v[j] for j in range(64))
            for j in range(64):
                y[j] += rowq[j] * d
        mx = max(abs(val) for val in y)
        v = [
            (1 if y[j] >= 0 else -1) * (abs(y[j]) * 1000 // mx)
            for j in range(64)
        ]
    assert got == {j + 1: v[j] for j in range(64)}


def test_conditional_entropy_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q371_conditional_entropy")[0]
    docs = load_tables(spark, sf_dir)["documents"].select("text").collect()
    bi: Counter = Counter()
    for r in docs:
        s = _toks(r["text"])
        for g1, g2 in zip(s, s[1:]):
            bi[(g1, g2)] += 1

    def qsum(counts):
        return sum(
            math.floor(c * math.log2(c) * 1e6 + 0.5) for c in counts
        )

    tb = sum(bi.values())
    sb = qsum(bi.values())
    ctx: Counter = Counter()
    for (g1, _), c in bi.items():
        ctx[g1] += c
    sc = qsum(ctx.values())
    lg_tb = math.floor(math.log2(tb) * 1e6 + 0.5)
    assert (row["n_bigrams"], row["h_bigram_micro"]) == (tb, lg_tb - sb // tb)
    assert row["h_context_micro"] == lg_tb - sc // tb
    assert row["h_cond_micro"] == (sc - sb) // tb


def test_granger_matches_python_lstsq(spark, sf_dir):
    import numpy as np

    row = _rows(spark, sf_dir, "q372_granger_lagged")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    cnt: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        hr = r["ts"].replace(minute=0, second=0, microsecond=0)
        c = cnt[hr]  # every hour with ANY event is a series point
        if r["event_type"] == "purchase":
            c[0] += 1
        elif r["event_type"] == "click":
            c[1] += 1
    hours = sorted(cnt)
    pairs = []
    import datetime

    one = datetime.timedelta(hours=1)
    for hr in hours:
        if hr - one in cnt:
            y, _ = cnt[hr]
            yl, xl = cnt[hr - one]
            pairs.append((y, yl, xl))
    y = np.array([p[0] for p in pairs], dtype=float)
    yl = np.array([p[1] for p in pairs], dtype=float)
    xl = np.array([p[2] for p in pairs], dtype=float)
    n = len(pairs)

    def rss(design):
        beta, *_ = np.linalg.lstsq(design, y, rcond=None)
        res = y - design @ beta
        return float(res @ res)

    ones = np.ones(n)
    rss_r = rss(np.column_stack([ones, yl]))
    rss_u = rss(np.column_stack([ones, yl, xl]))
    f = (rss_r - rss_u) / (rss_u / (n - 3.0))
    assert row["n_pairs"] == n
    assert math.isclose(row["rss_restricted"], rss_r, rel_tol=1e-7, abs_tol=1e-4)
    assert math.isclose(row["rss_unrestricted"], rss_u, rel_tol=1e-7, abs_tol=1e-4)
    assert math.isclose(row["f_stat"], f, rel_tol=1e-6, abs_tol=1e-4)
    assert row["significant"] == (f >= 3.86)


def test_dtw_matches_python_full_dp(spark, sf_dir):
    row = _rows(spark, sf_dir, "q373_dtw_alignment")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    da: Counter = Counter()
    db: Counter = Counter()
    for r in ev:
        if r["event_type"] == "purchase":
            da[r["ts"].day] += 1
        elif r["event_type"] == "click":
            db[r["ts"].day] += 1
    a = [da[d] for d in sorted(da)]
    b = [db[d] for d in sorted(db)]
    n, m = len(a), len(b)
    # full O(nm) DP grid, no wavefront, no sentinel arithmetic
    inf = float("inf")
    dp = [[inf] * (m + 1) for _ in range(n + 1)]
    dp[0][0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            dp[i][j] = abs(a[i - 1] - b[j - 1]) + min(
                dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1]
            )
    dtw = int(dp[n][m])
    assert (row["n_a"], row["n_b"]) == (n, m)
    assert row["dtw_dist"] == dtw
    assert row["dtw_per_step_milli"] == dtw * 1000 // (n + m)


def test_viterbi_matches_python_single_fold(spark, sf_dir):
    """Single lifetime-fold replay — also proves the registry's
    day-chunked max-plus composition equals the unchunked decode."""
    got = {
        r["final_state"]: (r["n_users"], r["sum_score_micro"])
        for r in _rows(spark, sf_dir, "q362_viterbi_decode")
    }
    from tytodb_spark.queries import _viterbi_params

    p = _viterbi_params()

    def lnq(x: float) -> int:
        return math.floor(math.log(x) * 1e6)

    e0 = {"purchase": lnq(0.3), "click": lnq(0.3), "view": lnq(0.3),
          "error": lnq(0.05), "signup": lnq(0.05)}
    e1 = {"purchase": lnq(0.05), "click": lnq(0.15), "view": lnq(0.2),
          "error": lnq(0.5), "signup": lnq(0.1)}
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    import calendar

    seqs: dict[int, list] = defaultdict(list)
    for r in ev:
        tsu = (
            calendar.timegm(r["ts"].timetuple()) * 1_000_000
            + r["ts"].microsecond
        )
        seqs[r["user_id"]].append((tsu, r["event_id"], r["event_type"]))
    ref: dict[int, list] = defaultdict(lambda: [0, 0])
    for pts in seqs.values():
        pts.sort()
        v0, v1 = e0[pts[0][2]], e1[pts[0][2]]
        for _, _, et in pts[1:]:
            v0, v1 = (
                max(v0 + p["t00"], v1 + p["t10"]) + e0[et],
                max(v0 + p["t01"], v1 + p["t11"]) + e1[et],
            )
        s = 0 if v0 >= v1 else 1
        ref[s][0] += 1
        ref[s][1] += max(v0, v1)
    assert got == {s: tuple(v) for s, v in ref.items()}


def test_wasserstein1_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q375_wasserstein1")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "value"
    ).collect()
    ca: Counter = Counter()
    cb: Counter = Counter()
    for r in ev:
        b = math.floor(r["value"] * 100 + 0.5) // 12
        if r["event_type"] == "click":
            ca[b] += 1
        elif r["event_type"] == "view":
            cb[b] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    # CDF gap summed as exact fractions over the fixed grid, then one
    # quantization at the end — independent of the cross-product form
    fa = fb = 0
    gap = Fraction(0)
    for b in range(4085):
        fa += ca[b]
        fb += cb[b]
        gap += abs(Fraction(fa, na) - Fraction(fb, nb))
    w1 = (gap * 12 * 1000).numerator // (gap * 12 * 1000).denominator
    assert (row["n_click"], row["n_view"]) == (na, nb)
    assert row["w1_millicents"] == w1


def test_haar_energy_matches_python_transform(spark, sf_dir):
    got = {
        r["level"]: (r["n_coeffs"], r["energy"])
        for r in _rows(spark, sf_dir, "q376_haar_energy")
    }
    ev = load_tables(spark, sf_dir)["events"].select("ts").collect()
    y = [0] * 512
    for r in ev:
        t = (r["ts"].day - 1) * 24 + r["ts"].hour
        if t < 512:
            y[t] += 1
    # actual cascade: smooth = pairwise block sums; detail at level k =
    # difference of adjacent level-(k-1) smooth coefficients
    ref = {}
    smooth = y
    for k in range(1, 6):
        detail = [
            smooth[2 * i] - smooth[2 * i + 1] for i in range(len(smooth) // 2)
        ]
        smooth = [
            smooth[2 * i] + smooth[2 * i + 1] for i in range(len(smooth) // 2)
        ]
        ref[k] = (len(detail), sum(c * c for c in detail))
    assert got == ref
