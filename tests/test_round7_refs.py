"""Round-7 reference tests: recompute each new operator's math with an
independent Python implementation (driver-side, brute force where the
Spark side blocks/buckets/unrolls) and compare exactly.

The DuckDB oracle is the per-commit differential gate; these tests
guard against SHARED blind spots — a formula mistake mirrored into the
oracle SQL passes the differential but fails here.
"""

from __future__ import annotations

import calendar
import hashlib
import math
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _us(ts):
    return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond


def test_recursive_closure_matches_python(spark, sf_dir):
    got = {
        r["ancestor"]: (r["n_desc"], r["subtree_cents"])
        for r in _rows(spark, sf_dir, "q277_recursive_closure")
    }
    pt = load_tables(spark, sf_dir)["part"].select(
        "p_partkey", "p_retailprice"
    ).collect()
    ref: dict[int, list] = defaultdict(lambda: [0, 0])
    for r in pt:
        k = r["p_partkey"]
        if k < 1:
            continue
        cents = math.floor(r["p_retailprice"] * 100 + 0.5)
        a = k // 10
        while True:
            ref[a][0] += 1
            ref[a][1] += cents
            if a < 1:
                break
            a //= 10
    assert got == {a: tuple(v) for a, v in ref.items()}


def test_twap_matches_python(spark, sf_dir):
    got = {
        r["user_id"]: (r["n_intervals"], r["span_us"], r["twap_q"])
        for r in _rows(spark, sf_dir, "q278_twap")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "value"
    ).collect()
    series: dict[int, list] = defaultdict(list)
    for r in ev:
        series[r["user_id"]].append(
            (_us(r["ts"]), r["event_id"], math.floor(r["value"] * 100 + 0.5))
        )
    ref = {}
    for u, pts in series.items():
        pts.sort()
        ivs = [
            (pts[i][2], pts[i + 1][0] - pts[i][0])
            for i in range(len(pts) - 1)
            if pts[i + 1][0] - pts[i][0] > 0
        ]
        if not ivs:
            continue
        sw = sum(dt for _, dt in ivs)
        sxw = sum(x * dt for x, dt in ivs)
        ref[u] = (len(ivs), sw, sxw // sw)
    assert got == ref


def test_hrw_minimal_movement_property(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q280_hrw_shards")
    by_cfg: dict[str, dict] = defaultdict(dict)
    for r in rows:
        by_cfg[r["cfg"]][r["shard"]] = r["n_keys"]
    n8 = sum(by_cfg["shards8"].values())
    n9 = sum(by_cfg["shards9"].values())
    moved = by_cfg["moved"][-1]
    assert n8 == n9  # every key assigned under both configs
    # shard 8 only exists in the 9-shard config
    assert 8 not in by_cfg["shards8"] and max(by_cfg["shards8"]) <= 7
    # HRW movement == exactly the keys that land on the NEW shard:
    # a key moves iff shard 8's weight beats all of 0-7, and nothing
    # else can change because the old argmax is otherwise unchanged.
    assert moved == by_cfg["shards9"].get(8, 0)
    # expected movement ~ n/9; allow generous tolerance
    assert 0 < moved < n8 / 3


def test_hrw_assignment_matches_python(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q280_hrw_shards")
    got8 = {
        r["shard"]: r["n_keys"] for r in rows if r["cfg"] == "shards8"
    }
    ids = [
        r["doc_id"]
        for r in load_tables(spark, sf_dir)["documents"].select("doc_id").collect()
    ]

    def hrw(k: int, n: int) -> int:
        best = -1
        for s in range(n):
            h = int(hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:8], 16)
            best = max(best, h * 16 + s)
        return best % 16

    ref8 = Counter(hrw(k, 8) for k in ids)
    assert got8 == dict(ref8)


def test_kaplan_meier_matches_python(spark, sf_dir):
    got = [
        (r["day"], r["n_risk"], r["d_events"], r["hazard_ppm"],
         r["cum_loghaz_q"])
        for r in sorted(
            _rows(spark, sf_dir, "q289_kaplan_meier"), key=lambda r: r["day"]
        )
    ]
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_type"
    ).collect()
    t0: dict[int, int] = {}
    tmax = 0
    for r in ev:
        t = _us(r["ts"])
        tmax = max(tmax, t)
        if r["event_type"] == "signup":
            t0[r["user_id"]] = min(t0.get(r["user_id"], t), t)
    tp: dict[int, int] = {}
    for r in ev:
        t = _us(r["ts"])
        u = r["user_id"]
        if r["event_type"] == "purchase" and u in t0 and t >= t0[u]:
            tp[u] = min(tp.get(u, t), t)
    hist: dict[int, list] = defaultdict(lambda: [0, 0])
    for u, s in t0.items():
        if u in tp:
            d = (tp[u] - s) // 86_400_000_000
            hist[d][0] += 1
            hist[d][1] += 1
        else:
            d = (tmax - s) // 86_400_000_000
            hist[d][0] += 1
    days = sorted(hist)
    total = sum(v[0] for v in hist.values())
    ref = []
    cum = 0
    seen = 0
    for d in days:
        n_at, d_ev = hist[d]
        n_risk = total - seen
        seen += n_at
        if d_ev > 0 and n_risk > d_ev:
            cum += math.floor(math.log((n_risk - d_ev) / n_risk) * 1_000_000)
            ref.append((d, n_risk, d_ev, d_ev * 1_000_000 // n_risk, cum))
    assert got == ref


def test_vopt_histogram_matches_python_dp(spark, sf_dir):
    row = _rows(spark, sf_dir, "q294_vopt_histogram")[0]
    em = load_tables(spark, sf_dir)["embeddings"].select("embedding").collect()
    f = [0] * 64
    for r in em:
        b = max(0, min(63, math.floor((float(r["embedding"][0]) + 2.0) * 16)))
        f[b] += 1

    def cost(i, j):
        s1 = sum(f[i : j + 1])
        s2 = sum(v * v for v in f[i : j + 1])
        return s2 - s1 * s1 // (j - i + 1)

    # exact DP, k=4 segments over 64 bins, same packed argmin tie-break
    INF = float("inf")
    dp = [[INF] * 64 for _ in range(5)]
    arg = [[-1] * 64 for _ in range(5)]
    for j in range(64):
        dp[1][j] = cost(0, j)
    for k in range(2, 5):
        for j in range(k - 1, 64):
            best = None
            for i in range(k - 2, j):
                cand = (dp[k - 1][i] + cost(i + 1, j)) * 100 + i
                if best is None or cand < best:
                    best = cand
            dp[k][j] = best // 100
            arg[k][j] = best % 100
    b3 = arg[4][63]
    b2 = arg[3][b3]
    b1 = arg[2][b2]
    assert (
        row["total_cost_q"],
        row["b1"],
        row["b2"],
        row["b3"],
    ) == (dp[4][63], b1, b2, b3)


def test_weighted_median_matches_python(spark, sf_dir):
    got = {
        r["grp"]: (r["w_total"], r["p25"], r["p50"], r["p75"])
        for r in _rows(spark, sf_dir, "q290_weighted_median")
    }
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    acc: dict[str, Counter] = defaultdict(Counter)
    for r in li:
        v = math.floor(r["l_extendedprice"] * 100 + 0.5)
        w = math.floor(r["l_quantity"] + 0.5)
        acc[r["l_returnflag"]][v] += w
    ref = {}
    for g, c in acc.items():
        wt = sum(c.values())
        qs = []
        for num, den in ((1, 4), (1, 2), (3, 4)):
            r_ = (wt * num + den - 1) // den
            cum = 0
            for v in sorted(c):
                cum += c[v]
                if cum >= r_:
                    qs.append(v)
                    break
        ref[g] = (wt, *qs)
    assert got == ref


def test_markov_removal_base_exceeds_removed(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q285_markov_removal")
    assert len(rows) == 4  # click/view/error/signup
    for r in rows:
        # deleting transitions can only LOSE absorption mass
        assert 0 <= r["p_removed_ppm"] <= r["p_base_ppm"]
        assert 0 <= r["removal_ppm"] <= 1_000_000


def test_cohens_kappa_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q320_cohens_kappa")[0]
    docs = load_tables(spark, sf_dir)["documents"].select(
        "n_chars", "text"
    ).collect()
    pairs = []
    for r in docs:
        ra = 2 if r["n_chars"] >= 450 else (1 if r["n_chars"] >= 250 else 0)
        sc = len(r["text"]) - len(r["text"].replace(" ", ""))
        rb = 2 if sc >= 70 else (1 if sc >= 38 else 0)
        pairs.append((ra, rb))
    n = len(pairs)
    agree = sum(1 for a, b in pairs if a == b)
    na = Counter(a for a, _ in pairs)
    nb = Counter(b for _, b in pairs)
    s = sum(na[c] * nb[c] for c in set(na) | set(nb))
    assert (row["n"], row["agree"]) == (n, agree)
    assert row["po_ppm"] == agree * 1_000_000 // n
    # remainder-split spelling (round-8 precision fix): s = q*n + r
    q, r_ = divmod(s, n)
    assert row["pe_ppm"] == (q * 1_000_000 + r_ * 1_000_000 // n) // n
    assert row["kappa_ppm"] == (
        (agree - q) * 1_000_000 - r_ * 1_000_000 // n
    ) // max(n - q, 1)


def test_mcnemar_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q321_mcnemar")[0]
    docs = load_tables(spark, sf_dir)["documents"].select(
        "text", "lang", "n_chars"
    ).collect()
    br = b = c = bw = 0
    for r in docs:
        y = 1 if " the " in r["text"] else 0
        p1 = 1 if r["lang"] == "en" else 0
        p2 = 1 if r["n_chars"] >= 300 else 0
        if p1 == y and p2 == y:
            br += 1
        elif p1 == y:
            b += 1
        elif p2 == y:
            c += 1
        else:
            bw += 1
    assert (row["both_right"], row["b"], row["c"], row["both_wrong"]) == (
        br, b, c, bw,
    )
    assert row["chi2_milli"] == (b - c) * (b - c) * 1000 // max(b + c, 1)


def test_brier_decomposition_matches_python(spark, sf_dir):
    got = {
        r["bin"]: (
            r["n_k"], r["p_pm"], r["ybar_k_pm"], r["rel_contrib"],
            r["res_contrib"],
        )
        for r in _rows(spark, sf_dir, "q322_brier_decomposition")
    }
    docs = load_tables(spark, sf_dir)["documents"].select(
        "n_chars", "text"
    ).collect()
    g: dict[int, list] = defaultdict(lambda: [0, 0])
    for r in docs:
        k = min(r["n_chars"] // 60, 9)
        g[k][0] += 1
        g[k][1] += 1 if " the " in r["text"] else 0
    ybar_pm = sum(v[1] for v in g.values()) * 1000 // sum(
        v[0] for v in g.values()
    )
    ref = {}
    for k, (n_k, y_k) in g.items():
        p_pm = (2 * k + 1) * 50
        yk_pm = y_k * 1000 // n_k
        ref[k] = (
            n_k, p_pm, yk_pm,
            n_k * (p_pm - yk_pm) ** 2,
            n_k * (yk_pm - ybar_pm) ** 2,
        )
    assert got == ref


def test_assortativity_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q323_assortativity")[0]
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_partkey", "l_suppkey"
    ).collect()
    ps = {(r["l_partkey"], r["l_suppkey"]) for r in li}
    pd_ = Counter(p for p, _ in ps)
    sd = Counter(s for _, s in ps)
    xs, ys = [], []
    for p, s in ps:
        xs += [pd_[p], sd[s]]
        ys += [sd[s], pd_[p]]
    m2 = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    ref = (m2 * sxy - sx * sy) / math.sqrt(
        (m2 * sxx - sx * sx) * (m2 * syy - sy * sy)
    )
    assert (row["m2"], row["sx"], row["sxy"]) == (m2, sx, sxy)
    assert abs(row["assortativity"] - ref) < 1e-6


def test_bloom_fpp_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q325_bloom_fpp_audit")[0]
    t = load_tables(spark, sf_dir)
    members = {r["o_custkey"] for r in t["orders"].select("o_custkey").collect()}
    probes = [
        r["c_custkey"] + 10_000_000
        for r in t["customer"].select("c_custkey").collect()
    ]

    def pos(key):
        h = hashlib.md5(str(key).encode()).hexdigest()
        return int(h[:8], 16) % 65536, int(h[8:16], 16) % 65536

    bits = set()
    for k in members:
        p1, p2 = pos(k)
        bits.update((p1, p2))
    n_fp = sum(1 for k in probes if pos(k)[0] in bits and pos(k)[1] in bits)
    ones = len(bits)
    assert (row["n_members"], row["ones_bits"]) == (len(members), ones)
    assert (row["n_probes"], row["n_fp"]) == (len(probes), n_fp)
    assert row["fp_ppm_measured"] == n_fp * 1_000_000 // len(probes)
    t_pm = ones * 1000 // 65536
    assert row["fp_ppm_theory"] == t_pm * t_pm


def test_binary_changepoint_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (
            r["split_hour"], r["gain_q"], r["mean_left_milli"],
            r["mean_right_milli"],
        )
        for r in _rows(spark, sf_dir, "q327_binary_changepoint")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    series: dict[str, Counter] = defaultdict(Counter)
    for r in ev:
        series[r["event_type"]][r["ts"].replace(
            minute=0, second=0, microsecond=0
        )] += 1
    ref = {}
    for et, cnt in series.items():
        hrs = sorted(cnt)
        ys = [cnt[h] for h in hrs]
        tot, n = sum(ys), len(ys)
        best = None
        pre = 0
        for i in range(1, n):
            pre += ys[i - 1]
            gain = pre * pre * 1000 // i + (tot - pre) ** 2 * 1000 // (n - i)
            cand = (-gain, hrs[i - 1])
            if best is None or cand < best:
                best = cand
                ref[et] = (
                    hrs[i - 1], gain, pre * 1000 // i,
                    (tot - pre) * 1000 // (n - i),
                )
    assert got == ref


def test_seasonal_mad_matches_python(spark, sf_dir):
    got = {
        (r["event_type"], r["hr"]): (r["y"], r["med2"], r["dev2"], r["mad4"])
        for r in _rows(spark, sf_dir, "q329_seasonal_mad_anomalies")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    cnt: dict[tuple, int] = Counter()
    for r in ev:
        cnt[(r["event_type"], r["ts"].replace(
            minute=0, second=0, microsecond=0
        ))] += 1
    cohort: dict[tuple, list] = defaultdict(list)
    for (et, hr), y in cnt.items():
        cohort[(et, hr.hour)].append((hr, y))

    def med2x(vals):
        v = sorted(vals)
        n = len(v)
        if n % 2 == 0:
            return v[n // 2 - 1] + v[n // 2]
        return 2 * v[n // 2]

    ref = {}
    for (et, hod), pairs in cohort.items():
        m2 = med2x([y for _, y in pairs])
        mad4 = med2x([abs(2 * y - m2) for _, y in pairs])
        for hr, y in pairs:
            d2 = abs(2 * y - m2)
            if 2 * d2 > 3 * mad4:
                ref[(et, hr)] = (y, m2, d2, mad4)
    assert got == ref


def test_wilson_ctr_matches_python(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q331_wilson_ctr")
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    agg: dict[int, list] = defaultdict(lambda: [0, 0])
    for r in ev:
        if r["event_type"] == "click":
            agg[r["ts"].hour][0] += 1
        elif r["event_type"] == "view":
            agg[r["ts"].hour][1] += 1
    for r in rows:
        clicks, views = agg[r["hod"]]
        n = clicks + views
        assert (r["clicks"], r["views"]) == (clicks, views)
        assert r["rate_ppm"] == clicks * 1_000_000 // n
        ph = clicks / n
        for sign, col in ((-1, "wilson_lb"), (1, "wilson_ub")):
            ref = (
                ph + 1.9208 / n
                + sign * 1.96 * math.sqrt(ph * (1 - ph) / n + 0.9604 / (n * n))
            ) / (1 + 3.8416 / n)
            assert abs(r[col] - ref) < 1e-6
