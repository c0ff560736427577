"""Round-9c reference tests: independent pure-Python replicas of the
survival-inference / concentration / control-chart / pipeline batch
(q417-q426). Different derivations than both engine spellings:

- q417 log-rank: textbook FLOAT expectation/variance sums (asserts the
  engines' staged nano-division truncation stays within tolerance).
- q418 Qini: float curve from raw per-customer dicts.
- q419 Gini: direct double-loop Lorenz over band lists.
- q420 HHI: float shares squared (asserts ppm quantization bound).
- q421 Benford: str(x)[0] first digit (vs the engines' case chain) and
  math.log10 expectations (vs build-time literals).
- q422 skip-gram: per-doc token-list window loop, hashlib md5.
- q423 CvM: float ECDFs on the same grid.
- q424 EWMA: the actual RECURRENCE e_t = 0.5 y_t + 0.5 e_{t-1} (vs the
  engines' closed form) — equality is exact because lambda is dyadic.
- q425 Mahalanobis: numpy-free 2x2 inverse on float moments.
- q426 CUSUM: the actual recursion max(0, s + dev) (vs the engines'
  running-extremum identity).
"""

from __future__ import annotations

import datetime
import hashlib
import math
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY, _BENFORD_P_MICRO

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _arm_lifetimes(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    seg = {
        r["c_custkey"]: 1 if r["c_mktsegment"] == "BUILDING" else 0
        for r in t["customer"].collect()
    }
    first, last = {}, {}
    for r in t["orders"].select("o_custkey", "o_orderdate").collect():
        k, d = r["o_custkey"], r["o_orderdate"]
        if k not in first or d < first[k]:
            first[k] = d
        if k not in last or d > last[k]:
            last[k] = d
    cut = datetime.datetime(2001, 1, 1)
    return [
        (seg[k], (last[k] - first[k]).days // 28, last[k] < cut)
        for k in first
    ]


def test_logrank_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q417_logrank_test")[0]
    lives = _arm_lifetimes(spark, sf_dir)
    buckets = defaultdict(lambda: [0, 0, 0, 0])  # t -> c1, d1, c0, d0
    for arm, t, died in lives:
        b = buckets[t]
        if arm == 1:
            b[0] += 1
            b[1] += int(died)
        else:
            b[2] += 1
            b[3] += int(died)
    ts = sorted(buckets)
    tot1 = sum(b[0] for b in buckets.values())
    tot0 = sum(b[2] for b in buckets.values())
    o1 = e1 = v = 0.0
    seen1 = seen0 = 0
    for t in ts:
        c1, d1, c0, d0 = buckets[t]
        n1, n0 = tot1 - seen1, tot0 - seen0
        seen1 += c1
        seen0 += c0
        d, n = d1 + d0, n1 + n0
        if d == 0 or n <= 1:
            continue
        o1 += d1
        e1 += d * n1 / n
        v += d * (n1 / n) * (n0 / n) * (n - d) / (n - 1)
    assert row["o1"] == o1
    # staged nano-division truncates <=2 units per bucket term
    assert abs(row["e1_nano"] / 1e9 - e1) < 1e-4
    assert abs(row["v_nano"] / 1e9 - v) < 1e-4
    assert abs(row["chi2_logrank"] - (o1 - e1) ** 2 / v) < 1e-3


def _cust_outcomes(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cents = defaultdict(int)
    for r in t["orders"].select("o_custkey", "o_totalprice").collect():
        cents[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
    return t, cents


def test_qini_matches_python(spark, sf_dir):
    got = {r["k"]: r for r in _rows(spark, sf_dir, "q418_qini_curve")}
    t, cents = _cust_outcomes(spark, sf_dir)
    bands = defaultdict(lambda: [0, 0, 0, 0])  # nt, nc, st, sc
    for r in t["customer"].collect():
        k = r["c_custkey"]
        if k not in cents:
            continue
        band = min(19, math.floor((r["c_acctbal"] + 1000.0) / 550))
        b = bands[band]
        if k % 2 == 0:
            b[0] += 1
            b[2] += cents[k]
        else:
            b[1] += 1
            b[3] += cents[k]
    nt = nc = st = sc = 0
    for band in sorted(bands, reverse=True):
        bnt, bnc, bst, bsc = bands[band]
        nt, nc, st, sc = nt + bnt, nc + bnc, st + bst, sc + bsc
        row = got[19 - band]
        assert (row["nt_cum"], row["nc_cum"]) == (nt, nc)
        assert (row["st_cum_cents"], row["sc_cum_cents"]) == (st, sc)
        want = st if nc == 0 else st - (sc * nt) // nc
        assert row["qini_cents"] == want


def test_gini_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q419_gini_revenue")[0]
    _, cents = _cust_outcomes(spark, sf_dir)
    units = [c // 100 for c in cents.values()]
    bands = defaultdict(lambda: [0, 0])
    for u in units:
        b = min(99, u // 125000)
        bands[b][0] += 1
        bands[b][1] += u
    n, tot = len(units), sum(units)
    cum = 0
    num = 0
    for b in sorted(bands):
        cnt, rev = bands[b]
        cum += rev
        num += cnt * (2 * cum - rev)
    assert row["n_customers"] == n and row["total_units"] == tot
    assert abs(row["gini_banded"] - (1 - num / (n * tot))) < 1e-5


def test_hhi_matches_python(spark, sf_dir):
    got = {r["n_name"]: r for r in _rows(spark, sf_dir, "q420_hhi_market")}
    t = load_tables(spark, sf_dir)
    nat = {r["s_suppkey"]: r["s_nationkey"] for r in t["supplier"].collect()}
    nname = {r["n_nationkey"]: r["n_name"] for r in t["nation"].collect()}
    rev = defaultdict(lambda: defaultdict(float))
    for r in t["lineitem"].select("l_suppkey", "l_extendedprice").collect():
        rev[nat[r["l_suppkey"]]][r["l_suppkey"]] += r["l_extendedprice"]
    for nk, sups in rev.items():
        units = {s: math.floor(v + 1e-9) for s, v in sups.items()}
        tot = sum(units.values())
        hhi_f = sum((u / tot) ** 2 for u in units.values())
        row = got[nname[nk]]
        assert row["n_suppliers"] == len(units)
        assert abs(row["total_units"] - tot) <= len(units)  # cent-floor drift
        # ppm quantization error <= n_suppliers ppm
        assert abs(row["hhi_ppm"] / 1e6 - hhi_f) < 5e-3
        assert (
            abs(row["top_share_ppm"] / 1e6 - max(units.values()) / tot) < 5e-3
        )


def test_benford_matches_python(spark, sf_dir):
    got = {r["digit"]: r for r in _rows(spark, sf_dir, "q421_benford_audit")}
    t = load_tables(spark, sf_dir)
    obs = Counter()
    for r in t["orders"].select("o_totalprice").collect():
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        obs[int(str(cents)[0])] += 1  # string first digit, not case chain
    n = sum(obs.values())
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        row = got[d]
        assert row["observed"] == obs.get(d, 0)
        p = math.log10(1 + 1 / d)
        assert row["expected_micro"] == n * _BENFORD_P_MICRO[d]
        assert abs(row["expected_micro"] / 1e6 - n * p) < n / 1e6 + 1
        want = (obs.get(d, 0) - n * p) ** 2 / (n * p)
        assert abs(row["chi2_term"] - want) < max(0.01, want * 1e-3)


def test_skipgram_matches_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q422_skipgram_pairs")
    t = load_tables(spark, sf_dir)
    pair = Counter()
    for r in t["documents"].select("text").collect():
        toks = [w for w in r["text"].lower().strip().split() if w][:128]
        for i, w1 in enumerate(toks):
            for j in (i + 1, i + 2):
                if j < len(toks):
                    pair[(w1, toks[j])] += 1
    want = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert len(got) == len(want)
    for row, ((w1, w2), n) in zip(got, want):
        assert (row["w1"], row["w2"], row["pair_n"]) == (w1, w2, n)
        h = int(hashlib.md5(f"{w1}|{w2}".encode()).hexdigest()[:8], 16)
        assert row["neg_shard"] == h % 997


def test_cvm_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q423_cvm_binned")[0]
    t = load_tables(spark, sf_dir)
    h1, h2 = Counter(), Counter()
    for r in t["lineitem"].select("l_returnflag", "l_extendedprice").collect():
        if r["l_returnflag"] not in ("R", "N"):
            continue
        b = math.floor(r["l_extendedprice"] * 100 + 0.5) // 10000
        (h1 if r["l_returnflag"] == "R" else h2)[b] += 1
    n1, n2 = sum(h1.values()), sum(h2.values())
    assert (row["n1"], row["n2"]) == (n1, n2)
    c1 = c2 = 0
    acc = 0.0
    for b in sorted(set(h1) | set(h2)):
        c1 += h1.get(b, 0)
        c2 += h2.get(b, 0)
        acc += (c1 / n1 - c2 / n2) ** 2 * (h1.get(b, 0) + h2.get(b, 0))
    want = n1 * n2 / (n1 + n2) ** 2 * acc / (n1 + n2)
    # engines use per-mille floor ECDFs; bound the quantization drift
    assert abs(row["t_cvm"] - want) < max(2e-3, want * 0.02)


def _daily(spark, sf_dir, agg):
    t = load_tables(spark, sf_dir)
    days = defaultdict(list)
    for r in (
        t["events"]
        .filter("event_type = 'purchase'")
        .select("ts", "value")
        .collect()
    ):
        days[r["ts"].day].append(r["value"])
    return {d: agg(vs) for d, vs in days.items()}


def test_ewma_matches_python(spark, sf_dir):
    got = {r["day"]: r for r in _rows(spark, sf_dir, "q424_ewma_chart")}
    y = _daily(spark, sf_dir, len)
    tot, n = sum(y.values()), len(y)
    e = tot // n  # e0 = floor mean, as documented
    mu = tot / n
    var = sum(v * v for v in y.values()) / n - mu * mu
    for t_i, d in enumerate(sorted(y), start=1):
        e = 0.5 * y[d] + 0.5 * e  # the recurrence, not the closed form
        row = got[d]
        assert row["n_purchases"] == y[d]
        assert abs(row["ewma"] - e) < 1e-6  # dyadic => exact mod 6dp round
        lim = 3.0 * math.sqrt(var * (1 - 0.25**t_i) / 3.0)
        assert abs(row["ucl"] - (mu + lim)) < 1e-5
        assert abs(row["lcl"] - (mu - lim)) < 1e-5


def test_mahalanobis_matches_python(spark, sf_dir):
    got = [
        (r["l_orderkey"], r["l_linenumber"], r["d2"])
        for r in _rows(spark, sf_dir, "q425_mahalanobis_outliers")
    ]
    t = load_tables(spark, sf_dir)
    rows = [
        (
            r["l_orderkey"],
            r["l_linenumber"],
            math.floor(r["l_quantity"] * 100 + 0.5),
            math.floor(r["l_extendedprice"] * 100 + 0.5),
        )
        for r in t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .collect()
    ]
    n = len(rows)
    mx = sum(r[2] for r in rows) / n
    my = sum(r[3] for r in rows) / n
    vx = sum(r[2] ** 2 for r in rows) / n - mx * mx
    vy = sum(r[3] ** 2 for r in rows) / n - my * my
    cv = sum(r[2] * r[3] for r in rows) / n - mx * my
    det = vx * vy - cv * cv
    scored = sorted(
        (
            (
                -(
                    (vy * (x - mx) ** 2 - 2 * cv * (x - mx) * (y - my)
                     + vx * (y - my) ** 2)
                    / det
                ),
                ok,
                ln,
            )
            for ok, ln, x, y in rows
        ),
    )[:10]
    assert len(got) == 10
    for (ok_g, ln_g, d2_g), (negd2, ok_w, ln_w) in zip(got, scored):
        assert (ok_g, ln_g) == (ok_w, ln_w)
        assert abs(d2_g - (-negd2)) < 1e-4


def test_cusum_matches_python(spark, sf_dir):
    got = {r["day"]: r for r in _rows(spark, sf_dir, "q426_cusum_drift")}
    yc = _daily(
        spark, sf_dir, lambda vs: sum(math.floor(v * 100) for v in vs)
    )
    n = len(yc)
    mu = sum(yc.values()) / n
    sp = sm = 0.0
    for d in sorted(yc):
        dev = yc[d] - mu
        sp = max(0.0, sp + dev)  # the recursion, not the identity
        sm = max(0.0, sm - dev)
        row = got[d]
        assert row["value_cents"] == yc[d]
        assert abs(row["s_plus"] - sp / 100) < 1e-4
        assert abs(row["s_minus"] - sm / 100) < 1e-4
