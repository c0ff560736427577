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


def _rows(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir).collect()


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
