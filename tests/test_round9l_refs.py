"""Round-9l reference tests: independent pure-Python replicas of the
time-series batch (q462-q465).

All four replicas rebuild the daily order series as a plain Python
list and follow the textbook formulas (float paths where the engines
use quantized-integer machinery).
"""

from __future__ import annotations

import math
from collections import defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _series(spark, sf_dir):
    """[(day, count, revenue_cents)] sorted by day."""
    t = load_tables(spark, sf_dir)
    agg = defaultdict(lambda: [0, 0])
    for r in t["orders"].select("o_orderdate", "o_totalprice").collect():
        d = int(r["o_orderdate"].timestamp() // 86400)
        agg[d][0] += 1
        agg[d][1] += round(r["o_totalprice"] * 100)
    return [(d, c, cents) for d, (c, cents) in sorted(agg.items())]


def test_pacf_matches_durbin_levinson(spark, sf_dir):
    got = _rows(spark, sf_dir, "q462_pacf_closed")[0]
    ser = [c for _d, c, _cents in _series(spark, sf_dir)]
    n = len(ser)
    mean = sum(ser) / n
    c = [
        sum((ser[i] - mean) * (ser[i + k] - mean) for i in range(n - k))
        for k in range(4)
    ]
    r1, r2, r3 = c[1] / c[0], c[2] / c[0], c[3] / c[0]
    p2 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 * (1 - p2)
    p3 = (r3 - p21 * r2 - p2 * r1) / (1 - p21 * r1 - p2 * r2)
    assert got["n_days"] == n
    assert abs(got["r1_q"] / 1e6 - r1) < 1e-4
    assert abs(got["r2_q"] / 1e6 - r2) < 1e-4
    assert abs(got["r3_q"] / 1e6 - r3) < 1e-4
    assert abs(got["pacf1_q"] / 1e6 - r1) < 1e-4
    assert abs(got["pacf2_q"] / 1e6 - p2) < 1e-4
    assert abs(got["pacf3_q"] / 1e6 - p3) < 1e-4


def test_hurst_matches_rs_loop(spark, sf_dir):
    got = {r["size"]: r for r in _rows(spark, sf_dir, "q463_hurst_rs")}
    ser = [cents for _d, _c, cents in _series(spark, sf_dir)]
    pts = []
    for size in (8, 16, 32, 64):
        rss = []
        for b in range(len(ser) // size):
            blk = ser[b * size : (b + 1) * size]
            mean = sum(blk) / size
            cum, mx, mn = 0.0, -math.inf, math.inf
            for x in blk:
                cum += x - mean
                mx, mn = max(mx, cum), min(mn, cum)
            var = sum((x - mean) ** 2 for x in blk) / size
            if var > 0:
                rss.append((mx - mn) / math.sqrt(var))
        mean_rs = sum(rss) / len(rss)
        pts.append((size, len(rss), mean_rs))
        assert got[size]["n_blocks"] == len(rss)
        assert abs(got[size]["mean_rs_q"] / 1e6 - mean_rs) < 1e-3
    xs = [math.log(s) for s, _n, _m in pts]
    zs = [math.log(m) for _s, _n, m in pts]
    k = len(pts)
    slope = (k * sum(x * z for x, z in zip(xs, zs)) - sum(xs) * sum(zs)) / (
        k * sum(x * x for x in xs) - sum(xs) ** 2
    )
    for size in (8, 16, 32, 64):
        assert abs(got[size]["hurst_q"] / 1e6 - slope) < 1e-3


def test_page_hinkley_matches_loop(spark, sf_dir):
    got = _rows(spark, sf_dir, "q464_page_hinkley")[0]
    ser = _series(spark, sf_dir)
    cs = cn = 0
    u = 0
    mn = 0
    max_ph = -1
    t_max = None
    alarms = 0
    for t, (_d, c, cents) in enumerate(ser, start=1):
        cs += cents
        cn += c
        u += math.floor((cents / c - cs / cn) * 100)
        mn = min(mn, u)
        ph = u - mn
        if ph > max_ph:
            max_ph, t_max = ph, t
        if ph > 100000:
            alarms += 1
    assert got["n_days"] == len(ser)
    assert got["max_ph_q"] == max_ph
    assert got["t_max"] == t_max
    assert got["n_alarms"] == alarms


def test_spectral_entropy_matches_probe_loop(spark, sf_dir):
    got = {r["period"]: r for r in _rows(spark, sf_dir, "q465_spectral_entropy")}
    ser = [c for _d, c, _cents in _series(spark, sf_dir)]
    powers = {}
    for per in range(2, 10):
        cs = {
            p: (
                math.floor(math.cos(2 * math.pi * p / per) * 1e6),
                math.floor(math.sin(2 * math.pi * p / per) * 1e6),
            )
            for p in range(per)
        }
        re = sum(y * cs[t % per][0] for t, y in enumerate(ser))
        im = sum(y * cs[t % per][1] for t, y in enumerate(ser))
        powers[per] = math.floor((re / 1e6) ** 2 + (im / 1e6) ** 2)
    tp = sum(powers.values())
    ent = sum(
        math.floor(-(p / tp) * math.log(p / tp) * 1e9)
        for p in powers.values()
        if p > 0
    )
    norm = math.floor(ent / 1e9 / math.log(8) * 1e6 + 0.5)
    for per in range(2, 10):
        assert got[per]["power_q"] == powers[per]
        assert got[per]["share_ppm"] == powers[per] * 1000000 // tp
        assert got[per]["norm_entropy_q"] == norm
