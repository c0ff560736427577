"""Round-9s reference tests: independent pure-Python replicas of the
survival-parametrics / calibration / info-theory batch (q490-q493).

All four rebuild the inputs from raw collects and follow textbook
float formulas (KM loop, equal-mass binning by sorting, plug-in
entropy rate).
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import datetime

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache

CENSOR = datetime(2001, 1, 1)


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _km(spark, sf_dir):
    """[(t, n_at_risk, d, S_after_t)] from a textbook loop."""
    t = load_tables(spark, sf_dir)
    life = defaultdict(lambda: [None, None])
    for r in t["orders"].select("o_custkey", "o_orderdate").collect():
        e = life[r["o_custkey"]]
        d = r["o_orderdate"]
        e[0] = d if e[0] is None or d < e[0] else e[0]
        e[1] = d if e[1] is None or d > e[1] else e[1]
    buckets = defaultdict(lambda: [0, 0])  # cnt, deaths
    for f, l in life.values():
        tb = (l - f).days // 28
        buckets[tb][0] += 1
        buckets[tb][1] += 1 if l < CENSOR else 0
    curve = []
    ts = sorted(buckets)
    at_risk = sum(c for c, _d in buckets.values())
    s = 1.0
    dead = False
    for tb in ts:
        cnt, d = buckets[tb]
        if d >= at_risk:
            dead = True
        if not dead:
            s *= 1.0 - d / at_risk
        curve.append((tb, at_risk, d, 0.0 if dead else s))
        at_risk -= cnt
    return curve


def test_weibull_fit_matches_loglog_ols(spark, sf_dir):
    got = _rows(spark, sf_dir, "q490_weibull_fit")[0]
    pts = [
        (math.log(tb + 0.5), math.log(-math.log(s)))
        for tb, _n, _d, s in _km(spark, sf_dir)
        if 0 < s < 1 and tb >= 1
    ]
    m = len(pts)
    sx = sum(x for x, _z in pts)
    sz = sum(z for _x, z in pts)
    sxz = sum(x * z for x, z in pts)
    sxx = sum(x * x for x, _z in pts)
    shape = (m * sxz - sx * sz) / (m * sxx - sx * sx)
    scale = math.exp(sx / m - (sz / m) / shape)
    assert got["n_points"] == m
    assert abs(got["shape_q"] / 1e6 - shape) < 1e-3
    assert abs(got["scale_milli"] / 1e3 - scale) / scale < 1e-3
    assert got["decreasing_hazard"] == (shape < 1.0)


def test_rmst_matches_step_integral(spark, sf_dir):
    got = _rows(spark, sf_dir, "q492_rmst")[0]
    curve = {tb: s for tb, _n, _d, s in _km(spark, sf_dir)}
    ts = sorted(tb for tb in curve if tb < 12)
    rmst_u = 0
    prev_s = 1.0
    for tb in ts:
        rmst_u += math.floor(prev_s * 1e6)
        prev_s = curve[tb]
    assert got["n_buckets"] == len(ts)
    assert got["rmst_q"] == rmst_u


def test_adaptive_ece_matches_sorted_binning(spark, sf_dir):
    got = {r["bin"]: r for r in _rows(spark, sf_dir, "q491_adaptive_ece")}
    t = load_tables(spark, sf_dir)
    pts = []
    for r in t["events"].select("value").collect():
        v = r["value"]
        pm = math.floor(1000.0 / (1.0 + math.exp(-(v - 50.0) / 25.0)))
        pts.append((pm, 1 if v > 55.0 else 0))
    # replicate the value-domain binning: bin by exclusive prefix count
    vc = defaultdict(lambda: [0, 0])
    for pm, y in pts:
        vc[pm][0] += 1
        vc[pm][1] += y
    tot = len(pts)
    bins = defaultdict(lambda: [0, 0, 0])  # n, y, p_sum
    pre = 0
    for pm in sorted(vc):
        n, ny = vc[pm]
        b = min(9, (pre * 10) // tot)
        bins[b][0] += n
        bins[b][1] += ny
        bins[b][2] += pm * n
        pre += n
    gap_sum = 0
    for b, (n_b, y_b, p_b) in bins.items():
        conf = p_b * 1000 // n_b
        acc = y_b * 1000000 // n_b
        assert got[b]["n_b"] == n_b
        assert got[b]["conf_ppm"] == conf
        assert got[b]["acc_ppm"] == acc
        gap_sum += abs(acc - conf) * n_b
    for b in got:
        assert got[b]["ece_ppm"] == gap_sum // tot


def test_entropy_rate_matches_plugin(spark, sf_dir):
    got = _rows(spark, sf_dir, "q493_markov_entropy_rate")[0]
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    tr = defaultdict(int)
    for evs in per_user.values():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            tr[(a[2], b[2])] += 1
    nt = sum(tr.values())
    ri = defaultdict(int)
    for (i, _j), n in tr.items():
        ri[i] += n
    h = -sum((n / nt) * math.log(n / ri[i]) for (i, _j), n in tr.items())
    assert got["n_transitions"] == nt
    assert got["n_cells"] == len(tr)
    assert abs(got["entropy_rate_q"] / 1e6 - h) < 1e-4
    assert abs(got["entropy_rate_bits_q"] / 1e6 - h / math.log(2)) < 1e-4
