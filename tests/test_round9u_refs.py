"""Round-9u reference tests: independent pure-Python replicas of the
causal / index-number batch (q498-q501).

- q498: day-mean dict loops + Welch t on the cluster means.
- q499/q500: statistics.linear_regression per side/segment.
- q501: textbook float Laspeyres/Paasche/Fisher.
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict
from datetime import datetime

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_switchback_matches_cluster_ttest(spark, sf_dir):
    got = _rows(spark, sf_dir, "q498_switchback_analysis")[0]
    t = load_tables(spark, sf_dir)
    per_day = defaultdict(lambda: [0, 0])
    for r in t["events"].select("ts", "value").collect():
        d = int(r["ts"].timestamp() // 86400)
        per_day[d][0] += 1
        per_day[d][1] += math.floor(r["value"] * 1000)
    arms = {0: [], 1: []}
    for d, (n, s) in per_day.items():
        # replicate the micro-quantized day mean
        arms[d % 2].append(math.floor(s / n) / 1e3)
    m0, m1 = statistics.fmean(arms[0]), statistics.fmean(arms[1])
    v0, v1 = statistics.variance(arms[0]), statistics.variance(arms[1])
    k0, k1 = len(arms[0]), len(arms[1])
    tstat = (m1 - m0) / math.sqrt(v0 / k0 + v1 / k1)
    assert (got["n_days_even"], got["n_days_odd"]) == (k0, k1)
    assert abs(got["effect_q"] / 1e6 - (m1 - m0)) < 2e-6
    assert abs(got["t_q"] / 1e6 - tstat) < 1e-4
    assert got["significant"] == (abs(tstat) >= 2.05)


def test_rd_matches_two_side_ols(spark, sf_dir):
    got = _rows(spark, sf_dir, "q499_regression_discontinuity")[0]
    t = load_tables(spark, sf_dir)
    lo, hi = [], []
    for r in t["lineitem"].select("l_extendedprice", "l_discount").collect():
        p = r["l_extendedprice"]
        if not (30000 <= p <= 70000):
            continue
        x = round(p * 100) - 5000000
        y = round(r["l_discount"] * 1000000)
        (lo if x < 0 else hi).append((x, y))

    def fit(pts):
        xs = [x for x, _y in pts]
        ys = [y for _x, y in pts]
        res = statistics.linear_regression(xs, ys)
        return res.intercept

    a_lo, a_hi = fit(lo), fit(hi)
    assert (got["n_left"], got["n_right"]) == (len(lo), len(hi))
    assert abs(got["alpha_left_q"] - a_lo) < 1.0
    assert abs(got["alpha_right_q"] - a_hi) < 1.0
    assert abs(got["rd_effect_q"] - (a_hi - a_lo)) < 1.5


def test_its_matches_segmented_fit(spark, sf_dir):
    got = _rows(spark, sf_dir, "q500_interrupted_time_series")[0]
    t = load_tables(spark, sf_dir)
    per_day = defaultdict(lambda: [0, 0])
    for r in t["orders"].select("o_orderdate", "o_totalprice").collect():
        d = int(r["o_orderdate"].timestamp() // 86400)
        per_day[d][0] += 1
        per_day[d][1] += round(r["o_totalprice"] * 100)
    days = sorted(per_day)
    cut_day = int(datetime(1998, 1, 1).timestamp() // 86400)
    t0 = min(i for i, d in enumerate(days, start=1) if d >= cut_day)
    pre, post = [], []
    for i, d in enumerate(days, start=1):
        n, s = per_day[d]
        (post if i >= t0 else pre).append((i - t0, s // n))

    def fit(pts):
        res = statistics.linear_regression(
            [x for x, _y in pts], [y for _x, y in pts]
        )
        return res.intercept, res.slope

    a_pre, b_pre = fit(pre)
    a_post, b_post = fit(post)
    assert (got["n_pre_days"], got["n_post_days"]) == (len(pre), len(post))
    assert abs(got["level_change_q"] - (a_post - a_pre)) < 1.0
    assert abs(got["slope_change_milli"] / 1e3 - (b_post - b_pre)) < 2e-3


def test_price_index_matches_float_formulas(spark, sf_dir):
    got = {r["year"]: r for r in _rows(spark, sf_dir, "q501_price_index")}
    t = load_tables(spark, sf_dir)
    year = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in t["orders"].select("o_orderkey", "o_orderdate").collect()
    }
    up = defaultdict(lambda: [0, 0])  # (year, part) -> cents, qty
    for r in t["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice", "l_quantity").collect():
        y = year[r["l_orderkey"]]
        if 1995 <= y <= 2000:
            k = (y, r["l_partkey"])
            up[k][0] += round(r["l_extendedprice"] * 100)
            up[k][1] += int(r["l_quantity"])
    price = {
        k: (c * 1000 // q, q) for k, (c, q) in up.items() if q > 0
    }
    base = {pk: v for (y, pk), v in price.items() if y == 1995}
    for yy in sorted({y for y, _pk in price if y > 1995}):
        ln = ld = pn = pd_ = 0
        n = 0
        for (y, pk), (p1, q1) in price.items():
            if y != yy or pk not in base:
                continue
            p0, q0 = base[pk]
            n += 1
            ln += p1 * q0
            ld += p0 * q0
            pn += p1 * q1
            pd_ += p0 * q1
        assert got[yy]["n_parts"] == n
        assert abs(got[yy]["laspeyres_q"] / 1e6 - ln / ld) < 2e-6
        assert abs(got[yy]["paasche_q"] / 1e6 - pn / pd_) < 2e-6
        assert abs(
            got[yy]["fisher_q"] / 1e6 - math.sqrt((ln / ld) * (pn / pd_))
        ) < 2e-6
