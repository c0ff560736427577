"""Round-9p reference tests: independent pure-Python replicas of the
experiment-analysis completion batch (q478-q481).

- q478: textbook float Welch ANOVA (statistics module moments).
- q479: plain float TOST z pair.
- q480: scipy-free normal CDF via math.erf directly (vs the engines'
  interpolated literal table — tolerance covers the interpolation).
- q481: Fieller quadratic solved with the float formula.
"""

from __future__ import annotations

import math
import statistics
from collections import defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _all_groups(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    g = defaultdict(list)
    for r in t["events"].select("event_type", "value").collect():
        g[r["event_type"]].append(math.floor(r["value"] * 1000))
    return g


def _mo(xs):
    n = len(xs)
    m = statistics.fmean(xs) / 1e3
    v = statistics.variance(xs) / 1e6
    return n, m, v


def test_welch_anova_matches_float_formula(spark, sf_dir):
    got = _rows(spark, sf_dir, "q478_welch_anova")[0]
    groups = [_mo(xs) for xs in _all_groups(spark, sf_dir).values()]
    k = len(groups)
    ws = [(n / v, m, n) for n, m, v in groups]
    sw = sum(w for w, _m, _n in ws)
    mw = sum(w * m for w, m, _n in ws) / sw
    num = sum(w * (m - mw) ** 2 for w, m, _n in ws) / (k - 1)
    lam = sum((1 - w / sw) ** 2 / (n - 1) for w, _m, n in ws)
    f = num / (1 + 2.0 * (k - 2) / (k * k - 1) * lam)
    df2 = (k * k - 1.0) / (3.0 * lam)
    assert got["k"] == k
    assert abs(got["grand_mean_q"] / 1e6 - mw) < 1e-4
    assert abs(got["welch_f_q"] / 1e6 - f) / max(f, 1) < 1e-3
    assert abs(got["df2_milli"] / 1e3 - df2) / df2 < 1e-3


def _ab(spark, sf_dir):
    g = _all_groups(spark, sf_dir)
    return _mo(g["click"]), _mo(g["view"])


def test_tost_matches_float_pair(spark, sf_dir):
    got = _rows(spark, sf_dir, "q479_tost_equivalence")[0]
    (n1, m1, v1), (n2, m2, v2) = _ab(spark, sf_dir)
    se = math.sqrt(v1 / n1 + v2 / n2)
    zl = (m1 - m2 + 2.0) / se
    zu = (m1 - m2 - 2.0) / se
    crit = 1.6448536269514722
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["z_lower_q"] / 1e6 - zl) < 1e-4
    assert abs(got["z_upper_q"] / 1e6 - zu) < 1e-4
    assert got["equivalent"] == (zl >= crit and zu <= -crit)


def test_posthoc_power_matches_erf(spark, sf_dir):
    got = {r["eff_decis"]: r for r in _rows(spark, sf_dir, "q480_posthoc_power")}
    (n1, _m1, v1), (n2, _m2, v2) = _ab(spark, sf_dir)
    se = math.sqrt(v1 / n1 + v2 / n2)
    assert set(got) == {1, 2, 3, 4, 5}
    for eff in range(1, 6):
        z = (eff / 10.0) / se - 1.959963984540054
        power = 0.5 * (1.0 + math.erf(max(-6.0, min(6.0, z)) / math.sqrt(2)))
        assert abs(got[eff]["z_q"] / 1e6 - z) < 1e-4
        # table step 0.1 + linear interpolation: |err| <= phi''/8 * 0.01
        assert abs(got[eff]["power_q"] / 1e6 - power) < 6e-4


def test_fieller_matches_quadratic(spark, sf_dir):
    got = _rows(spark, sf_dir, "q481_fieller_ratio_ci")[0]
    (n1, m1, v1), (n2, m2, v2) = _ab(spark, sf_dir)
    z2 = 1.959963984540054**2
    a = m2 * m2 - z2 * v2 / n2
    b = m1 * m2
    disc = max(0.0, b * b - a * (m1 * m1 - z2 * v1 / n1))
    lo = (b - math.sqrt(disc)) / a
    hi = (b + math.sqrt(disc)) / a
    assert abs(got["ratio_q"] / 1e6 - m1 / m2) < 1e-4
    assert abs(got["ci_lo_q"] / 1e6 - lo) < 1e-4
    assert abs(got["ci_hi_q"] / 1e6 - hi) < 1e-4
    assert got["bounded"] == (a > 0)
    # the point ratio must sit inside a bounded CI
    if a > 0:
        assert lo <= m1 / m2 <= hi
