"""Round-9j reference tests: independent pure-Python replicas of the
effect-size / paired-categorical batch (q454-q457).

- q454: textbook Cohen's d / Hedges' g / Glass's delta from Python
  lists with statistics.mean/variance (float path, vs the engines'
  exact decimal sums).
- q455: O(n^2) literal pair loop for Cliff's delta (vs the rank
  identity the engines use).
- q456: literal sorted list of all pairwise differences, median by
  indexing (vs the histogram cross-product).
- q457: dict-of-dicts contingency and a float chi-square loop (vs
  integer milli floor-division).
"""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _groups(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    rows = (
        t["events"]
        .select("event_type", "value")
        .filter("event_type in ('click', 'view')")
        .collect()
    )
    clicks = [r["value"] for r in rows if r["event_type"] == "click"]
    views = [r["value"] for r in rows if r["event_type"] == "view"]
    return clicks, views


def test_effect_sizes_match_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q454_effect_sizes")[0]
    clicks, views = _groups(spark, sf_dir)
    # replicate the milli-unit quantization, then classic formulas
    x1 = [math.floor(v * 1000) for v in clicks]
    x2 = [math.floor(v * 1000) for v in views]
    n1, n2 = len(x1), len(x2)
    m1, m2 = statistics.fmean(x1), statistics.fmean(x2)
    v1, v2 = statistics.variance(x1), statistics.variance(x2)
    sp = math.sqrt(((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2))
    d = (m1 - m2) / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    glass = (m1 - m2) / math.sqrt(v2)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["cohen_d_q"] / 1e6 - d) < 2e-6
    assert abs(got["hedges_g_q"] / 1e6 - g) < 2e-6
    assert abs(got["glass_delta_q"] / 1e6 - glass) < 2e-6
    assert abs(got["mean_diff_q"] / 1e3 - (m1 - m2)) < 2e-3


def test_cliffs_delta_matches_pair_loop(spark, sf_dir):
    got = _rows(spark, sf_dir, "q455_cliffs_delta")[0]
    clicks, views = _groups(spark, sf_dir)
    x1 = [math.floor(v * 100) for v in clicks]
    x2 = [math.floor(v * 100) for v in views]
    # literal definition: (#{x>y} - #{x<y}) / (n1 n2), via counters to
    # keep the quadratic loop over distinct values only
    c1, c2 = Counter(x1), Counter(x2)
    gt = sum(a * b for v1, a in c1.items() for v2, b in c2.items() if v1 > v2)
    lt = sum(a * b for v1, a in c1.items() for v2, b in c2.items() if v1 < v2)
    n1, n2 = len(x1), len(x2)
    delta = (gt - lt) / (n1 * n2)
    assert (got["n1"], got["n2"]) == (n1, n2)
    assert abs(got["delta_q"] / 1e6 - delta) < 2e-6
    exp_band = (
        "negligible"
        if abs(delta) < 0.147
        else "small"
        if abs(delta) < 0.33
        else "medium"
        if abs(delta) < 0.474
        else "large"
    )
    assert got["magnitude"] == exp_band
    # 2U1 identity: delta = 2U1/(n1 n2) - 1 with ties counted half
    assert got["u1_x2"] == gt * 2 + (
        sum(a * c2.get(v, 0) for v, a in c1.items())
    )


def test_hodges_lehmann_matches_sorted_diffs(spark, sf_dir):
    got = _rows(spark, sf_dir, "q456_hodges_lehmann")[0]
    t = load_tables(spark, sf_dir)
    rows = t["lineitem"].select("l_returnflag", "l_quantity").collect()
    xa = [int(r["l_quantity"]) for r in rows if r["l_returnflag"] == "R"]
    xb = [int(r["l_quantity"]) for r in rows if r["l_returnflag"] == "A"]
    diffs = sorted(a - b for a in xa for b in xb)
    n = len(diffs)
    lo = diffs[(n + 1) // 2 - 1]
    hi = diffs[n // 2]
    assert got["n_pairs"] == n
    assert got["hl_x2"] == lo + hi
    assert abs(got["hl_q"] / 1e6 - (lo + hi) / 2) < 2e-6


def test_bowker_matches_float_loop(spark, sf_dir):
    got = _rows(spark, sf_dir, "q457_bowker_symmetry")[0]
    t = load_tables(spark, sf_dir)
    rows = t["events"].select("user_id", "ts", "event_id", "event_type").collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    ct = Counter()
    for evs in per_user.values():
        evs.sort()
        ct[(evs[0][2], evs[-1][2])] += 1
    types = sorted({r["event_type"] for r in rows})
    chi_m = 0
    dof = 0
    for a in range(len(types)):
        for b in range(a + 1, len(types)):
            nij = ct.get((types[a], types[b]), 0)
            nji = ct.get((types[b], types[a]), 0)
            if nij + nji > 0:
                dof += 1
                chi_m += ((nij - nji) ** 2 * 1000) // (nij + nji)
    assert got["n_users"] == len(per_user)
    assert got["dof"] == dof
    assert got["chi2_m"] == chi_m
