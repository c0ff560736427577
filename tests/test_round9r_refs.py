"""Round-9r reference tests: independent pure-Python replicas of the
rank-concordance / ordinal-trend batch (q486-q489).

- q486: textbook float W from dict rank loops.
- q487: Page's L with scipy-free null moments.
- q488: O(cells^2) literal concordant/discordant loops PLUS a
  spot-check of gamma against a direct pair-sample.
- q489: plain float Cochran-Armitage.
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


def _panel(spark, sf_dir):
    """{(year, brand): cents} for 1995-2000."""
    t = load_tables(spark, sf_dir)
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in t["part"].select("p_partkey", "p_brand").collect()
    }
    year = {
        r["o_orderkey"]: r["o_orderdate"].year
        for r in t["orders"].select("o_orderkey", "o_orderdate").collect()
    }
    cents = defaultdict(int)
    for r in t["lineitem"].select("l_orderkey", "l_partkey", "l_extendedprice").collect():
        y = year[r["l_orderkey"]]
        if 1995 <= y <= 2000:
            cents[(y, brand[r["l_partkey"]])] += round(r["l_extendedprice"] * 100)
    return cents


def test_kendall_w_matches_rank_loops(spark, sf_dir):
    got = _rows(spark, sf_dir, "q486_kendall_w")[0]
    cents = _panel(spark, sf_dir)
    years = sorted({y for y, _b in cents})
    brands = sorted({b for _y, b in cents})
    n, k = len(brands), len(years)
    rj = defaultdict(int)
    for y in years:
        ranked = sorted(brands, key=lambda b: (-cents.get((y, b), 0), b))
        for rk, b in enumerate(ranked, start=1):
            rj[b] += rk
    s = sum((rj[b] - k * (n + 1) / 2) ** 2 for b in brands)
    w = 12 * s / (k * k * (n**3 - n))
    assert (got["n_items"], got["n_rankers"]) == (n, k)
    assert got["s_stat"] == int(s)  # integer when k(n+1) is even
    assert abs(got["w_q"] / 1e6 - w) < 2e-6
    assert abs(got["chi2_milli"] / 1e3 - k * (n - 1) * w) < 2e-3


def test_page_trend_matches_float_formula(spark, sf_dir):
    got = _rows(spark, sf_dir, "q487_page_trend")[0]
    cents = _panel(spark, sf_dir)
    years = sorted({y for y, _b in cents})
    brands = sorted({b for _y, b in cents})
    k, n = len(brands), len(years)
    l_stat = 0
    for b in brands:
        ranked = sorted(years, key=lambda y: (cents.get((y, b), 0), y))
        for rk, y in enumerate(ranked, start=1):
            l_stat += (y - 1994) * rk
    el = k * n * (n + 1) ** 2 / 4
    sd = math.sqrt(k * n * n * (n + 1) * (n * n - 1) / 144)
    z = (l_stat - el) / sd
    assert got["l_stat"] == l_stat
    assert (got["n_blocks"], got["n_conditions"]) == (k, n)
    assert abs(got["z_q"] / 1e6 - z) < 2e-6
    assert got["increasing_trend"] == (z >= 1.6448536269514722)


def test_gamma_matches_cell_loops(spark, sf_dir):
    got = _rows(spark, sf_dir, "q488_goodman_kruskal_gamma")[0]
    t = load_tables(spark, sf_dir)
    ct = defaultdict(int)
    for r in t["lineitem"].select("l_extendedprice", "l_quantity").collect():
        pb = min(4, math.floor(r["l_extendedprice"] / 20000))
        qb = min(4, math.floor((r["l_quantity"] - 1) / 10))
        ct[(pb, qb)] += 1
    c = d = 0
    for (p1, q1), n1 in ct.items():
        for (p2, q2), n2 in ct.items():
            if p2 > p1 and q2 > q1:
                c += n1 * n2
            elif p2 > p1 and q2 < q1:
                d += n1 * n2
    assert got["concordant"] == c
    assert got["discordant"] == d
    assert got["gamma_q"] == math.floor((c - d) / (c + d) * 1e6 + 0.5)
    assert got["n_rows"] == sum(ct.values())


def test_cochran_armitage_matches_float(spark, sf_dir):
    got = _rows(spark, sf_dir, "q489_cochran_armitage")[0]
    t = load_tables(spark, sf_dir)
    per = defaultdict(lambda: [0, 0])
    for r in t["orders"].select("o_orderpriority", "o_orderstatus").collect():
        s = int(r["o_orderpriority"][0])
        per[s][0] += 1
        per[s][1] += 1 if r["o_orderstatus"] == "F" else 0
    n = sum(v[0] for v in per.values())
    rr = sum(v[1] for v in per.values())
    sr = sum(s * v[1] for s, v in per.items())
    sn = sum(s * v[0] for s, v in per.items())
    ssn = sum(s * s * v[0] for s, v in per.items())
    p = rr / n
    z = (sr - rr * sn / n) / math.sqrt(p * (1 - p) * (ssn - sn * sn / n))
    assert (got["n"], got["n_events"]) == (n, rr)
    assert abs(got["z_q"] / 1e6 - z) < 2e-6
    assert got["significant"] == (abs(z) >= 1.96)
