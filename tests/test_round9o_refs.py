"""Round-9o reference tests: independent pure-Python replicas of the
data-quality / inequality batch (q474-q477).

- q474/q475: dict-of-sets profiling loops.
- q476: textbook float Atkinson (epsilon=0.5).
- q477: textbook float Theil T with the within/between decomposition
  identity checked (total ~= between + weighted within).
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


def test_fd_discovery_matches_set_loops(spark, sf_dir):
    got = {r["fd"]: r for r in _rows(spark, sf_dir, "q474_fd_discovery")}
    t = load_tables(spark, sf_dir)
    panels = {
        "part: brand->type": [
            (r["p_brand"], r["p_type"])
            for r in t["part"].select("p_brand", "p_type").collect()
        ],
        "orders: custkey->priority": [
            (r["o_custkey"], r["o_orderpriority"])
            for r in t["orders"].select("o_custkey", "o_orderpriority").collect()
        ],
        "lineitem: orderkey->returnflag": [
            (r["l_orderkey"], r["l_returnflag"])
            for r in t["lineitem"].select("l_orderkey", "l_returnflag").collect()
        ],
    }
    assert len(got) == 6
    for fd, pairs in panels.items():
        m = defaultdict(set)
        for lhs, rhs in pairs:
            m[lhs].add(rhs)
        n_groups = len(m)
        n_viol = sum(1 for s in m.values() if len(s) > 1)
        excess = sum(len(s) - 1 for s in m.values())
        assert got[fd]["n_groups"] == n_groups
        assert got[fd]["n_violating"] == n_viol
        assert got[fd]["excess_rhs"] == excess
        assert got[fd]["violation_ppm"] == n_viol * 1000000 // n_groups
        assert got[fd]["holds"] == (n_viol == 0)


def test_candidate_keys_match_distinct_loops(spark, sf_dir):
    got = {r["combo"]: r for r in _rows(spark, sf_dir, "q475_candidate_keys")}
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey").collect()
    checks = {
        "lineitem(orderkey)": (len(li), len({r["l_orderkey"] for r in li})),
        "lineitem(orderkey,linenumber)": (
            len(li),
            len({(r["l_orderkey"], r["l_linenumber"]) for r in li}),
        ),
        "lineitem(partkey,suppkey)": (
            len(li),
            len({(r["l_partkey"], r["l_suppkey"]) for r in li}),
        ),
        "documents(doc_id)": (
            t["documents"].count(),
            len({r["doc_id"] for r in t["documents"].select("doc_id").collect()}),
        ),
    }
    assert len(got) == 6
    for combo, (n_rows, n_distinct) in checks.items():
        assert got[combo]["n_rows"] == n_rows
        assert got[combo]["n_distinct"] == n_distinct
        assert got[combo]["is_key"] == (n_rows == n_distinct)
        assert got[combo]["dup_ppm"] == (n_rows - n_distinct) * 1000000 // n_rows


def _cust_cents(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    cents = defaultdict(int)
    for r in t["orders"].select("o_custkey", "o_totalprice").collect():
        cents[r["o_custkey"]] += round(r["o_totalprice"] * 100)
    return cents


def test_atkinson_matches_float_formula(spark, sf_dir):
    got = _rows(spark, sf_dir, "q476_atkinson_index")[0]
    ys = list(_cust_cents(spark, sf_dir).values())
    n = len(ys)
    mean = sum(ys) / n
    ede = (sum(math.sqrt(y) for y in ys) / n) ** 2
    atkinson = 1.0 - ede / mean
    assert got["n"] == n
    assert got["total_cents"] == sum(ys)
    assert abs(got["atkinson_q"] / 1e6 - atkinson) < 1e-4


def test_theil_matches_decomposition(spark, sf_dir):
    got = {r["nation"]: r for r in _rows(spark, sf_dir, "q477_theil_decomposition")}
    t = load_tables(spark, sf_dir)
    nat = {
        r["c_custkey"]: r["c_nationkey"]
        for r in t["customer"].select("c_custkey", "c_nationkey").collect()
    }
    cents = _cust_cents(spark, sf_dir)
    by_nation = defaultdict(list)
    for ck, y in cents.items():
        if y > 0:
            by_nation[nat[ck]].append(y)
    all_y = [y for ys in by_nation.values() for y in ys]
    n, s = len(all_y), sum(all_y)
    mu = s / n
    theil_total = sum((y / mu) * math.log(y / mu) for y in all_y) / n
    theil_between = sum(
        (sum(ys) / s) * math.log((sum(ys) / len(ys)) / mu)
        for ys in by_nation.values()
    )
    assert set(got) == set(by_nation)
    any_row = next(iter(got.values()))
    assert abs(any_row["theil_total_q"] / 1e6 - theil_total) < 1e-4
    assert abs(any_row["theil_between_q"] / 1e6 - theil_between) < 1e-4
    # additive decomposition: total = between + sum (s_g/s) T_g
    within = 0.0
    for nk, ys in by_nation.items():
        mu_g = sum(ys) / len(ys)
        t_g = sum((y / mu_g) * math.log(y / mu_g) for y in ys) / len(ys)
        # the engine reports T_g against the GLOBAL mean scaled terms:
        # theil_g_q = (1/n_g) sum (y/mu)(ln(y/mu)) -- check directly
        t_g_global = sum((y / mu) * math.log(y / mu) for y in ys) / len(ys)
        assert abs(got[nk]["theil_g_q"] / 1e6 - t_g_global) < 1e-4
        within += (sum(ys) / s) * t_g
    assert abs(theil_total - (theil_between + within)) < 1e-9
