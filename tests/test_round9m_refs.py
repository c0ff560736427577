"""Round-9m reference tests: independent pure-Python replicas of the
graph / recsys-evaluation batch (q466-q469).

- q466: brute-force triangle count per node over frozenset edges (vs
  the degree-ordered wedge close).
- q467: per-pair dict loops for CN/RA/PA/Jaccard.
- q468/q469: literal numpy-free cosine neighborhoods from dict
  vectors, then coverage/novelty/ILD loops.
"""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import combinations

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _gated_el(spark, sf_dir):
    """{part: [supp...]} after the 2..32 degree gate."""
    t = load_tables(spark, sf_dir)
    ps = defaultdict(set)
    for r in t["lineitem"].select("l_partkey", "l_suppkey").collect():
        ps[r["l_partkey"]].add(r["l_suppkey"])
    return {p: sorted(s) for p, s in ps.items() if 2 <= len(s) <= 32}


def test_local_clustering_matches_bruteforce(spark, sf_dir):
    got = [(r["supp"], r["degree"], r["n_tri"], r["lcc_ppm"])
           for r in _rows(spark, sf_dir, "q466_local_clustering")]
    el = _gated_el(spark, sf_dir)
    edges = set()
    for supps in el.values():
        for u, v in combinations(supps, 2):
            edges.add((u, v))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = {n: 0 for n in adj}
    for u, v in edges:
        for w in adj[u] & adj[v]:
            # each triangle is seen once per its 3 edges, each sighting
            # incrementing all 3 corners -> every corner ends at 3x
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    tri = {n: c // 3 for n, c in tri.items()}
    exp = sorted(
        ((n, len(adj[n]), tri[n]) for n in adj if len(adj[n]) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:20]
    exp = [
        (n, d, tn, 2 * tn * 1000000 // (d * (d - 1))) for n, d, tn in exp
    ]
    assert got == exp


def test_link_prediction_matches_dict_loops(spark, sf_dir):
    got = [
        (r["s1"], r["s2"], r["cn"], r["ra_q"], r["pa"], r["jaccard_ppm"])
        for r in _rows(spark, sf_dir, "q467_link_prediction")
    ]
    el = _gated_el(spark, sf_dir)
    sdeg = defaultdict(int)
    pairs = defaultdict(lambda: [0, 0])  # cn, ra_q
    for part, supps in el.items():
        for s in supps:
            sdeg[s] += 1
        w = math.floor(1000000.0 / len(supps) + 0.5)
        for u, v in combinations(supps, 2):
            pairs[(u, v)][0] += 1
            pairs[(u, v)][1] += w
    exp = [
        (
            u,
            v,
            cn,
            ra,
            sdeg[u] * sdeg[v],
            cn * 1000000 // (sdeg[u] + sdeg[v] - cn),
        )
        for (u, v), (cn, ra) in pairs.items()
    ]
    exp.sort(key=lambda x: (-x[3], x[0], x[1]))
    assert got == exp[:50]


def _brand_recs(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    brand = {
        r["p_partkey"]: r["p_brand"]
        for r in t["part"].select("p_partkey", "p_brand").collect()
    }
    cust = {
        r["o_orderkey"]: r["o_custkey"]
        for r in t["orders"].select("o_orderkey", "o_custkey").collect()
    }
    vec = defaultdict(lambda: defaultdict(int))  # brand -> {cust: cnt}
    pop = defaultdict(int)
    for r in t["lineitem"].select("l_orderkey", "l_partkey").collect():
        b = brand[r["l_partkey"]]
        vec[b][cust[r["l_orderkey"]]] += 1
        pop[b] += 1
    cos = {}
    for b1 in vec:
        for b2 in vec:
            if b1 == b2:
                continue
            dot = sum(c * vec[b2].get(k, 0) for k, c in vec[b1].items())
            n1 = sum(c * c for c in vec[b1].values())
            n2 = sum(c * c for c in vec[b2].values())
            cos[(b1, b2)] = dot / math.sqrt(n1 * n2)
    recs = {}
    for b1 in vec:
        ranked = sorted(
            ((b2, c) for (a, b2), c in cos.items() if a == b1),
            key=lambda x: (-x[1], x[0]),
        )
        recs[b1] = [b2 for b2, _c in ranked[:3]]
    return vec, pop, cos, recs


def test_rec_coverage_matches_loops(spark, sf_dir):
    got = _rows(spark, sf_dir, "q468_rec_coverage")[0]
    vec, pop, _cos, recs = _brand_recs(spark, sf_dir)
    slots = [b2 for lst in recs.values() for b2 in lst]
    tot = sum(pop.values())
    novs = [
        math.floor(-math.log(pop[b2] / tot) / math.log(2) * 1e6)
        for b2 in slots
    ]
    assert got["n_items"] == len(pop)
    assert got["n_recommended"] == len(set(slots))
    assert got["coverage_ppm"] == len(set(slots)) * 1000000 // len(pop)
    assert got["n_rec_slots"] == len(slots)
    assert abs(got["mean_novelty_q"] - sum(novs) // len(novs)) <= 1


def test_ild_matches_loops(spark, sf_dir):
    got = {r["brand"]: r for r in _rows(spark, sf_dir, "q469_intra_list_diversity")}
    _vec, _pop, cos, recs = _brand_recs(spark, sf_dir)
    ilds = {}
    for b1, lst in recs.items():
        dis = [
            math.floor((1.0 - cos[(min(x, y), max(x, y))]) * 1e6)
            for x, y in combinations(lst, 2)
        ]
        ilds[b1] = (len(dis), sum(dis) // len(dis))
    mean_ild = sum(v[1] for v in ilds.values()) // len(ilds)
    assert set(got) == set(ilds)
    for b1, (np_, ild) in ilds.items():
        assert got[b1]["n_pairs"] == np_
        assert abs(got[b1]["ild_q"] - ild) <= 1
        assert abs(got[b1]["mean_ild_q"] - mean_ild) <= 1
