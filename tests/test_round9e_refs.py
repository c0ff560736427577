"""Round-9e reference tests: independent pure-Python replicas of the
ML-feature / business / graph / recsys-eval batch (q433-q437).

- q433: hashlib md5 buckets + float birthday formula.
- q434: per-row dict loop LOO encoding (exact integer equality).
- q435: per-cohort dict rollup, float ppm ratios.
- q436: brute-force triangle enumeration over adjacency SETS (no
  degree orientation) — support counted per edge directly.
- q437: full per-user float recommender loop with math.log2 NDCG (vs
  the engines' integer literals).
"""

from __future__ import annotations

import datetime
import hashlib
import math
from collections import Counter, defaultdict
from itertools import combinations

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_feature_hashing_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q433_feature_hashing_audit")[0]
    t = load_tables(spark, sf_dir)
    feats = {
        f"{r['p_brand']}|{r['p_type']}" for r in t["part"].collect()
    }
    buckets = {
        int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % 1024
        for f in feats
    }
    m = len(feats)
    assert row["n_features"] == m
    assert row["n_buckets_used"] == len(buckets)
    assert row["n_collisions"] == m - len(buckets)
    want = m - 1024 * (1 - (1023 / 1024) ** m)
    assert abs(row["expected_collisions"] - want) < 1e-3


def test_loo_encoding_matches_python(spark, sf_dir):
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # lineitem — compare multisets, not a keyed dict
    got = sorted(
        (
            r["l_orderkey"],
            r["l_linenumber"],
            r["p_brand"],
            r["cents"],
            r["loo_cents_x100"],
        )
        for r in _rows(spark, sf_dir, "q434_loo_target_encoding")
    )
    t = load_tables(spark, sf_dir)
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    rows = [
        (
            r["l_orderkey"],
            r["l_linenumber"],
            brand[r["l_partkey"]],
            math.floor(r["l_extendedprice"] * 100 + 0.5),
        )
        for r in t["lineitem"]
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .collect()
    ]
    n = Counter()
    s = Counter()
    for _, _, b, c in rows:
        n[b] += 1
        s[b] += c
    want = sorted(
        (ok, ln, b, c, ((s[b] - c) * 100) // (n[b] - 1))
        for ok, ln, b, c in rows
        if ok <= 8
    )
    assert got == want


def test_nrr_matches_python(spark, sf_dir):
    got = {r["cohort_month"]: r for r in _rows(spark, sf_dir, "q435_nrr_cohorts")}
    t = load_tables(spark, sf_dir)
    orders = [
        (
            r["o_custkey"],
            (r["o_orderdate"].year - 1995) * 12 + r["o_orderdate"].month - 1,
            math.floor(r["o_totalprice"] * 100 + 0.5),
        )
        for r in t["orders"].select(
            "o_custkey", "o_orderdate", "o_totalprice"
        ).collect()
    ]
    m0 = {}
    for ck, m, _ in orders:
        if ck not in m0 or m < m0[ck]:
            m0[ck] = m
    rev = defaultdict(int)
    act = defaultdict(set)
    for ck, m, c in orders:
        k = m - m0[ck]
        if k <= 3:
            rev[(m0[ck], k)] += c
            act[(m0[ck], k)].add(ck)
    cohorts = sorted({v for v in m0.values()})
    assert set(got) == set(cohorts)
    for c in cohorts:
        row = got[c]
        assert row["n_customers"] == len(act[(c, 0)])
        assert row["rev0_cents"] == rev[(c, 0)]
        for k in (1, 2, 3):
            want = math.floor(rev.get((c, k), 0) * 1e6 / rev[(c, 0)])
            assert abs(row[f"nrr{k}_ppm"] - want) <= 1, (c, k)


def test_edge_support_matches_python(spark, sf_dir):
    got = [
        (r["u"], r["v"], r["support"])
        for r in _rows(spark, sf_dir, "q436_edge_support")
    ]
    t = load_tables(spark, sf_dir)
    per_order = defaultdict(set)
    for r in t["lineitem"].select("l_orderkey", "l_partkey").collect():
        per_order[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in per_order.values():
        edges.update(combinations(sorted(parts), 2))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    support = Counter()
    for u, v in edges:  # brute force: common neighbors per edge
        support[(u, v)] = len(adj[u] & adj[v])
    want = sorted(
        ((u, v, c) for (u, v), c in support.items() if c > 0),
        key=lambda x: (-x[2], x[0], x[1]),
    )[:20]
    assert got == want


def test_cf_holdout_eval_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q437_cf_holdout_eval")[0]
    t = load_tables(spark, sf_dir)
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    ometa = {
        r["o_orderkey"]: (r["o_custkey"], r["o_orderdate"])
        for r in t["orders"].collect()
    }
    cut = datetime.datetime(2001, 1, 1)
    train = defaultdict(Counter)
    test = defaultdict(set)
    for r in t["lineitem"].select("l_orderkey", "l_partkey").collect():
        ck, dt = ometa[r["l_orderkey"]]
        b = brand[r["l_partkey"]]
        if dt < cut:
            train[ck][b] += 1
        else:
            test[ck].add(b)
    norm2 = Counter()
    dot = Counter()
    for c in train.values():
        for b, k in c.items():
            norm2[b] += k * k
        for (b1, k1), (b2, k2) in combinations(sorted(c.items()), 2):
            dot[(b1, b2)] += k1 * k2
            dot[(b2, b1)] += k1 * k2
    sim = {
        (b1, b2): math.floor(d * 1e6 / math.sqrt(norm2[b1] * norm2[b2]))
        for (b1, b2), d in dot.items()
    }
    users = [ck for ck in test if ck in train]
    n_hit = 0
    ndcg_sum = 0
    for ck in users:
        scores = Counter()
        for h, cnt in train[ck].items():
            for (b1, b2), sm in sim.items():
                if b1 == h:
                    scores[b2] += cnt * sm
        top5 = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        dcg = 0
        hits = 0
        for rnk, (cand, _) in enumerate(top5, start=1):
            if cand in test[ck]:
                hits += 1
                dcg += math.floor(1e6 / math.log2(rnk + 1))
        h = min(5, len(test[ck]))
        idcg = sum(
            math.floor(1e6 / math.log2(r + 1)) for r in range(1, h + 1)
        )
        if hits:
            n_hit += 1
        ndcg_sum += (dcg * 1000000) // idcg
    assert row["n_users"] == len(users)
    assert row["hitrate_ppm"] == (n_hit * 1000000) // len(users)
    assert row["mean_ndcg_ppm"] == ndcg_sum // len(users)
