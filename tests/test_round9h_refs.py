"""Round-9h reference tests: independent pure-Python replicas of the
sampling-design / scaling-law / stream-metric batch (q446-q450).

- q446: statistics.stdev Neyman shares in float.
- q447: set-union prefix loop (the engines use one first-occurrence
  aggregate) + float log-log least squares.
- q448: float Fano/burstiness over a dict grid with explicit zeros.
- q449: direct forecast loops with float MASE and per-point sMAPE.
- q450: set-based distinct counting per day/week/month.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_neyman_matches_python(spark, sf_dir):
    got = {r["seg"]: r for r in _rows(spark, sf_dir, "q446_neyman_allocation")}
    t = load_tables(spark, sf_dir)
    seg = {r["c_custkey"]: r["c_mktsegment"] for r in t["customer"].collect()}
    spend = defaultdict(float)
    for r in t["orders"].select("o_custkey", "o_totalprice").collect():
        spend[r["o_custkey"]] += r["o_totalprice"]
    strata = defaultdict(list)
    for ck, v in spend.items():
        strata[seg[ck]].append(math.floor(v + 1e-9))
    nh_sd = {}
    for s, vals in strata.items():
        n = len(vals)
        mu = sum(vals) / n
        sd = math.sqrt(sum((v - mu) ** 2 for v in vals) / (n - 1))
        nh_sd[s] = n * sd
    tot = sum(nh_sd.values())
    assert set(got) == set(strata)
    for s in strata:
        row = got[s]
        assert row["n_h"] == len(strata[s])
        # floor(v+1e-9) vs the engine's decimal-sum floor can differ by
        # <=1 unit per customer; shares tolerate a small drift
        assert abs(row["neyman_share_ppm"] - nh_sd[s] * 1e6 / tot) < 200
        assert abs(row["n_alloc_of_1000"] - 1000 * nh_sd[s] / tot) <= 1


def test_heaps_matches_python(spark, sf_dir):
    got = {r["decile"]: r for r in _rows(spark, sf_dir, "q447_heaps_law")}
    t = load_tables(spark, sf_dir)
    docs = sorted(
        (r["doc_id"], r["text"])
        for r in t["documents"].select("doc_id", "text").collect()
    )
    d = docs[-1][0] + 1
    seen = set()
    prefix_vocab = {}
    for doc_id, text in docs:
        toks = [w for w in text.lower().strip().split() if w]
        seen.update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
        prefix_vocab[doc_id] = len(seen)
    xs, ys = [], []
    for i in range(1, 11):
        thr = (i * d) // 10  # docs with doc_id < thr
        row = got[i]
        # vocab among docs with id < thr (ids are dense from 0)
        vocab = prefix_vocab[thr - 1]
        assert row["n_docs"] == thr
        assert row["vocab"] == vocab
        xs.append(math.log(thr))
        ys.append(math.log(vocab))
    k = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    beta = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert abs(got[1]["heaps_beta"] - beta) < 5e-3


def test_burstiness_matches_python(spark, sf_dir):
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "q448_burstiness")}
    t = load_tables(spark, sf_dir)
    cnt = defaultdict(Counter)
    hours = set()
    for r in t["events"].select("ts", "event_type").collect():
        h = (r["ts"].day - 1) * 24 + r["ts"].hour
        hours.add(h)
        cnt[r["event_type"]][h] += 1
    for et, c in cnt.items():
        ys = [c.get(h, 0) for h in hours]
        n = len(ys)
        mu = sum(ys) / n
        var = sum((y - mu) ** 2 for y in ys) / (n - 1)
        sd = math.sqrt(var)
        row = got[et]
        assert row["n_hours"] == n and row["total"] == sum(ys)
        assert abs(row["fano"] - var / mu) < 1e-5
        assert abs(row["burstiness"] - (sd - mu) / (sd + mu)) < 1e-5


def test_mase_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q449_seasonal_naive_mase")[0]
    t = load_tables(spark, sf_dir)
    daily = Counter()
    for r in t["events"].filter("event_type = 'purchase'").select("ts").collect():
        daily[r["ts"].day] += 1
    f = [(daily[d], daily[d - 7]) for d in sorted(daily) if d - 7 in daily]
    nv = [(daily[d], daily[d - 1]) for d in sorted(daily) if d - 1 in daily]
    sae = sum(abs(y - fc) for y, fc in f)
    naive = sum(abs(y - p) for y, p in nv)
    smape = sum(
        (2000000 * abs(y - fc)) // (y + fc) for y, fc in f if y + fc > 0
    )
    assert row["n_forecasts"] == len(f)
    assert row["abs_err_total"] == sae
    assert abs(row["mase"] - (sae / len(f)) / (naive / len(nv))) < 1e-5
    assert row["smape_ppm"] == smape // len(f)


def test_stickiness_matches_python(spark, sf_dir):
    got = {r["day"]: r for r in _rows(spark, sf_dir, "q450_dau_stickiness")}
    t = load_tables(spark, sf_dir)
    day_users = defaultdict(set)
    week_users = defaultdict(set)
    all_users = set()
    for r in t["events"].select("ts", "user_id").collect():
        d = r["ts"].day
        day_users[d].add(r["user_id"])
        week_users[(d - 1) // 7].add(r["user_id"])
        all_users.add(r["user_id"])
    assert set(got) == set(day_users)
    for d, us in day_users.items():
        row = got[d]
        w = (d - 1) // 7
        assert row["dau"] == len(us)
        assert row["week"] == w and row["wau"] == len(week_users[w])
        assert row["dau_wau_ppm"] == (len(us) * 1000000) // len(week_users[w])
        assert row["dau_mau_ppm"] == (len(us) * 1000000) // len(all_users)
