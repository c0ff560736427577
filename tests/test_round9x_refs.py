"""Round-9x reference tests: independent pure-Python replicas of the
retrieval-tuning / inference batch (q507-q510).

- q507: textbook float BM25 per (k1, b), sorted top-10 overlap.
- q508: statistics-module paired t.
- q509: math.erf p-values, literal Holm step-down loop.
- q510: sorted-list median + float chi-square loops.
"""

from __future__ import annotations

import math
import statistics
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache

QUERY_TERMS = ("spark", "join", "dup")
GRID = [(1.2, 0.75), (0.9, 0.4), (1.8, 0.9), (1.2, 0.0)]


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_bm25_curve_matches_float_bm25(spark, sf_dir):
    got = {
        (r["k1_milli"], r["b_milli"]): r
        for r in _rows(spark, sf_dir, "q507_bm25_parameter_curve")
    }
    t = load_tables(spark, sf_dir)
    docs = {
        r["doc_id"]: [w for w in r["text"].lower().strip().split() if w]
        for r in t["documents"].select("doc_id", "text").collect()
    }
    n_corpus = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n_corpus
    df = Counter()
    tf = {}
    for did, toks in docs.items():
        c = Counter(w for w in toks if w in QUERY_TERMS)
        if c:
            tf[did] = c
            for w in c:
                df[w] += 1
    tops = {}
    for k1, b in GRID:
        scores = {}
        for did, c in tf.items():
            dl = len(docs[did])
            s = 0
            for w, f in c.items():
                idf = math.log((n_corpus - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
                term = idf * (f * (k1 + 1)) / (
                    f + k1 * (1 - b + b * dl / avgdl)
                )
                s += math.floor(term * 1e7)
            scores[did] = s
        key = (round(k1 * 1000), round(b * 1000))
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[key] = {d for d, _s in ranked[:10]}
        assert got[key]["n_scored"] == len(scores)
        assert got[key]["mean_q"] == sum(scores.values()) // len(scores)
    base = tops[(1200, 750)]
    for key, top in tops.items():
        assert got[key]["top10_overlap"] == len(top & base)


def test_paired_ttest_matches_statistics(spark, sf_dir):
    got = _rows(spark, sf_dir, "q508_paired_ttest")[0]
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "ts", "event_id", "value").collect():
        per_user[r["user_id"]].append(
            (r["ts"], r["event_id"], math.floor(r["value"] * 1000))
        )
    ds = []
    for evs in per_user.values():
        if len(evs) < 4:
            continue
        evs.sort()
        h = len(evs) // 2
        m1 = sum(x for _t, _i, x in evs[:h]) / h
        m2 = sum(x for _t, _i, x in evs[h:]) / (len(evs) - h)
        ds.append(math.floor(m2 - m1))
    mean = statistics.fmean(ds)
    se = math.sqrt(statistics.variance(ds) / len(ds))
    tstat = mean / se
    assert got["n_users"] == len(ds)
    assert abs(got["mean_diff_q"] - mean) < 1.0
    assert abs(got["t_q"] / 1e6 - tstat) < 1e-3
    assert got["significant"] == (abs(tstat) >= 1.98)


def test_holm_matches_stepdown_loop(spark, sf_dir):
    got = _rows(spark, sf_dir, "q509_holm_bonferroni")[0]
    t = load_tables(spark, sf_dir)
    cells = defaultdict(lambda: [0, 0])
    for r in t["events"].select("event_type", "ts", "value").collect():
        key = (r["event_type"], r["ts"].hour)
        cells[key][0] += 1
        cells[key][1] += 1 if r["value"] > 100 else 0
    nt = sum(v[0] for v in cells.values())
    kt = sum(v[1] for v in cells.values())
    pbar = kt / nt
    ps = []
    for (et, h), (n, k) in cells.items():
        if n < 5:
            continue
        z = (k / n - pbar) / math.sqrt(pbar * (1 - pbar) / n)
        p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(min(abs(z), 6.0) / math.sqrt(2))))
        ps.append((p, et, h))
    ps.sort()
    m = len(ps)
    n_bonf = sum(1 for p, _e, _h in ps if p <= 0.05 / m)
    n_holm = 0
    for i, (p, _e, _h) in enumerate(ps, start=1):
        if p <= 0.05 / (m - i + 1):
            n_holm += 1
        else:
            break
    assert got["m"] == m
    # interpolated-Phi p-values vs math.erf: allow +-1 at the rejection
    # boundary (the table step is 0.1 in z)
    assert abs(got["n_rej_bonferroni"] - n_bonf) <= 1
    assert abs(got["n_rej_holm"] - n_holm) <= 1
    assert got["n_rej_holm"] >= got["n_rej_bonferroni"]
    assert abs(got["min_p_n"] / 1e9 - ps[0][0]) < 6e-4


def test_moods_median_matches_loops(spark, sf_dir):
    got = {r["event_type"]: r for r in _rows(spark, sf_dir, "q510_moods_median")}
    t = load_tables(spark, sf_dir)
    rows = [
        (r["event_type"], math.floor(r["value"] * 100))
        for r in t["events"].select("event_type", "value").collect()
    ]
    xs = sorted(x for _e, x in rows)
    med = xs[(len(xs) + 1) // 2 - 1]
    g = defaultdict(lambda: [0, 0])
    for et, x in rows:
        g[et][0] += 1
        g[et][1] += 1 if x > med else 0
    n = sum(v[0] for v in g.values())
    a = sum(v[1] for v in g.values())
    chi_m = 0
    for et, (n_g, above) in g.items():
        ea = n_g * a / n
        eb = n_g * (n - a) / n
        chi_m += math.floor((above - ea) ** 2 / ea * 1e3)
        chi_m += math.floor(((n_g - above) - eb) ** 2 / eb * 1e3)
        assert got[et]["n_g"] == n_g
        assert got[et]["above_ppm"] == above * 1000000 // n_g
    for et in g:
        assert got[et]["chi2_m"] == chi_m
        assert got[et]["dof"] == len(g) - 1
