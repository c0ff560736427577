"""Round-9v reference tests: independent pure-Python replicas of the
tuning-advisor batch (q502-q505).

- q502: per-user sorted-gap loops, session-count identity checked
  against a literal session assembly.
- q503: Counter-ranked top-k set overlaps.
- q504: sorted-list winsorization.
- q505: arithmetic re-derivation of the advisor table.
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


def test_session_gap_curve_matches_assembly(spark, sf_dir):
    got = {r["gap_s"]: r for r in _rows(spark, sf_dir, "q502_session_gap_curve")}
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "ts", "event_id").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"]))
    n_events = sum(len(v) for v in per_user.values())
    n_users = len(per_user)
    for thr in (600, 1800, 3600):
        sessions = 0
        breaks = 0
        for evs in per_user.values():
            evs.sort()
            # literal session assembly: new session on first event or
            # on a gap exceeding the threshold
            sessions += 1
            for a, b in zip(evs, evs[1:]):
                gap = math.floor(b[0].timestamp() - a[0].timestamp())
                if gap > thr:
                    sessions += 1
                    breaks += 1
        assert got[thr]["n_sessions"] == sessions
        assert got[thr]["n_breaks"] == breaks
        assert got[thr]["events_per_session_milli"] == n_events * 1000 // sessions
        assert got[thr]["sessions_per_user_milli"] == sessions * 1000 // n_users
    # monotone: a larger allowed gap can only merge sessions
    ns = [got[t_]["n_sessions"] for t_ in (600, 1800, 3600)]
    assert ns == sorted(ns, reverse=True)


def test_topk_stability_matches_counters(spark, sf_dir):
    got = {r["k"]: r for r in _rows(spark, sf_dir, "q503_topk_stability")}
    t = load_tables(spark, sf_dir)
    tf = {0: Counter(), 1: Counter()}
    for r in t["documents"].select("doc_id", "text").collect():
        h = r["doc_id"] % 2
        for tok in r["text"].lower().strip().split():
            if tok:
                tf[h][tok] += 1
    for k in (10, 25, 50, 100):
        tops = {}
        for h in (0, 1):
            ranked = sorted(tf[h].items(), key=lambda kv: (-kv[1], kv[0]))
            tops[h] = {tok for tok, _n in ranked[:k]}
        common = len(tops[0] & tops[1])
        assert got[k]["n_common"] == common
        assert got[k]["jaccard_ppm"] == common * 1000000 // (2 * k - common)


def test_winsor_sensitivity_matches_sorted_list(spark, sf_dir):
    got = {r["p_milli"]: r for r in _rows(spark, sf_dir, "q504_winsor_sensitivity")}
    t = load_tables(spark, sf_dir)
    vs = sorted(
        math.floor(r["o_totalprice"] * 100 + 0.5)
        for r in t["orders"].select("o_totalprice").collect()
    )
    n = len(vs)
    for pm in (10, 25, 50):
        lo = vs[(n * pm + 999) // 1000 - 1]
        hi = vs[n - n * pm // 1000 - 1]
        clamped = [min(max(v, lo), hi) for v in vs]
        mean = int(sum(clamped) / n)
        assert got[pm]["lo_cents"] == lo
        assert got[pm]["hi_cents"] == hi
        assert abs(got[pm]["winsor_mean_cents"] - mean) <= 1
    # tighter caps pull the bounds inward
    assert got[10]["lo_cents"] <= got[25]["lo_cents"] <= got[50]["lo_cents"]
    assert got[10]["hi_cents"] >= got[25]["hi_cents"] >= got[50]["hi_cents"]


def test_shuffle_advisor_matches_arithmetic(spark, sf_dir):
    got = {r["tbl"]: r for r in _rows(spark, sf_dir, "q505_shuffle_advisor")}
    t = load_tables(spark, sf_dir)
    n_li = t["lineitem"].count()
    n_doc = t["documents"].count()
    chars = sum(r["n_chars"] for r in t["documents"].select("n_chars").collect())
    exp = {
        "lineitem": n_li * 96,
        "documents": chars + n_doc * 40,
    }
    for tbl, eb in exp.items():
        assert got[tbl]["est_bytes"] == eb
        assert got[tbl]["rec_partitions_128mb"] == max(
            1, (eb + 134217727) // 134217728
        )
        assert got[tbl]["rec_partitions_32mb"] == max(
            1, (eb + 33554431) // 33554432
        )
        assert got[tbl]["broadcastable"] == (eb <= 10485760)
    assert got["lineitem"]["n_rows"] == n_li
