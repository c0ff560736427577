"""Round-9t reference tests: independent pure-Python replicas of the
pipeline-tuning curve batch (q494-q497).

All four rebuild the curves from raw collects with dict/set loops
(literal pair cosines, re-implemented quality score, n-gram sets,
sorted-binning pass rates).
"""

from __future__ import annotations

import math
import re
import string
from collections import defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache

STOP_EN = None  # loaded lazily from the operator's marker table


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _quality(text):
    """Re-implementation of the q47 composite score."""
    from tytodb_spark.operators.textual import LANG_MARKERS

    n_chars = len(text)
    safe = max(n_chars, 1)
    n_alpha = sum(1 for c in text if c.isascii() and c.isalpha())
    n_digit = sum(1 for c in text if c.isdigit())
    n_punct = sum(1 for c in text if c in string.punctuation)
    toks = [w for w in text.lower().strip().split() if w]
    tok_safe = max(len(toks), 1)
    stop = set(LANG_MARKERS["en"])
    n_stop = len(re.findall(r"\b(" + "|".join(stop) + r")\b", text.lower()))
    raw = (
        0.4 * (n_alpha / safe)
        + 0.3 * min((n_stop / tok_safe) * 4, 1.0)
        + 0.3 * min(len(toks) / 64.0, 1.0)
        - 0.2 * (n_digit / safe)
        - 0.2 * (n_punct / safe)
    )
    return round(max(min(raw, 1.0), 0.0), 6)


def test_dedup_threshold_curve_matches_pair_loop(spark, sf_dir):
    got = {r["thr_pct"]: r for r in _rows(spark, sf_dir, "q494_dedup_threshold_curve")}
    t = load_tables(spark, sf_dir)
    by_label = defaultdict(list)
    for r in t["embeddings"].select("vec_id", "label", "embedding").collect():
        by_label[r["label"]].append((r["vec_id"], [float(x) for x in r["embedding"]]))
    pairs = []
    for vs in by_label.values():
        vs.sort()
        for i in range(len(vs)):
            for j in range(i + 1, len(vs)):
                a, b = vs[i][1], vs[j][1]
                dot = sum(x * y for x, y in zip(a, b))
                na = math.sqrt(sum(x * x for x in a))
                nb = math.sqrt(sum(x * x for x in b))
                pairs.append((vs[j][0], round(dot / (na * nb), 6)))
    nv = sum(len(v) for v in by_label.values())
    for thr in (30, 35, 40, 45, 50):
        hits = [(b, c) for b, c in pairs if c >= thr / 100.0]
        dups = {b for b, _c in hits}
        assert got[thr]["n_pairs"] == len(hits)
        assert got[thr]["n_dups"] == len(dups)
        assert got[thr]["dup_ppm"] == len(dups) * 1000000 // nv


def test_quality_tradeoff_matches_loops(spark, sf_dir):
    got = {r["thr_pct"]: r for r in _rows(spark, sf_dir, "q495_quality_tradeoff_curve")}
    t = load_tables(spark, sf_dir)
    scored = []
    for r in t["documents"].select("text").collect():
        toks = [w for w in r["text"].lower().strip().split() if w]
        scored.append((_quality(r["text"]), len(toks)))
    nd = len(scored)
    nt = sum(n for _q, n in scored)
    for thr in (20, 30, 40, 50, 60):
        kd = sum(1 for q, _n in scored if q >= thr / 100.0)
        kt = sum(n for q, n in scored if q >= thr / 100.0)
        assert got[thr]["kept_docs"] == kd
        assert got[thr]["kept_tokens"] == kt
        assert got[thr]["doc_ppm"] == kd * 1000000 // nd
        assert got[thr]["token_ppm"] == kt * 1000000 // nt
    # the curve must be monotone non-increasing in the threshold
    docs = [got[t_]["kept_docs"] for t_ in (20, 30, 40, 50, 60)]
    assert docs == sorted(docs, reverse=True)


def _word_ngrams(text, n):
    toks = [w for w in text.lower().strip().split() if w]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_overlap_curve_matches_set_loops(spark, sf_dir):
    got = {r["n"]: r for r in _rows(spark, sf_dir, "q496_overlap_curve")}
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "source", "text").collect()
    bench = [r for r in docs if r["source"] == "src0"]
    train = [r for r in docs if r["source"] != "src0"]
    for n in (3, 5, 8):
        probe = set()
        for r in bench:
            probe |= _word_ngrams(r["text"], n)
        flagged = sum(
            1 for r in train if _word_ngrams(r["text"], n) & probe
        )
        assert got[n]["bench_grams"] == len(probe)
        assert got[n]["flagged_docs"] == flagged
        assert got[n]["flagged_ppm"] == flagged * 1000000 // len(train)
    # more context per gram -> fewer spurious overlaps
    assert got[3]["flagged_docs"] >= got[5]["flagged_docs"] >= got[8]["flagged_docs"]


def test_length_bias_matches_sorted_binning(spark, sf_dir):
    got = {r["decile"]: r for r in _rows(spark, sf_dir, "q497_length_bias_audit")}
    t = load_tables(spark, sf_dir)
    vc = defaultdict(lambda: [0, 0])
    for r in t["documents"].select("text", "n_chars").collect():
        p = 1 if _quality(r["text"]) >= 0.4 else 0
        vc[r["n_chars"]][0] += 1
        vc[r["n_chars"]][1] += p
    tot = sum(n for n, _p in vc.values())
    per = defaultdict(lambda: [0, 0, 0])
    pre = 0
    for nc in sorted(vc):
        n, np_ = vc[nc]
        b = min(9, (pre * 10) // tot)
        per[b][0] += n
        per[b][1] += np_
        per[b][2] += nc * n
        pre += n
    rates = {b: v[1] * 1000000 // v[0] for b, v in per.items()}
    gap = max(rates.values()) - min(rates.values())
    assert set(got) == set(per)
    for b, (n_docs, n_pass, chars) in per.items():
        assert got[b]["n_docs"] == n_docs
        assert got[b]["pass_ppm"] == rates[b]
        assert got[b]["mean_chars"] == chars // n_docs
        assert got[b]["pass_gap_ppm"] == gap
