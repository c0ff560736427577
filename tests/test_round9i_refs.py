"""Round-9i reference tests: independent pure-Python replicas of the
tokenizer-econ / clustering-eval / classifier-eval batch (q451-q453).

- q451: re.findall token counts (vs the engines' regexp_extract_all).
- q452: textbook float ARI from an itertools contingency.
- q453: per-class loops over a dict confusion matrix.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_fertility_matches_python(spark, sf_dir):
    got = {r["lang"]: r for r in _rows(spark, sf_dir, "q451_tokenizer_fertility")}
    t = load_tables(spark, sf_dir)
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, chars, ws, bpe
    pat = re.compile(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]")
    for r in t["documents"].select("lang", "text", "n_chars").collect():
        a = agg[r["lang"]]
        a[0] += 1
        a[1] += r["n_chars"]
        a[2] += len([w for w in r["text"].lower().strip().split() if w])
        a[3] += len(pat.findall(r["text"]))
    assert set(got) == set(agg)
    for lang, (nd, ch, ws, bpe) in agg.items():
        row = got[lang]
        assert (row["n_docs"], row["chars"]) == (nd, ch)
        assert (row["ws_tokens"], row["bpe_tokens"]) == (ws, bpe)
        assert abs(row["chars_per_bpe"] - ch / bpe) < 1e-3
        assert abs(row["fertility"] - bpe / ws) < 1e-3
        assert abs(row["chars_per_word"] - ch / ws) < 1e-3


def test_ari_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q452_adjusted_rand")[0]
    t = load_tables(spark, sf_dir)
    ct = Counter()
    for r in t["documents"].select("lang", "source").collect():
        ct[(r["lang"], r["source"])] += 1
    n = sum(ct.values())

    def c2(x):
        return x * (x - 1) // 2

    idx = sum(c2(v) for v in ct.values())
    rowsum, colsum = Counter(), Counter()
    for (lang, src), v in ct.items():
        rowsum[lang] += v
        colsum[src] += v
    ra = sum(c2(v) for v in rowsum.values())
    cb = sum(c2(v) for v in colsum.values())
    exp = ra * cb / c2(n)
    ari = (idx - exp) / ((ra + cb) / 2 - exp)
    assert row["n_docs"] == n
    assert (row["sum_comb_cells"], row["sum_comb_rows"]) == (idx, ra)
    assert row["sum_comb_cols"] == cb
    assert abs(row["ari"] - ari) < 1e-5


def test_prf_matches_python(spark, sf_dir):
    got = {r["lang"]: r for r in _rows(spark, sf_dir, "q453_multiclass_prf")}
    t = load_tables(spark, sf_dir)
    docs = [
        (r["lang"], r["source"])
        for r in t["documents"].select("lang", "source").collect()
    ]
    cnt = Counter(docs)
    by_source = defaultdict(Counter)
    for (lang, src), n in cnt.items():
        by_source[src][lang] += n
    pred = {
        src: min(
            (l for l, c in langs.items() if c == max(langs.values()))
        )
        for src, langs in by_source.items()
    }
    conf = Counter((lang, pred[src]) for lang, src in docs)
    classes = {lang for lang, _ in docs}
    assert set(got) == classes
    for c in classes:
        tp = conf.get((c, c), 0)
        fp = sum(v for (y, yh), v in conf.items() if y != c and yh == c)
        fn = sum(v for (y, yh), v in conf.items() if y == c and yh != c)
        row = got[c]
        assert (row["tp"], row["fp"], row["fn"]) == (tp, fp, fn)
        assert row["precision_ppm"] == (
            0 if tp + fp == 0 else (tp * 1000000) // (tp + fp)
        )
        assert row["recall_ppm"] == (
            0 if tp + fn == 0 else (tp * 1000000) // (tp + fn)
        )
        assert row["f1_ppm"] == (
            0
            if 2 * tp + fp + fn == 0
            else (2 * tp * 1000000) // (2 * tp + fp + fn)
        )
