"""Round-9n reference tests: independent pure-Python replicas of the
embedding-geometry / vocabulary batch (q470-q473).

- q470: literal O(n^2) pairwise-cosine mean (vs the ||sum u||^2
  identity) — the strongest possible check of the closed form.
- q471: Counter-of-Counters Good-Turing.
- q472: textbook float W/B scatter loops.
- q473: numpy-free covariance from explicit loops, PR from traces.
"""

from __future__ import annotations

import math
import re
from collections import Counter

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _vecs(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return [
        (r["vec_id"], r["label"], [float(x) for x in r["embedding"]])
        for r in t["embeddings"].select("vec_id", "label", "embedding").collect()
    ]


def test_anisotropy_matches_pairwise_mean(spark, sf_dir):
    got = _rows(spark, sf_dir, "q470_anisotropy")[0]
    vecs = [v for _i, _l, v in _vecs(spark, sf_dir)]
    units = []
    for v in vecs:
        nv = math.sqrt(sum(x * x for x in v))
        if nv > 0:
            units.append([x / nv for x in v])
    n = len(units)
    total = 0.0
    for i in range(n):
        for j in range(n):
            if i != j:
                total += sum(a * b for a, b in zip(units[i], units[j]))
    mean_cos = total / (n * (n - 1))
    assert got["n"] == n
    # engine quantizes per component at 1e-9 -> bound well inside 1e-4
    assert abs(got["anisotropy_q"] / 1e6 - mean_cos) < 1e-4


def test_good_turing_matches_counters(spark, sf_dir):
    got = {r["r"]: r for r in _rows(spark, sf_dir, "q471_good_turing")}
    t = load_tables(spark, sf_dir)
    tf = Counter()
    for r in t["documents"].select("text").collect():
        for tok in r["text"].lower().strip().split():
            if tok:
                tf[tok] += 1
    spec = Counter(tf.values())
    n_tokens = sum(tf.values())
    vocab = len(tf)
    assert set(got) == {r for r in spec if r <= 5}
    for r in got:
        n_r, n_r1 = spec[r], spec.get(r + 1, 0)
        assert got[r]["n_r"] == n_r
        assert got[r]["r_star_q"] == math.floor(
            (r + 1) * n_r1 / n_r * 1e6 + 0.5
        )
        assert got[r]["n_tokens"] == n_tokens
        assert got[r]["vocab"] == vocab
        assert got[r]["p0_ppm"] == spec[1] * 1000000 // n_tokens


def test_calinski_harabasz_matches_scatter_loops(spark, sf_dir):
    got = _rows(spark, sf_dir, "q472_calinski_harabasz")[0]
    data = _vecs(spark, sf_dir)
    by_label = {}
    for _i, lab, v in data:
        by_label.setdefault(lab, []).append(v)
    n = len(data)
    k = len(by_label)
    dim = len(data[0][2])
    gcent = [
        sum(v[d] for _i, _l, v in data) / n for d in range(dim)
    ]
    w = b = 0.0
    for lab, vs in by_label.items():
        cent = [sum(v[d] for v in vs) / len(vs) for d in range(dim)]
        w += sum(
            sum((v[d] - cent[d]) ** 2 for d in range(dim)) for v in vs
        )
        b += len(vs) * sum((cent[d] - gcent[d]) ** 2 for d in range(dim))
    ch = (b / (k - 1)) / (w / (n - k))
    assert (got["n"], got["k"]) == (n, k)
    # micro component quantization -> loose absolute tolerance on the
    # raw scatters, tight relative tolerance on the ratio
    assert abs(got["b_q"] / 1e3 - b) / b < 1e-3
    assert abs(got["w_q"] / 1e3 - w) / w < 1e-3
    assert abs(got["ch_q"] / 1e6 - ch) / ch < 2e-3


def test_participation_ratio_matches_trace_loops(spark, sf_dir):
    got = _rows(spark, sf_dir, "q473_participation_ratio")[0]
    vecs = [v for _i, _l, v in _vecs(spark, sf_dir)]
    n = len(vecs)
    dim = len(vecs[0])
    mu = [sum(v[d] for v in vecs) / n for d in range(dim)]
    c = [
        [
            sum(v[d1] * v[d2] for v in vecs) / n - mu[d1] * mu[d2]
            for d2 in range(dim)
        ]
        for d1 in range(dim)
    ]
    tr_c = sum(c[d][d] for d in range(dim))
    tr_c2 = sum(c[d1][d2] ** 2 for d1 in range(dim) for d2 in range(dim))
    pr = tr_c * tr_c / tr_c2
    assert (got["n"], got["dim"]) == (n, dim)
    assert abs(got["tr_c_q"] / 1e6 - tr_c) / tr_c < 1e-3
    assert abs(got["tr_c2_q"] / 1e6 - tr_c2) / tr_c2 < 1e-2
    assert abs(got["pr_q"] / 1e3 - pr) / pr < 1e-2
