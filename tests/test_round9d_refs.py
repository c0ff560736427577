"""Round-9d reference tests: independent pure-Python replicas of the
spectral / robust-outlier / decomposition / mining batch (q427-q432).
Different derivations than both engine spellings:

- q427: cmath complex exponential sum in FLOAT (vs the engines'
  micro-literal integer sums) — asserts quantization stays bounded.
- q428: statistics.quantiles-style manual interpolation + direct count.
- q429: textbook float ACF (mean-subtracted) and Ljung-Box.
- q430: float moving average / ratio-to-MA decomposition.
- q431: per-anchor max loops with Python float cosine.
- q432: set-intersection containment over STRING trigrams (the engines
  use 64-bit hashed shingles).
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


def _hourly(spark, sf_dir, pred=None):
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    if pred:
        ev = ev.filter(pred)
    out = Counter()
    for r in ev.select("ts").collect():
        out[(r["ts"].day - 1) * 24 + r["ts"].hour] += 1
    return out


def test_periodogram_matches_python(spark, sf_dir):
    got = {r["component"]: r for r in _rows(spark, sf_dir, "q427_periodogram")}
    hourly = _hourly(spark, sf_dir)
    daily = Counter()
    for t, y in hourly.items():
        daily[t // 24 + 1] += y
    for comp, series, period, phase in (
        ("daily_cycle", hourly, 24, lambda t: t % 24),
        ("weekly_cycle", daily, 7, lambda d: (d - 1) % 7),
    ):
        re = sum(
            y * math.cos(2 * math.pi * phase(t) / period)
            for t, y in series.items()
        )
        im = sum(
            y * math.sin(2 * math.pi * phase(t) / period)
            for t, y in series.items()
        )
        row = got[comp]
        assert row["n_points"] == len(series)
        tot = sum(series.values())
        # micro-literal quantization drifts <= total_count * 1e-6 per sum
        assert abs(row["re_micro"] / 1e6 - re) < tot * 2e-6 + 1
        assert abs(row["im_micro"] / 1e6 - im) < tot * 2e-6 + 1
        drift = 2 * (abs(re) + abs(im) + 1) * (tot * 2e-6 + 1)
        assert abs(row["power"] - (re * re + im * im)) < drift + 1


def test_tukey_matches_python(spark, sf_dir):
    got = {
        r["l_returnflag"]: r for r in _rows(spark, sf_dir, "q428_tukey_outliers")
    }
    t = load_tables(spark, sf_dir)
    groups = defaultdict(list)
    for r in t["lineitem"].select("l_returnflag", "l_extendedprice").collect():
        groups[r["l_returnflag"]].append(r["l_extendedprice"])
    for flag, vals in groups.items():
        vals.sort()
        n = len(vals)

        def interp(p):
            h = (n - 1) * p
            lo = math.floor(h)
            return vals[lo] + (h - lo) * (vals[min(lo + 1, n - 1)] - vals[lo])

        q1, q3 = round(interp(0.25), 2), round(interp(0.75), 2)
        row = got[flag]
        assert row["n"] == n
        assert abs(row["q1"] - q1) < 0.02 and abs(row["q3"] - q3) < 0.02
        iqr = row["q3"] - row["q1"]  # use engine quartiles for the fences
        lo_f, hi_f = row["q1"] - 1.5 * iqr, row["q3"] + 1.5 * iqr
        assert row["n_low"] == sum(1 for v in vals if v < lo_f)
        assert row["n_high"] == sum(1 for v in vals if v > hi_f)


def test_ljung_box_matches_python(spark, sf_dir):
    got = {r["k"]: r for r in _rows(spark, sf_dir, "q429_ljung_box")}
    hourly = _hourly(spark, sf_dir)
    ts = sorted(hourly)
    y = {t: hourly[t] for t in ts}
    n = len(ts)
    mu = sum(y.values()) / n
    den = sum((v - mu) ** 2 for v in y.values())
    q = 0.0
    for k in range(1, 11):
        num = sum(
            (y[t] - mu) * (y[t + k] - mu) for t in ts if (t + k) in y
        )
        rk = num / den
        q += n * (n + 2) * rk * rk / (n - k)
        assert abs(got[k]["acf"] - rk) < 1e-5
        assert abs(got[k]["q_lb"] - q) < 1e-3


def test_decomposition_matches_python(spark, sf_dir):
    got = {r["day"]: r for r in _rows(spark, sf_dir, "q430_classical_decomposition")}
    t = load_tables(spark, sf_dir)
    daily = Counter()
    for r in t["events"].filter("event_type = 'purchase'").select("ts").collect():
        daily[r["ts"].day] += 1
    days = sorted(daily)
    full = [d for d in days if days.index(d) >= 3 and days.index(d) < len(days) - 3]
    ratios = {}
    for d in full:
        i = days.index(d)
        s7 = sum(daily[days[j]] for j in range(i - 3, i + 4))
        trend = s7 / 7
        ratios[d] = daily[d] / trend
        row = got[d]
        assert row["n_purchases"] == daily[d]
        assert abs(row["trend_micro"] / 1e6 - trend) < 1e-5
        assert abs(row["ratio_micro"] / 1e6 - ratios[d]) < 1e-5
    dowmeans = defaultdict(list)
    for d, r in ratios.items():
        dowmeans[(d - 1) % 7].append(r)
    for d in full:
        s = sum(dowmeans[(d - 1) % 7]) / len(dowmeans[(d - 1) % 7])
        row = got[d]
        # integer-mean of micro ratios vs float mean: <= 1e-6 * k drift
        assert abs(row["seasonal_micro"] / 1e6 - s) < 1e-4
        assert abs(row["remainder_ppm"] / 1e6 - ratios[d] / s) < 1e-3


def test_hard_negative_mining_matches_python(spark, sf_dir):
    import hashlib

    got = {r["anchor_id"]: r for r in _rows(spark, sf_dir, "q431_triplet_margin")}
    t = load_tables(spark, sf_dir)
    embs = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in t["embeddings"].collect()
    }
    anchors = [
        v
        for v in embs
        if int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 11 == 0
    ]
    assert set(got) == set(anchors)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(
            sum(x * x for x in a) * sum(y * y for y in b)
        )

    for v in anchors:
        a_emb, a_lab = embs[v]
        pos = max(
            cos(a_emb, e) for u, (e, lab) in embs.items()
            if u != v and lab == a_lab
        )
        neg = max(
            cos(a_emb, e) for u, (e, lab) in embs.items()
            if u != v and lab != a_lab
        )
        row = got[v]
        assert row["anchor_label"] == a_lab
        assert abs(row["best_positive"] - pos) < 1e-5
        assert abs(row["hardest_negative"] - neg) < 1e-5
        assert abs(row["margin"] - (pos - neg)) < 2e-5


def test_containment_matches_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q432_containment_pairs")
    t = load_tables(spark, sf_dir)
    sh = {}
    for r in t["documents"].select("doc_id", "text").collect():
        toks = [w for w in r["text"].lower().strip().split() if w]
        sh[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    scored = []
    ids = sorted(sh)
    for a in ids:
        if not sh[a]:
            continue
        for b in ids:
            if a == b or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter * 10 >= len(sh[a]) * 9:
                scored.append(
                    (
                        round(inter / len(sh[a]), 6),
                        a,
                        b,
                        inter / (len(sh[a]) + len(sh[b]) - inter),
                    )
                )
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = scored[:25]
    assert len(got) == len(want)
    for row, (cont, a, b, jac) in zip(got, want):
        assert (row["id_a"], row["id_b"]) == (a, b)
        assert abs(row["containment"] - cont) < 1e-6
        assert abs(row["jaccard"] - jac) < 1e-5
