"""Round-9f reference tests: independent pure-Python replicas of the
attribution / keyphrase / ESD / LM-eval batch (q438-q441).

- q438: per-user touch-list loop with float credit fractions (asserts
  the integer-ppm floor split stays within one quantum per touch).
- q439: direct RAKE over regex-split phrase runs with FLOAT
  degree/frequency scores.
- q440: the actual iterative remove-max loop with statistics.pstdev-
  style float moments; critical values re-derived with the same
  build-time helper (asserting the helper, not the literal).
- q441: dict-based bigram argmax + held-out scoring loop.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY, _RAKE_STOP, _esd_lambdas

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_ushape_matches_python(spark, sf_dir):
    got = {r["channel"]: r for r in _rows(spark, sf_dir, "q438_ushape_attribution")}
    t = load_tables(spark, sf_dir)
    ev = sorted(
        (r["user_id"], r["ts"], r["event_id"], r["event_type"])
        for r in t["events"].collect()
    )
    first_purchase = {}
    for u, ts, _, et in ev:
        if et == "purchase" and (u not in first_purchase or ts < first_purchase[u]):
            first_purchase[u] = ts
    touches = defaultdict(list)
    for u, ts, eid, et in ev:
        if (
            u in first_purchase
            and ts < first_purchase[u]
            and et in ("view", "click", "signup")
        ):
            touches[u].append((ts, eid, et))
    n = Counter()
    ppm = Counter()
    for u, tl in touches.items():
        tl.sort()
        k = len(tl)
        for pos, (_, _, et) in enumerate(tl, start=1):
            n[et] += 1
            if k == 1:
                ppm[et] += 1000000
            elif k == 2:
                ppm[et] += 500000
            elif pos in (1, k):
                ppm[et] += 400000
            else:
                ppm[et] += 200000 // (k - 2)
    assert set(got) == set(n)
    for ch in n:
        assert got[ch]["n_touches"] == n[ch]
        assert got[ch]["credit_ppm"] == ppm[ch]


def test_rake_matches_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q439_rake_keyphrases")
    t = load_tables(spark, sf_dir)
    phrases = Counter()
    for r in t["documents"].select("text").collect():
        toks = [w for w in r["text"].lower().strip().split() if w]
        run = []
        for w in toks + [_RAKE_STOP[0]]:  # sentinel flush
            if w in _RAKE_STOP:
                if run and len(run) <= 4:
                    phrases[" ".join(run)] += 1
                run = []
            else:
                run.append(w)
    freq = Counter()
    degree = Counter()
    for ph, cnt in phrases.items():
        ws = ph.split(" ")
        for w in ws:
            freq[w] += cnt
            degree[w] += len(ws) * cnt
    scored = sorted(
        (
            (
                sum(
                    (degree[w] * 1000000) // freq[w]
                    for w in set(ph.split(" "))
                ),
                ph,
                cnt,
            )
            for ph, cnt in phrases.items()
        ),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    assert len(got) == len(scored)
    for row, (score, ph, cnt) in zip(got, scored):
        assert (row["phrase"], row["n_occurrences"]) == (ph, cnt)
        assert row["score_micro"] == score


def test_generalized_esd_matches_python(spark, sf_dir):
    got = {r["esd_round"]: r for r in _rows(spark, sf_dir, "q440_generalized_esd")}
    t = load_tables(spark, sf_dir)
    daily = Counter()
    for r in t["events"].filter("event_type = 'purchase'").select("ts").collect():
        daily[r["ts"].day] += 1
    rem = dict(daily)
    lams = _esd_lambdas(31, 3)
    for i in (1, 2, 3):
        n = len(rem)
        mu = sum(rem.values()) / n
        sd = math.sqrt(
            sum((v - mu) ** 2 for v in rem.values()) / (n - 1)
        )
        # argmax |y - mean|, day tiebreak (the engines compare the
        # exact integer |y*n - s| scale; equivalent ordering)
        day = min(rem, key=lambda d: (-abs(rem[d] * n - sum(rem.values())), d))
        r_stat = abs(rem[day] - mu) / sd
        row = got[i]
        assert row["day_removed"] == day
        assert row["y_removed"] == rem[day]
        assert abs(row["r_stat"] - r_stat) < 1e-5
        assert abs(row["lambda_crit"] - lams[i - 1]) < 1e-9
        assert row["flagged"] == (row["r_stat"] > row["lambda_crit"])
        del rem[day]


def test_bigram_next_token_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q441_bigram_next_token")[0]
    t = load_tables(spark, sf_dir)
    train = Counter()
    test = []
    for r in t["documents"].select("doc_id", "text").collect():
        fold = (
            int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
            % 5
        )
        toks = [w for w in r["text"].lower().strip().split() if w]
        for w1, w2 in zip(toks, toks[1:]):
            if fold == 0:
                test.append((w1, w2))
            else:
                train[(w1, w2)] += 1
    best = {}
    for (w1, w2), c in sorted(train.items()):
        cur = best.get(w1)
        if cur is None or c > cur[0] or (c == cur[0] and w2 < cur[1]):
            best[w1] = (c, w2)
    correct = sum(
        1 for w1, w2 in test if w1 in best and best[w1][1] == w2
    )
    assert row["n_test_bigrams"] == len(test)
    assert row["n_correct"] == correct
    assert row["acc_ppm"] == (correct * 1000000) // len(test)
