"""Round-9q reference tests: independent pure-Python replicas of the
LLM-pipeline planning batch (q482-q485).

- q482: per-doc integer span accounting.
- q483: textbook float alpha-sampling (n^0.5 / sum n^0.5).
- q484: empirical E[max of n] CHECKED BY BRUTE FORCE over all m^n
  draw combinations for small tasks (the order-statistic identity's
  strongest test), float identity for the rest.
- q485: float kappa + Spearman-Brown projection.
"""

from __future__ import annotations

import math
from collections import defaultdict
from itertools import product

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _toks(text):
    return [w for w in text.lower().strip().split() if w]


def test_span_corruption_matches_int_loops(spark, sf_dir):
    got = {r["source"]: r for r in _rows(spark, sf_dir, "q482_span_corruption_stats")}
    t = load_tables(spark, sf_dir)
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in t["documents"].select("source", "text").collect():
        n = len(_toks(r["text"]))
        if n < 7:
            continue
        spans = max(1, (n * 15 + 50) // 100 // 3)
        a = agg[r["source"]]
        a[0] += 1
        a[1] += n
        a[2] += spans
        a[3] += spans * 3
        a[4] += n - spans * 3 + spans
        a[5] += spans * 3 + spans + 1
    assert set(got) == set(agg)
    for s, (nd, tok, sp, cor, inp, tgt) in agg.items():
        row = got[s]
        assert (row["n_docs"], row["tokens"], row["spans"]) == (nd, tok, sp)
        assert (row["corrupted_tokens"], row["input_tokens"]) == (cor, inp)
        assert row["target_tokens"] == tgt
        assert row["noise_ppm"] == cor * 1000000 // tok


def test_mixture_temperature_matches_alpha_sampling(spark, sf_dir):
    got = {r["lang"]: r for r in _rows(spark, sf_dir, "q483_mixture_temperature")}
    t = load_tables(spark, sf_dir)
    ntok = defaultdict(int)
    for r in t["documents"].select("lang", "text").collect():
        ntok[r["lang"]] += len(_toks(r["text"]))
    tot = sum(ntok.values())
    wsum = sum(math.sqrt(n) for n in ntok.values())
    assert set(got) == set(ntok)
    for lang, n in ntok.items():
        raw = n / tot
        share = math.sqrt(n) / wsum
        assert got[lang]["n_tok"] == n
        assert got[lang]["raw_ppm"] == n * 1000000 // tot
        assert abs(got[lang]["temp_ppm"] / 1e6 - share) < 2e-6
        assert abs(got[lang]["upsample_milli"] / 1e3 - share / raw) < 2e-3


def test_best_of_n_matches_identity_and_bruteforce(spark, sf_dir):
    got = {r["n"]: r for r in _rows(spark, sf_dir, "q484_best_of_n")}
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "value").collect():
        per_user[r["user_id"]].append(math.floor(r["value"] * 100))
    tasks = {u: sorted(xs) for u, xs in per_user.items() if len(xs) >= 8}
    for n in (1, 2, 4, 8):
        emaxs = []
        for xs in tasks.values():
            m = len(xs)
            e = sum(
                math.floor(
                    x * ((i / m) ** n - ((i - 1) / m) ** n) * 1e3
                )
                for i, x in enumerate(xs, start=1)
            )
            emaxs.append(e)
        assert got[n]["n_tasks"] == len(emaxs)
        assert got[n]["mean_emax_m"] == sum(emaxs) // len(emaxs)
    # brute-force the identity on one small synthetic task: E[max of n
    # uniform-with-replacement draws] over all m^n combinations
    xs = [1, 5, 7, 10]
    m = len(xs)
    for n in (1, 2):
        brute = sum(max(c) for c in product(xs, repeat=n)) / m**n
        ident = sum(
            x * ((i / m) ** n - ((i - 1) / m) ** n)
            for i, x in enumerate(sorted(xs), start=1)
        )
        assert abs(brute - ident) < 1e-12


def test_spearman_brown_matches_float_projection(spark, sf_dir):
    got = {r["k"]: r for r in _rows(spark, sf_dir, "q485_spearman_brown")}
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs = []
    for evs in per_user.values():
        if len(evs) >= 2:
            evs.sort()
            pairs.append((evs[0][2], evs[-1][2]))
    n_units = len(pairs)
    po = sum(1 for a, b in pairs if a == b) / n_units
    marg = defaultdict(int)
    for a, b in pairs:
        marg[a] += 1
        marg[b] += 1
    mt = sum(marg.values())
    pe = sum(v * v for v in marg.values()) / (mt * mt)
    rel = (po - pe) / (1 - pe)
    assert set(got) == {2, 3, 5, 10}
    for k in (2, 3, 5, 10):
        rel_k = k * rel / (1 + (k - 1) * rel)
        assert got[k]["n_units"] == n_units
        assert abs(got[k]["rel1_q"] / 1e6 - rel) < 2e-6
        assert abs(got[k]["relk_q"] / 1e6 - rel_k) < 2e-6
        assert got[k]["meets_target"] == (rel_k >= 0.8)
