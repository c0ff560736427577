"""Round-9k reference tests: independent pure-Python replicas of the
eval/agreement/calibration/fairness batch (q458-q461).

- q458: exact math.comb binomials (vs the engines' telescoping
  5-factor product).
- q459: textbook float Krippendorff alpha from a Counter coincidence
  matrix.
- q460: plain float accumulation of the Spiegelhalter Z terms (vs
  nano-quantized decimal sums).
- q461: dict-of-counts rate loops.
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


def test_pass_at_k_matches_comb(spark, sf_dir):
    got = _rows(spark, sf_dir, "q458_pass_at_k")[0]
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(lambda: [0, 0])
    for r in t["events"].select("user_id", "value").collect():
        a = per_user[r["user_id"]]
        a[0] += 1
        a[1] += 1 if r["value"] > 100.0 else 0
    ppms = []
    solved = 0
    for n, c in per_user.values():
        if n < 5:
            continue
        solved += 1 if c > 0 else 0
        if n - c < 5:
            ppms.append(1000000)
        else:
            est = 1.0 - math.comb(n - c, 5) / math.comb(n, 5)
            ppms.append(math.floor(est * 1e6 + 0.5))
    assert got["n_tasks"] == len(ppms)
    assert got["tasks_solved"] == solved
    # telescoping product vs comb ratio: same rational value, so the
    # ppm quantizations can differ only by float ulps at the boundary
    assert abs(got["sum_pass5_ppm"] - sum(ppms)) <= len(ppms)
    assert abs(got["mean_pass5_ppm"] - sum(ppms) // len(ppms)) <= 1


def test_krippendorff_matches_float_formula(spark, sf_dir):
    got = _rows(spark, sf_dir, "q459_krippendorff_alpha")[0]
    t = load_tables(spark, sf_dir)
    per_user = defaultdict(list)
    for r in t["events"].select("user_id", "ts", "event_id", "event_type").collect():
        per_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    o = Counter()
    for evs in per_user.values():
        if len(evs) < 2:
            continue
        evs.sort()
        c, k = evs[0][2], evs[-1][2]
        o[(c, k)] += 1
        o[(k, c)] += 1
    nc = Counter()
    for (c, _k), n in o.items():
        nc[c] += n
    n = sum(nc.values())
    d_o = sum(v for (c, k), v in o.items() if c != k)
    e_num = sum(
        nc[a] * nc[b] for a in nc for b in nc if a != b
    )
    alpha = 1.0 - d_o * (n - 1) / e_num
    assert got["n_values"] == n
    assert got["d_o"] == d_o
    assert got["e_num"] == e_num
    assert abs(got["alpha_q"] / 1e6 - alpha) < 2e-6


def test_spiegelhalter_matches_float_loop(spark, sf_dir):
    got = _rows(spark, sf_dir, "q460_spiegelhalter_z")[0]
    t = load_tables(spark, sf_dir)
    num = var = 0.0
    n = n_pos = 0
    for r in t["events"].select("value").collect():
        v = r["value"]
        p = 1.0 / (1.0 + math.exp(-(v - 50.0) / 25.0))
        y = 1 if v > 55.0 else 0
        num += (y - p) * (1.0 - 2.0 * p)
        var += (1.0 - 2.0 * p) ** 2 * p * (1.0 - p)
        n += 1
        n_pos += y
    z = num / math.sqrt(var)
    assert (got["n"], got["n_pos"]) == (n, n_pos)
    # engine floor-quantizes per row at 1e-9: bound |err| <= n * 1e-9
    # through the ratio, far inside 1e-3 on this data
    assert abs(got["z_q"] / 1e6 - z) < 1e-3
    assert got["miscalibrated"] == (abs(z) >= 1.96)


def test_fairness_audit_matches_dict_loops(spark, sf_dir):
    got = {r["source"]: r for r in _rows(spark, sf_dir, "q461_fairness_audit")}
    t = load_tables(spark, sf_dir)
    g = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n np tp pos fp neg
    for r in t["documents"].select("source", "lang", "n_chars").collect():
        yhat = 1 if r["n_chars"] >= 300 else 0
        y = 1 if r["lang"] == "en" else 0
        a = g[r["source"]]
        a[0] += 1
        a[1] += yhat
        a[2] += y * yhat
        a[3] += y
        a[4] += (1 - y) * yhat
        a[5] += 1 - y
    rates = {}
    for s, (n, np_, tp, pos, fp, neg) in g.items():
        rates[s] = (
            np_ * 1000000 // n,
            tp * 1000000 // pos if pos else 0,
            fp * 1000000 // neg if neg else 0,
        )
    assert set(got) == set(rates)
    for s, (sel, tpr, fpr) in rates.items():
        assert (got[s]["sel_ppm"], got[s]["tpr_ppm"], got[s]["fpr_ppm"]) == (
            sel,
            tpr,
            fpr,
        )
    sels = [v[0] for v in rates.values()]
    tprs = [v[1] for v in rates.values()]
    fprs = [v[2] for v in rates.values()]
    any_row = next(iter(got.values()))
    assert any_row["dp_gap_ppm"] == max(sels) - min(sels)
    assert any_row["eo_gap_ppm"] == max(tprs) - min(tprs)
    assert any_row["fpr_gap_ppm"] == max(fprs) - min(fprs)
