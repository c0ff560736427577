"""Round-9g reference tests: independent pure-Python replicas of the
richness / shrinkage / elasticity / ensemble batch (q442-q445).

- q442: Counter over STRING trigrams (engines hash shingles).
- q443: float beta-binomial MoM over raw float rates (asserts the ppm
  quantization bound).
- q444: float least-squares on math.log values.
- q445: the three detectors re-derived independently with float
  arithmetic and statistics.median.
"""

from __future__ import annotations

import math
import statistics
from collections import Counter

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def test_chao1_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q442_chao1_richness")[0]
    t = load_tables(spark, sf_dir)
    cnt = Counter()
    for r in t["documents"].select("text").collect():
        toks = [w for w in r["text"].lower().strip().split() if w]
        cnt.update({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    s_obs = len(cnt)
    n_total = sum(cnt.values())
    f1 = sum(1 for c in cnt.values() if c == 1)
    f2 = sum(1 for c in cnt.values() if c == 2)
    assert (row["s_obs"], row["n_total"], row["f1"], row["f2"]) == (
        s_obs,
        n_total,
        f1,
        f2,
    )
    assert abs(
        row["chao1_estimate"] - (s_obs + f1 * (f1 - 1) / (2 * (f2 + 1)))
    ) < 1e-3
    assert row["gt_unseen_mass_ppm"] == (f1 * 1000000) // n_total


def test_eb_shrinkage_matches_python(spark, sf_dir):
    got = {r["p_brand"]: r for r in _rows(spark, sf_dir, "q443_eb_shrinkage")}
    t = load_tables(spark, sf_dir)
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    x = Counter()
    n = Counter()
    for r in t["lineitem"].select("l_partkey", "l_returnflag").collect():
        b = brand[r["l_partkey"]]
        n[b] += 1
        if r["l_returnflag"] == "R":
            x[b] += 1
    rates = [x[b] / n[b] for b in n]
    k = len(rates)
    m = sum(rates) / k
    v = sum(r * r for r in rates) / k - m * m
    alpha = m * (m * (1 - m) / v - 1)
    beta = (1 - m) * (m * (1 - m) / v - 1)
    assert set(got) == set(n)
    for b in n:
        row = got[b]
        assert (row["x"], row["n"]) == (x[b], n[b])
        assert row["r_ppm"] == (x[b] * 1000000) // n[b]
        # the engines fit the prior on ppm-quantized rates: alpha/beta
        # drift by at most ~0.1% of themselves
        assert abs(row["alpha"] - alpha) < abs(alpha) * 2e-3 + 1e-3
        assert abs(row["beta"] - beta) < abs(beta) * 2e-3 + 1e-3
        want = (x[b] + alpha) * 1e6 / (n[b] + alpha + beta)
        assert abs(row["shrunk_ppm"] - want) < 500  # quantized prior drift


def test_elasticity_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q444_price_elasticity")[0]
    t = load_tables(spark, sf_dir)
    price = {r["p_partkey"]: r["p_retailprice"] for r in t["part"].collect()}
    qty = Counter()
    for r in t["lineitem"].select("l_partkey", "l_quantity").collect():
        qty[r["l_partkey"]] += round(r["l_quantity"] * 100) / 100
    xs, ys = [], []
    for pk, q in qty.items():
        xs.append(math.log(price[pk]))
        ys.append(math.log(q))
    nn = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(a * a for a in xs)
    sxy = sum(a * b for a, b in zip(xs, ys))
    syy = sum(b * b for b in ys)
    slope = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    r2 = (nn * sxy - sx * sy) ** 2 / (
        (nn * sxx - sx * sx) * (nn * syy - sy * sy)
    )
    assert row["n_parts"] == nn
    assert abs(row["elasticity"] - slope) < 5e-3  # micro-nat quantization
    assert abs(row["intercept_ln"] - (sy - slope * sx) / nn) < 5e-3
    assert abs(row["r2"] - r2) < 5e-3


def test_anomaly_consensus_matches_python(spark, sf_dir):
    got = {r["day"]: r for r in _rows(spark, sf_dir, "q445_anomaly_consensus")}
    t = load_tables(spark, sf_dir)
    daily = Counter()
    for r in t["events"].filter("event_type = 'purchase'").select("ts").collect():
        daily[r["ts"].day] += 1
    days = sorted(daily)
    ys = [daily[d] for d in days]
    n = len(ys)
    mu = sum(ys) / n
    sd = math.sqrt(sum((y - mu) ** 2 for y in ys) / (n - 1))
    med = statistics.median(ys)
    mad = statistics.median([abs(y - med) for y in ys])
    cum = 0.0
    runmin = 0.0
    sp = {}
    for d in days:
        cum += daily[d] - mu
        runmin = min(runmin, cum)
        sp[d] = cum - runmin
    flagged = {}
    for d in days:
        y = daily[d]
        z = 1 if abs(y - mu) > 2.0 * sd else 0
        mz = 1 if mad > 0 and abs(y - med) > 2.5 * 1.4826 * mad else 0
        cz = 1 if sp[d] > 3.0 * sd else 0
        if z + mz + cz >= 1:
            flagged[d] = (z, mz, cz)
    assert set(got) == set(flagged)
    for d, (z, mz, cz) in flagged.items():
        row = got[d]
        assert (row["z_flag"], row["mad_flag"], row["cusum_flag"]) == (
            z,
            mz,
            cz,
        )
        assert row["votes"] == z + mz + cz
