"""Round-9 reference tests: independent pure-Python replicas of this
round's new formula operators (the discipline test_round6/7/8_refs
established — written the SAME round the queries ship, not one round
later). Where the registry query uses a closed-form or decorrelated
spelling, the reference re-derives the answer a different way:

- q386 JT: brute-force pairwise comparisons, not the prefix-sum trick.
- q389 Shapley: direct permutation-free subset enumeration per channel
  from raw per-user masks, not the factorial-grid join.
- q390: brute-force all-pairs cosine argmax in float, not the
  aggregate-then-join.
- q382/q384: direct per-part threshold/argmin loops.
- q385/q387/q388/q393/q394/q395/q396: textbook float formulas.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict
from itertools import combinations

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower().strip()) if t]


def test_small_order_revenue_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q382_small_order_revenue")[0]
    t = load_tables(spark, sf_dir)
    brand = {
        r["p_partkey"]
        for r in t["part"].filter("p_brand = 'Brand#3'").collect()
    }
    li = t["lineitem"].select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).collect()
    per: dict[int, list] = defaultdict(list)
    for r in li:
        if r["l_partkey"] in brand:
            per[r["l_partkey"]].append(
                (
                    math.floor(r["l_quantity"] * 100 + 0.5),
                    math.floor(r["l_extendedprice"] * 100 + 0.5),
                )
            )
    n_small = rev = 0
    for rows_ in per.values():
        sq = sum(q for q, _ in rows_)
        n = len(rows_)
        for q, p in rows_:
            if q * n * 5 < sq:
                n_small += 1
                rev += p
    assert (row["n_small_lines"], row["revenue_cents"]) == (n_small, rev)
    assert row["avg_yearly_cents"] == rev // 7


def test_min_cost_supplier_matches_python(spark, sf_dir):
    got = [
        (r["p_partkey"], r["s_name"], r["n_name"], r["cost_micro"])
        for r in sorted(
            _rows(spark, sf_dir, "q384_min_cost_supplier"),
            key=lambda r: r["p_partkey"],
        )
    ]
    t = load_tables(spark, sf_dir)
    nat = {r["n_nationkey"]: (r["n_name"], r["n_regionkey"])
           for r in t["nation"].collect()}
    eu_region = {
        r["r_regionkey"]
        for r in t["region"].filter("r_name = 'EUROPE'").collect()
    }
    eu = {}
    for r in t["supplier"].collect():
        nm, reg = nat[r["s_nationkey"]]
        if reg in eu_region:
            eu[r["s_suppkey"]] = (r["s_name"], nm)
    parts15 = {
        r["p_partkey"] for r in t["part"].filter("p_size = 15").collect()
    }
    cost: dict[tuple, int] = {}
    for r in t["lineitem"].collect():
        if r["l_partkey"] in parts15 and r["l_suppkey"] in eu:
            c = (
                math.floor(r["l_extendedprice"] * 100 + 0.5) * 1_000_000
                // math.floor(r["l_quantity"] * 100 + 0.5)
            )
            k = (r["l_partkey"], r["l_suppkey"])
            cost[k] = min(cost.get(k, c), c)
    best: dict[int, tuple] = {}
    for (pk, sk), c in sorted(cost.items()):
        if pk not in best or (c, sk) < best[pk]:
            best[pk] = (c, sk)
    ref = [
        (pk, eu[sk][0], eu[sk][1], c)
        for pk, (c, sk) in sorted(best.items())
    ][:25]
    assert got == ref


def test_cochran_q_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q385_cochran_q")[0]
    docs = load_tables(spark, sf_dir)["documents"].select(
        "text", "lang", "n_chars"
    ).collect()
    cols = [0, 0, 0]
    rr = 0
    for r in docs:
        y = " the " in r["text"]
        xs = [
            (r["lang"] == "en") == y,
            (r["n_chars"] >= 300) == y,
            (" a " in r["text"]) == y,
        ]
        for j, v in enumerate(xs):
            cols[j] += v
        rr += sum(xs) ** 2
    n_succ = sum(cols)
    q = 2.0 * (3.0 * sum(c * c for c in cols) - n_succ**2) / (
        3.0 * n_succ - rr
    )
    assert (row["n_docs"], row["c1"], row["c2"], row["c3"]) == (
        len(docs), *cols,
    )
    assert math.isclose(row["q_stat"], q, rel_tol=1e-9, abs_tol=1e-5)
    assert row["significant"] == (q >= 5.991)


def test_jonckheere_matches_python_bruteforce(spark, sf_dir):
    row = _rows(spark, sf_dir, "q386_jonckheere_trend")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "value"
    ).collect()
    order = ["view", "click", "signup", "purchase"]
    g: dict[str, list] = defaultdict(list)
    for r in ev:
        if r["event_type"] in order:
            g[r["event_type"]].append(math.floor(r["value"] * 100))
    jt2 = 0
    for i, j in combinations(range(4), 2):
        a, b = g[order[i]], g[order[j]]
        ca = Counter(a)
        # 2*U = 2*#(a<b) + #(a==b), computed per distinct a-value
        for vb in b:
            for va, na in ca.items():
                if va < vb:
                    jt2 += 2 * na
                elif va == vb:
                    jt2 += na
    ns = [len(g[o]) for o in order]
    n = sum(ns)
    e2 = sum(ns[i] * ns[j] for i, j in combinations(range(4), 2))
    var = (
        n * n * (2 * n + 3) - sum(m * m * (2 * m + 3) for m in ns)
    ) / 72.0
    z = (jt2 - e2) / (2.0 * math.sqrt(var))
    assert (row["n"], row["jt2"], row["e2"]) == (n, jt2, e2)
    assert row["var72"] == round(var * 72)
    assert math.isclose(row["z_stat"], z, rel_tol=1e-7, abs_tol=1e-5)


def test_theil_u_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q387_theil_u")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    cell: Counter = Counter((r["event_type"], r["ts"].hour) for r in ev)
    n = sum(cell.values())

    def qsum(counts):
        return sum(
            math.floor(c * math.log2(c) * 1e6 + 0.5) for c in counts
        )

    rx: Counter = Counter()
    ry: Counter = Counter()
    for (x, y), c in cell.items():
        rx[x] += c
        ry[y] += c
    lg = math.floor(math.log2(n) * 1e6 + 0.5)
    sx, sy, sxy = qsum(rx.values()), qsum(ry.values()), qsum(cell.values())
    hx = lg - sx // n
    mi = lg - (sx + sy - sxy) // n
    assert (row["n"], row["hx_micro"]) == (n, hx)
    assert row["hy_micro"] == lg - sy // n
    assert row["hxy_micro"] == lg - sxy // n
    assert row["mi_micro"] == mi
    assert row["u_ppm"] == mi * 1_000_000 // hx
    # and the float-scale sanity: U within 2e-3 of the textbook value
    px = {k: v / n for k, v in rx.items()}
    hxf = -sum(p * math.log2(p) for p in px.values())
    mif = 0.0
    for (x, y), c in cell.items():
        pxy = c / n
        mif += pxy * math.log2(pxy / (px[x] * (ry[y] / n)))
    assert abs(row["u_ppm"] / 1e6 - mif / hxf) < 2e-3


def test_cramers_v_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q388_cramers_v")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    cell: Counter = Counter(
        (r["event_type"], (r["ts"].day - 1) % 7) for r in ev
    )
    n = sum(cell.values())
    rx: Counter = Counter()
    ry: Counter = Counter()
    for (x, y), c in cell.items():
        rx[x] += c
        ry[y] += c
    chi_micro = 0
    for (x, y), c in cell.items():
        e = rx[x] * ry[y] / n
        chi_micro += math.floor((c - e) ** 2 / e * 1e6)
    v = math.floor(math.sqrt(chi_micro / 1e6 / (n * 4.0)) * 1e6)
    assert (row["n"], row["chi2_micro"], row["v_micro"]) == (
        n, chi_micro, v,
    )


def test_shapley_matches_python_enumeration(spark, sf_dir):
    got = {
        r["channel"]: r["shap24_ppm"]
        for r in _rows(spark, sf_dir, "q389_shapley_attribution")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts", "value"
    ).collect()
    bits = {"click": 1, "view": 2, "signup": 4, "error": 8}
    mask: dict[int, int] = defaultdict(int)
    conv: dict[int, int] = defaultdict(int)
    for r in ev:
        u = r["user_id"]
        if r["event_type"] in bits and r["ts"].day <= 2:
            mask[u] |= bits[r["event_type"]]
        if r["event_type"] == "purchase" and r["value"] >= 200.0:
            conv[u] = 1
        mask[u] |= 0  # register the user
    stat: dict[int, list] = defaultdict(lambda: [0, 0])
    for u, mk in mask.items():
        stat[mk][0] += 1
        stat[mk][1] += conv.get(u, 0)

    def v(mk):
        if mk not in stat:
            return 0
        users, c = stat[mk]
        return c * 1_000_000 // users

    ref = {}
    for name, bit in bits.items():
        others = [b for b in bits.values() if b != bit]
        total = 0
        for pick in range(8):
            s = sum(b for k, b in enumerate(others) if pick >> k & 1)
            size = bin(pick).count("1")
            w = math.factorial(size) * math.factorial(3 - size)
            total += w * (v(s | bit) - v(s))
        ref[name] = total
    assert got == ref


def test_reciprocal_best_match_matches_python(spark, sf_dir):
    got = sorted(
        (r["id_a"], r["id_b"], r["cos_micro"])
        for r in _rows(spark, sf_dir, "q390_reciprocal_best_match")
    )
    em = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label: dict[int, list] = defaultdict(list)
    for r in em:
        by_label[r["label"]].append(
            (r["vec_id"], [float(x) for x in r["embedding"]])
        )

    def cosq(a, b):
        dot = n1 = n2 = 0.0
        for x, y in zip(a, b):
            dot += x * y
            n1 += x * x
            n2 += y * y
        return math.floor(dot / (math.sqrt(n1) * math.sqrt(n2)) * 1e6)

    best: dict[int, tuple] = {}
    for vecs in by_label.values():
        for vid, va in vecs:
            cands = [
                (cosq(va, vb), -ob) for ob, vb in vecs if ob != vid
            ]
            if cands:
                c, negid = max(cands)
                best[vid] = (-negid, c)
    ref = sorted(
        (a, nbr, c)
        for a, (nbr, c) in best.items()
        if best.get(nbr, (None,))[0] == a and a < nbr
    )
    assert got == ref


def test_source_divergence_matches_python(spark, sf_dir):
    got = {
        (r["src_a"], r["src_b"]): r["kl_nano"]
        for r in _rows(spark, sf_dir, "q391_source_divergence_matrix")
    }
    docs = load_tables(spark, sf_dir)["documents"].select(
        "source", "text"
    ).collect()
    cnt: dict[int, Counter] = {0: Counter(), 1: Counter(), 2: Counter()}
    for r in docs:
        if r["source"] in ("src0", "src1", "src2"):
            i = int(r["source"][3:])
            for t in _toks(r["text"]):
                cnt[i][t] += 1
    vocab = set().union(*cnt.values())
    v = len(vocab)
    tot = {i: sum(c.values()) for i, c in cnt.items()}
    ref = {}
    for i in range(3):
        for j in range(3):
            if i == j:
                continue
            kl = 0
            for t in vocab:
                ca, cb = cnt[i][t] + 1, cnt[j][t] + 1
                na, nb = tot[i] + v, tot[j] + v
                kl += math.floor(
                    (ca / na) * math.log((ca * nb) / (cb * na)) * 1e9
                )
            ref[(i, j)] = kl
    assert got == ref


def test_partial_correlation_matches_python(spark, sf_dir):
    import numpy as np

    row = _rows(spark, sf_dir, "q393_partial_correlation")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    cnt: dict = defaultdict(lambda: [0, 0, 0])
    for r in ev:
        hr = r["ts"].replace(minute=0, second=0, microsecond=0)
        idx = {"purchase": 0, "click": 1, "view": 2}.get(r["event_type"])
        c = cnt[hr]  # every hour with any event is a series point
        if idx is not None:
            c[idx] += 1
    arr = np.array(sorted(cnt.values()), dtype=float).T
    # numpy corrcoef — an entirely different computation path
    cm = np.corrcoef(arr)
    rxy, rxz, ryz = cm[0, 1], cm[0, 2], cm[1, 2]
    part = (rxy - rxz * ryz) / math.sqrt(
        (1 - rxz**2) * (1 - ryz**2)
    )
    assert row["n_hours"] == arr.shape[1]
    assert math.isclose(row["r_xy"], rxy, rel_tol=1e-8, abs_tol=1e-5)
    assert math.isclose(
        row["r_xy_given_z"], part, rel_tol=1e-8, abs_tol=1e-5
    )


def test_mann_kendall_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q394_mann_kendall")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_type", "ts"
    ).collect()
    day: Counter = Counter(
        r["ts"].day for r in ev if r["event_type"] == "purchase"
    )
    ys = [day[d] for d in sorted(day)]
    n = len(ys)
    s = sum(
        (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(ys)
    var18 = n * (n - 1) * (2 * n + 5) - sum(
        t * (t - 1) * (2 * t + 5) for t in ties.values()
    )
    z = (
        (s - 1) / math.sqrt(var18 / 18.0)
        if s > 0
        else (s + 1) / math.sqrt(var18 / 18.0)
        if s < 0
        else 0.0
    )
    assert (row["n_days"], row["s_stat"], row["var18"]) == (n, s, var18)
    assert math.isclose(row["z_stat"], z, rel_tol=1e-8, abs_tol=1e-5)


def test_capture_recapture_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q395_capture_recapture")[0]
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "event_type", "ts"
    ).collect()
    a: set = set()
    b: set = set()
    users: set = set()
    for r in ev:
        users.add(r["user_id"])
        if r["event_type"] == "click" and r["ts"].day <= 3:
            a.add(r["user_id"])
        if r["event_type"] == "purchase" and 4 <= r["ts"].day <= 6:
            b.add(r["user_id"])
    m = len(a & b)
    est = (len(a) + 1) * (len(b) + 1) // (m + 1) - 1
    assert (
        row["n_sample_a"], row["n_sample_b"], row["n_both"],
        row["true_population"], row["chapman_est"],
    ) == (len(a), len(b), m, len(users), est)
    assert row["err_ppm"] == abs(est - len(users)) * 1_000_000 // len(users)


def test_gumbel_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q396_gumbel_extremes")[0]
    ev = load_tables(spark, sf_dir)["events"].select("ts").collect()
    hr: Counter = Counter((r["ts"].day, r["ts"].hour) for r in ev)
    mx: dict[int, int] = {}
    for (d, _), c in hr.items():
        mx[d] = max(mx.get(d, 0), c)
    vals = list(mx.values())
    n = len(vals)
    xbar = sum(vals) / n
    var = (sum(v * v for v in vals) - sum(vals) ** 2 / n) / (n - 1)
    beta = math.sqrt(6.0 * var) / math.pi
    gamma = 0.5772156649015329
    mu = xbar - gamma * beta
    assert row["n_days"] == n
    assert math.isclose(row["mu"], mu, rel_tol=1e-8, abs_tol=1e-5)
    assert math.isclose(row["beta"], beta, rel_tol=1e-8, abs_tol=1e-5)
    for t, col in ((7, "rl_7d"), (30, "rl_30d"), (365, "rl_365d")):
        c = -math.log(-math.log(1.0 - 1.0 / t))
        assert math.isclose(
            row[col], mu + beta * c, rel_tol=1e-8, abs_tol=1e-5
        )
