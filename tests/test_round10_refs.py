"""Round-10 reference tests: independent pure-Python replicas of the
12 registry entries that previously relied on the DuckDB oracle alone
(VERDICT r09 gap #1) — q383_dominant_supplier, q392_ols_influence,
and the TPC-H shape-completion ten q397-q406.

Each replica recomputes the result from collected base tables with
textbook Python (Counter / dict loops / float formulas), sharing NO
code with the Spark plans or the oracle SQL — the transliteration-risk
discipline that already covers the other 133 round-8/9 formula
queries.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache

_CACHE: dict = {}


def _tables(spark, sf_dir, *names):
    out = []
    for n in names:
        key = (sf_dir, n)
        if key not in _CACHE:
            _CACHE[key] = load_tables(spark, sf_dir)[n].collect()
        out.append(_CACHE[key])
    return out if len(out) > 1 else out[0]


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _cents(x):
    return math.floor(x * 100 + 0.5)


def _rev_e4(r):
    return _cents(r["l_extendedprice"]) * (100 - _cents(r["l_discount"]))


def test_q383_dominant_supplier(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q383_dominant_supplier")]
    li, sup, nat = _tables(spark, sf_dir, "lineitem", "supplier", "nation")
    ps = Counter()
    for r in li:
        ps[(r["l_partkey"], r["l_suppkey"])] += _cents(r["l_quantity"])
    pt = Counter()
    for (pk, _sk), q in ps.items():
        pt[pk] += q
    s_info = {r["s_suppkey"]: (r["s_name"], r["s_nationkey"]) for r in sup}
    n_name = {r["n_nationkey"]: r["n_name"] for r in nat}
    cnt = Counter()
    for (pk, sk), q in ps.items():
        if q * 5 > pt[pk]:
            sname, snk = s_info[sk]
            cnt[(sname, n_name[snk])] += 1
    want = sorted(
        ((s, n, c) for (s, n), c in cnt.items()),
        key=lambda t: (-t[2], t[0]),
    )[:20]
    assert got == want


def test_q392_ols_influence(spark, sf_dir):
    got = {r["doc_id"]: r for r in _rows(spark, sf_dir, "q392_ols_influence")}
    docs = _tables(spark, sf_dir, "documents")
    pts = [
        (
            r["doc_id"],
            int(r["n_chars"]),
            len([w for w in r["text"].lower().strip().split() if w]),
        )
        for r in docs
    ]
    n = len(pts)
    sx = sum(x for _, x, _ in pts)
    sy = sum(y for _, _, y in pts)
    sxx = sum(x * x for _, x, _ in pts)
    syy = sum(y * y for _, _, y in pts)
    sxy = sum(x * y for _, x, y in pts)
    xbar = sx / n
    ybar = sy / n
    cxx = sxx - sx * sx / n
    cyy = syy - sy * sy / n
    cxy = sxy - sx * sy / n
    slope = cxy / cxx
    s2 = (cyy - slope * cxy) / (n - 2.0)
    flagged = {}
    for did, x, y in pts:
        h = 1.0 / n + (x - xbar) * (x - xbar) / cxx
        r = (y - (ybar + slope * (x - xbar))) / math.sqrt(s2 * (1.0 - h))
        if r >= 3.0 - 1e-9 or r <= -3.0 + 1e-9 or h * n >= 10.0 - 1e-9:
            flagged[did] = (x, y, h, r)
    assert set(got) == set(flagged)
    for did, (x, y, h, r) in flagged.items():
        row = got[did]
        assert (row["x"], row["y"]) == (x, y)
        assert abs(row["leverage"] - h) < 1e-6
        assert abs(row["std_resid"] - r) < 1e-6


def test_q397_forecast_revenue(spark, sf_dir):
    got = _rows(spark, sf_dir, "q397_forecast_revenue")[0]
    li = _tables(spark, sf_dir, "lineitem")
    n = rev = 0
    for r in li:
        if (
            datetime(1996, 1, 1) <= r["l_shipdate"] < datetime(1997, 1, 1)
            and 5 <= _cents(r["l_discount"]) <= 7
            and r["l_quantity"] < 24
        ):
            n += 1
            rev += _cents(r["l_extendedprice"]) * _cents(r["l_discount"])
    assert (got["n_lines"], got["revenue_e4"]) == (n, rev)


def test_q398_volume_shipping(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q398_volume_shipping")]
    li, o, c, s, nat = _tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    n_name = {r["n_nationkey"]: r["n_name"] for r in nat}
    supp_nat = {r["s_suppkey"]: n_name[r["s_nationkey"]] for r in s}
    cust_nat = {r["c_custkey"]: n_name[r["c_nationkey"]] for r in c}
    order_cust = {r["o_orderkey"]: r["o_custkey"] for r in o}
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        if not (
            datetime(1996, 1, 1) <= r["l_shipdate"] < datetime(1998, 1, 1)
        ):
            continue
        sn = supp_nat[r["l_suppkey"]]
        cn = cust_nat[order_cust[r["l_orderkey"]]]
        if (sn, cn) in (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")):
            cell = agg[(sn, cn, r["l_shipdate"].year)]
            cell[0] += 1
            cell[1] += _rev_e4(r)
    want = sorted((k + tuple(v)) for k, v in agg.items())
    assert got == want


def test_q399_product_profit(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q399_product_profit")]
    li, p, s, nat = _tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    n_name = {r["n_nationkey"]: r["n_name"] for r in nat}
    supp_nat = {r["s_suppkey"]: n_name[r["s_nationkey"]] for r in s}
    std_rc = {
        r["p_partkey"]: _cents(r["p_retailprice"])
        for r in p
        if r["p_type"] == "STANDARD"
    }
    agg = Counter()
    for r in li:
        rc = std_rc.get(r["l_partkey"])
        if rc is None:
            continue
        amount = _rev_e4(r) - (rc * _cents(r["l_quantity"])) // 5
        agg[(supp_nat[r["l_suppkey"]], r["l_shipdate"].year)] += amount
    want = sorted(
        ((n, y, v) for (n, y), v in agg.items()),
        key=lambda t: (t[0], -t[1]),
    )
    assert got == want


def test_q400_late_shipments(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q400_late_shipments")]
    li, o = _tables(spark, sf_dir, "lineitem", "orders")
    orders = {
        r["o_orderkey"]: (r["o_orderdate"], r["o_orderpriority"]) for r in o
    }
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        if not (
            datetime(1996, 1, 1) <= r["l_shipdate"] < datetime(1997, 1, 1)
        ):
            continue
        odate, oprio = orders[r["l_orderkey"]]
        if (r["l_shipdate"].date() - odate.date()).days > 90:
            hi = oprio in ("1-URGENT", "2-HIGH")
            agg[r["l_returnflag"]][0 if hi else 1] += 1
    want = sorted((k, v[0], v[1]) for k, v in agg.items())
    assert got == want


def test_q401_customer_distribution(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q401_customer_distribution")]
    c, o = _tables(spark, sf_dir, "customer", "orders")
    per_cust = {r["c_custkey"]: 0 for r in c}
    for r in o:
        if r["o_orderpriority"] != "4-NOT SPECIFIED":
            per_cust[r["o_custkey"]] += 1
    hist = Counter(per_cust.values())
    want = sorted(
        ((cc, d) for cc, d in hist.items()), key=lambda t: (-t[1], -t[0])
    )
    assert got == want


def test_q402_promo_revenue(spark, sf_dir):
    got = _rows(spark, sf_dir, "q402_promo_revenue")[0]
    li, p = _tables(spark, sf_dir, "lineitem", "part")
    promo_parts = {r["p_partkey"] for r in p if r["p_type"] == "PROMO"}
    promo = total = 0
    for r in li:
        if datetime(1996, 3, 1) <= r["l_shipdate"] < datetime(1996, 4, 1):
            rev = _rev_e4(r)
            total += rev
            if r["l_partkey"] in promo_parts:
                promo += rev
    assert (got["promo_e4"], got["total_e4"]) == (promo, total)
    assert abs(got["promo_revenue_pct"] - 100.0 * promo / total) < 1e-6


def test_q403_top_supplier(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q403_top_supplier")]
    li, s = _tables(spark, sf_dir, "lineitem", "supplier")
    rev = Counter()
    for r in li:
        if datetime(1996, 1, 1) <= r["l_shipdate"] < datetime(1996, 4, 1):
            rev[r["l_suppkey"]] += _rev_e4(r)
    mx = max(rev.values())
    names = {r["s_suppkey"]: r["s_name"] for r in s}
    want = sorted((sk, names[sk], v) for sk, v in rev.items() if v == mx)
    assert got == want


def test_q404_important_stock(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q404_important_stock")]
    li, s, nat = _tables(spark, sf_dir, "lineitem", "supplier", "nation")
    nation3 = {
        r["n_nationkey"] for r in nat if r["n_name"] == "NATION_3"
    }
    supps = {r["s_suppkey"] for r in s if r["s_nationkey"] in nation3}
    pv = Counter()
    for r in li:
        if r["l_suppkey"] in supps:
            pv[r["l_partkey"]] += _cents(r["l_extendedprice"])
    tot = sum(pv.values())
    want = sorted(
        ((pk, v) for pk, v in pv.items() if v * 1000 > tot),
        key=lambda t: (-t[1], t[0]),
    )[:50]
    assert got == want


def test_q405_brand_band_revenue(spark, sf_dir):
    got = _rows(spark, sf_dir, "q405_brand_band_revenue")[0]
    li, p = _tables(spark, sf_dir, "lineitem", "part")
    part = {r["p_partkey"]: (r["p_brand"], r["p_size"]) for r in p}
    bands = {"Brand#1": (10, 1, 11), "Brand#2": (20, 10, 20),
             "Brand#3": (30, 20, 30)}
    n = rev = 0
    for r in li:
        brand, size = part[r["l_partkey"]]
        band = bands.get(brand)
        if band is None:
            continue
        max_size, qlo, qhi = band
        if 1 <= size <= max_size and qlo <= r["l_quantity"] <= qhi:
            n += 1
            rev += _rev_e4(r)
    assert (got["n_lines"], got["revenue_e4"]) == (n, rev)


def test_q406_sales_opportunity(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q406_sales_opportunity")]
    c, o = _tables(spark, sf_dir, "customer", "orders")
    pos = [
        (r["c_custkey"], r["c_nationkey"], _cents(r["c_acctbal"]))
        for r in c
        if r["c_nationkey"] in (1, 2, 3, 4, 5, 6, 7)
    ]
    positive = [ac for _, _, ac in pos if ac > 0]
    s, n = sum(positive), len(positive)
    recent = {
        r["o_custkey"] for r in o if r["o_orderdate"] >= datetime(2000, 1, 1)
    }
    agg = defaultdict(lambda: [0, 0])
    for ck, nk, ac in pos:
        if ac * n > s and ck not in recent:
            agg[nk][0] += 1
            agg[nk][1] += ac
    want = sorted((nk, v[0], v[1]) for nk, v in agg.items())
    assert got == want


def test_q511_ar2_forecast(spark, sf_dir):
    got = _rows(spark, sf_dir, "q511_ar2_forecast")[0]
    ev = _tables(spark, sf_dir, "events")
    days = defaultdict(int)
    for r in ev:
        days[int(r["ts"].timestamp() // 86400)] += 1
    xs = [days[d] for d in sorted(days)]
    n = len(xs)
    s = sum(xs)
    xbar = s / n
    p0 = sum(x * x for x in xs)
    p1 = sum(xs[t] * xs[t - 1] for t in range(1, n))
    a1, b1 = sum(xs[1:]), sum(xs[:-1])
    p2 = sum(xs[t] * xs[t - 2] for t in range(2, n))
    a2, b2 = sum(xs[2:]), sum(xs[:-2])
    c0 = p0 - 2.0 * s * xbar + n * xbar * xbar
    c1 = p1 - xbar * (a1 + b1) + (n - 1) * xbar * xbar
    c2 = p2 - xbar * (a2 + b2) + (n - 2) * xbar * xbar
    r1, r2 = c1 / c0, c2 / c0
    phi1 = r1 * (1.0 - r2) / (1.0 - r1 * r1)
    phi2 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    serr = sum(
        math.floor(
            abs(xs[t] - (xbar + phi1 * (xs[t - 1] - xbar)
                         + phi2 * (xs[t - 2] - xbar))) * 1e6
        )
        for t in range(2, n)
    )
    snaive = sum(abs(xs[t] - xs[t - 1]) for t in range(1, n))
    assert got["n_days"] == n
    assert got["phi1_micro"] == math.floor(phi1 * 1e6)
    assert got["phi2_micro"] == math.floor(phi2 * 1e6)
    assert got["mase_ppm"] == serr * (n - 1) // ((n - 2) * snaive)
    # sanity: an AR(2) fit should beat (or at worst match) the naive
    # random walk it is scaled by only when the series has structure —
    # either way the scale-free score stays in a sane band
    assert 0 < got["mase_ppm"] < 5_000_000


def test_q512_consistent_hash_rebalance(spark, sf_dir):
    import hashlib

    got = _rows(spark, sf_dir, "q512_consistent_hash_rebalance")[0]
    cust = _tables(spark, sf_dir, "customer")

    def h(sv: str) -> int:
        return int(hashlib.md5(sv.encode()).hexdigest()[:13], 16)

    vnodes = [
        (s, h(f"vn:{s}:{v}") * 16 + s) for s in range(9) for v in range(8)
    ]
    ring8 = sorted(p for s, p in vnodes if s < 8)
    ring9 = sorted(p for s, p in vnodes)

    def assign(ring, kpos):
        for p in ring:
            if p >= kpos:
                return p % 16
        return ring[0] % 16

    ring_moved = mod_moved = 0
    for r in cust:
        hk = h(f"key:{r['c_custkey']}")
        kpos = hk * 16 + 15
        if assign(ring8, kpos) != assign(ring9, kpos):
            ring_moved += 1
        if hk % 8 != hk % 9:
            mod_moved += 1
    n = len(cust)
    assert got["n_keys"] == n
    assert got["ring_moved"] == ring_moved
    assert got["mod_moved"] == mod_moved
    assert got["ring_moved_ppm"] == ring_moved * 1_000_000 // n
    assert got["mod_moved_ppm"] == mod_moved * 1_000_000 // n
    assert got["consistent_wins"] is True
    # the whole point: the ring moves ~1/9 of keys, mod-N ~8/9
    assert got["ring_moved_ppm"] < 250_000 < got["mod_moved_ppm"]


def test_q513_rank_biased_overlap(spark, sf_dir):
    got = _rows(spark, sf_dir, "q513_rank_biased_overlap")[0]
    docs = _tables(spark, sf_dir, "documents")
    toks = {
        r["doc_id"]: (
            int(r["n_chars"]),
            len([w for w in r["text"].lower().strip().split() if w]),
        )
        for r in docs
    }
    depth, p = 50, 0.9
    la = sorted(toks, key=lambda d: (-toks[d][0], d))[:depth]
    lb = sorted(toks, key=lambda d: (-toks[d][1], d))[:depth]
    ra = {d: i + 1 for i, d in enumerate(la)}
    rb = {d: i + 1 for i, d in enumerate(lb)}
    cw = {
        m: round(
            sum((1 - p) * p ** (d - 1) / d * 1e9 for d in range(m, depth + 1))
        )
        for m in range(1, depth + 1)
    }
    common = set(ra) & set(rb)
    rbo_nano = sum(cw[max(ra[d], rb[d])] for d in common)
    assert got["n_common"] == len(common)
    assert got["rbo_nano"] == rbo_nano
    # cross-check the telescoped literal sum against the textbook
    # per-depth RBO definition computed with plain floats
    textbook = sum(
        (1 - p)
        * p ** (d - 1)
        * sum(1 for x in common if max(ra[x], rb[x]) <= d)
        / d
        for d in range(1, depth + 1)
    )
    assert abs(got["rbo_nano"] / 1e9 - textbook) < 1e-5


def test_q514_dedup_storage_savings(spark, sf_dir):
    import hashlib
    import re

    got = _rows(spark, sf_dir, "q514_dedup_storage_savings")[0]
    docs = _tables(spark, sf_dir, "documents")
    norm = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].lower().strip())
        for r in docs
    }
    size = {r["doc_id"]: int(r["n_chars"]) for r in docs}
    groups = defaultdict(list)
    for did, t in norm.items():
        groups[hashlib.md5(t.encode()).hexdigest()].append(did)
    keepers = {min(g) for g in groups.values()}
    exact_dup = sum(size[d] for d in norm if d not in keepers)

    # survivor-set near-dup clusters: exact 3-shingle Jaccard >= 0.5
    def shingles(t):
        # <3-token docs have NO 3-shingles: both engines produce an
        # empty set there, which can never reach the Jaccard gate
        toks = [w for w in t.split() if w]
        return {tuple(toks[i:i + 3]) for i in range(len(toks) - 2)}

    sh = {d: shingles(norm[d]) for d in keepers}
    ids = sorted(sh)
    adj = defaultdict(set)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.5:
                adj[a].add(b)
                adj[b].add(a)
    label = {}
    for root in sorted(adj):
        if root in label:
            continue
        stack, comp = [root], []
        seen = {root}
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        c = min(comp)
        for x in comp:
            label[x] = c
    nd_extra = sum(size[d] for d, c in label.items() if c != d)

    total = sum(size.values())
    assert got["n_docs"] == len(docs)
    assert got["total_bytes"] == total
    assert got["exact_dup_bytes"] == exact_dup
    assert got["neardup_extra_bytes"] == nd_extra
    assert got["kept_bytes"] == total - exact_dup - nd_extra
    assert got["savings_ppm"] == (exact_dup + nd_extra) * 1_000_000 // total
