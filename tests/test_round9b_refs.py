"""Round-9b reference tests: independent pure-Python replicas of the
survival / causal / basket / graph / layout batch (q407-q416), written
the same round the queries ship (the test_round6/7/8/9_refs discipline).
Each reference re-derives the answer a DIFFERENT way than both the Spark
spelling and the DuckDB oracle:

- q407/q408 KM & NA: direct per-bucket loops over a dict of lifetimes,
  float product for KM (not exp-of-ln-sum).
- q409 DiD: four plain accumulators over the joined rows.
- q410 CEM: per-block dict loop, float weighted mean of UNQUANTIZED
  gaps (asserts the 1e-4 quantization bounds the error).
- q411/q412/q414: per-order/per-customer set and Counter enumeration
  via itertools.combinations, not self-joins.
- q413 PageRank: dict-based power iteration with Python // (exact
  integer equality with the engine result).
- q415: REAL bit operations ((x >> i) & 1) << k, not //-% arithmetic.
- q416: direct scoring loop, integer cents.
"""

from __future__ import annotations

import math
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


def _lifetimes(spark, sf_dir):
    """customer -> (t_bucket, died) from raw orders, via Python min/max."""
    t = load_tables(spark, sf_dir)
    first: dict[int, object] = {}
    last: dict[int, object] = {}
    for r in t["orders"].select("o_custkey", "o_orderdate").collect():
        k, d = r["o_custkey"], r["o_orderdate"]
        if k not in first or d < first[k]:
            first[k] = d
        if k not in last or d > last[k]:
            last[k] = d
    import datetime

    cut = datetime.datetime(2001, 1, 1)
    out = {}
    for k in first:
        out[k] = ((last[k] - first[k]).days // 28, last[k] < cut)
    return out


def _at_risk_table(lives):
    buckets = defaultdict(lambda: [0, 0])  # t -> [cnt, deaths]
    for t, died in lives.values():
        buckets[t][0] += 1
        buckets[t][1] += int(died)
    ts = sorted(buckets)
    total = len(lives)
    table = []
    seen = 0
    for t in ts:
        cnt, d = buckets[t]
        table.append((t, total - seen, cnt, d))
        seen += cnt
    return table  # (t, n_at_risk, cnt, d) ascending


def test_kaplan_meier_matches_python(spark, sf_dir):
    got = {r["t_bucket"]: r for r in _rows(spark, sf_dir, "q407_kaplan_meier")}
    table = _at_risk_table(_lifetimes(spark, sf_dir))
    assert len(got) == len(table)
    surv = 1.0
    dead = False
    for t, n, cnt, d in table:
        if d >= n:
            dead = True
        if not dead:
            surv *= 1.0 - d / n
        row = got[t]
        assert row["n_at_risk"] == n
        assert row["n_events"] == d
        assert row["n_censored"] == cnt - d
        want = 0.0 if dead else surv
        assert abs(row["km_survival"] - want) < 1e-5, (t, row, want)


def test_nelson_aalen_matches_python(spark, sf_dir):
    got = {r["t_bucket"]: r for r in _rows(spark, sf_dir, "q408_nelson_aalen")}
    table = _at_risk_table(_lifetimes(spark, sf_dir))
    h = 0.0
    for t, n, _cnt, d in table:
        h += d / n
        row = got[t]
        assert row["n_at_risk"] == n and row["n_events"] == d
        assert abs(row["na_cumhaz"] - h) < 1e-5


def test_did_matches_python(spark, sf_dir):
    import datetime

    row = _rows(spark, sf_dir, "q409_did_estimator")[0]
    t = load_tables(spark, sf_dir)
    seg = {
        r["c_custkey"]: r["c_mktsegment"] == "BUILDING"
        for r in t["customer"].collect()
    }
    cut = datetime.datetime(1998, 4, 1)
    cells = defaultdict(lambda: [0, 0])  # (treated, post) -> [n, cents]
    for r in t["orders"].select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        key = (seg[r["o_custkey"]], r["o_orderdate"] >= cut)
        cells[key][0] += 1
        cells[key][1] += math.floor(r["o_totalprice"] * 100 + 0.5)
    mean = {k: v[1] / 100 / v[0] for k, v in cells.items()}
    assert row["n_t_pre"] == cells[(True, False)][0]
    assert row["n_c_post"] == cells[(False, True)][0]
    assert abs(row["mean_t_post"] - mean[(True, True)]) < 1e-5
    want = (mean[(True, True)] - mean[(True, False)]) - (
        mean[(False, True)] - mean[(False, False)]
    )
    assert abs(row["did"] - want) < 1e-5


def test_cem_att_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q410_cem_att")[0]
    t = load_tables(spark, sf_dir)
    spend = defaultdict(int)
    for r in t["orders"].select("o_custkey", "o_totalprice").collect():
        spend[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
    blocks = defaultdict(lambda: [0, 0, 0, 0])  # nt, nc, st_cents, sc_cents
    for r in t["customer"].collect():
        k = r["c_custkey"]
        if k not in spend:
            continue
        b = (r["c_mktsegment"], math.floor((r["c_acctbal"] + 1000.0) / 1100))
        blk = blocks[b]
        if k % 2 == 0:
            blk[0] += 1
            blk[2] += spend[k]
        else:
            blk[1] += 1
            blk[3] += spend[k]
    num = nt_tot = nc_tot = n_blocks = 0.0
    for nt, nc, st, sc in blocks.values():
        if nt > 0 and nc > 0:
            gap = st / 100 / nt - sc / 100 / nc  # UNQUANTIZED
            num += nt * gap
            nt_tot += nt
            nc_tot += nc
            n_blocks += 1
    assert row["n_blocks"] == n_blocks
    assert row["n_treated"] == nt_tot and row["n_control"] == nc_tot
    # the registry query floor-quantizes each gap to 1e-4, so the ATT can
    # differ from the float reference by at most 1e-4 (one quantum)
    assert abs(row["att"] - num / nt_tot) < 1e-4


def _order_brands(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    ob = defaultdict(set)
    for r in t["lineitem"].select("l_orderkey", "l_partkey").collect():
        ob[r["l_orderkey"]].add(brand[r["l_partkey"]])
    return ob


def test_market_basket_matches_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q411_market_basket")
    ob = _order_brands(spark, sf_dir)
    n = len(ob)
    item = Counter()
    pair = Counter()
    for brands in ob.values():
        item.update(brands)
        pair.update(combinations(sorted(brands), 2))
    scored = []
    for (b1, b2), pn in pair.items():
        if pn >= 20:
            lift = pn * n / (item[b1] * item[b2])
            scored.append((round(lift, 6), b1, b2, pn))
    scored.sort(key=lambda x: (-x[0], x[1], x[2]))
    want = scored[:20]
    assert len(got) == len(want)
    for row, (lift, b1, b2, pn) in zip(got, want):
        assert (row["b1"], row["b2"], row["pair_n"]) == (b1, b2, pn)
        assert abs(row["lift"] - lift) < 1e-5
        assert abs(row["support"] - pn / n) < 1e-5
        assert abs(row["confidence"] - pn / item[b1]) < 1e-5


def _customer_brands(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    brand = {r["p_partkey"]: r["p_brand"] for r in t["part"].collect()}
    cust = {r["o_orderkey"]: r["o_custkey"] for r in t["orders"].collect()}
    cb = defaultdict(Counter)
    for r in t["lineitem"].select("l_orderkey", "l_partkey").collect():
        cb[cust[r["l_orderkey"]]][brand[r["l_partkey"]]] += 1
    return cb


def test_butterfly_count_matches_python(spark, sf_dir):
    row = _rows(spark, sf_dir, "q412_butterfly_count")[0]
    cb = _customer_brands(spark, sf_dir)
    edges = sum(len(c) for c in cb.values())
    wedge = Counter()
    for c in cb.values():
        wedge.update(combinations(sorted(c), 2))
    wedges = sum(wedge.values())
    butterflies = sum(w * (w - 1) // 2 for w in wedge.values())
    assert (row["n_edges"], row["n_wedges"], row["n_butterflies"]) == (
        edges,
        wedges,
        butterflies,
    )


def test_pagerank_matches_python(spark, sf_dir):
    got = [
        (r["s_suppkey"], r["rank_nano"])
        for r in _rows(spark, sf_dir, "q413_pagerank_cosupply")
    ]
    t = load_tables(spark, sf_dir)
    parts = defaultdict(set)
    for r in t["lineitem"].select("l_partkey", "l_suppkey").collect():
        parts[r["l_partkey"]].add(r["l_suppkey"])
    adj = defaultdict(set)
    for sks in parts.values():
        for a, b in combinations(sks, 2):
            adj[a].add(b)
            adj[b].add(a)
    nodes = sorted(adj)
    n = len(nodes)
    r = {s: 1_000_000_000 // n for s in nodes}
    for _ in range(3):
        inc = defaultdict(int)
        for s in nodes:
            c = r[s] // len(adj[s])
            for d in adj[s]:
                inc[d] += c
        r = {
            s: (15 * (1_000_000_000 // n)) // 100 + (85 * inc[s]) // 100
            for s in nodes
        }
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want  # exact integer equality


def test_item_item_cf_matches_python(spark, sf_dir):
    got = _rows(spark, sf_dir, "q414_item_item_cf")
    cb = _customer_brands(spark, sf_dir)
    norm2 = Counter()
    dot = Counter()
    for c in cb.values():
        for b, k in c.items():
            norm2[b] += k * k
        for (b1, k1), (b2, k2) in combinations(sorted(c.items()), 2):
            dot[(b1, b2)] += k1 * k2
    scored = sorted(
        (
            (round(d / math.sqrt(norm2[b1] * norm2[b2]), 6), b1, b2, d)
            for (b1, b2), d in dot.items()
        ),
        key=lambda x: (-x[0], x[1], x[2]),
    )[:15]
    assert len(got) == 15
    for row, (cos, b1, b2, d) in zip(got, scored):
        assert (row["b1"], row["b2"], row["dot"]) == (b1, b2, d)
        assert abs(row["cosine"] - cos) < 1e-6


def test_zorder_matches_python(spark, sf_dir):
    got = {r["file_bucket"]: r for r in _rows(spark, sf_dir, "q415_zorder_layout")}
    t = load_tables(spark, sf_dir)
    stats = {}
    n_rows = Counter()
    for r in t["lineitem"].select("l_partkey", "l_suppkey").collect():
        px, sx = r["l_partkey"] % 1024, r["l_suppkey"] % 1024
        z = 0
        for i in range(10):  # real bit ops, unlike the //-% spelling
            z |= ((px >> i) & 1) << (2 * i)
            z |= ((sx >> i) & 1) << (2 * i + 1)
        b = z >> 14
        n_rows[b] += 1
        if b not in stats:
            stats[b] = [px, px, sx, sx]
        s = stats[b]
        s[0] = min(s[0], px)
        s[1] = max(s[1], px)
        s[2] = min(s[2], sx)
        s[3] = max(s[3], sx)
    assert set(got) == set(stats)
    for b, (pmin, pmax, smin, smax) in stats.items():
        row = got[b]
        assert row["n_rows"] == n_rows[b]
        assert (row["px_min"], row["px_max"]) == (pmin, pmax)
        assert (row["sx_min"], row["sx_max"]) == (smin, smax)
        assert abs(row["px_span"] - (pmax - pmin + 1) / 1024) < 1e-6
        assert abs(row["sx_span"] - (smax - smin + 1) / 1024) < 1e-6


def test_rfm_matches_python(spark, sf_dir):
    import datetime

    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in _rows(spark, sf_dir, "q416_rfm_segments")
    }
    t = load_tables(spark, sf_dir)
    per = defaultdict(lambda: [None, 0, 0])  # last, freq, cents
    for r in t["orders"].select(
        "o_custkey", "o_orderdate", "o_totalprice"
    ).collect():
        p = per[r["o_custkey"]]
        if p[0] is None or r["o_orderdate"] > p[0]:
            p[0] = r["o_orderdate"]
        p[1] += 1
        p[2] += math.floor(r["o_totalprice"] * 100 + 0.5)
    end = datetime.datetime(2001, 8, 1)
    segs = defaultdict(lambda: [0, 0])
    for last, freq, cents in per.values():
        rec = (end - last).days
        r_s = 1 if rec // 180 >= 4 else 5 - rec // 180
        f_s = min(5, 1 + (freq - 1) // 5)
        m_s = min(5, 1 + (cents // 100) // 800000)
        segs[(r_s, f_s, m_s)][0] += 1
        segs[(r_s, f_s, m_s)][1] += cents
    assert set(got) == set(segs)
    for k, (n, cents) in segs.items():
        assert got[k]["n_customers"] == n
        # replicate the engine's float path exactly: decimal->double is
        # nearest-double(cents/100), then *100, /n, floor
        assert got[k]["avg_monetary_cents"] == math.floor(cents / 100 * 100 / n)
