"""Round-6 reference tests: recompute each new operator's math with an
independent Python implementation (driver-side, brute force where the
Spark side blocks/buckets) and compare exactly.

The DuckDB oracle is the per-commit differential gate; these tests
guard against SHARED blind spots — a formula mistake mirrored into the
oracle SQL passes the differential but fails here.
"""

from __future__ import annotations

import calendar
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


def test_market_basket_matches_brute_force(spark, sf_dir):
    got = [
        tuple(r[c] for c in ("item_a", "item_b", "n_ab", "n_a", "n_b",
                             "conf_ab_ppm", "conf_ba_ppm", "lift_mils"))
        for r in _rows(spark, sf_dir, "q243_market_basket")
    ]
    ps = (
        load_tables(spark, sf_dir)["lineitem"]
        .selectExpr("l_orderkey as ok", "l_partkey as item")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = defaultdict(set)
    for r in ps:
        baskets[r["ok"]].add(r["item"])
    n_orders = len(baskets)
    item_n = Counter()
    pair_n = Counter()
    for items in baskets.values():
        for i in items:
            item_n[i] += 1
        for a, b in combinations(sorted(items), 2):
            pair_n[(a, b)] += 1
    rules = []
    for (a, b), nab in pair_n.items():
        if nab < 2:
            continue
        na, nb = item_n[a], item_n[b]
        rules.append(
            (
                a,
                b,
                nab,
                na,
                nb,
                nab * 1000000 // na,
                nab * 1000000 // nb,
                nab * n_orders * 1000 // (na * nb),
            )
        )
    rules.sort(key=lambda t: (-t[7], t[0], t[1]))
    assert got == rules[:100]


def test_bitmap_audience_matches_sets(spark, sf_dir):
    got = {
        (r["et1"], r["et2"]): (r["n_a"], r["n_b"], r["n_both"], r["jaccard_ppm"])
        for r in _rows(spark, sf_dir, "q244_bitmap_audience")
    }
    ev = (
        load_tables(spark, sf_dir)["events"]
        .select("event_type", "user_id")
        .collect()
    )
    sets: dict[str, set] = defaultdict(set)
    for r in ev:
        sets[r["event_type"]].add(r["user_id"])
    ref = {}
    types = sorted(sets)
    for a, b in combinations(types, 2):
        both = len(sets[a] & sets[b])
        union = len(sets[a]) + len(sets[b]) - both
        ref[(a, b)] = (len(sets[a]), len(sets[b]), both, both * 1000000 // union)
    assert got == ref


def test_kneser_ney_matches_python(spark, sf_dir):
    got = [
        (r["w1"], r["w2"], r["c"], r["mle_q"], r["kn_q"])
        for r in _rows(spark, sf_dir, "q247_kneser_ney")
    ]
    docs = load_tables(spark, sf_dir)["documents"].select("text").collect()
    bg = Counter()
    for r in docs:
        t = [w for w in r["text"].lower().strip().split() if w]
        for i in range(len(t) - 1):
            bg[(t[i], t[i + 1])] += 1
    cw1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for (w1, w2), c in bg.items():
        cw1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    n_types = len(bg)
    ref = []
    for (w1, w2), c in bg.items():
        mle = c * 1000000000 // cw1[w1]
        kn = max(4 * c - 3, 0) * 1000000000 // (4 * cw1[w1]) + (
            3 * n1fw[w1] * (n1bw[w2] * 1000000000 // n_types)
        ) // (4 * cw1[w1])
        ref.append((w1, w2, c, mle, kn))
    ref.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert got == ref[:100]


def test_hits_matches_python(spark, sf_dir):
    got = sorted(
        (r["role"], r["node_id"], r["score_q"])
        for r in _rows(spark, sf_dir, "q248_hits_scores")
    )
    t = load_tables(spark, sf_dir)
    o = {r["o_orderkey"]: r["o_custkey"] for r in t["orders"].collect()}
    edges = set()
    for r in t["lineitem"].select("l_orderkey", "l_suppkey").collect():
        if r["l_orderkey"] in o:
            edges.add((o[r["l_orderkey"]], r["l_suppkey"]))
    h1 = Counter()
    for c, _s in edges:
        h1[c] += 1
    a1 = Counter()
    for c, s in edges:
        a1[s] += h1[c]
    m = max(a1.values())
    a1q = {s: v * 1000000 // m for s, v in a1.items()}
    h2 = Counter()
    for c, s in edges:
        h2[c] += a1q[s]
    m = max(h2.values())
    h2q = {c: v * 1000000 // m for c, v in h2.items()}
    a2 = Counter()
    for c, s in edges:
        a2[s] += h2q[c]
    m = max(a2.values())
    a2q = {s: v * 1000000 // m for s, v in a2.items()}
    tops = sorted(a2q.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    toph = sorted(h2q.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    ref = sorted(
        [("authority", s, v) for s, v in tops]
        + [("hub", c, v) for c, v in toph]
    )
    assert got == ref


def test_theil_sen_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_pairs"], r["median_slope_q"])
        for r in _rows(spark, sf_dir, "q249_theil_sen")
    }
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "ts").collect()
    hr = Counter()
    for r in ev:
        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 + r["ts"].microsecond
        hr[(r["event_type"], math.floor(us / 3.6e9))] += 1
    series: dict[str, list] = defaultdict(list)
    for (et, h), y in sorted(hr.items()):
        series[et].append((h, y))
    ref = {}
    for et, pts in series.items():
        if len(pts) < 2:
            # The query's implicit n_pairs >= 1 behavior: an event type
            # with a single hourly point yields no pairwise slopes and
            # is omitted from the result — mirror that here instead of
            # crashing on slopes[-1] of an empty list if a fixture
            # change ever produces such a series.
            continue
        slopes = []
        for (h1, y1), (h2, y2) in combinations(pts, 2):
            slopes.append(math.floor((y2 - y1) * 1000000 / (h2 - h1)))
        slopes.sort()
        n = len(slopes)
        ref[et] = (n, slopes[(n + 1) // 2 - 1])
    assert got == ref


def test_decision_stumps_match_numpy(spark, sf_dir):
    import numpy as np

    got = [
        (r["dim"], r["thresh_bkt"], r["n_left"], r["wg_q"])
        for r in _rows(spark, sf_dir, "q253_decision_stumps")
    ]
    em = load_tables(spark, sf_dir)["embeddings"].select("embedding", "label").collect()
    X = np.array([r["embedding"][:8] for r in em], dtype=np.float32).astype(np.float64)
    y = np.array([r["label"] % 2 for r in em], dtype=np.int64)
    cands = []
    for d in range(8):
        bkt = np.clip(np.floor(X[:, d] * 16).astype(np.int64), -8, 7)
        for t in sorted(set(bkt.tolist()))[:-1]:
            left = bkt <= t
            n_l, n_r = int(left.sum()), int((~left).sum())
            p_l, p_r = int(y[left].sum()), int(y[~left].sum())
            wg = (n_l * n_l - p_l * p_l - (n_l - p_l) ** 2) * 1000000 // n_l + (
                n_r * n_r - p_r * p_r - (n_r - p_r) ** 2
            ) * 1000000 // n_r
            cands.append((wg, d + 1, t, n_l))
    cands.sort()
    ref = [(d, t, n_l, wg) for wg, d, t, n_l in cands[:5]]
    assert got == ref


def test_grid_join_matches_brute_force(spark, sf_dir):
    import hashlib

    got = [
        (r["id1"], r["id2"], r["d2"])
        for r in _rows(spark, sf_dir, "q246_grid_spatial_join")
    ]
    cu = load_tables(spark, sf_dir)["customer"].select("c_custkey").collect()
    pts = {}
    for r in cu:
        hx = hashlib.md5(str(r["c_custkey"]).encode()).hexdigest()
        pts[r["c_custkey"]] = (
            int(hx[:8], 16) % 180000,
            int(hx[8:16], 16) % 360000,
        )
    pairs = []
    ids = sorted(pts)
    for a, b in combinations(ids, 2):
        d2 = (pts[a][0] - pts[b][0]) ** 2 + (pts[a][1] - pts[b][1]) ** 2
        if d2 <= 25_000_000:
            pairs.append((d2, a, b))
    pairs.sort()
    ref = [(a, b, d2) for d2, a, b in pairs[:100]]
    assert got == ref


def test_distinctive_terms_match_python(spark, sf_dir):
    got = [
        (r["source"], r["term"], r["y_sw"], r["or_ppm"])
        for r in _rows(spark, sf_dir, "q258_distinctive_terms")
    ]
    docs = load_tables(spark, sf_dir)["documents"].select("source", "text").collect()
    sc = Counter()
    for r in docs:
        for w in r["text"].lower().strip().split():
            if w:
                sc[(r["source"], w)] += 1
    n_s = Counter()
    y_w = Counter()
    n = 0
    for (s, w), c in sc.items():
        n_s[s] += c
        y_w[w] += c
        n += c
    per_source: dict[str, list] = defaultdict(list)
    for (s, w), c in sc.items():
        if c < 3:
            continue
        orp = (c + 1) * ((n - n_s[s]) - (y_w[w] - c) + 1) * 1000000 // (
            (n_s[s] - c + 1) * (y_w[w] - c + 1)
        )
        per_source[s].append((-orp, w, c))
    ref = []
    for s in per_source:
        for negorp, w, c in sorted(per_source[s])[:10]:
            ref.append((s, w, c, -negorp))
    assert sorted(got) == sorted(ref)


def test_powerlaw_alpha_matches_python(spark, sf_dir):
    rows = _rows(spark, sf_dir, "q259_powerlaw_alpha")
    ps = (
        load_tables(spark, sf_dir)["lineitem"]
        .selectExpr("l_suppkey as supp", "l_partkey as part")
        .distinct()
        .collect()
    )
    deg = Counter()
    for r in ps:
        deg[r["supp"]] += 1
    hist = Counter(deg.values())
    tail = [d for d in deg.values() if d >= 2]
    sum_ln_q = sum(math.floor(math.log(d / 2.0) * 1000000 + 0.5) for d in tail)
    alpha = (
        1000000 + len(tail) * 1000000000000 // sum_ln_q if sum_ln_q > 0 else None
    )
    assert sorted((r["degree"], r["n_nodes"]) for r in rows) == sorted(hist.items())
    assert all(r["alpha_ppm"] == alpha and r["n_tail"] == len(tail) for r in rows)


def test_fano_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (r["n"], r["total_events"], r["mean_per_hour"], r["fano_x1e6"])
        for r in _rows(spark, sf_dir, "q260_burstiness_fano")
    }
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "ts").collect()
    hr = Counter()
    for r in ev:
        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 + r["ts"].microsecond
        hr[(r["event_type"], math.floor(us / 3.6e9))] += 1
    series: dict[str, list] = defaultdict(list)
    for (et, _h), y in hr.items():
        series[et].append(y)
    ref = {}
    for et, ys in series.items():
        n, sy, syy = len(ys), sum(ys), sum(y * y for y in ys)
        if n > 1 and sy > 0:
            ref[et] = (n, sy, sy // n, (n * syy - sy * sy) * 1000000 // ((n - 1) * sy))
    assert got == ref


def test_padding_waste_matches_python(spark, sf_dir):
    got = sorted(
        (r["cap"], r["len_bucket"], r["n_docs"], r["total_tokens"],
         r["pad_tokens"], r["waste_ppm"])
        for r in _rows(spark, sf_dir, "q261_padding_waste")
    )
    docs = load_tables(spark, sf_dir)["documents"].select("text").collect()
    cells = defaultdict(lambda: [0, 0, 0])
    for r in docs:
        nt = max(len([w for w in r["text"].lower().strip().split() if w]), 1)
        # Top spine bucket is clamped open-ended: documents past
        # 131071 tokens land in p=16, mirroring the query's clamp.
        p = min(nt.bit_length() - 1, 16)
        for cap in (512, 1024, 2048):
            waste = -(-nt // cap) * cap - nt
            c = cells[(cap, p)]
            c[0] += 1
            c[1] += nt
            c[2] += waste
    ref = sorted(
        (cap, p, n, tot, w, w * 1000000 // (tot + w))
        for (cap, p), (n, tot, w) in cells.items()
    )
    assert got == ref


def test_gate_ablation_matches_python(spark, sf_dir):
    import re

    got = sorted(
        (r["mask"], r["g_short"], r["g_lang"], r["g_rep"], r["g_digit"], r["n_docs"])
        for r in _rows(spark, sf_dir, "q262_gate_ablation")
    )
    docs = load_tables(spark, sf_dir)["documents"].select("text", "lang").collect()
    cells = Counter()
    for r in docs:
        tk = [w for w in r["text"].lower().strip().split() if w]
        g1 = 1 if len(tk) < 10 else 0
        g2 = 1 if r["lang"] != "en" else 0
        g3 = 1 if 2 * len(set(tk)) < len(tk) else 0
        g4 = 1 if 5 * len(re.sub(r"[^0-9]", "", r["text"])) > len(r["text"]) else 0
        cells[(g1 + 2 * g2 + 4 * g3 + 8 * g4, g1, g2, g3, g4)] += 1
    ref = sorted((*k, n) for k, n in cells.items())
    assert got == ref


def test_record_linkage_matches_brute_force(spark, sf_dir):
    got = [
        (r["id1"], r["id2"], r["score_q"], r["agree_seg"], r["agree_bal"], r["agree_ord"])
        for r in _rows(spark, sf_dir, "q245_record_linkage")
    ]
    t = load_tables(spark, sf_dir)
    n_ord = Counter(r["o_custkey"] for r in t["orders"].collect())
    recs = []
    for r in t["customer"].collect():
        cents = math.floor(r["c_acctbal"] * 100 + 0.5)
        recs.append(
            (r["c_custkey"], r["c_nationkey"], r["c_mktsegment"], cents,
             math.floor(r["c_acctbal"] / 1000.0), n_ord.get(r["c_custkey"], 0))
        )
    pairs = []
    for a, b in combinations(sorted(recs), 2):
        if a[1] != b[1] or a[4] != b[4]:
            continue
        seg = 1 if a[2] == b[2] else 0
        bal = 1 if abs(a[3] - b[3]) <= 5000 else 0
        ordm = 1 if a[5] == b[5] else 0
        score = (13863 if seg else -2231) + (16094 if bal else -1054) + (
            9163 if ordm else -2877
        )
        if score >= 25000:
            pairs.append((-score, a[0], b[0], seg, bal, ordm))
    pairs.sort()
    ref = [(i1, i2, -negs, s, ba, o) for negs, i1, i2, s, ba, o in pairs[:100]]
    assert got == ref


def test_holt_linear_matches_python(spark, sf_dir):
    got = sorted(
        (r["event_type"], r["h"], r["y"], r["level_255"], r["trend_255"],
         r["forecast_255"], r["abs_err_255"])
        for r in _rows(spark, sf_dir, "q255_holt_linear")
    )
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "ts").collect()
    hr = Counter()
    for r in ev:
        us = calendar.timegm(r["ts"].timetuple()) * 1_000_000 + r["ts"].microsecond
        hr[(r["event_type"], math.floor(us / 3.6e9))] += 1
    series: dict[str, list] = defaultdict(list)
    for (et, h), y in sorted(hr.items()):
        series[et].append((h, y))
    ref = []
    for et, pts in series.items():
        ys = [y for _h, y in pts]
        lv = [None] * len(ys)
        for i in range(7, len(ys)):
            lv[i] = sum(ys[i - k] * (128 >> k) for k in range(8))
        rows = []
        for i in range(9, len(ys)):
            l1, l2 = lv[i - 1], lv[i - 2]
            rows.append(
                (et, pts[i][0], ys[i], lv[i], lv[i] - l1, 2 * l1 - l2,
                 abs(255 * ys[i] - (2 * l1 - l2)))
            )
        ref.extend(rows[-24:])
    assert got == sorted(ref)


def test_purge_cascade_matches_python(spark, sf_dir):
    got = {
        r["nation"]: (r["n_customers"], r["n_orders"], r["n_lineitems"])
        for r in _rows(spark, sf_dir, "q266_purge_cascade")
    }
    t = load_tables(spark, sf_dir)
    nations = {r["n_nationkey"]: r["n_name"] for r in t["nation"].collect()}
    f = {
        r["c_custkey"]: r["c_nationkey"]
        for r in t["customer"].collect()
        if r["c_custkey"] % 199 == 0
    }
    cust_n = Counter(f.values())
    fo = {}
    ord_n = Counter()
    for r in t["orders"].select("o_orderkey", "o_custkey").collect():
        if r["o_custkey"] in f:
            nk = f[r["o_custkey"]]
            fo[r["o_orderkey"]] = nk
            ord_n[nk] += 1
    li_n = Counter()
    for r in t["lineitem"].select("l_orderkey").collect():
        if r["l_orderkey"] in fo:
            li_n[fo[r["l_orderkey"]]] += 1
    ref = {
        nations[nk]: (cust_n[nk], ord_n.get(nk, 0), li_n.get(nk, 0))
        for nk in cust_n
    }
    assert got == ref


def test_lsh_tuning_matches_python(spark, sf_dir):
    from tytodb_spark.queries import _MH64, _MH_P

    got = {
        (r["n_bands"], r["rows_per_band"]): (
            r["s_curve_threshold_ppm"], r["n_candidate_pairs"])
        for r in _rows(spark, sf_dir, "q264_lsh_tuning")
    }
    import hashlib

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id", "text").collect()
    sigs = {}
    for r in docs:
        toks = [w for w in r["text"].lower().strip().split() if w]
        grams = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not grams:
            continue
        h0s = [
            int(hashlib.md5(g.encode()).hexdigest()[:12], 16) % _MH_P
            for g in grams
        ]
        sigs[r["doc_id"]] = [
            min((a * h + b) % _MH_P for h in h0s) for _i, a, b in _MH64
        ]
    ref = {}
    for nb, rr in ((16, 4), (8, 8), (4, 16)):
        buckets = defaultdict(list)
        for d, s in sigs.items():
            for band in range(nb):
                key = (band, tuple(s[band * rr:(band + 1) * rr]))
                buckets[key].append(d)
        pairs = set()
        for ds in buckets.values():
            for a, b in combinations(sorted(ds), 2):
                pairs.add((a, b))
        thr = math.floor((1.0 / nb) ** (1.0 / rr) * 1000000 + 0.5)
        ref[(nb, rr)] = (thr, len(pairs))
    assert got == ref


def test_ab_sample_size_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (r["users"], r["convs"], r["cvr_ppm"], r["n_per_arm"])
        for r in _rows(spark, sf_dir, "q256_ab_sample_size")
    }
    ev = load_tables(spark, sf_dir)["events"].select("event_type", "user_id").collect()
    users: dict[str, set] = defaultdict(set)
    for r in ev:
        users[r["event_type"]].add(r["user_id"])
    buyers = users.get("purchase", set())
    stats = {}
    tot_u = tot_c = 0
    for et, us in users.items():
        convs = len(us & buyers)
        stats[et] = (len(us), convs, convs * 1000000 // len(us))
        tot_u += len(us)
        tot_c += convs
    base = tot_c * 1000000 // tot_u
    ref = {}
    for et, (u, c, cvr) in stats.items():
        if cvr == base:
            n = None
        else:
            d = cvr - base
            num = 784 * (cvr * (1000000 - cvr) + base * (1000000 - base))
            n = (num + 100 * d * d - 1) // (100 * d * d)
        ref[et] = (u, c, cvr, n)
    assert got == ref


def test_markov_accuracy_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: (r["predicted"], r["n_transitions"], r["n_correct"],
                          r["accuracy_ppm"])
        for r in _rows(spark, sf_dir, "q270_markov_accuracy")
    }
    ev = load_tables(spark, sf_dir)["events"].select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict[int, list] = defaultdict(list)
    for r in ev:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    trans = []
    for seq in by_user.values():
        seq.sort()
        for i in range(len(seq) - 1):
            trans.append((seq[i][2], seq[i + 1][2]))
    counts: dict[str, Counter] = defaultdict(Counter)
    for a, b in trans:
        counts[a][b] += 1
    pred = {
        a: sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        for a, c in counts.items()
    }
    ref = {}
    for a, c in counts.items():
        n = sum(c.values())
        correct = c[pred[a]]
        ref[a] = (pred[a], n, correct, correct * 1000000 // n)
    assert got == ref


def test_simpson_detector_matches_python(spark, sf_dir):
    got = {
        r["grp"]: (r["pooled_rate_ppm"], r["base_rate_ppm"], r["n_up"],
                   r["n_down"], r["simpson_flag"])
        for r in _rows(spark, sf_dir, "q269_simpson_detector")
    }
    t = load_tables(spark, sf_dir)
    nat = {r["c_custkey"]: r["c_nationkey"] for r in t["customer"].collect()}
    cells: dict[tuple, list] = defaultdict(lambda: [0, 0])
    for r in t["orders"].select("o_custkey", "o_orderpriority", "o_orderstatus").collect():
        key = (r["o_orderpriority"], nat[r["o_custkey"]])
        cells[key][0] += 1
        cells[key][1] += 1 if r["o_orderstatus"] == "F" else 0
    pooled: dict[str, list] = defaultdict(lambda: [0, 0])
    strat: dict[int, list] = defaultdict(lambda: [0, 0])
    tot = [0, 0]
    for (g, s), (n, pos) in cells.items():
        pooled[g][0] += n
        pooled[g][1] += pos
        strat[s][0] += n
        strat[s][1] += pos
        tot[0] += n
        tot[1] += pos
    base = tot[1] * 1000000 // tot[0]
    ref = {}
    for g in pooled:
        pr = pooled[g][1] * 1000000 // pooled[g][0]
        up = down = 0
        for (gg, s), (n, pos) in cells.items():
            if gg != g or n < 20:
                continue
            srate = strat[s][1] * 1000000 // strat[s][0]
            cr = pos * 1000000 // n
            if cr > srate:
                up += 1
            elif cr < srate:
                down += 1
        flag = (pr > base and down > up) or (pr < base and up > down)
        ref[g] = (pr, base, up, down, flag)
    assert got == ref


def test_decile_concentration_bounds_hold(spark, sf_dir):
    row = _rows(spark, sf_dir, "q276_decile_concentration")[0]
    rev = Counter()
    for r in load_tables(spark, sf_dir)["orders"].select(
        "o_custkey", "o_totalprice"
    ).collect():
        rev[r["o_custkey"]] += math.floor(r["o_totalprice"] * 100 + 0.5)
    vals = sorted(rev.values(), reverse=True)
    n = len(vals)
    k = -(-n // 10)
    total = sum(vals)
    true_share_ppm = sum(vals[:k]) * 1000000 // total
    assert row["n_customers"] == n and row["k_top"] == k
    assert row["share_lo_ppm"] <= true_share_ppm <= row["share_hi_ppm"]
    # bounds are bucket-tight: within one $10k bucket's worth of the truth
    assert row["share_hi_ppm"] - row["share_lo_ppm"] <= k * 1000000 * 1000000 // total
