"""Round-11 reference tests: independent pure-Python replicas of the
four preference/eval-analytics entries added this round (q515-q518),
extending the discipline of test_round10_refs.py — each replica
recomputes the result from collected base tables with textbook Python
(dict loops, hashlib, sorted lists), sharing NO code with the Spark
plans or the DuckDB oracle SQL.

Shared semantics under test (documented in the query docstrings):
- TTR/difficulty/pseudo-confidence are exact INTEGER micro values, so
  floor (//) and Spark's truncating `div` agree (operands non-negative
  everywhere by construction).
- The (2k, 2k+1) doc pairing, tie -> the even doc.
- md5-portability of the q518 per-epoch hash.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

from tytodb_spark.catalog import load_tables
from tytodb_spark.queries import REGISTRY

from tests import smoke_cache

_CACHE: dict = {}


def _docs(spark, sf_dir):
    key = (sf_dir, "documents")
    if key not in _CACHE:
        _CACHE[key] = load_tables(spark, sf_dir)["documents"].collect()
    return _CACHE[key]


def _rows(spark, sf_dir, name):
    # compute-once + cross-module prefetch (tests/smoke_cache.py): the
    # refs suites' ~190 serial sf0.001 query runs are scheduling-floor
    # bound and overlap 12-wide behind this helper.
    return smoke_cache.rows(spark, sf_dir, name)


def _ttr(text: str):
    """Integer type-token ratio in micro; None when the doc has no
    words (mirrors SQL NULL-on-zero-divide)."""
    words = [w for w in re.split(r"\s+", text.strip().lower()) if w != ""]
    if not words:
        return None
    return len(set(words)) * 1_000_000 // len(words)


def _n_words(text: str) -> int:
    return len([w for w in re.split(r"\s+", text.strip().lower()) if w != ""])


def _pairs(docs):
    """(2k, 2k+1) pairing: returns {pid: {0: row, 1: row}}."""
    by_pid: dict = defaultdict(dict)
    for r in docs:
        by_pid[r["doc_id"] // 2][r["doc_id"] % 2] = r
    return by_pid


def test_q515_bradley_terry_ranking(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q515_bradley_terry_ranking")]
    docs = _docs(spark, sf_dir)

    # matches: winner = longer n_chars, tie -> the even doc
    matches = []
    for pid, sides in _pairs(docs).items():
        if 0 not in sides or 1 not in sides:
            continue
        a, b = sides[0], sides[1]
        if a["source"] == b["source"]:
            continue
        if a["n_chars"] >= b["n_chars"]:
            matches.append((a["source"], b["source"]))
        else:
            matches.append((b["source"], a["source"]))

    # per unordered model pair: n games, wins of the lexicographically
    # smaller member
    pg: dict = defaultdict(lambda: [0, 0])  # (ma, mb) -> [n, wa]
    for w, l in matches:
        ma, mb = (w, l) if w < l else (l, w)
        cell = pg[(ma, mb)]
        cell[0] += 1
        if w == ma:
            cell[1] += 1

    games: dict = defaultdict(int)
    wins: dict = defaultdict(int)
    for (ma, mb), (n, wa) in pg.items():
        games[ma] += n
        wins[ma] += wa
        games[mb] += n
        wins[mb] += n - wa

    # MM iteration 1 from the uniform start collapses to win rate
    s1 = {m: max(1, (2_000_000 * wins[m]) // games[m]) for m in games}

    # iteration 2 denominator: each pair term quantized BEFORE the sum
    dm: dict = defaultdict(int)
    for (ma, mb), (n, _wa) in pg.items():
        term = (n * 1_000_000_000_000) // (s1[ma] + s1[mb])
        dm[ma] += term
        dm[mb] += term

    want = [
        (m, games[m], wins[m], max(1, (wins[m] * 1_000_000_000_000) // dm[m]))
        for m in games
    ]
    want.sort(key=lambda t: (-t[3], t[0]))
    assert got == want
    # sanity: every fixture source fields a team and plays games
    assert len(want) == len({r["source"] for r in docs})
    assert all(g > 0 for _, g, _, _ in want)


def test_q516_preference_pair_audit(spark, sf_dir):
    got = _rows(spark, sf_dir, "q516_preference_pair_audit")[0]
    docs = _docs(spark, sf_dir)

    n_pairs = longer = sum_delta = sum_margin = 0
    for pid, sides in _pairs(docs).items():
        if 0 not in sides or 1 not in sides:
            continue
        q0, q1 = _ttr(sides[0]["text"]), _ttr(sides[1]["text"])
        if q0 is None or q1 is None:
            continue
        if q0 >= q1:
            chosen, rejected, margin = sides[0], sides[1], q0 - q1
        else:
            chosen, rejected, margin = sides[1], sides[0], q1 - q0
        n_pairs += 1
        lc, lr = chosen["n_chars"], rejected["n_chars"]
        longer += 1 if lc > lr else 0
        sum_delta += lc - lr
        sum_margin += margin

    assert got["n_pairs"] == n_pairs
    assert got["chosen_longer_ppm"] == longer * 1_000_000 // n_pairs
    assert got["sum_len_delta"] == sum_delta
    assert got["mean_quality_margin_micro"] == sum_margin // n_pairs
    assert n_pairs > 0


def test_q517_curriculum_phases(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q517_curriculum_phases")]
    docs = _docs(spark, sf_dir)

    vs = []
    for r in docs:
        v = _ttr(r["text"])
        assert v is not None  # fixture has no zero-word docs
        vs.append((v, _n_words(r["text"])))

    ordered = sorted(v for v, _ in vs)
    n = len(ordered)
    # exact quartile cut i = the value at 1-indexed rank ceil(n*i/4)
    cuts = [ordered[(n * i + 3) // 4 - 1] for i in (1, 2, 3)]

    agg: dict = defaultdict(lambda: [0, 0, 0])  # phase -> [n, tokens, sum_v]
    for v, nt in vs:
        phase = 1 + sum(1 for c in cuts if v > c)
        cell = agg[phase]
        cell[0] += 1
        cell[1] += nt
        cell[2] += v
    want = [
        (p, c[0], c[1], c[2] // c[0]) for p, c in sorted(agg.items())
    ]
    assert got == want
    # the quartile rule can merge phases only on massive ties; fixture
    # should produce all four
    assert [p for p, *_ in want] == [1, 2, 3, 4]


def _carto_conf(doc_id: int, epoch: int, ttr: int) -> int:
    h = int(
        hashlib.md5(f"carto:{doc_id}:{epoch}".encode()).hexdigest()[:8], 16
    )
    return ((h * 1_000_000) // 4_294_967_296 + ttr) // 2


def test_q518_dataset_cartography(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q518_dataset_cartography")]
    docs = _docs(spark, sf_dir)

    agg: dict = defaultdict(lambda: [0, 0, 0])  # region -> [n, sum_conf, sum_var]
    for r in docs:
        ttr = _ttr(r["text"])
        ps = [_carto_conf(r["doc_id"], k, ttr) for k in range(4)]
        sp, sq = sum(ps), sum(p * p for p in ps)
        conf, var16 = sp // 4, 4 * sq - sp * sp
        assert var16 >= 0  # Cauchy-Schwarz: exact integer variance x16
        region = (
            "ambiguous"
            if var16 > 300_000_000_000
            else ("easy" if conf >= 500_000 else "hard")
        )
        cell = agg[region]
        cell[0] += 1
        cell[1] += conf
        cell[2] += var16
    want = [
        (reg, c[0], c[1] // c[0], c[2] // c[0])
        for reg, c in sorted(agg.items())
    ]
    assert got == want
    assert sum(c for _, c, _, _ in want) == len(docs)


def _quant(x: float, scale: int) -> int:
    return int(math.trunc(float(x) * scale))


def test_q519_embedding_drift_audit(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q519_embedding_drift_audit")]
    key = (sf_dir, "embeddings")
    if key not in _CACHE:
        _CACHE[key] = load_tables(spark, sf_dir)["embeddings"].collect()
    vecs = _CACHE[key]

    d = len(vecs[0]["embedding"])
    cells = defaultdict(lambda: [0, 0, 0])  # (dim, grp) -> [n, s, ss]
    for r in vecs:
        grp = r["vec_id"] % 2
        for dim, x in enumerate(r["embedding"]):
            q = _quant(x, 10_000)
            c = cells[(dim, grp)]
            c[0] += 1
            c[1] += q
            c[2] += q * q
    rows = []
    for dim in range(d):
        na, sa, ssa = cells[(dim, 0)]
        nb, sb, ssb = cells[(dim, 1)]
        mash = (sa + na * 10_000) // na
        mbsh = (sb + nb * 10_000) // nb
        va = max(0, ssa // na - (mash - 10_000) ** 2)
        vb = max(0, ssb // nb - (mbsh - 10_000) ** 2)
        delta, vp = mash - mbsh, (va + vb) // 2
        rows.append((dim, delta, vp, delta * delta * 1_000_000 // (vp + 1)))
    rows.sort(key=lambda t: (-t[3], t[0]))
    assert got == rows[:8]
    assert got[0][3] > 0  # fixture drift signal is non-degenerate


def test_q520_embedding_gram_audit(spark, sf_dir):
    got = [tuple(r) for r in _rows(spark, sf_dir, "q520_embedding_gram_audit")]
    key = (sf_dir, "embeddings")
    if key not in _CACHE:
        _CACHE[key] = load_tables(spark, sf_dir)["embeddings"].collect()
    vecs = _CACHE[key]

    qs = [[_quant(x, 1_000) for x in r["embedding"]] for r in vecs]
    n, d = len(qs), len(qs[0])
    s = [sum(row[i] for row in qs) for i in range(d)]
    g2 = [sum(row[i] * row[i] for row in qs) for i in range(d)]
    mu = [(s[i] + n * 1_000) // n - 1_000 for i in range(d)]
    var = [max(0, g2[i] // n - mu[i] * mu[i]) for i in range(d)]
    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            gij = sum(row[i] * row[j] for row in qs)
            cnb = (gij + n * 400_000) // n - 400_000 - mu[i] * mu[j]
            rows.append(
                (
                    i,
                    j,
                    cnb * cnb * 1_000_000 // (var[i] * var[j] + 1),
                    -1 if cnb < 0 else 1,
                )
            )
    rows.sort(key=lambda t: (-t[2], t[0], t[1]))
    assert got == rows[:8]
    assert got[0][2] > 0


def test_q521_hll_set_algebra(spark, sf_dir):
    """Textbook HLL replica: hashlib md5, dict registers, integer
    harmonic sums — the full sketch algebra recomputed independently."""
    got = [tuple(r) for r in _rows(spark, sf_dir, "q521_hll_set_algebra")]
    docs = _docs(spark, sf_dir)

    M, ALPHA_PPM = 256, 718272
    ESTNUM = ALPHA_PPM * M * M * 65536

    shingles: dict = defaultdict(set)
    for r in docs:
        ws = [w for w in re.split(r"\s+", r["text"].strip().lower()) if w]
        for i in range(len(ws) - 2):
            shingles[r["source"]].add(" ".join(ws[i : i + 3]))

    def registers(toks):
        regs = [0] * M
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            b, w = h % M, h // M
            rho = 25 - w.bit_length()  # bit_length(0) == 0 -> rho 25
            regs[b] = max(regs[b], rho)
        return regs

    def estimate(regs):
        sh = sum(1 << (30 - m0) for m0 in regs)
        return ESTNUM // ((sh // 16384) * 1_000_000)

    regs = {s: registers(t) for s, t in shingles.items()}
    est = {s: estimate(r) for s, r in regs.items()}

    rows = []
    for s1 in sorted(regs):
        for s2 in sorted(regs):
            if s1 >= s2:
                continue
            union = [max(a, b) for a, b in zip(regs[s1], regs[s2])]
            eu = estimate(union)
            ei = max(0, est[s1] + est[s2] - eu)
            exact = len(shingles[s1] & shingles[s2])
            rows.append(
                (
                    s1,
                    s2,
                    ei,
                    ei * 1_000_000 // max(1, eu),
                    exact,
                    abs(ei - exact) * 1_000_000 // max(1, exact),
                    ei < (eu * 130) // 1000,
                )
            )
    rows.sort(key=lambda t: (-t[3], t[0], t[1]))
    assert got == rows[:10]
    # sketch must be in its valid (non-small-range) regime here
    assert all(len(t) >= 640 for t in shingles.values())
