"""Text-analysis operators for LLM-data pipelines (BASELINE.json mandate;
no reference counterpart — the reference's only text ops are the three
string predicates, src/query_conditions.rs:422-479).

Everything here is built-in-expression-only (whole-stage codegen, no
Python in the hot path) so it scales to a 100 TB documents table:
tokenization, n-gram shingles, language-ID heuristic, quality scoring,
token counting, and document fingerprinting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition on `key` so expression-heavy per-row work uses
    every core. On a real many-file table the scan already yields many
    splits; the local single-file testdata arrives as ONE partition
    (single parquet row group — not even byte-range splittable), which
    would serialize all downstream codegen work.

    The partition count is explicit (defaultParallelism) on purpose:
    these shuffles carry few BYTES but fan out heavy per-row COMPUTE,
    and AQE's byte-based coalescing would squash an unnumbered
    repartition back to one partition (measured: 40×)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.col(key))

# ---------------------------------------------------------------------------
# tokenization
# ---------------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Lowercased whitespace tokens; empty-string-safe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(F.trim(c)), r"\s+"), lambda t: t != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-ish proxy token count: word pieces + digits + punctuation
    counted separately (regex segmentation, not a trained vocab)."""
    c = F.col(col) if isinstance(col, str) else col
    pieces = F.regexp_extract_all(c, F.lit(r"[A-Za-z]{1,4}|\d|[^\sA-Za-z\d]"), 0)
    return F.size(pieces)


def _bind_once(expr: Column, build) -> Column:
    """Evaluate ``expr`` once per row and hand it to ``build`` as a
    transform lambda variable. Higher-order-function lambdas run
    interpreted and RE-EVALUATE embedded subtrees per element, so an
    expression referenced n_grams x n times (the element_at lookups)
    re-tokenizes the document per lookup — measured 26.1 s -> 0.67 s
    (39x) for an 8-gram explode over sf0.1 documents. Binding the
    subtree as the (single-element) transform input makes it one
    evaluation regardless of how many lambda references follow."""
    return F.element_at(F.transform(F.array(expr), build), 1)


def word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-gram shingles as an array<string> (space-joined).
    Returns an empty array when the document has fewer than n tokens."""
    if n == 1:  # the generic n-gram assembly is pure overhead at n=1
        return tokens(col)

    # n direct element lookups beat slice()+array_join(): no per-gram
    # array allocation, and a ~3× smaller codegen unit (measured cold)
    def build(t):
        grams = F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j).cast("int")) for j in range(n)]
            ),
        )
        return F.when(F.size(t) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return _bind_once(tokens(col), build)


def hashed_word_ngrams(col: Column | str, n: int) -> Column:
    """Word n-gram shingles as 64-bit hashes (array<bigint>): one
    position-sensitive xxhash64 over the n window tokens per position —
    no n-gram string is ever materialized. For set-similarity pipelines
    (Jaccard, MinHash) shingle CONTENT is never needed, only equality,
    and the hashed form is both ~2× cheaper to build (no concat
    allocations) and ~3× narrower on the wire when shingles shuffle
    (8 B vs a 20-30 B string). Collision probability at 64 bits is
    ~|vocab|²/2⁶⁵ — immaterial next to the similarity thresholds.

    Binds the token array once per row (:func:`_bind_once`) before the
    per-position lookups — the same interpreted-lambda re-evaluation
    fix as :func:`word_ngrams`."""
    return _bind_once(tokens(col), lambda t: hashed_ngrams_from_tokens(t, n))


def hashed_ngrams_from_tokens(tok_col: Column | str, n: int) -> Column:
    """:func:`hashed_word_ngrams` over an ALREADY-MATERIALIZED token
    array column. The text-column variant embeds ``tokens(text)`` inside
    the transform lambda, and because higher-order-function lambdas run
    interpreted, every gram's element lookups re-evaluate the split —
    fine once, a measured ~3x tax when a query builds grams at several
    depths from the same text (q208: 6.7 s -> 2.1 s at sf0.1 by
    tokenizing once into a persisted column and deriving every depth
    from it). Use with a persisted/checkpointed token frame so Catalyst
    cannot collapse the tokenization back into the lambda."""
    t = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.xxhash64(
            *[F.element_at(t, (i + j).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(t) >= n, grams).otherwise(
        F.array().cast("array<bigint>")
    )


def char_ngrams(col: Column | str, n: int) -> Column:
    """Character n-gram shingles (for MinHash over short texts)."""
    raw = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))

    def build(c):
        grams = F.transform(
            F.sequence(F.lit(1), F.length(c) - (n - 1)),
            lambda i: F.substring(c, i, n),
        )
        return F.when(F.length(c) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )

    return _bind_once(raw, build)


# ---------------------------------------------------------------------------
# language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

# Marker stopwords per language — tiny, deterministic, good enough to
# demonstrate the operator; swap for fastText/CLD3 scores in production.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "los", "es"],
    "fr": ["le", "la", "les", "des", "est", "et"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
}


def _marker_hits(col: Column, words: list[str]) -> Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(pattern), 0))


def lang_scores(col: Column | str) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {lang: _marker_hits(c, ws) for lang, ws in LANG_MARKERS.items()}


def lang_id(col: Column | str) -> Column:
    """argmax over marker-hit counts; 'und' when no marker hits.
    Deterministic tie-break: language name ascending."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(scores, reverse=True):  # later iterations win ties by name asc
        s = scores[lang]
        take = s >= F.greatest(best_score, F.lit(1))
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, s).otherwise(best_score)
    return best_lang


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------


def quality_features(col: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword / digit ratios — the standard
    cheap pre-filters for pretraining corpora."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    safe = F.greatest(n_chars, F.lit(1))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", ""))
    n_tokens = token_count(c)
    n_stop = _marker_hits(c, LANG_MARKERS["en"])
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": n_alpha / safe,
        "digit_ratio": n_digit / safe,
        "punct_ratio": n_punct / safe,
        "stopword_ratio": n_stop / F.greatest(n_tokens, F.lit(1)),
        "mean_word_len": n_alpha / F.greatest(n_tokens, F.lit(1)),
    }


def quality_score(col: Column | str) -> Column:
    """Composite [0,1]-ish score: favor alphabetic, stopword-bearing,
    mid-length documents; penalize digit/punct noise."""
    f = quality_features(col)
    raw = (
        0.4 * f["alpha_ratio"]
        + 0.3 * F.least(f["stopword_ratio"] * 4, F.lit(1.0))
        + 0.3 * F.least(f["n_tokens"] / F.lit(64.0), F.lit(1.0))
        - 0.2 * f["digit_ratio"]
        - 0.2 * f["punct_ratio"]
    )
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 6)


# ---------------------------------------------------------------------------
# fingerprinting
# ---------------------------------------------------------------------------


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set. Identical wording-permutations collide — by
    design (it's a bag-of-words content key)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def rolling_hashes(col: Column | str, window: int = 8) -> Column:
    """Rolling (Rabin-Karp-style) window hashes over the token stream —
    the winnowing building block. Returns array<bigint>, one hash per
    window position.

    Each token is hashed ONCE (xxhash64), then windows combine the
    token hashes with position-dependent bit rotations XOR-folded
    together — position-sensitive, overflow-free (bit ops never trip
    ANSI arithmetic checks), and no per-window n-gram string
    materialization. Building the 8-token gram strings first was
    measured ~3× slower: the concat allocations dominate, not the
    hashing."""
    t = tokens(col)
    th = F.transform(t, lambda x: F.xxhash64(x))
    n = F.size(t)

    def rot(h: Column, j: int) -> Column:
        if j == 0:
            return h
        return F.shiftleft(h, j).bitwiseOR(F.shiftrightunsigned(h, 64 - j))

    def win_hash(i: Column) -> Column:
        parts = [
            rot(F.element_at(th, (i + j).cast("int")), 7 * j)
            for j in range(window)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.bitwiseXOR(p)
        return out

    idx = F.sequence(F.lit(1), n - (window - 1))
    return F.when(n >= window, F.transform(idx, win_hash)).otherwise(
        F.array().cast("array<bigint>")
    )


def winnow_key(col: Column | str, window: int = 8) -> Column:
    """Min rolling-window hash — a locality-robust near-exact key."""
    h = rolling_hashes(col, window)
    return F.when(F.size(h) > 0, F.array_min(h)).otherwise(F.xxhash64(F.col(col) if isinstance(col, str) else col))


def winnow_key_portable(col: Column | str, window: int = 8) -> Column:
    """Engine-portable :func:`winnow_key`: same min-over-window-hashes
    key, but each window hash is the first 32 md5 bits of the
    space-joined token gram — reproducible bit-for-bit in any engine
    with md5 (the DuckDB oracle for q92 recomputes it), vs the
    xxhash64+rotation rolling hash which is Spark-only. 32 bits is
    plenty for a candidate SIEVE key (collisions just add candidates,
    they never lose one). The rolling-hash variant stays the throughput
    path: it hashes each token once instead of materializing gram
    strings (~3× less allocation, see :func:`rolling_hashes`)."""
    c = F.col(col) if isinstance(col, str) else col

    def h32(s: Column) -> Column:
        return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")

    hashes = F.transform(word_ngrams(c, window), h32)
    return F.when(F.size(hashes) > 0, F.array_min(hashes)).otherwise(h32(c))


# ---------------------------------------------------------------------------
# n-gram Jaccard pair similarity (inverted-index join — shuffle-scalable)
# ---------------------------------------------------------------------------


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Materialized shingle sets: (__id, __sh array<bigint>, __n) —
    shingles are 64-bit hashes (see :func:`hashed_word_ngrams`); the
    string-exact DuckDB oracles still match because Jaccard over hashed
    trigram sets equals Jaccard over the trigram strings.

    Spread first (tokenization must fan out, not run on the scan's map
    side), then CHECKPOINT the arrays. The barrier is load-bearing
    twice: (a) every downstream branch — candidate generation and both
    verify join sides — reuses the arrays instead of re-tokenizing the
    corpus, and (b) CollapseProject would otherwise inline the n-gram
    expression into every consumer lambda (e.g. all 64 per-seed MinHash
    lambdas — a measured ~30× blowup) and push the size-filter down
    into the file scan as a second full tokenization. localCheckpoint
    (disk-backed, spills like MEMORY_AND_DISK) rather than persist so
    the blocks are released with the plan by the context cleaner — an
    operator cannot unpersist a frame it returns. __n is computed on
    the checkpointed attribute, never on the raw text."""
    cached = (
        spread(df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__txt")), "__id")
        .select("__id", F.array_distinct(hashed_word_ngrams("__txt", n)).alias("__sh"))
        .localCheckpoint(eager=False)
    )
    return cached.withColumn("__n", F.size("__sh")).filter(F.col("__n") > 0)


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    threshold: float = 0.5,
    broadcast_dfreq: bool = True,
) -> DataFrame:
    """All-pairs n-gram Jaccard — EXACT, with AllPairs prefix filtering.

    Naive inverted-index self-join generates Σ df(g)² candidate rows;
    stop-shingles (high document frequency) make that quadratic in
    practice. The AllPairs/PPJoin prefix filter keeps it exact while
    pruning: order every doc's shingles by ascending global document
    frequency and index only the first |s| - ⌈t·|s|⌉ + 1 of them. Any
    pair with Jaccard ≥ t must share a prefix shingle (the smallest
    common shingle in the global order cannot sit in both suffixes —
    pigeonhole on the required overlap ⌈t·|s|⌉), so joining prefixes
    finds every qualifying pair; frequent shingles land in suffixes and
    never join. A size filter (min ≥ t·max) prunes further, and exact
    Jaccard over the full shingle sets verifies each candidate.

    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    ``broadcast_dfreq``: the document-frequency table is one row per
    DISTINCT shingle — vocabulary-sized, not corpus-sized — and
    broadcasting it keeps `posts` on its existing __id partitioning, so
    BOTH the df-annotate join and the per-doc rank window run without an
    exchange (statically; AQE's late SMJ→BHJ conversion cannot remove
    the already-planned window exchange). Pass False when the shingle
    vocabulary itself is too big to broadcast (web-scale char-ngrams) —
    the plan degrades to shuffle joins, which still scale.
    """
    shingled = shingle_table(df, id_col, text_col, n)
    posts = shingled.select("__id", "__n", F.explode("__sh").alias("__s"))
    dfreq = posts.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    if broadcast_dfreq:
        dfreq = F.broadcast(dfreq)
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    prefix = (
        posts.join(dfreq, "__s")
        .withColumn(
            "__rk",
            F.row_number().over(W.partitionBy("__id").orderBy("__df", "__s")),
        )
        .filter(F.col("__rk") <= prefix_len)
    )
    a = prefix.select(F.col("__id").alias("id_a"), F.col("__n").alias("n_a"), "__s")
    b = prefix.select(F.col("__id").alias("id_b"), F.col("__n").alias("n_b"), "__s")
    candidates = (
        a.join(b, "__s")
        .filter(F.col("id_a") < F.col("id_b"))
        # size bound: jac ≥ t ⟹ min(|a|,|b|) ≥ t·max (epsilon guards the
        # float multiply at the boundary)
        .filter(
            F.least("n_a", "n_b")
            >= F.lit(threshold) * F.greatest("n_a", "n_b") - F.lit(1e-9)
        )
        .select("id_a", "id_b")
        .distinct()
    )
    sh = shingled.select("__id", "__sh", "__n")
    verified = (
        candidates.join(
            sh.select(
                F.col("__id").alias("id_a"),
                F.col("__sh").alias("sh_a"),
                F.col("__n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("__id").alias("id_b"),
                F.col("__sh").alias("sh_b"),
                F.col("__n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("__n_common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("__n_common") / (F.col("n_a") + F.col("n_b") - F.col("__n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id_a", "id_b", "jaccard")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    broadcast_dfreq: bool = True,
) -> DataFrame:
    """ASYMMETRIC containment pairs: C = |A∩B| / min(|A|,|B|) ≥ t —
    the sub-document inclusion detector Jaccard structurally misses
    (a tweet quoted inside an article has J ≈ |tweet|/|article| ≈ 0 but
    containment 1; quote-inclusion and boilerplate-wrapping dups are
    exactly this shape, cf. Lee et al.'s motivation for span dedup).

    Candidate pruning is the AllPairs prefix filter applied to the
    SMALLER side only: containment ≥ t forces overlap ≥ ⌈t·|S|⌉ for
    the smaller set S, so S's ⌈|S|−t·|S|⌉+1 lowest-df shingles must
    hit the other doc (pigeonhole) — but since the partner's size is
    unknown at probe time, every doc's prefix probes the FULL posting
    list (no size bound and no partner-prefix bound apply to
    containment; that asymmetry is the price of catching small⊂big).
    df-ascending prefix order still keeps stop-shingles out of the
    probe side. Exact verification over the cached shingle arrays.

    Output: (id_a, id_b, containment) with id_a < id_b, round(·, 6).
    """
    shingled = shingle_table(df, id_col, text_col, n)
    posts = shingled.select("__id", "__n", F.explode("__sh").alias("__s"))
    # broadcast_dfreq: same escape hatch as jaccard_pairs — the df
    # table is vocabulary-sized; pass False when the shingle vocab
    # itself outgrows a broadcast (web-scale char-ngrams) and the plan
    # degrades to shuffle joins, which still scale
    dfreq = posts.groupBy("__s").agg(F.count(F.lit(1)).alias("__df"))
    if broadcast_dfreq:
        dfreq = F.broadcast(dfreq)
    prefix_len = F.col("__n") - F.ceil(F.lit(threshold) * F.col("__n")) + 1
    prefix = (
        posts.join(dfreq, "__s")
        .withColumn(
            "__rk",
            F.row_number().over(W.partitionBy("__id").orderBy("__df", "__s")),
        )
        .filter(F.col("__rk") <= prefix_len)
        .select(F.col("__id").alias("__p"), "__s")
    )
    candidates = (
        prefix.join(posts.select(F.col("__id").alias("__f"), "__s"), "__s")
        .filter(F.col("__p") != F.col("__f"))
        .select(
            F.least("__p", "__f").alias("id_a"),
            F.greatest("__p", "__f").alias("id_b"),
        )
        .distinct()
    )
    sh = shingled.select("__id", "__sh", "__n")
    return (
        candidates.join(
            sh.select(
                F.col("__id").alias("id_a"),
                F.col("__sh").alias("sh_a"),
                F.col("__n").alias("n_a"),
            ),
            "id_a",
        )
        .join(
            sh.select(
                F.col("__id").alias("id_b"),
                F.col("__sh").alias("sh_b"),
                F.col("__n").alias("n_b"),
            ),
            "id_b",
        )
        .withColumn("__c", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "containment",
            F.round(F.col("__c") / F.least("n_a", "n_b"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ---------------------------------------------------------------------------
# benchmark decontamination & repetition filtering
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: drop every training document that
    shares at least one word ``n``-gram with the benchmark corpus.

    Scale shape (the standard eval-leakage pass in LLM data pipelines):
    the benchmark side is KBs-to-MBs while the training side is the
    100 TB corpus, so the benchmark n-gram set is built `distinct` and
    broadcast — the contamination probe is then a map-side hash lookup
    on the training scan, no shuffle of the big side. The only shuffles
    are the `distinct` on the (tiny) benchmark grams and the doc-id
    dedup of hits, both benchmark-bounded. The final `left_anti` joins
    train against the (small) hit list, again broadcastable.

    Returns the clean training rows (all original columns).
    """
    # grams probe as 64-bit hashes (see hashed_word_ngrams): membership
    # needs equality only, and skipping the n-gram string concat makes
    # the corpus-side pass ~3× cheaper (measured on the k×4 smoke); a
    # false-positive collision needs |train grams|·|bench grams|/2⁶⁴ —
    # immaterial
    bench_grams = (
        bench.select(F.explode(hashed_word_ngrams(text_col, n)).alias("__g"))
        .distinct()
    )
    # spread: the probe side tokenizes the whole corpus — fan it out
    # rather than n-gramming on the (possibly few-split) scan map side
    train_grams = spread(train.select(F.col(id_col).alias("__tid"), text_col), "__tid").select(
        "__tid", F.explode(hashed_word_ngrams(text_col, n)).alias("__g")
    )
    contaminated = (
        train_grams.join(F.broadcast(bench_grams), "__g")
        .select(F.col("__tid").alias(id_col))
        .distinct()
    )
    return train.join(F.broadcast(contaminated), id_col, "left_anti")


def duplicate_gram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 2
) -> DataFrame:
    """Per-document repetition score: the fraction of word ``n``-grams
    that are repeats of an earlier gram in the same document
    (Gopher-style `duplicate n-gram fraction` quality signal).

    1 − distinct/total over the exploded grams — a single hash
    aggregation keyed by doc id; Spark plans the distinct count as the
    standard two-phase expand, partials map-side, so the full text never
    shuffles — only (id, gram) pairs, and only once. Documents with
    fewer than ``n`` tokens produce no grams and are absent from the
    output (matching `unnest` of an empty list in SQL).

    Output: (id_col, dup_frac double). The division is a single exact
    int/int double op — bit-identical across engines and partitionings.
    """
    grams = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("__g")
    )
    return grams.groupBy(id_col).agg(
        (F.lit(1.0) - F.countDistinct("__g") / F.count(F.lit(1))).alias("dup_frac")
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document to a bag of query terms
    (idf·tf saturation with length normalization) — the ranking stage
    that sits on top of q62's tf-idf features in a retrieval pipeline.

    Plan shape for a 100 TB corpus: ONE tokenization pass feeds both the
    doc-length table and the term-frequency table; tf is filtered to the
    query terms BEFORE its aggregation, so the only corpus-sized shuffle
    carries (id, len) pairs; corpus stats (N, avgdl) and per-term df are
    single-row / |terms|-row broadcasts.

    Determinism for the differential oracle: avgdl is an exact bigint
    sum divided once, and per-term scores are quantized to 1e-7 before
    the cross-term sum (exact integer addition in any order) — the q79
    centroid pattern.

    Output: (id_col, bm25 double), docs containing ≥1 query term.
    """
    toks = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__w")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__corpus_n"),
        (F.sum("__dl").cast("bigint").cast("double") / F.count(F.lit(1))).alias(
            "__avgdl"
        ),
    )
    tf = (
        toks.filter(F.col("__w").isin(list(terms)))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        (F.col("__corpus_n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    score = (
        idf
        * (F.col("__tf") * (k1 + 1))
        / (
            F.col("__tf")
            + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
    )
    per_term = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "__w")
        .crossJoin(F.broadcast(stats))
        .withColumn("__q", F.floor(score * 1e7).cast("bigint"))
    )
    return per_term.groupBy(id_col).agg(
        (F.sum("__q") / F.lit(1e7)).alias("bm25")
    )


def cross_doc_gram_fraction(
    df: DataFrame, id_col: str, text_col: str, n: int = 4
) -> DataFrame:
    """Per-document CROSS-corpus duplication score: the fraction of a
    document's distinct word ``n``-grams that also occur in at least one
    other document — the corpus-level complement of
    `duplicate_gram_fraction` (within-doc repeats) and a cheap,
    SQL-checkable stand-in for suffix-array ExactSubstr dedup: documents
    with a high shared fraction are boilerplate/templated near-copies
    that MinHash may miss when the shared spans are short.

    Scale shape: grams travel as 64-bit hashes (hashed_word_ngrams — the
    q94 probe trick), so the two corpus-sized exchanges (gram →
    doc-frequency, gram → per-doc fraction re-join) carry 16-byte rows
    instead of n-word strings; both partial-aggregate map-side. The
    doc-frequency table is corpus-bounded but gram-distinct.

    Output: (id_col, shared_frac double) — int/int division done once,
    exact across engines; docs with < n tokens yield no grams and are
    absent (matches SQL `unnest` of an empty list).
    """
    grams = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(hashed_word_ngrams(text_col, n))).alias("__g"),
    )
    gram_df = grams.groupBy("__g").agg(F.count(F.lit(1)).alias("__docs"))
    return (
        grams.join(gram_df, "__g")
        .groupBy(id_col)
        .agg(
            (
                F.sum(F.when(F.col("__docs") >= 2, 1).otherwise(0)).cast("bigint")
                / F.count(F.lit(1))
            ).alias("shared_frac")
        )
    )


# ---------------------------------------------------------------------------
# passage-level dedup (fixed-token-window chunks, corpus-wide keep-first)
# ---------------------------------------------------------------------------


def passage_dedup_stats(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 20
) -> DataFrame:
    """Passage-level exact dedup (the RefinedWeb/Dolma step BELOW
    document granularity): split every document into fixed
    ``chunk_tokens``-token passages, dedup passages CORPUS-WIDE by
    content hash with a deterministic keep-first rule (lowest
    (doc_id, chunk_idx) survives), and report per-document duplication.

    Plan shape: one explode (×n_chunks/doc), ONE shuffle on the passage
    content key for the keep-first window, one shuffle back onto doc_id
    for the rollup — both narrow (the passage TEXT never shuffles, only
    its md5 key). Boilerplate passages are the classic skew key: AQE
    handles moderate skew, and an exact-dedup pre-pass removes
    whole-doc copies first in the declared pipeline.

    Output: (id, n_chunks, n_dup_chunks) — n_dup_chunks counts this
    doc's passages that already occur earlier in the corpus order.
    """
    toks = tokens(F.col(text_col))
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    chunk_list = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(toks, i * chunk_tokens + 1, chunk_tokens), " "),
    )
    chunks = (
        spread(df.select(id_col, text_col), id_col)
        .filter(F.size(toks) > 0)
        .select(F.col(id_col), F.posexplode(chunk_list).alias("__idx", "__chunk"))
        .select(F.col(id_col), "__idx", F.md5(F.col("__chunk")).alias("__key"))
    )
    w = W.partitionBy("__key").orderBy(F.col(id_col), F.col("__idx"))
    ranked = chunks.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("__rn") > 1).cast("int")).cast("bigint").alias("n_dup_chunks"),
    )


# ---------------------------------------------------------------------------
# unigram-LM negative log likelihood (CCNet-style quality signal)
# ---------------------------------------------------------------------------


def unigram_nll(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram language model — the CCNet-style fluency/quality signal
    (documents full of rare or garbage tokens score high).

    Two passes over the token stream: (1) vocabulary counts (narrow
    aggregate — map-side partials collapse each partition to its
    distinct terms), (2) token→probability join + per-doc mean. The
    vocab here is broadcast; at web scale the term table outgrows a
    broadcast and this becomes a shuffle join on term plus a min-count
    floor — same plan shape, different join strategy (AQE picks).

    nll is rounded to 6 decimals so float summation order can't leak
    into comparisons (ln of identical rationals is engine-stable; the
    sum order is not). Output: (id, n_toks, nll).
    """
    toks = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__term")
    )
    vocab = toks.groupBy("__term").agg(F.count(F.lit(1)).alias("__c"))
    total = vocab.agg(F.sum("__c").cast("bigint").alias("__s"))
    scored = toks.join(F.broadcast(vocab), "__term").crossJoin(F.broadcast(total))
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.round(
            F.avg(-F.log(F.col("__c").cast("double") / F.col("__s").cast("double"))), 6
        ).alias("nll"),
    )


def vocab_coverage(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 20
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` token vocabulary — the tokenizer-coverage filter
    (docs a fixed vocab can't represent are OOV-heavy: boilerplate in
    other scripts, binary spills, encoding damage).

    Two aggregates: corpus term counts (one shuffle on term), then the
    vocab itself via TakeOrderedAndProject (vocab_size rows to the
    driver plan as a broadcast — vocab is index metadata, corpus-size-
    independent). The per-doc pass joins the broadcast vocab, so at
    100 TB the doc table is scanned once with zero extra shuffles
    beyond the doc_id rollup. Tie-break (count desc, term) makes the
    vocab boundary deterministic.

    Output: (id, n_toks, n_oov, oov_q) with oov_q = the OOV fraction
    quantized to 1e-6 (floor(x*1e6+0.5) — portable across engines)."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    vocab = (
        counts.orderBy(F.col("c").desc(), F.col("term"))
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_vocab"))
    )
    joined = tok.join(F.broadcast(vocab), "term", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_oov"),
        F.floor(
            (
                F.sum(F.when(F.col("__in_vocab").isNull(), 1).otherwise(0))
                / F.count(F.lit(1))
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("oov_q"),
    )


def bigram_nll(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    add-α-smoothed BIGRAM language model — the order-2 upgrade of
    :func:`unigram_nll` (catches scrambled/templated text that unigram
    stats can't: the tokens are common, the TRANSITIONS are not).

    p(w2|w1) = (c(w1 w2) + α) / (c(w1·) + α·V), where c(w1·) counts
    bigrams STARTING with w1 (so Σ_w2 p = 1) and V = |distinct second
    tokens|. One bigram-count aggregate (shuffle on the gram), one
    derived first-token aggregate over the tiny gram table, then a
    broadcast join back to the exploded grams and a per-doc mean — two
    corpus scans (count pass + score pass; a deployment sharing the LM
    across runs persists the gram table once and pays only the score
    scan); at web scale the gram table outgrows the broadcast and AQE
    runs the same plan shuffled.

    Output: (id, n_bigrams, nll) with nll rounded to 6 decimals (ln
    ulp differences vanish under the rounding, as in unigram_nll)."""
    # spread: the single-file test table would otherwise evaluate every
    # gram explode on one core (q111 lesson); on a many-file table the
    # scan already fans out and this is one cheap narrow-bytes shuffle
    grams = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(word_ngrams(text_col, 2)).alias("g")
    )
    # the gram-count table is tiny (vocab² ceiling) and everything else
    # derives from it — cache so the model build doesn't re-explode the
    # corpus (c1, V, and the model join would otherwise each re-run the
    # scan+explode lineage)
    c2 = grams.groupBy("g").agg(F.count(F.lit(1)).alias("c2")).cache()
    c1 = (
        c2.withColumn("w1", F.substring_index("g", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    vocab = c2.agg(
        F.countDistinct(F.substring_index("g", " ", -1)).alias("v")
    )
    model = (
        c2.withColumn("w1", F.substring_index("g", " ", 1))
        .join(c1, "w1")  # AQE: broadcast while the unigram table fits
        .crossJoin(F.broadcast(vocab))
        .select(
            "g",
            (
                (F.col("c2") + F.lit(alpha))
                / (F.col("c1") + F.lit(alpha) * F.col("v"))
            ).alias("p"),
        )
    )
    return (
        grams.join(model, "g")  # AQE broadcasts while the LM fits, shuffles beyond
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(-F.log("p")), 6).alias("nll"),
        )
    )


# ---------------------------------------------------------------------------
# exact duplicate-substring spans (sub-passage granularity)
# ---------------------------------------------------------------------------


def duplicate_span_stats(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Exact duplicate-SUBSTRING detection at token granularity — the
    sliding-window formulation of suffix-array substring dedup
    ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022): any ``window``-token sequence that occurs more
    than once corpus-wide marks every token it covers as duplicated.
    Unlike passage dedup (fixed disjoint chunks, passage_dedup_stats)
    this catches copied spans at ANY offset.

    Plan shape — ONE corpus scan, TWO narrow shuffles (the first cut
    of this operator scanned the corpus three times; the join-free
    rewrite was verified by plan audit):

    1. stride-1 windows are hashed in place (md5 — portable across
       engines; the window TEXT never leaves the row) and exploded to
       (id, n_toks, pos, key) rows — `explode_outer` keeps a sentinel
       row for docs shorter than the window, so every doc survives to
       the final rollup without a second scan.
    2. corpus-wide occurrence counting is a COUNT window over the key
       (one shuffle of 32-hex + int rows, replacing a groupBy + join
       back that re-hashed everything); rows with count >= 2 are hits.
    3. hits merge into maximal islands per doc: one window over
       (id) ordered (is_hit, pos) — same-length intervals sorted by
       start merge exactly when successive starts differ < window —
       and the two rollups reuse the same id partitioning, so no
       further exchange is planned.

    Output: (id, n_toks, dup_islands, dup_tokens, dup_frac), one row
    per input document (docs with no duplicated window report zeros).
    """
    toks = tokens(F.col(text_col))
    base = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), toks.alias("__t")
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size("__t") - (window - 1)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice("__t", i, window))).alias("key"),
        ),
    )
    pos_tbl = base.select(
        F.col(id_col),
        F.size("__t").alias("n_toks"),
        F.explode_outer(F.when(F.size("__t") >= window, wins)).alias("w"),
    ).select(
        F.col(id_col), "n_toks", F.col("w.pos").alias("pos"), F.col("w.key").alias("key")
    )
    counted = pos_tbl.withColumn(
        "__hit",
        F.col("key").isNotNull()
        & (F.count("key").over(W.partitionBy("key")) >= 2),
    )
    w_doc = W.partitionBy(id_col).orderBy("__hit", "pos")
    marked = counted.withColumn(
        "__new",
        (
            F.col("__hit")
            & F.coalesce(
                ~F.lag("__hit").over(w_doc)
                | (F.col("pos") - F.lag("pos").over(w_doc) >= window),
                F.lit(True),
            )
        ).cast("int"),
    ).withColumn("__isl", F.sum("__new").over(w_doc))
    return (
        marked.groupBy(id_col, "n_toks", "__hit", "__isl")
        .agg((F.max("pos") - F.min("pos") + window).alias("__covered"))
        .groupBy(id_col, "n_toks")
        .agg(
            F.sum(F.when(F.col("__hit"), 1).otherwise(0))
            .cast("bigint")
            .alias("dup_islands"),
            F.sum(F.when(F.col("__hit"), F.col("__covered")).otherwise(0))
            .cast("bigint")
            .alias("dup_tokens"),
        )
        .select(
            F.col(id_col),
            F.col("n_toks").cast("bigint").alias("n_toks"),
            "dup_islands",
            "dup_tokens",
            F.round(
                F.col("dup_tokens") / F.greatest("n_toks", F.lit(1)), 6
            ).alias("dup_frac"),
        )
    )


# ---------------------------------------------------------------------------
# heavy hitters: bounded-state candidates + exact recount
# ---------------------------------------------------------------------------


def frequent_tokens_exact(
    df: DataFrame, id_col: str, text_col: str, min_frac: float = 0.02
) -> DataFrame:
    """Corpus-wide heavy-hitter tokens: every token whose frequency is
    >= ``min_frac`` of the total token count, with exact counts.

    Two phases, the classic sketch-then-verify shape for cardinalities
    where a straight token groupBy's map-side hash tables blow up:

    1. **Candidates** — per-partition Misra-Gries with m = 2/min_frac
       counters (bounded memory per task, Arrow-batched). MG guarantee:
       an item with partition count > n_p/m survives the partition's
       summary; any globally-frequent item (>= min_frac·n) has some
       partition where its count is >= min_frac·n_p > n_p/m, so the
       union of partition summaries is a SUPERSET of the true heavy
       hitters at every scale — and is at most P·m keys, broadcastable
       by construction.
    2. **Exact recount** — the corpus token stream semi-joins the
       broadcast candidate set (map-side filter, only candidate tokens
       shuffle) and exact counts apply the threshold.

    The output is therefore EXACT and partitioning-independent (phase 1
    varies with partitioning, but only as different supersets).
    Output: (term, cnt).
    """
    m = max(8, int(2.0 / min_frac))
    toks = spread(df.select(id_col, text_col), id_col).select(
        F.explode(tokens(F.col(text_col))).alias("term")
    )

    def mg_partition(batches):
        # WEIGHTED Misra-Gries: each Arrow batch collapses to
        # value_counts (vectorized — the per-token work stays in C),
        # then the counter update loops over DISTINCT terms only.
        # Weighted decrements discard d mass from m+1 entries at once,
        # so total discarded <= n_p and the per-item undercount bound
        # (and the superset guarantee) is unchanged.
        counters: dict[str, int] = {}
        n_seen = 0
        for pdf in batches:
            n_seen += len(pdf)
            for t, c in pdf["term"].value_counts().items():
                c = int(c)
                while c > 0:
                    if t in counters:
                        counters[t] += c
                        c = 0
                    elif len(counters) < m:
                        counters[t] = c
                        c = 0
                    else:
                        d = min(min(counters.values()), c)
                        c -= d
                        for k in list(counters):
                            counters[k] -= d
                            if counters[k] == 0:
                                del counters[k]
        # candidates + a NULL-term sentinel carrying this partition's
        # token count: the global total falls out of the same pass
        # instead of a third corpus scan (plan audit)
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "n": [0] * len(counters) + [n_seen],
            }
        )

    summaries = toks.mapInPandas(mg_partition, "term string, n long").cache()
    candidates = summaries.filter(F.col("term").isNotNull()).select("term").distinct()
    total = summaries.filter(F.col("term").isNull()).agg(
        F.sum("n").cast("bigint").alias("__n")
    )
    return (
        toks.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.ceil(F.lit(min_frac) * F.col("__n")))
        .select("term", "cnt")
    )


# ---------------------------------------------------------------------------
# Naive Bayes text classifier (train/score as two DataFrame passes)
# ---------------------------------------------------------------------------


def nb_classify(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Multinomial Naive Bayes trained on ``train`` and applied to
    ``score`` — the fastText-shaped supervised filter (language ID,
    quality routing, domain tagging) as pure DataFrame algebra:

    - model = per-(term, label) counts -> p(t|c) = (c_tc + a)/(c_c + aV),
      priors from document counts. The model table is V·K rows — it
      broadcasts to the scoring join while the vocab fits, and degrades
      to a shuffle join on `term` beyond that (AQE picks; a min-count
      vocab floor keeps V bounded in production).
    - scoring = token stream x K classes, left-joined against the
      model (unseen terms fall back to the same smoothed formula with
      c_tc = 0), one per-(doc, class) sum, one per-doc argmax window.

    Scores are round(.,6) log-likelihoods, so float summation-order
    ulps vanish before the argmax compares them (q105/q119 pattern);
    argmax ties break on label order. Output: (id, pred, score) — the
    winning label and its rounded log-likelihood per scored doc.
    """
    toks_tr = spread(train.select(label_col, text_col), label_col).select(
        F.col(label_col).alias("label"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    # cache the two small aggregates every downstream table derives
    # from: without it class_tot/vocab/priors each re-run the train
    # corpus scan+tokenize (plan audit showed 7 scans; now the corpus
    # is read once per side)
    model = toks_tr.groupBy("term", "label").agg(
        F.count(F.lit(1)).alias("c_tc")
    ).cache()
    class_tot = model.groupBy("label").agg(F.sum("c_tc").alias("c_c"))
    vocab = model.agg(F.countDistinct("term").alias("v"))
    doc_counts = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).cache()
    n_total = train.agg(F.count(F.lit(1)).alias("n_all"))
    k_classes = doc_counts.agg(F.count(F.lit(1)).alias("k"))
    classes = (
        doc_counts.crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(k_classes))
        .join(class_tot, "label")
        .crossJoin(F.broadcast(vocab))
        .select(
            "label",
            F.log(
                (F.col("n_docs") + F.lit(alpha))
                / (F.col("n_all") + F.lit(alpha) * F.col("k"))
            ).alias("prior"),
            (F.col("c_c") + F.lit(alpha) * F.col("v")).alias("denom"),
        )
    )
    toks_sc = spread(score.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    scored = (
        toks_sc.crossJoin(F.broadcast(classes))
        .join(F.broadcast(model), ["term", "label"], "left")
        .select(
            F.col(id_col),
            "label",
            "prior",
            F.log(
                (F.coalesce("c_tc", F.lit(0)) + F.lit(alpha)) / F.col("denom")
            ).alias("lp"),
        )
        .groupBy(id_col, "label")
        .agg(F.round(F.first("prior") + F.sum("lp"), 6).alias("score"))
    )
    w = W.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("label"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("label").alias("pred"), "score")
    )


# ---------------------------------------------------------------------------
# BPE-style merge-pair vocabulary induction
# ---------------------------------------------------------------------------


def bpe_merge_table(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 3, joiner: str = "~"
) -> DataFrame:
    """Learn the first ``n_merges`` BPE-style merge rules over the
    corpus: each round counts adjacent symbol pairs corpus-wide, picks
    the most frequent (ties: lexicographic), and fuses every
    non-overlapping occurrence — the distributed heart of tokenizer
    training (symbols here start at words, so this doubles as
    word2phrase-style phrase induction).

    The fuse step is a padded-string 3-pass `replace(' a b ',' a~b ')`
    applied identically in any engine: one greedy left-to-right pass
    can miss a pair whose flanking spaces were consumed by adjacent
    matches, but missed pairs are never adjacent to each other, so a
    second pass completes the merge set (third pass = safety margin).
    The pair argmax is a 1-row DataFrame cross-joined back (broadcast)
    — no driver round-trip, and each round is one map-side bigram
    explode + one narrow count shuffle over the (tiny, vocab-bounded)
    pair space. State between rounds is a corpus-sized string column:
    at 100 TB checkpoint it every few rounds instead of growing one
    lineage per merge.

    Output: (merge_idx, w1, w2, cnt) — the learned merge table.
    """
    cur = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.concat(F.lit(" "), F.concat_ws(" ", tokens(F.col(text_col))), F.lit(" ")).alias("__t"),
    )
    results, cur = _bpe_rounds(cur, id_col, n_merges, joiner)
    out = results[0]
    for r in results[1:]:
        out = out.unionAll(r)
    return out


def _bpe_rounds(
    cur: DataFrame, id_col: str, n_merges: int, joiner: str,
    barrier: bool = False,
):
    """The shared merge-round loop: returns ([per-round 1-row merge
    DataFrames], final re-segmented corpus).

    ``barrier=True`` checkpoints each INTERMEDIATE round's corpus —
    for callers that consume the final corpus (bpe_apply), where the
    deep lazy lineage otherwise re-runs every earlier round's
    scan + tokenize + replace layers per consumer."""
    results = []
    for k in range(1, n_merges + 1):
        toks = F.filter(F.split("__t", " "), lambda t: t != "")
        pairs = cur.select(
            F.explode(
                F.when(
                    F.size(toks) >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size(toks) - 1),
                        lambda i: F.struct(
                            F.element_at(toks, i.cast("int")).alias("w1"),
                            F.element_at(toks, (i + 1).cast("int")).alias("w2"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>")),
            ).alias("p")
        ).select("p.w1", "p.w2")
        best = (
            pairs.groupBy("w1", "w2")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .withColumn("merge_idx", F.lit(k))
        )
        results.append(best.select("merge_idx", "w1", "w2", "cnt"))
        pat = F.concat(F.lit(" "), F.col("w1"), F.lit(" "), F.col("w2"), F.lit(" "))
        rep = F.concat(
            F.lit(" "), F.col("w1"), F.lit(joiner), F.col("w2"), F.lit(" ")
        )
        merged = F.col("__t")
        for _ in range(3):
            merged = F.replace(merged, pat, rep)
        cur = cur.crossJoin(F.broadcast(best.select("w1", "w2"))).select(
            F.col(id_col), merged.alias("__t")
        )
        # Barrier per INTERMEDIATE round (r12, guide §5/§3.3), only for
        # callers that consume the FINAL corpus (bpe_apply): its deep
        # lazy lineage nests every round's scan + tokenize + replace
        # layers inside broadcast-input subtrees that re-run per
        # consumer — measured bimodal 2.9-7.6 s at sf0.1 (the q437
        # broadcast-race signature) vs a stable 2.6-2.8 s with the
        # barrier (interleaved A/B, min +10%). EAGER: a lazy barrier
        # under concurrent consumers double-materializes. The FINAL
        # round's corpus stays lazy (bpe_apply consumes it exactly
        # once). bpe_merge_table keeps barrier=False: it never reads
        # the final corpus, and barriers there force each round's
        # argmax to compute twice (measured LOSS, like r11's rejected
        # 1-row `best` checkpoints).
        if barrier and k < n_merges:
            cur = cur.localCheckpoint(eager=True)
    return results, cur


def bpe_apply(
    df: DataFrame, id_col: str, text_col: str, n_merges: int = 3, joiner: str = "~"
) -> DataFrame:
    """Tokenizer APPLICATION closing the q129 loop: learn the first
    ``n_merges`` merge rules (same rounds as bpe_merge_table — the two
    functions share _bpe_rounds, so rules can't drift) and report each
    document's segmentation under them: symbols before/after and the
    compression ratio — the metric a tokenizer-training pipeline tracks
    per round. The apply step is the same broadcast-rule padded-string
    fuse; per-doc counting is map-side.

    Output: (id, n_syms_before, n_syms_after, compression).
    """
    cur = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col),
        F.concat(
            F.lit(" "), F.concat_ws(" ", tokens(F.col(text_col))), F.lit(" ")
        ).alias("__t"),
    )
    _, final = _bpe_rounds(cur, id_col, n_merges, joiner, barrier=True)
    n_of = lambda c: F.size(F.filter(F.split(c, " "), lambda t: t != ""))
    before = cur.select(F.col(id_col), n_of("__t").cast("bigint").alias("n_syms_before"))
    after = final.select(F.col(id_col), n_of("__t").cast("bigint").alias("n_syms_after"))
    return before.join(after, id_col).select(
        F.col(id_col),
        "n_syms_before",
        "n_syms_after",
        F.round(
            F.col("n_syms_after") / F.greatest("n_syms_before", F.lit(1)), 6
        ).alias("compression"),
    )


def strip_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 8,
    keep_first: bool = False,
) -> DataFrame:
    """The ACTUATOR counterpart of duplicate_span_stats: rewrite every
    document with its duplicated ``window``-token spans removed (the
    removal step of suffix-array substring dedup). Two policies:

    - ``keep_first=False`` (default): drop EVERY occurrence of a
      duplicated window — the aggressive variant.
    - ``keep_first=True``: the faithful Lee et al. policy — each
      distinct duplicated window keeps its corpus-wide first occurrence
      (lowest (id, pos)); only later occurrences are stripped. Same
      plan plus one row_number over the key partition (the COUNT
      window's shuffle is reused — no extra exchange).

    Plan: the (id, pos, key) window table is built once (1 corpus
    scan), duplicated windows are found with the COUNT-over-key window
    (1 narrow shuffle), covered token positions explode per hit and
    dedup per doc (1 shuffle on id), and the rewrite joins the covered
    set back to the documents (2nd scan — the actuator must touch the
    text; Lee et al.'s pipeline is two-pass for the same reason). The
    rewrite itself is a map-side array filter by token index.

    Output: (id, n_toks, n_removed, clean_text).
    """
    toks = tokens(F.col(text_col))
    base = spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), toks.alias("__t")
    )
    wins = F.transform(
        F.sequence(F.lit(1), F.size("__t") - (window - 1)),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.md5(F.concat_ws(" ", F.slice("__t", i, window))).alias("key"),
        ),
    )
    pos_tbl = base.select(
        F.col(id_col),
        F.explode(F.when(F.size("__t") >= window, wins)).alias("w"),
    ).select(F.col(id_col), F.col("w.pos").alias("pos"), F.col("w.key").alias("key"))
    w_key = W.partitionBy("key")
    hits = pos_tbl.withColumn(
        "__c", F.count(F.lit(1)).over(w_key)
    ).filter(F.col("__c") >= 2)
    if keep_first:
        hits = hits.withColumn(
            "__rn",
            F.row_number().over(w_key.orderBy(F.col(id_col), F.col("pos"))),
        ).filter(F.col("__rn") > 1)
    cov = (
        hits.select(
            F.col(id_col),
            F.explode(F.sequence("pos", F.col("pos") + (window - 1))).alias("cp"),
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("cp")).alias("__cov"))
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size(toks)),
            lambda i: F.struct(i.cast("int").alias("i"), F.element_at(toks, i.cast("int")).alias("t")),
        ),
        lambda s: ~F.array_contains(F.col("__cov"), s["i"]),
    )
    return (
        df.join(cov, id_col, "left")
        .withColumn("__cov", F.coalesce("__cov", F.array().cast("array<int>")))
        .select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("n_toks"),
            F.size("__cov").cast("bigint").alias("n_removed"),
            F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias("clean_text"),
        )
    )


def bm25_retrieve(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Batch BM25 retrieval: for every QUERY DOCUMENT, the top-k most
    relevant corpus documents — the bulk retrieval shape behind RAG
    example mining and query-document training pairs, as one shared
    plan rather than per-query scans.

    Scale shape: the corpus is tokenized ONCE; the union of all query
    terms broadcasts and filters the term-frequency aggregation, so
    per-query work shares a single (id, term, tf) table — adding a
    query adds broadcast rows, not corpus passes. The (query, doc)
    score space is bounded by docs-sharing-a-term per query, ranked
    with the two-phase top-k. Per-term scores quantize to 1e-7 before
    the cross-term sum (q96's determinism rule); self-matches are
    excluded.

    Output: (query_id, doc_id, bm25, rank), rank 1..k.
    """
    from tytodb_spark.operators.similarity import topk_per_key

    toks = spread(corpus.select(id_col, text_col), id_col).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("__w")
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("__corpus_n"),
        (F.sum("__dl").cast("bigint").cast("double") / F.count(F.lit(1))).alias(
            "__avgdl"
        ),
    )
    qterms = (
        queries.select(
            F.col(id_col).alias("query_id"),
            F.explode(F.array_distinct(tokens(text_col))).alias("__w"),
        )
    ).cache()  # tiny: |queries| x terms; feeds the filter AND the score join
    tf = (
        toks.join(F.broadcast(qterms.select("__w").distinct()), "__w")
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    dfreq = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.log(
        (F.col("__corpus_n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
    )
    score = (
        idf
        * (F.col("__tf") * (k1 + 1))
        / (F.col("__tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl")))
    )
    per = (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "__w")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(qterms), "__w")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("__q", F.floor(score * 1e7).cast("bigint"))
    )
    scored = per.groupBy("query_id", id_col).agg(
        (F.sum("__q") / F.lit(1e7)).alias("bm25")
    )
    return topk_per_key(
        scored, "query_id", [F.col("bm25").desc(), F.col(id_col)], k
    ).select("query_id", F.col(id_col).alias("doc_id"), "bm25", "rank")


def pmi_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab_k: int = 30,
    min_pair: int = 2,
) -> DataFrame:
    """Pointwise mutual information of term CO-OCCURRENCE (doc-level
    presence) over a capped vocabulary — the collocation/topic-structure
    profile of a corpus (which terms travel together; boilerplate and
    template families light up as near-certain pairs).

    Scale shape: the vocabulary is the top-`vocab_k` terms by document
    frequency (one aggregate + TakeOrderedAndProject — index metadata,
    corpus-size-independent) and BROADCASTS into the presence filter, so
    the corpus tokenizes once and the pair self-join runs on presence
    rows capped at `vocab_k` per doc: ≤ k·(k−1)/2 pairs per doc, never
    |doc|². Doc frequencies of the vocab terms broadcast into the final
    score, which is computed once per surviving pair from exact integer
    counts (log quantized to 1e-6).

    Output: (term_a, term_b, n_ab, pmi_q) with term_a < term_b.
    """
    from tytodb_spark.operators.similarity import topk_per_key  # noqa: PLC0415

    pres = (
        spread(df.select(id_col, text_col), id_col)
        .select(F.col(id_col).alias("__d"),
                F.explode(F.array_distinct(tokens(text_col))).alias("term"))
    )
    dfreq = pres.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    vocab = (
        topk_per_key(
            dfreq.withColumn("__g", F.lit(1)),
            "__g",
            [F.col("__df").desc(), F.col("term")],
            vocab_k,
        ).select("term", "__df")
    )
    n_docs = df.select(id_col).agg(F.count(F.lit(1)).alias("__n"))
    vpres = pres.join(F.broadcast(vocab.select("term")), "term")
    a = vpres.select("__d", F.col("term").alias("term_a"))
    b = vpres.select("__d", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "__d")
        .filter(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    va = vocab.select(F.col("term").alias("term_a"), F.col("__df").alias("__dfa"))
    vb = vocab.select(F.col("term").alias("term_b"), F.col("__df").alias("__dfb"))
    pmi = F.log(
        F.col("n_ab").cast("double") * F.col("__n")
        / (F.col("__dfa").cast("double") * F.col("__dfb"))
    )
    return (
        pairs.join(F.broadcast(va), "term_a")
        .join(F.broadcast(vb), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a", "term_b", "n_ab",
            F.floor(pmi * 1e6 + F.lit(0.5)).cast("bigint").alias("pmi_q"),
        )
    )


def token_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (bits) — the
    repetitiveness gate that catches what length/stopword ratios miss:
    keyword-stuffed spam and template loops have low entropy for their
    length, clean prose sits near log2 of its vocabulary size.

    One tokenize pass → per-(doc, term) counts → one per-doc aggregate;
    both shuffles key on doc (and doc+term), so a 100 TB corpus
    distributes evenly unless a single document is itself huge. Using
    H = log2(N) − (1/N)·Σ c·log2(c), each term's c·log2(c) quantizes to
    an exact 1e-6 integer BEFORE the sum (the q96/q105 convention), so
    the per-doc accumulation is integer (order-independent across
    partitions and engines) and the remaining float ops run once per
    doc.

    Output: (id_col, n_tokens, n_distinct, entropy_q) with entropy_q =
    floor(H·1e6 + 0.5) in bits.
    """
    c = F.col("__c").cast("double")
    tf = (
        spread(df.select(id_col, text_col), id_col)
        .select(F.col(id_col), F.explode(tokens(text_col)).alias("__t"))
        .groupBy(id_col, "__t")
        .agg(F.count(F.lit(1)).alias("__c"))
        .withColumn(
            "__clgc_q", F.floor(c * F.log2(c) * 1e6 + F.lit(0.5)).cast("bigint")
        )
    )
    agg = tf.groupBy(id_col).agg(
        F.sum("__c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum("__clgc_q").cast("bigint").alias("__sq"),
    )
    n = F.col("n_tokens").cast("double")
    h_times_1e6 = F.log2(n) * F.lit(1e6) - F.col("__sq") / n
    return agg.select(
        id_col, "n_tokens", "n_distinct",
        F.floor(h_times_1e6 + F.lit(0.5)).cast("bigint").alias("entropy_q"),
    )


def chunk_with_overlap(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 80,
    stride: int = 60,
) -> DataFrame:
    """RAG-style fixed-size character chunking with overlap: chunk i
    covers [i·stride, i·stride + size); the last chunk starts at the
    final stride position that still begins inside the text, so every
    character lands in ≥1 chunk and consecutive chunks share
    (size − stride) characters of context.

    Pure per-row expression work (sequence + transform + posexplode) —
    no shuffle at all; a 100 TB corpus chunks map-side and the output
    inherits the input partitioning. Chunk count for a length-L doc is
    floor(max(L−1, 0)/stride) + 1 (empty docs emit one empty chunk, so
    no document silently disappears from the chunk store).

    Output: (id_col, chunk_id, chunk_text, n_chunks).
    """
    if stride <= 0 or size < stride:
        raise ValueError("need 0 < stride <= size")
    L = F.length(F.col(text_col))
    n_chunks = (F.floor(F.greatest(L - 1, F.lit(0)) / stride) + 1).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.substring(
            F.col(text_col), (i * stride + 1).cast("int"), size
        ),
    )
    return df.select(
        F.col(id_col),
        n_chunks.alias("n_chunks"),
        F.posexplode(chunks).alias("chunk_id", "chunk_text"),
    ).select(id_col, "chunk_id", "chunk_text", "n_chunks")


def trigram_index_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pattern: str,
    n: int = 3,
) -> DataFrame:
    """Substring search through an n-gram POSTING-LIST index — the
    scale-out answer to `WHERE text LIKE '%pattern%'`, which no
    min/max statistic can prune: documents whose distinct character
    n-gram set covers ALL of the pattern's n-grams are the only ones
    that can contain it, so only those are exactly verified.

    Plan: one map-side shingle pass filtered to the pattern's n-grams
    BEFORE the shuffle (the exchange carries only pattern-gram hits,
    not the corpus posting list), one count aggregate per candidate
    doc, then a semi-join back for exact containment on the candidates
    alone. On a persisted posting table the first stage becomes an
    index scan of |pattern-grams| keys; here the index builds in-plan.
    The candidate count rides along as audit evidence of the pruning.

    Output: (id_col, n_index_candidates) for matching docs.
    """
    pat = pattern.lower()
    pat_grams = sorted({pat[i : i + n] for i in range(len(pat) - n + 1)})
    if not pat_grams:
        raise ValueError(f"pattern shorter than n={n}")
    hits = (
        spread(df.select(id_col, text_col), id_col)
        .select(
            F.col(id_col),
            F.explode(F.array_distinct(char_ngrams(text_col, n))).alias("__g"),
        )
        .filter(F.col("__g").isin(pat_grams))
    )
    cand = (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))  # grams are distinct per doc
        .filter(F.col("__hits") == len(pat_grams))
        .select(id_col)
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_index_candidates"))
    verified = (
        df.join(cand, id_col, "left_semi")
        .filter(F.lower(F.trim(F.col(text_col))).contains(pat))
        .select(id_col)
    )
    return verified.crossJoin(F.broadcast(n_cand))


def sparse_cosine_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_df: int = 2,
    max_df: int = 10,
    min_shared: int = 2,
    threshold_ppm: int = 300_000,
) -> DataFrame:
    """Rare-feature-blocked exact TF-IDF cosine pair mining — the
    sparse-vector cousin of MinHash-LSH: find document pairs whose
    TF-IDF cosine over word ``shingle_n``-gram features ≥ threshold
    WITHOUT the all-pairs scan.

    Features are word n-gram shingles, not unigrams: shingles carry
    the heavy-tailed document-frequency spectrum blocking needs even
    when the unigram vocabulary is tiny (templated/synthetic corpora),
    and weighted shingle cosine is a sharper near-dup signal than set
    Jaccard (tf and idf both count).

    Blocking (the scale lever — AllPairs/PPJoin prefix-filter spirit):
    candidate pairs must share at least one RARE feature
    (min_df ≤ df ≤ max_df). Rare features have bounded posting lists,
    so candidate generation is Σ df² over rare features — never
    O(N²) — and high-cosine pairs virtually always share one (a pair
    sharing ONLY ubiquitous shingles is what the threshold rejects).
    The exact dot product then runs only over candidates.

    Determinism discipline: weights are INTEGER milli-idf × tf
    (w = tf · floor(ln(N/df)·1e3)), so dots and norms are exact int64
    sums (order-free at any parallelism); the only float expression is
    the final dot/(√na·√nb) in a fixed op order, quantized to ppm.

    Output: (id_a, id_b, dot, cos_q) for pairs with cos_q ≥ threshold.
    """
    toks = spread(
        docs.select(F.col(id_col).alias("__id"), text_col), "__id"
    ).select(
        "__id", F.explode(word_ngrams(text_col, shingle_n)).alias("__t")
    )
    tf = toks.groupBy("__id", "__t").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfq = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    w = (
        tf.join(dfq, "__t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "__id",
            "__t",
            "df",
            (
                F.col("tf")
                * F.floor(
                    F.log(F.col("__n").cast("double") / F.col("df").cast("double"))
                    * F.lit(1e3)
                ).cast("bigint")
            ).alias("w"),
        )
    )
    # The weighted postings frame feeds FOUR consumers (norms, both
    # sides of candidate generation, both sides of the exact dot) —
    # without materialization Spark recomputes the tokenize → tf → df
    # chain (two shuffles + the explode) once per consumer. One
    # executor-local materialization cuts ~35% of wall time at sf0.1
    # and scales: blocks stay on executors (never the driver), sized
    # O(total postings) — the same frame every consumer already
    # shuffles in full.
    w = w.localCheckpoint(eager=False)
    norms = w.groupBy("__id").agg(
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("n2")
    )
    rare = w.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    # candidate policy: pairs must share >= min_shared rare features —
    # the 2-collision analogue of requiring two LSH band hits. True
    # high-cosine pairs share MANY rare shingles, so this prunes the
    # single-coincidence tail of the candidate set (the bulk of it)
    # without touching recall at practical thresholds; the count
    # aggregate replaces a distinct at the same shuffle cost.
    cand = (
        rare.alias("a")
        .join(rare.alias("b"), "__t")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .groupBy(
            F.col("a.__id").alias("__ia"), F.col("b.__id").alias("__ib")
        )
        .agg(F.count(F.lit(1)).alias("__shared"))
        .filter(F.col("__shared") >= F.lit(min_shared))
        .select("__ia", "__ib")
    )
    dots = (
        cand.join(w.select(F.col("__id").alias("__ia"), "__t",
                           F.col("w").alias("wa")), "__ia")
        .join(
            w.select(F.col("__id").alias("__ib"), "__t", F.col("w").alias("wb")),
            ["__ib", "__t"],
        )
        .groupBy("__ia", "__ib")
        .agg(F.sum(F.col("wa") * F.col("wb")).cast("bigint").alias("dot"))
    )
    scored = (
        dots.join(norms.select(F.col("__id").alias("__ia"),
                               F.col("n2").alias("na2")), "__ia")
        .join(norms.select(F.col("__id").alias("__ib"),
                           F.col("n2").alias("nb2")), "__ib")
        .select(
            F.col("__ia").alias("id_a"),
            F.col("__ib").alias("id_b"),
            "dot",
            F.floor(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
                * F.lit(1e6)
            )
            .cast("bigint")
            .alias("cos_q"),
        )
    )
    return scored.filter(F.col("cos_q") >= F.lit(threshold_ppm))
