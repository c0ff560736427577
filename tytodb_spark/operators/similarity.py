"""Similarity search over embedding columns (BASELINE.json mandate; the
reference has no vector surface — its closest artifact is the BYTES
payload types, src/alba_types.rs:290-294).

Three paths:

- Brute-force cosine top-k — the exact baseline. Scored entirely with
  JVM expressions (`zip_with` + `aggregate` fold, no Python), then a
  TWO-PHASE top-k: local top-k inside each shuffle partition, then
  global top-k over the survivors. At 100 TB the naive
  window-over-all-scores shuffles |queries|×|corpus| rows; the two-phase
  form shuffles |queries|×k×partitions — the standard distributed
  top-k construction.

- SRP-LSH (signed random projection) ANN — a scale path. Each vector
  gets `n_tables` b-bit signatures (sign of dot(v, random hyperplane));
  candidates are corpus vectors sharing any table's full signature with
  the query; candidates are scored exactly and top-k'd. Hyperplanes are
  generated from a fixed seed so plans are deterministic.

- IVF (inverted-file) ANN — the other scale path. A sampled spherical
  k-means coarse quantizer partitions the corpus into cells; queries
  probe their n_probe nearest cells, bounding the scanned fraction at
  ~n_probe/n_centroids of the corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from tytodb_spark.operators.dedup import dot
from tytodb_spark.operators.textual import spread


def topk_per_key(df: DataFrame, key: str, order: list[Column], k: int) -> DataFrame:
    """Two-phase distributed top-k: per-(key, input-partition) top-k first
    (no shuffle — window partitioned by key AND spark_partition_id), then
    the global top-k over at most k×partitions survivors per key."""
    local_w = W.partitionBy(key, F.spark_partition_id()).orderBy(*order)
    pruned = (
        df.withColumn("__local_rank", F.row_number().over(local_w))
        .filter(F.col("__local_rank") <= k)
        .drop("__local_rank")
    )
    global_w = W.partitionBy(key).orderBy(*order)
    return (
        pruned.withColumn("rank", F.row_number().over(global_w))
        .filter(F.col("rank") <= k)
    )


def brute_force_knn(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    The query side is broadcast (queries ≪ corpus is the normal shape);
    the corpus side streams through untouched — one scan, no corpus
    shuffle until the (much smaller) scored-survivor top-k.

    Output: (query_id, neighbor_id, cos_sim, rank), rank 1..k,
    deterministic tie-break on neighbor_id.
    """
    # norms hoisted to the per-ROW side of the join: 2N folds once
    # instead of 2·|pairs| (the cross dot is the only per-pair fold)
    q = queries_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", F.sqrt(dot(F.col("__qv"), F.col("__qv"))))
    c = spread(
        corpus_df.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        ),
        "neighbor_id",
    ).withColumn("__cn", F.sqrt(dot(F.col("__cv"), F.col("__cv"))))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    order = [F.col("cos_sim").desc(), F.col("neighbor_id")]
    return topk_per_key(scored, "query_id", order, k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 7) -> list[list[list[float]]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over a
    64-bit LCG) — [tables][bits][dim]. No numpy dependency in the plan;
    the literals are baked into the expression tree."""
    state = seed & 0x7FFFFFFFFFFFFFFF

    def rnd() -> float:  # uniform (0,1)
        nonlocal state
        state = (6364136223846793005 * state + 1442695040888963407) % (1 << 63)
        return (state + 1) / float((1 << 63) + 1)

    def gauss() -> float:
        return math.sqrt(-2.0 * math.log(rnd())) * math.cos(2.0 * math.pi * rnd())

    return [
        [[gauss() for _ in range(dim)] for _ in range(bits)] for _ in range(tables)
    ]


def srp_signatures(
    vec: Column, dim: int, bits: int = 16, tables: int = 4, seed: int = 7
) -> Column:
    """Array of `tables` bucket ids; bucket = b sign-bits of random
    projections packed into a long.

    Vectorized Pandas UDF: the whole signature block is ONE BLAS matmul
    per Arrow batch — (batch × dim) @ (dim × tables·bits) — then a sign
    + bit-pack. The previous pure-expression form (tables×bits separate
    `zip_with`+`aggregate` folds, dim literals each) evaluated Catalyst
    higher-order functions per element: ~3 s for 2,000 rows at
    dim=64/32 planes. The matmul does the same rows in milliseconds and
    scales linearly with batch count — sign-bit determinism is
    preserved because the hyperplanes come from the same seeded
    generator either way."""
    planes = _hyperplanes(dim, bits, tables, seed)
    proj = np.asarray(planes, dtype=np.float64).reshape(tables * bits, dim)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _sig(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        m = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits_on = (m @ proj.T) >= 0.0  # (n, tables·bits)
        buckets = (bits_on.reshape(len(m), tables, bits) * weights).sum(axis=2)
        return pd.Series(list(buckets))

    return _sig(vec)


def kmeans_lloyd(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    quantize: int | None = 6,
) -> DataFrame:
    """Fully-distributed Lloyd's k-means (the iterative-algorithm shape;
    contrast :func:`train_ivf_centroids`, which trains on a driver-side
    sample). Per iteration:

    - **assignment** is map-side only: the k centroids are inlined as
      array literals (k×dim doubles — metadata, the same thing a
      broadcast would ship) and each row takes argmin of k codegen'd
      squared-distance folds. No shuffle, no UDF.
    - **update** is a single k-group aggregation with one sum per
      dimension: partial aggregation reduces map-side, so the shuffle
      carries k×(dim+1) partials PER PARTITION — not the N×dim exploded
      rows of the posexplode formulation this replaces (which shuffled
      the entire vector table every iteration). Only k×dim floats
      return to the driver.

    Deterministic: init = first k vectors by id; argmin ties resolve to
    the lowest cluster index. ``quantize`` rounds each updated centroid
    component to that many decimals — float summation order then can't
    leak into assignments, making the fixed-iteration run bit-stable
    across partitionings AND across engines (the DuckDB oracle for q81
    replays the same quantized iterations). Returns (id_col, cluster).
    """

    def dist_to(c: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.zip_with(F.col(vec_col).cast("array<double>"), lit, lambda a, b: a - b)
        return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)

    centroids = [
        [float(x) for x in r[0]]
        for r in df.orderBy(id_col).select(vec_col).limit(k).collect()
    ]
    dim = len(centroids[0])

    def assign(cents: list[list[float]]) -> Column:
        dists = F.array(*[dist_to(c) for c in cents])
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    v = F.col(vec_col).cast("array<double>")
    sums = [
        F.sum(F.element_at(v, i + 1)).alias(f"s{i}") for i in range(dim)
    ]
    for _ in range(iters):
        rows = (
            df.withColumn("__cluster", assign(centroids))
            .groupBy("__cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        new = {j: list(centroids[j]) for j in range(k)}  # empty keeps old
        for r in rows:
            mean = [r[f"s{i}"] / r["n"] for i in range(dim)]
            if quantize is not None:
                # floor(x*10^q + 0.5)/10^q — one explicit rule shared with
                # the DuckDB oracle (queries.py _KMEANS_ORACLE). Python
                # round() is half-to-even while SQL round() is half away
                # from zero; a mean on a .xxxxxx5 boundary would diverge
                # the engines and flake the hash match.
                scale = 10.0**quantize
                mean = [math.floor(x * scale + 0.5) / scale for x in mean]
            new[r["__cluster"]] = mean
        centroids = [new[j] for j in range(k)]
    return df.select(id_col, assign(centroids).alias("cluster"))


def train_ivf_centroids(
    corpus_df: DataFrame,
    vec_col: str,
    n_centroids: int = 32,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Spherical k-means centroids from a corpus sample — the IVF coarse
    quantizer. Training runs driver-side on a bounded sample (centroids
    are index METADATA; |sample| and |centroids| are independent of
    corpus size, which is what makes this the scale path), assignment of
    the full corpus stays distributed in :func:`ivf_ann`.

    Deterministic: seeded TABLESAMPLE-style `sample` + seeded init; all
    vectors L2-normalized so argmax-dot == cosine assignment."""
    total = corpus_df.count()
    frac = min(1.0, (sample_size * 1.2) / max(total, 1))
    sample = (
        corpus_df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size)
    ).toPandas()
    x = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for j in range(len(cent)):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_ann(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate nearest neighbors via an IVF (inverted-file) index —
    the second ANN scale path next to SRP-LSH (:func:`srp_ann`).

    1. Train a coarse quantizer (driver-side spherical k-means on a
       bounded sample — index metadata, not data-scale work).
    2. Assign every corpus vector to its nearest centroid cell: map-only
       vectorized pandas UDF (one BLAS matmul per Arrow batch, centroids
       ride along in the closure ≙ broadcast). At 100 TB this is the
       only full-corpus pass, and it pipelines with the scan.
    3. Each query probes its `n_probe` nearest cells; the candidate join
       meets only probed cells — the scanned fraction is ~n_probe/
       n_centroids of the corpus, the IVF pruning guarantee.
    4. Exact cosine re-score + two-phase top-k, same as every ANN path.

    Output: (query_id, neighbor_id, cos_sim, rank) — approximate (cell
    recall depends on n_probe/n_centroids), hence rows-only checked.
    """
    cent = train_ivf_centroids(
        corpus_df, vec_col, n_centroids=n_centroids, seed=seed
    )
    n_probe = min(n_probe, len(cent))

    @F.pandas_udf("int")
    def _cell(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype="int32")
        m = np.vstack(v.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype(np.int32))

    @F.pandas_udf("array<int>")
    def _probe_cells(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        m = np.vstack(v.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cent.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    c = (
        spread(
            corpus_df.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
            ),
            "neighbor_id",
        )
        .withColumn("__cn", F.sqrt(dot(F.col("__cv"), F.col("__cv"))))
        .withColumn("__cell", _cell("__cv"))
    )
    q = queries_df.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias("__qn"),
        F.explode(_probe_cells(F.col(vec_col))).alias("__cell"),
    )
    scored = (
        c.join(F.broadcast(q), "__cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ),
        )
    )
    order = [F.col("cos_sim").desc(), F.col("neighbor_id")]
    return topk_per_key(scored, "query_id", order, k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


def srp_ann(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    bits: int = 12,
    tables: int = 6,
    seed: int = 7,
) -> DataFrame:
    """Approximate nearest neighbors via SRP-LSH bucket join.

    Shuffle profile: corpus is exploded ×tables (signature rows), the
    bucket join meets only same-bucket (table, bucket) pairs — never the
    full cross product — and exact scoring runs on candidates only.
    Recall is tunable with (bits, tables): fewer bits → bigger buckets →
    higher recall and cost.

    Output: (query_id, neighbor_id, cos_sim, rank) — rank within the
    retrieved candidate set.
    """
    def sig(df: DataFrame, idn: str) -> DataFrame:
        # signatures materialized below the posexplode Generate boundary:
        # computed once per vector, not once per (vector, table) row
        with_sig = df.select(
            F.col(id_col).alias(idn),
            F.col(vec_col).alias(f"__{idn}_v"),
            # norm once per VECTOR (below the posexplode Generate
            # boundary), reused by every candidate pair downstream
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))).alias(f"__{idn}_n"),
            srp_signatures(F.col(vec_col), dim, bits, tables, seed).alias("__sigs"),
        )
        return with_sig.select(
            idn,
            f"__{idn}_v",
            f"__{idn}_n",
            F.posexplode("__sigs").alias("table", "bucket"),
        )

    q = sig(queries_df, "query_id")
    c = sig(spread(corpus_df, id_col), "neighbor_id")
    candidates = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "__query_id_v", "__query_id_n",
            "neighbor_id", "__neighbor_id_v", "__neighbor_id_n",
        )
        .distinct()
    )
    scored = candidates.withColumn(
        "cos_sim",
        F.round(
            dot(F.col("__query_id_v"), F.col("__neighbor_id_v"))
            / (F.col("__query_id_n") * F.col("__neighbor_id_n")),
            6,
        ),
    )
    order = [F.col("cos_sim").desc(), F.col("neighbor_id")]
    return topk_per_key(scored, "query_id", order, k).select(
        "query_id", "neighbor_id", "cos_sim", "rank"
    )


# ---------------------------------------------------------------------------
# product quantization (PQ) ANN
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus_df: DataFrame,
    vec_col: str,
    m: int = 8,
    k_codes: int = 16,
    sample_size: int = 4096,
    iters: int = 8,
    seed: int = 7,
) -> np.ndarray:
    """Per-subspace k-means codebooks for product quantization: split
    the (L2-normalized) vector into `m` contiguous subvectors and train
    `k_codes` centroids in each subspace — returns (m, k_codes, d/m).

    Like :func:`train_ivf_centroids`, training is driver-side on a
    bounded seeded sample: codebooks are index METADATA (m·k·d/m = k·d
    doubles regardless of corpus size); the corpus-scale encode pass
    stays distributed in :func:`pq_ann`.
    """
    total = corpus_df.count()
    frac = min(1.0, (sample_size * 1.2) / max(total, 1))
    sample = (
        corpus_df.select(vec_col).sample(fraction=frac, seed=seed).limit(sample_size)
    ).toPandas()
    x = np.vstack(sample[vec_col].to_numpy()).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, k_codes, dsub))
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cent = xs[rng.choice(len(xs), size=min(k_codes, len(xs)), replace=False)]
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cent)):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j, : len(cent)] = cent
        if len(cent) < k_codes:  # degenerate tiny sample: repeat last
            books[j, len(cent) :] = cent[-1]
    return books


def pq_ann(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    m: int = 8,
    k_codes: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Approximate nearest neighbors via product quantization with
    asymmetric distance computation (ADC) — the memory-bound ANN scale
    path (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011): IVF/SRP bound how much of the corpus is
    SCANNED; PQ bounds how many BYTES each scanned vector costs
    (m sub-byte codes — 8 codes × 4 bits here vs 64 float32s, 64×
    smaller packed, ~8× even stored as Spark ints — so a 100 TB
    embedding column scans as a few TB of codes).

    1. Train per-subspace codebooks (driver-side sample — metadata).
    2. Encode the corpus: map-only vectorized pandas UDF → m uint8-range
       codes per vector (the one full-corpus pass; at scale the codes
       table is what you'd persist as the index).
    3. Per query, precompute the m×k_codes table of exact
       subspace-distances to every centroid (pandas UDF, table rides in
       the row), broadcast queries, and score candidates JVM-side: ADC
       distance = Σ_j table[j·k + code_j] — an `aggregate` fold over
       array lookups, no Python in the corpus-sized loop.
    4. Two-phase top-k per query on the approximate distance.

    Output: (query_id, neighbor_id, adc_dist, rank) — approximate (both
    quantization error and codebook locality), hence rows-only checked;
    recall vs brute force is asserted in unit tests.
    """
    books = train_pq_codebooks(
        corpus_df, vec_col, m=m, k_codes=k_codes, seed=seed
    )
    dsub = books.shape[2]

    @F.pandas_udf("array<int>")
    def _encode(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        x = np.vstack(v.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int32)
        for j in range(m):
            xs = x[:, j * dsub : (j + 1) * dsub]
            d2 = ((xs[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    @F.pandas_udf("array<double>")
    def _dtable(v: pd.Series) -> pd.Series:
        if v.empty:
            return pd.Series([], dtype=object)
        x = np.vstack(v.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        out = np.empty((len(x), m * k_codes))
        for j in range(m):
            xs = x[:, j * dsub : (j + 1) * dsub]
            out[:, j * k_codes : (j + 1) * k_codes] = (
                (xs[:, None, :] - books[j][None, :, :]) ** 2
            ).sum(axis=2)
        return pd.Series(list(out))

    c = spread(
        corpus_df.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        ),
        "neighbor_id",
    ).select("neighbor_id", _encode("__cv").alias("__codes"))
    q = queries_df.select(
        F.col(id_col).alias("query_id"), _dtable(F.col(vec_col)).alias("__dt")
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("__dt"),
            (j * k_codes + F.element_at(F.col("__codes"), j + 1) + 1).cast("int"),
        ),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", F.round(adc, 6))
    )
    order = [F.col("adc_dist").asc(), F.col("neighbor_id")]
    return topk_per_key(scored, "query_id", order, k).select(
        "query_id", "neighbor_id", "adc_dist", "rank"
    )


def ann_recall(
    exact: DataFrame, ann: DataFrame, k: int, threshold: float
) -> DataFrame:
    """ANN quality gate: per-query recall@k of an approximate result
    against the exact top-k, emitted as a boolean verdict.

    This is how an approximate operator becomes DRIVER-CHECKABLE: the
    approximate retrieval set itself is hash-family-dependent and can't
    be value-compared across engines, but "recall@k ≥ threshold vs the
    exact answer" is a quantified bound any oracle can assert (the
    oracle side is just `SELECT query_id, TRUE`). A broken index —
    empty buckets, wrong probe, bad re-scoring — drops recall below the
    threshold and flips the verdict, failing the hash match.

    Every exact-side query id yields exactly one output row (queries
    the ANN missed entirely count as recall 0, not absent rows).

    Output: (query_id, recall_ok)."""
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    return (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("__hits"), F.lit(0)) / k >= threshold).alias(
                "recall_ok"
            ),
        )
    )


def quantize_int8_audit(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector int8 scalar quantization with a reconstruction-error
    audit — the compression step that shrinks an embedding store 4×
    before ANN serving (each float32 dim → one signed byte scaled by the
    vector's max-abs).

    Everything is JVM-side array-lambda codegen (`transform`,
    `array_max`) — no UDF, no Python, fully map-side: at 100 TB this is
    a pure scan→project pipeline with zero shuffles until the caller's
    aggregation. The quantized code for dim x is floor(x/scale·127)
    (floor, not round: HALF_UP vs HALF_EVEN tie-breaks differ across
    engines; floor is bit-portable), reconstruction is code·scale/127,
    and the audit value is the vector's max absolute reconstruction
    error. float→double casts are exact, so both engines see identical
    inputs and IEEE ops give identical bits.

    Output: (id_col, scale double, max_qerr double) — one row per
    non-zero vector; all-zero vectors (scale 0) are dropped rather than
    divided by.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs))
    return (
        df.select(F.col(id_col), v.alias("__v"), scale.alias("__scale"))
        .filter(F.col("__scale") > 0.0)
        .select(
            F.col(id_col),
            F.col("__scale").alias("scale"),
            F.expr(
                "array_max(transform(__v, x -> "
                "abs(x - floor(x / __scale * 127.0) * __scale / 127.0)))"
            ).alias("max_qerr"),
        )
    )


def dim_robust_stats(
    df: DataFrame, vec_col: str, qs: tuple[float, float, float] = (0.25, 0.5, 0.75)
) -> DataFrame:
    """Per-dimension robust scaling parameters (median + IQR) over an
    embedding column — the RobustScaler fit step ((x - median)/IQR per
    dim survives the outliers that mean/std scaling absorbs); applying
    the scale afterwards is a pure map-side transform with these 64-ish
    rows broadcast.

    Quantiles are DISCRETE (the element at floor((n-1)·q), lower
    neighbor, no interpolation): the reported median/IQR are actual data
    values, so they are bit-identical in any engine — no float
    interpolation formula to disagree over, no quantization needed.
    One posexplode (rows × dim), one shuffle for the per-dim sort
    window. Exact rank statistics don't merge map-side, so this is the
    AUDIT-scale path; at 100 TB swap the window for approx_percentile
    per dim (one pass, mergeable sketches) and bound the error instead.

    Output: (dim, n, q1, med, q3, iqr)."""
    from pyspark.sql import Window as W

    lo, mid, hi = qs
    ex = df.select(
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x")
    )
    w = W.partitionBy("dim").orderBy("x")
    ranked = ex.select(
        "dim",
        "x",
        F.row_number().over(w).alias("__rn"),
        F.count(F.lit(1)).over(W.partitionBy("dim")).alias("__n"),
    )

    def at(q: float) -> Column:
        idx = F.floor((F.col("__n") - 1) * F.lit(q)) + 1
        return F.max(F.when(F.col("__rn") == idx, F.col("x")))

    return (
        ranked.groupBy("dim")
        .agg(
            F.max("__n").alias("n"),
            at(lo).alias("q1"),
            at(mid).alias("med"),
            at(hi).alias("q3"),
        )
        .select(
            F.col("dim").cast("int"),
            "n",
            "q1",
            "med",
            "q3",
            (F.col("q3") - F.col("q1")).alias("iqr"),
        )
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    every anchor, the k most-cosine-similar corpus vectors with a
    DIFFERENT label — the examples a contrastive loss learns the most
    from (near the anchor but semantically wrong).

    Same plan as brute_force_knn (broadcast anchors × one corpus scan,
    hoisted norms, two-phase top-k) plus the label-mismatch filter
    applied BEFORE scoring survivors are ranked, so positives never
    occupy top-k slots. At corpus scale swap the scan for an ANN
    candidate pass (srp_ann/ivf_ann) and re-rank exactly — the filter
    and top-k stages are unchanged.

    Output: (anchor_id, negative_id, cos_sim, rank), rank 1..k,
    deterministic tie-break on negative_id.
    """
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(label_col).alias("__al"),
        F.col(vec_col).alias("__av"),
    ).withColumn("__an", F.sqrt(dot(F.col("__av"), F.col("__av"))))
    c = spread(
        corpus.select(
            F.col(id_col).alias("negative_id"),
            F.col(label_col).alias("__cl"),
            F.col(vec_col).alias("__cv"),
        ),
        "negative_id",
    ).withColumn("__cn", F.sqrt(dot(F.col("__cv"), F.col("__cv"))))
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("__al") != F.col("__cl"))
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("__av"), F.col("__cv"))
                / (F.col("__an") * F.col("__cn")),
                6,
            ),
        )
    )
    order = [F.col("cos_sim").desc(), F.col("negative_id")]
    return topk_per_key(scored, "anchor_id", order, k).select(
        "anchor_id", "negative_id", "cos_sim", "rank"
    )


def quantile_normalize(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-dimension rank (quantile) normalization of an embedding
    column — the feature-engineering step that makes dimensions
    comparable before distance math when per-dim scales drift across
    encoder versions: each value maps to rank/(n+1) ∈ (0,1) within its
    dimension.

    Plan: map-side posexplode, ONE shuffle partitioned on the dimension
    index (each dim ranks independently; parallelism = dim count, which
    beats the cores on any real embedding width), row_number + count in
    the same window pass. Ranks tie-break on the id so the transform is
    deterministic; output quantizes to ppm integers. For the degenerate
    huge-N × tiny-d case the documented alternative is q141's
    distributed total-order ranking applied per dim.

    Output: (id_col, pos, rnk, norm_q).
    """
    e = df.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos", "__v")
    ).select(id_col, "pos", F.col("__v").cast("double").alias("__v"))
    w = W.partitionBy("pos").orderBy("__v", id_col)
    wc = W.partitionBy("pos")
    return (
        e.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .select(
            id_col,
            "pos",
            "rnk",
            F.floor(F.col("rnk") * F.lit(1_000_000) / (F.col("__n") + 1))
            .cast("bigint")
            .alias("norm_q"),
        )
    )


def knn_margin(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    accept_margin_q: int = 20_000,
) -> DataFrame:
    """Margin-based neighbor acceptance (the Artetxe-&-Schwenk-style
    confidence gate for mined pairs, difference form): a query keeps its
    best neighbor only when it clearly beats the runner-up field —
    margin = cos(best) − mean(cos(ranks 2..k)). Absolute-threshold
    mining drowns in hubness (dense regions pass everything); the
    margin normalizes against the query's own neighborhood density.

    Plan: exact top-k per query via brute_force_knn (broadcast queries,
    one corpus scan, two-phase top-k), then ONE aggregate per query
    over its k rows. Scores (6-dp-rounded doubles, the portable cosine
    convention) lift to exact ppm INTEGERS before the runner-up sum, so
    the aggregate is order-independent; the single mean division runs
    once per query and the margin floors to ppm.

    Single-candidate semantics: when a query has NO rank>1 neighbors
    (corpus smaller than 2 after the self-filter), there is no
    runner-up field to normalize against, so the lone neighbor is
    ACCEPTED with margin_q = its full ppm score (margin over an empty
    field) — explicitly, not as a NULL falling out of a 0/0 division.

    Output: (query_id, best_id, best_cos, margin_q, accepted).
    """
    top = brute_force_knn(queries_df, corpus_df, id_col, vec_col, k=k)
    cos_q = F.floor(F.col("cos_sim") * 1e6 + F.lit(0.5)).cast("bigint")
    agg = top.withColumn("__cq", cos_q).groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("neighbor_id"))).alias("best_id"),
        F.max(F.when(F.col("rank") == 1, F.col("cos_sim"))).alias("best_cos"),
        F.max(F.when(F.col("rank") == 1, F.col("__cq"))).alias("__best_q"),
        F.sum(F.when(F.col("rank") > 1, F.col("__cq"))).alias("__rest_q"),
        F.count(F.when(F.col("rank") > 1, 1)).alias("__nrest"),
    )
    margin_q = F.when(
        F.col("__nrest") > 0,
        F.floor(
            F.col("__best_q") - F.col("__rest_q") / F.col("__nrest") + F.lit(0.5)
        ).cast("bigint"),
    ).otherwise(F.col("__best_q"))
    return agg.select(
        "query_id",
        "best_id",
        "best_cos",
        margin_q.alias("margin_q"),
    ).withColumn("accepted", F.col("margin_q") >= F.lit(accept_margin_q))


def power_iteration_dominant(
    df: DataFrame, id_col: str, vec_col: str, iters: int = 4
) -> DataFrame:
    """Dominant right singular vector of the embedding matrix (top
    eigenvector of XᵀX) by distributed power iteration — the spectral
    primitive behind PCA whitening and all-but-the-top (ABTT) embedding
    post-processing, which needs exactly this vector at corpus scale.

    One iteration is two combinable aggregates over the exploded
    components with the current d-dim vector BROADCAST between them:
    a = Xv (one sum per row), then w = Xᵀa (one sum per dimension) —
    the corpus never shuffles row-wise, only (id)- and (pos)-keyed
    partials move, and d stays driver-side metadata. Determinism: X
    quantizes once to exact 1e-7 integers (q79's trunc convention),
    every accumulation is bigint (order-independent; magnitudes bounded
    by the per-iteration max-abs renormalization to ±1e6), and the one
    double division per renormalize truncates identically in any
    engine. The iteration count is fixed (spectral-gap-dependent
    accuracy, like q81's fixed Lloyd rounds).

    Output: (pos, v_q) — the unit-direction vector in trunc-1e6
    integer units (sign follows the all-ones start vector).
    """
    xq = (
        df.select(
            F.col(id_col).alias("__id"),
            F.posexplode(vec_col).alias("pos", "__x"),
        )
        .select(
            "__id",
            "pos",
            (F.col("__x").cast("double") * F.lit(1e7))
            .cast("bigint")
            .alias("xq"),
        )
        # EAGER barrier: every iteration consumes xq twice (Xv and
        # Xᵀa), so 4 rounds re-ran the parquet explode 8x without it —
        # and the per-round max-abs broadcast jobs would race a lazy
        # checkpoint's first materialization
        .localCheckpoint(eager=True)
    )
    spark = df.sparkSession
    dims = xq.select("pos").distinct()
    v = dims.select("pos", F.lit(1_000_000).cast("bigint").alias("vq"))
    for _ in range(iters):
        a = (
            xq.join(F.broadcast(v), "pos")
            .groupBy("__id")
            .agg(F.sum(F.col("xq") * F.col("vq")).alias("__a"))
        )
        am = a.agg(F.max(F.abs(F.col("__a"))).alias("__m"))
        aq = a.crossJoin(F.broadcast(am)).select(
            "__id",
            (F.col("__a").cast("double") * F.lit(1e6) / F.col("__m").cast("double"))
            .cast("bigint")
            .alias("aq"),
        )
        w = (
            xq.join(aq, "__id")
            .groupBy("pos")
            .agg(F.sum(F.col("xq") * F.col("aq")).alias("__w"))
        )
        wm = w.agg(F.max(F.abs(F.col("__w"))).alias("__m"))
        v = w.crossJoin(F.broadcast(wm)).select(
            "pos",
            (F.col("__w").cast("double") * F.lit(1e6) / F.col("__m").cast("double"))
            .cast("bigint")
            .alias("vq"),
        )
        # d-dim vector: safe to pin driver-side per iteration (index
        # metadata, corpus-size-independent) — keeps the lineage flat
        # instead of growing 4 joins deep per round
        rows = v.collect()
        v = spark.createDataFrame(rows, "pos int, vq bigint")
    return v.select(F.col("pos"), F.col("vq").alias("v_q"))


def gram_partials(df: DataFrame, vec_col: str, scale: float = 1e3) -> DataFrame:
    """Distributed integer Gram accumulation for the embedding matrix:
    each Arrow batch contributes its exact int64 ``X^T X`` upper
    triangle (diagonal included), per-dimension sums, and row count,
    tagged so one (i, j)-keyed partial-sum shuffle combines them.

    Output rows (i int, j int, v long):
      (-1, -1, n)      — batch row count
      (d, -2, sum q_d) — per-dimension linear sum
      (i, j, G_ij)     — upper-triangle second moments, i <= j

    This is the covariance/whitening primitive at corpus scale: the
    corpus contributes only d x d METADATA per partition — never the
    d^2-per-row explode-self-join a naive SQL plan would use (4096x
    row blowup at d=64). Components quantize to trunc-`scale` integer
    units (numpy trunc == Spark cast-to-bigint truncation; float32 →
    float64 widening is exact), so partials are order-independent
    exact integers; with |q| <= 1e3 the int64 sums hold to
    N ~ 9e18/1e6 = 9e12 rows per (i, j) cell before overflow.
    """

    def gram(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.trunc(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * scale
            ).astype(np.int64)
            n, d = X.shape
            G = X.T @ X
            s = X.sum(axis=0)
            iu, ju = np.triu_indices(d, k=0)
            yield pd.DataFrame(
                {
                    "i": np.concatenate(([-1], np.arange(d), iu)),
                    "j": np.concatenate(([-1], np.full(d, -2), ju)),
                    "v": np.concatenate(([n], s, G[iu, ju])),
                }
            )

    return (
        # NULL vectors carry no moments; dropping them here keeps the
        # row-count marker consistent with the per-dim sums (a NULL
        # would otherwise crash np.stack — and silently skew n if the
        # count were taken upstream of the map)
        df.select(vec_col)
        .where(F.col(vec_col).isNotNull())
        .mapInPandas(gram, "i int, j int, v long")
        .groupBy("i", "j")
        .agg(F.sum("v").cast("bigint").alias("v"))
    )
