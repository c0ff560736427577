"""Multimodal (image/audio/video) column handling for LLM-data pipelines.

Design: media are opaque ``binary`` payload columns plus a typed metadata
struct — the 100 TB-scale idiom (payload stays columnar in Parquet,
metadata is prunable without touching bytes). The closest reference
artifact is the five fixed-width BYTES types (src/alba_types.rs:290-294).

All heavy per-item work (decode, feature-extract, resize, frame-sample)
runs as Arrow-batched ``mapInPandas`` — one Python worker per partition,
vectorized transfer, no row-at-a-time serialization. The actual codec
step is STUBBED (PIL/ffmpeg are not in this container): decode attempts
the real library import and otherwise falls back to a clearly-marked
deterministic fake, so the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested while the codec is
swappable.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Metadata struct carried next to every payload.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha256", T.StringType()),
    ]
)


def to_media_table(df: DataFrame, id_col: str, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Wrap a source column as (id, payload binary, meta struct). The
    testdata has no real media, so document text bytes stand in as the
    opaque payload — the schema/partitioning contract is identical."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> object:
    """Decode an image payload. Real decode needs PIL, absent here —
    gate behind an import-try and fail loudly rather than fake pixels."""
    try:
        from PIL import Image  # noqa: F401
        import io

        return Image.open(io.BytesIO(payload))
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL; container has no codec libs"
        ) from e


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload features via Arrow-batched mapInPandas: byte length +
    sha256 content hash (the deterministic stand-in for an embedding /
    EXIF / spectrogram extractor — swap the body, keep the plumbing)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "payload_sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def resize_images(media: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Resize every image payload to (width, height) via Arrow-batched
    mapInPandas — same (id, payload, meta) contract out as in, so resize
    stages compose/chain like any other media transform.

    The pixel work is stubbed (no PIL in this container): the fake
    "resized" payload is exactly width*height*3 RGB-sized bytes derived
    deterministically from the source payload's sha256 (cycled), so
    batch shapes, output sizes, and metadata updates are all real and
    assertable. A production deployment swaps `_fake_resize` for
    `decode_image(...).resize((w, h)).tobytes()` and nothing else
    changes — partitioning, schema, and memory profile are identical.
    """
    n_out = width * height * 3

    def _fake_resize(raw: bytes) -> bytes:
        digest = hashlib.sha256(raw).digest()
        reps = n_out // len(digest) + 1
        return (digest * reps)[:n_out]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(lambda b: _fake_resize(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "mime": "image/raw-rgb",
                            "n_bytes": n_out,
                            "width": width,
                            "height": height,
                            "duration_ms": None,
                        }
                    ]
                    * len(pdf),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """Video-style frame sampling, stubbed deterministically: "frames"
    are fixed-stride byte windows of the payload (a real implementation
    replaces the window slice with an ffmpeg keyframe decode; the
    explode shape, schema, and partition behavior are what's tested).

    Fingerprint domain: sha256 over the UPPERCASE-HEX encoding of the
    frame bytes, not the raw bytes. Hex is injective, so dedup/grouping
    semantics are byte-exact for ANY payload (no ASCII fixture contract)
    — and the differential oracle can recompute it, because DuckDB 1.0
    can slice and sha256 strings but not BLOBs
    (sha256(substr(hex(encode(text)), i*128+1, 128)) is the oracle
    spelling). A production decode swaps raw-byte sha256 behind the
    same column contract; only the fingerprint VALUES change, never the
    dedup semantics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_hash = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n = min(max_frames, max(1, len(raw) // every_n_bytes))
                for i in range(n):
                    window = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out_id.append(doc_id)
                    out_idx.append(i)
                    out_hash.append(
                        hashlib.sha256(window.hex().upper().encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": out_id, "frame_idx": out_idx, "frame_sha256": out_hash}
            )

    return media.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


ALIGN_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("alignment", T.DoubleType()),
    ]
)


def _fake_clip_embed(data: bytes, dims: int = 8) -> list[float]:
    """Deterministic stand-in for a CLIP-style encoder: 4 hex chars of
    md5 per dimension, scaled to [0, 1]. Swap for a real model forward
    pass in production — the operator plumbing (Arrow batches, Python
    workers, JVM-side filter) is identical."""
    h = hashlib.md5(data).hexdigest()
    return [int(h[4 * i : 4 * i + 4], 16) / 65535.0 for i in range(dims)]


def alignment_scores(media: DataFrame, text_df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Image-text alignment scoring (the CLIP-score filter step of a
    multimodal pair pipeline): embed the binary payload and its caption
    text with the (stubbed) encoder inside Arrow-batched mapInPandas,
    score cosine alignment, and return (id, alignment) for JVM-side
    thresholding/joining.

    Plan shape at 100 TB: the payload never leaves its scan partition
    — embedding happens where the bytes live, one Python worker per
    core, and only (id, 8-float) rows flow on. The caption join is on
    the id key (broadcast while captions fit). The encoder here is the
    deterministic md5 fake (`_fake_clip_embed`); a real model swaps in
    with a broadcast weights handle and a GPU-pinned worker pool.
    """

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload, text in zip(
                pdf["doc_id"], pdf["payload"], pdf["text"]
            ):
                iv = _fake_clip_embed(bytes(payload))
                tv = _fake_clip_embed(("t:" + text).encode("utf-8"))
                num = sum(a * b for a, b in zip(iv, tv))
                den = (sum(a * a for a in iv) ** 0.5) * (
                    sum(b * b for b in tv) ** 0.5
                )
                # floor(x*1e6+0.5)/1e6, NOT round(): Python round is
                # banker's, SQL round is half-away — the one explicit
                # rule both engines reproduce (q81 lesson)
                q = math.floor(num / den * 1e6 + 0.5) / 1e6
                out.append((int(did), q))
            yield pd.DataFrame(out, columns=["doc_id", "alignment"])

    joined = media.select("doc_id", "payload").join(
        text_df.select(
            F.col(id_col).cast("long").alias("doc_id"), F.col(text_col).alias("text")
        ),
        "doc_id",
    )
    return joined.mapInPandas(score, ALIGN_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("seg_idx", T.IntegerType()),
        T.StructField("energy_x100", T.LongType()),
    ]
)


def energy_windows(
    media: DataFrame, window_bytes: int = 64, max_segments: int = 4
) -> DataFrame:
    """Audio-style energy segmentation (the VAD / silence-trim front of
    a speech-data pipeline), stubbed deterministically: "energy" of a
    fixed-stride byte window is mean byte value ×100 as an exact
    integer (a real implementation decodes PCM and computes RMS over
    sample windows behind the SAME Arrow batch signature — the explode
    shape, schema, and per-partition locality are what's tested here).

    Plan shape at 100 TB: payloads never leave their scan partition;
    only (id, seg, int) rows flow out of the Python stage, so the
    downstream voiced-segment filter/join is JVM-side on metadata-
    sized rows.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_id, out_idx, out_e = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                if not raw:  # empty payload: no segments (mirrors the
                    continue  # oracle's length(win) > 0 guard)
                n = min(max_segments, max(1, len(raw) // window_bytes))
                for i in range(n):
                    w = raw[i * window_bytes : (i + 1) * window_bytes]
                    out_id.append(doc_id)
                    out_idx.append(i)
                    # exact integer mean ×100 — floor division, engine-
                    # and float-free
                    out_e.append((sum(w) * 100) // len(w))
            yield pd.DataFrame(
                {"doc_id": out_id, "seg_idx": out_idx, "energy_x100": out_e}
            )

    return media.select("doc_id", "payload").mapInPandas(batches, ENERGY_SCHEMA)


def ahash48(df: DataFrame, id_col: str, payload_text_col: str) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprint over the first 48
    payload bytes — the classic image near-dup primitive (bit i set iff
    sample i exceeds the payload's mean), stubbed over raw bytes the
    same way sample_frames stubs frame decode: a real pipeline resizes
    to an 8×8 grayscale grid and hashes pixel means behind the SAME
    (id, ahash bigint) contract.

    Spelling matters here: the tempting one-row higher-order-function
    version (aggregate-lambda over a byte array, mean referenced inside
    the bit lambda) is catastrophically slow — Catalyst inlines the
    mean sub-aggregate into every bit evaluation (48× re-evaluation)
    and HOF lambdas run INTERPRETED, outside whole-stage codegen. So
    the operator EXPLODES to (id, bit_idx, byte) rows — 48× narrow-row
    fan-out, fully codegen'd conv/substr — and computes mean + hash as
    two ordinary hash aggregates with a broadcast join between. Both
    aggregates are map-side combinable; at 100 TB the fan-out is the
    same per-byte work any decode does, just distributed.

    All integer (mean is exact floor division), engine-portable (the
    DuckDB oracle mirrors it with list_transform/list_sum). 48 bits
    (not 64) keeps every shifted term far from int64 sign territory in
    BOTH engines.

    Output: (id, ahash bigint, n_bytes) for non-empty payloads."""
    hx = F.upper(F.hex(F.encode(F.col(payload_text_col), "UTF-8")))
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.substring(hx, 1, 96).alias("__hx"),
        )
        .withColumn("__n", F.expr("length(__hx) div 2").cast("int"))
        .filter(F.col("__n") > 0)
    )
    bits = base.select(
        "id",
        "__n",
        F.explode(F.expr("sequence(0, __n - 1)")).alias("i"),
        "__hx",
    ).select(
        "id",
        "__n",
        "i",
        F.expr("cast(conv(substr(__hx, 2*i+1, 2), 16, 10) as bigint)").alias(
            "__b"
        ),
    )
    means = bits.groupBy("id").agg(
        F.expr("sum(__b) div count(1)").cast("bigint").alias("__m")
    )
    # shuffle join on id, NOT broadcast: the per-doc mean table is
    # corpus-sized; the join key matches the aggregate's partitioning
    return (
        bits.join(means, "id")
        .groupBy("id", "__n")
        .agg(
            F.sum(
                F.when(
                    F.col("__b") > F.col("__m"),
                    F.expr("shiftleft(cast(1 as bigint), i)"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("ahash")
        )
        .select("id", "ahash", F.col("__n").cast("int").alias("n_bytes"))
    )


def hamming_near_dups(
    hashes: DataFrame,
    n_bands: int = 4,
    band_bits: int = 12,
    max_hamming: int = 8,
) -> DataFrame:
    """Band-bucketed Hamming near-dup candidates over perceptual
    hashes: split each hash into bands, bucket-join on (band index,
    band value) — any pair within max_hamming collides on ≥1 band when
    bits-per-band > max_hamming/n_bands by pigeonhole — then verify
    the exact Hamming distance with one xor+popcount. Candidate
    generation is bucket-bounded (never all-pairs), the same LSH shape
    as MinHash banding but for Hamming space.

    Output: (id_a, id_b, hamming) with hamming ≤ max_hamming."""
    mask = (1 << band_bits) - 1
    bands = hashes.select(
        "id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(f"shiftright(ahash, {band_bits * j}) & {mask}")
                        .cast("bigint")
                        .alias("bv"),
                    )
                    for j in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("id", "ahash", F.col("b.j").alias("j"), F.col("b.bv").alias("bv"))
    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["j", "bv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.ahash").alias("ha"),
            F.col("b.ahash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.expr("bit_count(ha ^ hb)").cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)
