"""Reader/writer for a TytoDB-style fixed-width binary container file.

The reference stores every table as one binary file: a schema header
followed by fixed-width rows — ints/floats big-endian, bounded strings
as an 8-byte little-endian length prefix plus a zero-padded payload
(layout per src/container.rs:435-520 and src/alba_types.rs:276-296;
header concept per src/database.rs:449-513). This module implements an
independent, simplified container format with those same row semantics
so data written by the storage model the reference embodies can flow
into Spark DataFrames — the layout is re-specified here, not a code
port.

Format (version 1):
  magic  b"TYSP" | u8 version | u16 LE n_cols
  per column: u16 LE name_len | name utf-8 | u8 type_code
  rows: concatenated fixed-width encodings, no separators.

Types: INT(i32 BE, 4) BIGINT(i64 BE, 8) FLOAT(f64 BE, 8) BOOL(u8, 1)
  STRING<N>(u64 LE length + N payload bytes, zero-padded, truncating —
  the reference's bounded-string semantic, src/alba_types.rs:317-323).

Read path is distributed: `spark.read.format("binaryFile")` yields one
row per container file, and an Arrow-batched mapInPandas parses rows
vectorized with numpy strided views — a directory of containers (the
reference's one-file-per-table database dir, src/database.rs:99-108)
fans out one file per task.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"TYSP"
VERSION = 1

# type_code → (spark type, fixed width); STRING widths are encoded as
# 100 + log-slot in the code stream, see _string_code
INT, BIGINT, FLOAT, BOOL = 1, 2, 3, 4
_STRING_BASE = 100

FIXED = {
    INT: (T.IntegerType(), 4),
    BIGINT: (T.LongType(), 8),
    FLOAT: (T.DoubleType(), 8),
    BOOL: (T.BooleanType(), 1),
}

# bounded-string slots (bytes) — mirrors the reference's NANO..LARGE
# ladder (src/alba_types.rs:285-289) without copying its exact sizes
STRING_SLOTS = [10, 100, 500, 2000, 4000]


def string_code(cap: int) -> int:
    for i, slot in enumerate(STRING_SLOTS):
        if cap <= slot:
            return _STRING_BASE + i
    raise ValueError(f"string cap {cap} exceeds max slot {STRING_SLOTS[-1]}")


def _col_width(code: int) -> int:
    if code in FIXED:
        return FIXED[code][1]
    return 8 + STRING_SLOTS[code - _STRING_BASE]


def _col_type(code: int) -> T.DataType:
    if code in FIXED:
        return FIXED[code][0]
    return T.StringType()


def schema_of(cols: list[tuple[str, int]]) -> T.StructType:
    return T.StructType([T.StructField(name, _col_type(code)) for name, code in cols])


def write_container(path: str, cols: list[tuple[str, int]], rows: list[tuple]) -> None:
    """Single-file writer over in-memory rows — the per-shard encoder
    that :func:`write_containers` runs inside every partition (also
    handy for driver-side test fixtures)."""
    header = bytearray(MAGIC)
    header += struct.pack("<BH", VERSION, len(cols))
    for name, code in cols:
        nb = name.encode("utf-8")
        header += struct.pack("<H", len(nb)) + nb + struct.pack("<B", code)
    body = bytearray()
    for row in rows:
        for (name, code), v in zip(cols, row):
            if code == INT:
                body += struct.pack(">i", int(v))
            elif code == BIGINT:
                body += struct.pack(">q", int(v))
            elif code == FLOAT:
                body += struct.pack(">d", float(v))
            elif code == BOOL:
                body += struct.pack("B", 1 if v else 0)
            else:
                cap = STRING_SLOTS[code - _STRING_BASE]
                payload = ("" if v is None else str(v)).encode("utf-8")[:cap]
                body += struct.pack("<Q", len(payload)) + payload.ljust(cap, b"\0")
    with open(path, "wb") as f:
        f.write(bytes(header) + bytes(body))


def write_containers(df: DataFrame, out_dir: str, cols: list[tuple[str, int]]) -> DataFrame:
    """DISTRIBUTED container writer: each input partition encodes and
    writes its own shard file (atomic tmp+rename), mirroring how the
    reference's one-file-per-table database dir (src/database.rs:99-108)
    generalizes to a sharded directory. No rows touch the driver — the
    returned manifest (path, n_rows per shard) is the only thing
    collected. Paths assume a shared filesystem across executors (local
    FS here; an object-store deployment swaps the two file calls).

    Returns the manifest DataFrame; force it (count/collect) to run the
    write. IDEMPOTENT: the shard name derives from the task's partition
    id, so task retries, speculative duplicates, and re-evaluating the
    manifest (e.g. count() then collect()) overwrite the same file
    instead of accumulating random-named duplicates the read glob would
    double-count. tmp names are attempt-scoped so two concurrent
    attempts can't interleave writes; the os.rename is the atomic
    commit, last winner sticks (attempts write identical bytes)."""
    import os

    names = [n for n, _ in cols]

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        rows: list[tuple] = []
        for pdf in it:
            rows.extend(pdf[names].itertuples(index=False, name=None))
        if not rows:
            return
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        shard = os.path.join(out_dir, f"part-{pid:05d}.tysp")
        tmp = f"{shard}.{attempt}.tmp"
        write_container(tmp, cols, rows)
        os.replace(tmp, shard)
        yield pd.DataFrame({"path": [shard], "n_rows": [len(rows)]})

    os.makedirs(out_dir, exist_ok=True)
    return df.select(names).mapInPandas(write_part, "path string, n_rows long")


def _parse_header(buf: bytes) -> tuple[list[tuple[str, int]], int]:
    if buf[:4] != MAGIC:
        raise ValueError("not a TYSP container (bad magic)")
    version, n_cols = struct.unpack_from("<BH", buf, 4)
    if version != VERSION:
        raise ValueError(f"unsupported container version {version}")
    off = 7
    cols: list[tuple[str, int]] = []
    for _ in range(n_cols):
        (name_len,) = struct.unpack_from("<H", buf, off)
        off += 2
        name = buf[off : off + name_len].decode("utf-8")
        off += name_len
        (code,) = struct.unpack_from("<B", buf, off)
        off += 1
        cols.append((name, code))
    return cols, off


def _parse_body(buf: bytes, cols: list[tuple[str, int]]) -> pd.DataFrame:
    row_w = sum(_col_width(c) for _, c in cols)
    n_rows = (len(buf)) // row_w if row_w else 0
    mat = np.frombuffer(buf[: n_rows * row_w], dtype=np.uint8).reshape(n_rows, row_w)
    out: dict[str, object] = {}
    off = 0
    for name, code in cols:
        w = _col_width(code)
        block = mat[:, off : off + w]
        # .astype to native endianness — Arrow rejects byte-swapped arrays
        if code == INT:
            out[name] = block.copy().view(">i4").reshape(n_rows).astype("=i4")
        elif code == BIGINT:
            out[name] = block.copy().view(">i8").reshape(n_rows).astype("=i8")
        elif code == FLOAT:
            out[name] = block.copy().view(">f8").reshape(n_rows).astype("=f8")
        elif code == BOOL:
            out[name] = block.reshape(n_rows).astype(bool)
        else:
            lens = block[:, :8].copy().view("<u8").reshape(n_rows)
            payload = block[:, 8:]
            out[name] = [
                bytes(payload[i, : int(lens[i])]).decode("utf-8") for i in range(n_rows)
            ]
        off += w
    return pd.DataFrame(out)


def read_container_local(path: str) -> pd.DataFrame:
    with open(path, "rb") as f:
        buf = f.read()
    cols, body_off = _parse_header(buf)
    return _parse_body(buf[body_off:], cols)


def read_containers(
    spark: SparkSession, path_glob: str, cols: list[tuple[str, int]]
) -> DataFrame:
    """Distributed read of container files: one binaryFile row per
    container, parsed vectorized inside mapInPandas. The declared
    schema must match the files' headers (checked per file)."""
    expected = [(n, c) for n, c in cols]
    schema = schema_of(cols)

    def parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for content in pdf["content"]:
                buf = bytes(content)
                file_cols, off = _parse_header(buf)
                if file_cols != expected:
                    raise ValueError(
                        f"container schema {file_cols} != declared {expected}"
                    )
                yield _parse_body(buf[off:], file_cols)

    files = spark.read.format("binaryFile").load(path_glob).select("content")
    return files.mapInPandas(parse, schema)
