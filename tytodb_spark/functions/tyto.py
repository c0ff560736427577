"""Tyto-semantics scalar helpers (SURVEY §2.4, §1.2).

The reference has no scalar-function surface; its only value-level
behaviors are (a) the implicit coercion matrix `try_from_existing`
(reference src/alba_types.rs:117-275), (b) truncate-or-pad for bounded
string/bytes types (src/alba_types.rs:317-348), and (c) zero-default
construction for unset columns (src/database.rs:568). These compile to
built-in Spark expressions — JVM-side, codegen'd, no UDFs.

Type-system mapping (src/alba_types.rs:9-27, fixed sizes :276-296):
  INT→int  BIGINT→bigint  FLOAT→double(!)  BOOL→boolean  CHAR→string(1)
  TEXT→string  {NANO,SMALL,MEDIUM,BIG,LARGE}STRING→string cap 10/100/500/2000/3000
  {NANO,SMALL,MEDIUM,BIG,LARGE}BYTES→binary cap 10/1000/10000/100000/1000000
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# AlbaTypes → (Spark type, bounded size or None). FLOAT is 64-bit in the
# reference (f64, src/alba_types.rs:280) → DoubleType.
ALBA_TYPES: dict[str, tuple[T.DataType, int | None]] = {
    "INT": (T.IntegerType(), None),
    "BIGINT": (T.LongType(), None),
    "FLOAT": (T.DoubleType(), None),
    "BOOL": (T.BooleanType(), None),
    "CHAR": (T.StringType(), 1),
    "TEXT": (T.StringType(), None),
    "NANO-STRING": (T.StringType(), 10),
    "SMALL-STRING": (T.StringType(), 100),
    "MEDIUM-STRING": (T.StringType(), 500),
    "BIG-STRING": (T.StringType(), 2000),
    "LARGE-STRING": (T.StringType(), 3000),
    "NANO-BYTES": (T.BinaryType(), 10),
    "SMALL-BYTES": (T.BinaryType(), 1000),
    "MEDIUM-BYTES": (T.BinaryType(), 10000),
    "BIG-BYTES": (T.BinaryType(), 100000),
    "LARGE-BYTES": (T.BinaryType(), 1000000),
    "NONE": (T.NullType(), None),
}


def bounded_string(col: Column | str, n: int) -> Column:
    """Truncate a string to ``n`` chars (bounded-string write semantics,
    src/alba_types.rs:317-323: values longer than the cap are cut; shorter
    values are stored with a length prefix, i.e. NOT visibly padded on
    read-back — so the user-visible semantic is truncation only)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def bounded_bytes(col: Column | str, n: int) -> Column:
    """Truncate a binary value to ``n`` bytes (src/alba_types.rs:336-348).
    SQL ``substring`` operates on BINARY and returns BINARY."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(c, 1, n)


def zero_default(alba_type: str) -> object:
    """Zero-default for unset columns (reference has no per-value NULL:
    src/database.rs:568 starts from `container.columns()` defaults)."""
    t = alba_type.upper()
    if t in ("INT", "BIGINT"):
        return 0
    if t == "FLOAT":
        return 0.0
    if t == "BOOL":
        return False
    if t.endswith("BYTES"):
        return b""
    if t == "NONE":
        return None
    return ""  # CHAR / TEXT / *-STRING


def coerce(
    col: Column, target_alba_type: str, source_alba_type: str | None = None
) -> Column:
    """The implicit coercion matrix (src/alba_types.rs:117-275):
    anything→Text via to_string / base64(bytes); string→int/float parse;
    bool↔int; float→int truncating; string→bool for 0/1/t/f/true/false;
    string↔bytes via base64.

    ``source_alba_type`` disambiguates the binary directions — an
    unresolved Column's Spark type is not introspectable, but every
    caller (warehouse, AQL engine) knows the schema it reads from, so
    the source type is an input, not a guess: bytes→text is a base64
    RENDER, text→bytes a base64 DECODE, bytes→bytes passes through
    undecoded. Omitted (non-binary source) keeps string-direction
    behavior."""
    t = target_alba_type.upper()
    spark_t, cap = ALBA_TYPES[t]
    src_binary = bool(source_alba_type) and source_alba_type.upper().endswith("BYTES")

    if t in ("INT", "BIGINT"):
        target = "int" if t == "INT" else "bigint"
        # float→int truncates toward zero in the reference (`as` cast,
        # src/alba_types.rs:146-151); Spark's double→int cast also truncates.
        return col.cast(target)
    if t == "FLOAT":
        return col.cast("double")
    if t == "BOOL":
        # string→bool accepts 0/1/t/f/true/false (src/alba_types.rs:205-211)
        s = F.lower(F.trim(col.cast("string")))
        return (
            F.when(s.isin("1", "t", "true"), F.lit(True))
            .when(s.isin("0", "f", "false"), F.lit(False))
            # numeric→bool: nonzero is true (bool↔int coercion,
            # src/alba_types.rs:152-170); non-boolean strings → NULL
            # (try_cast: ANSI mode would throw on malformed input)
            .otherwise(col.try_cast("boolean"))
        )
    if isinstance(spark_t, T.BinaryType):
        # bytes→bytes passes through undecoded; string→bytes is a
        # base64 decode (src/alba_types.rs:331-334)
        out = col if src_binary else F.unbase64(col)
        return F.substring(out, 1, cap) if cap else out
    # string targets: bytes render as base64 text (src/alba_types.rs:130)
    out = F.base64(col) if src_binary else col.cast("string")
    return F.substring(out, 1, cap) if cap else out


def bytes_to_text(col: Column) -> Column:
    """bytes→string convention = base64 (src/alba_types.rs:130)."""
    return F.base64(col)


def text_to_bytes(col: Column) -> Column:
    """string→bytes convention = base64 decode (src/alba_types.rs:331-334)."""
    return F.unbase64(col)
