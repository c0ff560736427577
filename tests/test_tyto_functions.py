"""Tyto-semantics helper unit tests: bounded truncation vectors
(src/alba_types.rs:317-348), coercion matrix (src/alba_types.rs:117-275),
zero-defaults (src/database.rs:568)."""

import pytest
from pyspark.sql import functions as F

from tytodb_spark.functions.tyto import (
    ALBA_TYPES,
    bounded_bytes,
    bounded_string,
    bytes_to_text,
    coerce,
    text_to_bytes,
    zero_default,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_bounded_string_truncates(spark):
    c = F.lit("abcdefghijKLMNOP")
    assert _one(spark, bounded_string(c, 10)) == "abcdefghij"
    assert _one(spark, bounded_string(F.lit("ab"), 10)) == "ab"


def test_bounded_bytes_truncates(spark):
    c = F.lit(b"0123456789ABCDEF")
    assert _one(spark, bounded_bytes(c, 10)) == bytearray(b"0123456789")


def test_coerce_binary_directions(spark):
    """The four binary-involved cells of the matrix, disambiguated by
    the explicit source type (src/alba_types.rs:117-275,331-334)."""
    # bytes→text renders base64 (rs:130)
    assert _one(spark, coerce(F.lit(b"ab\x00"), "TEXT", "NANO-BYTES")) == "YWIA"
    # bytes→bytes passes through — no spurious unbase64 of raw bytes
    assert _one(
        spark, coerce(F.lit(b"abc"), "SMALL-BYTES", "NANO-BYTES")
    ) == bytearray(b"abc")
    # text→bytes decodes base64 (rs:331-334)
    assert _one(spark, coerce(F.lit("YWJj"), "SMALL-BYTES")) == bytearray(b"abc")
    # bounded binary target still truncates after the pass-through
    assert _one(
        spark, coerce(F.lit(b"0123456789ABCDEF"), "NANO-BYTES", "SMALL-BYTES")
    ) == bytearray(b"0123456789")
    # bytes→bounded-string truncates the RENDERED base64, not the bytes
    assert _one(
        spark, coerce(F.lit(b"0123456789ABCDEF"), "NANO-STRING", "NANO-BYTES")
    ) == "MDEyMzQ1Nj"


def test_coerce_float_to_int_truncates(spark):
    # `as` cast semantics: toward zero (src/alba_types.rs:146-151)
    assert _one(spark, coerce(F.lit(2.9), "INT")) == 2
    assert _one(spark, coerce(F.lit(-2.9), "INT")) == -2


def test_coerce_string_parse(spark):
    assert _one(spark, coerce(F.lit("42"), "BIGINT")) == 42
    assert _one(spark, coerce(F.lit("4.25"), "FLOAT")) == 4.25


@pytest.mark.parametrize(
    "s,expected",
    [("1", True), ("t", True), ("true", True), ("TRUE", True),
     ("0", False), ("f", False), ("false", False), ("x", None)],
)
def test_coerce_string_to_bool(spark, s, expected):
    assert _one(spark, coerce(F.lit(s), "BOOL")) is expected


def test_coerce_bool_int_roundtrip(spark):
    assert _one(spark, coerce(F.lit(True), "INT")) == 1
    assert _one(spark, coerce(F.lit(3), "BOOL")) is True
    assert _one(spark, coerce(F.lit(0), "BOOL")) is False


def test_bytes_base64_convention(spark):
    assert _one(spark, bytes_to_text(F.lit(b"hi"))) == "aGk="
    assert _one(spark, text_to_bytes(F.lit("aGk="))) == bytearray(b"hi")


def test_bounded_string_target_caps(spark):
    long = "x" * 5000
    assert len(_one(spark, coerce(F.lit(long), "NANO-STRING"))) == 10
    assert len(_one(spark, coerce(F.lit(long), "MEDIUM-STRING"))) == 500
    assert len(_one(spark, coerce(F.lit(long), "LARGE-STRING"))) == 3000


def test_zero_defaults():
    assert zero_default("INT") == 0
    assert zero_default("BIGINT") == 0
    assert zero_default("FLOAT") == 0.0
    assert zero_default("BOOL") is False
    assert zero_default("TEXT") == ""
    assert zero_default("CHAR") == ""
    assert zero_default("SMALL-BYTES") == b""
    assert zero_default("NONE") is None


def test_alba_type_table_complete():
    # all 17 reference types (src/alba_types.rs:9-27)
    assert len(ALBA_TYPES) == 17
