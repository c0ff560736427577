"""Differential gate: every declared query vs its DuckDB oracle at sf0.01.

This mirrors the driver's CORRECTNESS check so regressions surface locally
before a round ends.
"""

from __future__ import annotations

import pytest

from tytodb_spark import queries as Q
from tests.oracle_compare import compare, duckdb_connect

ORACLE_NAMES = [n for n, qd in Q.REGISTRY.items() if qd.oracle is not None]
ROWS_ONLY_NAMES = [n for n, qd in Q.REGISTRY.items() if qd.oracle is None]


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    c = duckdb_connect(oracle_sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, oracle_sf_dir, con, name):
    qd = Q.REGISTRY[name]
    df = qd.fn(spark, oracle_sf_dir)
    res = compare(df, con, qd.oracle)
    assert res["ok"], f"{name}: {res}"


def test_every_query_has_an_oracle():
    """As of round 2 every registry entry is oracle-checked (approximate
    ops via verdict/recall/bounds columns, q39 via its stream-equals-
    batch gate). Keep it that way: a new query without an oracle should
    be a deliberate, documented exception, not a default."""
    assert ROWS_ONLY_NAMES == []
