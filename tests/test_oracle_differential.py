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


def test_driver_check_order_is_mechanical(tmp_path, monkeypatch):
    """The registry prefix the driver verifies must self-rotate: entries
    without a green row in any committed CORRECTNESS artifact sort
    first, then oldest-last-green, so a new query can never sit outside
    the checked prefix (the r02/r03 stale-rotation failure mode)."""
    green = Q._driver_green_rounds()
    names = list(Q.REGISTRY)
    keys = [(green.get(n, -1), i) for i, n in enumerate(Q._check_order(names))]
    # keys must be non-decreasing in (green-round) — i.e. actually sorted
    assert all(keys[i][0] <= keys[i + 1][0] for i in range(len(keys) - 1))
    # every never-green entry precedes every green entry
    first_green = next(
        (i for i, n in enumerate(names) if green.get(n, -1) >= 0), len(names)
    )
    assert all(green.get(n, -1) < 0 for n in names[:first_green])
    assert all(green.get(n, -1) >= 0 for n in names[first_green:])
    # a hash-mismatch row (r03's q143) is NOT green
    import json

    art = json.load(open("CORRECTNESS_r03.json"))
    assert art["q143_table_checksum"]["hash_match"] is False
    assert "q143_table_checksum" in names[:first_green]
