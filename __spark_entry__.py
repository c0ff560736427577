"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All query definitions live in ``tytodb_spark.queries`` (the registry);
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tytodb_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H Q1-style pricing summary over lineitem (decimal-exact sums).
    """
    return Q.REGISTRY["q20_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def _with_janitor(fn: Callable[[SparkSession, str], DataFrame]):
    """Release the PREVIOUS query's checkpoint blocks before defining
    the next one. The registry's reuse barriers are localCheckpoints,
    and a chained/eager checkpoint is NEVER reclaimed by Spark's
    ContextCleaner (measured — see session.release_persistent_rdds),
    so a registry-iterating driver that runs all 508 queries in one
    session would otherwise pin every query's barrier blocks for the
    whole run. bench.py and tools/partition_sweep.py scope per query
    via session.checkpoint_scope; the correctness driver calls these
    fns directly, so the janitor rides the call itself.

    Safe because the driver is sequential (define -> collect -> next,
    as its per-query CORRECTNESS rows show): by the time fn(N+1) is
    invoked, query N's action has completed and its blocks are
    garbage. Nothing in the package pins cross-query state — every
    cache/checkpoint is created and consumed inside one query fn."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        from tytodb_spark.session import release_persistent_rdds

        try:
            release_persistent_rdds(spark, keep=set())
        except Exception:
            pass  # janitor is best-effort; never fail the query for it
        return fn(spark, sf_dir)

    wrapped.__wrapped__ = fn
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _with_janitor(qd.fn) for name, qd in Q.REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return {name: qd.oracle for name, qd in Q.REGISTRY.items() if qd.oracle is not None}
