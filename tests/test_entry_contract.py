"""Driver-contract tests for __spark_entry__.py: the smoke entry and
the per-call checkpoint janitor (round-10 ADVICE: the correctness
driver iterates the registry WITHOUT bench.py's checkpoint_scope, so
the contract fns themselves must release the prior query's
never-ContextCleaner-reclaimed localCheckpoint blocks)."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_mod = importlib.import_module("__spark_entry__")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 508


def test_janitor_releases_previous_querys_blocks(spark, sf_dir):
    """Sequential-driver simulation: run a checkpoint-pinning query via
    the CONTRACT fn (not the raw registry fn), complete its action,
    then invoke the next contract fn and assert the first query's
    blocks were released before the second defined anything. Also
    asserts the guard is not vacuous (the first query really pins)."""
    from tytodb_spark.session import persistent_rdd_ids

    qs = entry_mod.queries()
    base = persistent_rdd_ids(spark)

    # q378's edge -> orientation -> adjacency chain is the measured
    # never-reclaimed shape
    assert qs["q378_triangle_count"](spark, sf_dir).count() >= 0
    pinned = persistent_rdd_ids(spark) - base
    assert pinned, "q378 no longer pins checkpoint blocks — update test"

    df2 = qs["q20_pricing_summary"](spark, sf_dir)
    after_define = persistent_rdd_ids(spark)
    assert not (pinned & after_define), (
        "janitor left the previous query's checkpoint blocks pinned"
    )
    assert df2.count() > 0
