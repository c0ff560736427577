"""Physical-plan inspection helpers.

The engine's scale story rests on Catalyst doing the right thing —
filters reaching the parquet scan, projections pruning the read schema,
small dims broadcast, top-k compiling to TakeOrderedAndProject, work
staying inside whole-stage codegen. These helpers turn those claims
into assertions (tests/test_plans.py) instead of hopes, and give a
REPL user `.explain`-style diagnostics as data.

Reference counterpart: none — the reference's whole "optimizer" is the
index-vs-scan choice at src/query_conditions.rs:495-593.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-initial) physical plan as a string."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text (scan details incl. PushedFilters)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (predicate pushdown proof)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """Per-scan ReadSchema strings (column-pruning proof)."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def num_shuffles(df: DataFrame) -> int:
    """Exchange operators in the plan — each is a full shuffle barrier."""
    return len(re.findall(r"Exchange (?:hash|range|rangepartitioning|SinglePartition)",
                          physical_plan(df), re.IGNORECASE))


def num_broadcast_joins(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", physical_plan(df)))


def has_take_ordered(df: DataFrame) -> bool:
    """True when orderBy+limit compiled to distributed top-k."""
    return "TakeOrderedAndProject" in physical_plan(df)


def global_windows(df: DataFrame) -> list[str]:
    """Window nodes with NO partition spec — the single-task funnel
    anti-pattern at corpus scale. A partitioned Window renders as
    ``Window [funcs], [partCols], [sortOrder]`` (three bracket groups);
    a global one as ``Window [funcs], [sortOrder]`` (two). Returns the
    offending lines so the assert message shows the node."""
    bad = []
    for line in physical_plan(df).splitlines():
        stripped = re.sub(r"^[\s:+*()-]*", "", line)
        if not stripped.startswith("Window "):
            continue
        groups = re.split(r"\], \[", stripped)
        # three groups = [funcs], [partCols], [sortOrder] — partitioned.
        # two groups is partitioned-unordered ([funcs], [partCols]) OR
        # global-ordered ([funcs], [sortOrder]); only the latter (the
        # trailing group carries ASC/DESC) is the single-task funnel.
        if len(groups) < 3 and re.search(r"\b(ASC|DESC)\b", groups[-1]):
            bad.append(stripped[:200])
    return bad


def codegen_stages(df: DataFrame) -> int:
    """Whole-stage-codegen spans — wider is better (fewer interpreted
    gaps). Read from `EXPLAIN CODEGEN`. NOTE: an AdaptiveSparkPlan
    reports 0 until its stages materialize — build the plan with
    spark.sql.adaptive.enabled=false when asserting codegen coverage."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0


def plan_report(df: DataFrame) -> dict:
    """One-call plan summary (for logging / debugging a query's shape)."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "num_shuffles": num_shuffles(df),
        "num_broadcast_joins": num_broadcast_joins(df),
        "take_ordered": has_take_ordered(df),
        "codegen_stages": codegen_stages(df),
    }
