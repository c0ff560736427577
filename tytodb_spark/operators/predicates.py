"""The WHERE micro-language (SURVEY §2.2) compiled to Spark Columns.

Reference semantics: conditions are flat triples ``column OP literal``
chained by AND/OR, evaluated as a left-to-right fold with NO operator
precedence (reference src/query_conditions.rs:482-487). We reproduce the
left-fold associativity exactly; oracle SQL must parenthesize the same way.

We implement the *intended* comparison direction (``column OP literal``).
The reference's `row_match` inverts it — evaluates ``literal OP row``
(src/query_conditions.rs:271-479) — which SURVEY §8 records as a defect,
not a semantic.

Operator tokens (src/lexer_functions.rs:290-395 → src/query_conditions.rs:96-110):
  =  ==  !=  >  <  >=  <=      comparisons
  &>   string contains          (col contains literal)
  &&>  case-insensitive contains
  &&&> regex match              (col rlike literal)

All of these compile to JVM-side Column expressions — whole-stage codegen,
pushdown-eligible — never Python UDFs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# Condition triple: (column_name, op_token, literal_value)
Condition = tuple[str, str, object]


def compile_condition(column: str, op: str, value: object) -> Column:
    """One ``column OP literal`` triple → Spark Column (boolean)."""
    c = F.col(column)
    if op in ("=", "=="):
        return c == F.lit(value)
    if op == "!=":
        return c != F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    if op == "&>":  # contains
        return c.contains(F.lit(value))
    if op == "&&>":  # case-insensitive contains
        return F.lower(c).contains(F.lower(F.lit(value)))
    if op == "&&&>":  # regex
        return c.rlike(str(value))
    raise ValueError(f"unknown predicate operator: {op!r}")


def compile_chain(
    conditions: Sequence[Condition],
    gates: Sequence[str],
) -> Column:
    """Left-fold a condition chain with AND/OR gates, no precedence.

    ``a=1 OR b=2 AND c=3`` folds as ``((a=1 OR b=2) AND c=3)`` — the
    reference's short-circuit fold semantics (src/query_conditions.rs:482-487),
    NOT SQL precedence. ``len(gates) == len(conditions) - 1``.
    """
    if not conditions:
        return F.lit(True)
    if len(gates) != len(conditions) - 1:
        raise ValueError(
            f"gate/condition arity mismatch: {len(conditions)} conditions, {len(gates)} gates"
        )
    acc = compile_condition(*conditions[0])
    for gate, cond in zip(gates, conditions[1:]):
        nxt = compile_condition(*cond)
        g = gate.upper()
        if g == "AND":
            acc = acc & nxt
        elif g == "OR":
            acc = acc | nxt
        else:
            raise ValueError(f"unknown gate: {gate!r}")
    return acc


def chain_to_sql(conditions: Sequence[Condition], gates: Sequence[str]) -> str:
    """Render the same left-fold as explicitly-parenthesized ANSI SQL
    (for oracle strings and debugging)."""
    if not conditions:
        return "TRUE"

    def one(c: Condition) -> str:
        col, op, v = c
        lit = f"'{v}'" if isinstance(v, str) else ("TRUE" if v is True else "FALSE" if v is False else repr(v))
        if op in ("=", "=="):
            return f"{col} = {lit}"
        if op == "&>":
            return f"contains({col}, {lit})"
        if op == "&&>":
            return f"contains(lower({col}), lower({lit}))"
        if op == "&&&>":
            return f"regexp_matches({col}, {lit})"
        return f"{col} {op} {lit}"

    acc = one(conditions[0])
    for gate, cond in zip(gates, conditions[1:]):
        acc = f"({acc} {gate.upper()} {one(cond)})"
    return acc
