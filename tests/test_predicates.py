"""Predicate-layer unit tests: operator semantics + left-fold gate
associativity (reference src/query_conditions.rs:482-487), checked
against a plain-Python fold, including hypothesis-generated chains."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tytodb_spark.operators.predicates import chain_to_sql, compile_chain, compile_condition

ROWS = [
    {"a": 1, "s": "Alpha", "f": 0.5},
    {"a": 5, "s": "beta", "f": 2.5},
    {"a": 9, "s": "GAMMA ray", "f": -1.0},
    {"a": 12, "s": "delta", "f": 9.9},
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS)


def _ids(df):
    return sorted(r["a"] for r in df.collect())


@pytest.mark.parametrize(
    "cond,expected",
    [
        (("a", "=", 5), [5]),
        (("a", "==", 5), [5]),
        (("a", "!=", 5), [1, 9, 12]),
        (("a", ">", 5), [9, 12]),
        (("a", "<", 5), [1]),
        (("a", ">=", 5), [5, 9, 12]),
        (("a", "<=", 5), [1, 5]),
        (("s", "&>", "eta"), [5]),
        (("s", "&&>", "GAMMA"), [9]),
        (("s", "&&&>", "^[A-Z]+ "), [9]),
    ],
)
def test_operators(df, cond, expected):
    assert _ids(df.filter(compile_condition(*cond))) == expected


def test_left_fold_not_sql_precedence(df):
    # a=1 OR a=5 AND f>1.0  → left fold: ((a=1 OR a=5) AND f>1.0) = {5}
    # SQL precedence would give: a=1 OR (a=5 AND f>1.0) = {1, 5}
    conds = [("a", "=", 1), ("a", "=", 5), ("f", ">", 1.0)]
    assert _ids(df.filter(compile_chain(conds, ["OR", "AND"]))) == [5]


def test_empty_chain_is_true(df):
    assert _ids(df.filter(compile_chain([], []))) == [1, 5, 9, 12]


def test_arity_mismatch():
    with pytest.raises(ValueError):
        compile_chain([("a", "=", 1), ("a", "=", 2)], [])


def _py_eval(row, conds, gates):
    def one(c):
        col, op, v = c
        x = row[col]
        return {
            "=": lambda: x == v,
            "==": lambda: x == v,
            "!=": lambda: x != v,
            ">": lambda: x > v,
            "<": lambda: x < v,
            ">=": lambda: x >= v,
            "<=": lambda: x <= v,
        }[op]()

    acc = one(conds[0])
    for g, c in zip(gates, conds[1:]):
        acc = (acc and one(c)) if g == "AND" else (acc or one(c))
    return acc


@settings(max_examples=25, deadline=None)
@given(
    chain=st.lists(
        st.tuples(
            st.sampled_from(["a", "f"]),
            st.sampled_from(["=", "!=", ">", "<", ">=", "<="]),
            st.integers(-2, 13),
        ),
        min_size=1,
        max_size=5,
    ),
    gates=st.lists(st.sampled_from(["AND", "OR"]), min_size=4, max_size=4),
)
def test_fold_matches_python_reference(spark, chain, gates):
    df = spark.createDataFrame(ROWS)
    gates = gates[: len(chain) - 1]
    got = sorted(r["a"] for r in df.filter(compile_chain(chain, gates)).collect())
    want = sorted(r["a"] for r in ROWS if _py_eval(r, chain, gates))
    assert got == want


def test_chain_to_sql_parenthesization():
    sql = chain_to_sql([("a", "=", 1), ("b", ">", 2), ("c", "&>", "x")], ["OR", "AND"])
    assert sql == "((a = 1 OR b > 2) AND contains(c, 'x'))"
