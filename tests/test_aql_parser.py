"""Parser golden tests — every statement form of the grammar
(reference src/main.rs:69-89), incl. ? binding and §-bytes literals."""

import pytest

from tytodb_spark.aql import ast
from tytodb_spark.aql.parser import ParseError, parse


def test_create_container():
    s = parse("CREATE CONTAINER 'users' [id, name, score] [INT, SMALL-STRING, FLOAT]")
    assert s == ast.CreateContainer(
        "users", [("id", "INT"), ("name", "SMALL-STRING"), ("score", "FLOAT")]
    )


def test_create_row():
    s = parse("CREATE ROW [id, name] [1, 'ana'] ON 'users'")
    assert s == ast.CreateRow("users", ["id", "name"], [1, "ana"])


def test_create_row_bytes_literal():
    s = parse("CREATE ROW [id, blob] [1, §aGVsbG8=] ON 'users'")
    assert s.values == [1, b"hello"]


def test_search_simple():
    s = parse("SEARCH ON 'users'")
    assert s == ast.Search(["users"])


def test_search_full():
    s = parse(
        "SEARCH [id, name] ON ['users', 'users2'] WHERE id > 5 AND name &> 'an' OR score <= 1.5"
    )
    assert s.columns == ["id", "name"]
    assert s.sources == ["users", "users2"]
    assert s.conditions.conditions == [
        ("id", ">", 5),
        ("name", "&>", "an"),
        ("score", "<=", 1.5),
    ]
    assert s.conditions.gates == ["AND", "OR"]


def test_search_subquery_source():
    s = parse("SEARCH ON [(SEARCH ON 'users' WHERE id >= 10), 'users2']")
    assert isinstance(s.sources[0], ast.Search)
    assert s.sources[0].conditions.conditions == [("id", ">=", 10)]
    assert s.sources[1] == "users2"


def test_search_regex_and_bool():
    s = parse("SEARCH ON 'users' WHERE name &&&> '^A.*a$' AND ok = true")
    assert s.conditions.conditions == [("name", "&&&>", "^A.*a$"), ("ok", "=", True)]


def test_edit_row():
    s = parse("EDIT ROW [score] [9.5] ON 'users' WHERE id == 3")
    assert s == ast.EditRow("users", ["score"], [9.5], ast.ConditionChain([("id", "==", 3)], []))


def test_delete_row():
    s = parse("DELETE ROW ON 'users' WHERE score < 0")
    assert s.container == "users"
    assert s.conditions.conditions == [("score", "<", 0)]


def test_delete_row_unconditional():
    s = parse("DELETE ROW ON 'users'")
    assert s.conditions.conditions == []


def test_delete_container():
    assert parse("DELETE CONTAINER 'users'") == ast.DeleteContainer("users")


def test_commit_rollback():
    assert parse("COMMIT") == ast.Commit(None)
    assert parse("COMMIT 'users'") == ast.Commit("users")
    assert parse("ROLLBACK") == ast.Rollback(None)
    assert parse("ROLLBACK 'users'") == ast.Rollback("users")


def test_cursors():
    assert parse("QYCNNXT 'abc'") == ast.CursorNext("abc")
    assert parse("QYCNPVS 'abc'") == ast.CursorPrev("abc")
    assert parse("QYCNEXT 'abc'") == ast.CursorClose("abc")


def test_argument_binding():
    s = parse("SEARCH ON 'users' WHERE id > ? AND name = ?", args=["42", "'bob'"])
    assert s.conditions.conditions == [("id", ">", 42), ("name", "=", "bob")]


def test_argument_binding_in_group():
    s = parse("CREATE ROW [id, name] [?, ?] ON 'users'", args=["7", "'zoe'"])
    assert s.values == [7, "zoe"]


def test_argument_arity_errors():
    with pytest.raises(ValueError):
        parse("SEARCH ON 'users' WHERE id > ?", args=[])
    with pytest.raises(ValueError):
        parse("SEARCH ON 'users' WHERE id > ?", args=["1", "2"])


def test_negative_literal_intended_semantics():
    # the reference lexes -5 as +5 (double sign flip,
    # src/lexer_functions.rs:230-273) — we implement intended semantics
    s = parse("SEARCH ON 'users' WHERE score > -5")
    assert s.conditions.conditions == [("score", ">", -5)]


def test_comment():
    s = parse("SEARCH ON 'users' -- trailing comment\nWHERE id = 1")
    assert s.conditions.conditions == [("id", "=", 1)]


def test_parse_errors():
    for bad in [
        "CREATE CONTAINER 'x' [a] [NOT-A-TYPE]",
        "CREATE ROW [a, b] [1] ON 'x'",
        "SEARCH 'x'",
        "FROBNICATE 'x'",
        "SEARCH ON [(CREATE CONTAINER 'y' [a] [INT])]",
    ]:
        with pytest.raises(ParseError):
            parse(bad)
