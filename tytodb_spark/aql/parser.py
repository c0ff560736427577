"""AQL recursive-descent parser (counterpart of reference
src/parser.rs:56-588 dispatch at :533-550 — behavior, not mechanism).
"""

from __future__ import annotations

from tytodb_spark.aql import ast
from tytodb_spark.aql.lexer import Token, bind_arguments, lex
from tytodb_spark.functions.tyto import ALBA_TYPES


class ParseError(ValueError):
    pass


def parse(command: str, args: list[str] | None = None) -> ast.Statement:
    tokens = lex(command)
    if args:
        tokens = bind_arguments(tokens, list(args))
    return parse_tokens(tokens)


def parse_tokens(tokens: list[Token]) -> ast.Statement:
    p = _P(tokens)
    head = p.expect("keyword")
    if head == "CREATE":
        kind = p.expect("keyword")
        if kind == "CONTAINER":
            return _create_container(p)
        if kind == "ROW":
            return _create_row(p)
        raise ParseError(f"CREATE {kind}?")
    if head == "SEARCH":
        return _search(p)
    if head == "EDIT":
        p.expect("keyword", "ROW")
        return _edit(p)
    if head == "DELETE":
        kind = p.expect("keyword")
        if kind == "ROW":
            return _delete_row(p)
        if kind == "CONTAINER":
            return ast.DeleteContainer(p.expect("string"))
        raise ParseError(f"DELETE {kind}?")
    if head == "COMMIT":
        return ast.Commit(p.take("string"))
    if head == "ROLLBACK":
        return ast.Rollback(p.take("string"))
    if head == "QYCNNXT":
        return ast.CursorNext(p.expect("string"))
    if head == "QYCNPVS":
        return ast.CursorPrev(p.expect("string"))
    if head == "QYCNEXT":
        return ast.CursorClose(p.expect("string"))
    raise ParseError(f"unknown statement head {head!r}")


class _P:
    def __init__(self, tokens: list[Token]):
        self.tokens = tokens
        self.i = 0

    def peek(self) -> Token | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> Token:
        t = self.peek()
        if t is None:
            raise ParseError("unexpected end of command")
        self.i += 1
        return t

    def expect(self, kind: str, value=None):
        t = self.next()
        if t.kind != kind or (value is not None and t.value != value):
            raise ParseError(f"expected {kind}{'=' + str(value) if value else ''}, got {t!r}")
        return t.items if kind in ("group", "subcommand") else t.value

    def take(self, kind: str):
        """Optionally consume a token of ``kind``; None if absent."""
        t = self.peek()
        if t is not None and t.kind == kind:
            self.i += 1
            return t.value
        return None

    def done(self) -> bool:
        return self.i >= len(self.tokens)


def _split_group(items: list[Token]) -> list[list[Token]]:
    """Split a group's token list on commas."""
    parts: list[list[Token]] = [[]]
    for t in items:
        if t.kind == "comma":
            parts.append([])
        else:
            parts[-1].append(t)
    return [p for p in parts if p]


def _names(items: list[Token]) -> list[str]:
    out = []
    for part in _split_group(items):
        if len(part) != 1 or part[0].kind not in ("name", "string"):
            raise ParseError(f"expected a name, got {part!r}")
        out.append(part[0].value)
    return out


def _values(items: list[Token]) -> list[object]:
    out = []
    for part in _split_group(items):
        if len(part) != 1 or part[0].kind not in ("string", "int", "float", "bool", "bytes"):
            raise ParseError(f"expected a literal, got {part!r}")
        out.append(part[0].value)
    return out


def _create_container(p: _P) -> ast.CreateContainer:
    name = p.expect("string")
    cols = _names(p.expect("group"))
    types = [t.upper() for t in _names(p.expect("group"))]
    if len(cols) != len(types):
        raise ParseError(f"{len(cols)} column names vs {len(types)} types")
    for t in types:
        if t not in ALBA_TYPES:
            raise ParseError(f"unknown type {t!r}")
    return ast.CreateContainer(name, list(zip(cols, types)))


def _create_row(p: _P) -> ast.CreateRow:
    cols = _names(p.expect("group"))
    vals = _values(p.expect("group"))
    if len(cols) != len(vals):
        raise ParseError(f"{len(cols)} columns vs {len(vals)} values")
    p.expect("keyword", "ON")
    return ast.CreateRow(p.expect("string"), cols, vals)


def _conditions(p: _P) -> ast.ConditionChain:
    """WHERE chain: triples joined by AND/OR, left-fold, no parens
    (reference src/parser.rs:327-388)."""
    chain = ast.ConditionChain()
    if p.done():
        return chain
    t = p.peek()
    if not (t.kind == "keyword" and t.value == "WHERE"):
        return chain
    p.next()
    while True:
        col = p.next()
        if col.kind not in ("name", "string"):
            raise ParseError(f"expected column name, got {col!r}")
        op = p.expect("op")
        lit = p.next()
        if lit.kind not in ("string", "int", "float", "bool", "bytes"):
            raise ParseError(f"expected literal, got {lit!r}")
        chain.conditions.append((col.value, op, lit.value))
        nxt = p.peek()
        if nxt is None or nxt.kind != "keyword" or nxt.value not in ("AND", "OR"):
            break
        chain.gates.append(p.next().value)
    return chain


def _search(p: _P) -> ast.Search:
    columns: list[str] | None = None
    if p.peek() is not None and p.peek().kind == "group":
        columns = _names(p.expect("group"))
        if columns == ["*"]:
            columns = None
    p.expect("keyword", "ON")
    t = p.next()
    sources: list[str | ast.Search] = []
    if t.kind == "group":
        for part in _split_group(t.items):
            if len(part) == 1 and part[0].kind == "string":
                sources.append(part[0].value)
            elif len(part) == 1 and part[0].kind == "subcommand":
                sub = parse_tokens(part[0].items)
                if not isinstance(sub, ast.Search):
                    raise ParseError("subcommand source must be a SEARCH")
                sources.append(sub)
            else:
                raise ParseError(f"bad source {part!r}")
    elif t.kind == "string":
        sources.append(t.value)
    elif t.kind == "subcommand":
        sub = parse_tokens(t.items)
        if not isinstance(sub, ast.Search):
            raise ParseError("subcommand source must be a SEARCH")
        sources.append(sub)
    else:
        raise ParseError(f"bad SEARCH source {t!r}")
    if not sources:
        raise ParseError("SEARCH needs at least one source")
    return ast.Search(sources, _conditions(p), columns)


def _edit(p: _P) -> ast.EditRow:
    cols = _names(p.expect("group"))
    vals = _values(p.expect("group"))
    if len(cols) != len(vals):
        raise ParseError(f"{len(cols)} columns vs {len(vals)} values")
    p.expect("keyword", "ON")
    container = p.expect("string")
    return ast.EditRow(container, cols, vals, _conditions(p))


def _delete_row(p: _P) -> ast.DeleteRow:
    p.expect("keyword", "ON")
    container = p.expect("string")
    return ast.DeleteRow(container, _conditions(p))
