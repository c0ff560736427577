"""AQL lexer (counterpart of reference src/main.rs:20-67 +
src/lexer_functions.rs:57-456 — behavior reproduced, mechanism new).

Produces a flat token stream; groups ``[...]`` and subcommands ``(...)``
are nested token lists (the reference does the same: Token::Group /
Token::SubCommand, src/lexer_functions.rs:8-19).

Note: the reference's negative-literal lexing is buggy (sign applied
twice so ``-5`` lexes as ``+5`` — src/lexer_functions.rs:230-273;
SURVEY §8). We lex negatives conventionally.
"""

from __future__ import annotations

import base64
import re
from dataclasses import dataclass, field
from typing import Any

KEYWORDS = {
    "CREATE",
    "ROW",
    "CONTAINER",
    "SEARCH",
    "EDIT",
    "DELETE",
    "ON",
    "WHERE",
    "AND",
    "OR",
    "COMMIT",
    "ROLLBACK",
    "QYCNNXT",
    "QYCNPVS",
    "QYCNEXT",
}

# Longest-match first for multi-char operators.
OPERATORS = ["&&&>", "&&>", "&>", ">=", "<=", "==", "!=", "=", ">", "<"]


@dataclass
class Token:
    kind: str  # keyword|name|string|int|float|bool|bytes|op|group|subcommand|argument|comma
    value: Any = None
    items: list = field(default_factory=list)  # for group/subcommand

    def __repr__(self):  # compact for golden tests
        if self.kind in ("group", "subcommand"):
            return f"{self.kind}({self.items!r})"
        return f"{self.kind}:{self.value!r}"


_NUM_RE = re.compile(r"-?\d+(\.\d+)?")
# hyphen allowed inside words for the hyphenated type names
# (NANO-STRING, SMALL-BYTES, ... — src/alba_types.rs:44-89); numeric
# literals are matched before words, so `-5` still lexes as a number.
_WORD_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_#.]*(?:-[A-Za-z][A-Za-z0-9_]*)*")
_B64_RE = re.compile(r"§([A-Za-z0-9+/=]+)")


class LexError(ValueError):
    pass


def lex(text: str) -> list[Token]:
    tokens, pos = _lex_until(text, 0, terminator=None)
    return tokens


def _lex_until(text: str, pos: int, terminator: str | None) -> tuple[list[Token], int]:
    out: list[Token] = []
    n = len(text)
    while pos < n:
        ch = text[pos]
        if ch.isspace():
            pos += 1
            continue
        if text.startswith("--", pos):  # line comment
            nl = text.find("\n", pos)
            pos = n if nl < 0 else nl + 1
            continue
        if terminator and ch == terminator:
            return out, pos + 1
        if ch == "[":
            inner, pos = _lex_until(text, pos + 1, "]")
            out.append(Token("group", items=inner))
            continue
        if ch == "(":
            inner, pos = _lex_until(text, pos + 1, ")")
            out.append(Token("subcommand", items=inner))
            continue
        if ch == ",":
            out.append(Token("comma"))
            pos += 1
            continue
        if ch == "?":
            out.append(Token("argument"))
            pos += 1
            continue
        if ch == "'":
            end = text.find("'", pos + 1)
            if end < 0:
                raise LexError(f"unterminated string literal at {pos}")
            out.append(Token("string", text[pos + 1 : end]))
            pos = end + 1
            continue
        if ch == "§":
            m = _B64_RE.match(text, pos)
            if not m:
                raise LexError(f"bad bytes literal at {pos}")
            out.append(Token("bytes", base64.b64decode(m.group(1))))
            pos = m.end()
            continue
        op = next((o for o in OPERATORS if text.startswith(o, pos)), None)
        if op:
            out.append(Token("op", op))
            pos += len(op)
            continue
        m = _NUM_RE.match(text, pos)
        if m:
            s = m.group(0)
            out.append(Token("float", float(s)) if "." in s else Token("int", int(s)))
            pos = m.end()
            continue
        m = _WORD_RE.match(text, pos)
        if m:
            w = m.group(0)
            up = w.upper()
            if up in ("TRUE", "FALSE"):
                out.append(Token("bool", up == "TRUE"))
            elif up in KEYWORDS:
                out.append(Token("keyword", up))
            else:
                out.append(Token("name", w))
            pos = m.end()
            continue
        raise LexError(f"unexpected character {ch!r} at {pos}")
    if terminator:
        raise LexError(f"unterminated {terminator!r} block")
    return out, pos


def bind_arguments(tokens: list[Token], args: list[str]) -> list[Token]:
    """Splice lexed argument strings into ``?`` slots, recursively through
    groups/subcommands (reference replace_arguments, src/parser.rs:591-652:
    each argument string must lex to exactly one token)."""
    it = iter(args)

    def walk(ts: list[Token]) -> list[Token]:
        out = []
        for t in ts:
            if t.kind == "argument":
                try:
                    raw = next(it)
                except StopIteration:
                    raise LexError("fewer arguments than ? placeholders") from None
                sub = lex(raw)
                if len(sub) != 1:
                    raise LexError(f"argument {raw!r} must lex to exactly one token")
                out.append(sub[0])
            elif t.kind in ("group", "subcommand"):
                out.append(Token(t.kind, items=walk(t.items)))
            else:
                out.append(t)
        return out

    result = walk(tokens)
    if next(it, None) is not None:
        raise LexError("more arguments than ? placeholders")
    return result
