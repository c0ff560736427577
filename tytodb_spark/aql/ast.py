"""AQL AST (counterpart of reference src/main.rs:90-168)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Union

# Conditions: flat triples chained by AND/OR gates, no precedence
# (reference src/main.rs:142-147: triple list + gate list).
Condition = tuple[str, str, object]  # (column, op, literal)


@dataclass
class ConditionChain:
    conditions: list[Condition] = field(default_factory=list)
    gates: list[str] = field(default_factory=list)  # "AND" | "OR"


@dataclass
class CreateContainer:
    name: str
    columns: list[tuple[str, str]]  # (col_name, ALBA type)


@dataclass
class CreateRow:
    container: str
    columns: list[str]
    values: list[object]


@dataclass
class Search:
    sources: list[Union[str, "Search"]]  # container names or sub-searches
    conditions: ConditionChain = field(default_factory=ConditionChain)
    columns: list[str] | None = None  # None → all (intended N1 semantics)


@dataclass
class EditRow:
    container: str
    columns: list[str]
    values: list[object]
    conditions: ConditionChain = field(default_factory=ConditionChain)


@dataclass
class DeleteRow:
    container: str
    conditions: ConditionChain = field(default_factory=ConditionChain)


@dataclass
class DeleteContainer:
    name: str


@dataclass
class Commit:
    container: str | None = None


@dataclass
class Rollback:
    container: str | None = None


@dataclass
class CursorNext:
    query_id: str


@dataclass
class CursorPrev:
    query_id: str


@dataclass
class CursorClose:
    query_id: str


Statement = Union[
    CreateContainer,
    CreateRow,
    Search,
    EditRow,
    DeleteRow,
    DeleteContainer,
    Commit,
    Rollback,
    CursorNext,
    CursorPrev,
    CursorClose,
]
