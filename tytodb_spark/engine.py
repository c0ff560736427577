"""Engine: execute AQL statements against a Warehouse — the in-process
equivalent of the reference's whole network stack (SURVEY §3.1: the
HTTP/AES-GCM protocol layer collapses to `Engine.execute(command, args)`;
the driver talks to PySpark in-process).

SEARCH compiles to one declarative DataFrame expression
(select → filter → unionByName over sources) and Catalyst does the
access-path work the reference hand-rolls (query_type,
src/query_conditions.rs:495-593): pushdown, pruning, reordering.

Cursor statements (QYCNNXT/QYCNPVS/QYCNEXT, src/query.rs:110-214)
page a cached result 100 rows at a time (PAGE_SIZE, src/query.rs:9).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from tytodb_spark.aql import ast
from tytodb_spark.aql.parser import parse
from tytodb_spark.operators.predicates import compile_chain
from tytodb_spark.storage.warehouse import Warehouse

PAGE_SIZE = 100  # reference src/query.rs:9
ROW_NUM = "__tyto_rn"


@dataclass
class Result:
    """Outcome of one statement. ``df`` is set for row-returning
    statements; ``query_id`` for SEARCH (cursor handle)."""

    ok: bool = True
    df: DataFrame | None = None
    query_id: str | None = None
    message: str = ""

    def rows(self) -> list[dict]:
        return [r.asDict(recursive=True) for r in self.df.collect()] if self.df is not None else []


@dataclass
class _Cursor:
    df: DataFrame  # cached, with ROW_NUM column
    n_rows: int
    page: int = 0

    @property
    def n_pages(self) -> int:
        return max(1, -(-self.n_rows // PAGE_SIZE))

    def slice(self) -> DataFrame:
        lo = self.page * PAGE_SIZE
        return self.df.filter(
            (F.col(ROW_NUM) > lo) & (F.col(ROW_NUM) <= lo + PAGE_SIZE)
        ).drop(ROW_NUM)


def keyset_page(
    df: DataFrame,
    keys: list[str],
    after: tuple | None = None,
    page_size: int = PAGE_SIZE,
) -> DataFrame:
    """Seek-based page: ``WHERE (keys...) > after ORDER BY keys LIMIT n``.

    The engine's SCALE path for cursor pagination. The reference
    materializes the whole result and slices by row number
    (src/query.rs:110-214), which this engine mirrors in `_run_search`
    via a row_number window — faithful, but a partition-less Window
    single-tasks at corpus scale. Keyset pagination compiles each page
    to a distributed top-k (TakeOrderedAndProject) over a pushed-down
    composite-key range filter: no Window, no global sort, no cached
    materialization. ``keys`` must be a UNIQUE composite for
    deterministic pages (same contract as the row_number spelling).
    """
    key = F.struct(*[F.col(k) for k in keys])
    if after is not None:
        df = df.filter(key > F.struct(*[F.lit(v) for v in after]))
    return df.orderBy(*keys).limit(page_size)


class KeysetCursor:
    """Forward/backward cursor over ``keyset_page``.

    NEXT seeks past the last key of the current page; PREV re-seeks
    from a stack of page-start boundaries (O(1) bookkeeping, one top-k
    per move — state is just the boundary keys, never the result set,
    so a million-page cursor holds a million tuples at most on the
    driver and nothing on the executors)."""

    def __init__(self, df: DataFrame, keys: list[str], page_size: int = PAGE_SIZE):
        self.df = df
        self.keys = keys
        self.page_size = page_size
        self._starts: list[tuple | None] = [None]  # boundary before page i

    @property
    def page(self) -> int:
        return len(self._starts) - 1

    def current(self) -> DataFrame:
        return keyset_page(self.df, self.keys, self._starts[-1], self.page_size)

    def next(self) -> DataFrame:
        rows = self.current().select(*self.keys).tail(1)
        if rows:
            self._starts.append(tuple(rows[0]))
        return self.current()

    def prev(self) -> DataFrame:
        if len(self._starts) > 1:
            self._starts.pop()
        return self.current()


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse_dir: str,
        external_tables: dict[str, DataFrame] | None = None,
        auto_commit: bool = False,
    ):
        self.spark = spark
        self.warehouse = Warehouse(spark, warehouse_dir, external_tables)
        self._cursors: dict[str, _Cursor] = {}
        #: commit immediately after every CREATE ROW, mirroring the
        #: reference's auto-commit connection setting which commits the
        #: insert before returning (src/database.rs:630-633). EDIT and
        #: DELETE stay staged either way, as in the reference.
        self.auto_commit = auto_commit

    # -- public API -----------------------------------------------------------
    def execute(self, command: str, args: list[str] | None = None) -> Result:
        return self.run(parse(command, args))

    def search_df(self, command: str, args: list[str] | None = None) -> DataFrame:
        """Compile a SEARCH to its full (un-paginated) DataFrame — the
        declarative surface used by declared queries and tests."""
        stmt = parse(command, args)
        if not isinstance(stmt, ast.Search):
            raise ValueError("search_df takes a SEARCH statement")
        return self._compile_search(stmt)

    def search_keyset(
        self,
        command: str,
        args: list[str] | None = None,
        keys: list[str] | None = None,
        page_size: int = PAGE_SIZE,
    ) -> KeysetCursor:
        """Open a SEARCH as a keyset cursor (the scale path; see
        ``keyset_page``). ``keys`` defaults to all projected columns —
        the same all-columns total order `_run_search` uses, so both
        cursor spellings page identically."""
        df = self.search_df(command, args)
        return KeysetCursor(df, keys or list(df.columns), page_size)

    # -- dispatch (reference src/parser.rs:533-550 → database.rs:418-925) -----
    def run(self, stmt: ast.Statement) -> Result:
        if isinstance(stmt, ast.CreateContainer):
            self.warehouse.create_table(stmt.name, stmt.columns)
            return Result(message=f"container {stmt.name!r} created")
        if isinstance(stmt, ast.CreateRow):
            self.warehouse.stage_insert(stmt.container, stmt.columns, stmt.values)
            if self.auto_commit:
                self.warehouse.commit(stmt.container)
                return Result(message="row committed (auto_commit)")
            return Result(message="row staged")
        if isinstance(stmt, ast.Search):
            return self._run_search(stmt)
        if isinstance(stmt, ast.EditRow):
            self.warehouse.stage_edit(
                stmt.container,
                stmt.columns,
                stmt.values,
                (stmt.conditions.conditions, stmt.conditions.gates),
            )
            return Result(message="edit staged")
        if isinstance(stmt, ast.DeleteRow):
            self.warehouse.stage_delete(
                stmt.container, (stmt.conditions.conditions, stmt.conditions.gates)
            )
            return Result(message="delete staged")
        if isinstance(stmt, ast.DeleteContainer):
            self.warehouse.drop_table(stmt.name)
            return Result(message=f"container {stmt.name!r} dropped")
        if isinstance(stmt, ast.Commit):
            self.warehouse.commit(stmt.container)
            return Result(message="committed")
        if isinstance(stmt, ast.Rollback):
            self.warehouse.rollback(stmt.container)
            return Result(message="rolled back")
        if isinstance(stmt, ast.CursorNext):
            return self._cursor_move(stmt.query_id, +1)
        if isinstance(stmt, ast.CursorPrev):
            return self._cursor_move(stmt.query_id, -1)
        if isinstance(stmt, ast.CursorClose):
            cur = self._cursors.pop(stmt.query_id, None)
            if cur is not None:
                cur.df.unpersist()
            return Result(message="cursor closed")
        raise ValueError(f"unhandled statement {stmt!r}")

    # -- SEARCH ---------------------------------------------------------------
    def _compile_search(self, stmt: ast.Search) -> DataFrame:
        dfs = []
        for src in stmt.sources:
            df = self._compile_search(src) if isinstance(src, ast.Search) else self.warehouse.read(src)
            dfs.append(df)
        out = dfs[0]
        for other in dfs[1:]:
            # multi-source merge requires matching column types
            # (reference Query::join, src/query.rs:87-89)
            out = out.unionByName(other)
        if stmt.conditions.conditions:
            out = out.filter(
                compile_chain(stmt.conditions.conditions, stmt.conditions.gates)
            )
        if stmt.columns:
            out = out.select(*stmt.columns)  # intended N1 semantics (SURVEY §8)
        return out

    def _run_search(self, stmt: ast.Search) -> Result:
        df = self._compile_search(stmt)
        # Cursor order: all-columns ascending stands in for the reference's
        # storage order (slot order ≈ first-column index order) and makes
        # paging deterministic even with duplicate lead values.
        numbered = df.withColumn(
            ROW_NUM, F.row_number().over(W.orderBy(*[F.col(c) for c in df.columns]))
        ).cache()
        n = numbered.count()
        qid = uuid.uuid4().hex[:16]
        cur = _Cursor(df=numbered, n_rows=n)
        self._cursors[qid] = cur
        return Result(df=cur.slice(), query_id=qid, message=f"{n} rows, {cur.n_pages} pages")

    def _cursor_move(self, qid: str, delta: int) -> Result:
        cur = self._cursors.get(qid)
        if cur is None:
            return Result(ok=False, message=f"no such query {qid!r}")
        cur.page = min(max(cur.page + delta, 0), cur.n_pages - 1)
        return Result(df=cur.slice(), query_id=qid, message=f"page {cur.page + 1}/{cur.n_pages}")
