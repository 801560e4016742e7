"""Shared remote-SQL machinery for SQL-speaking Python DataSources.

Re-expresses the reference's scan-level pushdown surface
(crates/connectors/src/sources/file.rs filter pushdown flags;
crates/sql/src/sql_generator/expr.rs literal/operator rendering;
identifier safety per crates/sql/src/sql_generator/sanitize.rs:4-36):
identifier/literal quoting, SELECT composition, and numeric range
partition planning that mirrors Spark's own JDBC partitioning — split a
``partition_column`` into N half-open ranges so N executors read
concurrently (the property that matters at 100 TB, where a driver-side
fetch would serialize the scan).

``filter_to_sql``/``split_filters`` translate Catalyst ``Filter``
objects to remote WHERE text. They are NOT wired into
``DataSourceReader.pushFilters``: Spark's PythonDataSourceV2 caches one
mutable read plan per shared provider, so per-scan filter state corrupts
self-joins and filtered-then-unfiltered sequences (see DuckDBReader).
They serve explicit ``where`` options and will plug straight back into
pushFilters when upstream keys the read plan by scan.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql.datasource import (
    EqualNullSafe,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from strake_spark.errors import SourceError

_BAD_IDENT_CHARS = set('"\0;`\\')


def quote_ident(name: str) -> str:
    """Double-quote an identifier after the reference's safety checks
    (sanitize.rs:4-36: reject empty, >128 chars, quote/NUL/semicolon/
    backtick/backslash)."""
    if not name or len(name) > 128 or any(c in _BAD_IDENT_CHARS for c in name):
        raise SourceError(f"unsafe identifier: {name!r}")
    return f'"{name}"'


def sql_literal(value) -> str:
    """Self-contained SQL literal. Rejects what has no portable safe
    encoding: NUL inside strings (terminates literals in several
    engines — hypothesis-found injection surface) and binary values
    (X'..' hex is not universal; DuckDB parses it as a string). Callers
    treat SourceError as 'keep this predicate local'."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, int):
        return repr(value)
    if isinstance(value, float):
        # quoted-string route: a bare decimal literal parses as DECIMAL
        # in some engines, and DECIMAL->DOUBLE casts are not always
        # correctly rounded (hypothesis-found ULP drift in DuckDB);
        # string->double parsing is correctly rounded everywhere
        return f"CAST('{value!r}' AS DOUBLE PRECISION)"
    if isinstance(value, _dt.datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    if isinstance(value, _dt.date):
        return f"DATE '{value.isoformat()}'"
    if isinstance(value, (bytes, bytearray)):
        raise SourceError("binary literals are not portable; not pushed")
    s = str(value)
    if "\x00" in s:
        raise SourceError("NUL in string literal; not pushed")
    return "'" + s.replace("'", "''") + "'"


def _col(f: Filter) -> str:
    # ColumnPath is a tuple of name parts; nested attrs join with '.'
    return ".".join(quote_ident(p) for p in f.attribute)


def _like_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_").replace("'", "''")


def filter_to_sql(f: Filter) -> str | None:
    """One Catalyst Filter -> SQL predicate text, or None if
    untranslatable (unknown filter class, or a value with no safe
    portable literal)."""
    try:
        return _filter_to_sql(f)
    except SourceError:
        return None


def _filter_to_sql(f: Filter) -> str | None:
    if isinstance(f, EqualTo):
        return f"{_col(f)} = {sql_literal(f.value)}"
    if isinstance(f, EqualNullSafe):
        return f"{_col(f)} IS NOT DISTINCT FROM {sql_literal(f.value)}"
    if isinstance(f, GreaterThan):
        return f"{_col(f)} > {sql_literal(f.value)}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{_col(f)} >= {sql_literal(f.value)}"
    if isinstance(f, LessThan):
        return f"{_col(f)} < {sql_literal(f.value)}"
    if isinstance(f, LessThanOrEqual):
        return f"{_col(f)} <= {sql_literal(f.value)}"
    if isinstance(f, In):
        vals = ", ".join(sql_literal(v) for v in f.value)
        return f"{_col(f)} IN ({vals})"
    if isinstance(f, IsNull):
        return f"{_col(f)} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{_col(f)} IS NOT NULL"
    if isinstance(f, StringContains):
        return f"{_col(f)} LIKE '%{_like_escape(f.value)}%' ESCAPE '\\'"
    if isinstance(f, StringStartsWith):
        return f"{_col(f)} LIKE '{_like_escape(f.value)}%' ESCAPE '\\'"
    if isinstance(f, StringEndsWith):
        return f"{_col(f)} LIKE '%{_like_escape(f.value)}' ESCAPE '\\'"
    if isinstance(f, Not):
        inner = filter_to_sql(f.child)
        return None if inner is None else f"NOT ({inner})"
    return None


def split_filters(filters: list[Filter]) -> tuple[list[str], list[Filter]]:
    """-> (pushable predicate texts, filters Spark must still apply)."""
    pushed: list[str] = []
    remaining: list[Filter] = []
    for f in filters:
        sql = filter_to_sql(f)
        if sql is None:
            remaining.append(f)
        else:
            pushed.append(sql)
    return pushed, remaining


def build_select(
    table_sql: str,
    columns: list[str] | None,
    predicates: list[str],
    extra_predicate: str | None = None,
    limit: int | None = None,
) -> str:
    """Compose the remote scan query. ``table_sql`` is either a quoted
    table name or a parenthesized subquery."""
    cols = ", ".join(quote_ident(c) for c in columns) if columns else "*"
    sql = f"SELECT {cols} FROM {table_sql}"
    preds = list(predicates)
    if extra_predicate:
        preds.append(extra_predicate)
    if preds:
        sql += " WHERE " + " AND ".join(f"({p})" for p in preds)
    if limit is not None:
        sql += f" LIMIT {int(limit)}"
    return sql


@dataclass(frozen=True)
class RangePartition:
    """Half-open numeric range predicate (NULLs ride with the first slice),
    same contract as Spark's JDBC partitioning."""

    column: str
    lower: float | int | None  # None => unbounded below (also catches NULL)
    upper: float | int | None  # None => unbounded above

    def predicate(self) -> str | None:
        c = quote_ident(self.column)
        if self.lower is None and self.upper is None:
            return None
        if self.lower is None:
            return f"{c} < {sql_literal(self.upper)} OR {c} IS NULL"
        if self.upper is None:
            return f"{c} >= {sql_literal(self.lower)}"
        return f"{c} >= {sql_literal(self.lower)} AND {c} < {sql_literal(self.upper)}"


def plan_ranges(column: str, lo, hi, n: int) -> list[RangePartition]:
    """Split [lo, hi] into n contiguous ranges, unbounded at both ends so
    no row is ever lost to stale min/max statistics."""
    if lo is None or hi is None or n <= 1 or lo >= hi:
        return [RangePartition(column, None, None)]
    step = (hi - lo) / n
    bounds = [lo + step * i for i in range(1, n)]
    if isinstance(lo, int) and isinstance(hi, int):
        bounds = sorted({int(b) for b in bounds})
    parts: list[RangePartition] = []
    prev = None
    for b in bounds:
        parts.append(RangePartition(column, prev, b))
        prev = b
    parts.append(RangePartition(column, prev, None))
    return parts
