"""Read-only query gate + identifier hygiene.

The reference is read-only by default (README.md:29): its defensive rule
bails on Dml/Ddl/Copy plan nodes (crates/sql/src/optimizer/
defensive_trace.rs:31-42) and its Flight update path is a stub
(crates/server/src/flight_sql.rs:576). We enforce the same contract at
the SQL-text gate, before Spark ever parses the statement.

Identifier rules follow crates/sql/src/sql_generator/sanitize.rs:4-36:
reject empty, >128 chars, and any of " \\0 ; ` \\ in identifiers.
"""

from __future__ import annotations

import re

from strake_spark.errors import QueryRejected

# First significant keyword after stripping comments/parens decides.
_READ_KEYWORDS = {"select", "with", "values", "table", "explain", "describe", "show"}
_WRITE_KEYWORDS = {
    "insert", "update", "delete", "merge", "create", "drop", "alter",
    "truncate", "copy", "grant", "revoke", "set", "refresh", "cache",
    "uncache", "load", "analyze", "msck", "use",
}

_COMMENT_RE = re.compile(r"--[^\n]*|/\*.*?\*/", re.S)


def _first_keyword(sql: str) -> str:
    stripped = _COMMENT_RE.sub(" ", sql).lstrip(" \t\r\n(")
    m = re.match(r"[A-Za-z_]+", stripped)
    return m.group(0).lower() if m else ""


def classify_statement(sql: str) -> str:
    """Return 'read' | 'write' | 'unknown' for a SQL statement."""
    if ";" in sql.rstrip().rstrip(";"):
        return "write"  # multi-statement scripts are refused outright
    kw = _first_keyword(sql)
    if kw in _READ_KEYWORDS:
        return "read"
    if kw in _WRITE_KEYWORDS:
        return "write"
    return "unknown"


def ensure_select(sql: str) -> None:
    """Raise QueryRejected unless the statement is read-only."""
    if not sql or not sql.strip():
        raise QueryRejected("empty query")
    kind = classify_statement(sql)
    if kind != "read":
        raise QueryRejected(
            f"read-only engine: statement kind {_first_keyword(sql) or '?'!r} is not allowed"
        )


_BAD_IDENT_CHARS = set('"\x00;`\\')


def sanitize_identifier(ident: str) -> str:
    """Validate an identifier per sanitize.rs:4-36; returns it unchanged."""
    if not ident:
        raise QueryRejected("empty identifier")
    if len(ident) > 128:
        raise QueryRejected(f"identifier too long ({len(ident)} > 128)")
    bad = _BAD_IDENT_CHARS.intersection(ident)
    if bad:
        raise QueryRejected(f"identifier contains forbidden characters: {sorted(bad)!r}")
    return ident
