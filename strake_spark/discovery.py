"""Schema discovery & search.

Reference: the MCP tools ``search_schemas(query)`` /
``get_schema_details(fqn)`` (python/strake/mcp.py:173-257) backed by a
full-text index over information_schema columns + table/column comments
(python/strake/search.py:29-160, LanceDB FTS; metadata enrichment
python/strake/metadata.py:42-260).

Spark design: the index is SQLite FTS5 (stdlib — no vendored deps) over
``spark.catalog`` metadata: one document per column with table name,
column name, type, and source provenance. Rebuilt on demand; queries
are ranked by BM25. At 100 TB the catalog is still small metadata —
driver-side FTS is the right scale point (the reference does the same)."""

from __future__ import annotations

import sqlite3
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass
class ColumnHit:
    table: str
    column: str
    type: str
    source: str
    score: float
    comment: str = ""


def _duckdb_comments(url: str) -> dict[tuple[str, str | None], str]:
    """Table + column comments from a DuckDB catalog
    (COMMENT ON TABLE/COLUMN — duckdb_tables()/duckdb_columns() expose
    them; reference metadata.py dialect-strategy equivalent)."""
    import duckdb

    con = duckdb.connect(url, read_only=True)
    try:
        out: dict[tuple[str, str | None], str] = {}
        for tname, comment in con.execute(
            "SELECT table_name, comment FROM duckdb_tables() WHERE comment IS NOT NULL"
        ).fetchall():
            out[(tname, None)] = comment
        for tname, cname, comment in con.execute(
            "SELECT table_name, column_name, comment FROM duckdb_columns() "
            "WHERE comment IS NOT NULL"
        ).fetchall():
            out[(tname, cname)] = comment
        return out
    finally:
        con.close()


def _sqlite_comments(url: str) -> dict[tuple[str, str | None], str]:
    """Best-effort inline `-- comment` parse from CREATE TABLE DDL
    (SQLite has no first-class comments; reference metadata.py:212-240
    does the same sqlite_master regex walk)."""
    import re

    path = url[len("sqlite://"):] if url.startswith("sqlite://") else url
    con = sqlite3.connect(path)
    try:
        out: dict[tuple[str, str | None], str] = {}
        for tname, ddl in con.execute(
            "SELECT name, sql FROM sqlite_master WHERE type='table' AND sql IS NOT NULL"
        ).fetchall():
            for line in ddl.splitlines():
                m = re.search(r"([A-Za-z0-9_]+)\s+[^,]*,?\s*--\s*(.+)$", line.strip())
                if m:
                    out[(tname, m.group(1))] = m.group(2).strip()
        return out
    finally:
        con.close()


_COMMENT_FETCHERS = {"duckdb": _duckdb_comments, "sqlite": _sqlite_comments}


class SchemaIndex:
    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark
        self._con: sqlite3.Connection | None = None

    def rebuild(self) -> int:
        """(Re)index every temp view / table in the session catalog.
        Returns the number of column documents indexed.

        Comment enrichment (reference python/strake/metadata.py:42-260):
        column/table comments are pulled per source — Spark StructField
        metadata for local views, duckdb_tables()/duckdb_columns() for
        DuckDB, DDL-parsed `--` comments for SQLite — and indexed as an
        FTS field, so a search on business terms ('customer segment')
        ranks the commented column even when the physical name
        ('c_mktsegment') shares no token with the query."""
        from strake_spark.sources.registry import REMOTE_TABLES

        con = sqlite3.connect(":memory:")
        con.execute(
            "CREATE VIRTUAL TABLE cols USING fts5(tbl, col, typ, src, doc)"
        )
        comment_cache: dict[str, dict[tuple[str, str | None], str]] = {}
        n = 0
        for t in self.spark.catalog.listTables():
            name = t.name
            try:
                schema = self.spark.table(name).schema
            except Exception:
                continue
            remote = REMOTE_TABLES.get(name)
            src = remote.context() if remote else (t.tableType or "view")
            comments: dict[tuple[str, str | None], str] = {}
            if remote is not None and remote.dialect in _COMMENT_FETCHERS:
                key = f"{remote.dialect}:{remote.url}"
                if key not in comment_cache:
                    try:
                        comment_cache[key] = _COMMENT_FETCHERS[remote.dialect](remote.url)
                    except Exception:
                        comment_cache[key] = {}  # unreachable source: index names only
                comments = comment_cache[key]
            table_comment = comments.get((remote.table, None), "") if remote else ""
            for f in schema.fields:
                col_comment = (
                    comments.get((remote.table, f.name), "") if remote else ""
                ) or str(f.metadata.get("comment", "") if f.metadata else "")
                # "column | table" — the '|' is ignored by the fts5
                # tokenizer (no match/rank impact) but lets search()'s
                # description_scope split the halves unambiguously
                doc = (
                    f"{col_comment} | {table_comment}"
                    if (col_comment or table_comment)
                    else ""
                )
                con.execute(
                    "INSERT INTO cols VALUES (?,?,?,?,?)",
                    (name, f.name, f.dataType.simpleString(), src, doc),
                )
                n += 1
        con.commit()
        if self._con is not None:
            self._con.close()
        self._con = con
        return n

    def search(
        self,
        query: str,
        limit: int = 20,
        include_descriptions: bool = True,
        description_scope: str = "all",
        max_description_length: int = 100,
    ) -> list[ColumnHit]:
        """BM25-ranked column search; '*' suffix expansion applied to
        bare terms so 'cust' finds 'c_custkey'. Comment text ('doc')
        participates in matching and ranking regardless of the output
        knobs below — scoping controls what the CALLER sees, not what
        the index matches (reference search.py:154-213 semantics).

        include_descriptions / description_scope ('all' | 'tables_only'
        | 'none') / max_description_length mirror the reference's
        search_tables output controls: agent callers budget tokens by
        trimming or dropping description text from results."""
        if self._con is None:
            self.rebuild()
        terms = [t for t in query.replace("'", " ").split() if t]
        if not terms:
            return []
        if description_scope not in ("all", "tables_only", "none"):
            raise ValueError(
                f"description_scope must be all|tables_only|none, got "
                f"{description_scope!r}"
            )
        fts = " OR ".join(f'"{t}"*' for t in terms)
        rows = self._con.execute(
            "SELECT tbl, col, typ, src, doc, rank FROM cols "
            "WHERE cols MATCH ? ORDER BY rank LIMIT ?",
            (fts, limit),
        ).fetchall()

        def _doc(text: str) -> str:
            if not include_descriptions or description_scope == "none":
                return ""
            # the doc field is "column | table" (see rebuild);
            # tables_only keeps the table half (reference blanks
            # column_description and keeps table_description). Re-join
            # only the non-empty halves so a missing half never leaks a
            # stray '|' to the caller
            halves = [h.strip() for h in text.split("|", 1)]
            if description_scope == "tables_only":
                halves = halves[1:]
            text = " | ".join(h for h in halves if h)
            if len(text) > max_description_length:
                cut = text[:max_description_length]
                # a cut landing on the " | " separator would leak a
                # dangling pipe — drop it (plain mid-word cuts keep
                # their exact length, same as before)
                if cut.rstrip().endswith("|"):
                    cut = cut.rstrip().rstrip("|").rstrip()
                return cut + "..."
            return text

        return [
            ColumnHit(r[0], r[1], r[2], r[3], -float(r[5]), comment=_doc(r[4]))
            for r in rows
        ]


def register_information_schema(spark: SparkSession) -> list[str]:
    """Emulate information_schema over the session catalog (the
    reference turns on DataFusion's with_information_schema,
    crates/runtime/src/federation.rs:176). Registers
    ``information_schema_tables`` / ``information_schema_columns`` temp
    views; call again after registering sources to refresh."""
    from strake_spark.sources.registry import REMOTE_TABLES

    tables_rows = []
    cols_rows = []
    for t in spark.catalog.listTables():
        if t.name.startswith("information_schema_"):
            continue
        remote = REMOTE_TABLES.get(t.name)
        source = remote.context() if remote else "local"
        tables_rows.append((t.name, t.tableType or "TEMPORARY", source))
        try:
            schema = spark.table(t.name).schema
        except Exception:
            continue
        for pos, f in enumerate(schema.fields, start=1):
            cols_rows.append(
                (t.name, f.name, pos, f.dataType.simpleString(),
                 "YES" if f.nullable else "NO")
            )
    spark.createDataFrame(
        tables_rows or [("", "", "")], "table_name string, table_type string, source string"
    ).filter("table_name <> ''").createOrReplaceTempView("information_schema_tables")
    spark.createDataFrame(
        cols_rows or [("", "", 0, "", "")],
        "table_name string, column_name string, ordinal_position int, "
        "data_type string, is_nullable string",
    ).filter("table_name <> ''").createOrReplaceTempView("information_schema_columns")
    return ["information_schema_tables", "information_schema_columns"]


def get_schema_details(spark: SparkSession, table: str) -> dict:
    """Per-table column dump (reference mcp.py:207-257)."""
    df = spark.table(table)
    return {
        "table": table,
        "columns": [
            {
                "name": f.name,
                "type": f.dataType.simpleString(),
                "nullable": f.nullable,
            }
            for f in df.schema.fields
        ],
    }
