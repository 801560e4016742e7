"""Partial (per-table) pushdown for MIXED-source statements.

Whole-statement federation (plans/federation.py) only fires when ONE
remote engine owns every referenced table. This module covers the
reference's other federation arm (datafusion-federation pushes maximal
per-source subtrees; scan-level pushdown in
crates/connectors/src/sources/file.rs + sql_generator/expr.rs): in a
statement that mixes remote and local tables, each remote base table is
replaced by a remote-executed subquery carrying

- the columns the statement actually references (projection pruning),
- the top-level WHERE conjuncts that touch only that table and pass a
  conservative pushability screen (filter pushdown),

so the wire carries the filtered projection instead of the whole table.

Safety model — three rules that make this correct-by-construction:

1. **Outer predicates are never removed.** Pushed conjuncts ALSO remain
   in Spark's WHERE, so a remote engine that evaluates a predicate
   over-inclusively (e.g. SQLite's case-insensitive LIKE) only ships
   extra rows that Spark then filters out. Only UNDER-inclusive remote
   evaluation could corrupt results, hence rule 2.
2. **No string inequalities, no negated string predicates.** ``<``/``>``
   on strings ride collation order, which differs across engines in
   both directions. Negation is worse: it turns over-inclusion into
   UNDER-inclusion — ``name <> 'foo'`` / ``NOT LIKE`` / ``NOT IN`` on a
   case-insensitive remote (MySQL's default collation) drops rows the
   local re-filter can never restore. Only ``=``, ``IN``, ``LIKE``,
   ``IS [NOT] NULL`` (over-inclusive-or-equal under common collations)
   plus numeric/date/bool comparisons — including their negations —
   are pushable. String-typedness is decided from the table's Spark
   schema (column dtypes) plus constant/cast types; unknown counts as
   string.
3. **Whitelist, not blacklist.** A conjunct is pushable only if every
   node in its subtree is a known-deterministic class (column ref,
   constant, constant CAST, comparison, AND/OR/NOT, IN-list, IS NULL,
   LIKE); anything else — functions, subqueries, parameters — keeps the
   conjunct local.

At 100 TB this is the difference between shipping a 10^9-row remote
table to the cluster and shipping the 10^5 rows that survive the scan
predicate — while staying provably equivalent to local execution.
"""

from __future__ import annotations

import decimal
import json
import logging
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from strake_spark.sources.pushsql import quote_ident
from strake_spark.sources.registry import REMOTE_TABLES, RemoteTable

log = logging.getLogger("strake_spark.federation.partial")


class _NotPushable(Exception):
    pass


# ------------------------------------------------------------- constants

_NUMERIC_IDS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
    "FLOAT", "DOUBLE", "DECIMAL",
}
_CAST_IDS = {"DATE", "TIMESTAMP", "TIMESTAMP WITH TIME ZONE", "TIME",
             "INTEGER", "BIGINT", "DOUBLE", "BOOLEAN", "VARCHAR"}

_COMPARE_OPS = {
    "COMPARE_EQUAL": "=",
    "COMPARE_NOTEQUAL": "<>",
    "COMPARE_LESSTHAN": "<",
    "COMPARE_GREATERTHAN": ">",
    "COMPARE_LESSTHANOREQUALTO": "<=",
    "COMPARE_GREATERTHANOREQUALTO": ">=",
}
_INEQUALITY = {"COMPARE_LESSTHAN", "COMPARE_GREATERTHAN",
               "COMPARE_LESSTHANOREQUALTO", "COMPARE_GREATERTHANOREQUALTO"}


def _const_info(node: dict) -> tuple[str, str]:
    """CONSTANT node -> (sql_text, duck_type_id). Raises _NotPushable."""
    v = node.get("value") or {}
    tid = ((v.get("type") or {}).get("id") or "").upper()
    if v.get("is_null"):
        return "NULL", "NULL"
    raw = v.get("value")
    if tid == "BOOLEAN":
        return ("TRUE" if raw else "FALSE"), tid
    if tid == "DECIMAL":
        info = (v.get("type") or {}).get("type_info") or {}
        scale = int(info.get("scale", 0))
        d = decimal.Decimal(raw).scaleb(-scale)
        return format(d, "f"), tid
    if tid in _NUMERIC_IDS:
        return repr(raw), tid
    if tid == "VARCHAR":
        if "\x00" in str(raw):
            raise _NotPushable("NUL in literal")
        return "'" + str(raw).replace("'", "''") + "'", tid
    raise _NotPushable(f"constant type {tid}")


@dataclass
class _TableCtx:
    view: str
    alias: str  # effective alias in the statement (alias or view name)
    remote: RemoteTable
    columns: set[str]
    string_cols: set[str]  # columns with string dtype in the Spark schema
    node: dict  # mutable BASE_TABLE node in the AST


class _ConjunctSql:
    """Unparse one whitelisted conjunct against a single table context,
    validating ownership (every column ref must belong to the table)."""

    def __init__(self, t: _TableCtx, others_cols: set[str]):
        self.t = t
        self.others = others_cols  # columns owned by other tables (bare-name ambiguity)

    def _no_strings(self, node) -> bool:
        """True iff the subtree provably involves NO string-typed operand
        (no VARCHAR constant/cast, no string-dtype column from this
        table's Spark schema, no LIKE). Anything unknown counts as a
        string — whitelist stance.

        Why this matters: the safety model tolerates over-inclusive
        remote evaluation (Spark re-filters), but NEGATED string
        predicates invert over- into UNDER-inclusion — ``name <> 'foo'``
        on a case-insensitive MySQL collation drops 'FOO' rows remotely
        that Spark would keep, and the local re-filter cannot restore
        rows that were never shipped. Same for string inequalities,
        whose collation order differs across engines in both directions
        (reference keeps the same conservative whitelist,
        crates/sql/src/sql_generator/translator/mod.rs:76-145)."""
        if not isinstance(node, dict):
            return True  # scalars inside value nodes carry no type
        cls = node.get("class")
        if cls == "CONSTANT":
            v = node.get("value") or {}
            return ((v.get("type") or {}).get("id") or "").upper() != "VARCHAR"
        if cls == "CAST":
            if (node.get("cast_type") or {}).get("id", "").upper() == "VARCHAR":
                return False
            return self._no_strings(node.get("child"))
        if cls == "COLUMN_REF":
            names = node.get("column_names", [])
            return bool(names) and names[-1] not in self.t.string_cols
        if cls == "FUNCTION" and node.get("function_name") in ("~~", "!~~"):
            return False
        for key in ("children", "left", "right", "child"):
            v = node.get(key)
            if isinstance(v, list):
                if not all(self._no_strings(c) for c in v):
                    return False
            elif isinstance(v, dict) and not self._no_strings(v):
                return False
        return True

    def render(self, node) -> str:
        if not isinstance(node, dict):
            raise _NotPushable("non-dict node")
        cls, typ = node.get("class"), node.get("type")
        if cls == "CONJUNCTION" and typ in ("CONJUNCTION_AND", "CONJUNCTION_OR"):
            op = " AND " if typ == "CONJUNCTION_AND" else " OR "
            return "(" + op.join(self.render(c) for c in node.get("children", [])) + ")"
        if cls == "COMPARISON" and typ in _COMPARE_OPS:
            left, right = node["left"], node["right"]
            if typ in _INEQUALITY and not (
                self._no_strings(left) and self._no_strings(right)
            ):
                raise _NotPushable("string inequality (collation drift)")
            if typ == "COMPARE_NOTEQUAL" and not (
                self._no_strings(left) and self._no_strings(right)
            ):
                raise _NotPushable("string <> (negation under-includes)")
            return f"({self.render(left)} {_COMPARE_OPS[typ]} {self.render(right)})"
        if cls == "OPERATOR":
            ch = node.get("children", [])
            if typ in ("COMPARE_IN", "COMPARE_NOT_IN") and len(ch) >= 2:
                if typ == "COMPARE_NOT_IN" and not all(
                    self._no_strings(c) for c in ch
                ):
                    raise _NotPushable("string NOT IN (negation under-includes)")
                head = self.render(ch[0])
                items = ", ".join(self.render(c) for c in ch[1:])
                neg = "NOT " if typ == "COMPARE_NOT_IN" else ""
                return f"({head} {neg}IN ({items}))"
            if typ in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL") and len(ch) == 1:
                suffix = "IS NULL" if typ == "OPERATOR_IS_NULL" else "IS NOT NULL"
                return f"({self.render(ch[0])} {suffix})"
            if typ == "OPERATOR_NOT" and len(ch) == 1:
                if not self._no_strings(ch[0]):
                    raise _NotPushable("NOT over string predicate (under-includes)")
                return f"(NOT {self.render(ch[0])})"
            raise _NotPushable(f"operator {typ}")
        if cls == "FUNCTION" and node.get("function_name") in ("~~", "!~~"):
            ch = node.get("children", [])
            if len(ch) != 2:
                raise _NotPushable("LIKE arity")
            if node["function_name"] == "!~~":
                raise _NotPushable("NOT LIKE (negation under-includes)")
            return f"({self.render(ch[0])} LIKE {self.render(ch[1])})"
        if cls == "COLUMN_REF":
            names = [n for n in node.get("column_names", [])]
            if not names:
                raise _NotPushable("empty column ref")
            if len(names) == 1:
                col = names[0]
                if col not in self.t.columns or col in self.others:
                    raise _NotPushable(f"column {col} not uniquely owned")
            else:
                qual, col = names[-2], names[-1]
                if qual.lower() != self.t.alias.lower() or col not in self.t.columns:
                    raise _NotPushable(f"column {'.'.join(names)} not owned")
            return quote_ident(names[-1])
        if cls == "CONSTANT":
            return _const_info(node)[0]
        if cls == "CAST" and typ == "OPERATOR_CAST":
            inner = node.get("child") or {}
            if inner.get("class") != "CONSTANT":
                raise _NotPushable("non-constant cast")
            cast_id = (node.get("cast_type") or {}).get("id", "").upper()
            if cast_id not in _CAST_IDS:
                raise _NotPushable(f"cast to {cast_id}")
            return f"CAST({self.render(inner)} AS {cast_id})"
        raise _NotPushable(f"node {cls}/{typ}")


# ---------------------------------------------------------- AST walking


def _top_select(ast: dict) -> dict | None:
    stmts = ast.get("statements") or []
    if len(stmts) != 1:
        return None
    node = stmts[0].get("node") or {}
    if node.get("type") != "SELECT_NODE":
        return None
    return node


def _from_base_tables(from_node) -> list[dict]:
    """BASE_TABLE nodes that are DIRECT members of the top-level join
    tree (never descends into subqueries — their scopes are separate)."""
    out: list[dict] = []

    def walk(n):
        if not isinstance(n, dict):
            return
        t = n.get("type")
        if t == "BASE_TABLE":
            out.append(n)
        elif t in ("JOIN", "CROSS_PRODUCT"):
            walk(n.get("left"))
            walk(n.get("right"))

    walk(from_node)
    return out


def _split_conjuncts(where) -> list[dict]:
    if not isinstance(where, dict):
        return []
    if where.get("class") == "CONJUNCTION" and where.get("type") == "CONJUNCTION_AND":
        out = []
        for c in where.get("children", []):
            out.extend(_split_conjuncts(c))
        return out
    return [where]


def _collect_column_refs(node, out: list[list[str]], stars: list[dict]) -> None:
    if isinstance(node, dict):
        if node.get("class") == "COLUMN_REF":
            out.append(list(node.get("column_names", [])))
        if "STAR" in str(node.get("class", "")):
            stars.append(node)
        for v in node.values():
            _collect_column_refs(v, out, stars)
    elif isinstance(node, list):
        for v in node:
            _collect_column_refs(v, out, stars)


def _fix_for_spark(sql: str) -> str:
    """DuckDB-isms in json_deserialize_sql output that Spark's parser
    rejects (the local-dialect mirror of plans/dialects.fix_text).
    Literal-aware for the same reason as fix_text: a user string
    containing ' ~~ ' or 'count_star()' must survive verbatim.

    Also converts double-quoted identifiers to backticks: the
    deserializer quotes any identifier that is a DuckDB reserved word
    (e.g. ``d."label"``), which Spark's parser rejects outside ANSI
    double-quoted-identifier mode. Only non-literal segments are
    touched, so double quotes inside string literals survive; an
    escaped ``\"\"`` inside a quoted identifier unescapes to one ``"``
    (backtick identifiers escape a literal backtick by doubling)."""
    import re

    from strake_spark.plans.dialects import _split_literals

    def _ident_to_backtick(m: re.Match) -> str:
        inner = m.group(1).replace('""', '"').replace("`", "``")
        return f"`{inner}`"

    out = []
    for seg, is_literal in _split_literals(sql):
        if not is_literal:
            seg = (
                seg.replace("count_star()", "count(*)")
                .replace(" !~~ ", " NOT LIKE ")
                .replace(" ~~ ", " LIKE ")
            )
            seg = re.sub(r'"((?:[^"]|"")*)"', _ident_to_backtick, seg)
        out.append(seg)
    return "".join(out)


# -------------------------------------------------------------- planning


def pushed_temp_name(prefix: str, i: int, context: str, remote_sql: str) -> str:
    """Deterministic temp-view name for a pushed scan/subtree: one
    naming scheme shared by the partial and subtree rungs."""
    import hashlib

    digest = hashlib.sha256(f"{context}\x1f{remote_sql}".encode()).hexdigest()[:10]
    return f"{prefix}_{i}_{digest}"


@dataclass(frozen=True)
class PushedScan:
    view: str  # original Spark view
    temp_view: str  # substituted temp view name
    remote_sql: str
    context: str


@dataclass
class PartialPlan:
    """Mixed-source statement with >=1 remote scan pushed down."""

    scans: tuple[PushedScan, ...]
    local_sql: str  # original statement text (temp views swap in via AST)
    rewritten_sql: str = field(default="")  # human-readable summary
    remote: RemoteTable | None = None  # representative, for trace/metrics

    def summary(self) -> str:
        return "; ".join(f"{s.view} -> ({s.remote_sql})" for s in self.scans)


def analyze_partial(spark: SparkSession, sql: str):
    """Plan per-table pushdown for a mixed statement. Returns
    (rewritten_local_sql, PartialPlan) or None when nothing is pushable
    (all-local, fully-one-remote — the whole-statement path handles
    that — or no table gains a filter/projection)."""
    from strake_spark.plans.federation import (
        _cte_names,
        _deserialize,
        _serialize,
        apply_dialect_fixes,
    )

    if not REMOTE_TABLES:
        return None
    ast = _serialize(sql)
    if ast is None:
        return None
    select = _top_select(ast)
    if select is None:
        return None
    ctes = _cte_names(ast)
    base_nodes = _from_base_tables(select.get("from_table"))
    if not base_nodes:
        return None

    tables: list[_TableCtx] = []
    any_local = False
    contexts: set[str] = set()
    for node in base_nodes:
        name = node.get("table_name", "")
        if name.lower() in ctes:
            any_local = True
            continue
        remote = REMOTE_TABLES.get(name) or REMOTE_TABLES.get(name.lower())
        if remote is None:
            any_local = True
            continue
        if remote.push_query is None:
            any_local = True
            continue
        try:
            # STRICT-CONTRACT GUARANTEE (structural): spark.table() is
            # deliberately the column authority here. Under a strict
            # contract the registered Spark view already projects ONLY
            # the declared columns, so every projection this rung can
            # emit (including the star fallback below, which expands to
            # t.columns, never to the remote catalog's schema) is a
            # subset of the declared set — the partial rung cannot leak
            # an undeclared remote column even though it does not route
            # through federation._rewrite_remote_ref like the
            # whole-statement and subtree rungs. Do NOT replace this
            # with the remote catalog's schema; the guarantee (pinned
            # by TestStrictContractFederation
            # ::test_partial_rung_*) dies with it.
            dtypes = spark.table(name).dtypes
        except Exception:
            return None
        cols = {c for c, _ in dtypes}
        string_cols = {
            c for c, dt in dtypes
            if dt == "string" or dt.startswith(("varchar", "char"))
        }
        alias = node.get("alias") or name
        tables.append(_TableCtx(name, alias, remote, cols, string_cols, node))
        contexts.add(remote.context())
    if not tables:
        return None
    if not any_local and len(contexts) == 1:
        return None  # fully one remote: whole-statement pushdown owns this

    # column refs + stars across the WHOLE statement (projection safety)
    refs: list[list[str]] = []
    stars: list[dict] = []
    _collect_column_refs(select, refs, stars)

    conjuncts = _split_conjuncts(select.get("where_clause"))

    scans: list[PushedScan] = []
    for i, t in enumerate(tables):
        others = set()
        for o in tables:
            if o is not t:
                others |= o.columns
        # projection: everything referenced that this table can own
        needed: set[str] = set()
        star = bool(stars)
        for names in refs:
            if len(names) == 1:
                if names[0] in t.columns:
                    needed.add(names[0])
            elif names[-2].lower() == t.alias.lower() and names[-1] in t.columns:
                needed.add(names[-1])
        cols = sorted(t.columns) if star else sorted(needed)
        if not cols:
            cols = sorted(t.columns)

        renderer = _ConjunctSql(t, others)
        where_parts: list[str] = []
        for c in conjuncts:
            try:
                where_parts.append(renderer.render(c))
            except _NotPushable:
                continue

        if not where_parts and len(cols) == len(t.columns):
            continue  # no win: leave this scan alone

        remote_sql = (
            f"SELECT {', '.join(quote_ident(c) for c in cols)} "
            f"FROM {quote_ident(t.remote.table)}"
        )
        if where_parts:
            remote_sql += " WHERE " + " AND ".join(where_parts)
        remote_sql = apply_dialect_fixes(remote_sql, t.remote.dialect)

        temp = pushed_temp_name("strake_pushed", i, t.remote.context(), remote_sql)
        # rewrite the AST ref: temp view stands in; alias pins the
        # statement's own qualifier so column references keep resolving
        t.node["table_name"] = temp
        if not t.node.get("alias"):
            t.node["alias"] = t.view
        if t.node.get("schema_name"):
            t.node["schema_name"] = ""
        scans.append(
            PushedScan(view=t.view, temp_view=temp, remote_sql=remote_sql,
                       context=t.remote.context())
        )

    if not scans:
        return None
    local_sql = _deserialize(ast)
    if local_sql is None:
        return None
    local_sql = _fix_for_spark(local_sql)
    plan = PartialPlan(
        scans=tuple(scans),
        local_sql=sql,
        remote=tables[0].remote,
    )
    plan.rewritten_sql = plan.summary()
    return local_sql, plan


def execute_partial(spark: SparkSession, rewritten_sql: str, plan: PartialPlan,
                    tables: dict[str, RemoteTable] | None = None) -> DataFrame:
    """Materialize each pushed scan as a temp view, then run the
    rewritten statement on Spark."""
    lookup = tables or REMOTE_TABLES
    for scan in plan.scans:
        remote = lookup.get(scan.view) or lookup.get(scan.view.lower())
        df = remote.push_query(spark, scan.remote_sql)
        df.createOrReplaceTempView(scan.temp_view)
    return spark.sql(rewritten_sql)
