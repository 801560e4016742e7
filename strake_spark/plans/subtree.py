"""Subquery-level same-source federation.

The whole-statement path (plans/federation.py) only fires when ONE
remote engine owns EVERY table in the statement. The reference's
federation rule is finer-grained: it finds MAXIMAL same-source plan
subtrees and ships each one, even inside an otherwise-local query
(datafusion-federation's FederationOptimizerRule, registered at
crates/runtime/src/federation.rs:232 — subtree grouping keyed by
SQLExecutor::compute_context). This module closes that gap for the
subtree shapes that are provably safe to ship from SQL text alone:

- a CTE whose body references only tables of one remote source, and
- a derived table (subquery in FROM) with the same property.

A shipped subtree executes remotely — the join/aggregate reduction
happens inside the source engine, and Spark scans only the (small)
result as a temp view. The rewritten outer statement then continues
down the existing ladder, so iceberg partition pruning and per-table
partial pushdown still apply to the remaining local portion.

Safety rules (violations degrade to the next ladder rung, never error):

- every base table inside the subtree resolves to the SAME remote
  context with a ``push_query`` transport; inner CTEs are fine (the
  remote engine evaluates them), references to OUTER CTEs are not;
- every qualified column reference inside the subtree must use a
  qualifier defined inside it, and every unqualified reference must
  match a known inner column or alias — this simultaneously rejects
  correlated (LATERAL) subqueries, which DuckDB's serialized AST does
  not explicitly mark, and guarantees remote resolvability.

At 100 TB this is the reference's headline win generalized: a
same-source join-then-aggregate that reduces 10^9 rows to 10^3 ships
10^3 across the wire even when the outer query also touches parquet.
"""

from __future__ import annotations

import copy
import json
import logging
from dataclasses import dataclass

from pyspark.sql import SparkSession

from strake_spark.sources.registry import REMOTE_TABLES, RemoteTable

log = logging.getLogger("strake_spark.federation.subtree")


@dataclass
class SubtreeResult:
    duck_sql: str  # rewritten statement, DuckDB-parseable (ladder input)
    spark_sql: str  # same statement respelled for spark.sql
    scans: tuple  # PushedScan per shipped subtree


def _walk_column_refs(node, out: list[list[str]]) -> None:
    if isinstance(node, dict):
        if node.get("type") == "COLUMN_REF" and node.get("column_names"):
            out.append(list(node["column_names"]))
        for v in node.values():
            _walk_column_refs(v, out)
    elif isinstance(node, list):
        for v in node:
            _walk_column_refs(v, out)


def _walk_aliases(node, out: set[str]) -> None:
    """Select-list aliases anywhere in the subtree (allowed unqualified
    names: HAVING/ORDER BY may reference them)."""
    if isinstance(node, dict):
        if node.get("select_list"):
            for e in node["select_list"]:
                if isinstance(e, dict) and e.get("alias"):
                    out.add(e["alias"].lower())
        for v in node.values():
            _walk_aliases(v, out)
    elif isinstance(node, list):
        for v in node:
            _walk_aliases(v, out)


def _inner_table_aliases(node, out: set[str]) -> None:
    if isinstance(node, dict):
        t = node.get("type")
        if t == "BASE_TABLE" and node.get("table_name"):
            out.add((node.get("alias") or node["table_name"]).lower())
        elif t == "SUBQUERY" and node.get("alias"):
            out.add(node["alias"].lower())
        for v in node.values():
            _inner_table_aliases(v, out)
    elif isinstance(node, list):
        for v in node:
            _inner_table_aliases(v, out)


_AGG_FUNCS = {
    "count", "count_star", "sum", "avg", "min", "max", "string_agg",
    "array_agg", "list", "first", "last", "median", "mode", "stddev",
    "stddev_pop", "stddev_samp", "var_pop", "var_samp", "variance",
    "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or", "product",
    "approx_count_distinct", "arg_min", "arg_max", "group_concat",
}


def _reduces(q_node: dict, n_tables: int) -> bool:
    """Ship only subtrees that REDUCE data remotely: an aggregate,
    DISTINCT, LIMIT, or a multi-table join. A bare filter/projection is
    better served by the partial-pushdown rung, whose partitioned scan
    parallelizes the transfer instead of pulling through the single
    push_query connection."""
    if n_tables > 1:
        return True

    found = {"hit": False}

    def walk(n):
        if found["hit"]:
            return
        if isinstance(n, dict):
            if n.get("group_expressions") or n.get("group_sets"):
                found["hit"] = True
                return
            for m in n.get("modifiers", []) or []:
                if m.get("type") in ("DISTINCT_MODIFIER", "LIMIT_MODIFIER"):
                    found["hit"] = True
                    return
            if (
                n.get("type") == "FUNCTION"
                and n.get("function_name", "").lower() in _AGG_FUNCS
            ):
                found["hit"] = True
                return
            for v in n.values():
                walk(v)
        elif isinstance(n, list):
            for v in n:
                walk(v)

    walk(q_node)
    return found["hit"]


def _try_push_subtree(
    spark: SparkSession, q_node: dict, outer_ctes: set[str]
) -> tuple[str, RemoteTable] | None:
    """If the subtree rooted at ``q_node`` is single-remote-source,
    scope-closed, and REDUCING, return (remote_sql, representative)."""
    from strake_spark.plans.federation import (
        _cte_names,
        _deserialize,
        _walk_base_tables,
        apply_dialect_fixes,
    )

    refs: list[dict] = []
    _walk_base_tables(q_node, refs)
    inner_ctes = _cte_names({"wrap": q_node})
    remotes: list[tuple[dict, RemoteTable]] = []
    contexts: set[str] = set()
    for node in refs:
        name = node["table_name"]
        low = name.lower()
        if low in inner_ctes:
            continue
        if low in outer_ctes:
            return None  # leans on an outer CTE -> local
        remote = REMOTE_TABLES.get(name) or REMOTE_TABLES.get(low)
        if remote is None or remote.push_query is None:
            return None
        remotes.append((node, remote))
        contexts.add(remote.context())
    if not remotes or len(contexts) != 1:
        return None
    if not _reduces(q_node, len(remotes)):
        return None

    # scope closure: qualified refs must use inner qualifiers; unqualified
    # refs must be known inner columns or select aliases
    inner_quals: set[str] = set(inner_ctes)
    _inner_table_aliases(q_node, inner_quals)
    allowed_unqual: set[str] = set()
    _walk_aliases(q_node, allowed_unqual)
    for node, remote in remotes:
        try:
            for c in spark.table(node["table_name"]).columns:
                allowed_unqual.add(c.lower())
        except Exception:
            return None
    col_refs: list[list[str]] = []
    _walk_column_refs(q_node, col_refs)
    for names in col_refs:
        if len(names) >= 2:
            if names[-2].lower() not in inner_quals:
                return None
        elif names[-1].lower() not in allowed_unqual:
            return None

    rep = remotes[0][1]
    q_copy = copy.deepcopy(q_node)
    refs2: list[dict] = []
    _walk_base_tables(q_copy, refs2)
    for node in refs2:
        low = node["table_name"].lower()
        if low in inner_ctes:
            continue
        remote = REMOTE_TABLES.get(node["table_name"]) or REMOTE_TABLES.get(low)
        # strict-contract views become inline projected subqueries so
        # the shipped subtree can't expose undeclared columns
        from strake_spark.plans.federation import _rewrite_remote_ref

        if not _rewrite_remote_ref(node, remote):
            return None
    from strake_spark.plans.dialects import rename_functions, rules_for

    rename_functions(q_copy, rules_for(rep.dialect))
    pushed = _deserialize({"error": False, "statements": [{"node": q_copy}]})
    if pushed is None:
        return None
    return apply_dialect_fixes(pushed, rep.dialect), rep


def _select_star_node(temp: str) -> dict:
    from strake_spark.plans.federation import _serialize

    ast = _serialize(f"SELECT * FROM {temp}")
    return ast["statements"][0]["node"]


def analyze_subtrees(spark: SparkSession, sql: str) -> SubtreeResult | None:
    """Find and ship maximal single-source CTEs / derived tables.
    Returns None when nothing ships (then the existing ladder applies
    unchanged)."""
    from strake_spark.plans.federation import _cte_names, _deserialize, _serialize
    from strake_spark.plans.partial import PushedScan, _fix_for_spark

    if not REMOTE_TABLES:
        return None
    ast = _serialize(sql)
    if ast is None:
        return None
    all_ctes = _cte_names(ast)
    scans: list = []

    def visit(node) -> None:
        if isinstance(node, dict):
            cte = node.get("cte_map")
            if isinstance(cte, dict):
                for entry in cte.get("map", []):
                    q = (entry.get("value") or {}).get("query")
                    if isinstance(q, dict) and isinstance(q.get("node"), dict):
                        hit = _try_push_subtree(spark, q["node"], all_ctes - {entry["key"].lower()})
                        if hit is not None:
                            remote_sql, rep = hit
                            temp = _temp_name(len(scans), rep, remote_sql)
                            q["node"] = _select_star_node(temp)
                            scans.append(
                                PushedScan(view=entry["key"], temp_view=temp,
                                           remote_sql=remote_sql, context=rep.context())
                            )
                            continue
                        visit(q)
            if (
                node.get("type") == "SUBQUERY"
                and isinstance(node.get("subquery"), dict)
                # tableref subqueries only: expression subqueries
                # (scalar/IN/EXISTS) carry subquery_type and must NOT
                # be replaced with a BASE_TABLE in expression position
                and "subquery_type" not in node
            ):
                inner = node["subquery"].get("node")
                if isinstance(inner, dict):
                    hit = _try_push_subtree(spark, inner, all_ctes)
                    if hit is not None:
                        remote_sql, rep = hit
                        temp = _temp_name(len(scans), rep, remote_sql)
                        alias = node.get("alias") or temp
                        colalias = node.get("column_name_alias") or []
                        node.clear()
                        node.update(
                            {
                                "type": "BASE_TABLE",
                                "alias": alias,
                                "sample": None,
                                "query_location": 0,
                                "schema_name": "",
                                "table_name": temp,
                                "column_name_alias": colalias,
                                "catalog_name": "",
                            }
                        )
                        scans.append(
                            PushedScan(view=alias, temp_view=temp,
                                       remote_sql=remote_sql, context=rep.context())
                        )
                        return
                    visit(node["subquery"])
                for k, v in node.items():
                    if k != "subquery":
                        visit(v)
                return
            for k, v in node.items():
                if k != "cte_map":
                    visit(v)
        elif isinstance(node, list):
            for v in node:
                visit(v)

    visit(ast)
    if not scans:
        return None
    duck_sql = _deserialize(ast)
    if duck_sql is None:
        return None
    return SubtreeResult(
        duck_sql=duck_sql, spark_sql=_fix_for_spark(duck_sql), scans=tuple(scans)
    )


def _temp_name(i: int, rep: RemoteTable, remote_sql: str) -> str:
    from strake_spark.plans.partial import pushed_temp_name

    return pushed_temp_name("strake_sub", i, rep.context(), remote_sql)


def register_scans(spark: SparkSession, scans, tables: dict[str, RemoteTable] | None = None) -> None:
    """Materialize each shipped subtree as a temp view (lazy — the
    remote query runs when the outer statement executes)."""
    lookup = tables or REMOTE_TABLES
    by_ctx = {rt.context(): rt for rt in lookup.values()}
    for s in scans:
        rt = by_ctx.get(s.context)
        if rt is None:  # pragma: no cover - registry drift
            raise RuntimeError(f"no source registered for context {s.context}")
        rt.push_query(spark, s.remote_sql).createOrReplaceTempView(s.temp_view)
