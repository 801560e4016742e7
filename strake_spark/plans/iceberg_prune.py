"""Query-time partition pruning for iceberg_native views.

Reference: crates/connectors/src/sources/iceberg/provider.rs:526-540 —
the provider receives the scan's pushed filters and prunes data files
against partition metadata before planning. On Spark, a temp view built
by ``spark.read.parquet(files...)`` has a FIXED file list, so filter
pushdown into the parquet scan prunes row groups but can never unlist a
file. This module restores file-level pruning for engine.sql queries:

    WHERE region = 'eu' AND event_date >= DATE '2024-04-03'

on an iceberg_native view re-plans the scan over only the files whose
partition metadata can match, by

1. parsing the statement (DuckDB AST, same machinery as
   plans/partial.py),
2. extracting top-level WHERE conjuncts of shape
   ``col OP constant`` / ``col IN (constants)`` where ``col`` is a
   partition SOURCE column of a registered iceberg_native view
   (identity or hidden transform — the pruner handles both),
3. rebuilding the scan DataFrame via
   sources.iceberg_native.pruned_files_and_df (manifest-summary +
   per-entry pruning) when the extra predicates strictly shrink the
   file list, registering it as a temp view, and
4. rewriting the statement's table ref to that view.

Safety model (same as partial.py rule 1): the extracted predicates are
NEVER removed from the statement — Spark still evaluates the full WHERE
over the pruned scan, and read_iceberg_table additionally re-applies the
partition filter. Pruning that keeps too many files costs only I/O;
pruning can only drop files whose partition metadata PROVES no row can
match (conservative interval/transform tests in iceberg_native).

At 100 TB this is the difference between planning a scan over every
live file of the table and opening only the queried partitions' files —
the reference's iceberg_partitioning.rs behavior, now for ad-hoc SQL
instead of just registration-time filters.
"""

from __future__ import annotations

import decimal
import hashlib
import logging
from dataclasses import dataclass

from pyspark.sql import SparkSession

log = logging.getLogger("strake_spark.federation.iceberg_prune")

_COMPARE_TO_OP = {
    "COMPARE_EQUAL": "==",
    "COMPARE_NOTEQUAL": "!=",
    "COMPARE_LESSTHAN": "<",
    "COMPARE_GREATERTHAN": ">",
    "COMPARE_LESSTHANOREQUALTO": "<=",
    "COMPARE_GREATERTHANOREQUALTO": ">=",
}
_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "==": "==", "!=": "!="}

_NUMERIC_IDS = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "FLOAT", "DOUBLE",
}


class _Skip(Exception):
    """Conjunct not usable for pruning (never an error — keep the file)."""


def _const_py(node: dict):
    """CONSTANT or CAST(CONSTANT AS DATE/TIMESTAMP/...) -> plain Python
    literal for the pruner. Date/timestamp casts keep the inner ISO
    string — iceberg_native._coerce_literal / _time_transform_value
    understand ISO text for date/timestamp-typed partition columns."""
    if not isinstance(node, dict):
        raise _Skip
    if node.get("class") == "CAST" and node.get("type") == "OPERATOR_CAST":
        inner = node.get("child") or {}
        return _const_py(inner)
    if node.get("class") != "CONSTANT":
        raise _Skip
    v = node.get("value") or {}
    if v.get("is_null"):
        raise _Skip  # col OP NULL keeps nothing; leave that to Spark
    tid = ((v.get("type") or {}).get("id") or "").upper()
    raw = v.get("value")
    if tid == "DECIMAL":
        info = (v.get("type") or {}).get("type_info") or {}
        return float(decimal.Decimal(raw).scaleb(-int(info.get("scale", 0))))
    if tid in _NUMERIC_IDS:
        return raw
    if tid == "VARCHAR":
        return str(raw)
    raise _Skip


def _owned_col(node: dict, view_cols, alias: str, others: set[str]) -> str:
    """COLUMN_REF -> column name when it unambiguously belongs to the
    target view (qualified by its alias, or bare and not a column of
    any other base table)."""
    if not isinstance(node, dict) or node.get("class") != "COLUMN_REF":
        raise _Skip
    names = list(node.get("column_names", []))
    if not names:
        raise _Skip
    if len(names) == 1:
        col = names[0]
        if col not in view_cols or col in others:
            raise _Skip
        return col
    qual, col = names[-2], names[-1]
    if qual.lower() != alias.lower() or col not in view_cols:
        raise _Skip
    return col


def _extract_pred(node: dict, view_cols, alias: str, others: set[str]):
    """One WHERE conjunct -> (col, op, literal) triple, or _Skip."""
    cls, typ = node.get("class"), node.get("type")
    if cls == "COMPARISON" and typ in _COMPARE_TO_OP:
        left, right = node.get("left"), node.get("right")
        op = _COMPARE_TO_OP[typ]
        try:
            col = _owned_col(left, view_cols, alias, others)
            return (col, op, _const_py(right))
        except _Skip:
            col = _owned_col(right, view_cols, alias, others)
            return (col, _FLIP[op], _const_py(left))
    if cls == "OPERATOR" and typ == "COMPARE_IN":
        ch = node.get("children", [])
        if len(ch) >= 2:
            col = _owned_col(ch[0], view_cols, alias, others)
            return (col, "in", [_const_py(c) for c in ch[1:]])
    if cls == "OPERATOR" and typ in ("OPERATOR_IS_NULL", "OPERATOR_IS_NOT_NULL"):
        ch = node.get("children", [])
        if len(ch) == 1:
            col = _owned_col(ch[0], view_cols, alias, others)
            return (col, "is_null" if typ == "OPERATOR_IS_NULL" else "not_null",
                    None)
    raise _Skip


# Bounded registry of pruned temp views (a dashboard varying a literal
# per query would otherwise accumulate one catalog entry + embedded
# file-list plan per distinct predicate for the session's lifetime).
# Keyed by temp-view name; evicted views are dropped from the catalog.
# Lock: plan_sql runs on every REST worker thread — evicting a view no
# longer breaks in-flight queries (their plans resolved at analysis),
# but the OrderedDict itself must not be mutated concurrently.
import threading as _threading
from collections import OrderedDict as _OrderedDict

_PRUNE_VIEWS: _OrderedDict = _OrderedDict()
_PRUNE_VIEWS_MAX = 64
_PRUNE_VIEWS_LOCK = _threading.Lock()


def _remember_prune_view(spark: SparkSession, temp: str) -> None:
    evicted: list[str] = []
    with _PRUNE_VIEWS_LOCK:
        _PRUNE_VIEWS[temp] = None
        _PRUNE_VIEWS.move_to_end(temp)
        while len(_PRUNE_VIEWS) > _PRUNE_VIEWS_MAX:
            old, _ = _PRUNE_VIEWS.popitem(last=False)
            evicted.append(old)
    for old in evicted:
        try:
            spark.catalog.dropTempView(old)
        except Exception:  # noqa: BLE001 - already gone
            pass


@dataclass
class PrunedScan:
    view: str
    temp_view: str
    files_before: int
    files_after: int
    preds: tuple


@dataclass
class IcebergPrunePlan:
    """Reported through explain_tree/trace like a pushdown plan: this
    IS scan pushdown — partition predicates reached the file listing."""

    scans: tuple[PrunedScan, ...]
    rewritten_sql: str = ""

    def summary(self) -> str:
        return "; ".join(
            f"{s.view}: {s.files_after}/{s.files_before} files "
            f"({', '.join(f'{c} {o} {v!r}' for c, o, v in s.preds)})"
            for s in self.scans
        )


def analyze_iceberg_prune(spark: SparkSession, sql: str):
    """Returns (rewritten_sql, IcebergPrunePlan) when at least one
    registered iceberg_native view's scan shrinks under the statement's
    partition predicates; None otherwise. Never raises for analysis
    problems — pruning is an optimization, the original statement is
    always a correct plan."""
    from strake_spark.plans.federation import _cte_names, _deserialize, _serialize
    from strake_spark.plans.partial import (
        _from_base_tables,
        _split_conjuncts,
        _top_select,
    )
    from strake_spark.sources.iceberg_native import (
        ICEBERG_VIEWS,
        pruned_files_and_df,
    )

    if not ICEBERG_VIEWS:
        return None
    ast = _serialize(sql)
    if ast is None:
        return None
    select = _top_select(ast)
    if select is None:
        return None
    ctes = _cte_names(ast)
    base_nodes = _from_base_tables(select.get("from_table"))
    conjuncts = _split_conjuncts(select.get("where_clause"))
    if not base_nodes or not conjuncts:
        return None

    # bare-name ambiguity: columns owned by the OTHER base tables
    def cols_of(name: str) -> set[str]:
        try:
            return set(spark.table(name).columns)
        except Exception:  # noqa: BLE001 - unknown table: no claim
            return set()

    resolved = []
    for node in base_nodes:
        name = node.get("table_name", "")
        if name.lower() in ctes:
            continue
        info = ICEBERG_VIEWS.get(name) or ICEBERG_VIEWS.get(name.lower())
        resolved.append((node, name, info, cols_of(name)))

    scans: list[tuple[PrunedScan, object]] = []  # (scan, its DataFrame)
    for node, name, info, _ in resolved:
        if info is None or not info.partition_cols:
            continue
        others: set[str] = set()
        for n2, _, _, cols2 in resolved:
            if n2 is not node:
                others |= cols2
        alias = node.get("alias") or name
        preds = []
        for c in conjuncts:
            try:
                preds.append(_extract_pred(c, info.partition_cols, alias, others))
            except _Skip:
                continue
        if not preds:
            continue
        try:
            result = pruned_files_and_df(spark, info, preds)
        except Exception as e:  # noqa: BLE001 - metadata drift: keep original
            log.warning("iceberg prune re-plan failed for %s (%s)", name, e)
            continue
        if result is None:
            continue
        before, after, df = result
        digest = hashlib.sha256(
            repr((name, info.snapshot_id, info.as_of_timestamp_ms, preds)).encode()
        ).hexdigest()[:10]
        temp = f"strake_iceprune_{digest}"
        node["table_name"] = temp
        if not node.get("alias"):
            node["alias"] = name
        if node.get("schema_name"):
            node["schema_name"] = ""
        scans.append((PrunedScan(name, temp, before, after, tuple(preds)), df))

    if not scans:
        return None
    rewritten = _deserialize(ast)
    if rewritten is None:
        return None  # no views created yet: nothing leaks on abandon
    # NB: returned in DuckDB-parseable form (double-quoted identifiers
    # et al), NOT Spark form — the planning ladder may feed it back
    # through the AST machinery (partial pushdown); the caller applies
    # plans.partial._fix_for_spark before handing it to spark.sql.
    for s, df in scans:
        df.createOrReplaceTempView(s.temp_view)
        _remember_prune_view(spark, s.temp_view)
    plan = IcebergPrunePlan(scans=tuple(s for s, _ in scans))
    plan.rewritten_sql = plan.summary()
    return rewritten, plan
