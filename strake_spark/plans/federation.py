"""Same-source query pushdown — the Spark re-expression of the
reference's federation machinery.

The reference's single largest subsystem finds maximal same-source plan
subtrees and unparses them back to remote SQL (datafusion-federation's
FederationOptimizerRule registered at crates/runtime/src/federation.rs:232;
unparser in crates/sql/src/sql_generator/translator/mod.rs:76-145; source
identity = SQLExecutor::compute_context, crates/connectors/src/sources/
sql/postgres_federation.rs:46-49). That buys one thing: joins/aggregates
between tables living in the SAME external engine run *inside* that
engine, so only the (small) result crosses the wire instead of the
(huge) base tables.

Spark-first design:

- **Parse, don't regex.** DuckDB's ``json_serialize_sql`` gives a full
  SQL AST; we walk it for base-table references (minus CTE names) and
  map each through the source registry's ``REMOTE_TABLES`` provenance.
- **Whole-statement pushdown** when every referenced table resolves to
  one remote context: rewrite view names -> remote table names by
  mutating the AST and deserializing back to SQL
  (``json_deserialize_sql``), then execute via the source's own
  DataSource ``query`` option. The remote engine does the join/agg; the
  Spark scan sees only the result rows.
- **Graceful degradation**: mixed-source or unparseable queries run on
  Spark, where each scan still gets per-source filter/column pushdown
  (pushsql.py) — the same split as the reference's LocalExecution path
  (crates/sql/src/dialect_router.rs:28-100). A remote execution error
  also falls back to local execution (their circuit-breaker fallback
  analog) unless fallback is disabled.

At 100 TB the win is exactly the reference's: a same-source
join-then-aggregate that reduces 10^9 rows to 10^3 should ship 10^3.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from strake_spark.sources.registry import REMOTE_TABLES, RemoteTable

log = logging.getLogger("strake_spark.federation")

def apply_dialect_fixes(sql: str, dialect: str) -> str:
    """Post-unparse textual fixes (count_star(), quoting style, the
    COALESCE-family spellings) — see plans/dialects.py, the reference's
    FunctionMapper layer."""
    from strake_spark.plans.dialects import rules_for

    return rules_for(dialect).fix_text(sql)


_ast_lock = __import__("threading").Lock()
_ast_con: object | None = None


def _ast_execute(stmt: str, params: list) -> object:
    """Run one AST (de)serialization statement on a single lock-guarded
    shared in-memory DuckDB connection. The planning ladder calls
    serialize/deserialize several times per statement (whole-statement,
    subtree, iceberg, partial rungs); a fresh connect() costs ~8 ms,
    dominating parse time. A shared connection (not threading.local):
    the REST server is thread-per-request, so per-thread caching never
    amortized there and cleanup depended on thread death + GC — one
    global connection amortizes across requests and has an explicit
    lifecycle. (De)serialization statements are cheap, so the lock is
    not a contention point. On error the connection is closed and
    forgotten (it may be poisoned); the next call rebuilds lazily."""
    global _ast_con
    import duckdb

    with _ast_lock:
        if _ast_con is None:
            _ast_con = duckdb.connect()
        try:
            return _ast_con.execute(stmt, params).fetchone()[0]
        except Exception:
            con, _ast_con = _ast_con, None
            try:
                con.close()
            except Exception:
                pass
            raise


def _serialize(sql: str) -> dict | None:
    """Spark-SQL text -> DuckDB JSON AST (None if DuckDB can't parse it —
    that alone disqualifies pushdown, not execution)."""
    try:
        raw = _ast_execute("SELECT json_serialize_sql(?::VARCHAR)", [sql])
        ast = json.loads(raw)
        if ast.get("error"):
            return None
        return ast
    except Exception:
        return None


def _deserialize(ast: dict) -> str | None:
    try:
        return _ast_execute("SELECT json_deserialize_sql(?::JSON)", [json.dumps(ast)])
    except Exception:
        return None


def _walk_base_tables(node, out: list[dict]) -> None:
    """Collect every BASE_TABLE node dict (mutable references into the AST)."""
    if isinstance(node, dict):
        if node.get("type") == "BASE_TABLE" and "table_name" in node:
            out.append(node)
        for v in node.values():
            _walk_base_tables(v, out)
    elif isinstance(node, list):
        for v in node:
            _walk_base_tables(v, out)


def _cte_names(ast: dict) -> set[str]:
    names: set[str] = set()

    def walk(node):
        if isinstance(node, dict):
            cte = node.get("cte_map")
            if isinstance(cte, dict):
                for entry in cte.get("map", []):
                    k = entry.get("key")
                    if k:
                        names.add(k.lower())
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(ast)
    return names


def _rewrite_remote_ref(node: dict, remote: RemoteTable) -> bool:
    """Point a BASE_TABLE tableref at the remote physical table,
    IN PLACE. For a strict-contract (closed-schema) view the bare
    physical table would expose columns the local projected view hides,
    so the ref becomes an inline subquery projecting exactly the
    declared columns — `(SELECT a, b FROM physical) AS view` — which
    keeps the reference's contracts.yaml:12 guarantee ("querying
    columns NOT listed will fail") intact under pushdown: the remote
    engine itself rejects unlisted columns, and SELECT * expands to the
    declared set, matching embedded-mode semantics. Returns False when
    the guard cannot be built (caller must not push)."""
    from strake_spark.governance.contracts import STRICT_VIEWS

    name = node["table_name"]
    strict_cols = STRICT_VIEWS.get(name) or STRICT_VIEWS.get(name.lower())
    if not strict_cols:
        node["table_name"] = remote.table
        # drop any schema qualifier that named our view namespace
        if node.get("schema_name"):
            node["schema_name"] = ""
        return True
    from strake_spark.sources.pushsql import quote_ident

    inner = (
        f"SELECT {', '.join(quote_ident(c) for c in strict_cols)} "
        f"FROM {quote_ident(remote.table)}"
    )
    ast = _serialize(inner)
    if ast is None:  # pragma: no cover - quoted idents always parse
        return False
    alias = node.get("alias") or name
    node.clear()
    node.update(
        {
            "type": "SUBQUERY",
            "alias": alias,
            "sample": None,
            "query_location": 18446744073709551615,
            "subquery": {"node": ast["statements"][0]["node"]},
            "column_name_alias": [],
        }
    )
    return True


@dataclass(frozen=True)
class PushdownPlan:
    """A fully-pushable statement: one remote context owns every table."""

    remote: RemoteTable  # representative (context/dialect/url)
    rewritten_sql: str
    views: tuple[str, ...]


def _note(trace, rung: str, status: str, reason: str) -> None:
    """Record a planning-ladder decision (rung, status, reason) into the
    caller-supplied trace list. Mirrors the reference's unsupported-node
    warnings (crates/sql/src/sql_generator/translator/mod.rs:76-145) —
    users debugging "why didn't my query federate" read this, not logs."""
    if trace is not None:
        trace.append((rung, status, reason))


def analyze(sql: str, trace: list | None = None) -> PushdownPlan | None:
    """Decide whole-statement pushdown. Returns None when the query must
    run on Spark (mixed sources, local tables, or unparseable); when
    ``trace`` is given, the specific rejection reason is appended to it."""
    if not REMOTE_TABLES:
        _note(trace, "whole_statement", "rejected", "no remote-backed views registered")
        return None
    ast = _serialize(sql)
    if ast is None:
        _note(trace, "whole_statement", "rejected",
              "statement not parseable for AST analysis")
        return None
    refs: list[dict] = []
    _walk_base_tables(ast, refs)
    if not refs:
        _note(trace, "whole_statement", "rejected", "no base-table references")
        return None
    ctes = _cte_names(ast)
    remotes: list[tuple[dict, RemoteTable]] = []
    contexts: set[str] = set()
    for node in refs:
        name = node["table_name"]
        if name.lower() in ctes:
            continue
        remote = REMOTE_TABLES.get(name) or REMOTE_TABLES.get(name.lower())
        if remote is None:
            # a local table participates -> Spark executes
            _note(trace, "whole_statement", "rejected",
                  f"table {name!r} is not remote-backed")
            return None
        remotes.append((node, remote))
        contexts.add(remote.context())
    if not remotes:
        _note(trace, "whole_statement", "rejected",
              "statement references only CTEs")
        return None
    if len(contexts) != 1:
        _note(trace, "whole_statement", "rejected",
              f"tables span {len(contexts)} remote contexts: "
              f"{', '.join(sorted(contexts))}")
        return None
    rep = remotes[0][1]
    if rep.push_query is None:
        _note(trace, "whole_statement", "rejected",
              f"source {rep.source!r} does not support query pushdown")
        return None
    views = tuple(sorted({node["table_name"] for node, _ in remotes}))
    for node, remote in remotes:
        if not _rewrite_remote_ref(node, remote):
            _note(trace, "whole_statement", "rejected",
                  f"cannot build strict-contract guard for {node.get('table_name')!r}")
            return None  # can't build a strict-contract guard -> local
    # dialect function mapping happens on the AST (nesting/literal-safe)
    from strake_spark.plans.dialects import rename_functions, rules_for

    rename_functions(ast, rules_for(rep.dialect))
    pushed_sql = _deserialize(ast)
    if pushed_sql is None:
        _note(trace, "whole_statement", "rejected",
              "rewritten AST failed to deserialize to remote SQL")
        return None
    pushed_sql = apply_dialect_fixes(pushed_sql, rep.dialect)
    _note(trace, "whole_statement", "pushed", f"to {rep.context()}")
    return PushdownPlan(remote=rep, rewritten_sql=pushed_sql, views=views)


def referenced_remote_views(sql: str) -> set[str] | None:
    """Remote views a statement references, or None when unparseable
    (callers should then refresh conservatively)."""
    ast = _serialize(sql)
    if ast is None:
        return None
    refs: list[dict] = []
    _walk_base_tables(ast, refs)
    ctes = _cte_names(ast)
    out: set[str] = set()
    for node in refs:
        name = node["table_name"]
        if name.lower() in ctes:
            continue
        if name in REMOTE_TABLES:
            out.add(name)
        elif name.lower() in REMOTE_TABLES:
            out.add(name.lower())
    return out


def execute_pushdown(spark: SparkSession, plan: PushdownPlan) -> DataFrame:
    return plan.remote.push_query(spark, plan.rewritten_sql)


def plan_sql(
    spark: SparkSession,
    sql: str,
    allow_fallback: bool = True,
    trace: list | None = None,
) -> tuple[DataFrame, PushdownPlan | None]:
    """Main entry: returns (DataFrame, pushdown-plan-or-None).

    Planning ladder, mirroring the reference's dialect router: whole-
    statement pushdown (one remote owns everything) -> iceberg_native
    query-time partition pruning (local scan re-planned over only the
    matching files, plans/iceberg_prune.py) -> partial per-table
    pushdown (mixed statement; each remote scan ships its filtered
    projection, plans/partial.py) -> fully local. Pushdown failures
    (remote parse/execute errors from dialect drift) fall back to the
    next rung. When both iceberg pruning and partial pushdown fire, the
    partial plan is reported (the pruning is embedded in the statement
    it rewrote).

    ``trace`` (optional list) collects (rung, status, reason) decisions
    — the reference's unsupported-node warnings surfaced as data, so
    explain_tree can show WHY a statement didn't federate, per rung.
    """
    plan = analyze(sql, trace=trace)
    if plan is not None:
        try:
            df = execute_pushdown(spark, plan)
            # force schema resolution now so dialect errors surface here
            df.schema
            return df, plan
        except Exception as e:  # pragma: no cover - dialect drift path
            if not allow_fallback:
                raise
            _note(trace, "whole_statement", "failed",
                  f"remote execution error, falling back: {e}")
            log.warning(
                "pushdown to %s failed (%s); executing locally",
                plan.remote.context(),
                e,
            )
    sub_scans: tuple = ()
    local_sql = sql  # what the final local rung executes (Spark dialect)
    try:
        from strake_spark.plans.subtree import analyze_subtrees, register_scans

        st = analyze_subtrees(spark, sql)
        if st is None:
            _note(trace, "subtree", "rejected",
                  "no same-source subtree ships a reduction")
        if st is not None:
            # register first (lazy), then the rewritten outer statement
            # must PARSE AND RESOLVE before it may replace the original;
            # any failure degrades to the unrewritten ladder
            try:
                register_scans(spark, st.scans)
                spark.sql(st.spark_sql).schema
            except Exception:
                # drop the half-registered remote-backed views: a failed
                # planning attempt must not leak catalog entries
                for s in st.scans:
                    try:
                        spark.catalog.dropTempView(s.temp_view)
                    except Exception:  # pragma: no cover - best effort
                        pass
                raise
            sql, local_sql, sub_scans = st.duck_sql, st.spark_sql, st.scans
            _note(trace, "subtree", "applied",
                  f"{len(st.scans)} shipped subtree(s)")
            log.info(
                "subtree pushdown: %s",
                "; ".join(f"{s.view} -> ({s.remote_sql})" for s in st.scans),
            )
    except Exception as e:  # noqa: BLE001 - subtree shipping is optional
        _note(trace, "subtree", "failed", str(e))
        log.warning("subtree pushdown analysis failed (%s); original plan", e)
    ice_plan = None
    try:
        from strake_spark.plans.iceberg_prune import analyze_iceberg_prune
        from strake_spark.plans.partial import _fix_for_spark

        ice = analyze_iceberg_prune(spark, sql)
        if ice is None:
            _note(trace, "iceberg_prune", "rejected",
                  "no iceberg-backed scan with prunable partition predicates")
        if ice is not None:
            # the pruned statement comes back DuckDB-parseable so the
            # partial-pushdown rung can re-serialize it; its Spark form
            # must PARSE AND RESOLVE before it may replace the original
            # — a deserializer artifact degrades to the unpruned plan,
            # never fails the query
            pruned_raw, plan_candidate = ice
            pruned_spark = _fix_for_spark(pruned_raw)
            spark.sql(pruned_spark).schema
            sql, local_sql, ice_plan = pruned_raw, pruned_spark, plan_candidate
            _note(trace, "iceberg_prune", "applied",
                  f"{len(plan_candidate.scans)} scan(s) pruned")
    except Exception as e:  # noqa: BLE001 - pruning is optional
        _note(trace, "iceberg_prune", "failed", str(e))
        log.warning("iceberg partition-prune analysis failed (%s); original plan", e)
    try:
        from strake_spark.plans.partial import analyze_partial, execute_partial

        partial = analyze_partial(spark, sql)
        if partial is None:
            _note(trace, "partial", "rejected",
                  "no remote scan gains from per-table filter/projection shipping")
        if partial is not None:
            rewritten, pplan = partial
            df = execute_partial(spark, rewritten, pplan)
            df.schema
            if sub_scans:  # report shipped subtrees alongside the scans
                pplan.scans = tuple(sub_scans) + tuple(pplan.scans)
                pplan.rewritten_sql = pplan.summary()
            _note(trace, "partial", "applied", f"{len(pplan.scans)} remote scan(s)")
            return df, pplan
    except Exception as e:  # noqa: BLE001 - any partial failure -> local
        if not allow_fallback:
            raise
        _note(trace, "partial", "failed", str(e))
        log.warning("partial pushdown failed (%s); executing locally", e)
    _note(trace, "local", "applied", "executing on Spark")
    if sub_scans:
        from strake_spark.plans.partial import PartialPlan

        pplan = PartialPlan(scans=tuple(sub_scans), local_sql=local_sql)
        pplan.rewritten_sql = pplan.summary()
        return spark.sql(local_sql), pplan
    return spark.sql(local_sql), ice_plan
