"""Same-source pushdown planner: analysis decisions, rewrite fidelity,
and the semantic property pushed-execution ≡ local-execution
(reference's flatten_joins_correctness.rs analog)."""

from __future__ import annotations

import sqlite3

import duckdb
import pytest

import strake_spark as ss
from strake_spark.plans import federation
from strake_spark.sources.registry import REMOTE_TABLES
from tests.conftest import SF_DIR, compare_frames


@pytest.fixture(scope="module")
def fed_engine(spark, tmp_path_factory):
    """Engine with a DuckDB source (nation/orders/customer), a SQLite
    source (region), and local parquet (lineitem)."""
    dpath = str(tmp_path_factory.mktemp("fed") / "fed.duckdb")
    con = duckdb.connect(dpath)
    for t in ("nation", "orders", "customer"):
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    con.close()
    spath = str(tmp_path_factory.mktemp("fed") / "fed.sqlite")
    scon = sqlite3.connect(spath)
    scon.execute("CREATE TABLE region (r_regionkey INTEGER, r_name TEXT)")
    rows = duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{SF_DIR}/region.parquet')"
    ).fetchall()
    scon.executemany("INSERT INTO region VALUES (?,?)", rows)
    scon.commit()
    scon.close()
    eng = ss.connect(
        {
            "sources": [
                {"name": "fdk", "type": "duckdb", "url": dpath},
                {"name": "flt", "type": "sqlite", "url": spath},
                {
                    "name": "loc",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [{"name": "lineitem"}],
                },
            ]
        },
        spark=spark,
    )
    return eng, dpath


PUSHED_QUERIES = [
    # join + aggregate entirely inside DuckDB
    """SELECT n.n_name, count(*) AS cnt, sum(o.o_totalprice) AS total
       FROM fdk_orders o
       JOIN fdk_customer c ON o.o_custkey = c.c_custkey
       JOIN fdk_nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
    # filter + projection
    "SELECT n_name, n_regionkey FROM fdk_nation WHERE n_regionkey >= 3",
    # subquery
    """SELECT o_orderpriority, count(*) AS n FROM fdk_orders
       WHERE o_custkey IN (SELECT c_custkey FROM fdk_customer WHERE c_acctbal > 5000)
       GROUP BY o_orderpriority""",
    # CTE whose name must not be treated as a base table
    """WITH big AS (SELECT * FROM fdk_orders WHERE o_totalprice > 100000)
       SELECT count(*) AS n FROM big""",
]


class TestAnalyze:
    def test_single_source_is_pushed(self, fed_engine):
        _eng, dpath = fed_engine
        plan = federation.analyze("SELECT n_name FROM fdk_nation WHERE n_regionkey = 1")
        assert plan is not None
        assert plan.remote.dialect == "duckdb"
        assert "fdk_nation" not in plan.rewritten_sql
        assert "nation" in plan.rewritten_sql

    def test_mixed_remote_sources_not_pushed(self, fed_engine):
        plan = federation.analyze(
            "SELECT * FROM fdk_nation n JOIN flt_region r ON n.n_regionkey = r.r_regionkey"
        )
        assert plan is None

    def test_local_table_disqualifies(self, fed_engine):
        plan = federation.analyze(
            "SELECT count(*) AS n FROM fdk_orders o JOIN loc_lineitem l ON o.o_orderkey = l.l_orderkey"
        )
        assert plan is None

    def test_unparseable_sql_not_pushed(self, fed_engine):
        assert federation.analyze("SELECT ??? FROM") is None

    def test_no_remote_tables_fast_path(self):
        saved = dict(REMOTE_TABLES)
        REMOTE_TABLES.clear()
        try:
            assert federation.analyze("SELECT 1") is None
        finally:
            REMOTE_TABLES.update(saved)


class TestDecisionTrace:
    """Every planning-ladder rung reports WHY it applied or rejected
    (r10, reference's unsupported-node warnings as explain data)."""

    def _decisions(self, spark, sql):
        t: list = []
        federation.plan_sql(spark, sql, trace=t)
        return {rung: (status, reason) for rung, status, reason in t}

    def test_mixed_contexts_reason(self, fed_engine):
        eng, _ = fed_engine
        d = self._decisions(
            eng.spark,
            "SELECT count(*) AS n FROM fdk_nation n JOIN flt_region r "
            "ON n.n_regionkey = r.r_regionkey",
        )
        status, reason = d["whole_statement"]
        assert status == "rejected" and "2 remote contexts" in reason

    def test_local_table_reason(self, fed_engine):
        eng, _ = fed_engine
        d = self._decisions(
            eng.spark,
            "SELECT count(*) AS n FROM fdk_orders o JOIN loc_lineitem l "
            "ON o.o_orderkey = l.l_orderkey",
        )
        status, reason = d["whole_statement"]
        assert status == "rejected" and "loc_lineitem" in reason
        # the ladder continued: partial rung applied (fdk_orders ships)
        assert d["partial"][0] == "applied"

    def test_pushed_statement_reports_context(self, fed_engine):
        eng, _ = fed_engine
        d = self._decisions(eng.spark, "SELECT count(*) AS n FROM fdk_nation")
        assert d["whole_statement"][0] == "pushed"

    def test_local_only_statement_walks_all_rungs(self, fed_engine):
        eng, _ = fed_engine
        d = self._decisions(eng.spark, "SELECT count(*) AS n FROM loc_lineitem")
        assert d["whole_statement"][0] == "rejected"
        assert d["subtree"][0] == "rejected"
        assert d["iceberg_prune"][0] == "rejected"
        assert d["partial"][0] == "rejected"
        assert d["local"][0] == "applied"

    def test_explain_tree_shows_decisions(self, fed_engine):
        eng, _ = fed_engine
        out = eng.explain_tree("SELECT count(*) AS n FROM loc_lineitem")
        assert "FederationDecision" in out
        assert "whole_statement" in out and "not remote-backed" in out
        # a fully pushed statement shows the remote header, not the footer
        pushed = eng.explain_tree("SELECT count(*) AS n FROM fdk_nation")
        assert "RemoteQuery [PUSHED]" in pushed
        assert "FederationDecision" not in pushed

    def test_trace_reports_decisions_and_param_skip(self, fed_engine):
        eng, _ = fed_engine
        rep = eng.trace("SELECT count(*) AS n FROM loc_lineitem")
        rungs = {d["rung"]: d for d in rep["federation_decision"]}
        assert rungs["whole_statement"]["status"] == "rejected"
        df = eng.sql(
            "SELECT count(*) AS n FROM fdk_nation WHERE n_regionkey = :r",
            params={"r": 1},
        )
        assert df.collect()[0].n == 5
        assert "parameterized" in eng._last_federation_trace[0][2]


class TestPushedEqualsLocal:
    @pytest.mark.parametrize("qidx", range(len(PUSHED_QUERIES)))
    def test_pushed_matches_local(self, fed_engine, qidx):
        eng, _ = fed_engine
        sql = PUSHED_QUERIES[qidx]
        df, plan = federation.plan_sql(eng.spark, sql)
        assert plan is not None, "expected pushdown"
        pushed_pdf = df.toPandas()
        local_pdf = eng.spark.sql(sql).toPandas()
        compare_frames(pushed_pdf, local_pdf)

    def test_engine_sql_uses_pushdown(self, fed_engine):
        eng, _ = fed_engine
        df = eng.sql("SELECT count(*) AS n FROM fdk_nation")
        assert eng._last_pushdown is not None
        assert df.collect()[0].n == 25

    def test_sqlite_whole_query_pushdown(self, fed_engine):
        eng, _ = fed_engine
        sql = "SELECT r_name, r_regionkey FROM flt_region WHERE r_regionkey < 3"
        df, plan = federation.plan_sql(eng.spark, sql)
        assert plan is not None and plan.remote.dialect == "sqlite"
        local = eng.spark.sql(sql).toPandas()
        compare_frames(df.toPandas(), local)

    def test_sqlite_aggregate_pushdown_dialect_fix(self, fed_engine):
        """count(*) unparses as DuckDB count_star(); the dialect-fix
        layer must respell it before SQLite executes the pushed query."""
        eng, _ = fed_engine
        sql = "SELECT r_regionkey, count(*) AS n FROM flt_region GROUP BY r_regionkey"
        df, plan = federation.plan_sql(eng.spark, sql)
        assert plan is not None and "count_star" not in plan.rewritten_sql
        compare_frames(df.toPandas(), eng.spark.sql(sql).toPandas())

    def test_spark_only_function_falls_back(self, fed_engine):
        eng, _ = fed_engine
        # xxhash64 exists in Spark, not DuckDB: parse fails -> local path
        sql = "SELECT xxhash64(n_name) AS h FROM fdk_nation"
        df, plan = federation.plan_sql(eng.spark, sql)
        assert df.count() == 25
