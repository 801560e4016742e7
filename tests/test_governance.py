"""Governance lifecycle: timeout cancellation, cost gate, output-row
cap, per-source default limit, and the full gate->limit->cost->timeout->
cache pipeline on one engine (reference federation.rs:342-490)."""

from __future__ import annotations

import pytest

import strake_spark as ss
from strake_spark.errors import BudgetExceeded, QueryRejected, QueryTimeout
from tests.conftest import SF_DIR


class TestTimeout:
    def test_slow_query_cancelled(self, spark):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "tm", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "lineitem"}]}
                ],
                "query_limits": {"query_timeout_seconds": 2.0,
                                 "max_output_rows": 100000000,
                                 "default_limit": 0},
            },
            spark=spark,
        )
        # a heavy cross-join that cannot finish in 2s
        with pytest.raises(QueryTimeout, match="jobs cancelled"):
            eng.execute(
                "SELECT count(*) AS n FROM tm_lineitem a, tm_lineitem b, tm_lineitem c "
                "WHERE a.l_orderkey + b.l_orderkey + c.l_orderkey > 0"
            )
        # the session remains usable afterwards
        assert eng.execute("SELECT 1 AS one").to_pylist() == [{"one": 1}]


class TestCostGate:
    def test_byte_budget_rejects_wide_scan(self, spark):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "cg", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "lineitem"}]}
                ],
                "query_limits": {"max_estimated_bytes": 10},
            },
            spark=spark,
        )
        with pytest.raises(BudgetExceeded, match="max_estimated_bytes"):
            eng.sql("SELECT * FROM cg_lineitem")

    def test_narrow_query_passes_budget(self, spark):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "cn", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "region"}]}
                ],
                "query_limits": {"max_estimated_bytes": 100_000_000},
            },
            spark=spark,
        )
        assert eng.sql("SELECT r_name FROM cn_region").count() == 5


class TestOutputRows:
    def test_max_output_rows_enforced(self, spark):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "mo", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "orders"}]}
                ],
                # defensive limit off so the agg-free query hits the cap
                "query_limits": {"max_output_rows": 10, "default_limit": 0},
            },
            spark=spark,
        )
        with pytest.raises(QueryRejected, match="max_output_rows"):
            eng.execute("SELECT o_orderkey FROM mo_orders")
        # within cap is fine
        assert eng.execute("SELECT o_orderkey FROM mo_orders LIMIT 5").num_rows == 5


class TestSourceDefaultLimit:
    def test_per_source_row_cap(self, spark):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "sl", "type": "parquet", "url": SF_DIR,
                     "default_limit": 3, "tables": [{"name": "orders"}]}
                ]
            },
            spark=spark,
        )
        assert eng.spark.table("sl_orders").count() == 3


class TestParameterizedQueries:
    @pytest.fixture(scope="class")
    def peng(self, spark):
        return ss.connect(
            {
                "sources": [
                    {"name": "pq", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "nation"}, {"name": "customer"}]}
                ]
            },
            spark=spark,
        )

    def test_named_params_bind(self, peng):
        t = peng.execute(
            "SELECT count(*) AS n FROM pq_nation WHERE n_regionkey = :rk",
            params={"rk": 2},
        )
        assert t.to_pylist() == [{"n": 5}]

    def test_params_cannot_inject(self, peng):
        # the classic payload arrives as a VALUE, not syntax
        t = peng.execute(
            "SELECT count(*) AS n FROM pq_customer WHERE c_name = :name",
            params={"name": "' OR '1'='1"},
        )
        assert t.to_pylist() == [{"n": 0}]

    def test_gate_precedes_binding(self, peng):
        from strake_spark.errors import QueryRejected

        with pytest.raises(QueryRejected):
            peng.sql("DROP TABLE pq_nation", params={"x": 1})

    def test_metrics_counters(self, peng):
        m = peng.metrics()
        assert m["queries_executed"] >= 2
        assert m["sources_registered"] == 1
        assert "breaker_states" in m


class TestFullLifecycle:
    def test_everything_on_one_engine(self, spark, tmp_path):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "fl", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "customer"}, {"name": "orders"}]}
                ],
                "cache": {"enabled": True, "directory": str(tmp_path / "c")},
                "policies": {
                    "roles": {"ana": {"tables": {"fl_customer": {
                        "rls_filter": "c_nationkey < 10"}}}},
                    "users": {"eve": ["ana"]},
                },
            },
            spark=spark,
        )
        q = ("SELECT count(*) AS n FROM fl_customer c "
             "JOIN fl_orders o ON c.c_custkey = o.o_custkey")
        open_n = eng.execute(q).to_pylist()[0]["n"]
        gov_n = eng.execute(q, user="eve").to_pylist()[0]["n"]
        assert gov_n < open_n
        # cached replay per user identity
        again = eng.execute(q, user="eve").to_pylist()[0]["n"]
        assert again == gov_n
        assert eng.query_log()[-1]["cached"] is True
        # injection still rejected with everything enabled
        with pytest.raises(QueryRejected):
            eng.execute("DROP TABLE fl_customer", user="eve")


class TestEngineLifecycle:
    def test_close_and_context_manager(self, spark):
        import strake_spark as ss
        from tests.conftest import SF_DIR

        with ss.connect(
            {"sources": [{"name": "lc", "type": "parquet", "url": SF_DIR,
                          "tables": [{"name": "region"}]}]},
            spark=spark,
        ) as eng:
            assert eng.execute("SELECT count(*) AS n FROM lc_region").to_pylist() == [{"n": 5}]
        # closed: log cleared, cache dropped, session still usable
        assert eng.query_log() == []
        assert eng._cache is None
        assert spark.sql("SELECT 1 AS one").collect()[0].one == 1
