"""Column-level lineage (plans/lineage.py): output columns must map to
the registered view columns that feed them, through aliases, derived
tables, CTEs, joins, stars, and set operations."""

from __future__ import annotations

import pytest

import strake_spark as ss
from strake_spark.plans.lineage import column_lineage
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return ss.connect(
        {
            "sources": [
                {
                    "name": "g",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [{"name": "customer"}, {"name": "orders"}, {"name": "nation"}],
                }
            ]
        },
        spark=spark,
    )


class TestLineage:
    def test_simple_projection_and_alias(self, eng):
        lin = eng.lineage("SELECT c_name AS customer_name, c_acctbal FROM g_customer")
        assert lin["outputs"]["customer_name"] == ["g_customer.c_name"]
        assert lin["outputs"]["c_acctbal"] == ["g_customer.c_acctbal"]
        assert lin["unresolved"] == []

    def test_expression_combines_columns(self, eng):
        lin = eng.lineage(
            "SELECT c_acctbal * 2 + c_custkey AS score FROM g_customer"
        )
        assert lin["outputs"]["score"] == ["g_customer.c_acctbal", "g_customer.c_custkey"]

    def test_join_with_qualifiers(self, eng):
        lin = eng.lineage(
            """SELECT c.c_name, o.o_totalprice
               FROM g_customer c JOIN g_orders o ON c.c_custkey = o.o_custkey"""
        )
        assert lin["outputs"]["c_name"] == ["g_customer.c_name"]
        assert lin["outputs"]["o_totalprice"] == ["g_orders.o_totalprice"]

    def test_derived_table_and_cte(self, eng):
        lin = eng.lineage(
            """WITH big AS (
                 SELECT o_custkey, sum(o_totalprice) AS total FROM g_orders GROUP BY o_custkey
               )
               SELECT d.nk, big.total
               FROM (SELECT c_nationkey AS nk, c_custkey FROM g_customer) d
               JOIN big ON big.o_custkey = d.c_custkey"""
        )
        assert lin["outputs"]["nk"] == ["g_customer.c_nationkey"]
        assert lin["outputs"]["total"] == ["g_orders.o_totalprice"]

    def test_star_expansion(self, eng):
        lin = eng.lineage("SELECT * FROM g_nation")
        assert lin["outputs"]["n_name"] == ["g_nation.n_name"]
        assert lin["outputs"]["n_regionkey"] == ["g_nation.n_regionkey"]

    def test_qualified_star(self, eng):
        lin = eng.lineage(
            """SELECT n.* FROM g_nation n JOIN g_customer c ON c.c_nationkey = n.n_nationkey"""
        )
        assert lin["outputs"]["n_name"] == ["g_nation.n_name"]
        assert "c_name" not in lin["outputs"]

    def test_set_operation_merges_positionally(self, eng):
        lin = eng.lineage(
            """SELECT c_name AS who FROM g_customer
               UNION ALL SELECT n_name FROM g_nation"""
        )
        assert lin["outputs"]["who"] == ["g_customer.c_name", "g_nation.n_name"]

    def test_unresolved_reported_not_guessed(self, eng):
        lin = eng.lineage("SELECT no_such_col FROM g_customer")
        assert lin["outputs"]["no_such_col"] == []
        assert "no_such_col" in lin["unresolved"]

    def test_unparseable_raises(self, eng):
        # an audit surface must fail loudly, never report an empty
        # (all-clear-looking) result for a statement it could not parse
        with pytest.raises(ValueError, match="did not parse"):
            column_lineage(eng.spark, "SELECT FROM WHERE")

    def test_non_select_rejected(self, eng):
        from strake_spark.governance.gate import QueryRejected

        with pytest.raises(QueryRejected):
            eng.lineage("DROP TABLE g_customer")


@pytest.fixture(scope="module")
def policied_eng(spark):
    return ss.connect(
        {
            "sources": [
                {
                    "name": "m",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [{"name": "customer"}, {"name": "nation"}],
                }
            ],
            "policies": {
                "roles": {
                    "analyst": {
                        "tables": {"m_customer": {"masking": {"c_name": "'***'"}}}
                    }
                },
                "users": {"alice": ["analyst"], "bob": []},
            },
        },
        spark=spark,
    )


class TestMaskingAudit:
    SQL = """SELECT c.c_name AS who, upper(c.c_name) AS shout, n.n_name
             FROM m_customer c JOIN m_nation n ON c.c_nationkey = n.n_nationkey"""

    def test_masked_column_taints_derived_outputs(self, policied_eng):
        audit = policied_eng.masking_audit(self.SQL, "alice")
        assert audit["tainted"] == ["shout", "who"]
        assert audit["outputs"]["who"] == ["m_customer.c_name"]
        assert audit["outputs"]["shout"] == ["m_customer.c_name"]
        assert audit["outputs"]["n_name"] == []

    def test_role_without_masking_is_clean(self, policied_eng):
        audit = policied_eng.masking_audit(self.SQL, "bob")
        assert audit["tainted"] == []


class TestFilterLineage:
    def test_where_and_join_columns_tracked(self, eng):
        lin = eng.lineage(
            """SELECT c.c_name FROM g_customer c
               JOIN g_orders o ON c.c_custkey = o.o_custkey
               WHERE o.o_totalprice > 100"""
        )
        assert "g_orders.o_totalprice" in lin["filters"]
        assert "g_customer.c_custkey" in lin["filters"]
        assert "g_orders.o_custkey" in lin["filters"]

    def test_derived_table_filters_trace_to_base(self, eng):
        lin = eng.lineage(
            """SELECT d.c_name FROM
               (SELECT c_name FROM g_customer WHERE c_acctbal > 0) d"""
        )
        assert "g_customer.c_acctbal" in lin["filters"]

    def test_filter_tainted_in_masking_audit(self, policied_eng):
        audit = policied_eng.masking_audit(
            "SELECT c_custkey FROM m_customer WHERE c_name = 'x'", "alice"
        )
        assert audit["tainted"] == []  # output clean
        assert audit["filter_tainted"] == ["m_customer.c_name"]  # but rows steered by masked col


class TestExpressionSubqueryLineage:
    def test_in_subquery_columns_reach_filters(self, eng):
        lin = eng.lineage(
            """SELECT c_custkey FROM g_customer
               WHERE c_custkey IN (SELECT o_custkey FROM g_orders WHERE o_totalprice > 10)"""
        )
        assert "g_orders.o_custkey" in lin["filters"]
        assert "g_orders.o_totalprice" in lin["filters"]

    def test_scalar_subquery_feeds_output(self, eng):
        lin = eng.lineage(
            "SELECT (SELECT max(c_acctbal) FROM g_customer) AS top FROM g_nation"
        )
        assert lin["outputs"]["top"] == ["g_customer.c_acctbal"]

    def test_case_insensitive_reference(self, eng):
        lin = eng.lineage("SELECT C_NAME FROM g_customer")
        assert lin["outputs"]["C_NAME"] == ["g_customer.c_name"]
        assert lin["unresolved"] == []

    def test_cte_on_set_operation(self, eng):
        lin = eng.lineage(
            """WITH w AS (SELECT c_name FROM g_customer)
               SELECT c_name FROM w UNION ALL SELECT n_name FROM g_nation"""
        )
        assert lin["outputs"]["c_name"] == ["g_customer.c_name", "g_nation.n_name"]

    def test_alias_collision_with_reserved_keys_safe(self, eng):
        lin = eng.lineage("SELECT c_name AS filters FROM g_customer")
        assert lin["outputs"]["filters"] == ["g_customer.c_name"]  # not clobbered


class TestImpactAnalysis:
    def test_impact_over_explicit_statements(self, eng):
        report = eng.impact(
            "g_customer.c_acctbal",
            queries=[
                "SELECT c_acctbal * 2 AS x FROM g_customer",        # output hit
                "SELECT c_name FROM g_customer WHERE c_acctbal > 0",  # filter hit
                "SELECT n_name FROM g_nation",                        # no hit
                "SELECT BROKEN FROM",                                 # unanalyzable
            ],
        )
        assert len(report["impacted"]) == 2
        assert report["impacted"][0]["outputs"] == ["x"]
        assert report["impacted"][1]["filter"] is True
        assert report["unanalyzable"] == ["SELECT BROKEN FROM"]

    def test_impact_reads_query_log(self, eng):
        eng.execute("SELECT c_name FROM g_customer WHERE c_custkey < 5")
        report = eng.impact("g_customer.c_custkey")
        assert any(h["filter"] for h in report["impacted"])


import hypothesis.strategies as hst
from hypothesis import given, settings

_COLS = {
    "g_customer": ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    "g_orders": ["o_orderkey", "o_custkey", "o_totalprice"],
    "g_nation": ["n_nationkey", "n_name"],
}
_PROJ = hst.sampled_from([
    "c.c_name AS a1", "c.c_acctbal * 2 AS a2", "upper(c.c_name) AS a3",
    "o.o_totalprice AS a4", "c.c_custkey + o.o_orderkey AS a5",
])
_FILT = hst.sampled_from([
    "", "WHERE c.c_acctbal > 0", "WHERE o.o_totalprice < 100 AND c.c_custkey > 3",
    "WHERE c.c_nationkey IN (SELECT n_nationkey FROM g_nation)",
])


@hst.composite
def _queries(draw):
    projs = draw(hst.lists(_PROJ, min_size=1, max_size=3, unique=True))
    filt = draw(_FILT)
    wrap = draw(hst.booleans())
    sql = (
        f"SELECT {', '.join(projs)} FROM g_customer c "
        f"JOIN g_orders o ON c.c_custkey = o.o_custkey {filt}"
    )
    if wrap:
        sql = f"SELECT * FROM ({sql}) inner_q"
    return sql


class TestLineageSoundness:
    """Every reported source must NAME A REAL COLUMN of a real view;
    nothing may crash; nothing legitimate may land in unresolved."""

    @settings(max_examples=25, deadline=None)
    @given(sql=_queries())
    def test_fuzzed_lineage_sound(self, eng, sql):
        lin = eng.lineage(sql)
        assert lin["unresolved"] == []
        assert lin["outputs"]
        for srcs in list(lin["outputs"].values()) + [lin["filters"]]:
            for s in srcs:
                view, col = s.rsplit(".", 1)
                assert col in _COLS[view], s
