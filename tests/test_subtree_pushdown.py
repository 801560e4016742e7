"""Subquery-level federation: a single-source CTE / derived table in a
mixed statement ships WHOLE to the remote engine (join + aggregate run
there); results must equal fully-local execution; unsafe shapes must
degrade, never error."""

from __future__ import annotations

import duckdb
import pytest

import strake_spark as ss
from strake_spark.plans.federation import plan_sql
from strake_spark.plans.partial import PartialPlan
from strake_spark.plans.subtree import analyze_subtrees
from tests.conftest import SF_DIR, fuzz_examples


@pytest.fixture(scope="module")
def mixed(spark, tmp_path_factory):
    """DuckDB remote (orders, customer) + local parquet (nation)."""
    dpath = str(tmp_path_factory.mktemp("sub") / "sub.duckdb")
    con = duckdb.connect(dpath)
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    con.close()
    eng = ss.connect(
        {
            "sources": [
                {"name": "rm", "type": "duckdb", "url": dpath},
                {"name": "lc", "type": "parquet", "url": SF_DIR,
                 "tables": [{"name": "nation"}]},
            ]
        },
        spark=spark,
    )
    return eng


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSubtreeShipping:
    def test_cte_with_remote_join_ships_whole(self, mixed):
        sql = """
        WITH big AS (
          SELECT c.c_nationkey, count(*) AS n,
                 sum(CAST(o.o_totalprice AS DECIMAL(19,4))) AS total
          FROM rm_orders o JOIN rm_customer c ON o.o_custkey = c.c_custkey
          WHERE o.o_orderpriority = '1-URGENT'
          GROUP BY c.c_nationkey
        )
        SELECT nt.n_name, big.n, big.total
        FROM big JOIN lc_nation nt ON big.c_nationkey = nt.n_nationkey
        """
        df, plan = plan_sql(mixed.spark, sql)
        assert isinstance(plan, PartialPlan)
        ships = [s for s in plan.scans if s.temp_view.startswith("strake_sub_")]
        assert len(ships) == 1 and ships[0].view == "big"
        # the REMOTE statement contains the join + aggregate
        rs = ships[0].remote_sql.lower()
        assert "join" in rs and "group by" in rs and "sum(" in rs
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_derived_table_ships(self, mixed):
        sql = """
        SELECT nt.n_name, d.cnt
        FROM (SELECT c_nationkey, count(*) AS cnt
              FROM rm_customer WHERE c_acctbal > 0 GROUP BY c_nationkey) d
        JOIN lc_nation nt ON d.c_nationkey = nt.n_nationkey
        """
        df, plan = plan_sql(mixed.spark, sql)
        assert isinstance(plan, PartialPlan)
        ships = [s for s in plan.scans if s.temp_view.startswith("strake_sub_")]
        assert len(ships) == 1 and ships[0].view == "d"
        assert "group by" in ships[0].remote_sql.lower()
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_mixed_subquery_does_not_ship(self, mixed):
        # derived table touches BOTH remote and local -> no subtree ship
        sql = """
        SELECT d.n_name, d.cnt FROM (
          SELECT nt.n_name, count(*) AS cnt
          FROM rm_customer c JOIN lc_nation nt ON c.c_nationkey = nt.n_nationkey
          GROUP BY nt.n_name
        ) d
        """
        st = analyze_subtrees(mixed.spark, sql)
        assert st is None
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_outer_cte_reference_does_not_ship(self, mixed):
        # the inner derived table references an outer (local) CTE
        sql = """
        WITH keys AS (SELECT n_nationkey FROM lc_nation WHERE n_regionkey = 1)
        SELECT d.c_nationkey, d.cnt FROM (
          SELECT c_nationkey, count(*) AS cnt FROM rm_customer
          WHERE c_nationkey IN (SELECT n_nationkey FROM keys)
          GROUP BY c_nationkey
        ) d
        """
        st = analyze_subtrees(mixed.spark, sql)
        assert st is None
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_correlated_shape_degrades_not_errors(self, mixed):
        # qualified reference to an outer alias inside the subquery:
        # scope closure must reject the ship; execution stays correct
        sql = """
        SELECT nt.n_name,
               (SELECT count(*) FROM rm_customer c WHERE c.c_nationkey = nt.n_nationkey) AS cnt
        FROM lc_nation nt
        """
        st = analyze_subtrees(mixed.spark, sql)
        assert st is None  # correlated scalar subquery is not shippable
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_sibling_cte_chain(self, mixed):
        # CTE a is pure-remote (ships); CTE b references a (stays local)
        sql = """
        WITH a AS (SELECT c_nationkey, count(*) AS cnt FROM rm_customer GROUP BY c_nationkey),
             b AS (SELECT a.c_nationkey, a.cnt FROM a WHERE a.cnt > 0)
        SELECT nt.n_name, b.cnt
        FROM b JOIN lc_nation nt ON b.c_nationkey = nt.n_nationkey
        """
        df, plan = plan_sql(mixed.spark, sql)
        assert isinstance(plan, PartialPlan)
        ships = [s for s in plan.scans if s.temp_view.startswith("strake_sub_")]
        assert [s.view for s in ships] == ["a"]
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_explain_tree_reports_shipped_subtree(self, mixed):
        sql = """
        WITH big AS (
          SELECT c_nationkey, count(*) AS n FROM rm_customer GROUP BY c_nationkey
        )
        SELECT nt.n_name, big.n
        FROM big JOIN lc_nation nt ON big.c_nationkey = nt.n_nationkey
        """
        tree = mixed.explain_tree(sql)
        assert "PUSHED" in tree and "big" in tree


import hypothesis.strategies as st
from hypothesis import given, settings

_AGGS = st.sampled_from([
        "count(*)",
        "count(DISTINCT c_nationkey)",
        "min(c_custkey)",
        "max(c_custkey)",
        "sum(CAST(c_acctbal AS DECIMAL(19,4)))",
])
_FILTS = st.sampled_from([
    "", "WHERE c_acctbal > {n}", "WHERE c_custkey % 7 = {k}",
    "WHERE c_mktsegment = '{seg}'",
])
_HAVS = st.sampled_from(["", "HAVING count(*) > {h}"])


@st.composite
def _subtree_sql(draw):
    agg = draw(_AGGS)
    filt = draw(_FILTS).format(
        n=draw(st.integers(min_value=-5000, max_value=9000)),
        k=draw(st.integers(min_value=0, max_value=6)),
        seg=draw(st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"])),
    )
    hav = draw(_HAVS).format(h=draw(st.integers(min_value=0, max_value=5)))
    return (
        f"(SELECT c_nationkey, {agg} AS m FROM rm_customer {filt} "
        f"GROUP BY c_nationkey {hav}) d"
    )


class TestSubtreeProperty:
    """Generated single-source subtrees: shipped execution == local
    execution for every shape (aggregates, filters, HAVING)."""

    @settings(max_examples=fuzz_examples(30), deadline=None)
    @given(sub=_subtree_sql())
    def test_fuzzed_subtree_pushed_equals_local(self, mixed, sub):
        sql = f"""SELECT nt.n_name, d.m FROM {sub}
                  JOIN lc_nation nt ON d.c_nationkey = nt.n_nationkey"""
        st_result = analyze_subtrees(mixed.spark, sql)
        assert st_result is not None and len(st_result.scans) == 1
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))


class TestReductionHeuristic:
    def test_bare_projection_subquery_not_shipped(self, mixed):
        # no aggregate/distinct/limit/join: the partial rung's
        # partitioned scan should own this, not a single-connection pull
        sql = """
        SELECT d.c_name, nt.n_name
        FROM (SELECT c_name, c_nationkey FROM rm_customer WHERE c_acctbal > 0) d
        JOIN lc_nation nt ON d.c_nationkey = nt.n_nationkey
        """
        st_result = analyze_subtrees(mixed.spark, sql)
        assert st_result is None
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_limit_subquery_ships(self, mixed):
        sql = """
        SELECT d.c_custkey, nt.n_name
        FROM (SELECT c_custkey, c_nationkey FROM rm_customer
              ORDER BY c_custkey LIMIT 7) d
        JOIN lc_nation nt ON d.c_nationkey = nt.n_nationkey
        """
        st_result = analyze_subtrees(mixed.spark, sql)
        assert st_result is not None and len(st_result.scans) == 1
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_remote_join_subquery_ships_without_aggregate(self, mixed):
        sql = """
        SELECT d.c_name, nt.n_name
        FROM (SELECT c.c_name, c.c_nationkey FROM rm_customer c
              JOIN rm_orders o ON o.o_custkey = c.c_custkey
              WHERE o.o_orderpriority = '1-URGENT') d
        JOIN lc_nation nt ON d.c_nationkey = nt.n_nationkey
        """
        st_result = analyze_subtrees(mixed.spark, sql)
        assert st_result is not None and len(st_result.scans) == 1
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))


class TestExpressionSubqueries:
    def test_uncorrelated_scalar_subquery_does_not_corrupt(self, mixed):
        # expression subqueries (scalar/IN/EXISTS) must never be
        # replaced with a tableref; a shippable CTE in the SAME
        # statement must still ship
        sql = """
        WITH a AS (SELECT c_nationkey, count(*) AS cnt FROM rm_customer GROUP BY c_nationkey)
        SELECT nt.n_name, a.cnt
        FROM a JOIN lc_nation nt ON a.c_nationkey = nt.n_nationkey
        WHERE nt.n_nationkey < (SELECT count(*) FROM lc_nation)
        """
        df, plan = plan_sql(mixed.spark, sql)
        assert isinstance(plan, PartialPlan)
        ships = [s for s in plan.scans if s.temp_view.startswith("strake_sub_")]
        assert [s.view for s in ships] == ["a"]
        assert _rows(df) == _rows(mixed.spark.sql(sql))

    def test_remote_in_subquery_expression_stays_local(self, mixed):
        sql = """
        SELECT nt.n_name FROM lc_nation nt
        WHERE nt.n_nationkey IN (SELECT c_nationkey FROM rm_customer WHERE c_acctbal > 9000)
        """
        df, _ = plan_sql(mixed.spark, sql)
        assert _rows(df) == _rows(mixed.spark.sql(sql))


@pytest.fixture(scope="module")
def policied(spark, tmp_path_factory):
    """Remote DuckDB (customer with RLS, orders without) + local nation."""
    dpath = str(tmp_path_factory.mktemp("subp") / "subp.duckdb")
    con = duckdb.connect(dpath)
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    con.close()
    return ss.connect(
        {
            "sources": [
                {"name": "rp", "type": "duckdb", "url": dpath},
                {"name": "lp", "type": "parquet", "url": SF_DIR,
                 "tables": [{"name": "nation"}]},
            ],
            "policies": {
                "roles": {
                    "analyst": {
                        "tables": {"rp_customer": {"rls_filter": "c_nationkey = 1"}}
                    }
                },
                "users": {"alice": ["analyst"]},
            },
        },
        spark=spark,
    )


class TestPolicyInteraction:
    """RLS must never be bypassed by shipping a subtree: a policied
    remote table resolves to a LOCAL secured view, which blocks its
    subtree from shipping; unpolicied remote tables still ship."""

    SQL = """
    WITH cust AS (
      SELECT c_nationkey, count(*) AS cnt FROM rp_customer GROUP BY c_nationkey
    ),
    ords AS (
      SELECT o_custkey % 25 AS nk, count(*) AS n_orders FROM rp_orders GROUP BY o_custkey % 25
    )
    SELECT cust.c_nationkey, cust.cnt, ords.n_orders
    FROM cust JOIN ords ON cust.c_nationkey = ords.nk
    JOIN lp_nation nt ON nt.n_nationkey = cust.c_nationkey
    """

    def test_policied_table_stays_local_others_ship(self, policied):
        rewritten = policied._policies.rewrite(self.SQL, "alice")
        assert "rp_customer__rls" in rewritten  # secured view substituted
        st = analyze_subtrees(policied.spark, rewritten)
        assert st is not None
        ships = [s.view for s in st.scans]
        assert ships == ["ords"]  # customer CTE must NOT ship

    def test_rls_enforced_through_governed_path(self, policied):
        out = policied.execute(self.SQL, user="alice").to_pandas()
        assert set(out["c_nationkey"]) == {1}
        # without a user, no policy applies and both CTEs may ship
        full = policied.execute(self.SQL).to_pandas()
        assert len(full) > 1


class TestSubtreeDialects:
    """Shipped-subtree SQL must be respelled for the target dialect
    (the reference's FunctionMapper applies to every federated subtree,
    not just whole statements)."""

    def _fake_remote(self, spark, dialect):
        from strake_spark.sources.registry import REMOTE_TABLES, RemoteTable

        spark.createDataFrame(
            [(1, "a"), (2, "b")], "k long, name string"
        ).createOrReplaceTempView("dx_t")
        captured = {}

        def push(s, sql):
            captured["sql"] = sql
            return s.table("dx_t")

        REMOTE_TABLES["dx_t"] = RemoteTable(
            source="dx", dialect=dialect, url="fake://x", table="t", push_query=push
        )
        return captured

    def _cleanup(self):
        from strake_spark.sources.registry import REMOTE_TABLES

        REMOTE_TABLES.pop("dx_t", None)

    def test_mysql_respelling(self, spark):
        from strake_spark.plans.subtree import analyze_subtrees

        captured = self._fake_remote(spark, "mysql")
        try:
            st = analyze_subtrees(
                spark,
                """SELECT d.k, d.c FROM
                   (SELECT k, count(*) AS c FROM dx_t GROUP BY k) d
                   JOIN dx_local l ON l.k = d.k""",
            ) if spark.createDataFrame([(1,)], "k long").createOrReplaceTempView("dx_local") is None else None
            assert st is not None and len(st.scans) == 1
            rs = st.scans[0].remote_sql
            # remote name substituted, view name gone, no doublequoted
            # identifiers survive for MySQL
            assert "dx_t" not in rs and "FROM t" in rs
            assert '"' not in rs
            assert "count" in rs.lower()
        finally:
            self._cleanup()

    def test_postgres_keeps_double_quotes(self, spark):
        from strake_spark.plans.subtree import analyze_subtrees

        captured = self._fake_remote(spark, "postgres")
        try:
            spark.createDataFrame([(1,)], "k long").createOrReplaceTempView("dx_local")
            st = analyze_subtrees(
                spark,
                """SELECT d.k, d.c FROM
                   (SELECT k, count(*) AS c FROM dx_t GROUP BY k) d
                   JOIN dx_local l ON l.k = d.k""",
            )
            assert st is not None and len(st.scans) == 1
            rs = st.scans[0].remote_sql
            assert "count" in rs.lower() and "group by" in rs.lower()
            assert "`" not in rs  # postgres: no backticks
        finally:
            self._cleanup()
