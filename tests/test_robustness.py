"""Adversarial / robustness suite (reference:
crates/sql/tests/integration/robustness.rs — 12 tests covering
injection rejection, column collisions, nested aliasing, recursion
depth, kitchen-sink queries)."""

from __future__ import annotations

import pytest

import strake_spark as ss
from strake_spark.errors import QueryRejected, SourceError
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def rob_engine(spark):
    return ss.connect(
        {
            "sources": [
                {
                    "name": "rb",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [
                        {"name": "nation"},
                        {"name": "region"},
                        {"name": "orders"},
                        {"name": "customer"},
                        {"name": "lineitem"},
                    ],
                }
            ]
        },
        spark=spark,
    )


class TestInjection:
    @pytest.mark.parametrize(
        "stmt",
        [
            "DROP TABLE rb_nation",
            "DELETE FROM rb_nation",
            "INSERT INTO rb_nation VALUES (1,'x',2)",
            "UPDATE rb_nation SET n_name = 'x'",
            "CREATE TABLE pwned AS SELECT 1",
            "SELECT 1; DROP TABLE rb_nation",
            "  \n ; DROP TABLE rb_nation; SELECT 1",
            "TRUNCATE TABLE rb_nation",
            "ALTER TABLE rb_nation ADD COLUMN x INT",
            "SET spark.sql.shuffle.partitions=1",
        ],
    )
    def test_non_select_rejected(self, rob_engine, stmt):
        with pytest.raises(QueryRejected):
            rob_engine.sql(stmt)

    def test_with_cte_still_allowed(self, rob_engine):
        df = rob_engine.sql("WITH x AS (SELECT 1 AS a) SELECT a FROM x")
        assert df.collect()[0].a == 1

    def test_unsafe_identifier_in_describe(self, rob_engine):
        for bad in ('nation"; DROP', "a;b", "x`y"):
            with pytest.raises((QueryRejected, SourceError, Exception)):
                rob_engine.describe(bad)


class TestColumnCollisions:
    def test_join_with_same_column_names(self, rob_engine):
        # nation and region both expose their key with different names,
        # but a self-join creates true collisions — aliases must resolve
        df = rob_engine.sql(
            "SELECT a.n_name AS left_name, b.n_name AS right_name "
            "FROM rb_nation a JOIN rb_nation b ON a.n_regionkey = b.n_regionkey "
            "WHERE a.n_nationkey < b.n_nationkey"
        )
        rows = df.collect()
        assert len(rows) == 50  # C(5,2)=10 pairs per region x 5 regions
        assert all(r.left_name != r.right_name for r in rows)

    def test_triple_self_join(self, rob_engine):
        n = rob_engine.sql(
            "SELECT count(*) AS n FROM rb_region a "
            "JOIN rb_region b ON a.r_regionkey = b.r_regionkey "
            "JOIN rb_region c ON b.r_regionkey = c.r_regionkey"
        ).collect()[0].n
        assert n == 5


class TestNesting:
    def test_deeply_nested_subqueries(self, rob_engine):
        q = "SELECT r_regionkey FROM rb_region"
        for _ in range(20):
            q = f"SELECT r_regionkey FROM ({q})"
        assert rob_engine.sql(q).count() == 5

    def test_nested_aliases_shadowing(self, rob_engine):
        df = rob_engine.sql(
            "SELECT n_name AS n_regionkey, n_regionkey AS n_name "
            "FROM (SELECT n_name, n_regionkey FROM rb_nation) t LIMIT 3"
        )
        # swapped aliases must not cross wires
        r = df.collect()[0]
        assert isinstance(r.n_regionkey, str) and isinstance(r.n_name, int)


class TestKitchenSink:
    def test_everything_at_once(self, rob_engine, spark):
        """CTE + window + join + grouping sets + having + union +
        subquery + order/limit in one statement, checked vs DuckDB."""
        sql = """
        WITH big_orders AS (
          SELECT o_custkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM rb_orders
        ),
        tops AS (SELECT o_custkey, o_totalprice FROM big_orders WHERE rn = 1)
        SELECT c.c_mktsegment AS seg,
               count(*) AS n,
               CAST(SUM(CAST(t.o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS total
        FROM tops t JOIN rb_customer c ON t.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
        HAVING count(*) > 1
        UNION ALL
        SELECT 'ALL' AS seg, count(*) AS n, 0.0 AS total FROM tops
        ORDER BY seg
        """
        got = rob_engine.sql(sql).toPandas()
        import duckdb

        con = duckdb.connect()
        for t in ("orders", "customer"):
            con.execute(
                f"CREATE VIEW rb_{t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        exp = con.execute(sql).df()
        from tests.conftest import compare_frames

        compare_frames(got, exp)


class TestLimitsUnderAdversity:
    def test_defensive_limit_on_bare_select(self, rob_engine):
        df = rob_engine.sql("SELECT * FROM rb_lineitem")
        assert df.count() <= rob_engine.config.query_limits.default_limit

    def test_aggregate_exempt_from_defensive_limit(self, rob_engine):
        df = rob_engine.sql(
            "SELECT l_returnflag, count(*) AS n FROM rb_lineitem GROUP BY l_returnflag"
        )
        assert df.count() == 3  # A/N/R — not truncated to anything

    def test_explicit_limit_respected_not_doubled(self, rob_engine):
        df = rob_engine.sql("SELECT * FROM rb_lineitem LIMIT 7")
        assert df.count() == 7
