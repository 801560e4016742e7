"""distinct_on / schema_adapter operator helpers vs DuckDB's native
DISTINCT ON."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strake_spark.data import table
from strake_spark.operators.relational import distinct_on, schema_adapter
from tests.conftest import SF_DIR, compare_frames


class TestDistinctOn:
    def test_matches_duckdb_distinct_on(self, spark):
        o = table(spark, SF_DIR, "orders")
        got = distinct_on(
            o.select("o_custkey", "o_orderkey", "o_totalprice"),
            on=["o_custkey"],
            order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        ).toPandas()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
        )
        exp = con.execute(
            "SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_totalprice "
            "FROM orders ORDER BY o_custkey, o_totalprice DESC, o_orderkey"
        ).df()
        compare_frames(got, exp)

    def test_no_order_keeps_one_per_key(self, spark):
        n = table(spark, SF_DIR, "nation")
        out = distinct_on(n, on=["n_regionkey"])
        assert out.count() == 5

    def test_single_shuffle_plan(self, spark):
        o = table(spark, SF_DIR, "orders")
        out = distinct_on(
            o, on=["o_custkey"], order_by=[F.col("o_orderdate").desc()]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1  # exactly the partition-by shuffle


class TestSchemaAdapter:
    def test_cast_and_fill(self, spark):
        df = spark.createDataFrame([(1, "x")], "a int, b string")
        out = schema_adapter(
            df,
            T.StructType(
                [
                    T.StructField("A", T.LongType()),
                    T.StructField("b", T.StringType()),
                    T.StructField("c", T.DoubleType()),
                ]
            ),
        )
        r = out.collect()[0]
        assert r.A == 1 and r.b == "x" and r.c is None
