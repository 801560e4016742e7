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


class TestFunnelTwoStep:
    """Single-scan funnel (r17; replaces the 3-scan entry shape in
    r18 per the window contract): result parity with the legacy
    per-step formulation, plus the one-scan plan assertion."""

    def test_matches_legacy_three_scan_formulation(self, spark):
        from strake_spark.data import table
        from strake_spark.operators.relational import funnel_two_step
        from pyspark.sql import functions as F

        e = table(spark, SF_DIR, "events")
        got = funnel_two_step(e).toPandas()

        s = (
            e.filter(F.col("event_type") == "signup")
            .groupBy("user_id")
            .agg(F.min("ts").alias("signup_ts"))
        )
        p = (
            e.filter(F.col("event_type") == "purchase")
            .join(s, "user_id")
            .filter(F.col("ts") >= F.col("signup_ts"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("first_purchase_ts"))
        )
        legacy = (
            s.join(p.withColumnRenamed("user_id", "pu"),
                   s.user_id == F.col("pu"), "left")
            .select("user_id", "signup_ts", "first_purchase_ts",
                    F.col("pu").isNotNull().alias("converted"))
            .toPandas()
        )
        compare_frames(got, legacy)

    def test_one_scan_one_exchange(self, spark):
        """Both window minima stack on one user_id exchange, and the
        closing distinct's keys start with user_id, so Catalyst reuses
        that partitioning for the aggregate — one scan, ONE exchange,
        no join (the legacy shape had 3 scans and 4 exchanges)."""
        from strake_spark.data import table
        from strake_spark.operators.relational import funnel_two_step

        df = funnel_two_step(table(spark, SF_DIR, "events"))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 1
        body = plan.split("AdaptiveSparkPlan")[-1]
        assert body.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan

    def test_purchase_before_signup_does_not_convert(self, spark):
        import pandas as pd

        from strake_spark.operators.relational import funnel_two_step

        rows = pd.DataFrame(
            {
                "user_id": [1, 1, 2, 2],
                "event_type": ["purchase", "signup", "signup", "purchase"],
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-01", "2024-01-03"]
                ),
            }
        )
        out = (
            funnel_two_step(spark.createDataFrame(rows))
            .toPandas()
            .set_index("user_id")
        )
        assert not out.loc[1].converted  # purchase predates signup
        assert out.loc[2].converted
