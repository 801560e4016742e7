"""Salted join correctness + salt distribution, and bucketed joins
planning without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.operators.skew import salted_join, write_bucketed
from tests.conftest import SF_DIR, compare_frames


class TestSaltedJoin:
    def test_same_result_as_plain_join(self, spark):
        o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        c = table(spark, SF_DIR, "customer").select("c_custkey", "c_name").withColumnRenamed("c_custkey", "o_custkey")
        plain = o.join(c, "o_custkey").toPandas()
        salted = salted_join(o, c, on="o_custkey", num_salts=4).toPandas()
        compare_frames(salted, plain)

    def test_left_join_preserved(self, spark):
        o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
        # half the customers only
        c = (
            table(spark, SF_DIR, "customer")
            .filter("c_custkey % 2 = 0")
            .select(F.col("c_custkey").alias("o_custkey"), "c_name")
        )
        plain = o.join(c, "o_custkey", "left").toPandas()
        salted = salted_join(o, c, on="o_custkey", num_salts=4, how="left").toPandas()
        compare_frames(salted, plain)

    def test_hot_key_spreads_over_salts(self, spark):
        # a pathological frame: one key owns 90% of rows
        hot = spark.range(10000).select(
            F.when(F.col("id") < 9000, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        salts = (
            hot.withColumn(
                "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in hot.columns]), F.lit(8))
            )
            .filter("k = 7")
            .groupBy("__salt")
            .count()
            .collect()
        )
        assert len(salts) == 8  # the hot key really lands in 8 sub-partitions
        assert max(r["count"] for r in salts) < 9000 * 0.5


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        import uuid

        db = f"bkt_{uuid.uuid4().hex[:8]}"
        spark.sql(f"CREATE DATABASE {db}")
        o = table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        l = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(o, f"{db}.orders_b", ["o_orderkey"], num_buckets=8)
        write_bucketed(
            l.withColumnRenamed("l_orderkey", "o_orderkey"),
            f"{db}.lineitem_b",
            ["o_orderkey"],
            num_buckets=8,
        )
        # disable broadcast so the planner must consider co-location
        # (at real scale neither side broadcasts anyway)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(f"{db}.orders_b").join(
                spark.table(f"{db}.lineitem_b"), "o_orderkey"
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan  # co-located: no shuffle at all
            assert "Bucketed: true" in plan
            # and it's still correct
            expect = o.join(
                l.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
            ).count()
            assert joined.count() == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
