"""Physical-plan assertions: the scale claims in docstrings must be
visible in the actual Catalyst plans — broadcast joins for dims, filter
pushdown reaching parquet scans, column pruning, partial aggregation,
top-k via TakeOrderedAndProject, and no Python row-loops in the query
path."""

from __future__ import annotations

import pytest

from strake_spark import inventory
from strake_spark.plans.tree import scan_pushdown_report
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = inventory.REGISTRY[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


class TestJoinStrategies:
    def test_q3_broadcasts_dimensions(self, spark):
        plan = _plan(spark, "tpch_q3_shipping_priority")
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan  # no fact-fact shuffle join here

    def test_q5_all_dims_broadcast(self, spark):
        plan = _plan(spark, "tpch_q5_local_supplier_volume")
        assert plan.count("BroadcastHashJoin") >= 4

    def test_semi_join_planned_for_exists(self, spark):
        plan = _plan(spark, "tpch_q4_order_priority")
        assert "LeftSemi" in plan

    def test_anti_join_planned(self, spark):
        plan = _plan(spark, "join_anti_customers_without_urgent_orders")
        assert "LeftAnti" in plan


class TestTopK:
    def test_q3_uses_take_ordered_not_global_sort(self, spark):
        plan = _plan(spark, "tpch_q3_shipping_priority")
        assert "TakeOrderedAndProject" in plan

    def test_q10_uses_take_ordered(self, spark):
        plan = _plan(spark, "tpch_q10_returned_items")
        assert "TakeOrderedAndProject" in plan


class TestAggregation:
    def test_q1_partial_aggregation(self, spark):
        plan = _plan(spark, "tpch_q1_pricing_summary")
        # partial (map-side) + final agg pair around the shuffle
        assert "partial_" in plan or plan.count("HashAggregate") >= 2

    def test_q1_whole_stage_codegen(self, spark):
        # codegen stages appear in the FINAL adaptive plan, so execute
        df = inventory.REGISTRY["tpch_q1_pricing_summary"].fn(spark, SF_DIR)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WholeStageCodegen" in plan or "*(" in plan


class TestScanPushdown:
    def test_q6_filters_reach_parquet(self, spark):
        df = inventory.REGISTRY["tpch_q6_forecast_revenue"].fn(spark, SF_DIR)
        report = scan_pushdown_report(df)
        pushed = " ".join(report["pushed_filters"])
        assert "l_shipdate" in pushed and "l_discount" in pushed

    def test_q6_column_pruning(self, spark):
        df = inventory.REGISTRY["tpch_q6_forecast_revenue"].fn(spark, SF_DIR)
        report = scan_pushdown_report(df)
        schema = " ".join(report["read_schema"])
        # only the needed lineitem columns are read, not all 11
        assert "l_extendedprice" in schema
        assert "l_returnflag" not in schema and "l_orderkey" not in schema

    def test_q19_or_predicate_still_prunes_columns(self, spark):
        df = inventory.REGISTRY["tpch_q19_discounted_revenue"].fn(spark, SF_DIR)
        schema = " ".join(scan_pushdown_report(df)["read_schema"])
        assert "l_shipdate" not in schema  # unused column never read


class TestBucketedRangeJoin:
    def test_no_nested_loop_join(self, spark):
        """The bucketed rewrite must plan as an equi (hash/SMJ) join —
        a raw inequality join would be BroadcastNestedLoop, the O(n*m)
        plan the operator exists to avoid."""
        plan = _plan(spark, "range_join_events_after_purchase")
        assert "BroadcastNestedLoopJoin" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan


class TestNoDriverLoops:
    @pytest.mark.parametrize(
        "name",
        [
            "dedup_minhash_lsh_candidates",
            "ann_cosine_topk_bruteforce",
            "text_language_id",
        ],
    )
    def test_pipeline_ops_are_single_plan(self, spark, name):
        """Training-pipeline operators must be one distributed plan —
        no collect() driven loops (a collect would crash here because
        the plan string would be empty / the fn would return data)."""
        df = inventory.REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert len(plan) > 0  # it IS a plan, not materialized data

    def test_row_at_a_time_python_udf_absent_in_tpch(self, spark):
        for name in (
            "tpch_q1_pricing_summary",
            "tpch_q3_shipping_priority",
            "tpch_q5_local_supplier_volume",
        ):
            plan = _plan(spark, name)
            assert "BatchEvalPython" not in plan, f"{name} uses row-wise Python"
            assert "PythonUDF" not in plan, f"{name} uses Python UDF"
