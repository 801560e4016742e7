from strake_spark.plans.tree import format_plan_tree

__all__ = ["format_plan_tree"]
