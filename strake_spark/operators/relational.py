"""Relational helper operators the reference ships as plan rewrites.

- distinct_on: Postgres DISTINCT ON semantics. The reference rewrites
  it to a ROW_NUMBER-over-window subquery when a dialect lacks it
  (crates/sql/src/sql_generator/set_ops.rs:321-496
  rewrite_distinct_on_to_row_number). Spark also lacks DISTINCT ON, so
  the same rewrite is the implementation: row_number over (PARTITION BY
  on-keys ORDER BY order-keys) = 1. With no ordering, dropDuplicates
  (arbitrary survivor, matching Postgres' unspecified-order behavior).
- schema_adapter: the SchemaAdapter extension node
  (crates/sql/src/schema_adapter.rs:17-80) — adapt a frame to a target
  schema by name with casts, surfacing as a plain projection.

At scale: the window runs one shuffle on the DISTINCT ON keys —
identical cost to the groupBy it replaces; no extra pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def distinct_on(
    df: DataFrame,
    on: Sequence[str | Column],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """Keep the first row per ``on``-key group, "first" defined by
    ``order_by`` (ties broken arbitrarily-but-deterministically by the
    full ordering given)."""
    if not order_by:
        return df.dropDuplicates([c if isinstance(c, str) else str(c) for c in on])
    keys = [F.col(c) if isinstance(c, str) else c for c in on]
    w = Window.partitionBy(*keys).orderBy(*order_by)
    rn = F.row_number().over(w)
    return (
        df.withColumn("__strake_rn", rn)
        .filter(F.col("__strake_rn") == 1)
        .drop("__strake_rn")
    )


def schema_adapter(df: DataFrame, target: T.StructType) -> DataFrame:
    """Adapt ``df`` to ``target`` by column name (case-insensitive):
    cast matches, NULL-fill missing — the SchemaAdapter node lowered to
    a projection (schema_adapter.rs lowers to Projection for unparsing;
    Catalyst folds this into the scan)."""
    from strake_spark.sources.drift import reconcile

    return reconcile(df, target, context="schema_adapter")


def funnel_two_step(
    events: DataFrame,
    first_type: str = "signup",
    then_type: str = "purchase",
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Two-step funnel in ONE corpus scan: per entity, the first
    ``first_type`` event and the first ``then_type`` event AT OR AFTER
    it, plus a converted flag.

    Shape (r17 duplicate-scan audit): the legacy formulation (filter
    per step, aggregate each, join back) scans the event table once
    PER STEP. Here both step timestamps are same-partition window
    minima — the second conditions on the first's result column, which
    Spark stacks on ONE hash exchange — and the closing distinct's
    keys start with the partition key, so Catalyst reuses that
    partitioning for the aggregate too. Net: ONE scan, ONE exchange,
    no join (plan-asserted); more steps would still be one scan.

    Deterministic output: one row per entity that performed
    ``first_type``; converted = a ``then_type`` event exists at or
    after the first ``first_type`` timestamp.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col)
    step1 = F.min(
        F.when(F.col(type_col) == first_type, F.col(ts_col))
    ).over(w)
    with1 = events.withColumn("_step1_ts", step1)
    step2 = F.min(
        F.when(
            (F.col(type_col) == then_type)
            & (F.col(ts_col) >= F.col("_step1_ts")),
            F.col(ts_col),
        )
    ).over(w)
    return (
        with1.withColumn("_step2_ts", step2)
        .filter(F.col("_step1_ts").isNotNull())
        .select(
            F.col(id_col),
            F.col("_step1_ts").alias(f"{first_type}_ts"),
            F.col("_step2_ts").alias(f"first_{then_type}_ts"),
            F.col("_step2_ts").isNotNull().alias("converted"),
        )
        .distinct()
    )
