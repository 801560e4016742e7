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
