"""As-of join inventory entries — verified against DuckDB's NATIVE
ASOF JOIN, which is the strongest oracle available: an independent
engine's built-in implementation of the same semantics.

Scenario: for each purchase event, the user's most recent click at or
before the purchase. Right side deduplicated to one row per
(user, ts) — max event_id wins — so ties are deterministic in both
engines."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators.asof import asof_join


def _sides(spark: SparkSession, sf_dir: str):
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    clicks = (
        e.filter(F.col("event_type") == "click")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "ts", F.col("value").alias("click_value"))
    )
    return purchases, clicks


_ORACLE_CTE = """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, ts, value AS click_value
      FROM (
        SELECT user_id, ts, value,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'click'
      ) WHERE rn = 1
    )
"""


@query(
    "asof_join_backward",
    oracle=_ORACLE_CTE
    + """
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_asof, c.click_value AS click_value_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.event_id
    """,
    notes="as-of join (backward): union + last-known-value window, one shuffle; oracle = DuckDB native ASOF LEFT JOIN",
)
def asof_backward(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, clicks = _sides(spark, sf_dir)
    return asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
        right_cols=["click_value"],
    ).orderBy("event_id")


@query(
    "asof_join_forward",
    oracle=_ORACLE_CTE
    + """
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_asof, c.click_value AS click_value_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts <= c.ts
    ORDER BY p.event_id
    """,
    notes="as-of join (forward): earliest right row at-or-after each left time",
)
def asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, clicks = _sides(spark, sf_dir)
    return asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
        right_cols=["click_value"], direction="forward",
    ).orderBy("event_id")


@query(
    "asof_join_nearest",
    oracle=_ORACLE_CTE
    + """
    SELECT p.event_id, p.user_id, p.ts,
           c.ts AS ts_asof, c.click_value AS click_value_asof
    FROM purchases p
    LEFT JOIN LATERAL (
      SELECT c.ts, c.click_value
      FROM clicks c WHERE c.user_id = p.user_id
      ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts
      LIMIT 1
    ) c ON TRUE
    ORDER BY p.event_id
    """,
    notes=(
        "as-of join (nearest): the closest click in either direction, "
        "ties to the at-or-before side — both direction fills share one "
        "hash partitioning (one shuffle, two sorts). Oracle = DuckDB "
        "LEFT JOIN LATERAL with ORDER BY abs(time delta), ts LIMIT 1 "
        "(O(n*m) per key — oracle-only shape; clicks are deduped per "
        "(user, ts) so the tie order is total)"
    ),
)
def asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    purchases, clicks = _sides(spark, sf_dir)
    return asof_join(
        purchases, clicks, on=["user_id"], left_time="ts", right_time="ts",
        right_cols=["click_value"], direction="nearest",
    ).orderBy("event_id")
