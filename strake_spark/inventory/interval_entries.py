"""Range-join inventory entry: events within one hour after each
purchase by the same user — bucketed interval join vs the oracle's
plain inequality join."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators.interval import interval_join


@query(
    "range_join_events_after_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS follow_id,
           e.event_type AS follow_type
    FROM events e
    JOIN events p
      ON e.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND e.ts >= p.ts
     AND e.ts <= p.ts + INTERVAL 1 HOUR
     AND e.event_id <> p.event_id
    ORDER BY purchase_id, follow_id
    """,
    notes="range join via bucketed rewrite (equi-join on time bucket + exact recheck) — the scale path vs BroadcastNestedLoop",
)
def range_join_follow_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("win_end"),
    )
    points = e.select(
        F.col("event_id").alias("follow_id"),
        "user_id",
        "ts",
        F.col("event_type").alias("follow_type"),
    )
    joined = interval_join(
        points,
        purchases,
        point_time="ts",
        interval_start="win_start",
        interval_end="win_end",
        on=["user_id"],
        bucket_width=3600,
    )
    return (
        joined.filter(F.col("follow_id") != F.col("purchase_id"))
        .select("purchase_id", "follow_id", "follow_type")
        .orderBy("purchase_id", "follow_id")
    )
