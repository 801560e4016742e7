"""Event-stream analytics over the events table (batch expressions of
streaming-shaped computations; the Structured Streaming variants live in
strake_spark.streaming and are smoke-tested separately — the reference
itself has no streaming subsystem, SURVEY §2.6).

props is a JSON string column — JSON extraction is part of the surface
(the reference ingests nested JSON from REST sources, rest.rs:564).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import dec


@query(
    "events_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(19,6))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
    notes="tumbling time-window aggregation (batch form of a streaming windowed agg)",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", "decimal(19,6)")).cast("double").alias("total_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_sessionization",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_id, ts,
               CASE WHEN date_diff('second',
                        LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                        ts) > 1800
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM ordered
    )
    SELECT user_id, session_seq, COUNT(*) AS n_events,
           date_diff('second', MIN(ts), MAX(ts)) AS duration_s
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    notes="gap-based sessionization (30 min): lag -> new-session flag -> running sum -> per-session agg",
)
def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
    flagged = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("is_new_session"),
    )
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    sessions = flagged.withColumn("session_seq", F.sum("is_new_session").over(run))
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max(F.col("ts").cast("long")) - F.min(F.col("ts").cast("long"))).alias("duration_s"),
    )


@query(
    "events_json_props",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
    notes="JSON property extraction from a string column (REST-source shape, rest.rs:564)",
)
def events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).cast("long").alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@query(
    "events_top_users_per_type",
    oracle="""
    SELECT * FROM (
        SELECT event_type, user_id, COUNT(*) AS n_events,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY COUNT(*) DESC, user_id) AS rnk
        FROM events
        GROUP BY event_type, user_id) t
    WHERE rnk <= 5
    """,
    notes="top-k per group: agg then windowed rank — two shuffles total, no global sort",
)
def events_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = W.partitionBy("event_type").orderBy(F.col("n_events").desc(), "user_id")
    return counts.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


@query(
    "events_cohort_retention",
    oracle="""
    WITH uw AS (
      SELECT user_id, date_trunc('week', ts) AS w
      FROM events GROUP BY user_id, date_trunc('week', ts)
    ),
    c AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id)
    SELECT c.cw AS cohort_week,
           CAST(date_diff('day', c.cw, uw.w) / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT uw.user_id) AS n_users
    FROM uw JOIN c ON uw.user_id = c.user_id
    GROUP BY c.cw, week_offset
    ORDER BY cohort_week, week_offset
    """,
    notes=(
        "weekly cohort retention: cohort = first active week per user, "
        "then distinct active users per (cohort, week offset) — the "
        "standard retention triangle. Two aggregates + one join; the "
        "per-user first-week side is small (one row per user) so AQE "
        "broadcasts it at any realistic scale; offsets are exact "
        "(Monday-truncated weeks in both engines, day-diff / 7)"
    ),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    ).distinct()
    c = uw.groupBy("user_id").agg(F.min("w").alias("cw"))
    return (
        uw.join(c, "user_id")
        .select(
            F.col("cw").alias("cohort_week"),
            (F.datediff(F.col("w"), F.col("cw")) / 7).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "events_rolling_active_users",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d FROM events
    ),
    ue AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS ed
      FROM events
    )
    SELECT days.d AS day,
           COUNT(DISTINCT ue.user_id) AS active_7d
    FROM days JOIN ue
      ON ue.ed <= days.d AND ue.ed > days.d - INTERVAL 7 DAY
    GROUP BY days.d ORDER BY day
    """,
    notes=(
        "trailing 7-day active users per day — the WAU curve. Distinct "
        "(user, day) pairs range-join the day spine (each pair lands in "
        "<= 7 day buckets, a bounded fan-out, never a cross product); "
        "the day spine is tiny and broadcasts. Exact distinct count per "
        "day; at 100 TB the pre-dedup to (user, day) is what keeps the "
        "join input at |users|x|days| instead of |events|"
    ),
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("d")
    ).distinct()
    ue = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("ed")
    ).distinct()
    joined = ue.join(
        F.broadcast(days),
        (F.col("ed") <= F.col("d")) & (F.col("ed") > F.date_sub(F.col("d"), 7)),
    )
    return (
        joined.groupBy(F.col("d").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy("day")
    )


@query(
    "events_rollup_incremental",
    oracle="""
    SELECT CAST(ts AS DATE) AS day, event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY CAST(ts AS DATE), event_type
    ORDER BY day, event_type
    """,
    notes=(
        "continuous-aggregate maintenance (hypertable rollup pattern): the Spark "
        "side splits events 90/10 by xxhash64(event_id), builds both day-level "
        "partial rollups, then INCREMENTALLY merges the late 10% touching only "
        "their days — the oracle is the FULL recompute, so the driver hash "
        "proves incremental == full, bit-for-bit (decimal partials are "
        "associative; the output is invariant to WHICH rows the split calls "
        "late, so the r19 split-hash change from md5 to the codegen-native "
        "xxhash64 cannot move the hash). Cost of a maintenance pass is "
        "O(batch + touched rollup rows), independent of history size"
    ),
)
def events_rollup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    from strake_spark.operators.rollup import merge_rollups, rollup_events

    ev = table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value",
        (F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0).alias("__late"),
    )
    # ONE fact scan + ONE aggregation exchange (r19): the pre-opt form
    # filtered the split into two DataFrames and let incremental_rollup
    # aggregate each, which planned as TWO full parquet scans of events
    # with the split hash evaluated per row per scan. Grouping once by
    # (day, event_type, __late) builds both partial rollups in a single
    # pass; the persisted relation is rollup-sized (buckets x 2), never
    # event-sized, and the split filters below read the cache, not the
    # fact table. merge_rollups (the maintenance core) is unchanged.
    parts = rollup_events(
        ev, keys=["day", "event_type", "__late"]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    base_r = parts.filter(~F.col("__late")).drop("__late")
    late_r = parts.filter(F.col("__late")).drop("__late")
    return (
        merge_rollups(base_r, late_r, keys=["day", "event_type"])
        .select(
            "day", "event_type", "n_events",
            F.col("total_value").cast("double").alias("total_value"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_hopping_window",
    oracle="""
    SELECT make_timestamp(((epoch_us(ts) // 900000000) * 900000000)
                          - k.k * 900000000) AS win_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(19,6))) AS DOUBLE) AS total_value
    FROM events, (VALUES (0), (1)) k(k)
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    notes=(
        "hopping (sliding) time-window aggregation — size 30 min, slide "
        "15 min, so every event lands in exactly 2 windows: Spark's "
        "F.window(ts, '30 minutes', '15 minutes') vs an explicit "
        "epoch-floor fan-out (cross join with k in {0,1}) in DuckDB. "
        "The batch form of the streaming hopping-window agg "
        "(streaming/ops.py); alignment is epoch-based in both engines "
        "(session tz pinned to UTC in session.py)"
    ),
)
def events_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", "decimal(19,6)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("win_start", "event_type")
    )
