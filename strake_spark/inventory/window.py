"""Window operator inventory.

Covers the reference's window translation surface (crates/sql/src/
sql_generator/translator/aggregate.rs:70-140 + frame translation
expr.rs:140-256: ROWS/RANGE frames, UNBOUNDED/CURRENT/N PRECEDING-
FOLLOWING). The reference also translates GROUPS frames; Spark has no
GROUPS frame — documented gap (SURVEY §2.3), rewritable via dense_rank
when needed.

Determinism rules: every ORDER BY inside a window carries a unique
tie-break key, and windowed sums run over DECIMAL so sliding-frame
implementations (Spark's running accumulation vs DuckDB's segment
trees) cannot diverge in low bits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import dec


@query(
    "window_row_number_topk",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
    notes="top-3 orders per customer; the DISTINCT ON rewrite pattern (set_ops.rs:321-496)",
)
def window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 3)


@query(
    "window_rank_family",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           RANK()         OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnk,
           DENSE_RANK()   OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS drnk,
           PERCENT_RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS prnk,
           CUME_DIST()    OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
    notes="rank family is tie-stable: equal quantities get equal ranks in both engines",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    w = W.partitionBy("l_returnflag").orderBy("l_quantity")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_spend"),
    )


@query(
    "window_sliding_rows_frame",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(19,4)))
                OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS qty_window
    FROM lineitem
    WHERE l_suppkey <= 20
    """,
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-2, 1)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(dec("l_quantity")).over(w).cast("double").alias("qty_window"),
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_similar
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    notes="value-range frame (expr.rs:183-209 interval bounds); peers handled identically",
)
def window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice").rangeBetween(-1000, 0)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar"),
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey, 1)     OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
           LEAD(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order,
           CAST(date_diff('day',
               LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w))
        .cast("long")
        .alias("days_since_prev"),
    )


@query(
    "window_ntile_first_last",
    oracle="""
    SELECT c_custkey, c_acctbal,
           NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile,
           FIRST_VALUE(c_custkey) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest,
           NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_richest
    FROM customer
    """,
    notes=(
        "ntile/first_value/nth_value matrix. The UNPARTITIONED ntile is "
        "deliberate — exact global quartiles are the operator's SQL "
        "semantics and the oracle needs them bit-exact, but the plan is "
        "a single-task sort (Spark warns 'No Partition Defined'). At "
        "100 TB the scale path is a two-phase rank: per-partition "
        "counts -> broadcast cumulative offsets -> local rank + offset "
        "(the shape operators/decontam._pack uses for its global "
        "prefix sum), or approx percentile buckets when exactness "
        "isn't contractual"
    ),
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    wt = W.orderBy("c_acctbal", "c_custkey")
    wn = (
        W.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return c.select(
        "c_custkey",
        "c_acctbal",
        F.ntile(4).over(wt).alias("quartile"),
        F.first("c_custkey").over(wn).alias("richest"),
        F.nth_value("c_custkey", 2).over(wn).alias("second_richest"),
    )


@query(
    "window_ignore_nulls_fill",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type = 'view' THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_id, user_id, v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill_fwd,
           lag(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS prev_nn,
           first_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_nn,
           nth_value(v, 2 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_nn
    FROM g
    """,
    notes=(
        "IGNORE NULLS window matrix — the time-series gap-fill idiom "
        "(forward-fill via last_value IGNORE NULLS over a running frame, "
        "previous non-null via lag IGNORE NULLS, first/nth non-null over "
        "the full partition). 'view' events are nulled to create gaps; "
        "values pass through untouched (no arithmetic), so DOUBLE is "
        "hash-safe. (ts, event_id) is a unique total order per user"
    ),
)
def window_ignore_nulls_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    g = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "view", F.lit(None)).otherwise(F.col("value")).alias("v"),
    )
    run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    full = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return g.select(
        "event_id",
        "user_id",
        "v",
        F.last("v", ignorenulls=True).over(run).alias("fill_fwd"),
        # PySpark's F.lag has no ignoreNulls parameter — the SQL form does
        F.expr(
            "lag(v) IGNORE NULLS OVER (PARTITION BY user_id ORDER BY ts, event_id)"
        ).alias("prev_nn"),
        F.first("v", ignorenulls=True).over(full).alias("first_nn"),
        F.nth_value("v", 2, ignoreNulls=True).over(full).alias("second_nn"),
    )


@query(
    "window_range_interval_sliding",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w                         AS n_1h,
           CAST(SUM(event_id) OVER w AS BIGINT)    AS eid_sum_1h,
           MIN(value) OVER w                       AS min_val_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
    notes=(
        "time-based sliding window: RANGE frame with an INTERVAL bound "
        "over a timestamp ORDER BY — the per-entity trailing-hour "
        "profile every feature pipeline computes. RANGE peers make tied "
        "timestamps share a frame, so no tie-break is needed for frame "
        "CONTENTS; the aggregates are order-independent exacts (count, "
        "bigint sum, min — never a float sum, rule #2). One shuffle on "
        "user_id; Spark evaluates the frame with a sliding accumulator "
        "per partition, DuckDB with segment trees — identical results "
        "on exact types"
    ),
)
def window_range_interval_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "events").createOrReplaceTempView("events_ri")
    return spark.sql(
        """
        SELECT event_id, user_id, ts,
               COUNT(*) OVER w                      AS n_1h,
               CAST(SUM(event_id) OVER w AS BIGINT) AS eid_sum_1h,
               MIN(value) OVER w                    AS min_val_1h
        FROM events_ri
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts, event_id
        """
    )
