"""TPC-H-derived headline queries.

The reference's bench harness runs simplified TPC-H Q1/Q3/Q6/Q10
(crates/bench/src/main.rs:160-167); these are the parity + performance
headliners, plus Q5 as the multi-join stress case. Implemented with the
DataFrame API so Catalyst plans them (broadcast dims, partial aggs,
TakeOrderedAndProject for top-k); predicates adjusted to the driver's
synthetic data ranges (orders 1995-2001, see TESTDATA.md).

Scale notes (100 TB stance):
- Aggregations are expressed as groupBy().agg() → Spark plans partial
  (map-side) aggregation before the shuffle; the shuffle carries only
  group keys + partial states.
- Join strategy: explicit broadcast hints ONLY for the fixed-size dims
  (region: 5 rows, nation: 25). Everything that grows with SF (orders,
  customer, supplier, part) is left unhinted — Catalyst broadcasts it
  while it fits autoBroadcastJoinThreshold and AQE re-plans to a
  shuffle join at the scale where a broadcast would OOM an executor.
- Top-k with total order → TakeOrderedAndProject (per-partition heap,
  driver merge of k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import (
    davg,
    dec,
    dsum,
    one_minus,
    one_plus,
    sql_dec,
    sql_one_minus,
    sql_one_plus,
    sql_rate_product,
)

def _revenue():
    # Built lazily: Column construction requires an active SparkContext.
    return dec("l_extendedprice") * one_minus("l_discount")


_SQL_REVENUE = f"{sql_dec('l_extendedprice')} * {sql_one_minus('l_discount')}"


@query(
    "tpch_q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE)                         AS sum_qty,
           CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE)                    AS sum_base_price,
           CAST(SUM({_SQL_REVENUE}) AS DOUBLE)                                  AS sum_disc_price,
           CAST(SUM({sql_dec('l_extendedprice')} * {sql_rate_product(sql_one_minus('l_discount'), sql_one_plus('l_tax'))}) AS DOUBLE) AS sum_charge,
           CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) / COUNT(*)              AS avg_qty,
           CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) / COUNT(*)         AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(9,6))) AS DOUBLE) / COUNT(*)     AS avg_disc,
           COUNT(*)                                                             AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    notes="reference bench Q1 (crates/bench/src/main.rs:162)",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolated re-measure r15 (q5 triage protocol, two clean sessions,
    2 warmups + 6 interleaved iters, idle box): medians 0.3622 / 0.3871 s
    at sf0.1 — BENCH_r14's headline 0.954 (and the r14 +41% headline
    swing generally) was session-position JIT inflation, not a plan
    regression; bench.py now replays the whole headline block at
    session end (`queries_end`) so the artifact carries both numbers."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(_revenue(), "sum_disc_price"),
            dsum(dec("l_extendedprice") * (one_minus("l_discount") * one_plus("l_tax")), "sum_charge"),
            davg(dec("l_quantity"), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount").cast("decimal(9,6)"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "tpch_q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_SQL_REVENUE}) AS DOUBLE) AS revenue,
           CAST(o.o_orderdate AS DATE)         AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    notes="reference bench Q3 (crates/bench/src/main.rs:163); o_orderpriority substituted for o_shippriority (absent from synthetic schema)",
)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolated re-measure r15 (q5 protocol, two clean sessions):
    medians 0.7447 / 0.7738 s at sf0.1 — AT the series best (r9 ~0.73),
    clearing the r14 `weak` (BENCH_r14 showed 2.06 s, a 2.8x series
    high, on a plan untouched since r9: session-position inflation).
    Plan (unchanged): filters pushed into all three scans, BUILDING
    customers broadcast, top-10 via TakeOrderedAndProject."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(dsum(_revenue(), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    notes=(
        "TPC-H Q5 shape: 6-table join. r13 measured re-tune: ONE semi on "
        "lineitem by ASIA supplier keys (map-side 1-in-5 reduction before "
        "the orderkey shuffle); orders keeps only its date filter — the "
        "r10 orders-side semi cost two broadcast waves for a 10x-smaller "
        "table (isolated triage numbers in the docstring)"
    ),
)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plan shape (r13 re-tune of the r10 both-facts-semi shape, from
    # an isolated 3-session / >=6-iteration triage at sf0.1 the r10
    # commit never ran):
    #   * measured r13, broadcast regime: both-facts-semi med 1.04-1.29 s
    #     vs the plain all-base-join shape 0.77-0.87 s — the r10 "+0.05 s"
    #     claim was wrong by ~5x (the o-semi chain adds two dependent
    #     broadcast-build waves for a table that is already date-pruned
    #     10x below lineitem);
    #   * measured r13, forced-shuffle regime (autoBroadcastJoinThreshold
    #     = -1, the cluster-SF simulation): both-facts-semi 1.28 s vs
    #     plain 1.12 s — when the semi's build side cannot broadcast,
    #     the semi pass itself shuffles the fact it meant to protect,
    #     cancelling the claimed 5-10x shuffle saving.
    # What survives of the r10 idea is the part that matters at 100 TB:
    # ONE semi on LINEITEM (the dominant fact) by the ASIA supplier
    # KEYS. The key set stays broadcastable far longer than any
    # payload-bearing side (ASIA suppliers at SF1000 ~ 2M x 8 B ~ 16 MB),
    # so the map-side 1-in-5 reduction lands BEFORE lineitem's orderkey
    # shuffle precisely in the regime where that shuffle is the
    # bottleneck; at bench SF it costs one shallow wave (measured r13:
    # ties or beats both-facts-semi in every session, BC and shuffle
    # regime). Orders keeps only its date filter — its semi saved a
    # table 10x smaller at the price of two extra waves. The
    # aggregation runs on the int nation key and n_name joins onto the
    # <=25-row aggregate, so no string rides the fact stream. No
    # broadcast hints on customer/supplier-derived inputs (a hint is
    # honored unconditionally; at SF1000 a forced broadcast of 1/5 of
    # customer is a driver OOM) — Catalyst picks broadcast at bench SF
    # and shuffle at cluster SF on its own.
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = n.join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi"
    ).select("n_nationkey")
    s2 = s.join(
        F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey", "s_nationkey")
    l2 = l.join(
        s2.select(F.col("s_suppkey").alias("sk")), l.l_suppkey == F.col("sk"), "left_semi"
    ).select("l_orderkey", "l_suppkey", _revenue().alias("volume"))
    return (
        l2.join(o, l2.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s2,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("s_nationkey")
        .agg(dsum(F.col("volume"), "revenue"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_dec('l_extendedprice')} * CAST(l_discount AS DECIMAL(9,6))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    notes="reference bench Q6 (crates/bench/src/main.rs:164)",
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolated re-measure r15 (q5 protocol, two clean sessions):
    medians 0.2200 / 0.2743 s at sf0.1 — BENCH_r14's '+56% regression'
    on this single-scan filter-aggregate (untouched since r1) was
    session-position inflation, as the plan already implied."""
    l = table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec("l_extendedprice") * F.col("l_discount").cast("decimal(9,6)"), "revenue"))
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_SQL_REVENUE}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    notes="reference bench Q10 (crates/bench/src/main.rs:165)",
)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue(), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )
