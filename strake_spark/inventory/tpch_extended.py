"""Extended TPC-H coverage (beyond the reference's Q1/Q3/Q6/Q10 bench
set): every remaining TPC-H query expressible on the synthetic schema,
adapted where the synthetic tables lack a column (no partsupp, no
commit/receipt dates, no phone — adaptations noted per query).

These exercise the L1 operator surface the reference accepts through
DataFusion's SQL frontend (SURVEY §2.2): correlated EXISTS / NOT
EXISTS, scalar subqueries, IN subqueries, left-join-count distributions,
CTE + scalar-max selection, conditional aggregation over joins,
count-distinct grouping, and multi-level boolean scan predicates.

Scale stance mirrors tpch.py: fixed-size dims broadcast, facts shuffle once on
their join key, aggregates are partial (map-side) by construction, and
every correlated predicate the TPC spec writes as a per-row subquery is
re-expressed as one aggregate + join (the decorrelated plan Catalyst
would aim for, stated explicitly so it survives any optimizer version).

Decimal discipline per inventory/_util.py: exact decimal aggregation,
DOUBLE only at the surface; avg thresholds are rewritten multiplicative
(q < sum/(k*cnt)  =>  q*k*cnt < sum) so no engine ever divides."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import (
    MEASURE,
    dec,
    dsum,
    one_minus,
    sql_dec,
    sql_one_minus,
)

_SQL_REVENUE = f"{sql_dec('l_extendedprice')} * {sql_one_minus('l_discount')}"


def _revenue():
    return dec("l_extendedprice") * one_minus("l_discount")


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    notes="TPC-H Q4; 'late' = shipped >30 days after order date (no commit/receipt dates in synthetic schema)",
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isolated re-measure r15 (q5 protocol, two clean sessions):
    medians 0.7039 / 0.7574 s at sf0.1 — consistent with the r11/r13
    variance diagnosis; BENCH_r14's 1.30 s was session position."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (o.o_orderkey == l.l_orderkey)
            & (l.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
             {_SQL_REVENUE} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    notes="TPC-H Q7: bidirectional nation-pair volume by ship year",
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Isolated re-measure r16 (rest-block drift triage, two clean
    # sessions, 2 warmups + 6 interleaved iters): medians 0.83 / 0.78 s — between the
    # r14 and r15 driver numbers; the r15 +33% driver reading (start
    # load 6.95) was session contention, not a regression. bench.py's
    # rest_end control now adjudicates this in-artifact.
    # Plan shape (r9, per the a4f0d07 playbook): the nation-pair
    # predicate only accepts suppliers and customers from the two named
    # nations (2-in-25 selectivity a side), so BOTH fact inputs are
    # reduced below the l⋈o join by broadcast SEMI joins against the
    # nation-filtered dim keys; the nation names are attached AFTER the
    # fact-fact join, on the ~0.6% surviving stream, by broadcast joins
    # of the base dims. Two properties make this the right plan at
    # every scale:
    #   * semi joins keep Catalyst's size estimate at the (pruned)
    #     fact-scan size — no left×right product inflation — so at
    #     bench SF the l⋈o join still plans as a static broadcast
    #     (zero fact shuffle, one codegen pipeline over lineitem,
    #     matching the best all-broadcast shape), while at cluster SF
    #     the same code degrades to a shuffle join whose BOTH inputs
    #     are pre-reduced ~12× — the old shape shuffled the full
    #     tables and filtered last;
    #   * every build side is a base-table scan (never a join result),
    #     which keeps the planner's file-size stats authoritative.
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    the_pair = ("NATION_1", "NATION_2")
    n1 = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*the_pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(*the_pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    s_keys = s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"), "left_semi").select(
        "s_suppkey"
    )
    c_keys = c.join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"), "left_semi").select(
        "c_custkey"
    )
    l2 = l.join(F.broadcast(s_keys), l.l_suppkey == F.col("s_suppkey"), "left_semi").select(
        "l_orderkey",
        "l_suppkey",
        F.year("l_shipdate").cast("bigint").alias("l_year"),
        _revenue().alias("volume"),
    )
    o2 = o.join(F.broadcast(c_keys), o.o_custkey == F.col("c_custkey"), "left_semi").select(
        "o_orderkey", "o_custkey"
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        l2.join(o2, l2.l_orderkey == o2.o_orderkey)
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l2.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")), o2.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("volume"), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(19,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             {_SQL_REVENUE} AS volume,
             n1.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
    tags=("fp_tol",),
    notes="TPC-H Q8: NATION_3's share of PROMO-part revenue into ASIA; share division in double (exact decimal numerator/denominator)",
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Isolated re-measure r16 (rest-block drift triage, two clean
    # sessions, 2 warmups + 6 interleaved iters): medians 0.94 / 0.87 s — between the
    # r14 and r15 driver numbers; the r15 +37% driver reading (start
    # load 6.95) was session contention, not a regression. bench.py's
    # rest_end control now adjudicates this in-artifact.
    # Plan shape (r9): customer contributes nothing but the ASIA
    # membership test, so orders are SEMI-filtered by the ASIA customer
    # keys (region⋈nation broadcast-semi'd into customer, 1-in-5
    # selectivity) BEFORE the l⋈o join, and the customer payload never
    # rides any exchange. Likewise lineitem drops to the PROMO slice
    # via a semi join on the filtered part keys, and the supplier
    # nation name is attached AFTER the fact-fact join on the ~4%
    # surviving stream. Semi joins keep Catalyst's size estimates at
    # the pruned fact-scan size (no left×right product inflation), so
    # at bench SF the l⋈o join stays a static broadcast (zero fact
    # shuffle) while at cluster SF it becomes a shuffle join with both
    # inputs pre-reduced 5× — the old shape joined full orders and
    # full customer first and let the ASIA filter land last.
    l = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nations = (
        table(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("n_nationkey")
    )
    asia_customers = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(asia_nations), F.col("c_nationkey") == F.col("n_nationkey"), "left_semi")
        .select("c_custkey")
    )
    o2 = o.join(F.broadcast(asia_customers), o.o_custkey == F.col("c_custkey"), "left_semi").select(
        "o_orderkey", "o_orderdate"
    )
    l2 = l.join(F.broadcast(p), l.l_partkey == F.col("p_partkey"), "left_semi").select(
        "l_orderkey", "l_suppkey", _revenue().alias("volume")
    )
    zero = F.lit(0).cast("decimal(19,4)")
    return (
        l2.join(o2, l2.l_orderkey == o2.o_orderkey)
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), l2.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select(F.year("o_orderdate").cast("bigint").alias("o_year"), "volume", "nation")
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
             {_SQL_REVENUE}
               - {sql_dec('p_retailprice')} * {sql_dec('l_quantity')} * CAST(0.1 AS DECIMAL(9,6))
               AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    notes="TPC-H Q9; supply cost proxied as 10% of p_retailprice*quantity (no partsupp "
    "table); pattern '%gear%' matches the synthetic part-name vocabulary (round-1 "
    "'%5%' matched nothing, making the hash check vacuous)",
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Isolated re-measure r16 (rest-block drift triage, two clean
    # sessions, 2 warmups + 6 interleaved iters): medians 0.65 / 0.60 s — between the
    # r14 and r15 driver numbers; the r15 +25% driver reading (start
    # load 6.95) was session contention, not a regression. bench.py's
    # rest_end control now adjudicates this in-artifact.
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    o = table(spark, sf_dir, "orders")
    n = table(spark, sf_dir, "nation")
    amount = _revenue() - dec("p_retailprice") * dec("l_quantity") * F.lit(0.1).cast(
        "decimal(9,6)"
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum(F.col("amount"), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    notes="TPC-H Q13: order-count histogram incl. zero-order customers",
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_REVENUE}
                         ELSE CAST(0 AS DECIMAL(19,4)) END) AS DOUBLE) * 100.0
             / CAST(SUM({_SQL_REVENUE}) AS DOUBLE) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    tags=("fp_tol",),
    notes="TPC-H Q14: PROMO revenue share (conditional aggregation)",
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    zero = F.lit(0).cast("decimal(19,4)")
    rev = _revenue()
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
                * F.lit(100.0)
                / F.sum(rev).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_SQL_REVENUE}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    notes="TPC-H Q15: CTE + scalar-max selection (exact decimal equality, no view DDL)",
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier")
    from pyspark import StorageLevel

    # the revenue view feeds the scalar max AND the equality filter;
    # ReuseExchange does NOT fire (the consumers' projections diverge
    # after optimization), so without a cache the filtered fact scan +
    # shuffle run twice. Persist is #suppliers rows, spillable;
    # backs the returned lazy DataFrame (bench sessions reclaim via
    # ContextCleaner / clearCache between batches — r8 advice).
    # Same-session A/B at sf0.1: 0.80s -> 0.52s.
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_revenue()).alias("total_revenue")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(top), revenue.total_revenue == F.col("mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#45' AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 50
    """,
    notes="TPC-H Q16 adapted: supplier relationships via lineitem (no partsupp); count-distinct grouping",
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({sql_dec('l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey,
             SUM({sql_dec('l_quantity')}) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) agg ON agg.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND {sql_dec('l_quantity')} * 5 * agg.cnt < agg.sum_qty
    """,
    notes="TPC-H Q17: threshold q < 0.2*avg rewritten multiplicatively (q*5*cnt < sum) so both engines compare exact decimals",
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # single pass: no part column reaches the output, so the part
    # predicate is a broadcast SEMI filter, and the per-part threshold
    # (decorrelated avg) is a WINDOW over the same filtered rows — the
    # old shape aggregated EVERY part across the whole corpus and
    # joined back (per-part sums are unchanged by dropping other
    # parts' rows). One filtered scan, one (partkey) shuffle.
    lf = l.join(
        F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi"
    )
    w = Window.partitionBy("l_partkey")
    return (
        lf.withColumn("sum_qty", F.sum(dec("l_quantity")).over(w))
        .withColumn("cnt", F.count(F.lit(1)).over(w))
        .filter(dec("l_quantity") * 5 * F.col("cnt") < F.col("sum_qty"))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly"))
    )


@query(
    "tpch_q18_large_volume_customers",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate, o.o_totalprice,
           CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM({sql_dec('l_quantity')}) > 150
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    notes="TPC-H Q18: IN-subquery with HAVING; threshold 150 fits synthetic qty range",
)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    # one lineitem scan: the HAVING aggregate already IS the output
    # sum_qty (both are the exact-decimal per-order quantity sum), so
    # the filtered aggregate joins straight to orders/customer instead
    # of semi-joining back to lineitem and re-aggregating — the
    # previous shape scanned + shuffled the fact table twice for
    # identical numbers.
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("tq"))
        .filter(F.col("tq") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            F.col("tq").cast("double").alias("sum_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(SUM({_SQL_REVENUE}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 50
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    notes="TPC-H Q19: OR-of-ANDs join predicate (adapted: no container/shipmode columns)",
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & q.between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30) & q.between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 50) & q.between(20, 50))
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .filter(clause)
        .agg(dsum(_revenue(), "revenue"))
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late
      FROM late GROUP BY l_orderkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM late
    JOIN per_order po ON po.l_orderkey = late.l_orderkey
    JOIN supplier s   ON s.s_suppkey = late.l_suppkey
    WHERE late.is_late AND po.n_supp > 1 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    notes="TPC-H Q21: sole-late-supplier-in-multi-supplier-order; EXISTS/NOT EXISTS decorrelated into per-order distinct counts ('late' = >60 days after order date)",
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("is_late"),
        )
    )
    # ONE pass over the fact join, NO countDistinct: the previous plan
    # computed the lineitem-orders join twice (per_order + main chain)
    # and its two countDistincts forced an Expand (row-multiplying)
    # shuffle. Two plain partial-aggregable groupBys instead:
    # (order, supplier) rollup first — supp_late + that supplier's late
    # ROW count — then per-order counts; when exactly one supplier is
    # late, max(when(supp_late, struct(...))) IS that supplier, and its
    # late_rows is precisely the number of rows the oracle's count(*)
    # keeps, so numwait = SUM(late_rows). A/B at sf0.1: 1.31s -> 1.11s,
    # and the fact rows are scanned + shuffled once instead of twice.
    per_ps = late.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("supp_late"),
        F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("late_rows"),
    )
    per_order = per_ps.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum(F.col("supp_late").cast("int")).alias("n_late"),
        F.max(F.when(F.col("supp_late"), F.struct("l_suppkey", "late_rows"))).alias("ls"),
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .select(
            F.col("ls.l_suppkey").alias("l_suppkey"),
            F.col("ls.late_rows").alias("late_rows"),
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("late_rows").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle=f"""
    WITH pos AS (
      SELECT SUM({sql_dec('c_acctbal')}) AS sum_bal, COUNT(*) AS cnt
      FROM customer WHERE c_acctbal > 0
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 5 AS BIGINT) AS cntrycode, c.c_acctbal
      FROM customer c, pos
      WHERE c.c_nationkey % 5 IN (0, 1, 2)
        AND {sql_dec('c_acctbal')} * pos.cnt > pos.sum_bal
        AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
    notes="TPC-H Q22 adapted: country code = c_nationkey % 5 (no phone column); "
    "above-average test rewritten multiplicatively (bal*cnt > sum); 'never placed an "
    "order' became 'never placed an URGENT order' because every synthetic customer "
    "has orders (round-1 predicate matched nothing, making the hash check vacuous)",
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").filter((F.col("c_nationkey") % 5).isin(0, 1, 2))
    o = table(spark, sf_dir, "orders")
    pos = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .agg(F.sum(dec("c_acctbal")).alias("sum_bal"), F.count(F.lit(1)).alias("cnt"))
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(dec("c_acctbal") * F.col("cnt") > F.col("sum_bal"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .select(
            (F.col("c_nationkey") % 5).cast("bigint").alias("cntrycode"),
            F.col("c_acctbal"),
        )
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal"), "totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH ps AS (
      SELECT l_partkey, l_suppkey, MIN({sql_dec('l_extendedprice')}) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    minc AS (
      SELECT ps.l_partkey, MIN(ps.supplycost) AS min_cost
      FROM ps JOIN eu ON eu.s_suppkey = ps.l_suppkey
      GROUP BY ps.l_partkey
    )
    SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_brand,
           CAST(ps.supplycost AS DOUBLE) AS supplycost
    FROM part p
    JOIN ps   ON ps.l_partkey = p.p_partkey
    JOIN eu   ON eu.s_suppkey = ps.l_suppkey
    JOIN minc ON minc.l_partkey = p.p_partkey AND ps.supplycost = minc.min_cost
    WHERE p.p_size <= 15 AND p.p_type = 'STANDARD'
    ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
    LIMIT 100
    """,
    notes="TPC-H Q2 adapted: no partsupp, so supply cost = MIN(l_extendedprice) per "
    "(part, supplier) pair observed in lineitem; the correlated min-cost subquery is "
    "decorrelated into MIN() OVER (PARTITION BY part) on the aggregated relation + an "
    "exact-decimal equality filter (one lineitem scan, no self-join; both engines' MIN "
    "over exact casts agrees bit-for-bit). Reference accepts Q2's shape through "
    "DataFusion's frontend (SURVEY section 2.1 L1); bench set is "
    "crates/bench/src/main.rs:160-167.",
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Isolated re-measure r16 (rest-block drift triage, two clean
    # sessions, 2 warmups + 6 interleaved iters): medians 0.79 / 0.68 s — between the
    # r14 and r15 driver numbers; the r15 +25% driver reading (start
    # load 6.95) was session contention, not a regression. bench.py's
    # rest_end control now adjudicates this in-artifact.
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD")
    )
    # one lineitem scan + one (part, supplier) shuffle; dims broadcast.
    # The correlated min-cost-per-part predicate is a WINDOW over the
    # aggregated relation, not a second aggregate joined back: the
    # self-join shape planned as a second full lineitem scan + shuffle
    # + SortMergeJoin (column pruning made the two subtrees differ, so
    # ReuseExchange never fired); the window re-shuffles only the
    # small per-(part,supplier) aggregate. Per-part groups are a
    # handful of suppliers, so WindowExec state is trivial at any SF.
    from pyspark.sql import Window

    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # broadcast-SEMI-filter fact rows to STANDARD/size parts x EU
    # suppliers BEFORE aggregating: per-(part, supplier) minima are
    # unaffected by dropping whole groups that the downstream broadcast
    # joins discarded anyway, and the min-per-part window runs over EU
    # rows only in both shapes — the shuffle just stops carrying the
    # ~99% of groups that never survive.
    lf = l.join(
        F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi"
    ).join(
        F.broadcast(eu.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    ps = lf.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice")).alias("supplycost")
    )
    ps_eu = ps.join(F.broadcast(eu), ps.l_suppkey == F.col("s_suppkey"))
    min_cost = F.min("supplycost").over(Window.partitionBy("l_partkey"))
    return (
        ps_eu.withColumn("min_cost", min_cost)
        .filter(F.col("supplycost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("supplycost").cast("double").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey, SUM({sql_dec('l_extendedprice')}) AS part_value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3','NATION_7','NATION_11')
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey, CAST(part_value AS DOUBLE) AS part_value
    FROM val
    WHERE CAST(part_value AS DOUBLE) * (SELECT COUNT(*) FROM val)
          > 3.0 * (SELECT CAST(SUM(part_value) AS DOUBLE) FROM val)
    ORDER BY part_value DESC, p_partkey
    """,
    notes="TPC-H Q11 adapted: part value = SUM(l_extendedprice) of lineitems sold by "
    "the nation group's suppliers (no partsupp availqty*supplycost); the scalar "
    "total-value subquery survives as a broadcast single-row cross join. The spec's "
    "fraction threshold scales with SF (0.0001/SF), which zeroes out at bigger SFs; "
    "this uses the scale-invariant form 'value > 3x the mean part share' "
    "(value*cnt > 3*total), compared in DOUBLE on exact-decimal sums so the "
    "boundary decision agrees bit-for-bit across engines.",
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11")
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    # val feeds two lineages (the scalar total and the final filter);
    # persist the per-part aggregate (#parts rows, spillable) so the
    # fact join + shuffle run once, not twice
    from pyspark import StorageLevel

    val = (
        l.join(F.broadcast(sn), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("part_value"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tot = val.agg(
        F.sum("part_value").cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_value").cast("double") * F.col("n_parts")
            > F.lit(3.0) * F.col("total_value")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("part_value").cast("double").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@query(
    "tpch_q12_priority_shipping",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01' AND l.l_shipdate < TIMESTAMP '1999-01-01'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    notes="TPC-H Q12 adapted: ship mode stands in as l_returnflag and 'late' = shipped "
    ">30 days after order date (no shipmode/commit/receipt columns); the "
    "CASE-conditional dual count over a fact-fact join is the operator under test.",
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "tpch_q20_part_promotion",
    oracle=f"""
    WITH psq AS (
      SELECT l_partkey, l_suppkey,
             SUM({sql_dec('l_quantity')}) AS total_qty,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                       AND l_shipdate <  TIMESTAMP '1998-01-01'
                      THEN {sql_dec('l_quantity')} ELSE {sql_dec('0')} END) AS qty_1997
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN psq    ON psq.l_suppkey = s.s_suppkey
    JOIN part p ON p.p_partkey = psq.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_name LIKE '%widget%'
      AND CAST(total_qty AS DOUBLE) - CAST(qty_1997 AS DOUBLE) > 4.0 * CAST(qty_1997 AS DOUBLE)
    ORDER BY s.s_suppkey
    """,
    notes="TPC-H Q20 adapted: 'available quantity' = lifetime shipped quantity minus "
    "the 1997 window (no partsupp availqty); the nested IN-subqueries become "
    "broadcast joins + DISTINCT; the surplus threshold compares exact-decimal sums "
    "cast to DOUBLE with the identical IEEE expression on both sides.",
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    in_1997 = (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")
    )
    asia = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    # broadcast-SEMI-filter the fact rows to matching (part, supplier)
    # keys BEFORE the aggregation: the old shape aggregated every
    # lineitem group and then discarded all but the widget-part x
    # Asia-supplier slice via the same broadcasts — identical result,
    # but the shuffle carried the whole corpus's groups. Per-group
    # sums are unaffected by dropping whole groups early.
    lf = l.join(
        F.broadcast(p.select("p_partkey")), l.l_partkey == F.col("p_partkey"), "left_semi"
    ).join(
        F.broadcast(asia.select("s_suppkey")), l.l_suppkey == F.col("s_suppkey"), "left_semi"
    )
    psq = lf.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(dec("l_quantity")).alias("total_qty"),
        F.sum(F.when(in_1997, dec("l_quantity")).otherwise(F.lit(0).cast(MEASURE))).alias(
            "qty_1997"
        ),
    )
    surplus = F.col("total_qty").cast("double") - F.col("qty_1997").cast("double")
    return (
        psq.join(F.broadcast(asia), psq.l_suppkey == F.col("s_suppkey"))
        .filter(surplus > F.lit(4.0) * F.col("qty_1997").cast("double"))
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )
