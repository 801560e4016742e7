"""Join + aggregate operator inventory.

Covers the reference translator's join surface (crates/sql/src/
sql_generator/translator/join.rs:61-72: Inner/Left/Right/Full pushed;
semi/anti executed by the engine — Spark gives left_semi/left_anti
natively) and the aggregate surface (translator/aggregate.rs:7-68 plain
GROUP BY; GROUPING SETS / CUBE / ROLLUP accepted at the SQL frontend,
SURVEY §2.3).

Scale notes: every join here keys on the natural key of the smaller
side; in the engine the dim side is broadcast (no fact shuffle). The
variance aggregate is computed from decimal power sums — associative and
exact — rather than Welford merging, so results are independent of
partition merge order (a 1000-executor run returns the same bits as a
laptop run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import dec, dsum, sql_dec


@query(
    "join_inner_orders_customer",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = table(spark, sf_dir, "customer")
    # customer grows with SF: no explicit broadcast hint — Catalyst/AQE
    # broadcasts while it fits the threshold, shuffles beyond
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@query(
    "join_left_customer_orders",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST({sql_dec('o.o_totalprice')} AS DOUBLE) AS total
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderstatus = 'P'
    """,
    notes="left join with join-side filter: unmatched customers keep NULLs",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "P")
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", dec("o_totalprice").cast("double").alias("total")
    )


@query(
    "join_right_orders_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select("c_custkey", "o_orderkey")


@query(
    "join_full_outer_nation_coverage",
    oracle="""
    SELECT cn.nationkey AS c_nation, sn.nationkey AS s_nation
    FROM (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000) cn
    FULL OUTER JOIN
         (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000) sn
      ON cn.nationkey = sn.nationkey
    """,
    notes="full outer: nations with rich customers vs rich suppliers",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    return c.join(s, c.nationkey == s.nationkey, "full_outer").select(
        c.nationkey.alias("c_nation"), s.nationkey.alias("s_nation")
    )


@query(
    "join_semi_customers_with_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    notes="left_semi join == EXISTS (reference executes semi locally, join.rs:61-72)",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti_customers_without_urgent_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
    notes="predicate chosen so both matched and unmatched customers exist at every SF",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_cross_region_status",
    oracle="""
    SELECT r.r_name, s.o_orderstatus
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    # region is a fixed 5-row dim: broadcast so the cross product is a
    # map-side nested loop over the distinct statuses, never a shuffle
    r = table(spark, sf_dir, "region")
    s = table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return s.crossJoin(F.broadcast(r)).select("r_name", "o_orderstatus")


@query(
    "join_non_equi_price_over_size",
    oracle=f"""
    SELECT p.p_partkey, COUNT(*) AS n_lines
    FROM part p JOIN lineitem l
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    WHERE p.p_size >= 45
    GROUP BY p.p_partkey
    """,
    notes="equi key + non-equi residual predicate (join.rs residual filter path)",
)
def join_non_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part").filter(F.col("p_size") >= 45)
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(F.broadcast(p), (l.l_partkey == p.p_partkey) & (l.l_quantity > p.p_size))
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


# --------------------------------------------------------------- aggregates


@query(
    "agg_global_stats",
    oracle=f"""
    SELECT COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) AS sum_price
    FROM orders
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        dsum(dec("o_totalprice"), "sum_price"),
    )


@query(
    "agg_rollup_status_priority",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum(dec("o_totalprice"), "total")
    )


@query(
    "agg_cube_flag_status",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           CAST(SUM({sql_dec('l_quantity')}) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum(dec("l_quantity"), "qty")
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_having_big_customers",
    oracle=f"""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 8
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum(dec("o_totalprice"), "spend"))
        .filter(F.col("n_orders") >= 8)
    )


@query(
    "agg_variance_by_nation",
    oracle=f"""
    SELECT c_nationkey,
           COUNT(*) AS n,
           (CAST(SUM({sql_dec('c_acctbal')} * {sql_dec('c_acctbal')}) AS DOUBLE)
            - CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) * CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS var_acctbal,
           sqrt((CAST(SUM({sql_dec('c_acctbal')} * {sql_dec('c_acctbal')}) AS DOUBLE)
            - CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) * CAST(SUM({sql_dec('c_acctbal')}) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1)) AS stddev_acctbal
    FROM customer
    GROUP BY c_nationkey
    HAVING COUNT(*) > 1
    """,
    notes="variance from decimal power sums: exact + merge-order independent, unlike builtin var_samp on doubles",
)
def agg_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    x = dec("c_acctbal")
    n = F.count(F.lit(1))
    sum_x = F.sum(x).cast("double")
    sum_x2 = F.sum(x * x).cast("double")
    var = (sum_x2 - sum_x * sum_x / n) / (n - F.lit(1))
    return (
        c.groupBy("c_nationkey")
        .agg(
            n.alias("n"),
            var.alias("var_acctbal"),
            F.sqrt(var).alias("stddev_acctbal"),
        )
        .filter(F.col("n") > 1)
    )


@query(
    "agg_string_agg_priorities",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    notes="deterministic listagg: sorted distinct values (reference maps string_agg->LISTAGG, dialects/oracle.rs)",
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities")
    )


@query(
    "agg_filtered_conditional",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
           CAST(SUM({sql_dec('l_extendedprice')}) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_price,
           CAST(SUM(CASE WHEN l_tax = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxfree
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count(F.when(F.col("l_quantity") > 25, 1)).alias("n_big"),
        F.sum(F.when(F.col("l_discount") > 0.05, dec("l_extendedprice")))
        .cast("double")
        .alias("discounted_price"),
        F.sum(F.when(F.col("l_tax") == 0, 1).otherwise(0)).cast("long").alias("n_taxfree"),
    )


@query(
    "agg_approx_count_distinct",
    tags=("rows_only",),
    notes="HLL sketches are engine-specific; driver records rows-only. Accuracy asserted in tests vs exact counts.",
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
    )


@query(
    "agg_approx_count_distinct_bound",
    oracle="SELECT true AS within_bound",
    notes=(
        "driver-checkable companion to agg_approx_count_distinct: "
        "|approx - exact| / exact <= 0.05 on l_orderkey as a 1-row "
        "boolean (HLL rsd=0.02, so the 5% bound has wide margin; the "
        "sketch is deterministic for a frozen dataset)"
    ),
)
def agg_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )
    rel_err = (
        F.abs(F.col("approx_orders") - F.col("exact_orders")).cast("double")
        / F.col("exact_orders")
    )
    return s.select((rel_err <= 0.05).alias("within_bound"))


@query(
    "agg_regression_family",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                           * CAST(0.0001 AS DECIMAL(5,4))
                           AS DECIMAL(12,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(15,2))
                           * CAST(l_quantity AS DECIMAL(15,2))
                           AS DECIMAL(25,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(15,2))
                           * CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                                  * CAST(0.0001 AS DECIMAL(5,4))
                                  AS DECIMAL(12,6))
                           AS DECIMAL(25,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                                  * CAST(0.0001 AS DECIMAL(5,4))
                                  AS DECIMAL(12,6))
                           * CAST(CAST(l_extendedprice AS DECIMAL(15,2))
                                  * CAST(0.0001 AS DECIMAL(5,4))
                                  AS DECIMAL(12,6))
                           AS DECIMAL(25,6))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS r_count,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2,
           (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_xy
    FROM s ORDER BY l_returnflag
    """,
    notes=(
        "linear-regression aggregate family (regr_slope / regr_intercept / "
        "regr_r2 / corr semantics; reference surface: DataFusion's regr_* "
        "aggregates) computed order-independently: exact DECIMAL co-moment "
        "sums, one correctly-rounded cast to DOUBLE, then an identical "
        "IEEE expression tree on both engines. Native F.regr_slope / "
        "F.corr would hash-drift with partition-dependent double "
        "summation order; tests/test_asof_nearest.py pins the "
        "native aggregates to these values within 1e-9. y is pre-scaled "
        "by the exact decimal 1e-4 so every co-moment sum's raw integer "
        "stays below 2^53 through sf1 (price^2 otherwise overflows "
        "double-exact range by sf0.001)"
    ),
)
def agg_regression_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    xq = F.col("l_quantity").cast("decimal(15,2)")
    yn = (
        F.col("l_extendedprice").cast("decimal(15,2)")
        * F.lit("0.0001").cast("decimal(5,4)")
    ).cast("decimal(12,6)")
    s = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(xq).cast("double").alias("sx"),
        F.sum(yn).cast("double").alias("sy"),
        F.sum((xq * xq).cast("decimal(25,6)")).cast("double").alias("sxx"),
        F.sum((xq * yn).cast("decimal(25,6)")).cast("double").alias("sxy"),
        F.sum((yn * yn).cast("decimal(25,6)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    den_y = n * syy - sy * sy
    slope = num / den_x
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("r_count"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        ((num * num) / (den_x * den_y)).alias("r2"),
        (num / F.sqrt(den_x * den_y)).alias("corr_xy"),
    ).orderBy("l_returnflag")


@query(
    "agg_percentile_within_group",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25)      AS q1_qty,
           quantile_cont(l_quantity, 0.5)       AS med_qty_cont,
           quantile_disc(l_quantity, 0.5)       AS med_qty_disc,
           quantile_disc(l_extendedprice, 0.9)  AS p90_price_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    notes=(
        "ordered-set aggregates via the ANSI WITHIN GROUP syntax "
        "(percentile_cont / percentile_disc) vs DuckDB's quantile_cont/"
        "quantile_disc. disc picks an existing row value (exactly "
        "comparable); cont interpolates with the same a+(b-a)*f formula "
        "both engines use — verified bit-stable at three SFs"
    ),
)
def agg_percentile_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("iv_pct_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity)     AS q1_qty,
               percentile_cont(0.5)  WITHIN GROUP (ORDER BY l_quantity)     AS med_qty_cont,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity)     AS med_qty_disc,
               percentile_disc(0.9)  WITHIN GROUP (ORDER BY l_extendedprice) AS p90_price_disc
        FROM iv_pct_lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "agg_count_distinct_multi",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey)  AS n_supp,
           COUNT(DISTINCT l_partkey)  AS n_part,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS sum_dist_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    notes=(
        "multiple DISTINCT aggregates over different columns in one "
        "query — Spark plans this with the Expand operator (one "
        "duplicated stream per distinct set, then two-phase agg), the "
        "shape that at scale replaces N self-joins; sum(DISTINCT) runs "
        "in DECIMAL for order-independence"
    ),
)
def agg_count_distinct_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum_distinct(F.col("l_quantity").cast("decimal(15,2)"))
            .cast("double")
            .alias("sum_dist_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_using_natural",
    oracle="""
    WITH nat AS (
      SELECT n_regionkey AS regionkey, n_name AS nation_name FROM nation
    ),
    reg AS (
      SELECT r_regionkey AS regionkey, r_name AS region_name FROM region
    )
    SELECT 'using' AS join_kind, regionkey, nation_name, region_name
    FROM nat JOIN reg USING (regionkey)
    UNION ALL
    SELECT 'natural' AS join_kind, regionkey, nation_name, region_name
    FROM nat NATURAL JOIN reg
    ORDER BY join_kind, regionkey, nation_name
    """,
    notes=(
        "SQL-frontend join sugar: JOIN ... USING (shared key folded to "
        "one column) and NATURAL JOIN (implicit equality on all "
        "same-named columns) — both resolve to the same equi-join plan "
        "in both engines"
    ),
)
def join_using_natural(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "nation").selectExpr(
        "n_regionkey AS regionkey", "n_name AS nation_name"
    ).createOrReplaceTempView("iv_jun_nation")
    table(spark, sf_dir, "region").selectExpr(
        "r_regionkey AS regionkey", "r_name AS region_name"
    ).createOrReplaceTempView("iv_jun_region")
    return spark.sql(
        """
        SELECT 'using' AS join_kind, regionkey, nation_name, region_name
        FROM iv_jun_nation JOIN iv_jun_region USING (regionkey)
        UNION ALL
        SELECT 'natural' AS join_kind, regionkey, nation_name, region_name
        FROM iv_jun_nation NATURAL JOIN iv_jun_region
        ORDER BY join_kind, regionkey, nation_name
        """
    )


@query(
    "agg_hll_union_bound",
    oracle="SELECT true AS within_bound",
    notes=(
        "mergeable-sketch contract: per-priority Datasketches HLL "
        "sketches of o_custkey (hll_sketch_agg), merged with "
        "hll_union_agg, estimate within 5% of the exact global "
        "COUNT(DISTINCT) — the map-side-partial/reduce-side-merge shape "
        "that makes approx distinct counts tree-aggregable at 100 TB. "
        "Sketch bytes are deterministic for a frozen dataset, so the "
        "1-row boolean is driver-stable (same pattern as "
        "agg_approx_count_distinct_bound)"
    ),
)
def agg_hll_union_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    per_group = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_agg("o_custkey").alias("sk")
    )
    merged = per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
    )
    exact = o.agg(F.countDistinct("o_custkey").alias("exact_n"))
    joined = merged.crossJoin(exact)
    rel_err = (
        F.abs(F.col("est") - F.col("exact_n")).cast("double") / F.col("exact_n")
    )
    return joined.select((rel_err <= 0.05).alias("within_bound"))


@query(
    "agg_approx_percentile_bound",
    oracle="SELECT true AS within_bound",
    notes=(
        "mergeable quantile-sketch contract (companion pattern of "
        "agg_hll_union_bound / agg_approx_count_distinct_bound): Spark's "
        "approx_percentile (Greenwald-Khanna, accuracy 10000 -> 0.01% "
        "rank error) on l_extendedprice must land within 1% VALUE error "
        "of the exact interpolated percentile at p50/p90/p99 — the "
        "sketch is deterministic for a frozen dataset, so the 1-row "
        "boolean is driver-stable. At 100 TB this replaces the exact "
        "sort-based percentile with map-side-mergeable partials"
    ),
)
def agg_approx_percentile_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    s = l.agg(
        F.approx_percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000).alias("approx"),
        F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("exact"),
    )
    pairs = F.arrays_zip(F.col("approx"), F.col("exact"))
    max_rel = F.array_max(
        F.transform(
            pairs,
            lambda p: F.abs(p.getField("approx") - p.getField("exact"))
            / F.abs(p.getField("exact")),
        )
    )
    return s.select((max_rel <= 0.01).alias("within_bound"))


@query(
    "agg_listagg_within_group",
    oracle="""
    SELECT o_orderstatus,
           string_agg(concat(o_orderpriority, '#', CAST(o_orderkey AS VARCHAR)),
                      '|' ORDER BY o_orderpriority, o_orderkey) AS agg_line
    FROM orders
    WHERE o_orderkey <= 2000
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    notes=(
        "native listagg WITHIN GROUP (Spark 4's ANSI ordered string "
        "aggregation, replacing the sort_array+array_join rewrite used "
        "by agg_string_agg_priorities) vs DuckDB string_agg ORDER BY — "
        "the within-group order carries a unique tie-break so the "
        "concatenation is total-ordered on both engines"
    ),
)
def agg_listagg_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") <= 2000
    ).createOrReplaceTempView("iv_la_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               listagg(concat(o_orderpriority, '#', CAST(o_orderkey AS STRING)), '|')
                 WITHIN GROUP (ORDER BY o_orderpriority, o_orderkey) AS agg_line
        FROM iv_la_orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
        """
    )


@query(
    "agg_max_by_min_by",
    oracle=f"""
    SELECT c_mktsegment,
           arg_max(c_name, c_custkey)                       AS latest_name,
           arg_min(c_name, c_custkey)                       AS first_name,
           arg_max(c_acctbal, c_custkey)                    AS latest_bal,
           arg_min(c_acctbal, c_custkey)                    AS first_bal,
           COUNT(*)                                         AS n
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    notes=(
        "argmax/argmin aggregate family: Spark max_by/min_by vs DuckDB "
        "arg_max/arg_min. The ordering key is the UNIQUE c_custkey "
        "(inventory design rule #3 — ties on a non-unique key would be "
        "engine-nondeterministic). One-pass hash aggregate per group, "
        "map-side partials, no sort"
    ),
)
def agg_max_by_min_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", "c_custkey").alias("latest_name"),
            F.min_by("c_name", "c_custkey").alias("first_name"),
            F.max_by("c_acctbal", "c_custkey").alias("latest_bal"),
            F.min_by("c_acctbal", "c_custkey").alias("first_bal"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_grouping_id_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
           CAST(GROUPING(o_orderstatus) AS INTEGER)  AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           COUNT(*) AS n,
           CAST(SUM({sql_dec('o_totalprice')}) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
    ORDER BY gid, o_orderstatus, o_orderpriority
    """,
    notes=(
        "grouping_id() bitmask surface (companion to agg_grouping_sets, "
        "which covers per-column GROUPING): Spark's grouping_id() and "
        "DuckDB's multi-arg GROUPING(a,b) share the convention that the "
        "leftmost grouping column is the most significant bit (probed: "
        "(a)->1, ()->3). Both engines plan grouping sets as one Expand "
        "+ single aggregate exchange; the decimal sum keeps the measure "
        "exact at any parallelism"
    ),
)
def agg_grouping_id_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gid")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               CAST(GROUPING(o_orderstatus) AS INT)  AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS total
        FROM orders_gid
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )
