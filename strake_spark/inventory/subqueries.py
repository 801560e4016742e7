"""Subquery + CTE inventory.

The reference accepts the full DataFusion subquery surface at L1
(SURVEY §2.2: scalar/IN/EXISTS, correlated — decorrelated by optimizer
rules) and WITH RECURSIVE via the RecursiveQuery plan node
(set_ops.rs:497-586). Spark decorrelates the same shapes in Catalyst;
recursive CTEs are native SQL in Spark 4 (``WITH RECURSIVE``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import register_views, table
from strake_spark.inventory import query


@query(
    "subquery_scalar_above_avg",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.75 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) / COUNT(*) FROM orders)
    """,
    notes=(
        "uncorrelated scalar subquery; avg via decimal sum/count for "
        "determinism; 1.75x multiplier chosen so rows exist at every SF "
        "(2x exceeded max(o_totalprice) -> vacuous 0=0 match in r2)"
    ),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 1.75 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) / COUNT(*) FROM orders)
        """
    )


@query(
    "subquery_in_european_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation
        WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "nation", "region")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_nationkey IN (
            SELECT n_nationkey FROM nation
            WHERE n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name = 'EUROPE'))
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey
          AND l.l_shipdate > TIMESTAMP '2001-06-01'
          AND l.l_quantity > 45)
    """,
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "supplier", "lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_suppkey = s.s_suppkey
              AND l.l_shipdate > TIMESTAMP '2001-06-01'
              AND l.l_quantity > 45)
        """
    )


@query(
    "subquery_correlated_scalar_select",
    oracle="""
    SELECT n.n_nationkey, n.n_name,
           (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_customers
    FROM nation n
    """,
    notes="correlated scalar subquery in SELECT list — decorrelated to an aggregate+join by both optimizers",
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name,
               (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey = n.n_nationkey) AS n_customers
        FROM nation n
        """
    )


@query(
    "cte_reused",
    oracle="""
    WITH big_orders AS (
        SELECT o_custkey, COUNT(*) AS n
        FROM orders WHERE o_totalprice > 100000
        GROUP BY o_custkey)
    SELECT a.o_custkey, a.n, b.max_n
    FROM big_orders a
    CROSS JOIN (SELECT MAX(n) AS max_n FROM big_orders) b
    WHERE a.n = b.max_n
    """,
    notes="CTE referenced twice (WITH surface, SURVEY §2.2 L1)",
)
def cte_reused(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH big_orders AS (
            SELECT o_custkey, COUNT(*) AS n
            FROM orders WHERE o_totalprice > 100000
            GROUP BY o_custkey)
        SELECT a.o_custkey, a.n, b.max_n
        FROM big_orders a
        CROSS JOIN (SELECT MAX(n) AS max_n FROM big_orders) b
        WHERE a.n = b.max_n
        """
    )


@query(
    "cte_recursive_series",
    oracle="""
    WITH RECURSIVE series(n) AS (
        SELECT 1
        UNION ALL
        SELECT n + 1 FROM series WHERE n < 25
    )
    SELECT s.n, COUNT(o.o_orderkey) AS n_orders
    FROM series s LEFT JOIN orders o ON o.o_custkey = s.n
    GROUP BY s.n
    """,
    notes="WITH RECURSIVE (set_ops.rs:497-586); Spark 4 native recursive CTE joined against data",
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    try:
        df = spark.sql(
            """
            WITH RECURSIVE series(n) AS (
                SELECT 1
                UNION ALL
                SELECT n + 1 FROM series WHERE n < 25
            )
            SELECT s.n, COUNT(o.o_orderkey) AS n_orders
            FROM series s LEFT JOIN orders o ON o.o_custkey = s.n
            GROUP BY s.n
            """
        )
        df.schema  # force analysis so an unsupported-SQL error falls back
        return df
    except Exception:
        # Spark <4 fallback: iterative fixpoint expansion (depth known here;
        # the general engine path caps depth like the reference's recursion
        # limit, translator/mod.rs:20)
        series = spark.range(1, 26).select(F.col("id").cast("int").alias("n"))
        o = table(spark, sf_dir, "orders")
        return (
            series.join(o, series.n == o.o_custkey, "left")
            .groupBy("n")
            .agg(F.count("o_orderkey").alias("n_orders"))
        )


@query(
    "engine_sql_end_to_end",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(19,4))) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    notes=(
        "the GOVERNED ENGINE inside the correctness gate: this entry "
        "routes SQL text through StrakeEngine (read-only gate -> planning "
        "ladder -> defensive limit -> cost check), not the DataFrame API, "
        "so the driver hash verifies the whole engine.sql path end-to-end "
        "(gate skips the limit for aggregates, ladder degrades to local "
        "for parquet views)"
    ),
)
def engine_sql_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    import strake_spark as ss

    eng = ss.connect(
        {
            "sources": [
                {
                    "name": "e2e",
                    "type": "parquet",
                    "url": sf_dir,
                    "tables": [{"name": "lineitem"}, {"name": "orders"}],
                }
            ]
        },
        spark=spark,
    )
    return eng.sql(
        """
        SELECT o.o_orderpriority,
               CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,4))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM e2e_lineitem l JOIN e2e_orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01' AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@query(
    "join_lateral_top_orders_per_customer",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders
             WHERE o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
    WHERE c.c_custkey < 20
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
    """,
    notes=(
        "r15: correlated LATERAL subquery (top-N per group via "
        "per-row derived table, SPARK-34382 / DuckDB LATERAL). "
        "Catalyst rewrites it to a DomainJoin + window; raw columns "
        "ride through so values hash-match with no decimal discipline "
        "needed; LIMIT carries a full tie-break"
    ),
)
def join_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) o
        WHERE c.c_custkey < 20
        ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "agg_group_by_all",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ALL
    ORDER BY o_orderpriority, o_orderstatus
    """,
    notes=(
        "r15: GROUP BY ALL (every non-aggregate select item becomes a "
        "key — Spark 3.4+/DuckDB shared dialect sugar); decimal sum "
        "for the order-independent hash"
    ),
)
def agg_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE) AS total
        FROM orders
        GROUP BY ALL
        ORDER BY o_orderpriority, o_orderstatus
        """
    )


@query(
    "window_qualify_top2_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) <= 2
    ORDER BY o_custkey, o_totalprice DESC, o_orderkey
    """,
    notes=(
        "r15: QUALIFY-clause semantics (DuckDB/Snowflake dialect; "
        "Spark lacks the clause, so the engine side is the canonical "
        "row_number-subquery rewrite dialects compile QUALIFY into — "
        "proving the rewrite is value-identical to a native QUALIFY)"
    ),
)
def window_qualify_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 2
        ORDER BY o_custkey, o_totalprice DESC, o_orderkey
        """
    )
