"""Set operations, DISTINCT variants, VALUES, LIMIT/OFFSET, sort.

Reference coverage: crates/sql/src/sql_generator/translator/set_ops.rs —
n-ary UNION ALL (:12-73), DISTINCT (:75-111), LIMIT/OFFSET (:112-145),
EmptyRelation (:147-218), VALUES (:219-320), DISTINCT ON rewritten to a
ROW_NUMBER subquery when the dialect lacks it (:321-496) — Spark lacks
DISTINCT ON, so our implementation *is* that rewrite; the oracle uses
DuckDB's native DISTINCT ON to prove equivalence. INTERSECT/EXCEPT are
frontend-level (SURVEY §2.3) and map to Spark intersect/exceptAll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query


@query(
    "set_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer WHERE c_acctbal > 9500
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier WHERE s_acctbal > 9500
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    )
    return c.unionAll(s)


@query(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
    UNION
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9500
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9500)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.union(s).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 9000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.intersect(s)


@query(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    # EXCEPT (distinct) = set difference — subtract(), not exceptAll+distinct
    # (a row present in both sides must vanish entirely, not keep leftovers).
    return c.subtract(s)


@query(
    "set_except_all",
    oracle="""
    SELECT o_orderstatus AS status FROM orders WHERE o_orderkey <= 500
    EXCEPT ALL
    SELECT o_orderstatus AS status FROM orders WHERE o_orderkey <= 100
    """,
    notes="bag semantics: multiplicities subtract",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderkey") <= 500).select(F.col("o_orderstatus").alias("status"))
    b = o.filter(F.col("o_orderkey") <= 100).select(F.col("o_orderstatus").alias("status"))
    return a.exceptAll(b)


@query(
    "distinct_simple",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_simple(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "distinct_on_latest_order",
    oracle="""
    SELECT DISTINCT ON (o_custkey) o_custkey, o_orderkey, o_orderdate
    FROM orders
    ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
    """,
    notes="Spark lacks DISTINCT ON -> ROW_NUMBER rewrite (set_ops.rs:321-496); oracle uses DuckDB's native DISTINCT ON",
)
def distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query(
    "values_inline",
    oracle="""
    SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
    FROM (VALUES (1, 'alpha', 3.5), (2, 'beta', 2.25), (3, 'gamma', 0.125)) AS t(id, name, score)
    """,
    notes="VALUES constant relation (set_ops.rs:219-320); exact binary fractions chosen",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.sql(
        """
        SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
        FROM VALUES (1, 'alpha', 3.5D), (2, 'beta', 2.25D), (3, 'gamma', 0.125D) AS t(id, name, score)
        """
    )


@query(
    "empty_relation",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE 1 = 0",
    notes="EmptyRelation with preserved schema (set_ops.rs:147-218)",
)
def empty_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_totalprice").filter(F.lit(False))


@query(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_custkey FROM orders
    ORDER BY o_orderkey
    LIMIT 50 OFFSET 100
    """,
    notes="pagination with total order (set_ops.rs:112-145)",
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey").orderBy("o_orderkey").offset(100).limit(50)


@query(
    "sort_multi_key_nulls",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_tax, 0) AS tax_or_null
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY tax_or_null ASC NULLS FIRST, l_orderkey DESC, l_linenumber
    LIMIT 100
    """,
    notes="explicit NULLS FIRST: Spark ASC defaults nulls-first, DuckDB nulls-last — never rely on defaults (SURVEY §7 'What's hard')",
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return (
        l.select(
            "l_orderkey",
            "l_linenumber",
            F.nullif(F.col("l_tax"), F.lit(0.0)).alias("tax_or_null"),
        )
        .orderBy(
            F.col("tax_or_null").asc_nulls_first(),
            F.col("l_orderkey").desc(),
            F.col("l_linenumber"),
        )
        .limit(100)
    )


@query(
    "pivot_status_by_flag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(19,4)) END) AS DOUBLE) AS qty_O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(19,4)) END) AS DOUBLE) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    notes="pivot with explicit value list (never inferred — inference is a full extra scan at 100 TB)",
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.inventory._util import dec

    l = table(spark, sf_dir, "lineitem")
    p = (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )
    return p.select(
        "l_returnflag", F.col("O").alias("qty_O"), F.col("F").alias("qty_F")
    )


@query(
    "set_intersect_all",
    oracle="""
    SELECT o_orderpriority AS pri FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_orderpriority AS pri FROM orders WHERE o_totalprice > 100000
    """,
    notes=(
        "r15: INTERSECT ALL (bag semantics — each value kept "
        "min(count_left, count_right) times; Spark intersectAll == "
        "DuckDB INTERSECT ALL). Completes the set-ops family next to "
        "UNION/EXCEPT ALL"
    ),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("pri")
    )
    right = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderpriority").alias("pri")
    )
    return left.intersectAll(right)
