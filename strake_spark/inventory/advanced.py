"""Gap-closure operators.

- GROUPS window frames: SURVEY §2.3 flags Spark's missing GROUPS frame
  (the reference translates ROWS/RANGE/GROUPS, sql_generator/
  expr.rs:140-256). A GROUPS frame over (ORDER BY v) is exactly a RANGE
  frame over dense_rank(v): dense_rank indexes peer groups, so RANGE
  BETWEEN n PRECEDING AND m FOLLOWING on the rank covers n/m peer
  groups. The oracle runs DuckDB's NATIVE GROUPS frame — hash-equality
  proves the emulation.
- Array higher-order functions: transform / filter / exists over the
  embeddings array column (the Spark face of DataFusion's list
  function library). Integer-valued outputs keep the comparison exact
  (float reduction order is engine-specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.inventory._util import sql_dec


@query(
    "window_groups_frame_emulated",
    oracle=f"""
    WITH g AS (
      SELECT l_returnflag, l_quantity,
             SUM({sql_dec('l_extendedprice')}) AS grp_sum,
             dense_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS grp
      FROM lineitem GROUP BY l_returnflag, l_quantity
    )
    SELECT a.l_returnflag, a.l_quantity,
           CAST(SUM(b.grp_sum) AS DOUBLE) AS neighborhood_total
    FROM g a JOIN g b
      ON a.l_returnflag = b.l_returnflag AND abs(a.grp - b.grp) <= 1
    GROUP BY a.l_returnflag, a.l_quantity
    ORDER BY a.l_returnflag, a.l_quantity
    """,
    notes=(
        "GROUPS frame emulated as RANGE over dense_rank (neither Spark nor "
        "DuckDB implements GROUPS); the oracle is an independent "
        "formulation — self-join on peer-group distance <= 1 — which is "
        "the definition of a GROUPS 1-PRECEDING/1-FOLLOWING frame"
    ),
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    per_group = l.groupBy("l_returnflag", "l_quantity").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(15,4)")).alias("grp_sum")
    )
    rank_w = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    frame_w = (
        Window.partitionBy("l_returnflag").orderBy("grp").rangeBetween(-1, 1)
    )
    return (
        per_group.withColumn("grp", F.dense_rank().over(rank_w))
        .withColumn(
            "neighborhood_total", F.sum("grp_sum").over(frame_w).cast("double")
        )
        .select("l_returnflag", "l_quantity", "neighborhood_total")
        .orderBy("l_returnflag", "l_quantity")
    )


@query(
    "expr_array_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT)                                    AS dim,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT)           AS n_pos,
           CAST(len(list_filter(embedding, x -> x < 0)) AS BIGINT)           AS n_neg,
           (len(list_filter(embedding, x -> abs(x) > 2.0)) > 0)              AS has_outlier
    FROM embeddings
    ORDER BY vec_id
    """,
    notes="array higher-order functions: size/filter/exists lambdas (integer outputs keep cross-engine comparison exact)",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.size(F.filter("embedding", lambda x: x < 0)).cast("bigint").alias("n_neg"),
        F.exists("embedding", lambda x: F.abs(x) > 2.0).alias("has_outlier"),
    ).orderBy("vec_id")
