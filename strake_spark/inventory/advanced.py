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


@query(
    "window_frame_exclude_emulated",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM({sql_dec('l_extendedprice')}) OVER (
                 PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                 EXCLUDE CURRENT ROW) AS DOUBLE) AS ex_current,
           CAST(SUM({sql_dec('l_extendedprice')}) OVER (
                 PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                 EXCLUDE GROUP) AS DOUBLE) AS ex_group,
           CAST(SUM({sql_dec('l_extendedprice')}) OVER (
                 PARTITION BY l_returnflag ORDER BY l_quantity
                 RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
                 EXCLUDE TIES) AS DOUBLE) AS ex_ties
    FROM lineitem
    WHERE l_orderkey <= 4000
    ORDER BY l_orderkey, l_linenumber
    """,
    notes=(
        "SQL-standard frame EXCLUDE clause (CURRENT ROW / GROUP / TIES), "
        "which Spark's frame grammar lacks — emulated exactly in decimal "
        "arithmetic: a RANGE frame sum combined with the per-peer-group "
        "sum (RANGE 0..0) and the row's own value (frame - current; "
        "frame - peers; frame - peers + current). A SUM over an "
        "exclusion-emptied frame is NULL in SQL, not 0, so each "
        "emulation carries a surviving-row-count guard (the count "
        "windows reuse the same partitioning/sort). RANGE (not ROWS) "
        "keeps every quantity deterministic under ties. Oracle = "
        "DuckDB's NATIVE EXCLUDE implementation — the strongest oracle "
        "for an emulated gap, same precedent as the GROUPS frame above. "
        "All emulations reuse ONE partitioning and sort (single "
        "shuffle)"
    ),
)
def window_frame_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 4000)
    price = F.col("l_extendedprice").cast("decimal(15,4)")
    base = Window.partitionBy("l_returnflag").orderBy("l_quantity")
    frame = base.rangeBetween(-2, 2)
    peers = base.rangeBetween(Window.currentRow, Window.currentRow)
    frame_sum = F.sum(price).over(frame)
    peer_sum = F.sum(price).over(peers)
    frame_n = F.count(F.lit(1)).over(frame)
    peer_n = F.count(F.lit(1)).over(peers)
    ex_current = F.when(frame_n > 1, frame_sum - price)
    ex_group = F.when(frame_n > peer_n, frame_sum - peer_sum)
    # EXCLUDE TIES keeps the current row itself, so its set is never empty
    return l.select(
        "l_orderkey",
        "l_linenumber",
        ex_current.cast("double").alias("ex_current"),
        ex_group.cast("double").alias("ex_group"),
        (frame_sum - peer_sum + price).cast("double").alias("ex_ties"),
    ).orderBy("l_orderkey", "l_linenumber")
