"""Layout-authoring tests: Z-order clustering must beat a linear sort
on non-leading-column predicates at the parquet-footer level, and hive
partitioning must prune at plan time."""

from __future__ import annotations

from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.operators import layout as L
from tests.conftest import SF_DIR_MID


def _lineitem(spark):
    return table(spark, SF_DIR_MID, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )


def test_zorder_skips_on_both_columns(spark, tmp_path):
    df = _lineitem(spark)
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    manifest = L.zorder_write(df, zpath, ["l_partkey", "l_suppkey"], n_files=16, bits=8)
    L.linear_write(df, lpath, "l_partkey", n_files=16)
    assert manifest["cols"]["l_partkey"][1] > manifest["cols"]["l_partkey"][0]

    # leading-column predicate: both layouts should skip well
    z_lead = L.file_skip_stats(zpath, "l_partkey", 100, 150)
    lin_lead = L.file_skip_stats(lpath, "l_partkey", 100, 150)
    assert lin_lead["skippable"] >= lin_lead["files"] - 2  # near-total skip
    assert z_lead["skippable"] >= z_lead["files"] // 2

    # non-leading column: linear layout can skip ~nothing, z-order must
    z_other = L.file_skip_stats(zpath, "l_suppkey", 10, 15)
    lin_other = L.file_skip_stats(lpath, "l_suppkey", 10, 15)
    assert z_other["skippable"] > lin_other["skippable"]
    assert z_other["skippable"] >= z_other["files"] // 2
    assert lin_other["skippable"] <= 2


def test_zorder_roundtrip_preserves_rows(spark, tmp_path):
    df = _lineitem(spark)
    zpath = str(tmp_path / "z2")
    L.zorder_write(df, zpath, ["l_partkey", "l_suppkey"], n_files=8, bits=6)
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    assert "__zkey" not in back.columns
    a = df.groupBy().agg(F.sum("l_partkey"), F.sum("l_suppkey")).first()
    b = back.groupBy().agg(F.sum("l_partkey"), F.sum("l_suppkey")).first()
    assert tuple(a) == tuple(b)


def test_zorder_key_locality(spark):
    # interleave of (3,5) with 4 bits: x=0b0011,y=0b0101
    # positions: x bits at even slots, y bits at odd slots
    row = spark.range(1).select(
        L.zorder_key([F.lit(3), F.lit(5)], bits=4).alias("k")
    ).first()
    # x=0011 -> bits 0,1 set at slots 0,2 ; y=0101 -> bits 0,2 set at slots 1,5
    assert row.k == (1 << 0) | (1 << 2) | (1 << 1) | (1 << 5)


def test_hive_partition_write_prunes(spark, tmp_path):
    df = table(SparkSession := spark, SF_DIR_MID, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    path = str(tmp_path / "hive")
    L.hive_partition_write(df, path, ["o_orderpriority"])
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "o_orderpriority" in plan
    assert back.count() == df.filter(F.col("o_orderpriority") == "1-URGENT").count()


def test_zorder_key_validations():
    import pytest

    with pytest.raises(ValueError):
        L.zorder_key([], bits=4)
    with pytest.raises(ValueError):
        L.zorder_key([F.lit(1), F.lit(2)], bits=40)
