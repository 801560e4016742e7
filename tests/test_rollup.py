"""Incremental-rollup maintenance invariants (the inventory entry
proves incremental == full recompute against DuckDB; these cover merge
edge cases the 90/10 split doesn't hit)."""

from __future__ import annotations

from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.operators.rollup import incremental_rollup, merge_rollups, rollup_events
from tests.conftest import SF_DIR


def _ev(spark):
    return table(spark, SF_DIR, "events").select(
        F.to_date("ts").alias("day"), "event_type", "value"
    )


def test_empty_delta_is_identity(spark):
    ev = _ev(spark)
    base = rollup_events(ev, ["day", "event_type"])
    merged = merge_rollups(base, rollup_events(ev.filter(F.lit(False)), ["day", "event_type"]),
                           ["day", "event_type"])
    a = {tuple(r) for r in base.collect()}
    assert {tuple(r) for r in merged.collect()} == a


def test_delta_with_brand_new_key(spark):
    ev = _ev(spark)
    base = rollup_events(ev, ["event_type"])
    new = spark.createDataFrame([("__novel__", 123.5)], "event_type string, value double")
    merged = merge_rollups(base, rollup_events(new, ["event_type"]), ["event_type"])
    assert merged.count() == base.count() + 1
    row = merged.filter(F.col("event_type") == "__novel__").first()
    assert row.n_events == 1 and float(row.total_value) == 123.5


def test_merge_equals_full_rollup(spark):
    ev = _ev(spark)
    a = ev.filter(F.col("event_type") <= "m")
    b = ev.filter(F.col("event_type") > "m")
    inc = incremental_rollup(a, b, ["day", "event_type"])
    full = rollup_events(ev, ["day", "event_type"])
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}
