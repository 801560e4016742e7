"""Runtime filter injection: when a selective filter sits on one side
of a shuffle join, Spark can build a bloom filter from that side and
push a might_contain probe into the other side's scan — the runtime
semi-join reduction that matters when BOTH join sides are fact-sized
(broadcast is off the table) at 100 TB. Verify the optimizer actually
injects it under the documented confs, and that results are unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local testdata is far below the default 10GB/10MB thresholds —
    # relax them so the injection rule fires on sf0.001 inputs
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100GB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


def _with_confs(spark, confs):
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return old


def _restore(spark, old):
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _join(spark):
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bloom_filter_injected_and_result_unchanged(spark):
    baseline = {r["o_orderstatus"]: r["n"] for r in _join(spark).collect()}
    old = _with_confs(spark, _CONFS)
    try:
        j = _join(spark)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, "creation side missing"
        assert "might_contain" in plan, "application-side probe missing"
        got = {r["o_orderstatus"]: r["n"] for r in j.collect()}
    finally:
        _restore(spark, old)
    assert got == baseline and len(got) > 0


def test_bloom_filter_not_injected_below_size_thresholds(spark):
    """The rule is ON by default (Spark >= 3.4) but gated by the 10MB
    application-side / 10GB creation-side size thresholds, which local
    testdata is far below — so an un-tuned session must plan no probe.
    This pins the THRESHOLD behavior, not an enabled/disabled default."""
    plan = _join(spark)._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" not in plan
