"""Edge-case units for asof_join direction='nearest' (the inventory
entry covers the bulk semantics vs DuckDB; these pin the corners) and
the native-vs-decimal parity of the regression aggregate family."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from strake_spark.operators.asof import asof_join


def _nearest(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "k int, t double, lid int")
    right = spark.createDataFrame(right_rows, "k int, t double, rv string")
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_cols=["rv"], direction="nearest", **kw,
    )
    return {r["lid"]: (r["t_asof"], r["rv_asof"]) for r in out.collect()}


def test_nearest_picks_closer_side(spark):
    got = _nearest(
        spark,
        [(1, 10.0, 1)],
        [(1, 7.0, "far-back"), (1, 11.0, "near-fwd")],
    )
    assert got[1] == (11.0, "near-fwd")


def test_nearest_tie_goes_backward(spark):
    got = _nearest(
        spark,
        [(1, 10.0, 1)],
        [(1, 8.0, "back"), (1, 12.0, "fwd")],
    )
    assert got[1] == (8.0, "back")


def test_nearest_exact_time_matches(spark):
    got = _nearest(spark, [(1, 10.0, 1)], [(1, 10.0, "same")])
    assert got[1] == (10.0, "same")


def test_nearest_one_sided_and_unmatched(spark):
    got = _nearest(
        spark,
        [(1, 10.0, 1), (2, 10.0, 2), (3, 10.0, 3)],
        [(1, 20.0, "only-fwd"), (2, 1.0, "only-back")],
    )
    assert got[1] == (20.0, "only-fwd")
    assert got[2] == (1.0, "only-back")
    assert got[3] == (None, None)


def test_nearest_tolerance_drops_far_matches(spark):
    got = _nearest(
        spark,
        [(1, 10.0, 1), (2, 10.0, 2)],
        [(1, 12.0, "near"), (2, 99.0, "far")],
        tolerance=F.lit(5.0),
    )
    assert got[1] == (12.0, "near")
    assert got[2] == (None, None)


def test_nearest_is_single_shuffle(spark):
    """Both direction fills must share ONE hash partitioning on the
    keys (two sorts, no second exchange) — the operator's scale
    contract (see operators/asof.py module docstring)."""
    import re

    left = spark.createDataFrame([(1, 10.0, 1)], "k int, t double, lid int")
    right = spark.createDataFrame([(1, 7.0, "a")], "k int, t double, rv string")
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_cols=["rv"], direction="nearest",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert len(re.findall(r"\bSort \[", plan)) == 2


def test_regression_family_matches_native_aggregates(spark):
    """The oracled entry derives slope/intercept/r2/corr from exact
    decimal co-moment sums (order-independent, hash-safe); Spark's
    native regr_*/corr must agree to float tolerance on the same
    pre-scaled data."""
    from strake_spark.data import table
    from strake_spark.inventory import REGISTRY

    sf_dir = "/root/testdata/sf0.001"
    ours = {
        r["l_returnflag"]: r
        for r in REGISTRY["agg_regression_family"].fn(spark, sf_dir).collect()
    }
    l = table(spark, sf_dir, "lineitem")
    native = {
        r["l_returnflag"]: r
        for r in l.select(
            "l_returnflag",
            F.col("l_quantity").alias("x"),
            (F.col("l_extendedprice") * F.lit(0.0001)).alias("y"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.regr_slope("y", "x").alias("slope"),
            F.regr_intercept("y", "x").alias("intercept"),
            F.regr_r2("y", "x").alias("r2"),
            F.corr("y", "x").alias("corr_xy"),
        )
        .collect()
    }
    assert set(ours) == set(native)
    for flag, o in ours.items():
        n = native[flag]
        for fld in ("slope", "intercept", "r2", "corr_xy"):
            assert math.isclose(o[fld], n[fld], rel_tol=1e-9, abs_tol=1e-12), (
                flag, fld, o[fld], n[fld],
            )


def test_nearest_matches_pandas_merge_asof(spark):
    """Independent third implementation: pandas merge_asof with
    direction='nearest' resolves ties to the backward side (same
    contract) — compare on a deterministic synthetic set with
    duplicate-free right times per key."""
    import numpy as np
    import pandas as pd

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.randint(0, 5, 200),
        "t": np.sort(rng.uniform(0, 1000, 200)),
        "lid": np.arange(200),
    })
    right_t = np.sort(rng.choice(np.arange(0, 2000), size=150, replace=False) / 2.0)
    right = pd.DataFrame({
        "k": rng.randint(0, 5, 150),
        "t": right_t,
        "rv": [f"r{i}" for i in range(150)],
    })
    exp = pd.merge_asof(
        left.sort_values("t"), right.sort_values("t"),
        on="t", by="k", direction="nearest", suffixes=("", "_r"),
    ).set_index("lid")["rv"]

    got_df = asof_join(
        spark.createDataFrame(left),
        spark.createDataFrame(right),
        on=["k"], left_time="t", right_time="t",
        right_cols=["rv"], direction="nearest",
    )
    got = {r["lid"]: r["rv_asof"] for r in got_df.collect()}
    for lid, rv in exp.items():
        want = None if pd.isna(rv) else rv
        assert got[lid] == want, (lid, got[lid], want)


def test_nearest_exact_microsecond_tie_goes_backward(spark):
    """Exact tie at microsecond granularity on real timestamps: the
    double-cast ulp at 2024 epochs (~0.5us) must not flip the
    contractual backward choice — distances compare in unix_micros."""
    left = spark.sql(
        "SELECT 1 AS k, timestamp'2024-06-15 12:00:00.000500' AS t, 1 AS lid"
    )
    right = spark.sql(
        """SELECT 1 AS k, timestamp'2024-06-15 12:00:00.000000' AS t, 'back' AS rv
           UNION ALL
           SELECT 1, timestamp'2024-06-15 12:00:00.001000', 'fwd'"""
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_cols=["rv"], direction="nearest",
    ).collect()
    assert out[0]["rv_asof"] == "back"


def test_nearest_interval_tolerance_on_timestamps(spark):
    """One tolerance type must work across all directions: an INTERVAL
    tolerance on timestamp columns applies to 'nearest' too."""
    left = spark.sql(
        """SELECT 1 AS k, timestamp'2024-06-15 12:00:00' AS t, 1 AS lid
           UNION ALL SELECT 2, timestamp'2024-06-15 12:00:00', 2"""
    )
    right = spark.sql(
        """SELECT 1 AS k, timestamp'2024-06-15 12:30:00' AS t, 'near' AS rv
           UNION ALL SELECT 2, timestamp'2024-06-16 23:00:00', 'far'"""
    )
    out = asof_join(
        left, right, on=["k"], left_time="t", right_time="t",
        right_cols=["rv"], direction="nearest",
        tolerance=F.expr("INTERVAL 1 HOUR"),
    )
    got = {r["lid"]: r["rv_asof"] for r in out.collect()}
    assert got == {1: "near", 2: None}
