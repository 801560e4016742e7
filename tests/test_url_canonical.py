"""URL canonicalization contract: idempotence (canon is a fixpoint),
noise-invariance (every synthesized variant of a resource maps to one
key), and shape (stays a pure column expression — no Python)."""

from __future__ import annotations

from pyspark.sql import functions as F

from strake_spark.operators.urls import canonicalize_url


def _urls(spark):
    rows = []
    for i in range(200):
        scheme = "http" if i % 2 == 0 else "https"
        host = f"CDN{i % 7}.Example.ORG" if i % 3 == 0 else f"cdn{i % 7}.example.org"
        trail = "/" if i % 2 == 0 else ""
        qs = ["?utm_source=x&id=%d" % (i % 20), "?id=%d&utm_campaign=y" % (i % 20),
              "?id=%d" % (i % 20), "?id=%d#frag" % (i % 20)][i % 4]
        rows.append((i, f"{scheme}://{host}/a/{i % 20}{trail}{qs}"))
    return spark.createDataFrame(rows, "i int, url string")


def test_canonicalization_is_idempotent(spark):
    df = _urls(spark).select(canonicalize_url("url").alias("c1"))
    twice = df.select("c1", canonicalize_url("c1").alias("c2"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0


def test_noise_variants_collapse_to_one_key(spark):
    df = _urls(spark).select(
        ((F.col("i") % 7).cast("string")).alias("host_id"),
        ((F.col("i") % 20).cast("string")).alias("res_id"),
        canonicalize_url("url").alias("c"),
    )
    # every (host, resource) pair must map to exactly ONE canonical key
    per_resource = df.groupBy("host_id", "res_id").agg(
        F.countDistinct("c").alias("n_keys")
    )
    assert per_resource.filter(F.col("n_keys") != 1).count() == 0


def test_canonical_form_values(spark):
    df = spark.createDataFrame(
        [("http://EX.org/a/1/?utm_source=t&z=2&a=1#frag",),
         ("https://ex.org/a/1?a=1&z=2",)],
        "url string",
    )
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == ["https://ex.org/a/1?a=1&z=2", "https://ex.org/a/1?a=1&z=2"]


def test_stays_jvm_side(spark):
    df = _urls(spark).select(canonicalize_url("url").alias("c"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_ports_preserved_unless_default(spark):
    df = spark.createDataFrame(
        [("http://Ex.org:8080/a",), ("http://ex.org:9090/a",),
         ("https://ex.org:443/a",), ("http://ex.org:80/a",), ("http://ex.org/a",)],
        "url string",
    )
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [
        "https://ex.org:8080/a",
        "https://ex.org:9090/a",
        "https://ex.org/a",
        "https://ex.org/a",
        "https://ex.org/a",
    ]


def test_malformed_urls_pass_through_as_distinct_keys(spark):
    df = spark.createDataFrame(
        [("not a url",), ("example.com/a",), ("https://ok.org/x",)],
        "url string",
    )
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    # unparseable inputs keep their own identity instead of collapsing
    # into one NULL dedup group
    assert got == ["not a url", "example.com/a", "https://ok.org/x"]


def test_double_trailing_slash_is_fixpoint(spark):
    df = spark.createDataFrame([("https://ex.org/a//",), ("https://ex.org/a/",)], "url string")
    got = [r["c"] for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == ["https://ex.org/a", "https://ex.org/a"]
