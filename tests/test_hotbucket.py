"""Direct contract tests for the shared gated hot-bucket drop
(operators/hotbucket.py, extracted r13) — the one skew guard behind
minhash_candidates, cross_corpus_candidates, embedding_dup_pairs,
semantic_contamination and (r14) simhash_near_pairs. The operator-level
behavior is pinned by each operator's own tests; these pin the helper's
contract so a call site cannot mis-use it silently."""

from __future__ import annotations

from pyspark.sql import functions as F

from strake_spark.operators.hotbucket import drop_hot_buckets


def _rel(spark, rows):
    return spark.createDataFrame(rows, "band int, band_key string, id bigint")


def test_gate_skips_pass_entirely(spark):
    """gate_rows <= cap proves no bucket can exceed the cap: the input
    relations come back identically (same objects, no anti-join plan)."""
    r = _rel(spark, [(0, "a", i) for i in range(5)])
    out, = drop_hot_buckets([r], ("band", "band_key"), 10, 5)
    assert out is r


def test_over_cap_bucket_removed_others_kept(spark):
    rows = [(0, "hot", i) for i in range(6)] + [(0, "cold", 100 + i) for i in range(3)]
    r = _rel(spark, rows)
    out, = drop_hot_buckets([r], ("band", "band_key"), 5, len(rows))
    got = {(x.band_key, x.id) for x in out.collect()}
    assert got == {("cold", 100), ("cold", 101), ("cold", 102)}


def test_membership_counted_across_relations(spark):
    """Union counting: a bucket under the cap on each side alone but
    over it combined is dropped from BOTH relations (the cross-corpus
    flood case)."""
    a = _rel(spark, [(0, "shared", i) for i in range(4)] + [(0, "only_a", 50)])
    b = _rel(spark, [(0, "shared", 100 + i) for i in range(4)])
    fa, fb = drop_hot_buckets([a, b], ("band", "band_key"), 6, 9)
    assert {x.band_key for x in fa.collect()} == {"only_a"}
    assert fb.count() == 0


def test_same_key_in_different_bands_is_different_bucket(spark):
    """The bucket identity is the FULL key tuple: band 0's hot key must
    not drop band 1's same-named (cold) bucket."""
    rows = [(0, "k", i) for i in range(6)] + [(1, "k", 100 + i) for i in range(2)]
    r = _rel(spark, rows)
    out, = drop_hot_buckets([r], ("band", "band_key"), 5, len(rows))
    got = {(x.band, x.id) for x in out.collect()}
    assert got == {(1, 100), (1, 101)}


def test_simhash_site_routes_through_helper(spark):
    """r14 (r13 verdict finding #3): simhash_near_pairs was the last
    inline drop block; it must now show the helper's shape — gated off
    below the cap (no anti-join in the plan), broadcast anti-join with
    the blocks dropped when a boilerplate corpus trips it."""
    from strake_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(i, "the same boilerplate page text") for i in range(30)],
        "doc_id bigint, text string",
    )
    capped = D.simhash_near_pairs(docs, max_bucket_size=10)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert capped.count() == 0  # identical docs share every block
    spark.catalog.clearCache()
    under = D.simhash_near_pairs(docs, max_bucket_size=1000)
    plan = under._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" not in plan  # gate proves the pass is a no-op
    assert under.count() == 30 * 29 // 2
    spark.catalog.clearCache()


def test_drop_is_broadcast_anti_join(spark):
    """Scale shape: the removal must be a broadcast anti-join (map-side,
    tiny build), never a shuffle of the member stream."""
    r = _rel(spark, [(0, "hot", i) for i in range(6)])
    out, = drop_hot_buckets([r], ("band", "band_key"), 5, 6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert out.count() == 0
