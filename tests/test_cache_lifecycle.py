"""Operator persist/cache lifecycle census (r10, VERDICT task 6).

Two legitimate cache lifetimes exist in this codebase:

1. RELEASED-BY-THE-OPERATOR: the operator materializes its result
   (checkpoint) and unpersists its working cache before returning —
   nothing survives in the SQL cache manager after the call.
2. BACKS-THE-RETURNED-HANDLE: the cache IS what makes the returned
   lazy DataFrame cheap to consume (it feeds >= 2 lineages inside the
   returned plan), so the operator cannot release it; callers reclaim
   via spark.catalog.clearCache() between batches (documented in each
   operator's docstring, r8 advice).

This census pins BOTH lists so they cannot drift silently: a new
operator that leaks a cache fails the "released" assertions; an
operator that stops needing its documented cache fails the "backing"
assertions (shrink the exception list when that happens).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strake_spark.data import table
from tests.conftest import SF_DIR


def _sql_cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


@pytest.fixture(autouse=True)
def _clean_cache(spark):
    spark.catalog.clearCache()
    yield
    spark.catalog.clearCache()


class TestReleasedByOperator:
    """Operators with a local consuming action (checkpoint) must leave
    the SQL cache manager exactly as they found it."""

    def test_kmeans_assign_releases_source_cache(self, spark):
        from strake_spark.operators import semdedup as SD

        SD.kmeans_assign(table(spark, SF_DIR, "embeddings"), k=8, iters=2).count()
        assert _sql_cache_empty(spark)

    def test_semantic_prune_releases_source_cache(self, spark):
        from strake_spark.operators import semdedup as SD

        SD.semantic_prune(table(spark, SF_DIR, "embeddings"), k=8, iters=2).count()
        assert _sql_cache_empty(spark)


class TestBacksReturnedHandle:
    """The documented exception list: operators whose cache backs the
    returned lazy DataFrame (>= 2 consumers inside the returned plan).
    Each entry asserts the cache is PRESENT after consumption — if one
    of these stops caching, remove it here and from the docstring."""

    def _consume_and_check(self, spark, df):
        df.count()
        assert not _sql_cache_empty(spark), (
            "expected a handle-backing cache; if this operator no longer "
            "persists, drop it from the census exception list"
        )

    def test_minhash_candidates_signature_cache(self, spark):
        from strake_spark.operators import dedup as D

        self._consume_and_check(
            spark, D.minhash_candidates(table(spark, SF_DIR, "documents"))
        )

    def test_simhash_pairs_signature_cache(self, spark):
        # r14: the signature relation feeds the gate count and the
        # blocked lineage; it is narrow (two int64s/doc) so the cache
        # backs the returned handle like minhash's (release contract:
        # clearCache() between batches)
        from strake_spark.operators import dedup as D

        self._consume_and_check(
            spark, D.simhash_near_pairs(table(spark, SF_DIR, "documents"))
        )

    def test_duplicate_clusters_release_contract(self, spark):
        # duplicate_clusters checkpoints the edges immediately, so it
        # opts OUT of the simhash signature cache (persist=False) — a
        # cache with no surviving handle could never be released
        from strake_spark.operators import dedup as D

        D.duplicate_clusters(table(spark, SF_DIR, "documents")).count()
        assert _sql_cache_empty(spark)

    def test_cross_corpus_signature_caches(self, spark):
        # BOTH per-side signature caches back the returned handle (each
        # feeds its banded lineage, the gate count, and its scoring-join
        # side) — release contract documented in the operator docstring:
        # callers reclaim via clearCache() between batches
        from pyspark.sql import functions as F

        from strake_spark.operators import dedup as D

        docs = table(spark, SF_DIR, "documents")
        D.cross_corpus_candidates(
            docs.filter(F.col("doc_id") % 2 == 1),
            docs.filter(F.col("doc_id") % 2 == 0),
        ).count()
        cm = spark._jsparkSession.sharedState().cacheManager()
        assert not cm.isEmpty()
        # two distinct cached relations: sig_new and sig_ref. Count the
        # SQL cache manager's OWN entries, never getRDDStorageInfo():
        # that is a global block-manager census where localCheckpoint
        # RDDs from earlier tests linger until the async ContextCleaner
        # releases them (1-in-2 full-suite flake, r13 verdict finding
        # #1). The fixture's clearCache() empties the cache manager, so
        # its entry count is exactly this operator's caches.
        assert cm.numCachedEntries() == 2, (
            f"expected exactly the sig_new + sig_ref caches, got "
            f"{cm.numCachedEntries()}"
        )

    def test_semantic_contamination_no_cache_below_cap(self, spark):
        # r13: below the cap the plan is the single-lineage r12 shape —
        # nothing persists (an unconditional persist measured 2.5-3x
        # slower at sf0.1: cache round-trip of the vector column plus
        # an extra materialization job)
        from pyspark.sql import functions as F

        from strake_spark.operators import similarity as S

        emb = table(spark, SF_DIR, "embeddings")
        S.semantic_contamination(
            emb.filter(F.col("vec_id") % 2 == 1),
            emb.filter(F.col("vec_id") % 2 == 0),
            threshold=0.4, num_bands=24,
        ).count()
        assert _sql_cache_empty(spark)

    def test_semantic_contamination_profile_cache_when_hot_pass_fires(self, spark):
        # over-cap regime: the profile feeds two lineages (bucket count
        # pass + kernel), so it persists and backs the returned handle
        # (release via clearCache())
        from pyspark.sql import functions as F

        from strake_spark.operators import similarity as S

        emb = table(spark, SF_DIR, "embeddings")
        self._consume_and_check(
            spark,
            S.semantic_contamination(
                emb.filter(F.col("vec_id") % 2 == 1),
                emb.filter(F.col("vec_id") % 2 == 0),
                threshold=0.4, num_bands=24, max_bucket_size=10,
            ),
        )

    def test_bm25_profile_cache(self, spark):
        from strake_spark.operators import ranking as R

        self._consume_and_check(
            spark,
            R.bm25_scores(table(spark, SF_DIR, "documents"), ["the", "data"]),
        )

    def test_embedding_dup_pairs_profile_cache(self, spark):
        from strake_spark.operators import similarity as S

        self._consume_and_check(
            spark, S.embedding_dup_pairs(table(spark, SF_DIR, "embeddings"), threshold=0.4)
        )

    def test_incremental_rollup_partial_caches(self, spark):
        from strake_spark.operators import rollup as RU

        ev = table(spark, SF_DIR, "events").select(
            "user_id", F.col("event_type"), F.lit(1.0).alias("value")
        )
        base = ev.filter(F.col("user_id") % 2 == 0)
        late = ev.filter(F.col("user_id") % 2 == 1)
        self._consume_and_check(
            spark, RU.incremental_rollup(base, late, ["user_id", "event_type"])
        )

    def test_q11_and_q15_fact_aggregate_caches(self, spark):
        from strake_spark import inventory

        for name in ("tpch_q11_important_stock", "tpch_q15_top_supplier"):
            spark.catalog.clearCache()
            inventory.REGISTRY[name].fn(spark, SF_DIR).count()
            assert not _sql_cache_empty(spark), name

    def test_opt_out_leaves_no_cache(self, spark):
        """persist=False is honored: the opt-out path must leave the
        cache manager empty for every operator that offers it."""
        from strake_spark.operators import ranking as R
        from strake_spark.operators import rollup as RU
        from strake_spark.operators import semdedup as SD

        docs = table(spark, SF_DIR, "documents")
        R.bm25_scores(docs, ["the"], persist=False).count()
        assert _sql_cache_empty(spark)
        from strake_spark.operators import dedup as D

        D.simhash_near_pairs(docs, persist=False).count()
        assert _sql_cache_empty(spark)
        ev = table(spark, SF_DIR, "events").select(
            "user_id", F.col("event_type"), F.lit(1.0).alias("value")
        )
        RU.incremental_rollup(ev, ev, ["user_id"], persist=False).count()
        assert _sql_cache_empty(spark)
        SD.semantic_prune(
            table(spark, SF_DIR, "embeddings"), k=8, iters=2, persist=False
        ).count()
        assert _sql_cache_empty(spark)
