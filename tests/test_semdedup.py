"""SemDeDup operator invariants (inventory entries cover oracle
equality; these cover the operator's own guarantees)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.operators import semdedup as SD
from tests.conftest import SF_DIR


def _emb(spark):
    return table(spark, SF_DIR, "embeddings")


def test_assign_total_and_in_range(spark):
    emb = _emb(spark)
    n = emb.count()
    a = SD.kmeans_assign(emb, k=8, iters=2)
    rows = a.collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    assert {r.cluster for r in rows} <= set(range(8))


def test_assign_carry_cols_matches_join_back(spark):
    # carry_cols (r19 optimization round) must ride the map-only
    # assignment unchanged: same (vec_id, cluster) pairs as the plain
    # call, with the carried label equal to the source row's label.
    emb = _emb(spark)
    plain = {(r.vec_id, r.cluster) for r in SD.kmeans_assign(emb, k=8, iters=2).collect()}
    carried = SD.kmeans_assign(emb, k=8, iters=2, carry_cols=("label",)).collect()
    assert {(r.vec_id, r.cluster) for r in carried} == plain
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    assert all(r.label == labels[r.vec_id] for r in carried)
    assert carried[0].__fields__ == ["vec_id", "cluster", "label"]


def test_assign_deterministic_under_repartition(spark):
    emb = _emb(spark)
    a = {(r.vec_id, r.cluster) for r in SD.kmeans_assign(emb, k=8, iters=2).collect()}
    b = {
        (r.vec_id, r.cluster)
        for r in SD.kmeans_assign(emb.repartition(7), k=8, iters=2).collect()
    }
    assert a == b


def test_prune_is_subset_and_keeps_cluster_minimum(spark):
    emb = _emb(spark)
    assign = {(r.vec_id, r.cluster) for r in SD.kmeans_assign(emb, k=8, iters=2).collect()}
    kept = {(r.vec_id, r.cluster) for r in SD.semantic_prune(emb, k=8, iters=2, tau=0.32).collect()}
    assert kept < assign  # strict: tau=0.32 drops rows on this corpus
    min_per_cluster = {}
    for vid, c in assign:
        min_per_cluster[c] = min(min_per_cluster.get(c, vid), vid)
    # the smallest id in a cluster has no lower-id member, so it survives
    for c, vid in min_per_cluster.items():
        assert (vid, c) in kept


def test_prune_tau_above_one_keeps_all(spark):
    emb = _emb(spark)
    assert SD.semantic_prune(emb, k=8, iters=2, tau=1.01).count() == emb.count()


def test_iters_must_be_positive(spark):
    with pytest.raises(ValueError):
        SD.kmeans_assign(_emb(spark), k=8, iters=0)


def test_offset_ids_do_not_empty_the_centroid_set(spark):
    """r7 advice (medium): init by filter(vec_id < k) silently produced
    an empty centroid set — and so an empty keep-list, pruning the whole
    corpus — for any id space not starting at 0. Init is now the k
    smallest ids, so offset ids must behave exactly like dense ones."""
    emb = _emb(spark)
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    n = emb.count()
    a = SD.kmeans_assign(shifted, k=8, iters=2)
    rows = a.collect()
    assert len(rows) == n  # every row assigned, none lost
    # clusters are the 8 smallest (shifted) ids
    assert {r.cluster for r in rows} <= {1000 + i for i in range(8)}
    # assignment structure matches the unshifted corpus exactly
    base = {(r.vec_id, r.cluster) for r in SD.kmeans_assign(emb, k=8, iters=2).collect()}
    assert {(r.vec_id - 1000, r.cluster - 1000) for r in rows} == base
    # and the keep-list is NOT empty (the old failure mode)
    kept = SD.semantic_prune(shifted, k=8, iters=2, tau=0.32).count()
    assert 0 < kept <= n


def test_bad_params_raise(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError, match="iters"):
        SD.kmeans_assign(emb, k=8, iters=0)
    with pytest.raises(ValueError, match="k must"):
        SD.kmeans_assign(emb, k=0)


def test_carry_cols_reserved_names_rejected(spark):
    # r20 (ADVICE item 2): a carried column colliding with an output or
    # internal working column must fail loudly, not produce ambiguous
    # duplicate columns.
    emb = _emb(spark)
    for bad in ("cluster", "vec_id", "v", "_cents"):
        with pytest.raises(ValueError, match="carry_cols"):
            SD.kmeans_assign(emb, k=2, iters=1, carry_cols=(bad,))
