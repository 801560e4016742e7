"""ANN-assisted SemDeDup assignment (r16, VERDICT task 5): the
assign_method='ann' path probes sign-bit LSH cells over the centroid
table and scores rows only against the probed subset. Parity contract:
on planted hyperplane-safe clusters — every member a POSITIVE scaling
of its cluster's representative direction, so every member shares its
representative's bucket exactly (positive scaling preserves hyperplane
signs; the same construction pins knn_label_consistency's lsh mode) —
the probed assignment equals the exact assignment bit-for-bit."""

from __future__ import annotations

import random

import pytest

from strake_spark.operators import semdedup as SD
from tests.conftest import SF_DIR


def _planted(spark, k: int = 6, dim: int = 8, per_cluster: int = 25, seed: int = 16):
    """ids 0..k-1 are the cluster representatives (so k-means init
    centroids AND the LSH anchors are exactly those directions);
    every other member is rep * positive scale."""
    rng = random.Random(seed)
    reps = [
        [rng.choice([-1.0, 1.0]) * (1.0 + rng.random()) for _ in range(dim)]
        for _ in range(k)
    ]
    rows = [(j, reps[j]) for j in range(k)]
    nid = k
    for j in range(k):
        for _ in range(per_cluster):
            s = 0.5 + 1.5 * rng.random()  # positive scale only
            rows.append((nid, [s * x for x in reps[j]]))
            nid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    return df, reps


def _buckets(reps, anchors):
    out = []
    for r in reps:
        b = 0
        for a in anchors:
            b = b * 2 + (1 if sum(x * y for x, y in zip(r, a)) >= 0 else 0)
        out.append(b)
    return out


@pytest.mark.parametrize("seed", [16, 17, 99])
def test_ann_assignment_equals_exact_on_planted_clusters(spark, seed):
    df, reps = _planted(spark, seed=seed)
    # anchors = the 3 smallest ids' vectors = reps[0..2]; the planted
    # geometry must actually spread representatives over >= 2 buckets,
    # otherwise the probe is vacuous and this test proves nothing
    assert len(set(_buckets(reps, reps[:3]))) >= 2
    exact = {
        (r.vec_id, r.cluster)
        for r in SD.kmeans_assign(df, k=6, iters=2, assign_method="exact").collect()
    }
    ann = {
        (r.vec_id, r.cluster)
        for r in SD.kmeans_assign(
            df, k=6, iters=2, assign_method="ann", n_anchor_bits=3
        ).collect()
    }
    assert ann == exact
    # and each planted member landed with its own representative
    assert all(cl < 6 for _, cl in ann)


def test_ann_prune_equals_exact_prune_on_planted_clusters(spark):
    df, _ = _planted(spark, seed=42)
    exact = {
        (r.vec_id, r.cluster)
        for r in SD.semantic_prune(df, k=6, iters=2, tau=0.999999).collect()
    }
    ann = {
        (r.vec_id, r.cluster)
        for r in SD.semantic_prune(
            df, k=6, iters=2, tau=0.999999, assign_method="ann", n_anchor_bits=3
        ).collect()
    }
    assert ann == exact
    # positive scalings have cosine exactly 1.0 with their own cluster:
    # at tau just under 1 only each cluster's smallest id survives
    assert len(ann) == 6


def test_probe_hamming_widens_but_preserves_parity(spark):
    df, _ = _planted(spark, seed=7)
    exact = {
        (r.vec_id, r.cluster)
        for r in SD.kmeans_assign(df, k=6, iters=2).collect()
    }
    for h in (0, 1, 3):  # h = n_anchor_bits scans everything
        got = {
            (r.vec_id, r.cluster)
            for r in SD.kmeans_assign(
                df, k=6, iters=2, assign_method="ann",
                n_anchor_bits=3, probe_hamming=h,
            ).collect()
        }
        assert got == exact, f"probe_hamming={h}"


def test_ann_on_real_embeddings_assigns_every_row(spark):
    """No planted structure: the ANN path may diverge from exact on
    arbitrary data (that is the approximation), but it must still
    assign EVERY row to a real cluster — the empty-probe fallback
    guarantees totality."""
    from strake_spark.data import table

    emb = table(spark, SF_DIR, "embeddings")
    n = emb.count()
    rows = SD.kmeans_assign(
        emb, k=8, iters=2, assign_method="ann", n_anchor_bits=4
    ).collect()
    assert len(rows) == n
    assert len({r.vec_id for r in rows}) == n
    valid = {r.vec_id for r in emb.orderBy("vec_id").limit(8).collect()}
    assert {r.cluster for r in rows} <= valid


def test_bad_ann_params_raise(spark):
    df, _ = _planted(spark)
    with pytest.raises(ValueError, match="n_anchor_bits"):
        SD.kmeans_assign(df, k=6, assign_method="ann", n_anchor_bits=0)
    with pytest.raises(ValueError, match="assign_method"):
        SD.kmeans_assign(df, k=6, assign_method="ivf-nope")


class TestAutoAssign:
    """assign_method='auto' (r17, VERDICT task 6): pick 'ann' at or
    above the MEASURED crossover (AUTO_ANN_MIN_K = 16: sf0.1 medians
    k=8 +4%, k=16 -7.5%, k=32 -19.4%, k=64 -30%), 'exact' below it."""

    def test_auto_below_crossover_equals_exact(self, spark):
        df, _ = _planted(spark, k=6, seed=23)
        exact = SD.kmeans_assign(df, k=6, assign_method="exact").toPandas()
        auto = SD.kmeans_assign(df, k=6, assign_method="auto").toPandas()
        assert exact.sort_values("vec_id").values.tolist() == \
            auto.sort_values("vec_id").values.tolist()

    def test_auto_at_crossover_equals_exact_on_planted(self, spark):
        """At k >= AUTO_ANN_MIN_K auto takes the ann path; on planted
        hyperplane-safe clusters that path is bit-equal to exact, so
        auto == exact proves BOTH the dispatch and the parity."""
        k = SD.AUTO_ANN_MIN_K
        df, _ = _planted(spark, k=k, per_cluster=6, seed=31)
        exact = SD.kmeans_assign(df, k=k, assign_method="exact").toPandas()
        auto = SD.kmeans_assign(df, k=k, assign_method="auto").toPandas()
        assert exact.sort_values("vec_id").values.tolist() == \
            auto.sort_values("vec_id").values.tolist()

    def test_auto_dispatch_points(self):
        """The dispatch itself, pinned without Spark: below -> exact
        engine (the module-level _assign), at/above -> a lambda."""
        # _make_assign only touches `e` on the ann path (anchor probe),
        # so exact-dispatch is checkable with no DataFrame at all
        assert SD._make_assign(None, "auto", 3, 0, k=SD.AUTO_ANN_MIN_K - 1) is SD._assign

    def test_auto_requires_k(self):
        with pytest.raises(ValueError, match="requires k"):
            SD._make_assign(None, "auto", 3, 0, k=None)
