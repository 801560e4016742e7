"""ANN quality: LSH-bucketed and IVF approximate top-k must recover a
meaningful fraction of the exact brute-force neighbors (the property
the rows-only inventory entries defer to)."""

from __future__ import annotations

import pytest

from strake_spark.data import table
from strake_spark.operators import similarity as S
from tests.conftest import SF_DIR


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.nbr_id)
    return out


@pytest.fixture(scope="module")
def exact(spark):
    emb = table(spark, SF_DIR, "embeddings")
    return _topk_sets(S.cosine_topk(emb, k=3, n_queries=20))


@pytest.mark.slow
# slow (r20, suite budget): recall QUALITY properties of the rows-only
# ANN entries (~100 s of PQ/IVF training). Always-on twins: the
# *_deterministic_topk and *_recall_vs_exact entries' EXACT oracles in
# test_inventory_sf0001 (now in the r20 driver window). Runs in the
# SPARK_GRAFT_FULL_SUITE=1 round-close record.
class TestRecall:
    def test_lsh_recall(self, spark, exact):
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.lsh_topk(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"LSH recall {hits}/{total}"

    def test_ivf_recall(self, spark, exact):
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.ivf_topk(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"IVF recall {hits}/{total}"

    def test_ivf_deterministic(self, spark):
        emb = table(spark, SF_DIR, "embeddings")
        a = S.ivf_topk(emb, k=3, n_queries=5).collect()
        b = S.ivf_topk(emb, k=3, n_queries=5).collect()
        assert a == b  # fixed seed -> stable cells -> stable results

    def test_ivf_oracle_exact_variant_recall(self, spark, exact):
        """The hash-green IVF (deterministic decimal k-means, r10) must
        not trade away quality: recall@3 vs exact. Measured p2: 0.733
        (sf0.001) / 0.633 (sf0.01) / 0.617 (sf0.1); p4: 0.83-0.85 at all
        three — at or above the MLlib trainer's numbers."""
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.ivf_topk_deterministic(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"det-IVF recall {hits}/{total}"

    def test_pq_oracle_exact_variant_recall(self, spark, exact):
        """The hash-green PQ (deterministic per-subspace L2 k-means,
        r10): recall@3 vs exact measured 0.95 (sf0.001) / 0.983
        (sf0.01) / 0.85 (sf0.1) — above the MLlib trainer's numbers."""
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.pq_topk_deterministic(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"det-PQ recall {hits}/{total}"

    def test_ivfpq_oracle_exact_variant_recall(self, spark, exact):
        """The hash-green IVFPQ (deterministic coarse + PQ training,
        r10): recall@3 vs exact measured 0.85 (sf0.001) / 0.733
        (sf0.1)."""
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.ivfpq_topk_deterministic(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"det-IVFPQ recall {hits}/{total}"

    def test_pq_recall(self, spark, exact):
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.pq_topk(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"PQ recall {hits}/{total}"

    def test_ivfpq_recall(self, spark, exact):
        emb = table(spark, SF_DIR, "embeddings")
        approx = _topk_sets(S.ivfpq_topk(emb, k=3, n_queries=20))
        hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
        total = sum(len(v) for v in exact.values())
        assert hits / total >= 0.5, f"IVFPQ recall {hits}/{total}"

    @pytest.mark.slow
    def test_det_variants_partition_invariant(self, spark):
        # slow (r20): re-trains the deterministic PQ/IVFPQ variants at
        # multiple repartition widths (~55 s); single-width determinism
        # stays covered on every default run by the inventory oracle
        # checks of the *_deterministic_topk entries.
        """The oracle-exact ANN variants' core claim: DECIMAL centroid
        sums make training order-independent, so results are identical
        under any repartitioning (the property that lets a
        single-threaded DuckDB oracle hash-match a 32-way Spark run)."""
        emb = table(spark, SF_DIR, "embeddings")
        for fn in (S.ivf_topk_deterministic, S.pq_topk_deterministic,
                   S.ivfpq_topk_deterministic):
            a = sorted(map(tuple, fn(emb, k=3, n_queries=10).collect()))
            b = sorted(map(tuple, fn(emb.repartition(7), k=3, n_queries=10).collect()))
            assert a == b, fn.__name__

    def test_pq_deterministic(self, spark):
        emb = table(spark, SF_DIR, "embeddings")
        a = S.pq_topk(emb, k=3, n_queries=5).collect()
        b = S.pq_topk(emb, k=3, n_queries=5).collect()
        assert a == b  # fixed seeds -> stable codebooks -> stable results


class TestKnnLabelConsistencyMethods:
    """r13 (VERDICT task 4): knn_label_consistency gained a scaling
    neighbor source (method='lsh' reusing lsh_topk). Parity discipline:
    exact equality on a planted-cluster corpus where LSH provably
    recovers the true neighbors, plus an agreement floor on the
    synthetic embeddings (where LSH recall is only bounded, not 1.0)."""

    def _planted(self, spark):
        import math

        rows = []
        dim = 8
        for c in range(4):
            base = [math.sin(1.1 * (c + 1) * (j + 1)) for j in range(dim)]
            for m in range(4):
                # positive scaling + a tiny same-direction tilt keeps
                # every member's hyperplane signs equal to the base's,
                # so each cluster occupies exactly one LSH bucket
                vec = [x * (1.0 + 0.002 * m) for x in base]
                vec[0] += 0.0001 * m
                rows.append((c * 10 + m, c % 2, vec))
        return spark.createDataFrame(
            rows, "vec_id bigint, label bigint, embedding array<double>"
        )

    def test_lsh_equals_exact_on_planted_clusters(self, spark):
        emb = self._planted(spark)
        kw = dict(k=3, n_queries=100)
        exact_rows = sorted(
            map(tuple, S.knn_label_consistency(emb, method="exact", **kw).collect())
        )
        lsh_rows = sorted(
            map(tuple, S.knn_label_consistency(emb, method="lsh", **kw).collect())
        )
        assert len(exact_rows) == 16
        assert lsh_rows == exact_rows

    def test_lsh_agreement_floor_on_synthetic(self, spark):
        emb = table(spark, SF_DIR, "embeddings")
        kw = dict(k=5, n_queries=50)
        exact_df = S.knn_label_consistency(emb, method="exact", **kw)
        lsh_df = S.knn_label_consistency(emb, method="lsh", **kw)
        assert exact_df.schema == lsh_df.schema
        exact = {r.vec_id: r.label_agreement for r in exact_df.collect()}
        lsh = {r.vec_id: r.label_agreement for r in lsh_df.collect()}
        assert set(lsh) <= set(exact)  # LSH may miss isolated queries
        assert len(lsh) >= 0.8 * len(exact)
        diffs = [abs(exact[q] - lsh[q]) for q in lsh]
        assert sum(diffs) / len(diffs) <= 0.35, sum(diffs) / len(diffs)

    def test_unknown_method_rejected(self, spark):
        emb = table(spark, SF_DIR, "embeddings")
        with pytest.raises(ValueError, match="unknown method"):
            S.knn_label_consistency(emb, method="ivf")


@pytest.mark.slow
# slow (r20, suite budget): pins exact row counts of rows-only entries
# (~30 s of IVFPQ training); the same entries' row counts are recorded
# by the driver itself. FULL_SUITE record only.
class TestRowsOnlyEntryPinned:
    def test_ivfpq_topk_row_count_is_exact(self, spark):
        """r13 (ADVICE r12): ann_ivfpq_topk is the one no-oracle driver
        entry; its 'rows-only' claim was backed by nothing but the
        observed count. Pin it: exactly k rows per query, every query
        answered, ranks dense 1..k — so the driver's spark_rows=60 at
        sf0.01 (k=3 x 20 queries) is a contract, not an observation."""
        from strake_spark import inventory

        df = inventory.REGISTRY["ann_ivfpq_topk"].fn(spark, SF_DIR)
        rows = df.collect()
        assert len(rows) == 60
        per_q = {}
        for r in rows:
            per_q.setdefault(r.query_id, []).append(r.rank)
        assert len(per_q) == 20
        assert all(sorted(v) == [1, 2, 3] for v in per_q.values())
