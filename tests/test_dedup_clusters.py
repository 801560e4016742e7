"""duplicate_clusters: connected components over the near-dup graph —
transitivity, singletons, and keeper policy on a constructed corpus."""

from __future__ import annotations

import pytest

from tests.conftest import fuzz_examples

from strake_spark.operators.dedup import duplicate_clusters


def test_transitive_chain_one_cluster(spark):
    # A~B and B~C near-duplicates (1-word edits of a 40-word doc) but A
    # and C differ by 2 words — the pair set alone misses A-C;
    # clustering must put all three together transitively.
    base = " ".join(f"word{i}" for i in range(40))
    b = base.replace("word7", "seven")
    c = b.replace("word23", "twentythree")
    unrelated = " ".join(f"other{i} thing{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, base), (2, b), (3, c), (9, unrelated)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.cluster_id for r in duplicate_clusters(docs).collect()}
    assert out[1] == out[2] == out[3] == 1  # min id in the component
    assert out[9] == 9  # singleton keeps its own id
    # keeper policy: exactly one doc per cluster has doc_id == cluster_id
    keepers = [d for d, cl in out.items() if d == cl]
    assert sorted(keepers) == [1, 9]


def test_non_convergence_raises(spark):
    """Partial labels are corrupt output (clusters silently split), so
    exhausting max_iterations must raise, never return."""
    base = " ".join(f"word{i}" for i in range(40))
    b = base.replace("word7", "seven")
    c = b.replace("word23", "twentythree")
    docs = spark.createDataFrame(
        [(1, base), (2, b), (3, c)], "doc_id bigint, text string"
    )
    # a 3-node chain needs 2 propagation rounds + 1 no-change round;
    # max_iterations=1 cannot converge
    with pytest.raises(RuntimeError, match="did not converge"):
        duplicate_clusters(docs, max_iterations=1)


def test_all_docs_present(spark):
    docs = spark.createDataFrame(
        [(i, f"completely distinct text number {i} " * 10) for i in range(8)],
        "doc_id bigint, text string",
    )
    out = duplicate_clusters(docs).collect()
    assert len(out) == 8
    assert all(r.cluster_id == r.doc_id for r in out)  # no accidental merges


def test_cross_corpus_candidates_finds_only_cross_pairs(spark):
    """Cross-corpus MinHash (r10): planted near-duplicates ACROSS the
    corpus boundary are recovered; pairs WITHIN one corpus never
    appear even when that corpus contains its own duplicates."""
    from strake_spark.operators.dedup import cross_corpus_candidates

    base = " ".join(f"token{i}" for i in range(60))
    other = " ".join(f"word{i}" for i in range(60))
    new = spark.createDataFrame(
        [(1, base), (3, base.replace("token5", "five")),
         (5, "completely unrelated new document " * 5)],
        "doc_id bigint, text string",
    )
    # ref contains an internal duplicate pair (2, 4) AND cross matches
    ref = spark.createDataFrame(
        [(2, base), (4, base), (6, other), (8, other)],
        "doc_id bigint, text string",
    )
    out = {(r.new_id, r.ref_id) for r in cross_corpus_candidates(new, ref).collect()}
    # both near-identical new docs match both identical ref copies
    assert {(1, 2), (1, 4), (3, 2), (3, 4)} <= out
    # no within-ref pair (2,4)/(6,8) and no unrelated doc leaks in
    assert all(n in (1, 3) and r in (2, 4) for n, r in out)


def test_cross_corpus_hot_bucket_cap(spark):
    """A bucket hot across BOTH corpora is dropped before the join:
    boilerplate on both sides yields zero pairs under a small cap."""
    from strake_spark.operators.dedup import cross_corpus_candidates

    text = "the quick brown fox jumps over the lazy dog again and again"
    new = spark.createDataFrame(
        [(i, text) for i in range(1, 300, 2)], "doc_id bigint, text string"
    )
    ref = spark.createDataFrame(
        [(i, text) for i in range(0, 300, 2)], "doc_id bigint, text string"
    )
    capped = cross_corpus_candidates(new, ref, max_bucket_size=10)
    assert capped.count() == 0
    uncapped = cross_corpus_candidates(new, ref, max_bucket_size=1000)
    assert uncapped.count() == 150 * 150


def test_cross_corpus_empty_sides(spark):
    """Empty new or ref side yields an empty result, not an error —
    the first batch of a new crawl may legitimately be empty."""
    from strake_spark.operators.dedup import cross_corpus_candidates, cross_corpus_exact

    docs = spark.createDataFrame(
        [(1, "some document text here for the corpus")],
        "doc_id bigint, text string",
    )
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert cross_corpus_candidates(empty, docs).count() == 0
    assert cross_corpus_candidates(docs, empty).count() == 0
    assert cross_corpus_exact(empty, docs).count() == 0
    out = cross_corpus_exact(docs, empty).collect()
    assert len(out) == 1 and out[0].in_ref is False


class TestStarContraction:
    """connected_components_star (r18): the 10^9-edge upgrade path the
    duplicate_clusters docstring promises — property-pinned equal to a
    plain union-find ground truth on arbitrary random graphs."""

    def test_random_graphs_match_union_find(self, spark):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.operators.dedup import connected_components_star

        def union_find(n_nodes_edges):
            edges = n_nodes_edges
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            return {x: find(x) for x in parent}

        edge = st.tuples(st.integers(0, 30), st.integers(0, 30))

        @settings(max_examples=fuzz_examples(12), deadline=None)
        @given(edges=st.lists(edge, min_size=1, max_size=40))
        def run(edges):
            real = [(a, b) for a, b in edges if a != b]
            if not real:
                return
            sdf = spark.createDataFrame(real, "src long, dst long")
            got = {
                r["id"]: r["component"]
                for r in connected_components_star(sdf).collect()
            }
            want = union_find(real)
            assert got == want

        run()

    def test_matches_propagation_on_documents(self, spark):
        """Star contraction over the SAME SimHash edge graph yields the
        identical clustering that the oracled propagation entry
        produces (restricted to non-isolated docs)."""
        from pyspark.sql import functions as F

        from strake_spark.data import table
        from strake_spark.operators import dedup as D

        docs = table(spark, "/root/testdata/sf0.001", "documents")
        edges = D.simhash_near_pairs(docs)
        star = D.connected_components_star(
            edges.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        ).toPandas().set_index("id")["component"].to_dict()
        prop = (
            D.duplicate_clusters(docs)
            .toPandas()
            .set_index("doc_id")["cluster_id"]
            .to_dict()
        )
        spark.catalog.clearCache()
        assert star  # the synthetic corpus has near-dups
        for doc, comp in star.items():
            assert prop[doc] == comp

    def test_duplicate_clusters_star_equals_propagation(self, spark):
        """The full r19 operator (edges + star contraction + isolated
        union) is row-for-row identical to duplicate_clusters — every
        doc present, including isolated ones as their own clusters."""
        from strake_spark.data import table
        from strake_spark.operators import dedup as D

        docs = table(spark, "/root/testdata/sf0.001", "documents")
        star = (
            D.duplicate_clusters_star(docs)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        prop = (
            D.duplicate_clusters(docs)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        spark.catalog.clearCache()
        assert len(star) == docs.count()
        assert star.equals(prop)

    def test_chain_converges_in_log_rounds(self, spark):
        """A 64-node path graph (diameter 63) — propagation would need
        ~63 rounds; star contraction finishes well inside 12."""
        from strake_spark.operators.dedup import connected_components_star

        chain = [(i, i + 1) for i in range(63)]
        sdf = spark.createDataFrame(chain, "src long, dst long")
        got = connected_components_star(sdf, max_iterations=12).collect()
        assert all(r["component"] == 0 for r in got)
        assert len(got) == 64
