"""Property tests for the r14 Arrow ANN kernels (operators/similarity):
cosine_topk must equal a pure-Python float reference on arbitrary
random corpora (not just the fixed testdata the oracles pin), and
lsh_topk's candidate sets must stay within its probe-bucket contract
while preserving exact cosines for the pairs it does score."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from strake_spark.operators import similarity as S
from tests.conftest import fuzz_examples

DIM = 4


def _corpora():
    vec = st.lists(
        st.floats(
            min_value=-8.0, max_value=8.0, allow_nan=False, allow_infinity=False,
            width=32,
        ),
        min_size=DIM, max_size=DIM,
    ).filter(lambda v: any(abs(x) > 1e-3 for x in v))  # non-degenerate norm
    return st.lists(vec, min_size=3, max_size=12)


def _py_cosine(q: list[float], c: list[float]) -> float:
    """The engines' exact arithmetic: left-to-right fold of per-element
    double products, norms the same way, then dot / (qn * cn)."""
    dot = 0.0
    qn2 = 0.0
    cn2 = 0.0
    for x, y in zip(q, c):
        dot += float(x) * float(y)
        qn2 += float(x) * float(x)
        cn2 += float(y) * float(y)
    return dot / (math.sqrt(qn2) * math.sqrt(cn2))


def _py_topk(vecs: list[list[float]], k: int, n_queries: int):
    out = set()
    for qi, q in enumerate(vecs[:n_queries]):
        scored = [
            (ci, _py_cosine(q, c)) for ci, c in enumerate(vecs) if ci != qi
        ]
        # rank by cosine desc, neighbor id asc — the window's total order
        scored.sort(key=lambda t: (-t[1], t[0]))
        for rank, (ci, cos) in enumerate(scored[:k], start=1):
            out.add((qi, ci, cos, rank))
    return out


class TestCosineTopkProperty:
    @settings(max_examples=fuzz_examples(12), deadline=None)
    @given(_corpora())
    def test_matches_pure_python_reference(self, spark, vecs):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>",
        )
        k, n_q = 3, 2
        got = {
            (r.query_id, r.nbr_id, r.cosine, r.rank)
            for r in S.cosine_topk(df, k=k, n_queries=n_q).collect()
        }
        # the reference must use the same float32-quantized inputs the
        # engine reads back from the array<float> column
        stored = [
            [float(x) for x in r.embedding]
            for r in df.orderBy("vec_id").collect()
        ]
        assert got == _py_topk(stored, k, n_q)


class TestLshTopkProperty:
    @settings(max_examples=fuzz_examples(10), deadline=None)
    @given(_corpora())
    def test_candidates_respect_probe_contract_and_exact_cosines(self, spark, vecs):
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id bigint, embedding array<float>",
        )
        bits, n_q, k = 2, 2, 3
        rows = S.lsh_topk(df, k=k, n_queries=n_q, n_anchor_bits=bits).collect()
        stored = [
            [float(x) for x in r.embedding] for r in df.orderBy("vec_id").collect()
        ]

        def bucket(v):
            b = 0
            for bit in range(bits):
                if sum(float(x) * float(a) for x, a in zip(v, stored[bit])) > 0:
                    b |= 1 << bit
            return b

        for r in rows:
            assert r.query_id != r.nbr_id
            # candidate must be in the query's bucket or one bit away
            qb, nb = bucket(stored[r.query_id]), bucket(stored[r.nbr_id])
            assert bin(qb ^ nb).count("1") <= 1, (qb, nb)
            # and its cosine must be the exact (bit-identical) pairwise
            # value — the ascending-index kernel reproduces the
            # sequential fold
            assert r.cosine == _py_cosine(stored[r.query_id], stored[r.nbr_id])


class TestKernelQueryChunking:
    """r15 (r14 advice #1): the kernels score in bounded query slices
    (_KERNEL_QUERY_CHUNK) so per-task memory is chunk x batch doubles
    regardless of n_queries. Chunking slices the query axis only — the
    per-element ascending-index accumulation is unchanged, so results
    must be BIT-identical at any chunk size (the hash oracles depend on
    it)."""

    def _emb(self, spark):
        from strake_spark.data import table
        from tests.conftest import SF_DIR

        return table(spark, SF_DIR, "embeddings")

    def test_chunked_equals_unchunked_bitwise(self, spark, monkeypatch):
        emb = self._emb(spark)
        base = {
            "cosine": sorted(map(tuple, S.cosine_topk(emb, k=3, n_queries=20).collect())),
            "lsh": sorted(map(tuple, S.lsh_topk(emb, k=3, n_queries=20).collect())),
        }
        monkeypatch.setattr(S, "_KERNEL_QUERY_CHUNK", 3)
        assert sorted(map(tuple, S.cosine_topk(emb, k=3, n_queries=20).collect())) == base["cosine"]
        assert sorted(map(tuple, S.lsh_topk(emb, k=3, n_queries=20).collect())) == base["lsh"]


class TestAnnNullContract:
    """r15 (r14 advice #2): all four ANN kernel paths share the null
    contract — a null embedding is dropped before any numpy conversion
    or MLlib training, never a task-killing exception."""

    def _with_null(self, spark):
        import math

        rows = [
            (i, [math.sin(0.7 * (i + 1) * (j + 1)) for j in range(8)])
            for i in range(24)
        ]
        rows.append((24, None))
        return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    @pytest.mark.slow
    def test_null_vectors_dropped_not_fatal(self, spark):
        # slow (r20): trains IVF/PQ/IVFPQ models five ways (~130 s);
        # the null-drop contract itself is exercised on every default
        # run by the cosine/lsh legs of the property campaigns above
        # and by the inventory entries (null-free data, same operators)
        # — the model-training legs run in the FULL_SUITE record.
        emb = self._with_null(spark)
        for fn in (
            lambda e: S.cosine_topk(e, k=3, n_queries=4),
            lambda e: S.lsh_topk(e, k=3, n_queries=4),
            lambda e: S.ivf_topk(e, k=3, n_queries=4, n_clusters=4),
            lambda e: S.pq_topk(e, k=3, n_queries=4, m=2, n_codes=4, refine=20),
            lambda e: S.ivfpq_topk(e, k=3, n_queries=4, n_clusters=4, m=2,
                                   n_codes=4, refine=20),
        ):
            rows = fn(emb).collect()
            assert rows, "null row must not empty the result"
            assert all(r.nbr_id != 24 for r in rows)


class TestLshAnchorBitsGuard:
    def test_zero_anchor_bits_rejected(self, spark):
        """r15 (r14 advice #4): n_anchor_bits=0 used to silently return
        an empty frame where the old SQL path degenerated to exact
        all-pairs — now a loud ValueError (use cosine_topk for exact)."""
        import pytest

        from strake_spark.data import table
        from tests.conftest import SF_DIR

        emb = table(spark, SF_DIR, "embeddings")
        with pytest.raises(ValueError, match="n_anchor_bits"):
            S.lsh_topk(emb, n_anchor_bits=0)

    def test_empty_corpus_still_returns_typed_empty(self, spark):
        empty = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
        out = S.lsh_topk(empty, k=3, n_queries=5, n_anchor_bits=2)
        assert out.count() == 0
        assert dict(out.dtypes) == {
            "query_id": "bigint", "nbr_id": "bigint",
            "cosine": "double", "rank": "int",
        }
