"""Unit tests for operators/importance.py beyond the oracled entries:
parameter modes (idf='log', min_df), validation, and the structural
guarantees (every doc weighted, weights ordered by target-likeness on
a planted corpus)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pyspark.sql import functions as F

from strake_spark.operators import importance as IMP


def _docs(spark):
    rows = [
        # target-ish docs share the "alpha beta" vocabulary
        (0, "alpha beta alpha", "en"),
        (1, "alpha beta gamma", "en"),
        (2, "beta alpha beta", "en"),
        # background-only vocabulary
        (3, "delta epsilon zeta", "de"),
        (4, "epsilon zeta delta", "de"),
        # mixed
        (5, "alpha delta", "fr"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string, lang string")


class TestDsirImportance:
    def test_every_doc_weighted_and_target_ranks_higher(self, spark):
        out = (
            IMP.dsir_importance(_docs(spark), target=F.col("lang") == "en")
            .toPandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert len(out) == 6
        assert (out.n_tokens > 0).all()
        # docs made of target vocabulary must outweigh background-only docs
        assert min(out.loc[i].weight for i in (0, 1, 2)) > max(
            out.loc[i].weight for i in (3, 4)
        )
        # weight is exactly (t_sum+1)/(b_sum+1)
        for i in out.index:
            assert out.loc[i].weight == (out.loc[i].t_sum + 1) / (out.loc[i].b_sum + 1)

    def test_n_buckets_validation(self, spark):
        with pytest.raises(ValueError, match="n_buckets"):
            IMP.dsir_importance(_docs(spark), target=F.lit(True), n_buckets=0)


class TestTfidfTopTerms:
    def test_linear_and_log_agree_on_ranking_here(self, spark):
        lin = IMP.tfidf_top_terms(_docs(spark)).toPandas().set_index("doc_id")
        log = (
            IMP.tfidf_top_terms(_docs(spark), idf="log")
            .toPandas()
            .set_index("doc_id")
        )
        assert lin.term.to_dict() == log.term.to_dict()
        # log mode scores are tf * ln(N/df)
        for i in log.index:
            r = log.loc[i]
            assert r.tfidf == pytest.approx(r.tf * math.log(6 / r.df))

    def test_min_df_filters_rare_terms(self, spark):
        # gamma appears in one doc; with min_df=2 it cannot be a top term
        out = IMP.tfidf_top_terms(_docs(spark), min_df=2).toPandas()
        assert "gamma" not in set(out.term)
        # doc 1 (whose most distinctive term was gamma) still gets a row
        assert 1 in set(out.doc_id)

    def test_idf_mode_validation(self, spark):
        with pytest.raises(ValueError, match="idf"):
            IMP.tfidf_top_terms(_docs(spark), idf="sqrt")

    def test_tie_breaks_lexicographically(self, spark):
        df = spark.createDataFrame(
            [(0, "zz aa"), (1, "aa zz")], "doc_id bigint, text string"
        )
        out = IMP.tfidf_top_terms(df).toPandas().set_index("doc_id")
        # both terms have tf=1, df=2 -> equal scores; 'aa' wins both docs
        assert out.loc[0].term == "aa" and out.loc[1].term == "aa"


class TestDsirNgrams:
    def test_bigram_features_count(self, spark):
        """ngrams=2 explodes unigrams + adjacent bigrams: a w-word doc
        contributes 2w-1 features."""
        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "solo")], "doc_id bigint, text string"
        )
        out = (
            IMP.dsir_importance(df, target=F.lit(True), ngrams=2)
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[0].n_tokens == 7  # 4 unigrams + 3 bigrams
        assert out.loc[1].n_tokens == 1  # single word, no bigram

    def test_bigrams_separate_word_order(self, spark):
        """'x y' and 'y x' share unigram profiles but not bigram ones —
        the reason the paper hashes n-grams. With a target of 'x y'
        docs, the same-order doc must outweigh the swapped doc."""
        rows = [(i, "x y", "t") for i in range(4)] + [
            (10, "x y", "q"),
            (11, "y x", "q"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
        out = (
            IMP.dsir_importance(
                df, target=F.col("lang") == "t", n_buckets=512, ngrams=2
            )
            .toPandas()
            .set_index("doc_id")
        )
        assert out.loc[10].weight > out.loc[11].weight

    def test_ngrams_validation(self, spark):
        with pytest.raises(ValueError, match="ngrams"):
            IMP.dsir_importance(_docs(spark), target=F.lit(True), ngrams=3)
