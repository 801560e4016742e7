"""Similarity-search inventory: exact brute-force cosine top-k (the
baseline), LSH-bucketed ANN, and embedding near-dup pairs, each checked
against a DuckDB oracle computing the same double arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators import similarity as S

# DuckDB-side cosine: explicit dot/norm built from list_dot_product on
# DOUBLE[] casts — sequential accumulation, matching Spark's left-fold.
_COS = (
    "list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))"
)


@query(
    "ann_cosine_topk_bruteforce",
    oracle=f"""
    WITH scored AS (
        SELECT b.vec_id AS query_id, a.vec_id AS nbr_id, {_COS} AS cosine
        FROM embeddings a, embeddings b
        WHERE b.vec_id < 20 AND a.vec_id <> b.vec_id
    ),
    ranked AS (
        SELECT query_id, nbr_id, cosine,
               ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, nbr_id) AS rank
        FROM scored
    )
    SELECT query_id, nbr_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    notes="exact top-5 for 20 query vectors; JVM-side zip_with/aggregate dot products",
)
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.cosine_topk(table(spark, sf_dir, "embeddings"), k=5, n_queries=20)


@query(
    "ann_embedding_dup_pairs",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS} AS cosine
    FROM embeddings a, embeddings b
    WHERE a.vec_id < b.vec_id AND {_COS} >= 0.4
    """,
    notes=(
        "embedding-cosine near-duplicate pairs via banded LSH; threshold 0.4 "
        "sits below the synthetic corpus's max pairwise cosine (~0.48 sf0.001, "
        "~0.51 sf0.01) so the entry returns rows (59-66), and num_bands=24 "
        "gives measured-full recall vs the exact all-pairs oracle at both SFs "
        "(deterministic: seeded hyperplanes)"
    ),
)
def ann_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.embedding_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.4, num_bands=24
    )


@query(
    "ann_lsh_bucketed_topk",
    tags=("rows_only",),
    notes="LSH-bucketed ANN: driver records rows-only (anchor collection makes a single-statement oracle impractical); recall vs exact baseline asserted in tests/test_ann_recall.py",
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.lsh_topk(table(spark, sf_dir, "embeddings"), k=3, n_queries=20)


@query(
    "ann_ivf_topk",
    tags=("rows_only",),
    notes="IVF ANN: KMeans cells + n_probe nearest-cell scan (iterative training is not SQL-expressible -> rows-only); recall vs exact baseline asserted in tests",
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return S.ivf_topk(table(spark, sf_dir, "embeddings"), k=3, n_queries=20)
