"""BM25 full-text ranking over the documents table.

Okapi BM25 (Robertson & Walker 1994 — the standard lexical ranking
function, what Lucene/Elasticsearch score with):

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_part  = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    score(d) = sum_t idf(t) * tf_part(t, d)

Distributed shape (100 TB stance): tokens explode map-side, then are
IMMEDIATELY filtered to the query's term set — only matching tokens
ever shuffle, so per-query cost scales with posting-list size, not
corpus size. Corpus stats (N, avgdl) are one tiny aggregate broadcast
back; document length comes from the same tokenization pass.

Engine-exactness: every input to the float math is an exact integer
(tf, df, N, sum of lengths), divisions/log are IEEE-identical given
identical inputs (ln bit-equality Spark-vs-DuckDB verified in
tests/test_inventory.py via the registered entry at all SFs), and the
per-document score sums per-TERM columns in a FIXED expression order
(conditional aggregation, not a row-order-dependent SUM) so the total
is bit-stable under any partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from strake_spark.operators.hashing import normalize_text


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 for ``query_terms``: one column ``s_<term>``
    per term plus the fixed-order total ``bm25``. Documents matching no
    term are omitted."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("term"),
    )
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("sum_dl").cast("double") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5))
            ),
        )
        .withColumn(
            "score",
            F.col("idf")
            * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.col("avgdl"))
            ),
        )
    )
    per_term = [
        F.max(F.when(F.col("term") == t, F.col("score"))).alias(f"s_{t}") for t in terms
    ]
    out = scored.groupBy(id_col).agg(*per_term)
    total = None
    for t in terms:
        piece = F.coalesce(F.col(f"s_{t}"), F.lit(0.0))
        total = piece if total is None else total + piece
    return out.withColumn("bm25", total)
