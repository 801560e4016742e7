"""Test-set decontamination + sequence packing — training-data hygiene
operators beyond the reference's surface (it has no pipeline verbs;
SURVEY §6 marks the LLM-pipeline family as deliberate additions).

Decontamination is the standard n-gram overlap check every serious
training pipeline runs before training: a training document that shares
any n-word-gram (n=8 here, a common contamination window) with an
evaluation/benchmark document is flagged and dropped, otherwise eval
scores measure memorization. Scale shape: both sides tokenize once,
emit md5 digests of their n-grams (the 16-byte digest shuffles, never
the gram text), and meet in a LEFT SEMI join against the distinct eval
gram set — no text comparison, no cross join, and the eval side (always
the small side: benchmarks are thousands of docs, corpora billions) can
be broadcast by AQE.

Sequence packing previews training-batch construction: documents in a
deterministic order are greedily packed into fixed token budgets
(floor(running_tokens / budget) — the prefix-sum formulation makes it a
single window pass, no driver loop), and the per-pack stats (doc count,
token fill) tell you the padding waste a context window will see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from strake_spark.operators.hashing import normalize_text


def ngram_hashes(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """(id, gram_h) — md5 of every n-word-gram of the normalized text.
    Documents shorter than n tokens emit nothing (they cannot carry a
    full contamination window).

    Formulation matters here: building grams with a higher-order
    ``transform`` lambda runs INTERPRETED (Catalyst does not codegen
    lambda bodies) and measured 24x slower. Instead: tokenize once,
    explode the gram-start index, and assemble each gram with
    ``element_at`` — every expression is codegen'd, the whole operator
    is one WholeStageCodegen span over the scan, and nothing shuffles."""
    toks = F.split(normalize_text(F.col(text_col)), " ")
    t = docs.select(F.col(id_col), toks.alias("toks"))
    starts = F.when(
        F.size("toks") >= n, F.sequence(F.lit(1), F.size("toks") - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    idx = t.select(F.col(id_col), "toks", F.explode(starts).alias("i"))
    gram = F.concat_ws(
        " ", *[F.element_at("toks", F.col("i") + k) for k in range(n)]
    )
    return idx.select(F.col(id_col), F.md5(gram).alias("gram_h"))


def contaminated_ids(
    train: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Distinct train ids sharing >=1 n-gram with any eval doc. The
    eval gram set is the join's build side — broadcastable whenever the
    benchmark suite is benchmark-sized. No distinct() on it (r9): a
    LEFT SEMI join is unaffected by duplicate build-side keys, so
    deduplicating first only added a full shuffle of the gram hashes
    (the broadcast hash build deduplicates for free)."""
    train_grams = ngram_hashes(train, id_col, text_col, n)
    eval_grams = ngram_hashes(eval_docs, id_col, text_col, n).select("gram_h")
    return (
        train_grams.join(eval_grams, "gram_h", "left_semi")
        .select(id_col)
        .distinct()
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget: int = 4096,
    num_partitions: int | None = None,
    persist: bool = True,
) -> DataFrame:
    """Greedy prefix-sum packing: docs ordered by id accumulate
    whitespace-token counts; pack_id = floor((running - own)/budget).
    Returns per-pack (pack_id, n_docs, total_tokens).

    The global prefix sum is TWO-LEVEL, not one unpartitioned window
    (which funnels the whole corpus through a single task — the classic
    WindowExec scale-killer): bucket ids into P contiguous value ranges
    (bucket computed from the id value itself, so both passes agree —
    range-partitioner sampling would not be re-execution-stable), run
    the running sum WITHIN each bucket, then add per-bucket offsets.
    The offsets come from a P-row aggregate collected on the driver
    (P = partitions, a few thousand at 100 TB — centroid-sized, like
    IVF training) and rejoined via broadcast. Every heavy stage stays
    distributed.

    ``persist`` caches the compact (id, n_tok, part) relation — TWO
    consumers read it (the per-bucket offsets aggregate and the final
    windowed pass); unpersisted, each consumer rescans the corpus and
    re-tokenizes it, doubling the operator's only heavy stage (r19;
    same dual-consumption discipline as dsir/tfidf/bm25, same lifetime
    contract: clearCache() between batches or persist=False)."""
    n_tok = F.size(F.split(normalize_text(F.col(text_col)), " ")).cast("long")
    t = docs.select(F.col(id_col).alias("id"), n_tok.alias("n_tok"))
    P = num_partitions or t.sparkSession.sparkContext.defaultParallelism
    # Derive the range bucket from the id VALUE, not repartitionByRange:
    # the bucket must be identical in the offsets pass and the final
    # pass, and range-partitioner sampling is not re-execution-stable.
    # (min/max of id only — column pruning drops the tokenize here.)
    lo, hi = docs.agg(
        F.min(F.col(id_col)), F.max(F.col(id_col))
    ).first()
    if lo is None:
        return t.select(
            F.lit(0).cast("bigint").alias("pack_id"),
            F.lit(0).cast("bigint").alias("n_docs"),
            F.lit(0).cast("bigint").alias("total_tokens"),
        ).limit(0)
    width = max(1, (int(hi) - int(lo) + P) // P)
    t = t.withColumn("part", F.floor((F.col("id") - lo) / width).cast("int"))
    if persist:
        from pyspark import StorageLevel

        t = t.persist(StorageLevel.MEMORY_AND_DISK)

    within = W.partitionBy("part").orderBy("id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )

    # P rows: total tokens per partition -> exclusive prefix offsets.
    # Driver-side cumsum over P values, then broadcast back. This
    # collect materializes the persisted compact relation, so the
    # final pass below reads the cache instead of re-tokenizing.
    totals = sorted(
        (r["part"], r["total"])
        for r in t.groupBy("part").agg(F.sum("n_tok").alias("total")).collect()
    )
    t = t.withColumn("running_local", F.sum("n_tok").over(within))
    offsets, acc = [], 0
    for part, total in totals:
        offsets.append((part, acc))
        acc += total
    spark = t.sparkSession
    off = F.broadcast(
        spark.createDataFrame(offsets, "part int, offset long")
    )
    t = t.join(off, "part")
    running = F.col("running_local") + F.col("offset")
    pack = F.floor((running - F.col("n_tok")) / budget)
    return (
        t.select(pack.alias("pack_id"), "n_tok")
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )
