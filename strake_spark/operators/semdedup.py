"""SemDeDup-style semantic deduplication over an embedding column.

Published technique (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
corpus embeddings with k-means, then prune near-duplicate pairs WITHIN
each cluster only — pairwise work drops from O(n^2) to O(n^2 / k) while
catching semantically-redundant documents that exact/minhash dedup
misses. The reference engine has no semantic-dedup operator (its dedup
surface is hash-based); this extends the repo's training-data pipeline
family alongside operators/dedup.py and operators/similarity.py.

Engine-exactness design (what makes this ORACLE-able when the generic
IVF k-means is rows-only):

- Fixed iteration count + deterministic init (centroids = the k
  smallest ids' vectors) — no RNG, no convergence loop.
- Assignment scores are double dot-products accumulated left-to-right
  (zip_with/aggregate fold == DuckDB list_dot_product), so per-row
  argmax agrees bit-for-bit across engines.
- Centroid updates sum components in DECIMAL(18,9) — exact and
  order-independent — so a distributed Spark sum and the
  single-threaded oracle produce identical doubles after the final
  cast-and-divide. This is the same decimal discipline the TPC-H
  entries use for money columns (inventory/_util.py), applied to
  vector components.

Scale shape (100 TB stance):

- Each k-means iteration is one scan + one (cluster, pos) aggregate of
  k*dim cells — map-side partial, no window, no driver collect; the
  centroid table (k rows) broadcasts back.
- Assignment is a broadcast cross-join against k centroids with a
  groupBy-argmax (struct max), not a window — partial aggregation
  applies.
- Pruning self-joins WITHIN clusters only. k should grow with corpus
  size (SemDeDup uses ~sqrt(n) clusters; 50k clusters at web scale)
  so per-cluster pair counts stay bounded; k is a parameter here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from strake_spark.operators.similarity import _dot, _norm2

# exact, order-independent accumulator type for centroid sums:
# components are |x| < 1 floats; (18,9) summed over <=1e9 rows stays
# inside DuckDB's and Spark's 38-digit caps after widening.
_ACC = "decimal(18,9)"


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """argmax_j dot(v, c_j)/|c_j| per row; ties -> smallest cluster id.

    groupBy struct-max instead of a window: partial (map-side)
    aggregation applies, and no per-key sort materializes.
    """
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        F.col("cid"),
        (_dot(F.col("v"), F.col("c")) / F.sqrt(_norm2(F.col("c")))).alias("score"),
    )
    # max of (score, -cid) == highest score, then lowest cluster id
    best = (
        scored.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("score"), (-F.col("cid")).alias("neg_cid"))).alias("b"))
        .select("vec_id", (-F.col("b.neg_cid")).alias("cluster"))
    )
    return best


def _update(e: DataFrame, assign: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, pos) DECIMAL-exact component mean,
    reassembled into ordered arrays JVM-side (sort_array over structs)."""
    comp = (
        assign.join(e, "vec_id")
        .select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum(F.col("val").cast(_ACC)).alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    return (
        comp.select(
            "cluster",
            F.struct("pos", (F.col("s").cast("double") / F.col("cnt")).alias("m")).alias("pm"),
        )
        .groupBy("cluster")
        .agg(F.transform(F.sort_array(F.collect_list("pm")), lambda x: x.m).alias("c"))
        .select(F.col("cluster").alias("cid"), "c")
    )


def _normalized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )


def _kmeans(e: DataFrame, k: int, iters: int) -> DataFrame:
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    # Init: the ACTUAL k smallest ids' vectors (TakeOrdered, O(k) to
    # the driver plan, no full sort). filter(vec_id < k) would be
    # equivalent only for dense 0-based integer ids — with offset or
    # sparse ids it silently shrinks (or empties) the centroid set,
    # and an empty centroid set would make semantic_prune return an
    # empty keep-list for the whole corpus. With orderBy+limit the
    # centroid set is empty only when the corpus itself is empty.
    cents = e.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    assign = None
    for i in range(iters):
        assign = _assign(e, cents)
        if i < iters - 1:
            cents = _update(e, assign)
    return assign


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> DataFrame:
    """Deterministic fixed-iteration cosine k-means: (vec_id, cluster).

    ``iters`` counts assignment passes; centroids update between
    passes. Init centroids are the ``k`` smallest ids' vectors.

    ``persist`` caches the normalized embedding relation
    (MEMORY_AND_DISK) — each iteration scans it for assignment AND
    centroid update, so without the cache the source is re-read
    2*iters times. Disable for corpora larger than cluster storage."""
    e = _normalized(emb, id_col, vec_col)
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    return _kmeans(e, k, iters)


def semantic_prune(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
) -> DataFrame:
    """SemDeDup keep-list: drop any row whose cosine to ANY lower-id
    member of its own cluster (kept or itself dropped) reaches ``tau``.
    One-pass rule — deliberately a SUPERSET of greedy keep-first
    pruning: in a similarity chain a<b<c with cos(a,b)>=tau and
    cos(b,c)>=tau but cos(a,c)<tau, greedy would re-admit c after
    dropping b; this rule drops both (transitive-neighborhood
    semantics, single self-join, no iteration). The cluster's smallest
    id always survives. Returns (vec_id, cluster) for survivors.

    Materialization discipline (``persist=True``): the source is read
    ONCE into a MEMORY_AND_DISK cache; k-means iterations read the
    cache; the (id, cluster, vector) relation is checkpointed once and
    feeds both self-join sides; the cache is released as soon as the
    checkpoint exists. Peak footprint ~2x the normalized corpus
    (spillable); without it the source is re-scanned ~2*iters+3 times.
    Disable for corpora larger than cluster storage."""
    e = _normalized(emb, id_col, vec_col)
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE checkpoint: av (id, cluster, vector) feeds every downstream
    # lineage — both self-join sides AND the final anti-join (which
    # takes cluster from av, not from a separate assignment
    # materialization) — so k-means executes exactly once, directly
    # into the av build
    assign = _kmeans(e, k, iters)
    av = assign.join(e, "vec_id").select("vec_id", "cluster", "v").localCheckpoint()
    if persist:
        e.unpersist(blocking=False)  # av holds everything downstream needs
    # Within-cluster pairwise with BLOCK SALTING: keying the self-join
    # on cluster alone caps parallelism at k tasks (each cluster's full
    # pairwise lands in ONE task — the skew story when k is small or a
    # cluster is hot). Pair (a, b) is assigned to block a % B: the left
    # side carries one copy in its own block, the right side replicates
    # B times, and the join keys on (cluster, blk) — every pair still
    # meets exactly once, spread over k*B tasks. B derives from session
    # parallelism; at web scale k ~ sqrt(n) already gives parallelism,
    # and B degrades to a small constant.
    B = max(1, min(16, -(-av.sparkSession.sparkContext.defaultParallelism // k)))
    left = av.select(
        F.col("cluster"),
        F.pmod(F.col("vec_id"), F.lit(B)).cast("int").alias("blk"),
        F.col("vec_id").alias("a"),
        F.col("v").alias("va"),
        F.sqrt(_norm2(F.col("v"))).alias("na"),
    )
    right = av.crossJoin(
        F.broadcast(av.sparkSession.range(B).select(F.col("id").cast("int").alias("blk")))
    ).select(
        F.col("cluster"),
        F.col("blk"),
        F.col("vec_id").alias("b"),
        F.col("v").alias("vb"),
        F.sqrt(_norm2(F.col("v"))).alias("nb"),
    )
    dropped = (
        left.join(right, ["cluster", "blk"])
        .filter(F.col("a") < F.col("b"))
        .filter(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")) >= tau)
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return (
        av.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left_anti")
        .select("vec_id", "cluster")
    )
