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
- Assignment is MAP-ONLY (r9): the k centroids ride a single-row
  broadcast as a struct array and each row folds over it with
  array_max(transform(...)) — no n*k cross-join row explosion and no
  groupBy-argmax shuffle. Struct ordering (score, -cid) reproduces the
  old max(struct(...)) tie-break exactly and is order-independent, so
  the DuckDB oracle still hash-matches. Because assignment is a map,
  it carries the vector through, and neither the centroid update nor
  the prune stage re-joins the source by id — the k-means inner loop
  is scan → map → one k*dim-cell aggregate per iteration, period.
  The broadcast is k*dim doubles — the same payload the previous
  cross-join broadcast shipped. At web scale (k ~ 50k, dim ~ 768)
  full-scan scoring is the bottleneck: pass assign_method='ann' to
  probe LSH cells over the centroid table instead (sign-bit buckets
  from fixed anchor vectors; rows score only centroids within
  ``probe_hamming`` of their own bucket, falling back to the full
  scan when the probe set is empty). The exact path stays the
  default and is what the oracle checks; the ANN path is pinned by a
  property test (probed == exact on planted hyperplane-safe
  clusters, tests/test_semdedup_ann.py).
- Pruning self-joins WITHIN clusters only. k should grow with corpus
  size (SemDeDup uses ~sqrt(n) clusters; 50k clusters at web scale)
  so per-cluster pair counts stay bounded; k is a parameter here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from strake_spark.operators.similarity import _dot

# exact, order-independent accumulator type for centroid sums:
# components are |x| < 1 floats; (18,9) summed over <=1e9 rows stays
# inside DuckDB's and Spark's 38-digit caps after widening.
_ACC = "decimal(18,9)"


def _carr_of(cents: DataFrame) -> DataFrame:
    """Per-cluster (cid, c) relation -> ONE broadcast row holding the
    centroid struct array (the form assignment consumes)."""
    return cents.agg(F.collect_list(F.struct("cid", "c")).alias("_cents"))


def _assign(e: DataFrame, carr: DataFrame) -> DataFrame:
    """(vec_id, v) x 1-row centroid array -> (vec_id, v, cluster):
    argmax_j dot(v, c_j)/|c_j| per row; ties -> smallest cluster id.

    Map-only: the centroids arrive as ONE broadcast row holding a
    struct array, and each row takes array_max over per-centroid
    (score, -cid) structs — lexicographic struct ordering is exactly
    the old groupBy max(struct(score, neg_cid)) tie-break, computed
    without the n*k row explosion or the argmax shuffle, and it is
    fold-order independent so the oracle hash is unchanged.
    """
    best = F.array_max(
        F.transform(
            F.col("_cents"),
            lambda x: F.struct(
                # HOF fold here on purpose: the unrolled dot inside the
                # iterated k-means lineage multiplies the analyzed plan
                # size per iteration (measured 5x slower); the fold
                # keeps the plan small and scoring is k*n, not n^2/k
                (_dot(F.col("v"), x["c"]) / F.sqrt(_dot(x["c"], x["c"]))).alias("score"),
                (-x["cid"]).alias("neg_cid"),
            ),
        )
    )
    return (
        e.crossJoin(F.broadcast(carr))
        .withColumn("_b", best)
        .select(*e.columns, (-F.col("_b.neg_cid")).alias("cluster"))
    )


def _with_cluster(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Assignment against a per-cluster (cid, c) relation."""
    return _assign(e, _carr_of(cents))


def _anchor_row(e: DataFrame, n_anchor_bits: int) -> DataFrame:
    """The ANN path's fixed hyperplane anchors: the ``n_anchor_bits``
    smallest ids' vectors as ONE broadcast row (same deterministic
    anchor convention as operators/similarity.lsh_topk). Fixed across
    k-means iterations so a cluster's bucket cannot wander."""
    return (
        e.orderBy("vec_id")
        .limit(n_anchor_bits)
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "v"))).alias("_as"))
        .select(F.transform("_as", lambda x: x["v"]).alias("_anchors"))
    )


def _bucket_expr(vcol, anchors):
    """Sign-bit LSH bucket of ``vcol`` against the anchor array: one
    bit per anchor (dot >= 0), folded MSB-first into a long."""
    return F.aggregate(
        anchors,
        F.lit(0).cast("long"),
        lambda acc, a: acc * 2 + F.when(_dot(vcol, a) >= 0, 1).otherwise(0),
    )


def _assign_ann(
    e: DataFrame, carr: DataFrame, anchors: DataFrame, probe_hamming: int
) -> DataFrame:
    """ANN-assisted assignment: rows score only the centroids whose
    sign-bit bucket is within ``probe_hamming`` of their own (empty
    probe set -> full scan, so every row still gets a cluster). Same
    (score, -cid) argmax and tie-break as the exact path; what changes
    is the candidate set, so per-row scoring cost drops from k dots to
    ~k/2^bits expected. Measured at sf0.1 (2,000x64 corpus, 2 warmups
    + 4-iter medians): k=8 exact 1.61 s vs ann 1.68 s (probe overhead
    ~= savings at trivial k), k=64 exact 3.40 s vs ann 2.39 s (-30%) —
    the gap widens with k, which is the web-scale regime this path
    exists for. The centroid broadcast itself is unchanged —
    when the k*dim payload outgrows a broadcast, the next rung is
    partitioning the centroid table by bucket and joining on the row
    bucket (same shape as similarity.lsh_topk's bucket join)."""
    carr_b = (
        carr.crossJoin(F.broadcast(anchors))
        .select(
            F.transform(
                "_cents",
                lambda x: F.struct(
                    x["cid"].alias("cid"),
                    x["c"].alias("c"),
                    _bucket_expr(x["c"], F.col("_anchors")).alias("b"),
                ),
            ).alias("_cents"),
            "_anchors",
        )
    )
    probed = F.filter(
        F.col("_cents"),
        lambda x: F.bit_count(x["b"].bitwiseXOR(F.col("_rb")))
        <= F.lit(probe_hamming),
    )
    cands = F.when(F.size(probed) > 0, probed).otherwise(F.col("_cents"))
    best = F.array_max(
        F.transform(
            cands,
            lambda x: F.struct(
                (_dot(F.col("v"), x["c"]) / F.sqrt(_dot(x["c"], x["c"]))).alias("score"),
                (-x["cid"]).alias("neg_cid"),
            ),
        )
    )
    return (
        e.crossJoin(F.broadcast(carr_b))
        .withColumn("_rb", _bucket_expr(F.col("v"), F.col("_anchors")))
        .withColumn("_b", best)
        .select(*e.columns, (-F.col("_b.neg_cid")).alias("cluster"))
    )


def _update_carr(assigned: DataFrame) -> DataFrame:
    """New centroids, emitted DIRECTLY as the 1-row broadcast array the
    next assignment consumes: per-(cluster, pos) DECIMAL-exact component
    means land in one single-row collect_list (r10 — fusing the old
    per-cluster collect_list reassembly shuffle into the broadcast-row
    aggregation drops a whole exchange per iteration), then reshape
    JVM-side. The reshape is slice-based O(k*dim): the flat array is
    struct-sorted by (cluster, pos), every cluster present carries all
    ``dim`` positions, so cluster i occupies slice [i*dim, (i+1)*dim) —
    a per-cluster filter() scan would be O(k^2*dim) on the single row
    and degrade at SemDeDup-scale k. ``assigned`` carries the vector
    (map-only assignment), so no join back to the source is needed."""
    comp = (
        assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.sum(F.col("val").cast(_ACC)).alias("s"), F.count(F.lit(1)).alias("cnt"))
    )
    flat_row = comp.select(
        F.struct(
            F.col("cluster"), F.col("pos"), (F.col("s").cast("double") / F.col("cnt")).alias("m")
        ).alias("e")
    ).agg(F.sort_array(F.collect_list("e")).alias("_flat"))
    cids = F.array_distinct(F.transform(F.col("_flat"), lambda x: x["cluster"]))
    dim = (F.size(F.col("_flat")) / F.size(cids)).cast("int")
    cents_arr = F.transform(
        cids,
        lambda cid, i: F.struct(
            cid.alias("cid"),
            F.transform(F.slice(F.col("_flat"), i * dim + 1, dim), lambda y: y["m"]).alias("c"),
        ),
    )
    return flat_row.select(cents_arr.alias("_cents"))


def _normalized(
    emb: DataFrame, id_col: str, vec_col: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        *(F.col(c) for c in carry_cols),
    )


def _kmeans(e: DataFrame, k: int, iters: int, assign=None) -> DataFrame:
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if k < 1:
        raise ValueError("k must be >= 1")
    if assign is None:
        assign = _assign
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
    carr = _carr_of(cents)
    assigned = None
    for i in range(iters):
        assigned = assign(e, carr)
        if i < iters - 1:
            carr = _update_carr(assigned)
    return assigned


# Measured assign-method crossover at sf0.1 (2,000x64 corpus, 2
# warmups + 4-iter medians, r16/r17 series): k=8 exact 1.61 s vs ann
# 1.68 s (+4%, probe overhead >= savings), k=16 1.606 vs 1.486 (-7.5%),
# k=32 1.92 vs 1.548 (-19.4%), k=64 3.40 vs 2.39 (-30%). The ann win
# starts at k=16 and widens with k, so 'auto' switches there.
AUTO_ANN_MIN_K = 16


def _make_assign(e: DataFrame, assign_method: str, n_anchor_bits: int,
                 probe_hamming: int, k: int | None = None):
    """Resolve the assignment engine for the public entry points.

    ``'auto'`` (r17, VERDICT task 6) picks 'ann' when ``k >=
    AUTO_ANN_MIN_K`` (the measured crossover above) and 'exact' below
    it — callers always know k, so the choice is deterministic and
    documented by measurement, not vibes."""
    if assign_method == "auto":
        if k is None:
            raise ValueError("assign_method='auto' requires k")
        assign_method = "ann" if k >= AUTO_ANN_MIN_K else "exact"
    if assign_method == "exact":
        return _assign
    if assign_method == "ann":
        if n_anchor_bits < 1:
            raise ValueError("n_anchor_bits must be >= 1")
        anchors = _anchor_row(e, n_anchor_bits)
        return lambda ee, carr: _assign_ann(ee, carr, anchors, probe_hamming)
    raise ValueError(f"unknown assign_method {assign_method!r} (exact|ann|auto)")


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
    assign_method: str = "exact",
    n_anchor_bits: int = 3,
    probe_hamming: int = 0,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic fixed-iteration cosine k-means: (vec_id, cluster).

    ``carry_cols`` rides extra source columns through the MAP-ONLY
    assignment (r19 optimization round): a consumer that needs e.g. the
    label next to the cluster gets it for free instead of re-scanning
    the source and joining back on vec_id — assignment is a map, so the
    passthrough costs zero extra shuffle at any scale.

    ``iters`` counts assignment passes; centroids update between
    passes. Init centroids are the ``k`` smallest ids' vectors.

    ``assign_method='ann'`` probes sign-bit LSH cells over the centroid
    table instead of scoring all k centroids per row (web-scale k; see
    _assign_ann); ``'auto'`` picks ann at k >= AUTO_ANN_MIN_K (the
    measured crossover) and exact below. 'exact' stays the default and
    the oracle's subject.

    ``persist`` caches the normalized embedding relation
    (MEMORY_AND_DISK) — assignment is map-only but each iteration's
    centroid update re-reads it (plus the init scan), so without the
    cache the source is read iters+1 times. Disable for corpora larger
    than cluster storage. The cache is RELEASED before returning (r8
    advice: operator persists must not accumulate in a long-lived
    engine): the (id, cluster) result is checkpointed — it is k-means'
    natural output materialization, two narrow columns — and the
    source cache unpinned immediately."""
    # Reserved-name guard (r20, ADVICE item 2): a carried column named
    # like an output or internal working column would silently produce
    # duplicate/ambiguous columns instead of a clear error.
    _reserved = {"vec_id", "cluster", "v", "_b", "_cents", "_anchors", "_rb"}
    bad = [c for c in carry_cols if c in _reserved]
    if bad:
        raise ValueError(
            f"kmeans_assign: carry_cols {bad} collide with reserved "
            f"output/internal column names {sorted(_reserved)}"
        )
    e = _normalized(emb, id_col, vec_col, carry_cols)
    out_cols = ["vec_id", "cluster", *carry_cols]
    assign = _make_assign(e, assign_method, n_anchor_bits, probe_hamming, k=k)
    if not persist:
        return _kmeans(e, k, iters, assign).select(*out_cols)
    from pyspark import StorageLevel

    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    out = _kmeans(e, k, iters, assign).select(*out_cols).localCheckpoint()
    e.unpersist(blocking=False)
    return out


def semantic_prune(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau: float = 0.32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    persist: bool = True,
    chunk_cells: int = 4_000_000,
    assign_method: str = "exact",
    n_anchor_bits: int = 3,
    probe_hamming: int = 0,
) -> DataFrame:
    """SemDeDup keep-list: drop any row whose cosine to ANY lower-id
    member of its own cluster (kept or itself dropped) reaches ``tau``.
    One-pass rule — deliberately a SUPERSET of greedy keep-first
    pruning: in a similarity chain a<b<c with cos(a,b)>=tau and
    cos(b,c)>=tau but cos(a,c)<tau, greedy would re-admit c after
    dropping b; this rule drops both (transitive-neighborhood
    semantics, no iteration). The cluster's smallest id always
    survives. Returns (vec_id, cluster) for survivors.

    Pairwise engine (r9): ``groupBy(cluster).applyInPandas`` — the
    per-cluster pairwise is the algorithm's own O(n^2/k) kernel, and a
    DataFrame self-join materializes both vectors per PAIR (n^2/k * dim
    cells through the join), where the Arrow path ships each cluster's
    members ONCE (n * dim cells) and forms pairs inside numpy. The
    cosine matrix accumulates with an ascending-index loop
    (``acc += A[:, i] * B[:, i]``), which performs each pair's adds in
    exactly the sequential order of the SQL HOF fold and DuckDB's
    ``list_dot_product`` — bit-identical doubles, so the oracle still
    hash-matches; NaN cosines (zero vectors) count as >= tau, matching
    Spark/DuckDB NaN-greatest comparison semantics.

    Memory bounds — what IS and is NOT capped: the PAIR matrix is
    processed in chunks of ~``chunk_cells`` cells (~8 bytes each), so
    pairwise work costs O(chunk) regardless of cluster size. The MEMBER
    matrix is not chunked: each task holds its whole cluster's vectors
    (cluster_size * dim * 8 bytes — np.stack before pairing), so a
    skewed k-means assignment that funnels the corpus into one hot
    cluster concentrates that cluster's members in one executor (e.g.
    1M rows x 768 dims ~ 6 GiB). That is the algorithm's granularity —
    every member must meet every lower-id member — and the knob that
    bounds it is ``k``: SemDeDup's own sizing (k ~ sqrt(n)) keeps
    expected cluster size at sqrt(n), and a near-constant corpus that
    degenerates k-means into one cluster should be exact-deduped first
    (the same stance as dedup.minhash_candidates' hot-bucket cap).
    Parallelism is k tasks — the paper's scaling argument makes that
    the right width at scale.

    Materialization discipline (``persist=True``): the source is read
    ONCE into a MEMORY_AND_DISK cache; k-means iterations read the
    cache; the (id, cluster, vector) relation is checkpointed once and
    the cache is released as soon as the checkpoint exists. Disable
    for corpora larger than cluster storage.

    Bench anatomy (r10, sf0.1): ~1.2 s of the ~1.6 s per-call median is
    the eager k-means+checkpoint chain (sequential job barriers: init
    top-k, one update shuffle per extra iteration, final assignment
    materialization — plus per-call plan analysis of the iterated
    lineage), ~0.35 s is the grouped prune. The barrier chain is the
    algorithm's own data dependency (iteration i+1 needs iteration i's
    centroids), so the small-SF floor is stage latency, not data."""
    import numpy as np
    import pandas as pd

    e = _normalized(emb, id_col, vec_col)
    assign = _make_assign(e, assign_method, n_anchor_bits, probe_hamming, k=k)
    if persist:
        from pyspark import StorageLevel

        e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE checkpoint: av (id, cluster, vector) is the single
    # materialization of k-means; the grouped pairwise is its only
    # consumer, and it emits survivors directly (no drop-list, no
    # anti-join). Map-only assignment already carries the vector, so
    # no join back to the source is needed.
    av = _kmeans(e, k, iters, assign).select("vec_id", "cluster", "v").localCheckpoint()
    if persist:
        e.unpersist(blocking=False)  # av holds everything downstream needs
    tau_ = float(tau)
    cells = max(1, int(chunk_cells))

    def _prune_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        n_c = len(pdf)
        if n_c < 2:
            return pdf[["vec_id", "cluster"]]
        m = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
        d = m.shape[1]
        # norms with the same sequential accumulation as sqrt(fold)
        acc_n = np.zeros(n_c)
        for i in range(d):
            acc_n += m[:, i] * m[:, i]
        norms = np.sqrt(acc_n)
        dropped = np.zeros(n_c, dtype=bool)
        rows_per_chunk = max(1, cells // n_c)
        idx = np.arange(n_c)
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, n_c, rows_per_chunk):
                t = min(n_c, s + rows_per_chunk)
                a = m[s:t]
                acc = np.zeros((t - s, n_c))
                for i in range(d):
                    acc += a[:, i : i + 1] * m[:, i]
                cos = acc / np.outer(norms[s:t], norms)
                hit = (cos >= tau_) | np.isnan(cos)
                # pair (a, b) counts only when a's id < b's id (rows
                # are id-sorted, so row order == id order)
                hit &= idx[s:t, None] < idx[None, :]
                dropped |= hit.any(axis=0)
        return pdf.loc[~dropped, ["vec_id", "cluster"]]

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in av.schema if f.name != "v"
    )
    return av.groupBy("cluster").applyInPandas(_prune_cluster, schema=out_schema)
