"""Embedding similarity search (ANN) over an array<float> column.

Execution shape (r14 kernels): every scoring path — cosine_topk (exact
baseline), lsh_topk (sign-bit bucketed), ivf_topk (cell-probed), and
pq_topk's encode — runs as ONE map-only Arrow pass over the partitioned
corpus: the bounded query block (``id < n_queries``) is collected on
the driver and rides into a ``mapInPandas``/``pandas_udf`` numpy kernel
as a closure, each Arrow batch scores its rows against it, and the sole
shuffle left is the final per-query top-k window (WindowGroupLimit
prunes partial top-k map-side). The corpus never moves. Kernels score
in fixed-size query slices (``_KERNEL_QUERY_CHUNK``) so per-task memory
stays bounded by ``chunk x maxRecordsPerBatch`` doubles no matter how
large the query block grows.

All arithmetic is double, accumulated in ascending index order
(``acc += A[:, i] * B[:, i]``) — bit-exact vs both the JVM
left-to-right aggregate fold and DuckDB's list_dot_product, so the SQL
oracles reproduce scores bit-for-bit (r9 kernel rule).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from strake_spark.operators.hotbucket import drop_hot_buckets

# Query rows scored per kernel slice: bounds the dense |q_chunk| x batch
# score matrix each Arrow batch allocates (chunk x 10k-row default batch
# = ~320 MB of doubles at 4096) independently of n_queries — at
# n_queries=100k an unchunked kernel would allocate an ~8 GB matrix per
# batch. Chunking slices the QUERY axis only; every element is still
# accumulated in the same ascending-index order, so scores are
# bit-identical to the unchunked pass (the hash oracles pin this).
_KERNEL_QUERY_CHUNK = 4096


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries`` vectors.

    Execution shape (r14, same rewrite as ``lsh_topk``): one map-only
    Arrow pass over the partitioned corpus scoring each batch against
    the driver-collected (bounded) query block with numpy — queries
    broadcast, the corpus never moves, and the |C| x |Q| pair stream
    feeds the per-query top-k window (WindowGroupLimit prunes partial
    top-k map-side before the one shuffle). The previous broadcast
    crossJoin paid an interpreted aggregate∘zip_with fold per pair
    (~2.4 µs each) — the dominant cost at corpus scale. All
    accumulations use the ascending-index column loop, bit-exact vs
    the JVM left-to-right fold and DuckDB's oracle (r9 kernel rule);
    the ann_cosine_topk_bruteforce hash oracle pins it (verified at
    sf0.001/0.01/0.1). Isolated sf0.1 median: 0.60 -> 0.52 s — modest
    locally because the 2,000-row corpus is planning-constant
    dominated; the rewrite's point is the per-pair interpreted-fold
    cost at real corpus scale, same as lsh_topk's.
    """
    import numpy as np

    # null vectors can't be scored (the numpy kernel needs rectangular
    # batches); drop them on both sides — the old HOF form emitted
    # null-cosine rows for them, which never made a meaningful top-k
    emb = emb.filter(F.col(vec_col).isNotNull())
    q_rows = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).collect()
    id_t = emb.schema[id_col].dataType.simpleString()
    if not q_rows:
        return emb.sparkSession.createDataFrame(
            [], f"query_id {id_t}, nbr_id {id_t}, cosine double, rank int"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_nrm2 = np.zeros(Q.shape[0])
    for i in range(Q.shape[1]):
        q_nrm2 += Q[:, i] * Q[:, i]
    q_norms = np.sqrt(q_nrm2)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            nrm2 = np.zeros(M.shape[0])
            for i in range(M.shape[1]):
                col = M[:, i]
                nrm2 += col * col
            norms = np.sqrt(nrm2)
            # score in bounded query slices (see _KERNEL_QUERY_CHUNK):
            # per-slice values are accumulated exactly as the unchunked
            # pass would — only the matrix height is capped
            for qs in range(0, Q.shape[0], _KERNEL_QUERY_CHUNK):
                Qc = Q[qs : qs + _KERNEL_QUERY_CHUNK]
                qic = q_ids[qs : qs + _KERNEL_QUERY_CHUNK]
                qnc = q_norms[qs : qs + _KERNEL_QUERY_CHUNK]
                D = np.zeros((Qc.shape[0], M.shape[0]))
                for i in range(M.shape[1]):
                    D += Qc[:, i : i + 1] * M[None, :, i]
                cos = D / (qnc[:, None] * norms[None, :])
                out_q = np.repeat(qic, M.shape[0])
                out_n = np.tile(ids, Qc.shape[0])
                keep = out_q != out_n
                yield pd.DataFrame(
                    {
                        "query_id": out_q[keep],
                        "nbr_id": out_n[keep],
                        "cosine": cos.ravel()[keep],
                    }
                )

    scored = emb.select(id_col, vec_col).mapInPandas(
        _score, f"query_id {id_t}, nbr_id {id_t}, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "nbr_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def lsh_bucket(vec: Column, anchors: list[tuple[int, list[float]]]) -> Column:
    """Bucket id from sign bits of dot(vec, anchor_i)."""
    bucket = F.lit(0).cast("long")
    for bit, (_aid, avec) in enumerate(anchors):
        arr = F.array(*[F.lit(float(x)) for x in avec])
        bucket = bucket + F.when(_dot(vec, arr) > 0, F.lit(1 << bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    n_anchor_bits: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, plus (multi-probe) every bucket one sign-bit away — the
    standard recall fix: a true neighbor differing on one hyperplane is
    still found, at (bits+1)x candidate cost instead of 2^bits.

    Anchors are the ``n_anchor_bits`` lowest-id corpus vectors — a
    deterministic choice both engines can reproduce without a shared
    RNG. The bucket arithmetic stays SQL-expressible (``lsh_bucket`` is
    the reference form the ann_lsh_bucketed_topk oracle mirrors).

    Execution shape (r14 rewrite, measured): ONE map-only Arrow pass
    over the corpus — each batch computes its rows' buckets/norms and
    scores them against the (driver-collected, bounded) query block's
    probe map with numpy, emitting only matching (query_id, nbr_id,
    cosine) candidates; the sole shuffle left is the final per-query
    top-k window. The previous shape (bucket column via interpreted
    aggregate∘zip_with HOFs + broadcast equi join + per-pair HOF dot)
    paid ~2.4 µs per interpreted fold both per corpus row (bucketing)
    and per candidate pair (scoring) — at 10^9 rows that is the hot
    map stage of the whole metric. Isolated sf0.1 medians (6 iters,
    2 warmups): lsh_topk 1.33 -> 0.61 s, knn_label_consistency(lsh)
    1.34 -> 0.75 s.

    Bit-exactness (the ann_lsh_bucketed_topk hash oracle depends on
    it): every accumulation uses the ascending-index column loop
    (``acc += A[:, i] * B[:, i]``), which reproduces the JVM's
    left-to-right aggregate fold AND DuckDB's list_dot_product exactly
    (established r9, semdedup kernel); casts (float32 element ->
    double, then multiply) and the cosine division order match the old
    expression tree op for op.
    """
    import numpy as np

    if n_anchor_bits < 1:
        # the old SQL path degenerated to bucket 0 for every row (exact
        # all-pairs); a kernel pass with zero hyperplanes would instead
        # silently return nothing — fail loudly, callers wanting the
        # exact answer have cosine_topk
        raise ValueError(f"n_anchor_bits must be >= 1, got {n_anchor_bits}")
    # null vectors can't be bucketed or scored — drop them (see
    # cosine_topk's note on the old HOF form's null-cosine rows)
    emb = emb.filter(F.col(vec_col).isNotNull())
    anchors_rows = (
        emb.orderBy(id_col).limit(n_anchor_bits).select(id_col, vec_col).collect()
    )
    anchors = np.array([list(r[1]) for r in anchors_rows], dtype=np.float64)
    bits = anchors.shape[0]
    if bits == 0:  # empty corpus: no anchors, no rows — typed empty result
        spark = emb.sparkSession
        id_t = emb.schema[id_col].dataType.simpleString()
        return spark.createDataFrame(
            [], f"query_id {id_t}, nbr_id {id_t}, cosine double, rank int"
        )

    def _profile(M: "np.ndarray"):
        """(buckets int64, norms) via ascending-index accumulation —
        bit-exact vs the aggregate∘zip_with fold (see docstring)."""
        dots = np.zeros((M.shape[0], bits))
        nrm2 = np.zeros(M.shape[0])
        for i in range(M.shape[1]):
            col = M[:, i]
            dots += col[:, None] * anchors[None, :, i]
            nrm2 += col * col
        bucket = ((dots > 0).astype(np.int64) << np.arange(bits, dtype=np.int64)).sum(
            axis=1
        )
        return bucket, np.sqrt(nrm2)

    # Query block: bounded (id < n_queries), collected once; its probe
    # map rides into the kernel as a closure — queries broadcast, the
    # corpus never moves (same stance as cosine_topk's broadcast side).
    # Closure size is n_queries x dim doubles (~100 KB at the 200x64
    # default; ~50 MB at n_queries=100k — still broadcast-scale). This
    # operator's contract is a BOUNDED query set; corpus x corpus
    # similarity is embedding_dup_pairs' job (bucketed, capped).
    q_rows = (
        emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).collect()
    )
    probe_map: dict[int, list[int]] = {}
    if q_rows:
        q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
        Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
        q_buckets, q_norms = _profile(Q)
        for qi, b in enumerate(q_buckets):
            targets = [int(b)]
            if multi_probe:
                targets += [int(b) ^ (1 << bit) for bit in range(bits)]
            for t in targets:
                probe_map.setdefault(t, []).append(qi)

    id_t = emb.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {id_t}, nbr_id {id_t}, cosine double"

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0 or not probe_map:
                continue
            ids = pdf[id_col].to_numpy()
            M = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            buckets, norms = _profile(M)
            for b in np.unique(buckets):
                q_idx = probe_map.get(int(b))
                if not q_idx:
                    continue
                sel = buckets == b
                Mb, ib, nb = M[sel], ids[sel], norms[sel]
                # bounded query slices per bucket (_KERNEL_QUERY_CHUNK):
                # a hot bucket probed by every query would otherwise
                # allocate a |Q| x batch matrix
                for qs in range(0, len(q_idx), _KERNEL_QUERY_CHUNK):
                    qc = q_idx[qs : qs + _KERNEL_QUERY_CHUNK]
                    Qb, qib, qnb = Q[qc], q_ids[qc], q_norms[qc]
                    D = np.zeros((Qb.shape[0], Mb.shape[0]))
                    for i in range(Mb.shape[1]):
                        D += Qb[:, i : i + 1] * Mb[None, :, i]
                    cos = D / (qnb[:, None] * nb[None, :])
                    out_q = np.repeat(qib, Mb.shape[0])
                    out_n = np.tile(ib, Qb.shape[0])
                    keep = out_q != out_n
                    yield pd.DataFrame(
                        {
                            "query_id": out_q[keep],
                            "nbr_id": out_n[keep],
                            "cosine": cos.ravel()[keep],
                        }
                    )

    scored = emb.select(id_col, vec_col).mapInPandas(_score, out_schema)
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "nbr_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "lsh",
    num_bands: int = 12,
    band_bits: int = 3,
    seed: int = 13,
    max_bucket_size: int = 100_000,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine >= t).

    method="lsh" (default, the scale path): banded random-hyperplane
    signatures. Each vector gets ``num_bands`` band keys (``band_bits``
    sign bits each, hyperplanes from a seeded Gaussian so every run and
    every engine derives the same planes); candidate pairs share a full
    band key in at least one band — a plain (band, key) equi self-join,
    never an all-pairs nested-loop join. Exact cosine is the
    post-filter, so no false positives; a true pair at cosine t is
    missed with probability (1-(1-acos(t)/pi)^bits)^bands. On a planted
    near-duplicate corpus and on the synthetic embeddings at t=0.4 /
    num_bands=24 the LSH set equals the exact all-pairs set
    (tests/test_plan_shapes.py). Buckets larger than
    ``max_bucket_size`` (degenerate near-constant corpora) are dropped
    with the same rationale as minhash's hot-bucket cap: a single
    boilerplate bucket would otherwise go quadratic.

    method="exact": the brute-force all-pairs baseline (|C|^2/2 — only
    for small corpora / recall measurement).

    ``dim`` (embedding dimensionality) is read from the first row when
    not given — pass it explicitly to keep plan construction fully lazy.
    """
    if method == "exact":
        lhs = emb.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("va"),
            F.sqrt(_norm2(F.col(vec_col))).alias("na"),
        )
        rhs = emb.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("vb"),
            F.sqrt(_norm2(F.col(vec_col))).alias("nb"),
        )
        return (
            lhs.join(rhs, F.col("id_a") < F.col("id_b"))
            .select(
                "id_a",
                "id_b",
                (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    import numpy as np

    # The pair columns keep the caller's id type (string ids are as
    # legitimate as bigint ones — the exact path above preserves them
    # via plain column refs, and the Arrow path must match it).
    id_sql_type = emb.schema[id_col].dataType.simpleString()
    pair_schema = f"id_a {id_sql_type}, id_b {id_sql_type}, cosine double"

    if dim is None:
        # Eager one-row probe; callers that need a fully lazy plan pass
        # dim explicitly. Skip null embeddings when probing.
        first = (
            emb.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is None:
            return emb.sparkSession.createDataFrame([], pair_schema)
        dim = first["d"]
    if dim is None or dim < 1:
        raise ValueError(
            f"embedding_dup_pairs: could not determine embedding dimensionality "
            f"(got {dim!r}); pass dim= explicitly"
        )
    # Band keys via ONE Arrow-batched numpy matmul per batch — NOT
    # per-plane Catalyst aggregate(zip_with(...)) expressions: those are
    # interpreted higher-order functions costing num_bands*band_bits*dim
    # scalar ops per row (tens of seconds for a few thousand vectors);
    # sign(V @ P^T) bit-packed per band is the vectorized equivalent and
    # is deterministic for the seeded planes. The exact-cosine
    # post-filter below stays in the JVM left-fold path so scores remain
    # bit-identical to the SQL oracle. (Shared with
    # semantic_contamination — same seed => same planes => cross-corpus
    # banding agrees with within-corpus banding.)
    _band_keys = _hyperplane_band_udf(num_bands, band_bits, dim, seed)

    # Persist the PRE-explode profile: the banded relation feeds three
    # lineages (hot-bucket aggregate, anti-join, both self-join sides),
    # and without a cache each re-runs the scan + the Arrow matmul.
    # Caching before posexplode keeps the footprint at ~1x corpus
    # (id, vec, norm, keys array), not num_bands x; the explode that
    # re-derives each lineage is a cheap JVM generator over the cache.
    # The cache backs the returned lazy DataFrame (cannot be released
    # here); long-lived engines: clearCache() between batches.
    from pyspark import StorageLevel

    keyed = emb.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(_norm2(F.col(vec_col))).alias("nrm"),
        _band_keys(F.col(vec_col)).alias("keys"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    tagged = keyed.select(
        F.col(id_col),
        F.col(vec_col),
        F.col("nrm"),
        F.posexplode(F.col("keys")).alias("band", "key"),
    )
    # Per-BUCKET pairing via applyInPandas (r9, same kernel as
    # operators/semdedup.py): the old shape self-joined the banded
    # relation (materializing both vectors per candidate pair — pairs ×
    # 2×dim cells through the join and again through the
    # dropDuplicates exchange) and scored pairs with the interpreted
    # HOF fold. Grouping by (band, key) ships each bucket's members
    # ONCE over Arrow, forms a<b pairs inside numpy, and scores them
    # with an ascending-index accumulation (acc += A[:,i]*B[:,i]) whose
    # per-pair add order is exactly the SQL fold's / DuckDB
    # list_dot_product's — bit-identical cosines, so the oracle still
    # hash-matches. The hot-bucket cap becomes a group-size check (no
    # pre-aggregate, no anti-join), duplicates collapse on narrow
    # (id_a, id_b) rows, and per-task memory stays O(bucket^2) bounded
    # by the cap. Parallelism = number of buckets — num_bands *
    # corpus/bucket_size tasks at scale.
    thr = float(threshold)
    _id_pd_dtype = (
        "int64"
        if id_sql_type in ("bigint", "int", "smallint", "tinyint")
        else ("float64" if id_sql_type in ("double", "float") else "object")
    )
    _empty = {"id_a": _id_pd_dtype, "id_b": _id_pd_dtype, "cosine": "float64"}

    def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """Score every bucket in the group with pure numpy — NO
        per-bucket pandas objects: with small band_bits buckets hold a
        handful of rows, and thousands of sort_values/DataFrame
        constructions dominate runtime (measured ~1.5x the whole old
        join). Bucket boundaries come from one argsort over (key, id);
        results accumulate as flat arrays and become ONE DataFrame."""
        keys = pdf["key"].to_numpy(dtype=np.int64)
        ids_all = pdf[id_col].to_numpy()
        norms_all = pdf["nrm"].to_numpy(dtype=np.float64)
        vecs_all = pdf[vec_col].to_numpy()
        # lexicographic (key, id) order: buckets contiguous, id-sorted
        order = np.lexsort((ids_all, keys))
        keys_s = keys[order]
        bounds = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1], True])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        out_c: list[np.ndarray] = []
        with np.errstate(divide="ignore", invalid="ignore"):
            for s, e in zip(bounds[:-1], bounds[1:]):
                n_c = e - s
                if n_c < 2 or n_c > max_bucket_size:
                    continue
                idx = order[s:e]
                ids = ids_all[idx]
                norms = norms_all[idx]
                m = np.stack(vecs_all[idx]).astype(np.float64)
                d = m.shape[1]
                # chunk the pair matrix so a hot (cap-sized) bucket
                # costs O(chunk * bucket) memory, not O(bucket^2) —
                # same discipline as semdedup.semantic_prune
                rows_per_chunk = max(1, 4_000_000 // n_c)
                for cs in range(0, n_c, rows_per_chunk):
                    ce = min(n_c, cs + rows_per_chunk)
                    acc = np.zeros((ce - cs, n_c))
                    for i in range(d):
                        acc += m[cs:ce, i : i + 1] * m[:, i]
                    cos = acc / np.outer(norms[cs:ce], norms)
                    ia, ib = np.nonzero(
                        ((cos >= thr) | np.isnan(cos))
                        & (np.arange(cs, ce)[:, None] < np.arange(n_c)[None, :])
                    )
                    if len(ia):
                        out_a.append(ids[ia + cs])
                        out_b.append(ids[ib])
                        out_c.append(cos[ia, ib])
        if not out_a:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(_empty)
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    # Grouping granularity: one Arrow group PER BUCKET means thousands
    # of sub-millisecond Python invocations (overhead-dominated when
    # band_bits is large and buckets are small). Instead, salt whole
    # buckets into ~4x-parallelism groups — a key hashes to exactly one
    # group, so bucket membership is preserved and the kernel loops
    # over its buckets inside one vectorized call. At cluster scale the
    # group count scales with defaultParallelism, keeping per-task
    # memory at O(corpus / tasks) like any shuffle partition.
    # Over-cap buckets are dropped BEFORE the Arrow boundary (not just
    # by the in-kernel n_c skip, which only fires after the bucket's
    # vectors have already shipped to the Python worker): the shared
    # gated count + broadcast-anti-join pass (operators/hotbucket.py),
    # gated on the persisted `keyed` profile's count, not the raw scan.
    # The in-kernel skip stays as defense in depth for the gated-off
    # path's semantics (callers passing tiny caps on tiny corpora).
    tagged, = drop_hot_buckets(
        [tagged], ("band", "key"), max_bucket_size, keyed.count()
    )
    par = tagged.sparkSession.sparkContext.defaultParallelism
    groups_per_band = max(1, (4 * par) // max(1, num_bands))
    return (
        tagged.withColumn("_grp", F.pmod(F.hash(F.col("key")), F.lit(groups_per_band)))
        .groupBy("band", "_grp")
        .applyInPandas(_score_group, schema=pair_schema)
        .dropDuplicates(["id_a", "id_b"])
    )


def ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    n_clusters: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: the second scale path
    next to LSH.

    1. KMeans (Spark ML, fixed seed) partitions the corpus into
       ``n_clusters`` cells; each corpus vector is assigned once.
    2. Each query probes only its ``n_probe`` nearest cells, so the
       scoring join touches ~n_probe/n_clusters of the corpus instead
       of all of it — at 10^9 vectors that is the difference between a
       full-corpus cross join and a targeted cell scan.
    3. Exact cosine within the probed cells, per-query top-k.

    Iterative training is driver-coordinated (MLlib) — inherently not
    SQL-expressible, so the inventory entry is a rows-only check; the
    recall-vs-exact property is asserted in tests instead.

    Scoring rides the r14 map-only Arrow kernel (see the comment at
    the query block below). Local sf0.1 time (~1.5 s) is dominated by
    the 10-iteration KMeans fit, not scoring — the kernel's win is the
    per-pair cost at corpus scale, where training amortizes and the
    probed-cell scan is the hot stage.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # same null contract as cosine/lsh: a null vector can't be
    # cluster-assigned or scored (np.array conversion would raise and
    # kill the task) — drop it before training/assignment
    emb = emb.filter(F.col(vec_col).isNotNull())
    dataset = emb.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(dataset)
    assigned = model.transform(dataset).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).alias("nbr_vec"),
        F.col("prediction").alias("cell"),
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]

    # Query block: bounded (id < n_queries), collected once; each query
    # probes its n_probe nearest cells by the same (dist^2, cell) order
    # the old array_sort(struct(d, cell)) column produced. Scoring then
    # rides the SAME map-only Arrow kernel shape as lsh_topk (r14):
    # each corpus batch — already cell-assigned JVM-side by the KMeans
    # model — scores its rows against the queries probing that cell in
    # numpy, instead of a broadcast join paying an interpreted
    # aggregate∘zip_with fold per candidate pair (the hot stage at
    # corpus scale; the probed-cells fraction bounds candidates, the
    # kernel bounds per-pair cost).
    import numpy as np

    q_rows = emb.filter(F.col(id_col) < n_queries).select(id_col, vec_col).collect()
    id_t = emb.schema[id_col].dataType.simpleString()
    if not q_rows:
        return emb.sparkSession.createDataFrame(
            [], f"query_id {id_t}, nbr_id {id_t}, cosine double"
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    q_nrm2 = np.zeros(Q.shape[0])
    for i in range(Q.shape[1]):
        q_nrm2 += Q[:, i] * Q[:, i]
    q_norms = np.sqrt(q_nrm2)
    C = np.array([c for _, c in centers], dtype=np.float64)
    probe_map: dict[int, list[int]] = {}
    for qi in range(Q.shape[0]):
        d2 = np.zeros(C.shape[0])
        for i in range(C.shape[1]):  # ascending-index, like every kernel here
            diff = Q[qi, i] - C[:, i]
            d2 += diff * diff
        for ci in sorted(range(C.shape[0]), key=lambda c: (d2[c], c))[:n_probe]:
            probe_map.setdefault(int(ci), []).append(qi)

    def _score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["nbr_id"].to_numpy()
            cells = pdf["cell"].to_numpy()
            M = np.array(pdf["nbr_vec"].tolist(), dtype=np.float64)
            nrm2 = np.zeros(M.shape[0])
            for i in range(M.shape[1]):
                nrm2 += M[:, i] * M[:, i]
            norms = np.sqrt(nrm2)
            for c in np.unique(cells):
                q_idx = probe_map.get(int(c))
                if not q_idx:
                    continue
                sel = cells == c
                Mb, ib, nb = M[sel], ids[sel], norms[sel]
                # bounded query slices per cell (_KERNEL_QUERY_CHUNK),
                # same rationale as lsh_topk's per-bucket chunking
                for qs in range(0, len(q_idx), _KERNEL_QUERY_CHUNK):
                    qc = q_idx[qs : qs + _KERNEL_QUERY_CHUNK]
                    Qb, qib, qnb = Q[qc], q_ids[qc], q_norms[qc]
                    D = np.zeros((Qb.shape[0], Mb.shape[0]))
                    for i in range(Mb.shape[1]):
                        D += Qb[:, i : i + 1] * Mb[None, :, i]
                    cos = D / (qnb[:, None] * nb[None, :])
                    out_q = np.repeat(qib, Mb.shape[0])
                    out_n = np.tile(ib, Qb.shape[0])
                    keep = out_q != out_n
                    yield pd.DataFrame(
                        {
                            "query_id": out_q[keep],
                            "nbr_id": out_n[keep],
                            "cosine": cos.ravel()[keep],
                        }
                    )

    scored = assigned.mapInPandas(
        _score, f"query_id {id_t}, nbr_id {id_t}, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "cosine")
        .orderBy("query_id", F.col("cosine").desc(), "nbr_id")
    )

def ivf_topk_deterministic(
    emb: DataFrame,
    k: int = 5,
    n_queries: int = 20,
    n_clusters: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k on the DETERMINISTIC cosine k-means from
    operators/semdedup.py — the oracle-exact sibling of ``ivf_topk``.

    ``ivf_topk`` trains with Spark ML KMeans (k-means|| init, RNG) —
    production quality but driver-coordinated and not SQL-expressible,
    so its inventory entry is rows-only. This variant swaps the trainer
    for semdedup's fixed-iteration k-means (init = k smallest ids'
    vectors, DECIMAL-exact centroid means, struct-max assignment), which
    a DuckDB oracle reproduces bit-for-bit — making the ENTIRE IVF
    pipeline (train, assign, probe, score, rank) hash-checkable:

    1. cluster the corpus (one scan + one k*dim-cell aggregate per
       iteration; assignment map-only);
    2. each query ranks the k centroids by the SAME cosine score the
       assignment used and probes its ``n_probe`` best cells
       (ties -> smallest cid, mirroring assignment's tie-break);
    3. exact cosine within probed cells only, per-query top-k
       (ROW_NUMBER over cosine DESC, id ASC).

    Scale shape: queries broadcast (probed cells ride along), the
    corpus never moves; the only shuffle is the final per-query window
    over candidate rows (~n_queries * corpus * n_probe / n_clusters).
    """
    from strake_spark.operators.semdedup import (
        _assign,
        _carr_of,
        _normalized as _sd_normalized,
        _update_carr,
    )

    e = _sd_normalized(emb, id_col, vec_col)
    cents0 = e.orderBy("vec_id").limit(n_clusters).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    carr = _carr_of(cents0)
    for _ in range(max(0, iters - 1)):
        carr = _update_carr(_assign(e, carr))
    assigned = _assign(e, carr).select(
        F.col("vec_id").alias("nbr_id"),
        F.col("v").alias("nbr_v"),
        F.col("cluster").alias("cell"),
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_w = W.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cell").asc()
    )
    probed = (
        q.crossJoin(F.broadcast(carr))
        .select("query_id", "qv", F.explode("_cents").alias("cent"))
        .select(
            "query_id",
            "qv",
            F.col("cent.cid").alias("cell"),
            (_dot(F.col("qv"), F.col("cent.c"))
             / F.sqrt(_dot(F.col("cent.c"), F.col("cent.c")))).alias("score"),
        )
        .withColumn("rn", F.row_number().over(probe_w))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cell")
    )
    cand = (
        assigned.join(F.broadcast(probed), "cell")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            (
                _dot(F.col("qv"), F.col("nbr_v"))
                / (F.sqrt(_norm2(F.col("qv"))) * F.sqrt(_norm2(F.col("nbr_v"))))
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nbr_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
        .orderBy("query_id", "rank")
    )


def label_prototype_scores(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Prototypicality scoring for data pruning (published technique:
    Sorscher et al. 2022, "Beyond neural scaling laws — beating power
    law scaling via data pruning"): each class's prototype is the mean
    embedding of its members, and every example is scored by cosine to
    its own class prototype. Curation keeps the most prototypical
    examples (or drops them, to emphasize hard examples) — the
    embedding-space sibling of quality-score filtering.

    Returns (id, label, proto_cosine).

    Scale shape: ONE posexplode aggregate builds the prototypes
    (labels * dim cells, map-side partial), the tiny prototype table
    broadcasts back, and scoring is map-only. Prototype means use the
    DECIMAL(18,9) component-sum discipline (semdedup's), so the doubles
    are order-independent and a DuckDB oracle hash-matches."""
    e = emb.select(
        F.col(id_col), F.col(label_col).alias("label"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    comp = (
        e.select("label", F.posexplode("v").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(
            F.sum(F.col("val").cast("decimal(18,9)")).alias("s"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    proto = (
        comp.select(
            "label",
            F.struct("pos", (F.col("s").cast("double") / F.col("cnt")).alias("m")).alias("pm"),
        )
        .groupBy("label")
        .agg(F.transform(F.sort_array(F.collect_list("pm")), lambda x: x["m"]).alias("p"))
    )
    return (
        e.join(F.broadcast(proto), "label")
        .select(
            F.col(id_col),
            "label",
            (
                _dot(F.col("v"), F.col("p"))
                / (F.sqrt(_norm2(F.col("v"))) * F.sqrt(_norm2(F.col("p"))))
            ).alias("proto_cosine"),
        )
    )


def _hyperplane_band_udf(num_bands: int, band_bits: int, dim: int, seed: int):
    """Arrow-batched band-key UDF over seeded Gaussian hyperplanes —
    the shared signature machinery of embedding_dup_pairs and
    semantic_contamination (same seed => same planes => a pair banded
    on one side or across two relations lands in the same buckets)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rng = np.random.default_rng(seed)
    planes_t = rng.standard_normal((num_bands * band_bits, dim)).T.copy()
    bit_weights = (1 << np.arange(band_bits)).astype(np.int64)

    @pandas_udf("array<long>")
    def _band_keys(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        signs = (mat @ planes_t) > 0
        keys = signs.reshape(len(mat), -1, band_bits) @ bit_weights
        return pd.Series(list(keys.astype(np.int64)))

    # The function IS deterministic (seeded planes), but the optimizer
    # must not know it: InferFiltersFromGenerate adds a size(keys)>0
    # filter under every posexplode consumer, and filter/projection
    # splitting then evaluates the UDF TWICE per row (two
    # ArrowEvalPython nodes per side in the r19-opt plan capture —
    # guide §4.4's duplication pattern). Marking it non-deterministic
    # pins ONE evaluation; the inferred filter was redundant anyway
    # (non-outer Generate drops empty arrays itself). Plan evidence:
    # semantic_contamination drops 4 -> 2 ArrowEvalPython nodes (one
    # per side). Wall-clock at sf0.1 is neutral (the 2000x64 matmul is
    # trivial and the doubled eval pipelined); the win is the halved
    # Python-boundary pass count, which is what dominates banding at
    # web-scale vector volumes. Interleaved A/B confirmed identical
    # output on both consumers (contamination, dup_pairs).
    return _band_keys.asNondeterministic()


def semantic_contamination(
    new_emb: DataFrame,
    ref_emb: DataFrame,
    threshold: float = 0.4,
    num_bands: int = 24,
    band_bits: int = 3,
    seed: int = 13,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Semantic contamination detection BETWEEN corpora: (new_id,
    ref_id, cosine) pairs with cosine >= threshold, one side each — the
    embedding-space sibling of n-gram decontamination (published
    concern: eval-set contamination surveys score train-vs-eval
    EMBEDDING similarity precisely because paraphrases evade exact and
    n-gram matching).

    Same banded random-hyperplane machinery as ``embedding_dup_pairs``
    (identical seed => identical planes), so a true cross pair shares a
    band with the same probability as a within-corpus pair — the
    measured-full-recall property at (threshold=0.4, 24 bands) carries
    over, since cross pairs are a subset of the all-pairs set that
    recall was measured on. Scoring runs in the same per-bucket grouped
    Arrow kernel as embedding_dup_pairs, restricted to cross-side pairs
    (side-tagged members, one Arrow ship per bucket), with the
    ascending-index accumulation that is bit-identical to the SQL fold
    — the brute-force oracle hash-matches.

    Hot buckets (a near-constant region of embedding space populated by
    BOTH corpora — exactly what a web-scale train-vs-eval screen hits)
    are dropped with the shared gated count + broadcast-anti-join pass
    (operators/hotbucket.py) BEFORE the Arrow boundary, counting
    union membership across both sides, plus the in-kernel
    ``n_new + n_ref > max_bucket_size`` skip as defense in depth —
    the same three-layer discipline as ``embedding_dup_pairs``. The
    default cap is far above any test bucket, so oracle results are
    unchanged at test scale.

    Cache lifecycle: below the cap nothing persists (single-lineage
    plan, measured fastest). When the hot pass fires, the pre-explode
    side-tagged profile (id, side, vec, norm, band keys) persists — it
    then feeds two lineages (bucket count pass + kernel) — and BACKS
    the returned lazy DataFrame, so it cannot be released here;
    long-lived engines reclaim via ``spark.catalog.clearCache()``
    between batches (both regimes pinned by
    tests/test_cache_lifecycle.py).

    Isolated re-measure (r14, q5 triage protocol — two clean sessions,
    2 warmups + 6 iterations x two interleaved passes, idle machine):
    steady-state median 1.05 s at sf0.1, matching the r12 1.09 s; the
    r13 driver's 1.25 s (+15%) was session-position noise, not a
    regression — early-session passes measure ~1.4 s and fall to
    ~1.05 s as codegen JIT warms, and the q1 yardstick shows the same
    ~2x early-vs-late drift in the same session (0.59 -> 0.31 s). Code
    unchanged on this evidence."""
    if dim is None:
        first = (
            new_emb.filter(F.col(vec_col).isNotNull())
            .select(F.size(F.col(vec_col)).alias("d"))
            .first()
        )
        if first is None:
            return new_emb.sparkSession.createDataFrame(
                [], f"new_id {new_emb.schema[id_col].dataType.simpleString()}, "
                    f"ref_id {ref_emb.schema[id_col].dataType.simpleString()}, "
                    "cosine double"
            )
        dim = first["d"]
    band_udf = _hyperplane_band_udf(num_bands, band_bits, dim, seed)

    # Per-bucket grouped Arrow kernel (the r9 near-dup design with side
    # tags), NOT a banded equi join + per-pair JVM fold: the join shape
    # measured 3.3 s at sf0.1 because every candidate pair pays the
    # interpreted-HOF cosine (~2.4 µs/pair at 64 dims); the kernel ships
    # each bucket's members ONCE over Arrow and forms cross-side pairs
    # inside numpy with the ascending-index accumulation — bit-identical
    # to the fold and to DuckDB list_dot_product, so the brute-force
    # oracle still hash-matches.
    import numpy as np

    new_t = new_emb.select(
        F.col(id_col), F.lit(0).alias("side"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(_norm2(F.col(vec_col))).alias("nrm"),
        band_udf(F.col(vec_col).cast("array<double>")).alias("keys"),
    )
    ref_t = ref_emb.select(
        F.col(id_col), F.lit(1).alias("side"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.sqrt(_norm2(F.col(vec_col))).alias("nrm"),
        band_udf(F.col(vec_col).cast("array<double>")).alias("keys"),
    )
    # Gate on cheap INPUT counts (no band UDF, metadata-only on raw
    # parquet): no bucket can exceed the cap unless the combined
    # corpus does. Below the cap (the common case) the plan is the
    # r12 single-job shape — scan → Arrow matmul → explode → grouped
    # kernel, nothing persisted: an r13 isolated measurement showed
    # that unconditionally persisting the pre-explode profile and
    # gating on keyed.count() cost 2.5-3x at sf0.1 (the cache
    # round-trip of the wide vector column plus the extra
    # materialization job beats recomputing the matmul). Only when
    # the hot pass actually fires does the profile persist — there it
    # genuinely feeds two lineages (bucket count pass + kernel), and
    # at that corpus size the extra job is noise. The profile cache
    # then backs the returned handle (release via clearCache(),
    # pinned by tests/test_cache_lifecycle.py).
    gate_rows = (
        new_emb.select(id_col).unionAll(ref_emb.select(id_col)).count()
    )  # one job, id column only — no band UDF in the gate lineage
    keyed = new_t.unionByName(ref_t)
    if gate_rows > max_bucket_size:
        from pyspark import StorageLevel

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
    tagged = keyed.select(
        id_col, "side", "v", "nrm",
        F.posexplode(F.col("keys")).alias("band", "key"),
    )
    tagged, = drop_hot_buckets(
        [tagged], ("band", "key"), max_bucket_size, gate_rows
    )
    thr = float(threshold)
    id_sql_type = new_emb.schema[id_col].dataType.simpleString()
    _id_pd = (
        "int64" if id_sql_type in ("bigint", "int", "smallint", "tinyint")
        else ("float64" if id_sql_type in ("double", "float") else "object")
    )
    _empty = {"new_id": _id_pd, "ref_id": _id_pd, "cosine": "float64"}

    def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["key"].to_numpy(dtype=np.int64)
        sides = pdf["side"].to_numpy(dtype=np.int64)
        ids_all = pdf[id_col].to_numpy()
        norms_all = pdf["nrm"].to_numpy(dtype=np.float64)
        vecs_all = pdf["v"].to_numpy()
        order = np.lexsort((ids_all, sides, keys))
        keys_s = keys[order]
        bounds = np.flatnonzero(np.r_[True, keys_s[1:] != keys_s[:-1], True])
        out_a, out_b, out_c = [], [], []
        with np.errstate(divide="ignore", invalid="ignore"):
            for s, e in zip(bounds[:-1], bounds[1:]):
                idx = order[s:e]
                sd = sides[idx]
                n_new = int((sd == 0).sum())
                n_ref = len(idx) - n_new
                # in-kernel cap: defense in depth behind the pre-Arrow
                # gated drop (same discipline as embedding_dup_pairs)
                if n_new == 0 or n_ref == 0 or n_new + n_ref > max_bucket_size:
                    continue
                idx_new, idx_ref = idx[:n_new], idx[n_new:]
                a = np.stack(vecs_all[idx_new]).astype(np.float64)
                b = np.stack(vecs_all[idx_ref]).astype(np.float64)
                d = a.shape[1]
                rows_per_chunk = max(1, 4_000_000 // n_ref)
                for cs in range(0, n_new, rows_per_chunk):
                    ce = min(n_new, cs + rows_per_chunk)
                    acc = np.zeros((ce - cs, n_ref))
                    for i in range(d):
                        acc += a[cs:ce, i : i + 1] * b[:, i]
                    cos = acc / np.outer(
                        norms_all[idx_new][cs:ce], norms_all[idx_ref]
                    )
                    ia, ib = np.nonzero((cos >= thr) | np.isnan(cos))
                    if len(ia):
                        out_a.append(ids_all[idx_new][ia + cs])
                        out_b.append(ids_all[idx_ref][ib])
                        out_c.append(cos[ia, ib])
        if not out_a:
            return pd.DataFrame({"new_id": [], "ref_id": [], "cosine": []}).astype(_empty)
        return pd.DataFrame(
            {
                "new_id": np.concatenate(out_a),
                "ref_id": np.concatenate(out_b),
                "cosine": np.concatenate(out_c),
            }
        )

    par = tagged.sparkSession.sparkContext.defaultParallelism
    groups_per_band = max(1, (4 * par) // max(1, num_bands))
    return (
        tagged.withColumn("_grp", F.pmod(F.hash(F.col("key")), F.lit(groups_per_band)))
        .groupBy("band", "_grp")
        .applyInPandas(
            _score_group,
            schema=f"new_id {id_sql_type}, ref_id {id_sql_type}, cosine double",
        )
        .dropDuplicates(["new_id", "ref_id"])
    )


def knn_label_consistency(
    emb: DataFrame,
    k: int = 10,
    n_queries: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    method: str = "exact",
    n_anchor_bits: int = 3,
) -> DataFrame:
    """kNN label-agreement score for label-error detection (published
    technique: Confident Learning, Northcutt et al. 2021, and the kNN
    consistency filters common in dataset-cleaning pipelines): for each
    scored example, the fraction of its k nearest neighbors (cosine)
    that share its label. Low agreement flags probable label errors or
    boundary examples for curation review.

    Returns (id, label, n_neighbors, label_agreement).

    ``method`` selects the neighbor source (r13, VERDICT task 4 — the
    aggregation is independent of how neighbors are found):

    - ``"exact"`` (default, the oracle-hashed baseline): brute-force
      cosine via ``cosine_topk`` — queries broadcast, corpus
      partitioned, |C| x n_queries comparisons.
    - ``"lsh"`` (the corpus-scale path): ``lsh_topk`` — candidates
      restricted to the query's multi-probe LSH bucket, so per-query
      cost drops to the probed buckets' membership and the corpus
      never moves. Same (query_id, nbr_id, cosine, rank) shape, so the
      downstream label aggregation is byte-identical; parity vs exact
      is pinned by tests/test_ann_recall.py (exact equality on a
      planted-cluster corpus, agreement floor on the synthetic
      embeddings).

    label_agreement is an exact int/int division, so a SQL oracle
    hash-matches (the inventory entry uses method="exact")."""
    if method == "exact":
        nbrs = cosine_topk(emb, k=k, n_queries=n_queries, id_col=id_col, vec_col=vec_col)
    elif method == "lsh":
        nbrs = lsh_topk(
            emb, k=k, n_queries=n_queries, n_anchor_bits=n_anchor_bits,
            id_col=id_col, vec_col=vec_col,
        )
    else:
        raise ValueError(f"knn_label_consistency: unknown method {method!r} (exact|lsh)")
    labels = emb.select(F.col(id_col), F.col(label_col).alias("_lbl"))
    # Only the n_queries scored rows ever appear as query_id (both
    # cosine_topk and lsh_topk restrict queries to id < n_queries), so
    # the broadcast side is the FILTERED label slice — n_queries rows,
    # not the corpus. An unfiltered F.broadcast(labels) here would
    # force-ship the whole corpus's (id, label) relation (hints bypass
    # the size check): multi-GB at 10^9 rows (r13 verdict finding #2).
    q_lab = (
        labels.filter(F.col(id_col) < n_queries)
        .withColumnRenamed(id_col, "query_id")
        .withColumnRenamed("_lbl", "q_label")
    )
    n_lab = labels.withColumnRenamed(id_col, "nbr_id").withColumnRenamed("_lbl", "n_label")
    return (
        nbrs.join(F.broadcast(q_lab), "query_id")
        .join(n_lab, "nbr_id")
        .groupBy("query_id", "q_label")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            (
                F.sum(F.when(F.col("n_label") == F.col("q_label"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("label_agreement"),
        )
        .select(
            F.col("query_id").alias(id_col),
            F.col("q_label").alias("label"),
            "n_neighbors",
            "label_agreement",
        )
    )


# ------------------------------------------------------- PQ building blocks
# Shared by pq_topk and ivfpq_topk so the distance/tie-break/refine
# logic exists exactly once.


def _dist2_center(vec, center: list[float]):
    """Squared L2 between an array column and a constant centroid."""
    arr = F.array(*[F.lit(x) for x in center])
    return F.aggregate(
        F.zip_with(vec, arr, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _normalized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, nv): L2-normalized double vectors — squared-L2 ranking over
    these equals cosine ranking over the originals."""
    inv_norm = F.lit(1.0) / F.sqrt(_norm2(F.col(vec_col)))
    return emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") * inv_norm).alias("nv"),
    )

def _pq_train(base: DataFrame, slices, n_codes: int, seed: int) -> list[list[list[float]]]:
    """Per-subspace KMeans codebooks (m distributed fits; models tiny)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    codebooks = []
    for j, sl in enumerate(slices):
        ds = base.select(array_to_vector(sl).alias("features"))
        model = KMeans(k=n_codes, seed=seed + j, maxIter=10).fit(ds)
        codebooks.append([[float(x) for x in c] for c in model.clusterCenters()])
    return codebooks


def _pq_code_expr(sl, codebook):
    """argmin centroid index for one subvector — built-in struct
    array_sort, no UDF."""
    cands = F.array(*[
        F.struct(_dist2_center(sl, c).alias("d"), F.lit(ci).alias("c"))
        for ci, c in enumerate(codebook)
    ])
    return F.slice(F.array_sort(cands), 1, 1)[0]["c"]


def _pq_approx_dist(m: int):
    """Sum of m lookup-table entries — the asymmetric PQ distance."""
    return sum(
        F.element_at(F.col(f"lut_{j}"), F.col(f"code_{j}") + 1)
        for j in range(m)
    )


def _exact_refine(
    shortlist: DataFrame, base: DataFrame, n_queries: int, k: int, id_col: str
) -> DataFrame:
    """Exact cosine re-rank of (query_id, nbr_id) shortlist pairs (faiss
    IndexRefineFlat shape): full vectors are touched only for
    shortlist x query pairs, never the whole corpus."""
    from pyspark.sql import Window

    q_vecs = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col("nv").alias("q_vec")
    )
    nbr_vecs = base.select(
        F.col(id_col).alias("nbr_id"), F.col("nv").alias("nbr_vec")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("nbr_id").asc()
    )
    return (
        shortlist.join(nbr_vecs, "nbr_id")
        .join(F.broadcast(q_vecs), "query_id")
        .withColumn("cosine", _dot(F.col("nbr_vec"), F.col("q_vec")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "nbr_id", "cosine", "rank")
    )


def pq_topk(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    m: int = 4,
    n_codes: int = 16,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Product-quantization ANN: the MEMORY-scale path next to LSH
    (bucketing) and IVF (scan reduction).

    1. Vectors are L2-normalized (so squared-L2 ranking == cosine
       ranking) and split into ``m`` contiguous subvectors.
    2. Per-subspace KMeans (Spark ML, fixed seed) learns ``n_codes``
       centroids; the codebook (m x n_codes x d/m floats) is tiny and
       driver-held.
    3. The corpus encodes as m small codes per vector — at 10^9 x 64
       float32 embeddings that is 256 GB of vectors compressed to 4 GB
       of codes, the difference between spilling and RAM-resident.
       Encoding is pure built-ins (struct array_sort argmin), no UDF.
    4. Scoring is ASYMMETRIC (faiss IndexPQ shape): each query
       precomputes an n_codes-entry lookup table per subspace; a
       corpus vector's approximate distance is m ``element_at`` lookups
       summed — per-pair cost m lookups instead of a d-dim dot
       product. Queries broadcast; the corpus side never moves.
    5. A ``refine``-candidate shortlist is re-ranked with exact cosine
       (IndexRefineFlat shape) — without it, quantization error swamps
       the tiny neighbor gaps of near-uniform vectors.

    Iterative codebook training is driver-coordinated MLlib — not
    SQL-expressible, so the inventory entry is rows-only with a
    recall-vs-exact companion (same contract as LSH/IVF).
    """
    from pyspark.sql import Window

    # same null contract as cosine/lsh/ivf: the encode kernel needs
    # rectangular batches — a null vector would kill the np.array cast
    emb = emb.filter(F.col(vec_col).isNotNull())
    d = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    base = _normalized(emb, id_col, vec_col)
    slices = [F.slice(F.col("nv"), j * sub + 1, sub) for j in range(m)]
    codebooks = _pq_train(base, slices, n_codes, seed)

    # Encode via one Arrow-batched kernel instead of m x n_codes
    # interpreted dist^2 folds per corpus row (the hot map stage at
    # 10^9 rows — same r14 treatment as the LSH/IVF/brute kernels).
    # Bit-exact vs _pq_code_expr: ascending-index accumulation per
    # subspace dim reproduces the HOF fold, and np.argmin's first-min
    # rule is the struct-sort (d, c) smallest-code tie-break — the
    # sf0.001/sf0.01 outputs are byte-identical to the expression form
    # (golden-compared at rewrite time). _pq_code_expr itself stays:
    # the deterministic hash-oracled siblings build on it.
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    _cb = [np.array(cb, dtype=np.float64) for cb in codebooks]

    @pandas_udf("array<int>")
    def _encode(nv: pd.Series) -> pd.Series:
        M = np.array(nv.tolist(), dtype=np.float64)
        out = np.empty((M.shape[0], m), dtype=np.int32)
        for j in range(m):
            sl = M[:, j * sub : (j + 1) * sub]
            dist2 = np.zeros((M.shape[0], n_codes))
            for i in range(sub):
                diff = sl[:, i][:, None] - _cb[j][None, :, i]
                dist2 += diff * diff
            out[:, j] = np.argmin(dist2, axis=1)
        return pd.Series(list(out))

    codes = base.select(
        F.col(id_col).alias("nbr_id"), _encode(F.col("nv")).alias("codes")
    ).select(
        "nbr_id",
        *[F.element_at("codes", j + 1).alias(f"code_{j}") for j in range(m)],
    )
    luts = [
        F.array(*[_dist2_center(slices[j], c) for c in codebooks[j]]).alias(f"lut_{j}")
        for j in range(m)
    ]
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), *luts
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("nbr_id").asc()
    )
    shortlist = (
        codes.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _pq_approx_dist(m).alias("approx_dist"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= refine)
        .select("query_id", "nbr_id")
    )
    return _exact_refine(shortlist, base, n_queries, k, id_col)


def _det_subspace_codebook(sub_df: DataFrame, n_codes: int, iters: int, id_col: str):
    """Deterministic per-subspace L2 k-means codebook (the oracle-exact
    sibling of _pq_train): init = the ``n_codes`` smallest ids'
    subvectors (code index = rank in that order), assignment = argmin
    squared-L2 with ties to the smallest code (same struct-sort
    tie-break encoding uses), centroid update = per-(code, pos)
    DECIMAL(18,9)-exact component mean cast to double — the semdedup
    discipline, so a DuckDB oracle reproduces every centroid double
    bit-for-bit. A code that loses all members keeps its previous
    centroid. The codebook is collected to the driver (n_codes * d/m
    doubles — tiny by construction, same posture as _pq_train)."""
    rows = sub_df.orderBy(id_col).limit(n_codes).collect()
    cb = [[float(x) for x in r.sv] for r in rows]
    for _ in range(max(0, iters - 1)):
        code = _pq_code_expr(F.col("sv"), cb)
        means = (
            # two-step select: placing the struct-sort argmin and the
            # posexplode generator in ONE select trips a Spark analyzer
            # quirk (struct field names degrade to col1/col2 under the
            # generator rewrite -> FIELD_NOT_FOUND)
            sub_df.select(code.alias("code"), F.col("sv"))
            .select("code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("code", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .collect()
        )
        by_code: dict[int, dict[int, float]] = {}
        for r in means:
            by_code.setdefault(r.code, {})[r.pos] = r.m
        cb = [
            [by_code[ci][p] for p in range(len(c))] if ci in by_code else c
            for ci, c in enumerate(cb)
        ]
    return cb


def pq_topk_deterministic(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 2,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ ANN with deterministic codebooks — the oracle-exact sibling of
    ``pq_topk`` (same encode / asymmetric-LUT score / exact-refine
    pipeline, _pq_code_expr/_pq_approx_dist/_exact_refine reused
    verbatim), with _pq_train's MLlib fits replaced by
    _det_subspace_codebook so train/encode/score/refine are ALL
    SQL-expressible and the inventory entry carries a full value-hash
    oracle. Scale shape unchanged: codes are m small ints per vector,
    queries broadcast their lookup tables, the refine step touches full
    vectors only for shortlist pairs."""
    from pyspark.sql import Window

    d = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    base = _normalized(emb, id_col, vec_col)
    slices = [F.slice(F.col("nv"), j * sub + 1, sub) for j in range(m)]
    codebooks = [
        _det_subspace_codebook(
            base.select(F.col(id_col), slices[j].alias("sv")), n_codes, iters, id_col
        )
        for j in range(m)
    ]

    codes = base.select(
        F.col(id_col).alias("nbr_id"),
        *[_pq_code_expr(slices[j], codebooks[j]).alias(f"code_{j}")
          for j in range(m)],
    )
    luts = [
        F.array(*[_dist2_center(slices[j], c) for c in codebooks[j]]).alias(f"lut_{j}")
        for j in range(m)
    ]
    queries = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), *luts
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("nbr_id").asc()
    )
    shortlist = (
        codes.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _pq_approx_dist(m).alias("approx_dist"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= refine)
        .select("query_id", "nbr_id")
    )
    return _exact_refine(shortlist, base, n_queries, k, id_col)


def ivfpq_topk(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    n_clusters: int = 8,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF + PQ + refine — the full large-scale ANN recipe (faiss
    IndexIVFPQ + refine): IVF cells bound WHICH codes are scanned
    (~n_probe/n_clusters of the corpus), PQ codes bound the COST and
    MEMORY of scanning them (m lookups per pair over 32x-compressed
    codes), and the exact re-rank touches full vectors only for the
    shortlist. At 10^9 x 64-dim vectors: scan 1/2 of 4 GB of codes
    instead of 256 GB of floats, then read ~refine x n_queries vectors.

    Residual encoding (PQ over vector - cell_center, faiss's default)
    is deliberately skipped: it needs per-cell subtraction before
    encoding, and on these near-uniform synthetic vectors measured
    recall was indistinguishable — documented trade, not an oversight.

    Kernel port MEASURED AND REJECTED (r15, q5 protocol, clean idle
    session, sf0.1 = 2,000 vectors): the expression-form encode costs
    0.086 s vs 0.166 s for a pandas_udf kernel identical to pq_topk's
    (Arrow round-trip overhead dominates at this row count), while the
    5 MLlib fits cost ~8.2 s of the ~21 s total — the encode is not
    where this operator's time goes, locally or at scale (training
    amortizes; the LUT-sum scoring is m JVM element_at lookups/pair and
    the shortlist window prunes map-side). If a production corpus makes
    the encode hot, pq_topk's kernel is the drop-in shape to borrow.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    # same null contract as the other MLlib-trained paths (ivf/pq)
    emb = emb.filter(F.col(vec_col).isNotNull())
    d = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    base = _normalized(emb, id_col, vec_col)
    slices = [F.slice(F.col("nv"), j * sub + 1, sub) for j in range(m)]

    # IVF coarse quantizer over full normalized vectors
    ds = base.select("*", array_to_vector(F.col("nv")).alias("features"))
    coarse = KMeans(k=n_clusters, seed=seed, maxIter=10).fit(ds)
    assigned = coarse.transform(ds).select(
        id_col, "nv", F.col("prediction").alias("cell")
    )
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(coarse.clusterCenters())
    ]

    codebooks = _pq_train(base, slices, n_codes, seed + 100)
    codes = assigned.select(
        F.col(id_col).alias("nbr_id"), "cell",
        *[_pq_code_expr(slices[j], codebooks[j]).alias(f"code_{j}")
          for j in range(m)],
    )

    cell_dists = F.array(
        *[F.struct(_dist2_center(F.col("nv"), c).alias("d"), F.lit(i).alias("cell"))
          for i, c in centers]
    )
    luts = [
        F.array(*[_dist2_center(slices[j], c) for c in codebooks[j]]).alias(f"lut_{j}")
        for j in range(m)
    ]
    queries = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.slice(F.array_sort(cell_dists), 1, n_probe).alias("probed"),
            *luts,
        )
        .select(
            "query_id",
            F.explode(F.transform("probed", lambda s: s.cell)).alias("cell"),
            *[f"lut_{j}" for j in range(m)],
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("nbr_id").asc()
    )
    shortlist = (
        codes.join(F.broadcast(queries), "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _pq_approx_dist(m).alias("approx_dist"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= refine)
        .select("query_id", "nbr_id")
    )
    return _exact_refine(shortlist, base, n_queries, k, id_col)


def ivfpq_topk_deterministic(
    emb: DataFrame,
    k: int = 3,
    n_queries: int = 20,
    n_clusters: int = 8,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    iters: int = 2,
    refine: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + PQ + refine with deterministic training throughout — the
    oracle-exact sibling of ``ivfpq_topk``, completing the hash-green
    ANN family (LSH / IVF / PQ / IVFPQ). The coarse quantizer is
    _det_subspace_codebook over the FULL normalized vector (one
    'subspace' of width d), the PQ codebooks are the same per-subspace
    deterministic k-means pq_topk_deterministic uses, and probing,
    LUT scoring, shortlist and refine mirror ivfpq_topk expression for
    expression — so a DuckDB oracle reproduces the output bit-for-bit.
    Scale shape unchanged: cells bound WHICH codes are scanned, codes
    bound the scan's cost and memory, refine touches full vectors only
    for shortlist pairs."""
    from pyspark.sql import Window

    d = emb.select(F.size(F.col(vec_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    base = _normalized(emb, id_col, vec_col)
    slices = [F.slice(F.col("nv"), j * sub + 1, sub) for j in range(m)]

    coarse_cb = _det_subspace_codebook(
        base.select(F.col(id_col), F.col("nv").alias("sv")), n_clusters, iters, id_col
    )
    codebooks = [
        _det_subspace_codebook(
            base.select(F.col(id_col), slices[j].alias("sv")), n_codes, iters, id_col
        )
        for j in range(m)
    ]

    codes = base.select(
        F.col(id_col).alias("nbr_id"),
        _pq_code_expr(F.col("nv"), coarse_cb).alias("cell"),
        *[_pq_code_expr(slices[j], codebooks[j]).alias(f"code_{j}")
          for j in range(m)],
    )
    cell_dists = F.array(
        *[F.struct(_dist2_center(F.col("nv"), c).alias("d"), F.lit(i).alias("cell"))
          for i, c in enumerate(coarse_cb)]
    )
    luts = [
        F.array(*[_dist2_center(slices[j], c) for c in codebooks[j]]).alias(f"lut_{j}")
        for j in range(m)
    ]
    queries = (
        base.filter(F.col(id_col) < n_queries)
        .select(
            F.col(id_col).alias("query_id"),
            F.slice(F.array_sort(cell_dists), 1, n_probe).alias("probed"),
            *luts,
        )
        .select(
            "query_id",
            F.explode(F.transform("probed", lambda s: s.cell)).alias("cell"),
            *[f"lut_{j}" for j in range(m)],
        )
    )
    w_short = Window.partitionBy("query_id").orderBy(
        F.col("approx_dist").asc(), F.col("nbr_id").asc()
    )
    shortlist = (
        codes.join(F.broadcast(queries), "cell")
        .filter(F.col("query_id") != F.col("nbr_id"))
        .select("query_id", "nbr_id", _pq_approx_dist(m).alias("approx_dist"))
        .withColumn("srank", F.row_number().over(w_short))
        .filter(F.col("srank") <= refine)
        .select("query_id", "nbr_id")
    )
    return _exact_refine(shortlist, base, n_queries, k, id_col)
