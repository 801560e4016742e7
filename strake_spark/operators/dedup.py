"""Deduplication operators for large-scale training-data pipelines.

Four families, each a shuffle-lean DataFrame pipeline:

- exact_duplicates: hash-groupBy on content digest. One shuffle on the
  digest; at 100 TB the digest (32 bytes) shuffles, never the text.
- minhash_signatures / minhash_candidates: char-shingle -> K MinHash
  values -> banded LSH -> bucket self-join. The only all-to-all step is
  the bucket join, whose fan-in is controlled by band width; hot buckets
  (boilerplate docs) are the classic skew source — AQE skew-join or a
  bucket-size cap handles them.
- simhash_signatures / simhash_near_pairs: 48-bit SimHash from token
  hashes; near-pairs by Hamming distance. Pair generation blocks on
  band prefixes of the fingerprint, not a cross join.
- ngram_jaccard_pairs: exact word-n-gram Jaccard via inverted-index
  join (explode n-grams, join on n-gram, count per pair) — the
  standard "similarity join by inverted list" at scale; prefix/length
  filters would bound it further.

All hashes are md5-derived (operators/hashing.py) so a SQL oracle in
any engine reproduces the results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strake_spark.operators.hashing import (
    h32,
    h60,
    minhash_expr,
    normalize_text,
)
from strake_spark.operators.hotbucket import drop_hot_buckets

# Tuned for the synthetic docs (hundreds of chars); at production scale
# K/bands stay, shingle width typically 9-13 chars for prose.
SHINGLE_WIDTH = 5
NUM_HASHES = 16
NUM_BANDS = 4  # 4 rows per band
SIMHASH_BITS = 48


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Group identical texts by md5 digest; returns one row per digest
    with the keeper (min id) and the duplicate count."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def char_shingles(docs: DataFrame, id_col: str, text_col: str, width: int = SHINGLE_WIDTH) -> DataFrame:
    """(id, shingle) pairs: distinct character n-grams of the normalized
    text. explode(sequence(...)) keeps generation columnar/codegen'd —
    no Python in the loop."""
    norm = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("t"))
    return (
        norm.filter(F.length("t") >= width)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("t") - (width - 1))).alias("i"),
            F.col("t"),
        )
        .select(F.col(id_col), F.col("t").substr(F.col("i"), F.lit(width)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
) -> DataFrame:
    """One row per doc with columns mh0..mh{K-1}: min over shingles of
    the k-th universal hash of the shingle's 32-bit base hash.

    Single shuffle (groupBy id); the K mins are map-side partial aggs,
    so the shuffle carries K longs per doc regardless of text size.
    Shingles are generated WITHOUT the distinct() that char_shingles
    applies (r9): min over a multiset equals min over its set, so the
    dedup shuffle — a full exchange of (id, shingle) strings, the
    widest relation in the pipeline — buys nothing here. The explode →
    hash → partial-min pipeline shuffles only K longs per doc.

    An Arrow/numpy signature kernel was evaluated and REJECTED (r10,
    measured at sf0.1 / 1.47M shingles): the whole stage is 0.50 s, of
    which the explode+substr shingle generation is 0.36 s (pure
    codegen'd JVM), md5+conv adds 0.10 s, and ALL SIXTEEN universal-hash
    min aggregates add only 0.05 s — the expression tree is not
    interpreted cost, it is whole-stage-codegen. A Python kernel would
    pay ~1 µs per hashlib.md5 call (~1.5 s for the same shingles)
    before any shingling work, strictly worse than the JVM path.

    Bench anatomy (r10, sf0.1): of minhash_candidates' ~1.2 s per-call
    median, ~0.54 s is DRIVER-SIDE Catalyst plan construction+analysis
    (the signature subtree appears three times: banding + both score
    sides; cached execution reuses one copy but analysis walks all
    three) and ~0.66 s is execution. At cluster scale the plan is built
    once per query, so the analysis constant is noise there; collapsing
    it here would need a lineage-cutting checkpoint that destroys plan
    transparency (and the plan-shape tests) for a small-SF-only win.
    """
    norm = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("t"))
    width = SHINGLE_WIDTH
    sh = (
        norm.filter(F.length("t") >= width)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("t") - (width - 1))).alias("i"),
            F.col("t"),
        )
        .select(F.col(id_col), h32(F.col("t").substr(F.col("i"), F.lit(width))).alias("h"))
    )
    aggs = [F.min(minhash_expr(F.col("h"), k)).alias(f"mh{k}") for k in range(num_hashes)]
    return sh.groupBy(id_col).agg(*aggs)


def _banded(sig: DataFrame, id_col: str, num_hashes: int, num_bands: int) -> DataFrame:
    """(id, band, band_key) via a single explode — NOT a num_bands-way
    union (a union multiplies the partition count into tiny tasks);
    explode is one narrow pass preserving the upstream partitioning."""
    rows_per_band = num_hashes // num_bands
    band_structs = []
    for band in range(num_bands):
        cols = [f"mh{band * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.concat_ws("_", *[F.col(c).cast("string") for c in cols])
        band_structs.append(
            F.struct(F.lit(band).alias("band"), key.alias("band_key"))
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    threshold: float = 0.5,
    max_bucket_size: int = 50_000,
) -> DataFrame:
    """LSH candidate pairs with estimated Jaccard >= threshold.

    Bands the signature, buckets on (band, band-key), expands each
    bucket's a<b pairs. Distinct pairs may collide in several bands —
    dedup before scoring. Estimated Jaccard = fraction of agreeing
    signature components.

    Buckets with more than ``max_bucket_size`` members are dropped
    before pairs expand: a single boilerplate bucket (every page
    sharing a template) would otherwise produce size^2/2 candidate pairs
    and one straggler task. Docs inside a dropped bucket still pair up
    through their other bands unless they collide everywhere — the
    standard production tradeoff (near-identical boilerplate is handled
    by exact dedup upstream). The default cap is far above any test
    bucket, so oracle results are unchanged at test scale.
    """
    # cache: sig feeds banding, the gated hot-bucket count pass, and
    # both score-join sides; without it the signature aggregation (the
    # pipeline's most expensive stage, ~0.7 s at sf0.1) re-runs per
    # consumer. Measured r10: the cache is worth its cost —
    # steady-state ~1 s cached vs +0.7 s per extra evaluation uncached
    # (the r8 "persist buys nothing" claim held only for the
    # pre-banding SHINGLE relation, whose min-aggregation already
    # collapses map-side). Backs the returned lazy DataFrame (caller
    # releases via clearCache()).
    sig = minhash_signatures(docs, id_col, text_col, num_hashes).cache()
    banded = _banded(sig, id_col, num_hashes, num_bands)

    # Hot buckets are dropped BEFORE any materialization (shared
    # gated count + broadcast-anti-join discipline — see
    # operators/hotbucket.py for the full rationale). Filtering AFTER
    # collect_list (the r9 shape) would materialize the over-cap array
    # in one aggregation buffer first — the cap must bind before the
    # buffer exists, not after. The gate counts the CACHED sig
    # relation (not the caller's docs plan, which may be an expensive
    # derived lineage — r12 advice): bucket size <= signature count by
    # construction, and sig is materialized by the scoring joins
    # anyway, so the gate count only warms the cache it already needs.
    survivors, = drop_hot_buckets(
        [banded], ("band", "band_key"), max_bucket_size, sig.count()
    )

    # Pair generation via ONE bucket aggregation (r9), not a banded
    # self-join: groupBy (band, band_key) collects each surviving
    # bucket's member ids and the a<b pairs expand from the sorted
    # array. Member arrays carry IDS ONLY: an r10 experiment collected
    # (id, signature) structs instead, to score pairs inline and drop
    # the joins back to sig — but element_at(m, i) on the struct array
    # is re-evaluated per expanded pair row, so the 17×-wider member
    # array rides through both Generates once per pair and a 300-member
    # bucket OOMed a 2 GiB heap. The id-only array keeps the per-pair
    # carry at 8 bytes/member; scoring joins shuffle 16 longs per doc
    # at scale, which is noise next to the text-bearing stages.
    #
    # The expansion is TWO chained explodes — left index first, then
    # the partner slice — NOT one flatten(transform(transform)): the
    # flattened form materializes all size^2/2 pair structs as a single
    # array VALUE before exploding (a cap-sized boilerplate bucket
    # would allocate billions of structs in one row); the chained form
    # streams one ≤size-element slice per in-flight row, so task memory
    # stays O(bucket), never O(bucket^2).
    members = (
        survivors.groupBy("band", "band_key")
        .agg(F.array_sort(F.collect_list(F.col(id_col))).alias("m"))
        .filter(F.size("m") >= 2)
    )
    mi = members.select(
        "m", F.explode(F.sequence(F.lit(0), F.size("m") - 2)).alias("i")
    )
    pairs = (
        mi.select(
            F.element_at("m", F.col("i") + 1).alias("id_a"),
            F.explode(F.slice(F.col("m"), F.col("i") + 2, F.size("m"))).alias("id_b"),
        )
        .distinct()
    )

    sa = sig.alias("sa")
    sb = sig.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.mh{k}") == F.col(f"sb.mh{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    return (
        pairs.join(sa, pairs.id_a == F.col(f"sa.{id_col}"))
        .join(sb, pairs.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def cross_corpus_candidates(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = NUM_HASHES,
    num_bands: int = NUM_BANDS,
    threshold: float = 0.5,
    max_bucket_size: int = 50_000,
) -> DataFrame:
    """MinHash-LSH near-duplicate candidates BETWEEN two corpora: each
    returned pair is one ``new_docs`` doc and one ``ref_docs`` doc with
    estimated Jaccard >= threshold — the dedup-a-new-crawl-against-the-
    existing-training-set shape (within-corpus duplicates are
    ``minhash_candidates``'s job). Returns (new_id, ref_id,
    est_jaccard).

    Scale shape: this is an EQUI JOIN of the two banded relations on
    (band, band_key) — not a self-join — so each side shuffles once on
    the bucket key and the pair fan-out per bucket is n_new * n_ref,
    not (n_new + n_ref)^2 / 2. Hot buckets are dropped before the join
    with the same gated count + broadcast anti-join discipline as
    minhash_candidates, counting the bucket's TOTAL membership across
    both sides (a bucket hot on either side floods the join the same
    way). Signatures compute once per side and the scoring joins ship
    K longs per doc.

    Cache lifecycle: BOTH per-side signature caches back the returned
    lazy DataFrame (each feeds its banded lineage, the gate count, and
    its scoring-join side), so — exactly as for
    ``minhash_candidates`` — they cannot be released here; long-lived
    engines reclaim them via ``spark.catalog.clearCache()`` between
    batches. The cache-lifecycle census
    (tests/test_cache_lifecycle.py) pins both caches by name.
    """
    sig_new = minhash_signatures(new_docs, id_col, text_col, num_hashes).cache()
    sig_ref = minhash_signatures(ref_docs, id_col, text_col, num_hashes).cache()
    bn = _banded(sig_new, id_col, num_hashes, num_bands)
    br = _banded(sig_ref, id_col, num_hashes, num_bands)
    # Union-counted gated drop (hotbucket.py): a bucket hot on EITHER
    # side floods the equi join the same way, so membership is counted
    # across both banded relations. Gate on the two cached signature
    # relations, not the callers' docs plans (r12 advice).
    bn, br = drop_hot_buckets(
        [bn, br], ("band", "band_key"), max_bucket_size,
        sig_new.count() + sig_ref.count(),
    )
    pairs = (
        bn.select(F.col(id_col).alias("new_id"), "band", "band_key")
        .join(
            br.select(F.col(id_col).alias("ref_id"), "band", "band_key"),
            ["band", "band_key"],
        )
        .select("new_id", "ref_id")
        .distinct()
    )
    sa = sig_new.alias("sa")
    sb = sig_ref.alias("sb")
    agree = sum(
        F.when(F.col(f"sa.mh{k}") == F.col(f"sb.mh{k}"), 1).otherwise(0)
        for k in range(num_hashes)
    )
    return (
        pairs.join(sa, pairs.new_id == F.col(f"sa.{id_col}"))
        .join(sb, pairs.ref_id == F.col(f"sb.{id_col}"))
        .select(
            "new_id",
            "ref_id",
            (agree.cast("double") / F.lit(float(num_hashes))).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


def cross_corpus_exact(
    new_docs: DataFrame,
    ref_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact cross-corpus dedup: which new docs already exist verbatim
    in the reference corpus — the cheap first pass run before
    ``cross_corpus_candidates``. Returns every new doc with its digest
    and an ``in_ref`` flag (callers keep ``~in_ref`` rows).

    Scale shape: both sides reduce to 32-byte digests before anything
    moves; the ref side pre-aggregates to distinct digests (one
    map-side-combined shuffle), then a LEFT join marks membership —
    Catalyst broadcasts the digest set when it is small and
    shuffle-joins otherwise, both correct."""
    new_d = new_docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    ref_d = ref_docs.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    return (
        new_d.join(ref_d.withColumn("_hit", F.lit(1)), "digest", "left")
        .select(id_col, "digest", F.col("_hit").isNotNull().alias("in_ref"))
    )


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    norm = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("t"))
    return norm.filter(F.length("t") > 0).select(
        F.col(id_col), F.explode(F.split(F.col("t"), " ")).alias("tok")
    )


def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """SimHash fingerprint: per bit j, sum +1/-1 over token hashes'
    j-th bit; fingerprint sets bit j when the sum is positive.

    Expressed as K conditional-sum aggregates over the token relation —
    one shuffle, map-side partials, no per-bit explode (the naive
    bits x tokens explode shuffles 48x more rows for no reason).
    Duplicate tokens intentionally count with multiplicity (standard
    weighted SimHash with term frequency).
    """
    toks = _tokens(docs, id_col, text_col).select(
        F.col(id_col), h60(F.col("tok")).alias("h")
    )
    bit_aggs = []
    for j in range(bits):
        bit_set = F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1
        bit_aggs.append(
            F.sum(F.when(bit_set, 1).otherwise(-1)).alias(f"s{j}")
        )
    summed = toks.groupBy(id_col).agg(*bit_aggs)
    fp = None
    for j in range(bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return summed.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = SIMHASH_BITS,
    max_hamming: int = 8,
    num_blocks: int = 4,
    max_bucket_size: int = 50_000,
    persist: bool = True,
) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance.

    Blocking: split the fingerprint into ``num_blocks`` bit-ranges; by
    pigeonhole, any pair within distance < num_blocks agrees on at
    least one whole block, so joining per-block on equal block values
    finds all such pairs without a cross join. (max_hamming above the
    pigeonhole bound trades recall, as in production SimHash dedup.)

    Blocks with more than ``max_bucket_size`` members are dropped
    before pair expansion via the shared gated drop
    (``operators/hotbucket.py``) — same protection and the same recall
    tradeoff as ``minhash_candidates`` (a template block's pairs still
    surface through the other blocks unless they collide everywhere).

    ``persist`` (default True): cache the signature relation — it feeds
    the gate count and the blocked lineage, and it is narrow (two
    int64s per doc), so the cache is cheap and backs the returned lazy
    handle (caller releases via ``spark.catalog.clearCache()`` between
    batches, same contract as ``minhash_candidates``). Pass False only
    when the caller manages the signature lifecycle itself —
    ``duplicate_clusters`` persists the signatures, checkpoints the
    edges, then unpersists (r18; the old uncached path computed the
    tokenize+48-bit-aggregate relation TWICE: once for the gate count,
    once for the blocked lineage).
    """
    sig = simhash_signatures(docs, id_col, text_col, bits)
    if persist:
        sig = sig.cache()
    return _near_pairs_from_sig(
        sig, id_col, bits, max_hamming, num_blocks, max_bucket_size
    )


def _near_pairs_from_sig(
    sig: DataFrame,
    id_col: str,
    bits: int,
    max_hamming: int,
    num_blocks: int,
    max_bucket_size: int,
) -> DataFrame:
    """Pair expansion over an (id, simhash) relation — split out (r18)
    so callers that persist the signatures themselves reuse one cached
    relation for both the gate count and the blocked lineage."""
    # One explode instead of a num_blocks-way union (a union multiplies
    # partition count into tiny tasks), and ONE bucket aggregation
    # instead of a blocked self-join — the same r9 restructure as
    # minhash_candidates: the banded relation shuffles once into
    # (blk, blk_val) buckets; a<b pairs expand from the sorted member
    # array via two chained explodes, keeping task memory O(bucket).
    block_bits = bits // num_blocks
    mask = (1 << block_bits) - 1
    block_structs = [
        F.struct(
            F.lit(blk).alias("blk"),
            F.shiftright(F.col("simhash"), blk * block_bits)
            .bitwiseAND(F.lit(mask))
            .alias("blk_val"),
        )
        for blk in range(num_blocks)
    ]
    blocked = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*block_structs)).alias("bk")
    ).select(id_col, "simhash", F.col("bk.blk").alias("blk"), F.col("bk.blk_val").alias("blk_val"))
    # Hot blocks drop BEFORE collect_list materializes them, through
    # the shared gated count+anti-join helper (r14 — the last inline
    # drop block, migrated so it cannot drift from the other four
    # sites; see operators/hotbucket.py for the full rationale). The
    # gate counts the SIGNATURE relation, not the caller's docs plan
    # (which may be an expensive derived lineage — r12 advice): no
    # block can exceed the cap unless the signature count does, and
    # when ``persist`` is set the count only warms the cache the
    # blocked lineage reads anyway.
    blocked, = drop_hot_buckets(
        [blocked], ("blk", "blk_val"), max_bucket_size, sig.count()
    )
    # members carry (id, simhash) structs, id-sorted so a<b == index<
    members = blocked.groupBy("blk", "blk_val").agg(
        F.array_sort(F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("s")))).alias("m")
    ).filter(F.size("m") >= 2)
    mi = members.select("m", F.explode(F.sequence(F.lit(0), F.size("m") - 2)).alias("i"))
    left = F.element_at("m", F.col("i") + 1)
    pairs = (
        mi.select(
            left["i"].alias("id_a"),
            left["s"].alias("sh_a"),
            F.explode(F.slice(F.col("m"), F.col("i") + 2, F.size("m"))).alias("r"),
        )
        .select("id_a", F.col("r.i").alias("id_b"), "sh_a", F.col("r.s").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def duplicate_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_iterations: int = 20,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: every doc
    gets a cluster_id = the minimum doc id reachable through the
    near-dup graph (SimHash edges). The keeper-per-cluster policy
    (keep min id) then falls out as ``doc_id == cluster_id``.

    Connected components by iterative min-label propagation — the
    driver coordinates rounds, each round entirely DataFrame ops
    (symmetric edge join + groupBy min), converging in O(component
    diameter) rounds. Near-dup clusters are shallow (boilerplate
    families, version chains), so this converges in a handful of
    rounds; production graph dedup at 10^9+ edges upgrades to
    :func:`connected_components_star` (alternating large-star /
    small-star — REAL in this module as of r18, property-pinned equal
    to this function's clustering). Labels are localCheckpoint'ed per
    round so lineage doesn't grow with iterations.

    Scale shape (r18 restructure; same-session A/B at sf0.1: 7.9 s ->
    6.8 s, propagation rounds 7 -> 4 — the structural wins below
    compound at corpus scale where near-dups are rare and components
    deep):

    - the signature relation is persisted for exactly the edge
      materialization and released — the old ``persist=False`` path
      computed the tokenize + 48-bit-aggregate relation TWICE (gate
      count + blocked lineage);
    - only nodes WITH an edge participate in propagation. At corpus
      scale near-dups are a small minority, so the per-round join/agg
      runs over the near-dup subgraph, not the whole corpus; isolated
      docs join back at the end as their own clusters (label = id) in
      one anti-join, no rounds;
    - convergence is witnessed by ``sum(label)``: min-propagation only
      ever DECREASES labels, so the label vector is unchanged iff the
      sum is unchanged — one tiny aggregate on the just-checkpointed
      relation per round instead of an old-vs-new join + count.

    Raises ``RuntimeError`` if ``max_iterations`` rounds pass without
    convergence — partial labels would silently split clusters (docs
    that ARE duplicates get different cluster_ids and both survive a
    keep-min-id dedup), which is corrupt output, not a degraded answer.
    """
    sig = simhash_signatures(docs, id_col, text_col).cache()
    try:
        edges = _near_pairs_from_sig(
            sig, id_col, SIMHASH_BITS, max_hamming, 4, 50_000
        )
        sym = edges.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).unionAll(edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        sym = sym.localCheckpoint(eager=True)  # edges reused every round
    finally:
        sig.unpersist()

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=True)
    )
    # decimal(38,0) sum: the witness must not wrap on int64 overflow —
    # equal wrapped sums of DIFFERENT label vectors would fake
    # convergence at billion-doc scale
    _wsum = F.sum(F.col("label").cast("decimal(38,0)"))
    prev_sum = labels.agg(_wsum).collect()[0][0]
    converged = False
    for _ in range(max_iterations):
        nbr = sym.join(labels, sym.dst == labels.id).select(
            F.col("src").alias("id"), F.col("label")
        )
        new_labels = labels.unionAll(nbr).groupBy("id").agg(
            F.min("label").alias("label")
        )
        # pointer doubling (r18): additionally follow the label ONE
        # hop (label's own label — always an edge-node id, and always
        # reachable, so min over the reachable set is preserved).
        # Effective path length halves per round: O(log diameter)
        # rounds instead of O(diameter) — measured 7 -> 4 rounds at
        # sf0.1; the label self-join is tiny next to the edge join
        new_labels = (
            new_labels.alias("a")
            .join(
                new_labels.select(
                    F.col("id").alias("lid"), F.col("label").alias("llabel")
                ).alias("b"),
                F.col("a.label") == F.col("b.lid"),
                "left",
            )
            .select(
                F.col("a.id").alias("id"),
                F.least(
                    F.col("a.label"),
                    F.coalesce(F.col("llabel"), F.col("a.label")),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(_wsum).collect()[0][0]
        labels = new_labels
        if cur_sum == prev_sum or cur_sum is None:  # None = empty graph
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iterations} rounds; "
            "labels are partial (clusters would silently split). Raise "
            "max_iterations — rounds needed = graph component diameter."
        )
    isolated = (
        docs.select(F.col(id_col).alias("id"))
        .join(labels.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("label"))
    )
    return labels.unionAll(isolated).select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.4,
    persist: bool = True,
) -> DataFrame:
    """Exact word n-gram Jaccard with prefix + length filtering (the
    PPJoin-style similarity join).

    Candidate generation never joins the full inverted index: each
    doc's grams are globally ordered by (document frequency, gram), and
    only the first |g| - ceil(t*|g|) + 1 grams (the "prefix") are
    indexed — any pair with Jaccard >= t provably shares a prefix gram,
    so recall is exact while stop-word-like grams (high DF, ordered
    last) stay out of the index join entirely. A length filter
    (min_size >= t*max_size, also implied by J >= t) prunes the
    remaining candidates before verification. Verification then counts
    the full intersection only for surviving candidate pairs.

    At 100 TB this bounds the classic blowup: a 3-gram shared by 100k
    boilerplate docs lands in nobody's prefix (its DF ranks it last),
    instead of producing 100k^2/2 join rows.

    ``persist`` caches the doc-level distinct-gram-array relation
    ``docarr`` (r20; previously the exploded (id, gram) relation) —
    THREE consumers read it (the global-DF/prefix explode, and both
    verification sides); unpersisted, Catalyst recomputes the scan +
    explode + gram-set aggregation for each (the r17 duplicate-scan
    audit measured 6.6 s -> 3.9 s at sf0.1 from this cache alone,
    and docarr is strictly smaller: corpus ROWS, not gram rows). The
    smaller prefix relation is persisted too (read by both sides of
    the candidate self-join). BM25 lifetime contract: the caches back
    the returned lazy DataFrame; clearCache() between batches or
    persist=False to opt out.

    r19 verification shape (guide §2.3/§3.3): verification attaches
    each doc's gram ARRAY to the candidate pair (two id-keyed joins)
    and counts the overlap with a JVM ``array_intersect``, instead of
    exploding candidates x grams through two joins and re-aggregating
    the exploded relation — the explosion rows, their aggregation hash
    table, and the extra shuffle of the widest relation are gone.
    Interleaved same-session A/B at sf0.1: 4.45 -> 1.52 s median,
    outputs identical. The DF/size side stays two small AGGREGATES
    joined back on (not window counts over grams, which measured the
    same at sf0.1 but funnel hot boilerplate grams into single window
    tasks at scale — no partial aggregation, no AQE skew handling;
    the join shape gets both).

    r20 gram-set shape (guide §2.4): the doc-level DISTINCT GRAM ARRAY
    relation ``docarr`` (id, gs, n_grams) is the operator's single
    persisted backbone, built with ONE aggregation:
    codegen'd explode+concat gram generation, then
    ``collect_set(gram)`` grouped by id. Every duplicate of an
    (id, gram) pair originates from the same doc row, so the map-side
    partial collect_set collapses duplicates BEFORE the exchange —
    the shuffle carries each doc's distinct gram set exactly once,
    the same bytes the old ``.distinct()`` exchange carried. What the
    old shape then paid ON TOP is gone: the per-doc size aggregation
    (now map-side ``size(gs)``), the verification-side
    ``collect_list`` re-aggregation (``docarr`` IS the gram-array
    relation), and the sizes join in the prefix build (``n_grams``
    rides the explode). Interleaved same-session A/B at sf0.1 (3
    rounds x [1 cold + 5 warm], noop sink, outputs identical):
    cold 6.58 -> 4.96 s median (-25%), warm 3.05 -> 2.69 s median
    (-12%). A per-doc ``transform``+``array_distinct`` variant with NO
    gram exchange at all measured equal-within-noise at sf0.1 (cold
    4.53 / warm 2.60) and was REJECTED: it moves the gram-assembly hot
    loop into interpreted higher-order-lambda evaluation (the measured
    24x expression-eval class of decontam.ngram_hashes, r17) for zero
    demonstrated win — at corpus scale that stage is CPU-bound and
    codegen matters more than the one partial-agg exchange.
    """
    norm = docs.select(F.col(id_col), F.split(normalize_text(F.col(text_col)), " ").alias("w"))
    docarr = (
        norm.filter(F.size("w") >= n)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), F.size("w") - n)).alias("i"),
            F.col("w"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(" ", F.slice(F.col("w"), F.col("i") + 1, n)).alias("gram"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("gram").alias("gs"))
        .select(F.col(id_col), "gs", F.size("gs").alias("n_grams"))
    )
    if persist:
        from pyspark import StorageLevel

        docarr = docarr.persist(StorageLevel.MEMORY_AND_DISK)
    grams = docarr.select(
        F.col(id_col), F.col("n_grams"), F.explode("gs").alias("gram")
    )
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gram_df"))

    # Prefix per doc: grams ranked by (global DF asc, gram asc); keep
    # floor((1-t)*|g| + eps) + 1. The eps guards float representation of
    # (1-t)*|g| at integer boundaries — one gram too MANY is safe (more
    # candidates), one too few would lose true pairs.
    from pyspark.sql import Window as _W

    rn = F.row_number().over(_W.partitionBy(id_col).orderBy("gram_df", "gram"))
    prefix_len = (
        F.floor((1.0 - threshold) * F.col("n_grams") + F.lit(1e-9)) + 1
    )
    prefix = (
        grams.join(gram_df, "gram")
        .withColumn("rn", rn)
        .filter(F.col("rn") <= prefix_len)
        .select(F.col(id_col), F.col("gram"), F.col("n_grams"))
    )
    if persist:
        from pyspark import StorageLevel

        prefix = prefix.persist(StorageLevel.MEMORY_AND_DISK)

    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            # length filter: J >= t implies min|g| >= t * max|g|
            & (
                F.least(F.col("a.n_grams"), F.col("b.n_grams")).cast("double")
                >= threshold * F.greatest(F.col("a.n_grams"), F.col("b.n_grams")) - 1e-9
            ),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.n_grams").alias("na"),
            F.col("b.n_grams").alias("nb"),
        )
        .distinct()
    )

    # Verification: attach each side's gram ARRAY and count the overlap
    # in the JVM. gs is a collect_set — duplicate-free — so
    # size(array_intersect(..)) is exactly the old exploded-join COUNT;
    # order-independent, so no sort_array needed. docarr IS the
    # gram-array relation (r20): no collect_list re-aggregation.
    common = (
        cand.join(
            docarr.select(F.col(id_col).alias("id_a"), F.col("gs").alias("gs_a")),
            "id_a",
        )
        .join(
            docarr.select(F.col(id_col).alias("id_b"), F.col("gs").alias("gs_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "na",
            "nb",
            F.size(F.array_intersect("gs_a", "gs_b")).alias("n_common"),
        )
    )
    return (
        common.select(
            "id_a",
            "id_b",
            (
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def substring_dup_stats(
    docs: DataFrame,
    length: int = 40,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact duplicated-substring statistics (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better" — the
    EXACT-SUBSTRING family their suffix-array pass implements; the
    reference engine has no substring-level dedup).

    Per document: how many of its ``length``-char shingles also occur
    verbatim in at least one OTHER document. Downstream curation drops
    or trims documents with high ``dup_grams/n_grams``. Only documents
    with at least one cross-document duplicated shingle are returned.

    Distributed shape (100 TB stance): shingles explode map-side
    (char-offset sequence, no Python); the per-gram distinct-doc count
    and the join-back share one hash shuffle on the gram key (exchange
    reuse), then the per-doc rollup shuffles on ``id_col``. A
    suffix-array build is inherently sequential — the shingle
    inverted-index form is the standard distributed equivalent. At
    extreme scale, join on a fixed-width digest of the gram (md5) to
    narrow the shuffle; kept as raw grams here to stay bit-identical
    with the SQL oracle's semantics.
    """
    from pyspark.sql import functions as F

    sh = (
        docs.filter(F.length(text_col) >= length)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (length - 1))).alias("i"),
            F.col(text_col),
        )
        .select(id_col, F.col(text_col).substr(F.col("i"), F.lit(length)).alias("gram"))
    )
    gcount = sh.groupBy("gram").agg(F.countDistinct(id_col).alias("nd"))
    return (
        sh.join(gcount, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias("dup_grams"),
        )
        .filter(F.col("dup_grams") > 0)
    )


def connected_components_star(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 40,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — the 10^9+-edge upgrade path that
    :func:`duplicate_clusters`' docstring promises (r18: now real).

    Why it scales past min-label propagation: label propagation does
    O(component diameter) rounds, each joining the FULL edge set
    against the label table. Star contraction converges in
    O(log diameter) rounds AND shrinks the edge set geometrically as
    stars collapse — each round's work decreases, and per-node
    neighborhoods never need to fit in memory (both steps are plain
    groupBy aggregations + joins).

    - large-star: every node attaches its strictly-LARGER neighbors to
      the minimum of its closed neighborhood.
    - small-star: orient each edge toward the larger endpoint; every
      node attaches its smaller-or-equal neighbors (and itself) to the
      neighborhood minimum.

    Input: an edge relation (any orientation, self-loops tolerated).
    Output: ``(id, component)`` for every node that APPEARS in an edge
    — component = the minimum node id in its connected component
    (identical contract to the propagation loop; isolated nodes are the
    caller's to union back, as :func:`duplicate_clusters` does).

    Convergence witness: both steps only ever REPLACE an edge's far
    endpoint with a smaller label, so the decimal sum of all endpoint
    ids is non-increasing and the edge COUNT is stable at the star
    fixpoint — equal (count, sum) across a round means the multiset is
    unchanged (sum cannot collide under monotone non-increase: any
    change strictly decreases it).
    """
    e = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _stats(df: DataFrame):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("a") + F.col("b")).cast("decimal(38,0)")).alias("s"),
        ).collect()[0]
        return row["n"], row["s"]

    def _large_star(df: DataFrame) -> DataFrame:
        sym = df.unionAll(df.select(F.col("b").alias("a"), F.col("a").alias("b")))
        m = sym.groupBy("a").agg(F.min("b").alias("mn"))
        m = m.select("a", F.least("mn", "a").alias("m"))
        return (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    def _small_star(df: DataFrame) -> DataFrame:
        # orient toward the larger endpoint: (big, small)
        o = df.select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        m = o.groupBy("a").agg(F.min("b").alias("m"))
        attach = o.join(m, "a").select(F.col("b").alias("a"), F.col("m").alias("b"))
        self_edge = m.select(F.col("a"), F.col("m").alias("b"))
        return (
            attach.unionAll(self_edge)
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )

    prev = _stats(e)
    converged = False
    for _ in range(max_iterations):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _stats(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iterations} "
            "rounds — labels would be partial (split components)."
        )
    # at the star fixpoint every edge is (node, component-min); the
    # roots themselves appear only on the b side
    nodes = e.select(F.col("a").alias("id"), F.col("b").alias("component"))
    roots = e.select(F.col("b").alias("id"), F.col("b").alias("component")).distinct()
    return nodes.unionAll(roots).groupBy("id").agg(
        F.min("component").alias("component")
    )


def duplicate_clusters_star(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 8,
    max_iterations: int = 40,
) -> DataFrame:
    """:func:`duplicate_clusters` resolved by alternating star
    contraction instead of min-label propagation — identical contract
    and output ``(id_col, cluster_id)``, but components are found by
    :func:`connected_components_star` (O(log diameter) rounds, edge set
    shrinking geometrically), the path sized for 10^9+-edge graphs.

    Same edge materialization as duplicate_clusters (SimHash 48-bit
    signatures, 4-block banding, gated hot buckets, hamming <=
    ``max_hamming``); isolated docs join back as their own clusters in
    one anti-join."""
    sig = simhash_signatures(docs, id_col, text_col).cache()
    try:
        edges = _near_pairs_from_sig(
            sig, id_col, SIMHASH_BITS, max_hamming, 4, 50_000
        )
        # the CC call's eager first checkpoint materializes the edge
        # relation while the signature cache is still alive
        cc = connected_components_star(edges, "id_a", "id_b", max_iterations)
    finally:
        sig.unpersist()
    isolated = (
        docs.select(F.col(id_col).alias("id"))
        .join(cc.select("id"), "id", "left_anti")
        .select("id", F.col("id").alias("component"))
    )
    return cc.unionAll(isolated).select(
        F.col("id").alias(id_col), F.col("component").alias("cluster_id")
    )
