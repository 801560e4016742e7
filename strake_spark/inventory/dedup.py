"""Dedup inventory: each entry runs the operator from
strake_spark.operators.dedup and is verified against a DuckDB oracle
that reimplements the SAME algorithm in SQL (portable md5-derived
hashing makes the two engines agree bit-for-bit).

The oracle SQL is generated from the same parameter functions
(operators/hashing.py minhash_params etc.), so the two sides cannot
drift independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators import dedup as D
from strake_spark.operators.hashing import (
    sql_h32,
    sql_h60,
    sql_minhash_expr,
    sql_normalize_text,
)

# ---------------------------------------------------------------- shared SQL

_NORM = sql_normalize_text("text")

_SHINGLES_CTE = f"""
norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
sh AS (
    SELECT DISTINCT doc_id, substr(t, CAST(i AS INTEGER), {D.SHINGLE_WIDTH}) AS shingle
    FROM norm, LATERAL unnest(generate_series(1, length(t) - {D.SHINGLE_WIDTH - 1}))
         AS s(i)
    WHERE length(t) >= {D.SHINGLE_WIDTH}
),
hashed AS (SELECT doc_id, {sql_h32('shingle')} AS h FROM sh),
sig AS (
    SELECT doc_id,
           {", ".join(f"MIN({sql_minhash_expr('h', k)}) AS mh{k}" for k in range(D.NUM_HASHES))}
    FROM hashed GROUP BY doc_id
)"""


def _band_key_sql(band: int) -> str:
    rows = D.NUM_HASHES // D.NUM_BANDS
    cols = [f"CAST(mh{band * rows + r} AS VARCHAR)" for r in range(rows)]
    return f"concat_ws('_', {', '.join(cols)})"


# ------------------------------------------------------------------- exact


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS digest, MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    notes="content-digest groupBy; at scale only the 32-byte digest shuffles",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_duplicates(table(spark, sf_dir, "documents"))


# ------------------------------------------------------------------ minhash


@query(
    "dedup_minhash_signatures",
    oracle=f"WITH {_SHINGLES_CTE} SELECT * FROM sig",
    notes=f"K={D.NUM_HASHES} MinHash over {D.SHINGLE_WIDTH}-char shingles; universal hash family over md5-derived 32-bit base",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_signatures(table(spark, sf_dir, "documents"))


@query(
    "dedup_minhash_lsh_candidates",
    oracle=f"""
    WITH {_SHINGLES_CTE},
    banded AS (
        {" UNION ALL ".join(f"SELECT doc_id, {band} AS band, {_band_key_sql(band)} AS band_key FROM sig" for band in range(D.NUM_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           ({" + ".join(f"CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END" for k in range(D.NUM_HASHES))})
           / {float(D.NUM_HASHES)} AS est_jaccard
    FROM pairs
    JOIN sig sa ON pairs.id_a = sa.doc_id
    JOIN sig sb ON pairs.id_b = sb.doc_id
    WHERE ({" + ".join(f"CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END" for k in range(D.NUM_HASHES))})
          / {float(D.NUM_HASHES)} >= 0.5
    """,
    notes=f"banded LSH ({D.NUM_BANDS} bands x {D.NUM_HASHES // D.NUM_BANDS}); bucket self-join is the only all-to-all step",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_candidates(table(spark, sf_dir, "documents"))


def _sided_shingles_cte(side: str, where: str) -> str:
    """The _SHINGLES_CTE chain with a side suffix and a WHERE filter —
    cross-corpus dedup needs one signature relation per corpus."""
    return f"""
norm_{side} AS (SELECT doc_id, {_NORM} AS t FROM documents WHERE {where}),
sh_{side} AS (
    SELECT DISTINCT doc_id, substr(t, CAST(i AS INTEGER), {D.SHINGLE_WIDTH}) AS shingle
    FROM norm_{side}, LATERAL unnest(generate_series(1, length(t) - {D.SHINGLE_WIDTH - 1}))
         AS s(i)
    WHERE length(t) >= {D.SHINGLE_WIDTH}
),
hashed_{side} AS (SELECT doc_id, {sql_h32('shingle')} AS h FROM sh_{side}),
sig_{side} AS (
    SELECT doc_id,
           {", ".join(f"MIN({sql_minhash_expr('h', k)}) AS mh{k}" for k in range(D.NUM_HASHES))}
    FROM hashed_{side} GROUP BY doc_id
)"""


_CROSS_AGREE = " + ".join(
    f"CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END" for k in range(D.NUM_HASHES)
)


@query(
    "dedup_cross_corpus_candidates",
    oracle=f"""
    WITH {_sided_shingles_cte("n", "doc_id % 2 = 1")},
    {_sided_shingles_cte("r", "doc_id % 2 = 0")},
    banded_n AS (
        {" UNION ALL ".join(f"SELECT doc_id, {band} AS band, {_band_key_sql(band)} AS band_key FROM sig_n" for band in range(D.NUM_BANDS))}
    ),
    banded_r AS (
        {" UNION ALL ".join(f"SELECT doc_id, {band} AS band, {_band_key_sql(band)} AS band_key FROM sig_r" for band in range(D.NUM_BANDS))}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS ref_id
        FROM banded_n a JOIN banded_r b
          ON a.band = b.band AND a.band_key = b.band_key
    )
    SELECT new_id, ref_id, ({_CROSS_AGREE}) / {float(D.NUM_HASHES)} AS est_jaccard
    FROM pairs
    JOIN sig_n sa ON pairs.new_id = sa.doc_id
    JOIN sig_r sb ON pairs.ref_id = sb.doc_id
    WHERE ({_CROSS_AGREE}) / {float(D.NUM_HASHES)} >= 0.5
    """,
    notes=(
        "cross-corpus MinHash-LSH (r10): near-dup candidates BETWEEN a "
        "'new' corpus (odd doc_ids) and a 'reference' corpus (even "
        "doc_ids) — the dedup-a-new-crawl-against-the-training-set "
        "shape. An equi join of the two banded relations, never a "
        "self-join; hot buckets drop via a combined-membership count + "
        "broadcast anti-join before the join"
    ),
)
def dedup_cross_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.cross_corpus_candidates(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )


@query(
    "dedup_cross_corpus_exact",
    oracle="""
    SELECT n.doc_id, md5(n.text) AS digest,
           md5(n.text) IN (SELECT md5(text) FROM documents WHERE doc_id % 2 = 0)
             AS in_ref
    FROM documents n WHERE n.doc_id % 2 = 1
    """,
    notes=(
        "exact cross-corpus membership (r10): which 'new' docs (odd "
        "ids) exist verbatim in the 'reference' corpus (even ids) — the "
        "cheap digest pass run before cross-corpus MinHash. Both sides "
        "reduce to 32-byte digests before anything moves"
    ),
)
def dedup_cross_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.cross_corpus_exact(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )


# ------------------------------------------------------------------ simhash

_TOKENS_CTE = f"""
norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
toks AS (
    SELECT doc_id, {sql_h60('tok')} AS h
    FROM (SELECT doc_id, unnest(str_split(t, ' ')) AS tok FROM norm WHERE length(t) > 0)
),
sums AS (
    SELECT doc_id,
           {", ".join(f"CAST(SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS s{j}" for j in range(D.SIMHASH_BITS))}
    FROM toks GROUP BY doc_id
),
fp AS (
    SELECT doc_id,
           CAST({" + ".join(f"CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END" for j in range(D.SIMHASH_BITS))} AS BIGINT) AS simhash
    FROM sums
)"""


@query(
    "dedup_simhash_signatures",
    oracle=f"WITH {_TOKENS_CTE} SELECT doc_id, simhash FROM fp",
    notes=f"{D.SIMHASH_BITS}-bit SimHash from token-frequency-weighted md5 hashes",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_signatures(table(spark, sf_dir, "documents"))


_SIM_BLOCK_BITS = D.SIMHASH_BITS // 4
_SIM_MASK = (1 << _SIM_BLOCK_BITS) - 1


@query(
    "dedup_simhash_near_pairs",
    oracle=f"""
    WITH {_TOKENS_CTE},
    blocked AS (
        {" UNION ALL ".join(f"SELECT doc_id, simhash, {blk} AS blk, (simhash >> {blk * _SIM_BLOCK_BITS}) & {_SIM_MASK} AS blk_val FROM fp" for blk in range(4))}
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               a.simhash AS sh_a, b.simhash AS sh_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 8
    """,
    notes="pigeonhole blocking on fingerprint quarters; Hamming via bit_count(xor)",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_near_pairs(table(spark, sf_dir, "documents"))


# ---------------------------------------------------- duplicate clusters


@query(
    "dedup_duplicate_clusters",
    oracle=f"""
    WITH RECURSIVE {_TOKENS_CTE},
    blocked AS (
        {" UNION ALL ".join(f"SELECT doc_id, simhash, {blk} AS blk, (simhash >> {blk * _SIM_BLOCK_BITS}) & {_SIM_MASK} AS blk_val FROM fp" for blk in range(4))}
    ),
    near AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM near
        UNION ALL SELECT id_b, id_a FROM near
    ),
    reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id
    """,
    notes=(
        "near-dup PAIRS resolved into duplicate CLUSTERS: cluster_id = min "
        "doc id reachable through the SimHash near-dup graph. Spark side is "
        "iterative min-label propagation (driver-coordinated rounds of pure "
        "DataFrame joins, O(diameter) rounds); oracle is DuckDB's recursive "
        "CTE computing the same transitive closure. keeper == (doc_id = "
        "cluster_id)"
    ),
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicate_clusters(table(spark, sf_dir, "documents"))


@query(
    "dedup_clusters_star_contraction",
    oracle=f"""
    WITH RECURSIVE {_TOKENS_CTE},
    blocked AS (
        {" UNION ALL ".join(f"SELECT doc_id, simhash, {blk} AS blk, (simhash >> {blk * _SIM_BLOCK_BITS}) & {_SIM_MASK} AS blk_val FROM fp" for blk in range(4))}
    ),
    near AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM blocked a JOIN blocked b
          ON a.blk = b.blk AND a.blk_val = b.blk_val AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM near
        UNION ALL SELECT id_b, id_a FROM near
    ),
    reach(id, label) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
    )
    SELECT id AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY id
    """,
    notes=(
        "the SAME clustering as dedup_duplicate_clusters, resolved by "
        "alternating large-star/small-star contraction (Kiveris et al.) "
        "instead of min-label propagation — O(log diameter) rounds with "
        "a geometrically shrinking edge set, the algorithm that holds at "
        "10^9+ edges. Oracle identical (min reachable doc id through the "
        "SimHash near-dup graph); having both entries green pins the two "
        "component algorithms equal under the driver hash"
    ),
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.duplicate_clusters_star(table(spark, sf_dir, "documents"))


# ------------------------------------------------------------ ngram jaccard


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH norm AS (SELECT doc_id, str_split({_NORM}, ' ') AS w FROM documents),
    grams AS (
        SELECT DISTINCT doc_id,
               array_to_string(w[CAST(i AS INTEGER):CAST(i + 2 AS INTEGER)], ' ') AS gram
        FROM norm, LATERAL unnest(generate_series(1, len(w) - 2)) AS s(i)
        WHERE len(w) >= 3
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
        FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           CAST(n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - n_common) AS jaccard
    FROM common
    JOIN sizes sa ON common.id_a = sa.doc_id
    JOIN sizes sb ON common.id_b = sb.doc_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n_grams + sb.n_grams - n_common) >= 0.4
    """,
    notes="exact word-3-gram Jaccard via inverted-index join",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(table(spark, sf_dir, "documents"))


@query(
    "dedup_substring_exact_spans",
    oracle="""
    WITH sh AS (
      SELECT doc_id, substr(text, CAST(i AS INT), 40) AS gram
      FROM documents, LATERAL unnest(range(1, length(text) - 38)) AS t(i)
      WHERE length(text) >= 40
    ),
    gcount AS (SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM sh GROUP BY gram)
    SELECT s.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_grams
    FROM sh s JOIN gcount g ON s.gram = g.gram
    GROUP BY s.doc_id
    HAVING SUM(CASE WHEN g.nd > 1 THEN 1 ELSE 0 END) > 0
    ORDER BY s.doc_id
    """,
    notes=(
        "exact-substring duplication stats (Lee et al. 2021 family): "
        "per-doc count of 40-char shingles occurring verbatim in other "
        "docs — the substring-level dedup signal minhash/Jaccard entries "
        "do not cover. Inverted-index join, no suffix array needed "
        "distributed-side"
    ),
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        D.substring_dup_stats(table(spark, sf_dir, "documents"), length=40)
        .orderBy("doc_id")
    )
