"""Training-pipeline utilities: sampling, interleaving, vocabulary and
distribution statistics — the data-curation verbs around dedup/quality.

All deterministic (hash-based where randomness is conventional) so each
has an exact DuckDB oracle:
- hash sampling: md5-derived bucket per doc — reproducible split
  selection across engines/runs, the pattern for train/eval splits
  (RNG sampling can't be oracle-checked; hash sampling is also what a
  100 TB pipeline wants for resumability).
- deterministic shuffle: ORDER BY content hash — stable interleaving of
  documents for training order, no RNG state.
- vocabulary: corpus-wide token counts, top-N with total tie-break.
- exact percentiles of document length per language (Spark
  ``percentile`` == DuckDB ``quantile_cont``, both exact
  interpolation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators.hashing import normalize_text


@query(
    "sample_hash_bucket",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 2
    ORDER BY doc_id
    """,
    notes="deterministic ~20% sample: md5(doc_id) bucket — reproducible train/eval splits without RNG state",
)
def sample_hash_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    return d.filter(bucket < 2).select("doc_id", "lang").orderBy("doc_id")


@query(
    "sample_stratified_by_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100
          < CASE WHEN lang = 'en' THEN 50 ELSE 10 END
    ORDER BY doc_id
    """,
    notes=(
        "stratified deterministic sampling: per-stratum rates (50% en, "
        "10% other) via md5 bucket — the language-rebalancing primitive "
        "for training mixes; reproducible and resumable, no RNG state"
    ),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    rate = F.when(F.col("lang") == "en", 50).otherwise(10)
    return d.filter(bucket < rate).select("doc_id", "lang").orderBy("doc_id")


@query(
    "sample_shuffle_deterministic",
    oracle="""
    SELECT doc_id FROM documents
    ORDER BY md5(text || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
    notes="deterministic shuffle: order by content hash — stable training-order interleaving, no RNG",
)
def sample_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.md5(F.concat("text", F.col("doc_id").cast("string"))).alias("h"))
        .orderBy("h", "doc_id")
        .select("doc_id")
        .limit(100)
    )


@query(
    "text_vocabulary_topn",
    oracle="""
    SELECT tok, count(*) AS n
    FROM (
      SELECT unnest(string_split(
        trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')) AS tok
      FROM documents
    )
    WHERE tok <> ''
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 50
    """,
    notes="corpus vocabulary: normalized token counts, top-50 with total tie-break",
)
def vocabulary_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(normalize_text(F.col("text")), " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(50)
    )


@query(
    "agg_length_percentiles_by_lang",
    oracle="""
    SELECT lang,
           quantile_cont(n_chars, 0.5)  AS p50,
           quantile_cont(n_chars, 0.9)  AS p90,
           quantile_cont(n_chars, 0.99) AS p99,
           count(*) AS n_docs
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
    notes="exact interpolated percentiles of document length per language (Spark percentile == DuckDB quantile_cont)",
)
def length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.percentile("n_chars", 0.5).alias("p50"),
            F.percentile("n_chars", 0.9).alias("p90"),
            F.percentile("n_chars", 0.99).alias("p99"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, c.c_name
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_orderkey
    """,
    notes="salted join (hot-key spreading) must be result-identical to the plain equi-join it replaces",
)
def join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.operators.skew import salted_join

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return (
        salted_join(o, c, on="o_custkey", num_salts=8)
        .select("o_orderkey", "o_custkey", "c_name")
        .orderBy("o_orderkey")
    )


@query(
    "events_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           (p.user_id IS NOT NULL) AS converted
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    ORDER BY s.user_id
    """,
    notes=(
        "funnel analysis: signup -> first subsequent purchase per user. "
        "r18: re-pointed at operators/relational.funnel_two_step — ONE "
        "events scan and ONE user_id exchange (both step minima are "
        "stacked window aggregates; the closing distinct reuses the "
        "partitioning) replacing the legacy 3-scan filter/agg/join "
        "formulation — a 3x fact-table scan is a real cost at 100 TB"
    ),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.operators.relational import funnel_two_step

    e = table(spark, sf_dir, "events")
    return funnel_two_step(
        e, first_type="signup", then_type="purchase",
        id_col="user_id", type_col="event_type", ts_col="ts",
    ).select(
        "user_id",
        "signup_ts",
        F.col("first_purchase_ts"),
        "converted",
    ).orderBy("user_id")


@query(
    "dedup_corpus_keep_first",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    ORDER BY doc_id
    """,
    notes=(
        "the dedup END PRODUCT: the corpus with exactly one keeper (min "
        "doc_id) per content digest. Digest-only groupBy + left-semi "
        "join — the 32-byte digest shuffles, never the text"
    ),
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    keepers = d.groupBy(F.md5("text").alias("digest")).agg(
        F.min("doc_id").alias("doc_id")
    )
    return (
        d.join(keepers.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


_DECONTAM_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ') AS toks
  FROM documents
),
grams AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+7], ' ')) AS gram_h
  FROM tok, UNNEST(range(1, len(toks) - 6)) AS t(i)
  WHERE len(toks) >= 8
)
SELECT DISTINCT doc_id
FROM grams
WHERE NOT (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 2)
  AND gram_h IN (
    SELECT gram_h FROM grams
    WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 10 < 2)
ORDER BY doc_id
"""


@query(
    "pipeline_decontaminate_ngram",
    oracle=_DECONTAM_ORACLE,
    notes=(
        "test-set decontamination: training docs sharing any "
        "8-word-gram with the held-out eval split (the same md5 "
        "hash-bucket rule as sample_hash_bucket, ~20%) are flagged. "
        "md5 gram digests shuffle, never gram text; distinct eval "
        "grams are the semi-join build side (broadcastable at "
        "benchmark size)"
    ),
)
def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.operators.decontam import contaminated_ids

    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % 10
    train = d.filter(~(bucket < 2))
    eval_docs = d.filter(bucket < 2)
    return contaminated_ids(train, eval_docs).orderBy("doc_id")


_PACK_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text),
             '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tok
  FROM documents
),
r AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
  FROM t
)
SELECT CAST(FLOOR((running - n_tok) / 4096.0) AS BIGINT) AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens
FROM r GROUP BY 1 ORDER BY pack_id
"""


@query(
    "pipeline_pack_sequences",
    oracle=_PACK_ORACLE,
    notes=(
        "sequence packing preview: prefix-sum token counts -> "
        "pack_id = floor((running - own)/4096) -> per-pack doc count + "
        "token fill. One window pass + one aggregate, no driver loop"
    ),
)
def pack_sequences_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.operators.decontam import pack_sequences

    d = table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=4096).orderBy("pack_id")


_MIXTURE_ORACLE = """
WITH e AS (
  SELECT doc_id, source,
         CASE WHEN source IN ('src0', 'src1') THEN 2.5 ELSE 1.0 END AS w,
         unnest(range(1, CAST(ceil(CASE WHEN source IN ('src0', 'src1')
                                        THEN 2.5 ELSE 1.0 END) AS BIGINT) + 1)) AS epoch
  FROM documents
)
SELECT doc_id, CAST(epoch AS BIGINT) AS epoch, source
FROM e
WHERE epoch <= floor(w)
   OR CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '-' ||
            CAST(epoch AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < (w - floor(w)) * 100
ORDER BY doc_id, epoch
"""


@query(
    "pipeline_mixture_upsample",
    oracle=_MIXTURE_ORACLE,
    notes=(
        "training-mix construction with per-source weights > 1: docs "
        "from up-weighted sources (2.5x for src0/src1) repeat across "
        "epochs — whole epochs for floor(w), the fractional remainder "
        "by deterministic md5(doc,epoch) bucket. No RNG state, "
        "reproducible and resumable; stratified sampling covers only "
        "w <= 1, this covers the up-sampling half of mix building"
    ),
)
def mixture_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    w = F.when(F.col("source").isin("src0", "src1"), F.lit(2.5)).otherwise(F.lit(1.0))
    t = d.select("doc_id", "source", w.alias("w"))
    t = t.select(
        "doc_id", "source", "w",
        F.explode(F.sequence(F.lit(1), F.ceil("w").cast("int"))).alias("epoch_i"),
    ).withColumn("epoch", F.col("epoch_i").cast("long")).drop("epoch_i")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("-"),
                           F.col("epoch").cast("string"))), 1, 8),
        16, 10,
    ).cast("long") % 100
    keep = (F.col("epoch") <= F.floor("w")) | (
        bucket < (F.col("w") - F.floor("w")) * 100
    )
    return (
        t.filter(keep)
        .select("doc_id", "epoch", "source")
        .orderBy("doc_id", "epoch")
    )


def _curation_oracle() -> str:
    from strake_spark.operators import text as TX

    return f"""
    WITH q AS ({TX.sql_quality_score()})
    SELECT d.doc_id, d.lang, q.quality
    FROM documents d JOIN q ON d.doc_id = q.doc_id
    WHERE q.quality >= 0.5 AND d.lang = 'en'
    ORDER BY d.doc_id
    """


@query(
    "pipeline_curation_filter",
    oracle=_curation_oracle(),
    notes=(
        "the curation END PRODUCT: quality gate (composite score >= "
        "0.5) + language gate (en) composed into one plan — the "
        "training-mix admission filter; oracle composes the "
        "quality-score SQL so the two sides cannot drift"
    ),
)
def curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.operators import text as TX

    d = table(spark, sf_dir, "documents")
    # keep-through: lang rides the scoring scan, so the quality + lang
    # gate is one scan and zero joins (was a doc_id self-join that
    # scanned documents twice)
    return (
        TX.quality_score(d, keep=("lang",))
        .filter((F.col("quality") >= 0.5) & (F.col("lang") == "en"))
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    )


@query(
    "pipeline_source_quota",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rn <= 20 ORDER BY doc_id
    """,
    notes=(
        "per-source document quota (cap 20, keep-first by doc_id) — the "
        "domain-capping step of web-corpus curation (no single site may "
        "dominate the mix). One window pass partitioned by source; at "
        "100 TB the partition count is the domain count (millions), so "
        "state per partition stays tiny; a pathological mega-domain is "
        "bounded by the quota itself"
    ),
)
def source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@query(
    "pipeline_shard_manifest",
    oracle="""
    WITH s AS (
      SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
               AS shard_id
      FROM documents
    )
    SELECT shard_id, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
    FROM s GROUP BY shard_id ORDER BY shard_id
    """,
    notes=(
        "deterministic output sharding (md5 bucket, 8 shards) + the "
        "per-shard manifest a writer publishes (doc count, char volume, "
        "id range) — the repartition-by-shard + manifest step before "
        "writing training shards; hash sharding balances volume without "
        "RNG state and the manifest is one map-side-combinable aggregate"
    ),
)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 8
    )
    return (
        d.select(shard.alias("shard_id"), "doc_id", "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("shard_id")
    )


@query(
    "pipeline_chunk_documents",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, ' +', ' ', 'g')), ' ') AS toks
      FROM documents
    ),
    starts AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks) - 16, 1), 48)) AS start
      FROM tok
    )
    SELECT doc_id,
           CAST(start / 48 AS BIGINT) AS chunk_id,
           CAST(least(64, len(toks) - start) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(list_slice(toks, start + 1, start + 64), ' '))
             AS chunk_md5
    FROM starts ORDER BY doc_id, chunk_id
    """,
    notes=(
        "context-window chunking: split each document's token stream "
        "into 64-token training chunks with 16-token overlap (stride "
        "48) — the doc->sample step before packing. Pure built-ins "
        "(split/sequence/explode/slice), no UDF; chunk content is "
        "verified by md5 so the oracle compares text without shipping "
        "it. At 100 TB this is map-only: chunks never shuffle"
    ),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.regexp_replace(F.col("text"), " +", " ")), " ")
    t = d.select("doc_id", toks.alias("toks")).withColumn(
        "n", F.size("toks")
    )
    # DuckDB range(0, stop, 48) excludes stop; Spark sequence includes:
    # sequence(0, greatest(n-17, 0), 48) yields the identical start set
    starts = F.sequence(
        F.lit(0), F.greatest(F.col("n") - 17, F.lit(0)), F.lit(48)
    )
    t = t.select("doc_id", "toks", "n", F.explode(starts).alias("start"))
    chunk = F.slice(F.col("toks"), F.col("start") + 1, 64)
    return t.select(
        "doc_id",
        (F.col("start") / 48).cast("long").alias("chunk_id"),
        F.least(F.lit(64), F.col("n") - F.col("start")).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


def _end_to_end_oracle() -> str:
    from strake_spark.operators import text as TX

    return f"""
    WITH q AS ({TX.sql_quality_score()}),
    keep AS (
      SELECT d.doc_id, d.lang, d.source, d.n_chars
      FROM documents d
      WHERE d.doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
    ),
    qual AS (
      SELECT k.* FROM keep k JOIN q ON k.doc_id = q.doc_id
      WHERE q.quality >= 0.5
    ),
    quota AS (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM qual
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM quota WHERE rn <= 15
    GROUP BY lang ORDER BY lang
    """


@query(
    "pipeline_end_to_end_curation",
    oracle=_end_to_end_oracle(),
    notes=(
        "the whole curation DAG as ONE Catalyst plan: exact dedup "
        "(keep-first per content digest) -> quality gate (composite "
        ">= 0.5) -> per-source quota (first 15) -> per-language "
        "manifest (doc count + char volume). Each stage is the same "
        "operator the standalone entries verify; composing them proves "
        "the stages chain without materialization barriers — one job, "
        "digest/score/quota all pipelined, only the final aggregate "
        "shuffles by lang. The oracle composes the SAME quality-score "
        "SQL so the two sides cannot drift"
    ),
)
def end_to_end_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from strake_spark.operators import text as TX

    d = table(spark, sf_dir, "documents").withColumn("digest", F.md5("text"))
    # ONE scan computes digest + quality row-wise and DROPS the text;
    # only narrow rows (ids, digest, features) ever shuffle. Keep-first
    # per digest is then row_number()==1 ordered by doc_id — exactly
    # min(doc_id) per digest. The previous shape scanned documents
    # three times (digest groupBy, semi-join back, separate score pass)
    # to keep its shuffles narrow; the keep-through quality pass gets
    # both: one scan AND no text bytes in any exchange.
    scored = TX.quality_score(d, keep=("source", "lang", "n_chars", "digest"))
    w_dup = Window.partitionBy("digest").orderBy("doc_id")
    kept = (
        scored.withColumn("rn0", F.row_number().over(w_dup))
        .filter(F.col("rn0") == 1)
        .drop("rn0", "digest")
    )
    qual = kept.filter(F.col("quality") >= 0.5)
    w = Window.partitionBy("source").orderBy("doc_id")
    quota = qual.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 15
    )
    return (
        quota.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang")
    )


@query(
    "pipeline_dedup_rate_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS n_dups
    FROM documents GROUP BY source ORDER BY source
    """,
    notes=(
        "per-source duplication telemetry (docs vs distinct content "
        "digests) — the data-quality report that decides which sources "
        "need aggressive dedup before mixing. One aggregate over "
        "32-byte digests; the text never shuffles"
    ),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.select("source", F.md5("text").alias("digest"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("digest").alias("n_unique"),
            (F.count(F.lit(1)) - F.countDistinct("digest")).alias("n_dups"),
        )
        .orderBy("source")
    )


@query(
    "sample_grouped_split",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, source,
             CASE WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 10 < 8
                  THEN 'train'
                  WHEN CAST(('0x' || substr(md5(source), 1, 8)) AS BIGINT) % 10 < 9
                  THEN 'val' ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM tagged GROUP BY split ORDER BY split
    """,
    notes=(
        "leakage-safe GROUPED train/val/test split: the md5 bucket is "
        "keyed on the GROUP (source), not the row, so every document of "
        "a source lands in the same split — near-duplicate docs within a "
        "source can never straddle train/test (the leakage row-level "
        "splits cause). Deterministic, no RNG state, one map-side tag"
    ),
)
def sample_grouped_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("source")), 1, 8), 16, 10).cast("long") % 10
    split = (
        F.when(bucket < 8, "train").when(bucket < 9, "val").otherwise("test")
    ).alias("split")
    return (
        d.select(split, "source")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("split")
    )


@query(
    "pipeline_url_canonical_dedup",
    oracle="""
    WITH raw AS (
      SELECT doc_id, source,
             concat(CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'https' END,
                    '://',
                    CASE WHEN doc_id % 3 = 0
                         THEN upper(concat('cdn', CAST(doc_id % 500 % 10 AS VARCHAR), '.example.org'))
                         ELSE concat('cdn', CAST(doc_id % 500 % 10 AS VARCHAR), '.example.org') END,
                    '/a/', CAST(doc_id % 500 AS VARCHAR),
                    CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
                    CASE doc_id % 4
                      WHEN 0 THEN concat('?utm_source=x&id=', CAST(doc_id % 500 AS VARCHAR))
                      WHEN 1 THEN concat('?id=', CAST(doc_id % 500 AS VARCHAR), '&utm_campaign=y')
                      WHEN 2 THEN concat('?id=', CAST(doc_id % 500 AS VARCHAR))
                      ELSE concat('?id=', CAST(doc_id % 500 AS VARCHAR), '#top') END) AS url
      FROM documents
    ),
    canon AS (
      SELECT doc_id, source,
             concat('https://',
                    lower(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1)),
                    regexp_replace(regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1), '/+$', ''),
                    CASE WHEN array_to_string(list_sort(list_filter(
                             string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                             x -> NOT starts_with(x, 'utm_') AND x <> '')), '&') <> ''
                         THEN concat('?', array_to_string(list_sort(list_filter(
                             string_split(regexp_extract(url, '\\?([^#]*)', 1), '&'),
                             x -> NOT starts_with(x, 'utm_') AND x <> '')), '&'))
                         ELSE '' END) AS canonical_url
      FROM raw
    )
    SELECT canonical_url,
           CAST(COUNT(*) AS BIGINT) AS n_variants,
           MIN(doc_id) AS keep_doc,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
    FROM canon
    GROUP BY canonical_url
    ORDER BY canonical_url
    """,
    notes=(
        "URL canonicalization + dedup — the CommonCrawl-style curation "
        "step: normalize scheme to https, lowercase the host, strip the "
        "trailing slash, drop utm_* tracking params and fragments, sort "
        "the surviving query params, then group by the canonical form "
        "keeping the smallest doc_id. Noisy variants (http/https, host "
        "case, trailing slash, utm noise, fragment) are synthesized "
        "deterministically from doc_id; ~500 canonical groups. Spark "
        "decomposes with parse_url + filter/array_sort/array_join "
        "(JVM built-ins, map-side only until the final groupBy); the "
        "oracle re-derives with an independent regexp decomposition. "
        "Measured at sf0.1 (5k docs): ~1s Catalyst analysis of the "
        "wide concat/CASE expression + ~2.5s execution dominated by "
        "ParseUrlEvaluator init and job scheduling — fixed costs that "
        "amortize at scale, where the shape is one map pass + one "
        "shuffle on the canonical key"
    ),
)
def pipeline_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    base = (F.col("doc_id") % 500).cast("string")
    host = F.concat(F.lit("cdn"), ((F.col("doc_id") % 500) % 10).cast("string"),
                    F.lit(".example.org"))
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, "http").otherwise("https"),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.upper(host)).otherwise(host),
        F.lit("/a/"), base,
        F.when(F.col("doc_id") % 2 == 0, "/").otherwise(""),
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("?utm_source=x&id="), base))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("?id="), base, F.lit("&utm_campaign=y")))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("?id="), base))
        .otherwise(F.concat(F.lit("?id="), base, F.lit("#top"))),
    )
    from strake_spark.operators.urls import canonicalize_url

    raw = d.select("doc_id", "source", url.alias("url"))
    return (
        raw.select("doc_id", "source", canonicalize_url("url").alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.min("doc_id").alias("keep_doc"),
            F.countDistinct("source").alias("n_sources"),
        )
        .orderBy("canonical_url")
    )
