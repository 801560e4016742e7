"""Text analysis operators: language ID, quality scoring, token
counting, document fingerprinting.

All pure column expressions (JVM-side, codegen'd, zero Python in the
hot path) and all reproducible by a SQL oracle — deliberate, since at
100 TB these run over every document and a Python UDF here would
dominate the pipeline cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from strake_spark.operators.hashing import h60, normalize_text, sql_h60, sql_normalize_text

# Tiny stopword lists per language — a deterministic n-gram/stopword
# heuristic, not a model. Order defines the tie-break priority.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es": ("el", "la", "de", "los", "las", "y", "es", "que", "un", "en"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
    "zh": ("de", "shi", "le", "zai", "he", "you", "wo", "ta", "men", "zhe"),
}


def _tokens_col(text: Column) -> Column:
    return F.split(normalize_text(text), " ")


def _stopword_hits(tokens: Column, lang: str) -> Column:
    """Distinct stopwords of ``lang`` present in the token set."""
    wordlist = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(tokens, wordlist))


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predicted language = argmax of distinct-stopword hits, ties broken
    by the fixed language order (first wins)."""
    toks = docs.select(F.col(id_col), _tokens_col(F.col(text_col)).alias("w"))
    scored = toks.select(
        F.col(id_col),
        *[_stopword_hits(F.col("w"), lang).alias(f"s_{lang}") for lang in STOPWORDS],
    )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"s_{lang}") for lang in langs])
    pred = F.lit("unknown")
    for lang in reversed(langs):  # build CASE chain so earlier langs win ties
        pred = F.when((F.col(f"s_{lang}") == best) & (best > 0), lang).otherwise(pred)
    return scored.select(
        F.col(id_col), pred.alias("pred_lang"), best.cast("int").alias("score")
    )


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Heuristic quality features + a composite score in [0,1]-ish:
    length band, mean token length band, stopword ratio, alpha ratio.
    ``keep`` passes extra source columns through the same single scan —
    scoring is row-wise, so composing pipelines can avoid a join-back
    (and the second scan it would cost) entirely."""
    t = F.col(text_col)
    toks = _tokens_col(t)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(toks).cast("double")
    mean_tok_len = (
        F.length(F.array_join(toks, "")).cast("double") / F.greatest(n_tokens, F.lit(1.0))
    )
    en_hits = F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS["en"]])))
    stop_ratio = en_hits.cast("double") / F.greatest(n_tokens, F.lit(1.0))
    alpha_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z]", "")).cast("double")
    alpha_ratio = alpha_chars / F.greatest(n_chars, F.lit(1.0))
    score = (
        F.when((n_chars >= 100) & (n_chars <= 5000), 0.25).otherwise(0.0)
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 0.25).otherwise(0.0)
        + stop_ratio * 0.25
        + alpha_ratio * 0.25
    )
    return docs.select(
        F.col(id_col),
        *[F.col(c) for c in keep],
        n_chars.alias("n_chars_measured"),
        n_tokens.alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        stop_ratio.alias("stopword_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        score.alias("quality"),
    )


def token_count(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (alnum runs and
    4-char chunks: ceil(len/4) per run, a common pre-tokenizer proxy)."""
    t = F.col(text_col)
    norm = normalize_text(t)
    ws_tokens = F.size(F.split(norm, " "))
    alnum_runs = F.regexp_count(F.lower(t), F.lit("[a-z0-9]+"))
    alnum_chars = F.length(F.regexp_replace(F.lower(t), "[^a-z0-9]", ""))
    bpe_estimate = F.ceil(alnum_chars.cast("double") / 4.0).cast("long")
    return docs.select(
        F.col(id_col),
        ws_tokens.cast("long").alias("ws_tokens"),
        alnum_runs.cast("long").alias("alnum_runs"),
        bpe_estimate.alias("bpe_estimate"),
    )


def fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", width: int = 8
) -> DataFrame:
    """Winnowing-style rolling fingerprint: min/max 60-bit hash over
    ``width``-char shingles of the normalized text (the min-hash pair is
    a compact, order-insensitive content signature)."""
    norm = docs.select(F.col(id_col), normalize_text(F.col(text_col)).alias("t"))
    shingles = (
        norm.filter(F.length("t") >= width)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(1), F.length("t") - (width - 1))).alias("i"),
            F.col("t"),
        )
        .select(F.col(id_col), h60(F.col("t").substr(F.col("i"), F.lit(width))).alias("h"))
    )
    return shingles.groupBy(id_col).agg(
        F.min("h").alias("fp_min"), F.max("h").alias("fp_max"), F.count(F.lit(1)).alias("n_shingles")
    )


# ----------------------------------------------------- oracle SQL builders


def sql_language_id(doc_table: str = "documents") -> str:
    norm = sql_normalize_text("text")
    score_cols = ", ".join(
        f"len(list_intersect(w, {list(ws)!r})) AS s_{lang}".replace("'", "'")
        for lang, ws in ((l, list(STOPWORDS[l])) for l in STOPWORDS)
    )
    langs = list(STOPWORDS)
    best = f"greatest({', '.join(f's_{l}' for l in langs)})"
    pred = "'unknown'"
    for lang in reversed(langs):
        pred = f"CASE WHEN s_{lang} = best AND best > 0 THEN '{lang}' ELSE {pred} END"
    return f"""
    WITH toks AS (SELECT doc_id, str_split({norm}, ' ') AS w FROM {doc_table}),
    scored AS (SELECT doc_id, {score_cols} FROM toks),
    withbest AS (SELECT *, {best} AS best FROM scored)
    SELECT doc_id, {pred} AS pred_lang, CAST(best AS INTEGER) AS score
    FROM withbest
    """


def sql_quality_score(doc_table: str = "documents") -> str:
    norm = sql_normalize_text("text")
    en = list(STOPWORDS["en"])
    return f"""
    WITH base AS (
        SELECT doc_id, text,
               str_split({norm}, ' ') AS w,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) AS alpha_chars
        FROM {doc_table}),
    feat AS (
        SELECT doc_id, n_chars,
               CAST(len(w) AS DOUBLE) AS n_tokens,
               CAST(length(array_to_string(w, '')) AS DOUBLE)
                   / greatest(CAST(len(w) AS DOUBLE), 1.0) AS mean_token_len,
               CAST(len(list_intersect(w, {en!r})) AS DOUBLE)
                   / greatest(CAST(len(w) AS DOUBLE), 1.0) AS stopword_ratio,
               alpha_chars / greatest(n_chars, 1.0) AS alpha_ratio
        FROM base)
    SELECT doc_id,
           n_chars AS n_chars_measured, n_tokens, mean_token_len, stopword_ratio, alpha_ratio,
           (CASE WHEN n_chars >= 100 AND n_chars <= 5000 THEN 0.25 ELSE 0.0 END
            + CASE WHEN mean_token_len >= 3 AND mean_token_len <= 10 THEN 0.25 ELSE 0.0 END
            + stopword_ratio * 0.25 + alpha_ratio * 0.25) AS quality
    FROM feat
    """


def sql_token_count(doc_table: str = "documents") -> str:
    norm = sql_normalize_text("text")
    return f"""
    SELECT doc_id,
           CAST(len(str_split({norm}, ' ')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS alnum_runs,
           CAST(ceil(CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_estimate
    FROM {doc_table}
    """


def sql_fingerprint(doc_table: str = "documents", width: int = 8) -> str:
    norm = sql_normalize_text("text")
    return f"""
    WITH n AS (SELECT doc_id, {norm} AS t FROM {doc_table}),
    sh AS (
        SELECT doc_id, {sql_h60(f"substr(t, CAST(i AS INTEGER), {width})")} AS h
        FROM n, LATERAL unnest(generate_series(1, length(t) - {width - 1})) AS s(i)
        WHERE length(t) >= {width})
    SELECT doc_id, MIN(h) AS fp_min, MAX(h) AS fp_max, COUNT(*) AS n_shingles
    FROM sh GROUP BY doc_id
    """
