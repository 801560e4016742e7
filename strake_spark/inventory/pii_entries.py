"""PII scrub inventory entry: synthesize PII-bearing text from the
documents table deterministically, then detect + redact. The oracle
applies the identical RE2/Java-compatible patterns in DuckDB."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.data import table
from strake_spark.inventory import query
from strake_spark.operators.pii import PII_RULES, flags, scrub

# deterministic augmentation: every 3rd doc gets an email, every 5th a
# dashed SSN, built from the doc_id so both engines see identical text
_AUG_SQL = """
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 3 = 0
                       THEN ' contact user' || doc_id || '@example.com'
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               AS text
      FROM documents
"""


@query(
    "pii_detect_and_scrub",
    oracle=f"""
    WITH aug AS ({_AUG_SQL})
    SELECT doc_id,
           regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}') AS has_email,
           regexp_matches(text, '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}') AS has_ssn,
           length(regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
             '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '[SSN]', 'g')) AS scrubbed_len
    FROM aug
    ORDER BY doc_id
    """,
    notes="PII detect + redact as codegen'd regexp expressions (map-only at any scale); deterministic synthetic PII so both engines scrub identical text",
)
def pii_scrub_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"),
                         F.lit("@example.com")),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(F.lit(" ssn 123-45-"),
                         F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
            ).otherwise(""),
        ).alias("text"),
    )
    rules = {"email": PII_RULES["email"], "ssn": PII_RULES["ssn"]}
    return aug.select(
        "doc_id",
        *flags("text", rules),
        F.length(scrub("text", rules)).cast("bigint").alias("scrubbed_len"),
    ).orderBy("doc_id")
