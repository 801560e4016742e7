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


# the remaining three rule families (phone / credit card / IPv4),
# synthesized deterministically like _AUG_SQL above
_AUG2_SQL = """
      SELECT doc_id,
             text
               || CASE WHEN doc_id % 2 = 0
                       THEN ' call +1 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                            || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 3 = 0
                       THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       ELSE '' END
               || CASE WHEN doc_id % 5 = 0
                       THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                       ELSE '' END
               AS text
      FROM documents
"""

_P_PHONE = r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{4}"
_P_CARD = r"[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}"
_P_IP = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


@query(
    "pii_rule_matrix",
    oracle=f"""
    WITH aug AS ({_AUG2_SQL})
    SELECT doc_id,
           regexp_matches(text, '{_P_PHONE}') AS has_phone,
           regexp_matches(text, '{_P_CARD}')  AS has_credit_card,
           regexp_matches(text, '{_P_IP}')    AS has_ipv4,
           length(regexp_replace(
             regexp_replace(
               regexp_replace(text, '{_P_PHONE}', '[PHONE]', 'g'),
               '{_P_CARD}', '[CARD]', 'g'),
             '{_P_IP}', '[IP]', 'g')) AS scrubbed_len
    FROM aug
    ORDER BY doc_id
    """,
    notes=(
        "the remaining PII rule families (phone / credit card / IPv4 — "
        "pii_detect_and_scrub covers email+SSN), detection flags plus "
        "the chained redaction length, applied in the operator's "
        "declared rule order. Patterns are the RE2-and-Java-compatible "
        "subset, so the identical strings run on both engines; PII is "
        "synthesized deterministically from doc_id"
    ),
)
def pii_rule_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(
                    F.lit(" call +1 555-"),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" card 4111-1111-1111-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit("."),
                    ((F.col("doc_id") * 7) % 256).cast("string"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    rules = {
        "phone": PII_RULES["phone"],
        "credit_card": PII_RULES["credit_card"],
        "ipv4": PII_RULES["ipv4"],
    }
    return aug.select(
        "doc_id",
        *flags("text", rules),
        F.length(scrub("text", rules)).cast("bigint").alias("scrubbed_len"),
    ).orderBy("doc_id")
