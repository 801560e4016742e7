"""PII detection & scrubbing over text columns.

Reference surface: README.md:29 security bullet + result-set PII
scrubbing listed in SURVEY §0(5); the reference scans result sets
driver-side. Re-expressed Spark-first: detection/redaction are
column-level ``regexp_replace`` / ``regexp`` expressions — JVM-side,
whole-stage-codegen'd, so scrubbing 100 TB of documents is a map-only
pass with zero shuffles and no Python in the loop.

Patterns use syntax common to Java regex (Spark) and RE2 (DuckDB /
most engines): no backrefs, no lookaround — so the same rule set runs
as an oracle anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> (pattern, replacement)
PII_RULES: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (
        r"\+?[0-9]{1,3}[-. (]{0,2}[0-9]{3}[-. )]{0,2}[0-9]{3}[-. ]?[0-9]{4}",
        "[PHONE]",
    ),
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    "credit_card": (r"[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}", "[CARD]"),
    "ipv4": (
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "[IP]",
    ),
}


def scrub(col: Column | str, rules: dict[str, tuple[str, str]] | None = None) -> Column:
    """Redact every configured PII pattern in a string column. Rule
    order matters (SSN before phone: a dashed SSN also matches loose
    phone shapes)."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, repl in (rules or PII_RULES).values():
        c = F.regexp_replace(c, pattern, repl)
    return c


def flags(col: Column | str, rules: dict[str, tuple[str, str]] | None = None) -> list[Column]:
    """One boolean detector column per rule (``has_<name>``)."""
    c = F.col(col) if isinstance(col, str) else col
    return [
        c.rlike(pattern).alias(f"has_{name}")
        for name, (pattern, _) in (rules or PII_RULES).items()
    ]


def scrub_frame(
    df: DataFrame, columns: list[str], rules: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Redact PII in the given string columns, preserving all others."""
    out = df
    for name in columns:
        out = out.withColumn(name, scrub(name, rules))
    return out
