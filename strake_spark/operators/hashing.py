"""Portable deterministic hashing primitives.

Engine-native hash() functions differ between systems (Spark murmur3,
DuckDB its own), so every hash-derived operator (MinHash, SimHash,
fingerprints, LSH buckets) builds on md5, which every engine computes
identically. A 64-bit-ish integer is taken from the leading 15 hex chars
(60 bits, fits signed int64); a 32-bit value from the leading 8.

Spark:  conv(substr(md5(x),1,15),16,10)::bigint
DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT)

MinHash uses the classic universal-hash family h_k(x) = (a_k*x + b_k)
mod P over the 32-bit base hash: a_k*x < 2^52 so the product never
overflows int64 in either engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Prime just above 2^32 — modulus for the universal hash family.
MINHASH_P = 4_294_967_311


def h60(col: Column) -> Column:
    """60-bit integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h32(col: Column) -> Column:
    """32-bit integer hash of a string column (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def sql_h60(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def sql_h32(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 8) AS BIGINT)"


def minhash_params(k: int) -> tuple[int, int]:
    """Deterministic (a, b) for the k-th universal hash: odd multiplier,
    spread increment. Constants are arbitrary but fixed — both the Spark
    and the oracle side derive them from this single function."""
    a = 2 * k + 1
    b = 982_451_653 * (k + 1) % MINHASH_P
    return a, b


def minhash_expr(base: Column, k: int) -> Column:
    a, b = minhash_params(k)
    return (base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)


def sql_minhash_expr(base: str, k: int) -> str:
    a, b = minhash_params(k)
    return f"(({base}) * {a} + {b}) % {MINHASH_P}"


# Text normalization shared by shingling/tokenization: lowercase, strip
# non-alphanumerics to spaces, squeeze runs of spaces, trim. The same
# regex dialect subset works in Java regex (Spark) and RE2 (DuckDB).
def normalize_text(col: Column) -> Column:
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def sql_normalize_text(expr: str) -> str:
    return f"trim(regexp_replace(regexp_replace(lower({expr}), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
