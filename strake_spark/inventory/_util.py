"""Shared helpers for inventory queries.

Decimal discipline: the synthetic tables store money/quantity as DOUBLE.
Summing doubles is order-dependent, and Spark's summation order depends
on partitioning — so a distributed sum and the single-threaded DuckDB
oracle would disagree in the low bits. We therefore cast measures to
DECIMAL before aggregating (exact, associative, order-independent) and
cast the *final* aggregate back to DOUBLE. Both engines perform the
double→decimal cast on identical input bits with round-half-up, so the
results match exactly.

Precision choices keep every intermediate within 38 digits in BOTH
engines' type-derivation rules (Spark: p1+p2+1/s1+s2 for multiply;
DuckDB: w1+w2/s1+s2):
  measure  DECIMAL(15,4)   (price/quantity)
  rate     DECIMAL(9,6)    (discount/tax, values in [0,1])
  (1-rate)           -> (10,6)
  (1-d)*(1+t)        -> (21,12)
  measure*(21,12)    -> (37,16)  [Spark]  / (36,16) [DuckDB] — exact
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MEASURE = "decimal(15,4)"
RATE = "decimal(9,6)"


def dec(col: str | Column, typ: str = MEASURE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one_minus(col: str) -> Column:
    return F.lit(1).cast(RATE) - F.col(col).cast(RATE)


def one_plus(col: str) -> Column:
    return F.lit(1).cast(RATE) + F.col(col).cast(RATE)


def dsum(col: Column, alias: str) -> Column:
    """Exact decimal sum surfaced as DOUBLE."""
    return F.sum(col).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent average: exact decimal sum / count, in DOUBLE."""
    return (F.sum(col).cast("double") / F.count(F.lit(1))).alias(alias)


# DuckDB-side SQL fragments. Widths differ from the Spark side on
# purpose: DuckDB multiplies decimals in the operands' *storage* type
# (int64 for width <= 18), so width-19 casts force int128 arithmetic;
# the per-engine intermediates differ in declared type but both are
# exact, so the final DOUBLE values agree bit-for-bit.
SQL_MEASURE = "DECIMAL(19,4)"
SQL_RATE = "DECIMAL(19,6)"


def sql_dec(col: str, typ: str = SQL_MEASURE) -> str:
    return f"CAST({col} AS {typ})"


def sql_one_minus(col: str) -> str:
    # re-cast to width 19: subtraction widens to (20,6), and a later
    # multiply by another width-20 operand would exceed DuckDB's 38 cap.
    return f"CAST(CAST(1 AS {SQL_RATE}) - CAST({col} AS {SQL_RATE}) AS {SQL_RATE})"


def sql_one_plus(col: str) -> str:
    return f"CAST(CAST(1 AS {SQL_RATE}) + CAST({col} AS {SQL_RATE}) AS {SQL_RATE})"


def sql_rate_product(a: str, b: str) -> str:
    """(1±x)*(1±y) capped back to DECIMAL(19,12): exact (value < 2) and
    keeps a following measure multiply within DuckDB's 38-digit cap."""
    return f"CAST({a} * {b} AS DECIMAL(19,12))"
