"""As-of (temporal) join — a custom operator Spark lacks natively.

The brief's canonical "operator the engine should add": for each left
row, attach the most recent right row at-or-before its timestamp within
the same key (backward direction; "forward" = earliest at-or-after;
"nearest" = whichever of the two is closer in time, ties to backward).

Spark-first composition (no Pandas UDF, no per-key loop):

1. union the two sides on (keys, time) with the right side's carried
   columns packed into ONE struct (so a NULL inside a carried column
   can't be confused with "no match"),
2. one window per key ordered by (time, side-marker):
   ``last(struct, ignorenulls=True)`` over unbounded-preceding..current
   fills each left row with the latest right struct — right rows sort
   before left rows at equal time, making the match inclusive,
3. keep left rows, unpack the struct.

Cost at scale: exactly ONE shuffle on the keys (the window), same as
the groupBy it generalizes — vs the naive range-join (l.t >= r.t)
which is O(n*m) per key. This is the standard distributed as-of
technique (union + last-known-value).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: Column | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``right_cols`` defaults to right's non-key,
    non-time columns; matched values appear as ``<col><suffix>``.
    ``tolerance`` (a Column interval/number) drops matches further than
    that from the left time."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be 'backward', 'forward' or 'nearest'")
    on = list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in on and c != right_time]
    right_cols = list(right_cols)

    payload = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_cols]
    )
    r2 = right.select(
        *on,
        F.col(right_time).alias("__time"),
        F.lit(0).alias("__side"),
        payload.alias("__payload"),
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l2 = left.select(
        *on,
        F.col(left_time).alias("__time"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r2.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    both = r2.unionByName(l2)

    w_back = (
        Window.partitionBy(*on)
        .orderBy(F.col("__time").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*on)
        .orderBy(F.col("__time").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fill_back = F.last("__payload", ignorenulls=True).over(w_back)
    fill_fwd = F.last("__payload", ignorenulls=True).over(w_fwd)

    if direction == "backward":
        out = both.withColumn("__match", fill_back)
    elif direction == "forward":
        out = both.withColumn("__match", fill_fwd)
    else:
        # nearest: both fills share one hash partitioning (two sorts, ONE
        # shuffle); pick the closer match, ties to the at-or-before side.
        # Distance compares in an EXACT domain — unix_micros for
        # timestamps (a double cast has ~0.5us ulp at current epochs,
        # enough to flip an exact tie), the native numeric otherwise.
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(both.schema["__time"].dataType, (TimestampType, TimestampNTZType)):
            def _key(c: Column) -> Column:
                return F.unix_micros(c)
        else:
            def _key(c: Column) -> Column:
                return c
        out = both.withColumn("__b", fill_back).withColumn("__f", fill_fwd)
        d_back = _key(F.col("__time")) - _key(F.col("__b.__t"))
        d_fwd = _key(F.col("__f.__t")) - _key(F.col("__time"))
        out = out.withColumn(
            "__match",
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(d_back <= d_fwd, F.col("__b"))
            .otherwise(F.col("__f")),
        ).drop("__b", "__f")
    out = out.filter(F.col("__side") == 1)
    if tolerance is not None:
        if direction == "backward":
            delta = F.col("__time") - F.col("__match.__t")
        elif direction == "forward":
            delta = F.col("__match.__t") - F.col("__time")
        else:
            # abs() in the column's NATIVE type (interval for timestamps,
            # numeric otherwise) so one tolerance value works across all
            # three directions
            delta = F.when(
                F.col("__match.__t") <= F.col("__time"),
                F.col("__time") - F.col("__match.__t"),
            ).otherwise(F.col("__match.__t") - F.col("__time"))
        out = out.withColumn(
            "__match", F.when(delta <= tolerance, F.col("__match"))
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__match.__t").alias(f"{right_time}{suffix}"),
        *[F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
