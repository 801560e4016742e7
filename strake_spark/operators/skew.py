"""Skew mitigation: salted joins and bucketed co-located joins.

The brief's scale checklist names both:

- ``salted_join``: when a join key is heavily skewed (one customer with
  10^8 orders), the hash partition owning the hot key becomes the
  straggler. Salting splits each hot key into N sub-keys: the large
  side gets a deterministic salt hash(row)%N appended to its key; the
  small side is replicated N times (one copy per salt). The join result
  is identical; the hot key's rows now spread over N partitions.
  AQE's skew-join handles sort-merge cases adaptively at runtime —
  salting is the explicit, plan-stable form that also covers aggregate
  skew and works when AQE can't split (e.g. bucketed inputs).

- ``write_bucketed`` / ``bucketed_join_ready``: pre-shuffling both
  fact tables into the same bucket layout (saveAsTable with bucketBy)
  makes every future equi-join on the bucket key shuffle-free — the
  amortize-once pattern for repeatedly-joined 100 TB tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread over ``num_salts``
    partitions. ``small`` is replicated num_salts× (keep it the smaller
    side); result columns = large's + small's non-key columns."""
    salt_l = F.pmod(F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(num_salts))
    l2 = large.withColumn("__salt", salt_l)
    s2 = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = l2.join(s2, [on, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by the join key —
    subsequent equi-joins between tables sharing this layout plan with
    NO Exchange on either side."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)
