"""Incremental rollup maintenance (continuous-aggregate pattern).

The hypertable/continuous-aggregate idea from time-series engines: a
day-level rollup of an append-mostly event stream should NOT be
recomputed from 100 TB of history when a late batch lands — only the
time buckets the batch touches get refreshed, by merging mergeable
partial aggregates (sum-of-sums, sum-of-counts; derived metrics like
avg computed at read time).

Mechanics:

1. aggregate the late batch into the same partial shape (one small
   shuffle over the batch only);
2. broadcast-semi/anti-join the existing rollup on the touched bucket
   keys (the touched set is tiny — days, not rows);
3. union untouched rollup rows with the re-merged touched rows.

Cost is O(|batch| + |rollup rows in touched buckets|), independent of
history size. Partials stay exact: counts are longs, sums are DECIMAL
(associative, order-independent — the repo-wide discipline from
inventory/_util.py), so an incremental maintenance pass produces
BIT-IDENTICAL results to a full recompute; the inventory entry's
oracle exploits exactly that (oracle = full GROUP BY over all events).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUM_T = "decimal(25,6)"


def rollup_events(events: DataFrame, keys: Sequence[str], value_col: str = "value") -> DataFrame:
    """Partial-aggregate shape: (keys..., n_events, total_value[decimal])."""
    return events.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(_SUM_T)).cast(_SUM_T).alias("total_value"),
    )


def merge_rollups(base: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge two partial rollups: untouched base rows pass through; rows
    for keys present in ``delta`` re-merge by summing partials.

    No distinct() on the touched-key set (r9): a rollup is one row per
    key by construction (rollup_events groups on exactly these keys),
    so deduplicating again only added a shuffle; the broadcast hash
    build and the anti/semi probes are key-dup-insensitive anyway."""
    touched = delta.select(*keys)
    untouched = base.join(F.broadcast(touched), list(keys), "left_anti")
    merged = (
        base.join(F.broadcast(touched), list(keys), "left_semi")
        .unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").cast(_SUM_T).alias("total_value"),
        )
    )
    return untouched.unionByName(merged)


def incremental_rollup(
    base_events: DataFrame,
    late_events: DataFrame,
    keys: Sequence[str],
    value_col: str = "value",
    persist: bool = True,
) -> DataFrame:
    """Rollup of base ∪ late via incremental maintenance (never re-scans
    base_events beyond the initial rollup build).

    ``persist`` caches both partial rollups (MEMORY_AND_DISK):
    merge_rollups consumes each side twice (touched/anti + semi/union),
    so without the cache each side's SOURCE is scanned and aggregated
    twice — against the whole point of incremental maintenance. The
    cached relations are rollup-sized (one row per bucket), not
    event-sized. In production the base rollup is a stored table and
    its cache is a no-op read; pass False to manage storage yourself.
    Caches back the returned lazy DataFrame and so outlive this call —
    long-lived engines should clearCache() between batches (r8 advice)."""
    base_r = rollup_events(base_events, keys, value_col)
    late_r = rollup_events(late_events, keys, value_col)
    if persist:
        from pyspark import StorageLevel

        base_r = base_r.persist(StorageLevel.MEMORY_AND_DISK)
        late_r = late_r.persist(StorageLevel.MEMORY_AND_DISK)
    return merge_rollups(base_r, late_r, keys)
