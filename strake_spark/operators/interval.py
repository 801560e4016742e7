"""Range (interval) join — points joined to intervals at scale.

Spark plans a raw inequality join (``r.start <= l.t AND l.t <= r.end``)
as BroadcastNestedLoopJoin — O(n*m) and a guaranteed driver OOM once
neither side broadcasts. The scale path is the standard bucketed
rewrite:

1. pick a bucket width W (≈ the typical interval length),
2. each point lands in bucket floor(t / W) — one row,
3. each interval explodes to every bucket it overlaps
   (floor(start/W) .. floor(end/W)),
4. equi-join on (keys…, bucket) — a plain shuffled hash join — then
   re-check the exact range predicate.

Each (point, interval) pair meets in exactly ONE bucket (the point's),
so no dedup is needed. Cost: shuffle of points + intervals×(avg
buckets-per-interval), instead of the cross product. Intervals much
longer than W explode into more rows — callers tune W to the data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    interval_start: str,
    interval_end: str,
    on: Sequence[str] = (),
    bucket_width: int = 3600,
    how: str = "inner",
    time_unit_expr=None,
) -> DataFrame:
    """Join point rows to every interval row whose
    [interval_start, interval_end] contains the point's time (bounds
    inclusive), optionally also matching equi-keys ``on``.

    ``bucket_width`` is in the time unit produced by
    ``time_unit_expr`` (default: epoch seconds via unix_timestamp for
    timestamp columns)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    unit = time_unit_expr or (lambda c: F.unix_timestamp(F.col(c)))
    on = list(on)

    p_bucket = F.floor(unit(point_time) / bucket_width)
    pts = points.withColumn("__bucket", p_bucket)

    s_bucket = F.floor(unit(interval_start) / bucket_width)
    e_bucket = F.floor(unit(interval_end) / bucket_width)
    ivs = intervals.withColumn(
        "__bucket", F.explode(F.sequence(s_bucket, e_bucket))
    )

    cond = pts["__bucket"] == ivs["__bucket"]
    for k in on:
        cond = cond & (pts[k] == ivs[k])
    cond = (
        cond
        & (pts[point_time] >= ivs[interval_start])
        & (pts[point_time] <= ivs[interval_end])
    )
    iv_cols = [c for c in intervals.columns if c not in on]
    joined = pts.join(ivs, cond, how).select(
        *[pts[c] for c in points.columns],
        *[ivs[c] for c in iv_cols],
    )
    return joined
