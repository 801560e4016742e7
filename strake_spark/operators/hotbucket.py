"""Gated hot-bucket drop — the one shared skew guard for every
bucket-keyed pairing operator (minhash LSH, cross-corpus minhash,
embedding LSH near-dup, semantic contamination).

Why it exists: every LSH-family operator buckets rows on a band key and
then pairs rows WITHIN each bucket. A degenerate bucket (boilerplate
text, a near-constant embedding corpus) turns that pairing quadratic —
size^2/2 candidate pairs through a Generate, or an unbounded np.stack
matrix inside an Arrow kernel — concentrated in ONE straggler task.
At 100 TB that is the difference between a job and an OOM. Dropping
over-cap buckets is the standard production tradeoff: members of a
dropped bucket still pair through their other bands, and truly
boilerplate content is exact-dedup'd upstream anyway.

Shape (identical at each call site, extracted r13 so a fourth copy
cannot drift from the other three):

1. GATE on a cheap total-row upper bound: no bucket can exceed the cap
   unless the total membership does (bucket size <= total rows), so for
   small inputs the whole pass is provably a no-op and is skipped.
   Callers pass the count of an ALREADY-CACHED upstream relation (the
   signature/profile cache every one of these operators keeps anyway),
   so the gate never re-evaluates a possibly-expensive derived input
   plan (r12 advice on the old eager ``docs.count()``).
2. COUNT pass over narrow bucket-key rows only — the shuffle carries
   (bucket key, partial count), never member ids or vectors.
3. Broadcast ANTI join removes over-cap buckets from each relation
   map-side, BEFORE any member list / Arrow batch materializes. The
   anti side is bounded by construction: only buckets exceeding the cap
   appear in it (each needs > cap colliding rows — rare by definition),
   so the broadcast stays tiny even when the corpus is not.

Reference parity note: the reference engine has no LSH family; this
guard is part of the beyond-reference training-data pipeline surface.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_hot_buckets(
    relations: Sequence[DataFrame],
    bucket_cols: Sequence[str],
    max_bucket_size: int,
    gate_rows: int,
) -> list[DataFrame]:
    """Remove over-cap buckets from each relation, counting bucket
    membership across ALL relations (a bucket hot on either side of a
    cross-corpus join floods it the same way).

    relations: DataFrames sharing ``bucket_cols``; each is returned
        anti-joined against the over-cap bucket set.
    bucket_cols: the bucket key columns, e.g. ("band", "band_key").
    max_bucket_size: buckets with total membership > this are dropped.
    gate_rows: cheap upper bound on total bucket membership (count of a
        cached upstream relation). If <= max_bucket_size the pass is a
        provable no-op and is skipped entirely.

    Returns the filtered relations in input order (same length).
    """
    if gate_rows <= max_bucket_size:
        return list(relations)
    cols = list(bucket_cols)
    narrow = [r.select(*cols) for r in relations]
    unioned = reduce(lambda a, b: a.unionAll(b), narrow)
    hot = (
        unioned.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_bucket_size)
        .select(*cols)
    )
    return [r.join(F.broadcast(hot), cols, "left_anti") for r in relations]
