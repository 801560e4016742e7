"""Data-layout operators: clustered / partitioned parquet authoring.

At 100 TB the dominant query cost is how much of the lake a scan must
touch. Spark prunes in three tiers: hive partition directories
(partition pruning), parquet file/row-group min-max stats (file
skipping), and page indexes. These operators author layouts that make
those tiers effective:

- ``hive_partition_write``: directory partitioning for the coarse,
  low-cardinality dimension (date, source) — Catalyst prunes
  directories at plan time.
- ``zorder_write``: multi-column locality via a Z-order
  (bit-interleaved) clustering key — the public technique behind
  Delta's OPTIMIZE ZORDER BY (space-filling curve over bucketized
  columns), re-expressed with pure built-in expressions:
  min/max-bucketize each column (width_bucket, JVM-side), interleave
  the bucket bits into one long, repartitionByRange + sort on it,
  write. Range partitioning bounds file count deterministically; the
  per-file min/max envelope of EVERY clustered column tightens, so
  single- or multi-column predicates skip most files — a linear sort
  only tightens its leading column.
- ``file_skip_stats``: reads parquet footers (pyarrow) and reports how
  many files a [lo, hi] predicate on a column could skip — the
  verification hook for layout quality (tests assert Z-order beats
  linear sort on the non-leading column).

No Python runs per row anywhere; the layout key is whole-stage-codegen
arithmetic.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(bucket_cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of N bucket-id columns into one
    long: bit j of column c lands at position j*N + c. Locality in any
    input column maps to locality in the key."""
    n = len(bucket_cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key takes 1-4 columns")
    if bits * n > 62:
        raise ValueError("bits * n_cols must stay under 63")
    key = F.lit(0).cast("long")
    for c_idx, col in enumerate(bucket_cols):
        b = col.cast("long")
        for j in range(bits):
            bit = F.shiftright(b, j).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, j * n + c_idx))
    return key


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 64,
    bits: int = 10,
) -> dict:
    """Cluster ``df`` on a Z-order key over ``cols`` and write ~n_files
    parquet files. Columns are min/max-bucketized into 2^bits cells
    (one tiny agg collected to the driver — 2 scalars per column, the
    same bounded-collect class as approxQuantile). Returns the layout
    manifest {col: (min, max), n_files, bits}."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).first()
    buckets = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None or mx <= mn:
            buckets.append(F.lit(0))
        else:
            # width_bucket: 1..2^bits inside [mn, mx], but values AT the
            # max bound land in overflow bucket 2^bits+1 — clamp, or the
            # column's maxima interleave with all-zero low bits (i.e. as
            # minima) and poison every file's footer envelope
            buckets.append(
                F.least(
                    F.width_bucket(
                        F.col(c).cast("double"), F.lit(mn), F.lit(mx), F.lit(2**bits)
                    )
                    - 1,
                    F.lit(2**bits - 1),
                )
            )
    keyed = df.withColumn("__zkey", zorder_key(buckets, bits=bits))
    (
        keyed.repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    return {
        "cols": {c: (stats[f"mn_{c}"], stats[f"mx_{c}"]) for c in cols},
        "n_files": n_files,
        "bits": bits,
    }


def linear_write(df: DataFrame, path: str, col: str, n_files: int = 64) -> None:
    """Baseline layout: range-partition + sort on ONE column (what a
    naive 'sort by id and write' pipeline produces)."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def hive_partition_write(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Directory-partitioned parquet; Catalyst prunes partitions at
    plan time for predicates on ``partition_cols``."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def file_skip_stats(path: str, col: str, lo, hi) -> dict:
    """Footer-level skip report for predicate lo <= col <= hi: a file
    is skippable when its [min, max] for ``col`` misses the range.
    Driver-side footer reads only (no data pages) — at lake scale this
    is what the scan planner does per file."""
    import pyarrow.parquet as pq

    files = sorted(
        os.path.join(root, f)
        for root, _, names in os.walk(path)
        for f in names
        if f.endswith(".parquet")
    )
    total, skippable = 0, 0
    for fp in files:
        meta = pq.ParquetFile(fp).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        if col not in idx:
            continue
        total += 1
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                fmin = None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and (fmax < lo or fmin > hi):
            skippable += 1
    return {"files": total, "skippable": skippable}
