"""Loaders for the driver's synthetic TPC-H-ish tables (TESTDATA.md).

Every inventory query receives ``(spark, sf_dir)`` and reads parquet
lazily; Catalyst handles projection pruning + filter pushdown into the
scans, so loading "all" tables costs nothing until an action runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# parquet files confirmed (by footer probe) to carry TIMESTAMP(NANOS)
_NANOS_FILES: dict[str, bool] = {}


def _has_nanos_ts(path: str) -> bool:
    """Driver-side pyarrow footer probe: does any column store
    TIMESTAMP(NANOS)? Cheap (no Spark job, one footer read), cached."""
    hit = _NANOS_FILES.get(path)
    if hit is None:
        try:
            import pyarrow.parquet as pq

            # Probe the PARQUET schema, not the arrow view of it: pyarrow
            # surfaces legacy INT96 timestamps as timestamp[ns] too, but
            # INT96 is readable as TimestampType directly — only physical
            # INT64 + logical TIMESTAMP(NANOS) needs the nanosAsLong path.
            sch = pq.read_metadata(path).schema
            hit = any(
                sch.column(i).physical_type == "INT64"
                and "timeUnit=nanoseconds" in str(sch.column(i).logical_type)
                for i in range(len(sch))
            )
            _NANOS_FILES[path] = hit  # only successful probes are cached:
            # a transient failure (file not yet written, import hiccup)
            # must not pin False for the process lifetime — the next call
            # re-probes.
        except Exception:
            return False
    return hit


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _has_nanos_ts(path):
        # events.ts is parquet TIMESTAMP(NANOS), which a vanilla Spark
        # session refuses to read (PARQUET_TYPE_ILLEGAL). The legacy conf
        # is runtime-settable, so set it here rather than relying on the
        # session having been built by session.build_session — any caller
        # (including a driver harness with its own session) can read the
        # table. Spark then surfaces ts as raw int64 nanos; integer-divide
        # to micros (floor — same truncation DuckDB applies when casting
        # nanos to its us timestamps) and restore a proper timestamp column.
        #
        # Scope: the conf is session-global and stays set for the session
        # (restoring it after the lazy read would flip the plan's own
        # execution); the footer probe above means it is only ever touched
        # when a nanos file is actually being read. Limitation documented
        # in README.md: other nanos parquet read in the same session will
        # also surface as int64.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # Micros parquet (no isAdjustedToUTC) infers as TIMESTAMP_NTZ
            # under inferTimestampNTZ. Normalize to TIMESTAMP once here so
            # downstream arithmetic (cast-to-long gap math, window frames)
            # works uniformly; session tz is pinned UTC (session.py:57) so
            # the wall-clock values are preserved bit-for-bit.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the synthetic tables as temp views for spark.sql queries."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
