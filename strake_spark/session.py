"""SparkSession construction tuned for the engine.

The reference pins deterministic local parallelism (target_partitions=4,
crates/runtime/src/federation.rs:187-189) and relies on DataFusion's
vectorized execution with spill-to-disk (federation.rs:199-221). In Spark
those roles are played by shuffle partitioning + AQE and Tungsten's
spillable operators; we tune the knobs that matter at both local test
scale and cluster scale:

- AQE on (runtime coalescing, skew-join splitting, plan re-optimization):
  at 100 TB the static shuffle partition count is always wrong; AQE fixes
  it from runtime statistics.
- shuffle.partitions default = local core count for tests; on a real
  cluster this should be ~2-3x total executor cores (callers override).
- Arrow transfer on for the Python boundary (the reference is zero-copy
  Arrow end-to-end, docs/python-api.md:110-122).
- Session timezone pinned to UTC so results compare bit-for-bit against
  UTC-naive engines (DuckDB oracle, and most warehouse sources).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    """Local worker thread count: $SPARK_GRAFT_CPUS, else all cores."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def build_session(
    app_name: str = "strake-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
    enable_ui: bool = False,
    nanos_as_long: bool = True,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a cluster, pass ``master=None`` with externally-managed
    spark-submit conf; locally we default to ``local[$SPARK_GRAFT_CPUS]``.

    ``nanos_as_long`` is the session-build opt-in for parquet
    TIMESTAMP(NANOS) columns (events.ts layouts): read them as raw
    int64 nanos (data.table() and read_event_stream convert to micros
    timestamps). It must be decided at build time — streaming
    micro-batches consult the live conf at every trigger, so
    read_event_stream refuses to flip it mid-session (see its
    docstring). Pass False to keep strict PARQUET_TYPE_ILLEGAL
    behavior on nanos columns.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")

    conf: dict[str, str] = {
        # --- planner / runtime adaptivity (scale-critical) ---
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        # --- correctness-affecting session state ---
        "spark.sql.session.timeZone": "UTC",
        # --- python boundary: Arrow batches, not pickled rows ---
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # NOTE: spark.sql.python.filterPushdown deliberately left OFF.
        # PythonDataSourceV2 caches one read plan per shared provider and
        # the pushdown rule mutates it, so two scans of one relation with
        # different filters (self-join; filtered-then-unfiltered temp
        # view) read each other's data. Our connectors instead rely on
        # whole-statement federation pushdown (plans/federation.py).
        # --- local-mode hygiene ---
        "spark.ui.enabled": "true" if enable_ui else "false",
        # managed tables (bucketed layouts) land in tmp, not the repo
        "spark.sql.warehouse.dir": os.environ.get(
            "SPARK_GRAFT_WAREHOUSE", "/tmp/strake-spark-warehouse"
        ),
        "spark.sql.parquet.filterPushdown": "true",
        # Parquet TIMESTAMP(NANOS) columns (events.ts) are read as raw
        # int64 nanos; data.table() converts them to micros timestamps.
        # Session-BUILD opt-in (see docstring): streams cannot flip this
        # mid-session without a session-wide side effect.
        "spark.sql.legacy.parquet.nanosAsLong": "true" if nanos_as_long else "false",
        # broadcast threshold: dims like region/nation/customer are tiny
        # relative to fact tables; raise from 10MB so Catalyst broadcasts
        # them even at larger SF (at 100 TB the dims stay broadcastable).
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    }
    if driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        conf["spark.driver.memory"] = driver_memory or os.environ["SPARK_GRAFT_DRIVER_MEM"]
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
