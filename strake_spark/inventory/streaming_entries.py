"""Streaming operators surfaced through the driver contract: each entry
drains a Structured Streaming query (availableNow trigger) over the
events table and returns the final result as a batch DataFrame.

The tumbling-window aggregate has an exact DuckDB oracle
(time_bucket); sessionization has no ANSI equivalent (session_window
is data-driven) and is a rows-only check.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from strake_spark.inventory import query
from strake_spark.inventory._util import sql_dec


def _stream_dir(sf_dir: str) -> str:
    """File-stream sources read directories; expose the single
    events.parquet through a temp dir symlink (testdata stays
    untouched)."""
    d = tempfile.mkdtemp(prefix="strake-stream-src-")
    os.symlink(
        os.path.abspath(os.path.join(sf_dir, "events.parquet")),
        os.path.join(d, "events.parquet"),
    )
    return d


@query(
    "stream_tumbling_event_counts",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts)                   AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n,
           CAST(SUM({sql_dec('value', 'DECIMAL(18,6)')}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 3
    """,
    notes="Structured Streaming tumbling window drained with availableNow; equals the batch/SQL window aggregate",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.streaming import read_event_stream, tumbling_counts
    from strake_spark.streaming.ops import run_to_completion

    stream = tumbling_counts(
        read_event_stream(spark, _stream_dir(sf_dir), nanos_ts=True), window="1 hour"
    )
    out = run_to_completion(stream, tempfile.mkdtemp(prefix="strake-inv-stream-"))
    return out.orderBy("window_start", "event_type")


@query(
    "stream_sessionization",
    tags=("rows_only",),
    notes="session_window (data-driven gaps) has no ANSI-SQL equivalent; driver records a rows-only check",
)
def stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.streaming import read_event_stream, session_counts
    from strake_spark.streaming.ops import run_to_completion

    stream = session_counts(
        read_event_stream(spark, _stream_dir(sf_dir), nanos_ts=True), gap="30 minutes"
    )
    out = run_to_completion(stream, tempfile.mkdtemp(prefix="strake-inv-sess-"))
    return out.orderBy("user_id", "session_start")
