"""Structured Streaming operators — beyond-reference extension.

The reference has NO streaming subsystem (SURVEY §2.6: no watermarks,
stateful operators, or incremental execution anywhere in its crates;
its "streams" are pull-based batch iterators). This package is the
Spark-native extension of the engine to unbounded data: the same
operator inventory semantics (windows, sessionization, dedup) expressed
over `readStream` sources with event-time watermarks, so a 100 TB/day
event feed runs on the identical engine instead of a separate system.

Everything here is built-in Structured Streaming machinery — watermark
+ windowed aggregation state lives in the state store (RocksDB on a
real cluster), scales with executors, and recovers from checkpoints.
"""

from strake_spark.streaming.ops import (  # noqa: F401
    dedup_stream,
    enrich_with_dim,
    hopping_counts,
    read_event_stream,
    session_counts,
    stream_funnel,
    tumbling_counts,
    user_running_totals,
    view_purchase_join,
)
from strake_spark.streaming.rollup_sink import (  # noqa: F401
    current_rollup,
    rollup_sink,
    write_stream_rollup,
)
