"""Continuously-maintained rollup over a stream (foreachBatch +
operators/rollup.merge_rollups).

The streaming face of the continuous-aggregate pattern: every
micro-batch folds into a persisted day/key-level rollup using
MERGEABLE partials (count + DECIMAL sum), touching only the buckets
the batch contains. State layout:

    out_dir/
      v=<batchId>/*.parquet      full rollup state AFTER merging batch
      _CURRENT.json              {"version": N, "prev": M}  (tmp+rename)

Exactly-once under replay: foreachBatch redelivers the SAME batchId
after a failure. Each version writes only inside its own ``v=<id>``
directory (overwrite), and the pointer is committed last via atomic
rename. On redelivery of batch N the sink reads the state from
``prev`` — never from a half-committed ``v=N`` — so a replayed merge
is computed from the same base and lands byte-identically; a crash
before the pointer rename leaves ``_CURRENT`` at the previous
version, making the orphan ``v=N`` invisible to consumers.

Scale: the persisted state is the ROLLUP (one row per key-bucket), not
the event history; each commit rewrites it once. At extreme key
cardinality, shard the state by key range and merge only touched
shards — the merge operator already confines work to touched keys.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _pointer_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_CURRENT.json")


def read_pointer(out_dir: str) -> dict | None:
    try:
        with open(_pointer_path(out_dir)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def current_rollup(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The committed rollup state, or None before the first commit."""
    ptr = read_pointer(out_dir)
    if ptr is None:
        return None
    return spark.read.parquet(os.path.join(out_dir, f"v={ptr['version']}"))


def rollup_sink(
    out_dir: str,
    keys: Sequence[str],
    value_col: str = "value",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function maintaining the rollup state. The batch
    DataFrame must already carry the key columns (pre-derive e.g.
    ``day`` upstream with to_date)."""
    from strake_spark.operators.rollup import merge_rollups, rollup_events

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        os.makedirs(out_dir, exist_ok=True)
        ptr = read_pointer(out_dir)
        if ptr is not None and ptr["version"] == batch_id:
            # replay of the batch the pointer already reflects: merge
            # from the PREVIOUS state so the fold is not applied twice
            base_version = ptr.get("prev")
        else:
            base_version = ptr["version"] if ptr is not None else None
        delta = rollup_events(batch_df, keys, value_col)
        if base_version is None:
            state = delta
        else:
            base = spark.read.parquet(os.path.join(out_dir, f"v={base_version}"))
            state = merge_rollups(base, delta, keys)
        # state reads v=<base>; writing v=<batch_id> never overlaps it
        # (batch_id is strictly newer), so no read-overwrite hazard
        state.write.mode("overwrite").parquet(os.path.join(out_dir, f"v={batch_id}"))
        tmp = _pointer_path(out_dir) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": batch_id, "prev": base_version}, fh)
        os.replace(tmp, _pointer_path(out_dir))

    return write_batch


def write_stream_rollup(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str],
    value_col: str = "value",
):
    """Attach the rollup sink with availableNow drain semantics."""
    return (
        stream_df.writeStream.foreachBatch(rollup_sink(out_dir, keys, value_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
