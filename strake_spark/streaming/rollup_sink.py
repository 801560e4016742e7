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
directory, and the pointer is committed last via atomic rename, so:

- redelivery of a batch the pointer already reflects is a NO-OP (its
  fold is durably committed; the committed directory is never touched
  again — no delete-then-rewrite window for readers or a second
  crash);
- a crash BEFORE the pointer rename leaves ``_CURRENT`` at the
  previous version; the orphan ``v=N`` is invisible and is simply
  overwritten when batch N is redelivered.

Superseded versions are garbage-collected after each commit (only the
committed version and its replay base are retained), so state storage
is bounded at ~2x the rollup size, not the stream's lifetime. Batch
ids are monotonic PER CHECKPOINT: the state dir must always be paired
with its checkpoint dir (wiping the checkpoint while keeping state
would re-fold history).

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
        if ptr is not None and batch_id <= ptr["version"]:
            # replay of a batch the pointer already reflects: the fold
            # is durably committed (the pointer renames only AFTER a
            # complete v= write), so redelivery is a no-op — never
            # touch the committed directory the pointer points at.
            # (batch ids are monotonic per checkpoint; a batch id below
            # the committed version means the state dir is paired with
            # its checkpoint dir, see module doc.)
            return
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
        _gc_versions(out_dir, keep={batch_id, base_version})

    return write_batch


def _gc_versions(out_dir: str, keep: set) -> None:
    """Drop superseded v=* directories (best-effort): only the committed
    version and its replay base are ever needed."""
    import shutil

    for name in os.listdir(out_dir):
        if not name.startswith("v="):
            continue
        try:
            vid = int(name[2:])
        except ValueError:
            continue
        if vid not in keep:
            shutil.rmtree(os.path.join(out_dir, name), ignore_errors=True)


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
