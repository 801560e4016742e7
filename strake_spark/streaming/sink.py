"""Exactly-once sharded parquet sink for streaming pipelines.

Spark's built-in file sink is exactly-once via its own transaction log,
but its layout is append-only part files: no stable shard structure, no
per-commit manifest a downstream trainer can consume, and consumers
must read Spark's private `_spark_metadata` log to know what is
committed. This sink gives the training-pipeline shape instead:

    out_dir/
      epoch=<batchId>/shard_id=<k>/*.parquet   (data)
      epoch=<batchId>/_MANIFEST.json           (commit marker + stats)

- **Sharding** uses the same deterministic md5 bucket as the batch
  ``pipeline_shard_manifest`` entry (no RNG state, resumable), written
  with ``partitionBy(shard_id)`` so each epoch lands as n_shards
  directories ready for per-shard consumption.
- **Exactly-once under replay**: foreachBatch's contract is that after
  a failure the SAME batchId is redelivered. Each epoch writes only
  inside its own ``epoch=<batchId>`` directory with mode=overwrite and
  the manifest is written last (tmp + atomic rename), so a replay
  rewrites the epoch byte-identically and a crash mid-write leaves no
  manifest — consumers treat manifest-less epochs as uncommitted.
- **Scale**: the manifest aggregate is one map-side-combinable groupBy
  collecting exactly n_shards rows to the driver; the data itself never
  leaves the executors.
"""

from __future__ import annotations

import json
import os
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shard_assignment(key_col: str, n_shards: int):
    """Deterministic shard id: md5(key) bucket — identical to the
    batch pipeline_shard_manifest entry so batch and streaming writers
    agree on placement. A NULL key deterministically lands in shard 0
    (md5(null) is null; without the coalesce such rows would write into
    a __HIVE_DEFAULT_PARTITION__ directory and poison the manifest
    build with a null shard id)."""
    return F.coalesce(
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % n_shards,
        F.lit(0),
    )


def shard_sink(
    out_dir: str, key_col: str, n_shards: int = 8
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function writing epoch=<batchId> sharded parquet +
    manifest. Idempotent under micro-batch replay (see module doc)."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        epoch_dir = os.path.join(out_dir, f"epoch={batch_id}")
        enriched = batch_df.withColumn(
            "shard_id", shard_assignment(key_col, n_shards)
        )
        enriched.write.mode("overwrite").partitionBy("shard_id").parquet(
            epoch_dir
        )
        # Manifest stats come from the FILES JUST WRITTEN, not from
        # recomputing the batch: re-running the batch plan would read
        # the source twice per epoch and — for any nondeterministic
        # expression upstream — could publish counts that disagree with
        # the data on disk. The read-back is a cheap metadata-driven
        # count over one epoch directory; n_shards rows -> driver; the
        # manifest is the commit marker so it is written AFTER the
        # data, atomically.
        spark = batch_df.sparkSession
        try:
            stats = (
                spark.read.parquet(epoch_dir)
                .groupBy("shard_id")
                .agg(F.count(F.lit(1)).alias("n_rows"))
                .collect()
            )
        except Exception as e:  # empty micro-batch: no parquet written
            from pyspark.errors import AnalysisException

            if not isinstance(e, AnalysisException):
                raise
            stats = []
        manifest = {
            "epoch": int(batch_id),
            "n_shards": n_shards,
            "key_col": key_col,
            "shards": {int(r["shard_id"]): int(r["n_rows"]) for r in stats},
            "n_rows": int(sum(r["n_rows"] for r in stats)),
        }
        tmp = os.path.join(epoch_dir, "_MANIFEST.json.tmp")
        final = os.path.join(epoch_dir, "_MANIFEST.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f, sort_keys=True)
        os.replace(tmp, final)  # atomic commit marker

    return write_batch


def write_stream_sharded(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_id",
    n_shards: int = 8,
    available_now: bool = True,
):
    """Start the sharded exactly-once sink; returns the StreamingQuery.
    ``available_now=True`` drains current input and stops (backfill
    mode); False runs continuously with the default trigger."""
    writer = (
        stream_df.writeStream.foreachBatch(shard_sink(out_dir, key_col, n_shards))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def committed_epochs(out_dir: str) -> dict[int, dict]:
    """Consumer-side view: epoch -> manifest for every COMMITTED epoch
    (manifest present); uncommitted/partial epoch dirs are ignored."""
    out: dict[int, dict] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("epoch="):
            continue
        mpath = os.path.join(out_dir, name, "_MANIFEST.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                man = json.load(f)
            out[int(man["epoch"])] = man
    return out
