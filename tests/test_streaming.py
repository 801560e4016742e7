"""Structured Streaming operators: each streaming result must equal the
equivalent batch computation over the same files (availableNow drain)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from strake_spark.streaming import (
    dedup_stream,
    hopping_counts,
    read_event_stream,
    session_counts,
    tumbling_counts,
    user_running_totals,
)
from strake_spark.streaming.ops import run_to_completion
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """The events table split into multiple parquet files (so the file
    stream sees several input units)."""
    from strake_spark.data import table

    out = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(out)
    # drop spark's _SUCCESS marker; the file stream reads *.parquet
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            os.remove(os.path.join(out, f))
    return out


def _batch(spark, events_dir):
    return spark.read.parquet(events_dir)


class TestTumbling:
    def test_matches_batch_windows(self, spark, events_dir, tmp_path):
        stream = tumbling_counts(read_event_stream(spark, events_dir), "1 hour")
        got = run_to_completion(stream, str(tmp_path)).toPandas()
        exp = (
            _batch(spark, events_dir)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "total_value",
            )
            .toPandas()
        )
        key = ["window_start", "event_type"]
        got_s = got.sort_values(key).reset_index(drop=True)
        exp_s = exp.sort_values(key).reset_index(drop=True)
        assert len(got_s) == len(exp_s) > 0
        assert (got_s["n"].to_numpy() == exp_s["n"].to_numpy()).all()
        assert abs(got_s["total_value"].to_numpy() - exp_s["total_value"].to_numpy()).max() == 0.0


class TestHopping:
    def test_matches_batch_hopping_windows(self, spark, events_dir, tmp_path):
        stream = hopping_counts(
            read_event_stream(spark, events_dir), "30 minutes", "15 minutes"
        )
        got = run_to_completion(stream, str(tmp_path)).toPandas()
        exp = (
            _batch(spark, events_dir)
            .groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "event_type", "n", "total_value",
            )
            .toPandas()
        )
        key = ["window_start", "event_type"]
        got_s = got.sort_values(key).reset_index(drop=True)
        exp_s = exp.sort_values(key).reset_index(drop=True)
        assert len(got_s) == len(exp_s) > 0
        # every event must appear in exactly 2 windows: sum(n) == 2 * rows
        assert got_s["n"].sum() == 2 * _batch(spark, events_dir).count()
        assert (got_s["n"].to_numpy() == exp_s["n"].to_numpy()).all()
        assert abs(got_s["total_value"].to_numpy() - exp_s["total_value"].to_numpy()).max() == 0.0


class TestSessionization:
    def test_session_totals_match_batch(self, spark, events_dir, tmp_path):
        stream = session_counts(read_event_stream(spark, events_dir), gap="30 minutes")
        got = run_to_completion(stream, str(tmp_path)).toPandas()
        exp = (
            _batch(spark, events_dir)
            .groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .toPandas()
        )
        assert got["n_events"].sum() == exp["n_events"].sum()
        assert len(got) == len(exp) > 0


class TestDedup:
    def test_duplicate_event_ids_collapse(self, spark, events_dir, tmp_path):
        dup_dir = str(tmp_path / "dup")
        os.makedirs(dup_dir)
        for f in os.listdir(events_dir):
            shutil.copy(os.path.join(events_dir, f), dup_dir)
            # duplicate every file once under a new name
            shutil.copy(os.path.join(events_dir, f), os.path.join(dup_dir, "dup_" + f))
        stream = dedup_stream(read_event_stream(spark, dup_dir))
        got = run_to_completion(stream, str(tmp_path / "chk"))
        n_unique = _batch(spark, events_dir).select("event_id").distinct().count()
        assert got.count() == n_unique


class TestCustomStateful:
    def test_running_totals_match_batch(self, spark, events_dir, tmp_path):
        stream = user_running_totals(read_event_stream(spark, events_dir))
        got = run_to_completion(stream, str(tmp_path), output_mode="update").toPandas()
        # the memory sink keeps every update; the LAST row per user is
        # the final running total
        final = got.groupby("user_id").last().reset_index()
        exp = (
            _batch(spark, events_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .toPandas()
        )
        merged = final.merge(exp, on="user_id", suffixes=("_got", "_exp"))
        assert len(merged) == len(exp) > 0
        assert (merged["n_got"] == merged["n_exp"]).all()


class TestStreamStreamJoin:
    def test_symmetric_hash_join_planned(self, spark, events_dir, tmp_path):
        """The interval join must plan as StreamingSymmetricHashJoin
        (both sides stateful, watermark-evicted) and match the batch
        range join exactly."""
        from strake_spark.streaming.ops import view_purchase_join

        views = read_event_stream(spark, events_dir).filter(
            F.col("event_type") == "view"
        )
        purchases = read_event_stream(spark, events_dir).filter(
            F.col("event_type") == "purchase"
        )
        stream = view_purchase_join(views, purchases, window="1 hour")
        got = run_to_completion(
            stream, str(tmp_path / "chk"), output_mode="append"
        )
        e = _batch(spark, events_dir)
        v = e.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
        )
        p = e.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        exp = v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        assert got.count() == exp.count() > 0


class TestShardedSink:
    """Exactly-once sharded parquet sink (streaming/sink.py)."""

    def _run(self, spark, events_dir, out, ckpt):
        from strake_spark.streaming.ops import read_event_stream
        from strake_spark.streaming.sink import write_stream_sharded

        q = write_stream_sharded(
            read_event_stream(spark, events_dir, max_files_per_trigger=2),
            out, ckpt, key_col="event_id", n_shards=4,
        )
        q.awaitTermination(120)
        return q

    def test_all_rows_land_once_across_epochs(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.sink import committed_epochs

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, events_dir, out, ckpt)
        epochs = committed_epochs(out)
        assert len(epochs) >= 2  # maxFilesPerTrigger=2 over 4 files
        total = sum(m["n_rows"] for m in epochs.values())
        expected = spark.read.parquet(events_dir).count()
        assert total == expected
        # data readable with epoch/shard partition columns; counts match
        df = spark.read.option("basePath", out).parquet(out + "/epoch=*")
        assert df.count() == expected
        assert set(df.select("shard_id").distinct().toPandas()["shard_id"]) <= {0, 1, 2, 3}
        # manifests agree with the files
        per_shard = {
            (int(r["epoch"]), int(r["shard_id"])): int(r["n"])
            for r in df.groupBy("epoch", "shard_id").count()
                       .withColumnRenamed("count", "n").collect()
        }
        for e, man in epochs.items():
            for sid, n in man["shards"].items():
                assert per_shard[(e, int(sid))] == n

    def test_replay_is_idempotent(self, spark, events_dir, tmp_path):
        """Re-delivering a batchId (the post-failure contract) rewrites
        the epoch identically — no duplicates, manifest unchanged."""
        from strake_spark.streaming.sink import committed_epochs, shard_sink

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, events_dir, out, ckpt)
        before = committed_epochs(out)
        replay_epoch = min(before)
        # replay: same rows, same batch id
        # reconstruct the delivered rows by reading the committed epoch
        # back; localCheckpoint detaches lineage from the very files the
        # replay overwrites (a real replay re-delivers source rows)
        batch = (
            spark.read.option("basePath", out)
            .parquet(f"{out}/epoch={replay_epoch}")
            .drop("epoch", "shard_id")
            .localCheckpoint()
        )
        shard_sink(out, "event_id", 4)(batch, replay_epoch)
        after = committed_epochs(out)
        assert after == before

    def test_restart_with_same_checkpoint_writes_nothing_new(
        self, spark, events_dir, tmp_path
    ):
        from strake_spark.streaming.sink import committed_epochs

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, events_dir, out, ckpt)
        first = committed_epochs(out)
        self._run(spark, events_dir, out, ckpt)  # same checkpoint: no-op
        assert committed_epochs(out) == first

    def test_uncommitted_epoch_ignored_by_consumers(self, spark, events_dir, tmp_path):
        import os as _os

        from strake_spark.streaming.sink import committed_epochs

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._run(spark, events_dir, out, ckpt)
        n = len(committed_epochs(out))
        # a crashed write: epoch dir without manifest
        _os.makedirs(_os.path.join(out, "epoch=999", "shard_id=0"))
        assert len(committed_epochs(out)) == n

    def test_null_shard_key_lands_in_shard_zero(self, spark, tmp_path):
        """md5(null) is null; without coalesce the row would write into
        __HIVE_DEFAULT_PARTITION__ and poison the manifest build."""
        from strake_spark.streaming.sink import committed_epochs, shard_sink

        out = str(tmp_path / "out")
        df = spark.createDataFrame(
            [(None, "a"), (7, "b")], "event_id long, v string"
        )
        shard_sink(out, "event_id", 4)(df, 0)
        man = committed_epochs(out)[0]
        assert man["n_rows"] == 2
        back = spark.read.option("basePath", out).parquet(out + "/epoch=*")
        assert back.filter("v = 'a'").select("shard_id").collect()[0][0] == 0


class TestRollupSink:
    """Continuously-maintained rollup state (streaming/rollup_sink.py):
    after draining the stream, the persisted rollup must equal the
    batch rollup of all events; replays must not double-count."""

    def _drive(self, spark, events_dir, out, ckpt, max_files=2):
        from strake_spark.streaming.ops import read_event_stream
        from strake_spark.streaming.rollup_sink import write_stream_rollup

        stream = read_event_stream(
            spark, events_dir, max_files_per_trigger=max_files
        ).withColumn("day", F.to_date("ts"))
        q = write_stream_rollup(
            stream, out, ckpt, keys=["day", "event_type"]
        )
        q.awaitTermination(120)

    def _expected(self, spark, events_dir):
        from strake_spark.operators.rollup import rollup_events

        ev = spark.read.parquet(events_dir).withColumn("day", F.to_date("ts"))
        return {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in rollup_events(ev, ["day", "event_type"]).collect()
        }

    def test_final_state_equals_batch_rollup(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.rollup_sink import current_rollup, read_pointer

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drive(spark, events_dir, out, ckpt)
        ptr = read_pointer(out)
        assert ptr is not None and ptr["version"] >= 1  # several merges ran
        got = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in current_rollup(spark, out).collect()
        }
        assert got == self._expected(spark, events_dir)

    def test_replay_of_committed_batch_is_idempotent(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.rollup_sink import (
            current_rollup,
            read_pointer,
            rollup_sink,
        )

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        self._drive(spark, events_dir, out, ckpt)
        ptr = read_pointer(out)
        # replay the LAST batch: approximate its rows as state(version) -
        # state(prev) cannot be reconstructed, so replay an EMPTY batch
        # under the same id after pointing the fold at prev — the guard
        # must read from prev, not from the already-merged version
        last = ptr["version"]
        before = self._expected(spark, events_dir)
        # rebuild the delivered batch exactly: all events not yet merged
        # at prev cannot be identified generically, so drive a synthetic
        # one-batch stream instead: state0 = full merge in one batch
        out2, _ = str(tmp_path / "out2"), None
        ev = spark.read.parquet(events_dir).withColumn("day", F.to_date("ts"))
        sink = rollup_sink(out2, ["day", "event_type"])
        sink(ev, 0)
        first = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in current_rollup(spark, out2).collect()
        }
        assert first == before
        sink(ev.localCheckpoint(), 0)  # replay same batch id
        again = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in current_rollup(spark, out2).collect()
        }
        assert again == before  # no double-count

    def test_crash_before_pointer_leaves_previous_state(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.rollup_sink import current_rollup, rollup_sink

        out = str(tmp_path / "out3")
        ev = spark.read.parquet(events_dir).withColumn("day", F.to_date("ts"))
        half = ev.filter(F.col("event_id") % 2 == 0)
        sink = rollup_sink(out, ["day", "event_type"])
        sink(half, 0)
        committed = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in current_rollup(spark, out).collect()
        }
        # simulate a crash: v=1 written but pointer never updated
        rest = ev.filter(F.col("event_id") % 2 == 1)
        from strake_spark.operators.rollup import rollup_events

        rollup_events(rest, ["day", "event_type"]).write.mode("overwrite").parquet(
            out + "/v=1"
        )
        got = {
            (r.day, r.event_type): (r.n_events, r.total_value)
            for r in current_rollup(spark, out).collect()
        }
        assert got == committed  # orphan v=1 invisible


class TestRollupSinkDurability:
    def test_gc_bounds_versions(self, spark, events_dir, tmp_path):
        import os

        from strake_spark.streaming.ops import read_event_stream
        from strake_spark.streaming.rollup_sink import write_stream_rollup

        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = read_event_stream(
            spark, events_dir, max_files_per_trigger=1
        ).withColumn("day", F.to_date("ts"))
        q = write_stream_rollup(stream, out, ckpt, keys=["day", "event_type"])
        q.awaitTermination(120)
        versions = [d for d in os.listdir(out) if d.startswith("v=")]
        assert len(versions) <= 2  # committed + replay base only

    def test_replay_never_touches_committed_dir(self, spark, events_dir, tmp_path):
        import os

        from strake_spark.streaming.rollup_sink import read_pointer, rollup_sink

        out = str(tmp_path / "out2")
        ev = spark.read.parquet(events_dir).withColumn("day", F.to_date("ts"))
        sink = rollup_sink(out, ["day", "event_type"])
        sink(ev, 3)
        ptr = read_pointer(out)
        vdir = os.path.join(out, f"v={ptr['version']}")
        mtimes = {f: os.path.getmtime(os.path.join(vdir, f)) for f in os.listdir(vdir)}
        sink(ev.localCheckpoint(), 3)  # replay committed batch: no-op
        after = {f: os.path.getmtime(os.path.join(vdir, f)) for f in os.listdir(vdir)}
        assert after == mtimes
        sink(ev.localCheckpoint(), 1)  # stale batch id: also a no-op
        assert read_pointer(out)["version"] == 3


class TestStreamStaticEnrichment:
    def test_enrichment_matches_batch(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.ops import enrich_with_dim, read_event_stream, run_to_completion

        dim = spark.createDataFrame(
            [(i, f"segment_{i % 3}") for i in range(200)], "user_id long, segment string"
        )
        stream = enrich_with_dim(
            read_event_stream(spark, events_dir), dim, on="user_id"
        ).groupBy("segment").count()
        got = {
            (r.segment, r["count"])
            for r in run_to_completion(stream, str(tmp_path), output_mode="complete").collect()
        }
        exp = {
            (r.segment, r["count"])
            for r in spark.read.parquet(events_dir)
            .join(dim, "user_id", "left")
            .groupBy("segment")
            .count()
            .collect()
        }
        assert got == exp


class TestRocksDBStateStore:
    """The claimed production state backend must actually run: the same
    sessionization pipeline, with the state store switched to RocksDB
    (what a real cluster uses for 100 TB-scale streaming state), must
    produce the same results as the default HDFS-backed provider."""

    def test_sessionization_under_rocksdb(self, spark, events_dir, tmp_path):
        from strake_spark.streaming.ops import read_event_stream, run_to_completion, session_counts

        key = "spark.sql.streaming.stateStore.providerClass"
        prev = spark.conf.get(key, None)
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        try:
            stream = session_counts(read_event_stream(spark, events_dir), gap="30 minutes")
            got = run_to_completion(stream, str(tmp_path)).toPandas()
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        baseline = session_counts(
            read_event_stream(spark, events_dir), gap="30 minutes"
        )
        exp = run_to_completion(baseline, str(tmp_path / "b")).toPandas()
        key_cols = [c for c in got.columns]
        a = got.sort_values(key_cols).reset_index(drop=True)
        b = exp.sort_values(key_cols).reset_index(drop=True)
        assert a.equals(b)


class TestNanosSessionOptIn:
    """nanosAsLong is a SESSION-BUILD decision (r7 verdict carry): a
    nanos-layout stream in a session built without the conf must refuse
    loudly instead of silently flipping session-wide behavior."""

    @pytest.fixture()
    def nanos_dir(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        t = pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000, 1_700_000_100_000_000_000],
                           pa.timestamp("ns")),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "purchase"]),
            "value": pa.array([1.0, 2.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        })
        out = tmp_path / "nanos_events"
        out.mkdir()
        pq.write_table(t, out / "part-0.parquet")
        return str(out)

    def test_refuses_mid_session_flip_and_leaves_batch_reads_alone(
        self, spark, nanos_dir, events_dir
    ):
        from strake_spark.streaming.ops import read_event_stream

        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        try:
            with pytest.raises(RuntimeError, match="nanos_as_long"):
                read_event_stream(spark, nanos_dir)
            # the refusal did NOT flip the conf ...
            assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
            # ... and a later batch parquet read (micros layout) is
            # completely unaffected
            assert spark.read.parquet(events_dir).count() > 0
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def test_explicit_flip_still_available_and_warns(self, spark, nanos_dir):
        from strake_spark.streaming.ops import read_event_stream

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        try:
            with pytest.warns(UserWarning, match="session-wide"):
                stream = read_event_stream(spark, nanos_dir, allow_session_flip=True)
            assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
            rows = run_to_completion(stream, str(nanos_dir) + "_chk1").collect()
            assert len(rows) == 2
            assert {r.event_type for r in rows} == {"view", "purchase"}
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def test_opted_in_session_needs_no_flip(self, spark, nanos_dir):
        from strake_spark.streaming.ops import read_event_stream

        # the shared session is build_session-made: conf already true,
        # so the nanos stream reads without errors or warnings
        stream = read_event_stream(spark, nanos_dir)
        rows = run_to_completion(stream, str(nanos_dir) + "_chk2").collect()
        assert len(rows) == 2


class TestStreamFunnel:
    def test_single_batch_replay_matches_batch_funnel(self, spark, events_dir, tmp_path):
        """availableNow over the whole directory = one micro-batch, so
        the stateful funnel is EXACT: equal to funnel_two_step."""
        from strake_spark.operators.relational import funnel_two_step
        from strake_spark.streaming.ops import stream_funnel

        stream = stream_funnel(read_event_stream(spark, events_dir))
        got = (
            run_to_completion(stream, str(tmp_path), output_mode="update")
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        want = (
            funnel_two_step(_batch(spark, events_dir))
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        from tests.conftest import compare_frames

        compare_frames(got, want)

    def test_fold_validates_purchases_across_chunk_order(self):
        """r19 regression (advice finding): a purchase in an EARLIER
        pandas chunk must be judged against the signup first seen in a
        LATER chunk of the same micro-batch. chunk1 purchases {5,10},
        chunk2 signup 7 -> first_purchase must be 10 (the old one-pass
        fold kept only the overall min, 5, and emitted converted=false
        forever)."""
        import pandas as pd

        from strake_spark.streaming.ops import _funnel_fold

        def chunk(rows):
            return pd.DataFrame(rows, columns=["event_type", "ts"])

        signup, valid, overall = _funnel_fold(
            None,
            iter(
                [
                    chunk([("purchase", 5), ("purchase", 10)]),
                    chunk([("signup", 7)]),
                ]
            ),
            "signup",
            "purchase",
        )
        assert (signup, valid, overall) == (7, 10, 5)

    def test_fold_chunk_order_invariance(self):
        """Within one batch the fold must be a function of the row SET,
        not the chunk partitioning/order: every chunking of the same
        rows yields the same state."""
        import itertools

        import pandas as pd

        from strake_spark.streaming.ops import _funnel_fold

        rows = [
            ("purchase", 5),
            ("purchase", 10),
            ("signup", 7),
            ("purchase", 8),
            ("signup", 9),
        ]
        expected = (7, 8, 5)
        for perm in itertools.permutations(rows):
            for cut in range(1, len(perm)):
                chunks = [
                    pd.DataFrame(list(perm[:cut]), columns=["event_type", "ts"]),
                    pd.DataFrame(list(perm[cut:]), columns=["event_type", "ts"]),
                ]
                assert (
                    _funnel_fold(None, iter(chunks), "signup", "purchase")
                    == expected
                ), (perm, cut)

    def test_single_batch_replay_exact_with_tiny_arrow_chunks(
        self, spark, events_dir, tmp_path
    ):
        """Drive the real stateful operator with maxRecordsPerBatch=3 so
        every group's batch spans many Arrow chunks — the single-batch
        exactness contract must hold regardless of chunking."""
        from strake_spark.operators.relational import funnel_two_step
        from strake_spark.streaming.ops import stream_funnel

        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key)
        spark.conf.set(key, "3")
        try:
            stream = stream_funnel(read_event_stream(spark, events_dir))
            got = (
                run_to_completion(stream, str(tmp_path), output_mode="update")
                .toPandas()
                .sort_values("user_id")
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set(key, old)
        want = (
            funnel_two_step(_batch(spark, events_dir))
            .toPandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        from tests.conftest import compare_frames

        compare_frames(got, want)

    def test_multi_batch_replay_upholds_state_invariants(
        self, spark, events_dir, tmp_path
    ):
        """One file per micro-batch: every emitted row must be a sound
        running state — signup is the running minimum (never below the
        final batch minimum), and every claimed conversion names a REAL
        purchase of that user at/after the row's signup, never earlier
        than the true first. (Exact cross-batch equality is not the
        one-pass contract — see the operator docstring.)"""
        from pyspark.sql import functions as F

        from strake_spark.streaming.ops import stream_funnel

        stream = stream_funnel(
            read_event_stream(spark, events_dir, max_files_per_trigger=1)
        )
        rows = run_to_completion(
            stream, str(tmp_path), output_mode="update"
        ).toPandas()
        assert len(rows)  # the synthetic corpus has signups
        batch = _batch(spark, events_dir).toPandas()
        signups = batch[batch.event_type == "signup"].groupby("user_id").ts.min()
        purchases = batch[batch.event_type == "purchase"]
        for r in rows.itertuples():
            assert r.signup_ts >= signups[r.user_id]
            if r.converted:
                mine = purchases[purchases.user_id == r.user_id].ts
                assert (mine == r.first_purchase_ts).any()
                assert r.first_purchase_ts >= r.signup_ts
                true_first = mine[mine >= signups[r.user_id]].min()
                assert r.first_purchase_ts >= true_first
