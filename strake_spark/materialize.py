"""Background materialization — external sources into parquet caches.

Reference surface: the Enterprise Edition's "Background
Materialization: schedule and manage data materialization from external
sources into high-performance Parquet caches automatically"
(docs/enterprise.md:64-68). Spark-first re-expression:

- ``materialize(view)`` executes the view's CURRENT relation (for a
  remote view that is the connector scan — the copy streams through
  the source exactly once) into a VERSIONED parquet directory
  (``<base>/<view>/v000N``), then atomically repoints a CURRENT file
  and re-registers the view over the parquet. Readers only ever see a
  fully-written version — the pointer flips after the write commits
  (the same atomic-rename discipline as streaming/sink.py).
- While materialized, the view's REMOTE_TABLES entry is parked:
  federation pushdown must not route queries back to the origin the
  cache exists to protect. ``drop()`` restores the original relation
  and its pushdown entry.
- ``refresh()`` re-materializes from the ORIGINAL source relation
  (captured before the first swap) into the next version; old versions
  remain until ``prune()``.
- ``schedule(interval)`` runs refresh on a daemon timer loop —
  the "automatically" part; ``stop()`` cancels.

Scale stance: the copy itself is a distributed Spark write (the
source's own partitioning fans out); only the pointer bookkeeping is
driver-side. Version directories make refresh crash-safe: a torn write
never becomes CURRENT.
"""

from __future__ import annotations

import os
import threading

from strake_spark.errors import SourceError
from strake_spark.sources.registry import REMOTE_TABLES


class Materializer:
    def __init__(self, engine, base_dir: str):
        self.engine = engine
        self.base = base_dir
        os.makedirs(base_dir, exist_ok=True)
        # view -> (original DataFrame plan, parked RemoteTable | None)
        self._originals: dict[str, tuple] = {}
        self._timers: dict[str, threading.Timer] = {}
        self._lock = threading.Lock()

    # ------------------------------------------------------------- core
    def _view_dir(self, view: str) -> str:
        return os.path.join(self.base, view)

    def _current_path(self, view: str) -> str | None:
        cur = os.path.join(self._view_dir(view), "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return os.path.join(self._view_dir(view), f.read().strip())

    def _reserve_version(self, view: str) -> tuple[str, str]:
        """Allocate the next vNNNN and RESERVE it by creating the
        directory under the lock — a scheduled refresh racing a manual
        materialize of the same view must never pick the same directory
        and write into it concurrently (r8 advice). The mkdir is the
        reservation: once it exists, the next caller's listdir sees it
        and moves on."""
        d = self._view_dir(view)
        os.makedirs(d, exist_ok=True)
        with self._lock:
            while True:
                existing = [
                    int(n[1:]) for n in os.listdir(d)
                    if n.startswith("v") and n[1:].isdigit()
                ]
                version = f"v{(max(existing) + 1 if existing else 1):04d}"
                dest = os.path.join(d, version)
                try:
                    os.mkdir(dest)
                except FileExistsError:  # pragma: no cover - racer outside the lock
                    continue
                return version, dest

    def materialize(self, view: str, mode: str = "overwrite") -> dict:
        """Copy ``view`` into the next parquet version, flip CURRENT,
        re-register the view over the cache. Returns stats."""
        spark = self.engine.spark
        with self._lock:
            if view in self._originals:
                source_df = self._originals[view][0]
            else:
                source_df = spark.table(view)
        version, dest = self._reserve_version(view)
        source_df.write.mode(mode).parquet(dest)
        with self._lock:
            if view not in self._originals:
                # park the pushdown entry: queries must hit the cache,
                # not get federated back to the origin
                parked = REMOTE_TABLES.pop(view, None)
                self._originals[view] = (source_df, parked)
            tmp = os.path.join(self._view_dir(view), "CURRENT.tmp")
            with open(tmp, "w") as f:
                f.write(version)
            os.replace(tmp, os.path.join(self._view_dir(view), "CURRENT"))
        cached = spark.read.parquet(dest)
        cached.createOrReplaceTempView(view)
        n_files = sum(
            1 for f in os.listdir(dest) if f.endswith(".parquet")
        )
        return {"view": view, "version": version, "path": dest, "files": n_files}

    def refresh(self, view: str) -> dict:
        """Re-materialize from the original source relation."""
        if view not in self._originals:
            raise SourceError(f"{view!r} is not materialized (call materialize first)")
        return self.materialize(view)

    def drop(self, view: str) -> None:
        """Restore the original relation + its pushdown entry; cached
        parquet versions stay on disk until prune()."""
        with self._lock:
            entry = self._originals.pop(view, None)
            if entry is None:
                return
            source_df, parked = entry
            if parked is not None:
                REMOTE_TABLES[view] = parked
        source_df.createOrReplaceTempView(view)
        self.stop(view)

    def prune(self, view: str, keep: int = 1) -> list[str]:
        """Delete all but the newest ``keep`` versions; never the one
        CURRENT points at. Returns removed version names."""
        import shutil

        d = self._view_dir(view)
        if not os.path.isdir(d):
            return []
        current = os.path.basename(self._current_path(view) or "")
        versions = sorted(
            n for n in os.listdir(d) if n.startswith("v") and n[1:].isdigit()
        )
        victims = [v for v in versions[:-keep] if v != current] if keep else [
            v for v in versions if v != current
        ]
        for v in victims:
            shutil.rmtree(os.path.join(d, v), ignore_errors=True)
        return victims

    # -------------------------------------------------------- scheduling
    def schedule(self, view: str, interval_s: float) -> None:
        """Refresh ``view`` every ``interval_s`` seconds on a daemon
        timer (the reference's 'automatically'). Errors are swallowed
        per tick — a transient source outage must not kill the loop —
        and surface through engine metrics."""
        if view not in self._originals:
            self.materialize(view)

        def tick():
            try:
                self.refresh(view)
            except Exception:  # noqa: BLE001 - keep the loop alive
                self.engine._metrics["materialize_refresh_errors"] += 1
            with self._lock:
                if view in self._timers:  # not stopped meanwhile
                    t = threading.Timer(interval_s, tick)
                    t.daemon = True
                    self._timers[view] = t
                    t.start()

        with self._lock:
            old = self._timers.pop(view, None)
        if old is not None:
            old.cancel()
        t = threading.Timer(interval_s, tick)
        t.daemon = True
        with self._lock:
            self._timers[view] = t
        t.start()

    def stop(self, view: str | None = None) -> None:
        with self._lock:
            victims = (
                [view] if view is not None else list(self._timers)
            )
            timers = [self._timers.pop(v) for v in victims if v in self._timers]
        for t in timers:
            t.cancel()

    def status(self) -> dict:
        with self._lock:
            return {
                "materialized": sorted(self._originals),
                "scheduled": sorted(self._timers),
                "current": {
                    v: os.path.basename(self._current_path(v) or "")
                    for v in self._originals
                },
            }
