"""User-isolated, TTL'd result cache.

Reference: crates/runtime/src/query/cache.rs — Parquet-on-disk result
cache keyed by SHA-256 of (plan repr, user id, sorted permissions) with
TTL + size-bounded LRU index, fail-open on errors (cache.rs:54-103,
42-50; policy at federation.rs:296-324).

Spark has no stable logical-plan hash, so the key fingerprints the
*optimized* plan string (normalized: expression IDs stripped) + user.
Values are stored as Arrow IPC files — cheap to write from and read to
the pyarrow boundary that ``StrakeEngine.execute`` serves.
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
import time

import pyarrow as pa
import pyarrow.feather as feather

from pyspark.sql import DataFrame

from strake_spark.config import CacheConfig

log = logging.getLogger("strake_spark.cache")

# Catalyst prints expression ids as name#123; they differ run-to-run for
# identical queries, so strip them from the fingerprint.
_EXPR_ID = re.compile(r"#\d+L?")


def plan_fingerprint(df: DataFrame, user: str | None, permissions: tuple[str, ...] = ()) -> str:
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    canon = _EXPR_ID.sub("#", plan)
    h = hashlib.sha256()
    h.update(canon.encode())
    h.update(f"\x00user={user or 'anonymous'}".encode())
    h.update(("\x00perms=" + ",".join(sorted(permissions))).encode())
    return h.hexdigest()


class ResultCache:
    def __init__(self, spark, config: CacheConfig) -> None:
        self.spark = spark
        self.config = config
        os.makedirs(config.directory, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.config.directory, f"{key}.arrow")

    def get(self, df: DataFrame, user: str | None) -> pa.Table | None:
        """Fail-open probe (cache.rs fail-open semantics)."""
        try:
            path = self._path(plan_fingerprint(df, user))
            if not os.path.exists(path):
                return None
            if time.time() - os.path.getmtime(path) > self.config.ttl_seconds:
                os.unlink(path)
                return None
            return feather.read_table(path)
        except Exception as e:  # pragma: no cover
            log.warning("cache get failed (ignored): %s", e)
            return None

    def put(self, df: DataFrame, user: str | None, table: pa.Table) -> None:
        try:
            self._evict_if_needed()
            feather.write_feather(table, self._path(plan_fingerprint(df, user)))
        except Exception as e:  # pragma: no cover
            log.warning("cache put failed (ignored): %s", e)

    def _evict_if_needed(self) -> None:
        """LRU by mtime when over the size budget (cache.rs:42-50)."""
        budget = self.config.max_mb * 1024 * 1024
        entries = []
        total = 0
        for name in os.listdir(self.config.directory):
            p = os.path.join(self.config.directory, name)
            try:
                st = os.stat(p)
            except OSError:
                continue
            entries.append((st.st_mtime, st.st_size, p))
            total += st.st_size
        entries.sort()
        while total > budget and entries:
            _, size, p = entries.pop(0)
            try:
                os.unlink(p)
                total -= size
            except OSError:
                break
