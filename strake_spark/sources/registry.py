"""Source-type registry: maps a config ``type:`` string to a register
function, mirroring the reference's registry
(crates/connectors/src/sources/mod.rs:75-105: parquet/csv/json -> file,
iceberg -> iceberg_rest, plus sql/flight/rest/grpc providers).

A register function has signature ``fn(spark, source_cfg) -> list[str]``
and returns the fully-qualified view names it registered. Views are
namespaced ``<source>_<table>`` (Spark temp views are single-part; the
reference uses strake.<source>.<table>, crates/runtime/src/
federation.rs:176 + sources/sql/mod.rs:73-80).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession

from strake_spark.config import SourceConfig
from strake_spark.errors import SourceError

RegisterFn = Callable[[SparkSession, SourceConfig], list[str]]

SOURCE_TYPES: dict[str, RegisterFn] = {}


@dataclass(frozen=True)
class RemoteTable:
    """Provenance of a registered view that lives in an external SQL
    engine — the unit the federation planner groups by. ``dialect`` +
    ``url`` play the role of the reference's SQLExecutor
    ``compute_context`` (connection identity,
    crates/connectors/src/sources/sql/postgres_federation.rs:46-49).

    ``rebuild`` re-registers the view over a brand-new relation. Needed
    because Spark's PythonDataSourceV2 caches its read plan on the
    shared TableProvider instance and the filter-pushdown rule mutates
    it (setReadInfo) — a query WITHOUT filters reuses the previous
    query's pushed-filter read plan if the relation object is shared.
    The engine refreshes referenced remote views before local execution
    so every statement plans against a fresh provider."""

    source: str
    dialect: str
    url: str
    table: str
    rebuild: Callable[[SparkSession], None] | None = None
    # Executes one SQL statement INSIDE the remote engine, returning the
    # result as a DataFrame scan — the federation planner's vehicle for
    # whole-statement pushdown. None => this source can't push.
    push_query: Callable[[SparkSession, str], "object"] | None = None

    def context(self) -> str:
        return f"{self.dialect}://{self.url}"


# view name -> remote provenance (views without an entry are local files)
REMOTE_TABLES: dict[str, RemoteTable] = {}


def remember_remote(view: str, remote: RemoteTable) -> None:
    REMOTE_TABLES[view] = remote


def refresh_remote_views(spark: SparkSession, views=None) -> None:
    """Re-register the given remote views (default: all) over fresh
    relations, clearing any stale pushed-filter read plan."""
    names = list(REMOTE_TABLES) if views is None else [v for v in views if v in REMOTE_TABLES]
    for v in names:
        rb = REMOTE_TABLES[v].rebuild
        if rb is not None:
            rb(spark)


def source_type(*names: str):
    def deco(fn: RegisterFn) -> RegisterFn:
        for n in names:
            SOURCE_TYPES[n] = fn
        return fn

    return deco


def register_source(spark: SparkSession, cfg: SourceConfig) -> list[str]:
    try:
        fn = SOURCE_TYPES[cfg.type]
    except KeyError:
        raise SourceError(
            f"unknown source type {cfg.type!r} (known: {sorted(SOURCE_TYPES)})"
        ) from None
    return fn(spark, cfg)


# Populate the registry.
from strake_spark.sources import file as _file  # noqa: E402,F401

for _mod in ("duck", "sqlite", "jdbc", "rest", "flight", "iceberg", "grpc_source",
             "pgwire", "clickhouse_http", "mysqlwire", "iceberg_native", "xlsx",
             "avro_source", "github"):
    try:
        __import__(f"strake_spark.sources.{_mod}")
    except ModuleNotFoundError as e:  # pragma: no cover
        if e.name != f"strake_spark.sources.{_mod}":
            raise
