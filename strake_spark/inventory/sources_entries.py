"""Source roundtrip entries: jar-free protocol clients proven inside
the DRIVER's own harness, not only in pytest (r18 — verdict task #3).

Each entry reads the current sf_dir's ``nation`` table through a real
source path — the SigV4 executor-parallel S3 reader, the SharedKey
Azure spool, the rowid-range-partitioned SQLite DataSource, the
paginated REST DataSource — and the oracle is the plain SQL read of
the same table. A protocol bug anywhere (signing, listing, ranged
GETs, pagination, type mapping) surfaces as a row/hash mismatch.

The object-store endpoints are in-process signature-VERIFYING fakes
(strake_spark.inventory._fakes) on 127.0.0.1, cached per sf_dir and
kept alive for the process (Spark scans are lazy — the driver collects
after the entry returns). SQLite needs no server: the entry builds a
content-keyed database file once per sf_dir.

Reference parity: these cover the read paths of
crates/connectors/src/sources/file.rs:124-207 (object stores) and
sources/sql/sqlite.rs / rest.rs at the driver-green evidence level.
"""

from __future__ import annotations

import hashlib
import os
import sqlite3
import tempfile
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from strake_spark.inventory import query
from strake_spark.inventory import _fakes

_NATION_ORACLE = """
    SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
           n_name,
           CAST(n_regionkey AS BIGINT) AS n_regionkey
    FROM nation
    ORDER BY n_nationkey
"""


def _nation_select(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("bigint").alias("n_regionkey"),
    ).orderBy("n_nationkey")


@query(
    "source_s3_distributed_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "jar-free SigV4 S3 read through the EXECUTOR-PARALLEL mapInArrow "
        "reader (sources/s3http.read_s3_parquet_distributed) against an "
        "in-process fake that independently recomputes every request "
        "signature — listing, footer-only schema via ranged GETs, and "
        "per-task object fetches all happen under real SigV4 inside the "
        "driver's own harness; oracle = the plain local read"
    ),
)
def source_s3_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.sources.s3http import read_s3_parquet_distributed

    endpoint = _fakes.s3_endpoint_for(sf_dir)
    df = read_s3_parquet_distributed(
        spark,
        "s3://lake/nation/",
        {
            "s3_endpoint": endpoint,
            "s3_region": _fakes.REGION,
            "s3_access_key": _fakes.ACCESS,
            "s3_secret_key": _fakes.SECRET,
        },
    )
    return _nation_select(df)


@query(
    "source_az_spool_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "jar-free SharedKey Azure Blob read (sources/azblob.spool_az) "
        "against an in-process fake that recomputes the SharedKey "
        "string-to-sign per request; the spool mirrors blob subpaths "
        "(r18 collision fix) and Spark scans the local spool. Spool "
        "path cached per sf_dir so repeated bench/driver invocations "
        "do not re-fetch or litter temp dirs"
    ),
)
def source_az_spool(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(_az_spool_for(sf_dir))
    return _nation_select(df)


_AZ_SPOOL: dict[str, str] = {}
_AZ_LOCK = threading.Lock()


def _cleanup_spools() -> None:
    """Remove the entry-cached spool temp dirs at interpreter exit
    (r19 — explicit lifecycle for what was a documented process-lifetime
    leak; the spool files under the returned path are plain copies)."""
    import shutil

    with _AZ_LOCK:
        for path in _AZ_SPOOL.values():
            d = path if os.path.isdir(path) else os.path.dirname(path)
            shutil.rmtree(d, ignore_errors=True)
        _AZ_SPOOL.clear()


import atexit  # noqa: E402 — registered after the state it cleans

atexit.register(_cleanup_spools)


def _az_spool_for(sf_dir: str) -> str:
    with _AZ_LOCK:
        if sf_dir not in _AZ_SPOOL:
            from strake_spark.sources.azblob import spool_az

            _AZ_SPOOL[sf_dir] = spool_az(
                "az://lake/nation/nation.parquet",
                {
                    "azure_account": _fakes.AZ_ACCOUNT,
                    "azure_account_key": _fakes._az_key(),
                    "azure_endpoint": _fakes.az_endpoint_for(sf_dir),
                },
            )
        return _AZ_SPOOL[sf_dir]


@query(
    "source_sqlite_partitioned_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "SQLite Python DataSource with RANGE PARTITIONING: the entry "
        "builds a content-keyed database file from this sf_dir's nation "
        "table (once), then reads it back through the strake_sqlite "
        "format with num_partitions=4 on n_nationkey — each of the 4 "
        "partitions opens its own read-only connection executor-side "
        "(partition count plan-asserted in tests/test_plan_shapes.py). "
        "INTEGER affinity maps to bigint, hence the BIGINT casts in "
        "the oracle"
    ),
)
def source_sqlite_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.sources.sqlite import FORMAT_NAME, ensure_format

    ensure_format(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .options(
            path=_sqlite_db_for(sf_dir),
            table="nation",
            num_partitions="4",
            partition_column="n_nationkey",
        )
        .load()
    )
    return _nation_select(df)


def _sqlite_db_for(sf_dir: str) -> str:
    """Content-keyed SQLite database holding this sf_dir's nation
    table; built atomically once, reused by every later invocation."""
    tag = hashlib.md5(f"sqlite_rt_v1:{sf_dir}".encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"strake_rt_{tag}.db")
    if os.path.exists(path):
        return path
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet")
    tmp = f"{path}.{os.getpid()}.tmp"
    con = sqlite3.connect(tmp)
    try:
        con.execute(
            "CREATE TABLE nation("
            "n_nationkey INTEGER, n_name TEXT, n_regionkey INTEGER)"
        )
        con.executemany(
            "INSERT INTO nation VALUES (?, ?, ?)",
            zip(
                t.column("n_nationkey").to_pylist(),
                t.column("n_name").to_pylist(),
                t.column("n_regionkey").to_pylist(),
            ),
        )
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)  # atomic: concurrent callers never read a partial db
    return path


@query(
    "source_rest_paginated_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "REST DataSource with page-number pagination: an in-process "
        "JSON API serves this sf_dir's nation rows 7 per page; the "
        "strake_rest format walks ?page=N&limit=7 until exhaustion "
        "under a declared schema. Wrong pagination arithmetic (skipped "
        "or doubled page) is a row-count/hash mismatch"
    ),
)
def source_rest_paginated(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.sources.rest import FORMAT_NAME, ensure_format

    ensure_format(spark)
    endpoint = _fakes.rest_endpoint_for(sf_dir)
    df = (
        spark.read.format(FORMAT_NAME)
        .schema("n_nationkey bigint, n_name string, n_regionkey bigint")
        .options(
            url=f"{endpoint}/nation",
            pagination="page",
            page_size="7",
            page_param="page",
            limit_param="limit",
            records_path="data",
        )
        .load()
    )
    return _nation_select(df)


@query(
    "source_gs_interop_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "gs:// read through the CONFIG SURFACE: register_file_source "
        "rewrites gs://bucket onto the SigV4 client against GCS's "
        "S3-compatible XML interop API (HMAC keys, public GCS feature) "
        "— the same route file.py takes in production, proven against "
        "the signature-verifying fake. Completes driver-green coverage "
        "of all three cloud schemes in the reference's file.rs:124-207 "
        "(s3 distributed, az spool, gs interop). Registered view "
        "cached per (applicationId, sf_dir) so repeated driver "
        "invocations re-use one spool"
    ),
)
def source_gs_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _nation_select(spark.table(_gs_view_for(spark, sf_dir)))


_GS_VIEWS: dict[tuple[str, str], str] = {}
_GS_LOCK = threading.Lock()


def _gs_view_for(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    with _GS_LOCK:
        if key not in _GS_VIEWS:
            from strake_spark.config import SourceConfig, TableConfig
            from strake_spark.sources.file import register_file_source

            tag = hashlib.md5(f"gs_rt_v1:{sf_dir}".encode()).hexdigest()[:8]
            cfg = SourceConfig(
                name=f"gsrt_{tag}",
                type="parquet",
                url="gs://lake/nation",
                tables=[
                    TableConfig(name="nation", path="gs://lake/nation/nation.parquet")
                ],
                options={
                    # interop endpoint override -> the verifying fake;
                    # in production this defaults to storage.googleapis.com
                    "s3_endpoint": _fakes.s3_endpoint_for(sf_dir),
                    "s3_region": _fakes.REGION,
                    "gcs_hmac_key": _fakes.ACCESS,
                    "gcs_hmac_secret": _fakes.SECRET,
                },
            )
            _GS_VIEWS[key] = register_file_source(spark, cfg)[0]
        return _GS_VIEWS[key]


@query(
    "source_pg_wire_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "jar-free Postgres v3 wire client (sources/pgwire) against a "
        "live in-process server requiring SCRAM-SHA-256 — startup, the "
        "full SASL exchange (including server-signature verification), "
        "and 4 range-partitioned simple-query scans all run inside the "
        "driver's own harness; each partition opens its own wire "
        "connection executor-side. Oracle = the plain local read"
    ),
)
def source_pg_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.inventory import _wire_fakes as W
    from strake_spark.sources.pgwire import FORMAT_NAME, ensure_format

    ensure_format(spark)
    srv = W.pg_server_for(sf_dir)
    df = (
        spark.read.format(FORMAT_NAME)
        .options(
            host="127.0.0.1",
            port=str(srv.server_address[1]),
            user=W.WIRE_USER,
            password=W.WIRE_PASSWORD,
            database="db",
            table="nation",
            partition_column="n_nationkey",
            num_partitions="4",
        )
        .load()
    )
    return _nation_select(df)


@query(
    "source_mysql_wire_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "jar-free MySQL classic-protocol client (sources/mysqlwire) "
        "against a live in-process handshake-v10 server — "
        "mysql_native_password auth (challenge-response over the "
        "20-byte scramble), COM_QUERY text resultsets, and 4 "
        "range-partitioned scans, each its own connection. Oracle = "
        "the plain local read"
    ),
)
def source_mysql_wire(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.inventory import _wire_fakes as W
    from strake_spark.sources.mysqlwire import FORMAT_NAME, ensure_format

    ensure_format(spark)
    srv = W.my_server_for(sf_dir)
    df = (
        spark.read.format(FORMAT_NAME)
        .options(
            host="127.0.0.1",
            port=str(srv.server_address[1]),
            user=W.WIRE_USER,
            password=W.WIRE_PASSWORD,
            database="db",
            table="nation",
            partition_column="n_nationkey",
            num_partitions="4",
        )
        .load()
    )
    return _nation_select(df)


@query(
    "source_clickhouse_http_roundtrip",
    oracle=_NATION_ORACLE,
    notes=(
        "jar-free ClickHouse HTTP-interface client (sources/"
        "clickhouse_http) against a live in-process server emitting "
        "TSVWithNamesAndTypes with X-ClickHouse-User/Key auth — schema "
        "probe, TSV unescaping, \\N nulls, and 4 range-partitioned "
        "scans. Oracle = the plain local read"
    ),
)
def source_clickhouse_http(spark: SparkSession, sf_dir: str) -> DataFrame:
    from strake_spark.inventory import _wire_fakes as W
    from strake_spark.sources.clickhouse_http import FORMAT_NAME, ensure_format

    ensure_format(spark)
    srv = W.ch_server_for(sf_dir)
    df = (
        spark.read.format(FORMAT_NAME)
        .options(
            url=f"http://127.0.0.1:{srv.server_address[1]}",
            user=W.WIRE_USER,
            password=W.WIRE_PASSWORD,
            table="nation",
            partition_column="n_nationkey",
            num_partitions="4",
        )
        .load()
    )
    return _nation_select(df)
