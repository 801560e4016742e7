"""Iceberg source — REST catalog tables with time travel.

Reference: crates/connectors/src/sources/iceberg.rs +
iceberg/provider.rs (~1,400 LoC): REST catalog + OAuth, lazy table
load, snapshot time travel (snapshot id / timestamp / tag / branch),
partition-aware filter pushdown.

Spark-first: every one of those behaviors is BUILT-IN to
`iceberg-spark-runtime` — `spark.read.format("iceberg")`, SQL
`VERSION AS OF` / `TIMESTAMP AS OF`, branch/tag reads, partition
pruning, and catalog OAuth via spark.sql.catalog.<name>.* conf. Our
code is only config plumbing that:

1. configures a named Spark catalog for the REST catalog URL
   (+ credential / oauth2-server-uri options),
2. registers each table as a view, honoring time-travel options
   (snapshot_id | as_of_timestamp | branch | tag).

The iceberg-spark-runtime jar is not vendored in this container, so
registration raises a clear SourceError when the catalog class is
absent; the code path runs unmodified on any cluster with the jar
(--packages org.apache.iceberg:iceberg-spark-runtime-...).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from strake_spark.config import SourceConfig
from strake_spark.errors import SourceError
from strake_spark.sources.registry import source_type


def _configure_catalog(spark: SparkSession, cfg: SourceConfig) -> str:
    cat = f"strake_{cfg.name}"
    conf = spark.conf
    conf.set(f"spark.sql.catalog.{cat}", "org.apache.iceberg.spark.SparkCatalog")
    conf.set(f"spark.sql.catalog.{cat}.type", "rest")
    conf.set(f"spark.sql.catalog.{cat}.uri", cfg.url)
    # OAuth2 client-credentials (provider.rs OAuth support)
    if cfg.options.get("credential"):
        conf.set(f"spark.sql.catalog.{cat}.credential", str(cfg.options["credential"]))
    if cfg.options.get("oauth2_server_uri"):
        conf.set(
            f"spark.sql.catalog.{cat}.oauth2-server-uri",
            str(cfg.options["oauth2_server_uri"]),
        )
    if cfg.options.get("warehouse"):
        conf.set(f"spark.sql.catalog.{cat}.warehouse", str(cfg.options["warehouse"]))
    return cat


@source_type("iceberg", "iceberg_rest")
def register_iceberg_source(spark: SparkSession, cfg: SourceConfig) -> list[str]:
    from strake_spark.sources.file import view_name

    if not cfg.url:
        raise SourceError(f"iceberg source {cfg.name!r} needs url (REST catalog URI)")
    cat = _configure_catalog(spark, cfg)
    registered: list[str] = []
    for tbl in cfg.tables:
        fqn = f"{cat}.{tbl.schema or 'default'}.{tbl.name}"
        reader = spark.read.format("iceberg")
        # time travel (provider.rs:361-420 TableVersionSpec semantics)
        if tbl.options.get("snapshot_id"):
            reader = reader.option("snapshot-id", str(tbl.options["snapshot_id"]))
        if tbl.options.get("as_of_timestamp"):
            reader = reader.option(
                "as-of-timestamp", str(tbl.options["as_of_timestamp"])
            )
        if tbl.options.get("branch"):
            reader = reader.option("branch", str(tbl.options["branch"]))
        if tbl.options.get("tag"):
            reader = reader.option("tag", str(tbl.options["tag"]))
        try:
            df = reader.load(fqn)
        except Exception as e:
            msg = str(e)
            if "ClassNotFoundException" in msg or "SparkCatalog" in msg:
                raise SourceError(
                    f"iceberg source {cfg.name!r}: iceberg-spark-runtime jar "
                    "not on the classpath (add org.apache.iceberg:"
                    "iceberg-spark-runtime via spark.jars.packages)"
                ) from e
            raise
        view = view_name(cfg.name, tbl.name)
        df.createOrReplaceTempView(view)
        registered.append(view)
    return registered
