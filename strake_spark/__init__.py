"""strake_spark — a PySpark-native federated analytics engine.

A from-scratch rebuild of the capabilities of strake-data/strake
(reference snapshot at /root/reference, Apache-2.0) re-expressed
Spark-first: Spark SQL / Catalyst plays the role DataFusion plays in the
reference (see reference docs/architecture.md:91-92, which explicitly
defers distributed shuffle compute — this engine inverts that choice).

Public surface (mirrors reference python/strake/__init__.pyi:28-68):

    import strake_spark as ss
    engine = ss.connect("sources.yaml")        # or ss.StrakeEngine(...)
    remote = ss.connect("grpc://host:8815", api_key="...")  # thin client
    df = engine.sql("SELECT ...")              # governed Spark DataFrame
    engine.describe("catalog.schema.table")
    engine.list_sources()
    engine.explain_tree("SELECT ...")
"""

from strake_spark.version import __version__
from strake_spark.session import build_session, default_parallelism
from strake_spark.config import SourceConfig, TableConfig, ColumnConfig, load_config
from strake_spark.engine import StrakeEngine, connect
from strake_spark.remote import RemoteEngine
from strake_spark.materialize import Materializer
from strake_spark.errors import (
    StrakeError,
    StrakeException,
    ConnectionError,
    QueryError,
    ConfigError,
    AuthError,
    InternalError,
    ErrorCode,
    QueryRejected,
    BudgetExceeded,
    QueryTimeout,
    SourceError,
)


def make_rest_server(engine, **kw):
    """REST HTTP API façade (lazy import; see strake_spark.rest_api)."""
    from strake_spark.rest_api import make_rest_server as _make

    return _make(engine, **kw)


__all__ = [
    "make_rest_server",
    "__version__",
    "build_session",
    "default_parallelism",
    "SourceConfig",
    "TableConfig",
    "ColumnConfig",
    "load_config",
    "StrakeEngine",
    "RemoteEngine",
    "Materializer",
    "connect",
    "StrakeError",
    "StrakeException",
    "ConnectionError",
    "QueryError",
    "ConfigError",
    "AuthError",
    "InternalError",
    "ErrorCode",
    "QueryRejected",
    "BudgetExceeded",
    "QueryTimeout",
    "SourceError",
]
