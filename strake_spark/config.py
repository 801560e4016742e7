"""YAML config model.

Mirrors the reference's source/table configuration shape
(crates/common/src/models.rs:53-103: SourceConfig{name, type, url,
username, password, max_concurrent_queries, default_limit, cache,
tables[]}; TableConfig{name, schema, partition_column, columns[]}) and
its engine limits (crates/common/src/config.rs:20-23, config/strake.yaml).

Declared column types follow the reference's mapping
(crates/connectors/src/sources/file.rs:373-382): int/integer->Int32,
bigint->Int64, varchar/string/text/char->Utf8, float/double->Float64,
boolean->Boolean, date->Date32, decimal->Decimal(15,2), default Utf8.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import types as T

from strake_spark.errors import ConfigError, ErrorCode

_TYPE_MAP: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "varchar": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "char": T.StringType(),
    "float": T.DoubleType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "decimal": T.DecimalType(15, 2),
}


def map_declared_type(name: str) -> T.DataType:
    """Declared YAML type -> Spark type (file.rs:373-382 semantics)."""
    return _TYPE_MAP.get(name.strip().lower(), T.StringType())


@dataclass
class ColumnConfig:
    name: str
    type: str = "string"

    @property
    def spark_type(self) -> T.DataType:
        return map_declared_type(self.type)


@dataclass
class TableConfig:
    name: str
    path: str | None = None
    schema: str | None = None  # namespace, not structural schema
    partition_column: str | None = None
    columns: list[ColumnConfig] = field(default_factory=list)
    options: dict[str, Any] = field(default_factory=dict)

    def struct_type(self) -> T.StructType | None:
        if not self.columns:
            return None
        return T.StructType(
            [T.StructField(c.name, c.spark_type, True) for c in self.columns]
        )


@dataclass
class SourceConfig:
    name: str
    type: str
    url: str | None = None
    username: str | None = None
    password: str | None = None
    max_concurrent_queries: int | None = None
    default_limit: int | None = None
    cache: bool = False
    options: dict[str, Any] = field(default_factory=dict)
    tables: list[TableConfig] = field(default_factory=list)


@dataclass
class QueryLimits:
    """Defaults per reference config/strake.yaml + config.rs:20."""

    default_limit: int = 1000
    max_output_rows: int = 10_000
    query_timeout_seconds: float = 300.0
    max_estimated_rows: int | None = None
    max_estimated_bytes: int | None = None


@dataclass
class CacheConfig:
    enabled: bool = False
    directory: str = "/tmp/strake-spark-cache"
    ttl_seconds: float = 3600.0
    max_mb: int = 2048


@dataclass
class RetryConfig:
    max_attempts: int = 5
    base_ms: int = 1000
    cap_ms: int = 60_000


@dataclass
class TelemetryConfig:
    # OTLP/HTTP collector base URL (spans POST to <endpoint>/v1/traces);
    # None = record spans in-process only (engine.spans()), no export
    otlp_endpoint: str | None = None
    service_name: str = "strake-spark"
    max_spans: int = 512


@dataclass
class EngineConfig:
    sources: list[SourceConfig] = field(default_factory=list)
    query_limits: QueryLimits = field(default_factory=QueryLimits)
    cache: CacheConfig = field(default_factory=CacheConfig)
    retry: RetryConfig = field(default_factory=RetryConfig)
    telemetry: TelemetryConfig = field(default_factory=TelemetryConfig)
    global_connection_budget: int = 100
    # per-user connection slots (reference enterprise "Connection
    # Slots", docs/enterprise.md:57-62): named users' concurrent-query
    # caps, plus an optional default applied to every named principal
    user_slots: dict[str, int] = field(default_factory=dict)
    default_user_slots: int | None = None
    # priority lane (reference enterprise "Query Buffering",
    # docs/enterprise.md:62): reserved global permits only these users
    # may draw from when the shared pool saturates
    priority_users: frozenset[str] = frozenset()
    priority_reserved_slots: int = 0
    # MCP injection-guard mode (reference strake.yaml security.agent_guard_mode)
    agent_guard_mode: str = "disabled"
    policies: Any = None  # governance.policies.PolicyConfig when set
    contracts: Any = None  # governance.contracts.ContractsConfig when set



def opt_bool(value: Any, default: bool = False) -> bool:
    """String-aware boolean for source options (r18 advice): config
    values arrive as real booleans from YAML/JSON but as STRINGS from
    env substitution and CLI overrides — ``bool("false")`` is True, so
    a plain bool() silently enables whatever the option gates. The
    repo-wide convention (clickhouse_http.py): the strings
    "true"/"1"/"yes"/"on" (case-insensitive) are True, everything else
    False; None means "unset" and yields the default."""
    if value is None:
        return default
    if isinstance(value, bool):
        return value
    return str(value).strip().lower() in ("true", "1", "yes", "on")


def _first_set(*values, default):
    """First value that is not None — unlike an `or` chain, an explicit
    0 (or empty string) is a real setting, not an absence (r8 advice)."""
    for v in values:
        if v is not None:
            return v
    return default


def _parse_user_slots(raw: Any) -> dict[str, int]:
    """Per-user connection slots; values must be >= 1 — a 0 would read
    as "block this user" but the governor's falsy check would treat it
    as "no limit", so reject it loudly at parse time (r8 advice)."""
    out: dict[str, int] = {}
    for k, v in (raw or {}).items():
        n = int(v)
        if n < 1:
            raise ConfigError(
                f"user_slots[{k!r}] must be >= 1, got {n} "
                "(use source-level deny rules to block a user entirely)"
            )
        out[str(k)] = n
    return out


def _column(d: Any) -> ColumnConfig:
    if isinstance(d, str):
        return ColumnConfig(name=d)
    # the reference's example configs spell the type key "data_type"
    # (docs/examples/github_source.yaml); accept both — dropping it
    # silently declared every column as string
    return ColumnConfig(
        name=d["name"], type=str(d.get("type") or d.get("data_type") or "string")
    )


def _table(d: dict[str, Any]) -> TableConfig:
    return TableConfig(
        name=d["name"],
        path=d.get("path") or d.get("url"),
        schema=d.get("schema"),
        partition_column=d.get("partition_column"),
        columns=[_column(c) for c in d.get("columns") or []],
        options=dict(d.get("options") or {}),
    )


def _source(d: dict[str, Any]) -> SourceConfig:
    # The reference's documented YAML nests connection details under a
    # `config:` key (docs/examples/github_source.yaml: base_url,
    # headers, pagination) — accept that spelling verbatim so pasted
    # examples work. Nested values fold into url/options; dict-valued
    # options (headers, params) JSON-encode to match the option reader,
    # and the reference's structured pagination block flattens to the
    # style string (+ its parameters).
    import json as _json

    nested = dict(d.get("config") or {})
    # quickstart.md spelling: `type: sql` + `dialect: postgres` +
    # `connection: "postgres://..."` — the dialect IS the concrete type
    src_type = str(d["type"]).lower()
    if src_type == "sql" and d.get("dialect"):
        src_type = str(d["dialect"]).lower()
    # pop the nested url spellings UNCONDITIONALLY: with a lazy `or`
    # chain, a top-level url left the nested base_url/url/connection in
    # `nested`, where it leaked into options and could mislead a
    # connector (r8 advice)
    nested_urls = [nested.pop(k, None) for k in ("base_url", "url", "connection")]
    url = d.get("url") or d.get("connection")
    if url is None:
        url = next((u for u in nested_urls if u is not None), None)
    pagination = nested.pop("pagination", None)
    if isinstance(pagination, dict):
        style = str(pagination.get("type", "none")).lower()
        # the reference spells Link-header pagination type "header"
        nested["pagination"] = "link" if style == "header" else style
        for k, v in pagination.items():
            if k != "type":
                nested.setdefault(k, v)
    elif pagination is not None:
        nested["pagination"] = pagination
    options = {**nested, **dict(d.get("options") or {})}
    for k, v in list(options.items()):
        if isinstance(v, (dict, list)):
            options[k] = _json.dumps(v)
    return SourceConfig(
        name=d["name"],
        type=src_type,
        url=url,
        username=d.get("username"),
        password=d.get("password"),
        max_concurrent_queries=d.get("max_concurrent_queries"),
        default_limit=d.get("default_limit"),
        cache=bool(d.get("cache", False)),
        options=options,
        tables=[_table(t) for t in d.get("tables") or []],
    )


def parse_config(raw: dict[str, Any]) -> EngineConfig:
    from strake_spark.governance.policies import parse_policies

    ql = raw.get("query_limits") or {}
    ca = raw.get("cache") or {}
    re_ = raw.get("retry") or {}
    te = raw.get("telemetry") or {}
    # reference config/strake.yaml spellings: the connection budget
    # nests under server:, and telemetry uses enabled+endpoint
    sv = raw.get("server") or {}
    sec = raw.get("security") or {}
    te_endpoint = te.get("otlp_endpoint")
    if te_endpoint is None and te.get("enabled") and te.get("endpoint"):
        te_endpoint = te["endpoint"]
    return EngineConfig(
        telemetry=TelemetryConfig(
            otlp_endpoint=te_endpoint,
            service_name=str(te.get("service_name", "strake-spark")),
            max_spans=int(te.get("max_spans", 512)),
        ),
        policies=parse_policies(raw.get("policies")),
        contracts=__import__(
            "strake_spark.governance.contracts", fromlist=["parse_contracts"]
        ).parse_contracts(raw.get("contracts")),
        sources=[_source(s) for s in raw.get("sources") or []],
        query_limits=QueryLimits(
            default_limit=int(ql.get("default_limit", 1000)),
            max_output_rows=int(ql.get("max_output_rows", 10_000)),
            query_timeout_seconds=float(ql.get("query_timeout_seconds", 300.0)),
            max_estimated_rows=ql.get("max_estimated_rows"),
            max_estimated_bytes=ql.get("max_estimated_bytes"),
        ),
        cache=CacheConfig(
            enabled=bool(ca.get("enabled", False)),
            directory=str(ca.get("directory", "/tmp/strake-spark-cache")),
            ttl_seconds=float(ca.get("ttl_seconds", 3600.0)),
            # reference spelling max_size_mb (strake.yaml:21);
            # explicit 0 is honored (disables caching by size), only
            # absent/None falls back (r8 advice)
            max_mb=int(_first_set(ca.get("max_mb"), ca.get("max_size_mb"), default=2048)),
        ),
        retry=RetryConfig(
            max_attempts=int(re_.get("max_attempts", 5)),
            base_ms=int(re_.get("base_ms", 1000)),
            cap_ms=int(re_.get("cap_ms", 60_000)),
        ),
        global_connection_budget=int(
            _first_set(
                raw.get("global_connection_budget"),
                sv.get("global_connection_budget"),
                default=100,
            )
        ),
        agent_guard_mode=str(sec.get("agent_guard_mode", "disabled")).lower(),
        user_slots=_parse_user_slots(raw.get("user_slots")),
        default_user_slots=_parse_default_slots(raw.get("default_user_slots")),
        priority_users=frozenset(str(u) for u in (raw.get("priority_users") or [])),
        priority_reserved_slots=int(
            _first_set(raw.get("priority_reserved_slots"), default=0)
        ),
    )



def _parse_default_slots(v: Any) -> int | None:
    if v is None:
        return None
    n = int(v)
    if n < 1:
        raise ConfigError(f"default_user_slots must be >= 1, got {n}")
    return n


def load_config(
    path_or_dict: str | dict[str, Any], sources_path: str | None = None
) -> EngineConfig:
    """Load engine config; optionally merge a SEPARATE sources file.

    Mirrors the reference's split-file convention
    (docs/python-api.md:11-31: ``StrakeConnection(strake_yaml,
    sources_config=...)``): engine settings live in ``strake.yaml``,
    source registrations in ``sources.yaml``. When ``sources_path`` is
    omitted and the main file declares no sources, a ``sources.yaml``
    sitting NEXT TO the main file is picked up automatically. The
    sources file may be a bare list or a ``{sources: [...]}`` mapping;
    any extra top-level sections it carries (policies, contracts) merge
    in unless the main file already sets them."""
    if isinstance(path_or_dict, dict):
        raw = dict(path_or_dict)
    else:
        import yaml

        with open(path_or_dict) as f:
            try:
                raw = yaml.safe_load(f) or {}
            except yaml.YAMLError as e:
                raise ConfigError(
                    f"invalid YAML in {path_or_dict}: {e}",
                    code=ErrorCode.INVALID_YAML,
                ) from e
        if sources_path is None and not raw.get("sources"):
            import os as _os

            cand = _os.path.join(
                _os.path.dirname(_os.path.abspath(path_or_dict)), "sources.yaml"
            )
            if _os.path.exists(cand) and _os.path.abspath(cand) != _os.path.abspath(
                path_or_dict
            ):
                sources_path = cand
    if sources_path is not None:
        import yaml

        with open(sources_path) as f:
            try:
                sraw = yaml.safe_load(f) or {}
            except yaml.YAMLError as e:
                raise ConfigError(
                    f"invalid YAML in {sources_path}: {e}",
                    code=ErrorCode.INVALID_YAML,
                ) from e
        if isinstance(sraw, list):
            raw.setdefault("sources", sraw)
        else:
            for k, v in sraw.items():
                raw.setdefault(k, v)
    return parse_config(raw)
