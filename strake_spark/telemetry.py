"""Span tracing + OTLP export — the engine's observability surface.

Reference: crates/common/src/telemetry.rs — OpenTelemetry tracer with
OTLP export and W3C trace-context propagation, wrapping every query
with spans (plan/execute/source phases). Re-expressed stdlib-only:

- ``Tracer`` records spans into a bounded ring buffer (introspectable
  via ``engine.spans()`` / tests), with W3C-shaped 16-byte trace ids +
  8-byte span ids and parent links.
- ``traceparent`` headers (https://www.w3.org/TR/trace-context/) are
  parsed and emitted, so a span started here joins a caller's
  distributed trace and downstream HTTP calls can carry it on.
- ``OtlpJsonExporter`` posts finished spans in the OTLP/HTTP JSON
  shape (opentelemetry-proto trace service, the public wire schema) to
  a collector endpoint using urllib. Export is best-effort: a dead
  collector never fails a query (errors are counted, not raised).

The Spark work itself is observable through Spark's own UI/event log;
these spans cover the engine layers Spark cannot see (gate, pushdown
planning, cache, governance) — same split as the reference, where
DataFusion has its own metrics and telemetry.rs traces the layers
above it.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.request
from collections import deque
from dataclasses import dataclass, field
from typing import Any

_TRACEPARENT_VERSION = "00"


def _hex_id(nbytes: int) -> str:
    return os.urandom(nbytes).hex()


@dataclass
class Span:
    name: str
    trace_id: str  # 32 hex chars
    span_id: str  # 16 hex chars
    parent_span_id: str | None
    start_ns: int
    end_ns: int | None = None
    attributes: dict[str, Any] = field(default_factory=dict)
    status: str = "OK"  # OK | ERROR
    # True when this span opened with an empty thread-local stack — the
    # top of the LOCAL tree even if traceparent joined a remote trace
    # (parent_span_id is then the caller's span, so it can't signal
    # tree-completeness for batching).
    is_local_root: bool = False

    @property
    def duration_ms(self) -> float | None:
        if self.end_ns is None:
            return None
        return (self.end_ns - self.start_ns) / 1e6

    def traceparent(self) -> str:
        """W3C trace-context header value for downstream propagation."""
        return f"{_TRACEPARENT_VERSION}-{self.trace_id}-{self.span_id}-01"

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "trace_id": self.trace_id,
            "span_id": self.span_id,
            "parent_span_id": self.parent_span_id,
            "start_ns": self.start_ns,
            "end_ns": self.end_ns,
            "duration_ms": self.duration_ms,
            "attributes": dict(self.attributes),
            "status": self.status,
        }


def parse_traceparent(header: str | None) -> tuple[str, str] | None:
    """``00-<32 hex>-<16 hex>-<flags>`` -> (trace_id, parent_span_id),
    or None for anything malformed (an invalid header starts a fresh
    trace — the spec's required behavior, never an error)."""
    if not header:
        return None
    parts = header.strip().split("-")
    if len(parts) != 4:
        return None
    version, trace_id, span_id, _flags = parts
    if version != _TRACEPARENT_VERSION:
        return None
    if len(trace_id) != 32 or len(span_id) != 16:
        return None
    try:
        int(trace_id, 16), int(span_id, 16)
    except ValueError:
        return None
    if trace_id == "0" * 32 or span_id == "0" * 16:
        return None
    return trace_id, span_id


class _SpanHandle:
    """Context manager yielded by Tracer.span()."""

    def __init__(self, tracer: "Tracer", span: Span):
        self._tracer = tracer
        self.span = span

    def set_attribute(self, key: str, value: Any) -> None:
        self.span.attributes[key] = value

    def __enter__(self) -> "_SpanHandle":
        self._tracer._stack_push(self.span)
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is not None:
            self.span.status = "ERROR"
            self.span.attributes.setdefault("error.type", exc_type.__name__)
        self.span.end_ns = time.time_ns()
        self._tracer._stack_pop()
        self._tracer._record(self.span)


class Tracer:
    """Thread-safe span recorder with per-thread span stacks (so nested
    spans in one thread parent correctly while concurrent queries in
    other threads stay independent)."""

    def __init__(self, max_spans: int = 512, exporter=None, batch_size: int = 20):
        self._spans: deque[Span] = deque(maxlen=max_spans)
        self._lock = threading.Lock()
        self._local = threading.local()
        self._exporter = exporter
        self._batch_size = max(1, batch_size)
        self._pending: list[Span] = []
        self.export_errors = 0

    # ------------------------------------------------------------- stack
    def _stack(self) -> list[Span]:
        if not hasattr(self._local, "stack"):
            self._local.stack = []
        return self._local.stack

    def _stack_push(self, span: Span) -> None:
        self._stack().append(span)

    def _stack_pop(self) -> None:
        stack = self._stack()
        if stack:
            stack.pop()

    # -------------------------------------------------------------- API
    def span(
        self,
        name: str,
        attributes: dict[str, Any] | None = None,
        traceparent: str | None = None,
    ) -> _SpanHandle:
        """Open a span. Parentage: explicit ``traceparent`` header wins
        (joins the caller's distributed trace), else the innermost open
        span on this thread, else a fresh root trace."""
        ctx = parse_traceparent(traceparent)
        stack = self._stack()
        if ctx is not None:
            trace_id, parent_id = ctx
        elif stack:
            trace_id, parent_id = stack[-1].trace_id, stack[-1].span_id
        else:
            trace_id, parent_id = _hex_id(16), None
        span = Span(
            name=name,
            trace_id=trace_id,
            span_id=_hex_id(8),
            parent_span_id=parent_id,
            start_ns=time.time_ns(),
            attributes=dict(attributes or {}),
            is_local_root=not stack,
        )
        return _SpanHandle(self, span)

    def _record(self, span: Span) -> None:
        batch = None
        with self._lock:
            self._spans.append(span)
            if self._exporter is not None:
                self._pending.append(span)
                # A local-root span closing means its whole tree is
                # finished — flush then (and on batch overflow) so a
                # collector sees complete traces without per-span POST
                # chatter. Local-root-ness is tracked explicitly: a span
                # that joined a caller's trace via traceparent has a
                # non-None parent_span_id yet still completes its local
                # tree when it closes.
                if span.is_local_root or len(self._pending) >= self._batch_size:
                    batch, self._pending = self._pending, []
        if batch:
            self._export(batch)

    def _export(self, batch: list[Span]) -> None:
        try:
            self._exporter.export(batch)
        except Exception:  # noqa: BLE001 - export must never fail a query
            self.export_errors += 1

    def flush(self) -> None:
        """Export any buffered spans now (shutdown / test hook)."""
        with self._lock:
            batch, self._pending = self._pending, []
        if batch and self._exporter is not None:
            self._export(batch)

    def finished_spans(self) -> list[Span]:
        with self._lock:
            return list(self._spans)


def _otlp_attr(key: str, value: Any) -> dict[str, Any]:
    if isinstance(value, bool):
        v: dict[str, Any] = {"boolValue": value}
    elif isinstance(value, int):
        v = {"intValue": str(value)}
    elif isinstance(value, float):
        v = {"doubleValue": value}
    else:
        v = {"stringValue": str(value)}
    return {"key": key, "value": v}


def spans_to_otlp(spans: list[Span], service_name: str = "strake-spark") -> dict:
    """OTLP/HTTP JSON request body (ExportTraceServiceRequest shape from
    opentelemetry-proto): resourceSpans -> scopeSpans -> spans."""
    return {
        "resourceSpans": [
            {
                "resource": {
                    "attributes": [_otlp_attr("service.name", service_name)]
                },
                "scopeSpans": [
                    {
                        "scope": {"name": "strake_spark.telemetry"},
                        "spans": [
                            {
                                "traceId": s.trace_id,
                                "spanId": s.span_id,
                                **(
                                    {"parentSpanId": s.parent_span_id}
                                    if s.parent_span_id
                                    else {}
                                ),
                                "name": s.name,
                                "kind": 1,  # SPAN_KIND_INTERNAL
                                "startTimeUnixNano": str(s.start_ns),
                                "endTimeUnixNano": str(s.end_ns or s.start_ns),
                                "attributes": [
                                    _otlp_attr(k, v)
                                    for k, v in s.attributes.items()
                                ],
                                "status": (
                                    {"code": 2, "message": "error"}
                                    if s.status == "ERROR"
                                    else {"code": 1}
                                ),
                            }
                            for s in spans
                        ],
                    }
                ],
            }
        ]
    }


class OtlpJsonExporter:
    """POST finished spans to an OTLP/HTTP collector (/v1/traces) as
    JSON. Synchronous and best-effort by design: the engine calls it
    per-span off the hot path, and any failure raises to the Tracer
    which counts it (export_errors) and moves on."""

    def __init__(self, endpoint: str, service_name: str = "strake-spark",
                 timeout: float = 2.0, headers: dict[str, str] | None = None):
        self.endpoint = endpoint.rstrip("/")
        self.service_name = service_name
        self.timeout = timeout
        self.headers = headers or {}

    def export(self, spans: list[Span]) -> None:
        body = json.dumps(spans_to_otlp(spans, self.service_name)).encode()
        req = urllib.request.Request(
            self.endpoint + "/v1/traces",
            data=body,
            headers={"Content-Type": "application/json", **self.headers},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout):
            pass
