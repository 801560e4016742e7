"""Agent-side tracing: sessions, span decorator, JSON-lines emitters.

Reference parity: python/strake/tracing/session.py — the CLIENT-side
tracing surface of the reference python package, distinct from the
engine's span tree (telemetry.py, which mirrors the server's tracer):
agents instrument their own tool calls with ``AgentSession`` /
``@span`` and records land as JSON lines under a trace directory.

Same environment contract as the reference so a migrating user's env
keeps working: ``STRAKE_TRACE_ENABLED`` (default true) switches the
module-level emitter between the file emitter and ``NullEmitter``;
``STRAKE_TRACE_DIR`` overrides the directory (default
``~/.strake_spark/traces``); ``STRAKE_TRACE_CODE`` switches
``code_field`` between full-text capture and SHA-256-hash-only
(hash-only is the privacy default).

Record shapes (session_start/session_end with termination reason and
duration, span with latency/status/error, code_hash+code_size_bytes)
match the reference so downstream trace tooling reads either.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import json
import os
import threading
import time
import uuid
from abc import ABC, abstractmethod
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Callable


def _env_bool(key: str, default: str) -> bool:
    return os.environ.get(key, default).lower() in ("1", "true", "yes")


def _trace_enabled() -> bool:
    return _env_bool("STRAKE_TRACE_ENABLED", "true")


def _code_capture() -> bool:
    return _env_bool("STRAKE_TRACE_CODE", "false")


def _trace_dir() -> Path:
    env = os.environ.get("STRAKE_TRACE_DIR")
    if env:
        return Path(env).resolve()
    # project-local .strake_spark/traces next to the running script
    # when determinable, else the home fallback (reference
    # utils.py:44-60 get_strake_dir semantics)
    from strake_spark.utils import get_app_dir

    return get_app_dir("traces")


def _utc_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


class TraceEmitter(ABC):
    @abstractmethod
    def emit(self, record: dict[str, Any]) -> None: ...

    def flush(self) -> None:  # optional, called at session close
        pass


class NullEmitter(TraceEmitter):
    def emit(self, record: dict[str, Any]) -> None:
        pass


class JsonLinesFileEmitter(TraceEmitter):
    """One ``<date>_<session_id>.jsonl`` per session under the trace
    dir (the reference's naming, for correlation and cleanup)."""

    def __init__(self, trace_dir: Path | str | None = None) -> None:
        self._dir = Path(trace_dir).resolve() if trace_dir else _trace_dir()
        self._dir.mkdir(parents=True, exist_ok=True)
        self._file = None
        self._path: Path | None = None

    @property
    def trace_dir(self) -> Path:
        return self._dir

    def emit(self, record: dict[str, Any]) -> None:
        if self._file is None:
            sid = record.get("session_id", "unknown")
            day = datetime.now(timezone.utc).strftime("%Y%m%d")
            self._path = self._dir / f"{day}_{sid}.jsonl"
            self._file = open(self._path, "a", encoding="utf-8")
        self._file.write(json.dumps(record, default=str) + "\n")

    def flush(self) -> None:
        if self._file is not None:
            self._file.flush()

    def close(self) -> None:
        if self._file is not None:
            self._file.close()
            self._file = None


_emitter: TraceEmitter | None = None
_lock = threading.Lock()


def get_emitter(trace_dir: Path | str | None = None) -> TraceEmitter:
    """Module-level emitter, created (or redirected) on demand.
    Disabled tracing always yields a NullEmitter; an explicit
    ``set_emitter`` override is kept unless a trace_dir is forced."""
    global _emitter
    with _lock:
        if not _trace_enabled():
            if not isinstance(_emitter, NullEmitter):
                _emitter = NullEmitter()
            return _emitter
        if trace_dir is None:
            if _emitter is not None:
                return _emitter
            target = _trace_dir()
        else:
            target = Path(trace_dir).resolve()
            if isinstance(_emitter, JsonLinesFileEmitter) and _emitter.trace_dir == target:
                return _emitter
        if isinstance(_emitter, JsonLinesFileEmitter):
            _emitter.close()
        _emitter = JsonLinesFileEmitter(trace_dir=target)
        return _emitter


def set_emitter(emitter: TraceEmitter | None) -> None:
    """Override (or reset with None) the module emitter — tests."""
    global _emitter
    with _lock:
        _emitter = emitter


class AgentSession:
    """One agent invocation: emits session_start on enter, session_end
    (with termination reason + duration) on exit; ``record_event``
    tags arbitrary records with the session id."""

    def __init__(self, emitter: TraceEmitter | None = None,
                 metadata: dict[str, Any] | None = None) -> None:
        self.session_id = uuid.uuid4().hex
        self.emitter = emitter or get_emitter()
        self.metadata = metadata or {}
        self.termination_reason = "natural"
        self._start_ns = 0

    def __enter__(self) -> "AgentSession":
        self._start_ns = time.monotonic_ns()
        self.emitter.emit({
            "event": "session_start",
            "session_id": self.session_id,
            "timestamp": _utc_iso(),
            **self.metadata,
        })
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        if exc_type is not None:
            self.termination_reason = f"error:{exc_type.__name__}"
        self.emitter.emit({
            "event": "session_end",
            "session_id": self.session_id,
            "timestamp": _utc_iso(),
            "termination_reason": self.termination_reason,
            "duration_ms": round((time.monotonic_ns() - self._start_ns) / 1e6, 2),
        })
        self.emitter.flush()

    def record_event(self, event_type: str, data: dict[str, Any] | None = None) -> None:
        self.emitter.emit({
            "event": event_type,
            "session_id": self.session_id,
            "timestamp": _utc_iso(),
            **(data or {}),
        })


def _args_summary(args: tuple, kwargs: dict) -> dict[str, Any]:
    """Privacy-lean summary: types and sizes, never values."""
    def _one(v: Any) -> str:
        t = type(v).__name__
        try:
            return f"{t}[{len(v)}]"  # type: ignore[arg-type]
        except TypeError:
            return t
    return {
        "positional": [_one(a) for a in args],
        "keyword": {k: _one(v) for k, v in kwargs.items()},
    }


def span(span_type: str = "tool_call", name: str | None = None,
         capture_args: bool = False) -> Callable:
    """Emit a span record (latency, status, error) around a function;
    works on sync and async functions (reference session.py:271-361).
    ``capture_args`` defaults False for privacy — and even then only
    types/sizes are recorded, never values."""

    def decorator(fn: Callable) -> Callable:
        label = name or fn.__name__

        def _record(start_ns: int, status: str, error: str | None,
                    args: tuple, kwargs: dict) -> None:
            rec: dict[str, Any] = {
                "event": "span",
                "span_type": span_type,
                "name": label,
                "timestamp": _utc_iso(),
                "latency_ms": round((time.monotonic_ns() - start_ns) / 1e6, 2),
                "status": status,
            }
            if error:
                rec["error"] = error
            if capture_args:
                rec["args"] = _args_summary(args, kwargs)
            get_emitter().emit(rec)

        if inspect.iscoroutinefunction(fn):
            @functools.wraps(fn)
            async def async_wrapper(*args, **kwargs):
                start = time.monotonic_ns()
                try:
                    out = await fn(*args, **kwargs)
                except Exception as exc:
                    _record(start, "error", f"{type(exc).__name__}: {exc}", args, kwargs)
                    raise
                _record(start, "ok", None, args, kwargs)
                return out
            return async_wrapper

        @functools.wraps(fn)
        def sync_wrapper(*args, **kwargs):
            start = time.monotonic_ns()
            try:
                out = fn(*args, **kwargs)
            except Exception as exc:
                _record(start, "error", f"{type(exc).__name__}: {exc}", args, kwargs)
                raise
            _record(start, "ok", None, args, kwargs)
            return out
        return sync_wrapper

    return decorator


def hash_code(code: str) -> str:
    return hashlib.sha256(code.encode("utf-8")).hexdigest()


def code_field(code: str) -> dict[str, Any]:
    """Code representation for trace records: full text only when
    STRAKE_TRACE_CODE=true, else hash + size (the privacy default)."""
    size = len(code.encode("utf-8"))
    if _code_capture():
        return {"code": code, "code_size_bytes": size}
    return {"code_hash": hash_code(code), "code_size_bytes": size}
