"""Engine error taxonomy with stable structured codes.

Mirrors the reference's user-facing failure modes and its STRAKE-NNNN
code contract (crates/error/src/code.rs:24-210: connection 1xxx, query
2xxx, config 3xxx, auth 4xxx, internal 5xxx, unknown 9999; codes are
stable across versions so API users can branch on them), threaded the
same way the reference threads them (crates/common/src/error.rs re-
export, both server facades, python/src/connection.rs):

- non-SELECT rejection (read-only engine, reference README.md:29 and
  crates/sql/src/optimizer/defensive_trace.rs:31-42 bailing on Dml/Ddl/Copy),
- cost-based plan rejection (crates/runtime/src/query/cost_validator.rs:36-133
  raises BudgetExceeded / STRAKE-2006),
- query timeout (crates/runtime/src/federation.rs:415-466 raises
  QueryCancelled / STRAKE-2008),
- source/connector failures wrapped with retry/circuit-breaker context
  (crates/common/src/circuit_breaker.rs, crates/common/src/retry.rs),
- schema drift 2009-2011 and prompt injection 2012 (code.rs:57-77).

Every exception type carries a class-default ``code``; raise sites may
override per instance (``raise AuthError("token expired",
code=ErrorCode.TOKEN_EXPIRED)``). ``str(e)`` stays the bare message so
existing callers and tests are unaffected; the code travels on the
exception (``e.code``), in REST payloads (``e.payload()``), and through
the Flight error marker (server.py / remote.py).
"""

from __future__ import annotations

import enum


class ErrorCategory(str, enum.Enum):
    """High-level category derived from the code range (code.rs:129-139)."""

    CONNECTION = "connection"
    QUERY = "query"
    CONFIG = "config"
    AUTH = "auth"
    INTERNAL = "internal"


class ErrorCode(enum.IntEnum):
    """Stable numeric error codes, formatted ``STRAKE-NNNN``.

    The member set and numbering follow the reference's published
    contract (code.rs:24-120); ranges are semver-stable.
    """

    # --- connection (1000-1999) ---
    SOURCE_NOT_FOUND = 1001
    CONNECTION_TIMEOUT = 1002
    SSL_HANDSHAKE_FAILED = 1003
    POOL_EXHAUSTED = 1004
    UNSUPPORTED_SOURCE_TYPE = 1005
    DATABASE_ERROR = 1006
    # --- query (2000-2999) ---
    SYNTAX_ERROR = 2001
    FIELD_NOT_FOUND = 2002
    TABLE_NOT_FOUND = 2003
    TYPE_MISMATCH = 2004
    AMBIGUOUS_COLUMN = 2005
    BUDGET_EXCEEDED = 2006
    PUSHDOWN_UNSUPPORTED = 2007
    QUERY_CANCELLED = 2008
    SCHEMA_DRIFT_MISSING_COLUMN = 2009
    SCHEMA_DRIFT_TYPE_CHANGED = 2010
    SCHEMA_DRIFT_EXTRA_COLUMN = 2011
    PROMPT_INJECTION_DETECTED = 2012
    # --- config (3000-3999) ---
    INVALID_YAML = 3001
    SCHEMA_VIOLATION = 3002
    MISSING_REQUIRED_FIELD = 3003
    INVALID_CONNECTION_STRING = 3004
    CONTRACT_VIOLATION = 3005
    CONFIG_ERROR = 3006
    # --- auth (4000-4999) ---
    AUTHENTICATION_FAILED = 4001
    AUTHORIZATION_DENIED = 4002
    INVALID_API_KEY = 4003
    TOKEN_EXPIRED = 4004
    SLOT_UNAVAILABLE = 4005
    # --- internal (5000-5999) ---
    ENGINE_INTERNAL = 5001
    SERIALIZATION_FAILED = 5002
    INTERNAL_PANIC = 5003
    NOT_IMPLEMENTED = 5004
    SIDECAR_ERROR = 5005
    # --- unclassified ---
    UNKNOWN = 9999

    def as_str(self) -> str:
        """Formatted code string, e.g. ``STRAKE-2006`` (code.rs:125)."""
        return f"STRAKE-{self.value:04d}"

    def __str__(self) -> str:  # IntEnum would print the bare int
        return self.as_str()

    @property
    def category(self) -> ErrorCategory:
        """Category by range (code.rs:129-139; out-of-range → internal)."""
        n = self.value
        if 1000 <= n <= 1999:
            return ErrorCategory.CONNECTION
        if 2000 <= n <= 2999:
            return ErrorCategory.QUERY
        if 3000 <= n <= 3999:
            return ErrorCategory.CONFIG
        if 4000 <= n <= 4999:
            return ErrorCategory.AUTH
        return ErrorCategory.INTERNAL

    @classmethod
    def parse(cls, s: str) -> "ErrorCode":
        """Round-trip a ``STRAKE-NNNN`` string back to a code.

        Raises ValueError on bad format or unknown number, mirroring
        the reference's TryFrom<String> (code.rs:154-165)."""
        if not isinstance(s, str) or not s.startswith("STRAKE-"):
            raise ValueError(f"invalid error code format: {s!r}")
        digits = s[len("STRAKE-"):]
        if not digits.isdigit():
            raise ValueError(f"invalid error code format: {s!r}")
        try:
            return cls(int(digits))
        except ValueError:
            raise ValueError(f"unknown error code: {s!r}") from None


class StrakeError(Exception):
    """Base class for all engine errors.

    ``code`` is a class default every subclass pins; raise sites may
    override per instance via the keyword (``code=``) when a more
    specific classification applies. ``hint`` mirrors the reference's
    optional remediation hint (error/src/lib.rs:126); ``context`` is
    the structured, machine-parseable detail dict (context.rs tagged
    variants — a ``type`` key plus variant fields), so API callers can
    act on field names / limits without parsing prose."""

    code: ErrorCode = ErrorCode.UNKNOWN

    def __init__(
        self,
        *args,
        code: ErrorCode | None = None,
        hint: str | None = None,
        context: dict | None = None,
    ):
        super().__init__(*args)
        if code is not None:
            self.code = ErrorCode(code)
        self.hint = hint
        self.context = context

    @property
    def formatted(self) -> str:
        """``[STRAKE-NNNN] message`` (+ hint), the reference's Display
        shape (error/src/lib.rs:93)."""
        base = f"[{self.code.as_str()}] {self}"
        return f"{base} (hint: {self.hint})" if self.hint else base

    def payload(self) -> dict:
        """JSON-safe error body for the REST facade; field names match
        the reference's serialized error (lib.rs:79: ``code`` carries
        the formatted string)."""
        body = {
            "code": self.code.as_str(),
            "category": self.code.category.value,
            "message": str(self),
        }
        if self.hint:
            body["hint"] = self.hint
        if self.context:
            body["context"] = self.context
        return body


# --- category exception classes (reference python/src/errors.rs:11-27:
# StrakeException base + one subclass per ErrorCategory, so API users
# catch by family the way the reference's Python client maps
# to_py_exception by code category). Behavior-specific types below
# subclass the category matching their DEFAULT code; instances carry
# their exact classification in ``e.code`` (whose .category is
# authoritative when a site overrides the code).


class ConnectionError(StrakeError):  # noqa: A001 - reference API name
    """Category base: connection/source failures (1xxx)."""


class QueryError(StrakeError):
    """Category base: query rejection/failure (2xxx)."""


class AuthError(StrakeError):
    """Category base: authentication/authorization failures (4xxx)."""

    code = ErrorCode.AUTHENTICATION_FAILED


class InternalError(StrakeError):
    """Category base: internal/system failures (5xxx)."""

    code = ErrorCode.INTERNAL_PANIC


# Reference Python spelling of the base class (python/src/errors.rs:11)
StrakeException = StrakeError


class QueryRejected(QueryError):
    """Query refused at the gate (non-SELECT, invalid identifier, policy).

    Default code follows the reference, where statement-class rejection
    surfaces as a parse/plan error (sql_generator/error.rs:34-36 →
    SyntaxError); policy sites override (e.g. RLS denial → 4002,
    result-guard injection → 2012)."""

    code = ErrorCode.SYNTAX_ERROR


class BudgetExceeded(QueryError):
    """Estimated plan cost exceeds configured limits.

    Reference: cost_validator.rs:56-77 (max estimated rows/bytes over plan
    nodes compared against query_limits) raises ErrorCode::BudgetExceeded.
    """

    code = ErrorCode.BUDGET_EXCEEDED


class QueryTimeout(QueryError):
    """Query wall-clock exceeded the configured timeout; Spark jobs cancelled.

    Reference: federation.rs:460 classifies the deadline as QueryCancelled.
    """

    code = ErrorCode.QUERY_CANCELLED


class ConfigError(StrakeError, ValueError):
    """Configuration rejected (bad YAML, invalid values, missing
    fields). Also a ValueError so pre-existing ``except ValueError``
    call sites keep working; the code default is 3006 with per-site
    overrides (YAML parse failures raise 3001, missing required fields
    3003 — reference code.rs:80-93)."""

    code = ErrorCode.CONFIG_ERROR


class EngineError(QueryError):
    """Engine-side query failure, classified onto the stable code
    contract from Spark's error condition (strake_spark.convert,
    mirroring the reference's From<DataFusionError> in convert.rs:4-41:
    field-not-found 2002 with a did-you-mean hint, table 2003, parse
    2001, type 2004, ambiguous 2005; anything else stays 5001)."""

    code = ErrorCode.ENGINE_INTERNAL


class SourceError(ConnectionError):
    """A federated source failed (after retries / circuit breaker)."""

    code = ErrorCode.DATABASE_ERROR


class CircuitOpen(SourceError):
    """Circuit breaker for a source is open; request short-circuited.

    The breaker opens after repeated connect/timeout failures, so the
    short-circuit classifies as a connection timeout (the reference
    assigns no dedicated breaker code)."""

    code = ErrorCode.CONNECTION_TIMEOUT
