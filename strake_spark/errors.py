"""Engine error taxonomy.

Mirrors the reference's user-facing failure modes:
- non-SELECT rejection (read-only engine, reference README.md:29 and
  crates/sql/src/optimizer/defensive_trace.rs:31-42 bailing on Dml/Ddl/Copy),
- cost-based plan rejection (crates/runtime/src/query/cost_validator.rs:36-133
  raises "BudgetExceeded" with a hint),
- query timeout (crates/runtime/src/federation.rs:415-466),
- source/connector failures wrapped with retry/circuit-breaker context
  (crates/common/src/circuit_breaker.rs, crates/common/src/retry.rs).
"""


class StrakeError(Exception):
    """Base class for all engine errors."""


class QueryRejected(StrakeError):
    """Query refused at the gate (non-SELECT, invalid identifier, policy)."""


class BudgetExceeded(StrakeError):
    """Estimated plan cost exceeds configured limits.

    Reference: cost_validator.rs:56-77 (max estimated rows/bytes over plan
    nodes compared against query_limits).
    """


class QueryTimeout(StrakeError):
    """Query wall-clock exceeded the configured timeout; Spark jobs cancelled."""


class SourceError(StrakeError):
    """A federated source failed (after retries / circuit breaker)."""


class CircuitOpen(SourceError):
    """Circuit breaker for a source is open; request short-circuited."""
