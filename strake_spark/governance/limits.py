"""Defensive limit, cost gate, and timeout enforcement.

- Defensive limit: the reference wraps every query in LIMIT default_limit
  (1000) unless the plan already contains Limit / Aggregate / Distinct /
  Window (crates/sql/src/optimizer/defensive_trace.rs:21-83,
  crates/common/src/config.rs:20). We inspect Spark's analyzed logical
  plan for the same skip list and append ``df.limit(n)`` otherwise.
- Cost gate: the reference's CostBasedValidator rejects plans whose max
  estimated rows/bytes exceed limits (crates/runtime/src/query/
  cost_validator.rs:36-133). We read Catalyst's optimized-plan statistics.
- Timeout: the reference wraps execution in a 300 s timeout
  (crates/runtime/src/federation.rs:415-466). Spark has no async cancel
  on collect, so we run the action on a worker thread inside a job
  group and cancel the group on deadline.
"""

from __future__ import annotations

import threading
import uuid
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame

from strake_spark.config import QueryLimits
from strake_spark.errors import BudgetExceeded, QueryTimeout

# Logical nodes that imply the user bounded or aggregated the result —
# same skip list as defensive_trace.rs:31-49.
_SKIP_NODES = (
    "GlobalLimit",
    "LocalLimit",
    "Aggregate",
    "Deduplicate",  # Spark's analyzed form of DISTINCT / dropDuplicates
    "Window",
    "CollectMetrics",
)


def _analyzed_tree(df: DataFrame) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def needs_defensive_limit(df: DataFrame) -> bool:
    tree = _analyzed_tree(df)
    return not any(node in tree for node in _SKIP_NODES)


def apply_defensive_limit(df: DataFrame, limits: QueryLimits) -> DataFrame:
    """Append LIMIT default_limit to unbounded scans (defensive_trace.rs:58-71)."""
    if limits.default_limit and needs_defensive_limit(df):
        return df.limit(limits.default_limit)
    return df


def plan_stats(df: DataFrame) -> tuple[int | None, int | None]:
    """(estimated_rows | None, estimated_bytes | None) from Catalyst stats."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(str(stats.sizeInBytes()))
    except Exception:
        return None, None
    rows = None
    try:
        opt = stats.rowCount()
        if opt.isDefined():
            rows = int(str(opt.get()))
    except Exception:
        rows = None
    return rows, size


def check_cost(df: DataFrame, limits: QueryLimits) -> None:
    """Reject before execution when estimates exceed budget
    (cost_validator.rs:56-77 semantics, including the hint text)."""
    rows, size = plan_stats(df)
    if limits.max_estimated_rows is not None and rows is not None and rows > limits.max_estimated_rows:
        raise BudgetExceeded(
            f"estimated rows {rows} > max_estimated_rows {limits.max_estimated_rows}; "
            "add filters or LIMIT to narrow the query",
            context={
                "type": "budget_exceeded",
                "estimated_rows": rows,
                "limit": limits.max_estimated_rows,
                "suggestion": "add filters or LIMIT to narrow the query",
            },
        )
    if limits.max_estimated_bytes is not None and size is not None and size > limits.max_estimated_bytes:
        raise BudgetExceeded(
            f"estimated bytes {size} > max_estimated_bytes {limits.max_estimated_bytes}; "
            "add filters or LIMIT to narrow the query",
            context={
                "type": "budget_exceeded",
                "estimated_bytes": size,
                "limit": limits.max_estimated_bytes,
                "suggestion": "add filters or LIMIT to narrow the query",
            },
        )


def run_with_timeout(df: DataFrame, action: Callable[[DataFrame], Any], timeout_s: float) -> Any:
    """Run ``action(df)`` with a wall-clock deadline; cancel Spark jobs on expiry."""
    spark = df.sparkSession
    sc = spark.sparkContext
    group = f"strake-{uuid.uuid4().hex[:12]}"
    result: dict[str, Any] = {}

    def target() -> None:
        sc.setJobGroup(group, "strake_spark governed query", interruptOnCancel=True)
        try:
            result["value"] = action(df)
        except Exception as e:  # surfaced after join
            result["error"] = e
        finally:
            try:
                sc.setJobGroup("", "")
            except Exception:
                pass  # session may already be stopped (cancelled/timed-out query)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        sc.cancelJobGroup(group)
        raise QueryTimeout(f"query exceeded {timeout_s:.0f}s; jobs cancelled")
    if "error" in result:
        raise result["error"]
    return result["value"]
