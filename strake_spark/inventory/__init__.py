"""Operator inventory — the driver-facing correctness surface.

Each entry pairs a Spark implementation (DataFrame/SQL, Catalyst-planned)
with an ANSI-SQL oracle that DuckDB runs on the same parquet tables.
The driver executes both at sf=0.01 and compares row count + schema +
order-insensitive value hash (see /root/repo/__spark_entry__.py).

Design rules enforced across the inventory (learned from how the
hash-compare works):

1. Every computed column is aliased identically on both sides.
2. Money/quantity aggregations run in DECIMAL (exact, order-independent)
   and cast the final value to DOUBLE — a distributed Spark sum and a
   single-threaded DuckDB sum then agree bit-for-bit, with no rounding
   fudge. Plain DOUBLE sums would differ in low bits with summation
   order, which varies with partitioning.
3. Non-deterministic ordering is never exposed: any LIMIT/top-k carries a
   total order (unique tie-break column).
4. Hash-derived operators (minhash &c.) use md5-based integers that both
   engines compute identically, never engine-native hash().

Tags: ``rows_only`` marks entries whose oracle is intentionally omitted
(non-SQL-expressible or engine-specific results, e.g. approx sketches);
the driver records a weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    notes: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), notes: str = ""):
    """Register an inventory entry; used as a decorator on the Spark impl."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate inventory entry: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags), notes=notes)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}


# Import submodules for their registration side effects. Modules land
# incrementally; a genuinely missing module is tolerated, but an import
# error *inside* an existing module must surface loudly.
_SUBMODULES: list[str] = []

for _mod in ("tpch", "tpch_extended", "relational", "window", "setops", "expressions",
             "subqueries", "events", "dedup", "similarity", "text", "multimodal",
             "streaming_entries", "advanced", "asof_entries", "interval_entries",
             "pii_entries", "pipeline_extras"):
    _path = f"strake_spark.inventory.{_mod}"
    try:
        __import__(_path)
        _SUBMODULES.append(_mod)
    except ModuleNotFoundError as e:  # pragma: no cover
        if e.name != _path:
            raise
