"""Schema-drift reconciliation.

Reference: SchemaDriftTableProvider/SchemaDriftExec
(crates/connectors/src/sources/schema_drift.rs:12-29,51-70) reconciles
catalog-declared vs actual source schema per batch: NULL-fill missing
columns, cast-coerce mismatched types, prune extra columns, emit
warnings.

Spark binds schemas at analysis time, so we reconcile once at
registration (SURVEY.md §7): a single ``select`` of casts /
``lit(None)`` fills / column drops — Catalyst folds it into the scan, so
there is no per-batch cost at any scale.

Every reconciliation with drift also appends one STRUCTURED record to a
bounded process-wide log (the reference's SchemaDrift error-context
variant, crates/error/src/context.rs:78-94: expected/actual/missing
columns + type mismatches, tagged with the 2009-2011 codes). Read it
with ``drift_log()`` or ``StrakeEngine.drift_report()`` — operators
audit what was silently NULL-filled/coerced without scraping logs. The
log is module-scoped (shared across engines in one process, like any
logging stream) and bounded so a long-lived server cannot grow it
unboundedly.
"""

from __future__ import annotations

import logging
from collections import deque

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strake_spark.errors import ErrorCode

log = logging.getLogger("strake_spark.drift")

# bounded: a long-lived server re-registering drifted sources must not
# accumulate unbounded records; newest win, oldest drop
_DRIFT_LOG: deque = deque(maxlen=1024)

# context (table name) -> latest reconcile's warning lines, for the
# per-query warnings channel (reference warnings.rs:19-40: queries
# touching a drifted table carry its warning strings on the result)
_DRIFT_WARNINGS: dict[str, list[str]] = {}


def drift_log() -> list[dict]:
    """Structured drift records accumulated this process (newest last)."""
    return list(_DRIFT_LOG)


def has_drift() -> bool:
    """Cheap guard for hot paths: any drift recorded at all?"""
    return bool(_DRIFT_WARNINGS)


def drift_warnings_for(context: str) -> list[str]:
    """Latest reconcile warning lines for a table context ([] if the
    table never drifted)."""
    return list(_DRIFT_WARNINGS.get(context, ()))


def clear_drift_log() -> None:
    _DRIFT_LOG.clear()
    _DRIFT_WARNINGS.clear()


def reconcile(df: DataFrame, declared: T.StructType, context: str = "") -> DataFrame:
    """Adapt ``df`` to the declared schema (order, names, types).

    - declared column missing from source  -> NULL literal of declared type
    - type mismatch                        -> cast (uncastable -> analysis error
      surfaces immediately, matching the reference's warning-then-null only
      for runtime value failures, which Spark's ANSI-off cast handles as NULL)
    - extra source columns                 -> pruned

    Each warning string is prefixed with its stable drift code
    ([STRAKE-2009] missing / [STRAKE-2010] type change / [STRAKE-2011]
    extra column, reference code.rs:57-72) so consumers branch without
    string-matching prose; a structured record with the full schema
    diff lands in ``drift_log()``.
    """
    actual = {f.name.lower(): f for f in df.schema.fields}
    out = []
    warnings: list[str] = []
    missing: list[str] = []
    mismatches: list[str] = []
    for field in declared.fields:
        src = actual.get(field.name.lower())
        if src is None:
            warnings.append(
                f"[{ErrorCode.SCHEMA_DRIFT_MISSING_COLUMN}] missing column {field.name!r}: NULL-filled"
            )
            missing.append(field.name)
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif src.dataType != field.dataType:
            warnings.append(
                f"[{ErrorCode.SCHEMA_DRIFT_TYPE_CHANGED}] "
                f"type drift on {field.name!r}: {src.dataType.simpleString()} -> "
                f"{field.dataType.simpleString()} (cast)"
            )
            mismatches.append(
                f"{field.name}: {src.dataType.simpleString()} -> "
                f"{field.dataType.simpleString()}"
            )
            out.append(F.col(src.name).cast(field.dataType).alias(field.name))
        else:
            out.append(F.col(src.name).alias(field.name))
    extra = sorted(set(actual) - {f.name.lower() for f in declared.fields})
    if extra:
        warnings.append(
            f"[{ErrorCode.SCHEMA_DRIFT_EXTRA_COLUMN}] pruned extra columns: {extra}"
        )
    for w in warnings:
        log.warning("[schema-drift] %s: %s", context, w)
    if warnings:
        # one structured record per reconciliation (context.rs
        # SchemaDrift variant fields), not one per column — the diff is
        # the unit an operator acts on
        _DRIFT_LOG.append(
            {
                "type": "schema_drift",
                "table": context,
                "codes": sorted(
                    {w[1 : w.index("]")] for w in warnings}
                ),
                "expected_columns": [f.name for f in declared.fields],
                "actual_columns": [f.name for f in df.schema.fields],
                "missing_columns": missing,
                "type_mismatches": mismatches,
                "extra_columns": extra,
            }
        )
    if context:
        if warnings:
            _DRIFT_WARNINGS[context] = list(warnings)
        else:
            # a clean reconcile HEALS recorded drift — leaving the old
            # lines would report drift forever after the upstream fix
            _DRIFT_WARNINGS.pop(context, None)
    result = df.select(*out)
    result._strake_drift_warnings = warnings  # per-handle audit trail
    return result
