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
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from strake_spark.errors import ErrorCode

log = logging.getLogger("strake_spark.drift")


def reconcile(df: DataFrame, declared: T.StructType, context: str = "") -> DataFrame:
    """Adapt ``df`` to the declared schema (order, names, types).

    - declared column missing from source  -> NULL literal of declared type
    - type mismatch                        -> cast (uncastable -> analysis error
      surfaces immediately, matching the reference's warning-then-null only
      for runtime value failures, which Spark's ANSI-off cast handles as NULL)
    - extra source columns                 -> pruned

    Each warning string is prefixed with its stable drift code
    ([STRAKE-2009] missing / [STRAKE-2010] type change / [STRAKE-2011]
    extra column, reference code.rs:57-72) so trace() consumers can
    branch without string-matching prose.
    """
    actual = {f.name.lower(): f for f in df.schema.fields}
    out = []
    warnings: list[str] = []
    for field in declared.fields:
        src = actual.get(field.name.lower())
        if src is None:
            warnings.append(
                f"[{ErrorCode.SCHEMA_DRIFT_MISSING_COLUMN}] missing column {field.name!r}: NULL-filled"
            )
            out.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif src.dataType != field.dataType:
            warnings.append(
                f"[{ErrorCode.SCHEMA_DRIFT_TYPE_CHANGED}] "
                f"type drift on {field.name!r}: {src.dataType.simpleString()} -> "
                f"{field.dataType.simpleString()} (cast)"
            )
            out.append(F.col(src.name).cast(field.dataType).alias(field.name))
        else:
            out.append(F.col(src.name).alias(field.name))
    extra = set(actual) - {f.name.lower() for f in declared.fields}
    if extra:
        warnings.append(
            f"[{ErrorCode.SCHEMA_DRIFT_EXTRA_COLUMN}] pruned extra columns: {sorted(extra)}"
        )
    for w in warnings:
        log.warning("[schema-drift] %s: %s", context, w)
    result = df.select(*out)
    result._strake_drift_warnings = warnings  # surfaced via engine.trace()
    return result
