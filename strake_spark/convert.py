"""Spark exception -> coded StrakeError classification.

Reference behavior: crates/error/src/convert.rs maps the underlying
engine's error taxonomy onto the stable STRAKE-NNNN contract — field
not found gains a did-you-mean hint, plan/parse failures become syntax
errors, everything else stays internal (5001). Spark-side the
classification key is the error CONDITION (PySpark >= 4
``getCondition()``, the stable error-class registry), never message
prose — conditions are versioned API, prose is not.

Only the condition's HEAD segment is matched (``DATATYPE_MISMATCH.
UNEXPECTED_INPUT_TYPE`` -> ``DATATYPE_MISMATCH``): Spark sub-classes
multiply per release, the heads are stable.
"""

from __future__ import annotations

from strake_spark.errors import EngineError, ErrorCode

# Spark error-condition head -> stable code. The mapped set mirrors the
# reference's explicit arms (FieldNotFound / SyntaxError); the rest of
# the 2xxx family is classified here because Spark exposes the
# conditions DataFusion lacked.
_CONDITION_CODES: dict[str, ErrorCode] = {
    "UNRESOLVED_COLUMN": ErrorCode.FIELD_NOT_FOUND,
    "UNRESOLVED_FIELD": ErrorCode.FIELD_NOT_FOUND,
    "UNRESOLVED_MAP_KEY": ErrorCode.FIELD_NOT_FOUND,
    "UNRESOLVED_USING_COLUMN_FOR_JOIN": ErrorCode.FIELD_NOT_FOUND,
    "FIELD_NOT_FOUND": ErrorCode.FIELD_NOT_FOUND,
    "COLUMN_NOT_FOUND": ErrorCode.FIELD_NOT_FOUND,
    "TABLE_OR_VIEW_NOT_FOUND": ErrorCode.TABLE_NOT_FOUND,
    "VIEW_NOT_FOUND": ErrorCode.TABLE_NOT_FOUND,
    "PARSE_SYNTAX_ERROR": ErrorCode.SYNTAX_ERROR,
    "PARSE_EMPTY_STATEMENT": ErrorCode.SYNTAX_ERROR,
    "INVALID_SQL_SYNTAX": ErrorCode.SYNTAX_ERROR,
    "DATATYPE_MISMATCH": ErrorCode.TYPE_MISMATCH,
    "CAST_INVALID_INPUT": ErrorCode.TYPE_MISMATCH,
    "CANNOT_CAST_DATATYPE": ErrorCode.TYPE_MISMATCH,
    "AMBIGUOUS_REFERENCE": ErrorCode.AMBIGUOUS_COLUMN,
    "AMBIGUOUS_COLUMN_OR_FIELD": ErrorCode.AMBIGUOUS_COLUMN,
    "AMBIGUOUS_COLUMN_REFERENCE": ErrorCode.AMBIGUOUS_COLUMN,
}


def classify_exception(exc: BaseException) -> EngineError | None:
    """Classify a Spark query-layer exception onto the code contract.

    Returns None for anything that is not a condition-carrying Spark
    error (StrakeErrors already carry codes; arbitrary exceptions stay
    un-reclassified for the caller to wrap as unknown/internal)."""
    cond_fn = getattr(exc, "getCondition", None) or getattr(exc, "getErrorClass", None)
    if cond_fn is None:
        return None
    try:
        cond = cond_fn()
    except Exception:
        return None
    if not cond:
        return None
    code = _CONDITION_CODES.get(cond.split(".")[0], ErrorCode.ENGINE_INTERNAL)
    try:
        params = dict(exc.getMessageParameters() or {})
    except Exception:
        params = {}
    hint = None
    context: dict | None = None
    if code is ErrorCode.FIELD_NOT_FOUND:
        proposals = [
            p.strip() for p in params.get("proposal", "").split(",") if p.strip()
        ]
        if proposals:
            # Spark already computed the closest matches (the reference
            # runs its own Levenshtein pass to build the same hint,
            # convert.rs:72-107); surface the first one
            hint = f"Did you mean {proposals[0]}?"
        # structured variant fields per context.rs FieldNotFound
        context = {
            "type": "field_not_found",
            "field": params.get("objectName"),
            "table": None,
            "available_fields": proposals,
        }
    elif code is ErrorCode.TABLE_NOT_FOUND and params.get("relationName"):
        context = {
            "type": "table_not_found",
            "table": params.get("relationName"),
        }
    elif code is ErrorCode.TYPE_MISMATCH and params:
        # Spark's mismatch params (sqlExpr/inputType/requiredType…) are
        # already flat strings — pass them through under the tag
        context = {"type": "type_mismatch", **{k: str(v) for k, v in params.items()}}
    # first line only: Spark's full text repeats the condition and can
    # embed multi-line plan fragments; the condition is preserved in
    # the message head for log greps
    msg = str(exc).strip().splitlines()[0][:500]
    return EngineError(msg, code=code, hint=hint, context=context)
