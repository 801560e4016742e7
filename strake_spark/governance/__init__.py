from strake_spark.governance.gate import classify_statement, ensure_select, sanitize_identifier
from strake_spark.governance.limits import apply_defensive_limit, check_cost, run_with_timeout

__all__ = [
    "classify_statement",
    "ensure_select",
    "sanitize_identifier",
    "apply_defensive_limit",
    "check_cost",
    "run_with_timeout",
]
