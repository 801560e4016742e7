"""Structured CLI exit codes for machine-readable error handling.

Reference parity: crates/cli/src/exit_codes.rs — CI/CD pipelines
distinguish failure classes by exit status instead of parsing stderr.
Same numbering as the reference:

    0 SUCCESS            standard convention
    1 GENERAL_ERROR      fallback for unknown errors
    2 USAGE_ERROR        invalid arguments / missing flags (argparse
                         already exits 2 on usage errors; `diff` also
                         returns 2 for "differences found" — the
                         git-diff convention, documented there)
    3 CONFIG_ERROR       YAML parse failure, invalid schema
    4 CONNECTION_ERROR   database unreachable, timeout, network failure
    5 VALIDATION_ERROR   contract violation, missing source/table
    6 CONFLICT_ERROR     optimistic-lock failure, state mismatch
    7 PERMISSION_ERROR   unauthorized, governance/license refusal
    8 PARTIAL_FAILURE    some operations succeeded, others failed
"""

from __future__ import annotations

SUCCESS = 0
GENERAL_ERROR = 1
USAGE_ERROR = 2
CONFIG_ERROR = 3
CONNECTION_ERROR = 4
VALIDATION_ERROR = 5
CONFLICT_ERROR = 6
PERMISSION_ERROR = 7
PARTIAL_FAILURE = 8
