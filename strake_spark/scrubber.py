"""Best-effort PII scrubber for audit-log lines.

Reference parity: crates/common/src/scrubber.rs:1-53 — SQL text is
scrubbed of email / SSN / credit-card / phone literals before it
reaches any audit sink (the reference applies it in both server
facades: flight_sql.rs:149 and api.rs's rest_query event). Same
warning applies here as there: regex scrubbing is defense-in-depth,
not a sanitization guarantee — high-compliance deployments should
disable literal logging entirely.

Scope note: only the SERVER audit streams scrub. The engine's
in-memory query log keeps raw SQL because ``impact()`` re-parses those
statements for reverse lineage — scrubbing them would corrupt the
governance surface the log exists for (the reference makes the same
split: its engine receives the raw SQL, only the tracing events get
the scrubbed copy).

Replacement order matches the reference (email, SSN, credit card,
phone): SSN must run before the credit-card pattern (a 3-2-4 digit
group is 9 digits — under the card minimum, but the card regex's
lenient separator handling could otherwise swallow parts of longer
mixed strings), and phone runs last so card-length digit runs are
already collapsed.
"""

from __future__ import annotations

import re

_EMAIL = re.compile(r"[A-Z0-9._%+-]+@[A-Z0-9.-]+\.[A-Z]{2,}", re.IGNORECASE)
_SSN = re.compile(r"\b\d{3}-\d{2}-\d{4}\b")
_CREDIT_CARD = re.compile(r"\b(?:\d[ -]*?){13,16}\b")
_PHONE = re.compile(r"(?:\+?1[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}")


def scrub(text: str) -> str:
    """Replace PII-shaped literals with typed tokens, reference
    scrubber.rs semantics: [EMAIL], [SSN], [CREDIT_CARD], [PHONE]."""
    out = _EMAIL.sub("[EMAIL]", text)
    out = _SSN.sub("[SSN]", out)
    out = _CREDIT_CARD.sub("[CREDIT_CARD]", out)
    return _PHONE.sub("[PHONE]", out)
