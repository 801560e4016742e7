"""Text-protocol value parsing shared by the jar-free wire clients.

Postgres renders timestamptz offsets as ``+03`` (hour-only) and trims
trailing zeros from fractional seconds; MySQL DATETIME(n) renders
exactly n fraction digits. Python 3.11+ ``datetime.fromisoformat``
accepts all of these, but 3.10 — this package's declared floor —
requires ``+HH:MM`` offsets and exactly 3- or 6-digit fractions
(r19 review: every non-null timestamp cell on 3.10 raised ValueError).
``parse_wire_timestamp`` normalizes those wire shapes first, so the
row-decode paths behave identically across supported Pythons.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

# hour-only or compact '+HHMM' UTC offset at end-of-string (a ':'
# between the digit pairs means it is already ISO-shaped)
_OFFSET_RE = _re.compile(r"([+-]\d{2})(\d{2})?$")
# fractional seconds, ending at the offset or end-of-string
_FRAC_RE = _re.compile(r"\.(\d+)(?=[+-]|$)")


def parse_wire_timestamp(s: str) -> _dt.datetime:
    """``datetime.fromisoformat`` with wire-text normalization."""
    try:
        return _dt.datetime.fromisoformat(s)
    except ValueError:
        pass
    t = s
    m = _OFFSET_RE.search(t)
    if m:
        t = t[: m.start()] + m.group(1) + ":" + (m.group(2) or "00")
    m = _FRAC_RE.search(t)
    if m:
        t = t[: m.start()] + "." + (m.group(1) + "000000")[:6] + t[m.end() :]
    return _dt.datetime.fromisoformat(t)
