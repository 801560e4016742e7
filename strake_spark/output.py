"""Structured CLI output formats.

Reference: crates/cli/src/output.rs — a ``human | json | yaml``
output-format switch with a machine-readable response envelope
(``{"status": "success"|"error", "message": ..., "exit_code": ...,
**data}``). Human mode prints nothing extra (the command already wrote
its progress lines); machine modes print exactly one document, so
scripts can parse CLI results without scraping prose.
"""

from __future__ import annotations

import json
from typing import Any

FORMATS = ("human", "json", "yaml")


def is_machine_readable(fmt: str) -> bool:
    return fmt in ("json", "yaml")


def response(
    status: str,
    data: dict[str, Any] | None = None,
    message: str | None = None,
    exit_code: int | None = None,
) -> dict[str, Any]:
    """The reference's CommandResponse shape: data fields are flattened
    into the envelope (output.rs ``#[serde(flatten)]``)."""
    out: dict[str, Any] = {"status": status}
    if message is not None:
        out["message"] = message
    if exit_code is not None:
        out["exit_code"] = exit_code
    out.update(data or {})
    return out


def success(data: dict[str, Any] | None = None) -> dict[str, Any]:
    return response("success", data, exit_code=0)


def error(message: str, exit_code: int, data: dict[str, Any] | None = None) -> dict[str, Any]:
    return response("error", data, message=message, exit_code=exit_code)


def print_output(fmt: str, payload: dict[str, Any]) -> None:
    if fmt == "json":
        print(json.dumps(payload, indent=2, default=str))
    elif fmt == "yaml":
        import yaml

        print(yaml.safe_dump(payload, sort_keys=False), end="")
    # human: the command already printed its own lines (output.rs:58-62)
