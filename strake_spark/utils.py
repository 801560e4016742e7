"""Path helpers — where per-project state (traces, local config) lives.

Reference: python/strake/utils.py:7-60 — ``get_script_dir`` resolves
the running script's directory (skipping runner binaries like pytest
and refusing read-only locations) and ``get_strake_dir`` prefers a
project-local ``.strake`` directory next to the script over the
``~/.strake`` home fallback, so agent traces and caches land with the
project they belong to.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_RUNNER_MARKERS = ("pytest", "pytest-3", "pip", "poetry", "uv")


def get_script_dir() -> Path | None:
    """Absolute directory of the executing script, or None when it
    cannot be determined safely (runner binaries, read-only parents)."""
    if not sys.argv or not sys.argv[0]:
        return None
    try:
        script_path = Path(sys.argv[0]).resolve()
        basename = script_path.name.lower()
        # `python -m pytest` resolves to .../pytest/__main__.py: the
        # runner marker is the package directory, not the file name
        if basename == "__main__.py":
            basename = script_path.parent.name.lower()
        if any(marker in basename for marker in _RUNNER_MARKERS):
            return None
        if script_path.is_file():
            parent = script_path.parent
            # refuse read-only volumes (e.g. /usr/bin entry points)
            if os.access(parent, os.W_OK):
                return parent
    except (OSError, ValueError):
        pass
    return None


def get_app_dir(subdir: str | None = None) -> Path:
    """The resolved ``.strake_spark`` state directory: script-relative
    when the project directory is known and writable, else
    ``~/.strake_spark`` (reference get_strake_dir semantics)."""
    script_dir = get_script_dir()
    if script_dir:
        base = (script_dir / ".strake_spark").resolve()
    else:
        base = Path(os.path.expanduser("~/.strake_spark")).resolve()
    return (base / subdir).resolve() if subdir else base
