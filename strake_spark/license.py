"""License validation cache + background monitor.

Reference parity: crates/server/src/license.rs — a three-state license
cache (VALID / DEGRADED / INVALID) read on the query hot path, updated
by a background monitor polling a pluggable validator:

- the hot-path read is lock-free in the reference (atomic u8); here a
  plain attribute read under the GIL gives the same property,
- the monitor performs an immediate first check, then re-validates on
  an interval; a validator ERROR keeps the cached state (license.rs:
  81-85 "Keep using cached state") so a flaky license endpoint never
  takes queries down,
- state transitions are logged (license.rs:76-79).

Enforcement (wired by the facades, mirroring the reference):
- Flight (`server.py`): INVALID rejects with permission-denied
  ("License invalid or expired…", flight_sql.rs:131-136); DEGRADED
  logs a warning and proceeds (flight_sql.rs:138-141).
- REST (`rest_api.py`): INVALID answers the query endpoint with the
  error QueryResponse shape ("License invalid. Please renew
  subscription.", api.rs:237-244).

No validator configured → the cache stays at its VALID default and
the facades behave exactly as before (open-core mode).
"""

from __future__ import annotations

import enum
import logging
import threading
import time
from typing import Protocol

logger = logging.getLogger("strake_spark.license")


class LicenseState(enum.Enum):
    VALID = 0
    DEGRADED = 1
    INVALID = 2


class LicenseCache:
    """Hot-path state holder: reads are a single attribute load (GIL-
    atomic), updates record the check time (license.rs:41-49)."""

    def __init__(self) -> None:
        self._state = LicenseState.VALID
        self._last_check: float = 0.0

    def current_state(self) -> LicenseState:
        return self._state

    def last_check(self) -> float:
        return self._last_check

    def update_state(self, state: LicenseState) -> None:
        self._state = state
        self._last_check = time.time()


class LicenseValidator(Protocol):
    def validate(self) -> LicenseState:  # pragma: no cover - protocol
        ...


def start_license_monitor(
    validator: LicenseValidator,
    cache: LicenseCache,
    check_interval: float = 3600.0,
) -> tuple[threading.Thread, threading.Event]:
    """Daemon thread polling ``validator`` into ``cache`` — immediate
    first check, then every ``check_interval`` seconds; validator
    exceptions keep the cached state. Returns (thread, stop_event);
    set the event to end the loop (the reference's tokio task is
    killed with the server — the explicit stop event is the
    thread-world equivalent for tests and clean shutdown)."""
    stop = threading.Event()

    def _loop() -> None:
        try:
            cache.update_state(validator.validate())
        except Exception as e:  # noqa: BLE001 - keep cached state
            logger.error("Initial license validation failed: %s", e)
        while not stop.wait(check_interval):
            try:
                state = validator.validate()
            except Exception as e:  # noqa: BLE001 - keep cached state
                logger.error("License re-validation failed: %s", e)
                continue
            prev = cache.current_state()
            if prev is not state:
                logger.info("License state transition: %s -> %s", prev.name, state.name)
                cache.update_state(state)

    t = threading.Thread(target=_loop, name="license-monitor", daemon=True)
    t.start()
    return t, stop
