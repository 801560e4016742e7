"""MCP sidecar supervisor — subprocess lifecycle management.

Reference parity: crates/runtime/src/sidecar.rs — the server supervises
its MCP agent process with:

- restart on exit, with JITTERED EXPONENTIAL BACKOFF
  (sidecar.rs calculate_backoff: base 1 s doubling, capped 30 s,
  ±25 % jitter so a fleet of replicas never thunders in phase),
- a retry CIRCUIT BREAKER: after ``max_retries`` consecutive failures
  the supervisor stops churning and sleeps a cooldown before trying
  again ("prevents log spam and CPU waste when the Python environment
  is permanently misconfigured"),
- a startup delay, then a periodic HEALTH CHECK loop; an unhealthy or
  exited child is restarted (a healthy tick resets the failure count),
- GRACEFUL SHUTDOWN: terminate (SIGTERM), wait the shutdown timeout,
  kill as backstop — kill-on-drop semantics so no process leaks.

The child here is any argv (the reference hardcodes ``python -m
strake.mcp``; our MCP server speaks stdio, so the default health view
is process-liveness, with an optional ``health_probe`` callable for
HTTP-port children, mirroring McpConfig.health_check_url).

Config fields mirror crates/common/src/config.rs McpConfig
(max_retries, cooldown_secs, startup_delay_ms,
health_check_interval_ms, shutdown_timeout_ms).
"""

from __future__ import annotations

import logging
import random
import subprocess
import threading
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

logger = logging.getLogger("strake_spark.sidecar")


def calculate_backoff(
    consecutive_failures: int,
    base_ms: int = 1000,
    max_ms: int = 30_000,
    rng: random.Random | None = None,
) -> int:
    """Exponential backoff with ±25 % jitter (sidecar.rs:332-349):
    base * 2^n, capped, then jittered inside [0.75x, 1.25x)."""
    exp = base_ms * (2 ** min(max(consecutive_failures, 0), 10))
    delay = min(exp, max_ms)
    jitter = int(delay * 0.25)
    if jitter <= 0:
        return delay
    r = rng if rng is not None else random
    return delay - jitter + r.randrange(0, jitter * 2)


@dataclass
class SidecarConfig:
    cmd: Sequence[str]
    env: dict[str, str] | None = None
    max_retries: int = 5
    cooldown_secs: float = 60.0
    startup_delay_ms: int = 500
    health_check_interval_ms: int = 5000
    shutdown_timeout_ms: int = 3000
    backoff_base_ms: int = 1000
    backoff_max_ms: int = 30_000
    # Optional active probe (HTTP-port children); None = liveness only.
    health_probe: Callable[[], bool] | None = None


@dataclass
class SidecarStats:
    """Observability counters for tests and /metrics."""

    spawns: int = 0
    restarts_after_exit: int = 0
    restarts_after_unhealthy: int = 0
    cooldowns: int = 0
    consecutive_failures: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)


class SidecarHandle:
    """Started supervisor; ``shutdown()`` stops the loop and gracefully
    terminates the child (sidecar.rs SidecarHandle::shutdown)."""

    def __init__(self, config: SidecarConfig) -> None:
        self.config = config
        self.stats = SidecarStats()
        self._stop = threading.Event()
        self._child: subprocess.Popen | None = None
        self._child_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._supervise, name="mcp-sidecar-supervisor", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------ child ops
    def _spawn(self) -> subprocess.Popen:
        child = subprocess.Popen(  # noqa: S603 - supervisor's purpose
            list(self.config.cmd), env=self.config.env
        )
        with self._child_lock:
            self._child = child
        self.stats.spawns += 1
        logger.info("Sidecar started (pid=%s)", child.pid)
        return child

    def _graceful_stop(self, child: subprocess.Popen) -> None:
        """SIGTERM, wait the shutdown timeout, SIGKILL backstop."""
        if child.poll() is not None:
            return
        child.terminate()
        try:
            child.wait(timeout=self.config.shutdown_timeout_ms / 1000.0)
        except subprocess.TimeoutExpired:
            logger.warning("Sidecar ignored SIGTERM; killing (pid=%s)", child.pid)
            child.kill()
            child.wait()

    # ------------------------------------------------------------ the loop
    def _supervise(self) -> None:
        cfg = self.config
        while not self._stop.is_set():
            if self.stats.consecutive_failures >= cfg.max_retries:
                logger.error(
                    "Sidecar reached max retries (%d). Entering cooldown (%.0fs).",
                    self.stats.consecutive_failures, cfg.cooldown_secs,
                )
                self.stats.cooldowns += 1
                if self._stop.wait(cfg.cooldown_secs):
                    return
                logger.info("Cooldown elapsed. Attempting sidecar restart.")
                self.stats.consecutive_failures = 0

            try:
                child = self._spawn()
            except OSError as e:
                logger.error("Sidecar spawn failed: %s", e)
                self.stats.consecutive_failures += 1
                if self._stop.wait(self._backoff() / 1000.0):
                    return
                continue

            # non-blocking startup delay (interruptible)
            if cfg.startup_delay_ms > 0 and self._stop.wait(cfg.startup_delay_ms / 1000.0):
                self._graceful_stop(child)
                return

            # health loop
            while True:
                if self._stop.wait(cfg.health_check_interval_ms / 1000.0):
                    self._graceful_stop(child)
                    return
                status = child.poll()
                if status is not None:
                    logger.warning("Sidecar exited with status %s", status)
                    self.stats.restarts_after_exit += 1
                    self.stats.consecutive_failures += 1
                    break
                if cfg.health_probe is not None:
                    try:
                        healthy = bool(cfg.health_probe())
                    except Exception:  # noqa: BLE001 - a raising probe is unhealthy
                        healthy = False
                    if not healthy:
                        logger.warning("Sidecar health check failed; restarting")
                        self._graceful_stop(child)
                        self.stats.restarts_after_unhealthy += 1
                        self.stats.consecutive_failures += 1
                        break
                # healthy tick: the environment works — reset the breaker
                self.stats.consecutive_failures = 0

            if not self._stop.is_set():
                if self._stop.wait(self._backoff() / 1000.0):
                    return

    def _backoff(self) -> int:
        return calculate_backoff(
            self.stats.consecutive_failures,
            base_ms=self.config.backoff_base_ms,
            max_ms=self.config.backoff_max_ms,
        )

    # ------------------------------------------------------------ lifecycle
    def child_pid(self) -> int | None:
        with self._child_lock:
            return self._child.pid if self._child is not None else None

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=30)
        with self._child_lock:
            child = self._child
        if child is not None:
            self._graceful_stop(child)

    def __enter__(self) -> "SidecarHandle":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()


def spawn_sidecar(config: SidecarConfig) -> SidecarHandle:
    """Start supervising ``config.cmd``; returns the handle
    (sidecar.rs spawn_sidecar shape — store it and call shutdown())."""
    return SidecarHandle(config)
