"""Sandboxed Python execution — the engine's "Code Mode".

Reference: python/strake/sandbox/native.py:202-683 — pooled hardened
worker subprocesses with rlimits, network isolation
(unshare(CLONE_NEWNET)), seccomp, optional Firecracker microVMs; the
MCP ``run_python`` tool executes agent scripts against the engine
(python/strake/mcp.py:258-295).

This re-expression keeps the architecture (subprocess isolation, rlimit
resource caps, captured stdout, wall-clock timeout, result-size cap)
with portable primitives: ``resource.setrlimit`` for CPU/memory/
file-size/process caps, a scrubbed environment, on Linux with
CAP_NET_ADMIN an empty network namespace per child
(unshare(CLONE_NEWNET) between fork and exec, the reference's
native.py:546-557 isolation), and a seccomp-BPF syscall deny-list
(strake_spark.seccomp — socket/ptrace/mount/module syscalls return
EPERM) installed in the prelude before the user script. The
Firecracker microVM layer remains a privilege-dependent hook point;
everything degrades gracefully, mirroring the reference's fallback
ladder (native sandbox when Firecracker is unavailable,
native.py:202).

The executed script gets a ``strake`` shim whose ``sql(query)`` runs
against the parent engine via a result file – scripts never hold the
SparkSession. Queries are pre-executed by the PARENT (the sandbox has
no network and no JVM); the child only post-processes pandas frames.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import textwrap
from dataclasses import dataclass


@dataclass
class SandboxLimits:
    cpu_seconds: int = 10
    memory_mb: int = 512
    file_size_mb: int = 16
    max_processes: int = 8
    wall_seconds: float = 30.0
    max_output_bytes: int = 1_000_000
    # Interpreter-level introspection scrubs applied at the end of the
    # prelude (reference guest init, python/strake/agent_init.py:25-68:
    # del sys._getframe, tracebacklimit=0, exc_info block, build-class
    # restriction). Defense in depth against naive/accidental
    # introspection ONLY — never a boundary; see _HARDEN_SRC.
    harden_interpreter: bool = True
    # Linux: drop the child into an empty network namespace
    # (unshare(CLONE_NEWNET), reference native.py:546-557). Needs
    # CAP_NET_ADMIN; degrades silently to env-scrub-only elsewhere.
    isolate_network: bool = True
    # Linux: install the seccomp-BPF deny-list (strake_spark.seccomp)
    # before the user script runs — blocks socket creation (even
    # AF_UNIX), ptrace, mount, module loading with EPERM. Best-effort:
    # unknown arch or refused prctl degrades to rlimits+netns.
    seccomp: bool = True
    # Linux 5.13+ with the Landlock LSM: filesystem confinement —
    # read-only system allowlist + the python installation + the
    # pre-executed query results, read-write ONLY beneath the sandbox
    # tmp dir (reference policy.py:242-508). Best-effort: ENOSYS (this
    # container) degrades to the layers above; see
    # strake_spark.landlock for the gate.
    landlock: bool = True


_CLONE_NEWNET = 0x40000000


def _load_libc():
    if sys.platform != "linux":
        return None
    try:
        import ctypes

        return ctypes.CDLL(None, use_errno=True)
    except Exception:  # noqa: BLE001 - no libc -> no isolation
        return None


# Resolved at import: the post-fork pre-exec hook must not allocate or
# take locks (CDLL loading does both), only issue the raw syscall.
_LIBC = _load_libc()


def _unshare_network() -> bool:
    """unshare(CLONE_NEWNET) via libc (portable across CPython versions;
    os.unshare only exists on 3.12+). Returns True when the calling
    process is now in an empty netns."""
    if _LIBC is None:
        return False
    try:
        return _LIBC.unshare(_CLONE_NEWNET) == 0
    except Exception:  # noqa: BLE001
        return False


# Exec chain for netns isolation: unshare(CLONE_NEWNET) best-effort
# (EPERM without CAP_NET_ADMIN -> falls through with isolation absent,
# the reference's degrade ladder), then exec the real sandboxed script
# under -I. Runs in its own fresh interpreter, so no post-fork hazards.
_NET_BOOTSTRAP = (
    "import ctypes, os, sys\n"
    "ctypes.CDLL(None, use_errno=True).unshare(0x40000000)\n"
    "os.execv(sys.executable, [sys.executable, '-I', sys.argv[1]])\n"
)


def network_isolation_available() -> bool:
    """Probe (in a throwaway fork) whether netns isolation will apply."""
    if sys.platform != "linux":
        return False
    pid = os.fork()
    if pid == 0:  # pragma: no cover - child
        os._exit(0 if _unshare_network() else 1)
    _, status = os.waitpid(pid, 0)
    return os.waitstatus_to_exitcode(status) == 0


@dataclass
class SandboxResult:
    ok: bool
    stdout: str
    stderr: str
    error: str | None = None
    attestation: "SandboxAttestation | None" = None


@dataclass
class ScopedToken:
    """Capability-scoped token bound to one sandbox instance
    (reference policy.py:28-38): valid only for the sandbox id it was
    minted for, so a token exfiltrated from one sandbox run is useless
    in any other."""

    token_str: str
    sandbox_id: str
    claims: dict = None  # type: ignore[assignment]

    def __post_init__(self) -> None:
        if self.claims is None:
            self.claims = {}

    def is_valid_for(self, sandbox_id: str) -> bool:
        return self.sandbox_id == sandbox_id


@dataclass
class SandboxAttestation:
    """Audit record of the hardening layers CONFIGURED for a sandbox
    run (reference policy.py:40-74). NOT cryptographic attestation —
    ``sign()`` is a plain SHA-256 over the payload, reproducible by
    anyone with the same inputs; the reference carries the same
    caveat. Constraints name the layers the parent requested; the
    in-child snippets degrade best-effort, so presence here means
    "attempted under the documented degrade ladder"."""

    sandbox_id: str
    constraints_applied: list
    timestamp: float
    landlock_abi_version: int | None = None

    def sign(self) -> str:
        import hashlib
        import json as _json

        payload = _json.dumps(
            {
                "id": self.sandbox_id,
                "constraints": self.constraints_applied,
                "timestamp": self.timestamp,
                "landlock_abi": self.landlock_abi_version,
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()


_PRELUDE = """\
import resource, sys, os

def _cap(limit, value):
    try:
        resource.setrlimit(limit, (value, value))
    except (ValueError, OSError):
        pass  # privilege-dependent; keep going with what we can enforce

_cap(resource.RLIMIT_CPU, {cpu})
_cap(resource.RLIMIT_AS, {mem} * 1024 * 1024)
_cap(resource.RLIMIT_FSIZE, {fsize} * 1024 * 1024)
_cap(resource.RLIMIT_NPROC, {nproc})
# network isolation happens pre-exec (unshare(CLONE_NEWNET), see
# run_python); the landlock + seccomp snippets below (when enabled)
# are the last hardening layers before the user script; remaining
# hook point: Firecracker microVM with privileges
{landlock_src}
{seccomp_src}

import types

class _Strake(types.SimpleNamespace):
    def sql(self, query):
        key = self._queries.get(query)
        if key is None:
            raise RuntimeError(
                "query not pre-registered with the sandbox: " + query[:100]
            )
        import pandas as _pd
        return _pd.read_parquet(key)

strake = _Strake(_queries={queries!r})
del types
{harden_src}
"""

# Interpreter hardening snippet — the LAST prelude layer, after the
# strake namespace exists and before the user script. Mirrors the
# reference guest's _harden_environment (agent_init.py:25-68) with its
# exact caveat: these disable CONVENIENT introspection entry points
# only; ctypes, C extensions, and frame chains reachable from imported
# modules bypass every one of them. The security boundary is the layer
# stack above (rlimits / netns / seccomp / landlock) — never this.
#
# One deliberate delta: the build-class restriction applies to classes
# defined in the USER SCRIPT (__main__) only. The reference guest
# pre-loads its engine and can restrict all class creation; this
# sandbox supports arbitrary library imports (pandas inside the script
# is a pinned behavior), and module import executes class statements
# freely under their own module __name__.
_HARDEN_SRC = """\
def _harden():
    import builtins as bi
    if hasattr(sys, "_getframe"):
        del sys._getframe  # the convenient frame-access shortcut
    sys.tracebacklimit = 0  # no host paths leak through error output
    def no_exc_info():
        return (None, None, None)
    sys.exc_info = no_exc_info  # accidental frame exposure only
    real_build_class = bi.__build_class__
    def guarded_build_class(func, name, *bases, **kwds):
        if func.__globals__.get("__name__") == "__main__":
            for base in bases:
                if base is object or (
                    isinstance(base, type) and issubclass(base, BaseException)
                ):
                    continue
                raise TypeError(
                    "sandbox: inheriting from "
                    + repr(getattr(base, "__name__", base))
                    + " is forbidden in the sandboxed script"
                )
        return real_build_class(func, name, *bases, **kwds)
    bi.__build_class__ = guarded_build_class
_harden()
del _harden
"""


def run_python(
    script: str,
    limits: SandboxLimits | None = None,
    query_results: dict[str, str] | None = None,
) -> SandboxResult:
    """Execute ``script`` in a resource-capped subprocess.

    ``query_results`` maps SQL text -> parquet path of the pre-executed
    result (the parent engine runs the queries; the child gets data,
    never the engine)."""
    limits = limits or SandboxLimits()
    seccomp_src = ""
    if limits.seccomp and sys.platform == "linux":
        from strake_spark.seccomp import apply_source

        seccomp_src = apply_source()
    with tempfile.TemporaryDirectory(prefix="strake-sbx-") as tmp:
        landlock_src = ""
        if limits.landlock and sys.platform == "linux":
            from strake_spark import landlock as _ll

            # reads: the python installation (pandas/pyarrow import
            # AFTER the ruleset applies) + the parent-executed query
            # result files; writes: only the sandbox tmp dir
            reads = [sys.prefix, sys.base_prefix] + [
                os.path.dirname(p) for p in (query_results or {}).values()
            ]
            landlock_src = _ll.apply_source(tuple(reads), (tmp,))
        prelude = _PRELUDE.format(
            cpu=limits.cpu_seconds,
            mem=limits.memory_mb,
            fsize=limits.file_size_mb,
            nproc=limits.max_processes,
            queries=query_results or {},
            seccomp_src=seccomp_src,
            landlock_src=landlock_src,
            harden_src=_HARDEN_SRC if limits.harden_interpreter else "",
        )
        path = os.path.join(tmp, "script.py")
        with open(path, "w") as f:
            f.write(prelude + "\n" + textwrap.dedent(script))
        env = {
            "PATH": "/usr/bin:/bin",
            "HOME": tmp,
            "TMPDIR": tmp,
            # no proxy/credential env vars leak into the sandbox
            # single-threaded BLAS/OMP: thread pools would blow the
            # RLIMIT_NPROC cap (and a sandbox shouldn't fan out anyway)
            "OPENBLAS_NUM_THREADS": "1",
            "OMP_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
            "NUMEXPR_NUM_THREADS": "1",
        }
        if limits.isolate_network and sys.platform == "linux":
            # A fresh single-threaded bootstrap interpreter unshares the
            # netns and execs the real script. Deliberately NOT a
            # preexec_fn: the Spark driver is multi-threaded, and any
            # interpreter work between fork and exec (ctypes argument
            # marshalling included) can deadlock on locks held by other
            # threads at fork time.
            cmd = [sys.executable, "-c", _NET_BOOTSTRAP, path]
        else:
            cmd = [sys.executable, "-I", path]  # -I: isolated mode
        import time
        import uuid

        constraints = ["rlimits", "env_scrub"]
        if limits.harden_interpreter:
            constraints.append("interpreter")
        if limits.isolate_network and sys.platform == "linux":
            constraints.append("netns")
        if seccomp_src:
            constraints.append("seccomp")
        if landlock_src:
            constraints.append("landlock")
        from strake_spark.landlock import detect_abi as _ll_abi

        attestation = SandboxAttestation(
            sandbox_id=str(uuid.uuid4()),
            constraints_applied=constraints,
            timestamp=time.time(),
            landlock_abi_version=(a if (a := _ll_abi()) > 0 else None),
        )
        try:
            proc = subprocess.run(
                cmd,
                capture_output=True,
                timeout=limits.wall_seconds,
                env=env,
                cwd=tmp,
            )
        except subprocess.TimeoutExpired:
            return SandboxResult(
                False, "", "",
                error=f"wall-clock timeout ({limits.wall_seconds}s)",
                attestation=attestation,
            )
    stdout = proc.stdout[: limits.max_output_bytes].decode(errors="replace")
    stderr = proc.stderr[: limits.max_output_bytes].decode(errors="replace")
    if proc.returncode != 0:
        return SandboxResult(
            False, stdout, stderr, error=f"exit code {proc.returncode}",
            attestation=attestation,
        )
    return SandboxResult(True, stdout, stderr, attestation=attestation)


class InjectionGuard:
    """Prompt-injection scan of result text (reference: Aho-Corasick
    scanner with disabled/dry_run/enforce modes,
    python/src/connection.rs:27-95,370-412). Substring automaton over a
    pattern list; mode semantics preserved."""

    DEFAULT_PATTERNS = (
        "ignore previous instructions",
        "ignore all previous instructions",
        "disregard your instructions",
        "you are now",
        "system prompt",
        "<|im_start|>",
        "###instruction",
        "do anything now",
    )

    def __init__(self, mode: str = "disabled", patterns=None) -> None:
        if mode not in ("disabled", "dry_run", "enforce"):
            raise ValueError(f"unknown guard mode {mode!r}")
        self.mode = mode
        self.patterns = tuple(p.lower() for p in (patterns or self.DEFAULT_PATTERNS))

    def scan(self, text: str) -> list[str]:
        low = text.lower()
        return [p for p in self.patterns if p in low]

    def check(self, text: str) -> tuple[str, list[str]]:
        """-> (possibly-redacted text, matched patterns). In enforce
        mode matched content is replaced; dry_run only reports."""
        if self.mode == "disabled":
            return text, []
        hits = self.scan(text)
        if not hits or self.mode == "dry_run":
            return text, hits
        redacted = text
        for p in hits:
            # case-insensitive replace
            idx = redacted.lower().find(p)
            while idx != -1:
                redacted = redacted[:idx] + "[REDACTED]" + redacted[idx + len(p):]
                idx = redacted.lower().find(p)
        return redacted, hits


def json_result(result: SandboxResult) -> str:
    return json.dumps(
        {
            "ok": result.ok,
            "stdout": result.stdout,
            "stderr": result.stderr,
            "error": result.error,
        }
    )
