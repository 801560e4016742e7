"""seccomp-BPF syscall filter for the Code-Mode sandbox.

Reference: python/strake/policy.py:76-230 — a seccomp layer under the
sandbox's rlimit/netns hardening. Re-expressed without libseccomp: the
classic BPF program is a few fixed instruction shapes, so it is built
here as raw ``sock_filter`` bytes and installed with two prctl calls
(PR_SET_NO_NEW_PRIVS, then PR_SET_SECCOMP with SECCOMP_MODE_FILTER) —
both are plain libc calls reachable via ctypes.

Policy: a DENY-LIST returning EPERM for syscalls a data-processing
script has no business making — socket creation (defense in depth
under the netns: even AF_UNIX is refused), ptrace, mount family,
kernel-module loading — and ALLOW for everything else. An allow-list
would be stronger but needs per-libc curation; the reference's policy
layer takes the same deny-shape for its default profile.

The filter checks the audit arch of every syscall (mandatory for any
BPF filter: syscall numbers are per-arch) and allows foreign-arch
syscalls rather than mis-numbering them; x86_64 and aarch64 tables are
provided. Unknown build arch -> no filter (the sandbox's documented
degrade ladder, sandbox.py).
"""

from __future__ import annotations

import platform
import struct

# ---- BPF opcodes (linux/filter.h) -----------------------------------
_BPF_LD_W_ABS = 0x20
_BPF_JMP_JEQ_K = 0x15
_BPF_RET_K = 0x06

_SECCOMP_RET_ALLOW = 0x7FFF0000
_SECCOMP_RET_ERRNO = 0x00050000
_EPERM = 1

# seccomp_data offsets
_OFF_NR = 0
_OFF_ARCH = 4

# audit arch constants (linux/audit.h)
_AUDIT_ARCH = {
    "x86_64": 0xC000003E,
    "aarch64": 0xC00000B7,
}

# syscall numbers per arch for the denied set
_DENY_SYSCALLS = {
    "x86_64": {
        "socket": 41, "connect": 42, "accept": 43, "bind": 49,
        "listen": 50, "socketpair": 53, "accept4": 288,
        "ptrace": 101, "process_vm_readv": 310, "process_vm_writev": 311,
        "mount": 165, "umount2": 166, "pivot_root": 155,
        "init_module": 175, "finit_module": 313, "delete_module": 176,
        "kexec_load": 246, "open_by_handle_at": 304,
        "reboot": 169, "swapon": 167, "swapoff": 168,
    },
    "aarch64": {
        "socket": 198, "connect": 203, "accept": 202, "bind": 200,
        "listen": 201, "socketpair": 199, "accept4": 242,
        "ptrace": 117, "process_vm_readv": 270, "process_vm_writev": 271,
        "mount": 40, "umount2": 39, "pivot_root": 41,
        "init_module": 105, "finit_module": 273, "delete_module": 106,
        "kexec_load": 104, "open_by_handle_at": 265,
        "reboot": 142, "swapon": 224, "swapoff": 225,
    },
}


def _insn(code: int, jt: int, jf: int, k: int) -> bytes:
    return struct.pack("<HBBI", code, jt, jf, k)


def build_filter(arch: str | None = None) -> bytes | None:
    """sock_filter program bytes for the deny-list, or None when the
    arch has no table (caller skips seccomp — degrade, don't break)."""
    arch = arch or platform.machine()
    audit = _AUDIT_ARCH.get(arch)
    nrs = _DENY_SYSCALLS.get(arch)
    if audit is None or nrs is None:
        return None
    denied = sorted(nrs.values())
    n = len(denied)
    prog = [
        _insn(_BPF_LD_W_ABS, 0, 0, _OFF_ARCH),
        # arch mismatch -> ALLOW (numbers below would be meaningless)
        _insn(_BPF_JMP_JEQ_K, 1, 0, audit),
        _insn(_BPF_RET_K, 0, 0, _SECCOMP_RET_ALLOW),
        _insn(_BPF_LD_W_ABS, 0, 0, _OFF_NR),
    ]
    # instruction i (0-based within the JEQ block) jumps over the
    # remaining (n-1-i) JEQs plus the RET ALLOW to land on RET ERRNO
    for i, nr in enumerate(denied):
        prog.append(_insn(_BPF_JMP_JEQ_K, n - i, 0, nr))
    prog.append(_insn(_BPF_RET_K, 0, 0, _SECCOMP_RET_ALLOW))
    prog.append(_insn(_BPF_RET_K, 0, 0, _SECCOMP_RET_ERRNO | _EPERM))
    return b"".join(prog)


# Python source (inlined into the sandbox prelude — the child runs
# under -I with no access to this package) that installs a prepared
# filter. {filter_bytes!r} is substituted by the parent.
APPLY_TEMPLATE = """\
def _apply_seccomp(_filt):
    # best-effort: any failure leaves the sandbox at its previous
    # hardening level (rlimits + netns), mirroring the degrade ladder
    try:
        import ctypes, struct
        libc = ctypes.CDLL(None, use_errno=True)
        if libc.prctl(38, 1, 0, 0, 0) != 0:  # PR_SET_NO_NEW_PRIVS
            return False
        buf = ctypes.create_string_buffer(_filt, len(_filt))
        class _Fprog(ctypes.Structure):
            _fields_ = [("len", ctypes.c_ushort), ("filter", ctypes.c_void_p)]
        prog = _Fprog(len(_filt) // 8, ctypes.cast(buf, ctypes.c_void_p))
        # PR_SET_SECCOMP=22, SECCOMP_MODE_FILTER=2
        return libc.prctl(22, 2, ctypes.byref(prog), 0, 0) == 0
    except Exception:
        return False

_SECCOMP_OK = _apply_seccomp({filter_bytes!r})
"""


def apply_source(arch: str | None = None) -> str:
    """Prelude snippet installing the filter, or '' when unbuildable."""
    filt = build_filter(arch)
    if filt is None:
        return ""
    return APPLY_TEMPLATE.format(filter_bytes=filt)


def seccomp_available() -> bool:
    """Probe (in a throwaway fork) whether the filter installs here."""
    import os
    import sys

    if sys.platform != "linux" or build_filter() is None:
        return False
    pid = os.fork()
    if pid == 0:  # pragma: no cover - child
        ns: dict = {}
        exec(apply_source(), ns)  # noqa: S102 - our own generated source
        os._exit(0 if ns.get("_SECCOMP_OK") else 1)
    _, status = os.waitpid(pid, 0)
    return os.waitstatus_to_exitcode(status) == 0
