"""In-process SSH server + SFTP v3 subsystem (inventory fake) — moved
here from tests/test_source_sftp.py in r19 so both the test suites and
the driver-green ``source_sftp_roundtrip`` entry drive the jar-free
SSH transport against the same live peer. Reuses the package's own
transport codec with role=server; auth accepts a configured password
and/or ed25519 authorized keys. The real OpenSSH client in this
container validates the server's kex/derivation/MAC/framing in the
test suite, so the entry's peer is interop-proven, not a mirror of the
client's assumptions."""

from __future__ import annotations

import hashlib
import os
import socket
import struct
import threading

from strake_spark.errors import SourceError
from strake_spark.sources import sshwire as W
from strake_spark.sources.sshwire import (
    Reader,
    MSG_CHANNEL_CLOSE,
    MSG_CHANNEL_DATA,
    MSG_CHANNEL_EOF,
    MSG_CHANNEL_OPEN,
    MSG_CHANNEL_OPEN_CONFIRMATION,
    MSG_CHANNEL_REQUEST,
    MSG_CHANNEL_SUCCESS,
    MSG_CHANNEL_WINDOW_ADJUST,
    MSG_GLOBAL_REQUEST,
    MSG_REQUEST_FAILURE,
    MSG_SERVICE_ACCEPT,
    MSG_SERVICE_REQUEST,
    MSG_USERAUTH_FAILURE,
    MSG_USERAUTH_PK_OK,
    MSG_USERAUTH_REQUEST,
    MSG_USERAUTH_SUCCESS,
    SshTransport,
    encode_attrs,
    host_key_fingerprint,
    ssh_string,
)


class SshSftpTestServer:
    """Minimal SSH server + SFTP v3 subsystem over a directory root.
    Reuses the package's transport codec with role=server; auth accepts
    a configured password and/or ed25519 authorized keys (the publickey
    query/sign flow OpenSSH uses)."""

    def __init__(self, root: str, password: str = "secret",
                 authorized_keys: list[bytes] | None = None,
                 user: str = "u"):
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PrivateKey,
        )

        self.root = root
        self.user = user
        self.password = password
        self.authorized_keys = authorized_keys or []
        self.auth_attempts: list[tuple[str, str]] = []
        self.host_key = Ed25519PrivateKey.generate()
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    @property
    def fingerprint(self) -> str:
        from cryptography.hazmat.primitives.serialization import (
            Encoding,
            PublicFormat,
        )

        raw = self.host_key.public_key().public_bytes(
            Encoding.Raw, PublicFormat.Raw
        )
        return host_key_fingerprint(ssh_string(b"ssh-ed25519") + ssh_string(raw))

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                self._srv.settimeout(0.2)
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            threading.Thread(
                target=self._handle_safe, args=(conn,), daemon=True
            ).start()

    def _handle_safe(self, conn: socket.socket) -> None:
        try:
            self._handle(conn)
        except Exception:
            pass
        finally:
            conn.close()

    # ------------------------------------------------------------- protocol
    def _handle(self, conn: socket.socket) -> None:
        conn.settimeout(20.0)
        t = SshTransport(conn, client=False, host_key=self.host_key)
        t.handshake()
        self._userauth(t)
        chan = self._open_channel(t)
        self._sftp_loop(t, chan)

    def _userauth(self, t: SshTransport) -> None:
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PublicKey,
        )

        p = t.recv_msg()
        if p[0] != MSG_SERVICE_REQUEST:
            raise SourceError("expected SERVICE_REQUEST")
        t.send_packet(bytes([MSG_SERVICE_ACCEPT]) + ssh_string(b"ssh-userauth"))
        while True:
            p = t.recv_msg()
            if p[0] != MSG_USERAUTH_REQUEST:
                raise SourceError(f"expected USERAUTH_REQUEST, got {p[0]}")
            r = Reader(p[1:])
            user = r.string()
            service = r.string()
            method = r.string()
            self.auth_attempts.append((user.decode(), method.decode()))
            # the username is part of the credential (r19 review: only
            # the password used to be compared, so any username
            # authenticated — and the entry's 'credential-verifying'
            # claim silently relied on that); the FTP twin checks both
            user_ok = user.decode(errors="replace") == self.user
            if method == b"password":
                r.boolean()
                if user_ok and r.string().decode() == self.password:
                    t.send_packet(bytes([MSG_USERAUTH_SUCCESS]))
                    return
            elif method == b"publickey" and self.authorized_keys and user_ok:
                has_sig = r.boolean()
                alg = r.string()
                blob = r.string()
                kr = Reader(blob)
                key_ok = (
                    alg == b"ssh-ed25519"
                    and kr.string() == b"ssh-ed25519"
                    and (raw := kr.string()) in self.authorized_keys
                )
                if key_ok and not has_sig:
                    t.send_packet(
                        bytes([MSG_USERAUTH_PK_OK])
                        + ssh_string(alg) + ssh_string(blob)
                    )
                    continue
                if key_ok and has_sig:
                    sig_blob = r.string()
                    sr = Reader(sig_blob)
                    sr.string()  # alg
                    signed = (
                        ssh_string(t.session_id)
                        + bytes([MSG_USERAUTH_REQUEST])
                        + ssh_string(user)
                        + ssh_string(service)
                        + ssh_string(b"publickey")
                        + b"\x01"
                        + ssh_string(alg)
                        + ssh_string(blob)
                    )
                    try:
                        Ed25519PublicKey.from_public_bytes(raw).verify(
                            sr.string(), signed
                        )
                        t.send_packet(bytes([MSG_USERAUTH_SUCCESS]))
                        return
                    except Exception:
                        pass
            t.send_packet(
                bytes([MSG_USERAUTH_FAILURE])
                + ssh_string(b"publickey,password")
                + b"\x00"
            )

    def _open_channel(self, t: SshTransport) -> dict:
        # emulate stock OpenSSH >= 6.8: a hostkeys-00@openssh.com
        # GLOBAL_REQUEST (want-reply false) lands right after userauth
        # success, BEFORE the client's CHANNEL_OPEN gets its
        # confirmation — every client test therefore proves the r19
        # _open_channel fix (the old single-recv client died here)
        t.send_packet(
            bytes([MSG_GLOBAL_REQUEST])
            + ssh_string(b"hostkeys-00@openssh.com")
            + b"\x00"
        )
        while True:
            p = t.recv_msg()
            if p[0] == MSG_CHANNEL_OPEN:
                break
            if p[0] == MSG_GLOBAL_REQUEST:
                r = Reader(p[1:])
                r.string()
                if r.boolean():
                    t.send_packet(bytes([MSG_REQUEST_FAILURE]))
                continue
            raise SourceError(f"expected CHANNEL_OPEN, got {p[0]}")
        r = Reader(p[1:])
        ctype = r.string()
        peer_id = r.uint32()
        peer_window = r.uint32()
        peer_max_packet = r.uint32()
        if ctype != b"session":
            raise SourceError(f"unexpected channel type {ctype!r}")
        t.send_packet(
            bytes([MSG_CHANNEL_OPEN_CONFIRMATION])
            + struct.pack(">IIII", peer_id, 0, 1 << 30, 32768)
        )
        chan = {
            "peer": peer_id,
            "send_window": peer_window,
            "max_packet": max(1024, min(peer_max_packet, 32768)),
            "in": bytearray(),
            "eof": False,
        }
        # wait for the sftp subsystem request
        while True:
            p = t.recv_msg()
            if p[0] == MSG_CHANNEL_REQUEST:
                r = Reader(p[1:])
                r.uint32()
                req = r.string()
                want_reply = r.boolean()
                if req == b"subsystem" and r.string() == b"sftp":
                    if want_reply:
                        t.send_packet(
                            bytes([MSG_CHANNEL_SUCCESS])
                            + struct.pack(">I", chan["peer"])
                        )
                    return chan
                if want_reply:
                    t.send_packet(
                        bytes([100]) + struct.pack(">I", chan["peer"])
                    )  # CHANNEL_FAILURE
            elif p[0] == MSG_CHANNEL_WINDOW_ADJUST:
                r = Reader(p[1:])
                r.uint32()
                chan["send_window"] += r.uint32()

    def _pump(self, t: SshTransport, chan: dict) -> None:
        p = t.recv_msg()
        if p[0] == MSG_CHANNEL_DATA:
            r = Reader(p[1:])
            r.uint32()
            chan["in"] += r.string()
        elif p[0] == MSG_CHANNEL_WINDOW_ADJUST:
            r = Reader(p[1:])
            r.uint32()
            chan["send_window"] += r.uint32()
        elif p[0] in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
            chan["eof"] = True
        elif p[0] == MSG_GLOBAL_REQUEST:
            r = Reader(p[1:])
            r.string()
            if r.boolean():
                t.send_packet(bytes([MSG_REQUEST_FAILURE]))

    def _chan_send(self, t: SshTransport, chan: dict, data: bytes) -> None:
        view = memoryview(data)
        while view:
            while chan["send_window"] <= 0 and not chan["eof"]:
                self._pump(t, chan)
            n = min(len(view), chan["max_packet"], chan["send_window"])
            t.send_packet(
                bytes([MSG_CHANNEL_DATA])
                + struct.pack(">I", chan["peer"])
                + ssh_string(bytes(view[:n]))
            )
            chan["send_window"] -= n
            view = view[n:]

    def _chan_recv(self, t: SshTransport, chan: dict, n: int) -> bytes:
        while len(chan["in"]) < n:
            if chan["eof"]:
                raise SourceError("channel closed")
            self._pump(t, chan)
        out = bytes(chan["in"][:n])
        del chan["in"][:n]
        return out

    # ----------------------------------------------------------- SFTP layer
    def _resolve(self, path: bytes) -> str:
        p = os.path.normpath(path.decode() or ".")
        if p in (".", "/"):
            return self.root
        # containment (r19 review): normpath keeps LEADING '..' segments,
        # so '../../etc/passwd' escaped the root — this server listens on
        # a real socket with a constant password, so treat every path as
        # hostile, exactly like the FTP twin and the s3 spool
        real_root = os.path.realpath(self.root)
        full = os.path.realpath(os.path.join(real_root, p.lstrip("/")))
        if full != real_root and not full.startswith(real_root + os.sep):
            return os.path.join(real_root, "__outside_root__")  # never exists
        return full

    def _sftp_loop(self, t: SshTransport, chan: dict) -> None:
        handles: dict[bytes, dict] = {}
        next_handle = 0

        def reply(body: bytes) -> None:
            self._chan_send(t, chan, struct.pack(">I", len(body)) + body)

        def status(rid: int, code: int, msg: str = "") -> None:
            reply(
                bytes([W.FXP_STATUS]) + struct.pack(">II", rid, code)
                + ssh_string(msg.encode()) + ssh_string(b"")
            )

        def attrs_for(full: str) -> bytes:
            st = os.stat(full)
            return encode_attrs(size=st.st_size, permissions=st.st_mode)

        while not chan["eof"]:
            try:
                n = struct.unpack(">I", self._chan_recv(t, chan, 4))[0]
            except SourceError:
                return
            body = self._chan_recv(t, chan, n)
            ptype = body[0]
            r = Reader(body[1:])
            if ptype == W.FXP_INIT:
                reply(bytes([W.FXP_VERSION]) + struct.pack(">I", 3))
                continue
            rid = r.uint32()
            if ptype == W.FXP_REALPATH:
                p = os.path.normpath("/" + r.string().decode().lstrip("/"))
                reply(
                    bytes([W.FXP_NAME]) + struct.pack(">II", rid, 1)
                    + ssh_string(p.encode()) + ssh_string(p.encode())
                    + encode_attrs()
                )
            elif ptype in (W.FXP_STAT, W.FXP_LSTAT):
                full = self._resolve(r.string())
                if not os.path.exists(full):
                    status(rid, W.FX_NO_SUCH_FILE, "not found")
                else:
                    reply(bytes([W.FXP_ATTRS]) + struct.pack(">I", rid)
                          + attrs_for(full))
            elif ptype == W.FXP_FSTAT:
                h = handles.get(r.string())
                if h is None:
                    status(rid, W.FX_NO_SUCH_FILE, "bad handle")
                else:
                    reply(bytes([W.FXP_ATTRS]) + struct.pack(">I", rid)
                          + attrs_for(h["path"]))
            elif ptype == W.FXP_OPENDIR:
                full = self._resolve(r.string())
                if not os.path.isdir(full):
                    status(rid, W.FX_NO_SUCH_FILE, "not a dir")
                    continue
                hid = str(next_handle).encode()
                next_handle += 1
                handles[hid] = {"path": full, "dir": sorted(os.listdir(full)),
                                "sent": False}
                reply(bytes([W.FXP_HANDLE]) + struct.pack(">I", rid)
                      + ssh_string(hid))
            elif ptype == W.FXP_READDIR:
                h = handles.get(r.string())
                if h is None or "dir" not in h:
                    status(rid, W.FX_NO_SUCH_FILE, "bad handle")
                elif h["sent"]:
                    status(rid, W.FX_EOF)
                else:
                    h["sent"] = True
                    names = h["dir"]
                    out = bytes([W.FXP_NAME]) + struct.pack(">II", rid, len(names))
                    for name in names:
                        full = os.path.join(h["path"], name)
                        kind = "d" if os.path.isdir(full) else "-"
                        long = f"{kind}rw-r--r-- 1 u g {os.path.getsize(full):>8} Jan  1 00:00 {name}"
                        out += (ssh_string(name.encode())
                                + ssh_string(long.encode()) + attrs_for(full))
                    reply(out)
            elif ptype == W.FXP_OPEN:
                full = self._resolve(r.string())
                r.uint32()  # pflags (read-only server)
                if not os.path.isfile(full):
                    status(rid, W.FX_NO_SUCH_FILE, "not found")
                    continue
                hid = str(next_handle).encode()
                next_handle += 1
                handles[hid] = {"path": full, "f": open(full, "rb")}
                reply(bytes([W.FXP_HANDLE]) + struct.pack(">I", rid)
                      + ssh_string(hid))
            elif ptype == W.FXP_READ:
                h = handles.get(r.string())
                off = r.uint64()
                ln = r.uint32()
                if h is None or "f" not in h:
                    status(rid, W.FX_NO_SUCH_FILE, "bad handle")
                    continue
                h["f"].seek(off)
                data = h["f"].read(min(ln, 1 << 20))
                if not data:
                    status(rid, W.FX_EOF)
                else:
                    reply(bytes([W.FXP_DATA]) + struct.pack(">I", rid)
                          + ssh_string(data))
            elif ptype == W.FXP_CLOSE:
                h = handles.pop(r.string(), None)
                if h and "f" in h:
                    h["f"].close()
                status(rid, W.FX_OK)
            else:
                status(rid, W.FX_PERMISSION_DENIED, f"op {ptype} unsupported")

    def close(self) -> None:
        self._stop.set()
        self._srv.close()
        self._thread.join(timeout=2)
