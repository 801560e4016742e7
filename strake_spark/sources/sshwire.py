"""Jar-free SSH transport + SFTP v3 client (public RFCs, stdlib sockets
+ the ``cryptography`` primitives already in this container).

Reference: crates/connectors/src/sources/file.rs:124-207 routes
sftp:// through OpenDAL's whole-object fetch; ``paramiko`` is not
installable here, so the transport is built from the specs:

- RFC 4253 binary packet protocol with ONE deliberately-minimal cipher
  suite: curve25519-sha256 key exchange (RFC 8731), ssh-ed25519 host
  keys, aes128-ctr encryption, hmac-sha2-256 (encrypt-and-mac over
  seq || plaintext), compression none. One suite = one code path = the
  whole matrix is exercised by every test.
- RFC 4252 userauth: the CLIENT authenticates with password only (the
  sftp:// URL carries user:password; there is no key-file plumbing in
  connect_sftp). The publickey (ed25519) flow is implemented on the
  SERVER side of the shared codec — that is what the real OpenSSH
  client exercises in the interop tests.
- RFC 4254 connection protocol: one session channel + the sftp
  subsystem, with window accounting on both directions.
- SFTP v3 (draft-ietf-secsh-filexfer-02, the universally-deployed
  version): INIT/VERSION, REALPATH, STAT/LSTAT, OPENDIR/READDIR,
  OPEN/READ/CLOSE — what a whole-object fetch needs.

Validation (tests/test_source_sftp.py): the same codec drives an
in-process SSH+SFTP server, and the REAL OpenSSH ``sftp``/``ssh``
client binaries shipped in this container connect to that server and
fetch files — OpenSSH itself validates the kex math, key derivation,
MAC and packet framing; the Python client then interops with the same
server (shared-codec symmetry).

Scale shape: sftp is the reference's SMALL-FILE path (config refresh,
dimension drops) — bytes move through the driver once per registration
into a local spool, then Spark scans the spool. Large data belongs on
a splittable store (s3a/gs/abfss route to executor-side Hadoop FS).
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import os
import socket
import struct
from dataclasses import dataclass

from strake_spark.errors import SourceError

VERSION_STRING = b"SSH-2.0-strakespark_0.1"

# message numbers (RFC 4253 / 4252 / 4254)
MSG_DISCONNECT = 1
MSG_IGNORE = 2
MSG_UNIMPLEMENTED = 3
MSG_DEBUG = 4
MSG_SERVICE_REQUEST = 5
MSG_SERVICE_ACCEPT = 6
MSG_EXT_INFO = 7
MSG_KEXINIT = 20
MSG_NEWKEYS = 21
MSG_KEX_ECDH_INIT = 30
MSG_KEX_ECDH_REPLY = 31
MSG_USERAUTH_REQUEST = 50
MSG_USERAUTH_FAILURE = 51
MSG_USERAUTH_SUCCESS = 52
MSG_USERAUTH_BANNER = 53
MSG_USERAUTH_PK_OK = 60
MSG_GLOBAL_REQUEST = 80
MSG_REQUEST_SUCCESS = 81
MSG_REQUEST_FAILURE = 82
MSG_CHANNEL_OPEN = 90
MSG_CHANNEL_OPEN_CONFIRMATION = 91
MSG_CHANNEL_OPEN_FAILURE = 92
MSG_CHANNEL_WINDOW_ADJUST = 93
MSG_CHANNEL_DATA = 94
MSG_CHANNEL_EXTENDED_DATA = 95
MSG_CHANNEL_EOF = 96
MSG_CHANNEL_CLOSE = 97
MSG_CHANNEL_REQUEST = 98
MSG_CHANNEL_SUCCESS = 99
MSG_CHANNEL_FAILURE = 100

KEX_ALG = b"curve25519-sha256"
HOSTKEY_ALG = b"ssh-ed25519"
CIPHER = b"aes128-ctr"
MAC_ALG = b"hmac-sha2-256"


# ------------------------------------------------------------- wire encoding


def ssh_string(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def ssh_mpint(n: int) -> bytes:
    if n == 0:
        return ssh_string(b"")
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    if raw[0] & 0x80:  # positive numbers must not set the sign bit
        raw = b"\x00" + raw
    return ssh_string(raw)


def ssh_namelist(names: list[bytes]) -> bytes:
    return ssh_string(b",".join(names))


class Reader:
    """Sequential reader over one SSH message payload. Bounds-checked
    (r18): payload bytes come from an untrusted peer — truncation must
    be a clear SourceError, not a raw IndexError/struct.error, and a
    string length declared past the message end must not yield a
    silently SHORTENED value."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0

    def _need(self, n: int) -> None:
        if self.pos + n > len(self.buf):
            raise SourceError("ssh message truncated")

    def byte(self) -> int:
        self._need(1)
        b = self.buf[self.pos]
        self.pos += 1
        return b

    def boolean(self) -> bool:
        return self.byte() != 0

    def uint32(self) -> int:
        self._need(4)
        v = struct.unpack_from(">I", self.buf, self.pos)[0]
        self.pos += 4
        return v

    def uint64(self) -> int:
        self._need(8)
        v = struct.unpack_from(">Q", self.buf, self.pos)[0]
        self.pos += 8
        return v

    def string(self) -> bytes:
        n = self.uint32()
        self._need(n)
        s = self.buf[self.pos : self.pos + n]
        self.pos += n
        return s

    def namelist(self) -> list[bytes]:
        s = self.string()
        return s.split(b",") if s else []

    def rest(self) -> bytes:
        return self.buf[self.pos :]


# --------------------------------------------------------------- key derive


def derive_key(K_mpint: bytes, H: bytes, letter: bytes, session_id: bytes,
               length: int) -> bytes:
    """RFC 4253 §7.2: K1 = HASH(K || H || letter || session_id),
    extended with K2 = HASH(K || H || K1) ... until ``length`` bytes."""
    out = hashlib.sha256(K_mpint + H + letter + session_id).digest()
    while len(out) < length:
        out += hashlib.sha256(K_mpint + H + out).digest()
    return out[:length]


@dataclass
class Keys:
    iv_out: bytes
    iv_in: bytes
    enc_out: bytes
    enc_in: bytes
    mac_out: bytes
    mac_in: bytes


def derive_all(K_mpint: bytes, H: bytes, session_id: bytes, client: bool) -> Keys:
    # letters per RFC 4253: A/B = IVs, C/D = enc keys, E/F = MAC keys
    # (client-to-server first) — a server swaps in/out
    a = derive_key(K_mpint, H, b"A", session_id, 16)
    b = derive_key(K_mpint, H, b"B", session_id, 16)
    c = derive_key(K_mpint, H, b"C", session_id, 16)
    d = derive_key(K_mpint, H, b"D", session_id, 16)
    e = derive_key(K_mpint, H, b"E", session_id, 32)
    f = derive_key(K_mpint, H, b"F", session_id, 32)
    if client:
        return Keys(iv_out=a, iv_in=b, enc_out=c, enc_in=d, mac_out=e, mac_in=f)
    return Keys(iv_out=b, iv_in=a, enc_out=d, enc_in=c, mac_out=f, mac_in=e)


# ------------------------------------------------------------ SSH transport


class SshTransport:
    """One SSH connection endpoint (client or server): version exchange,
    curve25519 kex, then encrypted packets (aes128-ctr + hmac-sha2-256,
    MAC computed over seq || plaintext per RFC 4253 §6.4)."""

    def __init__(self, sock: socket.socket, client: bool,
                 host_key=None, expected_fingerprint: str | None = None,
                 allow_unverified: bool = True):
        self.sock = sock
        self.client = client
        self.host_key = host_key  # server: Ed25519PrivateKey
        self.expected_fingerprint = expected_fingerprint
        self.allow_unverified = allow_unverified
        self.server_host_key_blob: bytes | None = None
        self._seq_out = 0
        self._seq_in = 0
        self._enc = None  # (encryptor, mac_key)
        self._dec = None
        self._rbuf = bytearray()
        self.session_id: bytes | None = None

    # ------------------------------------------------------------ raw bytes
    def _recv_exact(self, n: int) -> bytes:
        while len(self._rbuf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise SourceError("ssh connection closed")
            self._rbuf += chunk
        out = bytes(self._rbuf[:n])
        del self._rbuf[:n]
        return out

    def _recv_line(self) -> bytes:
        line = bytearray()
        while not line.endswith(b"\n"):
            line += self._recv_exact(1)
            if len(line) > 4096:
                raise SourceError("ssh version line too long")
        return bytes(line).rstrip(b"\r\n")

    # -------------------------------------------------------------- packets
    def send_packet(self, payload: bytes) -> None:
        block = 16 if self._enc else 8
        # padding so total length is a multiple of the block size;
        # min padding 4 (RFC 4253 §6)
        pad_len = block - ((len(payload) + 5) % block)
        if pad_len < 4:
            pad_len += block
        packet = struct.pack(">IB", len(payload) + pad_len + 1, pad_len)
        packet += payload + os.urandom(pad_len)
        if self._enc:
            encryptor, mac_key = self._enc
            mac = hmac_mod.new(
                mac_key, struct.pack(">I", self._seq_out) + packet, hashlib.sha256
            ).digest()
            self.sock.sendall(encryptor.update(packet) + mac)
        else:
            self.sock.sendall(packet)
        self._seq_out = (self._seq_out + 1) & 0xFFFFFFFF

    def recv_packet(self) -> bytes:
        if self._dec:
            decryptor, mac_key = self._dec
            first = decryptor.update(self._recv_exact(16))
            total = struct.unpack(">I", first[:4])[0]
            # AES-CTR is malleable and the length field is consumed
            # before MAC verification — bound it like the plaintext
            # branch (OpenSSH PACKET_MAX_SIZE posture) so a bit-flipped
            # length can't make us buffer up to ~4 GiB; the minimum and
            # block-alignment checks reject garbage lengths early too
            if total > 1 << 20:
                raise SourceError("ssh packet too large")
            if total + 4 < 16 or (total + 4) % 16:
                raise SourceError("ssh packet length invalid")
            rest = decryptor.update(self._recv_exact(total + 4 - 16))
            packet = first + rest
            mac = self._recv_exact(32)
            want = hmac_mod.new(
                mac_key, struct.pack(">I", self._seq_in) + packet, hashlib.sha256
            ).digest()
            if not hmac_mod.compare_digest(mac, want):
                raise SourceError("ssh MAC verification failed")
        else:
            head = self._recv_exact(4)
            total = struct.unpack(">I", head)[0]
            if total > 1 << 20:
                raise SourceError("ssh packet too large")
            if total < 1:
                raise SourceError("ssh packet length invalid")
            packet = head + self._recv_exact(total)
        pad_len = packet[4]
        payload = packet[5 : 5 + (len(packet) - 5 - pad_len)]
        self._seq_in = (self._seq_in + 1) & 0xFFFFFFFF
        return payload

    def recv_msg(self) -> bytes:
        """recv_packet skipping IGNORE/DEBUG/UNIMPLEMENTED/EXT_INFO."""
        while True:
            p = self.recv_packet()
            if not p:
                continue
            if p[0] in (MSG_IGNORE, MSG_DEBUG, MSG_UNIMPLEMENTED, MSG_EXT_INFO):
                continue
            if p[0] == MSG_DISCONNECT:
                r = Reader(p[1:])
                r.uint32()
                raise SourceError(f"ssh disconnect: {r.string().decode(errors='replace')}")
            return p

    # ------------------------------------------------------------------ kex
    def _kexinit_payload(self) -> bytes:
        return (
            bytes([MSG_KEXINIT])
            + os.urandom(16)
            + ssh_namelist([KEX_ALG])
            + ssh_namelist([HOSTKEY_ALG])
            + ssh_namelist([CIPHER])  # c->s ciphers
            + ssh_namelist([CIPHER])  # s->c
            + ssh_namelist([MAC_ALG])
            + ssh_namelist([MAC_ALG])
            + ssh_namelist([b"none"])
            + ssh_namelist([b"none"])
            + ssh_namelist([])  # languages c->s
            + ssh_namelist([])
            + b"\x00"  # first_kex_packet_follows
            + struct.pack(">I", 0)
        )

    @staticmethod
    def _require(offered: list[bytes], ours: bytes, what: str) -> None:
        if ours not in offered:
            raise SourceError(
                f"ssh negotiation failed: peer offers no {what} in common "
                f"(need {ours.decode()}, got {b','.join(offered).decode()})"
            )

    def handshake(self) -> None:
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PublicKey,
        )
        from cryptography.hazmat.primitives.asymmetric.x25519 import (
            X25519PrivateKey,
            X25519PublicKey,
        )
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )
        from cryptography.hazmat.primitives.serialization import (
            Encoding,
            PublicFormat,
        )

        # version exchange
        self.sock.sendall(VERSION_STRING + b"\r\n")
        while True:
            peer_version = self._recv_line()
            if peer_version.startswith(b"SSH-"):
                break  # pre-banner lines are allowed (RFC 4253 §4.2)
        if not peer_version.startswith(b"SSH-2.0"):
            raise SourceError(f"unsupported ssh version {peer_version!r}")

        my_kexinit = self._kexinit_payload()
        self.send_packet(my_kexinit)
        peer_kexinit = self.recv_msg()
        if peer_kexinit[0] != MSG_KEXINIT:
            raise SourceError("expected KEXINIT")
        r = Reader(peer_kexinit[1:])
        r.pos += 16  # cookie
        self._require(r.namelist(), KEX_ALG, "kex")
        self._require(r.namelist(), HOSTKEY_ALG, "host key alg")
        self._require(r.namelist(), CIPHER, "cipher c2s")
        self._require(r.namelist(), CIPHER, "cipher s2c")
        self._require(r.namelist(), MAC_ALG, "mac c2s")
        self._require(r.namelist(), MAC_ALG, "mac s2c")

        if self.client:
            eph = X25519PrivateKey.generate()
            q_c = eph.public_key().public_bytes(Encoding.Raw, PublicFormat.Raw)
            self.send_packet(bytes([MSG_KEX_ECDH_INIT]) + ssh_string(q_c))
            reply = self.recv_msg()
            if reply[0] != MSG_KEX_ECDH_REPLY:
                raise SourceError("expected KEX_ECDH_REPLY")
            rr = Reader(reply[1:])
            k_s = rr.string()
            q_s = rr.string()
            sig_blob = rr.string()
            shared = eph.exchange(X25519PublicKey.from_public_bytes(q_s))
            K = ssh_mpint(int.from_bytes(shared, "big"))
            H = hashlib.sha256(
                ssh_string(VERSION_STRING)
                + ssh_string(peer_version)
                + ssh_string(my_kexinit)
                + ssh_string(peer_kexinit)
                + ssh_string(k_s)
                + ssh_string(q_c)
                + ssh_string(q_s)
                + K
            ).digest()
            # verify host key signature over H
            kr = Reader(k_s)
            if kr.string() != HOSTKEY_ALG:
                raise SourceError("unexpected host key type")
            host_pub = Ed25519PublicKey.from_public_bytes(kr.string())
            sr = Reader(sig_blob)
            if sr.string() != HOSTKEY_ALG:
                raise SourceError("unexpected signature type")
            try:
                host_pub.verify(sr.string(), H)
            except Exception as e:
                raise SourceError("ssh host key signature invalid") from e
            self.server_host_key_blob = k_s
            got = host_key_fingerprint(k_s)
            if self.expected_fingerprint:
                if got != self.expected_fingerprint:
                    raise SourceError(
                        f"ssh host key mismatch: expected "
                        f"{self.expected_fingerprint}, got {got}"
                    )
            elif not self.allow_unverified:
                # accept-always would let a MITM harvest the password;
                # surface the observed fingerprint so the user can pin
                raise SourceError(
                    "ssh host key not pinned: server presented "
                    f"{got} — set host_key_fingerprint: '{got}' after "
                    "verifying it out of band, or set "
                    "allow_unverified_host_key: true to accept any key"
                )
        else:
            init = self.recv_msg()
            if init[0] != MSG_KEX_ECDH_INIT:
                raise SourceError("expected KEX_ECDH_INIT")
            q_c = Reader(init[1:]).string()
            eph = X25519PrivateKey.generate()
            q_s = eph.public_key().public_bytes(Encoding.Raw, PublicFormat.Raw)
            shared = eph.exchange(X25519PublicKey.from_public_bytes(q_c))
            K = ssh_mpint(int.from_bytes(shared, "big"))
            host_pub_raw = self.host_key.public_key().public_bytes(
                Encoding.Raw, PublicFormat.Raw
            )
            k_s = ssh_string(HOSTKEY_ALG) + ssh_string(host_pub_raw)
            H = hashlib.sha256(
                ssh_string(peer_version)
                + ssh_string(VERSION_STRING)
                + ssh_string(peer_kexinit)
                + ssh_string(my_kexinit)
                + ssh_string(k_s)
                + ssh_string(q_c)
                + ssh_string(q_s)
                + K
            ).digest()
            sig = ssh_string(HOSTKEY_ALG) + ssh_string(self.host_key.sign(H))
            self.send_packet(
                bytes([MSG_KEX_ECDH_REPLY])
                + ssh_string(k_s)
                + ssh_string(q_s)
                + ssh_string(sig)
            )

        self.send_packet(bytes([MSG_NEWKEYS]))
        if self.recv_msg()[0] != MSG_NEWKEYS:
            raise SourceError("expected NEWKEYS")
        self.session_id = self.session_id or H
        keys = derive_all(K, H, self.session_id, self.client)
        enc = Cipher(algorithms.AES(keys.enc_out), modes.CTR(keys.iv_out)).encryptor()
        dec = Cipher(algorithms.AES(keys.enc_in), modes.CTR(keys.iv_in)).decryptor()
        self._enc = (enc, keys.mac_out)
        self._dec = (dec, keys.mac_in)


def host_key_fingerprint(k_s_blob: bytes) -> str:
    """OpenSSH-style SHA256 fingerprint of the host key blob."""
    import base64

    digest = hashlib.sha256(k_s_blob).digest()
    return "SHA256:" + base64.b64encode(digest).decode().rstrip("=")


# ------------------------------------------------------------------ channel


class SshClient:
    """Client: transport + password userauth + one session channel
    running the sftp subsystem."""

    WINDOW = 1 << 24
    MAX_PACKET = 32768

    def __init__(self, host: str, port: int, username: str, password: str,
                 timeout: float = 30.0,
                 host_key_fingerprint: str | None = None,
                 allow_unverified: bool = False) -> None:
        sock = socket.create_connection((host, port), timeout=timeout)
        self.t = SshTransport(sock, client=True,
                              expected_fingerprint=host_key_fingerprint,
                              allow_unverified=allow_unverified)
        self.t.handshake()
        self._auth(username, password)
        self._recv_window = self.WINDOW
        self._send_window = 0
        self._peer_max_packet = 32768
        self._chan_in = bytearray()
        self._eof = False
        self._open_channel()

    def _auth(self, username: str, password: str) -> None:
        self.t.send_packet(
            bytes([MSG_SERVICE_REQUEST]) + ssh_string(b"ssh-userauth")
        )
        if self.t.recv_msg()[0] != MSG_SERVICE_ACCEPT:
            raise SourceError("ssh service request rejected")
        self.t.send_packet(
            bytes([MSG_USERAUTH_REQUEST])
            + ssh_string(username.encode())
            + ssh_string(b"ssh-connection")
            + ssh_string(b"password")
            + b"\x00"
            + ssh_string(password.encode())
        )
        while True:
            resp = self.t.recv_msg()
            if resp[0] == MSG_USERAUTH_SUCCESS:
                return
            if resp[0] == MSG_USERAUTH_BANNER:
                continue
            if resp[0] == MSG_USERAUTH_FAILURE:
                raise SourceError("ssh password authentication failed")
            raise SourceError(f"unexpected userauth reply {resp[0]}")

    def _open_channel(self) -> None:
        self.t.send_packet(
            bytes([MSG_CHANNEL_OPEN])
            + ssh_string(b"session")
            + struct.pack(">III", 0, self.WINDOW, self.MAX_PACKET)
        )
        while True:
            resp = self.t.recv_msg()
            if resp[0] == MSG_CHANNEL_OPEN_CONFIRMATION:
                break
            if resp[0] == MSG_CHANNEL_OPEN_FAILURE:
                raise SourceError("ssh channel open failed")
            # asynchronous server traffic may arrive between userauth
            # and the open confirmation — notably OpenSSH >= 6.8 sends
            # a hostkeys-00@openssh.com GLOBAL_REQUEST right after
            # MSG_USERAUTH_SUCCESS (r19 review: the old single recv
            # treated it as an open failure, so the client could never
            # connect to a stock sshd); route it like the subsystem
            # loop below does
            self._handle_async(resp)
        r = Reader(resp[1:])
        r.uint32()  # our id (0)
        self.peer_channel = r.uint32()
        self._send_window = r.uint32()
        self._peer_max_packet = r.uint32()
        self.t.send_packet(
            bytes([MSG_CHANNEL_REQUEST])
            + struct.pack(">I", self.peer_channel)
            + ssh_string(b"subsystem")
            + b"\x01"
            + ssh_string(b"sftp")
        )
        while True:
            resp = self.t.recv_msg()
            if resp[0] == MSG_CHANNEL_SUCCESS:
                return
            if resp[0] == MSG_CHANNEL_FAILURE:
                raise SourceError("sftp subsystem refused")
            self._handle_async(resp)

    def _handle_async(self, p: bytes) -> None:
        if p[0] == MSG_CHANNEL_WINDOW_ADJUST:
            r = Reader(p[1:])
            r.uint32()
            self._send_window += r.uint32()
        elif p[0] == MSG_CHANNEL_DATA:
            r = Reader(p[1:])
            r.uint32()
            data = r.string()
            self._chan_in += data
            self._recv_window -= len(data)
            if self._recv_window < self.WINDOW // 2:
                grant = self.WINDOW - self._recv_window
                self.t.send_packet(
                    bytes([MSG_CHANNEL_WINDOW_ADJUST])
                    + struct.pack(">II", self.peer_channel, grant)
                )
                self._recv_window += grant
        elif p[0] == MSG_CHANNEL_EXTENDED_DATA:
            pass  # subsystem stderr: ignore
        elif p[0] in (MSG_CHANNEL_EOF, MSG_CHANNEL_CLOSE):
            self._eof = True
        elif p[0] == MSG_GLOBAL_REQUEST:
            r = Reader(p[1:])
            r.string()
            if r.boolean():
                self.t.send_packet(bytes([MSG_REQUEST_FAILURE]))

    # ---------------------------------------------------- channel as stream
    def send(self, data: bytes) -> None:
        view = memoryview(data)
        while view:
            while self._send_window <= 0:
                self._handle_async(self.t.recv_msg())
            n = min(len(view), self._peer_max_packet, self._send_window)
            self.t.send_packet(
                bytes([MSG_CHANNEL_DATA])
                + struct.pack(">I", self.peer_channel)
                + ssh_string(bytes(view[:n]))
            )
            self._send_window -= n
            view = view[n:]

    def recv_exact(self, n: int) -> bytes:
        while len(self._chan_in) < n:
            if self._eof:
                raise SourceError("sftp channel closed early")
            self._handle_async(self.t.recv_msg())
        out = bytes(self._chan_in[:n])
        del self._chan_in[:n]
        return out

    def close(self) -> None:
        try:
            self.t.send_packet(
                bytes([MSG_CHANNEL_CLOSE]) + struct.pack(">I", self.peer_channel)
            )
        except Exception:
            pass
        self.t.sock.close()


# -------------------------------------------------------------------- SFTP

FXP_INIT, FXP_VERSION = 1, 2
FXP_OPEN, FXP_CLOSE, FXP_READ = 3, 4, 5
FXP_LSTAT, FXP_FSTAT = 7, 8
FXP_OPENDIR, FXP_READDIR = 11, 12
FXP_REALPATH, FXP_STAT = 16, 17
FXP_STATUS, FXP_HANDLE, FXP_DATA, FXP_NAME, FXP_ATTRS = 101, 102, 103, 104, 105

FX_OK, FX_EOF, FX_NO_SUCH_FILE, FX_PERMISSION_DENIED = 0, 1, 2, 3
FXF_READ = 0x01
ATTR_SIZE, ATTR_PERMISSIONS = 0x1, 0x4
S_IFDIR = 0o040000


@dataclass
class SftpAttrs:
    size: int | None = None
    permissions: int | None = None

    @property
    def is_dir(self) -> bool:
        return bool(self.permissions and (self.permissions & 0o170000) == S_IFDIR)


def parse_attrs(r: Reader) -> SftpAttrs:
    flags = r.uint32()
    a = SftpAttrs()
    if flags & ATTR_SIZE:
        a.size = r.uint64()
    if flags & 0x2:  # UIDGID
        r.uint32()
        r.uint32()
    if flags & ATTR_PERMISSIONS:
        a.permissions = r.uint32()
    if flags & 0x8:  # ACMODTIME
        r.uint32()
        r.uint32()
    if flags & 0x80000000:  # EXTENDED: count * (type string, data string)
        # a spec-valid v3 server may append extended attrs; not
        # consuming them desynchronized the READDIR payload parse —
        # the next entry's filename would be read out of the extended
        # data (r19 review)
        for _ in range(r.uint32()):
            r.string()
            r.string()
    return a


def encode_attrs(size: int | None = None, permissions: int | None = None) -> bytes:
    flags = 0
    body = b""
    if size is not None:
        flags |= ATTR_SIZE
        body += struct.pack(">Q", size)
    if permissions is not None:
        flags |= ATTR_PERMISSIONS
        body += struct.pack(">I", permissions)
    return struct.pack(">I", flags) + body


class SftpClient:
    """SFTP v3 over an SshClient channel: enough surface for the spool
    fetch (listdir, stat, read whole files)."""

    def __init__(self, ssh: SshClient) -> None:
        self.ssh = ssh
        self._id = 0
        self._send_pkt(bytes([FXP_INIT]) + struct.pack(">I", 3))
        t, payload = self._recv_pkt()
        if t != FXP_VERSION:
            raise SourceError("sftp INIT not answered with VERSION")
        if len(payload) < 4:
            raise SourceError("sftp VERSION reply truncated")
        ver = struct.unpack(">I", payload[:4])[0]
        if ver != 3:
            raise SourceError(f"sftp server negotiated v{ver}, need 3")

    def _send_pkt(self, body: bytes) -> None:
        self.ssh.send(struct.pack(">I", len(body)) + body)

    # largest legitimate reply is a DATA packet for one read window
    # (~300 KB) plus framing; anything past this is a corrupt or
    # hostile length prefix — refuse before allocating/blocking on it
    _MAX_PKT = 4 * 1024 * 1024

    def _recv_pkt(self) -> tuple[int, bytes]:
        n = struct.unpack(">I", self.ssh.recv_exact(4))[0]
        # the length prefix is untrusted server bytes: zero would make
        # body[0] a raw IndexError — the module's bounds-check posture
        # (r18) demands a clear SourceError instead (r19 review)
        if n == 0 or n > self._MAX_PKT:
            raise SourceError(f"sftp packet length {n} out of range")
        body = self.ssh.recv_exact(n)
        return body[0], body[1:]

    def _request(self, t: int, body: bytes) -> tuple[int, Reader]:
        self._id += 1
        rid = self._id
        self._send_pkt(bytes([t]) + struct.pack(">I", rid) + body)
        rt, payload = self._recv_pkt()
        r = Reader(payload)
        got = r.uint32()
        if got != rid:
            raise SourceError(f"sftp reply id {got} != request {rid}")
        return rt, r

    @staticmethod
    def _raise_status(r: Reader, what: str) -> None:
        code = r.uint32()
        msg = r.string().decode(errors="replace")
        raise SourceError(f"sftp {what} failed: code {code} {msg}")

    def realpath(self, path: str) -> str:
        rt, r = self._request(FXP_REALPATH, ssh_string(path.encode()))
        if rt != FXP_NAME:
            self._raise_status(r, f"realpath {path!r}")
        r.uint32()  # count (1)
        return r.string().decode()

    def stat(self, path: str) -> SftpAttrs:
        rt, r = self._request(FXP_STAT, ssh_string(path.encode()))
        if rt != FXP_ATTRS:
            self._raise_status(r, f"stat {path!r}")
        return parse_attrs(r)

    def listdir(self, path: str) -> list[tuple[str, SftpAttrs]]:
        rt, r = self._request(FXP_OPENDIR, ssh_string(path.encode()))
        if rt != FXP_HANDLE:
            self._raise_status(r, f"opendir {path!r}")
        handle = r.string()
        out: list[tuple[str, SftpAttrs]] = []
        try:
            while True:
                rt, r = self._request(FXP_READDIR, ssh_string(handle))
                if rt == FXP_STATUS:
                    code = r.uint32()
                    if code == FX_EOF:
                        break
                    msg = r.string().decode(errors="replace")
                    raise SourceError(f"sftp readdir failed: code {code} {msg}")
                count = r.uint32()
                for _ in range(count):
                    name = r.string().decode()
                    r.string()  # longname
                    attrs = parse_attrs(r)
                    if name not in (".", ".."):
                        out.append((name, attrs))
        finally:
            self._request(FXP_CLOSE, ssh_string(handle))
        return out

    def read_file(self, path: str, chunk: int = 32768) -> bytes:
        rt, r = self._request(
            FXP_OPEN,
            ssh_string(path.encode()) + struct.pack(">I", FXF_READ) + encode_attrs(),
        )
        if rt != FXP_HANDLE:
            self._raise_status(r, f"open {path!r}")
        handle = r.string()
        buf = bytearray()
        try:
            while True:
                rt, r = self._request(
                    FXP_READ,
                    ssh_string(handle) + struct.pack(">QI", len(buf), chunk),
                )
                if rt == FXP_STATUS:
                    code = r.uint32()
                    if code == FX_EOF:
                        break
                    msg = r.string().decode(errors="replace")
                    raise SourceError(f"sftp read failed: code {code} {msg}")
                if rt != FXP_DATA:
                    raise SourceError(f"unexpected sftp reply {rt}")
                buf += r.string()
        finally:
            self._request(FXP_CLOSE, ssh_string(handle))
        return bytes(buf)


def connect_sftp(host: str, port: int, username: str, password: str,
                 timeout: float = 30.0,
                 host_key_fingerprint: str | None = None,
                 allow_unverified: bool = False) -> tuple[SshClient, SftpClient]:
    """Secure by default: with no pinned fingerprint the connection is
    refused (the error carries the observed fingerprint to pin) unless
    allow_unverified=True is explicit."""
    ssh = SshClient(host, port, username, password, timeout=timeout,
                    host_key_fingerprint=host_key_fingerprint,
                    allow_unverified=allow_unverified)
    return ssh, SftpClient(ssh)
