"""Jar-free gRPC transport over cleartext HTTP/2 (h2c, prior knowledge).

Reference: crates/connectors/src/sources/grpc.rs:21-45 opens a tonic
channel and issues unary/server-streaming calls; ``grpcio`` is not
installable in this container, so this module implements the minimal
client side of the public wire contract from the specs alone:

- HTTP/2 framing (RFC 7540): connection preface, SETTINGS exchange +
  acks, HEADERS/DATA/WINDOW_UPDATE/PING/RST_STREAM/GOAWAY handling,
  inbound flow-control replenished as DATA is consumed.
- HPACK (RFC 7541): requests are encoded as literal-never-indexed
  fields (always valid, no shared state); responses are decoded with
  the full static table, a dynamic table fed by incremental-indexing
  literals, and table-size updates. Huffman-coded strings from the
  peer raise a clear SourceError — a real interop peer to validate a
  hand-written Huffman table against does not exist in this container,
  and an unverifiable decoder is worse than an honest gate (same
  posture as the Avro fallback's documented bounds). h2c servers
  (including the in-process test server) do not Huffman-encode.
- gRPC message framing: 1-byte compressed flag + 4-byte big-endian
  length per message; request DATA carries END_STREAM; the response
  ends with an HTTP/2 trailers HEADERS frame carrying grpc-status.

Scale shape: the transport is used per input partition inside the
Python DataSource reader — each Spark task opens its own connection to
the endpoint, streams its partition's messages, and closes; no driver
funnel. TLS endpoints still require grpcio (gated separately).
"""

from __future__ import annotations

import socket
import struct
from dataclasses import dataclass, field

from strake_spark.errors import SourceError

# ------------------------------------------------------------------ HPACK

# RFC 7541 Appendix A — the full static table.
HPACK_STATIC: list[tuple[str, str]] = [
    (":authority", ""),
    (":method", "GET"),
    (":method", "POST"),
    (":path", "/"),
    (":path", "/index.html"),
    (":scheme", "http"),
    (":scheme", "https"),
    (":status", "200"),
    (":status", "204"),
    (":status", "206"),
    (":status", "304"),
    (":status", "400"),
    (":status", "404"),
    (":status", "500"),
    ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"),
    ("accept-language", ""),
    ("accept-ranges", ""),
    ("accept", ""),
    ("access-control-allow-origin", ""),
    ("age", ""),
    ("allow", ""),
    ("authorization", ""),
    ("cache-control", ""),
    ("content-disposition", ""),
    ("content-encoding", ""),
    ("content-language", ""),
    ("content-length", ""),
    ("content-location", ""),
    ("content-range", ""),
    ("content-type", ""),
    ("cookie", ""),
    ("date", ""),
    ("etag", ""),
    ("expect", ""),
    ("expires", ""),
    ("from", ""),
    ("host", ""),
    ("if-match", ""),
    ("if-modified-since", ""),
    ("if-none-match", ""),
    ("if-range", ""),
    ("if-unmodified-since", ""),
    ("last-modified", ""),
    ("link", ""),
    ("location", ""),
    ("max-forwards", ""),
    ("proxy-authenticate", ""),
    ("proxy-authorization", ""),
    ("range", ""),
    ("referer", ""),
    ("refresh", ""),
    ("retry-after", ""),
    ("server", ""),
    ("set-cookie", ""),
    ("strict-transport-security", ""),
    ("transfer-encoding", ""),
    ("user-agent", ""),
    ("vary", ""),
    ("via", ""),
    ("www-authenticate", ""),
]


def _encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    """RFC 7541 §5.1 prefix-varint encoding."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 128:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def _decode_int(buf: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    value = buf[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        value += (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7
        if shift > 63:
            raise SourceError("HPACK integer overflow")


def encode_headers(headers: list[tuple[str, str]]) -> bytes:
    """Encode as literal-never-indexed fields with literal names
    (RFC 7541 §6.2.3) — stateless, accepted by every compliant peer."""
    out = bytearray()
    for name, value in headers:
        out += b"\x10"  # 0001 0000: never indexed, new name
        n = name.encode()
        v = value.encode()
        out += _encode_int(len(n), 7)  # huffman bit clear
        out += n
        out += _encode_int(len(v), 7)
        out += v
    return bytes(out)


@dataclass
class HpackDecoder:
    """Response-side HPACK state: static + dynamic table, size updates.
    Huffman-coded strings are gated (module docstring)."""

    max_size: int = 4096
    dynamic: list[tuple[str, str]] = field(default_factory=list)

    def _lookup(self, index: int) -> tuple[str, str]:
        if 1 <= index <= len(HPACK_STATIC):
            return HPACK_STATIC[index - 1]
        d = index - len(HPACK_STATIC) - 1
        if 0 <= d < len(self.dynamic):
            return self.dynamic[d]
        raise SourceError(f"HPACK index {index} out of range")

    def _read_string(self, buf: bytes, pos: int) -> tuple[str, int]:
        huffman = bool(buf[pos] & 0x80)
        length, pos = _decode_int(buf, pos, 7)
        raw = buf[pos : pos + length]
        pos += length
        if huffman:
            raise SourceError(
                "HPACK Huffman-coded header received; this jar-free h2c "
                "transport decodes literal strings only — use grpcio for "
                "peers that Huffman-encode"
            )
        return raw.decode("utf-8", "replace"), pos

    def _evict(self) -> None:
        # entry size per RFC 7541 §4.1: name + value + 32 overhead bytes
        def size() -> int:
            return sum(len(n) + len(v) + 32 for n, v in self.dynamic)

        while self.dynamic and size() > self.max_size:
            self.dynamic.pop()

    def decode(self, buf: bytes) -> list[tuple[str, str]]:
        headers: list[tuple[str, str]] = []
        pos = 0
        while pos < len(buf):
            b = buf[pos]
            if b & 0x80:  # indexed field
                index, pos = _decode_int(buf, pos, 7)
                headers.append(self._lookup(index))
            elif b & 0x40:  # literal with incremental indexing
                index, pos = _decode_int(buf, pos, 6)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = self._read_string(buf, pos)
                value, pos = self._read_string(buf, pos)
                self.dynamic.insert(0, (name, value))
                self._evict()
                headers.append((name, value))
            elif b & 0x20:  # dynamic table size update
                self.max_size, pos = _decode_int(buf, pos, 5)
                self._evict()
            else:  # literal without indexing (0000) / never indexed (0001)
                index, pos = _decode_int(buf, pos, 4)
                name = self._lookup(index)[0] if index else None
                if name is None:
                    name, pos = self._read_string(buf, pos)
                value, pos = self._read_string(buf, pos)
                headers.append((name, value))
        return headers


# ------------------------------------------------------------- HTTP/2 frames

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

FT_DATA, FT_HEADERS, FT_PRIORITY, FT_RST, FT_SETTINGS = 0, 1, 2, 3, 4
FT_PUSH, FT_PING, FT_GOAWAY, FT_WINDOW_UPDATE, FT_CONTINUATION = 5, 6, 7, 8, 9

FLAG_END_STREAM = 0x1
FLAG_END_HEADERS = 0x4
FLAG_ACK = 0x1
FLAG_PADDED = 0x8
FLAG_PRIORITY = 0x20

# RFC 7540 §6.5.2 SETTINGS_MAX_FRAME_SIZE default — the largest frame a
# peer must accept without negotiation
MAX_FRAME_SIZE = 16384


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(3, "big")
        + bytes([ftype, flags])
        + (stream_id & 0x7FFFFFFF).to_bytes(4, "big")
        + payload
    )


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise SourceError("h2c connection closed mid-frame")
        buf += chunk
    return bytes(buf)


def read_frame(sock: socket.socket) -> tuple[int, int, int, bytes]:
    head = _recv_exact(sock, 9)
    length = int.from_bytes(head[:3], "big")
    ftype, flags = head[3], head[4]
    stream_id = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
    payload = _recv_exact(sock, length) if length else b""
    return ftype, flags, stream_id, payload


def strip_padding(flags: int, payload: bytes) -> bytes:
    if flags & FLAG_PADDED:
        pad = payload[0]
        payload = payload[1 : len(payload) - pad]
    return payload


# -------------------------------------------------------------- gRPC client


def grpc_frame(message: bytes) -> bytes:
    """gRPC length-prefixed message (uncompressed)."""
    return b"\x00" + len(message).to_bytes(4, "big") + message


class GrpcMessageBuffer:
    """Reassembles gRPC messages across DATA frame boundaries."""

    def __init__(self) -> None:
        self._buf = bytearray()

    def feed(self, data: bytes) -> list[bytes]:
        self._buf += data
        out: list[bytes] = []
        while len(self._buf) >= 5:
            compressed = self._buf[0]
            ln = int.from_bytes(self._buf[1:5], "big")
            if len(self._buf) < 5 + ln:
                break
            if compressed:
                raise SourceError(
                    "compressed gRPC message received; this transport "
                    "negotiates identity encoding only"
                )
            out.append(bytes(self._buf[5 : 5 + ln]))
            del self._buf[: 5 + ln]
        return out

    def pending(self) -> int:
        return len(self._buf)


class H2GrpcChannel:
    """One h2c connection; one RPC at a time (each Spark task opens its
    own channel, so per-connection concurrency buys nothing here)."""

    def __init__(self, host: str, port: int, timeout: float = 30.0) -> None:
        self.authority = f"{host}:{port}"
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._decoder = HpackDecoder()
        self._next_stream = 1
        self._sock.sendall(
            PREFACE
            # SETTINGS: defaults are fine; advertise no server push
            + pack_frame(FT_SETTINGS, 0, 0, struct.pack("!HI", 0x2, 0))
        )
        self._settings_acked = False

    # -------------------------------------------------------------- control
    def _handle_control(self, ftype: int, flags: int, payload: bytes) -> None:
        if ftype == FT_SETTINGS:
            if not flags & FLAG_ACK:
                self._sock.sendall(pack_frame(FT_SETTINGS, FLAG_ACK, 0, b""))
            else:
                self._settings_acked = True
        elif ftype == FT_PING:
            if not flags & FLAG_ACK:
                self._sock.sendall(pack_frame(FT_PING, FLAG_ACK, 0, payload))
        elif ftype == FT_GOAWAY:
            err = int.from_bytes(payload[4:8], "big") if len(payload) >= 8 else -1
            raise SourceError(f"h2c GOAWAY from peer (error {err})")

    def _replenish(self, stream_id: int, consumed: int) -> None:
        if consumed <= 0:
            return
        inc = consumed.to_bytes(4, "big")
        self._sock.sendall(
            pack_frame(FT_WINDOW_UPDATE, 0, 0, inc)
            + pack_frame(FT_WINDOW_UPDATE, 0, stream_id, inc)
        )

    # ------------------------------------------------------------------ rpc
    def call(self, method: str, request: bytes):
        """Unary request -> iterator of response message bytes (covers
        both unary and server-streaming responses; the trailers'
        grpc-status is checked either way)."""
        stream_id = self._next_stream
        self._next_stream += 2
        headers = [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", method),
            (":authority", self.authority),
            ("content-type", "application/grpc"),
            ("te", "trailers"),
            ("grpc-accept-encoding", "identity"),
        ]
        body = grpc_frame(request)
        # RFC 7540 §4.2: frames are capped at SETTINGS_MAX_FRAME_SIZE
        # (16384 unless raised) — chunk the request DATA accordingly
        frames = [
            body[i : i + MAX_FRAME_SIZE]
            for i in range(0, len(body), MAX_FRAME_SIZE)
        ] or [b""]
        out = pack_frame(
            FT_HEADERS, FLAG_END_HEADERS, stream_id, encode_headers(headers)
        )
        for i, chunk in enumerate(frames):
            flags = FLAG_END_STREAM if i == len(frames) - 1 else 0
            out += pack_frame(FT_DATA, flags, stream_id, chunk)
        self._sock.sendall(out)
        buf = GrpcMessageBuffer()
        got_headers = False
        header_block = bytearray()
        collecting = False
        while True:
            ftype, flags, sid, payload = read_frame(self._sock)
            if sid == 0:
                self._handle_control(ftype, flags, payload)
                continue
            if sid != stream_id:
                continue  # stale frames from a previous stream
            if ftype in (FT_HEADERS, FT_CONTINUATION):
                if ftype == FT_HEADERS:
                    payload = strip_padding(flags, payload)
                    if flags & FLAG_PRIORITY:
                        payload = payload[5:]
                    header_block = bytearray(payload)
                    collecting = True
                else:
                    header_block += payload
                if collecting and flags & FLAG_END_HEADERS:
                    decoded = dict(self._decoder.decode(bytes(header_block)))
                    collecting = False
                    if not got_headers:
                        got_headers = True
                        status = decoded.get(":status")
                        if status != "200":
                            raise SourceError(f"h2c :status {status} from {method}")
                        # grpc-status may arrive in headers (trailers-only)
                        if "grpc-status" in decoded:
                            self._check_status(decoded, method)
                            return
                    else:  # trailers
                        self._check_status(decoded, method)
                        if buf.pending():
                            raise SourceError("truncated trailing gRPC message")
                        return
                if flags & FLAG_END_STREAM and not collecting and got_headers:
                    continue
            elif ftype == FT_DATA:
                data = strip_padding(flags, payload)
                self._replenish(stream_id, len(payload))
                for msg in buf.feed(data):
                    yield msg
                if flags & FLAG_END_STREAM:
                    # stream closed without trailers — not valid gRPC
                    raise SourceError("gRPC stream ended without trailers")
            elif ftype == FT_RST:
                code = int.from_bytes(payload[:4], "big")
                raise SourceError(f"h2c RST_STREAM (error {code}) from {method}")
            # PRIORITY/PUSH_PROMISE/WINDOW_UPDATE on our stream: ignore

    @staticmethod
    def _check_status(trailers: dict, method: str) -> None:
        status = trailers.get("grpc-status", "2")
        if status != "0":
            msg = trailers.get("grpc-message", "")
            raise SourceError(
                f"gRPC call {method} failed: status {status} {msg!r}"
            )

    def close(self) -> None:
        try:
            self._sock.sendall(
                pack_frame(FT_GOAWAY, 0, 0, b"\x00" * 8)
            )
        except OSError:
            pass
        self._sock.close()

    def __enter__(self) -> "H2GrpcChannel":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def unary_stream(endpoint: str, method: str, request: bytes, timeout: float = 30.0):
    """One-shot helper: open a channel, yield response messages, close."""
    host, _, port = endpoint.rpartition(":")
    if not host:
        raise SourceError(f"grpc endpoint {endpoint!r} must be host:port")
    chan = H2GrpcChannel(host, int(port), timeout=timeout)
    try:
        yield from chan.call(method, request)
    finally:
        chan.close()
