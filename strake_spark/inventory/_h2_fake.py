"""In-process h2c gRPC server (RFC 7540/7541 subset + gRPC framing)
shared by the transport test suite and the driver-green
``source_grpc_roundtrip`` entry — moved here from the test module in
r19, same one-source-of-truth treatment as the pg/mysql/clickhouse
fakes in ``_wire_fakes``. The server deliberately exercises HPACK
decoder paths the client encoder never emits (static-indexed fields,
incremental indexing + dynamic-table reuse, multi-frame DATA splits,
trailers-only responses)."""

from __future__ import annotations

import socket
import struct
import threading

from strake_spark.errors import SourceError
from strake_spark.sources.h2grpc import (
    FLAG_ACK,
    FLAG_END_HEADERS,
    FLAG_END_STREAM,
    FT_DATA,
    FT_GOAWAY,
    FT_HEADERS,
    FT_PING,
    FT_SETTINGS,
    FT_WINDOW_UPDATE,
    PREFACE,
    GrpcMessageBuffer,
    HpackDecoder,
    _encode_int,
    encode_headers,
    grpc_frame,
    huffman_encode,
    pack_frame,
    read_frame,
)


def _huffman_header_block(headers: list[tuple[str, str]]) -> bytes:
    """Literal never-indexed fields with Huffman-coded name AND value
    (the form grpc-go/grpc-java actually emit for response headers)."""
    out = bytearray()
    for name, value in headers:
        out += b"\x10"
        for s in (name.encode(), value.encode()):
            h = huffman_encode(s)
            out += _encode_int(len(h), 7, 0x80) + h
    return bytes(out)


# ---------------------------------------------------------------- test server


class H2GrpcTestServer:
    """Minimal h2c gRPC server: enough of RFC 7540/7541 + the gRPC
    framing to serve unary and server-streaming methods registered as
    {method_path: callable(request_bytes) -> list[response_bytes]}.

    Response headers are deliberately encoded through HPACK paths the
    client's own encoder does not use: ':status 200' as a static-table
    indexed field (0x88), 'content-type' as literal WITH incremental
    indexing (so a second stream can reference it from the dynamic
    table), exercising the client decoder's table machinery."""

    def __init__(
        self,
        handlers,
        grpc_status: str = "0",
        split_data: bool = True,
        huffman: bool = False,
        initial_window: int | None = None,
        ssl_context=None,
    ):
        self.handlers = handlers
        self.grpc_status = grpc_status
        self.split_data = split_data
        self.huffman = huffman  # Huffman-encode ALL response header strings
        # advertise SETTINGS_INITIAL_WINDOW_SIZE and ENFORCE it: DATA
        # beyond the granted window is recorded as a violation
        self.initial_window = initial_window
        self.window_violations: list[str] = []
        self._ssl_context = ssl_context
        self._srv = socket.create_server(("127.0.0.1", 0))
        self.port = self._srv.getsockname()[1]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # one connection at a time is plenty for tests
    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                self._srv.settimeout(0.2)
                conn, _ = self._srv.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            try:
                if self._ssl_context is not None:
                    conn = self._ssl_context.wrap_socket(conn, server_side=True)
                self._handle(conn)
            except Exception:
                pass
            finally:
                conn.close()

    def _handle(self, conn: socket.socket) -> None:
        conn.settimeout(10.0)
        preface = b""
        while len(preface) < len(PREFACE):
            chunk = conn.recv(len(PREFACE) - len(preface))
            if not chunk:
                return
            preface += chunk
        assert preface == PREFACE
        settings = b""
        if self.initial_window is not None:
            settings = struct.pack("!HI", 0x4, self.initial_window)
        conn.sendall(pack_frame(FT_SETTINGS, 0, 0, settings))
        decoder = HpackDecoder()
        streams: dict[int, dict] = {}
        sent_indexed_ct = False
        while True:
            try:
                ftype, flags, sid, payload = read_frame(conn)
            except SourceError:
                return
            if sid == 0:
                if ftype == FT_SETTINGS and not flags & FLAG_ACK:
                    conn.sendall(pack_frame(FT_SETTINGS, FLAG_ACK, 0, b""))
                elif ftype == FT_PING and not flags & FLAG_ACK:
                    conn.sendall(pack_frame(FT_PING, FLAG_ACK, 0, payload))
                elif ftype == FT_GOAWAY:
                    return
                continue
            st = streams.setdefault(
                sid,
                {"headers": None, "data": b"", "window": self.initial_window},
            )
            if ftype == FT_HEADERS:
                st["headers"] = dict(decoder.decode(payload))
            elif ftype == FT_DATA:
                if st["window"] is not None:
                    if len(payload) > st["window"]:
                        self.window_violations.append(
                            f"stream {sid}: {len(payload)} > window {st['window']}"
                        )
                    st["window"] -= len(payload)
                st["data"] += payload
                if payload:
                    inc = len(payload).to_bytes(4, "big")
                    conn.sendall(pack_frame(FT_WINDOW_UPDATE, 0, 0, inc))
                    if st["window"] is not None:
                        conn.sendall(pack_frame(FT_WINDOW_UPDATE, 0, sid, inc))
                        st["window"] += len(payload)
            if flags & FLAG_END_STREAM and st["headers"] is not None:
                sent_indexed_ct = self._respond(conn, sid, st, sent_indexed_ct)
                del streams[sid]

    def _respond(self, conn, sid: int, st: dict, sent_indexed_ct: bool) -> bool:
        path = st["headers"].get(":path", "")
        handler = self.handlers.get(path)
        if handler is None:
            head = bytes([0x88]) + self._trailer_block("12", "unimplemented")
            conn.sendall(
                pack_frame(
                    FT_HEADERS, FLAG_END_HEADERS | FLAG_END_STREAM, sid, head
                )
            )
            return sent_indexed_ct
        buf = GrpcMessageBuffer()
        request = b""
        msgs = buf.feed(st["data"])
        if msgs:
            request = msgs[0]
        if self.huffman:
            # the grpc-go/grpc-java posture: every header string
            # Huffman-coded (drives the client decoder's Appendix B path)
            head = bytearray(
                _huffman_header_block(
                    [(":status", "200"), ("content-type", "application/grpc")]
                )
            )
        else:
            # response headers: 0x88 = indexed ':status 200' (static 8);
            # content-type via incremental indexing first time, then from
            # the dynamic table (index 62) on later streams
            head = bytearray([0x88])
            if not sent_indexed_ct:
                head += b"\x40"  # literal w/ incremental indexing, new name
                for s in (b"content-type", b"application/grpc"):
                    head += _encode_int(len(s), 7) + s
            else:
                head += bytes([0x80 | 62])  # dynamic-table reference
        conn.sendall(pack_frame(FT_HEADERS, FLAG_END_HEADERS, sid, bytes(head)))
        body = b"".join(grpc_frame(m) for m in handler(request))
        if self.split_data and len(body) > 3:
            # split mid-message to exercise client-side reassembly,
            # then re-chunk to the RFC 7540 §4.2 16384-byte frame cap
            cut = len(body) // 2
            pieces = [body[:cut], body[cut:]]
        else:
            pieces = [body] if body else []
        from strake_spark.sources.h2grpc import MAX_FRAME_SIZE

        for piece in pieces:
            for i in range(0, len(piece), MAX_FRAME_SIZE):
                conn.sendall(
                    pack_frame(FT_DATA, 0, sid, piece[i : i + MAX_FRAME_SIZE])
                )
        conn.sendall(
            pack_frame(
                FT_HEADERS,
                FLAG_END_HEADERS | FLAG_END_STREAM,
                sid,
                self._trailer_block(self.grpc_status, ""),
            )
        )
        return True

    def _trailer_block(self, status: str, message: str) -> bytes:
        trailers = [("grpc-status", status)] + (
            [("grpc-message", message)] if message else []
        )
        if self.huffman:
            return _huffman_header_block(trailers)
        return encode_headers(trailers)

    def close(self) -> None:
        self._stop.set()
        self._srv.close()
        self._thread.join(timeout=2)


# -------------------------------------------------------------------- tests
