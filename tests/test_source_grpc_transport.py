"""Jar-free gRPC transport (sources/h2grpc.py) against a live
in-process h2c server — the same prove-the-wire posture as the pgwire /
mysqlwire / clickhouse-HTTP fallbacks: the bytes on the socket are the
public protocol, both ends implemented independently enough that the
server deliberately exercises decoder paths the client encoder never
emits (static-indexed fields, incremental indexing + dynamic-table
reuse, multi-frame DATA splits, trailers-only responses)."""

from __future__ import annotations

import socket
import struct
import threading

import pytest

from strake_spark.errors import SourceError
from strake_spark.inventory._h2_fake import H2GrpcTestServer, _huffman_header_block
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
    HUFF_TABLE,
    PREFACE,
    GrpcMessageBuffer,
    H2GrpcChannel,
    HpackDecoder,
    _decode_int,
    _encode_int,
    encode_headers,
    grpc_frame,
    huffman_decode,
    huffman_encode,
    pack_frame,
    parse_endpoint,
    read_frame,
    unary_stream,
)


class TestHpack:
    def test_int_roundtrip_all_prefixes(self):
        for prefix in (4, 5, 6, 7):
            for v in (0, 1, (1 << prefix) - 2, (1 << prefix) - 1, 127, 128,
                      16383, 10_000_000):
                enc = _encode_int(v, prefix)
                got, pos = _decode_int(enc, 0, prefix)
                assert (got, pos) == (v, len(enc)), (prefix, v)

    def test_encode_decode_roundtrip(self):
        headers = [(":method", "POST"), (":path", "/x.Y/Z"),
                   ("content-type", "application/grpc"), ("te", "trailers")]
        assert HpackDecoder().decode(encode_headers(headers)) == headers

    def test_static_indexed_and_dynamic_table(self):
        dec = HpackDecoder()
        # 0x88 = :status 200; then incremental literal; then dynamic ref
        block1 = bytes([0x88]) + b"\x40" + bytes([1]) + b"x" + bytes([1]) + b"y"
        assert dec.decode(block1) == [(":status", "200"), ("x", "y")]
        assert dec.decode(bytes([0x80 | 62])) == [("x", "y")]

    def test_huffman_coded_literal_decodes(self):
        dec = HpackDecoder()
        block = _huffman_header_block([("grpc-status", "0"), ("x-big", "A" * 300)])
        assert dec.decode(block) == [("grpc-status", "0"), ("x-big", "A" * 300)]

    def test_size_update_bounded_by_advertised_limit(self):
        """RFC 7541 §6.3: a dynamic-table size update above OUR
        advertised SETTINGS_HEADER_TABLE_SIZE (default 4096 — we send
        no override) is a decoding error. r19 regression: the old check
        used a 65536 literal, wrongly accepting (4096, 65536]."""
        import pytest

        from strake_spark.sources.h2grpc import _encode_int
        from strake_spark.errors import SourceError

        def update(n):
            b = bytearray(_encode_int(n, 5))
            b[0] |= 0x20
            return bytes(b)

        dec = HpackDecoder()
        assert dec.decode(update(0)) == []  # shrink: legal, clears table
        assert dec.max_size == 0
        assert dec.decode(update(4096)) == []  # restore to advertised
        assert dec.max_size == 4096
        for too_big in (4097, 65536, 1 << 30):
            with pytest.raises(SourceError, match="advertised"):
                HpackDecoder().decode(update(too_big))


class TestHuffman:
    """RFC 7541 Appendix B code validated three ways: the RFC's own
    Appendix C canonical vectors ARE the interop peer; the code must be
    complete (Kraft sum exactly 1) and prefix-free; and encode∘decode
    must be identity on arbitrary bytes."""

    # Appendix C.4 / C.6 Huffman-coded literal values, verbatim
    VECTORS = [
        ("www.example.com", "f1e3c2e5f23a6ba0ab90f4ff"),
        ("no-cache", "a8eb10649cbf"),
        ("custom-key", "25a849e95ba97d7f"),
        ("custom-value", "25a849e95bb8e8b4bf"),
        ("302", "6402"),
        ("private", "aec3771a4b"),
        ("Mon, 21 Oct 2013 20:13:21 GMT",
         "d07abe941054d444a8200595040b8166e082a62d1bff"),
        ("https://www.example.com", "9d29ad171863c78f0b97c8e9ae82ae43d3"),
        ("307", "640eff"),
        ("Mon, 21 Oct 2013 20:13:22 GMT",
         "d07abe941054d444a8200595040b8166e084a62d1bff"),
        ("gzip", "9bd9ab"),
        ("foo=ASDJKHQKBZXOQWEOPIUAXQWEOIU; max-age=3600; version=1",
         "94e7821dd7f2e6c7b335dfdfcd5b3960d5af27087f3672c1ab270fb5291f9587"
         "316065c003ed4ee5b1063d5007"),
    ]

    def test_appendix_c_vectors_encode(self):
        for plain, hexs in self.VECTORS:
            assert huffman_encode(plain.encode()).hex() == hexs, plain

    def test_appendix_c_vectors_decode(self):
        for plain, hexs in self.VECTORS:
            assert huffman_decode(bytes.fromhex(hexs)) == plain.encode(), plain

    def test_code_is_complete_and_prefix_free(self):
        from fractions import Fraction

        assert len(HUFF_TABLE) == 257
        assert sum(Fraction(1, 2**n) for _, n in HUFF_TABLE) == 1
        strs = sorted(format(c, f"0{n}b") for c, n in HUFF_TABLE)
        assert len(set(strs)) == 257
        for a, b in zip(strs, strs[1:]):
            assert not b.startswith(a), (a, b)

    def test_roundtrip_all_bytes_and_random(self):
        import random

        assert huffman_decode(huffman_encode(bytes(range(256)))) == bytes(range(256))
        rng = random.Random(7541)
        for _ in range(50):
            data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
            assert huffman_decode(huffman_encode(data)) == data

    def test_bad_padding_rejected(self):
        # 'a' = 00011 (5 bits) + 3 zero pad bits — not an EOS prefix
        with pytest.raises(SourceError, match="padding"):
            huffman_decode(bytes([0b00011000]))

    def test_eos_in_string_rejected(self):
        # 30 one-bits = EOS, padded with 1s to 4 bytes
        with pytest.raises(SourceError, match="EOS"):
            huffman_decode(b"\xff\xff\xff\xff")

    def test_overlong_padding_rejected(self):
        # a valid symbol then >= 8 pure padding bits
        enc = huffman_encode(b"a") + b"\xff"
        with pytest.raises(SourceError, match="trailing"):
            huffman_decode(enc)


class TestGrpcFraming:
    def test_message_reassembly_across_boundaries(self):
        buf = GrpcMessageBuffer()
        whole = grpc_frame(b"hello") + grpc_frame(b"world!")
        out = []
        for i in range(0, len(whole), 3):
            out += buf.feed(whole[i : i + 3])
        assert out == [b"hello", b"world!"]
        assert buf.pending() == 0

    def test_compressed_flag_rejected(self):
        buf = GrpcMessageBuffer()
        with pytest.raises(SourceError, match="compressed"):
            buf.feed(b"\x01" + (3).to_bytes(4, "big") + b"abc")


def _echo_stream(request: bytes) -> list[bytes]:
    # three response messages derived from the request
    return [request, request[::-1], b"tail:" + request]


class TestLiveTransport:
    @pytest.fixture(scope="class")
    def server(self):
        srv = H2GrpcTestServer({"/test.Echo/Stream": _echo_stream})
        yield srv
        srv.close()

    def test_unary_stream_roundtrip(self, server):
        got = list(
            unary_stream(f"127.0.0.1:{server.port}", "/test.Echo/Stream", b"abc")
        )
        assert got == [b"abc", b"cba", b"tail:abc"]

    def test_two_streams_on_one_channel_use_dynamic_table(self, server):
        chan = H2GrpcChannel("127.0.0.1", server.port)
        try:
            assert list(chan.call("/test.Echo/Stream", b"x"))[0] == b"x"
            # second stream: server emits content-type as a dynamic ref
            assert list(chan.call("/test.Echo/Stream", b"y"))[0] == b"y"
        finally:
            chan.close()

    def test_unknown_method_raises_grpc_status(self, server):
        with pytest.raises(SourceError, match="status 12"):
            list(
                unary_stream(
                    f"127.0.0.1:{server.port}", "/test.Echo/Nope", b""
                )
            )

    def test_nonzero_trailer_status_raises(self):
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"partial"]}, grpc_status="13"
        )
        try:
            with pytest.raises(SourceError, match="status 13"):
                list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/M", b""))
        finally:
            srv.close()

    def test_large_response_replenishes_flow_control(self):
        # >64 KiB of response DATA forces the client past the default
        # 65535-byte connection/stream windows — without WINDOW_UPDATE
        # replenishment the server-side sendall would stall (our test
        # server ignores windows, but the client must still emit
        # correct updates; assert the stream completes and byte-exact)
        big = bytes(range(256)) * 512  # 128 KiB
        srv = H2GrpcTestServer({"/t.S/Big": lambda req: [big, big]})
        try:
            got = list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/Big", b""))
            assert got == [big, big]
        finally:
            srv.close()


class TestProtoOverTransport:
    def test_wire_decode_composes_with_transport(self):
        """End to end minus Spark: proto-encoded rows served over live
        h2c, decoded by the existing descriptor-driven decoder."""
        from strake_spark.sources.grpc_source import decode_message, parse_field_spec

        def _row(i: int) -> bytes:
            # field 1 (varint id), field 2 (len-delimited name)
            name = f"n{i}".encode()
            return bytes([0x08, i, 0x12, len(name)]) + name

        srv = H2GrpcTestServer({"/d.T/Rows": lambda req: [_row(1), _row(2)]})
        try:
            fields = parse_field_spec("1:id:int64,2:name:string")
            rows = [
                decode_message(m, fields)
                for m in unary_stream(f"127.0.0.1:{srv.port}", "/d.T/Rows", b"")
            ]
            assert rows == [{"id": 1, "name": "n1"}, {"id": 2, "name": "n2"}]
        finally:
            srv.close()


class TestSparkEndToEnd:
    def test_grpc_source_view_reads_over_h2c(self, spark):
        """The full path the reference supports (grpc.rs:21-45): a
        registered gRPC source readable as a Spark view — transport is
        the jar-free h2c fallback, rows decoded by descriptor spec."""
        from strake_spark.config import parse_config
        from strake_spark.sources.registry import register_source

        def _row(i: int) -> bytes:
            name = f"item{i}".encode()
            # field 1 varint id, field 2 string name, field 3 double score
            return (
                bytes([0x08, i, 0x12, len(name)]) + name
                + bytes([0x19]) + struct.pack("<d", i * 1.5)
            )

        srv = H2GrpcTestServer(
            {"/catalog.Items/List": lambda req: [_row(i) for i in range(1, 6)]}
        )
        try:
            cfg = parse_config(
                {
                    "sources": [
                        {
                            "name": "gt",
                            "type": "grpc",
                            "url": f"127.0.0.1:{srv.port}",
                            "tables": [
                                {
                                    "name": "items",
                                    "options": {
                                        "method": "/catalog.Items/List",
                                        "fields": "1:id:int64,2:name:string,3:score:double",
                                    },
                                }
                            ],
                        }
                    ]
                }
            )
            views = register_source(spark, cfg.sources[0])
            assert views == ["gt_items"]
            rows = sorted(spark.table("gt_items").collect())
            assert [(r.id, r.name, r.score) for r in rows] == [
                (i, f"item{i}", i * 1.5) for i in range(1, 6)
            ]
            # predicate + projection still work through the DataSource
            got = (
                spark.table("gt_items")
                .filter("id >= 4")
                .select("name")
                .collect()
            )
            assert sorted(r.name for r in got) == ["item4", "item5"]
        finally:
            srv.close()


class TestControlFrames:
    def test_server_ping_is_acked_mid_stream(self):
        """PING between response frames must be answered (flag ACK,
        same payload) without disturbing the message stream."""
        acks = []

        class PingServer(H2GrpcTestServer):
            def _respond(self, conn, sid, st, sent_indexed_ct):
                conn.sendall(pack_frame(FT_PING, 0, 0, b"12345678"))
                out = super()._respond(conn, sid, st, sent_indexed_ct)
                # drain the client's PING ack (arrives async; generous
                # timeout — a loaded box can stall the worker thread)
                try:
                    conn.settimeout(30)
                    while True:
                        ftype, flags, sid2, payload = read_frame(conn)
                        if ftype == FT_PING and flags & FLAG_ACK:
                            acks.append(payload)
                            break
                except Exception:
                    pass
                return out

        srv = PingServer({"/t.S/M": lambda req: [b"ok"]})
        try:
            got = list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/M", b""))
            assert got == [b"ok"]
            import time

            deadline = time.time() + 30
            while not acks and time.time() < deadline:
                time.sleep(0.05)
            assert acks == [b"12345678"]
        finally:
            srv.close()

    def test_goaway_surfaces_as_source_error(self):
        class GoawayServer(H2GrpcTestServer):
            def _respond(self, conn, sid, st, sent_indexed_ct):
                # error code 2 = INTERNAL_ERROR, last stream id 0
                conn.sendall(
                    pack_frame(FT_GOAWAY, 0, 0, b"\x00" * 4 + (2).to_bytes(4, "big"))
                )
                return sent_indexed_ct

        srv = GoawayServer({"/t.S/M": lambda req: [b"never"]})
        try:
            with pytest.raises(SourceError, match="GOAWAY.*error 2"):
                list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/M", b""))
        finally:
            srv.close()


class TestHuffmanOverLiveTransport:
    def test_full_client_path_with_huffman_encoding_server(self):
        """grpc-go/grpc-java Huffman-encode response headers; the
        in-process server's huffman mode drives the client decoder
        through that exact path end-to-end (headers AND trailers)."""
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"h-" + req]}, huffman=True
        )
        try:
            got = list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/M", b"xyz"))
            assert got == [b"h-xyz"]
        finally:
            srv.close()

    def test_huffman_trailer_status_propagates(self):
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"partial"]}, grpc_status="13", huffman=True
        )
        try:
            with pytest.raises(SourceError, match="status 13"):
                list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/M", b""))
        finally:
            srv.close()


class TestSendFlowControl:
    def test_large_request_respects_small_peer_window(self):
        """Peer advertises SETTINGS_INITIAL_WINDOW_SIZE=1024 and grants
        WINDOW_UPDATE only as it consumes — a 100 KiB request must
        arrive intact with no DATA frame ever exceeding the granted
        window (RFC 7540 §6.9)."""
        received = []

        def handler(req: bytes) -> list[bytes]:
            received.append(req)
            return [len(req).to_bytes(4, "big")]

        srv = H2GrpcTestServer({"/t.S/Up": handler}, initial_window=1024)
        try:
            big = bytes(range(256)) * 400  # 100 KiB
            got = list(unary_stream(f"127.0.0.1:{srv.port}", "/t.S/Up", big))
            assert got == [len(big).to_bytes(4, "big")]
            assert received == [big]
            assert srv.window_violations == []
        finally:
            srv.close()

    def test_endpoint_parsing(self):
        assert parse_endpoint("127.0.0.1:50051") == ("127.0.0.1", 50051, False)
        assert parse_endpoint("grpc://h:1") == ("h", 1, False)
        assert parse_endpoint("grpcs://h:443") == ("h", 443, True)
        assert parse_endpoint("grpcs://h") == ("h", 443, True)
        with pytest.raises(SourceError, match="host:port"):
            parse_endpoint("nohostport")


# ------------------------------------------------------------------ TLS


def _self_signed_cert(tmp_path):
    """Self-signed cert for 127.0.0.1/localhost via cryptography (the
    same generator posture as tests/test_oidc_discovery.py)."""
    import datetime
    import ipaddress

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "strake-grpcs-test")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(days=1))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.IPAddress(ipaddress.ip_address("127.0.0.1")),
                    x509.DNSName("localhost"),
                ]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_path = tmp_path / "cert.pem"
    key_path = tmp_path / "key.pem"
    cert_path.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_path.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
    )
    return str(cert_path), str(key_path)


class TestGrpcsTls:
    """grpcs:// over the stdlib ssl + ALPN h2 path (the reference's
    tonic TLS transport, crates/connectors/src/sources/grpc.rs:21-45):
    live TLS server, pinned-roots verification, verification-on proof,
    and ALPN negotiation enforcement."""

    @pytest.fixture(scope="class")
    def tls_material(self, tmp_path_factory):
        return _self_signed_cert(tmp_path_factory.mktemp("grpcs"))

    def _server_ctx(self, tls_material, alpn=("h2",)):
        import ssl as _ssl

        cert_path, key_path = tls_material
        ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(cert_path, key_path)
        if alpn:
            ctx.set_alpn_protocols(list(alpn))
        return ctx

    def test_grpcs_roundtrip_with_pinned_roots(self, tls_material):
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"tls-" + req, req[::-1]]},
            ssl_context=self._server_ctx(tls_material),
        )
        try:
            got = list(
                unary_stream(
                    f"grpcs://127.0.0.1:{srv.port}",
                    "/t.S/M",
                    b"abc",
                    tls_root_certs=tls_material[0],
                )
            )
            assert got == [b"tls-abc", b"cba"]
        finally:
            srv.close()

    def test_grpcs_huffman_and_flow_control_compose(self, tls_material):
        srv = H2GrpcTestServer(
            {"/t.S/Up": lambda req: [req]},
            huffman=True,
            initial_window=2048,
            ssl_context=self._server_ctx(tls_material),
        )
        try:
            big = b"\x42" * 70000
            got = list(
                unary_stream(
                    f"grpcs://127.0.0.1:{srv.port}",
                    "/t.S/Up",
                    big,
                    tls_root_certs=tls_material[0],
                )
            )
            assert got == [big]
            assert srv.window_violations == []
        finally:
            srv.close()

    def test_unpinned_self_signed_is_rejected(self, tls_material):
        """Hostname/chain verification is ON by default: without the
        pinned root, the self-signed peer must be refused."""
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"never"]},
            ssl_context=self._server_ctx(tls_material),
        )
        try:
            with pytest.raises(SourceError, match="TLS handshake"):
                list(
                    unary_stream(f"grpcs://127.0.0.1:{srv.port}", "/t.S/M", b"")
                )
        finally:
            srv.close()

    def test_peer_without_alpn_h2_is_rejected(self, tls_material):
        srv = H2GrpcTestServer(
            {"/t.S/M": lambda req: [b"never"]},
            ssl_context=self._server_ctx(tls_material, alpn=()),
        )
        try:
            with pytest.raises(SourceError, match="ALPN"):
                list(
                    unary_stream(
                        f"grpcs://127.0.0.1:{srv.port}",
                        "/t.S/M",
                        b"",
                        tls_root_certs=tls_material[0],
                    )
                )
        finally:
            srv.close()


class TestSparkEndToEndTls:
    def test_grpc_source_view_reads_over_grpcs(self, spark, tmp_path):
        """The grpcs:// URL scheme end-to-end through the registered
        Spark view — TLS + ALPN h2 + proto decode, no grpcio."""
        from strake_spark.config import parse_config
        from strake_spark.sources.registry import register_source

        cert_path, key_path = _self_signed_cert(tmp_path)
        import ssl as _ssl

        ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(cert_path, key_path)
        ctx.set_alpn_protocols(["h2"])

        def _row(i: int) -> bytes:
            name = f"tls{i}".encode()
            return bytes([0x08, i, 0x12, len(name)]) + name

        srv = H2GrpcTestServer(
            {"/cat.Items/List": lambda req: [_row(i) for i in (1, 2, 3)]},
            ssl_context=ctx,
        )
        try:
            cfg = parse_config(
                {
                    "sources": [
                        {
                            "name": "gtls",
                            "type": "grpc",
                            "url": f"grpcs://127.0.0.1:{srv.port}",
                            "tables": [
                                {
                                    "name": "items",
                                    "options": {
                                        "method": "/cat.Items/List",
                                        "fields": "1:id:int64,2:name:string",
                                        "tls_root_certs": cert_path,
                                    },
                                }
                            ],
                        }
                    ]
                }
            )
            register_source(spark, cfg.sources[0])
            rows = sorted(spark.table("gtls_items").collect())
            assert [(r.id, r.name) for r in rows] == [
                (1, "tls1"), (2, "tls2"), (3, "tls3")
            ]
        finally:
            srv.close()


class TestSettingsMaxFrameSizeValidation:
    """RFC 7540 §6.5.2 (r16 ADVICE): a peer-advertised
    SETTINGS_MAX_FRAME_SIZE outside 16384..2^24-1 is a connection
    error, not something to clamp — clamping UP licensed sends larger
    than the peer's declared limit."""

    def _chan(self):
        from strake_spark.sources.h2grpc import (
            DEFAULT_WINDOW, MAX_FRAME_SIZE, H2GrpcChannel,
        )

        ch = object.__new__(H2GrpcChannel)
        ch._conn_window = DEFAULT_WINDOW
        ch._initial_window = DEFAULT_WINDOW
        ch._peer_max_frame = MAX_FRAME_SIZE
        ch._stream_windows = {}
        return ch

    def _settings(self, ident: int, value: int) -> bytes:
        import struct

        return struct.pack("!HI", ident, value)

    def test_below_floor_is_protocol_error(self):
        import pytest

        from strake_spark.errors import SourceError

        ch = self._chan()
        with pytest.raises(SourceError, match="SETTINGS_MAX_FRAME_SIZE"):
            ch._apply_settings(self._settings(0x5, 16383))

    def test_above_ceiling_is_protocol_error(self):
        import pytest

        from strake_spark.errors import SourceError

        ch = self._chan()
        with pytest.raises(SourceError, match="protocol error"):
            ch._apply_settings(self._settings(0x5, 1 << 24))

    def test_legal_bounds_accepted_verbatim(self):
        ch = self._chan()
        ch._apply_settings(self._settings(0x5, 16384))
        assert ch._peer_max_frame == 16384
        ch._apply_settings(self._settings(0x5, (1 << 24) - 1))
        assert ch._peer_max_frame == (1 << 24) - 1


class TestMessageLengthBound:
    def test_hostile_length_prefix_is_loud(self):
        # r19 opt round: a declared multi-GiB message would stream DATA
        # into the buffer until OOM; the cap fires on the prefix.
        import pytest

        from strake_spark.errors import SourceError
        from strake_spark.sources.h2grpc import GrpcMessageBuffer

        buf = GrpcMessageBuffer()
        with pytest.raises(SourceError, match="exceeds"):
            buf.feed(b"\x00" + (1 << 30).to_bytes(4, "big") + b"xx")
        # a normal message still reassembles across feeds
        buf2 = GrpcMessageBuffer()
        assert buf2.feed(b"\x00\x00\x00\x00\x03ab") == []
        assert buf2.feed(b"c") == [b"abc"]
