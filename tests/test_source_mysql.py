"""MySQL classic-protocol source, tested against a LIVE in-process
server speaking handshake v10 + mysql_native_password + COM_QUERY text
resultsets at the socket boundary (DuckDB-backed, so pushed SQL
executes for real — including the mysql dialect's backtick respelling,
which DuckDB accepts as identifier quotes)."""

from __future__ import annotations

import hashlib
import socketserver
import struct
import threading

import duckdb
import pytest

import strake_spark as ss
from strake_spark.errors import SourceError
from strake_spark.inventory._wire_fakes import _SCRAMBLE, FakeMySql
from strake_spark.sources.mysqlwire import MySqlWireConnection, _native_password_token
from tests.conftest import SF_DIR

@pytest.fixture(scope="module")
def my(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mysqlwire")
    duck_path = str(tmp / "backing.duckdb")
    con = duckdb.connect(duck_path)
    con.execute(
        f"CREATE TABLE supplier AS SELECT * FROM read_parquet('{SF_DIR}/supplier.parquet')"
    )
    con.execute("""
        CREATE TABLE typed AS SELECT * FROM (VALUES
          (1, 2.5, DATE '2024-06-01', TIMESTAMP '2024-06-01 08:15:00', 'a'),
          (2, NULL, NULL, NULL, NULL)
        ) t(id, x, d, ts, s)
    """)
    con.execute("""
        CREATE TABLE money AS SELECT * FROM (VALUES
          (1, CAST('12345678901234567890123456789012.345678' AS DECIMAL(38,6))),
          (2, CAST('-0.000001' AS DECIMAL(38,6))),
          (3, CAST(NULL AS DECIMAL(38,6)))
        ) t(id, bal)
    """)
    con.close()
    srv = FakeMySql(duck_path, users={"svc": "hunter2"})
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def my_tls(tmp_path_factory, my):
    import ssl

    from tests.conftest import make_self_signed_cert

    tmp = tmp_path_factory.mktemp("mytls")
    cert_pem, key_pem = make_self_signed_cert(tmp)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_pem, key_pem)
    srv = FakeMySql(my.duck_path, users={"svc": "hunter2"}, ssl_context=ctx)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.ca_path = cert_pem  # type: ignore[attr-defined]
    yield srv
    srv.shutdown()


class TestTls:
    def test_sslmode_require(self, my_tls):
        c = MySqlWireConnection("127.0.0.1", my_tls.server_address[1],
                                user="svc", password="hunter2",
                                sslmode="require")
        _f, rows = c.query("SELECT 3 AS v")
        c.close()
        assert rows == [(3,)]

    def test_verify_full_with_ca(self, my_tls):
        c = MySqlWireConnection("127.0.0.1", my_tls.server_address[1],
                                user="svc", password="hunter2",
                                sslmode="verify-full", ssl_ca=my_tls.ca_path)
        _f, rows = c.query("SELECT 4 AS v")
        c.close()
        assert rows == [(4,)]

    def test_verify_full_rejects_unknown_ca(self, my_tls):
        import ssl

        with pytest.raises(ssl.SSLError):
            MySqlWireConnection("127.0.0.1", my_tls.server_address[1],
                                user="svc", password="hunter2",
                                sslmode="verify-full")


class TestWireClient:
    def test_auth_and_query(self, my):
        c = MySqlWireConnection("127.0.0.1", my.server_address[1],
                                user="svc", password="hunter2")
        fields, rows = c.query("SELECT 7 AS n, 'y' AS s")
        c.close()
        assert [f.name for f in fields] == ["n", "s"]
        assert rows == [(7, "y")]

    def test_wrong_password_rejected(self, my):
        with pytest.raises(SourceError, match="auth failed|Access denied"):
            MySqlWireConnection("127.0.0.1", my.server_address[1],
                                user="svc", password="nope")

    def test_error_then_resync(self, my):
        c = MySqlWireConnection("127.0.0.1", my.server_address[1],
                                user="svc", password="hunter2")
        with pytest.raises(SourceError, match="query failed"):
            c.query("SELECT * FROM missing")
        _f, rows = c.query("SELECT 1 AS ok")
        assert rows == [(1,)]
        c.close()


class TestDecimalFidelity:
    """NEWDECIMAL must round-trip exactly as DecimalType(p, s) derived
    from the column definition's length/decimals bytes — not collapse
    to float64."""

    def test_wire_client_decodes_decimal_exact(self, my):
        import decimal

        c = MySqlWireConnection("127.0.0.1", my.server_address[1],
                                user="svc", password="hunter2")
        fields, rows = c.query("SELECT id, bal FROM money ORDER BY id")
        c.close()
        from pyspark.sql import types as T

        assert fields[1].spark_type() == T.DecimalType(38, 6)
        assert rows[0][1] == decimal.Decimal(
            "12345678901234567890123456789012.345678"
        )
        assert isinstance(rows[0][1], decimal.Decimal)
        assert rows[1][1] == decimal.Decimal("-0.000001")
        assert rows[2][1] is None

    def test_spark_schema_and_values_exact(self, spark, my):
        import decimal

        ss.connect(
            {"sources": [{
                "name": "mdec", "type": "mysql_wire",
                "url": f"mysql://127.0.0.1:{my.server_address[1]}/db",
                "username": "svc", "password": "hunter2",
                "tables": [{"name": "money"}],
            }]},
            spark=spark,
        )
        df = spark.table("mdec_money")
        assert df.schema["bal"].dataType.simpleString() == "decimal(38,6)"
        rows = {r.id: r.bal for r in df.collect()}
        assert rows[1] == decimal.Decimal(
            "12345678901234567890123456789012.345678"
        )
        assert rows[3] is None

    def test_precision_above_38_falls_back_to_double(self):
        from pyspark.sql import types as T

        from strake_spark.sources.mysqlwire import _Field

        # mysql allows DECIMAL up to p=65; 65 digits + sign + point
        f = _Field("big", 0xF6, column_length=67, decimals=10)
        assert f.spark_type() == T.DoubleType()
        f = _Field("ok", 0xF6, column_length=40, decimals=10)
        assert f.spark_type() == T.DecimalType(38, 10)
        # unsigned has no sign char in the display width
        f = _Field("u", 0xF6, column_length=39, decimals=10, unsigned=True)
        assert f.spark_type() == T.DecimalType(38, 10)


class TestPacketSplitting:
    def test_16mb_packet_continuation(self):
        """A payload of exactly 0xffffff bytes continues in follow-up
        packets; the client must concatenate until one arrives under
        the limit."""
        import socket

        a, b = socket.socketpair()
        conn = object.__new__(MySqlWireConnection)
        conn._sock = a
        conn._buf = b""
        conn._seq = 0
        payload = bytes(range(256)) * ((0xFFFFFF + 10) // 256 + 1)
        payload = payload[:0xFFFFFF + 10]

        def send():
            b.sendall((0xFFFFFF).to_bytes(3, "little") + b"\x00"
                      + payload[:0xFFFFFF])
            b.sendall((10).to_bytes(3, "little") + b"\x01"
                      + payload[0xFFFFFF:])

        t = threading.Thread(target=send, daemon=True)
        t.start()
        got = conn._read_packet()
        t.join()
        a.close()
        b.close()
        assert got == payload

    def test_live_server_splits_and_client_reassembles(self, my):
        """End-to-end through handshake + COM_QUERY: a >16 MB row value
        forces the server to emit a 0xffffff-length packet plus
        continuation, and the client must reassemble it byte-exact
        (r7 verdict carry — the socketpair tests above exercise only
        _read_packet in isolation)."""
        c = MySqlWireConnection("127.0.0.1", my.server_address[1],
                                user="svc", password="hunter2")
        try:
            n = 0xFFFFFF + 4242  # past the boundary by a non-round amount
            _f, rows = c.query(f"SELECT repeat('ab', {n // 2}) AS big")
            assert len(rows) == 1
            big = rows[0][0]
            assert len(big) == (n // 2) * 2
            assert big == "ab" * (n // 2)
            # connection stays usable after the continuation sequence
            _f, rows = c.query("SELECT 5 AS ok")
            assert rows == [(5,)]
        finally:
            c.close()

    def test_exact_boundary_followed_by_empty_packet(self):
        """A payload of exactly 0xffffff bytes is terminated by an
        empty continuation packet per the protocol."""
        import socket

        a, b = socket.socketpair()
        conn = object.__new__(MySqlWireConnection)
        conn._sock = a
        conn._buf = b""
        conn._seq = 0
        payload = b"z" * 0xFFFFFF

        def send():
            b.sendall((0xFFFFFF).to_bytes(3, "little") + b"\x00" + payload)
            b.sendall((0).to_bytes(3, "little") + b"\x01")

        t = threading.Thread(target=send, daemon=True)
        t.start()
        got = conn._read_packet()
        t.join()
        a.close()
        b.close()
        assert got == payload


class TestSparkSource:
    @pytest.fixture(scope="class")
    def engine(self, spark, my):
        return ss.connect(
            {
                "sources": [{
                    "name": "my",
                    "type": "mysql_wire",
                    "url": f"mysql://127.0.0.1:{my.server_address[1]}/db",
                    "username": "svc",
                    "password": "hunter2",
                    "options": {"num_partitions": 2},
                    "tables": [
                        {"name": "supplier", "partition_column": "s_suppkey"},
                        {"name": "typed"},
                    ],
                }]
            },
            spark=spark,
        )

    def test_partitioned_scan_matches_parquet(self, spark, engine):
        df = spark.table("my_supplier")
        assert df.rdd.getNumPartitions() == 2
        got = engine.execute("SELECT count(*) AS n FROM my_supplier").to_pylist()
        exp = spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
        assert got == [{"n": exp}]

    def test_typed_and_null_roundtrip(self, spark, engine):
        import datetime

        rows = {r.id: r for r in spark.table("my_typed").collect()}
        assert rows[1].x == 2.5 and rows[2].x is None
        assert rows[1].d == datetime.date(2024, 6, 1) and rows[2].d is None
        assert rows[1].ts == datetime.datetime(2024, 6, 1, 8, 15) and rows[2].ts is None
        assert rows[1].s == "a" and rows[2].s is None

    def test_federation_pushdown_respells_backticks(self, engine, my):
        """Whole-statement pushdown through the mysql dialect: the
        pushed text must quote identifiers with backticks (fix_text
        outside literals) and execute remotely."""
        before = len(my.queries)
        out = engine.execute(
            "SELECT s_nationkey, count(*) AS n FROM my_supplier "
            "WHERE s_acctbal > 0 GROUP BY s_nationkey"
        )
        pushed = [q for q in my.queries[before:] if "group by" in q.lower()]
        assert pushed, f"no pushed aggregate in {my.queries[before:]}"
        # mysql dialect: never double-quoted identifiers (bare names are
        # fine; quoting, when needed, is backticked — dialect goldens
        # cover the respelling itself)
        assert '"' not in pushed[0]
        assert out.num_rows > 0


class TestMalformedServer:
    @staticmethod
    def _serve_bytes(payload: bytes):
        import socketserver

        class H(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    self.request.settimeout(5.0)  # never wedge serve_forever
                    self.request.sendall(payload)
                    self.request.recv(65536)
                except OSError:
                    pass
                finally:
                    self.request.close()

        class Srv(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        srv = Srv(("127.0.0.1", 0), H)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    @pytest.mark.parametrize("payload", [
        b"",                                          # immediate close
        b"\x05\x00\x00\x00\xff\x15\x04",              # ERR greeting (refused)
        b"\x02\x00\x00\x00\x09\x00",                  # protocol version 9
        b"\x30\x00\x00\x00" + b"\x0a" + b"x\0" + b"\x00" * 20,  # truncated v10
    ])
    def test_malformed_fails_cleanly(self, payload):
        srv = self._serve_bytes(payload)
        try:
            with pytest.raises(SourceError):
                MySqlWireConnection("127.0.0.1", srv.server_address[1],
                                    user="u", password="p", timeout=3.0)
        finally:
            srv.shutdown()


class TestLenencFuzz:
    """Packet-parser robustness (r18): length-encoded ints/strings come
    from an untrusted server — truncations must be SourceError, never a
    raw IndexError/struct.error or a silently shortened value."""

    def test_arbitrary_buffers_decode_or_raise_source_error(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.errors import SourceError
        from strake_spark.sources.mysqlwire import (
            _read_lenenc_int,
            _read_lenenc_str,
        )

        @settings(max_examples=200, deadline=None)
        @given(buf=st.binary(max_size=32), pos=st.integers(0, 32))
        def run(buf, pos):
            for fn in (_read_lenenc_int, _read_lenenc_str):
                try:
                    val, newpos = fn(buf, pos)
                    assert 0 <= newpos <= len(buf)
                except SourceError:
                    pass

        run()

    def test_lenenc_roundtrip_all_widths(self):
        from strake_spark.sources.mysqlwire import _read_lenenc_int

        for val, enc in [
            (5, b"\x05"),
            (251, b"\xfc\xfb\x00"),
            (65535, b"\xfc\xff\xff"),
            (1 << 20, b"\xfd\x00\x00\x10"),
            (1 << 40, b"\xfe" + (1 << 40).to_bytes(8, "little")),
        ]:
            got, pos = _read_lenenc_int(enc + b"tail", 0)
            assert got == val and pos == len(enc)

    def test_truncated_and_oversized_are_loud(self):
        import pytest

        from strake_spark.errors import SourceError
        from strake_spark.sources.mysqlwire import (
            _read_lenenc_int,
            _read_lenenc_str,
        )

        with pytest.raises(SourceError, match="truncated"):
            _read_lenenc_int(b"\xfc\x01", 0)  # 2-byte int, 1 byte present
        with pytest.raises(SourceError, match="truncated"):
            _read_lenenc_int(b"", 0)
        with pytest.raises(SourceError, match="exceeds packet"):
            _read_lenenc_str(b"\x0aab", 0)  # declared 10, 2 present


class TestContinuationBound:
    def test_runaway_continuation_stream_is_bounded(self, monkeypatch):
        # r19 opt round: each packet is <=16MB by the 3-byte length,
        # but a hostile/looping server streaming endless 0xffffff
        # continuations would grow the reassembled payload until OOM.
        from strake_spark.errors import SourceError
        from strake_spark.sources.mysqlwire import MySqlWireConnection

        conn = object.__new__(MySqlWireConnection)
        chunk = b"\xff\xff\xff\x00" + b"x" * 0xFFFFFF
        conn._buf = chunk * 3  # first packet + 2 continuations
        conn._seq = 0
        monkeypatch.setattr(MySqlWireConnection, "_MAX_PAYLOAD", 0xFFFFFF)
        with pytest.raises(SourceError, match="runaway continuation"):
            conn._read_packet()
