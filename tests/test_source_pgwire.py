"""Postgres wire-protocol source, tested against a LIVE in-process
server speaking the v3 protocol (startup, cleartext + md5 auth, simple
query) backed by DuckDB — so every statement, including federation-
pushed SQL, actually executes over the wire. The fake lives at the
SOCKET boundary: the client code under test is byte-for-byte the code
a real Postgres would see."""

from __future__ import annotations

import hashlib
import os
import socketserver
import struct
import threading

import duckdb
import pytest

import strake_spark as ss
from strake_spark.errors import SourceError
from strake_spark.sources.pgwire import PgWireConnection
from tests.conftest import SF_DIR

_DUCK_TO_OID = {
    "BOOLEAN": 16, "BIGINT": 20, "SMALLINT": 21, "INTEGER": 23,
    "FLOAT": 700, "DOUBLE": 701, "DECIMAL": 1700, "HUGEINT": 20,
    "VARCHAR": 1043, "DATE": 1082, "TIMESTAMP": 1114,
    "TIMESTAMP WITH TIME ZONE": 1184,
}


def _encode_text(v) -> bytes:
    import datetime

    if isinstance(v, bool):
        return b"t" if v else b"f"
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ").encode()
    return str(v).encode()


class _Handler(socketserver.BaseRequestHandler):
    def setup(self):
        self._buf = b""

    def _recv_exact(self, n):
        while len(self._buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _send(self, mtype: bytes, payload: bytes):
        self.request.sendall(mtype + struct.pack(">i", len(payload) + 4) + payload)

    def _ready(self):
        self._send(b"Z", b"I")

    def _error(self, msg: str):
        fields = b"SERROR\0C42000\0M" + msg.encode() + b"\0\0"
        self._send(b"E", fields)

    def handle(self):
        srv = self.server
        if getattr(srv, "ssl_context", None) is not None:
            # SSLRequest: 8-byte packet with magic 80877103 -> 'S' -> TLS
            (ln,) = struct.unpack(">i", self._recv_exact(4))
            (magic,) = struct.unpack(">i", self._recv_exact(4))
            assert ln == 8 and magic == 80877103, "expected SSLRequest first"
            self.request.sendall(b"S")
            self.request = srv.ssl_context.wrap_socket(
                self.request, server_side=True
            )
            self._buf = b""
        # ---- startup
        (length,) = struct.unpack(">i", self._recv_exact(4))
        payload = self._recv_exact(length - 4)
        (proto,) = struct.unpack(">i", payload[:4])
        if proto != 196608:
            self._error("unsupported protocol")
            return
        kv = payload[4:].split(b"\0")
        params = dict(zip(kv[::2], kv[1::2]))
        user = params.get(b"user", b"").decode()
        # ---- auth
        if srv.auth_mode == "scram":
            import base64
            import hmac as _hmac
            import os

            self._send(b"R", struct.pack(">i", 10) + b"SCRAM-SHA-256\0\0")
            mtype = self._recv_exact(1)
            (ln,) = struct.unpack(">i", self._recv_exact(4))
            body = self._recv_exact(ln - 4)
            mech, rest = body.split(b"\0", 1)
            (flen,) = struct.unpack(">i", rest[:4])
            client_first = rest[4:4 + flen].decode()
            if mtype != b"p" or mech != b"SCRAM-SHA-256":
                self._error("bad SASL start")
                return
            bare = client_first.split(",", 2)[2]
            cnonce = dict(kv.split("=", 1) for kv in bare.split(","))["r"]
            snonce = cnonce + base64.b64encode(os.urandom(9)).decode()
            salt = os.urandom(12)
            iters = 4096
            server_first = (
                f"r={snonce},s={base64.b64encode(salt).decode()},i={iters}"
            )
            self._send(b"R", struct.pack(">i", 11) + server_first.encode())
            mtype = self._recv_exact(1)
            (ln,) = struct.unpack(">i", self._recv_exact(4))
            client_final = self._recv_exact(ln - 4).decode()
            attrs = dict(kv.split("=", 1) for kv in client_final.split(","))
            salted = hashlib.pbkdf2_hmac(
                "sha256", srv.users.get(user, "").encode(), salt, iters
            )
            client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
            stored_key = hashlib.sha256(client_key).digest()
            without_proof = client_final.rsplit(",p=", 1)[0]
            auth_message = ",".join([bare, server_first, without_proof]).encode()
            client_sig = _hmac.new(stored_key, auth_message, hashlib.sha256).digest()
            expect = bytes(a ^ b for a, b in zip(client_key, client_sig))
            if (mtype != b"p" or attrs.get("r") != snonce
                    or base64.b64decode(attrs.get("p", "")) != expect):
                self._error("password authentication failed")
                return
            server_key = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
            server_sig = _hmac.new(server_key, auth_message, hashlib.sha256).digest()
            self._send(
                b"R",
                struct.pack(">i", 12)
                + b"v=" + base64.b64encode(server_sig),
            )
        elif srv.auth_mode == "md5":
            salt = b"ab12"
            self._send(b"R", struct.pack(">i", 5) + salt)
            mtype = self._recv_exact(1)
            (ln,) = struct.unpack(">i", self._recv_exact(4))
            pw = self._recv_exact(ln - 4).rstrip(b"\0").decode()
            inner = hashlib.md5(
                (srv.users.get(user, "") + user).encode()
            ).hexdigest()
            expect = "md5" + hashlib.md5(inner.encode() + salt).hexdigest()
            if mtype != b"p" or pw != expect:
                self._error("password authentication failed")
                return
        else:  # cleartext
            self._send(b"R", struct.pack(">i", 3))
            mtype = self._recv_exact(1)
            (ln,) = struct.unpack(">i", self._recv_exact(4))
            pw = self._recv_exact(ln - 4).rstrip(b"\0").decode()
            if mtype != b"p" or pw != srv.users.get(user):
                self._error("password authentication failed")
                return
        self._send(b"R", struct.pack(">i", 0))  # AuthenticationOk
        self._send(b"S", b"server_version\0testpg\0")
        self._ready()
        # ---- query loop
        con = duckdb.connect(srv.duck_path, read_only=True)
        try:
            while True:
                mtype = self._recv_exact(1)
                (ln,) = struct.unpack(">i", self._recv_exact(4))
                body = self._recv_exact(ln - 4)
                if mtype == b"X":
                    return
                if mtype != b"Q":
                    self._error(f"unsupported message {mtype!r}")
                    self._ready()
                    continue
                sql = body.rstrip(b"\0").decode()
                srv.queries.append(sql)
                cached = srv.wire_cache.get(sql) if srv.wire_cache is not None else None
                if cached is not None:
                    self.request.sendall(cached)
                    self._ready()
                    continue
                try:
                    rel = con.sql(sql)
                    names = rel.columns
                    types = [str(t).upper() for t in rel.types]
                    rows = rel.fetchall()
                except Exception as e:  # noqa: BLE001 - surfaced as ErrorResponse
                    self._error(str(e)[:300])
                    self._ready()
                    continue
                # RowDescription; DECIMAL(p,s) carries the real
                # atttypmod = ((p << 16) | s) + 4 like live postgres
                def typmod(t: str) -> int:
                    if t.startswith("DECIMAL("):
                        p, s = t[8:-1].split(",")
                        return ((int(p) << 16) | int(s)) + 4
                    return -1

                fields = b"".join(
                    name.encode() + b"\0"
                    + struct.pack(">ihihih", 0, 0,
                                  _DUCK_TO_OID.get(t.split("(")[0], 1043),
                                  -1, typmod(t), 0)
                    for name, t in zip(names, types)
                )
                # render the whole resultset once, send in large chunks
                # — a per-row syscall caps throughput well below what
                # the client under test can consume
                tmsg = struct.pack(">h", len(names)) + fields
                buf: list[bytes] = [
                    b"T" + struct.pack(">i", len(tmsg) + 4) + tmsg
                ]
                for row in rows:
                    parts = [struct.pack(">h", len(row))]
                    for v in row:
                        if v is None:
                            parts.append(struct.pack(">i", -1))
                        else:
                            enc = _encode_text(v)
                            parts.append(struct.pack(">i", len(enc)) + enc)
                    payload = b"".join(parts)
                    buf.append(b"D" + struct.pack(">i", len(payload) + 4) + payload)
                cmsg = f"SELECT {len(rows)}\0".encode()
                buf.append(b"C" + struct.pack(">i", len(cmsg) + 4) + cmsg)
                rendered = b"".join(buf)
                if srv.wire_cache is not None:
                    srv.wire_cache[sql] = rendered
                self.request.sendall(rendered)
                self._ready()
        finally:
            con.close()


class FakePg(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, duck_path, users, auth_mode="md5", ssl_context=None,
                 wire_cache: dict | None = None):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.duck_path = duck_path
        self.users = users
        self.auth_mode = auth_mode
        self.ssl_context = ssl_context
        self.queries: list[str] = []
        # when a dict is supplied, rendered resultset bytes are cached
        # by SQL text — benchmarks then measure the CLIENT, not this
        # Python fake's per-cell encode (tools/bench_wire_scan.py)
        self.wire_cache = wire_cache


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pgwire")
    duck_path = str(tmp / "backing.duckdb")
    con = duckdb.connect(duck_path)
    con.execute(
        f"CREATE TABLE customer AS SELECT * FROM read_parquet('{SF_DIR}/customer.parquet')"
    )
    con.execute(
        f"CREATE TABLE orders AS SELECT * FROM read_parquet('{SF_DIR}/orders.parquet')"
    )
    con.execute("""
        CREATE TABLE typed AS SELECT * FROM (VALUES
          (1, true,  1.5, DATE '2024-03-01', TIMESTAMP '2024-03-01 10:30:00.123456', 'ok'),
          (2, false, -0.25, DATE '2024-03-02', TIMESTAMP '2024-03-02 00:00:00', NULL)
        ) t(id, flag, x, d, ts, note)
    """)
    con.execute("""
        CREATE TABLE money AS SELECT * FROM (VALUES
          (1, CAST('1234567890123456789012345678.0123456789' AS DECIMAL(38,10))),
          (2, CAST('-0.0000000001' AS DECIMAL(38,10))),
          (3, CAST(NULL AS DECIMAL(38,10)))
        ) t(id, bal)
    """)
    con.close()
    srv = FakePg(duck_path, users={"alice": "s3cret"})
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


@pytest.fixture(scope="module")
def pg_scram(tmp_path_factory, pg):
    srv = FakePg(pg.duck_path, users={"alice": "s3cret"}, auth_mode="scram")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()


class TestScramAuth:
    def test_scram_sha256_roundtrip(self, pg_scram):
        c = PgWireConnection("127.0.0.1", pg_scram.server_address[1],
                             user="alice", password="s3cret")
        _f, rows = c.query("SELECT 5 AS v")
        c.close()
        assert rows == [(5,)]

    def test_scram_wrong_password(self, pg_scram):
        with pytest.raises(SourceError, match="auth"):
            PgWireConnection("127.0.0.1", pg_scram.server_address[1],
                             user="alice", password="wrong")

    def test_scram_through_spark(self, spark, pg_scram):
        eng = ss.connect(
            {"sources": [{
                "name": "sc", "type": "postgres_wire",
                "url": f"postgresql://127.0.0.1:{pg_scram.server_address[1]}/db",
                "username": "alice", "password": "s3cret",
                "tables": [{"name": "customer"}],
            }]},
            spark=spark,
        )
        out = eng.execute("SELECT count(*) AS n FROM sc_customer")
        assert out.to_pylist() == [{"n": 150}]


@pytest.fixture(scope="module")
def pg_tls(tmp_path_factory, pg):
    """TLS-wrapped fake: self-signed cert minted with cryptography."""
    import ssl

    from tests.conftest import make_self_signed_cert

    tmp = tmp_path_factory.mktemp("pgtls")
    cert_pem, key_pem = make_self_signed_cert(tmp)
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(cert_pem, key_pem)
    srv = FakePg(pg.duck_path, users={"alice": "s3cret"}, ssl_context=ctx)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    srv.ca_path = cert_pem  # type: ignore[attr-defined]
    yield srv
    srv.shutdown()


class TestTls:
    def test_sslmode_require_encrypts(self, pg_tls):
        c = PgWireConnection("127.0.0.1", pg_tls.server_address[1],
                             user="alice", password="s3cret", sslmode="require")
        _f, rows = c.query("SELECT 9 AS v")
        c.close()
        assert rows == [(9,)]

    def test_verify_full_with_ca(self, pg_tls):
        c = PgWireConnection("127.0.0.1", pg_tls.server_address[1],
                             user="alice", password="s3cret",
                             sslmode="verify-full", ssl_ca=pg_tls.ca_path)
        _f, rows = c.query("SELECT 10 AS v")
        c.close()
        assert rows == [(10,)]

    def test_verify_full_rejects_unknown_ca(self, pg_tls):
        import ssl

        with pytest.raises(ssl.SSLError):
            PgWireConnection("127.0.0.1", pg_tls.server_address[1],
                             user="alice", password="s3cret",
                             sslmode="verify-full")  # system CAs only

    def test_plain_server_refuses_tls(self, pg):
        with pytest.raises(SourceError, match="refused TLS"):
            PgWireConnection("127.0.0.1", pg.server_address[1],
                             user="alice", password="s3cret",
                             sslmode="require")


class TestWireClient:
    def test_md5_auth_and_query(self, pg):
        c = PgWireConnection("127.0.0.1", pg.server_address[1],
                             user="alice", password="s3cret", database="db")
        fields, rows = c.query("SELECT 1 AS one, 'x' AS s")
        c.close()
        assert [f.name for f in fields] == ["one", "s"]
        assert rows == [(1, "x")]

    def test_wrong_password_rejected(self, pg):
        with pytest.raises(SourceError, match="auth"):
            PgWireConnection("127.0.0.1", pg.server_address[1],
                             user="alice", password="wrong")

    def test_sql_error_surfaces(self, pg):
        c = PgWireConnection("127.0.0.1", pg.server_address[1],
                             user="alice", password="s3cret")
        with pytest.raises(SourceError, match="query failed"):
            c.query("SELECT * FROM no_such_table")
        # connection stays usable after an error (ReadyForQuery resync)
        _f, rows = c.query("SELECT 42 AS v")
        assert rows == [(42,)]
        c.close()


class TestSparkSource:
    @pytest.fixture(scope="class")
    def engine(self, spark, pg):
        return ss.connect(
            {
                "sources": [{
                    "name": "pw",
                    "type": "postgres_wire",
                    "url": f"postgresql://127.0.0.1:{pg.server_address[1]}/db",
                    "username": "alice",
                    "password": "s3cret",
                    "options": {"num_partitions": 3},
                    "tables": [
                        {"name": "customer", "partition_column": "c_custkey"},
                        {"name": "typed"},
                    ],
                }]
            },
            spark=spark,
        )

    def test_full_scan_matches_parquet(self, spark, engine):
        got = engine.execute("SELECT count(*) AS n, sum(c_custkey) AS s FROM pw_customer")
        exp = spark.read.parquet(f"{SF_DIR}/customer.parquet").selectExpr(
            "count(*) AS n", "sum(c_custkey) AS s"
        ).collect()[0]
        assert got.to_pylist() == [{"n": exp.n, "s": exp.s}]

    def test_partitioned_read_is_parallel_and_complete(self, spark, engine):
        df = spark.table("pw_customer")
        assert df.rdd.getNumPartitions() == 3  # one socket per partition
        assert df.count() == 150

    def test_typed_columns_roundtrip(self, spark, engine):
        rows = spark.table("pw_typed").orderBy("id").collect()
        import datetime

        assert rows[0].flag is True and rows[1].flag is False
        assert rows[0].x == 1.5 and rows[1].x == -0.25
        assert rows[0].d == datetime.date(2024, 3, 1)
        assert rows[0].ts == datetime.datetime(2024, 3, 1, 10, 30, 0, 123456)
        assert rows[1].note is None

    def test_partial_pushdown_over_the_wire(self, spark, pg):
        """A MIXED statement (remote pg table + local parquet) pushes the
        pg scan as a filtered projection — observed in the server log."""
        eng = ss.connect(
            {
                "sources": [
                    {"name": "pp", "type": "postgres_wire",
                     "url": f"postgresql://127.0.0.1:{pg.server_address[1]}/db",
                     "username": "alice", "password": "s3cret",
                     "tables": [{"name": "customer"}]},
                    {"name": "lk", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "nation"}]},
                ]
            },
            spark=spark,
        )
        before = len(pg.queries)
        out = eng.execute(
            "SELECT c.c_name, n.n_name FROM pp_customer c "
            "JOIN lk_nation n ON c.c_nationkey = n.n_nationkey "
            "WHERE c.c_acctbal > 9000"
        )
        pushed = [q for q in pg.queries[before:] if "c_acctbal" in q and "9000" in q]
        assert pushed, f"no pushed filtered scan in {pg.queries[before:]}"
        assert '"c_name"' in pushed[0]  # projection pruned
        assert out.num_rows > 0

    def test_federation_pushdown_over_the_wire(self, engine, pg):
        """A statement touching only pg tables pushes whole-statement:
        the aggregate must appear in the server's query log."""
        before = len(pg.queries)
        out = engine.execute(
            "SELECT count(*) AS n FROM pw_customer WHERE c_nationkey = 7"
        )
        pushed = [q for q in pg.queries[before:] if "count" in q.lower()]
        assert pushed, f"no pushed aggregate in {pg.queries[before:]}"
        assert out.to_pylist()[0]["n"] > 0


class TestDecimalFidelity:
    """NUMERIC must round-trip exactly as DecimalType(p, s) — the
    reference decodes Postgres numeric into Arrow Decimal128
    (crates/connectors/src/sources/sql/postgres_federation.rs:7-10);
    collapsing a 38-digit balance to float64 is silent wrongness."""

    def test_wire_client_decodes_decimal_exact(self, pg):
        import decimal

        c = PgWireConnection("127.0.0.1", pg.server_address[1],
                             user="alice", password="s3cret")
        fields, rows = c.query("SELECT id, bal FROM money ORDER BY id")
        c.close()
        assert fields[1].typmod == ((38 << 16) | 10) + 4
        assert rows[0][1] == decimal.Decimal(
            "1234567890123456789012345678.0123456789"
        )
        assert isinstance(rows[0][1], decimal.Decimal)
        assert rows[1][1] == decimal.Decimal("-0.0000000001")
        assert rows[2][1] is None

    def test_spark_schema_and_values_exact(self, spark, pg):
        import decimal

        eng = ss.connect(
            {"sources": [{
                "name": "dec", "type": "postgres_wire",
                "url": f"postgresql://127.0.0.1:{pg.server_address[1]}/db",
                "username": "alice", "password": "s3cret",
                "tables": [{"name": "money"}],
            }]},
            spark=spark,
        )
        df = spark.table("dec_money")
        assert df.schema["bal"].dataType.simpleString() == "decimal(38,10)"
        rows = {r.id: r.bal for r in df.collect()}
        assert rows[1] == decimal.Decimal(
            "1234567890123456789012345678.0123456789"
        )
        assert rows[2] == decimal.Decimal("-0.0000000001")
        assert rows[3] is None
        out = eng.execute(
            "SELECT sum(bal) AS total FROM dec_money"
        ).to_pylist()
        assert out[0]["total"] == decimal.Decimal(
            "1234567890123456789012345678.0123456788"
        )

    def test_unconstrained_numeric_falls_back_to_double(self):
        from pyspark.sql import types as T

        from strake_spark.sources.pgwire import _numeric_spark_type

        assert _numeric_spark_type(-1) == T.DoubleType()
        # precision beyond Spark's 38-digit ceiling also falls back
        assert _numeric_spark_type(((40 << 16) | 2) + 4) == T.DoubleType()
        assert _numeric_spark_type(((38 << 16) | 10) + 4) == T.DecimalType(38, 10)


class TestMalformedServer:
    """A hostile/broken server must produce a clean SourceError, never a
    hang or an unbounded read."""

    @staticmethod
    def _serve_bytes(payload: bytes):
        import socketserver

        class H(socketserver.BaseRequestHandler):
            def handle(self):
                try:
                    self.request.recv(65536)  # swallow startup
                    self.request.sendall(payload)
                finally:
                    self.request.close()

        srv = socketserver.TCPServer(("127.0.0.1", 0), H)
        srv.allow_reuse_address = True
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv

    @pytest.mark.parametrize("payload", [
        b"",                                   # immediate close
        b"garbage-not-a-message",              # non-protocol bytes
        b"R" + (5000).to_bytes(4, "big"),      # truncated huge message
        b"R" + (8).to_bytes(4, "big") + (99).to_bytes(4, "big"),  # unknown auth
    ])
    def test_malformed_fails_cleanly(self, payload):
        srv = self._serve_bytes(payload)
        try:
            with pytest.raises(SourceError):
                PgWireConnection("127.0.0.1", srv.server_address[1],
                                 user="u", password="p", timeout=3.0)
        finally:
            srv.shutdown()


class TestMessageParserFuzz:
    """v3 message-parser robustness (r18): RowDescription/DataRow bytes
    come from an untrusted server — truncations and hostile lengths
    must raise SourceError, never raw struct.error or silently
    shortened cells."""

    def test_arbitrary_payloads_parse_or_raise_source_error(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.errors import SourceError
        from strake_spark.sources.pgwire import PgWireConnection

        @settings(max_examples=200, deadline=None)
        @given(payload=st.binary(max_size=48))
        def run(payload):
            for fn in (
                PgWireConnection._parse_row_description,
                PgWireConnection._parse_raw_row,
            ):
                try:
                    fn(payload)
                except SourceError:
                    pass

        run()

    def test_truncated_and_hostile_lengths_are_loud(self):
        import pytest

        from strake_spark.errors import SourceError
        from strake_spark.sources.pgwire import PgWireConnection

        with pytest.raises(SourceError, match="truncated"):
            PgWireConnection._parse_raw_row(b"\x00")
        # one cell declaring 100 bytes with 2 present
        with pytest.raises(SourceError, match="out of range"):
            PgWireConnection._parse_raw_row(b"\x00\x01\x00\x00\x00\x64ab")
        # negative length other than the -1 NULL marker
        with pytest.raises(SourceError, match="out of range"):
            PgWireConnection._parse_raw_row(b"\x00\x01\xff\xff\xff\xfe")
        # RowDescription whose name never terminates
        with pytest.raises(SourceError, match="truncated field"):
            PgWireConnection._parse_row_description(b"\x00\x01abc")
