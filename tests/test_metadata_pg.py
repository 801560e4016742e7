"""Postgres metadata-store backend (reference crates/cli/src/metadata/
postgres.rs): the SAME MetadataStore domain logic over the jar-free
wire client. Integration runs against an in-process wire-protocol
server executing the adapter's emitted SQL — the bytes on the socket
are the real simple-query protocol, so the client, the dialect
rewrites, and the CommandComplete rowcount path are all exercised."""

from __future__ import annotations

import socketserver
import sqlite3
import struct
import threading

import pytest

from strake_spark.errors import StrakeError
from strake_spark.metadata import DestructiveChange, VersionConflict
from strake_spark.metadata_pg import PgWireDb, connect_metadata, rewrite_sql


class TestRewrite:
    def test_begin_immediate(self):
        assert rewrite_sql("BEGIN IMMEDIATE") == "BEGIN"

    def test_insert_or_ignore(self):
        out = rewrite_sql(
            "INSERT OR IGNORE INTO domains (name, version) VALUES (?, 1)",
            ("d",),
        )
        assert out == (
            "INSERT INTO domains (name, version) VALUES ('d', 1) "
            "ON CONFLICT DO NOTHING"
        )

    def test_placeholder_escaping(self):
        out = rewrite_sql("SELECT x FROM t WHERE a = ? AND b = ?", ("o'brien", None))
        assert out == "SELECT x FROM t WHERE a = 'o''brien' AND b = NULL"

    def test_placeholder_count_mismatch(self):
        with pytest.raises(StrakeError, match="placeholder mismatch"):
            rewrite_sql("SELECT ?", ())

    def test_inline_literals_rejected(self):
        with pytest.raises(StrakeError, match="placeholders"):
            rewrite_sql("SELECT 'sneaky'")

    def test_nul_rejected(self):
        with pytest.raises(StrakeError, match="NUL"):
            rewrite_sql("SELECT ?", ("a\x00b",))


# --------------------------------------------------------------- mock server
class _Handler(socketserver.BaseRequestHandler):
    def setup(self):
        self._buf = b""

    def _recv_exact(self, n):
        while len(self._buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _send(self, mtype, payload):
        self.request.sendall(mtype + struct.pack(">i", len(payload) + 4) + payload)

    def _ready(self):
        self._send(b"Z", b"I")

    def handle(self):
        (length,) = struct.unpack(">i", self._recv_exact(4))
        self._recv_exact(length - 4)  # startup params, trust auth
        self._send(b"R", struct.pack(">i", 0))
        self._send(b"S", b"server_version\0fakepg-writable\0")
        self._ready()
        con = sqlite3.connect(self.server.db_path)
        con.isolation_level = None  # explicit BEGIN/COMMIT from the wire
        con.execute("PRAGMA foreign_keys = ON")
        try:
            while True:
                mtype = self._recv_exact(1)
                (ln,) = struct.unpack(">i", self._recv_exact(4))
                body = self._recv_exact(ln - 4)
                if mtype == b"X":
                    return
                sql = body.rstrip(b"\0").decode()
                # server-side DDL shim: this mock persists in sqlite
                sql_exec = sql.replace("BIGSERIAL PRIMARY KEY",
                                       "INTEGER PRIMARY KEY AUTOINCREMENT")
                try:
                    cur = con.execute(sql_exec)
                    rows = cur.fetchall() if cur.description else []
                    ncols = len(cur.description) if cur.description else 0
                    names = ([d[0] for d in cur.description]
                             if cur.description else [])
                    rowcount = cur.rowcount
                except sqlite3.Error as e:
                    msg = f"SERROR\0M{e}\0\0".encode()
                    self._send(b"E", msg)
                    self._ready()
                    continue
                if ncols:
                    # per-column OID from the first non-null value
                    oids = []
                    for i in range(ncols):
                        v = next((r[i] for r in rows if r[i] is not None), None)
                        oids.append(20 if isinstance(v, int) else 25)
                    fields = b"".join(
                        n.encode() + b"\0"
                        + struct.pack(">ihihih", 0, 0, oid, -1, -1, 0)
                        for n, oid in zip(names, oids)
                    )
                    self._send(b"T", struct.pack(">h", ncols) + fields)
                    for r in rows:
                        parts = [struct.pack(">h", ncols)]
                        for v in r:
                            if v is None:
                                parts.append(struct.pack(">i", -1))
                            else:
                                enc = str(v).encode()
                                parts.append(struct.pack(">i", len(enc)) + enc)
                        self._send(b"D", b"".join(parts))
                    tag = f"SELECT {len(rows)}"
                else:
                    verb = sql_exec.strip().split()[0].upper()
                    n = max(rowcount, 0)
                    tag = {"INSERT": f"INSERT 0 {n}", "UPDATE": f"UPDATE {n}",
                           "DELETE": f"DELETE {n}"}.get(verb, verb)
                self._send(b"C", tag.encode() + b"\0")
                self._ready()
        finally:
            con.close()


class FakePgWritable(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, db_path):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.db_path = db_path


@pytest.fixture()
def pg_store(tmp_path):
    srv = FakePgWritable(str(tmp_path / "pgmeta.sqlite"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"postgres://meta:pw@127.0.0.1:{srv.server_address[1]}/meta"
    store = connect_metadata(url)
    yield store
    store.close()
    srv.shutdown()


def _yaml(tables):
    return (
        "sources:\n  - name: s1\n    type: parquet\n    url: /data\n"
        "    tables:\n"
        + "".join(f"      - {{name: {t}}}\n" for t in tables)
    )


def _cfg(tables):
    import yaml

    from strake_spark.config import parse_config

    return parse_config(yaml.safe_load(_yaml(tables)))


class TestPgBackendLifecycle:
    def test_url_dispatch(self, pg_store):
        assert isinstance(pg_store.con, PgWireDb)

    def test_apply_diff_history_rollback(self, pg_store):
        store = pg_store
        out = store.apply("default", _cfg(["a"]), config_yaml=_yaml(["a"]))
        assert out["version"] == 2  # fresh domain starts at 1
        assert store.diff("default", _cfg(["a"])).empty

        out = store.apply("default", _cfg(["a", "b"]), config_yaml=_yaml(["a", "b"]))
        assert out["version"] == 3
        stored = store.get_sources("default")
        assert sorted(stored["s1"]["tables"]) == ["a", "b"]

        hist = store.history("default")
        assert [h["version"] for h in hist] == [3, 2]

        # destructive refusal + force, exactly like the sqlite backend
        with pytest.raises(DestructiveChange):
            store.apply("default", _cfg(["a"]))
        out = store.apply("default", _cfg(["a"]), config_yaml=_yaml(["a"]), force=True)
        assert out["version"] == 4

        # rollback re-applies the recorded config as a NEW version
        out = store.rollback("default", to_version=3)
        assert out["version"] == 5
        assert sorted(store.get_sources("default")["s1"]["tables"]) == ["a", "b"]

    def test_optimistic_lock_conflict(self, pg_store):
        store = pg_store
        store.apply("d2", _cfg(["a"]), config_yaml="x: 1")
        with pytest.raises(VersionConflict):
            store.apply("d2", _cfg(["a", "b"]), expected_version=99)
        # the guarded UPDATE path: stale writer loses with rowcount 0
        assert store.get_domain_version("d2") == 2

    def test_noop_apply_no_history_row(self, pg_store):
        store = pg_store
        store.apply("d3", _cfg(["a"]), config_yaml="x: 1")
        out = store.apply("d3", _cfg(["a"]), config_yaml="x: 1")
        assert out["version"] == 2  # unchanged
        assert len(store.history("d3")) == 1


class TestEscapingProperty:
    def test_literal_roundtrip_property(self):
        """Property (hypothesis): for any NUL-free string, the inlined
        literal evaluates back to the original value — the whole
        correctness claim of client-side parameter inlining."""
        import sqlite3

        from hypothesis import given, settings
        from hypothesis import strategies as st

        con = sqlite3.connect(":memory:")

        @settings(max_examples=300, deadline=None)
        @given(st.text(min_size=0, max_size=80).filter(lambda s: "\x00" not in s))
        def prop(s):
            sql = rewrite_sql("SELECT ?", (s,))
            # single statement, single value, no injection possible:
            # sqlite must parse it as exactly one string literal
            (got,) = con.execute(sql).fetchone()
            assert got == s

        prop()

    def test_numeric_and_null_roundtrip(self):
        import sqlite3

        con = sqlite3.connect(":memory:")
        for v in (0, -17, 2**62, 3.5, -0.25, None, True, False):
            sql = rewrite_sql("SELECT ?", (v,))
            (got,) = con.execute(sql).fetchone()
            expect = int(v) if isinstance(v, bool) else v
            if isinstance(v, bool):
                # TRUE/FALSE literals: sqlite evaluates to 1/0
                assert got == (1 if v else 0)
            else:
                assert got == expect
