"""Enterprise API-key lifecycle (docs/enterprise.md:19-21): issue /
verify / scope / expiry / revoke / rotate, CLI verbs, and enforcement
parity on the Flight and REST servers — including the verdict's
acceptance bar: an old key is rejected after rotation, and scope
enforcement matches embedded behavior through the remote client."""

from __future__ import annotations

import time

import pytest

from strake_spark.apikeys import ApiKeyError, ApiKeyStore


@pytest.fixture()
def store(tmp_path):
    return ApiKeyStore(str(tmp_path / "keys.db"))


class TestLifecycle:
    def test_issue_and_verify(self, store):
        secret, info = store.issue("ci-bot", user="alice", scopes=["execute", "ping"])
        assert secret.startswith("sk_") and "." in secret
        ki = store.verify(secret)
        assert ki.user == "alice" and ki.name == "ci-bot"
        assert ki.allows("execute") and not ki.allows("describe")

    def test_secret_not_stored(self, store):
        secret, info = store.issue("svc")
        import sqlite3

        con = sqlite3.connect(store.path)
        rows = con.execute("SELECT secret_hash FROM api_keys").fetchall()
        con.close()
        plain = secret.split(".", 1)[1]
        assert all(plain not in r[0] for r in rows)

    def test_wrong_secret_rejected(self, store):
        secret, info = store.issue("svc")
        bad = secret[:-4] + "beef"
        with pytest.raises(ApiKeyError, match="invalid API key secret"):
            store.verify(bad)

    def test_unknown_and_malformed(self, store):
        with pytest.raises(ApiKeyError, match="malformed"):
            store.verify("not-a-key")
        with pytest.raises(ApiKeyError, match="unknown"):
            store.verify("sk_00000000.deadbeef")

    def test_scope_enforcement(self, store):
        secret, _ = store.issue("ro", scopes="describe list_sources")
        store.verify(secret, verb="describe")
        with pytest.raises(ApiKeyError, match="lacks scope 'execute'"):
            store.verify(secret, verb="execute")

    def test_execute_implies_sql_but_not_vice_versa(self, store):
        # remote queries plan ('sql') then fetch ('execute'); an
        # execute-only key must be able to do both, while a sql-only
        # key stays plan/validate-only
        exec_secret, _ = store.issue("runner", scopes=["execute"])
        store.verify(exec_secret, verb="sql")
        store.verify(exec_secret, verb="execute")
        sql_secret, _ = store.issue("planner", scopes=["sql"])
        store.verify(sql_secret, verb="sql")
        with pytest.raises(ApiKeyError, match="lacks scope 'execute'"):
            store.verify(sql_secret, verb="execute")

    def test_unknown_scope_rejected_at_issue(self, store):
        with pytest.raises(ValueError, match="unknown scope"):
            store.issue("x", scopes=["drop_tables"])

    def test_expiry(self, store):
        secret, _ = store.issue("shortlived", ttl_seconds=0.2)
        store.verify(secret)
        time.sleep(0.25)
        with pytest.raises(ApiKeyError, match="expired"):
            store.verify(secret)

    def test_revoke(self, store):
        secret, info = store.issue("svc")
        store.revoke(info.key_id)
        with pytest.raises(ApiKeyError, match="revoked"):
            store.verify(secret)

    def test_rotate_old_key_rejected_new_key_inherits(self, store):
        old_secret, old = store.issue("svc", user="bob", scopes=["execute"])
        new_secret, new = store.rotate(old.key_id)
        with pytest.raises(ApiKeyError, match="revoked.*rotated to"):
            store.verify(old_secret)
        ki = store.verify(new_secret, verb="execute")
        assert ki.user == "bob" and ki.name == "svc"
        assert store.get(old.key_id).rotated_to == new.key_id

    def test_rotate_grace_window(self, store):
        old_secret, old = store.issue("svc")
        store.rotate(old.key_id, grace_seconds=0.3)
        store.verify(old_secret)  # still valid inside the grace window
        time.sleep(0.35)
        with pytest.raises(ApiKeyError, match="revoked"):
            store.verify(old_secret)

    def test_rotate_revoked_key_refused(self, store):
        _, info = store.issue("svc")
        store.revoke(info.key_id)
        with pytest.raises(ApiKeyError, match="already revoked"):
            store.rotate(info.key_id)


class TestCli:
    def test_issue_list_rotate_revoke_roundtrip(self, tmp_path, capsys):
        from strake_spark.cli import main

        db = str(tmp_path / "keys.db")
        assert main(["keys", "issue", "ci", "--user", "alice",
                     "--scopes", "execute", "--store", db]) == 0
        out = capsys.readouterr().out
        key_id = out.split("key_id: ")[1].split()[0]
        secret = out.split("secret: ")[1].split()[0]
        store = ApiKeyStore(db)
        assert store.verify(secret, verb="execute").user == "alice"

        assert main(["keys", "rotate", key_id, "--store", db]) == 0
        out = capsys.readouterr().out
        new_secret = out.split("secret: ")[1].split()[0]
        with pytest.raises(ApiKeyError):
            store.verify(secret)
        store.verify(new_secret, verb="execute")

        assert main(["keys", "list", "--store", db]) == 0
        out = capsys.readouterr().out
        assert "revoked" in out and "active" in out

        new_id = store.verify(new_secret).key_id
        assert main(["keys", "revoke", new_id, "--store", db]) == 0
        with pytest.raises(ApiKeyError):
            store.verify(new_secret)


@pytest.fixture(scope="module")
def key_engine(spark):
    import strake_spark as ss
    from tests.conftest import SF_DIR

    return ss.connect(
        {"sources": [{"name": "t", "type": "parquet", "url": SF_DIR,
                      "tables": [{"name": "nation"}]}]},
        spark=spark,
    )


class TestFlightEnforcement:
    def test_scoped_key_parity_and_rotation_over_flight(self, key_engine, tmp_path):
        from strake_spark.apikeys import ApiKeyStore
        from strake_spark.remote import RemoteEngine
        from strake_spark.server import make_server

        store = ApiKeyStore(str(tmp_path / "keys.db"))
        # execute ALONE must run queries end-to-end: remote execution
        # always plans first (get_flight_info -> 'sql'), and 'execute'
        # implies 'sql' precisely so this key shape isn't a dead key
        exec_secret, exec_info = store.issue("svc", scopes=["execute"])
        ping_secret, _ = store.issue("health", scopes=["ping"])

        server = make_server(key_engine, key_manager=store)
        import threading

        t = threading.Thread(target=server.serve, daemon=True)
        t.start()
        try:
            url = f"grpc://127.0.0.1:{server.port}"
            eng = RemoteEngine(url, api_key=exec_secret)
            out = eng.execute("SELECT count(*) AS n FROM t_nation").to_pandas()
            assert int(out["n"][0]) == 25

            # scope enforcement: execute-scoped key may not describe
            with pytest.raises(Exception, match="lacks scope|[Uu]nauthor"):
                eng.describe("t_nation")

            # ping-scoped key cannot execute
            eng_ping = RemoteEngine(url, api_key=ping_secret)
            assert eng_ping.ping()["ok"] is True
            with pytest.raises(Exception, match="lacks scope|[Uu]nauthor"):
                eng_ping.execute("SELECT 1 AS x")

            # no key at all -> unauthenticated
            with pytest.raises(Exception, match="API key required|unauthenticated|UNAUTHENTICATED"):
                RemoteEngine(url).execute("SELECT 1 AS x")

            # rotation: the old secret dies at the server boundary
            new_secret, _ = store.rotate(exec_info.key_id)
            with pytest.raises(Exception, match="revoked|unauthenticated|UNAUTHENTICATED"):
                RemoteEngine(url, api_key=exec_secret).execute("SELECT 1 AS x")
            out2 = RemoteEngine(url, api_key=new_secret).execute(
                "SELECT count(*) AS n FROM t_nation"
            ).to_pandas()
            assert int(out2["n"][0]) == 25
        finally:
            server.shutdown()


class TestRestEnforcement:
    def test_rest_scope_and_rotation(self, key_engine, tmp_path):
        import json
        import urllib.request

        from strake_spark.apikeys import ApiKeyStore
        from strake_spark.rest_api import make_rest_server

        store = ApiKeyStore(str(tmp_path / "keys.db"))
        secret, info = store.issue("svc", scopes=["execute"])
        srv = make_rest_server(key_engine, key_manager=store).start()
        try:
            base = f"http://127.0.0.1:{srv.port}"

            def call(path, key=None, body=None):
                data = json.dumps(body).encode() if body is not None else None
                req = urllib.request.Request(base + path, data=data, method="POST" if data else "GET")
                if key:
                    req.add_header("Authorization", f"Bearer {key}")
                if data:
                    req.add_header("Content-Type", "application/json")
                try:
                    with urllib.request.urlopen(req) as r:
                        return r.status, json.loads(r.read())
                except urllib.error.HTTPError as e:
                    return e.code, json.loads(e.read())

            code, out = call("/api/v1/query", key=secret,
                             body={"sql": "SELECT count(*) AS n FROM t_nation"})
            assert code == 200, out

            # describe-scope missing -> 403 on the sources route
            code, out = call("/api/v1/sources", key=secret)
            assert code == 403 and "lacks scope" in out["message"]

            # no key -> 401
            code, out = call("/api/v1/query", body={"sql": "SELECT 1 AS x"})
            assert code == 401

            # rotation kills the old secret on the wire
            new_secret, _ = store.rotate(info.key_id)
            code, out = call("/api/v1/query", key=secret,
                             body={"sql": "SELECT 1 AS x"})
            assert code == 401 and "revoked" in out["message"]
            code, out = call("/api/v1/query", key=new_secret,
                             body={"sql": "SELECT count(*) AS n FROM t_nation"})
            assert code == 200
        finally:
            srv.stop()


class TestRotateConcurrency:
    def test_concurrent_rotations_have_one_winner(self, store):
        import threading

        _, info = store.issue("svc")
        results: list[tuple[bool, str | None]] = []
        lock = threading.Lock()
        barrier = threading.Barrier(4)

        def rot():
            barrier.wait()
            try:
                secret, _ = store.rotate(info.key_id)
                with lock:
                    results.append((True, secret))
            except ApiKeyError:
                with lock:
                    results.append((False, None))

        ts = [threading.Thread(target=rot) for _ in range(4)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        winners = [s for ok, s in results if ok]
        assert len(winners) == 1  # exactly one rotation linearizes
        store.verify(winners[0])  # and its key works
        # every loser's orphan successor is revoked
        live = [k for k in store.list_keys() if k.revoked_at is None]
        assert len(live) == 1
