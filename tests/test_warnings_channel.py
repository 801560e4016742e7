"""Per-query warnings channel (r16, VERDICT task 6 — reference
warnings.rs:19-40 + federation.rs:385-413): cache hits surface as the
exact reference string ``x-strake-cache: hit`` and queries over drifted
views carry the views' STRAKE-2009..2011-coded drift lines, on every
result path a client can reach — engine.last_warnings(), trace(),
REST QueryResponse ``warnings``, Flight schema metadata + remote
client last_warnings()."""

from __future__ import annotations

import json
import urllib.request

import pytest

import strake_spark as ss
from strake_spark.rest_api import make_rest_server
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    from strake_spark.sources.drift import clear_drift_log

    clear_drift_log()
    tmp = tmp_path_factory.mktemp("warn")
    spark.createDataFrame([(1, "x"), (2, "y")], "id int, extra string").write.parquet(
        str(tmp / "drifty.parquet")
    )
    eng = ss.connect(
        {
            # fresh directory: the result cache is disk-backed, and a
            # shared default dir would make the "first query is cold"
            # assumptions below false across test runs
            "cache": {"enabled": True, "directory": str(tmp / "cache")},
            "sources": [
                {
                    "name": "w",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [{"name": "region"}],
                },
                {
                    "name": "dr",
                    "type": "parquet",
                    "url": str(tmp),
                    "tables": [
                        {
                            "name": "drifty",
                            "columns": [
                                {"name": "id", "type": "integer"},
                                {"name": "missing_col", "type": "string"},
                            ],
                        }
                    ],
                },
            ],
        },
        spark=spark,
    )
    yield eng
    clear_drift_log()


class TestEmbedded:
    def test_cache_hit_warning(self, engine):
        sql = "SELECT r_name FROM w_region ORDER BY r_name"
        engine.execute(sql)
        first = engine.last_warnings()
        assert "x-strake-cache: hit" not in first
        engine.execute(sql)
        assert "x-strake-cache: hit" in engine.last_warnings()

    def test_drifted_view_carries_coded_lines(self, engine):
        engine.execute("SELECT id, missing_col FROM dr_drifty")
        warns = engine.last_warnings()
        assert any("STRAKE-2009" in w and "missing_col" in w for w in warns)
        assert any("STRAKE-2011" in w for w in warns)  # pruned 'extra'
        assert all(w.startswith("dr_drifty: ") for w in warns if "STRAKE-20" in w)

    def test_undrifted_query_has_no_drift_lines(self, engine):
        engine.execute("SELECT count(*) AS n FROM w_region")
        assert not any("STRAKE-200" in w for w in engine.last_warnings())

    def test_trace_carries_drift_warnings(self, engine):
        t = engine.trace("SELECT id FROM dr_drifty")
        assert any("STRAKE-2009" in w for w in t["warnings"])
        assert engine.trace("SELECT r_name FROM w_region")["warnings"] == []


class TestRestFacade:
    @pytest.fixture(scope="class")
    def server(self, engine):
        srv = make_rest_server(engine).start()
        yield srv
        srv.stop()

    def _query(self, port, sql):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/query",
            data=json.dumps({"sql": sql}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            return json.loads(resp.read())

    def test_cached_requery_carries_cache_hit_warning(self, server):
        sql = "SELECT r_regionkey FROM w_region ORDER BY r_regionkey"
        first = self._query(server.port, sql)
        assert "x-strake-cache: hit" not in first.get("warnings", [])
        second = self._query(server.port, sql)
        assert "x-strake-cache: hit" in second["warnings"]
        assert second["data"] == first["data"]

    def test_drifted_view_warnings_over_rest(self, server):
        body = self._query(server.port, "SELECT missing_col FROM dr_drifty")
        assert any("STRAKE-2009" in w for w in body["warnings"])


class TestFlightFacade:
    def test_remote_client_sees_cache_hit_and_drift(self, engine):
        import threading

        from strake_spark.server import make_server

        srv = make_server(engine)
        threading.Thread(target=srv.serve, daemon=True).start()
        try:
            con = ss.connect(f"grpc://127.0.0.1:{srv.port}")
            sql = "SELECT r_name FROM w_region ORDER BY r_name LIMIT 3"
            con.execute(sql)
            first = con.last_warnings()
            con.execute(sql)
            assert "x-strake-cache: hit" in con.last_warnings()
            assert "x-strake-cache: hit" not in first
            con.execute("SELECT id, missing_col FROM dr_drifty")
            assert any("STRAKE-2009" in w for w in con.last_warnings())
            con.close()
        finally:
            srv.shutdown()
