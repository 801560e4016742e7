"""Remote client backend: connect("grpc://...") returns a thin Flight
client whose surface and GOVERNANCE behavior match the embedded engine
exactly (reference python/src/connection.rs:303-330 URL dispatch +
backend/remote.rs:27-66 execution flow)."""

from __future__ import annotations

import threading

import pyarrow.flight as fl
import pytest

import strake_spark as ss
from strake_spark.errors import QueryRejected
from strake_spark.remote import RemoteEngine
from strake_spark.server import make_server
from tests.conftest import SF_DIR


def _engine(spark):
    return ss.connect(
        {
            "sources": [
                {"name": "rc", "type": "parquet", "url": SF_DIR,
                 "tables": [{"name": "nation"}, {"name": "orders"}]}
            ],
            "policies": {
                "roles": {"r0": {"tables": {"rc_nation": {
                    "rls_filter": "n_regionkey = 0"}}}},
                "users": {"pat": ["r0"]},
            },
        },
        spark=spark,
    )


@pytest.fixture(scope="module")
def served(spark):
    eng = _engine(spark)
    srv = make_server(eng)
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    remote = ss.connect(f"grpc://127.0.0.1:{srv.port}")
    yield eng, remote
    remote.close()
    srv.shutdown()


class TestDispatchAndQueries:
    def test_connect_url_returns_thin_client(self, served):
        _eng, remote = served
        assert isinstance(remote, RemoteEngine)
        assert remote.ping()["ok"] is True

    def test_sql_roundtrip_matches_embedded(self, served):
        eng, remote = served
        q = ("SELECT n_regionkey, count(*) AS n FROM rc_nation "
             "GROUP BY n_regionkey ORDER BY n_regionkey")
        assert remote.sql(q).to_pylist() == eng.execute(q).to_pylist()

    def test_params_bind_remotely(self, served):
        eng, remote = served
        q = "SELECT count(*) AS n FROM rc_nation WHERE n_regionkey = :rk"
        p = {"rk": 2}
        assert remote.execute(q, params=p).to_pylist() == eng.execute(q, params=p).to_pylist()

    def test_execute_batches_streams_same_rows(self, served):
        import pyarrow as pa

        eng, remote = served
        q = "SELECT o_orderkey, o_totalprice FROM rc_orders ORDER BY o_orderkey"
        batches = list(remote.execute_batches(q))
        assert batches and all(isinstance(b, pa.RecordBatch) for b in batches)
        streamed = pa.Table.from_batches(batches)
        assert streamed.to_pylist() == eng.execute(q).to_pylist()

    def test_schema_plan_only(self, served):
        _eng, remote = served
        sch = remote.schema("SELECT n_name, n_regionkey FROM rc_nation")
        assert [f.name for f in sch] == ["n_name", "n_regionkey"]


class TestCatalogIntrospection:
    def test_list_sources_matches_embedded(self, served):
        eng, remote = served
        assert remote.list_sources() == eng.list_sources()

    def test_describe_matches_embedded(self, served):
        eng, remote = served
        assert remote.describe("rc_nation") == eng.describe("rc_nation")

    def test_explain_tree_matches_embedded_markers(self, served):
        eng, remote = served
        q = "SELECT n_name FROM rc_nation WHERE n_regionkey = 1"
        tree = remote.explain_tree(q)
        assert tree == eng.explain_tree(q)
        assert "PUSHED" in tree or "Scan" in tree

    def test_list_tables_ticket_surface(self, served):
        _eng, remote = served
        rows = remote.list_tables().to_pylist()
        assert {"source": "rc", "table": "rc_nation"} in rows


class TestGovernanceParity:
    def test_write_statement_rejected_like_embedded(self, served):
        eng, remote = served
        with pytest.raises(QueryRejected):
            eng.execute("DROP TABLE rc_nation")
        with pytest.raises(QueryRejected):
            remote.execute("DROP TABLE rc_nation")

    def test_multi_statement_rejected(self, served):
        _eng, remote = served
        with pytest.raises(QueryRejected):
            remote.execute("SELECT 1; SELECT 2")

    def test_rls_policy_enforced_per_user(self, served):
        eng, remote = served
        q = "SELECT count(*) AS n FROM rc_nation"
        for user in (None, "pat"):
            r = remote.execute(q, user=user).to_pylist()
            e = eng.execute(q, user=user).to_pylist()
            assert r == e
        # and the policy actually bites: pat sees the filtered count
        assert remote.execute(q, user="pat").to_pylist() == [{"n": 5}]
        assert remote.execute(q).to_pylist() == [{"n": 25}]

    def test_unknown_action_is_loud(self, served):
        _eng, remote = served
        with pytest.raises(fl.FlightError, match="unknown action"):
            remote._action("not_a_verb")


class TestAuth:
    @pytest.fixture(scope="class")
    def token_served(self, spark):
        eng = _engine(spark)
        srv = make_server(eng, token="sekrit")
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        yield srv
        srv.shutdown()

    def test_bearer_token_required(self, token_served):
        url = f"grpc://127.0.0.1:{token_served.port}"
        good = ss.connect(url, api_key="sekrit")
        try:
            assert good.execute("SELECT 1 AS one").to_pylist() == [{"one": 1}]
            assert good.list_sources()  # actions are authed too
        finally:
            good.close()
        bad = RemoteEngine(url, api_key="wrong", connect_timeout=None)
        try:
            with pytest.raises(fl.FlightUnauthenticatedError):
                bad.execute("SELECT 1 AS one")
            with pytest.raises(fl.FlightUnauthenticatedError):
                bad.list_sources()
        finally:
            bad.close()

    def test_oidc_sub_overrides_client_user(self, spark):
        """With OIDC auth the validated token subject is the governance
        principal — a client-supplied user must NOT escalate out of it
        (same rule as the server do_get path and rest_api._query)."""
        class _Val:
            def validate(self, tok):
                from strake_spark.jwtauth import AuthError

                if tok != "Bearer good":
                    raise AuthError("bad token")
                return {"sub": "pat"}

        eng = _engine(spark)
        srv = make_server(eng, validator=_Val())
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        try:
            remote = RemoteEngine(
                f"grpc://127.0.0.1:{srv.port}", api_key="good", connect_timeout=None
            )
            q = "SELECT count(*) AS n FROM rc_nation"
            # claims no user / claims someone else: sub=pat wins both times
            assert remote.execute(q).to_pylist() == [{"n": 5}]
            assert remote.execute(q, user="admin").to_pylist() == [{"n": 5}]
            remote.close()
        finally:
            srv.shutdown()


class TestTrace:
    def test_trace_proxied(self, served):
        eng, remote = served
        q = "SELECT n_name FROM rc_nation WHERE n_regionkey = 1"
        t = remote.trace(q)
        assert t["query"] == q
        assert t["estimated_rows"] == eng.trace(q)["estimated_rows"]
        assert "physical" in t and "optimized" in t


class TestBudgetTranslation:
    def test_budget_exceeded_crosses_the_wire_typed(self, spark, tmp_path):
        """Server-side governed failures must re-raise client-side as
        the same exception types the embedded engine uses."""
        from strake_spark.errors import BudgetExceeded

        eng = ss.connect(
            {
                "sources": [{"name": "bt", "type": "parquet", "url": SF_DIR,
                             "tables": [{"name": "lineitem"}]}],
                "query_limits": {"max_estimated_bytes": 1},
            },
            spark=spark,
        )
        srv = make_server(eng)
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        try:
            remote = ss.connect(f"grpc://127.0.0.1:{srv.port}")
            with pytest.raises(BudgetExceeded):
                remote.execute("SELECT count(*) AS n FROM bt_lineitem")
            remote.close()
        finally:
            srv.shutdown()


class TestTls:
    def test_grpcs_roundtrip_with_pinned_ca(self, spark, tmp_path):
        """TLS-served Flight + grpcs:// client DSN (the reference's
        encrypted scheme, connection.rs:312): round-trip with the
        server cert pinned as the root; plaintext grpc:// to the same
        port must fail."""
        from tests.conftest import make_self_signed_cert

        cert, key = make_self_signed_cert(tmp_path)
        eng = _engine(spark)
        srv = make_server(eng, tls_cert=cert, tls_key=key)
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        try:
            remote = ss.connect(
                f"grpcs://127.0.0.1:{srv.port}", tls_root_certs=cert
            )
            out = remote.execute("SELECT count(*) AS n FROM rc_nation").to_pylist()
            assert out == [{"n": 25}]
            assert remote.ping()["ok"] is True
            remote.close()
            plain = RemoteEngine(
                f"grpc://127.0.0.1:{srv.port}", connect_timeout=None
            )
            with pytest.raises(fl.FlightError):
                plain.execute("SELECT 1 AS one")
            plain.close()
        finally:
            srv.shutdown()


class TestDescribeAll:
    def test_describe_without_argument_lists_every_view(self, served):
        eng, remote = served
        allv = remote.describe()
        assert allv == eng.describe()
        assert "rc_nation" in allv and "rc_orders" in allv
        assert allv["rc_nation"] == eng.describe("rc_nation")


class TestDriftProxied:
    def test_drift_report_crosses_the_wire(self, served):
        """r15 (r14 verdict task 6): engine.drift_report() is reachable
        over Flight (drift_report action) with the structured
        STRAKE-2009..2011-coded records intact."""
        from pyspark.sql import types as T

        from strake_spark.sources.drift import clear_drift_log, reconcile

        eng, remote = served
        clear_drift_log()
        assert remote.drift_report() == []
        src = eng.spark.createDataFrame([(1,)], "id int")
        declared = T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("gone", T.StringType()),
        ])
        reconcile(src, declared, context="flight_drift_probe")
        recs = remote.drift_report()
        assert recs == eng.drift_report()
        assert recs[-1]["table"] == "flight_drift_probe"
        assert recs[-1]["codes"] == ["STRAKE-2009"]
        assert recs[-1]["missing_columns"] == ["gone"]
