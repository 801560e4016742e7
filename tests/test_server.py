"""Flight server façade: schema planning, governed execution, per-user
policies over the wire, catalog introspection, token auth."""

from __future__ import annotations

import json
import threading

import pyarrow.flight as fl
import pytest

import strake_spark as ss
from strake_spark.server import make_server
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def served(spark):
    eng = ss.connect(
        {
            "sources": [
                {"name": "sv", "type": "parquet", "url": SF_DIR,
                 "tables": [{"name": "nation"}, {"name": "region"}]}
            ],
            "policies": {
                "roles": {"r0": {"tables": {"sv_nation": {
                    "rls_filter": "n_regionkey = 0"}}}},
                "users": {"pat": ["r0"]},
            },
        },
        spark=spark,
    )
    srv = make_server(eng)
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    yield fl.FlightClient(f"grpc://127.0.0.1:{srv.port}")
    srv.shutdown()


class TestFlightServer:
    def test_get_flight_info_plans_schema(self, served):
        info = served.get_flight_info(
            fl.FlightDescriptor.for_command(b"SELECT n_name, n_regionkey FROM sv_nation")
        )
        assert [f.name for f in info.schema] == ["n_name", "n_regionkey"]

    def test_do_get_executes_governed(self, served):
        reader = served.do_get(fl.Ticket(b"SELECT count(*) AS n FROM sv_nation"))
        assert reader.read_all().to_pylist() == [{"n": 25}]

    def test_user_header_applies_policies(self, served):
        req = json.dumps({"sql": "SELECT count(*) AS n FROM sv_nation", "user": "pat"})
        reader = served.do_get(fl.Ticket(req.encode()))
        assert reader.read_all().to_pylist() == [{"n": 5}]

    def test_prepared_statement_params_bind(self, served):
        """Prepared-statement surface (reference flight_sql.rs:533-600):
        named params ride the command JSON, bind in Spark's parser, and
        the FlightInfo ticket round-trips them intact."""
        cmd = json.dumps(
            {"sql": "SELECT n_name FROM sv_nation WHERE n_nationkey = :k",
             "params": {"k": 3}}
        ).encode()
        info = served.get_flight_info(fl.FlightDescriptor.for_command(cmd))
        assert [f.name for f in info.schema] == ["n_name"]
        reader = served.do_get(info.endpoints[0].ticket)
        rows = reader.read_all().to_pylist()
        assert len(rows) == 1

    def test_params_cannot_inject(self, served):
        cmd = json.dumps(
            {"sql": "SELECT n_name FROM sv_nation WHERE n_name = :v",
             "params": {"v": "x' OR '1'='1"}}
        ).encode()
        reader = served.do_get(fl.Ticket(cmd))
        assert reader.read_all().num_rows == 0  # bound as a literal, not spliced

    def test_injection_rejected_over_wire(self, served):
        with pytest.raises(Exception, match="(?i)read-only|rejected|SELECT"):
            served.get_flight_info(
                fl.FlightDescriptor.for_command(b"DROP TABLE sv_nation")
            )

    def test_catalog_introspection(self, served):
        reader = served.do_get(fl.Ticket(b"catalog:tables"))
        tables = {r["table"] for r in reader.read_all().to_pylist()}
        assert {"sv_nation", "sv_region"} <= tables


class TestAuth:
    def test_oidc_sub_overrides_ticket_user(self, spark):
        """A validated token's sub is the governance principal: a token
        for 'pat' (RLS: n_regionkey = 0) with a ticket claiming 'bob'
        (unrestricted) must get PAT's profile — the ticket JSON is
        client-controlled and cannot escalate."""
        import time

        from strake_spark.jwtauth import OidcValidator, sign_hs256

        eng = ss.connect(
            {
                "sources": [{"name": "oi", "type": "parquet", "url": SF_DIR,
                             "tables": [{"name": "nation"}]}],
                "policies": {
                    "roles": {"r0": {"tables": {"oi_nation": {
                        "rls_filter": "n_regionkey = 0"}}}},
                    "users": {"pat": ["r0"]},
                },
            },
            spark=spark,
        )
        validator = OidcValidator("topsecret", issuer="iss", audience="aud")
        srv = make_server(eng, validator=validator)
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        try:
            client = fl.FlightClient(f"grpc://127.0.0.1:{srv.port}")
            tok = sign_hs256(
                {"sub": "pat", "iss": "iss", "aud": "aud",
                 "exp": time.time() + 60},
                "topsecret",
            )
            opts = fl.FlightCallOptions(
                headers=[(b"authorization", f"Bearer {tok}".encode())]
            )
            req = json.dumps(
                {"sql": "SELECT count(*) AS n FROM oi_nation", "user": "bob"}
            )
            out = client.do_get(fl.Ticket(req.encode()), opts).read_all()
            assert out.to_pylist() == [{"n": 5}]  # pat's RLS, not bob's 25
        finally:
            srv.shutdown()

    def test_token_required(self, spark):
        eng = ss.connect(
            {"sources": [{"name": "au", "type": "parquet", "url": SF_DIR,
                          "tables": [{"name": "region"}]}]},
            spark=spark,
        )
        srv = make_server(eng, token="s3cr3t")
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        try:
            client = fl.FlightClient(f"grpc://127.0.0.1:{srv.port}")
            with pytest.raises(Exception, match="(?i)unauthenticated|invalid token"):
                client.do_get(fl.Ticket(b"SELECT 1 AS x"))
            opts = fl.FlightCallOptions(headers=[(b"authorization", b"Bearer s3cr3t")])
            out = client.do_get(
                fl.Ticket(b"SELECT count(*) AS n FROM au_region"), opts
            ).read_all()
            assert out.to_pylist() == [{"n": 5}]
        finally:
            srv.shutdown()
