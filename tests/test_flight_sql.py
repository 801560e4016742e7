"""Standard Arrow Flight SQL protocol on the Flight server (reference
crates/server/src/flight_sql.rs): Any-wrapped protobuf commands in
descriptors/tickets, catalog introspection with the spec-fixed result
schemas, SqlInfo dense-union block, and stateless prepared statements.

No ADBC driver is installable in this container, so the tests drive
the protocol with hand-encoded commands through the generic pyarrow
FlightClient — the same bytes a Flight SQL driver sends. The legacy
raw-SQL ticket scheme must keep working on the same endpoint."""

from __future__ import annotations

import threading

import pyarrow as pa
import pyarrow.flight as fl
import pytest

import strake_spark as ss
import strake_spark.flightsql as fsql
from strake_spark.server import make_server
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def served(spark):
    eng = ss.connect(
        {
            "sources": [
                {
                    "name": "fs",
                    "type": "parquet",
                    "url": SF_DIR,
                    "tables": [{"name": "nation"}, {"name": "region"}],
                }
            ]
        },
        spark=spark,
    )
    srv = make_server(eng)
    t = threading.Thread(target=srv.serve, daemon=True)
    t.start()
    client = fl.connect(f"grpc://127.0.0.1:{srv.port}")
    yield eng, client
    client.close()
    srv.shutdown()


def _fetch(client, cmd) -> pa.Table:
    desc = fl.FlightDescriptor.for_command(fsql.pack_command(cmd))
    info = client.get_flight_info(desc)
    return client.do_get(info.endpoints[0].ticket).read_all()


class TestCodec:
    def test_any_roundtrip(self):
        cmd = fsql.StatementQuery(query="SELECT 1 AS x")
        packed = fsql.pack_command(cmd)
        got = fsql.unpack_command(packed)
        assert isinstance(got, fsql.StatementQuery) and got.query == cmd.query

    def test_non_flightsql_bytes_pass_through(self):
        assert fsql.unpack_command(b"SELECT 1") is None
        assert fsql.unpack_command(b"{\"sql\": \"SELECT 1\"}") is None

    def test_get_tables_all_fields(self):
        cmd = fsql.GetTables(
            catalog="c", db_schema_filter_pattern="f%",
            table_name_filter_pattern="t_n", table_types=["VIEW", "TABLE"],
            include_schema=True,
        )
        got = fsql.GetTables.decode(cmd.encode())
        assert got == cmd

    def test_sql_info_packed_and_unpacked(self):
        cmd = fsql.GetSqlInfo(info=[0, 1, 300])
        assert fsql.GetSqlInfo.decode(cmd.encode()).info == [0, 1, 300]
        # unpacked form (one varint field per entry) must also decode
        unpacked = b"".join(fsql.enc_varint(1, i) for i in (0, 1, 300))
        assert fsql.GetSqlInfo.decode(unpacked).info == [0, 1, 300]

    def test_like_match(self):
        assert fsql.like_match("fs_%", "fs_nation")
        assert not fsql.like_match("fs_%", "other")
        assert fsql.like_match("fs_nat_on", "fs_nation")
        assert fsql.like_match(None, "anything")


class TestStatementQuery:
    def test_statement_query_roundtrip(self, served):
        eng, client = served
        table = _fetch(
            client,
            fsql.StatementQuery(
                query="SELECT n_name FROM fs_nation WHERE n_regionkey = 0 "
                      "ORDER BY n_name"
            ),
        )
        expected = eng.execute(
            "SELECT n_name FROM fs_nation WHERE n_regionkey = 0 ORDER BY n_name"
        )
        assert table.column("n_name").to_pylist() == (
            expected.column("n_name").to_pylist()
        )

    def test_get_flight_info_carries_schema(self, served):
        _, client = served
        desc = fl.FlightDescriptor.for_command(
            fsql.pack_command(
                fsql.StatementQuery(query="SELECT n_nationkey FROM fs_nation")
            )
        )
        info = client.get_flight_info(desc)
        eng, _ = served
        assert info.schema.names == ["n_nationkey"]
        assert pa.types.is_integer(info.schema.field("n_nationkey").type)

    def test_governance_applies(self, served):
        _, client = served
        desc = fl.FlightDescriptor.for_command(
            fsql.pack_command(fsql.StatementQuery(query="DROP TABLE fs_nation"))
        )
        with pytest.raises(fl.FlightError):
            client.get_flight_info(desc)

    def test_legacy_raw_sql_still_served(self, served):
        eng, client = served
        info = client.get_flight_info(
            fl.FlightDescriptor.for_command(b"SELECT count(*) AS n FROM fs_region")
        )
        table = client.do_get(info.endpoints[0].ticket).read_all()
        assert table.column("n").to_pylist() == [5]


class TestCatalogCommands:
    def test_get_catalogs(self, served):
        _, client = served
        t = _fetch(client, fsql.GetCatalogs())
        assert t.schema.equals(fsql.catalogs_schema())
        assert t.column("catalog_name").to_pylist() == ["strake_spark"]

    def test_get_db_schemas_with_filter(self, served):
        _, client = served
        t = _fetch(client, fsql.GetDbSchemas())
        assert "fs" in t.column("db_schema_name").to_pylist()
        t2 = _fetch(client, fsql.GetDbSchemas(db_schema_filter_pattern="zz%"))
        assert t2.num_rows == 0

    def test_get_tables(self, served):
        _, client = served
        t = _fetch(client, fsql.GetTables())
        names = t.column("table_name").to_pylist()
        assert {"fs_nation", "fs_region"} <= set(names)
        assert set(t.column("table_type").to_pylist()) == {"VIEW"}
        # LIKE pattern filter
        t2 = _fetch(client, fsql.GetTables(table_name_filter_pattern="%nation"))
        assert t2.column("table_name").to_pylist() == ["fs_nation"]
        # table_types filter that excludes views
        t3 = _fetch(client, fsql.GetTables(table_types=["TABLE"]))
        assert t3.num_rows == 0

    def test_get_tables_include_schema_ipc(self, served):
        eng, client = served
        t = _fetch(
            client,
            fsql.GetTables(table_name_filter_pattern="fs_nation",
                           include_schema=True),
        )
        assert t.num_rows == 1
        blob = t.column("table_schema").to_pylist()[0]
        schema = pa.ipc.read_schema(pa.BufferReader(blob))
        assert "n_name" in schema.names

    def test_get_sql_info(self, served):
        _, client = served
        t = _fetch(client, fsql.GetSqlInfo())
        by_id = dict(zip(t.column("info_name").to_pylist(),
                         t.column("value").to_pylist()))
        assert by_id[fsql.SQL_INFO_SERVER_NAME] == "strake-spark"
        assert by_id[fsql.SQL_INFO_SERVER_READ_ONLY] is True
        # filtered request returns only the asked ids
        t2 = _fetch(client, fsql.GetSqlInfo(info=[fsql.SQL_INFO_SERVER_NAME]))
        assert t2.column("info_name").to_pylist() == [fsql.SQL_INFO_SERVER_NAME]


class TestPreparedStatements:
    def test_create_execute_close(self, served):
        eng, client = served
        req = fsql.CreatePreparedStatementRequest(
            query="SELECT r_name FROM fs_region ORDER BY r_name"
        )
        results = list(
            client.do_action(
                fl.Action("CreatePreparedStatement",
                          fsql.any_pack(req.SHORT, req.encode()))
            )
        )
        got = fsql.unpack_command(results[0].body.to_pybytes())
        assert isinstance(got, fsql.CreatePreparedStatementResult)
        schema = pa.ipc.read_schema(pa.BufferReader(got.dataset_schema))
        assert schema.names == ["r_name"]
        # execute via CommandPreparedStatementQuery
        table = _fetch(
            client,
            fsql.PreparedStatementQuery(
                prepared_statement_handle=got.prepared_statement_handle
            ),
        )
        assert table.column("r_name").to_pylist() == sorted(
            eng.execute("SELECT r_name FROM fs_region").column("r_name").to_pylist()
        )
        # close is a no-op success
        close = fsql.ClosePreparedStatementRequest(
            prepared_statement_handle=got.prepared_statement_handle
        )
        assert list(
            client.do_action(
                fl.Action("ClosePreparedStatement",
                          fsql.any_pack(close.SHORT, close.encode()))
            )
        ) == []


class TestXdbcTypeInfo:
    def test_type_block_and_filter(self, served):
        """flight_sql.rs:836-846 parity: the deliberately simplified
        XDBC type block (INTEGER=4, VARCHAR=12), filterable by the
        optional data_type field."""
        _, client = served
        t = _fetch(client, fsql.GetXdbcTypeInfo())
        assert t.schema.equals(fsql.xdbc_type_info_schema())
        assert list(zip(t.column("type_name").to_pylist(),
                        t.column("data_type").to_pylist())) == [
            ("INTEGER", 4), ("VARCHAR", 12)]
        t2 = _fetch(client, fsql.GetXdbcTypeInfo(data_type=12))
        assert t2.column("type_name").to_pylist() == ["VARCHAR"]


class TestKeyAndTypeCatalogs:
    """The remaining spec catalog commands JDBC/ADBC drivers issue on
    connect: GetTableTypes (we serve views only) and the key-metadata
    family — a read-only federation over views has no key metadata, so
    the contract is the SPEC-FIXED schema with zero rows, which is what
    drivers expect from keyless backends."""

    def test_get_table_types(self, served):
        _, client = served
        t = _fetch(client, fsql.GetTableTypes())
        assert t.column("table_type").to_pylist() == ["VIEW"]
        assert not t.schema.field("table_type").nullable

    def test_get_primary_keys_empty_with_spec_schema(self, served):
        _, client = served
        t = _fetch(client, fsql.GetPrimaryKeys(table="fs_nation"))
        assert t.num_rows == 0
        assert t.schema.names == [
            "catalog_name", "db_schema_name", "table_name", "column_name",
            "key_name", "key_sequence",
        ]
        assert t.schema.field("key_sequence").type == pa.int32()

    def test_foreign_key_family_empty_with_spec_schema(self, served):
        _, client = served
        for cmd in (
            fsql.GetImportedKeys(table="fs_nation"),
            fsql.GetExportedKeys(table="fs_region"),
            fsql.GetCrossReference(pk_table="fs_region", fk_table="fs_nation"),
        ):
            t = _fetch(client, cmd)
            assert t.num_rows == 0
            assert t.schema.names[:4] == [
                "pk_catalog_name", "pk_db_schema_name",
                "pk_table_name", "pk_column_name",
            ]
            assert t.schema.field("update_rule").type == pa.uint8()

    def test_key_command_codec_roundtrip(self):
        pk = fsql.GetPrimaryKeys(catalog="c", db_schema="s", table="t")
        assert fsql.unpack_command(fsql.pack_command(pk)) == pk
        xr = fsql.GetCrossReference(pk_table="a", fk_table="b", fk_db_schema="s2")
        assert fsql.unpack_command(fsql.pack_command(xr)) == xr
        tt = fsql.GetTableTypes()
        assert isinstance(
            fsql.unpack_command(fsql.pack_command(tt)), fsql.GetTableTypes
        )

    def test_get_flight_info_schema_matches_result(self, served):
        _, client = served
        desc = fl.FlightDescriptor.for_command(
            fsql.pack_command(fsql.GetPrimaryKeys(table="fs_nation"))
        )
        info = client.get_flight_info(desc)
        assert info.schema == fsql.primary_keys_schema()


class TestReadOnlyDoPut:
    def test_do_put_rejected_with_coded_error(self, served):
        """Read-only by default (reference README; flight_sql.rs:576
        leaves the update path a stub): any Flight ingest/update is
        refused with the STRAKE-coded marker, not the base class's
        generic NotImplementedError."""
        _, client = served
        schema = pa.schema([pa.field("x", pa.int64())])
        desc = fl.FlightDescriptor.for_command(b"INSERT INTO fs_nation VALUES (1)")
        with pytest.raises(fl.FlightServerError, match="STRAKE-2001"):
            writer, _ = client.do_put(desc, schema)
            writer.write_table(pa.table({"x": [1]}))
            writer.close()
