"""Arrow Flight SQL protocol layer for the Flight server.

Reference: crates/server/src/flight_sql.rs (847 LoC) implements the
standard Flight SQL service — Any-wrapped protobuf commands in flight
descriptors/tickets (CommandStatementQuery, CommandGetCatalogs/
DbSchemas/Tables, CommandGetSqlInfo, prepared statements via actions) —
so stock ADBC/JDBC Flight SQL drivers can talk to the server without
the custom raw-SQL ticket scheme.

pyarrow ships no Flight SQL *server* helper, so this module implements
the minimal protobuf codec for the Flight SQL message set from the
public .proto (arrow/flight/protocol/sql — field numbers are the wire
contract) and the catalog result schemas the spec fixes. The server
(server.py) dispatches on the Any type_url and falls back to the
legacy raw-SQL scheme for plain commands, so both client generations
work against one endpoint.

Testing posture: no ADBC driver is installable in this container, so
tests drive the protocol with hand-encoded commands through the
generic pyarrow FlightClient — the same bytes a driver would send.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Self

TYPE_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."

# ------------------------------------------------------------- proto codec


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _tag(field_no: int, wire_type: int) -> bytes:
    return _varint((field_no << 3) | wire_type)


def enc_bytes(field_no: int, value: bytes) -> bytes:
    return _tag(field_no, 2) + _varint(len(value)) + value


def enc_str(field_no: int, value: str) -> bytes:
    return enc_bytes(field_no, value.encode())


def enc_varint(field_no: int, value: int) -> bytes:
    return _tag(field_no, 0) + _varint(value)


def parse_fields(buf: bytes) -> dict[int, list]:
    """Generic proto3 parse: {field_no: [raw values]} — varints as int,
    length-delimited as bytes (callers decode strings/messages)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = _read_varint(buf, pos)
        fno, wt = key >> 3, key & 0x7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 1:
            v = buf[pos : pos + 8]
            pos += 8
        elif wt == 5:
            v = buf[pos : pos + 4]
            pos += 4
        else:  # pragma: no cover - groups are proto2-only
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(fno, []).append(v)
    return out


def any_pack(short_type: str, value: bytes) -> bytes:
    """google.protobuf.Any: type_url(1) + value(2)."""
    return enc_str(1, TYPE_PREFIX + short_type) + enc_bytes(2, value)


def any_unpack(buf: bytes) -> tuple[str, bytes] | None:
    """Returns (short_type, value) for Flight SQL Anys, else None."""
    try:
        fields = parse_fields(buf)
    except Exception:
        return None
    url = fields.get(1, [b""])[0].decode(errors="replace")
    if not url.startswith(TYPE_PREFIX):
        return None
    return url[len(TYPE_PREFIX):], fields.get(2, [b""])[0]


# --------------------------------------------------------- message shapes
# Field numbers from the public FlightSql.proto — the wire contract.


@dataclass
class StatementQuery:  # CommandStatementQuery
    query: str = ""

    SHORT = "CommandStatementQuery"

    def encode(self) -> bytes:
        return enc_str(1, self.query)

    @classmethod
    def decode(cls, buf: bytes) -> "StatementQuery":
        f = parse_fields(buf)
        return cls(query=f.get(1, [b""])[0].decode())


@dataclass
class TicketStatement:  # TicketStatementQuery
    statement_handle: bytes = b""

    SHORT = "TicketStatementQuery"

    def encode(self) -> bytes:
        return enc_bytes(1, self.statement_handle)

    @classmethod
    def decode(cls, buf: bytes) -> "TicketStatement":
        f = parse_fields(buf)
        return cls(statement_handle=f.get(1, [b""])[0])


@dataclass
class GetCatalogs:  # CommandGetCatalogs
    SHORT = "CommandGetCatalogs"

    def encode(self) -> bytes:
        return b""

    @classmethod
    def decode(cls, buf: bytes) -> "GetCatalogs":
        return cls()


@dataclass
class GetDbSchemas:  # CommandGetDbSchemas
    catalog: str | None = None
    db_schema_filter_pattern: str | None = None

    SHORT = "CommandGetDbSchemas"

    def encode(self) -> bytes:
        out = b""
        if self.catalog is not None:
            out += enc_str(1, self.catalog)
        if self.db_schema_filter_pattern is not None:
            out += enc_str(2, self.db_schema_filter_pattern)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "GetDbSchemas":
        f = parse_fields(buf)
        return cls(
            catalog=f[1][0].decode() if 1 in f else None,
            db_schema_filter_pattern=f[2][0].decode() if 2 in f else None,
        )


@dataclass
class GetTables:  # CommandGetTables
    catalog: str | None = None
    db_schema_filter_pattern: str | None = None
    table_name_filter_pattern: str | None = None
    table_types: list[str] = field(default_factory=list)
    include_schema: bool = False

    SHORT = "CommandGetTables"

    def encode(self) -> bytes:
        out = b""
        if self.catalog is not None:
            out += enc_str(1, self.catalog)
        if self.db_schema_filter_pattern is not None:
            out += enc_str(2, self.db_schema_filter_pattern)
        if self.table_name_filter_pattern is not None:
            out += enc_str(3, self.table_name_filter_pattern)
        for t in self.table_types:
            out += enc_str(4, t)
        if self.include_schema:
            out += enc_varint(5, 1)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "GetTables":
        f = parse_fields(buf)
        return cls(
            catalog=f[1][0].decode() if 1 in f else None,
            db_schema_filter_pattern=f[2][0].decode() if 2 in f else None,
            table_name_filter_pattern=f[3][0].decode() if 3 in f else None,
            table_types=[v.decode() for v in f.get(4, [])],
            include_schema=bool(f.get(5, [0])[0]),
        )


@dataclass
class GetSqlInfo:  # CommandGetSqlInfo
    info: list[int] = field(default_factory=list)

    SHORT = "CommandGetSqlInfo"

    def encode(self) -> bytes:
        if not self.info:
            return b""
        packed = b"".join(_varint(i) for i in self.info)
        return enc_bytes(1, packed)  # proto3 packs repeated uint32

    @classmethod
    def decode(cls, buf: bytes) -> "GetSqlInfo":
        f = parse_fields(buf)
        info: list[int] = []
        for v in f.get(1, []):
            if isinstance(v, int):  # unpacked encoding
                info.append(v)
            else:  # packed
                pos = 0
                while pos < len(v):
                    n, pos = _read_varint(v, pos)
                    info.append(n)
        return cls(info=info)


@dataclass
class GetXdbcTypeInfo:  # CommandGetXdbcTypeInfo
    data_type: int | None = None

    SHORT = "CommandGetXdbcTypeInfo"

    def encode(self) -> bytes:
        return enc_varint(1, self.data_type) if self.data_type is not None else b""

    @classmethod
    def decode(cls, buf: bytes) -> "GetXdbcTypeInfo":
        f = parse_fields(buf)
        return cls(data_type=f[1][0] if 1 in f else None)


@dataclass
class GetTableTypes:  # CommandGetTableTypes
    SHORT = "CommandGetTableTypes"

    def encode(self) -> bytes:
        return b""

    @classmethod
    def decode(cls, buf: bytes) -> "GetTableTypes":
        return cls()


@dataclass
class GetPrimaryKeys:  # CommandGetPrimaryKeys
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""

    SHORT = "CommandGetPrimaryKeys"

    def encode(self) -> bytes:
        out = b""
        if self.catalog is not None:
            out += enc_str(1, self.catalog)
        if self.db_schema is not None:
            out += enc_str(2, self.db_schema)
        out += enc_str(3, self.table)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> Self:
        # Self, not the concrete class: GetExportedKeys/GetImportedKeys
        # borrow this classmethod verbatim, and a hardcoded return
        # annotation would make type checkers infer the wrong class
        # for the borrowers (r16 ADVICE)
        f = parse_fields(buf)
        return cls(
            catalog=f[1][0].decode() if 1 in f else None,
            db_schema=f[2][0].decode() if 2 in f else None,
            table=f.get(3, [b""])[0].decode(),
        )


@dataclass
class GetExportedKeys:  # CommandGetExportedKeys
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""

    SHORT = "CommandGetExportedKeys"

    # encode/decode bodies are cls-generic (decode is a classmethod
    # building cls(...)), so the primary-keys implementations work
    # verbatim here
    encode = GetPrimaryKeys.encode
    decode = classmethod(GetPrimaryKeys.decode.__func__)


@dataclass
class GetImportedKeys:  # CommandGetImportedKeys
    catalog: str | None = None
    db_schema: str | None = None
    table: str = ""

    SHORT = "CommandGetImportedKeys"

    # encode/decode bodies are cls-generic (decode is a classmethod
    # building cls(...)), so the primary-keys implementations work
    # verbatim here
    encode = GetPrimaryKeys.encode
    decode = classmethod(GetPrimaryKeys.decode.__func__)


@dataclass
class GetCrossReference:  # CommandGetCrossReference
    pk_catalog: str | None = None
    pk_db_schema: str | None = None
    pk_table: str = ""
    fk_catalog: str | None = None
    fk_db_schema: str | None = None
    fk_table: str = ""

    SHORT = "CommandGetCrossReference"

    def encode(self) -> bytes:
        out = b""
        if self.pk_catalog is not None:
            out += enc_str(1, self.pk_catalog)
        if self.pk_db_schema is not None:
            out += enc_str(2, self.pk_db_schema)
        out += enc_str(3, self.pk_table)
        if self.fk_catalog is not None:
            out += enc_str(4, self.fk_catalog)
        if self.fk_db_schema is not None:
            out += enc_str(5, self.fk_db_schema)
        out += enc_str(6, self.fk_table)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "GetCrossReference":
        f = parse_fields(buf)
        return cls(
            pk_catalog=f[1][0].decode() if 1 in f else None,
            pk_db_schema=f[2][0].decode() if 2 in f else None,
            pk_table=f.get(3, [b""])[0].decode(),
            fk_catalog=f[4][0].decode() if 4 in f else None,
            fk_db_schema=f[5][0].decode() if 5 in f else None,
            fk_table=f.get(6, [b""])[0].decode(),
        )


@dataclass
class PreparedStatementQuery:  # CommandPreparedStatementQuery
    prepared_statement_handle: bytes = b""

    SHORT = "CommandPreparedStatementQuery"

    def encode(self) -> bytes:
        return enc_bytes(1, self.prepared_statement_handle)

    @classmethod
    def decode(cls, buf: bytes) -> "PreparedStatementQuery":
        f = parse_fields(buf)
        return cls(prepared_statement_handle=f.get(1, [b""])[0])


@dataclass
class CreatePreparedStatementRequest:  # ActionCreatePreparedStatementRequest
    query: str = ""

    SHORT = "ActionCreatePreparedStatementRequest"

    def encode(self) -> bytes:
        return enc_str(1, self.query)

    @classmethod
    def decode(cls, buf: bytes) -> "CreatePreparedStatementRequest":
        f = parse_fields(buf)
        return cls(query=f.get(1, [b""])[0].decode())


@dataclass
class CreatePreparedStatementResult:  # ActionCreatePreparedStatementResult
    prepared_statement_handle: bytes = b""
    dataset_schema: bytes = b""
    parameter_schema: bytes = b""

    SHORT = "ActionCreatePreparedStatementResult"

    def encode(self) -> bytes:
        out = enc_bytes(1, self.prepared_statement_handle)
        if self.dataset_schema:
            out += enc_bytes(2, self.dataset_schema)
        if self.parameter_schema:
            out += enc_bytes(3, self.parameter_schema)
        return out

    @classmethod
    def decode(cls, buf: bytes) -> "CreatePreparedStatementResult":
        f = parse_fields(buf)
        return cls(
            prepared_statement_handle=f.get(1, [b""])[0],
            dataset_schema=f.get(2, [b""])[0],
            parameter_schema=f.get(3, [b""])[0],
        )


@dataclass
class ClosePreparedStatementRequest:  # ActionClosePreparedStatementRequest
    prepared_statement_handle: bytes = b""

    SHORT = "ActionClosePreparedStatementRequest"

    def encode(self) -> bytes:
        return enc_bytes(1, self.prepared_statement_handle)

    @classmethod
    def decode(cls, buf: bytes) -> "ClosePreparedStatementRequest":
        f = parse_fields(buf)
        return cls(prepared_statement_handle=f.get(1, [b""])[0])


MESSAGES = {
    m.SHORT: m
    for m in (
        StatementQuery, TicketStatement, GetCatalogs, GetDbSchemas,
        GetTables, GetSqlInfo, GetXdbcTypeInfo, PreparedStatementQuery,
        CreatePreparedStatementRequest, CreatePreparedStatementResult,
        ClosePreparedStatementRequest, GetTableTypes, GetPrimaryKeys,
        GetExportedKeys, GetImportedKeys, GetCrossReference,
    )
}


def pack_command(msg) -> bytes:
    return any_pack(msg.SHORT, msg.encode())


def unpack_command(buf: bytes):
    """Any bytes -> decoded message instance, or None if not Flight SQL."""
    got = any_unpack(buf)
    if got is None:
        return None
    short, value = got
    cls = MESSAGES.get(short)
    if cls is None:
        raise ValueError(f"unsupported Flight SQL command {short}")
    return cls.decode(value)


# --------------------------------------------------- catalog result schemas
# Fixed by the Flight SQL spec (flight_sql.rs builds the same ones at
# :98-124) — column names/types are the wire contract for drivers.

SQL_INFO_SERVER_NAME = 0
SQL_INFO_SERVER_VERSION = 1
SQL_INFO_SERVER_ARROW_VERSION = 2
SQL_INFO_SERVER_READ_ONLY = 3


def catalogs_schema():
    import pyarrow as pa

    return pa.schema([pa.field("catalog_name", pa.utf8(), nullable=False)])


def db_schemas_schema():
    import pyarrow as pa

    return pa.schema([
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8(), nullable=False),
    ])


def tables_schema(include_schema: bool):
    import pyarrow as pa

    fields = [
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8()),
        pa.field("table_name", pa.utf8(), nullable=False),
        pa.field("table_type", pa.utf8(), nullable=False),
    ]
    if include_schema:
        fields.append(pa.field("table_schema", pa.binary(), nullable=False))
    return pa.schema(fields)


def table_types_schema():
    import pyarrow as pa

    return pa.schema([pa.field("table_type", pa.utf8(), nullable=False)])


def primary_keys_schema():
    import pyarrow as pa

    return pa.schema([
        pa.field("catalog_name", pa.utf8()),
        pa.field("db_schema_name", pa.utf8()),
        pa.field("table_name", pa.utf8(), nullable=False),
        pa.field("column_name", pa.utf8(), nullable=False),
        pa.field("key_name", pa.utf8()),
        pa.field("key_sequence", pa.int32(), nullable=False),
    ])


def foreign_keys_schema():
    """Shared by GetImportedKeys / GetExportedKeys / GetCrossReference
    (the spec fixes one layout for all three)."""
    import pyarrow as pa

    return pa.schema([
        pa.field("pk_catalog_name", pa.utf8()),
        pa.field("pk_db_schema_name", pa.utf8()),
        pa.field("pk_table_name", pa.utf8(), nullable=False),
        pa.field("pk_column_name", pa.utf8(), nullable=False),
        pa.field("fk_catalog_name", pa.utf8()),
        pa.field("fk_db_schema_name", pa.utf8()),
        pa.field("fk_table_name", pa.utf8(), nullable=False),
        pa.field("fk_column_name", pa.utf8(), nullable=False),
        pa.field("key_sequence", pa.int32(), nullable=False),
        pa.field("fk_key_name", pa.utf8()),
        pa.field("pk_key_name", pa.utf8()),
        pa.field("update_rule", pa.uint8(), nullable=False),
        pa.field("delete_rule", pa.uint8(), nullable=False),
    ])


def sql_info_value_type():
    import pyarrow as pa

    return pa.dense_union([
        pa.field("string_value", pa.utf8()),
        pa.field("bool_value", pa.bool_()),
        pa.field("bigint_value", pa.int64()),
        pa.field("int32_bitmask", pa.int32()),
        pa.field("string_list", pa.list_(pa.utf8())),
        pa.field(
            "int32_to_int32_list_map",
            pa.map_(pa.int32(), pa.list_(pa.int32())),
        ),
    ])


def sql_info_schema():
    import pyarrow as pa

    return pa.schema([
        pa.field("info_name", pa.uint32(), nullable=False),
        pa.field("value", sql_info_value_type(), nullable=False),
    ])


def sql_info_table(requested: list[int]):
    """The server identity block (flight_sql.rs get_sql_info parity) as
    a dense-union table; empty ``requested`` means everything."""
    import pyarrow as pa

    entries: list[tuple[int, int, object]] = [
        (SQL_INFO_SERVER_NAME, 0, "strake-spark"),
        (SQL_INFO_SERVER_VERSION, 0, "0.1"),
        (SQL_INFO_SERVER_ARROW_VERSION, 0, pa.__version__),
        (SQL_INFO_SERVER_READ_ONLY, 1, True),
    ]
    if requested:
        keep = set(requested)
        entries = [e for e in entries if e[0] in keep]
    strings = [v for _, t, v in entries if t == 0]
    bools = [v for _, t, v in entries if t == 1]
    types = pa.array([t for _, t, _ in entries], pa.int8())
    offsets, seen = [], {0: 0, 1: 0}
    for _, t, _ in entries:
        offsets.append(seen[t])
        seen[t] += 1
    children = [
        pa.array(strings, pa.utf8()),
        pa.array(bools, pa.bool_()),
        pa.array([], pa.int64()),
        pa.array([], pa.int32()),
        pa.array([], pa.list_(pa.utf8())),
        pa.array([], pa.map_(pa.int32(), pa.list_(pa.int32()))),
    ]
    value = pa.UnionArray.from_dense(
        types, pa.array(offsets, pa.int32()), children,
        ["string_value", "bool_value", "bigint_value", "int32_bitmask",
         "string_list", "int32_to_int32_list_map"],
    )
    return pa.table(
        {"info_name": pa.array([e[0] for e in entries], pa.uint32()),
         "value": value},
        schema=sql_info_schema(),
    )


def xdbc_type_info_schema():
    import pyarrow as pa

    return pa.schema([
        pa.field("type_name", pa.utf8(), nullable=False),
        pa.field("data_type", pa.int32(), nullable=False),
    ])


def xdbc_type_info_table(data_type: int | None):
    """The reference's deliberately simplified XDBC type block
    (flight_sql.rs:836-846: INTEGER=4, VARCHAR=12), filtered by the
    optional requested type code."""
    import pyarrow as pa

    rows = [("INTEGER", 4), ("VARCHAR", 12)]
    if data_type is not None:
        rows = [r for r in rows if r[1] == data_type]
    return pa.table(
        {"type_name": [r[0] for r in rows],
         "data_type": pa.array([r[1] for r in rows], pa.int32())},
        schema=xdbc_type_info_schema(),
    )


def like_match(pattern: str | None, value: str) -> bool:
    """SQL LIKE patterns ('%'/'_') used by the catalog filter fields."""
    if pattern is None:
        return True
    import fnmatch

    translated = pattern.replace("%", "*").replace("_", "?")
    return fnmatch.fnmatchcase(value, translated)
