"""Unit tests for the r19 wire-client hardening pass: tolerant
timestamp text parsing, MySQL greeting/lenenc bounds, h2 padding and
graceful-GOAWAY semantics, xlsx shared-string index bounds."""

from __future__ import annotations

import datetime
import xml.etree.ElementTree as ET

import pytest

from strake_spark.errors import SourceError


class TestParseWireTimestamp:
    def test_iso_shapes_pass_through(self):
        from strake_spark.sources.wiretext import parse_wire_timestamp

        assert parse_wire_timestamp("2024-01-01 12:00:00") == datetime.datetime(
            2024, 1, 1, 12
        )
        assert parse_wire_timestamp("2024-01-01 12:00:00.123456+00:00").microsecond == 123456

    def test_pg_hour_only_offset(self):
        """PG renders timestamptz as '...+03' — Python 3.10 rejects it."""
        from strake_spark.sources.wiretext import parse_wire_timestamp

        d = parse_wire_timestamp("2024-01-01 12:00:00+03")
        assert d.utcoffset() == datetime.timedelta(hours=3)
        d = parse_wire_timestamp("2024-01-01 12:00:00-05")
        assert d.utcoffset() == datetime.timedelta(hours=-5)

    def test_trimmed_and_odd_fractions(self):
        """PG trims trailing zeros; MySQL DATETIME(n) renders n digits —
        3.10 accepts only 3 or 6."""
        from strake_spark.sources.wiretext import parse_wire_timestamp

        assert parse_wire_timestamp("2024-01-01 12:00:00.5").microsecond == 500000
        assert parse_wire_timestamp("2024-01-01 12:00:00.12").microsecond == 120000
        assert parse_wire_timestamp("2024-01-01 12:00:00.12345").microsecond == 123450
        d = parse_wire_timestamp("2024-01-01 12:00:00.5+03")
        assert d.microsecond == 500000
        assert d.utcoffset() == datetime.timedelta(hours=3)

    def test_compact_offset(self):
        from strake_spark.sources.wiretext import parse_wire_timestamp

        d = parse_wire_timestamp("2024-01-01 12:00:00+0330")
        assert d.utcoffset() == datetime.timedelta(hours=3, minutes=30)

    def test_existing_colon_offset_untouched(self):
        from strake_spark.sources.wiretext import parse_wire_timestamp

        d = parse_wire_timestamp("2024-01-01 12:00:00.123+05:30")
        assert d.utcoffset() == datetime.timedelta(hours=5, minutes=30)
        assert d.microsecond == 123000

    def test_garbage_still_raises(self):
        from strake_spark.sources.wiretext import parse_wire_timestamp

        with pytest.raises(ValueError):
            parse_wire_timestamp("not a timestamp")


class TestMySqlBounds:
    def test_lenenc_rejects_err_marker(self):
        """0xff is the ERR-packet marker, never a length prefix —
        treating it as an 8-byte integer misparsed corrupt packets."""
        from strake_spark.sources.mysqlwire import _read_lenenc_int

        with pytest.raises(SourceError, match="length-encoded"):
            _read_lenenc_int(b"\xff" + b"\x00" * 8, 0)

    def test_truncated_greeting_is_loud(self):
        """A proxy/non-MySQL service answering with a short packet that
        starts with byte 10 must be a clear SourceError, not a raw
        ValueError/IndexError."""
        from strake_spark.sources.mysqlwire import MySqlWireConnection

        for pkt in (b"\x0a", b"\x0agarbage-no-nul", b"\x0a5.7\x00\x01\x02"):
            c = object.__new__(MySqlWireConnection)
            c._read_packet = lambda p=pkt: p
            c._sslmode = "disable"
            with pytest.raises(SourceError, match="greeting"):
                c._handshake("u", "p", "")

    def test_empty_greeting_is_loud(self):
        from strake_spark.sources.mysqlwire import MySqlWireConnection

        c = object.__new__(MySqlWireConnection)
        c._read_packet = lambda: b""
        c._sslmode = "disable"
        with pytest.raises(SourceError, match="empty"):
            c._handshake("u", "p", "")


class TestH2Hardening:
    def test_strip_padding_rejects_oversized_pad(self):
        """§6.1: pad length >= payload is PROTOCOL_ERROR — silently
        returning a short payload surfaced later as opaque truncation."""
        from strake_spark.sources.h2grpc import FLAG_PADDED, strip_padding

        with pytest.raises(SourceError, match="pad length"):
            strip_padding(FLAG_PADDED, bytes([255]) + b"x")
        with pytest.raises(SourceError, match="pad length"):
            strip_padding(FLAG_PADDED, b"")
        # legal: pad consumes everything but the data
        assert strip_padding(FLAG_PADDED, bytes([1]) + b"data" + b"\x00") == b"data"
        assert strip_padding(0, b"data") == b"data"

    def test_graceful_goaway_drains_instead_of_aborting(self):
        """§6.8: GOAWAY(NO_ERROR) with last_stream_id covering the
        in-flight stream promises completion (grpc-go MaxConnectionAge
        draining) — the old code failed the healthy RPC."""
        from strake_spark.sources.h2grpc import FT_GOAWAY, H2GrpcChannel

        c = object.__new__(H2GrpcChannel)
        c._stream_windows = {1: 65535}
        c._goaway_last = None
        payload = (1).to_bytes(4, "big") + (0).to_bytes(4, "big")
        c._handle_control(FT_GOAWAY, 0, payload)  # must NOT raise
        assert c._goaway_last == 1
        # ...but a NEW call on the draining connection fails fast
        with pytest.raises(SourceError, match="draining"):
            next(c.call("/svc/M", b""))

    def test_goaway_with_error_still_aborts(self):
        from strake_spark.sources.h2grpc import FT_GOAWAY, H2GrpcChannel

        c = object.__new__(H2GrpcChannel)
        c._stream_windows = {1: 65535}
        c._goaway_last = None
        payload = (1).to_bytes(4, "big") + (2).to_bytes(4, "big")  # INTERNAL_ERROR
        with pytest.raises(SourceError, match="GOAWAY"):
            c._handle_control(FT_GOAWAY, 0, payload)

    def test_goaway_not_covering_our_stream_aborts(self):
        """NO_ERROR but last_stream_id BELOW the active stream: the
        server will not complete it — abort is correct."""
        from strake_spark.sources.h2grpc import FT_GOAWAY, H2GrpcChannel

        c = object.__new__(H2GrpcChannel)
        c._stream_windows = {5: 65535}
        c._goaway_last = None
        payload = (3).to_bytes(4, "big") + (0).to_bytes(4, "big")
        with pytest.raises(SourceError, match="GOAWAY"):
            c._handle_control(FT_GOAWAY, 0, payload)


class TestXlsxSharedStringBounds:
    _M = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"

    def _cell(self, v: str):
        return ET.fromstring(
            f'<c xmlns="{self._M}" t="s"><v>{v}</v></c>'
        )

    def test_negative_index_is_loud_not_wrong(self):
        """strings[-1] silently returned the LAST shared string —
        wrong data with no error."""
        from strake_spark.sources.xlsx import _cell_value

        with pytest.raises(SourceError, match="out of range"):
            _cell_value(self._cell("-1"), ["a", "b"])

    def test_out_of_range_and_garbage_are_loud(self):
        from strake_spark.sources.xlsx import _cell_value

        with pytest.raises(SourceError, match="out of range"):
            _cell_value(self._cell("99"), ["a"])
        with pytest.raises(SourceError, match="non-numeric"):
            _cell_value(self._cell("abc"), ["a"])

    def test_valid_index_still_resolves(self):
        from strake_spark.sources.xlsx import _cell_value

        assert _cell_value(self._cell("1"), ["a", "b"]) == "b"
