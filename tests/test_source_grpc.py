"""HPACK decoder fuzz + negative-path tests (r18): the header block
arrives from an untrusted network peer — every malformation must be
a SourceError, never a raw IndexError or a silently shortened
string. Transport/protocol tests live in
test_source_grpc_transport.py."""

from __future__ import annotations


class TestHpackFuzz:
    """Wire-client robustness: header blocks from the network are
    untrusted. Arbitrary bytes must decode to headers or raise
    SourceError — never IndexError — and the encode->decode roundtrip
    is the identity for arbitrary header lists."""

    def test_arbitrary_header_blocks_never_raise_raw_errors(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.errors import SourceError
        from strake_spark.sources.h2grpc import HpackDecoder

        @settings(max_examples=200, deadline=None)
        @given(buf=st.binary(max_size=64))
        def run(buf):
            try:
                headers = HpackDecoder().decode(buf)
                assert all(isinstance(n, str) and isinstance(v, str)
                           for n, v in headers)
            except SourceError:
                pass

        run()

    def test_encode_decode_roundtrip_arbitrary_headers(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.sources.h2grpc import HpackDecoder, encode_headers

        text = st.text(
            st.characters(codec="utf-8", exclude_categories=("Cs",)),
            max_size=20,
        )

        @settings(max_examples=60, deadline=None)
        @given(headers=st.lists(st.tuples(text, text), max_size=6))
        def run(headers):
            assert HpackDecoder().decode(encode_headers(headers)) == headers

        run()

    def test_truncated_and_oversized_strings_are_loud(self):
        import pytest

        from strake_spark.errors import SourceError
        from strake_spark.sources.h2grpc import HpackDecoder

        # literal never-indexed, new name, declared length 10, 2 bytes
        with pytest.raises(SourceError, match="length exceeds"):
            HpackDecoder().decode(b"\x10\x0aab")
        # truncated varint continuation
        with pytest.raises(SourceError, match="truncated integer"):
            HpackDecoder().decode(b"\xff\x80")
        # size update past the advertised limit
        with pytest.raises(SourceError, match="advertised limit"):
            HpackDecoder().decode(b"\x3f\xe1\xff\x07")  # 5-bit prefix varint ~128k


class TestProtoDecodeFuzz:
    """decode_message parses bytes from an untrusted gRPC server:
    malformations must raise SourceError — never IndexError /
    struct.error / UnicodeDecodeError, and never a silently-wrong
    value from a short fixed-width slice (the same class the r18 pass
    fixed in the MySQL lenenc readers)."""

    _FIELDS = {
        1: ("a", "int64"), 2: ("b", "int32"), 3: ("c", "bool"),
        4: ("d", "double"), 5: ("e", "float"), 6: ("f", "string"),
        7: ("g", "bytes"),
    }

    def test_pinned_hostile_payloads(self):
        import pytest

        from strake_spark.errors import SourceError
        from strake_spark.sources.grpc_source import decode_message

        # truncated varint (continuation bit on the last byte)
        with pytest.raises(SourceError, match="truncated varint"):
            decode_message(bytes.fromhex("c3d3"), self._FIELDS)
        # fixed32 float with an empty tail
        with pytest.raises(SourceError, match="truncated fixed32"):
            decode_message(bytes.fromhex("2d"), self._FIELDS)
        # fixed64 int64 with a 3-byte tail: used to decode to 197121
        with pytest.raises(SourceError, match="truncated fixed64"):
            decode_message(b"\x09\x01\x02\x03", {1: ("x", "int64")})
        # invalid UTF-8 inside a string field
        with pytest.raises(SourceError, match="invalid UTF-8"):
            decode_message(b"\x32\x02\x8b\x20", self._FIELDS)
        # length-delimited field declaring bytes past the end
        with pytest.raises(SourceError, match="declared past end"):
            decode_message(b"\x3a\x7f\x01", self._FIELDS)

    def test_arbitrary_bytes_decode_or_raise_source_error(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.errors import SourceError
        from strake_spark.sources.grpc_source import decode_message

        @settings(max_examples=200, deadline=None)
        @given(buf=st.binary(max_size=64))
        def run(buf):
            try:
                decode_message(buf, self._FIELDS)
            except SourceError:
                pass

        run()
