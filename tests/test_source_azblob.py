"""Jar-free Azure Blob source (sources/azblob.py): SharedKey signing
verified SERVER-SIDE by an in-process fake (recomputes the signature
from the received headers under the shared account key — wrong
canonicalization on either side is a 403), List Blobs with NextMarker
pagination, Get Blob streaming, spool routing, and an end-to-end
Spark parquet read via the az:// scheme."""

from __future__ import annotations

import base64
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from strake_spark.errors import SourceError
from strake_spark.sources.azblob import AzBlobClient, shared_key_auth, spool_az

ACCOUNT = "testacct"
KEY_B64 = base64.b64encode(b"super-secret-account-key-32bytes!").decode()


class _FakeAz(ThreadingHTTPServer):
    def __init__(self, blobs: dict[str, dict[str, bytes]], page_size: int = 1):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.blobs = blobs  # container -> name -> bytes
        self.page_size = page_size
        self.requests: list[str] = []


class _Handler(BaseHTTPRequestHandler):
    server: _FakeAz

    def log_message(self, *a):
        pass

    def _verify(self) -> bool:
        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        headers = {
            k: v for k, v in self.headers.items()
            if k.lower().startswith("x-ms-") or k.lower() == "range"
        }
        expect = shared_key_auth(
            "GET", ACCOUNT, u.path, query, headers, KEY_B64
        )
        return self.headers.get("Authorization") == expect

    def do_GET(self):
        self.server.requests.append(self.path)
        if not self._verify():
            self._body(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
            return
        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        parts = urllib.parse.unquote(u.path).lstrip("/").split("/", 1)
        container, name = parts[0], (parts[1] if len(parts) > 1 else "")
        store = self.server.blobs.get(container)
        if store is None:
            self._body(404, b"<Error><Code>ContainerNotFound</Code></Error>")
            return
        if query.get("comp") == "list":
            self._list(store, query)
            return
        if name in store:
            data = store[name]
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo, hi = rng[len("bytes="):].split("-", 1)
                start = int(lo)
                end = min(int(hi), len(data) - 1) if hi else len(data) - 1
                self._body(206, data[start : end + 1])
                return
            self._body(200, data)
            return
        self._body(404, b"<Error><Code>BlobNotFound</Code></Error>")

    def _body(self, code: int, data: bytes):
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _list(self, store: dict[str, bytes], query: dict[str, str]):
        prefix = query.get("prefix", "")
        names = sorted(n for n in store if n.startswith(prefix))
        start = int(query.get("marker") or 0)
        page = names[start : start + self.server.page_size]
        nxt = start + self.server.page_size
        items = "".join(
            f"<Blob><Name>{n}</Name><Properties>"
            f"<Content-Length>{len(store[n])}</Content-Length>"
            f"</Properties></Blob>"
            for n in page
        )
        marker = f"<NextMarker>{nxt}</NextMarker>" if nxt < len(names) else ""
        body = (
            '<?xml version="1.0"?><EnumerationResults>'
            f"<Blobs>{items}</Blobs>{marker}</EnumerationResults>"
        ).encode()
        self._body(200, body)


@pytest.fixture()
def fake_az():
    blobs = {
        "ct": {
            "d/a.bin": b"alpha",
            "d/b.bin": b"bravo-longer",
            "d/c.bin": b"charlie!",
            "e/x.bin": b"nope",
        }
    }
    srv = _FakeAz(blobs, page_size=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


class TestSharedKeyClient:
    def test_list_follows_next_marker(self, fake_az):
        srv, ep = fake_az
        c = AzBlobClient(ACCOUNT, KEY_B64, endpoint=ep)
        got = c.list_blobs("ct", "d/")
        assert [n for n, _ in got] == ["d/a.bin", "d/b.bin", "d/c.bin"]
        assert dict(got)["d/b.bin"] == len(b"bravo-longer")
        assert sum("comp=list" in r for r in srv.requests) == 3  # paginated

    def test_get_blob_exact_bytes(self, fake_az, tmp_path):
        _, ep = fake_az
        c = AzBlobClient(ACCOUNT, KEY_B64, endpoint=ep)
        dest = str(tmp_path / "a.bin")
        assert c.get_blob("ct", "d/a.bin", dest) == 5
        assert open(dest, "rb").read() == b"alpha"

    def test_wrong_key_rejected_server_side(self, fake_az):
        _, ep = fake_az
        bad = base64.b64encode(b"wrong-key").decode()
        c = AzBlobClient(ACCOUNT, bad, endpoint=ep)
        with pytest.raises(SourceError, match="403"):
            c.list_blobs("ct", "d/")

    def test_missing_credentials_fail_loudly(self):
        with pytest.raises(SourceError, match="credentials"):
            AzBlobClient("", "")

    def test_spool_prefix_and_exact(self, fake_az):
        _, ep = fake_az
        opts = {
            "azure_account": ACCOUNT,
            "azure_account_key": KEY_B64,
            "azure_endpoint": ep,
        }
        d = spool_az("az://ct/d/", opts)
        assert sorted(os.listdir(d)) == ["a.bin", "b.bin", "c.bin"]
        f = spool_az("az://ct/d/a.bin", opts)
        assert os.path.isfile(f) and open(f, "rb").read() == b"alpha"
        with pytest.raises(SourceError, match="no blobs"):
            spool_az("az://ct/absent/", opts)


class TestSparkEndToEnd:
    def test_parquet_source_reads_over_az(self, spark, tmp_path):
        import duckdb

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')) "
            f"TO '{tmp_path}/region.parquet' (FORMAT PARQUET)"
        )
        blobs = {"lake": {"t/region/region.parquet": (tmp_path / "region.parquet").read_bytes()}}
        srv = _FakeAz(blobs)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            ep = f"http://127.0.0.1:{srv.server_address[1]}"
            from strake_spark.config import SourceConfig, TableConfig
            from strake_spark.sources.file import register_file_source

            cfg = SourceConfig(
                name="azlake",
                type="parquet",
                url="az://lake/t",
                tables=[TableConfig(name="region", path="az://lake/t/region/")],
                options={
                    "azure_account": ACCOUNT,
                    "azure_account_key": KEY_B64,
                    "azure_endpoint": ep,
                },
            )
            views = register_file_source(spark, cfg)
            got = spark.table(views[0]).toPandas()
            want = spark.read.parquet("/root/testdata/sf0.001/region.parquet").toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
        finally:
            srv.shutdown()


class TestRangedAndDistributed:
    def test_signed_range_partial_content(self, fake_az):
        """SharedKey SIGNS Range (a standard string-to-sign header) —
        the verifying fake recomputes with the received Range, so a
        passing partial read proves both sides canonicalize it."""
        _, ep = fake_az
        c = AzBlobClient(ACCOUNT, KEY_B64, endpoint=ep)
        assert c.get_range("ct", "d/a.bin", 1, 3) == b"lph"

    def test_executor_parallel_parquet_read(self, spark, tmp_path):
        import duckdb

        from strake_spark.sources.azblob import read_az_parquet_distributed

        con = duckdb.connect()
        for i, pred in enumerate(["n_nationkey < 12", "n_nationkey >= 12"]):
            con.execute(
                "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet') "
                f"WHERE {pred}) TO '{tmp_path}/p{i}.parquet' (FORMAT PARQUET)"
            )
        blobs = {
            "ct2": {
                f"w/p{i}.parquet": (tmp_path / f"p{i}.parquet").read_bytes()
                for i in range(2)
            }
        }
        srv = _FakeAz(blobs, page_size=1)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "azure_account": ACCOUNT,
                "azure_account_key": KEY_B64,
                "azure_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
            }
            got = read_az_parquet_distributed(spark, "az://ct2/w/", opts).toPandas()
            want = spark.read.parquet(
                "/root/testdata/sf0.001/nation.parquet"
            ).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
        finally:
            srv.shutdown()


class TestSpecialCharacterNames:
    def test_blob_name_with_spaces(self, fake_az, tmp_path):
        """SharedKey signs the ENCODED path exactly as sent."""
        srv, ep = fake_az
        srv.blobs["ct"]["odd dir/a b.bin"] = b"spacey-az"
        c = AzBlobClient(ACCOUNT, KEY_B64, endpoint=ep)
        dest = str(tmp_path / "out.bin")
        assert c.get_blob("ct", "odd dir/a b.bin", dest) == 9
        assert open(dest, "rb").read() == b"spacey-az"


class TestSigningPropertyBased:
    def test_random_blob_names_sign_and_fetch(self, fake_az):
        """SharedKey analogue of the S3 property test: arbitrary blob
        names (unicode, spaces, punctuation) must canonicalize
        identically on both sides and round-trip byte-exact."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        srv, ep = fake_az
        c = AzBlobClient(ACCOUNT, KEY_B64, endpoint=ep)

        name_chars = st.characters(
            codec="utf-8",
            exclude_characters="/\x00\r\n",
            exclude_categories=("Cs", "Cc"),
        )
        segment = st.text(name_chars, min_size=1, max_size=12).filter(
            lambda s: s not in (".", "..") and s == s.strip() and s.strip() != ""
        )

        @settings(
            max_examples=25,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(segs=st.lists(segment, min_size=1, max_size=3), payload=st.binary(min_size=1, max_size=64))
        def run(segs, payload):
            name = "prop/" + "/".join(segs)
            srv.blobs["ct"][name] = payload
            import tempfile as _tf

            with _tf.NamedTemporaryFile(delete=True) as f:
                n = c.get_blob("ct", name, f.name)
                assert n == len(payload)
                assert open(f.name, "rb").read() == payload

        run()

class TestSpoolSubpathMirroring:
    def test_same_basename_blobs_both_survive(self, fake_az):
        """r18 advice: flat basenames silently overwrote same-named
        blobs under different prefixes — subpaths are mirrored now."""
        srv, ep = fake_az
        srv.blobs["ct"]["tbl/a/0001.bin"] = b"from-a"
        srv.blobs["ct"]["tbl/b/0001.bin"] = b"from-b"
        opts = {
            "azure_account": ACCOUNT,
            "azure_account_key": KEY_B64,
            "azure_endpoint": ep,
        }
        d = spool_az("az://ct/tbl/", opts)
        assert open(os.path.join(d, "a", "0001.bin"), "rb").read() == b"from-a"
        assert open(os.path.join(d, "b", "0001.bin"), "rb").read() == b"from-b"

@pytest.mark.slow
# slow (r20, suite budget): same rationale as the s3 twin.
class TestRowGroupSplitting:
    def test_large_blob_splits_into_row_group_tasks(self, spark, tmp_path):
        """A blob over split_threshold_bytes fans out one task per
        parquet row group (r18 — parity with the S3 reader); result
        equals the local read."""
        import duckdb
        import pyarrow.parquet as pq

        from strake_spark.sources.azblob import read_az_parquet_distributed

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')) "
            f"TO '{tmp_path}/li.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)"
        )
        data = (tmp_path / "li.parquet").read_bytes()
        n_groups = pq.ParquetFile(str(tmp_path / "li.parquet")).metadata.num_row_groups
        assert n_groups > 1
        srv = _FakeAz({"rg": {"w/li.parquet": data}})
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "azure_account": ACCOUNT,
                "azure_account_key": KEY_B64,
                "azure_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                "split_threshold_bytes": 1,  # force splitting
            }
            df = read_az_parquet_distributed(spark, "az://rg/w/", opts)
            # one input partition per row-group task
            assert df.rdd.getNumPartitions() == n_groups
            got = df.toPandas()
            want = spark.read.parquet(str(tmp_path / "li.parquet")).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
        finally:
            srv.shutdown()


class TestHostileListingBodies:
    """Listing bodies are server bytes (r19 opt round): unparseable XML
    and non-numeric Content-Length must raise SourceError."""

    class _Resp:
        def __init__(self, b):
            self._b = b

        def read(self):
            return self._b

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def test_unparseable_listing_xml_is_loud(self, monkeypatch):
        c = AzBlobClient("acct", base64.b64encode(b"k").decode(),
                         endpoint="http://127.0.0.1:1")
        monkeypatch.setattr(
            c, "_request", lambda *a, **k: self._Resp(b"<html>busy"))
        with pytest.raises(SourceError, match="not parseable XML"):
            c.list_blobs("cont")

    def test_non_numeric_content_length_is_loud(self, monkeypatch):
        c = AzBlobClient("acct", base64.b64encode(b"k").decode(),
                         endpoint="http://127.0.0.1:1")
        xml = (b'<?xml version="1.0"?><EnumerationResults><Blobs>'
               b'<Blob><Name>b1</Name><Properties>'
               b'<Content-Length>lots</Content-Length></Properties></Blob>'
               b'</Blobs></EnumerationResults>')
        monkeypatch.setattr(c, "_request", lambda *a, **k: self._Resp(xml))
        with pytest.raises(SourceError, match="non-numeric Content-Length"):
            c.list_blobs("cont")
