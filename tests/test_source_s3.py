"""Jar-free S3 source (sources/s3http.py): SigV4 signing pinned to the
AWS documentation's own example vector, plus a live in-process fake S3
that VERIFIES every request's signature server-side (recomputing it
with the shared secret — a wrong canonicalization on either side is a
403, not a silent pass), serves paginated ListObjectsV2, and streams
objects; end-to-end through the parquet source registration."""

from __future__ import annotations

import hashlib
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from strake_spark.errors import SourceError
from strake_spark.sources.s3http import S3Client, sign_v4, spool_s3

ACCESS, SECRET = "TESTKEY", "testsecret/with+chars"
REGION = "us-east-1"


class _FakeS3(ThreadingHTTPServer):
    def __init__(self, objects: dict[str, dict[str, bytes]], page_size: int = 1):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.objects = objects  # bucket -> key -> bytes
        self.page_size = page_size
        self.requests: list[str] = []


class _Handler(BaseHTTPRequestHandler):
    server: _FakeS3

    def log_message(self, *a):  # quiet
        pass

    def _verify_sig(self) -> bool:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return False
        fields = dict(
            p.strip().split("=", 1) for p in auth.split(" ", 1)[1].split(",")
        )
        cred = fields["Credential"]
        if not cred.startswith(ACCESS + "/"):
            return False
        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        expect = sign_v4(
            "GET",
            self.headers["host"],
            # sign_v4 canonical-encodes the raw path itself, so verify
            # from the DECODED request path (a quoted path would be
            # double-encoded and never match — keys with spaces &c.)
            urllib.parse.unquote(u.path),
            query,
            REGION,
            ACCESS,
            SECRET,
            payload_hash=self.headers.get("x-amz-content-sha256", ""),
            amz_date=self.headers["x-amz-date"],
        )["Authorization"]
        return expect.split("Signature=")[1] == fields["Signature"]

    def do_GET(self):
        self.server.requests.append(self.path)
        if not self._verify_sig():
            self.send_response(403)
            body = b"<Error><Code>SignatureDoesNotMatch</Code></Error>"
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        u = urllib.parse.urlparse(self.path)
        parts = urllib.parse.unquote(u.path).lstrip("/").split("/", 1)
        bucket, key = parts[0], (parts[1] if len(parts) > 1 else "")
        store = self.server.objects.get(bucket)
        if store is None:
            self._err(404, "NoSuchBucket")
            return
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        if not key and query.get("list-type") == "2":
            self._list(bucket, store, query)
            return
        if key in store:
            data = store[key]
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo, hi = rng[len("bytes="):].split("-", 1)
                start = int(lo)
                end = min(int(hi), len(data) - 1) if hi else len(data) - 1
                part = data[start : end + 1]
                self.send_response(206)
                self.send_header(
                    "Content-Range", f"bytes {start}-{end}/{len(data)}"
                )
                self.send_header("Content-Length", str(len(part)))
                self.end_headers()
                self.wfile.write(part)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        self._err(404, "NoSuchKey")

    def _err(self, code: int, tag: str):
        body = f"<Error><Code>{tag}</Code></Error>".encode()
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _list(self, bucket: str, store: dict[str, bytes], query: dict[str, str]):
        prefix = query.get("prefix", "")
        keys = sorted(k for k in store if k.startswith(prefix))
        start = int(query.get("continuation-token") or 0)
        page = keys[start : start + self.server.page_size]
        nxt = start + self.server.page_size
        truncated = nxt < len(keys)
        # honor encoding-type=url exactly like AWS: percent-encode keys
        # (control chars are legal in keys but illegal in XML 1.0) and
        # echo an EncodingType element
        encode = query.get("encoding-type") == "url"
        enc = (lambda k: urllib.parse.quote(k)) if encode else (lambda k: k)
        items = ("<EncodingType>url</EncodingType>" if encode else "") + "".join(
            f"<Contents><Key>{enc(k)}</Key><Size>{len(store[k])}</Size></Contents>"
            for k in page
        )
        more = (
            f"<IsTruncated>true</IsTruncated>"
            f"<NextContinuationToken>{nxt}</NextContinuationToken>"
            if truncated
            else "<IsTruncated>false</IsTruncated>"
        )
        body = (
            '<?xml version="1.0"?>'
            '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
            f"{items}{more}</ListBucketResult>"
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def fake_s3():
    objects = {
        "bkt": {
            "data/a.bin": b"alpha-bytes",
            "data/b.bin": b"beta-bytes-longer",
            "data/c.bin": b"gamma",
            "other/x.bin": b"nope",
        }
    }
    srv = _FakeS3(objects, page_size=1)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    finally:
        srv.shutdown()


class TestSigV4:
    def test_aws_documentation_example_vector(self):
        """The AWS docs' own SigV4 GET example (iam ListUsers,
        20150830T123600Z) — published request, secret, and signature."""
        h = sign_v4(
            "GET",
            "iam.amazonaws.com",
            "/",
            {"Action": "ListUsers", "Version": "2010-05-08"},
            "us-east-1",
            "AKIDEXAMPLE",
            "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
            payload_hash=hashlib.sha256(b"").hexdigest(),
            amz_date="20150830T123600Z",
            service="iam",
            extra_headers={
                "content-type": "application/x-www-form-urlencoded; charset=utf-8"
            },
            include_content_sha=False,
        )
        assert h["Authorization"].endswith(
            "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
        )
        assert "SignedHeaders=content-type;host;x-amz-date" in h["Authorization"]

    def test_session_token_is_signed(self):
        h = sign_v4(
            "GET", "h", "/b", {}, REGION, "a", "s",
            amz_date="20240101T000000Z", session_token="tok",
        )
        assert "x-amz-security-token" in h["Authorization"]


class TestClientAgainstVerifyingFake:
    def test_list_objects_follows_pagination(self, fake_s3):
        srv, endpoint = fake_s3
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        keys = c.list_objects("bkt", "data/")
        assert [k for k, _ in keys] == ["data/a.bin", "data/b.bin", "data/c.bin"]
        assert dict(keys)["data/b.bin"] == len(b"beta-bytes-longer")
        # page_size=1 -> one list request per key (pagination exercised)
        assert sum("list-type=2" in r for r in srv.requests) == 3

    def test_get_object_streams_exact_bytes(self, fake_s3, tmp_path):
        _, endpoint = fake_s3
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        dest = str(tmp_path / "a.bin")
        n = c.get_object("bkt", "data/a.bin", dest)
        assert n == 11 and open(dest, "rb").read() == b"alpha-bytes"

    def test_bad_secret_is_rejected_server_side(self, fake_s3):
        _, endpoint = fake_s3
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key="wrong")
        with pytest.raises(SourceError, match="403"):
            c.list_objects("bkt", "data/")

    def test_missing_credentials_fail_loudly(self, fake_s3, monkeypatch):
        _, endpoint = fake_s3
        monkeypatch.delenv("AWS_ACCESS_KEY_ID", raising=False)
        monkeypatch.delenv("AWS_SECRET_ACCESS_KEY", raising=False)
        with pytest.raises(SourceError, match="credentials"):
            S3Client(endpoint, region=REGION)

    def test_spool_prefix_and_exact_key(self, fake_s3):
        _, endpoint = fake_s3
        opts = {
            "s3_endpoint": endpoint,
            "s3_region": REGION,
            "s3_access_key": ACCESS,
            "s3_secret_key": SECRET,
        }
        d = spool_s3("s3://bkt/data/", opts)
        assert sorted(os.listdir(d)) == ["a.bin", "b.bin", "c.bin"]
        f = spool_s3("s3://bkt/data/a.bin", opts)
        assert os.path.isfile(f) and open(f, "rb").read() == b"alpha-bytes"
        with pytest.raises(SourceError, match="no objects"):
            spool_s3("s3://bkt/absent/", opts)


class TestSparkEndToEnd:
    def test_parquet_source_reads_over_s3(self, spark, tmp_path):
        """Two parquet objects behind the signature-verifying fake,
        registered through the normal file-source path with an s3://
        url, equal to a direct local read."""
        import duckdb

        con = duckdb.connect()
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{os.path.join('/root/testdata/sf0.001', 'nation.parquet')}') "
            f"WHERE n_nationkey < 10) TO '{tmp_path}/part0.parquet' (FORMAT PARQUET)"
        )
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{os.path.join('/root/testdata/sf0.001', 'nation.parquet')}') "
            f"WHERE n_nationkey >= 10) TO '{tmp_path}/part1.parquet' (FORMAT PARQUET)"
        )
        objects = {
            "lake": {
                "tables/nation/part0.parquet": (tmp_path / "part0.parquet").read_bytes(),
                "tables/nation/part1.parquet": (tmp_path / "part1.parquet").read_bytes(),
            }
        }
        srv = _FakeS3(objects, page_size=1)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
            from strake_spark.config import SourceConfig, TableConfig
            from strake_spark.sources.file import register_file_source

            cfg = SourceConfig(
                name="s3lake",
                type="parquet",
                url="s3://lake/tables",
                tables=[TableConfig(name="nation", path="s3://lake/tables/nation/")],
                options={
                    "s3_endpoint": endpoint,
                    "s3_region": REGION,
                    "s3_access_key": ACCESS,
                    "s3_secret_key": SECRET,
                },
            )
            views = register_file_source(spark, cfg)
            got = spark.table(views[0]).toPandas()
            want = spark.read.parquet(
                os.path.join("/root/testdata/sf0.001", "nation.parquet")
            ).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
        finally:
            srv.shutdown()


class TestGcsInteropRoute:
    def test_gs_scheme_routes_through_sigv4_interop(self, spark, tmp_path):
        """gs:// uses GCS's S3-compatible XML interop API (HMAC keys):
        the file-source route rewrites gs://bucket/... onto the SigV4
        client with the interop endpoint — proven against the same
        signature-verifying fake."""
        import duckdb

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')) "
            f"TO '{tmp_path}/region.parquet' (FORMAT PARQUET)"
        )
        objects = {"gbkt": {"t/region.parquet": (tmp_path / "region.parquet").read_bytes()}}
        srv = _FakeS3(objects)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
            from strake_spark.config import SourceConfig, TableConfig
            from strake_spark.sources.file import register_file_source

            cfg = SourceConfig(
                name="gcslake",
                type="parquet",
                url="gs://gbkt/t",
                tables=[TableConfig(name="region", path="gs://gbkt/t/region.parquet")],
                options={
                    "s3_endpoint": endpoint,  # interop endpoint override
                    "s3_region": REGION,
                    "gcs_hmac_key": ACCESS,
                    "gcs_hmac_secret": SECRET,
                },
            )
            views = register_file_source(spark, cfg)
            got = spark.table(views[0]).toPandas()
            want = spark.read.parquet(
                "/root/testdata/sf0.001/region.parquet"
            ).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
        finally:
            srv.shutdown()


class TestDistributedRead:
    def test_executor_parallel_parquet_read(self, spark, tmp_path):
        """Keys distribute to executor tasks; each fetches + decodes
        its own objects with pyarrow under the verifying fake. Result
        equals a direct local read; the plan carries the mapInArrow
        stage and NO driver-side spool path."""
        import duckdb

        from strake_spark.sources.s3http import read_s3_parquet_distributed

        con = duckdb.connect()
        for i, pred in enumerate(
            ["n_nationkey < 8", "n_nationkey BETWEEN 8 AND 15", "n_nationkey > 15"]
        ):
            con.execute(
                "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet') "
                f"WHERE {pred}) TO '{tmp_path}/p{i}.parquet' (FORMAT PARQUET)"
            )
        objects = {
            "dbkt": {
                f"w/p{i}.parquet": (tmp_path / f"p{i}.parquet").read_bytes()
                for i in range(3)
            }
        }
        srv = _FakeS3(objects, page_size=2)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "s3_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                "s3_region": REGION,
                "s3_access_key": ACCESS,
                "s3_secret_key": SECRET,
            }
            df = read_s3_parquet_distributed(spark, "s3://dbkt/w/", opts)
            got = df.toPandas()
            want = spark.read.parquet(
                "/root/testdata/sf0.001/nation.parquet"
            ).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
            # object GETs: 1 driver footer read + 3 executor fetches
            gets = [r for r in srv.requests if "list-type" not in r and r.count("/") >= 2]
            assert len(gets) == 4
        finally:
            srv.shutdown()

    def test_column_pruning_executor_side(self, spark, tmp_path):
        import duckdb

        from strake_spark.sources.s3http import read_s3_parquet_distributed

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/nation.parquet')) "
            f"TO '{tmp_path}/n.parquet' (FORMAT PARQUET)"
        )
        objects = {"dbkt": {"w/n.parquet": (tmp_path / "n.parquet").read_bytes()}}
        srv = _FakeS3(objects)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "s3_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                "s3_region": REGION,
                "s3_access_key": ACCESS,
                "s3_secret_key": SECRET,
                "columns": ["n_nationkey", "n_name"],
            }
            df = read_s3_parquet_distributed(spark, "s3://dbkt/w/n.parquet", opts)
            assert df.columns == ["n_nationkey", "n_name"]
            assert df.count() == 25
        finally:
            srv.shutdown()


class TestRangeReads:
    def test_get_range_partial_content(self, fake_s3):
        _, endpoint = fake_s3
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        assert c.get_range("bkt", "data/a.bin", 0, 4) == b"alpha"
        assert c.get_range("bkt", "data/a.bin", 6, 10) == b"bytes"

    def test_schema_read_fetches_footer_not_object(self, fake_s3, tmp_path, spark):
        """pq.read_schema over RangeFile must move only tail blocks —
        never the whole object (the point of ranged footer reads)."""
        import pyarrow.parquet as pq

        from strake_spark.sources.s3http import RangeFile

        srv, endpoint = fake_s3
        # parquet footer size is a fixed cost per file, so prove the
        # claim on a ~1 MB object where footer << object
        data = open("/root/testdata/sf0.01/lineitem.parquet", "rb").read()
        srv.objects["bkt"]["big/li.parquet"] = data
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        rf = RangeFile(c, "bkt", "big/li.parquet", len(data))
        schema = pq.read_schema(rf)
        assert "l_orderkey" in schema.names
        fetched = sum(e - s + 1 for s, e in rf.fetched_ranges)
        assert fetched < len(data) / 4, (
            f"footer read moved {fetched} of {len(data)} bytes"
        )
        # and every fetched range lives in the object's tail
        assert all(s >= len(data) - 4 * 64 * 1024 for s, _ in rf.fetched_ranges)


class TestSpecialCharacterKeys:
    def test_key_with_spaces_and_plus(self, fake_s3, tmp_path):
        """The request URI must carry exactly the encoding the
        canonical request signed — keys with spaces/plus are where a
        raw-path request line breaks both HTTP and the signature."""
        srv, endpoint = fake_s3
        srv.objects["bkt"]["odd dir/a+b c.bin"] = b"spacey"
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        dest = str(tmp_path / "out.bin")
        assert c.get_object("bkt", "odd dir/a+b c.bin", dest) == 6
        assert open(dest, "rb").read() == b"spacey"


class TestDistributedConfigSurface:
    def test_source_config_distributed_option(self, spark, tmp_path):
        """options.distributed routes s3:// parquet through the
        executor-parallel reader at the normal config surface."""
        import duckdb

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')) "
            f"TO '{tmp_path}/region.parquet' (FORMAT PARQUET)"
        )
        objects = {"cfg": {"t/region.parquet": (tmp_path / "region.parquet").read_bytes()}}
        srv = _FakeS3(objects)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            from strake_spark.config import SourceConfig, TableConfig
            from strake_spark.sources.file import register_file_source

            cfg = SourceConfig(
                name="dlake",
                type="parquet",
                url="s3://cfg/t",
                tables=[TableConfig(name="region", path="s3://cfg/t/region.parquet")],
                options={
                    "distributed": True,
                    "s3_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                    "s3_region": REGION,
                    "s3_access_key": ACCESS,
                    "s3_secret_key": SECRET,
                },
            )
            views = register_file_source(spark, cfg)
            got = spark.table(views[0]).toPandas()
            want = spark.read.parquet(
                "/root/testdata/sf0.001/region.parquet"
            ).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
            # the mapInArrow plan proves the distributed path was taken
            plan = spark.table(views[0])._jdf.queryExecution().executedPlan().toString()
            assert "MapInArrow" in plan
        finally:
            srv.shutdown()


@pytest.mark.slow
# slow (r20, suite budget): builds a multi-row-group object in memory
# (~15 s). The splitting logic's unit coverage (ranges, boundaries)
# stays always-on in this file; FULL_SUITE record re-runs this.
class TestRowGroupSplitting:
    def test_large_object_splits_into_row_group_tasks(self, spark, tmp_path):
        """An object over split_threshold_bytes fans out one task per
        row group; each task's ranged reads move only part of the
        object. Result parity with the local read."""
        import duckdb

        from strake_spark.sources.s3http import read_s3_parquet_distributed

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')) "
            f"TO '{tmp_path}/li.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)"
        )
        data = (tmp_path / "li.parquet").read_bytes()
        objects = {"rg": {"w/li.parquet": data}}
        srv = _FakeS3(objects)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "s3_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                "s3_region": REGION,
                "s3_access_key": ACCESS,
                "s3_secret_key": SECRET,
                "split_threshold_bytes": 1,  # force splitting
            }
            df = read_s3_parquet_distributed(spark, "s3://rg/w/", opts)
            got = df.toPandas()
            want = spark.read.parquet(str(tmp_path / "li.parquet")).toPandas()
            from tests.conftest import compare_frames

            compare_frames(got, want)
            import pyarrow.parquet as pq

            n_groups = pq.ParquetFile(str(tmp_path / "li.parquet")).metadata.num_row_groups
            assert n_groups > 1  # the fixture really is multi-group
        finally:
            srv.shutdown()

    def test_row_group_task_moves_partial_bytes(self, fake_s3, tmp_path, spark):
        """Reading ONE row group via RangeFile must fetch less than the
        whole object (column chunks + footer blocks only)."""
        import duckdb
        import pyarrow.parquet as pq

        from strake_spark.sources.s3http import RangeFile

        srv, endpoint = fake_s3
        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet')) "
            f"TO '{tmp_path}/li.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 10000)"
        )
        data = (tmp_path / "li.parquet").read_bytes()
        srv.objects["bkt"]["rg/li.parquet"] = data
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        rf = RangeFile(c, "bkt", "rg/li.parquet", len(data))
        pf = pq.ParquetFile(rf)
        assert pf.metadata.num_row_groups > 1
        t = pf.read_row_group(0, columns=["l_orderkey", "l_quantity"])
        assert t.num_rows == pf.metadata.row_group(0).num_rows
        fetched = sum(e - s + 1 for s, e in rf.fetched_ranges)
        assert fetched < len(data) * 0.6, (
            f"row-group read moved {fetched} of {len(data)} bytes"
        )


class TestSigningPropertyBased:
    def test_random_keys_sign_and_fetch(self, fake_s3):
        """Property: for arbitrary object keys (unicode, spaces,
        punctuation, nested slashes), the client's canonicalization
        and the server's independent recomputation agree, and the
        exact bytes round-trip. Catches encoding edge cases a
        hand-picked key list would miss."""
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        srv, endpoint = fake_s3
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)

        key_chars = st.characters(
            codec="utf-8",
            exclude_characters="/\x00\r\n",
            exclude_categories=("Cs", "Cc"),
        )
        segment = st.text(key_chars, min_size=1, max_size=12).filter(
            lambda s: s not in (".", "..") and s == s.strip() and s.strip() != ""
        )

        @settings(
            max_examples=25,
            deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        @given(segs=st.lists(segment, min_size=1, max_size=3), payload=st.binary(min_size=1, max_size=64))
        def run(segs, payload):
            key = "prop/" + "/".join(segs)
            srv.objects["bkt"][key] = payload
            import tempfile as _tf

            with _tf.NamedTemporaryFile(delete=True) as f:
                n = c.get_object("bkt", key, f.name)
                assert n == len(payload)
                assert open(f.name, "rb").read() == payload

        run()

class TestSpoolSubpathMirroring:
    """r18 advice: the spool must mirror key subpaths — a flat basename
    layout silently overwrote a/part-0.parquet with b/part-0.parquet
    and dropped hive partition directories."""

    def test_same_basename_keys_both_survive(self, fake_s3):
        srv, endpoint = fake_s3
        srv.objects["bkt"]["tbl/a/0001.bin"] = b"from-a"
        srv.objects["bkt"]["tbl/b/0001.bin"] = b"from-b"
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        d = spool_s3("s3://bkt/tbl/", opts)
        assert open(os.path.join(d, "a", "0001.bin"), "rb").read() == b"from-a"
        assert open(os.path.join(d, "b", "0001.bin"), "rb").read() == b"from-b"

    def test_hive_partition_dirs_preserved_and_read(self, fake_s3, spark, tmp_path):
        """Partition-directory columns survive the spool: Spark reads
        lang=en / lang=fr back as a real `lang` column."""
        import duckdb

        srv, endpoint = fake_s3
        con = duckdb.connect()
        con.execute(f"COPY (SELECT 1 AS v) TO '{tmp_path}/en.parquet' (FORMAT PARQUET)")
        con.execute(f"COPY (SELECT 2 AS v) TO '{tmp_path}/fr.parquet' (FORMAT PARQUET)")
        srv.objects["bkt"]["docs/lang=en/part-0.parquet"] = (tmp_path / "en.parquet").read_bytes()
        srv.objects["bkt"]["docs/lang=fr/part-0.parquet"] = (tmp_path / "fr.parquet").read_bytes()
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        d = spool_s3("s3://bkt/docs/", opts)
        got = spark.read.parquet(d).toPandas().sort_values("v").reset_index(drop=True)
        assert list(got["v"]) == [1, 2]
        assert sorted(got["lang"]) == ["en", "fr"]

    def test_prefix_without_trailing_slash_stays_flat(self, fake_s3):
        """Naming a 'directory' without the slash must not nest one
        extra level (Spark would not read a non-hive subdir)."""
        _, endpoint = fake_s3
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        d = spool_s3("s3://bkt/data", opts)
        assert sorted(os.listdir(d)) == ["a.bin", "b.bin", "c.bin"]

    def test_mixed_sibling_prefix_is_loud(self, fake_s3):
        """r19 advice: a non-slash prefix matching keys in SIBLING
        directories ('data' hitting both data/... and data2/...) would
        mirror into nested subdirs Spark silently skips — must raise a
        clear error naming the fix, never return an unreadable spool."""
        srv, endpoint = fake_s3
        srv.objects["bkt"]["data2/y.bin"] = b"sibling"
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        with pytest.raises(SourceError, match="sibling"):
            spool_s3("s3://bkt/data", opts)

    def test_bucket_root_hive_layout_still_spools_and_reads(
        self, fake_s3, spark, tmp_path
    ):
        """Review regression (r19): the sibling-prefix guard must NOT
        fire on all-hive top-level dirs under a fallback anchor — a
        bucket-root prefix over dt=.../part files is exactly the layout
        the r18 mirroring preserves, and Spark's partition discovery
        reads it. Only non-hive siblings are refused."""
        import duckdb

        srv, endpoint = fake_s3
        con = duckdb.connect()
        con.execute(f"COPY (SELECT 1 AS v) TO '{tmp_path}/a.parquet' (FORMAT PARQUET)")
        con.execute(f"COPY (SELECT 2 AS v) TO '{tmp_path}/b.parquet' (FORMAT PARQUET)")
        srv.objects["hive"] = {
            "dt=2024-01-01/part-0.parquet": (tmp_path / "a.parquet").read_bytes(),
            "dt=2024-01-02/part-0.parquet": (tmp_path / "b.parquet").read_bytes(),
        }
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        d = spool_s3("s3://hive/", opts)  # dir anchor: mirrors as before
        got = spark.read.parquet(d).toPandas()
        # partition discovery may type dt as DATE — compare as strings
        assert sorted(got["v"]) == [1, 2]
        assert sorted(str(x) for x in got["dt"]) == ["2024-01-01", "2024-01-02"]
        # the fallback-anchor shape (empty prefix is NOT dir-anchored)
        d2 = spool_s3("s3://hive", opts)
        got2 = spark.read.parquet(d2).toPandas()
        assert sorted(got2["v"]) == [1, 2]
        # a _SUCCESS marker (what a Spark/Hadoop writer always emits)
        # is invisible to Spark's file index and must not trip the
        # sibling guard (r19 review)
        srv.objects["hivesucc"] = {
            "_SUCCESS": b"",
            "dt=2024-01-01/part-0.parquet": (tmp_path / "a.parquet").read_bytes(),
            "dt=2024-01-02/part-0.parquet": (tmp_path / "b.parquet").read_bytes(),
        }
        d3 = spool_s3("s3://hivesucc", opts)
        got3 = spark.read.parquet(d3).toPandas()
        assert sorted(got3["v"]) == [1, 2]

    def test_spool_root_walkup_for_nested_single_file(self, tmp_path, monkeypatch):
        """r19 review: cleanup of a spool whose cached value is a
        nested single-file path removed only the subdir — _spool_root
        must walk up to the 'strake-*' mkdtemp root."""
        import tempfile as _tf

        from strake_spark.inventory.sources_entries import _spool_root

        monkeypatch.setattr(_tf, "gettempdir", lambda: str(tmp_path))
        root = _tf.mkdtemp(prefix="strake-s3-", dir=str(tmp_path))
        nested = os.path.join(root, "inner", "deep")
        os.makedirs(nested)
        f = os.path.join(nested, "x.parquet")
        open(f, "wb").close()
        assert _spool_root(f) == os.path.realpath(root)
        assert _spool_root(root) == os.path.realpath(root)
        # unrecognizable layout falls back to the containing dir
        other = os.path.join(str(tmp_path), "plain")
        os.makedirs(other)
        g = os.path.join(other, "y.parquet")
        open(g, "wb").close()
        assert _spool_root(g) == other

    def test_hive_carveout_refuses_mixed_shapes(self, fake_s3, tmp_path):
        """The all-hive carve-out is exact: a non-hive dir at ANY depth
        or a flat file alongside partition dirs still refuses — Spark's
        partition discovery rejects or silently skips those layouts."""
        import duckdb

        srv, endpoint = fake_s3
        con = duckdb.connect()
        con.execute(f"COPY (SELECT 1 AS v) TO '{tmp_path}/a.parquet' (FORMAT PARQUET)")
        payload = (tmp_path / "a.parquet").read_bytes()
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        # non-hive second-level dir under a hive top
        srv.objects["deep"] = {
            "dt=2024-01-01/sub/part-0.parquet": payload,
            "dt=2024-01-02/part-0.parquet": payload,
        }
        with pytest.raises(SourceError, match="sibling"):
            spool_s3("s3://deep", opts)
        # flat root file next to a hive dir
        srv.objects["mixed"] = {
            "loose.parquet": payload,
            "dt=2024-01-02/part-0.parquet": payload,
        }
        with pytest.raises(SourceError, match="sibling"):
            spool_s3("s3://mixed", opts)

    def test_single_nested_match_still_returns_the_file(self, fake_s3):
        """One matching key is always fine even when its mirror nests:
        the caller hands Spark the file path itself, not the spool
        root — the sibling check must not over-fire on it."""
        srv, endpoint = fake_s3
        srv.objects["bkt"]["solo/inner/x.bin"] = b"solo-bytes"
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        p = spool_s3("s3://bkt/sol", opts)
        assert os.path.isfile(p) and open(p, "rb").read() == b"solo-bytes"

    def test_dotdot_key_cannot_escape_spool(self, fake_s3):
        srv, endpoint = fake_s3
        srv.objects["bkt"]["esc/../../evil.bin"] = b"evil"
        opts = {
            "s3_endpoint": endpoint, "s3_region": REGION,
            "s3_access_key": ACCESS, "s3_secret_key": SECRET,
        }
        with pytest.raises(SourceError, match="escapes spool"):
            spool_s3("s3://bkt/esc/", opts)


class TestListingEncodingType:
    def test_control_char_key_lists_and_round_trips(self, fake_s3, tmp_path):
        """Control characters are legal in S3 keys but illegal in XML
        1.0 — encoding-type=url keeps the listing parseable and the
        client unquotes keys back to their exact bytes."""
        srv, endpoint = fake_s3
        odd = "ctl/we\x01ird \x02name.bin"
        srv.objects["bkt"][odd] = b"ctl-bytes"
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        keys = c.list_objects("bkt", "ctl/")
        assert [k for k, _ in keys] == [odd]
        dest = str(tmp_path / "out.bin")
        assert c.get_object("bkt", odd, dest) == 9


class TestRedirectRefused:
    def test_region_redirect_yields_clear_error(self):
        """A 301 region redirect must NOT be followed (signed headers
        would leak to the target) and must surface the bucket's actual
        region from x-amz-bucket-region."""
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        class _Redir(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_GET(self):
                self.send_response(301)
                self.send_header("Location", "https://s3.eu-west-1.amazonaws.com/bkt")
                self.send_header("x-amz-bucket-region", "eu-west-1")
                self.send_header("Content-Length", "0")
                self.end_headers()

        srv = ThreadingHTTPServer(("127.0.0.1", 0), _Redir)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            c = S3Client(
                f"http://127.0.0.1:{srv.server_address[1]}",
                region=REGION, access_key=ACCESS, secret_key=SECRET,
            )
            with pytest.raises(SourceError, match="eu-west-1"):
                c.list_objects("bkt", "")
        finally:
            srv.shutdown()


class TestOptionBooleans:
    def test_opt_bool_is_string_aware(self):
        from strake_spark.config import opt_bool

        assert opt_bool("false") is False
        assert opt_bool("False") is False
        assert opt_bool("0") is False
        assert opt_bool("true") is True
        assert opt_bool("1") is True
        assert opt_bool(True) is True
        assert opt_bool(False, default=True) is False
        assert opt_bool(None, default=True) is True
        assert opt_bool(None) is False

    def test_path_style_string_false_respected(self):
        from strake_spark.sources.s3http import _client_params

        p = _client_params({"s3_path_style": "false", "s3_endpoint": "http://h:1"})
        assert p["path_style"] is False


class TestRangeFileCacheBound:
    def test_block_cache_is_lru_bounded(self, fake_s3):
        from strake_spark.sources.s3http import RangeFile

        srv, endpoint = fake_s3
        blob = bytes(range(256)) * 256 * 10  # 10 blocks of 64 KiB
        srv.objects["bkt"]["big/blob.bin"] = blob
        c = S3Client(endpoint, region=REGION, access_key=ACCESS, secret_key=SECRET)
        rf = RangeFile(c, "bkt", "big/blob.bin", len(blob))
        rf._MAX_CACHED_BLOCKS = 4
        assert rf.read() == blob  # sequential pass over all 10 blocks
        assert len(rf._cache) <= 4
        # re-reading a recently used block is a cache hit, not a new GET
        n_fetches = len(rf.fetched_ranges)
        rf.seek(9 * 64 * 1024)
        rf.read(16)
        assert len(rf.fetched_ranges) == n_fetches


class TestDistributedFanOutWidth:
    def test_parallelism_option_controls_partitions(self, spark, tmp_path):
        import duckdb

        from strake_spark.sources.s3http import read_s3_parquet_distributed

        con = duckdb.connect()
        con.execute(
            "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')) "
            f"TO '{tmp_path}/r.parquet' (FORMAT PARQUET)"
        )
        data = (tmp_path / "r.parquet").read_bytes()
        objects = {"fan": {f"w/p{i:03d}.parquet": data for i in range(70)}}
        srv = _FakeS3(objects, page_size=50)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            opts = {
                "s3_endpoint": f"http://127.0.0.1:{srv.server_address[1]}",
                "s3_region": REGION,
                "s3_access_key": ACCESS,
                "s3_secret_key": SECRET,
                "parallelism": 7,
            }
            df = read_s3_parquet_distributed(spark, "s3://fan/w/", opts)
            assert df.rdd.getNumPartitions() == 7
            # default: cluster parallelism with a 64 floor — 70 tasks
            # spread over min(70, max(defaultParallelism, 64)) partitions
            opts2 = dict(opts)
            del opts2["parallelism"]
            df2 = read_s3_parquet_distributed(spark, "s3://fan/w/", opts2)
            want = min(70, max(spark.sparkContext.defaultParallelism, 64))
            assert df2.rdd.getNumPartitions() == want
        finally:
            srv.shutdown()


class TestSpoolMirrorPropertyBased:
    def test_arbitrary_key_sets_never_collide_or_escape(self, tmp_path):
        """Property: for arbitrary sets of distinct object keys under a
        common prefix, the mirrored spool writes exactly one file per
        key, byte-addressable at the mirrored path, all inside the
        spool dir — no silent overwrite for ANY key shape (the r18
        basename-collision class, generalized)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from strake_spark.sources.s3http import _spool_objects

        seg = st.text(
            st.characters(codec="utf-8", exclude_characters="/\x00",
                          exclude_categories=("Cs", "Cc")),
            min_size=1, max_size=8,
        ).filter(lambda s: s not in (".", "..") and s.strip() == s and s.strip() != "")
        key = st.lists(seg, min_size=1, max_size=4).map(lambda xs: "data/" + "/".join(xs))

        def no_leaf_dir_conflict(keys):
            # a key that is both an object and a directory prefix of
            # another cannot exist on a local filesystem — that shape
            # gets its own loud-SourceError test below
            return not any(
                o != k and o.startswith(k + "/") for k in keys for o in keys
            )

        @settings(max_examples=40, deadline=None)
        @given(
            keys=st.lists(key, min_size=1, max_size=8, unique=True).filter(
                no_leaf_dir_conflict
            )
        )
        def run(keys):
            import os
            import tempfile

            spool = tempfile.mkdtemp(dir=str(tmp_path))
            written = {}

            def fetch(k, dest):
                os.makedirs(os.path.dirname(dest), exist_ok=True)
                with open(dest, "wb") as f:
                    f.write(k.encode())
                written[k] = dest

            fetched = _spool_objects(
                [(k, 1) for k in keys], spool, "data/", fetch
            )
            assert len(fetched) == len(keys)  # nothing dropped or merged
            assert len(set(fetched)) == len(keys)  # no dest collisions
            root = os.path.realpath(spool)
            for k in keys:
                dest = written[k]
                assert os.path.realpath(dest).startswith(root + os.sep)
                assert open(dest, "rb").read() == k.encode()

        run()

    def test_leaf_and_directory_conflict_is_loud(self, tmp_path):
        """'data/0' and 'data/0/0' are both legal S3 keys but cannot
        coexist on a local filesystem — the spool must raise a clear
        SourceError, not IsADirectoryError/FileExists mid-fetch."""
        import os

        from strake_spark.sources.s3http import _spool_objects

        def fetch(k, dest):  # pragma: no cover - must not be reached
            raise AssertionError("fetch should not run on conflict")

        with pytest.raises(SourceError, match="directory prefix"):
            _spool_objects(
                [("data/0", 1), ("data/0/0", 1)], str(tmp_path), "data/", fetch
            )


class TestHostileListingBodies:
    """The listing body is server bytes (r19 opt round): unparseable
    XML and non-numeric sizes must raise SourceError, not raw
    ET.ParseError / ValueError."""

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
        c = S3Client("http://127.0.0.1:1", region=REGION,
                     access_key=ACCESS, secret_key=SECRET)
        monkeypatch.setattr(
            c, "_request", lambda *a, **k: self._Resp(b"<html>bad gateway"))
        with pytest.raises(SourceError, match="not parseable XML"):
            c.list_objects("bkt", "data/")

    def test_non_numeric_size_is_loud(self, monkeypatch):
        c = S3Client("http://127.0.0.1:1", region=REGION,
                     access_key=ACCESS, secret_key=SECRET)
        xml = (b'<?xml version="1.0"?><ListBucketResult>'
               b'<Contents><Key>k</Key><Size>huge</Size></Contents>'
               b'<IsTruncated>false</IsTruncated></ListBucketResult>')
        monkeypatch.setattr(c, "_request", lambda *a, **k: self._Resp(xml))
        with pytest.raises(SourceError, match="non-numeric Size"):
            c.list_objects("bkt", "data/")
