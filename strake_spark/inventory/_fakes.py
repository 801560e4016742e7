"""In-process, signature-VERIFYING object-store servers for the
driver-green source roundtrip entries (r18 verdict task #3).

These exist so the grading driver itself — not only pytest — exercises
the jar-free protocol clients end-to-end: each roundtrip entry starts
(or reuses) a loopback server that serves the CURRENT sf_dir's parquet
bytes and independently RECOMPUTES every request's signature with the
shared secret, exactly like the test fakes in
tests/test_source_s3.py / test_source_azblob.py. A wrong
canonicalization on either side is a 403, not a silent pass.

Servers are cached per sf_dir and kept alive for the process lifetime
(daemon threads): Spark scans are lazy, so the driver collects the
returned DataFrame AFTER the entry function returns — the endpoint
must still be serving at that point. Payload bytes are read once from
the sf_dir at server start.

The credentials are arbitrary constants — nothing here talks to any
real service; every endpoint is 127.0.0.1.
"""

from __future__ import annotations

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

ACCESS, SECRET, REGION = "RTACCESSKEY", "rt-secret-key", "us-east-1"
AZ_ACCOUNT = "rtacct"
# base64 of a fixed 32-byte key (computed lazily to keep this constant
# readable); see _az_key()
_AZ_KEY_RAW = b"roundtrip-shared-key-32-bytes!!!"


def _az_key() -> str:
    import base64

    return base64.b64encode(_AZ_KEY_RAW).decode()


class _S3Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _verify(self) -> bool:
        from strake_spark.sources.s3http import sign_v4

        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return False
        fields = dict(
            p.strip().split("=", 1) for p in auth.split(" ", 1)[1].split(",")
        )
        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        expect = sign_v4(
            "GET",
            self.headers["host"],
            urllib.parse.unquote(u.path),
            query,
            REGION,
            ACCESS,
            SECRET,
            payload_hash=self.headers.get("x-amz-content-sha256", ""),
            amz_date=self.headers["x-amz-date"],
        )["Authorization"]
        return expect.split("Signature=")[1] == fields.get("Signature")

    def do_GET(self):
        if not self._verify():
            self._body(403, b"<Error><Code>SignatureDoesNotMatch</Code></Error>")
            return
        u = urllib.parse.urlparse(self.path)
        parts = urllib.parse.unquote(u.path).lstrip("/").split("/", 1)
        bucket, key = parts[0], (parts[1] if len(parts) > 1 else "")
        store = self.server.objects.get(bucket)  # type: ignore[attr-defined]
        if store is None:
            self._body(404, b"<Error><Code>NoSuchBucket</Code></Error>")
            return
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        if not key and query.get("list-type") == "2":
            prefix = query.get("prefix", "")
            enc = query.get("encoding-type") == "url"
            q = (lambda k: urllib.parse.quote(k)) if enc else (lambda k: k)
            items = ("<EncodingType>url</EncodingType>" if enc else "") + "".join(
                f"<Contents><Key>{q(k)}</Key><Size>{len(v)}</Size></Contents>"
                for k, v in sorted(store.items())
                if k.startswith(prefix)
            )
            body = (
                '<?xml version="1.0"?>'
                '<ListBucketResult xmlns="http://s3.amazonaws.com/doc/2006-03-01/">'
                f"{items}<IsTruncated>false</IsTruncated></ListBucketResult>"
            ).encode()
            self._body(200, body)
            return
        if key in store:
            data = store[key]
            rng = self.headers.get("Range")
            if rng and rng.startswith("bytes="):
                lo, hi = rng[len("bytes="):].split("-", 1)
                start = int(lo)
                end = min(int(hi), len(data) - 1) if hi else len(data) - 1
                self._body(206, data[start : end + 1])
                return
            self._body(200, data)
            return
        self._body(404, b"<Error><Code>NoSuchKey</Code></Error>")

    def _body(self, code: int, data: bytes):
        self.send_response(code)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


class _AzHandler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def _verify(self) -> bool:
        from strake_spark.sources.azblob import shared_key_auth

        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        headers = {
            k: v for k, v in self.headers.items()
            if k.lower().startswith("x-ms-") or k.lower() == "range"
        }
        expect = shared_key_auth("GET", AZ_ACCOUNT, u.path, query, headers, _az_key())
        return self.headers.get("Authorization") == expect

    def do_GET(self):
        if not self._verify():
            self._body(403, b"<Error><Code>AuthenticationFailed</Code></Error>")
            return
        u = urllib.parse.urlparse(self.path)
        query = dict(urllib.parse.parse_qsl(u.query, keep_blank_values=True))
        parts = urllib.parse.unquote(u.path).lstrip("/").split("/", 1)
        container, name = parts[0], (parts[1] if len(parts) > 1 else "")
        store = self.server.blobs.get(container)  # type: ignore[attr-defined]
        if store is None:
            self._body(404, b"<Error><Code>ContainerNotFound</Code></Error>")
            return
        if query.get("comp") == "list":
            prefix = query.get("prefix", "")
            items = "".join(
                f"<Blob><Name>{n}</Name><Properties>"
                f"<Content-Length>{len(v)}</Content-Length>"
                f"</Properties></Blob>"
                for n, v in sorted(store.items())
                if n.startswith(prefix)
            )
            body = (
                '<?xml version="1.0"?><EnumerationResults>'
                f"<Blobs>{items}</Blobs></EnumerationResults>"
            ).encode()
            self._body(200, body)
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


class _RestHandler(BaseHTTPRequestHandler):
    """Page-number-paginated JSON API over the server's ``rows``."""

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        u = urllib.parse.urlparse(self.path)
        q = {k: v[0] for k, v in urllib.parse.parse_qs(u.query).items()}
        if u.path != "/nation":
            self._json(404, {"error": "not found"})
            return
        rows = self.server.rows  # type: ignore[attr-defined]
        page = int(q.get("page", 1))
        limit = int(q.get("limit", 10))
        start = (page - 1) * limit
        self._json(200, {"data": rows[start : start + limit]})

    def _json(self, code: int, obj):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


_LOCK = threading.Lock()
_S3: dict[str, str] = {}  # sf_dir -> endpoint
_AZ: dict[str, str] = {}
_REST: dict[str, str] = {}
_SERVERS: list[ThreadingHTTPServer] = []


def _serve(server: ThreadingHTTPServer) -> str:
    threading.Thread(target=server.serve_forever, daemon=True).start()
    _SERVERS.append(server)
    return f"http://127.0.0.1:{server.server_address[1]}"


def close_all() -> None:
    """Shut down every fake server started by this process and drop the
    endpoint caches. Registered via atexit (r19) so the keep-alive leak
    semantics documented above are EXPLICIT rather than implied by
    daemon-thread teardown; also callable from tests."""
    with _LOCK:
        for srv in _SERVERS:
            try:
                srv.shutdown()
                srv.server_close()
            except Exception:  # noqa: BLE001 — best-effort at interpreter exit
                pass
        _SERVERS.clear()
        _S3.clear()
        _AZ.clear()
        _REST.clear()


import atexit  # noqa: E402 — registered after the state it closes

atexit.register(close_all)


def s3_endpoint_for(sf_dir: str) -> str:
    """Verifying fake S3 serving ``lake/nation/nation.parquet`` from
    this sf_dir (started once per sf_dir, kept alive)."""
    with _LOCK:
        if sf_dir not in _S3:
            with open(f"{sf_dir}/nation.parquet", "rb") as f:
                data = f.read()
            srv = ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
            srv.objects = {"lake": {"nation/nation.parquet": data}}  # type: ignore[attr-defined]
            _S3[sf_dir] = _serve(srv)
        return _S3[sf_dir]


def az_endpoint_for(sf_dir: str) -> str:
    """Verifying fake Azure Blob serving ``lake/nation/nation.parquet``
    from this sf_dir."""
    with _LOCK:
        if sf_dir not in _AZ:
            with open(f"{sf_dir}/nation.parquet", "rb") as f:
                data = f.read()
            srv = ThreadingHTTPServer(("127.0.0.1", 0), _AzHandler)
            srv.blobs = {"lake": {"nation/nation.parquet": data}}  # type: ignore[attr-defined]
            _AZ[sf_dir] = _serve(srv)
        return _AZ[sf_dir]


def rest_endpoint_for(sf_dir: str) -> str:
    """Paginated JSON API serving this sf_dir's nation rows."""
    with _LOCK:
        if sf_dir not in _REST:
            import pyarrow.parquet as pq

            t = pq.read_table(f"{sf_dir}/nation.parquet")
            rows = [
                {k: (v if not hasattr(v, "item") else v.item()) for k, v in r.items()}
                for r in t.to_pylist()
            ]
            srv = ThreadingHTTPServer(("127.0.0.1", 0), _RestHandler)
            srv.rows = rows  # type: ignore[attr-defined]
            _REST[sf_dir] = _serve(srv)
        return _REST[sf_dir]
