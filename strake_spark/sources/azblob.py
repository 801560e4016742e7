"""Jar-free Azure Blob Storage reader: SharedKey auth over stdlib HTTP.

Companion to sources/s3http.py (same r17 goal — the reference reads
s3/gs/az via OpenDAL, crates/connectors/src/sources/file.rs:124-207,
and this container ships no hadoop-azure jars). Implements the public
SharedKey authorization scheme (the documented string-to-sign:
verb + 12 standard headers + canonicalized x-ms-* headers +
canonicalized resource, HMAC-SHA256 under the base64 account key)
plus List Blobs (NextMarker pagination) and Get Blob.

Scale split (same contract as s3http): ``abfss://`` stays the
executor-side splittable path via the fs.azure.* plumbing when the
hadoop-azure jars are deployed; ``az://container/prefix`` routes HERE
— a driver-side whole-object spool for small/medium reads and
jar-less environments. ``azure_endpoint`` overrides the account host
for Azurite/fakes.
"""

from __future__ import annotations

import base64
import datetime as _dt
import hashlib
import hmac
import os
import tempfile
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

from strake_spark.errors import SourceError

_API_VERSION = "2021-08-06"


def shared_key_auth(
    method: str,
    account: str,
    path: str,
    query: dict[str, str],
    headers: dict[str, str],
    account_key_b64: str,
) -> str:
    """Authorization header value for one request (public SharedKey
    string-to-sign, storage-services version 2015-02-21+ — empty
    Content-Length when the body is empty)."""
    std = [
        "Content-Encoding", "Content-Language", "Content-Length",
        "Content-MD5", "Content-Type", "Date", "If-Modified-Since",
        "If-Match", "If-None-Match", "If-Unmodified-Since", "Range",
    ]
    lower = {k.lower(): v for k, v in headers.items()}
    std_part = "\n".join(lower.get(h.lower(), "") for h in std)
    xms = sorted(
        (k, v.strip()) for k, v in lower.items() if k.startswith("x-ms-")
    )
    canon_headers = "".join(f"{k}:{v}\n" for k, v in xms)
    canon_resource = f"/{account}{path}"
    for k in sorted(query):
        canon_resource += f"\n{k.lower()}:{query[k]}"
    string_to_sign = f"{method}\n{std_part}\n{canon_headers}{canon_resource}"
    key = base64.b64decode(account_key_b64)
    sig = base64.b64encode(
        hmac.new(key, string_to_sign.encode(), hashlib.sha256).digest()
    ).decode()
    return f"SharedKey {account}:{sig}"


class AzBlobClient:
    """Minimal SharedKey client: List Blobs (paginated) + Get Blob."""

    def __init__(
        self,
        account: str,
        account_key_b64: str,
        endpoint: str | None = None,
        timeout: float = 30.0,
    ):
        if not account or not account_key_b64:
            raise SourceError(
                "azure credentials missing: set azure_account and "
                "azure_account_key options"
            )
        self.account = account
        self.key = account_key_b64
        self.endpoint = (endpoint or f"https://{account}.blob.core.windows.net").rstrip("/")
        self.timeout = timeout

    def _request(
        self,
        path: str,
        query: dict[str, str],
        byte_range: tuple[int, int] | None = None,
    ) -> urllib.request.addinfourl:
        now = _dt.datetime.now(_dt.timezone.utc).strftime("%a, %d %b %Y %H:%M:%S GMT")
        headers = {"x-ms-date": now, "x-ms-version": _API_VERSION}
        if byte_range is not None:
            # unlike SigV4, SharedKey SIGNS Range (one of the 12
            # standard string-to-sign headers) — set it before signing
            headers["Range"] = f"bytes={byte_range[0]}-{byte_range[1]}"
        # sign the ENCODED path — the canonicalized resource is the URI
        # path as it appears in the request, and the request must send
        # exactly what was signed (blob names with spaces &c.)
        quoted = urllib.parse.quote(path)
        headers["Authorization"] = shared_key_auth(
            "GET", self.account, quoted, query, headers, self.key
        )
        qs = urllib.parse.urlencode(sorted(query.items()))
        url = f"{self.endpoint}{quoted}" + (f"?{qs}" if qs else "")
        req = urllib.request.Request(url, headers=headers, method="GET")
        try:
            return urllib.request.urlopen(req, timeout=self.timeout)  # noqa: S310 — operator-configured endpoint
        except urllib.error.HTTPError as e:
            body = e.read(512).decode("utf-8", "replace")
            raise SourceError(f"azure {e.code} for {path!r}: {body}") from e
        except Exception as e:  # noqa: BLE001 — transport error with context
            raise SourceError(f"azure request failed for {path!r}: {e}") from e

    def list_blobs(self, container: str, prefix: str = "") -> list[tuple[str, int]]:
        out: list[tuple[str, int]] = []
        marker = ""
        while True:
            query = {"restype": "container", "comp": "list", "prefix": prefix}
            if marker:
                query["marker"] = marker
            with self._request(f"/{container}", query) as resp:
                raw = resp.read()
            try:
                root = ET.fromstring(raw)
            except ET.ParseError as e:
                # server bytes — loud, not a raw ParseError
                raise SourceError(
                    f"azure listing for {container!r} is not parseable XML: "
                    f"{raw[:200]!r}"
                ) from e
            for b in root.iter("Blob"):
                name = b.findtext("Name") or ""
                size_text = b.findtext("Properties/Content-Length") or "0"
                try:
                    size = int(size_text)
                except ValueError as e:
                    raise SourceError(
                        f"azure listing: non-numeric Content-Length "
                        f"{size_text!r} for blob {name!r}"
                    ) from e
                out.append((name, size))
            marker = root.findtext("NextMarker") or ""
            if not marker:
                return out

    def get_range(self, container: str, name: str, start: int, end: int) -> bytes:
        """Inclusive byte range of one blob (same contract as
        S3Client.get_range, so sources/s3http.RangeFile works over
        either client)."""
        with self._request(f"/{container}/{name}", {}, byte_range=(start, end)) as resp:
            return resp.read()

    def get_blob(self, container: str, name: str, dest_path: str) -> int:
        n = 0
        tmp = dest_path + ".tmp"
        with self._request(f"/{container}/{name}", {}) as resp, open(tmp, "wb") as f:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
                n += len(chunk)
        os.replace(tmp, dest_path)
        return n


def spool_az(url: str, options: dict) -> str:
    """Fetch az://container/name-or-prefix to a local spool dir (the
    ftp/sftp/http/s3 spool shape). Account and key come from the
    azure_account / azure_account_key options; azure_endpoint
    overrides the host for Azurite/fakes."""
    u = urllib.parse.urlparse(url)
    container, prefix = u.netloc, u.path.lstrip("/")
    if not container:
        raise SourceError(f"az url missing container: {url!r}")
    client = AzBlobClient(
        str(options.get("azure_account", "")),
        str(options.get("azure_account_key", "")),
        endpoint=options.get("azure_endpoint"),
        timeout=float(options.get("timeout", 30)),
    )
    names = client.list_blobs(container, prefix)
    exact = [x for x in names if x[0] == prefix]
    if exact:
        names = exact
    if not names:
        raise SourceError(f"az://{container}/{prefix}: no blobs match")
    spool = tempfile.mkdtemp(prefix="strake-az-")
    # mirror blob subpaths under the spool (r18 advice — flat basenames
    # silently collided and dropped hive partition dirs); shared helper
    from strake_spark.sources.s3http import _spool_objects

    fetched = _spool_objects(
        names, spool, prefix,
        lambda name, dest: client.get_blob(container, name, dest),
    )
    if not fetched:
        raise SourceError(f"az://{container}/{prefix}: only directory markers match")
    return fetched[0] if len(fetched) == 1 else spool


def read_az_parquet_distributed(spark, url: str, options: dict):
    """EXECUTOR-PARALLEL jar-free Azure parquet read — the az://
    analogue of sources/s3http.read_s3_parquet_distributed: the driver
    lists blob names and reads ONE footer via ranged GETs (RangeFile
    works over either client — same get_range contract); blob names
    then distribute to executor tasks, each fetching and decoding its
    own blobs with pyarrow inside mapInArrow. Column pruning via the
    ``columns`` option.

    INTRA-blob splitting (r18, parity with the S3 reader): any blob
    larger than ``split_threshold_bytes`` (default 128 MiB) fans out
    one task per parquet ROW GROUP, each read through the seekable
    RangeFile so only that group's column chunks move — a 10 GB blob
    spreads across the fleet instead of pinning one task."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    from strake_spark.sources.s3http import RangeFile

    u = urllib.parse.urlparse(url)
    container, prefix = u.netloc, u.path.lstrip("/")
    if not container:
        raise SourceError(f"az url missing container: {url!r}")
    params = {
        "account": str(options.get("azure_account", "")),
        "account_key_b64": str(options.get("azure_account_key", "")),
        "endpoint": options.get("azure_endpoint"),
        "timeout": float(options.get("timeout", 30)),
    }
    client = AzBlobClient(**params)
    listed = [
        (n, s) for n, s in client.list_blobs(container, prefix)
        if s > 0 and not n.endswith("/")
    ]
    exact = [(n, s) for n, s in listed if n == prefix]
    if exact:
        listed = exact
    if not listed:
        raise SourceError(f"az://{container}/{prefix}: no blobs match")
    columns = options.get("columns")
    first_name, first_size = listed[0]
    arrow_schema = pq.read_schema(RangeFile(client, container, first_name, first_size))
    if columns:
        import pyarrow as pa

        arrow_schema = pa.schema([arrow_schema.field(c) for c in columns])
    spark_schema = from_arrow_schema(arrow_schema)

    split_threshold = int(options.get("split_threshold_bytes", 128 * 1024 * 1024))
    # task list: (name, size, row_group) — row_group -1 = whole blob
    tasks: list[tuple[str, int, int]] = []
    for name, size in listed:
        if size >= split_threshold:
            meta = pq.ParquetFile(RangeFile(client, container, name, size)).metadata
            tasks.extend((name, size, g) for g in range(meta.num_row_groups))
        else:
            tasks.append((name, size, -1))

    # same fan-out contract as read_s3_parquet_distributed (r18):
    # cluster-parallelism default with a 64 floor, option override
    width = int(
        options.get("parallelism")
        or max(spark.sparkContext.defaultParallelism, 64)
    )
    tasks_df = spark.createDataFrame(
        tasks, "name string, size long, row_group int"
    ).repartition(min(len(tasks), width))

    def fetch(batches):
        import io as _io

        import pyarrow.parquet as _pq

        cl = AzBlobClient(**params)
        for batch in batches:
            rows = zip(
                batch.column(0).to_pylist(),
                batch.column(1).to_pylist(),
                batch.column(2).to_pylist(),
            )
            for name, size, group in rows:
                if group < 0:
                    b = _io.BytesIO()
                    with cl._request(f"/{container}/{name}", {}) as resp:
                        while True:
                            chunk = resp.read(1 << 20)
                            if not chunk:
                                break
                            b.write(chunk)
                    b.seek(0)
                    table = _pq.read_table(b, columns=columns)
                else:
                    # ranged reads: pyarrow seeks pull only this row
                    # group's column chunks + footer blocks
                    pf = _pq.ParquetFile(RangeFile(cl, container, name, size))
                    table = pf.read_row_group(group, columns=columns)
                table = table.select(arrow_schema.names).cast(arrow_schema)
                yield from table.to_batches(max_chunksize=1 << 16)

    return tasks_df.mapInArrow(fetch, schema=spark_schema)
