"""Jar-free Iceberg REST catalog client (table loading + auth).

Reference: crates/connectors/src/sources/iceberg.rs:43-55 +
iceberg/provider.rs:229-258 — REST catalog with OAuth2, lazy table
load. This implements the READ subset of the public Iceberg REST
catalog OpenAPI (apache/iceberg rest-catalog-open-api.yaml):

- ``GET  {uri}/v1/config[?warehouse=...]`` — catalog config; the
  ``overrides.prefix`` (or ``defaults.prefix``) is spliced into later
  routes, matching every catalog implementation's multi-tenancy shape.
- ``POST {uri}/v1/oauth/tokens`` (or a dedicated oauth2_server_uri) —
  client-credentials grant (``credential`` = "client_id:client_secret"),
  form-encoded, returning ``access_token`` + optional ``expires_in``;
  tokens refresh at 80% of their lifetime.
- ``GET  {uri}/v1/{prefix}/namespaces/{ns}/tables/{table}`` —
  LoadTableResult; the embedded ``metadata`` dict is the same
  table-metadata JSON a filesystem table stores, so everything
  downstream (snapshot selection, manifest walking, pruning,
  merge-on-read) is shared with sources/iceberg_native.py unchanged.

Multipart namespaces use the spec's 0x1F unit separator in the URL.
Static bearer auth (``token``) is supported alongside OAuth. HTTPS
honors an optional ``ca_file`` pin, same stance as clickhouse_http.
"""

from __future__ import annotations

import json
import ssl
import time
import urllib.error
import urllib.parse
import urllib.request

from strake_spark.errors import SourceError


class RestCatalog:
    def __init__(self, uri: str, options: dict | None = None, timeout: float = 15.0):
        o = options or {}
        self.uri = uri.rstrip("/")
        self.timeout = float(o.get("timeout", timeout))
        self.token = o.get("token")
        self.credential = o.get("credential")
        self.oauth2_server_uri = o.get("oauth2_server_uri")
        self.warehouse = o.get("warehouse")
        self.scope = o.get("scope", "catalog")
        self._ctx = None
        if self.uri.startswith("https://"):
            ca = o.get("ca_file")
            self._ctx = (
                ssl.create_default_context(cafile=str(ca))
                if ca
                else ssl.create_default_context()
            )
        self._token_cache: tuple[str, float] | None = None  # (token, refresh_at)
        self._prefix: str | None = None

    # ------------------------------------------------------------- http
    def _request(self, method: str, url: str, body: bytes | None = None,
                 headers: dict | None = None) -> dict:
        req = urllib.request.Request(url, data=body, method=method,
                                     headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout,
                                        context=self._ctx) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as e:
            detail = ""
            try:
                detail = e.read().decode(errors="replace")[:300]
            except Exception:  # noqa: BLE001
                pass
            raise SourceError(
                f"Iceberg REST catalog {method} {url} -> HTTP {e.code}: {detail}"
            ) from e
        except (
            urllib.error.URLError, OSError, json.JSONDecodeError,
            UnicodeDecodeError,
        ) as e:
            # UnicodeDecodeError: json.loads(bytes) dies in encoding
            # detection before JSONDecodeError can fire when the body
            # is not UTF-8 (gzip banner, binary error page)
            raise SourceError(
                f"Iceberg REST catalog unreachable at {url}: {e}"
            ) from e

    # ------------------------------------------------------------- auth
    def _bearer(self) -> str | None:
        if self.token:
            return str(self.token)
        if not self.credential:
            return None
        now = time.monotonic()
        if self._token_cache and now < self._token_cache[1]:
            return self._token_cache[0]
        cid, _, secret = str(self.credential).partition(":")
        form = urllib.parse.urlencode({
            "grant_type": "client_credentials",
            "client_id": cid,
            "client_secret": secret,
            "scope": self.scope,
        }).encode()
        token_url = (self.oauth2_server_uri or f"{self.uri}/v1/oauth/tokens")
        got = self._request(
            "POST", token_url, body=form,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        tok = got.get("access_token")
        if not tok:
            raise SourceError(
                f"OAuth token endpoint {token_url} returned no access_token"
            )
        ttl = float(got.get("expires_in") or 3600)
        self._token_cache = (str(tok), now + 0.8 * ttl)
        return str(tok)

    def _headers(self) -> dict:
        h = {"Accept": "application/json"}
        tok = self._bearer()
        if tok:
            h["Authorization"] = f"Bearer {tok}"
        return h

    # ---------------------------------------------------------- catalog
    def prefix(self) -> str:
        """Route prefix from GET /v1/config (cached); '' when absent."""
        if self._prefix is None:
            url = f"{self.uri}/v1/config"
            if self.warehouse:
                url += "?" + urllib.parse.urlencode({"warehouse": self.warehouse})
            cfg = self._request("GET", url, headers=self._headers())
            p = (cfg.get("overrides") or {}).get("prefix") or (
                cfg.get("defaults") or {}
            ).get("prefix") or ""
            self._prefix = str(p).strip("/")
        return self._prefix

    def _route(self, *parts: str) -> str:
        pre = self.prefix()
        path = "/".join([p for p in ("v1", pre) if p] + list(parts))
        return f"{self.uri}/{path}"

    def load_table(self, namespace: str, table: str) -> dict:
        """LoadTableResult -> table metadata dict (spec: the 'metadata'
        field; 'metadata-location' alone is only useful with object-store
        access, so a result without embedded metadata is an error here).
        Multipart namespaces ('a.b') use the spec's %1F separator."""
        ns = urllib.parse.quote(
            "\x1f".join(namespace.split(".")), safe=""
        )
        url = self._route("namespaces", ns, "tables",
                          urllib.parse.quote(table, safe=""))
        got = self._request("GET", url, headers=self._headers())
        meta = got.get("metadata")
        if not isinstance(meta, dict) or not meta:
            raise SourceError(
                f"catalog returned no embedded metadata for {namespace}.{table} "
                f"(metadata-location={got.get('metadata-location')!r}); "
                "jar-free REST reads need LoadTableResult.metadata"
            )
        if meta.get("format-version") not in (1, 2):
            raise SourceError(
                f"unsupported Iceberg format-version {meta.get('format-version')!r}"
            )
        return meta
