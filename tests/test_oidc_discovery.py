"""SSO against a live IdP (reference docs/enterprise.md:9-16: OIDC
integration with Azure AD / Okta / Auth0 / Keycloak): an in-process
IdP speaks the real discovery protocol — /.well-known/openid-
configuration, a JWKS endpoint, and a client_credentials token
endpoint minting RS256 tokens — and the validator + server facades are
driven through the full flow including SIGNING-KEY ROTATION, the part
a static key file can never exercise."""

from __future__ import annotations

import json
import threading
import time
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from strake_spark.jwtauth import (
    AuthError,
    JwksCache,
    OidcValidator,
    _b64url,
    discover_oidc,
    sign_rs256,
)


class MiniIdp:
    """In-process OIDC IdP: discovery + JWKS + client_credentials
    grant. ``rotate()`` swaps the signing key to a fresh kid, exactly
    what Azure AD/Okta/Keycloak do on their rotation schedule."""

    def __init__(self, audience: str = "strake"):
        self.audience = audience
        self._keys: list[tuple[str, dict]] = []  # (kid, numbers)
        self._serial = 0
        self.rotate()
        idp = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # noqa: A003 - quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802
                if self.path == "/.well-known/openid-configuration":
                    return self._send(200, idp.discovery_doc())
                if self.path == "/jwks":
                    return self._send(200, idp.jwks())
                return self._send(404, {"error": "not found"})

            def do_POST(self):  # noqa: N802
                if self.path != "/token":
                    return self._send(404, {"error": "not found"})
                n = int(self.headers.get("Content-Length", "0"))
                form = urllib.parse.parse_qs(self.rfile.read(n).decode())
                if form.get("grant_type") != ["client_credentials"]:
                    return self._send(400, {"error": "unsupported_grant_type"})
                if form.get("client_secret") != ["s3cr3t"]:
                    return self._send(401, {"error": "invalid_client"})
                sub = form.get("client_id", ["?"])[0]
                return self._send(
                    200,
                    {"access_token": idp.mint(sub),
                     "token_type": "Bearer", "expires_in": 3600},
                )

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self._httpd.server_port
        self.base = f"http://127.0.0.1:{self.port}"
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()

    # ------------------------------------------------------------- keys
    def rotate(self) -> str:
        from cryptography.hazmat.primitives.asymmetric import rsa

        self._serial += 1
        kid = f"kid-{self._serial}"
        priv = rsa.generate_private_key(public_exponent=65537, key_size=2048)
        nums = priv.private_numbers()
        self._keys = [(kid, {
            "n": nums.public_numbers.n,
            "e": nums.public_numbers.e,
            "d": nums.d,
        })]
        return kid

    @property
    def current_kid(self) -> str:
        return self._keys[0][0]

    def jwks(self) -> dict:
        def b64int(v: int) -> str:
            return _b64url(v.to_bytes((v.bit_length() + 7) // 8, "big"))

        return {
            "keys": [
                {"kty": "RSA", "alg": "RS256", "use": "sig", "kid": kid,
                 "n": b64int(num["n"]), "e": b64int(num["e"])}
                for kid, num in self._keys
            ]
        }

    def discovery_doc(self) -> dict:
        return {
            "issuer": self.base,
            "jwks_uri": f"{self.base}/jwks",
            "token_endpoint": f"{self.base}/token",
            "grant_types_supported": ["client_credentials"],
            "id_token_signing_alg_values_supported": ["RS256"],
        }

    def mint(self, sub: str, **extra) -> str:
        kid, num = self._keys[0]
        now = int(time.time())
        claims = {"iss": self.base, "aud": self.audience, "sub": sub,
                  "iat": now, "exp": now + 3600, **extra}
        return sign_rs256(claims, num, headers={"kid": kid})

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()


@pytest.fixture(scope="module")
def idp():
    srv = MiniIdp()
    yield srv
    srv.close()


class TestDiscovery:
    def test_discovery_document(self, idp):
        doc = discover_oidc(idp.base)
        assert doc["issuer"] == idp.base
        assert doc["jwks_uri"].endswith("/jwks")

    def test_issuer_mixup_rejected(self, idp):
        """RFC 8414 mix-up check: a discovery document claiming a
        different issuer must not configure the validator."""

        class _Liar(MiniIdp):
            def discovery_doc(self):
                d = super().discovery_doc()
                d["issuer"] = "https://evil.example"
                return d

        liar = _Liar()
        try:
            with pytest.raises(AuthError, match="issuer mismatch"):
                discover_oidc(liar.base)
        finally:
            liar.close()

    def test_client_credentials_flow_end_to_end(self, idp):
        v = OidcValidator.from_discovery(idp.base, audience="strake")
        data = urllib.parse.urlencode(
            {"grant_type": "client_credentials",
             "client_id": "svc-reporting", "client_secret": "s3cr3t"}
        ).encode()
        with urllib.request.urlopen(
            urllib.request.Request(f"{idp.base}/token", data=data), timeout=10
        ) as resp:
            tok = json.loads(resp.read())["access_token"]
        claims = v.validate(f"Bearer {tok}")
        assert claims["sub"] == "svc-reporting"

    def test_wrong_audience_rejected(self, idp):
        v = OidcValidator.from_discovery(idp.base, audience="other-api")
        with pytest.raises(AuthError):
            v.validate(f"Bearer {idp.mint('u')}")


class TestKeyRotation:
    def test_unknown_kid_triggers_one_refetch(self, idp):
        # interval 0: the test rotates within seconds; production keeps
        # the 5s refetch-storm throttle (forged random-kid tokens)
        v = OidcValidator.from_discovery(
            idp.base, audience="strake", jwks_min_refetch_interval=0.0)
        assert v.validate(f"Bearer {idp.mint('alice')}")["sub"] == "alice"
        old_token = idp.mint("alice")
        idp.rotate()  # IdP swaps keys; validator's cache still has kid-N
        new_token = idp.mint("bob")
        # unknown kid -> forced JWKS refetch -> new key validates
        assert v.validate(f"Bearer {new_token}")["sub"] == "bob"
        # the old kid is gone from the refreshed JWKS: old tokens die
        with pytest.raises(AuthError, match="no RSA key"):
            v.validate(f"Bearer {old_token}")

    def test_cache_ttl_refetch(self, idp):
        cache = JwksCache(f"{idp.base}/jwks", ttl=0.0, min_refetch_interval=0.0)
        first = cache.get()
        idp.rotate()
        second = cache.get()
        assert first["keys"][0]["kid"] != second["keys"][0]["kid"]


class TestServerFacadesAgainstLiveIdp:
    def test_rest_query_with_idp_token(self, spark, idp):
        import strake_spark as ss
        from strake_spark.rest_api import make_rest_server
        from tests.conftest import SF_DIR

        eng = ss.connect(
            {"sources": [{"name": "oi", "type": "parquet", "url": SF_DIR,
                          "tables": [{"name": "region"}]}]},
            spark=spark,
        )
        v = OidcValidator.from_discovery(idp.base, audience="strake",
                                          jwks_min_refetch_interval=0.0)
        srv = make_rest_server(eng, validator=v).start()
        try:
            def query(token: str) -> int:
                req = urllib.request.Request(
                    f"http://127.0.0.1:{srv.port}/api/v1/query",
                    data=json.dumps(
                        {"sql": "SELECT count(*) AS n FROM oi_region"}
                    ).encode(),
                    headers={"Content-Type": "application/json",
                             "Authorization": f"Bearer {token}"},
                )
                with urllib.request.urlopen(req, timeout=30) as resp:
                    return resp.status

            assert query(idp.mint("analyst")) == 200
            idp.rotate()  # mid-session rotation must not break the facade
            assert query(idp.mint("analyst")) == 200
            with pytest.raises(urllib.error.HTTPError) as e:
                query("not-a-token")
            assert e.value.code in (401, 403)
        finally:
            srv.stop()

    def test_refetch_storm_throttled(self, idp):
        """Forged tokens with random kids must not turn every request
        into an IdP fetch: within min_refetch_interval the cache serves
        the recent document instead of refetching."""
        cache = JwksCache(f"{idp.base}/jwks", ttl=300.0,
                          min_refetch_interval=60.0)
        cache.get()
        first = cache._fetched_at
        # unknown-kid style forced refresh right after: throttled
        cache.refresh()
        cache.refresh()
        assert cache._fetched_at == first


class TestJwksStaleFallback:
    """ADVICE r15: a transient IdP outage at TTL expiry must not fail
    all token validation while a previously-fetched JWKS doc is cached
    — serve the stale document and retry after the throttle window."""

    def test_outage_serves_stale_document(self, idp):
        cache = JwksCache(f"{idp.base}/jwks", ttl=0.0,
                          min_refetch_interval=0.0)
        doc = cache.get()
        # point the cache at a dead endpoint: next TTL-expired get()
        # hits the "IdP down" path
        cache.jwks_uri = "http://127.0.0.1:1/jwks"
        assert cache.get() == doc  # stale served, no raise
        assert cache.get() == doc  # and stays served on repeat

    def test_outage_recovery_refetches(self, idp):
        cache = JwksCache(f"{idp.base}/jwks", ttl=0.0,
                          min_refetch_interval=0.0)
        good_uri = cache.jwks_uri
        cache.get()
        cache.jwks_uri = "http://127.0.0.1:1/jwks"
        cache.get()  # outage: stale
        idp.rotate()
        cache.jwks_uri = good_uri  # IdP back up
        # the retry actually fetched the rotated document
        fresh = cache.get()
        assert fresh["keys"][0]["kid"] == idp.current_kid

    def test_cold_cache_outage_still_raises(self):
        cache = JwksCache("http://127.0.0.1:1/jwks", ttl=0.0,
                          min_refetch_interval=0.0)
        with pytest.raises(Exception):
            cache.get()
