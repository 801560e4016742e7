"""Stdlib JWT (HS256) signing + OIDC-style bearer validation.

Two consumers, both mirroring reference behaviors:

- REST-source JWT-assertion auth (crates/connectors/src/sources/
  rest_auth.rs:207-261): a self-signed assertion with iss/aud/iat/exp,
  optional sub, and caller-merged custom claims, sent as a Bearer
  header. The reference defaults to RS256 with a private-key PEM; this
  container vendors no crypto library, so HS256 (pure stdlib
  hmac/hashlib) is the implemented algorithm and RS256/ES256 raise with
  the documented deploy gate (install `cryptography` or `PyJWT` on the
  cluster and route through the same claim builder).

- Server-side OIDC bearer validation (crates/server/src/auth.rs shape):
  signature + exp/nbf + issuer + audience checks on inbound tokens for
  the Flight and REST facades. A real OIDC deployment fetches RS256
  JWKS from the issuer; the shared-secret HS256 validator exercises the
  identical claim logic and is what the sandbox can test end-to-end.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any

from strake_spark.errors import StrakeError

_SUPPORTED = ("HS256",)
_DEPLOY_GATED = ("RS256", "RS384", "RS512", "ES256", "ES384")


class AuthError(StrakeError):
    """Bearer token rejected (bad signature, expired, wrong iss/aud)."""


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_decode(data: str) -> bytes:
    pad = "=" * (-len(data) % 4)
    return base64.urlsafe_b64decode(data + pad)


def sign_hs256(claims: dict[str, Any], secret: str | bytes, headers: dict | None = None) -> str:
    """Compact-serialization JWS over ``claims`` with HMAC-SHA256."""
    key = secret.encode() if isinstance(secret, str) else secret
    header = {"alg": "HS256", "typ": "JWT", **(headers or {})}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":"), sort_keys=True).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":"), sort_keys=True).encode())
    )
    sig = hmac.new(key, signing_input.encode("ascii"), hashlib.sha256).digest()
    return signing_input + "." + _b64url(sig)


def verify_hs256(
    token: str,
    secret: str | bytes,
    *,
    issuer: str | None = None,
    audience: str | None = None,
    leeway: float = 30.0,
    now: float | None = None,
) -> dict[str, Any]:
    """Validate signature + temporal + iss/aud claims; return the claims.

    Claim checks mirror the reference's OIDC validation order: alg
    allow-list first (never trust the header's alg beyond matching the
    expected one — the classic alg-confusion hole), then signature, then
    exp/nbf with leeway, then issuer and audience when pinned.
    """
    key = secret.encode() if isinstance(secret, str) else secret
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed token (expected 3 dot-separated segments)")
    try:
        header = json.loads(_b64url_decode(parts[0]))
        claims = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except Exception as e:  # noqa: BLE001 - any decode failure is a bad token
        raise AuthError(f"undecodable token: {e}") from None
    if header.get("alg") != "HS256":
        raise AuthError(f"unsupported alg {header.get('alg')!r} (HS256 only)")
    expect = hmac.new(key, f"{parts[0]}.{parts[1]}".encode("ascii"), hashlib.sha256).digest()
    if not hmac.compare_digest(sig, expect):
        raise AuthError("signature mismatch")
    t = time.time() if now is None else now
    exp = claims.get("exp")
    if exp is not None and t > float(exp) + leeway:
        raise AuthError("token expired")
    nbf = claims.get("nbf")
    if nbf is not None and t < float(nbf) - leeway:
        raise AuthError("token not yet valid")
    if issuer is not None and claims.get("iss") != issuer:
        raise AuthError(f"issuer mismatch: {claims.get('iss')!r}")
    if audience is not None:
        aud = claims.get("aud")
        auds = aud if isinstance(aud, list) else [aud]
        if audience not in auds:
            raise AuthError(f"audience mismatch: {aud!r}")
    return claims


def build_assertion(
    issuer: str,
    audience: str,
    *,
    algorithm: str = "HS256",
    secret: str | bytes | None = None,
    private_key_pem: str | None = None,
    expiry_secs: int = 3600,
    subject: str | None = None,
    claims: dict[str, Any] | None = None,
    now: float | None = None,
) -> str:
    """Self-signed service-account assertion (rest_auth.rs:207-261 claim
    shape: iss/aud/iat/exp, optional sub, custom claims merged last)."""
    if algorithm in _DEPLOY_GATED:
        raise NotImplementedError(
            f"{algorithm} assertions need an asymmetric signer; install "
            "`cryptography` (or PyJWT) on the cluster and extend "
            "build_assertion — claim construction below is algorithm-"
            f"agnostic. In-container supported: {_SUPPORTED}"
        )
    if algorithm not in _SUPPORTED:
        raise ValueError(f"unsupported JWT algorithm {algorithm!r}")
    if secret is None:
        raise ValueError("HS256 assertion requires `secret`")
    del private_key_pem  # only used by the deploy-gated asymmetric path
    t = int(time.time() if now is None else now)
    body: dict[str, Any] = {
        "iss": issuer,
        "aud": audience,
        "iat": t,
        "exp": t + int(expiry_secs),
    }
    if subject is not None:
        body["sub"] = subject
    body.update(claims or {})
    return sign_hs256(body, secret)


class OidcValidator:
    """Issuer/audience/exp bearer-token validator for the server facades.

    Reference shape: crates/server/src/auth.rs OIDC authenticator —
    construct once with the expected issuer + audience + key material,
    then ``validate(authorization_header)`` per request, returning the
    authenticated principal (``sub`` claim) or raising AuthError.
    """

    def __init__(self, secret: str | bytes, issuer: str, audience: str, leeway: float = 30.0):
        self.secret = secret
        self.issuer = issuer
        self.audience = audience
        self.leeway = leeway

    def validate(self, authorization: str | None) -> dict[str, Any]:
        if not authorization or not authorization.startswith("Bearer "):
            raise AuthError("missing bearer token")
        return verify_hs256(
            authorization[len("Bearer "):],
            self.secret,
            issuer=self.issuer,
            audience=self.audience,
            leeway=self.leeway,
        )
