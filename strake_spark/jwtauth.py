"""Stdlib JWT (HS256 + RS256 + ES256/384/512) signing + OIDC validation.

Two consumers, both mirroring reference behaviors:

- REST-source JWT-assertion auth (crates/connectors/src/sources/
  rest_auth.rs:207-261): a self-signed assertion with iss/aud/iat/exp,
  optional sub, and caller-merged custom claims, sent as a Bearer
  header. The reference defaults to RS256 with a private-key PEM;
  both HS256 (stdlib hmac) and RS256 are implemented here — RSASSA-
  PKCS1-v1_5 is just modular exponentiation over a fixed digest
  encoding, no crypto library needed (RFC 8017 §8.2). PEM private keys
  (PKCS#1 and PKCS#8) are parsed with a minimal DER reader.
  ES256/ES384/ES512 ride the `cryptography` package (EC point math is
  not reasonably inlined) and raise NotImplementedError where absent;
  curve and hash are pinned per alg (RFC 7518 §3.1).

- Server-side OIDC bearer validation (crates/server/src/auth.rs shape):
  signature + exp/nbf + issuer + audience checks on inbound tokens for
  the Flight and REST facades. RS256 keys come JWKS-shaped
  ({"keys": [{"kty": "RSA", "n": ..., "e": ..., "kid": ...}]}, the
  form every OIDC issuer publishes); HS256 uses the shared secret.
  The validator routes strictly by configured key material per alg —
  an RS256 token is never checked against the HS256 secret or vice
  versa (alg-confusion hardening).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time
from typing import Any

from strake_spark.errors import AuthError as _AuthCategory
from strake_spark.errors import ErrorCode

_SUPPORTED = ("HS256", "RS256", "ES256", "ES384", "ES512")
# ES* needs EC point math — implemented via the `cryptography` package
# when present (it is in this container), NotImplementedError otherwise.
_DEPLOY_GATED: tuple[str, ...] = ()


def _ec_backend():
    try:
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import ec, utils

        return hashes, serialization, ec, utils
    except ImportError:  # pragma: no cover - present in this container
        return None


class AuthError(_AuthCategory):
    """Bearer token rejected (bad signature, expired, wrong iss/aud)."""

    code = ErrorCode.AUTHENTICATION_FAILED


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
    _check_claims(claims, issuer=issuer, audience=audience, leeway=leeway, now=now)
    return claims


def _check_claims(
    claims: dict[str, Any],
    *,
    issuer: str | None,
    audience: str | None,
    leeway: float,
    now: float | None,
) -> None:
    t = time.time() if now is None else now
    exp = claims.get("exp")
    if exp is not None and t > float(exp) + leeway:
        raise AuthError("token expired", code=ErrorCode.TOKEN_EXPIRED)
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


# --------------------------------------------------------------- RS256
# RSASSA-PKCS1-v1_5 with SHA-256 (RFC 8017 §8.2). Verification is
# pow(sig, e, n) compared against the deterministic EMSA-PKCS1-v1_5
# encoding; signing is pow(em, d, n). Pure integer math — no library.

# DER DigestInfo prefix for SHA-256 (RFC 8017 §9.2 notes)
_SHA256_DIGESTINFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _emsa_pkcs1_v15_sha256(message: bytes, em_len: int) -> bytes:
    t = _SHA256_DIGESTINFO + hashlib.sha256(message).digest()
    if em_len < len(t) + 11:
        raise AuthError("RSA modulus too small for SHA-256 signature")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def _rsa_verify_sha256(n: int, e: int, message: bytes, sig: bytes) -> bool:
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    m = pow(int.from_bytes(sig, "big"), e, n)
    em = m.to_bytes(k, "big")
    return hmac.compare_digest(em, _emsa_pkcs1_v15_sha256(message, k))


def _rsa_sign_sha256(n: int, d: int, message: bytes) -> bytes:
    k = (n.bit_length() + 7) // 8
    em = int.from_bytes(_emsa_pkcs1_v15_sha256(message, k), "big")
    return pow(em, d, n).to_bytes(k, "big")


def _jwk_int(v: str) -> int:
    return int.from_bytes(_b64url_decode(v), "big")


# ------------------------------------------------------- DER / PEM keys


def _der_read(buf: bytes, pos: int) -> tuple[int, bytes, int]:
    """One TLV: returns (tag, value, next_pos)."""
    if pos + 2 > len(buf):
        raise AuthError("truncated DER")
    tag = buf[pos]
    length = buf[pos + 1]
    pos += 2
    if length & 0x80:
        nbytes = length & 0x7F
        if nbytes == 0 or pos + nbytes > len(buf):
            raise AuthError("bad DER length")
        length = int.from_bytes(buf[pos:pos + nbytes], "big")
        pos += nbytes
    if pos + length > len(buf):
        raise AuthError("truncated DER value")
    return tag, buf[pos:pos + length], pos + length


def _der_seq_ints(body: bytes, count: int) -> list[int]:
    out, pos = [], 0
    while len(out) < count:
        tag, val, pos = _der_read(body, pos)
        if tag != 0x02:
            raise AuthError(f"expected DER INTEGER, got tag {tag:#x}")
        out.append(int.from_bytes(val, "big"))
    return out


def parse_rsa_private_key_pem(pem: str) -> dict[str, int]:
    """PEM (PKCS#1 'RSA PRIVATE KEY' or PKCS#8 'PRIVATE KEY') ->
    {'n': ..., 'e': ..., 'd': ...}. Minimal DER walk — enough for the
    RSAPrivateKey layout (RFC 8017 A.1.2); encrypted keys rejected."""
    if "ENCRYPTED" in pem:
        raise AuthError("encrypted private keys not supported")
    lines = [ln.strip() for ln in pem.strip().splitlines()
             if ln.strip() and not ln.startswith("-----")]
    try:
        der = base64.b64decode("".join(lines))
    except Exception:
        raise AuthError("undecodable PEM body") from None
    tag, body, _ = _der_read(der, 0)
    if tag != 0x30:
        raise AuthError("expected DER SEQUENCE")
    if "BEGIN RSA PRIVATE KEY" not in pem:
        # PKCS#8: version INT, AlgorithmIdentifier SEQ, OCTET STRING(PKCS#1)
        pos = 0
        tag, _, pos = _der_read(body, pos)  # version
        tag, _, pos = _der_read(body, pos)  # algorithm identifier
        tag, inner, _ = _der_read(body, pos)
        if tag != 0x04:
            raise AuthError("expected OCTET STRING in PKCS#8")
        tag, body, _ = _der_read(inner, 0)
        if tag != 0x30:
            raise AuthError("expected inner SEQUENCE")
    version, n, e, d = _der_seq_ints(body, 4)
    if version != 0:
        raise AuthError(f"unsupported RSAPrivateKey version {version}")
    return {"n": n, "e": e, "d": d}


def sign_rs256(
    claims: dict[str, Any],
    key: dict[str, Any] | str,
    headers: dict | None = None,
) -> str:
    """Compact JWS over ``claims`` with RSASSA-PKCS1-v1_5/SHA-256.
    ``key`` is a PEM string or a dict with int (or JWK base64url)
    'n'/'d' members."""
    if isinstance(key, str):
        key = parse_rsa_private_key_pem(key)
    n = key["n"] if isinstance(key["n"], int) else _jwk_int(key["n"])
    d = key["d"] if isinstance(key["d"], int) else _jwk_int(key["d"])
    header = {"alg": "RS256", "typ": "JWT", **(headers or {})}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":"), sort_keys=True).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":"), sort_keys=True).encode())
    )
    sig = _rsa_sign_sha256(n, d, signing_input.encode("ascii"))
    return signing_input + "." + _b64url(sig)


def verify_rs256(
    token: str,
    jwks: dict[str, Any],
    *,
    issuer: str | None = None,
    audience: str | None = None,
    leeway: float = 30.0,
    now: float | None = None,
) -> dict[str, Any]:
    """Validate an RS256 token against a JWKS document
    ({"keys": [{"kty": "RSA", "n": ..., "e": ..., "kid": ...}]}).
    Key selection: header kid when present, else every RSA key is
    tried. Claim checks identical to verify_hs256."""
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed token (expected 3 dot-separated segments)")
    try:
        header = json.loads(_b64url_decode(parts[0]))
        claims = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except Exception as e:  # noqa: BLE001 - any decode failure is a bad token
        raise AuthError(f"undecodable token: {e}") from None
    if header.get("alg") != "RS256":
        raise AuthError(f"unsupported alg {header.get('alg')!r} (RS256 expected)")
    keys = [k for k in jwks.get("keys", []) if k.get("kty") == "RSA"]
    kid = header.get("kid")
    if kid is not None:
        keys = [k for k in keys if k.get("kid") == kid]
    if not keys:
        raise AuthError(f"no RSA key in JWKS for kid={kid!r}")
    msg = f"{parts[0]}.{parts[1]}".encode("ascii")
    if not any(
        _rsa_verify_sha256(_jwk_int(k["n"]), _jwk_int(k["e"]), msg, sig)
        for k in keys
    ):
        raise AuthError("signature mismatch")
    _check_claims(claims, issuer=issuer, audience=audience, leeway=leeway, now=now)
    return claims


# ----------------------------------------------------------- ES256/384/512
# ECDSA (JWS raw r||s signatures, RFC 7518 §3.4) via the `cryptography`
# package — unlike RSA, EC point math is not reasonably re-implementable
# inline, so this path is import-gated. Per RFC 7518 §3.1 the curve and
# hash are pinned per alg (mixed pairs like P-256+SHA-384 are invalid):
#   ES256 -> P-256 / SHA-256, 32-byte coords (64-byte signature)
#   ES384 -> P-384 / SHA-384, 48-byte coords (96-byte signature)
#   ES512 -> P-521 / SHA-512, 66-byte coords (132-byte signature;
#            521 bits rounds up to 66 bytes)


def _ec_params(alg: str):
    """(curve_name, curve_factory, hash_factory, coord_bytes) for an ES alg."""
    be = _ec_backend()
    if be is None:
        raise NotImplementedError(
            f"{alg} needs the `cryptography` package for EC point math"
        )
    hashes, serialization, ec, utils = be
    table = {
        "ES256": ("P-256", ec.SECP256R1, hashes.SHA256, 32),
        "ES384": ("P-384", ec.SECP384R1, hashes.SHA384, 48),
        "ES512": ("P-521", ec.SECP521R1, hashes.SHA512, 66),
    }
    if alg not in table:
        raise ValueError(f"not an ECDSA JWS alg: {alg!r}")
    crv, curve, hash_f, width = table[alg]
    return be, crv, curve, hash_f, width


def sign_ecdsa(
    claims: dict[str, Any],
    private_key_pem: str,
    alg: str = "ES256",
    headers: dict | None = None,
) -> str:
    (hashes, serialization, ec, utils), _crv, curve, hash_f, width = _ec_params(alg)
    key = serialization.load_pem_private_key(
        private_key_pem.encode(), password=None
    )
    if not isinstance(key.curve, curve):
        raise ValueError(
            f"{alg} requires a {curve.name} key, got {key.curve.name} "
            "(RFC 7518 pins curve to alg)"
        )
    header = {"alg": alg, "typ": "JWT", **(headers or {})}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":"), sort_keys=True).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":"), sort_keys=True).encode())
    )
    der_sig = key.sign(signing_input.encode("ascii"), ec.ECDSA(hash_f()))
    r, s = utils.decode_dss_signature(der_sig)  # JWS wants raw r||s, not DER
    sig = r.to_bytes(width, "big") + s.to_bytes(width, "big")
    return signing_input + "." + _b64url(sig)


def verify_ecdsa(
    token: str,
    jwks: dict[str, Any],
    alg: str = "ES256",
    *,
    issuer: str | None = None,
    audience: str | None = None,
    leeway: float = 30.0,
    now: float | None = None,
) -> dict[str, Any]:
    """Validate an ES256/ES384/ES512 token against JWKS EC keys
    ({"kty": "EC", "crv": "P-256"|"P-384"|"P-521", "x": ..., "y": ...});
    only keys on the alg's pinned curve are considered."""
    (hashes, _serialization, ec, utils), crv, curve, hash_f, width = _ec_params(alg)
    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("malformed token (expected 3 dot-separated segments)")
    try:
        header = json.loads(_b64url_decode(parts[0]))
        claims = json.loads(_b64url_decode(parts[1]))
        sig = _b64url_decode(parts[2])
    except Exception as e:  # noqa: BLE001
        raise AuthError(f"undecodable token: {e}") from None
    if header.get("alg") != alg:
        raise AuthError(f"unsupported alg {header.get('alg')!r} ({alg} expected)")
    if len(sig) != 2 * width:
        raise AuthError(f"{alg} signature must be {2 * width} raw bytes (r||s)")
    keys = [
        k for k in jwks.get("keys", [])
        if k.get("kty") == "EC" and k.get("crv") in (None, crv)
    ]
    kid = header.get("kid")
    if kid is not None:
        keys = [k for k in keys if k.get("kid") == kid]
    if not keys:
        raise AuthError(f"no {crv} key in JWKS for kid={kid!r}")
    der = utils.encode_dss_signature(
        int.from_bytes(sig[:width], "big"), int.from_bytes(sig[width:], "big")
    )
    msg = f"{parts[0]}.{parts[1]}".encode("ascii")
    ok = False
    for k in keys:
        pub = ec.EllipticCurvePublicNumbers(
            _jwk_int(k["x"]), _jwk_int(k["y"]), curve()
        ).public_key()
        try:
            pub.verify(der, msg, ec.ECDSA(hash_f()))
            ok = True
            break
        except Exception:  # noqa: BLE001 - InvalidSignature et al.
            continue
    if not ok:
        raise AuthError("signature mismatch")
    _check_claims(claims, issuer=issuer, audience=audience, leeway=leeway, now=now)
    return claims


def sign_es256(
    claims: dict[str, Any], private_key_pem: str, headers: dict | None = None
) -> str:
    return sign_ecdsa(claims, private_key_pem, "ES256", headers)


def verify_es256(token: str, jwks: dict[str, Any], **kw) -> dict[str, Any]:
    return verify_ecdsa(token, jwks, "ES256", **kw)


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
    shape: iss/aud/iat/exp, optional sub, custom claims merged last).
    RS256 (the reference's default) takes ``private_key_pem`` (PKCS#1
    or PKCS#8); HS256 takes ``secret``."""
    if algorithm not in _SUPPORTED:
        raise ValueError(f"unsupported JWT algorithm {algorithm!r}")
    if algorithm == "HS256" and secret is None:
        raise ValueError("HS256 assertion requires `secret`")
    if algorithm != "HS256" and private_key_pem is None:
        raise ValueError(f"{algorithm} assertion requires `private_key_pem`")
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
    if algorithm == "RS256":
        return sign_rs256(body, private_key_pem)
    if algorithm.startswith("ES"):
        return sign_ecdsa(body, private_key_pem, algorithm)
    return sign_hs256(body, secret)


class JwksCache:
    """TTL-cached JWKS fetched from a live ``jwks_uri`` — the piece a
    real IdP integration needs beyond a static key file: keys are
    refetched when the cache expires, and ``refresh()`` is forced once
    when a token carries an unknown ``kid`` (the signing-key-rotation
    path every IdP exercises; Azure AD/Okta/Keycloak rotate on a
    schedule, reference docs/enterprise.md:9-16)."""

    def __init__(self, jwks_uri: str, ttl: float = 300.0, timeout: float = 10.0,
                 min_refetch_interval: float = 5.0):
        self.jwks_uri = jwks_uri
        self.ttl = ttl
        self.timeout = timeout
        # forged tokens with random kids must not turn every request
        # into an IdP fetch (refetch-storm guard; real validators
        # rate-limit rotation refreshes the same way)
        self.min_refetch_interval = min_refetch_interval
        self._doc: dict[str, Any] | None = None
        self._fetched_at = 0.0

    def refresh(self) -> dict[str, Any]:
        import time
        import urllib.request

        if (
            self._doc is not None
            and time.time() - self._fetched_at < self.min_refetch_interval
        ):
            return self._doc  # throttled: serve the recent fetch
        with urllib.request.urlopen(self.jwks_uri, timeout=self.timeout) as resp:
            self._doc = json.loads(resp.read().decode())
        self._fetched_at = time.time()
        return self._doc

    def get(self) -> dict[str, Any]:
        import time

        if self._doc is None or time.time() - self._fetched_at > self.ttl:
            if self._doc is None:
                return self.refresh()  # nothing cached: errors propagate
            try:
                return self.refresh()
            except Exception:
                # transient IdP outage must not fail ALL token
                # validation while a previously-fetched JWKS doc is in
                # hand: serve the stale document and retry soon (the
                # throttle window doubles as the shortened retry
                # interval — _fetched_at stays old, so the next get()
                # past the throttle tries the IdP again)
                self._fetched_at = (
                    time.time() - self.ttl + self.min_refetch_interval
                )
                return self._doc
        return self._doc

    def kids(self) -> set:
        return {k.get("kid") for k in self.get().get("keys", [])}


def discover_oidc(issuer_url: str, timeout: float = 10.0) -> dict[str, Any]:
    """OIDC discovery: fetch ``<issuer>/.well-known/openid-configuration``
    and verify the document's ``issuer`` matches the requested one (the
    RFC 8414 §3.3 mix-up check — a document served for a different
    issuer must not configure this validator)."""
    import urllib.request

    base = issuer_url.rstrip("/")
    url = base + "/.well-known/openid-configuration"
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        doc = json.loads(resp.read().decode())
    if doc.get("issuer", "").rstrip("/") != base:
        raise AuthError(
            f"OIDC discovery issuer mismatch: asked {issuer_url!r}, "
            f"document says {doc.get('issuer')!r}"
        )
    if "jwks_uri" not in doc:
        raise AuthError("OIDC discovery document has no jwks_uri")
    return doc


class OidcValidator:
    """Issuer/audience/exp bearer-token validator for the server facades.

    Reference shape: crates/server/src/auth.rs OIDC authenticator —
    construct once with the expected issuer + audience + key material,
    then ``validate(authorization_header)`` per request, returning the
    authenticated principal (``sub`` claim) or raising AuthError.

    ``jwks`` may be a static JWKS dict (key file) or a live
    ``JwksCache``; ``from_discovery`` builds the validator from a real
    IdP's discovery document (Azure AD / Okta / Auth0 / Keycloak all
    speak it — docs/enterprise.md:9-16), wiring issuer and jwks_uri
    from the document and refetching keys on rotation.
    """

    def __init__(
        self,
        secret: str | bytes | None = None,
        issuer: str = "",
        audience: str = "",
        leeway: float = 30.0,
        jwks: "dict[str, Any] | JwksCache | None" = None,
    ):
        if secret is None and jwks is None:
            raise ValueError("OidcValidator needs `secret` (HS256) or `jwks` (RS256)")
        self.secret = secret
        self.issuer = issuer
        self.audience = audience
        self.leeway = leeway
        self.jwks = jwks

    @classmethod
    def from_discovery(
        cls,
        issuer_url: str,
        audience: str = "",
        leeway: float = 30.0,
        jwks_ttl: float = 300.0,
        timeout: float = 10.0,
        jwks_min_refetch_interval: float = 5.0,
    ) -> "OidcValidator":
        doc = discover_oidc(issuer_url, timeout=timeout)
        return cls(
            issuer=doc["issuer"],
            audience=audience,
            leeway=leeway,
            jwks=JwksCache(doc["jwks_uri"], ttl=jwks_ttl, timeout=timeout,
                           min_refetch_interval=jwks_min_refetch_interval),
        )

    def _jwks_for(self, kid) -> dict[str, Any]:
        """Current JWKS; on a live cache an unknown kid forces ONE
        refetch (key rotation) before the verify fails."""
        if isinstance(self.jwks, JwksCache):
            if kid is not None and kid not in self.jwks.kids():
                self.jwks.refresh()
            return self.jwks.get()
        return self.jwks

    def validate(self, authorization: str | None) -> dict[str, Any]:
        if not authorization or not authorization.startswith("Bearer "):
            raise AuthError("missing bearer token")
        token = authorization[len("Bearer "):]
        # Route STRICTLY by configured key material for the token's alg:
        # an RS256 token must never be checked with the HS256 secret (or
        # vice versa) — the classic alg-confusion forgery.
        try:
            head = json.loads(_b64url_decode(token.split(".")[0]))
        except Exception:
            raise AuthError("undecodable token header") from None
        alg = head.get("alg")
        if alg == "RS256":
            if self.jwks is None:
                raise AuthError("RS256 token but no JWKS configured")
            return verify_rs256(
                token, self._jwks_for(head.get("kid")),
                issuer=self.issuer, audience=self.audience, leeway=self.leeway,
            )
        if alg in ("ES256", "ES384", "ES512"):
            if self.jwks is None:
                raise AuthError(f"{alg} token but no JWKS configured")
            return verify_ecdsa(
                token, self._jwks_for(head.get("kid")), alg,
                issuer=self.issuer, audience=self.audience, leeway=self.leeway,
            )
        if alg == "HS256":
            if self.secret is None:
                raise AuthError("HS256 token but no shared secret configured")
            return verify_hs256(
                token, self.secret,
                issuer=self.issuer, audience=self.audience, leeway=self.leeway,
            )
        raise AuthError(f"unsupported alg {alg!r}")
