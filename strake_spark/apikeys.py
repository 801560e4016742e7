"""Enterprise API-key lifecycle — issue / verify / rotate / revoke with
granular scoping, backed by SQLite.

Reference surface: docs/enterprise.md:19-21 ("Enterprise API Keys —
advanced API key management with lifecycle controls, rotation policies,
and granular scoping for shared service accounts"). The reference ships
this closed-source; this is a from-prose rebuild on the repo's existing
SQLite metadata machinery (metadata.py) and server auth middleware
(server.py / rest_api.py).

Model
-----
- A key is ``sk_<key_id>.<secret>``: the id is public (listable, used
  for revoke/rotate); the secret is shown ONCE at issue time and only
  its SHA-256 digest is stored — a leaked store cannot mint tokens.
- ``user`` binds the key to a governance principal: queries made with
  the key run under that user's RLS/masking profile, exactly like a
  validated OIDC ``sub`` (server-side override, never client-supplied).
- ``scopes`` is a set of server verbs the key may call
  (``execute sql describe list_sources explain_tree trace ping`` — or
  ``*``). A shared service account gets exactly the verbs it needs.
  ``execute`` implies ``sql``: a remote query always plans
  (get_flight_info -> ``sql``) before it fetches (do_get ->
  ``execute``), so an execute-only key would otherwise be unable to
  run anything. ``sql`` alone stays plan/validate-only.
- Lifecycle: optional ``ttl_seconds`` (expiry), ``revoke`` (immediate),
  and ``rotate`` — issue a successor with identical binding and revoke
  the predecessor after an optional grace window so deployed clients
  can switch without an outage.

Storage is a single table in its own SQLite file (or shared with the
metadata store's file — SQLite handles both), safe for concurrent
issue/verify across threads (WAL + per-call connections).
"""

from __future__ import annotations

import hashlib
import os
import secrets
import sqlite3
import time
from dataclasses import dataclass

from strake_spark.errors import AuthError, ErrorCode

VERBS = frozenset(
    {"execute", "sql", "describe", "list_sources", "explain_tree", "trace", "ping"}
)

# Scope implications: a remote query ALWAYS plans before it fetches
# (the Flight client calls get_flight_info -> 'sql', then do_get ->
# 'execute'), so a key issued with --scopes execute alone could never
# run any query — a footgun, since planning is a strict subset of
# executing. 'execute' therefore implies 'sql'. Grant 'sql' alone for
# plan/validate-only keys.
_IMPLIED = {"sql": frozenset({"execute"})}


def scope_allows(scopes, verb: str) -> bool:
    """Single source of truth for scope checks (KeyInfo.allows and the
    Flight server's middleware check both route here, so implications
    cannot drift between the two enforcement points)."""
    if "*" in scopes or verb in scopes:
        return True
    return any(g in scopes for g in _IMPLIED.get(verb, ()))

_SCHEMA = """
CREATE TABLE IF NOT EXISTS api_keys (
  key_id      TEXT PRIMARY KEY,
  name        TEXT NOT NULL,
  user        TEXT,
  scopes      TEXT NOT NULL,
  secret_hash TEXT NOT NULL,
  created_at  REAL NOT NULL,
  expires_at  REAL,
  revoked_at  REAL,
  rotated_to  TEXT
);
"""


class ApiKeyError(AuthError):
    """Key rejected: unknown, malformed, expired, revoked, or out of
    scope. The message says which — operators debug rotations with it."""

    code = ErrorCode.INVALID_API_KEY


@dataclass(frozen=True)
class KeyInfo:
    key_id: str
    name: str
    user: str | None
    scopes: frozenset[str]
    created_at: float
    expires_at: float | None
    revoked_at: float | None
    rotated_to: str | None

    def allows(self, verb: str) -> bool:
        return scope_allows(self.scopes, verb)


def _hash(secret: str) -> str:
    return hashlib.sha256(secret.encode()).hexdigest()


def _parse_scopes(scopes) -> str:
    if scopes is None:
        return "*"
    if isinstance(scopes, str):
        scopes = [s for s in scopes.replace(",", " ").split() if s]
    vals = sorted({str(s) for s in scopes})
    if vals == ["*"]:
        return "*"
    unknown = [s for s in vals if s not in VERBS]
    if unknown:
        raise ValueError(f"unknown scope(s) {unknown}; valid: {sorted(VERBS)} or '*'")
    return ",".join(vals)


class ApiKeyStore:
    def __init__(self, path: str) -> None:
        self.path = path
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        with self._conn() as con:
            con.executescript(_SCHEMA)

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.path, timeout=30.0)
        con.row_factory = sqlite3.Row
        con.execute("PRAGMA journal_mode=WAL")
        return con

    # --------------------------------------------------------- lifecycle
    def issue(
        self,
        name: str,
        user: str | None = None,
        scopes=None,
        ttl_seconds: float | None = None,
    ) -> tuple[str, KeyInfo]:
        """Mint a key. Returns (full_secret_key, info) — the secret is
        NOT recoverable later; hand it to the caller now."""
        if ttl_seconds is not None and ttl_seconds <= 0:
            raise ValueError("ttl_seconds must be positive (omit for no expiry)")
        key_id = secrets.token_hex(4)
        secret = secrets.token_hex(16)
        now = time.time()
        expires = now + ttl_seconds if ttl_seconds else None
        scope_s = _parse_scopes(scopes)
        with self._conn() as con:
            con.execute(
                "INSERT INTO api_keys (key_id, name, user, scopes, secret_hash,"
                " created_at, expires_at) VALUES (?,?,?,?,?,?,?)",
                (key_id, name, user, scope_s, _hash(secret), now, expires),
            )
        return f"sk_{key_id}.{secret}", self.get(key_id)

    def get(self, key_id: str) -> KeyInfo:
        with self._conn() as con:
            row = con.execute(
                "SELECT * FROM api_keys WHERE key_id = ?", (key_id,)
            ).fetchone()
        if row is None:
            raise ApiKeyError(f"unknown API key id {key_id!r}")
        return self._info(row)

    def list_keys(self) -> list[KeyInfo]:
        with self._conn() as con:
            rows = con.execute(
                "SELECT * FROM api_keys ORDER BY created_at"
            ).fetchall()
        return [self._info(r) for r in rows]

    def revoke(self, key_id: str, at: float | None = None) -> KeyInfo:
        self.get(key_id)  # raise on unknown
        with self._conn() as con:
            con.execute(
                "UPDATE api_keys SET revoked_at = ? WHERE key_id = ?",
                (at if at is not None else time.time(), key_id),
            )
        return self.get(key_id)

    def rotate(
        self, key_id: str, grace_seconds: float = 0.0
    ) -> tuple[str, KeyInfo]:
        """Issue a successor with the SAME name/user/scopes and revoke
        this key ``grace_seconds`` from now (0 = immediately). The old
        row records its successor id, so ``list_keys`` shows the chain."""
        old = self.get(key_id)
        if old.revoked_at is not None:
            raise ApiKeyError(f"key {key_id!r} is already revoked; issue a new key")
        ttl = None
        if old.expires_at is not None:
            # preserve the POLICY (original lifetime), not the residue
            ttl = max(old.expires_at - old.created_at, 1.0)
        new_secret, new_info = self.issue(
            old.name, user=old.user,
            scopes="*" if "*" in old.scopes else sorted(old.scopes),
            ttl_seconds=ttl,
        )
        with self._conn() as con:
            # conditional UPDATE makes the revocation the linearization
            # point: two concurrent rotations of the same key cannot
            # both win — the loser's freshly-issued successor is
            # revoked again and the error surfaces. The raise happens
            # AFTER the transaction commits (``with con`` rolls back on
            # exception, which would resurrect the orphan successor).
            cur = con.execute(
                "UPDATE api_keys SET revoked_at = ?, rotated_to = ?"
                " WHERE key_id = ? AND revoked_at IS NULL",
                (time.time() + max(0.0, grace_seconds), new_info.key_id, key_id),
            )
            lost = cur.rowcount == 0
            if lost:
                con.execute(
                    "UPDATE api_keys SET revoked_at = ? WHERE key_id = ?",
                    (time.time(), new_info.key_id),
                )
        if lost:
            raise ApiKeyError(
                f"key {key_id!r} was rotated concurrently; use the other winner"
            )
        return new_secret, new_info

    # ------------------------------------------------------ verification
    def verify(self, full_key: str, verb: str | None = None) -> KeyInfo:
        """Authenticate ``sk_...`` and (when ``verb`` is given) check
        scope. Raises ApiKeyError with the specific reason."""
        if not full_key.startswith("sk_") or "." not in full_key:
            raise ApiKeyError("malformed API key (expected sk_<id>.<secret>)")
        key_id, _, secret = full_key[3:].partition(".")
        with self._conn() as con:
            row = con.execute(
                "SELECT * FROM api_keys WHERE key_id = ?", (key_id,)
            ).fetchone()
        if row is None:
            raise ApiKeyError("unknown API key")
        import hmac as _hmac

        if not _hmac.compare_digest(row["secret_hash"], _hash(secret)):
            raise ApiKeyError("invalid API key secret")
        info = self._info(row)
        now = time.time()
        if info.revoked_at is not None and now >= info.revoked_at:
            hint = f" (rotated to {info.rotated_to})" if info.rotated_to else ""
            raise ApiKeyError(f"API key {key_id} has been revoked{hint}")
        if info.expires_at is not None and now >= info.expires_at:
            raise ApiKeyError(
                f"API key {key_id} expired", code=ErrorCode.TOKEN_EXPIRED
            )
        if verb is not None and not info.allows(verb):
            # a VALID key without the verb's scope is an authorization
            # denial (4002), not a bad credential (4003) — facades
            # branch 403-vs-401 on the code, not message prose
            raise ApiKeyError(
                f"API key {key_id} lacks scope {verb!r} "
                f"(granted: {','.join(sorted(info.scopes))})",
                code=ErrorCode.AUTHORIZATION_DENIED,
            )
        return info

    @staticmethod
    def _info(row: sqlite3.Row) -> KeyInfo:
        return KeyInfo(
            key_id=row["key_id"],
            name=row["name"],
            user=row["user"],
            scopes=frozenset(row["scopes"].split(",")),
            created_at=row["created_at"],
            expires_at=row["expires_at"],
            revoked_at=row["revoked_at"],
            rotated_to=row["rotated_to"],
        )
