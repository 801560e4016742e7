"""SQLite metadata store for GitOps config lifecycle.

Mirrors the reference CLI's deployment database
(crates/cli/src/metadata/sqlite.rs): domains carry a monotonically
increasing version; `apply` upserts the declared sources/tables/columns
inside one transaction, bumps the version, and records an audit row
(apply_history) holding the full config YAML — which is what makes
`domain history` and `domain rollback --to-version` possible.

Concurrency model matches the reference: optimistic locking via
`expected_version` (the apply fails if someone else bumped the domain
since you last read it), destructive changes (source deletion) require
`force`.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3
from dataclasses import dataclass, field
from typing import Any

from strake_spark.config import EngineConfig
from strake_spark.errors import ErrorCode, StrakeError

_SCHEMA = """
CREATE TABLE IF NOT EXISTS schema_migrations (
    name TEXT PRIMARY KEY,
    applied_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS domains (
    name TEXT PRIMARY KEY,
    version INTEGER NOT NULL DEFAULT 1,
    created_at TEXT DEFAULT CURRENT_TIMESTAMP
);
CREATE TABLE IF NOT EXISTS sources (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    domain_name TEXT NOT NULL REFERENCES domains(name),
    name TEXT NOT NULL,
    type TEXT NOT NULL,
    url TEXT,
    username TEXT,
    fingerprint TEXT,
    UNIQUE (domain_name, name)
);
CREATE TABLE IF NOT EXISTS tables (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    source_id INTEGER NOT NULL REFERENCES sources(id) ON DELETE CASCADE,
    name TEXT NOT NULL,
    schema_name TEXT,
    partition_column TEXT,
    path TEXT,
    UNIQUE (source_id, name)
);
CREATE TABLE IF NOT EXISTS columns (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    table_id INTEGER NOT NULL REFERENCES tables(id) ON DELETE CASCADE,
    name TEXT NOT NULL,
    data_type TEXT,
    position INTEGER,
    UNIQUE (table_id, name)
);
CREATE TABLE IF NOT EXISTS apply_history (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    domain_name TEXT NOT NULL,
    version INTEGER NOT NULL,
    user_id TEXT,
    sources_added INTEGER DEFAULT 0,
    sources_deleted INTEGER DEFAULT 0,
    tables_modified INTEGER DEFAULT 0,
    config_hash TEXT,
    config_yaml TEXT,
    timestamp TEXT DEFAULT CURRENT_TIMESTAMP
);
"""


class VersionConflict(StrakeError):
    """Optimistic-locking failure: domain version moved underneath you."""

    code = ErrorCode.CONFIG_ERROR


class DestructiveChange(StrakeError):
    """Apply would delete sources/tables; re-run with force=True."""


@dataclass
class DiffResult:
    sources_added: list[str] = field(default_factory=list)
    sources_removed: list[str] = field(default_factory=list)
    sources_changed: list[str] = field(default_factory=list)
    tables_added: list[str] = field(default_factory=list)
    tables_removed: list[str] = field(default_factory=list)
    columns_changed: list[str] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return not (
            self.sources_added or self.sources_removed or self.sources_changed
            or self.tables_added or self.tables_removed or self.columns_changed
        )

    def lines(self) -> list[str]:
        out = []
        out += [f"+ source {s}" for s in self.sources_added]
        out += [f"- source {s}" for s in self.sources_removed]
        out += [f"~ source {s}" for s in self.sources_changed]
        out += [f"+ table {t}" for t in self.tables_added]
        out += [f"- table {t}" for t in self.tables_removed]
        out += [f"~ columns {t}" for t in self.columns_changed]
        return out or ["no changes"]


def _source_fingerprint(s) -> str:
    """Hash of every source-level field that isn't structurally stored
    (options, credentials identity, limits): a change to any of them
    must surface in diff and bump the version, or applies become silent
    no-ops with ambiguous history rows."""
    blob = json.dumps(
        {
            "url": s.url,
            "username": s.username,
            "default_limit": s.default_limit,
            "cache": s.cache,
            "max_concurrent_queries": s.max_concurrent_queries,
            "options": {k: str(v) for k, v in sorted(s.options.items())},
        },
        sort_keys=True,
    )
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _config_shape(cfg: EngineConfig) -> dict[str, dict]:
    """{source: {meta..., tables: {table: {cols...}}}} comparison shape."""
    out: dict[str, dict] = {}
    for s in cfg.sources:
        tables = {}
        for t in s.tables:
            tables[t.name] = {
                "schema": t.schema,
                "partition_column": t.partition_column,
                "path": t.path,
                "columns": [(c.name, c.type) for c in t.columns],
            }
        out[s.name] = {
            "type": s.type,
            "url": s.url,
            "username": s.username,
            "fingerprint": _source_fingerprint(s),
            "tables": tables,
        }
    return out


class MetadataStore:
    def __init__(self, path: str, db=None) -> None:
        """``db`` (optional): a sqlite3-Connection-shaped adapter —
        execute(sql, params) -> cursor with fetchone/fetchall/rowcount,
        commit/rollback/close, init_schema() — letting the SAME domain
        logic (diff/apply/optimistic lock/history/rollback) run against
        other backends. metadata_pg.PgWireDb is the Postgres one
        (reference crates/cli/src/metadata/postgres.rs); default is the
        local SQLite file, unchanged."""
        self.path = path
        if db is not None:
            self.con = db
            db.init_schema()
            return
        self.con = sqlite3.connect(path)
        self.con.execute("PRAGMA foreign_keys = ON")
        self.con.executescript(_SCHEMA)
        self.con.execute(
            "INSERT OR IGNORE INTO schema_migrations (name) VALUES ('v1_base')"
        )
        self.con.commit()

    def close(self) -> None:
        self.con.close()

    # ------------------------------------------------------------- domains
    def get_domain_version(self, domain: str) -> int:
        cur = self.con.execute("SELECT version FROM domains WHERE name = ?", (domain,))
        row = cur.fetchone()
        if row is None:
            self.con.execute(
                "INSERT OR IGNORE INTO domains (name, version) VALUES (?, 1)", (domain,)
            )
            self.con.commit()
            return 1
        return int(row[0])

    def list_domains(self) -> list[dict[str, Any]]:
        cur = self.con.execute(
            "SELECT name, version, created_at FROM domains ORDER BY name"
        )
        return [
            {"name": n, "version": v, "created_at": c} for n, v, c in cur.fetchall()
        ]

    # -------------------------------------------------------------- stored
    def get_sources(self, domain: str) -> dict[str, dict]:
        """Stored config in the same comparison shape as _config_shape."""
        out: dict[str, dict] = {}
        for sid, name, stype, url, username, fp in self.con.execute(
            "SELECT id, name, type, url, username, fingerprint FROM sources "
            "WHERE domain_name = ? ORDER BY name",
            (domain,),
        ).fetchall():
            tables: dict[str, dict] = {}
            for tid, tname, schema_name, part, tpath in self.con.execute(
                "SELECT id, name, schema_name, partition_column, path FROM tables "
                "WHERE source_id = ? ORDER BY name",
                (sid,),
            ).fetchall():
                cols = self.con.execute(
                    "SELECT name, data_type FROM columns WHERE table_id = ? ORDER BY position",
                    (tid,),
                ).fetchall()
                tables[tname] = {
                    "schema": schema_name,
                    "partition_column": part,
                    "path": tpath,
                    "columns": [(c, d) for c, d in cols],
                }
            out[name] = {
                "type": stype, "url": url, "username": username,
                "fingerprint": fp, "tables": tables,
            }
        return out

    # ---------------------------------------------------------------- diff
    def diff(self, domain: str, cfg: EngineConfig) -> DiffResult:
        local = _config_shape(cfg)
        stored = self.get_sources(domain)
        d = DiffResult()
        d.sources_added = sorted(set(local) - set(stored))
        d.sources_removed = sorted(set(stored) - set(local))
        for sname in sorted(set(local) & set(stored)):
            ls, ss = local[sname], stored[sname]
            if (ls["type"], ls["url"], ls["username"], ls["fingerprint"]) != (
                ss["type"], ss["url"], ss["username"], ss["fingerprint"]
            ):
                d.sources_changed.append(sname)
            lt, st = ls["tables"], ss["tables"]
            d.tables_added += [f"{sname}.{t}" for t in sorted(set(lt) - set(st))]
            d.tables_removed += [f"{sname}.{t}" for t in sorted(set(st) - set(lt))]
            for tname in sorted(set(lt) & set(st)):
                if {k: v for k, v in lt[tname].items()} != {k: v for k, v in st[tname].items()}:
                    d.columns_changed.append(f"{sname}.{tname}")
        return d

    # --------------------------------------------------------------- apply
    def apply(
        self,
        domain: str,
        cfg: EngineConfig,
        *,
        config_yaml: str = "",
        user: str | None = None,
        force: bool = False,
        expected_version: int | None = None,
    ) -> dict[str, Any]:
        local = _config_shape(cfg)
        con = self.con
        try:
            # BEGIN IMMEDIATE takes the write lock BEFORE the version
            # read, serializing concurrent applies across connections/
            # processes. A plain check-then-BEGIN lets two writers both
            # read version N and both commit N+1 with duplicate history
            # rows (TOCTOU on the optimistic lock).
            con.execute("BEGIN IMMEDIATE")
            con.execute(
                "INSERT OR IGNORE INTO domains (name, version) VALUES (?, 1)",
                (domain,),
            )
            current = int(
                con.execute(
                    "SELECT version FROM domains WHERE name = ?", (domain,)
                ).fetchone()[0]
            )
            if expected_version is not None and current != expected_version:
                raise VersionConflict(
                    f"domain {domain!r} is at version {current}, "
                    f"expected {expected_version}"
                )
            d = self.diff(domain, cfg)
            if (d.sources_removed or d.tables_removed) and not force:
                raise DestructiveChange(
                    f"apply would remove sources={d.sources_removed} "
                    f"tables={d.tables_removed}; re-run with force"
                )
            if d.empty:
                # No-op apply: nothing persisted, no history row — a
                # second row on the same version would make rollback
                # ambiguous. Commit (not rollback) so a domain row
                # created above for a brand-new empty domain persists.
                con.commit()
                return {"domain": domain, "version": current, "diff": d.lines()}
            # full declarative sync: upsert declared, delete undeclared
            for sname in d.sources_removed:
                sid = con.execute(
                    "SELECT id FROM sources WHERE domain_name = ? AND name = ?",
                    (domain, sname),
                ).fetchone()[0]
                con.execute("DELETE FROM sources WHERE id = ?", (sid,))
            for sname, s in local.items():
                con.execute(
                    "INSERT INTO sources (domain_name, name, type, url, username, fingerprint) "
                    "VALUES (?,?,?,?,?,?) "
                    "ON CONFLICT(domain_name, name) DO UPDATE SET type=excluded.type, "
                    "url=excluded.url, username=excluded.username, "
                    "fingerprint=excluded.fingerprint",
                    (domain, sname, s["type"], s["url"], s["username"], s["fingerprint"]),
                )
                sid = con.execute(
                    "SELECT id FROM sources WHERE domain_name = ? AND name = ?",
                    (domain, sname),
                ).fetchone()[0]
                declared = set(s["tables"])
                for (tid, tname) in con.execute(
                    "SELECT id, name FROM tables WHERE source_id = ?", (sid,)
                ).fetchall():
                    if tname not in declared:
                        con.execute("DELETE FROM tables WHERE id = ?", (tid,))
                for tname, t in s["tables"].items():
                    con.execute(
                        "INSERT INTO tables (source_id, name, schema_name, partition_column, path) "
                        "VALUES (?,?,?,?,?) ON CONFLICT(source_id, name) DO UPDATE SET "
                        "schema_name=excluded.schema_name, "
                        "partition_column=excluded.partition_column, path=excluded.path",
                        (sid, tname, t["schema"], t["partition_column"], t["path"]),
                    )
                    tid = con.execute(
                        "SELECT id FROM tables WHERE source_id = ? AND name = ?",
                        (sid, tname),
                    ).fetchone()[0]
                    con.execute("DELETE FROM columns WHERE table_id = ?", (tid,))
                    for pos, (cname, ctype) in enumerate(t["columns"]):
                        con.execute(
                            "INSERT INTO columns (table_id, name, data_type, position) "
                            "VALUES (?,?,?,?)",
                            (tid, cname, ctype, pos),
                        )
            new_version = current + 1
            cur = con.execute(
                "UPDATE domains SET version = ? WHERE name = ? AND version = ?",
                (new_version, domain, current),
            )
            if cur.rowcount != 1:  # belt-and-braces under the write lock
                raise VersionConflict(
                    f"domain {domain!r} moved past version {current} during apply"
                )
            con.execute(
                "INSERT INTO apply_history (domain_name, version, user_id, sources_added, "
                "sources_deleted, tables_modified, config_hash, config_yaml) "
                "VALUES (?,?,?,?,?,?,?,?)",
                (
                    domain,
                    new_version,
                    user,
                    len(d.sources_added),
                    len(d.sources_removed),
                    len(d.tables_added) + len(d.tables_removed) + len(d.columns_changed),
                    hashlib.sha256(config_yaml.encode()).hexdigest()[:16],
                    config_yaml,
                ),
            )
            con.commit()
        except Exception:
            con.rollback()
            raise
        return {"domain": domain, "version": new_version, "diff": d.lines()}

    # ------------------------------------------------------------- history
    def history(self, domain: str) -> list[dict[str, Any]]:
        cur = self.con.execute(
            "SELECT version, user_id, sources_added, sources_deleted, tables_modified, "
            "config_hash, timestamp FROM apply_history WHERE domain_name = ? "
            "ORDER BY id DESC",
            (domain,),
        )
        return [
            {
                "version": v, "user": u, "sources_added": sa, "sources_deleted": sd,
                "tables_modified": tm, "config_hash": h, "timestamp": ts,
            }
            for v, u, sa, sd, tm, h, ts in cur.fetchall()
        ]

    def get_history_config(self, domain: str, version: int) -> str:
        row = self.con.execute(
            "SELECT config_yaml FROM apply_history WHERE domain_name = ? AND version = ? "
            "ORDER BY id DESC LIMIT 1",
            (domain, version),
        ).fetchone()
        if row is None:
            raise StrakeError(f"no recorded apply for {domain!r} version {version}")
        return row[0]

    def rollback(self, domain: str, to_version: int, user: str | None = None) -> dict[str, Any]:
        """Re-apply the config recorded at ``to_version`` as a NEW
        version (audit trail stays append-only, like the reference)."""
        import yaml

        from strake_spark.config import parse_config

        config_yaml = self.get_history_config(domain, to_version)
        cfg = parse_config(yaml.safe_load(config_yaml) or {})
        return self.apply(
            domain, cfg, config_yaml=config_yaml, user=user, force=True
        )
