"""GitOps metadata-store lifecycle: diff -> apply -> history ->
rollback, with optimistic locking and destructive-change guards
(reference crates/cli/src/metadata/sqlite.rs + docs/cli-reference.md)."""

from __future__ import annotations

import pytest

from strake_spark.cli import main
from strake_spark.config import load_config
from strake_spark.metadata import DestructiveChange, MetadataStore, VersionConflict
from tests.conftest import SF_DIR

_V1 = """\
sources:
  - name: c
    type: parquet
    url: {sf}
    tables:
      - name: region
        columns:
          - {{name: r_regionkey, type: bigint}}
          - {{name: r_name, type: string}}
"""

_V2 = """\
sources:
  - name: c
    type: parquet
    url: {sf}
    tables:
      - name: region
        columns:
          - {{name: r_regionkey, type: bigint}}
          - {{name: r_name, type: string}}
      - name: nation
  - name: d
    type: parquet
    url: {sf}
    tables:
      - name: orders
"""


@pytest.fixture
def store(tmp_path):
    s = MetadataStore(str(tmp_path / "meta.db"))
    yield s
    s.close()


def _cfg(text, tmp_path, name="sources.yaml"):
    p = tmp_path / name
    p.write_text(text.format(sf=SF_DIR))
    return str(p)


class TestStore:
    def test_apply_then_diff_clean(self, store, tmp_path):
        path = _cfg(_V1, tmp_path)
        cfg = load_config(path)
        out = store.apply("default", cfg, config_yaml=open(path).read(), user="ci")
        assert out["version"] == 2  # fresh domain starts at 1; change bumps
        assert store.diff("default", cfg).empty
        stored = store.get_sources("default")
        assert stored["c"]["tables"]["region"]["columns"] == [
            ("r_regionkey", "bigint"), ("r_name", "string"),
        ]

    def test_diff_detects_adds(self, store, tmp_path):
        store.apply("default", load_config(_cfg(_V1, tmp_path)))
        d = store.diff("default", load_config(_cfg(_V2, tmp_path, "v2.yaml")))
        assert d.sources_added == ["d"]
        assert d.tables_added == ["c.nation"]
        assert not d.sources_removed

    def test_destructive_requires_force(self, store, tmp_path):
        store.apply("default", load_config(_cfg(_V2, tmp_path)))
        v1 = load_config(_cfg(_V1, tmp_path, "v1.yaml"))
        with pytest.raises(DestructiveChange):
            store.apply("default", v1)
        out = store.apply("default", v1, force=True)
        assert "d" not in store.get_sources("default")
        assert out["version"] == 3

    def test_optimistic_locking(self, store, tmp_path):
        cfg = load_config(_cfg(_V1, tmp_path))
        store.apply("default", cfg)
        with pytest.raises(VersionConflict):
            store.apply("default", cfg, expected_version=1)
        # correct expected version passes (no-op apply keeps version)
        out = store.apply("default", cfg, expected_version=2)
        assert out["version"] == 2

    def test_two_writer_race_single_bump(self, tmp_path):
        """TOCTOU guard: writer A holds the write lock (BEGIN IMMEDIATE)
        through its version read; writer B, started while A is mid-apply,
        must serialize after it — one version bump and one history row
        per apply, never two writers both committing the same version."""
        import threading

        db = str(tmp_path / "race.db")
        cfg_a = load_config(_cfg(_V1, tmp_path, "a.yaml"))
        cfg_b = load_config(_cfg(_V2, tmp_path, "b.yaml"))
        a_inside = threading.Event()
        release_a = threading.Event()
        errors: list[Exception] = []

        orig_diff = MetadataStore.diff

        def slow_diff(self, domain, cfg):
            # diff runs inside the apply transaction, after the version
            # read — pausing here holds the race window open
            a_inside.set()
            release_a.wait(timeout=10)
            return orig_diff(self, domain, cfg)

        def writer_a():
            s = MetadataStore(db)
            try:
                MetadataStore.diff = slow_diff
                s.apply("default", cfg_a, user="a")
            except Exception as e:  # pragma: no cover
                errors.append(e)
            finally:
                MetadataStore.diff = orig_diff
                s.close()

        def writer_b():
            s = MetadataStore(db)
            try:
                s.apply("default", cfg_b, user="b")
            except Exception as e:  # pragma: no cover
                errors.append(e)
            finally:
                s.close()

        ta = threading.Thread(target=writer_a)
        ta.start()
        assert a_inside.wait(timeout=10)
        tb = threading.Thread(target=writer_b)
        tb.start()
        tb.join(timeout=0.5)
        assert tb.is_alive()  # B is blocked behind A's write lock
        release_a.set()
        ta.join(timeout=10)
        tb.join(timeout=10)
        assert not errors, errors

        check = MetadataStore(db)
        try:
            assert check.get_domain_version("default") == 3  # 1 -> 2 -> 3
            hist = check.history("default")
            versions = [h["version"] for h in hist]
            assert sorted(versions) == [2, 3]  # exactly one row per bump
        finally:
            check.close()

    def test_history_and_rollback(self, store, tmp_path):
        p1 = _cfg(_V1, tmp_path, "a.yaml")
        p2 = _cfg(_V2, tmp_path, "b.yaml")
        store.apply("default", load_config(p1), config_yaml=open(p1).read())
        store.apply("default", load_config(p2), config_yaml=open(p2).read())
        hist = store.history("default")
        assert [h["version"] for h in hist] == [3, 2]
        out = store.rollback("default", 2)
        assert out["version"] == 4  # append-only audit trail
        assert "d" not in store.get_sources("default")
        assert sorted(store.get_sources("default")["c"]["tables"]) == ["region"]

    def test_source_option_change_bumps_version(self, store, tmp_path):
        """Source-level fields with no structural rows (options,
        default_limit, credentials identity) must still diff and bump —
        otherwise credential/endpoint changes are silent no-ops."""
        p = _cfg(_V1, tmp_path)
        store.apply("default", load_config(p), config_yaml=open(p).read())
        changed = _cfg(
            _V1.replace("type: parquet", "type: parquet\n    default_limit: 99"),
            tmp_path, "changed.yaml",
        )
        cfg2 = load_config(changed)
        d = store.diff("default", cfg2)
        assert d.sources_changed == ["c"] and not d.empty
        out = store.apply("default", cfg2, config_yaml=open(changed).read())
        assert out["version"] == 3
        # and a true no-op apply writes NO history row
        hist_before = len(store.history("default"))
        out2 = store.apply("default", cfg2)
        assert out2["version"] == 3
        assert len(store.history("default")) == hist_before

    def test_domain_listing(self, store, tmp_path):
        store.apply("alpha", load_config(_cfg(_V1, tmp_path)))
        store.apply("beta", load_config(_cfg(_V1, tmp_path)))
        assert [d["name"] for d in store.list_domains()] == ["alpha", "beta"]


class TestCliLifecycle:
    def test_diff_apply_roundtrip(self, tmp_path, capsys):
        cfg = _cfg(_V1, tmp_path)
        db = str(tmp_path / "meta.db")
        assert main(["diff", cfg, "--store", db]) == 2
        assert "+ source c" in capsys.readouterr().out
        assert main(["apply", cfg, "--store", db, "--user", "ci"]) == 0
        assert "version 2" in capsys.readouterr().out
        assert main(["diff", cfg, "--store", db]) == 0
        assert "no changes" in capsys.readouterr().out

    def test_apply_dry_run_persists_nothing(self, tmp_path, capsys):
        cfg = _cfg(_V1, tmp_path)
        db = str(tmp_path / "meta.db")
        assert main(["apply", cfg, "--store", db, "--dry-run"]) == 0
        assert "dry-run" in capsys.readouterr().out
        assert main(["diff", cfg, "--store", db]) == 2  # still unapplied

    def test_apply_refuses_destructive(self, tmp_path, capsys):
        v2 = _cfg(_V2, tmp_path, "v2.yaml")
        v1 = _cfg(_V1, tmp_path, "v1.yaml")
        db = str(tmp_path / "meta.db")
        assert main(["apply", v2, "--store", db]) == 0
        capsys.readouterr()
        assert main(["apply", v1, "--store", db]) == 5  # VALIDATION_ERROR (r13 structured exit codes)
        assert "REFUSED" in capsys.readouterr().err
        assert main(["apply", v1, "--store", db, "--force"]) == 0

    def test_domain_history_and_rollback(self, tmp_path, capsys):
        v1 = _cfg(_V1, tmp_path, "v1.yaml")
        v2 = _cfg(_V2, tmp_path, "v2.yaml")
        db = str(tmp_path / "meta.db")
        main(["apply", v1, "--store", db])
        main(["apply", v2, "--store", db])
        capsys.readouterr()
        assert main(["domain", "list", "--store", db]) == 0
        assert "default\tv3" in capsys.readouterr().out
        assert main(["domain", "history", "--store", db]) == 0
        out = capsys.readouterr().out
        assert "v3" in out and "v2" in out
        assert main(["domain", "rollback", "--store", db, "--to-version", "2"]) == 0
        assert "new version 4" in capsys.readouterr().out

    def test_introspect_lists_source_tables(self, tmp_path, capsys):
        cfg = _cfg(_V1, tmp_path)
        assert main(["introspect", "c", cfg, "-v"]) == 0
        out = capsys.readouterr().out
        assert "c_region" in out and "r_regionkey" in out

    def test_add_introspects_and_appends(self, tmp_path, capsys):
        cfg = _cfg(_V1, tmp_path)
        assert main(["add", "c", "nation", cfg]) == 0
        assert "added c.nation" in capsys.readouterr().out
        new = load_config(cfg)
        (src,) = new.sources
        nation = next(t for t in src.tables if t.name == "nation")
        assert {c.name for c in nation.columns} >= {"n_nationkey", "n_name"}
        # idempotent
        assert main(["add", "c", "nation", cfg]) == 0
        assert "already configured" in capsys.readouterr().out
