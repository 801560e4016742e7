"""Regression tests for the r8 ADVICE config/remote/materialize fixes:
explicit zeros are settings (not absences), nested url spellings never
leak into options, user_slots values validate at parse time, version
directories are reserved under the lock, and remote error translation
matches only the structured STRAKE_ERR marker."""

from __future__ import annotations

import pytest

from strake_spark.config import parse_config


class TestExplicitZeroSettings:
    def test_connection_budget_zero_is_zero(self):
        assert parse_config(
            {"sources": [], "server": {"global_connection_budget": 0}}
        ).global_connection_budget == 0
        assert parse_config(
            {"sources": [], "global_connection_budget": 0}
        ).global_connection_budget == 0

    def test_budget_absent_defaults(self):
        assert parse_config({"sources": []}).global_connection_budget == 100

    def test_cache_size_zero_is_zero_both_spellings(self):
        assert parse_config(
            {"sources": [], "cache": {"enabled": True, "max_size_mb": 0}}
        ).cache.max_mb == 0
        assert parse_config(
            {"sources": [], "cache": {"enabled": True, "max_mb": 0}}
        ).cache.max_mb == 0
        assert parse_config({"sources": []}).cache.max_mb == 2048

    def test_user_slots_zero_rejected_at_parse(self):
        with pytest.raises(ValueError, match="user_slots"):
            parse_config({"sources": [], "user_slots": {"bob": 0}})
        with pytest.raises(ValueError, match="default_user_slots"):
            parse_config({"sources": [], "default_user_slots": 0})

    def test_user_slots_positive_ok(self):
        c = parse_config({"sources": [], "user_slots": {"bob": 2}})
        assert c.user_slots == {"bob": 2}


class TestNestedUrlPrecedence:
    def test_nested_base_url_never_leaks_into_options(self):
        s = parse_config({"sources": [{
            "name": "r", "type": "rest", "url": "http://top",
            "config": {"base_url": "http://nested", "page_size": 5},
        }]}).sources[0]
        assert s.url == "http://top"
        assert "base_url" not in s.options and "url" not in s.options
        assert s.options["page_size"] == 5

    def test_nested_url_used_when_no_top_level(self):
        s = parse_config({"sources": [{
            "name": "r", "type": "rest",
            "config": {"base_url": "http://nested"},
        }]}).sources[0]
        assert s.url == "http://nested"


class TestRemoteErrorMarker:
    def test_marker_is_authoritative(self):
        from strake_spark.errors import QueryRejected
        from strake_spark.remote import _translate

        e = _translate(Exception(
            "gRPC error: STRAKE_ERR:QueryRejected:only SELECT is allowed"
        ))
        assert isinstance(e, QueryRejected)
        assert "only SELECT is allowed" in str(e)

    def test_echoed_sql_no_longer_misclassifies(self):
        # the failure mode: a server error whose text merely CONTAINS a
        # class name inside the echoed SQL payload
        from strake_spark.remote import _translate

        e = _translate(Exception(
            "Flight RPC failed: while running 'SELECT 'QueryRejected' AS tag': disk full"
        ))
        assert e is None  # not a governed error; stays a transport error

    def test_legacy_frame_prefix_still_translates(self):
        from strake_spark.errors import BudgetExceeded
        from strake_spark.remote import _translate

        e = _translate(Exception("BudgetExceeded: estimated 10GB > 1GB limit"))
        assert isinstance(e, BudgetExceeded)


class TestMaterializeVersionReservation:
    def test_reserved_versions_are_unique_under_concurrency(self, tmp_path):
        import threading

        from strake_spark.materialize import Materializer

        m = Materializer.__new__(Materializer)
        m.base = str(tmp_path)
        m._lock = threading.Lock()
        out: list[str] = []
        olock = threading.Lock()

        def grab():
            for _ in range(20):
                v, _d = m._reserve_version("v1")
                with olock:
                    out.append(v)

        ts = [threading.Thread(target=grab) for _ in range(8)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(out) == 160
        assert len(set(out)) == 160  # no duplicate version ever handed out


class TestSplitFileConfig:
    """Reference split-file convention (python-api.md:11-31): engine
    settings in strake.yaml, sources in sources.yaml — explicit path or
    auto-discovered next to the main file."""

    def _write(self, tmp_path, name, text):
        p = tmp_path / name
        p.write_text(text)
        return str(p)

    def test_explicit_sources_config(self, tmp_path):
        from strake_spark.config import load_config

        main = self._write(tmp_path, "strake.yaml", "global_connection_budget: 7\n")
        src = self._write(
            tmp_path / "..", "sources-elsewhere.yaml",
            "sources:\n- name: t\n  type: parquet\n  url: /data\n",
        )
        cfg = load_config(main, sources_path=src)
        assert cfg.global_connection_budget == 7
        assert [s.name for s in cfg.sources] == ["t"]

    def test_sources_yaml_autodiscovered_next_to_main(self, tmp_path):
        from strake_spark.config import load_config

        main = self._write(tmp_path, "strake.yaml", "global_connection_budget: 9\n")
        self._write(
            tmp_path, "sources.yaml",
            "sources:\n- name: auto\n  type: parquet\n  url: /data\n"
            "contracts:\n  contracts: []\n",
        )
        cfg = load_config(main)
        assert cfg.global_connection_budget == 9
        assert [s.name for s in cfg.sources] == ["auto"]

    def test_bare_list_sources_file(self, tmp_path):
        from strake_spark.config import load_config

        main = self._write(tmp_path, "strake.yaml", "{}\n")
        self._write(tmp_path, "sources.yaml", "- name: l\n  type: parquet\n  url: /d\n")
        cfg = load_config(main)
        assert [s.name for s in cfg.sources] == ["l"]

    def test_main_file_sources_win(self, tmp_path):
        from strake_spark.config import load_config

        main = self._write(
            tmp_path, "all-in-one.yaml",
            "sources:\n- name: main\n  type: parquet\n  url: /m\n",
        )
        self._write(tmp_path, "sources.yaml", "- name: shadow\n  type: parquet\n  url: /s\n")
        cfg = load_config(main)
        assert [s.name for s in cfg.sources] == ["main"]

    def test_sources_yaml_as_main_does_not_merge_itself(self, tmp_path):
        from strake_spark.config import load_config

        main = self._write(
            tmp_path, "sources.yaml",
            "sources:\n- name: only\n  type: parquet\n  url: /o\n",
        )
        cfg = load_config(main)
        assert [s.name for s in cfg.sources] == ["only"]
