"""Structured CLI exit codes (reference crates/cli/src/exit_codes.rs):
CI branches on the status, not stderr text."""

from __future__ import annotations

import pytest

from strake_spark import exit_codes
from strake_spark.cli import main


class TestExitCodes:
    def test_table_matches_reference(self):
        assert exit_codes.SUCCESS == 0
        assert exit_codes.GENERAL_ERROR == 1
        assert exit_codes.USAGE_ERROR == 2
        assert exit_codes.CONFIG_ERROR == 3
        assert exit_codes.CONNECTION_ERROR == 4
        assert exit_codes.VALIDATION_ERROR == 5
        assert exit_codes.CONFLICT_ERROR == 6
        assert exit_codes.PERMISSION_ERROR == 7
        assert exit_codes.PARTIAL_FAILURE == 8

    def test_validate_config_parse_error(self, tmp_path):
        bad = tmp_path / "bad.yaml"
        bad.write_text("sources: [unclosed")
        assert main(["validate", str(bad)]) == exit_codes.CONFIG_ERROR

    def test_validate_schema_problem(self, tmp_path, capsys):
        cfg = tmp_path / "s.yaml"
        cfg.write_text(
            "sources:\n  - name: x\n    type: not_a_real_type\n"
            "    url: /nope\n    tables: [{name: t}]\n"
        )
        assert main(["validate", str(cfg)]) == exit_codes.VALIDATION_ERROR

    def test_validate_ok(self, tmp_path):
        from tests.conftest import SF_DIR

        cfg = tmp_path / "ok.yaml"
        cfg.write_text(
            f"sources:\n  - name: x\n    type: parquet\n    url: {SF_DIR}\n"
            "    tables: [{name: nation}]\n"
        )
        assert main(["validate", str(cfg)]) == exit_codes.SUCCESS

    def test_usage_error_is_2(self):
        with pytest.raises(SystemExit) as e:
            main(["no-such-command"])
        assert e.value.code == exit_codes.USAGE_ERROR

    def test_apply_version_conflict(self, tmp_path):
        from tests.conftest import SF_DIR

        cfg = tmp_path / "s.yaml"
        cfg.write_text(
            f"sources:\n  - name: x\n    type: parquet\n    url: {SF_DIR}\n"
            "    tables: [{name: nation}]\n"
        )
        store = str(tmp_path / "meta.db")
        assert main(["apply", str(cfg), "--store", store]) == 0
        # stale optimistic-lock expectation -> CONFLICT_ERROR
        cfg.write_text(
            f"sources:\n  - name: x\n    type: parquet\n    url: {SF_DIR}\n"
            "    tables: [{name: nation}, {name: region}]\n"
        )
        rc = main(["apply", str(cfg), "--store", store, "--expected-version", "99"])
        assert rc == exit_codes.CONFLICT_ERROR

    def test_governance_refusal_is_permission_error(self, tmp_path, spark):
        from tests.conftest import SF_DIR

        cfg = tmp_path / "s.yaml"
        cfg.write_text(
            f"sources:\n  - name: x\n    type: parquet\n    url: {SF_DIR}\n"
            "    tables: [{name: nation}]\n"
        )
        rc = main(["query", str(cfg), "DROP TABLE x_nation"])
        assert rc == exit_codes.PERMISSION_ERROR

    def test_test_connection_failure_is_connection_error(self, tmp_path):
        cfg = tmp_path / "s.yaml"
        cfg.write_text(
            "sources:\n  - name: x\n    type: parquet\n    url: /no/such/dir\n"
            "    tables: [{name: nation}]\n"
        )
        rc = main(["test-connection", str(cfg)])
        assert rc == exit_codes.CONNECTION_ERROR


class TestStructuredOutput:
    """reference crates/cli/src/output.rs: --output json|yaml prints ONE
    machine-parseable response envelope (status/message/exit_code +
    flattened data); human mode keeps the prose lines."""

    def _cfg(self, tmp_path):
        from tests.conftest import SF_DIR

        cfg = tmp_path / "ok.yaml"
        cfg.write_text(
            f"sources:\n  - name: x\n    type: parquet\n    url: {SF_DIR}\n"
            "    tables: [{name: nation}]\n"
        )
        return cfg

    def test_validate_json_envelope(self, tmp_path, capsys):
        import json

        cfg = self._cfg(tmp_path)
        assert main(["validate", str(cfg), "--output", "json"]) == 0
        doc = json.loads(capsys.readouterr().out)
        assert doc == {"status": "success", "exit_code": 0,
                       "sources": 1, "contracts": 0}

    def test_validate_error_envelope_carries_problems(self, tmp_path, capsys):
        import json

        cfg = tmp_path / "bad.yaml"
        cfg.write_text(
            "sources:\n  - name: x\n    type: nosuchtype\n    url: /tmp\n"
        )
        rc = main(["validate", str(cfg), "--output", "json"])
        assert rc == exit_codes.VALIDATION_ERROR
        doc = json.loads(capsys.readouterr().out)
        assert doc["status"] == "error"
        assert doc["exit_code"] == exit_codes.VALIDATION_ERROR
        assert any("nosuchtype" in p for p in doc["problems"])

    def test_diff_yaml_envelope(self, tmp_path, capsys):
        import yaml

        cfg = self._cfg(tmp_path)
        store = str(tmp_path / "meta.db")
        rc = main(["diff", str(cfg), "--store", store, "--output", "yaml"])
        assert rc == 2  # differences against an empty store
        doc = yaml.safe_load(capsys.readouterr().out)
        assert doc["status"] == "success" and doc["exit_code"] == 2
        assert doc["empty"] is False and doc["changes"]

    def test_metadata_db_env_override(self, tmp_path, capsys, monkeypatch):
        """reference cli/tests/log_locations.rs: STRAKE_METADATA_DB wins
        over the default store path when --store is absent."""
        cfg = self._cfg(tmp_path)
        db = tmp_path / "override.db"
        monkeypatch.setenv("STRAKE_METADATA_DB", str(db))
        assert main(["apply", str(cfg)]) == 0
        assert db.exists()
        capsys.readouterr()
