"""License cache/monitor + audit-log scrubber parity
(crates/server/src/license.rs, crates/common/src/scrubber.rs) and
their enforcement in both server facades."""

from __future__ import annotations

import threading
import time

import pytest

from strake_spark.license import (
    LicenseCache,
    LicenseState,
    start_license_monitor,
)
from strake_spark.scrubber import scrub


class TestScrubber:
    """Vectors lifted from the reference's own tests
    (crates/common/src/scrubber.rs:55-87)."""

    def test_email(self):
        assert (
            scrub("SELECT * FROM users WHERE email = 'test@example.com'")
            == "SELECT * FROM users WHERE email = '[EMAIL]'"
        )

    def test_ssn(self):
        assert (
            scrub("INSERT INTO sensitive (ssn) VALUES ('123-45-6789')")
            == "INSERT INTO sensitive (ssn) VALUES ('[SSN]')"
        )

    def test_credit_card(self):
        assert (
            scrub("The card number is 1234-5678-9012-3456.")
            == "The card number is [CREDIT_CARD]."
        )

    def test_phone(self):
        assert (
            scrub("Call me at 123-456-7890 or (555) 123-4567")
            == "Call me at [PHONE] or [PHONE]"
        )

    def test_mixed(self):
        assert (
            scrub("User test@test.com with SSN 000-00-0000 checked out.")
            == "User [EMAIL] with SSN [SSN] checked out."
        )

    def test_plain_sql_untouched(self):
        q = "SELECT n_name, count(*) FROM nation GROUP BY n_name"
        assert scrub(q) == q


class TestLicenseCache:
    def test_defaults_valid(self):
        c = LicenseCache()
        assert c.current_state() is LicenseState.VALID
        assert c.last_check() == 0.0

    def test_update_records_time(self):
        c = LicenseCache()
        c.update_state(LicenseState.DEGRADED)
        assert c.current_state() is LicenseState.DEGRADED
        assert c.last_check() == pytest.approx(time.time(), abs=5)


class TestLicenseMonitor:
    def test_immediate_first_check_and_transition(self):
        states = [LicenseState.INVALID, LicenseState.VALID]

        class _Val:
            def validate(self):
                return states.pop(0) if states else LicenseState.VALID

        cache = LicenseCache()
        t, stop = start_license_monitor(_Val(), cache, check_interval=0.05)
        try:
            deadline = time.time() + 5
            while cache.current_state() is not LicenseState.INVALID and time.time() < deadline:
                time.sleep(0.01)
            assert cache.current_state() is LicenseState.INVALID  # first check ran
            while cache.current_state() is not LicenseState.VALID and time.time() < deadline:
                time.sleep(0.01)
            assert cache.current_state() is LicenseState.VALID  # re-validated
        finally:
            stop.set()
            t.join(timeout=5)

    def test_validator_error_keeps_cached_state(self):
        calls = {"n": 0}

        class _Flaky:
            def validate(self):
                calls["n"] += 1
                if calls["n"] == 1:
                    return LicenseState.DEGRADED
                raise RuntimeError("license endpoint down")

        cache = LicenseCache()
        t, stop = start_license_monitor(_Flaky(), cache, check_interval=0.05)
        try:
            deadline = time.time() + 5
            while calls["n"] < 3 and time.time() < deadline:
                time.sleep(0.01)
            assert cache.current_state() is LicenseState.DEGRADED  # kept
        finally:
            stop.set()
            t.join(timeout=5)


@pytest.fixture(scope="module")
def lic_engine(spark):
    import strake_spark as ss
    from tests.conftest import SF_DIR

    return ss.connect(
        {"sources": [{"name": "lic", "type": "parquet", "url": SF_DIR,
                      "tables": [{"name": "nation"}]}]},
        spark=spark,
    )


class TestRestEnforcement:
    def _post_query(self, port, sql):
        import json
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/v1/query",
            data=json.dumps({"sql": sql}).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    def test_invalid_license_rejects_then_recovers(self, lic_engine):
        from strake_spark.rest_api import make_rest_server

        cache = LicenseCache()
        srv = make_rest_server(lic_engine, license_cache=cache).start()
        try:
            q = "SELECT count(*) AS n FROM lic_nation"
            code, body = self._post_query(srv.port, q)
            assert code == 200 and body["status"] == "success"

            cache.update_state(LicenseState.INVALID)
            code, body = self._post_query(srv.port, q)
            assert code == 403
            assert body["status"] == "error"
            assert "License invalid" in body["message"]

            cache.update_state(LicenseState.VALID)
            code, body = self._post_query(srv.port, q)
            assert code == 200 and body["status"] == "success"
        finally:
            srv.stop()

    def test_no_cache_means_open_core(self, lic_engine):
        from strake_spark.rest_api import make_rest_server

        srv = make_rest_server(lic_engine).start()
        try:
            code, body = self._post_query(
                srv.port, "SELECT count(*) AS n FROM lic_nation"
            )
            assert code == 200 and body["status"] == "success"
        finally:
            srv.stop()


class TestFlightEnforcement:
    def test_invalid_rejects_degraded_proceeds(self, lic_engine):
        import strake_spark as ss
        from strake_spark.server import make_server

        cache = LicenseCache()
        srv = make_server(lic_engine, license_cache=cache)
        t = threading.Thread(target=srv.serve, daemon=True)
        t.start()
        remote = ss.connect(f"grpc://127.0.0.1:{srv.port}")
        try:
            q = "SELECT count(*) AS n FROM lic_nation"
            assert remote.sql(q).to_pylist()[0]["n"] > 0  # VALID serves

            cache.update_state(LicenseState.INVALID)
            with pytest.raises(Exception, match="License invalid or expired"):
                remote.sql(q)

            cache.update_state(LicenseState.DEGRADED)
            assert remote.sql(q).to_pylist()[0]["n"] > 0  # degraded serves
        finally:
            remote.close()
            srv.shutdown()
