"""Background materialization (reference enterprise feature,
docs/enterprise.md:64-68): versioned parquet caches over external
sources, atomic pointer flips, pushdown parking, scheduled refresh."""

from __future__ import annotations

import os
import time

import duckdb
import pytest

import strake_spark as ss
from strake_spark.errors import SourceError
from strake_spark.materialize import Materializer
from strake_spark.sources.registry import REMOTE_TABLES
from tests.conftest import SF_DIR


@pytest.fixture()
def mat_env(spark, tmp_path):
    dpath = str(tmp_path / "mat.duckdb")
    con = duckdb.connect(dpath)
    con.execute(
        f"CREATE TABLE nation AS SELECT * FROM read_parquet('{SF_DIR}/nation.parquet')"
    )
    con.close()
    eng = ss.connect(
        {"sources": [{"name": "mz", "type": "duckdb", "url": dpath}]},
        spark=spark,
    )
    mat = Materializer(eng, str(tmp_path / "cache"))
    yield eng, mat, dpath
    mat.stop()
    mat.drop("mz_nation")
    REMOTE_TABLES.pop("mz_nation", None)


class TestMaterialize:
    def test_cache_swap_values_and_pushdown_parking(self, mat_env):
        eng, mat, _ = mat_env
        before = eng.execute(
            "SELECT n_nationkey, n_name FROM mz_nation ORDER BY n_nationkey"
        ).to_pylist()
        assert "mz_nation" in REMOTE_TABLES
        info = mat.materialize("mz_nation")
        assert info["version"] == "v0001" and info["files"] >= 1
        # pushdown parked: queries must hit the cache, not the origin
        assert "mz_nation" not in REMOTE_TABLES
        from strake_spark.plans import federation

        assert federation.analyze("SELECT count(*) AS n FROM mz_nation") is None
        after = eng.execute(
            "SELECT n_nationkey, n_name FROM mz_nation ORDER BY n_nationkey"
        ).to_pylist()
        assert after == before
        # the view is now a parquet scan
        plan = eng.sql("SELECT * FROM mz_nation")._jdf.queryExecution().executedPlan().toString()
        assert "FileScan parquet" in plan

    def test_refresh_picks_up_source_changes(self, mat_env):
        eng, mat, dpath = mat_env
        mat.materialize("mz_nation")
        n0 = eng.execute("SELECT count(*) AS n FROM mz_nation").to_pylist()[0]["n"]
        con = duckdb.connect(dpath)
        con.execute("INSERT INTO nation SELECT n_nationkey + 100, n_name, n_regionkey FROM nation")
        con.close()
        # cache still serves the old version until refresh
        assert eng.execute("SELECT count(*) AS n FROM mz_nation").to_pylist()[0]["n"] == n0
        info = mat.refresh("mz_nation")
        assert info["version"] == "v0002"
        assert eng.execute("SELECT count(*) AS n FROM mz_nation").to_pylist()[0]["n"] == 2 * n0

    def test_drop_restores_origin_and_pushdown(self, mat_env):
        eng, mat, _ = mat_env
        mat.materialize("mz_nation")
        assert "mz_nation" not in REMOTE_TABLES
        mat.drop("mz_nation")
        assert "mz_nation" in REMOTE_TABLES
        from strake_spark.plans import federation

        assert federation.analyze("SELECT count(*) AS n FROM mz_nation") is not None

    def test_refresh_requires_materialize(self, mat_env):
        _eng, mat, _ = mat_env
        with pytest.raises(SourceError, match="not materialized"):
            mat.refresh("mz_nation")

    def test_prune_keeps_current(self, mat_env):
        eng, mat, _ = mat_env
        mat.materialize("mz_nation")
        mat.refresh("mz_nation")
        mat.refresh("mz_nation")
        removed = mat.prune("mz_nation", keep=1)
        assert removed == ["v0001", "v0002"]
        # current version survives and still serves
        assert eng.execute("SELECT count(*) AS n FROM mz_nation").to_pylist()[0]["n"] > 0

    def test_scheduled_refresh_advances_versions(self, mat_env):
        _eng, mat, _ = mat_env
        mat.schedule("mz_nation", interval_s=0.5)
        assert mat.status()["current"]["mz_nation"] == "v0001"
        deadline = time.time() + 15
        while time.time() < deadline:
            if mat.status()["current"]["mz_nation"] >= "v0002":
                break
            time.sleep(0.25)
        assert mat.status()["current"]["mz_nation"] >= "v0002"
        mat.stop("mz_nation")
        frozen = mat.status()["current"]["mz_nation"]
        time.sleep(1.2)
        assert mat.status()["current"]["mz_nation"] == frozen  # loop stopped
