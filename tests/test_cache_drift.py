"""Result cache (user isolation, TTL, LRU eviction, fingerprint
stability) and schema-drift reconciliation (NULL-fill / cast / prune).
Reference: crates/runtime/src/query/cache.rs tests (692 LoC) +
crates/runtime/tests/schema_drift_integration.rs."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import strake_spark as ss
from strake_spark.cache import ResultCache, plan_fingerprint
from strake_spark.config import CacheConfig
from strake_spark.sources.drift import reconcile
from tests.conftest import SF_DIR


@pytest.fixture()
def cache(spark, tmp_path):
    return ResultCache(
        spark, CacheConfig(enabled=True, directory=str(tmp_path / "c"), ttl_seconds=60)
    )


def _df(spark, n=5):
    return spark.range(n).select(F.col("id"), (F.col("id") * 2).alias("v"))


class TestFingerprint:
    def test_same_query_same_fingerprint(self, spark):
        a = spark.sql("SELECT 1 AS one")
        b = spark.sql("SELECT 1 AS one")
        assert plan_fingerprint(a, "u") == plan_fingerprint(b, "u")

    def test_user_isolation(self, spark):
        df = spark.sql("SELECT 2 AS two")
        assert plan_fingerprint(df, "alice") != plan_fingerprint(df, "bob")

    def test_different_plans_differ(self, spark):
        assert plan_fingerprint(spark.sql("SELECT 1 AS x"), "u") != plan_fingerprint(
            spark.sql("SELECT 2 AS x"), "u"
        )

    def test_expression_ids_normalized(self, spark):
        # two structurally-identical DataFrame plans get different expr
        # ids run-to-run; the fingerprint must not see them
        a = _df(spark).filter("v > 2")
        b = _df(spark).filter("v > 2")
        assert plan_fingerprint(a, None) == plan_fingerprint(b, None)


class TestCache:
    def test_roundtrip(self, spark, cache):
        df = _df(spark)
        assert cache.get(df, "u") is None
        table = df.toArrow()
        cache.put(df, "u", table)
        hit = cache.get(df, "u")
        assert hit is not None and hit.equals(table)

    def test_user_isolated_entries(self, spark, cache):
        df = _df(spark)
        cache.put(df, "alice", df.toArrow())
        assert cache.get(df, "bob") is None

    def test_ttl_expiry(self, spark, tmp_path):
        cache = ResultCache(
            spark,
            CacheConfig(enabled=True, directory=str(tmp_path / "t"), ttl_seconds=0.2),
        )
        df = _df(spark)
        cache.put(df, "u", df.toArrow())
        time.sleep(0.4)
        assert cache.get(df, "u") is None

    def test_lru_eviction_respects_budget(self, spark, tmp_path):
        cfg = CacheConfig(enabled=True, directory=str(tmp_path / "e"), max_mb=1)
        cache = ResultCache(spark, cfg)
        big = spark.range(200_000).select(
            F.col("id"), F.sha2(F.col("id").cast("string"), 256).alias("pad")
        )
        t = big.toArrow()
        for u in ("u1", "u2", "u3"):
            cache.put(big, u, t)
            time.sleep(0.05)
        total = sum(
            os.path.getsize(os.path.join(cfg.directory, f))
            for f in os.listdir(cfg.directory)
        )
        # budget enforced before each put; at most budget + one entry
        assert total <= 1024 * 1024 + t.nbytes * 1.5

    def test_engine_integration_cache_hit_logged(self, spark, tmp_path):
        eng = ss.connect(
            {
                "sources": [
                    {"name": "cc", "type": "parquet", "url": SF_DIR,
                     "tables": [{"name": "region"}]}
                ],
                "cache": {"enabled": True, "directory": str(tmp_path / "ec")},
            },
            spark=spark,
        )
        q = "SELECT count(*) AS n FROM cc_region"
        first = eng.execute(q, user="u")
        second = eng.execute(q, user="u")
        assert first.to_pylist() == second.to_pylist() == [{"n": 5}]
        logged = [e["cached"] for e in eng.query_log()[-2:]]
        assert logged == [False, True]


class TestDrift:
    def _declared(self):
        return T.StructType(
            [
                T.StructField("a", T.LongType()),
                T.StructField("b", T.StringType()),
                T.StructField("missing", T.DoubleType()),
            ]
        )

    def test_null_fill_cast_prune(self, spark):
        src = spark.createDataFrame(
            [(1, 2, "extra")], T.StructType([
                T.StructField("a", T.IntegerType()),   # -> cast to long
                T.StructField("b", T.IntegerType()),   # -> cast to string
                T.StructField("extra", T.StringType()),  # -> pruned
            ])
        )
        out = reconcile(src, self._declared(), context="t")
        assert [f.name for f in out.schema.fields] == ["a", "b", "missing"]
        assert out.schema["a"].dataType == T.LongType()
        assert out.schema["b"].dataType == T.StringType()
        row = out.collect()[0]
        assert row.a == 1 and row.b == "2" and row.missing is None
        assert any("missing" in w for w in out._strake_drift_warnings)
        assert any("pruned" in w for w in out._strake_drift_warnings)

    def test_case_insensitive_match(self, spark):
        src = spark.createDataFrame([(1, "x")], "A bigint, B string")
        out = reconcile(
            src,
            T.StructType([T.StructField("a", T.LongType()),
                          T.StructField("b", T.StringType())]),
        )
        assert out.columns == ["a", "b"]
        assert out.collect()[0].a == 1

    def test_no_drift_no_warnings(self, spark):
        src = spark.createDataFrame([(1,)], "a bigint")
        out = reconcile(src, T.StructType([T.StructField("a", T.LongType())]))
        assert out._strake_drift_warnings == []


class TestDriftRegistrySemantics:
    """r16 review fixes: view-name keying (no cross-source collisions)
    and clean-reconcile healing."""

    def _declared2(self):
        import pyspark.sql.types as T

        return T.StructType(
            [T.StructField("id", T.LongType()), T.StructField("missing", T.StringType())]
        )

    def test_clean_reconcile_heals_recorded_drift(self, spark):
        from strake_spark.sources.drift import (
            clear_drift_log,
            drift_warnings_for,
            reconcile,
        )

        clear_drift_log()
        src = spark.createDataFrame([(1,)], "id long")
        reconcile(src, self._declared2(), context="heal_t")
        assert drift_warnings_for("heal_t")
        healed = spark.createDataFrame([(1, "x")], "id long, missing string")
        reconcile(healed, self._declared2(), context="heal_t")
        assert drift_warnings_for("heal_t") == []
        clear_drift_log()

    def test_same_table_name_across_sources_does_not_collide(self, spark, tmp_path):
        """Sources 'a' and 'b' both register table 'orders'; only a's
        drifted — a query on b_orders must carry NO drift lines."""
        import strake_spark as ss
        from strake_spark.sources.drift import clear_drift_log

        clear_drift_log()
        spark.createDataFrame([(1,)], "id long").write.parquet(str(tmp_path / "da" / "orders.parquet"))
        spark.createDataFrame([(1, "x")], "id long, missing string").write.parquet(
            str(tmp_path / "db" / "orders.parquet")
        )
        cols = [{"name": "id", "type": "bigint"}, {"name": "missing", "type": "string"}]
        eng = ss.connect(
            {
                "sources": [
                    {"name": "a", "type": "parquet", "url": str(tmp_path / "da"),
                     "tables": [{"name": "orders", "columns": cols}]},
                    {"name": "b", "type": "parquet", "url": str(tmp_path / "db"),
                     "tables": [{"name": "orders", "columns": cols}]},
                ]
            },
            spark=spark,
        )
        eng.execute("SELECT id FROM a_orders")
        assert any("STRAKE-2009" in w for w in eng.last_warnings())
        eng.execute("SELECT id FROM b_orders")
        assert eng.last_warnings() == []
        clear_drift_log()
