"""Avro file source (reference connectors.md:26): distributed scan when
the spark-avro module is deployed, jar-free driver decode fallback via
Spark core's bundled Java avro jar otherwise."""

from __future__ import annotations

import json

import pytest

import strake_spark as ss
from strake_spark.errors import SourceError
from strake_spark.sources.avro_source import read_avro_df
from tests.test_source_iceberg_native import _write_avro

_SCHEMA = json.dumps({
    "type": "record", "name": "evt",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "kind", "type": "string"},
        {"name": "score", "type": ["null", "double"], "default": None},
    ],
})

_ROWS = [
    {"id": 1, "kind": "view", "score": 0.5},
    {"id": 2, "kind": "click", "score": None},
    {"id": 3, "kind": "view", "score": 1.25},
]


@pytest.fixture()
def avro_file(spark, tmp_path):
    path = str(tmp_path / "events.avro")
    _write_avro(spark, path, _SCHEMA, _ROWS)
    return path


class TestAvroSource:
    def test_create_failure_is_loud_and_writer_still_usable(
        self, spark, tmp_path
    ):
        """r19 review: a create() failure (bad path) used to bypass the
        close — it must raise loudly, and a subsequent write on a good
        path must still work (nothing JVM-side left half-open)."""
        bad = str(tmp_path / "no-such-dir" / "x.avro")
        with pytest.raises(Exception):
            _write_avro(spark, bad, _SCHEMA, _ROWS)
        good = str(tmp_path / "ok.avro")
        _write_avro(spark, good, _SCHEMA, _ROWS)
        assert {r.id for r in read_avro_df(spark, good).collect()} == {1, 2, 3}

    def test_reads_typed_rows(self, spark, avro_file):
        df = read_avro_df(spark, avro_file)
        got = sorted((r.asDict() for r in df.collect()), key=lambda r: r["id"])
        assert got == sorted(_ROWS, key=lambda r: r["id"])

    def test_directory_of_files(self, spark, tmp_path):
        for i in (1, 2):
            _write_avro(
                spark, str(tmp_path / f"part{i}.avro"), _SCHEMA,
                [{"id": 10 * i, "kind": "bulk", "score": float(i)}],
            )
        df = read_avro_df(spark, str(tmp_path))
        assert {r.id for r in df.collect()} == {10, 20}

    def test_engine_registration_and_query(self, spark, avro_file):
        eng = ss.connect(
            {"sources": [{"name": "av", "type": "avro",
                          "tables": [{"name": "events", "path": avro_file}]}]},
            spark=spark,
        )
        out = eng.execute(
            "SELECT kind, count(*) AS n, sum(score) AS total "
            "FROM av_events GROUP BY kind ORDER BY kind"
        ).to_pylist()
        assert out == [
            {"kind": "click", "n": 1, "total": None},
            {"kind": "view", "n": 2, "total": 1.75},
        ]

    def test_fallback_bound_is_loud(self, spark, avro_file):
        with pytest.raises(SourceError, match="spark-avro"):
            read_avro_df(spark, avro_file, max_fallback_records=2)

    def test_missing_and_empty_paths_loud(self, spark, tmp_path):
        with pytest.raises(SourceError, match="does not exist"):
            read_avro_df(spark, str(tmp_path / "nope.avro"))
        (tmp_path / "empty").mkdir()
        with pytest.raises(SourceError, match="no \\*.avro"):
            read_avro_df(spark, str(tmp_path / "empty"))
