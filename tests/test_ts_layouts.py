"""Timestamp-unit layout robustness (VERDICT r5 item 1).

The driver re-materializes testdata between rounds and has shipped
events.ts as parquet TIMESTAMP(NANOS) (rounds 1-4) and TIMESTAMP(MICROS)
(round 5+). A hard-coded unit assumption broke three entries; these
tests pin the invariant: the events-reading entries must produce
identical results on a micros layout, a nanos layout, and an INT96
layout of the same data.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR, compare_frames

ENTRIES = [
    "events_sessionization",
    "events_tumbling_window",
    "stream_sessionization",
    "stream_tumbling_event_counts",
]


def _materialize(tmp_path, unit: str) -> str:
    """Copy the sf0.001 layout with events.ts rewritten in the given
    parquet encoding: 'us', 'ns' (INT64 logical TIMESTAMP), or 'int96'."""
    d = tmp_path / f"sf-{unit}"
    d.mkdir()
    for name in os.listdir(SF_DIR):
        src = os.path.join(SF_DIR, name)
        if name != "events.parquet":
            shutil.copy(src, d / name)
            continue
        t = pq.read_table(src)
        ts = t.column("ts")
        if unit == "int96":
            pq.write_table(t, str(d / name), use_deprecated_int96_timestamps=True)
        else:
            idx = t.schema.get_field_index("ts")
            t = t.set_column(idx, "ts", ts.cast(pa.timestamp(unit)))
            pq.write_table(t, str(d / name))
    return str(d)


@pytest.fixture(scope="module")
def layouts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ts-layouts")
    return {u: _materialize(tmp, u) for u in ("us", "ns", "int96")}


@pytest.mark.parametrize("entry", ENTRIES)
@pytest.mark.parametrize("unit", ["ns", "int96"])
def test_entry_invariant_across_ts_layouts(spark, layouts, entry, unit):
    from strake_spark import inventory

    fn = inventory.REGISTRY[entry].fn
    base = fn(spark, layouts["us"]).toPandas()
    other = fn(spark, layouts[unit]).toPandas()
    compare_frames(other, base)


def test_footer_probe_distinguishes_layouts(layouts):
    from strake_spark.data import _has_nanos_ts

    assert not _has_nanos_ts(os.path.join(layouts["us"], "events.parquet"))
    assert _has_nanos_ts(os.path.join(layouts["ns"], "events.parquet"))
    # INT96 reads as TimestampType directly — must NOT take the long path
    assert not _has_nanos_ts(os.path.join(layouts["int96"], "events.parquet"))
