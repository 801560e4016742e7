"""Registry-wide driver-hashability guard (r16 verdict task #2).

The grading driver canonicalizes each result with a plain pandas
``sort_values`` before value-hashing; object columns holding lists /
dicts / Rows make its ``Categorical``/``factorize`` path raise
``unhashable type``. CORRECTNESS_r16 went red on exactly this:
`expr_map_functions` returned raw ``map_keys``/``map_values`` arrays,
which the local harness (then stringifying object columns first)
happily accepted.

Two layers close the gap structurally:

1. every oracled entry's RETURNED SCHEMA is asserted free of top-level
   ARRAY/MAP/STRUCT columns (this module + the same check inlined in
   ``run_and_compare``, so ``tools/verify_window.py`` pre-validation
   hits it too);
2. ``tests/conftest._normalize`` now refuses non-scalar object cells
   instead of stringifying them, so ``compare_frames`` fails exactly
   where the driver's canonicalizer fails.
"""

from __future__ import annotations

import pandas as pd
import pytest

from strake_spark import inventory
from tests.conftest import SF_DIR, _normalize, assert_driver_hashable_schema


def _names():
    return sorted(inventory.REGISTRY)


@pytest.mark.slow
@pytest.mark.parametrize("name", _names())
def test_entry_schema_is_driver_hashable(spark, name):
    """Enumerates ALL registry entries; rows-only entries are exempt
    (the driver never canonicalizes them — no oracle to hash against).

    slow (r20): the SAME check is inlined in conftest.run_and_compare,
    so test_inventory_sf0001 asserts it for every entry on every
    default run — this standalone sweep (which pays each entry's eager
    plan construction a second time, ~340 s) adds coverage only for
    rows-only-adjacent paths and runs in the FULL_SUITE record."""
    spec = inventory.REGISTRY[name]
    if spec.oracle is None:
        pytest.skip("rows_only: driver records a row count, never a hash")
    assert_driver_hashable_schema(spec.fn(spark, SF_DIR), name)


def test_guard_catches_the_r16_red_shape(spark):
    """The exact failure mode from CORRECTNESS_r16: raw map_keys /
    map_values ARRAY<STRING> output columns must be rejected."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        "id",
        F.map_keys(F.create_map(F.lit("k"), F.col("id").cast("string"))).alias("ks"),
    )
    with pytest.raises(AssertionError, match="driver-unhashable"):
        assert_driver_hashable_schema(df, "synthetic_r16_shape")


def test_normalize_refuses_list_cells():
    """The harness-side layer: pandas frames with list cells (what
    toPandas produces for ARRAY columns) must raise, not stringify."""
    pdf = pd.DataFrame({"id": [1, 2], "ks": [["a", "b"], ["c"]]})
    with pytest.raises(TypeError, match="non-scalar"):
        _normalize(pdf)


def test_normalize_still_handles_scalars_and_dates():
    import datetime as dt

    pdf = pd.DataFrame(
        {
            "d": [dt.date(2024, 1, 2), dt.date(2024, 1, 1)],
            "s": ["b", "a"],
            "n": [2, 1],
        }
    )
    out = _normalize(pdf)
    assert list(out.columns) == ["d", "n", "s"]
    assert len(out) == 2
