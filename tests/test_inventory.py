"""The local mirror of the driver's correctness gate: every inventory
entry runs on Spark AND on the DuckDB oracle at sf0.001, values compared
exactly (order-insensitive), on EVERY run. The full registry re-runs at
sf0.01 to catch scale-dependent nondeterminism (summation order,
partitioning) — that sweep is `slow` (r20): it runs in the builder's
round-close SPARK_GRAFT_FULL_SUITE=1 record, not in the driver's
time-budgeted default run."""

from __future__ import annotations

import pytest

from strake_spark import inventory
from tests.conftest import SF_DIR_MID, run_and_compare


def _names():
    return sorted(inventory.REGISTRY)


@pytest.mark.parametrize("name", _names())
def test_inventory_sf0001(spark, name):
    run_and_compare(spark, name)


@pytest.mark.slow
@pytest.mark.parametrize("name", _names())
def test_inventory_sf001(spark, name):
    run_and_compare(spark, name, sf_dir=SF_DIR_MID)


def test_registry_shape():
    assert len(inventory.REGISTRY) >= 5
    for name, spec in inventory.REGISTRY.items():
        assert spec.name == name
        assert callable(spec.fn)
        if spec.oracle is None:
            assert "rows_only" in spec.tags, f"{name}: oracle omitted but not tagged rows_only"


def test_entry_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) == len(inventory.REGISTRY)
