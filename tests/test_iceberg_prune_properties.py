"""Property-based soundness of Iceberg partition pruning.

The one invariant that matters: pruning may keep too much, but it must
NEVER drop a file (or manifest) that contains a row matching the
predicate. Hypothesis drives the entry-level and summary-level tests
across transforms x operators x random data; brute-force row evaluation
is the oracle. No SparkSession needed — these are pure functions.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from strake_spark.sources.iceberg_native import (
    _bucket_value,
    _entry_matches,
    _manifest_may_match,
    _time_transform_value,
    _transform_literal,
    _truncate_value,
)

# --------------------------------------------------------- scaffolding

_LONG_FIELD_TEMPLATES = [
    ("identity", None),
    ("truncate", 10),
    ("truncate", 7),
    ("bucket", 4),
    ("bucket", 16),
]
_DATE_FIELD_TEMPLATES = [
    ("identity", None),
    ("day", None),
    ("month", None),
    ("year", None),
    ("bucket", 8),
]
_STR_FIELD_TEMPLATES = [
    ("identity", None),
    ("truncate", 3),
    ("bucket", 8),
]


def _field(tf, param, typ):
    return {
        "name": "p", "source_name": "c", "type": typ,
        "transform": tf, "param": param,
    }


def _apply(field, v):
    """Ground-truth partition value of a row with source value v."""
    tf, param, typ = field["transform"], field["param"], field["type"]
    if tf == "identity":
        return v
    if tf == "bucket":
        return _bucket_value(v, param, typ)
    if tf == "truncate":
        return _truncate_value(v, param)
    return _time_transform_value(tf, v, typ)


def _pred_true(op, v, lit):
    if op == "in":
        return v in lit
    return {
        "==": v == lit, "!=": v != lit,
        "<": v < lit, "<=": v <= lit,
        ">": v > lit, ">=": v >= lit,
    }[op]


_OPS = ["==", "!=", "<", "<=", ">", ">=", "in"]


def _check_sound(field, values, op, lit, bound_packer):
    """Group rows into per-partition files; assert every file holding a
    matching row is kept, and the manifest summary keeps the manifest
    whenever any row matches."""
    files: dict = {}
    for v in values:
        files.setdefault(_apply(field, v), []).append(v)
    any_match = False
    pvs = []
    for pv, rows in files.items():
        pvs.append(pv)
        has_match = any(_pred_true(op, v, lit) for v in rows)
        any_match = any_match or has_match
        kept = _entry_matches({"p": pv}, [("c", op, lit)], [field])
        if has_match:
            assert kept, (
                f"UNSOUND: file pv={pv!r} rows={rows!r} matches "
                f"c {op} {lit!r} but was pruned ({field})"
            )
    if pvs and bound_packer is not None:
        try:
            lo, hi = min(pvs), max(pvs)
        except TypeError:
            return
        summ = [{
            "contains_null": False,
            "lower_bound": bound_packer(lo),
            "upper_bound": bound_packer(hi),
        }]
        kept = _manifest_may_match(summ, [("c", op, lit)], [field])
        if any_match:
            assert kept, (
                f"UNSOUND: manifest bounds [{lo!r},{hi!r}] pruned but a "
                f"row matches c {op} {lit!r} ({field})"
            )


# ------------------------------------------------------------ longs

@settings(max_examples=300, deadline=None)
@given(
    tf=st.sampled_from(_LONG_FIELD_TEMPLATES),
    values=st.lists(st.integers(-1000, 1000), min_size=1, max_size=30),
    op=st.sampled_from(_OPS),
    lit=st.integers(-1000, 1000),
    in_list=st.lists(st.integers(-1000, 1000), min_size=1, max_size=5),
)
def test_long_pruning_sound(tf, values, op, lit, in_list):
    field = _field(tf[0], tf[1], "long")
    literal = in_list if op == "in" else lit
    _check_sound(field, values, op, literal,
                 bound_packer=lambda x: struct.pack("<q", x)
                 if field["transform"] in ("identity", "truncate")
                 else struct.pack("<i", x))


# ------------------------------------------------------------ dates
# source values are epoch days (int); literals arrive as ISO strings —
# exactly what the SQL layer hands the pruner.

@settings(max_examples=200, deadline=None)
@given(
    tf=st.sampled_from(_DATE_FIELD_TEMPLATES),
    values=st.lists(st.integers(0, 25000), min_size=1, max_size=30),
    op=st.sampled_from(["==", "!=", "<", "<=", ">", ">="]),
    lit_days=st.integers(0, 25000),
    iso=st.booleans(),
)
def test_date_pruning_sound(tf, values, op, lit_days, iso):
    import datetime

    field = _field(tf[0], tf[1], "date")
    if iso:
        lit = str(datetime.date(1970, 1, 1) + datetime.timedelta(days=lit_days))
    else:
        lit = lit_days

    # brute-force truth must see days (the storage representation)
    files: dict = {}
    for v in values:
        files.setdefault(_apply(field, v), []).append(v)
    pvs = []
    any_match = False
    for pv, rows in files.items():
        pvs.append(pv)
        has_match = any(_pred_true(op, v, lit_days) for v in rows)
        any_match = any_match or has_match
        kept = _entry_matches({"p": pv}, [("c", op, lit)], [field])
        if has_match:
            assert kept, f"UNSOUND date prune: pv={pv} rows={rows} {op} {lit!r} ({field})"
    if field["transform"] != "bucket":
        packer = (lambda x: struct.pack("<i", x))
        try:
            lo, hi = min(pvs), max(pvs)
        except TypeError:
            return
        summ = [{"contains_null": False, "lower_bound": packer(lo),
                 "upper_bound": packer(hi)}]
        kept = _manifest_may_match(summ, [("c", op, lit)], [field])
        if any_match:
            assert kept


# ----------------------------------------------------------- strings

@settings(max_examples=200, deadline=None)
@given(
    tf=st.sampled_from(_STR_FIELD_TEMPLATES),
    values=st.lists(st.text(alphabet="abcde", max_size=6), min_size=1, max_size=20),
    op=st.sampled_from(["==", "!=", "in"]),
    lit=st.text(alphabet="abcde", max_size=6),
    in_list=st.lists(st.text(alphabet="abcde", max_size=6), min_size=1, max_size=4),
)
def test_string_pruning_sound(tf, values, op, lit, in_list):
    field = _field(tf[0], tf[1], "string")
    literal = in_list if op == "in" else lit
    _check_sound(field, values, op, literal,
                 bound_packer=None if field["transform"] == "bucket"
                 else (lambda s: s.encode()))


# ----------------------------------------------- transform invariants

@settings(max_examples=300, deadline=None)
@given(a=st.integers(-10**6, 10**6), b=st.integers(-10**6, 10**6),
       w=st.integers(1, 1000))
def test_truncate_is_monotonic_and_idempotent(a, b, w):
    ta, tb = _truncate_value(a, w), _truncate_value(b, w)
    if a <= b:
        assert ta <= tb
    assert _truncate_value(ta, w) == ta
    assert ta <= a < ta + w


@settings(max_examples=200, deadline=None)
@given(d1=st.integers(0, 40000), d2=st.integers(0, 40000),
       tf=st.sampled_from(["day", "month", "year"]))
def test_date_transforms_monotonic(d1, d2, tf):
    f = _field(tf, None, "date")
    t1 = _transform_literal(f, d1)
    t2 = _transform_literal(f, d2)
    if d1 <= d2:
        assert t1 <= t2


@settings(max_examples=200, deadline=None)
@given(v=st.integers(-10**9, 10**9), n=st.sampled_from([2, 4, 8, 16, 128]))
def test_bucket_in_range_and_deterministic(v, n):
    b = _bucket_value(v, n, "long")
    assert 0 <= b < n
    assert _bucket_value(v, n, "long") == b


class TestTypeMismatchSoundness:
    """Review-found class: Python's == never raises across types, so an
    unconverted representation mismatch must VETO the comparison (keep
    the file), not prune everything."""

    def test_string_literal_vs_int_partition_keeps_file(self):
        from strake_spark.sources.iceberg_native import _entry_matches

        f = {"name": "p", "source_name": "c", "type": "long",
             "transform": "identity", "param": None}
        assert _entry_matches({"p": 42}, [("c", "==", "42")], [f]) is True
        assert _entry_matches({"p": 42}, [("c", "in", ["42", "x"])], [f]) is True

    def test_timestamp_iso_literal_now_converts_for_identity(self):
        from strake_spark.sources.iceberg_native import _entry_matches

        f = {"name": "p", "source_name": "c", "type": "timestamp",
             "transform": "identity", "param": None}
        micros = 19815 * 86_400_000_000  # 2024-04-02T00:00:00
        assert _entry_matches(
            {"p": micros}, [("c", "==", "2024-04-02T00:00:00")], [f]
        ) is True
        assert _entry_matches(
            {"p": micros}, [("c", "==", "2024-04-03T00:00:00")], [f]
        ) is False
        # unparseable text: veto, keep the file
        assert _entry_matches(
            {"p": micros}, [("c", "==", "not-a-time")], [f]
        ) is True

    def test_bool_literal_never_matches_int_partition(self):
        from strake_spark.sources.iceberg_native import _entry_matches

        f = {"name": "p", "source_name": "c", "type": "long",
             "transform": "identity", "param": None}
        # True == 1 in Python; partition pruning must not treat a bool
        # literal as matching an int partition value
        assert _entry_matches({"p": 1}, [("c", "==", True)], [f]) is True

    def test_bucket_on_uuid_never_prunes(self):
        from strake_spark.sources.iceberg_native import (
            _SKIP,
            _bucket_value,
            _entry_matches,
        )

        assert _bucket_value(
            "550e8400-e29b-41d4-a716-446655440000", 16, "uuid"
        ) is _SKIP
        f = {"name": "p", "source_name": "c", "type": "uuid",
             "transform": "bucket", "param": 16}
        # spec hashes the 16-byte UUID, not its text — must keep the file
        assert _entry_matches(
            {"p": 3}, [("c", "==", "550e8400-e29b-41d4-a716-446655440000")], [f]
        ) is True


class TestNullPredicatePruning:
    _F = {"name": "p", "source_name": "c", "type": "string",
          "transform": "identity", "param": None}

    def test_entry_level_null_semantics(self):
        from strake_spark.sources.iceberg_native import _entry_matches

        f = self._F
        # all-null file
        assert _entry_matches({"p": None}, [("c", "is_null", None)], [f]) is True
        assert _entry_matches({"p": None}, [("c", "not_null", None)], [f]) is False
        assert _entry_matches({"p": None}, [("c", "==", "x")], [f]) is False
        # non-null file
        assert _entry_matches({"p": "eu"}, [("c", "is_null", None)], [f]) is False
        assert _entry_matches({"p": "eu"}, [("c", "not_null", None)], [f]) is True
        # non-identity transform: non-null pv still implies no null rows
        fb = dict(f, transform="bucket", param=8)
        assert _entry_matches({"p": 3}, [("c", "is_null", None)], [fb]) is False

    def test_manifest_level_contains_null(self):
        from strake_spark.sources.iceberg_native import _manifest_may_match

        f = self._F
        no_nulls = [{"contains_null": False, "lower_bound": b"a",
                     "upper_bound": b"z"}]
        has_nulls = [{"contains_null": True, "lower_bound": b"a",
                      "upper_bound": b"z"}]
        assert _manifest_may_match(no_nulls, [("c", "is_null", None)], [f]) is False
        assert _manifest_may_match(has_nulls, [("c", "is_null", None)], [f]) is True
        assert _manifest_may_match(no_nulls, [("c", "not_null", None)], [f]) is True
