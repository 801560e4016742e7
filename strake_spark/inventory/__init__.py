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
# Round-8 rotation (per the r7 verdict): front-load (a) ALL 22 entries
# that have never had a driver row — added late in round 7 after that
# window was fixed (TPC-H q2/q11/q12/q20, BM25, SemDeDup pair,
# events rollup/cohort/rolling, expr json/regexp/unpivot, exact-
# substring dedup, truncation fidelity, engine SQL e2e, grouped split,
# frame-sample stats, curation e2e, dedup-rate, and the IVF+PQ pair —
# `ann_ivfpq_topk` is rows-only-by-design, kept adjacent to its
# hash-checkable recall companion). With these 22 green, all-time
# driver coverage reaches 137 green + 5 explained of 142. Then (b)
# the 28 oldest-evidence rows: the 24 r5-green entries deferred from
# the r7 window (joins, agg variants, window functions, set ops) and
# the 4 oldest r6-green entries. That is exactly 50. Everything else
# (r6/r7-green, all re-verified by tests/test_inventory.py at sf0.001
# and sf0.01 every round) follows in registration order.
_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked — added late in round 7
    "tpch_q2_min_cost_supplier", "tpch_q11_important_stock",
    "tpch_q12_priority_shipping", "tpch_q20_part_promotion",
    "text_bm25_ranking",
    "semdedup_kmeans_assign", "semdedup_prune_keep",
    "events_rollup_incremental", "events_cohort_retention",
    "events_rolling_active_users",
    "expr_json_matrix", "expr_regexp_matrix", "expr_unpivot_measures",
    "dedup_substring_exact_spans",
    "embedding_truncate_fidelity",
    "engine_sql_end_to_end",
    "sample_grouped_split",
    "multimodal_frame_sample_stats",
    "pipeline_end_to_end_curation", "pipeline_dedup_rate_by_source",
    "ann_ivfpq_topk", "ann_ivfpq_recall_vs_exact",
    # (b) oldest-evidence rows: 24 r5-green entries deferred from r7
    "join_anti_customers_without_urgent_orders",
    "join_cross_region_status",
    "join_non_equi_price_over_size",
    "agg_global_stats", "agg_grouping_sets",
    "agg_rollup_status_priority", "agg_cube_flag_status",
    "agg_having_big_customers", "agg_variance_by_nation",
    "agg_string_agg_priorities", "agg_filtered_conditional",
    "window_row_number_topk", "window_rank_family", "window_running_sum",
    "window_sliding_rows_frame", "window_range_frame", "window_lag_lead",
    "window_ntile_first_last",
    "set_union_all", "set_union_distinct", "set_intersect",
    "set_except", "set_except_all", "distinct_on_latest_order",
    # (b) oldest r6-green entries
    "tpch_q9_product_profit", "tpch_q22_global_sales_opportunity",
    "distinct_simple", "values_inline",
    # --- 50-entry window boundary ---
    # round-9 rotation guidance: front-load (a) expr_vectorized_udf
    # (added late in r8, never driver-checked), then (b) the oldest
    # evidence remaining — the r6-green families in registration order:
    # subquery_{scalar_above_avg,in_european_customers,exists_correlated,
    # correlated_scalar_select}, cte_{reused,recursive_series},
    # events_{tumbling_window,sessionization,json_props,top_users_per_type},
    # dedup_{exact,minhash_signatures,...}, distinct/values variants —
    # then r7-green rows oldest-first. With the r8 window green,
    # all-time coverage is 137 hash-green + 5 explained of 142 (+1 new).
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
