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
# Rotation contract (r13, satisfiable by construction — pinned by
# tests/test_window_contract.py as a saturated prefix): the window is
# the first 50 of the sequence
#   (a) entries with NO driver row in CORRECTNESS_r01..r12 (none now
#       — all-time coverage is 152/152), then
#   (b) entries whose operator code is rewritten THIS round (listed in
#       _REWRITTEN below — a rewrite invalidates old evidence), then
#   (c) everything else ordered by (oldest driver evidence round,
#       registration order).
# The carryover remainder — the next entries of that sequence, i.e.
# the head of the round-14 fill — is pinned in _NEXT_ROTATION_HEAD.
# Everything outside the window is re-verified by
# tests/test_inventory.py at sf0.001 and sf0.01 every round.
#
# Round-18 window: tier (a) — new entries registered this round (each
# is inserted at the head of _PRIORITY in registration order WHEN
# registered, displacing the youngest tail row; budget this round is
# 9, keeping every r14 row in-window); tier (b) — the two rewritten
# operators; tier (c) — ALL remaining 39 r14-stale rows, then the
# oldest r15 rows to saturate 50.

# Entries whose implementation changes this round (r18):
# events_funnel_conversion — re-pointed at operators/relational.
# funnel_two_step: ONE events scan + ONE user_id exchange (stacked
# window minima; distinct reuses the partitioning) replacing the
# legacy 3-scan filter/agg/join shape — the r17 verdict's only weak
# mark. multimodal_decode_features — the per-BYTE Python loop inside
# its Arrow batch became np.bincount over the byte lane (~100x on
# multi-MB payloads; identical integers). dedup_simhash_near_pairs —
# pair expansion split into _near_pairs_from_sig (pure extraction,
# same plan). dedup_duplicate_clusters — scoped signature cache (the
# old persist=False path computed the tokenize+48-bit relation
# TWICE), propagation restricted to edge nodes (isolated docs join
# back in one anti-join), pointer doubling (O(log diameter) rounds,
# 7 -> 4 at sf0.1), and a decimal monotone-sum convergence witness
# replacing the per-round join+count. All four re-verified
# oracle-identical at sf0.001/0.01 AND under a driver-style
# plain-sort canonicalizer at sf0.01; all were already in-window.
_REWRITTEN: tuple[str, ...] = (
    "events_funnel_conversion",
    "multimodal_decode_features",
    "dedup_simhash_near_pairs",
    "dedup_duplicate_clusters",
)

_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked: r18 registrations in registration
    # order (expressions module imports before multimodal), each
    # having popped one r15 tail row
    "expr_map_construction",
    "multimodal_audio_decode",
    "multimodal_image_resize",
    "multimodal_binaryfile_image_decode",
    "source_s3_distributed_roundtrip",
    "source_az_spool_roundtrip",
    "source_sqlite_partitioned_roundtrip",
    "source_rest_paginated_roundtrip",
    "source_gs_interop_roundtrip",
    # (b) rewritten this round (4): the funnel one-scan swap, the
    # vectorized feature histogram, and the two simhash-dedup rows
    # (helper extraction + the cluster-propagation restructure) — all
    # four carried r14 evidence anyway
    "events_funnel_conversion",
    "multimodal_decode_features",
    "dedup_simhash_near_pairs",
    "dedup_duplicate_clusters",
    # (c) oldest evidence: the 37 remaining r14 rows in registration
    # order (the two dedup rows above were r14 too — rewritten, so
    # they sit in tier (b); window membership is unchanged)
    "tpch_q10_returned_items",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q12_priority_shipping",
    "tpch_q20_part_promotion",
    "join_inner_orders_customer",
    "join_left_customer_orders",
    "join_right_orders_customer",
    "join_full_outer_nation_coverage",
    "join_semi_customers_with_urgent_orders",
    "agg_approx_count_distinct",
    "agg_approx_count_distinct_bound",
    "empty_relation",
    "limit_offset_page",
    "sort_multi_key_nulls",
    "pivot_status_by_flag",
    "expr_string_functions",
    "expr_math_functions",
    "expr_datetime_functions",
    "expr_conditional_null",
    "expr_cast_matrix",
    "embedding_quantize_int8",
    "text_repetition_score",
    "dedup_corpus_keep_first",
    "pipeline_decontaminate_ngram",
    "pipeline_pack_sequences",
    "pipeline_curation_filter",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-19 fill, in order — the
# oldest r15 rows. Any query whose plan is rewritten in round 19
# joins that window the same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "join_anti_customers_without_urgent_orders",
    "join_cross_region_status",
    "join_non_equi_price_over_size",
    "agg_global_stats",
    "agg_rollup_status_priority",
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
             "pii_entries", "pipeline_extras", "sources_entries"):
    _path = f"strake_spark.inventory.{_mod}"
    try:
        __import__(_path)
        _SUBMODULES.append(_mod)
    except ModuleNotFoundError as e:  # pragma: no cover
        if e.name != _path:
            raise
