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
# Round-15 window: the 10 rewritten entries, then the 9 r10-stale rows
# the r14 verdict front-loaded (the oldest remaining evidence), then 31
# r12-green rows in registration order.

# Entries whose operator implementation changes this round (r15): the
# ANN kernels gained bounded query-slice scoring (_KERNEL_QUERY_CHUNK —
# per-task memory no longer scales with n_queries; accumulation order
# unchanged, outputs bit-identical), ivf/pq/ivfpq drop null vectors
# before training/encode (the cosine/lsh null contract), and lsh_topk
# rejects n_anchor_bits < 1. Every consumer verified hash-green vs the
# oracle at sf0.001/0.01/0.1 before rotation; re-verified by the driver
# this round so a regression cannot hide behind stale green evidence.
_REWRITTEN: tuple[str, ...] = (
    "ann_cosine_topk_bruteforce",
    "ann_lsh_bucketed_topk",
    "ann_lsh_recall_vs_exact",
    "ann_ivf_recall_vs_exact",
    "ann_pq_recall_vs_exact",
    "ann_ivfpq_recall_vs_exact",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "curation_knn_label_consistency",
)

_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked: the 4 r15-new SQL-surface entries
    # (LATERAL top-N, GROUP BY ALL, QUALIFY rewrite, INTERSECT ALL) —
    # verified vs their oracles at sf0.001/0.01/0.1 before registration
    "set_intersect_all",
    "join_lateral_top_orders_per_customer",
    "agg_group_by_all",
    "window_qualify_top2_per_customer",
    # (b) rewritten this round (10)
    "ann_cosine_topk_bruteforce",
    "ann_lsh_bucketed_topk",
    "ann_lsh_recall_vs_exact",
    "ann_ivf_recall_vs_exact",
    "ann_pq_recall_vs_exact",
    "ann_ivfpq_recall_vs_exact",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "curation_knn_label_consistency",
    # (c) oldest evidence: the 9 r10-stale rows (r14 verdict task 2)
    "multimodal_decode_meta",
    "stream_view_purchase_join",
    "expr_array_higher_order",
    "sample_hash_bucket",
    "sample_shuffle_deterministic",
    "pipeline_mixture_upsample",
    "pipeline_source_quota",
    "pipeline_shard_manifest",
    "pipeline_chunk_documents",
    # (c) oldest evidence: r12-green rows, registration order (31)
    "join_anti_customers_without_urgent_orders",
    "join_cross_region_status",
    "join_non_equi_price_over_size",
    "agg_global_stats",
    "agg_rollup_status_priority",
    "agg_cube_flag_status",
    "agg_grouping_sets",
    "agg_having_big_customers",
    "agg_variance_by_nation",
    "agg_string_agg_priorities",
    "agg_filtered_conditional",
    "window_row_number_topk",
    "window_rank_family",
    "window_running_sum",
    "window_sliding_rows_frame",
    "window_range_frame",
    "window_lag_lead",
    "window_ntile_first_last",
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_except_all",
    "distinct_simple",
    "distinct_on_latest_order",
    "values_inline",
    "expr_unpivot_measures",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-16 fill, in order — the
# remaining r12-green rows, then r13/r14-green oldest-first. Any query
# whose plan is rewritten in round 16 joins that window the same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "expr_regexp_matrix",
    "expr_json_matrix",
    "engine_sql_end_to_end",
    "events_cohort_retention",
    "events_rolling_active_users",
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
