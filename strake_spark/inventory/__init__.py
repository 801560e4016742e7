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
# Round-14 window: the 11 rewritten entries, the 5 r9-green rows
# deferred at r13 (the staleness tail the r13 verdict front-loaded),
# then 34 of the r10-green rows oldest-first in registration order.

# Entries whose operator implementation changes this round (r14):
# knn_label_consistency's label-join broadcast side becomes the
# filtered n_queries slice (r13 verdict finding #2 — the hint
# previously shipped the corpus-sized label relation);
# simhash_near_pairs migrates to the shared gated hot-bucket drop with
# a cached signature gate count (finding #3), which also feeds
# duplicate_clusters' edge set; lsh_topk AND cosine_topk are rewritten
# as map-only Arrow passes (bit-exact ascending-index accumulation —
# every consumer verified hash-green vs the oracle at
# sf0.001/0.01/0.1 before rotation), which back ann_lsh_bucketed_topk
# and every *_recall_vs_exact companion; ivf_topk's scoring join gets
# the same kernel (rows-only entry, recall floor re-verified), and
# pq_topk's encode stage (golden-compared byte-identical outputs). Re-verified by the driver
# this round so a hash regression cannot hide behind stale green
# evidence.
_REWRITTEN: tuple[str, ...] = (
    "curation_knn_label_consistency",
    "dedup_simhash_near_pairs",
    "dedup_duplicate_clusters",
    "ann_lsh_bucketed_topk",
    "ann_lsh_recall_vs_exact",
    "ann_cosine_topk_bruteforce",
    "ann_ivf_recall_vs_exact",
    "ann_pq_recall_vs_exact",
    "ann_ivfpq_recall_vs_exact",
    "ann_ivf_topk",
    "ann_pq_topk",
)

_PRIORITY: tuple[str, ...] = (
    # (b) rewritten this round (11)
    "curation_knn_label_consistency",
    "dedup_simhash_near_pairs",
    "dedup_duplicate_clusters",
    "ann_lsh_bucketed_topk",
    "ann_lsh_recall_vs_exact",
    "ann_cosine_topk_bruteforce",
    "ann_ivf_recall_vs_exact",
    "ann_pq_recall_vs_exact",
    "ann_ivfpq_recall_vs_exact",
    "ann_ivf_topk",
    "ann_pq_topk",
    # (c) oldest evidence: the 5 r9-green rows deferred since r13
    "events_funnel_conversion",
    "dedup_corpus_keep_first",
    "pipeline_decontaminate_ngram",
    "pipeline_pack_sequences",
    "pipeline_curation_filter",
    # (c) oldest evidence: r10-green rows, registration order (34)
    "tpch_q10_returned_items", "tpch_q9_product_profit",
    "tpch_q13_customer_distribution", "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "tpch_q17_small_quantity_revenue", "tpch_q18_large_volume_customers",
    "tpch_q19_discounted_revenue", "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales_opportunity", "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock", "tpch_q12_priority_shipping",
    "tpch_q20_part_promotion",
    "join_inner_orders_customer", "join_left_customer_orders",
    "join_right_orders_customer", "join_full_outer_nation_coverage",
    "join_semi_customers_with_urgent_orders",
    "agg_approx_count_distinct", "agg_approx_count_distinct_bound",
    "empty_relation", "limit_offset_page", "sort_multi_key_nulls",
    "pivot_status_by_flag",
    "expr_string_functions", "expr_math_functions",
    "expr_datetime_functions", "expr_conditional_null",
    "expr_cast_matrix",
    "embedding_quantize_int8",
    "text_repetition_score", "multimodal_decode_features",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-15 fill, in order — the
# r10-green rows that did not fit this window (then ann_ivfpq/cross-
# corpus-exact/curation rows, r12-green, then r13-green oldest-first).
# Any query whose plan is rewritten in round 15 joins that window the
# same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "multimodal_decode_meta",
    "stream_view_purchase_join",
    "expr_array_higher_order",
    "sample_hash_bucket",
    "sample_shuffle_deterministic",
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
