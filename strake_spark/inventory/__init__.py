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
# Round-10 rotation (per the r9 verdict + the in-code r10 guidance):
# all-time coverage is 143/143, so freshness of evidence is the
# metric. (a) All 43 entries whose most recent driver row is round 7 —
# the oldest evidence in the registry (tpch q10/q13-q19/q21, join
# forms, approx-distinct, sort/limit/pivot, the expression matrices,
# the ANN recall/topk family, quantize, multimodal decode, stream
# join, sampling, pipeline mixture/quota/shard/chunk), in registration
# order. (b) `tpch_q5_local_supplier_volume` — r9-green but REWRITTEN
# this round (broadcast-semi pre-reduction, the q7/q8 playbook); a
# rewritten query re-earns its driver row the same round. (c) The
# first 6 r8-green rows in registration order (q9/q22/q2/q11/q12/q20).
# That is exactly 50. Everything else (r8/r9-green, all re-verified by
# tests/test_inventory.py at sf0.001 and sf0.01 every round) follows
# in registration order.
_PRIORITY: tuple[str, ...] = (
    # (a) oldest evidence: last driver row in round 7 (43 entries)
    "tpch_q10_returned_items", "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue", "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_counts", "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_volume_customers", "tpch_q19_discounted_revenue",
    "tpch_q21_waiting_suppliers",
    "join_inner_orders_customer", "join_left_customer_orders",
    "join_right_orders_customer", "join_full_outer_nation_coverage",
    "join_semi_customers_with_urgent_orders",
    "agg_approx_count_distinct", "agg_approx_count_distinct_bound",
    "empty_relation", "limit_offset_page", "sort_multi_key_nulls",
    "pivot_status_by_flag",
    "expr_string_functions", "expr_math_functions",
    "expr_datetime_functions", "expr_conditional_null",
    "expr_cast_matrix",
    "ann_lsh_bucketed_topk", "ann_ivf_topk",
    "ann_lsh_recall_vs_exact", "ann_ivf_recall_vs_exact",
    "embedding_quantize_int8", "ann_pq_topk", "ann_pq_recall_vs_exact",
    "text_repetition_score",
    "multimodal_decode_features", "multimodal_decode_meta",
    "stream_view_purchase_join",
    "expr_array_higher_order",
    "sample_hash_bucket", "sample_shuffle_deterministic",
    "pipeline_mixture_upsample", "pipeline_source_quota",
    "pipeline_shard_manifest", "pipeline_chunk_documents",
    # (b) rewritten this round — re-earns its driver row
    "tpch_q5_local_supplier_volume",
    # (c) oldest r8-green rows in registration order
    "tpch_q9_product_profit", "tpch_q22_global_sales_opportunity",
    "tpch_q2_min_cost_supplier", "tpch_q11_important_stock",
    "tpch_q12_priority_shipping", "tpch_q20_part_promotion",
    # --- 50-entry window boundary ---
    # round-11 rotation guidance: front-load the entries added in round
    # 10 that have no driver row yet — ann_ivf_deterministic_topk,
    # ann_pq_deterministic_topk, ann_ivfpq_deterministic_topk,
    # dedup_cross_corpus_candidates, dedup_cross_corpus_exact,
    # curation_prototype_scores,
    # curation_cluster_label_purity, curation_knn_label_consistency,
    # curation_semantic_contamination
    # (all hash-oracled, pytest-green at sf0.001/0.01/0.1) — then the
    # remaining r8-green rows in registration order (join
    # anti/cross/non-equi, the aggregate family, grouping sets/cube/
    # rollup, windows, set ops, distinct-on, values, JSON/regexp/
    # unpivot, iceberg/interval entries), then r9-green rows
    # oldest-first. Any query whose plan is rewritten in round 11 joins
    # the window that same round. Note ann_lsh_bucketed_topk gained a
    # hash oracle IN round 10 while already sitting inside the r10
    # window, so its r10 driver row is already hash-checked.
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
