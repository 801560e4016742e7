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
# Round-20 window (optimization round 2): tier (a) — empty (all-time
# coverage is total, no never-checked entries remain); tier (b) — the
# one entry whose operator code is rewritten this round
# (dedup_ngram_jaccard: gram-set backbone, see operators/dedup.py);
# tier (c) — the 49 oldest-evidence rows: the 24 r15 rows that spilled
# from the r19 window, then the 25 oldest r16 rows in registration
# order. Derived by tools/plan_rotation.py over CORRECTNESS_r01..r19
# (newest-round histogram at rotation time: r15x24, r16x47, r17x46,
# r18x45, r19x50); the evidence pin in tests/test_window_contract.py
# is bumped to range(1, 20) in the same commit.

_REWRITTEN: tuple[str, ...] = (
    # r20 optimization-phase rewrite (oracle-identical at
    # sf0.001/0.01 under a driver-style plain-sort canonicalizer and
    # the local comparator; interleaved A/B at sf0.1 in
    # OPTIMIZATION_r20.md): ngram_jaccard_pairs — doc-level
    # distinct-gram-array backbone (one collect_set aggregation feeds
    # DF counts, prefix ranking, and both verification sides; the
    # separate per-doc size aggregation and verification collect_list
    # re-aggregation are gone).
    "dedup_ngram_jaccard",
)

_PRIORITY: tuple[str, ...] = (
    "dedup_ngram_jaccard",
    "set_intersect_all",
    "expr_unpivot_measures",
    "join_lateral_top_orders_per_customer",
    "agg_group_by_all",
    "window_qualify_top2_per_customer",
    "ann_cosine_topk_bruteforce",
    "ann_lsh_bucketed_topk",
    "ann_ivf_topk",
    "ann_lsh_recall_vs_exact",
    "ann_ivf_recall_vs_exact",
    "ann_pq_topk",
    "ann_pq_recall_vs_exact",
    "curation_knn_label_consistency",
    "ann_ivfpq_topk",
    "ann_ivfpq_recall_vs_exact",
    "multimodal_decode_meta",
    "stream_view_purchase_join",
    "expr_array_higher_order",
    "sample_hash_bucket",
    "sample_shuffle_deterministic",
    "pipeline_mixture_upsample",
    "pipeline_source_quota",
    "pipeline_shard_manifest",
    "pipeline_chunk_documents",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "agg_regression_family",
    "agg_percentile_within_group",
    "agg_count_distinct_multi",
    "join_using_natural",
    "agg_hll_union_bound",
    "agg_approx_percentile_bound",
    "agg_listagg_within_group",
    "window_ignore_nulls_fill",
    "expr_regexp_matrix",
    "expr_json_matrix",
    "expr_try_cast_matrix",
    "expr_sequence_explode",
    "agg_boolean_bitwise",
    "expr_struct_operations",
    "expr_url_parse",
    "expr_collation_compare",
    "expr_xml_extract",
    "expr_variant_json",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-21 fill, in order (the
# next-oldest r16 rows). Any query whose operator code is rewritten in
# round 21 joins that window the same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "expr_width_bucket_histogram",
    "engine_sql_end_to_end",
    "events_cohort_retention",
    "events_rolling_active_users",
    "events_hopping_window",
    "dedup_cross_corpus_exact",
    "dedup_substring_exact_spans",
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
