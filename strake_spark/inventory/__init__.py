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
# Round-16 window: tier (a) is the 25 entries registered this round
# (each pre-validated vs its oracle at sf0.001/0.01/0.1), then tier
# (b) the 2 rewritten semdedup entries, then tier (c) — the 16
# remaining r12-stale rows (deterministic ANN, events, expression
# matrices, BM25, cross-corpus exact, substring spans, truncate
# fidelity, engine e2e, frame-sample stats), then the oldest
# r13-green rows in registration order.

# Entries whose operator implementation changes this round (r16):
# semdedup gained an optional ANN-assisted assignment path
# (assign_method='ann' — sign-bit LSH probe over the centroid table;
# the exact path and the oracles are unchanged, but kmeans_assign /
# semantic_prune bodies were touched, so both entries re-verify this
# round; pre-validated hash-green vs their oracles at
# sf0.001/0.01/0.1 before rotation). Both were already in the
# r12-stale window head, so membership is unchanged — only order.
_REWRITTEN: tuple[str, ...] = (
    "semdedup_kmeans_assign",
    "semdedup_prune_keep",
)

_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked, registration order: the 25 entries
    # registered this round (TRY_ matrix, maps, sequence fan-out,
    # boolean/bitwise aggregates, regression aggregate family,
    # WITHIN GROUP percentiles, multi-DISTINCT Expand, JOIN USING /
    # NATURAL, HLL sketch-union + approx-percentile bounds, native
    # listagg, width_bucket histogram, Gopher quality flags, IGNORE
    # NULLS window matrix,
    # struct ops, URL parse, collations, XML, VARIANT, hopping windows
    # (batch + streaming), frame EXCLUDE emulation, as-of nearest, the
    # phone/card/IP PII rule matrix, URL canonical dedup) — each
    # verified vs its oracle at
    # sf0.001/0.01/0.1 before registration
    "agg_regression_family",
    "agg_percentile_within_group",
    "agg_count_distinct_multi",
    "join_using_natural",
    "agg_hll_union_bound",
    "agg_approx_percentile_bound",
    "agg_listagg_within_group",
    "window_ignore_nulls_fill",
    "expr_try_cast_matrix",
    "expr_map_functions",
    "expr_sequence_explode",
    "agg_boolean_bitwise",
    "expr_struct_operations",
    "expr_url_parse",
    "expr_collation_compare",
    "expr_xml_extract",
    "expr_variant_json",
    "expr_width_bucket_histogram",
    "events_hopping_window",
    "text_gopher_quality_flags",
    "stream_hopping_counts",
    "window_frame_exclude_emulated",
    "asof_join_nearest",
    "pii_rule_matrix",
    "pipeline_url_canonical_dedup",
    # (b) rewritten this round (2)
    "semdedup_kmeans_assign",
    "semdedup_prune_keep",
    # (c) oldest evidence: the remaining r12-stale rows, then the
    # oldest r13-green rows in registration order
    "expr_regexp_matrix",
    "expr_json_matrix",
    "engine_sql_end_to_end",
    "events_cohort_retention",
    "events_rolling_active_users",
    "events_rollup_incremental",
    "dedup_cross_corpus_exact",
    "dedup_substring_exact_spans",
    "ann_ivf_deterministic_topk",
    "curation_prototype_scores",
    "curation_cluster_label_purity",
    "ann_pq_deterministic_topk",
    "ann_ivfpq_deterministic_topk",
    "embedding_truncate_fidelity",
    "text_bm25_ranking",
    "multimodal_frame_sample_stats",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-17 fill, in order — the
# r13-green rows the r16-new entries displaced, oldest-first. Any
# query whose plan is rewritten in round 17 joins that window the
# same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "expr_vectorized_udf",
    "subquery_scalar_above_avg",
    "subquery_in_european_customers",
    "subquery_exists_correlated",
    "subquery_correlated_scalar_select",
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
