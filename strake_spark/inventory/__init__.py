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
# Round-17 window: tier (a) is the 9 entries registered this round
# (each pre-validated vs its oracle at sf0.001/0.01 AND under a
# driver-style plain-sort canonicalizer at sf0.01), then tier (b) the
# re-coded map entry, then tier (c) — ALL 40 remaining r13-stale rows
# (the r16 verdict's task-3 list), exactly filling the window.

# Entries whose implementation changes this round (r17):
# expr_map_functions — the r16 red row — now reduces map_keys/
# map_values to array_join CSV scalars on both engines so the
# driver's pandas canonicalizer can hash it. dedup_ngram_jaccard —
# already in this window as an r13-stale row — had its shared
# (id, gram) relation persisted (5 consumers; 6.6 s -> 3.9 s at
# sf0.1), re-verified oracle-identical at sf0.001/0.01. (semdedup
# gained an 'auto' assign-method DISPATCHER this round, but the
# entries' executed path is the identical exact engine —
# _make_assign returns the same _assign function object, pinned by
# tests/test_semdedup_ann.py::TestAutoAssign — and both entries were
# driver-re-verified green in r16, so they do not re-rotate.)
_REWRITTEN: tuple[str, ...] = (
    "expr_map_functions",
    "dedup_ngram_jaccard",
)

_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked, registration order: the 9 entries
    # registered this round (argmax/argmin aggregates, grouping_id
    # bitmask, RANGE-INTERVAL sliding window, levenshtein matrix,
    # array set algebra, DSIR importance weights, tf-idf top terms,
    # and the two REAL image-decode entries that closed the r16
    # probe task)
    "agg_max_by_min_by",
    "agg_grouping_id_sets",
    "window_range_interval_sliding",
    "expr_fuzzy_levenshtein",
    "expr_array_set_ops",
    "curation_dsir_weights",
    "text_tfidf_topterms",
    "multimodal_image_decode",
    "multimodal_image_source_scan",
    # (b) rewritten this round (2): the only-ever red driver row
    # (now driver-hashable) + the persist-fixed jaccard join
    "expr_map_functions",
    "dedup_ngram_jaccard",
    # (c) oldest evidence: all 40 r13-stale rows in registration
    # order (newest prior evidence r13 for every one)
    "expr_vectorized_udf",
    "subquery_scalar_above_avg",
    "subquery_in_european_customers",
    "subquery_exists_correlated",
    "subquery_correlated_scalar_select",
    "cte_reused",
    "cte_recursive_series",
    "events_tumbling_window",
    "events_sessionization",
    "events_json_props",
    "events_top_users_per_type",
    "dedup_exact",
    "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates",
    "dedup_cross_corpus_candidates",
    "dedup_simhash_signatures",
    "ann_embedding_dup_pairs",
    "curation_semantic_contamination",
    "text_language_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_meta",
    "stream_tumbling_event_counts",
    "stream_sessionization",
    "stream_dedup_events",
    "stream_user_running_totals",
    "window_groups_frame_emulated",
    "asof_join_backward",
    "asof_join_forward",
    "range_join_events_after_purchase",
    "pii_detect_and_scrub",
    "sample_stratified_by_lang",
    "text_vocabulary_topn",
    "agg_length_percentiles_by_lang",
    "join_salted_skew",
    "pipeline_end_to_end_curation",
    "pipeline_dedup_rate_by_source",
    "sample_grouped_split",
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-18 fill, in order — the
# oldest r14-green rows (the TPC-H extended set). Any query whose
# plan is rewritten in round 18 joins that window the same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "tpch_q10_returned_items",
    "tpch_q9_product_profit",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
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
