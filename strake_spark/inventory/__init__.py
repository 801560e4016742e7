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
# Round-6 rotation (per the r5 verdict): front-load (a) the six
# entries that have NEVER been inside a driver window (added round 4;
# the r5 rotation never happened); (b) the three entries broken by the
# testdata timestamp-unit flip and fixed this round — the driver must
# re-verify the fix; (c) the three entries whose only driver evidence
# is round 1; (d) 36 of the 48 remaining entries last checked in
# round 3 — three rounds of code churn ago; (e) the two pipeline
# entries added this round (decontamination, packing), which have no
# driver evidence at all. That is exactly 50. Immediately after the
# boundary: the twelve r3-green entries deferred to the round-7 window
# (pure expression matrices and small relational/sampling trivia — the
# most change-stable families, each still pytest-oracled at sf0.001
# and sf0.01 by tests/test_inventory.py). The r4/r5-green
# TPC-H/join/agg/window/setops block and the other round-6 additions
# (stream-stream join, mixture upsampling, int8 quantization) follow
# in registration order.
_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked (added r4, window never rotated in r5)
    "dedup_duplicate_clusters", "dedup_corpus_keep_first",
    "pipeline_curation_filter", "sample_stratified_by_lang",
    "stream_dedup_events", "stream_user_running_totals",
    # (b) broken by the nanos->micros testdata flip, fixed this round
    "stream_sessionization", "stream_tumbling_event_counts",
    "events_sessionization",
    # (c) r1-only evidence
    "distinct_simple", "values_inline", "agg_approx_count_distinct",
    # (d) last checked round 3 — TPC-H stragglers + subqueries/CTE
    "tpch_q9_product_profit", "tpch_q22_global_sales_opportunity",
    "subquery_scalar_above_avg", "subquery_in_european_customers",
    "subquery_exists_correlated", "subquery_correlated_scalar_select",
    "cte_reused", "cte_recursive_series",
    # events analytics
    "events_tumbling_window", "events_json_props",
    "events_top_users_per_type", "events_funnel_conversion",
    # dedup family
    "dedup_exact", "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates", "dedup_simhash_signatures",
    "dedup_simhash_near_pairs", "dedup_ngram_jaccard",
    # ANN family
    "ann_cosine_topk_bruteforce", "ann_embedding_dup_pairs",
    "ann_lsh_bucketed_topk", "ann_ivf_topk",
    # text analysis
    "text_language_id", "text_quality_score", "text_token_count",
    "text_fingerprint", "text_vocabulary_topn",
    "agg_length_percentiles_by_lang",
    # multimodal
    "multimodal_binary_meta", "multimodal_decode_features",
    # advanced relational + temporal joins + pipeline ops
    "window_groups_frame_emulated", "asof_join_backward",
    "asof_join_forward", "range_join_events_after_purchase",
    "pii_detect_and_scrub", "join_salted_skew",
    # new this round — never driver-checked
    "pipeline_decontaminate_ngram", "pipeline_pack_sequences",
    # --- 50-entry window boundary ---
    # deferred to the round-7 window (r3-green, change-stable)
    "empty_relation", "limit_offset_page", "sort_multi_key_nulls",
    "pivot_status_by_flag", "expr_string_functions", "expr_math_functions",
    "expr_datetime_functions", "expr_conditional_null", "expr_cast_matrix",
    "sample_hash_bucket", "sample_shuffle_deterministic",
    "expr_array_higher_order",
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
