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
# Round-9 rotation (per the r8 verdict): front-load (a)
# `expr_vectorized_udf` — the only entry that has never had a driver
# row (added late in round 8). Then (b) all 42 entries whose most
# recent driver row is round 6 (the oldest evidence in the registry:
# subqueries, CTEs, events, the dedup/ANN/text families, streaming,
# as-of/range joins, PII, sampling, pipeline extras), in registration
# order. Then (c) 7 r7-green TPC-H rows: the front of the r7 cohort in
# registration order (q1/q3/q5/q6/q4) plus q7 and q8, pulled forward
# because this round rewrites their plans (broadcast-semi
# pre-reduction) — a rewritten query should re-earn its driver row the
# same round. That is exactly 50. With this window green, all-time
# driver coverage reaches 143/143. Everything else (r7/r8-green, all
# re-verified by tests/test_inventory.py at sf0.001 and sf0.01 every
# round) follows in registration order.
_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked — added late in round 8
    "expr_vectorized_udf",
    # (b) oldest evidence: last driver row in round 6 (42 entries)
    "subquery_scalar_above_avg", "subquery_in_european_customers",
    "subquery_exists_correlated", "subquery_correlated_scalar_select",
    "cte_reused", "cte_recursive_series",
    "events_tumbling_window", "events_sessionization",
    "events_json_props", "events_top_users_per_type",
    "dedup_exact", "dedup_minhash_signatures",
    "dedup_minhash_lsh_candidates", "dedup_simhash_signatures",
    "dedup_simhash_near_pairs", "dedup_duplicate_clusters",
    "dedup_ngram_jaccard",
    "ann_cosine_topk_bruteforce", "ann_embedding_dup_pairs",
    "text_language_id", "text_quality_score", "text_token_count",
    "text_fingerprint",
    "multimodal_binary_meta",
    "stream_tumbling_event_counts", "stream_sessionization",
    "stream_dedup_events", "stream_user_running_totals",
    "window_groups_frame_emulated",
    "asof_join_backward", "asof_join_forward",
    "range_join_events_after_purchase",
    "pii_detect_and_scrub",
    "sample_stratified_by_lang", "text_vocabulary_topn",
    "agg_length_percentiles_by_lang", "join_salted_skew",
    "events_funnel_conversion", "dedup_corpus_keep_first",
    "pipeline_decontaminate_ngram", "pipeline_pack_sequences",
    "pipeline_curation_filter",
    # (c) r7-green TPC-H rows; q7/q8 rewritten this round
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    # --- 50-entry window boundary ---
    # round-10 rotation guidance: with the r9 window green, every entry
    # has a driver row and the oldest evidence becomes the r7 cohort.
    # Front-load any entry added during round 9 that has no driver row
    # yet, then the remaining r7-green rows in registration order
    # (tpch_q10/q13/q14/q15/q16/q17/q18/q19/q21, expressions matrices,
    # sort/limit/offset, quantize, iceberg/interval entries), then
    # r8-green rows oldest-first.
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
