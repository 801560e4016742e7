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
# Round-11 rotation (per the r10 verdict + the in-code r11 guidance):
# (a) The 9 entries added in round 10 that have never had a driver row
# — the deterministic ANN trio, the cross-corpus dedup pair, and the
# four curation metrics — go FIRST: a green row for each takes
# all-time coverage to 152/152. (b) The remaining 41 slots hold the
# oldest evidence in the registry: 41 of the 44 entries whose last
# driver row is round 8, in registration order (join anti/cross/
# non-equi, the aggregate family, grouping sets/cube/rollup, the
# window family, set ops, distinct/distinct-on, values, unpivot/
# regexp/JSON matrices, engine SQL, the events family, substring
# spans, IVFPQ, semdedup, truncate-fidelity, BM25, frame-sample).
# That is exactly 50. The 3 r8 rows that did not fit
# (pipeline_end_to_end_curation, pipeline_dedup_rate_by_source,
# sample_grouped_split) lead the round-12 fill, before the r9-green
# rows oldest-first. Everything outside the window is re-verified by
# tests/test_inventory.py at sf0.001 and sf0.01 every round.
_PRIORITY: tuple[str, ...] = (
    # (a) round-10 additions, never driver-checked (9 entries)
    "ann_ivf_deterministic_topk", "ann_pq_deterministic_topk",
    "ann_ivfpq_deterministic_topk",
    "dedup_cross_corpus_candidates", "dedup_cross_corpus_exact",
    "curation_prototype_scores", "curation_cluster_label_purity",
    "curation_knn_label_consistency", "curation_semantic_contamination",
    # (b) oldest evidence: last driver row in round 8 (41 of 44)
    "join_anti_customers_without_urgent_orders",
    "join_cross_region_status", "join_non_equi_price_over_size",
    "agg_global_stats", "agg_rollup_status_priority",
    "agg_cube_flag_status", "agg_grouping_sets",
    "agg_having_big_customers", "agg_variance_by_nation",
    "agg_string_agg_priorities", "agg_filtered_conditional",
    "window_row_number_topk", "window_rank_family",
    "window_running_sum", "window_sliding_rows_frame",
    "window_range_frame", "window_lag_lead", "window_ntile_first_last",
    "set_union_all", "set_union_distinct", "set_intersect",
    "set_except", "set_except_all",
    "distinct_simple", "distinct_on_latest_order", "values_inline",
    "expr_unpivot_measures", "expr_regexp_matrix", "expr_json_matrix",
    "engine_sql_end_to_end",
    "events_cohort_retention", "events_rolling_active_users",
    "events_rollup_incremental",
    "dedup_substring_exact_spans",
    "ann_ivfpq_topk", "ann_ivfpq_recall_vs_exact",
    "semdedup_kmeans_assign", "semdedup_prune_keep",
    "embedding_truncate_fidelity",
    "text_bm25_ranking",
    "multimodal_frame_sample_stats",
    # --- 50-entry window boundary ---
    # round-12 rotation guidance: (a) the 3 r8-green rows deferred this
    # round — pipeline_end_to_end_curation, pipeline_dedup_rate_by_source,
    # sample_grouped_split — then (b) r9-green rows oldest-first in
    # registration order (GROUPS frame, subquery forms, recursive query,
    # engine UDF surface, asof/interval/pii families, …), then (c)
    # r10-green rows if slots remain. Any query whose plan is rewritten
    # in round 12 joins the window that same round.
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
