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
# Round-19 window (consolidation round): tier (a) — the two operators
# built+tested in r18 whose registration was deferred by window budget
# (star-contraction clusters, streaming funnel) plus eleven source
# roundtrips (pg/mysql/clickhouse wire, duckdb, flight, xlsx, grpc,
# avro, iceberg, sftp, ftp — every remaining source family promoted
# to driver-green against a live in-process protocol peer), in
# registration order; tier (b) — the eleven rewritten entries below
# (five from the build phase, six from the r19 optimization phase);
# tier (c) — the 26 oldest r15-evidence rows. 24 r15 rows spill to
# the r20 fill. (Counts corrected r20, ADVICE item 1: the tuples
# below are authoritative — 13 + 11 + 26 = 50.)

# Entries whose implementation changes this round (r19):
# multimodal_image_decode / multimodal_image_resize /
# multimodal_binaryfile_image_decode — decode_png gained bounded
# decompression (declared-dims cap + max_length inflate + zero-dim
# reject), the r18 verdict's deferred robustness fix; identical output
# on well-formed payloads, loud on bombs. source_az_spool_roundtrip /
# source_gs_interop_roundtrip — their shared spool path
# (s3http._spool_objects) now refuses mixed-sibling-prefix layouts
# (r19 advice); the entries' own layouts are unchanged but the
# executed function was rewritten, which invalidates old evidence
# under this contract. All five re-verified oracle-identical at
# sf0.01 under a driver-style plain-sort canonicalizer.
_REWRITTEN: tuple[str, ...] = (
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_binaryfile_image_decode",
    "source_az_spool_roundtrip",
    "source_gs_interop_roundtrip",
    # r19 optimization-phase rewrites (each oracle-identical at
    # sf0.001/0.01 under a driver-style plain-sort canonicalizer, and
    # A/B'd at sf0.1): purity — one-aggregation-pass restructure over
    # carried labels; dup_pairs + contamination — the shared hyperplane
    # band UDF is pinned to ONE evaluation (asNondeterministic, guide
    # §4.4); rollup — one fact scan + one aggregation exchange with an
    # xxhash64 split (output provably invariant to the split).
    "curation_cluster_label_purity",
    "ann_embedding_dup_pairs",
    "curation_semantic_contamination",
    "events_rollup_incremental",
    # ngram_jaccard — verification rebuilt on per-doc gram arrays +
    # array_intersect (no candidate x gram explosion); oracle-identical
    # at sf0.001/0.01/0.1, interleaved A/B 4.45 -> 1.52 s.
    "dedup_ngram_jaccard",
    # pack_sequences — the compact (id, n_tok, part) relation is now
    # persisted across its two consumers (offsets aggregate + final
    # windowed pass), removing the second full corpus tokenize; lo/hi
    # from a pruned min/max scan. Oracle-identical at sf0.001/0.01/0.1,
    # interleaved A/B at sf0.1: 1.36 -> 1.26 s median.
    "pipeline_pack_sequences",
)

_PRIORITY: tuple[str, ...] = (
    # (a) never driver-checked: r19 registrations in registration
    # order (dedup imports before streaming_entries before
    # sources_entries)
    "dedup_clusters_star_contraction",
    "stream_funnel_conversion",
    "source_pg_wire_roundtrip",
    "source_mysql_wire_roundtrip",
    "source_clickhouse_http_roundtrip",
    "source_duckdb_roundtrip",
    "source_flight_roundtrip",
    "source_xlsx_roundtrip",
    "source_grpc_roundtrip",
    "source_avro_roundtrip",
    "source_iceberg_roundtrip",
    "source_sftp_roundtrip",
    "source_ftp_roundtrip",
    # (b) rewritten this round (11): the bounded-PNG-decode trio, the
    # two spool-path source roundtrips, and the six optimization-phase
    # restructures
    "multimodal_image_decode",
    "multimodal_image_resize",
    "multimodal_binaryfile_image_decode",
    "source_az_spool_roundtrip",
    "source_gs_interop_roundtrip",
    "curation_cluster_label_purity",
    "ann_embedding_dup_pairs",
    "curation_semantic_contamination",
    "events_rollup_incremental",
    "dedup_ngram_jaccard",
    "pipeline_pack_sequences",
    # (c) oldest evidence: the 26 oldest r15 rows in registration
    # order (all 50 r15-newest rows were displaced out of the r18
    # window by that round's registrations; they come due here)
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
    # --- 50-entry window boundary ---
)

# Carryover remainder: the head of the round-20 fill, in order — the
# 24 remaining r15 rows (these seven, then ann_lsh_bucketed_topk,
# ann_ivf_topk, ann_lsh_recall_vs_exact, ann_ivf_recall_vs_exact,
# ann_pq_topk, ann_pq_recall_vs_exact, curation_knn_label_consistency,
# ann_ivfpq_topk, ann_ivfpq_recall_vs_exact, multimodal_decode_meta,
# stream_view_purchase_join, expr_array_higher_order,
# sample_hash_bucket, sample_shuffle_deterministic,
# pipeline_mixture_upsample, pipeline_source_quota,
# pipeline_shard_manifest, pipeline_chunk_documents). Any query whose
# plan is rewritten in round 20 joins that window the same round.
_NEXT_ROTATION_HEAD: tuple[str, ...] = (
    "set_intersect_all",
    "expr_unpivot_measures",
    "join_lateral_top_orders_per_customer",
    "agg_group_by_all",
    "window_qualify_top2_per_customer",
    "ann_cosine_topk_bruteforce",
    "ann_lsh_bucketed_topk",
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
