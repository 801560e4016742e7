"""Benchmark harness — mirrors the reference's bench set.

The reference benches simplified TPC-H Q1/Q3/Q4/Q6/Q10/Q18
(crates/bench/src/main.rs:160-167, 3 iterations, wall-clock ms). We run
those six (plus Q5 as the join stress case) through the Spark engine at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS], and print ONE JSON line:

    {"metric": "tpch_total", "value": <sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "startup_sec": ...}

Per-query value = MEDIAN of N timed iterations (default 4) after ONE
UNTIMED warmup execution. Rounds 1-5 billed the warmup into the run
array, which put the run-to-run spread at 9-26% on unchanged code
(r5 verdict) — a real 20% regression would have been invisible. The
warmup absorbs codegen/JIT + first-touch scan costs; the full timed
run arrays stay in "queries_detail" so any residual spread is
inspectable. "value" is the median total across all 7 queries;
"tpch_total_5q" preserves the round-1-comparable subtotal
(q1/q3/q5/q6/q10).

Session startup is reported separately, never billed to q1.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

BENCH_QUERIES = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
    "tpch_q18_large_volume_customers",
)

# The 5-query set benched in rounds 1-3 — kept as a separate subtotal so
# round-over-round comparisons stay apples-to-apples.
_R1_COMPAT = (
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q10_returned_items",
)

# Training-pipeline operators benched alongside (reported separately;
# the headline "value" stays the TPC-H total for round-over-round
# comparability).
PIPELINE_QUERIES = (
    "dedup_minhash_lsh_candidates",
    "dedup_exact",
    "ann_cosine_topk_bruteforce",
    "text_quality_score",
    "pipeline_decontaminate_ngram",
    "pipeline_chunk_documents",  # added r7: map-only chunking throughput
    "semdedup_prune_keep",  # added r7: k-means + within-cluster prune
    "text_bm25_ranking",  # added r7: posting-list BM25
    "events_rollup_incremental",  # added r7: continuous-aggregate merge
)


def _neardup_t09(spark, sf_dir):
    """Embedding near-dup at the PRODUCTION regime (t=0.9, 8-bit bands,
    small buckets). The registered ann_embedding_dup_pairs entry keeps
    t=0.4 so the driver's correctness row is non-vacuous on the
    synthetic corpus, but t=0.4 makes nearly every pair a candidate
    (banding cannot prune below the similarity floor) — benching it
    would measure an intentionally-degenerate configuration."""
    from strake_spark.data import table
    from strake_spark.operators import similarity as S

    return S.embedding_dup_pairs(
        table(spark, sf_dir, "embeddings"), threshold=0.9, num_bands=16, band_bits=8
    )


# Bench-only callables (not inventory entries — their sf0.1 row counts
# can be legitimately 0, which would read as a vacuous driver row).
CUSTOM_PIPELINE = {"ann_embedding_neardup_t09": _neardup_t09}


def _run(spec, spark, sf_dir: str, iters: int) -> tuple[dict, int]:
    # One untimed warmup per query: whole-stage codegen compilation, JIT,
    # and first-touch scan/page-cache costs land here, not in the stats.
    t = time.perf_counter()
    spec.fn(spark, sf_dir).count()
    warmup = round(time.perf_counter() - t, 4)
    runs = []
    n = 0
    for _ in range(max(1, iters)):
        t = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t, 4))
    return (
        {
            "min": min(runs),
            "med": round(statistics.median(runs), 4),
            "max": max(runs),
            "runs": runs,
            "warmup": warmup,
        },
        n,
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    iters = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "4"))

    t0 = time.perf_counter()
    from strake_spark.session import build_session
    from strake_spark import inventory

    spark = build_session(
        app_name="strake-spark-bench",
        # Spark local defaults to a 1 GiB driver heap — the whole bench
        # (12 queries, cached LSH signatures) runs in one JVM, so size
        # the heap for the workload, not the default.
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # JVM unified-logging warnings (gc,alloc) print to STDOUT and
        # would corrupt the single-JSON-line contract below.
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    # Touch the JVM + read one footer so session startup isn't billed to q1.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    startup = time.perf_counter() - t0

    detail: dict[str, dict] = {}
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        d, n = _run(inventory.REGISTRY[name], spark, sf_dir, iters)
        detail[name] = d
        times[name] = d["med"]
        print(f"# {name}: med={d['med']:.3f}s runs={d['runs']} rows={n}", file=sys.stderr)

    pipeline: dict[str, float] = {}
    for name in PIPELINE_QUERIES:
        spec = inventory.REGISTRY.get(name)
        if spec is None:
            continue
        d, n = _run(spec, spark, sf_dir, iters)
        detail[name] = d
        pipeline[name] = d["med"]
        print(f"# {name}: med={d['med']:.3f}s runs={d['runs']} rows={n}", file=sys.stderr)

    class _Spec:
        def __init__(self, fn):
            self.fn = fn

    for name, fn in CUSTOM_PIPELINE.items():
        d, n = _run(_Spec(fn), spark, sf_dir, iters)
        detail[name] = d
        pipeline[name] = d["med"]
        print(f"# {name}: med={d['med']:.3f}s runs={d['runs']} rows={n}", file=sys.stderr)

    # one UNTIMED-warmup-free single pass over the 15 NON-headline
    # TPC-H queries (the 7 headline queries above run the full
    # protocol): proves the complete 22-query surface executes at this
    # SF without inflating bench wall-clock
    tpch_rest = {}
    for name, spec in sorted(inventory.REGISTRY.items()):
        if not name.startswith("tpch_") or name in BENCH_QUERIES:
            continue
        t = time.perf_counter()
        n = spec.fn(spark, sf_dir).count()
        tpch_rest[name] = round(time.perf_counter() - t, 4)
        print(f"# {name}: single={tpch_rest[name]:.3f}s rows={n}", file=sys.stderr)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "tpch_total",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "queries_detail": detail,
                "tpch_total_5q": round(sum(times[q] for q in _R1_COMPAT), 4),
                "pipeline": pipeline,
                "pipeline_total": round(sum(pipeline.values()), 4),
                # the 15 non-headline queries, single pass each; the
                # estimate adds the 7 headline medians for a full-22 figure
                "tpch_rest_single_pass": tpch_rest,
                "tpch_rest_single_total": round(sum(tpch_rest.values()), 4),
                "tpch22_total_estimate": round(
                    sum(times.values()) + sum(tpch_rest.values()), 4
                ),
                "iterations": max(1, iters),
                "warmup_discarded": True,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "startup_sec": round(startup, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
