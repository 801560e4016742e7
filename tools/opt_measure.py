"""Per-entry isolation harness for the optimization rounds (guide §1).

Times one or more inventory entries in a fresh bench-shaped session,
using the noop sink (computes every column, discards the result) so the
measurement is the computation, not the sink or the optimizer's
count()-pruning. Optionally captures ``explain('formatted')`` to a file
per entry.

Usage:
    python tools/opt_measure.py ENTRY [ENTRY...] [--iters N] [--count]
        [--explain-dir DIR] [--sf-dir DIR]

Prints one line per entry: median/min/max over N timed runs after one
untimed warmup, plus the warmup time (codegen/JIT + first-touch scan).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--count", action="store_true",
                    help="time .count() (bench parity) instead of the noop sink")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--conf", action="append", default=[], metavar="K=V",
                    help="extra session conf (repeatable) for A/B runs")
    args = ap.parse_args()

    from strake_spark import inventory
    from strake_spark.session import build_session

    spark = build_session(
        app_name="opt-measure",
        driver_memory=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        extra_conf={
            "spark.driver.extraJavaOptions": "-Xlog:disable",
            **dict(c.split("=", 1) for c in args.conf),
        },
    )
    # absorb session startup before any per-entry warmup
    spark.read.parquet(os.path.join(args.sf_dir, "region.parquet")).count()

    def action(df):
        if args.count:
            df.count()
        else:
            df.write.format("noop").mode("overwrite").save()

    for name in args.entries:
        spec = inventory.REGISTRY[name]
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        t = time.perf_counter()
        action(spec.fn(spark, args.sf_dir))
        warmup = time.perf_counter() - t
        runs = []
        for i in range(args.iters):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t = time.perf_counter()
            action(spec.fn(spark, args.sf_dir))
            runs.append(round(time.perf_counter() - t, 4))
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: med={statistics.median(runs):.4f} min={min(runs):.4f} "
            f"max={max(runs):.4f} warmup={warmup:.4f} runs={runs}",
            flush=True,
        )
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = spec.fn(spark, args.sf_dir)
            # _explainString goes through the captured-output API so the
            # text lands here, not on the JVM's stdout
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(txt)
        # Isolation between entries (the tool's whole point): operator
        # persists (minhash signatures, gram relations, ...) otherwise
        # stay pinned while LATER entries are timed — a multi-entry
        # invocation measured dedup_cross_corpus_candidates at 3.48 s
        # median under two prior entries' caches vs 1.93 s isolated.
        # Within one entry's iterations the caches stay (bench parity).
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
