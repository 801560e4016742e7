"""Capture .explain('formatted') for inventory entries WITHOUT running
them (plan shape only — use tools/opt_measure.py for timings).

Usage: python tools/capture_plans.py OUTDIR ENTRY [ENTRY...] [--sf-dir D]
       [--suffix _before]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("entries", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    from strake_spark import inventory
    from strake_spark.session import build_session

    spark = build_session(
        app_name="capture-plans",
        extra_conf={"spark.driver.extraJavaOptions": "-Xlog:disable"},
    )
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.entries:
        df = inventory.REGISTRY[name].fn(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt)} bytes, raw Exchange mentions={n_ex} -> {path}",
              flush=True)
        spark.catalog.clearCache()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
