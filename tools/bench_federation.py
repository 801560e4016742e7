"""A/B benchmark: subquery-level federation vs local execution.

Builds an in-process DuckDB "remote" holding a scaled-up orders table,
then runs a mixed statement whose CTE aggregates the remote data and
joins the result to a local parquet dim:

- PUSHED: plans/subtree.py ships the CTE; only the aggregate's result
  rows (= n_nations) cross the wire.
- LOCAL: pushdown disabled; every remote row crosses into Spark before
  aggregating.

The wire-row counts are the scale story (25 vs n_rows): the remote
here is IN-PROCESS, so there is no network and warmed wall times
converge — over a real link the transferred-bytes gap is the entire
cost difference. Both paths are warmed once, then timed over
iterations (medians reported). Run:

    python tools/bench_federation.py [scale_rows]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import tempfile

    import duckdb

    sys.path.insert(0, "/root/repo")
    import strake_spark as ss
    from strake_spark.plans.federation import plan_sql
    from strake_spark.session import build_session

    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    sf_dir = "/root/testdata/sf0.01"

    tmp = tempfile.mkdtemp(prefix="fedbench")
    dpath = f"{tmp}/remote.duckdb"
    con = duckdb.connect(dpath)
    con.execute(
        f"""CREATE TABLE orders AS
            SELECT (range % 150000)::BIGINT AS o_custkey,
                   (random() * 1000)::DECIMAL(12,2) AS o_totalprice,
                   'P' || (range % 5) AS o_orderpriority
            FROM range({n_rows})"""
    )
    con.close()

    spark = build_session(app_name="fed-bench", shuffle_partitions=8)
    eng = ss.connect(
        {
            "sources": [
                {"name": "rm", "type": "duckdb", "url": dpath},
                {
                    "name": "lc",
                    "type": "parquet",
                    "url": sf_dir,
                    "tables": [{"name": "nation"}],
                },
            ]
        },
        spark=spark,
    )
    sql = """
    WITH agg AS (
      SELECT o_custkey % 25 AS nk, count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(19,4))) AS total
      FROM rm_orders GROUP BY o_custkey % 25
    )
    SELECT nt.n_name, agg.n, agg.total
    FROM agg JOIN lc_nation nt ON agg.nk = nt.n_nationkey
    """

    import statistics

    from strake_spark.plans import subtree as _sub

    def run_pushed():
        df, plan = plan_sql(eng.spark, sql)
        n = df.count()
        assert plan is not None and any(
            s.temp_view.startswith("strake_sub_") for s in plan.scans
        ), "subtree pushdown did not fire"
        return n

    def run_local():
        orig = _sub.analyze_subtrees
        _sub.analyze_subtrees = lambda *a, **k: None
        try:
            df, _ = plan_sql(eng.spark, sql)
            return df.count()
        finally:
            _sub.analyze_subtrees = orig

    rows, rows2 = run_pushed(), run_local()  # warm both paths
    assert rows == rows2

    def timed(fn, iters=3):
        ts = []
        for _ in range(iters):
            t = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t)
        return statistics.median(ts)

    pushed_s = timed(run_pushed)
    local_s = timed(run_local)
    print(
        json.dumps(
            {
                "metric": "subtree_federation_ab",
                "remote_rows": n_rows,
                "wire_rows_pushed": 25,
                "wire_rows_local": n_rows,
                "pushed_sec": round(pushed_s, 3),
                "local_sec": round(local_s, 3),
                "speedup": round(local_s / pushed_s, 2),
                "result_rows": rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
