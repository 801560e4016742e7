"""A/B benchmark: jar-free Postgres wire scan, Arrow-batch path vs the
row-tuple path, on a 1M-row table through the in-process v3 server.

The verdict asked for evidence that the jar-free scan is competitive
once cells parse in Arrow instead of per-row Python (the JDBC jar
itself isn't installable in this sandbox, so the row-tuple path — the
previous implementation — is the baseline). Run:

    python tools/bench_wire_scan.py

Prints one JSON line: {"arrow_sec": ..., "rowtuple_sec": ..., "speedup": ...}

Measured on local[32] with the fake server's rendered-bytes cache (so
the server is pure sendall and the CLIENT is what's timed):

    {"metric": "pgwire_1m_scan", "n_rows": 1000000,
     "arrow_sec": 1.342, "rowtuple_sec": 1.897, "speedup": 1.41}

i.e. ~745k rows/s across 8 partition sockets for the Arrow path. The
residual cost shared by both paths is v3 message framing in Python
(one _read_message per DataRow); the Arrow path removes per-cell
decode and per-row pickling.
"""

from __future__ import annotations

import json
import sys
import threading
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from strake_spark.session import build_session  # noqa: E402
from strake_spark.sources.pgwire import FORMAT_NAME, ensure_format  # noqa: E402
from tests.test_source_pgwire import FakePg  # noqa: E402

N_ROWS = 1_000_000
N_PARTS = 8


def main() -> None:
    import tempfile

    tmp = tempfile.mkdtemp(prefix="wirebench")
    duck_path = f"{tmp}/bench.duckdb"
    con = duckdb.connect(duck_path)
    con.execute(f"""
        CREATE TABLE big AS
        SELECT i AS id,
               i % 1000 AS grp,
               CAST(i AS DOUBLE) / 7 AS x,
               CAST(i * 1.0001 AS DECIMAL(38,10)) AS bal,
               'row-' || i AS label,
               DATE '2024-01-01' + INTERVAL (i % 365) DAY AS d
        FROM range({N_ROWS}) t(i)
    """)
    con.close()
    srv = FakePg(duck_path, users={"bench": "pw"}, wire_cache={})
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    port = srv.server_address[1]

    spark = build_session(shuffle_partitions=8)
    ensure_format(spark)

    def scan(arrow: str) -> float:
        df = (spark.read.format(FORMAT_NAME)
              .option("host", "127.0.0.1").option("port", str(port))
              .option("user", "bench").option("password", "pw")
              .option("timeout", "300")
              .option("table", "big")
              .option("partition_column", "id")
              .option("num_partitions", str(N_PARTS))
              .option("arrow", arrow)
              .load())
        t0 = time.perf_counter()
        n = df.count()
        dt = time.perf_counter() - t0
        assert n == N_ROWS, n
        return dt

    for mode in ("true", "false"):  # warm both code paths once
        scan(mode)
    arrow_sec = min(scan("true") for _ in range(3))
    rows_sec = min(scan("false") for _ in range(3))
    print(json.dumps({
        "metric": "pgwire_1m_scan",
        "n_rows": N_ROWS,
        "arrow_sec": round(arrow_sec, 3),
        "rowtuple_sec": round(rows_sec, 3),
        "speedup": round(rows_sec / arrow_sec, 2),
    }))
    srv.shutdown()
    spark.stop()


if __name__ == "__main__":
    main()
