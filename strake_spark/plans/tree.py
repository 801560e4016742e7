"""ASCII plan tree with pushdown markers.

Reference: crates/runtime/src/query/plan_tree.rs:22-120 renders the
physical plan as an indented tree and marks federated subtrees with
[PUSHED] so users can see what executed remotely vs locally. Spark's
"formatted" explain already carries the scan-level pushdown facts
(PushedFilters / PartitionFilters / ReadSchema); we annotate those with
the same [PUSHED] marker vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _explain_formatted(df: DataFrame) -> str:
    jdf = df._jdf
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), "formatted")


def format_plan_tree(df: DataFrame) -> str:
    """Formatted physical plan, annotating pushed-down scan work."""
    out: list[str] = []
    for line in _explain_formatted(df).splitlines():
        stripped = line.strip()
        if stripped.startswith("PushedFilters:") and "[]" not in stripped.replace(" ", ""):
            line = line + "   [PUSHED]"
        if stripped.startswith("PartitionFilters:") and "[]" not in stripped.replace(" ", ""):
            line = line + "   [PUSHED]"
        out.append(line)
    return "\n".join(out)


def scan_pushdown_report(df: DataFrame) -> dict[str, list[str]]:
    """Extract PushedFilters / ReadSchema per scan — the facts to assert
    in tests ("is the filter actually reaching parquet?")."""
    report: dict[str, list[str]] = {"pushed_filters": [], "partition_filters": [], "read_schema": []}
    for line in _explain_formatted(df).splitlines():
        s = line.strip()
        if s.startswith("PushedFilters:"):
            report["pushed_filters"].append(s.removeprefix("PushedFilters:").strip())
        elif s.startswith("PartitionFilters:"):
            report["partition_filters"].append(s.removeprefix("PartitionFilters:").strip())
        elif s.startswith("ReadSchema:"):
            report["read_schema"].append(s.removeprefix("ReadSchema:").strip())
    return report


def runtime_profile(df: DataFrame) -> list[dict]:
    """EXPLAIN ANALYZE-style report: walk the EXECUTED physical plan
    (after an action has run) collecting each node's SQLMetrics —
    actual row counts, spill sizes, shuffle bytes, scan times
    (reference crates/runtime/src/query/trace.rs:7-72 reports the same
    post-execution view from DataFusion's collect_metrics).

    AQE wrapping is unwrapped (AdaptiveSparkPlan -> final plan, each
    QueryStage -> its materialized subtree), so the report shows the
    plan that actually ran, not the pre-AQE sketch. Call AFTER an
    action; metrics on an unexecuted plan read 0.
    """
    out: list[dict] = []

    def walk(node, depth: int) -> None:
        metrics = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            metrics[kv._1()] = kv._2().value()
        out.append(
            {"node": node.nodeName(), "depth": depth, "metrics": metrics}
        )
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
            return
        if "QueryStage" in name:
            walk(node.plan(), depth + 1)
            return
        ch = node.children().iterator()
        while ch.hasNext():
            walk(ch.next(), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return out


def execute_plan_only(df: DataFrame) -> int:
    """Drive the DataFrame's OWN executed plan to completion without
    materializing any rows on the driver, returning the result row
    count. ``executedPlan().execute()`` is the physical plan's
    InternalRow RDD; ``count()`` on it is a JVM-side action (only
    per-partition longs travel to the driver — rows never leave the
    executors). Because it runs the same QueryExecution instance, every
    node's SQLMetrics populate for runtime_profile(); a separate
    ``df.count()`` would build a different plan and leave this plan's
    metrics at zero (reference crates/runtime/src/query/trace.rs:7-72
    likewise collects metrics, not rows)."""
    return int(df._jdf.queryExecution().executedPlan().execute().count())


def format_runtime_profile(profile: list[dict]) -> str:
    """Human-readable EXPLAIN ANALYZE tree (a few headline metrics per
    node; the full dict stays in the structured report)."""
    headline = ("numOutputRows", "numFiles", "scanTime", "spillSize",
                "shuffleBytesWritten", "dataSize", "pipelineTime")
    lines = []
    for row in profile:
        shown = {k: row["metrics"][k] for k in headline if k in row["metrics"]}
        suffix = (
            " [" + ", ".join(f"{k}={v}" for k, v in shown.items()) + "]"
            if shown
            else ""
        )
        lines.append("  " * row["depth"] + row["node"] + suffix)
    return "\n".join(lines)
