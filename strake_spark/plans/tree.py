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
