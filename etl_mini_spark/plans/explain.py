"""Physical-plan introspection: a structured summary of the executed
plan so scale properties (pushdown, broadcast choice, shuffle count)
are ASSERTABLE in tests instead of eyeballed in .explain() output.

The reference has no optimizer to audit; here the optimizer is
Catalyst, and this is the feedback loop the build process runs after
every operator: is the filter in the scan? is the dim broadcast? how
many Exchanges does this plan pay for?
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    scans: list[dict] = field(default_factory=list)  # {path, read_schema, pushed_filters}
    joins: list[str] = field(default_factory=list)  # BroadcastHashJoin / SortMergeJoin / ...
    n_exchanges: int = 0
    n_broadcast_exchanges: int = 0
    has_codegen: bool = False
    text: str = ""


def plan_summary(df: DataFrame) -> PlanSummary:
    """Parse the executed (post-AQE-planning) physical plan."""
    spark = df.sparkSession
    # default spark.sql.maxMetadataStringLength=100 truncates long
    # PushedFilters/ReadSchema lists mid-token ("...") — widen while
    # rendering so assertions see the full filter list
    key = "spark.sql.maxMetadataStringLength"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "4000")
    try:
        text = df._jdf.queryExecution().executedPlan().toString()
    finally:
        if prev is not None:
            spark.conf.set(key, prev)
        else:
            spark.conf.unset(key)
    s = PlanSummary(text=text)
    for line in text.splitlines():
        line = line.strip()
        if "FileScan" in line:
            path = re.search(r"Location: \w+\(\d+ paths?\)\[([^\],]+)", line)
            pushed = re.search(r"PushedFilters: \[([^\]]*)", line)
            schema = re.search(r"ReadSchema: struct<([^>]*)", line)
            s.scans.append(
                {
                    "path": path.group(1) if path else None,
                    "pushed_filters": pushed.group(1) if pushed else "",
                    "read_schema": schema.group(1) if schema else "",
                }
            )
        for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct"):
            if line.startswith(j) or f" {j} " in f" {line} ":
                s.joins.append(j)
        if line.startswith("Exchange") or " Exchange " in f" {line} ":
            s.n_exchanges += 1
        if "BroadcastExchange" in line:
            s.n_broadcast_exchanges += 1
        if "WholeStageCodegen" in line:
            s.has_codegen = True
    return s


def scan_read_metrics(df: DataFrame) -> dict[str, int]:
    """EXECUTE the plan and sum the file-scan leaves' read metrics:
    ``{"numFiles", "filesSize", "numPartitions"}``. This is the ground
    truth for partition/file pruning — ``DataFrame.inputFiles()`` lists
    the relation's whole file index and ignores partition filters, so
    only executed scan metrics can prove a layout pruned the read."""
    df.collect()
    totals = {"numFiles": 0, "filesSize": 0, "numPartitions": 0}

    def walk(node):
        cls = node.getClass().getSimpleName()
        # AQE wraps the final plan; query stages wrap their stage plans —
        # descend through both or the scans (and their metrics) are
        # invisible from the top-level leaves.
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if node.nodeName().strip().startswith("Scan"):
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in totals:
                    totals[kv._1()] += kv._2().value()
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return totals
