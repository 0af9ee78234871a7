"""Physical-plan audit: structured facts about what Catalyst actually
chose, for assertions and operator-development feedback.

The scale rules this engine lives by (§4 of SURVEY.md) are plan
properties — filters reached the scan, small sides broadcast, no
Python stage in a JVM path, no surprise shuffle. `audit_plan` turns
the executed-plan text into counts and lists so tests (and users
iterating on a query) can assert them directly instead of grepping
explain output by hand.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def audit_plan(df: DataFrame) -> dict:
    """Facts from the EXECUTED physical plan (AQE-final where
    available): exchange/join/codegen counts, Python stages, pushed
    and partition filters, and the columns each scan reads.

    Keys:
      exchanges, broadcast_joins, sortmerge_joins, python_stages,
      generates, scans, wholestage_codegen_spans — ints
      pushed_filters, partition_filters — list[str] (one per scan)
      read_schemas — list[list[str]] (column names per scan)
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [m.group(1) for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan)]
    part = [m.group(1) for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan)]
    schemas = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        schemas.append(
            [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        )
    return {
        "exchanges": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "python_stages": plan.count("EvalPython"),
        "generates": plan.count("Generate"),
        "scans": plan.count("Scan parquet") + plan.count("Scan csv")
        + plan.count("Scan json"),
        "wholestage_codegen_spans": len(
            set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        ),
        "pushed_filters": pushed,
        "partition_filters": part,
        "read_schemas": schemas,
    }


def assert_scale_clean(df: DataFrame, max_exchanges: int | None = None) -> dict:
    """Raise if the plan violates the non-negotiables (a Python stage
    in what should be a JVM path; optionally an exchange budget);
    returns the audit for further checks."""
    a = audit_plan(df)
    if a["python_stages"]:
        raise AssertionError(f"plan has {a['python_stages']} Python stage(s)")
    if max_exchanges is not None and a["exchanges"] > max_exchanges:
        raise AssertionError(
            f"plan has {a['exchanges']} exchanges (budget {max_exchanges})"
        )
    return a
