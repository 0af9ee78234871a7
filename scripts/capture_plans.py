#!/usr/bin/env python3
"""Capture .explain("formatted") for named queries() entries.

Usage:
    python scripts/capture_plans.py <suffix> <query> [<query> ...]
    python scripts/capture_plans.py <suffix> ALL

Writes plans/$SPARK_GRAFT_PLANS_DIR/<query>_<suffix>.txt (default
plans/r16) for each query (suffix is typically "before" or
"after").  Uses the same session/config as bench.py so plan shapes
match what the bench times.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import __spark_entry__ as entrymod  # noqa: E402
from xml_to_sqlite3_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(_HERE, "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    qs = entrymod.queries()
    if names == ["ALL"]:
        names = list(qs)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
