#!/usr/bin/env python3
"""Targeted oracle-parity check for named queries() entries.

Usage:
    python scripts/check_parity.py <query> [<query> ...]

Runs each named query against the DuckDB oracle with the driver's
comparison (tests/oracle_harness.compare) at $SPARK_GRAFT_SF_DIR
(default sf0.01).  Queries without an oracle are run rows-only
(must return > 0 rows).  Exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

import __spark_entry__ as entrymod  # noqa: E402
from tests.oracle_harness import compare  # noqa: E402
from xml_to_sqlite3_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="check_parity")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names == ["ALL"]:
        names = sorted(qs)
    n_bad = 0
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            if name in oracles:
                ok, detail = compare(df, oracles[name], sf_dir)
            else:
                n = df.count()
                ok, detail = n > 0, f"rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            ok, detail = False, f"ERROR {e}"
        print(f"{name}: {'MATCH' if ok else 'FAIL'} — {detail}", flush=True)
        if not ok:
            n_bad += 1
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
