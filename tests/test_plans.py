"""Physical-plan regression tests: the optimizations we rely on at
scale (predicate pushdown, column pruning, broadcast joins, no
Python in JVM-only paths) must stay in the plan."""

from __future__ import annotations

import pytest

from xml_to_sqlite3_spark.plans import olap
from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_pushes_all_filters(spark):
    plan = _physical(olap.q6_revenue(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed into the parquet scan"


def test_q6_prunes_columns(spark):
    plan = _physical(olap.q6_revenue(spark, SF_SMOKE))
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" in read_schema
    # untouched wide columns must not be read
    assert "l_returnflag" not in read_schema
    assert "l_orderkey" not in read_schema


def test_q3_broadcasts_dimensions(spark):
    plan = _physical(olap.q3_shipping_priority(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_q5_no_shuffle_joins_for_dims(spark):
    plan = _physical(olap.q5_local_supplier(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan  # all dims fit broadcast at test scale


def test_no_python_in_olap_paths(spark):
    """The OLAP core must stay JVM-side — no BatchEvalPython /
    ArrowEvalPython stages (Python UDFs) in any plan."""
    for name, fn in olap.QUERIES.items():
        plan = _physical(fn(spark, SF_SMOKE))
        assert "EvalPython" not in plan, f"{name} dropped into Python"


def test_sessionization_single_shuffle(spark):
    """Window + groupBy on the same key reuse one exchange."""
    plan = _physical(olap.sessionization(spark, SF_SMOKE))
    # exchanges: one for the user_id window/agg chain + the final
    # orderBy range exchange; anything more means a lost partitioning
    assert plan.count("Exchange") <= 3
