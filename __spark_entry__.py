"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# make the package importable even when this module is loaded by
# file path from another working directory
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from xml_to_sqlite3_spark.plans import (
    curation_q,
    llm_pipeline,
    node_graph,
    olap,
    olap_ext,
    streaming_q,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return olap.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(olap.QUERIES)
    out.update(olap_ext.QUERIES)
    out.update(node_graph.QUERIES)
    out.update(llm_pipeline.QUERIES)
    out.update(streaming_q.QUERIES)
    out.update(curation_q.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for each queries() key.

    Keys absent here (non-SQL-expressible ops) get the driver's weaker
    rows-only check.
    """
    out: dict[str, str] = {}
    out.update(olap.ORACLES)
    out.update(olap_ext.ORACLES)
    out.update(node_graph.ORACLES)
    out.update(llm_pipeline.ORACLES)
    out.update(streaming_q.ORACLES)
    out.update(curation_q.ORACLES)
    return out
