"""Runs the full __spark_entry__ queries()/oracle_sql() contract at
sf0.001 — a fast local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

# replays every oracled gate against DuckDB (~6 min) — excluded from the inner loop (-m "not heavy")
pytestmark = pytest.mark.heavy

import __spark_entry__ as entrymod
from tests.oracle_harness import compare
from tests.conftest import SF_SMOKE


def _param_ids():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return sorted(k for k in qs if k in oracles)


@pytest.mark.parametrize("name", _param_ids())
def test_query_matches_oracle(spark, name):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, SF_SMOKE)
    ok, detail = compare(df, oracles[name], SF_SMOKE)
    assert ok, f"{name}: {detail}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark):
    """Queries without an oracle must run and return actual rows.

    ``> 0``, not ``>= 0`` (r10 VERDICT item 4): every rows-only gate
    is rows-only because its VALUES aren't SQL-expressible, not
    because it may legitimately be empty — graph_pagerank reads the
    store's materialized pr_ranks, so a store regression that empties
    that table must fail HERE before the driver records a 0-row gate.
    """
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_SMOKE)
        assert df.count() > 0, f"{name}: rows-only gate returned 0 rows"
        assert len(df.schema.fields) > 0, name
