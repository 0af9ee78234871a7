"""Runs the full __spark_entry__ queries()/oracle_sql() contract at
sf0.001 — a fast local replica of the driver's correctness gate."""

from __future__ import annotations

import pytest

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
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a schema."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in sorted(set(qs) - set(oracles)):
        df = qs[name](spark, SF_SMOKE)
        assert df.count() >= 0, name
