"""Local replica of the driver's DuckDB correctness gate.

Runs a Spark plan and its oracle SQL side by side and compares
row count, column names, and order-insensitive values — the same
shape of check the driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return cols, data


def compare(spark_df, oracle_sql: str, sf_dir: str):
    """Return (ok, detail) comparing a Spark DataFrame to oracle SQL."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)

    con = duck_connection(sf_dir)
    res = con.execute(oracle_sql)
    d_cols = [d[0] for d in res.description]
    d_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    sc, sd = _canon(s_cols, s_rows)
    dc, dd = _canon(d_cols, d_rows)

    if sc != dc:
        return False, f"column mismatch: spark={sc} duckdb={dc}"
    if len(sd) != len(dd):
        return False, f"row count mismatch: spark={len(sd)} duckdb={len(dd)}"
    for i, (a, b) in enumerate(zip(sd, dd)):
        if a != b:
            return False, f"value mismatch at sorted row {i}: spark={a!r} duckdb={b!r}"
    return True, f"ok ({len(sd)} rows)"
