"""Bucketed interval-join semantics: inclusive bounds, overlapping
intervals, equality keys, numeric vs timestamp columns, and
bucket-width independence (the rewrite must not change results)."""

from __future__ import annotations

import pytest

from xml_to_sqlite3_spark.operators.range_join import interval_join


@pytest.fixture(scope="module")
def frames(spark):
    points = spark.createDataFrame(
        [("a", 5, 1), ("a", 10, 2), ("a", 15, 3), ("b", 10, 4), ("a", 100, 5)],
        ["k", "ts", "pid"],
    )
    intervals = spark.createDataFrame(
        [
            ("a", 0, 10, "i1"),    # contains ts 5, 10 (inclusive end)
            ("a", 10, 20, "i2"),   # contains ts 10 (inclusive start), 15
            ("b", 0, 50, "i3"),    # other key
            ("a", 200, 300, "i4"), # empty
        ],
        ["k", "lo", "hi", "iid"],
    )
    return points, intervals


def _pairs(df):
    return {(r.pid, r.iid) for r in df.collect()}


def test_inclusive_bounds_and_keys(frames):
    points, intervals = frames
    out = interval_join(points, intervals, "ts", "lo", "hi", by=["k"], bucket_seconds=7)
    assert _pairs(out) == {(1, "i1"), (2, "i1"), (2, "i2"), (3, "i2"), (4, "i3")}


@pytest.mark.parametrize("bucket", [1, 3, 1000])
def test_bucket_width_never_changes_results(frames, bucket):
    points, intervals = frames
    out = interval_join(points, intervals, "ts", "lo", "hi", by=["k"], bucket_seconds=bucket)
    assert _pairs(out) == {(1, "i1"), (2, "i1"), (2, "i2"), (3, "i2"), (4, "i3")}
    # exactly-once: no duplicate matches from multi-bucket intervals
    assert out.count() == 5


def test_no_key_pure_range(spark):
    points = spark.createDataFrame([(3, 1), (12, 2)], ["ts", "pid"])
    intervals = spark.createDataFrame([(0, 10, "x"), (2, 20, "y")], ["lo", "hi", "iid"])
    out = interval_join(points, intervals, "ts", "lo", "hi", bucket_seconds=4)
    assert _pairs(out) == {(1, "x"), (1, "y"), (2, "y")}


def test_timestamp_columns(spark):
    from pyspark.sql import functions as F

    points = spark.createDataFrame([("2024-01-01 00:30:00", 1)], ["ts", "pid"]).select(
        F.col("ts").cast("timestamp").alias("ts"), "pid"
    )
    intervals = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-01 01:00:00", "d1")], ["lo", "hi", "iid"]
    ).select(
        F.col("lo").cast("timestamp").alias("lo"),
        F.col("hi").cast("timestamp").alias("hi"),
        "iid",
    )
    out = interval_join(points, intervals, "ts", "lo", "hi", bucket_seconds=3600)
    assert _pairs(out) == {(1, "d1")}
