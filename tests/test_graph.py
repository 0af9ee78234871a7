"""BFS graph traversal tests (hand-computed expectations)."""

from __future__ import annotations

from xml_to_sqlite3_spark.operators.graph import bfs_distances


def _edges(spark, pairs):
    return spark.createDataFrame(
        pairs, "source_node_id string, target_node_id string"
    )


def test_bfs_linear_chain(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    out = {r["node"]: r["distance"] for r in bfs_distances(e, "a", max_depth=3).collect()}
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}  # e beyond depth


def test_bfs_min_distance_on_diamond(spark):
    # a->b->d and a->c->d plus a direct a->d shortcut: d must be 1
    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")])
    out = {r["node"]: r["distance"] for r in bfs_distances(e, "a", max_depth=3).collect()}
    assert out == {"a": 0, "b": 1, "c": 1, "d": 1}


def test_bfs_cycle_terminates(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    out = {r["node"]: r["distance"] for r in bfs_distances(e, "a", max_depth=10).collect()}
    assert out == {"a": 0, "b": 1, "c": 2}


def test_bfs_unreachable_excluded(spark):
    e = _edges(spark, [("a", "b"), ("x", "y")])
    out = {r["node"] for r in bfs_distances(e, "a", max_depth=5).collect()}
    assert out == {"a", "b"}
