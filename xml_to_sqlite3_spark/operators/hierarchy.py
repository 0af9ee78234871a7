"""Hierarchy traversal — the reference's recursive-CTE query surface.

Reference queries (README "Get hierarchical structure",
examples/sql_queries.md "ancestors"/"descendants"): recursive CTEs
over nodes/cross_references with a depth bound of 10.

Spark 4 supports ``WITH RECURSIVE`` natively (Catalyst UnionLoop), so
the primary implementation is the declarative CTE. An iterative
breadth-first DataFrame loop is provided too — it lets callers
checkpoint the frontier per level, which matters for very deep
graphs at scale (lineage stays flat, AQE re-sizes each level's
shuffle independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def node_tree(spark: SparkSession, nodes: DataFrame, max_depth: int = 100) -> DataFrame:
    """README node_tree: every node with its level below the roots
    (parent_id IS NULL). Columns: id, node_type, parent_id, content,
    level.

    The projected node set is localCheckpointed before it becomes the
    CTE input: Catalyst's UnionLoop re-evaluates the anchor's source
    once per iteration, so an unpersisted view would re-run the
    upstream scan ``depth`` times — the checkpoint makes each
    iteration a scan of materialized executor-local blocks."""
    nodes.select("id", "node_type", "parent_id", "content").localCheckpoint(
        eager=True
    ).createOrReplaceTempView("__h_nodes")
    return spark.sql(
        f"""
        WITH RECURSIVE node_tree AS (
          SELECT id, node_type, parent_id, content, 0 AS level
          FROM __h_nodes WHERE parent_id IS NULL
          UNION ALL
          SELECT n.id, n.node_type, n.parent_id, n.content, nt.level + 1
          FROM __h_nodes n JOIN node_tree nt ON n.parent_id = nt.id
          WHERE nt.level < {int(max_depth)}
        )
        SELECT * FROM node_tree
        """
    )


def node_tree_iterative(nodes: DataFrame, max_depth: int = 100) -> DataFrame:
    """Breadth-first frontier-join equivalent of node_tree.

    Each level is one co-partitioned join; the frontier is cached and
    localCheckpointed so lineage doesn't grow with depth. Stops when
    a level comes back empty.
    """
    base = nodes.select("id", "node_type", "parent_id", "content")
    frontier = base.filter(F.col("parent_id").isNull()).withColumn("level", F.lit(0))
    out = frontier
    level = 0
    frontier = frontier.localCheckpoint(eager=True)
    while level < max_depth:
        child = base.alias("n").join(
            frontier.select(F.col("id").alias("__pid")).alias("f"),
            F.col("n.parent_id") == F.col("f.__pid"),
        )
        nxt = child.select("n.id", "n.node_type", "n.parent_id", "n.content").withColumn(
            "level", F.lit(level + 1)
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt
        level += 1
    return out


def ancestors(
    spark: SparkSession, xrefs: DataFrame, node_id: str, max_depth: int = 10
) -> DataFrame:
    """All ancestors of ``node_id`` via parent_child cross_references
    with depth and ' -> ' path (examples/sql_queries.md).

    Iterative upward walk, one level per broadcast hash join: the
    frontier for a single-node lookup never exceeds the node's
    branching factor (one row per level in a tree), so each level
    streams the edge set once against a broadcast frontier — no
    shuffle, no per-iteration re-plan. The recursive-CTE equivalent
    (Catalyst UnionLoop) shuffle-joins the full edge table per level,
    which at 100 TB is ``max_depth`` full-edge shuffles per lookup.
    """
    edges = (
        xrefs.filter(F.col("reference_type") == "parent_child")
        .select(
            F.col("source_node_id").alias("parent"),
            F.col("target_node_id").alias("child"),
        )
        # materialize the 2-column edge projection ONCE: the walk
        # below scans it per level, and without the checkpoint each
        # level re-derives it from the full xref table (max_depth
        # full scans per lookup — see descendants, which already
        # does this)
        .localCheckpoint(eager=True)
    )
    frontier = (
        edges.filter(F.col("child") == node_id)
        .select(
            F.col("parent").alias("ancestor_id"),
            F.lit(1).alias("depth"),
            F.col("parent").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    for depth in range(2, max_depth + 1):
        if frontier.isEmpty():
            break
        nxt = (
            edges.join(
                F.broadcast(
                    frontier.select(F.col("ancestor_id").alias("child"), "path")
                ),
                "child",
            )
            .select(
                F.col("parent").alias("ancestor_id"),
                F.lit(depth).alias("depth"),
                F.concat(F.col("parent"), F.lit(" -> "), F.col("path")).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def descendants(
    spark: SparkSession, xrefs: DataFrame, node_id: str, max_depth: int = 10
) -> DataFrame:
    """All descendants of ``node_id`` (examples/sql_queries.md).

    Iterative downward walk, mirror of ``ancestors``: the
    parent_child edge projection is localCheckpointed once, then each
    level is one broadcast hash join — the frontier for a single-node
    lookup is one subtree level, so the edge blocks stream in place
    with no shuffle and no per-iteration re-plan. (The recursive-CTE
    formulation — still used by node_tree, where the anchor is the
    whole root set — shuffle-joins the full edge table per level; for
    a one-node lookup that is ``max_depth`` full-edge shuffles.)
    Emits one row per distinct path, exactly like the reference CTE.
    """
    edges = (
        xrefs.filter(F.col("reference_type") == "parent_child")
        .select(
            F.col("source_node_id").alias("parent"),
            F.col("target_node_id").alias("child"),
        )
        .localCheckpoint(eager=True)
    )
    frontier = (
        edges.filter(F.col("parent") == node_id)
        .select(
            F.col("child").alias("descendant_id"),
            F.lit(1).alias("depth"),
            F.col("child").alias("path"),
        )
        .localCheckpoint(eager=True)
    )
    levels = [frontier]
    for depth in range(2, max_depth + 1):
        if frontier.isEmpty():
            break
        nxt = (
            edges.join(
                F.broadcast(
                    frontier.select(F.col("descendant_id").alias("parent"), "path")
                ),
                "parent",
            )
            .select(
                F.col("child").alias("descendant_id"),
                F.lit(depth).alias("depth"),
                F.concat(F.col("path"), F.lit(" -> "), F.col("child")).alias("path"),
            )
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out
