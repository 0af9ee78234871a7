"""Graph traversal over the cross-reference graph.

The reference's stated purpose is a database "for further
post-processing, such as ... graph traversal operations"
(/root/reference/main.rb:22-24, README). These operators make that
surface first-class: BFS shortest distances and reachability over
the edge set, as iterative frontier joins.

Scale shape: per level one broadcast hash join frontier⋈edges (the
edge side streams in place, never shuffles), with the visited set
pruned by anti-join — never a driver-side set. localCheckpoint per
level keeps lineage flat; a shuffle-join fallback exists for
frontiers too large to broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    source: str,
    max_depth: int = 3,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Minimum hop-distance from ``source`` to every node reachable
    within ``max_depth`` directed edges. Returns (node, distance),
    including the source at distance 0.

    First-arrival BFS: a node enters the result at its minimum depth
    and is pruned (anti-join) from later frontiers — so cycles and
    dense fan-in cost nothing extra.

    Each level is a broadcast hash join: the (small) frontier is
    broadcast and the edge set is streamed in place — no edge-side
    shuffle and no up-front materialization of a deduped edge copy.
    Duplicate raw edges only produce duplicate frontier candidates,
    which the per-level ``distinct()`` (frontier-sized shuffle)
    removes. Callers pass ``edges`` persisted if they run several
    traversals. For frontiers too big to broadcast (whole-graph
    sweeps at extreme fan-out), set ``broadcast_frontier=False`` to
    fall back to a shuffle hash join per level.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))

    visited = spark.createDataFrame([(source, 0)], "node string, distance int")
    visited = visited.localCheckpoint(eager=True)
    frontier = visited
    for depth in range(1, max_depth + 1):
        f = frontier.select(F.col("node").alias("src"))
        v = visited.select("node")
        if broadcast_frontier:
            f = F.broadcast(f)
            v = F.broadcast(v)
        nxt = (
            e.join(f, "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(v, "node", "left_anti")
            .withColumn("distance", F.lit(depth))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        # union of already-checkpointed frontiers — lineage stays
        # flat without re-materializing the growing visited set
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def reachable(
    edges: DataFrame,
    source: str,
    max_depth: int = 3,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
) -> DataFrame:
    """Node set reachable from ``source`` within ``max_depth`` hops."""
    return bfs_distances(edges, source, max_depth, src_col, dst_col).select("node")
