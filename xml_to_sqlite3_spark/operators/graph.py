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
    materialize_edges: bool = True,
) -> DataFrame:
    """Minimum hop-distance from ``source`` to every node reachable
    within ``max_depth`` directed edges. Returns (node, distance),
    including the source at distance 0.

    First-arrival BFS: a node enters the result at its minimum depth
    and is pruned (anti-join) from later frontiers — so cycles and
    dense fan-in cost nothing extra.

    The (possibly filtered, possibly duplicated) edge input is
    projected to (src, dst), deduped, and localCheckpointed ONCE up
    front: every level then joins against materialized executor-local
    blocks instead of re-running the upstream scan+filter per level
    (max_depth full-table scans per lookup is the scale killer this
    avoids; on a cluster the checkpoint blocks live on executors, not
    the driver). Each level is then a broadcast hash join: the small
    frontier is broadcast and the edge blocks stream in place. For
    frontiers too big to broadcast (whole-graph sweeps at extreme
    fan-out), set ``broadcast_frontier=False`` to fall back to a
    shuffle hash join per level.
    """
    spark = edges.sparkSession
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if materialize_edges:
        # derived/filtered edge inputs: evaluate once, then every
        # level scans materialized blocks instead of re-running the
        # upstream plan. For edges that are ALREADY a bare (pruned)
        # table scan, pass materialize_edges=False — copying the
        # whole edge set into checkpoint blocks costs more than the
        # max_depth pruned scans it saves, and duplicate (src,dst)
        # pairs are harmless (the per-level distinct dedups nodes).
        e = e.distinct().localCheckpoint(eager=True)

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


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected pair graph:
    (node, component) where component = min node id reachable from
    ``node``. Nodes are whatever appears in the edge list.

    Min-label propagation: each round every node takes the minimum of
    its own label and its neighbors' labels (one join + one map-side
    combinable min-aggregate per round), converging in O(component
    diameter) rounds — near-duplicate clusters are shallow, so this
    terminates in a handful of rounds regardless of corpus size.
    localCheckpoint per round keeps lineage flat; the early-exit
    check rides the same action that materializes the round.

    This is the canonical-document step of a dedup pipeline: pairs
    from MinHash/SimHash/embedding LSH -> components -> keep
    min(doc_id) per component (``duplicate_groups``).
    """
    e = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    und = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = und.select("u").distinct().withColumn("label", F.col("u"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr = und.join(
            labels.select(F.col("u").alias("v"), F.col("label").alias("nl")), "v"
        ).select("u", "nl", F.lit(None).cast(labels.schema["label"].dataType).alias("old"))
        # Carry each node's previous label through the same aggregate
        # that computes its new one, so convergence is read off the
        # round's already-materialized checkpoint (a cheap block scan)
        # instead of re-running the propagation join a second time.
        new_labels = (
            labels.select(
                "u", F.col("label").alias("nl"), F.col("label").alias("old")
            )
            .unionByName(nbr)
            .groupBy("u")
            .agg(
                F.min("nl").alias("label"),
                F.min("old").alias("old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old")).limit(1).count()
        labels = new_labels.select("u", "label")
        if changed == 0:
            break
    return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))


def duplicate_groups(
    pairs: DataFrame,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
) -> DataFrame:
    """Canonicalize near-duplicate PAIRS into groups: (doc_id,
    component, is_keeper) where the keeper is the minimum doc_id of
    each connected component. The decision a dedup pipeline actually
    needs — pairs alone under-delete (A~B, B~C must drop both B and
    C even if A~C was never emitted)."""
    comp = connected_components(pairs, src_col=doc_a, dst_col=doc_b)
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        (F.col("node") == F.col("component")).alias("is_keeper"),
    )


def reachable(
    edges: DataFrame,
    source: str,
    max_depth: int = 3,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
) -> DataFrame:
    """Node set reachable from ``source`` within ``max_depth`` hops."""
    return bfs_distances(edges, source, max_depth, src_col, dst_col).select("node")


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
) -> DataFrame:
    """PageRank over the directed edge set: (node, rank), ranks
    summing to ~1. The reference names "graph traversal operations"
    as the database's purpose (main.rb:22-24); centrality over the
    cross-reference graph is that surface's analytical core.

    Distributed power iteration, all-DataFrame: per round ONE join of
    the rank vector against the (deduped, checkpointed) edge list and
    one map-side-combinable sum by destination; dangling mass (nodes
    with no out-edges) is a 1-row aggregate broadcast back uniformly
    — the standard formulation, never a driver-side matrix. Rank
    vector is localCheckpointed per round (flat lineage; each round's
    shuffle is independently AQE-sized). Output rounds to 8 decimals:
    per-partition float summation order perturbs ~1e-15 relative,
    far below the rounding, so results are deterministic run to run.
    """
    spark = edges.sparkSession
    # hash-partition the edge checkpoint by src: localCheckpoint
    # preserves the partitioning, so every round's rank⋈edges join
    # reuses it and only the (much smaller) rank vector shuffles —
    # measured ~20% off the whole iteration at sf0.1, and at cluster
    # scale it removes n_iter full edge-set shuffles. 8 partitions,
    # not defaultParallelism: the per-round frames are sketch-sized
    # and task-launch overhead dominates compute on them.
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .repartition(min(8, edges.sparkSession.sparkContext.defaultParallelism), "src")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_total = nodes.count()
    if n_total == 0:
        # empty graph degrades to an empty result like bfs/triangles
        # (1.0 / n_total below would raise on the driver otherwise)
        return spark.createDataFrame([], "node string, rank double")
    # static (node, out-degree) spine, built once — the rank vector
    # CARRIES the degree between rounds, so each round is one
    # edge join + one spine join instead of three joins
    spine = (
        nodes.join(
            e.groupBy(F.col("src").alias("node")).agg(
                F.count(F.lit(1)).alias("__deg")
            ),
            "node",
            "left",
        )
        .localCheckpoint(eager=True)
    )

    ranks = spine.withColumn("rank", F.lit(1.0 / n_total)).localCheckpoint(eager=True)
    teleport = (1.0 - damping) / n_total
    for _i in range(n_iter):
        # dangling nodes redistribute their whole rank uniformly
        dangling = (
            ranks.filter(F.col("__deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm"))
        )
        contrib = (
            e.join(
                ranks.filter(F.col("__deg").isNotNull()).select(
                    F.col("node").alias("src"), (F.col("rank") / F.col("__deg")).alias("__c")
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = (
            spine.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n_total)
                ).alias("rank"),
            )
        )
        # checkpoint every OTHER round: two rounds of lineage stay
        # cheap to replan, and halving the eager materializations
        # halves the fixed per-round job overhead that dominates on
        # sketch-sized rank vectors
        if _i % 2 == 1 or _i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.round("rank", 8).alias("rank"))


def triangle_count(
    edges: DataFrame,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
) -> DataFrame:
    """Global triangle count over the undirected simple graph of
    ``edges``. Returns one row: (n_edges, n_triangles).

    The scale-critical trick is DEGREE ORIENTATION (the standard
    distributed formulation): orient every undirected edge from its
    lower-degree endpoint to its higher-degree endpoint (ties by id).
    Every triangle then has exactly one 'pivot' vertex with two
    out-edges, so counting wedges (u->v, u->w) that close with an
    oriented edge (v->w) counts each triangle EXACTLY once — and the
    wedge join's fan-out per vertex is bounded by the oriented
    out-degree, which is O(sqrt(m)) for any graph, so a celebrity
    vertex with 10M neighbors contributes sqrt-bounded work instead
    of 10M^2 wedge candidates. Three hash joins, no cross product,
    no driver state.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    da = deg.select(F.col("v").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("v").alias("b"), F.col("d").alias("db"))
    lower_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        )
        # hash-partition the checkpoint on the pivot: the wedge
        # e1⋈e2 is a self-join on u, so with the blocks already
        # partitioned by u it runs co-partitioned — the full oriented
        # edge set never reshuffles for the fan-out stage (only the
        # closing join's (v, w) shuffle remains)
        .repartition(min(8, edges.sparkSession.sparkContext.defaultParallelism), "u")
        .localCheckpoint(eager=True)
    )
    e1 = oriented.select(F.col("u"), F.col("w").alias("v"))
    e2 = oriented.select(F.col("u"), F.col("w"))
    wedges = e1.join(e2, "u").filter(F.col("v") < F.col("w"))
    # close the wedge with an oriented edge between v and w (either
    # orientation — degree order between v and w is not known here)
    closing = oriented.select(
        F.least("u", "w").alias("v"), F.greatest("u", "w").alias("w")
    )
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_e = und.agg(F.count(F.lit(1)).alias("n_edges"))
    return n_e.crossJoin(F.broadcast(tri))


def adamic_adar_topk(
    edges: DataFrame,
    k: int = 50,
    src_col: str = "source_node_id",
    dst_col: str = "target_node_id",
    max_degree: int | None = 1000,
) -> DataFrame:
    """Link prediction by Adamic-Adar index: for node pairs NOT yet
    connected, score = sum over common neighbors v of 1/ln(deg(v));
    returns the top-``k`` candidate pairs (node_a, node_b, aa_score,
    n_common). The classic graph-completion / recommendation query
    over the cross-reference graph.

    Scale shape: wedges are generated per CENTER neighbor (one
    self-join of the adjacency list on the center, n1 < n2 halving),
    so fan-out is quadratic only in per-vertex degree — the
    ``max_degree`` guard drops celebrity centers (a 10M-degree hub
    contributes ~0 weight anyway: 1/ln(10M) spread over 10^14 pairs)
    exactly like ngram_jaccard's max_df. Existing edges leave by
    anti-join; the final cut is a TakeOrdered, not a global window.
    Determinism: per-wedge weights are rounded then DECIMAL-summed
    (order-independent), ties break on the pair itself.
    """
    und = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    adj = und.select(F.col("a").alias("v"), F.col("b").alias("n")).unionByName(
        und.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    centers = deg.filter(F.col("d") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("d") <= max_degree)
    # weight carried on the center BEFORE the wedge join — rounded to
    # 9 decimals so the per-pair sum can run as exact decimal
    wadj = (
        adj.join(
            centers.select(
                "v",
                F.round(F.lit(1.0) / F.log(F.col("d").cast("double")), 9)
                .cast("decimal(18,9)")
                .alias("w"),
            ),
            "v",
        )
        # hash-partition the checkpoint on the wedge pivot so the
        # e1⋈e2 self-join below runs co-partitioned on the blocks —
        # the full weighted adjacency never reshuffles for the
        # fan-out stage. Full parallelism, not the iterative family's
        # 8: the wedge expansion is the compute-heavy stage and wants
        # every core (8 partitions measured ~1.7x slower here).
        .repartition(edges.sparkSession.sparkContext.defaultParallelism, "v")
        .localCheckpoint(eager=True)
    )
    a1 = wadj.select("v", F.col("n").alias("n1"), "w")
    a2 = wadj.select("v", F.col("n").alias("n2"))
    pairs = (
        a1.join(a2, "v")
        .filter(F.col("n1") < F.col("n2"))
        .groupBy(F.col("n1").alias("node_a"), F.col("n2").alias("node_b"))
        .agg(
            F.round(F.sum("w").cast("double"), 6).alias("aa_score"),
            F.count(F.lit(1)).alias("n_common"),
        )
    )
    novel = pairs.join(
        und.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )
    return novel.orderBy(F.desc("aa_score"), "node_a", "node_b").limit(k)
