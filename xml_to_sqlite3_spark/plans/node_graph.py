"""The reference's node-graph data model constructed deterministically
over the driver's TPC-H-ish parquet tables, plus the full reference
query surface (README "Example Queries" + examples/sql_queries.md)
with exact DuckDB oracle mirrors.

Why this exists: the driver's correctness gate runs on the parquet
tables, while the reference's domain is an XML-derived node graph.
We bridge by BUILDING that graph from the tables — a 5-level
hierarchy (region > nation > customer > order > lineitem, plus
root-level parts and nation-level suppliers) with typed properties
and reference-valued attributes — using the SAME production
operators (structural + attribute-reference detection) that the XML
path uses. The oracle mirrors the construction in pure SQL, so every
reference query is hash-checked end to end THROUGH the operators.

Scale: the construction is narrow projections + unions (no shuffle);
the graph queries then exercise the real join/agg machinery.
"""

from __future__ import annotations

import json
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io_util import load
from ..functions.type_inference import infer_type
from ..operators import relationships as R
from ..operators import hierarchy as H


def _money(col):
    # Fixed-point string so Spark's and DuckDB's double->string rules
    # (scientific notation thresholds differ) can't diverge.
    return F.col(col).cast("decimal(18,2)").cast("string")


def build_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes(id, node_type, document_id, parent_id, position, content, xpath)."""
    region = load(spark, sf_dir, "region").select(
        F.concat(F.lit("region_"), "r_regionkey").alias("id"),
        F.lit("region").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.col("r_regionkey").cast("bigint").alias("position"),
        F.col("r_name").alias("content"),
        F.concat(F.lit("/tpch/region["), F.col("r_regionkey") + 1, F.lit("]")).alias("xpath"),
    )
    nation = load(spark, sf_dir, "nation").select(
        F.concat(F.lit("nation_"), "n_nationkey").alias("id"),
        F.lit("nation").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.concat(F.lit("region_"), "n_regionkey").alias("parent_id"),
        F.col("n_nationkey").cast("bigint").alias("position"),
        F.col("n_name").alias("content"),
        F.concat(F.lit("/tpch/nation["), F.col("n_nationkey") + 1, F.lit("]")).alias("xpath"),
    )
    customer = load(spark, sf_dir, "customer").select(
        F.concat(F.lit("customer_"), "c_custkey").alias("id"),
        F.lit("customer").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.concat(F.lit("nation_"), "c_nationkey").alias("parent_id"),
        F.col("c_custkey").cast("bigint").alias("position"),
        F.col("c_name").alias("content"),
        F.concat(F.lit("/tpch/customer["), F.col("c_custkey") + 1, F.lit("]")).alias("xpath"),
    )
    supplier = load(spark, sf_dir, "supplier").select(
        F.concat(F.lit("supplier_"), "s_suppkey").alias("id"),
        F.lit("supplier").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.concat(F.lit("nation_"), "s_nationkey").alias("parent_id"),
        F.col("s_suppkey").cast("bigint").alias("position"),
        F.col("s_name").alias("content"),
        F.concat(F.lit("/tpch/supplier["), F.col("s_suppkey") + 1, F.lit("]")).alias("xpath"),
    )
    part = load(spark, sf_dir, "part").select(
        F.concat(F.lit("part_"), "p_partkey").alias("id"),
        F.lit("part").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.lit(None).cast("string").alias("parent_id"),
        F.col("p_partkey").cast("bigint").alias("position"),
        F.col("p_name").alias("content"),
        F.concat(F.lit("/tpch/part["), F.col("p_partkey") + 1, F.lit("]")).alias("xpath"),
    )
    orders = load(spark, sf_dir, "orders").select(
        F.concat(F.lit("order_"), "o_orderkey").alias("id"),
        F.lit("order").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.concat(F.lit("customer_"), "o_custkey").alias("parent_id"),
        F.col("o_orderkey").cast("bigint").alias("position"),
        F.concat(F.col("o_orderstatus"), F.lit(" "), F.col("o_orderpriority")).alias("content"),
        F.concat(F.lit("/tpch/order["), F.col("o_orderkey") + 1, F.lit("]")).alias("xpath"),
    )
    lineitem = load(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("lineitem_"), "l_orderkey", F.lit("_"), "l_linenumber").alias("id"),
        F.lit("lineitem").alias("node_type"),
        F.lit("tpch").alias("document_id"),
        F.concat(F.lit("order_"), "l_orderkey").alias("parent_id"),
        F.col("l_linenumber").cast("bigint").alias("position"),
        F.concat(F.col("l_returnflag"), F.col("l_linestatus")).alias("content"),
        F.concat(
            F.lit("/tpch/lineitem["), F.col("l_orderkey"), F.lit("_"), F.col("l_linenumber"), F.lit("]")
        ).alias("xpath"),
    )
    return reduce(DataFrame.unionByName, [region, nation, customer, supplier, part, orders, lineitem])


NODES_SQL = """
  SELECT 'region_' || r_regionkey AS id, 'region' AS node_type, 'tpch' AS document_id,
         CAST(NULL AS VARCHAR) AS parent_id, CAST(r_regionkey AS BIGINT) AS position,
         r_name AS content, '/tpch/region[' || (r_regionkey + 1) || ']' AS xpath
  FROM region
  UNION ALL
  SELECT 'nation_' || n_nationkey, 'nation', 'tpch', 'region_' || n_regionkey,
         CAST(n_nationkey AS BIGINT), n_name, '/tpch/nation[' || (n_nationkey + 1) || ']'
  FROM nation
  UNION ALL
  SELECT 'customer_' || c_custkey, 'customer', 'tpch', 'nation_' || c_nationkey,
         CAST(c_custkey AS BIGINT), c_name, '/tpch/customer[' || (c_custkey + 1) || ']'
  FROM customer
  UNION ALL
  SELECT 'supplier_' || s_suppkey, 'supplier', 'tpch', 'nation_' || s_nationkey,
         CAST(s_suppkey AS BIGINT), s_name, '/tpch/supplier[' || (s_suppkey + 1) || ']'
  FROM supplier
  UNION ALL
  SELECT 'part_' || p_partkey, 'part', 'tpch', CAST(NULL AS VARCHAR),
         CAST(p_partkey AS BIGINT), p_name, '/tpch/part[' || (p_partkey + 1) || ']'
  FROM part
  UNION ALL
  SELECT 'order_' || o_orderkey, 'order', 'tpch', 'customer_' || o_custkey,
         CAST(o_orderkey AS BIGINT), o_orderstatus || ' ' || o_orderpriority,
         '/tpch/order[' || (o_orderkey + 1) || ']'
  FROM orders
  UNION ALL
  SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'lineitem', 'tpch',
         'order_' || l_orderkey, CAST(l_linenumber AS BIGINT),
         l_returnflag || l_linestatus,
         '/tpch/lineitem[' || l_orderkey || '_' || l_linenumber || ']'
  FROM lineitem
"""


def build_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """node_properties(node_id, property_name, property_value, data_type).

    Values are strings (the reference stores attribute text); money
    goes through DECIMAL(18,2) so both engines print identically.
    Reference-valued properties (customer_ref / part_ref /
    supplier_ref) exist so attribute-reference detection has real
    work to do.

    Plan shape: ONE scan per source table — each row explodes into
    its property structs in-task (vs. a UNION ALL of per-property
    scans, which would read lineitem five times).
    """

    def props_of(df, node_id, pairs):
        entries = F.array(
            *[
                F.struct(
                    F.lit(name).alias("property_name"),
                    value.cast("string").alias("property_value"),
                )
                for name, value in pairs
            ]
        )
        return df.select(node_id.alias("node_id"), F.explode(entries).alias("p")).select(
            "node_id", "p.property_name", "p.property_value"
        )

    pieces = [
        props_of(
            load(spark, sf_dir, "customer"),
            F.concat(F.lit("customer_"), "c_custkey"),
            [
                ("mktsegment", F.col("c_mktsegment")),
                ("acctbal", _money("c_acctbal")),
            ],
        ),
        props_of(
            load(spark, sf_dir, "orders"),
            F.concat(F.lit("order_"), "o_orderkey"),
            [
                ("orderstatus", F.col("o_orderstatus")),
                ("totalprice", _money("o_totalprice")),
                ("orderdate", F.col("o_orderdate").cast("string")),
                ("orderpriority", F.col("o_orderpriority")),
                ("customer_ref", F.concat(F.lit("customer_"), "o_custkey")),
            ],
        ),
        props_of(
            load(spark, sf_dir, "lineitem"),
            F.concat(F.lit("lineitem_"), "l_orderkey", F.lit("_"), "l_linenumber"),
            [
                ("quantity", F.col("l_quantity")),
                ("extendedprice", _money("l_extendedprice")),
                ("shipdate", F.col("l_shipdate")),
                ("part_ref", F.concat(F.lit("part_"), "l_partkey")),
                ("supplier_ref", F.concat(F.lit("supplier_"), "l_suppkey")),
            ],
        ),
        props_of(
            load(spark, sf_dir, "part"),
            F.concat(F.lit("part_"), "p_partkey"),
            [
                ("brand", F.col("p_brand")),
                ("type", F.col("p_type")),
                ("size", F.col("p_size")),
                ("retailprice", _money("p_retailprice")),
            ],
        ),
        props_of(
            load(spark, sf_dir, "supplier"),
            F.concat(F.lit("supplier_"), "s_suppkey"),
            [("acctbal", _money("s_acctbal"))],
        ),
        # multi-valued reference property: each order lists its
        # lineitem ids space-separated (ordered by line number) —
        # the multi-reference adapter's food
        load(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("l_linenumber").alias("n"),
                                F.concat(
                                    F.lit("lineitem_"), "l_orderkey", F.lit("_"), "l_linenumber"
                                ).alias("ref"),
                            )
                        )
                    ),
                    lambda s: s["ref"],
                ),
            ).alias("property_value")
        )
        .select(
            F.concat(F.lit("order_"), "l_orderkey").alias("node_id"),
            F.lit("lineitem_refs").alias("property_name"),
            "property_value",
        ),
    ]
    out = reduce(DataFrame.unionByName, pieces)
    return out.withColumn("data_type", infer_type(F.col("property_value")))


# data_type inference in SQL — mirrors functions/type_inference.py
# (and the reference's document_parser.rb:62-77 check order).
_INFER_SQL = """
  CASE
    WHEN property_value IS NULL OR property_value = '' THEN 'string'
    WHEN regexp_matches(property_value, '^[0-9]+$') THEN 'integer'
    WHEN regexp_matches(property_value, '^[0-9]+\\.[0-9]+$') THEN 'float'
    WHEN regexp_matches(lower(property_value), '^(true|false)$') THEN 'boolean'
    WHEN regexp_matches(property_value, '^[0-9]{4}-[0-9]{2}-[0-9]{2}')
      OR regexp_matches(property_value, '^[0-9]{2}:[0-9]{2}:[0-9]{2}') THEN 'datetime'
    ELSE 'string'
  END
"""

PROPERTIES_SQL = f"""
  SELECT node_id, property_name, property_value, {_INFER_SQL} AS data_type
  FROM (
    SELECT 'customer_' || c_custkey AS node_id, 'mktsegment' AS property_name,
           c_mktsegment AS property_value FROM customer
    UNION ALL
    SELECT 'customer_' || c_custkey, 'acctbal',
           CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR) FROM customer
    UNION ALL
    SELECT 'order_' || o_orderkey, 'orderstatus', o_orderstatus FROM orders
    UNION ALL
    SELECT 'order_' || o_orderkey, 'totalprice',
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'order_' || o_orderkey, 'orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
    UNION ALL
    SELECT 'order_' || o_orderkey, 'orderpriority', o_orderpriority FROM orders
    UNION ALL
    SELECT 'order_' || o_orderkey, 'customer_ref', 'customer_' || o_custkey FROM orders
    UNION ALL
    SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'quantity',
           CAST(l_quantity AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'extendedprice',
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'shipdate',
           CAST(l_shipdate AS VARCHAR) FROM lineitem
    UNION ALL
    SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'part_ref',
           'part_' || l_partkey FROM lineitem
    UNION ALL
    SELECT 'lineitem_' || l_orderkey || '_' || l_linenumber, 'supplier_ref',
           'supplier_' || l_suppkey FROM lineitem
    UNION ALL
    SELECT 'part_' || p_partkey, 'brand', p_brand FROM part
    UNION ALL
    SELECT 'part_' || p_partkey, 'type', p_type FROM part
    UNION ALL
    SELECT 'part_' || p_partkey, 'size', CAST(p_size AS VARCHAR) FROM part
    UNION ALL
    SELECT 'part_' || p_partkey, 'retailprice',
           CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS VARCHAR) FROM part
    UNION ALL
    SELECT 'supplier_' || s_suppkey, 'acctbal',
           CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR) FROM supplier
    UNION ALL
    SELECT 'order_' || l_orderkey, 'lineitem_refs',
           string_agg('lineitem_' || l_orderkey || '_' || l_linenumber, ' '
                      ORDER BY l_linenumber)
    FROM lineitem GROUP BY l_orderkey
  )
"""

# cross_references via the same adapter semantics the operators
# implement (structural_adapter.rb + attribute_reference_adapter.rb).
XREFS_SQL = """
  SELECT parent_id AS source_node_id, id AS target_node_id,
         'parent_child' AS reference_type, CAST(NULL AS VARCHAR) AS attribute_name,
         CAST(1.0 AS DOUBLE) AS confidence
  FROM nodes WHERE parent_id IS NOT NULL
  UNION ALL
  SELECT id, parent_id, 'child_parent', CAST(NULL AS VARCHAR), CAST(1.0 AS DOUBLE)
  FROM nodes WHERE parent_id IS NOT NULL
  UNION ALL
  SELECT a.id, b.id, 'sibling', CAST(NULL AS VARCHAR), CAST(1.0 AS DOUBLE)
  FROM nodes a JOIN nodes b
    ON a.document_id = b.document_id AND a.parent_id = b.parent_id AND a.id <> b.id
  UNION ALL
  SELECT a.id, b.id, 'next_sibling', CAST(NULL AS VARCHAR), CAST(1.0 AS DOUBLE)
  FROM nodes a JOIN nodes b
    ON a.document_id = b.document_id AND a.parent_id = b.parent_id
   AND b.position - a.position = 1
  UNION ALL
  SELECT b.id, a.id, 'previous_sibling', CAST(NULL AS VARCHAR), CAST(1.0 AS DOUBLE)
  FROM nodes a JOIN nodes b
    ON a.document_id = b.document_id AND a.parent_id = b.parent_id
   AND b.position - a.position = 1
  UNION ALL
  SELECT np.node_id, np.property_value, 'attribute_reference', np.property_name,
         least(CAST(1.0 AS DOUBLE), CAST(0.8 AS DOUBLE)
           + CASE WHEN lower(np.property_name) LIKE '%id%'
                    OR lower(np.property_name) LIKE '%ref%'
                    OR lower(np.property_name) LIKE '%parent%'
                    OR lower(np.property_name) LIKE '%child%'
                    OR lower(np.property_name) LIKE '%target%'
                    OR lower(np.property_name) LIKE '%source%'
                    OR lower(np.property_name) LIKE '%link%'
                  THEN CAST(0.15 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
           + CASE WHEN regexp_matches(np.property_value, '^[a-zA-Z]+_[a-zA-Z0-9]+$')
                  THEN CAST(0.05 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
  FROM node_properties np
  JOIN nodes n ON np.node_id = n.id
  WHERE (regexp_matches(np.property_value, '^[a-zA-Z_][a-zA-Z0-9_]*$')
         OR regexp_matches(np.property_value, '^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$'))
    AND EXISTS (SELECT 1 FROM nodes t
                WHERE t.document_id = n.document_id AND t.id = np.property_value)
"""

GRAPH_PREFIX = (
    f"WITH RECURSIVE nodes AS ({NODES_SQL}),\n"
    f"node_properties AS ({PROPERTIES_SQL}),\n"
    f"cross_references AS ({XREFS_SQL})\n"
)


_GRAPH_CACHE: dict[tuple[int, str], tuple[DataFrame, DataFrame, DataFrame]] = {}
_MULTI_XREF_CACHE: dict[tuple[int, str], DataFrame] = {}
_TRI_ORIENTED_CACHE: dict[tuple[int, str], DataFrame] = {}
_PR_EDGES_CACHE: dict[tuple[int, str], DataFrame] = {}
_PR_SPINE_CACHE: dict[tuple[int, str], DataFrame] = {}
_PR_STATS_CACHE: dict[tuple[int, str], tuple[int, int]] = {}
_PR_RANKS_CACHE: dict[tuple[int, str], DataFrame] = {}
_DEGREES_CACHE: dict[tuple[int, str], DataFrame] = {}
_TARGETS_CACHE: dict[tuple[int, str], DataFrame] = {}
_LEVELS_CACHE: dict[tuple[int, str], DataFrame] = {}
_AA_UND_CACHE: dict[tuple[int, str], DataFrame] = {}
_AA_CENTERS_CACHE: dict[tuple[int, str], DataFrame] = {}
_CORENESS_CACHE: dict[tuple[int, str], DataFrame] = {}
_GRAPH_CACHE_DIRS: list[str] = []

# the pagerank gate's deterministic edge subsample (xxhash64 mod 10
# < 3, i.e. ~30%) — shared by the store build (pr_edges/pr_spine)
# and any caller that needs to reproduce the gate's graph mix
_PR_SAMPLE_MOD = 10
_PR_SAMPLE_KEEP = 3

# The cache stores the FULL xref multiset. Round 4 stored only one
# direction of the mirror-symmetric types (child_parent = flipped
# parent_child, etc.) and reconstructed the rest with an explode at
# scan time; that halved the one-time build write (~26s at sf0.1)
# but the explode sat below every consumer's filters, so
# reference_type predicates and column pruning could not reach the
# parquet scan and self-joins paid the scan+explode twice — a
# measured ~45s aggregate query tax per bench run
# (bidirectional_refs 0.99s -> 22.8s was the worst). At 100x scale
# the trade is strictly worse: the un-pruned explode is paid on
# every query, the write only once. sortWithinPartitions on
# reference_type clusters each file's row groups by type so the
# min/max statistics make type filters prune at the row-group
# level without partitionBy's dynamic-partition sort.


# target pair rows per sibling slice (and per sort task): bounds the
# per-task sort buffer regardless of data scale — the same ~2M-row
# budget the non-sibling range write uses
_SIB_ROWS_PER_SLICE = 2_000_000

# two-tier split point: groups with more members than this are FAT
# and go through the slice path; smaller groups' pairs (<= ~1M rows
# per group) ride detection/staging like any other reference type.
# The split is what makes the fat slices' range partitioning balanced
# BY CONSTRUCTION: fat slices are uniform (~_SIB_ROWS_PER_SLICE pairs
# each), so partitioning them by slice count IS partitioning by pair
# count. A single mixed-tier slice table measured catastrophically at
# sf1: 1.5M skinny order-group slices (~12 pairs) dominated the range
# sampler while 525 nation slices carried 2M pairs each — boundaries
# landed in the skinny id range and a couple of tasks sorted ~500M
# rows (1228s build vs 568s; the r8 GC-thrash lesson re-learned).
_SIB_FAT_K = 1000

# hard ceiling on the fat tier's total member count (the broadcast
# side of the pair expansion): ~400 MB of ids at 8 bytes + overhead.
# The build fails loudly at this bound instead of OOMing mid-broadcast.
_MAX_FAT_MEMBERS = 50_000_000


def _sibling_chunks(nodes: DataFrame) -> DataFrame:
    """The FAT groups' sibling-pair multiset in O(children) form with
    NO O(k) row anywhere: one row per (fat group, member-chunk)
    carrying (document_id, parent_id, k, chunk, min_source), chunk a
    sorted slice of the group's member ids.

    Fat groups (child count > the two-tier split point) are detected
    by a model-sized COUNT aggregate; members re-attach by broadcast
    join and are chunked with a row_number window — the r9 design's
    per-group collect_list(members) row (~200 MB in one aggregation
    buffer for a 10M-child parent, then broadcast whole) never
    exists. The largest row here is one CHUNK: ceil(k / ceil(k²/R))
    ≤ ~sqrt(R) ids (~1.4k ids / ~20 KB at the 2M-pair budget)
    regardless of k. Both sides of the pair expansion use this same
    table — source chunks range-partition the write, target chunks
    broadcast (Σk ids total, bounded-row) — see _sibling_rows.

    A hot parent's k² pair rows NEVER exist upstream of the store's
    final write — each source chunk expands to ~_SIB_ROWS_PER_SLICE
    pairs (chunk sources × all members) inside the write task
    itself, so detection, staging, and the range shuffle move member
    CHUNKS (Σk ids total), not pair rows (Σk² — 530M rows and ~210s
    of range shuffle at sf1, measured before the two-tier design).

    min_source (the chunk's first id) is the range-partition key, so
    every write task receives chunks whose pair SOURCES fall in its
    key range — the within-partition sort then gives each file the
    same tight per-row-group source bounds the non-sibling dirs get.

    document_id.isNotNull() matches the staged tier's equi-join
    semantics (a NULL key never joins), keeping the analytic degrees
    contribution and the pair multiset in exact agreement (r9 ADVICE:
    a NULL-document fat group would otherwise add phantom degree
    counts no pair row carries)."""
    from pyspark.sql import Window

    with_parent = nodes.filter(
        F.col("parent_id").isNotNull() & F.col("document_id").isNotNull()
    ).select("document_id", "parent_id", "id")
    fat = (
        with_parent.groupBy("document_id", "parent_id")
        .agg(F.count(F.lit(1)).alias("k"))
        .filter(F.col("k") > _SIB_FAT_K)
    )
    members = with_parent.join(F.broadcast(fat), ["document_id", "parent_id"])
    k = F.col("k")
    n_chunks = F.ceil(
        (k.cast("double") * k) / F.lit(float(_SIB_ROWS_PER_SLICE))
    ).cast("int")
    chunk_size = F.ceil(k / n_chunks).cast("int")
    rn = F.row_number().over(
        Window.partitionBy("document_id", "parent_id").orderBy("id")
    )
    return (
        members.withColumn("__cid", ((rn - 1) / chunk_size).cast("int"))
        .groupBy("document_id", "parent_id", "k", "__cid")
        .agg(F.sort_array(F.collect_list("id")).alias("chunk"))
        .select(
            "document_id",
            "parent_id",
            "k",
            "chunk",
            F.element_at("chunk", 1).alias("min_source"),
        )
    )


def _sibling_rows(slices: DataFrame, chunks: DataFrame) -> DataFrame:
    """Expand source chunks to the full both-directions sibling pair
    rows (reference parity: structural_adapter.rb's i<j loop writes
    both directions with identical metadata). The target side is the
    SAME chunk table joined in by BROADCAST on the group key (narrow
    — the range partitioning of the source slices survives; total
    broadcast is Σk member ids across fat groups in bounded ~sqrt(R)
    rows, never one O(k) row), then two chained explodes — codegen'd
    Generates, no shuffle — so the k² multiset first exists inside
    the consuming task. Source chunk × every target chunk of its
    group covers exactly source-member × member, and the != filter
    compares VALUES, so the pair multiset is identical to the
    staged tier's equi-join on ids (pinned by
    test_store_build_decomposition_is_identical_multiset)."""
    return (
        slices.join(
            F.broadcast(
                chunks.select(
                    "document_id", "parent_id", F.col("chunk").alias("targets")
                )
            ),
            ["document_id", "parent_id"],
        )
        .select(
            "document_id", "targets", F.explode("chunk").alias("source_node_id")
        )
        .select(
            "document_id",
            "source_node_id",
            F.explode("targets").alias("target_node_id"),
        )
        .filter(F.col("source_node_id") != F.col("target_node_id"))
        .select(
            "source_node_id",
            "target_node_id",
            F.lit(None).cast("string").alias("attribute_name"),
            F.lit(1.0).alias("confidence"),
            "document_id",
        )
    )


def _graph_cache_root() -> str:
    import os
    import tempfile

    return os.environ.get(
        "SPARK_GRAFT_GRAPH_CACHE",
        os.path.join(tempfile.gettempdir(), "spark_graft_graph_cache"),
    )


def _graph_code_files() -> tuple:
    """The build-code identity shared by the base store key and the
    appended-store keys: this module + the relationship /
    type-inference operators the build drives + the graph operators
    whose orient_edges/pagerank outputs are store tables + the
    hierarchy walk (node_levels) + the hash primitive (aa_und's
    subsample — r10 ADVICE: a stable_hash60 change must invalidate
    the store or the persisted subsample silently diverges from the
    oracle's live md5 replay)."""
    from ..functions import hashing as _hash
    from ..functions import type_inference as _ti
    from ..operators import graph as _gr
    from ..operators import hierarchy as _hi
    from ..operators import relationships as _rel

    return (
        __file__,
        _rel.__file__,
        _ti.__file__,
        _gr.__file__,
        _hi.__file__,
        _hash.__file__,
    )


def _graph_cache_key(sf_dir: str, build_coreness: bool = True) -> str:
    """Content key: the input parquet identity (path + per-file size
    and mtime) and the build code itself (_graph_code_files, plus the
    shared cache machinery via cache_util.content_key). A code edit
    or regenerated testdata produces a new key — the stale entry for
    that sf_dir is pruned after the fresh build succeeds.
    ``build_coreness`` is part of the key (via ``extra``, so it also
    scopes the stale-prune prefix): a store without the coreness
    table is a DIFFERENT live configuration, never a stale sibling
    of the full store."""
    from ..cache_util import content_key

    return content_key(
        "g",
        sf_dir,
        extra="" if build_coreness else "nocore",
        code_files=_graph_code_files(),
        suffixes=(".parquet",),
    )


def _graph_append_key(
    sf_dir: str, chain: str, build_coreness: bool = True
) -> str:
    """THE content key of an APPENDED store entry (the
    _minhash_store_key discipline): one definition shared by
    append_documents and the maintenance-stream attach accessor
    (streaming/ingest.current_maintained_graph), so a key-format
    change can never desynchronize a reader from the entry it
    expects."""
    from ..cache_util import content_key

    return content_key(
        "ga",
        sf_dir,
        extra=f"append|{chain}" + ("" if build_coreness else "|nocore"),
        code_files=_graph_code_files(),
        suffixes=(".parquet",),
    )


def get_graph(
    spark: SparkSession, sf_dir: str, build_coreness: bool = True
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(nodes, properties, xrefs), materialized once per CONTENT.

    ``build_coreness=False`` skips the k-core H-index fixpoint (and
    its coreness table) — the one store artifact only the graph_kcore
    query reads, and the dominant GLOBAL cost at scale: measured
    fixpoint cost 22s/82s/351s at sf0.01/0.1/1, and at sf3 it roughly
    DOUBLES the cold build (1807s with vs ~804s without,
    BENCH_newops_r13). Corpora that never query k-core should opt
    out. The flag is part of the persistent content key (two live
    configurations, not stale siblings) and of the session handle
    key; gates always use the default full store.

    The driver runs every gate query back to back in one session;
    without materialization each query would recompute the ~18M-row
    xref set (sibling pairs dominate). The cache is parquet under a
    deterministic path keyed on (input files, build code) — see
    _graph_cache_key — so the gate run, the bench run, and repeated
    local sessions all share ONE ~35s build instead of each paying
    it. This is the reference's own model (build the SQLite database
    once, query it many times) and the 100 TB posture: the
    relationship table is a materialized TABLE in the warehouse,
    rebuilt only when its inputs or its build logic change.

    Parquet, not executor-memory columnar cache: measured at sf0.1,
    .persist() spends 82-288s building the in-memory cache of these
    string-heavy frames (warm scans no faster than parquet), while
    evaluate-once + parquet write + read-back costs ~30s total and
    every later scan is a vectorized, compressed, column-pruned read.
    """
    from ..cache_util import content_cached_dir

    # applicationId, not id(sparkContext): CPython reuses object
    # addresses after GC, so an id()-keyed hit could hand back
    # DataFrames bound to a STOPPED session
    key = (
        (spark.sparkContext.applicationId, sf_dir)
        if build_coreness
        else (spark.sparkContext.applicationId, sf_dir, "nocore")
    )
    if key in _GRAPH_CACHE:
        return _GRAPH_CACHE[key]

    ck = _graph_cache_key(sf_dir, build_coreness=build_coreness)

    def _build(tmp: str) -> None:
        # the nodes and properties writes are independent jobs —
        # submit them from two threads so the scheduler overlaps
        # them (neither alone saturates the executor cores;
        # measured ~7s + ~11s sequential -> ~11s overlapped).
        # xrefs must wait: detection reads both back.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            fn = pool.submit(
                lambda: build_nodes(spark, sf_dir)
                .write.mode("overwrite")
                .parquet(f"{tmp}/nodes")
            )
            fp = pool.submit(
                lambda: build_properties(spark, sf_dir)
                .write.mode("overwrite")
                .parquet(f"{tmp}/properties")
            )
            fn.result()
            fp.result()
        nodes_tmp = spark.read.parquet(f"{tmp}/nodes")
        props_tmp = spark.read.parquet(f"{tmp}/properties")
        _write_store_tables(spark, tmp, nodes_tmp, props_tmp, mode="overwrite")
        _write_rank_tables(spark, tmp, build_coreness=build_coreness)
        with open(f"{tmp}/_COMPLETE", "w") as f:
            f.write(ck)

    # publish / race / stale-prune / mtime-lease: the shared
    # cache_util machinery (one copy of the subtle logic, also used
    # by the BM25 index cache)
    final = content_cached_dir(
        _graph_cache_root(), ck, _build, owned_dirs=_GRAPH_CACHE_DIRS
    )
    return _attach_store(spark, sf_dir, final, key)


def _write_store_tables(
    spark: SparkSession,
    tmp: str,
    nodes_in: DataFrame,
    props_in: DataFrame,
    mode: str = "overwrite",
    base_dir: str | None = None,
) -> None:
    """Stage relationship detection over ``nodes_in``/``props_in`` and
    write every derived store table except the rank tables
    (pr_stats/pr_ranks — those are GLOBAL, see _write_rank_tables).

    ``mode="overwrite"`` is the full build. ``mode="append"`` is the
    DELTA build (append_documents): ``nodes_in`` holds only the new
    documents, per-document-local tables append their delta files
    into the (hard-linked) base table dirs, and the two tables whose
    rows can MIX base and delta contributions — degrees and targets
    (a parent_id or xref target string appears verbatim in both) —
    merge against the base store read from ``base_dir`` and rewrite.
    Every reference type the detector emits is within-document
    (streaming/ingest.py's batch-local maintenance rests on the same
    fact), so a delta detection over the delta documents alone is
    EXACT — pinned by tests/test_store_append.py's multiset-identity
    test against a full build over the unioned input.
    """
    if mode == "append" and base_dir is None:
        raise ValueError("append mode requires base_dir")
    # Full xref set, PARTITIONED by reference_type: type
    # filters prune whole directories, and the type value
    # lives in the path instead of a per-row column (measured
    # 2x faster full scans). WITHIN each type the rows are
    # range-partitioned + sorted on source_node_id, so every
    # file carries a tight (min, max) source range and a
    # point filter on source_node_id prunes at the footer —
    # the r5 store's per-task random source mix left every
    # file spanning the whole id range, forcing OR-predicate
    # consumers (node_references) to full-scan the doubled
    # multiset (4.28s). The range shuffle is a one-time build
    # cost; the write adds no extra sort because the child's
    # (reference_type, source_node_id) ordering already
    # satisfies the dynamic-partition writer's required
    # reference_type prefix. An APPEND-mode write lands the
    # delta's own range-sorted files in the same partition
    # dirs — footer pruning is per-file, so every file (base
    # or delta vintage) keeps its tight source bounds.
    #
    # STAGED, not fused: repartitionByRange SAMPLES its child to
    # estimate range boundaries — fused, that re-executed the
    # whole detection pipeline a second time for the sample job.
    # Staging to plain parquet once makes the sampling pass a
    # cheap column-pruned scan, and gives a free exact row count
    # to size the sort partitions with (~2M rows per sort
    # partition keeps each task's sort buffer flat as data
    # grows).
    #
    # A FAT parent's sibling multiset never exists upstream of
    # its write (r9, two-tier): detection stages the O(children)
    # reference types PLUS the small groups' sibling pairs
    # (max_siblings=_SIB_FAT_K caps the staged pair join at ~1M
    # rows per group); hot parents' pairs ship as member-list
    # SLICES (_sibling_chunks — Σk ids instead of Σk² pair rows)
    # and expand to rows INSIDE the final write tasks
    # (_sibling_rows). Measured at sf1 (61x adversarial multiset,
    # 1.06B sibling rows, 97% from 25 hot dimension parents): the
    # r8 design paid ~120s staging the pair rows and ~210s
    # range-shuffling them; the two-tier build stages 59M rows
    # and shuffles slice rows. The published store is unchanged:
    # the fat pairs append into the same reference_type=sibling
    # leaf dir, range-partitioned by the slices' min_source and
    # sorted by source within partitions, so every file keeps the
    # same tight per-row-group source bounds as the other dirs
    # (pinned by test_xref_store_sorted_by_source).
    par = spark.sparkContext.defaultParallelism
    R.detect_all_relationships(
        nodes_in, props_in, max_siblings=_SIB_FAT_K
    ).write.mode("overwrite").parquet(f"{tmp}/xrefs_staged")
    staged = spark.read.parquet(f"{tmp}/xrefs_staged")
    _sibling_chunks(nodes_in).write.mode("overwrite").parquet(
        f"{tmp}/sib_chunks"
    )
    slices = spark.read.parquet(f"{tmp}/sib_chunks")
    n_staged = staged.count()  # parquet footer metadata — free
    fat_row = slices.agg(
        F.sum(F.size("chunk").cast("long") * (F.col("k") - 1)).alias("n"),
        F.sum(F.size("chunk").cast("long")).alias("m"),
    ).collect()[0]
    n_fat = fat_row["n"] or 0
    n_fat_members = fat_row["m"] or 0
    # fail LOUD before the broadcast, not OOM inside it: the
    # target side of _sibling_rows broadcasts Σk member ids
    # across fat groups (~8B + overhead each). The cap is sized
    # to a comfortable driver/executor budget; a corpus beyond
    # it needs a shuffle-join variant of the expansion, not a
    # silent attempt (r9 ADVICE: nothing failed loudly here)
    if n_fat_members > _MAX_FAT_MEMBERS:
        raise ValueError(
            f"sibling store build: {n_fat_members} fat-group member ids "
            f"exceed _MAX_FAT_MEMBERS={_MAX_FAT_MEMBERS} — the pair "
            "expansion's broadcast side would not fit; raise the cap "
            "only with executor memory to match, or partition the "
            "offending parents upstream"
        )
    sort_parts = max(par, -(-n_staged // _SIB_ROWS_PER_SLICE))
    (
        staged.repartitionByRange(
            sort_parts, "reference_type", "source_node_id"
        )
        .sortWithinPartitions("reference_type", "source_node_id")
        .write.mode(mode)
        .partitionBy("reference_type")
        .parquet(f"{tmp}/xrefs")
    )
    if n_fat:
        # fat slices are uniform (~_SIB_ROWS_PER_SLICE pairs), so
        # the range partitioning is balanced by construction; the
        # append lands in the partitioned tree's sibling leaf dir
        # (directory-based partition discovery reads
        # reference_type=sibling from the path, exactly like the
        # dynamic-partition writer's own output)
        sib_parts = max(par, -(-n_fat // _SIB_ROWS_PER_SLICE))
        (
            _sibling_rows(
                slices.repartitionByRange(sib_parts, "min_source"),
                slices,
            )
            .sortWithinPartitions("source_node_id")
            .write.mode("append")
            .parquet(f"{tmp}/xrefs/reference_type=sibling")
        )
    # the EXAMPLE multi-reference adapter's output, cached
    # SEPARATELY from the main store: the store itself keeps
    # exact parity with the reference's default registration
    # (main.rb:104-110 — structural + attribute only), while the
    # opt-in example adapter's detection (a properties⋈nodes join
    # + explode + semi-join, ~6s/query at sf0.1) is paid once per
    # content key instead of on every multi_references call
    (
        R.multi_references(nodes_in, props_in)
        .repartitionByRange(max(2, par // 4), "source_node_id")
        .sortWithinPartitions("source_node_id")
        .write.mode(mode)
        .parquet(f"{tmp}/xrefs_multi")
    )
    # degree-oriented edge set for the triangle gate's graph mix
    # (attribute refs + sibling adjacency), a pure deterministic
    # function of the xref table: persisting it moves the dedup/
    # degree/orientation joins (the bulk of triangle_count's
    # per-query work, and its single-shot JIT variance) into the
    # one-time build — query time starts at the wedge join.
    # Derived from the STAGED frame, not the written store: the
    # two input types never come from the fat sibling tier, so the
    # rows are identical, and the staged source works unchanged in
    # append mode (reading the store back after an append would
    # re-orient BASE edges too). Orientation is by degree WITHIN
    # the input edge set — exact in append mode because every
    # detected reference is within-document, so a delta node's
    # degree in the merged graph equals its delta-local degree.
    from ..operators.graph import orient_edges

    xr_typed = staged.filter(
        F.col("reference_type").isin("attribute_reference", "next_sibling")
    )
    (
        orient_edges(xr_typed)
        .write.mode(mode)
        .parquet(f"{tmp}/tri_oriented")
    )
    # pagerank-ready link graph (r9): the centrality gate's
    # deterministic 30% attribute-reference subsample, deduped,
    # plus its (node, out-degree) spine — both pure deterministic
    # functions of the xref table, persisted so the gate's
    # per-query cost starts at the iteration joins instead of
    # re-paying the scan + subsample + dedup shuffle + spine
    # aggregation every session (measured ~4-7s of graph_
    # pagerank's single-shot time at sf0.1). Same contract as
    # tri_oriented: a store table FOR a specific gate's graph
    # mix, rebuilt with the store. The in-mode dedup stays exact
    # for appends: attribute references resolve within their own
    # document, so base and delta edge sets are disjoint.
    pr_e = (
        staged.filter(F.col("reference_type") == "attribute_reference")
        .filter(
            F.pmod(
                F.xxhash64(
                    F.concat(
                        "source_node_id", F.lit("|"), "target_node_id"
                    )
                ),
                F.lit(_PR_SAMPLE_MOD),
            )
            < _PR_SAMPLE_KEEP
        )
        .select(
            F.col("source_node_id").alias("src"),
            F.col("target_node_id").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
    )
    from ..operators.graph import out_degree_spine

    if mode == "overwrite":
        pr_e.write.mode("overwrite").parquet(f"{tmp}/pr_edges")
        prs = spark.read.parquet(f"{tmp}/pr_edges")
    else:
        # stage the DELTA edges so the spine aggregates only them
        # (the appended pr_edges dir would hand back base + delta)
        pr_e.write.mode("overwrite").parquet(f"{tmp}/pr_edges_delta")
        prs = spark.read.parquet(f"{tmp}/pr_edges_delta")
        prs.write.mode("append").parquet(f"{tmp}/pr_edges")
    # delta spine rows APPEND exactly: spine nodes are pr-edge
    # endpoints = same-document-resolved node ids, disjoint from
    # the base store's ids (append_documents guards enforce it)
    out_degree_spine(prs).write.mode(mode).parquet(f"{tmp}/pr_spine")
    # full-graph degree table (id, out_cnt, in_cnt) — the
    # aggregate most_connected / node_connection_counts otherwise
    # recompute over the full multiset per query (34s at sf1, and
    # the bench's noisiest row at sf0.1: the 1.4M-row count
    # table's broadcast was GC-sensitive, 3-16s run to run). A
    # pure function of the xref table, so it rides the content
    # key like tri_oriented/pr_spine — but computed WITHOUT
    # re-scanning the written multiset: the staged (O(children))
    # rows aggregate directly, and a FAT group's contribution is
    # ANALYTIC — an id with multiplicity c in a k-member group
    # (the driver's tables DO carry duplicate ids) pairs with
    # every non-equal member row, giving out = in = c*(k-c) at
    # the id level; one O(members) aggregate off the slice table
    # (a full-store pass measured ~50s at sf1; this is ~8s).
    staged_deg = (
        staged.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("source_node_id").alias("id"),
                        F.lit(1).cast("long").alias("o"),
                        F.lit(0).cast("long").alias("i"),
                    ),
                    F.struct(
                        F.col("target_node_id").alias("id"),
                        F.lit(0).cast("long").alias("o"),
                        F.lit(1).cast("long").alias("i"),
                    ),
                )
            ).alias("e")
        ).select("e.*")
    )
    fat_cd = F.col("c") * (F.col("k") - F.col("c"))
    fat_deg = (
        slices.select(
            "document_id",
            "parent_id",
            "k",
            F.explode("chunk").alias("id"),
        )
        # chunks cover each member ROW exactly once, so the count
        # is the id's multiplicity c within its (doc, parent)
        # group; ids can repeat under DIFFERENT parents too, so
        # the group key stays in until the final id-level sum
        .groupBy("document_id", "parent_id", "k", "id")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "id",
            fat_cd.cast("long").alias("o"),
            fat_cd.cast("long").alias("i"),
        )
    )
    deg = (
        staged_deg.unionByName(fat_deg)
        .groupBy("id")
        .agg(
            F.sum("o").alias("out_cnt"),
            F.sum("i").alias("in_cnt"),
        )
    )
    if mode == "append":
        # degrees MERGE instead of appending: an id string can carry
        # degree from both sides even across document-disjoint
        # appends — parent_child/child_parent take parent_id
        # VERBATIM (no existence join), so the same dangling parent
        # string in two documents lands degree rows in both builds.
        # One node-domain-sized re-aggregate keeps the one-row-per-id
        # invariant the full build produces. (tmp/degrees is NOT
        # hard-linked by the clone; the merged result writes fresh.)
        deg = (
            spark.read.parquet(f"{base_dir}/degrees")
            .unionByName(deg)
            .groupBy("id")
            .agg(
                F.sum("out_cnt").alias("out_cnt"),
                F.sum("in_cnt").alias("in_cnt"),
            )
        )
    deg.write.mode("overwrite").parquet(f"{tmp}/degrees")
    # distinct xref TARGET set (node-domain-sized) — the dangling-
    # reference family otherwise re-distincts the full multiset per
    # query (a 9.3B-row single-column scan, 136s, at the k=30
    # scale point). Like degrees it is computed WITHOUT scanning
    # the written multiset: staged targets distinct directly, and
    # a fat member is a sibling TARGET iff some non-equal member
    # exists in its group (multiplicity c < k — the same
    # duplicate-id algebra as the analytic degrees; a group whose
    # members are all one id value yields no pairs at all)
    fat_tgt = (
        slices.select(
            "document_id", "parent_id", "k", F.explode("chunk").alias("id")
        )
        .groupBy("document_id", "parent_id", "k", "id")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") < F.col("k"))
        .select(F.col("id").alias("target_node_id"))
    )
    tgt = staged.select("target_node_id").unionByName(fat_tgt)
    if mode == "append":
        # same verbatim-string mixing as degrees (child_parent's
        # target IS the parent_id string): distinct across the
        # union, one node-domain shuffle
        tgt = spark.read.parquet(f"{base_dir}/targets").unionByName(tgt)
    tgt.distinct().write.mode("overwrite").parquet(f"{tmp}/targets")
    # materialized tree levels (id, node_type, level) — the
    # recursive-hierarchy summary re-walked the static tree per
    # query (one broadcast join + checkpoint per level, ~13s at
    # sf1); the level of a node only changes when the tree does,
    # so the walk runs once per build like pr_ranks/degrees. The
    # iterative operator stays the ad-hoc path, value-proven by
    # the gate's unchanged recursive-CTE oracle. A delta-only walk
    # appends exactly because append_documents guards reject any
    # parent link crossing the base/delta boundary in either
    # direction (the walk joins parent ids GLOBALLY).
    from ..operators.hierarchy import node_tree_iterative as _walk

    (
        _walk(nodes_in, max_depth=10, columns=("id", "node_type", "parent_id"))
        .select("id", "node_type", "level")
        .write.mode(mode)
        .parquet(f"{tmp}/node_levels")
    )
    # link-prediction-ready adjacency (r10): the gate's
    # deterministic 50% md5 edge subsample as a distinct
    # undirected pair set (aa_und) plus the (v, degree,
    # sorted-neighbor-list) center table (aa_centers) — both pure
    # deterministic functions of the xref table, persisted so the
    # per-query cost starts at the wedge expansion instead of
    # re-paying the scan + two aggregation shuffles per session.
    # Same contract as pr_edges/tri_oriented; parameter filters
    # (max_degree, d >= 2) stay in the operator, so the tables
    # are parameter-free. Any drift from the operator's own
    # prep would trip the gate's full value oracle. Appends stay
    # exact for both: attribute references are same-document, so
    # delta pairs and delta centers are disjoint from the base's.
    from ..functions.hashing import stable_hash60 as _h60

    _aa_h = _h60(
        F.concat("source_node_id", F.lit("|"), "target_node_id")
    )
    _aa_pairs = (
        staged.filter(F.col("reference_type") == "attribute_reference")
        .filter(_aa_h % 10 < 5)
        .select(
            F.least("source_node_id", "target_node_id").alias("a"),
            F.greatest("source_node_id", "target_node_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    if mode == "overwrite":
        _aa_pairs.write.mode("overwrite").parquet(f"{tmp}/aa_und")
        _aa_und = spark.read.parquet(f"{tmp}/aa_und")
    else:
        _aa_pairs.write.mode("overwrite").parquet(f"{tmp}/aa_und_delta")
        _aa_und = spark.read.parquet(f"{tmp}/aa_und_delta")
        _aa_und.write.mode("append").parquet(f"{tmp}/aa_und")
    (
        _aa_und.select(F.col("a").alias("v"), F.col("b").alias("n"))
        .unionByName(
            _aa_und.select(F.col("b").alias("v"), F.col("a").alias("n"))
        )
        .groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("d"),
            F.sort_array(F.collect_list("n")).alias("ns"),
        )
        .write.mode(mode)
        .parquet(f"{tmp}/aa_centers")
    )
    # document inventory + unresolved-parent inventory (both
    # node-domain-small) — the append path's guards read these
    # instead of re-scanning the node table per append: doc_ids
    # proves delta documents are NEW, dangling_parents catches a
    # delta id that would retroactively resolve an existing
    # dangling parent link (which would change existing
    # node_levels rows — see append_documents)
    nodes_ids = nodes_in.select("id")
    doc_ids = nodes_in.select("document_id").distinct()
    dang = (
        nodes_in.filter(F.col("parent_id").isNotNull())
        .select(F.col("parent_id"))
        .distinct()
        .join(nodes_ids.withColumnRenamed("id", "parent_id"), "parent_id", "left_anti")
    )
    if mode == "append":
        doc_ids = (
            spark.read.parquet(f"{base_dir}/doc_ids")
            .unionByName(doc_ids)
            .distinct()
        )
        # a string dangling in BOTH vintages must not duplicate;
        # cross-boundary resolution is rejected by the guards, so
        # union-distinct equals the full build's global anti-join
        dang = (
            spark.read.parquet(f"{base_dir}/dangling_parents")
            .unionByName(dang)
            .distinct()
        )
    doc_ids.write.mode("overwrite").parquet(f"{tmp}/doc_ids")
    dang.write.mode("overwrite").parquet(f"{tmp}/dangling_parents")
    # the staging copies served the range sampling and the row
    # counts; shipping them in the published entry would bloat
    # the store's disk footprint
    import shutil as _sh

    for scratch in ("xrefs_staged", "sib_chunks", "pr_edges_delta", "aa_und_delta"):
        _sh.rmtree(f"{tmp}/{scratch}", ignore_errors=True)


def _write_rank_tables(
    spark: SparkSession, tmp: str, build_coreness: bool = True
) -> None:
    """The GLOBAL rank artifacts: the pr_stats sidecar and the
    materialized pagerank vector. Separate from _write_store_tables
    because they are the ONE part of the store that is a function of
    the WHOLE graph, not of any single document — the teleport
    uniform 1/n couples every component — so an append re-derives
    them over the MERGED pr_edges/pr_spine (already containing the
    delta's appended files) instead of appending. That recompute is
    O(sampled link graph), the cheap tail of a build whose cost is
    dominated by the sibling multiset (measured in SURVEY §6.4)."""
    # sidecar: node/dangling counts of pr_spine, read back
    # driver-side with NO Spark job — the pagerank gate needs
    # both before its first iteration (teleport + initial
    # dangling mass), and computing them per query cost a
    # setup job + spine scan every session
    spine = spark.read.parquet(f"{tmp}/pr_spine")
    _srow = spine.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("__deg").isNull(), 1)).alias("nd"),
    ).collect()[0]
    with open(f"{tmp}/pr_stats.json", "w") as f:
        json.dump({"n": _srow["n"], "nd": _srow["nd"]}, f)
    # materialized rank vector: pagerank over a STATIC stored
    # graph is a build-time artifact, exactly like degrees — the
    # reference's model is build-the-database-once, query-many.
    # The live power iteration has an irreducible per-query floor
    # (~1 planning pass + 1 job per round; measured 5-9s for 6
    # rounds at sf0.1, ~17s at sf1, regardless of data size),
    # which is the wrong place to pay for a vector that only
    # changes when the graph does. The pagerank OPERATOR stays
    # the ad-hoc path and is value-proven to 1e-7 against a
    # single-process oracle in tests/test_graph.py; this call IS
    # that operator, run once per build.
    from ..operators.graph import pagerank as _pagerank

    _pagerank(
        spark.read.parquet(f"{tmp}/pr_edges"),
        n_iter=6,
        src_col="src",
        dst_col="dst",
        spine=spine,
        edges_deduped=True,
        tol=1e-10,
        spine_stats=(int(_srow["n"]), int(_srow["nd"])),
    ).write.mode("overwrite").parquet(f"{tmp}/pr_ranks")
    # coreness: the SECOND global artifact (r11 VERDICT task 6) —
    # exact k-core of the mixed reference graph (the same tri_oriented
    # edge set the triangle/clustering/assortativity gates read),
    # via operators/graph.kcore_decomposition's H-index fixpoint run
    # ONCE at build time. Like pr_ranks it is a function of the WHOLE
    # graph (peeling couples every node in a component), so an append
    # re-derives it over the merged tri_oriented rather than
    # appending — and unlike pr_ranks the output is a deterministic
    # INTEGER vector, so appended == rebuilt is exact multiset
    # identity (tests/test_store_append.py). Measured convergence on
    # this graph family: 22s/82s/351s at sf0.01/0.1/1, max coreness 4,
    # well inside the default 100-round budget (the operator RAISES
    # loudly on non-convergence rather than publishing a wrong
    # vector; the fixpoint propagates one hop per round, and the
    # mixed graph's sibling chains stabilize locally because chain
    # nodes also carry attribute-reference edges).
    if not build_coreness:
        # opted out (get_graph(build_coreness=False)): the fixpoint
        # is the dominant global build cost at scale and only the
        # graph_kcore query reads its table — see get_graph's
        # docstring for the measured cost ladder
        return
    from ..operators.graph import kcore_decomposition as _kcore

    _kstats: dict = {}
    _kcore(
        None, und=spark.read.parquet(f"{tmp}/tri_oriented"), stats=_kstats
    ).write.mode("overwrite").parquet(f"{tmp}/coreness")
    # persist the round count next to the table: convergence behavior
    # per corpus is the thing to watch as chains lengthen (the
    # operator hard-raises at max_iter; this sidecar is the early
    # signal that a corpus is drifting toward that budget)
    with open(f"{tmp}/kcore_stats.json", "w") as f:
        json.dump({"rounds": _kstats.get("rounds")}, f)


# every parquet table a published store entry holds, in one place:
# the attach path refreshes + re-reads each, and the append path's
# hard-link clone walks this list (minus the merged/global rewrites)
_STORE_SUBDIRS = (
    "nodes",
    "properties",
    "xrefs",
    "xrefs_multi",
    "tri_oriented",
    "pr_edges",
    "pr_spine",
    "pr_ranks",
    "degrees",
    "targets",
    "node_levels",
    "aa_und",
    "aa_centers",
    "coreness",
    "doc_ids",
    "dangling_parents",
)


def _attach_store(
    spark: SparkSession, sf_dir: str, final: str, key: tuple
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bind a published store dir into this session's handle caches
    and return the (nodes, properties, xrefs) triple — shared by
    get_graph (base stores) regardless of whether this process built
    or cold-attached the entry."""
    import os as _os

    # a clear+rebuild lands NEW part files at the SAME path — drop
    # Spark's file-status cache for it or a stale listing would point
    # reads at deleted files (FAILED_READ_FILE)
    for sub in _STORE_SUBDIRS:
        spark.catalog.refreshByPath(f"{final}/{sub}")
    nodes = spark.read.parquet(f"{final}/nodes")
    properties = spark.read.parquet(f"{final}/properties")
    xrefs = spark.read.parquet(f"{final}/xrefs")
    _GRAPH_CACHE[key] = (nodes, properties, xrefs)
    _MULTI_XREF_CACHE[key] = spark.read.parquet(f"{final}/xrefs_multi")
    _TRI_ORIENTED_CACHE[key] = spark.read.parquet(f"{final}/tri_oriented")
    _PR_EDGES_CACHE[key] = spark.read.parquet(f"{final}/pr_edges")
    _PR_SPINE_CACHE[key] = spark.read.parquet(f"{final}/pr_spine")
    _PR_RANKS_CACHE[key] = spark.read.parquet(f"{final}/pr_ranks")
    _DEGREES_CACHE[key] = spark.read.parquet(f"{final}/degrees")
    _TARGETS_CACHE[key] = spark.read.parquet(f"{final}/targets")
    _LEVELS_CACHE[key] = spark.read.parquet(f"{final}/node_levels")
    _AA_UND_CACHE[key] = spark.read.parquet(f"{final}/aa_und")
    _AA_CENTERS_CACHE[key] = spark.read.parquet(f"{final}/aa_centers")
    # absent when the entry was built with build_coreness=False —
    # get_coreness keys on the DEFAULT (full) store, so it never
    # looks this handle up for an opted-out entry
    if _os.path.isdir(f"{final}/coreness"):
        _CORENESS_CACHE[key] = spark.read.parquet(f"{final}/coreness")
    try:
        with open(f"{final}/pr_stats.json") as f:
            _stats = json.load(f)
        _PR_STATS_CACHE[key] = (int(_stats["n"]), int(_stats["nd"]))
    except (OSError, ValueError, KeyError):
        # cold-attached store predating the sidecar: fall back to a
        # one-off spine aggregate (what the pagerank operator would
        # otherwise do per query)
        _srow = (
            _PR_SPINE_CACHE[key]
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("__deg").isNull(), 1)).alias("nd"),
            )
            .collect()[0]
        )
        _PR_STATS_CACHE[key] = (int(_srow["n"]), int(_srow["nd"]))
    return _GRAPH_CACHE[key]



def get_multi_xrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cached example multi-reference adapter output (same
    content key and lifecycle as get_graph's store — built in the
    same _build)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _MULTI_XREF_CACHE:
        get_graph(spark, sf_dir)
    return _MULTI_XREF_CACHE[key]


def get_tri_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The degree-oriented (u, w) edge set of the triangle gate's
    graph mix, persisted in the store (same content key and
    lifecycle as get_graph — built in the same _build)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TRI_ORIENTED_CACHE:
        get_graph(spark, sf_dir)
    return _TRI_ORIENTED_CACHE[key]


def get_pr_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pagerank gate's deduped (src, dst) link-graph subsample,
    persisted in the store (same content key and lifecycle as
    get_graph — built in the same _build)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_EDGES_CACHE:
        get_graph(spark, sf_dir)
    return _PR_EDGES_CACHE[key]


def get_pr_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (node, out-degree) spine of pr_edges (out-degree NULL =
    dangling node), persisted in the store."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_SPINE_CACHE:
        get_graph(spark, sf_dir)
    return _PR_SPINE_CACHE[key]


def get_pr_stats(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(node count, dangling count) of pr_spine, from the store's
    build-time sidecar — no Spark job. Feeds pagerank's
    ``spine_stats`` so an ad-hoc run starts at the first iteration
    join instead of paying a setup aggregate over the spine."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_STATS_CACHE:
        get_graph(spark, sf_dir)
    return _PR_STATS_CACHE[key]


def get_aa_und(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link-prediction gate's distinct undirected pair set
    (50% md5 subsample of attribute references), persisted in the
    store."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _AA_UND_CACHE:
        get_graph(spark, sf_dir)
    return _AA_UND_CACHE[key]


def get_aa_centers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The link-prediction gate's (v, degree, sorted neighbors)
    center table over aa_und, persisted in the store (parameter-free:
    degree filters apply in the operator)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _AA_CENTERS_CACHE:
        get_graph(spark, sf_dir)
    return _AA_CENTERS_CACHE[key]


def get_xref_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store's distinct xref target-id set (one string column,
    node-domain-sized), built without scanning the written multiset —
    see the build comment. Feeds the dangling-reference family."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _TARGETS_CACHE:
        get_graph(spark, sf_dir)
    return _TARGETS_CACHE[key]


def get_node_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store's materialized tree levels (id, node_type, level),
    walked once per build by hierarchy.node_tree_iterative
    (max_depth=10 — the reference queries' bound)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _LEVELS_CACHE:
        get_graph(spark, sf_dir)
    return _LEVELS_CACHE[key]


def get_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store's materialized (node_id, coreness) exact k-core
    vector over the mixed reference graph (tri_oriented) — the
    H-index fixpoint run once at build time (same content key and
    lifecycle as get_graph; re-derived globally on appends like
    pr_ranks, but integer-exact)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CORENESS_CACHE:
        get_graph(spark, sf_dir)
    return _CORENESS_CACHE[key]


def get_pr_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The store's materialized (node, rank) PageRank vector over
    pr_edges — 6 damping-0.85 rounds of operators/graph.py pagerank
    run ONCE at build time (same content key and lifecycle as
    get_graph). The rank vector is a pure function of the static
    link graph, so like ``degrees`` it lives in the store rather
    than being re-iterated per query."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PR_RANKS_CACHE:
        get_graph(spark, sf_dir)
    return _PR_RANKS_CACHE[key]


def get_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full-graph (id, out_cnt, in_cnt) degree table, persisted
    in the store (one build-time pass over the xref multiset; nodes
    with no references are absent — consumers left-join + coalesce)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _DEGREES_CACHE:
        get_graph(spark, sf_dir)
    return _DEGREES_CACHE[key]


def clear_graph_cache() -> None:
    """Drop the in-session handles AND the on-disk entries THIS
    session BUILT (tests use this to force a rebuild). Attached-only
    entries are left alone: they are other sessions' shared property,
    and deleting them would bypass the pruning path's grace window."""
    import shutil

    _GRAPH_CACHE.clear()
    _MULTI_XREF_CACHE.clear()
    _TRI_ORIENTED_CACHE.clear()
    _PR_EDGES_CACHE.clear()
    _PR_SPINE_CACHE.clear()
    _PR_STATS_CACHE.clear()
    _PR_RANKS_CACHE.clear()
    _DEGREES_CACHE.clear()
    _TARGETS_CACHE.clear()
    _LEVELS_CACHE.clear()
    _AA_UND_CACHE.clear()
    _AA_CENTERS_CACHE.clear()
    while _GRAPH_CACHE_DIRS:
        shutil.rmtree(_GRAPH_CACHE_DIRS.pop(), ignore_errors=True)


# ---------------------------------------------------------------------------
# Incremental store maintenance (r11): append NEW documents to a built
# store without re-paying the full build.
#
# The exactness argument rests on ONE fact the streaming SQLite path
# already exploits (streaming/ingest.py: batch-local maintenance is
# exact): every reference type the default detector emits is
# WITHIN-document — structural types group on (document_id, parent_id)
# and attribute references only resolve to a node in the SAME document.
# So a new document's xrefs, degrees-contribution, tree levels, and
# adjacency rows are computable from the delta alone, and at 100 TB an
# append is a metadata-plus-delta transaction (hard-link the unchanged
# multiset files, write O(delta) new ones — the same shape as an
# Iceberg/Delta snapshot append) instead of a full rebuild. The ONE
# whole-graph artifact is the rank vector (teleport couples every
# component through 1/n), which re-derives over the merged sampled link
# graph — the cheap tail of a build dominated by the sibling multiset.
# ---------------------------------------------------------------------------

# tables whose delta rows APPEND (hard-linked from the base, delta
# files land alongside); degrees/targets/doc_ids/dangling_parents
# MERGE-rewrite (verbatim parent_id strings can carry contributions
# from both vintages), pr_ranks + pr_stats.json re-derive globally
_APPEND_LINKED_SUBDIRS = (
    "nodes",
    "properties",
    "xrefs",
    "xrefs_multi",
    "tri_oriented",
    "pr_edges",
    "pr_spine",
    "node_levels",
    "aa_und",
    "aa_centers",
)


def _link_store_tree(base_dir: str, tmp: str) -> None:
    """Mirror the base store's appendable tables into ``tmp`` as hard
    links (the shared cache_util.link_tree clone step — one copy of
    the hard-link subtleties, also used by the MinHash / components
    store append paths)."""
    from ..cache_util import link_tree

    link_tree(base_dir, tmp, _APPEND_LINKED_SUBDIRS, what="store")


def _append_guards(spark: SparkSession, base_dir: str, dn: DataFrame) -> None:
    """Fail LOUD before any append work when the delta would break the
    within-document locality the incremental tables rely on:

    1. delta document_ids must be NEW (an existing document's content
       changing is an update, not an append — rebuild);
    2. delta node ids must not collide with existing ids (degrees,
       node_levels, aa_centers and every id-keyed consumer assume one
       owner per id);
    3. a delta parent_id must not resolve to an EXISTING node — the
       node_levels walk joins parent ids globally, so such a link
       would give the full build a level the delta-only walk can't
       see;
    4. a delta id must not retroactively resolve an existing DANGLING
       parent link (the mirror image of 3: base node_levels rows
       would change).
    """
    base_docs = spark.read.parquet(f"{base_dir}/doc_ids")
    doc_hits = [
        r["document_id"]
        for r in dn.select("document_id")
        .distinct()
        .join(base_docs, "document_id")
        .limit(3)
        .collect()
    ]
    if doc_hits:
        raise ValueError(
            f"append_documents: document_ids {doc_hits} already exist in "
            "the base store — appends must carry NEW documents; changed "
            "documents need a rebuild"
        )
    d_ids = dn.select("id").distinct()
    d_par = (
        dn.filter(F.col("parent_id").isNotNull())
        .select(F.col("parent_id").alias("id"))
        .distinct()
        .join(d_ids, "id", "left_anti")
    )
    probe = d_ids.select(
        "id", F.lit("delta node id collides with an existing node id").alias("why")
    ).unionByName(
        d_par.select(
            "id",
            F.lit(
                "delta parent_id resolves to an existing node — the delta "
                "document is not self-contained"
            ).alias("why"),
        )
    )
    base_ids = spark.read.parquet(f"{base_dir}/nodes").select("id")
    hits = (
        probe.join(base_ids, "id")
        .groupBy("why")
        .agg(F.count(F.lit(1)).alias("n"), F.min("id").alias("example"))
        .collect()
    )
    if hits:
        raise ValueError(
            "append_documents: "
            + "; ".join(f"{r['why']} ({r['n']} ids, e.g. {r['example']})" for r in hits)
        )
    dang = spark.read.parquet(f"{base_dir}/dangling_parents").withColumnRenamed(
        "parent_id", "id"
    )
    dang_hits = [r["id"] for r in d_ids.join(dang, "id").limit(3).collect()]
    if dang_hits:
        raise ValueError(
            f"append_documents: delta node ids {dang_hits} would resolve "
            "existing dangling parent links — existing node_levels rows "
            "would change; rebuild instead"
        )


def append_documents(
    spark: SparkSession,
    sf_dir: str,
    delta_nodes: DataFrame,
    delta_properties: DataFrame,
    delta_key: str,
    check_guards: bool = True,
    build_coreness: bool = True,
    base_append: str = "",
) -> dict:
    """Publish a NEW store entry = the base store for ``sf_dir`` plus
    the delta documents, at O(delta) cost (plus the global rank-vector
    re-derivation — see _write_rank_tables; ``build_coreness=False``
    appends onto the coreness-less base configuration and skips the
    k-core fixpoint re-derivation, the dominant global append cost).

    ``delta_key`` is the caller's identity for the delta content (fold
    in input paths/mtimes and any synthesizer code) — it keys the
    published entry, so the same (base, delta) pair cold-attaches on
    later calls exactly like get_graph's own entries, and the entry
    invalidates whenever the base inputs, the build code, or the delta
    identity change. The base entry itself is never touched: the clone
    is hard links, and a failed append leaves only its tmp dir (the
    shared cache_util publish machinery removes it).

    ``base_append`` CHAINS waves (the append_dedup_documents
    contract): wave b appends onto the entry published for chain
    ``base_append`` instead of the base store, so a maintenance
    stream pays O(wave) per wave. The chained base carries merged
    doc_ids/dangling_parents, so the locality guards hold across the
    whole chain.

    Returns ``{"path": <dir>, "append_key": <chain>, <table>:
    DataFrame, ...}`` for every store table. Gate queries keep
    reading the sf_dir-keyed BASE store through get_graph; appended
    stores are a pipeline capability with their own identity
    (tests/test_store_append.py pins the appended tables to a full
    rebuild over the unioned input, multiset-exact).
    """
    import os

    from ..cache_util import content_cached_dir

    if base_append:
        base_ck = _graph_append_key(
            sf_dir, base_append, build_coreness=build_coreness
        )
        if not os.path.exists(
            os.path.join(_graph_cache_root(), base_ck, "_COMPLETE")
        ):
            raise ValueError(
                f"append_documents: chained base entry (append chain "
                f"{base_append!r}) is not published — appends must stack "
                "onto an existing entry in order"
            )
        chain = f"{base_append}+{delta_key}"
    else:
        # ensure the base entry (of the matching configuration) exists
        get_graph(spark, sf_dir, build_coreness=build_coreness)
        base_ck = _graph_cache_key(sf_dir, build_coreness=build_coreness)
        chain = delta_key
    base_dir = os.path.join(_graph_cache_root(), base_ck)
    ck = _graph_append_key(sf_dir, chain, build_coreness=build_coreness)

    def _build(tmp: str) -> None:
        import shutil as _sh

        _link_store_tree(base_dir, tmp)
        # materialize the delta frames once — detection, the walk,
        # and the appends all re-read them
        delta_nodes.write.mode("overwrite").parquet(f"{tmp}/delta_nodes")
        delta_properties.write.mode("overwrite").parquet(f"{tmp}/delta_properties")
        dn = spark.read.parquet(f"{tmp}/delta_nodes")
        dp = spark.read.parquet(f"{tmp}/delta_properties")
        if check_guards:
            _append_guards(spark, base_dir, dn)
        dn.write.mode("append").parquet(f"{tmp}/nodes")
        dp.write.mode("append").parquet(f"{tmp}/properties")
        _write_store_tables(spark, tmp, dn, dp, mode="append", base_dir=base_dir)
        _write_rank_tables(spark, tmp, build_coreness=build_coreness)
        with open(f"{tmp}/manifest.json", "w") as f:
            json.dump(
                {
                    "kind": "append",
                    "base_key": base_ck,
                    "delta_key": delta_key,
                    "append_key": chain,
                },
                f,
            )
        for scratch in ("delta_nodes", "delta_properties"):
            _sh.rmtree(f"{tmp}/{scratch}", ignore_errors=True)
        with open(f"{tmp}/_COMPLETE", "w") as f:
            f.write(ck)

    final = content_cached_dir(
        _graph_cache_root(), ck, _build, owned_dirs=_GRAPH_CACHE_DIRS
    )
    out: dict = {"path": final, "append_key": chain}
    for sub in _STORE_SUBDIRS:
        if sub == "coreness" and not build_coreness:
            continue
        spark.catalog.refreshByPath(f"{final}/{sub}")
        out[sub] = spark.read.parquet(f"{final}/{sub}")
    return out


def synthesize_delta_document(
    spark: SparkSession, src_dir: str, tag: str = "dx"
) -> tuple[DataFrame, DataFrame]:
    """A self-contained NEW document (nodes, properties) shaped like
    the TPC-H graph of ``src_dir`` — the append harness's delta
    generator (tests + scripts/measure_append.py). Every node id,
    parent_id, and reference-valued property token gains the ``tag_``
    prefix and the document_id becomes ``tpch_<tag>``, so the delta is
    id-disjoint from any base built over un-prefixed ids and resolves
    every internal link within itself (the append_documents contract).
    """
    pre = F.lit(f"{tag}_")
    nodes = build_nodes(spark, src_dir).select(
        F.concat(pre, "id").alias("id"),
        "node_type",
        F.lit(f"tpch_{tag}").alias("document_id"),
        F.when(
            F.col("parent_id").isNotNull(), F.concat(pre, F.col("parent_id"))
        ).alias("parent_id"),
        "position",
        "content",
        F.concat(F.lit(f"/{tag}"), "xpath").alias("xpath"),
    )
    # prefix every table-id token inside reference-valued property
    # strings (single refs AND the space-separated lineitem_refs
    # lists) so attribute/multi detection resolves within the delta;
    # non-reference values contain no `<table>_` token and pass
    # through untouched, keeping their inferred data_type valid
    ref_pat = r"(^|[ ,])((region|nation|customer|supplier|part|order|lineitem)_)"
    properties = build_properties(spark, src_dir).select(
        F.concat(pre, "node_id").alias("node_id"),
        "property_name",
        F.regexp_replace(F.col("property_value"), ref_pat, f"$1{tag}_$2").alias(
            "property_value"
        ),
        "data_type",
    )
    return nodes, properties


def build_xrefs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cross_references via the production detection operators."""
    _, _, xrefs = get_graph(spark, sf_dir)
    return xrefs


# ---------------------------------------------------------------------------
# The reference query surface (README + examples/sql_queries.md),
# each over the constructed graph, each with an exact oracle.
# ---------------------------------------------------------------------------


def nodes_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README: SELECT * FROM nodes WHERE node_type = 'order'."""
    nodes, _, _ = get_graph(spark, sf_dir)
    return nodes.filter(F.col("node_type") == "order")


NODES_BY_TYPE_ORACLE = GRAPH_PREFIX + "SELECT * FROM nodes WHERE node_type = 'order'"


def attribute_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README: nodes with property mktsegment = BUILDING."""
    nodes, properties, _ = get_graph(spark, sf_dir)
    props = properties.filter(
        (F.col("property_name") == "mktsegment") & (F.col("property_value") == "BUILDING")
    )
    return nodes.join(
        props.select(F.col("node_id").alias("id"), "property_value"), "id"
    ).select("id", "node_type", "content", "property_value")


ATTRIBUTE_SEARCH_ORACLE = GRAPH_PREFIX + """
SELECT n.id, n.node_type, n.content, np.property_value
FROM nodes n JOIN node_properties np ON n.id = np.node_id
WHERE np.property_name = 'mktsegment' AND np.property_value = 'BUILDING'
"""


def multi_attribute_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """test_sql_operations.rb:82-96 generalized to the intersection of
    TWO property predicates — nodes whose properties satisfy both
    (brand = 'Brand#23' AND size = '7'). Two semi-joins against the
    property table; each predicate prunes before the next."""
    nodes, properties, _ = get_graph(spark, sf_dir)
    p1 = properties.filter(
        (F.col("property_name") == "brand") & (F.col("property_value") == "Brand#23")
    ).select(F.col("node_id").alias("id"))
    p2 = properties.filter(
        (F.col("property_name") == "size") & (F.col("property_value") == "7")
    ).select(F.col("node_id").alias("id"))
    return (
        nodes.join(p1, "id", "left_semi")
        .join(p2, "id", "left_semi")
        .select("id", "node_type", "content")
        .orderBy("id")
    )


MULTI_ATTRIBUTE_SEARCH_ORACLE = GRAPH_PREFIX + """
SELECT n.id, n.node_type, n.content
FROM nodes n
JOIN node_properties p1 ON n.id = p1.node_id
 AND p1.property_name = 'brand' AND p1.property_value = 'Brand#23'
JOIN node_properties p2 ON n.id = p2.node_id
 AND p2.property_name = 'size' AND p2.property_value = '7'
ORDER BY n.id
"""


def xpath_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """test_sql_operations.rb:199-215: nodes by xpath LIKE pattern."""
    nodes, _, _ = get_graph(spark, sf_dir)
    return (
        nodes.filter(F.col("xpath").like("%supplier%"))
        .select("id", "node_type", "xpath")
        .orderBy("id")
    )


XPATH_SEARCH_ORACLE = GRAPH_PREFIX + """
SELECT id, node_type, xpath FROM nodes WHERE xpath LIKE '%supplier%' ORDER BY id
"""


def content_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README content LIKE search (over the documents corpus table,
    which carries real text)."""
    docs = load(spark, sf_dir, "documents")
    return docs.filter(F.col("text").contains("spark")).select("doc_id", "lang", "source")


CONTENT_SEARCH_ORACLE = "SELECT doc_id, lang, source FROM documents WHERE text LIKE '%spark%'"


def type_inference_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of inferred property data types."""
    _, properties, _ = get_graph(spark, sf_dir)
    return (
        properties
        .groupBy("data_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("data_type")
    )


TYPE_INFERENCE_ORACLE = GRAPH_PREFIX + """
SELECT data_type, count(*) AS n FROM node_properties GROUP BY data_type ORDER BY data_type
"""


def document_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """main.rb:118-135 print_stats: one-row corpus summary."""
    nodes, _, xrefs = get_graph(spark, sf_dir)
    stats = nodes.agg(
        F.count(F.lit(1)).alias("total_nodes"),
        F.countDistinct("node_type").alias("node_types"),
        F.countDistinct("document_id").alias("documents"),
    )
    return stats.crossJoin(xrefs.agg(F.count(F.lit(1)).alias("cross_refs")))


DOCUMENT_STATS_ORACLE = GRAPH_PREFIX + """
SELECT (SELECT count(*) FROM nodes) AS total_nodes,
       (SELECT count(DISTINCT node_type) FROM nodes) AS node_types,
       (SELECT count(DISTINCT document_id) FROM nodes) AS documents,
       (SELECT count(*) FROM cross_references) AS cross_refs
"""


def hierarchy_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """README recursive node_tree, summarized per level/type (the
    full per-node tree is exercised rows-wise in ancestors/
    descendants; the summary keeps the gate's result compact)."""
    # the tree is static, so its levels are a store artifact
    # (node_levels — hierarchy.node_tree_iterative run once per
    # build, same reasoning as degrees/pr_ranks): the summary is a
    # model-sized aggregate over the persisted walk instead of a
    # per-query 10-level frontier-join loop (13.3s at sf1, 32.7s at
    # the k=30 point; now ~1s). The iterative operator remains the
    # ad-hoc path (measured 6-7s vs 7-11s for the recursive-CTE form
    # at sf0.1 — UnionLoop re-scans its anchor per level), and this
    # gate stays value-proven by the unchanged recursive-CTE oracle.
    return (
        get_node_levels(spark, sf_dir)
        .groupBy("level", "node_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("level", "node_type")
    )


HIERARCHY_LEVELS_ORACLE = GRAPH_PREFIX + """
, node_tree AS (
  SELECT id, node_type, parent_id, content, 0 AS level FROM nodes WHERE parent_id IS NULL
  UNION ALL
  SELECT n.id, n.node_type, n.parent_id, n.content, nt.level + 1
  FROM nodes n JOIN node_tree nt ON n.parent_id = nt.id
  WHERE nt.level < 10
)
SELECT level, node_type, count(*) AS n FROM node_tree GROUP BY level, node_type
ORDER BY level, node_type
"""


def ancestors_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md ancestors CTE for one node."""
    _, _, xrefs = get_graph(spark, sf_dir)
    return H.ancestors(spark, xrefs, "order_7", max_depth=10)


ANCESTORS_ORACLE = GRAPH_PREFIX + """
, anc AS (
  SELECT target_node_id AS descendant_id, source_node_id AS ancestor_id,
         1 AS depth, source_node_id AS path
  FROM cross_references
  WHERE target_node_id = 'order_7' AND reference_type = 'parent_child'
  UNION ALL
  SELECT a.descendant_id, cr.source_node_id, a.depth + 1,
         cr.source_node_id || ' -> ' || a.path
  FROM anc a JOIN cross_references cr
    ON a.ancestor_id = cr.target_node_id AND cr.reference_type = 'parent_child'
  WHERE a.depth < 10
)
SELECT ancestor_id, depth, path FROM anc
"""


def descendants_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md descendants CTE for one node (depth
    bounded at 2: customers and their orders under nation_5)."""
    _, _, xrefs = get_graph(spark, sf_dir)
    return H.descendants(spark, xrefs, "nation_5", max_depth=2)


DESCENDANTS_ORACLE = GRAPH_PREFIX + """
, des AS (
  SELECT source_node_id AS ancestor_id, target_node_id AS descendant_id,
         1 AS depth, target_node_id AS path
  FROM cross_references
  WHERE source_node_id = 'nation_5' AND reference_type = 'parent_child'
  UNION ALL
  SELECT d.ancestor_id, cr.target_node_id, d.depth + 1,
         d.path || ' -> ' || cr.target_node_id
  FROM des d JOIN cross_references cr
    ON d.descendant_id = cr.source_node_id AND cr.reference_type = 'parent_child'
  WHERE d.depth < 2
)
SELECT descendant_id, depth, path FROM des
"""


def relationship_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'Relationship summary by type'."""
    _, _, xrefs = get_graph(spark, sf_dir)
    return (
        xrefs.groupBy("reference_type")
        .agg(
            F.count(F.lit(1)).alias("total_count"),
            F.round(F.avg("confidence"), 6).alias("avg_confidence"),
            F.round(F.min("confidence"), 6).alias("min_confidence"),
            F.round(F.max("confidence"), 6).alias("max_confidence"),
            F.countDistinct("source_node_id").alias("unique_sources"),
            F.countDistinct("target_node_id").alias("unique_targets"),
        )
        .orderBy(F.desc("total_count"), "reference_type")
    )


RELATIONSHIP_SUMMARY_ORACLE = GRAPH_PREFIX + """
SELECT reference_type, count(*) AS total_count,
       round(avg(confidence), 6) AS avg_confidence,
       round(min(confidence), 6) AS min_confidence,
       round(max(confidence), 6) AS max_confidence,
       count(DISTINCT source_node_id) AS unique_sources,
       count(DISTINCT target_node_id) AS unique_targets
FROM cross_references
GROUP BY reference_type
ORDER BY total_count DESC, reference_type
"""


def node_connection_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'Node relationship counts' (restricted
    to customer nodes to keep the gate's result bounded; the pattern
    is identical for all types)."""
    all_nodes, _, _ = get_graph(spark, sf_dir)
    nodes = all_nodes.filter(F.col("node_type") == "customer")
    # the per-node counts come from the store's persisted degree
    # table (one build-time pass over the multiset) — the query is a
    # node-domain-sized join, never a 1.1B-row re-aggregation
    deg = get_degrees(spark, sf_dir)
    return (
        nodes.select("id", "node_type")
        .join(deg, "id", "left")
        .select(
            "id",
            "node_type",
            F.coalesce("out_cnt", F.lit(0)).alias("outgoing_relationships"),
            F.coalesce("in_cnt", F.lit(0)).alias("incoming_relationships"),
            (
                F.coalesce("out_cnt", F.lit(0))
                + F.coalesce("in_cnt", F.lit(0))
            ).alias("total_relationships"),
        )
    )


NODE_CONNECTION_COUNTS_ORACLE = GRAPH_PREFIX + """
SELECT n.id, n.node_type,
       COALESCE(o.cnt, 0) AS outgoing_relationships,
       COALESCE(i.cnt, 0) AS incoming_relationships,
       COALESCE(o.cnt, 0) + COALESCE(i.cnt, 0) AS total_relationships
FROM nodes n
LEFT JOIN (SELECT source_node_id, count(*) AS cnt FROM cross_references GROUP BY 1) o
  ON n.id = o.source_node_id
LEFT JOIN (SELECT target_node_id, count(*) AS cnt FROM cross_references GROUP BY 1) i
  ON n.id = i.target_node_id
WHERE n.node_type = 'customer'
"""


def most_connected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'Most connected nodes' top-10."""
    nodes, _, _ = get_graph(spark, sf_dir)
    # connection_count = out + in from the store's persisted degree
    # table: the query is a TakeOrdered over the node-domain-sized
    # table instead of re-aggregating the full multiset per call
    # (34s at sf1; at sf0.1 the old count-table broadcast was the
    # bench's noisiest row, 3-16s run to run).
    touches = get_degrees(spark, sf_dir).select(
        "id", (F.col("out_cnt") + F.col("in_cnt")).alias("connection_count")
    )
    # cut to top-10 BEFORE the node join: every xref endpoint resolves
    # in nodes by detector construction (structural endpoints ARE
    # nodes; attribute references require the target to exist), so
    # the pre-limit is exactly the post-join limit — and the join
    # becomes a 10-row broadcast.
    top = touches.orderBy(F.desc("connection_count"), "id").limit(10)
    return (
        nodes.join(F.broadcast(top), "id")
        .select("id", "node_type", "connection_count")
        .orderBy(F.desc("connection_count"), "id")
    )


MOST_CONNECTED_ORACLE = GRAPH_PREFIX + """
SELECT n.id, n.node_type, t.connection_count
FROM nodes n
JOIN (
  SELECT id, count(*) AS connection_count FROM (
    SELECT source_node_id AS id FROM cross_references
    UNION ALL
    SELECT target_node_id FROM cross_references
  ) GROUP BY id
) t ON n.id = t.id
ORDER BY t.connection_count DESC, n.id
LIMIT 10
"""


def bidirectional_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'Bidirectional relationships', over
    the bounded nation-sibling subgraph."""
    _, _, all_xrefs = get_graph(spark, sf_dir)
    xrefs = all_xrefs.filter(
        (F.col("reference_type") == "sibling")
        & F.col("source_node_id").startswith("nation_")
    )
    a = xrefs.alias("a")
    b = xrefs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.source_node_id") == F.col("b.target_node_id"))
            & (F.col("a.target_node_id") == F.col("b.source_node_id"))
            & (F.col("a.reference_type") == F.col("b.reference_type")),
        )
        .select(
            F.col("a.source_node_id").alias("node1_id"),
            F.col("a.target_node_id").alias("node2_id"),
            F.col("a.reference_type").alias("reference_type"),
        )
        .orderBy("node1_id", "node2_id")
    )


BIDIRECTIONAL_ORACLE = GRAPH_PREFIX + """
SELECT cr1.source_node_id AS node1_id, cr1.target_node_id AS node2_id,
       cr1.reference_type
FROM cross_references cr1
JOIN cross_references cr2
  ON cr1.source_node_id = cr2.target_node_id
 AND cr1.target_node_id = cr2.source_node_id
 AND cr1.reference_type = cr2.reference_type
WHERE cr1.reference_type = 'sibling' AND cr1.source_node_id LIKE 'nation\\_%' ESCAPE '\\'
ORDER BY node1_id, node2_id
"""


def broken_references(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'Find broken references': detect refs
    against the full graph, then delete the supplier nodes — refs
    pointing at them are now dangling."""
    nodes, _, _ = get_graph(spark, sf_dir)
    surviving = nodes.filter(F.col("node_type") != "supplier")
    # the distinct target SET is a pure function of the static xref
    # table, so it is a store artifact (targets — built without ever
    # scanning the written multiset): the query is a node-sized
    # anti-join instead of a per-query single-column scan + distinct
    # of the full multiset (21.8s at sf1, 136s at the k=30 point —
    # scan-bound even behind the r8 plan barrier; now ~2s/4s). The
    # what-if part (which node type is deleted) stays per-query.
    return (
        get_xref_targets(spark, sf_dir)
        .join(
            surviving.select(F.col("id").alias("target_node_id")),
            "target_node_id",
            "left_anti",
        )
        .orderBy("target_node_id")
    )


BROKEN_REFERENCES_ORACLE = GRAPH_PREFIX + """
SELECT DISTINCT cr.target_node_id
FROM cross_references cr
LEFT JOIN (SELECT id FROM nodes WHERE node_type <> 'supplier') n
  ON cr.target_node_id = n.id
WHERE n.id IS NULL
ORDER BY cr.target_node_id
"""


def node_references(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/sql_queries.md 'All relationships (bidirectional)'
    for one node: direction-tagged neighbor list."""
    _, _, xrefs = get_graph(spark, sf_dir)
    node = "customer_7"
    # UNION of two point filters, not one OR across two columns: an
    # OR disjunction spanning source and target defeats row-group
    # pruning entirely (no single column's min/max can reject a
    # group), so r5 full-scanned the whole multiset per call. The
    # outgoing branch prunes via the store's source-sorted layout
    # (get_graph's range-partitioned write); the incoming branch is a
    # single pushed-down equality over a column-pruned scan. The
    # source != node guard on the incoming side keeps self-loop rows
    # (if a detector ever emitted one) from appearing twice, exactly
    # matching the OR formulation's one-row-per-xref semantics.
    out = xrefs.filter(F.col("source_node_id") == node).select(
        F.col("target_node_id").alias("related_node"),
        "reference_type",
        F.lit("outgoing").alias("direction"),
        F.round("confidence", 6).alias("confidence"),
    )
    inc = xrefs.filter(
        (F.col("target_node_id") == node) & (F.col("source_node_id") != node)
    ).select(
        F.col("source_node_id").alias("related_node"),
        "reference_type",
        F.lit("incoming").alias("direction"),
        F.round("confidence", 6).alias("confidence"),
    )
    return out.unionByName(inc).orderBy(
        "related_node", "reference_type", "direction"
    )


NODE_REFERENCES_ORACLE = GRAPH_PREFIX + """
SELECT CASE WHEN source_node_id = 'customer_7' THEN target_node_id ELSE source_node_id END AS related_node,
       reference_type,
       CASE WHEN source_node_id = 'customer_7' THEN 'outgoing' ELSE 'incoming' END AS direction,
       round(confidence, 6) AS confidence
FROM cross_references
WHERE source_node_id = 'customer_7' OR target_node_id = 'customer_7'
ORDER BY related_node, reference_type, direction
"""


def attribute_references_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribute-reference detector's own output (bounded to one
    attribute for the gate): who references supplier_3 and how
    confidently (examples/sql_queries.md 'Find all nodes that
    reference a specific node')."""
    _, _, xrefs = get_graph(spark, sf_dir)
    refs = xrefs.filter(F.col("reference_type") == "attribute_reference")
    return (
        refs.filter(F.col("target_node_id") == "supplier_3")
        .select(
            "source_node_id",
            "attribute_name",
            F.round("confidence", 6).alias("confidence"),
        )
        .orderBy("source_node_id", "attribute_name")
    )


ATTRIBUTE_REFERENCES_ORACLE = GRAPH_PREFIX + """
SELECT source_node_id, attribute_name, round(confidence, 6) AS confidence
FROM cross_references
WHERE reference_type = 'attribute_reference' AND target_node_id = 'supplier_3'
ORDER BY source_node_id, attribute_name
"""


def multi_references_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-reference adapter output over the lineitem_refs
    properties (examples/.../multi_reference_adapter.rb semantics).
    Reads the content-keyed xrefs_multi store (the adapter's
    detection join runs once per content key at build time — the
    operator itself is R.multi_references, exercised directly in
    tests/test_relationships.py)."""
    return (
        get_multi_xrefs(spark, sf_dir)
        .select(
            "source_node_id",
            "target_node_id",
            "attribute_name",
            F.round("confidence", 6).alias("confidence"),
        )
        .orderBy("source_node_id", "target_node_id")
    )


MULTI_REFERENCES_ORACLE = GRAPH_PREFIX + r"""
SELECT np.node_id AS source_node_id, r.ref AS target_node_id,
       np.property_name AS attribute_name,
       round(least(CAST(1.0 AS DOUBLE), CAST(0.6 AS DOUBLE)
         + CASE WHEN lower(np.property_name) LIKE '%ids%'
                  OR lower(np.property_name) LIKE '%refs%'
                  OR lower(np.property_name) LIKE '%targets%'
                  OR lower(np.property_name) LIKE '%sources%'
                  OR lower(np.property_name) LIKE '%links%'
                THEN CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
         + CASE WHEN regexp_matches(r.ref, '^[a-zA-Z]+_[a-zA-Z0-9]+$')
                THEN CAST(0.1 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END) * CAST(0.8 AS DOUBLE), 6) AS confidence
FROM node_properties np
JOIN nodes n ON np.node_id = n.id,
UNNEST(string_split_regex(np.property_value, '[,\s]+')) AS r(ref)
WHERE regexp_matches(np.property_value, '[,\s]')
  AND r.ref <> ''
  AND (regexp_matches(r.ref, '^[a-zA-Z_][a-zA-Z0-9_]*$')
       OR regexp_matches(r.ref, '^[a-zA-Z0-9]+(-[a-zA-Z0-9]+)*$'))
  AND EXISTS (SELECT 1 FROM nodes t
              WHERE t.document_id = n.document_id AND t.id = r.ref)
ORDER BY source_node_id, target_node_id
"""


def same_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic adapter same_type pairs over the bounded
    region/nation subgraph (semantic_adapter.rb:30-50)."""
    nodes, _, _ = get_graph(spark, sf_dir)
    bounded = nodes.filter(F.col("node_type").isin("region", "nation"))
    return (
        R.same_type_relationships(bounded)
        .select("source_node_id", "target_node_id", "reference_type", "confidence")
        .orderBy("source_node_id", "target_node_id")
    )


SAME_TYPE_ORACLE = GRAPH_PREFIX + """
SELECT a.id AS source_node_id, b.id AS target_node_id,
       'same_type' AS reference_type, CAST(0.6 AS DOUBLE) AS confidence
FROM nodes a JOIN nodes b
  ON a.document_id = b.document_id AND a.node_type = b.node_type AND a.id <> b.id
WHERE a.node_type IN ('region', 'nation')
  AND a.content IS NOT NULL
  AND b.content IS NOT NULL
ORDER BY source_node_id, target_node_id
"""


def sibling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural sibling pairs, bounded to supplier nodes
    (structural_adapter.rb:43-76)."""
    _, _, xrefs = get_graph(spark, sf_dir)
    return (
        xrefs.filter(
            (F.col("reference_type") == "sibling")
            & F.col("source_node_id").startswith("supplier_")
        )
        .select("source_node_id", "target_node_id", "reference_type")
        .orderBy("source_node_id", "target_node_id")
    )


SIBLING_PAIRS_ORACLE = GRAPH_PREFIX + r"""
SELECT source_node_id, target_node_id, reference_type
FROM cross_references
WHERE reference_type = 'sibling' AND source_node_id LIKE 'supplier\_%' ESCAPE '\'
ORDER BY source_node_id, target_node_id
"""


def asof_join_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic two-table as-of join (operators/asof.py): every view
    event aligned with the user's latest purchase at-or-before it."""
    from ..operators.asof import asof_join as asof_op

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    return (
        asof_op(views, purchases, on="ts", by="user_id", value_cols=["purchase_ts"])
        .select("event_id", "user_id", "ts", "purchase_ts_asof")
        .orderBy("event_id")
    )


ASOF_TABLES_ORACLE = """
SELECT v.event_id, v.user_id, v.ts,
       (SELECT max(p.ts) FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = v.user_id AND p.ts <= v.ts
       ) AS purchase_ts_asof
FROM events v
WHERE v.event_type = 'view'
ORDER BY v.event_id
"""


def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-direction as-of with tolerance: every view aligned with
    the user's NEXT purchase within 24h (pd.merge_asof
    direction='forward', tolerance parity)."""
    from ..operators.asof import asof_join as asof_op

    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("purchase_ts")
    )
    return (
        asof_op(
            views,
            purchases,
            on="ts",
            by="user_id",
            value_cols=["purchase_ts"],
            direction="forward",
            tolerance=86400.0,
        )
        .select("event_id", "user_id", "ts", "purchase_ts_asof")
        .orderBy("event_id")
    )


ASOF_FORWARD_ORACLE = """
SELECT v.event_id, v.user_id, v.ts,
       (SELECT min(p.ts) FROM events p
        WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
          AND p.ts >= v.ts AND epoch(p.ts) - epoch(v.ts) <= 86400
       ) AS purchase_ts_asof
FROM events v
WHERE v.event_type = 'view'
ORDER BY v.event_id
"""


def graph_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS min hop-distance from customer_7 over the non-sibling
    reference graph (parent_child / child_parent /
    attribute_reference edges), depth <= 3 — the reference's 'graph
    traversal operations' purpose as a first-class operator."""
    from ..operators.graph import bfs_distances

    _, _, xrefs = get_graph(spark, sf_dir)
    edges = xrefs.filter(
        F.col("reference_type").isin("parent_child", "child_parent", "attribute_reference")
    )
    # the xref store is a bare parquet scan with the type filter
    # pushed to row groups — per-level pruned scans beat copying the
    # ~8M-row edge set into checkpoint blocks first
    return bfs_distances(
        edges, "customer_7", max_depth=3, materialize_edges=False
    ).orderBy("node")


GRAPH_DISTANCES_ORACLE = GRAPH_PREFIX + """
, edges AS (
  SELECT DISTINCT source_node_id AS src, target_node_id AS dst
  FROM cross_references
  WHERE reference_type IN ('parent_child', 'child_parent', 'attribute_reference')
), walk AS (
  SELECT 'customer_7' AS node, 0 AS distance
  UNION ALL
  SELECT e.dst, w.distance + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.distance < 3
)
SELECT node, CAST(min(distance) AS INT) AS distance FROM walk GROUP BY node ORDER BY node
"""


def xml_nodes_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The XML ingestion path itself (sources/xml_source.py) over the
    repo's own fixtures. Value-oracled since r9: DuckDB has no XML
    reader, but the fixture corpus is deterministic and version-
    pinned, so the oracle replays the EXPECTED parse as a VALUES
    table — any drift in id synthesis, parent resolution, position
    numbering, or xpath construction flips the hash. Full semantics
    are additionally asserted in tests/test_xml_source.py."""
    import os

    from ..sources import read_xml_corpus

    fixtures = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "tests",
        "fixtures",
    )
    corpus = read_xml_corpus(spark, fixtures)
    return corpus.nodes.select(
        "id", "node_type", "document_id", "parent_id", "position", "xpath"
    ).orderBy("id")


XML_NODES_ROUNDTRIP_ORACLE = """
SELECT * FROM (VALUES
  ('album_1', 'album', 'catalog', 'albums', 0, '/catalog/albums/album[1]'),
  ('album_2', 'album', 'catalog', 'albums', 1, '/catalog/albums/album[2]'),
  ('albums', 'albums', 'catalog', 'music_catalog', 2, '/catalog/albums'),
  ('artist_1', 'artist', 'catalog', 'album_1', 1, '/catalog/albums/album[1]/artist'),
  ('artist_2', 'artist', 'catalog', 'album_2', 1, '/catalog/albums/album[2]/artist'),
  ('catalog_info', 'info', 'catalog', 'music_catalog', 0, '/catalog/info'),
  ('city_1', 'city', 'catalog', 'catalog_info', 1, '/catalog/info/city'),
  ('genre_bebop', 'subgenre', 'catalog', 'genre_jazz', 0, '/catalog/genres/genre[2]/subgenre'),
  ('genre_indie', 'subgenre', 'catalog', 'genre_rock', 1, '/catalog/genres/genre[1]/subgenre[2]'),
  ('genre_jazz', 'genre', 'catalog', 'genres', 1, '/catalog/genres/genre[2]'),
  ('genre_punk', 'subgenre', 'catalog', 'genre_rock', 0, '/catalog/genres/genre[1]/subgenre[1]'),
  ('genre_rock', 'genre', 'catalog', 'genres', 0, '/catalog/genres/genre[1]'),
  ('genres', 'genres', 'catalog', 'music_catalog', 1, '/catalog/genres'),
  ('honour_1', 'honour', 'catalog', NULL, 0, '/catalog/albums/album[1]/artist/honours/honour'),
  ('honour_2', 'honour', 'catalog', NULL, 0, '/catalog/albums/album[2]/artist/honours/honour'),
  ('inner_1', 'inner', 'tiny', 'item_b', 1, '/top/item[2]/inner'),
  ('item_a', 'item', 'tiny', 'top_node', 0, '/top/item[1]'),
  ('item_b', 'item', 'tiny', 'top_node', 1, '/top/item[2]'),
  ('listener_1', 'listener', 'catalog', 'rating_1', 0, '/catalog/ratings/rating[1]/listener'),
  ('listener_2', 'listener', 'catalog', 'rating_2', 0, '/catalog/ratings/rating[2]/listener'),
  ('listener_3', 'listener', 'catalog', 'rating_3', 0, '/catalog/ratings/rating[3]/listener'),
  ('mood_cool', 'mood', 'catalog', NULL, 0, '/catalog/albums/album[2]/moods/mood[1]'),
  ('mood_fast', 'mood', 'catalog', NULL, 0, '/catalog/albums/album[1]/moods/mood[1]'),
  ('mood_loud', 'mood', 'catalog', NULL, 1, '/catalog/albums/album[1]/moods/mood[2]'),
  ('mood_slow', 'mood', 'catalog', NULL, 1, '/catalog/albums/album[2]/moods/mood[2]'),
  ('music_catalog', 'catalog', 'catalog', NULL, 0, '/catalog'),
  ('rating_1', 'rating', 'catalog', 'ratings', 0, '/catalog/ratings/rating[1]'),
  ('rating_2', 'rating', 'catalog', 'ratings', 1, '/catalog/ratings/rating[2]'),
  ('rating_3', 'rating', 'catalog', 'ratings', 2, '/catalog/ratings/rating[3]'),
  ('ratings', 'ratings', 'catalog', 'music_catalog', 3, '/catalog/ratings'),
  ('top_node', 'top', 'tiny', NULL, 0, '/top')
) t(id, node_type, document_id, parent_id, position, xpath)
ORDER BY id
"""


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the non-sibling reference graph,
    top-20 nodes by rank. Rows-only gate by declared design: the
    rank vector is a 6-round float power iteration — per-partition
    summation order perturbs the low bits, so there is no bit-stable
    SQL replay; correctness is proven against a single-process power
    iteration to 1e-7 in tests/test_graph.py.

    The vector itself is the store's materialized pr_ranks table
    (operators/graph.py pagerank, run once per build over the
    deterministic 30% xxhash64 edge subsample persisted as
    pr_edges/pr_spine): a 6-round iteration has an irreducible
    ~1-planning-pass + 1-job per-round cost regardless of data size
    (measured 5-9s at sf0.1, ~17s at sf1 even with persisted
    inputs), which is the wrong per-QUERY price for a vector that
    only changes when the graph does — same build-once reasoning as
    the degrees table behind most_connected. Ad-hoc graphs still run
    the live operator."""
    return (
        get_pr_ranks(spark, sf_dir)
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


QUERIES = {
    "nodes_by_type": nodes_by_type,
    "attribute_search": attribute_search,
    "multi_attribute_search": multi_attribute_search,
    "xpath_search": xpath_search,
    "content_search": content_search,
    "type_inference": type_inference_summary,
    "document_stats": document_stats,
    "hierarchy_levels": hierarchy_levels,
    "ancestors": ancestors_of_order,
    "descendants": descendants_of_nation,
    "relationship_summary": relationship_summary,
    "node_connection_counts": node_connection_counts,
    "most_connected": most_connected,
    "bidirectional_refs": bidirectional_refs,
    "broken_references": broken_references,
    "node_references": node_references,
    "attribute_references": attribute_references_q,
    "multi_references": multi_references_q,
    "same_type_pairs": same_type_pairs,
    "sibling_pairs": sibling_pairs,
    "asof_join_tables": asof_join_tables,
    "asof_join_forward": asof_join_forward,
    "graph_distances": graph_distances,
    "graph_pagerank": graph_pagerank,
    "xml_nodes_roundtrip": xml_nodes_roundtrip,
}

ORACLES = {
    "nodes_by_type": NODES_BY_TYPE_ORACLE,
    "attribute_search": ATTRIBUTE_SEARCH_ORACLE,
    "multi_attribute_search": MULTI_ATTRIBUTE_SEARCH_ORACLE,
    "xpath_search": XPATH_SEARCH_ORACLE,
    "content_search": CONTENT_SEARCH_ORACLE,
    "type_inference": TYPE_INFERENCE_ORACLE,
    "document_stats": DOCUMENT_STATS_ORACLE,
    "hierarchy_levels": HIERARCHY_LEVELS_ORACLE,
    "ancestors": ANCESTORS_ORACLE,
    "descendants": DESCENDANTS_ORACLE,
    "relationship_summary": RELATIONSHIP_SUMMARY_ORACLE,
    "node_connection_counts": NODE_CONNECTION_COUNTS_ORACLE,
    "most_connected": MOST_CONNECTED_ORACLE,
    "bidirectional_refs": BIDIRECTIONAL_ORACLE,
    "broken_references": BROKEN_REFERENCES_ORACLE,
    "node_references": NODE_REFERENCES_ORACLE,
    "attribute_references": ATTRIBUTE_REFERENCES_ORACLE,
    "multi_references": MULTI_REFERENCES_ORACLE,
    "same_type_pairs": SAME_TYPE_ORACLE,
    "sibling_pairs": SIBLING_PAIRS_ORACLE,
    "asof_join_tables": ASOF_TABLES_ORACLE,
    "asof_join_forward": ASOF_FORWARD_ORACLE,
    "graph_distances": GRAPH_DISTANCES_ORACLE,
    "xml_nodes_roundtrip": XML_NODES_ROUNDTRIP_ORACLE,
}


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the mixed reference graph (attribute +
    multi-attribute refs + sibling adjacency — e.g. two adjacent
    lineitems referencing the same part close a triangle; the pure
    attribute-ref graph is bipartite and trivially triangle-free) —
    degree-oriented distributed counting (operators/graph.py
    triangle_count: oriented wedge join, per-vertex fan-out
    O(sqrt(m))). The orientation itself (dedup + degree + orient
    joins over the two stored reference types that actually close
    triangles — main.rb:104-110's default registration) is a pure
    function of the xref table and rides the persistent store
    (tri_oriented), so the query starts at the wedge join."""
    from ..operators.graph import triangle_count

    return triangle_count(None, oriented=get_tri_oriented(spark, sf_dir))


GRAPH_TRIANGLES_ORACLE = GRAPH_PREFIX + """
, und AS (
  SELECT DISTINCT least(source_node_id, target_node_id) AS a,
                  greatest(source_node_id, target_node_id) AS b
  FROM cross_references
  WHERE reference_type IN ('attribute_reference', 'next_sibling')
    AND source_node_id <> target_node_id
)
SELECT (SELECT count(*) FROM und) AS n_edges,
       (SELECT count(*)
        FROM und ab JOIN und bc ON ab.b = bc.a
                    JOIN und ac ON ac.a = ab.a AND ac.b = bc.b) AS n_triangles
"""


QUERIES["graph_triangles"] = graph_triangles
ORACLES["graph_triangles"] = GRAPH_TRIANGLES_ORACLE


def link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the attribute-reference graph
    (operators/graph.py adamic_adar_topk): top-50 unconnected pairs
    by common-neighbor weight — the graph-completion query the
    reference's 'graph traversal' purpose generalizes to.

    max_degree=32 keeps 99%% of vertices (the sf0.1 graph's p99
    degree is 33) while dropping the hub tail — 1,000 supplier
    vertices of degree ~600 that alone hold 94%% of the total wedge
    volume yet contribute a negligible 1/ln(600) weight spread over
    ~180k pairs each (the exact trade ngram_jaccard's max_df
    documents). Measured 101s -> ~8s at sf0.1 for an unchanged
    informative top-50."""
    from ..operators.graph import adamic_adar_topk

    # deterministic 50% edge subsample — the same documented
    # bench-cost control graph_pagerank uses, but PORTABLE (60-bit
    # md5, not xxhash64) because this gate is fully value-oracled:
    # the oracle replays the identical subsample. Wedge volume
    # scales with the square of the edge fraction, so 0.5 cuts the
    # candidate join ~4x while the operator itself stays full-graph.
    # The subsampled pair set and its degree/neighbor center table
    # are store artifacts (aa_und/aa_centers — built in the same
    # _build): the query starts at the wedge expansion, and any
    # drift in the persisted prep would trip this oracle.
    return adamic_adar_topk(
        None,
        k=50,
        max_degree=32,
        und=get_aa_und(spark, sf_dir),
        centers=get_aa_centers(spark, sf_dir),
    )


LINK_PREDICTION_ORACLE = GRAPH_PREFIX + """
, und AS (
  SELECT DISTINCT least(source_node_id, target_node_id) AS a,
                  greatest(source_node_id, target_node_id) AS b
  FROM cross_references
  WHERE reference_type = 'attribute_reference'
    AND source_node_id <> target_node_id
    AND ('0x' || substr(md5(source_node_id || '|' || target_node_id), 1, 15))::BIGINT % 10 < 5
), adj AS (
  SELECT a AS v, b AS n FROM und UNION ALL SELECT b AS v, a AS n FROM und
), deg AS (
  SELECT v, count(*) AS d FROM adj GROUP BY v
), wadj AS (
  SELECT adj.v, adj.n,
         CAST(round(1.0 / ln(CAST(d AS DOUBLE)), 9) AS DECIMAL(18,9)) AS w
  FROM adj JOIN deg USING (v)
  WHERE d >= 2 AND d <= 32
), pairs AS (
  SELECT a1.n AS node_a, a2.n AS node_b,
         round(CAST(sum(a1.w) AS DOUBLE), 6) AS aa_score,
         CAST(count(*) AS BIGINT) AS n_common
  FROM wadj a1 JOIN wadj a2 ON a1.v = a2.v AND a1.n < a2.n
  GROUP BY 1, 2
)
SELECT node_a, node_b, aa_score, n_common
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM und WHERE und.a = p.node_a AND und.b = p.node_b)
ORDER BY aa_score DESC, node_a, node_b
LIMIT 50
"""


QUERIES["link_prediction"] = link_prediction
ORACLES["link_prediction"] = LINK_PREDICTION_ORACLE


_GRAPH_UND_SQL = """
, und AS (
  SELECT DISTINCT least(source_node_id, target_node_id) AS a,
                  greatest(source_node_id, target_node_id) AS b
  FROM cross_references
  WHERE reference_type IN ('attribute_reference', 'next_sibling')
    AND source_node_id <> target_node_id
)"""


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the mixed reference graph
    (operators/graph.degree_assortativity) — the one-number
    hubs-link-to-hubs summary, computed off the store's persisted
    oriented edge table (orientation is irrelevant to the metric;
    any bijection of the simple edge set works)."""
    from ..operators.graph import degree_assortativity

    return degree_assortativity(None, und=get_tri_oriented(spark, sf_dir))


GRAPH_ASSORT_ORACLE = GRAPH_PREFIX + _GRAPH_UND_SQL + """
, both_dir AS (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b AS u, a AS v FROM und
), deg AS (
  SELECT u, count(*) AS deg FROM both_dir GROUP BY 1
)
SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
       count(*) AS n_endpoints,
       round(corr(du.deg, dv.deg), 6) AS assortativity
FROM both_dir e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u
"""

QUERIES["graph_assortativity"] = graph_assortativity
ORACLES["graph_assortativity"] = GRAPH_ASSORT_ORACLE


def graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient over the mixed reference
    graph (operators/graph.local_clustering): the node-level
    refinement of graph_triangles — same persisted degree-oriented
    wedge join, but listing each triangle's three corners instead of
    counting globally. Fully value-oracled (exact integer degrees and
    triangle counts; coeff rounds at 6dp)."""
    from ..operators.graph import local_clustering

    return local_clustering(None, oriented=get_tri_oriented(spark, sf_dir))


GRAPH_CLUSTERING_ORACLE = GRAPH_PREFIX + _GRAPH_UND_SQL + """
, tri AS (
  SELECT ab.a AS x, ab.b AS y, bc.b AS z
  FROM und ab JOIN und bc ON ab.b = bc.a
              JOIN und ac ON ac.a = ab.a AND ac.b = bc.b
), corners AS (
  SELECT x AS node_id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
), tcount AS (
  SELECT node_id, count(*) AS triangles FROM corners GROUP BY 1
), deg AS (
  SELECT node_id, count(*) AS degree
  FROM (SELECT a AS node_id FROM und UNION ALL SELECT b FROM und)
  GROUP BY 1
)
SELECT d.node_id, d.degree,
       CAST(coalesce(t.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN round(2.0 * coalesce(t.triangles, 0)
                       / (d.degree * (d.degree - 1)), 6)
            ELSE 0.0 END AS coeff
FROM deg d LEFT JOIN tcount t USING (node_id)
ORDER BY d.node_id
"""

QUERIES["graph_clustering"] = graph_clustering
ORACLES["graph_clustering"] = GRAPH_CLUSTERING_ORACLE


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by exact coreness over the mixed reference graph,
    read from the store's materialized ``coreness`` table — the
    r11-declared build-once posture made real (r11 VERDICT task 6):
    the H-index fixpoint (operators/graph.kcore_decomposition) runs
    once per content key inside _write_rank_tables, and the gate is a
    TakeOrdered table read, exactly like graph_pagerank. Rows-only by
    the same reasoning as pagerank's gate: the VALUES are pinned by
    the pure-python peeling replica (tests/test_graph.py::TestKCore)
    and the store==live equivalence test, but a data-dependent
    fixpoint is not SQL-expressible for the DuckDB oracle."""
    return (
        get_coreness(spark, sf_dir)
        .orderBy(F.desc("coreness"), F.asc("node_id"))
        .limit(20)
    )


QUERIES["graph_kcore"] = graph_kcore
