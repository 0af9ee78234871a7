"""Tabular (CSV / JSON / parquet-of-records) ingestion into the SAME
node model the XML path produces — so the entire downstream surface
(typed properties, relationship detection, the §2.3 query plans, the
SQLite sink) applies to non-XML record data unchanged.

Mapping (mirrors the reference's element semantics,
lib/document_parser.rb:26-53, re-expressed for rows):
  - each record        -> a node; ``node_type`` = the given type name
  - the ``id_col``     -> node id (records without one are dropped to
                          errors, like id-less XML elements)
  - ``parent_col``     -> parent_id (optional — flat tables produce
                          root-level nodes, exactly like root XML
                          elements with no id-bearing ancestor)
  - ``content_col``    -> node content (optional)
  - every other column -> a node_properties row, typed by the SAME
                          infer_type chain the XML attributes use
  - position           -> ordinal among siblings (per parent, ordered
                          by id — deterministic without any input
                          row-order assumption)

Scale: one narrow scan; the per-parent position window is the only
shuffle; the property unpivot is an in-task explode of column
structs (one scan for ALL properties, never per-column scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.type_inference import infer_type


def read_records(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    **options,
) -> DataFrame:
    """Read a record file (csv defaults: header on, no inference —
    values stay strings so infer_type decides, like XML attributes)."""
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def records_to_graph(
    records: DataFrame,
    node_type: str,
    document_id: str,
    id_col: str = "id",
    parent_col: str | None = None,
    content_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(nodes, properties) in the XML path's exact schemas."""
    if id_col not in records.columns:
        raise ValueError(f"records need an {id_col!r} column")
    keyed = records.filter(
        F.col(id_col).isNotNull() & (F.col(id_col).cast("string") != "")
    )
    parent = (
        F.col(parent_col).cast("string")
        if parent_col is not None
        else F.lit(None).cast("string")
    )
    # Sibling position = ordinal by id within the parent group,
    # computed as a TWO-PHASE distributed ordinal (the pack_sequences
    # cumsum shape): a plain per-parent window would serialize a flat
    # table — where every row shares one (null) parent — through ONE
    # task. Phase 1: range-arrange on (parent, id) and rank within
    # (physical partition, parent); phase 2: per-(partition, parent)
    # counts (a small table — range partitioning keeps each parent on
    # few partitions) cumsum'd per parent into offsets. The result is
    # a pure function of the data even though the range partitioner's
    # sampled boundaries are not.
    # internal group key: null parents (roots / flat tables) get a
    # sentinel so the offsets equi-join matches them (null keys never
    # equi-join)
    arranged = (
        keyed.withColumn("__pk", F.coalesce(parent, F.lit("\x00__root__")))
        .withColumn("__ik", F.col(id_col).cast("string"))
        .repartitionByRange("__pk", "__ik")
        .withColumn("__pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("__pid", "__pk").orderBy("__ik")
    with_local = arranged.withColumn("__lrn", F.row_number().over(w_local))
    w_off = (
        Window.partitionBy("__pk")
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_local.groupBy("__pid", "__pk")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__pk", "__off")
    )
    keyed = with_local.join(offsets, ["__pid", "__pk"]).withColumn(
        "__pos", (F.col("__off") + F.col("__lrn") - 1).cast("int")
    )
    nodes = keyed.select(
        F.col(id_col).cast("string").alias("id"),
        F.lit(node_type).alias("node_type"),
        F.lit(document_id).alias("document_id"),
        parent.alias("parent_id"),
        F.col("__pos").alias("position"),
        (
            F.col(content_col).cast("string")
            if content_col is not None
            else F.lit(None).cast("string")
        ).alias("content"),
        F.concat(
            F.lit(f"/{document_id}/{node_type}[@id='"),
            F.col(id_col).cast("string"),
            F.lit("']"),
        ).alias("xpath"),
        # the sinks' INSERT OR REPLACE dedupe orders on ``ordinal``;
        # rows have no file position after a parallel read, so the
        # tie-break is a deterministic hash of the whole record —
        # stable across runs and partitionings
        F.xxhash64(*[F.col(c).cast("string") for c in records.columns]).alias(
            "ordinal"
        ),
    )

    skip = {id_col, parent_col, content_col} - {None}
    prop_cols = [c for c in records.columns if c not in skip]
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("property_name"),
                F.col(c).cast("string").alias("property_value"),
            )
            for c in prop_cols
        ]
    )
    properties = (
        keyed.select(
            F.col(id_col).cast("string").alias("node_id"),
            F.explode(entries).alias("p"),
        )
        .filter(F.col("p.property_value").isNotNull())
        .select(
            "node_id",
            F.col("p.property_name").alias("property_name"),
            F.col("p.property_value").alias("property_value"),
            infer_type(F.col("p.property_value")).alias("data_type"),
            F.xxhash64("node_id", "p.property_name", "p.property_value").alias(
                "ordinal"
            ),
        )
    )
    return nodes, properties


def read_tabular_corpus(
    spark: SparkSession,
    path: str,
    fmt: str = "csv",
    node_type: str = "record",
    id_col: str = "id",
    parent_col: str | None = None,
    content_col: str | None = None,
):
    """Full-corpus form for the CLI: tabular records as an XmlCorpus
    (documents = one row for the input path; errors = the id-less
    records, mirroring the XML path's id-less-element handling) so
    the SQLite/parquet sinks and stats report work unchanged."""
    import os

    from pyspark.sql.types import (
        StringType,
        StructField,
        StructType,
    )

    from .xml_source import XmlCorpus

    records = read_records(spark, path, fmt)
    nodes, properties = records_to_graph(
        records,
        node_type=node_type,
        document_id=os.path.splitext(os.path.basename(path))[0],
        id_col=id_col,
        parent_col=parent_col,
        content_col=content_col,
    )
    doc_id = os.path.splitext(os.path.basename(path))[0]
    size = os.path.getsize(path) if os.path.isfile(path) else 0
    if os.path.isfile(path):
        import hashlib

        with open(path, "rb") as f:
            fh = hashlib.md5(f.read()).hexdigest()
    else:
        fh = None
    documents = spark.createDataFrame(
        [(doc_id, os.path.basename(path), size, fh)],
        "id string, filename string, file_size long, file_hash string",
    )
    n_err = records.filter(
        F.col(id_col).isNull() | (F.col(id_col).cast("string") == "")
    ).count()
    err_schema = StructType(
        [
            StructField("filename", StringType()),
            StructField("parse_error", StringType()),
        ]
    )
    errors = spark.createDataFrame(
        [(os.path.basename(path), f"{n_err} records without {id_col!r}")]
        if n_err
        else [],
        err_schema,
    )
    return XmlCorpus(documents, nodes, properties, errors)
