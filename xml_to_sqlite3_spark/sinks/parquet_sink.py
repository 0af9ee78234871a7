"""Canonical distributed sink: partitioned parquet.

This is the 100 TB path — the reference's single SQLite file is a
single-writer bottleneck by construction (lib/database_writer.rb is
explicitly one consumer fiber); at scale the corpus lands as parquet
partitioned by document_id hash-bucket so downstream joins on
document_id prune partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ..sources.xml_source import XmlCorpus, dedupe_last_writer


def write_corpus_parquet(
    corpus: XmlCorpus,
    out_dir: str,
    mode: str = "overwrite",
    buckets: int | None = None,
) -> None:
    """Write the corpus as four parquet tables.

    INSERT OR REPLACE parity: primary-key duplicates are resolved
    last-writer-wins (deterministically by filename) before writing,
    like the reference's upsert (lib/database_writer.rb:44-56).
    """
    documents = dedupe_last_writer(corpus.documents, ["id"], "filename")
    # parse ordinal = the reference writer's insertion order, so the
    # winner matches its INSERT OR REPLACE outcome exactly
    nodes = dedupe_last_writer(corpus.nodes, ["id"], "ordinal").drop("ordinal")
    properties = dedupe_last_writer(
        corpus.properties, ["node_id", "property_name"], "ordinal"
    ).drop("ordinal")

    def _write(df, name, bucket_col=None):
        writer = df.write.mode(mode)
        if buckets and bucket_col is not None:
            df = df.withColumn("bucket", F.abs(F.hash(bucket_col)) % buckets)
            writer = df.write.mode(mode).partitionBy("bucket")
        writer.parquet(os.path.join(out_dir, name))

    _write(documents, "documents")
    _write(nodes, "nodes", "document_id")
    _write(properties, "node_properties", "node_id")
    _write(corpus.errors, "errors")
