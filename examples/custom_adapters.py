#!/usr/bin/env python3
"""Customizing relationship detection — the Spark equivalent of the
reference's examples/custom_main.rb adapter-registration pattern.

An "adapter" here is any function (nodes, properties) -> DataFrame
with the cross_references schema (operators/relationships.XREF_COLS).
Compose the set you want — core structural + attribute references,
the optional example adapters, or your own — and union them.

Run:  python examples/custom_adapters.py [input_dir] [output.sqlite3]
(defaults: tests/fixtures -> /tmp/custom_out.sqlite3)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import reduce

from pyspark.sql import DataFrame, functions as F

from xml_to_sqlite3_spark.session import get_spark
from xml_to_sqlite3_spark.sources import read_xml_corpus
from xml_to_sqlite3_spark.sinks import write_corpus_sqlite
from xml_to_sqlite3_spark.operators import relationships as R


def rating_cohort_adapter(nodes: DataFrame, properties: DataFrame) -> DataFrame:
    """A custom adapter: nodes with the same 'stars' rating are
    related ('same_stars', confidence 0.5) — the kind of
    domain-specific rule the reference's adapter API exists for."""
    years = properties.filter(F.col("property_name") == "stars").select(
        "node_id", F.col("property_value").alias("stars")
    )
    docs = nodes.select(F.col("id").alias("node_id"), "document_id")
    tagged = years.join(docs, "node_id")
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.document_id") == F.col("b.document_id"))
            & (F.col("a.stars") == F.col("b.stars"))
            & (F.col("a.node_id") != F.col("b.node_id")),
        )
        .select(
            F.col("a.node_id").alias("source_node_id"),
            F.col("b.node_id").alias("target_node_id"),
            F.lit("same_stars").alias("reference_type"),
            F.lit("stars").alias("attribute_name"),
            F.lit(0.5).cast("double").alias("confidence"),
            F.col("a.document_id").alias("document_id"),
        )
    )


def main() -> None:
    input_dir = sys.argv[1] if len(sys.argv) > 1 else "tests/fixtures"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/custom_out.sqlite3"

    spark = get_spark(app_name="custom_adapters_example")
    corpus = read_xml_corpus(spark, input_dir)

    # the custom adapter stack: core + examples + ours
    adapters = [
        lambda n, p: R.structural_relationships(n),
        R.attribute_references,
        R.multi_references,
        lambda n, p: R.same_type_relationships(n),
        rating_cohort_adapter,
    ]
    print(f"Registered custom relationship adapters ({len(adapters)} total)")

    xrefs = reduce(
        DataFrame.unionByName,
        [fn(corpus.nodes, corpus.properties) for fn in adapters],
    )

    if os.path.exists(out):
        os.remove(out)
    counts = write_corpus_sqlite(corpus, out, cross_references=xrefs)
    print("written:", counts)
    by_type = xrefs.groupBy("reference_type").count().orderBy("reference_type").collect()
    for r in by_type:
        print(f"  {r['reference_type']}: {r['count']}")


if __name__ == "__main__":
    main()
