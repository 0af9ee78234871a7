"""xml_to_sqlite3_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of joshmcarthur/xml-to-sqlite3.

The reference (Ruby, /root/reference) parses XML directories into a
relational node graph (documents / nodes / node_properties /
cross_references) and serves a SQL analytics surface on top. This
package re-expresses every capability Spark-first — declarative
DataFrame plans optimized by Catalyst — and extends it with the
operators a large-scale training-data pipeline needs (dedup,
similarity search, text analysis, multimodal columns).

Layout:
    session.py       SparkSession builder tuned for the workload
    sources/         XML ingestion (binaryFile scan -> Arrow parse)
    sinks/           parquet canonical sink, sqlite compat sink
    functions/       column-expression helpers (type inference, ...)
    operators/       relationships, hierarchy, dedup, similarity, text
    plans/           the query library (reference surface + OLAP core)
    streaming/       structured-streaming ingestion and windowed aggs
"""

__version__ = "0.1.0"
