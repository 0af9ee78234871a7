"""Many-file corpus ingestion: the file-parallel path with a
generated 120-file corpus (nested dirs, varied shapes)."""

from __future__ import annotations

import os

from xml_to_sqlite3_spark.sources import read_xml_corpus
from xml_to_sqlite3_spark.operators.relationships import detect_all_relationships


def test_many_files(spark, tmp_path):
    n_files = 120
    expected_nodes = 0
    expected_refs = 0
    for i in range(n_files):
        sub = tmp_path / f"batch{i % 4}"
        os.makedirs(sub, exist_ok=True)
        items = "".join(
            f'<item id="f{i}_item{j}" ref="f{i}_item{(j + 1) % 3}" n="{j}">w{j}</item>'
            for j in range(3)
        )
        (sub / f"doc{i}.xml").write_text(f'<root id="f{i}_root">{items}</root>')
        expected_nodes += 4  # root + 3 items
        expected_refs += 3  # each item's ref resolves within the doc

    corpus = read_xml_corpus(spark, str(tmp_path))
    assert corpus.documents.count() == n_files
    assert corpus.nodes.count() == expected_nodes
    assert corpus.errors.count() == 0

    # attribute references resolve per-document only — no cross-file
    # leakage despite identical shapes in every file
    refs = detect_all_relationships(corpus.nodes, corpus.properties).filter(
        "reference_type = 'attribute_reference'"
    )
    rows = refs.collect()
    assert len(rows) == expected_refs
    assert all(
        r["source_node_id"].split("_")[0] == r["target_node_id"].split("_")[0]
        for r in rows
    )

    # the parse ran across multiple tasks (file-parallel, not one big task)
    n_parts = corpus.nodes.rdd.getNumPartitions()
    assert n_parts > 1
