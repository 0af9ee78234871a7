"""CSV/JSON records into the XML path's node model: the relationship
detectors and query surface must work on tabular data unchanged."""

from __future__ import annotations

from xml_to_sqlite3_spark.operators.relationships import detect_all_relationships
from xml_to_sqlite3_spark.sources.tabular_source import (
    read_records,
    records_to_graph,
)

CSV = """id,parent,owner_ref,qty,label
n1,,n2,5,root item
n2,n1,,2.5,child a
n3,n1,n1,true,child b
,n1,x,9,no id dropped
"""


def test_csv_records_become_graph(spark, tmp_path):
    p = tmp_path / "recs.csv"
    p.write_text(CSV)
    recs = read_records(spark, str(p), "csv")
    nodes, props = records_to_graph(
        recs, node_type="item", document_id="recs",
        id_col="id", parent_col="parent", content_col="label",
    )
    n = {r["id"]: r for r in nodes.collect()}
    assert set(n) == {"n1", "n2", "n3"}  # id-less row dropped
    assert n["n2"]["parent_id"] == "n1" and n["n1"]["parent_id"] is None
    assert n["n1"]["node_type"] == "item" and n["n1"]["content"] == "root item"
    # deterministic sibling positions ordered by id
    assert (n["n2"]["position"], n["n3"]["position"]) == (0, 1)

    pr = {(r["node_id"], r["property_name"]): r for r in props.collect()}
    assert pr[("n1", "qty")]["data_type"] == "integer"
    assert pr[("n2", "qty")]["data_type"] == "float"
    assert pr[("n3", "qty")]["data_type"] == "boolean"
    assert ("n2", "owner_ref") not in pr  # null property skipped

    # the XML path's relationship detectors run unchanged
    xrefs = detect_all_relationships(nodes, props)
    types = {
        (r["source_node_id"], r["target_node_id"], r["reference_type"])
        for r in xrefs.collect()
    }
    assert ("n1", "n2", "parent_child") in types
    assert ("n3", "n1", "child_parent") in types
    assert ("n2", "n3", "sibling") in types
    # owner_ref n1->n2 resolves as an attribute reference
    assert ("n1", "n2", "attribute_reference") in types


def test_json_records_roundtrip(spark, tmp_path):
    import json

    p = tmp_path / "recs.json"
    p.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"id": "a", "score": "3.5"},
                {"id": "b", "score": "7"},
            ]
        )
    )
    recs = read_records(spark, str(p), "json")
    nodes, props = records_to_graph(recs, "rec", "j1")
    assert nodes.count() == 2
    got = {r["node_id"]: r["data_type"] for r in props.collect()}
    assert got == {"a": "float", "b": "integer"}
