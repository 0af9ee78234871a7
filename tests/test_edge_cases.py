"""XML edge-case parity (reference: test/test_edge_cases.rb
semantics, our own inline fixtures)."""

from __future__ import annotations

import os

import pytest

from xml_to_sqlite3_spark.sources import read_xml_corpus
from xml_to_sqlite3_spark.sinks import write_corpus_parquet


def _corpus(spark, tmp_path, name, xml):
    d = tmp_path / name
    os.makedirs(d, exist_ok=True)
    (d / f"{name}.xml").write_text(xml)
    return read_xml_corpus(spark, str(d))


def test_empty_root_only(spark, tmp_path):
    c = _corpus(spark, tmp_path, "emptyroot", '<?xml version="1.0"?>\n<empty_root id="empty_root"/>')
    rows = c.nodes.collect()
    assert len(rows) == 1 and rows[0]["id"] == "empty_root"
    assert rows[0]["content"] == ""


def test_xml_without_ids(spark, tmp_path):
    c = _corpus(spark, tmp_path, "noids", "<root><a>1</a><b>2</b></root>")
    assert c.nodes.count() == 0
    assert c.documents.count() == 1  # document row still recorded


def test_duplicate_ids_last_wins(spark, tmp_path):
    xml = '<root id="r"><item id="dup">First</item><item id="dup">Second</item></root>'
    c = _corpus(spark, tmp_path, "dups", xml)
    # raw corpus carries both occurrences; the sink resolves
    assert c.nodes.filter("id = 'dup'").count() == 2
    out = str(tmp_path / "dups_pq")
    write_corpus_parquet(c, out)
    kept = spark.read.parquet(os.path.join(out, "nodes")).filter("id = 'dup'").collect()
    assert len(kept) == 1
    assert kept[0]["content"] == "Second"  # reference: last insert wins


def test_special_characters_unescaped(spark, tmp_path):
    xml = '<root id="r"><item id="s" attr="&lt;&gt;&amp;&quot;&#39;">x</item></root>'
    c = _corpus(spark, tmp_path, "special", xml)
    props = {r["property_name"]: r["property_value"] for r in c.properties.collect()}
    assert props["attr"] == '<>&"\''


def test_cdata_in_content(spark, tmp_path):
    xml = '<root id="r"><![CDATA[Some CDATA content here]]></root>'
    c = _corpus(spark, tmp_path, "cdata", xml)
    assert "CDATA content" in c.nodes.collect()[0]["content"]


def test_comments_and_pis_ignored(spark, tmp_path):
    xml = (
        '<?xml version="1.0"?><?style type="x"?>\n'
        '<root id="r"><!-- note --><a id="a">1</a><!-- more --><b id="b">2</b></root>'
    )
    c = _corpus(spark, tmp_path, "comments", xml)
    rows = {r["id"]: r for r in c.nodes.collect()}
    assert set(rows) == {"r", "a", "b"}
    # comment text never leaks into content
    assert "note" not in rows["r"]["content"]
    # positions count elements only, not comments
    assert rows["a"]["position"] == 0 and rows["b"]["position"] == 1


def test_namespaced_elements(spark, tmp_path):
    xml = (
        '<ns:root xmlns:ns="http://example.com/ns" id="ns_root">'
        '<ns:item id="ns_item_1" ns:kind="x">a</ns:item>'
        '<plain id="regular_item">b</plain></ns:root>'
    )
    c = _corpus(spark, tmp_path, "nsdoc", xml)
    rows = {r["id"]: r for r in c.nodes.collect()}
    assert set(rows) == {"ns_root", "ns_item_1", "regular_item"}
    assert rows["ns_item_1"]["node_type"] == "item"  # local name, ns stripped
    props = {r["property_name"] for r in c.properties.collect()}
    assert "kind" in props


def test_large_file(spark, tmp_path):
    items = "".join(f'<item id="i{n}" v="{n}">t{n}</item>' for n in range(1000))
    c = _corpus(spark, tmp_path, "big", f'<root id="top">{items}</root>')
    assert c.nodes.count() == 1001
    assert c.properties.count() == 1000
    pos = {r["id"]: r["position"] for r in c.nodes.filter("id in ('i0','i999')").collect()}
    assert pos == {"i0": 0, "i999": 999}


def test_deeply_nested(spark, tmp_path):
    depth = 50
    xml = "".join(f'<n id="d{i}">' for i in range(depth)) + "leaf" + "</n>" * depth
    c = _corpus(spark, tmp_path, "deep", xml)
    assert c.nodes.count() == depth
    leaf = c.nodes.filter(f"id = 'd{depth-1}'").collect()[0]
    assert leaf["parent_id"] == f"d{depth-2}"
    assert leaf["content"] == "leaf"
