"""Relationship-detection parity tests (reference:
test/test_relationship_detection.rb semantics, our own fixtures)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from xml_to_sqlite3_spark.operators import hierarchy, relationships as R
from xml_to_sqlite3_spark.sources import read_xml_corpus

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def corpus(spark):
    return read_xml_corpus(spark, FIXTURES)


@pytest.fixture(scope="module")
def structural(corpus):
    df = R.structural_relationships(corpus.nodes)
    rows = df.collect()
    return {
        rtype: {(r["source_node_id"], r["target_node_id"]) for r in rows if r["reference_type"] == rtype}
        for rtype in {r["reference_type"] for r in rows}
    }


def test_parent_child(structural):
    pc = structural["parent_child"]
    assert ("top_node", "item_a") in pc
    assert ("top_node", "item_b") in pc
    assert ("item_b", "inner_1") in pc
    assert ("music_catalog", "albums") in pc
    assert ("album_1", "artist_1") in pc
    # reversed type exists for every pair
    assert {(b, a) for (a, b) in pc} == structural["child_parent"]


def test_siblings_bidirectional(structural):
    sib = structural["sibling"]
    assert ("item_a", "item_b") in sib and ("item_b", "item_a") in sib
    # genre_punk / genre_indie share parent genre_rock
    assert ("genre_punk", "genre_indie") in sib
    # inner_1 has no id-bearing siblings
    assert not any("inner_1" in p for p in sib)
    # nodes whose parent has no id are never siblings (nil-parent group skipped)
    assert not any("mood_fast" in p for p in sib)


def test_adjacent_siblings(structural):
    assert ("item_a", "item_b") in structural["next_sibling"]
    assert ("item_b", "item_a") in structural["previous_sibling"]
    # rating_1 / rating_2 / rating_3 are consecutive positions
    assert ("rating_1", "rating_2") in structural["next_sibling"]
    assert ("rating_2", "rating_3") in structural["next_sibling"]
    assert ("rating_1", "rating_3") not in structural["next_sibling"]


@pytest.fixture(scope="module")
def attr_refs(corpus):
    return {
        (r["source_node_id"], r["target_node_id"]): r.asDict()
        for r in R.attribute_references(corpus.nodes, corpus.properties).collect()
    }


def test_attribute_reference_targets(attr_refs):
    assert ("genre_punk", "genre_rock") in attr_refs  # parent="genre_rock"
    assert ("album_1", "genre_punk") in attr_refs  # genre="genre_punk"
    assert ("rating_1", "album_1") in attr_refs  # album_id="album_1"
    # values that match the id pattern but name no node: absent
    assert not any(t == "Rock" for (_, t) in attr_refs)


def test_attribute_reference_confidence(attr_refs):
    # 'parent' is an indicator (+0.15) and genre_rock matches prefix (+0.05) -> capped 1.0
    assert attr_refs[("genre_punk", "genre_rock")]["confidence"] == pytest.approx(1.0)
    # 'genre' has no indicator: 0.8 + 0.05 prefix
    assert attr_refs[("album_1", "genre_punk")]["confidence"] == pytest.approx(0.85)
    # 'album_id' contains 'id': 0.8 + 0.15 + 0.05 capped
    assert attr_refs[("rating_1", "album_1")]["confidence"] == pytest.approx(1.0)
    assert attr_refs[("rating_1", "album_1")]["attribute_name"] == "album_id"


def test_multi_references(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", "thing", "d1", None, 0, "", "/a"),
            ("n2", "thing", "d1", None, 1, "", "/b"),
            ("n3", "thing", "d1", None, 2, "", "/c"),
        ],
        "id string, node_type string, document_id string, parent_id string,"
        " position int, content string, xpath string",
    )
    properties = spark.createDataFrame(
        [
            ("n1", "linked_ids", "n2 n3", "string"),
            ("n1", "tags", "n2,missing_id", "string"),
        ],
        "node_id string, property_name string, property_value string, data_type string",
    )
    out = {
        (r["source_node_id"], r["target_node_id"]): r.asDict()
        for r in R.multi_references(nodes, properties).collect()
    }
    assert set(out) == {("n1", "n2"), ("n1", "n3")}
    # linked_ids contains 'ids' (+0.2), n2 matches no prefix pattern
    # ('n2' is letters+digits, not letters_underscore): (0.6+0.2)*0.8
    linked = [v for k, v in out.items() if v["attribute_name"] == "linked_ids"]
    assert all(v["confidence"] == pytest.approx(0.8 * 0.8) for v in linked)
    tags = [v for k, v in out.items() if v["attribute_name"] == "tags"]
    assert all(v["confidence"] == pytest.approx(0.6 * 0.8) for v in tags)


def test_same_type_pairs(spark):
    nodes = spark.createDataFrame(
        [
            ("a", "book", "d1", None, 0, "text a", "/a"),
            ("b", "book", "d1", None, 1, "text b", "/b"),
            ("c", "book", "d2", None, 0, "text c", "/c"),  # other doc
            ("d", "book", "d1", None, 2, None, "/d"),  # null content excluded
            ("e", "author", "d1", None, 3, "text e", "/e"),  # singleton type
        ],
        "id string, node_type string, document_id string, parent_id string,"
        " position int, content string, xpath string",
    )
    pairs = {
        (r["source_node_id"], r["target_node_id"])
        for r in R.same_type_relationships(nodes).collect()
    }
    assert pairs == {("a", "b"), ("b", "a")}


def test_content_similarity(spark):
    nodes = spark.createDataFrame(
        [
            ("a", "t", "d1", None, 0, "the quick brown fox", "/a"),
            ("b", "t", "d1", None, 1, "the quick brown fox", "/b"),  # jaccard 1.0
            ("c", "t", "d1", None, 2, "completely different words here", "/c"),
        ],
        "id string, node_type string, document_id string, parent_id string,"
        " position int, content string, xpath string",
    )
    out = {
        (r["source_node_id"], r["target_node_id"]): r["confidence"]
        for r in R.content_similarity_relationships(nodes).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    assert out[("a", "b")] == pytest.approx(0.5)  # 1.0 jaccard * 0.5 scale


def test_node_tree_levels(spark, corpus):
    tree = {r["id"]: r["level"] for r in hierarchy.node_tree(spark, corpus.nodes).collect()}
    assert tree["music_catalog"] == 0
    assert tree["mood_fast"] == 0  # parent <moods> has no id -> root
    assert tree["albums"] == 1
    assert tree["album_1"] == 2
    assert tree["artist_1"] == 3
    assert tree["inner_1"] == 2


def test_node_tree_iterative_matches_cte(spark, corpus):
    cte = {(r["id"], r["level"]) for r in hierarchy.node_tree(spark, corpus.nodes).collect()}
    it = {
        (r["id"], r["level"])
        for r in hierarchy.node_tree_iterative(corpus.nodes).collect()
    }
    assert cte == it


def test_ancestors_descendants(spark, corpus):
    xrefs = R.structural_relationships(corpus.nodes)
    anc = {r["ancestor_id"]: r.asDict() for r in hierarchy.ancestors(spark, xrefs, "artist_1").collect()}
    assert set(anc) == {"album_1", "albums", "music_catalog"}
    assert anc["music_catalog"]["depth"] == 3
    assert anc["music_catalog"]["path"] == "music_catalog -> albums -> album_1"

    des = {r["descendant_id"]: r["depth"] for r in hierarchy.descendants(spark, xrefs, "albums").collect()}
    assert des == {"album_1": 1, "album_2": 1, "artist_1": 2, "artist_2": 2}


def test_canonical_siblings_symmetrize_to_identical_multiset(spark):
    """The store build stages id-canonical sibling pairs and restores
    both directions with one explode (plans/node_graph.
    _symmetrize_siblings) — the resulting multiset must be row-for-row
    identical to the parity (both-directions) detection output,
    including next/previous_sibling adjacency re-orientation."""
    from pyspark.sql import functions as F

    from xml_to_sqlite3_spark.plans import node_graph as NG

    sf = "/root/testdata/sf0.001"
    nodes = NG.build_nodes(spark, sf)
    props = NG.build_properties(spark, sf)
    cols = list(R.XREF_COLS)

    def counted(df):
        # attribute_name is NULL on structural rows; fill before the
        # join-key compare (NULL keys never match in an equi-join)
        return df.na.fill({"attribute_name": "<null>"}).groupBy(*cols).count()

    a = counted(R.detect_all_relationships(nodes, props)).withColumnRenamed(
        "count", "ca"
    )
    b = counted(
        NG._symmetrize_siblings(
            R.detect_all_relationships(nodes, props, canonical_siblings=True)
        )
    ).withColumnRenamed("count", "cb")
    diff = (
        a.join(b, cols, "full_outer")
        .filter(
            F.col("ca").isNull()
            | F.col("cb").isNull()
            | (F.col("ca") != F.col("cb"))
        )
        .count()
    )
    assert diff == 0
