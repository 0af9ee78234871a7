"""Full-text search (BM25) and auto-generated view tests."""

from __future__ import annotations

import os

import pytest

from xml_to_sqlite3_spark.operators.search import bm25_search, build_text_index
from xml_to_sqlite3_spark.plans.views import (
    create_node_type_views,
    create_sqlite_node_type_views,
)
from xml_to_sqlite3_spark.sources import read_xml_corpus
from xml_to_sqlite3_spark.sinks import write_corpus_sqlite

FIXTURES = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark engine shuffles data across the cluster"),
            (2, "the query engine optimizes every query plan"),
            (3, "data data data everywhere in the lake"),
            (4, "an unrelated sentence about gardening and tulips"),
        ],
        "doc_id long, text string",
    )


def test_index_shape(docs):
    idx = build_text_index(docs)
    rows = {(r["token"], r["doc_id"]): (r["tf"], r["doc_len"]) for r in idx.collect()}
    assert rows[("data", 3)] == (3, 7)  # tf counts repeats, doc_len counts tokens
    assert rows[("query", 2)][0] == 2


def test_bm25_ranking(docs):
    idx = build_text_index(docs)
    out = bm25_search(idx, "data query", k=4).collect()
    ids = [r["doc_id"] for r in out]
    # docs without any query term never appear
    assert 4 not in ids
    # the heavy-tf docs outrank the single-mention doc
    assert set(ids[:2]) == {2, 3}
    assert ids[2] == 1
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    assert all(r["bm25"] > 0 for r in out)


def test_bm25_single_term(docs):
    idx = build_text_index(docs)
    out = bm25_search(idx, "gardening", k=4).collect()
    assert [r["doc_id"] for r in out] == [4]


def test_spark_node_type_views(spark):
    corpus = read_xml_corpus(spark, FIXTURES)
    names = create_node_type_views(spark, corpus.nodes)
    assert "nodes_album" in names and "nodes_item" in names
    assert spark.sql("SELECT count(*) c FROM nodes_album").collect()[0]["c"] == 2
    assert spark.sql("SELECT count(*) c FROM nodes_item").collect()[0]["c"] == 2


def test_sqlite_node_type_views(spark, tmp_path):
    corpus = read_xml_corpus(spark, FIXTURES)
    db = str(tmp_path / "v.sqlite3")
    write_corpus_sqlite(corpus, db)
    names = create_sqlite_node_type_views(db)
    assert "nodes_album" in names
    import sqlite3

    con = sqlite3.connect(db)
    assert con.execute("SELECT count(*) FROM nodes_album").fetchone()[0] == 2
    assert con.execute("SELECT count(*) FROM nodes_rating").fetchone()[0] == 3
    con.close()
