"""Corpus-curation pipeline tests with planted disqualifiers."""

from __future__ import annotations

import pytest

from xml_to_sqlite3_spark.operators.pipeline import curate_corpus

GOOD = (
    "the data engine runs a query for it and that is a plan of the "
    "sort that a table scan is for and the filter is in it for a join"
)
NEAR = GOOD.replace("filter", "merge")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, GOOD),  # kept
            (2, GOOD),  # exact dup of 1
            (3, NEAR),  # near dup of 1
            # punctuation-heavy scrap with one EN stopword: lang=en
            # but quality far below threshold
            (4, "the ?!?! ;;;; ,,,, ?!?! !!!! ...."),
            (5, "el que la de un es en por no la que de el un es no por y en la de"),  # es
        ],
        "doc_id long, text string",
    )


def test_curation_decisions(docs):
    out = {r["doc_id"]: r.asDict() for r in curate_corpus(docs).collect()}
    assert len(out) == 5
    assert out[1]["keep"] is True and out[1]["reason"] is None
    assert out[2]["keep"] is False and out[2]["reason"] == "exact_dup"
    assert out[3]["keep"] is False and out[3]["reason"] == "near_dup"
    assert out[4]["keep"] is False and out[4]["reason"] == "low_quality"
    assert out[5]["keep"] is False and out[5]["reason"] == "wrong_lang"
    assert out[5]["predicted_lang"] == "es"


def test_curation_deterministic(docs):
    a = sorted(map(tuple, curate_corpus(docs).collect()))
    b = sorted(map(tuple, curate_corpus(docs).collect()))
    assert a == b
