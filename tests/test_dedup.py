"""Dedup operator tests with planted duplicates."""

from __future__ import annotations

import pytest

from xml_to_sqlite3_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a sunny windowsill and birds sing in the garden trees outside"
)
NEAR = BASE.replace("sunny", "rainy")  # one word differs
OTHER = "completely unrelated text about distributed query engines and shuffles"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, BASE),
            (2, BASE),  # exact dup of 1
            (3, NEAR),  # near dup of 1
            (4, OTHER),
            (5, OTHER + " with a small suffix"),
        ],
        "doc_id long, text string",
    )


def test_exact_duplicates(docs):
    rows = {r["doc_id"]: r.asDict() for r in D.exact_duplicates(docs).collect()}
    assert rows[1]["group_size"] == 2 and rows[2]["group_size"] == 2
    assert rows[1]["is_keeper"] is True
    assert rows[2]["is_keeper"] is False  # min doc_id wins
    assert rows[3]["group_size"] == 1 and rows[3]["is_keeper"] is True
    assert rows[1]["text_md5"] == rows[2]["text_md5"]


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert 0.7 <= pairs[(1, 3)] < 1.0  # one word changed
    assert (1, 4) not in pairs


def test_minhash_signature_shape(docs):
    sigs = D.minhash_signatures(docs, k=32).collect()
    assert all(len(r["signature"]) == 32 for r in sigs)
    by_id = {r["doc_id"]: r["signature"] for r in sigs}
    assert by_id[1] == by_id[2]  # identical docs, identical signatures
    # near-dup signatures mostly agree
    agree = sum(1 for x, y in zip(by_id[1], by_id[3]) if x == y)
    assert agree >= 16


def test_minhash_lsh_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r.asDict()
        for r in D.minhash_lsh_pairs(docs, k=64, bands=16, threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)]["jaccard"] == 1.0
    assert (1, 3) in pairs  # near dup caught by banding
    assert (1, 4) not in pairs
    # signature-estimated jaccard tracks the exact value loosely
    assert pairs[(1, 3)]["est_jaccard"] > 0.5


def test_simhash_pairs(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[2]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 16
    assert (1, 4) not in pairs or pairs[(1, 4)] > pairs[(1, 3)]
