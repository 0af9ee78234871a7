"""Naive Bayes classifier tests: planted-signal corpora where the
argmax is hand-checkable, plus smoothing/OOV edge cases."""

from __future__ import annotations

import math

import pytest

from xml_to_sqlite3_spark.operators import classify as CL


@pytest.fixture(scope="module")
def fitted(spark):
    # class "spam" docs scream "buy", class "ham" docs say "hello"
    train = spark.createDataFrame(
        [
            (1, "buy buy cheap buy", "spam"),
            (2, "buy cheap now", "spam"),
            (3, "hello dear friend hello", "ham"),
            (4, "hello meeting notes", "ham"),
            (5, "notes from the meeting", "ham"),
        ],
        "doc_id long, text string, label string",
    )
    return CL.nb_train(train, label_col="label")


def test_obvious_signal_wins(spark, fitted):
    test = spark.createDataFrame(
        [(10, "buy cheap buy"), (11, "hello meeting friend")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["predicted"] for r in CL.nb_score(test, fitted).collect()}
    assert out == {10: "spam", 11: "ham"}


def test_oov_only_doc_falls_back_to_prior(spark, fitted):
    # every token unseen -> score(c) = prior_ln(c); ham has 3/5 docs
    test = spark.createDataFrame(
        [(20, "zzz qqq unseen")], "doc_id long, text string"
    )
    row = CL.nb_score(test, fitted).collect()[0]
    assert row["predicted"] == "ham"
    assert row["score"] == pytest.approx(round(math.log(3 / 5), 6))


def test_empty_text_scores_prior(spark, fitted):
    test = spark.createDataFrame([(21, "   ")], "doc_id long, text string")
    row = CL.nb_score(test, fitted).collect()[0]
    assert row["predicted"] == "ham"
    assert row["score"] == pytest.approx(round(math.log(3 / 5), 6))


def test_scores_match_hand_computation(spark, fitted):
    # one in-vocab token, "cheap": spam tf=2, ham tf=0 (absent pair)
    # V = 10 distinct train tokens; spam tot=7, ham tot=11
    test = spark.createDataFrame([(30, "cheap")], "doc_id long, text string")
    rows = CL.nb_score(test, fitted).collect()
    assert len(rows) == 1
    v = 10.0
    spam = math.log(2 / 5) + math.log((2 + 1) / (7 + v))
    ham = math.log(3 / 5) + math.log(1 / (11 + v))
    assert spam > ham
    assert rows[0]["predicted"] == "spam"
    assert rows[0]["score"] == pytest.approx(round(spam, 6), abs=1e-6)


def test_tokenless_label_keeps_its_prior(spark):
    # a label whose whole training split tokenizes to nothing must
    # stay in class_stats (r11 ADVICE: the old inner join silently
    # dropped it, so it could never be predicted). With tot=0 its
    # default_ln is ln(alpha/(alpha*V)) = -ln(V), and an OOV-only
    # test doc falls back to priors where it competes normally.
    train = spark.createDataFrame(
        [
            (1, "   ", "blank"),
            (2, "", "blank"),
            (3, "  \t ", "blank"),
            (4, "buy cheap now", "spam"),
            (5, "hello dear friend", "ham"),
        ],
        "doc_id long, text string, label string",
    )
    fitted = CL.nb_train(train, label_col="label")
    stats = {r["label"]: r for r in fitted["class_stats"].collect()}
    assert set(stats) == {"blank", "spam", "ham"}
    v = fitted["vocab"].count()  # 6 distinct tokens, all spam/ham
    assert v == 6
    assert stats["blank"]["default_ln"] == pytest.approx(-math.log(v))
    assert stats["blank"]["prior_ln"] == pytest.approx(math.log(3 / 5))
    # OOV-only doc: every class scores its prior; "blank" (3/5) wins
    test = spark.createDataFrame(
        [(10, "zzz qqq unseen")], "doc_id long, text string"
    )
    row = CL.nb_score(test, fitted).collect()[0]
    assert row["predicted"] == "blank"
    assert row["score"] == pytest.approx(round(math.log(3 / 5), 6))


def test_model_has_only_observed_pairs(fitted):
    # the sparse decomposition must not materialize the dense V x C grid
    pairs = fitted["model"].count()
    vocab = fitted["vocab"].count()
    assert vocab == 10
    assert pairs < vocab * 2  # "spam"/"ham" share no tokens here
