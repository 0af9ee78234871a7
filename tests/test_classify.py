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


class TestBinaryEval:
    """AUC + calibration (r15): exact Mann-Whitney with tie handling
    against a brute-force pair-counting replica; softmax probabilities
    against a python replica; calibration bin edges."""

    def test_auc_matches_pair_counting_with_ties(self, spark):
        import itertools

        rows = [
            (1, 0.9, 1), (2, 0.8, 1), (3, 0.8, 0), (4, 0.7, 0),
            (5, 0.7, 1), (6, 0.7, 0), (7, 0.3, 0), (8, 0.3, 1),
            (9, 0.1, 0), (10, 0.9, 1),
        ]
        df = spark.createDataFrame(rows, "id long, prob double, label int")
        got = CL.binary_auc(df, label_col="label", score_col="prob").collect()[0]
        pos = [p for _, p, y in rows if y == 1]
        neg = [p for _, p, y in rows if y == 0]
        num = sum(
            1.0 if sp > sn else (0.5 if sp == sn else 0.0)
            for sp, sn in itertools.product(pos, neg)
        )
        want = round(num / (len(pos) * len(neg)), 6)
        assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
        assert got["auc"] == pytest.approx(want, abs=1e-9)

    def test_auc_degenerate_and_perfect(self, spark):
        perfect = spark.createDataFrame(
            [(1, 0.9, 1), (2, 0.8, 1), (3, 0.2, 0), (4, 0.1, 0)],
            "id long, prob double, label int",
        )
        assert CL.binary_auc(perfect).collect()[0]["auc"] == 1.0
        inverted = spark.createDataFrame(
            [(1, 0.1, 1), (2, 0.9, 0)], "id long, prob double, label int"
        )
        assert CL.binary_auc(inverted).collect()[0]["auc"] == 0.0
        one_class = spark.createDataFrame(
            [(1, 0.5, 1), (2, 0.6, 1)], "id long, prob double, label int"
        )
        with pytest.raises(ValueError, match="both classes"):
            CL.binary_auc(one_class)

    def test_auc_excludes_null_labels(self, spark):
        """Review fix r15: NULL labels are unlabeled rows, not
        negatives — they must not enter the AUC (counting them via
        n - pos silently scored rows with no ground truth)."""
        with_nulls = spark.createDataFrame(
            [(1, 0.9, 1), (2, 0.8, 0), (3, 0.95, None), (4, 0.05, None)],
            "id long, prob double, label int",
        )
        clean = spark.createDataFrame(
            [(1, 0.9, 1), (2, 0.8, 0)], "id long, prob double, label int"
        )
        a = CL.binary_auc(with_nulls).collect()[0]
        b = CL.binary_auc(clean).collect()[0]
        assert (a["n_pos"], a["n_neg"], a["auc"]) == (
            b["n_pos"], b["n_neg"], b["auc"],
        )
        # all-null labels -> both-classes guard fires
        only_nulls = spark.createDataFrame(
            [(1, 0.5, None)], "id long, prob double, label int"
        )
        with pytest.raises(ValueError, match="both classes"):
            CL.binary_auc(only_nulls)

    def test_proba_unknown_target_raises(self, spark, fitted):
        """Review fix r15: a target absent from the trained classes
        would silently produce NULL probs for every document."""
        test = spark.createDataFrame(
            [(10, "buy cheap")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="not a trained class"):
            CL.nb_score_proba(test, fitted, target="SPAM")

    def test_proba_matches_python_softmax(self, spark, fitted):
        import math as _m

        test = spark.createDataFrame(
            [(10, "buy cheap"), (11, "hello meeting"), (12, "zzz qqq")],
            "doc_id long, text string",
        )
        scored = {
            (r["doc_id"], r["label"]): r["score"]
            for r in CL._nb_scored_grid(test, fitted, "doc_id", "text").collect()
        }
        got = {
            r["doc_id"]: r["prob"]
            for r in CL.nb_score_proba(test, fitted, target="spam").collect()
        }
        for d in (10, 11, 12):
            ss = {lb: s for (dd, lb), s in scored.items() if dd == d}
            mx = max(ss.values())
            es = {lb: round(_m.exp(s - mx), 9) for lb, s in ss.items()}
            want = round(es["spam"] / sum(es.values()), 6)
            assert got[d] == pytest.approx(want, abs=1e-9), d
        # probabilities are probabilities
        assert all(0.0 <= p <= 1.0 for p in got.values())

    def test_calibration_bins_edges(self, spark):
        rows = [
            (1, 0.0, 0), (2, 0.05, 0), (3, 0.1, 0), (4, 0.95, 1),
            (5, 1.0, 1), (6, 0.55, 1), (7, 0.55, 0),
        ]
        df = spark.createDataFrame(rows, "id long, prob double, label int")
        out = {r["bin"]: r for r in CL.calibration_bins(df).collect()}
        # 0.0 and 0.05 -> bin 0; 0.1 -> bin 1; 1.0 clamps into bin 9
        assert out[0]["n"] == 2 and out[0]["frac_pos"] == 0.0
        assert out[1]["n"] == 1
        assert out[9]["n"] == 2 and out[9]["frac_pos"] == 1.0
        assert out[5]["n"] == 2 and out[5]["frac_pos"] == 0.5
        assert out[5]["mean_prob"] == pytest.approx(0.55)
        assert set(out) == {0, 1, 5, 9}  # empty bins absent
        with pytest.raises(ValueError, match="n_bins"):
            CL.calibration_bins(df, n_bins=0)


def test_nb_auc_null_lang_oracle_parity(spark, tmp_path):
    """Review fix r15: a NULL-lang held-out row must be excluded by
    BOTH the Spark plan (NULL label -> binary_auc drops it) and the
    oracle (WHERE d.lang IS NOT NULL) — otherwise the oracle counts
    it as a negative and the gate mismatches on correct code. Plants
    NULL langs in the vec_id%5==0 stratum and pins hash parity for
    both gates (same latent class as the covariance-null fix)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.oracle_harness import compare
    from xml_to_sqlite3_spark.plans.llm_pipeline import (
        NB_AUC_ORACLE,
        NB_CALIBRATION_ORACLE,
        nb_auc,
        nb_calibration,
    )

    langs = ["en", "de", "es"]
    rows = []
    for i in range(60):
        lang = None if i in (10, 25) else langs[i % 3]
        word = {"en": "hello", "de": "hallo", "es": "hola", None: "mmm"}[lang]
        rows.append((i, f"{word} document number {i} common words", lang))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    ok, detail = compare(nb_auc(spark, str(tmp_path)), NB_AUC_ORACLE, str(tmp_path))
    assert ok, detail
    ok, detail = compare(
        nb_calibration(spark, str(tmp_path)), NB_CALIBRATION_ORACLE, str(tmp_path)
    )
    assert ok, detail
