"""Multinomial Naive Bayes text classifier — the fastText-style
linear classifier slot in a training-data curation pipeline (domain /
language / quality routing), chosen because its training IS a
relational aggregation: per-(label, token) counts with Laplace
smoothing, one groupBy, fully map-side-combinable — so both training
and scoring stay declarative, distributed, and value-oracle-checkable
in plain SQL (no SGD, no float-order-dependent iteration).

Scoring uses the standard sparse decomposition: for document d and
class c,

    score(d, c) = ln P(c)
                + n_iv(d) * ln(alpha / (tot_c + alpha * V))
                + sum over observed (t, c) of cnt_t * ln((tf_tc + alpha) / alpha)

where n_iv(d) counts d's tokens that appear anywhere in the training
vocabulary (OOV tokens drop out of every class identically, so they
cannot change the argmax). The third term joins only OBSERVED
(token, class) pairs — the model never materializes the dense
V x C grid.

Scale shape: training = explode + two partial-agg groupBys; scoring
= one broadcast join of the model against the exploded test tokens +
a C-row crossJoin for the class grid. Nothing iterative, nothing
driver-side; at 100 TB the model (observed vocab x class pairs)
either broadcasts or falls back to a shuffle equi-join on token.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _token_counts_udf():
    """Vectorized per-document multinomial counts:
    array<struct<token, cnt>> per text, byte-identical tokens to
    search.tokenize (collapse JVM-\\s+ → trim spaces → lower → split
    → drop empties; the shingles_udf ASCII-whitespace discipline).

    The r14 UDF boundary rule says UDF-ify a HOF only when the batch
    REDUCES inside the UDF — it does here: duplicate tokens collapse
    to (token, cnt) pairs IN the row, which is what lets the callers
    drop the corpus-wide groupBy(id, token) shuffle entirely (the
    per-document aggregation never needed to leave the document).

    r16: kept only as the A/B twin of the native occurrence path
    below (SPARK_GRAFT_NB_ARROW=1 re-enables it for measurement);
    see _token_occurrences for why native won."""
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @F.pandas_udf("array<struct<token: string, cnt: long>>")
    def counts(texts: pd.Series) -> pd.Series:
        from collections import Counter

        out = []
        for t in texts:
            if t is None:
                out.append([])
                continue
            words = ws.sub(" ", t).strip(" ").lower().split(" ")
            c = Counter(words)
            c.pop("", None)
            out.append(list(c.items()))
        return pd.Series(out)

    return counts


def _use_arrow_tokens() -> bool:
    import os

    return os.environ.get("SPARK_GRAFT_NB_ARROW") == "1"


def _token_occurrences(
    df: DataFrame, id_col: str, text_col: str, *extra_cols: str
) -> DataFrame:
    """One row per token OCCURRENCE: (``id_col``, *extra, token) —
    the fully native tokenizing projection (search.tokenize: collapse
    \\s+ → trim → lower → split → drop empties; explode drops
    null-text docs exactly like the Arrow twin's empty array).

    r16 (VERDICT r15 item 5): every NB consumer of the old per-row
    (token, cnt) pairs immediately AGGREGATES on keys coarser than
    (doc, token) — (token, label) for training, (doc) / (doc, label)
    for scoring — and those aggregations partial-reduce map-side. So
    the per-document pre-counting never saved shuffle bytes that the
    partial aggregation wasn't already saving; it only added an
    ArrowEvalPython boundary (serialize every text to Python and the
    pairs back). Emitting raw occurrences keeps the whole path in
    WholeStageCodegen with ZERO Python stages and the same exchanges."""
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in extra_cols],
        F.explode(
            F.filter(
                F.split(
                    F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))),
                    " ",
                ),
                lambda t: t != "",
            )
        ).alias("token"),
    )


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, cnt) — multinomial counts per document. A/B twin
    retained for tests that exercise the per-document counting shape
    directly (the gates consume _token_occurrences)."""
    if not _use_arrow_tokens():
        return (
            _token_occurrences(df, id_col, text_col)
            .groupBy(id_col, "token")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
    return df.select(
        F.col(id_col),
        F.explode(_token_counts_udf()(F.col(text_col))).alias("tc"),
    ).select(id_col, F.col("tc.token").alias("token"), F.col("tc.cnt").alias("cnt"))


def nb_train(
    train: DataFrame,
    label_col: str = "label",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
) -> dict[str, DataFrame]:
    """Fit the model. Returns three small DataFrames:

    - ``model``:       (token, label, adj_ln) for observed pairs,
                       adj_ln = ln((tf + alpha) / alpha)
    - ``class_stats``: (label, prior_ln, default_ln)
    - ``vocab``:       (token) — the training vocabulary
    """
    # label rides the tokenizing projection (it lives on the same
    # row), so the old toks ⋈ train join on id — a full shuffle of
    # the token counts just to re-attach a column they started next
    # to — is gone (r15, guide §2.4); the only exchange left in the
    # tf build is the (token, label) aggregation itself.
    # r16: raw occurrences, fully native (see _token_occurrences) —
    # the (token, label) aggregation partial-reduces map-side, so the
    # per-document Arrow pre-count saved nothing it wasn't already
    # saving while costing the Python boundary; sum(cnt) over
    # per-doc counts == count(*) over occurrences (exact integers).
    if _use_arrow_tokens():
        per_class = train.select(
            F.col(label_col).alias("label"),
            F.explode(_token_counts_udf()(F.col(text_col))).alias("tc"),
        ).select(
            "label", F.col("tc.token").alias("token"), F.col("tc.cnt").alias("cnt")
        )
        model_tf = per_class.groupBy("token", "label").agg(
            F.sum("cnt").alias("tf")
        )
    else:
        occ = _token_occurrences(
            train.select(F.col(label_col).alias("label"), F.col(text_col)),
            "label",
            text_col,
        )
        model_tf = occ.groupBy("token", "label").agg(
            F.count(F.lit(1)).alias("tf")
        )
    model = model_tf.select(
        "token",
        "label",
        (F.log(F.col("tf") + F.lit(alpha)) - F.log(F.lit(alpha))).alias("adj_ln"),
    )
    vocab = model_tf.select("token").distinct()
    # V is a 1-row aggregate kept inside the plan (no collect) — the
    # same broadcast-scalar pattern as bm25_search's corpus stats.
    vsize = vocab.agg(F.count(F.lit(1)).cast("double").alias("__v"))
    class_tot = model_tf.groupBy("label").agg(
        F.sum("tf").cast("double").alias("tot")
    )
    class_docs = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("double").alias("nd")
    )
    # n_train = Σ nd exactly (count(*) partitioned by label sums to
    # count(*)), re-aggregated from the model-sized class_docs
    # instead of a second full corpus scan (r15, guide §1.2-1)
    n_train = class_docs.agg(F.sum("nd").alias("__n"))
    # LEFT join + coalesce(tot, 0): a label whose whole training split
    # tokenizes to nothing (empty/whitespace text) has no model_tf rows
    # — an inner join would silently drop its prior so it could never
    # be predicted. With tot=0 its default_ln collapses to
    # ln(alpha/(alpha*V)) = -ln(V) and it still competes on prior.
    class_stats = (
        class_docs.join(class_tot, "label", "left")
        .crossJoin(F.broadcast(vsize))
        .crossJoin(F.broadcast(n_train))
        .select(
            "label",
            (F.log("nd") - F.log("__n")).alias("prior_ln"),
            (
                F.log(F.lit(alpha))
                - F.log(
                    F.coalesce(F.col("tot"), F.lit(0.0))
                    + F.lit(alpha) * F.col("__v")
                )
            ).alias("default_ln"),
        )
    )
    return {"model": model, "class_stats": class_stats, "vocab": vocab}


def _nb_scored_grid(
    test: DataFrame,
    fitted: dict[str, DataFrame],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """The full (id, label, score) class grid — shared by the argmax
    scorer and the probability path so the two can never diverge."""
    # r16: raw native occurrences (see _token_occurrences). n_iv is
    # an exact integer either way (Σ cnt == count of occurrences);
    # adj_sum sums adj_ln per occurrence instead of cnt·adj_ln per
    # distinct (doc, token) — same quantity, different float add
    # order, absorbed by the 6dp score rounding exactly like Spark's
    # own partition-order nondeterminism (oracle-verified at both
    # test SFs).
    if _use_arrow_tokens():
        toks = _token_counts(test, id_col, text_col)
        iv = toks.join(F.broadcast(fitted["vocab"]), "token")
        n_iv = iv.groupBy(id_col).agg(F.sum("cnt").cast("double").alias("niv"))
        adj_sums = (
            iv.join(F.broadcast(fitted["model"]), "token")
            .groupBy(id_col, "label")
            .agg(F.sum(F.col("cnt") * F.col("adj_ln")).alias("adj_sum"))
        )
    else:
        occ = _token_occurrences(test, id_col, text_col)
        iv = occ.join(F.broadcast(fitted["vocab"]), "token")
        n_iv = iv.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("double").alias("niv")
        )
        adj_sums = (
            iv.join(F.broadcast(fitted["model"]), "token")
            .groupBy(id_col, "label")
            .agg(F.sum("adj_ln").alias("adj_sum"))
        )
    grid = test.select(F.col(id_col)).crossJoin(F.broadcast(fitted["class_stats"]))
    return (
        grid.join(n_iv, id_col, "left")
        .join(adj_sums, [id_col, "label"], "left")
        .select(
            id_col,
            "label",
            F.round(
                F.col("prior_ln")
                + F.coalesce(F.col("niv"), F.lit(0.0)) * F.col("default_ln")
                + F.coalesce(F.col("adj_sum"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
    )


def nb_score(
    test: DataFrame,
    fitted: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax class per test document. Returns (id, predicted, score)
    with score rounded to 6dp (engine-portable ordering) and ties
    broken on label ascending."""
    scored = _nb_scored_grid(test, fitted, id_col, text_col)
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )


def nb_score_proba(
    test: DataFrame,
    fitted: dict[str, DataFrame],
    target: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Softmax probability of ONE target class per test document —
    the calibrated-score view a curation pipeline thresholds on
    (keep-if-P(quality) ≥ τ) and the input to :func:`binary_auc` /
    :func:`calibration_bins`. Returns (id, prob), prob rounded 6dp.

    Numerically: p = exp(s_t − m) / Σ_c exp(s_c − m) with m the
    per-doc max score (the standard log-sum-exp guard). The exp
    terms are round(·, 9)→DECIMAL(18,9) before the C-way sum — the
    lm_quality discipline — so the reduction is order-independent
    and a DuckDB replay is bit-exact despite float exp. One window
    (partition by id over C rows) + one groupBy; nothing
    corpus-quadratic."""
    # fail LOUD on a target absent from the trained classes (typo /
    # case mismatch / class missing from the training split): the
    # max(when(...)) below would otherwise return NULL for EVERY doc,
    # silently poisoning downstream AUC/calibration. class_stats is
    # model-sized, so this eager check is one tiny collect (the
    # binary_auc check_nonempty laziness note applies).
    labels = [r["label"] for r in fitted["class_stats"].select("label").collect()]
    if target not in labels:
        raise ValueError(
            f"nb_score_proba: target {target!r} is not a trained class "
            f"(trained: {sorted(labels)})"
        )
    scored = _nb_scored_grid(test, fitted, id_col, text_col)
    w = W.partitionBy(id_col)
    ex = scored.withColumn("__mx", F.max("score").over(w)).select(
        id_col,
        "label",
        F.round(F.exp(F.col("score") - F.col("__mx")), 9)
        .cast("decimal(18,9)")
        .alias("__e"),
    )
    return (
        ex.groupBy(id_col)
        .agg(
            F.round(
                F.max(
                    F.when(F.col("label") == target, F.col("__e"))
                ).cast("double")
                / F.sum("__e").cast("double"),
                6,
            ).alias("prob")
        )
    )


def binary_auc(
    df: DataFrame,
    label_col: str = "label",
    score_col: str = "prob",
    check_nonempty: bool = True,
) -> DataFrame:
    """Exact ROC-AUC of a binary classifier via the Mann–Whitney
    rank statistic with proper tie handling — the evaluation step a
    quality-router pipeline runs before trusting a threshold.
    ``label_col`` is 0/1 (or boolean); ``score_col`` is any ranking
    score. Returns ONE row (n_pos, n_neg, auc), auc rounded 6dp.

    AUC = P(s_pos > s_neg) + ½·P(s_pos = s_neg), computed as
    (2·Σ_s pos_s·cumneg_<s + Σ_s pos_s·neg_s) / (2·P·N) — EXACT
    arithmetic until the single final division, so the DuckDB replay
    is bit-exact. The products and their sums run in DECIMAL(38,0),
    not long: at ~2·10⁹ rows per class the long form 2·P·N (and the
    per-score pos·cumneg sums) exceeds Long.MAX and would wrap
    SILENTLY under non-ANSI mode; decimal-38 carries exact integers
    to ~10³⁸, enough for ~3·10¹⁸ rows per class. NULL labels are
    EXCLUDED up front (no ground truth, no evidence — the
    embedding_covariance null-vector contract): counting them as
    negatives via n − pos would silently score unlabeled rows.
    Scale shape: one map-side-combinable groupBy on the DISTINCT
    score value, then a window over distinct scores — which is
    BOUNDED at any corpus size when scores carry fixed-precision
    rounding (a 6dp probability grid has ≤ 10⁶+1 distinct values),
    the same bounded-key-space argument as the histogram operators.
    For unrounded continuous scores, round first. NULL SCORES are
    excluded like NULL labels (no prediction, no evidence) — and the
    exclusion keeps engine parity, since Spark windows order NULLs
    first while DuckDB orders them last.

    NOTE (laziness, the psi/ks precedent): ``check_nonempty=True``
    eagerly materializes the BOUNDED distinct-score relation
    (localCheckpoint) and runs the guard on it, so the expensive
    upstream pipeline (e.g. the full NB scoring DAG) evaluates ONCE —
    the guard and the returned AUC plan both read the checkpoint.
    """
    y = F.col(label_col).cast("long")
    labeled = df.filter(
        F.col(label_col).isNotNull() & F.col(score_col).isNotNull()
    )
    g = (
        labeled.select(F.col(score_col).alias("s"), y.alias("y"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("pos"))
        .withColumn("neg", F.col("n") - F.col("pos"))
    )
    if check_nonempty:
        g = g.localCheckpoint(eager=True)
        tot = g.agg(
            F.sum("pos").alias("p"), F.sum("neg").alias("n")
        ).collect()[0]
        if not tot["p"] or not tot["n"]:
            raise ValueError(
                f"binary_auc: need both classes present, got "
                f"{tot['p'] or 0} positives / {tot['n'] or 0} negatives "
                "— AUC is undefined (pass check_nonempty=False to defer "
                "to an evaluation-time error)"
            )
    w = W.orderBy("s").rowsBetween(W.unboundedPreceding, -1)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    cum = g.withColumn(
        "cumneg", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return cum.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        F.sum("neg").cast("long").alias("n_neg"),
        F.round(
            (
                F.lit(2) * F.sum(dec(F.col("pos")) * dec(F.col("cumneg")))
                + F.sum(dec(F.col("pos")) * dec(F.col("neg")))
            ).cast("double")
            / (
                F.lit(2) * dec(F.sum("pos")) * dec(F.sum("neg"))
            ).cast("double"),
            6,
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    label_col: str = "label",
    prob_col: str = "prob",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic binary classifier:
    equal-width bins over [0, 1], per-bin count, mean predicted
    probability, and observed positive fraction — what a pipeline
    reads to decide whether the router's probabilities can gate
    thresholds directly or need recalibration. Returns
    (bin, n, mean_prob, frac_pos) ordered by bin; empty bins are
    absent (their calibration is undefined).

    Pure map + one combinable groupBy — no windows, no joins; the
    mean_prob numerator sums round(p, 9)→DECIMAL so the reduction is
    order-independent and the DuckDB replay bit-exact. NULL labels
    and NULL probs are EXCLUDED (the binary_auc contract): counting
    unlabeled rows via sum-skips-null / count-includes-null would
    silently deflate frac_pos and read a calibrated router as
    overconfident."""
    if n_bins < 1:
        raise ValueError(f"calibration_bins: n_bins must be >= 1, got {n_bins}")
    p = F.col(prob_col)
    b = F.least(
        F.floor(p * F.lit(n_bins)).cast("int"), F.lit(n_bins - 1)
    ).alias("bin")
    return (
        df.filter(F.col(label_col).isNotNull() & p.isNotNull())
        .select(
            b,
            F.round(p, 9).cast("decimal(18,9)").alias("__p"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum("__p").cast("double") / F.count(F.lit(1)), 6
            ).alias("mean_prob"),
            F.round(F.sum("__y") / F.count(F.lit(1)).cast("double"), 6).alias(
                "frac_pos"
            ),
        )
        .orderBy("bin")
    )
