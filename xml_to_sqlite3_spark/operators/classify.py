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

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .search import tokenize


def _token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, cnt) — multinomial counts per document."""
    return (
        df.select(F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


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
    toks = _token_counts(train, id_col, text_col)
    per_class = toks.join(
        train.select(F.col(id_col), F.col(label_col).alias("label")), id_col
    )
    model_tf = per_class.groupBy("token", "label").agg(F.sum("cnt").alias("tf"))
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
    n_train = train.agg(F.count(F.lit(1)).cast("double").alias("__n"))
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


def nb_score(
    test: DataFrame,
    fitted: dict[str, DataFrame],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax class per test document. Returns (id, predicted, score)
    with score rounded to 6dp (engine-portable ordering) and ties
    broken on label ascending."""
    toks = _token_counts(test, id_col, text_col)
    iv = toks.join(F.broadcast(fitted["vocab"]), "token")
    n_iv = iv.groupBy(id_col).agg(F.sum("cnt").cast("double").alias("niv"))
    adj_sums = (
        iv.join(F.broadcast(fitted["model"]), "token")
        .groupBy(id_col, "label")
        .agg(F.sum(F.col("cnt") * F.col("adj_ln")).alias("adj_sum"))
    )
    grid = test.select(F.col(id_col)).crossJoin(F.broadcast(fitted["class_stats"]))
    scored = (
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
    w = W.partitionBy(id_col).orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, F.col("label").alias("predicted"), "score")
    )
