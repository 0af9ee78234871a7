"""Corpus-curation pipelines: the composed form of the dedup and
text-analysis operators — what a training-data job actually runs.

``curate_corpus`` produces one decision row per document:
    keep=True/False + the first reason that disqualified it
        (exact_dup / near_dup / low_quality / wrong_lang)
Stages run cheapest-first (hash dedup, then quality/lang column
math, then MinHash-LSH candidates only over the survivors), so the
expensive near-dup join sees the smallest possible input — the
standard funnel shape at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup as D
from . import text as T


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.3,
    allowed_langs: tuple[str, ...] = ("en",),
    near_dup_threshold: float | None = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens: DataFrame | None = None,
    sigs: DataFrame | None = None,
) -> DataFrame:
    """Per-document keep/drop decisions.

    Returns (doc_id, keep, reason, quality_score, predicted_lang)
    where reason is NULL for kept docs. Deterministic: exact-dup
    keeper is min doc_id; near-dup drops the higher doc_id of each
    verified pair. ``near_dup_threshold=None`` skips the MinHash
    stage entirely — the cheap (hash/column-math) funnel, which is
    exactly SQL-expressible and oracle-checkable.
    """
    # quality_features / language_id emit a literal doc_id column, so
    # a custom id_col is normalized up front (and the output keeps
    # the canonical doc_id name the funnel documents)
    if id_col != "doc_id":
        docs = docs.withColumnRenamed(id_col, "doc_id")
        id_col = "doc_id"
    # All three cheap stages in ONE pass (r15): quality and language
    # are pure per-row column math and the exact-dup keeper is a
    # window over md5(text), so the old exact ⋈ quality ⋈ lang
    # three-join assembly re-scanned the corpus four times and paid
    # three join exchanges to line up rows that never left their
    # document. One projection computes the hash + both scores, and
    # the single window shuffle (by the 32-char md5, carrying two
    # small columns — never the text) attaches is_keeper (guide §2.4:
    # remove shuffles outright; §2.3: shuffle metadata, not payloads).
    # Expressions come from the operators' own shared builders
    # (T.quality_score_col / T.predicted_lang_col, the exact md5
    # window from exact_duplicates), so values are identical.
    from pyspark.sql import Window as W

    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("__text_md5"),
        T.quality_score_col(F.col(text_col)).alias("quality_score"),
        T.predicted_lang_col(F.col(text_col)).alias("predicted_lang"),
    )
    w = W.partitionBy("__text_md5")
    base = hashed.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_keeper"),
        "quality_score",
        "predicted_lang",
    )

    if near_dup_threshold is None:
        near = base.select("doc_id").limit(0)
    else:
        # base is consumed TWICE on this path (survivor filter for
        # the MinHash stage + the final decision join) — without a
        # checkpoint each consumer re-runs all three cheap stages
        # from raw text (exact hash window + quality + lang = three
        # full normalization passes, measured as curate_corpus's
        # 2.3-4.6x cost blow-up vs its parts in r5). Materialize the
        # small decision frame once; at warehouse scale this is the
        # staged funnel table every curation pipeline persists
        # between stages.
        base = base.localCheckpoint(eager=True)
        # near-dup candidates only among docs that survive the cheap
        # stages — the funnel
        survivors = base.filter(
            F.col("is_keeper")
            & (F.col("quality_score") >= min_quality)
            & F.col("predicted_lang").isin(*allowed_langs)
        ).select("doc_id")
        # materialize the survivor TEXT once: minhash_lsh_pairs
        # consumes its input more than once (shingle/banding pass +
        # the candidate-verification pass), and a lazy semi-join over
        # the raw corpus would re-run the full scan + join per
        # consumer — measured as curate_corpus's remaining ~1.3s gap
        # over the sum of its parts in r6. Projecting to (id, text)
        # keeps the checkpointed blocks minimal.
        if tokens is not None and sigs is not None:
            # persistent-store path: postings/signatures are per-doc
            # rows, so the survivor subset is a semi-join filter —
            # the funnel never re-shingles the text at all
            surv_tokens = tokens.join(survivors, "doc_id", "left_semi")
            surv_sigs = sigs.join(survivors, "doc_id", "left_semi")
            near = D.minhash_lsh_pairs(
                docs.select(id_col, text_col),
                threshold=near_dup_threshold,
                id_col=id_col,
                text_col=text_col,
                tokens=surv_tokens,
                sigs=surv_sigs,
            ).select(F.col("doc_b").alias("doc_id")).distinct()
        else:
            surviving_docs = (
                docs.select(id_col, text_col)
                .join(
                    survivors.withColumnRenamed("doc_id", id_col),
                    id_col,
                    "left_semi",
                )
                .localCheckpoint(eager=True)
            )
            near = D.minhash_lsh_pairs(
                surviving_docs,
                threshold=near_dup_threshold,
                id_col=id_col,
                text_col=text_col,
            ).select(F.col("doc_b").alias("doc_id")).distinct()

    decided = (
        base.join(near.withColumn("is_near_dup", F.lit(True)), "doc_id", "left")
        .withColumn(
            "reason",
            F.when(~F.col("is_keeper"), "exact_dup")
            .when(F.col("quality_score") < min_quality, "low_quality")
            .when(~F.col("predicted_lang").isin(*allowed_langs), "wrong_lang")
            .when(F.col("is_near_dup"), "near_dup"),
        )
        .withColumn("keep", F.col("reason").isNull())
        .select("doc_id", "keep", "reason", "quality_score", "predicted_lang")
    )
    return decided
