"""Text-analysis operators for a training-data pipeline.

All hot-path operators are pure Column expressions (JVM-side,
whole-stage codegen) — no Python UDFs. Each has an exact SQL mirror
in plans/llm_pipeline.py so the driver's DuckDB gate checks values.

The reference's roadmap explicitly targets this post-processing
("generating embeddings", "FTS indexes", "vectorisation of node
content" — /root/reference/README.md Roadmap); these operators are
that surface, built Spark-first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny fixed stopword lists — deterministic, mirrored in SQL.
STOPWORDS_EN = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")
STOPWORDS_ES = ("el", "la", "de", "que", "y", "en", "un", "es", "no", "por")
STOPWORDS_FR = ("le", "les", "de", "et", "un", "une", "pour", "dans", "ce", "sur")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "von", "mit", "den", "im", "ein")

_BPE_ISH = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def ws_tokens(text: Column) -> Column:
    """Whitespace tokenization."""
    return F.split(F.trim(text), r"\s+")


def ws_token_count(text: Column) -> Column:
    return F.size(ws_tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-flavored proxy count: alpha runs count 1, digits count 1
    each, punctuation 1 each — the classic 'words + digits +
    symbols' pre-tokenizer shape."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_ISH), F.lit(0)))


def stopword_hits(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens in a fixed word list (codegen'd higher-order
    filter — no Python in the path)."""
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def punct_count(text: Column) -> Column:
    return F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score.

    Score: normalized length (cap 1.0 at 2000 chars) * 0.3
         + (1 - punct_ratio capped) * 0.3
         + stopword_ratio (EN) capped at 0.5, scaled * 0.4 —
    a simple, deterministic heuristic in the Gopher/C4-rule spirit.
    """
    text = F.col(text_col)
    toks = ws_tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    punct_ratio = punct_count(text) / F.greatest(n_chars, F.lit(1))
    stop_ratio = stopword_hits(toks, STOPWORDS_EN) / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_chars / F.lit(2000.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 2, F.lit(1.0)) * 0.4
    )
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language heuristic: CJK characters force zh;
    otherwise argmax of per-language stopword hits with the fixed
    tie-break order en > es > fr > de; zero hits => 'und'."""
    text = F.col(text_col)
    toks = ws_tokens(F.lower(text))
    hits = {
        "en": stopword_hits(toks, STOPWORDS_EN),
        "es": stopword_hits(toks, STOPWORDS_ES),
        "fr": stopword_hits(toks, STOPWORDS_FR),
        "de": stopword_hits(toks, STOPWORDS_DE),
    }
    has_cjk = text.rlike(r"[一-鿿]")
    pred = (
        F.when(has_cjk, F.lit("zh"))
        .when(
            (hits["en"] + hits["es"] + hits["fr"] + hits["de"]) == 0, F.lit("und")
        )
        .when(
            (hits["en"] >= hits["es"]) & (hits["en"] >= hits["fr"]) & (hits["en"] >= hits["de"]),
            F.lit("en"),
        )
        .when((hits["es"] >= hits["fr"]) & (hits["es"] >= hits["de"]), F.lit("es"))
        .when(hits["fr"] >= hits["de"], F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return df.select(
        "doc_id",
        pred.alias("predicted_lang"),
        hits["en"].alias("hits_en"),
        hits["es"].alias("hits_es"),
        hits["fr"].alias("hits_fr"),
        hits["de"].alias("hits_de"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:
    - full_md5: md5 of whitespace-normalized lowercase text
    - min_shingle_md5: min md5 over word 3-gram shingles (a 1-hash
      MinHash — the rolling-hash fingerprint generalization)."""
    text = F.col(text_col)
    norm = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    words = F.split(norm, " ")
    n = F.size(words)
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(words, i, F.lit(3))),
    )
    return df.select(
        "doc_id",
        F.md5(norm).alias("full_md5"),
        F.array_min(F.transform(shingles, F.md5)).alias("min_shingle_md5"),
    )
