"""BPE trainer vs an independent pure-python reference (Sennrich
et al. 2016 learn_bpe), and the encoder's merge-application rule."""

from __future__ import annotations

from collections import Counter

from xml_to_sqlite3_spark.operators.text import (
    _merge_pair_in_symbols,
    apply_bpe,
    train_bpe,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest",
]


def _ref_bpe(texts, n_merges, min_pair_count=2):
    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(list(w) + ["</w>"])] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        # max count, lexicographic tie-break — must match the Spark argmax
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((l, r, n))
        vocab = Counter(
            {
                tuple(_merge_pair_in_symbols(list(sym), l, r)): c
                for sym, c in vocab.items()
            }
        )
    return merges


def test_train_bpe_matches_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in train_bpe(df, n_merges=10).orderBy("rank").collect()
    ]
    want = _ref_bpe(CORPUS, 10)
    assert got == want, (got, want)


def test_apply_bpe_segments_with_learned_merges(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    merges = [
        (r["left"], r["right"])
        for r in train_bpe(df, n_merges=10).orderBy("rank").collect()
    ]
    out = {r["doc_id"]: r for r in apply_bpe(df, merges).collect()}
    # re-derive one doc by hand with the same merge rule
    toks = []
    for w in CORPUS[0].lower().split():
        sym = list(w) + ["</w>"]
        for l, r in merges:
            sym = _merge_pair_in_symbols(sym, l, r)
        toks.extend(sym)
    assert out[0]["tokens"] == toks
    assert out[0]["n_bpe_tokens"] == len(toks)
    # 'low</w>' x5 in doc 0 should have merged into few symbols
    assert out[0]["n_bpe_tokens"] < 5 * 4


def test_merge_rule_non_overlapping():
    assert _merge_pair_in_symbols(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_pair_in_symbols(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _merge_pair_in_symbols(["x"], "a", "b") == ["x"]
