"""BPE tokenizer induction: greedy-merge correctness on hand-checkable
corpora, multi-merge segmentation vs a pure-Python reference, the
driver-collect guard, and layout independence.
"""

from __future__ import annotations

import pytest

from laygo_python_spark.operators.bpe import bpe_segment, bpe_train, pair_counts, word_counts


def _segment_ref(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_train_classic_example(spark):
    # Sennrich et al.'s illustrative corpus: 'es' is the most frequent
    # pair (newest x6 + widest x3 = 9), then 'est' fuses, then 'lo'.
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    df = spark.createDataFrame([(0, " ".join(corpus))], "doc_id long, text string")
    merges = bpe_train(df, n_merges=3)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("l", "o")


def test_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame([(0, "ab ab ab cd")], "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in pair_counts(df).collect()}
    assert got == {"ab": 3, "cd": 1}


def test_pair_counts_single_char_words_have_no_pairs(spark):
    # Spark's sequence(1, 0) counts DOWN — unguarded, 1-char words
    # fabricated bogus pairs (caught by the oracle gate r9).
    df = spark.createDataFrame([(0, "a a a bc")], "doc_id long, text string")
    got = {r["pair"]: r["n"] for r in pair_counts(df).collect()}
    assert got == {"bc": 1}


def test_bpe_segment_matches_python_reference(spark):
    corpus = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    rows = [(i, " ".join(corpus[i:] + corpus[:i])) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(df, n_merges=4)
    got = {r["doc_id"]: r["n_tokens"] for r in bpe_segment(df, merges).collect()}
    for i, text in rows:
        want = sum(len(_segment_ref(w, merges)) for w in text.split(" "))
        assert got[i] == want, (i, merges)


def test_bpe_segment_repeated_chars_left_to_right(spark):
    # 'aaaa' under merge (a,a): left-to-right non-overlapping -> [aa][aa],
    # 'aaa' -> [aa][a] — the greedy semantics both trainer and segmenter use.
    df = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    got = bpe_segment(df, [("a", "a")]).collect()[0]["n_tokens"]
    assert got == 2 + 2


def test_bpe_train_vocab_guard(spark):
    df = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    with pytest.raises(ValueError, match="distinct"):
        bpe_train(df, n_merges=1, max_vocab=3)


def test_bpe_train_layout_independent(spark, sf_dir):
    from laygo_python_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents")
    a = bpe_train(docs, n_merges=3)
    b = bpe_train(docs.repartition(17), n_merges=3)
    assert a == b and len(a) == 3


def test_word_counts_min_count_prunes_tail(spark):
    df = spark.createDataFrame([(0, "x x x y")], "doc_id long, text string")
    got = {r["word"]: r["n"] for r in word_counts(df, min_count=2).collect()}
    assert got == {"x": 3}
