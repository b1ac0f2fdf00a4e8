"""Distributed BPE merge training (operators/bpe.py): hand-computed
merges, differential vs a pure-Python reference BPE, segmentation
round-trip."""

import pytest
from hypothesis import given, settings, strategies as st

from smartbots_etl_facturas_spark.operators.bpe import (
    segment_words,
    train_bpe_merges,
    word_frequency,
)


def _python_bpe(texts, num_merges, min_pair_count=2):
    """Reference implementation: Sennrich et al. 2016 algorithm on the
    word-frequency table, ties broken on (left, right)."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split() if w)
    syms = {w: [list(w), c] for w, c in wc.items()}
    merges = []
    for rank in range(num_merges):
        pairs = Counter()
        for arr, c in syms.values():
            for a, b in zip(arr, arr[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_pair_count:
            break
        merges.append((rank, l, r, l + r, n))
        for entry in syms.values():
            arr = entry[0]
            out, i = [], 0
            while i < len(arr):
                if i + 1 < len(arr) and arr[i] == l and arr[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(arr[i])
                    i += 1
            entry[0] = out
    return merges


def test_bpe_hand_computed(spark):
    """'low low low lower' : first merge must be ('l','o') (count 4),
    then ('lo','w') (count 4), then 'low' pairs."""
    df = spark.createDataFrame(
        [(1, "low low low lower")], "doc_id long, text string")
    got = [(r.rank, r.left, r.right, r.merged, r.pair_count)
           for r in train_bpe_merges(df, num_merges=3).orderBy("rank").collect()]
    assert got[0] == (0, "l", "o", "lo", 4)
    assert got[1] == (1, "lo", "w", "low", 4)
    assert got == _python_bpe(["low low low lower"], 3)


def test_bpe_greedy_leftmost_nonoverlapping(spark):
    """'aaa' merges (a,a) ONCE per occurrence walk: 'aaa' -> ['aa','a'],
    never ['a','aa'] or double-counted overlaps."""
    df = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    merges = train_bpe_merges(df, num_merges=2).orderBy("rank").collect()
    assert (merges[0].left, merges[0].right, merges[0].pair_count) == ("a", "a", 4)
    words = spark.createDataFrame([("aaa",)], "word string")
    pieces = segment_words(
        words, [(m.left, m.right) for m in merges]).collect()[0].pieces
    assert pieces == ["aaa"] or pieces == ["aa", "a"]
    # with only the first merge applied the law is exact:
    one = segment_words(words, [("a", "a")]).collect()[0].pieces
    assert one == ["aa", "a"]


_bpe_texts = st.lists(
    st.lists(st.sampled_from(["ab", "abc", "bca", "aa", "cab", "b"]),
             min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(texts=_bpe_texts, n=st.integers(1, 5))
def test_bpe_matches_python_reference(spark, texts, n):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r.rank, r.left, r.right, r.merged, r.pair_count)
           for r in train_bpe_merges(df, num_merges=n).orderBy("rank").collect()]
    assert got == _python_bpe(texts, n)


def test_segment_words_applies_merges_in_rank_order(spark, sf_dir):
    """Segmenting the training vocabulary with the learned merges
    reproduces training's final symbol state: every piece is a
    concatenation of the word's chars in order, and frequent words
    compress below character length."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = [(r.left, r.right)
              for r in train_bpe_merges(docs, num_merges=6).orderBy("rank").collect()]
    assert merges
    vocab = word_frequency(docs).orderBy("word").limit(50)
    segged = segment_words(vocab, merges).collect()
    assert segged
    compressed = 0
    for r in segged:
        assert "".join(r.pieces) == r.word
        if len(r.pieces) < len(r.word):
            compressed += 1
    assert compressed > 0


def test_bpe_empty_and_degenerate_corpora(spark):
    """Empty corpus or nothing above min_pair_count yields an EMPTY
    merge table with the declared schema, not an error."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = train_bpe_merges(empty, num_merges=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "rank", "left", "right", "merged", "pair_count"]
    # single-char words have no adjacent pairs
    chars = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    assert train_bpe_merges(chars, num_merges=3).count() == 0
    # unique pairs below min_pair_count stop the loop
    once = spark.createDataFrame([(1, "xy")], "doc_id long, text string")
    assert train_bpe_merges(once, num_merges=3, min_pair_count=2).count() == 0
    assert train_bpe_merges(once, num_merges=3, min_pair_count=1).count() >= 1
