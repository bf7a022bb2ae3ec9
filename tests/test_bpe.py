"""BPE trainer goldens (the classic Sennrich corpus), encode replay,
determinism, and truncation semantics."""

import pytest

from xapian_spark.pipeline.bpe import (
    apply_merges,
    encode_with_vocab,
    merges_df,
    train_bpe,
    vocab_pieces,
    word_counts,
)

# Sennrich et al. 2016 running example: {low:5, lower:2, newest:6,
# widest:3}. Hand-derived merge order with (count desc, pair asc)
# tie-break: (e,s):9, (es,t):9, (l,o):7, (lo,w):7.
SENNRICH = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]


def _wc_df(spark, pairs):
    return spark.createDataFrame(pairs, ["word", "count"])


def test_sennrich_merge_order(spark):
    merges = train_bpe(_wc_df(spark, SENNRICH), 4)
    assert merges == [("e", "s", 9), ("es", "t", 9), ("l", "o", 7),
                      ("lo", "w", 7)]


def test_apply_merges_oov_word(spark):
    merges = train_bpe(_wc_df(spark, SENNRICH), 4)
    # 'lowest' never appears in the corpus; merges still compose it
    assert apply_merges("lowest", merges) == ("low", "est")
    assert apply_merges("newest", merges) == ("n", "e", "w", "est")
    assert apply_merges("zzz", merges) == ("z", "z", "z")


def test_greedy_leftmost_overlap():
    # aaa with (a,a) merges the LEFT pair only
    assert apply_merges("aaa", [("a", "a", 1)]) == ("aa", "a")
    # abab with (a,b) merges both non-overlapping occurrences
    assert apply_merges("abab", [("a", "b", 1)]) == ("ab", "ab")


def test_merges_exhausted_stops_early(spark):
    merges = train_bpe(_wc_df(spark, [("ab", 1)]), 10)
    assert merges == [("a", "b", 1)]          # nothing left to merge


def test_word_counts_and_train_from_docs(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "newest widest newest")],
        ["doc_id", "text"])
    wc = {r.word: r["count"] for r in word_counts(docs).collect()}
    assert wc == {"low": 2, "lower": 1, "newest": 2, "widest": 1}
    merges = train_bpe(word_counts(docs), 2)
    assert len(merges) == 2 and all(c >= 1 for _, _, c in merges)


def test_max_words_truncation_is_deterministic(spark):
    wc = _wc_df(spark, SENNRICH)
    # top-2 by (count desc, word asc) = newest(6), low(5)
    merges = train_bpe(wc, 2, max_words=2)
    # pair counts over {newest:6, low:5} only: (e,s)/(e,w)/(n,e)/(s,t)
    # at 6 ... tie-break picks (e,s) then (es,t)
    assert merges[0][:2] == ("e", "s") and merges[0][2] == 6


def test_vocab_pieces_and_encode(spark):
    wc = _wc_df(spark, SENNRICH)
    merges = train_bpe(wc, 4)
    vocab = vocab_pieces(spark, wc, merges)
    got = {r.word: (r.pieces, r.n_pieces) for r in vocab.collect()}
    assert got["low"] == (["low"], 1)
    assert got["newest"] == (["n", "e", "w", "est"], 4)
    assert got["widest"] == (["w", "i", "d", "est"], 4)

    docs = spark.createDataFrame(
        [(1, "low newest"), (2, "widest lower low low")],
        ["doc_id", "text"])
    enc = {r.doc_id: r for r in
           encode_with_vocab(docs, vocab).collect()}
    assert (enc[1].n_words, enc[1].n_pieces) == (2, 5)
    # widest=4, lower=3 (lo w er -> l o w e r with (l,o),(lo,w) ->
    # low e r = 3), low=1, low=1
    assert (enc[2].n_words, enc[2].n_pieces) == (4, 9)
    assert enc[2].pieces_per_word == 2.25


def test_encode_oov_falls_back_to_chars(spark):
    wc = _wc_df(spark, SENNRICH)
    vocab = vocab_pieces(spark, wc, train_bpe(wc, 4))
    docs = spark.createDataFrame([(1, "qqqq low")], ["doc_id", "text"])
    row = encode_with_vocab(docs, vocab).collect()[0]
    assert (row.n_words, row.n_pieces) == (2, 5)   # 4 chars + 1 piece


def test_merges_df_shape(spark):
    df = merges_df(spark, [("e", "s", 9), ("es", "t", 9)])
    rows = df.collect()
    assert [(r["rank"], r["left"], r["right"], r["count"])
            for r in rows] == [(1, "e", "s", 9), (2, "es", "t", 9)]
    assert merges_df(spark, []).count() == 0


def test_negative_merges_raises(spark):
    with pytest.raises(ValueError):
        train_bpe(_wc_df(spark, SENNRICH), -1)
