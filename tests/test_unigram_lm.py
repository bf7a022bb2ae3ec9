"""CCNet-style unigram LM scoring (bits per token) — hand-computed
expectations; the sf0.01 documents table is oracle-checked by the
driver gate (`unigram_lm` entry in __spark_entry__)."""

import math

import pytest

from xapian_spark.pipeline.textstats import unigram_lm_scores, unigram_model


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_two_docs(spark):
    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    # doc 1 = "a a a": bpt = -log2(3/4)
    # doc 2 = "b":     bpt = -log2(1/4) = 2
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(_df(spark, [(1, "a a a"), (2, "b")])).collect()}
    assert out[1]["n_tokens"] == 3
    assert out[1]["bits_per_token"] == pytest.approx(
        -math.log2(3 / 4), abs=1e-6)
    assert out[2]["n_tokens"] == 1
    assert out[2]["bits_per_token"] == pytest.approx(2.0, abs=1e-6)


def test_uniform_corpus_equal_scores(spark):
    # 4 distinct tokens, each once -> every doc scores exactly 2 bits
    out = unigram_lm_scores(
        _df(spark, [(1, "w x"), (2, "y z")])).collect()
    for r in out:
        assert r["bits_per_token"] == pytest.approx(2.0, abs=1e-6)


def test_common_tokens_score_lower(spark):
    # doc of corpus-frequent tokens scores below a doc of hapaxes
    docs = _df(spark, [
        (1, "the the the the the the"),
        (2, "the the the aardvark zygote"),
    ])
    out = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert out[1]["bits_per_token"] < out[2]["bits_per_token"]


def test_empty_doc_zero_not_missing(spark):
    out = {r["doc_id"]: r for r in
           unigram_lm_scores(_df(spark, [(1, "a b"), (2, "")])).collect()}
    assert set(out) == {1, 2}
    assert out[2]["n_tokens"] == 0
    assert out[2]["bits_per_token"] == 0.0


def test_external_model_scores_other_corpus(spark):
    # model trained on A (a a a b: p(a)=3/4, p(b)=1/4) scores corpus B;
    # OOV tokens ("zzz") are in-vocab-only: ignored in both numerator
    # and denominator
    model = unigram_model(_df(spark, [(1, "a a a b")]))
    out = {r["doc_id"]: r for r in unigram_lm_scores(
        _df(spark, [(10, "b b"), (11, "a zzz")]), model=model).collect()}
    assert out[10]["n_tokens"] == 2
    assert out[10]["bits_per_token"] == pytest.approx(2.0, abs=1e-6)
    assert out[11]["n_tokens"] == 1
    assert out[11]["bits_per_token"] == pytest.approx(
        -math.log2(3 / 4), abs=1e-6)


def test_weighted_mean_mixed_doc(spark):
    # corpus: a a a b (doc1="a a a b"): p(a)=3/4, p(b)=1/4
    # bpt = (3*-log2(3/4) + 1*2) / 4
    r = unigram_lm_scores(_df(spark, [(1, "a a a b")])).collect()[0]
    expect = (3 * -math.log2(3 / 4) + 2.0) / 4
    assert r["n_tokens"] == 4
    assert r["bits_per_token"] == pytest.approx(expect, abs=1e-6)


# ----------------------------------------------------------- bigram LM

def test_bigram_model_counts(spark):
    from xapian_spark.pipeline.textstats import bigram_model

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    got = {(r.w1, r.w2): r.c2 for r in bigram_model(docs).collect()}
    assert got == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}


def test_bigram_lm_self_scored_hand_computed(spark):
    import math

    from xapian_spark.pipeline.textstats import bigram_lm_scores

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")], ["doc_id", "text"])
    # model: (a,b):3 (b,a):1 (b,c):1; ctx: a->3, b->2; V=3 (b,a,c)
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    got = {r.doc_id: r for r in bigram_lm_scores(docs).collect()}
    exp1 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    exp2 = -(math.log2(p_ab) + math.log2(p_bc)) / 2
    assert got[1].n_bigrams == 3
    assert math.isclose(got[1].bits_per_bigram, round(exp1, 6))
    assert math.isclose(got[2].bits_per_bigram, round(exp2, 6))
    assert (got[3].n_bigrams, got[3].bits_per_bigram) == (0, 0.0)


def test_bigram_lm_external_model_context_oov(spark):
    from xapian_spark.pipeline.textstats import (bigram_lm_scores,
                                                 bigram_model)

    train = spark.createDataFrame([(1, "a b a b")], ["doc_id", "text"])
    m = bigram_model(train)
    score = spark.createDataFrame(
        [(1, "a b z q"), (2, "q r s")], ["doc_id", "text"])
    got = {r.doc_id: r for r in
           bigram_lm_scores(score, model=m).collect()}
    # doc 1: bigrams (a,b) ctx known, (b,z) ctx b known smoothed,
    # (z,q) ctx z OOV -> excluded; n_bigrams counts the scored ones
    assert got[1].n_bigrams == 2
    # doc 2: every context OOV -> zero-filled
    assert (got[2].n_bigrams, got[2].bits_per_bigram) == (0, 0.0)


def test_bigram_word_salad_scores_higher(spark):
    from xapian_spark.pipeline.textstats import bigram_lm_scores

    fluent = "the cat sat on the mat " * 10
    salad = "mat the on cat the sat on mat cat sat the on"
    docs = spark.createDataFrame(
        [(1, fluent), (2, salad)], ["doc_id", "text"])
    got = {r.doc_id: r.bits_per_bigram for r in
           bigram_lm_scores(docs).collect()}
    assert got[2] > got[1]


# ---------------------------------------------------------- top_ngrams

def test_top_ngrams_order_and_reach(spark):
    import pytest

    from xapian_spark.pipeline.textstats import top_ngrams

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c x y"), (3, "x y z")],
        ["doc_id", "text"])
    rows = top_ngrams(docs, n=2, k=3).collect()
    assert [(r["rank"], r.gram, r["count"], r.n_docs)
            for r in rows] == [
        (1, "a b", 3, 2),      # 2 in doc1 + 1 in doc2
        (2, "b c", 3, 2),      # count tie with 'a b' -> gram asc
        (3, "x y", 2, 2),
    ]
    with pytest.raises(ValueError):
        top_ngrams(docs, n=0)


# ------------------------------------------------------ tfidf keywords

def test_tfidf_keywords_hand_case(spark):
    import math

    import pytest

    from xapian_spark.pipeline.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana cherry common"),
         (3, "cherry cherry common")], ["doc_id", "text"])
    got = {}
    for r in tfidf_keywords(docs, k=2).collect():
        got.setdefault(r.doc_id, []).append(
            (r["rank"], r.tok, r.tf, r.df, r.score))
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[1][0] == (1, "apple", 2, 1, round(2 * math.log(3), 6))
    assert got[1][1] == (2, "banana", 1, 2, round(math.log(1.5), 6))
    # doc 3: cherry tf=2 df=2 -> 2*ln(1.5); common df=3 -> score 0
    assert got[3][0][1] == "cherry"
    assert got[3][1] == (2, "common", 1, 3, 0.0)
    with pytest.raises(ValueError):
        tfidf_keywords(docs, k=0)


def test_tfidf_tie_breaks_to_smaller_token(spark):
    from xapian_spark.pipeline.textstats import tfidf_keywords

    docs = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "other words")], ["doc_id", "text"])
    rows = [r for r in tfidf_keywords(docs, k=2).collect()
            if r.doc_id == 1]
    assert [r.tok for r in sorted(rows, key=lambda r: r["rank"])] \
        == ["alpha", "zeta"]


# --------------------------------------------------------- ccnet split

def test_ccnet_buckets_rank_thresholds(spark):
    import pytest

    from xapian_spark.pipeline.textstats import ccnet_buckets

    # 6 docs with strictly increasing rarity -> increasing bpt
    rows = [(1, "a a a a"), (2, "a a a b"), (3, "a a b b"),
            (4, "a b b c"), (5, "b c d e"), (6, "e f g h")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.bucket for r in ccnet_buckets(docs).collect()}
    # ranks floor(1/3*5)=1, floor(2/3*5)=3 -> thresholds at sorted
    # positions 1 and 3; <=: docs at ranks 0,1 head; 2,3 middle; rest tail
    order = [r.doc_id for r in sorted(
        ccnet_buckets(docs).collect(),
        key=lambda r: (r.bits_per_token, r.doc_id))]
    assert [got[d] for d in order] == [
        "head", "head", "middle", "middle", "tail", "tail"]
    with pytest.raises(ValueError):
        ccnet_buckets(docs, fractions=(0.9, 0.1))


def test_ccnet_buckets_explicit_thresholds(spark):
    from xapian_spark.pipeline.textstats import ccnet_buckets

    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "z q w x")], ["doc_id", "text"])
    # corpus: a:4, z/q/w/x:1 each (total 8) -> doc1 bpt = 1.0,
    # doc2 bpt = -log2(1/8) = 3.0
    got = {r.doc_id: r.bucket for r in
           ccnet_buckets(docs, thresholds=[1.0, 2.5]).collect()}
    assert got == {1: "head", 2: "tail"}


def test_ccnet_buckets_empty_corpus(spark):
    from xapian_spark.pipeline.textstats import ccnet_buckets

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = ccnet_buckets(empty)
    assert out.count() == 0
    assert out.columns == ["doc_id", "n_tokens", "bits_per_token",
                           "bucket"]
