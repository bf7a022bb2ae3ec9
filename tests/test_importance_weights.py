"""DSIR-style importance weights — hand-computed expectations; sf0.01
documents are oracle-checked by the driver gate (`importance_weights`)."""

import math

import pytest

from xapian_spark.pipeline.textstats import importance_weights, unigram_model


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_ratios(spark):
    # corpus: doc1="a a b", doc2="a c"; target model = doc1 only
    # p_t(a)=2/3 p_t(b)=1/3;  p_r(a)=3/5 p_r(b)=1/5 p_r(c)=1/5
    docs = _df(spark, [(1, "a a b"), (2, "a c")])
    target = unigram_model(docs.filter("doc_id = 1"))
    out = {r["doc_id"]: r for r in
           importance_weights(docs, target).collect()}
    lr_a = math.log2((2 / 3) / (3 / 5))
    lr_b = math.log2((1 / 3) / (1 / 5))
    assert out[1]["n_tokens"] == 3
    assert out[1]["log2_ratio_per_token"] == pytest.approx(
        (2 * lr_a + lr_b) / 3, abs=1e-6)
    # doc2's "c" is absent from the target vocab -> excluded
    assert out[2]["n_tokens"] == 1
    assert out[2]["log2_ratio_per_token"] == pytest.approx(lr_a, abs=1e-6)


def test_target_like_docs_score_positive(spark):
    docs = _df(spark, [
        (1, "science research theorem proof"),
        (2, "science research theorem lemma"),
        (3, "celebrity gossip fashion scandal"),
        (4, "celebrity gossip fashion awards"),
    ])
    target = unigram_model(docs.filter("doc_id <= 2"))
    out = {r["doc_id"]: r["log2_ratio_per_token"] for r in
           importance_weights(docs, target).collect()}
    assert out[1] > 0 and out[2] > 0
    # docs 3/4 share no token with the target vocab -> excluded entirely
    assert out[3] == 0.0 and out[4] == 0.0


def test_identical_models_zero_everywhere(spark):
    docs = _df(spark, [(1, "x y z"), (2, "y z x")])
    target = unigram_model(docs)
    for r in importance_weights(docs, target).collect():
        assert r["log2_ratio_per_token"] == pytest.approx(0.0, abs=1e-6)


def test_explicit_raw_model(spark):
    # raw model trained on a different corpus than the one scored
    scored = _df(spark, [(1, "a b")])
    target = unigram_model(_df(spark, [(9, "a a a b")]))   # p_t(a)=3/4
    raw = unigram_model(_df(spark, [(8, "a b b b")]))      # p_r(a)=1/4
    r = importance_weights(scored, target, raw_model=raw).collect()[0]
    expect = (math.log2((3 / 4) / (1 / 4))
              + math.log2((1 / 4) / (3 / 4))) / 2
    assert r["log2_ratio_per_token"] == pytest.approx(expect, abs=1e-6)
