"""xapian-letor analog: 19-feature extraction + ListNet training."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from xapian_spark.index.build import build_index
from xapian_spark.query import ops
from xapian_spark.query.executor import Enquire
from xapian_spark.query.letor import (
    N_FEATURES, extract_features, listnet_loss, listnet_train,
    rank_with_model,
)


@pytest.fixture(scope="module")
def letor_setup(spark):
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"),
         (3, "apple apple apple banana"), (4, "durian")],
        "doc_id long, text string")
    idx = build_index(docs, analyzer="simple")
    return idx


def test_feature_values_hand_computed(letor_setup):
    idx = letor_setup
    feats = {r["doc_id"]: r for r in
             extract_features(idx, ["apple", "banana"]).collect()}
    assert set(feats) == {1, 2, 3}
    # no 'S'-prefixed terms → all title features are 0, body == whole
    for d, r in feats.items():
        assert r["f1"] == 0.0 and r["f4"] == 0.0 and r["f7"] == 0.0
        assert r["f2"] == pytest.approx(r["f3"], rel=1e-12)
    # f3 (whole) for doc 1: log10(1+2) + log10(1+1)
    assert feats[1]["f3"] == pytest.approx(
        math.log10(3) + math.log10(2), rel=1e-12)
    # f6 = Σ log10(1 + tf/doclen)
    assert feats[1]["f6"] == pytest.approx(
        math.log10(1 + 2 / 3) + math.log10(1 + 1 / 3), rel=1e-12)
    # f9 = Σ log10(1 + idf); idf = log10(N // (1 + df)) (integer div)
    idf_apple = math.log10(4 // 3)   # = log10(1) = 0
    idf_banana = math.log10(4 // 4)  # = 0
    assert feats[1]["f9"] == pytest.approx(
        math.log10(1 + idf_apple) + math.log10(1 + idf_banana),
        rel=1e-12)


def test_f19_is_retrieval_weight(letor_setup):
    idx = letor_setup
    enq = Enquire(idx)
    mset = enq.get_mset(ops.Or([ops.Term("apple"),
                                ops.Term("banana")]), 0, 10)
    feats = extract_features(idx, ["apple", "banana"],
                             weight_df=mset).collect()
    scores = {r["doc_id"]: r["score"] for r in mset.collect()}
    for r in feats:
        assert r["f19"] == pytest.approx(scores[r["doc_id"]], rel=1e-12)


def test_listnet_learns_informative_feature():
    rng = np.random.default_rng(5)
    ranklists = []
    for _q in range(8):
        n = 6
        feats = np.zeros((n, N_FEATURES))
        rel = rng.permutation(n) % 3
        feats[:, 4] = rel + rng.normal(0, 0.05, n)  # informative
        feats[:, 10] = rng.normal(0, 1, n)          # noise
        ranklists.append((feats, rel.astype(float)))
    p0 = np.zeros(N_FEATURES)
    params = listnet_train(ranklists, learning_rate=0.05,
                           iterations=200)
    assert listnet_loss(ranklists, params) < listnet_loss(ranklists, p0)
    assert params[4] > 0 and abs(params[4]) > abs(params[10])


def test_rank_with_model(letor_setup):
    idx = letor_setup
    feats = extract_features(idx, ["apple", "banana"])
    params = np.zeros(N_FEATURES)
    params[2] = 1.0  # rank purely by f3 (whole-doc term frequency)
    rows = rank_with_model(feats, params).collect()
    got = [r["doc_id"] for r in rows]
    by_f3 = sorted(
        feats.collect(), key=lambda r: (-r["f3"], r["doc_id"]))
    assert got == [r["doc_id"] for r in by_f3]


def test_listmle_learns_and_reduces_reference_loss():
    # listmle.cc:138-228 — per-query SGD on the top-one likelihood,
    # stop on |loss delta| < tolerance. Training must reduce the
    # REFERENCE loss (log-sum-exp minus the argmax-label doc's score)
    # and find the informative feature.
    from xapian_spark.query.letor import listmle_loss, listmle_train

    rng = np.random.default_rng(9)
    ranklists = []
    for _q in range(8):
        n = 6
        feats = np.zeros((n, N_FEATURES))
        rel = rng.permutation(n) % 3
        feats[:, 4] = rel + rng.normal(0, 0.05, n)
        feats[:, 10] = rng.normal(0, 1, n)
        ranklists.append((feats, rel.astype(float)))
    p0 = np.zeros(N_FEATURES)
    params = listmle_train(ranklists, learning_rate=0.05,
                           tolerance=1e-9, max_iterations=300)
    assert listmle_loss(ranklists, params) < listmle_loss(ranklists, p0)
    assert params[4] > 0 and abs(params[4]) > abs(params[10])


def test_listmle_converges_by_tolerance():
    from xapian_spark.query.letor import listmle_loss, listmle_train

    feats = np.zeros((3, N_FEATURES))
    feats[:, 0] = [0.0, 1.0, 2.0]
    labels = np.array([0.0, 1.0, 2.0])
    params = listmle_train([(feats, labels)], learning_rate=0.1,
                           tolerance=1e-4, max_iterations=10_000)
    # converged weights rank by the informative feature
    order = np.argsort(-(feats @ params))
    assert list(order) == [2, 1, 0]


def test_svmrank_learns_and_reduces_objective():
    # svmranker.cc semantic contract: linear SVR on pooled
    # (features, label) pairs; training reduces the primal objective
    # and the learned function ranks by the informative feature
    from xapian_spark.query.letor import svmrank_loss, svmrank_train

    rng = np.random.default_rng(13)
    ranklists = []
    for _q in range(8):
        n = 6
        feats = np.zeros((n, N_FEATURES))
        rel = rng.permutation(n) % 3
        feats[:, 4] = rel + rng.normal(0, 0.05, n)
        feats[:, 10] = rng.normal(0, 1, n)
        ranklists.append((feats, rel.astype(float)))
    p0 = np.zeros(N_FEATURES)
    params = svmrank_train(ranklists)
    assert svmrank_loss(ranklists, params) < svmrank_loss(ranklists, p0)
    assert params[4] > 0 and abs(params[4]) > abs(params[10])
    # epsilon-insensitive: a perfect-within-epsilon fit has ~zero loss
    feats = np.zeros((4, N_FEATURES))
    feats[:, 0] = [0.0, 1.0, 2.0, 3.0]
    labels = feats[:, 0].copy()
    p = svmrank_train([(feats, labels)], iterations=2000,
                      learning_rate=0.1)
    pred = feats @ p
    assert np.all(np.argsort(-pred) == [3, 2, 1, 0])


def test_eval_metrics_hand_computed():
    from xapian_spark.query.letor import (
        average_precision, mean_average_precision,
        mean_reciprocal_rank, ndcg_at,
    )

    # AP([1,0,1]) = (1/1 + 2/3) / 2
    assert average_precision([1, 0, 1]) == pytest.approx(
        (1.0 + 2.0 / 3.0) / 2.0)
    assert average_precision([0, 0, 0]) == 0.0
    assert mean_average_precision([[1, 0, 1], [0, 1]]) == pytest.approx(
        ((1.0 + 2.0 / 3.0) / 2.0 + 0.5) / 2.0)
    # perfect order → NDCG 1; reversed < 1
    assert ndcg_at([3, 2, 1, 0]) == pytest.approx(1.0)
    assert ndcg_at([0, 1, 2, 3]) < 1.0
    assert ndcg_at([0, 0, 0]) == 0.0
    # MRR: first relevant at ranks 1 and 3
    assert mean_reciprocal_rank([[1, 0], [0, 0, 2]]) == pytest.approx(
        (1.0 + 1.0 / 3.0) / 2.0)
    # a trained ranker's NDCG beats the zero ranker's on its own data
    from xapian_spark.query.letor import listnet_train

    rng = np.random.default_rng(3)
    ranklists = []
    for _q in range(6):
        feats = np.zeros((5, N_FEATURES))
        rel = rng.permutation(5) % 3
        feats[:, 4] = rel + rng.normal(0, 0.05, 5)
        ranklists.append((feats, rel.astype(float)))
    params = listnet_train(ranklists, learning_rate=0.05,
                           iterations=200)

    def ndcg_of(p):
        vals = []
        for feats, labels in ranklists:
            order = np.argsort(-(feats @ p), kind="stable")
            vals.append(ndcg_at(labels[order]))
        return np.mean(vals)

    assert ndcg_of(params) > ndcg_of(np.zeros(N_FEATURES))


def test_collect_ranklist_bound(spark):
    from xapian_spark.query.letor import collect_ranklist

    df = spark.range(50).select(F.col("id").alias("doc_id"))
    assert len(collect_ranklist(df, max_rows=50)) == 50
    with pytest.raises(ValueError, match="max_rows"):
        collect_ranklist(df, max_rows=49)
