"""GPT-3-style quality classifier — training cross-checked against a
pure-Python mirror; the driver gate replays the identical unrolled
iterations in SQL (`quality_classifier`)."""

import pytest
from pyspark.sql import functions as F

from xapian_spark.pipeline.classifier import (
    brute_force_logreg,
    classifier_features,
    logloss,
    pareto_keep_probability,
    score_logreg,
    train_logreg,
)


def _feats(spark, rows):
    # rows = (doc_id, label, f1, f2)
    return spark.createDataFrame(
        rows, "doc_id long, label int, f1 double, f2 double")


COLS = ("f1", "f2")


def test_training_matches_python_mirror(spark):
    rows = [(i, i % 2, round(0.1 * i, 6), round(1.0 - 0.07 * i, 6))
            for i in range(20)]
    df = _feats(spark, rows)
    w = train_logreg(df, feature_cols=COLS, iters=10, lr=1.0)
    expect = brute_force_logreg(
        [(r[1], r[2], r[3]) for r in rows], iters=10, lr=1.0)
    assert w == pytest.approx(expect, abs=1e-9)


def test_separable_data_classified_correctly(spark):
    # f1 alone separates the classes; more steps -> confident fit
    rows = [(i, 1, 1.0, 0.5) for i in range(10)] + \
           [(10 + i, 0, -1.0, 0.5) for i in range(10)]
    df = _feats(spark, rows)
    w = train_logreg(df, feature_cols=COLS, iters=50, lr=2.0)
    out = score_logreg(df, w, feature_cols=COLS).collect()
    labels = {r[0]: r[1] for r in rows}
    for r in out:
        assert r["pred"] == labels[r["doc_id"]]
        assert 0.0 <= r["prob"] <= 1.0


def test_training_reduces_logloss(spark):
    rows = [(i, int(i < 12), round(1.0 - 0.08 * i, 6), 0.3)
            for i in range(24)]
    df = _feats(spark, rows)
    w0 = [0.0] * 3
    w = train_logreg(df, feature_cols=COLS, iters=20, lr=1.0)
    assert logloss(df, w, feature_cols=COLS) < \
        logloss(df, w0, feature_cols=COLS)


def test_features_are_rounded_quality_ratios(spark):
    docs = spark.createDataFrame(
        [(1, "The quick brown fox!!")], "doc_id long, text string")
    r = classifier_features(docs).collect()[0]
    assert set(r.asDict()) == {"doc_id", "alpha_ratio", "stopword_ratio",
                               "type_token_ratio", "punct_ratio"}
    assert r["type_token_ratio"] == 1.0
    assert 0.0 < r["alpha_ratio"] < 1.0


def test_pareto_keep_probability_monotone(spark):
    df = spark.range(1).select(
        pareto_keep_probability(F.lit(1.0)).alias("hi"),
        pareto_keep_probability(F.lit(0.0)).alias("lo"),
    ).collect()[0]
    # perfect score -> always kept; zero score -> 2^-9
    assert df["hi"] == pytest.approx(1.0)
    assert df["lo"] == pytest.approx(2.0 ** -9)
