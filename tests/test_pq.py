"""Product quantization: encode paths agree, trained codebooks beat
the data-independent default, ADC+refine recovers brute-force
neighbors."""

import math

import pytest
from pyspark.sql import functions as F

from xapian_spark.pipeline.similarity import (
    _pq_default_codebooks, cosine_topk, pq_encode, pq_topk,
    train_pq_codebooks,
)

DIM, M, K = 16, 4, 8


def _clustered_vec(i, dim=DIM):
    """Deterministic vectors around 4 cluster directions with a small
    per-index wobble — PQ-friendly structure, no numpy/random."""
    c = i % 4
    base = [math.sin(0.7 * c * (d + 1)) + (1.0 if d % 4 == c else 0.0)
            for d in range(dim)]
    wob = [math.sin(1.3 * i * (d + 2)) * 0.05 for d in range(dim)]
    return [float(b + w) for b, w in zip(base, wob)]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [(i, _clustered_vec(i)) for i in range(240)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").persist()


def test_encode_shape_and_range(emb):
    books = _pq_default_codebooks(DIM, M, K)
    out = pq_encode(emb, books).collect()
    assert len(out) == 240
    for r in out:
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])


def test_encode_arrow_matches_expressions(emb):
    books = train_pq_codebooks(emb, DIM, m=M, k=K, sample=240)
    expr = {r["vec_id"]: list(r["codes"])
            for r in pq_encode(emb, books, arrow=False).collect()}
    arw = {r["vec_id"]: list(r["codes"])
           for r in pq_encode(emb, books, arrow=True).collect()}
    assert expr == arw


def test_train_deterministic_and_lower_distortion(emb):
    b1 = train_pq_codebooks(emb, DIM, m=M, k=K, sample=240)
    b2 = train_pq_codebooks(emb, DIM, m=M, k=K, sample=240)
    assert b1 == b2
    assert len(b1) == M and all(len(b) == K for b in b1)

    def distortion(books):
        import numpy as np

        cb = np.array(books)
        rows = emb.orderBy("vec_id").collect()
        x = np.array([r["embedding"] for r in rows], dtype=float)
        xs = x.reshape(len(x), M, DIM // M)
        d = ((xs[:, :, None, :] - cb[None]) ** 2).sum(-1)
        return d.min(axis=2).sum()

    assert distortion(b1) < 0.5 * distortion(
        _pq_default_codebooks(DIM, M, K))


def test_pq_topk_refine_recall(emb):
    books = train_pq_codebooks(emb, DIM, m=M, k=K, sample=240)
    q = _clustered_vec(1001)
    exact = {r["vec_id"]
             for r in cosine_topk(emb, q, k=10).collect()}
    got = pq_topk(emb, q, k=10, codebooks=books, refine=50)
    assert got.columns == ["vec_id", "adc", "cosine"]
    approx = {r["vec_id"] for r in got.collect()}
    assert len(exact & approx) >= 8  # recall@10 >= 0.8 on clustered data


def test_pq_topk_adc_only_orders_ascending(emb):
    q = _clustered_vec(1002)
    rows = pq_topk(emb, q, k=15, m=M, n_codes=K).collect()
    assert len(rows) == 15
    adcs = [r["adc"] for r in rows]
    assert adcs == sorted(adcs)
    # deterministic tiebreak: equal adc → ascending vec_id
    for a, b in zip(rows, rows[1:]):
        if a["adc"] == b["adc"]:
            assert a["vec_id"] < b["vec_id"]


def test_dim_not_divisible_raises():
    with pytest.raises(ValueError):
        _pq_default_codebooks(10, 3, 4)


def test_codebooks_precedence_and_contradiction(emb):
    books = _pq_default_codebooks(DIM, M, K)
    q = _clustered_vec(7)
    # consistent explicit geometry is accepted
    pq_topk(emb, q, k=3, codebooks=books, m=M, n_codes=K).collect()
    with pytest.raises(ValueError, match="contradicts codebooks"):
        pq_topk(emb, q, k=3, codebooks=books, m=M + 1)
    with pytest.raises(ValueError, match="contradicts codebooks"):
        pq_topk(emb, q, k=3, codebooks=books, n_codes=K + 1)


def test_train_on_empty_frame_raises(spark):
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="non-empty sample"):
        train_pq_codebooks(empty, DIM, m=M, k=K)
