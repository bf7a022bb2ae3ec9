"""Weighting-scheme goldens from the reference api_weight.cc /
api_anydb.cc: BM25 parameter behaviors incl. the k2 extra weight,
InL2/PL2 (DFR), and TfIdf normalization strings."""

import math

import pytest

from xapian_spark.query import ops
from xapian_spark.query.bm25 import (
    BM25Weight, InL2Weight, PL2Weight, TfIdfWeight, TradWeight,
)
from xapian_spark.query.executor import Enquire

REL = 1e-12


def _mset(idx, weight, term, k=10):
    return Enquire(idx, weight).get_mset(ops.Term(term), 0, k).collect()


def test_bm25weight4_b0_no_doclen_effect(simpledata_index):
    # api_weight.cc:73-97 — BM25(1,0,1,0,0.5): wdf matters, doclen not
    rows = _mset(simpledata_index, BM25Weight(1, 0, 1, 0, 0.5),
                 "paragraph")
    assert len(rows) == 5
    w = [r["score"] for r in rows]
    assert w[0] > w[1]
    assert w[1] == pytest.approx(w[2], rel=REL)
    assert w[2] > w[3]
    assert w[3] == pytest.approx(w[4], rel=REL)

    # BM25(0,0,1,1,0.5): neither wdf nor doclen affects the weight
    rows = _mset(simpledata_index, BM25Weight(0, 0, 1, 1, 0.5),
                 "paragraph")
    assert len(rows) == 5
    assert rows[0]["score"] == pytest.approx(rows[4]["score"], rel=REL)


def test_bm25weight5_k2_extra(simpledata_index):
    # api_weight.cc:99-117 — BM25(0,1,1,0.5,0.5) on "paragraph":
    # wdf has no effect; shorter docs rank higher; order 3 5 1 4 2
    rows = _mset(simpledata_index, BM25Weight(0, 1, 1, 0.5, 0.5),
                 "paragraph")
    assert [r["doc_id"] for r in rows] == [3, 5, 1, 4, 2]
    w = [r["score"] for r in rows]
    assert w[0] == pytest.approx(w[1], rel=REL)
    assert w[1] > w[2] > w[3] > w[4]


def test_inl2weight3_golden(simpledata_index):
    # api_weight.cc:154-182 — InL2(2.0), query "banana" → doc 6,
    # weight 1.559711143842063
    rows = _mset(simpledata_index, InL2Weight(2.0), "banana")
    assert [r["doc_id"] for r in rows] == [6]
    assert rows[0]["score"] == pytest.approx(1.559711143842063, rel=REL)
    # OP_SCALE_WEIGHT multiplies
    enq = Enquire(simpledata_index, InL2Weight(2.0))
    scaled = enq.get_mset(
        ops.ScaleWeight(ops.Term("banana"), 15.0), 0, 10).collect()
    assert scaled[0]["score"] == pytest.approx(
        15.0 * rows[0]["score"], rel=REL)


def test_pl2weight3_golden(simpledata_index):
    # api_weight.cc:442-457 — PL2(2.0) on "paragraph":
    # mset[2] == mset[3] + 0.0086861771701328694
    rows = _mset(simpledata_index, PL2Weight(2.0), "paragraph")
    assert len(rows) == 5
    assert rows[2]["score"] - rows[3]["score"] == pytest.approx(
        0.0086861771701328694, rel=1e-9)


def test_tfidfweight3_goldens(simpledata_index):
    # api_weight.cc:525-570
    rows = _mset(simpledata_index, TfIdfWeight("ntn"), "word")
    assert [r["doc_id"] for r in rows] == [2, 4]
    assert rows[0]["score"] == pytest.approx(8.0 * math.log(6.0 / 2),
                                             rel=REL)
    rows = _mset(simpledata_index, TfIdfWeight("bnn"), "test")
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["score"] == pytest.approx(1.0, rel=REL)
    rows = _mset(simpledata_index, TfIdfWeight("lnn"), "word")
    assert [r["doc_id"] for r in rows] == [2, 4]
    assert rows[0]["score"] == pytest.approx(1 + math.log(8.0), rel=REL)
    assert rows[1]["score"] == pytest.approx(1.0, rel=REL)


def test_tfidf_invalid_normalization():
    with pytest.raises(ValueError):
        TfIdfWeight("xxx")
    with pytest.raises(ValueError):
        InL2Weight(0)
    with pytest.raises(ValueError):
        PL2Weight(-1)


def test_tradweight_is_bm25_special_case(simpledata_index):
    t = _mset(simpledata_index, TradWeight(1.0), "paragraph")
    b = _mset(simpledata_index, BM25Weight(1, 0, 0, 1, 0), "paragraph")
    assert [(r["doc_id"], r["score"]) for r in t] == \
        [(r["doc_id"], r["score"]) for r in b]


def test_dlhweight1_golden(simpledata_index):
    # api_weight.cc:380-408 — DLH on "paragraph":
    # mset[0] - mset[4] == 1.17790202016936130; scale multiplies
    from xapian_spark.query.bm25 import DLHWeight

    rows = _mset(simpledata_index, DLHWeight(), "paragraph")
    assert len(rows) == 5
    assert rows[0]["score"] - rows[4]["score"] == pytest.approx(
        1.17790202016936130, rel=1e-10)
    enq = Enquire(simpledata_index, DLHWeight())
    scaled = enq.get_mset(
        ops.ScaleWeight(ops.Term("paragraph"), 15.0), 0, 10).collect()
    for a, b in zip(rows, scaled):
        assert b["score"] == pytest.approx(15.0 * a["score"], rel=1e-10)


def test_dphweight1_golden(simpledata_index):
    # api_weight.cc:460-487 — DPH on "paragraph":
    # mset[2] - mset[4] == 0.542623617687990167
    from xapian_spark.query.bm25 import DPHWeight

    rows = _mset(simpledata_index, DPHWeight(), "paragraph")
    assert len(rows) == 5
    assert rows[2]["score"] - rows[4]["score"] == pytest.approx(
        0.542623617687990167, rel=1e-10)


def test_bernoulli_family_run(simpledata_index):
    from xapian_spark.query.bm25 import (
        BB2Weight, IfB2Weight, IneB2Weight,
    )

    for W in (IfB2Weight, IneB2Weight, BB2Weight):
        rows = _mset(simpledata_index, W(1.0), "paragraph")
        assert len(rows) == 5
        ws = [r["score"] for r in rows]
        assert ws == sorted(ws, reverse=True)
        assert all(w == w for w in ws)  # no NaN
