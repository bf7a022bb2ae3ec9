"""Boolean-operator golden tests ported from the reference apitest
(xapian-core/tests/api_anydb.cc — xor1/xor2, multidb3/4/5, eliteset1/2,
plus operator semantics checks on apitest_simpledata)."""

import pytest

from xapian_spark.analysis.porter2 import stem
from xapian_spark.index.build import build_index
from xapian_spark.io.apitest import corpus_df, multi_corpus_df
from xapian_spark.query import ops
from xapian_spark.query.bm25 import BoolWeight
from xapian_spark.query.executor import Enquire


def docids(mset_df):
    return [r.doc_id for r in mset_df.collect()]


@pytest.fixture(scope="module")
def multidb2(spark):
    docs = multi_corpus_df(
        spark, ["apitest_simpledata", "apitest_simpledata2"])
    return build_index(docs, text_col="data", analyzer="apitest")


@pytest.fixture(scope="module")
def multidb3x(spark):
    docs = multi_corpus_df(
        spark,
        ["apitest_simpledata", "apitest_simpledata2", "apitest_termorder"],
    )
    return build_index(docs, text_col="data", analyzer="apitest")


def test_xor1_boolweight(simpledata_index):
    # api_anydb.cc:1900-1926 xor1
    enq = Enquire(simpledata_index, BoolWeight())
    q = ops.Xor([stem("this"), stem("word"), stem("of")])
    assert docids(enq.get_mset(q, 0, 10)) == [1, 2, 5, 6]


def test_xor2_weighted(simpledata_index):
    # api_anydb.cc:1928-1952 xor2
    enq = Enquire(simpledata_index)
    q = ops.Xor([stem("this"), stem("word"), stem("of")])
    assert docids(enq.get_mset(q, 0, 10)) == [2, 1, 5, 6]


def test_emptyop1(simpledata_index):
    # api_anydb.cc:1975-1992: empty XOR matches nothing
    enq = Enquire(simpledata_index)
    assert enq.get_mset(ops.Xor([]), 0, 10).count() == 0


def test_multidb3(multidb2):
    # api_anydb.cc:254-270: OR(inmemory, word), BoolWeight → 2, 3, 7
    enq = Enquire(multidb2, BoolWeight())
    q = ops.Or([stem("inmemory"), stem("word")])
    assert docids(enq.get_mset(q, 0, 10)) == [2, 3, 7]


def test_multidb4(multidb3x):
    # api_anydb.cc:272-290 → 2, 3, 4, 10
    enq = Enquire(multidb3x, BoolWeight())
    q = ops.Or([stem("inmemory"), stem("word")])
    assert docids(enq.get_mset(q, 0, 10)) == [2, 3, 4, 10]


def test_multidb5(multidb2):
    # api_anydb.cc:292-308: AND(inmemory, word) → 2
    enq = Enquire(multidb2, BoolWeight())
    q = ops.And([stem("inmemory"), stem("word")])
    assert docids(enq.get_mset(q, 0, 10)) == [2]


def test_eliteset1(simpledata_index):
    # api_anydb.cc:1315-1336: ELITE_SET(1, simple, word) == OR(word)
    enq = Enquire(simpledata_index)
    m1 = enq.get_mset(ops.Or([stem("word")]), 0, 10).collect()
    q2 = ops.EliteSet([stem("simple"), stem("word")], set_size=1)
    m2 = enq.get_mset(q2, 0, 10).collect()
    assert [r.doc_id for r in m1] == [r.doc_id for r in m2]
    assert [r.score for r in m1] == pytest.approx(
        [r.score for r in m2], rel=1e-12)


def test_eliteset2_subqueries(simpledata_index):
    # api_anydb.cc:1339-1369: ELITE_SET(1, [this, AND(word,search)])
    # == AND(word, search)
    enq = Enquire(simpledata_index)
    inner = ops.And([stem("word"), stem("search")])
    m1 = docids(enq.get_mset(inner, 0, 10))
    q2 = ops.EliteSet([ops.Term(stem("this")), inner], set_size=1)
    m2 = docids(enq.get_mset(q2, 0, 10))
    assert m1 == m2 and len(m1) > 0


def test_andnot(simpledata_index):
    # "this" minus "banana": doc 6 mentions banana → all but 6
    enq = Enquire(simpledata_index, BoolWeight())
    q = ops.AndNot(stem("this"), stem("banana"))
    got = docids(enq.get_mset(q, 0, 10))
    all_this = docids(enq.get_mset(ops.Term(stem("this")), 0, 10))
    banana = docids(enq.get_mset(ops.Term(stem("banana")), 0, 10))
    assert got == [d for d in all_this if d not in banana]
    assert banana and set(banana).isdisjoint(got)


def test_andnot_weights_match_left(simpledata_index):
    # AND_NOT's right side contributes no weight: surviving docs keep
    # exactly their left-side score
    enq = Enquire(simpledata_index)
    left = ops.Term(stem("this"))
    lscores = {r.doc_id: r.score
               for r in enq.get_mset(left, 0, 10).collect()}
    q = ops.AndNot(left, ops.Term(stem("banana")))
    for r in enq.get_mset(q, 0, 10).collect():
        assert r.score == pytest.approx(lscores[r.doc_id], rel=1e-12)


def test_andmaybe(simpledata_index):
    # left required, right only adds weight
    enq = Enquire(simpledata_index)
    l, r_ = ops.Term(stem("this")), ops.Term(stem("word"))
    both = {x.doc_id: x.score
            for x in enq.get_mset(ops.And([l, r_]), 0, 10).collect()}
    lonly = {x.doc_id: x.score
             for x in enq.get_mset(l, 0, 10).collect()}
    got = {x.doc_id: x.score
           for x in enq.get_mset(ops.AndMaybe(l, r_), 0, 10).collect()}
    assert set(got) == set(lonly)
    for d, s in got.items():
        expect = both.get(d, lonly[d])
        assert s == pytest.approx(expect, rel=1e-12)


def test_filter_weightless_right(simpledata_index):
    enq = Enquire(simpledata_index)
    l, r_ = ops.Term(stem("this")), ops.Term(stem("word"))
    got = {x.doc_id: x.score
           for x in enq.get_mset(ops.Filter(l, r_), 0, 10).collect()}
    lscores = {x.doc_id: x.score
               for x in enq.get_mset(l, 0, 10).collect()}
    rdocs = set(docids(enq.get_mset(r_, 0, 10)))
    assert set(got) == set(lscores) & rdocs
    for d, s in got.items():
        assert s == pytest.approx(lscores[d], rel=1e-12)


def test_max_operator(simpledata_index):
    enq = Enquire(simpledata_index)
    a, b = ops.Term(stem("this")), ops.Term(stem("word"))
    sa = {x.doc_id: x.score for x in enq.get_mset(a, 0, 10).collect()}
    sb = {x.doc_id: x.score for x in enq.get_mset(b, 0, 10).collect()}
    got = {x.doc_id: x.score
           for x in enq.get_mset(ops.Max([a, b]), 0, 10).collect()}
    assert set(got) == set(sa) | set(sb)
    for d, s in got.items():
        assert s == pytest.approx(
            max(sa.get(d, 0.0), sb.get(d, 0.0)), rel=1e-12)


def test_scale_weight(simpledata_index):
    enq = Enquire(simpledata_index)
    base = {x.doc_id: x.score
            for x in enq.get_mset(ops.Term(stem("word")), 0, 10).collect()}
    q = ops.ScaleWeight(ops.Term(stem("word")), 2.5)
    got = {x.doc_id: x.score for x in enq.get_mset(q, 0, 10).collect()}
    assert set(got) == set(base)
    for d, s in got.items():
        assert s == pytest.approx(2.5 * base[d], rel=1e-12)


def test_or_score_is_sum(simpledata_index):
    enq = Enquire(simpledata_index)
    a, b = ops.Term(stem("this")), ops.Term(stem("word"))
    sa = {x.doc_id: x.score for x in enq.get_mset(a, 0, 10).collect()}
    sb = {x.doc_id: x.score for x in enq.get_mset(b, 0, 10).collect()}
    got = {x.doc_id: x.score
           for x in enq.get_mset(ops.Or([a, b]), 0, 10).collect()}
    assert set(got) == set(sa) | set(sb)
    for d, s in got.items():
        assert s == pytest.approx(
            sa.get(d, 0.0) + sb.get(d, 0.0), rel=1e-12)


def test_docid_order_descending(simpledata_index):
    """Enquire::set_docid_order(DESCENDING) — equal-weight docs
    tiebreak docid DESC (msetcmp.cc:46-133)."""
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire

    enq = Enquire(simpledata_index)
    asc = enq.get_mset(ops.Term("this"), 0, 50).collect()
    desc = enq.get_mset(ops.Term("this"), 0, 50,
                        docid_order="desc").collect()
    assert {r["doc_id"] for r in asc} == {r["doc_id"] for r in desc}
    # within every equal-score band the order flips
    from itertools import groupby
    for rows in (asc, desc):
        assert all(rows[i]["score"] >= rows[i + 1]["score"]
                   for i in range(len(rows) - 1))
    bands_asc = {s: [r["doc_id"] for r in g] for s, g in
                 groupby(asc, key=lambda r: round(r["score"], 9))}
    bands_desc = {s: [r["doc_id"] for r in g] for s, g in
                  groupby(desc, key=lambda r: round(r["score"], 9))}
    flipped = False
    for s, ids in bands_asc.items():
        assert bands_desc[s] == ids[::-1]
        if len(ids) > 1:
            flipped = True
    assert flipped  # fixture has at least one equal-score band
