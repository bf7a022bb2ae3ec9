"""Rank/score-identity tests against the reference's apitest expectations.

simplequery1/2/3 (xapian-core/tests/api_anydb.cc:171-216): query "word" on
apitest_simpledata must return docs (2, 4) with BM25(1,0,1,0.5,0.5) weights
1.04648168717725 and 0.640987686595914; query "this" matches all 6 docs.
"""

import pytest

from xapian_spark.query import ops
from xapian_spark.query.executor import Enquire

REL = 1e-12


def test_simplequery1_and_2(simpledata_index):
    enq = Enquire(simpledata_index)
    mset = enq.get_mset(ops.Term("word"), 0, 10).collect()
    assert [r.doc_id for r in mset] == [2, 4]
    assert mset[0].score == pytest.approx(1.04648168717725, rel=REL)
    assert mset[1].score == pytest.approx(0.640987686595914, rel=REL)


def test_simplequery3(simpledata_index):
    enq = Enquire(simpledata_index)
    mset = enq.get_mset(ops.Term("this"), 0, 10).collect()
    assert len(mset) == 6


def test_stats_match_reference(simpledata_index):
    st = simpledata_index.stats
    assert st.doccount == 6
    assert st.total_doclen == 28 + 81 + 15 + 31 + 15 + 15
    assert st.doclen_lbound == 15
    assert st.doclen_ubound == 81


def test_absent_term(simpledata_index):
    enq = Enquire(simpledata_index)
    assert enq.get_mset(ops.Term("nosuchterm"), 0, 10).count() == 0


def test_matchall_and_nothing(simpledata_index):
    enq = Enquire(simpledata_index)
    assert enq.get_mset(ops.MatchAll(), 0, 100).count() == 6
    assert enq.get_mset(ops.MatchNothing(), 0, 100).count() == 0


def test_mset_prefix_consistency(simpledata_index):
    # MSet(0, k) must be a prefix of MSet(0, k+m) (soaktest property)
    enq = Enquire(simpledata_index)
    q = ops.Or([ops.Term("this"), ops.Term("word"), ops.Term("paragraph")])
    full = [(r.doc_id, r.score) for r in enq.get_mset(q, 0, 10).collect()]
    for k in (1, 2, 3):
        part = [(r.doc_id, r.score)
                for r in enq.get_mset(q, 0, k).collect()]
        assert part == full[:k]


def test_first_offset(simpledata_index):
    enq = Enquire(simpledata_index)
    q = ops.Term("this")
    full = [r.doc_id for r in enq.get_mset(q, 0, 10).collect()]
    tail = [r.doc_id for r in enq.get_mset(q, 2, 10).collect()]
    assert tail == full[2:]
