"""FieldProcessor hook (queryparser.h:647-714) — the reference's
test_qp_fieldproc1/test_qp_fieldproc2 golden cases
(tests/queryparsertest.cc:1819-1930)."""

import pytest

from xapian_spark.query import ops
from xapian_spark.query.parser import (
    DateValueRangeProcessor, QueryParser, QueryParserError, describe)


def title_fproc(s):
    return ops.MatchAll() if s == "all" else ops.Term("S" + s)


def host_fproc(s):
    return ops.MatchAll() if s == "*" else ops.Term("H" + s.lower())


FIELDPROC1 = [
    ("title:test", "Stest"),
    ("title:all", "<alldocuments>"),
    ("host:Xapian.org", "0 * Hxapian.org"),
    ("host:*", "0 * <alldocuments>"),
    ('host:"Space Station.Example.Org"',
     "0 * Hspace station.example.org"),
]


@pytest.mark.parametrize("query,want", FIELDPROC1)
def test_qp_fieldproc1(query, want):
    qp = QueryParser()
    qp.add_prefix("title", title_fproc)
    qp.add_boolean_prefix("host", host_fproc)
    assert describe(qp.parse_query(query)) == want


def date_fproc(s):
    table = {"today": "20120725", "this week": "20120723",
             "this month": "20120701", "this year": "20120101",
             "this decade": "20100101", "this century": "20000101"}
    if s in table:
        return ops.ValueRange("1", table[s], None)
    raise QueryParserError(
        f"Didn't understand date specification '{s}'")


FIELDPROC2 = [
    ('date:"this week"', "0 * VALUE_GE 1 20120723"),
    ("date:23/7/2012..25/7/2012",
     "0 * VALUE_RANGE 1 20120723 20120725"),
]


@pytest.mark.parametrize("query,want", FIELDPROC2)
def test_qp_fieldproc2(query, want):
    qp = QueryParser()
    qp.add_boolean_prefix("date", date_fproc)
    qp.add_valuerangeprocessor(DateValueRangeProcessor(1, "date:"))
    assert describe(qp.parse_query(query)) == want


def test_fieldproc_error_propagates():
    qp = QueryParser()
    qp.add_boolean_prefix("date", date_fproc)
    with pytest.raises(QueryParserError):
        qp.parse_query('date:"next lifetime"')


def test_fieldproc_combines_with_prob_terms():
    qp = QueryParser()
    qp.add_prefix("title", title_fproc)
    qp.add_boolean_prefix("host", host_fproc)
    # probabilistic proc node ORs with plain terms; boolean proc filters
    q = qp.parse_query("hello title:test")
    assert describe(q) == "(Zhello@1 OR Stest)"
    q = qp.parse_query("hello host:example.org")
    assert describe(q) == "(Zhello@1 FILTER Hexample.org)"
