"""Snippet/KWIC highlighting: best-line selection, word matching,
highlight markers."""

import pytest

from xapian_spark.query.snippet import generate_snippets


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "no hits on this line\nthe batch runs here\n"
            "batch and scan together, batch again"),
        (2, "Scan, with punctuation!\nplain text"),
        (3, "nothing relevant at all"),
        (4, "BATCH uppercase only"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_best_line_most_hits_earliest_tie(docs):
    got = {r["doc_id"]: (r["n_hits"], r["snippet"])
           for r in generate_snippets(docs, ["batch", "scan"]).collect()}
    # doc 1: third line has 3 hits (beats line 2's single hit)
    assert got[1] == (3, "<b>batch</b> and <b>scan</b> together,"
                         " <b>batch</b> again")
    # doc 2: punctuation stripped for the MATCH, kept in the display
    assert got[2] == (1, "<b>Scan,</b> with punctuation!")
    # doc 4: case-insensitive match
    assert got[4] == (1, "<b>BATCH</b> uppercase only")
    # docs 3 and 5: no hits → no row
    assert 3 not in got and 5 not in got


def test_custom_markers(docs):
    got = {r["doc_id"]: r["snippet"]
           for r in generate_snippets(
               docs, ["plain"], pre="[", post="]").collect()}
    assert got[2] == "[plain] text"


def test_empty_terms_raise(docs):
    with pytest.raises(ValueError):
        generate_snippets(docs, [])
