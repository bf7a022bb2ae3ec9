"""Cross-document repeated-span stats — hand-computed; sf0.01 is
oracle-checked by the driver gate (`cross_doc_spans`)."""

import pytest

from xapian_spark.pipeline.textstats import cross_doc_span_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_counted_in_both_docs(spark):
    # "p q r s" occurs in docs 1 and 2; doc 3 shares nothing
    out = {r["doc_id"]: r for r in cross_doc_span_stats(_df(spark, [
        (1, "p q r s t"),          # windows: pqrs, qrst
        (2, "x p q r s"),          # windows: xpqr, pqrs
        (3, "a b c d e"),          # windows: abcd, bcde
    ]), n=4).collect()}
    assert out[1]["n_spans"] == 2
    assert out[1]["n_shared_spans"] == 1
    assert out[1]["shared_span_frac"] == 0.5
    assert out[2]["n_shared_spans"] == 1
    assert out[3]["n_shared_spans"] == 0
    assert out[3]["shared_span_frac"] == 0.0


def test_within_doc_repeat_not_cross_doc(spark):
    # "m n o p" twice in ONE doc only -> multiplicity counts toward
    # n_spans but not n_shared_spans (cross-doc definition)
    r = cross_doc_span_stats(_df(spark, [
        (1, "m n o p z m n o p"),
    ]), n=4).collect()[0]
    assert r["n_spans"] == 6
    assert r["n_shared_spans"] == 0


def test_multiplicity_of_shared_span(spark):
    # doc 1 contains the shared window twice -> both occurrences count
    out = {r["doc_id"]: r for r in cross_doc_span_stats(_df(spark, [
        (1, "a b c d z a b c d"),  # abcd twice (+ 4 other windows)
        (2, "a b c d"),
    ]), n=4).collect()}
    assert out[1]["n_spans"] == 6
    assert out[1]["n_shared_spans"] == 2
    assert out[2]["n_shared_spans"] == 1
    assert out[2]["shared_span_frac"] == 1.0


def test_short_docs_zero_not_missing(spark):
    out = {r["doc_id"]: r for r in cross_doc_span_stats(_df(spark, [
        (1, "one two three"), (2, ""),
    ]), n=4).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_spans"] == 0
    assert out[1]["shared_span_frac"] == 0.0


def test_identical_docs_fully_shared(spark):
    out = cross_doc_span_stats(_df(spark, [
        (1, "u v w x y"), (2, "u v w x y"),
    ]), n=4).collect()
    for r in out:
        assert r["shared_span_frac"] == 1.0
