"""Named PostingSource wrappers (include/xapian/postingsource.h:405-600,
api/postingsource.cc, api/decvalwtsource.cc) and the spelling
exact-word frequency rule (api/omdatabase.cc:651-669)."""

import pytest
from pyspark.sql import functions as F

from xapian_spark.query.posting_sources import (
    decreasing_value_weight_posting_source,
    fixed_weight_posting_source,
    value_map_posting_source,
    value_weight_posting_source,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, 2.5, "en"), (2, None, "fr"), (3, 7.0, None),
         (4, 0.0, "de"), (5, 4.0, "en")],
        "doc_id long, quality double, lang string")


def _rows(ps):
    return sorted((r["doc_id"], r["score"])
                  for r in ps.source.collect())


def test_value_weight(docs):
    # weight = the slot value; docs without a value are skipped
    ps = value_weight_posting_source(docs, "quality")
    assert _rows(ps) == [(1, 2.5), (3, 7.0), (4, 0.0), (5, 4.0)]


def test_value_map(docs):
    # weight_map lookup on the slot value, default for misses; only
    # docs WITH a value in the slot (postingsource.h:521-527)
    ps = value_map_posting_source(
        docs, "lang", {"en": 2.0, "fr": 1.5}, default_weight=0.25)
    assert _rows(ps) == [(1, 2.0), (2, 1.5), (4, 0.25), (5, 2.0)]


def test_value_map_empty_map(docs):
    ps = value_map_posting_source(docs, "lang", {}, default_weight=0.5)
    assert _rows(ps) == [(1, 0.5), (2, 0.5), (4, 0.5), (5, 0.5)]


def test_fixed_weight(docs):
    # EVERY document, constant weight (nulls in other slots irrelevant)
    ps = fixed_weight_posting_source(docs, 1.25)
    assert _rows(ps) == [(1, 1.25), (2, 1.25), (3, 1.25), (4, 1.25),
                         (5, 1.25)]


def test_decreasing_value_weight_matches_value_weight(spark):
    # results are IDENTICAL to ValueWeightPostingSource — the
    # decreasing guarantee only licenses pruning
    docs = spark.createDataFrame(
        [(i, float(10 - i)) for i in range(1, 8)],
        "doc_id long, v double")
    a = _rows(value_weight_posting_source(docs, "v"))
    b = _rows(decreasing_value_weight_posting_source(docs, "v"))
    assert a == b


def test_decreasing_value_weight_prune(spark):
    # with the guarantee, top-k inside the range = first k docids;
    # out-of-range docs always survive (items_at_end)
    docs = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(1, 11)],
        "doc_id long, v double")
    ps = decreasing_value_weight_posting_source(
        docs, "v", range_start=1, range_end=6, prune_k=3)
    got = _rows(ps)
    # first 3 of [1..6] plus all of [7..10]
    assert [d for d, _ in got] == [1, 2, 3, 7, 8, 9, 10]
    # and the kept weights are untouched slot values
    assert dict(got)[7] == 93.0


def test_posting_source_composes_with_enquire(spark):
    # OP_AND_MAYBE(term, source): source weight adds to BM25 for docs
    # matching the term — the standard external-boost pattern
    from xapian_spark.index.build import build_index
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire

    docs = spark.createDataFrame(
        [(1, "alpha beta", 10.0), (2, "alpha gamma", 20.0),
         (3, "delta", 30.0)],
        "doc_id long, text string, boost double")
    idx = build_index(docs, text_col="text", analyzer="simple")
    ps = value_weight_posting_source(docs, "boost")
    base = Enquire(idx).get_mset(ops.Term("alpha"), 0, 10).collect()
    boosted = Enquire(idx).get_mset(
        ops.AndMaybe(ops.Term("alpha"), ps), 0, 10).collect()
    base_scores = {r["doc_id"]: r["score"] for r in base}
    boost_scores = {r["doc_id"]: r["score"] for r in boosted}
    assert set(boost_scores) == {1, 2}  # only term matches survive
    assert boost_scores[1] == pytest.approx(base_scores[1] + 10.0)
    assert boost_scores[2] == pytest.approx(base_scores[2] + 20.0)


def test_spelling_exact_word_rule(spark):
    # a correctly-spelled HIGH-frequency word must not be corrected to
    # a rarer neighbor; a typo (freq 0) must be
    from xapian_spark.query.spelling import (
        build_spelling_table, spelling_suggestion,
    )

    words = spark.createDataFrame(
        [("batch", 100), ("botch", 3), ("scan", 50)],
        "word string, freq long")
    sp = build_spelling_table(words)
    assert spelling_suggestion(sp, "bacth") == "batch"
    # 'batch' itself: best candidate 'botch' (freq 3) < exact 100 → no
    assert spelling_suggestion(sp, "batch") is None
    # but if the neighbor is MORE frequent, it wins (omdatabase rule)
    words2 = spark.createDataFrame(
        [("batch", 3), ("botch", 100)], "word string, freq long")
    assert spelling_suggestion(build_spelling_table(words2),
                               "batch") == "botch"


def test_brute_force_pairs_cap(spark):
    from xapian_spark.pipeline.similarity import brute_force_pairs

    emb = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"))
    with pytest.raises(ValueError, match="O\\(n²\\)|max_rows"):
        brute_force_pairs(emb, max_rows=100)
    # under the cap (and with the override) it still works
    assert brute_force_pairs(emb.limit(3), threshold=0.5).count() == 3
