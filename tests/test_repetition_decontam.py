"""Gopher-style repetition stats + train/test decontamination.

Hand-computed expectations on tiny corpora; the sf0.01 documents table
is oracle-checked by the driver gate (`repetition_stats`,
`decontaminate` entries in __spark_entry__).
"""

import pytest

from xapian_spark.pipeline.dedup import decontaminate, decontaminate_apply
from xapian_spark.pipeline.textstats import repetition_stats


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_fractions_hand_computed(spark):
    # "a b a b": bigrams = [a b, b a, a b] -> total 3, top 2, dup 2
    #            trigrams = [a b a, b a b] -> total 2, top 1, dup 0
    out = {r["doc_id"]: r for r in
           repetition_stats(_df(spark, [(1, "a b a b")])).collect()}
    r = out[1]
    assert r["top_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["top_3gram_frac"] == pytest.approx(1 / 2, abs=1e-6)
    assert r["dup_3gram_frac"] == 0.0


def test_repetition_pure_boilerplate_maxes_out(spark):
    # "x x x x x": all 4 bigrams identical -> top = dup = 1.0
    r = repetition_stats(_df(spark, [(1, "x x x x x")])).collect()[0]
    assert r["top_2gram_frac"] == 1.0
    assert r["dup_2gram_frac"] == 1.0
    assert r["top_3gram_frac"] == 1.0
    assert r["dup_3gram_frac"] == 1.0


def test_repetition_short_docs_zero_not_missing(spark):
    # docs with < n tokens still appear, with 0.0 fractions
    out = {r["doc_id"]: r for r in repetition_stats(
        _df(spark, [(1, "solo"), (2, ""), (3, "two words")])).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["top_2gram_frac"] == 0.0
    assert out[2]["dup_3gram_frac"] == 0.0
    # "two words": one bigram, occurring once -> top 1.0, dup 0
    assert out[3]["top_2gram_frac"] == 1.0
    assert out[3]["dup_2gram_frac"] == 0.0
    assert out[3]["top_3gram_frac"] == 0.0


def test_repetition_no_duplicates_all_unique(spark):
    r = repetition_stats(
        _df(spark, [(1, "a b c d e")])).collect()[0]
    assert r["top_2gram_frac"] == pytest.approx(0.25, abs=1e-6)
    assert r["dup_2gram_frac"] == 0.0


def test_decontaminate_flags_shared_ngram(spark):
    train = _df(spark, [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "completely unrelated training text about spark shuffles"),
        (3, "quick brown fox jumps happily elsewhere today"),
    ])
    ev = _df(spark, [
        (100, "benchmark asks about the quick brown fox jumps question"),
    ])
    out = {r["doc_id"]: r for r in
           decontaminate(train, ev, n=4).collect()}
    # doc 1 shares "the quick brown fox" and "quick brown fox jumps";
    # doc 3 shares "quick brown fox jumps"; doc 2 is clean
    assert set(out) == {1, 3}
    assert out[1]["n_eval_docs"] == 1
    assert out[1]["n_shared_shingles"] == 2
    assert out[3]["n_shared_shingles"] == 1


def test_decontaminate_apply_drops_flagged(spark):
    train = _df(spark, [
        (1, "alpha beta gamma delta epsilon"),
        (2, "zeta eta theta iota kappa"),
    ])
    ev = _df(spark, [(9, "alpha beta gamma delta zeta")])
    kept = decontaminate_apply(train, ev, n=4)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_decontaminate_clean_corpus_empty(spark):
    train = _df(spark, [(1, "one two three four five")])
    ev = _df(spark, [(9, "six seven eight nine ten")])
    assert decontaminate(train, ev, n=4).count() == 0


def test_decontaminate_fuzzy_threshold_and_apply(spark):
    from xapian_spark.pipeline.dedup import (decontaminate_fuzzy,
                                             decontaminate_fuzzy_apply)

    train = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon eta"),   # near-copy of ev
         (3, "totally different words entirely here now")],
        ["doc_id", "text"])
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        ["doc_id", "text"])
    got = {(r.doc_id, r.eval_doc_id): r.jaccard
           for r in decontaminate_fuzzy(train, ev, n=3,
                                        threshold=0.4).collect()}
    assert (1, 100) in got and got[(1, 100)] == 1.0
    # doc 2 shares 3 of its 4 shingles with ev's 4: J = 3/5 = 0.6
    assert got[(2, 100)] == 0.6
    assert (3, 100) not in got
    kept = {r.doc_id for r in
            decontaminate_fuzzy_apply(train, ev, n=3,
                                      threshold=0.4).collect()}
    assert kept == {3}
    # higher threshold keeps the paraphrase
    kept2 = {r.doc_id for r in
             decontaminate_fuzzy_apply(train, ev, n=3,
                                       threshold=0.9).collect()}
    assert kept2 == {2, 3}
