"""Property tests for the round-3 pipeline ops: each Spark result is
cross-checked against an independent brute-force pure-Python
implementation on hypothesis-generated corpora (small alphabets force
collisions so the interesting branches actually execute)."""

import math
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xapian_spark.pipeline.pii import PII_PATTERNS, redact_pii
from xapian_spark.pipeline.textstats import (
    cross_doc_span_stats,
    repetition_stats,
    unigram_lm_scores,
)

# words from a 4-symbol alphabet → heavy n-gram collisions
_word = st.sampled_from(["a", "b", "c", "dd"])
_text = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_text, min_size=1, max_size=6)

_SETTINGS = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string")


def _toks(t):
    return [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]


@given(_corpus)
@_SETTINGS
def test_repetition_matches_bruteforce(spark, texts):
    got = {r["doc_id"]: r for r in
           repetition_stats(_df(spark, texts)).collect()}
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        toks = _toks(t)
        for n, pre in ((2, "2gram"), (3, "3gram")):
            grams = [" ".join(toks[j:j + n])
                     for j in range(len(toks) - n + 1)]
            if grams:
                cnt = Counter(grams)
                top = max(cnt.values()) / len(grams)
                dup = sum(c for c in cnt.values() if c > 1) / len(grams)
            else:
                top = dup = 0.0
            assert got[i][f"top_{pre}_frac"] == round(top, 6)
            assert got[i][f"dup_{pre}_frac"] == round(dup, 6)


@given(_corpus)
@_SETTINGS
def test_cross_doc_spans_matches_bruteforce(spark, texts):
    n = 2
    got = {r["doc_id"]: r for r in
           cross_doc_span_stats(_df(spark, texts), n=n).collect()}
    per_doc = []
    for t in texts:
        toks = _toks(t)
        per_doc.append([" ".join(toks[j:j + n])
                        for j in range(len(toks) - n + 1)])
    vocab_docs = Counter()
    for grams in per_doc:
        for g in set(grams):
            vocab_docs[g] += 1
    for i, grams in enumerate(per_doc):
        shared = sum(1 for g in grams if vocab_docs[g] >= 2)
        assert got[i]["n_spans"] == len(grams)
        assert got[i]["n_shared_spans"] == shared


@given(_corpus)
@_SETTINGS
def test_unigram_lm_matches_bruteforce(spark, texts):
    got = {r["doc_id"]: r for r in
           unigram_lm_scores(_df(spark, texts)).collect()}
    freq = Counter(w for t in texts for w in _toks(t))
    total = sum(freq.values())
    for i, t in enumerate(texts):
        toks = _toks(t)
        if toks:
            bpt = sum(-math.log2(freq[w] / total) for w in toks) / len(toks)
        else:
            bpt = 0.0
        assert got[i]["n_tokens"] == len(toks)
        assert abs(got[i]["bits_per_token"] - bpt) < 1e-5


_pii_fragment = st.sampled_from([
    "plain words here", "x@y.io", "10.0.0.7", "555-867-5309",
    "a.b+c@sub.example.org", "1.2.3.4", "ver 1.2", "call 555 867 5309",
])
_pii_text = st.lists(_pii_fragment, min_size=0, max_size=5).map(" ".join)


@given(st.lists(_pii_text, min_size=1, max_size=5))
@_SETTINGS
def test_pii_redaction_matches_python_re_and_is_idempotent(spark, texts):
    df = _df(spark, texts)
    got = [r["text"] for r in redact_pii(df).orderBy("doc_id").collect()]
    # independent implementation via python re (same syntax subset)
    expect = []
    for t in texts:
        for _, pattern, tag in PII_PATTERNS:
            t = re.sub(pattern, tag, t)
        expect.append(t)
    assert got == expect
    # idempotence: a second scrub changes nothing
    redf = _df(spark, got)
    again = [r["text"] for r in redact_pii(redf).orderBy("doc_id").collect()]
    assert again == got
