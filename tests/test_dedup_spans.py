"""Exact-substring span dedup: hand cases + brute-force mirror."""

from xapian_spark.pipeline.dedup import dedup_spans


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _mirror(rows, n):
    """Brute-force replay: first occurrence per n-gram in (doc_id,
    pos) order survives; later occurrences' positions are removed."""
    toks = {i: t.lower().split() for i, t in rows}
    seen = {}
    removed = {i: set() for i, _ in rows}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - n + 1):
            g = tuple(ts[p:p + n])
            if g in seen:
                removed[i].update(range(p, p + n))
            else:
                seen[g] = (i, p)
    out = {}
    for i, _ in rows:
        kept = [t for j, t in enumerate(toks[i]) if j not in removed[i]]
        out[i] = (" ".join(kept), len(toks[i]), len(removed[i]))
    return out


def test_cross_doc_span_removed(spark):
    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "zeta alpha beta gamma delta eta")]
    got = {r.doc_id: r for r in
           dedup_spans(_df(spark, rows), n=4).collect()}
    # doc 1 untouched (first occurrence of its only 4-grams)
    assert got[1].text == "alpha beta gamma delta epsilon"
    assert got[1].n_removed == 0
    # doc 2: 'alpha beta gamma delta' (pos 1-4) is a dup -> removed
    assert got[2].text == "zeta eta"
    assert (got[2].n_tokens, got[2].n_removed) == (6, 4)


def test_within_doc_repeat_removed(spark):
    rows = [(1, "a b c d x a b c d")]
    got = dedup_spans(_df(spark, rows), n=4).collect()[0]
    assert got.text == "a b c d x"
    assert got.n_removed == 4


def test_first_occurrence_order_is_doc_then_pos(spark):
    # same 4-gram in docs 3 and 1: doc 1 wins (lower doc_id)
    rows = [(3, "p q r s tail"), (1, "head p q r s")]
    got = {r.doc_id: r for r in
           dedup_spans(_df(spark, rows), n=4).collect()}
    assert got[1].n_removed == 0
    assert got[3].text == "tail"


def test_short_docs_untouched(spark):
    rows = [(1, "one two three"), (2, "one two three")]
    got = {r.doc_id: r for r in
           dedup_spans(_df(spark, rows), n=4).collect()}
    assert got[1].n_removed == 0 and got[2].n_removed == 0
    assert got[2].text == "one two three"


def test_overlapping_windows_union(spark):
    # doc 2 repeats a 6-token phrase: three overlapping dup 4-gram
    # windows whose union is all 6 positions
    rows = [(1, "u v w x y z"), (2, "pre u v w x y z post")]
    got = {r.doc_id: r for r in
           dedup_spans(_df(spark, rows), n=4).collect()}
    assert got[2].text == "pre post"
    assert got[2].n_removed == 6


def test_brute_force_mirror(spark):
    vocab = ["red", "blue", "green", "gold", "gray", "teal"]
    rows = [(i, " ".join(vocab[(i * 7 + j) % len(vocab)]
                         for j in range(5 + i % 6)))
            for i in range(30)]
    want = _mirror(rows, 3)
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed)
           for r in dedup_spans(_df(spark, rows), n=3).collect()}
    assert got == want
