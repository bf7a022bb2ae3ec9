"""CCNet-style paragraph dedup (pipeline/dedup.py paragraph_dedup)."""

from pyspark.sql import functions as F

from xapian_spark.pipeline.dedup import paragraph_dedup


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BANNER = "accept all cookies"


def test_first_occurrence_kept_later_dropped(spark):
    docs = _df(spark, [
        (1, f"{BANNER}\nunique one"),
        (2, f"{BANNER}\nunique two"),
        (3, f"unique three\n{BANNER}"),
    ])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text"] == f"{BANNER}\nunique one"
    assert out[2]["text"] == "unique two"
    assert out[3]["text"] == "unique three"
    assert out[2]["n_paras"] == 2 and out[2]["n_kept"] == 1


def test_within_doc_repeat_dropped(spark):
    docs = _df(spark, [(1, "a\nb\na\nc")])
    out = paragraph_dedup(docs).head()
    assert out["text"] == "a\nb\nc"
    assert out["n_paras"] == 4 and out["n_kept"] == 3


def test_fully_duplicated_doc_dropped_or_kept_empty(spark):
    docs = _df(spark, [(1, "x\ny"), (2, "y\nx")])
    out = paragraph_dedup(docs)
    assert [r["doc_id"] for r in out.collect()] == [1]
    kept = paragraph_dedup(docs, keep_empty_docs=True) \
        .orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [1, 2]
    assert kept[1]["text"] == "" and kept[1]["n_kept"] == 0
    assert kept[1]["n_paras"] == 2


def test_empty_paragraphs_ignored_order_preserved(spark):
    docs = _df(spark, [(1, "a\n\nb\n\n\nc")])
    out = paragraph_dedup(docs).head()
    assert out["text"] == "a\nb\nc"
    assert out["n_paras"] == 3 and out["n_kept"] == 3


def test_determinism_and_custom_sep(spark):
    docs = _df(spark, [(2, "p. q. r"), (1, "q. s")])
    out = {r["doc_id"]: r["text"] for r in
           paragraph_dedup(docs, sep=". ").collect()}
    # doc 1 wins "q" (lower doc_id), doc 2 keeps the rest
    assert out[1] == "q. s"
    assert out[2] == "p. r"


def test_matches_bruteforce_mirror(spark):
    import random

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    rows = [(i, "\n".join(" ".join(rng.choices(vocab, k=2))
                          for _ in range(rng.randint(1, 6))))
            for i in range(40)]
    seen, expect = set(), {}
    for i, text in rows:
        kept = []
        for p in text.split("\n"):
            if p and p not in seen:
                seen.add(p)
                kept.append(p)
        if kept:
            expect[i] = "\n".join(kept)
    got = {r["doc_id"]: r["text"] for r in
           paragraph_dedup(_df(spark, rows)).collect()}
    assert got == expect


def test_plan_jvm_side_and_algebraic_min(spark):
    docs = _df(spark, [(1, "a\nb")])
    plan = paragraph_dedup(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # the md5-keyed aggregation must be partial (map-side combine),
    # not a window rank — that's the skew-safety property
    assert "partial_min" in plan or "partial min" in plan.lower()
    assert "Window" not in plan

def test_long_boilerplate_doc(spark):
    """100k-line page: the kept-paragraph rebuild must be linear in
    kept positions (transform + element_at), not an array_contains
    scan per paragraph — this case is ~10^10 comparisons quadratic."""
    n = 100_000
    # doc 1 owns the boilerplate line; doc 2 is n copies of it with
    # one unique line buried in the middle
    big = "\n".join(["spam"] * (n // 2) + ["needle"] + ["spam"] * (n // 2))
    docs = _df(spark, [(1, "spam"), (2, big)])
    out = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert out[1]["text"] == "spam"
    assert out[2]["text"] == "needle"
    assert out[2]["n_paras"] == n + 1 and out[2]["n_kept"] == 1
