"""Deterministic hash sampling: reproducible across partitionings,
correct per-stratum fractions, no Python in the plan."""

from pyspark.sql import functions as F

from xapian_spark.pipeline.sampling import (
    deterministic_sample, stratified_sample)


def test_repartition_invariant(spark):
    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("lang"))
    a = {r["doc_id"] for r in
         deterministic_sample(docs, 0.3, seed=9).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(docs.repartition(17), 0.3,
                              seed=9).collect()}
    assert a == b
    assert abs(len(a) / 5000 - 0.3) < 0.03


def test_stratified_fractions(spark):
    docs = spark.range(0, 9000).select(
        F.col("id").alias("doc_id"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"))
    out = stratified_sample(docs, {"en": 0.5, "de": 1.0},
                            default_fraction=0.0, seed=3)
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n"))
              .collect()}
    assert counts.get("de") == 3000          # keep all
    assert "fr" not in counts                # default 0
    assert abs(counts["en"] / 3000 - 0.5) < 0.05


def test_plan_is_jvm_only(spark):
    docs = spark.range(0, 100).select(F.col("id").alias("doc_id"),
                                      F.lit("en").alias("lang"))
    plan = stratified_sample(docs, {"en": 0.5})._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_bpe_token_counts(spark):
    from xapian_spark.pipeline.textstats import bpe_token_counts

    docs = spark.createDataFrame(
        [(1, "The model's weights converged in 3.5 hours!"),
         (2, "hello   world"), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bpe_token_counts(docs).collect()}
    # "The| model|'s| weights| converged| in| 3|.|5| hours|!" = 11
    assert rows[1]["n_bpe_pieces"] == 11
    # the|model|s|weights|converged|in|3|5|hours (split on [^a-z0-9])
    assert rows[1]["n_words"] == 9
    assert rows[2]["n_bpe_pieces"] == 2
    assert rows[3]["n_bpe_pieces"] == 0
    assert rows[3]["pieces_per_word"] == 0.0


def test_plan_no_shuffle(spark):
    """Sampling is a pure filter: the physical plan contains no
    Exchange (shuffle) and stays in one WholeStageCodegen span."""
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    plan = stratified_sample(docs, {"en": 0.5})._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # "*(1)" is the whole-stage-codegen span marker in toString()
    assert "*(1)" in plan


# --------------------------------------------------------------------------
# token-budget water-filling (heuristics.budget_mixture_alloc / apply)
# --------------------------------------------------------------------------

def _py_waterfill(doms, budget, max_epochs, rounds=6):
    alloc = {d: 0 for d, _ in doms}
    caps = {d: max_epochs * t for d, t in doms}
    rem = budget
    for _ in range(rounds):
        open_ = [d for d, _ in doms if alloc[d] < caps[d]]
        if not open_ or rem <= 0:
            break
        share = rem // len(open_)
        if share == 0:
            break
        for d in open_:
            give = min(share, caps[d] - alloc[d])
            alloc[d] += give
            rem -= give
    return alloc


def test_budget_waterfill_caps_and_exactness(spark):
    from xapian_spark.pipeline.heuristics import budget_mixture_alloc

    rows = [(i, "big" if i < 80 else "small", 100) for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long")
    # budget 4x total with max 3 epochs: small caps out, big absorbs
    alloc = budget_mixture_alloc(docs, budget=40_000, max_epochs=3)
    got = {d: a for d, _t, a in alloc}
    want = _py_waterfill([("big", 8000), ("small", 2000)], 40_000, 3)
    assert got == want
    assert got["small"] == 6000            # capped at 3 epochs
    assert got["big"] == 24000             # capped too (3 * 8000)
    # epoch caps bound every domain: alloc <= 3t
    for d, t, a in alloc:
        assert a <= 3 * t


def test_budget_apply_epoch_counts(spark):
    from xapian_spark.pipeline.heuristics import (
        apply_budget_mixture, budget_mixture_alloc)

    rows = [(i, "only", 10) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, n_chars long")
    # budget = 2.5 epochs: every doc twice + ~half a third time
    alloc = budget_mixture_alloc(docs, budget=1250, max_epochs=4)
    out = apply_budget_mixture(docs, alloc)
    assert out.columns == ["lang", "doc_id", "n_chars", "epoch"]
    per_doc = {r["doc_id"]: r["n"] for r in
               out.groupBy("doc_id").agg(
                   __import__("pyspark.sql.functions",
                              fromlist=["count"]).count("*").alias("n")
               ).collect()}
    assert all(v in (2, 3) for v in per_doc.values())
    n3 = sum(1 for v in per_doc.values() if v == 3)
    assert 10 <= n3 <= 40  # ~half, md5-deterministic
    # deterministic: same output both runs
    again = apply_budget_mixture(docs, alloc)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))


def test_budget_validation(spark):
    import pytest as _pytest

    from xapian_spark.pipeline.heuristics import budget_mixture_alloc

    docs = spark.createDataFrame(
        [(1, "x", 5)], "doc_id long, lang string, n_chars long")
    with _pytest.raises(ValueError):
        budget_mixture_alloc(docs, budget=-1)
    with _pytest.raises(ValueError):
        budget_mixture_alloc(docs, budget=10, max_epochs=0)


def test_dedup_report_histogram(spark):
    from xapian_spark.pipeline.dedup import dedup_report

    rows = ([(i, "unique text %d" % i) for i in range(6)]
            + [(10 + i, "dup A") for i in range(3)]
            + [(20 + i, "dup  a  ") for i in range(2)]  # → 'dup a'
            + [(30 + i, "pair") for i in range(2)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["cluster_size"]: (r["n_clusters"], r["n_docs"],
                               r["pct_docs"])
           for r in dedup_report(docs).collect()}
    # 'dup A' x3 and 'dup  a  ' x2 normalize to the same 'dup a' -> 5
    assert got[5] == (1, 5, round(5 / 13, 6))
    assert got[2] == (1, 2, round(2 / 13, 6))
    assert got[1] == (6, 6, round(6 / 13, 6))
