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
