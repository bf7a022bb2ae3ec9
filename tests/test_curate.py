"""End-to-end curation chain — each stage's effect checked on a corpus
built to trip exactly one stage per doc; the sf0.01 chain is
value-checked (doc_ids + redacted text) by the driver gate (`curate`)."""

from xapian_spark.pipeline.curate import curate, curation_report


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = ("the data table holds a value and the query is fast and the "
        "row count is small but the scan is quick and the plan is good")


def corpus(spark):
    return _df(spark, [
        (1, GOOD),                          # survives everything
        (2, "x!!! ###"),                    # killed by quality gate
        (3, GOOD),                          # exact dup of 1 -> dropped
        (4, GOOD + " mail me at bob@example.com"),  # survives, redacted
        (5, "the benchmark eval question about spark shuffles "
            "appears here with the secret answer phrase included"),
    ])


def test_chain_stages(spark):
    ev = _df(spark, [(100, "the secret answer phrase included here")])
    out = {r["doc_id"]: r["text"] for r in curate(
        corpus(spark), ev, min_quality=0.5, decontam_n=5,
        sample_fraction=1.0).collect()}
    # 2 fails quality, 3 is a dup of 1, 5 shares a 5-gram with eval
    assert set(out) == {1, 4}
    assert out[4].endswith("mail me at <EMAIL>")
    assert out[1] == GOOD  # clean text untouched


def test_no_eval_set_skips_decontam(spark):
    out = curate(corpus(spark), None, min_quality=0.5,
                 sample_fraction=1.0)
    assert {r["doc_id"] for r in out.collect()} == {1, 4, 5}


def test_sampling_is_deterministic_subset(spark):
    full = {r["doc_id"] for r in curate(
        corpus(spark), None, min_quality=0.0, sample_fraction=1.0,
    ).collect()}
    half_a = {r["doc_id"] for r in curate(
        corpus(spark), None, min_quality=0.0, sample_fraction=0.5,
        seed=7).collect()}
    half_b = {r["doc_id"] for r in curate(
        corpus(spark), None, min_quality=0.0, sample_fraction=0.5,
        seed=7).collect()}
    assert half_a == half_b
    assert half_a <= full


def test_export_shards_roundtrip_and_determinism(spark, tmp_path):
    from xapian_spark.pipeline.curate import export_shards

    docs = _df(spark, [(i, f"doc number {i}") for i in range(100)])
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_shards(docs, p1, n_shards=4)
    export_shards(docs, p2, n_shards=4)
    back = spark.read.parquet(p1)
    assert back.count() == 100
    assert {r["doc_id"] for r in back.collect()} == set(range(100))
    shards = {r["shard"] for r in back.select("shard").distinct().collect()}
    assert shards == {0, 1, 2, 3}
    # identical assignment across runs
    a = {(r["doc_id"], r["shard"]) for r in back.collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(p2).collect()}
    assert a == b


def test_report_counts_monotone(spark):
    ev = _df(spark, [(100, "the secret answer phrase included here")])
    rep = curation_report(corpus(spark), ev, min_quality=0.5,
                          decontam_n=5, sample_fraction=1.0)
    assert rep["input"] == 5
    assert (rep["input"] >= rep["after_quality"] >= rep["after_dedup"]
            >= rep["after_decontam"] >= rep["after_sample"])
    assert rep["after_sample"] == 2
