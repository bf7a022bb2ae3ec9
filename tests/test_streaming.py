"""Incremental (Structured Streaming) index build: batch commits append
disjoint segment ranges; the final index equals a one-shot build over
the same docs; new files after a drain add only new segments."""

import pytest
from pyspark.sql import functions as F

from xapian_spark.index.build import build_index
from xapian_spark.index.codec import decode_chunk
from xapian_spark.streaming.incremental import drain


def _decoded(seg):
    out = {}
    for r in seg.postings_chunks.collect():
        ids, w, _dl = decode_chunk(bytes(r["data"]))
        for i, d in enumerate(ids):
            out[(r["term"], int(d))] = int(w[i])
    return out


@pytest.fixture()
def dirs(tmp_path):
    (tmp_path / "in").mkdir()
    return (str(tmp_path / "in"), str(tmp_path / "idx"),
            str(tmp_path / "ckpt"))


def test_streaming_matches_batch_build(spark, dirs):
    input_dir, index_path, ckpt = dirs
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text")
    first = docs.filter(F.col("doc_id") < 30)
    rest = docs.filter(F.col("doc_id") >= 30)

    first.write.parquet(f"{input_dir}/p0")
    seg = drain(spark, f"{input_dir}/*", index_path, ckpt,
                analyzer="simple", segments_per_batch=4)
    n_docs_1 = seg.stats().doccount
    assert n_docs_1 == first.count()
    segs_1 = {r["seg_id"] for r in seg.manifest().collect()}

    # second drop of files → only new segments appear
    rest.write.parquet(f"{input_dir}/p1")
    seg._stats = None
    seg = drain(spark, f"{input_dir}/*", index_path, ckpt,
                analyzer="simple", segments_per_batch=4)
    assert seg.stats().doccount == docs.count()
    segs_2 = {r["seg_id"] for r in seg.manifest().collect()}
    assert segs_1 < segs_2
    assert all(s not in segs_1 for s in segs_2 - segs_1)

    # postings identical to a one-shot batch build
    flat = build_index(docs, analyzer="simple")
    flat_map = {(r["term"], r["doc_id"]): r["wdf"]
                for r in flat.postings.collect()}
    assert _decoded(seg) == flat_map

    # and the index answers queries (rank-identical to the flat path)
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire
    from xapian_spark.query.wand import WandEnquire

    want = [(r["doc_id"], round(r["score"], 10)) for r in
            Enquire(flat).get_mset(ops.Or(
                [ops.Term("batch"), ops.Term("scan")]), 0, 10).collect()]
    got = [(r["doc_id"], round(r["score"], 10)) for r in
           WandEnquire(seg).get_mset(["batch", "scan"], 10).collect()]
    assert got == want


def test_windowed_token_counts_matches_batch(spark, tmp_path):
    """Streaming watermarked window agg == the batch plan on the same
    input (append mode emits only watermark-finalized windows, so feed
    a late second batch to close the first hour)."""
    import datetime

    from xapian_spark.streaming.stats import (
        run_to_memory, windowed_token_counts,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows1 = [
        (base + datetime.timedelta(minutes=m), f"alpha beta gamma d{m}")
        for m in (0, 10, 50)
    ]
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    df1 = spark.createDataFrame(rows1, "warc_ts timestamp, text string")
    df1.write.parquet(str(in_dir / "b1"))
    # a much later file advances the watermark past hour 0
    rows2 = [(base + datetime.timedelta(hours=6), "omega")]
    spark.createDataFrame(rows2, "warc_ts timestamp, text string") \
        .write.parquet(str(in_dir / "b2"))

    run_to_memory(spark, f"{in_dir}/*", "warc_ts timestamp, text string",
                  "wtc_test", str(tmp_path / "ckpt"),
                  window="1 hour", watermark="1 hour")
    got = {
        (r["window"]["start"].isoformat(), r["token"]): r["n"]
        for r in spark.table("wtc_test").collect()
    }
    # hour-0 window is finalized and emitted with the batch-side counts
    batch = windowed_token_counts(
        df1, window="1 hour", watermark="1 hour")
    want = {
        (r["window"]["start"].isoformat(), r["token"]): r["n"]
        for r in batch.collect()
    }
    for k, v in want.items():
        assert got.get(k) == v, (k, v, got.get(k))
    assert got[("2024-01-01T00:00:00", "alpha")] == 3


def test_read_table_specs(spark, tmp_path):
    from xapian_spark.io.tables import read_table, write_table

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(20)
    p = str(tmp_path / "t.parquet")
    write_table(docs, p, mode="overwrite")
    assert read_table(spark, p).count() == 20
    docs.createOrReplaceTempView("pages_view")
    assert read_table(spark, "table:pages_view").count() == 20


def test_streaming_dedup_stateful_across_drains(spark, tmp_path):
    """applyInPandasWithState dedup: only the first-ever occurrence of
    a fingerprint is emitted — within a drain AND across drains (the
    state store persists via the checkpoint)."""
    from xapian_spark.streaming.dedup import drain_dedup

    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "doc_id long, text string"

    spark.createDataFrame(
        [(1, "alpha beta"), (2, "ALPHA   beta"),  # dup of 1 (normed)
         (3, "gamma"), (4, "delta")],
        schema).write.parquet(str(src / "p0"))
    res = drain_dedup(spark, f"{src}/*", schema, out, ckpt)
    got1 = {r["doc_id"] for r in res.collect()}
    assert got1 == {1, 3, 4}

    # second drain: 5 repeats doc 3's text → suppressed by STATE;
    # 6 is genuinely new → emitted
    spark.createDataFrame(
        [(5, "gamma"), (6, "epsilon")],
        schema).write.parquet(str(src / "p1"))
    res = drain_dedup(spark, f"{src}/*", schema, out, ckpt)
    got2 = {r["doc_id"] for r in res.collect()} - got1
    assert got2 == {6}


def test_streaming_dedup_batch_oracle(spark):
    """The batch degradation (groupBy-min) IS the oracle: same rows as
    the pipeline's exact dedup first-occurrence policy."""
    from xapian_spark.pipeline.dedup import deduplicate_exact
    from xapian_spark.streaming.dedup import streaming_dedup_first

    docs = (spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(100))
    a = {r["doc_id"] for r in
         streaming_dedup_first(docs).collect()}
    b = {r["doc_id"] for r in deduplicate_exact(docs).collect()}
    assert a == b


def test_streaming_curation_filter_batch_equivalent(spark, tmp_path):
    """The narrow curation filters run unchanged as a Structured
    Streaming job: the streaming output is compared row-for-row
    against the SAME operators run in batch with the SAME thresholds
    (a true equivalence check, like the streaming-dedup oracle)."""
    from pyspark.sql import functions as F

    from xapian_spark.pipeline.heuristics import c4_clean, gopher_keep_col
    from xapian_spark.streaming.stats import streaming_curation_filter

    src = str(tmp_path / "in")
    good = ("The first fine sentence of the page ends here and that "
            "is that with more of the words we have to offer today.\n"
            "Another full sentence with the same easy shape of words "
            "and that extra bit to clear the bar!")
    rows = [(1, good), (2, "no terminal punctuation at all"),
            (3, "Short."), (4, good.replace("sentence", "phrase"))]
    batch_in = spark.createDataFrame(rows, "doc_id long, text string")
    batch_in.write.parquet(src)
    q = streaming_curation_filter(
        spark, src, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        schema="doc_id long, text string", min_words=20, min_lines=2)
    assert q.awaitTermination(300), "stream did not drain in time"
    got = {(r.doc_id, r.text) for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}

    batch = (c4_clean(batch_in, min_lines=2).filter("keep")
             .select("doc_id", F.col("clean_text").alias("text"))
             .filter(gopher_keep_col(F.col("text"), min_words=20)))
    want = {(r.doc_id, r.text) for r in batch.collect()}
    assert got == want and {d for d, _ in got} == {1, 4}
