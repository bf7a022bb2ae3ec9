"""Streaming corpus statistics: watermarked, windowed token counts.

The reference engine has no streaming surface; this is the
Spark-native operator a live ingest pipeline pairs with the
incremental indexer — event-time windowed term statistics
(readStream → withWatermark → window() groupBy), usable for trending
terms, ingest monitoring, or feeding the query-side stats cache.

All tokenization is JVM-side (lower + split + explode); state is
bounded by the watermark (late rows beyond `watermark` are dropped by
Spark's state store, and finalized windows are emitted exactly once in
append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.index.build import SIMPLE_SPLIT_RE


def windowed_token_counts(
    stream: DataFrame,
    ts_col: str = "warc_ts",
    text_col: str = "text",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(window struct, token, n) — event-time token counts per window.
    Works on both streaming and batch DataFrames (the batch plan is the
    correctness oracle for the streaming one)."""
    toks = stream.select(
        F.col(ts_col).alias("ts"),
        F.explode(
            F.filter(F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT_RE),
                     lambda t: t != "")
        ).alias("token"),
    )
    if toks.isStreaming:
        toks = toks.withWatermark("ts", watermark)
    return (
        toks.groupBy(F.window("ts", window).alias("window"), "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def run_to_memory(spark, source_dir: str, schema: str, query_name: str,
                  checkpoint: str, **kwargs):
    """Drain a file-source stream of documents into an in-memory table
    of windowed token counts (availableNow). Returns after completion;
    read results from `spark.table(query_name)`."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    counts = windowed_token_counts(stream, **kwargs)
    q = (
        counts.writeStream
        .outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def streaming_curation_filter(spark, source_dir: str, out_dir: str,
                              checkpoint: str, schema: str,
                              min_quality_keep: bool = True,
                              min_words: int = 50, min_lines: int = 3,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              available_now: bool = True):
    """The narrow curation filters as a Structured Streaming job:
    C4 line cleaning + Gopher quality over a file-source readStream,
    writing surviving (cleaned) docs to parquet. Works unchanged on a
    stream because every expression involved is a stateless per-row
    projection — the same operators, with the SAME default thresholds,
    as the batch pipeline (dedup and mixture sampling, which need
    corpus-wide state, belong in the batch layer or
    streaming/dedup.py's keyed-state path).

    Returns the StreamingQuery: available_now=True (default) drains
    the backlog and stops; False runs continuously."""
    from xapian_spark.pipeline.heuristics import c4_clean, gopher_keep_col

    stream = spark.readStream.schema(schema).parquet(source_dir)
    cleaned = c4_clean(stream, text_col, id_col, min_lines=min_lines)
    keep = cleaned.filter("keep").select(
        F.col("doc_id").alias(id_col),
        F.col("clean_text").alias(text_col))
    if min_quality_keep:
        # Column-form Gopher rule: a metrics-frame join back onto the
        # stream would be a stateful stream-stream join
        keep = keep.filter(
            gopher_keep_col(F.col(text_col), min_words=min_words))
    writer = (keep.writeStream
              .format("parquet")
              .option("path", out_dir)
              .option("checkpointLocation", checkpoint)
              .outputMode("append"))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
