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
