"""Incremental indexing via Structured Streaming.

The reference has no streaming operators; its incremental story is
WritableDatabase transactions flushed every XAPIAN_FLUSH_THRESHOLD docs
(backends/brass/brass_database.cc:1395-1430) plus replication
changesets. The Spark-native restatement: a file-source readStream over
an arriving-documents directory, with each micro-batch committed as a
fresh, disjoint range of segments through the same build_segments path
(manifest rows = the revision log; exactly-once via the streaming
checkpoint + idempotent per-batch seg_id ranges).

- Each batch b gets seg_ids [offset_b, offset_b + segments_per_batch):
  offsets come from the batch id, so a REPLAYED batch (failure before
  checkpoint commit) rewrites the same seg_ids — build_segments'
  resume skips already-manifested segments, making the sink
  effectively idempotent.
- Query side needs no changes: SegmentIndex reads all segments; the
  WAND kernel treats each as a sub-database.
- A compaction pass (merge small segments) can run offline at any
  time, exactly like xapian-compact against a live database.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

from xapian_spark.index.segments import SegmentIndex, build_segments


def incremental_index_stream(
    spark: SparkSession,
    input_dir: str,
    index_path: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    segments_per_batch: int = 8,
    analyzer: str = "xapian",
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
):
    """Start (or resume) the incremental index build. Returns the
    StreamingQuery; with trigger_available_now the query drains all
    pending files then stops — the cron-batch deployment mode."""

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        build_segments(
            batch_df, index_path,
            n_segments=segments_per_batch,
            text_col=text_col, id_col=id_col, analyzer=analyzer,
            input_desc=f"stream batch {batch_id}",
            resume=True,
            seg_id_offset=int(batch_id) * segments_per_batch,
        )

    reader = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    writer = (
        reader.writeStream
        .foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(spark: SparkSession, input_dir: str, index_path: str,
          checkpoint_dir: str, **kwargs) -> SegmentIndex:
    """Run one availableNow pass over pending files and return the
    resulting index."""
    q = incremental_index_stream(
        spark, input_dir, index_path, checkpoint_dir,
        trigger_available_now=True, **kwargs)
    q.awaitTermination()
    return SegmentIndex(spark, index_path)
