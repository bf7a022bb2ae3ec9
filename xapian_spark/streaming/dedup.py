"""Streaming exact dedup: a custom stateful operator
(applyInPandasWithState) that emits only the FIRST occurrence of each
normalized-text fingerprint across the whole life of the stream.

This is the ingest-side twin of pipeline/dedup.deduplicate_exact: a
training-data pipeline deduplicates AT INGEST so duplicate pages never
reach the indexer or the corpus store. The reference has no streaming
surface; the Spark-native design is:

  readStream → fingerprint (md5 of whitespace-normalized lowercase
  text, same derivation as the batch op) → groupBy(fingerprint)
  → applyInPandasWithState:
      state per fingerprint = 1 once emitted;
      a group whose state exists emits nothing;
      a new group emits its lowest-doc_id row and sets state.

Scale notes (100 TB):
- state is keyed by the 32-char md5, value is a single int — the
  state store holds ~40 B per DISTINCT document ever seen. Exact
  forever-dedup is inherently O(distinct docs) state; bound it with
  `state_ttl` (processing-time timeout — classic for "dedup within N
  days", the usual policy for rolling crawls) or reconcile offline
  with the batch dedup.
- the shuffle is by fingerprint (uniform md5 — no skew), and only
  (doc_id, fp) rows move; text/html stay prunable until the emitted
  ids are joined back.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

OUTPUT_SCHEMA = "fp string, doc_id long"
STATE_SCHEMA = "seen int"


def _fingerprint(text_col: str):
    """EXACTLY pipeline/dedup's normalization (imported, not copied) —
    streaming and batch dedup must agree on what counts as a
    duplicate."""
    from xapian_spark.pipeline.dedup import _norm_text

    return F.md5(_norm_text(text_col))


def streaming_dedup_first(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    state_ttl: Optional[str] = None,
) -> DataFrame:
    """(fp, doc_id) of each fingerprint's FIRST-ever occurrence.

    Works on a streaming DataFrame (cross-micro-batch and
    cross-restart: the state store is checkpointed) and on a batch
    DataFrame (where it degrades to a plain groupBy-min — the
    correctness oracle for the stateful path).

    `state_ttl` (e.g. "30 days", processing-time) expires a
    fingerprint's state so re-crawls older than the TTL count as new —
    and bounds the state store for an infinite stream."""
    keyed = stream.select(
        F.col(id_col).cast("long").alias("doc_id"),
        _fingerprint(text_col).alias("fp"),
    )
    if not keyed.isStreaming:
        return (keyed.groupBy("fp")
                .agg(F.min("doc_id").alias("doc_id"))
                .select("fp", "doc_id"))

    ttl_ms = None
    if state_ttl is not None:
        # parse "N unit" with Spark's own CalendarInterval semantics:
        # accept plain "<n> <ms|seconds|minutes|hours|days>"
        qty, unit = state_ttl.split(None, 1)
        unit_ms = {"ms": 1, "milliseconds": 1, "seconds": 1000,
                   "second": 1000, "minutes": 60_000, "minute": 60_000,
                   "hours": 3_600_000, "hour": 3_600_000,
                   "days": 86_400_000, "day": 86_400_000}[unit.strip()]
        ttl_ms = int(float(qty) * unit_ms)

    def dedup_fn(key, pdf_iter, state):
        import pandas as pd

        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            for _ in pdf_iter:  # drain: already emitted this fp
                pass
            if ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
            return
        best = None
        for pdf in pdf_iter:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        state.update((1,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if best is not None:
            yield pd.DataFrame({"fp": [key[0]], "doc_id": [best]})

    timeout = (GroupStateTimeout.ProcessingTimeTimeout
               if ttl_ms is not None else GroupStateTimeout.NoTimeout)
    return (keyed.groupBy("fp")
            .applyInPandasWithState(
                dedup_fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append",
                timeout))


def drain_dedup(spark, source_dir: str, schema: str, out_dir: str,
                checkpoint: str, **kwargs):
    """Drain pending files through the stateful dedup into a parquet
    sink (availableNow; the file sink supports checkpoint recovery,
    unlike the memory sink). Re-running with the SAME checkpoint
    continues the state: fingerprints emitted in a prior drain are
    never emitted again. Returns the full output DataFrame."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    out = streaming_dedup_first(stream, **kwargs)
    q = (out.writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return spark.read.parquet(out_dir)
