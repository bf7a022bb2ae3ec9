"""End-to-end corpus curation — the RefinedWeb/Dolma-style chain as
one composable operator over a documents DataFrame:

    1. quality gate      (heuristic composite score >= threshold)
    2. exact dedup       (lowest doc_id per normalized-text md5)
    3. decontamination   (drop docs sharing any word n-gram with a
                          broadcast eval set)
    4. deterministic sample (seeded hash keep — reproducible mixture)
    5. PII redaction     (scrub only the SURVIVING docs — cheapest
                          last, it touches the fewest rows)

Every stage is an existing first-class operator; this module only
fixes the order and threads the frame through. The whole chain stays
lazy — one action executes the fused plan, and each stage keeps its
own scale shape (narrow filters, one md5-keyed shuffle for dedup, a
broadcast-hash join for decontamination).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.pipeline.dedup import decontaminate_apply, deduplicate_exact
from xapian_spark.pipeline.pii import redact_pii
from xapian_spark.pipeline.sampling import deterministic_sample
from xapian_spark.pipeline.textstats import quality_scores


def curate(docs: DataFrame, eval_docs: DataFrame | None = None,
           text_col: str = "text", id_col: str = "doc_id",
           min_quality: float = 0.5, decontam_n: int = 8,
           sample_fraction: float = 1.0, seed: int = 42) -> DataFrame:
    """The curated corpus: `docs` rows surviving all five stages, with
    `text_col` PII-scrubbed. Deterministic end to end — same input and
    knobs always yield the same corpus (quality score is rounded, the
    dedup survivor rule is lowest doc_id, the sample is a seeded hash
    predicate)."""
    q = (quality_scores(docs, text_col, id_col)
         .filter(F.col("quality") >= min_quality)
         .select(F.col("doc_id").alias(id_col)))
    pool = docs.join(q, id_col)
    pool = deduplicate_exact(pool, text_col, id_col)
    if eval_docs is not None:
        pool = decontaminate_apply(pool, eval_docs, text_col, id_col,
                                   decontam_n)
    pool = deterministic_sample(pool, sample_fraction, id_col, seed)
    return redact_pii(pool, text_col)


def export_shards(df: DataFrame, path: str, n_shards: int,
                  id_col: str = "doc_id", seed: int = 0) -> None:
    """Write the curated corpus as `n_shards` deterministic,
    size-balanced shards (`shard=NNN/` parquet dirs) for trainer-side
    streaming. Shard assignment is a seeded hash of the doc id —
    stable across runs AND cluster sizes (spark_partition_id would
    change with parallelism), so a re-export after an incremental
    update moves only the docs that changed. One shuffle keyed by the
    shard id; shard sizes concentrate around |df|/n_shards by hash
    uniformity."""
    from xapian_spark.pipeline.sampling import _bucket

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    out = df.withColumn(
        "shard", (_bucket(F.col(id_col), seed) % n_shards).cast("int"))
    (out.repartition(n_shards, F.col("shard"))
        .write.partitionBy("shard").mode("overwrite").parquet(path))


def curation_report(docs: DataFrame, eval_docs: DataFrame | None = None,
                    **kwargs) -> dict:
    """Per-stage surviving-doc counts (runs the chain's prefixes; for
    monitoring, not the hot path)."""
    text_col = kwargs.get("text_col", "text")
    id_col = kwargs.get("id_col", "doc_id")
    report = {"input": docs.count()}
    q = (quality_scores(docs, text_col, id_col)
         .filter(F.col("quality") >= kwargs.get("min_quality", 0.5))
         .select(F.col("doc_id").alias(id_col)))
    pool = docs.join(q, id_col)
    report["after_quality"] = pool.count()
    pool = deduplicate_exact(pool, text_col, id_col)
    report["after_dedup"] = pool.count()
    if eval_docs is not None:
        pool = decontaminate_apply(pool, eval_docs, text_col, id_col,
                                   kwargs.get("decontam_n", 8))
        report["after_decontam"] = pool.count()
    pool = deterministic_sample(pool, kwargs.get("sample_fraction", 1.0),
                                id_col, kwargs.get("seed", 42))
    report["after_sample"] = pool.count()
    return report


def pack_sequences(docs: DataFrame, seq_len: int,
                   text_col: str = "text", id_col: str = "doc_id",
                   n_shards: int = 256, seed: int = 0) -> DataFrame:
    """GPT-style concat-and-chunk packing accounting: documents are
    concatenated in (shard, doc_id) order into one token stream per
    shard, and the stream is cut into fixed `seq_len`-token training
    sequences (documents cross sequence boundaries, as in GPT-2/3
    pretraining). Returns, per document:

        (doc_id, shard, n_tokens, start_offset, start_seq, end_seq)

    where start_offset is the document's position in its shard's token
    stream and [start_seq, end_seq] the range of training sequences it
    touches — everything a loader needs to materialize sequence k of
    shard s without scanning the rest of the corpus. Tokens are the
    pipeline's normalized [a-z0-9]+ words; swap in BPE piece counts by
    packing `encode_with_vocab` output instead.

    Determinism and scale: shard = seeded hash of the doc id (stable
    across runs and cluster sizes, same idiom as export_shards); the
    running offset is a per-shard window cumsum — ONE shuffle by
    shard, and each shard sorts locally by doc_id. Size n_shards so a
    shard's doc keys fit one task (at fixed n_shards the per-shard
    sort grows with corpus size; production picks n_shards ~
    corpus_tokens / 10^9). Zero-token docs get an empty range
    (end_seq = start_seq - 1 convention is avoided: they report
    start_seq = end_seq = the sequence at their offset, n_tokens = 0).
    """
    from pyspark.sql import Window

    from xapian_spark.pipeline.sampling import _bucket
    from xapian_spark.pipeline.textstats import tokens_col

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    n_tok = F.size(tokens_col(F.col(text_col))).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (_bucket(F.col(id_col), seed) % n_shards).cast("int")
        .alias("shard"),
        n_tok.alias("n_tokens"),
    )
    # ROWS frame, not the default RANGE: RANGE treats order-by ties as
    # peers, so duplicate doc ids would each absorb the other's tokens
    # into their own running sum (overlapping offsets). Ids are
    # expected unique; with ROWS a duplicate still gets a
    # non-overlapping (if arbitrary-ordered) slot instead of a
    # corrupted one.
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    end = F.sum("n_tokens").over(w)               # inclusive cumsum
    return base.select(
        "doc_id", "shard", "n_tokens",
        (end - F.col("n_tokens")).alias("start_offset"),
        F.floor((end - F.col("n_tokens")) / seq_len).cast("long")
        .alias("start_seq"),
        F.floor(F.greatest(end - 1, end - F.col("n_tokens")) / seq_len)
        .cast("long").alias("end_seq"),
    )
