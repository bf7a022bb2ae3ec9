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
