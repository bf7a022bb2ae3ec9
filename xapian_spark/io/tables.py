"""Format-agnostic table IO.

The production deployment reads the pages corpus from an Iceberg
catalog table and writes index tables back through the same catalog
(snapshot isolation gives the build's resume/commit semantics a second
layer beyond segment manifests). This container has no Iceberg runtime
jar, so the abstraction routes by spec and degrades to parquet:

    "table:prod.web.pages"  → spark.read.table("prod.web.pages")
                              (Iceberg/Hive/any catalog-registered table;
                              requires the session's catalog config, e.g.
                              spark.sql.catalog.prod =
                              org.apache.iceberg.spark.SparkCatalog)
    "/path/to/dir"          → spark.read.parquet(path)
    "*.orc"                 → spark.read.orc

Predicate pushdown / partition pruning semantics are identical across
the formats — everything upstream (build_segments, pipelines) takes a
DataFrame and is storage-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_PREFIX = "table:"


def read_table(spark: SparkSession, spec: str) -> DataFrame:
    if spec.startswith(TABLE_PREFIX):
        return spark.read.table(spec[len(TABLE_PREFIX):])
    if spec.endswith(".orc"):
        return spark.read.orc(spec)
    if spec.endswith(".json") or spec.endswith(".jsonl"):
        return spark.read.json(spec)
    if spec.endswith(".csv"):
        return spark.read.option("header", "true").csv(spec)
    return spark.read.parquet(spec)


def write_table(df: DataFrame, spec: str, mode: str = "append",
                partition_by=()) -> None:
    if spec.startswith(TABLE_PREFIX):
        w = df.writeTo(spec[len(TABLE_PREFIX):])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(spec)
