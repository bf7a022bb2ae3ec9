"""Deterministic sampling for training-data pipelines.

`df.sample()` draws from a per-partition RNG: results change with
partition layout, executor count, and Spark version — useless for
reproducible corpus construction at 100 TB. These operators hash the
ROW IDENTITY instead: a row is in the sample iff
md5(seed:id) mod M < fraction*M, so the same (seed, id) always decides
the same way — stable across runs, engines (the DuckDB oracle computes
the identical predicate), repartitioning, and incremental appends
(new rows don't disturb old decisions). Everything is built-in
pyspark.sql.functions — JVM-side inside whole-stage codegen, no
shuffle, no Python workers; the md5 predicate itself can't reach the
parquet reader (only plain comparisons push down) but column pruning
still does, so the scan reads only (id, strata) plus whatever the
caller selects.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M = 1 << 32


def _bucket(id_col: Column, seed: int) -> Column:
    """Uniform 32-bit bucket from md5(seed:id) — the same idiom the
    dedup minhash path uses (dedup.py shingle_hash)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(seed), id_col)), 1, 8),
        16, 10).cast("long")


def deterministic_sample(docs: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         seed: int = 42) -> DataFrame:
    """Keep each row iff hash(seed:id) < fraction of the hash space.
    Exactly reproducible; expected |sample| = fraction * |docs| with
    binomial concentration (exact per-row decisions, not a count
    target)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    thresh = int(fraction * _M)
    return docs.filter(_bucket(F.col(id_col), seed) < thresh)


def stratified_sample(docs: DataFrame, fractions: Dict[str, float],
                      strata_col: str = "lang",
                      id_col: str = "doc_id", seed: int = 42,
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixture primitive
    (e.g. keep 100% of rare languages, 10% of English). Strata absent
    from `fractions` fall back to default_fraction. One scan, no
    shuffle: the per-stratum threshold is a CASE expression the
    optimizer folds into the filter."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0,1]")
    thresh: Optional[Column] = None
    expr = F.lit(int(default_fraction * _M))
    for k, v in sorted(fractions.items()):
        cond = F.when(F.col(strata_col) == k, int(v * _M))
        expr = cond.otherwise(expr)
    thresh = expr
    return docs.filter(_bucket(F.col(id_col), seed) < thresh)
