"""GPT-3-style quality classifier for training-data curation.

GPT-3 (Brown et al. 2020, appendix A) and LLaMA filter Common Crawl
with a linear classifier trained to separate high-quality reference
text from raw web pages, then keep documents stochastically by
predicted quality. This is that component as a pure-DataFrame
operator: full-batch logistic regression over the engine's own
quality features, trained with one aggregation job per gradient step.

Scale shape: each training iteration is one narrow scan + map-side
partial aggregation producing a single gradient row (the corpus is
NEVER collected; only the d+1 weight scalars live on the driver and
re-enter the next iteration's plan as literals). Scoring is a pure
per-row projection. Features are rounded to 6 decimals BEFORE
training, which makes the whole optimization reproducible bit-for-bit
across engines up to float-sum ordering (~1e-12 after 10 iterations)
— the DuckDB oracle replays the identical unrolled iterations.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xapian_spark.pipeline.textstats import quality_scores

# intercept is implicit; weights are [w0, w_alpha, w_stop, w_ttr, w_punct]
FEATURE_COLS = ("alpha_ratio", "stopword_ratio", "type_token_ratio",
                "punct_ratio")


def classifier_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """(doc_id, *FEATURE_COLS) — the quality_scores ratios, already
    rounded to 6 decimals (see module docstring: rounding fixes the
    training input exactly)."""
    return quality_scores(docs, text_col, id_col).select(
        "doc_id", *FEATURE_COLS)


def _z(weights: list, feature_cols=FEATURE_COLS) -> Column:
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def train_logreg(feats: DataFrame, label_col: str = "label",
                 feature_cols=FEATURE_COLS, iters: int = 10,
                 lr: float = 1.0) -> list:
    """Full-batch gradient descent on logistic loss from w = 0:
    w <- w - lr * avg((sigmoid(x.w) - y) * x). Returns the d+1 weights
    (intercept first). Full-batch (not SGD) so the result is
    independent of row order and partitioning — reproducible, and the
    gradient is one aggregation job per iteration at any corpus size."""
    w = [0.0] * (len(feature_cols) + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, feature_cols)))
        err = p - F.col(label_col).cast("double")
        aggs = [F.avg(err).alias("g0")]
        aggs += [F.avg(err * F.col(c)).alias(f"g{i + 1}")
                 for i, c in enumerate(feature_cols)]
        g = feats.agg(*aggs).collect()[0]
        w = [w[i] - lr * g[f"g{i}"] for i in range(len(w))]
    return w


def score_logreg(feats: DataFrame, weights: list,
                 feature_cols=FEATURE_COLS) -> DataFrame:
    """(doc_id, prob, pred) — sigmoid score and 0.5-threshold class,
    a pure narrow projection."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, feature_cols)))
    return feats.select(
        "doc_id",
        F.round(p, 6).alias("prob"),
        (p >= 0.5).cast("int").alias("pred"),
    )


def pareto_keep_probability(prob: Column, alpha: float = 9.0) -> Column:
    """GPT-3's stochastic keep rule (appendix A): keep a document when
    np.random.pareto(alpha) > 1 - score. Returned as the KEEP
    PROBABILITY P[pareto(alpha) > 1 - prob] = (2 - prob)^-alpha
    (deterministic column; callers pair it with a seeded hash draw,
    e.g. sampling.deterministic_sample, instead of np.random)."""
    return (F.lit(2.0) - prob) ** F.lit(-float(alpha))


def logloss(feats: DataFrame, weights: list, label_col: str = "label",
            feature_cols=FEATURE_COLS) -> float:
    """Mean logistic loss of `weights` on `feats` — one aggregation."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights, feature_cols)))
    y = F.col(label_col).cast("double")
    eps = F.lit(1e-12)
    ll = -(y * F.log(F.greatest(p, eps))
           + (F.lit(1.0) - y) * F.log(F.greatest(F.lit(1.0) - p, eps)))
    row = feats.agg(F.avg(ll).alias("loss")).collect()[0]
    return float(row["loss"])


def brute_force_logreg(rows: list, iters: int = 10,
                       lr: float = 1.0) -> list:
    """Driver-side mirror of train_logreg for tests: rows =
    [(y, f1..fd)]. Same math, pure Python."""
    d = len(rows[0]) - 1
    w = [0.0] * (d + 1)
    n = len(rows)
    for _ in range(iters):
        g = [0.0] * (d + 1)
        for row in rows:
            y, x = row[0], row[1:]
            z = w[0] + sum(wi * xi for wi, xi in zip(w[1:], x))
            p = 1.0 / (1.0 + math.exp(-z))
            g[0] += (p - y) / n
            for i, xi in enumerate(x):
                g[i + 1] += (p - y) * xi / n
        w = [w[i] - lr * g[i] for i in range(d + 1)]
    return w
