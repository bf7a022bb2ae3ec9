"""Learning-to-rank: the xapian-letor feature scheme + ListNet.

Spark restatement of the reference's separate letor library
(/root/reference/xapian-letor/):

- 19 features per (query, doc) — FeatureManager::transform
  (featuremanager.cc:137-178): f1..f6 each over title ('S'-prefixed
  terms) / body / whole document, plus f19 = the retrieval weight
  (BM25). Feature formulas from letor_features.cc:
      f1 = Σ_q log10(1 + tf_d[q])
      f2 = Σ_q log10(1 + tf_d[q] / doc_len)
      f3 = Σ_q log10(1 + idf[q]),  idf = log10(N // (1 + df))
           (integer quotient — the reference divides two long ints,
           letor_features.cc:58; replicated faithfully)
      f4 = Σ_q log10(1 + coll_len / (1 + cf[q]))
      f5 = Σ_q log10(1 + tf_d[q]·idf[q] / (1 + doc_len))
      f6 = Σ_q log10(1 + tf_d[q]·coll_len / (1 + doc_len·cf[q]))
  title doc_len = Σ wdf over the doc's 'S'-prefix terms
  (letor_features.cc:67-84); whole = doclen; body = whole − title;
  collection lengths likewise (:86-105, whole = avlen·doccount).
  A query term counts toward 'title' when it starts with 'S' or has
  'S' second (the Z-stemmed "ZS..." form), else 'body'
  (calculate_f1 .. f6 prefix tests).

- ListNet (listnet.cc:148-200): top-one permutation-probability
  cross-entropy, batch gradient descent over per-query ranklists.
  Divergence: the reference's training loop indexes `samples[i]`
  with the OUTER iteration counter (listnet.cc:157 — an indexing
  bug); we train on `samples[j]` as intended.

Feature extraction is one Spark job over the postings table (pure
column expressions); training is driver-side NumPy over the collected
per-query ranklists (training data is small); scoring is a dot-product
Column over the feature frame — distributed.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.index.build import InvertedIndex

N_FEATURES = 19


def _is_title_term(t: str) -> bool:
    return t.startswith("S") or (len(t) > 1 and t[1] == "S")


def extract_features(
    index: InvertedIndex,
    query_terms: Sequence[str],
    doc_ids: Optional[DataFrame] = None,
    weight_df: Optional[DataFrame] = None,
) -> DataFrame:
    """(doc_id, f1..f19) for every doc matching ≥1 query term (or the
    docs in `doc_ids`). `weight_df` (doc_id, score) supplies f19 —
    typically Enquire.get_mset's output; 0.0 when absent."""
    spark = index.postings.sparkSession
    st = index.stats
    n = st.doccount

    stats_rows = {
        r["term"]: (r["tf"], r["cf"]) for r in
        index.term_stats.filter(
            F.col("term").isin(list(query_terms))).collect()
    }
    title_cl = (index.postings.filter(F.col("term").startswith("S"))
                .agg(F.coalesce(F.sum("wdf"), F.lit(0))).head()[0])
    coll_len = {
        "whole": st.average_length * n,
    }
    coll_len["title"] = float(title_cl)
    coll_len["body"] = coll_len["whole"] - coll_len["title"]

    idf = {}
    cf = {}
    for t in query_terms:
        tf_t, cf_t = stats_rows.get(t, (0, 0))
        # guard q == 0 (term in every doc): C++ log10(0) is -inf, which
        # would poison every downstream feature sum — clamp to 0.0
        q = n // (1 + tf_t)
        idf[t] = math.log10(q) if (tf_t and q > 0) else 0.0
        cf[t] = cf_t

    # per-doc title length (Σ wdf over 'S'-prefix terms)
    title_len = (
        index.postings.filter(F.col("term").startswith("S"))
        .groupBy("doc_id")
        .agg(F.sum("wdf").cast("double").alias("_title_len"))
    )

    base = (
        index.postings
        .filter(F.col("term").isin(list(query_terms)))
        .join(title_len, "doc_id", "left")
        .fillna(0.0, subset=["_title_len"])
        .withColumn("_whole_len", F.col("doclen").cast("double"))
        .withColumn("_body_len",
                    F.col("_whole_len") - F.col("_title_len"))
    )

    def fsum(part_fn, which: str):
        """Σ over query terms of a per-(term,doc) log10(1+·) part."""
        acc = None
        for t in query_terms:
            if which == "t" and not _is_title_term(t):
                continue
            if which == "b" and _is_title_term(t):
                continue
            e = F.when(F.col("term") == t, part_fn(t)).otherwise(0.0)
            acc = e if acc is None else acc + e
        return F.sum(acc if acc is not None else F.lit(0.0))

    wdf = F.col("wdf").cast("double")

    def lens(which):
        return {"t": F.col("_title_len"), "b": F.col("_body_len"),
                "w": F.col("_whole_len")}[which]

    def cl(which):
        return {"t": coll_len["title"], "b": coll_len["body"],
                "w": coll_len["whole"]}[which]

    aggs = []
    i = 0
    for which in ("t", "b", "w"):
        i += 1
        aggs.append(fsum(lambda t: F.log10(1.0 + wdf), which)
                    .alias(f"f{i}"))
    for which in ("t", "b", "w"):
        i += 1
        aggs.append(fsum(
            lambda t, w=which: F.log10(1.0 + wdf / lens(w)), which)
            .alias(f"f{i}"))
    # f7..f12 are document-independent (idf / collection stats only):
    # the reference sums over ALL query terms whether or not the doc
    # contains them (calculate_f3/f4 iterate the query, not the doc) —
    # attached as literal columns after the aggregation
    def qsum(val_fn, which: str) -> float:
        total = 0.0
        for t in query_terms:
            if which == "t" and not _is_title_term(t):
                continue
            if which == "b" and _is_title_term(t):
                continue
            total += val_fn(t)
        return total

    lit_cols = {}
    for which in ("t", "b", "w"):
        i += 1
        lit_cols[f"f{i}"] = qsum(
            lambda t: math.log10(1.0 + idf[t]), which)
    for which in ("t", "b", "w"):
        i += 1
        lit_cols[f"f{i}"] = qsum(
            lambda t, w=which: math.log10(
                1.0 + cl(w) / (1.0 + float(cf[t]))), which)
    for which in ("t", "b", "w"):
        i += 1
        aggs.append(fsum(
            lambda t, w=which: F.log10(
                1.0 + wdf * F.lit(idf[t]) / (1.0 + lens(w))), which)
            .alias(f"f{i}"))
    for which in ("t", "b", "w"):
        i += 1
        aggs.append(fsum(
            lambda t, w=which: F.log10(
                1.0 + wdf * F.lit(cl(w))
                / (1.0 + lens(w) * F.lit(float(cf[t])))), which)
            .alias(f"f{i}"))

    feats = base.groupBy("doc_id").agg(*aggs)
    for name, val in lit_cols.items():
        feats = feats.withColumn(name, F.lit(float(val)))
    if weight_df is not None:
        feats = (feats.join(
            weight_df.select("doc_id",
                             F.col("score").alias("f19")),
            "doc_id", "left").fillna(0.0, subset=["f19"]))
    else:
        feats = feats.withColumn("f19", F.lit(0.0))
    if doc_ids is not None:
        feats = feats.join(doc_ids.select("doc_id"), "doc_id",
                           "left_semi")
    return feats.select(
        "doc_id", *[f"f{j}" for j in range(1, N_FEATURES + 1)])


def collect_ranklist(feats: DataFrame, order_col: str = "doc_id",
                     max_rows: int = 100_000):
    """Pull one query's feature ranklist to the driver for training.

    LETOR training data is per-query labeled ranklists — small by
    construction (the reference trains from INEX-style qrel files,
    questletor.cc) — but this is still a corpus→driver pull, so it
    refuses past `max_rows` instead of silently OOMing the driver
    when someone points it at a million-doc match set (same explicit
    bound contract as similarity.brute_force_pairs). Uses a
    limit-probe, not a full count, so the guard is O(max_rows) at
    any corpus size."""
    n = feats.limit(max_rows + 1).count()
    if n > max_rows:
        raise ValueError(
            f"ranklist exceeds max_rows={max_rows}; LETOR training"
            " collects the ranklist to the driver — restrict the"
            " match set (maxitems) or raise max_rows explicitly")
    return feats.orderBy(order_col).toPandas()


# ---------------------------------------------------------------------------
# ListNet
# ---------------------------------------------------------------------------

def listnet_train(
    ranklists: List[Tuple[np.ndarray, np.ndarray]],
    learning_rate: float = 0.001,
    iterations: int = 100,
) -> np.ndarray:
    """Train top-one ListNet. `ranklists` = per-query
    (features[n_docs, 19], labels[n_docs]); returns params[19].
    Faithful to listnet.cc:148-200 (gradient of top-1 cross entropy),
    with the samples-indexing bug fixed (see module docstring)."""
    params = np.zeros(N_FEATURES)
    for _ in range(iterations):
        for feats, labels in ranklists:
            y = np.exp(labels.astype(np.float64))
            p_true = y / y.sum()
            z = np.exp(feats @ params)
            p_pred = z / z.sum()
            grad = feats.T @ (p_pred - p_true)
            params -= learning_rate * grad
    return params


def listnet_loss(ranklists, params) -> float:
    """Top-one cross entropy (for monitoring/tests)."""
    total = 0.0
    for feats, labels in ranklists:
        y = np.exp(labels.astype(np.float64))
        p_true = y / y.sum()
        z = np.exp(feats @ params)
        p_pred = z / z.sum()
        total -= float((p_true * np.log(p_pred)).sum())
    return total


# ---------------------------------------------------------------------------
# ListMLE (xapian-letor/listmle.cc)
# ---------------------------------------------------------------------------

def listmle_loss(ranklists, params) -> float:
    """The reference's likelihood loss (listmle.cc:186-216):
    Σ_queries [log Σ_j exp(w·x_j) − w·x_top] where `top` is the doc
    with the highest relevance label (max_position, :58-66)."""
    total = 0.0
    for feats, labels in ranklists:
        top = int(np.argmax(labels))
        dots = feats @ params
        m = dots.max() if len(dots) else 0.0  # stable logsumexp
        total += m + float(np.log(np.exp(dots - m).sum()))
        total -= float(dots[top])
    return total


def listmle_train(
    ranklists: List[Tuple[np.ndarray, np.ndarray]],
    learning_rate: float = 0.001,
    tolerance: float = 1e-6,
    max_iterations: int = 1000,
) -> np.ndarray:
    """Train ListMLE exactly as listmle.cc:138-228: per-query SGD on
    the top-one likelihood — gradient_k = Σ_j x_jk·softmax_j − x_top,k
    with `top` the argmax-label doc — iterating until the loss change
    drops below `tolerance` (the reference loops unboundedly on that
    test alone; `max_iterations` is a safety bound it lacks)."""
    params = np.zeros(N_FEATURES)
    prev_loss = 0.0
    for _ in range(max_iterations):
        for feats, labels in ranklists:
            top = int(np.argmax(labels))
            dots = feats @ params
            z = np.exp(dots - dots.max())
            p = z / z.sum()
            grad = feats.T @ p - feats[top]
            params -= learning_rate * grad
        cur_loss = listmle_loss(ranklists, params)
        if abs(cur_loss - prev_loss) < tolerance:
            break
        prev_loss = cur_loss
    return params


# ---------------------------------------------------------------------------
# SVMRanker (xapian-letor/svmranker.cc)
# ---------------------------------------------------------------------------

def svmrank_train(
    ranklists: List[Tuple[np.ndarray, np.ndarray]],
    C: float = 1.0,
    epsilon: float = 0.1,
    learning_rate: float = 0.05,
    iterations: int = 500,
) -> np.ndarray:
    """The reference's SVMRanker (svmranker.cc:112-170) trains libsvm
    nu-SVR with a LINEAR kernel (svm_type=4, kernel_type=0, C=1,
    p=0.1) on (feature vector → relevance label) pairs pooled across
    all ranklists, then ranks by the learned linear function.
    Re-expressed as the PRIMAL linear SVR — L2-regularized
    epsilon-insensitive regression solved by subgradient descent
    (libsvm solves the dual with SMO; same model family and scoring
    function, different optimizer — a documented divergence since
    vendoring libsvm is out of scope). epsilon mirrors param.p=0.1."""
    X = np.vstack([f for f, _l in ranklists]).astype(np.float64)
    y = np.concatenate([l for _f, l in ranklists]).astype(np.float64)
    n = max(len(y), 1)
    w = np.zeros(N_FEATURES)
    for _ in range(iterations):
        err = X @ w - y
        active = np.abs(err) > epsilon
        grad = w / (C * n) + (np.sign(err) * active) @ X / n
        w -= learning_rate * grad
    return w


def svmrank_loss(ranklists, params, C: float = 1.0,
                 epsilon: float = 0.1) -> float:
    """Primal SVR objective: ||w||²/(2C·n) + mean ε-insensitive error."""
    X = np.vstack([f for f, _l in ranklists]).astype(np.float64)
    y = np.concatenate([l for _f, l in ranklists]).astype(np.float64)
    n = max(len(y), 1)
    err = np.abs(X @ params - y)
    hinge = np.maximum(err - epsilon, 0.0)
    return float((params @ params) / (2 * C * n) + hinge.mean())


# ---------------------------------------------------------------------------
# Evaluation metrics (xapian-letor/evalmetric.cc declares the base
# class and names MAP, NDCG, MRR as its subclasses — the file ships as
# a stub, so these carry the standard IR definitions)
# ---------------------------------------------------------------------------

def average_precision(labels_in_rank_order) -> float:
    """AP for one query: mean of precision@k over ranks k holding a
    relevant (label > 0) doc; 0.0 when nothing relevant."""
    rel = [1 if float(x) > 0 else 0 for x in labels_in_rank_order]
    if not any(rel):
        return 0.0
    hits = 0
    acc = 0.0
    for k, r in enumerate(rel, start=1):
        if r:
            hits += 1
            acc += hits / k
    return acc / sum(rel)


def mean_average_precision(ranked_label_lists) -> float:
    lists = list(ranked_label_lists)
    if not lists:
        return 0.0
    return float(np.mean([average_precision(x) for x in lists]))


def ndcg_at(labels_in_rank_order, k: int = 10) -> float:
    """NDCG@k with the (2^rel - 1) / log2(rank+1) gain (the LETOR
    convention); 1.0-normalized against the ideal ordering."""
    lab = np.asarray(list(labels_in_rank_order), dtype=np.float64)[:k]

    def dcg(v):
        return float(((2.0 ** v - 1.0)
                      / np.log2(np.arange(2, v.size + 2))).sum())

    ideal = np.sort(np.asarray(list(labels_in_rank_order),
                               dtype=np.float64))[::-1][:k]
    idcg = dcg(ideal)
    return dcg(lab) / idcg if idcg > 0 else 0.0


def mean_reciprocal_rank(ranked_label_lists) -> float:
    """MRR: mean of 1/rank of the first relevant doc per query."""
    out = []
    for labels in ranked_label_lists:
        rr = 0.0
        for k, x in enumerate(labels, start=1):
            if float(x) > 0:
                rr = 1.0 / k
                break
        out.append(rr)
    return float(np.mean(out)) if out else 0.0


def rank_with_model(features: DataFrame, params: np.ndarray,
                    maxitems: int = 10) -> DataFrame:
    """ListNET::rank / score_doc — distributed dot product, sorted."""
    score = None
    for i in range(N_FEATURES):
        e = F.col(f"f{i + 1}") * F.lit(float(params[i]))
        score = e if score is None else score + e
    return (features.select("doc_id", score.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(maxitems))
