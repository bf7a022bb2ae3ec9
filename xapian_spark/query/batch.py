"""Batch query evaluation — a whole query workload in ONE Spark job.

The reference engine answers one query at a time: per-query stats
gathering, a per-query postlist tree, a per-query top-k heap
(xapian-core/matcher/multimatch.cc:175-960).  On Spark the fixed
per-job cost (scheduling + scan setup, ~0.3-1.5 s) dominates a single
small query, so the idiomatic scale path for serving N queries is to
evaluate the WORKLOAD as one dataflow instead of N trees:

    queries (query_id, term, wqf)            -- small side
      -> broadcast-join term_stats            per-(query,term) BM25
                                              termweight, all JVM-side
      -> broadcast-join postings              postings scanned ONCE for
                                              every query, never shuffled;
                                              scan term-pruned by an isin
                                              pushdown over the union of
                                              all query terms
      -> groupBy (query_id, doc_id)           map-side partial aggregate,
                                              ONE shuffle of matched
                                              candidate rows only
      -> top-k per query_id                   window row_number, one
                                              shuffle keyed by query_id

At 10^12-doc scale the only rows that ever move are (query_id, doc_id,
part) candidates; the query side stays broadcastable into millions of
(query_id, term) rows.  Above that, drop the explicit broadcast hints
and AQE falls back to shuffle joins — still one job for the workload.

Skew note: one query whose terms match a large fraction of the corpus
makes its window partition large.  The top-k window sorts only that
query's candidates (Spark spills the sort); for pathological head-term
workloads the next step is the per-segment block-max WAND kernel
(query/wand.py) run per query batch — not needed at bench scale.

Semantics match the single-query path exactly (verified against
Enquire.get_mset in tests/test_batch.py): OP_OR / OP_AND over term
leaves, wqf-merged duplicate terms (what QueryParser produces for
repeated words), Xapian BM25 weights, and the mset tiebreak
(weight desc, doc_id asc — docid_order ASCENDING).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Tuple, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from xapian_spark.index.build import InvertedIndex
from xapian_spark.query.bm25 import BM25Weight

QuerySpec = Tuple[str, Sequence[str]]  # (query_id, terms; dups = wqf)


def _queries_df(spark: SparkSession,
                queries: Union[DataFrame, Iterable[QuerySpec]],
                op_default: str,
                ops_by_id: Dict[str, str]) -> DataFrame:
    """Normalize to a DataFrame (query_id, term, wqf, n_terms, is_and).

    Driver-list inputs go through pandas (Arrow -> LocalRelation): a
    plain createDataFrame(list) parallelizes into defaultParallelism
    Python-RDD slices and every downstream action pays one Python
    worker round-trip per slice.
    """
    if isinstance(queries, DataFrame):
        qt = queries  # (query_id, term) or (query_id, term, wqf)
        if "wqf" not in qt.columns:
            qt = qt.groupBy("query_id", "term").agg(
                F.count("*").cast("int").alias("wqf"))
        n = qt.groupBy("query_id").agg(
            F.countDistinct("term").cast("int").alias("n_terms"))
        qt = qt.join(n, "query_id")
        if not ops_by_id:
            return qt.withColumn(
                "is_and", F.lit(op_default == "and"))
        # per-query override for DataFrame inputs: join a small
        # (query_id, is_and) frame built from ops_by_id (broadcast —
        # it is driver-sized by construction); unlisted queries fall
        # back to op_default
        import pandas as pd

        for qid, op in ops_by_id.items():
            if op not in ("or", "and"):
                raise ValueError(
                    f"unsupported batch op {op!r} for {qid!r}")
        ov = spark.createDataFrame(pd.DataFrame(
            [(qid, op == "and") for qid, op in ops_by_id.items()],
            columns=["query_id", "_is_and_ov"]))
        return (qt.join(F.broadcast(ov), "query_id", "left")
                .withColumn("is_and",
                            F.coalesce(F.col("_is_and_ov"),
                                       F.lit(op_default == "and")))
                .drop("_is_and_ov"))

    import pandas as pd

    rows = []
    for qid, terms in queries:
        op = ops_by_id.get(qid, op_default)
        if op not in ("or", "and"):
            raise ValueError(f"unsupported batch op {op!r} for {qid!r}")
        wqf: Dict[str, int] = {}
        for t in terms:
            wqf[t] = wqf.get(t, 0) + 1
        for t, w in wqf.items():
            rows.append((qid, t, w, len(wqf), op == "and"))
    pdf = pd.DataFrame(
        rows, columns=["query_id", "term", "wqf", "n_terms", "is_and"])
    return spark.createDataFrame(pdf)


def bm25_batch(
    index: InvertedIndex,
    queries: Union[DataFrame, Iterable[QuerySpec]],
    k: int = 10,
    op: str = "or",
    weight: BM25Weight = None,
    ops_by_id: Dict[str, str] = None,
) -> DataFrame:
    """Top-k BM25 for every query in `queries`, in one dataflow.

    queries: iterable of (query_id, [term, ...]) — duplicate terms
             merge into wqf, as the reference QueryParser does for
             repeated words — or a DataFrame (query_id, term[, wqf]).
    op:      "or" (OP_OR) or "and" (OP_AND); per-query override via
             ops_by_id={query_id: "and"}.
    Returns (query_id, rank, doc_id, score) with the single-path mset
    ordering: score desc, doc_id asc within each query.
    """
    w = weight or BM25Weight()
    if hasattr(w, "make_sumpart"):
        raise ValueError(
            "bm25_batch supports the separable BM25 family only; "
            "run generalized DFR/TfIdf weights through Enquire")

    spark = index.postings.sparkSession
    qt = _queries_df(spark, queries, op, ops_by_id or {})

    st = index.stats
    n_docs = st.doccount
    lf = w.len_factor(st.average_length)

    # per-(query_id, term) document-independent termweight: broadcast
    # the small query side into the term_stats scan (term_stats is
    # corpus-sized at web scale; never shuffle or collect it).
    # Unknown terms drop out of the inner join — they match no
    # postings and carry zero weight on the single path too, but they
    # still count toward n_terms so an AND with an unindexed term
    # matches nothing, as in the reference.
    tf = F.col("tf").cast("double")
    tw = (F.lit(float(n_docs)) - tf + F.lit(0.5)) / (tf + F.lit(0.5))
    tw = F.when(tw < 2.0, tw * F.lit(0.5) + F.lit(1.0)).otherwise(tw)
    tw = F.log(tw)
    if w.k3 != 0:
        wqf = F.col("wqf").cast("double")
        tw = tw * (F.lit(w.k3 + 1.0) * wqf / (F.lit(w.k3) + wqf))
    qterms = (
        index.term_stats.join(F.broadcast(qt), "term")
        .select("query_id", "term", tw.alias("termweight"),
                "n_terms", "is_and")
    )

    # ONE postings scan for the whole workload.  The isin prune is a
    # pushed parquet filter when the term set is known driver-side.
    if not isinstance(queries, DataFrame):
        all_terms = sorted({t for _qid, ts in queries for t in ts})
        postings = index.postings.filter(F.col("term").isin(all_terms))
    else:
        postings = index.postings
    part = w.sumpart_col(
        F.col("termweight"), F.col("wdf"), F.col("doclen"), lf)
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .select("query_id", "doc_id", part.alias("part"),
                "n_terms", "is_and")
    )

    # deterministic float fold (same order-fixing trick as the
    # single-query path) + matched-term count for AND semantics
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.aggregate(F.array_sort(F.collect_list("part")), F.lit(0.0),
                    lambda acc, x: acc + x).alias("score"),
        F.count("*").alias("matched"),
        F.first("n_terms").alias("n_terms"),
        F.first("is_and").alias("is_and"),
    )
    agg = agg.filter(~F.col("is_and") | (F.col("matched") == F.col("n_terms")))

    win = (Window.partitionBy("query_id")
           .orderBy(F.col("score").desc(), F.col("doc_id").asc()))
    return (
        agg.withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )
