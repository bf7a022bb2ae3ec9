"""Benchmark harness (driver contract).

Runs the headline engine jobs at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Headline jobs:
- index_build: full inverted-index build (Xapian TermGenerator + Porter2
  analyzer, positions on) over the documents table, forced with a
  postings count().
- bm25_*: top-10 BM25 queries through the query executor (single term,
  OR, AND, phrase) against the built index.
- dedup/similarity: MinHash-LSH pair generation and brute-force cosine
  top-k over the embeddings table.

Scaling evidence for the north rule (local[8] vs local[32]) lives in
tools/scaling_bench.py; this file is the per-round fixed-shape probe.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("xapian-spark-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(sf)
    except ValueError:
        sf = sf_dir

    from pyspark.sql import functions as F

    from xapian_spark.index.build import build_index
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    t_total = time.perf_counter()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- index build (the north-rule headline) ---------------------------
    t0 = time.perf_counter()
    idx = build_index(docs, text_col="text", id_col="doc_id",
                      analyzer="xapian")
    idx.postings = idx.postings.persist()
    n_postings = idx.postings.count()
    timings["index_build"] = time.perf_counter() - t0
    n_docs = idx.stats.doccount

    enq = Enquire(idx)

    def run(name, query, k=10):
        t = time.perf_counter()
        enq.get_mset(query, 0, k).collect()
        timings[name] = time.perf_counter() - t

    # --- query latency ----------------------------------------------------
    run("bm25_single", ops.Term("Zbatch"))
    run("bm25_or", ops.Or([ops.Term("Zbatch"), ops.Term("Zscan"),
                           ops.Term("Zspark"), ops.Term("Zwindow")]))
    run("bm25_and", ops.And([ops.Term("Zbatch"), ops.Term("Zwindow")]))
    run("bm25_phrase", ops.Phrase(["batch", "window"]))

    # round-2 paths: paginated top-k (offset, no global window) and
    # capped wildcard expansion
    t0 = time.perf_counter()
    enq.get_mset(ops.Or([ops.Term("Zbatch"), ops.Term("Zscan")]),
                 first=40, maxitems=10).collect()
    timings["bm25_paginated"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    enq.get_mset(ops.Wildcard("wind"), 0, 10).collect()
    timings["wildcard"] = time.perf_counter() - t0

    # batch serving path: 100 queries in ONE job (query/batch.py) —
    # the per-query Spark job overhead that dominates the single-query
    # lines above amortizes across the workload
    from xapian_spark.query.batch import bm25_batch

    term_dict = sorted(t for t in (enq._full_term_dict() or {})
                       if t.startswith("Z"))
    if not term_dict:
        # _full_term_dict returns {} past TERM_DICT_CACHE_MAX — fall
        # back to the top Z-prefixed terms from the term_stats table
        # so the batch line still runs (and never divides by zero)
        term_dict = [r["term"] for r in
                     idx.term_stats.filter(F.col("term").startswith("Z"))
                     .orderBy(F.col("tf").desc(), "term")
                     .limit(300).collect()]
    assert term_dict, "no Z-prefixed terms in the index"
    batch_qs, batch_ops = [], {}
    for i in range(100):
        ts = [term_dict[(i * 3 + j) % len(term_dict)]
              for j in range(1 + (i % 3))]
        batch_qs.append((f"q{i}", ts))
        batch_ops[f"q{i}"] = "and" if i % 4 == 0 else "or"
    t0 = time.perf_counter()
    n_batch_rows = bm25_batch(idx, batch_qs, k=10,
                              ops_by_id=batch_ops).count()
    timings["bm25_batch_100"] = time.perf_counter() - t0

    # multilingual build: per-row Snowball stemmer selection (de/fr/es)
    t0 = time.perf_counter()
    ml = build_index(docs, text_col="text", id_col="doc_id",
                     lang_col="lang")
    ml.postings.count()
    timings["multilang_build"] = time.perf_counter() - t0

    # --- chunk-encoded segment index + block-max WAND ----------------------
    import shutil
    import tempfile

    from xapian_spark.index.segments import build_segments
    from xapian_spark.query.wand import WandEnquire

    seg_path = tempfile.mkdtemp(prefix="bench_segidx_")
    try:
        # segment_build times EXACTLY the round-1 work (chunk build +
        # count) so the line stays comparable round over round; the
        # term-dictionary materialization — moved inside this window in
        # round 2, which muddied the r01→r02 delta — is its own line.
        t0 = time.perf_counter()
        seg = build_segments(docs, seg_path, n_segments=cpus,
                             analyzer="xapian",
                             input_desc=f"{sf_dir}/documents.parquet")
        seg.chunks.count()
        timings["segment_build"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        seg.term_stats().count()  # materialize the term dictionary
        timings["term_dict"] = time.perf_counter() - t0
        wq = WandEnquire(seg)
        t0 = time.perf_counter()
        wq.get_mset(["Zbatch", "Zscan", "Zspark", "Zwindow"], 10).collect()
        timings["bm25_wand_or"] = time.perf_counter() - t0
        # the SAME 100-query workload as bm25_batch_100, served
        # through the chunk-decoding WAND batch kernel — makes the
        # two serving paths directly comparable round over round
        t0 = time.perf_counter()
        wq.get_mset_batch(batch_qs, 10, ops_by_id=batch_ops).count()
        timings["wand_batch_100"] = time.perf_counter() - t0
    finally:
        shutil.rmtree(seg_path, ignore_errors=True)

    # --- training-data pipeline ops ----------------------------------------
    from xapian_spark.pipeline.dedup import minhash_dedup_pairs
    from xapian_spark.pipeline.similarity import cosine_topk

    t0 = time.perf_counter()
    minhash_dedup_pairs(docs, n=3, num_hashes=16, bands=4,
                        threshold=0.8).count()
    timings["minhash_dedup"] = time.perf_counter() - t0

    from xapian_spark.pipeline.textstats import (ccnet_buckets,
                                                 cross_doc_span_stats,
                                                 unigram_lm_scores)

    t0 = time.perf_counter()
    unigram_lm_scores(docs).count()
    timings["unigram_lm"] = time.perf_counter() - t0

    # default path = exact distributed rank selection (grid binary
    # search, one count-probe job per step) — the line watches that
    # the O(log range) probe passes stay cheap
    t0 = time.perf_counter()
    ccnet_buckets(docs).count()
    timings["ccnet_buckets"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    cross_doc_span_stats(docs, n=4).count()
    timings["cross_doc_spans"] = time.perf_counter() - t0

    from xapian_spark.pipeline.dedup import dedup_spans

    t0 = time.perf_counter()
    dedup_spans(docs, n=4).count()
    timings["dedup_spans"] = time.perf_counter() - t0

    from xapian_spark.pipeline.bpe import train_bpe, word_counts

    t0 = time.perf_counter()
    train_bpe(word_counts(docs), n_merges=8)
    timings["bpe_train"] = time.perf_counter() - t0

    from xapian_spark.pipeline.heuristics import (c4_clean, gopher_quality,
                                                  mixture_sample)

    t0 = time.perf_counter()
    c4_clean(docs).count()
    gopher_quality(docs).count()
    mixture_sample(docs, domain_col="lang").count()
    timings["curation_heuristics"] = time.perf_counter() - t0

    from xapian_spark.pipeline.textstats import (bigram_lm_scores,
                                                 tfidf_keywords,
                                                 top_ngrams)

    t0 = time.perf_counter()
    bigram_lm_scores(docs).count()
    tfidf_keywords(docs, k=3).count()
    top_ngrams(docs, n=3, k=50).count()
    timings["corpus_analytics"] = time.perf_counter() - t0

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = emb.orderBy("vec_id").head()["embedding"]
    t0 = time.perf_counter()
    cosine_topk(emb, qv, k=10).collect()
    timings["cosine_topk"] = time.perf_counter() - t0

    # PQ: encode once (expression path) + ADC top-k over inline codes
    from xapian_spark.pipeline.similarity import (
        pq_topk, train_pq_codebooks)

    t0 = time.perf_counter()
    books = train_pq_codebooks(emb, 64, m=8, k=16, sample=4096)
    timings["pq_train"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    pq_topk(emb, qv, k=10, codebooks=books, refine=100).collect()
    timings["pq_topk_refine"] = time.perf_counter() - t0

    # fixed-point PageRank over the synthetic host graph (8 iters,
    # one edges⋈ranks shuffle + groupBy per iteration)
    from xapian_spark.pipeline.graph import pagerank, synthetic_link_edges

    edges = synthetic_link_edges(docs, docs.count())
    t0 = time.perf_counter()
    pagerank(edges, iters=8).count()
    timings["pagerank_8it"] = time.perf_counter() - t0

    # --- IVF recall (trained centroids + replicas=4 vs exact) ------------
    import numpy as np

    from xapian_spark.pipeline.similarity import train_ivf_centroids

    t0 = time.perf_counter()
    cents = train_ivf_centroids(emb, n_cells=16, iters=10, sample=4096)
    timings["ivf_train"] = time.perf_counter() - t0
    rows = emb.select("vec_id", "embedding").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = np.array(cents)
    S = Xn @ C.T
    top4 = np.argsort(-S, axis=1)[:, :4]
    rng_q = range(0, min(len(X), 2000), max(1, min(len(X), 2000) // 20))
    recall = {}
    for npb in (1, 2, 4):
        hits = tot = 0
        for qi in rng_q:
            q = Xn[qi]
            exact = set(np.argsort(-(Xn @ q))[:10])
            cells = set(np.argsort(-(C @ q))[:npb])
            cand = np.flatnonzero(
                [any(c in cells for c in row) for row in top4])
            got = set(cand[np.argsort(-(Xn[cand] @ q))[:10]])
            hits += len(exact & got)
            tot += 10
        recall[f"nprobe{npb}"] = round(hits / tot, 3)

    total = time.perf_counter() - t_total
    out = {
        "metric": "bench total (index build + BM25 top-10 queries"
                  " + dedup/similarity) wall seconds",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": sf,
        "n_docs": n_docs,
        "n_postings": n_postings,
        "index_docs_per_sec": round(n_docs / timings["index_build"], 1),
        "batch_queries_per_sec": round(100 / timings["bm25_batch_100"], 1),
        "wand_batch_queries_per_sec": round(
            100 / timings["wand_batch_100"], 1),
        "ivf_recall_at10_replicas4": recall,
        "cpus": cpus,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
