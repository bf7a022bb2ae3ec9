"""Production curation entry point for spark-submit — the trainer-side
companion to build_job.py: raw pages table in, curated + sharded
training corpus out.

Package and run:

    zip -r /tmp/xapian_spark.zip xapian_spark
    spark-submit --py-files /tmp/xapian_spark.zip tools/curate_job.py \
        --input /path/pages_parquet --output /path/curated \
        --eval /path/eval_parquet --blocklist /path/hosts.txt \
        --min-quality 0.5 --mixture-domain lang --n-shards 1024

Stage order (cheapest-first so each stage touches fewer rows):

    1. URL filtering      (host blocklist + banned-word score;
                           reads only the url column)        [--url-col]
    2. C4 line cleaning   (rewrites text, drops junk pages)
    3. Gopher quality     (document-shape rules)
    4. exact-substring span removal                           [--span-n]
       (NOTE: rewrites text as normalized lowercase tokens —
       see dedup_spans; runs before PII redaction so the
       redaction markers survive)
    5. quality gate + exact dedup + decontamination + sample + PII
                          (the curate() chain)
    6. temperature mixture resampling                 [--mixture-domain]
    7. deterministic shard export + packing manifest

Master/executors come from spark-submit; every stage is deterministic
(seeded hashes), so a re-run over the same input emits the same corpus.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="curate_job")
    ap.add_argument("--input", required=True,
                    help="documents table: path or table:<catalog.name>")
    ap.add_argument("--output", required=True, help="curated corpus dir")
    ap.add_argument("--eval", default="",
                    help="eval table for decontamination (optional)")
    ap.add_argument("--blocklist", default="",
                    help="newline-separated host blocklist file")
    ap.add_argument("--url-col", default="",
                    help="enable URL filtering on this column")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--skip-c4", action="store_true")
    ap.add_argument("--skip-gopher", action="store_true")
    ap.add_argument("--span-n", type=int, default=0,
                    help="exact-substring span length (0 = off; paper 50)."
                         " NOTE: rewrites text as normalized lowercase"
                         " tokens (dedup_spans contract)")
    ap.add_argument("--sample-fraction", type=float, default=1.0)
    ap.add_argument("--mixture-domain", default="",
                    help="column for temperature resampling (off if empty)")
    ap.add_argument("--mixture-alpha", type=float, default=0.5)
    ap.add_argument("--n-shards", type=int, default=256)
    ap.add_argument("--seq-len", type=int, default=0,
                    help="emit a packing manifest at this sequence length")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--stage-stats", action="store_true",
                    help="count survivors after every stage (persists"
                         " each stage frame; without it only the input"
                         " and output are counted — per-stage counts"
                         " would otherwise re-execute the whole"
                         " upstream pipeline per stage)")

    args = ap.parse_args(argv)
    if args.n_shards < 1:
        raise SystemExit(f"--n-shards must be >= 1, got {args.n_shards}")
    if args.seq_len < 0:
        raise SystemExit(f"--seq-len must be >= 0, got {args.seq_len}")
    if args.span_n < 0:
        raise SystemExit(f"--span-n must be >= 0, got {args.span_n}")

    from pyspark.sql import functions as F
    from pyspark.sql import SparkSession

    from xapian_spark.io.tables import read_table
    from xapian_spark.pipeline.curate import (curate, export_shards,
                                              pack_sequences)
    from xapian_spark.pipeline.dedup import dedup_spans
    from xapian_spark.pipeline.heuristics import c4_clean, gopher_quality
    from xapian_spark.pipeline.urls import url_filter

    spark = SparkSession.builder.appName("xapian-spark-curate")\
        .getOrCreate()
    docs = read_table(spark, args.input)
    stats = {"input": docs.count()}
    text_col, id_col = args.text_col, args.id_col
    prev = [None]

    def checkpoint(frame, stage):
        """Opt-in per-stage accounting: persist the stage frame so the
        count does not re-execute the upstream pipeline, then release
        the previous stage's cache."""
        if not args.stage_stats:
            return frame
        frame = frame.persist()
        stats[stage] = frame.count()
        if prev[0] is not None:
            prev[0].unpersist()
        prev[0] = frame
        return frame

    if args.url_col:
        blocked = None
        if args.blocklist:
            with open(args.blocklist) as fh:
                blocked = [ln.strip() for ln in fh if ln.strip()]
        docs = url_filter(docs, blocked_hosts=blocked,
                          url_col=args.url_col) \
            .drop("host", "url_word_hits")
        docs = checkpoint(docs, "after_url_filter")

    if not args.skip_c4:
        cleaned = c4_clean(docs, text_col, id_col)
        docs = (docs.drop(text_col)
                .join(cleaned.filter("keep")
                      .select(F.col("doc_id").alias(id_col),
                              F.col("clean_text").alias(text_col)),
                      id_col))
        docs = checkpoint(docs, "after_c4")

    if not args.skip_gopher:
        keep = gopher_quality(docs, text_col, id_col).filter("keep") \
            .select(F.col("doc_id").alias(id_col))
        docs = docs.join(keep, id_col)
        docs = checkpoint(docs, "after_gopher")

    # span removal BEFORE curate(): dedup_spans rewrites text as its
    # normalized lowercase tokens (see its docstring), so it must not
    # run after PII redaction (curate's last stage) — this order keeps
    # the redaction pass last and its markers intact.
    if args.span_n:
        spans = dedup_spans(docs, text_col, id_col, n=args.span_n)
        docs = (docs.drop(text_col)
                .join(spans.select(F.col("doc_id").alias(id_col),
                                   F.col("text").alias(text_col)),
                      id_col))
        docs = checkpoint(docs, "after_span_dedup")

    eval_docs = read_table(spark, args.eval) if args.eval else None
    docs = curate(docs, eval_docs, text_col=text_col, id_col=id_col,
                  min_quality=args.min_quality,
                  sample_fraction=args.sample_fraction, seed=args.seed)
    docs = checkpoint(docs, "after_curate")

    if args.mixture_domain:
        from xapian_spark.pipeline.heuristics import mixture_sample

        docs = mixture_sample(docs, domain_col=args.mixture_domain,
                              id_col=id_col, alpha=args.mixture_alpha,
                              seed=args.seed).drop("rate")

    # one materialization the exported corpus and packing manifest
    # both reuse (and the authoritative output count)
    docs = docs.persist()
    stats["output"] = docs.count()
    export_shards(docs, f"{args.output}/shards", args.n_shards,
                  id_col=id_col, seed=args.seed)
    if args.seq_len:
        pack_sequences(docs, args.seq_len, text_col, id_col,
                       n_shards=args.n_shards, seed=args.seed) \
            .write.mode("overwrite") \
            .parquet(f"{args.output}/packing_manifest")
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
