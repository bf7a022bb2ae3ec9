"""Production entry point for spark-submit.

Package and run:

    zip -r /tmp/xapian_spark.zip xapian_spark
    spark-submit --py-files /tmp/xapian_spark.zip tools/build_job.py \
        build --input /path/pages_parquet --index /path/index \
        --n-segments 4096 --analyzer xapian
    spark-submit --py-files /tmp/xapian_spark.zip tools/build_job.py \
        query --index /path/index --terms Zbatch Zscan --k 10

Master/executors come from spark-submit (--master yarn / k8s, --num-
executors …); the job itself is cluster-size-agnostic — segment count
governs parallelism, resume is on by default so a pre-empted build
continues where the manifest left off.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="build_job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True,
                   help="pages table: path (parquet/orc/json/csv) or"
                        " table:<catalog.db.name> (Iceberg/Hive)")
    b.add_argument("--index", required=True, help="index output path")
    b.add_argument("--n-segments", type=int, default=0)
    b.add_argument("--analyzer", default="xapian")
    b.add_argument("--text-col", default="text")
    b.add_argument("--id-col", default="doc_id")
    b.add_argument("--html-col", default="",
                   help="extract text from this binary column first")
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--terms", nargs="+", required=True)
    q.add_argument("--op", default="or", choices=["or", "and"])
    q.add_argument("--k", type=int, default=10)

    c = sub.add_parser("compact")
    c.add_argument("--index", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--n-segments", type=int, default=0)

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName(
        f"xapian-spark-{args.cmd}").getOrCreate()

    if args.cmd == "build":
        from xapian_spark.index.segments import build_segments

        from xapian_spark.io.tables import read_table

        docs = read_table(spark, args.input)
        if args.html_col:
            from xapian_spark.analysis.htmlparse import extract_text_udf

            docs = docs.select(
                args.id_col,
                extract_text_udf(F.col(args.html_col))
                .alias(args.text_col))
        seg = build_segments(
            docs, args.index, n_segments=args.n_segments,
            text_col=args.text_col, id_col=args.id_col,
            analyzer=args.analyzer, input_desc=args.input,
            resume=not args.no_resume)
        st = seg.stats()
        print(json.dumps({
            "built": args.index, "doccount": st.doccount,
            "total_doclen": st.total_doclen,
            "segments": seg.manifest().count(),
        }))
    elif args.cmd == "query":
        from xapian_spark.index.segments import SegmentIndex
        from xapian_spark.query.wand import WandEnquire

        seg = SegmentIndex(spark, args.index)
        rows = WandEnquire(seg).get_mset(
            args.terms, args.k, op=args.op).collect()
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"],
                              "score": r["score"]}))
    elif args.cmd == "compact":
        from xapian_spark.index.segments import SegmentIndex, compact

        seg = SegmentIndex(spark, args.index)
        out = compact(seg, args.out, n_segments=args.n_segments)
        print(json.dumps({"compacted": args.out,
                          "segments": out.manifest().count(),
                          "chunks": out.chunks.count()}))
    spark.stop()


if __name__ == "__main__":
    main()
