"""Segmented chunk-encoded index: build, manifest, resume, merge.

The scale-path index representation. Layout:

    <path>/chunks/      one row per posting CHUNK (not per posting):
        term STRING, seg_id INT, first_doc_id LONG, last_doc_id LONG,
        n INT, cf LONG, max_wdf INT, min_doclen LONG, data BINARY
    <path>/manifest/    one row per built segment (lineage + metrics):
        seg_id INT, n_docs LONG, n_postings LONG, n_chunks LONG,
        n_terms LONG, bytes LONG, checksum LONG, build_sec DOUBLE,
        input_desc STRING

Design (SURVEY §4.3 / §7):
- A segment = one sub-database of the reference's multi-database model;
  docids are interleaved across segments exactly like the reference
  (`subdb = (did-1) % N`, xapian-core/matcher/multimatch.cc:175-176),
  so segment membership is a pure function of doc_id — deterministic,
  resumable, no coordination.
- The per-segment inverter (one applyInPandas group) is the analog of
  the reference's in-memory Inverter buffer
  (backends/brass/brass_inverter.h:45-249): accumulate term→postings
  for the segment, sort, delta+vbyte encode into ~2000-byte chunks
  (brass_postlist.cc:93) with block-max metadata (codec.py).
- Doclens are stored as chunks of the reserved empty term "" — the
  reference likewise keeps doclens inside the postlist table
  (brass_postlist.cc doclen chunks).
- The global term dictionary = a metadata-only groupBy(term) over chunk
  rows (each row ~2KB regardless of term frequency, so head-term skew
  cannot produce a giant shuffle row — the chunk rows of "the" spread
  across many partitions; only their tiny (tf, cf) aggregates meet).
- Resume: re-running build_segments with the same args skips segments
  already recorded in the manifest (checkpointed segment manifests —
  the analog of revisioned B-trees + changesets, brass_version.cc).

ONE wide op builds the whole index: groupBy(seg_id).applyInPandas.
Everything downstream (term stats, global stats, manifest metrics) is
metadata-only aggregation over chunk rows.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, List, Optional

import numpy as np

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from xapian_spark.index.build import ANALYZERS, MAX_SAFE_TERM_LENGTH
from xapian_spark.index.codec import (
    CHUNK_TARGET_BYTES, CODEC_VERSION, encode_chunks, encode_positions,
)

DOCLEN_TERM = ""  # reserved pseudo-term whose chunks hold (doc_id, 0, doclen)

CHUNKS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("seg_id", IntegerType(), False),
    StructField("first_doc_id", LongType(), False),
    StructField("last_doc_id", LongType(), False),
    StructField("n", IntegerType(), False),
    StructField("cf", LongType(), False),
    StructField("max_wdf", IntegerType(), False),
    StructField("min_doclen", LongType(), False),
    StructField("data", BinaryType(), False),
    StructField("pos_data", BinaryType(), True),
])

MANIFEST_SCHEMA = StructType([
    StructField("seg_id", IntegerType(), False),
    StructField("n_docs", LongType(), False),
    StructField("n_postings", LongType(), False),
    StructField("n_chunks", LongType(), False),
    StructField("n_terms", LongType(), False),
    StructField("bytes", LongType(), False),
    StructField("checksum", LongType(), False),
    StructField("build_sec", DoubleType(), False),
    StructField("input_desc", StringType(), True),
])


def _path_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem existence check via the Hadoop FS API — used instead
    of catching AnalysisException, so an existing-but-corrupt table
    raises loudly rather than silently reading as absent (tombstones
    that silently read as absent would resurrect deleted docs)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _read_optional_parquet(spark: SparkSession, path: str
                           ) -> Optional[DataFrame]:
    """None iff `path` does not exist; any OTHER read failure (empty
    directory from a partial write, schema corruption) propagates."""
    if not _path_exists(spark, path):
        return None
    return spark.read.parquet(path)


def _read_optional_partitioned(spark: SparkSession, path: str,
                               partition_prefix: str
                               ) -> Optional[DataFrame]:
    """Like _read_optional_parquet for partitionBy-written tables,
    where "exists but holds ZERO partition directories" is a
    legitimate empty state (e.g. tombstone_deltas after a delete of
    never-indexed ids wrote an empty batch): returns None for both
    path-absent and no-partitions; a dir WITH partitions still reads
    strictly (corruption raises)."""
    if not _path_exists(spark, path):
        return None
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    statuses = fs.listStatus(hpath)
    if not any(st.getPath().getName().startswith(partition_prefix)
               for st in statuses):
        return None
    return spark.read.parquet(path)


def _delete_path(spark: SparkSession, path: str) -> None:
    """Recursively delete a path if it exists (Hadoop FS)."""
    sc = spark.sparkContext
    hpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def _write_dynamic_overwrite(df: DataFrame, path: str,
                             partition_col: str) -> None:
    """Overwrite exactly the `partition_col` partitions present in `df`
    (dynamic partition overwrite) — the idempotent-replay write used by
    the chunk builder and the delete two-phase commit."""
    spark = df.sparkSession
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, "dynamic")
    try:
        (df.write.mode("overwrite").partitionBy(partition_col)
         .parquet(path))
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def _stamp_format(spark: SparkSession, path: str) -> None:
    """Record the chunk-codec version beside the chunks (format.json,
    one row) so a later reader can refuse incompatible data.

    Built from range(1), NOT createDataFrame([...]): a driver-list
    DataFrame parallelizes into defaultParallelism Python-RDD slices,
    and coalesce(1) then runs every slice's Python worker round-trip
    sequentially in one task — measured ~6 s per stamp at local[32]
    (this single line was most of round 2's segment_build regression).
    range(1) is a pure-JVM single-partition source: same file, ~0.1 s."""
    (spark.range(1)
     .select(F.lit(int(CODEC_VERSION)).alias("codec"))
     .write.mode("overwrite").json(f"{path}/format.json"))


def _check_format(spark: SparkSession, path: str) -> None:
    try:
        row = spark.read.json(f"{path}/format.json").head()
    except AnalysisException:
        raise ValueError(
            f"{path}: no format.json — this index predates the v2 "
            "chunk codec (first entry absolute vs docid-1) and would "
            "decode every docid off by one; rebuild it") from None
    v = int(row["codec"]) if row is not None else None
    if v != CODEC_VERSION:
        raise ValueError(
            f"{path}: chunk codec v{v} is not supported by this "
            f"reader (expects v{CODEC_VERSION}); rebuild the index")


def simple_analyzer(text: str):
    """Python twin of build.py's pure-SQL "simple" tokenization
    (lowercase, split on non-alnum) — identical output, so a chunk
    index built with it stays DuckDB-oracle-checkable."""
    import re

    terms = {}
    for i, tok in enumerate(
            t for t in re.split("[^a-z0-9]+", (text or "").lower()) if t):
        wdf, positions = terms.get(tok, (0, []))
        positions.append(i + 1)
        terms[tok] = (wdf + 1, positions)
    return [(t, w, p) for t, (w, p) in terms.items()]


SEG_ANALYZERS = dict(ANALYZERS)
SEG_ANALYZERS["simple"] = simple_analyzer


def _invert_segment(
    pdf, analyzer: Callable, text_col: str, id_col: str,
    target_bytes: int, keep_positions: bool = False,
):
    """One segment's docs (pandas) → chunk rows (pandas). The Inverter."""
    import pandas as pd

    pdf = pdf.sort_values(id_col)
    doc_ids = pdf[id_col].to_numpy(dtype=np.int64)
    terms_acc: dict = {}
    doclens = np.zeros(doc_ids.size, dtype=np.int64)
    for i, text in enumerate(pdf[text_col]):
        tl = [(t, w, p) for t, w, p in analyzer(text)
              if len(t.encode("utf-8")) <= MAX_SAFE_TERM_LENGTH]
        doclens[i] = sum(w for _t, w, _p in tl)
        for t, w, p in tl:
            terms_acc.setdefault(t, ([], [], []))
            terms_acc[t][0].append(i)
            terms_acc[t][1].append(w)
            terms_acc[t][2].append(p if keep_positions else None)

    seg_id = int(pdf["seg_id"].iloc[0]) if "seg_id" in pdf else 0
    rows = {k.name: [] for k in CHUNKS_SCHEMA.fields}

    def emit(term: str, idxs: List[int], wdfs: List[int], plists):
        ids = doc_ids[idxs]
        dls = doclens[idxs]
        w = np.asarray(wdfs, dtype=np.int64)
        pos = 0
        for c in encode_chunks(ids, w, dls, target_bytes):
            rows["term"].append(term)
            rows["seg_id"].append(seg_id)
            rows["first_doc_id"].append(c.first_doc_id)
            rows["last_doc_id"].append(c.last_doc_id)
            rows["n"].append(c.n)
            # per-chunk cf = Σ wdf over the chunk's postings, so the
            # global term dictionary is a metadata-only sum
            rows["cf"].append(int(w[pos: pos + c.n].sum()))
            rows["max_wdf"].append(c.max_wdf)
            rows["min_doclen"].append(c.min_doclen)
            rows["data"].append(c.data)
            rows["pos_data"].append(
                encode_positions(plists[pos: pos + c.n])
                if keep_positions else None)
            pos += c.n

    for term in sorted(terms_acc):
        idxs, wdfs, plists = terms_acc[term]
        emit(term, idxs, wdfs, plists)
    # doclen pseudo-term: one posting per doc, wdf=0, doclen inline.
    # per-chunk cf / max_wdf / min_doclen here describe DOClens:
    # cf = Σ doclen (chunk), max_wdf = max doclen, min_doclen = min.
    if doc_ids.size:
        pos = 0
        for c in encode_chunks(doc_ids, doclens, doclens, target_bytes):
            rows["term"].append(DOCLEN_TERM)
            rows["seg_id"].append(seg_id)
            rows["first_doc_id"].append(c.first_doc_id)
            rows["last_doc_id"].append(c.last_doc_id)
            rows["n"].append(c.n)
            # cf of a doclen chunk = Σ doclen, so global total_doclen
            # is a metadata-only sum; max_wdf/min_doclen double as the
            # doclen upper/lower bounds
            rows["cf"].append(int(doclens[pos: pos + c.n].sum()))
            rows["max_wdf"].append(c.max_wdf)
            rows["min_doclen"].append(c.min_doclen)
            rows["data"].append(c.data)
            rows["pos_data"].append(None)
            pos += c.n
    return pd.DataFrame(rows)


class SegmentIndex:
    """A chunk-encoded, segmented index on disk."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        _check_format(spark, path)
        self.chunks = spark.read.parquet(f"{path}/chunks")
        self._stats = None
        self._term_stats = None

    # -- derived tables (metadata-only aggregations) -----------------------

    @property
    def postings_chunks(self) -> DataFrame:
        return self.chunks.filter(F.col("term") != DOCLEN_TERM)

    @property
    def doclen_chunks(self) -> DataFrame:
        return self.chunks.filter(F.col("term") == DOCLEN_TERM)

    def _tombstones_raw(self) -> Optional[DataFrame]:
        """Raw (doc_id, before_seg, batch_id) rows, or None when the
        table doesn't exist. The tombstones table is the COMMIT marker
        of a delete batch: a tombstone_deltas batch with no matching
        tombstone batch is an uncommitted partial write and is ignored
        (see delete_documents)."""
        return _read_optional_partitioned(
            self.spark, f"{self.path}/tombstones", "batch_id=")

    def tombstones(self) -> Optional[DataFrame]:
        """(doc_id, before_seg): doc_id is deleted from every segment
        with seg_id <= before_seg (segments appended AFTER the delete —
        a replace — are live). None when no deletes exist."""
        t = self._tombstones_raw()
        if t is None:
            return None
        return t.groupBy("doc_id").agg(
            F.max("before_seg").alias("before_seg"))

    # _dead_arrays is a driver-side collect; the documented contract
    # is a SMALL delete/replace queue purged at compact(). This bound
    # makes the contract self-enforcing instead of silently OOMing
    # the driver at pathological churn (~10^7 tombstones ≈ 160 MB of
    # int64 pairs — far past any sane uncompacted backlog).
    MAX_TOMBSTONES = 10_000_000

    def _dead_arrays(self):
        """Driver-side (sorted doc_ids, before_seg) numpy pair for the
        WAND kernel, or None. Tombstones are a small delete/replace
        queue purged at compact() — not corpus-scale; past
        MAX_TOMBSTONES this raises and asks for a compact() first."""
        t = self.tombstones()
        if t is None:
            return None
        if (t.limit(self.MAX_TOMBSTONES + 1).count()
                > self.MAX_TOMBSTONES):
            raise RuntimeError(
                f"tombstone queue exceeds {self.MAX_TOMBSTONES} docs;"
                " run compact() to fold deletes into the segments"
                " before querying")
        rows = t.orderBy("doc_id").collect()
        if not rows:
            return None
        return (np.array([r["doc_id"] for r in rows], dtype=np.int64),
                np.array([r["before_seg"] for r in rows],
                         dtype=np.int64))

    def _deltas(self) -> Optional[DataFrame]:
        """Per-term (tf_delta, cf_delta) of tombstoned postings —
        written by delete_documents from a block-range-pruned decode,
        so term_stats/stats stay exact without a full decode. Only
        batches whose tombstone rows committed count: a crash between
        the deltas write and the tombstones write leaves an orphan
        batch that is ignored here and overwritten by the retry."""
        d = _read_optional_partitioned(
            self.spark, f"{self.path}/tombstone_deltas", "batch_id=")
        t = self._tombstones_raw()
        if d is None or t is None:
            return None
        committed = F.broadcast(t.select("batch_id").distinct())
        return (d.join(committed, "batch_id")
                .groupBy("term").agg(
                    F.sum("tf_delta").alias("tf_delta"),
                    F.sum("cf_delta").alias("cf_delta")))

    def term_stats(self) -> DataFrame:
        """Global term dictionary: term → (tf, cf) from chunk metadata
        minus tombstone deltas (cached — queries hit it once per term
        set)."""
        if self._term_stats is None:
            ts = self.postings_chunks.groupBy("term").agg(
                F.sum("n").cast("long").alias("tf"),
                F.sum("cf").cast("long").alias("cf"),
            )
            d = self._deltas()
            if d is not None:
                ts = (ts.join(d.filter(F.col("term") != DOCLEN_TERM),
                              "term", "left")
                      .fillna(0, subset=["tf_delta", "cf_delta"])
                      .select(
                          "term",
                          (F.col("tf") - F.col("tf_delta"))
                          .cast("long").alias("tf"),
                          (F.col("cf") - F.col("cf_delta"))
                          .cast("long").alias("cf"))
                      .filter(F.col("tf") > 0))
            self._term_stats = ts.persist()
        return self._term_stats

    def stats(self):
        from xapian_spark.index.build import IndexStats

        if self._stats is None:
            row = self.doclen_chunks.agg(
                F.coalesce(F.sum("n"), F.lit(0)).alias("doccount"),
                F.coalesce(F.sum("cf"), F.lit(0)).alias("total_doclen"),
                F.coalesce(F.min("min_doclen"), F.lit(0)).alias("dl_lb"),
                F.coalesce(F.max("max_wdf"), F.lit(0)).alias("dl_ub"),
            ).head()
            doccount, total_doclen = row.doccount, row.total_doclen
            d = self._deltas()
            if d is not None:
                dr = d.filter(F.col("term") == DOCLEN_TERM).head()
                if dr is not None:
                    doccount -= dr["tf_delta"]
                    total_doclen -= dr["cf_delta"]
            wdf_ub = (self.postings_chunks.agg(F.max("max_wdf")).head()[0]
                      or 0)
            # doclen bounds stay the pre-delete ones: bounds may be
            # loose after a delete but never invalid (they are only
            # upper/lower bounds for WAND pruning)
            self._stats = IndexStats(
                doccount, total_doclen, row.dl_lb, row.dl_ub, wdf_ub)
        return self._stats

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.path}/manifest")

    # -- user metadata K/V (brass_metadata.cc / database.h:371-387) -------

    def _metadata_df(self) -> Optional[DataFrame]:
        return _read_optional_parquet(self.spark, f"{self.path}/metadata")

    def set_metadata(self, key: str, value: str) -> None:
        """WritableDatabase::set_metadata analog: last-write-wins via a
        monotonically increasing revision (append-only storage — the
        changesets model). An empty value deletes the key, exactly as
        the reference specifies."""
        m = self._metadata_df()
        rev = 0
        if m is not None:
            rev = (m.agg(F.max("rev")).head()[0] or 0) + 1
        # range(1)-based 1-row frame: pure JVM, no Python-RDD slices
        (self.spark.range(1)
         .select(F.lit(key).alias("key"), F.lit(value).alias("value"),
                 F.lit(rev).cast("long").alias("rev"))
         .write.mode("append").parquet(f"{self.path}/metadata"))

    def get_metadata(self, key: str) -> str:
        """Database::get_metadata: '' for absent (or deleted) keys."""
        m = self._metadata_df()
        if m is None:
            return ""
        row = (m.filter(F.col("key") == key)
               .orderBy(F.desc("rev")).select("value").head())
        return row["value"] if row is not None else ""

    def metadata_keys(self, prefix: str = "") -> DataFrame:
        """Database::metadata_keys_begin(prefix) analog: the live
        (non-empty latest value) keys with the prefix, sorted."""
        m = self._metadata_df()
        if m is None:
            return self.spark.createDataFrame([], "key string")
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy(F.desc("rev"))
        return (m.filter(F.col("key").startswith(prefix))
                .withColumn("_rn", F.row_number().over(w))
                .filter((F.col("_rn") == 1) & (F.col("value") != ""))
                .select("key").orderBy("key"))

    def to_postings(self) -> DataFrame:
        """Decode chunks → row-per-posting DataFrame
        (term, doc_id, wdf, doclen, positions=NULL) — the flat
        InvertedIndex layout. Lazily evaluated; a `term` filter above
        it prunes chunk rows before any decode runs."""
        from xapian_spark.index.codec import decode_chunk

        schema = ("term string, doc_id long, wdf int, doclen long,"
                  " seg_id int, positions array<int>")

        from xapian_spark.index.codec import decode_positions

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                out = {"term": [], "doc_id": [], "wdf": [],
                       "doclen": [], "seg_id": [], "positions": []}
                for term, seg, data, pd_ in zip(
                        pdf["term"], pdf["seg_id"], pdf["data"],
                        pdf["pos_data"]):
                    ids, wdfs, dls = decode_chunk(bytes(data))
                    out["term"].extend([term] * len(ids))
                    out["doc_id"].extend(int(x) for x in ids)
                    out["wdf"].extend(int(x) for x in wdfs)
                    out["doclen"].extend(int(x) for x in dls)
                    out["seg_id"].extend([int(seg)] * len(ids))
                    if pd_ is None:
                        out["positions"].extend([None] * len(ids))
                    else:
                        out["positions"].extend(
                            [p.tolist() for p in decode_positions(
                                bytes(pd_), len(ids))])
                yield pd.DataFrame(out)

        rows = (self.postings_chunks
                .select("term", "seg_id", "data", "pos_data")
                .mapInPandas(gen, schema))
        rows = self._filter_tombstoned(rows)
        return rows.drop("seg_id")

    def _filter_tombstoned(self, rows: DataFrame) -> DataFrame:
        """Drop tombstoned (doc_id, seg_id <= before_seg) rows — a
        broadcast anti-join against the (small) tombstone table."""
        t = self.tombstones()
        if t is None:
            return rows
        t = F.broadcast(t.select(
            F.col("doc_id").alias("_t_doc"),
            F.col("before_seg").alias("_t_seg")))
        return (rows.join(
            t, (rows["doc_id"] == t["_t_doc"])
            & (rows["seg_id"] <= t["_t_seg"]), "left_anti"))

    def to_inverted_index(self, docs: Optional[DataFrame] = None):
        """Full-featured query view over the chunk storage: an
        InvertedIndex whose postings decode on demand, so the entire
        executor algebra (boolean trees, collapse, facets, expand,
        every weighting scheme) runs against the segment index.
        Phrase/NEAR work when the index was built with
        keep_positions=True (positions ride in per-chunk pos_data,
        the brass position-table analog)."""
        from xapian_spark.index.build import InvertedIndex

        postings = self.to_postings()
        return InvertedIndex(postings, self.doclens(), self.term_stats(),
                             self.stats(), docs=docs)

    def doclens(self) -> DataFrame:
        """(doc_id, doclen) decoded straight from the doclen pseudo-term
        chunks — no full-postings decode, no shuffle (each doc's length
        lives in exactly one chunk of one segment)."""
        from xapian_spark.index.codec import decode_chunk

        def gen(batches):
            import pandas as pd

            for pdf in batches:
                ids_l, dl_l, seg_l = [], [], []
                for seg, data in zip(pdf["seg_id"], pdf["data"]):
                    ids, _w, dls = decode_chunk(bytes(data))
                    ids_l.append(ids)
                    dl_l.append(dls)
                    seg_l.append(np.full(len(ids), int(seg),
                                         dtype=np.int64))
                if ids_l:
                    yield pd.DataFrame({
                        "doc_id": np.concatenate(ids_l),
                        "doclen": np.concatenate(dl_l),
                        "seg_id": np.concatenate(seg_l)})

        rows = (self.doclen_chunks.select("seg_id", "data")
                .mapInPandas(gen,
                             "doc_id long, doclen long, seg_id long"))
        return self._filter_tombstoned(rows).drop("seg_id")


def compact(
    index: "SegmentIndex",
    out_path: str,
    n_segments: int = 0,
    target_bytes: int = CHUNK_TARGET_BYTES,
) -> "SegmentIndex":
    """xapian-compact analog (backends/brass/brass_compact.cc:83-951,
    api/compactor.cc): merge a many-segment index into `n_segments`
    fuller segments — per-term posting lists re-merged docid-ascending
    and re-encoded into ~target_bytes chunks (the k-way priority-queue
    merge of the reference becomes one decode → range-shuffle →
    re-encode pass; tf/cf re-derive from chunk metadata as before).

    Head-term skew note: the unit of shuffle is the (doc, term) posting
    row, re-keyed by the doc's NEW segment — a term's postings spread
    across all output segments, so no single task ever holds a full
    head-term posting list (the same property the salted multipass
    merge of brass_compact.cc:679-730 buys).
    """
    from xapian_spark.index.codec import decode_chunk

    spark = index.spark
    if not n_segments:
        n_segments = max(1, index.chunks.select("seg_id")
                         .distinct().count() // 4)

    rows_schema = ("term string, doc_id long, wdf int, doclen long,"
                   " seg_id int, src_seg int, positions array<int>")

    nseg = n_segments

    from xapian_spark.index.codec import decode_positions

    def explode(batches):
        import pandas as pd

        for pdf in batches:
            out = {"term": [], "doc_id": [], "wdf": [], "doclen": [],
                   "seg_id": [], "src_seg": [], "positions": []}
            for term, src, data, pd_ in zip(pdf["term"], pdf["seg_id"],
                                            pdf["data"],
                                            pdf["pos_data"]):
                ids, wdfs, dls = decode_chunk(bytes(data))
                out["term"].extend([term] * len(ids))
                out["doc_id"].extend(int(x) for x in ids)
                out["wdf"].extend(int(x) for x in wdfs)
                out["doclen"].extend(int(x) for x in dls)
                out["seg_id"].extend(
                    int((x - 1) % nseg) if x >= 1 else int(x % nseg)
                    for x in ids)
                out["src_seg"].extend([int(src)] * len(ids))
                if pd_ is None:
                    out["positions"].extend([None] * len(ids))
                else:
                    out["positions"].extend(
                        [p.tolist() for p in decode_positions(
                            bytes(pd_), len(ids))])
            yield pd.DataFrame(out)

    def reencode(batches):
        import pandas as pd

        parts = list(batches)
        if not parts:
            return
        pdf = pd.concat(parts)
        if len(pdf) == 0:
            return
        for seg, g in pdf.groupby("seg_id", sort=True):
            rows = {k.name: [] for k in CHUNKS_SCHEMA.fields}
            g = g.sort_values(["term", "doc_id"])
            for term, tg in g.groupby("term", sort=True):
                ids = tg["doc_id"].to_numpy(dtype=np.int64)
                w = tg["wdf"].to_numpy(dtype=np.int64)
                dl = tg["doclen"].to_numpy(dtype=np.int64)
                plists = list(tg["positions"])
                has_pos = term and any(p is not None for p in plists)
                pos = 0
                for c in encode_chunks(ids, w, dl, target_bytes):
                    rows["term"].append(term)
                    rows["seg_id"].append(int(seg))
                    rows["first_doc_id"].append(c.first_doc_id)
                    rows["last_doc_id"].append(c.last_doc_id)
                    rows["n"].append(c.n)
                    rows["cf"].append(
                        int(w[pos: pos + c.n].sum()) if term
                        else int(dl[pos: pos + c.n].sum()))
                    rows["max_wdf"].append(c.max_wdf)
                    rows["min_doclen"].append(c.min_doclen)
                    rows["data"].append(c.data)
                    rows["pos_data"].append(
                        encode_positions(plists[pos: pos + c.n])
                        if has_pos else None)
                    pos += c.n
            yield pd.DataFrame(rows)

    import time as _time

    t0 = _time.time()
    exploded = index.chunks.select("term", "seg_id", "data", "pos_data") \
        .mapInPandas(explode, rows_schema)
    # purge tombstoned postings: compact is where deletes are
    # physically reclaimed (brass_compact's role for changesets)
    tomb = index.tombstones()
    if tomb is not None:
        t = F.broadcast(tomb.select(
            F.col("doc_id").alias("_t_doc"),
            F.col("before_seg").alias("_t_seg")))
        exploded = exploded.join(
            t, (exploded["doc_id"] == t["_t_doc"])
            & (exploded["src_seg"] <= t["_t_seg"]), "left_anti")
    exploded = exploded.drop("src_seg")
    (exploded
     .repartitionByRange(n_segments, "seg_id")
     .mapInPandas(reencode, CHUNKS_SCHEMA)
     .write.mode("overwrite").partitionBy("seg_id")
     .parquet(f"{out_path}/chunks"))
    build_sec = _time.time() - t0

    built = spark.read.parquet(f"{out_path}/chunks")
    man = (
        built.groupBy("seg_id").agg(
            F.sum(F.when(F.col("term") == DOCLEN_TERM, F.col("n"))
                  .otherwise(0)).cast("long").alias("n_docs"),
            F.sum(F.when(F.col("term") != DOCLEN_TERM, F.col("n"))
                  .otherwise(0)).cast("long").alias("n_postings"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.count_distinct(
                F.when(F.col("term") != DOCLEN_TERM, F.col("term"))
            ).cast("long").alias("n_terms"),
            F.sum(F.length("data")).cast("long").alias("bytes"),
            (F.sum(F.crc32("data")) % F.lit(2**63 - 1))
            .cast("long").alias("checksum"),
        )
        .withColumn("build_sec", F.lit(float(build_sec)))
        .withColumn("input_desc", F.lit(f"compact of {index.path}"))
        .select([f.name for f in MANIFEST_SCHEMA.fields])
    )
    man.write.mode("overwrite").parquet(f"{out_path}/manifest")
    # preserve user metadata across compaction, as the reference's
    # Compactor does (api/compactor.cc:175 resolve_duplicate_metadata):
    # keep each key's latest-revision value, drop deleted (empty) keys,
    # restart the revision counter at 0 in the compacted index.
    meta = index._metadata_df()
    if meta is not None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("key").orderBy(F.desc("rev"))
        (meta.withColumn("_rn", F.row_number().over(w))
         .filter((F.col("_rn") == 1) & (F.col("value") != ""))
         .select("key", "value", F.lit(0).cast("long").alias("rev"))
         .write.mode("overwrite").parquet(f"{out_path}/metadata"))
    _stamp_format(spark, out_path)
    return SegmentIndex(spark, out_path)


def build_segments(
    docs: DataFrame,
    path: str,
    n_segments: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer="xapian",
    target_bytes: int = CHUNK_TARGET_BYTES,
    input_desc: Optional[str] = None,
    resume: bool = True,
    seg_id_offset: int = 0,
    keep_positions: bool = False,
) -> SegmentIndex:
    """Build (or resume building) a SegmentIndex at `path`.

    seg_id = seg_id_offset + (doc_id - 1) % n_segments — the
    reference's multi-database interleave (multimatch.cc:175-176):
    deterministic, so a re-run with `resume=True` skips any seg_id
    already in the manifest and only builds the missing segments.
    `seg_id_offset` lets incremental/streaming commits append disjoint
    segment ranges (the flush-threshold batch analog,
    brass_database.cc:1395-1430).
    """
    spark = docs.sparkSession
    # Appending onto an existing index (resume, streaming drain,
    # replace_documents) must refuse a pre-v2 path BEFORE writing:
    # otherwise the mixed index gets stamped with the current codec
    # version at the end and every old chunk silently decodes its
    # docids off by one — the exact corruption _check_format exists to
    # prevent, caught here at write time rather than first read.
    if (_path_exists(spark, f"{path}/chunks")
            or _path_exists(spark, f"{path}/manifest")):
        _check_format(spark, path)
    else:
        # fresh path: stamp BEFORE writing any chunks, so a crash
        # mid-build leaves a resumable (stamped) partial index rather
        # than chunks with no format.json that the guard above rejects
        _stamp_format(spark, path)
    if not n_segments:
        n_segments = max(docs.rdd.getNumPartitions(), 1)
    fn = SEG_ANALYZERS.get(analyzer, analyzer)
    if not callable(fn):
        raise ValueError(f"unknown analyzer: {analyzer!r}")

    done: set = set()
    if resume:
        try:
            man_df = _read_optional_parquet(spark, f"{path}/manifest")
            if man_df is not None:
                done = {r.seg_id
                        for r in man_df.select("seg_id").collect()}
        except AnalysisException:
            # a crash DURING the manifest append can leave an
            # unreadable directory (only _temporary staging inside);
            # rebuilding everything is SAFE here — chunk writes are
            # idempotent dynamic-partition overwrites — so unlike the
            # tombstone readers, this reader may treat unreadable as
            # empty rather than refuse
            done = set()

    tagged = docs.select(
        F.col(id_col).cast("long").alias(id_col), text_col,
        (F.lit(seg_id_offset)
         + F.pmod(F.col(id_col).cast("long") - 1, F.lit(n_segments)))
        .cast("int").alias("seg_id"),
    )
    todo = tagged.filter(~F.col("seg_id").isin(list(done))) if done \
        else tagged

    if not done or todo.limit(1).count() > 0:
        t0 = time.time()

        def gen(batches):
            import pandas as pd

            parts = list(batches)
            if not parts:
                return
            pdf = pd.concat(parts)
            if len(pdf) == 0:
                return
            for _seg, g in pdf.groupby("seg_id", sort=True):
                yield _invert_segment(g, fn, text_col, id_col,
                                      target_bytes, keep_positions)

        # One segment per task: repartitionByRange on seg_id gives a
        # near-perfect 1:1 segment→partition mapping (hash partitioning
        # via groupBy Poisson-collides segments into shared tasks and
        # the max-loaded task gates the build — measured 2x slower at
        # 32 cores). The shuffle moves only (doc_id, text, seg_id); the
        # CPU-heavy invert runs balanced, one task per segment.
        chunk_df = (
            todo.repartitionByRange(n_segments, "seg_id")
            .mapInPandas(gen, CHUNKS_SCHEMA)
        )
        # Idempotent per-segment commit: dynamic partition overwrite
        # replaces exactly the seg_id partitions present in chunk_df,
        # so a crash (or foreachBatch retry) after the chunks write but
        # before the manifest append leaves orphan rows that the replay
        # OVERWRITES rather than duplicates — postings can never be
        # double-counted. Manifested segments are excluded from `todo`
        # and therefore never touched.
        _write_dynamic_overwrite(chunk_df, f"{path}/chunks", "seg_id")
        build_sec = time.time() - t0

        # manifest rows for the newly built segments (lineage + metrics)
        built = spark.read.parquet(f"{path}/chunks")
        if done:
            built = built.filter(~F.col("seg_id").isin(list(done)))
        man = (
            built.groupBy("seg_id").agg(
                F.sum(F.when(F.col("term") == DOCLEN_TERM, F.col("n"))
                      .otherwise(0)).cast("long").alias("n_docs"),
                F.sum(F.when(F.col("term") != DOCLEN_TERM, F.col("n"))
                      .otherwise(0)).cast("long").alias("n_postings"),
                F.count(F.lit(1)).cast("long").alias("n_chunks"),
                F.count_distinct(
                    F.when(F.col("term") != DOCLEN_TERM, F.col("term"))
                ).cast("long").alias("n_terms"),
                F.sum(F.length("data")).cast("long").alias("bytes"),
                # order-independent checksum: Σ crc32(data) — stable
                # across shuffles and engines
                (F.sum(F.crc32("data")) % F.lit(2**63 - 1))
                .cast("long").alias("checksum"),
            )
            .withColumn("build_sec", F.lit(float(build_sec)))
            .withColumn("input_desc",
                        F.lit(input_desc or "unspecified"))
            .select([f.name for f in MANIFEST_SCHEMA.fields])
        )
        man.write.mode("append").parquet(f"{path}/manifest")

    return SegmentIndex(spark, path)


def delete_documents(index: SegmentIndex, doc_ids: Iterable[int]
                     ) -> SegmentIndex:
    """Tombstone delete (BrassWritableDatabase::delete_document,
    backends/brass/brass_database.cc:1105-1163, re-expressed for
    immutable segment storage):

    - the doc_ids are appended to `{path}/tombstones` with
      before_seg = the current max seg_id, so segments appended LATER
      (a replace) stay live for the same docid;
    - exact per-term stat deltas are computed by decoding ONLY the
      chunks whose block range [first_doc_id, last_doc_id] covers a
      deleted docid (the block-max metadata doubles as a delete
      index) and appended to `{path}/tombstone_deltas` — term_stats /
      stats subtract them, keeping BM25 exact without a rebuild;
    - postings stay on disk until `compact()` purges them (the
      reference's "deletes are cheap, space is reclaimed by
      compaction" model).

    Returns a fresh SegmentIndex view of the same path.
    """
    from xapian_spark.index.codec import decode_chunk

    spark = index.spark
    ids = sorted({int(d) for d in doc_ids})
    cur_max = index.chunks.agg(F.max("seg_id")).head()[0]
    existing = index.tombstones()
    prior: dict = {}
    if existing is not None and ids:
        prior = {r["doc_id"]: r["before_seg"] for r in existing.filter(
            F.col("doc_id").isin(ids)).collect()}
        # a doc whose tombstone already covers every current segment is
        # fully dead — re-deleting it must not double the stat deltas.
        # But a doc RESURRECTED by a later replace (segments appended
        # past its before_seg) is live again and must be re-tombstoned,
        # with deltas counted only over those newer segments.
        ids = [d for d in ids if prior.get(d, -1) < cur_max]
    if not ids:
        return SegmentIndex(spark, index.path)

    before_seg = cur_max
    dead = np.array(ids, dtype=np.int64)
    minseg = np.array([prior.get(d, -1) for d in ids], dtype=np.int64)
    b = spark.sparkContext.broadcast((dead, minseg))

    def gen(batches):
        import pandas as pd

        dd, ms = b.value
        for pdf in batches:
            terms, tfd, cfd = [], [], []
            for term, seg, first, last, data in zip(
                    pdf["term"], pdf["seg_id"], pdf["first_doc_id"],
                    pdf["last_doc_id"], pdf["data"]):
                lo = np.searchsorted(dd, first)
                if lo >= dd.size or dd[lo] > last:
                    continue  # block range holds no deleted doc
                cids, wdfs, _dls = decode_chunk(bytes(data))
                idx = np.searchsorted(dd, cids)
                m = idx < dd.size
                m[m] = dd[idx[m]] == cids[m]
                # postings in segments at/below the doc's PRIOR
                # tombstone were already delta'd by that delete
                m[m] = ms[idx[m]] < int(seg)
                if not m.any():
                    continue
                terms.append(term)
                tfd.append(int(m.sum()))
                # doclen pseudo chunks store doclen in the wdf slot, so
                # cf_delta is Σ wdf for real terms AND Σ doclen for the
                # doclen term with the same expression
                cfd.append(int(wdfs[m].sum()))
            yield pd.DataFrame(
                {"term": terms, "tf_delta": tfd, "cf_delta": cfd})

    deltas = (index.chunks
              .select("term", "seg_id", "first_doc_id", "last_doc_id",
                      "data")
              .mapInPandas(gen,
                           "term string, tf_delta long, cf_delta long")
              .groupBy("term").agg(
                  F.sum("tf_delta").alias("tf_delta"),
                  F.sum("cf_delta").alias("cf_delta")))
    # Two-phase batched commit (crash-safe AND retry-idempotent):
    # batch_id = max committed batch + 1. Phase 1 writes the stat
    # deltas under that batch_id with dynamic-partition OVERWRITE — a
    # retried delete replaces the orphan partition rather than
    # appending a second copy. Phase 2 writes the tombstone rows, which
    # COMMIT the batch: _deltas() ignores any deltas batch that has no
    # matching tombstone batch, so a crash between the phases changes
    # neither document visibility nor stats, and the retry (same ids →
    # same batch_id, since the tombstones table is unchanged) replays
    # cleanly.
    raw = index._tombstones_raw()
    bid = 0
    if raw is not None:
        bid = int(raw.agg(F.max("batch_id")).head()[0] or 0) + 1
    # Pre-clean any orphan partition for this batch id BEFORE writing:
    # dynamic partition overwrite only replaces partitions PRESENT in
    # the new frame, so a retry whose deltas happen to be empty (e.g.
    # deleting ids that were never indexed) would otherwise leave a
    # stale orphan batch in place — which the tombstones write below
    # would then wrongly commit.
    _delete_path(spark,
                 f"{index.path}/tombstone_deltas/batch_id={bid}")
    _write_dynamic_overwrite(
        deltas.withColumn("batch_id", F.lit(bid)),
        f"{index.path}/tombstone_deltas", "batch_id")
    _write_dynamic_overwrite(
        spark.createDataFrame(
            [(d, int(before_seg), bid) for d in ids],
            "doc_id long, before_seg int, batch_id int"),
        f"{index.path}/tombstones", "batch_id")
    return SegmentIndex(spark, index.path)


def replace_documents(
    index: SegmentIndex,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer="xapian",
    n_segments: int = 1,
    keep_positions: bool = False,
) -> SegmentIndex:
    """BrassWritableDatabase::replace_document analog
    (brass_database.cc:1167-1230): delete the old postings (tombstone)
    and append the new versions as a fresh, disjoint segment range —
    the same docids, live only in segments past the tombstone's
    before_seg."""
    ids = [r[id_col] for r in docs.select(id_col).collect()]
    idx = delete_documents(index, ids)
    offset = (idx.chunks.agg(F.max("seg_id")).head()[0] or 0) + 1
    return build_segments(
        docs, idx.path, n_segments=n_segments, text_col=text_col,
        id_col=id_col, analyzer=analyzer,
        input_desc=f"replace {len(ids)} docs",
        seg_id_offset=offset, keep_positions=keep_positions)
