"""Inverted-index build: docs DataFrame → postings/doclens/term_stats/stats.

Spark restatement of the reference's add_document + commit path
(xapian-core/backends/brass/brass_database.cc:1046-1099 and the Inverter,
brass_inverter.h:45-249): tokenize → explode → groupBy(term, doc) → per-term
posting rows; doclen = Σ wdf over ALL of a doc's terms (including Z-stems,
brass_database.cc:1058-1071); global stats mirror brass_dbstats.h:41-61.

Two tokenize paths:
- analyzer="simple": pure Spark SQL (lowercase, split on non-alnum) — stays
  entirely inside whole-stage codegen, and is expressible in ANSI SQL for
  the DuckDB oracle cross-check.
- analyzer="xapian" (default) or any callable: the TermGenerator rules via
  an Arrow-batched mapInPandas (vectorized; no per-row Python UDF calls).

Scale notes (100 TB / 10^12 docs):
- the tokenize → explode stage is embarrassingly parallel (no shuffle);
- the single shuffle is groupBy(term, doc_id) — AQE handles skew, and the
  segment/merge path (segments.py) salts head terms explicitly;
- postings are written range-partitioned + sorted by (term, doc_id) so a
  query's `term IN (...)` filter prunes row groups via parquet min/max.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

POSTINGS_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("wdf", IntegerType(), False),
    StructField("doclen", LongType(), False),
    StructField("positions", ArrayType(IntegerType(), False), True),
])

# Matches the reference brass backend's max term length
# (brass_database.cc:88); longer terms are dropped at index time.
MAX_SAFE_TERM_LENGTH = 245


def xapian_analyzer(text: str):
    """TermGenerator STEM_SOME with english stemmer → [(term, wdf, pos[])]."""
    from xapian_spark.analysis.tokenizer import TermGenerator

    tg = _get_termgen()
    doc = tg.index_text(text or "")
    return [
        (term, wdf, positions)
        for term, (wdf, positions) in doc.terms.items()
    ]


_TERMGEN = None


def _get_termgen():
    global _TERMGEN
    if _TERMGEN is None:
        from xapian_spark.analysis.tokenizer import TermGenerator

        _TERMGEN = TermGenerator()
    return _TERMGEN


_TERMGEN_LANG: dict = {}


def multilingual_analyzer(text: str, lang: str):
    """TermGenerator with the Snowball stemmer matching the row's lang
    column (stem.cc:52-120 registry analog; en/de/fr/es — unknown
    languages index unstemmed). Used with build_index(lang_col=...)."""
    tg = _TERMGEN_LANG.get(lang)
    if tg is None:
        from xapian_spark.analysis.snowball import stemmer_for
        from xapian_spark.analysis.tokenizer import TermGenerator

        tg = TermGenerator(stemmer=stemmer_for(lang or ""))
        _TERMGEN_LANG[lang] = tg
    doc = tg.index_text(text or "")
    return [
        (term, wdf, positions)
        for term, (wdf, positions) in doc.terms.items()
    ]


def apitest_analyzer(text: str):
    """The reference test harness's indexing scheme
    (tests/harness/index_utils.cc:105-160): whitespace split, keep alnum
    (with backslash escapes), lowercase, english stem, sequential
    positions."""
    from xapian_spark.analysis.porter2 import stem

    terms = {}
    pos = 0
    for word in (text or "").split():
        munged = _munge_term(word)
        if not munged:
            continue
        stemmed = stem(munged)
        if not stemmed:
            continue
        pos += 1
        wdf, positions = terms.get(stemmed, (0, []))
        positions.append(pos)
        terms[stemmed] = (wdf + 1, positions)
    return [(t, wdf, positions) for t, (wdf, positions) in terms.items()]


def _munge_term(term: str) -> str:
    # index_utils.cc:118-160 munge_term: alnum kept lowercased, backslash
    # escapes \\ \0 \n \r \t \xNN pass through, everything else dropped.
    out = []
    i = 0
    n = len(term)
    while i < n:
        ch = term[i]
        if ch.isascii() and ch.isalnum():
            out.append(ch.lower())
        elif ch == "\\" and i + 1 < n:
            i += 1
            esc = term[i]
            if esc == "\\":
                out.append("\\")
            elif esc == "0":
                out.append("\0")
            elif esc == "n":
                out.append("\n")
            elif esc == "r":
                out.append("\r")
            elif esc == "t":
                out.append("\t")
            elif esc == "x" and i + 2 < n:
                try:
                    out.append(chr(int(term[i + 1: i + 3], 16)))
                    i += 2
                except ValueError:
                    out.append(esc)
            else:
                out.append(esc)
        i += 1
    return "".join(out)


ANALYZERS = {
    "xapian": xapian_analyzer,
    "apitest": apitest_analyzer,
}


@dataclass
class IndexStats:
    """brass_dbstats.h:41-61 equivalents."""

    doccount: int
    total_doclen: int
    doclen_lbound: int
    doclen_ubound: int
    wdf_ubound: int

    @property
    def average_length(self) -> float:
        # brass_database.cc:726-735 get_avlength
        if self.doccount == 0:
            return 0.0
        return self.total_doclen / self.doccount


class InvertedIndex:
    """A built index: four DataFrames + cached scalar stats."""

    def __init__(
        self,
        postings: DataFrame,
        doclens: DataFrame,
        term_stats: DataFrame,
        stats: IndexStats,
        docs: Optional[DataFrame] = None,
    ) -> None:
        self.postings = postings          # term, doc_id, wdf, positions
        self.doclens = doclens            # doc_id, doclen
        self.term_stats = term_stats      # term, tf, cf
        self.stats = stats
        self.docs = docs                  # optional forward/data table

    # -- persistence -------------------------------------------------------

    def save(self, path: str, num_buckets: int = 0) -> None:
        (self.postings
         .repartitionByRange(F.col("term"))
         .sortWithinPartitions("term", "doc_id")
         .write.mode("overwrite").parquet(f"{path}/postings"))
        self.doclens.write.mode("overwrite").parquet(f"{path}/doclens")
        self.term_stats.sort("term").write.mode("overwrite").parquet(
            f"{path}/term_stats")
        spark = self.postings.sparkSession
        spark.createDataFrame(
            [(self.stats.doccount, self.stats.total_doclen,
              self.stats.doclen_lbound, self.stats.doclen_ubound,
              self.stats.wdf_ubound)],
            "doccount long, total_doclen long, doclen_lbound long,"
            " doclen_ubound long, wdf_ubound long",
        ).write.mode("overwrite").parquet(f"{path}/stats")

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        postings = spark.read.parquet(f"{path}/postings")
        doclens = spark.read.parquet(f"{path}/doclens")
        term_stats = spark.read.parquet(f"{path}/term_stats")
        row = spark.read.parquet(f"{path}/stats").head()
        stats = IndexStats(row.doccount, row.total_doclen,
                           row.doclen_lbound, row.doclen_ubound,
                           row.wdf_ubound)
        return cls(postings, doclens, term_stats, stats)


def spread_input(docs: DataFrame) -> DataFrame:
    """Repartition a narrow input up to the session's parallelism when
    the source layout yields fewer partitions than cores — a single
    small parquet file would otherwise serialize the CPU-heavy
    tokenize into ONE task (measured 17 s single-core vs ~1 s spread
    at sf0.1). No-op at scale, where input partitions >> cores."""
    sc = docs.sparkSession.sparkContext
    target = sc.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        return docs.repartition(target)
    return docs


def _tokenize_python(
    docs: DataFrame, id_col: str, text_col: str,
    analyzer: Callable, keep_positions: bool,
    lang_col: str = None,
) -> DataFrame:
    """Arrow-batched tokenize → exploded postings rows. With lang_col,
    the analyzer is called as analyzer(text, lang) so per-row stemmer
    selection happens inside the same vectorized batch."""
    import pandas as pd

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, terms, wdfs, doclens, poss = [], [], [], [], []
            langs = pdf[lang_col] if lang_col else pdf[id_col]
            for doc_id, text, lang in zip(pdf[id_col], pdf[text_col],
                                          langs):
                toks = analyzer(text, lang) if lang_col \
                    else analyzer(text)
                tl = [
                    (t, w, p) for t, w, p in toks
                    if len(t.encode("utf-8")) <= MAX_SAFE_TERM_LENGTH
                ]
                # doclen known at tokenize time — denormalized into every
                # posting row so scoring never joins doclens at query time
                doclen = sum(w for _t, w, _p in tl)
                for term, wdf, positions in tl:
                    ids.append(doc_id)
                    terms.append(term)
                    wdfs.append(wdf)
                    doclens.append(doclen)
                    poss.append(positions if keep_positions else None)
            yield pd.DataFrame(
                {"term": terms, "doc_id": ids, "wdf": wdfs,
                 "doclen": doclens, "positions": poss}
            )

    cols = [F.col(id_col).cast("long").alias(id_col), F.col(text_col)]
    if lang_col:
        cols.append(F.col(lang_col))
    return spread_input(docs.select(*cols)).mapInPandas(
        gen, POSTINGS_SCHEMA)


# the DuckDB-parity tokenization: lowercase, split on runs of non-alnum
SIMPLE_SPLIT_RE = "[^a-z0-9]+"


def _tokenize_simple(
    docs: DataFrame, id_col: str, text_col: str, keep_positions: bool
) -> DataFrame:
    """Pure-SQL tokenize (no Python): lower → split → posexplode → group."""
    # project BEFORE spreading: the repartition exchange then moves
    # only (id, text), not every input column (html, metadata, ...)
    docs = spread_input(docs.select(
        F.col(id_col).cast("long").alias(id_col), text_col))
    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), SIMPLE_SPLIT_RE),
                    lambda t: t != "",
                )
            ).alias("pos0", "term"),
        )
    )
    agg = [
        F.count(F.lit(1)).cast("int").alias("wdf"),
    ]
    if keep_positions:
        agg.append(
            F.sort_array(
                F.collect_list((F.col("pos0") + 1).cast("int"))
            ).alias("positions")
        )
    out = toks.groupBy("term", "doc_id").agg(*agg)
    if not keep_positions:
        out = out.withColumn(
            "positions", F.lit(None).cast(ArrayType(IntegerType()))
        )
    # denormalize doclen into every posting row (one window shuffle at
    # build time buys join-free scoring at query time)
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id")
    out = out.withColumn("doclen", F.sum("wdf").over(w).cast("long"))
    return out.select("term", "doc_id", "wdf", "doclen", "positions")


def build_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer="xapian",
    keep_positions: bool = True,
    docs_as_data: bool = True,
    lang_col: str = None,
) -> InvertedIndex:
    """Build the four index tables from a (doc_id, text) DataFrame.

    `analyzer` is "simple", a name in ANALYZERS, or a callable
    text -> [(term, wdf, positions)]. With `lang_col`, each row is
    analyzed with the Snowball stemmer for its language column
    (analyzer must accept (text, lang); default multilingual_analyzer).
    """
    if lang_col:
        fn = multilingual_analyzer if analyzer in ("xapian", None) \
            else analyzer
        if not callable(fn):
            raise ValueError(
                f"lang_col needs a (text, lang) callable, got "
                f"{analyzer!r}")
        postings = _tokenize_python(docs, id_col, text_col, fn,
                                    keep_positions, lang_col=lang_col)
    elif analyzer == "simple":
        postings = _tokenize_simple(docs, id_col, text_col, keep_positions)
    else:
        fn = ANALYZERS.get(analyzer, analyzer) if not callable(analyzer) \
            else analyzer
        if not callable(fn):
            raise ValueError(f"unknown analyzer: {analyzer!r}")
        postings = _tokenize_python(docs, id_col, text_col, fn,
                                    keep_positions)

    postings = postings.persist()

    # doclen = Σ wdf over the doc's full termlist (incl. Z-stems).
    doclens = (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(
            postings.groupBy("doc_id").agg(
                F.sum("wdf").cast("long").alias("doclen")),
            "doc_id", "left")
        .fillna(0, subset=["doclen"])
    )

    term_stats = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sum("wdf").cast("long").alias("cf"),
    )

    row = doclens.agg(
        F.count(F.lit(1)).alias("doccount"),
        F.coalesce(F.sum("doclen"), F.lit(0)).alias("total_doclen"),
        F.coalesce(F.min("doclen"), F.lit(0)).alias("doclen_lb"),
        F.coalesce(F.max("doclen"), F.lit(0)).alias("doclen_ub"),
    ).head()
    wdf_ub = postings.agg(F.max("wdf")).head()[0] or 0
    stats = IndexStats(row.doccount, row.total_doclen, row.doclen_lb,
                       row.doclen_ub, wdf_ub)

    return InvertedIndex(
        postings, doclens, term_stats, stats,
        docs=docs if docs_as_data else None,
    )
