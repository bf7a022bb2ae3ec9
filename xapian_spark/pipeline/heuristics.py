"""Classic web-corpus curation heuristics — C4 line-level cleaning,
Gopher document-quality rules, and temperature-based domain mixture
sampling.

These are the standard published filters a Common-Crawl-scale training
pipeline runs between raw extraction and dedup:

- C4 (Raffel et al., "Exploring the Limits of Transfer Learning with a
  Unified Text-to-Text Transformer", 2020, §2.2): keep only lines that
  end in terminal punctuation and have >= 3 words, drop lines
  mentioning javascript, drop whole pages containing "lorem ipsum" or
  a curly brace, and require a minimum number of surviving lines.
- Gopher (Rae et al., "Scaling Language Models: Methods, Analysis &
  Insights from Training Gopher", 2021, A1.1): word-count bounds, mean
  word length bounds, symbol-to-word ratio, bullet/ellipsis line
  ratios, alphabetic-word ratio, and a required-stopword count.
- Temperature sampling (multilingual-mixture resampling as in mBERT /
  XLM-R / mT5): per-domain keep rate proportional to p_domain^(a-1),
  scaled so the rarest domain keeps everything — rare domains are
  upweighted relative to their natural share without ever repeating a
  document.

Everything is built-in pyspark.sql.functions (JVM-side, whole-stage
codegen, no Python workers). The only non-narrow operation in the
module is the tiny per-domain count aggregate in mixture_sample, whose
result is broadcast — every other operator is a pure projection /
filter that scales linearly and pushes column pruning into the scan.
The per-row decisions are deterministic (seeded md5 identity hashing,
same idiom as sampling.deterministic_sample), so the DuckDB oracle can
replay every predicate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xapian_spark.pipeline.sampling import _M, _bucket

# C4's "terminal punctuation" set: sentence-final marks incl. closing
# double-quote (Raffel et al. §2.2 keep lines ending in a terminal
# punctuation mark).
TERMINAL_PUNCT = (".", "!", "?", '"')

# Gopher A1.1 required stopwords: a document must contain at least 2.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have",
                    "with")


# Explicit whitespace class instead of \s: Java regex counts \x0B as
# whitespace, RE2 (the DuckDB oracle engine) does not — an explicit
# class keeps the split engine-identical.
WHITESPACE_RE = "[ \\t\\n\\r\\f]+"

# Line splitting accepts CRLF: real web text is heavily \r\n, and a
# trailing \r would defeat every endswith-based line rule (trim strips
# only spaces). Same pattern in the DuckDB oracles.
LINE_SPLIT_RE = "\\r?\\n"


def _lines(text: Column) -> Column:
    """Trimmed lines split on \\n or \\r\\n."""
    return F.transform(F.split(text, LINE_SPLIT_RE),
                       lambda ln: F.trim(ln))


def _words(text: Column) -> Column:
    """Whitespace-delimited words (empty strings removed) — the word
    notion both C4 and Gopher count with (NOT the index tokenizer:
    these filters see raw punctuation on purpose)."""
    return F.filter(F.split(text, WHITESPACE_RE), lambda w: w != "")


def _line_keep(line: Column, min_words: int) -> Column:
    """C4 line predicate: terminal punctuation, >= min_words words, no
    'javascript' mention."""
    return (
        _ends_terminal(line)
        & (F.size(_words(line)) >= min_words)
        & ~F.lower(line).contains("javascript")
    )


def c4_clean(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id", min_words_per_line: int = 3,
             min_lines: int = 3) -> DataFrame:
    """C4-style cleaning: per-document kept-line statistics, the
    cleaned text (surviving lines re-joined with newlines), and the
    document-level keep decision.

    Line level (each '\\n'-separated line, trimmed): keep iff it ends
    in terminal punctuation AND has >= min_words_per_line
    whitespace-words AND does not mention "javascript"
    (case-insensitive). Document level: keep iff >= min_lines lines
    survive AND the page contains neither "lorem ipsum"
    (case-insensitive) nor '{'.

    Returns (doc_id, n_lines, n_kept_lines, clean_text, keep) for
    EVERY input document — callers filter on `keep`; returning the
    flags makes the reject reasons auditable (and the operator
    oracle-replayable row-for-row). Pure narrow projection: no
    shuffle, no UDF, scales linearly in input bytes.
    """
    lines = _lines(F.col(text_col))
    kept = F.filter(lines, lambda ln: _line_keep(ln, min_words_per_line))
    lowered = F.lower(F.col(text_col))
    doc_keep = (
        (F.size(kept) >= min_lines)
        & ~lowered.contains("lorem ipsum")
        & ~lowered.contains("{")
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        F.array_join(kept, "\n").alias("clean_text"),
        doc_keep.alias("keep"),
    )


def _count_occurrences(text: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal substring —
    (len(text) - len(replace(text, needle, ''))) / len(needle); the
    same leftmost-non-overlapping semantics in Spark and DuckDB."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle),
                                             F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def _gopher_metrics(text: Column) -> dict:
    """The Gopher A1.1 metric expressions over a text column — ONE
    definition shared by gopher_quality (reports metrics + flags) and
    gopher_keep_col (just the conjunction), so the rule formulas
    cannot diverge."""
    words = _words(text)
    n_words = F.size(words)
    safe_n = F.greatest(n_words, F.lit(1)).cast("double")
    lines = F.filter(_lines(text), lambda ln: ln != "")
    safe_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    return {
        "n_words": n_words,
        "mean_len": (
            F.aggregate(words, F.lit(0).cast("long"),
                        lambda acc, w: acc + F.length(w)).cast("double")
            / safe_n),
        "symbol_ratio": (
            (_count_occurrences(text, "#")
             + _count_occurrences(text, "...")).cast("double") / safe_n),
        "bullet_frac": (
            F.size(F.filter(
                lines,
                lambda ln: ln.startswith("-") | ln.startswith("*")
                | ln.startswith("\u2022"),
            )).cast("double") / safe_lines),
        "ellipsis_frac": (
            F.size(F.filter(lines, lambda ln: ln.endswith("...")))
            .cast("double") / safe_lines),
        "alpha_word_frac": (
            F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
            .cast("double") / safe_n),
        "n_stopwords": F.size(F.array_intersect(
            F.array_distinct(F.transform(words, lambda w: F.lower(w))),
            stop_arr)),
    }


def _gopher_rules(m: dict, min_words: int, max_words: int) -> dict:
    return {
        "ok_words": (m["n_words"] >= min_words)
        & (m["n_words"] <= max_words),
        "ok_mean_len": (m["mean_len"] >= 3.0) & (m["mean_len"] <= 10.0),
        "ok_symbol": m["symbol_ratio"] <= 0.1,
        "ok_bullet": m["bullet_frac"] <= 0.9,
        "ok_ellipsis": m["ellipsis_frac"] <= 0.3,
        "ok_alpha": m["alpha_word_frac"] >= 0.8,
        "ok_stopwords": m["n_stopwords"] >= 2,
    }


def gopher_quality(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", min_words: int = 50,
                   max_words: int = 100_000) -> DataFrame:
    """Gopher quality-filter metrics and rule flags (Rae et al. 2021,
    A1.1), one row per input document:

    - n_words in [min_words, max_words]  (paper: 50..100,000)
    - mean word length in [3, 10]
    - symbol-to-word ratio ('#' or '...' occurrences / word) <= 0.1
    - <= 90% of lines starting with a bullet ('-', '*', or U+2022)
    - <= 30% of lines ending with an ellipsis ('...')
    - >= 80% of words containing at least one alphabetic character
    - >= 2 distinct stopwords from GOPHER_STOPWORDS present

    Returns the rounded metrics, one boolean per rule, and the overall
    `keep` conjunction. All built-in expressions — narrow, no shuffle.
    For just the keep decision as a filterable Column (e.g. on a
    streaming frame, where joining the metrics frame back would be a
    stream-stream join), use gopher_keep_col.
    """
    text = F.col(text_col)
    m = _gopher_metrics(text)
    r = _gopher_rules(m, min_words, max_words)
    keep = F.lit(True)
    for c in r.values():        # fold, like gopher_keep_col — a new
        keep = keep & c         # rule tightens both paths at once

    return docs.select(
        F.col(id_col).alias("doc_id"),
        m["n_words"].alias("n_words"),
        F.round(m["mean_len"], 6).alias("mean_word_len"),
        F.round(m["symbol_ratio"], 6).alias("symbol_ratio"),
        F.round(m["bullet_frac"], 6).alias("bullet_frac"),
        F.round(m["ellipsis_frac"], 6).alias("ellipsis_frac"),
        F.round(m["alpha_word_frac"], 6).alias("alpha_word_frac"),
        m["n_stopwords"].alias("n_stopwords"),
        r["ok_words"].alias("ok_words"),
        r["ok_mean_len"].alias("ok_mean_len"),
        r["ok_symbol"].alias("ok_symbol"),
        r["ok_bullet"].alias("ok_bullet"),
        r["ok_ellipsis"].alias("ok_ellipsis"),
        r["ok_alpha"].alias("ok_alpha"),
        r["ok_stopwords"].alias("ok_stopwords"),
        keep.alias("keep"),
    )


def gopher_keep_col(text: Column, min_words: int = 50,
                    max_words: int = 100_000) -> Column:
    """The Gopher `keep` conjunction as a single boolean Column over a
    text column — the same rules gopher_quality reports (one shared
    definition, _gopher_metrics/_gopher_rules), composable into any
    projection/filter including Structured Streaming frames, which
    cannot join the metrics frame back without a stateful
    stream-stream join."""
    r = _gopher_rules(_gopher_metrics(text), min_words, max_words)
    out = F.lit(True)
    for c in r.values():
        out = out & c
    return out


def mixture_rates(docs: DataFrame, domain_col: str = "lang",
                  alpha: float = 0.5) -> DataFrame:
    """Per-domain keep rates for temperature-based mixture sampling:
    rate_d = (count_d / total)^(alpha-1), normalized so the RAREST
    domain's rate is 1.0 — i.e. rate_d = (min_count / count_d)^(1-alpha).
    alpha=1 reproduces the natural distribution (all rates 1);
    alpha->0 flattens toward uniform. Tiny output (one row per
    domain); the aggregate is the only shuffle in the module and its
    input is just the domain column.

    alpha=0.5 keeps rate_d = sqrt(min_count/count_d) — chosen as the
    driver-query default because sqrt is correctly rounded IEEE-754 in
    every engine, so the DuckDB oracle reproduces the rates
    bit-for-bit (pow is only ~1-ulp-accurate and could disagree)."""
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0,1], got {alpha}")
    # NULL domains are excluded: an inner join in mixture_sample could
    # never keep them anyway, and letting a NULL group win the min
    # would silently deflate every real domain's rate.
    counts = (docs.filter(F.col(domain_col).isNotNull())
              .groupBy(F.col(domain_col).alias("domain"))
              .agg(F.count(F.lit(1)).alias("n_docs")))
    with_min = counts.withColumn(
        "min_docs", F.min("n_docs").over(_unbounded_window()))
    ratio = F.col("min_docs").cast("double") / F.col("n_docs")
    if alpha == 0.5:
        rate = F.sqrt(ratio)
    else:
        rate = F.pow(ratio, F.lit(1.0 - alpha))
    return with_min.select(
        "domain", "n_docs",
        rate.alias("rate"),
    )


def _unbounded_window():
    from pyspark.sql import Window
    return (Window.partitionBy()
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))


def mixture_sample(docs: DataFrame, domain_col: str = "lang",
                   id_col: str = "doc_id", alpha: float = 0.5,
                   seed: int = 42) -> DataFrame:
    """Temperature-resample a corpus by domain: keep each row iff
    md5(seed:id) falls under its domain's mixture rate. Deterministic
    per (seed, id) — stable across runs, partitioning, and appends,
    like every sampler in this package. The per-domain rate table is
    broadcast (|domains| rows), so the big side never shuffles; the
    whole job is scan -> broadcast-hash-join -> filter.

    The unbounded min window in mixture_rates runs on the POST-AGG
    frame (|domains| rows in one task) — fine at any corpus scale
    because the aggregate, not the window, sees the data.

    Rows whose domain is NULL are dropped (they have no rate; handle
    unknown domains upstream, e.g. lang_id's 'und' bucket)."""
    rates = mixture_rates(docs, domain_col, alpha)
    joined = docs.join(
        F.broadcast(rates.withColumnRenamed("domain", domain_col)),
        domain_col)
    return (
        joined
        .filter(_bucket(F.col(id_col), seed)
                < F.col("rate") * F.lit(float(_M)))
        .drop("n_docs", "min_docs")
    )


def budget_mixture_alloc(docs: DataFrame, budget: int,
                         max_epochs: int = 4,
                         domain_col: str = "lang",
                         unit_col: str = "n_chars",
                         rounds: int = 6):
    """Allocate a training-token budget across domains by INTEGER
    water-filling: every open (un-capped) domain receives an equal
    integer share of the remaining budget each round, clipped at its
    repeat cap max_epochs·T_d; capped domains release their surplus
    to the rest (the standard way a 1T-token run is planned over
    domains of very different sizes with an up-sampling limit). All
    arithmetic is int64 floor division — like fixed-point PageRank,
    the result is byte-identical across engines, so the DuckDB
    oracle replays it exactly. A few units of budget can remain
    unallocated when the remainder no longer splits (share rounds to
    0) — deterministic, bounded by n_domains·rounds.

    The per-domain totals are a tiny aggregate collected to the
    driver (|domains| rows — the IVF-trainer pattern); the loop runs
    at most `rounds` passes and extra passes are no-ops once the
    share reaches 0. Returns [(domain, t_units, alloc_units)] sorted
    by domain."""
    if budget < 0 or max_epochs < 1:
        raise ValueError("need budget >= 0 and max_epochs >= 1")
    rows = (docs.groupBy(domain_col)
            .agg(F.sum(unit_col).cast("long").alias("t"))
            .collect())
    # NULL domains can never receive allocation (apply's equi-join
    # drops them) — exclude them here too instead of crashing sorted()
    # on a None/str comparison
    doms = sorted((r[domain_col], int(r["t"])) for r in rows
                  if r[domain_col] is not None)
    alloc = {d: 0 for d, _t in doms}
    caps = {d: max_epochs * t for d, t in doms}
    remaining = int(budget)
    for _ in range(rounds):
        open_ = [d for d, _t in doms if alloc[d] < caps[d]]
        if not open_ or remaining <= 0:
            break
        share = remaining // len(open_)
        if share == 0:
            break
        for d in open_:
            give = min(share, caps[d] - alloc[d])
            alloc[d] += give
            remaining -= give
    return [(d, t, alloc[d]) for d, t in doms]


def apply_budget_mixture(docs: DataFrame, alloc,
                         seed: int = 42,
                         domain_col: str = "lang",
                         id_col: str = "doc_id") -> DataFrame:
    """Materialize a budget allocation as (row, epoch) training
    instances: every doc of domain d appears floor(alloc_d/T_d) times
    (full epochs) plus once more iff its md5 bucket falls under the
    fractional remainder — deterministic per (seed, id), stable
    across runs/partitioning/appends like every sampler here. The
    allocation table is broadcast; the corpus side never shuffles
    (scan → broadcast join → filter → explode). In DOC expectation
    the sampled unit share equals alloc_d/T_d exactly; per-doc unit
    weighting is the upstream unit_col's business.

    `alloc` is budget_mixture_alloc's output. Returns the input rows
    with an extra `epoch` column (0-based)."""
    import pandas as pd

    spark = docs.sparkSession
    table = [(d, int(a) // int(t),
              float((int(a) % int(t)) / int(t) * _M))
             for d, t, a in alloc if int(t) > 0]
    # pandas → Arrow → LocalRelation: a parallelized driver LIST would
    # pay defaultParallelism Python-worker round-trips per action (the
    # round-3 tiny-write trap)
    adf = spark.createDataFrame(
        pd.DataFrame(table, columns=[domain_col, "_epochs", "_fr"]),
        f"{domain_col} string, _epochs long, _fr double")
    joined = docs.join(F.broadcast(adf), domain_col)
    n = (F.col("_epochs")
         + (_bucket(F.col(id_col), seed) < F.col("_fr")).cast("long"))
    return (joined
            .withColumn("_n", n)
            .filter(F.col("_n") > 0)
            .withColumn("epoch", F.explode(
                F.sequence(F.lit(0), (F.col("_n") - 1).cast("int"))))
            .drop("_epochs", "_fr", "_n"))


def line_stats(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Per-document line-duplication and line-shape statistics — the
    line-granularity repetition rules FineWeb/Gopher filter on
    (repetition_stats covers the n-gram granularity):

    - n_lines / n_distinct_lines: non-empty trimmed lines and their
      distinct count;
    - dup_line_frac: fraction of line occurrences beyond the first of
      each distinct line (Gopher drops docs > 0.30);
    - dup_line_char_frac: character mass of those duplicate
      occurrences over all line characters (Gopher drops > 0.20);
    - punct_line_frac: fraction of lines ending in terminal
      punctuation (FineWeb keeps docs >= 0.12).

    Pure narrow higher-order-array expressions: no shuffle, no Python
    — scan-bound at any corpus size, and replayed exactly by the
    DuckDB oracle."""
    lines = F.filter(_lines(F.col(text_col)), lambda ln: ln != "")
    dlines = F.array_distinct(lines)
    n = F.size(lines)
    nd = F.size(dlines)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    chars = F.aggregate(lines, F.lit(0).cast("long"),
                        lambda acc, ln: acc + F.length(ln))
    dchars = F.aggregate(dlines, F.lit(0).cast("long"),
                         lambda acc, ln: acc + F.length(ln))
    punct = F.size(F.filter(lines, lambda ln: _ends_terminal(ln)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_lines"),
        nd.alias("n_distinct_lines"),
        F.round((n - nd).cast("double") / safe_n, 6)
        .alias("dup_line_frac"),
        F.round((chars - dchars).cast("double")
                / F.greatest(chars, F.lit(1)), 6)
        .alias("dup_line_char_frac"),
        F.round(punct.cast("double") / safe_n, 6)
        .alias("punct_line_frac"),
    )


def _ends_terminal(line: Column) -> Column:
    cond = F.lit(False)
    for p in TERMINAL_PUNCT:
        cond = cond | line.endswith(p)
    return cond
