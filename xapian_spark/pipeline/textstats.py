"""Text-analysis operators for training-data pipelines.

Token counting, quality scoring, language ID (stopword heuristic), and
document fingerprinting over a documents table — all pure
pyspark.sql.functions (JVM-side, whole-stage codegen; no Python UDFs), so
they hold up on 100 TB inputs and are expressible in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# tiny deterministic stopword lists for the language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "is", "to", "in", "that", "it", "on"],
    "de": ["der", "die", "das", "und", "ist", "zu", "den", "ein", "nicht",
           "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "que", "por"],
}


def tokens_col(text: Column) -> Column:
    """lowercased word tokens as an array column (empty strings removed)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def token_stats(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, avg_token_len)."""
    toks = tokens_col(F.col(text_col))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.aggregate(
                toks, F.lit(0).cast("long"),
                lambda acc, t: acc + F.length(t),
            ).cast("double")
            / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, alpha/digit/space/punct ratios,
    stopword ratio, type-token ratio, and a composite [0,1] score."""
    text = F.col(text_col)
    n_chars = F.greatest(F.length(text), F.lit(1))
    toks = tokens_col(text)
    n_tokens = F.greatest(F.size(toks), F.lit(1))
    sw = F.array([F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("double") / n_tokens
    )
    alpha_ratio = (
        (n_chars - F.length(F.regexp_replace(text, "[A-Za-z]", "")))
        .cast("double") / n_chars
    )
    digit_ratio = (
        (n_chars - F.length(F.regexp_replace(text, "[0-9]", "")))
        .cast("double") / n_chars
    )
    punct_ratio = (
        (n_chars - F.length(
            F.regexp_replace(text, r"[^A-Za-z0-9\s]", "")))
        .cast("double") / n_chars
    )
    ttr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    # composite: long-enough, mostly alphabetic, some stopwords, low punct
    score = (
        F.least(F.size(toks).cast("double") / F.lit(100.0), F.lit(1.0))
        * F.lit(0.25)
        + alpha_ratio * F.lit(0.25)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.25)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0)))
        * F.lit(0.25)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(digit_ratio, 6).alias("digit_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("type_token_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language guess: the language whose stopword list hits
    the most tokens wins; ties break to the lexicographically largest lang
    code (struct max), zero hits → 'und' (undetermined)."""
    toks = tokens_col(F.col(text_col))
    hit_cols = []
    for lang, words in sorted(STOPWORDS.items()):
        arr = F.array([F.lit(w) for w in words])
        hit_cols.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
                .alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # pick max hits; tie → lexicographically LARGEST lang (array_max on
    # (hits, lang) structs compares lang as the tiebreak ascending and
    # takes the max — matching the docstring; deterministic either way)
    best = F.array_max(F.array(*hit_cols))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["hits"] > 0, best["lang"])
        .otherwise(F.lit("und")).alias("lang_guess"),
        best["hits"].alias("stopword_hits"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic content fingerprint: md5 of the
    whitespace-normalized, lowercased text."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(norm).alias("fingerprint"),
    )


def _all_ngrams(toks: Column, n: int) -> Column:
    """ALL word n-grams of a token array (occurrences, not the distinct
    set — repetition stats need multiplicities). Same n-slices/zip_with
    formulation as dedup._shingles_of: every subexpression evaluates
    O(1) times per document (the naive transform(i -> slice(...)) form
    re-evaluates the token expression per n-gram and goes quadratic)."""
    ln = F.size(toks) - (n - 1)
    parts = [F.slice(toks, j + 1, F.greatest(ln, F.lit(0)))
             for j in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda x, y: F.concat_ws(" ", x, y))
    return F.when(F.size(toks) < n,
                  F.array().cast("array<string>")).otherwise(grams)


def _spread(docs: DataFrame) -> DataFrame:
    """Repartition a narrow input up to session parallelism before a
    CPU-heavy tokenize/explode stage — a single small parquet file
    would otherwise serialize it into ONE task (same guard as
    dedup.shingle_df / index.build.spread_input; no-op at scale where
    input partitions >> cores)."""
    from xapian_spark.index.build import spread_input

    return spread_input(docs)


def _doc_tf(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, tok, tf) term frequencies — the shared scoring-pass
    input of unigram_lm_scores and importance_weights; the (doc_id,
    tok) pre-aggregation lets map-side combine collapse repeated
    tokens before the shuffle."""
    return (
        docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _zero_fill(docs: DataFrame, id_col: str, scored: DataFrame,
               fills: list) -> DataFrame:
    """Left-join per-doc results back onto every input doc id so docs
    that produced no rows (empty/short text, OOV) appear with
    defaults. fills = [(col_name, default, cast_type_or_None)]."""
    ids = docs.select(F.col(id_col).alias("doc_id"))
    out = []
    for name, default, cast in fills:
        c = F.coalesce(F.col(name), F.lit(default))
        if cast:
            c = c.cast(cast)
        out.append(c.alias(name))
    return ids.join(scored, "doc_id", "left").select("doc_id", *out)


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher-style within-document repetition statistics (Rae et al.
    2021, table A1): for n in {2, 3}, the fraction of n-gram
    occurrences taken by the single most frequent n-gram
    (top_{n}gram_frac) and the fraction of occurrences belonging to any
    duplicated n-gram (dup_{n}gram_frac). Gopher thresholds these to
    drop boilerplate/spam pages (e.g. top-2-gram fraction > 0.20);
    this emits the raw fractions so callers pick their own cuts.

    Token-fraction variant of Gopher's character fractions (documented
    divergence — same signal, cheaper at corpus scale). Docs with fewer
    than n tokens get 0.0.

    Scale shape: one explode + two groupBys keyed by (doc_id, ...) —
    partial aggregation combines map-side and the key space is bounded
    by document length, so no skew beyond the longest document; no
    driver-side work, no Python UDFs."""
    base = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )
    def _tagged(n: int) -> Column:
        # NB: the lambda must take exactly one arg — F.transform gives a
        # two-arg lambda (element, index), which would shadow a
        # default-arg n with the position
        return F.transform(
            _all_ngrams(F.col("_toks"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    tagged = F.concat(_tagged(2), _tagged(3))
    occurrences = (
        base.select("doc_id", F.explode(tagged).alias("t"))
        .select("doc_id", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    )
    counts = occurrences.groupBy("doc_id", "n", "g").agg(
        F.count(F.lit(1)).alias("c"))
    per_n = counts.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
        .alias("dup"),
    )

    def frac(n: int, num: str) -> Column:
        return F.round(
            F.coalesce(
                F.max(F.when(F.col("n") == n,
                             F.col(num).cast("double") / F.col("total"))),
                F.lit(0.0),
            ),
            6,
        )

    wide = per_n.groupBy("doc_id").agg(
        frac(2, "top").alias("top_2gram_frac"),
        frac(2, "dup").alias("dup_2gram_frac"),
        frac(3, "top").alias("top_3gram_frac"),
        frac(3, "dup").alias("dup_3gram_frac"),
    )
    return _zero_fill(docs, id_col, wide, [
        (c, 0.0, None) for c in ("top_2gram_frac", "dup_2gram_frac",
                                 "top_3gram_frac", "dup_3gram_frac")])


def unigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram frequency table (tok, cf) — the 'training' pass
    of the LM filter. Train once, persist/write, then score any corpus
    against it (the CCNet deployment: the KenLM model is trained on
    Wikipedia, not on the corpus being scored)."""
    return (
        _spread(docs)
        .select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cf"))
    )


def unigram_lm_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      model: DataFrame | None = None) -> DataFrame:
    """CCNet-style language-model quality signal: per-document mean
    negative log2-probability (bits per token) under the corpus's own
    unigram distribution. CCNet/LLaMA filter Common Crawl by KenLM
    5-gram perplexity (Wenzek et al. 2019 §4.3); this is the unigram
    variant of the same signal, expressible without an external model —
    documents full of common tokens score low (fluent/boilerplate),
    rare-token soup scores high. Emits the raw statistic; callers pick
    their own head/middle/tail cuts.

    Returns (doc_id, n_tokens, bits_per_token); empty docs get 0.0.
    `model` is a (tok, cf) frame from unigram_model(); when None the
    model is trained on `docs` itself (self-scoring). Under an
    external model, out-of-vocabulary tokens are excluded from both
    the numerator and n_tokens (in-vocab mean; no smoothing).

    Scale shape: two passes over the corpus when self-scoring — one
    token-keyed groupBy to build the frequency table, one scoring pass
    ((doc_id, token) pre-aggregation so map-side combine collapses
    repeated tokens before the shuffle, then a token-keyed join back)
    — the standard shape of every published LM filter (train pass,
    score pass); pass a persisted `model` to make it one pass. The
    model total is a 1-row broadcast cross join. The frequency side
    has exactly one row per vocabulary term, so the score join skews
    only with document-side head terms ("the"), which AQE's skew-join
    splitting handles; nothing is collected to the driver."""
    spread = _spread(docs)
    tf = _doc_tf(spread, text_col, id_col)
    freq = model if model is not None else unigram_model(spread, text_col)
    total = freq.agg(F.sum("cf").cast("double").alias("total"))
    scored = (
        tf.join(freq, "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(
                F.sum(F.col("tf")
                      * -F.log2(F.col("cf").cast("double")
                                / F.col("total")))
                / F.sum("tf"), 6).alias("bits_per_token"),
        )
    )
    return _zero_fill(docs, id_col, scored, [
        ("n_tokens", 0, "long"), ("bits_per_token", 0.0, None)])


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 100,
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """The corpus's k most frequent word n-grams with document reach —
    the boilerplate-discovery / blocklist-seeding primitive (the
    n-grams topping this list at web scale are cookie banners and nav
    chrome; feed them to line or span filters). Deterministic order:
    count desc, then gram asc on ties.

    Returns (rank, gram, count, n_docs). One (doc_id, gram) pre-
    aggregation (map-side combine collapses within-doc repeats), one
    gram-keyed groupBy with algebraic count/sum, then a TakeOrdered
    top-k — no global sort, nothing driver-side beyond k rows."""
    if n < 1 or k < 1:
        raise ValueError(f"n and k must be >= 1, got n={n} k={k}")
    grams = (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(_all_ngrams(tokens_col(F.col(text_col)), n))
                .alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("gram")
        .agg(F.sum("c").alias("count"),
             F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    top = (grams.orderBy(F.col("count").desc(), F.col("gram"))
           .limit(k))
    # the rank window runs over at most k rows — not a global sort
    from pyspark.sql import Window

    return top.select(
        F.row_number().over(
            Window.orderBy(F.col("count").desc(), F.col("gram")))
        .alias("rank"),
        "gram", "count", "n_docs")


def tfidf_keywords(docs: DataFrame, k: int = 3,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by tf-idf
    (score = tf * ln(N/df)) — the classic keyword-extraction /
    document-tagging primitive. Deterministic: ranking compares the
    6-decimal-ROUNDED score (so the DuckDB oracle ranks identically —
    raw doubles could differ by an ulp across engines), ties break to
    the lexicographically smaller term.

    Returns (doc_id, rank, tok, tf, df, score). Scale shape: one
    (doc, tok) pre-aggregation, one tok-keyed df aggregate joined
    back (one row per vocab term — skew only from document-side head
    terms), a 1-row broadcast N, and a per-DOCUMENT rank window
    (partitioned by the uniform doc key — never a global window)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    spread = _spread(docs)
    tf = _doc_tf(spread, text_col, id_col)
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = spread.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    score = F.round(
        F.col("tf").cast("double")
        * F.log(F.col("n_docs") / F.col("df")), 6)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("tok"))
    return (
        tf.join(df_t, "tok")
        .join(F.broadcast(n))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf",
                F.col("df").cast("long").alias("df"), "score")
    )


def _bigram_pairs(toks: Column) -> Column:
    """Adjacent (w1, w2) struct pairs of a MATERIALIZED token-array
    column — shared by bigram_model and bigram_lm_scores so the
    model-building and scoring passes can never diverge (the same
    single-definition rule as _all_ngrams)."""
    ln = F.size(toks) - 1
    return F.zip_with(
        F.slice(toks, 1, F.greatest(ln, F.lit(0))),
        F.slice(toks, 2, F.greatest(ln, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_model(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram frequency table (w1, w2, c2) — the training pass
    of the bigram LM filter (train once on a reference corpus,
    persist, score any corpus against it — the CCNet deployment
    shape)."""
    toks = tokens_col(F.col(text_col))
    base = _spread(docs).select(toks.alias("_toks"))
    return (
        base.select(F.explode(_bigram_pairs(F.col("_toks"))).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     model: DataFrame | None = None) -> DataFrame:
    """Bigram language-model quality signal — one order up from
    unigram_lm_scores toward CCNet's KenLM 5-gram (Wenzek et al. 2019
    §4.3): per-document mean negative log2-probability over its bigram
    occurrences under add-one (Laplace) smoothed conditionals

        P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,*) + V)

    where c(w1,*) is the count of bigram occurrences starting with w1
    and V the model's distinct-second-word vocabulary. Captures local
    fluency the unigram signal cannot (word-salad with common words
    scores high here, low there).

    Returns (doc_id, n_bigrams, bits_per_bigram); docs with fewer than
    2 tokens get 0 / 0.0. `model` is a (w1, w2, c2) frame from
    bigram_model(); None self-scores. Under an external model, bigrams
    whose CONTEXT w1 is absent are excluded (like unigram OOV); a
    known context with an unseen continuation is smoothed, not
    excluded.

    Scale shape mirrors unigram_lm_scores: train pass (one
    bigram-keyed groupBy), score pass ((doc_id, w1, w2) pre-agg →
    model join). The context table and 1-row vocab total derive from
    the model, not the corpus; joins key on (w1, w2)/(w1) with exactly
    one model row per key, so skew is document-side head bigrams only
    (AQE splits them)."""
    spread = _spread(docs)
    m = model if model is not None else bigram_model(spread, text_col)
    ctx = m.groupBy("w1").agg(F.sum("c2").alias("cw"))
    vocab = m.agg(F.countDistinct("w2").cast("long").alias("vocab"))

    toks = tokens_col(F.col(text_col))
    base = spread.select(F.col(id_col).alias("doc_id"),
                         toks.alias("_toks"))
    d = (base.select("doc_id",
                     F.explode(_bigram_pairs(F.col("_toks"))).alias("p"))
         .groupBy("doc_id", F.col("p.w1").alias("w1"),
                  F.col("p.w2").alias("w2"))
         .agg(F.count(F.lit(1)).alias("tf2")))
    scored = (
        d.join(ctx, "w1")
        .join(m, ["w1", "w2"], "left")
        .join(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("tf2").alias("n_bigrams"),
            F.round(
                F.sum(F.col("tf2") * -F.log2(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
                    .cast("double")
                    / (F.col("cw") + F.col("vocab")).cast("double")))
                / F.sum("tf2"), 6).alias("bits_per_bigram"),
        )
    )
    return _zero_fill(docs, id_col, scored, [
        ("n_bigrams", 0, "long"), ("bits_per_bigram", 0.0, None)])


def ccnet_buckets(docs: DataFrame, fractions=(1 / 3, 2 / 3),
                  text_col: str = "text", id_col: str = "doc_id",
                  model: DataFrame | None = None,
                  thresholds=None) -> DataFrame:
    """CCNet's perplexity partition (Wenzek et al. 2019 §4.3): score
    every document with the LM filter and split the corpus into
    head / middle / tail at the given quantile fractions — head is the
    lowest-perplexity (most fluent) slice, the part CCNet keeps for
    pretraining.

    `thresholds` (two bits_per_token cutoffs) is the production
    interface: compute them once on a bounded sample (CCNet itself
    derives them from held-out Wikipedia, approx_percentile works
    too) and bucketing is a pure broadcast-free CASE filter. When
    None, EXACT thresholds are derived rank-based — the score of the
    row at rank floor(f*(n-1)) in (bits_per_token, doc_id) order —
    by a DISTRIBUTED selection: bits_per_token is rounded to 6
    decimals upstream, so the rank-r value is found by k-ary search
    over the 1e-6 grid (15 interior probe points per rank per pass,
    all probes for both ranks folded into ONE full-parallel
    count-probe aggregate), O(log_16(range)) ≈ 6 passes over the
    localCheckpointed scores and never a global sort or single-task
    window. Selection is by rank, never interpolation, so the value
    is engine-replayable bit-for-bit.

    Returns (doc_id, n_tokens, bits_per_token, bucket)."""
    if len(fractions) != 2 or not (0 < fractions[0] <= fractions[1] < 1):
        raise ValueError(f"fractions must be two increasing values in"
                         f" (0,1), got {fractions}")
    scores = unigram_lm_scores(docs, text_col, id_col, model)
    if thresholds is None:
        import math

        # one materialization of the two-shuffle scoring DAG, shared
        # by the stats pass, the probe passes, and the returned frame
        # (persist would pin executor storage for the session;
        # localCheckpoint cuts lineage and is released with the frame)
        scores = scores.localCheckpoint(eager=True)
        st = scores.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("bits_per_token").alias("lo"),
            F.max("bits_per_token").alias("hi")).collect()[0]
        n = st["n"]
        if n == 0:
            return scores.select("doc_id", "n_tokens",
                                 "bits_per_token",
                                 F.lit("head").alias("bucket"))
        # +1e-9 before floor: float 2/3*(n-1) lands just BELOW the
        # integer when (n-1) divides by 3 (2/3*3 = 1.9999...98), and
        # the rank must match integer-arithmetic replays (2*(n-1)//3)
        ranks = [math.floor(f * (n - 1) + 1e-9) for f in fractions]
        # The rank-r value (doc_id only tiebreaks EQUAL scores, so it
        # never changes the selected VALUE) is the smallest present
        # score s with count(score <= s) >= r+1. Scores live on the
        # 1e-6 grid (round(x, 6) upstream; k/1e6 in Python is the
        # same nearest-double, so grid comparisons are exact), so
        # k-ary-search integer micro-units: each pass probes up to
        # FAN evenly spaced interior grid points per unresolved rank
        # — extra sum() expressions in the SAME scan are nearly free,
        # while every extra PASS pays a full job, so fan-out beats
        # bisection here. Invariant per rank:
        # count(<= klo/1e6) < r+1 <= count(<= khi/1e6); at
        # termination khi is a present score (rows exist in
        # (klo, khi] and the grid has no point between).
        k_min = round(st["lo"] * 1e6)
        k_max = round(st["hi"] * 1e6)
        brackets = [[k_min - 1, k_max] for _ in ranks]
        FAN = 15
        while any(hi - lo > 1 for lo, hi in brackets):
            probe_pts = []  # (rank_idx, grid_point)
            for i, (lo, hi) in enumerate(brackets):
                if hi - lo <= 1:
                    continue
                span = hi - lo
                pts = sorted({lo + max(1, span * j // (FAN + 1))
                              for j in range(1, FAN + 1)})
                probe_pts.extend(
                    (i, p) for p in pts if lo < p < hi)
            probes = scores.agg(*[
                F.sum((F.col("bits_per_token") <= F.lit(p / 1e6))
                      .cast("long")).alias(f"c{j}")
                for j, (_i, p) in enumerate(probe_pts)]).collect()[0]
            for j, (i, p) in enumerate(probe_pts):
                if probes[f"c{j}"] >= ranks[i] + 1:
                    brackets[i][1] = min(brackets[i][1], p)
                else:
                    brackets[i][0] = max(brackets[i][0], p)
        thresholds = [hi / 1e6 for _, hi in brackets]
    if len(thresholds) != 2 or thresholds[0] > thresholds[1]:
        raise ValueError(f"need two ordered thresholds,"
                         f" got {thresholds}")
    bucket = (
        F.when(F.col("bits_per_token") <= thresholds[0], "head")
        .when(F.col("bits_per_token") <= thresholds[1], "middle")
        .otherwise("tail")
    )
    return scores.select("doc_id", "n_tokens", "bits_per_token",
                         bucket.alias("bucket"))


def cross_doc_span_stats(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id", n: int = 4) -> DataFrame:
    """Cross-document repeated-span statistics — the signal behind
    exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better": drop spans that recur
    across the corpus; production uses 50-token spans over a suffix
    array). Per doc: total n-token windows, windows whose n-gram also
    occurs in at least one OTHER document, and that fraction. N-gram
    window counting replaces the suffix array (documented divergence —
    same recurrence signal, join-friendly at corpus scale); within-doc
    repetition is the separate repetition_stats op.

    Returns (doc_id, n_spans, n_shared_spans, shared_span_frac);
    docs with fewer than n tokens get 0 / 0 / 0.0.

    Scale shape: explode windows → (doc_id, gram) pre-aggregation
    (map-side combine collapses within-doc repeats) → gram-keyed
    groupBy for the per-gram document count (linear, one row per
    distinct gram; head-gram skew is bounded by AQE skew-join
    splitting) → join back and one per-doc aggregation. No driver-side
    work, no Python UDFs."""
    grams = (
        _spread(docs)
        .select(F.col(id_col).alias("doc_id"),
                F.explode(_all_ngrams(tokens_col(F.col(text_col)), n))
                .alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ndocs = grams.groupBy("g").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        grams.join(ndocs, "g")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, F.col("c"))
                  .otherwise(F.lit(0))).alias("n_shared_spans"),
        )
        .withColumn("shared_span_frac",
                    F.round(F.col("n_shared_spans").cast("double")
                            / F.col("n_spans"), 6))
    )
    return _zero_fill(docs, id_col, per_doc, [
        ("n_spans", 0, "long"), ("n_shared_spans", 0, "long"),
        ("shared_span_frac", 0.0, None)])


def importance_weights(docs: DataFrame, target_model: DataFrame,
                       raw_model: DataFrame | None = None,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    per-document mean log2 likelihood ratio between a TARGET-domain
    unigram model and the RAW-corpus model. Sampling proportional to
    exp of this weight reshapes the raw corpus toward the target
    distribution; DSIR does the same with hashed-n-gram bag models —
    this is the unigram instance of that estimator (documented
    divergence). `target_model`/`raw_model` are (tok, cf) frames from
    unigram_model(); raw_model defaults to one trained on `docs`.

    Returns (doc_id, n_tokens, log2_ratio_per_token); positive means
    more target-like. Tokens absent from EITHER vocabulary are
    excluded from numerator and n_tokens (no smoothing), so every
    ratio is finite.

    Scale shape: identical to unigram_lm_scores — one (doc_id, token)
    pre-aggregated scoring pass joined to the two model tables (each
    one row per vocab term) plus two 1-row broadcast totals; no
    driver-side work, no Python UDFs."""
    spread = _spread(docs)
    if raw_model is None:
        raw_model = unigram_model(spread, text_col)
    tf = _doc_tf(spread, text_col, id_col)
    tgt = target_model.select("tok", F.col("cf").alias("cf_t"))
    raw = raw_model.select("tok", F.col("cf").alias("cf_r"))
    tot_t = tgt.agg(F.sum("cf_t").cast("double").alias("total_t"))
    tot_r = raw.agg(F.sum("cf_r").cast("double").alias("total_r"))
    ratio = (F.log2(F.col("cf_t").cast("double") / F.col("total_t"))
             - F.log2(F.col("cf_r").cast("double") / F.col("total_r")))
    scored = (
        tf.join(tgt, "tok").join(raw, "tok")
        .join(F.broadcast(tot_t)).join(F.broadcast(tot_r))
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_tokens"),
             F.round(F.sum(F.col("tf") * ratio) / F.sum("tf"), 6)
             .alias("log2_ratio_per_token"))
    )
    return _zero_fill(docs, id_col, scored, [
        ("n_tokens", 0, "long"), ("log2_ratio_per_token", 0.0, None)])


# GPT-2-style pretokenizer pattern, lookahead-free so the same string
# counts identically under Java regex (Spark) and RE2 (DuckDB oracle):
# contraction suffixes, space-prefixed letter runs, digit runs,
# punctuation runs, then single whitespace.
BPE_SPLIT_RE = (r"'(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+"
                r"| ?[^\s\p{L}\p{N}']+|\s")


def bpe_token_counts(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_words, n_bpe_pieces, pieces_per_word) — token-count
    estimation with a BPE-ish pretokenizer regex beside the whitespace
    word count. n_bpe_pieces counts pretokenizer segments (the unit a
    byte-pair encoder would then split subword-wise) — the standard
    cheap proxy for LLM token budgets at corpus scale. Pure JVM regexp
    (whole-stage codegen), one narrow scan, no shuffle."""
    toks = tokens_col(F.col(text_col))
    pieces = F.regexp_extract_all(F.col(text_col),
                                  F.lit(BPE_SPLIT_RE), F.lit(0))
    n_words = F.size(toks)
    n_pieces = F.size(F.filter(pieces, lambda p: F.trim(p) != ""))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        n_pieces.alias("n_bpe_pieces"),
        F.round(n_pieces.cast("double")
                / F.greatest(n_words, F.lit(1)), 6)
        .alias("pieces_per_word"),
    )
