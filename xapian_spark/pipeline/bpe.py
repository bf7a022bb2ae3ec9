"""Byte-pair-encoding tokenizer training over a Spark corpus.

The standard LLM-pipeline need: learn a subword vocabulary FROM the
training corpus (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units" — the algorithm GPT-2/RoBERTa-style
tokenizers build on), then encode the corpus with it.

Scale shape (the same bounded-driver pattern as the IVF k-means
trainer in pipeline/similarity.py):

1. `word_counts` — ONE shuffle over the corpus tokens; the result is
   the distinct-word frequency table, whose size is bounded by the
   vocabulary of the language, not the corpus (even at 100 TB the
   distinct-word table is millions of rows, not trillions).
2. `train_bpe` — takes the TOP `max_words` rows deterministically
   (count desc, word asc — a TakeOrdered, no full sort) to the driver
   and runs the classic merge loop there. Cost is
   O(n_merges * |vocab|), independent of corpus size; truncating the
   word table changes pair counts only by the mass of the dropped
   tail, which is the standard trainer trade-off (HuggingFace
   tokenizers train from exactly such a word-count table).
3. `vocab_pieces` / `encode_with_vocab` — encoding rides a BROADCAST
   join from word to its trained symbolization: the corpus side never
   shuffles and never enters Python. Out-of-vocabulary words (absent
   from the training table) fall back to character symbols — exact
   for any word the trainer saw.

Determinism: merges pick the max-count pair with ties broken by
(left, right) ascending; merging inside a word is greedy leftmost
non-overlapping. Both rules are replayed exactly by the DuckDB oracle
(string-replace on space-separated symbol strings has the same
leftmost non-overlapping semantics in every engine).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xapian_spark.pipeline.textstats import tokens_col

Merge = Tuple[str, str, int]  # (left, right, pair count at merge time)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the one corpus-scale shuffle in
    BPE training. Words are the same lowercase [a-z0-9]+ tokens the
    rest of the pipeline counts."""
    return (
        docs.select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    )


def _merge_word(symbols: Tuple[str, ...], left: str,
                right: str) -> Tuple[str, ...]:
    """Greedy leftmost non-overlapping merge of (left, right) inside
    one word's symbol sequence."""
    out: List[str] = []
    i = 0
    n = len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return tuple(out)


def _top_words(wc: DataFrame, max_words: int) -> dict:
    """The bounded driver-side word table: top `max_words` by
    (count desc, word asc) — a TakeOrdered, never a full collect —
    keyed by the word's initial character-symbol tuple."""
    rows = (wc.orderBy(F.col("count").desc(), F.col("word"))
            .limit(max_words).collect())
    return {tuple(r["word"]): int(r["count"]) for r in rows
            if r["word"]}


def _merge_loop(words: dict, n_merges: int) -> Tuple[List[Merge], dict]:
    """The Sennrich loop: returns (merges, final symbolization) —
    callers wanting the trained vocab reuse the loop-exit state
    instead of re-encoding every word."""
    merges: List[Merge] = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, cnt in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + cnt
        if not pairs:
            break
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((left, right, cnt))
        words = {
            (_merge_word(s, left, right)
             if left in s and right in s else s): c
            for s, c in words.items()
        }
    return merges, words


def train_bpe(wc: DataFrame, n_merges: int,
              max_words: int = 1_000_000) -> List[Merge]:
    """Learn `n_merges` BPE merges from a (word, count) table.

    Pulls the top `max_words` rows driver-side (see _top_words) and
    runs the Sennrich merge loop there. Returns [(left, right, count)]
    in merge order. Stops early when no pair is left to merge."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    merges, _ = _merge_loop(_top_words(wc, max_words), n_merges)
    return merges


def train_bpe_vocab(spark: SparkSession, wc: DataFrame, n_merges: int,
                    max_words: int = 1_000_000
                    ) -> Tuple[List[Merge], DataFrame]:
    """Train AND return the encode table in one pass: (merges, vocab)
    where vocab = (word, pieces, n_pieces). ONE corpus aggregation and
    ONE driver collect — the vocab is the merge loop's exit state, so
    nothing is re-collected or re-encoded (train_bpe + vocab_pieces
    separately would run the word-count job and the TakeOrdered
    twice)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    merges, words = _merge_loop(_top_words(wc, max_words), n_merges)
    data = [("".join(syms), list(syms), len(syms))
            for syms in words]
    return merges, _vocab_df(spark, data)


def merges_df(spark: SparkSession, merges: Sequence[Merge]) -> DataFrame:
    """The learned merge table as (rank, left, right, count) — 1-based
    rank in merge order. Built Arrow-side via pandas (LocalRelation),
    not parallelize, to dodge the tiny-driver-list task storm."""
    import pandas as pd

    pdf = pd.DataFrame(
        [(i + 1, l, r, c) for i, (l, r, c) in enumerate(merges)],
        columns=["rank", "left", "right", "count"],
    )
    if pdf.empty:
        return spark.createDataFrame(
            [], "rank int, left string, right string, count bigint")
    return spark.createDataFrame(pdf).select(
        F.col("rank").cast("int"),
        "left", "right",
        F.col("count").cast("bigint"),
    )


def apply_merges(word: str, merges: Sequence[Merge]) -> Tuple[str, ...]:
    """Encode one word: start from characters, apply every merge in
    rank order (the exact training replay — identical output for any
    in-vocabulary word)."""
    syms = tuple(word)
    for left, right, _ in merges:
        if left in syms and right in syms:
            syms = _merge_word(syms, left, right)
    return syms


def _vocab_df(spark: SparkSession, data: list) -> DataFrame:
    import pandas as pd

    pdf = pd.DataFrame(data, columns=["word", "pieces", "n_pieces"])
    if pdf.empty:
        return spark.createDataFrame(
            [], "word string, pieces array<string>, n_pieces int")
    return spark.createDataFrame(pdf).select(
        "word", "pieces", F.col("n_pieces").cast("int"))


def vocab_pieces(spark: SparkSession, wc: DataFrame,
                 merges: Sequence[Merge],
                 max_words: int = 1_000_000) -> DataFrame:
    """(word, pieces, n_pieces) for the top `max_words` words under an
    EXISTING merge list (e.g. one loaded from a previous training run)
    — re-encodes each word driver-side. When training and encoding the
    same corpus, prefer train_bpe_vocab, which reuses the merge loop's
    exit state instead of collecting and encoding twice."""
    data = []
    for syms in _top_words(wc, max_words):
        word = "".join(syms)
        pieces = list(apply_merges(word, merges))
        data.append((word, pieces, len(pieces)))
    return _vocab_df(spark, data)


def encode_with_vocab(docs: DataFrame, vocab: DataFrame,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Per-document encoding stats under a trained vocab:
    (doc_id, n_words, n_pieces, pieces_per_word). The corpus side
    explodes to tokens and BROADCAST-joins the word->pieces table —
    no corpus shuffle besides the final per-doc sum, no Python in the
    corpus path. Words missing from the vocab (possible when the
    trainer truncated at max_words) fall back to CHARACTER count — an
    upper bound: exact for words no learned merge touches, an
    overcount for a truncated-tail word the merges would have
    compressed (encode such tails exactly by unioning them into the
    vocab via vocab_pieces first)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens_col(F.col(text_col))).alias("word"),
    )
    joined = toks.join(
        F.broadcast(vocab.select("word", "n_pieces")), "word", "left")
    per_tok = joined.select(
        "doc_id",
        F.coalesce(F.col("n_pieces"),
                   F.length("word")).cast("long").alias("n_pieces"),
    )
    return (
        per_tok.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum("n_pieces").alias("n_pieces"))
        .select(
            "doc_id",
            F.col("n_words").cast("int"),
            F.col("n_pieces").cast("long"),
            F.round(F.col("n_pieces").cast("double")
                    / F.greatest(F.col("n_words"), F.lit(1)), 6)
            .alias("pieces_per_word"),
        )
    )
