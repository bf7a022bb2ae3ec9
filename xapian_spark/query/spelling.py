"""Spelling suggestion: fragment index + edit distance.

Spark restatement of the reference spelling table
(xapian-core/backends/brass/brass_spelling.cc:157-246 toggle_word) —
the exact fragment scheme is reproduced:
    'H' + first two chars          (head)
    'T' + last two chars           (tail)
    'B' + first + last char        (bookends, only words of length <= 4)
    'M' + each distinct 3-gram     (middles, words of length > 2)
Words of length <= 1 are not indexed.

Suggestion (api/editdistance.cc + spelling wordlist walk): candidates
are words sharing >= 1 fragment with the query word; keep those within
max_edit_distance (built-in levenshtein — JVM-side), prefer smaller
distance, then higher word frequency, then lexicographic — matching
Database::get_spelling_suggestion's "better candidate" rule.

The fragment join is a candidate filter exactly like the reference's
B-tree prefix walk: only words sharing a fragment are ever compared, so
the levenshtein never runs over the whole dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_fragments(word_col) -> "F.Column":
    """ARRAY<STRING> of brass_spelling fragments for a word column."""
    w = word_col
    ln = F.length(w)
    head = F.concat(F.lit("H"), F.substring(w, 1, 2))
    tail = F.concat(F.lit("T"), F.substring(w, -2, 2))
    book = F.concat(F.lit("B"), F.substring(w, 1, 1),
                    F.substring(w, -1, 1))
    # middles: distinct 3-grams (dynamic start → Column.substr)
    idx = F.sequence(F.lit(1), F.greatest(ln - 2, F.lit(1)))
    mids = F.array_distinct(
        F.transform(idx, lambda i: F.concat(
            F.lit("M"), w.substr(i, F.lit(3)))))
    return F.when(ln <= 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.concat(
                F.array(head, tail),
                F.when(ln <= 4, F.array(book))
                .otherwise(F.array().cast("array<string>")),
                F.when(ln > 2, mids)
                .otherwise(F.array().cast("array<string>")),
            )
        )
    )


def build_spelling_table(words: DataFrame, word_col: str = "word",
                         freq_col: str = "freq") -> DataFrame:
    """(fragment, word, freq) exploded fragment index.

    `words` is typically the term dictionary:
    term_stats.select(col("term").alias("word"), col("tf").alias("freq"))
    (the reference feeds TermGenerator FLAG_SPELLING words the same
    way)."""
    base = words.select(
        F.col(word_col).alias("word"),
        F.col(freq_col).cast("long").alias("freq"),
    )
    # separate select: fragments referencing an alias created in the
    # same select trips Spark's lateral-column-alias handling inside
    # the transform() lambda
    return base.select(
        F.explode(word_fragments(F.col("word"))).alias("fragment"),
        "word", "freq",
    )


def word_fragments_py(word: str) -> list:
    """Pure-Python twin of word_fragments for the QUERY word — the
    query side must not pay a Spark job per suggested word (the old
    1-row createDataFrame + collect did exactly that)."""
    if len(word) <= 1:
        return []
    frags = ["H" + word[:2], "T" + word[-2:]]
    if len(word) <= 4:
        frags.append("B" + word[0] + word[-1])
    if len(word) > 2:
        frags += ["M" + word[i:i + 3] for i in range(len(word) - 2)]
    return list(dict.fromkeys(frags))


def suggest(spelling: DataFrame, word: str,
            max_edit_distance: int = 2) -> DataFrame:
    """(word, freq, distance) candidates ordered by the reference's
    better-candidate rule: distance asc, freq desc, word asc."""
    spark = spelling.sparkSession
    frags = word_fragments_py(word)
    if not frags:
        return spark.createDataFrame(
            [], "word string, freq long, distance int")
    return (
        spelling.filter(F.col("fragment").isin(frags))
        .select("word", "freq").distinct()
        .filter(F.col("word") != word)
        .withColumn("distance",
                    F.levenshtein(F.col("word"), F.lit(word)))
        .filter(F.col("distance") <= max_edit_distance)
        .orderBy(F.asc("distance"), F.desc("freq"), F.asc("word"))
    )


def spelling_suggestion(spelling: DataFrame, word: str,
                        max_edit_distance: int = 2):
    """The single best suggestion (or None) —
    Database::get_spelling_suggestion (api/omdatabase.cc:557-669),
    including the exact-word rule at its end (:667-668): if the word
    itself is in the dictionary with a HIGHER frequency than the best
    candidate, no suggestion is made (a common correctly-spelled word
    must not be 'corrected' to a rarer neighbor).

    ONE Spark job: the best candidate (min over a sortable
    (distance, -freq, word) struct) and the exact word's own frequency
    come out of a single aggregation over the fragment-matched
    candidates — corrected_query_string calls this per query word, so
    a second lookup job per word would double the hot-path latency."""
    frags = word_fragments_py(word)
    if not frags:
        return None
    cand = (
        spelling.filter(F.col("fragment").isin(frags))
        .select("word", "freq").distinct()
        .withColumn("distance",
                    F.levenshtein(F.col("word"), F.lit(word)))
        .filter(F.col("distance") <= max_edit_distance)
    )
    row = cand.agg(
        F.min(F.when(F.col("distance") > 0, F.struct(
            F.col("distance"),
            (-F.col("freq")).alias("negfreq"),
            F.col("word"),
            F.col("freq")))).alias("best"),
        F.max(F.when(F.col("word") == word, F.col("freq")))
        .alias("freq_exact"),
    ).head()
    best = row["best"]
    if best is None:
        return None
    freq_exact = row["freq_exact"] or 0
    return best["word"] if best["freq"] >= freq_exact else None
