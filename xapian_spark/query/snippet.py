"""Search-result snippets (KWIC highlighting).

Later Xapian releases grew MSet::snippet() (this reference snapshot
predates it); a search engine's result page needs one regardless, so
the operator is defined here with deliberately exact, engine-replayable
semantics instead of the reference's stemmer-aware heuristics:

- the document is split into LINES (\\r?\\n — the engine-portable split
  the pipeline ops standardized on),
- a line's score is its count of words matching any query term, where
  a word matches iff lowercasing it and stripping leading/trailing
  non-alphanumerics equals the term,
- the snippet is the best line (most hits, earliest wins ties) with
  every matching word wrapped in the highlight markers and words
  rejoined with single spaces (whitespace-normalizing by contract),
- documents with zero hits produce no row (they have no snippet).

Everything is built-in-expression Catalyst (split/transform/filter/
array_min over (neg_hits, idx) structs) — one narrow projection, no
shuffle, no UDF; the DuckDB oracle replays it with the same regexes.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STRIP = "^[^a-z0-9]+|[^a-z0-9]+$"


def _norm(w: Column) -> Column:
    return F.regexp_replace(F.lower(w), _STRIP, "")


def generate_snippets(docs: DataFrame, terms: Sequence[str],
                      pre: str = "<b>", post: str = "</b>",
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_hits, snippet) for every document with ≥ 1 hit."""
    if not terms:
        raise ValueError("generate_snippets needs at least one term")
    tset = F.array(*[F.lit(t.lower()) for t in terms])

    def hits(line: Column) -> Column:
        return F.size(F.filter(
            F.split(line, " "),
            lambda w: F.array_contains(tset, _norm(w))))

    lines = F.split(F.col(text_col), r"\r?\n")
    scored = F.transform(
        lines,
        lambda ln, i: F.struct((-hits(ln)).alias("neg"),
                               i.alias("idx"), ln.alias("line")))
    best = F.array_min(scored)
    highlighted = F.array_join(
        F.transform(
            F.split(best["line"], " "),
            lambda w: F.when(F.array_contains(tset, _norm(w)),
                             F.concat(F.lit(pre), w, F.lit(post)))
            .otherwise(w)),
        " ")
    return (docs.select(
        F.col(id_col).alias("doc_id"),
        (-best["neg"]).cast("int").alias("n_hits"),
        highlighted.alias("snippet"))
        .filter(F.col("n_hits") > 0))
