"""Named PostingSource convenience classes.

Spark restatement of the reference's concrete PostingSource family
(include/xapian/postingsource.h:405-600, api/postingsource.cc:200-560,
api/decvalwtsource.cc): each is a thin factory over the generic
DataFrame-of-(doc_id, score) leaf (ops.PostingSourceQuery) with the
reference's exact weight semantics. A "value slot" in the Spark model
is a typed column of the docs/data table — the reference's
sortable_serialise round-trip through a string slot collapses to using
the numeric column directly (index/sortable.py proves the byte codec
when on-disk parity is needed).

Matcher-visible contracts reproduced:
- ValueWeightPostingSource: docs that HAVE a value in the slot; weight
  = the value (postingsource.cc:230-234). Negative stored values are
  undefined behavior in the reference (postingsource.h:447) — passed
  through unchanged here too.
- ValueMapPostingSource: docs with a value in the slot; weight =
  weight_map.get(value, default_weight), default 0.0
  (postingsource.cc:329-336). The map is a parse-time literal
  (F.create_map), so no join or shuffle is added to the plan.
- FixedWeightPostingSource: EVERY document, constant weight
  (postingsource.cc:420-440) — the "boost everything" leaf used with
  OP_AND_MAYBE.
- DecreasingValueWeightPostingSource: identical RESULTS to
  ValueWeightPostingSource; the docid-decreasing guarantee over
  [range_start, range_end] exists purely to let the matcher stop early
  (decvalwtsource.cc:90-140). The Spark analog of that early stop is
  `prune_k`: with the guarantee, the top-k candidates inside the range
  are exactly the first k by docid, so the leaf prunes to
  (first k in-range by doc_id) ∪ (everything outside the range) — a
  limit the optimizer pushes to the scan, instead of a full-slot read.
"""

from __future__ import annotations

from typing import Mapping, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.query.ops import PostingSourceQuery


def _ids(docs: DataFrame, id_col: str):
    return F.col(id_col).cast("long").alias("doc_id")


def value_weight_posting_source(
        docs: DataFrame, column: str,
        id_col: str = "doc_id") -> PostingSourceQuery:
    """Xapian::ValueWeightPostingSource(slot): weight = the slot value,
    for every doc where the slot is set (non-null column)."""
    src = (docs.filter(F.col(column).isNotNull())
           .select(_ids(docs, id_col),
                   F.col(column).cast("double").alias("score")))
    return PostingSourceQuery(src, name=f"value_weight({column})")


def value_map_posting_source(
        docs: DataFrame, column: str,
        weight_map: Mapping[str, float],
        default_weight: float = 0.0,
        id_col: str = "doc_id") -> PostingSourceQuery:
    """Xapian::ValueMapPostingSource(slot) + add_mapping/
    set_default_weight: weight = weight_map[value] or default_weight,
    over every doc where the slot is set."""
    if weight_map:
        kv = []
        for k, v in weight_map.items():
            kv.append(F.lit(k))
            kv.append(F.lit(float(v)))
        score = F.coalesce(
            F.element_at(F.create_map(*kv),
                         F.col(column).cast("string")),
            F.lit(float(default_weight)))
    else:
        score = F.lit(float(default_weight))
    src = (docs.filter(F.col(column).isNotNull())
           .select(_ids(docs, id_col), score.alias("score")))
    return PostingSourceQuery(src, name=f"value_map({column})")


def fixed_weight_posting_source(
        docs: DataFrame, wt: float,
        id_col: str = "doc_id") -> PostingSourceQuery:
    """Xapian::FixedWeightPostingSource(wt): every document, constant
    weight (the maxweight IS the weight, postingsource.cc:420-427)."""
    src = docs.select(_ids(docs, id_col),
                      F.lit(float(wt)).alias("score"))
    return PostingSourceQuery(src, name=f"fixed_weight({wt})")


def decreasing_value_weight_posting_source(
        docs: DataFrame, column: str,
        range_start: int = 0, range_end: int = 0,
        id_col: str = "doc_id",
        prune_k: Optional[int] = None) -> PostingSourceQuery:
    """Xapian::DecreasingValueWeightPostingSource(slot, range_start,
    range_end): results identical to ValueWeightPostingSource — the
    caller PROMISES the slot value is non-increasing with docid inside
    [range_start, range_end] (range_end=0 → to the end of the corpus),
    which licenses early termination.

    `prune_k` opts into the Spark analog of that early stop for a
    standalone top-k use: the in-range candidates collapse to the
    first `prune_k` docids (an orderBy+limit the optimizer runs as a
    TakeOrdered, never a full sort), unioned with all out-of-range
    docs (whose weights are unconstrained, decvalwtsource.cc
    items_at_end). Leave it None when composing under other operators
    that need the full posting list."""
    base = (docs.filter(F.col(column).isNotNull())
            .select(_ids(docs, id_col),
                    F.col(column).cast("double").alias("score")))
    if prune_k is not None:
        in_range = F.col("doc_id") >= F.lit(int(range_start))
        if range_end:
            in_range = in_range & (F.col("doc_id")
                                   <= F.lit(int(range_end)))
        pruned = (base.filter(in_range)
                  .orderBy(F.asc("doc_id")).limit(int(prune_k)))
        base = pruned.unionByName(base.filter(~in_range))
    return PostingSourceQuery(
        base, name=f"decreasing_value_weight({column})")
