"""ESet / query expansion: suggest terms from a relevance set.

Spark restatement of the reference expand layer (xapian-core/expand/):
given an RSet (doc ids judged relevant), score every term appearing in
those docs and return the top-N as expansion candidates
(esetinternal.cc Xapian::Internal::expand).

Per-term statistics (expand/expandweight.h:82-100 ExpandStats
::accumulate, with wdf==0 treated as 1):
    rtermfreq   = # RSet docs containing the term
    rcoll_freq  = Σ wdf over RSet docs
    multiplier  = Σ (k+1)·wdf / (k·doclen/avlen + wdf)
    termfreq/dbsize = global tf / N

Weights:
- Trad (expand/tradeweight.cc, default scheme, expand_k=1):
      reldocs_without = rsize - rtermfreq
      tw = log( (rtermfreq+0.5)·(N - tf - reldocs_without + 0.5)
              / ((tf - rtermfreq+0.5)·(reldocs_without+0.5)) )
      weight = multiplier · tw
- Bo1 (expand/bo1eweight.cc, no expand_k):
      mean = cf / N
      weight = rcoll_freq·log2((1+mean)/mean) + log2(1+mean)

One small aggregation over the RSet's postings (RSet is tiny, the
filter `doc_id IN (...)` prunes the scan) + a broadcast-sized join with
the term dictionary — no large shuffle.
"""

from __future__ import annotations

from typing import Iterable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xapian_spark.index.build import InvertedIndex


def get_eset(
    index: InvertedIndex,
    rset_doc_ids: Iterable[int],
    maxitems: int = 10,
    scheme: str = "trad",
    expand_k: float = 1.0,
    exclude_terms: Optional[List[str]] = None,
    min_wt: float = 0.0,
    decider=None,
) -> DataFrame:
    """(term, wt) — top-`maxitems` expansion terms, wt desc / term asc.

    `exclude_terms` mirrors the default behavior of not suggesting the
    query's own terms (Enquire::get_eset without
    INCLUDE_QUERY_TERMS). `decider` is the ExpandDecider hook
    (include/xapian/expanddecider.h): a callable receiving the term
    Column and returning a boolean Column — JVM-side, so the predicate
    rides the same scan (e.g. `lambda t: ~t.startswith("Z")` is the
    ExpandDeciderFilterPrefix complement)."""
    rset = [int(d) for d in rset_doc_ids]
    if not rset:
        return index.postings.sparkSession.createDataFrame(
            [], "term string, wt double")
    rsize = len(rset)
    n = index.stats.doccount
    avlen = index.stats.average_length

    wdf = F.greatest(F.col("wdf"), F.lit(1)).cast("double")
    acc = (
        index.postings
        .filter(F.col("doc_id").isin(rset))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("double").alias("rtermfreq"),
            F.sum(wdf).alias("rcoll_freq"),
            F.sum(
                (F.lit(expand_k + 1.0) * wdf)
                / (F.lit(expand_k) * F.col("doclen").cast("double")
                   / F.lit(avlen) + wdf)
            ).alias("multiplier"),
        )
    )
    ts = index.term_stats.select(
        "term", F.col("tf").cast("double").alias("tf"),
        F.col("cf").cast("double").alias("cf"))
    # broadcast the SMALL side: acc is bounded by distinct terms in the
    # RSet's few docs; ts is the whole dictionary (unbounded at web
    # scale — broadcasting it would OOM regardless of RSet size)
    j = F.broadcast(acc).join(ts, "term") if rsize < 10000 \
        else acc.join(ts, "term")

    if scheme == "bo1":
        mean = F.col("cf") / F.lit(float(n))
        wt = (F.col("rcoll_freq")
              * F.log2((F.lit(1.0) + mean) / mean)
              + F.log2(F.lit(1.0) + mean))
    elif scheme == "trad":
        without = F.lit(float(rsize)) - F.col("rtermfreq")
        num = ((F.col("rtermfreq") + 0.5)
               * (F.lit(float(n)) - F.col("tf") - without + 0.5))
        denom = ((F.col("tf") - F.col("rtermfreq") + 0.5)
                 * (without + 0.5))
        wt = F.col("multiplier") * F.log(num / denom)
    else:
        raise ValueError(f"unknown expansion scheme: {scheme!r}")

    out = j.select("term", wt.alias("wt")).filter(F.col("wt") > min_wt)
    if exclude_terms:
        out = out.filter(~F.col("term").isin(list(exclude_terms)))
    if decider is not None:
        out = out.filter(decider(F.col("term")))
    return out.orderBy(F.desc("wt"), F.asc("term")).limit(maxitems)
