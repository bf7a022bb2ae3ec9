"""Xapian BM25 weighting, exact formula.

Mirrors the reference implementation (xapian-core/weight/bm25weight.cc):

- termweight (init, :45-110):
      tw = (N - tf + 0.5) / (tf + 0.5)          # no relevance set
      if tw < 2: tw = tw * 0.5 + 1              # the "halving rule"
      termweight = log(tw) * factor
      if k3 != 0: termweight *= (k3 + 1) * wqf / (k3 + wqf)
- len_factor = 1 / average_doclen, or 0 when doc length can't matter
  (:116-125)
- per-posting part (get_sumpart, :162-172):
      normlen = max(doclen * len_factor, min_normlen)
      part = termweight * (k1 + 1) * wdf / (k1*(normlen*b + (1-b)) + wdf)
- upper bound (get_maxpart, :174-191) uses the doclen lower bound and the
  per-term wdf upper bound — the WAND pruning contract.

Defaults k1=1, k2=0, k3=1, b=0.5, min_normlen=0.5
(include/xapian/weight.h:525-528).

Driver-side scalar math is float64; the distributed per-posting part is a
Spark Column expression (pure JVM, whole-stage codegen — no Python UDF in
the scoring hot path).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BM25Weight:
    k1: float = 1.0
    k2: float = 0.0
    k3: float = 1.0
    b: float = 0.5
    min_normlen: float = 0.5

    def len_factor(self, average_length: float) -> float:
        if self.k2 == 0 and (self.b == 0 or self.k1 == 0):
            return 0.0
        return 1.0 / average_length if average_length != 0 else 0.0

    def termweight(
        self, termfreq: int, collection_size: int, wqf: int = 1,
        factor: float = 1.0,
    ) -> float:
        """The per-term document-independent weight (bm25weight.cc init)."""
        tw = (collection_size - termfreq + 0.5) / (termfreq + 0.5)
        if tw < 2.0:
            tw = tw * 0.5 + 1.0
        tw = math.log(tw) * factor
        if self.k3 != 0:
            tw *= (self.k3 + 1.0) * wqf / (self.k3 + wqf)
        return tw

    def termweight_col(
        self, termfreq: Column, collection_size: int, wqf: int = 1,
        factor: float = 1.0,
    ) -> Column:
        """Column twin of termweight(), for the one case where the
        termfreq is itself computed inside the plan (the synonym
        node's exact unioned docfreq) — keeps query compilation free
        of driver-side count() jobs."""
        tf = termfreq.cast("double")
        tw = ((F.lit(float(collection_size)) - tf + F.lit(0.5))
              / (tf + F.lit(0.5)))
        tw = F.when(tw < 2.0, tw * F.lit(0.5) + F.lit(1.0)).otherwise(tw)
        tw = F.log(tw) * F.lit(factor)
        if self.k3 != 0:
            tw = tw * F.lit((self.k3 + 1.0) * wqf / (self.k3 + wqf))
        return tw

    def sumpart_col(
        self, termweight: Column, wdf: Column, doclen: Column,
        len_factor: float,
    ) -> Column:
        """get_sumpart as a Spark Column (vectorized JVM-side)."""
        wdf_d = wdf.cast("double")
        normlen = F.greatest(
            doclen.cast("double") * F.lit(len_factor),
            F.lit(self.min_normlen),
        )
        denom = (
            F.lit(self.k1) * (normlen * F.lit(self.b) + F.lit(1.0 - self.b))
            + wdf_d
        )
        return termweight * F.lit(self.k1 + 1.0) * wdf_d / denom

    def sumpart(
        self, termweight: float, wdf: int, doclen: float, len_factor: float
    ) -> float:
        """Scalar twin of sumpart_col (tests / WAND kernel)."""
        normlen = max(doclen * len_factor, self.min_normlen)
        denom = self.k1 * (normlen * self.b + (1.0 - self.b)) + wdf
        return termweight * (self.k1 + 1.0) * wdf / denom

    def maxpart(
        self, termweight: float, wdf_upper: int, doclen_lower: float,
        len_factor: float,
    ) -> float:
        """get_maxpart — never underestimates any sumpart of the term."""
        denom = float(wdf_upper)
        if self.k1 != 0.0:
            if self.b != 0.0:
                normlen_lb = max(doclen_lower * len_factor, self.min_normlen)
                denom += self.k1 * (normlen_lb * self.b + (1.0 - self.b))
            else:
                denom += self.k1
        return termweight * (self.k1 + 1.0) * wdf_upper / denom

    def maxextra(self) -> float:
        return self.k2

    def sumextra_col(self, doclen: Column, len_factor: float,
                     query_length: int) -> Column:
        """get_sumextra (bm25weight.cc:203-208): the k2 per-document
        extra weight, added once per matching doc
        (ExtraWeightPostList, matcher/localsubmatch.cc:92-96)."""
        num = 2.0 * self.k2 * query_length
        normlen = F.greatest(
            doclen.cast("double") * F.lit(len_factor),
            F.lit(self.min_normlen))
        return F.lit(num) / (F.lit(1.0) + normlen)


@dataclass(frozen=True)
class TfIdfWeight:
    """TF-IDF with Xapian's normalization string (weight/tfidfweight.cc):
    wdf norm ∈ {n,b,s,l}, idf norm ∈ {n,t,p}, wt norm = n.
    Not separable as termweight×sumpart — implements make_sumpart."""

    normalizations: str = "ntn"

    def __post_init__(self):
        n = self.normalizations
        if (len(n) != 3 or n[0] not in "nbsl" or n[1] not in "ntp"
                or n[2] != "n"):
            raise ValueError(f"invalid normalization string: {n!r}")

    def _idfn(self, tf: int, N: int) -> float:
        c = self.normalizations[1]
        if c == "n":
            return 1.0
        if c == "p":
            if N == tf:
                return 0.0
            return math.log((N - tf) / tf)
        return math.log(N / tf)

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     **_bounds):
        idf = self._idfn(tf, N)
        w = self.normalizations[0]

        def fn(wdf: Column, doclen: Column) -> Column:
            d = wdf.cast("double")
            if w == "b":
                wdfn = F.when(wdf == 0, 0.0).otherwise(1.0)
            elif w == "s":
                wdfn = d * d
            elif w == "l":
                wdfn = F.when(wdf == 0, 0.0).otherwise(
                    F.lit(1.0) + F.log(d))
            else:
                wdfn = d
            return wdfn * F.lit(idf) * F.lit(factor)

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class InL2Weight:
    """DFR InL2 (weight/inl2weight.cc): wdfn = wdf·log2(1 + c·avlen/len);
    weight = wqf · wdfn · 1/(wdfn+1) · log2((N+1)/(tf+0.5))."""

    c: float = 1.0

    def __post_init__(self):
        if self.c <= 0:
            raise ValueError("Parameter c is invalid.")

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     **_bounds):
        idf = math.log2((N + 1) / (tf + 0.5))
        cl = self.c * avlen

        def fn(wdf: Column, doclen: Column) -> Column:
            d = wdf.cast("double")
            wdfn = d * F.log2(F.lit(1.0)
                              + F.lit(cl) / doclen.cast("double"))
            big_l = F.lit(1.0) / (wdfn + F.lit(1.0))
            return F.when(wdf == 0, 0.0).otherwise(
                F.lit(float(wqf)) * wdfn * big_l * F.lit(idf)
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class PL2Weight:
    """DFR PL2 (weight/pl2weight.cc): Poisson model with Laplace
    after-effect and length norm 2; per-term lower_bound subtraction
    exactly as the reference (init :56-90, get_sumpart :115-125)."""

    c: float = 1.0

    def __post_init__(self):
        if self.c <= 0:
            raise ValueError("Parameter c is invalid.")

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     wdf_upper=0, doclen_lower=1, doclen_upper=1):
        cl = self.c * avlen
        base_change = 1.0 / math.log(2.0)
        mean = cf / N
        p1 = mean * base_change + 0.5 * math.log2(2.0 * math.pi)
        p2 = math.log2(mean) + base_change
        lower_bound = 0.0
        if wdf_upper:
            wdfn_lower = math.log2(1 + cl / doclen_upper)
            wdfn_upper = wdf_upper * math.log2(1 + cl / doclen_lower)
            p_min = (p1 + (wdfn_lower + 0.5) * math.log2(wdfn_lower)
                     - p2 * wdfn_lower)
            lower_bound = wqf * p_min / (wdfn_upper + 1.0)

        def fn(wdf: Column, doclen: Column) -> Column:
            d = wdf.cast("double")
            wdfn = d * F.log2(F.lit(1.0)
                              + F.lit(cl) / doclen.cast("double"))
            p = (F.lit(p1) + (wdfn + F.lit(0.5)) * F.log2(wdfn)
                 - F.lit(p2) * wdfn)
            return F.when(wdf == 0, 0.0).otherwise(
                (F.lit(float(wqf)) * p / (wdfn + F.lit(1.0))
                 - F.lit(lower_bound)) * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


def _wdfn_col(wdf: Column, doclen: Column, cl: float) -> Column:
    """DFR normalization 2: wdf · log2(1 + c·avlen/len)."""
    return wdf.cast("double") * F.log2(
        F.lit(1.0) + F.lit(cl) / doclen.cast("double"))


@dataclass(frozen=True)
class IfB2Weight:
    """DFR IfB2 (weight/ifb2weight.cc:109-123): inverse term frequency
    with Bernoulli after-effect and normalization 2."""

    c: float = 1.0

    def __post_init__(self):
        if self.c <= 0:
            raise ValueError("Parameter c is invalid.")

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     **_bounds):
        idf = math.log2((N + 1.0) / (cf + 0.5))
        cl = self.c * avlen

        def fn(wdf: Column, doclen: Column) -> Column:
            wdfn = _wdfn_col(wdf, doclen, cl)
            b = F.lit(cf + 1.0) / (F.lit(float(tf))
                                   * (wdfn + F.lit(1.0)))
            return F.when(wdf == 0, 0.0).otherwise(
                wdfn * F.lit(float(wqf)) * b * F.lit(idf)
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class IneB2Weight:
    """DFR IneB2 (weight/ineb2weight.cc:111-128): inverse expected
    document frequency with Bernoulli after-effect, normalization 2."""

    c: float = 1.0

    def __post_init__(self):
        if self.c <= 0:
            raise ValueError("Parameter c is invalid.")

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     **_bounds):
        mean = cf / N
        expected = N * (1.0 - math.exp(-mean))
        idf = math.log2((N + 1.0) / (expected + 0.5))
        cl = self.c * avlen

        def fn(wdf: Column, doclen: Column) -> Column:
            wdfn = _wdfn_col(wdf, doclen, cl)
            b = F.lit(cf + 1.0) / (F.lit(float(tf))
                                   * (wdfn + F.lit(1.0)))
            return F.when(wdf == 0, 0.0).otherwise(
                wdfn * F.lit(idf) * F.lit(float(wqf)) * b
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class BB2Weight:
    """DFR BB2 (weight/bb2weight.cc:122-143): Bose-Einstein model with
    Bernoulli after-effect, normalization 2; stirling approximation
    exactly as :34-38."""

    c: float = 1.0

    def __post_init__(self):
        if self.c <= 0:
            raise ValueError("Parameter c is invalid.")

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     **_bounds):
        cl = self.c * avlen
        base_change = math.log(2.0)
        wt = -math.log2(N - 1.0) - (1.0 / base_change)

        def stirling(x, y: Column) -> Column:
            return ((y + F.lit(0.5)) * F.log2(F.lit(float(x)) / y)
                    + (F.lit(float(x)) - y) * F.lit(math.log2(x)))

        def fn(wdf: Column, doclen: Column) -> Column:
            wdfn = _wdfn_col(wdf, doclen, cl)
            b = F.lit(cf + 1.0) / (F.lit(float(tf))
                                   * (wdfn + F.lit(1.0)))
            st = (stirling(N + cf - 1.0,
                           F.lit(N + cf - 2.0) - wdfn)
                  - stirling(cf, F.lit(float(cf)) - wdfn))
            return F.when(wdf == 0, 0.0).otherwise(
                F.lit(float(wqf)) * (b * (F.lit(wt) + st))
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class DLHWeight:
    """DFR DLH hypergeometric model (weight/dlhweight.cc:94-109), with
    the reference's lower-bound subtraction (init)."""

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     wdf_upper=0, doclen_lower=1, doclen_upper=1):
        nf = N / cf
        wdf_lower = 1.0
        min_weight = (
            wdf_lower * math.log2((wdf_lower * avlen / doclen_upper)
                                  * nf)
            - 1.5 * math.log2(doclen_upper)
            + 0.5 * math.log2(2.0 * math.pi * wdf_lower)
        ) / (wdf_upper + 0.5) if wdf_upper else 0.0
        lower_bound = wqf * min_weight

        def fn(wdf: Column, doclen: Column) -> Column:
            d = wdf.cast("double")
            ln = doclen.cast("double")
            r = d / ln
            wt = (d * F.log2((d * F.lit(avlen) / ln) * F.lit(nf))
                  + (ln - d) * F.log2(F.lit(1.0) - r)
                  + F.lit(0.5) * F.log2(
                      F.lit(2.0 * math.pi) * d * (F.lit(1.0) - r))
                  ) / (d + F.lit(0.5))
            return F.when(wdf == 0, 0.0).otherwise(
                (F.lit(float(wqf)) * wt - F.lit(lower_bound))
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class DPHWeight:
    """DFR DPH hypergeometric model, Popper normalization
    (weight/dphweight.cc:97-115), with the reference's lower-bound
    subtraction (init)."""

    def make_sumpart(self, tf, cf, N, avlen, wqf=1, factor=1.0,
                     wdf_upper=0, doclen_lower=1, doclen_upper=1):
        nf = N / cf
        wdf_lower = 1.0
        min_norm = ((1.0 / doclen_upper) ** 2) / (wdf_upper + 1.0) \
            if wdf_upper else 0.0
        min_weight = min_norm * (
            wdf_lower * math.log2((wdf_lower * avlen / doclen_upper)
                                  * nf)
            + 0.5 * math.log2(2.0 * math.pi * wdf_lower / doclen_upper))
        lower_bound = wqf * min_weight

        def fn(wdf: Column, doclen: Column) -> Column:
            d = wdf.cast("double")
            ln = doclen.cast("double")
            r = d / ln
            norm = F.pow(F.lit(1.0) - r, F.lit(2.0)) / (d + F.lit(1.0))
            wt = norm * (
                d * F.log2((d * F.lit(avlen) / ln) * F.lit(nf))
                + F.lit(0.5) * F.log2(
                    F.lit(2.0 * math.pi) * d * (F.lit(1.0) - r)))
            return F.when(wdf == 0, 0.0).otherwise(
                (F.lit(float(wqf)) * wt - F.lit(lower_bound))
                * F.lit(factor))

        return fn

    def maxextra(self) -> float:
        return 0.0


@dataclass(frozen=True)
class BoolWeight:
    """All-zero weights (xapian-core/weight/boolweight.cc) — pure boolean
    retrieval; results order by docid via the standard tiebreak."""

    def len_factor(self, average_length: float) -> float:
        return 0.0

    def termweight(self, termfreq, collection_size, wqf=1, factor=1.0):
        return 0.0

    def termweight_col(self, termfreq, collection_size, wqf=1,
                       factor=1.0) -> Column:
        return F.lit(0.0)

    def sumpart_col(self, termweight, wdf, doclen, len_factor) -> Column:
        return F.lit(0.0)

    def sumpart(self, termweight, wdf, doclen, len_factor) -> float:
        return 0.0

    def maxpart(self, termweight, wdf_upper, doclen_lower,
                len_factor) -> float:
        return 0.0


@dataclass(frozen=True)
class TradWeight:
    """Traditional probabilistic weighting (weight/tradweight.cc):
    BM25(k1=k, k2=0, k3=0, b=1, min_normlen=0) is the exact equivalence
    the reference documents (weight.h: 'TradWeight(k) is equivalent to
    BM25Weight(k, 0, 0, 1, 0)')."""

    k: float = 1.0

    def _bm25(self) -> BM25Weight:
        return BM25Weight(self.k, 0.0, 0.0, 1.0, 0.0)

    def len_factor(self, average_length: float) -> float:
        return self._bm25().len_factor(average_length)

    def termweight(self, termfreq, collection_size, wqf=1, factor=1.0):
        return self._bm25().termweight(termfreq, collection_size, wqf,
                                       factor)

    def termweight_col(self, termfreq, collection_size, wqf=1,
                       factor=1.0) -> Column:
        return self._bm25().termweight_col(termfreq, collection_size,
                                           wqf, factor)

    def sumpart_col(self, termweight, wdf, doclen, len_factor) -> Column:
        return self._bm25().sumpart_col(termweight, wdf, doclen, len_factor)

    def sumpart(self, termweight, wdf, doclen, len_factor) -> float:
        return self._bm25().sumpart(termweight, wdf, doclen, len_factor)

    def maxpart(self, termweight, wdf_upper, doclen_lower, len_factor):
        return self._bm25().maxpart(termweight, wdf_upper, doclen_lower,
                                    len_factor)
