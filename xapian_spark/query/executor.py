"""Query execution: Query tree → DataFrame plan → top-k MSet.

Spark restatement of the reference match
(xapian-core/matcher/multimatch.cc:376-1179 get_mset):

- stats gathering (prepare_sub_matches, :205-240) = one tiny aggregation
  over term_stats for the query's leaf terms, collected to the driver;
  termweights are computed driver-side in float64 exactly like
  BM25Weight::init.
- the PostList tree = a composition of DataFrame operators (§2.2 SURVEY):
  AND → count-of-matching-children == n over one shared postings scan
  (or inner joins for heterogeneous children), OR → groupBy-sum,
  AND_NOT → left_anti, AND_MAYBE → left join + coalesce, XOR → odd count,
  FILTER → semi join, SYNONYM → wdf-sum scored as one term,
  MAX → groupBy-max, PHRASE/NEAR → AND + positions post-filter (the same
  "positional filters deferred" shape as api/queryinternal.cc:293-355).
- the bounded-heap top-k (:782-843) = orderBy(score desc, doc_id asc)
  .limit(k), which Spark executes as TakeOrderedAndProject — a
  per-partition bounded heap + driver merge, i.e. the same algorithm
  distributed.
- tiebreak: weight desc then docid ASC (msetcmp.cc:46-55, default
  docid_order ASCENDING) — required for rank-identity.

The flat single-scan path: a query that is And/Or/Synonym/Max over plain
Terms is evaluated with ONE postings scan (term IN (...)) + one shuffle
(groupBy doc_id) — no joins. Deep trees fall back to compositional joins.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xapian_spark.index.build import InvertedIndex
from xapian_spark.query import ops
from xapian_spark.query.bm25 import BM25Weight


@dataclass
class _QueryStats:
    """Per-query collected statistics (Weight::Internal analog)."""

    termfreqs: Dict[str, Tuple[int, int]]  # term -> (tf, cf)
    collection_size: int
    average_length: float
    doclen_lbound: int
    wdf_ubound: int
    doclen_ubound: int = 0


class Enquire:
    """Xapian::Enquire analog: holds an index + weight, answers queries."""

    # cache the whole term dictionary driver-side when it's below this
    # many entries (per-query stats gathering then costs zero jobs);
    # above it, fall back to a per-query filtered collect — the same
    # tiny aggregation the reference does per query (multimatch.cc
    # prepare_sub_matches)
    TERM_DICT_CACHE_MAX = 2_000_000

    def __init__(self, index: InvertedIndex, weight: Optional[BM25Weight] = None):
        self.index = index
        self.weight = weight or BM25Weight()
        self._term_dict: Optional[Dict[str, Tuple[int, int]]] = None

    # ------------------------------------------------------------------

    def _full_term_dict(self) -> Optional[Dict[str, Tuple[int, int]]]:
        if self._term_dict is None:
            # ONE job: collect capped at CACHE_MAX+1 rows (the limit is
            # pushed into the scan, so an over-budget web-scale term
            # dictionary stops after CACHE_MAX+1 rows instead of being
            # counted in full and then collected in a second job)
            rows = self.index.term_stats.limit(
                self.TERM_DICT_CACHE_MAX + 1).collect()
            if len(rows) > self.TERM_DICT_CACHE_MAX:
                self._term_dict = {}
            else:
                self._term_dict = {
                    r["term"]: (r["tf"], r["cf"]) for r in rows
                }
        return self._term_dict if self._term_dict else None

    def _gather_stats(self, terms: List[str]) -> _QueryStats:
        st = self.index.stats
        tfs: Dict[str, Tuple[int, int]] = {}
        if terms:
            full = self._full_term_dict()
            if full is not None:
                tfs = {t: full[t] for t in set(terms) if t in full}
            else:
                rows = (
                    self.index.term_stats
                    .filter(F.col("term").isin(list(set(terms))))
                    .collect()
                )
                tfs = {r["term"]: (r["tf"], r["cf"]) for r in rows}
        return _QueryStats(
            termfreqs=tfs,
            collection_size=st.doccount,
            average_length=st.average_length,
            doclen_lbound=st.doclen_lbound,
            wdf_ubound=st.wdf_ubound,
            doclen_ubound=st.doclen_ubound,
        )

    def _termweight(self, term: str, wqf: int, stats: _QueryStats,
                    factor: float = 1.0) -> float:
        tf, _cf = stats.termfreqs.get(term, (0, 0))
        if tf == 0:
            return 0.0
        return self.weight.termweight(tf, stats.collection_size, wqf, factor)

    def _maxpart(self, term: str, stats: _QueryStats, wqf: int = 1,
                 factor: float = 1.0) -> float:
        """Per-term upper bound (bm25weight.cc get_maxpart); the per-term
        wdf bound is min(cf, global wdf ubound) as in
        brass_database.cc:796-798."""
        tf, cf = stats.termfreqs.get(term, (0, 0))
        if tf == 0:
            return 0.0
        tw = self.weight.termweight(tf, stats.collection_size, wqf, factor)
        wdf_ub = min(cf, stats.wdf_ubound) if cf else stats.wdf_ubound
        lf = self.weight.len_factor(stats.average_length)
        return self.weight.maxpart(tw, wdf_ub, stats.doclen_lbound, lf)

    # ------------------------------------------------------------------

    def _scored_postings(
        self, terms: List[Tuple[str, int, float]], stats: _QueryStats,
        keep: Tuple[str, ...] = (),
    ) -> DataFrame:
        """One scan of postings for the given (term, wqf, factor) leaves,
        with a per-row weight-part column. No shuffle."""
        df = self.index.postings.filter(
            F.col("term").isin([t for t, _w, _f in terms]))
        if hasattr(self.weight, "make_sumpart"):
            # generalized (non-separable) weights: per-term expression
            chain = None
            for t, wqf, factor in terms:
                tf, cf = stats.termfreqs.get(t, (0, 0))
                if tf == 0:
                    continue
                wdf_ub = min(cf, stats.wdf_ubound) if cf \
                    else stats.wdf_ubound
                fn = self.weight.make_sumpart(
                    tf, cf, stats.collection_size,
                    stats.average_length, wqf, factor,
                    wdf_upper=wdf_ub,
                    doclen_lower=max(stats.doclen_lbound, 1),
                    doclen_upper=max(stats.doclen_ubound, 1))
                val = fn(F.col("wdf"), F.col("doclen"))
                cond = F.col("term") == t
                chain = F.when(cond, val) if chain is None \
                    else chain.when(cond, val)
            score = chain.otherwise(F.lit(0.0)) if chain is not None \
                else F.lit(0.0)
        else:
            lf = self.weight.len_factor(stats.average_length)
            tws = {
                t: self._termweight(t, wqf, stats, factor)
                for t, wqf, factor in terms
            }
            mapping = F.create_map(
                *[x for t, w in tws.items()
                  for x in (F.lit(t), F.lit(w))])
            tw_col = mapping[F.col("term")]
            score = self.weight.sumpart_col(
                tw_col, F.col("wdf"), F.col("doclen"), lf)
        cols = [F.col("term"), F.col("doc_id"), score.alias("score")]
        cols += [F.col(c) for c in keep]
        return df.select(*cols)

    @staticmethod
    def _sum_scores() -> Column:
        # deterministic float summation: sort the collected parts before
        # folding (fixes the summation order across shuffles/runs)
        return F.aggregate(
            F.array_sort(F.collect_list("score")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # -- compile -----------------------------------------------------------

    def _is_flat(self, node: ops.Query) -> bool:
        flat_types = (ops.And, ops.Or, ops.Synonym, ops.Max)
        if not (isinstance(node, flat_types) and all(
                isinstance(c, ops.Term) for c in node.children)):
            return False
        if isinstance(node, ops.Synonym):
            return True  # synonym merges duplicates by definition
        # duplicate term leaves each contribute their own weight in the
        # reference ("beer beer" scores the term twice) — the one-scan
        # flat path would merge them, so route through _compile_nary
        return len({c.term for c in node.children}) == \
            len(node.children)

    def compile(self, node: ops.Query, stats: Optional[_QueryStats] = None,
                factor: float = 1.0) -> DataFrame:
        """node → DataFrame(doc_id LONG, score DOUBLE)."""
        if stats is None:
            stats = self._gather_stats(list(node.terms()))
        spark = self.index.postings.sparkSession

        if isinstance(node, ops.MatchNothing):
            return spark.createDataFrame([], "doc_id long, score double")

        if isinstance(node, ops.MatchAll):
            return self.index.doclens.select(
                "doc_id", F.lit(0.0).alias("score"))

        if isinstance(node, ops.Term):
            tf, _ = stats.termfreqs.get(node.term, (0, 0))
            if tf == 0:
                return spark.createDataFrame([], "doc_id long, score double")
            sp = self._scored_postings(
                [(node.term, node.wqf, factor)], stats)
            return sp.select("doc_id", "score")

        if isinstance(node, ops.ScaleWeight):
            return self.compile(node.child, stats, factor * node.factor)

        if isinstance(node, ops.Wildcard):
            # expand against the term dictionary, then score as one
            # synonym group (1.3 FLAG_WILDCARD → OP_SYNONYM). The
            # collect is always capped: a short prefix on a web-scale
            # dictionary must not pull unbounded terms to the driver.
            cap = node.max_expansion or ops.DEFAULT_MAX_WILDCARD_EXPANSION
            base = self.index.term_stats.filter(
                F.col("term").startswith(node.prefix))
            if node.limit == "most_frequent":
                # WILDCARD_LIMIT_MOST_FREQUENT (FLAG_PARTIAL default)
                ts = base.orderBy(F.desc("tf"), F.asc("term")).limit(cap)
                terms = sorted(
                    r["term"] for r in ts.select("term").collect())
            else:
                ts = base.orderBy("term").limit(cap + 1)
                terms = [r["term"] for r in ts.select("term").collect()]
                if len(terms) > cap:
                    if node.limit == "error":
                        raise ops.WildcardError(
                            f"Wildcard {node.prefix!r}* expands to more "
                            f"than {cap} terms")
                    terms = terms[:cap]  # WILDCARD_LIMIT_FIRST
            if not terms:
                return spark.createDataFrame(
                    [], "doc_id long, score double")
            sub = ops.Synonym([ops.Term(t) for t in terms])
            return self.compile(sub, self._gather_stats(terms), factor)

        if isinstance(node, ops.EliteSet):
            # keep the set_size children with the highest maxweight
            # (api/queryinternal.cc:164-174)
            ranked = sorted(
                enumerate(node.children),
                key=lambda ic: -self._max_weight(ic[1], stats),
            )
            kept = [c for _i, c in sorted(ranked[: node.set_size])]
            return self.compile(ops.Or(kept), stats, factor)

        if isinstance(node, (ops.And, ops.Or, ops.Xor, ops.Max,
                             ops.Synonym)) and not node.children:
            # emptyop semantics: an operator with no children matches
            # nothing (api_anydb.cc emptyop1)
            return spark.createDataFrame([], "doc_id long, score double")

        if self._is_flat(node):
            return self._compile_flat(node, stats, factor)

        if isinstance(node, (ops.And, ops.Or, ops.Xor, ops.Max,
                             ops.Synonym)):
            return self._compile_nary(node, stats, factor)

        if isinstance(node, ops.AndNot):
            left = self.compile(node.left, stats, factor)
            right = self._doc_set(node.right, stats)
            return left.join(right, "doc_id", "left_anti")

        if isinstance(node, ops.Filter):
            left = self.compile(node.left, stats, factor)
            right = self._doc_set(node.right, stats)
            return left.join(right, "doc_id", "left_semi")

        if isinstance(node, ops.AndMaybe):
            left = self.compile(node.left, stats, factor)
            right = self.compile(node.right, stats, factor)
            r = right.withColumnRenamed("score", "rscore")
            return (
                left.join(r, "doc_id", "left")
                .select(
                    "doc_id",
                    (F.col("score")
                     + F.coalesce(F.col("rscore"), F.lit(0.0))
                     ).alias("score"),
                )
            )

        if isinstance(node, (ops.Phrase, ops.Near)):
            return self._compile_positional(node, stats, factor)

        if isinstance(node, ops.ValueRange):
            return self._value_range_docs(node).select(
                "doc_id", F.lit(0.0).alias("score"))

        if isinstance(node, ops.PostingSourceQuery):
            return node.source.select(
                F.col("doc_id").cast("long"),
                (F.col("score") * F.lit(factor)).alias("score"))

        raise TypeError(f"cannot compile {type(node).__name__}")

    # -- helpers -----------------------------------------------------------

    def _max_weight(self, node: ops.Query, stats: _QueryStats) -> float:
        if isinstance(node, ops.Term):
            return self._maxpart(node.term, stats, node.wqf)
        return sum(self._maxpart(t, stats) for t in node.terms())

    def _doc_set(self, node: ops.Query, stats: _QueryStats) -> DataFrame:
        """Boolean (weightless) evaluation → distinct doc_id frame."""
        if isinstance(node, ops.Term):
            return (self.index.postings
                    .filter(F.col("term") == node.term)
                    .select("doc_id"))
        if isinstance(node, ops.ValueRange):
            return self._value_range_docs(node)
        return self.compile(node, stats, factor=0.0).select("doc_id")

    def _value_range_docs(self, node: ops.ValueRange) -> DataFrame:
        docs = self.index.docs
        if docs is None:
            raise ValueError("ValueRange requires index.docs")
        cond = F.lit(True)
        if node.lo is not None:
            cond = cond & (F.col(node.column) >= F.lit(node.lo))
        if node.hi is not None:
            cond = cond & (F.col(node.column) <= F.lit(node.hi))
        return docs.filter(cond).select(F.col("doc_id").cast("long"))

    def _compile_flat(self, node, stats: _QueryStats,
                      factor: float, keep_n: bool = False) -> DataFrame:
        """And/Or/Synonym/Max over plain Terms: ONE scan + ONE shuffle.
        `keep_n` carries the per-doc matched-term count out of the
        aggregation (the percent/cutoff paths need it — computing it
        here avoids a second shuffle over the same postings)."""
        terms = [(c.term, c.wqf, factor) for c in node.children]
        # drop absent terms (matcher prunes empty postlists)
        present = [t for t in terms if stats.termfreqs.get(t[0], (0, 0))[0]]
        spark = self.index.postings.sparkSession
        out_schema = "doc_id long, score double" + (
            ", _n long" if keep_n else "")
        empty = spark.createDataFrame([], out_schema)
        if isinstance(node, ops.And) and len(present) < len(terms):
            return empty  # AND with an empty child matches nothing
        if not present:
            return empty

        if isinstance(node, ops.Synonym):
            return self._compile_synonym(node, stats, factor)

        sp = self._scored_postings(present, stats)
        g = sp.groupBy("doc_id")
        if isinstance(node, ops.Max):
            if keep_n:
                return g.agg(F.max("score").alias("score"),
                             F.count_distinct("term").alias("_n"))
            return g.agg(F.max("score").alias("score"))
        n_distinct = len({t for t, _, _ in present})
        agg = g.agg(
            self._sum_scores().alias("score"),
            F.count_distinct(F.col("term")).cast("long").alias("_n"),
        )
        if isinstance(node, ops.And):
            agg = agg.filter(F.col("_n") == n_distinct)
        return agg.select("doc_id", "score", "_n") if keep_n \
            else agg.select("doc_id", "score")

    def _compile_synonym(self, node: ops.Synonym, stats: _QueryStats,
                         factor: float) -> DataFrame:
        """synonympostlist.cc:64-89 — wdf = Σ children wdf (clamped to
        doclen), one weight calc.  We use the exact unioned docfreq where
        the reference estimates it (exact counts are cheap in Spark).

        The unioned termfreq is computed INSIDE the plan (a 1-row
        aggregate broadcast back over the matches) rather than with a
        driver-side count(): compile stays lazy — no eager job and no
        executor-lifetime persist per synonym/wildcard node, and the
        whole query still runs as ONE Spark job at mset time."""
        terms = [c.term for c in node.children
                 if stats.termfreqs.get(c.term, (0, 0))[0] > 0]
        spark = self.index.postings.sparkSession
        if not terms:
            return spark.createDataFrame([], "doc_id long, score double")
        base = (
            self.index.postings
            .filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(
                F.sum("wdf").cast("int").alias("wdf_sum"),
                F.first("doclen").alias("doclen"),
            )
            .select(
                "doc_id",
                F.least(F.col("wdf_sum"), F.col("doclen").cast("int"))
                .alias("wdf"),
                "doclen",
            )
        )
        lf = self.weight.len_factor(stats.average_length)
        if hasattr(self.weight, "termweight_col"):
            tf_df = base.agg(
                F.count(F.lit(1)).cast("long").alias("_syn_tf"))
            tw_col = self.weight.termweight_col(
                F.col("_syn_tf"), stats.collection_size, 1, factor)
            score = self.weight.sumpart_col(
                tw_col, F.col("wdf"), F.col("doclen"), lf)
            return (base.crossJoin(F.broadcast(tf_df))
                    .select("doc_id", score.alias("score")))
        # custom weight without a Column termweight: one eager count
        # (not persisted — the recompute at action time costs the same
        # scan the old persist-backed count did, without the leak)
        tf = base.count()
        tw = self.weight.termweight(tf, stats.collection_size, 1, factor) \
            if tf else 0.0
        score = self.weight.sumpart_col(
            F.lit(tw), F.col("wdf"), F.col("doclen"), lf)
        return base.select("doc_id", score.alias("score"))

    def _compile_nary(self, node, stats: _QueryStats,
                      factor: float) -> DataFrame:
        """General n-ary composition over arbitrary child plans."""
        children = [self.compile(c, stats, factor) for c in node.children]
        tagged = [
            c.select("doc_id", "score", F.lit(i).alias("_child"))
            for i, c in enumerate(children)
        ]
        u = tagged[0]
        for t in tagged[1:]:
            u = u.unionByName(t)
        g = u.groupBy("doc_id")
        if isinstance(node, ops.Max):
            return g.agg(F.max("score").alias("score"))
        agg = g.agg(
            self._sum_scores().alias("score"),
            F.count_distinct("_child").alias("_n"),
        )
        if isinstance(node, ops.And):
            agg = agg.filter(F.col("_n") == len(children))
        elif isinstance(node, ops.Xor):
            agg = agg.filter(F.col("_n") % 2 == 1)
        return agg.select("doc_id", "score")

    def _compile_positional(self, node, stats: _QueryStats,
                            factor: float) -> DataFrame:
        """PHRASE/NEAR: AND over the terms first, positional check as a
        post-filter (the reference defers positional filters the same way,
        api/queryinternal.cc:293-355)."""
        # each element is a term, or a TUPLE of alternative terms (a
        # multi-prefix field in a positional context — the reference's
        # as_opwindow_query OR-per-prefix, queryparser.lemony:1605-1618)
        elems = [t if isinstance(t, tuple) else (t,)
                 for t in node.terms_]
        terms = [t for e in elems for t in e]
        n = len(elems)
        has_alts = any(len(e) > 1 for e in elems)
        # default windows use the reference convention (stored window =
        # n_terms + w - 1, w defaulting to 10 — queryparser.lemony:1656)
        window = node.window or (
            n if isinstance(node, ops.Phrase) else n + 9)
        ordered = isinstance(node, ops.Phrase)
        spark = self.index.postings.sparkSession
        if any(all(stats.termfreqs.get(t, (0, 0))[0] == 0 for t in e)
               for e in elems):
            return spark.createDataFrame([], "doc_id long, score double")
        if n == 1 and not has_alts:
            return self.compile(ops.Term(terms[0]), stats, factor)

        present = [t for t in set(terms)
                   if stats.termfreqs.get(t, (0, 0))[0] > 0]
        sp = self._scored_postings(
            [(t, 1, factor) for t in present], stats,
            keep=("positions",))
        cand = (
            sp.groupBy("doc_id")
            .agg(
                self._sum_scores().alias("score"),
                F.count_distinct("term").alias("_n"),
                F.map_from_entries(
                    F.collect_list(F.struct("term", "positions"))
                ).alias("_pos"),
            )
        )
        if not has_alts:
            cand = cand.filter(F.col("_n") == len(set(terms)))

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("boolean")
        def check_udf(pos_maps):
            import pandas as pd

            out = []
            for pos_map in pos_maps:
                plists = []
                ok = True
                for e in elems:
                    union = []
                    for t in e:
                        pl = pos_map.get(t)
                        if pl is not None:
                            union.extend(pl)
                    ps = sorted(union)
                    if not ps:
                        ok = False
                        break
                    plists.append(ps)
                out.append(ok and _positions_match(plists, window,
                                                   ordered))
            return pd.Series(out)

        return (
            cand.filter(check_udf(F.col("_pos")))
            .select("doc_id", "score")
        )

    # -- the match ----------------------------------------------------------

    @staticmethod
    def _query_length(node: ops.Query) -> int:
        """Σ wqf over leaf terms (Weight's get_query_length)."""
        if isinstance(node, ops.Term):
            return node.wqf
        if isinstance(node, (ops.AndNot, ops.AndMaybe, ops.Filter)):
            return (Enquire._query_length(node.left)
                    + Enquire._query_length(node.right))
        if isinstance(node, ops.ScaleWeight):
            return Enquire._query_length(node.child)
        children = getattr(node, "children", ())
        if children:
            return sum(Enquire._query_length(c) for c in children)
        return len(node.terms())

    def _with_extra(self, scored: DataFrame, query: ops.Query,
                    stats: _QueryStats) -> DataFrame:
        """Add the per-document extra weight (k2 ≠ 0) once per matched
        doc — ExtraWeightPostList (matcher/localsubmatch.cc:92-96)."""
        w = self.weight
        if not (hasattr(w, "sumextra_col") and getattr(w, "maxextra",
                                                       lambda: 0)()):
            return scored
        lf = w.len_factor(stats.average_length)
        qlen = self._query_length(query)
        dl = self.index.doclens.select("doc_id", "doclen")
        extra = w.sumextra_col(F.col("doclen"), lf, qlen)
        keep = [c for c in scored.columns
                if c not in ("doc_id", "score")]
        return (scored.join(dl, "doc_id")
                .select("doc_id",
                        (F.col("score") + extra).alias("score"),
                        *keep))

    def get_mset(self, query: ops.Query, first: int = 0,
                 maxitems: int = 10, decider=None,
                 docid_order: str = "asc") -> DataFrame:
        """Top-k: DataFrame(doc_id, score) ordered by (score desc,
        docid tiebreak), offset by `first`.

        `decider` is the MatchDecider analog (enquire.h MatchDecider):
        a boolean Column over index.docs — docs failing it are excluded
        BEFORE the top-k bound, exactly like the reference applies the
        decider during the match. A left-semi join against the filtered
        docs table (broadcast when small) keeps the plan one pass.

        `docid_order` is Enquire::set_docid_order (msetcmp.cc:46-133):
        "asc" (default ASCENDING), "desc" (DESCENDING); DONT_CARE maps
        to ascending — with one logical collection the reference's
        DONT_CARE ordering is ascending too."""
        stats = self._gather_stats(list(query.terms()))
        scored = self._with_extra(self.compile(query, stats), query,
                                  stats)
        if decider is not None:
            if self.index.docs is None:
                raise ValueError("a decider requires index.docs")
            allowed = self.index.docs.filter(decider).select(
                F.col("doc_id").cast("long").alias("doc_id"))
            scored = scored.join(allowed, "doc_id", "left_semi")
        tiebreak = F.desc("doc_id") if docid_order == "desc" \
            else F.asc("doc_id")
        ordered = scored.orderBy(F.desc("score"), tiebreak)
        if first:
            # offset()+limit() stays a TakeOrderedAndProject of
            # first+maxitems rows; a global row_number() Window would
            # drag the ENTIRE scored set into one task.
            return ordered.offset(first).limit(maxitems)
        return ordered.limit(maxitems)


    def get_mset_collapse(self, query: ops.Query, key_col: str,
                          collapse_max: int = 1, first: int = 0,
                          maxitems: int = 10) -> DataFrame:
        """Collapse: keep the best `collapse_max` docs per key value
        (matcher/collapser.cc, used multimatch.cc:731-779).
        Returns (doc_id, score, <key_col>, collapse_count) where
        collapse_count on the best item = docs collapsed away."""
        from pyspark.sql.window import Window

        docs = self.index.docs
        if docs is None:
            raise ValueError("collapse requires index.docs")
        stats = self._gather_stats(list(query.terms()))
        scored = self.compile(query, stats)
        keyed = scored.join(
            docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        key_col), "doc_id")
        w = Window.partitionBy(key_col).orderBy(
            F.desc("score"), F.asc("doc_id"))
        wc = Window.partitionBy(key_col)
        out = (
            keyed
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("_nk", F.count(F.lit(1)).over(wc))
            .filter(F.col("_rn") <= collapse_max)
            .withColumn(
                "collapse_count",
                F.when(F.col("_rn") == 1,
                       F.greatest(F.col("_nk") - collapse_max, F.lit(0)))
                .otherwise(F.lit(0)).cast("int"))
            .select("doc_id", "score", key_col, "collapse_count")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
        if first:
            out = out.offset(first)
        return out.limit(maxitems)

    def get_mset_sorted(self, query: ops.Query, sort_col,
                        order: str = "val_rel", reverse: bool = False,
                        maxitems: int = 10) -> DataFrame:
        """Sort by a value key (Enquire::set_sort_by_value* +
        set_sort_by_key, matcher/msetcmp.cc):
        order = "val" | "val_rel" | "rel_val".

        `sort_col` is a single column (with the `reverse` flag — the
        ValueKeyMaker case) or a list of (column, reverse) pairs — the
        MultiValueKeyMaker composite key (include/xapian/
        keymaker.h:68-107: compare by the first key, ties by the
        second, ...). The composite stays a bounded
        TakeOrderedAndProject like the single-key path."""
        docs = self.index.docs
        if docs is None:
            raise ValueError("sort by value requires index.docs")
        if isinstance(sort_col, str):
            keys = [(sort_col, reverse)]
        else:
            keys = [(c, r) for c, r in sort_col]
        stats = self._gather_stats(list(query.terms()))
        scored = self.compile(query, stats)
        keyed = scored.join(
            docs.select(F.col("doc_id").cast("long").alias("doc_id"),
                        *[c for c, _r in keys]), "doc_id")
        vals = [F.desc(c) if r else F.asc(c) for c, r in keys]
        if order == "val":
            cols = vals + [F.asc("doc_id")]
        elif order == "val_rel":
            cols = vals + [F.desc("score"), F.asc("doc_id")]
        elif order == "rel_val":
            cols = [F.desc("score")] + vals + [F.asc("doc_id")]
        else:
            raise ValueError(f"unknown sort order: {order!r}")
        return keyed.orderBy(*cols).limit(maxitems)

    def _topk_with_matched(self, query: ops.Query, first: int,
                           maxitems: int, weight_cutoff: float = 0.0):
        """ONE Spark job for everything the percent/cutoff paths need:
        the top first+maxitems (score, doc_id) rows WITH `_n` = the
        number of query terms each doc matches, collected. The old
        shape was three jobs (internal top-1 collect, a postings scan
        for the top doc's matched-term count, and the caller's final
        top-k) — `_n` now rides the same top-k aggregation as a
        doc_id join, so the whole percent computation falls out of the
        single collected result."""
        stats = self._gather_stats(list(query.terms()))
        qterms = list(dict.fromkeys(query.terms()))
        if (qterms and self._is_flat(query)
                and not isinstance(query, ops.Synonym)):
            # flat queries (the common shape): the aggregation already
            # produces _n — reuse it, zero extra shuffle
            scored = self._compile_flat(query, stats, 1.0, keep_n=True)
            scored = self._with_extra(scored, query, stats)
        else:
            scored = self._with_extra(self.compile(query, stats),
                                      query, stats)
            if qterms:
                matched = (
                    self.index.postings
                    .filter(F.col("term").isin(qterms))
                    .groupBy("doc_id")
                    .agg(F.count_distinct("term").alias("_n")))
                scored = scored.join(matched, "doc_id", "left")
            else:
                scored = scored.withColumn("_n", F.lit(0))
        if weight_cutoff > 0:
            scored = scored.filter(F.col("score") >= weight_cutoff)
        rows = (scored.orderBy(F.desc("score"), F.asc("doc_id"))
                .limit(first + maxitems).collect())
        return rows, qterms

    def _local_mset(self, rows, schema: str) -> DataFrame:
        """Collected top-k rows → a LOCAL DataFrame. Built via pandas/
        Arrow so it becomes a LocalRelation — a plain createDataFrame
        of a driver list parallelizes into defaultParallelism
        Python-RDD slices and every downstream action pays a Python
        worker round-trip per slice."""
        import pandas as pd

        spark = self.index.postings.sparkSession
        rows = list(rows)
        if not rows:
            return spark.createDataFrame([], schema)
        names = [f.split()[0] for f in schema.split(",")]
        pdf = pd.DataFrame(rows, columns=names)
        return spark.createDataFrame(pdf, schema=schema)

    def get_mset_cutoff(self, query: ops.Query,
                        percent_cutoff: int = 0,
                        weight_cutoff: float = 0.0,
                        first: int = 0,
                        maxitems: int = 10) -> DataFrame:
        """Enquire::set_cutoff analog. weight_cutoff drops docs with
        score < the absolute threshold (multimatch.cc:573 min_weight
        init). percent_cutoff drops docs below percent_cutoff% via the
        post-match pass (multimatch.cc:908-930): min_wt =
        (pc/100 - DBL_EPSILON) / percent_scale with percent_scale =
        (subqueries matched by the greatest-weight doc / total
        subqueries) / greatest_wt — this threshold dominates the
        during-match wt*factor prune, so one final filter is exact.
        Because results are score-descending, the percent cutoff only
        truncates the tail — applied driver-side to the one collected
        top-k, not as a second Spark job."""
        rows, qterms = self._topk_with_matched(
            query, first, maxitems, weight_cutoff)
        if percent_cutoff and rows and rows[0]["score"] > 0 and qterms:
            greatest_wt = rows[0]["score"]
            matched = rows[0]["_n"] or 0
            # a top doc carried purely by extra weight (k2) or a
            # term-less branch gives scale 0 — the reference's
            # percent_scale is then 0 too and no prune applies
            if matched:
                scale = matched / len(qterms) / greatest_wt
                eps = 2.220446049250313e-16
                min_wt = (percent_cutoff / 100.0 - eps) / scale
                rows = [r for r in rows if r["score"] >= min_wt]
        return self._local_mset(
            [(r["doc_id"], r["score"]) for r in rows[first:]],
            "doc_id long, score double")

    def get_mset_percent(self, query: ops.Query, first: int = 0,
                         maxitems: int = 10) -> DataFrame:
        """Top-k with the reference percent score: percent_scale =
        (subqueries matched by the greatest-weight doc / total
        subqueries) / greatest_wt (multimatch.cc:893-906), percent =
        int(wt·scale·100 + 100·DBL_EPSILON) clamped to [0,100], 0→1
        for wt>0 (omenquire.cc convert_to_percent_internal). One Spark
        job: the percent scale derives from the collected top-k
        itself (see _topk_with_matched)."""
        rows, qterms = self._topk_with_matched(query, first, maxitems)
        schema = "doc_id long, score double, percent int"
        if not rows or rows[0]["score"] <= 0:
            return self._local_mset(
                [(r["doc_id"], r["score"],
                  100 if r["score"] > 0 else 0)
                 for r in rows[first:]], schema)
        greatest_wt = rows[0]["score"]
        matched = rows[0]["_n"] or 0
        percent_factor = (matched / len(qterms) / greatest_wt * 100.0
                          if qterms else 0.0)
        eps = 100.0 * 2.220446049250313e-16
        import math as _math

        out = []
        for r in rows[first:]:
            pct = int(_math.floor(r["score"] * percent_factor + eps))
            pct = min(max(pct, 0), 100)
            if pct == 0 and r["score"] > 0:
                pct = 1
            out.append((r["doc_id"], r["score"], pct))
        return self._local_mset(out, schema)


def _positions_match(plists: List[List[int]], window: int,
                     ordered: bool) -> bool:
    """True iff there's one position per list, all within `window`
    (max-min < window), and strictly increasing when `ordered`."""
    n = len(plists)

    def rec(i: int, chosen: List[int]) -> bool:
        if i == n:
            return max(chosen) - min(chosen) < window
        for p in plists[i]:
            if ordered and chosen and p <= chosen[-1]:
                continue
            if chosen and max(chosen + [p]) - min(chosen + [p]) >= window:
                continue
            if rec(i + 1, chosen + [p]):
                return True
        return False

    return rec(0, [])
