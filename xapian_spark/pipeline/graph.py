"""Link-graph analytics over web corpora.

PageRank is THE canonical whole-web batch computation (Page et al.
1999); a crawl-scale curation pipeline uses it (or an in/out-degree
proxy) as a document-quality prior, exactly like CCNet/Gopher use
perplexity buckets. The implementation here is FIXED-POINT: ranks are
int64 micro-units and every step is integer arithmetic (floor
division by out-degree, integer damping as a num/den rational), so

- the per-node in-sums are exact whatever order Spark's partial
  aggregates combine in (int64 addition is associative — no float
  summation-order hazard, the reason embed_neardup/semdedup need
  round-before-compare dances),
- two runs on different cluster sizes, or a DuckDB replay, produce
  BYTE-IDENTICAL ranks — reproducibility a float power iteration
  cannot offer, and
- the driver oracle replays it exactly with unrolled integer CTEs.

Scale shape: each iteration is one (edges ⋈ ranks) shuffle keyed by
src + one groupBy(dst) with map-side combine, the dangling mass is a
1-row aggregate broadcast back, and the new rank frame is
localCheckpoint()ed eagerly — plan depth stays O(1) per iteration
instead of doubling (persist does NOT truncate lineage; measured
OOM-at-6-rounds in round 1's connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iters: int = 10,
             damping_num: int = 85, damping_den: int = 100,
             scale: int = 10 ** 12,
             src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """Fixed-point PageRank over (src, dst) edges.

    Semantics (all integer, deterministic):
    - nodes = distinct(src) ∪ distinct(dst); N = |nodes|
    - r_0[v] = scale div N
    - per iteration:
        contrib(u→v) = r[u] div outdeg(u)
        dangling     = Σ r[u] over nodes with outdeg 0
        r'[v] = base + num·(Σ_in contrib + dangling div N) div den
      where base = ((den−num)·scale div den) div N.
    Floor division sheds up to a few units of mass per node per step
    (bounded by N·iters micro-units total) — the price of exactness;
    with scale=1e12 the shed mass is ≤1e-6 of the total at a million
    nodes.

    Returns (node, rank_units BIGINT, rank DOUBLE=units/scale).
    Self-loops participate like any edge; callers wanting the classic
    formulation filter src != dst first. iters must be >= 1 (same
    contract as connected_components — 0 rounds would silently return
    the uniform vector)."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    nodes = nodes.localCheckpoint(eager=True)
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank_units"),
            F.lit(0.0).alias("rank"))
    # outdeg is checkpointed too: the per-iteration dangling job would
    # otherwise replay the caller's whole edge-derivation plan (and the
    # groupBy) once per iteration through its lineage
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).alias("outdeg")).localCheckpoint(eager=True)
    # edges carrying their source's outdeg — reused every iteration
    ed = e.join(outdeg, "src").localCheckpoint(eager=True)
    base = ((damping_den - damping_num) * scale
            // damping_den) // n
    r = nodes.select("node",
                     F.lit(scale // n).cast("long").alias("r"))
    srcs = outdeg.select(F.col("src").alias("node"))
    for _ in range(iters):
        contrib = (ed.join(r, ed.src == r.node)
                   .select(F.col("dst").alias("node"),
                           F.expr("r div outdeg").alias("c")))
        insum = contrib.groupBy("node").agg(
            F.sum("c").alias("insum"))
        dang = (r.join(srcs, "node", "left_anti")
                .agg(F.coalesce(F.sum("r"), F.lit(0))
                     .cast("long").alias("dang")))
        r = (nodes.join(insum, "node", "left")
             .crossJoin(F.broadcast(dang))
             .select(
                 "node",
                 (F.lit(base)
                  + F.expr(f"({damping_num} * (coalesce(insum, 0)"
                           f" + dang div {n})) div {damping_den}"))
                 .cast("long").alias("r")))
        r = r.localCheckpoint(eager=True)
    return r.select("node", F.col("r").alias("rank_units"),
                    (F.col("r") / F.lit(float(scale))).alias("rank"))


def synthetic_link_edges(docs: DataFrame, n_mod: int,
                         id_col: str = "doc_id") -> DataFrame:
    """Deterministic link graph over a documents table: doc i links to
    (37·i + 101·j + 13) mod n_mod for j in 0..(i mod 3), self-loops
    dropped. The single Spark-side definition of the synthetic crawl
    host graph — the driver query, bench.py, and the DuckDB oracle
    (_LINK_EDGES in __spark_entry__.py) all replay this formula; keep
    them in sync."""
    return (docs
            .select(F.col(id_col).alias("src"),
                    F.explode(F.sequence(
                        F.lit(0), (F.col(id_col) % 3).cast("int")))
                    .alias("j"))
            .select("src",
                    ((F.col("src") * 37 + F.col("j") * 101 + 13)
                     % n_mod).alias("dst"))
            .filter(F.col("src") != F.col("dst")))


def degree_stats(edges: DataFrame, src_col: str = "src",
                 dst_col: str = "dst") -> DataFrame:
    """(node, out_degree, in_degree) — the cheap link-quality prior
    (one groupBy each side, full outer join). Nodes missing from a
    side get 0."""
    e = edges.select(F.col(src_col).cast("long").alias("src"),
                     F.col(dst_col).cast("long").alias("dst"))
    od = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"))
    ind = e.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"))
    return (od.join(ind, "node", "full")
            .select("node",
                    F.coalesce("out_degree", F.lit(0))
                    .cast("long").alias("out_degree"),
                    F.coalesce("in_degree", F.lit(0))
                    .cast("long").alias("in_degree")))
