"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — one narrow scan, a
  zip_with dot product (JVM-side higher-order functions, no Python),
  TakeOrderedAndProject top-k.
- random-hyperplane LSH buckets: the scale path — sign-bit sketches from
  deterministic md5-derived hyperplanes; bucket join for candidate pairs.
- IVF-style coarse quantization: assign each vector to its nearest of K
  deterministic centroids; probe only matching cells.

All deterministic (hyperplanes/centroids derived from md5 of a seed).
"""

from __future__ import annotations

import hashlib
import math
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec: Sequence[float],
                k: int = 10, vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine to a literal query vector.
    (vec_id, cosine) ordered desc, id asc tiebreak."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_similarity_col(F.col(vec_col), q)
    return (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.round(cos, 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    """Deterministic pseudo-random unit hyperplanes: components from
    md5-derived uniforms mapped through the inverse-ish transform
    (sum of 4 uniforms - 2, a cheap near-gaussian)."""
    planes = []
    for p in range(n_planes):
        comp = []
        for d in range(dim):
            acc = 0.0
            for r in range(4):
                h = hashlib.md5(
                    f"hp-{seed}-{p}-{d}-{r}".encode()).hexdigest()
                acc += int(h[:8], 16) / 0xFFFFFFFF
            comp.append(acc - 2.0)
        n = math.sqrt(sum(c * c for c in comp)) or 1.0
        planes.append([c / n for c in comp])
    return planes


def lsh_signatures(embeddings: DataFrame, dim: int, n_planes: int = 16,
                   seed: int = 42, vec_col: str = "embedding",
                   id_col: str = "vec_id") -> DataFrame:
    """(vec_id, bucket BIGINT): sign-bit sketch over n_planes random
    hyperplanes. Vectors with equal buckets are near-angle candidates."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        pv = F.array(*[F.lit(c) for c in plane])
        bit = F.when(_dot(F.col(vec_col), pv) >= 0,
                     F.lit(1 << i).cast("long")).otherwise(F.lit(0))
        bucket = bucket + bit
    return embeddings.select(
        F.col(id_col).alias("vec_id"), bucket.alias("bucket"))


def lsh_neardup_pairs(embeddings: DataFrame, dim: int,
                      threshold: float = 0.9, n_planes: int = 16,
                      bands: int = 4, seed: int = 42,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Embedding near-dup pairs: banded sign-sketch LSH candidates →
    exact cosine verify ≥ threshold. (vec_id_a < vec_id_b, cosine)."""
    planes_per_band = n_planes // bands
    sig = lsh_signatures(embeddings, dim, n_planes, seed, vec_col, id_col)
    banded = sig.select(
        "vec_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                (F.shiftright(F.col("bucket"), bi * planes_per_band)
                 % F.lit(1 << planes_per_band)).alias("key"),
            )
            for bi in range(bands)
        ])).alias("b"),
    ).select("vec_id", "b.band", "b.key")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(F.col("a.vec_id").alias("vec_id_a"),
                F.col("b.vec_id").alias("vec_id_b"))
        .distinct()
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("vec"))
    cos = cosine_similarity_col(F.col("va"), F.col("vb"))
    return (
        cand
        .join(e.withColumnRenamed("vec", "va"),
              cand.vec_id_a == e.vec_id)
        .drop("vec_id")
        .join(e.withColumnRenamed("vec", "vb"),
              F.col("vec_id_b") == e.vec_id)
        .drop("vec_id")
        .select(
            "vec_id_a", "vec_id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def brute_force_pairs(embeddings: DataFrame, threshold: float = 0.9,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      max_rows: int = 100_000) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold — the VERIFICATION baseline
    for lsh_neardup_pairs, O(n²) by construction. The product path at
    corpus scale is lsh_neardup_pairs (banded sketch join); to keep
    this from being silently pointed at a full corpus, it refuses
    inputs above `max_rows` (pass max_rows=None to override for an
    explicitly-bounded verification job)."""
    if max_rows is not None:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"brute_force_pairs is O(n²) and got {n} rows "
                f"(> max_rows={max_rows}); use lsh_neardup_pairs for "
                "corpus-scale near-dup, or pass max_rows=None if this "
                "O(n²) job is genuinely intended")
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("vec"))
    a = e.select(F.col("vec_id").alias("vec_id_a"),
                 F.col("vec").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_id_b"),
                 F.col("vec").alias("vb"))
    cos = cosine_similarity_col(F.col("va"), F.col("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .select("vec_id_a", "vec_id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def train_ivf_centroids(embeddings: DataFrame, n_cells: int = 16,
                        iters: int = 10, sample: int = 4096,
                        seed: int = 42, vec_col: str = "embedding",
                        id_col: str = "vec_id") -> List[List[float]]:
    """Spherical k-means over a DETERMINISTIC bounded sample: rows are
    ranked by md5(seed, vec_id) and the top `sample` collected (a
    TakeOrdered — safe at any corpus size), then Lloyd's iterations run
    driver-side in numpy. Training the quantizer on a sample is the
    standard IVF recipe (FAISS-style); assignment of the full corpus
    stays distributed in ivf_assign. Deterministic: same seed + data →
    same centroids. Returns n_cells L2-normalized centroids."""
    import numpy as np

    rows = (embeddings
            .select(F.col(vec_col).alias("v"),
                    F.md5(F.concat_ws("-", F.lit(seed),
                                      F.col(id_col))).alias("r"))
            .orderBy("r").limit(sample).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    xn = x / norms
    k = min(n_cells, len(xn))
    cents = xn[:k].copy()  # md5-shuffled rows → deterministic init
    for _ in range(iters):
        assign = np.argmax(xn @ cents.T, axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = xn[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    out = [list(map(float, c)) for c in cents]
    # pad degenerate corpora (fewer rows than cells) with md5 planes
    if len(out) < n_cells:
        out += _hyperplanes(len(out[0]) if out else 2,
                            n_cells - len(out), seed + 1000)
    return out


def ivf_assign(embeddings: DataFrame, dim: int, n_cells: int = 16,
               seed: int = 42, vec_col: str = "embedding",
               id_col: str = "vec_id",
               centroids: List[List[float]] = None,
               replicas: int = 1) -> DataFrame:
    """IVF coarse quantization: nearest (by dot product of normalized
    centroid) of n_cells centroids — trained (train_ivf_centroids) or
    the md5-deterministic fallback. (vec_id, cell).

    `replicas` > 1 assigns each vector to its top-m cells (build-side
    replication): m× storage for much higher recall at the same
    nprobe — the standard compensation when embeddings are weakly
    clustered (near-uniform directions make single-cell IVF recall
    cap low no matter how the centroids are trained)."""
    cents = centroids or _hyperplanes(dim, n_cells, seed + 1000)
    scores = F.array(*[
        F.struct(
            _dot(F.col(vec_col),
                 F.array(*[F.lit(c) for c in cent])).alias("dot"),
            F.lit(ci).alias("cell"),
        )
        for ci, cent in enumerate(cents)
    ])
    if replicas <= 1:
        best = F.array_max(scores)
        return embeddings.select(
            F.col(id_col).alias("vec_id"), best["cell"].alias("cell"))
    topm = F.slice(F.reverse(F.array_sort(scores)), 1, replicas)
    return (embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.explode(topm).alias("s"))
        .select("vec_id", F.col("s.cell").alias("cell")))


def ivf_topk(embeddings: DataFrame, query_vec: Sequence[float],
             k: int = 10, n_cells: int = 16, nprobe: int = 4,
             seed: int = 42, vec_col: str = "embedding",
             id_col: str = "vec_id",
             centroids: List[List[float]] = None,
             replicas: int = 1) -> DataFrame:
    """IVF approximate top-k: probe only the `nprobe` cells whose
    centroids score highest against the query, brute-force cosine
    within them. nprobe == n_cells degenerates to the exact search
    (the correctness anchor); smaller nprobe trades recall for a
    1/(n_cells/nprobe) scan fraction — at 10^12 vectors the probed
    cells are partition-pruned when the table is written partitioned
    by cell."""
    dim = len(query_vec)
    cents = centroids or _hyperplanes(dim, n_cells, seed + 1000)
    qscores = sorted(
        range(len(cents)),
        key=lambda ci: -sum(float(q) * c
                            for q, c in zip(query_vec, cents[ci])))
    probe = qscores[:nprobe]
    cells = ivf_assign(embeddings, dim, n_cells, seed, vec_col, id_col,
                       centroids=cents, replicas=replicas)
    probe_ids = cells.filter(F.col("cell").isin(probe)) \
        .select("vec_id").distinct()
    cand = embeddings.join(
        probe_ids, embeddings[id_col] == probe_ids["vec_id"],
        "left_semi")
    return cosine_topk(cand, query_vec, k, vec_col, id_col)


def sign_cells(embeddings: DataFrame, bits: int = 8,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cell) from the RAW sign bits of the first `bits`
    embedding components. No arithmetic touches the floats, so the
    assignment is bit-identical in every engine (a projection/dot
    SUM's sign can differ by an ulp across engines — the reason
    embed_neardup_lsh is rows-only); this is the oracle-exact cell
    function for semdedup. 2^bits cells."""
    if not 1 <= bits <= 30:
        raise ValueError(f"bits must be in [1,30], got {bits}")
    cell = F.lit(0)
    for i in range(bits):
        # vectors shorter than `bits` get 0 for the missing bits — an
        # explicit contract (and ANSI-mode-safe: element_at past the
        # end would throw under spark.sql.ansi.enabled)
        comp = F.when(F.size(F.col(vec_col)) > i,
                      F.element_at(F.col(vec_col), i + 1)) \
            .otherwise(F.lit(-1.0))
        cell = cell + F.when(comp >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return embeddings.select(
        F.col(id_col).alias("vec_id"), cell.cast("int").alias("cell"))


def semdedup(embeddings: DataFrame, threshold: float = 0.95,
             cells: DataFrame = None, vec_col: str = "embedding",
             id_col: str = "vec_id") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embedding space, and within each cluster keep only one
    representative of every semantic-duplicate group — here the
    deterministic keep-first rule: drop a vector iff some
    cluster-mate with a LOWER id has cosine >= threshold with it
    (compared on the 6-decimal-rounded cosine, the engine-stable
    form). Returns (vec_id, cell, keep) for every input row.

    `cells` is any (vec_id, cell) assignment: ivf_assign over trained
    k-means centroids is the paper's production path (cells stay
    small, so the within-cell pairwise compare is cheap); sign_cells
    is the engine-exact default used by the driver oracle. A vector
    assigned to SEVERAL cells (ivf_assign replicas > 1) is compared
    in every one of them but still yields exactly ONE output row
    (reported cell = its smallest); a vector missing from `cells`
    entirely is compared nowhere and comes back (vec_id, NULL, true).
    Pairwise work is sum over cells of |cell|^2 — the whole point of
    the clustering is bounding that; pick n_cells/bits so cells fit a
    task. The pair join shuffles only (id, vector) keyed by cell —
    one row each side per (vector, cell) assignment."""
    if cells is None:
        cells = sign_cells(embeddings, 8, vec_col, id_col)
    e = (embeddings.select(F.col(id_col).alias("vec_id"),
                           F.col(vec_col).alias("_v"))
         .join(cells, "vec_id"))
    a = e.select(F.col("vec_id").alias("a_id"),
                 F.col("_v").alias("va"), "cell")
    b = e.select(F.col("vec_id").alias("b_id"),
                 F.col("_v").alias("vb"), "cell")
    cos = F.round(cosine_similarity_col(F.col("va"), F.col("vb")), 6)
    dups = (a.join(b, "cell")
            .filter(F.col("a_id") < F.col("b_id"))
            .filter(cos >= threshold)
            .select(F.col("b_id").alias("vec_id"))
            .distinct()
            .withColumn("_dup", F.lit(True)))
    # exactly one output row per INPUT embedding row, whatever shape
    # `cells` has (replicated assignments collapse to min cell;
    # unassigned vectors keep NULL cell and survive)
    cell_of = cells.groupBy("vec_id").agg(F.min("cell").alias("cell"))
    return (embeddings.select(F.col(id_col).alias("vec_id"))
            .join(cell_of, "vec_id", "left")
            .join(dups, "vec_id", "left")
            .select("vec_id", "cell",
                    F.col("_dup").isNull().alias("keep")))
