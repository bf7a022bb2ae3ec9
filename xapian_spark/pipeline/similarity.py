"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline — one narrow scan, a
  zip_with dot product (JVM-side higher-order functions, no Python),
  TakeOrderedAndProject top-k.
- random-hyperplane LSH buckets: the scale path — sign-bit sketches from
  deterministic md5-derived hyperplanes; bucket join for candidate pairs.
- IVF-style coarse quantization: assign each vector to its nearest of K
  deterministic centroids; probe only matching cells.
- product quantization (PQ): compress each vector to m small codes;
  top-k scans ONLY the code column against a driver-computed lookup
  table (asymmetric distance computation) — the memory-bound path for
  corpora whose raw float vectors don't fit the cluster.

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


def _pq_default_codebooks(dim: int, m: int, k: int,
                          seed: int = 42) -> List[List[List[float]]]:
    """Deterministic data-independent PQ codebooks: the md5 hyperplane
    generator reshaped to m codebooks of k unit codewords over the
    dim/m-length subspace. Pure function of (dim, m, k, seed), so an
    external engine (the DuckDB oracle) can embed the exact same
    doubles as literals. Production trains better ones
    (train_pq_codebooks); these are the replayable correctness
    anchor."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    flat = _hyperplanes(dsub, m * k, seed + 2000)
    return [flat[s * k:(s + 1) * k] for s in range(m)]


def train_pq_codebooks(embeddings: DataFrame, dim: int, m: int = 8,
                       k: int = 16, iters: int = 10, sample: int = 4096,
                       seed: int = 42, vec_col: str = "embedding",
                       id_col: str = "vec_id") -> List[List[List[float]]]:
    """Product-quantization codebooks (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each vector into
    m subvectors of dim/m and run k-means PER SUBSPACE. Training uses
    the same deterministic bounded sample as train_ivf_centroids
    (TakeOrdered on md5(seed, id) — safe at any corpus size); Lloyd's
    iterations run driver-side in numpy on m tiny (sample × dim/m)
    matrices. Returns codebooks[s][j] = the j-th codeword of subspace
    s. Deterministic: same seed + data → same codebooks."""
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (embeddings
            .select(F.col(vec_col).alias("v"),
                    F.md5(F.concat_ws("-", F.lit(seed),
                                      F.col(id_col))).alias("r"))
            .orderBy("r").limit(sample).collect())
    if not rows:
        raise ValueError(
            "train_pq_codebooks needs a non-empty sample (embeddings"
            " frame is empty; use _pq_default_codebooks for a"
            " data-independent grid)")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    books: List[List[List[float]]] = []
    for s in range(m):
        xs = x[:, s * dsub:(s + 1) * dsub]
        kk = min(k, len(xs))
        cents = xs[:kk].copy()  # md5-shuffled rows → deterministic init
        for _ in range(iters):
            d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d.argmin(axis=1)
            for c in range(kk):
                mask = assign == c
                if mask.any():
                    cents[c] = xs[mask].mean(axis=0)
        book = [list(map(float, c)) for c in cents]
        if len(book) < k:  # degenerate corpora: pad with md5 planes
            book += _hyperplanes(dsub, k - len(book), seed + 3000 + s)
        books.append(book)
    return books


def _pq_subspace_code(vec_col: str, s: int, dsub: int,
                      book: List[List[float]]) -> Column:
    """Code of subspace s: argmin_j of the squared L2 distance to
    codeword j, ties going to the lowest j (array_min over (d, j)
    structs — the exact ordering the oracle's row_number replays).
    Distances are compared UNROUNDED: every path (this expression,
    the numpy kernel, the DuckDB replay) accumulates the dsub terms
    left-to-right from the same float32→double casts and the same
    codeword literals, so the doubles are bit-identical by
    construction — rounding would only introduce a cross-engine
    rounding-mode hazard (Spark round is HALF_UP, numpy's is
    half-even).

    The expression is built as ONE SQL string: constructing 128
    zip_with/aggregate lambdas through the Python Column API costs a
    py4j round-trip per lambda (~11 s of pure plan-build measured at
    m=8, k=16); the parsed SQL is the identical Catalyst tree for
    ~nothing. Codeword literals go through CAST('…' AS DOUBLE) —
    a bare decimal literal would parse as DECIMAL and change the
    arithmetic."""
    sub = f"slice({vec_col}, {s * dsub + 1}, {dsub})"
    cands = []
    for j, cw in enumerate(book):
        cwl = ("array(" + ", ".join(
            f"CAST('{c!r}' AS DOUBLE)" for c in cw) + ")")
        d2 = (f"aggregate(zip_with({sub}, {cwl}, (x, c) -> "
              f"(cast(x as double) - c) * (cast(x as double) - c)), "
              f"cast(0.0 as double), (acc, v) -> acc + v)")
        cands.append(f"named_struct('d', {d2}, 'j', {j})")
    return F.expr(f"array_min(array({', '.join(cands)})).j")


def pq_encode(embeddings: DataFrame,
              codebooks: List[List[List[float]]],
              vec_col: str = "embedding", id_col: str = "vec_id",
              arrow: bool = False) -> DataFrame:
    """(vec_id, codes array<int>): each vector compressed to m codes
    (m·log2(k) bits — 64 float32 → 8 bytes at m=8,k=16, a 32×
    compression). Two equivalent paths:

    - arrow=False (default): pure JVM whole-stage-codegen expressions
      (m·k zip_with folds per row). Right for m·k up to a few
      hundred; beyond that the generated code bloats.
    - arrow=True: one vectorized numpy kernel via mapInPandas for
      big-m·k codebooks (dim 1024, k 256). The distance accumulates
      subspace components LEFT-TO-RIGHT like the expression fold, so
      both paths produce bit-identical doubles (tests assert
      row-for-row equality).

    Distances are compared UNROUNDED with lowest-j tiebreak on both
    paths — bit-identical by matched fold order, the contract the
    DuckDB oracle re-derives (see _pq_subspace_code)."""
    m = len(codebooks)
    k = len(codebooks[0])
    dsub = len(codebooks[0][0])
    if not arrow:
        codes = F.array(*[
            _pq_subspace_code(vec_col, s, dsub, codebooks[s])
            for s in range(m)])
        return embeddings.select(
            F.col(id_col).alias("vec_id"),
            codes.cast("array<int>").alias("codes"))

    import numpy as np
    import pandas as pd

    cb = np.array(codebooks, dtype=np.float64)  # (m, k, dsub)
    schema = "vec_id long, codes array<int>"

    def gen(batches):
        for pdf in batches:
            vecs = np.array(list(pdf["_v"]), dtype=np.float64)
            n = len(vecs)
            xs = vecs.reshape(n, m, dsub)
            # accumulate dsub terms left-to-right (matches F.aggregate)
            d = np.zeros((n, m, k))
            for i in range(dsub):
                diff = xs[:, :, None, i] - cb[None, :, :, i]
                d = d + diff * diff
            codes = d.argmin(axis=2)  # first min = lowest-j tiebreak
            yield pd.DataFrame({
                "vec_id": pdf["_id"].to_numpy(),
                "codes": [c.astype("int32") for c in codes]})

    return embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")) \
        .mapInPandas(gen, schema)


def pq_topk(embeddings: DataFrame, query_vec: Sequence[float],
            k: int = 10, codebooks: List[List[List[float]]] = None,
            m: int = None, n_codes: int = None, seed: int = 42,
            refine: int = 0, vec_col: str = "embedding",
            id_col: str = "vec_id", codes: DataFrame = None) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation (ADC):
    the query stays un-quantized; the per-subspace distance from the
    query subvector to every codeword is a DRIVER-computed m×k lookup
    table, and each row's distance is m element_at's into literal
    arrays summed in fixed subspace order — the scan touches ONLY the
    8-byte code column, never the float vectors. At 10^12 vectors
    that is the difference between a 4 TB and a 256 TB working set.

    `codebooks=` is authoritative when given: its geometry defines m
    and n_codes (an explicit contradictory m/n_codes raises, seed is
    unused); without it, data-independent default codebooks are built
    from (m, n_codes, seed) with m=8 / n_codes=16 defaults. `codes`
    (from pq_encode, normally a materialized column) is computed
    inline when not given. `refine` > 0 re-ranks the top
    `refine` ADC candidates by exact cosine over the raw vectors (the
    standard recall fix-up; touches only `refine` rows) and returns
    (vec_id, adc, cosine) ordered by cosine; refine=0 returns
    (vec_id, adc) ordered by ADC ascending, vec_id tiebreak."""
    dim = len(query_vec)
    if codes is not None and codebooks is None:
        # a codes column is only meaningful with the codebooks it was
        # encoded against — silently using the default books would
        # build the LUT against the wrong codewords and return
        # plausible-looking garbage
        raise ValueError("codes= requires the codebooks it was "
                         "encoded with (pass codebooks=)")
    if codebooks is not None:
        # codebooks= is authoritative: its geometry defines m and
        # n_codes, and seed is irrelevant. Refuse a contradictory
        # explicit m/n_codes rather than silently ignoring it.
        if m is not None and m != len(codebooks):
            raise ValueError(
                f"m={m} contradicts codebooks (m={len(codebooks)})")
        if n_codes is not None and n_codes != len(codebooks[0]):
            raise ValueError(
                f"n_codes={n_codes} contradicts codebooks "
                f"(n_codes={len(codebooks[0])})")
        books = codebooks
    else:
        books = _pq_default_codebooks(dim, m or 8, n_codes or 16, seed)
    m = len(books)
    dsub = len(books[0][0])
    if dim != m * dsub:
        raise ValueError(
            f"query_vec has {dim} dims but the codebooks cover "
            f"{m} x {dsub} = {m * dsub}")
    if codes is None:
        codes = pq_encode(embeddings, books, vec_col, id_col)
    # driver-side LUT: lut[s][j] = ||q_sub - codeword||², accumulated
    # left-to-right with explicit multiplies (x*x, never pow — libm
    # pow(x, 2.0) is not guaranteed bit-equal) so a SQL replay using
    # the same fold produces the same doubles
    lut: List[List[float]] = []
    for s, book in enumerate(books):
        row = []
        for cw in book:
            acc = 0.0
            for i in range(dsub):
                diff = float(query_vec[s * dsub + i]) - cw[i]
                acc += diff * diff
            row.append(acc)
        lut.append(row)
    adc = F.lit(0.0)
    for s in range(m):
        lut_arr = F.array(*[F.lit(v) for v in lut[s]])
        adc = adc + F.element_at(
            lut_arr, F.element_at(F.col("codes"), s + 1) + 1)
    ranked = (codes.select("vec_id", F.round(adc, 6).alias("adc"))
              .orderBy(F.asc("adc"), F.asc("vec_id")))
    if not refine:
        return ranked.limit(k)
    cand = ranked.limit(refine)
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("_v"))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cos = cosine_similarity_col(F.col("_v"), q)
    return (cand.join(e, "vec_id")
            .select("vec_id", "adc", F.round(cos, 6).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(k))


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
