"""Geospatial metric/posting-source/keymaker + IVF similarity."""

import math

import pytest
from pyspark.sql import functions as F

from xapian_spark.query.geospatial import (
    QUAD_EARTH_RADIUS_METRES, distance_key_sort, distance_posting_source,
    great_circle_distance,
)
from xapian_spark.pipeline.similarity import cosine_topk, ivf_topk


def _py_haversine(lat1, lon1, lat2, lon2,
                  radius=QUAD_EARTH_RADIUS_METRES):
    # the reference op order (latlong_metrics.cc:115-134)
    deg = math.pi / 180.0
    lata, latb = lat1 * deg, lat2 * deg
    latdiff = lata - latb
    longdiff = (lon1 - lon2) * deg
    shl = math.sin(latdiff / 2)
    shg = math.sin(longdiff / 2)
    h = shl * shl + shg * shg * math.cos(lata) * math.cos(latb)
    if h > 1.0:
        return radius * math.pi
    return 2 * radius * math.asin(math.sqrt(h))


@pytest.fixture(scope="module")
def geo_docs(spark):
    rows = [(i,
             (i * 7919 % 18000) / 100.0 - 90.0,
             (i * 104729 % 36000) / 100.0 - 180.0)
            for i in range(200)]
    return spark.createDataFrame(
        rows, "doc_id long, lat double, lon double").persist()


def test_great_circle_matches_reference_math(geo_docs):
    got = geo_docs.select(
        "doc_id", "lat", "lon",
        great_circle_distance(F.col("lat"), F.col("lon"),
                              48.8566, 2.3522).alias("d")).collect()
    for r in got:
        want = _py_haversine(r["lat"], r["lon"], 48.8566, 2.3522)
        assert abs(r["d"] - want) < 1e-6, r


def test_known_distance(spark):
    # Paris ↔ London ≈ 344 km great-circle
    df = spark.createDataFrame([(1, 51.5074, -0.1278)],
                               "doc_id long, lat double, lon double")
    d = df.select(great_circle_distance(
        F.col("lat"), F.col("lon"), 48.8566, 2.3522)).head()[0]
    assert 330_000 < d < 360_000


def test_distance_posting_source(geo_docs):
    ps = distance_posting_source(geo_docs, 48.8566, 2.3522,
                                 k1=1000.0, k2=1.0)
    rows = {r["doc_id"]: r["score"] for r in ps.collect()}
    assert len(rows) == 200
    # weight = k1/(dist+k1): decreasing in distance, max at dist 0
    near = distance_key_sort(geo_docs, 48.8566, 2.3522, maxitems=200)
    ordered = [r["doc_id"] for r in near.collect()]
    scores = [rows[d] for d in ordered]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 1.0 for s in scores)


def test_posting_source_pluggable(geo_docs, spark):
    """PostingSourceQuery: external (doc_id, score) unioned into the
    query algebra (ops.PostingSourceQuery + AndMaybe)."""
    from xapian_spark.index.build import build_index
    from xapian_spark.query import ops
    from xapian_spark.query.executor import Enquire

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    idx = build_index(docs, analyzer="simple")
    enq = Enquire(idx)
    ps = distance_posting_source(geo_docs, 48.8566, 2.3522)
    q = ops.AndMaybe(ops.Term("batch"), ops.PostingSourceQuery(ps))
    rows = enq.get_mset(q, 0, 10).collect()
    base = enq.get_mset(ops.Term("batch"), 0, 10).collect()
    assert rows and rows[0]["score"] >= base[0]["score"]


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def test_ivf_exact_when_full_probe(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    qv = emb.orderBy("vec_id").head()["embedding"]
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(emb, qv, 10).collect()]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_topk(emb, qv, 10, n_cells=8,
                              nprobe=8).collect()]
    assert full == exact


def test_ivf_partial_probe_recall(spark):
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet")
    qv = emb.orderBy("vec_id").head()["embedding"]
    exact = {r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()}
    approx = {r["vec_id"]
              for r in ivf_topk(emb, qv, 10, n_cells=8,
                                nprobe=4).collect()}
    # recall@10 with half the cells probed should stay reasonable
    assert len(exact & approx) >= 5


def test_ivf_trained_centroids(spark):
    """Sampled spherical k-means centroids (train_ivf_centroids) +
    build-side replication: deterministic, exact under full probe, and
    recall@10 >= 0.9 at nprobe=4 with replicas=4 — where the
    md5-random centroids score ~0.5-0.6 on these near-uniform
    synthetic embeddings."""
    from xapian_spark.pipeline.similarity import train_ivf_centroids

    emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet")
    c1 = train_ivf_centroids(emb, n_cells=16, iters=10, sample=2048)
    c2 = train_ivf_centroids(emb, n_cells=16, iters=10, sample=2048)
    assert c1 == c2  # deterministic

    qvs = [r["embedding"]
           for r in emb.orderBy("vec_id").limit(5).collect()]
    # full probe stays exact with trained centroids
    qv = qvs[0]
    exact = [(r["vec_id"], r["cosine"])
             for r in cosine_topk(emb, qv, 10).collect()]
    full = [(r["vec_id"], r["cosine"])
            for r in ivf_topk(emb, qv, 10, n_cells=16, nprobe=16,
                              centroids=c1).collect()]
    assert full == exact

    hits = total = 0
    for qv in qvs:
        ex = {r["vec_id"] for r in cosine_topk(emb, qv, 10).collect()}
        ap = {r["vec_id"]
              for r in ivf_topk(emb, qv, 10, n_cells=16, nprobe=4,
                                centroids=c1, replicas=4).collect()}
        hits += len(ex & ap)
        total += 10
    assert hits / total >= 0.9, hits / total


# ------------------------------------------------------------ semdedup

def _emb_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sign_cells_exact_bits(spark):
    from xapian_spark.pipeline.similarity import sign_cells

    rows = [(1, [1.0, -2.0, 3.0]), (2, [-0.5, 0.0, -1.0]),
            (3, [1.0, 1.0, 1.0])]
    got = {r.vec_id: r.cell for r in
           sign_cells(_emb_df(spark, rows), bits=3).collect()}
    # bit i set iff component i >= 0 (0.0 counts as >= 0)
    assert got == {1: 0b101, 2: 0b010, 3: 0b111}


def test_semdedup_keep_first_within_cell(spark):
    from xapian_spark.pipeline.similarity import semdedup, sign_cells

    rows = [
        (1, [1.0, 2.0, 0.5]),
        (2, [2.0, 4.0, 1.0]),       # parallel to 1 (cos=1), same cell
        (3, [1.0, 2.0, -0.5]),      # different sign cell -> kept
        (4, [-1.0, -2.0, -0.5]),    # alone in its cell
    ]
    df = _emb_df(spark, rows)
    got = {r.vec_id: (r.cell, r.keep) for r in
           semdedup(df, threshold=0.95,
                    cells=sign_cells(df, bits=3)).collect()}
    assert got[1][1] and not got[2][1]     # first kept, dup dropped
    assert got[3][1] and got[4][1]
    assert got[1][0] == got[2][0] != got[3][0]


def test_semdedup_threshold_and_custom_cells(spark):
    from xapian_spark.pipeline.similarity import semdedup

    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])]
    df = _emb_df(spark, rows)
    one_cell = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "vec_id long, cell int")
    strict = {r.vec_id: r.keep for r in
              semdedup(df, 0.999, cells=one_cell).collect()}
    assert strict == {1: True, 2: True, 3: True}
    loose = {r.vec_id: r.keep for r in
             semdedup(df, 0.9, cells=one_cell).collect()}
    assert loose == {1: True, 2: False, 3: True}


def test_semdedup_mirror_brute_force(spark):
    import math

    from xapian_spark.pipeline.similarity import semdedup, sign_cells

    rows = [(i, [math.cos(i * 0.37), math.sin(i * 0.37),
                 (i % 5 - 2) / 3.0]) for i in range(30)]
    rows = [(i, [float(x) for x in v]) for i, v in rows]
    df = _emb_df(spark, rows)
    got = {r.vec_id: r.keep for r in
           semdedup(df, 0.97, cells=sign_cells(df, bits=3)).collect()}

    import numpy as np
    vecs = {i: np.array(v, dtype=np.float32) for i, v in rows}
    cell = {i: sum(1 << b for b in range(3) if vecs[i][b] >= 0)
            for i in vecs}
    want = {}
    for i in sorted(vecs):
        dup = any(
            j < i and cell[j] == cell[i]
            and round(float(np.dot(vecs[i].astype(np.float64),
                                   vecs[j].astype(np.float64))
                      / (np.linalg.norm(vecs[i].astype(np.float64))
                         * np.linalg.norm(vecs[j].astype(np.float64)))),
                      6) >= 0.97
            for j in vecs)
        want[i] = not dup
    assert got == want


def test_semdedup_replicated_and_missing_cells(spark):
    from xapian_spark.pipeline.similarity import semdedup

    rows = [(1, [1.0, 0.0]), (2, [0.99, 0.05]), (3, [0.0, 1.0])]
    df = _emb_df(spark, rows)
    # vec 1 replicated into cells 0 and 1; vec 2 only in cell 1 (still
    # meets vec 1 there); vec 3 absent from the assignment entirely
    cells = spark.createDataFrame(
        [(1, 0), (1, 1), (2, 1)], "vec_id long, cell int")
    got = {r.vec_id: (r.cell, r.keep) for r in
           semdedup(df, 0.9, cells=cells).collect()}
    assert len(got) == 3                      # one row per input row
    assert got[1] == (0, True)                # min cell reported
    assert got[2] == (1, False)               # caught in the shared cell
    assert got[3] == (None, True)             # unassigned -> survives


def test_sign_cells_short_vector_zero_bits(spark):
    from xapian_spark.pipeline.similarity import sign_cells

    df = _emb_df(spark, [(1, [1.0, 1.0])])
    got = sign_cells(df, bits=4).collect()[0]
    assert got.cell == 0b0011                 # missing dims -> 0 bits
