"""Fixed-point PageRank: exact agreement with a pure-Python mirror of
the integer semantics, determinism, dangling handling, degree stats."""

import pytest

from xapian_spark.pipeline.graph import degree_stats, pagerank

SCALE = 10 ** 12


def _py_pagerank(edges, iters=10, num=85, den=100, scale=SCALE):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = ((den - num) * scale // den) // n
    r = {v: scale // n for v in nodes}
    for _ in range(iters):
        insum = {v: 0 for v in nodes}
        for s, d in edges:
            insum[d] += r[s] // outdeg[s]
        dang = sum(r[v] for v in nodes if v not in outdeg)
        r = {v: base + (num * (insum[v] + dang // n)) // den
             for v in nodes}
    return r


@pytest.fixture(scope="module")
def toy_edges():
    # 8 nodes: a hub (0), a cycle (1→2→3→1), a dangling sink (7)
    return [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (3, 1),
            (4, 0), (5, 0), (6, 0), (1, 7), (2, 7)]


def test_matches_python_mirror_exactly(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    got = {r["node"]: r["rank_units"]
           for r in pagerank(df, iters=10).collect()}
    assert got == _py_pagerank(toy_edges, iters=10)


def test_deterministic_across_partitionings(spark, toy_edges):
    df1 = spark.createDataFrame(toy_edges, "src long, dst long")
    df2 = df1.repartition(7, "dst")
    a = sorted((r["node"], r["rank_units"])
               for r in pagerank(df1, iters=6).collect())
    b = sorted((r["node"], r["rank_units"])
               for r in pagerank(df2, iters=6).collect())
    assert a == b  # int64 arithmetic → partitioning-independent


def test_hub_outranks_leaves(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    got = {r["node"]: r["rank_units"]
           for r in pagerank(df, iters=10).collect()}
    # 0 has 3 in-edges from dedicated pointers; 4,5,6 have none
    assert got[0] > got[4] == got[5] == got[6]
    # the sink (7) collects from 1 and 2
    assert got[7] > got[4]


def test_mass_approximately_conserved(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    rows = pagerank(df, iters=10).collect()
    total = sum(r["rank_units"] for r in rows)
    # floor division sheds at most a few units per node per step
    assert SCALE * 0.999 <= total <= SCALE
    for r in rows:
        assert abs(r["rank"] - r["rank_units"] / SCALE) < 1e-15


def test_iters_validation(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(df, iters=0)
    with pytest.raises(ValueError):
        pagerank(df, damping_num=0)


def test_degree_stats(spark, toy_edges):
    df = spark.createDataFrame(toy_edges, "src long, dst long")
    got = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_stats(df).collect()}
    assert got[0] == (3, 3)
    assert got[7] == (0, 2)   # dangling sink
    assert got[4] == (1, 0)   # source-only node
