"""PageRank parity vs an in-process power iteration (float accumulation
isn't hash-portable, so the registry entry is rows-only and this is the
correctness evidence)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators.pagerank import pagerank

EDGES = [
    (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 -> 3, 3 <-> 1 cycle
    (5, 1),  # 5 feeds 1; node 6 appears only as a destination (dangling)
    (2, 6),
]


def _ref_pagerank(edges, damping=0.85, n_iter=10):
    nodes = sorted({u for e in edges for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for u, _ in edges:
        out[u] += 1
    rank = [1.0 / n] * n
    for _ in range(n_iter):
        new = [0.0] * n
        for u, v in edges:
            new[idx[v]] += rank[idx[u]] / out[u]
        dm = sum(rank[idx[v]] for v in nodes if out[v] == 0)
        rank = [
            (1 - damping) / n + damping * (x + dm / n) for x in new
        ]
    return {v: rank[idx[v]] for v in nodes}


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, n_iterations=10).collect()}
    want = _ref_pagerank(EDGES, n_iter=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_sink_accumulates(spark):
    # a pure sink fed by everyone outranks the feeders
    df = spark.createDataFrame([(1, 9), (2, 9), (3, 9)], "src int, dst int")
    got = {r.node: r.rank for r in pagerank(df, n_iterations=8).collect()}
    assert got[9] > got[1] == got[2] == got[3]


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src int, dst int")
    assert pagerank(df).collect() == []


def test_weighted_collapse_equals_multi_edges(spark):
    """Pre-aggregating multi-edges to (src, dst, weight) must give the
    same ranks as the raw edge log — the identity that justifies
    collapsing a fact-sized edge log before iterating."""
    import pyspark.sql.functions as F

    multi = EDGES + [(1, 2), (1, 2), (4, 3)]  # repeated edges = weights
    raw = spark.createDataFrame(multi, "src int, dst int")
    collapsed = raw.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))
    a = {r.node: r.rank for r in pagerank(raw, n_iterations=6).collect()}
    b = {
        r.node: r.rank
        for r in pagerank(collapsed, n_iterations=6, weight="w").collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert a[v] == pytest.approx(b[v], rel=1e-12), v
