"""Similarity-search tests: exact brute force on handmade vectors, recall of
the approximate (LSH / IVF) paths against brute-force ground truth."""

from __future__ import annotations

import math

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import similarity
from nosql_based_business_intelligence_system_spark.sources.tables import load_table

VECS = [
    Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
    Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # closest to 0
    Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),   # orthogonal to 0
    Row(vec_id=3, embedding=[0.7, 0.7, 0.0]),   # diagonal
    Row(vec_id=4, embedding=[-1.0, 0.0, 0.0]),  # opposite
]


def _df(spark):
    return spark.createDataFrame(VECS)


def test_brute_force_ordering_and_scores(spark):
    df = _df(spark)
    out = similarity.brute_force_topk(df, df.filter("vec_id = 0"), k=4)
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in rows] == [1, 3, 2, 4]
    assert abs(rows[0].score - 0.9 / math.sqrt(0.82)) < 1e-12
    assert abs(rows[2].score - 0.0) < 1e-12
    assert abs(rows[3].score + 1.0) < 1e-12


def test_brute_force_excludes_self(spark):
    df = _df(spark)
    out = similarity.brute_force_topk(df, df, k=10)
    assert out.filter("query_id = neighbor_id").count() == 0
    # every query gets exactly 4 neighbors (5 vectors, self excluded)
    counts = {r.query_id: r.n for r in out.groupBy("query_id").count().withColumnRenamed("count", "n").collect()}
    assert all(v == 4 for v in counts.values())


def _recall(approx, exact):
    e = {(r.query_id, r.neighbor_id) for r in exact}
    a = {(r.query_id, r.neighbor_id) for r in approx}
    return len(a & e) / len(e)


def test_lsh_recall_on_fixture(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.lsh_topk(
        emb, queries, k=10, num_hash_tables=8, bucket_length=4.0
    ).collect()
    assert _recall(approx, exact) >= 0.5, "LSH recall collapsed"


def test_ivf_recall_on_fixture(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=4).collect()
    assert _recall(approx, exact) >= 0.3, "IVF recall collapsed"


def test_ivf_assignment_covers_corpus(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    assignments, centroids = similarity.ivf_assign(emb, n_cells=8)
    assert assignments.count() == emb.count()
    assert centroids.count() == 8
    # every vector lands in exactly one cell
    assert assignments.select("vec_id").distinct().count() == emb.count()
