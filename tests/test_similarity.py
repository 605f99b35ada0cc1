"""Similarity-search tests: exact brute force on handmade vectors, recall of
the approximate (LSH / IVF) paths against brute-force ground truth."""

from __future__ import annotations

import math

import pytest
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


def test_rp_bucket_recall_on_fixture(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.rp_bucket_topk(
        emb, queries, k=10, dim=64, n_tables=8, bucket_length=4.0
    ).collect()
    assert _recall(approx, exact) >= 0.5, "RP-bucket recall collapsed"


def test_rp_bucket_scores_are_exact(spark, sf_smoke):
    """Bucketing prunes candidates; every emitted score must equal the
    brute-force cosine for that pair (never an approximated value).
    Brute-force runs with k = corpus size so EVERY pair's exact score is
    present — a capped top-k dict would KeyError (not meaningfully fail)
    on an RP candidate ranked below the cap (r4 advisory)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 3")
    exact = {
        (r.query_id, r.neighbor_id): r.score
        for r in similarity.brute_force_topk(
            emb, queries, k=emb.count()
        ).collect()
    }
    got = similarity.rp_bucket_topk(
        emb, queries, k=10, dim=64, n_tables=8, bucket_length=4.0
    ).collect()
    assert got, "RP-bucket returned no pairs"
    for r in got:
        assert exact[(r.query_id, r.neighbor_id)] == r.score


def test_rp_bucket_raises_on_wrong_dim(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0])])
    with pytest.raises(Exception, match="expected dim"):
        similarity.rp_bucket_topk(df, df, k=1, dim=64).collect()
    with pytest.raises(Exception, match="expected dim"):
        similarity.rp_bucket_topk(
            df, df, k=1, dim=64, arrow_keys=True
        ).collect()


def test_rp_bucket_arrow_keys_bit_identical(spark, sf_smoke):
    """The Arrow key path (sequential-accumulation numpy) must produce
    BIT-IDENTICAL bucket keys to the fold expression — same IEEE ops in
    the same left-to-right order, not epsilon-close (a flipped key on a
    floor boundary silently changes the candidate set and breaks the
    DuckDB twin). Also pins full end-to-end result equality, floats
    compared exactly."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")

    expr = similarity.rp_bucket_topk(
        emb, queries, k=10, dim=64, n_tables=8, bucket_length=4.0
    ).collect()
    arrow = similarity.rp_bucket_topk(
        emb, queries, k=10, dim=64, n_tables=8, bucket_length=4.0,
        arrow_keys=True,
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    e = {key(r): (r.neighbor_id, r.score) for r in expr}
    a = {key(r): (r.neighbor_id, r.score) for r in arrow}
    assert e == a

    # planted floor-boundary case: projections land exactly on integer
    # multiples of bucket_length (+-1 planes, +-0.5/+-1.0 components),
    # where any accumulation-order drift would flip the floor
    rows = [
        Row(vec_id=100 + i, embedding=[0.5 if j % 2 else -0.5
                                       for j in range(64)])
        for i in range(4)
    ] + [
        Row(vec_id=200 + i, embedding=[1.0] * 64) for i in range(4)
    ]
    df = spark.createDataFrame(rows)
    e2 = similarity.rp_bucket_topk(
        df, df.filter("vec_id < 102"), k=3, dim=64, n_tables=8,
        bucket_length=4.0,
    ).collect()
    a2 = similarity.rp_bucket_topk(
        df, df.filter("vec_id < 102"), k=3, dim=64, n_tables=8,
        bucket_length=4.0, arrow_keys=True,
    ).collect()
    e2m = {key(r): (r.neighbor_id, r.score) for r in e2}
    a2m = {key(r): (r.neighbor_id, r.score) for r in a2}
    assert e2m == a2m and e2m


def test_rp_bucket_arrow_keys_falls_back_on_non_integral_ids(spark):
    """String ids can't ride the Arrow int64 contract; arrow_keys=True
    must DECLINE to the expression plan (same stance as the query-budget
    overflow path, ADVICE r8), not hard-fail."""
    rows = [
        Row(vec_id=f"id{i}", embedding=[float((i * 7 + j) % 5 - 2)
                                        for j in range(64)])
        for i in range(6)
    ]
    df = spark.createDataFrame(rows)
    expr = similarity.rp_bucket_topk(
        df, df, k=3, dim=64, bucket_length=4.0
    ).collect()
    arrow = similarity.rp_bucket_topk(
        df, df, k=3, dim=64, bucket_length=4.0, arrow_keys=True
    ).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert {key(r): (r.neighbor_id, r.score) for r in arrow} == {
        key(r): (r.neighbor_id, r.score) for r in expr
    }


def test_brute_force_arrow_nan_component_parity(spark):
    """A non-NULL corpus vector CONTAINING a NaN component scores NaN on
    the expression path, and Spark orders NaN larger than any value — so
    `desc` ranks it FIRST. The Arrow selection must force-keep such rows
    as candidates (ADVICE r8: it used to map them to -inf and drop them
    whenever a batch had >=k finite candidates) so both plans agree."""
    rows = [
        Row(vec_id=i, embedding=[float((i * 3 + j) % 7 - 3)
                                 for j in range(8)])
        for i in range(20)
    ] + [Row(vec_id=99, embedding=[float("nan")] + [1.0] * 7)]
    df = spark.createDataFrame(rows)
    q = df.filter("vec_id = 0")
    expr = similarity.brute_force_topk(df, q, k=3, dim=8, arrow=False)
    arrow = similarity.brute_force_topk(df, q, k=3, dim=8, arrow=True)
    e = sorted(expr.collect(), key=lambda r: r.rank)
    a = sorted(arrow.collect(), key=lambda r: r.rank)
    assert [r.neighbor_id for r in e] == [r.neighbor_id for r in a]
    # NaN score sorts first under desc on BOTH plans
    assert e[0].neighbor_id == 99 and math.isnan(e[0].score)
    assert math.isnan(a[0].score)
    for re_, ra in zip(e[1:], a[1:]):
        assert re_.score == ra.score


def test_ivf_portable_mode_recall(spark, sf_smoke):
    """refine_iterations=0 (the oracle-checked registry mode): centroids
    are md5-chosen corpus rows; recall must stay useful."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.ivf_topk(
        emb, queries, k=10, n_cells=16, n_probe=4, refine_iterations=0
    ).collect()
    assert _recall(approx, exact) >= 0.4, "portable-IVF recall collapsed"


def test_ivf_recall_on_fixture(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    approx = similarity.ivf_topk(emb, queries, k=10, n_cells=8, n_probe=4).collect()
    # hash-stratified seeds + one Lloyd step measure 0.68 here (0.82 at
    # sf0.01); the old lowest-id seeds sat at 0.3
    assert _recall(approx, exact) >= 0.6, "IVF recall collapsed"


def test_ivf_assignment_covers_corpus(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    assignments, centroids = similarity.ivf_assign(emb, n_cells=8)
    assert assignments.count() == emb.count()
    assert centroids.count() == 8
    # every vector lands in exactly one cell
    assert assignments.select("vec_id").distinct().count() == emb.count()


def test_cosine_pairs_exact_on_planted_dups(spark, sf_smoke):
    """Planted exact duplicates must surface with score ~1.0."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke, "embeddings").filter("vec_id < 50")
    planted = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    pairs = similarity.cosine_pairs(emb.unionByName(planted), threshold=0.99)
    found = {(r.id_a, r.id_b): r.score for r in pairs.collect()}
    for i in range(3):
        assert abs(found[(i, i + 10_000)] - 1.0) < 1e-9


def test_embedding_lsh_dupes_find_planted(spark, sf_smoke):
    """Sign-LSH near-dup path: every planted exact dup must be recalled
    (identical vectors share every band key by construction)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_smoke, "embeddings").filter("vec_id < 50")
    planted = emb.filter("vec_id < 5").select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    pairs = similarity.embedding_cosine_dupes(
        emb.unionByName(planted), threshold=0.99, n_planes=64, bands=4
    )
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(i, i + 10_000) for i in range(5)} <= found


def test_embedding_lsh_no_false_positives_above_threshold(spark, sf_smoke):
    """Every reported pair's score must actually clear the threshold
    (LSH prunes candidates; it must never inflate scores)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    pairs = similarity.embedding_cosine_dupes(
        emb, threshold=0.3, n_planes=16, bands=4
    ).collect()
    exact = {
        (r.id_a, r.id_b): r.score
        for r in similarity.cosine_pairs(emb, threshold=0.3).collect()
    }
    for r in pairs:
        assert r.score >= 0.3
        assert abs(exact[(r.id_a, r.id_b)] - r.score) < 1e-9


def test_cosine_pairs_input_cap_raises(spark):
    from pyspark.sql import Row

    from nosql_based_business_intelligence_system_spark.operators.similarity import cosine_pairs

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, float(i)]) for i in range(12)]
    )
    with pytest.raises(ValueError, match="embedding_cosine_dupes"):
        cosine_pairs(df, threshold=0.9, max_rows=10)
    # within the cap it still works
    assert cosine_pairs(df, threshold=0.99, max_rows=100).count() > 0


def test_pq_arrow_path_bit_identical(spark, sf_smoke):
    """The r8 Arrow splits (encode candidate proposal + ADC per-batch
    selection) and the two-stage bottom-k codebook seeding must leave
    every emitted value identical to the expression plan — the exact
    fold expressions remain the decider on both paths."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    kw = dict(k=10, m=4, k_codes=32, refine_iterations=0, rerank_factor=8)
    expr = similarity.pq_topk(emb, queries, **kw).collect()
    arrow = similarity.pq_topk(emb, queries, arrow=True, **kw).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    e = {key(r): (r.neighbor_id, r.score) for r in expr}
    a = {key(r): (r.neighbor_id, r.score) for r in arrow}
    assert e == a and e

    # Lloyd-refined trainers (refine_iterations>0) are NOT bit-pinned
    # across plan shapes: F.avg over members is accumulation-order-
    # sensitive, so centroids drift at the last ulp whenever the physical
    # plan changes (measured: 32/32 codebook rows differ at 1 ulp between
    # the arrow and expression encode plans, while refine=0 — the
    # registry contract — is exactly equal). The float-trained variant
    # keeps recall coverage (test_pq_recall_on_fixture); assert here only
    # that the arrow trainer runs and ranks validly.
    kw2 = dict(k=5, m=4, k_codes=8, refine_iterations=1, rerank_factor=0)
    a2 = similarity.pq_topk(emb, queries, arrow=True, **kw2).collect()
    assert len(a2) == 5 * 5
    assert all(1 <= r.rank <= 5 for r in a2)


def test_pq_arrow_rejects_non_integral_ids(spark):
    df = spark.createDataFrame(
        [Row(vec_id="x", embedding=[1.0, 0.0, 0.0, 0.0])]
    )
    with pytest.raises(TypeError, match="integral id"):
        similarity.pq_train_encode(df, m=4, k_codes=2, arrow_assign=True)


# --- SemDeDup ----------------------------------------------------------------


def test_semantic_dedup_drops_planted_dupes(spark):
    # 1001/2001 are near-copies of 0/2; keep-min-id must drop exactly them.
    vecs = VECS + [
        Row(vec_id=1001, embedding=[0.999, 0.001, 0.0]),
        Row(vec_id=2001, embedding=[0.0, 0.998, 0.002]),
    ]
    df = spark.createDataFrame(vecs)
    kept = similarity.semantic_dedup_keep(
        df, n_cells=2, threshold=0.99, refine_iterations=1
    )
    ids = sorted(r.vec_id for r in kept.collect())
    assert 1001 not in ids and 2001 not in ids
    assert set(ids) >= {0, 2, 4}


def test_semantic_dedup_kept_set_invariant(spark, sf_smoke):
    # No two survivors in the same cell may score >= threshold.
    emb = load_table(spark, sf_smoke, "embeddings").filter("vec_id < 200")
    kept = similarity.semantic_dedup_keep(emb, n_cells=4, threshold=0.35)
    viol = similarity.semantic_dedup_pairs(kept, n_cells=4, threshold=0.35)
    # pairs() reclusters; the invariant is per-cell of the ORIGINAL run, so
    # check the stronger global form on the small fixture: recompute exact
    # cosine over survivors of each original cell.
    from nosql_based_business_intelligence_system_spark.operators.similarity import ivf_assign
    from nosql_based_business_intelligence_system_spark.functions import vectors as V
    import pyspark.sql.functions as F

    assignments, _ = ivf_assign(emb, n_cells=4)
    surv = assignments.join(kept.select("vec_id"), "vec_id")
    a = surv.select("cell", F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = surv.select("cell", F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    n_bad = (
        a.join(b, "cell")
        .filter(F.col("ia") < F.col("ib"))
        .filter(V.cosine(F.col("va"), F.col("vb")) >= 0.35)
        .count()
    )
    assert n_bad == 0
    assert viol is not None  # exercised the pairs path too


# --- PQ-ANN ------------------------------------------------------------------


def test_pq_recall_on_fixture(spark, sf_smoke):
    # Random embeddings are PQ's worst case (no cluster structure): plain
    # ADC recall is weak by construction; the exact-rerank stage is the
    # production shape and must recover most of it.
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter("vec_id < 5")
    exact = similarity.brute_force_topk(emb, queries, k=10).collect()
    adc = similarity.pq_topk(
        emb, queries, k=10, m=4, k_codes=32, refine_iterations=2
    ).collect()
    assert _recall(adc, exact) >= 0.1, "plain ADC recall collapsed"
    reranked = similarity.pq_topk(
        emb, queries, k=10, m=4, k_codes=32, refine_iterations=2,
        rerank_factor=8,
    ).collect()
    assert _recall(reranked, exact) >= 0.5, "reranked PQ recall collapsed"


def test_pq_exact_when_codebook_saturates(spark):
    # 4 distinct vectors, k_codes=8 >= distinct subvectors per subspace:
    # quantization is lossless, so PQ ranking == brute-force ranking.
    vecs = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0, 0.1]),
        Row(vec_id=2, embedding=[0.0, 1.0, 0.2, 0.0]),
        Row(vec_id=3, embedding=[0.1, 0.0, 1.0, 0.3]),
    ]
    df = spark.createDataFrame(vecs)
    q = df.filter("vec_id = 0")
    exact = {
        r.neighbor_id: r.rank
        for r in similarity.brute_force_topk(df, q, k=3).collect()
    }
    pq = {
        r.neighbor_id: r.rank
        for r in similarity.pq_topk(
            df, q, k=3, m=2, k_codes=8, refine_iterations=0
        ).collect()
    }
    assert pq == exact


def test_pq_raises_on_indivisible_dim(spark):
    df = spark.createDataFrame([Row(vec_id=0, embedding=[1.0, 0.0, 0.0])])
    with pytest.raises(Exception, match="divisible"):
        similarity.pq_train_encode(df, m=2, k_codes=2)[0].collect()


def test_nearest_cell_arrow_matches_crossjoin(spark, sf_correctness):
    """The large-K Arrow assignment path (numpy proposes candidate cells,
    exact expression + min_by disposes) must assign every vector to the
    SAME cell as the crossJoin plan — the sf100 hazard fix
    (K x corpus row blowup) is a plan change, never a result change."""
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.functions import vectors as V
    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    emb = load_table(spark, sf_correctness, "embeddings")
    c = emb.select(F.col("vec_id"), V.as_double(F.col("embedding")).alias("v"))
    _, cents = similarity.ivf_assign(emb, 100, refine_iterations=0)
    arrow = similarity._nearest_cell_arrow(c, cents, "vec_id", 64).select(
        "vec_id", "cell"
    )
    old_k = similarity._NEAREST_CELL_ARROW_K
    similarity._NEAREST_CELL_ARROW_K = 10**9  # force the crossJoin plan
    try:
        cross = similarity._nearest_cell(c, cents, "vec_id", 64).select(
            "vec_id", "cell"
        )
        assert arrow.exceptAll(cross).count() == 0
        assert cross.exceptAll(arrow).count() == 0
    finally:
        similarity._NEAREST_CELL_ARROW_K = old_k


def test_pair_disk_guard_fires_in_sign_lsh(spark):
    """r10 verdict item 5: identical vectors key one giant band bucket in
    every band; the guard must price d*(d-1)/2 per bucket and fail fast
    before the self-join, and be a pure no-op at the default budget."""
    from pyspark.sql import Row

    from nosql_based_business_intelligence_system_spark.operators.dedup import (
        PairExplosionError,
    )

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(80)]
    )
    with pytest.raises(PairExplosionError, match="max_ids_per_band_key"):
        similarity.embedding_cosine_dupes(
            df, threshold=0.9, n_planes=16, bands=4, disk_guard=True,
            pair_disk_budget=1024,
        ).count()
    # default budget: no-op, all pairs surface (identical vectors)
    assert (
        similarity.embedding_cosine_dupes(
            df, threshold=0.9, n_planes=16, bands=4, disk_guard=True
        ).count()
        == 80 * 79 // 2
    )


def test_sign_lsh_band_key_cap_bounds_bucket(spark):
    """r10 ADVICE: the lever the guard names must exist and actually
    bound the bucket. 80 identical vectors fill ONE (band, key) bucket
    per band; a cap below 80 drops those buckets, so (a) the guard's
    post-cap price passes the same 1 KB budget that fails uncapped, and
    (b) zero pairs survive (the drop is a recall loss, by contract)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0, 2.0, 3.0, 4.0]) for i in range(80)]
    )
    capped = similarity.embedding_cosine_dupes(
        df, threshold=0.9, n_planes=16, bands=4, disk_guard=True,
        pair_disk_budget=1024, max_ids_per_band_key=5,
    )
    assert capped.count() == 0
    # cap above the bucket size: candidates unaffected
    uncut = similarity.embedding_cosine_dupes(
        df, threshold=0.9, n_planes=16, bands=4,
        max_ids_per_band_key=200,
    )
    assert uncut.count() == 80 * 79 // 2
