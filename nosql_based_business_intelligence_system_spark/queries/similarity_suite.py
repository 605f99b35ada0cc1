"""Similarity-search suite over the ``embeddings`` table (north-star scope).

Brute-force cosine top-k is oracle-checked (DuckDB list_inner_product over
DOUBLE[] folds left-to-right like Spark's aggregate, so scores are
bit-comparable). LSH and IVF variants are approximate -> rows-only, with
recall-vs-brute-force covered in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import vectors as V
from ..operators import similarity
from ..sources.tables import load_table
from .base import Query as _q

N_QUERY_VECS = 5
TOP_K = 10


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors for the first 5 vectors (by id)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.brute_force_topk(emb, queries, k=TOP_K)


_Q = V.dd_vec("q.embedding")
_C = V.dd_vec("c.embedding")

ANN_BRUTEFORCE_TOPK_SQL = f"""SELECT query_id, neighbor_id, score, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {V.dd_cosine(_Q, _C)} AS score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {V.dd_cosine(_Q, _C)} DESC, c.vec_id ASC) AS BIGINT) AS rank
  FROM embeddings q
  CROSS JOIN embeddings c
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
) WHERE rank <= {TOP_K}"""


def ann_nearest_same_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-filtered exact 1-NN: nearest same-label neighbor per query —
    predicate composes with the scoring cross join before ranking."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        V.as_double(F.col("embedding")).alias("qv"),
        F.col("label").alias("qlabel"),
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        V.as_double(F.col("embedding")).alias("cv"),
        F.col("label").alias("clabel"),
    )
    from pyspark.sql import Window

    scored = (
        corpus.crossJoin(F.broadcast(queries))
        .filter(
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("qlabel") == F.col("clabel"))
        )
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") == 1)
        .drop("rank")
    )


ANN_NEAREST_SAME_LABEL_SQL = f"""SELECT query_id, neighbor_id, score FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {V.dd_cosine(_Q, _C)} AS score,
         ROW_NUMBER() OVER (
           PARTITION BY q.vec_id
           ORDER BY {V.dd_cosine(_Q, _C)} DESC, c.vec_id ASC) AS rank
  FROM embeddings q
  CROSS JOIN embeddings c
  WHERE q.vec_id < {N_QUERY_VECS} AND q.vec_id <> c.vec_id
    AND q.label = c.label
) WHERE rank = 1"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding norm statistics — vector fold + grouped agg."""
    emb = _emb(spark, sf_dir)
    v = V.as_double(F.col("embedding"))
    return (
        emb.select("label", V.norm(v).alias("nrm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.avg("nrm").alias("avg_norm"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


EMBEDDING_NORM_STATS_SQL = f"""SELECT label,
  CAST(COUNT(*) AS BIGINT) AS n_vecs,
  AVG(nrm) AS avg_norm, MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
FROM (
  SELECT label,
         sqrt(list_inner_product({V.dd_vec('embedding')}, {V.dd_vec('embedding')})) AS nrm
  FROM embeddings
) GROUP BY label"""


def embedding_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function sweep per label: first/last component means, mean of
    per-vector max/min (element_at / array_max / array_min — all JVM-side),
    the column-wise sanity screen for an embedding corpus."""
    emb = _emb(spark, sf_dir)
    v = V.as_double(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.avg(F.element_at(v, 1)).alias("avg_first"),
        F.avg(F.element_at(v, -1)).alias("avg_last"),
        F.avg(F.array_max(v)).alias("avg_max"),
        F.avg(F.array_min(v)).alias("avg_min"),
        F.avg(F.size(v)).alias("avg_dim"),
    )


_E = V.dd_vec("embedding")

EMBEDDING_COMPONENT_STATS_SQL = f"""SELECT label,
  AVG({_E}[1]) AS avg_first,
  AVG({_E}[len({_E})]) AS avg_last,
  AVG(list_aggregate({_E}, 'max')) AS avg_max,
  AVG(list_aggregate({_E}, 'min')) AS avg_min,
  AVG(len({_E})) AS avg_dim
FROM embeddings GROUP BY label"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate LSH-bucketed top-10 (rows-only; recall tested in pytest)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.lsh_topk(emb, queries, k=TOP_K)


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat coarse-quantized top-10 (rows-only; recall tested in pytest)."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.ivf_topk(emb, queries, k=TOP_K, n_cells=16, n_probe=4)


#: Exact near-pair query is bounded to this id range so the all-pairs join
#: stays quadratic-in-a-constant at every sf (the LSH variant is unbounded).
NEAR_PAIR_ID_BOUND = 1000
NEAR_PAIR_THRESHOLD = 0.35


def embedding_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding-cosine near-dup pairs over a bounded id range —
    the oracle-checkable baseline for the LSH near-dup path."""
    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < NEAR_PAIR_ID_BOUND)
    return similarity.cosine_pairs(emb, threshold=NEAR_PAIR_THRESHOLD)


_A = V.dd_vec("a.embedding")
_B = V.dd_vec("b.embedding")

EMBEDDING_NEAR_PAIRS_SQL = f"""SELECT id_a, id_b, score FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {V.dd_cosine(_A, _B)} AS score
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < {NEAR_PAIR_ID_BOUND} AND b.vec_id < {NEAR_PAIR_ID_BOUND}
) WHERE score >= {NEAR_PAIR_THRESHOLD}"""


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH embedding near-dup pairs over the full table (the
    100 TB path; candidates from sign-LSH band buckets). The fixture
    embeddings are near-orthogonal (max pairwise cosine ~0.48), so this
    legitimately returns zero rows at a dedup threshold — planted-duplicate
    recall is covered in tests/test_similarity.py. Fully oracle-checked:
    the Rademacher planes are md5-derived literals the generated DuckDB
    twin inlines, and candidate scores use the proven-portable
    inner-product cosine."""
    return similarity.embedding_cosine_dupes(
        _emb(spark, sf_dir), threshold=0.9, n_planes=64, bands=4
    )


def _dd_embedding_cosine_sql(
    threshold: float = 0.9, n_planes: int = 64, bands: int = 4,
    seed: int = 42, dim: int = 64,
) -> str:
    """Generated DuckDB twin of similarity.embedding_cosine_dupes at the
    registry parameters: the +-1 plane matrix (similarity.sign_planes) is
    inlined as signed terms per projection, band keys assemble the same
    sign bits, and candidates score with the portable fold cosine. The
    fixture embedding dim (64) is baked in — a dim change shows up as a
    NULL-projection row-count mismatch, not silence."""
    planes = similarity.sign_planes(seed, dim, n_planes)
    r = n_planes // bands

    def proj(p: int) -> str:
        return "(" + "".join(
            ("+" if planes[d, p] > 0 else "-") + f"v[{d + 1}]"
            for d in range(dim)
        ) + ")"

    def band_key(b: int) -> str:
        return " + ".join(
            f"(CASE WHEN {proj(b * r + j)} > 0 THEN {1 << j}::BIGINT "
            "ELSE 0::BIGINT END)"
            for j in range(r)
        )

    band_selects = "\n  UNION ALL ".join(
        f"SELECT id, v, {i} AS band, ({band_key(i)}) AS key FROM vecs"
        for i in range(bands)
    )
    return f"""WITH vecs AS MATERIALIZED (
  SELECT vec_id AS id, {V.dd_vec('embedding')} AS v FROM embeddings
), bands AS MATERIALIZED (
  {band_selects}
), cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.v AS va, b.v AS vb
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.id < b.id
)
SELECT id_a, id_b, {V.dd_cosine('va', 'vb')} AS score
FROM cand WHERE {V.dd_cosine('va', 'vb')} >= {threshold}"""


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC top-10 with exact rerank (rows-only; recall tested in
    pytest). Candidate stage scans only the m-byte code column."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERY_VECS)
    return similarity.pq_topk(
        emb, queries, k=TOP_K, m=4, k_codes=32, refine_iterations=1,
        rerank_factor=8,
    )


def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep-set over the embeddings table (rows-only; the IVF
    cluster step isn't SQL-portable — kept-set invariants tested in
    pytest). Threshold matches the exact near-pair query so survivors
    drop the same planted neighborhood structure."""
    return similarity.semantic_dedup_keep(
        _emb(spark, sf_dir), n_cells=16, threshold=NEAR_PAIR_THRESHOLD
    ).select("vec_id", "label")


QUERIES = {
    "ann_bruteforce_topk": _q(ann_bruteforce_topk, ANN_BRUTEFORCE_TOPK_SQL),
    "ann_pq_topk": _q(ann_pq_topk, None),
    "semantic_dedup_survivors": _q(semantic_dedup_survivors, None),
    "embedding_near_pairs": _q(embedding_near_pairs, EMBEDDING_NEAR_PAIRS_SQL),
    "dedup_embedding_cosine": _q(
        dedup_embedding_cosine, _dd_embedding_cosine_sql()
    ),
    "ann_nearest_same_label": _q(ann_nearest_same_label, ANN_NEAREST_SAME_LABEL_SQL),
    "embedding_norm_stats": _q(embedding_norm_stats, EMBEDDING_NORM_STATS_SQL),
    "embedding_component_stats": _q(
        embedding_component_stats, EMBEDDING_COMPONENT_STATS_SQL
    ),
    "ann_lsh_topk": _q(ann_lsh_topk, None),
    "ann_ivf_topk": _q(ann_ivf_topk, None),
}
