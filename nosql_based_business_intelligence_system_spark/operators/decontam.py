"""Benchmark decontamination: flag training documents sharing any n-word
shingle with an evaluation/benchmark corpus (the standard 13-gram-overlap
rule used by large-scale LM training pipelines).

North-star scope — not in the reference (a pandas BI script,
``Project.py``); this is part of the training-data-pipeline extension
surface SURVEY.md §2.9 prescribes.

Scale stance: contamination detection is a key-partitioned join on the
64-bit shingle hash, never an all-pairs comparison. The eval side of the
join is the (tiny) benchmark corpus — at 100 TB of training data the eval
shingle set is still only millions of rows, so the size-threshold/AQE
broadcast picks it up automatically; we deliberately do NOT force a
broadcast hint so a pathologically large eval set degrades to a shuffle
join instead of an executor OOM (same policy as operators/star.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingle_rows


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_shared_ngrams, n_eval_docs) for every CONTAMINATED
    training doc — one sharing at least one n-word shingle with any eval
    doc.

    Plan: codegen shingling on both sides (:func:`~.dedup.shingle_rows`,
    hashed 64-bit keys), distinct eval shingles, hash-key equi-join,
    one grouped agg per training doc. Shuffle is bounded by the match
    count; the eval side broadcasts when small (threshold/AQE decided).
    """
    tr = shingle_rows(train, content_col, id_col, n).select(
        F.col("doc").alias(id_col), "shingle"
    )
    ev = shingle_rows(eval_docs, content_col, id_col, n).select(
        F.col("doc").alias("__eval_doc"), "shingle"
    )
    return (
        tr.join(ev, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("__eval_doc").alias("n_eval_docs"),
        )
    )


def eval_shingle_set(
    eval_docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """ONE-row frame holding the benchmark's distinct shingle hashes as a
    sorted array — the broadcastable representation for the stateless
    (stream-safe) contamination check. Eval/benchmark corpora are bounded
    (they're test sets), so the array stays small; for a pathologically
    large eval set use the exploded-join path (:func:`ngram_contamination`)
    instead."""
    return (
        shingle_rows(eval_docs, content_col, id_col, n)
        .select("shingle")
        .distinct()
        .agg(F.array_sort(F.collect_list("shingle")).alias("__eval_sh"))
    )


def flag_contaminated(
    docs: DataFrame,
    eval_sh: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Per-doc contamination flag, STATELESS — no aggregation on ``docs``,
    so the same plan runs batch or as a streaming query in append mode
    (stream-static cross join against the 1-row eval set is supported;
    Spark broadcasts the single-row side).

    Shingles come from the in-row :func:`~..functions.text
    .word_shingle_hashes` (no window — windows don't stream); the flag is
    ``size(array_intersect(doc_shingles, eval_shingles)) > 0``.

    Cost model: array_intersect rebuilds the eval probe set PER ROW, so
    each doc pays O(|eval shingles|) — measured 20.9s vs 1.9s for the
    join path at sf0.1 with a 30k-shingle eval side. Use this for live
    streams against modest benchmark sets; batch/backfill should use
    :func:`ngram_contamination` (the registry's doc_contamination_flags
    does, and tests/test_streaming.py proves the two paths agree).
    """
    from ..functions import text as T

    # Project the token array before shingling: word_shingle_hashes'
    # lambda reads ``toks`` via element_at n times per shingle, HOF lambda
    # bodies are outside subexpression elimination, and an inlined
    # tokenizer expression re-runs per reference (r12 lm/dsir finding).
    staged = docs.withColumn(
        "__toks", T.tokens(F.col(content_col))
    ).withColumn("__sh", T.word_shingle_hashes(F.col("__toks"), n))
    return (
        staged.drop("__toks")
        .crossJoin(eval_sh)
        .withColumn(
            "n_shared_ngrams",
            F.size(F.array_intersect(F.col("__sh"), F.col("__eval_sh"))).cast(
                "bigint"
            ),
        )
        .withColumn("is_contaminated", (F.col("n_shared_ngrams") > 0).cast("int"))
        .drop("__sh", "__eval_sh")
    )


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    max_shared: int = 0,
) -> DataFrame:
    """Training docs SURVIVING decontamination (shared n-grams <=
    ``max_shared``; default 0 = any overlap disqualifies). Left-anti join
    against the contaminated set — the write-the-clean-corpus step."""
    hits = ngram_contamination(
        train, eval_docs, content_col, id_col, n
    ).filter(F.col("n_shared_ngrams") > max_shared)
    return train.join(hits.select(id_col), [id_col], "left_anti")
