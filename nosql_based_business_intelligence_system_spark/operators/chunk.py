"""Overlapping token-window document chunking (RAG/embedding prep).

Splits each document into fixed-size token windows with a configurable
overlap — the standard retrieval-corpus preparation step before embedding.
Pure column expressions: tokenize, compute window starts with
``sequence``, slice per start. Narrow until the final explode; no
shuffle, no UDF — at 100 TB this is a map-only stage that parallelizes
with the input partitioning.

No counterpart in the reference (`Project.py` has no text pipeline);
north-star LLM-pipeline scope alongside packing/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    content_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: (id, chunk_id, start_token, n_chunk_tokens,
    chunk_text).

    Windows start every ``stride = chunk_tokens - overlap_tokens`` tokens;
    the chunk count is ``max(1, ceil((n - overlap) / stride))`` for a
    nonempty doc, so the final window is emitted even when short and a doc
    shorter than the overlap still yields its single (partial) chunk —
    dropping short docs here would silently shrink the corpus.
    Empty/whitespace docs produce zero chunks.
    """
    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError(
            f"overlap_tokens ({overlap_tokens}) must be smaller than "
            f"chunk_tokens ({chunk_tokens})"
        )
    toks = df.select(
        F.col(id_col), T.tokens(F.col(content_col)).alias("toks")
    ).withColumn(
        "n_chunks",
        F.when(F.size("toks") == 0, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(1),
                F.ceil(
                    (F.size("toks") - overlap_tokens) / float(stride)
                ).cast("int"),
            )
        )
        .cast("int"),
    )
    starts = F.when(
        F.col("n_chunks") > 0,
        F.transform(
            F.sequence(F.lit(0), F.col("n_chunks") - 1),
            lambda i: i * stride,
        ),
    ).otherwise(F.array().cast("array<int>"))
    ex = toks.select(
        id_col,
        "toks",
        F.posexplode(starts).alias("chunk_id", "start_token"),
    )
    piece = F.slice("toks", F.col("start_token") + 1, chunk_tokens)
    return ex.select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("start_token").cast("bigint").alias("start_token"),
        F.size(piece).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def dd_chunk_documents(
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    table: str = "documents",
    content_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents` (same window arithmetic)."""
    stride = chunk_tokens - overlap_tokens
    toks = T.dd_tokens(content_col)
    return f"""WITH t AS (
  SELECT {id_col}, {toks} AS toks,
    CASE WHEN len({toks}) = 0 THEN 0
         ELSE greatest(1, CAST(ceil((len({toks}) - {overlap_tokens})
                / {stride}.0) AS INT))
    END AS n_chunks
  FROM {table}
), ex AS (
  SELECT {id_col}, toks,
    CAST(i - 1 AS BIGINT) AS chunk_id,
    CAST((i - 1) * {stride} AS BIGINT) AS start_token
  FROM t, LATERAL (SELECT unnest(range(1, n_chunks + 1)) AS i)
)
SELECT {id_col}, chunk_id, start_token,
  CAST(len(toks[start_token + 1 : start_token + {chunk_tokens}]) AS BIGINT)
    AS n_chunk_tokens,
  array_to_string(toks[start_token + 1 : start_token + {chunk_tokens}], ' ')
    AS chunk_text
FROM ex"""
