"""Corpus shard packing: assign documents to fixed-token-budget shards —
the write-side step of a training-data pipeline (each shard becomes one
output file / training chunk).

Start-offset packing: docs are laid out in a deterministic order and a
doc belongs to shard ``floor(prior_token_count / budget)`` — i.e. the
shard where its start offset lands. Pure window arithmetic (one sort, no
UDF, no driver loop); shards may overflow by at most one document, which
is the standard trade for a single-pass plan.

Scale note: the window partitions by ``group_cols`` (e.g. language), so
one sort task per group — fine while every group fits one executor's
sort spill. At 100 TB, pre-split hot groups into range buckets (by an
approx quantile of the order key) and pack per (group, bucket); the
shard ids then offset by bucket. The operator takes ``group_cols`` as-is
so that pre-split composes from the outside.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def assign_token_shards(
    df: DataFrame,
    tokens: Column,
    order_col: str,
    budget: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Adds ``n_tokens``, ``shard_id`` (0-based per group) to ``df``.

    ``shard_id = floor(prior_cumulative_tokens / budget)`` with the
    cumulative sum taken over ``order_col`` within ``group_cols``.
    """
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(tokens).over(w), F.lit(0))
    return df.withColumn("n_tokens", tokens.cast("bigint")).withColumn(
        "shard_id", F.floor(prior / F.lit(budget)).cast("bigint")
    )


def write_shards(
    df: DataFrame,
    tokens: Column,
    order_col: str,
    budget: int,
    out_dir: str,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Materialize the packed corpus as hive-partitioned parquet
    (``.../group=x/shard_id=N/``) — one directory per training shard, so a
    loader streams shard N without touching the rest (partition pruning),
    and returns the manifest of what was written.

    The write itself repartitions by the partition columns first so each
    shard directory is produced by one task (no tiny-file explosion from
    every task writing every partition)."""
    assigned = assign_token_shards(df, tokens, order_col, budget, group_cols)
    part_cols = [*group_cols, "shard_id"]
    (
        assigned.repartition(*[F.col(c) for c in part_cols])
        .write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(out_dir)
    )
    return shard_manifest(df, tokens, order_col, budget, group_cols)


def shard_manifest(
    df: DataFrame,
    tokens: Column,
    order_col: str,
    budget: int,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-shard summary: doc count, token total, id range — the manifest
    a shard writer would emit next to the data files."""
    assigned = assign_token_shards(df, tokens, order_col, budget, group_cols)
    return assigned.groupBy(*group_cols, "shard_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("shard_tokens"),
        F.min(order_col).alias("first_doc"),
        F.max(order_col).alias("last_doc"),
    )
