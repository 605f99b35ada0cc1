"""Upstream-parallelism guard for row-multiplying narrow stages.

An explode/mapInPandas stage runs with the parallelism of its INPUT: a
corpus read from one small parquet file (the local fixture, or one
unsplittable object at the edge of a cluster ingest) executes the whole
expansion on a single task no matter how many cores exist downstream —
shuffle stages after it recover parallelism, but the expensive expansion
itself does not. ``spread`` repartitions the narrow pre-expansion rows up
to the session's expansion parallelism; on a real multi-file 100 TB table
(input splits >= that) it is a no-op by construction.

The target count is the LARGER of the core count and the session's
current ``spark.sql.shuffle.partitions`` — which ``session.
autosize_shuffle_partitions`` already sizes to the dataset (64 MiB of
input parquet per partition, core-count floor). One task per core is the
right floor for small inputs, but it is a straggler trap once tasks get
fat: at sf100 the lm model-build map ran as 32 tasks of ~24s median with
a 73s max — the stage waits on its slowest single task with zero
re-balancing, and the measured wall was 2.4x the CPU ideal (r13 stage
profiles, PLANS.md). Spreading the same stage over the data-proportional
count (266 at sf100) caps the tail at one small task and leaves sf0.001
through sf10 plans byte-identical (autosize floors at the core count
there, so the target is unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def expansion_parallelism(df: DataFrame) -> int:
    """max(core count, current shuffle partitions) — the target task count
    for a data-expanding map stage (see module docstring)."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    try:
        par = max(par, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        pass
    return par


def spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition up to the expansion parallelism if (and only if) the
    input has fewer partitions; key-hash when a key is given, round-robin
    otherwise."""
    par = expansion_parallelism(df)
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, key) if key else df.repartition(par)
