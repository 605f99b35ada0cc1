"""Upstream-parallelism guard for row-multiplying narrow stages.

An explode/mapInPandas stage runs with the parallelism of its INPUT: a
corpus read from one small parquet file (the local fixture, or one
unsplittable object at the edge of a cluster ingest) executes the whole
expansion on a single task no matter how many cores exist downstream —
shuffle stages after it recover parallelism, but the expensive expansion
itself does not. ``spread`` repartitions the narrow pre-expansion rows up
to the session's default parallelism; on a real multi-file 100 TB table
(input splits >= cores) it is a no-op by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition up to default parallelism if (and only if) the input has
    fewer partitions; key-hash when a key is given, round-robin otherwise."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par, key) if key else df.repartition(par)
