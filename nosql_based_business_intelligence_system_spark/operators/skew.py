"""Skew mitigation for shuffled joins — the hand-rolled complement to AQE's
``skewJoin`` (which only splits sort-merge partitions after the fact; when
one key is pathologically hot, salting is still the 100 TB answer).

Hybrid salted join: detect hot keys (cheap pre-aggregation), salt ONLY the
hot-key rows (probe side gets a random salt in [0, n); build side replicates
each hot-key row n times, one per salt), join cold keys untouched, union.
Cost: build-side rows for hot keys x n_salts — bounded because hot keys are
few by definition; the hot partitions split n ways.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hot_keys(df: DataFrame, key: str, min_rows: int) -> DataFrame:
    """Keys whose row count exceeds ``min_rows`` (the skew detection pass —
    at scale run it on a sample or reuse shuffle statistics)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > min_rows)
        .select(key)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    hot_min_rows: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """Inner equi-join resilient to hot keys in ``left``.

    ``left`` is the large/skewed probe side; ``right`` the build side
    (unique per key or small per key). Hot keys found via :func:`hot_keys`
    are broadcast; hot probe rows get ``salt = floor(rand * n)`` while the
    build side's hot rows are exploded across all n salts, so each formerly
    hot partition splits n ways. Cold keys take the plain join path.

    ``rand(seed)`` makes a run deterministic end-to-end but individual rows
    can move between salts under task RETRY re-execution — harmless here
    (the salt never changes the join result, only placement).
    """
    hot = hot_keys(left, key, hot_min_rows)
    lh = left.join(F.broadcast(hot), key, "left_semi").withColumn(
        "__salt", (F.rand(seed) * n_salts).cast("int")
    )
    lc = left.join(F.broadcast(hot), key, "left_anti")
    rh = (
        right.join(F.broadcast(hot), key, "left_semi")
        .withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    )
    rc = right.join(F.broadcast(hot), key, "left_anti")
    joined_hot = lh.join(rh, [key, "__salt"]).drop("__salt")
    joined_cold = lc.join(rc, [key])
    return joined_hot.unionByName(joined_cold)
