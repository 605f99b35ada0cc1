"""Keyed table diff (snapshot reconciliation).

Classifies rows between two snapshots of the same logical table into
added / removed / changed / unchanged, keyed by a primary key — the
reconciliation primitive behind CDC backfills, restatement audits, and
migration sign-off (old engine vs new engine on the same data: exactly
what a reference user does when switching to this repo).

Shape: ONE full outer join on the key; change detection compares a
canonical struct of the non-key columns (NULL-safe via the struct
equality operator). Partial nothing — the join is the whole cost, and it
shuffles both sides once on the key. Output can be filtered to a class
before any collect, so the operator is safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key columns..., change, old_values struct, new_values struct).

    ``change`` in {'added', 'removed', 'changed', 'unchanged'}.
    ``compare_cols`` defaults to all shared non-key columns; comparison
    is NULL-safe (NULL == NULL counts as equal — snapshot semantics, not
    SQL ternary logic).
    """
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in set(keys)]
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.struct(*compare_cols).alias("old_values"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        F.struct(*compare_cols).alias("new_values"),
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, [f"__k_{k}" for k in keys], "full_outer")
    # Struct <=> comparison is recursively null-safe in Spark.
    same = F.col("old_values").eqNullSafe(F.col("new_values"))
    change = (
        F.when(F.col("__in_old").isNull(), "added")
        .when(F.col("__in_new").isNull(), "removed")
        .when(same, "unchanged")
        .otherwise("changed")
    )
    return j.select(
        *[F.col(f"__k_{k}").alias(k) for k in keys],
        change.alias("change"),
        "old_values",
        "new_values",
    )


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """One row per change class with counts (always 4 rows, zeros kept)."""
    d = table_diff(old, new, keys, compare_cols)
    counts = d.groupBy("change").agg(F.count(F.lit(1)).alias("n_rows"))
    classes = d.sparkSession.createDataFrame(
        [(c,) for c in ("added", "removed", "changed", "unchanged")],
        "change string",
    )
    return classes.join(counts, "change", "left").select(
        "change", F.coalesce("n_rows", F.lit(0)).alias("n_rows")
    )
