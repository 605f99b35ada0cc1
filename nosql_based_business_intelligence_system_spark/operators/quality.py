"""Data-quality audits: referential integrity + expectation checks.

The reference hand-rolls row-level quality flags (negative qty/price,
zero-price-nonzero-qty — Project.py:146-155, mapped as F2/F3 in SURVEY
§2); this module generalizes that into the two table-level audits every
warehouse runs before trusting a load:

- :func:`fk_orphan_report` — for each declared FK edge, how many child
  rows reference a missing parent. Each edge is ONE left-anti join on the
  key (shuffle on the FK, broadcast when the parent is dim-sized —
  threshold-decided, never forced).
- :func:`expectations_report` — declarative row-level predicates plus
  key-uniqueness checks, evaluated in ONE aggregation pass over the table
  (violations = SUM(CASE), so partial aggregation applies; uniqueness is
  a separate count-distinct, the only extra shuffle).

Both return small report DataFrames (check name, n_violations, passed) —
collect-safe at any scale because output cardinality = number of checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fk_orphan_report(
    edges: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """Orphan counts for FK ``edges`` = [(name, child, child_key, parent,
    parent_key), ...]. NULL child keys are not orphans (SQL FK semantics:
    NULL references are vacuously valid); they're reported separately in
    ``n_null_keys``.
    """
    reports = []
    for name, child, ck, parent, pk in edges:
        nn = child.filter(F.col(ck).isNotNull())
        orphans = nn.join(
            parent.select(F.col(pk).alias(ck)).distinct(), ck, "left_anti"
        )
        reports.append(
            orphans.agg(
                F.lit(name).alias("fk_edge"),
                F.count(F.lit(1)).alias("n_orphans"),
            ).crossJoin(
                child.agg(
                    F.sum(F.col(ck).isNull().cast("bigint")).alias(
                        "n_null_keys"
                    )
                )
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out.select(
        "fk_edge",
        "n_orphans",
        F.coalesce("n_null_keys", F.lit(0)).alias("n_null_keys"),
        (F.col("n_orphans") == 0).alias("passed"),
    )


def expectations_report(
    df: DataFrame,
    row_checks: list[tuple[str, Column]],
    unique_keys: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Expectation results: (check_name, n_violations, passed).

    ``row_checks`` are (name, predicate-that-should-HOLD) pairs — all
    evaluated in one scan (NULL predicate results count as violations:
    an expectation that cannot be proven true is not satisfied).
    ``unique_keys`` are (name, [cols]) pairs; each costs one grouped
    count (rows in groups of size > 1 are the violations).
    """
    viol_cols = [
        F.sum(
            F.when(F.coalesce(pred, F.lit(False)), 0).otherwise(1)
        ).cast("bigint").alias(name)
        for name, pred in row_checks
    ]
    wide = df.agg(*viol_cols)
    stacked = wide.select(
        F.explode(
            F.map_from_arrays(
                F.array(*[F.lit(n) for n, _ in row_checks]),
                F.array(*[F.col(n) for n, _ in row_checks]),
            )
        ).alias("check_name", "n_violations")
    )
    parts = [stacked]
    for name, cols in unique_keys or []:
        dup_rows = (
            df.groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .agg(
                F.lit(name).alias("check_name"),
                F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias(
                    "n_violations"
                ),
            )
        )
        parts.append(dup_rows)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)


def join_fanout_report(
    left: DataFrame,
    right: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """One-row pre-join audit: per-key multiplicities and the EXACT row
    count the equi-join would produce — the cheap dry run that catches a
    join explosion (accidental many-to-many on a non-unique key) before a
    100 TB shuffle materializes it.

    sum over matched keys of n_left * n_right is the inner-join output
    size; the max multiplicities identify which side's duplicate keys are
    the cause. Two grouped counts + one key-join over count rows — cost is
    O(distinct keys), never the join itself.
    """
    keys = [key] if isinstance(key, str) else list(key)
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("nl"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("nr"))
    joined = lc.join(rc, keys, "full")
    return joined.agg(
        F.count(F.col("nl")).cast("bigint").alias("left_keys"),
        F.count(F.col("nr")).cast("bigint").alias("right_keys"),
        F.count(
            F.when(F.col("nl").isNotNull() & F.col("nr").isNotNull(), 1)
        ).cast("bigint").alias("matched_keys"),
        F.coalesce(F.max("nl"), F.lit(0)).cast("bigint").alias(
            "max_left_multiplicity"
        ),
        F.coalesce(F.max("nr"), F.lit(0)).cast("bigint").alias(
            "max_right_multiplicity"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("nr").isNotNull(), F.col("nl") * F.col("nr")
                )
            ),
            F.lit(0),
        ).cast("bigint").alias("inner_join_rows"),
    )
