"""Distributed exact ranking: global row_number / ntile / percent_rank
WITHOUT a single-partition window.

``Window.orderBy(...)`` with no partition spec moves every row into ONE
task — fine over calendar-bounded post-aggregates, fatal over any grain
that grows with data (customers, suppliers, orders). These helpers give
bit-identical results with a fully distributed plan, via the classic
two-pass scheme (the same one ``RDD.zipWithIndex`` uses):

1. ``repartitionByRange`` on the sort key — rows land in P ordered,
   disjoint key ranges (a distributed exchange, NOT a global sort).
2. Local ``row_number`` per range partition (window partitioned by
   ``spark_partition_id`` — each window partition is one range chunk,
   bounded by partition size, never the whole table).
3. Per-partition row counts (P rows, P = parallelism, NOT data-scaled)
   are collected once; their cumulative sums become broadcast offsets,
   and ``global row_number = local row_number + offset(partition)``.

The P-row count collection is bounded by cluster parallelism (like
``zipWithIndex``'s internal collect), not by data size — at 1000
executors it is a few thousand longs. The input is materialized with an
eager ``localCheckpoint`` first so the count pass and the ranking pass
read the SAME physical partitioning (and the upstream plan — often an
aggregation — executes once, not twice).

Determinism: every result depends only on the total order defined by
``order_cols`` (callers must pass a tie-broken total order for
row_number/ntile; ``percent_rank`` min-aggregates over ties so an
arbitrary tie order cannot change it). Range boundaries affect WHERE a
row is ranked, never its rank.

The ntile / percent_rank value formulas replicate Spark's native
``NTile`` / ``PercentRank`` exactly (integer bucket arithmetic; one IEEE
division for percent_rank), so swapping a global window for these
helpers cannot change a query's result — only its plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order_columns(order_cols) -> list[Column]:
    return [c if isinstance(c, Column) else F.col(c) for c in order_cols]


def attach_global_row_number(
    df: DataFrame,
    order_cols,
    out_col: str = "__rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Return (df + ``out_col`` 1-based global row number, total row count).

    ``order_cols`` may contain column names or sort-order Columns
    (``F.desc(...)``) and must define a total order for the row numbers
    to be deterministic. All input columns are preserved.
    """
    spark = df.sparkSession
    cols = _order_columns(order_cols)
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Materialize the range-partitioned rows ONCE: the count pass below and
    # the ranking pass must see the same physical partitioning, and the
    # upstream plan (often an aggregation of a fact table) must not run
    # twice. Explicit numPartitions also stops AQE from re-coalescing.
    ranged = df.repartitionByRange(p, *cols).localCheckpoint(eager=True)
    # Per-partition counts: P rows (P = parallelism, not data-scaled) —
    # the zipWithIndex pattern. spark_partition_id is nondeterministic-
    # flagged, so project it before grouping.
    counts = (
        ranged.select(F.spark_partition_id().alias("__pid"))
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    offsets: list[tuple[int, int]] = []
    acc = 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__cnt"]
    off_df = spark.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    out = (
        ranged.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrn", F.row_number().over(w))
        .join(F.broadcast(off_df), "__pid")
        .withColumn(out_col, (F.col("__lrn") + F.col("__off")).cast("bigint"))
        .drop("__pid", "__lrn", "__off")
    )
    return out, acc


def distributed_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """``ntile(n) OVER (ORDER BY order_cols)`` as a distributed plan.

    Bucket arithmetic replicates Spark's native ``NTile``: with total
    rows c, q = c div n and r = c mod n, the first r buckets hold q+1
    rows and the rest q — bucket is pure integer arithmetic on the
    global row number, so results are bit-identical to the native window
    (asserted by tests/test_ranking.py against ``F.ntile``).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    ranked, total = attach_global_row_number(
        df, order_cols, "__gnt_rn", num_partitions
    )
    q, r = divmod(total, n_buckets)
    rn = F.col("__gnt_rn")
    if q == 0:
        # fewer rows than buckets: row i lands alone in bucket i
        bucket = rn
    else:
        # integer DIV, not double `/` + cast: double division of large
        # longs can round up across a bucket boundary near 2^53 ranks
        big = r * (q + 1)
        bucket = F.when(
            rn <= F.lit(big),
            F.expr(f"(__gnt_rn - 1) DIV {q + 1}") + 1,
        ).otherwise(
            F.lit(r) + F.expr(f"(__gnt_rn - 1 - {big}) DIV {q}") + 1
        )
    return ranked.withColumn(out_col, bucket.cast("bigint")).drop("__gnt_rn")


def distributed_percent_rank(
    df: DataFrame,
    value_col: Column | str,
    out_col: str = "percent_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """``percent_rank() OVER (ORDER BY value_col)`` as a distributed plan.

    Tie-aware (SQL RANK semantics): rank = min global row number within
    each tied value group (one hash-partitioned window on the value —
    distributed, skew-bounded by the largest tie group), then the native
    formula ``(rank - 1) / (total - 1)`` as one IEEE double division —
    bit-identical to ``F.percent_rank`` (asserted by tests).
    """
    val = value_col if isinstance(value_col, Column) else F.col(value_col)
    staged = df.withColumn("__gpr_val", val)
    ranked, total = attach_global_row_number(
        staged, [F.asc("__gpr_val")], "__gpr_rn", num_partitions
    )
    rank = F.min("__gpr_rn").over(Window.partitionBy("__gpr_val"))
    pr = (
        ((rank - 1) / F.lit(total - 1)).cast("double")
        if total > 1
        else F.lit(0.0)
    )
    return ranked.withColumn(out_col, pr).drop("__gpr_val", "__gpr_rn")
