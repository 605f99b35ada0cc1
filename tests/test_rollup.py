"""Multi-resolution rollup regressions: re-aggregated coarse grains must
equal direct-from-raw aggregation (decomposability), the raw input must be
scanned once, and bad grain orders must be rejected."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.rollup import multires_rollup


def _events(spark):
    rows = [
        Row(
            ts=dt.datetime(2024, 1, 1, h, 7) + dt.timedelta(days=d),
            kind="a" if (d + h) % 2 == 0 else "b",
            v=float(d * 100 + h),
        )
        for d in range(40)
        for h in (0, 5, 13, 23)
    ]
    return spark.createDataFrame(rows)


def test_coarse_grain_equals_direct_aggregation(spark):
    df = _events(spark)
    out = multires_rollup(
        df,
        ts="ts",
        group_by=["kind"],
        measures=[
            ("n", F.lit(1), "count"),
            ("sv", F.col("v").cast("decimal(38,6)"), "sum"),
            ("mx", F.col("v"), "max"),
            ("mn", F.col("v"), "min"),
        ],
        resolutions=("hour", "day", "month"),
    ).cache()
    for res in ("day", "month"):
        got = {
            (r.bucket_start, r.kind): (r.n, r.sv, r.mx, r.mn)
            for r in out.filter(F.col("resolution") == res).collect()
        }
        direct = {
            (r.bucket_start, r.kind): (r.n, r.sv, r.mx, r.mn)
            for r in df.groupBy(
                F.date_trunc(res, "ts").alias("bucket_start"), "kind"
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(38,6)")).alias("sv"),
                F.max("v").alias("mx"),
                F.min("v").alias("mn"),
            )
            .collect()
        }
        assert got == direct, res
    out.unpersist()


def test_levels_partition_row_counts(spark):
    df = _events(spark)
    out = multires_rollup(
        df,
        ts="ts",
        measures=[("n", F.lit(1), "count")],
        resolutions=("day", "month"),
    )
    by_res = {
        r.resolution: r.n_buckets
        for r in out.groupBy("resolution")
        .agg(F.count(F.lit(1)).alias("n_buckets"))
        .collect()
    }
    assert by_res == {"day": 40, "month": 2}
    total = out.filter(F.col("resolution") == "month").agg(
        F.sum("n")
    ).collect()[0][0]
    assert total == df.count()


def test_rejects_coarse_to_fine_order(spark):
    df = _events(spark)
    with pytest.raises(ValueError, match="finest->coarsest"):
        multires_rollup(
            df,
            ts="ts",
            measures=[("n", F.lit(1), "count")],
            resolutions=("month", "day"),
        )
    with pytest.raises(ValueError, match="unknown measure kind"):
        multires_rollup(
            df,
            ts="ts",
            measures=[("n", F.lit(1), "avg")],
            resolutions=("day",),
        )


def test_raw_scanned_once_in_plan(spark, tmp_path):
    # From a file-backed source, only the finest grain may scan the file:
    # coarser grains must re-aggregate (InMemoryTableScan after the cache).
    p = str(tmp_path / "ev.parquet")
    _events(spark).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = multires_rollup(
        df,
        ts="ts",
        measures=[("n", F.lit(1), "count")],
        resolutions=("hour", "day", "month"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ev.parquet") <= 1
