"""Scale-technique regressions: salted skew join correctness, bucketed
co-located joins (shuffle-free plan), partition-pruned scans."""

from __future__ import annotations

import contextlib

from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.skew import hot_keys, salted_join
from nosql_based_business_intelligence_system_spark.sources.sinks import write_bucketed
from nosql_based_business_intelligence_system_spark.sources.tables import load_table


def _skewed_frames(spark):
    # key 7 is pathologically hot on the probe side
    left = spark.createDataFrame(
        [Row(k=7, v=i) for i in range(5000)]
        + [Row(k=i % 40, v=i) for i in range(2000)]
    )
    right = spark.createDataFrame([Row(k=i, w=i * 10) for i in range(40)])
    return left, right


def test_hot_key_detection(spark):
    left, _ = _skewed_frames(spark)
    hot = {r.k for r in hot_keys(left, "k", min_rows=1000).collect()}
    assert hot == {7}


def test_salted_join_matches_plain_join(spark):
    left, right = _skewed_frames(spark)
    plain = left.join(right, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = salted_join(left, right, "k", n_salts=4, hot_min_rows=1000).groupBy(
        "k"
    ).agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


@contextlib.contextmanager
def _no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, sf_smoke):
    li = load_table(spark, sf_smoke, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_smoke, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", n_buckets=4)
    write_bucketed(orders, "orders_bucketed", "o_orderkey", n_buckets=4)
    try:
        with _no_auto_broadcast(spark):
            j = spark.table("li_bucketed").join(
                spark.table("orders_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert j.count() == li.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_dynamic_partition_pruning_on_fiscal_layout(spark, sf_smoke, tmp_path):
    """A dim-filtered join against the fiscal-partitioned fact must plan a
    dynamicpruning subquery on the partition key (DPP) — the mechanism that
    makes month-scoped queries skip irrelevant partitions at 100 TB."""
    from nosql_based_business_intelligence_system_spark.functions import fiscal
    from nosql_based_business_intelligence_system_spark.sources import sinks

    li = load_table(spark, sf_smoke, "lineitem").select(
        F.to_date("l_shipdate").alias("event_date"),
        F.col("l_extendedprice").alias("total_line_price"),
    )
    fact_dir = str(tmp_path / "fact")
    sinks.write_partitioned_fact(
        fiscal.with_fiscal_columns(li, "event_date"), fact_dir,
        partition_cols=("fin_year",),
    )
    fact = spark.read.parquet(fact_dir)
    dim = (
        fiscal.fiscal_calendar_dim(spark, "1995-01-01", "1997-12-31")
        .select("fin_year", "fin_quarter")
        .distinct()
    )
    dim_filtered = dim.filter(F.col("fin_quarter") == "FY1996 Q2")
    q = (
        fact.select("fin_year", "total_line_price")
        .join(F.broadcast(dim_filtered), "fin_year")
        .groupBy("fin_year")
        .agg(F.sum("total_line_price").alias("revenue"))
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert q.count() >= 1
