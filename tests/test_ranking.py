"""Distributed ranking (operators/ranking.py): bit-equivalence with the
native single-partition window functions, plus plan assertions that the
four round-4 "weak" queries no longer execute any single-partition stage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.ranking import (
    attach_global_row_number,
    distributed_ntile,
    distributed_percent_rank,
)
from nosql_based_business_intelligence_system_spark.plans import inspect as I
from nosql_based_business_intelligence_system_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _orders_spend(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("spend"))
    )


def test_global_row_number_matches_native(spark):
    df = _orders_spend(spark)
    order = [F.desc("spend"), F.asc("o_custkey")]
    got, total = attach_global_row_number(df, order, "rn", num_partitions=7)
    native = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )
    assert total == df.count()
    assert got.exceptAll(native).count() == 0
    assert native.exceptAll(got).count() == 0


@pytest.mark.parametrize("n", [1, 3, 10, 100000])
def test_distributed_ntile_matches_native(spark, n):
    """Exact ntile parity, including n > row count (every row its own
    bucket) and uneven remainders."""
    df = _orders_spend(spark)
    order = [F.desc("spend"), F.asc("o_custkey")]
    got = distributed_ntile(df, n, order, "b", num_partitions=7)
    native = df.withColumn(
        "b", F.ntile(n).over(Window.orderBy(*order)).cast("bigint")
    )
    assert got.exceptAll(native).count() == 0
    assert native.exceptAll(got).count() == 0


def test_distributed_percent_rank_matches_native(spark):
    """Tie-aware parity: o_totalprice has 2-decimal ties in the fixture."""
    df = spark.read.parquet(f"{SF}/orders.parquet").select("o_totalprice")
    got = distributed_percent_rank(df, "o_totalprice", "pr", num_partitions=7)
    native = df.withColumn(
        "pr", F.percent_rank().over(Window.orderBy("o_totalprice"))
    )
    assert got.exceptAll(native).count() == 0
    assert native.exceptAll(got).count() == 0


def test_ranking_edge_cases(spark):
    empty = spark.range(0).select(F.col("id").cast("long").alias("v"))
    out = distributed_ntile(empty, 4, ["v"], "b")
    assert out.count() == 0
    one = spark.range(1).select(F.col("id").alias("v"))
    row = distributed_percent_rank(one, "v", "pr").collect()[0]
    assert row["pr"] == 0.0  # native percent_rank over 1 row is 0.0
    assert distributed_ntile(one, 4, ["v"], "b").collect()[0]["b"] == 1


def test_ranking_result_independent_of_partition_count(spark):
    """Range boundaries move with P; ranks must not."""
    df = _orders_spend(spark)
    order = [F.desc("spend"), F.asc("o_custkey")]
    a = distributed_ntile(df, 10, order, "b", num_partitions=2)
    b = distributed_ntile(df, 10, order, "b", num_partitions=29)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


# --- the four r4 scale-killers: no single-partition stage anywhere ----------

FIXED = (
    "top_revenue_suppliers",
    "customer_value_deciles",
    "customer_rfm_segments",
    "mongo_order_value_bucket_auto",
)


@pytest.mark.parametrize("name", FIXED)
def test_fixed_queries_have_no_single_partition_stage(spark, name):
    """No data-grain rows may pass through a one-task stage. The only
    permitted `Exchange SinglePartition` is the final merge of a SCALAR
    aggregate (its input is one partial row per task — a distributed
    reduce): in top_revenue_suppliers that is the 1-row max-revenue
    broadcast side, whose exchange sits directly above a partial_max
    HashAggregate."""
    df = QUERIES[name].fn(spark, SF)
    simple = I.explain_str(df, "simple")
    for frag in simple.split("Exchange SinglePartition")[1:]:
        # the operator feeding the exchange is the next plan line down
        feeder = frag.splitlines()[1] if len(frag.splitlines()) > 1 else ""
        assert "partial_" in feeder and "HashAggregate" in feeder, (
            name,
            feeder,
        )
    if name == "top_revenue_suppliers":
        assert "Window" not in simple
        assert "BroadcastHashJoin" in simple
    # no window with an empty partition spec (the analyzed-plan signature
    # the plan doctor checks)
    import re

    analyzed = I.explain_str(df, "extended")
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", analyzed):
        head = spec.split(",")[0].strip()
        assert not (
            " ASC" in head
            or " DESC" in head
            or head.startswith("specifiedwindowframe")
        ), (name, spec)


@pytest.mark.parametrize("name", FIXED)
def test_fixed_queries_doctor_clean(spark, name):
    """With the r4 global_window allows REMOVED, the doctor must report
    no error/warn findings for the four rewritten plans."""
    from nosql_based_business_intelligence_system_spark.plans.doctor import (
        QUERY_ALLOWS,
        diagnose,
    )

    allows = QUERY_ALLOWS.get(name, {})
    assert "global_window" not in allows, name
    findings = [
        f
        for f in diagnose(QUERIES[name].fn(spark, SF), allows)
        if f["severity"] in ("error", "warn")
    ]
    assert findings == [], (name, findings)
