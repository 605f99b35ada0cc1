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


def _scan_runtime_metrics(df) -> list[dict[str, int]]:
    """Post-execution FileSourceScan metrics (numPartitions read,
    staticFilesNum, pruningTime, ...), harvested by walking the AQE plan
    into its materialized query stages — the only place Spark exposes how
    many partitions a scan ACTUALLY read at runtime."""
    found: list[dict[str, int]] = []

    def walk(p):
        name = p.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(p.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(p.plan())
            return
        if "FileSourceScan" in name:
            m, it, vals = p.metrics(), None, {}
            it = m.iterator()
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            found.append(vals)
            return
        ch = p.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return found


def test_dynamic_partition_pruning_on_fiscal_layout(spark, sf_smoke, tmp_path):
    """A dim-filtered join against the fiscal-MONTH-partitioned fact must
    (a) plan a dynamicpruning subquery on the partition keys, (b) READ, at
    runtime, only the quarter's 3 month-partitions out of all written ones
    (runtime scan metrics — the r8 verdict's unproven scale claim, SURVEY
    §4.2), and (c) return rows identical to the same aggregate over the
    unpartitioned frame."""
    from nosql_based_business_intelligence_system_spark.functions import fiscal
    from nosql_based_business_intelligence_system_spark.sources import sinks

    li = load_table(spark, sf_smoke, "lineitem").select(
        F.to_date("l_shipdate").alias("event_date"),
        F.col("l_extendedprice").alias("total_line_price"),
    )
    enriched = fiscal.with_fiscal_columns(li, "event_date")
    fact_dir = str(tmp_path / "fact")
    sinks.write_partitioned_fact(
        enriched, fact_dir, partition_cols=("fin_year", "fin_month_num")
    )
    fact = spark.read.parquet(fact_dir)
    n_parts = fact.select("fin_year", "fin_month_num").distinct().count()
    dim = (
        fiscal.fiscal_calendar_dim(spark, "1995-01-01", "1997-12-31")
        .select("fin_year", "fin_month_num", "fin_quarter")
        .distinct()
    )
    dim_filtered = dim.filter(F.col("fin_quarter") == "FY1996 Q2")

    def agg(frame):
        return (
            frame.select("fin_year", "fin_month_num", "total_line_price")
            .join(F.broadcast(dim_filtered), ["fin_year", "fin_month_num"])
            .groupBy("fin_year", "fin_month_num")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum("total_line_price").alias("revenue"),
            )
        )

    q = agg(fact)
    # (a) static plan: the scan carries a dynamicpruning partition filter
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {tuple(r) for r in q.collect()}
    # (b) runtime: the fact scan read ONLY the quarter's partitions
    scans = [
        m for m in _scan_runtime_metrics(q) if "staticFilesNum" in m
    ]
    assert scans, "no partitioned FileSourceScan found in executed plan"
    fact_scan = scans[0]
    assert fact_scan["numPartitions"] == 3, fact_scan  # one fiscal quarter
    assert n_parts > 30  # the layout really had years' worth of months
    assert fact_scan["staticFilesNum"] >= n_parts  # >=1 file per partition
    # (c) row-identical to the unpartitioned path (decimal sums — exact)
    expect = {tuple(r) for r in agg(enriched).collect()}
    assert got == expect and got
