"""Set-op cohorts partition correctly; HLL sketch error stays bounded."""

from __future__ import annotations

from nosql_based_business_intelligence_system_spark.queries.setops_suite import (
    customer_year_cohorts,
    distinct_count_sketches,
    distinct_count_sketches_detail,
)


def test_cohorts_partition_the_union(spark, sf_smoke):
    rows = {r.cohort: r.n_customers for r in customer_year_cohorts(spark, sf_smoke).collect()}
    assert set(rows) == {"repeat", "churned", "new"}
    assert all(n >= 0 for n in rows.values())
    assert rows["repeat"] + rows["churned"] > 0  # 1995 had customers


def test_hll_relative_error_within_bound(spark, sf_smoke):
    # rsd=0.05 is a standard deviation -> allow 3 sigma per group
    for r in distinct_count_sketches_detail(spark, sf_smoke).collect():
        assert abs(r.approx_orders - r.exact_orders) <= max(0.15 * r.exact_orders, 2)
        assert abs(r.approx_parts - r.exact_parts) <= max(0.15 * r.exact_parts, 2)
    # the certified registry projection must assert the same bound
    for r in distinct_count_sketches(spark, sf_smoke).collect():
        assert r.orders_within_bound and r.parts_within_bound


def test_single_scan_sketch_plan_matches_three_scan(spark, sf_correctness):
    """The shipped r8 FUSED TWO-SCAN shape (per key column: one dedup of
    (l_returnflag, key), then exact count + HLL from that same deduped
    set) must reproduce the previous three-scan plan EXACTLY — exact
    counts trivially, and the HLL estimates too, because register updates
    are max-based so deduped input yields the identical sketch. (The
    single-scan explode->distinct->pivot variant was A/B'd and REJECTED —
    128.1s at sf100; doubling dedup-shuffle rows loses to halving scans —
    see the distinct_count_sketches docstring / PLANS.md r8.)"""
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.sources.tables import (
        load_table,
    )

    got = {
        r.l_returnflag: (
            r.approx_orders, r.exact_orders, r.approx_parts, r.exact_parts
        )
        for r in distinct_count_sketches_detail(spark, sf_correctness).collect()
    }
    li = load_table(spark, sf_correctness, "lineitem")
    approx = {
        r.l_returnflag: (r.ao, r.ap)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", 0.05).alias("ao"),
            F.approx_count_distinct("l_partkey", 0.05).alias("ap"),
        )
        .collect()
    }
    exact_o = {
        r.l_returnflag: r.n
        for r in li.select("l_returnflag", "l_orderkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    exact_p = {
        r.l_returnflag: r.n
        for r in li.select("l_returnflag", "l_partkey").distinct()
        .groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        k: (approx[k][0], exact_o[k], approx[k][1], exact_p[k])
        for k in approx
    }
    assert got == want


def test_gapfill_months_fills_sparse_series(spark):
    from pyspark.sql import Row

    from nosql_based_business_intelligence_system_spark.queries.reference_suite import (
        gapfill_months,
    )

    sparse = spark.createDataFrame(
        [
            Row(fin_month_label="2024-01", revenue=10.0),
            Row(fin_month_label="2024-04", revenue=40.0),
        ]
    )
    out = {r.fin_month_label: r.revenue for r in gapfill_months(sparse).collect()}
    assert out == {"2024-01": 10.0, "2024-02": 0.0, "2024-03": 0.0, "2024-04": 40.0}


def test_quantile_sketch_error_bound(spark, sf_correctness):
    from nosql_based_business_intelligence_system_spark.queries.stats_suite import (
        order_value_quantile_sketch,
        order_value_quantile_sketch_detail,
    )

    rows = order_value_quantile_sketch_detail(spark, sf_correctness).collect()
    assert rows and all(r.n_orders > 0 for r in rows)
    # GK sketch with accuracy=10000: relative rank error <= 1/10000; on
    # this distribution the value-space relative error stays under 1%
    assert max(r.max_rel_err for r in rows) < 0.01
    # certified projection agrees
    cert = order_value_quantile_sketch(spark, sf_correctness).collect()
    assert cert and all(r.within_bound for r in cert)


def test_hll_union_of_leaves_equals_direct_sketch(spark, sf_smoke):
    """Union of per-group sketches must carry the SAME registers as one
    sketch over the whole column -> identical estimate (determinism of
    the mergeable path), and the estimate stays within HLL error of
    exact."""
    import pyspark.sql.functions as F

    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    orders = load_table(spark, sf_smoke, "orders")
    unioned = (
        orders.groupBy("o_orderpriority")
        .agg(F.hll_sketch_agg("o_custkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    direct = orders.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey")).alias("est")
    ).collect()[0].est
    exact = orders.agg(F.countDistinct("o_custkey").alias("n")).collect()[0].n
    assert unioned == direct
    assert abs(unioned - exact) / exact < 0.05


def test_theta_overlap_within_sketch_error(spark, sf_correctness):
    """Theta set algebra (union/intersection/difference on SKETCHES) must
    track the exact set operations; below the sketch's nominal capacity
    the estimates are exact, so 5% is a loose ceiling."""
    from nosql_based_business_intelligence_system_spark.queries.setops_suite import (
        theta_customer_overlap,
        theta_customer_overlap_detail,
    )

    r = theta_customer_overlap_detail(spark, sf_correctness).collect()[0]
    for est, exact in (
        (r.est_1995, r.exact_a),
        (r.est_1996, r.exact_b),
        (r.est_union, r.exact_union),
        (r.est_retained, r.exact_retained),
        (r.est_churned, r.exact_churned),
    ):
        assert exact > 0 and abs(est - exact) / exact < 0.05
    # the algebra must be internally consistent: |A| + |B| = |A∪B| + |A∩B|
    assert abs((r.est_1995 + r.est_1996) - (r.est_union + r.est_retained)) <= max(
        1.0, 0.05 * r.exact_union
    )
    # certified projection asserts the same bound
    cert = theta_customer_overlap(spark, sf_correctness).collect()[0]
    assert cert.within_bound and cert.exact_union == r.exact_union


def test_kll_merge_tracks_exact_quantiles(spark, sf_correctness):
    """Merged per-priority KLL sketches answer GLOBAL quantiles within the
    sketch's rank-error budget (default k=200 -> ~1.65% rank error; on
    this distribution value-space error stays well under 5%)."""
    from nosql_based_business_intelligence_system_spark.queries.stats_suite import (
        kll_mergeable_quantiles,
        kll_mergeable_quantiles_detail,
    )

    rows = {r.key: r for r in kll_mergeable_quantiles_detail(spark, sf_correctness).collect()}
    total = rows["*"]
    assert total.n_orders == sum(r.n_orders for k, r in rows.items() if k != "*")
    for p in (50, 90, 99):
        est = getattr(total, f"p{p}_est")
        exact = getattr(total, f"p{p}_exact")
        assert exact > 0 and abs(est - exact) / exact < 0.05
    # certified projection asserts the same bound on every row
    cert = kll_mergeable_quantiles(spark, sf_correctness).collect()
    assert cert and all(r.within_bound for r in cert)


def test_hll_rollup_certified_bounds(spark, sf_correctness):
    """The certified HLL rollup must bound-check both levels, with the
    total row's estimate coming from the sketch union."""
    from nosql_based_business_intelligence_system_spark.queries.setops_suite import (
        hll_mergeable_rollup,
        hll_mergeable_rollup_detail,
    )

    detail = {(r.level, r.key): r for r in hll_mergeable_rollup_detail(spark, sf_correctness).collect()}
    assert ("total", "*") in detail
    assert all(r.exact_customers is not None for r in detail.values())
    cert = hll_mergeable_rollup(spark, sf_correctness).collect()
    assert {(r.level, r.key) for r in cert} == set(detail)
    assert all(r.within_bound for r in cert)
