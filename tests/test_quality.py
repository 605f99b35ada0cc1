"""Data-quality audit tests with PLANTED violations (the fixture star is
clean — the oracle proves agreement, these prove detection)."""

from __future__ import annotations

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import quality


def test_fk_orphans_detected_and_nulls_separate(spark):
    child = spark.createDataFrame(
        [Row(k=1), Row(k=2), Row(k=99), Row(k=None)]
    )
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2), Row(pk=3)])
    out = quality.fk_orphan_report([("c->p", child, "k", parent, "pk")]).collect()
    assert len(out) == 1
    r = out[0]
    # 99 is an orphan; the NULL key is NOT an orphan but is reported
    assert (r.fk_edge, r.n_orphans, r.n_null_keys, r.passed) == ("c->p", 1, 1, False)


def test_fk_clean_edge_passes(spark):
    child = spark.createDataFrame([Row(k=1), Row(k=1), Row(k=2)])
    parent = spark.createDataFrame([Row(pk=1), Row(pk=2)])
    r = quality.fk_orphan_report([("ok", child, "k", parent, "pk")]).collect()[0]
    assert (r.n_orphans, r.n_null_keys, r.passed) == (0, 0, True)


def test_expectations_null_predicate_is_violation(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [Row(x=5.0), Row(x=-1.0), Row(x=None)]
    )
    out = {
        r.check_name: r
        for r in quality.expectations_report(
            df, [("x_positive", F.col("x") > 0)]
        ).collect()
    }
    # -1 fails outright; NULL can't be proven positive -> also a violation
    assert out["x_positive"].n_violations == 2
    assert out["x_positive"].passed is False


def test_expectations_unique_key_counts_dup_rows(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [Row(a=1, b=1), Row(a=1, b=1), Row(a=1, b=1), Row(a=2, b=2)]
    )
    out = {
        r.check_name: r
        for r in quality.expectations_report(
            df,
            [("a_not_null", F.col("a").isNotNull())],
            unique_keys=[("ab_unique", ["a", "b"])],
        ).collect()
    }
    # all 3 rows of the duplicated (1,1) group count as violations
    assert out["ab_unique"].n_violations == 3
    assert out["a_not_null"].n_violations == 0 and out["a_not_null"].passed


def test_join_fanout_report_predicts_exact_join_size(spark):
    from pyspark.sql import Row

    from nosql_based_business_intelligence_system_spark.operators.quality import join_fanout_report

    left = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=2), Row(k=3)]  # k=1 duplicated
    )
    right = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=1), Row(k=2), Row(k=9)]
    )
    r = join_fanout_report(left, right, "k").collect()[0]
    assert (r.left_keys, r.right_keys, r.matched_keys) == (3, 3, 2)
    assert (r.max_left_multiplicity, r.max_right_multiplicity) == (2, 3)
    assert r.inner_join_rows == left.join(right, "k").count() == 7
