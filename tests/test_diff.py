"""Keyed table-diff semantics (oracle covers the registry queries; these
pin the per-class and NULL-equality behavior)."""

from __future__ import annotations

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import diff


def test_all_four_classes(spark):
    old = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="b"), Row(k=3, v="c")]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="a"), Row(k=2, v="B"), Row(k=4, v="d")]
    )
    got = {
        r.k: r.change for r in diff.table_diff(old, new, ["k"]).collect()
    }
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_null_values_compare_equal(spark):
    old = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v=None)], "k int, v string"
    )
    new = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v="x")], "k int, v string"
    )
    got = {
        r.k: r.change for r in diff.table_diff(old, new, ["k"]).collect()
    }
    # NULL == NULL is 'unchanged' (snapshot semantics); NULL -> 'x' changed
    assert got == {1: "unchanged", 2: "changed"}


def test_summary_keeps_zero_classes(spark):
    old = spark.createDataFrame([Row(k=1, v="a")])
    new = spark.createDataFrame([Row(k=1, v="a")])
    got = {
        r.change: r.n_rows
        for r in diff.diff_summary(old, new, ["k"]).collect()
    }
    assert got == {"added": 0, "removed": 0, "changed": 0, "unchanged": 1}


def test_compare_cols_subset(spark):
    old = spark.createDataFrame([Row(k=1, v="a", noise="x")])
    new = spark.createDataFrame([Row(k=1, v="a", noise="y")])
    got = diff.table_diff(old, new, ["k"], compare_cols=["v"]).collect()[0]
    assert got.change == "unchanged"  # noise column excluded from compare
