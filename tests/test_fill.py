"""Densify/gap-fill regressions: scaffold completeness, LOCF semantics,
linear interpolation math, one-sided gap fallbacks, per-key isolation."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.fill import densify, fill_series


def _h(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def _series(spark):
    return spark.createDataFrame(
        [
            Row(k="a", ts=_h(0), v=10.0),
            Row(k="a", ts=_h(4), v=50.0),   # 3-tick hole: hours 1..3
            Row(k="a", ts=_h(6), v=20.0),
            Row(k="b", ts=_h(2), v=7.0),    # different span entirely
            Row(k="b", ts=_h(3), v=9.0),
        ]
    )


def test_densify_builds_per_key_grid(spark):
    dense = densify(_series(spark), ts="ts", step_seconds=3600, keys=["k"])
    got = {(r.k, r.ts): r.v for r in dense.collect()}
    assert len([x for x in got if x[0] == "a"]) == 7   # hours 0..6
    assert len([x for x in got if x[0] == "b"]) == 2   # hours 2..3
    assert got[("a", _h(2))] is None and got[("a", _h(4))] == 50.0
    assert ("b", _h(0)) not in got  # grid never leaks outside a key's span


def test_locf_carries_last_observation(spark):
    dense = densify(_series(spark), ts="ts", step_seconds=3600, keys=["k"])
    filled = fill_series(dense, ts="ts", values=["v"], keys=["k"], method="locf")
    a = {r.ts: r.v for r in filled.filter(F.col("k") == "a").collect()}
    assert [a[_h(i)] for i in range(7)] == [10.0, 10.0, 10.0, 10.0, 50.0, 50.0, 20.0]


def test_linear_interpolates_between_observations(spark):
    dense = densify(_series(spark), ts="ts", step_seconds=3600, keys=["k"])
    filled = fill_series(dense, ts="ts", values=["v"], keys=["k"], method="linear")
    a = {r.ts: r.v for r in filled.filter(F.col("k") == "a").collect()}
    assert [a[_h(i)] for i in range(5)] == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert a[_h(5)] == 35.0  # midpoint of 50 -> 20


def test_linear_one_sided_gaps_take_nearest(spark):
    df = spark.createDataFrame(
        [Row(k="a", ts=_h(i), v=None if i != 2 else 8.0) for i in range(5)],
        "k string, ts timestamp, v double",
    )
    filled = fill_series(df, ts="ts", values=["v"], keys=["k"], method="linear")
    vals = [r.v for r in filled.orderBy("ts").collect()]
    assert vals == [8.0, 8.0, 8.0, 8.0, 8.0]  # leading->next, trailing->prev


def test_locf_leading_nulls_stay_null(spark):
    df = spark.createDataFrame(
        [Row(k="a", ts=_h(0), v=None), Row(k="a", ts=_h(1), v=3.0)],
        "k string, ts timestamp, v double",
    )
    filled = fill_series(df, ts="ts", values=["v"], keys=["k"], method="locf")
    vals = [r.v for r in filled.orderBy("ts").collect()]
    assert vals == [None, 3.0]


def test_fill_rejects_unknown_method(spark):
    with pytest.raises(ValueError, match="locf|linear"):
        fill_series(_series(spark), ts="ts", values=["v"], method="spline")
