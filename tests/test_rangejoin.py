"""Binned range-join regressions: band/interval joins must produce exactly
the theta-join match set (no dup from binning, no boundary loss), honor the
closed-ness convention, refuse runaway intervals, and plan as equi-joins —
never BroadcastNestedLoopJoin / CartesianProduct."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.rangejoin import (
    band_join,
    interval_join,
    interval_overlap_join,
)


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def _points(spark):
    return spark.createDataFrame(
        [Row(pid=i, k=i % 2, t=_ts(i)) for i in range(30)]
    )


def _intervals(spark):
    return spark.createDataFrame(
        [
            Row(iid=0, k=0, s=_ts(2), e=_ts(9)),
            Row(iid=1, k=1, s=_ts(2), e=_ts(9)),
            Row(iid=2, k=0, s=_ts(8), e=_ts(15)),  # overlaps iid=0
            Row(iid=3, k=0, s=_ts(40), e=_ts(50)),  # matches nothing
            Row(iid=4, k=1, s=_ts(20), e=_ts(20)),  # zero-length, hits pid=20? k=0 -> no
        ]
    )


def test_interval_join_matches_theta_join(spark):
    pts, ivl = _points(spark), _intervals(spark)
    got = interval_join(
        pts, ivl, point_ts="t", start_ts="s", end_ts="e", on="k",
        bin_width_seconds=180,
    )
    expect = pts.join(ivl.withColumnRenamed("k", "k2")).filter(
        (F.col("k") == F.col("k2")) & F.col("t").between(F.col("s"), F.col("e"))
    )
    assert sorted((r.pid, r.iid) for r in got.collect()) == sorted(
        (r.pid, r.iid) for r in expect.collect()
    )
    # overlapping intervals: a point inside both matches twice, once each
    both = [r for r in got.collect() if r.pid == 8]
    assert sorted((r.pid, r.iid) for r in both) == [(8, 0), (8, 2)]


def test_interval_join_closed_left_excludes_end(spark):
    pts, ivl = _points(spark), _intervals(spark)
    got = interval_join(
        pts, ivl, point_ts="t", start_ts="s", end_ts="e", on="k",
        bin_width_seconds=60, closed="left",
    )
    pairs = {(r.pid, r.iid) for r in got.collect()}
    assert (9, 1) not in pairs  # t == e excluded under closed='left'
    assert (3, 1) in pairs


def test_interval_join_suffixes_colliding_columns(spark):
    pts = _points(spark).withColumnRenamed("pid", "x")
    ivl = _intervals(spark).withColumnRenamed("iid", "x")
    out = interval_join(
        pts, ivl, point_ts="t", start_ts="s", end_ts="e", on="k",
        bin_width_seconds=600,
    )
    assert "x" in out.columns and "x_ivl" in out.columns


def test_interval_join_runaway_interval_raises(spark):
    pts = _points(spark)
    ivl = spark.createDataFrame(
        [Row(iid=0, k=0, s=_ts(0), e=dt.datetime(2024, 3, 1))]
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_join(
            pts, ivl, point_ts="t", start_ts="s", end_ts="e", on="k",
            bin_width_seconds=60, max_bins_per_interval=100,
        ).collect()


def test_band_join_matches_theta_join(spark):
    left = _points(spark)
    right = spark.createDataFrame(
        [Row(rid=i, k=i % 2, rt=_ts(i, 30)) for i in range(0, 30, 3)]
    )
    got = band_join(
        left, right, left_ts="t", right_ts="rt", band_seconds=150, on="k"
    )
    expect = left.join(right.withColumnRenamed("k", "k2")).filter(
        (F.col("k") == F.col("k2"))
        & (F.abs(F.col("t").cast("long") - F.col("rt").cast("long")) <= 150)
    )
    assert sorted((r.pid, r.rid) for r in got.collect()) == sorted(
        (r.pid, r.rid) for r in expect.collect()
    )
    assert not [c for c in got.columns if c.startswith("__")]


def test_band_join_band_edge_inclusive(spark):
    left = spark.createDataFrame([Row(pid=1, t=_ts(10))])
    right = spark.createDataFrame([Row(rid=1, rt=_ts(12))])
    hit = band_join(left, right, left_ts="t", right_ts="rt", band_seconds=120)
    miss = band_join(left, right, left_ts="t", right_ts="rt", band_seconds=119)
    assert hit.count() == 1 and miss.count() == 0


def test_range_join_plans_are_equi_joins(spark):
    pts, ivl = _points(spark), _intervals(spark)
    plan = interval_join(
        pts, ivl, point_ts="t", start_ts="s", end_ts="e", on="k",
        bin_width_seconds=300,
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_interval_join_property_random(spark):
    """Hypothesis: bin-join == theta-join for arbitrary interval layouts
    (zero-length, nested, overlapping, bin-boundary-straddling) and any
    bin width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    sec = st.integers(min_value=0, max_value=600)

    @settings(max_examples=15, deadline=None)
    @given(
        points=st.lists(sec, min_size=1, max_size=12),
        spans=st.lists(st.tuples(sec, sec), min_size=1, max_size=8),
        width=st.sampled_from([7, 60, 300]),
    )
    def check(points, spans, width):
        t0 = dt.datetime(2024, 1, 1)
        pts = spark.createDataFrame(
            [Row(pid=i, t=t0 + dt.timedelta(seconds=s)) for i, s in enumerate(points)]
        )
        ivl = spark.createDataFrame(
            [
                Row(
                    iid=i,
                    s=t0 + dt.timedelta(seconds=min(a, b)),
                    e=t0 + dt.timedelta(seconds=max(a, b)),
                )
                for i, (a, b) in enumerate(spans)
            ]
        )
        got = interval_join(
            pts, ivl, point_ts="t", start_ts="s", end_ts="e",
            bin_width_seconds=width,
        )
        expect = pts.join(ivl).filter(F.col("t").between(F.col("s"), F.col("e")))
        assert sorted((r.pid, r.iid) for r in got.collect()) == sorted(
            (r.pid, r.iid) for r in expect.collect()
        )

    check()


def test_interval_overlap_join_matches_bruteforce(spark):
    """Every overlapping pair appears EXACTLY once (canonical-bin trick),
    matching a brute-force theta join on randomized intervals."""
    import random

    rng = random.Random(3)
    t0 = dt.datetime(2024, 1, 1)

    def mkivl(n, tag):
        rows = []
        for i in range(n):
            a = rng.randint(0, 50_000)
            b = a + rng.randint(0, 9_000)
            rows.append(
                Row(
                    **{
                        f"{tag}id": i,
                        "k": rng.choice("xy"),
                        f"{tag}s": t0 + dt.timedelta(seconds=a),
                        f"{tag}e": t0 + dt.timedelta(seconds=b),
                    }
                )
            )
        return rows

    lrows, rrows = mkivl(25, "l"), mkivl(20, "r")
    out = interval_overlap_join(
        spark.createDataFrame(lrows),
        spark.createDataFrame(rrows),
        left_start="ls", left_end="le",
        right_start="rs", right_end="re",
        on="k",
        bin_width_seconds=3600,
    )
    got = sorted((r.lid, r.rid) for r in out.collect())
    expected = sorted(
        (lr.lid, rr.rid)
        for lr in lrows
        for rr in rrows
        if lr.k == rr.k and lr.ls <= rr.re and rr.rs <= lr.le
    )
    assert got == expected                 # exact pair set
    assert len(got) == len(set(got))       # no duplicate emissions
    assert len(got) > 0


def test_interval_overlap_join_is_equi_join(spark):
    t0 = dt.datetime(2024, 1, 1)
    l = spark.createDataFrame([Row(lid=1, ls=t0, le=t0 + dt.timedelta(hours=2))])
    r = spark.createDataFrame([Row(rid=1, rs=t0, re=t0 + dt.timedelta(hours=1))])
    out = interval_overlap_join(
        l, r, left_start="ls", left_end="le", right_start="rs", right_end="re"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_interval_overlap_join_rejects_bound_as_key(spark):
    """Passing an interval bound as a join key must raise an explicit
    ValueError, not a KeyError from the rename-map lookup."""
    df = spark.createDataFrame(
        [Row(k=1, s="2024-01-01 00:00:00", e="2024-01-01 01:00:00")]
    ).select(
        "k",
        F.col("s").cast("timestamp").alias("s"),
        F.col("e").cast("timestamp").alias("e"),
    )
    with pytest.raises(ValueError, match="join keys"):
        interval_overlap_join(
            df, df,
            left_start="s", left_end="e",
            right_start="s", right_end="e",
            on=["k", "s"],
        )
