"""SCD2 regressions: event-log compression, incremental merge parity with
recompute-from-scratch, no-op updates vanishing, history-rewrite guard."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators.scd import scd2_apply, scd2_from_events


def _t(i: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)


def _log(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, ts=_t(i), state=s) for k, i, s in rows]
    )


def test_from_events_collapses_runs(spark):
    log = _log(
        spark,
        [(1, 0, "a"), (1, 1, "a"), (1, 2, "b"), (1, 3, "b"), (1, 4, "a"),
         (2, 0, "x")],
    )
    got = sorted(
        (r.k, r.state, r.valid_from, r.valid_to)
        for r in scd2_from_events(log, key="k", ts="ts", attrs=["state"]).collect()
    )
    assert got == [
        (1, "a", _t(0), _t(2)),
        (1, "a", _t(4), None),
        (1, "b", _t(2), _t(4)),
        (2, "x", _t(0), None),
    ]


def test_null_attrs_compare_null_safe(spark):
    log = spark.createDataFrame(
        [(1, _t(0), None), (1, _t(1), None), (1, _t(2), "a")],
        "k int, ts timestamp, state string",
    )
    out = scd2_from_events(log, key="k", ts="ts", attrs=["state"]).collect()
    assert len(out) == 2  # the two NULL rows are one run


def test_apply_matches_recompute(spark):
    full = [(1, 0, "a"), (1, 2, "b"), (1, 5, "c"), (2, 1, "x"), (3, 6, "n")]
    first, second = full[:2] + [full[3]], [full[2], full[4]]
    dim0 = scd2_from_events(_log(spark, first), key="k", ts="ts", attrs=["state"])
    updates = _log(spark, second)
    merged = scd2_apply(dim0, updates, key="k", ts="ts", attrs=["state"])
    recomputed = scd2_from_events(_log(spark, full), key="k", ts="ts", attrs=["state"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, recomputed.collect())
    )


def test_apply_noop_update_vanishes(spark):
    dim0 = scd2_from_events(
        _log(spark, [(1, 0, "a")]), key="k", ts="ts", attrs=["state"]
    )
    merged = scd2_apply(
        dim0, _log(spark, [(1, 3, "a")]), key="k", ts="ts", attrs=["state"]
    )
    rows = merged.collect()
    assert len(rows) == 1
    assert rows[0].valid_from == _t(0) and rows[0].valid_to is None


def test_apply_rejects_history_rewrite(spark):
    dim0 = scd2_from_events(
        _log(spark, [(1, 5, "a")]), key="k", ts="ts", attrs=["state"]
    )
    stale = _log(spark, [(1, 2, "b")])  # predates the open version
    with pytest.raises(Exception, match="predates the open version"):
        scd2_apply(dim0, stale, key="k", ts="ts", attrs=["state"]).collect()


def test_plan_is_single_window_pass(spark):
    log = _log(spark, [(1, 0, "a"), (1, 1, "b")])
    plan = (
        scd2_from_events(log, key="k", ts="ts", attrs=["state"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1  # one shuffle on the key
