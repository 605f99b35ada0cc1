"""Sequence-NFA regressions: stages_completed must equal the brute-force
longest-embeddable-prefix on randomized histories, strict-inequality ties
must not chain, and the plan must stay expression-only (no Python UDF)."""

from __future__ import annotations

import datetime as dt
import itertools
import random

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators.seqmatch import sequence_stages

PATTERN = ("a", "b", "c")


def _brute_stages(events: list[tuple[dt.datetime, str]]) -> int:
    """Longest pattern prefix embeddable as strictly-increasing subsequence."""
    evs = sorted(events)
    best = 0
    for k in range(len(PATTERN), 0, -1):
        target = PATTERN[:k]
        # try all index combinations (tiny inputs only)
        for combo in itertools.combinations(range(len(evs)), k):
            if all(evs[i][1] == target[j] for j, i in enumerate(combo)) and all(
                evs[combo[j]][0] < evs[combo[j + 1]][0] for j in range(k - 1)
            ):
                best = k
                break
        if best:
            break
    return best


def test_matches_brute_force_on_random_histories(spark):
    rng = random.Random(7)
    t0 = dt.datetime(2024, 1, 1)
    rows, expected = [], {}
    for uid in range(60):
        n = rng.randint(0, 7)
        evs = [
            (t0 + dt.timedelta(minutes=rng.randint(0, 9)),
             rng.choice(["a", "b", "c", "x"]))
            for _ in range(n)
        ]
        if not evs:  # user with no events never appears in the input frame
            continue
        expected[uid] = _brute_stages(evs)
        rows += [Row(user_id=uid, ts=t, event_type=e) for t, e in evs]
    got = {
        r.user_id: r.stages_completed
        for r in sequence_stages(spark.createDataFrame(rows), PATTERN).collect()
    }
    assert got == expected


def test_equal_timestamps_do_not_chain(spark):
    t = dt.datetime(2024, 1, 1, 12)
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=t, event_type="a"),
            Row(user_id=1, ts=t, event_type="b"),  # same instant: no chain
            Row(user_id=2, ts=t, event_type="a"),
            Row(user_id=2, ts=t + dt.timedelta(seconds=1), event_type="b"),
        ]
    )
    got = {r.user_id: r.stages_completed for r in
           sequence_stages(df, ("a", "b")).collect()}
    assert got == {1: 1, 2: 2}


def test_first_touch_heuristic_counterexample(spark):
    # early unrelated 'b', then a->b in order: first-touch says no (first b
    # precedes first a), subsequence says yes — the case the NFA exists for
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    df = spark.createDataFrame(
        [
            Row(user_id=1, ts=t0, event_type="b"),
            Row(user_id=1, ts=t0 + m, event_type="a"),
            Row(user_id=1, ts=t0 + 2 * m, event_type="b"),
        ]
    )
    assert sequence_stages(df, ("a", "b")).collect()[0].stages_completed == 2


def test_plan_is_expression_only(spark):
    df = spark.createDataFrame(
        [Row(user_id=1, ts=dt.datetime(2024, 1, 1), event_type="a")]
    )
    plan = sequence_stages(df, PATTERN)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
