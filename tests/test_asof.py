"""As-of join semantics: backward/forward, inclusive bounds, left-outer
NULLs, and plan shape (one shuffle by key, no range cross join)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators.asof import asof_join


def _ts(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


LEFT = [
    Row(lid=1, k="a", ts=_ts(10)),
    Row(lid=2, k="a", ts=_ts(20)),
    Row(lid=3, k="b", ts=_ts(5)),   # before any right row for key b
    Row(lid=4, k="c", ts=_ts(15)),  # key absent on right side
]
RIGHT = [
    Row(k="a", ts=_ts(10), px=1.0),   # equal ts -> inclusive match for lid=1
    Row(k="a", ts=_ts(15), px=2.0),
    Row(k="a", ts=_ts(25), px=3.0),
    Row(k="b", ts=_ts(8), px=9.0),
]


def _run(spark, direction):
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="k",
        direction=direction,
    )
    return {r.lid: (r.ts_matched, r.px) for r in out.collect()}


def test_backward_inclusive_and_outer(spark):
    m = _run(spark, "backward")
    assert m[1] == (_ts(10), 1.0)   # equal ts matches (inclusive)
    assert m[2] == (_ts(15), 2.0)   # latest at-or-before, not the later row
    assert m[3] == (None, None)     # no right row at-or-before
    assert m[4] == (None, None)     # key never on right side


def test_forward_direction(spark):
    m = _run(spark, "forward")
    assert m[1] == (_ts(10), 1.0)   # inclusive in forward direction too
    assert m[2] == (_ts(25), 3.0)   # earliest at-or-after
    assert m[3] == (_ts(8), 9.0)
    assert m[4] == (None, None)


def test_single_shuffle_no_cross_join(spark):
    out = asof_join(
        spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT), on="k"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tolerance_voids_stale_matches(spark):
    """merge_asof(tolerance=...) parity: lid=2's nearest click is 5 days
    back — a 1-day tolerance voids it (row kept, NULL match); lid=1's
    same-instant match survives."""
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="k",
        tolerance_seconds=86400,
    )
    m = {r.lid: (r.ts_matched, r.px) for r in out.collect()}
    assert m[1] == (_ts(10), 1.0)   # delta 0 <= tol
    assert m[2] == (None, None)     # delta 5 days > tol -> voided, row kept
    assert m[3] == (None, None)
    assert m[4] == (None, None)
    assert len(m) == len(LEFT)      # tolerance never drops rows


def test_nearest_direction(spark):
    m = _run(spark, "nearest")
    assert m[1] == (_ts(10), 1.0)   # exact hit
    # lid=2 (day 20): backward day 15 is 5 days, forward day 25 is 5 days
    # -> equidistant resolves BACKWARD (pandas merge_asof parity)
    assert m[2] == (_ts(15), 2.0)
    assert m[3] == (_ts(8), 9.0)    # only a forward candidate exists
    assert m[4] == (None, None)


def test_nearest_matches_pandas_merge_asof(spark):
    """Randomized parity against pandas.merge_asof(direction='nearest') —
    the reference implementation of the semantics."""
    import random

    import pandas as pd

    rng = random.Random(7)
    left = [
        Row(lid=i, k=rng.choice("abc"), ts=_ts(rng.randint(1, 28), rng.randint(0, 23)))
        for i in range(40)
    ]
    right = []
    used = set()
    for j in range(30):
        key = (rng.choice("abc"), rng.randint(1, 28), rng.randint(0, 23))
        if key in used:
            continue  # unique (k, ts): asof right side must be unique per key+ts
        used.add(key)
        right.append(Row(k=key[0], ts=_ts(key[1], key[2]), px=float(j)))
    got = {
        r.lid: r.px
        for r in asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="k",
            direction="nearest",
        ).collect()
    }
    lp = pd.DataFrame([r.asDict() for r in left]).sort_values("ts")
    rp = pd.DataFrame([r.asDict() for r in right]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="nearest")
    expected = {int(r.lid): (None if pd.isna(r.px) else float(r.px))
                for r in exp.itertuples()}
    assert got == expected


def test_nearest_with_tolerance(spark):
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="k",
        direction="nearest",
        tolerance_seconds=2 * 86400,
    )
    m = {r.lid: (r.ts_matched, r.px) for r in out.collect()}
    assert m[1] == (_ts(10), 1.0)   # |delta| = 0
    assert m[2] == (None, None)     # nearest is 5 days off > 2-day tolerance
    assert m[3] == (None, None)     # forward hit 3 days off > tolerance


def test_allow_exact_matches_false_is_strict(spark):
    out = asof_join(
        spark.createDataFrame(LEFT),
        spark.createDataFrame(RIGHT),
        on="k",
        allow_exact_matches=False,
    )
    m = {r.lid: (r.ts_matched, r.px) for r in out.collect()}
    # lid=1's equal-ts match (day 10) is excluded under strict; there is
    # no earlier right row for key a -> NULL
    assert m[1] == (None, None)
    assert m[2] == (_ts(15), 2.0)   # unaffected (strictly before)


def test_strict_matches_pandas_merge_asof(spark):
    """Randomized parity for allow_exact_matches=False across directions."""
    import random

    import pandas as pd

    rng = random.Random(11)
    left = [
        Row(lid=i, k=rng.choice("ab"), ts=_ts(rng.randint(1, 20), rng.choice([0, 6, 12])))
        for i in range(30)
    ]
    right, used = [], set()
    for j in range(25):
        key = (rng.choice("ab"), rng.randint(1, 20), rng.choice([0, 6, 12]))
        if key in used:
            continue
        used.add(key)
        right.append(Row(k=key[0], ts=_ts(key[1], key[2]), px=float(j)))
    lp = pd.DataFrame([r.asDict() for r in left]).sort_values("ts")
    rp = pd.DataFrame([r.asDict() for r in right]).sort_values("ts")
    for direction in ("backward", "forward", "nearest"):
        got = {
            r.lid: r.px
            for r in asof_join(
                spark.createDataFrame(left),
                spark.createDataFrame(right),
                on="k",
                direction=direction,
                allow_exact_matches=False,
            ).collect()
        }
        exp = pd.merge_asof(
            lp, rp, on="ts", by="k", direction=direction,
            allow_exact_matches=False,
        )
        expected = {int(r.lid): (None if pd.isna(r.px) else float(r.px))
                    for r in exp.itertuples()}
        assert got == expected, direction


def test_multi_key_on(spark):
    left = [
        Row(lid=1, k="a", g=1, ts=_ts(10)),
        Row(lid=2, k="a", g=2, ts=_ts(10)),  # same k, different second key
    ]
    right = [
        Row(k="a", g=1, ts=_ts(9), px=1.0),
        Row(k="a", g=2, ts=_ts(8), px=2.0),
    ]
    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on=["k", "g"],
    )
    m = {r.lid: r.px for r in out.collect()}
    assert m == {1: 1.0, 2: 2.0}
