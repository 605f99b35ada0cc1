"""Fiscal-calendar semantics tests (SURVEY.md §5.2.4).

Reference rules from /root/reference/Project.py:66-126: fiscal month ends on
the last Friday of the civil month; a date after its month's last Friday
rolls forward (Dec -> next-year Jan); month start = last Saturday of the
previous civil month; quarter = fiscal (m-1)//3+1.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.functions import fiscal

# Hand-verified boundary cases (also cross-checked against the DuckDB oracle
# by tools/verify_local.py::fiscal_calendar over every date in the fixtures).
CASES = [
    # (date, label, start, end, year, month, quarter)
    ("2024-01-26", "2024-01", "2023-12-30", "2024-01-26", 2024, 1, "FY2024 Q1"),
    ("2024-01-27", "2024-02", "2024-01-27", "2024-02-23", 2024, 2, "FY2024 Q1"),
    ("2024-12-27", "2024-12", "2024-11-30", "2024-12-27", 2024, 12, "FY2024 Q4"),
    ("2024-12-28", "2025-01", "2024-12-28", "2025-01-31", 2025, 1, "FY2025 Q1"),
    ("1995-01-02", "1995-01", "1994-12-31", "1995-01-27", 1995, 1, "FY1995 Q1"),
    ("2000-02-29", "2000-03", "2000-02-26", "2000-03-31", 2000, 3, "FY2000 Q1"),
]


def _enrich(spark, dates):
    df = spark.createDataFrame(
        [Row(event_date=dt.date.fromisoformat(d)) for d in dates], "event_date date"
    )
    return fiscal.with_fiscal_columns(df, "event_date")


def test_boundary_cases(spark):
    out = {
        r.event_date.isoformat(): r
        for r in _enrich(spark, [c[0] for c in CASES]).collect()
    }
    for d, label, start, end, year, month, quarter in CASES:
        r = out[d]
        assert r.fin_month_label == label, (d, r.fin_month_label)
        assert r.fin_month_start.isoformat() == start, (d, r.fin_month_start)
        assert r.fin_month_end.isoformat() == end, (d, r.fin_month_end)
        assert r.fin_year == year and r.fin_month_num == month
        assert r.fin_quarter == quarter


def test_null_date_yields_null_fiscal(spark):
    df = spark.createDataFrame([Row(event_date=None)], "event_date date")
    r = fiscal.with_fiscal_columns(df).collect()[0]
    assert r.fin_month_label is None and r.fin_year is None
    assert r.fin_month_start is None and r.fin_month_end is None


def test_membership_property(spark):
    """Every date lies within its own fiscal month's [start, end] bounds and
    at most 7 days of slack exist at each boundary (last-Sat/last-Fri rule)."""
    days = [
        (dt.date(1995, 1, 1) + dt.timedelta(days=17 * i)).isoformat()
        for i in range(260)
    ]
    rows = _enrich(spark, days).collect()
    for r in rows:
        assert r.fin_month_start <= r.event_date <= r.fin_month_end, r
        assert r.fin_month_end.weekday() == 4  # Friday
        assert r.fin_month_start.weekday() == 5  # Saturday
        assert (r.fin_month_end - r.fin_month_start).days <= 41


def test_labels_partition_date_line(spark):
    """Consecutive dates never skip a fiscal month; label changes only at a
    Saturday following the last Friday."""
    days = [(dt.date(2023, 11, 1) + dt.timedelta(days=i)) for i in range(120)]
    rows = sorted(
        _enrich(spark, [d.isoformat() for d in days]).collect(),
        key=lambda r: r.event_date,
    )
    for prev, cur in zip(rows, rows[1:]):
        if prev.fin_month_label != cur.fin_month_label:
            assert cur.event_date.weekday() == 5  # roll happens on a Saturday
            assert (cur.fin_year, cur.fin_month_num) > (
                prev.fin_year,
                prev.fin_month_num,
            )


def test_dim_variant_matches_expression_variant(spark):
    days = [
        (dt.date(1995, 1, 1) + dt.timedelta(days=23 * i)).isoformat() for i in range(120)
    ]
    expr = _enrich(spark, days)
    base = spark.createDataFrame(
        [Row(event_date=dt.date.fromisoformat(d)) for d in days], "event_date date"
    )
    dim = fiscal.with_fiscal_columns_via_dim(
        base, spark, start="1994-12-01", end="2003-01-31"
    ).select(*expr.columns)
    assert expr.exceptAll(dim).count() == 0
    assert dim.exceptAll(expr).count() == 0


def test_calendar_dim_is_dense_and_unique(spark):
    dim = fiscal.fiscal_calendar_dim(spark, "2024-01-01", "2024-12-31")
    assert dim.count() == 366
    assert dim.select("cal_date").distinct().count() == 366
    # every fiscal month in range spans consecutive dates
    n_labels = dim.select("fin_month_label").distinct().count()
    assert n_labels in (12, 13)


def test_fin_week_label_properties(spark):
    """Week index is 1..6 and the label's month prefix equals fin_month_label."""
    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.functions import fiscal

    dates = spark.range(1).select(
        F.explode(
            F.sequence(
                F.to_date(F.lit("2023-01-01")),
                F.to_date(F.lit("2025-12-31")),
                F.expr("interval 1 day"),
            )
        ).alias("d")
    )
    enriched = dates.withColumns(fiscal.fiscal_columns(F.col("d")))
    bad = enriched.filter(
        (F.substring("fin_week_label", 1, 7) != F.col("fin_month_label"))
        | ~F.substring("fin_week_label", 9, 2).cast("int").between(1, 6)
        | (F.datediff(F.col("d"), F.col("fin_month_start")) < 0)
    )
    assert bad.count() == 0


def test_dim_variant_rejects_non_date_with_typeerror(spark):
    """r10 ADVICE: the DATE contract must survive `python -O` — explicit
    TypeError, not assert; a missing column gets its own KeyError."""
    import pytest

    ts = spark.createDataFrame(
        [Row(event_date=dt.datetime(2020, 1, 1, 12))], "event_date timestamp"
    )
    with pytest.raises(TypeError, match="DATE-typed"):
        fiscal.with_fiscal_columns_via_dim(
            ts, spark, start="2019-12-01", end="2020-02-29"
        )
    ok = spark.createDataFrame(
        [Row(event_date=dt.date(2020, 1, 1))], "event_date date"
    )
    with pytest.raises(KeyError, match="no_such_col"):
        fiscal.with_fiscal_columns_via_dim(
            ok, spark, date_col="no_such_col",
            start="2019-12-01", end="2020-02-29",
        )
