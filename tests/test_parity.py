"""One unit test per pandas->Spark semantics delta (SURVEY.md §2.10)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.functions import cleaning
from nosql_based_business_intelligence_system_spark.functions.metrics import (
    quality_flags,
    with_sales_metrics,
)


def test_all_null_sum_is_zero(spark):
    """§2.10(a): pandas sum of all-NaN = 0.0; sum0 reproduces it."""
    df = spark.createDataFrame([Row(x=None), Row(x=None)], "x double")
    out = df.agg(cleaning.sum0(F.col("x")).alias("s")).collect()[0]
    assert out.s == 0.0


def test_coerce_double_null_on_garbage(spark):
    """§2.10(b): errors='coerce' parity — garbage -> NULL, not error."""
    df = spark.createDataFrame(
        [Row(x="12.5"), Row(x="abc"), Row(x=""), Row(x=None)], "x string"
    )
    vals = [r.v for r in df.select(cleaning.coerce_double(F.col("x")).alias("v")).collect()]
    assert vals == [12.5, None, None, None]


def test_null_comparison_flag_is_false(spark):
    """§2.10(c): NULL < 0 must flag False (pandas NaN<0 == False)."""
    df = spark.createDataFrame(
        [Row(p=None, q=None), Row(p=-1.0, q=2.0), Row(p=0.0, q=3.0)],
        "p double, q double",
    )
    out = df.withColumns(quality_flags(F.col("p"), F.col("q"))).collect()
    assert [r.flag_negative_price for r in out] == [False, True, False]
    assert [r.flag_negative_qty for r in out] == [False, False, False]
    assert [r.flag_zero_price_nonzero_qty for r in out] == [False, False, True]


def test_stringified_null_label_groups(spark):
    """§2.10(d): NULL label becomes the literal "None" group (Project.py:99,124)."""
    df = spark.createDataFrame(
        [Row(label=None, v=1.0), Row(label="2024-01", v=2.0), Row(label=None, v=3.0)],
        "label string, v double",
    )
    out = {
        r.g: r.s
        for r in df.groupBy(
            cleaning.stringify_null_label(F.col("label")).alias("g")
        )
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    assert out == {"None": 4.0, "2024-01": 2.0}


def test_clean_string_sentinels(spark):
    df = spark.createDataFrame(
        [Row(s="  x  "), Row(s="nan"), Row(s=" None "), Row(s="null"), Row(s="")],
        "s string",
    )
    vals = [r.v for r in df.select(cleaning.clean_string(F.col("s")).alias("v")).collect()]
    assert vals == ["x", None, None, None, None]


def test_event_date_row_coalesce(spark):
    import datetime as dt

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 2, 2)
    df = spark.createDataFrame(
        [Row(t=d1, d=d2), Row(t=None, d=d2), Row(t=None, d=None)],
        "t date, d date",
    )
    vals = [
        r.v
        for r in df.select(
            cleaning.event_date(F.col("t"), F.col("d")).alias("v")
        ).collect()
    ]
    assert vals == [d1, d2, None]


def test_metrics_guards(spark):
    df = spark.createDataFrame(
        [
            Row(total_line_price=10.0, quantity=4.0, last_cost=2.0),
            Row(total_line_price=10.0, quantity=0.0, last_cost=2.0),  # asp guard
            Row(total_line_price=0.0, quantity=5.0, last_cost=2.0),  # gm_pct guard
            Row(total_line_price=None, quantity=None, last_cost=None),
        ]
    )
    out = with_sales_metrics(df).collect()
    assert out[0].asp == 2.5 and out[0].cogs == 8.0
    assert out[0].gross_margin == 2.0 and abs(out[0].gm_pct - 0.2) < 1e-12
    assert out[1].asp is None
    assert out[2].gm_pct is None
    assert out[3].asp is None and out[3].cogs is None


def test_dec2d_matches_duckdb_above_2pow53_scaled_units(spark):
    """The sf1-discovered cast hazard, pinned: a DECIMAL(38,6) whose scaled
    integer exceeds 2^53 must cast to the SAME double on both engines via
    the string path (direct casts double-round differently: DuckDB gave
    ...380.89996 where Java gave ...380.9 for 301466167380.900000)."""
    import duckdb

    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.functions.cleaning import (
        dd_dec2d,
        dec2d,
    )

    cases = ["301466167380.900000", "9007199254740993.100001",
             "-301466167380.900000", "123.456789"]
    con = duckdb.connect()
    for v in cases:
        got = (
            spark.range(1)
            .select(dec2d(F.lit(v).cast("decimal(38,6)")).alias("d"))
            .collect()[0]
            .d
        )
        dec_expr = "CAST('" + v + "' AS DECIMAL(38,6))"
        want = con.execute("SELECT " + dd_dec2d(dec_expr)).fetchone()[0]
        assert got == want, (v, got, want)
        # and it is the correctly-rounded double of the exact decimal
        assert got == float(v)


def test_spark_percentile_twin_on_duplicate_heavy_data(spark):
    """The second sf1 hazard, pinned: Spark's percentile short-circuits
    equal order statistics to the exact value; the manual DuckDB twin
    (_dd_spark_percentile) must reproduce it where quantile_cont drifts
    an ulp (weights summing to ~1 over two EQUAL values)."""
    import duckdb

    from pyspark.sql import functions as F

    from nosql_based_business_intelligence_system_spark.queries.stats_suite import (
        _dd_spark_percentile,
    )

    # 11 copies of one value then a spread: p50 lands between two equal
    # order statistics at a fractional position
    vals = [495070.57] * 11 + [600000.11, 700000.23, 800000.37]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    for q in (0.5, 0.37, 0.9):
        sp = df.agg(F.expr(f"percentile(v, {q})").alias("p")).collect()[0].p
        dk = con.execute(
            f"""SELECT {_dd_spark_percentile(q)} FROM (
                  SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS rk,
                         COUNT(*) OVER () AS n FROM t) GROUP BY n"""
        ).fetchone()[0]
        assert sp == dk, (q, sp, dk)
