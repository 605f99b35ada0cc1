"""UDTF surface (§2.9): the Python UDTF and its native posexplode twin must
produce identical rows — the UDTF is the escape hatch, the native plan is
the production path."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.functions import udtf_surface as U

DOCS = [
    Row(doc_id=1, text="spark shuffles by key"),
    Row(doc_id=2, text="  leading and trailing   spaces  "),
    Row(doc_id=3, text=""),
    Row(doc_id=4, text=None),
    Row(doc_id=5, text="one"),
]


def _norm(rows):
    return sorted((r.doc_id, r.pos, r.token) for r in rows)


def test_udtf_matches_native_posexplode(spark):
    df = spark.createDataFrame(DOCS)
    native = U.tokens_with_positions_native(df, "text", "doc_id").collect()
    via_udtf = U.tokens_with_positions_udtf(spark, df, "text", "doc_id").collect()
    assert _norm(native) == _norm(via_udtf)
    # empty / NULL / whitespace-only docs emit nothing on either path
    ids = {r.doc_id for r in native}
    assert ids == {1, 2, 5}


def test_native_positions_are_zero_based_and_ordered(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    rows = sorted(
        U.tokens_with_positions_native(df, "text", "doc_id").collect(),
        key=lambda r: r.pos,
    )
    assert [(r.pos, r.token) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_udtf_on_fixture_documents(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.sources.tables import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    native = U.tokens_with_positions_native(docs, "text", "doc_id").collect()
    via_udtf = U.tokens_with_positions_udtf(spark, docs, "text", "doc_id").collect()
    assert _norm(native) == _norm(via_udtf) and len(native) > 0


def test_grouped_agg_udaf_matches_native_geo_mean(spark):
    import math

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(g="a", v=2.0), Row(g="a", v=8.0), Row(g="b", v=5.0),
         Row(g="b", v=None), Row(g="c", v=-1.0)]
    )
    udaf = U.geo_mean_udaf()
    got = {r.g: r.gm for r in df.groupBy("g").agg(udaf("v").alias("gm")).collect()}
    native = {r.g: r.gm for r in df.groupBy("g").agg(
        U.geo_mean_native("v").alias("gm")).collect()}
    assert got["a"] == pytest.approx(4.0) and native["a"] == pytest.approx(4.0)
    assert got["b"] == pytest.approx(5.0) and native["b"] == pytest.approx(5.0)
    # group with no positive values: the UDAF's NaN crosses Arrow as NULL,
    # matching the native NULL — both mean "no data"
    assert got["c"] is None or math.isnan(got["c"])
    assert native["c"] is None
