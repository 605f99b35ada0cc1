"""Plan-doctor rule tests: each smell is planted and must be caught; the
engine's own flagship plans must come back clean of error-severity
findings."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Row, Window

from nosql_based_business_intelligence_system_spark.plans import doctor

SF = "/root/testdata/sf0.001"


def _rules(df):
    return {f["rule"] for f in doctor.diagnose(df)}


def test_cartesian_flagged(spark):
    a = spark.createDataFrame([Row(x=1)])
    b = spark.createDataFrame([Row(y=1)])
    assert "cartesian_join" in _rules(a.crossJoin(b))


def test_python_udf_flagged(spark):
    from pyspark.sql.types import IntegerType

    f = F.udf(lambda x: x + 1, IntegerType())
    df = spark.createDataFrame([Row(x=1)]).select(f("x"))
    assert "python_row_boundary" in _rules(df)


def test_global_window_flagged_and_partitioned_not(spark):
    df = spark.createDataFrame([Row(k=1, v=2.0), Row(k=2, v=3.0)])
    w_global = Window.orderBy("v")
    w_part = Window.partitionBy("k").orderBy("v")
    assert "global_window" in _rules(
        df.withColumn("r", F.row_number().over(w_global))
    )
    assert "global_window" not in _rules(
        df.withColumn("r", F.row_number().over(w_part))
    )


def test_global_sort_flagged_but_topk_not(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    assert "global_sort" in _rules(df.orderBy("l_extendedprice"))
    assert "global_sort" not in _rules(
        df.orderBy("l_extendedprice").limit(5)
    )


def test_clean_flagship_has_no_errors(spark):
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    df = QUERIES["sales_by_fiscal_month"].fn(spark, SF)
    errors = [
        f for f in doctor.diagnose(df) if f["severity"] == "error"
    ]
    assert errors == []


def test_report_format(spark):
    a = spark.createDataFrame([Row(x=1)])
    b = spark.createDataFrame([Row(y=1)])
    rep = doctor.report(a.crossJoin(b))
    assert "[error] cartesian_join" in rep


def test_allowed_downgrades_but_keeps_finding(spark):
    a = spark.createDataFrame([Row(x=1)])
    b = spark.createDataFrame([Row(y=1)])
    out = doctor.diagnose(
        a.crossJoin(b), allow={"cartesian_join": "bounded side"}
    )
    cart = [f for f in out if f["rule"] == "cartesian_join"]
    assert cart and all(f["severity"] == "allowed" for f in cart)
    assert "bounded side" in cart[0]["detail"]


def test_hof_reeval_catches_inlined_tokenizer(spark):
    """Deliberate reintroduction of the r12 lm.py shape: T.tokens(text)
    INLINED into the bigram transform — the split+filter tokenizer sits
    inside the HOF lambda body with no lambda-variable reference, so it
    re-evaluates once per element (measured 6x CPU at sf10). The rule
    must flag it (proves the registry sweep can fail)."""
    from nosql_based_business_intelligence_system_spark.functions import text as T
    from nosql_based_business_intelligence_system_spark.operators.lm import (
        token_bigrams,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    inlined = df.select(
        "doc_id", F.explode_outer(token_bigrams(T.tokens(F.col("text")))).alias("bg")
    )
    assert "hof_reeval" in _rules(inlined)


def test_hof_reeval_clean_when_projected(spark):
    """The fixed shape — token array projected as a real column before
    the HOF consumes it — must NOT be flagged (multiple consumer
    references keep CollapseProject from re-inlining it)."""
    from nosql_based_business_intelligence_system_spark.functions import text as T
    from nosql_based_business_intelligence_system_spark.operators.lm import (
        token_bigrams,
    )

    df = spark.read.parquet(f"{SF}/documents.parquet")
    toked = df.select("doc_id", T.tokens(F.col("text")).alias("__toks"))
    projected = toked.select(
        "doc_id", F.explode_outer(token_bigrams(F.col("__toks"))).alias("bg")
    )
    assert "hof_reeval" not in _rules(projected)


def test_hof_reeval_ignores_per_element_regex(spark):
    """A tokenizer-class expression applied TO the lambda variable is
    per-element work by construction (each element processed once), not
    re-evaluation — must not be flagged."""
    df = spark.read.parquet(f"{SF}/documents.parquet")
    per_el = df.select(
        F.transform(
            F.split("text", " "), lambda t: F.regexp_replace(t, "a", "b")
        ).alias("cleaned")
    )
    assert "hof_reeval" not in _rules(per_el)
