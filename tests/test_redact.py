"""PII redaction: detection counts, scrub completeness, pattern edge cases."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.functions import redact as R

ROWS = [
    Row(id=1, text="mail a.user+tag@sub.example.co.uk now"),
    Row(id=2, text="call 555-123-4567 or 555-000-9999 today"),
    Row(id=3, text="host 192.168.0.1 and 10.0.0.255"),
    Row(id=4, text="clean text with no sensitive content at all"),
    Row(id=5, text="combo u@x.io 555-111-2222 1.2.3.4"),
]


def _df(spark):
    return spark.createDataFrame(ROWS)


def test_counts_per_kind(spark):
    out = {
        r.id: (r.e, r.p, r.i)
        for r in _df(spark)
        .select(
            "id",
            R.pii_count(F.col("text"), "email").alias("e"),
            R.pii_count(F.col("text"), "phone").alias("p"),
            R.pii_count(F.col("text"), "ipv4").alias("i"),
        )
        .collect()
    }
    assert out == {1: (1, 0, 0), 2: (0, 2, 0), 3: (0, 0, 2), 4: (0, 0, 0), 5: (1, 1, 1)}


def test_redaction_leaves_no_residual(spark):
    residual = (
        _df(spark)
        .select(R.pii_total(R.redact_pii(F.col("text"))).alias("n"))
        .agg(F.sum("n").alias("total"))
        .collect()[0]
        .total
    )
    assert residual == 0


def test_redaction_inserts_tokens_and_keeps_clean_text(spark):
    rows = {r.id: r.red for r in _df(spark).select(
        "id", R.redact_pii(F.col("text")).alias("red")).collect()}
    assert rows[1] == "mail [EMAIL] now"
    assert rows[2] == "call [PHONE] or [PHONE] today"
    assert rows[3] == "host [IP] and [IP]"
    assert rows[4] == ROWS[3].text  # untouched
    assert rows[5] == "combo [EMAIL] [PHONE] [IP]"


def test_spark_and_duckdb_patterns_agree(spark):
    """The twins run the IDENTICAL pattern string — assert equal counts on
    the same rows (guards against engine regex-dialect drift)."""
    import duckdb

    sdf = _df(spark).select(
        "id",
        R.pii_count(F.col("text"), "email").alias("e"),
        R.pii_count(F.col("text"), "phone").alias("p"),
        R.pii_count(F.col("text"), "ipv4").alias("i"),
    ).orderBy("id").collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(r.id, r.text) for r in ROWS])
    ddf = con.execute(
        f"""SELECT id, {R.dd_pii_count('text', 'email')} AS e,
            {R.dd_pii_count('text', 'phone')} AS p,
            {R.dd_pii_count('text', 'ipv4')} AS i FROM t ORDER BY id"""
    ).fetchall()
    assert [(r.id, r.e, r.p, r.i) for r in sdf] == ddf
