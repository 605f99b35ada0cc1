"""SQL surface: registered views answer ANSI SQL with the same results as
the DataFrame API (they compile to the same logical plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.sources.tables import load_table, register_views


def test_sql_equals_dataframe(spark, sf_smoke):
    register_views(spark, sf_smoke)
    sql = spark.sql(
        """
        SELECT l_returnflag, SUM(l_extendedprice) AS revenue
        FROM lineitem WHERE l_quantity > 10
        GROUP BY l_returnflag
        """
    )
    df = (
        load_table(spark, sf_smoke, "lineitem")
        .filter(F.col("l_quantity") > 10)
        .groupBy("l_returnflag")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_join_over_views(spark, sf_smoke):
    register_views(spark, sf_smoke)
    out = spark.sql(
        """
        SELECT r_name, COUNT(*) AS n
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        """
    )
    rows = out.collect()
    assert len(rows) == 5 and sum(r.n for r in rows) == 150
