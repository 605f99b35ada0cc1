"""Star-schema assembly: the reference's pre-merged wide table, owned by us.

The reference consumes one flat ``merged.csv`` (Project.py:9,16) whose joins
happened upstream. Here the ClearVue wide table is rebuilt from the TPC-H
fixtures (column mapping in FIXTURES.md): lineitem fact -> orders ->
customer -> nation -> region + part, then fiscal enrichment + derived
metrics — all in one declarative plan.

Join strategy (100 TB stance):
- region/nation/customer/part are dimensions -> explicit ``broadcast()``; no
  shuffle for those probes.
- lineitem ⋈ orders is fact-to-fact -> shuffled hash/sort-merge join on the
  key; AQE handles skew. (On a managed layout both sides would be bucketed by
  orderkey to make this shuffle-free.)
- Fiscal columns are pure expressions on the fact side (no join needed); the
  broadcast calendar-dim variant exists in functions.fiscal for the case
  where a date dimension is already materialized.

The DuckDB CTE twin (``DD_SALES_CTE``) lives here so oracle SQL can never
drift from the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fiscal
from ..functions.metrics import with_sales_metrics
from ..sources.tables import load_table


def enriched_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ClearVue-shaped wide sales table over the fixture star schema.

    Output columns (FIXTURES.md mapping of Project.py:367-376):
    doc_number, line_number, customer_number, product_code, product_desc,
    brand_desc, region_code, region_desc, quantity, total_line_price,
    last_cost, event_date, asp, cogs, gross_margin, gm_pct, flag_*,
    fin_month_label, fin_month_start, fin_month_end, fin_year,
    fin_month_num, fin_quarter.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("doc_number"),
        F.col("l_linenumber").alias("line_number"),
        "l_partkey",
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("total_line_price"),
        F.col("l_discount").alias("discount"),
        F.to_date("l_shipdate").alias("event_date"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_custkey").alias("customer_number")
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.col("c_mktsegment").alias("mktsegment")
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation_desc")
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("region_code"), F.col("r_name").alias("region_desc")
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("product_code"),
        F.col("p_name").alias("product_desc"),
        F.col("p_brand").alias("brand_desc"),
        F.col("p_retailprice").alias("last_cost"),
    )

    df = (
        li.join(orders, li.doc_number == orders.o_orderkey, "inner")
        .drop("o_orderkey")
        .join(customer, F.col("customer_number") == customer.c_custkey)
        .drop("c_custkey")
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .drop("c_nationkey", "n_nationkey")
        .join(F.broadcast(region), F.col("n_regionkey") == region.region_code)
        .drop("n_regionkey")
        .join(part, li.l_partkey == part.product_code)
        .drop("l_partkey")
    )
    df = with_sales_metrics(df)
    df = fiscal.with_fiscal_columns(df, "event_date")
    return df


#: DuckDB twin of :func:`enriched_sales` — interpolate into oracle SQL as
#: ``WITH {DD_SALES_CTE} SELECT ...``.
DD_SALES_CTE = f"""sales_base AS (
  SELECT
    l.l_orderkey  AS doc_number,
    l.l_linenumber AS line_number,
    o.o_custkey   AS customer_number,
    p.p_partkey   AS product_code,
    p.p_name      AS product_desc,
    p.p_brand     AS brand_desc,
    r.r_regionkey AS region_code,
    r.r_name      AS region_desc,
    c.c_mktsegment AS mktsegment,
    n.n_name      AS nation_desc,
    l.l_quantity  AS quantity,
    l.l_extendedprice AS total_line_price,
    l.l_discount  AS discount,
    p.p_retailprice AS last_cost,
    CAST(l.l_shipdate AS DATE) AS event_date
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n   ON c.c_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  JOIN part p     ON l.l_partkey = p.p_partkey
), sales_anchor AS (
  SELECT *, {fiscal.dd_fiscal_anchor('event_date')} AS fin_anchor FROM sales_base
), sales AS (
  SELECT *,
    CASE WHEN coalesce(quantity, 0) <> 0 THEN total_line_price / quantity END AS asp,
    last_cost * quantity AS cogs,
    total_line_price - last_cost * quantity AS gross_margin,
    CASE WHEN abs(total_line_price) > 1e-9
         THEN (total_line_price - last_cost * quantity) / total_line_price END AS gm_pct,
    coalesce(quantity < 0, false) AS flag_negative_qty,
    coalesce(total_line_price < 0, false) AS flag_negative_price,
    (coalesce(total_line_price, 0) = 0 AND coalesce(quantity, 0) <> 0)
      AS flag_zero_price_nonzero_qty,
    {fiscal.dd_fiscal_select_list('fin_anchor')}
  FROM sales_anchor
)"""
