"""Reference analytics suite: every aggregate/filter/top-k the reference
computes (SURVEY.md §2 A1-A7, J1, O1-O2, F1-F4, NF2-NF7, DF3-DF10), phrased
over the fixture star schema via the enriched-sales plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fiscal
from ..functions.cleaning import dd_dsum0, dd_dsum0d, dsum0, dsum0d, sum0
from ..operators.star import DD_SALES_CTE, enriched_sales
from ..sources.tables import load_table


from .base import Query as _q


# --- A1+A2 (+J1 fused): revenue & gross margin by fiscal month --------------


def sales_by_fiscal_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:183-190 — revenue + gross margin + gm_pct per fiscal month.

    The reference computes two grouped sums and inner-joins them (J1); in
    Spark both sums fuse into ONE hash aggregate (single shuffle) and the
    ratio is a post-aggregation projection.
    """
    return (
        enriched_sales(spark, sf_dir, columns={"fin_month_label", "total_line_price", "gross_margin"})
        .groupBy("fin_month_label")
        .agg(
            # decimal accumulation (order-independent), double at the output
            # boundary: the sf1 rehearsal showed plain double sums drifting
            # from the oracle in the 10th digit once groups pass ~50k rows
            dsum0d(F.col("total_line_price")).alias("revenue"),
            dsum0d(F.col("gross_margin")).alias("gross_margin"),
        )
        .withColumn("gm_pct", F.col("gross_margin") / F.col("revenue"))
    )


SALES_BY_FISCAL_MONTH_SQL = f"""WITH {DD_SALES_CTE}
SELECT fin_month_label,
       {dd_dsum0d('total_line_price')} AS revenue,
       {dd_dsum0d('gross_margin')} AS gross_margin,
       {dd_dsum0d('gross_margin')} / {dd_dsum0d('total_line_price')} AS gm_pct
FROM sales GROUP BY fin_month_label"""


# --- DF3-DF9: the fiscal calendar itself, verified date-by-date -------------


def fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All six fiscal columns for every distinct event date in the fact table.

    Distinct-first keeps the expression tree evaluated once per date, and the
    oracle verifies the calendar semantics exhaustively over the data's range.
    """
    dates = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.to_date("l_shipdate").alias("event_date"))
        .distinct()
    )
    return fiscal.with_fiscal_columns(dates, "event_date")


FISCAL_CALENDAR_SQL = f"""WITH dates AS (
  SELECT DISTINCT CAST(l_shipdate AS DATE) AS event_date FROM lineitem
), anchored AS (
  SELECT event_date, {fiscal.dd_fiscal_anchor('event_date')} AS fin_anchor FROM dates
)
SELECT event_date, {fiscal.dd_fiscal_select_list('fin_anchor')} FROM anchored"""


# --- A3 + O1 + O2 + SF5: top-15 products by revenue -------------------------


def top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:195-202 — top-15 products by revenue, truncated labels.

    Tiebreak on product_desc makes the top-k deterministic (SURVEY §5.2.2).
    Spark plans TakeOrderedAndProject — true top-k, no full sort.
    """
    return (
        enriched_sales(spark, sf_dir, columns={"product_desc", "total_line_price"})
        .groupBy("product_desc")
        .agg(dsum0d(F.col("total_line_price")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("product_desc"))
        .limit(15)
        .select(
            F.concat(F.substring("product_desc", 1, 30), F.lit("...")).alias(
                "product_label"
            ),
            "revenue",
        )
    )


TOP_PRODUCTS_SQL = f"""WITH {DD_SALES_CTE}
SELECT substring(product_desc, 1, 30) || '...' AS product_label, revenue
FROM (
  SELECT product_desc, {dd_dsum0d('total_line_price')} AS revenue
  FROM sales GROUP BY product_desc
  ORDER BY revenue DESC, product_desc ASC LIMIT 15
)"""


# --- A4: revenue & units by fiscal month x region x brand -------------------


def sales_by_region_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:211-217 — 3-key grouped sums (month x region x brand)."""
    return (
        enriched_sales(spark, sf_dir, columns={"fin_month_label", "region_desc", "brand_desc", "quantity", "total_line_price"})
        .groupBy("fin_month_label", "region_desc", "brand_desc")
        .agg(
            dsum0d(F.col("total_line_price")).alias("revenue"),
            # quantity is integer-valued: its double sum is exact in any
            # order, no decimal needed
            sum0(F.col("quantity")).alias("units"),
        )
    )


SALES_BY_REGION_BRAND_SQL = f"""WITH {DD_SALES_CTE}
SELECT fin_month_label, region_desc, brand_desc,
       {dd_dsum0d('total_line_price')} AS revenue,
       coalesce(SUM(quantity), 0.0) AS units
FROM sales GROUP BY fin_month_label, region_desc, brand_desc"""


# --- A5: AR by fiscal month x region (orders-grain stand-in) ----------------


def ar_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:220-224 — ar_total per fiscal month x region.

    AR stand-in per FIXTURES.md: o_totalprice at orders grain, region via
    customer->nation->region broadcast chain; fiscal month of o_orderdate.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_totalprice").alias("total_due"),
        F.to_date("o_orderdate").alias("event_date"),
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region_desc")
    )
    df = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    df = df.withColumn(
        "fin_month_label", fiscal.fiscal_columns(F.col("event_date"))["fin_month_label"]
    )
    return df.groupBy("fin_month_label", "region_desc").agg(
        dsum0d(F.col("total_due")).alias("ar_total")
    )


AR_BY_REGION_SQL = f"""WITH ar AS (
  SELECT r.r_name AS region_desc, o.o_totalprice AS total_due,
         {fiscal.dd_fiscal_anchor("CAST(o.o_orderdate AS DATE)")} AS fin_anchor
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
)
SELECT strftime(fin_anchor, '%Y-%m') AS fin_month_label, region_desc,
       {dd_dsum0d('total_due')} AS ar_total
FROM ar GROUP BY fin_month_label, region_desc"""


# --- A6: grand-total summary scalars ----------------------------------------


def summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:275-287,407-418 — the Excel summary sheet scalars.

    Exact distinct-month count (matches pandas .nunique), not approx.

    total_revenue is a decimal sum (dsum0): a 60k-row double SUM accumulates
    in partial-agg order and hash-diverges from any sequential oracle in the
    last ulp; decimal addition is exact, so the result is order-independent.

    Shape note (r5 verdict item 5): mixing countDistinct with plain
    aggregates plans an Expand that pushes the fact stream through the
    aggregate TWICE — the worst decade ratio in the sf10 ladder (8.5x).
    Aggregating per fin_month_label first (the label space is calendar-
    bounded) and finalizing over the group rows computes the identical
    scalars — count/min/max/decimal-sum are associative, the distinct
    label count is the non-null group count — in ONE pass, no Expand.
    """
    from ..functions.cleaning import MONEY_DEC, dec2d, dsum0

    per_month = (
        enriched_sales(
            spark, sf_dir,
            columns={"event_date", "fin_month_label", "total_line_price"},
        )
        .groupBy("fin_month_label")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.min("event_date").alias("__mind"),
            F.max("event_date").alias("__maxd"),
            # decimal accumulation stays decimal between the two levels
            dsum0(F.col("total_line_price")).alias("__rev"),
        )
    )
    return per_month.agg(
        F.coalesce(F.sum("__n"), F.lit(0)).cast("bigint").alias("row_count"),
        F.min("__mind").alias("min_date"),
        F.max("__maxd").alias("max_date"),
        # portable DOUBLE at the output boundary (see dec2d)
        dec2d(
            F.coalesce(F.sum("__rev"), F.lit(0).cast(MONEY_DEC))
        ).alias("total_revenue"),
        # count skips the NULL-label group, matching COUNT(DISTINCT ...)
        F.count("fin_month_label").alias("n_fiscal_months"),
    )


SUMMARY_STATS_SQL = f"""WITH {DD_SALES_CTE}
SELECT CAST(COUNT(*) AS BIGINT) AS row_count,
       MIN(event_date) AS min_date,
       MAX(event_date) AS max_date,
       {dd_dsum0d('total_line_price')} AS total_revenue,
       CAST(COUNT(DISTINCT fin_month_label) AS BIGINT) AS n_fiscal_months
FROM sales"""


# --- A7 + F2: quality-flag counts -------------------------------------------


def quality_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project.py:407-410 — count of rows tripping each quality flag."""
    return enriched_sales(spark, sf_dir, columns={"flag_negative_qty", "flag_negative_price", "flag_zero_price_nonzero_qty"}).agg(
        F.sum(F.col("flag_negative_qty").cast("bigint")).alias("n_negative_qty"),
        F.sum(F.col("flag_negative_price").cast("bigint")).alias("n_negative_price"),
        F.sum(F.col("flag_zero_price_nonzero_qty").cast("bigint")).alias(
            "n_zero_price_nonzero_qty"
        ),
        F.sum(
            (
                F.col("flag_negative_qty")
                | F.col("flag_negative_price")
                | F.col("flag_zero_price_nonzero_qty")
            ).cast("bigint")
        ).alias("n_any_flag"),
    )


QUALITY_FLAG_COUNTS_SQL = f"""WITH {DD_SALES_CTE}
SELECT CAST(SUM(CAST(flag_negative_qty AS BIGINT)) AS BIGINT) AS n_negative_qty,
       CAST(SUM(CAST(flag_negative_price AS BIGINT)) AS BIGINT) AS n_negative_price,
       CAST(SUM(CAST(flag_zero_price_nonzero_qty AS BIGINT)) AS BIGINT)
         AS n_zero_price_nonzero_qty,
       CAST(SUM(CAST(flag_negative_qty OR flag_negative_price
                     OR flag_zero_price_nonzero_qty AS BIGINT)) AS BIGINT) AS n_any_flag
FROM sales"""


# --- NF2-NF7: per-line derived metrics (row-level verification) -------------


def line_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """asp/cogs/gross_margin/gm_pct verified row-by-row (Project.py:128-144)."""
    return enriched_sales(spark, sf_dir, columns={"doc_number", "line_number", "quantity", "total_line_price", "asp", "cogs", "gross_margin", "gm_pct"}).select(
        "doc_number",
        "line_number",
        "quantity",
        "total_line_price",
        "asp",
        "cogs",
        "gross_margin",
        "gm_pct",
    )


LINE_METRICS_SQL = f"""WITH {DD_SALES_CTE}
SELECT doc_number, line_number, quantity, total_line_price,
       asp, cogs, gross_margin, gm_pct
FROM sales"""


# --- F1-F3: filters with real predicates ------------------------------------


def high_discount_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive range filter pushed to the Parquet scan (F-coverage).

    Authored filter-first so Catalyst pushes both predicates into the scan
    (PushedFilters on l_discount/l_quantity) before any join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_discount") >= 0.08) & (F.col("l_quantity") < 5))
        .select(
            F.col("l_orderkey").alias("doc_number"),
            F.col("l_linenumber").alias("line_number"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("total_line_price"),
            F.col("l_discount").alias("discount"),
        )
    )


HIGH_DISCOUNT_LINES_SQL = """SELECT l_orderkey AS doc_number, l_linenumber AS line_number,
       l_quantity AS quantity, l_extendedprice AS total_line_price,
       l_discount AS discount
FROM lineitem WHERE l_discount >= 0.08 AND l_quantity < 5"""


def sales_by_fiscal_month_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same answer as ``sales_by_fiscal_month`` but enriched via the
    broadcast fiscal CALENDAR DIMENSION instead of per-row expressions —
    the 100 TB path (one broadcast probe replaces re-evaluating the
    calendar expression tree on every fact row). Oracle: identical SQL to
    the expression variant, which is itself the equivalence proof."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("event_date"),
        F.col("l_extendedprice").alias("total_line_price"),
    )
    enriched = fiscal.with_fiscal_columns_via_dim(
        li, spark, "event_date", start="1992-01-01", end="2002-12-31"
    )
    return enriched.groupBy("fin_month_label").agg(
        dsum0d(F.col("total_line_price")).alias("revenue")
    )


SALES_BY_FISCAL_MONTH_DIM_SQL = f"""WITH anchored AS (
  SELECT CAST(l_shipdate AS DATE) AS event_date,
         l_extendedprice AS total_line_price,
         {fiscal.dd_fiscal_anchor('CAST(l_shipdate AS DATE)')} AS fin_anchor
  FROM lineitem
)
SELECT strftime(fin_anchor, '%Y-%m') AS fin_month_label,
       {dd_dsum0d('total_line_price')} AS revenue
FROM anchored GROUP BY 1"""


def monthly_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densified monthly revenue: every fiscal month between the corpus min
    and max appears, zero-filled when no sales landed in it — the series
    a BI chart needs (the reference's line chart, Project.py:231-245,
    silently skips empty months). sequence() generates the month spine;
    the sparse aggregate left-joins onto it."""
    monthly = (
        enriched_sales(spark, sf_dir, columns={"fin_month_label", "total_line_price"})
        .groupBy("fin_month_label")
        .agg(dsum0d(F.col("total_line_price")).alias("revenue"))
    )
    return gapfill_months(monthly)


def gapfill_months(
    monthly: DataFrame, label_col: str = "fin_month_label", value_col: str = "revenue"
) -> DataFrame:
    """Left-join a generated month spine (corpus min..max) onto a sparse
    per-month aggregate, zero-filling absent months (fill path unit-tested
    on sparse data in tests/test_setops.py — the fixtures happen dense)."""
    bounds = monthly.agg(
        F.min(label_col).alias("lo"), F.max(label_col).alias("hi")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(
                F.to_date(F.concat(F.col("lo"), F.lit("-01"))),
                F.to_date(F.concat(F.col("hi"), F.lit("-01"))),
                F.expr("interval 1 month"),
            )
        ).alias("m")
    ).select(F.date_format("m", "yyyy-MM").alias(label_col))
    return spine.join(monthly, label_col, "left").select(
        label_col, F.coalesce(value_col, F.lit(0.0)).alias(value_col)
    )


MONTHLY_REVENUE_GAPFILLED_SQL = f"""WITH {DD_SALES_CTE}
, monthly AS (
  SELECT fin_month_label, {dd_dsum0d('total_line_price')} AS revenue
  FROM sales GROUP BY fin_month_label
), bounds AS (
  SELECT MIN(fin_month_label) AS lo, MAX(fin_month_label) AS hi FROM monthly
), spine AS (
  SELECT strftime(m, '%Y-%m') AS fin_month_label
  FROM bounds, LATERAL (
    SELECT unnest(generate_series(
      CAST(lo || '-01' AS DATE), CAST(hi || '-01' AS DATE), INTERVAL 1 MONTH
    )) AS m
  )
)
SELECT spine.fin_month_label, coalesce(monthly.revenue, 0.0) AS revenue
FROM spine LEFT JOIN monthly USING (fin_month_label)"""


def sales_by_fiscal_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue/units per fiscal WEEK — the reference's latent feature
    realized (fin_week_label is projected into sales_lines/payments at
    Project.py:371,391 but never computed; week semantics in
    functions.fiscal.fiscal_columns)."""
    return (
        enriched_sales(spark, sf_dir, columns={"fin_week_label", "quantity", "total_line_price"})
        .groupBy("fin_week_label")
        .agg(
            dsum0d(F.col("total_line_price")).alias("revenue"),
            sum0(F.col("quantity")).alias("units"),
        )
    )


SALES_BY_FISCAL_WEEK_SQL = f"""WITH {DD_SALES_CTE}
SELECT fin_week_label,
       {dd_dsum0d('total_line_price')} AS revenue,
       coalesce(SUM(quantity), 0.0) AS units
FROM sales GROUP BY fin_week_label"""


QUERIES = {
    "sales_by_fiscal_month": _q(sales_by_fiscal_month, SALES_BY_FISCAL_MONTH_SQL),
    "sales_by_fiscal_month_dim": _q(
        sales_by_fiscal_month_dim, SALES_BY_FISCAL_MONTH_DIM_SQL
    ),
    "monthly_revenue_gapfilled": _q(
        monthly_revenue_gapfilled, MONTHLY_REVENUE_GAPFILLED_SQL
    ),
    "sales_by_fiscal_week": _q(sales_by_fiscal_week, SALES_BY_FISCAL_WEEK_SQL),
    "fiscal_calendar": _q(fiscal_calendar, FISCAL_CALENDAR_SQL),
    "top_products": _q(top_products, TOP_PRODUCTS_SQL),
    "sales_by_region_brand": _q(sales_by_region_brand, SALES_BY_REGION_BRAND_SQL),
    "ar_by_region": _q(ar_by_region, AR_BY_REGION_SQL),
    "summary_stats": _q(summary_stats, SUMMARY_STATS_SQL),
    "quality_flag_counts": _q(quality_flag_counts, QUALITY_FLAG_COUNTS_SQL),
    "line_metrics": _q(line_metrics, LINE_METRICS_SQL, sample_col="doc_number"),
    "high_discount_lines": _q(
        high_discount_lines, HIGH_DISCOUNT_LINES_SQL, sample_col="doc_number"
    ),
}
