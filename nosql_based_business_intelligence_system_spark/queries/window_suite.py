"""Window-function suite (SURVEY.md §2.8 north-star extension: the reference
has no window ops; ranking/running/moving analyses are required engine
capability for the implied BI workload).

Window shapes covered: running cumulative over an ordered dimension, lag +
period-over-period growth, moving average frame, rank-per-partition top-N,
row_number dedup (latest-row-per-key).

Scale note: a window partitioned by a key shuffles once on that key; the
unpartitioned monthly windows below operate on *post-aggregation* data
(~tens-hundreds of rows), so the single-partition window is cheap — never
window an unaggregated 100 TB fact without a PARTITION BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import (
    dd_dec2d,
    dd_dsum,
    dd_dsum0,
    dd_dsum0d,
    dec2d,
    dsum0,
    dsum0d,
    sum0,
)
from ..operators.star import DD_SALES_CTE, enriched_sales
from .base import Query as _q


def monthly_revenue_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative revenue + MoM growth per fiscal month (runs on the ~80-row
    aggregate, not the fact table).

    Revenue and the cumulative window sum are decimal (dsum0): decimal
    addition is exact, so neither the per-month partial-agg order nor the
    window accumulation can drift vs the oracle. Every money column is cast
    to DOUBLE at the output boundary (the driver's hasher cannot compare
    Decimal cells across engines); the single decimal->double cast of
    identical exact decimals is deterministic on both sides.
    """
    monthly = (
        enriched_sales(spark, sf_dir, columns={"fin_month_label", "total_line_price"})
        .groupBy("fin_month_label")
        .agg(dsum0(F.col("total_line_price")).alias("revenue"))
    )
    w = Window.orderBy("fin_month_label")
    prev = F.lag("revenue").over(w)
    prev_d = dec2d(prev)
    rev_d = dec2d(F.col("revenue"))
    return monthly.select(
        "fin_month_label",
        rev_d.alias("revenue"),
        dec2d(
            F.sum("revenue").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("cumulative_revenue"),
        prev_d.alias("prev_revenue"),
        F.when(prev > 0, (rev_d - prev_d) / prev_d).alias("mom_growth"),
    )


MONTHLY_REVENUE_RUNNING_SQL = f"""WITH {DD_SALES_CTE},
monthly AS (
  SELECT fin_month_label, {dd_dsum0('total_line_price')} AS revenue
  FROM sales GROUP BY fin_month_label
)
SELECT fin_month_label, {dd_dec2d('revenue')} AS revenue,
  {dd_dec2d("SUM(revenue) OVER (ORDER BY fin_month_label ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS cumulative_revenue,
  {dd_dec2d('LAG(revenue) OVER (ORDER BY fin_month_label)')} AS prev_revenue,
  CASE WHEN LAG(revenue) OVER (ORDER BY fin_month_label) > 0
       THEN ({dd_dec2d('revenue')}
             - {dd_dec2d('LAG(revenue) OVER (ORDER BY fin_month_label)')})
            / {dd_dec2d('LAG(revenue) OVER (ORDER BY fin_month_label)')}
       END AS mom_growth
FROM monthly"""


def revenue_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-month trailing moving average of fiscal-month revenue."""
    monthly = (
        enriched_sales(spark, sf_dir, columns={"fin_month_label", "total_line_price"})
        .groupBy("fin_month_label")
        .agg(dsum0(F.col("total_line_price")).alias("revenue"))
    )
    # exact decimal frame sum, portable cast, ONE double division — a
    # double AVG over the frame would re-accumulate in engine-specific
    # order, and decimal AVG quotient scales differ between engines
    w = Window.orderBy("fin_month_label").rowsBetween(-2, 0)
    return monthly.select(
        "fin_month_label",
        dec2d(F.col("revenue")).alias("revenue"),
        (dec2d(F.sum("revenue").over(w)) / F.count(F.lit(1)).over(w)).alias(
            "revenue_ma3"
        ),
    )


REVENUE_MOVING_AVG_SQL = f"""WITH {DD_SALES_CTE},
monthly AS (
  SELECT fin_month_label, {dd_dsum0('total_line_price')} AS revenue
  FROM sales GROUP BY fin_month_label
)
SELECT fin_month_label, {dd_dec2d('revenue')} AS revenue,
  {dd_dec2d("SUM(revenue) OVER (ORDER BY fin_month_label ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)")}
    / (COUNT(*) OVER (ORDER BY fin_month_label ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS revenue_ma3
FROM monthly"""


def top_products_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per region partition; keep top-3 with deterministic tiebreak."""
    per = (
        enriched_sales(spark, sf_dir, columns={"product_desc", "region_desc", "total_line_price"})
        .groupBy("region_desc", "product_desc")
        .agg(dsum0d(F.col("total_line_price")).alias("revenue"))
    )
    w = Window.partitionBy("region_desc").orderBy(
        F.desc("revenue"), F.asc("product_desc")
    )
    return (
        per.withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


TOP_PRODUCTS_PER_REGION_SQL = f"""WITH {DD_SALES_CTE},
per AS (
  SELECT region_desc, product_desc,
         {dd_dsum0d('total_line_price')} AS revenue
  FROM sales GROUP BY region_desc, product_desc
)
SELECT * FROM (
  SELECT region_desc, product_desc, revenue,
         CAST(RANK() OVER (PARTITION BY region_desc
                           ORDER BY revenue DESC, product_desc ASC) AS BIGINT) AS rnk
  FROM per
) WHERE rnk <= 3"""


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number dedup: each customer's most recent order (the canonical
    latest-row-per-key pattern; one shuffle on the partition key)."""
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("o_date"),
        "o_totalprice",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_date"), F.desc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_date").alias("latest_orderdate"),
            F.col("o_totalprice").alias("latest_totalprice"),
        )
    )


LATEST_ORDER_PER_CUSTOMER_SQL = """SELECT o_custkey AS custkey,
       o_orderkey AS latest_orderkey,
       CAST(o_orderdate AS DATE) AS latest_orderdate,
       o_totalprice AS latest_totalprice
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY CAST(o_orderdate AS DATE) DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1"""


def quarter_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each region's share of total revenue within its fiscal quarter —
    window aggregate (sum over partition) against grouped data."""
    per = (
        enriched_sales(spark, sf_dir, columns={"region_desc", "fin_quarter", "total_line_price"})
        .groupBy("fin_quarter", "region_desc")
        .agg(dsum0(F.col("total_line_price")).alias("revenue"))
    )
    w = Window.partitionBy("fin_quarter")
    # revenue and the per-quarter window total are decimal-exact; the share
    # divides after a cast to double (one identical IEEE division per row on
    # both sides) rather than in decimal, whose quotient scale rules differ
    # between engines.
    return per.select(
        "fin_quarter",
        "region_desc",
        dec2d(F.col("revenue")).alias("revenue"),
        (dec2d(F.col("revenue"))
         / dec2d(F.sum("revenue").over(w))).alias("share_of_quarter"),
    )


QUARTER_REVENUE_SHARE_SQL = f"""WITH {DD_SALES_CTE},
per AS (
  SELECT fin_quarter, region_desc,
         {dd_dsum0('total_line_price')} AS revenue
  FROM sales GROUP BY fin_quarter, region_desc
)
SELECT fin_quarter, region_desc, {dd_dec2d('revenue')} AS revenue,
       {dd_dec2d('revenue')}
         / {dd_dec2d('SUM(revenue) OVER (PARTITION BY fin_quarter)')}
         AS share_of_quarter
FROM per"""


def customer_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) over per-customer lifetime spend: decile boundaries +
    totals. Customer grain grows with SF, so the ntile runs through
    :func:`operators.ranking.distributed_ntile` (range-partition +
    per-partition offsets — bit-identical to the native window, no
    single-partition task; the r4 global window held every customer row
    in ONE task)."""
    from ..operators.ranking import distributed_ntile
    from ..sources.tables import load_table

    from ..functions.cleaning import dsum

    # per-customer spend in exact decimal: a double sum's partial-agg
    # order can flip ntile boundaries between engines (seen at sf1)
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(dsum(F.col("o_totalprice")).alias("spend"))
    )
    return (
        distributed_ntile(
            spend, 10, [F.desc("spend"), F.asc("o_custkey")], "decile"
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dec2d(F.sum("spend")).alias("decile_spend"),
            dec2d(F.min("spend")).alias("min_spend"),
            dec2d(F.max("spend")).alias("max_spend"),
        )
    )


def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value by acquisition cohort: customers grouped
    by first-order month, spend accumulated over cohort age (months since
    acquisition), normalized per cohort member. Month arithmetic is pure
    integer (year*12+month) so ages agree across engines; cumulative sums
    are decimal (exact); the per-member LTV is integer MICRO-units via
    floor division (2-decimal spends divided by small counts land exactly
    on .xxx5 double-rounding boundaries, where engines' ROUND disagree —
    integer floor division is unambiguous). One aggregate to customer
    grain, one to the cohort-age grid, one cumulative window per cohort."""
    from ..sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    mnum = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    per_order = o.select(
        "o_custkey", mnum.alias("order_m"), F.col("o_totalprice")
    )
    firsts = per_order.groupBy("o_custkey").agg(
        F.min("order_m").alias("cohort_m")
    )
    sizes = firsts.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    grid = (
        per_order.join(firsts, "o_custkey")
        .groupBy("cohort_m", (F.col("order_m") - F.col("cohort_m")).alias("age"))
        .agg(dsum0(F.col("o_totalprice")).alias("age_spend"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.withColumn("cum_spend", F.sum("age_spend").over(w))
        .join(sizes, "cohort_m")
        .select(
            "cohort_m",
            F.col("age").cast("bigint").alias("age"),
            "cohort_customers",
            # decimal internally; portable DOUBLE at the output boundary
            dec2d(F.col("cum_spend")).alias("cum_spend"),
            # exact: decimal(38,6) * 1e6 is integral; bigint floor-div
            # (computed from the exact decimal, not the double output)
            F.expr(
                "CAST(cum_spend * 1000000 AS BIGINT) DIV cohort_customers"
            ).alias("ltv_per_customer_micros"),
        )
    )


COHORT_LTV_CURVE_SQL = f"""WITH per_order AS (
  SELECT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) AS order_m,
         o_totalprice
  FROM orders
), firsts AS (
  SELECT o_custkey, MIN(order_m) AS cohort_m FROM per_order GROUP BY o_custkey
), sizes AS (
  SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS cohort_customers
  FROM firsts GROUP BY cohort_m
), grid AS (
  SELECT f.cohort_m, p.order_m - f.cohort_m AS age,
         {dd_dsum0('p.o_totalprice')} AS age_spend
  FROM per_order p JOIN firsts f ON p.o_custkey = f.o_custkey
  GROUP BY f.cohort_m, p.order_m - f.cohort_m
), cum AS (
  SELECT cohort_m, age,
         SUM(age_spend) OVER (PARTITION BY cohort_m ORDER BY age
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_spend
  FROM grid
)
SELECT c.cohort_m, CAST(c.age AS BIGINT) AS age, s.cohort_customers,
       {dd_dec2d('c.cum_spend')} AS cum_spend,
       CAST(c.cum_spend * 1000000 AS BIGINT) // s.cohort_customers
         AS ltv_per_customer_micros
FROM cum c JOIN sizes s ON c.cohort_m = s.cohort_m"""


def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic BI customer grid: per-customer
    recency (last order date), frequency (order count), monetary (decimal
    lifetime spend), each quartiled over a TOTAL order (custkey tiebreak
    — rank outputs then identical across engines), score 1 = best.
    Customer grain grows with SF, so each quartile runs through
    :func:`operators.ranking.distributed_ntile` (bit-identical to native
    ntile(4), no single-partition task; the r4 version chained three
    global windows, each holding every customer row in ONE task). The
    three attachments chain — each ranks the previous checkpointed
    result, so the orders scan and aggregate run once."""
    from ..operators.ranking import distributed_ntile
    from ..sources.tables import load_table

    rfm = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum0(F.col("o_totalprice")).alias("spend"),
        )
    )
    scored = rfm
    for out_col, order in (
        ("r_score", [F.desc("last_order"), F.asc("o_custkey")]),
        ("f_score", [F.desc("n_orders"), F.asc("o_custkey")]),
        ("m_score", [F.desc("spend"), F.asc("o_custkey")]),
    ):
        scored = distributed_ntile(scored, 4, order, out_col)
    scored = scored.select("spend", "r_score", "f_score", "m_score")
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        # decimal accumulation, portable DOUBLE at the output boundary
        dec2d(F.sum("spend")).alias("segment_spend"),
    )


CUSTOMER_RFM_SEGMENTS_SQL = f"""WITH rfm AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS n_orders,
         {dd_dsum0('o_totalprice')} AS spend
  FROM orders GROUP BY o_custkey
), scored AS (
  SELECT spend,
    CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey ASC) AS BIGINT)
      AS r_score,
    CAST(ntile(4) OVER (ORDER BY n_orders DESC, o_custkey ASC) AS BIGINT)
      AS f_score,
    CAST(ntile(4) OVER (ORDER BY spend DESC, o_custkey ASC) AS BIGINT)
      AS m_score
  FROM rfm
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {dd_dec2d('SUM(spend)')} AS segment_spend
FROM scored GROUP BY r_score, f_score, m_score"""


CUSTOMER_VALUE_DECILES_SQL = f"""SELECT decile,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  {dd_dec2d('SUM(spend)')} AS decile_spend,
  {dd_dec2d('MIN(spend)')} AS min_spend,
  {dd_dec2d('MAX(spend)')} AS max_spend
FROM (
  SELECT o_custkey, spend,
         CAST(ntile(10) OVER (ORDER BY spend DESC, o_custkey ASC) AS BIGINT) AS decile
  FROM (SELECT o_custkey, {dd_dsum('o_totalprice')} AS spend
        FROM orders GROUP BY o_custkey)
) GROUP BY decile"""


def revenue_trailing_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day revenue via a time-RANGE window frame (value-based,
    not row-based: days with no orders shrink the frame's row count but
    not its time span). Ordered on integer days-since-epoch so Spark's
    numeric rangeBetween and DuckDB's RANGE ... PRECEDING agree exactly;
    sums are decimal end-to-end. Runs on the per-day aggregate."""
    from ..sources.tables import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderdate")
        .agg(dsum0(F.col("o_totalprice")).alias("day_revenue"))
    )
    w = (
        Window.orderBy(F.unix_date(F.to_date(F.col("o_orderdate"))))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "o_orderdate",
        dec2d(F.col("day_revenue")).alias("day_revenue"),
        dec2d(F.sum("day_revenue").over(w)).alias("trailing_7d_revenue"),
        F.count(F.lit(1)).over(w).alias("n_days_in_frame"),
    )


_DD_7D_FRAME = (
    "OVER (ORDER BY date_diff('day', DATE '1970-01-01', "
    "CAST(o_orderdate AS DATE)) "
    "RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)"
)

REVENUE_TRAILING_7D_SQL = f"""WITH daily AS (
  SELECT o_orderdate, {dd_dsum0('o_totalprice')} AS day_revenue
  FROM orders GROUP BY o_orderdate
)
SELECT o_orderdate, {dd_dec2d('day_revenue')} AS day_revenue,
  {dd_dec2d(f'SUM(day_revenue) {_DD_7D_FRAME}')} AS trailing_7d_revenue,
  CAST(COUNT(*) {_DD_7D_FRAME} AS BIGINT) AS n_days_in_frame
FROM daily"""


def revenue_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day exact median of daily revenue. Spark refuses
    aggregate ``median`` with a window frame, so it's COMPOSED:
    collect_list over the RANGE frame -> array_sort -> exact middle
    (odd) or IEEE midpoint of the two middles (even). Daily revenue is
    decimal (exact), so the sorted array is engine-identical and the
    single double division matches DuckDB's interpolating median
    bit-for-bit."""
    from ..sources.tables import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum0(F.col("o_totalprice")).alias("day_revenue"))
    )
    w = (
        Window.orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, Window.currentRow)
    )
    vals = F.array_sort(F.collect_list("day_revenue").over(w))
    n = F.size(vals)
    lo = dec2d(F.element_at(vals, ((n + 1) / 2).cast("int")))
    hi = dec2d(F.element_at(vals, (n / 2 + 1).cast("int")))
    return daily.select(
        "day",
        dec2d(F.col("day_revenue")).alias("day_revenue"),
        F.when(n % 2 == 1, lo).otherwise((lo + hi) / 2.0).alias(
            "rolling_median_7d"
        ),
    )


REVENUE_ROLLING_MEDIAN_SQL = f"""WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         {dd_dsum0('o_totalprice')} AS day_revenue
  FROM orders GROUP BY 1
)
SELECT day, {dd_dec2d('day_revenue')} AS day_revenue,
  CAST(median({dd_dec2d('day_revenue')}) OVER (
    ORDER BY date_diff('day', DATE '1970-01-01', day)
    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS rolling_median_7d
FROM daily"""


def segment_balance_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment account-balance distribution profile — the remaining
    rank-family window functions (dense_rank, percent_rank, cume_dist,
    nth_value) in ONE window pass over a total order (balance desc, key
    tiebreak — rank outputs are then pure integer ratios, identical across
    engines). Top-5 customers per segment; nth_value reads the segment's
    top-2 balances from an unbounded frame."""
    from ..sources.tables import load_table

    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.count(F.lit(1)).over(
        Window.partitionBy("c_mktsegment").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.dense_rank().over(w).alias("bal_dense_rank"),
            F.percent_rank().over(w).alias("bal_percent_rank"),
            F.cume_dist().over(w).alias("bal_cume_dist"),
            F.nth_value("c_acctbal", 1).over(wfull).alias("segment_top_bal"),
            F.nth_value("c_acctbal", 2).over(wfull).alias("segment_second_bal"),
            n.alias("segment_customers"),
        )
        .filter(F.col("bal_dense_rank") <= 5)
    )


SEGMENT_BALANCE_PROFILE_SQL = """WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         DENSE_RANK() OVER w AS bal_dense_rank,
         PERCENT_RANK() OVER w AS bal_percent_rank,
         CUME_DIST() OVER w AS bal_cume_dist,
         NTH_VALUE(c_acctbal, 1) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
           AND UNBOUNDED FOLLOWING) AS segment_top_bal,
         NTH_VALUE(c_acctbal, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
           AND UNBOUNDED FOLLOWING) AS segment_second_bal,
         CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT)
           AS segment_customers
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey)
)
SELECT * FROM ranked WHERE bal_dense_rank <= 5"""


QUERIES = {
    "segment_balance_profile": _q(
        segment_balance_profile, SEGMENT_BALANCE_PROFILE_SQL
    ),
    "revenue_trailing_7d": _q(revenue_trailing_7d, REVENUE_TRAILING_7D_SQL),
    "revenue_rolling_median": _q(
        revenue_rolling_median, REVENUE_ROLLING_MEDIAN_SQL
    ),
    "monthly_revenue_running": _q(monthly_revenue_running, MONTHLY_REVENUE_RUNNING_SQL),
    "customer_value_deciles": _q(customer_value_deciles, CUSTOMER_VALUE_DECILES_SQL),
    "customer_rfm_segments": _q(customer_rfm_segments, CUSTOMER_RFM_SEGMENTS_SQL),
    "cohort_ltv_curve": _q(cohort_ltv_curve, COHORT_LTV_CURVE_SQL),
    "revenue_moving_avg": _q(revenue_moving_avg, REVENUE_MOVING_AVG_SQL),
    "top_products_per_region": _q(top_products_per_region, TOP_PRODUCTS_PER_REGION_SQL),
    "latest_order_per_customer": _q(
        latest_order_per_customer, LATEST_ORDER_PER_CUSTOMER_SQL,
        sample_col="custkey",
    ),
    "quarter_revenue_share": _q(quarter_revenue_share, QUARTER_REVENUE_SHARE_SQL),
}
