"""TPC-H-style multi-table workload over the fixture star schema.

The reference performs its joins implicitly upstream (pre-merged CSV,
Project.py:9); SURVEY.md §2.5/§7.1(7) makes the star joins a first-class
capability of this engine. This suite exercises every join shape Spark
plans: broadcast hash (fact->dim), shuffled fact-fact, left semi (EXISTS),
left anti (NOT EXISTS), left outer + two-level aggregation, plus range
filters that push into the Parquet scan and conditional aggregation.

Scale notes per query are in the docstrings; the common pattern is: filter
first (pushdown), project narrow (pruning), broadcast the dimension side,
let one shuffle carry the grouped aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import dd_dec2d, dd_dsum, dd_dsumd, dec2d, dsum, dsumd
from ..sources.tables import load_table
from .base import Query as _q


def _li(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def _orders(spark, sf_dir):
    return load_table(spark, sf_dir, "orders")


# --- Q1-style: pricing summary (wide agg, map-side partial agg) -------------


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped 8-way aggregate after a pushed-down date filter.

    At 100 TB: one shuffle on (returnflag, linestatus) — 6 groups — after
    map-side partial aggregation; the scan reads 7 columns of 11.
    """
    return (
        _li(spark, sf_dir)
        .filter(F.to_date("l_shipdate") <= F.lit("2001-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # quantity is integer-valued -> its double sum/avg are exact in
            # any order; the money sums/avgs accumulate in exact decimal and
            # cross the output boundary via the portable string cast (sf1
            # rehearsal: double money sums drift with partial-agg order)
            F.sum("l_quantity").alias("sum_qty"),
            dsumd(F.col("l_extendedprice")).alias("sum_base_price"),
            dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            dsumd(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            (dsumd(F.col("l_extendedprice")) / F.count(F.lit(1))).alias("avg_price"),
            (dsumd(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = f"""SELECT l_returnflag, l_linestatus,
  SUM(l_quantity) AS sum_qty,
  {dd_dsumd('l_extendedprice')} AS sum_base_price,
  {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {dd_dsumd('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  AVG(l_quantity) AS avg_qty,
  {dd_dsumd('l_extendedprice')} / COUNT(*) AS avg_price,
  {dd_dsumd('l_discount')} / COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus"""


# --- Q3-style: shipping-priority top-k (fact-fact join + TakeOrdered) -------


def top_building_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 BUILDING-segment orders by discounted revenue.

    customer is broadcast; lineitem ⋈ orders shuffles on orderkey (AQE
    handles skew); final top-k is TakeOrderedAndProject — no global sort.
    """
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        _orders(spark, sf_dir)
        .filter(F.to_date("o_orderdate") < F.lit("1998-01-01"))
        .select("o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("o_date"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    li = (
        _li(spark, sf_dir)
        .filter(F.to_date("l_shipdate") > F.lit("1998-01-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    # revenue is a decimal sum (dsum): order-independent, so the hash — and
    # the top-k cut itself — can't drift vs the oracle on summation order.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_date")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_date").alias("orderdate"),
            # top-k cut on the exact decimal; portable DOUBLE boundary
            dec2d(F.col("revenue")).alias("revenue"),
        )
    )


TOP_BUILDING_ORDERS_SQL = f"""SELECT orderkey, orderdate,
       {dd_dec2d('revenue')} AS revenue
FROM (
  SELECT l_orderkey AS orderkey,
         CAST(o_orderdate AS DATE) AS orderdate,
         {dd_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
    AND CAST(l_shipdate AS DATE) > DATE '1998-01-01'
  GROUP BY l_orderkey, orderdate
  ORDER BY revenue DESC, orderkey ASC
  LIMIT 10
)"""


# --- Q5-style: regional revenue through the full star -----------------------


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation within ASIA for one order-year; 5 joins, 4 of them
    broadcast (customer/nation/region/supplier), one shuffled (li ⋈ orders).
    The supplier join additionally requires s_nationkey = c_nationkey
    (local-supplier condition), exercising a two-key join."""
    region = (
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = (
        _orders(spark, sf_dir)
        .filter(
            (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
            & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(
            supp,
            (F.col("l_suppkey") == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return df.groupBy(F.col("n_name").alias("nation")).agg(
        dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


REGIONAL_REVENUE_SQL = f"""SELECT n_name AS nation,
       {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n_name"""


# --- Q6-style: forecast revenue (pure pushed-down range scan) ---------------


def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate over a 3-predicate range filter — all three predicates
    reach the Parquet scan (PushedFilters), zero joins, zero shuffles beyond
    the final single-row reduction."""
    li = _li(spark, sf_dir)
    return (
        li.filter(
            (F.to_date("l_shipdate") >= F.lit("1997-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsumd(F.col("l_extendedprice") * F.col("l_discount")).alias("forecast_revenue"))
    )


REVENUE_FORECAST_SQL = f"""SELECT {dd_dsumd('l_extendedprice * l_discount')} AS forecast_revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1997-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""


# --- Q4-style: order-priority count via left-semi (EXISTS) ------------------


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: orders having at least one returned line ('R').

    left_semi keeps the probe side unduplicated — no post-join distinct —
    and the returned-lines side is reduced to the join key before joining.
    """
    returned = (
        _li(spark, sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_orderpriority")
    return (
        orders.join(returned, orders.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORDER_PRIORITY_COUNTS_SQL = """SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority"""


# --- Anti-join: customers with no open orders -------------------------------


def customers_without_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti-join counted per market segment."""
    open_orders = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


CUSTOMERS_WITHOUT_OPEN_ORDERS_SQL = """SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
GROUP BY c_mktsegment"""


# --- Q13-style: order-count distribution (left outer + two-level agg) -------


def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeps order-less customers as count 0; second-level
    aggregation builds the histogram. Two shuffles by construction."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        _orders(spark, sf_dir)
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count"""


# --- Q14-style: promo revenue share (conditional aggregation) ---------------


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-WHEN inside SUM over a broadcast part join — percentage of
    revenue from PROMO parts in one ship-year."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (
        _li(spark, sf_dir)
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.join(part, li.l_partkey == part.p_partkey).agg(
        (
            F.lit(100.0)
            * dsumd(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / dsumd(rev)
        ).alias("promo_revenue_pct")
    )


PROMO_REVENUE_SHARE_SQL = f"""SELECT 100.0 * {dd_dsumd("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
             / {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'"""


# --- HAVING + distinct-agg: big spenders per segment ------------------------


def segment_value_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment order value stats with a HAVING clause and an exact
    count-distinct of customers (two-phase distinct aggregation).

    total_value is an exact decimal sum (order-independent vs the oracle);
    avg_value divides that exact sum by the count in double — both engines
    then perform one identical IEEE division on identical operands. Customer
    is a scaling dimension, so the join is threshold/AQE-decided (broadcast
    at fixture scale, shuffle at 100 TB) — no forced hint.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = _orders(spark, sf_dir).select("o_custkey", "o_totalprice")
    total = dsum(F.col("o_totalprice"))
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            # decimal accumulation, DOUBLE at the output boundary
            dec2d(total).alias("total_value"),
            (dec2d(total) / F.count(F.lit(1))).alias("avg_value"),
        )
        .filter(F.col("n_orders") > 50)
    )


SEGMENT_VALUE_SUMMARY_SQL = f"""SELECT c_mktsegment,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {dd_dsumd('o_totalprice')} AS total_value,
       {dd_dsumd('o_totalprice')} / COUNT(*) AS avg_value
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
HAVING COUNT(*) > 50"""


# --- Set ops: union / intersect / except over key sets ----------------------


def active_vs_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operator coverage (§2.8 extension): customers with open orders
    UNION/INTERSECT/EXCEPT customers with returned lines, tagged and counted."""
    orders = _orders(spark, sf_dir)
    li = _li(spark, sf_dir)
    open_cust = (
        orders.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    )
    returned_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey")
        .distinct()
    )
    return (
        open_cust.intersect(returned_cust).select(F.lit("both").alias("cohort"), "o_custkey")
        .unionAll(open_cust.exceptAll(returned_cust).select(F.lit("open_only").alias("cohort"), "o_custkey"))
        .unionAll(returned_cust.exceptAll(open_cust).select(F.lit("returned_only").alias("cohort"), "o_custkey"))
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ACTIVE_VS_RETURNED_SQL = """WITH open_cust AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
), returned_cust AS (
  SELECT DISTINCT o_custkey FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
), tagged AS (
  SELECT 'both' AS cohort, o_custkey FROM (SELECT * FROM open_cust INTERSECT SELECT * FROM returned_cust)
  UNION ALL
  SELECT 'open_only', o_custkey FROM (SELECT * FROM open_cust EXCEPT SELECT * FROM returned_cust)
  UNION ALL
  SELECT 'returned_only', o_custkey FROM (SELECT * FROM returned_cust EXCEPT SELECT * FROM open_cust)
)
SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_customers FROM tagged GROUP BY cohort"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-shaped correlated scalar subquery: yearly-averaged revenue of
    lineitems whose quantity is below 20% of their part's mean quantity.

    Written in its *decorrelated* form (per-part pre-aggregate + join) —
    exactly the plan Catalyst's DecorrelateInnerQuery would produce from
    the subquery text, but explicit so the per-part aggregate is one
    shuffle and the probe can broadcast when the part set is filtered.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    # The per-part mean and the final sum are both decimal-exact so neither
    # the qty cutoff (a FILTER boundary) nor the output can drift with
    # partial-agg order; the /count and /7.0 happen in double identically
    # on both sides (one IEEE division over identical operands).
    avg_qty = li.groupBy("l_partkey").agg(
        ((dec2d(dsum(F.col("l_quantity"))) / F.count(F.lit(1)))
         * F.lit(0.2)).alias("qty_cut")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg((dec2d(dsum(F.col("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


SMALL_QUANTITY_REVENUE_SQL = f"""SELECT
  {dd_dsumd('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT {dd_dsumd('l_quantity')} / COUNT(*) * 0.2
    FROM lineitem WHERE l_partkey = l.l_partkey
  )"""


def top_return_loss_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-shaped: top-20 customers by revenue lost to returned items
    (returnflag='R'). Fact-fact shuffle join + broadcast dim + TakeOrdered
    with a key tiebreak."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "lost_revenue"
            )
        )
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
        # top-k cut on the exact decimal; DOUBLE at the output boundary
        .withColumn("lost_revenue", dec2d(F.col("lost_revenue")))
    )


TOP_RETURN_LOSS_CUSTOMERS_SQL = f"""SELECT c_custkey, c_name, c_acctbal,
       {dd_dec2d('lost_revenue')} AS lost_revenue
FROM (
  SELECT c_custkey, c_name, c_acctbal,
    {dd_dsum('l_extendedprice * (1 - l_discount)')} AS lost_revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal
  ORDER BY lost_revenue DESC, c_custkey ASC LIMIT 20
)"""


def supplier_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-side mirror of the revenue rollups: discounted revenue,
    volume, and avg discount per supplier nation (two chained broadcast
    dims off the fact — supplier then nation)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("supplier_nation"))
        .agg(
            dsumd(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
            (dsumd(F.col("l_discount")) / F.count(F.lit(1))).alias("avg_discount"),
        )
    )


SUPPLIER_NATION_REVENUE_SQL = f"""SELECT n_name AS supplier_nation,
  {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  {dd_dsumd('l_discount')} / COUNT(*) AS avg_discount
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name"""


def above_segment_avg_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-flavored correlated scalar subquery, per GROUP: customers whose
    balance beats their own market segment's average. Decorrelated as a
    window average over the segment (one shuffle; the subquery form would
    re-aggregate per probe row)."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer")
    # the segment average must be bit-identical across engines or a
    # customer sitting within an ulp of it flips membership: exact decimal
    # window sum, portable string cast, one IEEE division
    seg_avg = dec2d(
        F.sum(F.col("c_acctbal").cast("decimal(38,6)")).over(
            Window.partitionBy("c_mktsegment")
        )
    ) / F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment"))
    return (
        cust.withColumn("seg_avg", seg_avg)
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsumd(F.col("c_acctbal")).alias("total_balance"),
        )
    )


ABOVE_SEGMENT_AVG_CUSTOMERS_SQL = f"""SELECT c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_customers,
  {dd_dsumd('c_acctbal')} AS total_balance
FROM (
  SELECT c_mktsegment, c_acctbal,
         {dd_dec2d('SUM(CAST(c_acctbal AS DECIMAL(38,6))) OVER (PARTITION BY c_mktsegment)')}
           / COUNT(*) OVER (PARTITION BY c_mktsegment) AS seg_avg
  FROM customer
) WHERE c_acctbal > seg_avg
GROUP BY c_mktsegment"""


def disjunctive_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-shaped disjunctive multi-column predicate: three OR'd brand x
    size x quantity bands evaluated in one scan+join pass. Catalyst
    extracts the common l_partkey join key and pushes the per-column
    bounds (quantity, size) toward the scans — the disjunction never
    forces three separate passes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 20))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 30))
            & (F.col("l_quantity").between(10, 40))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 50))
            & (F.col("l_quantity").between(20, 50))
        )
    )
    return j.filter(band).agg(
        dec2d(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


DISJUNCTIVE_PROMO_REVENUE_SQL = f"""SELECT
  {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 40)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 50 AND l_quantity BETWEEN 20 AND 50)"""


#: A supplier "dominates" a part when it shipped >= this share of its qty.
DOMINANCE_SHARE = 0.15


def part_supply_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped supply-concentration audit: for each part whose
    top supplier shipped >= 15% of its total quantity, that supplier and
    its share. The correlated-subquery formulation ("suppliers whose qty
    exceeds a threshold of the part's total") is re-expressed Spark-first
    as ONE grouped aggregation + ONE window pass over the same partition
    key — no per-part subquery, no second scan of lineitem. Quantities
    are integral doubles, so sums are order-exact and the share division
    is bit-stable across engines.
    """
    li = _li(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    t = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("top_qty")
    )
    w = Window.partitionBy("l_partkey")
    ranked = (
        t.withColumn("total_qty", F.sum("top_qty").over(w))
        .withColumn(
            "rk",
            F.row_number().over(
                w.orderBy(F.desc("top_qty"), F.asc("l_suppkey"))
            ),
        )
        .filter(
            (F.col("rk") == 1)
            & (F.col("top_qty") / F.col("total_qty") >= DOMINANCE_SHARE)
        )
    )
    return ranked.join(sup, ranked.l_suppkey == sup.s_suppkey).select(
        "l_partkey",
        "s_name",
        "top_qty",
        "total_qty",
        (F.col("top_qty") / F.col("total_qty")).alias("share"),
    )


PART_SUPPLY_CONCENTRATION_SQL = f"""WITH t AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS top_qty
  FROM lineitem GROUP BY 1, 2
), w AS (
  SELECT l_partkey, l_suppkey, top_qty,
         SUM(top_qty) OVER (PARTITION BY l_partkey) AS total_qty,
         ROW_NUMBER() OVER (PARTITION BY l_partkey
                            ORDER BY top_qty DESC, l_suppkey) AS rk
  FROM t
)
SELECT w.l_partkey, s.s_name, w.top_qty, w.total_qty,
       w.top_qty / w.total_qty AS share
FROM w JOIN supplier s ON w.l_suppkey = s.s_suppkey
WHERE w.rk = 1 AND w.top_qty / w.total_qty >= {DOMINANCE_SHARE}"""


def sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped blame query: on multi-supplier orders where
    exactly ONE supplier had a returned line, count such orders per
    culprit supplier. Q21's EXISTS / NOT-EXISTS pair over lineitem
    becomes one grouped agg (per order+supplier: any-returned flag) and
    one window over the order (supplier count, returned-supplier count)
    — lineitem is scanned once, and there is no correlated re-probe.
    """
    li = _li(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("returned")
    )
    w = Window.partitionBy("l_orderkey")
    culprits = (
        per_supp.withColumn("n_suppliers", F.count(F.lit(1)).over(w))
        .withColumn("n_returned", F.sum("returned").over(w))
        .filter(
            (F.col("n_suppliers") >= 2)
            & (F.col("n_returned") == 1)
            & (F.col("returned") == 1)
        )
    )
    return (
        culprits.join(sup, culprits.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


SOLE_RETURN_SUPPLIERS_SQL = """WITH per_supp AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS returned
  FROM lineitem GROUP BY 1, 2
), flagged AS (
  SELECT l_orderkey, l_suppkey, returned,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_suppliers,
         SUM(returned) OVER (PARTITION BY l_orderkey) AS n_returned
  FROM per_supp
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM flagged f JOIN supplier s ON f.l_suppkey = s.s_suppkey
WHERE f.n_suppliers >= 2 AND f.n_returned = 1 AND f.returned = 1
GROUP BY s.s_name"""


# --- Q7-style: bilateral trade flows (two nation dims on one fact row) ------

_TRADE_A, _TRADE_B = "NATION_3", "NATION_7"


def nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: revenue shipped between two nations per direction
    per ship-year. One fact row joins TWO independent nation dimensions
    (supplier's via lineitem, customer's via orders) — both broadcast;
    the only fact-fact shuffle is li ⋈ orders. Decimal revenue.

    Cites Project.py:367-376 (sales_lines carries both rep/region and
    customer identity — the implied two-party analysis)."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    both = [_TRADE_A, _TRADE_B]
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("ck"))
        .filter(
            F.col("supp_nation").isin(both)
            & F.col("cust_nation").isin(both)
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        df.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("int").alias("ship_year"),
        )
        .agg(
            dec2d(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("volume"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


NATION_TRADE_FLOWS_SQL = f"""SELECT
  sn.n_name AS supp_nation, cn.n_name AS cust_nation,
  CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS ship_year,
  {dd_dsumd('l_extendedprice * (1 - l_discount)')} AS volume,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('{_TRADE_A}', '{_TRADE_B}')
  AND cn.n_name IN ('{_TRADE_A}', '{_TRADE_B}')
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3"""


# --- Q8-style: market share of one supplier nation ---------------------------

_SHARE_NATION = "NATION_3"
_SHARE_REGION = "ASIA"


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped: the share of revenue delivered by suppliers from
    one nation, within orders placed by customers of one region, per
    order year. Conditional share = decimal SUM(CASE)/decimal SUM cast to
    double for one identical IEEE division per row. Customer-side region
    chain and supplier-side nation are independent broadcast dims on the
    same fact row (like Q7); the li ⋈ orders shuffle is the only wide one.
    """
    nation_c = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_regionkey").alias("crk")
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == _SHARE_REGION
    )
    nation_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _li(spark, sf_dir).select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation_c), cust.c_nationkey == F.col("ck"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation_s), supp.s_nationkey == F.col("sk"))
    )
    agg = df.groupBy(
        F.year(F.to_date("o_orderdate")).cast("int").alias("order_year")
    ).agg(
        dsum(F.when(F.col("supp_nation") == _SHARE_NATION, vol).otherwise(0.0))
        .alias("nation_volume"),
        dsum(vol).alias("total_volume"),
    )
    return agg.select(
        "order_year",
        dec2d(F.col("nation_volume")).alias("nation_volume"),
        dec2d(F.col("total_volume")).alias("total_volume"),
        (
            dec2d(F.col("nation_volume"))
            / dec2d(F.col("total_volume"))
        ).alias("market_share"),
    )


NATION_MARKET_SHARE_SQL = f"""WITH base AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS order_year,
         sn.n_name AS supp_nation,
         l_extendedprice * (1 - l_discount) AS vol
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{_SHARE_REGION}'
)
SELECT order_year,
  {dd_dsumd(f"CASE WHEN supp_nation = '{_SHARE_NATION}' THEN vol ELSE 0.0 END")}
    AS nation_volume,
  {dd_dsumd('vol')} AS total_volume,
  {dd_dsumd(f"CASE WHEN supp_nation = '{_SHARE_NATION}' THEN vol ELSE 0.0 END")}
    / {dd_dsumd('vol')} AS market_share
FROM base
GROUP BY order_year"""


#: PageRank hyperparameters shared by the Spark query and its SQL oracle.
_PR_DAMPING = 0.85
_PR_ITERS = 8


def nation_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the supplier-nation -> customer-nation trade graph
    (one edge per line item, so multiplicity weights the walk by trade
    volume). Iterative power method, checkpoint per round. Oracle: the
    same fixed-iteration power method unrolled as a DuckDB CTE chain
    (one dangling-mass + one inflow CTE per step, identical arithmetic
    order); both sides round to 12 decimals — ~5 orders of magnitude
    above the last-ulp accumulation drift and far below rank resolution
    (reference parity vs numpy in tests/test_pagerank.py)."""
    from ..operators.pagerank import pagerank

    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("src")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("dst")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _orders(spark, sf_dir).select("o_orderkey", "o_custkey")
    li = _li(spark, sf_dir).select("l_orderkey", "l_suppkey")
    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("sk"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("ck"))
        # collapse the per-line edge log to the weighted nation adjacency
        # (25x25 max) BEFORE iterating — the power steps then join the
        # tiny weighted table, not the fact-sized edge log
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    ranks = pagerank(
        edges, damping=_PR_DAMPING, n_iterations=_PR_ITERS, weight="w"
    )
    # last-ulp float drift across runs (shuffle accumulation order) fails
    # the determinism gate at full-precision hashing; 12 decimals is ~5
    # orders of magnitude above the drift and far below rank resolution
    return ranks.select("node", F.round("rank", 12).alias("rank"))


def _pagerank_oracle_sql(damping: float, n_iterations: int) -> str:
    """Fixed-iteration weighted PageRank as a chained-CTE DuckDB program.

    Mirrors operators/pagerank.py step for step — per iteration i:
    ``dm{i}`` = rank mass on dangling nodes (no out-edges), ``pr{i}`` =
    ``(1-d)/N + d * (inflow + dm/N)`` with
    ``inflow(v) = SUM over edges u->v of rank(u) * w / out_w(u)`` — in the
    same left-associative arithmetic order, so the only cross-engine delta
    is float SUM accumulation order (absorbed by the final ROUND 12).

    Every pr{{i}} is ``AS MATERIALIZED``: each is referenced twice (the
    dangling-mass scalar and the inflow join), and DuckDB's default CTE
    inlining would re-expand the whole chain per reference — 2^iters
    blowup of the edge-building star join."""
    d = damping
    steps = []
    for i in range(1, n_iterations + 1):
        prev = f"pr{i - 1}"
        steps.append(f""",
dm{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0) AS dm FROM {prev}
  WHERE node NOT IN (SELECT src FROM deg)
),
pr{i} AS MATERIALIZED (
  SELECT n.node,
         (1 - {d})/nn.cnt
           + {d} * (COALESCE(inf.inflow, 0) + dm{i}.dm/nn.cnt) AS rank
  FROM nodes n
  CROSS JOIN nn CROSS JOIN dm{i}
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.rank * e.w / dg.deg) AS inflow
    FROM edges e
    JOIN {prev} p ON e.src = p.node
    JOIN deg dg ON e.src = dg.src
    GROUP BY e.dst
  ) inf ON inf.node = n.node
)""")
    return (
        """WITH edges AS MATERIALIZED (
  SELECT sn.n_name AS src, cn.n_name AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  GROUP BY 1, 2
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
nn AS MATERIALIZED (SELECT COUNT(*) AS cnt FROM nodes),
deg AS MATERIALIZED (SELECT src, SUM(w) AS deg FROM edges GROUP BY 1),
pr0 AS MATERIALIZED (
  SELECT node, 1.0/nn.cnt AS rank FROM nodes CROSS JOIN nn)"""
        + "".join(steps)
        + f"""
SELECT node, ROUND(rank, 12) AS rank FROM pr{n_iterations}"""
    )


NATION_TRADE_PAGERANK_SQL = _pagerank_oracle_sql(_PR_DAMPING, _PR_ITERS)


# --- Q15-style: top supplier via window-max decorrelation --------------------


def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) achieving the maximum total revenue
    in one quarter. The reference formulation is a view + correlated
    ``WHERE total = (SELECT MAX(...) FROM view)``; decorrelated here as
    ONE grouped agg + a scalar ``agg(max)`` broadcast back as an
    equi-join filter (ties all kept, as in the spec). Supplier grain
    grows with SF, so the r4 unpartitioned window max (one task holding
    every supplier row) is replaced by a distributed reduce: the max is
    a 1-row broadcast side, the probe stays partition-parallel."""
    li = _li(spark, sf_dir).filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    per_supp = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = per_supp.agg(F.max("total_revenue").alias("__max_rev"))
    best = per_supp.join(
        F.broadcast(mx), per_supp.total_revenue == mx.__max_rev
    ).drop("__max_rev")
    # supplier grows with SF — no forced broadcast; the threshold/AQE
    # decides (and the probe side here is the tiny max-revenue set anyway).
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return best.join(supp, best.l_suppkey == supp.s_suppkey).select(
        "s_suppkey",
        "s_name",
        # max-filter on the exact decimal; portable DOUBLE boundary
        dec2d(F.col("total_revenue")).alias("total_revenue"),
    )


TOP_REVENUE_SUPPLIERS_SQL = f"""WITH rev AS (
  SELECT l_suppkey,
         {dd_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, {dd_dec2d('total_revenue')} AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)"""


# --- Q18-style: large-volume orders (HAVING + semi-join back) ----------------

_LARGE_ORDER_QTY = 250.0


def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped: orders whose total line quantity exceeds a
    threshold, with the owning customer. The HAVING set is a grouped agg
    on l_orderkey; joining it back to orders/customer keeps the plan a
    pair of equi-joins (the spec's ``IN (SELECT ... HAVING)`` shape).
    Integral quantities sum exactly in double; money stays decimal."""
    li = _li(spark, sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _LARGE_ORDER_QTY)
    )
    orders = _orders(spark, sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            # o_totalprice is already a 2-decimal double; a decimal cast
            # would put DECIMAL in the output schema (driver hash hazard)
            F.col("o_totalprice").alias("order_total"),
            "total_qty",
        )
    )


LARGE_VOLUME_CUSTOMERS_SQL = f"""SELECT c_name, c_custkey, o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  o_totalprice AS order_total,
  total_qty
FROM (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {_LARGE_ORDER_QTY}
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey"""


QUERIES = {
    "nation_trade_flows": _q(nation_trade_flows, NATION_TRADE_FLOWS_SQL),
    "nation_market_share": _q(nation_market_share, NATION_MARKET_SHARE_SQL),
    "nation_trade_pagerank": _q(
        nation_trade_pagerank, NATION_TRADE_PAGERANK_SQL
    ),
    "top_revenue_suppliers": _q(
        top_revenue_suppliers, TOP_REVENUE_SUPPLIERS_SQL
    ),
    "large_volume_customers": _q(
        large_volume_customers, LARGE_VOLUME_CUSTOMERS_SQL,
        sample_col="c_custkey",
    ),
    "part_supply_concentration": _q(
        part_supply_concentration, PART_SUPPLY_CONCENTRATION_SQL
    ),
    "sole_return_suppliers": _q(
        sole_return_suppliers, SOLE_RETURN_SUPPLIERS_SQL,
        sample_col="s_name",
    ),
    "pricing_summary": _q(pricing_summary, PRICING_SUMMARY_SQL),
    "small_quantity_revenue": _q(small_quantity_revenue, SMALL_QUANTITY_REVENUE_SQL),
    "disjunctive_promo_revenue": _q(
        disjunctive_promo_revenue, DISJUNCTIVE_PROMO_REVENUE_SQL
    ),
    "top_return_loss_customers": _q(
        top_return_loss_customers, TOP_RETURN_LOSS_CUSTOMERS_SQL
    ),
    "supplier_nation_revenue": _q(
        supplier_nation_revenue, SUPPLIER_NATION_REVENUE_SQL
    ),
    "above_segment_avg_customers": _q(
        above_segment_avg_customers, ABOVE_SEGMENT_AVG_CUSTOMERS_SQL
    ),
    "top_building_orders": _q(top_building_orders, TOP_BUILDING_ORDERS_SQL),
    "regional_revenue": _q(regional_revenue, REGIONAL_REVENUE_SQL),
    "revenue_forecast": _q(revenue_forecast, REVENUE_FORECAST_SQL),
    "order_priority_counts": _q(order_priority_counts, ORDER_PRIORITY_COUNTS_SQL),
    "customers_without_open_orders": _q(
        customers_without_open_orders, CUSTOMERS_WITHOUT_OPEN_ORDERS_SQL
    ),
    "customer_order_distribution": _q(
        customer_order_distribution, CUSTOMER_ORDER_DISTRIBUTION_SQL
    ),
    "promo_revenue_share": _q(promo_revenue_share, PROMO_REVENUE_SHARE_SQL),
    "segment_value_summary": _q(segment_value_summary, SEGMENT_VALUE_SUMMARY_SQL),
    "active_vs_returned_customers": _q(
        active_vs_returned_customers, ACTIVE_VS_RETURNED_SQL
    ),
}
