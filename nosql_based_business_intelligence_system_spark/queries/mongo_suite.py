"""Queries issued through the Mongo aggregation-pipeline frontend
(operators/mongo_query.py) — the query language the reference's exported
collections imply (Project.py:420-423 hands off to MongoDB; this is what
its dashboard pipelines compile to on Spark). Oracle-checked like any
native query: the frontend must not change semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import dd_dsumd, dec2d
from ..operators.mongo_query import mongo_pipeline
from ..operators.star import DD_SALES_CTE, enriched_sales
from .base import Query as _q

REGIONS = ("ASIA", "EUROPE", "AMERICA")

#: The pipeline a Mongo-side analyst would run against the sales_lines
#: collection — declared as data, compiled by mongo_pipeline.
REGION_QUARTER_PIPELINE = [
    {"$match": {"region_desc": {"$in": list(REGIONS)}, "quantity": {"$gt": 10.0}}},
    {
        "$group": {
            "_id": {"region_desc": "$region_desc", "fin_quarter": "$fin_quarter"},
            # Mongo's own exact-accumulation idiom: Decimal128 sums.
            # quantity is integer-valued, so its double sum is exact as-is
            "revenue": {"$sum": {"$toDecimal": "$total_line_price"}},
            "units": {"$sum": "$quantity"},
            "n_lines": {"$sum": 1},
        }
    },
]


def mongo_region_quarter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # columns= mirrors exactly the fields the pipeline references —
    # join elimination applies to the Mongo frontend like any consumer
    out = mongo_pipeline(
        enriched_sales(
            spark,
            sf_dir,
            columns={
                "region_desc",
                "fin_quarter",
                "quantity",
                "total_line_price",
            },
        ),
        REGION_QUARTER_PIPELINE,
    )
    # decimal inside the pipeline; portable DOUBLE at the driver boundary
    return out.withColumn("revenue", dec2d(F.col("revenue")))


_IN = ", ".join(f"'{r}'" for r in REGIONS)

MONGO_REGION_QUARTER_REVENUE_SQL = f"""WITH {DD_SALES_CTE}
SELECT region_desc, fin_quarter,
       {dd_dsumd('total_line_price')} AS revenue,
       SUM(quantity) AS units,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM sales
WHERE region_desc IN ({_IN}) AND quantity > 10.0
GROUP BY region_desc, fin_quarter"""


AR_MIN_DUE = 400_000.0
AR_TOP = 20


def mongo_top_receivables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``db.receivables.find({...}).sort(...).limit(20)`` over the computed
    AR aging collection (stats_suite.ar_aging_buckets feeds the frontend —
    collections here are plans, not materialized copies)."""
    from ..operators.mongo_query import mongo_find
    from .stats_suite import ar_aging_buckets

    recv = ar_aging_buckets(spark, sf_dir)
    return mongo_find(
        recv,
        filter={"total_due": {"$gt": AR_MIN_DUE}},
        projection={"customer_number": 1, "total_due": 1, "amt_current": 1},
        sort={"total_due": -1, "customer_number": 1},
        limit=AR_TOP,
    )


def _mongo_top_receivables_sql() -> str:
    from .stats_suite import AR_AGING_BUCKETS_SQL

    return f"""WITH recv AS ({AR_AGING_BUCKETS_SQL})
SELECT customer_number, total_due, amt_current FROM recv
WHERE total_due > {AR_MIN_DUE}
ORDER BY total_due DESC, customer_number ASC LIMIT {AR_TOP}"""


RECV_PAY_MIN_DUE = 300_000.0
RECV_PAY_TOP = 25


def mongo_receivables_with_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cross-collection dashboard join (its three exported
    collections share customer_number, Project.py:367-395): receivables
    ``$lookup`` per-customer payment totals, ``$unwind`` with
    ``preserveNullAndEmptyArrays`` (customers with zero payments keep their
    receivable row), then a net-balance projection. The lookup's ``from``
    side is itself a pipeline — collections here are plans, so the fused
    left join + grouped payments compile into ONE Catalyst plan.
    """
    from pyspark.sql import functions as F

    from ..sources.tables import load_table
    from .stats_suite import ar_aging_buckets

    recv = ar_aging_buckets(spark, sf_dir)
    payments = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("customer_number"),
        F.col("value").alias("tot_payment"),
    )
    pay_per_cust = mongo_pipeline(
        payments,
        [
            {
                "$group": {
                    "_id": "$customer_number",
                    # Decimal128-style exact sum; portable double below
                    "total_paid": {"$sum": {"$toDecimal": "$tot_payment"}},
                    "n_payments": {"$count": {}},
                }
            }
        ],
    ).withColumn("total_paid", dec2d(F.col("total_paid")))
    return mongo_pipeline(
        recv,
        [
            {"$match": {"total_due": {"$gt": RECV_PAY_MIN_DUE}}},
            {
                "$lookup": {
                    "from": pay_per_cust,
                    "localField": "customer_number",
                    "foreignField": "_id",
                    "as": "p",
                }
            },
            {"$unwind": {"path": "$p", "preserveNullAndEmptyArrays": True}},
            {
                "$addFields": {
                    "total_paid": {"$ifNull": ["$p.total_paid", 0.0]},
                    "n_payments": {"$ifNull": ["$p.n_payments", 0]},
                }
            },
            {
                "$project": {
                    "customer_number": 1,
                    "total_due": 1,
                    "total_paid": 1,
                    "n_payments": 1,
                    "balance_after": {"$subtract": ["$total_due", "$total_paid"]},
                }
            },
            {"$sort": {"total_due": -1, "customer_number": 1}},
            {"$limit": RECV_PAY_TOP},
        ],
    )


def _mongo_receivables_with_payments_sql() -> str:
    from .stats_suite import AR_AGING_BUCKETS_SQL

    return f"""WITH recv AS ({AR_AGING_BUCKETS_SQL}),
pay AS (
  SELECT user_id AS customer_number, {dd_dsumd('value')} AS total_paid,
         CAST(COUNT(*) AS BIGINT) AS n_payments
  FROM events GROUP BY 1
)
SELECT r.customer_number, r.total_due,
       coalesce(p.total_paid, 0.0) AS total_paid,
       CAST(coalesce(p.n_payments, 0) AS BIGINT) AS n_payments,
       r.total_due - coalesce(p.total_paid, 0.0) AS balance_after
FROM recv r LEFT JOIN pay p ON r.customer_number = p.customer_number
WHERE r.total_due > {RECV_PAY_MIN_DUE}
ORDER BY r.total_due DESC, r.customer_number ASC
LIMIT {RECV_PAY_TOP}"""


#: $bucket boundaries over order value (decimal-cast upstream so the sums
#: are order-independent — same policy as every money aggregate here).
ORDER_VALUE_BOUNDS = (0, 50_000, 150_000, 300_000, 600_000)


def mongo_order_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$bucket`` histogram of order value + per-bucket totals. The
    collection is a plan that pre-casts the measure to decimal(18,2) —
    the engine-side prep a Mongo user's ETL would do — so SUM is exact
    and hash-stable across engines."""
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = mongo_pipeline(
        orders,
        [
            {
                "$bucket": {
                    "groupBy": "$price_dec",
                    "boundaries": list(ORDER_VALUE_BOUNDS),
                    "default": -1,
                    "output": {
                        "n_orders": {"$sum": 1},
                        "total_value": {"$sum": "$price_dec"},
                        "max_value": {"$max": "$price_dec"},
                    },
                }
            }
        ],
    )
    # decimal accumulation inside the pipeline; portable DOUBLE boundary
    return out.withColumn(
        "total_value", dec2d(F.col("total_value"))
    ).withColumn("max_value", dec2d(F.col("max_value")))


_BUCKET_CASE = "CASE " + " ".join(
    f"WHEN CAST(o_totalprice AS DECIMAL(18,2)) >= {lo} "
    f"AND CAST(o_totalprice AS DECIMAL(18,2)) < {hi} THEN {lo}"
    for lo, hi in zip(ORDER_VALUE_BOUNDS, ORDER_VALUE_BOUNDS[1:])
) + " ELSE -1 END"

MONGO_ORDER_VALUE_BUCKETS_SQL = f"""SELECT {_BUCKET_CASE} AS _id,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value,
  CAST(CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS max_value
FROM orders GROUP BY 1"""


def mongo_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month order rollup through the pipeline's date expression
    operators ($year/$month/$dateToString) — the standard dashboard
    time-bucketing idiom. Measure pre-cast to decimal for exact sums."""
    from pyspark.sql import functions as F

    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "price_dec", F.col("o_totalprice").cast("decimal(18,2)")
    )
    out = mongo_pipeline(
        orders,
        [
            {
                "$group": {
                    "_id": {
                        "ym": {
                            "$dateToString": {
                                "format": "%Y-%m",
                                "date": "$o_orderdate",
                            }
                        }
                    },
                    "n_orders": {"$sum": 1},
                    "total_value": {"$sum": "$price_dec"},
                }
            },
        ],
    )
    # decimal accumulation inside the pipeline; portable DOUBLE boundary
    return out.withColumn("total_value", dec2d(F.col("total_value")))


MONGO_MONTHLY_ORDER_STATS_SQL = """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total_value
FROM orders GROUP BY 1"""


AUTO_BUCKETS = 8


def mongo_order_value_bucket_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$bucketAuto`` over order value: 8 ~equal-count quantile buckets
    with min/max bounds. The rank-based bucket rule (ties never split) is
    mirrored exactly by the oracle's PERCENT_RANK — both engines share the
    IEEE arithmetic, so the assignment is hash-stable."""
    from ..sources.tables import load_table

    return mongo_pipeline(
        load_table(spark, sf_dir, "orders"),
        [
            {
                "$bucketAuto": {
                    "groupBy": "$o_totalprice",
                    "buckets": AUTO_BUCKETS,
                    "output": {"n_orders": {"$sum": 1}},
                }
            }
        ],
    )


MONGO_ORDER_VALUE_BUCKET_AUTO_SQL = f"""WITH ranked AS (
  SELECT o_totalprice,
    CAST(least(floor(PERCENT_RANK() OVER (ORDER BY o_totalprice)
      * {AUTO_BUCKETS}), {AUTO_BUCKETS - 1}) AS BIGINT) AS b
  FROM orders
)
SELECT MIN(o_totalprice) AS _id_min, MAX(o_totalprice) AS _id_max,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ranked GROUP BY b"""


def mongo_priority_sort_by_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$sortByCount`` on order priority — Mongo's one-liner frequency
    table, compiled to groupBy + count + deterministic sort."""
    from ..sources.tables import load_table

    return mongo_pipeline(
        load_table(spark, sf_dir, "orders"),
        [{"$sortByCount": "$o_orderpriority"}],
    )


MONGO_PRIORITY_SORT_BY_COUNT_SQL = """SELECT o_orderpriority AS _id,
  CAST(COUNT(*) AS BIGINT) AS count
FROM orders GROUP BY 1 ORDER BY count DESC, _id ASC"""


#: $setWindowFields pipeline: per-priority monthly revenue with running
#: total, month sequence, previous month, and a 3-month order-count MA.
MONGO_RUNNING_PIPELINE = [
    {
        "$group": {
            "_id": {
                "ym": {
                    "$dateToString": {"format": "%Y-%m", "date": "$o_orderdate"}
                },
                "pri": "$o_orderpriority",
            },
            "revenue": {"$sum": {"$toDecimal": "$o_totalprice"}},
            "n_orders": {"$sum": 1},
        }
    },
    {
        "$setWindowFields": {
            "partitionBy": "$pri",
            "sortBy": {"ym": 1},
            "output": {
                "running_revenue": {
                    "$sum": "$revenue",
                    "window": {"documents": ["unbounded", "current"]},
                },
                "month_seq": {"$documentNumber": {}},
                "prev_revenue": {"$shift": {"output": "$revenue", "by": -1}},
                "avg_3m_orders": {
                    "$avg": "$n_orders",
                    "window": {"documents": [-2, "current"]},
                },
            },
        }
    },
]


def mongo_priority_monthly_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$setWindowFields`` — Mongo's window-function stage compiled to
    Spark windows (rank / shift / framed accumulators in one pass). The
    measure goes through ``$toDecimal`` so the running sum is
    order-independent (same rationale as functions/cleaning.dsum)."""
    from ..sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    out = mongo_pipeline(orders, MONGO_RUNNING_PIPELINE)
    # decimal accumulation inside the pipeline (incl. the running window);
    # portable DOUBLE at the output boundary (driver hash)
    for c in ("revenue", "running_revenue", "prev_revenue"):
        out = out.withColumn(c, dec2d(F.col(c)))
    return out


MONGO_PRIORITY_MONTHLY_RUNNING_SQL = """WITH m AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS ym, o_orderpriority AS pri,
         SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS revenue,
         CAST(COUNT(*) AS BIGINT) AS n_orders
  FROM orders GROUP BY 1, 2
)
SELECT ym, pri, CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue, n_orders,
  CAST(CAST(SUM(revenue) OVER w_cum AS VARCHAR) AS DOUBLE) AS running_revenue,
  CAST(ROW_NUMBER() OVER w_ord AS INTEGER) AS month_seq,
  CAST(CAST(LAG(revenue, 1) OVER w_ord AS VARCHAR) AS DOUBLE) AS prev_revenue,
  AVG(n_orders) OVER w_3 AS avg_3m_orders
FROM m
WINDOW w_ord AS (PARTITION BY pri ORDER BY ym),
       w_cum AS (PARTITION BY pri ORDER BY ym ROWS UNBOUNDED PRECEDING),
       w_3 AS (PARTITION BY pri ORDER BY ym
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""


#: Customer-key bound for the hierarchy traversal query (keeps the
#: unwound output compact; the traversal itself is unbounded-safe).
CHAIN_MAX_CUSTKEY = 300


def mongo_customer_region_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``$graphLookup`` over the dimension tree: customers start at their
    nation node and walk parent links up to the region root; the chain is
    unwound to one row per (customer, ancestor, depth). BFS compiles to
    one equi-join per level (operators/mongo_query._apply_graph_lookup) —
    the oracle is the equivalent static 2-level join union."""
    from ..sources.tables import load_table

    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nodes = nation.select(
        (F.col("n_nationkey") + 100).alias("_id"),
        F.col("n_name").alias("name"),
        (F.col("n_regionkey") + 200).alias("parent"),
    ).unionByName(
        region.select(
            (F.col("r_regionkey") + 200).alias("_id"),
            F.col("r_name").alias("name"),
            F.lit(None).cast("long").alias("parent"),
        )
    )
    custs = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= CHAIN_MAX_CUSTKEY)
        .select(
            F.col("c_custkey").alias("_id"),
            (F.col("c_nationkey") + 100).alias("start_node"),
        )
    )
    out = mongo_pipeline(
        custs,
        [
            {
                "$graphLookup": {
                    "from": nodes,
                    "startWith": "$start_node",
                    "connectFromField": "parent",
                    "connectToField": "_id",
                    "as": "ancestors",
                    "depthField": "depth",
                    "maxDepth": 3,
                }
            },
            {"$unwind": "$ancestors"},
        ],
    )
    return out.select(
        F.col("_id").alias("customer_number"),
        F.col("ancestors.name").alias("ancestor_name"),
        F.col("ancestors.depth").alias("depth"),
    )


MONGO_CUSTOMER_REGION_CHAIN_SQL = f"""SELECT c_custkey AS customer_number,
  n_name AS ancestor_name, CAST(0 AS BIGINT) AS depth
FROM customer JOIN nation ON n_nationkey = c_nationkey
WHERE c_custkey <= {CHAIN_MAX_CUSTKEY}
UNION ALL
SELECT c_custkey, r_name, CAST(1 AS BIGINT)
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
WHERE c_custkey <= {CHAIN_MAX_CUSTKEY}"""


#: $switch tier boundaries on o_totalprice (match the SQL CASE exactly).
_TIER_LARGE = 300_000.0
_TIER_MEDIUM = 100_000.0

MONTHLY_PRICE_TIER_PIPELINE = [
    {
        "$project": {
            "month": {"$dateTrunc": {"date": "$o_orderdate", "unit": "month"}},
            "tier": {
                "$switch": {
                    "branches": [
                        {
                            "case": {"$gte": ["$o_totalprice", _TIER_LARGE]},
                            "then": "large",
                        },
                        {
                            "case": {"$gte": ["$o_totalprice", _TIER_MEDIUM]},
                            "then": "medium",
                        },
                    ],
                    "default": "small",
                }
            },
            "price_dec": {"$toDecimal": "$o_totalprice"},
        }
    },
    {
        "$group": {
            "_id": {"month": "$month", "tier": "$tier"},
            "revenue": {"$sum": "$price_dec"},
            "n_orders": {"$sum": 1},
        }
    },
]


def mongo_monthly_price_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$dateTrunc month x $switch price tier -> decimal revenue + counts
    (the $switch/$dateTrunc dialect additions, oracle-checked)."""
    from ..sources.tables import load_table

    out = mongo_pipeline(
        load_table(spark, sf_dir, "orders"), MONTHLY_PRICE_TIER_PIPELINE
    )
    # decimal accumulation inside the pipeline; portable DOUBLE boundary
    return out.withColumn("revenue", dec2d(F.col("revenue")))


MONGO_MONTHLY_PRICE_TIERS_SQL = f"""SELECT
  -- DuckDB's date_trunc('month', ts) yields DATE; Spark's stays a
  -- timestamp — align the oracle's type explicitly.
  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
  CASE WHEN o_totalprice >= {_TIER_LARGE} THEN 'large'
       WHEN o_totalprice >= {_TIER_MEDIUM} THEN 'medium'
       ELSE 'small' END AS tier,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY 1, 2"""


QUERIES = {
    "mongo_monthly_price_tiers": _q(
        mongo_monthly_price_tiers, MONGO_MONTHLY_PRICE_TIERS_SQL
    ),
    "mongo_customer_region_chain": _q(
        mongo_customer_region_chain, MONGO_CUSTOMER_REGION_CHAIN_SQL,
        sample_col="customer_number",
    ),
    "mongo_priority_monthly_running": _q(
        mongo_priority_monthly_running, MONGO_PRIORITY_MONTHLY_RUNNING_SQL
    ),
    "mongo_order_value_buckets": _q(
        mongo_order_value_buckets, MONGO_ORDER_VALUE_BUCKETS_SQL
    ),
    "mongo_priority_sort_by_count": _q(
        mongo_priority_sort_by_count, MONGO_PRIORITY_SORT_BY_COUNT_SQL
    ),
    "mongo_order_value_bucket_auto": _q(
        mongo_order_value_bucket_auto, MONGO_ORDER_VALUE_BUCKET_AUTO_SQL
    ),
    "mongo_monthly_order_stats": _q(
        mongo_monthly_order_stats, MONGO_MONTHLY_ORDER_STATS_SQL
    ),
    "mongo_region_quarter_revenue": _q(
        mongo_region_quarter_revenue, MONGO_REGION_QUARTER_REVENUE_SQL
    ),
    "mongo_top_receivables": _q(
        mongo_top_receivables, _mongo_top_receivables_sql()
    ),
    "mongo_receivables_with_payments": _q(
        mongo_receivables_with_payments, _mongo_receivables_with_payments_sql()
    ),
}
