"""Temporal / non-equi join suite: as-of join (events self-referential,
DuckDB ``ASOF JOIN`` oracle) and a banded range join (broadcast non-equi).

The reference's implied workload joins payments to time-stamped balances
(Project.py:379-395 share customer keys across dated collections); the
as-of join is that query's engine primitive. The banded join is the
classic dimension-on-a-range shape (price tiers here; aging ladders in
stats_suite compute the same thing fully inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import dd_dsum, dsum
from ..operators.asof import asof_join
from ..sources.tables import load_table
from .base import Query as _q

#: (tier, lo, hi) bands over o_totalprice; hi=None means open-ended.
PRICE_TIERS = (
    ("low", 0.0, 50_000.0),
    ("mid", 50_000.0, 150_000.0),
    ("high", 150_000.0, 300_000.0),
    ("luxury", 300_000.0, None),
)


def purchase_last_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event, the same user's most recent click at or
    before the purchase timestamp (NULL if none) — one shuffle on user_id.

    The right side is pre-aggregated to unique (user_id, ts) with a
    deterministic ``max_by`` so as-of tie-breaks cannot differ between
    engines.
    """
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    out = asof_join(purch, clicks, on="user_id", left_ts="ts", right_ts="ts")
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_matched").alias("click_ts"),
        "click_value",
    )


PURCHASE_LAST_CLICK_ASOF_SQL = """SELECT l.event_id, l.user_id, l.ts,
  l.value AS purchase_value, r.ts AS click_ts, r.click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (
  SELECT user_id, ts, max_by(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) r ON l.user_id = r.user_id AND l.ts >= r.ts"""


#: Attribution window: clicks older than this don't count.
ASOF_TOLERANCE_S = 1800


def purchase_recent_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of: the last click counts only within a
    30-minute attribution window (pandas ``merge_asof(tolerance=...)``
    semantics — out-of-window purchases keep their row with NULL click).
    Same one-shuffle plan; the tolerance is a post-window predicate."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("click_value"))
    )
    out = asof_join(
        purch, clicks, on="user_id", left_ts="ts", right_ts="ts",
        tolerance_seconds=ASOF_TOLERANCE_S,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_matched").alias("click_ts"),
        "click_value",
    )


PURCHASE_RECENT_CLICK_ASOF_SQL = f"""SELECT l.event_id, l.user_id, l.ts,
  l.value AS purchase_value,
  CASE WHEN date_diff('second', r.ts, l.ts) <= {ASOF_TOLERANCE_S}
       THEN r.ts END AS click_ts,
  CASE WHEN date_diff('second', r.ts, l.ts) <= {ASOF_TOLERANCE_S}
       THEN r.click_value END AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (
  SELECT user_id, ts, max_by(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
) r ON l.user_id = r.user_id AND l.ts >= r.ts"""


def price_tier_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/revenue per price tier: broadcast banded range join
    (non-equi ``lo <= x < hi`` against a 4-row tier dimension).
    """
    tiers = spark.createDataFrame(
        list(PRICE_TIERS), "tier string, lo double, hi double"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    cond = (F.col("o_totalprice") >= F.col("lo")) & (
        F.col("hi").isNull() | (F.col("o_totalprice") < F.col("hi"))
    )
    return (
        orders.join(F.broadcast(tiers), cond)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("revenue"),
        )
    )


_TIER_VALUES = ", ".join(
    f"('{t}', {lo}, {'NULL' if hi is None else hi})" for t, lo, hi in PRICE_TIERS
)

PRICE_TIER_TOTALS_SQL = f"""SELECT tier,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {dd_dsum('o_totalprice')} AS revenue
FROM orders
JOIN (VALUES {_TIER_VALUES}) t(tier, lo, hi)
  ON o_totalprice >= lo AND (hi IS NULL OR o_totalprice < hi)
GROUP BY tier"""


QUERIES = {
    "purchase_recent_click_asof": _q(
        purchase_recent_click_asof, PURCHASE_RECENT_CLICK_ASOF_SQL
    ),
    "purchase_last_click_asof": _q(
        purchase_last_click_asof, PURCHASE_LAST_CLICK_ASOF_SQL
    ),
    "price_tier_totals": _q(price_tier_totals, PRICE_TIER_TOTALS_SQL),
}
