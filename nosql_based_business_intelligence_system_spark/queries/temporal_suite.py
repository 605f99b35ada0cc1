"""Temporal / non-equi join suite: as-of join (events self-referential,
DuckDB ``ASOF JOIN`` oracle) and a banded range join (broadcast non-equi).

The reference's implied workload joins payments to time-stamped balances
(Project.py:379-395 share customer keys across dated collections); the
as-of join is that query's engine primitive. The banded join is the
classic dimension-on-a-range shape (price tiers here; aging ladders in
stats_suite compute the same thing fully inline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import dd_dec2d, dd_dsumd, dec2d, MONEY_DEC, dd_dsum, dsum
from ..operators.asof import asof_join
from ..operators.rangejoin import band_join, interval_join, interval_overlap_join
from ..operators.scd import scd2_from_events
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


def purchase_nearest_click_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-click attribution: the closest click on EITHER side of each
    purchase (pandas ``merge_asof(direction='nearest')``; equidistant
    resolves backward). Same single exchange as the directional forms —
    the backward and forward windows share the hash partitioning."""
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
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        F.col("ts_matched").alias("click_ts"),
        "click_value",
    )


# DuckDB has no nearest ASOF: compose it from the two directional ASOF
# joins with the same backward tie-break (delta comparison at second
# granularity on both engines — cast-long and date_diff both truncate).
PURCHASE_NEAREST_CLICK_ASOF_SQL = """WITH clicks AS (
  SELECT user_id, ts, max_by(value, event_id) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
), p AS (
  SELECT * FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT p.event_id, r.ts AS bts, r.click_value AS bval
  FROM p ASOF LEFT JOIN clicks r
    ON p.user_id = r.user_id AND p.ts >= r.ts
), f AS (
  SELECT p.event_id, r.ts AS fts, r.click_value AS fval
  FROM p ASOF LEFT JOIN clicks r
    ON p.user_id = r.user_id AND p.ts <= r.ts
)
SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value,
  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        OR date_diff('second', bts, p.ts) <= date_diff('second', p.ts, fts))
       THEN bts ELSE fts END AS click_ts,
  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        OR date_diff('second', bts, p.ts) <= date_diff('second', p.ts, fts))
       THEN bval ELSE fval END AS click_value
FROM p
LEFT JOIN b ON p.event_id = b.event_id
LEFT JOIN f ON p.event_id = f.event_id"""


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
            # decimal accumulation, portable DOUBLE boundary
            dec2d(dsum(F.col("o_totalprice"))).alias("revenue"),
        )
    )


_TIER_VALUES = ", ".join(
    f"('{t}', {lo}, {'NULL' if hi is None else hi})" for t, lo, hi in PRICE_TIERS
)

PRICE_TIER_TOTALS_SQL = f"""SELECT tier,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  {dd_dsumd('o_totalprice')} AS revenue
FROM orders
JOIN (VALUES {_TIER_VALUES}) t(tier, lo, hi)
  ON o_totalprice >= lo AND (hi IS NULL OR o_totalprice < hi)
GROUP BY tier"""


#: +-2h attribution band for purchase<->click proximity.
CLICK_BAND_S = 7200


def purchase_nearby_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: how many same-user clicks landed within +-2h,
    and their total click value. Banded range join via the bin strategy
    (operators/rangejoin.py) — equi-join on (user_id, time-bin), never a
    nested-loop theta join. Left semantics composed on top: aggregate the
    inner matches, join back to the full purchase set, zero-fill.
    """
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    pairs = band_join(
        purch, clicks, left_ts="ts", right_ts="click_ts",
        band_seconds=CLICK_BAND_S, on="user_id",
    )
    per_purchase = pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        dsum(F.col("click_value")).alias("click_value"),
    )
    return (
        purch.join(per_purchase, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_clicks", F.lit(0)).alias("n_clicks"),
            # decimal zero-fill, portable DOUBLE boundary
            dec2d(
                F.coalesce("click_value", F.lit(0).cast(MONEY_DEC))
            ).alias("click_value"),
        )
    )


PURCHASE_NEARBY_CLICKS_SQL = f"""SELECT p.event_id, p.user_id, p.ts,
  CAST(COUNT(c.ts) AS BIGINT) AS n_clicks,
  {dd_dec2d(f"COALESCE({dd_dsum('c.value')}, CAST(0 AS DECIMAL(38,6)))")}
    AS click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND abs(date_diff('second', c.ts, p.ts)) <= {CLICK_BAND_S}
GROUP BY p.event_id, p.user_id, p.ts"""


#: Session gap: a >12h silence starts a new session (events are sparse in
#: the fixture — median same-user gap ~18h — so a web-style 30min gap
#: would make every session a single event).
SESSION_GAP_S = 43_200


def session_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of click/view activity, then point-in-
    interval join assigning each purchase to the session whose time span
    contains it. Returns one row per session that captured >=1 purchase.

    Plan shape: one window pass on user_id builds sessions (lag -> gap
    flag -> running sum), then the binned interval join (1h bins; max
    session span in fixtures ~44 bins) equi-joins purchases on
    (user_id, bin). No theta join anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    act = (
        ev.filter(F.col("event_type").isin("click", "view"))
        .select("user_id", "ts")
        .withColumn(
            "__new",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.col("ts").cast("long") - F.lag("ts").over(w).cast("long")
                    > SESSION_GAP_S
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__sid",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    sessions = act.groupBy("user_id", "__sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_activity"),
    ).drop("__sid")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    assigned = interval_join(
        purch,
        sessions,
        point_ts="ts",
        start_ts="session_start",
        end_ts="session_end",
        on="user_id",
        bin_width_seconds=3600,
    )
    return assigned.groupBy(
        "user_id", "session_start", "session_end", "n_activity"
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        # decimal accumulation, portable DOUBLE boundary
        dec2d(dsum(F.col("purchase_value"))).alias("purchase_value"),
    )


SESSION_PURCHASE_ATTRIBUTION_SQL = f"""WITH act AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                OR date_diff('second',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts),
                     ts) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_s
  FROM events WHERE event_type IN ('click', 'view')
), lab AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM act
), sess AS (
  SELECT user_id, sid,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         CAST(COUNT(*) AS BIGINT) AS n_activity
  FROM lab GROUP BY user_id, sid
)
SELECT s.user_id, s.session_start, s.session_end, s.n_activity,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {dd_dsumd('p.value')} AS purchase_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN sess s
  ON p.user_id = s.user_id
 AND p.ts BETWEEN s.session_start AND s.session_end
GROUP BY s.user_id, s.session_start, s.session_end, s.n_activity"""


def user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history from the event log: consecutive same-type runs
    per user collapse into validity intervals (operators/scd.py — the
    gaps-and-islands compression; one window pass, no self-join).
    valid_to is NULL on each user's current state."""
    ev = load_table(spark, sf_dir, "events")
    return scd2_from_events(ev, key="user_id", ts="ts", attrs=["event_type"])


USER_STATE_HISTORY_SQL = """WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
), starts AS (
  SELECT user_id, ts, event_type FROM flagged WHERE chg = 1
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
FROM starts"""


def ship_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment latency per order month: line-level order-to-ship delay
    in whole days (both date columns are midnight-aligned, so Spark's
    datediff and DuckDB's date_diff('day') agree exactly), with integer
    min/max and the exact-ratio average (int sum / bigint count — same
    operands, same IEEE double on both engines). One broadcast-eligible
    fact-to-fact equi-join + one grouped pass."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    delay = F.datediff("l_shipdate", "o_orderdate")
    return (
        j.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.min(delay).cast("bigint").alias("min_delay_days"),
            F.max(delay).cast("bigint").alias("max_delay_days"),
            (F.sum(delay) / F.count(F.lit(1))).alias("avg_delay_days"),
        )
    )


SHIP_DELAY_PROFILE_SQL = """SELECT
  strftime(o_orderdate, '%Y-%m') AS order_month,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(MIN(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
    AS min_delay_days,
  CAST(MAX(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT)
    AS max_delay_days,
  SUM(date_diff('day', o_orderdate, l_shipdate)) * 1.0 / COUNT(*)
    AS avg_delay_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1"""


def purchase_state_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 lookup: each purchase joined to the user-state
    dimension row valid AT the purchase timestamp — the canonical
    warehouse pattern (fact rows must see the dimension as it was, not as
    it is). SCD2 validity intervals are contiguous per key, so the lookup
    is exactly a backward as-of join on valid_from: one shuffle, no
    point-in-interval explode, no sentinel for the open current row."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    states = scd2_from_events(
        ev, key="user_id", ts="ts", attrs=["event_type"]
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("valid_from"),
    )
    out = asof_join(
        purch, states, on="user_id", left_ts="ts", right_ts="valid_from"
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "purchase_value",
        "state",
        F.col("valid_from").alias("state_since"),
    )


PURCHASE_STATE_LOOKUP_SQL = """WITH flagged AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id ORDER BY ts)
                   IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
), starts AS (
  SELECT user_id, ts AS valid_from, event_type AS state
  FROM flagged WHERE chg = 1
)
SELECT l.event_id, l.user_id, l.ts, l.value AS purchase_value,
       r.state, r.valid_from AS state_since
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN starts r
  ON l.user_id = r.user_id AND l.ts >= r.valid_from"""


def activity_overlap_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user purchase-activity x click-activity window overlaps (daily
    [first, last] spans per type): interval x interval range join via
    operators/rangejoin.interval_overlap_join — bin-keyed equi-join, each
    overlapping pair emitted exactly once in the bin holding the overlap's
    start, never a per-key cross join. Overlap length at second
    granularity (both engines truncate identically)."""
    ev = load_table(spark, sf_dir, "events")

    def spans(kind: str, s: str, e: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy("user_id", F.to_date("ts").alias("__d"))
            .agg(F.min("ts").alias(s), F.max("ts").alias(e))
            .drop("__d")
        )

    out = interval_overlap_join(
        spans("purchase", "p_start", "p_end"),
        spans("click", "c_start", "c_end"),
        left_start="p_start",
        left_end="p_end",
        right_start="c_start",
        right_end="c_end",
        on="user_id",
        bin_width_seconds=6 * 3600,
    )
    return out.select(
        "user_id",
        "p_start",
        "p_end",
        "c_start",
        "c_end",
        (
            F.least(F.col("p_end"), F.col("c_end")).cast("long")
            - F.greatest(F.col("p_start"), F.col("c_start")).cast("long")
        ).alias("overlap_seconds"),
    )


ACTIVITY_OVERLAP_WINDOWS_SQL = """WITH p AS (
  SELECT user_id, MIN(ts) AS p_start, MAX(ts) AS p_end
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, CAST(ts AS DATE)
), c AS (
  SELECT user_id, MIN(ts) AS c_start, MAX(ts) AS c_end
  FROM events WHERE event_type = 'click'
  GROUP BY user_id, CAST(ts AS DATE)
)
SELECT p.user_id, p_start, p_end, c_start, c_end,
  CAST(date_diff('second', greatest(p_start, c_start),
                 least(p_end, c_end)) AS BIGINT) AS overlap_seconds
FROM p JOIN c ON p.user_id = c.user_id
 AND p_start <= c_end AND c_start <= p_end"""


QUERIES = {
    "activity_overlap_windows": _q(
        activity_overlap_windows, ACTIVITY_OVERLAP_WINDOWS_SQL,
        sample_col="user_id",
    ),
    "purchase_state_lookup": _q(
        purchase_state_lookup, PURCHASE_STATE_LOOKUP_SQL,
        sample_col="event_id",
    ),
    "ship_delay_profile": _q(ship_delay_profile, SHIP_DELAY_PROFILE_SQL),
    "user_state_history": _q(
        user_state_history, USER_STATE_HISTORY_SQL, sample_col="user_id"
    ),
    "purchase_nearest_click_asof": _q(
        purchase_nearest_click_asof, PURCHASE_NEAREST_CLICK_ASOF_SQL,
        sample_col="event_id",
    ),
    "purchase_recent_click_asof": _q(
        purchase_recent_click_asof, PURCHASE_RECENT_CLICK_ASOF_SQL,
        sample_col="event_id",
    ),
    "purchase_last_click_asof": _q(
        purchase_last_click_asof, PURCHASE_LAST_CLICK_ASOF_SQL,
        sample_col="event_id",
    ),
    "price_tier_totals": _q(price_tier_totals, PRICE_TIER_TOTALS_SQL),
    "purchase_nearby_clicks": _q(
        purchase_nearby_clicks, PURCHASE_NEARBY_CLICKS_SQL,
        sample_col="event_id",
    ),
    "session_purchase_attribution": _q(
        session_purchase_attribution, SESSION_PURCHASE_ATTRIBUTION_SQL,
        sample_col="user_id",
    ),
}
