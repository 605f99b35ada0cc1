"""Event-time window suite over ``events`` (batch shapes of the streaming
facet — the same transforms run under readStream; tests/test_streaming.py
proves batch/stream parity with availableNow triggers).

Oracles: tumbling = date_trunc; sliding = the 2-window unnest expansion;
session = gap-flag + cumulative-sum session ids (identical semantics to
Spark's session_window: session end = last event + gap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cleaning import dd_dsumd
from ..sources.tables import load_table
from ..streaming import windows as W
from ..operators.seqmatch import sequence_stages
from ..streaming.sinks import upsert_batch
from .base import Query as _q


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.tumbling_counts(_events(spark, sf_dir), "1 hour")


EVENTS_TUMBLING_HOURLY_SQL = f"""SELECT
  date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  {dd_dsumd('value')} AS total_value
FROM events GROUP BY 1, 2, 3"""


def events_sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30min; exact distinct users (batch shape —
    the streaming variant uses approx_count_distinct for bounded state)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "n_users",
        )
    )


EVENTS_SLIDING_HOURLY_SQL = """WITH expanded AS (
  SELECT e.*, ws AS window_start
  FROM events e, unnest([
    time_bucket(INTERVAL 30 MINUTES, ts),
    time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES
  ]) AS t(ws)
)
SELECT window_start, window_start + INTERVAL 1 HOUR AS window_end,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM expanded GROUP BY 1, 2"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return W.session_activity(_events(spark, sf_dir), gap="15 minutes")


EVENTS_SESSIONIZATION_SQL = f"""WITH flagged AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
              > INTERVAL 15 MINUTES OR
              LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, value
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 15 MINUTES AS session_end,
       user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       {dd_dsumd('value')} AS session_value
FROM sessions GROUP BY user_id, session_id"""


def events_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch shape of streaming_dedup: distinct event_ids survive."""
    deduped = W.streaming_dedup(_events(spark, sf_dir))
    return deduped.agg(F.count(F.lit(1)).alias("n_unique_events"))


EVENTS_DEDUP_COUNT_SQL = (
    "SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_unique_events FROM events"
)


def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over raw events: users whose first signup
    precedes their first click precedes their first purchase. One grouped
    pass builds per-user first-touch timestamps; the funnel is then three
    conditional counts — no self-joins, no per-step scans."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")

    def first_ts(kind: str):
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("signup").alias("t_signup"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") >= F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") >= F.col("t_click"))
    cnt = lambda c: F.sum(c.cast("int")).cast("bigint")
    return per_user.agg(
        cnt(signed).alias("n_signup"),
        cnt(clicked).alias("n_signup_then_click"),
        cnt(purchased).alias("n_full_funnel"),
    )


CONVERSION_FUNNEL_SQL = """WITH per_user AS (
  SELECT user_id,
    MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
                THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_then_click,
  CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click >= t_signup
                AND t_purchase >= t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM per_user"""


def payments_by_fiscal_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payments collection's flagship rollup (FIXTURES.md maps
    events.value/ts to tot_payment/deposit_date): payment totals per
    FISCAL month — the fiscal calendar applied to a second date domain."""
    from ..functions import fiscal
    from ..functions.cleaning import dsum0d
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("deposit_date"), F.col("value").alias("tot_payment")
    )
    enriched = fiscal.with_fiscal_columns(ev, "deposit_date")
    return enriched.groupBy("fin_month_label").agg(
        dsum0d(F.col("tot_payment")).alias("total_payments"),
        F.count(F.lit(1)).alias("n_payments"),
    )


PAYMENTS_BY_FISCAL_MONTH_SQL = f"""WITH anchored AS (
  SELECT CAST(ts AS DATE) AS deposit_date, value AS tot_payment,
         {{anchor}} AS fin_anchor
  FROM events
)
SELECT strftime(fin_anchor, '%Y-%m') AS fin_month_label,
       {{dd_total}} AS total_payments,
       CAST(COUNT(*) AS BIGINT) AS n_payments
FROM anchored GROUP BY 1"""


def _payments_sql() -> str:
    from ..functions import fiscal

    from ..functions.cleaning import dd_dsum0d

    return PAYMENTS_BY_FISCAL_MONTH_SQL.format(
        anchor=fiscal.dd_fiscal_anchor("CAST(ts AS DATE)"),
        dd_total=dd_dsum0d("tot_payment"),
    )


def weekly_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week (cohort) x
    each later week they were active -> user counts. Two grouped passes
    (first-touch per user, then distinct user-weeks) joined on user —
    the standard retention triangle, no per-week self-joins."""
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    cohort = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy("cohort_week", "week")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


WEEKLY_RETENTION_MATRIX_SQL = """WITH weeks AS (
  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM weeks GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, week FROM weeks
)
SELECT cohort_week, week, CAST(COUNT(DISTINCT active.user_id) AS BIGINT) AS n_users
FROM active JOIN cohort ON active.user_id = cohort.user_id
GROUP BY cohort_week, week"""


def user_latest_event_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsert sink's merge as a batch query: last-write-wins state per
    user (streaming/sinks.py — version-wins keyed merge; the streamed
    foreachBatch drain converges to exactly this frame,
    tests/test_upsert_sink.py). (user_id, ts) is tie-free in the fixtures,
    so max_by is deterministic."""
    ev = _events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    return upsert_batch(None, ev, ["user_id"], "ts").select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


USER_LATEST_EVENT_STATE_SQL = """SELECT user_id,
  max_by(ts, ts) AS last_ts,
  max_by(event_id, ts) AS last_event_id,
  max_by(event_type, ts) AS last_event_type,
  max_by(value, ts) AS last_value
FROM events GROUP BY user_id"""


#: Funnel pattern for the sequence-NFA query.
FUNNEL_PATTERN = ("signup", "click", "purchase")


def funnel_sequence_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True-subsequence funnel (ClickHouse sequenceMatch parity): per
    user, the longest prefix of signup->click->purchase embeddable as a
    strictly-increasing subsequence of their history — the general form
    of conversion_funnel's first-touch heuristic (which misses a
    signup->click chain whenever an earlier unrelated click exists). One
    grouped pass + an expression-level NFA (operators/seqmatch.py); the
    oracle is the greedy min-chain (earliest valid event per stage),
    which is provably the same answer."""
    return sequence_stages(
        _events(spark, sf_dir), FUNNEL_PATTERN
    )


FUNNEL_SEQUENCE_STAGES_SQL = """WITH t1 AS (
  SELECT user_id, MIN(ts) AS ts1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), t2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
  JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.ts1 GROUP BY 1
), t3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
  JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.ts2 GROUP BY 1
)
SELECT u.user_id,
  CAST(CASE WHEN ts3 IS NOT NULL THEN 3
            WHEN ts2 IS NOT NULL THEN 2
            WHEN ts1 IS NOT NULL THEN 1
            ELSE 0 END AS INTEGER) AS stages_completed,
  (ts3 IS NOT NULL) AS completed
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN t1 USING (user_id)
LEFT JOIN t2 USING (user_id)
LEFT JOIN t3 USING (user_id)"""


QUERIES = {
    "conversion_funnel": _q(conversion_funnel, CONVERSION_FUNNEL_SQL),
    "funnel_sequence_stages": _q(
        funnel_sequence_stages, FUNNEL_SEQUENCE_STAGES_SQL,
        sample_col="user_id",
    ),
    "user_latest_event_state": _q(
        user_latest_event_state, USER_LATEST_EVENT_STATE_SQL,
        sample_col="user_id",
    ),
    "weekly_retention_matrix": _q(
        weekly_retention_matrix, WEEKLY_RETENTION_MATRIX_SQL
    ),
    "payments_by_fiscal_month": _q(payments_by_fiscal_month, _payments_sql()),
    "events_tumbling_hourly": _q(events_tumbling_hourly, EVENTS_TUMBLING_HOURLY_SQL),
    "events_sliding_hourly": _q(events_sliding_hourly, EVENTS_SLIDING_HOURLY_SQL),
    "events_sessionization": _q(
        events_sessionization, EVENTS_SESSIONIZATION_SQL, sample_col="user_id"
    ),
    "events_dedup_count": _q(events_dedup_count, EVENTS_DEDUP_COUNT_SQL),
}
