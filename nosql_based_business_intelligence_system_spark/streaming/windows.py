"""Event-time windowed aggregations over the ``events`` stream.

The reference is batch-only (SURVEY.md §2.9); this module is the north-star
streaming facet. Design rule: every aggregation here is a *reuse* of a batch
expression under ``groupBy(window(...))`` — batch/stream parity is tested by
running the same transform through ``readStream`` (availableNow trigger) and
``read`` and diffing.

Scale notes: watermarks bound state; tumbling/sliding windows shuffle on
(window, keys); session windows keep per-key state until the gap closes.
``dropDuplicatesWithinWatermark`` is the streaming exact-dedup analogue of
operators/dedup.exact_dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Schema events arrive with after ts normalization (sources.tables).
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a directory of event parquet/json files.

    The fixture's events.parquet carries TIMESTAMP(NANOS) which the Spark
    scan rejects; streaming reads therefore expect *normalized* files — use
    ``materialize_events_dir`` (tests do) or any directory produced by our
    own sinks.
    """
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def materialize_events_dir(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Rewrite fixture events as micro-precision parquet files (streaming
    source fodder; several files so triggers see multiple batches)."""
    from ..sources.tables import load_table

    load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(out_dir)
    return out_dir


# --- windowed aggregations (shared batch/stream shapes) ---------------------


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-type event counts/value sums in tumbling event-time windows.

    total_value accumulates in exact decimal and lands as a portable
    double (functions.cleaning.dsumd): double sums drift with partial-agg
    order vs any sequential oracle — observed at the sf1 rehearsal.
    Decimal aggregation is stream-safe (partial aggregation + state
    merge are both exact adds)."""
    from ..functions.cleaning import dsumd

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsumd(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_activity(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window distinct-user activity (approx per window via exact
    count on grouped rows; stream-safe because the grouping carries state)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window_size, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "approx_users",
        )
    )


def session_activity(
    events: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap-based); session length + event count.

    session_value is decimal-accumulated with the portable double
    boundary (functions.cleaning.dsumd) — order-independent across
    partitionings and engines, stream-safe."""
    from ..functions.cleaning import dsumd

    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsumd(F.col("value")).alias("session_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact dedup on event_id within the watermark horizon — the streaming
    analogue of operators/dedup.exact_dedup with bounded state."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def purchases_with_recent_click(
    purchases: DataFrame,
    clicks: DataFrame,
    horizon: str = "2 hours",
    watermark: str = "4 hours",
) -> DataFrame:
    """Stream-stream interval join: purchases paired with same-user clicks
    in the preceding ``horizon``. Both sides watermarked; the time-range
    condition bounds each side's state store (rows age out once the other
    stream's watermark passes the horizon). Works identically on batch
    frames (the condition is just a theta join there).
    """
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"interval {horizon}"))
    )
    return p.join(c, cond, "inner").select(
        "purchase_id", "user_id", "purchase_ts", "click_ts", "click_value"
    )


def run_to_memory_sink(
    stream_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
) -> None:
    """Drain a stream with availableNow into an in-memory table (tests/demo)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
