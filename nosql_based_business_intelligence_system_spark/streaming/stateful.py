"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.9 / §7.1(8): the escape hatch for semantics windowed
aggregations can't express).

Operator: per-user lifetime activity tracker. State = (n_events,
total_value, last_seen); every micro-batch folds its rows into the state
and emits the updated snapshot. The batch twin (:func:`user_activity_batch`)
is a plain groupBy — stream/batch parity is the test contract: after
draining a finite stream (availableNow), the *final* snapshot per user must
equal the batch aggregate.

Scale notes: state lives in the state store keyed by user_id (RocksDB-
backed on a real cluster); the pandas function receives one key group per
call with Arrow batches, so per-key Python overhead is amortized. Use
GroupStateTimeout + watermark to bound state for unbounded key domains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: last_seen rides in state as epoch-microseconds: every column of the
#: running answer must live in state, or late micro-batches erase it.
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen_us", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _track_user(key, pdfs, state):
    import pandas as pd

    n, total, last_us = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = pdf["ts"].max().value // 1_000  # ns -> us
        last_us = mx if last_us is None else max(last_us, mx)
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_seen": [pd.Timestamp(last_us * 1_000)],
        }
    )


def user_activity_stateful(events: DataFrame) -> DataFrame:
    """Per-user running (n_events, total_value, last_seen) snapshots.

    Works on a stream (true stateful operator, update mode) and on a batch
    frame (single "micro-batch" fold — same code path, empty initial state).
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _track_user,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def user_activity_batch(events: DataFrame) -> DataFrame:
    """Batch twin of :func:`user_activity_stateful` (parity contract)."""
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("ts").alias("last_seen"),
    )


# --- continuous heavy hitters (streaming Misra-Gries) ------------------------

#: MG counters ride in state as parallel arrays (state rows are flat
#: structs); n is the bucket's total item count — the error certificate.
MG_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("item", StringType()),
        StructField("est_count", LongType()),
        StructField("bucket_n", LongType()),
    ]
)


def _mg_bucket_factory(k: int):
    def fold(key, pdfs, state):
        import pandas as pd

        from ..operators.heavyhitters import mg_fold

        if state.exists:
            items, counts, n = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n = {}, 0
        for pdf in pdfs:
            col = pdf["item"].dropna()
            n += len(col)
            mg_fold(counters, col, k)
        state.update((list(counters), list(counters.values()), n))
        yield pd.DataFrame(
            {
                "bucket": [key[0]] * len(counters),
                "item": list(counters),
                "est_count": list(counters.values()),
                "bucket_n": [n] * len(counters),
            }
        )

    return fold


def heavy_hitters_stateful(
    items: DataFrame, item_col: str, k: int = 64, n_buckets: int = 32
) -> DataFrame:
    """Continuous frequent-items dashboard: per hash bucket, a Misra-Gries
    summary maintained in the state store and re-emitted every micro-batch
    (update mode). Each item hashes to exactly ONE bucket, so its count is
    never split: every bucket summary carries the n_bucket/(k+1) bound of
    the operators.heavyhitters batch version, and with fewer than ``k``
    distinct items per bucket the counts are EXACT — which is the parity
    contract the stream/batch test pins down. Works on a stream and on a
    batch frame (one-fold, empty initial state) alike.

    State per bucket is <= k (item, count) pairs — bounded regardless of
    stream length; ``n_buckets`` bounds state-store parallelism.
    """
    keyed = items.select(
        F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets)).alias("bucket"),
        F.col(item_col).alias("item"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _mg_bucket_factory(k),
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_batch_exact(
    items: DataFrame, item_col: str, n_buckets: int = 32
) -> DataFrame:
    """Exact per-bucket counts — the parity twin for the exactness regime
    (distinct items per bucket <= k)."""
    return (
        items.select(
            F.pmod(F.xxhash64(F.col(item_col)), F.lit(n_buckets)).alias(
                "bucket"
            ),
            F.col(item_col).alias("item"),
        )
        .groupBy("bucket", "item")
        .agg(F.count(F.lit(1)).alias("est_count"))
    )
