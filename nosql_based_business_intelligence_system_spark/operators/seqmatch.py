"""Event-sequence pattern matching — ClickHouse ``sequenceMatch`` /
``windowFunnel`` parity, as pure Spark column expressions.

"Did this user view, then (later) click, then (later) purchase?" is a
subsequence question, not a first-touch question: first-touch funnels
(``conversion_funnel``) miss a click that happens after signup whenever
an *earlier* unrelated click exists. The classic SQL formulation is a
correlated EXISTS chain (one self-join per stage) — |pattern| scans of
the event table, quadratic blowup per user at 100 TB.

Here: ONE grouped pass collects each user's (ts, type) sequence, then a
higher-order ``aggregate`` runs a greedy NFA over the sorted array —
advance a stage when the event matches the next pattern step strictly
after the previously matched one. Greedy-earliest is optimal for
subsequence matching, so ``stages_completed`` equals the longest pattern
prefix embeddable in the user's history (== what the EXISTS chain
computes, which serves as the oracle).

State stays bounded by per-user event counts (collect_list per user —
the sessionize-then-match variant bounds it further); the NFA itself is
whole-stage-codegen'd, no UDF.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["sequence_stages"]


def sequence_stages(
    df: DataFrame,
    pattern: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per user: ``stages_completed`` = length of the longest prefix of
    ``pattern`` that embeds as a strictly-time-increasing subsequence of
    the user's events (ties in ``ts_col`` cannot chain — same as the
    strict-inequality EXISTS formulation). Adds ``completed`` for the
    full-pattern case.
    """
    if not pattern:
        raise ValueError("pattern must be non-empty")
    pat = F.array(*[F.lit(p) for p in pattern])
    seq = df.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(ts_col).alias("ts"),
                                    F.col(type_col).alias("et")))
        ).alias("__seq")
    )
    ts_type = df.schema[ts_col].dataType.simpleString()
    init = F.struct(
        F.lit(0).alias("stage"),
        F.lit(None).cast(ts_type).alias("last_ts"),
    )

    def step(acc, e):
        advance = (
            (acc.getField("stage") < F.lit(len(pattern)))
            & (
                e.getField("et")
                == F.element_at(pat, acc.getField("stage") + F.lit(1))
            )
            & (
                acc.getField("last_ts").isNull()
                | (e.getField("ts") > acc.getField("last_ts"))
            )
        )
        return F.struct(
            F.when(advance, acc.getField("stage") + F.lit(1))
            .otherwise(acc.getField("stage"))
            .alias("stage"),
            F.when(advance, e.getField("ts"))
            .otherwise(acc.getField("last_ts"))
            .alias("last_ts"),
        )

    # materialize the NFA state once: referencing the aggregate() from two
    # output columns re-evaluates the whole fold per column otherwise
    staged = seq.withColumn(
        "__stage", F.aggregate(F.col("__seq"), init, step).getField("stage")
    )
    return staged.select(
        F.col(user_col),
        F.col("__stage").alias("stages_completed"),
        (F.col("__stage") == F.lit(len(pattern))).alias("completed"),
    )
