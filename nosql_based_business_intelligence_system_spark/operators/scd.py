"""Slowly-changing-dimension (type 2) operators — the versioned-dimension
half of a warehouse ETL spine.

The reference rebuilds its wide table from full snapshots every run
(Project.py ingests the complete CSV each time); at 100 TB a dimension
is maintained *incrementally* as versioned rows: ``(key, attrs,
valid_from, valid_to)`` with ``valid_to IS NULL`` marking the current
version. Two entry points:

- :func:`scd2_from_events` — compress an event log into version history
  (the gaps-and-islands collapse: consecutive rows with unchanged
  attributes merge into one validity interval). One window pass per key;
  no self-join.
- :func:`scd2_apply` — fold an update batch into an existing SCD2 table:
  open versions close at the first superseding change, genuinely-new
  attribute states append, no-op updates (attrs unchanged) are dropped,
  closed history is untouched. Implemented as closed-history union +
  one :func:`scd2_from_events` pass over (open versions + updates) —
  the merge IS the compression, one shuffle on the key.

Attribute comparison is null-safe (NULL == NULL for change detection).
Rows with equal (key, ts) are rejected upstream concerns — feed unique
timestamps per key (the fixtures' event streams are tie-free).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_from_events", "scd2_apply"]


def scd2_from_events(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Event log -> SCD2 history: one row per run of unchanged ``attrs``
    per ``key``, with ``valid_from`` = first event of the run and
    ``valid_to`` = start of the next run (NULL for the current version).
    """
    if not attrs:
        raise ValueError("attrs must be non-empty")
    w = Window.partitionBy(key).orderBy(ts)
    cur = F.struct(*[F.col(a) for a in attrs])
    changed = F.lag(cur).over(w).isNull() | ~cur.eqNullSafe(F.lag(cur).over(w))
    starts = (
        df.select(key, ts, *attrs)
        .withColumn("__chg", changed)
        .filter(F.col("__chg"))
        .drop("__chg")
    )
    w2 = Window.partitionBy(key).orderBy(ts)
    return (
        starts.withColumn("valid_to", F.lead(ts).over(w2))
        .withColumnRenamed(ts, "valid_from")
        .select(key, *attrs, "valid_from", "valid_to")
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    *,
    key: str,
    ts: str,
    attrs: Sequence[str],
) -> DataFrame:
    """Fold ``updates`` (rows of ``key, attrs, ts``) into an SCD2 ``dim``
    (rows of ``key, attrs, valid_from, valid_to``).

    Updates timestamped before a key's current ``valid_from`` would
    rewrite committed history — they raise at execution time rather than
    silently reordering it. New keys insert; changed attrs version; no-op
    updates vanish.
    """
    open_rows = dim.filter(F.col("valid_to").isNull())
    closed = dim.filter(F.col("valid_to").isNotNull())

    guard = open_rows.select(
        F.col(key).alias("__k"), F.col("valid_from").alias("__vf")
    )
    ts_type = updates.schema[ts].dataType.simpleString()
    # the guard lives inside the kept ts column — a standalone guard
    # column would be pruned by Catalyst and never evaluated
    guarded_ts = F.when(
        F.col("__vf").isNotNull() & (updates[ts] < F.col("__vf")),
        F.raise_error(
            F.concat(
                F.lit("scd2_apply: update for key "),
                updates[key].cast("string"),
                F.lit(" predates the open version ("),
                updates[ts].cast("string"),
                F.lit(" < "),
                F.col("__vf").cast("string"),
                F.lit(")"),
            )
        ).cast(ts_type),
    ).otherwise(updates[ts])
    checked = updates.join(guard, updates[key] == guard["__k"], "left").select(
        updates[key], *[updates[a] for a in attrs], guarded_ts.alias(ts)
    )

    events = open_rows.select(
        key, *attrs, F.col("valid_from").alias(ts)
    ).unionByName(checked.select(key, *attrs, ts))
    reopened = scd2_from_events(events, key=key, ts=ts, attrs=attrs)
    return closed.unionByName(reopened)
