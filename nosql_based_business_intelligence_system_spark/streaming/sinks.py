"""Exactly-once keyed upsert sink for Structured Streaming foreachBatch —
the "merge into the serving table" half of a streaming pipeline, built on
plain parquet (no transactional table format in this container).

Spark's file sinks are append-only; an upsert needs a table format or a
foreachBatch merge. This module implements the latter with a tiny
versioned-directory protocol that keeps the sink *idempotent under batch
retry* (Structured Streaming re-runs a foreachBatch epoch after failure —
a naive read-modify-overwrite double-applies it):

    {path}/v=<epoch>/part-*.parquet     one immutable snapshot per epoch
    {path}/_CURRENT                     "epoch\\n" pointer, atomic rename

- A retried epoch either finds the pointer already at its epoch (skip) or
  rewrites its own v=<epoch> dir from the *previous* snapshot — never
  reads what it is writing.
- Readers follow the pointer: they see the last committed snapshot, never
  a half-written one (rename is atomic on POSIX).
- Old snapshots are pruned, keeping ``keep_versions`` for in-flight readers.

Each snapshot is a full rewrite, which is correct-but-heavy at 100 TB; the
scale path is the same merge against a partitioned table where only the
partitions containing updated keys rewrite (partition the state by
``hash(key) % N`` — the merge join then prunes untouched partitions), or a
transactional format (Delta/Iceberg MERGE) where available. The protocol
and the merge semantics here are the same either way.

File ops use local/NFS ``os`` primitives; for object stores, swap the
``_list/_read/_replace`` seam for the Hadoop FileSystem API.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.rollup import MEASURE_KINDS as ROLLUP_KINDS

__all__ = ["upsert_batch", "ParquetUpsertSink", "ContinuousAggregateSink"]


def upsert_batch(
    current: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    order_col: str,
) -> DataFrame:
    """Merge ``batch`` into ``current``: per key, the row with the
    greatest ``order_col`` across BOTH frames wins. Version-wins (not
    arrival-wins) makes the merge commutative and idempotent — replayed
    or out-of-order micro-batches converge to the same state instead of
    regressing newer rows. (``order_col`` ties per key are broken
    arbitrarily — feed a unique ordering column for determinism.)"""
    win = batch.groupBy(*keys).agg(
        F.max_by(F.struct(*batch.columns), F.col(order_col)).alias("__row")
    ).select("__row.*")
    if current is None:
        return win
    u = current.unionByName(win)
    return u.groupBy(*keys).agg(
        F.max_by(F.struct(*u.columns), F.col(order_col)).alias("__row")
    ).select("__row.*")


class _SnapshotSink:
    """Shared snapshot/pointer/retry protocol for foreachBatch sinks.

    Subclasses define ``_merge(current, batch_df)`` — how a micro-batch
    folds into the previous state snapshot.
    """

    def __init__(self, path: str, keep_versions: int = 3) -> None:
        self.path = path
        self.keep_versions = max(1, int(keep_versions))

    def _merge(
        self, current: DataFrame | None, batch_df: DataFrame
    ) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    # -- pointer protocol ---------------------------------------------------
    @property
    def _pointer(self) -> str:
        return os.path.join(self.path, "_CURRENT")

    def committed_epoch(self) -> int | None:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def _snapshot_dir(self, epoch: int) -> str:
        return os.path.join(self.path, f"v={epoch}")

    def _commit(self, epoch: int) -> None:
        tmp = self._pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{epoch}\n")
        os.replace(tmp, self._pointer)  # atomic on POSIX

    def _prune(self, committed: int) -> None:
        versions = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("v=") and d.split("=", 1)[1].isdigit()
        )
        live = [v for v in versions if v <= committed][-self.keep_versions:]
        for v in versions:
            if v < committed and v not in live:
                shutil.rmtree(self._snapshot_dir(v), ignore_errors=True)

    # -- sink ----------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        """Latest committed snapshot, or None before the first commit."""
        epoch = self.committed_epoch()
        if epoch is None:
            return None
        return spark.read.parquet(self._snapshot_dir(epoch))

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        committed = self.committed_epoch()
        if committed is not None and committed >= epoch_id:
            return  # retry of an already-committed epoch: no-op
        os.makedirs(self.path, exist_ok=True)
        merged = self._merge(self.read(batch_df.sparkSession), batch_df)
        out = self._snapshot_dir(epoch_id)
        merged.write.mode("overwrite").parquet(out)  # retry-safe: same dir
        self._commit(epoch_id)
        self._prune(epoch_id)


class ParquetUpsertSink(_SnapshotSink):
    """``df.writeStream.foreachBatch(ParquetUpsertSink(path, keys, order))``.

    Maintains a keyed, last-write-wins materialized state table under
    ``path`` with snapshot isolation and retry idempotence (see module
    docstring). ``read(spark)`` returns the latest committed snapshot.
    """

    def __init__(
        self,
        path: str,
        keys: list[str],
        order_col: str,
        keep_versions: int = 3,
    ) -> None:
        if not keys:
            raise ValueError("keys must be non-empty")
        super().__init__(path, keep_versions)
        self.keys = list(keys)
        self.order_col = order_col

    def _merge(self, current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        return upsert_batch(current, batch_df, self.keys, self.order_col)


class ContinuousAggregateSink(_SnapshotSink):
    """Streaming continuous aggregate — the incremental-maintenance twin of
    ``operators/rollup.multires_rollup``'s finest grain.

    Each micro-batch is aggregated to partial ``(bucket_start, *group_by)``
    rows, then folded ADDITIVELY into the state snapshot (sum-of-sums,
    min-of-mins, ...): per epoch, work is O(batch) + O(state), and late
    rows simply fold into their (old) bucket — no watermark cliff, the
    aggregate is eventually exact. Retry safety comes from the epoch
    check: a replayed batch is skipped, never double-added.

    ``measures`` uses the same ``(name, Column, kind)`` spec as
    ``multires_rollup`` (decomposable kinds only).
    """

    def __init__(
        self,
        path: str,
        *,
        ts: str,
        measures: Sequence[tuple[str, Column, str]],
        group_by: Sequence[str] = (),
        resolution: str = "hour",
        keep_versions: int = 3,
    ) -> None:
        super().__init__(path, keep_versions)
        for _, _, kind in measures:
            if kind not in ROLLUP_KINDS:
                raise ValueError(f"unknown measure kind {kind!r}")
        self.ts = ts
        self.measures = list(measures)
        self.group_by = list(group_by)
        self.resolution = resolution

    def _merge(self, current: DataFrame | None, batch_df: DataFrame) -> DataFrame:
        partial = batch_df.groupBy(
            F.date_trunc(self.resolution, F.col(self.ts)).alias("bucket_start"),
            *self.group_by,
        ).agg(
            *[
                ROLLUP_KINDS[kind][0](col).alias(name)
                for name, col, kind in self.measures
            ]
        )
        if current is None:
            return partial
        u = current.unionByName(partial)
        return u.groupBy("bucket_start", *self.group_by).agg(
            *[
                ROLLUP_KINDS[kind][1](F.col(name)).alias(name)
                for name, _, kind in self.measures
            ]
        )


def run_upsert(
    stream_df: DataFrame,
    sink: ParquetUpsertSink,
    checkpoint_dir: str,
) -> None:
    """Drain ``stream_df`` through the upsert sink with availableNow."""
    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
