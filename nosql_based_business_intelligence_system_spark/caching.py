"""Session-scoped build-once caches with an OWNED lifecycle.

The engine stages expensive build artifacts per session — parquet table
handles (file listing + schema resolution), the IVF index (centroids +
checkpointed cell assignments), MinHash signature frames — keyed by
``(applicationId, ...)`` so a fresh session rebuilds. Before round 7 those
caches were bare module dicts: correct (applicationId-keyed), but nothing
ever evicted, and entries holding ``localCheckpoint``'d DataFrames pinned
their block-manager storage for the life of the session. A long-lived
BI/server session cycling many sf_dirs or index parameters grew storage
without bound, and the bench had to carry its own between-pass cleanup
hack (commit c9a3b10).

This module centralizes the pattern:

- :class:`SessionCache` — a bounded LRU. Eviction drops the Python refs
  AND nudges the JVM (see :func:`free_blocks`) so the evicted entries'
  checkpoint blocks are actually released, not just unreferenced.
- :func:`free_blocks` — the promoted bench hack: Spark's ContextCleaner
  frees checkpoint/broadcast/RDD blocks via *weak references*, which the
  JVM only notices on a GC; dropping the last Python ref moves storage to
  "unreachable", not "freed". ``gc.collect()`` (drop py4j proxies) +
  ``System.gc()`` (run the cleaner now) turns eviction into an actual
  storage release instead of a wait for the 30-min periodic GC.
- :func:`release_all` — explicit whole-session reset (tests, soak runs,
  long-lived servers switching corpora).

Capacity units are ENTRIES, not bytes: every cached artifact here is
either a lazy plan handle (tables — no storage) or a deliberately
materialized index whose size the builder already bounded, so a small
entry count is the right ceiling and keeps the policy predictable.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Iterable, TypeVar

from pyspark.sql import SparkSession

T = TypeVar("T")

__all__ = ["SessionCache", "free_blocks", "release_all"]


def free_blocks(spark: SparkSession) -> None:
    """Make the ContextCleaner release unreferenced storage NOW.

    Checkpoint/persist blocks of dropped DataFrames are freed by weak-ref
    cleanup that only runs when the JVM garbage-collects; observed at the
    sf10 campaign as 41 GB of stale block-manager spill and a -25% bench
    effect from memory pressure (PLANS.md round-6 notes).
    """
    import gc

    gc.collect()
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass  # connect-mode / mocked sessions: nothing to nudge


class SessionCache:
    """Bounded LRU for per-session build artifacts.

    Keys are namespaced by ``applicationId`` automatically; pass only the
    artifact coordinates (sf_dir, parameters, ...). ``get_or_build`` is
    the single access path, so every hit refreshes recency and every
    insert enforces the bound.
    """

    #: every live cache, for :func:`release_all`.
    _REGISTRY: list["SessionCache"] = []

    def __init__(self, name: str, capacity: int, holds_storage: bool = True):
        if capacity < 1:
            raise ValueError(f"capacity must be >= 1, got {capacity}")
        self.name = name
        self.capacity = capacity
        #: whether entries pin executor/block-manager storage (checkpointed
        #: or persisted frames). Caches of lazy plan handles (table
        #: handles: file listing + schema only) set False so eviction skips
        #: the stop-the-world gc.collect + System.gc nudge — a session
        #: interleaving >capacity sf_dirs would otherwise pay a full GC
        #: per table load for nothing (r7 advisory).
        self.holds_storage = holds_storage
        self._entries: OrderedDict[tuple, object] = OrderedDict()
        SessionCache._REGISTRY.append(self)

    def get_or_build(
        self, spark: SparkSession, key: Iterable, build: Callable[[], T]
    ) -> T:
        full = (spark.sparkContext.applicationId, *key)
        if full in self._entries:
            self._entries.move_to_end(full)
            return self._entries[full]  # type: ignore[return-value]
        value = build()
        self._entries[full] = value
        evicted = False
        while len(self._entries) > self.capacity:
            self._entries.popitem(last=False)
            evicted = True
        if evicted and self.holds_storage:
            free_blocks(spark)
        return value

    def release(self, spark: SparkSession | None = None) -> None:
        """Drop every entry; with a session, also free their blocks."""
        self._entries.clear()
        if spark is not None:
            free_blocks(spark)

    def __len__(self) -> int:
        return len(self._entries)


def release_all(spark: SparkSession) -> None:
    """Reset every registered cache and release their storage.

    Also clears Spark's CacheManager: ``.persist()``/``.cache()`` entries
    (the materialize-before-self-join frames, the rollup's finest grain)
    are held by a DRIVER-SIDE strong reference until unpersisted — weak-ref
    GC never frees them, so a whole-session reset must drop them explicitly.
    """
    for cache in SessionCache._REGISTRY:
        cache._entries.clear()
    try:
        spark.catalog.clearCache()
    except Exception:
        pass
    free_blocks(spark)
