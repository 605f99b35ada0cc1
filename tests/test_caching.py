"""Engine-owned cache lifecycle (round-7 verdict item 4).

Unit coverage for the bounded-LRU SessionCache, plus a SOAK test: run the
checkpoint/persist-heavy registry queries twice in one session, call
``release_all``, and assert block-manager storage returns to its pre-run
baseline — the guarantee that a long-lived BI/server session cycling
corpora does not grow storage without bound (pre-r7 the table/IVF caches
never evicted, and the bench carried its own cleanup hack).
"""

from __future__ import annotations

import time

import pytest

from nosql_based_business_intelligence_system_spark.caching import (
    SessionCache,
    free_blocks,
    release_all,
)


class _FakeSC:
    applicationId = "app-1"


class _FakeSpark:
    sparkContext = _FakeSC()


def test_lru_bound_and_recency():
    c = SessionCache("t-lru", capacity=2)
    spark = _FakeSpark()
    built = []

    def b(v):
        def _():
            built.append(v)
            return v

        return _

    assert c.get_or_build(spark, ("a",), b(1)) == 1
    assert c.get_or_build(spark, ("b",), b(2)) == 2
    # hit refreshes recency: a is now most-recent
    assert c.get_or_build(spark, ("a",), b(99)) == 1
    # inserting c evicts b (LRU), not a
    assert c.get_or_build(spark, ("c",), b(3)) == 3
    assert len(c) == 2
    assert c.get_or_build(spark, ("a",), b(98)) == 1  # still cached
    assert c.get_or_build(spark, ("b",), b(4)) == 4  # was evicted -> rebuilt
    assert built == [1, 2, 3, 4]


def test_application_id_scopes_keys():
    c = SessionCache("t-app", capacity=4)
    s1, s2 = _FakeSpark(), _FakeSpark()
    s2.sparkContext = type("SC", (), {"applicationId": "app-2"})()
    assert c.get_or_build(s1, ("k",), lambda: "one") == "one"
    # same coordinates, different session -> separate entry
    assert c.get_or_build(s2, ("k",), lambda: "two") == "two"
    assert len(c) == 2


def test_release_clears_entries():
    c = SessionCache("t-rel", capacity=4)
    spark = _FakeSpark()
    c.get_or_build(spark, ("k",), lambda: 1)
    assert len(c) == 1
    c.release()
    assert len(c) == 0


def test_capacity_must_be_positive():
    with pytest.raises(ValueError):
        SessionCache("t-bad", capacity=0)


def _storage_bytes(spark) -> int:
    """Total block-manager bytes held by cached/checkpointed RDDs."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def _settled_storage(spark, timeout_s: float = 30.0) -> int:
    """Storage after ContextCleaner settles (weak-ref cleanup is async:
    free_blocks queues it, the daemon drains it)."""
    deadline = time.time() + timeout_s
    last = _storage_bytes(spark)
    while time.time() < deadline:
        free_blocks(spark)
        time.sleep(1.0)
        cur = _storage_bytes(spark)
        if cur == 0 or (cur == last and cur < (64 << 20)):
            return cur
        last = cur
    return last


#: The registry's storage-accumulating queries: localCheckpoint (minhash
#: signatures + bands, IVF assignments, LM tokenize-once, connected
#: components) and persist (shingle self-join, multires rollup finest).
SOAK_QUERIES = (
    "dedup_minhash",
    "dedup_clusters",
    "ann_ivf_topk",
    "doc_lm_perplexity",
    "events_multires_rollup",
    "dedup_ngram_jaccard",
)


def test_soak_storage_returns_to_baseline(spark, sf_smoke):
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    release_all(spark)
    baseline = _settled_storage(spark)

    for _ in range(2):  # two full cycles: reuse paths AND rebuild paths
        for name in SOAK_QUERIES:
            QUERIES[name].fn(spark, sf_smoke).write.format("noop").mode(
                "overwrite"
            ).save()

    grown = _storage_bytes(spark)
    release_all(spark)
    settled = _settled_storage(spark)
    # The release must actually free what the cycles pinned: back to the
    # baseline (plus a small allowance for Spark-internal bookkeeping
    # blocks that are not query storage).
    assert settled <= baseline + (8 << 20), (
        f"storage leak: baseline={baseline} grown={grown} "
        f"after-release={settled}"
    )
