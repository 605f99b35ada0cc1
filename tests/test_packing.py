"""Shard-packing invariants: budget respected (modulo one-doc overflow),
order preserved, deterministic, grouped independently."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.operators import packing

ROWS = [
    Row(lang="en", doc_id=1, nt=40),
    Row(lang="en", doc_id=2, nt=40),
    Row(lang="en", doc_id=3, nt=40),   # starts at 80 -> shard 0 (overflows)
    Row(lang="en", doc_id=4, nt=10),   # starts at 120 -> shard 1
    Row(lang="de", doc_id=5, nt=250),  # own group, shard 0
    Row(lang="de", doc_id=6, nt=1),    # starts at 250 -> shard 2
]
BUDGET = 100


def _assigned(spark):
    df = spark.createDataFrame(ROWS)
    return packing.assign_token_shards(
        df, F.col("nt"), "doc_id", BUDGET, group_cols=("lang",)
    )


def test_start_offset_assignment(spark):
    got = {r.doc_id: r.shard_id for r in _assigned(spark).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 2}


def test_shard_overflow_bounded_by_one_doc(spark):
    # every shard's token total minus its last doc is under budget
    m = packing.shard_manifest(
        spark.createDataFrame(ROWS), F.col("nt"), "doc_id", BUDGET, ("lang",)
    ).collect()
    for r in m:
        last_doc_tokens = {x.doc_id: x.nt for x in ROWS}[r.last_doc]
        assert r.shard_tokens - last_doc_tokens < BUDGET


def test_manifest_partitions_docs_exactly_once(spark):
    m = packing.shard_manifest(
        spark.createDataFrame(ROWS), F.col("nt"), "doc_id", BUDGET, ("lang",)
    )
    assert m.agg(F.sum("n_docs")).collect()[0][0] == len(ROWS)
    assert m.agg(F.sum("shard_tokens")).collect()[0][0] == sum(r.nt for r in ROWS)
