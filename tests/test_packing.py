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


def test_write_shards_hive_layout_and_pruning(spark, tmp_path):
    import os

    out = str(tmp_path / "shards")
    packing.write_shards(
        spark.createDataFrame(ROWS), F.col("nt"), "doc_id", BUDGET, out, ("lang",)
    )
    # hive layout: lang=en/shard_id=0 ... exists
    assert os.path.isdir(f"{out}/lang=en/shard_id=0")
    assert os.path.isdir(f"{out}/lang=de/shard_id=2")
    back = spark.read.parquet(out)
    assert back.count() == len(ROWS)
    # a one-shard read prunes to that partition's rows only
    one = back.filter((F.col("lang") == "en") & (F.col("shard_id") == 0))
    assert {r.doc_id for r in one.collect()} == {1, 2, 3}


def test_packing_properties_vs_reference(spark):
    """Hypothesis: shard assignment equals a sequential Python reference
    for arbitrary token sizes and budgets (edge cases: empty group, one
    doc, budget smaller than every doc)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        sizes=st.lists(st.integers(min_value=0, max_value=500), max_size=12),
        budget=st.integers(min_value=1, max_value=400),
    )
    def check(sizes, budget):
        rows = [Row(lang="x", doc_id=i, nt=s) for i, s in enumerate(sizes)]
        expected = {}
        cum = 0
        for i, s in enumerate(sizes):
            expected[i] = cum // budget
            cum += s
        if not rows:
            return
        got = {
            r.doc_id: r.shard_id
            for r in packing.assign_token_shards(
                spark.createDataFrame(rows), F.col("nt"), "doc_id", budget, ("lang",)
            ).collect()
        }
        assert got == expected

    check()
