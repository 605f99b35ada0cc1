"""Standing gate for the broadcast-subquery / lazy-checkpoint race class.

r11 found the same bug three times (MG sketch partials, LM tokenize, DSIR
count models) and closed each by hand: a LAZY ``localCheckpoint`` whose
first consumers arrive CONCURRENTLY (broadcast exchange / subquery jobs
launch in parallel with the main stages) makes each consumer recompute
the checkpoint's lineage — the corpus stage silently runs 2-3x per
action. r11 verdict item 4: mechanize the sweep.

The mechanization is the plan doctor's ``lazy_rescan`` rule
(plans/doctor.py::_lazy_rescans): an unmaterialized checkpoint RDD
scanned >= 2x in a plan with broadcast/subquery consumers is an error.
The full-registry sweep runs in tools/plan_doctor.py (the gate); this
module proves the rule's SENSITIVITY — a deliberate reintroduction of
the r10 lm racing shape must be flagged — and pins the three r11-fixed
queries clean.

(A runtime duplicate-stage detector via the UI REST API was tried first
and rejected: racing duplicates are not byte-identical stages — the
concurrent consumers carry different aggregates above the shared
lineage — and a block-manager read of a materialized checkpoint is
indistinguishable from a recompute in stage-level metrics.)
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nosql_based_business_intelligence_system_spark.functions import text as T
from nosql_based_business_intelligence_system_spark.operators.lm import token_bigrams
from nosql_based_business_intelligence_system_spark.plans.doctor import diagnose

SF_DIR = "/root/testdata/sf0.001"


def _rules(df):
    return [f["rule"] for f in diagnose(df)]


def test_rule_catches_the_r10_racing_shape(spark):
    """Deliberate reintroduction of the r10 doc_lm_scores shape — lazy
    token-array checkpoint with three consumers, one a broadcast vocab —
    MUST trip ``lazy_rescan`` (proves the registry sweep can fail)."""
    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks_df = df.select(
        "doc_id", T.tokens(F.col("text")).alias("__toks")
    ).localCheckpoint(eager=False)
    toks = F.col("__toks")
    pairs = toks_df.select(
        "doc_id", F.explode_outer(token_bigrams(toks)).alias("bg")
    ).select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
    uni = (
        toks_df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cp"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    big = (
        pairs.filter(F.col("prev").isNotNull())
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    racy = (
        pairs.join(big, ["prev", "cur"], "left")
        .join(uni.withColumnRenamed("w", "prev"), ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(F.count("prev").alias("n"))
    )
    assert "lazy_rescan" in _rules(racy)


def test_eager_checkpoint_not_flagged(spark):
    """The fix shape — same plan, EAGER checkpoint — must pass: the rule
    keys on materialization, not on checkpoint use."""
    df = spark.range(0, 1000, 1, 4).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    ck = df.groupBy("k").agg(F.sum("v").alias("c")).localCheckpoint(eager=True)
    total = ck.agg(F.sum("c").alias("t"))
    out = ck.crossJoin(F.broadcast(total))
    assert "lazy_rescan" not in _rules(out)


@pytest.mark.parametrize(
    "name",
    ["token_heavy_hitters", "doc_lm_perplexity", "dsir_importance_weights"],
)
def test_r11_race_fixes_stay_fixed(spark, name):
    from nosql_based_business_intelligence_system_spark.queries import QUERIES

    df = QUERIES[name].fn(spark, SF_DIR)
    assert "lazy_rescan" not in _rules(df)
