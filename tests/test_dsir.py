"""DSIR importance-weighting tests: exact parity with an in-process
reference model (log-float scores aren't hash-portable, so the registry
entry is rows-only and THIS is the correctness evidence)."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import dsir

RAW = [
    Row(doc_id=1, text="stock market prices rise on trading volume"),
    Row(doc_id=2, text="the cat sat on the mat with a hat"),
    Row(doc_id=3, text="market trading halts as prices fall sharply"),
    Row(doc_id=4, text="dogs chase cats around the garden all day"),
    Row(doc_id=5, text=""),
]
TARGET = [
    Row(doc_id=100, text="market prices and trading volume analysis"),
    Row(doc_id=101, text="stock market trading strategies for prices"),
]

N_BUCKETS = 1 << 16


def _spark_hash_bucket(spark):
    """Buckets must come from the operator's own expression (the reference
    model reuses them — the test checks the MATH, dsir.hash_bucket owns
    the hash)."""
    def f(grams):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(g,) for g in grams], "g string")
        rows = df.select(
            "g", dsir.hash_bucket(F.col("g"), N_BUCKETS).alias("b")
        ).collect()
        return {r.g: r.b for r in rows}
    return f


def _grams(text, n=2):
    toks = [t for t in text.split(" ") if t != ""]
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def test_importance_weights_match_reference(spark):
    raw_df = spark.createDataFrame(RAW)
    tgt_df = spark.createDataFrame(TARGET)
    got = {
        r.doc_id: r
        for r in dsir.importance_weights(
            raw_df, tgt_df, n=2, n_buckets=N_BUCKETS
        ).collect()
    }

    all_grams = sorted(
        {g for r in RAW + TARGET for g in _grams(r.text)}
    )
    bucket = _spark_hash_bucket(spark)(all_grams)
    t_counts = Counter(bucket[g] for r in TARGET for g in _grams(r.text))
    r_counts = Counter(bucket[g] for r in RAW for g in _grams(r.text))
    nt, nr = sum(t_counts.values()), sum(r_counts.values())

    for r in RAW:
        grams = _grams(r.text)
        want = sum(
            math.log(t_counts.get(bucket[g], 0) + 1.0)
            - math.log(nt + N_BUCKETS)
            - math.log(r_counts.get(bucket[g], 0) + 1.0)
            + math.log(nr + N_BUCKETS)
            for g in grams
        )
        assert got[r.doc_id].n_grams == len(grams)
        assert got[r.doc_id].logw == pytest.approx(want, rel=1e-12)
    assert got[5].logw == 0.0 and got[5].n_grams == 0


def test_resample_prefers_target_domain(spark):
    raw_df = spark.createDataFrame(RAW)
    tgt_df = spark.createDataFrame(TARGET)
    kept = dsir.importance_resample(
        raw_df, tgt_df, fraction=0.4, n=2, n_buckets=N_BUCKETS
    ).collect()
    # 40% of 5 docs = 2 survivors: the two finance docs, not the cat/dog ones
    assert sorted(r.doc_id for r in kept) == [1, 3]


def test_resample_plans_take_ordered(spark):
    from nosql_based_business_intelligence_system_spark.plans import inspect as I

    raw_df = spark.createDataFrame(RAW)
    tgt_df = spark.createDataFrame(TARGET)
    df = dsir.importance_resample(raw_df, tgt_df, fraction=0.4)
    assert I.uses_take_ordered(df)


def test_subset_path_matches_general_path(spark):
    """importance_weights_subset(raw, pred) must equal
    importance_weights(raw, raw.filter(pred)) at FULL precision — same
    gram_term operand order, so even the unrounded doubles agree."""
    from pyspark.sql import functions as F

    docs = [
        Row(doc_id=i, lang=("en" if i % 3 else "fr"),
            text=RAW[i % len(RAW)].text + f" suffix{i % 7} tail{i % 5}")
        for i in range(1, 40)
    ]
    df = spark.createDataFrame(docs)
    pred = F.col("lang") == "en"
    general = {
        r.doc_id: r
        for r in dsir.importance_weights(
            df, df.filter(pred), n=2, n_buckets=N_BUCKETS
        ).collect()
    }
    subset = {
        r.doc_id: r
        for r in dsir.importance_weights_subset(
            df, pred, n=2, n_buckets=N_BUCKETS
        ).collect()
    }
    assert set(general) == set(subset)
    for k in general:
        assert general[k].n_grams == subset[k].n_grams
        assert general[k].logw == subset[k].logw, k  # bit-exact


def test_resample_subset_pred_matches_target_frame(spark):
    from pyspark.sql import functions as F

    docs = [
        Row(doc_id=i, lang=("en" if i % 2 else "de"),
            text=RAW[i % len(RAW)].text)
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(docs)
    pred = F.col("lang") == "en"
    a = sorted(
        r.doc_id
        for r in dsir.importance_resample(
            df, df.filter(pred), fraction=0.3, round_digits=6
        ).collect()
    )
    b = sorted(
        r.doc_id
        for r in dsir.importance_resample(
            df, None, fraction=0.3, round_digits=6, target_pred=pred
        ).collect()
    )
    assert a == b
