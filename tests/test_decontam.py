"""Planted-overlap tests for benchmark decontamination and the Gopher
quality filter (north-star training-data pipeline ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nosql_based_business_intelligence_system_spark.operators import decontam

# A 13-token benchmark passage, copied verbatim into train doc 1; doc 2
# shares only a shorter run; doc 3 is disjoint.
_EVAL_TEXT = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu"

TRAIN = [
    Row(doc_id=1, text="intro words then " + _EVAL_TEXT + " trailing words"),
    Row(doc_id=2, text="alpha beta gamma delta epsilon unrelated tail words here now"
                       " padding to reach thirteen tokens easily right"),
    Row(doc_id=3, text="completely disjoint vocabulary about spark engines and"
                       " distributed query processing with many more words added"),
]
EVAL = [Row(doc_id=100, text=_EVAL_TEXT)]


def test_contamination_flags_exact_copy_only(spark):
    hits = decontam.ngram_contamination(
        spark.createDataFrame(TRAIN), spark.createDataFrame(EVAL), n=13
    ).collect()
    assert [r.doc_id for r in hits] == [1]
    assert hits[0].n_shared_ngrams == 1  # the eval doc has exactly one 13-gram
    assert hits[0].n_eval_docs == 1


def test_decontaminate_removes_flagged_docs(spark):
    kept = decontam.decontaminate(
        spark.createDataFrame(TRAIN), spark.createDataFrame(EVAL), n=13
    )
    assert sorted(r.doc_id for r in kept.collect()) == [2, 3]


def test_shorter_n_catches_partial_overlap(spark):
    hits = decontam.ngram_contamination(
        spark.createDataFrame(TRAIN), spark.createDataFrame(EVAL), n=5
    )
    assert sorted(r.doc_id for r in hits.collect()) == [1, 2]


def test_contamination_plan_is_join_not_python(spark):
    plan = decontam.ngram_contamination(
        spark.createDataFrame(TRAIN), spark.createDataFrame(EVAL), n=13
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_quality_filter_rules_fire_on_fixture(spark, sf_correctness):
    from nosql_based_business_intelligence_system_spark.queries.text_suite import (
        gopher_filter_summary,
    )

    r = gopher_filter_summary(spark, sf_correctness).collect()[0]
    # Every doc accounted for, and the corpus-calibrated rules actually fire.
    assert r.n_docs == 500
    assert 0 < r.n_keep < r.n_docs
    assert r.n_fail_token_count > 0
    assert r.n_fail_stopwords > 0


def test_dup_ratio_matches_python_reference(spark):
    """Hypothesis: hashed-shingle repetition ratio equals the exact
    string-shingle reference for arbitrary token streams (short docs,
    all-identical tokens, unicode)."""
    import pyspark.sql.functions as F
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from nosql_based_business_intelligence_system_spark.functions import text as T

    words = st.sampled_from(["a", "bb", "ccc", "δδ", "e"])

    @settings(max_examples=12, deadline=None)
    @given(docs=st.lists(st.lists(words, max_size=12), min_size=1, max_size=6))
    def check(docs):
        def ref(toks, n=3):
            sh = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            return 1.0 - len(set(sh)) / len(sh) if sh else 0.0

        df = spark.createDataFrame(
            [(i, " ".join(d)) for i, d in enumerate(docs)], ["doc_id", "text"]
        )
        got = {
            r.doc_id: r.ratio
            for r in df.select(
                "doc_id",
                T.dup_ngram_ratio(T.tokens(F.col("text")), 3).alias("ratio"),
            ).collect()
        }
        for i, d in enumerate(docs):
            assert got[i] == pytest.approx(ref([w for w in d if w])), (i, d)

    check()
