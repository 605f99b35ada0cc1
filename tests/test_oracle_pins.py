"""Per-commit cross-engine pins for the round-4 portable-determinism
oracles: each query's Spark output must equal its generated DuckDB twin
bit-for-bit at sf0.001 — the same compare the driver runs at sf0.01, but
inside pytest so a drift in any md5-derived ingredient (planes, centroid
choice, codebook order, fold order) fails the suite immediately instead
of at the next driver round.
"""

from __future__ import annotations

import math

import pytest

from nosql_based_business_intelligence_system_spark.queries import QUERIES

#: The queries whose verification depends on engine-replayable randomness
#: or certified sketch bounds (flipped from rows-only in round 4).
PINNED = (
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_lsh_topk",
    "semantic_dedup_survivors",
    "distinct_count_sketches",
    "hll_mergeable_rollup",
    "order_value_quantile_sketch",
    "kll_mergeable_quantiles",
    "theta_customer_overlap",
    # money-portability campaign representatives: exact decimal
    # accumulation + dec2d string-cast boundary + Spark-replica
    # percentile interpolation (one per hazard class)
    "sales_by_fiscal_month",
    "pricing_summary",
    "monthly_revenue_running",
    "order_value_percentiles",
    "mongo_region_quarter_revenue",
)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return repr(v)
    return v


def _table(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", PINNED)
def test_twin_matches_bit_for_bit(spark, sf_smoke, name):
    import duckdb

    q = QUERIES[name]
    assert q.oracle is not None, f"{name} lost its oracle"
    sdf = q.fn(spark, sf_smoke)
    got = _table([tuple(r) for r in sdf.collect()], sdf.columns)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/{t}.parquet')"
        )
    cur = con.execute(q.oracle)
    cols = [d[0] for d in cur.description]
    want = _table(cur.fetchall(), cols)
    assert sorted(sdf.columns) == sorted(cols)
    assert got == want


SPLIT_SENSITIVE = (
    "embedding_norm_stats",     # decimal-accumulated float means
    "source_quality_report",    # quality-score mean
    "pricing_summary",          # money sums/avgs
    "sales_by_fiscal_month",    # star-join money sums
)


@pytest.mark.parametrize("name", SPLIT_SENSITIVE)
def test_twin_matches_under_hostile_splits(spark, sf_smoke, name):
    """Order-independence under partitioning: with the scan forced to
    many tiny splits (different partial-agg merge structure than the
    single-split default), the hash must still equal the DuckDB twin —
    this is the config-fragility that made 29 money queries green at
    sf<=0.1 'by luck' before the round-4 campaign."""
    import duckdb

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    old_cost = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "64k")
    spark.conf.set("spark.sql.files.openCostInBytes", "0")
    try:
        q = QUERIES[name]
        sdf = q.fn(spark, sf_smoke)
        got = _table([tuple(r) for r in sdf.collect()], sdf.columns)
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        spark.conf.set("spark.sql.files.openCostInBytes", old_cost)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/{t}.parquet')"
        )
    cur = con.execute(q.oracle)
    want = _table(cur.fetchall(), [d[0] for d in cur.description])
    assert got == want


def _load_verify_local():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "verify_local",
        os.path.join(os.path.dirname(__file__), "..", "tools", "verify_local.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sampled_twin_is_exact_subset_and_cross_engine_green(spark, sf_smoke):
    """The sampled big-scale twin (tools/verify_local --sample=N) must be
    SOUND: (a) the Spark-side wrapper selects exactly the md5-prefix
    subset of the full output — no row added, none lost — and (b) the
    sampled outputs still hash identically across engines. Pinned on a
    pair-list query (the shape the mechanism exists for: the id filter
    pushes down one side of the quadratic DuckDB join at sf100)."""
    import hashlib

    import duckdb

    vl = _load_verify_local()
    name = "dedup_ngram_jaccard"
    q = QUERIES[name]
    sq = vl._sampled(q, 1)
    assert sq is not None, f"{name} lost its sample_col"

    full = q.fn(spark, sf_smoke)
    full_rows = _table([tuple(r) for r in full.collect()], full.columns)
    samp = sq.fn(spark, sf_smoke)
    samp_rows = _table([tuple(r) for r in samp.collect()], samp.columns)

    # (a) exact subset: python-side md5 replay over the full output
    idx = sorted(full.columns).index(q.sample_col)
    want = [
        r
        for r in full_rows
        if hashlib.md5(str(r[idx]).encode()).hexdigest().startswith("0")
    ]
    assert samp_rows == want
    assert 0 < len(samp_rows) < len(full_rows)  # non-vacuous, non-total

    # (b) cross-engine: sampled DuckDB twin returns the same table
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_smoke}/{t}.parquet')"
        )
    cur = con.execute(sq.oracle)
    cols = [d[0] for d in cur.description]
    assert sorted(samp.columns) == sorted(cols)
    assert _table(cur.fetchall(), cols) == samp_rows
