"""Every registered query must run at the smallest scale factor — the
guard against sf-specific fragility (empty inputs, bounds that assume
bigger fixtures) that the per-query oracle runs at sf0.01 would miss."""

from __future__ import annotations

from nosql_based_business_intelligence_system_spark.queries.registry import QUERIES


def test_all_queries_run_at_smoke_sf(spark, sf_smoke):
    failures = []
    for name, q in QUERIES.items():
        try:
            n = q.fn(spark, sf_smoke).count()
            assert n >= 0
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures.append(f"{name}: {e}")
    assert not failures, failures
