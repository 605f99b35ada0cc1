"""Every registered query must run at the smallest scale factor — the
guard against sf-specific fragility (empty inputs, bounds that assume
bigger fixtures) that the per-query oracle runs at sf0.01 would miss."""

from __future__ import annotations

from pyspark.sql.types import DecimalType

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


def test_no_decimal_in_any_output_schema(spark, sf_smoke):
    """The external driver's hasher normalizes Spark Decimal cells
    differently from DuckDB's — every DECIMAL-typed output column fails
    its hash compare (round-2 verdict: 15/15 hash failures were exactly
    the queries with a DecimalType field). Decimal accumulation is fine
    (and required for order-independent money sums); the OUTPUT schema
    must cast to double. Schema construction only — nothing executes."""
    offenders = []
    for name, q in QUERIES.items():
        schema = q.fn(spark, sf_smoke).schema
        dec = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if dec:
            offenders.append(f"{name}: {dec}")
    assert not offenders, (
        "DecimalType in output schema (cast to double at the query "
        f"boundary, both Spark and oracle SQL): {offenders}"
    )
