"""Query registry: every implemented operator as a (Spark callable, DuckDB
oracle SQL) pair, per the driver contract in ``__spark_entry__.py``.

Registration discipline:
- every aggregate/computed column is aliased identically in both the Spark
  plan and the oracle SQL (the driver's compare sorts columns by name);
- integer aggregates are pinned to BIGINT on the oracle side (DuckDB SUM of
  integers returns HUGEINT, year() returns BIGINT — both are normalized);
- ordered/top-k queries carry total-order tiebreaks (SURVEY.md §5.2.2);
- non-SQL-expressible ops register ``oracle=None`` -> driver rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    entity_suite,
    mongo_suite,
    multimodal_suite,
    reference_suite,
    setops_suite,
    similarity_suite,
    stats_suite,
    stream_suite,
    temporal_suite,
    text_suite,
    tpch_suite,
    window_suite,
)
from .base import Query  # noqa: F401  (re-exported)


def _collect() -> dict[str, Query]:
    out: dict[str, Query] = {}
    for mod in (
        entity_suite,
        reference_suite,
        tpch_suite,
        window_suite,
        text_suite,
        similarity_suite,
        stream_suite,
        stats_suite,
        temporal_suite,
        setops_suite,
        multimodal_suite,
        mongo_suite,
    ):
        for name, q in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name {name!r}")
            out[name] = q
    return out


QUERIES: dict[str, Query] = _collect()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
