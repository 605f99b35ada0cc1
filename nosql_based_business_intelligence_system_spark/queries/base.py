"""Shared Query record for the suite modules (avoids circular imports)."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver rows-only check
    #: Output id column for the SAMPLED big-scale twin (tools/verify_local
    #: --sample=N): both engines' outputs are filtered to rows whose
    #: md5(CAST(col AS VARCHAR)) starts with N zero hex chars before
    #: hashing — a deterministic 16^-N fraction. Equality of the sampled
    #: outputs is implied by (and a sound weaker check of) full-output
    #: equality; the point is that for pair/top-k twins the filter pushes
    #: down to one side of the quadratic join in DuckDB, making a
    #: third-decade cross-engine check affordable where the full twin is
    #: not (PLANS.md: the sf10 shingle twins already cost ~18 min).
    #: Only meaningful on columns that are stable ids (never floats).
    sample_col: str | None = None
