"""pandas->Spark semantics-parity helpers (SURVEY.md §2.10 must-handle list).

Each helper encodes one verified delta between the reference's pandas
semantics (``/root/reference/Project.py``) and Spark defaults. They are thin
Column wrappers — no planner work, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Sentinel strings the reference maps to real NULL on ingest (Project.py:37-38).
NULL_SENTINELS = ("nan", "None", "null")


def clean_string(c: Column) -> Column:
    """SF1+SF2: trim, then sentinel-string -> NULL (Project.py:37-38)."""
    t = F.trim(c)
    return F.when(t.isin(*NULL_SENTINELS) | (t == ""), F.lit(None)).otherwise(t)


def coerce_double(c: Column) -> Column:
    """NF1: pandas ``to_numeric(errors="coerce")`` parity (Project.py:41-49).

    ``try_cast`` yields NULL on unparseable input regardless of ANSI mode.
    """
    return c.try_cast("double")


def coerce_timestamp(c: Column) -> Column:
    """DF1: pandas ``to_datetime(errors="coerce")`` parity (Project.py:53-55)."""
    return F.try_to_timestamp(c)


def sum0(c: Column) -> Column:
    """§2.10(a): pandas sum of an all-NULL column is 0.0, Spark's is NULL."""
    return F.coalesce(F.sum(c), F.lit(0.0))


#: Decimal type used by the order-independent money sums below. Scale 6 keeps
#: micro-cent precision; precision 38 holds ~10^32 — no overflow at any SF.
MONEY_DEC = "decimal(38,6)"


def dsum(c: Column) -> Column:
    """Order-independent money sum: cast each summand to DECIMAL(38,6), then
    SUM. Decimal addition is exact and associative, so the result is identical
    no matter how Spark's partial/final aggregation (or a window frame) orders
    the additions — unlike double sums, which drift in the last ulp vs any
    other engine's accumulation order. Output type: DECIMAL(38,6).

    Use for any SUM over >~10k double rows that an external oracle will hash.
    The DuckDB twin is :func:`dd_dsum`.
    """
    return F.sum(c.cast(MONEY_DEC))


def dsum0(c: Column) -> Column:
    """:func:`dsum` with pandas' all-NULL -> 0 semantics (decimal zero)."""
    return F.coalesce(dsum(c), F.lit(0).cast(MONEY_DEC))


def dec2d(c: Column) -> Column:
    """Engine-portable DECIMAL -> DOUBLE output cast, via STRING.

    A direct decimal->double cast is NOT portable once the scaled integer
    passes 2^53 (values above ~9e9 at scale 6): DuckDB computes
    hugeint / 10^scale in double arithmetic, which double-rounds, while
    Java's BigDecimal.doubleValue() rounds once — observed 1-ulp
    divergence at sf1 (301466167380.900000 -> ...380.9 vs ...380.89996).
    decimal->string is exact on both engines and string->double is
    correctly rounded on both (Double.parseDouble / fast_float), so this
    path yields THE nearest double to the exact decimal, identically.
    Twin: :func:`dd_dec2d`."""
    return c.cast("string").cast("double")


def dsumd(c: Column) -> Column:
    """:func:`dsum` with the exact decimal cast back to DOUBLE at the output
    boundary (via :func:`dec2d` — see its portability note). Accumulation
    stays decimal (order-independent); the boundary cast is then the unique
    correctly-rounded double on both engines. Use this — not bare
    :func:`dsum` — for any column that lands in a query's *output* schema:
    the external driver's hasher normalizes Decimal cells differently
    between Spark and DuckDB (round-2 verdict: all 15 hash failures were
    DECIMAL-typed outputs)."""
    return dec2d(dsum(c))


def dsum0d(c: Column) -> Column:
    """:func:`dsum0` cast back to DOUBLE at the output boundary."""
    return dec2d(dsum0(c))


def dd_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` (verified: identical Decimal repr,
    including round-half-away ties on the double->decimal cast)."""
    return f"SUM(CAST({expr} AS DECIMAL(38,6)))"


def dd_dsum0(expr: str) -> str:
    """DuckDB twin of :func:`dsum0`."""
    return f"coalesce({dd_dsum(expr)}, CAST(0 AS DECIMAL(38,6)))"


def dd_dec2d(expr: str) -> str:
    """DuckDB twin of :func:`dec2d` (decimal -> exact VARCHAR ->
    correctly-rounded DOUBLE; the direct cast double-rounds above 2^53
    scaled units)."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def dd_dsumd(expr: str) -> str:
    """DuckDB twin of :func:`dsumd`."""
    return dd_dec2d(dd_dsum(expr))


def dd_dsum0d(expr: str) -> str:
    """DuckDB twin of :func:`dsum0d`."""
    return dd_dec2d(dd_dsum0(expr))


def flag(pred: Column) -> Column:
    """§2.10(c): pandas ``NaN < 0`` is False; Spark ``NULL < 0`` is NULL.

    Quality flags (Project.py:149-155) must be false, not NULL, on NULL input.
    """
    return F.coalesce(pred, F.lit(False))


def stringify_null_label(c: Column) -> Column:
    """§2.10(d): pandas ``astype(str)`` turns NULL labels into the literal
    string "None", which then participates in groupbys (Project.py:99,124).
    Reproduced only where the oracle compares that quirk."""
    return F.coalesce(c.cast("string"), F.lit("None"))


def event_date(trans_date: Column, deposit_date: Column) -> Column:
    """DF2 generalized: per-row coalesce of the two date sources.

    The reference picks at *column* level (trans_date if the column exists,
    else deposit_date — Project.py:58-64); for schemas carrying both, per-row
    coalesce is the defensible generalization (SURVEY.md §2.10(f))."""
    return F.coalesce(trans_date, deposit_date)
