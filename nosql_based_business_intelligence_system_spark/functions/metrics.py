"""Derived sales metrics + data-quality flags (SURVEY.md §2.4 NF2-NF7, §2.3 F3).

Reference semantics (``/root/reference/Project.py:128-155``):

- ``asp`` = total_line_price / quantity where quantity (NaN->0) != 0, else NULL
- ``cogs`` = last_cost * quantity
- ``gross_margin`` = total_line_price - cogs
- ``gm_pct`` = gross_margin / total_line_price where |price| > 1e-9, else NULL
- three boolean quality flags, false (not NULL) on NULL input
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .cleaning import flag

GM_EPS = 1e-9


def asp(price: Column, qty: Column) -> Column:
    """Average selling price, guarded like Project.py:133-135 (qty NaN->0 != 0)."""
    return F.when(F.coalesce(qty, F.lit(0.0)) != 0, price / qty)


def cogs(last_cost: Column, qty: Column) -> Column:
    return last_cost * qty


def gross_margin(price: Column, cogs_col: Column) -> Column:
    return price - cogs_col


def gm_pct(gm: Column, price: Column) -> Column:
    """Margin ratio with the reference's epsilon guard (Project.py:142-144)."""
    return F.when(F.abs(price) > F.lit(GM_EPS), gm / price)


def quality_flags(price: Column, qty: Column) -> dict[str, Column]:
    """Project.py:149-155, NULL-safe per §2.10(c)."""
    return {
        "flag_negative_qty": flag(qty < 0),
        "flag_negative_price": flag(price < 0),
        "flag_zero_price_nonzero_qty": flag(
            (F.coalesce(price, F.lit(0.0)) == 0) & (F.coalesce(qty, F.lit(0.0)) != 0)
        ),
    }


def with_sales_metrics(
    df: DataFrame,
    price: str = "total_line_price",
    qty: str = "quantity",
    last_cost: str = "last_cost",
    with_cost: bool = True,
) -> DataFrame:
    """Add asp/cogs/gross_margin/gm_pct + quality flags in one projection.

    ``with_cost=False`` adds only the cost-free metrics (asp + flags) —
    for star slices that eliminated the part join and so carry no
    ``last_cost`` column.
    """
    p, q = F.col(price), F.col(qty)
    out = df.withColumn("asp", asp(p, q))
    if with_cost:
        lc = F.col(last_cost)
        c = cogs(lc, q)
        gm = gross_margin(p, c)
        out = out.withColumns(
            {"cogs": c, "gross_margin": gm, "gm_pct": gm_pct(gm, p)}
        )
    return out.withColumns(quality_flags(p, q))


# DuckDB twins (oracle SQL fragments over the same column names) -------------

DD_METRICS_SELECT = (
    "CASE WHEN coalesce(quantity, 0) <> 0 THEN total_line_price / quantity END AS asp, "
    "last_cost * quantity AS cogs, "
    "total_line_price - last_cost * quantity AS gross_margin, "
    "CASE WHEN abs(total_line_price) > 1e-9 "
    "THEN (total_line_price - last_cost * quantity) / total_line_price END AS gm_pct"
)

DD_FLAGS_SELECT = (
    "coalesce(quantity < 0, false) AS flag_negative_qty, "
    "coalesce(total_line_price < 0, false) AS flag_negative_price, "
    "(coalesce(total_line_price, 0) = 0 AND coalesce(quantity, 0) <> 0) "
    "AS flag_zero_price_nonzero_qty"
)
