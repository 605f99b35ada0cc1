"""Time-series densify + gap-fill — Mongo ``$densify``/``$fill`` and the
hypertable ``time_bucket_gapfill``/``locf``/``interpolate`` trio, as pure
DataFrame plans.

Aggregated telemetry has holes where no events landed; downstream math
(moving averages, charts, models) wants a complete grid. Two pieces:

- :func:`densify` — scaffold every missing tick between each key's first
  and last observation: per-key min/max + ``sequence``/``explode`` builds
  the grid (rows ~ span/step per key, no cross join), then one left join
  attaches observations.
- :func:`fill_series` — fill NULL measures over an ordered series:
  ``locf`` (last observation carried forward) or ``linear``
  (interpolation between the surrounding observations; leading/trailing
  gaps fall back to the nearest single neighbor). Two window passes
  (forward + backward), no self-join, no UDF.

Interpolation arithmetic is fixed-shape (``prev + (next - prev) * frac``
on exact second deltas), so results are bit-identical across engines —
the DuckDB oracle runs the same formula.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["densify", "fill_series"]


def densify(
    df: DataFrame,
    *,
    ts: str,
    step_seconds: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Expand ``df`` to one row per ``step_seconds`` tick per key, from
    each key's min(ts) to max(ts) inclusive; ticks with no source row
    carry NULL measures. ``ts`` values must sit on the tick grid
    (pre-truncate with ``date_trunc``)."""
    key_cols = list(keys)
    span = df.groupBy(*key_cols).agg(
        F.min(ts).alias("__mn"), F.max(ts).alias("__mx")
    )
    grid = span.select(
        *key_cols,
        F.explode(
            F.sequence(
                F.col("__mn"),
                F.col("__mx"),
                F.expr(f"interval {int(step_seconds)} seconds"),
            )
        ).alias(ts),
    )
    return grid.join(df, on=[*key_cols, ts], how="left")


def fill_series(
    df: DataFrame,
    *,
    ts: str,
    values: Sequence[str],
    keys: Sequence[str] = (),
    method: str = "locf",
) -> DataFrame:
    """Fill NULLs in ``values`` along each key's ``ts``-ordered series.

    ``locf``: last non-NULL observation carried forward (leading NULLs
    stay NULL). ``linear``: straight-line interpolation between the
    previous and next observations; one-sided gaps take the nearest
    neighbor. Output replaces the value columns in place.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf|linear, got {method!r}")
    key_cols = list(keys)
    back = (
        Window.partitionBy(*key_cols)
        .orderBy(ts)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy(*key_cols)
        .orderBy(ts)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for v in values:
        c = F.col(v)
        if method == "locf":
            out = out.withColumn(v, F.last(c, ignorenulls=True).over(back))
            continue
        obs_ts = F.when(c.isNotNull(), F.col(ts))
        pv = F.last(c, ignorenulls=True).over(back)
        pt = F.last(obs_ts, ignorenulls=True).over(back)
        nv = F.first(c, ignorenulls=True).over(fwd)
        nt = F.first(obs_ts, ignorenulls=True).over(fwd)
        frac = (F.col(ts).cast("long") - pt.cast("long")) / (
            nt.cast("long") - pt.cast("long")
        )
        interp = (
            F.when(c.isNotNull(), c)
            .when(pv.isNull(), nv)  # leading gap: nearest neighbor
            .when(nv.isNull(), pv)  # trailing gap: nearest neighbor
            .otherwise(pv + (nv - pv) * frac)
        )
        out = out.withColumn(v, interp)
    return out
