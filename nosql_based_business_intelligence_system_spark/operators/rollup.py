"""Multi-resolution time rollup — the "continuous aggregate" / hypertable
downsampling pattern (TimescaleDB caggs, Druid/ClickHouse rollup tables),
re-expressed as a Spark plan.

The reference aggregates the same fact table at several calendar grains
(monthly revenue Project.py:183-185, weekly Project.py:189-191); a
time-series store would keep one rollup per grain. The 100 TB-critical
property is that the RAW table is scanned exactly ONCE: only the finest
grain aggregates from raw; every coarser grain re-aggregates the (orders-
of-magnitude smaller) next-finer result. That works because the supported
measures are decomposable (sum-of-sums, min-of-mins, max-of-maxes,
count-as-sum); averages are derived at read time from sum/count.

The finest level is cached before fan-out so Spark does not re-execute the
raw scan per grain (same trap as iterative label propagation — a DAG fork
is not a materialization).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["multires_rollup", "RESOLUTION_ORDER", "MEASURE_KINDS"]

#: Supported grains, finest -> coarsest, as accepted by ``date_trunc``.
RESOLUTION_ORDER = ("minute", "hour", "day", "week", "month", "quarter", "year")

#: measure kind -> (leaf aggregate over raw, re-aggregate over finer level).
#: Shared with the streaming continuous-aggregate sink (streaming/sinks.py).
MEASURE_KINDS = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def multires_rollup(
    df: DataFrame,
    *,
    ts: str,
    measures: Sequence[tuple[str, Column, str]],
    group_by: Sequence[str] = (),
    resolutions: Sequence[str] = ("hour", "day", "month"),
    cache_finest: bool = True,
) -> DataFrame:
    """Aggregate ``df`` at every grain in ``resolutions`` and union the
    levels into one frame with ``(resolution, bucket_start, *group_by,
    *measure names)`` columns.

    ``measures`` is ``(out_name, input column, kind)`` with kind one of
    ``sum | count | min | max`` — the decomposable set. ``resolutions``
    must be ordered finest -> coarsest (checked against
    ``RESOLUTION_ORDER``); raw is scanned only for the first, and each
    later grain aggregates the previous grain's output.
    """
    order = [r for r in resolutions]
    idx = []
    for r in order:
        if r not in RESOLUTION_ORDER:
            raise ValueError(f"unknown resolution {r!r}")
        idx.append(RESOLUTION_ORDER.index(r))
    if idx != sorted(idx) or len(set(idx)) != len(idx):
        raise ValueError(f"resolutions must be finest->coarsest: {order}")
    for _, _, kind in measures:
        if kind not in MEASURE_KINDS:
            raise ValueError(f"unknown measure kind {kind!r}")

    keys = list(group_by)
    finest = df.groupBy(
        F.date_trunc(order[0], F.col(ts)).alias("bucket_start"), *keys
    ).agg(
        *[MEASURE_KINDS[kind][0](col).alias(name) for name, col, kind in measures]
    )
    if cache_finest and len(order) > 1:
        finest = finest.cache()

    levels = [finest.select(F.lit(order[0]).alias("resolution"), "*")]
    prev = finest
    for res in order[1:]:
        cur = prev.groupBy(
            F.date_trunc(res, F.col("bucket_start")).alias("bucket_start"),
            *keys,
        ).agg(
            *[MEASURE_KINDS[kind][1](F.col(name)).alias(name) for name, _, kind in measures]
        )
        levels.append(cur.select(F.lit(res).alias("resolution"), "*"))
        prev = cur

    out = levels[0]
    for lvl in levels[1:]:
        out = out.unionByName(lvl)
    return out
