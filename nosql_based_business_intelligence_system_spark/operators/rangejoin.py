"""Binned range joins — point-in-interval and banded (|t_l - t_r| <= w)
joins that stay shuffle-bounded at 100 TB.

The reference's dated collections (Project.py:379-395 share customer keys
across time-stamped rows) imply window'd attribution queries ("events
inside this session/billing period"). Spark has no native range join; the
naive formulation is a non-equi (theta) join, which Catalyst executes as
BroadcastNestedLoopJoin or a cartesian product — O(|L| x |R|) per key and
dead at scale.

This module uses the classic *bin* strategy instead (the same trick
Databricks' range-join optimization and KDB's window joins use): quantize
time into fixed-width bins, explode each interval into the bins it
overlaps, and equi-join points to intervals on (key, bin). The exact
predicate is then applied as a cheap post-filter. Each point lands in
exactly ONE bin, so a (point, interval) match is produced exactly once —
no dedup pass. Cost: one shuffle per side on (key, bin) plus an
|interval|/bin_width explosion factor, bounded by ``max_bins_per_interval``
(enforced JVM-side with ``raise_error`` — a silent explosion on a
mis-sized bin is the classic production incident here).

Pick ``bin_width_seconds`` ~ the typical interval length: explosion factor
stays ~2 and every bin-join partition holds only co-binned rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "band_join", "interval_overlap_join"]


def _bin(ts: Column, width: int) -> Column:
    return F.floor(ts.cast("long") / F.lit(int(width)))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | list[str] | None = None,
    bin_width_seconds: int = 3600,
    closed: str = "both",
    suffix: str = "_ivl",
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join each point row to every interval row whose
    ``[start_ts, end_ts]`` contains ``point_ts`` (and whose ``on`` keys
    match, when given). ``closed`` picks the boundary convention:
    ``both`` = ``start <= t <= end``, ``left`` = ``start <= t < end``.

    Interval columns that collide with point columns are renamed with
    ``suffix``. Inner-join semantics only: a point in no interval (or an
    empty interval) produces no row. Outer variants compose on top —
    aggregate the matches and left-join back to the point side (see
    ``session_purchase_attribution`` in queries/temporal_suite.py).

    Intervals longer than ``max_bins_per_interval * bin_width_seconds``
    raise at execution time rather than silently exploding the shuffle.
    """
    if closed not in ("both", "left"):
        raise ValueError(f"closed must be both|left, got {closed!r}")
    keys = [on] if isinstance(on, str) else list(on or [])
    for k in keys:
        if k not in points.columns or k not in intervals.columns:
            raise ValueError(f"join key {k!r} missing from one side")

    taken = set(points.columns)
    ren = {
        c: (c if c not in taken else f"{c}{suffix}")
        for c in intervals.columns
        if c not in keys
    }
    ivl = intervals.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(n) for c, n in ren.items()],
    )
    start, end = F.col(ren[start_ts]), F.col(ren[end_ts])
    n_bins = _bin(end, bin_width_seconds) - _bin(start, bin_width_seconds) + 1
    guarded = F.when(
        n_bins > F.lit(int(max_bins_per_interval)),
        F.raise_error(
            F.concat(
                F.lit(
                    "interval_join: interval spans more than "
                    f"{max_bins_per_interval} bins of {bin_width_seconds}s — "
                    "raise bin_width_seconds or max_bins_per_interval "
                    "(interval was "
                ),
                start.cast("string"),
                F.lit(" .. "),
                end.cast("string"),
                F.lit(")"),
            )
        ).cast("long"),
    ).otherwise(n_bins)
    ivl = ivl.filter(end >= start).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(start, bin_width_seconds),
                _bin(start, bin_width_seconds) + guarded - 1,
            )
        ),
    )
    pts = points.withColumn("__bin", _bin(F.col(point_ts), bin_width_seconds))
    t = F.col(point_ts)
    pred = (t >= start) & ((t <= end) if closed == "both" else (t < end))
    out = pts.join(ivl, on=[*keys, "__bin"], how="inner").filter(pred)
    return out.drop("__bin")


def band_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
    on: str | list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Inner-join rows whose timestamps lie within ``band_seconds`` of
    each other: ``|left_ts - right_ts| <= band_seconds`` (both ends
    inclusive), optionally key-matched on ``on``.

    Implemented as :func:`interval_join` with the left side widened to
    ``[left_ts - band, left_ts + band]`` and the bin width set to the band
    itself, so each left row explodes into at most 3 bins regardless of
    data — the explosion factor is a constant, not data-dependent.
    """
    if band_seconds <= 0:
        raise ValueError("band_seconds must be positive")
    ivl = left.withColumn(
        "__start", F.timestamp_seconds(F.col(left_ts).cast("long") - band_seconds)
    ).withColumn(
        "__end", F.timestamp_seconds(F.col(left_ts).cast("long") + band_seconds)
    )
    out = interval_join(
        right,
        ivl,
        point_ts=right_ts,
        start_ts="__start",
        end_ts="__end",
        on=on,
        bin_width_seconds=band_seconds,
        closed="both",
        suffix=suffix,
        max_bins_per_interval=4,
    )
    drop = [c for c in out.columns if c.startswith("__start") or c.startswith("__end")]
    return out.drop(*drop)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: str | list[str] | None = None,
    bin_width_seconds: int = 3600,
    suffix: str = "_r",
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join interval rows that OVERLAP: ``l.start <= r.end AND
    r.start <= l.end`` (closed bounds), optionally within matching ``on``
    keys — sessions x campaigns, maintenance windows x incidents.

    Same bin strategy as :func:`interval_join`, with the pair-uniqueness
    twist for interval x interval: both sides explode into covered bins,
    but a match is emitted ONLY in the bin containing the overlap's start
    (``greatest(l.start, r.start)``). Every overlapping pair shares that
    instant, and shares it in exactly one bin — so the join produces each
    pair exactly once with no distinct pass. Cost stays one shuffle per
    side on (key, bin); the same ``max_bins_per_interval`` guard raises on
    mis-sized bins instead of silently exploding.

    Rows whose interval is inverted (``end < start``) are dropped on both
    sides — an inverted interval overlaps nothing under the closed-bound
    definition, so the drop is the semantics, not data loss; pre-validate
    upstream if inverted intervals should be an error.
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join key {k!r} missing from one side")
    if right_start in keys or right_end in keys:
        raise ValueError(
            "right_start/right_end cannot also be join keys in `on` — "
            "key-equality on an interval bound degenerates the overlap "
            "test; join on a separate key column instead"
        )
    taken = set(left.columns)
    ren = {
        c: (c if c not in taken else f"{c}{suffix}")
        for c in right.columns
        if c not in keys
    }

    def _explode_bins(df, start, end):
        n_bins = _bin(end, bin_width_seconds) - _bin(start, bin_width_seconds) + 1
        guarded = F.when(
            n_bins > F.lit(int(max_bins_per_interval)),
            F.raise_error(
                F.concat(
                    F.lit(
                        "interval_overlap_join: interval spans more than "
                        f"{max_bins_per_interval} bins of {bin_width_seconds}s"
                        " — raise bin_width_seconds or max_bins_per_interval"
                        " (interval was "
                    ),
                    start.cast("string"),
                    F.lit(" .. "),
                    end.cast("string"),
                    F.lit(")"),
                )
            ).cast("long"),
        ).otherwise(n_bins)
        return df.filter(end >= start).withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    _bin(start, bin_width_seconds),
                    _bin(start, bin_width_seconds) + guarded - 1,
                )
            ),
        )

    l2 = _explode_bins(left, F.col(left_start), F.col(left_end))
    r2 = _explode_bins(
        right.select(
            *[F.col(k) for k in keys],
            *[F.col(c).alias(n) for c, n in ren.items()],
        ),
        F.col(ren[right_start]),
        F.col(ren[right_end]),
    )
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(ren[right_start]), F.col(ren[right_end])
    overlap = (ls <= re_) & (rs <= le)
    canonical = F.col("__bin") == _bin(F.greatest(ls, rs), bin_width_seconds)
    out = l2.join(r2, on=[*keys, "__bin"], how="inner").filter(
        overlap & canonical
    )
    return out.drop("__bin")
