"""As-of (temporal) join — an operator the reference implies but Spark
lacks natively (the reference's payments/receivables collections share
customer keys across time-stamped rows, Project.py:379-395; any
"balance as of payment date" query over them is an as-of join).

Implemented as a composition of existing DataFrame ops (SURVEY.md custom-
operator rule (a)): union the two sides, one window pass per key carrying
the last-seen right row forward. Exactly ONE shuffle (by key) regardless of
either side's size — never the naive range cross-join, which explodes as
|left_per_key| x |right_per_key| and dies at 100 TB. Equivalent to DuckDB's
``ASOF JOIN`` (backward direction, inclusive), which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    suffix: str = "_matched",
    tolerance_seconds: int | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` (backward, inclusive — DuckDB ASOF semantics),
    the least ``right_ts >= left_ts`` (forward), or whichever of the two is
    closer (nearest; equidistant resolves backward, pandas ``merge_asof``
    parity) within the same ``on`` key. Left-outer: unmatched left rows
    keep NULL right columns.
    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)`` parity)
    voids matches further than the bound — the row survives with NULLs,
    it is not dropped. ``allow_exact_matches=False`` (same-named pandas
    parameter) makes the bound strict: an equal-timestamp right row never
    matches — in this formulation purely a flip of the equal-ts sort
    tiebreak, the frame never changes.

    Right rows must be unique per (key, ts) for deterministic output —
    pre-aggregate the right side (e.g. ``max_by``) if they are not.

    Plan shape: tag both sides, union, single window over (key, ts) with
    the right row carried forward via ``last(ignorenulls)``. Sort puts
    right rows before left rows at equal ts, making the match inclusive.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if direction == "nearest" and right_ts in keys:
        raise ValueError("nearest needs the right ts carried in the match")

    rvals = [c for c in right.columns if c not in keys]
    lstruct = F.struct(*[F.col(c) for c in left.columns]).alias("__l")
    rstruct = F.struct(*[F.col(c) for c in rvals]).alias("__r")
    ltype = left.select(lstruct).schema["__l"].dataType
    rtype = right.select(rstruct).schema["__r"].dataType

    l2 = left.select(
        F.struct(*[F.col(k) for k in keys]).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        lstruct,
        F.lit(None).cast(rtype).alias("__r"),
    )
    r2 = right.select(
        F.struct(*[F.col(k) for k in keys]).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(ltype).alias("__l"),
        rstruct,
    )
    u = l2.unionByName(r2)
    # an equal-ts right row matches iff it sorts on the frame side of the
    # left row: rights-first when inclusive, rights-last when strict
    il = F.col("__is_left")
    into_frame = il.asc() if allow_exact_matches else il.desc()
    out_of_frame = il.desc() if allow_exact_matches else il.asc()
    if direction == "nearest":
        # both directions from ONE exchange: the two windows hash-partition
        # identically (two sorts, no second shuffle). Equal-ts right rows
        # sort before the left row in the backward order and after it in
        # the forward order (inclusive), or the reverse (strict).
        w_b = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), into_frame)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_f = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), out_of_frame)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        lts = F.col("__ts").cast("long")
        mb, mf = F.col("__mb"), F.col("__mf")
        d_b = lts - mb.getField(right_ts).cast("long")
        d_f = mf.getField(right_ts).cast("long") - lts
        matched = (
            u.withColumn("__mb", F.last("__r", ignorenulls=True).over(w_b))
            .withColumn("__mf", F.first("__r", ignorenulls=True).over(w_f))
            .filter(F.col("__is_left") == 1)
            # pandas merge_asof parity: equidistant candidates resolve
            # BACKWARD (the prior row wins)
            .withColumn(
                "__m",
                F.when(mb.isNotNull() & (mf.isNull() | (d_b <= d_f)), mb)
                .otherwise(mf),
            )
            .drop("__mb", "__mf")
        )
    else:
        ts_order = (
            F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
        )
        w = (
            Window.partitionBy("__k")
            .orderBy(ts_order, into_frame)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = u.withColumn(
            "__m", F.last("__r", ignorenulls=True).over(w)
        ).filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        if right_ts in keys:
            raise ValueError("tolerance needs the right ts carried in the match")
        mts = F.col("__m").getField(right_ts).cast("long")
        lts = F.col("__ts").cast("long")
        delta = {
            "backward": lts - mts,
            "forward": mts - lts,
            "nearest": F.abs(lts - mts),
        }[direction]
        matched = matched.withColumn(
            "__m", F.when(delta <= F.lit(int(tolerance_seconds)), F.col("__m"))
        )
    taken = set(left.columns)
    out_cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    for c in rvals:
        name = c if c not in taken else f"{c}{suffix}"
        out_cols.append(F.col(f"__m.{c}").alias(name))
    return matched.select(*out_cols)
