"""Misra-Gries heavy hitters — the frequency member of the mergeable-sketch
trio (distinct count = HLL/theta, quantiles = KLL, frequent items = here).

At 100 TB an exact "top tokens" groupBy shuffles one row per DISTINCT item;
when the item domain itself is huge (URLs, n-grams, user agents), even the
post-combine map side is too wide. Misra-Gries summarizes each partition
into at most ``k`` counters with the classic guarantee

    true_count - n / (k + 1)  <=  estimate  <=  true_count,

and summaries MERGE by summing counters per item, then subtracting the
(k+1)-th largest combined value (Agarwal et al. 2012, "Mergeable
summaries" — the merged sketch keeps the same bound for the combined
stream). Every item with true frequency > n/(k+1) is guaranteed to
survive; counts are never overestimated.

Spark shape: one ``mapInArrow`` pass builds per-partition summaries
(narrow, no shuffle; pyarrow C++ value_counts per batch, one grouped
reduce per partition, state capped near k entries), then ONE
grouped sum over at most ``n_partitions * k`` sketch rows plus a k+1-row
correction aggregate. The shuffle carries the sketch, not the domain.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_summary(items: Iterable[str], k: int) -> dict[str, int]:
    """Classic Misra-Gries over an item stream: at most ``k`` counters; on
    overflow decrement every counter (dropping zeros) — each decrement
    round discards k+1 occurrences of k+1 DISTINCT items, which is what
    bounds the undercount by n/(k+1)."""
    return mg_fold({}, items, k)


def mg_fold(
    counters: dict[str, int], items: Iterable[str], k: int
) -> dict[str, int]:
    """Fold more items into an existing Misra-Gries summary (mutates and
    returns ``counters``) — the streaming-state building block: a sketch
    resumed from state and fed the next micro-batch keeps the same
    n/(k+1) bound over the TOTAL stream seen so far."""
    for it in items:
        if it in counters:
            counters[it] += 1
        elif len(counters) < k:
            counters[it] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


#: Per-partition memory bound for the Arrow partials: whenever the
#: accumulated value_counts chunks pass this many distinct items, they are
#: merged and capped to k early (a valid MG merge), so a partition's
#: in-flight state never exceeds ~this many (item, count) Arrow cells no
#: matter how wide the domain is.
_PARTIAL_CAP_ROWS = 2_000_000


def _mg_partials(k: int, split_on: str | None = None):
    """Build the per-partition Arrow partials function. ``split_on`` is the
    doc-level fast path: the input column is raw TEXT and tokenization
    (split on the literal separator, drop empties — bit-for-bit the
    semantics of ``functions.text.tokens``) happens INSIDE pyarrow C++.
    That moves the JVM->Python Arrow boundary from one string cell per
    TOKEN to one cell per DOCUMENT: measured at sf100 (270M tokens, 5M
    docs) the exploded-token transfer costs 10-44s per pass (the upper
    end under a JVM Arrow-writer regression the boundary volume
    triggers non-deterministically) vs 2.1s for the doc-level transfer —
    and at 100 TB the boundary IS the sketch's cost, so it must scale
    with corpus bytes, not token count."""

    def partials(batches) -> "Iterator":
        # ARROW-NATIVE partials (r9): the r8 pandas path still built one
        # Python string object per token at the Arrow->pandas boundary
        # and merged per-batch counts through a Python dict — measured
        # ~62s for the 270M-token sf100 sketch pass, where the identical
        # logic in pyarrow C++ (value_counts per batch, one grouped
        # reduce per partition) runs in ~40s, i.e. at the Arrow-transfer
        # floor. Correctness is the same mergeable-summaries argument as
        # before, one level up: each batch's value_counts is an ERROR-0
        # summary; summing chunks and subtracting the (k+1)-th largest
        # (_reduce_cap) is the Agarwal merge, and applying it
        # periodically (whenever the accumulated distinct items pass the
        # memory bound) is a sequence of such merges, which keeps the
        # global n/(k+1) bound. Estimates may differ from the per-batch
        # fold (both are valid MG summaries); the guarantee — every item
        # with true frequency > n/(k+1) survives, never overestimated —
        # does not, and the bound tests assert it under both shapes.
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def _reduce_cap(parts: list, cap: int):
            vals = pa.chunked_array([p.field("values") for p in parts])
            cnts = pa.chunked_array([p.field("counts") for p in parts])
            t = (
                pa.table({"item": vals, "c": cnts})
                .group_by("item")
                .aggregate([("c", "sum")])
            )
            c = t.column("c_sum").to_numpy(zero_copy_only=False)
            if len(c) > cap:
                kth = np.partition(c, -(cap + 1))[-(cap + 1)]
                keep = c > kth
                t = t.filter(pa.array(keep))
                c = c[keep] - kth
            return pa.StructArray.from_arrays(
                [
                    t.column("item").combine_chunks().cast(pa.string()),
                    pa.array(c, type=pa.int64()),
                ],
                names=["values", "counts"],
            )

        n = 0
        chunks: list = []
        acc_rows = 0
        for b in batches:
            col = b.column(0).drop_null()
            if split_on is not None:
                # doc-level transfer: tokenize in C++ — split on the
                # literal separator, flatten, drop empty tokens (exact
                # parity with F.split + filter(t != ""), incl. NULL text
                # yielding no rows and runs of separators collapsing)
                col = pc.list_flatten(pc.split_pattern(col, split_on))
                col = col.filter(pc.not_equal(col, ""))
            n += len(col)
            vc = pc.value_counts(col)
            chunks.append(vc)
            acc_rows += len(vc)
            if acc_rows > _PARTIAL_CAP_ROWS:
                chunks = [_reduce_cap(chunks, k)]
                acc_rows = len(chunks[0])
        counters = _reduce_cap(chunks, k) if chunks else None
        items = (
            counters.field("values").to_pylist() if counters is not None else []
        )
        counts = (
            counters.field("counts").to_pylist() if counters is not None else []
        )
        # one reserved row carries the partition's item count (the bound
        # needs the GLOBAL n; \x00 can't collide with real tokens)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(items + ["\x00__n__"], type=pa.string()),
                pa.array(counts + [n], type=pa.int64()),
            ],
            names=["item", "c"],
        )

    return partials


def _mg_combine(rows: DataFrame, k: int) -> DataFrame:
    """Merge the per-partition summaries into the certified sketch frame."""
    from pyspark.sql import Window

    # ONE consumer, ONE linear plan (r11). The r9 shape derived the merge
    # correction and the stream total as two broadcast-subquery crossJoins
    # over a lazily checkpointed `rows` — but Spark executes broadcast
    # subqueries CONCURRENTLY, and two of them racing an unmaterialized
    # lazy localCheckpoint each recompute the partials map stage (measured
    # r11: two simultaneous 32-task partials stages per collect at every
    # sf; ~+20s per pass at sf100 — the r10 "Gap A" on
    # token_heavy_hitters). Deriving both scalars from global windows over
    # the combined sketch keeps everything in a single plan with a single
    # consumer of `rows`, so the expensive stage cannot execute twice and
    # the checkpoint (plus its free_blocks lifecycle) is unnecessary. The
    # global windows run on the SKETCH frame — <= n_partitions * (k+1)
    # rows before the combine, fewer after — never the item domain, so
    # single-partition execution is bounded by construction.
    summed = rows.groupBy("item").agg(F.sum("c").alias("c"))
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(F.col("c").desc(), F.col("item"))
    with_total = summed.withColumn(
        "n_total",
        F.sum(F.when(F.col("item") == "\x00__n__", F.col("c"))).over(w_all),
    )
    ranked = with_total.filter(F.col("item") != "\x00__n__").withColumn(
        "__rn", F.row_number().over(w_rank)
    )
    # merge correction: subtract the (k+1)-th largest combined counter
    # (zero when at most k items survived the partials — no rank k+1 row)
    corrected = ranked.withColumn(
        "sub",
        F.coalesce(
            F.max(
                F.when(F.col("__rn") == k + 1, F.col("c"))
            ).over(Window.partitionBy()),
            F.lit(0),
        ),
    )
    return corrected.filter(F.col("c") > F.col("sub")).select(
        "item",
        (F.col("c") - F.col("sub")).alias("est_count"),
        F.floor(F.col("n_total") / (k + 1)).alias("err_bound"),
        "n_total",
    )


def mg_heavy_hitters(df: DataFrame, item_col: str, k: int = 64) -> DataFrame:
    """(item, est_count, err_bound, n_total) — every item with true
    frequency > ``n_total/(k+1)`` is present; its true count lies in
    ``[est_count, est_count + err_bound]``.

    ``err_bound = floor(n_total/(k+1))`` is the sketch's certificate: a
    consumer decides from it whether the summary is precise enough or a
    targeted exact count (a filtered groupBy on the few surviving items)
    is worth a second pass.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .partitioning import spread

    rows = spread(df.select(F.col(item_col).alias("__item"))).mapInArrow(
        _mg_partials(k), "item string, c long"
    )
    return _mg_combine(rows, k)


def mg_heavy_hitters_text(
    df: DataFrame, text_col: str, k: int = 64, split_on: str = " "
) -> DataFrame:
    """:func:`mg_heavy_hitters` over the TOKENS of a raw text column,
    tokenizing inside the Arrow partials (pyarrow ``split_pattern`` +
    drop-empties — exact parity with ``functions.text.tokens``, which the
    consumer's exact pass keeps using JVM-side).

    Same output contract and MG guarantee as the generic operator; the
    difference is purely physical — the Arrow boundary carries one cell
    per DOCUMENT instead of one per exploded token (see ``_mg_partials``),
    which at sf100 turns a 10-44s transfer into ~2s and removes the
    explode + repartition of the full token stream. The certified-output
    equivalence with the exploded path is pytest-pinned.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from .partitioning import spread

    rows = spread(df.select(F.col(text_col).alias("__text"))).mapInArrow(
        _mg_partials(k, split_on=split_on), "item string, c long"
    )
    return _mg_combine(rows, k)
