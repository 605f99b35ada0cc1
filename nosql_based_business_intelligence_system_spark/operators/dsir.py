"""DSIR-style importance weighting for data selection.

"Data Selection for Language Models via Importance Resampling" (Xie et
al., 2023): score every raw document by the log-likelihood ratio of a
TARGET distribution vs the RAW distribution, both modeled as bag-of-
hashed-n-grams unigram models; resample raw docs proportionally to the
ratio to shift the corpus toward the target domain.

Spark shape (everything is counts + joins; the corpus is scanned once per
count table — or once for BOTH models via
:func:`importance_weights_subset` when the target is a predicate over the
raw corpus, the shape every in-corpus selection query uses):

1. hash every token n-gram into ``n_buckets`` via an md5-derived bucket
   (:func:`hash_bucket` — stable across partitionings AND across engines,
   so the whole model has a DuckDB twin; xxhash64 is marginally cheaper
   per gram but not portable, and bucketing is not the dominant cost);
2. two grouped counts -> (bucket, c_target), (bucket, c_raw) — these are
   the "models", n_buckets rows each, broadcastable;
3. per doc: explode its hashed n-grams, join the two count tables on the
   bucket key, sum ``log(p_target(b)) - log(p_raw(b))`` with add-one
   smoothing — one groupBy per doc id.

Scores run through ``ln`` (libm differs across engines at the last ulp),
so oracle-compared outputs round ``logw`` identically on both sides
(``round_digits``, same discipline as the LM-perplexity suite); exact
model parity against a pure-Python reference is additionally
pytest-proven at full precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

#: Broadcast the (bucket, counts) model tables in the scoring join when
#: ``n_buckets`` guarantees they fit: the tables are PARAMETER-bounded
#: (<= n_buckets rows regardless of corpus size), and without the explicit
#: hint the planner sees only the checkpoint's ORIGIN estimates — which
#: scale with the corpus and silently flip the join to sort-merge at some
#: sf (measured sf100: 2GB of exploded-gram shuffle + a 648MB re-shuffle
#: for the per-doc agg, while the model's actual blocks were 7.2MB; the
#: broadcast shape keeps scoring in ONE fused map stage with the per-doc
#: partial agg collapsing in place). ~32B/row -> 1<<24 buckets is ~0.5GB,
#: the same budget class as lm.BROADCAST_MODEL_MAX_BYTES; callers raising
#: n_buckets past it fall back to the planner's shuffle join.
BROADCAST_MODEL_MAX_BUCKETS = 1 << 24


def hash_bucket(g: Column, n_buckets: int) -> Column:
    """Engine-portable n-gram bucket: the first 15 hex chars of md5 (60
    bits, bigint-safe) mod ``n_buckets``. Identical in DuckDB as
    :func:`dd_hash_bucket` — verified byte-for-byte including unicode and
    empty strings."""
    return F.pmod(
        F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )


def dd_hash_bucket(g: str, n_buckets: int) -> str:
    """DuckDB twin of :func:`hash_bucket`."""
    return f"((('0x' || substr(md5({g}), 1, 15))::BIGINT) % {n_buckets})"


def _hashed_ngrams_of(toks: Column, n: int, n_buckets: int) -> Column:
    """All (overlapping) word n-grams over a PROJECTED token-array column,
    hashed to [0, n_buckets) — duplicates kept (counts are what the model
    needs).

    ``toks`` must be a materialized column, not a ``T.tokens(...)``
    expression: the shingle transform's lambda slices the array per
    element, subexpression elimination does not reach into HOF lambdas,
    and an inlined tokenizer re-runs per reference (the r12 lm.py
    finding — its inlined count map measured 6x the projected one)."""
    grams = T.word_shingles_all(toks, n) if n > 1 else toks
    return F.transform(grams, lambda g: hash_bucket(g, n_buckets))


def ngram_count_model(
    df: DataFrame,
    content_col: str = "text",
    n: int = 2,
    n_buckets: int = 1 << 16,
) -> DataFrame:
    """(bucket, c) hashed-n-gram counts — the bag-of-ngrams "model"."""
    return (
        df.select(T.tokens(F.col(content_col)).alias("__toks"))
        .select(
            F.explode(
                _hashed_ngrams_of(F.col("__toks"), n, n_buckets)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_weights_subset(
    raw: DataFrame,
    target_pred: Column,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 1 << 16,
    round_digits: int | None = None,
) -> DataFrame:
    """:func:`importance_weights` for the common case where the target
    domain is a PREDICATE over the raw corpus (e.g. ``lang == 'en'``) —
    the shape every in-corpus DSIR selection uses.

    Identical output to ``importance_weights(raw, raw.filter(pred))``,
    with two corpus passes instead of three: ONE hash pass builds BOTH
    count models (explode (bucket, is_target), one grouped count with a
    conditional sum — target grams are a flag, not a second scan), and
    the scoring pass consumes a single precomputed per-bucket term table
    (``log(ct+1) - log(cr+1)``, n_buckets rows, one broadcast join
    instead of two). The n_buckets-bounded combined model takes the
    EAGER barrier (r11/r12 race-class discipline: the grand-total
    collect and the model broadcast replay checkpoint blocks, never the
    corpus; the corpus-scaled scoring lineage has exactly one consumer).
    sf100 (265M bigrams, 5M docs): 465.8s/pass -> see PLANS.md r12.

    NOTE: the eager checkpoint + grand-total collect mean CONSTRUCTING
    this DataFrame runs Spark jobs (the model-build corpus pass); the
    function is not lazy — same contract as lm.doc_lm_scores.
    """
    from .partitioning import spread

    raw = spread(raw, id_col)
    toked = raw.select(
        F.col(id_col),
        target_pred.cast("int").alias("__is_t"),
        T.tokens(F.col(content_col)).alias("__toks"),
    )
    grams = _hashed_ngrams_of(F.col("__toks"), n, n_buckets)
    model = (
        toked.select(F.explode(grams).alias("bucket"), "__is_t")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.coalesce(F.sum("__is_t"), F.lit(0)).alias("ct"),
        )
        .localCheckpoint(eager=True)
    )
    # Grand totals as LITERALS, not 1-row broadcast subqueries: the model
    # is already materialized (eager checkpoint above), so this collect is
    # a bounded 1-row agg over checkpoint blocks — and folding nt/nr into
    # the plan removes two BroadcastNestedLoopJoins + their per-execution
    # broadcast-build jobs from the scoring pass (same change as
    # lm.doc_lm_scores' vocabulary literal, r12). agg() always returns
    # exactly one row (NULL sums on an empty model), matching the old
    # 1-row crossJoin semantics bit-for-bit.
    nt_v, nr_v = model.agg(F.sum("ct"), F.sum("cr")).collect()[0]
    nt_c = F.lit(nt_v) if nt_v is not None else F.lit(None).cast("bigint")
    nr_c = F.lit(nr_v) if nr_v is not None else F.lit(None).cast("bigint")
    probe = (
        F.broadcast(model) if n_buckets <= BROADCAST_MODEL_MAX_BUCKETS else model
    )
    per_gram = toked.select(
        F.col(id_col), F.explode_outer(grams).alias("bucket")
    ).join(probe, "bucket", "left")
    # BIT-IDENTICAL to the general path's gram_term: same operand order
    # and association (FP addition is not associative; the pinned oracle
    # hashes round logw AFTER summing ~50 gram terms, so even a last-ulp
    # reassociation could flip a rounded 6th decimal).
    gram_term = (
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
        - F.log(nt_c + float(n_buckets))
        - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1.0)
        + F.log(nr_c + float(n_buckets))
    )
    out = per_gram.groupBy(id_col).agg(
        F.count(F.col("bucket")).alias("n_grams"),
        F.coalesce(
            F.sum(F.when(F.col("bucket").isNotNull(), gram_term)),
            F.lit(0.0),
        ).alias("logw"),
    )
    if round_digits is not None:
        out = out.withColumn("logw", F.round("logw", round_digits))
    return out


def importance_weights(
    raw: DataFrame,
    target: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 1 << 16,
    round_digits: int | None = None,
) -> DataFrame:
    """Per-doc DSIR log importance weight: (id, n_grams, logw).
    ``round_digits`` rounds logw (oracle comparisons round identically on
    both engines; default None keeps full precision).

    ``logw = sum over doc n-grams of [log p_t(b) - log p_r(b)]`` with
    add-one smoothing over the bucket vocabulary; docs with no n-grams get
    logw = 0.0 (neutral). Higher = more target-like.

    The two count tables are at most ``n_buckets`` rows — broadcast by
    contract while ``n_buckets <= BROADCAST_MODEL_MAX_BUCKETS`` (the
    planner's own estimate for a checkpoint is corpus-scaled and flips to
    sort-merge at scale; see the constant's docstring); raising n_buckets
    past the budget falls back to the planner's shuffled join. Left joins
    keep unseen buckets (count 0 under smoothing).

    NOTE: the eager model checkpoints + grand-total collects mean
    CONSTRUCTING this DataFrame runs Spark jobs (two count-model corpus
    passes); the function is not lazy — same contract as
    lm.doc_lm_scores.
    """
    from .partitioning import spread

    raw = spread(raw, id_col)
    target = spread(target)
    # EAGER checkpoint of the two count models (r11): each table is at
    # most n_buckets rows (parameter-bounded, KBs), but its LINEAGE is a
    # corpus-scaled tokenize+shingle+hash pass — and it has three
    # consumers (the per-gram left join, and the 1-row total as a
    # broadcast SUBQUERY, which Spark executes as a concurrent separate
    # job with no exchange reuse across the subquery boundary). Without
    # the barrier the raw corpus is hashed up to 3x and the target 2x
    # per execution (measured sf0.1: five ~10-26s 32-task stages for
    # what is two corpus passes). Eager, not lazy: concurrent first
    # consumers race a lazy checkpoint and each recompute the stage
    # (the MG-sketch r11 race class).
    t_counts = ngram_count_model(target, content_col, n, n_buckets).localCheckpoint(
        eager=True
    )
    r_counts = ngram_count_model(raw, content_col, n, n_buckets).localCheckpoint(
        eager=True
    )
    # Grand totals as literals (bounded 1-row collects over the eager
    # checkpoints) — see importance_weights_subset for the rationale.
    nt_v = t_counts.agg(F.sum("c")).collect()[0][0]
    nr_v = r_counts.agg(F.sum("c")).collect()[0][0]
    nt_c = F.lit(nt_v) if nt_v is not None else F.lit(None).cast("bigint")
    nr_c = F.lit(nr_v) if nr_v is not None else F.lit(None).cast("bigint")

    tt = t_counts.withColumnRenamed("c", "ct")
    rr = r_counts.withColumnRenamed("c", "cr")
    if n_buckets <= BROADCAST_MODEL_MAX_BUCKETS:
        tt, rr = F.broadcast(tt), F.broadcast(rr)
    per_gram = (
        raw.select(
            F.col(id_col), T.tokens(F.col(content_col)).alias("__toks")
        )
        .select(
            F.col(id_col),
            F.explode_outer(
                _hashed_ngrams_of(F.col("__toks"), n, n_buckets)
            ).alias("bucket"),
        )
        .join(tt, "bucket", "left")
        .join(rr, "bucket", "left")
    )
    # log((ct+1)/(nt+V)) - log((cr+1)/(nr+V)); constants enter once per
    # gram, as plan literals.
    gram_term = (
        F.log(F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
        - F.log(nt_c + float(n_buckets))
        - F.log(F.coalesce(F.col("cr"), F.lit(0)) + 1.0)
        + F.log(nr_c + float(n_buckets))
    )
    out = per_gram.groupBy(id_col).agg(
        F.count(F.col("bucket")).alias("n_grams"),
        F.coalesce(
            F.sum(F.when(F.col("bucket").isNotNull(), gram_term)),
            F.lit(0.0),
        ).alias("logw"),
    )
    if round_digits is not None:
        out = out.withColumn("logw", F.round("logw", round_digits))
    return out


def importance_resample(
    raw: DataFrame,
    target: DataFrame | None,
    fraction: float = 0.25,
    content_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    n_buckets: int = 1 << 16,
    round_digits: int | None = None,
    target_pred: Column | None = None,
) -> DataFrame:
    """Top-``fraction`` of raw docs by importance weight (deterministic
    rank cutoff, ties broken on id — the paper's Gumbel-noise sampling is
    replaced by a stable cutoff so results are engine-portable).
    Returns the surviving (id, n_grams, logw) rows.

    orderBy + limit plans TakeOrderedAndProject (distributed per-partition
    top-k + merge) — no single-partition global sort. Oracle-compared
    callers pass ``round_digits`` so the sort key is the ROUNDED weight
    on both engines — a last-ulp libm divergence near the rank boundary
    must not flip which doc makes the cut.

    Pass ``target_pred`` (and ``target=None``) when the target domain is
    a predicate over ``raw`` — weights then come from the two-pass
    :func:`importance_weights_subset`.
    """
    if target_pred is not None:
        w = importance_weights_subset(
            raw, target_pred, content_col, id_col, n, n_buckets, round_digits
        )
    else:
        w = importance_weights(
            raw, target, content_col, id_col, n, n_buckets, round_digits
        )
    total = raw.count()
    keep = max(int(total * fraction), 1)
    # Zero-gram docs score a neutral 0.0, which would outrank any doc with
    # weak negative evidence — but "no evidence" is not "target-like", so
    # they sort after every assessable doc.
    return w.orderBy(
        F.desc(F.col("n_grams") > 0), F.desc("logw"), F.asc(id_col)
    ).limit(keep)
