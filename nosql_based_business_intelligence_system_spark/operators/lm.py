"""Corpus language-model quality scoring (CCNet-style perplexity filter).

Web-scale curation pipelines rank documents by perplexity under a reference
language model and drop/down-weight the tail (Wenzek et al. 2020, CCNet;
the same signal backs quality buckets in most LLM data recipes). The
engine's version scores each document under the corpus's OWN bigram model
— no external model artifact, one extra aggregation pass — which is the
standard bootstrap when no curated reference corpus exists yet.

Model: add-one-smoothed bigram LM over whitespace tokens,
``p(cur | prev) = (c(prev,cur) + 1) / (c(prev) + V)``; per-doc
cross-entropy is ``-avg(ln p)`` over the doc's bigrams and perplexity is
its exp. Everything is counts + joins:

- one explode -> grouped count for unigrams (c(prev) and V),
- one explode -> grouped count for bigrams,
- one scoring pass joining each doc bigram to the two count tables.

Count tables are vocabulary-sized (<< corpus at any scale) and
broadcast-eligible by threshold — never forced. The scoring join shuffles
on the bigram key; no UDF, no collect, no iteration.

Results are rounded to 6 decimals ON BOTH ENGINES: cross-entropy sums libm
logs, which differ from the JVM's in the last ulp (same discipline as the
stats-suite moments; cf. doc_rarity_scores' log-free design note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def token_bigrams(toks: Column) -> Column:
    """(prev, cur) struct per adjacent token pair — transform over an index
    sequence, no explode until the caller needs rows. Empty for size < 2
    (``sequence(1, 0)`` would descend; guard like word_shingles)."""
    pair = lambda i: F.struct(  # noqa: E731
        F.element_at(toks, i).alias("prev"),
        F.element_at(toks, i + F.lit(1)).alias("cur"),
    )
    return F.when(
        F.size(toks) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(toks) - 1), pair),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))


def doc_lm_scores(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    shuffle_hash_joins: bool = False,
) -> DataFrame:
    """(id, n_bigrams, cross_entropy, perplexity) under the corpus's own
    add-one bigram model. Lower = more typical of the corpus; documents
    with fewer than two tokens carry NULL scores (no bigrams to average).

    ``shuffle_hash_joins`` is the third-decade lever (suite-gated on
    corpus size): statically the count tables are aggregates over a
    checkpoint with no usable size statistic, so the planner picks
    SortMergeJoin and SORTS the corpus-scaled bigram relation twice (once
    per scoring join) — measured at sf100 (265M bigram rows): 82.5s ->
    61.7s with the hints, values identical. At bench scale the hint
    instead BLOCKS AQE's runtime broadcast conversion (sf0.1: 1.33 ->
    1.50s), so it stays off below the gate. A hint, not a forced
    broadcast: count tables are vocabulary-scaled, and a real web
    corpus's bigram table can outgrow any broadcast budget while a
    per-partition hash build side scales with the partition count.
    """
    from .partitioning import spread

    df = spread(df, id_col)
    # Tokenize ONCE: the model-building passes (unigram + bigram counts)
    # and the scoring pass all consume the token arrays, and without a
    # materialization barrier each consumer re-runs the regex tokenizer
    # over the full corpus (3 tokenize passes — the dominant cost of the
    # sf10 wall clock, r5 verdict item 6). EAGER (r11): a lazy checkpoint
    # only deduplicates consumers that arrive AFTER the first
    # materialization — the vocab broadcast subquery (and AQE's runtime
    # broadcast conversions of the count-table joins at small sf) launch
    # CONCURRENTLY with the main pass, and concurrent first consumers
    # each recompute the tokenize stage (the same race class as the MG
    # sketch's r11 fix; measured here: big-stage CPU 26.6s -> 14.8s per
    # sf0.1 pass with eager).
    toks_df = df.select(
        F.col(id_col), T.tokens(F.col(content_col)).alias("__toks")
    ).localCheckpoint(eager=True)
    toks = F.col("__toks")
    pairs = toks_df.select(
        F.col(id_col), F.explode_outer(token_bigrams(toks)).alias("bg")
    ).select(id_col, F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))

    uni = (
        toks_df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cp"))
    )
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    big = pairs.filter(F.col("prev").isNotNull()).groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("cb")
    )

    logp = F.log(F.col("cb") + F.lit(1.0)) - F.log(F.col("cp") + F.col("v"))
    uni_prev = uni.withColumnRenamed("w", "prev")
    if shuffle_hash_joins:  # see docstring: the third-decade join shape
        big = big.hint("shuffle_hash")
        uni_prev = uni_prev.hint("shuffle_hash")
    scored = (
        pairs.join(big, ["prev", "cur"], "left")
        .join(uni_prev, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.col("prev")).alias("n_bigrams"),
            F.round(-F.avg(F.when(F.col("prev").isNotNull(), logp)), 6).alias(
                "cross_entropy"
            ),
        )
        .withColumn(
            "perplexity", F.round(F.exp(F.col("cross_entropy")), 6)
        )
    )
    return scored
