"""Fixed-iteration PageRank on an edge DataFrame.

Power iteration expressed as joins + grouped sums — the canonical
iterative-algorithm shape on Spark (same discipline as
``dedup.connected_components``: checkpoint per round, no driver-side
data, one shuffle per iteration on the edge key).

Per iteration:
  ``rank'(v) = (1 - d)/N + d * (dangling_mass/N + sum over in-edges
  u->v of rank(u)/out_degree(u))``

Dangling mass (nodes with no out-edges) is redistributed uniformly — the
standard stochastic-matrix completion, computed as one scalar aggregate
per round (broadcast back as a 1-row cross join).

Float scores come from repeated IEEE division/addition whose
accumulation order is partition-dependent at the last ulp, so registry
entries verify rows-only; exact-shape parity against an in-process numpy
power iteration is pytest-proven (tests/test_pagerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iterations: int = 10,
    weight: str | None = None,
) -> DataFrame:
    """(node, rank) after ``n_iterations`` power steps from the uniform
    start. Node set = union of sources and destinations; ranks sum to 1
    (up to float addition error).

    ``weight``: optional edge-weight column — rank flows proportionally
    to weight / total outgoing weight. Multi-edges without a weight
    column behave identically to one weighted edge per (src, dst) pair
    (pytest-proven equivalence) — so at scale, PRE-AGGREGATE the edge
    list to (src, dst, weight) first: a 10^9-row raw edge table usually
    collapses to a tiny weighted adjacency that each power step then
    joins instead of the full edge log.
    """
    cols = [F.col(src).alias("src"), F.col(dst).alias("dst")]
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(*cols, w.alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_total = nodes.count()
    if n_total == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.sum("w").alias("deg"))
    # rank-share denominator rides each edge; checkpoint the static
    # edge+degree table once, not per round
    ed = e.join(out_deg, "src").localCheckpoint(eager=False)

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_total))
    base = (1.0 - damping) / n_total
    # Dangling-ness (no out-edges) is STATIC: decide once whether the
    # per-round redistribution machinery is needed at all — for graphs
    # with no dangling nodes it would add an anti-join + scalar agg +
    # cross join to every iteration for a constant zero.
    dangling_nodes = nodes.join(
        out_deg, nodes.node == out_deg.src, "left_anti"
    ).localCheckpoint(eager=False)
    has_dangling = dangling_nodes.limit(1).count() > 0
    for _ in range(max(n_iterations, 0)):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(
                "dst", (F.col("rank") * F.col("w") / F.col("deg")).alias("c")
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        new = nodes.join(contrib, nodes.node == contrib.dst, "left")
        if has_dangling:
            # no forced broadcast: the dangling set can be huge on
            # dangling-heavy graphs (threshold/AQE decides)
            dangling = (
                ranks.join(dangling_nodes, "node", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
            )
            new = new.crossJoin(F.broadcast(dangling))
            dm_term = F.col("dm") / n_total
        else:
            dm_term = F.lit(0.0)
        ranks = new.select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("inflow"), F.lit(0.0)) + dm_term)
            ).alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks
