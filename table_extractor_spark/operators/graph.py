"""Iterative graph ranking over a distributed edge list.

PageRank (Page et al. 1999, "The PageRank citation ranking") in the
Pregel-ish DataFrame shape (Malewicz et al. SIGMOD 2010): each iteration
is one join (ranks onto out-edges) plus one partial-agg'd groupBy of the
contributions — the per-superstep plan a 10^12-edge cluster run wants,
with NO driver-side traffic at all (contrast the sanctioned O(1)-rows
collects in BPE/Lloyd training: here even the loop state stays
distributed; only the iteration COUNT lives on the driver).

Arithmetic is integer-exact end to end (the engine's reproducibility
policy): ranks are parts-per-million int64, each edge contributes
``rank div outdeg`` (exact per edge, so the SUM is order- and
partition-invariant), and the damping update is
``150_000 + 850_000 * sum_contrib div 1_000_000``.  Any engine replays
it bit-for-bit — the DuckDB oracle chains one CTE per iteration.

Dangling nodes (no out-edges) DROP their mass rather than spreading it
uniformly — the common simplification; total rank is therefore not
conserved and scores are comparative, not a probability.  Stated here
so the semantics are honest, not discovered.

Overflow budget: a node's rank after an update is at most
``150_000 + 850_000 * indeg`` ppm-scale, so the pre-division product
``850_000 * sum_contrib`` needs ``sum_contrib < 2^63 / 850_000 ≈ 1.08e13``
— guarded with ``assert_true`` per node, so a graph dense enough to
overflow fails loudly instead of wrapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PPM = 1_000_000
DAMPING_PPM = 850_000
BASE_PPM = PPM - DAMPING_PPM  # 150_000
_SUM_BUDGET = (1 << 63) // DAMPING_PPM


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    checkpoint_every: int = 8,
    sum_budget: int = _SUM_BUDGET,
) -> DataFrame:
    """(node, rank_ppm) after ``iters`` exact-integer PageRank rounds over
    the directed edge list.  ``edges`` rows must be distinct (src, dst)
    pairs; node ids are compared as-is, so namespace them upstream if two
    id spaces can collide (e.g. ``'c:'||custkey`` vs ``'s:'||suppkey``).

    Shape per iteration: broadcast-free join of the rank table onto the
    out-edge table (both hash-partitioned on the source key — co-located
    on a cluster that pre-bucketed edges), then one partial-agg'd groupBy
    on dst.  The out-degree join happens ONCE before the loop and the
    (src, dst, deg) table is persisted: iterations re-scan it, not the
    raw edges.  Lineage is truncated with localCheckpoint every
    ``checkpoint_every`` iterations so deep runs don't accumulate an
    unbounded plan tree (K<=8, the common case, never checkpoints).

    Cache lifetime: the fan and node tables stay persisted for as long as
    the returned DataFrame is in use (they back every iteration of its
    plan, so they cannot be released here).  A session ranking MANY
    graphs should unpersist them between runs —
    ``spark.catalog.clearCache()`` or hold references and
    ``df.unpersist()`` once the ranks are materialized."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if checkpoint_every < 1:
        raise ValueError(
            f"checkpoint_every must be >= 1, got {checkpoint_every}"
            " (use a value > iters to disable checkpointing)"
        )
    outdeg = edges.groupBy(src).agg(F.count("*").cast("long").alias("__deg"))
    fan = edges.join(outdeg, src).select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst"), "__deg"
    )
    fan.persist()
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .persist()
    )
    ranks = nodes.withColumn("rank_ppm", F.lit(PPM).cast("long"))
    for i in range(iters):
        contribs = (
            fan.join(ranks, fan["__src"] == ranks["node"])
            .select(
                F.col("__dst").alias("node"),
                F.expr("rank_ppm div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").cast("long").alias("__s"))
        )
        s = F.coalesce(F.col("__s"), F.lit(0).cast("long"))
        # the >= 0 leg catches a sum so large it WRAPPED int64 during
        # aggregation (wraps land anywhere in [-2^63, 2^63); a negative
        # or huge value both fail) — the budget check alone would let a
        # wrapped-negative sum through
        guarded = F.when(
            F.assert_true(
                (s >= 0) & (s < F.lit(sum_budget)),
                F.lit(
                    "pagerank: contribution sum exceeds the int64 damping "
                    "budget (~1.08e13 ppm); rescale ranks or shard the graph"
                ),
            ).isNull(),
            s,
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .withColumn("__g", guarded)
            .select(
                "node",
                F.expr(
                    f"CAST({BASE_PPM} + {DAMPING_PPM} * __g div {PPM} AS BIGINT)"
                ).alias("rank_ppm"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
