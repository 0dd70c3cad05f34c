"""Graph centrality over DataFrame edge lists — weighted PageRank.

The web-pipeline use case is host/page ranking: crawl prioritization,
quality weighting, and spam-host downranking all start from a link-graph
centrality score (the reference pipeline has no graph stage — this is
beyond-reference LLM-corpus surface, same family as dedup clustering in
operators/dedup.py which is the other iterative-join operator here).

Scale notes (1000-executor deployment):
  * Each iteration is ONE shuffle join of the (pre-normalized,
    materialized-once) edge list against the current rank vector plus a
    partial-agg groupBy on dst — the canonical Pregel-on-DataFrame
    shape.  Edge normalization (weight / out-weight) happens once,
    outside the loop.
  * Dangling mass (nodes with no out-edges) is redistributed uniformly
    IN-PLAN via a one-row aggregate cross-joined back — no per-iteration
    driver collect; the loop body never touches the driver.
  * `localCheckpoint` truncates lineage each round so plan depth stays
    constant.  Same storage caveat as dedup.cluster_assign: superseded
    rank snapshots ((node, pr) pairs — tiny next to the edges) are freed
    by the ContextCleaner only on a driver GC, so worst-case retention
    is all n_iter snapshots; at cluster scale use reliable checkpoints
    with explicit per-round deletion.
  * Skew: a mega-host (in-degree millions) concentrates its groupBy(dst)
    partial aggregation map-side — each task emits one (dst, sum) row,
    so the reduce side sees one row per task per hot key, not the raw
    in-edge list.  No salting needed for the aggregate path.
  * Fixed iteration count (not a convergence test) keeps the result a
    pure function of the input — oracle-matchable, and at 10^12 edges a
    fixed budget is what you run anyway (convergence deltas cost an
    extra action per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, d: float = 0.85, n_iter: int = 6) -> DataFrame:
    """Weighted PageRank over an edge table.

    edges: DataFrame(src, dst, weight) — directed, weight > 0.  Nodes
    are the distinct union of src and dst.  Every node starts at 1/N;
    each iteration applies

        pr'(v) = (1-d)/N + d * ( sum_{u->v} pr(u) * w(u,v)/outw(u)
                                 + dangling_mass/N )

    where dangling_mass is the summed rank of nodes with no out-edges
    (redistributed uniformly, so total rank stays 1 to float precision).
    Symmetrize the edge list upstream if the graph is undirected.

    Returns DataFrame(node, pr_rank) — one row per node, exact doubles
    (round at the query layer if cross-engine comparison is needed).
    """
    # materialize the input ONCE — nodes/out-weights/normalized-edges/
    # dangling all derive from it, and the upstream plan (often a join +
    # aggregate building the edge list) must not re-execute four times.
    # NULL endpoints (including failed long casts) are dropped HERE:
    # null keys never join, so a NULL node would otherwise enter the
    # node set and N, then silently vanish from `ranks` after round 1 —
    # leaking its rank mass and breaking the one-row-per-node contract.
    e = (edges.select(F.col("src").cast("long").alias("src"),
                      F.col("dst").cast("long").alias("dst"),
                      F.col("weight").cast("double").alias("w"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .localCheckpoint(eager=True))
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct()
             .localCheckpoint(eager=True))
    # one driver-side count: N is a plan constant ((1-d)/N below), and
    # the node set was just checkpointed so this re-scans nothing big
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr_rank", F.lit(0.0))
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    # zero-share self-edges guarantee every node receives a contrib row,
    # so the loop needs NO per-round left join back onto the node set —
    # one fewer shuffle per iteration.  Adding 0.0 * pr to a double sum
    # is an IEEE no-op, so the numbers are bit-identical to the naive
    # three-join formulation (contributions are never -0.0).
    nedges = (e.join(outw, "src")
              .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
              .unionByName(nodes.select(F.col("node").alias("src"),
                                        F.col("node").alias("dst"),
                                        F.lit(0.0).alias("share")))
              .localCheckpoint(eager=True))
    # nodes with no out-edges: their rank leaks unless redistributed.
    # Decided ONCE at setup — a dangling-free graph (e.g. any symmetrized
    # edge list) skips the per-iteration mass aggregate entirely, saving
    # one join+agg per round.
    dangling = (nodes.join(outw.select(F.col("src").alias("node")),
                           "node", "left_anti")
                .localCheckpoint(eager=True))
    has_dangling = dangling.limit(1).count() > 0
    ranks = nodes.withColumn("pr_rank", F.lit(1.0 / n))
    for it in range(n_iter):
        contrib = (nedges.join(ranks, nedges.src == ranks.node)
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("share") * F.col("pr_rank")).alias("c")))
        if has_dangling:
            # one-row aggregate broadcast back in-plan: no driver collect
            dm = (dangling.join(ranks, "node")
                  .agg(F.coalesce(F.sum("pr_rank"), F.lit(0.0)).alias("dm")))
            contrib = contrib.crossJoin(F.broadcast(dm))
        else:
            contrib = contrib.withColumn("dm", F.lit(0.0))
        ranks = contrib.select(
            "node",
            (F.lit((1.0 - d) / n)
             + F.lit(d) * (F.col("c") + F.col("dm") / n)).alias("pr_rank"))
        # checkpoint every OTHER round: lineage depth stays bounded (two
        # join/agg layers) while the eager-materialization job count —
        # the dominant cost of small-per-round iterative jobs — halves.
        if it % 2 == 1 or it == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks
