"""Graph operators over edge lists — the crawl-graph side of corpus
curation (host-level PageRank for frontier seeding / domain quality,
next to urlops' registered-domain extraction and dedup.py's
connected-component label propagation).

Spark-first shapes: the edge table is the only large input; every
iteration is one equi-join (edge src -> rank) + one aggregation
(sum per dst), both map-side combinable. The dangling-node mass rides
a broadcast single-row cross join, so NO driver action happens inside
the loop — the whole n_iter power iteration is one lazy plan, bounded
by ``checkpoint_every`` localCheckpoints exactly like
dedup.duplicate_clusters' propagation rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(edges: DataFrame, n_iter: int = 10, damping: float = 0.85,
             src_col: str = "src", dst_col: str = "dst",
             checkpoint_every: int = 1) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list (the
    canonical power iteration with uniform teleport and dangling-mass
    redistribution — the host-graph ranking crawl pipelines seed
    frontiers and weigh domains with).

    Duplicate (src, dst) rows are collapsed first: the rank is defined
    on the simple digraph. Per iteration:
    pr'(v) = (1-d)/N + d * (sum_{u->v} pr(u)/deg(u) + dangling_mass/N)
    where dangling_mass is the rank held by nodes without outlinks.
    Fixed ``n_iter`` rounds — no convergence check, hence no driver
    action in the loop (the 100 TB form: budget rounds, exactly like
    duplicate_clusters' ``check_every`` advice). Returns
    ``(node, pr)`` with pr rounded to 6dp.

    Scale shape: one (src,dst) distinct, one out-degree aggregation,
    then per round ONE shuffle join on src and ONE sum-per-dst
    aggregation; the degree column is attached to the cached edge table
    once so rounds reuse the co-partitioned layout. The dangling sum is
    a 1-row broadcast. ``checkpoint_every`` localCheckpoints bound plan
    depth; it defaults to EVERY round because each round references the
    previous rank table twice (link contributions + the dangling
    anti-join), so uncheckpointed plan size grows 2^rounds — measured
    4,367 physical-plan nodes / 282 scan copies for 5 rounds at
    checkpoint_every=5 vs linear at 1. The checkpoint materializes only
    the (node, pr) table — one row per node, the smallest thing in the
    job — which is the standard iterative-graph trade (GraphX does the
    same)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct())
    # seam-persisted: the dangling anti-join reads deg EVERY round —
    # unpersisted, each round re-executes the edge scan + distinct +
    # aggregation. localCheckpoint(eager=False), NOT .cache(): same
    # lazy first-use materialization and the optimizer keeps the small
    # side's stats (verified: LogicalRDD carries sizeInBytes, broadcast
    # still chosen), but blocks are reference-tracked — released when
    # the caller drops the result — where CacheManager pins a .cache()
    # forever (the ADVICE r4 leak class).
    deg = (e.groupBy("src")
           .agg(F.count("*").cast("double").alias("deg"))
           .localCheckpoint(eager=False))
    ed = e.join(deg, "src").localCheckpoint(eager=False)  # reused every round
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=False))
    n = float(nodes.count())                  # the one driver action
    pr = nodes.select("node", F.lit(1.0 / n).alias("pr"))
    for i in range(n_iter):
        contrib = (ed.join(pr, ed["src"] == pr["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("pr") / F.col("deg")).alias("s")))
        dangling = (pr.join(deg, pr["node"] == deg["src"], "left_anti")
                    .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")))
        pr = (nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
              .crossJoin(F.broadcast(dangling))
              .select(F.col("node"),
                      (F.lit((1.0 - damping) / n)
                       + F.lit(damping)
                       * (F.coalesce(F.col("s"), F.lit(0.0))
                          + F.col("dm") / F.lit(n))).alias("pr")))
        if checkpoint_every and (i + 1) % checkpoint_every == 0 \
                and i + 1 < n_iter:
            # lazy: materializes inside the final action (no in-loop
            # job), still truncating lineage for every later reference
            pr = pr.localCheckpoint(eager=False)
    return (pr.select("node", F.round("pr", 6).alias("pr"))
            .orderBy("node"))
