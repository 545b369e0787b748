"""PageRank — gather-scatter DataFrame plan.

Re-creates the exact semantics of the reference implementation
(pub:algo/.../impl/PageRank.java, proc pub:algo/.../PageRankProc.java;
SURVEY.md §2.1 — numerically validated against the reference test
constant b≈1.9184 on the wiki fixture):

  p_i^(0)   = 1 - d                       (d = damping, default 0.85)
  p_i^(t+1) = (1 - d) + d * sum_{j->i} p_j^(t) / outdeg(j)

Synchronous (Jacobi), NON-normalized (isolated node scores exactly
1-d), dangling nodes leak mass (no redistribution), fixed iteration
count by default; optional ``tol`` (L-inf delta) adds the
convergence-mode the BASELINE metric reports.

Spark plan per superstep (SURVEY.md §2.1 "Spark mapping"):

  contribs = edges_pre JOIN ranks ON src = id        -- gather
             SELECT dst, rank/outdeg AS c
  sums     = contribs GROUP BY dst SUM(c)            -- scatter+combine
  ranks'   = base LEFT JOIN sums ON id = dst
             SELECT id, (1-d) + d*coalesce(s, 0)

The reference's per-target-partition float[] delta buffers
(PageRank.java#ComputeStep) map to Spark's map-side partial
aggregation inside SUM — free via Catalyst (SURVEY.md §4). Its
degree-balanced ComputeStep partitioning maps to AQE skew handling
plus the CSR/salting fast path in linkgraph/csr.py.

Scale notes (100TB design): ``edges_pre`` is hash-partitioned by src
ONCE and persisted, so the per-iteration join only shuffles the
(small-side) ranks state; the groupBy(dst) partial-aggregates map-side
so hot in-degree hubs ship one partial row per shuffle partition, not
one row per in-edge.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop


@dataclass
class PageRankResult:
    scores: DataFrame  # (id: long, rank: double)
    iterations: int
    converged: bool
    delta: float | None
    stats: dict = field(default_factory=dict)


def _node_universe(edges: DataFrame, nodes: DataFrame | None) -> DataFrame:
    if nodes is not None:
        return nodes.select("id")
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> PageRankResult:
    """Compute PageRank over an edge table.

    edges: DataFrame(src long, dst long[, weight double]).
    nodes: optional DataFrame(id long) fixing the node universe
      (isolated nodes score exactly 1-damping, like the g..j nodes of
      the reference PageRankTest fixture).
    tol: if set, stop early when L-inf(rank' - rank) < tol and report
      iterations-to-convergence (BASELINE.md metric).
    weighted: contribution rank * w / sum_w(src) instead of
      rank / outdeg (reference PageRank is unweighted; weighted mode is
      this engine's extension for the import-co-occurrence edge table).
    """
    spark = edges.sparkSession
    t0 = time.time()
    d = float(damping)
    base = _node_universe(edges, nodes).persist()
    n_nodes = base.count()

    if weighted:
        w = F.coalesce(F.col("weight"), F.lit(1.0))
        deg = edges.groupBy("src").agg(F.sum(w).alias("outdeg"))
        e = edges.select("src", "dst", w.alias("w"))
        edges_pre = e.join(deg, "src").select(
            "src", "dst", (F.col("w") / F.col("outdeg")).alias("share")
        )
    else:
        deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        edges_pre = edges.join(deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("share")
        )
    # partition the (static) edge side once; iterations reuse it
    edges_pre = edges_pre.repartition("src").persist()
    n_edges = edges_pre.count()
    t_load = time.time() - t0

    loop = SuperstepLoop(spark, checkpoint_dir, every=checkpoint_every, name="pagerank")
    start_iter = 0
    ranks = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            start_iter, ranks = resumed
    if ranks is None:
        ranks = base.select("id", F.lit(1.0 - d).alias("rank"))
        ranks = loop.advance(0, ranks, metrics={"init": 1.0 - d}, force_checkpoint=True)

    converged = False
    delta = None
    it = start_iter
    t1 = time.time()
    for it in range(start_iter + 1, max_iter + 1):
        contribs = edges_pre.join(ranks, edges_pre.src == ranks.id).select(
            edges_pre.dst.alias("dst"), (F.col("rank") * F.col("share")).alias("c")
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        new_ranks = (
            base.join(sums, base.id == sums.dst, "left")
            .select(
                base.id.alias("id"),
                (F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
            )
        )
        if tol is not None:
            new_ranks = new_ranks.persist()
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            new_ranks = loop.advance(it, new_ranks, metrics={"linf_delta": delta})
            if delta < tol:
                converged = True
                ranks = new_ranks
                break
        else:
            new_ranks = loop.advance(it, new_ranks)
        ranks = new_ranks

    scores = ranks
    if checkpoint_dir:
        # final durable state so a subsequent resume() sees completion
        scores = loop.advance(it, ranks, metrics={"final": True, "linf_delta": delta}, force_checkpoint=True)
    stats = {
        "nodes": n_nodes,
        "edges": n_edges,
        "iterations": it,
        "damping": d,
        "load_s": round(t_load, 4),
        "compute_s": round(time.time() - t1, 4),
        "converged": converged,
        "linf_delta": delta,
    }
    base.unpersist()
    edges_pre.unpersist()
    return PageRankResult(scores=scores, iterations=it, converged=converged, delta=delta, stats=stats)
