"""ArticleRank — the reference family's damped-citation variant.

The reference repo ships ArticleRank next to PageRank
(pub:algo/src/main/java/org/neo4j/graphalgo/ArticleRankProc.java [M],
same ComputeStep machinery as pub:algo/.../impl/PageRank.java — see
SURVEY.md §0 for the `pub:` citation convention): identical damped
fixed-point iteration, but each source's contribution is divided by
``outdeg(u) + avgOutdeg`` instead of ``outdeg(u)``, damping the votes
of promiscuous citers (Li, Willett 2009, "ArticleRank: a PageRank-based
alternative" — public result):

    AR_i^(t+1) = (1-d) + d * sum_{u -> i}  AR_u^(t) / (outdeg_u + avg)
    avg        = |E| / |V|   (mean out-degree over ALL nodes,
                              danglers included — one exact IEEE
                              division of two BIGINTs)

Spark shape (same plan family as pagerank.py, deliberately lean — the
heavily tuned hot path with static folding / auto-salt stays in
pagerank.py, this module's loop is the plain gather-scatter):

* per-edge share ``w / (sum_w(src) + avg)`` — ONE window aggregate
  partitioned by src, output pre-partitioned+sorted by src and pinned
  so every superstep's sort-merge join reuses the cached layout;
* per-superstep: one join (edges x ranks on src) + one
  map-side-combined sum by dst + the node left-join — one shuffle
  exchange per iteration beyond the pinned layouts;
* SuperstepLoop checkpoint/resume with context validation (damping,
  weighted, direction, graph fingerprint) — resuming under different
  parameters raises instead of silently blending fixed points.

Unlike PageRank's rank-conserving shares (sum to 1 per source), the
ArticleRank denominator deliberately leaks mass (shares sum to
outdeg/(outdeg+avg) < 1), so scores sit between 1-d and the PageRank
scale — matching the reference's non-normalized convention.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state


@dataclass
class ArticleRankResult:
    scores: DataFrame  # (id: long, rank: double)
    iterations: int
    converged: bool
    delta: float | None
    stats: dict = field(default_factory=dict)


def article_rank(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
    weighted: bool = False,
    direction: str = "OUTGOING",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> ArticleRankResult:
    """ArticleRank over an edge table (see module docstring).

    edges: DataFrame(src long, dst long[, weight double]). ``weighted``
    replaces out-degree with the source's weight sum (and the unit
    numerator with the edge weight) — the engine's extension, exactly
    as in pagerank(weighted=True).
    """
    spark = edges.sparkSession
    t0 = time.time()
    d = float(damping)
    dirn = direction.upper()
    keep = [F.col("weight")] if "weight" in edges.columns else []
    if dirn == "INCOMING":
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *keep)
    elif dirn == "BOTH":
        edges = edges.select("src", "dst", *keep).union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *keep)
        )
    elif dirn != "OUTGOING":
        raise ValueError(f"bad direction {direction}")

    w = F.coalesce(F.col("weight"), F.lit(1.0)) if weighted else F.lit(1.0)
    win = Window.partitionBy("src")
    # keep (w, sw) split here: avg isn't known until the counts below,
    # so the share division happens once, after, against the cache
    pre = edges.select("src", "dst", w.alias("w")).select(
        "src", "dst", "w", F.sum("w").over(win).alias("sw")
    ).persist()
    n_edges = pre.count()
    base = (
        nodes.select("id")
        if nodes is not None
        else pre.select(F.col("src").alias("id"))
        .union(pre.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = pin_table(base.repartition("id"))
    n_nodes = base.count()
    if n_nodes == 0:
        raise ValueError("article_rank on an empty graph")
    avg = n_edges / n_nodes  # one exact IEEE division (BIGINT/BIGINT)

    edges_sh = pin_table(
        pre.select(
            "src", "dst", (F.col("w") / (F.col("sw") + F.lit(avg))).alias("share")
        )
        .repartition("src")
        .sortWithinPartitions("src")
    )
    pre.unpersist()
    t_load = time.time() - t0

    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="articlerank",
        max_steps=max_iter,
        context={
            "damping": d, "weighted": bool(weighted), "direction": dirn,
            "n_edges": n_edges, "n_nodes": n_nodes,
        },
    )
    start_iter = 0
    ranks = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            ctx = loop.last_context
            want = {"damping": d, "weighted": bool(weighted), "direction": dirn,
                    "n_edges": n_edges, "n_nodes": n_nodes}
            got = {k: ctx.get(k) for k in want}
            if got != want:
                raise ValueError(
                    f"article_rank resume parameter mismatch: manifest {got} "
                    f"vs requested {want}"
                )
            start_iter, ranks = resumed
    if ranks is None:
        ranks = base.select("id", F.lit(1.0 - d).alias("rank"))
        ranks = loop.advance(0, ranks, metrics={"init": 1.0 - d}, force_checkpoint=True)

    converged = False
    delta = None
    it = start_iter
    t1 = time.time()
    for it in range(start_iter + 1, max_iter + 1):
        sums = (
            edges_sh.join(ranks, edges_sh.src == ranks.id)
            .select(edges_sh.dst.alias("dst"), (F.col("rank") * F.col("share")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        new_ranks = base.join(sums, base.id == sums.dst, "left").select(
            base.id.alias("id"),
            (F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
        )
        if tol is not None:
            probe = new_ranks.persist()
            delta = (
                probe.alias("n").join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            delta = float(delta) if delta is not None else 0.0
            new_ranks = loop.advance(it, probe, metrics={"linf_delta": delta})
            if new_ranks is not probe:
                probe.unpersist()
            ranks = new_ranks
            if delta < tol:
                converged = True
                break
        else:
            ranks = loop.advance(it, new_ranks)
    if checkpoint_dir:
        ranks = loop.advance(it, ranks, metrics={"final": True, "linf_delta": delta},
                             force_checkpoint=True, suffix="_final")
    t_compute = time.time() - t1
    stats = {
        "nodes": n_nodes, "edges": n_edges, "avg_outdeg": avg,
        "iterations": it, "damping": d, "converged": converged,
        "load_s": round(t_load, 4), "compute_s": round(t_compute, 4),
    }
    release_state(edges_sh)
    release_state(base)
    loop.close()
    return ArticleRankResult(
        scores=ranks, iterations=it, converged=converged, delta=delta, stats=stats
    )


def article_rank_sql(
    edges_sql: str, iters: int, d: float = 0.85, weighted: bool = False
) -> str:
    """Oracle: the recurrence unrolled ``iters`` times. avg is the same
    single BIGINT/BIGINT division; per-edge share parenthesized exactly
    as the engine computes it (w / (sw + avg))."""
    alpha = repr(1.0 - d)
    if weighted:
        deg = ("outdeg AS (SELECT src, SUM(weight) AS sw FROM edges GROUP BY src),")
        share = "(e.weight / (od.sw + av.avg))"
    else:
        deg = ("outdeg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS sw "
               "FROM edges GROUP BY src),")
        share = "(1.0 / (od.sw + av.avg))"
    parts = [
        f"WITH edges AS ({edges_sql}),",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),",
        deg,
        "av AS (SELECT CAST((SELECT COUNT(*) FROM edges) AS DOUBLE)"
        " / CAST((SELECT COUNT(*) FROM nodes) AS DOUBLE) AS avg),",
        f"p0 AS (SELECT id, CAST({alpha} AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""", p{k} AS (
  SELECT n.id AS id, CAST({alpha} AS DOUBLE) + {d!r} * COALESCE(s.s, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS dst, SUM(p.rank * {share}) AS s
    FROM edges e JOIN p{k - 1} p ON p.id = e.src
    JOIN outdeg od ON od.src = e.src CROSS JOIN av
    GROUP BY e.dst) s ON s.dst = n.id)"""
        )
    parts.append(f"\nSELECT id, ROUND(CAST(rank AS DOUBLE), 6) AS rank FROM p{iters}")
    return "\n".join(parts)
