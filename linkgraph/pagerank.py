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

from pyspark.sql import DataFrame, Window
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
    hot_key_salt: int | str = 0,
    direction: str = "OUTGOING",
    source_nodes: DataFrame | list | None = None,
    static_folding: bool | None = None,
    termination=None,
    report_delta: bool = False,
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
    hot_key_salt: when > 0, the per-superstep contribution aggregation
      runs as an EXPLICIT salted two-phase sum — phase 1 groups by
      (dst, hash(src) % salt), phase 2 by dst. Spark's map-side partial
      aggregation already bounds hot-key rows to one per map partition;
      explicit salting additionally spreads a mega-hub's partial rows
      over `salt` reducers, which matters once map-partition counts
      reach the tens of thousands (1000-executor regime).
      ``"auto"`` measures the in-degree distribution at load (one
      aggregate over the cached edge table — the degree_histogram skew
      probe inlined) and engages a 16-way salt when the max in-degree
      exceeds 32x the mean: the decision the operator docs tell users
      to make by hand, made from the data.
    source_nodes: personalized PageRank (the later-lineage
      `sourceNodes` option of the reference procedure family): the
      teleport term lands ONLY on the given nodes — tp_i = 1-d for
      i in the source set, 0 elsewhere — so
      p_i^(t+1) = tp_i + d * sum contributions. Non-normalized like
      the base mode: a source with no in-edges scores exactly 1-d and
      any node unreachable from the set scores exactly 0.
    static_folding: force the static-node split on (True) or off
      (False); None (default) auto-enables at >= 2M edges. The split
      is a pure optimization — results are identical either way
      (cross-checked in tests/test_pagerank.py).
    report_delta: fixed-iteration mode only (tol=None). After the
      timed loop, run ONE extra untimed superstep and report the
      distance between the final two iterates in stats as
      `linf_delta` (max |Δrank|) and `l1_delta` (sum |Δrank|). The
      L1 delta contracts by EXACTLY ≤ damping per superstep (each
      node's |Δ| fans out through shares summing to 1, scaled by d),
      and L∞ ≤ L1, so iterations-to-tol is bounded by
      it + 1 + ceil(log(tol / l1_delta) / log(damping)) — the
      BASELINE.json "iterations-to-convergence" component, reported
      by bench.py without paying a per-superstep convergence probe
      inside the timed throughput loop.

    Static-node optimization (scale): nodes with in-degree 0 hold rank
    (1-d) at EVERY iteration (nothing flows into them), so their
    outgoing contribution is constant. It is folded once into a
    per-target baseline `s0`, and the superstep loop iterates ONLY the
    in-degree>0 node set against the dynamic-source edge subset —
    on power-law graphs this cuts per-iteration join/shuffle volume
    substantially while computing the exact same fixed-point.
    """
    spark = edges.sparkSession
    t0 = time.time()
    d = float(damping)
    dirn = direction.upper()
    if dirn == "INCOMING":
        # GraphLoader withDirection parity: rank flows along reversed
        # edges (pub:core/.../core/GraphLoader.java#withDirection)
        edges = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([F.col("weight")] if "weight" in edges.columns else []),
        )
    elif dirn == "BOTH":
        keep = [F.col("weight")] if "weight" in edges.columns else []
        edges = edges.select("src", "dst", *keep).union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"), *keep)
        )
    elif dirn != "OUTGOING":
        raise ValueError(f"bad direction {direction}")

    srcs = None
    if source_nodes is not None:
        if isinstance(source_nodes, DataFrame):
            srcs = source_nodes.select("id").distinct()
        else:
            srcs = spark.createDataFrame(
                [(int(s),) for s in source_nodes], "id long"
            )

    def _with_tp(df: DataFrame) -> DataFrame:
        """Attach the per-node teleport column tp (alpha on sources,
        0 elsewhere; constant alpha in the classic mode)."""
        if srcs is None:
            return df.withColumn("tp", F.lit(1.0 - d))
        flagged = df.join(
            srcs.select("id").withColumn("_s", F.lit(True)), "id", "left"
        )
        return flagged.withColumn(
            "tp", F.when(F.col("_s"), F.lit(1.0 - d)).otherwise(F.lit(0.0))
        ).drop("_s")

    # share = w / sum_w(src) as ONE window aggregate over partitionBy
    # (src): a groupBy+self-join computes the same thing but scans the
    # upstream twice (two join branches over the full lineage) and
    # shuffles twice — on a derived edge table (Arrow-UDF extraction)
    # the second upstream scan dominates load. The window shuffles once
    # on src and leaves the output HASH-PARTITIONED BY src, the exact
    # layout edges_dyn pins below, so that repartition collapses.
    w = (
        F.coalesce(F.col("weight"), F.lit(1.0))
        if weighted
        else F.lit(1.0)
    )
    win = Window.partitionBy("src")
    edges_pre = (
        edges.select("src", "dst", w.alias("w"))
        .select("src", "dst", (F.col("w") / F.sum("w").over(win)).alias("share"))
    )

    # persist BEFORE counting: the caller's edge table may hide an
    # expensive upstream (Arrow-UDF derivation); the count materializes
    # it once and every later pass (node universe, split decision,
    # edges_dyn layout) reads the cache instead of recomputing lineage
    edges_pre = edges_pre.persist()
    n_edges = edges_pre.count()

    # node universe AFTER the edge cache exists: derive it from
    # edges_pre (same src/dst set) so no second pass over the raw edge
    # lineage is ever taken; an explicit `nodes` frame is the caller's
    # (cheap or already-cached) dimension
    base = _node_universe(edges_pre, nodes).persist()
    n_nodes = base.count()

    # The static-node split costs ~6 extra jobs at load; it pays for
    # itself through smaller per-superstep joins only on large graphs.
    split_static = (
        static_folding if static_folding is not None else n_edges >= 2_000_000
    )
    if split_static:
        # split node universe: dynamic = in-degree > 0 (rank can
        # change), static = in-degree 0 (rank pinned at 1-d forever)
        targets = edges_pre.select(F.col("dst").alias("id")).distinct().persist()
        dyn_base = base.join(targets, "id", "left_semi").persist()
        static_nodes = base.join(targets, "id", "left_anti").persist()
        edges_src_filtered = edges_pre.join(
            dyn_base.select(F.col("id").alias("src")), "src", "left_semi"
        )
        # constant baseline: contributions of static sources, folded
        # once — a static source's rank is pinned at its teleport value
        # (1-d classic, tp personalized), so it contributes tp * share
        static_src_edges = edges_pre.join(
            dyn_base.select(F.col("id").alias("src")), "src", "left_anti"
        )
        if srcs is None:
            s0 = static_src_edges.groupBy("dst").agg(
                (F.lit(1.0 - d) * F.sum("share")).alias("s0")
            )
        else:
            s0 = (
                static_src_edges.join(
                    _with_tp(base).select(F.col("id").alias("src"), "tp"), "src"
                )
                .groupBy("dst")
                .agg(F.sum(F.col("tp") * F.col("share")).alias("s0"))
            )
        dyn = (
            _with_tp(dyn_base.join(s0, dyn_base.id == s0.dst, "left")
                     .select("id", F.coalesce(F.col("s0"), F.lit(0.0)).alias("s0")))
            .repartition("id")
        )
    else:
        targets = None
        dyn_base = base
        static_nodes = None
        edges_src_filtered = edges_pre
        dyn = _with_tp(base.select("id", F.lit(0.0).alias("s0"))).repartition("id")

    # dynamic-source edges, pre-partitioned AND pre-sorted by src so
    # the per-iteration sort-merge join reuses the cached layout (the
    # big side is never re-sorted or re-shuffled inside the loop).
    # pin_table (checkpoint + columnar persist, see checkpoint.py):
    # truncates the plan so a fat upstream derivation is analyzed once
    # instead of every superstep, while keeping the per-superstep scan
    # on the compressed-columnar cache.
    from linkgraph.checkpoint import pin_table, release_state

    edges_dyn = pin_table(
        edges_src_filtered.repartition("src").sortWithinPartitions("src")
    )
    n_dyn_edges = edges_dyn.count()
    dyn = pin_table(dyn)
    edges_pre.unpersist()
    if hot_key_salt == "auto":
        # skew probe: max in-degree vs MEAN OVER ALL NODES (edges/nodes
        # — per-target averages hide a hub when few targets exist)
        mx = (
            edges_dyn.groupBy("dst").agg(F.count("*").alias("c"))
            .agg(F.max("c").alias("mx"))
            .first()["mx"]
        ) or 0
        mean_indeg = n_dyn_edges / max(n_nodes, 1)
        hot_key_salt = 16 if mx > 32 * max(mean_indeg, 1.0) else 0
    t_load = time.time() - t0

    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="pagerank",
        termination=termination, max_steps=max_iter,
    )
    start_iter = 0
    ranks = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            start_iter, ranks = resumed
    if ranks is None:
        ranks = dyn.select("id", F.col("tp").alias("rank"))
        ranks = loop.advance(0, ranks, metrics={"init": 1.0 - d}, force_checkpoint=True)

    converged = False
    delta = None
    it = start_iter

    def _superstep(cur: DataFrame) -> DataFrame:
        contribs = edges_dyn.join(cur, edges_dyn.src == cur.id).select(
            edges_dyn.dst.alias("dst"), (F.col("rank") * F.col("share")).alias("c")
        )
        if hot_key_salt > 0:
            partial = contribs.withColumn(
                "_salt", F.pmod(F.hash("dst") + F.spark_partition_id(), F.lit(hot_key_salt))
            ).groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
            sums = partial.groupBy("dst").agg(F.sum("c").alias("s"))
        else:
            sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        return (
            dyn.join(sums, dyn.id == sums.dst, "left")
            .select(
                dyn.id.alias("id"),
                (
                    F.col("tp")
                    + F.lit(d) * (F.col("s0") + F.coalesce(F.col("s"), F.lit(0.0)))
                ).alias("rank"),
            )
        )

    t1 = time.time()
    for it in range(start_iter + 1, max_iter + 1):
        new_ranks = _superstep(ranks)
        if tol is not None:
            pre = new_ranks.persist()
            delta = (
                pre.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            delta = float(delta) if delta is not None else 0.0
            new_ranks = loop.advance(it, pre, metrics={"linf_delta": delta})
            if new_ranks is not pre:
                # advance truncated to a NEW DataFrame; free the
                # delta-probe cache or it leaks one copy per checkpoint
                pre.unpersist()
            if delta < tol:
                converged = True
                ranks = new_ranks
                break
        else:
            new_ranks = loop.advance(it, new_ranks)
        ranks = new_ranks

    scores = ranks
    if static_nodes is not None:
        # a static node's rank is pinned at its teleport value forever
        scores = ranks.union(
            _with_tp(static_nodes.select("id")).select("id", F.col("tp").alias("rank"))
        )
    if checkpoint_dir:
        # final durable state so a subsequent resume() sees completion
        # (distinct path: scores derive from the live iteration state)
        scores = loop.advance(it, scores, metrics={"final": True, "linf_delta": delta},
                              force_checkpoint=True, suffix="_final")
    t_compute = time.time() - t1
    l1_delta = None
    if report_delta and tol is None and it >= 1:
        # one extra UNTIMED superstep (outside compute_s): distance
        # between the final two iterates, for the bench convergence
        # extrapolation (see the report_delta docstring)
        row = (
            _superstep(ranks).alias("n")
            .join(ranks.alias("o"), "id")
            .agg(
                F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("mx"),
                F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("s1"),
            )
            .first()
        )
        delta = float(row["mx"] or 0.0)
        l1_delta = float(row["s1"] or 0.0)
    stats = {
        "nodes": n_nodes,
        "edges": n_edges,
        "dynamic_edges": n_dyn_edges,
        "iterations": it,
        "damping": d,
        "load_s": round(t_load, 4),
        "compute_s": round(t_compute, 4),
        "converged": converged,
        "linf_delta": delta,
        "l1_delta": l1_delta,
        "hot_key_salt": hot_key_salt,
        "personalized": srcs is not None,
        "static_folding": split_static,
    }
    base.unpersist()
    if targets is not None:
        targets.unpersist()
        dyn_base.unpersist()
    release_state(dyn)
    release_state(edges_dyn)
    return PageRankResult(scores=scores, iterations=it, converged=converged, delta=delta, stats=stats)
