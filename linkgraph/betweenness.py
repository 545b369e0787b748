"""Betweenness centrality — level-synchronous Brandes, batched sources.

Re-creates algo.betweenness[.stream] (SURVEY.md §2.2:
pub:algo/.../impl/BetweennessCentrality.java — exact Brandes 2001;
ParallelBetweennessCentrality fans sources across threads; the
RABrandesBetweennessCentrality lineage samples sources).

Spark shape: the per-source DFS/stack of Brandes becomes two
level-synchronous passes with state keyed (source, node) — every
source advances in the same superstep (the same batching idea as the
reference's parallel variant, but data-parallel instead of
thread-parallel):

  forward:  BFS levels; sigma(s,v) = number of shortest s->v paths,
            accumulated level-by-level (all predecessors of a level-d
            node sit at level d-1);
  backward: dependencies delta(s,v) = sum over successors w of
            sigma_v/sigma_w * (1 + delta_w), walked from the deepest
            level up; bc(v) = sum over sources of delta(s,v), v != s.

``sources`` samples the source set (RA-Brandes estimator): dependency
sums are RESCALED by n/|sources| so sampled scores are an unbiased
estimate of the exact values (``rescale=False`` returns the raw
partial sums). None = exact (every node a source) — O(n * reached)
state; above ``exact_warn_nodes`` nodes a warning is emitted because
exact all-sources mode cannot survive a 100x scale-up.
For direction BOTH each unordered pair is counted from both endpoints,
so scores are halved (the standard undirected convention).

Scale notes: state is (source, node) pairs — O(K * reached) rows for a
K-source batch; each forward level is unpersisted as soon as the
backward sweep consumes it, and superseded seen/delta/acc checkpoints
are freed as they are replaced, so peak cached state is O(K * reached)
rather than O(depth * K * reached).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state


@dataclass
class BetweennessResult:
    scores: DataFrame  # (id, centrality)
    max_depth: int
    stats: dict = field(default_factory=dict)


def betweenness_centrality(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sources: DataFrame | None = None,
    direction: str = "BOTH",
    max_depth: int = 64,
    rescale: bool = True,
    exact_warn_nodes: int = 100_000,
    batch_size: int | None = None,
    max_batches: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> BetweennessResult:
    """Exact / sampled Brandes betweenness (see module docstring).

    batch_size: process sources in deterministic hash batches of about
      this many, accumulating partial dependency sums between batches.
      Peak (source, node) state drops from O(|S| * reached) to
      O(batch * reached) — the constructive answer to exact mode's
      scale cliff — and with a ``checkpoint_dir`` every completed
      batch writes a durable manifest entry: ``resume=True`` re-enters
      at the first unfinished batch. ``max_batches`` stops early after
      that many batches this invocation (incremental operation: do a
      few batches now, resume later); the returned scores are then a
      RAW PARTIAL accumulation — with ``batches_done`` of ``n_batches``
      batches done their expectation is (batches_done/n_batches) x the
      full-source value (rescale applies to the full source count), so
      treat them as incomplete until every batch has run.

    Resuming validates the manifest against the current call: the
    recorded n_batches and a sources fingerprint (bit_xor of xxhash64
    ids) must match, because batches are defined by hashing sources
    modulo n_batches — a different batch_size or source set would remap
    sources across batches and silently double-count or skip them.
    """
    t0 = time.time()
    d = direction.upper()
    e = edges.select("src", "dst")
    if d == "BOTH":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif d == "INCOMING":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    e = e.filter(F.col("src") != F.col("dst")).distinct()
    # pin_table: constant per-superstep plan (linkgraph/checkpoint.py)
    e = pin_table(e.repartition("src").sortWithinPartitions("src"))
    e.count()

    universe = (
        nodes.select("id")
        if nodes is not None
        else e.select(F.col("src").alias("id")).union(e.select(F.col("dst").alias("id"))).distinct()
    ).persist()
    n_universe = universe.count()
    srcs = (sources.select("id") if sources is not None else universe)
    n_sources = srcs.count()
    if sources is None and n_universe > exact_warn_nodes:
        import warnings

        warnings.warn(
            f"exact betweenness over {n_universe} nodes makes every node a "
            "source (O(n*reached) state); pass sources= for the sampled "
            "RA-Brandes estimator at scale",
            stacklevel=2,
        )

    spark = edges.sparkSession
    if batch_size is not None and batch_size > 0:
        from linkgraph.checkpoint import SuperstepLoop
        import math

        n_batches = max(1, math.ceil(n_sources / batch_size))
        # order-independent fingerprint of the source set: batches are
        # srcs hashed mod n_batches, so accumulated per-batch sums are
        # only valid for THIS (sources, n_batches) pair
        src_fp = int(
            srcs.agg(F.expr("bit_xor(xxhash64(id))").alias("fp")).first()["fp"] or 0
        )
        loop = SuperstepLoop(
            spark, checkpoint_dir, every=1, name="betweenness",
            context={"n_batches": n_batches, "sources_fp": src_fp,
                     "n_sources": n_sources},
        )
        start_b = 0
        total = None
        depth = 0
        if resume:
            resumed = loop.resume()
            if resumed is not None:
                start_b, total = resumed
                depth = int(loop.last_metrics.get("max_depth", 0))
                rec = loop.last_context
                rec_nb = rec.get("n_batches", loop.last_metrics.get("n_batches"))
                if rec_nb is not None and int(rec_nb) != n_batches:
                    raise ValueError(
                        f"betweenness resume mismatch: checkpoint was written "
                        f"with n_batches={rec_nb} but batch_size={batch_size} "
                        f"over {n_sources} sources gives n_batches={n_batches}; "
                        "resuming would re-hash sources into different batches "
                        "(double-count/skip). Rerun with the original batch_size."
                    )
                rec_fp = rec.get("sources_fp")
                if rec_fp is not None and int(rec_fp) != src_fp:
                    raise ValueError(
                        "betweenness resume mismatch: the sources set differs "
                        f"from the checkpointed run (fingerprint {rec_fp} != "
                        f"{src_fp}); accumulated per-batch sums would mix "
                        "source sets. Rerun with the original sources."
                    )
        end_b = n_batches if max_batches is None else min(
            n_batches, start_b + max_batches
        )
        for b in range(start_b, end_b):
            batch = srcs.filter(
                F.pmod(F.xxhash64(F.col("id")), F.lit(n_batches)) == F.lit(b)
            )
            part, bdepth = _brandes_partial(spark, e, batch, max_depth)
            depth = max(depth, bdepth)
            nxt = (
                part
                if total is None
                else total.union(part).groupBy("id").agg(
                    F.sum("centrality").alias("centrality")
                )
            )
            total = loop.advance(
                b + 1, nxt,
                metrics={"batches_done": b + 1, "n_batches": n_batches,
                         "max_depth": depth},
            )
        bc = total if total is not None else spark.createDataFrame(
            [], "id long, centrality double"
        )
    else:
        bc, depth = _brandes_partial(spark, e, srcs, max_depth)

    scale = 0.5 if d == "BOTH" else 1.0
    if rescale and sources is not None and n_sources > 0:
        # RA-Brandes estimator: partial dependency sums over a sampled
        # source set scale by n/|sources| for an unbiased estimate
        scale *= float(n_universe) / float(n_sources)
    scores = (
        universe.join(bc, "id", "left")
        .select(
            "id",
            (F.lit(scale) * F.coalesce(F.col("centrality"), F.lit(0.0))).alias("centrality"),
        )
    )
    release_state(e)
    return BetweennessResult(
        scores=scores,
        max_depth=depth,
        stats={
            "sources": n_sources,
            "max_depth": depth,
            "direction": d,
            "elapsed_s": round(time.time() - t0, 4),
        },
    )


def _brandes_partial(
    spark, e: DataFrame, srcs: DataFrame, max_depth: int
) -> tuple[DataFrame, int]:
    """One data-parallel Brandes pass over a source set: forward BFS
    levels with path counts, backward dependency accumulation. Returns
    (partial bc sums DataFrame(id, centrality), max depth reached)."""
    # ---- forward: BFS levels with path counts
    lvl = srcs.select(
        F.col("id").alias("source"), F.col("id").alias("id"), F.lit(1.0).alias("sigma")
    ).persist()
    seen = lvl.select("source", "id").persist()
    levels = [lvl]
    depth = 0
    for depth in range(1, max_depth + 1):
        # localCheckpoint (eager) truncates lineage — a persist chain
        # keeps the whole logical plan alive and every action then
        # re-stringifies an O(depth^2) tree (driver CPU blowup);
        # release_state() frees the superseded checkpoint's blocks for
        # real (plain unpersist is a no-op on localCheckpoints)
        nxt = (
            e.join(levels[-1], e.src == levels[-1].id)
            .select("source", e.dst.alias("id"), "sigma")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            release_state(nxt)
            depth -= 1
            break
        prev_seen = seen
        seen = seen.union(nxt.select("source", "id")).localCheckpoint(eager=True)
        release_state(prev_seen)
        levels.append(nxt)
    release_state(seen)

    # ---- backward: dependency accumulation, deepest level first
    acc = None  # per-(source, v) dependencies across all levels
    deltas = levels[-1].select("source", "id", "sigma", F.lit(0.0).alias("delta"))
    for li in range(len(levels) - 2, -1, -1):
        lv = levels[li]
        down = deltas.select(
            "source", F.col("id").alias("w"),
            F.col("sigma").alias("sigma_w"), F.col("delta").alias("delta_w"),
        )
        contrib = (
            e.join(down, e.dst == down.w)
            .select("source", e.src.alias("id"),
                    ((F.lit(1.0) + F.col("delta_w")) / F.col("sigma_w")).alias("t"))
            .groupBy("source", "id")
            .agg(F.sum("t").alias("t"))
        )
        prev_deltas = deltas
        deltas = (
            lv.join(contrib, ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.col("sigma") * F.coalesce(F.col("t"), F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        if li < len(levels) - 2:  # the first prev_deltas is a plain view
            release_state(prev_deltas)
        # levels[li+1] fed this step's `down` — free it now instead of
        # pinning O(depth * reached) rows until the sweep ends
        release_state(levels[li + 1])
        part = deltas.filter(F.col("id") != F.col("source")).select("source", "id", "delta")
        prev_acc = acc
        # eager checkpoint either way: part references the current
        # deltas checkpoint, which the next iteration (or the final
        # cleanup) frees — acc must own its blocks by then
        acc = (part if acc is None else acc.union(part)).localCheckpoint(eager=True)
        if prev_acc is not None:
            release_state(prev_acc)
    if len(levels) > 1:
        release_state(deltas)
    release_state(levels[0])

    if acc is None:
        acc = spark.createDataFrame([], "source long, id long, delta double")
    bc = acc.groupBy("id").agg(F.sum("delta").alias("centrality"))
    return bc, depth


@dataclass
class EdgeBetweennessResult:
    scores: DataFrame  # (src, dst, centrality); canonical pairs when BOTH
    max_depth: int
    stats: dict = field(default_factory=dict)


def edge_betweenness(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    sources: DataFrame | None = None,
    direction: str = "BOTH",
    max_depth: int = 64,
    rescale: bool = True,
    exact_warn_nodes: int = 100_000,
) -> EdgeBetweennessResult:
    """Brandes edge betweenness — the Girvan–Newman edge score.

    Same two level-synchronous passes as :func:`betweenness_centrality`
    (module docstring), but the backward sweep credits the ARC (v, w)
    between consecutive BFS levels with sigma_v * (1 + delta_w) /
    sigma_w per source before node deltas are folded. For BOTH the two
    arc orientations collapse onto the canonical (min, max) pair and
    the standard 0.5 undirected scale applies; ``sources`` samples the
    source set with the same n/|S| unbiased rescale as the node
    estimator. Per-sweep arc credits are aggregated over sources
    immediately, so accumulated state is O(edges), not O(sources x
    edges).
    """
    t0 = time.time()
    d = direction.upper()
    e = edges.select("src", "dst")
    if d == "BOTH":
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif d == "INCOMING":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    e = e.filter(F.col("src") != F.col("dst")).distinct()
    e = pin_table(e.repartition("src").sortWithinPartitions("src"))
    e.count()
    spark = e.sparkSession

    universe = (
        nodes.select("id")
        if nodes is not None
        else e.select(F.col("src").alias("id")).union(
            e.select(F.col("dst").alias("id"))
        ).distinct()
    ).persist()
    n_universe = universe.count()
    srcs = sources.select("id") if sources is not None else universe
    n_sources = srcs.count()
    if sources is None and n_universe > exact_warn_nodes:
        import warnings

        warnings.warn(
            f"exact edge betweenness over {n_universe} nodes makes every "
            "node a source — pass sources= to sample (unbiased rescale)",
            stacklevel=2,
        )

    # ---- forward: identical BFS-with-sigma to _brandes_partial
    lvl = srcs.select(
        F.col("id").alias("source"), F.col("id").alias("id"), F.lit(1.0).alias("sigma")
    ).persist()
    seen = lvl.select("source", "id").persist()
    levels = [lvl]
    depth = 0
    for depth in range(1, max_depth + 1):
        nxt = (
            e.join(levels[-1], e.src == levels[-1].id)
            .select("source", e.dst.alias("id"), "sigma")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["source", "id"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            release_state(nxt)
            depth -= 1
            break
        prev_seen = seen
        seen = seen.union(nxt.select("source", "id")).localCheckpoint(eager=True)
        release_state(prev_seen)
        levels.append(nxt)
    release_state(seen)

    # ---- backward: node deltas as usual + per-arc credits
    eacc = None
    deltas = levels[-1].select("source", "id", "sigma", F.lit(0.0).alias("delta"))
    for li in range(len(levels) - 2, -1, -1):
        lv = levels[li]
        down = deltas.select(
            "source", F.col("id").alias("w"),
            F.col("sigma").alias("sigma_w"), F.col("delta").alias("delta_w"),
        )
        # arcs level li -> li+1 with the per-source credit term
        joined = (
            e.join(down, e.dst == down.w)
            .select(
                "source", e.src.alias("id"), F.col("w"),
                ((F.lit(1.0) + F.col("delta_w")) / F.col("sigma_w")).alias("t"),
            )
            .localCheckpoint(eager=True)
        )
        arc_part = (
            joined.join(lv.select("source", "id", "sigma"), ["source", "id"])
            .groupBy("id", "w")
            .agg(F.sum(F.col("sigma") * F.col("t")).alias("c"))
        )
        prev_eacc = eacc
        eacc = (
            arc_part if eacc is None else eacc.union(arc_part)
        ).localCheckpoint(eager=True)
        if prev_eacc is not None:
            release_state(prev_eacc)
        contrib = joined.groupBy("source", "id").agg(F.sum("t").alias("t"))
        prev_deltas = deltas
        deltas = (
            lv.join(contrib, ["source", "id"], "left")
            .select(
                "source", "id", "sigma",
                (F.col("sigma") * F.coalesce(F.col("t"), F.lit(0.0))).alias("delta"),
            )
            .localCheckpoint(eager=True)
        )
        release_state(joined)
        if li < len(levels) - 2:
            release_state(prev_deltas)
        release_state(levels[li + 1])
    if len(levels) > 1:
        release_state(deltas)
    release_state(levels[0])

    if eacc is None:
        eacc = spark.createDataFrame([], "id long, w long, c double")
    scale = 0.5 if d == "BOTH" else 1.0
    if rescale and sources is not None and n_sources > 0:
        scale *= float(n_universe) / float(n_sources)
    if d == "BOTH":
        out = (
            eacc.select(
                F.least("id", "w").alias("src"),
                F.greatest("id", "w").alias("dst"),
                "c",
            )
            .groupBy("src", "dst")
            .agg((F.lit(scale) * F.sum("c")).alias("centrality"))
        )
    else:
        arc = eacc if d == "OUTGOING" else eacc.select(
            F.col("w").alias("id"), F.col("id").alias("w"), "c"
        )
        out = arc.groupBy(
            F.col("id").alias("src"), F.col("w").alias("dst")
        ).agg((F.lit(scale) * F.sum("c")).alias("centrality"))
    release_state(e)
    universe.unpersist()
    return EdgeBetweennessResult(
        scores=out,
        max_depth=depth,
        stats={
            "sources": n_sources,
            "max_depth": depth,
            "direction": d,
            "elapsed_s": round(time.time() - t0, 4),
        },
    )


def girvan_newman_split(
    edges: DataFrame,
    k: int,
    direction: str = "BOTH",
    max_depth: int = 64,
) -> DataFrame:
    """One Girvan–Newman round: remove the ``k`` highest-betweenness
    edges, return the resulting communities (Girvan & Newman, PNAS
    2002 — the algorithm edge betweenness was invented for; the full
    iterative variant recomputes betweenness after every removal,
    which is inherently sequential, so the engine exposes the
    one-shot split and callers iterate at whatever granularity their
    budget allows).

    Ties break deterministically on (centrality DESC, src, dst) over
    the 6-decimal rounded scores — the cross-engine contract. Nodes
    isolated by the removal become singleton communities. Returns
    (id, comp) with min-id community labels.

    Girvan-Newman is defined on undirected graphs; only
    direction="BOTH" is supported (directed scores live on arcs, not
    on the canonical pairs the cut removes).
    """
    from linkgraph.components import connected_components

    if direction.upper() != "BOTH":
        raise ValueError(
            "girvan_newman_split supports direction='BOTH' only — "
            "directed edge-betweenness scores live on arcs, not on the "
            "canonical undirected pairs the cut removes"
        )
    eb = edge_betweenness(edges, direction=direction, max_depth=max_depth).scores
    top = (
        eb.select("src", "dst", F.round("centrality", 6).alias("c"))
        .orderBy(F.col("c").desc(), "src", "dst")
        .limit(k)
        .select("src", "dst")
    )
    und = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    remaining = und.join(top, ["src", "dst"], "left_anti")
    universe = und.select(F.col("src").alias("id")).union(
        und.select(F.col("dst").alias("id"))
    ).distinct()
    comps = connected_components(remaining).components
    return universe.join(comps, "id", "left").select(
        "id", F.coalesce("comp", "id").alias("comp")
    )
