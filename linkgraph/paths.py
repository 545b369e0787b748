"""Shortest-path family: SSSP, delta-stepping, multi-source BFS,
closeness centrality, all-pairs stream.

Re-creates the reference procedures (SURVEY.md §2.2):
  * algo.shortestPath / .deltaStepping —
    pub:algo/.../impl/ShortestPathDijkstra.java,
    ShortestPathDeltaStepping.java: non-negative weighted SSSP.
  * algo.allShortestPaths.stream — pub:algo/.../impl/AllShortestPaths.java:
    (source, target, distance) stream, parallel per-source.
  * algo.closeness — pub:algo/.../impl/MSClosenessCentrality.java:
    closeness(u) = (n-1) / farness(u), farness = sum of BFS hop
    distances to reachable nodes (multi-source BFS,
    pub:core/.../core/utils/msbfs/MultiSourceBFS.java).

A priority queue cannot exist across executors, so Dijkstra becomes a
Bellman-Ford relax loop (each superstep relaxes every edge out of the
frontier — join + min-aggregate), and delta-stepping becomes the same
loop restricted to the current distance bucket [k*delta, (k+1)*delta).
Both converge to Dijkstra's fixpoint for non-negative weights.

``max_hops`` bounds relax rounds: dist(v) is then the shortest distance
using <= max_hops edges — a well-defined contract shared with the
DuckDB recursive oracle (which cannot express unbounded fixpoints over
cyclic graphs).

Scale notes: frontier-only relaxation (only improved nodes rejoin),
edges hash-partitioned by src once; multi-source state is keyed
(source, node) so a K-source batch is one DataFrame — K tunes the
shuffle-volume / rounds tradeoff exactly like the reference's
64-sources-per-word MS-BFS batching.
"""

from __future__ import annotations

import time
import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state

_REVERSE = {"OUTGOING": "INCOMING", "INCOMING": "OUTGOING", "BOTH": "BOTH"}


def _warn_all_sources(n_nodes: int, what: str) -> None:
    """Shared exact-mode gate (same contract as betweenness's
    exact_warn_nodes): all-sources multi-source state is O(n * reached)
    rows, which cannot survive a 100x scale-up; the warning points the
    caller at the sampled estimator."""
    warnings.warn(
        f"exact {what} over {n_nodes} nodes makes every node a source "
        "(O(n*reached) multi-source state); pass sources= for the "
        "sampled estimator at scale",
        stacklevel=3,
    )


def _universe(edges: DataFrame) -> DataFrame:
    e = edges.select("src", "dst")
    return (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )


@dataclass
class SsspResult:
    distances: DataFrame  # (id, dist)
    iterations: int
    stats: dict = field(default_factory=dict)


def _prep_edges(edges: DataFrame, weighted: bool, direction: str) -> DataFrame:
    w = (
        F.coalesce(F.col("weight"), F.lit(1.0))
        if weighted and "weight" in edges.columns
        else F.lit(1.0)
    )
    e = edges.select("src", "dst", w.alias("w"))
    d = direction.upper()
    if d == "OUTGOING":
        return e
    if d == "INCOMING":
        return e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    if d == "BOTH":
        return e.union(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    raise ValueError(f"bad direction {direction}")


def sssp(
    edges: DataFrame,
    source: int,
    weighted: bool = True,
    direction: str = "OUTGOING",
    max_hops: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> SsspResult:
    """Single-source shortest distances (Bellman-Ford relax loop).

    Returns (id, dist) for REACHED nodes only. Non-negative weights
    assumed (same contract as the reference Dijkstra). With
    ``max_hops`` the result is the <=max_hops-edge shortest distance.
    The relaxation state (id, dist, improved) lives in a SuperstepLoop
    — the frontier is the improved rows, same shape as WCC's delta
    iteration — so with a ``checkpoint_dir`` the run writes durable
    manifests and ``resume=True`` continues from the last one (same
    contract as ``pagerank(resume=True)``).
    """
    spark = edges.sparkSession
    t0 = time.time()
    # pin_table: constant per-superstep plan (linkgraph/checkpoint.py)
    e = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    e.count()
    limit = max_hops if max_hops is not None else 1 << 30
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="sssp",
        max_steps=max_hops,
    )
    start_iter = 0
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            start_iter, state = resumed
    if state is None:
        state = spark.createDataFrame(
            [(int(source), 0.0, True)], "id long, dist double, improved boolean"
        )
        state = loop.advance(0, state, force_checkpoint=bool(checkpoint_dir))
    it = start_iter
    while it < limit:
        it += 1
        frontier = state.filter("improved").select("id", "dist")
        relaxed = (
            e.join(frontier, e.src == frontier.id)
            .select(e.dst.alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            state.select("id", "dist").join(relaxed, "id", "full")
            .select(
                "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.coalesce(F.col("nd"), F.lit(float("inf"))) < F.col("dist"))
                ).alias("improved"),
            )
        )
        state = loop.advance(it, merged, metrics={"hop": it})
        n_front = state.filter("improved").count()
        if n_front == 0:
            break
    release_state(e)
    return SsspResult(
        distances=state.select("id", "dist"),
        iterations=it,
        stats={"iterations": it, "elapsed_s": round(time.time() - t0, 4)},
    )


def sssp_delta_stepping(
    edges: DataFrame,
    source: int,
    delta: float = 2.0,
    weighted: bool = True,
    direction: str = "OUTGOING",
    max_buckets: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> SsspResult:
    """Delta-stepping SSSP: settle nodes bucket by bucket
    ([k*delta, (k+1)*delta)), relaxing only from the current bucket.
    Same fixpoint as sssp(); fewer total relaxations on weighted
    graphs with spread-out distances.

    Checkpoints at BUCKET boundaries (the natural durable granularity
    — the inner fixpoint loop is transient): with a ``checkpoint_dir``
    each settled bucket writes a manifest entry whose metrics carry
    the settled bound (``checkpoint_every`` default 1 = every bucket;
    raise it to trade resume granularity for fewer parquet writes),
    and ``resume=True`` re-enters at the first unsettled bucket (the
    superstep df state is the distance table; the scalar control state
    rides in the manifest metrics). Resume validates the recorded
    ``settled_below`` against ``start_k * delta`` recomputed from the
    caller's ``delta`` — resuming with a different delta would misplace
    the settled bound and yield wrong distances, so it raises instead.
    """
    spark = edges.sparkSession
    t0 = time.time()
    # pin_table: constant per-superstep plan (linkgraph/checkpoint.py)
    e = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    e.count()
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="sssp_delta",
        context={"delta": delta},
    )
    start_k = 0
    dist = None
    rounds = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            start_k, dist = resumed
            rounds = int(loop.last_metrics.get("rounds", 0))
            rec_sb = loop.last_metrics.get("settled_below")
            if rec_sb is not None and abs(float(rec_sb) - start_k * delta) > 1e-9 * max(
                1.0, abs(float(rec_sb))
            ):
                raise ValueError(
                    f"sssp_delta_stepping resume mismatch: checkpoint bucket "
                    f"{start_k} was settled below {rec_sb} but the current "
                    f"delta={delta} puts bucket {start_k} at "
                    f"{start_k * delta}; resuming with a different delta "
                    "misplaces the settled bound. Rerun with the original "
                    f"delta={loop.last_context.get('delta', float(rec_sb) / start_k)}."
                )
    if dist is None:
        dist = spark.createDataFrame(
            [(int(source), 0.0)], "id long, dist double"
        ).persist()
        if checkpoint_dir:
            dist = loop.advance(0, dist, force_checkpoint=True)
    settled_below = start_k * delta
    for _k in range(start_k, max_buckets):
        bucket = dist.filter(
            (F.col("dist") >= settled_below) & (F.col("dist") < settled_below + delta)
        ).persist()
        # inner loop: relax within the bucket to fixpoint (light edges
        # can re-enter the same bucket)
        frontier = bucket
        while True:
            rounds += 1
            relaxed = (
                e.join(frontier, e.src == frontier.id)
                .select(e.dst.alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
                .groupBy("id")
                .agg(F.min("nd").alias("nd"))
            )
            merged = (
                dist.join(relaxed, "id", "full")
                .select(
                    "id",
                    F.least(
                        F.coalesce(F.col("dist"), F.lit(float("inf"))),
                        F.coalesce(F.col("nd"), F.lit(float("inf"))),
                    ).alias("dist"),
                    (
                        F.col("dist").isNull()
                        | (F.coalesce(F.col("nd"), F.lit(float("inf"))) < F.col("dist"))
                    ).alias("improved"),
                )
                .persist()
            )
            improved_in_bucket = merged.filter(
                F.col("improved") & (F.col("dist") < settled_below + delta)
            ).select("id", "dist").persist()
            n_in = improved_in_bucket.count()
            old, dist = dist, merged.select("id", "dist").localCheckpoint(eager=True)
            merged.unpersist()
            release_state(old)
            if frontier is not bucket:
                frontier.unpersist()
            frontier = improved_in_bucket
            if n_in == 0:
                break
        if frontier is not bucket:
            frontier.unpersist()
        bucket.unpersist()
        settled_below += delta
        if checkpoint_dir:
            # durable bucket boundary: df state = distances, scalar
            # control state (settled bound, relax-round count) in the
            # manifest metrics for resume
            dist = loop.advance(
                _k + 1, dist,
                metrics={"settled_below": settled_below, "rounds": rounds},
            )
        remaining = dist.filter(F.col("dist") >= settled_below).count()
        if remaining == 0:
            break
    release_state(e)
    return SsspResult(
        distances=dist,
        iterations=rounds,
        stats={"relax_rounds": rounds, "delta": delta,
               "elapsed_s": round(time.time() - t0, 4)},
    )


def _relax_round(e: DataFrame, state: DataFrame) -> DataFrame:
    """One Bellman-Ford relax round with predecessor tracking over a
    (id, dist, pred, improved) state: the improved set is the frontier;
    pred chosen by min (dist, pred) — deterministic among equal-cost
    paths. Returns the new eagerly-checkpointed state."""
    dist = state.select("id", "dist", "pred")
    frontier = state.filter("improved").select("id", "dist")
    relaxed = (
        e.join(frontier, e.src == frontier.id)
        .select(
            e.dst.alias("id"),
            (F.col("dist") + F.col("w")).alias("nd"),
            frontier.id.alias("npred"),
        )
        .groupBy("id")
        .agg(F.min(F.struct(F.col("nd"), F.col("npred"))).alias("m"))
        .select("id", F.col("m.nd").alias("nd"), F.col("m.npred").alias("npred"))
    )
    return (
        dist.join(relaxed, "id", "full")
        .select(
            "id",
            F.when(
                F.col("dist").isNull()
                | (F.coalesce(F.col("nd"), F.lit(float("inf"))) < F.col("dist")),
                F.struct(F.col("nd").alias("dist"), F.col("npred").alias("pred"),
                         F.lit(True).alias("improved")),
            ).otherwise(
                F.struct(F.col("dist"), F.col("pred"), F.lit(False).alias("improved"))
            ).alias("s"),
        )
        .select("id", "s.dist", "s.pred", "s.improved")
        .localCheckpoint(eager=True)
    )


def shortest_path_pair(
    edges: DataFrame,
    source: int,
    target: int,
    weighted: bool = True,
    direction: str = "OUTGOING",
    max_hops: int | None = None,
    bidirectional: bool = True,
):
    """Single-PAIR shortest path — the reference algo.shortestPath
    contract (pub:algo/.../impl/ShortestPathDijkstra.java takes a start
    AND an end node and streams the path's (nodeId, cost) rows).

    Default is BIDIRECTIONAL search: relax rounds alternate from the
    source (forward, along ``direction``) and the target (backward,
    along reversed edges), maintaining the best meeting value
    mu = min over v of df(v) + db(v). Termination: stop when
    mu <= minf + minb, where minf/minb are the minimum distances on the
    current forward/backward frontiers — every FUTURE forward
    assignment costs >= minf (nonneg weights: new dist = frontier dist
    + w), so any undiscovered s->t path costs >= minf + minb >= mu and
    mu is exact (the node-meet form suffices because every improved
    node relaxes its out-edges the following round, so for the
    boundary edge (u, w) of a hypothetically-cheaper path, u's final
    relaxation has already bounded df(w); classic bidirectional
    Dijkstra bound adapted to level-synchronous relaxation). On a
    length-L path each side explores radius ~L/2: ~L/2 + 1 rounds of
    Spark jobs instead of L (verified by the round-count test).
    Requires nonnegative weights (as does Dijkstra, the reference
    algorithm).

    ``bidirectional=False`` or ``max_hops`` runs the plain forward SSSP
    relax loop (max_hops is an exact <=k-edge bound on the forward
    metric, which the bidirectional split does not preserve).

    Path reconstruction is pointer-doubling on the predecessor chains
    (O(log L) rounds of n-row joins — a 1,000-hop path cost 1,000 jobs
    in the per-hop walk). Returns (path DataFrame(step, id, cost),
    total_cost) — path empty when target is unreachable.
    """
    spark = edges.sparkSession
    if int(source) == int(target):
        return (
            spark.createDataFrame([(0, int(source), 0.0)], "step long, id long, cost double"),
            0.0,
        )
    if bidirectional and max_hops is None:
        return _pair_bidirectional(edges, source, target, weighted, direction)
    # pin_table: constant per-superstep plan (linkgraph/checkpoint.py)
    e = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    e.count()
    state = spark.createDataFrame(
        [(int(source), 0.0, None, True)],
        "id long, dist double, pred long, improved boolean",
    ).localCheckpoint(eager=True)
    limit = max_hops if max_hops is not None else 1 << 30
    it = 0
    while it < limit:
        it += 1
        merged = _relax_round(e, state)
        n_front = merged.filter("improved").count()
        release_state(state)
        state = merged
        if n_front == 0:
            break
    release_state(e)
    dist = state.select("id", "dist", "pred")
    rows, total, _rounds = _reconstruct_path(dist, target)
    release_state(state)
    if rows is None:  # target unreachable
        return spark.createDataFrame([], "step long, id long, cost double"), None
    return spark.createDataFrame(rows, "step long, id long, cost double"), total


def _pair_bidirectional(
    edges: DataFrame, source: int, target: int, weighted: bool, direction: str
):
    """Bidirectional relax search (see shortest_path_pair docstring).
    Exposes round counts in the function attribute ``last_stats`` for
    the round-count test."""
    spark = edges.sparkSession
    ef = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    ef.count()
    # backward edges: reverse of the DIRECTED relax table (for BOTH the
    # symmetrized table is its own reverse, but swapping is still
    # correct and keeps one code path)
    eb = pin_table(
        ef.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        .repartition("src")
    )
    eb.count()
    sf = spark.createDataFrame(
        [(int(source), 0.0, None, True)],
        "id long, dist double, pred long, improved boolean",
    ).localCheckpoint(eager=True)
    sb = spark.createDataFrame(
        [(int(target), 0.0, None, True)],
        "id long, dist double, pred long, improved boolean",
    ).localCheckpoint(eager=True)
    inf = float("inf")
    minf = minb = 0.0
    rounds_f = rounds_b = 0
    mu, meet = inf, None
    while True:
        probe = other = None
        if minf <= minb and minf < inf:
            nxt = _relax_round(ef, sf)
            rounds_f += 1
            release_state(sf)
            sf = nxt
            agg = sf.filter("improved").agg(
                F.count("*").alias("n"), F.min("dist").alias("m")
            ).first()
            minf = float(agg["m"]) if agg["n"] else inf
            probe, other = sf, sb
        elif minb < inf:
            nxt = _relax_round(eb, sb)
            rounds_b += 1
            release_state(sb)
            sb = nxt
            agg = sb.filter("improved").agg(
                F.count("*").alias("n"), F.min("dist").alias("m")
            ).first()
            minb = float(agg["m"]) if agg["n"] else inf
            probe, other = sb, sf
        if probe is None:  # both sides converged
            break
        # incremental meet check: mu = min over v of df(v) + db(v) can
        # only improve through a node whose df or db JUST changed, so
        # probing the (small) improved frontier of the side that just
        # relaxed against the other side's dist maintains mu exactly —
        # never a full dist_f x dist_b join per round
        m = (
            probe.filter("improved").select("id", F.col("dist").alias("da"))
            .join(other.select("id", F.col("dist").alias("db")), "id")
            .select(F.struct((F.col("da") + F.col("db")).alias("s"), "id").alias("m"))
            .agg(F.min("m").alias("m"))
            .first()["m"]
        )
        if m is not None and float(m["s"]) < mu:
            mu, meet = float(m["s"]), int(m["id"])
        if mu <= minf + minb:
            break
    _pair_bidirectional.last_stats = {
        "rounds_forward": rounds_f, "rounds_backward": rounds_b,
        "rounds_total": rounds_f + rounds_b,
    }
    release_state(ef)
    release_state(eb)
    if meet is None:
        release_state(sf)
        release_state(sb)
        return spark.createDataFrame([], "step long, id long, cost double"), None
    rows_f, _tf, _ = _reconstruct_path(sf.select("id", "dist", "pred"), meet)
    rows_b, _tb, _ = _reconstruct_path(sb.select("id", "dist", "pred"), meet)
    release_state(sf)
    release_state(sb)
    # rows_f: source -> meet with cost = df; rows_b: target -> meet in
    # the backward orientation with cost = db — stitch meet..target by
    # reversing rows_b and re-basing its costs at mu - db(v)
    k = rows_f[-1][0]
    out = list(rows_f)
    jb = rows_b[-1][0]
    for step_b, vid, db in rows_b:
        if vid == meet:
            continue
        out.append((k + (jb - step_b), vid, round(mu - db, 12)))
    out.sort()
    return spark.createDataFrame(out, "step long, id long, cost double"), mu


def _reconstruct_path(dist: DataFrame, target: int):
    """Extract the pred-chain target -> ... -> source from a
    (id, dist, pred) table by POINTER DOUBLING: round k holds a jump
    table mapping every node to its 2^(k-1)-th predecessor; applying
    it to the known path-node set doubles the covered suffix each
    round, so a length-L path needs ceil(log2(L+1)) + 1 rounds (each a
    bounded number of n-row joins) — never one Spark job per hop. The
    pred chain is a tree walk, so every covered node's edge-offset
    from the target (``back``) is unique; the min-aggregate is pure
    dedup.

    Returns (rows [(step, id, cost)...] ordered source -> target,
    total_cost, rounds) — (None, None, rounds) when the target has no
    distance row. The final collect is O(path length) rows only.
    """
    spark = dist.sparkSession
    trow = dist.filter(F.col("id") == target).select("dist").first()
    if trow is None:
        return None, None, 0
    total = float(trow["dist"])
    links = (
        dist.select(F.col("id").alias("jid"), F.col("pred").alias("janc"))
        .filter(F.col("janc").isNotNull())
        .localCheckpoint(eager=True)
    )
    jump = links
    step = 1
    path_set = spark.createDataFrame(
        [(int(target), 0)], "id long, back long"
    ).localCheckpoint(eager=True)
    n_known = 1
    rounds = 0
    while True:
        rounds += 1
        ext = path_set.join(jump, path_set["id"] == jump["jid"]).select(
            F.col("janc").alias("id"), (F.col("back") + F.lit(step)).alias("back")
        )
        grown = (
            path_set.unionByName(ext)
            .groupBy("id")
            .agg(F.min("back").alias("back"))
            .localCheckpoint(eager=True)
        )
        n_new = grown.count()
        release_state(path_set)
        path_set = grown
        if n_new == n_known:
            break
        n_known = n_new
        doubled = (
            jump.alias("a")
            .join(jump.alias("b"), F.col("a.janc") == F.col("b.jid"))
            .select(F.col("a.jid").alias("jid"), F.col("b.janc").alias("janc"))
            .localCheckpoint(eager=True)
        )
        if jump is not links:
            release_state(jump)
        jump = doubled
        step *= 2
    out = path_set.join(dist.select("id", "dist"), "id").select("id", "back", "dist").collect()
    if jump is not links:
        release_state(jump)
    release_state(links)
    release_state(path_set)
    total_steps = max(r["back"] for r in out)
    rows = sorted(
        ((int(total_steps - r["back"]), int(r["id"]), float(r["dist"])) for r in out),
    )
    return rows, total, rounds


# ------------------------------------------- multi-source weighted relax

def ms_relax_distances(
    edges: DataFrame,
    sources: DataFrame,
    weighted: bool = True,
    direction: str = "OUTGOING",
    max_hops: int | None = None,
) -> DataFrame:
    """Batched multi-source Bellman-Ford: state keyed (source, id) so
    every source relaxes in the SAME superstep — one Spark job per
    round for the whole source batch instead of |sources| sequential
    sssp() runs (the weighted analog of ms_bfs_distances; same batching
    idea as the reference MultiSourceBFS, SURVEY.md §2.2).

    Returns (source, id, dist) for reached pairs. With ``max_hops`` the
    result is the <=max_hops-edge shortest distance (oracle contract).
    """
    # pin_table: constant per-superstep plan (linkgraph/checkpoint.py)
    e = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    e.count()
    state = sources.select(
        F.col("id").alias("source"), F.col("id").alias("id"), F.lit(0.0).alias("dist")
    ).localCheckpoint(eager=True)  # checkpointed (source,id,dist) owner
    dist = state
    frontier = state
    limit = max_hops if max_hops is not None else 1 << 30
    it = 0
    while it < limit:
        it += 1
        relaxed = (
            e.join(frontier, e.src == frontier.id)
            .select("source", e.dst.alias("id"), (F.col("dist") + F.col("w")).alias("nd"))
            .groupBy("source", "id")
            .agg(F.min("nd").alias("nd"))
        )
        merged = (
            dist.join(relaxed, ["source", "id"], "full")
            .select(
                "source", "id",
                F.least(
                    F.coalesce(F.col("dist"), F.lit(float("inf"))),
                    F.coalesce(F.col("nd"), F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.coalesce(F.col("nd"), F.lit(float("inf"))) < F.col("dist"))
                ).alias("improved"),
            )
            .localCheckpoint(eager=True)
        )
        new_frontier = merged.filter("improved").select("source", "id", "dist")
        n_front = new_frontier.count()
        release_state(state)  # superseded checkpoint (frontier/dist derived from it)
        state = merged
        dist = merged.select("source", "id", "dist")
        frontier = new_frontier
        if n_front == 0:
            break
    release_state(e)
    return dist


# ----------------------------------------------------- multi-source BFS

def ms_bfs_distances(
    edges: DataFrame,
    sources: DataFrame | None = None,
    direction: str = "OUTGOING",
    max_hops: int = 64,
) -> DataFrame:
    """Unweighted BFS hop distances from every source node.

    Returns (source, id, dist) for reached pairs (dist 0 for the
    source itself). ``sources``: DataFrame(id) — default: all nodes.
    The Spark analog of the reference MS-BFS: state keyed
    (source, node), every source advances in the same superstep.
    """
    e = _prep_edges(edges, weighted=False, direction=direction).select("src", "dst")
    e = pin_table(e.repartition("src"))
    e.count()
    if sources is None:
        sources = (
            e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
    dist = sources.select(
        F.col("id").alias("source"), F.col("id").alias("id"), F.lit(0).alias("dist")
    ).persist()
    frontier = dist
    for hop in range(1, max_hops + 1):
        cand = (
            e.join(frontier, e.src == frontier.id)
            .select("source", e.dst.alias("id"), (F.col("dist") + 1).alias("dist"))
            .distinct()
        )
        # anti-join against already-reached (source, id) pairs
        new_frontier = cand.join(
            dist.select("source", "id"), ["source", "id"], "left_anti"
        ).groupBy("source", "id").agg(F.min("dist").alias("dist")).persist()
        n = new_frontier.count()
        if n == 0:
            new_frontier.unpersist()
            break
        dist = dist.union(new_frontier).localCheckpoint(eager=True)
        frontier.unpersist()
        frontier = new_frontier
    release_state(e)
    return dist


def closeness_centrality(
    edges: DataFrame,
    direction: str = "BOTH",
    max_hops: int = 64,
    sources: DataFrame | None = None,
    exact_warn_nodes: int = 100_000,
    wf: bool = False,
) -> DataFrame:
    """Closeness = (n - 1) / farness(u), farness = sum of hop distances
    to reachable nodes; 0.0 for isolated/unreachable-everything nodes
    (reference MSClosenessCentrality contract).

    ``wf=True`` switches to the Wasserman-Faust improved formula the
    reference exposes as ``improved``:

        C_WF(u) = (reached / (n - 1)) * (reached / farness)

    which scales raw closeness by the reachable-fraction so scores
    stay comparable ACROSS components of a disconnected graph (a node
    reaching 3 nodes at distance 1 no longer outranks one reaching
    3000 at distance 2). Identical association order on both engines:
    reached^2 / ((n - 1) * farness). Exact mode only — the sampled
    estimator's ``reached`` is a raw sampled-source count, so scaling
    by it would estimate a different quantity.

    ``sources=None`` is EXACT mode — every node a BFS source, O(n *
    reached) multi-source state; above ``exact_warn_nodes`` nodes a
    warning is emitted (the same gate as betweenness) because exact
    all-sources mode cannot survive a 100x scale-up.

    ``sources=DataFrame(id)`` is the SAMPLED estimator (Eppstein-Wang):
    BFS runs only from the sampled set, REVERSED so dist(s_bfs, u) ==
    dist(u -> s) in the requested direction, and

        farness_hat(u) = (n / |S|) * sum_{s in S} dist(u, s)

    which is unbiased for a uniform sample (the d(u,u)=0 self term
    contributes 0, so no exclusion correction is needed). closeness is
    (n-1)/farness_hat as in exact mode; with S = all nodes the
    estimator reduces to the exact values. ``reached`` in sampled mode
    is the RAW count of sampled sources at dist > 0 (not scaled).

    Returns (id, farness, reached, closeness) for EVERY node of the
    graph in both modes."""
    if wf and sources is not None:
        raise ValueError(
            "wf=True (Wasserman-Faust) is exact-mode only: the sampled "
            "estimator's `reached` is a raw sampled count, not the "
            "reachable-set size the WF correction needs."
        )
    if sources is None:
        d = ms_bfs_distances(edges, direction=direction, max_hops=max_hops)
        nodes = d.select(F.col("source").alias("id")).distinct()
        n = nodes.count()
        if n > exact_warn_nodes:
            _warn_all_sources(n, "closeness")
        agg = d.groupBy(F.col("source").alias("id")).agg(
            F.sum("dist").cast("double").alias("farness"),
            (F.count("*") - 1).alias("reached"),
        )
        if wf:
            score = F.when(
                F.col("farness") > 0,
                (F.col("reached").cast("double") * F.col("reached").cast("double"))
                / (F.lit(float(n - 1)) * F.col("farness")),
            ).otherwise(F.lit(0.0))
        else:
            score = F.when(
                F.col("farness") > 0, F.lit(float(n - 1)) / F.col("farness")
            ).otherwise(F.lit(0.0))
        return agg.select("id", "farness", "reached", score.alias("closeness"))
    universe = _universe(edges)
    n = universe.count()
    n_s = sources.select("id").distinct().count()
    rev = _REVERSE[direction.upper()]
    d = ms_bfs_distances(
        edges, sources=sources.select("id"), direction=rev, max_hops=max_hops
    )
    scale = float(n) / float(max(n_s, 1))
    agg = d.groupBy("id").agg(
        (F.lit(scale) * F.sum("dist").cast("double")).alias("farness"),
        F.count(F.when(F.col("dist") > 0, 1)).alias("reached"),
    )
    return universe.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col("farness"), F.lit(0.0)).alias("farness"),
        F.coalesce(F.col("reached"), F.lit(0)).alias("reached"),
        F.when(
            F.coalesce(F.col("farness"), F.lit(0.0)) > 0,
            F.lit(float(n - 1)) / F.col("farness"),
        ).otherwise(F.lit(0.0)).alias("closeness"),
    )


def harmonic_centrality(
    edges: DataFrame,
    direction: str = "BOTH",
    max_hops: int = 64,
    sources: DataFrame | None = None,
    exact_warn_nodes: int = 100_000,
) -> DataFrame:
    """Harmonic centrality: h(u) = sum over reachable v != u of
    1 / dist(u, v) — the reference lineage's harmonic variant of
    closeness (algo.closeness.harmonic; Marchiori-Latora). Unlike
    closeness it is well-defined on DISCONNECTED graphs (unreachable
    nodes contribute 0 rather than poisoning the farness sum), which is
    why the lineage added it.

    ``sources=None`` is EXACT mode (every node a source; warned above
    ``exact_warn_nodes`` — the betweenness gate). ``sources`` switches
    to the sampled estimator: with g(u,v) = 1/dist(u,v) for reachable
    v != u else 0, h(u) = sum_v g(u,v) over ALL n nodes (the v = u term
    is naturally 0), so

        h_hat(u) = (n / |S|) * sum_{s in S} g(u, s)

    is unbiased for a uniform sample with no exclusion correction; BFS
    runs from the sampled set over the REVERSED direction so distances
    measure u -> s. ``reached`` in sampled mode is the raw count of
    sampled sources at dist > 0.

    Returns (id, reached, harmonic, normalized) where normalized =
    harmonic / (n - 1), for EVERY node in both modes. Shares the
    batched MS-BFS with closeness — one (source, node)-keyed frontier
    job per hop level for ALL sources; no per-source driver loop.
    """
    if sources is None:
        d = ms_bfs_distances(edges, direction=direction, max_hops=max_hops)
        nodes = d.select(F.col("source").alias("id")).distinct()
        n = nodes.count()
        if n > exact_warn_nodes:
            _warn_all_sources(n, "harmonic centrality")
        agg = d.filter(F.col("dist") > 0).groupBy(F.col("source").alias("id")).agg(
            F.count("*").alias("reached"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
        )
        nodes_out, scale = nodes, 1.0
    else:
        nodes_out = _universe(edges)
        n = nodes_out.count()
        n_s = sources.select("id").distinct().count()
        rev = _REVERSE[direction.upper()]
        d = ms_bfs_distances(
            edges, sources=sources.select("id"), direction=rev, max_hops=max_hops
        )
        scale = float(n) / float(max(n_s, 1))
        agg = d.filter(F.col("dist") > 0).groupBy("id").agg(
            F.count("*").alias("reached"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
        )
    return (
        nodes_out.join(agg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("reached"), F.lit(0)).alias("reached"),
            (F.lit(scale) * F.coalesce(F.col("harmonic"), F.lit(0.0))).alias("harmonic"),
            (
                F.lit(scale) * F.coalesce(F.col("harmonic"), F.lit(0.0))
                / F.lit(float(max(n - 1, 1)))
            ).alias("normalized"),
        )
    )


def dangalchev_centrality(
    edges: DataFrame,
    direction: str = "BOTH",
    max_hops: int = 32,
    exact_warn_nodes: int = 100_000,
) -> DataFrame:
    """Dangalchev closeness — the reference's third closeness variant
    (``algo.closeness.dangalchev``, pub:algo/.../impl/
    DangalchevClosenessCentrality.java; SURVEY.md §2.2 closeness
    lineage): c(u) = sum over reachable v != u of 2^(-dist(u, v)).
    Like harmonic it is defined on disconnected graphs (unreachable
    nodes contribute 0), and it additionally dampens far nodes
    geometrically rather than hyperbolically.

    EXACTNESS: every term is the dyadic rational 1 / (1 << dist)
    (exact integer shift, exact double division), and a sum of <= 2^53
    such terms with dist <= ~40 is exactly representable — so the
    unordered SUM is order-independent and the SQL oracle needs no
    float tolerance at all, unlike the 1/dist harmonic sum.

    Returns (id, reached, dangalchev) for every node. Shares the
    batched MS-BFS (one frontier job per hop level for all sources).
    """
    if max_hops > 62:
        # 1 << dist wraps the signed-64 domain at 63 (Spark) and errors
        # in DuckDB; contributions past 2^-62 are < 2.2e-19 anyway, so
        # the exact dyadic contract just refuses the degenerate range
        raise ValueError(f"max_hops must be <= 62 (2^-d exactness domain), got {max_hops}")
    d = ms_bfs_distances(edges, direction=direction, max_hops=max_hops)
    nodes = d.select(F.col("source").alias("id")).distinct()
    n = nodes.count()
    if n > exact_warn_nodes:
        _warn_all_sources(n, "Dangalchev closeness")
    term = F.lit(1.0) / F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.col("dist").cast("int")
    )
    agg = d.filter(F.col("dist") > 0).groupBy(F.col("source").alias("id")).agg(
        F.count("*").alias("reached"),
        F.sum(term).alias("dangalchev"),
    )
    return nodes.join(agg, "id", "left").select(
        "id",
        F.coalesce(F.col("reached"), F.lit(0)).alias("reached"),
        F.coalesce(F.col("dangalchev"), F.lit(0.0)).alias("dangalchev"),
    )


def all_shortest_paths_stream(
    edges: DataFrame,
    sources: DataFrame | None = None,
    weighted: bool = False,
    direction: str = "OUTGOING",
    max_hops: int = 64,
    exact_warn_nodes: int = 100_000,
) -> DataFrame:
    """algo.allShortestPaths.stream analog: (source, target, distance)
    rows. Unweighted uses the MS-BFS batch; weighted uses the batched
    multi-source relax (one Spark job per round for ALL sources — the
    K-source state is (source, id, dist) rows, never a per-source
    driver loop).

    ``sources=None`` streams ALL-pairs — O(n * reached) state; above
    ``exact_warn_nodes`` nodes a warning is emitted (the shared
    betweenness/closeness gate): at scale pass a sampled ``sources``
    set and the stream is restricted to those source rows."""
    if sources is None:
        sources = _universe(edges)
        n = sources.count()
        if n > exact_warn_nodes:
            _warn_all_sources(
                n, f"all-pairs shortest paths (weighted={weighted})"
            )
    if not weighted:
        return ms_bfs_distances(edges, sources, direction, max_hops).select(
            "source", F.col("id").alias("target"), F.col("dist").cast("double").alias("distance")
        ).filter(F.col("source") != F.col("target"))
    d = ms_relax_distances(
        edges, sources, weighted=True, direction=direction, max_hops=max_hops
    )
    return d.select(
        "source", F.col("id").alias("target"), F.col("dist").alias("distance")
    ).filter(F.col("source") != F.col("target"))


def landmark_index(
    edges: DataFrame,
    landmarks: DataFrame,
    direction: str = "BOTH",
    max_hops: int = 64,
) -> DataFrame:
    """Landmark (a.k.a. pivot / sketch) distance index: BFS hop
    distances between every node and every landmark, in both travel
    orientations (Potamias et al. 2009, CIKM — the standard
    shortest-path-QUERY answer at scales where per-query BFS is
    unaffordable).

    Returns (landmark, id, d_to, d_from): d_to = dist(id -> landmark),
    d_from = dist(landmark -> id) under ``direction`` (equal when
    BOTH); rows exist only where at least one orientation reaches.

    Scale shape: 2 MS-BFS sweeps (1 when undirected) keyed
    (landmark, node) — |L| simultaneous sources per superstep, never
    a per-landmark driver loop; the index is |V| x |L| rows, the
    queryable artifact `landmark_estimate` joins against. Choose |L|
    ~ tens for web-scale graphs (the paper's regime).
    """
    lm = landmarks.select("id").distinct()
    fwd = ms_bfs_distances(
        edges, sources=lm, direction=direction, max_hops=max_hops
    ).select(F.col("source").alias("landmark"), "id", F.col("dist").alias("d_from"))
    if direction.upper() == "BOTH":
        return fwd.select("landmark", "id", F.col("d_from").alias("d_to"), "d_from")
    rev = ms_bfs_distances(
        edges, sources=lm, direction=_REVERSE[direction.upper()], max_hops=max_hops
    ).select(F.col("source").alias("landmark"), "id", F.col("dist").alias("d_to"))
    return fwd.join(rev, ["landmark", "id"], "full").select(
        "landmark", "id", "d_to", "d_from"
    )


def landmark_estimate(index: DataFrame, pairs: DataFrame) -> DataFrame:
    """Distance UPPER BOUNDS for (src, dst) query pairs from a
    `landmark_index`:  d_hat(s, t) = min over landmarks l of
    d_to(s, l) + d_from(l, t)  — an admissible estimate (triangle
    inequality; exact whenever some shortest s-t path crosses a
    landmark). Pairs with no landmark reaching both sides emit no row.

    Returns (src, dst, d_est, via) with `via` the smallest landmark
    id attaining the bound (deterministic tie-break). Two hash joins
    of the query table against the index keyed by node, then one
    min-aggregate per pair — each query costs O(|L|) rows, NOT a BFS.
    """
    s_side = index.select(
        F.col("id").alias("src"), "landmark", F.col("d_to").alias("ds")
    ).filter(F.col("d_to").isNotNull())
    t_side = index.select(
        F.col("id").alias("dst"), "landmark", F.col("d_from").alias("dt")
    ).filter(F.col("d_from").isNotNull())
    joined = (
        pairs.select("src", "dst")
        .join(s_side, "src")
        .join(t_side, ["dst", "landmark"])
        .select("src", "dst", "landmark", (F.col("ds") + F.col("dt")).alias("d"))
    )
    return joined.groupBy("src", "dst").agg(
        F.min("d").cast("long").alias("d_est"),
        F.min_by("landmark", F.struct(F.col("d"), F.col("landmark")))
        .cast("long")
        .alias("via"),
    )


def landmark_estimate_sql(
    edges_sql: str,
    landmarks_where: str,
    pairs_sql: str,
    max_hops: int = 64,
) -> str:
    """Oracle for landmark_index + landmark_estimate over an
    undirected (BOTH) graph: recursive BFS from the landmark set,
    then the same min-plus join. ``landmarks_where`` filters the node
    universe; ``pairs_sql`` yields (src, dst)."""
    return f"""
WITH RECURSIVE
e AS ({edges_sql}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
lms AS (SELECT id FROM nodes WHERE {landmarks_where}),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM lms
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.id WHERE b.dist < {max_hops}
),
idx AS (SELECT source AS landmark, id, MIN(dist) AS d FROM bfs GROUP BY 1, 2),
pairs AS ({pairs_sql}),
joined AS (SELECT p.src, p.dst, si.landmark, si.d + ti.d AS d
           FROM pairs p
           JOIN idx si ON si.id = p.src
           JOIN idx ti ON ti.id = p.dst AND ti.landmark = si.landmark)
SELECT src, dst, CAST(MIN(d) AS BIGINT) AS d_est,
       CAST(FIRST(landmark ORDER BY d, landmark) AS BIGINT) AS via
FROM joined GROUP BY src, dst
"""


def eccentricity(
    edges: DataFrame,
    direction: str = "BOTH",
    max_hops: int = 64,
    exact_warn_nodes: int = 100_000,
) -> DataFrame:
    """Exact hop eccentricity per node: ecc(u) = max over reachable
    v of dist(u, v) — the exact companion to the HyperBall
    effective-diameter ESTIMATE (`linkgraph/anf.py`). All-sources
    MS-BFS state is O(n * reached), so the betweenness
    exact-mode warning gate applies; at scale use the sketch path.

    Returns (id, ecc, reached) for every node with at least one
    reachable peer (isolated nodes never enter the BFS universe).
    Integer maxes/counts — the oracle needs no float tolerance.
    """
    d = ms_bfs_distances(edges, direction=direction, max_hops=max_hops)
    n = d.select("source").distinct().count()
    if n > exact_warn_nodes:
        _warn_all_sources(n, "eccentricity")
    return d.groupBy(F.col("source").alias("id")).agg(
        F.max("dist").cast("long").alias("ecc"),
        (F.count("*") - 1).cast("long").alias("reached"),
    )


def graph_diameter(
    edges: DataFrame, direction: str = "BOTH", max_hops: int = 64
) -> DataFrame:
    """ONE row (diameter, radius, n_peripheral, n_central) from the
    exact eccentricity table: diameter = max ecc, radius = min ecc
    over nodes that reach anyone, plus the peripheral/central node
    counts (ecc == diameter / ecc == radius). On a disconnected
    graph these are per-component values folded by max/min — the
    standard convention for the hop metric. Same O(n * reached)
    exact-mode caveat as `eccentricity`."""
    ecc = eccentricity(edges, direction=direction, max_hops=max_hops)
    agg = ecc.agg(
        F.max("ecc").alias("diameter"), F.min("ecc").alias("radius")
    )
    return (
        ecc.crossJoin(F.broadcast(agg))
        .agg(
            F.first("diameter").alias("diameter"),
            F.first("radius").alias("radius"),
            F.sum(F.when(F.col("ecc") == F.col("diameter"), 1).otherwise(0))
            .cast("long")
            .alias("n_peripheral"),
            F.sum(F.when(F.col("ecc") == F.col("radius"), 1).otherwise(0))
            .cast("long")
            .alias("n_central"),
        )
    )


def eccentricity_sql(edges_sql: str, max_hops: int = 64) -> str:
    """Oracle for `eccentricity` (BOTH direction)."""
    return f"""
WITH RECURSIVE
e AS ({edges_sql}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.id WHERE b.dist < {max_hops}
),
best AS (SELECT source, id, MIN(dist) AS dist FROM bfs GROUP BY source, id)
SELECT source AS id, CAST(MAX(dist) AS BIGINT) AS ecc,
       CAST(COUNT(*) - 1 AS BIGINT) AS reached
FROM best GROUP BY source
"""


def graph_diameter_sql(edges_sql: str, max_hops: int = 64) -> str:
    """Oracle for `graph_diameter` (BOTH direction)."""
    return f"""
WITH ecc AS ({eccentricity_sql(edges_sql, max_hops)})
SELECT MAX(ecc) AS diameter, MIN(ecc) AS radius,
       CAST(SUM(CASE WHEN ecc = (SELECT MAX(ecc) FROM ecc) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_peripheral,
       CAST(SUM(CASE WHEN ecc = (SELECT MIN(ecc) FROM ecc) THEN 1 ELSE 0 END) AS BIGINT)
         AS n_central
FROM ecc
"""


def ifub_diameter(
    edges: DataFrame, max_hops: int = 64
) -> DataFrame:
    """Exact diameter by iFUB (Crescenzi, Grossi, Habib, Lanzi,
    Marino — "On computing the diameter of real-world undirected
    graphs", TCS 2013; public result): a double sweep picks a
    high-eccentricity root, then fringe levels are processed top-down
    — eccentricities of the level-i nodes (ONE batched MS-BFS per
    level) raise the lower bound until lb ≥ 2(i-1) proves no deeper
    node can beat it. On real small-world graphs this terminates
    after a handful of levels, so the cost is a few BFS waves instead
    of `graph_diameter`'s all-sources MS-BFS — the scale path for the
    same exact number (the driver checks it against the ALL-pairs
    eccentricity oracle, an algorithmically independent derivation).

    Undirected (the iFUB setting; edges are symmetrized) and defined
    on the double-sweep root's component — for disconnected graphs
    fold per component or use ``graph_diameter``. Deterministic root
    picks: max degree then farthest, ties → smaller id. Returns ONE
    row (diameter,) — deliberately just the number the independent
    all-pairs oracle can check.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    spark = edges.sparkSession
    deg = sym.groupBy("src").agg(F.count("*").alias("d"))
    r0 = deg.orderBy(F.desc("d"), F.asc("src")).limit(1).first()
    if r0 is None:
        raise ValueError("ifub_diameter: empty edge table")
    root = int(r0["src"])
    lev_r = ms_bfs_distances(
        sym, sources=spark.createDataFrame([(root,)], "id long"),
        direction="OUTGOING", max_hops=max_hops,
    )
    a_row = lev_r.orderBy(F.desc("dist"), F.asc("id")).limit(1).first()
    a = int(a_row["id"])
    lev_a = ms_bfs_distances(
        sym, sources=spark.createDataFrame([(a,)], "id long"),
        direction="OUTGOING", max_hops=max_hops,
    ).persist()
    ecc_a = int(lev_a.agg(F.max("dist").alias("m")).first()["m"])
    lb = ecc_a
    i = ecc_a
    while i > lb / 2:
        fringe = lev_a.filter(F.col("dist") == i).select("id")
        if not fringe.isEmpty():
            ecc_i = (
                ms_bfs_distances(sym, sources=fringe,
                                 direction="OUTGOING", max_hops=max_hops)
                .groupBy("source").agg(F.max("dist").alias("ecc"))
                .agg(F.max("ecc").alias("m")).first()["m"]
            )
            lb = max(lb, int(ecc_i))
        if lb >= 2 * (i - 1):
            break
        i -= 1
    lev_a.unpersist()
    return spark.createDataFrame([(lb,)], "diameter long")
