"""Strongly connected components — trim + forward-backward coloring.

Re-creates the reference SCC procedures (SURVEY.md §2.2:
pub:algo/.../impl/SCCTarjan.java, SCCIterativeTarjan.java,
ForwardBackwardScc.java, impl/multistep/MultistepSCC.java). Tarjan's
DFS stack cannot exist across executors; the engine implements the
multistep scheme the reference's own MultistepSCC uses (trim + FW-BW
coloring), which is the standard distributed SCC:

  repeat until no active nodes:
    1. TRIM: active nodes with no active in-edges or no active
       out-edges are singleton SCCs — peel repeatedly (kills chains
       and DAG tails in bulk).
    2. COLOR: propagate min node id FORWARD along active edges to
       fixpoint -> color(v) = min id that reaches v (within active).
    3. PIVOT SWEEP: every node p with color(p) = p is a pivot. The SCC
       of p = {v : color(v) = p and v reaches p backward within its
       color class}. Found by backward BFS from all pivots at once,
       restricted to edges whose endpoints share a color.
    4. Assign scc = p for those, deactivate, loop.

Output component ids are canonical (min member id), so parity with the
reference's arbitrary Tarjan root ids holds under canonical relabeling
(same rule as connected components, BASELINE.md).

Scale notes: every phase is joins + min-aggregates over the active
edge set; each outer round removes >= all current pivot classes, and
trim handles the long-tail structure that makes naive coloring O(n)
rounds on chains.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state


@dataclass
class SccResult:
    components: DataFrame  # (id, scc) — scc = min member id
    set_count: int
    rounds: int
    stats: dict = field(default_factory=dict)


def _fixpoint_min_prop(nodes: DataFrame, edges: DataFrame, max_iter: int = 10_000) -> DataFrame:
    """color(v) = min over {v} ∪ {color(u) : u -> v} to fixpoint."""
    labels = nodes.select("id", F.col("id").alias("c")).persist()
    prev = labels.agg(F.sum("c")).first()[0] or 0
    for _ in range(max_iter):
        prop = edges.join(labels, edges.src == labels.id).select(
            edges.dst.alias("id"), "c"
        )
        new = (
            labels.select("id", "c").union(prop)
            .groupBy("id").agg(F.min("c").alias("c"))
            .localCheckpoint(eager=True)
        )
        cur = new.agg(F.sum("c")).first()[0] or 0
        release_state(labels)
        labels = new
        if cur == prev:
            break
        prev = cur
    return labels


def _tarjan_local(edge_rows, node_ids) -> dict[int, int]:
    """Iterative Tarjan on driver-collected residuals (no recursion).

    SCC ids canonicalized to min member id — identical contract to the
    distributed path."""
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d in edge_rows:
        adj[s].append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = 0
    for root in node_ids:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on.add(v)
            recurse = False
            nbrs = adj.get(v, ())
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on:
                    low[v] = min(low[v], index[w])
            if not recurse:
                if low[v] == index[v]:
                    comp = []
                    while True:
                        w = stack.pop()
                        on.discard(w)
                        comp.append(w)
                        if w == v:
                            break
                    m = min(comp)
                    for w in comp:
                        out[w] = m
                if work:
                    parent = work[-1][0]
                    low[parent] = min(low[parent], low[v])
    return out


def strongly_connected_components(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    max_rounds: int = 100,
    local_threshold: int = 500_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> SccResult:
    """SCC over a DIRECTED edge table (src, dst). Returns (id, scc).

    local_threshold: when the ACTIVE residual drops to at most this
    many edges, the remainder is collected and finished with in-driver
    iterative Tarjan — the same size-based escape hatch as Spark's
    broadcast-join threshold. The outer distributed rounds are
    O(residual DAG depth) Spark jobs; deep tails are exactly the
    regime where a sub-broadcast-size residual should not pay per-layer
    job latency. Set 0 to force the fully distributed path (tests do).

    Checkpoints at OUTER-ROUND boundaries (trim/color/sweep inner loops
    are transient): the durable state is one frame of (id, scc) where
    scc NULL marks a still-active node; ``resume=True`` re-enters at
    the first unfinished round with the accumulated assignments and
    the shrunken active set (same contract as the other procedures).
    """
    spark = edges.sparkSession
    t0 = time.time()
    e_all = pin_table(edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct())
    graph_fp = None
    if checkpoint_dir:
        # order-independent edge-set fingerprint: per-round state is
        # only valid against THIS graph (resuming over different edges
        # would silently mix assignments — same guard as betweenness)
        graph_fp = int(
            e_all.agg(
                F.expr("bit_xor(xxhash64(src, dst))").alias("fp")
            ).first()["fp"] or 0
        )
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="scc",
        context={"graph_fp": graph_fp},
    )
    start_round = 0
    active = None
    assigned = spark.createDataFrame([], "id long, scc long")
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec_fp = loop.last_context.get("graph_fp")
            if rec_fp is not None and graph_fp is not None and int(rec_fp) != graph_fp:
                raise ValueError(
                    "scc resume mismatch: the edge table differs from the "
                    f"checkpointed run (fingerprint {rec_fp} != {graph_fp}); "
                    "per-round assignments would mix graphs. Rerun without "
                    "resume or with the original edges."
                )
            start_round, state = resumed
            assigned = state.filter(F.col("scc").isNotNull()).select(
                "id", "scc"
            ).localCheckpoint(eager=True)
            active = state.filter(F.col("scc").isNull()).select("id").persist()
            active.count()
    if active is None:
        if nodes is not None:
            active = nodes.select("id")
        else:
            active = e_all.select(F.col("src").alias("id")).union(
                e_all.select(F.col("dst").alias("id"))
            ).distinct()
        active = active.persist()

    rounds = start_round
    for rounds in range(start_round + 1, max_rounds + 1):
        # restrict edges to active nodes
        e = (
            e_all.join(active.select(F.col("id").alias("src")), "src", "left_semi")
            .join(active.select(F.col("id").alias("dst")), "dst", "left_semi")
            .persist()
        )
        if local_threshold and e.count() <= local_threshold:
            # finish the (small) residual in-driver: iterative Tarjan
            edge_rows = [(r["src"], r["dst"]) for r in e.collect()]
            node_ids = [r["id"] for r in active.collect()]
            local = _tarjan_local(edge_rows, node_ids)
            if local:
                local_df = spark.createDataFrame(
                    [(k, v) for k, v in local.items()], "id long, scc long"
                )
                prev_assigned = assigned
                assigned = assigned.union(local_df).localCheckpoint(eager=True)
                release_state(prev_assigned)
            e.unpersist()
            break
        # 1. TRIM singleton SCCs (no active in- or out-edges), repeatedly
        while True:
            has_out = e.select(F.col("src").alias("id")).distinct()
            has_in = e.select(F.col("dst").alias("id")).distinct()
            trivial = active.join(has_out, "id", "left_anti").union(
                active.join(has_in, "id", "left_anti")
            ).distinct().persist()
            n_triv = trivial.count()
            if n_triv == 0:
                trivial.unpersist()
                break
            prev_assigned = assigned
            assigned = assigned.union(
                trivial.select("id", F.col("id").alias("scc"))
            ).localCheckpoint(eager=True)
            release_state(prev_assigned)
            active2 = active.join(trivial, "id", "left_anti").persist()
            active2.count()  # materialize before trivial/old active go away
            active.unpersist()
            active = active2
            e2 = (
                e.join(active.select(F.col("id").alias("src")), "src", "left_semi")
                .join(active.select(F.col("id").alias("dst")), "dst", "left_semi")
                .persist()
            )
            e.unpersist()
            e = e2
            trivial.unpersist()
        if active.isEmpty():
            e.unpersist()
            break
        # 2. forward min-id coloring to fixpoint
        colors = _fixpoint_min_prop(active, e)
        # 3. backward sweep from pivots within color classes
        ec = (
            e.join(colors.select(F.col("id").alias("src"), F.col("c").alias("c_src")), "src")
            .join(colors.select(F.col("id").alias("dst"), F.col("c").alias("c_dst")), "dst")
            .filter(F.col("c_src") == F.col("c_dst"))
            .select("src", "dst")
            .persist()
        )
        member = colors.filter(F.col("id") == F.col("c")).select("id", "c").persist()
        frontier = member
        while True:
            # backward: u -> v with v already a member of SCC(c) pulls u in
            # ec keeps only same-color edges, so the pulled-in node's
            # color equals the pivot class c by construction
            step = (
                ec.join(frontier.select(F.col("id").alias("dst"), "c"), "dst")
                .select(F.col("src").alias("id"), "c")
                .distinct()
                .join(member, "id", "left_anti")
                .persist()
            )
            if step.isEmpty():
                step.unpersist()
                break
            prev_member = member
            member = member.union(step).localCheckpoint(eager=True)
            if prev_member is not frontier:
                release_state(prev_member)
            if frontier is not None:
                frontier.unpersist()
            frontier = step
        prev_assigned = assigned
        assigned = assigned.union(
            member.select("id", F.col("c").alias("scc"))
        ).localCheckpoint(eager=True)
        release_state(prev_assigned)
        active2 = active.join(member, "id", "left_anti").persist()
        active2.count()  # materialize before member/colors are freed
        active.unpersist()
        active = active2
        e.unpersist()
        ec.unpersist()
        release_state(member)
        release_state(colors)
        if checkpoint_dir and rounds % checkpoint_every == 0:
            # durable round boundary: assigned UNION active-as-null in
            # one frame (scc NULL = still active next round). Only
            # called on durable rounds — assigned/active are managed
            # checkpoints already, so a non-durable advance would just
            # materialize a throwaway copy of the state.
            state = assigned.union(
                active.select("id", F.lit(None).cast("long").alias("scc"))
            )
            loop.advance(
                rounds, state, metrics={"rounds": rounds}, force_checkpoint=True
            )
        if active.isEmpty():
            break

    comps = assigned
    set_count = comps.select("scc").distinct().count()
    release_state(e_all)
    active.unpersist()
    return SccResult(
        components=comps,
        set_count=set_count,
        rounds=rounds,
        stats={"setCount": set_count, "rounds": rounds,
               "elapsed_s": round(time.time() - t0, 4)},
    )
