"""Minimum spanning tree / forest — Borůvka rounds.

Re-creates algo.mst (pub:algo/.../impl/MSTPrim.java, SURVEY.md §2.2).
Prim's lazy priority queue is inherently sequential, so the engine
uses Borůvka (the MapReduce-friendly classic): every round each
component picks its minimum outgoing edge (deterministic tie-break on
(weight, src, dst)), the picked edges merge components, repeat until
no outgoing edges remain. O(log n) rounds; each round one min-aggregate
shuffle keyed by component + a component-graph contraction.

For connected graphs with distinct weights the MST is unique, so the
result matches Prim (the reference) edge-for-edge; with ties the
tie-break makes OUR output deterministic (documented deviation — the
reference inherits queue order).

Returns the forest for disconnected graphs (one tree per component).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, release_state
from linkgraph.components import connected_components


@dataclass
class MstResult:
    tree_edges: DataFrame  # (src, dst, weight) — canonical src < dst
    total_weight: float
    edge_count: int
    rounds: int
    stats: dict = field(default_factory=dict)


def minimum_spanning_forest(
    edges: DataFrame,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> MstResult:
    """Borůvka MST/MSF over an undirected weighted edge table.

    Checkpoints at BORŮVKA-ROUND boundaries: the durable state is one
    frame holding both the chosen tree edges (kind 'e': x=a, y=b, w)
    and the component assignment (kind 'c': x=id, y=comp); with a
    ``checkpoint_dir`` each completed round writes a manifest entry and
    ``resume=True`` re-enters at the first unfinished round (same
    contract as the other procedures — a killed-then-resumed run equals
    an uninterrupted one exactly, since round picks are deterministic).
    """
    spark = edges.sparkSession
    t0 = time.time()
    w = F.coalesce(F.col("weight"), F.lit(1.0))
    und = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))  # parallel edges: keep cheapest
        .persist()
    )
    und.count()

    graph_fp = None
    if checkpoint_dir:
        # order-independent fingerprint of the (deduped) weighted edge
        # set: round state is only valid against THIS graph — same
        # guard as betweenness/scc
        graph_fp = int(
            und.agg(
                F.expr("bit_xor(xxhash64(a, b, w))").alias("fp")
            ).first()["fp"] or 0
        )
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="mst",
        context={"graph_fp": graph_fp},
    )
    start_round = 0
    comp = None
    chosen = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec_fp = loop.last_context.get("graph_fp")
            if rec_fp is not None and graph_fp is not None and int(rec_fp) != graph_fp:
                raise ValueError(
                    "mst resume mismatch: the edge table differs from the "
                    f"checkpointed run (fingerprint {rec_fp} != {graph_fp}); "
                    "chosen edges and component state would mix graphs. "
                    "Rerun without resume or with the original edges."
                )
            start_round, state = resumed
            chosen = state.filter(F.col("kind") == "e").select(
                F.col("x").alias("a"), F.col("y").alias("b"), "w"
            ).localCheckpoint(eager=True)
            comp = state.filter(F.col("kind") == "c").select(
                F.col("x").alias("id"), F.col("y").alias("comp")
            ).localCheckpoint(eager=True)
    if comp is None:
        nodes = und.select(F.col("a").alias("id")).union(
            und.select(F.col("b").alias("id"))
        ).distinct()
        comp = nodes.select("id", F.col("id").alias("comp")).persist()
    rounds = start_round
    for rounds in range(start_round + 1, max_rounds + 1):
        ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("comp_a"))
        cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("comp_b"))
        labeled = (
            und.join(ca, "a").join(cb, "b")
            .filter(F.col("comp_a") != F.col("comp_b"))
        )
        if labeled.isEmpty():
            break
        # min outgoing edge per component (both sides), deterministic
        pick = F.struct("w", "a", "b", "comp_a", "comp_b")
        best = (
            labeled.select(F.col("comp_a").alias("c"), pick.alias("e"))
            .union(labeled.select(F.col("comp_b").alias("c"), pick.alias("e")))
            .groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.w", "e.a", "e.b", "e.comp_a", "e.comp_b")
            .dropDuplicates(["a", "b"])
            .persist()
        )
        prev_chosen = chosen
        chosen = best.select("a", "b", "w") if chosen is None else chosen.union(
            best.select("a", "b", "w")
        )
        chosen = chosen.localCheckpoint(eager=True)
        if prev_chosen is not None:
            release_state(prev_chosen)
        # contract: CC over the component graph of picked edges. The
        # comp graph has at most one edge per component; below the
        # broadcast-ish threshold a driver-side union-find beats a
        # distributed fixpoint by orders of magnitude (same size-gated
        # escape hatch as scc.py / Spark's broadcast joins).
        cg_rows = best.select(F.col("comp_a").alias("src"), F.col("comp_b").alias("dst"))
        n_cg = cg_rows.count()
        if n_cg <= 500_000:
            parent: dict = {}

            def find(x):
                r = x
                while parent.get(r, r) != r:
                    r = parent[r]
                while parent.get(x, x) != x:
                    parent[x], x = r, parent[x]
                return r

            pairs = cg_rows.collect()
            for row in pairs:
                ra, rb = find(row["src"]), find(row["dst"])
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            roots = {x: find(x) for x in set(parent)}
            mapping = spark.createDataFrame(
                [(k, v) for k, v in roots.items()], "comp long, newc long"
            )
            mapping = F.broadcast(mapping)
        else:
            cc = connected_components(cg_rows)
            mapping = cc.components.select(
                F.col("id").alias("comp"), F.col("comp").alias("newc")
            )
        comp2 = (
            comp.join(mapping, "comp", "left")
            .select("id", F.coalesce(F.col("newc"), F.col("comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        release_state(comp)
        comp = comp2
        best.unpersist()
        if checkpoint_dir and rounds % checkpoint_every == 0:
            # durable round boundary: chosen edges + comp assignment in
            # one frame (see docstring encoding). Only durable rounds —
            # chosen/comp are managed checkpoints already, so a
            # non-durable advance would materialize a throwaway copy.
            state = chosen.select(
                F.lit("e").alias("kind"), F.col("a").alias("x"),
                F.col("b").alias("y"), "w",
            ).union(comp.select(
                F.lit("c").alias("kind"), F.col("id").alias("x"),
                F.col("comp").alias("y"), F.lit(None).cast("double").alias("w"),
            ))
            loop.advance(
                rounds, state, metrics={"rounds": rounds}, force_checkpoint=True
            )

    if chosen is None:
        chosen = spark.createDataFrame([], "a long, b long, w double")
    tree = chosen.select(F.col("a").alias("src"), F.col("b").alias("dst"), F.col("w").alias("weight"))
    agg = tree.agg(F.sum("weight").alias("tw"), F.count("*").alias("n")).first()
    und.unpersist()
    release_state(comp)
    return MstResult(
        tree_edges=tree,
        total_weight=float(agg["tw"] or 0.0),
        edge_count=agg["n"],
        rounds=rounds,
        stats={"rounds": rounds, "elapsed_s": round(time.time() - t0, 4)},
    )


@dataclass
class KSpanningResult:
    assignment: DataFrame  # (id: long, cluster: long) — cluster = min id in cluster
    tree_edges: DataFrame  # the spanning tree/forest BEFORE the cut
    removed_edges: DataFrame  # the k-1 cut edges
    k: int
    mode: str
    stats: dict = field(default_factory=dict)


def k_spanning_tree(
    edges: DataFrame,
    k: int,
    mode: str = "kmin",
    start_node: int | None = None,
    max_rounds: int = 64,
) -> KSpanningResult:
    """algo.spanningTree.kmin / .kmax analog (pub:algo/.../impl/
    KSpanningTree.java, proc pub:algo/.../KSpanningTreeProc.java,
    SURVEY.md §2.2): build the minimum (kmin) / maximum (kmax)
    spanning tree, then CUT its k-1 costliest (kmin) / cheapest (kmax)
    edges, partitioning the nodes into k clusters (single-linkage
    k-clustering). Returns one cluster id per node (cluster = min
    member id, the engine's canonical component labeling).

    Determinism contract (what makes this exactly oracle-checkable):
    the forest builder compares edges by the STRICT TOTAL ORDER
    (weight, src, dst) — under a total order the minimum spanning
    forest is unique, so Borůvka here returns exactly the
    canonical-Kruskal forest, ties included. The cut removes the k-1
    tree edges that are lexicographically LARGEST (kmin) / smallest
    (kmax) in the same order. Both choices are deterministic, so the
    cluster assignment is value-exact against an independent SQL
    oracle (see __spark_entry__.oracle_sql 'kspanning_cosupplier').

    start_node: reference contract — restrict to the start node's
    component before cutting. None (engine extension) cuts the whole
    forest: the k-1 removals are global, yielding
    (#forest components) + k - 1 clusters.

    Scale notes: the cut is a TakeOrdered of k-1 rows (no global sort
    materialization, no single-task window) + a broadcast anti-join;
    everything else reuses the Borůvka forest and the delta-iteration
    connected-components paths.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if mode not in ("kmin", "kmax"):
        raise ValueError(f"mode must be 'kmin' or 'kmax', got {mode!r}")
    t0 = time.time()
    base = edges
    if mode == "kmax":
        w = F.coalesce(F.col("weight"), F.lit(1.0))
        base = edges.select("src", "dst", (-w).alias("weight"))
    if start_node is not None:
        res = minimum_spanning_tree(base, start_node, max_rounds=max_rounds)
    else:
        res = minimum_spanning_forest(base, max_rounds=max_rounds)
    tree = res.tree_edges
    if mode == "kmax":
        tree = tree.select("src", "dst", (-F.col("weight")).alias("weight"))
    tree = tree.persist()
    if mode == "kmin":
        order = [F.col("weight").desc(), F.col("src").desc(), F.col("dst").desc()]
    else:
        order = [F.col("weight").asc(), F.col("src").asc(), F.col("dst").asc()]
    removed = tree.orderBy(*order).limit(k - 1).persist()
    kept = tree.join(
        F.broadcast(removed.select("src", "dst")), ["src", "dst"], "left_anti"
    )
    nodes = (
        tree.select(F.col("src").alias("id"))
        .union(tree.select(F.col("dst").alias("id")))
        .distinct()
    )
    cc = connected_components(kept.select("src", "dst"), nodes=nodes)
    assignment = cc.components.select("id", F.col("comp").alias("cluster"))
    return KSpanningResult(
        assignment=assignment,
        tree_edges=tree,
        removed_edges=removed,
        k=k,
        mode=mode,
        stats={
            "boruvka_rounds": res.rounds,
            "cc_iterations": cc.iterations,
            "clusters": cc.set_count,
            "elapsed_s": round(time.time() - t0, 4),
        },
    )


def minimum_spanning_tree(
    edges: DataFrame, start_node: int, max_rounds: int = 64
) -> MstResult:
    """Reference algo.mst contract (pub:algo/.../impl/MSTPrim.java):
    Prim from a START NODE, streaming the tree's relationships — i.e.
    the spanning tree of the component containing ``start_node``.

    Computed as the Borůvka forest restricted to that component: for
    distinct weights this IS Prim's tree; with ties it is A minimum
    spanning tree of the same component with identical edge count and
    total weight (MST weight is tie-invariant), selected by the
    deterministic (weight, src, dst) tie-break.
    """
    res = minimum_spanning_forest(edges, max_rounds=max_rounds)
    tree = res.tree_edges.persist()
    cc = connected_components(tree).components
    comp_of_start = cc.filter(F.col("id") == int(start_node)).select("comp")
    members = cc.join(F.broadcast(comp_of_start), "comp").select("id")
    in_tree = tree.join(
        members.select(F.col("id").alias("src")), "src", "left_semi"
    ).persist()
    agg = in_tree.agg(F.sum("weight").alias("tw"), F.count("*").alias("n")).first()
    tree.unpersist()
    return MstResult(
        tree_edges=in_tree,
        total_weight=float(agg["tw"] or 0.0),
        edge_count=agg["n"],
        rounds=res.rounds,
        stats={**res.stats, "start_node": int(start_node)},
    )


@dataclass
class SteinerResult:
    backbone: DataFrame  # (t1, t2, dist) — MST edges of the terminal metric closure
    total_weight: float
    n_terminals: int
    stats: dict = field(default_factory=dict)


def steiner_backbone(
    edges: DataFrame,
    terminals: list[int],
    max_hops: int = 16,
    max_rounds: int = 64,
) -> SteinerResult:
    """Steiner-tree 2-approximation backbone (Kou-Markowsky-Berman,
    Acta Informatica 1981 — public result), steps 1-3 of KMB: compute
    terminal-to-all shortest distances, build the terminal METRIC
    CLOSURE, and take its minimum spanning tree. The returned backbone
    (t1, t2, dist) weighs <= 2·OPT of the true Steiner tree (the KMB
    bound holds already at this stage); expanding each backbone edge
    to its concrete path is the documented composition with
    `linkgraph.paths.shortest_path_pair` (pointer-doubling
    reconstruction), kept separate so the backbone stays a pure
    closed-form oracle-checkable artifact.

    Distances use the engine's batched multi-source relax
    (`ms_relax_distances`, direction=BOTH — Steiner is an undirected
    problem) bounded by ``max_hops`` (the exactness contract the SQL
    twin unrolls to; set it >= the graph's hop diameter for true
    distances). The closure MST reuses `minimum_spanning_forest`'s
    strict (weight, src, dst) total order, so ties are deterministic
    and the DuckDB twin (`steiner_backbone_sql`) reproduces the exact
    edge set.

    Float caveat (disclosed): path distances are left-associated
    float sums, reproduced term-by-term in the twin; on INTEGER-valued
    weights (this engine's co-occurrence counts) every sum is exact.

    Scale notes (100TB): one (source,id)-keyed relax batch for ALL
    terminals (state = Σ reach balls), a |T|²/2 closure (terminals are
    few by problem definition — gate wide T with a k-center pick of
    representatives first), and a Borůvka forest on the closure."""
    terminals = [int(t) for t in terminals]
    if len(terminals) < 2:
        raise ValueError(f"need >= 2 terminals, got {len(terminals)}")
    if len(set(terminals)) != len(terminals):
        raise ValueError("terminals must be distinct")
    from linkgraph.paths import ms_relax_distances

    spark = edges.sparkSession
    src_df = spark.createDataFrame([(t,) for t in terminals], "id long")
    dist = ms_relax_distances(
        edges, src_df, weighted=True, direction="BOTH", max_hops=max_hops
    )
    term_set = src_df.select(F.col("id").alias("t"))
    closure = (
        dist.join(F.broadcast(term_set), dist.id == term_set.t)
        .filter(F.col("source") < F.col("id"))
        .select(
            F.col("source").alias("src"), F.col("id").alias("dst"),
            F.col("dist").alias("weight"),
        )
    )
    forest = minimum_spanning_forest(closure, max_rounds=max_rounds)
    backbone = forest.tree_edges.select(
        F.col("src").alias("t1"), F.col("dst").alias("t2"),
        F.round(F.col("weight"), 6).alias("dist"),
    )
    return SteinerResult(
        backbone=backbone,
        total_weight=forest.total_weight,
        n_terminals=len(terminals),
        stats={
            "max_hops": max_hops,
            "boruvka_rounds": forest.rounds,
            "backbone_edges": forest.edge_count,
        },
    )


def steiner_backbone_sql(
    edges_sql: str, terminals: list[int], max_hops: int = 16
) -> str:
    """DuckDB twin of `steiner_backbone`: hop-unrolled multi-source
    relax (SAME left-associated dist+w sums as the engine), then
    canonical-Kruskal membership on the closure — an edge is in the
    unique (weight, src, dst)-ordered forest iff its endpoints are NOT
    connected by strictly smaller edges, tested by min-label
    propagation run simultaneously per candidate threshold."""
    tvals = ", ".join(f"({int(t)})" for t in terminals)
    n_t = len(terminals)
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS MATERIALIZED (
  SELECT src, dst, CAST(COALESCE(weight, 1.0) AS DOUBLE) AS w FROM e
  UNION ALL
  SELECT dst, src, CAST(COALESCE(weight, 1.0) AS DOUBLE) AS w FROM e)""",
        f"term AS (SELECT CAST(t AS BIGINT) AS t FROM (VALUES {tvals}) v(t))",
        "d0 AS MATERIALIZED (SELECT t AS s, t AS id, CAST(0 AS DOUBLE) AS dist FROM term)",
    ]
    for t in range(1, max_hops + 1):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT s, id, MIN(dist) AS dist FROM (
    SELECT s, id, dist FROM d{t - 1}
    UNION ALL
    SELECT p.s, sym.dst AS id, p.dist + sym.w AS dist
    FROM d{t - 1} p JOIN sym ON sym.src = p.id)
  GROUP BY s, id)"""
        )
    parts.append(
        f"""closure AS MATERIALIZED (
  SELECT d.s AS a, d.id AS b, d.dist AS w
  FROM d{max_hops} d JOIN term ON term.t = d.id WHERE d.s < d.id)"""
    )
    parts.append(
        """ordered AS MATERIALIZED (SELECT a, b, w,
  CAST(ROW_NUMBER() OVER (ORDER BY w, a, b) AS BIGINT) AS rk FROM closure)"""
    )
    # per-threshold simultaneous min-label propagation: lbl(rk, node)
    # over the subgraph of edges with rank < rk
    parts.append(
        """nodes AS (SELECT DISTINCT x AS node FROM (
  SELECT a AS x FROM closure UNION ALL SELECT b FROM closure))"""
    )
    parts.append(
        "l0 AS MATERIALIZED (SELECT o.rk, n.node, n.node AS lbl "
        "FROM ordered o CROSS JOIN nodes n)"
    )
    for t in range(1, n_t + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
  SELECT rk, node, MIN(lbl) AS lbl FROM (
    SELECT rk, node, lbl FROM l{t - 1}
    UNION ALL
    SELECT p.rk, s.b AS node, p.lbl
    FROM l{t - 1} p JOIN ordered s ON s.rk < p.rk AND s.a = p.node
    UNION ALL
    SELECT p.rk, s.a AS node, p.lbl
    FROM l{t - 1} p JOIN ordered s ON s.rk < p.rk AND s.b = p.node)
  GROUP BY rk, node)"""
        )
    parts.append(
        f"""member AS (SELECT o.a, o.b, o.w FROM ordered o
  JOIN l{n_t} la ON la.rk = o.rk AND la.node = o.a
  JOIN l{n_t} lb ON lb.rk = o.rk AND lb.node = o.b
  WHERE la.lbl <> lb.lbl)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT a AS t1, b AS t2, ROUND(w, 6) AS dist FROM member"""
    )
