"""Goal-directed (A*) and k-shortest (Yen) path search.

Closes the last two procedures of the reference's shortest-path family
(SURVEY.md §2 covers the rest): `algo.shortestPath.astar.stream`
(pub:algo/src/main/java/org/neo4j/graphalgo/ShortestPathProc.java#astar
+ pub:algo/.../impl/ShortestPathAStar.java [M]) and
`algo.kShortestPaths.stream` (pub:algo/.../KShortestPathsProc.java +
pub:algo/.../impl/yens/YensKShortestPaths.java [M]; Yen 1971,
"Finding the k shortest loopless paths in a network" — public result).
See SURVEY.md §0 for the `pub:` citation convention.

Design notes:

* ``astar_path`` — the reference runs priority-queue A* with a
  geographic haversine heuristic; a synchronous distributed engine has
  no global priority queue, so the Spark-first shape is **pruned
  level-synchronous relaxation** (branch-and-bound): run the same
  Bellman-Ford relax rounds as shortest_path_pair, maintain
  mu = best complete s->t cost seen (the target's current label), and
  silence every frontier label with dist(v) + h(v) >= mu. With an
  ADMISSIBLE h (h(v) <= true dist(v, target), h(target) = 0) the prune
  is exact: a path through v's current label costs
  >= dist(v) + h(v) >= mu, so it can never beat the recorded path —
  and if v later receives a cheaper label, the relax re-raises its
  improved flag and the prune is re-evaluated. Equal costs prune too
  (>= mu): ties cannot IMPROVE mu, and the recorded pred chain already
  realizes a mu-cost path. The heuristic arrives as a (id, h)
  DataFrame (broadcast-joined per round — it is a per-node scalar,
  small by construction); rows missing from it default to h = 0, which
  is always admissible. ``check_heuristic=True`` verifies consistency
  (h(u) <= w + h(v) on every edge, h(target) = 0) in one aggregate
  and raises otherwise — consistency implies admissibility.

* ``yen_k_shortest`` — top-k loopless paths by total weight. Yen's
  algorithm is inherently sequential in k (each accepted path spawns
  deviation searches), so the DRIVER orchestrates: per spur node one
  distributed single-pair SSSP runs on a filtered edge view (root
  nodes and previously-used deviation edges excluded with inline
  predicates — no materialized copies). Paths themselves are tiny
  (<= max_hops rows) and live on the driver; the graph never does.
  Scale: k * avg_path_len SSSP runs, each a full distributed job —
  the right trade for "few expensive exact paths over a huge graph"
  (the reference's Yen is likewise a per-spur Dijkstra loop, ours just
  distributes each Dijkstra). Requires strictly positive weights
  (zero-weight edges can cycle a predecessor chain, and the loopless
  guarantee leans on them).

Cross-engine exactness: every path cost is recomputed CANONICALLY on
the driver as the left-associated sum of its edge weights in path
order — the same IEEE addition order a SQL recursive-CTE enumerator
uses when it accumulates ``cost + w`` while extending a path — so
costs are bit-identical to the DuckDB oracle even for float weights.
Ranking ties break on the node sequence (tuple order = SQL list
order), so the (rank, cost) stream is fully deterministic.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state
from linkgraph.paths import _prep_edges, _reconstruct_path, _relax_round


@dataclass
class AStarResult:
    path: DataFrame  # (step long, id long, cost double)
    total_cost: float | None
    rounds: int
    stats: dict = field(default_factory=dict)


def astar_path(
    edges: DataFrame,
    source: int,
    target: int,
    heuristic: DataFrame | None = None,
    weighted: bool = True,
    direction: str = "OUTGOING",
    check_heuristic: bool = False,
) -> AStarResult:
    """Exact s->t shortest path with admissible-heuristic pruning
    (see module docstring). ``heuristic``: DataFrame(id, h double);
    None (or missing rows) = h = 0 = plain forward search. Returns the
    same (step, id, cost) path contract as shortest_path_pair."""
    spark = edges.sparkSession
    if int(source) == int(target):
        return AStarResult(
            spark.createDataFrame([(0, int(source), 0.0)],
                                  "step long, id long, cost double"),
            0.0, 0, {"pruned_rounds": 0},
        )
    e = pin_table(_prep_edges(edges, weighted, direction).repartition("src"))
    e.count()
    h = None
    if heuristic is not None:
        h = F.broadcast(
            heuristic.select("id", F.col("h").cast("double").alias("h"))
        )
        if check_heuristic:
            bad = (
                e.join(h.withColumnRenamed("id", "src"), "src", "left")
                .withColumnRenamed("h", "h_src")
                .join(h.withColumnRenamed("id", "dst"), "dst", "left")
                .select(
                    F.coalesce("h_src", F.lit(0.0)).alias("hu"),
                    (F.col("w") + F.coalesce("h", F.lit(0.0))).alias("bound"),
                )
                .filter(F.col("hu") > F.col("bound"))
                .count()
            )
            ht = heuristic.filter(F.col("id") == int(target)).select("h").first()
            if bad > 0 or (ht is not None and float(ht["h"]) != 0.0):
                release_state(e)
                raise ValueError(
                    f"heuristic is not consistent: {bad} edge violations, "
                    f"h(target)={None if ht is None else ht['h']}"
                )
    state = spark.createDataFrame(
        [(int(source), 0.0, None, True)],
        "id long, dist double, pred long, improved boolean",
    ).localCheckpoint(eager=True)
    inf = float("inf")
    mu = inf
    rounds = 0
    pruned_labels = 0
    t0 = time.time()
    while True:
        rounds += 1
        merged = _relax_round(e, state)
        release_state(state)
        state = merged
        row = state.filter(F.col("id") == int(target)).select("dist").first()
        if row is not None:
            mu = float(row["dist"])
        if mu < inf:
            # branch-and-bound prune: silence frontier labels whose
            # optimistic completion cannot beat the recorded path
            front = state.filter("improved")
            if h is not None:
                front = front.join(h, "id", "left").select(
                    "id", "dist", "pred",
                    (F.col("dist") + F.coalesce("h", F.lit(0.0)) < F.lit(mu))
                    .alias("improved"),
                )
            else:
                front = front.select(
                    "id", "dist", "pred", (F.col("dist") < F.lit(mu)).alias("improved")
                )
            agg = front.agg(
                F.sum(F.when(F.col("improved"), 0).otherwise(1)).alias("pruned"),
                F.sum(F.when(F.col("improved"), 1).otherwise(0)).alias("live"),
            ).first()
            pruned_labels += int(agg["pruned"] or 0)
            n_front = int(agg["live"] or 0)
            if int(agg["pruned"] or 0) > 0:
                state2 = state.filter(~F.col("improved")).unionByName(
                    front
                ).localCheckpoint(eager=True)
                release_state(state)
                state = state2
        else:
            n_front = state.filter("improved").count()
        if n_front == 0:
            break
    release_state(e)
    dist = state.select("id", "dist", "pred")
    rows, total, _ = _reconstruct_path(dist, target)
    release_state(state)
    stats = {
        "rounds": rounds, "pruned_labels": pruned_labels,
        "compute_s": round(time.time() - t0, 4),
    }
    if rows is None:
        return AStarResult(
            spark.createDataFrame([], "step long, id long, cost double"),
            None, rounds, stats,
        )
    return AStarResult(
        spark.createDataFrame(rows, "step long, id long, cost double"),
        total, rounds, stats,
    )


@dataclass
class YenResult:
    paths: list  # [(cost, (n0, n1, ...)), ...] rank order
    df: DataFrame  # (rank long, total_cost double, n_hops long, path string)
    stats: dict = field(default_factory=dict)


def _edge_key(a, b) -> str:
    return f"{a}#{b}"


def yen_k_shortest(
    edges: DataFrame,
    source: int,
    target: int,
    k: int = 3,
    weighted: bool = True,
    direction: str = "OUTGOING",
    max_hops: int | None = None,
) -> YenResult:
    """Top-k loopless s->t paths by total weight (Yen; see module
    docstring). ``max_hops`` bounds every path to <= max_hops edges —
    the spur searches inherit the remaining budget, which keeps the
    semantics exactly "k cheapest among <= H-hop loopless paths"
    (the form a SQL path enumerator can oracle). Requires strictly
    positive weights."""
    spark = edges.sparkSession
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if int(source) == int(target):
        raise ValueError("yen_k_shortest needs distinct source/target")
    e = pin_table(_prep_edges(edges, weighted, direction)
                  .groupBy("src", "dst").agg(F.min("w").alias("w"))
                  .repartition("src"))
    e.count()
    t0 = time.time()
    wcache: dict[tuple[int, int], float] = {}

    def _weights(pairs) -> None:
        missing = [p for p in pairs if p not in wcache]
        if not missing:
            return
        keys = [_edge_key(a, b) for a, b in missing]
        rows = e.filter(
            F.concat_ws("#", F.col("src"), F.col("dst")).isin(keys)
        ).collect()
        for r in rows:
            wcache[(r["src"], r["dst"])] = float(r["w"])

    def _cost(path) -> float:
        pairs = list(zip(path, path[1:]))
        _weights(pairs)
        c = 0.0
        for p in pairs:  # left-assoc in path order — see module docstring
            c += wcache[p]
        return c

    def _sp(spur: int, excl_nodes, excl_edges, budget) -> tuple | None:
        """Shortest spur->target on the filtered view; returns the node
        tuple or None. Plain forward relax (hop-exact under budget)."""
        ef = e
        if excl_nodes:
            lit = list(excl_nodes)
            ef = ef.filter(~F.col("src").isin(lit) & ~F.col("dst").isin(lit))
        if excl_edges:
            keys = [_edge_key(a, b) for a, b in excl_edges]
            ef = ef.filter(~F.concat_ws("#", F.col("src"), F.col("dst")).isin(keys))
        state = spark.createDataFrame(
            [(int(spur), 0.0, None, True)],
            "id long, dist double, pred long, improved boolean",
        ).localCheckpoint(eager=True)
        it = 0
        limit = budget if budget is not None else 1 << 30
        while it < limit:
            it += 1
            merged = _relax_round(ef, state)
            n_front = merged.filter("improved").count()
            release_state(state)
            state = merged
            if n_front == 0:
                break
        rows, _total, _ = _reconstruct_path(
            state.select("id", "dist", "pred"), target
        )
        release_state(state)
        if rows is None:
            return None
        return tuple(int(r[1]) for r in rows)

    n_sssp = 1
    first = _sp(int(source), (), (), max_hops)
    accepted: list[tuple[float, tuple]] = []
    cand: dict[tuple, float] = {}
    if first is not None:
        cand[first] = _cost(first)
    while cand and len(accepted) < k:
        path = min(cand, key=lambda p: (cand[p], p))
        cost = cand.pop(path)
        accepted.append((cost, path))
        if len(accepted) == k:
            break
        for i in range(len(path) - 1):
            root = path[: i + 1]
            excl_edges = {
                (p[i], p[i + 1])
                for _c, p in accepted
                if len(p) > i + 1 and p[: i + 1] == root
            }
            excl_nodes = root[:-1]
            budget = (max_hops - i) if max_hops is not None else None
            if budget is not None and budget <= 0:
                continue
            n_sssp += 1
            spur = _sp(root[-1], excl_nodes, excl_edges, budget)
            if spur is None:
                continue
            full = root[:-1] + spur
            if any(p == full for _c, p in accepted):
                continue
            if full not in cand:
                cand[full] = _cost(full)
    release_state(e)
    out_rows = [
        (r + 1, c, len(p) - 1, "->".join(str(n) for n in p))
        for r, (c, p) in enumerate(accepted)
    ]
    df = spark.createDataFrame(
        out_rows, "rank long, total_cost double, n_hops long, path string"
    )
    return YenResult(
        paths=accepted,
        df=df,
        stats={"k": k, "found": len(accepted), "sssp_runs": n_sssp,
               "compute_s": round(time.time() - t0, 4)},
    )


def yen_sql(
    edges_sql: str, source: int, target: int, k: int, max_hops: int
) -> str:
    """Oracle: enumerate every loopless <= max_hops-hop path from
    ``source`` with a recursive CTE accumulating cost in path order
    (left-assoc, bit-identical to the engine's canonical recompute),
    rank by (cost, path), keep k. Columns (rank, total_cost) — the
    representative SEQUENCE on exact cost ties is tie-break detail,
    the (rank, cost) stream is not."""
    return f"""
WITH RECURSIVE e0 AS ({edges_sql}),
w AS (SELECT src, dst, MIN(weight) AS weight FROM e0 GROUP BY src, dst),
p AS (
  SELECT CAST({source} AS BIGINT) AS endv, CAST(0.0 AS DOUBLE) AS cost,
         [CAST({source} AS BIGINT)] AS path
  UNION ALL
  SELECT w.dst, p.cost + w.weight, list_append(p.path, w.dst)
  FROM p JOIN w ON w.src = p.endv
  WHERE NOT list_contains(p.path, w.dst) AND len(p.path) <= {max_hops}
)
SELECT rank, total_cost FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY cost, path) AS rank,
         cost AS total_cost
  FROM p WHERE endv = {target}
) WHERE rank <= {k}
"""


def astar_cost_sql(edges_sql: str, source: int, target: int, n_rounds: int = 24) -> str:
    """Oracle for the A* driver query: ``n_rounds`` min-plus relax
    rounds from ``source`` (>= any simple path's edge count on the
    fixture, so the DP has converged), then the target's distance —
    same left-assoc accumulation order as the engine's relax."""
    parts = [
        f"WITH e0 AS ({edges_sql})",
        "w AS (SELECT src, dst, MIN(weight) AS weight FROM e0 GROUP BY src, dst)",
        f"d0 AS (SELECT CAST({source} AS BIGINT) AS id, CAST(0.0 AS DOUBLE) AS dist)",
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT id, MIN(dist) AS dist FROM (
    SELECT id, dist FROM d{t - 1}
    UNION ALL
    SELECT w.dst AS id, d.dist + w.weight AS dist
    FROM d{t - 1} d JOIN w ON w.src = d.id
  ) GROUP BY id)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST({target} AS BIGINT) AS target, dist AS total_cost"
          f" FROM d{n_rounds} WHERE id = {target}"
    )
