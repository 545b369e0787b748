"""Bow-tie decomposition of a directed link graph (Broder et al.
WWW 2000, "Graph structure in the Web" — public result).

The canonical macro-structure analysis of a web-scale link graph —
exactly the north star's domain: the giant strongly-connected CORE,
the IN set (reaches the core), the OUT set (reachable from the
core), TUBEs (IN→OUT bypasses), TENDRILs hanging off IN/OUT, and
DISCONNECTED components. Class definitions (closed, deterministic,
identical in the engine and the SQL twin):

* ``CORE``         — the largest SCC (ties → smallest canonical id);
* ``IN``           — reaches some core node, not in the core
  (a node both reaching and reached by the core is IN the core, so
  IN/OUT are disjoint by the SCC property);
* ``OUT``          — reachable from the core, not in the core;
* ``TUBE``         — none of the above, reachable from IN AND
  reaching OUT (closure-level: any witness path through the core
  would have classified the node as OUT/IN already);
* ``TENDRIL_IN``   — reachable from IN only;
* ``TENDRIL_OUT``  — reaching OUT only;
* ``DISCONNECTED`` — not in the core's weakly-connected component;
* ``OTHER``        — in the core's WCC but none of the above (e.g.
  an ancestor of a tendril — Broder lumps these into tendrils; the
  engine reports them honestly).

Spark-first shape (100TB): one SCC run (scc.py trim + FW-BW), one
WCC run (delta-iteration components), and four frontier-loop
reachability sweeps (forward/backward from the core, forward from
IN, backward from OUT) — each sweep is the BFS shuffle (frontier
join + distinct-minus) with geometrically shrinking frontiers, the
engine's standard reachability machinery. The per-node state is one
narrow (id, class) frame.

The SQL twin reuses the transitive-closure oracle shape of
``dag.scc_mutual_reach_sql`` (WITH RECURSIVE; small-scale oracle
only, as for scc_returns).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state
from linkgraph.components import connected_components
from linkgraph.scc import strongly_connected_components


@dataclass
class BowtieResult:
    classes: DataFrame  # (id, cls)
    core_label: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _reach(edges: DataFrame, seeds: DataFrame, max_rounds: int = 10_000) -> DataFrame:
    """All nodes reachable FROM ``seeds`` (id column) along directed
    ``edges`` (src→dst), seeds included — standard frontier BFS with
    a shrinking distinct-minus frontier."""
    reached = pin_table(seeds.select("id").distinct())
    frontier = reached
    for _ in range(max_rounds):
        nxt = pin_table(
            edges.join(frontier.select(F.col("id").alias("src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reached, "id", "left_anti")
        )
        if nxt.isEmpty():
            release_state(nxt)
            # the LAST non-empty frontier pin would otherwise leak
            # (first round: frontier IS reached — keep that one)
            if frontier is not reached:
                release_state(frontier)
            break
        new_reached = pin_table(reached.unionByName(nxt))
        if frontier is not reached:
            release_state(frontier)
        release_state(reached)
        reached = new_reached
        frontier = nxt
    return reached


def bowtie_decomposition(edges: DataFrame) -> BowtieResult:
    """Broder bow-tie classes over a directed edge table (module
    docstring). Returns (id, cls) with cls one of CORE/IN/OUT/TUBE/
    TENDRIL_IN/TENDRIL_OUT/DISCONNECTED/OTHER; replayed exactly by
    ``bowtie_sql``."""
    t0 = time.time()
    dedges = pin_table(
        edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    )
    redges = dedges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    scc = strongly_connected_components(dedges.withColumn("weight", F.lit(1.0)))
    comps = pin_table(scc.components.select("id", "scc"))
    core_row = (
        comps.groupBy("scc").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .first()
    )
    if core_row is None:
        raise ValueError("bowtie_decomposition: empty edge table")
    core_label = core_row["scc"]
    core = comps.filter(F.col("scc") == core_label).select("id")
    r_fwd = _reach(dedges, core)          # core ∪ OUT
    r_bwd = _reach(redges, core)          # core ∪ IN
    in_set = pin_table(r_bwd.join(core, "id", "left_anti"))
    out_set = pin_table(r_fwd.join(core, "id", "left_anti"))
    from_in = _reach(dedges, in_set)      # IN ∪ (closure forward)
    to_out = _reach(redges, out_set)      # OUT ∪ (closure backward)
    wcc = connected_components(dedges.withColumn("weight", F.lit(1.0)))
    core_min = core.agg(F.min("id").alias("m")).first()["m"]
    wcc_core_label = (
        wcc.components.filter(F.col("id") == core_min).first()["comp"]
    )
    core_wcc = wcc.components.filter(F.col("comp") == wcc_core_label).select("id")
    nodes = comps.select("id")
    cls = (
        nodes
        .join(core.select("id", F.lit(True).alias("is_core")), "id", "left")
        .join(in_set.select("id", F.lit(True).alias("is_in")), "id", "left")
        .join(out_set.select("id", F.lit(True).alias("is_out")), "id", "left")
        .join(from_in.select("id", F.lit(True).alias("f_in")), "id", "left")
        .join(to_out.select("id", F.lit(True).alias("t_out")), "id", "left")
        .join(core_wcc.select("id", F.lit(True).alias("in_wcc")), "id", "left")
        .select(
            "id",
            F.when(F.col("is_core"), "CORE")
            .when(F.col("is_in"), "IN")
            .when(F.col("is_out"), "OUT")
            .when(F.col("f_in") & F.col("t_out"), "TUBE")
            .when(F.col("f_in"), "TENDRIL_IN")
            .when(F.col("t_out"), "TENDRIL_OUT")
            .when(F.col("in_wcc").isNull(), "DISCONNECTED")
            .otherwise("OTHER")
            .alias("cls"),
        )
    )
    counts = {r["cls"]: r["n"] for r in
              cls.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    return BowtieResult(
        classes=cls,
        core_label=core_label,
        stats={"class_counts": counts,
               "wall_s": round(time.time() - t0, 3)},
        _caches=[dedges, comps, r_fwd, r_bwd, in_set, out_set, from_in, to_out],
    )


def bowtie_sql(edges_sql: str) -> str:
    """Oracle: full transitive closure (directed + undirected) with
    the same class decision tree — the scc_mutual_reach_sql shape."""
    return f"""
WITH RECURSIVE
e AS (SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src <> dst),
-- the UNION between non-recursive branches does NOT dedup inside
-- WITH RECURSIVE (DuckDB) — dedup explicitly
nodes AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
),
-- every consumer reads the MATERIALIZED snapshot of the recursive
-- closure — DuckDB inlines CTEs per reference, and 6 re-expansions
-- of the closure blow memory (the doubling-CTE gotcha)
reachm AS MATERIALIZED (SELECT a, b FROM reach),
mutual AS MATERIALIZED (
  SELECT n.id AS a, n.id AS b FROM nodes n
  UNION
  SELECT r1.a, r1.b FROM reachm r1
  JOIN reachm r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS MATERIALIZED (SELECT a AS id, MIN(b) AS scc FROM mutual GROUP BY a),
core_pick AS (SELECT scc FROM (
  SELECT scc, COUNT(*) AS n FROM scc GROUP BY scc)
  ORDER BY n DESC, scc ASC LIMIT 1),
core AS MATERIALIZED (
  SELECT id FROM scc WHERE scc = (SELECT scc FROM core_pick)),
inn AS MATERIALIZED (
  SELECT DISTINCT r.a AS id FROM reachm r JOIN core c ON c.id = r.b
  WHERE r.a NOT IN (SELECT id FROM core)),
outt AS MATERIALIZED (
  SELECT DISTINCT r.b AS id FROM reachm r JOIN core c ON c.id = r.a
  WHERE r.b NOT IN (SELECT id FROM core)),
f_in AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT id FROM inn UNION ALL
  SELECT r.b FROM reachm r JOIN inn i ON i.id = r.a)),
t_out AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT id FROM outt UNION ALL
  SELECT r.a FROM reachm r JOIN outt o ON o.id = r.b)),
-- undirected reachability only FROM the core representative — a
-- single-source recursive walk, not the all-pairs closure
sym AS MATERIALIZED (
  SELECT src AS a, dst AS b FROM e UNION SELECT dst, src FROM e),
uwalk(id) AS (
  SELECT (SELECT MIN(id) FROM core) AS id
  UNION
  SELECT s.b FROM uwalk w JOIN sym s ON s.a = w.id
),
core_wcc AS MATERIALIZED (SELECT id FROM uwalk)
SELECT n.id,
  CASE WHEN n.id IN (SELECT id FROM core) THEN 'CORE'
       WHEN n.id IN (SELECT id FROM inn) THEN 'IN'
       WHEN n.id IN (SELECT id FROM outt) THEN 'OUT'
       WHEN n.id IN (SELECT id FROM f_in)
        AND n.id IN (SELECT id FROM t_out) THEN 'TUBE'
       WHEN n.id IN (SELECT id FROM f_in) THEN 'TENDRIL_IN'
       WHEN n.id IN (SELECT id FROM t_out) THEN 'TENDRIL_OUT'
       WHEN n.id NOT IN (SELECT id FROM core_wcc) THEN 'DISCONNECTED'
       ELSE 'OTHER' END AS cls
FROM nodes n
"""
