"""Clique percolation communities (k = 3) — triangle percolation.

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): the Palla-Derényi-Farkas-Vicsek clique
percolation method (Nature 435, 2005 — public result) at k = 3, the
classic OVERLAPPING community detector. Two triangles are adjacent
when they share an edge; a community is a connected set of triangles;
a node belongs to every community whose triangles contain it (so the
output is a multi-membership (id, community) table, unlike the
partition returned by label propagation / Louvain).

Construction (Spark-first):

1. Triangles come from the engine's degree-ordered wedge kernel
   (``linkgraph/triangles.py#triangle_count`` — the tested
   enumeration path; triples arrive id-sorted a < b < c).
2. Triangle adjacency is NEVER materialized pairwise — an edge shared
   by t triangles would fan out t*(t-1)/2 pairs, quadratic at the
   exact hot spots (dense subgraphs) where percolation matters.
   Instead we run connected components on the BIPARTITE
   triangle-edge incidence graph (3 rows per triangle, linear), whose
   components restricted to triangle nodes are exactly the
   percolation communities.
3. The component id is internal; the canonical community label is the
   lexicographically smallest triangle key ``"a|b|c"`` in the
   component — engine-independent, so the DuckDB twin
   (`clique_percolation_sql`) reproduces it hash-exact.

Bipartite node ids are ``stable_hash64`` of the triangle / edge keys
(60-bit md5 — the engine's standard key-space embedding; an 'E|'
prefix separates edge keys from triangle keys). The hash only feeds
the internal component computation: the OUTPUT labels are the min
string keys, so a (astronomically unlikely) collision is detectable,
not silently label-corrupting.

Scale notes (100TB): triangle enumeration is the dominant cost and
inherits triangle_count's hub_cap / closing-strategy controls; the
incidence graph has 3T rows for T triangles and reuses
connected_components' delta iteration (frontier-only propagation) and
resume machinery — pass ``checkpoint_dir`` through for durable
supersteps. Rounds = bipartite component diameter (2x the
triangle-adjacency diameter); for long-chain percolation structures
switch ``cc_algorithm="star"`` (O(log n) rounds).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches, pin_table, release_state
from linkgraph.components import connected_components
from linkgraph.pipeline.hashing import stable_hash64
from linkgraph.triangles import triangle_count


@dataclass
class PercolationResult:
    memberships: DataFrame  # (id: long, community: string) — overlapping
    community_count: int
    triangle_count: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def clique_percolation(
    edges: DataFrame,
    k: int = 3,
    max_iter: int = 200,
    hub_cap: int | str | None = None,
    cc_algorithm: str = "minlabel",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> PercolationResult:
    """Overlapping triangle-percolation communities.

    Returns ``memberships = (id, community)`` where ``community`` is
    the min triangle key ``"a|b|c"`` of the node's percolation
    community — one row per (node, community) pair; nodes on no
    triangle do not appear.

    Only ``k = 3`` is implemented: higher k needs distributed k-clique
    enumeration (the same wedge kernel extended (k-2) join levels —
    combinatorial; gate it on a dense-subgraph extraction first).
    """
    if k != 3:
        raise ValueError(
            f"clique_percolation implements k=3 (triangles); got k={k}. "
            "For higher k, enumerate k-cliques on a k-core-reduced "
            "subgraph first."
        )
    tri_res = triangle_count(edges, hub_cap=hub_cap)
    tkey = F.concat_ws("|", "node_a", "node_b", "node_c")
    tri = pin_table(
        tri_res.triangles.select(
            "node_a", "node_b", "node_c", tkey.alias("tkey")
        )
    )
    n_tri = tri.count()
    tri_res.release()
    if n_tri == 0:
        spark = edges.sparkSession
        empty = spark.createDataFrame([], "id long, community string")
        release_state(tri)
        return PercolationResult(
            memberships=empty, community_count=0, triangle_count=0
        )
    # bipartite incidence: triangle node + its 3 edge nodes
    pairs = [("node_a", "node_b"), ("node_a", "node_c"), ("node_b", "node_c")]
    inc = None
    for x, y in pairs:
        ek = F.concat_ws("|", F.lit("E"), F.col(x), F.col(y))
        part = tri.select(
            stable_hash64(F.col("tkey")).alias("src"),
            stable_hash64(ek).alias("dst"),
        )
        inc = part if inc is None else inc.unionByName(part)
    cc = connected_components(
        inc,
        max_iter=max_iter,
        algorithm=cc_algorithm,
        checkpoint_dir=checkpoint_dir,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    labeled = (
        tri.select("tkey", "node_a", "node_b", "node_c",
                   stable_hash64(F.col("tkey")).alias("id"))
        .join(cc.components, "id")
    )
    comm = labeled.groupBy("comp").agg(F.min("tkey").alias("community"))
    memberships = pin_table(
        labeled.select(
            "comp", F.explode(F.array("node_a", "node_b", "node_c")).alias("id")
        )
        .join(comm, "comp")
        .select("id", "community")
        .distinct()
    )
    n_comm = memberships.select("community").distinct().count()
    release_state(tri)
    return PercolationResult(
        memberships=attach_caches(memberships, []),
        community_count=n_comm,
        triangle_count=n_tri,
        stats={"cc_iterations": cc.iterations, "cc_algorithm": cc_algorithm},
        _caches=[memberships],
    )


def clique_percolation_sql(edges_sql: str, n_rounds: int = 16) -> str:
    """DuckDB twin of `clique_percolation` (k=3): id-ordered triangle
    enumeration, the same bipartite incidence with STRING node keys,
    min-label propagation unrolled ``n_rounds`` times (idempotent past
    the fixpoint — n_rounds must cover the bipartite component
    diameter), community = min label (every component holds a digit-
    leading triangle key, which sorts below every 'E|' edge key)."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
  GREATEST(src, dst) AS b FROM e WHERE src <> dst)""",
        """tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1 JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)""",
        """tkeys AS MATERIALIZED (SELECT x, y, z,
  x || '|' || y || '|' || z AS tkey FROM tri)""",
        """inc AS MATERIALIZED (
  SELECT tkey AS n1, 'E|' || x || '|' || y AS n2 FROM tkeys
  UNION ALL SELECT tkey, 'E|' || x || '|' || z FROM tkeys
  UNION ALL SELECT tkey, 'E|' || y || '|' || z FROM tkeys)""",
        """bsym AS MATERIALIZED (SELECT n1, n2 FROM inc
  UNION ALL SELECT n2, n1 FROM inc)""",
        """l0 AS MATERIALIZED (SELECT DISTINCT n1 AS node, n1 AS lbl
  FROM bsym)""",
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""l{t} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM l{t - 1}
    UNION ALL
    SELECT s.n1 AS node, p.lbl FROM bsym s JOIN l{t - 1} p ON p.node = s.n2)
  GROUP BY node)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT DISTINCT m.id, c.lbl AS community
FROM (SELECT tkey, x AS id FROM tkeys
      UNION ALL SELECT tkey, y FROM tkeys
      UNION ALL SELECT tkey, z FROM tkeys) m
JOIN l{n_rounds} c ON c.node = m.tkey"""
    )
