"""DAG structure operators — topological levels, cycle check, SCC condensation.

Reference lineage (SURVEY.md §2 anchors; local snapshot empty): the
`mknblch/neo4j-graph-algorithms` family ships SCC
(pub:algo/src/main/java/org/neo4j/graphalgo/StronglyConnectedComponentsProc.java)
whose canonical downstream consumer is the condensation DAG — contract
every SCC to one vertex and keep the inter-component edges, which is by
construction acyclic. ``topological_levels`` is the scheduling view of
that DAG (level = longest-path distance from any source), the same
quantity Kahn's algorithm assigns by peel round.

Spark-first design
------------------
``topological_levels`` runs max-relaxation with FRONTIER-ONLY
propagation: state ``(id, level)`` starts at 0 everywhere and each
round proposes ``level(u)+1`` along out-edges of nodes whose level
changed last round. Under the max lattice this is exact (any
improvement originates at a node that itself improved), converges in
exactly ``depth(DAG)`` rounds, and each round is ONE algorithmic
shuffle (the map-side-combinable ``groupBy(dst).max`` proposal
aggregate) plus the state merge join. The shrinking frontier is the
same work-reduction WCC's delta iteration uses: at web scale the tail
rounds touch only the deep spine of the DAG, not all m edges.

Cycle handling: on a cyclic input levels never converge — the loop
raises :class:`CycleError` once ``max_rounds`` (default: the node
count, the longest possible simple path) is exhausted while the
frontier is still non-empty. ``is_dag`` wraps this as a predicate with
a caller-bounded round budget.

``condensation`` composes the existing SCC procedure with two hash
joins mapping edge endpoints to component ids — the mapping side is
``n`` rows (narrow), the edge side streams, and the output is
``distinct`` inter-component pairs. No driver-side collection at any
size.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import SuperstepLoop, release_state


class CycleError(ValueError):
    """Raised when topological_levels is given a cyclic graph."""


@dataclass
class DagLevels:
    levels: DataFrame  # (id, level)
    rounds: int
    depth: int  # max level reached == longest path length

    def release(self) -> None:
        release_state(self.levels)


@dataclass
class Condensation:
    comp_edges: DataFrame  # (src, dst) — distinct inter-SCC edges
    mapping: DataFrame  # (id, scc)


def _oriented(edges: DataFrame, direction: str) -> DataFrame:
    if direction == "OUTGOING":
        return edges.select("src", "dst")
    if direction == "INCOMING":
        return edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    raise ValueError("direction must be OUTGOING or INCOMING (BOTH is cyclic)")


def topological_levels(
    edges: DataFrame,
    direction: str = "OUTGOING",
    max_rounds: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DagLevels:
    """Longest-path-from-any-source level per node of a DAG.

    ``level(v) = 0`` for sources (in-degree 0) and
    ``1 + max(level(u))`` over in-neighbors otherwise — the Kahn peel
    round of v, and the earliest schedule slot respecting all
    dependencies.

    Raises :class:`CycleError` if the input has a directed cycle
    (detected by non-convergence within ``max_rounds``; the default
    budget is the node count, the longest possible simple path, so on
    a true DAG the loop always converges first).

    Resumable: ``checkpoint_dir`` + ``resume=True`` re-enters at the
    last durable round with the frontier rebuilt from the saved state
    (state rows carry a ``changed`` flag for exactly this purpose).
    """
    e = _oriented(edges, direction)
    spark = e.sparkSession
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )

    ctx = {"direction": direction}
    loop = SuperstepLoop(
        spark, checkpoint_dir=checkpoint_dir, every=checkpoint_every,
        name="topo_levels", context=ctx,
    )
    start_round = 0
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = loop.last_context.get("direction")
            if rec is not None and rec != direction:
                raise ValueError(
                    f"topological_levels resume mismatch: checkpoint was "
                    f"written with direction={rec!r}, this call passes "
                    f"{direction!r}"
                )
            start_round, state = resumed

    if state is None:
        # every node starts at level 0 and is in the frontier: the
        # first proposal round lifts everything with an in-edge to >=1
        state = nodes.select(
            "id", F.lit(0).alias("level"), F.lit(True).alias("changed")
        )
        state = loop.advance(0, state)

    if max_rounds is None:
        max_rounds = nodes.count()

    rounds = start_round
    while True:
        if rounds >= max_rounds:
            frontier_n = state.filter(F.col("changed")).count()
            if frontier_n > 0:
                raise CycleError(
                    f"levels did not converge within {max_rounds} rounds "
                    f"({frontier_n} nodes still changing) — the graph has a "
                    "directed cycle, or its depth exceeds max_rounds"
                )
            break
        frontier = state.filter(F.col("changed")).select("id", "level")
        proposals = (
            frontier.join(e, frontier.id == e.src)
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("level") + F.lit(1)).alias("cand"))
        )
        merged = (
            state.select("id", "level")
            .join(proposals, "id", "left")
            .select(
                "id",
                F.greatest(F.col("level"), F.coalesce("cand", "level")).alias(
                    "level"
                ),
                (F.coalesce("cand", F.lit(-1)) > F.col("level")).alias("changed"),
            )
        )
        rounds += 1
        state = loop.advance(rounds, merged, metrics={"round": rounds})
        if state.filter(F.col("changed")).limit(1).count() == 0:
            break

    levels = state.select("id", "level")
    depth = levels.agg(F.max("level")).first()[0] or 0
    return DagLevels(levels=levels, rounds=rounds, depth=int(depth))


def is_dag(edges: DataFrame, direction: str = "OUTGOING",
           max_rounds: int | None = None) -> bool:
    """True iff the directed graph has no cycle (levels converge)."""
    try:
        res = topological_levels(edges, direction=direction, max_rounds=max_rounds)
        res.release()
        return True
    except CycleError:
        return False


def condensation(edges: DataFrame, **scc_kwargs) -> Condensation:
    """Contract every SCC to a vertex; keep distinct inter-SCC edges.

    The result is acyclic by construction (a cycle between two
    condensation vertices would merge their SCCs), so it composes with
    :func:`topological_levels` for dependency layering of a cyclic
    input — the classic "build order with cycles collapsed" query.
    """
    from .scc import strongly_connected_components

    res = strongly_connected_components(edges, **scc_kwargs)
    m = res.components  # (id, scc)
    a = m.select(F.col("id").alias("src"), F.col("scc").alias("csrc"))
    b = m.select(F.col("id").alias("dst"), F.col("scc").alias("cdst"))
    comp_edges = (
        edges.select("src", "dst")
        .join(a, "src")
        .join(b, "dst")
        .filter(F.col("csrc") != F.col("cdst"))
        .select(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
        .distinct()
    )
    return Condensation(comp_edges=comp_edges, mapping=m)


# ------------------------------------------------------------- SQL twins

def topological_levels_sql(edges_sql: str) -> str:
    """DuckDB oracle: longest-path level via a recursive reachability
    CTE — terminates on DAGs because (id, level) state is bounded by
    depth and UNION deduplicates."""
    return f"""
WITH RECURSIVE
e AS MATERIALIZED ({edges_sql}),
nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
lev(id, level) AS (
  SELECT id, 0 FROM nodes
  UNION
  SELECT e.dst, lev.level + 1 FROM lev JOIN e ON e.src = lev.id
)
SELECT id, MAX(level) AS level FROM lev GROUP BY id
"""


def scc_mutual_reach_sql(edges_sql: str) -> str:
    """Min-id SCC labels via mutual reachability (the same oracle shape
    the driver's scc_returns query uses)."""
    return f"""
WITH RECURSIVE
e AS ({edges_sql}),
nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
),
mutual AS (
  SELECT n.id AS a, n.id AS b FROM nodes n
  UNION
  SELECT r1.a, r1.b FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS (SELECT a AS id, MIN(b) AS scc FROM mutual GROUP BY a)
SELECT id, scc FROM scc
"""


def condensation_sql(edges_sql: str) -> str:
    scc = scc_mutual_reach_sql(edges_sql)
    return f"""
WITH
sccmap AS MATERIALIZED ({scc}),
e AS MATERIALIZED ({edges_sql})
SELECT DISTINCT a.scc AS src, b.scc AS dst
FROM e JOIN sccmap a ON e.src = a.id JOIN sccmap b ON e.dst = b.id
WHERE a.scc != b.scc
"""


def condensation_levels_sql(edges_sql: str) -> str:
    """Topological levels of the condensation DAG of ``edges_sql``."""
    return topological_levels_sql(condensation_sql(edges_sql).strip())
