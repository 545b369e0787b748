"""Densest subgraph — parallel greedy peeling (Bahmani et al., VLDB 2012).

Charikar's greedy removes ONE min-degree node per step (exact
2-approximation, n sequential steps — a driver-bound loop at web
scale). Bahmani/Kumar/Vassilvitskii's MapReduce variant removes EVERY
node of degree <= 2(1+eps) * density(G_t) per round: a
2(1+eps)-approximation in O(log(n)/eps) rounds, each round one
degree aggregation + one semi join — the canonical "peel in parallel"
trade the engine's k-core decomposition already uses.

Determinism: densities are exact integer ratios evaluated in IEEE
double (identical in Spark and DuckDB), thresholds compare those
doubles, and the best round is the FIRST round achieving the maximum
density — so the returned node set is bit-reproducible and the DuckDB
oracle unrolls the same rounds verbatim.

Undirected simple-graph semantics: direction and multiplicity are
ignored; density = |E| / |V| over the induced subgraph.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import SuperstepLoop, release_state


@dataclass
class DensestResult:
    members: DataFrame  # (id) — nodes of the best peel round's subgraph
    density: float
    best_round: int
    rounds: int
    stats: dict = field(default_factory=dict)


def densest_subgraph(
    edges: DataFrame,
    eps: float = 0.5,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
) -> DensestResult:
    """Node set of the densest-round subgraph under parallel peeling.

    Guarantee: density(result) >= density(optimal) / (2(1+eps)).
    Raises if ``max_rounds`` is exhausted with nodes remaining (cannot
    happen for eps > 0: each round removes a constant fraction)."""
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    loop = SuperstepLoop(spark, checkpoint_dir=checkpoint_dir, name="densest")
    cur = loop.advance(0, und)
    best_density, best_round = -1.0, 0
    history = []  # per-round (round, density) for stats
    rounds = 0
    while rounds < max_rounds:
        m = cur.count()
        if m == 0:
            break
        deg = (
            cur.select(F.col("a").alias("id"))
            .union(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        ).persist()
        n = deg.count()
        density = m / n
        history.append((rounds, density))
        if density > best_density:
            best_density, best_round = density, rounds
        thr = 2.0 * (1.0 + eps) * density
        keep = deg.filter(F.col("deg") > F.lit(thr)).select("id")
        cur = (
            cur.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
        )
        rounds += 1
        cur = loop.advance(rounds, cur, metrics={"round": rounds, "density": density})
        deg.unpersist()
    else:
        if cur.limit(1).count() > 0:
            raise RuntimeError(
                f"densest_subgraph did not terminate in {max_rounds} rounds"
            )

    # replay the peel to the best round to materialize its node set:
    # cheaper than caching every round's (possibly huge) survivor set.
    # The loop's final (empty) state is not part of the result plan.
    loop.close()
    cur = und
    prev = None
    for _ in range(best_round):
        deg = (
            cur.select(F.col("a").alias("id"))
            .union(cur.select(F.col("b").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        m = cur.count()
        n = deg.count()
        thr = 2.0 * (1.0 + eps) * (m / n)
        keep = deg.filter(F.col("deg") > F.lit(thr)).select("id")
        cur = (
            cur.join(keep.withColumnRenamed("id", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("id", "b"), "b", "left_semi")
            .select("a", "b")
            # truncate the replay lineage every round: without this the
            # r-th round re-executes the whole peel prefix (O(r^2) scans)
            .localCheckpoint(eager=True)
        )
        if prev is not None:
            release_state(prev)
        prev = cur
    members = (
        cur.select(F.col("a").alias("id"))
        .union(cur.select(F.col("b").alias("id")))
        .distinct()
    )
    return DensestResult(
        members=members,
        density=best_density,
        best_round=best_round,
        rounds=rounds,
        stats={"history": history},
    )


def densest_subgraph_sql(edges_sql: str, eps: float = 0.5, rounds: int = 16) -> str:
    """DuckDB twin: the same peel unrolled; the best round is selected
    by density with first-round-wins tie-break, and its node set is
    emitted. ``rounds`` must cover the engine's termination on the
    target graph (the driver query asserts it)."""
    parts = [
        f"""
WITH
e0 AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({edges_sql}) WHERE src != dst)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
d{r} AS MATERIALIZED (
  SELECT id, COUNT(*) AS deg FROM (
    SELECT a AS id FROM e{r} UNION ALL SELECT b FROM e{r}) GROUP BY id),
s{r} AS MATERIALIZED (
  SELECT (SELECT COUNT(*) FROM e{r}) AS m, (SELECT COUNT(*) FROM d{r}) AS n),
k{r} AS (
  SELECT id FROM d{r} WHERE deg > 2.0 * (1.0 + {eps}) *
    (SELECT CAST(m AS DOUBLE) / n FROM s{r} WHERE n > 0)),
e{r+1} AS MATERIALIZED (
  SELECT e.* FROM e{r} e
  WHERE e.a IN (SELECT id FROM k{r}) AND e.b IN (SELECT id FROM k{r}))"""
        )
    dens_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, CAST(m AS DOUBLE) / n AS density FROM s{r} WHERE n > 0"
        for r in range(rounds)
    )
    node_rows = " UNION ALL ".join(
        f"SELECT {r} AS r, id FROM (SELECT a AS id FROM e{r} "
        f"UNION SELECT b FROM e{r})"
        for r in range(rounds)
    )
    parts.append(
        f""",
dens AS ({dens_rows}),
best AS (SELECT r FROM dens ORDER BY density DESC, r ASC LIMIT 1),
nodes AS ({node_rows})
SELECT DISTINCT nodes.id AS id FROM nodes WHERE nodes.r = (SELECT r FROM best)"""
    )
    return "".join(parts)
