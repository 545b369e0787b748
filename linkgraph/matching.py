"""Maximal matching — deterministic parallel greedy (local-minimum rounds).

A maximal matching is the edge-side dual of the maximal independent
set the engine already ships (linkgraph/coloring.py luby_mis): no two
matched edges share a node, and no unmatched edge can be added. The
classic PRAM/Pregel scheme: give every edge a priority, select each
edge that holds the MINIMUM priority at BOTH endpoints (such edges are
pairwise non-adjacent by construction), drop everything touching a
matched node, repeat. With the engine's cross-engine 60-bit md5
priority the result is deterministic AND equals the sequential greedy
matching over the priority order — which is what makes an exact SQL
oracle possible (the same rounds unroll as CTEs).

Scale shape: each round is one explode + map-side-combinable
``groupBy(node).min`` + two joins back to the edge table, all keyed on
node ids; the active edge set shrinks geometrically (expected O(log m)
rounds for random-ish priorities). No driver-side state beyond the
per-round empty check.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import SuperstepLoop
from .pipeline.hashing import stable_hash64, stable_hash64_sql


@dataclass
class MatchingResult:
    matching: DataFrame  # (src, dst) — canonical src < dst
    rounds: int
    stats: dict = field(default_factory=dict)


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 64,
    checkpoint_dir: str | None = None,
) -> MatchingResult:
    """Greedy maximal matching of the undirected simple graph.

    Deterministic: the priority is the md5-derived 60-bit hash of the
    canonical edge key STRING-CONCATENATED with the key itself —
    a provably total order (two edges never share a priority, so the
    local-minimum selection can never pick two adjacent edges even
    under a 2^-60 hash collision). Repeated runs — and the DuckDB
    oracle — produce the same edge set. Raises if ``max_rounds`` is
    exhausted with edges still active.
    """
    spark = edges.sparkSession
    active = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # hash first for uniformity, then the unique edge key as a
        # lexicographic tie-break: a TOTAL order, collision-proof
        .withColumn(
            "pr",
            F.concat_ws(
                ":", stable_hash64(F.concat_ws(":", "a", "b")), "a", "b"
            ),
        )
    )
    loop = SuperstepLoop(spark, checkpoint_dir=checkpoint_dir, name="matching")
    active = loop.advance(0, active)
    matched_parts = []
    rounds = 0
    while rounds < max_rounds:
        if active.limit(1).count() == 0:
            break
        node_min = (
            active.select(F.col("a").alias("node"), "pr")
            .union(active.select(F.col("b").alias("node"), "pr"))
            .groupBy("node")
            .agg(F.min("pr").alias("mn"))
        )
        na = node_min.select(F.col("node").alias("a"), F.col("mn").alias("mna"))
        nb = node_min.select(F.col("node").alias("b"), F.col("mn").alias("mnb"))
        sel = (
            active.join(na, "a")
            .join(nb, "b")
            .filter((F.col("pr") == F.col("mna")) & (F.col("pr") == F.col("mnb")))
            .select("a", "b")
            .persist()
        )
        matched_parts.append(sel)
        touched = sel.select(F.col("a").alias("node")).union(
            sel.select(F.col("b").alias("node"))
        )
        active = (
            active.join(touched.withColumnRenamed("node", "a"), "a", "left_anti")
            .join(touched.withColumnRenamed("node", "b"), "b", "left_anti")
            .select("a", "b", "pr")
        )
        rounds += 1
        active = loop.advance(rounds, active, metrics={"round": rounds})
    else:
        if active.limit(1).count() > 0:
            raise RuntimeError(
                f"maximal_matching did not converge in {max_rounds} rounds"
            )
    if matched_parts:
        matching = matched_parts[0]
        for p in matched_parts[1:]:
            matching = matching.union(p)
        # own the result's blocks: the per-round sel caches hang off
        # localCheckpointed loop states whose lineage cannot recompute,
        # so the union is eagerly checkpointed BEFORE those are freed
        matching = matching.localCheckpoint(eager=True)
        for p in matched_parts:
            p.unpersist()
    else:
        matching = spark.createDataFrame([], "a long, b long")
    # the final (empty) loop state is not part of the result plan
    loop.close()
    return MatchingResult(
        matching=matching.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ),
        rounds=rounds,
        stats={"rounds": rounds},
    )


def maximal_matching_sql(edges_sql: str, rounds: int = 12) -> str:
    """DuckDB twin: the identical local-minimum rounds unrolled as
    CTEs with the same md5 priority. ``rounds`` must cover the
    engine's convergence on the target graph (the driver query asserts
    it); surviving active edges after the last round would mean a
    non-maximal result, so the final SELECT ignores them only after
    the engine has proven convergence at the same round count."""
    h = stable_hash64_sql("a || ':' || b")
    pr = f"CAST({h} AS VARCHAR) || ':' || a || ':' || b"
    parts = [
        f"""
WITH
e0 AS MATERIALIZED (
  SELECT a, b, {pr} AS pr FROM (
    SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
    FROM ({edges_sql}) WHERE src != dst))"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
nm{r} AS MATERIALIZED (
  SELECT node, MIN(pr) AS mn FROM (
    SELECT a AS node, pr FROM e{r} UNION ALL SELECT b, pr FROM e{r})
  GROUP BY node),
sel{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r} e
  JOIN nm{r} na ON na.node = e.a AND na.mn = e.pr
  JOIN nm{r} nb ON nb.node = e.b AND nb.mn = e.pr),
t{r} AS (SELECT a AS node FROM sel{r} UNION ALL SELECT b FROM sel{r}),
e{r+1} AS MATERIALIZED (
  SELECT e.* FROM e{r} e
  WHERE e.a NOT IN (SELECT node FROM t{r})
    AND e.b NOT IN (SELECT node FROM t{r}))"""
        )
    sels = " UNION ALL ".join(f"SELECT * FROM sel{r}" for r in range(rounds))
    parts.append(f"""
SELECT a AS src, b AS dst FROM ({sels})""")
    return "".join(parts)
