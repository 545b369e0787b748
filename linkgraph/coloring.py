"""Distributed greedy coloring (Jones-Plassmann) and maximal
independent set (Luby) under deterministic hash priorities.

Engine extensions beyond the reference procedure list (SURVEY.md §2 is
100% covered elsewhere): both are the textbook symmetry-breaking
primitives of distributed graph processing (Luby 1986, "A simple
parallel algorithm for the maximal independent set problem";
Jones & Plassmann 1993, "A parallel graph coloring heuristic" — public
results), and the natural companions to the engine's LPA/WCC superstep
family: one hash-priority comparison per round, O(log n) expected
rounds.

Determinism = oracle-ability: the "random" priority is the engine's
cross-engine 60-bit md5 hash of the node id (pipeline/hashing.py —
bit-identical in Spark, DuckDB, and Python), ties broken by id: a
total order both engines compute exactly, so every round is a pure
function of the previous state and the whole run unrolls into ANSI
SQL (``luby_mis_sql`` / ``jones_plassmann_sql``).

* ``luby_mis(edges, seed)`` — round: every ACTIVE node whose
  (hash, id) beats all active neighbors joins the MIS; MIS nodes and
  their ACTIVE neighbors deactivate. Adjacent winners are impossible
  (the total order picks one), so independence is by construction;
  maximality because a node only deactivates with a MIS neighbor.
* ``jones_plassmann(edges, seed)`` — round: every UNCOLORED node whose
  (hash, id) beats all uncolored neighbors takes the smallest color
  absent among its already-colored neighbors (the mex, computed
  RELATIONALLY: explode colors 0..n_colored_nbrs, anti-join the used
  set, min — no per-row loops, identical shape in SQL). Proper by
  construction: same-round winners are never adjacent, and cross-round
  conflicts are excluded by the mex.

Scale notes (100TB): per round ONE join of the symmetric adjacency
against the (shrinking) active frame plus hash aggregations — the LPA
shuffle shape, with the same hub caveat (a mega-hub's neighbor fan
lands in one task; the degree-histogram probe + LPA's hub_cap split
applies verbatim if ever needed). Luby kills >= 1/2 of the EDGES per
round in expectation, so round cost decays geometrically; both loops
early-stop when the active set empties. Isolated nodes decide in
round 1. The mex explode is bounded per node by its colored-neighbor
count, so its volume never exceeds |E| rows in a round.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches, pin_table, release_state
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql
from linkgraph.triangles import _undirected_simple


@dataclass
class ColoringResult:
    assignment: DataFrame  # (id, color, round) / (id, in_mis, round)
    rounds: int
    n_colors: int | None
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _sym(edges: DataFrame) -> DataFrame:
    und = _undirected_simple(edges)
    return und.select(F.col("a").alias("node"), F.col("b").alias("nbr")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("nbr"))
    )


def _nodes(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def _pri(col: str, seed: int) -> Column:
    return stable_hash64(F.col(col).cast("string"), salt=seed)


def _pri_sql(expr: str, seed: int) -> str:
    return stable_hash64_sql(f"CAST({expr} AS VARCHAR)", salt=seed)


def _winners(sym: DataFrame, active: DataFrame, seed: int) -> DataFrame:
    """Active nodes whose (hash, id) beats every active neighbor's."""
    a_nbr = active.select(F.col("id").alias("nbr"))
    beat = (
        sym.join(active, sym.node == active.id).drop("id")
        .join(a_nbr, "nbr", "left_semi")
        .groupBy("node")
        .agg(F.max(F.struct(_pri("nbr", seed).alias("h"),
                            F.col("nbr").alias("i"))).alias("mx"))
    )
    return (
        active.join(beat, active.id == beat.node, "left")
        .filter(
            F.col("mx").isNull()
            | (F.struct(_pri("id", seed).alias("h"), F.col("id").alias("i"))
               > F.col("mx"))
        )
        .select("id")
    )


def luby_mis(edges: DataFrame, seed: int = 42, max_rounds: int = 64) -> ColoringResult:
    """Maximal independent set under the (stable_hash64(id, seed), id)
    priority order (see module docstring). Exact and deterministic;
    replayed by ``luby_mis_sql``."""
    t0 = time.time()
    sym = pin_table(_sym(edges).repartition("node"))
    active = pin_table(_nodes(edges))
    if active.count() == 0:
        release_state(sym)
        release_state(active)
        raise ValueError("luby_mis on an empty graph")
    done = None  # (id, in_mis, round)
    rounds = 0
    for r in range(1, max_rounds + 1):
        if active.count() == 0:
            break
        rounds = r
        winners = pin_table(_winners(sym, active, seed))
        losers = (
            sym.join(winners.select(F.col("id").alias("node")), "node", "left_semi")
            .select(F.col("nbr").alias("id"))
            .distinct()
            .join(active, "id", "left_semi")  # never re-decide old rounds
            .join(winners, "id", "left_anti")
        )
        decided = winners.select(
            "id", F.lit(True).alias("in_mis"), F.lit(r).cast("long").alias("round")
        ).unionByName(
            losers.select("id", F.lit(False).alias("in_mis"),
                          F.lit(r).cast("long").alias("round"))
        )
        new_done = pin_table(decided if done is None else done.unionByName(decided))
        new_active = pin_table(active.join(new_done.select("id"), "id", "left_anti"))
        if done is not None:
            release_state(done)
        release_state(active)
        release_state(winners)
        done, active = new_done, new_active
    release_state(active)
    release_state(sym)
    out = attach_caches(done.select("id", "in_mis", "round"), [done])
    n_mis = out.filter("in_mis").count()
    return ColoringResult(
        assignment=out, rounds=rounds, n_colors=None,
        stats={"rounds": rounds, "mis_size": n_mis, "seed": seed,
               "compute_s": round(time.time() - t0, 4)},
        _caches=[done],
    )


def jones_plassmann(
    edges: DataFrame, seed: int = 42, max_rounds: int = 128
) -> ColoringResult:
    """Greedy coloring: each round the local priority maxima among
    uncolored nodes take the mex of their colored neighbors' colors
    (see module docstring)."""
    t0 = time.time()
    sym = pin_table(_sym(edges).repartition("node"))
    active = pin_table(_nodes(edges))
    if active.count() == 0:
        release_state(sym)
        release_state(active)
        raise ValueError("jones_plassmann on an empty graph")
    colored = None  # (id, color, round)
    rounds = 0
    for r in range(1, max_rounds + 1):
        if active.count() == 0:
            break
        rounds = r
        winners = pin_table(_winners(sym, active, seed))
        if colored is not None:
            used = (
                sym.join(winners.select(F.col("id").alias("node")), "node", "left_semi")
                .join(colored.select(F.col("id").alias("nbr"), "color"), "nbr")
                .select("node", "color")
                .distinct()
            )
            n_used = (
                winners.join(used, winners.id == used.node, "left")
                .groupBy("id")
                .agg(F.count("color").alias("n"))
            )
            mex = (
                n_used.select(
                    "id",
                    F.explode(
                        F.sequence(F.lit(0).cast("long"), F.col("n").cast("long"))
                    ).alias("k"),
                )
                .join(
                    used.select(F.col("node").alias("id"),
                                F.col("color").cast("long").alias("k")),
                    ["id", "k"],
                    "left_anti",
                )
                .groupBy("id")
                .agg(F.min("k").alias("color"))
            )
        else:
            mex = winners.select("id", F.lit(0).alias("color"))
        decided = mex.select(
            "id", F.col("color").cast("long").alias("color"),
            F.lit(r).cast("long").alias("round"),
        )
        new_colored = pin_table(
            decided if colored is None else colored.unionByName(decided)
        )
        new_active = pin_table(active.join(winners, "id", "left_anti"))
        if colored is not None:
            release_state(colored)
        release_state(active)
        release_state(winners)
        colored, active = new_colored, new_active
    release_state(active)
    release_state(sym)
    out = attach_caches(colored.select("id", "color", "round"), [colored])
    n_colors = out.select("color").distinct().count()
    return ColoringResult(
        assignment=out, rounds=rounds, n_colors=n_colors,
        stats={"rounds": rounds, "n_colors": n_colors, "seed": seed,
               "compute_s": round(time.time() - t0, 4)},
        _caches=[colored],
    )


def _sql_prelude(edges_sql: str) -> list[str]:
    return [
        f"WITH e0 AS ({edges_sql})",
        """und AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
        GREATEST(src, dst) AS b FROM e0 WHERE src <> dst)""",
        """sym AS MATERIALIZED (SELECT a AS node, b AS nbr FROM und
        UNION ALL SELECT b, a FROM und)""",
        """a0 AS MATERIALIZED (SELECT DISTINCT id FROM (
        SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0))""",
    ]


def _win_sql(t: int, seed: int) -> list[str]:
    p = t - 1
    hn = _pri_sql("s.nbr", seed)
    ha = _pri_sql("a.id", seed)
    return [
        f"""mx{t} AS MATERIALIZED (SELECT node, h, i FROM (
  SELECT s.node, {hn} AS h, s.nbr AS i,
         ROW_NUMBER() OVER (PARTITION BY s.node
                            ORDER BY {hn} DESC, s.nbr DESC) AS rk
  FROM sym s JOIN a{p} an ON an.id = s.node
  JOIN a{p} an2 ON an2.id = s.nbr) WHERE rk = 1)""",
        f"""win{t} AS MATERIALIZED (SELECT a.id FROM a{p} a
  LEFT JOIN mx{t} m ON m.node = a.id
  WHERE m.node IS NULL OR {ha} > m.h OR ({ha} = m.h AND a.id > m.i))""",
    ]


def luby_mis_sql(edges_sql: str, seed: int, n_rounds: int) -> str:
    """Oracle: the Luby rounds unrolled (idempotent past the fixpoint —
    an empty active set yields empty win/lose CTEs)."""
    parts = _sql_prelude(edges_sql)
    parts.append("""d0 AS (SELECT CAST(NULL AS BIGINT) AS id,
        CAST(NULL AS BOOLEAN) AS in_mis, CAST(NULL AS BIGINT) AS round
        WHERE 1 = 0)""")
    for t in range(1, n_rounds + 1):
        p = t - 1
        parts += _win_sql(t, seed)
        parts.append(
            f"""lose{t} AS MATERIALIZED (SELECT DISTINCT s.nbr AS id
  FROM sym s JOIN win{t} w ON w.id = s.node
  WHERE s.nbr IN (SELECT id FROM a{p})
    AND s.nbr NOT IN (SELECT id FROM win{t}))"""
        )
        parts.append(
            f"""d{t} AS MATERIALIZED (SELECT * FROM d{p}
  UNION ALL SELECT id, TRUE, CAST({t} AS BIGINT) FROM win{t}
  UNION ALL SELECT id, FALSE, CAST({t} AS BIGINT) FROM lose{t})"""
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (SELECT id FROM a{p}
  WHERE id NOT IN (SELECT id FROM win{t})
    AND id NOT IN (SELECT id FROM lose{t}))"""
        )
    return ",\n".join(parts) + f"\nSELECT id, in_mis, round FROM d{n_rounds}"


def jones_plassmann_sql(edges_sql: str, seed: int, n_rounds: int) -> str:
    """Oracle: the coloring rounds unrolled — relational mex exactly as
    the engine computes it (explode 0..n_colored_nbrs, anti-join used
    colors, MIN)."""
    parts = _sql_prelude(edges_sql)
    parts.append("""c0 AS (SELECT CAST(NULL AS BIGINT) AS id,
        CAST(NULL AS BIGINT) AS color, CAST(NULL AS BIGINT) AS round
        WHERE 1 = 0)""")
    for t in range(1, n_rounds + 1):
        p = t - 1
        parts += _win_sql(t, seed)
        parts.append(
            f"""used{t} AS MATERIALIZED (SELECT DISTINCT s.node, c.color
  FROM sym s JOIN win{t} w ON w.id = s.node
  JOIN c{p} c ON c.id = s.nbr)"""
        )
        parts.append(
            f"""mex{t} AS MATERIALIZED (SELECT id, MIN(k) AS color FROM (
  SELECT n.id, UNNEST(generate_series(0, n.n)) AS k FROM (
    SELECT w.id, COUNT(u.color) AS n FROM win{t} w
    LEFT JOIN used{t} u ON u.node = w.id GROUP BY w.id) n) x
  WHERE NOT EXISTS (SELECT 1 FROM used{t} u
                    WHERE u.node = x.id AND u.color = x.k)
  GROUP BY id)"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (SELECT * FROM c{p}
  UNION ALL SELECT id, CAST(color AS BIGINT), CAST({t} AS BIGINT) FROM mex{t})"""
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (SELECT id FROM a{p}
  WHERE id NOT IN (SELECT id FROM win{t}))"""
        )
    return ",\n".join(parts) + f"\nSELECT id, color, round FROM c{n_rounds}"
