"""Girth — shortest-cycle length by branch-tracked multi-source BFS.

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): the Itai-Rodeh BFS girth algorithm (SIAM
J. Comput. 1978 — public result). From every source s run a BFS that
records each node's DISTANCE and BRANCH (the first hop of the first
shortest path that reached it, min-id on simultaneous arrivals); an
edge (x, y) whose endpoints carry different branches witnesses a
closed walk through s of length d(x) + d(y) + 1 that contains a
cycle. Per Itai-Rodeh the minimum witness over all sources is the
girth g or g + 1 — exact for odd girth, possibly one high for even
girth (the even cycle can hide behind a branch tie). The contract is
therefore an INTERVAL: ``girth_upper`` ∈ {g, g+1}, and the tests pin
the bound against brute-force girth, not equality.

All sources advance in ONE (s, node)-keyed frontier (the MS-BFS
batching used by closeness/APSP); with ``sources`` given, the same
machinery estimates from a sample (upper bound only — a sampled run
can miss every node of the shortest cycle).

Scale notes (100TB): per round one frontier-vs-pinned-sym join + one
(s, node) first-arrival aggregate; state is the reach ball per
source. The witness probe is one join of the edge table against the
final state (twice, source-keyed). Rounds stop at ``max_hops`` (the
SQL-twin contract) or when every frontier empties — a shortest cycle
is witnessed within ceil(g/2)+1 rounds, so max_hops bounds the
DETECTABLE girth at 2·max_hops+1, disclosed in the result stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state
from linkgraph.kcore import _sym_simple


@dataclass
class GirthResult:
    witnesses: DataFrame  # (source, cycle_len) — min witness per source
    girth_upper: int | None  # min over sources; None if no cycle seen
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def girth(
    edges: DataFrame,
    sources: list[int] | None = None,
    max_hops: int = 16,
) -> GirthResult:
    """Branch-tracked BFS girth. ``sources=None`` scans every node
    (girth_upper ∈ {g, g+1}); a source list gives a sampled upper
    bound. Returns per-source minimum witnesses and the global min."""
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1: got {max_hops}")
    spark = edges.sparkSession
    sym = pin_table(_sym_simple(edges))
    if sources is None:
        src = sym.select(F.col("a").alias("s")).distinct()
    else:
        if len(set(sources)) != len(sources):
            raise ValueError("sources must be distinct")
        src = spark.createDataFrame([(int(x),) for x in sources], "s long")
    # state: (s, node, dist, br); source row: dist 0, br = s
    state = pin_table(
        src.select("s", F.col("s").alias("node"),
                   F.lit(0).cast("long").alias("dist"),
                   F.col("s").alias("br"))
    )
    frontier = state
    loop = SuperstepLoop(spark, name="girthbfs", max_steps=max_hops)
    for it in range(1, max_hops + 1):
        pushed = (
            frontier.withColumnRenamed("node", "a")
            .join(sym, "a")
            .select(
                "s", F.col("b").alias("node"),
                (F.col("dist") + 1).alias("dist"),
                # the branch is the first hop: at dist 1 the node
                # itself, afterwards inherited
                F.when(F.col("dist") == 0, F.col("b"))
                .otherwise(F.col("br")).alias("br"),
            )
        )
        arrivals = (
            pushed.join(state.select("s", "node"), ["s", "node"], "left_anti")
            .groupBy("s", "node")
            .agg(F.min("dist").alias("dist"), F.min("br").alias("br"))
        )
        nxt_frontier = loop.advance(it, arrivals, metrics={"hop": it})
        n_new = nxt_frontier.count()
        prev_state = state
        state = pin_table(state.unionByName(nxt_frontier))
        # the union is pinned; the previous cumulative pin would
        # otherwise stack one persisted copy per BFS round
        release_state(prev_state)
        frontier = nxt_frontier
        if n_new == 0:
            break
    sx = state.select("s", F.col("node").alias("a"),
                      F.col("dist").alias("dx"), F.col("br").alias("bx"))
    sy = state.select("s", F.col("node").alias("b"),
                      F.col("dist").alias("dy"), F.col("br").alias("by"))
    witnesses = (
        sym.filter(F.col("a") < F.col("b"))
        .join(sx, "a")
        .join(sy, ["s", "b"])
        # a witness edge incident to the source is its own tree edge —
        # the formula degenerates at dist 0, so both endpoints must be
        # proper BFS nodes
        .filter((F.col("bx") != F.col("by"))
                & (F.col("dx") >= 1) & (F.col("dy") >= 1))
        .groupBy("s")
        .agg(F.min(F.col("dx") + F.col("dy") + 1).cast("long")
             .alias("cycle_len"))
        .select(F.col("s").alias("source"), "cycle_len")
    )
    w = pin_table(witnesses)
    row = w.agg(F.min("cycle_len")).first()
    g_up = int(row[0]) if row[0] is not None else None
    release_state(sym)
    return GirthResult(
        witnesses=w,
        girth_upper=g_up,
        stats={"max_hops": max_hops,
               "detectable_upper": 2 * max_hops + 1,
               "sampled": sources is not None},
        _caches=[w, state],
    )


def girth_sql(
    edges_sql: str, sources: list[int] | None = None, max_hops: int = 16
) -> str:
    """DuckDB twin of `girth`: the same first-arrival min-branch BFS
    unrolled ``max_hops`` rounds, then the same witness probe."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
    ]
    if sources is None:
        parts.append("src AS (SELECT DISTINCT a AS s FROM sym)")
    else:
        vals = ", ".join(f"({int(x)})" for x in sources)
        parts.append(
            f"src AS (SELECT CAST(x AS BIGINT) AS s FROM (VALUES {vals}) v(x))"
        )
    parts.append(
        "t0 AS MATERIALIZED (SELECT s, s AS node,"
        " CAST(0 AS BIGINT) AS dist, s AS br FROM src)"
    )
    for t in range(1, max_hops + 1):
        prev = " UNION ALL ".join(
            f"SELECT s, node FROM t{i}" for i in range(t)
        )
        parts.append(
            f"""t{t} AS MATERIALIZED (
  SELECT arr.s, arr.node, CAST({t} AS BIGINT) AS dist, MIN(arr.br) AS br
  FROM (
    SELECT f.s, sym.b AS node,
           CASE WHEN f.dist = 0 THEN sym.b ELSE f.br END AS br
    FROM t{t - 1} f JOIN sym ON sym.a = f.node) arr
  WHERE NOT EXISTS (SELECT 1 FROM ({prev}) p
                    WHERE p.s = arr.s AND p.node = arr.node)
  GROUP BY arr.s, arr.node)"""
        )
    allstate = " UNION ALL ".join(
        f"SELECT s, node, dist, br FROM t{i}" for i in range(max_hops + 1)
    )
    parts.append(f"st AS MATERIALIZED ({allstate})")
    return (
        ",\n".join(parts)
        + """
SELECT sx.s AS source, CAST(MIN(sx.dist + sy.dist + 1) AS BIGINT) AS cycle_len
FROM sym
JOIN st sx ON sx.node = sym.a
JOIN st sy ON sy.s = sx.s AND sy.node = sym.b
WHERE sym.a < sym.b AND sx.br <> sy.br AND sx.dist >= 1 AND sy.dist >= 1
GROUP BY sx.s"""
    )
