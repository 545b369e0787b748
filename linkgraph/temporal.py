"""Temporal (time-respecting) path operators over timestamped edges.

An edge (src, dst, ts) can only extend a journey that reaches ``src``
no later than ``ts`` (non-strict; ``strict=True`` requires strictly
earlier) — the standard temporal-graph reachability model (Wu et al.,
VLDB 2014, "Path Problems in Temporal Graphs"). Static procedures
(the reference family's shortestPath/unionFind — SURVEY.md §2
anchors) ignore edge time and overstate reachability; the temporal
variant is what event/transaction graphs actually need.

Spark-first design: ``earliest_arrival`` is Bellman-Ford-style
min-lattice relaxation with FRONTIER-ONLY propagation — per round,
one join of the changed nodes against the edge table with the time
guard pushed into the join condition, then a map-side-combinable
``groupBy(dst).min(ts)`` and a merge with the state. Exact under the
monotone min lattice (any improvement originates at an improved
node), converges in at most n-1 rounds, frontier shrinks like WCC's
delta iteration. State is (id, arrival) — O(n), never O(paths).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import SuperstepLoop, release_state


@dataclass
class TemporalResult:
    arrivals: DataFrame  # (id, arrival) — reached nodes only
    rounds: int

    def release(self) -> None:
        release_state(self.arrivals)


def earliest_arrival(
    edges: DataFrame,
    source: int,
    start_ts: int = 0,
    strict: bool = False,
    dur_col: str | None = None,
    max_rounds: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> TemporalResult:
    """Earliest time each node is reachable from ``source`` by a
    time-respecting journey departing at ``start_ts``.

    ``edges`` must carry (src, dst, ts) with an integer/orderable
    ``ts``. Returns only reached nodes; the source row carries
    ``start_ts``. Resumable with the usual manifest contract.

    ``dur_col`` names an optional travel-duration column: an edge
    departing at ``ts`` then ARRIVES at ``ts + dur`` (the general
    temporal-journey model; omitted = instantaneous edges).
    """
    cols = ["src", "dst", F.col("ts").cast("long").alias("ts")]
    if dur_col is not None:
        cols.append(F.col(dur_col).cast("long").alias("dur"))
    e = edges.select(*cols)
    spark = e.sparkSession

    ctx = {
        "source": int(source), "start_ts": int(start_ts),
        "strict": bool(strict), "dur_col": dur_col,
    }
    loop = SuperstepLoop(
        spark, checkpoint_dir=checkpoint_dir, every=checkpoint_every,
        name="earliest_arrival", context=ctx,
    )
    start_round = 0
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = {k: loop.last_context.get(k) for k in ctx}
            if rec != ctx:
                raise ValueError(
                    f"earliest_arrival resume mismatch: checkpoint was "
                    f"written with {rec}, this call passes {ctx}; resuming "
                    "would merge arrivals of a different journey problem"
                )
            start_round, state = resumed
    if state is None:
        state = spark.createDataFrame(
            [(int(source), int(start_ts), True)],
            "id long, arrival long, changed boolean",
        )
        state = loop.advance(0, state)

    if max_rounds is None:
        # earliest arrival finalizes >=1 node per round (min lattice):
        # n-1 rounds suffice; cap by the node universe lazily
        max_rounds = (
            e.select("src").union(e.select("dst")).distinct().count()
        )

    guard = (F.col("ts") > F.col("arrival")) if strict else (
        F.col("ts") >= F.col("arrival")
    )
    rounds = start_round
    while rounds < max_rounds:
        frontier = state.filter(F.col("changed")).select("id", "arrival")
        arrive = (
            (F.col("ts") + F.col("dur")) if dur_col is not None else F.col("ts")
        )
        cand = (
            frontier.join(e, (frontier.id == e.src) & guard)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(arrive).alias("cand"))
        )
        merged = (
            state.select("id", "arrival")
            .join(cand, "id", "full_outer")
            .select(
                "id",
                # Spark's least() skips nulls: new nodes take cand,
                # unimproved nodes keep arrival
                F.least("arrival", "cand").alias("arrival"),
                (
                    F.col("arrival").isNull()
                    | (F.coalesce("cand", F.lit(2**62)) < F.col("arrival"))
                ).alias("changed"),
            )
        )
        rounds += 1
        state = loop.advance(rounds, merged, metrics={"round": rounds})
        if state.filter(F.col("changed")).limit(1).count() == 0:
            break

    return TemporalResult(
        arrivals=state.select("id", "arrival"), rounds=rounds
    )


def earliest_arrival_sql(
    edges_sql: str,
    source_sql: str,
    start_ts: int = 0,
    strict: bool = False,
    with_duration: bool = False,
) -> str:
    """DuckDB oracle: recursive journey expansion with the time guard
    in the join; terminates because (id, ts) states are drawn from the
    finite edge set and UNION deduplicates."""
    op = ">" if strict else ">="
    arrive = "e.ts + e.dur" if with_duration else "e.ts"
    return f"""
WITH RECURSIVE
e AS MATERIALIZED ({edges_sql}),
r(id, arr) AS (
  SELECT ({source_sql}), CAST({start_ts} AS BIGINT)
  UNION
  SELECT e.dst, {arrive} FROM r JOIN e ON e.src = r.id AND e.ts {op} r.arr
)
SELECT id, MIN(arr) AS arrival FROM r GROUP BY id
"""


def latest_departure(
    edges: DataFrame,
    target: int,
    deadline: int,
    strict: bool = False,
    max_rounds: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> TemporalResult:
    """Latest time each node can depart and still reach ``target`` by
    ``deadline`` via a time-respecting journey — the backward dual of
    :func:`earliest_arrival` (max lattice over reversed edges: an edge
    (v, u, ts) is usable iff ts <= departure(u), and departing v at ts
    is feasible). The target row carries ``deadline``. Returns only
    nodes that can reach the target at all.
    """
    e = edges.select("src", "dst", F.col("ts").cast("long").alias("ts"))
    spark = e.sparkSession

    ctx = {
        "target": int(target), "deadline": int(deadline),
        "strict": bool(strict),
    }
    loop = SuperstepLoop(
        spark, checkpoint_dir=checkpoint_dir, every=checkpoint_every,
        name="latest_departure", context=ctx,
    )
    start_round = 0
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = {k: loop.last_context.get(k) for k in ctx}
            if rec != ctx:
                raise ValueError(
                    f"latest_departure resume mismatch: checkpoint was "
                    f"written with {rec}, this call passes {ctx}"
                )
            start_round, state = resumed
    if state is None:
        state = spark.createDataFrame(
            [(int(target), int(deadline), True)],
            "id long, departure long, changed boolean",
        )
        state = loop.advance(0, state)

    if max_rounds is None:
        max_rounds = (
            e.select("src").union(e.select("dst")).distinct().count()
        )

    guard = (F.col("ts") < F.col("departure")) if strict else (
        F.col("ts") <= F.col("departure")
    )
    rounds = start_round
    while rounds < max_rounds:
        frontier = state.filter(F.col("changed")).select("id", "departure")
        cand = (
            frontier.join(e, (frontier.id == e.dst) & guard)
            .groupBy(F.col("src").alias("id"))
            .agg(F.max("ts").alias("cand"))
        )
        merged = (
            state.select("id", "departure")
            .join(cand, "id", "full_outer")
            .select(
                "id",
                F.greatest("departure", "cand").alias("departure"),
                (
                    F.col("departure").isNull()
                    | (F.coalesce("cand", F.lit(-(2**62))) > F.col("departure"))
                ).alias("changed"),
            )
        )
        rounds += 1
        state = loop.advance(rounds, merged, metrics={"round": rounds})
        if state.filter(F.col("changed")).limit(1).count() == 0:
            break

    return TemporalResult(
        arrivals=state.select("id", F.col("departure")), rounds=rounds
    )


def latest_departure_sql(
    edges_sql: str, target_sql: str, deadline: int, strict: bool = False
) -> str:
    op = "<" if strict else "<="
    return f"""
WITH RECURSIVE
e AS MATERIALIZED ({edges_sql}),
r(id, dep) AS (
  SELECT ({target_sql}), CAST({deadline} AS BIGINT)
  UNION
  SELECT e.src, e.ts FROM r JOIN e ON e.dst = r.id AND e.ts {op} r.dep
)
SELECT id, MAX(dep) AS departure FROM r GROUP BY id
"""
