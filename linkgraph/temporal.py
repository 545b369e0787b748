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


def temporal_pagerank(
    edges: DataFrame,
    n_windows: int = 8,
    b_num: int = 4,
    b_den: int = 5,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """Windowed temporal PageRank — a per-window discretization of
    Rozenshtein-Gionis temporal PageRank (ECML-PKDD 2016, public
    result): influence flows only FORWARD in time. The timestamp range
    is split into ``n_windows`` equal buckets processed in order; in
    window w every node with out-edges there sends its current mass
    (a fresh unit injection + the beta-decayed carry accumulated from
    earlier windows) equally over its window-w out-edges; receivers
    add the arrivals to their carry AND to their running rank, and a
    SENDER'S carry is depleted by the send (reset to 0, then
    refilled by anything it receives in the same window) — the
    walk-like mass conservation of the cited model; without the
    depletion a hub active in every window would retransmit its whole
    accumulated carry each time, inflating downstream ranks
    quadratically in the window count. A
    static graph replayed in one window degenerates to one damped
    PageRank push — the time ordering is exactly what the static
    procedure cannot see (a follower gained BEFORE a node became
    popular transmits influence; one gained after does not).

    Cross-engine exactness: beta is the rational ``b_num/b_den``;
    mass is integer micro-domain; the per-edge share is ONE half-up
    division ``(2·m + den·d) DIV (2·den·d)`` with the decay folded
    into the numerator — the DuckDB twin (`temporal_pagerank_sql`)
    is hash-exact. Window ids are pure integer arithmetic
    ``(ts - min)·W div (max - min + 1)``.

    Returns (id, rank) — accumulated received influence / 1e6,
    rounded 6; nodes that never receive are absent.

    Scale notes (100TB): W driver rounds (a knob, not data-driven);
    per round one degree aggregate + one push join + one
    groupBy(node) over the WINDOW's edges only (partition-prune the
    bucket column at the source for a 1/W scan per round); carry
    state is one row per ever-active node. SuperstepLoop resume at
    window granularity with a graph fingerprint."""
    if n_windows < 1:
        raise ValueError(f"n_windows must be >= 1: got {n_windows}")
    if not (0 < b_num <= b_den):
        raise ValueError(f"beta must be rational in (0, 1]: {b_num}/{b_den}")
    from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state
    from linkgraph.kcore import _check_resume_fp

    spark = edges.sparkSession
    e = pin_table(
        edges.select("src", "dst", F.col("ts").cast("long").alias("ts"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    bounds = e.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    if bounds["lo"] is None:
        release_state(e)
        return spark.createDataFrame([], "id long, rank double")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    w = int(n_windows)
    eb = pin_table(
        e.select(
            "src", "dst",
            F.expr(f"CAST(((ts - {lo}) * {w}) DIV {span} AS BIGINT)")
            .alias("win"),
        )
    )
    fp = (
        int(eb.agg(F.expr("bit_xor(xxhash64(src, dst, win))").alias("f"))
            .first()["f"] or 0)
        if checkpoint_dir else None
    )
    params = {"n_windows": w, "b_num": b_num, "b_den": b_den}
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every,
        name="temporalpr", max_steps=w,
        context={"graph_fp": fp, "params": params},
    )
    # state: (node, carry, rank) micro ints
    state = spark.createDataFrame([], "node long, carry long, rank long")
    start = 0
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "temporal_pagerank", loop.last_context.get("graph_fp"), fp
            )
            rec = loop.last_context.get("params")
            if rec is not None and rec != params:
                raise ValueError(
                    "temporal_pagerank resume mismatch: checkpointed "
                    f"params {rec!r} != requested {params!r}."
                )
            start, state = resumed
            state = state.select("node", "carry", "rank")
    for win in range(start, w):
        ew = eb.filter(F.col("win") == win).select("src", "dst")
        deg = ew.groupBy("src").agg(F.count("*").cast("long").alias("d"))
        # sender mass: fresh injection + decayed carry, divided per edge
        # share = half_up(b_num*(1e6*b_den + b_num*carry_scaled...)):
        # m = 1e6 + beta*carry -> share = half_up(m / d) with
        # m in micro units: beta*carry = half_up(b_num*carry/b_den)
        senders = (
            deg.join(
                state.select(F.col("node").alias("src"), "carry"),
                "src", "left",
            )
            .select(
                "src", "d",
                (F.lit(1_000_000)
                 + F.expr(f"(2 * {b_num} * coalesce(carry, 0) + {b_den}) "
                          f"DIV (2 * {b_den})")).alias("m"),
            )
        )
        recv = (
            ew.join(senders, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(2 * m + d) DIV (2 * d)").cast("long").alias("v"),
            )
            .groupBy("node")
            .agg(F.sum("v").alias("got"))
        )
        sent = ew.select(F.col("src").alias("node")).distinct().withColumn(
            "sent", F.lit(1)
        )
        nxt = (
            state.join(recv, "node", "full")
            .join(sent, "node", "left")
            .select(
                "node",
                (F.when(F.col("sent").isNotNull(), F.lit(0))
                 .otherwise(F.coalesce(F.col("carry"), F.lit(0)))
                 + F.coalesce(F.col("got"), F.lit(0))).cast("long")
                .alias("carry"),
                (F.coalesce(F.col("rank"), F.lit(0))
                 + F.coalesce(F.col("got"), F.lit(0))).cast("long")
                .alias("rank"),
            )
        )
        state = loop.advance(win + 1, nxt, metrics={"window": win + 1})
    out = (
        state.filter(F.col("rank") > 0)
        .select(
            F.col("node").alias("id"),
            F.round(F.col("rank") / 1_000_000.0, 6).alias("rank"),
        )
    )
    release_state(e)
    release_state(eb)
    return out


def temporal_pagerank_sql(
    edges_sql: str, n_windows: int = 8, b_num: int = 4, b_den: int = 5
) -> str:
    """DuckDB twin of `temporal_pagerank`: identical window bucketing
    and per-window half-up pushes, unrolled."""
    w = int(n_windows)
    parts = [
        f"WITH e AS ({edges_sql})",
        """ed AS MATERIALIZED (SELECT DISTINCT src, dst,
  CAST(ts AS BIGINT) AS ts FROM e WHERE src <> dst)""",
        "bounds AS (SELECT MIN(ts) AS lo, MAX(ts) AS hi FROM ed)",
        f"""eb AS MATERIALIZED (SELECT src, dst,
  CAST(((ed.ts - b.lo) * {w}) // (b.hi - b.lo + 1) AS BIGINT) AS win
  FROM ed CROSS JOIN bounds b)""",
        "s0 AS (SELECT CAST(NULL AS BIGINT) AS node,"
        " CAST(0 AS BIGINT) AS carry, CAST(0 AS BIGINT) AS rank WHERE FALSE)",
    ]
    for t in range(w):
        parts.append(
            f"""r{t} AS MATERIALIZED (
  SELECT ew.dst AS node, CAST(SUM((2 * s.m + s.d) // (2 * s.d)) AS BIGINT) AS got
  FROM (SELECT src, dst FROM eb WHERE win = {t}) ew
  JOIN (
    SELECT d.src, d.d,
           1000000 + (2 * {b_num} * COALESCE(p.carry, 0) + {b_den})
             // (2 * {b_den}) AS m
    FROM (SELECT src, CAST(COUNT(*) AS BIGINT) AS d
          FROM eb WHERE win = {t} GROUP BY src) d
    LEFT JOIN s{t} p ON p.node = d.src) s ON s.src = ew.src
  GROUP BY ew.dst)"""
        )
        parts.append(
            f"""s{t + 1} AS MATERIALIZED (
  SELECT COALESCE(p.node, r.node) AS node,
         CAST(CASE WHEN COALESCE(p.node, r.node) IN
                  (SELECT src FROM eb WHERE win = {t})
              THEN 0 ELSE COALESCE(p.carry, 0) END
              + COALESCE(r.got, 0) AS BIGINT) AS carry,
         CAST(COALESCE(p.rank, 0) + COALESCE(r.got, 0) AS BIGINT) AS rank
  FROM s{t} p FULL OUTER JOIN r{t} r ON r.node = p.node)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT node AS id, ROUND(CAST(rank AS DOUBLE) / 1000000.0, 6) AS rank
FROM s{w} WHERE rank > 0"""
    )


def temporal_closeness(
    edges: DataFrame,
    source: int,
    start_ts: int = 0,
    strict: bool = False,
    dur_col: str | None = None,
) -> DataFrame:
    """Temporal closeness of ``source`` (Pan & Saramäki PRE 2011 /
    the temporal-centrality lineage — public results): the harmonic
    sum of inverse earliest-arrival DELAYS,
    ``Σ_{v reached, v≠s} 1/(arr_v − start_ts)``, so nodes reachable
    SOONER contribute more and unreachable nodes contribute 0 — the
    time-respecting analog of harmonic centrality, composing
    ``earliest_arrival``'s journey machinery unchanged.

    Cross-engine exactness (the harmonic/dangalchev discipline):
    every 1/delay term is quantized to int64 nano-units
    (ROUND(1e9/delay)) before an order-free SUM; only the final
    /1e9 rescale is a float (rounded 6). Delay-0 nodes (arrival at
    ``start_ts`` itself via instantaneous edges) contribute a full
    1e9 unit per the 1/max(delay,1) convention, disclosed here.
    Returns ONE row (source, n_reached, closeness); replayed by
    ``temporal_closeness_sql``.
    """
    res = earliest_arrival(edges, source, start_ts=start_ts, strict=strict,
                           dur_col=dur_col)
    out = (
        res.arrivals.filter(F.col("id") != source)
        .select(
            F.expr(
                f"CAST(ROUND(1e9 / GREATEST(arrival - {int(start_ts)}, 1), 0) "
                "AS BIGINT)"
            ).alias("t9")
        )
        .agg(F.count("*").alias("n_reached"), F.sum("t9").alias("s9"))
        .select(
            F.lit(int(source)).cast("long").alias("source"),
            F.col("n_reached").cast("long").alias("n_reached"),
            F.round(F.coalesce(F.col("s9"), F.lit(0)) / 1e9, 6)
            .alias("closeness"),
        )
    )
    return out


def temporal_closeness_sql(
    edges_sql: str,
    source: int,
    start_ts: int = 0,
    strict: bool = False,
) -> str:
    """Oracle: the same nano-unit harmonic sum over the
    earliest-arrival oracle."""
    return f"""
WITH arr AS ({earliest_arrival_sql(edges_sql, str(source), start_ts=start_ts,
                                   strict=strict)})
SELECT CAST({int(source)} AS BIGINT) AS source,
       CAST(COUNT(*) AS BIGINT) AS n_reached,
       ROUND(COALESCE(SUM(CAST(ROUND(1e9 / GREATEST(arrival - {int(start_ts)},
                                                    1), 0) AS BIGINT)), 0)
             / 1e9, 6) AS closeness
FROM arr WHERE id <> {int(source)}
"""
