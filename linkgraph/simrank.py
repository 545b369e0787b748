"""SimRank — structural-context node similarity (Jeh & Widom, KDD'02).

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): SimRank is the classic link-based
"similar objects are referenced by similar objects" score, the
recursive companion to the one-hop neighborhood metrics in
``linkgraph/similarity.py`` (Jaccard/overlap look at direct
neighborhoods; SimRank propagates similarity through them).

Semantics (public definition): s(a, a) = 1 and for a != b

    s(a, b) = C / (|I(a)| * |I(b)|) * sum_{i in I(a), j in I(b)} s(i, j)

with s(a, b) = 0 when either in-neighborhood is empty. The engine
iterates the recurrence ``iterations`` times from s0 = identity —
the standard truncated fixpoint, monotonically converging from below.

Cross-engine exactness: scores live in the integer micro-domain
(s * 1e6 as BIGINT). Each round's off-diagonal update is

    s' = round_half_up(c_num * num / (c_den * da * db))
       = (2 * c_num * num + c_den * da * db) DIV (2 * c_den * da * db)

pure BIGINT arithmetic (num = sum of micro-scores over in-neighbor
pairs <= 1e6 * da * db, so the numerator is bounded by
2 * c_num * 1e6 * da^2 * db^2-ish far under int64 for gated sizes),
so the DuckDB twin (`simrank_sql`) matches hash-exact with no float
tolerance. C defaults to 0.8 as the rational 4/5.

Scale notes (100TB): the pair state is O(n^2) worst case and each
round expands state x in-degree^2 before the (a, b) re-aggregation —
SimRank exact mode is a small-graph / similarity-subgraph tool, gated
by ``exact_warn_nodes`` exactly like exact closeness/betweenness
(linkgraph/paths.py). The scalable deployment shape is: restrict to a
community/ego subgraph first (``induced_subgraph``,
``contract_graph``), or keep state sparse via ``min_score_micro``
(drop pairs whose score rounds to 0 — the state only keeps pairs
with a surviving similarity path, which on sparse graphs is far
below n^2). Each round costs three hash exchanges: the two in-edge
probes (state joined on a then b) and the (a, b) sum; the in-edge
table is pinned once and reused every round. Random-walk sampled
single-source SimRank is the published big-graph path and composes
with ``linkgraph/walks.py`` if needed.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state

_DIRECTIONS = ("OUTGOING", "INCOMING", "BOTH")


@dataclass
class SimRankResult:
    pairs: DataFrame  # (node1 < node2, score: double rounded 6)
    iterations: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the pinned frames backing ``pairs`` (the final
        state and the in-neighbor table)."""
        for df in self._caches:
            release_state(df)
        self._caches.clear()


def _in_neighbors(edges: DataFrame, direction: str) -> DataFrame:
    # CONTRACT NOTE: this is the in-neighbor-keyed sibling of
    # linkgraph.localcom._directed_view / kcore._sym_simple — all
    # three share the simple-view semantics (self-loops dropped,
    # duplicates collapsed); a change to one must mirror the others.
    """(node, nbr) distinct in-neighbor table under ``direction``,
    self-loops dropped (simple-graph SimRank)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "OUTGOING":
        ine = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    elif direction == "INCOMING":
        ine = e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    else:
        ine = e.select(F.col("dst").alias("node"), F.col("src").alias("nbr")).union(
            e.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        )
    return ine.distinct()


def simrank(
    edges: DataFrame,
    direction: str = "OUTGOING",
    iterations: int = 5,
    c_num: int = 4,
    c_den: int = 5,
    min_score_micro: int = 1,
    exact_warn_nodes: int = 10_000,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> SimRankResult:
    """Truncated SimRank fixpoint over the edge table (module
    docstring has the recurrence and the integer micro-domain
    rounding contract).

    min_score_micro: off-diagonal pairs whose rounded micro-score
      falls below this leave the state (default 1 = drop exact
      zeros only — lossless, since a zero pair contributes zero to
      every later round). Raising it trades exactness for a sparser
      state on large graphs.
    resume: with a ``checkpoint_dir``, continue from the last durable
      round; guarded by a graph fingerprint + parameter check in the
      manifest context (same contract as scc/kcore resume).
    """
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    if not (0 < c_num < c_den):
        raise ValueError(f"need 0 < c_num < c_den (C in (0,1)), got {c_num}/{c_den}")
    spark = edges.sparkSession

    ine = pin_table(_in_neighbors(edges, direction))
    deg = pin_table(ine.groupBy("node").agg(F.count("*").alias("d")))
    nodes = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    n = nodes.count()
    if n > exact_warn_nodes:
        warnings.warn(
            f"simrank exact mode on {n} nodes: pair state is O(n^2) "
            "worst case — restrict to a subgraph (induced_subgraph / "
            "contract_graph) or raise min_score_micro",
            stacklevel=2,
        )

    fp = int(
        ine.agg(F.expr("bit_xor(xxhash64(node, nbr))").alias("fp")).first()["fp"] or 0
    )
    params = f"{direction}|{c_num}/{c_den}|min{min_score_micro}"
    loop = SuperstepLoop(
        spark,
        checkpoint_dir,
        every=checkpoint_every,
        name="simrank",
        context={"graph_fp": fp, "params": params},
        max_steps=iterations,
    )
    diag = nodes.select(
        F.col("id").alias("a"), F.col("id").alias("b"),
        F.lit(1_000_000).cast("long").alias("s"),
    )
    start = 0
    state = diag
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            rec_fp = loop.last_context.get("graph_fp")
            rec_params = loop.last_context.get("params")
            if (rec_fp is not None and int(rec_fp) != fp) or (
                rec_params is not None and rec_params != params
            ):
                raise ValueError(
                    "simrank resume mismatch: graph fingerprint or "
                    f"parameters differ from the checkpointed run "
                    f"(fp {rec_fp} != {fp} or params {rec_params!r} != "
                    f"{params!r}). Rerun without resume or with the "
                    "original inputs."
                )
            start, state = resumed

    ea = ine.select(F.col("node").alias("na"), F.col("nbr").alias("a"))
    eb = ine.select(F.col("node").alias("nb"), F.col("nbr").alias("b"))
    da = deg.select(F.col("node").alias("na"), F.col("d").alias("dda"))
    db = deg.select(F.col("node").alias("nb"), F.col("d").alias("ddb"))
    it = start
    for it in range(start + 1, iterations + 1):
        contrib = (
            state.filter(F.col("s") > 0)
            .join(ea, "a")
            .join(eb, "b")
            .filter(F.col("na") != F.col("nb"))
            .groupBy("na", "nb")
            .agg(F.sum("s").alias("num"))
        )
        off = (
            contrib.join(F.broadcast(da), "na")
            .join(F.broadcast(db), "nb")
            .select(
                F.col("na").alias("a"),
                F.col("nb").alias("b"),
                F.expr(
                    f"(2 * {c_num} * num + {c_den} * dda * ddb) "
                    f"DIV (2 * {c_den} * dda * ddb)"
                ).cast("long").alias("s"),
            )
            .filter(F.col("s") >= min_score_micro)
        )
        state = loop.advance(
            it, diag.unionByName(off), metrics={"iteration": it}
        )
    n_pairs = state.count()
    final = pin_table(state)
    pairs = final.filter(F.col("a") < F.col("b")).select(
        F.col("a").alias("node1"),
        F.col("b").alias("node2"),
        F.round(F.col("s") / 1_000_000.0, 6).alias("score"),
    )
    return SimRankResult(
        pairs=pairs,
        iterations=it,
        stats={"n_nodes": n, "state_rows": n_pairs, "c": f"{c_num}/{c_den}"},
        _caches=[final, ine, deg],
    )


def simrank_sql(
    edge_sql: str,
    direction: str = "OUTGOING",
    iterations: int = 5,
    c_num: int = 4,
    c_den: int = 5,
    min_score_micro: int = 1,
) -> str:
    """DuckDB twin of `simrank`: the identical integer micro-domain
    recurrence unrolled ``iterations`` times (MATERIALIZED per round —
    each round references the previous twice via the two in-edge
    probes, the exponential re-expansion trap)."""
    if direction == "OUTGOING":
        ine = "SELECT DISTINCT dst AS node, src AS nbr FROM e WHERE src <> dst"
    elif direction == "INCOMING":
        ine = "SELECT DISTINCT src AS node, dst AS nbr FROM e WHERE src <> dst"
    else:
        ine = (
            "SELECT DISTINCT node, nbr FROM ("
            "SELECT dst AS node, src AS nbr FROM e WHERE src <> dst "
            "UNION ALL SELECT src, dst FROM e WHERE src <> dst)"
        )
    parts = [
        f"WITH e AS ({edge_sql})",
        f"ine AS MATERIALIZED ({ine})",
        "deg AS MATERIALIZED (SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM ine GROUP BY node)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst FROM e))",
        "s0 AS MATERIALIZED (SELECT id AS a, id AS b, CAST(1000000 AS BIGINT) AS s FROM nodes)",
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"""s{t} AS MATERIALIZED (
  SELECT id AS a, id AS b, CAST(1000000 AS BIGINT) AS s FROM nodes
  UNION ALL
  SELECT a, b, s FROM (
    SELECT c.a, c.b,
           (2 * {c_num} * c.num + {c_den} * da.d * db.d)
             // (2 * {c_den} * da.d * db.d) AS s
    FROM (
      SELECT ea.node AS a, eb.node AS b, SUM(p.s) AS num
      FROM s{t - 1} p
      JOIN ine ea ON ea.nbr = p.a
      JOIN ine eb ON eb.nbr = p.b
      WHERE ea.node <> eb.node AND p.s > 0
      GROUP BY 1, 2) c
    JOIN deg da ON da.node = c.a
    JOIN deg db ON db.node = c.b)
  WHERE s >= {min_score_micro})"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT a AS node1, b AS node2,
       ROUND(CAST(s AS DOUBLE) / 1000000.0, 6) AS score
FROM s{iterations} WHERE a < b"""
    )


def simrank_sampled(
    edges: DataFrame,
    query_node: int,
    walk_length: int = 5,
    walks_per_node: int = 8,
    c_num: int = 4,
    c_den: int = 5,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> DataFrame:
    """Single-source SimRank by reverse-walk meeting times — the
    published big-graph path (Fogaras-Rácz WWW'05 Monte Carlo SimRank;
    Kusumoto et al. SIGMOD'14 — public results) the exact `simrank`
    docstring points to. s(q, v) = E[C^tau] where tau is the FIRST
    time the reverse walks from q and v occupy the same node at the
    same step; the estimator truncates at ``walk_length`` (biased low,
    exactly like the truncated fixpoint) and averages
    ``walks_per_node`` paired samples.

    Determinism (the cross-engine contract): walks are the engine's
    `linkgraph.walks.random_walks` hash-argmin walks — per-start
    keyed streams, so paired walks are independent until they meet,
    which is precisely the estimator's requirement — and the C^tau
    weights are half-up integer micro-domain values, so the DuckDB
    twin (`simrank_sampled_sql`) reproduces the estimate hash-exact.
    A dead-ended walk (node with no in-neighbors) never meets:
    contribution 0, matching s = 0 on empty in-neighborhoods.

    Returns (node, score) for nodes whose walks met q's at least
    once. Scale notes (100TB): state is (start, walk_no) rows — one
    hash-argmin aggregate per step for ALL starts (the walks module's
    batching); the meeting probe is one join of the walk table
    against the query node's R·L rows (broadcast). Per-query cost
    after the walk table is materialized: one broadcast join — amortize
    many query nodes over one walk table."""
    if direction not in _DIRECTIONS:
        raise ValueError(f"direction must be one of {_DIRECTIONS}")
    if not (0 < c_num < c_den):
        raise ValueError(f"C must be a rational in (0, 1): {c_num}/{c_den}")
    if walk_length < 1 or walks_per_node < 1:
        raise ValueError(
            f"walk_length and walks_per_node must be >= 1: "
            f"{walk_length}, {walks_per_node}"
        )
    from linkgraph.walks import random_walks

    # SimRank looks at IN-neighbors under OUTGOING semantics: reverse
    # the walk direction relative to the requested edge direction
    walk_dir = {"OUTGOING": "INCOMING", "INCOMING": "OUTGOING",
                "BOTH": "BOTH"}[direction]
    walks = random_walks(
        edges, walk_length, walks_per_node=walks_per_node, seed=seed,
        direction=walk_dir,
    )
    wq = (
        walks.filter(F.col("start") == int(query_node))
        .select("walk_no", "step", "node")
    )
    meets = (
        walks.filter(F.col("start") != int(query_node))
        .join(F.broadcast(wq), ["walk_no", "step", "node"])
        .groupBy("start", "walk_no")
        .agg(F.min("step").alias("tau"))
    )
    # C^tau in the integer micro-domain, tau in [1, walk_length]
    cases = " ".join(
        f"WHEN tau = {t} THEN "
        f"{(2 * 1_000_000 * c_num ** t + c_den ** t) // (2 * c_den ** t)}"
        for t in range(1, walk_length + 1)
    )
    vt = F.expr(f"CASE {cases} END").cast("long")
    r = int(walks_per_node)
    return (
        meets.select(F.col("start").alias("node"), vt.alias("v"))
        .groupBy("node")
        .agg(F.sum("v").alias("sv"))
        .select(
            "node",
            F.round(
                F.expr(f"(2 * sv + {r}) DIV (2 * {r})") / 1_000_000.0, 6
            ).alias("score"),
        )
    )


def simrank_sampled_sql(
    edge_sql: str,
    query_node: int,
    walk_length: int = 5,
    walks_per_node: int = 8,
    c_num: int = 4,
    c_den: int = 5,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> str:
    """DuckDB twin of `simrank_sampled`: the walks oracle
    (`random_walks_sql` — identical hash-argmin steps) composed with
    the same meeting / C^tau / half-up mean arithmetic."""
    from linkgraph.walks import random_walks_sql

    walk_dir = {"OUTGOING": "INCOMING", "INCOMING": "OUTGOING",
                "BOTH": "BOTH"}[direction]
    walks = random_walks_sql(
        edge_sql, walk_length, walks_per_node=walks_per_node, seed=seed,
        direction=walk_dir,
    )
    cases = " ".join(
        f"WHEN tau = {t} THEN "
        f"{(2 * 1_000_000 * c_num ** t + c_den ** t) // (2 * c_den ** t)}"
        for t in range(1, walk_length + 1)
    )
    r = int(walks_per_node)
    return f"""
WITH walks AS ({walks}),
wq AS (SELECT walk_no, step, node FROM walks WHERE start = {int(query_node)}),
meets AS (
  SELECT w.start, w.walk_no, MIN(w.step) AS tau
  FROM walks w JOIN wq ON wq.walk_no = w.walk_no
   AND wq.step = w.step AND wq.node = w.node
  WHERE w.start <> {int(query_node)}
  GROUP BY w.start, w.walk_no),
vals AS (SELECT start AS node,
  CAST(CASE {cases} END AS BIGINT) AS v FROM meets)
SELECT node,
       ROUND(CAST((2 * SUM(v) + {r}) // (2 * {r}) AS DOUBLE)
             / 1000000.0, 6) AS score
FROM vals GROUP BY node
"""
