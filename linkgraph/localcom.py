"""Seeded local community detection — personalized-PageRank sweep cut.

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): the Andersen-Chung-Lang local clustering
recipe (FOCS'06, public result) — diffuse mass from a seed node with
a personalized PageRank, order touched nodes by the degree-normalized
score, and cut the prefix with minimum conductance. It is THE
standard "give me the community around this page/repo" query on a web
link graph and composes the engine's existing pieces: the PageRank
restart recurrence, the k-core symmetrized view, and the
integer-micro-domain exactness discipline.

Semantics
---------
Over the undirected simple view of the edge table (symmetrized,
self-loops dropped, duplicates collapsed):

* ``p_0 = 1`` at the seed; per round, every node pushes
  ``(1 - alpha) * p(u) / deg(u)`` to each neighbor and the seed
  receives a fresh ``alpha`` restart — the truncated power iteration
  of PPR(alpha, seed) (teleport fully at the seed).
* After ``iterations`` rounds, touched nodes (p > 0) are ranked by
  ``p / deg`` descending (id ascending tie-break) and every prefix
  ``S_k`` is scored with conductance
  ``phi(S) = cut(S) / min(vol(S), vol(G) - vol(S))``.
* The returned community is the argmin-phi prefix (smallest k on
  ties).

Cross-engine exactness: alpha is the rational ``a_num / a_den``
(default 3/20 = 0.15) and scores live in the integer micro-domain
(p * 1e6 as BIGINT). Each push is one half-up BIGINT division
``(2 * p * (a_den - a_num) + a_den * d) DIV (2 * a_den * d)``, the
restart is ``(2e6 * a_num + a_den) DIV (2 * a_den)``, the sweep rank
key is ``(p6 * 1e6) DIV d``, and volumes / cut sizes are pure edge
counts — so the DuckDB twin (`local_community_sweep_sql`) is
hash-exact. The only float op is the final
``ROUND(cut / denom, 9)`` conductance, an IEEE-identical BIGINT →
DOUBLE division on both engines.

Scale notes (100TB): this is a LOCAL operator — the state is the
seed's diffusion ball, not the graph. Per round: one join of the
(tiny) state against the pinned symmetric edge table (AQE broadcasts
the state side) and one ``groupBy(node)`` sum shuffle of the pushed
mass. The sweep windows run over the touched set only (cap it with
``max_sweep``); the single global scalar (vol(G)) is one count of the
pinned table. Truncated push keeps p integral: mass that rounds to 0
stays un-propagated, which is exactly the epsilon-truncation of the
ACL push algorithm. For many seeds, run seeds as independent jobs —
they share the pinned symmetric table.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.checkpoint import (
    SuperstepLoop,
    attach_caches,
    pin_table,
    release_state,
)
from linkgraph.kcore import _check_resume_fp, _graph_fp, _sym_simple


@dataclass
class LocalCommunityResult:
    members: DataFrame  # (id: long, rnk: long, score: double)
    best_k: int
    best_phi: float
    iterations: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _ppr_micro(
    sym: DataFrame,
    deg: DataFrame,
    seed_node: int,
    a_num: int,
    a_den: int,
    iterations: int,
    loop: SuperstepLoop,
    start: int,
    state: DataFrame | None,
) -> DataFrame:
    """Truncated integer-micro-domain PPR power iteration."""
    spark = sym.sparkSession
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    if state is None:
        state = spark.createDataFrame(
            [(int(seed_node), 1_000_000)], "node long, p long"
        )
    push = f"(2 * p * {a_den - a_num} + {a_den} * d) DIV (2 * {a_den} * d)"
    for it in range(start + 1, iterations + 1):
        pushed = (
            state.join(deg, "node")
            .join(sym.withColumnRenamed("a", "node"), "node")
            .select(F.col("b").alias("node"), F.expr(push).alias("v"))
        )
        fresh = spark.createDataFrame(
            [(int(seed_node), restart)], "node long, v long"
        )
        nxt = (
            pushed.unionByName(fresh)
            .groupBy("node")
            .agg(F.sum("v").cast("long").alias("p"))
            .filter(F.col("p") > 0)
        )
        state = loop.advance(it, nxt, metrics={"iteration": it})
    return state


def local_community_sweep(
    edges: DataFrame,
    seed_node: int,
    iterations: int = 6,
    a_num: int = 3,
    a_den: int = 20,
    max_sweep: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> LocalCommunityResult:
    """ACL-style local community around ``seed_node``.

    Returns the minimum-conductance PPR sweep prefix as
    ``members = (id, rnk, score)`` — sweep rank (1-based) and the
    PPR score rounded to 6 — plus ``best_k`` / ``best_phi``.

    ``max_sweep`` caps the sweep to the first ``max_sweep`` ranked
    nodes (the community can never be larger, and the windows never
    see more rows). resume: with a ``checkpoint_dir``, the PPR rounds
    continue from the last durable state, validated against the graph
    fingerprint and (seed, alpha) parameters.
    """
    if a_den <= 0 or not (0 < a_num < a_den):
        raise ValueError(
            f"alpha must be a rational in (0, 1): got {a_num}/{a_den}"
        )
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1: got {iterations}")
    sym = pin_table(_sym_simple(edges))
    deg = pin_table(
        sym.groupBy("a").agg(F.count("*").cast("long").alias("d"))
        .select(F.col("a").alias("node"), "d")
    )
    if deg.filter(F.col("node") == int(seed_node)).count() == 0:
        release_state(sym)
        release_state(deg)
        raise ValueError(
            f"seed node {seed_node} has no edges in the symmetrized "
            "graph; its community is the singleton and conductance is "
            "undefined."
        )
    fp = _graph_fp(sym) if checkpoint_dir else None
    params = {"seed": int(seed_node), "a_num": a_num, "a_den": a_den}
    loop = SuperstepLoop(
        edges.sparkSession, checkpoint_dir, every=checkpoint_every,
        name="localcom", max_steps=iterations,
        context={"graph_fp": fp, "params": params},
    )
    start, state = 0, None
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "local_community_sweep", loop.last_context.get("graph_fp"), fp
            )
            rec = loop.last_context.get("params")
            if rec is not None and rec != params:
                raise ValueError(
                    "local_community_sweep resume mismatch: checkpointed "
                    f"params {rec!r} != requested {params!r}. Rerun "
                    "without resume or with the original parameters."
                )
            start, state = resumed
            state = state.select("node", "p")
    p = pin_table(
        _ppr_micro(sym, deg, seed_node, a_num, a_den, iterations, loop,
                   start, state)
    )
    vol_total = sym.count()  # = 2 |E_undirected|

    # sweep order: degree-normalized score desc, id asc
    ranked = (
        p.join(deg, "node")
        .select(
            F.col("node").alias("id"), "p", "d",
            F.expr("(p * 1000000) DIV d").alias("ord"),
        )
    )
    w_rank = Window.orderBy(F.col("ord").desc(), F.col("id").asc())
    ranked = ranked.select(
        "id", "p", "d", F.row_number().over(w_rank).cast("long").alias("rnk")
    )
    if max_sweep is not None:
        ranked = ranked.filter(F.col("rnk") <= int(max_sweep))
    ranked = pin_table(ranked)

    # per-prefix internal (directed) edge counts: a symmetric edge is
    # first fully inside the prefix at m = max(rank(a), rank(b))
    ra = ranked.select(F.col("id").alias("a"), F.col("rnk").alias("rka"))
    rb = ranked.select(F.col("id").alias("b"), F.col("rnk").alias("rkb"))
    mcnt = (
        sym.join(ra, "a").join(rb, "b")
        .select(F.greatest("rka", "rkb").alias("m"))
        .groupBy("m")
        .agg(F.count("*").cast("long").alias("c"))
    )
    w_cum = Window.orderBy("rnk")
    swept = (
        ranked.join(mcnt, ranked["rnk"] == mcnt["m"], "left")
        .select(
            "id", "p", "rnk",
            F.sum("d").over(w_cum).alias("vol"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).over(w_cum).alias("intra"),
        )
    )
    phis = swept.select(
        "rnk",
        F.round(
            (F.col("vol") - F.col("intra")).cast("double")
            / F.least(F.col("vol"), F.lit(vol_total) - F.col("vol")).cast(
                "double"
            ),
            9,
        ).alias("phi"),
    ).filter(F.least(F.col("vol"), F.lit(vol_total) - F.col("vol")) > 0)
    best = phis.orderBy(F.col("phi").asc(), F.col("rnk").asc()).first()
    if best is None:
        release_state(sym)
        release_state(deg)
        release_state(p)
        release_state(ranked)
        raise ValueError(
            "sweep is empty or spans the whole graph at every prefix "
            "(denominator 0); no conductance-defined cut exists."
        )
    best_k, best_phi = int(best["rnk"]), float(best["phi"])
    members = attach_caches(
        ranked.filter(F.col("rnk") <= best_k).select(
            "id", "rnk", F.round(F.col("p") / 1_000_000.0, 6).alias("score")
        ),
        [ranked],
    )
    release_state(sym)
    release_state(deg)
    return LocalCommunityResult(
        members=members,
        best_k=best_k,
        best_phi=best_phi,
        iterations=iterations,
        stats={"vol_total": vol_total, "params": params},
        _caches=[ranked, p],
    )


def ppr_batch(
    edges: DataFrame,
    seeds: list[int],
    iterations: int = 6,
    a_num: int = 3,
    a_den: int = 20,
    direction: str = "BOTH",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """Personalized-PageRank rows for a SEED SET — the batch analog of
    `local_community_sweep`'s diffusion, one PPR vector per seed in a
    single job (the reference's personalized pageRank distributes ONE
    teleport over sourceNodes; this returns the per-seed matrix rows —
    the standard seed-similarity / feature primitive).

    Same truncated integer micro-domain recurrence, keyed (seed,
    node): per round ONE join of the state against the pinned
    adjacency and ONE groupBy(seed, node) sum — all seeds advance
    together exactly like MultiSourceBFS batches sources. Mass that
    rounds to 0 stays un-propagated, so per-seed state is the seed's
    diffusion ball, and the batch shuffle volume is the sum of ball
    sizes, not seeds x |V|.

    direction: OUTGOING pushes along src->dst (out-degree shares),
    INCOMING along dst->src, BOTH over the symmetrized simple view.

    Returns (seed, id, score) with score = p/1e6 rounded 6, p > 0.
    Value-exact DuckDB twin: `ppr_batch_sql`."""
    if direction not in _PPR_DIRECTIONS:
        raise ValueError(f"direction must be one of {_PPR_DIRECTIONS}")
    if a_den <= 0 or not (0 < a_num < a_den):
        raise ValueError(
            f"alpha must be a rational in (0, 1): got {a_num}/{a_den}"
        )
    if not seeds:
        raise ValueError("seeds must be a non-empty list of node ids")
    if len(set(seeds)) != len(seeds):
        raise ValueError("seeds must be distinct")
    spark = edges.sparkSession
    adj = pin_table(_directed_view(edges, direction))
    deg = pin_table(
        adj.groupBy("a").agg(F.count("*").cast("long").alias("d"))
        .select(F.col("a").alias("node"), "d")
    )
    missing = (
        spark.createDataFrame([(int(s),) for s in seeds], "node long")
        .join(deg, "node", "left_anti")
        .count()
    )
    if missing:
        raise ValueError(
            f"{missing} seed(s) have no out-edges under direction="
            f"{direction}; their PPR mass cannot diffuse. Drop them or "
            "change direction."
        )
    fp = _graph_fp_directed(adj) if checkpoint_dir else None
    params = {
        "seeds": sorted(int(s) for s in seeds), "a_num": a_num,
        "a_den": a_den, "direction": direction,
    }
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every,
        name="pprbatch", max_steps=iterations,
        context={"graph_fp": fp, "params": params},
    )
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    fresh = spark.createDataFrame(
        [(int(s), int(s), restart) for s in seeds], "seed long, node long, v long"
    )
    state = spark.createDataFrame(
        [(int(s), int(s), 1_000_000) for s in seeds], "seed long, node long, p long"
    )
    start = 0
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp("ppr_batch", loop.last_context.get("graph_fp"), fp)
            rec = loop.last_context.get("params")
            if rec is not None and rec != params:
                raise ValueError(
                    "ppr_batch resume mismatch: checkpointed params "
                    f"{rec!r} != requested {params!r}."
                )
            start, state = resumed
            state = state.select("seed", "node", "p")
    push = f"(2 * p * {a_den - a_num} + {a_den} * d) DIV (2 * {a_den} * d)"
    for it in range(start + 1, iterations + 1):
        pushed = (
            state.join(deg, "node")
            .join(adj.withColumnRenamed("a", "node"), "node")
            .select("seed", F.col("b").alias("node"), F.expr(push).alias("v"))
        )
        nxt = (
            pushed.unionByName(fresh)
            .groupBy("seed", "node")
            .agg(F.sum("v").cast("long").alias("p"))
            .filter(F.col("p") > 0)
        )
        state = loop.advance(it, nxt, metrics={"iteration": it})
    out = state.select(
        "seed", F.col("node").alias("id"),
        F.round(F.col("p") / 1_000_000.0, 6).alias("score"),
    )
    release_state(adj)
    release_state(deg)
    return out


_PPR_DIRECTIONS = ("OUTGOING", "INCOMING", "BOTH")


def _directed_view(edges: DataFrame, direction: str) -> DataFrame:
    """(a, b) adjacency under the requested direction, simple view."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "OUTGOING":
        return e.select(F.col("src").alias("a"), F.col("dst").alias("b")).distinct()
    if direction == "INCOMING":
        return e.select(F.col("dst").alias("a"), F.col("src").alias("b")).distinct()
    return _sym_simple(edges)


def _graph_fp_directed(adj: DataFrame) -> int:
    return int(
        adj.agg(F.expr("bit_xor(xxhash64(a, b))").alias("fp")).first()["fp"] or 0
    )


def ppr_batch_sql(
    edges_sql: str,
    seeds: list[int],
    iterations: int = 6,
    a_num: int = 3,
    a_den: int = 20,
    direction: str = "BOTH",
) -> str:
    """DuckDB twin of `ppr_batch`: identical integer micro-domain
    rounds unrolled, seeded from a VALUES list."""
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    if direction == "OUTGOING":
        view = "SELECT DISTINCT src AS a, dst AS b FROM e WHERE src <> dst"
    elif direction == "INCOMING":
        view = "SELECT DISTINCT dst AS a, src AS b FROM e WHERE src <> dst"
    else:
        view = (
            "SELECT DISTINCT a, b FROM ("
            "SELECT src AS a, dst AS b FROM e WHERE src <> dst "
            "UNION ALL SELECT dst, src FROM e WHERE src <> dst)"
        )
    seed_vals = ", ".join(f"({int(s)})" for s in seeds)
    parts = [
        f"WITH e AS ({edges_sql})",
        f"adj AS MATERIALIZED ({view})",
        "deg AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d"
        " FROM adj GROUP BY a)",
        f"sd AS (SELECT CAST(s AS BIGINT) AS seed FROM (VALUES {seed_vals}) v(s))",
        "p0 AS (SELECT seed, seed AS node, CAST(1000000 AS BIGINT) AS p FROM sd)",
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"""p{t} AS MATERIALIZED (
  SELECT seed, node, CAST(SUM(v) AS BIGINT) AS p FROM (
    SELECT p.seed, s.b AS node,
           (2 * p.p * {a_den - a_num} + {a_den} * d.d)
             // (2 * {a_den} * d.d) AS v
    FROM p{t - 1} p JOIN deg d ON d.node = p.node
    JOIN adj s ON s.a = p.node
    UNION ALL SELECT seed, seed, {restart} FROM sd)
  GROUP BY seed, node HAVING SUM(v) > 0)"""
        )
    return (
        ",\n".join(parts)
        + f"""
SELECT seed, node AS id, ROUND(CAST(p AS DOUBLE) / 1000000.0, 6) AS score
FROM p{iterations}"""
    )


def local_community_sweep_sql(
    edges_sql: str,
    seed_node: int,
    iterations: int = 6,
    a_num: int = 3,
    a_den: int = 20,
    max_sweep: int | None = None,
) -> str:
    """DuckDB twin of `local_community_sweep`: the identical integer
    micro-domain PPR rounds unrolled (MATERIALIZED — each round joins
    the previous state once, but DuckDB's default inlining would still
    re-expand the chain through the deg/sym joins), then the same
    rank / cumulative-volume / conductance sweep in SQL windows."""
    restart = (2 * 1_000_000 * a_num + a_den) // (2 * a_den)
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "deg AS MATERIALIZED (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS d"
        " FROM sym GROUP BY a)",
        f"p0 AS (SELECT CAST({seed_node} AS BIGINT) AS node,"
        " CAST(1000000 AS BIGINT) AS p)",
    ]
    for t in range(1, iterations + 1):
        parts.append(
            f"""p{t} AS MATERIALIZED (
  SELECT node, CAST(SUM(v) AS BIGINT) AS p FROM (
    SELECT s.b AS node,
           (2 * p.p * {a_den - a_num} + {a_den} * d.d)
             // (2 * {a_den} * d.d) AS v
    FROM p{t - 1} p JOIN deg d ON d.node = p.node
    JOIN sym s ON s.a = p.node
    UNION ALL SELECT CAST({seed_node} AS BIGINT), {restart})
  GROUP BY node HAVING SUM(v) > 0)"""
        )
    cap = f"WHERE rnk <= {int(max_sweep)}" if max_sweep is not None else ""
    parts.append(
        f"""ranked AS MATERIALIZED (SELECT * FROM (
  SELECT p.node AS id, p.p, d.d,
         CAST(ROW_NUMBER() OVER (
           ORDER BY (p.p * 1000000) // d.d DESC, p.node ASC) AS BIGINT)
           AS rnk
  FROM p{iterations} p JOIN deg d ON d.node = p.node) {cap})"""
    )
    parts.append(
        """mcnt AS (SELECT GREATEST(ra.rnk, rb.rnk) AS m,
  CAST(COUNT(*) AS BIGINT) AS c
  FROM sym s JOIN ranked ra ON ra.id = s.a JOIN ranked rb ON rb.id = s.b
  GROUP BY 1)"""
    )
    parts.append(
        """swept AS (SELECT r.id, r.p, r.rnk,
  SUM(r.d) OVER (ORDER BY r.rnk) AS vol,
  SUM(COALESCE(m.c, 0)) OVER (ORDER BY r.rnk) AS intra
  FROM ranked r LEFT JOIN mcnt m ON m.m = r.rnk)"""
    )
    parts.append("tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS volt FROM sym)")
    parts.append(
        """best AS (SELECT s.rnk AS bk
  FROM swept s CROSS JOIN tot t
  WHERE LEAST(s.vol, t.volt - s.vol) > 0
  ORDER BY ROUND(CAST(s.vol - s.intra AS DOUBLE)
                 / CAST(LEAST(s.vol, t.volt - s.vol) AS DOUBLE), 9) ASC,
           s.rnk ASC
  LIMIT 1)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT r.id, r.rnk, ROUND(CAST(r.p AS DOUBLE) / 1000000.0, 6) AS score
FROM swept r CROSS JOIN best WHERE r.rnk <= best.bk"""
    )
