"""Eigenvector centrality — power iteration on the adjacency matrix.

Lineage: the centrality family of the reference library (PageRank /
betweenness / closeness in mknblch/neo4j-graph-algorithms — SURVEY.md
§2.1/§2.2; eigenvector centrality is the family's classical root:
PageRank IS eigenvector centrality on the teleport-damped matrix).

Spark-first shape: each superstep is EXACTLY the PageRank
contribution pattern — score joins edges on src, one groupBy(dst)
shuffle with map-side partial sums — followed by an L∞ normalization
via a 1-row broadcast crossJoin (no driver action inside the loop).
Supersteps run on SuperstepLoop: lineage truncated every round,
durable parquet every ``checkpoint_every`` rounds, resume validated
against an order-independent graph fingerprint (the same contract as
k-core/SCC/MST — SURVEY.md §8).

Normalization uses max (L∞), not the L2 norm: max of identical
doubles is exact on every engine, while a global float SUM has
engine-dependent addition order — this is what keeps the DuckDB
oracle value-exact at 6 decimals through many iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop, attach_caches

__all__ = [
    "eigenvector_centrality",
    "eigenvector_sql",
    "katz_centrality",
    "katz_sql",
    "hits",
    "hits_sql",
    "salsa",
    "salsa_sql",
]


def _oriented(edges: DataFrame, direction: str, weighted: bool) -> DataFrame:
    w = F.coalesce(F.col("weight"), F.lit(1.0)) if weighted else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w"))
    if direction == "BOTH":
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
        )
    elif direction == "INCOMING":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    elif direction != "OUTGOING":
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    return e.distinct()


def eigenvector_centrality(
    edges: DataFrame,
    max_iter: int = 20,
    direction: str = "OUTGOING",
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """(id, score) after ``max_iter`` power-iteration supersteps,
    L∞-normalized each round (the top score is 1.0 whenever any mass
    survives). Nodes with no in-neighbors under ``direction`` decay
    to exactly 0. Parallel edges with distinct weights contribute
    separately (the edge universe is distinct on (src, dst, w)).
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    e = _oriented(edges, direction, weighted)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    graph_fp = int(
        e.agg(F.expr("bit_xor(xxhash64(src, dst, w))").alias("fp")).first()["fp"] or 0
    )
    loop = SuperstepLoop(
        edges.sparkSession,
        checkpoint_dir,
        every=checkpoint_every,
        name="eigenvector",
        context={"graph_fp": graph_fp, "direction": direction,
                 "weighted": weighted},
        max_steps=max_iter,
    )
    x = nodes.select("id", F.lit(1.0).alias("score"))
    start = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = loop.last_context
            if rec.get("graph_fp") is not None and int(rec["graph_fp"]) != graph_fp:
                raise ValueError(
                    "eigenvector resume mismatch: edge table differs from the "
                    f"checkpointed run ({rec['graph_fp']} != {graph_fp})."
                )
            if rec.get("direction", direction) != direction or bool(
                rec.get("weighted", weighted)
            ) != weighted:
                raise ValueError(
                    "eigenvector resume mismatch: direction/weighted differ "
                    "from the checkpointed run."
                )
            start, x = resumed
    for t in range(start + 1, max_iter + 1):
        contrib = (
            x.join(e, x.id == e.src)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.sum(F.col("score") * F.col("w")).alias("s"))
        )
        raw = nodes.join(contrib, nodes.id == F.col("nid"), "left").select(
            "id", F.coalesce(F.col("s"), F.lit(0.0)).alias("score")
        )
        mx = raw.agg(F.max("score").alias("mx"))
        nx = raw.crossJoin(F.broadcast(mx)).select(
            "id",
            F.when(F.col("mx") > 0, F.col("score") / F.col("mx"))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
        x = loop.advance(t, nx)
    return attach_caches(x, [x])


def eigenvector_sql(
    edge_sql: str,
    iters: int,
    direction: str = "OUTGOING",
    weighted: bool = False,
) -> str:
    """DuckDB oracle: the unrolled power iteration. Every per-round
    CTE is MATERIALIZED — each x{t} is referenced twice (values + its
    own max), and default inlining would re-expand the whole chain
    exponentially (the doubling-CTE gotcha in .claude/skills/verify)."""
    w = "COALESCE(weight, 1.0)" if weighted else "1.0"
    if direction == "BOTH":
        universe = (
            f"SELECT DISTINCT src, dst, w FROM ("
            f"SELECT src, dst, {w} AS w FROM eraw "
            f"UNION ALL SELECT dst AS src, src AS dst, {w} AS w FROM eraw)"
        )
    elif direction == "INCOMING":
        universe = f"SELECT DISTINCT dst AS src, src AS dst, {w} AS w FROM eraw"
    else:
        universe = f"SELECT DISTINCT src, dst, {w} AS w FROM eraw"
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS MATERIALIZED ({universe})",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        "x0 AS (SELECT id, 1.0 AS score FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"r{t} AS MATERIALIZED (SELECT n.id, COALESCE(c.s, 0.0) AS score "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(x.score * e.w) AS s "
            f"FROM x{t - 1} x JOIN e ON x.id = e.src GROUP BY e.dst) c "
            f"ON n.id = c.id)"
        )
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT r.id, "
            f"CASE WHEN m.mx > 0 THEN r.score / m.mx ELSE 0.0 END AS score "
            f"FROM r{t} r CROSS JOIN (SELECT MAX(score) AS mx FROM r{t}) m)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, ROUND(score, 6) AS score FROM x{iters}"
    )


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iter: int = 20,
    direction: str = "OUTGOING",
    weighted: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Katz centrality (Katz 1953): the attenuated path-count series
    x = Σ_k α^k (Aᵀ)^k · β, iterated as x ← β + α·Aᵀx from x = β.
    Converges for α < 1/λ_max; ``max_iter`` truncates the series
    (every node's score then counts walks up to that length — the
    deterministic contract the oracle replays).

    PageRank's superstep shape without the degree normalization or
    teleport redistribution — one groupBy(dst) shuffle per round, no
    global normalizer at all (the recurrence is affine, so unlike
    eigenvector centrality nothing needs a cross-partition scalar).
    Same SuperstepLoop resume contract as `eigenvector_centrality`.
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    e = _oriented(edges, direction, weighted)
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    graph_fp = int(
        e.agg(F.expr("bit_xor(xxhash64(src, dst, w))").alias("fp")).first()["fp"] or 0
    )
    loop = SuperstepLoop(
        edges.sparkSession,
        checkpoint_dir,
        every=checkpoint_every,
        name="katz",
        context={"graph_fp": graph_fp, "direction": direction,
                 "weighted": weighted, "alpha": alpha, "beta": beta},
        max_steps=max_iter,
    )
    x = nodes.select("id", F.lit(float(beta)).alias("score"))
    start = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = loop.last_context
            if rec.get("graph_fp") is not None and int(rec["graph_fp"]) != graph_fp:
                raise ValueError(
                    "katz resume mismatch: edge table differs from the "
                    f"checkpointed run ({rec['graph_fp']} != {graph_fp})."
                )
            for key, cur in (
                ("direction", direction),
                ("weighted", weighted),
                ("alpha", alpha),
                ("beta", beta),
            ):
                if rec.get(key, cur) != cur:
                    raise ValueError(
                        f"katz resume mismatch: {key} differs from the "
                        "checkpointed run."
                    )
            start, x = resumed
    for t in range(start + 1, max_iter + 1):
        contrib = (
            x.join(e, x.id == e.src)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.sum(F.col("score") * F.col("w")).alias("s"))
        )
        nx = nodes.join(contrib, nodes.id == F.col("nid"), "left").select(
            "id",
            (
                F.lit(float(beta))
                + F.lit(float(alpha)) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("score"),
        )
        x = loop.advance(t, nx)
    return attach_caches(x, [x])


def katz_sql(
    edge_sql: str,
    iters: int,
    alpha: float = 0.1,
    beta: float = 1.0,
    direction: str = "OUTGOING",
    weighted: bool = False,
) -> str:
    """DuckDB oracle: the unrolled affine recurrence (CTEs
    MATERIALIZED against exponential re-inlining; float literals via
    repr for identical doubles)."""
    w = "COALESCE(weight, 1.0)" if weighted else "1.0"
    if direction == "BOTH":
        universe = (
            f"SELECT DISTINCT src, dst, w FROM ("
            f"SELECT src, dst, {w} AS w FROM eraw "
            f"UNION ALL SELECT dst AS src, src AS dst, {w} AS w FROM eraw)"
        )
    elif direction == "INCOMING":
        universe = f"SELECT DISTINCT dst AS src, src AS dst, {w} AS w FROM eraw"
    else:
        universe = f"SELECT DISTINCT src, dst, {w} AS w FROM eraw"
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS MATERIALIZED ({universe})",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        f"x0 AS (SELECT id, CAST({float(beta)!r} AS DOUBLE) AS score FROM nodes)",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"x{t} AS MATERIALIZED (SELECT n.id, "
            f"CAST({float(beta)!r} AS DOUBLE) "
            f"+ CAST({float(alpha)!r} AS DOUBLE) * COALESCE(c.s, 0.0) AS score "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst AS id, SUM(x.score * e.w) AS s "
            f"FROM x{t - 1} x JOIN e ON x.id = e.src GROUP BY e.dst) c "
            f"ON n.id = c.id)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, ROUND(score, 6) AS score FROM x{iters}"
    )


def hits(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999, JACM — the original
    web-link-analysis algorithm): authority ← Σ_in hub, then hub ←
    Σ_out authority (using the UPDATED authorities, per the paper's
    sequential update), each L∞-normalized per round.

    Returns (id, hub, auth). Two contribution shuffles per round —
    one keyed by dst (authority gather), one by src (hub gather) —
    each the PageRank partial-aggregation shape; normalizers are
    1-row broadcasts (max is cross-engine exact, same argument as
    eigenvector centrality). SuperstepLoop resume with graph-fp
    validation; directedness is inherent (HITS on a symmetrized
    graph degenerates to eigenvector centrality).
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    e = _oriented(edges, "OUTGOING", weighted=False).select("src", "dst")
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    graph_fp = int(
        e.agg(F.expr("bit_xor(xxhash64(src, dst))").alias("fp")).first()["fp"] or 0
    )
    loop = SuperstepLoop(
        edges.sparkSession,
        checkpoint_dir,
        every=checkpoint_every,
        name="hits",
        context={"graph_fp": graph_fp},
        max_steps=max_iter,
    )
    x = nodes.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    start = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = loop.last_context
            if rec.get("graph_fp") is not None and int(rec["graph_fp"]) != graph_fp:
                raise ValueError(
                    "hits resume mismatch: edge table differs from the "
                    f"checkpointed run ({rec['graph_fp']} != {graph_fp})."
                )
            start, x = resumed
    for t in range(start + 1, max_iter + 1):
        a_raw = nodes.join(
            x.join(e, x.id == e.src)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.sum("hub").alias("s")),
            nodes.id == F.col("nid"),
            "left",
        ).select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("auth"))
        amx = a_raw.agg(F.max("auth").alias("amx"))
        a1 = a_raw.crossJoin(F.broadcast(amx)).select(
            "id",
            F.when(F.col("amx") > 0, F.col("auth") / F.col("amx"))
            .otherwise(F.lit(0.0))
            .alias("auth"),
        )
        h_raw = nodes.join(
            a1.join(e, a1.id == e.dst)
            .groupBy(F.col("src").alias("nid"))
            .agg(F.sum("auth").alias("s")),
            nodes.id == F.col("nid"),
            "left",
        ).select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("hub"))
        hmx = h_raw.agg(F.max("hub").alias("hmx"))
        h1 = h_raw.crossJoin(F.broadcast(hmx)).select(
            "id",
            F.when(F.col("hmx") > 0, F.col("hub") / F.col("hmx"))
            .otherwise(F.lit(0.0))
            .alias("hub"),
        )
        nx = h1.join(a1, "id").select("id", "hub", "auth")
        x = loop.advance(t, nx)
    return attach_caches(x, [x])


def hits_sql(edge_sql: str, iters: int) -> str:
    """DuckDB oracle for `hits` — sequential a-then-h update, every
    per-round CTE MATERIALIZED, max-normalizers in scalar subqueries."""
    parts = [
        f"WITH eraw AS ({edge_sql})",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e))",
        "x0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub, "
        "CAST(1.0 AS DOUBLE) AS auth FROM nodes)",
    ]
    for t in range(1, iters + 1):
        hub_src = "x0" if t == 1 else f"h{t - 1}"
        parts.append(
            f"ar{t} AS MATERIALIZED (SELECT n.id, COALESCE(c.s, 0.0) AS auth "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS id, SUM(x.hub) AS s "
            f"FROM {hub_src} x JOIN e ON x.id = e.src GROUP BY e.dst) c "
            f"ON n.id = c.id)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT r.id, CASE WHEN m.mx > 0 "
            f"THEN r.auth / m.mx ELSE 0.0 END AS auth FROM ar{t} r "
            f"CROSS JOIN (SELECT MAX(auth) AS mx FROM ar{t}) m)"
        )
        parts.append(
            f"hr{t} AS MATERIALIZED (SELECT n.id, COALESCE(c.s, 0.0) AS hub "
            f"FROM nodes n LEFT JOIN (SELECT e.src AS id, SUM(a.auth) AS s "
            f"FROM a{t} a JOIN e ON a.id = e.dst GROUP BY e.src) c "
            f"ON n.id = c.id)"
        )
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT r.id, CASE WHEN m.mx > 0 "
            f"THEN r.hub / m.mx ELSE 0.0 END AS hub FROM hr{t} r "
            f"CROSS JOIN (SELECT MAX(hub) AS mx FROM hr{t}) m)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.id, ROUND(h.hub, 6) AS hub, ROUND(a.auth, 6) AS auth "
        f"FROM h{iters} h JOIN a{iters} a ON h.id = a.id"
    )


def salsa(
    edges: DataFrame,
    max_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """SALSA hubs & authorities (Lempel & Moran 2001, TOIS 19(2) —
    the Stochastic Approach for Link-Structure Analysis; Twitter's
    WTF recommender runs this exact bipartite walk at web scale).

    HITS with degree-normalized contributions: each round performs
    the sequential a-then-h update

        auth(i) <- sum_{j -> i} hub(j)  / outdeg(j)
        hub(j)  <- sum_{j -> i} auth(i) / indeg(i)   (updated auths)

    i.e. a two-step random walk on the bipartite hub/authority views
    instead of HITS's raw adjacency sums, which removes HITS's
    tightly-knit-community bias. Stationary authorities within a
    connected component are indegree-proportional; finite max_iter
    exposes the transient (component structure + walk mixing), which
    is what the driver query pins.

    Returns (id, hub, auth), each side L∞-normalized per round (max
    is cross-engine exact — the eigenvector-centrality argument).
    Scale shape: the degree tables are one-time aggregates joined
    onto the edge list ONCE before the loop (normalized edge weights
    hub_w = 1/outdeg(src), auth_w = 1/indeg(dst) are static), so each
    round is exactly two PageRank-shaped contribution shuffles; no
    per-round degree recompute. SuperstepLoop resume with graph-fp
    validation, same contract as `hits`.
    """
    if max_iter < 0:
        raise ValueError(f"max_iter must be >= 0, got {max_iter}")
    e = _oriented(edges, "OUTGOING", weighted=False).select("src", "dst")
    outdeg = e.groupBy("src").agg(F.count("*").alias("od"))
    indeg = e.groupBy("dst").agg(F.count("*").alias("idg"))
    # static normalized edge weights: division happens once per edge,
    # identically on both engines (1.0 / integer count is exact-input
    # deterministic), not once per round
    ew = (
        e.join(outdeg, "src")
        .join(indeg, "dst")
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.col("od")).alias("hub_w"),
            (F.lit(1.0) / F.col("idg")).alias("auth_w"),
        )
    )
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    graph_fp = int(
        e.agg(F.expr("bit_xor(xxhash64(src, dst))").alias("fp")).first()["fp"] or 0
    )
    loop = SuperstepLoop(
        edges.sparkSession,
        checkpoint_dir,
        every=checkpoint_every,
        name="salsa",
        context={"graph_fp": graph_fp},
        max_steps=max_iter,
    )
    x = nodes.select("id", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth"))
    start = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec = loop.last_context
            if rec.get("graph_fp") is not None and int(rec["graph_fp"]) != graph_fp:
                raise ValueError(
                    "salsa resume mismatch: edge table differs from the "
                    f"checkpointed run ({rec['graph_fp']} != {graph_fp})."
                )
            start, x = resumed
    for t in range(start + 1, max_iter + 1):
        a_raw = nodes.join(
            x.join(ew, x.id == ew.src)
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.sum(F.col("hub") * F.col("hub_w")).alias("s")),
            nodes.id == F.col("nid"),
            "left",
        ).select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("auth"))
        amx = a_raw.agg(F.max("auth").alias("amx"))
        a1 = a_raw.crossJoin(F.broadcast(amx)).select(
            "id",
            F.when(F.col("amx") > 0, F.col("auth") / F.col("amx"))
            .otherwise(F.lit(0.0))
            .alias("auth"),
        )
        h_raw = nodes.join(
            a1.join(ew, a1.id == ew.dst)
            .groupBy(F.col("src").alias("nid"))
            .agg(F.sum(F.col("auth") * F.col("auth_w")).alias("s")),
            nodes.id == F.col("nid"),
            "left",
        ).select("id", F.coalesce(F.col("s"), F.lit(0.0)).alias("hub"))
        hmx = h_raw.agg(F.max("hub").alias("hmx"))
        h1 = h_raw.crossJoin(F.broadcast(hmx)).select(
            "id",
            F.when(F.col("hmx") > 0, F.col("hub") / F.col("hmx"))
            .otherwise(F.lit(0.0))
            .alias("hub"),
        )
        nx = h1.join(a1, "id").select("id", "hub", "auth")
        x = loop.advance(t, nx)
    return attach_caches(x, [x])


def salsa_sql(edge_sql: str, iters: int) -> str:
    """DuckDB oracle for `salsa` — the hits_sql skeleton with the
    static degree-normalized edge weights joined in up front."""
    parts = [
        f"WITH eraw AS ({edge_sql})",
        "ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM eraw)",
        "e AS MATERIALIZED (SELECT ed.src, ed.dst, "
        "1.0 / o.od AS hub_w, 1.0 / i.idg AS auth_w FROM ed "
        "JOIN (SELECT src, COUNT(*) AS od FROM ed GROUP BY src) o ON o.src = ed.src "
        "JOIN (SELECT dst, COUNT(*) AS idg FROM ed GROUP BY dst) i ON i.dst = ed.dst)",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM ed UNION ALL SELECT dst AS id FROM ed))",
        "x0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS hub, "
        "CAST(1.0 AS DOUBLE) AS auth FROM nodes)",
    ]
    for t in range(1, iters + 1):
        hub_src = "x0" if t == 1 else f"h{t - 1}"
        parts.append(
            f"ar{t} AS MATERIALIZED (SELECT n.id, COALESCE(c.s, 0.0) AS auth "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS id, "
            f"SUM(x.hub * e.hub_w) AS s "
            f"FROM {hub_src} x JOIN e ON x.id = e.src GROUP BY e.dst) c "
            f"ON n.id = c.id)"
        )
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT r.id, CASE WHEN m.mx > 0 "
            f"THEN r.auth / m.mx ELSE 0.0 END AS auth FROM ar{t} r "
            f"CROSS JOIN (SELECT MAX(auth) AS mx FROM ar{t}) m)"
        )
        parts.append(
            f"hr{t} AS MATERIALIZED (SELECT n.id, COALESCE(c.s, 0.0) AS hub "
            f"FROM nodes n LEFT JOIN (SELECT e.src AS id, "
            f"SUM(a.auth * e.auth_w) AS s "
            f"FROM a{t} a JOIN e ON a.id = e.dst GROUP BY e.src) c "
            f"ON n.id = c.id)"
        )
        parts.append(
            f"h{t} AS MATERIALIZED (SELECT r.id, CASE WHEN m.mx > 0 "
            f"THEN r.hub / m.mx ELSE 0.0 END AS hub FROM hr{t} r "
            f"CROSS JOIN (SELECT MAX(hub) AS mx FROM hr{t}) m)"
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT h.id, ROUND(h.hub, 6) AS hub, ROUND(a.auth, 6) AS auth "
        f"FROM h{iters} h JOIN a{iters} a ON h.id = a.id"
    )
