"""Deterministic random walks — the DeepWalk/node2vec corpus generator.

Random-walk corpora (Perozzi et al. 2014, DeepWalk, arXiv:1403.6652;
Grover & Leskovec 2016, node2vec) are how a link graph becomes
training data for embedding models — the operator that bridges the
graph engine and the training-data pipeline. The reference engine's
procedure family stops at analytics; this is the engine-extension
counterpart that emits sequences.

Determinism contract: "random" choices are pseudorandom via the
cross-engine md5 hash (`pipeline/hashing.py`), keyed by
(start, walk_no, step, candidate, seed). The walk set is a pure
function of (graph, walk_length, walks_per_node, seed) — identical
across runs, partitionings, cluster sizes, AND engines, so an exact
DuckDB oracle replays every step. Changing ``seed`` yields an
independent walk family; in expectation over seeds each step is
uniform over the neighbor set (hash-argmin over candidates), the same
guarantee seeded `rand()`-per-row sampling gives without its
task-ordering nondeterminism.

Scale shape (100 TB): each step is ONE shuffle — the frontier joins
the edge table on the current node, then a (start, walk_no)-keyed
argmin picks the successor. Frontier size is bounded by
|nodes| × walks_per_node forever (walks never branch), so step cost is
flat regardless of walk_length; each round's frontier is persisted so
the chain replays nothing. Hub nodes fan out into the argmin's partial
aggregation (map-side combine collapses each partition to one
candidate per walk) — no hub ever concentrates in a single task
beyond its frontier share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

__all__ = [
    "random_walks",
    "weighted_walks",
    "node2vec_walks",
    "walks_as_sequences",
    "random_walks_sql",
    "weighted_walks_sql",
    "node2vec_walks_sql",
]

_U53 = 9007199254740992  # 2^53: hash % 2^53 / 2^53 is an EXACT double


def _edge_universe(edges: DataFrame, direction: str) -> DataFrame:
    e = edges.select("src", "dst")
    if direction == "BOTH":
        e = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    elif direction == "INCOMING":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction != "OUTGOING":
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    return e.distinct()


def _start_frontier(e: DataFrame, walks_per_node: int) -> DataFrame:
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    return nodes.select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk_no"),
        F.lit(0).alias("step"),
        "node",
    )


def _choice_hash(seed: int):
    return stable_hash64(
        F.concat_ws(
            "|",
            F.col("start"),
            F.col("walk_no"),
            F.col("step"),
            F.col("dst"),
        ),
        salt=seed,
    )


def random_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> DataFrame:
    """Per-step walk rows ``(start, walk_no, step, node)``.

    Step 0 is the start node itself; each later step moves to the
    neighbor minimizing the keyed hash (ties — a 2^-60 hash collision —
    break on the node id, so the choice is a total order either way).
    Walks stop early at dead ends (no outgoing neighbor under
    ``direction``), so a row's absence IS the termination signal.

    ``walks_per_node`` starts that many independent walks per node
    (walk_no 0..w-1), the DeepWalk corpus contract.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    e = _edge_universe(edges, direction)
    cur = _start_frontier(e, walks_per_node)
    step0 = cur
    caches = []
    for t in range(1, walk_length + 1):
        nxt = (
            cur.join(e, cur.node == e.src)
            .withColumn("step", F.lit(t))
            .groupBy("start", "walk_no")
            .agg(
                F.min_by(
                    F.col("dst"),
                    F.struct(
                        _choice_hash(seed).alias("h"), F.col("dst").alias("d")
                    ),
                ).alias("node")
            )
            .select("start", "walk_no", F.lit(t).alias("step"), "node")
            .persist()
        )
        caches.append(nxt)
        cur = nxt
    out = step0
    for f in caches:
        out = out.unionByName(f)
    return attach_caches(out, caches)


def walks_as_sequences(walks: DataFrame, sep: str = " ") -> DataFrame:
    """Collapse per-step rows into one training sequence per walk:
    ``(start, walk_no, length, sequence)`` with nodes joined by
    ``sep`` in step order (array_sort on (step, node) structs — no
    window, one aggregation). Propagates the walk frame's cache
    handles so `release_caches` on the sequences frees them."""
    return attach_caches(
        walks.groupBy("start", "walk_no")
        .agg(
            F.count("*").alias("length"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("step", F.col("node")))
                    ),
                    lambda s: s["node"].cast("string"),
                ),
                sep,
            ).alias("sequence"),
        ),
        getattr(walks, "_linkgraph_caches", []),
    )


def random_walks_sql(
    edge_sql: str,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> str:
    """DuckDB oracle: replays every hash-argmin step exactly.

    One CTE per step (walk count is bounded, so the unrolled plan is
    linear in walk_length); ROW_NUMBER ordered by (hash, dst) is the
    same total order as the engine's struct min_by.
    """
    if direction == "BOTH":
        universe = (
            f"SELECT DISTINCT src, dst FROM (SELECT src, dst FROM eraw "
            f"UNION ALL SELECT dst AS src, src AS dst FROM eraw)"
        )
    elif direction == "INCOMING":
        universe = "SELECT DISTINCT dst AS src, src AS dst FROM eraw"
    else:
        universe = "SELECT DISTINCT src, dst FROM eraw"
    h = stable_hash64_sql(
        "concat_ws('|', s.start, s.walk_no, {t}, e.dst)", salt=seed
    )
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS ({universe})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "s0 AS (SELECT node AS start, w.walk_no, 0 AS step, node FROM nodes, "
        f"(SELECT UNNEST(range({walks_per_node})) AS walk_no) w)",
    ]
    for t in range(1, walk_length + 1):
        parts.append(
            f"s{t} AS (SELECT start, walk_no, {t} AS step, dst AS node FROM ("
            f"SELECT s.start, s.walk_no, e.dst, "
            f"ROW_NUMBER() OVER (PARTITION BY s.start, s.walk_no "
            f"ORDER BY {h.format(t=t)}, e.dst) AS rn "
            f"FROM s{t - 1} s JOIN e ON s.node = e.src) WHERE rn = 1)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, walk_no, step, node FROM s{t}"
        for t in range(walk_length + 1)
    )
    return ",\n".join(parts) + "\n" + union


def node2vec_walks(
    edges: DataFrame,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec 2016,
    arXiv:1607.00653): from edge (prev -> cur), candidate dst gets
    weight 1/p if dst == prev (return), 1 if dst neighbors prev
    (BFS-ish), else 1/q (DFS-ish). Step 1 has no prev and is uniform.

    Deterministic weighted choice — the part that usually makes biased
    sampling irreproducible on a cluster — is exact here BY
    CONSTRUCTION: per walk-step, candidate weights are prefix-summed
    in a window ORDERED BY dst (the same IEEE addition sequence on
    every engine, so the sums are bit-identical), the walk draws one
    uniform u = (hash % 2^53) / 2^53 (exact double), and the successor
    is the first candidate whose prefix sum reaches u x total. The
    result is a pure function of (graph, p, q, seed) — replayed
    VALUE-EXACTLY by `node2vec_walks_sql` in DuckDB.

    Scale shape: per step, the frontier joins edges on the current
    node (one shuffle) plus one membership probe of (prev, dst)
    against the edge set (second shuffle — the price of second-order
    bias; node2vec's alias tables are the single-machine version of
    the same cost). Frontier stays |V| x walks_per_node forever.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be > 0, got p={p} q={q}")
    from pyspark.sql import Window

    e = _edge_universe(edges, direction)
    s0 = _start_frontier(e, walks_per_node)
    outs = [s0]
    caches = []
    inv_p, inv_q = 1.0 / p, 1.0 / q

    if walk_length >= 1:
        f1 = (
            s0.join(e, s0.node == e.src)
            .withColumn("step", F.lit(1))
            .groupBy("start", "walk_no")
            .agg(
                F.min_by(
                    F.col("dst"),
                    F.struct(_choice_hash(seed).alias("h"), F.col("dst").alias("d")),
                ).alias("node")
            )
            .select(
                "start", "walk_no", F.col("start").alias("prev"), "node"
            )
            .persist()
        )
        caches.append(f1)
        outs.append(f1.select("start", "walk_no", F.lit(1).alias("step"), "node"))
        cur = f1

    pe = e.select(F.col("src").alias("p_src"), F.col("dst").alias("p_dst"))
    for t in range(2, walk_length + 1):
        cand = cur.join(e, cur.node == e.src).join(
            pe,
            (F.col("prev") == F.col("p_src")) & (F.col("dst") == F.col("p_dst")),
            "left",
        )
        alpha = (
            F.when(F.col("dst") == F.col("prev"), F.lit(inv_p))
            .when(F.col("p_src").isNotNull(), F.lit(1.0))
            .otherwise(F.lit(inv_q))
        )
        walk_w = Window.partitionBy("start", "walk_no")
        cum_w = walk_w.orderBy("dst").rowsBetween(Window.unboundedPreceding, 0)
        u = (
            stable_hash64(
                F.concat_ws(
                    "|", F.lit("n2v"), F.col("start"), F.col("walk_no"), F.lit(t)
                ),
                salt=seed,
            )
            % F.lit(_U53)
        ) / F.lit(float(_U53))
        scored = cand.select(
            "start",
            "walk_no",
            F.col("node").alias("prev_next"),
            "dst",
            F.sum(alpha).over(cum_w).alias("cum"),
            u.alias("u"),
        ).withColumn("total", F.max("cum").over(walk_w))
        nxt = (
            scored.filter(F.col("cum") >= F.col("u") * F.col("total"))
            .groupBy("start", "walk_no", "prev_next")
            .agg(F.min("dst").alias("node"))
            .select(
                "start", "walk_no", F.col("prev_next").alias("prev"), "node"
            )
            .persist()
        )
        caches.append(nxt)
        outs.append(nxt.select("start", "walk_no", F.lit(t).alias("step"), "node"))
        cur = nxt

    out = outs[0]
    for f in outs[1:]:
        out = out.unionByName(f)
    return attach_caches(out, caches)


def node2vec_walks_sql(
    edge_sql: str,
    walk_length: int,
    p: float = 1.0,
    q: float = 1.0,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> str:
    """DuckDB twin of `node2vec_walks` — same ordered prefix sums,
    same exact-double uniforms, so every drawn successor matches
    bit-for-bit. Float literals embed via repr() (shortest round-trip
    form, parses back to the identical double in both engines)."""
    if direction == "BOTH":
        universe = (
            "SELECT DISTINCT src, dst FROM (SELECT src, dst FROM eraw "
            "UNION ALL SELECT dst AS src, src AS dst FROM eraw)"
        )
    elif direction == "INCOMING":
        universe = "SELECT DISTINCT dst AS src, src AS dst FROM eraw"
    else:
        universe = "SELECT DISTINCT src, dst FROM eraw"
    inv_p, inv_q = 1.0 / p, 1.0 / q
    h1 = stable_hash64_sql("concat_ws('|', s.start, s.walk_no, 1, e.dst)", salt=seed)
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS ({universe})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "s0 AS (SELECT node AS start, w.walk_no, node FROM nodes, "
        f"(SELECT UNNEST(range({walks_per_node})) AS walk_no) w)",
    ]
    selects = ["SELECT start, walk_no, 0 AS step, node FROM s0"]
    if walk_length >= 1:
        parts.append(
            "f1 AS (SELECT start, walk_no, start AS prev, dst AS node FROM ("
            "SELECT s.start, s.walk_no, e.dst, "
            "ROW_NUMBER() OVER (PARTITION BY s.start, s.walk_no "
            f"ORDER BY {h1}, e.dst) AS rn "
            "FROM s0 s JOIN e ON s.node = e.src) WHERE rn = 1)"
        )
        selects.append("SELECT start, walk_no, 1 AS step, node FROM f1")
    for t in range(2, walk_length + 1):
        ht = stable_hash64_sql(
            f"concat_ws('|', 'n2v', start, walk_no, {t})", salt=seed
        )
        parts.append(
            f"c{t} AS (SELECT s.start, s.walk_no, s.node AS prev_next, e.dst, "
            f"CASE WHEN e.dst = s.prev THEN {inv_p!r} "
            f"WHEN pe.src IS NOT NULL THEN 1.0 ELSE {inv_q!r} END AS alpha "
            f"FROM f{t - 1} s JOIN e ON s.node = e.src "
            f"LEFT JOIN e pe ON pe.src = s.prev AND pe.dst = e.dst)"
        )
        parts.append(
            f"w{t} AS (SELECT *, SUM(alpha) OVER (PARTITION BY start, walk_no "
            f"ORDER BY dst ROWS UNBOUNDED PRECEDING) AS cum FROM c{t})"
        )
        parts.append(
            f"f{t} AS (SELECT start, walk_no, prev_next AS prev, MIN(dst) AS node "
            f"FROM (SELECT *, MAX(cum) OVER (PARTITION BY start, walk_no) AS total "
            f"FROM w{t}) "
            f"WHERE cum >= (({ht} % {_U53}) / {float(_U53)!r}) * total "
            f"GROUP BY start, walk_no, prev_next)"
        )
        selects.append(f"SELECT start, walk_no, {t} AS step, node FROM f{t}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def weighted_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> DataFrame:
    """First-order walks with EDGE-WEIGHT-proportional successor
    choice (the weighted DeepWalk contract): P(v -> u) ∝ weight(v,u).

    Uses the same bit-exact draw as `node2vec_walks` — dst-ordered
    prefix sums over the weights (identical IEEE addition sequence on
    every engine), one exact 2^-53-granular uniform per walk-step,
    successor = first prefix reaching u × total. Missing weights
    default to 1.0; non-positive-weight edges are excluded (a
    prefix-sum draw needs a positive measure).

    Same scale shape as `random_walks`: one frontier-edge shuffle +
    one walk-keyed window per step, frontier bounded forever.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    from pyspark.sql import Window

    from linkgraph.eigenvector import _oriented

    e = _oriented(edges, direction, weighted=True).filter(F.col("w") > 0)
    cur = _start_frontier(e.select("src", "dst"), walks_per_node)
    step0 = cur
    caches = []
    walk_w = Window.partitionBy("start", "walk_no")
    cum_w = walk_w.orderBy("dst").rowsBetween(Window.unboundedPreceding, 0)
    for t in range(1, walk_length + 1):
        u = (
            stable_hash64(
                F.concat_ws(
                    "|", F.lit("ww"), F.col("start"), F.col("walk_no"), F.lit(t)
                ),
                salt=seed,
            )
            % F.lit(_U53)
        ) / F.lit(float(_U53))
        scored = (
            cur.join(e, cur.node == e.src)
            .select(
                "start",
                "walk_no",
                "dst",
                F.sum(F.col("w").cast("double")).over(cum_w).alias("cum"),
                u.alias("u"),
            )
            .withColumn("total", F.max("cum").over(walk_w))
        )
        nxt = (
            scored.filter(F.col("cum") >= F.col("u") * F.col("total"))
            .groupBy("start", "walk_no")
            .agg(F.min("dst").alias("node"))
            .select("start", "walk_no", F.lit(t).alias("step"), "node")
            .persist()
        )
        caches.append(nxt)
        cur = nxt
    out = step0
    for f in caches:
        out = out.unionByName(f)
    return attach_caches(out, caches)


def weighted_walks_sql(
    edge_sql: str,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> str:
    """DuckDB twin of `weighted_walks` (same prefix-sum draw)."""
    w = "COALESCE(weight, 1.0)"
    if direction == "BOTH":
        universe = (
            f"SELECT DISTINCT src, dst, w FROM ("
            f"SELECT src, dst, {w} AS w FROM eraw "
            f"UNION ALL SELECT dst AS src, src AS dst, {w} AS w FROM eraw) "
            f"WHERE w > 0"
        )
    elif direction == "INCOMING":
        universe = (
            f"SELECT DISTINCT dst AS src, src AS dst, {w} AS w FROM eraw "
            f"WHERE {w} > 0"
        )
    else:
        universe = (
            f"SELECT DISTINCT src, dst, {w} AS w FROM eraw WHERE {w} > 0"
        )
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS ({universe})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "f0 AS (SELECT node AS start, w.walk_no, node FROM nodes, "
        f"(SELECT UNNEST(range({walks_per_node})) AS walk_no) w)",
    ]
    selects = ["SELECT start, walk_no, 0 AS step, node FROM f0"]
    for t in range(1, walk_length + 1):
        ht = stable_hash64_sql(
            f"concat_ws('|', 'ww', start, walk_no, {t})", salt=seed
        )
        parts.append(
            f"w{t} AS (SELECT s.start, s.walk_no, e.dst, "
            f"SUM(CAST(e.w AS DOUBLE)) OVER (PARTITION BY s.start, s.walk_no "
            f"ORDER BY e.dst ROWS UNBOUNDED PRECEDING) AS cum "
            f"FROM f{t - 1} s JOIN e ON s.node = e.src)"
        )
        parts.append(
            f"f{t} AS (SELECT start, walk_no, MIN(dst) AS node "
            f"FROM (SELECT *, MAX(cum) OVER (PARTITION BY start, walk_no) AS total "
            f"FROM w{t}) "
            f"WHERE cum >= (({ht} % {_U53}) / {float(_U53)!r}) * total "
            f"GROUP BY start, walk_no)"
        )
        selects.append(f"SELECT start, walk_no, {t} AS step, node FROM f{t}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)
