"""k-core decomposition — iterative peeling and h-index coreness.

An engine extension beyond the reference procedure list (SURVEY.md §2
is 100% covered elsewhere): k-core is the standard link-graph pruning
/ spam-detection primitive a web-scale PageRank deployment runs next,
and it reuses this engine's superstep discipline.

Two operators over an undirected simple view of the edge table
(symmetrized, self-loops dropped, duplicates collapsed):

* ``k_core(edges, k)`` — the maximal subgraph where every node has
  degree >= k, by iterative peeling: drop nodes with degree < k,
  recompute degrees, repeat to fixpoint. Returns members with their
  in-core degree.
* ``core_numbers(edges)`` — EVERY node's coreness via distributed
  h-index iteration (Lü, Zhou, Zhang, Stanley, "The H-index of a
  network node and its relation to degree and coreness", Nature
  Communications 7:10168, 2016 — public result): start from degree,
  repeatedly replace each node's value with the h-index of its
  neighbors' values; the fixpoint is exactly the core number.

Scale notes (100TB): per round the h-index iteration costs TWO hash
exchanges (the state join onto the edge table + the per-node neighbor
aggregation) and a peel round THREE (two survivor semi-joins + the
degree aggregation); the symmetrized table is pinned once and reused
every round, so only the (small) state table and aggregation outputs
move after round 1. Values are monotonically non-increasing, so
convergence is metered with a cheap SUM aggregate (strictly decreasing
until the fixpoint) instead of a changed-rows join — the same metering
as connected components. The h-index round aggregates a sorted
neighbor-value array per node; at power-law hubs that array is the
hub's degree, so for 100TB graphs pair it with the degree-histogram
skew probe and cap rounds (coreness of a hub converges from above —
early rounds already upper-bound it).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import (
    SuperstepLoop,
    attach_caches,
    pin_table,
    release_state,
)


@dataclass
class KCoreResult:
    members: DataFrame  # (id: long, degree: long) — degree within the core
    rounds: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the pinned survivor frame backing ``members``
        (house release contract — same as TriangleResult.release)."""
        for c in self._caches:
            release_state(c)
        self._caches = []


@dataclass
class CorenessResult:
    coreness: DataFrame  # (id: long, coreness: long)
    rounds: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _sym_simple(edges: DataFrame) -> DataFrame:
    """Undirected simple view: symmetrize, drop self-loops, dedupe."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .distinct()
    )


def _graph_fp(sym: DataFrame) -> int:
    """Order-independent fingerprint of the symmetrized edge set —
    resume guard (same contract as scc/mst/betweenness)."""
    return int(
        sym.agg(F.expr("bit_xor(xxhash64(a, b))").alias("fp")).first()["fp"] or 0
    )


def _check_resume_fp(name: str, recorded, current: int) -> None:
    if recorded is not None and int(recorded) != current:
        raise ValueError(
            f"{name} resume mismatch: the edge table differs from the "
            f"checkpointed run (fingerprint {recorded} != {current}); "
            "per-round state would mix graphs. Rerun without resume or "
            "with the original edges."
        )


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> KCoreResult:
    """Peel to the k-core; returns (id, degree) for surviving nodes.

    Each round: count surviving-neighbor degrees, keep nodes with
    degree >= k, semi-join the edge set down. The surviving
    node set only shrinks, so the per-round cost decreases; rounds =
    peeling depth (2-3 on co-occurrence graphs, O(n) only on
    adversarial chains — bounded by max_iter).

    resume: with a ``checkpoint_dir``, continue from the last durable
    survivor frame, validated against the graph fingerprint AND the
    recorded k (resuming a k=25 peel with a different k would silently
    reuse a k-specific survivor set).
    """
    sym = pin_table(_sym_simple(edges))
    graph_fp = _graph_fp(sym) if checkpoint_dir else None
    loop = SuperstepLoop(
        edges.sparkSession, checkpoint_dir, every=checkpoint_every,
        name="kcore", context={"graph_fp": graph_fp, "k": k},
    )
    # survivors as a node column; None sentinel = "all nodes" round 0
    alive: DataFrame | None = None
    prev_n = -1
    start_round = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp("k_core", loop.last_context.get("graph_fp"), graph_fp)
            rec_k = loop.last_context.get("k")
            if rec_k is not None and int(rec_k) != k:
                raise ValueError(
                    f"k_core resume mismatch: checkpointed k={rec_k}, "
                    f"requested k={k}; the survivor set is k-specific."
                )
            start_round, state = resumed
            alive = pin_table(state.select("a", "degree"))
            prev_n = int(loop.last_metrics.get("n_alive", alive.count()))
    rounds = start_round
    while rounds < max_iter:
        if alive is None:
            cur = sym
        else:
            keep = alive.select("a")
            cur = (
                sym.join(keep, "a")
                .join(keep.select(F.col("a").alias("b")), "b")
                .select("a", "b")
            )
        deg = cur.groupBy("a").agg(F.count("*").alias("degree"))
        nxt = pin_table(deg.filter(F.col("degree") >= k).select("a", "degree"))
        n = nxt.count()
        rounds += 1
        release_state(alive)
        alive = nxt
        if checkpoint_dir and rounds % checkpoint_every == 0:
            loop.advance(
                rounds, alive, metrics={"n_alive": n}, force_checkpoint=True
            )
        if n == prev_n:
            break
        prev_n = n
    members = attach_caches(
        alive.select(
            F.col("a").alias("id"), F.col("degree").cast("long").alias("degree")
        ),
        [alive],
    )
    release_state(sym)
    return KCoreResult(
        members=members, rounds=rounds, stats={"k": k}, _caches=[alive]
    )


def k_core_sql(edges_sql: str, k: int, n_rounds: int = 6) -> str:
    """Oracle: the peel unrolled ``n_rounds`` times (idempotent past
    the fixpoint — extra rounds re-select the same set)."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        f"""n1 AS (SELECT a AS id, COUNT(*) AS degree FROM sym
  GROUP BY a HAVING COUNT(*) >= {k})""",
    ]
    for t in range(2, n_rounds + 1):
        parts.append(
            f"""n{t} AS (SELECT s.a AS id, COUNT(*) AS degree FROM sym s
  JOIN n{t - 1} p ON p.id = s.a JOIN n{t - 1} q ON q.id = s.b
  GROUP BY s.a HAVING COUNT(*) >= {k})"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, CAST(degree AS BIGINT) AS degree FROM n{n_rounds}"
    )


def _h_index(vals_desc):
    """h-index of a DESC-sorted value array, as a Catalyst expression:
    h = max_i min(v_i, i) (the classic sorted-vector identity)."""
    idx = F.sequence(F.lit(1), F.size(vals_desc))
    return F.array_max(
        F.zip_with(vals_desc, idx, lambda v, i: F.least(v, i.cast("long")))
    )


def core_numbers(
    edges: DataFrame,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> CorenessResult:
    """Coreness of every node by h-index iteration from degrees.

    Per round: join neighbor values (exchange 1), per-node DESC-sorted
    value array (exchange 2), h-index as a JVM-side zip_with/array_max
    expression (no UDF).
    Convergence metered by SUM(c) — monotone non-increasing, strictly
    decreasing until the fixpoint.

    resume: with a ``checkpoint_dir``, continue from the last durable
    (id, c) frame (graph-fingerprint validated); the recorded sum_c
    re-enters the convergence meter so a resumed-at-fixpoint run stops
    after one confirming round, exactly like the uninterrupted run.
    """
    sym = pin_table(_sym_simple(edges))
    graph_fp = _graph_fp(sym) if checkpoint_dir else None
    loop = SuperstepLoop(
        edges.sparkSession, checkpoint_dir, every=checkpoint_every,
        name="coreness", context={"graph_fp": graph_fp},
    )
    c = None
    prev_sum = None
    start_round = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "core_numbers", loop.last_context.get("graph_fp"), graph_fp
            )
            start_round, state = resumed
            c = pin_table(state.select("id", "c"))
            rec = loop.last_metrics.get("sum_c")
            prev_sum = int(rec) if rec is not None else c.agg(F.sum("c")).collect()[0][0]
    if c is None:
        c = pin_table(
            sym.groupBy("a").agg(F.count("*").cast("long").alias("c"))
            .select(F.col("a").alias("id"), "c")
        )
        prev_sum = c.agg(F.sum("c")).collect()[0][0]
    rounds = start_round
    while rounds < max_iter:
        nbr_vals = (
            sym.join(c.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.sort_array(F.collect_list("c"), asc=False).alias("vals"))
        )
        nxt = pin_table(
            nbr_vals.select(F.col("a").alias("id"), _h_index(F.col("vals")).alias("c"))
        )
        s = nxt.agg(F.sum("c")).collect()[0][0]
        rounds += 1
        release_state(c)
        c = nxt
        if checkpoint_dir and rounds % checkpoint_every == 0:
            loop.advance(rounds, c, metrics={"sum_c": int(s)}, force_checkpoint=True)
        if s == prev_sum:
            break
        prev_sum = s
    coreness = attach_caches(
        c.select("id", F.col("c").cast("long").alias("coreness")), [c]
    )
    release_state(sym)
    return CorenessResult(coreness=coreness, rounds=rounds, _caches=[c])


def core_numbers_sql(edges_sql: str, n_rounds: int = 8) -> str:
    """Oracle: the h-index recurrence unrolled ``n_rounds`` times
    (h-index of an already-converged assignment is itself)."""
    hidx = (
        "list_max([least(v[i], CAST(i AS BIGINT)) "
        "for i in range(1, len(v) + 1)])"
    )
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "c0 AS (SELECT a AS id, CAST(COUNT(*) AS BIGINT) AS c FROM sym GROUP BY a)",
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""c{t} AS (
  SELECT a AS id, {hidx} AS c FROM (
    SELECT s.a, list_sort(list(p.c), 'DESC') AS v
    FROM sym s JOIN c{t - 1} p ON p.id = s.b GROUP BY s.a))"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, CAST(c AS BIGINT) AS coreness FROM c{n_rounds}"
    )


def onion_layers(
    edges: DataFrame,
    max_iter: int = 200,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> CorenessResult:
    """Onion decomposition (Hébert-Dufresne, Grochow, Allard, Sci.
    Rep. 6:31708, 2016 — public result): the k-core peel refined into
    LAYERS. Per round, every node whose current degree is <= the
    active core threshold k is removed SIMULTANEOUSLY — that batch is
    one layer; k rises to the surviving minimum degree whenever the
    current core is clean. Each node gets (layer, coreness): layer is
    the onion depth (how central the node is WITHIN its core — the
    refinement the paper shows separates tree-like from dense cores),
    coreness is the standard core number (k at removal — equality
    with `core_numbers` is the cross-check in tests).

    Returns a `CorenessResult` whose frame is (id, layer, coreness).

    Determinism: the peel is simultaneous (no tie-breaking) and all
    quantities are integer degrees — the DuckDB twin
    (`onion_layers_sql`) is hash-exact.

    Scale notes (100TB): same per-round shape as `k_core` (two
    survivor semi-joins + one degree aggregation over the pinned
    symmetric table, plus one 2-scalar aggregate for the threshold);
    rounds = layer count, which is O(peeling depth) — tens on
    power-law graphs, O(n) only on adversarial chains (bounded by
    max_iter). State (the survivor node set) only shrinks. resume:
    with a ``checkpoint_dir``, continues from the last durable
    (remaining ∪ assigned) frame, graph-fingerprint validated."""
    sym = pin_table(_sym_simple(edges))
    graph_fp = _graph_fp(sym) if checkpoint_dir else None
    loop = SuperstepLoop(
        edges.sparkSession, checkpoint_dir, every=checkpoint_every,
        name="onion", context={"graph_fp": graph_fp},
    )
    spark = edges.sparkSession
    # state: (id, layer, coreness) with layer NULL = still alive
    alive = pin_table(
        sym.select(F.col("a").alias("id")).distinct()
    )
    done: DataFrame | None = None
    k = 0
    rounds = 0
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "onion_layers", loop.last_context.get("graph_fp"), graph_fp
            )
            rounds, state = resumed
            release_state(alive)
            alive = pin_table(
                state.filter(F.col("layer").isNull()).select("id")
            )
            done = pin_table(
                state.filter(F.col("layer").isNotNull())
                .select("id", "layer", "coreness")
            )
            k = int(loop.last_metrics["k"])
    n_alive = alive.count()
    while n_alive > 0 and rounds < max_iter:
        keep_a = alive.select(F.col("id").alias("a"))
        keep_b = alive.select(F.col("id").alias("b"))
        deg = (
            alive.join(
                sym.join(keep_a, "a").join(keep_b, "b")
                .groupBy("a").agg(F.count("*").cast("long").alias("d"))
                .withColumnRenamed("a", "id"),
                "id", "left",
            )
            .select("id", F.coalesce(F.col("d"), F.lit(0)).alias("d"))
        )
        deg = pin_table(deg)
        min_d = deg.agg(F.min("d")).first()[0]
        k = max(k, int(min_d))
        rounds += 1
        peel = deg.filter(F.col("d") <= k).select(
            "id",
            F.lit(rounds).cast("long").alias("layer"),
            F.lit(k).cast("long").alias("coreness"),
        )
        done = peel if done is None else done.unionByName(peel)
        nxt_alive = alive.join(
            deg.filter(F.col("d") <= k).select("id"), "id", "left_anti"
        )
        # one durable state per round: assigned rows + alive sentinel
        state = done.unionByName(
            nxt_alive.select(
                "id",
                F.lit(None).cast("long").alias("layer"),
                F.lit(None).cast("long").alias("coreness"),
            )
        )
        state = loop.advance(rounds, state, metrics={"k": k})
        done = state.filter(F.col("layer").isNotNull()).select(
            "id", "layer", "coreness"
        )
        release_state(alive)
        release_state(deg)
        alive = pin_table(state.filter(F.col("layer").isNull()).select("id"))
        n_alive = alive.count()
    out = done if done is not None else spark.createDataFrame(
        [], "id long, layer long, coreness long"
    )
    final = pin_table(out)
    release_state(alive)
    release_state(sym)
    return CorenessResult(
        coreness=final.select("id", "layer", "coreness"),
        rounds=rounds,
        stats={"layers": rounds, "max_coreness": k},
        _caches=[final],
    )


def onion_layers_sql(edges_sql: str, n_rounds: int = 24) -> str:
    """Oracle for `onion_layers`: the simultaneous peel unrolled
    ``n_rounds`` times (rounds past exhaustion peel the empty set).
    The core threshold k threads through rounds as a 1-row CTE:
    k_t = GREATEST(k_{t-1}, COALESCE(MIN(deg), k_{t-1}))."""
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "a0 AS MATERIALIZED (SELECT DISTINCT a AS id FROM sym)",
        "k0 AS (SELECT CAST(0 AS BIGINT) AS k)",
    ]
    for t in range(1, n_rounds + 1):
        parts.append(
            f"""d{t} AS MATERIALIZED (
  SELECT n.id, COALESCE(c.d, 0) AS d
  FROM a{t - 1} n LEFT JOIN (
    SELECT s.a AS id, CAST(COUNT(*) AS BIGINT) AS d FROM sym s
    JOIN a{t - 1} p ON p.id = s.a JOIN a{t - 1} q ON q.id = s.b
    GROUP BY s.a) c ON c.id = n.id)"""
        )
        parts.append(
            f"""k{t} AS (SELECT GREATEST(k.k, COALESCE(m.md, k.k)) AS k
  FROM k{t - 1} k CROSS JOIN (SELECT MIN(d) AS md FROM d{t}) m)"""
        )
        parts.append(
            f"""p{t} AS MATERIALIZED (
  SELECT d.id, CAST({t} AS BIGINT) AS layer, k.k AS coreness
  FROM d{t} d CROSS JOIN k{t} k WHERE d.d <= k.k)"""
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (SELECT id FROM a{t - 1}
  WHERE id NOT IN (SELECT id FROM p{t}))"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT id, layer, coreness FROM p{t}" for t in range(1, n_rounds + 1)
    )
    return ",\n".join(parts) + "\n" + sel


def s_core(
    edges: DataFrame,
    s: float,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> KCoreResult:
    """Weighted (s-)core decomposition (Eidsaa & Almaas 2013, PRE
    88:062819): peel until every surviving node's STRENGTH — the sum
    of surviving-edge weights — is >= ``s``. The weighted analog of
    `k_core` for graphs where edge multiplicity carries the signal
    (the co-occurrence-count graphs this engine is built around).

    Returns (id, strength) for survivors, strength rounded to 6.
    Exactness: weights enter the 6-decimal fixed-point integer domain
    ONCE (ROUND(w * 1e6) as int64 — the weighted-similarity
    contract), every per-round strength is an order-free INTEGER sum
    compared against round(s * 1e6), and the float division back
    happens once at the end. Weights are summed per unordered pair
    after symmetrization (a directed pair with both orientations
    contributes both weights to each endpoint's strength).

    Same peel shape and resume contract as `k_core` (graph
    fingerprint + recorded s6 validated on resume). Int64 holds while
    a node's strength < ~9.2e12 weight units — beyond that cast the
    sum to decimal(38, 0).
    """
    wcol = (
        F.coalesce(F.col("weight"), F.lit(1.0))
        if "weight" in edges.columns
        else F.lit(1.0)
    )
    w6 = F.round(wcol.cast("double") * F.lit(1_000_000.0), 0).cast("long")
    s6 = int(round(s * 1_000_000))
    e = (
        edges.select("src", "dst", w6.alias("w6"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = pin_table(
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"), "w6")
        .unionByName(e.select(F.col("dst").alias("a"), F.col("src").alias("b"), "w6"))
        .groupBy("a", "b")
        .agg(F.sum("w6").alias("w6"))
    )
    graph_fp = (
        int(
            sym.agg(F.expr("bit_xor(xxhash64(a, b, w6))").alias("fp")).first()["fp"]
            or 0
        )
        if checkpoint_dir
        else None
    )
    loop = SuperstepLoop(
        edges.sparkSession, checkpoint_dir, every=checkpoint_every,
        name="score", context={"graph_fp": graph_fp, "s6": s6},
    )
    alive: DataFrame | None = None
    prev_n = -1
    start_round = 0
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp("s_core", loop.last_context.get("graph_fp"), graph_fp)
            rec_s6 = loop.last_context.get("s6")
            if rec_s6 is not None and int(rec_s6) != s6:
                raise ValueError(
                    f"s_core resume mismatch: checkpointed s6={rec_s6}, "
                    f"requested {s6}; the survivor set is s-specific."
                )
            start_round, state = resumed
            alive = pin_table(state.select("a", "st6"))
            prev_n = int(loop.last_metrics.get("n_alive", alive.count()))
    rounds = start_round
    while rounds < max_iter:
        if alive is None:
            cur = sym
        else:
            keep = alive.select("a")
            cur = (
                sym.join(keep, "a")
                .join(keep.select(F.col("a").alias("b")), "b")
                .select("a", "b", "w6")
            )
        st = cur.groupBy("a").agg(F.sum("w6").alias("st6"))
        nxt = pin_table(st.filter(F.col("st6") >= s6).select("a", "st6"))
        n = nxt.count()
        rounds += 1
        release_state(alive)
        alive = nxt
        if checkpoint_dir and rounds % checkpoint_every == 0:
            loop.advance(rounds, alive, metrics={"n_alive": n}, force_checkpoint=True)
        if n == prev_n:
            break
        prev_n = n
    members = attach_caches(
        alive.select(
            F.col("a").alias("id"),
            F.round(F.col("st6").cast("double") / F.lit(1_000_000.0), 6).alias(
                "strength"
            ),
        ),
        [alive, sym],
    )
    return KCoreResult(members=members, rounds=rounds, _caches=[alive, sym])


def s_core_sql(edges_sql: str, s: float, n_rounds: int = 6) -> str:
    """Oracle for `s_core`: the weighted peel unrolled ``n_rounds``
    times (idempotent past the fixpoint), all in the w6 integer
    domain."""
    s6 = int(round(s * 1_000_000))
    parts = [
        f"WITH e0 AS ({edges_sql})",
        """ed AS (SELECT DISTINCT src, dst,
  CAST(ROUND(CAST(COALESCE(weight, 1.0) AS DOUBLE) * 1000000.0) AS BIGINT) AS w6
  FROM e0 WHERE src <> dst)""",
        """sym AS (SELECT a, b, SUM(w6) AS w6 FROM (
  SELECT src AS a, dst AS b, w6 FROM ed
  UNION ALL SELECT dst, src, w6 FROM ed) GROUP BY a, b)""",
        f"""n1 AS MATERIALIZED (SELECT a AS id, SUM(w6) AS st6 FROM sym
  GROUP BY a HAVING SUM(w6) >= {s6})""",
    ]
    # each round references the previous CTE twice: MATERIALIZED stops
    # DuckDB's default inlining from re-expanding the chain 2^rounds x
    for t in range(2, n_rounds + 1):
        parts.append(
            f"""n{t} AS MATERIALIZED (SELECT s.a AS id, SUM(s.w6) AS st6 FROM sym s
  JOIN n{t - 1} p ON p.id = s.a JOIN n{t - 1} q ON q.id = s.b
  GROUP BY s.a HAVING SUM(s.w6) >= {s6})"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT id, ROUND(CAST(st6 AS DOUBLE) / 1000000.0, 6) AS strength"
        f" FROM n{n_rounds}"
    )
