"""Spectral bipartition — Fiedler-vector sign split by deflated power
iteration on the graph Laplacian, in integer-exact arithmetic.

Engine extension beyond the reference procedure list (SURVEY.md §2 is
100% covered elsewhere): the Fiedler vector (second-smallest
eigenvector of L = D - A; Fiedler 1973, Shi & Malik 2000 — public
results) is the classic global graph-cut primitive: its sign pattern
2-partitions the graph near the minimum-conductance cut, complementing
the engine's local sweep (localcom.py) and balanced LPA partitioner
(partition.py) with the spectral view.

Power iteration runs on M = c·I - L (c = 2·d_max bounds λ_max(L), so
M's dominant eigenvector is L's smallest). L's smallest eigenvector is
the constant vector; it is deflated by subtracting the mean each
round, leaving the Fiedler direction dominant.

Integer discipline (the kcenter/SGNS recipe): the iterate x lives in
±1e6 int64 micro-units. One round is

    y   = (c - deg)·x + Σ_{nbr} x(nbr)      (order-free int64 sums)
    y'  = y - halfup(Σy / n)                 (deflation, integer mean)
    x'  = halfup(y' · 1e6 / max|y'|)         (∞-norm rescale to ±1e6)

— no float anywhere, so Spark, the unrolled DuckDB twin
(``spectral_bipartition_sql``) and a Python replay agree bit-for-bit
(ties and signs included). ``max|y'| = 0`` (exact fixpoint collapse)
is guarded by GREATEST(·, 1): x becomes all-zero and every later
round is idempotent. Sides are canonicalized so the minimum node id
is side 0.

Scale notes (100TB): per round ONE adjacency join + groupBy (the
PageRank shuffle — same hub caveats) plus two map-side-combinable
scalar aggregates (mean, max) over the narrow (id, x) frame; state is
pinned/released pairwise. Sequential in rounds by nature; 20-40
rounds separate well-clustered graphs (∞-norm scaling, like any power
iteration, converges at the λ2/λ3 ratio). Int64 headroom: the rescale
numerator is 2·|y - mean|·1e6 (+ the half-up offset), so it must hold
that max|y - mean| ≤ (2^63-1)/(2e6+1) ≈ 4.6e12 — with |y - mean| up
to ~4e6·d_max that is d_max ≈ 0.7e6 (NOT silently assumed: the loop
checks the MEASURED scale each round and raises before Spark's
non-ANSI int64 arithmetic could wrap). Beyond that, run on the
hub-capped graph (components.py hub_cap discipline) or lower the 1e6
unit.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import pin_table, release_state
from linkgraph.pipeline.classifier import halfup_div_duck_sql, int_halfup
from linkgraph.coloring import _sym
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql
from linkgraph.triangles import _undirected_simple

_U = 1_000_000


@dataclass
class SpectralResult:
    sides: DataFrame  # (id, side)
    rounds: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _sym_deg(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    sym = _sym(edges)
    deg = sym.groupBy("node").agg(F.count("*").alias("deg"))
    return sym, deg


def spectral_bipartition(
    edges: DataFrame,
    rounds: int = 25,
    seed: int = 0,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> SpectralResult:
    """Fiedler sign split (module docstring). Deterministic and
    integer-exact; replayed by ``spectral_bipartition_sql``. Returns
    per-node (id, side) with side ∈ {0, 1}, min-id node on side 0,
    plus cut stats (edge cut, conductance).

    Round-granular durable resume (the engine-wide SuperstepLoop
    contract): the durable state is the (id, deg, x) iterate —
    each round is a pure function of it, so a killed-then-resumed run
    equals an uninterrupted one exactly; guarded by the graph
    fingerprint and the seed."""
    from linkgraph.checkpoint import SuperstepLoop
    from linkgraph.kcore import _check_resume_fp

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    t0 = time.time()
    spark = edges.sparkSession
    sym, deg = _sym_deg(edges)
    sym = pin_table(sym.repartition("node"))
    deg = pin_table(deg)
    caches = [sym, deg]
    d_max = deg.agg(F.max("deg").alias("m")).first()["m"]
    if d_max is None:
        raise ValueError("spectral_bipartition: empty edge table")
    c = 2 * d_max
    n = deg.count()
    fp = (
        int(sym.agg(F.expr("bit_xor(xxhash64(node, nbr))").alias("fp"))
            .first()["fp"] or 0)
        if checkpoint_dir else None
    )
    params = {"seed": seed}
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="fiedler",
        max_steps=rounds, context={"graph_fp": fp, "params": params},
    )
    start = 0
    state = None
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            _check_resume_fp(
                "spectral_bipartition", loop.last_context.get("graph_fp"), fp
            )
            rec = loop.last_context.get("params")
            if rec is not None and rec != params:
                raise ValueError(
                    "spectral_bipartition resume mismatch: parameters "
                    f"differ ({rec!r} != {params!r})."
                )
            start, state = resumed
    if state is None:
        state = loop.advance(
            0,
            deg.select(
                F.col("node").alias("id"),
                "deg",
                (F.pmod(
                    stable_hash64(F.col("node").cast("string"),
                                  salt=f"fiedler-{seed}"),
                    F.lit(2 * _U + 1),
                ) - F.lit(_U)).cast("long").alias("x"),
            ),
            force_checkpoint=bool(checkpoint_dir),
        )
    for t in range(start + 1, rounds + 1):
        y = pin_table(_matvec(sym, state, c))
        tot = y.agg(F.sum("y").alias("s")).first()["s"]
        mean = int_halfup(int(tot), n)
        scale_row = y.agg(
            F.max(F.abs(F.col("y") - F.lit(mean))).alias("m")
        ).first()
        s = max(int(scale_row["m"]), 1)
        if s > (2**63 - 1) // (2 * _U + 1):
            raise ValueError(
                f"spectral_bipartition: rescale magnitude {s} would "
                "overflow the int64 half-up numerator (2*|y-mean|*1e6) — "
                "hub-cap the graph or lower the quantization unit."
            )
        state = loop.advance(
            t,
            y.selectExpr(
                "id", "deg",
                "(2 * ((y - {m}) * {u}) + CASE WHEN y >= {m} THEN {s} ELSE -{s} END) "
                "DIV (2 * {s}) AS x".format(m=mean, u=_U, s=s),
            ),
            metrics={"mean": mean, "scale": s},
        )
        release_state(y)
    caches.append(state)
    smin = state.orderBy(F.asc("id")).select(
        (F.col("x") >= 0).alias("s0")).first()["s0"]
    sides = state.select(
        "id",
        (((F.col("x") >= 0) != F.lit(smin)).cast("long")).alias("side"),
    )
    # cut stats over the final split
    a = sides.select(F.col("id").alias("a"), F.col("side").alias("pa"))
    b = sides.select(F.col("id").alias("b"), F.col("side").alias("pb"))
    und = _undirected_simple(edges)
    row = (
        und.join(a, "a").join(b, "b")
        .agg(
            F.count("*").alias("m"),
            F.sum((F.col("pa") != F.col("pb")).cast("long")).alias("cut"),
            F.sum(F.when(F.col("pa") == 0, 1).otherwise(0)
                  + F.when(F.col("pb") == 0, 1).otherwise(0)).alias("vol0"),
        )
        .first()
    )
    vol0 = int(row["vol0"] or 0)
    vol1 = 2 * int(row["m"]) - vol0
    cut = int(row["cut"] or 0)
    return SpectralResult(
        sides=sides,
        rounds=rounds,
        stats={
            "n_nodes": n,
            "edge_cut": cut / max(row["m"], 1),
            "conductance": cut / max(min(vol0, vol1), 1),
            "wall_s": round(time.time() - t0, 3),
        },
        _caches=caches,
    )


def _matvec(sym: DataFrame, state: DataFrame, c: int) -> DataFrame:
    """One (c·I − L)·x product (pre-pin) — the production kernel,
    exposed for plan assertions (tests/test_plans.py)."""
    gathered = (
        sym.join(state.select(F.col("id").alias("nbr"),
                              F.col("x").alias("nx")), "nbr")
        .groupBy("node")
        .agg(F.sum("nx").alias("sx"))
    )
    return state.join(gathered, state.id == gathered.node, "left").select(
        "id", "deg",
        ((F.lit(c) - F.col("deg")) * F.col("x")
         + F.coalesce(F.col("sx"), F.lit(0))).alias("y"),
    )


def spectral_bipartition_sql(edges_sql: str, rounds: int = 25, seed: int = 0) -> str:
    """Oracle: the deflated power-iteration rounds unrolled into
    DuckDB SQL — identical integer matvec, deflation and rescale."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    h = stable_hash64_sql("CAST(node AS VARCHAR)", salt=f"fiedler-{seed}")
    parts = [
        f"WITH e AS ({edges_sql})",
        """und AS (SELECT DISTINCT LEAST(src, dst) AS a,
  GREATEST(src, dst) AS b FROM e WHERE src <> dst)""",
        """sym AS (SELECT a AS node, b AS nbr FROM und
  UNION ALL SELECT b AS node, a AS nbr FROM und)""",
        """dg AS (SELECT node, COUNT(*) AS deg FROM sym GROUP BY node)""",
        """cc AS (SELECT 2 * MAX(deg) AS c, COUNT(*) AS n FROM dg)""",
        f"""x0 AS (SELECT node AS id, deg,
  CAST({h} % {2 * _U + 1} - {_U} AS BIGINT) AS x FROM dg)""",
    ]
    for t in range(1, rounds + 1):
        p = t - 1
        mean = halfup_div_duck_sql("SUM(y)", "MAX(n)")
        parts.append(
            f"""y{t} AS MATERIALIZED (SELECT s.id, s.deg,
  ((SELECT c FROM cc) - s.deg) * s.x + COALESCE(g.sx, 0) AS y
  FROM x{p} s LEFT JOIN (
    SELECT e.node, SUM(m.x) AS sx FROM sym e JOIN x{p} m ON m.id = e.nbr
    GROUP BY e.node) g ON g.node = s.id)"""
        )
        parts.append(
            f"""m{t} AS MATERIALIZED (SELECT {mean} AS mean
  FROM y{t}, cc)"""
        )
        parts.append(
            f"""s{t} AS MATERIALIZED (SELECT
  GREATEST(MAX(ABS(y - (SELECT mean FROM m{t}))), 1) AS s FROM y{t})"""
        )
        resc = halfup_div_duck_sql(
            f"(y - (SELECT mean FROM m{t})) * {_U}", f"(SELECT s FROM s{t})"
        )
        parts.append(
            f"""x{t} AS MATERIALIZED (SELECT id, deg, {resc} AS x FROM y{t})"""
        )
    return ",\n".join(parts) + f"""
, fin AS (SELECT id, x >= 0 AS pos FROM x{rounds}),
anchor AS (SELECT pos FROM fin ORDER BY id LIMIT 1)
SELECT id, CAST(pos <> (SELECT pos FROM anchor) AS BIGINT) AS side FROM fin"""
