"""Approximate neighborhood function (ANF / HyperBall).

The web-graph distance toolbox at 10^12-node scale: per-node ball
sizes |B(u, t)| for growing radius t, their sum (the neighborhood
function N(t)), and the effective diameter — computed with mergeable
HyperLogLog registers propagated along edges, after Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall"
(ICDM 2013) and Palmer/Gibbons/Faloutsos ANF (KDD 2002) — public
papers; design re-expressed for Spark DataFrames.

Sketch = m = 2^b integer registers per node. A node's initial sketch
holds rho(h(u)) at bucket(h(u)); one propagation round replaces every
sketch with the ELEMENTWISE MAX over its neighbors' sketches and its
own. After t rounds register j of node u is max{rho(h(v)) : v in
B(u,t), bucket(v)=j} — exactly the HLL state of the ball as a set, so
the standard HLL estimate (with the small-range linear-counting
correction) applied per node per round yields |B(u,t)|.

Everything is deterministic integer math over the cross-engine
md5-prefix hash, so the DuckDB oracle replays the SAME registers and
the SAME estimator — value-exact comparison, not a tolerance band.

Scale shape (100TB): the per-round aggregation is m independent MAX
aggregates over element_at(sk, j) — partial-aggregated map-side, so a
power-law hub ships m longs per reducer, NOT its neighbor list (this
map-side combinability is exactly why HyperBall scales; contrast a
collect_list of neighbor sketches). One shuffle per round for the
state join + one for the aggregation; the symmetrized edge table is
pinned once. Register width m trades accuracy (HLL std err =
1.04/sqrt(m)) for 8*m bytes/node of state.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches, pin_table, release_state
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

# standard HLL bias constants (Flajolet et al. 2007, public)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1 + 1.079 / m))


@dataclass
class AnfResult:
    balls: DataFrame  # (t: long, id: long, est: double) — |B(id, t)| estimate
    rounds: int
    m: int
    stats: dict = field(default_factory=dict)

    def release(self) -> None:
        """Unpersist the pinned per-radius snapshots backing ``balls``
        (house release contract; equivalently release_caches(balls))."""
        from linkgraph.checkpoint import release_caches
        release_caches(self.balls)


def _sym_self(edges: DataFrame) -> DataFrame:
    """Undirected propagation pairs INCLUDING (id, id) self-pairs, so
    one round's max covers the node's own previous sketch."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    ids = (
        e.select(F.col("src").alias("a"))
        .union(e.select(F.col("dst").alias("a")))
        .distinct()
    )
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .union(ids.select("a", F.col("a").alias("b")))
        .distinct()
    )


def _init_sketch(m: int, b: int, w: int, seed: int) -> Column:
    """One-hot HLL sketch of {id}: rho at bucket, 0 elsewhere.

    h = 60-bit stable hash; bucket = h % m; the remaining w = 60 - b
    bits h2 = h >> b give rho = w - highbit(h2) (h2 == 0 -> w + 1),
    i.e. 1 + the number of leading zeros in the w-bit window — the
    textbook HLL register value, in exact integer arithmetic.
    """
    h = stable_hash64(F.col("id").cast("string"), salt=seed)
    bucket = h % m
    h2 = F.shiftright(h, b)
    hb = F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(w - 1)),
            # SQL shiftright accepts a column shift amount (the python
            # F.shiftright wrapper insists on an int literal)
            lambda i: F.when(
                F.call_function("shiftright", h2, i).bitwiseAND(F.lit(1)) == 1, i
            ).otherwise(F.lit(-1)),
        )
    )
    rho = (F.lit(w) - hb).cast("long")
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.when(j == bucket, rho).otherwise(F.lit(0).cast("long")),
    )


def _estimate(sk: Column, m: int) -> Column:
    """HLL cardinality estimate from a register array, with the
    small-range linear-counting correction; rounded to 6 decimals
    (both engines compute it from identical integer registers)."""
    z = F.aggregate(
        F.transform(sk, lambda r: F.pow(F.lit(2.0), -r.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    zeros = F.size(F.filter(sk, lambda r: r == 0))
    raw = F.lit(_alpha(m) * m * m) / z
    lin = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.when((raw <= 2.5 * m) & (zeros > 0), lin).otherwise(raw)
    return F.round(est, 6)


def anf(
    edges: DataFrame,
    max_t: int = 4,
    m: int = 16,
    seed: int = 0,
) -> AnfResult:
    """Per-node ball-size estimates |B(id, t)| for t = 0..max_t over
    the undirected simple graph. Returns rows (t, id, est).

    Stops early when the global register sum stops changing (all
    balls saturated = every distance reached); ``rounds`` reports the
    last t actually propagated.
    """
    b = int(math.log2(m))
    if 2 ** b != m or not 16 <= m <= 1024:
        raise ValueError(f"m must be a power of two in [16, 1024], got {m}")
    w = 60 - b
    sym = pin_table(_sym_self(edges))
    sk = pin_table(
        sym.select("a").distinct()
        .select(F.col("a").alias("id"))
        .select("id", _init_sketch(m, b, w, seed).alias("sk"))
    )

    def snapshot(t: int, state: DataFrame) -> DataFrame:
        # materialize the (small) estimate rows EAGERLY: the source
        # sketch is a localCheckpoint that gets released next round and
        # could not be recomputed lazily afterwards
        return pin_table(
            state.select(
                F.lit(t).cast("long").alias("t"),
                "id",
                _estimate(F.col("sk"), m).alias("est"),
            )
        )

    snapshots = [snapshot(0, sk)]
    prev_sum = sk.agg(
        F.sum(F.aggregate(F.col("sk"), F.lit(0).cast("long"), lambda a, x: a + x))
    ).collect()[0][0]
    rounds = 0
    for t in range(1, max_t + 1):
        g = (
            sym.join(sk.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(*[
                F.max(F.element_at("sk", j + 1)).alias(f"r{j}") for j in range(m)
            ])
        )
        nxt = pin_table(
            g.select(
                F.col("a").alias("id"),
                F.array(*[F.col(f"r{j}") for j in range(m)]).alias("sk"),
            )
        )
        s = nxt.agg(
            F.sum(F.aggregate(F.col("sk"), F.lit(0).cast("long"), lambda a, x: a + x))
        ).collect()[0][0]
        rounds = t
        release_state(sk)
        sk = nxt
        snapshots.append(snapshot(t, sk))
        if s == prev_sum:
            # saturated: every remaining radius has the same balls —
            # emit the stable snapshot for t+1..max_t so the output
            # shape matches the requested max_t (and the unrolled
            # oracle) regardless of where convergence landed
            for t_fill in range(t + 1, max_t + 1):
                snapshots.append(snapshot(t_fill, sk))
            break
        prev_sum = s
    release_state(sk)
    release_state(sym)
    balls = snapshots[0]
    for snap in snapshots[1:]:
        balls = balls.union(snap)
    # the snapshot pins back the returned frame — hand their release
    # to the caller (release_caches(balls)), house cache contract
    balls = attach_caches(balls, snapshots)
    return AnfResult(balls=balls, rounds=rounds, m=m, stats={"max_t": max_t})


def neighborhood_function(res: AnfResult) -> list[tuple[int, float]]:
    """N(t) = sum of per-node ball estimates, per t (driver-side; the
    number of t values is the graph's effective radius, tiny)."""
    rows = (
        res.balls.groupBy("t").agg(F.sum("est").alias("n"))
        .orderBy("t").collect()
    )
    return [(int(r["t"]), float(r["n"])) for r in rows]


def effective_diameter(res: AnfResult, q: float = 0.9) -> int:
    """Smallest t with N(t) >= q * N(t_max) — the standard q-effective
    diameter read off the neighborhood function."""
    nf = neighborhood_function(res)
    target = q * nf[-1][1]
    for t, n in nf:
        if n >= target:
            return t
    return nf[-1][0]


def anf_sql(edges_sql: str, max_t: int = 4, m: int = 16, seed: int = 0) -> str:
    """Oracle: the register recurrence and estimator replayed exactly,
    rounds unrolled (elementwise max is idempotent past saturation)."""
    b = int(math.log2(m))
    w = 60 - b
    h = stable_hash64_sql("CAST(a AS VARCHAR)", salt=seed)
    alpha = _alpha(m)
    est = (
        f"ROUND(CASE WHEN {alpha * m * m} / list_sum([pow(2.0, -r) for r in sk]) <= {2.5 * m} "
        f"AND len(list_filter(sk, r -> r = 0)) > 0 "
        f"THEN {float(m)} * ln({float(m)} / len(list_filter(sk, r -> r = 0))) "
        f"ELSE {alpha * m * m} / list_sum([pow(2.0, -r) for r in sk]) END, 6)"
    )
    parts = [
        f"WITH e AS ({edges_sql})",
        """ids AS (SELECT DISTINCT a FROM (
  SELECT src AS a FROM e WHERE src <> dst
  UNION ALL SELECT dst FROM e WHERE src <> dst))""",
        """sym AS (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst
  UNION ALL SELECT a, a FROM ids))""",
        f"""hh AS (SELECT a, {h} AS h FROM ids)""",
        f"""rr AS (SELECT a, h % {m} AS bucket,
  CAST({w} - list_max([CASE WHEN ((h >> {b}) >> i) & 1 = 1 THEN i ELSE -1 END
                       for i in range(0, {w})]) AS BIGINT) AS rho
  FROM hh)""",
        f"""c0 AS (SELECT a AS id,
  [CASE WHEN j = bucket THEN rho ELSE CAST(0 AS BIGINT) END
   for j in range(0, {m})] AS sk FROM rr)""",
    ]
    # element-wise max over the grouped sketch lists, one explicit
    # entry per register (avoids nested-lambda scoping differences)
    elem_max = ", ".join(
        f"list_max(list_transform(sks, l -> l[{j}]))" for j in range(1, m + 1)
    )
    for t in range(1, max_t + 1):
        parts.append(
            f"""c{t} AS (
  SELECT a AS id, [{elem_max}] AS sk
  FROM (SELECT s.a, list(p.sk) AS sks
        FROM sym s JOIN c{t - 1} p ON p.id = s.b GROUP BY s.a))"""
        )
    selects = [
        f"SELECT CAST({t} AS BIGINT) AS t, id, {est} AS est FROM c{t}"
        for t in range(0, max_t + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


def hyperball_harmonic(
    edges: DataFrame,
    max_t: int = 4,
    m: int = 16,
    seed: int = 0,
) -> DataFrame:
    """Harmonic centrality from HyperBall sketches — the paper's
    headline application (Boldi & Vigna ICDM'13): H(u) =
    sum_{t>=1} (|B(u,t)| - |B(u,t-1)|) / t, i.e. each ball GROWTH ring
    weighted by 1/distance, with ball sizes the HLL estimates.

    Truncated at ``max_t`` (radii beyond it contribute 0; run with
    max_t >= the effective diameter for the full value). Returns
    (id, harmonic) rounded to 6 decimals. The per-id sum folds a
    t-sorted array left-to-right, so both engines accumulate the
    floating-point terms in the SAME order — value-exact against the
    SQL oracle, cross-validatable against the exact MS-BFS harmonic.

    Scale: one extra shuffle over the (t, id, est) snapshot table
    (n * (max_t+1) rows) on top of the anf() rounds.
    """
    res = anf(edges, max_t=max_t, m=m, seed=seed)
    rings = (
        res.balls.groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("t", "est"))).alias("series"))
    )
    # left fold over the t-ordered series: sum (est_t - est_{t-1})/t
    harm = F.aggregate(
        F.sequence(F.lit(1), F.size("series") - 1),
        F.lit(0.0),
        lambda acc, i: acc
        + (
            F.element_at("series", i + 1)["est"] - F.element_at("series", i)["est"]
        )
        / F.element_at("series", i + 1)["t"].cast("double"),
    )
    out = rings.select("id", F.round(harm, 6).alias("harmonic"))
    return attach_caches(out, getattr(res.balls, "_linkgraph_caches", []))


def hyperball_harmonic_sql(
    edges_sql: str, max_t: int = 4, m: int = 16, seed: int = 0
) -> str:
    """Oracle: the same left fold over the t-ordered estimate series
    from the anf oracle."""
    inner = anf_sql(edges_sql, max_t=max_t, m=m, seed=seed)
    terms = " + ".join(
        f"(series[{t + 1}] - series[{t}]) / {float(t)}" for t in range(1, max_t + 1)
    )
    return f"""
WITH balls AS ({inner}),
g AS (SELECT id, list(est ORDER BY t ASC) AS series FROM balls GROUP BY id)
SELECT id, ROUND({terms}, 6) AS harmonic FROM g
"""
