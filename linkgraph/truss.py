"""k-truss decomposition — per-edge triangle support + iterative peel.

Engine extension beyond the reference procedure list (SURVEY.md §2 is
100% covered elsewhere): the k-truss (Cohen 2008, "Trusses: cohesive
subgraphs for social network analysis" — public result) is the
edge-analog of the k-core this engine already ships, and the standard
next refinement of its triangle machinery — every edge of a k-truss
participates in >= k-2 triangles inside the subgraph, so trusses
isolate cohesive cores that degree-based peeling (k-core) cannot.

Two operators over the undirected simple view:

* ``edge_support(edges)`` — per canonical edge (a < b) the number of
  triangles containing it, via the same degree-ordered wedge plan as
  ``triangle_count`` (each triangle enumerated exactly once as an
  oriented (u, v, w); one explode emits its three edges into a
  map-side-combined count).
* ``k_truss(edges, k)`` — iterative peel: recompute support, drop
  edges with support < k-2, repeat to fixpoint. Returns surviving
  edges WITH their in-truss support.

Scale notes (100TB): each peel round costs one orientation pass (two
degree joins over the shrinking edge set) + the wedge join + one
aggregation — all hash exchanges, no sorts of the wedge stream (the
closing check is a semi-join probe exactly as in triangles.py, whose
degree-ordering bounds wedge fan-out at O(sqrt m) per pivot). The
surviving edge set shrinks monotonically, so rounds get cheaper; the
support recomputation is from scratch per round (at web scale the
standard refinement is decremental support maintenance, but that
requires per-edge mutable state — a deliberate non-goal for a
shuffle-based engine; the from-scratch round is embarrassingly
parallel and resumable for free since each round is a pure function
of the previous edge set).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches, pin_table, release_state
from linkgraph.triangles import _undirected_simple


@dataclass
class TrussResult:
    edges: DataFrame  # (a: long, b: long, support: long), a < b
    rounds: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        for c in self._caches:
            release_state(c)
        self._caches = []


def _support(und: DataFrame) -> DataFrame:
    """(a, b, support) for every canonical edge with support >= 1.

    Degree-ordered orientation (same total order as triangles.py) so
    each triangle appears exactly once as (u, v, w) with u->v, u->w,
    v->w; one explode emits its three canonical edges.
    """
    ends = und.select(F.col("a").alias("id")).unionByName(
        und.select(F.col("b").alias("id"))
    )
    deg = ends.groupBy("id").agg(F.count("*").alias("deg"))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    org = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
            F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        )
    )
    e1 = org.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = org.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    closing = org.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tri = e1.join(e2, "v").join(closing, ["u", "w"], "left_semi")
    pair = lambda x, y: F.struct(  # noqa: E731
        F.least(x, y).alias("a"), F.greatest(x, y).alias("b")
    )
    return (
        tri.select(
            F.explode(
                F.array(
                    pair(F.col("u"), F.col("v")),
                    pair(F.col("u"), F.col("w")),
                    pair(F.col("v"), F.col("w")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("support"))
    )


def edge_support(edges: DataFrame) -> DataFrame:
    """Triangle support of EVERY canonical undirected simple edge
    (zero-support edges included)."""
    und = _undirected_simple(edges)
    sup = _support(und)
    return und.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def k_truss(edges: DataFrame, k: int, max_rounds: int = 50) -> TrussResult:
    """Maximal subgraph where every edge closes >= k-2 triangles
    within the subgraph, by iterative support peeling. Exact; the
    returned ``edges`` carry the support measured IN the truss."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    t0 = time.time()
    cur = pin_table(_undirected_simple(edges))
    n = cur.count()
    rounds = 0
    result = None
    for _ in range(max_rounds):
        rounds += 1
        sup = _support(cur)
        nxt = pin_table(
            cur.join(sup, ["a", "b"], "left")
            .select(
                "a", "b",
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            )
            .filter(F.col("support") >= F.lit(k - 2))
        )
        n2 = nxt.count()
        if result is not None:
            release_state(result)
        result = nxt
        release_state(cur)
        cur = pin_table(nxt.select("a", "b"))
        if n2 == n:
            break
        n = n2
    release_state(cur)
    out = attach_caches(result.select("a", "b", "support"), [result])
    return TrussResult(
        edges=out,
        rounds=rounds,
        stats={"k": k, "edges": n, "rounds": rounds,
               "compute_s": round(time.time() - t0, 4)},
        _caches=[result],
    )


def edge_support_sql(edges_sql: str) -> str:
    """Oracle: common-neighbor count per edge (equivalent to the
    oriented enumeration — support(a,b) = |N(a) ∩ N(b)|)."""
    return f"""
WITH e0 AS ({edges_sql}),
t0 AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
       FROM e0 WHERE src <> dst),
sym0 AS (SELECT a, b FROM t0 UNION ALL SELECT b, a FROM t0),
sup0 AS (SELECT e.a, e.b, COUNT(*) AS support
         FROM t0 e JOIN sym0 s1 ON s1.a = e.a
         JOIN sym0 s2 ON s2.a = e.b AND s2.b = s1.b
         GROUP BY e.a, e.b)
SELECT e.a, e.b, CAST(COALESCE(sup0.support, 0) AS BIGINT) AS support
FROM t0 e LEFT JOIN sup0 ON sup0.a = e.a AND sup0.b = e.b
"""


def k_truss_sql(edges_sql: str, k: int, n_rounds: int = 6) -> str:
    """Oracle: the peel unrolled ``n_rounds`` times (idempotent past
    the fixpoint, like k_core_sql — extra rounds re-derive the same
    set)."""
    parts = [
        f"WITH e0 AS ({edges_sql})",
        """t0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
        0 AS support FROM e0 WHERE src <> dst)""",
    ]
    for t in range(1, n_rounds + 1):
        p = t - 1
        parts.append(
            f"sym{p} AS MATERIALIZED (SELECT a, b FROM t{p} UNION ALL SELECT b, a FROM t{p})"
        )
        parts.append(
            f"""sup{p} AS MATERIALIZED (SELECT e.a, e.b, COUNT(*) AS support
  FROM t{p} e JOIN sym{p} s1 ON s1.a = e.a
  JOIN sym{p} s2 ON s2.a = e.b AND s2.b = s1.b
  GROUP BY e.a, e.b)"""
        )
        parts.append(
            f"""t{t} AS MATERIALIZED (SELECT e.a, e.b, COALESCE(s.support, 0) AS support
  FROM t{p} e LEFT JOIN sup{p} s ON s.a = e.a AND s.b = e.b
  WHERE COALESCE(s.support, 0) >= {k - 2})"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT a, b, CAST(support AS BIGINT) AS support FROM t{n_rounds}"
    )
