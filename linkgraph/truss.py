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

Scale notes (100TB): the full wedge pass (orientation + wedge join +
aggregation, the triangles.py plan whose degree-ordering bounds wedge
fan-out at O(sqrt m) per pivot) runs ONCE. After that the default
``method="decremental"`` maintains per-edge support as a shuffle
delta: each round enumerates only the DYING triangles (common
neighborhoods of the dropped edges — work proportional to the drop
set's triangle incidences, which shrinks geometrically) and subtracts
them from the survivors. No per-edge mutable state is needed — the
decrement is an ordinary groupBy + left join, and the support
invariant makes every round's drop set identical to a from-scratch
recompute (kept as ``method="recompute"``, the in-engine oracle
twin; the DuckDB twin stays the unrolled from-scratch peel). The
state is a single (a, b, support) table, checkpointed through
SuperstepLoop — resumable like mst/scc.
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


_TRI_EDGES = (("n1", "n2"), ("n1", "n3"), ("n2", "n3"))


def _triangle_table(und: DataFrame) -> DataFrame:
    """(n1, n2, n3) with n1 < n2 < n3, one row per triangle of the
    canonical simple view — the same degree-ordered wedge enumeration
    as ``_support``, materialized as a maintainable table."""
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
    t = F.sort_array(F.array("u", "v", "w"))
    return tri.select(
        t[0].alias("n1"), t[1].alias("n2"), t[2].alias("n3")
    )


def _dead_triangles(tri: DataFrame, drop: DataFrame) -> DataFrame:
    """Triangles of ``tri`` containing at least one ``drop`` edge —
    three pair-keyed semi-joins, dedup by triple (a triangle with two
    dropped edges is found twice but must count once)."""
    dead = None
    for x, y in _TRI_EDGES:
        d = tri.join(
            drop.select(F.col("a").alias(x), F.col("b").alias(y)), [x, y],
            "left_semi",
        )
        dead = d if dead is None else dead.unionByName(d)
    return dead.distinct()


def _dead_decrements(dead: DataFrame) -> DataFrame:
    """(a, b, dec): per canonical edge, how many ``dead`` triangles
    contain it (dropped edges included — the keep-side left join
    ignores them)."""
    return (
        dead.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.col(x).alias("a"), F.col(y).alias("b"))
                        for x, y in _TRI_EDGES
                    ]
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("dec"))
    )


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 50,
    method: str = "decremental",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> TrussResult:
    """Maximal subgraph where every edge closes >= k-2 triangles
    within the subgraph, by iterative support peeling. Exact; the
    returned ``edges`` carry the support measured IN the truss.

    method:
      * ``"decremental"`` (default) — run the wedge enumeration ONCE,
        pin the triangle table (n1 < n2 < n3), and per round: find the
        DYING triangles (three pair-keyed semi-joins against the drop
        set), subtract their counts from the survivors' supports, and
        anti-join them out of the table. No wedge work after round 0;
        every round's cost is hash joins over the monotonically
        shrinking triangle table. The trade is O(#triangles) pinned
        state (LRU-evictable; on a cluster pair with a checkpoint_dir
        so the durable (a, b, support) state bounds replay). The
        support invariant (support = alive triangles whose three edges
        all survive) makes every round's drop set — and therefore the
        fixpoint — identical to the recompute path; the DuckDB twin
        ``k_truss_sql`` (from-scratch unrolled) certifies exactly this.
      * ``"recompute"`` — the original from-scratch per-round support
        recomputation, kept as the in-engine oracle twin (and the
        memory-lean fallback when the triangle table cannot be held).

    resume: with a ``checkpoint_dir``, continue from the last durable
    superstep (state = the (a, b, support) table; same killed-equals-
    uninterrupted contract as mst/scc). The checkpointed k and method
    are validated — peeling at a different threshold from a resumed
    state would silently compute neither truss."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if method not in ("decremental", "recompute"):
        raise ValueError(f"method must be decremental|recompute: got {method}")
    from linkgraph.checkpoint import SuperstepLoop

    spark = edges.sparkSession
    t0 = time.time()
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="ktruss",
        context={"k": k, "method": method},
    )
    start_round = 0
    state = None
    if resume:
        resumed = loop.resume()
        if resumed is not None:
            rec_k = loop.last_context.get("k")
            rec_m = loop.last_context.get("method")
            if (rec_k is not None and int(rec_k) != k) or (
                rec_m is not None and rec_m != method
            ):
                raise ValueError(
                    f"ktruss resume mismatch: checkpoint ran k={rec_k}, "
                    f"method={rec_m}; this call asked k={k}, method={method}. "
                    "Rerun without resume or with the original parameters."
                )
            start_round, st = resumed
            state = pin_table(st)
    tri = None
    if state is None:
        und = _undirected_simple(edges)
        if method == "decremental":
            # one wedge pass: materialize the triangles, derive the
            # initial supports from them (no second enumeration)
            tri = pin_table(_triangle_table(und))
            sup0 = _dead_decrements(tri).withColumnRenamed("dec", "support")
        else:
            sup0 = _support(und)
        state = loop.advance(
            0,
            und.join(sup0, ["a", "b"], "left").select(
                "a", "b",
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            ),
            force_checkpoint=bool(checkpoint_dir),
        )
    elif method == "decremental":
        # resumed mid-peel: the alive triangles are exactly the
        # triangles among the surviving edges — one wedge pass rebuilds
        # the maintained table (bounded replay, same as recompute cost)
        tri = pin_table(_triangle_table(state.select("a", "b")))
    n = state.count()
    rounds = start_round
    for r in range(start_round + 1, max_rounds + 1):
        rounds = r
        drop = state.filter(F.col("support") < F.lit(k - 2)).select("a", "b")
        if method == "decremental":
            keep = state.filter(F.col("support") >= F.lit(k - 2))
            # dead feeds BOTH the decrement and the anti-join shrink —
            # persist across the two eager materializations below
            dead = _dead_triangles(tri, drop).persist()
            dec = _dead_decrements(dead)
            nxt_plan = keep.join(dec, ["a", "b"], "left").select(
                "a", "b",
                (F.col("support") - F.coalesce("dec", F.lit(0)))
                .cast("long").alias("support"),
            )
            tri_next = pin_table(
                tri.join(dead, ["n1", "n2", "n3"], "left_anti")
            )
            release_state(tri)
            tri = tri_next
        else:
            dead = None
            cur = state.filter(F.col("support") >= F.lit(k - 2)).select("a", "b")
            sup = _support(cur)
            nxt_plan = cur.join(sup, ["a", "b"], "left").select(
                "a", "b",
                F.coalesce("support", F.lit(0)).cast("long").alias("support"),
            )
        nxt = loop.advance(r, nxt_plan)
        n2 = nxt.count()
        if dead is not None:
            dead.unpersist()
        release_state(state)
        state = nxt
        if n2 == n:
            break
        n = n2
    if tri is not None:
        release_state(tri)
    loop.close()
    # at the fixpoint every remaining support is >= k-2 and measured
    # in the truss; filter defensively for a max_rounds truncation
    out = attach_caches(
        state.filter(F.col("support") >= F.lit(k - 2))
        .select("a", "b", "support"),
        [state],
    )
    return TrussResult(
        edges=out,
        rounds=rounds,
        stats={"k": k, "edges": n, "rounds": rounds, "method": method,
               "compute_s": round(time.time() - t0, 4)},
        _caches=[state],
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
