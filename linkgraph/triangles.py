"""Triangle count + clustering coefficient — degree-ordered wedge closure.

Re-creates pub:algo/.../impl/TriangleCountBase.java / TriangleStream.java,
proc pub:algo/.../TriangleProc.java (SURVEY.md §2.1): graph treated as
an UNDIRECTED SIMPLE graph; each triangle enumerated exactly once as an
ordered triple; outputs per-node triangle count t_u, global
triangleCount = sum(t_u)/3 = number of distinct triangles, per-node
clustering coefficient c_u = 2*t_u / (deg_u*(deg_u-1)) (0 when deg<2),
averageClusteringCoefficient = mean over ALL nodes, and the triple
stream (algo.triangle.stream analog).

The reference's "for u, for v>u in adj(u), for w>v in adj(u): binary
search exists(v,w)" (sorted AdjacencyMatrix,
pub:core/.../heavyweight/AdjacencyMatrix.java#binarySearch) maps to two
exact plans on DEGREE-ORDERED oriented edges — each undirected edge
{a,b} oriented a->b iff (deg_a, a) < (deg_b, b), a total order, so the
oriented graph is a DAG and every triangle has exactly one source
corner a with a->b, a->w, b->w:

* ``kernel="wedge"`` (default) — the classic MapReduce two-join plan,
  and the measured-fastest path on both sparse and dense graphs:

    wedges   = org e1 JOIN org e2 ON e1.dst = e2.src
    triangles= wedges LEFT SEMI JOIN org e3 ON (u=e3.src AND w=e3.dst)

  The closing check is a hashed existence probe (broadcast or
  shuffle-hash, never a sort of the wedge stream); hub_cap reorders
  mega-hub pivots through an edge-iterator plan.

* ``kernel="intersect"`` — the direct analog of the reference's
  sorted-adjacency intersection: out-adjacency arrays N+(x) grouped by
  the oriented source (no shuffle: the oriented cache is already
  partitioned by it), then per edge (a,b) count |N+(a) ∩ N+(b)| via a
  JVM-side array_intersect. ONE algorithmic shuffle, ~40% fewer bytes
  than the wedge stream (166 vs 273 MB on the 4.2M-edge scaling
  graph), and the orientation theorem bounds every array at sqrt(2m)
  elements (outdeg k implies k out-neighbors of degree >= k, so
  2m >= k^2) — no hub path needed. MEASURED SLOWER anyway: equal CPU
  on the sparse scaling graph and 1.6x slower on the dense sf0.1
  co-supplier graph (33.5s vs 53.3s, 124M triangles, same session) —
  Catalyst's array_intersect rebuilds a boxed hash set per row, which
  loses to the codegen'd semi-join probe even though it moves fewer
  bytes. Retained as a cross-checked second execution path (the
  tests assert exact equality of counts, coefficients and triples).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TriangleResult:
    counts: DataFrame  # (id, triangles, degree, coefficient)
    triangles: DataFrame  # triple stream (node_a, node_b, node_c), a<b<c
    triangle_count: int
    avg_coefficient: float
    node_count: int
    stats: dict = field(default_factory=dict)
    _caches: list = field(default_factory=list, repr=False)

    def release(self) -> None:
        """Unpersist the cached oriented-edge table kept live for the
        lazy ``triangles`` stream, and the persisted per-node ``counts``.
        Call when done consuming; afterwards the lazy frames still work
        but recompute from the source edges."""
        for c in self._caches:
            try:
                c.unpersist()
            except Exception:
                pass
        self._caches = []


def _undirected_simple(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edge set: (a < b), no self-loops, dedup."""
    return (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def oriented_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Return (org, deg, n_oriented): degree-ordered oriented edges
    (partitioned by lo, PERSISTED AND MATERIALIZED) + true degrees
    (persisted). Materializing here lets the upstream edge derivation
    (often an expensive multi-join) run exactly once: deg is computed
    through the cached undirected set, org through both caches, and
    the undirected cache is dropped before returning."""
    und = _undirected_simple(edges).persist()
    sym = und.select(F.col("a").alias("id")).union(und.select(F.col("b").alias("id")))
    deg = sym.groupBy("id").agg(F.count("*").alias("deg")).persist()
    deg.count()  # materializes und's cache as a side effect
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    org = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("a"),
            ).otherwise(F.col("b")).alias("lo"),
            F.when(
                (F.col("deg_a") < F.col("deg_b"))
                | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
                F.col("b"),
            ).otherwise(F.col("a")).alias("hi"),
        )
        .repartition("lo")
        .persist()
    )
    n_oriented = org.count()
    und.unpersist()
    return org, deg, n_oriented


def triangle_count(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    direction: str = "BOTH",
    hub_cap: int | str | None = None,
    closing_strategy: str = "auto",
    closing_broadcast_max: int = 500_000,
    kernel: str = "auto",
) -> TriangleResult:
    """Exact triangle counting over an edge table (any orientation).

    nodes: optional DataFrame(id) fixing the universe (isolated nodes
    report triangles=0, coefficient=0 and count toward the average
    coefficient, matching the reference).
    direction: signature parity with GraphLoader withDirection — the
    graph is canonicalized undirected regardless (the reference loads
    Direction.BOTH for triangle procs), so all values are equivalent;
    accepted for API parity.
    hub_cap: when set, wedges whose PIVOT has degree > hub_cap are
    counted through a reordered plan (edge-iterator: join the closing
    edge against the hub's in/out edge lists) instead of the pivot
    wedge join — the wedge join's fan-out at a pivot is
    indeg*outdeg, quadratic at a mega-hub, while the reordered plan is
    bounded by m * (hub out-neighbors per closing edge). Exact either
    way (cross-path equality tested); default off. ``"auto"`` probes
    the cached degree table (one aggregate) and engages the hub path
    at cap = 4*sqrt(m) only when the max degree exceeds it — the same
    measured-skew contract as pagerank's ``hot_key_salt="auto"``.
    kernel: ``"wedge"`` (the two-join wedge plan — the default:
    measured fastest on sparse AND dense graphs), ``"intersect"``
    (adjacency-array intersection — one shuffle, fewer bytes, but
    per-row array_intersect hash-set builds measured 1.6x slower on
    dense graphs; see module docstring), or ``"auto"`` = wedge. Both
    kernels are exact and cross-checked equal in tests.
    closing_strategy: WEDGE KERNEL ONLY — how the closing-edge
    existence check runs.
    ``"broadcast"`` hashes the m-row closing table once and ships it to
    every task, so the (up to sum deg^2/2)-row wedge stream is probed
    IN the wedge-join stage and never shuffled at all.
    ``"shuffle_hash"`` hash-partitions both sides on (u,w) — the scale
    default. ``"auto"`` picks broadcast iff the measured oriented-edge
    count <= closing_broadcast_max, else shuffle_hash. The default cap
    is ~500k rows (~8MB of long pairs, Spark's own
    autoBroadcastJoinThreshold philosophy), NOT "whatever fits in
    memory": the broadcast build is SERIAL (driver collects m rows,
    builds one hash relation, ships it), a constant cost that Amdahl-
    caps scaling — measured on the 4.2M-edge scaling graph: broadcast
    8.3s@2cores/4.5s@8cores (1.85x for 4x cores) vs shuffle_hash
    10.2s/3.1s (3.28x). Broadcast only pays when the closing table is
    small enough that its build time is noise.
    """
    if direction.upper() not in ("BOTH", "OUTGOING", "INCOMING"):
        raise ValueError(f"bad direction {direction}")
    if kernel not in ("auto", "intersect", "wedge"):
        raise ValueError(f"bad kernel {kernel}")
    t0 = time.time()
    org, deg, n_oriented = oriented_edges(edges)
    t_orient = time.time() - t0
    if kernel == "auto":
        kernel = "wedge"
    if kernel == "intersect":
        # the sqrt(2m) array bound makes a hub path unnecessary here
        hub_cap = None
    elif hub_cap == "auto":
        # skew probe over the PERSISTED degree table: degree-ordering
        # already bounds the wedge fan-out by O(sqrt(m)) per pivot on
        # most graphs, so the hub path only pays off past that regime
        cap = 4 * int(max(1, n_oriented) ** 0.5)
        mx = deg.agg(F.max("deg").alias("m")).first()["m"] or 0
        hub_cap = cap if mx > cap else None

    if kernel == "intersect":
        # Out-adjacency arrays grouped by the oriented SOURCE: org is
        # cached partitioned by lo, so the aggregate needs no exchange.
        # lhs re-expands the arrays to one row per edge (a, b, N+(a))
        # in the same stage; the single algorithmic shuffle re-keys
        # those rows on b, where the build side (b -> N+(b)) reuses the
        # cache partitioning (shuffle_hash: never sort the edge
        # stream). The closing check is the in-task array intersection
        # — the reference's adjacency binary search, vectorized.
        adj = org.groupBy("lo").agg(F.collect_list("hi").alias("nbrs"))
        lhs = adj.select(
            F.col("lo").alias("a"),
            F.explode("nbrs").alias("b"),
            F.col("nbrs").alias("nbrs_a"),
        )
        rhs = adj.select(F.col("lo").alias("b"), F.col("nbrs").alias("nbrs_b"))
        closed = (
            lhs.join(rhs.hint("shuffle_hash"), "b")
            .select("a", "b", F.array_intersect("nbrs_a", "nbrs_b").alias("inter"))
            .filter(F.size("inter") > 0)
        )
        # one streaming pass emits every corner contribution of every
        # edge row — a and b each close size(inter) triangles, each
        # w in the intersection closes one — into a map-side-combined
        # per-node sum. The triple set itself is never materialized.
        cnt = F.size("inter")
        contrib = closed.select(
            F.explode(
                F.concat(
                    F.array(
                        F.struct(F.col("a").alias("id"), cnt.alias("c")),
                        F.struct(F.col("b").alias("id"), cnt.alias("c")),
                    ),
                    F.transform(
                        "inter",
                        lambda w: F.struct(w.alias("id"), F.lit(1).alias("c")),
                    ),
                )
            ).alias("x")
        ).select("x.id", "x.c")
        per_node = contrib.groupBy("id").agg(
            F.sum("c").cast("long").alias("triangles")
        )
        tri = closed.select(
            F.col("a").alias("u"), F.col("b").alias("v"), F.explode("inter").alias("w")
        )
    else:
        e1 = org.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        e2 = org.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
        # The closing-edge existence check never sorts the wedge stream
        # (a sort-merge semi would sort up to sum deg^2/2 rows): hash
        # the m-row closing side instead — broadcast when m fits (the
        # wedge stream is then probed inside the wedge-join stage and
        # never shuffled), shuffle-hash otherwise (still sort-free,
        # which also removes the lo-vs-hi spill asymmetry measured as
        # a scaling-efficiency cliff on the bench's Pareto graph). The
        # reference's exists(v,w) binary search maps to exactly this
        # hashed existence probe.
        if closing_strategy not in ("auto", "broadcast", "shuffle_hash"):
            raise ValueError(f"bad closing_strategy {closing_strategy}")
        if closing_strategy == "auto":
            closing_strategy = (
                "broadcast" if n_oriented <= closing_broadcast_max else "shuffle_hash"
            )
        closing = org.select(F.col("lo").alias("u"), F.col("hi").alias("w")).hint(
            closing_strategy
        )
        if hub_cap is None:
            wedges = e1.join(e2, "v")
            tri = wedges.join(closing, ["u", "w"], "left_semi")
        else:
            hubs = deg.filter(F.col("deg") > hub_cap).select(F.col("id").alias("v"))
            # low-pivot wedges: standard wedge join, fan-out bounded by cap
            e1_low = e1.join(hubs, "v", "left_anti")
            tri_low = e1_low.join(e2, "v").join(closing, ["u", "w"], "left_semi")
            # hub-pivot triangles: iterate CLOSING edges (u,w) and find
            # hub pivots adjacent to both — never materializes the
            # hub's quadratic wedge fan-out
            e1_hub = e1.join(hubs, "v", "left_semi")
            e2_hub = e2.join(hubs, "v", "left_semi")
            tri_hub = (
                closing.join(e1_hub, "u")
                .join(e2_hub, ["v", "w"], "left_semi")
                .select("u", "v", "w")
            )
            tri = tri_low.select("u", "v", "w").union(tri_hub)
        # per-node counts from ONE streaming pass over the wedge join
        # (explode to corners, map-side-combined count) — the triple
        # table is never cached (124M triangles at bench sf0.1 cost
        # more to cache than to recompute)
        per_node = (
            tri.select(F.explode(F.array("u", "v", "w")).alias("id"))
            .groupBy("id")
            .agg(F.count("*").alias("triangles"))
        )

    # The whole counting phase is ONE Spark action (persist + combined
    # aggregate): per_node is consumed exactly once by counts, and
    # n_tri/node_count/avg_c all come from the same aggregate — extra
    # driver round-trips are pure serial (Amdahl) tail that measurably
    # caps scaling on the N-vs-4N bench (small-data scheduling cost is
    # identical at both core counts)
    base = deg if nodes is None else nodes.select("id").join(deg, "id", "left")
    counts = (
        base.join(per_node, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        )
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
        )
        .persist()
    )
    agg = counts.agg(
        F.count("*").alias("n"),
        F.avg("coefficient").alias("avg_c"),
        F.sum("triangles").alias("t3"),
    ).first()
    node_count, avg_c = agg["n"], float(agg["avg_c"] or 0.0)
    n_tri = int((agg["t3"] or 0) // 3)

    # triple stream ordered by node id within each triple (FIXTURES.md
    # §4a). LAZY: consuming it re-runs the wedge join off the cached
    # oriented edges — callers that only need counts never pay for the
    # triple table, callers that stream it pay exactly one more pass
    arr = F.array_sort(F.array("u", "v", "w"))
    triples = tri.select(
        arr[0].alias("node_a"), arr[1].alias("node_b"), arr[2].alias("node_c")
    )
    stats = {
        "nodeCount": node_count,
        "triangleCount": n_tri,
        "averageClusteringCoefficient": avg_c,
        "orientedEdges": n_oriented,
        "kernel": kernel,
        # orient_s = load analog (canonicalize+degree+orient, one-off);
        # the wedge join + counting phase is compute_s - orient_s
        "orient_s": round(t_orient, 4),
        "compute_s": round(time.time() - t0, 4),
    }
    deg.unpersist()
    return TriangleResult(
        counts=counts,
        triangles=triples,
        triangle_count=n_tri,
        avg_coefficient=avg_c,
        node_count=node_count,
        stats=stats,
        _caches=[org, counts],
    )


def balanced_triads(edges: DataFrame, threshold: float = 0.0) -> DataFrame:
    """algo.balancedTriads analog (pub:algo/.../BalancedTriadsProc.java
    + impl/BalancedTriads.java; structural-balance triangle census):
    per node, how many of its triangles are BALANCED (product of the
    three edge signs positive: +++ or +--) vs UNBALANCED (negative).

    Edge sign: the canonical undirected edge's summed weight is
    compared against ``threshold`` — >= threshold is a positive
    (friend) tie, below it a negative (enemy) tie. The reference reads
    the sign of the relationship weight property; ``threshold``
    generalizes that to unsigned weight domains.

    Returns (id, balanced, unbalanced) for every node of the signed
    graph (triangle-free nodes report 0/0).

    Scale shape: the triple enumeration is the degree-ordered wedge
    plan of `triangle_count` (same orientation bound); signs arrive
    through three (pair)-keyed joins against the |E|-sized signed edge
    table — each join key is a unique edge, so fan-out is 1 and all
    three are broadcast-able under AQE on small sign tables,
    sort-merge co-keyed otherwise. Counting is one corner explode into
    a map-side-combined per-node aggregate (integer counts — exact).
    """
    w = F.coalesce(F.col("weight"), F.lit(1.0)) if "weight" in edges.columns else F.lit(1.0)
    se = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            w.alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
        .select(
            "a",
            "b",
            F.when(F.col("w") >= threshold, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
        )
    )
    org, deg, n_oriented = oriented_edges(edges)
    e1 = org.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    e2 = org.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    closing = org.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    tri = e1.join(e2, "v").join(closing, ["u", "w"], "left_semi")
    # id-sorted corners (x < y < z): the middle one falls out of the
    # exact integer identity y = u+v+w-x-z (ids are longs)
    x = F.least("u", "v", "w")
    z = F.greatest("u", "v", "w")
    tri = tri.select(
        x.alias("x"), (F.col("u") + F.col("v") + F.col("w") - x - z).alias("y"), z.alias("z")
    )
    signed = (
        tri.join(
            se.select(F.col("a").alias("x"), F.col("b").alias("y"), F.col("s").alias("s1")),
            ["x", "y"],
        )
        .join(
            se.select(F.col("a").alias("x"), F.col("b").alias("z"), F.col("s").alias("s2")),
            ["x", "z"],
        )
        .join(
            se.select(F.col("a").alias("y"), F.col("b").alias("z"), F.col("s").alias("s3")),
            ["y", "z"],
        )
        .select(
            "x", "y", "z",
            (F.col("s1") * F.col("s2") * F.col("s3")).alias("prod"),
        )
    )
    corners = signed.select(
        F.explode(F.array("x", "y", "z")).alias("id"), "prod"
    )
    cnt = corners.groupBy("id").agg(
        F.sum(F.when(F.col("prod") > 0, 1).otherwise(0)).alias("balanced"),
        F.sum(F.when(F.col("prod") < 0, 1).otherwise(0)).alias("unbalanced"),
    )
    out = deg.select("id").join(cnt, "id", "left").select(
        "id",
        F.coalesce(F.col("balanced"), F.lit(0)).cast("long").alias("balanced"),
        F.coalesce(F.col("unbalanced"), F.lit(0)).cast("long").alias("unbalanced"),
    )
    from linkgraph.checkpoint import attach_caches

    return attach_caches(out, [org, deg])


def approx_triangle_count(edges: DataFrame, p: float = 0.5, seed: int = 0) -> DataFrame:
    """Doulion sampled triangle counting (Tsourakakis et al. KDD'09 —
    public result): keep each canonical undirected edge with
    deterministic hash probability ``p``, count triangles exactly on
    the sparsified graph, scale by 1/p³ (each triangle survives with
    probability p³ under independent edge coins; hash coins on
    distinct edge keys are the engine's standard stand-in).

    This is the 100TB scale path next to the exact counter: the exact
    wedge join costs Σ d(v)² while the sampled one costs p²·Σ d(v)² —
    p = 0.1 is a 100× wedge reduction with relative error
    O(1/√(p³·T)). Sampling is the shuffle-free hash-threshold filter
    (`graphs.sample_edges` contract) on the canonical (a, b) key, so
    both directions of an edge live or die together and the run is
    partition- and engine-independent.

    Returns ONE row (sampled_edges, sampled_triangles, est_triangles)
    with est = sampled/p³ rounded 6; replayed exactly by
    ``approx_triangle_sql``.
    """
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from linkgraph.pipeline.hashing import stable_hash64

    t = int(p * 1_000_000)
    und = _undirected_simple(edges)
    kept = und.filter(
        F.pmod(
            stable_hash64(F.concat_ws("|", F.col("a"), F.col("b")),
                          salt=f"doulion-{seed}"),
            F.lit(1_000_000),
        ) < t
    )
    # canonical orientation (a < b) is already the oriented form:
    # wedge join x<y<z counts each triangle exactly once
    e1 = kept.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = kept.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = kept.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    scale3 = t ** 3
    return kept.agg(F.count("*").alias("sampled_edges")).crossJoin(
        tri.agg(F.count("*").alias("sampled_triangles"))
    ).select(
        "sampled_edges",
        "sampled_triangles",
        F.round(
            F.col("sampled_triangles").cast("double") * F.lit(1e18) / F.lit(scale3),
            6,
        ).alias("est_triangles"),
    )


def approx_triangle_sql(edges_sql: str, p: float = 0.5, seed: int = 0) -> str:
    """Oracle: the same hash coins, sampled wedge join and 1/p³ scale
    in DuckDB SQL."""
    if not 0.0 < p <= 1.0:
        raise ValueError(f"p must be in (0, 1], got {p}")
    from linkgraph.pipeline.hashing import stable_hash64_sql

    t = int(p * 1_000_000)
    h = stable_hash64_sql(
        "CAST(a AS VARCHAR) || '|' || CAST(b AS VARCHAR)",
        salt=f"doulion-{seed}",
    )
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst),
kept AS (SELECT a, b FROM und WHERE {h} % 1000000 < {t}),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM kept e1 JOIN kept e2 ON e2.a = e1.b
        JOIN kept e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT (SELECT COUNT(*) FROM kept) AS sampled_edges,
       (SELECT COUNT(*) FROM tri) AS sampled_triangles,
       ROUND(CAST((SELECT COUNT(*) FROM tri) AS DOUBLE) * 1e18 / {t ** 3},
             6) AS est_triangles
"""
