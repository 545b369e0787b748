"""Edge-table builders over the driver's TPC-H-ish parquet tables.

These make the graph procedures SQL-oracle-checkable (FIXTURES.md §5):
DuckDB runs the equivalent ANSI SQL on the same parquet files and the
driver compares row counts / schemas / value hashes.

Two graphs:
  * purchase graph   — directed customer -> supplier, from
                       orders JOIN lineitem; disjoint id spaces
                       (suppliers offset by 1_000_000).
  * co-supplier graph— undirected supplier -- supplier, edge when two
                       suppliers co-occur in the same order; weight =
                       number of distinct co-occurrence orders
                       (a power-law-ish co-occurrence graph, the same
                       shape as the repo-level import co-occurrence
                       edges of the north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SUPPLIER_OFFSET = 1_000_000


def purchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.lit(SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )


PURCHASE_EDGES_SQL = """
SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst, CAST(1.0 AS DOUBLE) AS weight
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
"""


def cosupplier_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    a = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s1"))
    b = l.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("s2"))
    return (
        a.join(b, "ok")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy(F.col("s1").alias("src"), F.col("s2").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
    )


COSUPPLIER_EDGES_SQL = """
SELECT a.l_suppkey AS src, b.l_suppkey AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY a.l_suppkey, b.l_suppkey
"""


def degree_histogram(edges: DataFrame, direction: str = "OUTGOING") -> DataFrame:
    """(degree, n_nodes) — the degree distribution of the edge table.

    The skew probe SURVEY.md §7 calls for: run it before choosing
    hot-key salting / hub caps (a power-law tail in this table is the
    signal that the 1000-executor plan needs the skew paths). Two
    aggregations, both map-side combinable; no joins.
    """
    d = direction.upper()
    if d == "OUTGOING":
        ends = edges.select(F.col("src").alias("id"))
    elif d == "INCOMING":
        ends = edges.select(F.col("dst").alias("id"))
    elif d == "BOTH":
        ends = edges.select(F.col("src").alias("id")).union(
            edges.select(F.col("dst").alias("id"))
        )
    else:
        raise ValueError(f"bad direction {direction}")
    deg = ends.groupBy("id").agg(F.count("*").alias("degree"))
    return deg.groupBy("degree").agg(F.count("*").alias("n_nodes"))


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree-correlation (assortativity) coefficient of the
    undirected graph (Newman 2002, Phys. Rev. Lett. 89:208701 — the
    simplified degree-Pearson form): Pearson correlation of
    (deg(u), deg(v)) over all oriented edge endpoints.

    One row: (n_endpoints, assortativity rounded 6). EXACT
    cross-engine: every moment (Σx, Σxy, Σx²) is an INTEGER sum of
    degree products — order-free — and only the final Pearson ratio
    touches floating point, so the oracle needs no tolerance. The
    symmetric marginals mean r = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²).

    Scale: degree table (one partial-agg shuffle) joined back to the
    symmetrized edges on each endpoint (hash joins on the node key),
    then a single global aggregate (map-side combinable). Integer
    moments fit int64 up to Σdeg² ≈ 9e18 — beyond that, pre-scale
    degrees or switch the moment columns to decimal(38,0).
    """
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    deg = sym.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    paired = (
        sym.join(deg.select(F.col("id").alias("src"), F.col("deg").alias("dx")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dy")), "dst")
    )
    m = paired.agg(
        F.count("*").alias("n"),
        F.sum("dx").alias("sx"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return m.select(
        F.col("n").alias("n_endpoints"),
        F.round(
            F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("assortativity"),
    )


DEGREE_ASSORTATIVITY_SQL_TEMPLATE = """
WITH eraw AS ({edges}),
sym AS (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM eraw UNION ALL SELECT dst AS src, src AS dst FROM eraw)),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM sym GROUP BY src),
paired AS (SELECT dx.deg AS dx, dy.deg AS dy
           FROM sym JOIN deg dx ON sym.src = dx.id
                    JOIN deg dy ON sym.dst = dy.id),
m AS (SELECT COUNT(*) AS n,
             CAST(SUM(dx) AS BIGINT) AS sx,
             CAST(SUM(dx * dy) AS BIGINT) AS sxy,
             CAST(SUM(dx * dx) AS BIGINT) AS sxx
      FROM paired)
SELECT n AS n_endpoints,
       ROUND(CASE WHEN n * sxx - sx * sx > 0
                  THEN CAST(n * sxy - sx * sx AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE)
                  ELSE 0.0 END, 6) AS assortativity
FROM m
"""


def sample_edges(edges: DataFrame, fraction: float, seed: int = 0) -> DataFrame:
    """Deterministic edge sampling: keep an edge iff its stable hash
    falls under the rate threshold. Shuffle-free, partition- and
    run-independent (unlike df.sample), identical on every engine —
    the same contract as `pipeline/curate.py#stratified_sample`.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    from linkgraph.pipeline.hashing import stable_hash64

    h = stable_hash64(
        F.concat_ws("|", F.col("src"), F.col("dst")), salt=seed
    )
    return edges.filter((h % 1000000) < int(fraction * 1000000))


def induced_subgraph(edges: DataFrame, node_fraction: float, seed: int = 0) -> DataFrame:
    """Node-induced subgraph sampling: hash-sample the NODE set, keep
    edges whose BOTH endpoints survive. The membership test is an
    inline hash predicate on each endpoint — a pure map filter with
    NO join and no node-table materialization, so it composes with
    predicate pushdown at any scale. Expected edge retention is
    node_fraction² on random graphs.
    """
    if not 0.0 <= node_fraction <= 1.0:
        raise ValueError(f"node_fraction must be in [0, 1], got {node_fraction}")
    from linkgraph.pipeline.hashing import stable_hash64

    t = int(node_fraction * 1000000)
    hs = stable_hash64(F.col("src").cast("string"), salt=seed) % 1000000
    hd = stable_hash64(F.col("dst").cast("string"), salt=seed) % 1000000
    return edges.filter((hs < t) & (hd < t))


def sample_edges_sql(edges: str, fraction: float, seed: int = 0) -> str:
    from linkgraph.pipeline.hashing import stable_hash64_sql

    h = stable_hash64_sql("concat_ws('|', src, dst)", salt=seed)
    return (
        f"SELECT * FROM ({edges}) WHERE ({h}) % 1000000 "
        f"< {int(fraction * 1000000)}"
    )


def induced_subgraph_sql(edges: str, node_fraction: float, seed: int = 0) -> str:
    from linkgraph.pipeline.hashing import stable_hash64_sql

    t = int(node_fraction * 1000000)
    hs = stable_hash64_sql("CAST(src AS VARCHAR)", salt=seed)
    hd = stable_hash64_sql("CAST(dst AS VARCHAR)", salt=seed)
    return (
        f"SELECT * FROM ({edges}) WHERE ({hs}) % 1000000 < {t} "
        f"AND ({hd}) % 1000000 < {t}"
    )


def degree_centrality(
    edges: DataFrame, direction: str = "OUTGOING", weighted: bool = False
) -> DataFrame:
    """algo.degree analog (pub:algo/.../DegreeCentralityProc.java,
    SURVEY.md §2.2 centrality family): per-node relationship count
    along ``direction`` (BOTH = in + out, parallel edges counted —
    the reference iterates relationships, not neighbor sets), plus
    the weightProperty contract when ``weighted``.

    Returns (id, degree) or (id, degree, weighted_degree) for EVERY
    node of the edge table (0 for nodes with no incidence in the
    chosen direction). The weighted sum runs in the 6-decimal
    fixed-point integer domain (exact, order-independent — the
    `weighted_node_similarity` contract), divided back once at the
    end. One map-side-combinable aggregate; no joins beyond the
    |V|-row universe left join.
    """
    d = direction.upper()
    if d not in ("OUTGOING", "INCOMING", "BOTH"):
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction}")
    wcol = (
        F.coalesce(F.col("weight"), F.lit(1.0))
        if "weight" in edges.columns
        else F.lit(1.0)
    )
    w6 = F.round(wcol * 1_000_000, 0).cast("long")
    inc_out = edges.select(F.col("src").alias("id"), w6.alias("w6"))
    inc_in = edges.select(F.col("dst").alias("id"), w6.alias("w6"))
    if d == "OUTGOING":
        inc = inc_out
    elif d == "INCOMING":
        inc = inc_in
    else:
        inc = inc_out.unionByName(inc_in)
    aggs = [F.count("*").alias("degree")]
    if weighted:
        # only pay the fixed-point sum when the column is emitted
        aggs.append(F.sum("w6").alias("w6"))
    agg = inc.groupBy("id").agg(*aggs)
    universe = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    cols = [
        "id",
        F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
    ]
    if weighted:
        cols.append(
            F.round(
                F.coalesce(F.col("w6"), F.lit(0)).cast("double") / 1_000_000.0, 6
            ).alias("weighted_degree")
        )
    return universe.join(agg, "id", "left").select(*cols)


def degree_centrality_sql(
    edge_sql: str, direction: str = "OUTGOING", weighted: bool = False
) -> str:
    """DuckDB twin of `degree_centrality` (value-exact)."""
    d = direction.upper()
    if d not in ("OUTGOING", "INCOMING", "BOTH"):
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction}")
    w6 = (
        "CAST(ROUND(COALESCE(weight, 1.0) * 1000000) AS BIGINT)"
        if weighted
        else "CAST(1000000 AS BIGINT)"
    )
    sel = {
        "OUTGOING": f"SELECT src AS id, {w6} AS w6 FROM e",
        "INCOMING": f"SELECT dst AS id, {w6} AS w6 FROM e",
        "BOTH": (f"SELECT src AS id, {w6} AS w6 FROM e "
                 f"UNION ALL SELECT dst AS id, {w6} AS w6 FROM e"),
    }[d]
    cols = "id, degree" + (", weighted_degree" if weighted else "")
    return f"""
WITH e AS ({edge_sql}),
inc AS ({sel}),
agg AS (SELECT id, COUNT(*) AS degree, SUM(w6) AS w6 FROM inc GROUP BY id),
universe AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e))
SELECT {cols} FROM (
  SELECT u.id,
         CAST(COALESCE(a.degree, 0) AS BIGINT) AS degree,
         ROUND(CAST(COALESCE(a.w6, 0) AS DOUBLE) / 1000000.0, 6) AS weighted_degree
  FROM universe u LEFT JOIN agg a ON a.id = u.id)
"""


def rich_club_coefficients(edges: DataFrame) -> DataFrame:
    """Rich-club coefficient phi(k) for every degree threshold k
    (Zhou & Mondragon 2004, IEEE Comm. Lett. 8:180 — do high-degree
    nodes preferentially attach to each other?):

        phi(k) = 2 * E_k / (N_k * (N_k - 1))

    with N_k = #nodes of degree > k and E_k = #undirected edges whose
    BOTH endpoints have degree > k. The canonical hub-structure probe
    over the co-occurrence graph (the north star's import graph): a
    rising phi(k) tail = the hubs form a club, which is exactly when
    the engine's hub_cap/hot_key_salt paths matter.

    Returns (k, n_nodes, n_edges, phi) for k = 0 .. max_degree - 1.
    EXACT cross-engine: every count is an integer suffix sum (an edge
    with m = min(deg_u, deg_v) is in E_k for all k < m, so E_k =
    |E| - cumsum(edges_by_m, m <= k)); only the final phi ratio
    touches floating point, identically associated on both engines.

    Scale shape: degree aggregate, two small grouped histograms
    (|distinct degrees| rows), one window over the k-grid whose size
    is max_degree — bounded by the largest hub, NOT |V| or |E|. The
    only |E|-sized shuffles are the canonical-edge distinct and the
    two degree joins (hash joins on node id).
    """
    from pyspark.sql import Window

    e = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    em = (
        e.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
        .select(F.least("da", "db").alias("m"))
    )
    nodes_by_deg = deg.groupBy("deg").agg(F.count("*").alias("nc"))
    edges_by_m = em.groupBy("m").agg(F.count("*").alias("ec"))
    totals = deg.agg(
        F.count("*").alias("n_total"), F.max("deg").alias("maxd")
    ).crossJoin(F.broadcast(em.agg(F.count("*").alias("m_total"))))
    grid = totals.select(
        "n_total",
        "m_total",
        F.explode(F.sequence(F.lit(0), F.col("maxd") - 1)).alias("k"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    joined = (
        grid.join(
            F.broadcast(nodes_by_deg.select(F.col("deg").alias("k"), "nc")), "k", "left"
        )
        .join(F.broadcast(edges_by_m.select(F.col("m").alias("k"), "ec")), "k", "left")
        .select(
            "k",
            (
                F.col("n_total")
                - F.sum(F.coalesce(F.col("nc"), F.lit(0))).over(w)
            ).alias("n_nodes"),
            (
                F.col("m_total")
                - F.sum(F.coalesce(F.col("ec"), F.lit(0))).over(w)
            ).alias("n_edges"),
        )
    )
    return joined.select(
        "k",
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.round(
            F.when(
                F.col("n_nodes") > 1,
                (F.lit(2.0) * F.col("n_edges"))
                / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1))).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("phi"),
    )


RICH_CLUB_SQL_TEMPLATE = """
WITH eraw AS ({edges}),
e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
      FROM eraw WHERE src != dst),
deg AS (SELECT id, COUNT(*) AS deg FROM
        (SELECT a AS id FROM e UNION ALL SELECT b FROM e) GROUP BY id),
em AS (SELECT LEAST(da.deg, db.deg) AS m FROM e
       JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
nodes_by_deg AS (SELECT deg, COUNT(*) AS nc FROM deg GROUP BY deg),
edges_by_m AS (SELECT m, COUNT(*) AS ec FROM em GROUP BY m),
totals AS (SELECT (SELECT COUNT(*) FROM deg) AS n_total,
                  (SELECT MAX(deg) FROM deg) AS maxd,
                  (SELECT COUNT(*) FROM em) AS m_total),
grid AS (SELECT t.n_total, t.m_total,
                UNNEST(generate_series(0, t.maxd - 1)) AS k
         FROM totals t),
cum AS (SELECT k,
        n_total - SUM(COALESCE(nd.nc, 0)) OVER
          (ORDER BY k ROWS UNBOUNDED PRECEDING) AS n_nodes,
        m_total - SUM(COALESCE(eb.ec, 0)) OVER
          (ORDER BY k ROWS UNBOUNDED PRECEDING) AS n_edges
        FROM grid LEFT JOIN nodes_by_deg nd ON nd.deg = grid.k
                  LEFT JOIN edges_by_m eb ON eb.m = grid.k)
SELECT k, CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       ROUND(CASE WHEN n_nodes > 1
             THEN (2.0 * n_edges) / CAST(n_nodes * (n_nodes - 1) AS DOUBLE)
             ELSE 0.0 END, 6) AS phi
FROM cum
"""


def reciprocity(edges: DataFrame) -> DataFrame:
    """Directed-graph reciprocity (Newman et al. 2002): the fraction
    of directed edges whose reverse edge also exists. Self-loops are
    excluded; parallel edges collapse (the statistic is over the
    distinct directed edge set, the networkx `reciprocity` contract).

    Returns ONE row (n_edges, n_reciprocal, reciprocity). EXACT:
    both counts are integers (a canonical (least, greatest) groupBy
    counts each unordered pair's orientation multiplicity — exactly
    2 means mutual, contributing 2 reciprocal directed edges), and
    only the final ratio is floating point.

    Scale shape: one distinct + one groupBy on the canonical pair key
    (both |E|-shuffles, map-side combinable), then a single global
    aggregate — no joins at all.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    pairs = e.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.count("*").alias("cnt"))
    return pairs.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_edges"),
        F.coalesce(
            F.sum(F.when(F.col("cnt") == 2, F.lit(2)).otherwise(F.lit(0))), F.lit(0)
        )
        .cast("long")
        .alias("n_reciprocal"),
    ).select(
        "n_edges",
        "n_reciprocal",
        F.round(
            F.when(
                F.col("n_edges") > 0,
                F.col("n_reciprocal").cast("double")
                / F.col("n_edges").cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("reciprocity"),
    )


RECIPROCITY_SQL_TEMPLATE = """
WITH eraw AS ({edges}),
e AS (SELECT DISTINCT src, dst FROM eraw WHERE src != dst),
pairs AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, COUNT(*) AS cnt
          FROM e GROUP BY 1, 2)
SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS n_edges,
       CAST(COALESCE(SUM(CASE WHEN cnt = 2 THEN 2 ELSE 0 END), 0) AS BIGINT)
         AS n_reciprocal,
       ROUND(CASE WHEN SUM(cnt) > 0
             THEN CAST(SUM(CASE WHEN cnt = 2 THEN 2 ELSE 0 END) AS DOUBLE)
                  / CAST(SUM(cnt) AS DOUBLE)
             ELSE 0.0 END, 6) AS reciprocity
FROM pairs
"""


def graphlet_counts(edges: DataFrame) -> DataFrame:
    """Global 3/4-node graphlet counts over the undirected simple
    view: one row (n_wedges, n_triangles, n_4cycles, n_4cliques).
    Subgraph (not induced) counts — a chorded 4-cycle still counts.

    Exactness: every count is a BIGINT aggregate —
      wedges    = Σ_w d_w(d_w−1)/2,
      triangles = id-oriented a<b<c two-hop join,
      4-cycles  = Σ_{x<y} C(codeg(x,y), 2) / 2 (each C4 has exactly
                  two opposite pairs, so the sum is even and the
                  integer halving exact),
      4-cliques = oriented triangles extended by a fourth node d>c
                  adjacent to all three (each K4 counted once at its
                  sorted orientation).
    The DuckDB twin replays the identical joins.

    Scale notes (100TB): wedges/codeg cost Σd² (the triangle-count
    class — pair with hub_cap-style capping on power-law graphs);
    the K4 join's cost is its OUTPUT size, which on dense graphs
    grows as n⁴/24 — this is an honest enumeration, gate it on a
    degree-histogram probe before running at scale. Σ C(λ,2) stays
    in int64 to ~3e9 wedge pairs per endpoint pair; cast the λ
    moments to decimal(38,0) beyond.
    """
    from linkgraph.triangles import _undirected_simple

    und = _undirected_simple(edges)  # (a, b), a < b
    sym = und.select(F.col("a").alias("w"), F.col("b").alias("x")).unionByName(
        und.select(F.col("b").alias("w"), F.col("a").alias("x"))
    )
    deg = sym.groupBy("w").agg(F.count("*").cast("long").alias("d"))
    wedges = deg.agg(
        F.sum(F.expr("d * (d - 1) div 2")).cast("long").alias("n_wedges")
    )
    e1 = und.select(F.col("a"), F.col("b"))
    tri = (
        e1.join(und.select(F.col("a").alias("b"), F.col("b").alias("c")), "b")
        .join(und.select(F.col("a"), F.col("b").alias("c")).withColumn("hit3", F.lit(1)), ["a", "c"])
    )
    n_tri = tri.agg(F.count("*").cast("long").alias("n_triangles"))
    codeg = (
        sym.select("w", "x")
        .join(sym.select("w", F.col("x").alias("y")), "w")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("lam"))
    )
    c4 = codeg.agg(
        F.coalesce(F.sum(F.expr("lam * (lam - 1) div 2")), F.lit(0)).alias("s")
    ).select(F.expr("s div 2").cast("long").alias("n_4cycles"))
    k4 = (
        tri.select("a", "b", "c")
        .join(und.select(F.col("a").alias("c"), F.col("b").alias("d")), "c")
        .join(und.select(F.col("a").alias("b"), F.col("b").alias("d")), ["b", "d"])
        .join(und.select("a", F.col("b").alias("d")), ["a", "d"])
        .agg(F.count("*").cast("long").alias("n_4cliques"))
    )
    return (
        wedges.crossJoin(n_tri).crossJoin(c4).crossJoin(k4).select(
            F.coalesce("n_wedges", F.lit(0)).cast("long").alias("n_wedges"),
            "n_triangles",
            "n_4cycles",
            "n_4cliques",
        )
    )


GRAPHLET_COUNTS_SQL_TEMPLATE = """
WITH eraw AS ({edges}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM eraw WHERE src <> dst),
sym AS (SELECT a AS w, b AS x FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT w, COUNT(*) AS d FROM sym GROUP BY w),
tri AS (SELECT e1.a, e1.b, e2.c
        FROM und e1
        JOIN (SELECT a AS b, b AS c FROM und) e2 USING (b)
        JOIN (SELECT a, b AS c FROM und) e3 USING (a, c)),
codeg AS (SELECT s1.x, s2.y, COUNT(*) AS lam
          FROM sym s1 JOIN (SELECT w, x AS y FROM sym) s2 USING (w)
          WHERE s1.x < s2.y GROUP BY s1.x, s2.y),
k4 AS (SELECT COUNT(*) AS n
       FROM tri
       JOIN (SELECT a AS c, b AS d FROM und) f1 USING (c)
       JOIN (SELECT a AS b, b AS d FROM und) f2 USING (b, d)
       JOIN (SELECT a, b AS d FROM und) f3 USING (a, d))
SELECT CAST(COALESCE((SELECT SUM(d * (d - 1)) FROM deg), 0) // 2 AS BIGINT)
         AS n_wedges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_triangles,
       CAST(COALESCE((SELECT SUM(lam * (lam - 1) // 2) FROM codeg), 0) // 2
         AS BIGINT) AS n_4cycles,
       CAST((SELECT n FROM k4) AS BIGINT) AS n_4cliques
"""


def purchase_node_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(id, features: array<double>) for every purchase-graph node —
    [acctbal, nationkey] from customer/supplier rows (suppliers in the
    +1_000_000 id space). The real-attribute input for
    ``linkgraph.embeddings.propagate_features``."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"),
        F.array(
            F.col("c_acctbal").cast("double"),
            F.col("c_nationkey").cast("double"),
        ).alias("features"),
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.lit(SUPPLIER_OFFSET) + F.col("s_suppkey")).alias("id"),
        F.array(
            F.col("s_acctbal").cast("double"),
            F.col("s_nationkey").cast("double"),
        ).alias("features"),
    )
    return c.unionAll(s)


PURCHASE_NODE_FEATURES_SQL = """
SELECT c_custkey AS id,
       CAST(c_acctbal AS DOUBLE) AS f0, CAST(c_nationkey AS DOUBLE) AS f1
FROM customer
UNION ALL
SELECT 1000000 + s_suppkey,
       CAST(s_acctbal AS DOUBLE), CAST(s_nationkey AS DOUBLE)
FROM supplier
"""


def attr_assortativity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Categorical attribute assortativity (Newman 2003, Phys. Rev. E
    67:026126 eq. 2): over the oriented endpoint pairs of the
    symmetrized graph, r = (Tr e − Σᵢ aᵢbᵢ) / (1 − Σᵢ aᵢbᵢ) with e the
    label mixing matrix — +1 = perfectly assortative mixing, 0 =
    random, negative = disassortative. ``labels`` is (id, label).

    One row: (n_endpoints, n_same_label, assortativity rounded 6).
    EXACT cross-engine: with integer counts m2 = |oriented pairs|,
    same = Σᵢ m2·e_ii and sᵢ = the per-label endpoint marginal (the
    symmetric graph has aᵢ = bᵢ), r = (same·m2 − Σsᵢ²) / (m2² − Σsᵢ²)
    — every moment an order-free INTEGER sum, only the final ratio
    floats. Edges whose endpoints lack a label row are excluded
    (inner joins — documented contract).

    Scale: two hash joins on the node key + two map-side-combinable
    aggregates (per-label marginal is |labels|-bounded). Integer
    moments need m2² < 2^63 (m2 ≈ 3e9 oriented pairs) — beyond that,
    cast the moment columns to decimal(38,0).
    """
    e = edges.select("src", "dst")
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    lab = labels.select(F.col("id"), F.col("label"))
    paired = (
        sym.join(lab.select(F.col("id").alias("src"), F.col("label").alias("lx")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("ly")), "dst")
    )
    marg = paired.groupBy("lx").agg(F.count("*").alias("s"))
    sums = marg.agg(
        F.sum("s").alias("m2"), F.sum(F.col("s") * F.col("s")).alias("ss")
    )
    same = paired.filter(F.col("lx") == F.col("ly")).agg(
        F.count("*").alias("same")
    )
    j = sums.crossJoin(same)
    num = F.col("same") * F.col("m2") - F.col("ss")
    den = F.col("m2") * F.col("m2") - F.col("ss")
    return j.select(
        F.col("m2").alias("n_endpoints"),
        F.col("same").alias("n_same_label"),
        F.round(
            F.when(den != 0, num.cast("double") / den.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("assortativity"),
    )


def attr_assortativity_sql(edges_sql: str, labels_sql: str) -> str:
    """DuckDB twin of ``attr_assortativity`` (same integer moments)."""
    return f"""
WITH e AS ({edges_sql}),
sym AS (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
lab AS ({labels_sql}),
paired AS (
  SELECT lx.label AS lx, ly.label AS ly
  FROM sym JOIN lab lx ON lx.id = sym.src JOIN lab ly ON ly.id = sym.dst),
marg AS (SELECT lx, COUNT(*) AS s FROM paired GROUP BY lx),
sums AS (SELECT CAST(SUM(s) AS BIGINT) AS m2, CAST(SUM(s * s) AS BIGINT) AS ss FROM marg),
sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS same FROM paired WHERE lx = ly)
SELECT m2 AS n_endpoints, same AS n_same_label,
       ROUND(CASE WHEN m2 * m2 - ss != 0
             THEN CAST(same * m2 - ss AS DOUBLE) / CAST(m2 * m2 - ss AS DOUBLE)
             ELSE 0.0 END, 6) AS assortativity
FROM sums, sm
"""


def sparsify_local_degree(
    edges: DataFrame, min_keep: int = 1
) -> DataFrame:
    """Local-degree structure-preserving sparsifier (Satuluri-Parthasarathy-
    Ruan SIGMOD'11 local sparsification; Hamann et al. SNAM 2016 — public
    results): every node keeps its ceil(sqrt(degree)) strongest incident
    edges (weight desc, neighbor-id asc tie-break), and an undirected
    edge survives when EITHER endpoint keeps it. The sqrt exponent is the
    published default that provably preserves hub connectivity and
    community structure while cutting a power-law graph to ~O(n sqrt(d_avg))
    edges — the standard preprocessing step before running the iterative
    procedures in this engine on a 100TB co-occurrence graph.

    Returns the kept undirected edges (a < b) as (a, b, weight), weight =
    the symmetrized 6-decimal sum of the input pair weights.

    Cross-engine exactness: weights enter the fixed-point integer domain
    once (ROUND(w*1e6) BIGINT, summed per unordered pair), the per-node
    rank is an integer (w6 desc, nbr asc) ROW_NUMBER, and the keep bound
    ceil(sqrt(d)) is exact — IEEE sqrt is correctly rounded in both
    engines and d < 2^52. Only sqrt (exponent 1/2) is offered: a generic
    pow(d, alpha) is NOT correctly rounded and would 1-ulp-diverge
    cross-engine at exact integer crossings.

    Scale notes (100TB): ONE shuffle — the partition-by-node window over
    the symmetrized table (a hub's partition holds its degree rows; the
    rank is computed in-task) — plus the kept-edge dedup aggregate.
    No joins, no driver state. min_keep floors the per-node budget
    (default 1: every non-isolated node stays connected to its top
    neighbor)."""
    wcol = (
        F.coalesce(F.col("weight"), F.lit(1.0))
        if "weight" in edges.columns
        else F.lit(1.0)
    )
    w6 = F.round(wcol.cast("double") * F.lit(1_000_000.0), 0).cast("long")
    e = (
        edges.select("src", "dst", w6.alias("w6"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    sym = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"), "w6")
        .unionByName(e.select(F.col("dst").alias("a"), F.col("src").alias("b"), "w6"))
        .groupBy("a", "b")
        .agg(F.sum("w6").alias("w6"))
    )
    w = Window.partitionBy("a").orderBy(F.col("w6").desc(), F.col("b").asc())
    ranked = sym.select(
        "a", "b", "w6",
        F.row_number().over(w).cast("long").alias("rk"),
        F.count("*").over(Window.partitionBy("a")).cast("long").alias("d"),
    )
    keep = ranked.filter(
        F.col("rk")
        <= F.greatest(
            F.lit(int(min_keep)),
            F.ceil(F.sqrt(F.col("d").cast("double"))).cast("long"),
        )
    )
    return (
        keep.select(
            F.least("a", "b").alias("a"),
            F.greatest("a", "b").alias("b"),
            "w6",
        )
        .groupBy("a", "b")
        .agg(F.max("w6").alias("w6"))
        .select(
            "a", "b",
            F.round(F.col("w6").cast("double") / F.lit(1_000_000.0), 6).alias(
                "weight"
            ),
        )
    )


def sparsify_local_degree_sql(edges_sql: str, min_keep: int = 1) -> str:
    """DuckDB twin of ``sparsify_local_degree`` (same integer rank and
    isqrt-exact keep bound)."""
    return f"""
WITH e0 AS ({edges_sql}),
ed AS (SELECT DISTINCT src, dst,
  CAST(ROUND(CAST(COALESCE(weight, 1.0) AS DOUBLE) * 1000000.0) AS BIGINT) AS w6
  FROM e0 WHERE src <> dst),
sym AS (SELECT a, b, SUM(w6) AS w6 FROM (
  SELECT src AS a, dst AS b, w6 FROM ed
  UNION ALL SELECT dst, src, w6 FROM ed) GROUP BY a, b),
ranked AS (SELECT a, b, w6,
  CAST(ROW_NUMBER() OVER (PARTITION BY a ORDER BY w6 DESC, b ASC) AS BIGINT) AS rk,
  CAST(COUNT(*) OVER (PARTITION BY a) AS BIGINT) AS d
  FROM sym),
keep AS (SELECT LEAST(a, b) AS a, GREATEST(a, b) AS b, w6 FROM ranked
  WHERE rk <= GREATEST({int(min_keep)},
                       CAST(CEIL(SQRT(CAST(d AS DOUBLE))) AS BIGINT)))
SELECT a, b, ROUND(CAST(MAX(w6) AS DOUBLE) / 1000000.0, 6) AS weight
FROM keep GROUP BY a, b
"""


def configuration_model(edges: DataFrame, seed: int = 0) -> DataFrame:
    """Degree-preserving null-model rewiring — the configuration model
    (Molloy-Reed 1995, public result) with DETERMINISTIC hash-ordered
    stub matching: every undirected edge contributes one stub per
    endpoint; stubs are totally ordered by (md5-hash, node, partner)
    and consecutive stubs are paired. The degree sequence is preserved
    EXACTLY (each node appears in exactly deg(n) stubs); self-loops
    and parallel edges may appear, as in the standard model — keep or
    drop them downstream depending on the null hypothesis.

    Returns the rewired multigraph as (a, b) rows with a <= b, one row
    per pairing. The standard use: re-run modularity / clustering /
    assortativity on the rewired graph to z-score the observed value
    against the degree-preserving null.

    Cross-engine exactness: the stub order is a strict total order on
    hash-distinct keys, so the pairing — and the DuckDB twin
    (`configuration_model_sql`) — is value-exact.

    Scale notes (100TB): one symmetrize + one global rank — computed
    by ``distributed_rank`` (ids.py): range-repartition the 2m stubs
    on the (hash, node, partner) sort key, rank within partitions,
    add broadcast cumulative offsets. Rank values are identical to a
    global ROW_NUMBER window for any split-point placement, so the
    DuckDB twin is unchanged — and no single task ever sorts the
    whole stub frame."""
    from linkgraph.checkpoint import attach_caches
    from linkgraph.ids import distributed_rank
    from linkgraph.pipeline.hashing import stable_hash64

    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .distinct()
    )
    stubs = e.select(
        F.col("a").alias("node"), F.col("b").alias("partner")
    ).unionByName(
        e.select(F.col("b").alias("node"), F.col("a").alias("partner"))
    )
    h = stable_hash64(
        F.concat_ws("|", F.col("node"), F.col("partner")), salt=seed
    )
    ranked_full = distributed_rank(
        stubs.withColumn("_h", h),
        [("_h", "asc"), ("node", "asc"), ("partner", "asc")],
        name="rn",
    )
    ranked = ranked_full.select(
        "node", F.expr("CAST((rn - 1) DIV 2 AS BIGINT)").alias("pair_id")
    )
    out = (
        ranked.groupBy("pair_id")
        .agg(F.min("node").alias("a"), F.max("node").alias("b"))
        .select("a", "b")
    )
    # the rank pass persists the range-parted stub frame — hand the
    # cache up so loop callers (motif_significance) can free it
    return attach_caches(out, getattr(ranked_full, "_linkgraph_caches", []))


def configuration_model_sql(edges_sql: str, seed: int = 0) -> str:
    """DuckDB twin of ``configuration_model`` (same hash total order
    and consecutive pairing)."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    h = stable_hash64_sql("node || '|' || partner", salt=seed)
    return f"""
WITH e0 AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e0 WHERE src <> dst),
stubs AS (SELECT a AS node, b AS partner FROM und
          UNION ALL SELECT b, a FROM und),
ranked AS (SELECT node,
  CAST((ROW_NUMBER() OVER (ORDER BY {h} ASC, node ASC, partner ASC) - 1) // 2
       AS BIGINT) AS pair_id
  FROM stubs)
SELECT MIN(node) AS a, MAX(node) AS b FROM ranked GROUP BY pair_id
"""


def robustness_curve(
    edges: DataFrame,
    steps: int = 4,
    frac_per_step: float = 0.1,
    strategy: str = "degree",
    seed: int = 0,
) -> DataFrame:
    """Targeted-attack / random-failure robustness profile (Albert,
    Jeong, Barabási, Nature 406, 2000 — public result): remove a
    growing prefix of nodes and track the giant connected component.
    ``strategy="degree"`` removes hubs first (targeted attack — the
    profile that collapses fast on power-law graphs);
    ``strategy="hash"`` removes in md5 order (the deterministic stand-
    in for uniform random failure — the profile scale-free graphs
    survive). The gap between the two curves IS the classic
    robustness-vs-fragility signature.

    Per step s (0..steps): remove the first ceil(s · frac · n) nodes
    of the strategy order (degree DESC, id ASC — or hash ASC, id ASC),
    then giant = the largest component of the induced subgraph.
    Returns (step, removed, giant_size).

    Cross-engine exactness: the removal order is a strict total order
    on integers, component sizes are integers; the DuckDB twin
    (`robustness_curve_sql`) is hash-exact. Removal counts use
    ceil(k)/1e6 integer arithmetic (the threshold contract).

    Scale notes (100TB): the strategy rank is computed ONCE (degree
    aggregate + one ``distributed_rank`` pass — range-partitioned,
    offset-corrected, value-identical to the global window the SQL
    twin uses, with no single-task sort); each step is one induced
    semi-join + one connected-components run (delta iteration) —
    steps is a small knob, and the per-step graph only shrinks."""
    if steps < 1:
        raise ValueError(f"steps must be >= 1: got {steps}")
    if not (0.0 < frac_per_step < 1.0):
        raise ValueError(f"frac_per_step must be in (0,1): {frac_per_step}")
    if strategy not in ("degree", "hash"):
        raise ValueError(f"strategy must be 'degree' or 'hash': {strategy}")
    from linkgraph.components import connected_components
    from linkgraph.kcore import _sym_simple
    from linkgraph.checkpoint import pin_table, release_caches, release_state
    from linkgraph.pipeline.hashing import stable_hash64

    from linkgraph.ids import distributed_rank

    spark = edges.sparkSession
    sym = pin_table(_sym_simple(edges))
    deg = sym.groupBy("a").agg(F.count("*").cast("long").alias("d"))
    if strategy == "degree":
        order = [("d", "desc"), ("a", "asc")]
        keyed = deg
    else:
        h = stable_hash64(F.col("a").cast("string"), salt=seed)
        order = [("_h", "asc"), ("a", "asc")]
        keyed = deg.withColumn("_h", h)
    rk_full = distributed_rank(keyed, order, name="rk")
    ranked = pin_table(
        rk_full.select(F.col("a").alias("id"), "d", F.col("rk").cast("long").alias("rk"))
    )
    release_caches(rk_full)  # pinned copy taken; free the range-parted cache
    n = ranked.count()
    f6 = int(round(frac_per_step * 1_000_000))
    rows = []
    for s in range(steps + 1):
        k = -(-(n * s * f6) // 1_000_000)  # ceil
        alive = ranked.filter(F.col("rk") > k).select("id")
        if alive.limit(1).count() == 0:
            rows.append((s, int(k), 0))
            continue
        ew = (
            sym.join(alive.withColumnRenamed("id", "a"), "a")
            .join(alive.withColumnRenamed("id", "b"), "b")
            .select(F.col("a").alias("src"), F.col("b").alias("dst"))
        )
        cc = connected_components(ew, nodes=alive)
        giant = (
            cc.components.groupBy("comp").agg(F.count("*").alias("c"))
            .agg(F.max("c")).first()[0]
        )
        rows.append((s, int(k), int(giant or 0)))
    release_state(sym)
    release_state(ranked)
    return spark.createDataFrame(rows, "step long, removed long, giant_size long")


def robustness_curve_sql(
    edges_sql: str,
    steps: int = 4,
    frac_per_step: float = 0.1,
    strategy: str = "degree",
    seed: int = 0,
    n_rounds: int = 10,
) -> str:
    """DuckDB twin of ``robustness_curve``: same strategy rank, per
    step an induced min-label propagation unrolled ``n_rounds`` times
    (must cover the surviving component diameter), max component
    size."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    f6 = int(round(frac_per_step * 1_000_000))
    if strategy == "degree":
        order = "d DESC, a ASC"
    else:
        order = f"{stable_hash64_sql('CAST(a AS VARCHAR)', salt=seed)} ASC, a ASC"
    parts = [
        f"WITH e AS ({edges_sql})",
        """sym AS MATERIALIZED (SELECT DISTINCT a, b FROM (
  SELECT src AS a, dst AS b FROM e WHERE src <> dst
  UNION ALL SELECT dst, src FROM e WHERE src <> dst))""",
        "deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS d FROM sym GROUP BY a)",
        f"""ranked AS MATERIALIZED (SELECT a AS id, d,
  CAST(ROW_NUMBER() OVER (ORDER BY {order}) AS BIGINT) AS rk FROM deg)""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked)",
    ]
    selects = []
    for s in range(steps + 1):
        parts.append(
            f"""k{s} AS (SELECT (n * {s} * {f6} + 999999) // 1000000 AS k
  FROM nn)"""
        )
        parts.append(
            f"a{s} AS MATERIALIZED (SELECT id FROM ranked, k{s} WHERE rk > k)"
        )
        parts.append(
            f"""l{s}_0 AS MATERIALIZED (SELECT id AS node, id AS lbl FROM a{s})"""
        )
        for t in range(1, n_rounds + 1):
            parts.append(
                f"""l{s}_{t} AS MATERIALIZED (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM l{s}_{t - 1}
    UNION ALL
    SELECT sym.a AS node, p.lbl
    FROM l{s}_{t - 1} p JOIN sym ON sym.b = p.node
    JOIN a{s} ka ON ka.id = sym.a)
  GROUP BY node)"""
            )
        parts.append(
            f"""g{s} AS (SELECT CAST({s} AS BIGINT) AS step,
  (SELECT k FROM k{s}) AS removed,
  CAST(COALESCE(MAX(c), 0) AS BIGINT) AS giant_size
  FROM (SELECT lbl, COUNT(*) AS c FROM l{s}_{n_rounds} GROUP BY lbl))"""
        )
        selects.append(f"SELECT step, removed, giant_size FROM g{s}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(selects)


def motif_significance(
    edges: DataFrame, n_samples: int = 3, seed: int = 0
) -> DataFrame:
    """Triangle-motif significance against the degree-preserving null
    (Milo et al., Science 298, 2002 — the network-motif z-score):
    count triangles on the observed graph and on ``n_samples``
    `configuration_model` rewirings (each SIMPLIFIED before counting —
    loops dropped, multi-edges collapsed, the standard practice), then
    z = (observed - null_mean) / null_std. Composes two existing
    operators; the one new piece is the exact moment arithmetic.

    Returns ONE row (observed, null_mean, null_std, z) — floats
    rounded 6; z is NULL when the null variance is 0 (disclosed
    rather than fabricating infinity).

    Cross-engine exactness: every count is an integer; mean/variance
    come from integer moments (Σc, Σc² — population variance over the
    sample set) in shared double-division shapes; sqrt is IEEE
    correctly-rounded on both engines. DuckDB twin:
    `motif_significance_sql`.

    Scale notes (100TB): n_samples + 1 triangle counts (each the
    wedge-join shape) over graphs of the SAME degree sequence — runs
    are independent, schedule them as separate jobs if wall-clock
    matters; the rewiring itself is the configuration_model rank
    pass."""
    if n_samples < 1:
        raise ValueError(f"n_samples must be >= 1: got {n_samples}")
    from linkgraph.checkpoint import release_caches
    from linkgraph.triangles import triangle_count

    spark = edges.sparkSession
    obs_res = triangle_count(edges)
    observed = int(obs_res.triangle_count)
    obs_res.release()
    counts = []
    for s in range(n_samples):
        rw = configuration_model(edges, seed=seed + s)
        simple = rw.filter(F.col("a") != F.col("b")).distinct().select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        )
        res = triangle_count(simple)
        counts.append(int(res.triangle_count))
        res.release()
        release_caches(rw)  # the rewiring's range-parted stub cache
    ssum = sum(counts)
    ssq = sum(c * c for c in counts)
    mean = ssum / n_samples
    var = ssq / n_samples - mean * mean
    std = var ** 0.5 if var > 0 else 0.0

    def _r6(x):  # HALF_UP away from zero — python round() is banker's
        import math
        return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6

    z = _r6((observed - mean) / std) if std > 0 else None
    return spark.createDataFrame(
        [(float(observed), _r6(mean), _r6(std), z)],
        "observed double, null_mean double, null_std double, z double",
    )


def motif_significance_sql(
    edges_sql: str, n_samples: int = 3, seed: int = 0
) -> str:
    """DuckDB twin of ``motif_significance``: per-sample configuration
    rewiring + id-ordered triangle count, identical moment arithmetic."""
    tri_count = """SELECT CAST(COUNT(*) AS BIGINT) AS c FROM {u} e1
  JOIN {u} e2 ON e2.a = e1.b JOIN {u} e3 ON e3.a = e1.a AND e3.b = e2.b"""
    parts = [
        f"WITH e0 AS ({edges_sql})",
        """obs_u AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
  GREATEST(src, dst) AS b FROM e0 WHERE src <> dst)""",
        f"obs AS ({tri_count.format(u='obs_u')})",
    ]
    from linkgraph.pipeline.hashing import stable_hash64_sql

    for s in range(n_samples):
        h = stable_hash64_sql("node || '|' || partner", salt=seed + s)
        parts.append(
            f"""rw{s} AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT MIN(node) AS a, MAX(node) AS b FROM (
      SELECT node,
        CAST((ROW_NUMBER() OVER (ORDER BY {h} ASC, node ASC, partner ASC)
              - 1) // 2 AS BIGINT) AS pair_id
      FROM (SELECT a AS node, b AS partner FROM obs_u
            UNION ALL SELECT b, a FROM obs_u))
    GROUP BY pair_id)
  WHERE a <> b)"""
        )
        parts.append(f"c{s} AS ({tri_count.format(u=f'rw{s}')})")
    csel = " UNION ALL ".join(f"SELECT c FROM c{s}" for s in range(n_samples))
    parts.append(f"samples AS ({csel})")
    parts.append(
        """m AS (SELECT CAST(SUM(c) AS BIGINT) AS ssum,
  CAST(SUM(c * c) AS BIGINT) AS ssq FROM samples)"""
    )
    n = n_samples
    return (
        ",\n".join(parts)
        + f"""
SELECT CAST(obs.c AS DOUBLE) AS observed,
  ROUND(CAST(m.ssum AS DOUBLE) / {n}, 6) AS null_mean,
  ROUND(CASE WHEN CAST(m.ssq AS DOUBLE) / {n}
             - (CAST(m.ssum AS DOUBLE) / {n}) * (CAST(m.ssum AS DOUBLE) / {n})
             > 0
        THEN sqrt(CAST(m.ssq AS DOUBLE) / {n}
                  - (CAST(m.ssum AS DOUBLE) / {n})
                    * (CAST(m.ssum AS DOUBLE) / {n}))
        ELSE 0.0 END, 6) AS null_std,
  CASE WHEN CAST(m.ssq AS DOUBLE) / {n}
            - (CAST(m.ssum AS DOUBLE) / {n}) * (CAST(m.ssum AS DOUBLE) / {n})
            > 0
       THEN ROUND((CAST(obs.c AS DOUBLE) - CAST(m.ssum AS DOUBLE) / {n})
                  / sqrt(CAST(m.ssq AS DOUBLE) / {n}
                         - (CAST(m.ssum AS DOUBLE) / {n})
                           * (CAST(m.ssum AS DOUBLE) / {n})), 6)
       ELSE NULL END AS z
FROM obs CROSS JOIN m"""
    )


def forest_fire_sample(
    edges: DataFrame,
    seeds: list[int],
    p_num: int = 2,
    p_den: int = 5,
    max_rounds: int = 8,
    direction: str = "BOTH",
    burn_seed: int = 0,
) -> DataFrame:
    """Forest-fire graph sampling (Leskovec-Faloutsos KDD'06 — the
    classic property-preserving subgraph sampler), deterministic: the
    fire starts at ``seeds``; each round every burning node ignites
    each incident edge independently iff
    H(u|v|burn_seed) % p_den < p_num (a fixed per-edge hash coin —
    burn decisions are properties of the edge, so revisits are
    consistent and the SQL twin (`forest_fire_sample_sql`) is
    hash-exact); newly burned nodes join the frontier. Stops at
    ``max_rounds`` or when the fire dies.

    Returns (id, burned_round) — round 0 = seeds. The sampled
    subgraph is the induced graph on these nodes (compose with
    `induced_subgraph`).

    Scale notes (100TB): identical machinery to the influence RR
    frontier — one frontier-vs-pinned-adjacency join with the
    liveness predicate evaluated in-task per round + a first-arrival
    aggregate; state is the burned set."""
    if not seeds or len(set(seeds)) != len(seeds):
        raise ValueError("seeds must be a non-empty distinct list")
    if not (0 < p_num <= p_den):
        raise ValueError(f"p must be rational in (0, 1]: {p_num}/{p_den}")
    if direction not in ("OUTGOING", "INCOMING", "BOTH"):
        raise ValueError(f"bad direction {direction}")
    from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state
    from linkgraph.pipeline.hashing import stable_hash64

    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if direction == "OUTGOING":
        adj = e
    elif direction == "INCOMING":
        adj = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    else:
        adj = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    adj = pin_table(adj.distinct())
    burned = pin_table(
        spark.createDataFrame(
            [(int(s), 0) for s in seeds], "id long, burned_round long"
        )
    )
    frontier = burned
    loop = SuperstepLoop(spark, name="forestfire", max_steps=max_rounds)
    coin = F.pmod(
        stable_hash64(F.concat_ws("|", F.col("src"), F.col("dst")),
                      salt=f"ff-{burn_seed}"),
        F.lit(p_den),
    ) < F.lit(p_num)
    for it in range(1, max_rounds + 1):
        new = (
            frontier.withColumnRenamed("id", "src")
            .join(adj, "src")
            .filter(coin)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(burned.select("id"), "id", "left_anti")
            .select("id", F.lit(it).cast("long").alias("burned_round"))
        )
        new = loop.advance(it, new, metrics={"round": it})
        n_new = new.count()
        prev = burned
        burned = pin_table(burned.unionByName(new))
        release_state(prev)
        frontier = new
        if n_new == 0:
            break
    return burned


def forest_fire_sample_sql(
    edges_sql: str,
    seeds: list[int],
    p_num: int = 2,
    p_den: int = 5,
    max_rounds: int = 8,
    direction: str = "BOTH",
    burn_seed: int = 0,
) -> str:
    """DuckDB twin of ``forest_fire_sample`` (same per-edge hash
    coins, unrolled rounds)."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    if direction == "OUTGOING":
        view = "SELECT DISTINCT src, dst FROM e WHERE src <> dst"
    elif direction == "INCOMING":
        view = "SELECT DISTINCT dst AS src, src AS dst FROM e WHERE src <> dst"
    else:
        view = ("SELECT DISTINCT src, dst FROM ("
                "SELECT src, dst FROM e WHERE src <> dst "
                "UNION ALL SELECT dst, src FROM e WHERE src <> dst)")
    h = stable_hash64_sql("adj.src || '|' || adj.dst", salt=f"ff-{burn_seed}")
    vals = ", ".join(f"({int(s)})" for s in seeds)
    parts = [
        f"WITH e AS ({edges_sql})",
        f"adj AS MATERIALIZED ({view})",
        f"b0 AS (SELECT CAST(s AS BIGINT) AS id,"
        f" CAST(0 AS BIGINT) AS burned_round FROM (VALUES {vals}) v(s))",
    ]
    for t in range(1, max_rounds + 1):
        prev = " UNION ALL ".join(f"SELECT id FROM b{i}" for i in range(t))
        parts.append(
            f"""b{t} AS MATERIALIZED (
  SELECT DISTINCT adj.dst AS id, CAST({t} AS BIGINT) AS burned_round
  FROM b{t - 1} f JOIN adj ON adj.src = f.id
  WHERE ({h}) % {p_den} < {p_num}
    AND adj.dst NOT IN ({prev}))"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT id, burned_round FROM b{t}" for t in range(max_rounds + 1)
    )
    return ",\n".join(parts) + "\n" + sel


def effective_size(edges: DataFrame) -> DataFrame:
    """Burt's effective size / redundancy (Burt 1992, "Structural
    Holes" — public result): for each ego, redundancy = 2t/deg (t =
    triangles through the node — ties among the ego's alters) and
    effective size = deg − 2t/deg. The classic structural-holes
    brokerage measure: a node whose neighbors are mutually connected
    spans fewer "holes" than its raw degree suggests.

    Composes the exact triangle counter (`triangles.triangle_count`
    per-node counts — the degree-ordered wedge machinery and its hub
    caps apply unchanged). Returns (id, degree, triangles, redundancy,
    eff_size) with the two ratios rounded 6; replayed by
    ``effective_size_sql``. The counter's caches ride on the returned
    frame — free with ``checkpoint.release_caches`` when consumed.
    """
    from linkgraph.checkpoint import attach_caches
    from linkgraph.triangles import triangle_count

    res = triangle_count(edges)
    counts = res.counts
    return attach_caches(counts.select(
        "id",
        F.col("degree").cast("long").alias("degree"),
        F.col("triangles").cast("long").alias("triangles"),
        F.round(2.0 * F.col("triangles") / F.col("degree"), 6).alias("redundancy"),
        F.round(
            F.col("degree") - 2.0 * F.col("triangles") / F.col("degree"), 6
        ).alias("eff_size"),
    ), res._caches)


def effective_size_sql(edges_sql: str) -> str:
    """Oracle: per-node triangle membership counts over the canonical
    oriented wedge join + the same redundancy/effective-size ratios."""
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS degree FROM (
          SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        GROUP BY id),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
pt AS (SELECT id, COUNT(*) AS triangles FROM (
         SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
         UNION ALL SELECT z AS id FROM tri) GROUP BY id)
SELECT d.id, d.degree,
       COALESCE(pt.triangles, 0) AS triangles,
       ROUND(2.0 * COALESCE(pt.triangles, 0) / d.degree, 6) AS redundancy,
       ROUND(d.degree - 2.0 * COALESCE(pt.triangles, 0) / d.degree, 6)
         AS eff_size
FROM deg d LEFT JOIN pt ON pt.id = d.id
"""


def powerlaw_fit(edges: DataFrame, xmin: int = 1) -> DataFrame:
    """Continuous-approximation power-law MLE over the degree
    distribution (Clauset-Shalizi-Newman SIAM Rev. 2009, eq. 3.7 for
    discrete data): alpha = 1 + n / Σ ln(d_i / (xmin − ½)) over nodes
    with degree ≥ xmin. The graph-health companion to
    ``degree_histogram`` / the corpus `zipf_fit`: a scale-free link
    graph shows alpha ≈ 2-3, and a drifting alpha across ingest
    snapshots is the standard skew alarm for the salting knobs.

    Cross-engine discipline (the zipf_fit/perplexity machinery): each
    ln is ROUNDed to 7 decimals, scaled to 1e7 integer units and
    summed as an order-free int64 — Spark, DuckDB
    (``powerlaw_fit_sql``) and Python agree exactly; only the final
    ratio is a float. ONE degree aggregate + one scalar aggregate —
    no shuffle beyond the degree census.

    Returns one row (n_nodes, xmin, alpha) with alpha rounded 6
    (NULL when no degree exceeds xmin — disclosed, not fabricated).
    """
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
        .filter(F.col("d") >= xmin)
    )
    lnterm = F.expr(
        f"CAST(ROUND(ROUND(ln(d / ({xmin} - 0.5)), 7) * 10000000, 0) AS BIGINT)"
    )
    return deg.agg(
        F.count("*").alias("n_nodes"),
        F.sum(lnterm).alias("s7"),
    ).select(
        "n_nodes",
        F.lit(xmin).cast("long").alias("xmin"),
        F.when(
            F.col("s7") > 0,
            F.round(F.lit(1.0) + F.col("n_nodes").cast("double")
                    * F.lit(1e7) / F.col("s7"), 6),
        ).alias("alpha"),
    )


def powerlaw_fit_sql(edges_sql: str, xmin: int = 1) -> str:
    """Oracle: identical rounded-ln integer moments and final ratio."""
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS d FROM (
          SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        GROUP BY id HAVING COUNT(*) >= {xmin}),
mo AS (SELECT COUNT(*) AS n_nodes,
              SUM(CAST(ROUND(ROUND(ln(d / ({xmin} - 0.5)), 7) * 10000000, 0)
                  AS BIGINT)) AS s7
       FROM deg)
SELECT n_nodes, CAST({xmin} AS BIGINT) AS xmin,
       CASE WHEN s7 > 0
            THEN ROUND(1.0 + CAST(n_nodes AS DOUBLE) * 1e7 / s7, 6)
       END AS alpha
FROM mo
"""


def degree_knn(edges: DataFrame) -> DataFrame:
    """Average-nearest-neighbor-degree profile k_nn(k)
    (Pastor-Satorras, Vázquez & Vespignani PRL 2001 — public result):
    for each degree class k, the mean degree of the neighbors of
    degree-k nodes, averaged over EDGE ENDS —
    ``knn(k) = Σ_{v: deg v = k} Σ_{u~v} deg(u) / (k · n_k)``.
    Rising knn(k) = assortative mixing, falling = the disassortative
    hub signature of web/import graphs — the per-k refinement of the
    scalar ``degree_assortativity``.

    Integer-exact: one symmetric-adjacency join + two integer
    aggregates; only the final per-k ratio is a float (rounded 6).
    Returns (k, n_nodes, knn); replayed by ``degree_knn_sql``.
    """
    from linkgraph.coloring import _sym

    sym = _sym(edges)
    deg = sym.groupBy("node").agg(F.count("*").alias("d"))
    mass = (
        sym.join(deg.select(F.col("node").alias("nbr"),
                            F.col("d").alias("nd")), "nbr")
        .join(deg, "node")
        .groupBy("d")
        .agg(F.sum("nd").alias("mass"))
    )
    nk = deg.groupBy("d").agg(F.count("*").alias("n_nodes"))
    return (
        nk.join(mass, "d")
        .select(
            F.col("d").alias("k"),
            "n_nodes",
            F.round(F.col("mass") / (F.col("d") * F.col("n_nodes")), 6)
            .alias("knn"),
        )
    )


def degree_knn_sql(edges_sql: str) -> str:
    """Oracle: the same edge-end degree-mass ratios."""
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst),
sym AS (SELECT a AS node, b AS nbr FROM und
        UNION ALL SELECT b AS node, a AS nbr FROM und),
deg AS (SELECT node, COUNT(*) AS d FROM sym GROUP BY node),
mass AS (SELECT dn.d, SUM(db.d) AS mass
         FROM sym s JOIN deg dn ON dn.node = s.node
         JOIN deg db ON db.node = s.nbr
         GROUP BY dn.d),
nk AS (SELECT d, COUNT(*) AS n_nodes FROM deg GROUP BY d)
SELECT nk.d AS k, nk.n_nodes,
       ROUND(CAST(mass.mass AS DOUBLE) / (nk.d * nk.n_nodes), 6) AS knn
FROM nk JOIN mass ON mass.d = nk.d
"""


def clustering_by_degree(edges: DataFrame) -> DataFrame:
    """Degree-dependent clustering coefficient c(k) (Vázquez,
    Pastor-Satorras & Vespignani PRE 2002 — public result): the mean
    local clustering coefficient over nodes of degree k. A power-law
    c(k) ~ k^-1 is the hierarchical-modularity signature of real
    import graphs; flat c(k) means degree-independent closure. The
    per-k companion of ``degree_knn`` on the triangle side.

    Exact integers until the end: per degree class it aggregates
    Σ triangles and n_k, and c(k) = 2·Σt / (n_k · k·(k-1)) — ONE
    rational per class (not a mean of per-node floats, so the value is
    order-free and engine-exact). Degree-1 nodes have no defined
    coefficient and are reported with c NULL. Composes the exact
    triangle counter; its caches ride on the returned frame
    (``checkpoint.release_caches``). Replayed by
    ``clustering_by_degree_sql``.
    """
    from linkgraph.checkpoint import attach_caches
    from linkgraph.triangles import triangle_count

    res = triangle_count(edges)
    out = (
        res.counts.groupBy(F.col("degree").cast("long").alias("k"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.col("triangles").cast("long")).alias("tri_sum"),
        )
        .select(
            "k", "n_nodes",
            F.when(
                F.col("k") >= 2,
                F.round(
                    2.0 * F.col("tri_sum")
                    / (F.col("n_nodes") * F.col("k") * (F.col("k") - 1)),
                    6,
                ),
            ).alias("c"),
        )
    )
    return attach_caches(out, res._caches)


def clustering_by_degree_sql(edges_sql: str) -> str:
    """Oracle: per-node triangle membership + the same per-class
    rational."""
    return f"""
WITH e AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS k FROM (
          SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und)
        GROUP BY id),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
pt AS (SELECT id, COUNT(*) AS t FROM (
         SELECT x AS id FROM tri UNION ALL SELECT y AS id FROM tri
         UNION ALL SELECT z AS id FROM tri) GROUP BY id),
cls AS (SELECT d.k, COUNT(*) AS n_nodes,
               SUM(COALESCE(pt.t, 0)) AS tri_sum
        FROM deg d LEFT JOIN pt ON pt.id = d.id GROUP BY d.k)
SELECT k, n_nodes,
       CASE WHEN k >= 2
            THEN ROUND(2.0 * tri_sum / (n_nodes * k * (k - 1)), 6)
       END AS c
FROM cls
"""
