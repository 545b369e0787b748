"""Driver contract for the spark-graft builder (PySpark target).

Wires the linkgraph engine's procedures (SURVEY.md §2) to the driver's
correctness harness: each ``queries()`` entry runs on Spark and is
compared against ``oracle_sql()`` executed by DuckDB on the same
parquet tables (row count + schema + order-insensitive value hash).

Floating-point columns are rounded to 6 decimals on BOTH sides so that
summation-order differences between engines (~1e-13 relative) cannot
flip the value hash; the BASELINE correctness gate is allclose 1e-6.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph import connected_components, label_propagation, pagerank, triangle_count
from linkgraph.graphs import (
    COSUPPLIER_EDGES_SQL,
    PURCHASE_EDGES_SQL,
    cosupplier_edges,
    purchase_edges,
)

DAMPING = 0.85
PR_ITERS = 5


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: PageRank over the customer->supplier purchase
    graph derived from sf0.001 orders/lineitem."""
    edges = purchase_edges(spark, "/root/testdata/sf0.001")
    res = pagerank(edges, damping=DAMPING, max_iter=PR_ITERS)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


# ----------------------------------------------------------------- queries

def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = pagerank(purchase_edges(spark, sf_dir), damping=DAMPING, max_iter=PR_ITERS)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _q_articlerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArticleRank on the purchase graph — the reference family's
    damped-citation PageRank variant (linkgraph/articlerank.py)."""
    from linkgraph.articlerank import article_rank
    res = article_rank(purchase_edges(spark, sf_dir), damping=DAMPING, max_iter=PR_ITERS)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _articlerank_sql() -> str:
    from linkgraph.articlerank import article_rank_sql
    return article_rank_sql(PURCHASE_EDGES_SQL, PR_ITERS, d=DAMPING)


def _q_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mode (engine extension): contribution rank*w/sum_w."""
    res = pagerank(
        cosupplier_edges(spark, sf_dir), damping=DAMPING, max_iter=PR_ITERS, weighted=True
    )
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _q_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank: teleport mass lands only on the source
    set (every 17th node id) — the later-lineage sourceNodes option."""
    edges = purchase_edges(spark, sf_dir)
    universe = edges.select(F.col("src").alias("id")).union(
        edges.select(F.col("dst").alias("id"))
    ).distinct()
    sources = universe.filter(F.col("id") % 17 == 0)
    res = pagerank(
        edges, damping=DAMPING, max_iter=PR_ITERS, source_nodes=sources
    )
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _q_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(purchase_edges(spark, sf_dir))
    return res.components.select("id", "comp")


def _q_wcc_setcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(purchase_edges(spark, sf_dir))
    return res.components.agg(F.countDistinct("comp").alias("set_count"))


def _q_wcc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """large-star/small-star CC (Kiveris SoCC'14) — same oracle as the
    min-label path: identical output contract, O(log n) rounds."""
    res = connected_components(purchase_edges(spark, sf_dir), algorithm="star")
    return res.components.select("id", "comp")


def _q_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = connected_components(cosupplier_edges(spark, sf_dir), threshold=2.0)
    return res.components.select("id", "comp")


def _q_labelprop(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = label_propagation(cosupplier_edges(spark, sf_dir), direction="BOTH", max_iter=1)
    return res.labels.select("id", "label")


def _q_labelprop2(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = label_propagation(cosupplier_edges(spark, sf_dir), direction="BOTH", max_iter=2)
    return res.labels.select("id", "label")


def _q_labelprop_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same 2-iteration LPA through the broadcast-hub split (hub_cap=8
    forces every nbr key of this dense graph hot): vote sums are
    split-invariant, so the values must equal the plain path's — the
    driver-level proof of the skew mechanism (linkgraph/labelprop.py)."""
    res = label_propagation(
        cosupplier_edges(spark, sf_dir), direction="BOTH", max_iter=2, hub_cap=8
    )
    return res.labels.select("id", "label")


def _q_modularity_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community modularity decomposition of the 2-iteration LPA
    assignment on the co-supplier graph — integer intra/degree masses
    plus a pinned-order double contribution (value-EXACT cross-engine;
    linkgraph/community.py)."""
    from linkgraph.community import community_stats
    e = cosupplier_edges(spark, sf_dir)
    res = label_propagation(e, direction="BOTH", max_iter=2)
    asg = res.labels.select("id", F.col("label").alias("community"))
    return community_stats(e, asg)


def _q_contract_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community contraction of the 2-iteration LPA assignment: the
    multilevel building block as a public operator — super-edges with
    micro-integer-exact weights (linkgraph/community.py#contract_graph)."""
    from linkgraph.community import contract_graph
    e = cosupplier_edges(spark, sf_dir)
    res = label_propagation(e, direction="BOTH", max_iter=2)
    asg = res.labels.select("id", F.col("label").alias("community"))
    return contract_graph(e, asg)


def _q_conductance_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-community conductance of the same 2-iteration LPA
    assignment — integer cut/volume counts, exact final ratio
    (linkgraph/community.py#community_conductance)."""
    from linkgraph.community import community_conductance
    e = cosupplier_edges(spark, sf_dir)
    res = label_propagation(e, direction="BOTH", max_iter=2)
    asg = res.labels.select("id", F.col("label").alias("community"))
    return community_conductance(e, asg)


def _q_compare_lpa_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARI + NMI agreement between the 2-iteration LPA labels and the
    2-sweep synchronous Louvain assignment on the co-supplier graph —
    an algorithm-vs-algorithm composition checked end-to-end
    (linkgraph/community.py#compare_assignments)."""
    from linkgraph.community import compare_assignments, louvain_local_move
    e = cosupplier_edges(spark, sf_dir)
    lpa = label_propagation(e, direction="BOTH", max_iter=2).labels.select(
        "id", F.col("label").alias("community")
    )
    lou = louvain_local_move(e, rounds=2, sweep="sync").assignment
    return compare_assignments(lpa, lou)


def _q_louvain_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain phase-1 on the purchase graph: 3 alternate-parity
    integer-scaled local-move sweeps (deterministic, SQL-replayable;
    linkgraph/community.py)."""
    from linkgraph.community import louvain_local_move
    res = louvain_local_move(purchase_edges(spark, sf_dir), rounds=3, sweep="alternate")
    return res.assignment


def _q_refine_louvain_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leiden-style refinement of the Louvain purchase assignment:
    split communities into connected parts (canonical min-id labels;
    linkgraph/community.py#refine_communities)."""
    from linkgraph.community import louvain_local_move, refine_communities
    res = louvain_local_move(purchase_edges(spark, sf_dir), rounds=3, sweep="alternate")
    return refine_communities(purchase_edges(spark, sf_dir), res.assignment)


def _q_infomap_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """InfoMap (algo.infoMap): 2 hash-gated map-equation sweeps on the
    co-supplier graph. Value-exact twin: the ΔL expression is the SAME
    SQL string in both engines with every ln rounded to 7
    (linkgraph/infomap.py)."""
    from linkgraph.infomap import infomap_local_move
    res = infomap_local_move(cosupplier_edges(spark, sf_dir), rounds=2, sweep="hash")
    return res.assignment


def _q_louvain_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain phase-1 on the co-supplier graph: 2 fully synchronous
    sweeps (the simplest oracle target — the near-clique graph has no
    bipartite oscillation risk)."""
    from linkgraph.community import louvain_local_move
    res = louvain_local_move(cosupplier_edges(spark, sf_dir), rounds=2, sweep="sync")
    return res.assignment


_LPA2_SQL_TEMPLATE = """
WITH e AS ({edges}),
sym AS (SELECT src AS node, dst AS nbr, weight FROM e
        UNION ALL SELECT dst, src, weight FROM e),
l0 AS (SELECT DISTINCT node AS id, node AS label FROM sym),
v1 AS (SELECT s.node, l.label, SUM(s.weight) AS v
       FROM sym s JOIN l0 l ON l.id = s.nbr GROUP BY 1, 2),
b1 AS (SELECT node AS id, label,
              ROW_NUMBER() OVER (PARTITION BY node ORDER BY v DESC, label ASC) AS rk
       FROM v1),
l1 AS (SELECT id, label FROM b1 WHERE rk = 1),
v2 AS (SELECT s.node, l.label, SUM(s.weight) AS v
       FROM sym s JOIN l1 l ON l.id = s.nbr GROUP BY 1, 2),
b2 AS (SELECT node AS id, label,
              ROW_NUMBER() OVER (PARTITION BY node ORDER BY v DESC, label ASC) AS rk
       FROM v2)
SELECT id, label FROM b2 WHERE rk = 1
"""

_LPA2_SQL = _LPA2_SQL_TEMPLATE.format(edges=COSUPPLIER_EDGES_SQL)


def _modularity_lpa_sql() -> str:
    from linkgraph.community import community_stats_sql
    asg = f"SELECT id, label AS community FROM ({_LPA2_SQL})"
    return community_stats_sql(COSUPPLIER_EDGES_SQL, asg)


def _contract_lpa_sql() -> str:
    from linkgraph.community import contract_graph_sql
    asg = f"SELECT id, label AS community FROM ({_LPA2_SQL})"
    return contract_graph_sql(COSUPPLIER_EDGES_SQL, asg)


def _conductance_lpa_sql() -> str:
    from linkgraph.community import community_conductance_sql
    asg = f"SELECT id, label AS community FROM ({_LPA2_SQL})"
    return community_conductance_sql(COSUPPLIER_EDGES_SQL, asg)


def _compare_lpa_louvain_sql() -> str:
    from linkgraph.community import compare_assignments_sql, louvain_local_sql
    x = f"SELECT id, label AS community FROM ({_LPA2_SQL})"
    y = louvain_local_sql(COSUPPLIER_EDGES_SQL, 2, sweep="sync")
    return compare_assignments_sql(x, y)


def _louvain_purchase_sql() -> str:
    from linkgraph.community import louvain_local_sql
    return louvain_local_sql(PURCHASE_EDGES_SQL, 3, sweep="alternate")


def _louvain_cosupplier_sql() -> str:
    from linkgraph.community import louvain_local_sql
    return louvain_local_sql(COSUPPLIER_EDGES_SQL, 2, sweep="sync")


def _refine_louvain_purchase_sql() -> str:
    from linkgraph.community import louvain_local_sql, refine_communities_sql
    return refine_communities_sql(
        PURCHASE_EDGES_SQL, louvain_local_sql(PURCHASE_EDGES_SQL, 3, sweep="alternate")
    )


def _infomap_cosupplier_sql() -> str:
    from linkgraph.infomap import infomap_sql
    return infomap_sql(COSUPPLIER_EDGES_SQL, 2, sweep="hash")


def _q_edge_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-edge triangle support on the co-supplier graph (the k-truss
    building block; linkgraph/truss.py)."""
    from linkgraph.truss import edge_support
    return edge_support(cosupplier_edges(spark, sf_dir))


def _q_ktruss4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss of the co-supplier graph: every surviving edge closes
    >= 2 triangles inside the truss (iterative support peel)."""
    from linkgraph.truss import k_truss
    res = k_truss(cosupplier_edges(spark, sf_dir), k=4)
    return res.edges


def _edge_support_sql() -> str:
    from linkgraph.truss import edge_support_sql
    return edge_support_sql(COSUPPLIER_EDGES_SQL)


def _ktruss4_sql() -> str:
    from linkgraph.truss import k_truss_sql
    return k_truss_sql(COSUPPLIER_EDGES_SQL, 4, n_rounds=6)


def _q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.triangles.agg(F.count("*").alias("triangle_count"))


def _q_triangles_per_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.counts.select(
        "id",
        F.col("triangles").cast("long").alias("triangles"),
        F.col("degree").cast("long").alias("degree"),
        F.round("coefficient", 6).alias("coefficient"),
    )


def _q_triangle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    return res.triangles.select("node_a", "node_b", "node_c")


def _q_approx_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doulion hash-coin sampled triangle count with the 1/p³ scale —
    the 100TB approximate path (linkgraph/triangles.py)."""
    from linkgraph.triangles import approx_triangle_count
    return approx_triangle_count(cosupplier_edges(spark, sf_dir), p=0.6, seed=5)


def _q_effective_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burt effective size / redundancy per ego on the co-supplier
    graph (linkgraph/graphs.py#effective_size)."""
    from linkgraph.graphs import effective_size
    return effective_size(cosupplier_edges(spark, sf_dir))


def _q_ifub_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact diameter via iFUB (few BFS waves) — checked against the
    algorithmically independent all-pairs eccentricity oracle
    (linkgraph/paths.py#ifub_diameter)."""
    from linkgraph.paths import ifub_diameter
    return ifub_diameter(_trade_nation_edges(spark, sf_dir), max_hops=8)


def _ifub_diameter_sql() -> str:
    from linkgraph.paths import graph_diameter_sql
    return (f"SELECT diameter FROM ("
            f"{graph_diameter_sql(TRADE_NATION_SQL, max_hops=8)})")


def _q_clustering_by_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c(k) degree-dependent clustering profile on the co-supplier
    graph (linkgraph/graphs.py#clustering_by_degree)."""
    from linkgraph.graphs import clustering_by_degree
    return clustering_by_degree(cosupplier_edges(spark, sf_dir))


def _clustering_by_degree_sql() -> str:
    from linkgraph.graphs import clustering_by_degree_sql
    return clustering_by_degree_sql(COSUPPLIER_EDGES_SQL)


def _q_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-mass data-mixing plan over the documents sources
    (pipeline/curate.py#mixing_plan)."""
    from linkgraph.pipeline.curate import mixing_plan
    return mixing_plan(_docs(spark, sf_dir),
                       {"src0": 0.3, "src1": 0.3, "src2": 0.4})


def _mixing_plan_sql() -> str:
    from linkgraph.pipeline.curate import mixing_plan_sql
    return mixing_plan_sql({"src0": 0.3, "src1": 0.3, "src2": 0.4})


def _q_degree_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k_nn(k) average-neighbor-degree profile on the purchase graph
    — the per-k degree-mixing probe (linkgraph/graphs.py#degree_knn)."""
    from linkgraph.graphs import degree_knn
    return degree_knn(purchase_edges(spark, sf_dir))


def _degree_knn_sql() -> str:
    from linkgraph.graphs import degree_knn_sql
    return degree_knn_sql(PURCHASE_EDGES_SQL)


def _q_powerlaw_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clauset-Shalizi-Newman power-law alpha MLE over the purchase
    degree distribution (linkgraph/graphs.py#powerlaw_fit)."""
    from linkgraph.graphs import powerlaw_fit
    return powerlaw_fit(purchase_edges(spark, sf_dir), xmin=2)


def _approx_triangles_sql() -> str:
    from linkgraph.triangles import approx_triangle_sql
    return approx_triangle_sql(COSUPPLIER_EDGES_SQL, p=0.6, seed=5)


def _effective_size_sql() -> str:
    from linkgraph.graphs import effective_size_sql
    return effective_size_sql(COSUPPLIER_EDGES_SQL)


def _powerlaw_purchase_sql() -> str:
    from linkgraph.graphs import powerlaw_fit_sql
    return powerlaw_fit_sql(PURCHASE_EDGES_SQL, xmin=2)


def _q_balanced_triads_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.balancedTriads analog: structural-balance census on the
    cosupplier graph with sign = (co-order count - 2 >= 0) — pairs
    sharing >= 2 orders are friends, single-order pairs enemies
    (linkgraph/triangles.py#balanced_triads)."""
    from linkgraph.triangles import balanced_triads
    e = cosupplier_edges(spark, sf_dir).withColumn(
        "weight", F.col("weight") - 2.0
    )
    return balanced_triads(e)


def _q_triangles_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second execution path: the adjacency-intersection kernel
    (linkgraph/triangles.py kernel="intersect") against the same
    DuckDB oracle as the per-node wedge-kernel query — cross-path
    exactness checked by the driver, not just by pytest."""
    res = triangle_count(cosupplier_edges(spark, sf_dir), kernel="intersect")
    return res.counts.select(
        "id",
        F.col("triangles").cast("long").alias("triangles"),
        F.col("degree").cast("long").alias("degree"),
        F.round("coefficient", 6).alias("coefficient"),
    )


def _q_kcore_purchase(spark, sf_dir):
    """25-core of the purchase graph (iterative peel; engine
    extension — see linkgraph/kcore.py)."""
    from linkgraph.kcore import k_core
    return k_core(purchase_edges(spark, sf_dir), k=25).members


def _q_score_trade(spark, sf_dir):
    """Weighted s-core (strength >= 2500) of the nation trade graph:
    the weighted peel in the 6-decimal integer domain
    (linkgraph/kcore.py#s_core)."""
    from linkgraph.kcore import s_core
    return s_core(_trade_nation_edges_w(spark, sf_dir), s=2500.0).members


def _q_coreness_purchase(spark, sf_dir):
    """Core number of every purchase-graph node via h-index
    iteration (Lü et al. 2016)."""
    from linkgraph.kcore import core_numbers
    return core_numbers(purchase_edges(spark, sf_dir)).coreness


def _q_hyperball_harmonic_purchase(spark, sf_dir):
    """Sketch-path harmonic centrality (Boldi-Vigna HyperBall) — the
    third harmonic path next to the exact and sampled estimators."""
    from linkgraph.anf import hyperball_harmonic
    return hyperball_harmonic(purchase_edges(spark, sf_dir), max_t=3, m=16, seed=0)


def _q_anf_purchase(spark, sf_dir):
    """HyperBall per-node ball-size estimates for t <= 3 (engine
    extension — linkgraph/anf.py; deterministic registers make the
    oracle value-exact, not a tolerance band)."""
    from linkgraph.anf import anf
    return anf(purchase_edges(spark, sf_dir), max_t=3, m=16, seed=0).balls


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        purchase_edges(spark, sf_dir)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("outdeg"))
    )


def _q_degree_weighted_cosupplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.degree with weightProperty: undirected (in+out) relationship
    count + 6-decimal fixed-point exact weighted degree
    (linkgraph/graphs.py#degree_centrality)."""
    from linkgraph.graphs import degree_centrality
    return degree_centrality(
        cosupplier_edges(spark, sf_dir), direction="BOTH", weighted=True
    )


def _q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution probe (SURVEY.md §7 skew measurement)."""
    from linkgraph import degree_histogram
    return degree_histogram(purchase_edges(spark, sf_dir), direction="OUTGOING")


def _q_sp_pair_cosupplier(spark, sf_dir):
    """Single-pair shortest path (reference algo.shortestPath start/end
    contract). The driver-checked value is total_cost — unique across
    equal-cost path choices; the path rows themselves are golden-tested
    on a unique-path fixture in tests/test_paths.py."""
    from linkgraph import shortest_path_pair
    edges = cosupplier_edges(spark, sf_dir)
    lo = edges.agg(F.min("src")).first()[0]
    hi = edges.agg(F.max("dst")).first()[0]
    _path, cost = shortest_path_pair(edges, lo, hi, weighted=True, direction="BOTH")
    return spark.createDataFrame(
        [(round(float(cost), 6),)], "total_cost double"
    )


# ------------------------------------------------- paths / scc / mst

def _q_sssp_cosupplier(spark, sf_dir):
    """Weighted <=2-hop shortest distances from the min supplier id
    (hop-bounded contract shared with the recursive oracle)."""
    from linkgraph import sssp
    edges = cosupplier_edges(spark, sf_dir)
    src = edges.agg(F.min("src")).first()[0]
    res = sssp(edges, src, weighted=True, direction="BOTH", max_hops=2)
    return res.distances.select("id", F.round("dist", 6).alias("dist"))


def _q_delta_stepping_cosupplier(spark, sf_dir):
    """Delta-stepping SSSP to the unbounded fixpoint; the oracle is an
    unrolled all-pairs min-plus doubling (7 rounds => every <=128-edge
    path, exact for any 100-node graph) restricted to the source row."""
    from linkgraph import sssp_delta_stepping
    edges = cosupplier_edges(spark, sf_dir)
    src = edges.agg(F.min("src")).first()[0]
    res = sssp_delta_stepping(edges, src, delta=4.0, direction="BOTH")
    return res.distances.select("id", F.round("dist", 6).alias("dist"))


def _trade_nation_edges(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .filter(F.col("w") >= 60)
        .select("src", "dst")
    )


TRADE_NATION_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE c.c_nationkey != s.s_nationkey
GROUP BY 1, 2 HAVING COUNT(*) >= 60
"""

TRADE_NATION_W_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst, CAST(COUNT(*) AS DOUBLE) AS weight
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
WHERE c.c_nationkey != s.s_nationkey
GROUP BY 1, 2 HAVING COUNT(*) >= 60
"""


def _trade_nation_edges_w(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_suppkey")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").cast("double").alias("weight"))
        .filter(F.col("weight") >= 60)
    )


def _q_astar_nation(spark, sf_dir):
    """A* on the weighted trade graph, nation 0 -> 9: heuristic is the
    graph's min edge weight as a uniform lower bound (h(t)=0) —
    admissible+consistent by construction (linkgraph/kpaths.py)."""
    from linkgraph.kpaths import astar_path
    e = _trade_nation_edges_w(spark, sf_dir)
    minw = float(e.agg(F.min("weight")).first()[0])
    universe = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    h = universe.select(
        "id", F.when(F.col("id") == 9, F.lit(0.0)).otherwise(F.lit(minw)).alias("h")
    )
    res = astar_path(e, 0, 9, heuristic=h)
    rows = [] if res.total_cost is None else [(9, res.total_cost)]
    return e.sparkSession.createDataFrame(rows, "target long, total_cost double")


def _q_yen_nation(spark, sf_dir):
    """Yen top-3 loopless <=4-hop paths on the weighted trade graph,
    nation 0 -> 9 (linkgraph/kpaths.py)."""
    from linkgraph.kpaths import yen_k_shortest
    res = yen_k_shortest(
        _trade_nation_edges_w(spark, sf_dir), 0, 9, k=3, max_hops=4
    )
    return res.df.select("rank", "total_cost")


def _astar_nation_sql() -> str:
    from linkgraph.kpaths import astar_cost_sql
    return astar_cost_sql(TRADE_NATION_W_SQL, 0, 9, n_rounds=24)


def _yen_nation_sql() -> str:
    from linkgraph.kpaths import yen_sql
    return yen_sql(TRADE_NATION_W_SQL, 0, 9, 3, 4)


def _q_luby_purchase(spark, sf_dir):
    """Luby maximal independent set on the purchase graph under the
    portable md5 priority (linkgraph/coloring.py)."""
    from linkgraph.coloring import luby_mis
    res = luby_mis(purchase_edges(spark, sf_dir), seed=42)
    return res.assignment


def _q_jp_nation(spark, sf_dir):
    """Jones-Plassmann greedy coloring of the (dense) trade-nation
    graph (linkgraph/coloring.py)."""
    from linkgraph.coloring import jones_plassmann
    res = jones_plassmann(_trade_nation_edges(spark, sf_dir), seed=42)
    return res.assignment


def _luby_purchase_sql() -> str:
    from linkgraph.coloring import luby_mis_sql
    return luby_mis_sql(PURCHASE_EDGES_SQL, 42, 8)


def _jp_nation_sql() -> str:
    # 25 nations; every round colors >= 1 node, so 25 rounds cover any
    # scale factor (extra rounds are idempotent)
    from linkgraph.coloring import jones_plassmann_sql
    return jones_plassmann_sql(TRADE_NATION_SQL, 42, 25)


def _q_wl_cosupplier(spark, sf_dir):
    """1-WL color refinement role classes on the co-supplier graph,
    textbook sorted-multiset encoding (linkgraph/wl.py)."""
    from linkgraph.wl import wl_refinement
    res = wl_refinement(cosupplier_edges(spark, sf_dir), rounds=3, seed=7)
    return res.colors


def _q_wl_sum_purchase(spark, sf_dir):
    """1-WL refinement on the purchase graph via the order-free
    DECIMAL-sum multiset encoding — the map-side-combinable 100TB
    path (linkgraph/wl.py)."""
    from linkgraph.wl import wl_refinement
    res = wl_refinement(purchase_edges(spark, sf_dir), rounds=3, seed=7,
                        combine="sum")
    return res.colors


def _wl_cosupplier_sql() -> str:
    from linkgraph.wl import wl_refinement_sql
    return wl_refinement_sql(COSUPPLIER_EDGES_SQL, 3, seed=7)


def _wl_sum_purchase_sql() -> str:
    from linkgraph.wl import wl_refinement_sql
    return wl_refinement_sql(PURCHASE_EDGES_SQL, 3, seed=7, combine="sum")


def _q_bpart_purchase(spark, sf_dir):
    """Capacity-constrained balanced 4-way partitioning of the
    purchase graph (linkgraph/partition.py)."""
    from linkgraph.partition import balanced_partition
    res = balanced_partition(purchase_edges(spark, sf_dir), k=4, rounds=4,
                             seed=3)
    return res.assignment


def _q_bpart_cosupplier(spark, sf_dir):
    """Balanced 3-way partitioning of the dense co-supplier graph
    (linkgraph/partition.py)."""
    from linkgraph.partition import balanced_partition
    res = balanced_partition(cosupplier_edges(spark, sf_dir), k=3, rounds=5,
                             seed=11, slack_pct=5)
    return res.assignment


def _bpart_purchase_sql() -> str:
    from linkgraph.partition import balanced_partition_sql
    return balanced_partition_sql(PURCHASE_EDGES_SQL, k=4, rounds=4, seed=3)


def _bpart_cosupplier_sql() -> str:
    from linkgraph.partition import balanced_partition_sql
    return balanced_partition_sql(COSUPPLIER_EDGES_SQL, k=3, rounds=5,
                                  seed=11, slack_pct=5)


def _q_bpart_weighted_cosupplier(spark, sf_dir):
    """Weight-mass balanced partitioning of the co-supplier graph —
    votes carry the co-occurrence counts as w6 fixed-point mass
    (linkgraph/partition.py)."""
    from linkgraph.partition import balanced_partition
    res = balanced_partition(cosupplier_edges(spark, sf_dir), k=3, rounds=4,
                             seed=13, weighted=True)
    return res.assignment


def _bpart_weighted_cosupplier_sql() -> str:
    from linkgraph.partition import balanced_partition_sql
    return balanced_partition_sql(COSUPPLIER_EDGES_SQL, k=3, rounds=4,
                                  seed=13, weighted=True)


def _q_path_cooc_synth(spark, sf_dir):
    """Path co-occurrence edge derivation over the synthetic source
    catalog — the north star's second edge family; the oracle
    re-derives the file dimension arithmetically
    (linkgraph/ingest.py#path_cooccurrence_edges)."""
    from linkgraph.ingest import path_cooccurrence_edges
    from linkgraph.synth import generate_source_table
    src = generate_source_table(spark, repos=20, files_per_repo=30,
                                packages=4, seed=42)
    return path_cooccurrence_edges(src)


def _path_cooc_synth_sql() -> str:
    from linkgraph.ingest import path_cooccurrence_sql
    from linkgraph.synth import synth_file_dim_sql
    return path_cooccurrence_sql(synth_file_dim_sql(20, 30, 4))


def _q_wcc_path_cooc(spark, sf_dir):
    """End-to-end catalog composition: synthetic source table → path
    co-occurrence edges → union-find components. Directory groups are
    exactly the components, so the oracle is a windowed MIN over the
    arithmetically reconstructed file dimension."""
    from linkgraph.ingest import path_cooccurrence_edges
    from linkgraph.synth import generate_source_table
    src = generate_source_table(spark, repos=20, files_per_repo=30,
                                packages=4, seed=42)
    return connected_components(path_cooccurrence_edges(src)).components


def _wcc_path_cooc_sql() -> str:
    from linkgraph.synth import synth_file_dim_sql
    return f"""
WITH dim AS ({synth_file_dim_sql(20, 30, 4)}),
grp AS (SELECT repo, dir FROM dim GROUP BY repo, dir HAVING COUNT(*) >= 2)
SELECT module AS id,
       MIN(module) OVER (PARTITION BY repo, dir) AS comp
FROM dim JOIN grp USING (repo, dir)"""


def _q_affinity_cosupplier(spark, sf_dir):
    """Affinity-clustering dendrogram levels on the co-supplier graph,
    similarity counts negated into distances so the strongest
    co-supply pairs merge first (linkgraph/affinity.py)."""
    from linkgraph.affinity import affinity_clustering
    e = cosupplier_edges(spark, sf_dir).withColumn("weight", -F.col("weight"))
    return affinity_clustering(e, levels=2).assignments


def _affinity_cosupplier_sql() -> str:
    from linkgraph.affinity import affinity_clustering_sql
    neg = (f"SELECT src, dst, -weight AS weight FROM ({COSUPPLIER_EDGES_SQL})")
    return affinity_clustering_sql(neg, levels=2)


def _q_spectral_cosupplier(spark, sf_dir):
    """Fiedler sign bipartition of the co-supplier graph — deflated
    integer power iteration (linkgraph/spectral.py)."""
    from linkgraph.spectral import spectral_bipartition
    res = spectral_bipartition(cosupplier_edges(spark, sf_dir), rounds=20,
                               seed=3)
    return res.sides


def _spectral_cosupplier_sql() -> str:
    from linkgraph.spectral import spectral_bipartition_sql
    return spectral_bipartition_sql(COSUPPLIER_EDGES_SQL, rounds=20, seed=3)


def _q_graphlets_nation(spark, sf_dir):
    """3/4-node graphlet counts (wedges, triangles, 4-cycles,
    4-cliques) on the trade graph — BIGINT-exact subgraph counts
    (linkgraph/graphs.py#graphlet_counts)."""
    from linkgraph.graphs import graphlet_counts
    return graphlet_counts(_trade_nation_edges(spark, sf_dir))


def _q_bfs_trade_nation(spark, sf_dir):
    """algo.bfs.stream: canonical level-order traversal (depth = hop
    distance, id tie-break) of the trade graph from nation 0
    (linkgraph/traversal.py)."""
    from linkgraph.traversal import bfs_stream
    return bfs_stream(_trade_nation_edges(spark, sf_dir), source=0)


def _q_dfs_trade_nation(spark, sf_dir):
    """algo.dfs.stream: deterministic smallest-id-first DFS preorder
    from nation 0; the DuckDB twin replays the identical stack machine
    as a single-row recursive CTE (linkgraph/traversal.py)."""
    from linkgraph.traversal import dfs_stream
    return dfs_stream(_trade_nation_edges(spark, sf_dir), source=0)


def _graphlets_nation_sql() -> str:
    from linkgraph.graphs import GRAPHLET_COUNTS_SQL_TEMPLATE
    return GRAPHLET_COUNTS_SQL_TEMPLATE.format(edges=TRADE_NATION_SQL)


def _bfs_nation_sql() -> str:
    from linkgraph.traversal import bfs_sql
    return bfs_sql(TRADE_NATION_SQL, source=0)


def _dfs_nation_sql() -> str:
    from linkgraph.traversal import dfs_sql
    return dfs_sql(TRADE_NATION_SQL, source=0)


def _q_apsp_nation(spark, sf_dir):
    from linkgraph import all_shortest_paths_stream
    return all_shortest_paths_stream(
        _trade_nation_edges(spark, sf_dir), direction="OUTGOING", max_hops=8
    )


def _q_closeness_nation(spark, sf_dir):
    from linkgraph import closeness_centrality
    return closeness_centrality(
        _trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8
    ).select(
        "id", "farness", F.col("reached").cast("long").alias("reached"),
        F.round("closeness", 6).alias("closeness"),
    )


def _q_eccentricity_nation(spark, sf_dir):
    """Exact hop eccentricity per nation (integer maxes; the exact
    companion to the HyperBall estimate — linkgraph/paths.py)."""
    from linkgraph.paths import eccentricity
    return eccentricity(_trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8)


def _q_diameter_nation(spark, sf_dir):
    """Graph diameter/radius + peripheral/central node counts from
    the exact eccentricity table (linkgraph/paths.py)."""
    from linkgraph.paths import graph_diameter
    return graph_diameter(_trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8)


def _q_landmark_est_nation(spark, sf_dir):
    """Landmark distance sketch on the trade graph: BFS index from the
    id%3==0 landmark set, min-plus upper bounds for every src<dst
    query pair with src%5==0 (linkgraph/paths.py#landmark_index,
    #landmark_estimate)."""
    from linkgraph.paths import landmark_estimate, landmark_index
    e = _trade_nation_edges(spark, sf_dir)
    universe = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    lms = universe.filter(F.col("id") % 3 == 0)
    idx = landmark_index(e, lms, direction="BOTH", max_hops=8)
    a = universe.filter(F.col("id") % 5 == 0).select(F.col("id").alias("src"))
    b = universe.select(F.col("id").alias("dst"))
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    return landmark_estimate(idx, pairs)


def _q_closeness_wf_nation(spark, sf_dir):
    """Wasserman-Faust improved closeness (the reference's `improved`
    flag): raw closeness scaled by the reachable fraction, comparable
    across components (linkgraph/paths.py#closeness_centrality)."""
    from linkgraph import closeness_centrality
    return closeness_centrality(
        _trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8, wf=True
    ).select(
        "id", "farness", F.col("reached").cast("long").alias("reached"),
        F.round("closeness", 6).alias("closeness"),
    )


def _q_harmonic_nation(spark, sf_dir):
    """Harmonic centrality (algo.closeness.harmonic lineage): sum of
    1/dist over reachable nodes — defined on disconnected graphs."""
    from linkgraph import harmonic_centrality
    return harmonic_centrality(
        _trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8
    ).select(
        "id", F.col("reached").cast("long").alias("reached"),
        F.round("harmonic", 6).alias("harmonic"),
        F.round("normalized", 6).alias("normalized"),
    )


def _q_dangalchev_nation(spark, sf_dir):
    """Dangalchev closeness (algo.closeness.dangalchev): sum of
    2^-dist over reachable nodes — every term a dyadic rational, so
    the SUM is order-independent and the oracle exact
    (linkgraph/paths.py#dangalchev_centrality)."""
    from linkgraph.paths import dangalchev_centrality
    return dangalchev_centrality(
        _trade_nation_edges(spark, sf_dir), direction="BOTH", max_hops=8
    ).select(
        "id",
        F.col("reached").cast("long").alias("reached"),
        F.round("dangalchev", 6).alias("dangalchev"),
    )


def _nation_sources(edges):
    """Deterministic sampled source set: every node id % 3 == 0 (the
    sampled-estimator analog of the personalized query's % 17 rule)."""
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id") % 3 == 0)
    )


def _q_closeness_sampled_nation(spark, sf_dir):
    """Sampled-source closeness (Eppstein-Wang estimator): BFS only
    from nodes with id % 3 == 0; farness_hat = (n/|S|) * sum of sampled
    distances. The oracle restricts the recursive BFS CTE to the same
    sampled set and applies the same scale."""
    from linkgraph import closeness_centrality
    edges = _trade_nation_edges(spark, sf_dir)
    return closeness_centrality(
        edges, direction="BOTH", max_hops=8, sources=_nation_sources(edges)
    ).select(
        "id", F.round("farness", 6).alias("farness"),
        F.col("reached").cast("long").alias("reached"),
        F.round("closeness", 6).alias("closeness"),
    )


def _q_harmonic_sampled_nation(spark, sf_dir):
    """Sampled-source harmonic centrality: h_hat = (n/|S|) * sum of
    1/dist over sampled sources (v=u term naturally 0 — no exclusion
    correction needed)."""
    from linkgraph import harmonic_centrality
    edges = _trade_nation_edges(spark, sf_dir)
    return harmonic_centrality(
        edges, direction="BOTH", max_hops=8, sources=_nation_sources(edges)
    ).select(
        "id", F.col("reached").cast("long").alias("reached"),
        F.round("harmonic", 6).alias("harmonic"),
        F.round("normalized", 6).alias("normalized"),
    )


def _q_apsp_weighted_sampled_nation(spark, sf_dir):
    """Weighted shortest-path stream restricted to a sampled source
    set (the at-scale contract for allShortestPaths: never all-pairs).
    Oracle: full min-plus doubling matrix filtered to sampled rows."""
    from linkgraph import all_shortest_paths_stream
    edges = _trade_nation_edges_w(spark, sf_dir)
    return all_shortest_paths_stream(
        edges, sources=_nation_sources(edges), weighted=True, direction="OUTGOING"
    ).select("source", "target", F.round("distance", 6).alias("distance"))


def _returns_digraph(spark, sf_dir):
    """Directed graph with cycles: customer -> supplier for every
    purchase, supplier -> customer for returned items."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    fwd = j.select(
        F.col("o_custkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
    ).distinct()
    back = (
        j.filter(F.col("l_returnflag") == "R")
        .select(
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .distinct()
    )
    return fwd.union(back)


RETURNS_DIGRAPH_SQL = """
SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
UNION
SELECT DISTINCT 1000000 + l_suppkey AS src, o_custkey AS dst
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
"""


def _q_bowtie_returns(spark, sf_dir):
    """Broder bow-tie macro-structure of the returns digraph — CORE/
    IN/OUT/TUBE/TENDRIL/DISCONNECTED classes (linkgraph/bowtie.py)."""
    from linkgraph.bowtie import bowtie_decomposition
    res = bowtie_decomposition(_returns_digraph(spark, sf_dir))
    return res.classes


def _bowtie_returns_sql() -> str:
    from linkgraph.bowtie import bowtie_sql
    return bowtie_sql(RETURNS_DIGRAPH_SQL)


def _q_scc_returns(spark, sf_dir):
    from linkgraph import strongly_connected_components
    res = strongly_connected_components(_returns_digraph(spark, sf_dir))
    return res.components.select("id", "scc")


ORDERCHAIN_SQL = """
WITH ord AS (
  SELECT o_custkey, o_orderkey AS k,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders)
SELECT a.k AS src, b.k AS dst FROM ord a JOIN ord b
  ON a.o_custkey = b.o_custkey
 AND (b.rn = a.rn + 1 OR (a.rn = 1 AND b.rn > a.rn + 1))
"""


def _orderchain_edges(spark, sf_dir):
    """Order-succession DAG: each customer's orders chained by date
    (rn -> rn+1) plus star edges first-order -> every later order, so
    levels exercise the multi-predecessor max (level(k) = rn(k)-1)."""
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ordr = o.select(
        "o_custkey", F.col("o_orderkey").alias("k"), F.row_number().over(w).alias("rn")
    )
    a = ordr.select(F.col("o_custkey").alias("ck"), F.col("k").alias("src"),
                    F.col("rn").alias("ra"))
    b = ordr.select(F.col("o_custkey").alias("ck"), F.col("k").alias("dst"),
                    F.col("rn").alias("rb"))
    return (
        a.join(b, "ck")
        .filter(
            (F.col("rb") == F.col("ra") + 1)
            | ((F.col("ra") == 1) & (F.col("rb") > F.col("ra") + 1))
        )
        .select("src", "dst")
    )


TEMPORAL_RETURNS_SQL = """
SELECT DISTINCT o_custkey AS src, 1000000 + l_suppkey AS dst,
       CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS ts
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
UNION ALL
SELECT DISTINCT 1000000 + l_suppkey AS src, o_custkey AS dst,
       CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) + 30 AS BIGINT) AS ts
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_returnflag = 'R'
"""


def _temporal_returns_edges(spark, sf_dir):
    """Timestamped digraph: customer -> supplier arcs dated by order
    day (epoch anchored 1990-01-01), supplier -> customer return arcs
    30 days later — multi-hop time-respecting journeys exist exactly
    when a later purchase follows an earlier return."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1990-01-01")).cast("long")
    fwd = j.select(
        F.col("o_custkey").alias("src"),
        (F.lit(1_000_000) + F.col("l_suppkey")).alias("dst"),
        day.alias("ts"),
    ).distinct()
    bwd = (
        j.filter(F.col("l_returnflag") == "R")
        .select(
            (F.lit(1_000_000) + F.col("l_suppkey")).alias("src"),
            F.col("o_custkey").alias("dst"),
            (day + F.lit(30)).alias("ts"),
        )
        .distinct()
    )
    return fwd.union(bwd)


def _q_earliest_arrival_weighted_returns(spark, sf_dir):
    """Duration-aware journeys: shipping takes 7 days forward, 3 days
    on returns — arrival = departure + duration
    (linkgraph/temporal.py earliest_arrival dur_col)."""
    from linkgraph.temporal import earliest_arrival
    e = _temporal_returns_edges(spark, sf_dir).withColumn(
        "dur",
        F.when(F.col("src") < 1_000_000, F.lit(7)).otherwise(F.lit(3)).cast("long"),
    )
    res = earliest_arrival(e, source=0, dur_col="dur")
    return res.arrivals.select("id", "arrival")


def _q_latest_departure_returns(spark, sf_dir):
    """Backward temporal dual: latest departure reaching customer 0 by
    day 5000 (linkgraph/temporal.py latest_departure)."""
    from linkgraph.temporal import latest_departure
    res = latest_departure(
        _temporal_returns_edges(spark, sf_dir), target=0, deadline=5000
    )
    return res.arrivals.select("id", "departure")


def _q_densest_purchase(spark, sf_dir):
    """Densest subgraph by Bahmani parallel peeling, eps=0.5
    (linkgraph/densest.py); oracle unrolls the identical rounds and
    picks the first densest round's node set."""
    from linkgraph.densest import densest_subgraph
    res = densest_subgraph(purchase_edges(spark, sf_dir), eps=0.5)
    assert res.rounds <= 16, "oracle unrolls 16 rounds"
    return res.members


def _q_matching_cosupplier(spark, sf_dir):
    """Deterministic greedy maximal matching over the co-supplier
    graph (linkgraph/matching.py); the md5 edge priority makes the
    parallel local-minimum rounds reproduce the sequential greedy
    result, which the oracle unrolls round-by-round."""
    from linkgraph.matching import maximal_matching
    res = maximal_matching(cosupplier_edges(spark, sf_dir))
    assert res.rounds <= 12, "oracle unrolls 12 rounds"
    return res.matching


def _q_temporal_pr_returns(spark, sf_dir):
    """Windowed temporal PageRank over the dated purchase/return
    digraph (linkgraph/temporal.py temporal_pagerank): influence flows
    only forward in time through 8 equal windows; beta-decayed carry,
    half-up integer pushes."""
    from linkgraph.temporal import temporal_pagerank
    return temporal_pagerank(_temporal_returns_edges(spark, sf_dir), n_windows=8)


def _q_earliest_arrival_returns(spark, sf_dir):
    """Temporal earliest-arrival from customer 0 over the dated
    purchase/return digraph (linkgraph/temporal.py). Oracle: recursive
    journey expansion with the time guard in the join."""
    from linkgraph.temporal import earliest_arrival
    res = earliest_arrival(_temporal_returns_edges(spark, sf_dir), source=0)
    return res.arrivals.select("id", "arrival")


def _q_temporal_closeness_returns(spark, sf_dir):
    """Temporal harmonic closeness of customer 0 over the dated
    purchase/return digraph (linkgraph/temporal.py#temporal_closeness)."""
    from linkgraph.temporal import temporal_closeness
    return temporal_closeness(_temporal_returns_edges(spark, sf_dir),
                              source=0, start_ts=0)


def _temporal_closeness_sql_wrapped() -> str:
    from linkgraph.temporal import temporal_closeness_sql
    return temporal_closeness_sql(TEMPORAL_RETURNS_SQL, 0, start_ts=0)


NATION_SUPPLIER_SQL = (
    TRADE_NATION_SQL.strip()
    + "\nUNION ALL\nSELECT s_nationkey AS src, 1000 + s_suppkey AS dst FROM supplier"
)


def _nation_supplier_edges(spark, sf_dir):
    """Nation trade core (cycles) plus one leaf edge per supplier to
    its nation — bridge/cut-vertex-rich by construction: every
    supplier leaf edge is a bridge, every nation with suppliers is a
    cut vertex, while the dense trade core has neither."""
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_nationkey").alias("src"),
        (F.lit(1000) + F.col("s_suppkey")).alias("dst"),
    )
    return _trade_nation_edges(spark, sf_dir).union(s)


def _q_bridges_nation_supplier(spark, sf_dir):
    """Distributed bridges: spanning forest + Euler-tour list ranking
    + XOR-tag subtree covering (linkgraph/bridges.py). Oracle: the
    DEFINITION — per-edge-exclusion recursive reachability."""
    from linkgraph.bridges import bridges
    return bridges(_nation_supplier_edges(spark, sf_dir)).bridges


def _q_articulation_nation_supplier(spark, sf_dir):
    """Cut vertices via distributed Tarjan–Vishkin (linkgraph/
    bridges.py; Euler tour + sparse-table low/high + aux-graph CC).
    Oracle: per-vertex-exclusion neighbor reachability."""
    from linkgraph.bridges import articulation_points
    return articulation_points(_nation_supplier_edges(spark, sf_dir))


def _q_topo_levels_orderchain(spark, sf_dir):
    """Kahn-round topological levels over the order-succession DAG —
    frontier-only max-relaxation, one algorithmic shuffle per round
    (linkgraph/dag.py). Oracle: recursive longest-path CTE."""
    from linkgraph.dag import topological_levels
    res = topological_levels(_orderchain_edges(spark, sf_dir))
    return res.levels.select("id", F.col("level").cast("long").alias("level"))


def _q_condensation_returns(spark, sf_dir):
    """SCC condensation of the returns digraph: distinct inter-component
    edges, acyclic by construction (linkgraph/dag.py)."""
    from linkgraph.dag import condensation
    res = condensation(_returns_digraph(spark, sf_dir))
    return res.comp_edges.select("src", "dst")


def _q_condensation_levels_returns(spark, sf_dir):
    """topological_levels composed over the condensation DAG — the
    'build order with cycles collapsed' query (linkgraph/dag.py)."""
    from linkgraph.dag import condensation, topological_levels
    cond = condensation(_returns_digraph(spark, sf_dir))
    res = topological_levels(cond.comp_edges)
    return res.levels.select("id", F.col("level").cast("long").alias("level"))


def _q_betweenness_nation(spark, sf_dir):
    """Exact Brandes over the (25-node) nation trade graph. Oracle:
    unrolled per-level sigma/delta DP in SQL (same two-pass Brandes
    recurrence the engine evaluates, level CTEs 0..8)."""
    from linkgraph import betweenness_centrality
    res = betweenness_centrality(_trade_nation_edges(spark, sf_dir), direction="BOTH")
    return res.scores.select("id", F.round("centrality", 6).alias("centrality"))


def _q_simrank_nation(spark, sf_dir):
    """Truncated SimRank (4 iterations, C=4/5) over the directed
    nation trade graph (linkgraph/simrank.py). Integer micro-domain
    rounding per round makes the DuckDB unrolled-CTE twin hash-exact."""
    from linkgraph.simrank import simrank
    res = simrank(_trade_nation_edges(spark, sf_dir), direction="OUTGOING", iterations=4)
    return res.pairs


def _q_simrank_sampled_nation(spark, sf_dir):
    """Monte-Carlo single-source SimRank (Fogaras-Rácz meeting-time
    estimator) from nation 0 — the big-graph scale path beside the
    exact truncated fixpoint (linkgraph/simrank.py simrank_sampled):
    hash-argmin reverse walks, first-meeting C^tau weights, half-up
    integer mean. Twin composes the walks oracle with the same SQL."""
    from linkgraph.simrank import simrank_sampled
    return simrank_sampled(
        _trade_nation_edges(spark, sf_dir), 0,
        walk_length=4, walks_per_node=8, direction="BOTH",
    )


def _q_labelspread_trade_nation(spark, sf_dir):
    """Semi-supervised label spreading (Zhu-Ghahramani harmonic
    clamped mean) from 3 seeded nations over the trade graph
    (linkgraph/labelprop.py seeded_label_spread): integer micro-domain
    rounds, argmax (p DESC, label ASC)."""
    from linkgraph.labelprop import seeded_label_spread
    seeds = spark.createDataFrame(
        [(0, 0), (12, 1), (24, 2)], "id long, label long"
    )
    return seeded_label_spread(
        _trade_nation_edges(spark, sf_dir), seeds, iterations=4
    )


def _q_triads_trade_nation(spark, sf_dir):
    """Holland-Leinhardt 16-type directed triad census of the trade
    graph (linkgraph/triads.py): wedge-enumerated >=2-pair triples +
    closed-form one-pair and empty classes. Oracle: INDEPENDENT
    brute-force triple enumeration in SQL."""
    from linkgraph.triads import triad_census
    return triad_census(_trade_nation_edges(spark, sf_dir))


def _q_sgns_trade_nation(spark, sf_dir):
    """Deterministic full-batch SGNS node embeddings trained on the
    trade graph's hash-argmin walk corpus (linkgraph/embeddings.py
    sgns_embeddings): ROUND(sigmoid,7) + BIGINT gradient coefficients
    make the TRAINED vectors bit-exact cross-engine."""
    from linkgraph.embeddings import sgns_embeddings
    return sgns_embeddings(
        _trade_nation_edges(spark, sf_dir), dim=4, walk_length=3,
        walks_per_node=3, window=2, negatives=2, epochs=2, lr=0.2,
    )


def _q_girth_trade_nation(spark, sf_dir):
    """Itai-Rodeh branch-tracked BFS girth witnesses per source over
    the nation trade graph (linkgraph/girth.py): min over sources is
    the girth g or g+1 (odd g exact). Oracle: same first-arrival
    min-branch BFS unrolled + witness probe."""
    from linkgraph.girth import girth
    res = girth(_trade_nation_edges(spark, sf_dir), max_hops=4)
    return res.witnesses


def _q_localcom_trade_nation(spark, sf_dir):
    """ACL-style local community around nation 0: integer micro-domain
    personalized PageRank + minimum-conductance sweep cut
    (linkgraph/localcom.py). Value-exact twin: the identical unrolled
    PPR rounds and window sweep in DuckDB."""
    from linkgraph.localcom import local_community_sweep
    res = local_community_sweep(
        _trade_nation_edges(spark, sf_dir), seed_node=0, iterations=6
    )
    return res.members


def _q_percolation_trade_nation(spark, sf_dir):
    """Triangle (k=3) clique-percolation communities over the nation
    trade graph (linkgraph/percolation.py): overlapping memberships,
    community = min 'a|b|c' triangle key. Oracle: id-ordered triangle
    enumeration + unrolled bipartite min-label propagation."""
    from linkgraph.percolation import clique_percolation
    res = clique_percolation(_trade_nation_edges(spark, sf_dir))
    return res.memberships


def _q_influence_trade_nation(spark, sf_dir):
    """RIS/IMM influence maximization on the nation trade graph
    (linkgraph/influence.py): 24 deterministic hash-derived IC worlds
    at p=1/4, reverse-reachable sets, greedy 3-seed max coverage.
    Oracle: identical worlds + unrolled reachability + greedy SQL."""
    from linkgraph.influence import influence_maximization
    res = influence_maximization(
        _trade_nation_edges(spark, sf_dir), k=3, n_samples=24,
        p_num=1, p_den=4, max_hops=8,
    )
    return res.seeds


def _q_configmodel_trade_nation(spark, sf_dir):
    """Degree-preserving configuration-model rewiring of the nation
    trade graph (linkgraph/graphs.py configuration_model): hash-ordered
    stub pairing, exact degree sequence, deterministic seed."""
    from linkgraph.graphs import configuration_model
    return configuration_model(_trade_nation_edges(spark, sf_dir), seed=11)


def _q_robustness_trade_nation(spark, sf_dir):
    """Targeted-attack robustness profile of the trade graph
    (linkgraph/graphs.py robustness_curve): remove hub prefixes,
    track the giant component — Albert-Jeong-Barabási attack curve."""
    from linkgraph.graphs import robustness_curve
    return robustness_curve(
        _trade_nation_edges(spark, sf_dir), steps=4, frac_per_step=0.12
    )


def _q_forestfire_purchase(spark, sf_dir):
    """Forest-fire sample of the purchase graph from 2 seeds
    (linkgraph/graphs.py forest_fire_sample): per-edge hash burn
    coins, deterministic frontier rounds."""
    from linkgraph.graphs import forest_fire_sample
    return forest_fire_sample(
        purchase_edges(spark, sf_dir), [1, 7], p_num=1, p_den=3, max_rounds=5
    )


def _q_motifsig_trade_nation(spark, sf_dir):
    """Triangle-motif z-score vs the degree-preserving null
    (linkgraph/graphs.py motif_significance): observed triangles
    against 3 configuration-model rewirings, integer moments."""
    from linkgraph.graphs import motif_significance
    return motif_significance(_trade_nation_edges(spark, sf_dir), n_samples=3)


def _q_sparsify_cosupplier(spark, sf_dir):
    """Local-degree sparsifier over the weighted co-supplier graph
    (linkgraph/graphs.py sparsify_local_degree): each node keeps its
    ceil(sqrt(d)) strongest edges, an edge survives if either endpoint
    keeps it. One window shuffle; integer w6 rank; isqrt-exact bound."""
    from linkgraph.graphs import cosupplier_edges, sparsify_local_degree
    return sparsify_local_degree(cosupplier_edges(spark, sf_dir))


def _q_ppr_batch_trade_nation(spark, sf_dir):
    """Batch personalized PageRank — per-seed PPR matrix rows for
    seeds {0, 5, 10} over the directed trade graph, all seeds in one
    (seed, node)-keyed frontier (linkgraph/localcom.py ppr_batch)."""
    from linkgraph.localcom import ppr_batch
    return ppr_batch(
        _trade_nation_edges(spark, sf_dir), [0, 5, 10],
        iterations=6, direction="OUTGOING",
    )


def _q_steiner_trade_nation(spark, sf_dir):
    """KMB Steiner 2-approx backbone over the weighted trade graph
    (linkgraph/mst.py steiner_backbone): batched terminal relax →
    metric closure → canonical-Kruskal MST. Integer-valued weights
    make every path sum exact; ties resolved by the (w, src, dst)
    total order on both engines."""
    from linkgraph.mst import steiner_backbone
    res = steiner_backbone(
        _trade_nation_edges_w(spark, sf_dir), [0, 3, 7, 12, 18], max_hops=6
    )
    return res.backbone


def _q_onion_trade_nation(spark, sf_dir):
    """Onion decomposition of the nation trade graph
    (linkgraph/kcore.py onion_layers): simultaneous peel layers +
    core numbers, pure integer degrees. Oracle: the peel unrolled."""
    from linkgraph.kcore import onion_layers
    res = onion_layers(_trade_nation_edges(spark, sf_dir))
    return res.coreness


def _q_edge_betweenness_nation(spark, sf_dir):
    """Girvan-Newman edge betweenness over the nation trade graph
    (linkgraph/betweenness.py edge_betweenness). Oracle: the node
    oracle's unrolled DP extended with per-level arc credits."""
    from linkgraph.betweenness import edge_betweenness
    res = edge_betweenness(_trade_nation_edges(spark, sf_dir), direction="BOTH")
    return res.scores.select(
        "src", "dst", F.round("centrality", 6).alias("centrality")
    )


def _q_girvan_newman_nation(spark, sf_dir):
    """One Girvan-Newman round on the nation trade graph: cut the 30
    highest-betweenness edges, label the surviving components
    (linkgraph/betweenness.py girvan_newman_split)."""
    from linkgraph.betweenness import girvan_newman_split
    return girvan_newman_split(_trade_nation_edges(spark, sf_dir), k=30)


def _q_apsp_weighted_nation(spark, sf_dir):
    """Weighted APSP via the batched multi-source relax (one job per
    round for ALL sources). Oracle: directed min-plus doubling."""
    from linkgraph import all_shortest_paths_stream
    return all_shortest_paths_stream(
        _trade_nation_edges_w(spark, sf_dir), weighted=True, direction="OUTGOING"
    ).select("source", "target", F.round("distance", 6).alias("distance"))


def _q_wcc_sqlproj_nation(spark, sf_dir):
    """WCC over an edge set DEFINED BY SQL (edges_from_sql — the
    reference's graph:'cypher' projection analog, SURVEY.md §2.3)."""
    from linkgraph import connected_components, edges_from_sql
    for t in ("orders", "lineitem", "customer", "supplier"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    e = edges_from_sql(spark, TRADE_NATION_SQL)
    return connected_components(e).components.select("id", "comp")


def _q_mst_cosupplier(spark, sf_dir):
    """Borůvka MSF. Oracle: canonical-Kruskal membership via minimax
    edge-order doubling (edge in MSF iff no path of strictly earlier
    edges connects its endpoints) — edge_count and total_weight are
    MSF-invariant, so the engine's own tie-breaks don't matter."""
    from linkgraph import minimum_spanning_forest
    res = minimum_spanning_forest(cosupplier_edges(spark, sf_dir))
    return res.tree_edges.agg(
        F.count("*").alias("edge_count"),
        F.round(F.sum("weight"), 6).alias("total_weight"),
    )


def _q_numeric_guards_orders(spark, sf_dir):
    """algo.isFinite / algo.isInfinite analogs (linkgraph/registry.py)
    over a column seeded with +-Infinity / NaN / NULL lanes — a genuine
    cross-engine check of the IEEE special-value semantics the guards
    encode (Spark's NaN handling differs from DuckDB's in enough places
    that this is not a tautology)."""
    from linkgraph import is_finite, is_infinite
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lane = F.col("o_orderkey") % 5
    v = (
        F.when(lane == 0, F.lit(float("inf")))
        .when(lane == 1, F.lit(float("-inf")))
        .when(lane == 2, F.lit(float("nan")))
        .when(lane == 3, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
    )
    d = o.select(F.col("o_orderkey").alias("id"), v.alias("v"))
    return d.select(
        "id",
        is_finite(F.col("v")).alias("finite"),
        is_infinite(F.col("v")).alias("infinite"),
    )


def _q_kspanning_cosupplier(spark, sf_dir):
    """algo.spanningTree.kmin analog: canonical-Kruskal MST (unique
    under the strict (weight,src,dst) total order the engine's Borůvka
    uses), cut the 3 lexicographically-largest tree edges -> 4(+)
    clusters. Value-exact: tree, cut and min-id cluster labels are all
    deterministic, so the oracle reproduces the assignment row-for-row."""
    from linkgraph import k_spanning_tree
    res = k_spanning_tree(cosupplier_edges(spark, sf_dir), k=4, mode="kmin")
    return res.assignment.select("id", "cluster")


def _attr_assortativity_sql_wrapped() -> str:
    from linkgraph.graphs import COSUPPLIER_EDGES_SQL, attr_assortativity_sql
    return attr_assortativity_sql(
        COSUPPLIER_EDGES_SQL,
        "SELECT s_suppkey AS id, s_nationkey AS label FROM supplier",
    )


def _assortativity_sql_wrapped() -> str:
    from linkgraph.graphs import DEGREE_ASSORTATIVITY_SQL_TEMPLATE
    return DEGREE_ASSORTATIVITY_SQL_TEMPLATE.format(edges=PURCHASE_EDGES_SQL)


def _richclub_sql_wrapped() -> str:
    from linkgraph.graphs import RICH_CLUB_SQL_TEMPLATE
    return RICH_CLUB_SQL_TEMPLATE.format(edges=COSUPPLIER_EDGES_SQL)


def _reciprocity_sql_wrapped() -> str:
    from linkgraph.graphs import RECIPROCITY_SQL_TEMPLATE
    return RECIPROCITY_SQL_TEMPLATE.format(edges=TRADE_NATION_SQL)


def _induced_sql_wrapped() -> str:
    from linkgraph.graphs import induced_subgraph_sql
    return induced_subgraph_sql(COSUPPLIER_EDGES_SQL, 0.5, seed=3)


def _linkpred_auc_sql_wrapped() -> str:
    from linkgraph.similarity import link_prediction_auc_sql
    return link_prediction_auc_sql(
        PURCHASE_EDGES_SQL, method="common_neighbors",
        holdout_den=5, neg_draws=128,
    )


def _nodesim_lsh_sql_wrapped() -> str:
    from linkgraph.similarity import node_similarity_lsh_sql
    nbr = (
        f"SELECT DISTINCT e.dst AS src, e.src AS nbr FROM ({PURCHASE_EDGES_SQL}) e"
    )
    return node_similarity_lsh_sql(nbr, bands=16, min_similarity=0.2)


def _ngram_novelty_sql_wrapped() -> str:
    from linkgraph.pipeline.text import ngram_novelty_sql
    return ngram_novelty_sql(n=3)


AHASH_AUG_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000,
       substr(text, 1, 10) || 'X' || substr(text, 12)
FROM documents WHERE doc_id % 5 = 0 AND length(text) >= 64
"""


def _ahash_sql_wrapped() -> str:
    from linkgraph.pipeline.multimodal import image_ahash_sql
    return image_ahash_sql("documents")


def _ahash_pairs_sql_wrapped() -> str:
    from linkgraph.pipeline.multimodal import ahash_pairs_sql
    return ahash_pairs_sql(3, table=f"({AHASH_AUG_SQL})")


def _cross_contamination_sql_wrapped() -> str:
    from linkgraph.pipeline.dedup import cross_jaccard_sql
    return cross_jaccard_sql("doc_id % 7 = 0", n=3, threshold=0.8)


def _dup_spans_sql_wrapped() -> str:
    from linkgraph.pipeline.dedup import duplicate_spans_sql
    return duplicate_spans_sql(k=6)


def _earliest_arrival_sql_wrapped() -> str:
    from linkgraph.temporal import earliest_arrival_sql
    return earliest_arrival_sql(TEMPORAL_RETURNS_SQL, "0", start_ts=0)


def _earliest_arrival_weighted_sql_wrapped() -> str:
    from linkgraph.temporal import earliest_arrival_sql
    dur_edges = (
        "SELECT src, dst, ts, CASE WHEN src < 1000000 THEN 7 ELSE 3 END AS dur"
        f" FROM ({TEMPORAL_RETURNS_SQL}) t"
    )
    return earliest_arrival_sql(dur_edges, "0", start_ts=0, with_duration=True)


def _latest_departure_sql_wrapped() -> str:
    from linkgraph.temporal import latest_departure_sql
    return latest_departure_sql(TEMPORAL_RETURNS_SQL, "0", deadline=5000)


def _densest_sql_wrapped() -> str:
    from linkgraph.densest import densest_subgraph_sql
    return densest_subgraph_sql(PURCHASE_EDGES_SQL, eps=0.5, rounds=16)


def _matching_sql_wrapped() -> str:
    from linkgraph.matching import maximal_matching_sql
    return maximal_matching_sql(COSUPPLIER_EDGES_SQL, rounds=12)


def _bridges_sql_wrapped() -> str:
    from linkgraph.bridges import bridges_sql
    return bridges_sql(NATION_SUPPLIER_SQL)


def _articulation_sql_wrapped() -> str:
    from linkgraph.bridges import articulation_points_sql
    return articulation_points_sql(NATION_SUPPLIER_SQL)


def _topo_orderchain_sql() -> str:
    from linkgraph.dag import topological_levels_sql
    sql = topological_levels_sql(ORDERCHAIN_SQL)
    return sql.replace(
        "MAX(level) AS level", "CAST(MAX(level) AS BIGINT) AS level"
    )


def _condensation_returns_sql() -> str:
    from linkgraph.dag import condensation_sql
    return condensation_sql(RETURNS_DIGRAPH_SQL)


def _condensation_levels_returns_sql() -> str:
    from linkgraph.dag import condensation_levels_sql
    sql = condensation_levels_sql(RETURNS_DIGRAPH_SQL)
    return sql.replace(
        "MAX(level) AS level", "CAST(MAX(level) AS BIGINT) AS level"
    )


def _eigenvector_sql_wrapped() -> str:
    from linkgraph.eigenvector import eigenvector_sql
    return eigenvector_sql(PURCHASE_EDGES_SQL, 5, direction="BOTH")


def _weighted_nodesim_sql_wrapped(metric: str) -> str:
    from linkgraph.similarity import weighted_node_similarity_sql
    return weighted_node_similarity_sql(
        COSUPPLIER_EDGES_SQL, metric, direction="BOTH"
    )


def _degree_weighted_sql_wrapped() -> str:
    from linkgraph.graphs import degree_centrality_sql
    return degree_centrality_sql(COSUPPLIER_EDGES_SQL, direction="BOTH", weighted=True)


def _fastrp_sql_wrapped() -> str:
    from linkgraph.embeddings import fastrp_sql
    return fastrp_sql(PURCHASE_EDGES_SQL, dim=8, iterations=2,
                      weights=[1, 2], seed=42)


def _feature_prop_sql_wrapped() -> str:
    from linkgraph.embeddings import propagate_features_sql
    from linkgraph.graphs import PURCHASE_NODE_FEATURES_SQL
    return propagate_features_sql(
        PURCHASE_EDGES_SQL, PURCHASE_NODE_FEATURES_SQL, dim=2, rounds=2,
        exploded=True,
    )


def _kcenter_sql_wrapped() -> str:
    from linkgraph.pipeline import kcenter_select_sql
    return kcenter_select_sql(dim=64, k=8)


def _bpe_census_sql_wrapped() -> str:
    from linkgraph.pipeline import bpe_token_census_sql
    return bpe_token_census_sql(n_merges=8)


def _bpe_tokenize_sql_wrapped() -> str:
    from linkgraph.pipeline import bpe_tokenize_sql
    return bpe_tokenize_sql(n_merges=8)


def _length_quantiles_sql_wrapped() -> str:
    from linkgraph.pipeline import length_quantiles_sql
    return length_quantiles_sql()


def _hll_sql_wrapped() -> str:
    from linkgraph.pipeline import hll_distinct_sql
    return hll_distinct_sql(by="lang", b=9)


def _countmin_sql_wrapped() -> str:
    from linkgraph.pipeline import countmin_estimate_sql
    return countmin_estimate_sql(k=20, d=4, w=1024)


def _bpe_sql_wrapped() -> str:
    from linkgraph.pipeline import bpe_learn_sql
    return bpe_learn_sql(n_merges=8)


def _fastrp_knn_sql_wrapped() -> str:
    from linkgraph.embeddings import fastrp_knn_sql
    return fastrp_knn_sql(PURCHASE_EDGES_SQL, query_mod=97, k=5, dim=8,
                          iterations=2, weights=[1, 2], seed=42)


def _hits_sql_wrapped() -> str:
    from linkgraph.eigenvector import hits_sql
    return hits_sql(PURCHASE_EDGES_SQL, 5)


def _salsa_sql_wrapped() -> str:
    from linkgraph.eigenvector import salsa_sql
    return salsa_sql(PURCHASE_EDGES_SQL, 5)


def _katz_sql_wrapped() -> str:
    from linkgraph.eigenvector import katz_sql
    return katz_sql(PURCHASE_EDGES_SQL, 5, alpha=0.005, beta=1.0,
                    direction="BOTH")


def _keep_caches(out, res):
    """Propagate attach_caches handles through a driver-side select so
    the oracle harness's release_caches frees the walk/superstep
    frames (a bare .select drops the attribute)."""
    from linkgraph.checkpoint import attach_caches
    return attach_caches(out, getattr(res, "_linkgraph_caches", []))


def _walks_sql_wrapped() -> str:
    from linkgraph.walks import random_walks_sql
    inner = random_walks_sql(COSUPPLIER_EDGES_SQL, 4, walks_per_node=2, seed=0,
                             direction="BOTH")
    return f"""
SELECT start, CAST(walk_no AS BIGINT) AS walk_no,
       CAST(step AS BIGINT) AS step, node
FROM ({inner})
"""


def _walk_sequences_sql() -> str:
    from linkgraph.walks import random_walks_sql
    inner = random_walks_sql(COSUPPLIER_EDGES_SQL, 6, walks_per_node=1, seed=1,
                             direction="BOTH")
    return f"""
SELECT start, CAST(walk_no AS BIGINT) AS walk_no, COUNT(*) AS length,
       string_agg(CAST(node AS VARCHAR), ' ' ORDER BY step) AS sequence
FROM ({inner})
GROUP BY start, walk_no
"""


def _node2vec_sql_wrapped() -> str:
    from linkgraph.walks import node2vec_walks_sql
    inner = node2vec_walks_sql(COSUPPLIER_EDGES_SQL, 4, p=2.0, q=0.5,
                               walks_per_node=1, seed=2, direction="BOTH")
    return f"""
SELECT start, CAST(walk_no AS BIGINT) AS walk_no,
       CAST(step AS BIGINT) AS step, node
FROM ({inner})
"""


def _q_node2vec_cosupplier(spark, sf_dir):
    """node2vec biased second-order walks (p=2 return-averse, q=0.5
    DFS-leaning). The weighted draw is deterministic by construction
    (dst-ordered prefix sums are bit-identical across engines; the
    uniform is an exact 2^-53-granular double), so the oracle replays
    every step value-exactly."""
    from linkgraph.walks import node2vec_walks
    res = node2vec_walks(
        cosupplier_edges(spark, sf_dir),
        walk_length=4,
        p=2.0,
        q=0.5,
        walks_per_node=1,
        seed=2,
        direction="BOTH",
    )
    return _keep_caches(
        res.select(
            "start",
            F.col("walk_no").cast("long").alias("walk_no"),
            F.col("step").cast("long").alias("step"),
            "node",
        ),
        res,
    )


def _q_pq_encode(spark, sf_dir):
    """Product-quantization codes over the embeddings table (8
    subspaces x 16 codes — the compressed ANN index layout)."""
    from linkgraph.pipeline.simsearch import pq_encode
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pq_encode(emb, m=8, n_centroids=16)


def _q_quantize_embeddings(spark, sf_dir):
    """Int8 scalar quantization of the embeddings table (relational
    long form with dequantized values for reconstruction queries)."""
    from linkgraph.pipeline.simsearch import quantize_embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantize_embeddings(emb)


def _q_pagerank_coproject(spark, sf_dir):
    """Composition demo: weighted PageRank DIRECTLY over the
    bipartite projection's output frame — projection, edge weighting,
    and all supersteps are one lazy Catalyst plan; the oracle nests
    the projection SQL inside the unrolled PageRank recurrence."""
    from linkgraph.pagerank import pagerank
    from linkgraph.similarity import bipartite_projection
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("src"), F.col("l_orderkey").alias("dst")
    )
    proj = bipartite_projection(li).select(
        F.col("node1").alias("src"),
        F.col("node2").alias("dst"),
        F.col("weight").cast("double").alias("weight"),
    )
    res = pagerank(proj, damping=DAMPING, max_iter=5, weighted=True)
    return res.scores.select("id", F.round("rank", 6).alias("rank"))


def _q_transitivity_cosupplier(spark, sf_dir):
    """Global transitivity (3T/W) from the triangle counts frame:
    corner and wedge totals are integer sums — only the final ratio
    is floating point."""
    from linkgraph.checkpoint import attach_caches
    from linkgraph.triangles import triangle_count
    res = triangle_count(cosupplier_edges(spark, sf_dir))
    m = res.counts.agg(
        F.sum("triangles").alias("corners_sum"),
        F.sum(F.col("degree") * (F.col("degree") - 1)).alias("w2"),
    )
    out = m.select(
        F.col("corners_sum").alias("triangle_corners"),
        (F.col("w2") / 2).cast("long").alias("wedges"),
        F.round(
            F.col("corners_sum").cast("double")
            / (F.col("w2").cast("double") / F.lit(2.0)),
            6,
        ).alias("transitivity"),
    )
    return attach_caches(out, res._caches)


def _q_richclub_cosupplier(spark, sf_dir):
    """Rich-club coefficient phi(k) over the co-supplier graph — the
    hub-structure probe (integer suffix sums, exact final ratio;
    linkgraph/graphs.py#rich_club_coefficients)."""
    from linkgraph.graphs import rich_club_coefficients
    return rich_club_coefficients(cosupplier_edges(spark, sf_dir))


def _q_reciprocity_trade(spark, sf_dir):
    """Directed reciprocity of the nation trade graph: fraction of
    trade relations that flow both ways (integer pair-orientation
    counts; linkgraph/graphs.py#reciprocity)."""
    from linkgraph.graphs import reciprocity
    return reciprocity(_trade_nation_edges(spark, sf_dir))


def _q_assortativity_purchase(spark, sf_dir):
    """Degree-correlation coefficient of the purchase graph — every
    moment is an exact integer sum (order-free), only the final
    Pearson ratio is floating point."""
    from linkgraph.graphs import degree_assortativity
    return degree_assortativity(purchase_edges(spark, sf_dir))


def _q_attr_assortativity(spark, sf_dir):
    """Categorical attribute assortativity (Newman 2003): do
    co-suppliers mix within or across nations? Integer mixing-matrix
    moments, one float ratio (linkgraph/graphs.py)."""
    from linkgraph.graphs import attr_assortativity, cosupplier_edges

    labels = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("id"), F.col("s_nationkey").alias("label")
    )
    return attr_assortativity(cosupplier_edges(spark, sf_dir), labels)


def _q_induced_subgraph_cosupplier(spark, sf_dir):
    """Node-induced subgraph sample: inline hash predicate on both
    endpoints — no join, no node table, pushes down to the scan."""
    from linkgraph.graphs import induced_subgraph
    return induced_subgraph(cosupplier_edges(spark, sf_dir), 0.5, seed=3)


def _q_coproject_cosupplier(spark, sf_dir):
    """Bipartite co-occurrence projection (the general operator behind
    the cosupplier fixture graph): project (supplier -> order) edges
    over shared orders. The oracle is the INDEPENDENT SQL formulation
    used by the fixture builder — two formulations, one result."""
    from linkgraph.similarity import bipartite_projection
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        F.col("l_suppkey").alias("src"), F.col("l_orderkey").alias("dst")
    )
    return bipartite_projection(li)


def _q_hits_purchase(spark, sf_dir):
    """HITS hubs & authorities on the directed purchase graph:
    customers are pure hubs, suppliers pure authorities (bipartite),
    so the scores ARE the normalized purchase-intensity profile."""
    from linkgraph.eigenvector import hits
    res = hits(purchase_edges(spark, sf_dir), max_iter=5)
    return _keep_caches(
        res.select(
            "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
        ),
        res,
    )


def _q_salsa_purchase(spark, sf_dir):
    """SALSA (Lempel-Moran; algo.hits lineage, degree-normalized
    bipartite walk) on the directed purchase graph: the transient
    after 5 a-then-h rounds pins the walk mixing per component
    (linkgraph/eigenvector.py#salsa)."""
    from linkgraph.eigenvector import salsa
    res = salsa(purchase_edges(spark, sf_dir), max_iter=5)
    return _keep_caches(
        res.select(
            "id", F.round("hub", 6).alias("hub"), F.round("auth", 6).alias("auth")
        ),
        res,
    )


def _q_katz_purchase(spark, sf_dir):
    """Katz centrality: truncated attenuated path-count series — the
    affine recurrence needs NO global normalizer (one groupBy(dst)
    shuffle per round and nothing else)."""
    from linkgraph.eigenvector import katz_centrality
    res = katz_centrality(
        purchase_edges(spark, sf_dir), alpha=0.005, beta=1.0, max_iter=5,
        direction="BOTH",
    )
    return _keep_caches(
        res.select("id", F.round("score", 6).alias("score")), res
    )


def _q_eigenvector_purchase(spark, sf_dir):
    """Eigenvector centrality (the centrality family's classical
    root): 5 power-iteration supersteps on the undirected purchase
    graph, Linf-normalized per round (max is exact cross-engine,
    unlike an L2 float sum — linkgraph/eigenvector.py)."""
    from linkgraph.eigenvector import eigenvector_centrality
    res = eigenvector_centrality(
        purchase_edges(spark, sf_dir), max_iter=5, direction="BOTH"
    )
    return _keep_caches(
        res.select("id", F.round("score", 6).alias("score")), res
    )


def _q_fastrp_purchase(spark, sf_dir):
    """FastRP node embeddings (engine extension; Chen et al. 2019):
    dim-8, 2 iterations, deterministic integer-exact variant on the
    undirected purchase graph — every component is a BIGINT path-count
    sum, so the DuckDB oracle is value-exact (linkgraph/embeddings.py)."""
    from linkgraph.embeddings import fastrp_embeddings

    return fastrp_embeddings(
        purchase_edges(spark, sf_dir), dim=8, iterations=2, weights=[1, 2], seed=42
    )


def _q_feature_prop_purchase(spark, sf_dir):
    """K-hop feature smoothing (SGC-style GNN preprocessing): 2 rounds
    of closed-neighborhood means of [acctbal, nationkey] over the
    undirected purchase graph — iterative float pass made value-exact
    through the 6-decimal integer domain (linkgraph/embeddings.py)."""
    from linkgraph.embeddings import propagate_features
    from linkgraph.graphs import purchase_node_features

    return propagate_features(
        purchase_edges(spark, sf_dir),
        purchase_node_features(spark, sf_dir),
        dim=2,
        rounds=2,
        exploded=True,
    )


def _q_fastrp_knn_purchase(spark, sf_dir):
    """Composition: FastRP embeddings -> exact top-5 cosine neighbors
    for the id % 97 == 0 query nodes (broadcast query side, integer
    dot products — linkgraph/embeddings.py#fastrp_knn)."""
    from linkgraph.embeddings import fastrp_knn

    return fastrp_knn(
        purchase_edges(spark, sf_dir), query_mod=97, k=5, dim=8,
        iterations=2, weights=[1, 2], seed=42,
    )


def _weighted_walks_sql_wrapped() -> str:
    from linkgraph.walks import weighted_walks_sql
    inner = weighted_walks_sql(COSUPPLIER_EDGES_SQL, 4, walks_per_node=1,
                               seed=4, direction="BOTH")
    return f"""
SELECT start, CAST(walk_no AS BIGINT) AS walk_no,
       CAST(step AS BIGINT) AS step, node
FROM ({inner})
"""


def _q_weighted_walks_cosupplier(spark, sf_dir):
    """Edge-weight-biased walks over the cosupplier graph (weight =
    co-order count): the same bit-exact prefix-sum draw as node2vec,
    with the edge weight as the measure."""
    from linkgraph.walks import weighted_walks
    res = weighted_walks(
        cosupplier_edges(spark, sf_dir), walk_length=4, walks_per_node=1,
        seed=4, direction="BOTH",
    )
    return _keep_caches(
        res.select(
            "start",
            F.col("walk_no").cast("long").alias("walk_no"),
            F.col("step").cast("long").alias("step"),
            "node",
        ),
        res,
    )


def _q_linkpred_auc_cosupplier(spark, sf_dir):
    """Hold-out link-prediction AUC on the sparse purchase graph
    (linkgraph/similarity.py link_prediction_auc): hash 1/5 split,
    common-neighbor scores on the training graph, hash-drawn
    negatives, exact midrank statistic. (The co-supplier graph is
    near-complete — no non-edges to draw.)"""
    from linkgraph.graphs import purchase_edges
    from linkgraph.similarity import link_prediction_auc
    return link_prediction_auc(
        purchase_edges(spark, sf_dir), method="common_neighbors",
        holdout_den=5, neg_draws=128,
    )


def _q_linkpred_purchase(spark, sf_dir):
    """Adamic-Adar link prediction on the undirected purchase graph,
    feature_cap=50 (drops supplier hub features whose fan-out
    dominates cost and whose per-pair weight ~1/ln(300) carries least
    signal — the documented production knob), global top-100."""
    from linkgraph.similarity import link_prediction
    return link_prediction(
        purchase_edges(spark, sf_dir),
        method="adamic_adar",
        feature_cap=50,
        top_n=100,
    )


def _q_nodesim_lsh_suppliers(spark, sf_dir):
    """MinHash-banded node similarity (the 100TB all-pairs path):
    suppliers by shared customer base, 32 hashes / 16 bands, verified
    pairs >= 0.2 (linkgraph/similarity.py node_similarity_lsh). The
    oracle replicates the FULL deterministic LSH machinery in SQL —
    signatures, band keys, candidate join, exact verify."""
    from linkgraph.similarity import node_similarity_lsh
    return node_similarity_lsh(
        purchase_edges(spark, sf_dir),
        metric="jaccard",
        direction="INCOMING",
        bands=16,
        min_similarity=0.2,
    )


def _q_nodesim_suppliers(spark, sf_dir):
    """Node similarity (neo4j algo.similarity.jaccard lineage,
    SURVEY.md §2.2): suppliers scored by shared customer base —
    Jaccard over INCOMING neighbor sets of the purchase graph. One
    co-neighbor shuffle, no crossJoin (linkgraph/similarity.py)."""
    from linkgraph.similarity import node_similarity
    return node_similarity(
        purchase_edges(spark, sf_dir),
        metric="jaccard",
        direction="INCOMING",
        min_similarity=0.24,
    )


def _q_nodesim_pearson_cosupplier(spark, sf_dir):
    """algo.similarity.pearson analog: co-suppliers correlated over
    their weighted co-order vectors (dense missing-as-0 semantics over
    the global feature dimension; 6-decimal fixed-point exact
    aggregates — linkgraph/similarity.py#weighted_node_similarity)."""
    from linkgraph.similarity import weighted_node_similarity

    return weighted_node_similarity(
        cosupplier_edges(spark, sf_dir), metric="pearson", direction="BOTH"
    )


def _q_nodesim_euclidean_cosupplier(spark, sf_dir):
    """algo.similarity.euclidean analog: pair distances via the sparse
    identity ||a-b||^2 = q_a + q_b - 2<a,b> on integer fixed-point
    aggregates (linkgraph/similarity.py#weighted_node_similarity)."""
    from linkgraph.similarity import weighted_node_similarity

    return weighted_node_similarity(
        cosupplier_edges(spark, sf_dir), metric="euclidean", direction="BOTH"
    )


def _q_nodesim_topk_cosupplier(spark, sf_dir):
    """nodeSimilarity topK contract: each supplier's 3 most similar
    co-suppliers by neighbor-set cosine, deterministic tie-break on
    the peer id."""
    from linkgraph.similarity import node_similarity_topk
    res = node_similarity_topk(
        cosupplier_edges(spark, sf_dir), k=3, metric="cosine", direction="BOTH"
    )
    return res.select("node", "other", "similarity", F.col("rank").cast("long").alias("rank"))


def _q_walks_cosupplier(spark, sf_dir):
    """Deterministic random walks (DeepWalk corpus generator,
    linkgraph/walks.py): hash-argmin successor choice makes the walk
    set a pure function of (graph, seed) — exact-oracle-able across
    engines. One shuffle per step, frontier bounded forever."""
    from linkgraph.walks import random_walks
    res = random_walks(
        cosupplier_edges(spark, sf_dir),
        walk_length=4,
        walks_per_node=2,
        seed=0,
        direction="BOTH",
    )
    return _keep_caches(
        res.select(
            "start",
            F.col("walk_no").cast("long").alias("walk_no"),
            F.col("step").cast("long").alias("step"),
            "node",
        ),
        res,
    )


def _q_walk_sequences_cosupplier(spark, sf_dir):
    """Walk rows collapsed to one training sequence per walk — the
    node2vec/DeepWalk text-corpus export."""
    from linkgraph.walks import random_walks, walks_as_sequences
    res = walks_as_sequences(
        random_walks(
            cosupplier_edges(spark, sf_dir),
            walk_length=6,
            walks_per_node=1,
            seed=1,
            direction="BOTH",
        )
    )
    return _keep_caches(
        res.select(
            "start", F.col("walk_no").cast("long").alias("walk_no"),
            "length", "sequence",
        ),
        res,
    )


# --------------------------------------------- training-data pipeline

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _q_exact_dedup(spark, sf_dir):
    from linkgraph.pipeline import exact_dedup
    return exact_dedup(_docs(spark, sf_dir))


def _q_jaccard_pairs(spark, sf_dir):
    from linkgraph.pipeline import jaccard_pairs
    return jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


def _q_dup_spans(spark, sf_dir):
    """ExactSubstr duplicated-span detection (Lee et al. 2022) at
    window granularity k=6 — per-doc maximal token spans whose every
    k-window repeats corpus-wide (linkgraph/pipeline/dedup.py)."""
    from linkgraph.pipeline.dedup import duplicate_spans
    return duplicate_spans(_docs(spark, sf_dir), k=6)


def _ahash_assets(spark, sf_dir, with_variants: bool):
    """Asset table for perceptual hashing: payload = utf-8 text; with
    variants, every 5th doc gains a same-length single-char-substituted
    twin (id + 1e6) — a deterministic near-duplicate both engines
    construct identically."""
    docs = _docs(spark, sf_dir)
    base = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    if not with_variants:
        return base
    var = (
        docs.filter((F.col("doc_id") % 5 == 0) & (F.length("text") >= 64))
        .select(
            (F.col("doc_id") + 1_000_000).alias("asset_id"),
            F.encode(
                F.concat(
                    F.substring("text", 1, 10), F.lit("X"), F.expr("substr(text, 12)")
                ),
                "UTF-8",
            ).alias("payload"),
        )
    )
    return base.union(var)


def _q_multimodal_ahash(spark, sf_dir):
    """64-bit perceptual average-hash per asset (fake locality-
    preserving grid — linkgraph/pipeline/multimodal.py image_ahash;
    the real PNG path is pytest-round-trip-tested)."""
    from linkgraph.pipeline.multimodal import image_ahash
    return image_ahash(_ahash_assets(spark, sf_dir, with_variants=False))


def _q_multimodal_ahash_pairs(spark, sf_dir):
    """Perceptual near-dup pairs: chunk-banded Hamming <= 3 join over
    aHash strings, exercised on planted same-length variants
    (multimodal.py ahash_pairs)."""
    from linkgraph.pipeline.multimodal import ahash_pairs, image_ahash
    h = image_ahash(_ahash_assets(spark, sf_dir, with_variants=True))
    return ahash_pairs(h, max_hamming=3)


def _q_cross_contamination(spark, sf_dir):
    """Fuzzy train/eval contamination: MinHash-banded cross-corpus
    near-dup pairs of documents vs the doc_id%7 benchmark slice
    (linkgraph/pipeline/dedup.py cross_minhash_pairs). Oracle: brute
    cross Jaccard (LSH miss probability ~1e-9 at these params)."""
    from linkgraph.pipeline.dedup import cross_minhash_pairs
    docs = _docs(spark, sf_dir)
    return cross_minhash_pairs(
        docs, docs.filter("doc_id % 7 = 0"), n=3, threshold=0.8
    )


def _q_source_overlap(spark, sf_dir):
    """Cross-source n-gram overlap audit (linkgraph/pipeline/dedup.py
    source_overlap): per source-pair intersection / Jaccard /
    containment over 60-bit gram hashes — raw text never shuffles."""
    from linkgraph.pipeline.dedup import source_overlap
    return source_overlap(_docs(spark, sf_dir))


def _q_minhash_lsh(spark, sf_dir):
    from linkgraph.pipeline import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


def _q_near_dup_clusters(spark, sf_dir):
    """Near-dup pairs collapsed to transitive clusters — the pair
    table is an edge table, clustering IS connected_components()."""
    from linkgraph.pipeline import minhash_lsh_pairs, near_dup_clusters
    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, n=3, threshold=0.8)
    return near_dup_clusters(pairs, docs)


def _dedup_report_sql_wrapped() -> str:
    from linkgraph.pipeline.dedup import dedup_report_sql, jaccard_pairs_sql
    return dedup_report_sql(jaccard_pairs_sql(n=3, threshold=0.8))


def _q_dedup_report(spark, sf_dir):
    """One-row corpus dedup report: docs/bytes removed, cluster-size
    extremes (pipeline/dedup.py#dedup_report — composes the LSH pair
    table with the component clustering)."""
    from linkgraph.pipeline import minhash_lsh_pairs
    from linkgraph.pipeline.dedup import dedup_report
    docs = _docs(spark, sf_dir)
    return dedup_report(minhash_lsh_pairs(docs, n=3, threshold=0.8), docs)


def _q_canonical_pick(spark, sf_dir):
    """Dedup decision step: clusters -> keep ONE representative per
    cluster (longest doc, tie lowest id)."""
    from linkgraph.pipeline import minhash_lsh_pairs, near_dup_clusters, pick_canonical
    docs = _docs(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, n=3, threshold=0.8)
    return pick_canonical(near_dup_clusters(pairs, docs), docs)


def _q_semantic_dedup(spark, sf_dir):
    """SemDeDup: cluster-bounded embedding near-dup pairs."""
    from linkgraph.pipeline import semantic_dedup_pairs
    return semantic_dedup_pairs(_emb(spark, sf_dir), n_clusters=16, threshold=0.4)


def _q_chunk_documents(spark, sf_dir):
    """Within-doc sliding-window token chunking (chunk 64, stride 48 —
    overlapping long-context windows); map-only, composes with the
    scan (linkgraph/pipeline/curate.py#chunk_documents)."""
    from linkgraph.pipeline.curate import chunk_documents
    return chunk_documents(_docs(spark, sf_dir), chunk_len=64, stride=48)


def _q_corpus_prep(spark, sf_dir):
    """Composed end-to-end pipeline: near-dup pick + quality gate +
    token accounting in one lazy plan."""
    from linkgraph.pipeline import corpus_prep
    return corpus_prep(_docs(spark, sf_dir), n=3, threshold=0.8, min_quality=0.5)


def _q_corpus_prep_lm(spark, sf_dir):
    """Composition: the corpus_prep survivors annotated with the
    bigram-LM cross-entropy — dedup pick, quality gate, token
    accounting, and the CCNet-style perplexity signal in ONE lazy
    Catalyst plan (no intermediate materialization)."""
    from linkgraph.pipeline import corpus_prep
    from linkgraph.pipeline.text import perplexity_scores
    docs = _docs(spark, sf_dir)
    base = corpus_prep(docs, n=3, threshold=0.8, min_quality=0.5)
    ppl = perplexity_scores(docs, n=2, k=1.0).select("doc_id", "cross_entropy")
    return _keep_caches(base.join(ppl, "doc_id"), base)


def _q_simhash(spark, sf_dir):
    from linkgraph.pipeline import simhash_table
    return simhash_table(_docs(spark, sf_dir), bits=32)


def _q_simhash_pairs(spark, sf_dir):
    from linkgraph.pipeline import simhash_pairs
    from pyspark.sql import functions as SF
    return simhash_pairs(_docs(spark, sf_dir), bits=32, max_hamming=3).select(
        "d1", "d2", SF.col("hamming").cast("long").alias("hamming")
    )


def _q_token_stats(spark, sf_dir):
    from linkgraph.pipeline import token_stats
    return token_stats(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_word_tokens").cast("long").alias("n_word_tokens"),
        "avg_token_len", "uniq_ratio",
    )


def _q_quality(spark, sf_dir):
    from linkgraph.pipeline import quality_scores
    return quality_scores(_docs(spark, sf_dir))


def _q_langid(spark, sf_dir):
    from linkgraph.pipeline import language_id
    return language_id(_docs(spark, sf_dir))


def _q_ngram_novelty(spark, sf_dir):
    """Per-doc fraction of corpus-unique word 3-grams
    (linkgraph/pipeline/text.py ngram_novelty)."""
    from linkgraph.pipeline.text import ngram_novelty
    return ngram_novelty(_docs(spark, sf_dir), n=3)


def _q_fingerprints(spark, sf_dir):
    from linkgraph.pipeline import fingerprints
    return fingerprints(_docs(spark, sf_dir), k=16)


def _q_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals."""
    from linkgraph.pipeline import repetition_scores
    return repetition_scores(_docs(spark, sf_dir))


def _q_c4_clean(spark, sf_dir):
    """C4 page cleaning: terminal-punctuation line retention + page
    gates (lorem ipsum / brace / min sentences), map-only
    (linkgraph/pipeline/text.py)."""
    from linkgraph.pipeline.text import c4_clean
    return c4_clean(_docs(spark, sf_dir))


def _quality_classifier_sql() -> str:
    from linkgraph.pipeline.classifier import train_quality_classifier_sql
    return train_quality_classifier_sql(epochs=6, lr=0.5)


def _q_calibration_report(spark, sf_dir):
    """Reliability-diagram buckets for the trained quality classifier
    (pipeline/classifier.py#calibration_report)."""
    from linkgraph.pipeline.classifier import calibration_report
    return calibration_report(_docs(spark, sf_dir), epochs=6, lr=0.5)


def _calibration_report_sql() -> str:
    from linkgraph.pipeline.classifier import calibration_report_sql
    return calibration_report_sql(epochs=6, lr=0.5)


def _q_dbh_partition(spark, sf_dir):
    """DBH vertex-cut edge partitioning of the co-supplier graph —
    the PowerGraph-family placement (linkgraph/partition.py)."""
    from linkgraph.partition import edge_partition_dbh
    return edge_partition_dbh(cosupplier_edges(spark, sf_dir), k=4, seed=1)


def _dbh_partition_sql() -> str:
    from linkgraph.partition import edge_partition_dbh_sql
    return edge_partition_dbh_sql(COSUPPLIER_EDGES_SQL, k=4, seed=1)


def _q_quality_classifier(spark, sf_dir):
    """Full-batch logistic quality classifier trained end-to-end on
    the documents table (weak labels lang='en'), SGNS-style integer
    gradient discipline (linkgraph/pipeline/classifier.py)."""
    from linkgraph.pipeline.classifier import train_quality_classifier
    res = train_quality_classifier(_docs(spark, sf_dir), epochs=6, lr=0.5)
    return res.scores


def _q_gopher_quality(spark, sf_dir):
    """Gopher quality gates (word count / mean word length / symbol
    ratio / bullet & ellipsis lines / alpha words / stopword hits),
    map-only (linkgraph/pipeline/text.py#gopher_quality)."""
    from linkgraph.pipeline.text import gopher_quality
    return gopher_quality(_docs(spark, sf_dir))


def _q_dup_structure(spark, sf_dir):
    """Gopher structural repetition: duplicate line/paragraph count
    and char-mass fractions, map-only (linkgraph/pipeline/text.py)."""
    from linkgraph.pipeline.text import duplicate_structure_stats
    return duplicate_structure_stats(_docs(spark, sf_dir))


def _q_bpe(spark, sf_dir):
    """Distributed BPE merge learning (Sennrich 2016): 8 merges over
    the whitespace vocabulary; corpus touched once, per-round
    pair census + 1-row argmax + shuffle-free JVM fold apply
    (pipeline/text.py). The DuckDB twin replays the same greedy via
    an island/parity window formulation."""
    from linkgraph.pipeline import bpe_learn
    return bpe_learn(_docs(spark, sf_dir), n_merges=8)


def _q_bpe_census(spark, sf_dir):
    """Subword-unit inventory after the 8 learned merges: per-token
    corpus occurrence mass over the segmented vocabulary (the
    tokenizer-coverage readout; pipeline/text.py)."""
    from linkgraph.pipeline import bpe_token_census
    return bpe_token_census(_docs(spark, sf_dir), n_merges=8)


def _q_bpe_tokenize(spark, sf_dir):
    """Per-document token census under the learned 8-merge BPE: the
    vocabulary is segmented once, then one word-keyed join back onto
    occurrences (pipeline/text.py)."""
    from linkgraph.pipeline import bpe_tokenize
    return bpe_tokenize(_docs(spark, sf_dir), n_merges=8)


def _q_countmin(spark, sf_dir):
    """Count-min sketch estimates vs exact counts for the top-20
    tokens (Cormode-Muthukrishnan 2005): d x w integer grid, min-of-d
    upper bound — fixed-memory frequency stats; engine-exact because
    the counters are order-free integer sums over md5 cells
    (pipeline/text.py)."""
    from linkgraph.pipeline import countmin_estimate
    return countmin_estimate(_docs(spark, sf_dir), k=20, d=4, w=1024)


def _q_hll(spark, sf_dir):
    """HyperLogLog distinct tokens per language next to the exact
    truth (Flajolet 2007): integer-only registers (trailing-zero rho,
    clamped dyadic harmonic sum in int64) make the ESTIMATE itself
    engine-exact, small-range linear-counting branch included
    (pipeline/text.py)."""
    from linkgraph.pipeline import hll_distinct
    return hll_distinct(_docs(spark, sf_dir), by="lang", b=9)


def _q_length_quantiles(spark, sf_dir):
    """Per-language length percentiles: exact order statistic next to
    the <=32-counter log2-histogram sketch's upper bound — thresholds
    in the exact integer micro-domain (pipeline/text.py)."""
    from linkgraph.pipeline import length_quantiles
    return length_quantiles(_docs(spark, sf_dir))


def _q_vocab(spark, sf_dir):
    """Corpus-level top-k token vocabulary profile."""
    from linkgraph.pipeline import vocab_stats
    return vocab_stats(_docs(spark, sf_dir), k=20)


def _q_zipf_fit(spark, sf_dir):
    """Zipf's-law ln-ln regression over the top-500 token frequencies
    (linkgraph/pipeline/text.py zipf_fit): rounded-ln integer moments,
    DECIMAL(38,0) squares, closed-form slope/intercept/r2."""
    from linkgraph.pipeline.text import zipf_fit
    return zipf_fit(_docs(spark, sf_dir), top_ranks=500)


def _q_normalize(spark, sf_dir):
    """Pre-dedup text canonicalization (lowercase, control strip,
    whitespace collapse)."""
    from linkgraph.pipeline import normalize_text
    return normalize_text(_docs(spark, sf_dir))


def _q_source_mix(spark, sf_dir):
    """Per-source training-mix report (token share + avg quality)."""
    from linkgraph.pipeline import source_mix
    return source_mix(_docs(spark, sf_dir))


def _q_containment(spark, sf_dir):
    """Asymmetric shingle-containment pairs (subset duplicates)."""
    from linkgraph.pipeline import containment_pairs
    return containment_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


# shared knobs for the curation queries — the oracle SQL builders take
# the SAME literals so both engines compute identical thresholds
_STRAT_RATES = {"en": 0.5, "zh": 0.25, "de": 0.25}


def _q_decontaminate(spark, sf_dir):
    """Benchmark n-gram decontamination: the 'benchmark' is the
    deterministic doc_id % 29 slice of the corpus (a leaked test set)."""
    from linkgraph.pipeline import decontaminate
    docs = _docs(spark, sf_dir)
    return decontaminate(docs, docs.filter("doc_id % 29 = 0"), n=8)


def _q_contamination_report(spark, sf_dir):
    """Per-source contamination report card over the same benchmark
    slice (pipeline/curate.py#contamination_report)."""
    from linkgraph.pipeline.curate import contamination_report
    docs = _docs(spark, sf_dir)
    return contamination_report(docs, docs.filter("doc_id % 29 = 0"), n=8)


def _contamination_report_sql() -> str:
    from linkgraph.pipeline.curate import contamination_report_sql
    return contamination_report_sql("doc_id % 29 = 0", n=8)


def _q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination (same benchmark slice as the exact
    pass): zero false negatives, engine-identical false positives —
    the filter fits one broadcast at any benchmark size
    (linkgraph/pipeline/curate.py#bloom_decontaminate)."""
    from linkgraph.pipeline import bloom_decontaminate
    docs = _docs(spark, sf_dir)
    return bloom_decontaminate(
        docs, docs.filter("doc_id % 29 = 0"), n=8, m_bits=1 << 18, k_hashes=3
    )


def _q_dsir_scores(spark, sf_dir):
    """DSIR hashed-bigram importance log-ratios against the src0
    slice as the target distribution (exact 1e-7 fixed point)."""
    from linkgraph.pipeline import dsir_scores
    docs = _docs(spark, sf_dir)
    return dsir_scores(docs, docs.filter("source = 'src0'"), n=2, buckets=1009)


def _q_dsir_sample(spark, sf_dir):
    """DSIR Gumbel-top-k selection of 100 docs ∝ exp(importance)."""
    from linkgraph.pipeline import dsir_sample
    docs = _docs(spark, sf_dir)
    return dsir_sample(
        docs, docs.filter("source = 'src0'"), n_keep=100, n=2,
        buckets=1009, seed=7,
    )


def _q_stratified(spark, sf_dir):
    """Deterministic hash-threshold per-language sampling."""
    from linkgraph.pipeline import stratified_sample
    return stratified_sample(
        _docs(spark, sf_dir), _STRAT_RATES, default_rate=0.1, seed=7
    )


def _q_quota(spark, sf_dir):
    """Per-language quota cap (deterministic reservoir)."""
    from linkgraph.pipeline import quota_sample
    return quota_sample(_docs(spark, sf_dir), quota=25, by="lang", seed=7)


def _q_corpus_shuffle(spark, sf_dir):
    """Deterministic training-order shuffle into shards."""
    from linkgraph.pipeline import corpus_shuffle
    return corpus_shuffle(_docs(spark, sf_dir), n_shards=8, seed=7)


def _q_pack_sequences(spark, sf_dir):
    """Concat-then-chunk sequence packing placement map."""
    from linkgraph.pipeline import pack_sequences
    return pack_sequences(_docs(spark, sf_dir), seq_len=128, n_shards=8, seed=7)


def _q_cosine_topk(spark, sf_dir):
    from linkgraph.pipeline import cosine_topk
    return cosine_topk(_emb(spark, sf_dir), k=5).select(
        "vec_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def _q_emb_near_dup(spark, sf_dir):
    from linkgraph.pipeline import near_dup_pairs
    return near_dup_pairs(_emb(spark, sf_dir), threshold=0.4)


def _q_near_dup_lsh(spark, sf_dir):
    """Banded hyperplane-LSH near-dup (candidates from band-bucket
    collisions, exact in-bucket verify). At r=2/b=32 the per-pair miss
    probability at cosine 0.4 is ~8.5e-8, so the brute-force SQL
    oracle is a valid equality check (same pattern as minhash_lsh)."""
    from linkgraph.pipeline import near_dup_pairs_lsh
    return near_dup_pairs_lsh(_emb(spark, sf_dir), threshold=0.4)


def _q_ann_lsh(spark, sf_dir):
    """Multi-probe hyperplane-LSH top-k. n_planes is PINNED (=11, what
    auto_n_planes gives for the 500-vector sf0.01 corpus) so the
    bucket assignment is deterministic and the exact output is
    SQL-oracle-checkable (ann_lsh_topk_sql inlines the same plane
    literals; the signature expression is engine-exact)."""
    from linkgraph.pipeline import ann_lsh_topk
    return ann_lsh_topk(_emb(spark, sf_dir), k=5, n_planes=11).select(
        "vec_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def _q_jaccard_df_capped(spark, sf_dir):
    """DF-capped candidate generation (production fix for the shingle
    equi-join's hyper-common-shingle fan-out); exact verify on full
    shingle sets. Oracle mirrors the same capped contract."""
    from linkgraph.pipeline import jaccard_pairs_df_capped
    return jaccard_pairs_df_capped(_docs(spark, sf_dir), n=3, threshold=0.8, df_cap=50)


def _q_jaccard_prefix(spark, sf_dir):
    """Exact prefix-filtered similarity self-join (AllPairs/PPJoin
    rule): candidates only from each doc's rarity-ordered
    |x|-ceil(t|x|)+1 shingle prefix, exact verify on full sets. The
    oracle is the BRUTE SQL — a green check proves the filter is
    lossless on the corpus."""
    from linkgraph.pipeline import jaccard_prefix_pairs
    return jaccard_prefix_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


def _q_kmeans_parallel(spark, sf_dir):
    """Deterministic k-means‖ oversampling init over the embeddings
    table (pipeline/simsearch.py#kmeans_parallel_init)."""
    from linkgraph.pipeline.simsearch import kmeans_parallel_init
    return kmeans_parallel_init(_emb(spark, sf_dir), k=8, l=16, rounds=3,
                                seed=3)


def _kmeans_parallel_sql() -> str:
    from linkgraph.pipeline.simsearch import kmeans_parallel_init_sql
    return kmeans_parallel_init_sql(64, k=8, l=16, rounds=3, seed=3)


def _q_mmr_embeddings(spark, sf_dir):
    """MMR diverse top-k over the embeddings table — integer-exact
    relevance/redundancy scores on quantized normalized vectors
    (linkgraph/pipeline/simsearch.py#mmr_select)."""
    from linkgraph.pipeline.simsearch import mmr_select
    return mmr_select(_emb(spark, sf_dir), k=8, lambda_pct=70)


def _mmr_embeddings_sql() -> str:
    from linkgraph.pipeline.simsearch import mmr_select_sql
    return mmr_select_sql(64, k=8, lambda_pct=70)


def _q_ann_ivf(spark, sf_dir):
    """IVF-flat ANN (deterministic rank-stride centroids) — unlike the
    hyperplane-LSH path this one is deterministic end-to-end, so it is
    oracle-checked exactly; recall vs brute force is pytest-asserted."""
    from linkgraph.pipeline import ann_ivf_topk
    return ann_ivf_topk(_emb(spark, sf_dir), k=5, n_centroids=16, n_probe=4).select(
        "vec_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank")
    )


def _q_kcenter(spark, sf_dir):
    """Greedy k-center / farthest-point coreset selection (Gonzalez
    1985, 2-approx covering radius) — diversity sampling over the
    embeddings table; int64-quantized distances make the 8-step greedy
    sequence value-exact cross-engine (pipeline/simsearch.py)."""
    from linkgraph.pipeline import kcenter_select
    return kcenter_select(_emb(spark, sf_dir), k=8)


def _q_embed_covariance(spark, sf_dir):
    """Sample covariance of the embedding corpus in LONG (i, j, cov)
    form — the PCA/whitening front door: one corpus pass, d(d+1)/2
    JVM-generated per-row products into one map-combined aggregate
    (pipeline/simsearch.py embedding_covariance). Exact: x6 integer
    moments, DECIMAL numerator, shared double-division tail."""
    from linkgraph.pipeline import embedding_covariance
    return embedding_covariance(_emb(spark, sf_dir))


def _q_kmeans(spark, sf_dir):
    """Deterministic distributed k-means (rank-stride seeding + 2
    integer-exact Lloyd rounds): the one iterative FLOAT clustering
    with a value-exact unrolled SQL twin — centroid means go through
    the 6-decimal integer domain
    (linkgraph/pipeline/simsearch.py#kmeans_clusters)."""
    from linkgraph.pipeline import kmeans_clusters
    return kmeans_clusters(_emb(spark, sf_dir), n_clusters=16, iters=2).select(
        "vec_id", "cluster", "csim"
    )


def _q_multimodal_features(spark, sf_dir):
    from linkgraph.pipeline import asset_features, synth_assets
    return asset_features(synth_assets(_docs(spark, sf_dir))).select(
        "asset_id", "kind", F.col("byte_len").cast("long").alias("byte_len"),
        "f0", "f1", "f2", "f3",
    )


def _q_video_frames(spark, sf_dir):
    from linkgraph.pipeline import decode_media, synth_assets
    return decode_media(synth_assets(_docs(spark, sf_dir)), kind="video")


# --- event analytics (batch twins of linkgraph.streaming; events table) ---

def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _q_bm25_search(spark, sf_dir):
    """BM25 ranked retrieval over the corpus: map-side term filter
    before any shuffle, broadcast df/corpus stats, distributed
    TakeOrdered for the top-n (never a global sort)."""
    from linkgraph.pipeline.text import bm25_search
    return bm25_search(_docs(spark, sf_dir), "table scan merge", top_n=20)


def _q_pmi(spark, sf_dir):
    """Top-20 PMI bigram collocations (Church-Hanks): integer counts
    into one fixed ln tree, rank on the ROUNDED score
    (linkgraph/pipeline/text.py#pmi_collocations)."""
    from linkgraph.pipeline import pmi_collocations
    return pmi_collocations(_docs(spark, sf_dir), top_k=20, min_count=5)


def _q_ngram_lm(spark, sf_dir):
    """Bigram LM census with ML conditional probabilities — p divides
    two integer counts, so the oracle needs no float tolerance."""
    from linkgraph.pipeline.text import ngram_lm
    return ngram_lm(_docs(spark, sf_dir), n=2, min_count=5)


def _q_fuzzy_dup(spark, sf_dir):
    """Edit-distance near-dups: winnowing-fingerprint candidates +
    exact Levenshtein verify (both engines' integer DP agrees exactly
    — linkgraph/pipeline/dedup.py#fuzzy_dup_pairs)."""
    from linkgraph.pipeline.dedup import fuzzy_dup_pairs
    return fuzzy_dup_pairs(_docs(spark, sf_dir), k=8, w=16, max_dist=40)


def _q_winnow(spark, sf_dir):
    """Winnowing fingerprints (MOSS; Schleimer et al. 2003): window
    minima over k-gram hashes — guaranteed-coverage local signatures
    for copy detection (linkgraph/pipeline/text.py#winnow_fingerprints)."""
    from linkgraph.pipeline.text import winnow_fingerprints
    return winnow_fingerprints(_docs(spark, sf_dir), k=8, w=16)


def _q_perplexity(spark, sf_dir):
    """CCNet-style quality signal: per-doc cross-entropy under the
    corpus's own add-1 bigram LM. Each per-gram ln is rounded to 7
    decimals before a token-ordered left fold, which removes the
    measured Java-vs-libm 1-ulp ln divergence — value-exact oracle
    (linkgraph/pipeline/text.py#perplexity_scores)."""
    from linkgraph.pipeline.text import perplexity_scores
    return perplexity_scores(_docs(spark, sf_dir), n=2, k=1.0)


def _q_tfidf_topk(spark, sf_dir):
    """Per-document top-5 terms by smoothed TF-IDF (keyword
    extraction); ranking on the ROUNDED score so both engines rank
    exactly the values they emit."""
    from linkgraph.pipeline.text import tfidf_topk
    return tfidf_topk(_docs(spark, sf_dir), k=5)


def _q_redact_pii(spark, sf_dir):
    """PII scrub over the documents table. The fixture text carries no
    identifiers, so the query appends a deterministic synthetic
    contact line per doc (email + IPv4 + phone derived from doc_id) —
    both engines build the same string, then redact it; counts are
    per-pattern over the pre-redaction text."""
    from linkgraph.pipeline.text import redact_pii
    pii = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 or +1 555-000-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    return redact_pii(pii)


def _q_line_dedup(spark, sf_dir):
    """C4-style repeated-span removal at token granularity (the
    single-line fixture's span unit; real corpora pass sep='\\n'):
    spans in > max_df docs are boilerplate, stripped everywhere, docs
    reassembled in original order. Hash-only shuffles."""
    from linkgraph.pipeline.curate import line_dedup
    return line_dedup(_docs(spark, sf_dir), max_df=390, sep=" ")


def _q_events_sessionize(spark, sf_dir):
    """Gap-timeout sessionization (30 min) — per-event session index."""
    from linkgraph.pipeline.events import sessionize
    return sessionize(_events(spark, sf_dir), gap_minutes=30).select(
        "event_id", "user_id", "session_idx"
    )


def _q_events_session_stats(spark, sf_dir):
    from linkgraph.pipeline.events import session_stats
    return session_stats(_events(spark, sf_dir), gap_minutes=30)


def _q_events_windowed_counts(spark, sf_dir):
    from linkgraph.pipeline.events import windowed_counts
    return windowed_counts(_events(spark, sf_dir), bucket="hour")


def _q_events_anomalies(spark, sf_dir):
    """Per-type windowed volume anomalies: z-scores over the
    zero-filled hourly grid, integer moments, |z| >= 1.5 on the
    ROUNDED value (linkgraph/pipeline/events.py#windowed_anomalies)."""
    from linkgraph.pipeline.events import windowed_anomalies
    return windowed_anomalies(_events(spark, sf_dir), bucket="hour", z_thresh=1.5)


def _q_events_funnel(spark, sf_dir):
    from linkgraph.pipeline.events import funnel
    return funnel(_events(spark, sf_dir), steps=["view", "click", "purchase"])


def _q_events_retention(spark, sf_dir):
    from linkgraph.pipeline.events import retention_cohorts
    return retention_cohorts(_events(spark, sf_dir))


def _q_events_top_paths(spark, sf_dir):
    """Top-20 session event-type paths (first 10 events per 30-min
    session) — path mining over the shared sessionization core."""
    from linkgraph.pipeline.events import top_session_paths
    return top_session_paths(_events(spark, sf_dir), k=20)


def _q_events_coactivity(spark, sf_dir):
    """Events -> graph bridge: the co-activity user graph as a
    bipartite projection of (user, active-hour) edges — users linked
    by the number of distinct hours both were active in (kept at
    >= 3). Composes the events table with the general projection
    operator in one lazy plan."""
    from linkgraph.similarity import bipartite_projection
    ua = _events(spark, sf_dir).select(
        F.col("user_id").alias("src"),
        F.date_trunc("hour", F.col("ts")).cast("long").alias("dst"),
    )
    return bipartite_projection(ua, min_common=3)


def _q_events_transitions(spark, sf_dir):
    """First-order Markov event-type transitions (lead over the shared
    user-key window sort; probability = ratio of integer counts)."""
    from linkgraph.pipeline.events import transition_matrix
    return transition_matrix(_events(spark, sf_dir))


def _q_events_props_stats(spark, sf_dir):
    from linkgraph.pipeline.events import props_stats
    return props_stats(_events(spark, sf_dir), field="k")


_ROUND = 5  # bump per round: rotates the driver-certified front-50

_CORE_ALWAYS = [
    # SURVEY.md §2.1 core — certified by the driver EVERY round
    "pagerank_purchase_5iter",
    "pagerank_weighted_cosupplier",
    "wcc_purchase",
    "wcc_purchase_star",
    "labelprop_cosupplier_2iter",
    "triangle_count_cosupplier",
    "louvain_purchase_alt3",
    "infomap_cosupplier_2r",
]


def _driver_front(names: list) -> list:
    """Rotating, family-stratified driver sample: the driver's
    CORRECTNESS_rN artifact checks the FIRST 50 entries of
    ``queries()``, so order them deliberately — the §2.1 core always,
    then 42 slots round-robined across query families (family = first
    name token), each family's internal order rotated by
    md5(name#r{_ROUND}). Every round (bump ``_ROUND``) the driver
    therefore certifies a different cross-family slice while the full
    220-query drive log (ORACLES_rN.log, tools/check_oracles.py)
    covers the rest."""
    import hashlib

    rest = [n for n in names if n not in _CORE_ALWAYS]
    fams: dict = {}
    for n in rest:
        fams.setdefault(n.split("_")[0], []).append(n)
    for f in fams:
        fams[f].sort(
            key=lambda n: hashlib.md5(f"{n}#r{_ROUND}".encode()).hexdigest()
        )
    # the family CYCLE rotates per round too — there are more families
    # than slots, so a fixed (alphabetical) cycle would never reach the
    # tail families
    cycle = sorted(
        fams, key=lambda f: hashlib.md5(f"{f}#r{_ROUND}".encode()).hexdigest()
    )
    picked: list = []
    i = 0
    while len(picked) < 50 - len(_CORE_ALWAYS) and any(fams.values()):
        fam = cycle[i % len(cycle)]
        if fams[fam]:
            picked.append(fams[fam].pop(0))
        i += 1
    return [n for n in _CORE_ALWAYS if n in names] + picked


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        # graph procedures (SURVEY.md §2.1)
        "pagerank_purchase_5iter": _q_pagerank,
        "articlerank_purchase_5iter": _q_articlerank,
        "pagerank_weighted_cosupplier": _q_pagerank_weighted,
        "pagerank_personalized_purchase": _q_pagerank_personalized,
        "wcc_purchase": _q_wcc,
        "wcc_purchase_star": _q_wcc_star,
        "wcc_purchase_setcount": _q_wcc_setcount,
        "wcc_threshold_cosupplier": _q_wcc_threshold,
        "labelprop_cosupplier_1iter": _q_labelprop,
        "labelprop_cosupplier_2iter": _q_labelprop2,
        "labelprop_hub_cosupplier_2iter": _q_labelprop_hub,
        "modularity_lpa_cosupplier": _q_modularity_lpa,
        "conductance_lpa_cosupplier": _q_conductance_lpa,
        "contract_lpa_cosupplier": _q_contract_lpa,
        "compare_lpa_louvain_cosupplier": _q_compare_lpa_louvain,
        "louvain_purchase_alt3": _q_louvain_purchase,
        "louvain_cosupplier_sync2": _q_louvain_cosupplier,
        "infomap_cosupplier_2r": _q_infomap_cosupplier,
        "refine_louvain_purchase": _q_refine_louvain_purchase,
        "edge_support_cosupplier": _q_edge_support,
        "ktruss4_cosupplier": _q_ktruss4,
        "triangle_count_cosupplier": _q_triangle_count,
        "triangles_per_node_cosupplier": _q_triangles_per_node,
        "triangle_stream_cosupplier": _q_triangle_stream,
        "balanced_triads_cosupplier": _q_balanced_triads_cosupplier,
        "approx_triangles_cosupplier": _q_approx_triangles,
        "effective_size_cosupplier": _q_effective_size,
        "powerlaw_purchase": _q_powerlaw_purchase,
        "degree_knn_purchase": _q_degree_knn,
        "clustering_by_degree_cosupplier": _q_clustering_by_degree,
        "ifub_diameter_nation": _q_ifub_diameter,
        "mixing_plan_docs": _q_mixing_plan,
        "triangles_intersect_cosupplier": _q_triangles_intersect,
        "degrees_purchase": _q_degrees,
        "degree_weighted_cosupplier": _q_degree_weighted_cosupplier,
        "kcore_purchase": _q_kcore_purchase,
        "score_trade_nation": _q_score_trade,
        "coreness_purchase": _q_coreness_purchase,
        "anf_purchase": _q_anf_purchase,
        "hyperball_harmonic_purchase": _q_hyperball_harmonic_purchase,
        "degree_histogram_purchase": _q_degree_histogram,
        # paths / scc / mst (SURVEY.md §2.2)
        "sssp_hops2_cosupplier": _q_sssp_cosupplier,
        "sp_pair_cosupplier": _q_sp_pair_cosupplier,
        "astar_trade_nation": _q_astar_nation,
        "yen3_trade_nation": _q_yen_nation,
        "luby_mis_purchase": _q_luby_purchase,
        "coloring_jp_nation": _q_jp_nation,
        "wl_refine_cosupplier": _q_wl_cosupplier,
        "wl_refine_sum_purchase": _q_wl_sum_purchase,
        "balanced_partition_purchase": _q_bpart_purchase,
        "balanced_partition_cosupplier": _q_bpart_cosupplier,
        "balanced_partition_weighted_cosupplier": _q_bpart_weighted_cosupplier,
        "path_cooc_synth": _q_path_cooc_synth,
        "spectral_split_cosupplier": _q_spectral_cosupplier,
        "wcc_path_cooc_synth": _q_wcc_path_cooc,
        "affinity_levels_cosupplier": _q_affinity_cosupplier,
        "sssp_delta_cosupplier": _q_delta_stepping_cosupplier,
        "apsp_nation": _q_apsp_nation,
        "bfs_trade_nation": _q_bfs_trade_nation,
        "graphlets_trade_nation": _q_graphlets_nation,
        "dfs_trade_nation": _q_dfs_trade_nation,
        "apsp_weighted_nation": _q_apsp_weighted_nation,
        "apsp_weighted_sampled_nation": _q_apsp_weighted_sampled_nation,
        "closeness_nation": _q_closeness_nation,
        "closeness_wf_nation": _q_closeness_wf_nation,
        "landmark_est_nation": _q_landmark_est_nation,
        "eccentricity_nation": _q_eccentricity_nation,
        "diameter_nation": _q_diameter_nation,
        "closeness_sampled_nation": _q_closeness_sampled_nation,
        "harmonic_nation": _q_harmonic_nation,
        "dangalchev_nation": _q_dangalchev_nation,
        "harmonic_sampled_nation": _q_harmonic_sampled_nation,
        "scc_returns": _q_scc_returns,
        "bowtie_returns": _q_bowtie_returns,
        "topo_levels_orderchain": _q_topo_levels_orderchain,
        "condensation_returns": _q_condensation_returns,
        "condensation_levels_returns": _q_condensation_levels_returns,
        "bridges_nation_supplier": _q_bridges_nation_supplier,
        "articulation_nation_supplier": _q_articulation_nation_supplier,
        "earliest_arrival_returns": _q_earliest_arrival_returns,
        "temporal_closeness_returns": _q_temporal_closeness_returns,
        "temporal_pr_returns": _q_temporal_pr_returns,
        "earliest_arrival_weighted_returns": _q_earliest_arrival_weighted_returns,
        "latest_departure_returns": _q_latest_departure_returns,
        "matching_cosupplier": _q_matching_cosupplier,
        "densest_purchase": _q_densest_purchase,
        "mst_cosupplier": _q_mst_cosupplier,
        "kspanning_cosupplier": _q_kspanning_cosupplier,
        "eigenvector_purchase": _q_eigenvector_purchase,
        "fastrp_purchase": _q_fastrp_purchase,
        "feature_prop_purchase": _q_feature_prop_purchase,
        "fastrp_knn_purchase": _q_fastrp_knn_purchase,
        "katz_purchase": _q_katz_purchase,
        "hits_purchase": _q_hits_purchase,
        "salsa_purchase": _q_salsa_purchase,
        "coproject_cosupplier": _q_coproject_cosupplier,
        "assortativity_purchase": _q_assortativity_purchase,
        "attr_assortativity_cosupplier": _q_attr_assortativity,
        "richclub_cosupplier": _q_richclub_cosupplier,
        "reciprocity_trade_nation": _q_reciprocity_trade,
        "transitivity_cosupplier": _q_transitivity_cosupplier,
        "pagerank_coproject": _q_pagerank_coproject,
        "induced_subgraph_cosupplier": _q_induced_subgraph_cosupplier,
        "nodesim_suppliers_jaccard": _q_nodesim_suppliers,
        "nodesim_lsh_suppliers": _q_nodesim_lsh_suppliers,
        "nodesim_pearson_cosupplier": _q_nodesim_pearson_cosupplier,
        "nodesim_euclidean_cosupplier": _q_nodesim_euclidean_cosupplier,
        "linkpred_purchase_topn": _q_linkpred_purchase,
        "linkpred_auc_purchase": _q_linkpred_auc_cosupplier,
        "nodesim_topk_cosupplier": _q_nodesim_topk_cosupplier,
        "walks_cosupplier": _q_walks_cosupplier,
        "walk_sequences_cosupplier": _q_walk_sequences_cosupplier,
        "node2vec_cosupplier": _q_node2vec_cosupplier,
        "weighted_walks_cosupplier": _q_weighted_walks_cosupplier,
        "numeric_guards_orders": _q_numeric_guards_orders,
        "betweenness_nation": _q_betweenness_nation,
        "edge_betweenness_nation": _q_edge_betweenness_nation,
        "simrank_trade_nation": _q_simrank_nation,
        "localcom_trade_nation": _q_localcom_trade_nation,
        "simrank_sampled_trade_nation": _q_simrank_sampled_nation,
        "labelspread_trade_nation": _q_labelspread_trade_nation,
        "girth_trade_nation": _q_girth_trade_nation,
        "triads_trade_nation": _q_triads_trade_nation,
        "sgns_trade_nation": _q_sgns_trade_nation,
        "percolation_trade_nation": _q_percolation_trade_nation,
        "influence_trade_nation": _q_influence_trade_nation,
        "onion_trade_nation": _q_onion_trade_nation,
        "sparsify_cosupplier": _q_sparsify_cosupplier,
        "configmodel_trade_nation": _q_configmodel_trade_nation,
        "robustness_trade_nation": _q_robustness_trade_nation,
        "motifsig_trade_nation": _q_motifsig_trade_nation,
        "forestfire_purchase": _q_forestfire_purchase,
        "ppr_batch_trade_nation": _q_ppr_batch_trade_nation,
        "steiner_trade_nation": _q_steiner_trade_nation,
        "girvan_newman_nation": _q_girvan_newman_nation,
        "wcc_sqlproj_nation": _q_wcc_sqlproj_nation,
        # training-data pipeline (documents / embeddings)
        "dedup_exact": _q_exact_dedup,
        "dup_spans_documents": _q_dup_spans,
        "cross_contamination_minhash": _q_cross_contamination,
        "source_overlap_documents": _q_source_overlap,
        "multimodal_ahash": _q_multimodal_ahash,
        "multimodal_ahash_pairs": _q_multimodal_ahash_pairs,
        "dedup_jaccard_pairs": _q_jaccard_pairs,
        "dedup_jaccard_df_capped": _q_jaccard_df_capped,
        "dedup_jaccard_prefix": _q_jaccard_prefix,
        "dedup_minhash_lsh": _q_minhash_lsh,
        "dedup_near_dup_clusters": _q_near_dup_clusters,
        "dedup_report_docs": _q_dedup_report,
        "dedup_canonical_pick": _q_canonical_pick,
        "sim_semantic_dedup": _q_semantic_dedup,
        "curate_chunk_documents": _q_chunk_documents,
        "pipeline_corpus_prep": _q_corpus_prep,
        "pipeline_corpus_prep_lm": _q_corpus_prep_lm,
        "simhash_table": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "text_token_stats": _q_token_stats,
        "text_quality_scores": _q_quality,
        "text_language_id": _q_langid,
        "text_fingerprints": _q_fingerprints,
        "text_ngram_novelty": _q_ngram_novelty,
        "text_repetition": _q_repetition,
        "text_dup_structure": _q_dup_structure,
        "text_c4_clean": _q_c4_clean,
        "text_gopher_quality": _q_gopher_quality,
        "quality_classifier_docs": _q_quality_classifier,
        "classifier_calibration_docs": _q_calibration_report,
        "dbh_partition_cosupplier": _q_dbh_partition,
        "text_vocab_topk": _q_vocab,
        "text_zipf_fit": _q_zipf_fit,
        "text_bpe_merges": _q_bpe,
        "text_bpe_census": _q_bpe_census,
        "text_bpe_tokenize": _q_bpe_tokenize,
        "text_countmin_topk": _q_countmin,
        "text_hll_distinct": _q_hll,
        "text_length_quantiles": _q_length_quantiles,
        "text_normalize": _q_normalize,
        "text_source_mix": _q_source_mix,
        "dedup_containment_pairs": _q_containment,
        "curate_decontaminate": _q_decontaminate,
        "contamination_report_docs": _q_contamination_report,
        "curate_bloom_decontaminate": _q_bloom_decontaminate,
        "curate_dsir_scores": _q_dsir_scores,
        "curate_dsir_sample": _q_dsir_sample,
        "curate_stratified_sample": _q_stratified,
        "curate_quota_sample": _q_quota,
        "curate_corpus_shuffle": _q_corpus_shuffle,
        "curate_pack_sequences": _q_pack_sequences,
        "curate_line_dedup": _q_line_dedup,
        "text_redact_pii": _q_redact_pii,
        "text_tfidf_topk": _q_tfidf_topk,
        "text_ngram_lm": _q_ngram_lm,
        "text_pmi_collocations": _q_pmi,
        "text_perplexity": _q_perplexity,
        "text_winnow_fingerprints": _q_winnow,
        "dedup_fuzzy_pairs": _q_fuzzy_dup,
        "text_bm25_search": _q_bm25_search,
        "sim_cosine_topk": _q_cosine_topk,
        "sim_embedding_near_dup": _q_emb_near_dup,
        "sim_near_dup_lsh": _q_near_dup_lsh,
        "sim_ann_lsh_topk": _q_ann_lsh,
        "sim_ann_ivf_topk": _q_ann_ivf,
        "mmr_select_embeddings": _q_mmr_embeddings,
        "kmeans_parallel_init_embeddings": _q_kmeans_parallel,
        "sim_kmeans_assign": _q_kmeans,
        "sim_kcenter_select": _q_kcenter,
        "sim_embed_covariance": _q_embed_covariance,
        "sim_quantize_embeddings": _q_quantize_embeddings,
        "sim_pq_encode": _q_pq_encode,
        "multimodal_features": _q_multimodal_features,
        "multimodal_video_frames": _q_video_frames,
        # event analytics (events table; batch twins of linkgraph.streaming)
        "events_sessionize": _q_events_sessionize,
        "events_session_stats": _q_events_session_stats,
        "events_windowed_counts": _q_events_windowed_counts,
        "events_anomalies": _q_events_anomalies,
        "events_funnel": _q_events_funnel,
        "events_retention": _q_events_retention,
        "events_props_stats": _q_events_props_stats,
        "events_transitions": _q_events_transitions,
        "events_coactivity_graph": _q_events_coactivity,
        "events_top_paths": _q_events_top_paths,
    }
    front = _driver_front(list(base))
    out = {k: base[k] for k in front}
    out.update(base)
    return out


# ------------------------------------------------------------- oracle SQL

def _pagerank_sql(
    iters: int = PR_ITERS,
    d: float = DAMPING,
    edge_sql: str | None = None,
    weighted: bool = False,
    source_pred: str | None = None,
) -> str:
    alpha = repr(1.0 - d)  # same IEEE double literal the engine uses
    edge_sql = edge_sql or PURCHASE_EDGES_SQL
    # personalized mode: teleport lands only on nodes matching
    # source_pred (SQL predicate template with an `{id}` placeholder,
    # e.g. "{id} % 17 = 0"); classic mode: constant alpha
    def tp(id_expr: str) -> str:
        if not source_pred:
            return alpha
        return f"CASE WHEN {source_pred.format(id=id_expr)} THEN {alpha} ELSE 0.0 END"
    if weighted:
        # parenthesized (weight / sw) mirrors the engine's precomputed
        # per-edge share, keeping IEEE rounding identical per term
        deg = "outdeg AS (SELECT src, SUM(weight) AS sw FROM edges GROUP BY src),"
        contrib = "SUM(p.rank * (e.weight / od.sw))"
    else:
        deg = "outdeg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),"
        contrib = "SUM(p.rank * (1.0 / od.outdeg))"
    parts = [
        f"WITH edges AS ({edge_sql}),",
        "nodes AS (SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),",
        deg,
        f"p0 AS (SELECT id, CAST({tp('id')} AS DOUBLE) AS rank FROM nodes)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""", p{k} AS (
  SELECT n.id AS id, CAST({tp('n.id')} AS DOUBLE) + {d!r} * COALESCE(s.s, 0.0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS dst, {contrib} AS s
    FROM edges e JOIN p{k-1} p ON p.id = e.src JOIN outdeg od ON od.src = e.src
    GROUP BY e.dst) s ON s.dst = n.id)"""
        )
    parts.append(f"\nSELECT id, ROUND(CAST(rank AS DOUBLE), 6) AS rank FROM p{iters}")
    return "\n".join(parts)


def _wcc_reach_sql(edge_sql: str, where: str = "") -> str:
    return f"""
WITH RECURSIVE
e AS ({edge_sql}),
und AS (SELECT src, dst FROM e {where} UNION ALL SELECT dst, src FROM e {where}),
nodes AS (SELECT DISTINCT src AS id FROM und),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT u.dst, r.comp FROM reach r JOIN und u ON u.src = r.id
)
SELECT id, MIN(comp) AS comp FROM reach GROUP BY id
"""


TRI_SQL_BASE = f"""
e AS ({COSUPPLIER_EDGES_SQL}),
und AS (SELECT src AS a, dst AS b FROM e),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
)"""


# Shared sessionization core: lag -> gap flag -> running sum, ties on
# (ts, event_id) exactly as linkgraph.pipeline.events.sessionize.
_EVENTS_SESS_CORE = """
lagd AS (
  SELECT event_id, user_id, ts, event_type, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
labeled AS (
  SELECT event_id, user_id, ts, event_type, value,
         CAST(SUM(CASE WHEN prev IS NULL
                        OR epoch(ts) - epoch(prev) > 1800 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM lagd
)
"""

_EVENTS_SESSIONIZE_SQL = f"""
WITH {_EVENTS_SESS_CORE}
SELECT event_id, user_id, session_idx FROM labeled
"""

_EVENTS_SESSION_STATS_SQL = f"""
WITH {_EVENTS_SESS_CORE}
SELECT user_id, session_idx,
       COUNT(*) AS n_events,
       CAST(floor(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
       CAST(floor(epoch(MAX(ts))) AS BIGINT) AS end_epoch,
       ROUND(epoch(MAX(ts)) - epoch(MIN(ts)), 6) AS duration_sec,
       ROUND(SUM(value), 6) AS total_value,
       COUNT(DISTINCT event_type) AS n_types
FROM labeled GROUP BY user_id, session_idx
"""


def oracle_sql() -> dict[str, str]:
    from linkgraph.anf import anf_sql, hyperball_harmonic_sql
    from linkgraph.kcore import (
        core_numbers_sql,
        k_core_sql,
        onion_layers_sql,
        s_core_sql,
    )

    return {
        "pagerank_purchase_5iter": _pagerank_sql(),
        "articlerank_purchase_5iter": _articlerank_sql(),
        "pagerank_weighted_cosupplier": _pagerank_sql(
            edge_sql=COSUPPLIER_EDGES_SQL, weighted=True
        ),
        "pagerank_personalized_purchase": _pagerank_sql(
            source_pred="{id} % 17 = 0"
        ),
        "wcc_purchase": _wcc_reach_sql(PURCHASE_EDGES_SQL),
        "wcc_purchase_star": _wcc_reach_sql(PURCHASE_EDGES_SQL),
        "wcc_purchase_setcount": (
            f"SELECT COUNT(DISTINCT comp) AS set_count FROM ({_wcc_reach_sql(PURCHASE_EDGES_SQL)})"
        ),
        "wcc_threshold_cosupplier": _wcc_reach_sql(
            COSUPPLIER_EDGES_SQL, where="WHERE weight >= 2.0"
        ),
        "labelprop_cosupplier_1iter": f"""
WITH e AS ({COSUPPLIER_EDGES_SQL}),
sym AS (SELECT src AS node, dst AS nbr, weight FROM e
        UNION ALL SELECT dst, src, weight FROM e),
votes AS (SELECT node, nbr AS label, SUM(weight) AS v FROM sym GROUP BY node, nbr),
best AS (SELECT node AS id, label,
                ROW_NUMBER() OVER (PARTITION BY node ORDER BY v DESC, label ASC) AS rk
         FROM votes)
SELECT id, label FROM best WHERE rk = 1
""",
        "labelprop_cosupplier_2iter": _LPA2_SQL,
        # identical SEMANTICS through the broadcast-hub split path
        # (hub_cap forces every nbr key hot on this dense graph): the
        # split must be invisible in the values, so the oracle is the
        # same 2-iteration SQL
        "labelprop_hub_cosupplier_2iter": _LPA2_SQL,
        "modularity_lpa_cosupplier": _modularity_lpa_sql(),
        "conductance_lpa_cosupplier": _conductance_lpa_sql(),
        "contract_lpa_cosupplier": _contract_lpa_sql(),
        "compare_lpa_louvain_cosupplier": _compare_lpa_louvain_sql(),
        "louvain_purchase_alt3": _louvain_purchase_sql(),
        "louvain_cosupplier_sync2": _louvain_cosupplier_sql(),
        "infomap_cosupplier_2r": _infomap_cosupplier_sql(),
        "refine_louvain_purchase": _refine_louvain_purchase_sql(),
        "edge_support_cosupplier": _edge_support_sql(),
        "ktruss4_cosupplier": _ktruss4_sql(),
        "balanced_triads_cosupplier": f"""
WITH e AS ({COSUPPLIER_EDGES_SQL}),
se AS (SELECT src AS a, dst AS b,
              CASE WHEN weight - 2.0 >= 0 THEN 1 ELSE -1 END AS s
       FROM e),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z,
               e1.s * e3.s * e2.s AS prod
        FROM se e1
        JOIN se e2 ON e2.a = e1.b
        JOIN se e3 ON e3.a = e1.a AND e3.b = e2.b),
corners AS (SELECT x AS id, prod FROM tri
            UNION ALL SELECT y, prod FROM tri
            UNION ALL SELECT z, prod FROM tri),
nodes AS (SELECT DISTINCT id FROM (SELECT a AS id FROM se UNION ALL SELECT b FROM se)),
cnt AS (SELECT id,
               SUM(CASE WHEN prod > 0 THEN 1 ELSE 0 END) AS balanced,
               SUM(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS unbalanced
        FROM corners GROUP BY id)
SELECT n.id,
       CAST(COALESCE(c.balanced, 0) AS BIGINT) AS balanced,
       CAST(COALESCE(c.unbalanced, 0) AS BIGINT) AS unbalanced
FROM nodes n LEFT JOIN cnt c ON c.id = n.id
""",
        "triangle_count_cosupplier": f"WITH {TRI_SQL_BASE}\nSELECT COUNT(*) AS triangle_count FROM tri",
        "approx_triangles_cosupplier": _approx_triangles_sql(),
        "effective_size_cosupplier": _effective_size_sql(),
        "powerlaw_purchase": _powerlaw_purchase_sql(),
        "degree_knn_purchase": _degree_knn_sql(),
        "clustering_by_degree_cosupplier": _clustering_by_degree_sql(),
        "ifub_diameter_nation": _ifub_diameter_sql(),
        "mixing_plan_docs": _mixing_plan_sql(),
        "triangles_per_node_cosupplier": f"""
WITH {TRI_SQL_BASE},
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
deg AS (SELECT id, COUNT(*) AS degree
        FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) GROUP BY id),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
SELECT d.id,
       CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles,
       CAST(d.degree AS BIGINT) AS degree,
       ROUND(CAST(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(c.triangles, 0) / (d.degree * (d.degree - 1))
             ELSE 0.0 END AS DOUBLE), 6) AS coefficient
FROM deg d LEFT JOIN cnt c ON c.id = d.id
""",
        "transitivity_cosupplier": f"""
WITH {TRI_SQL_BASE},
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
deg AS (SELECT id, COUNT(*) AS degree
        FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) GROUP BY id),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id),
m AS (SELECT CAST(SUM(COALESCE(c.triangles, 0)) AS BIGINT) AS corners_sum,
             CAST(SUM(d.degree * (d.degree - 1)) AS BIGINT) AS w2
      FROM deg d LEFT JOIN cnt c ON c.id = d.id)
SELECT corners_sum AS triangle_corners, w2 // 2 AS wedges,
       ROUND(CAST(corners_sum AS DOUBLE) / (CAST(w2 AS DOUBLE) / 2.0), 6)
         AS transitivity
FROM m
""",
        "triangle_stream_cosupplier": f"WITH {TRI_SQL_BASE}\nSELECT x AS node_a, y AS node_b, z AS node_c FROM tri",
        # same oracle as the wedge-kernel per-node query: the two
        # kernels are one exact algorithm on two physical plans
        "triangles_intersect_cosupplier": f"""
WITH {TRI_SQL_BASE},
corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri),
deg AS (SELECT id, COUNT(*) AS degree
        FROM (SELECT a AS id FROM und UNION ALL SELECT b AS id FROM und) GROUP BY id),
cnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
SELECT d.id,
       CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles,
       CAST(d.degree AS BIGINT) AS degree,
       ROUND(CAST(CASE WHEN d.degree >= 2
             THEN 2.0 * COALESCE(c.triangles, 0) / (d.degree * (d.degree - 1))
             ELSE 0.0 END AS DOUBLE), 6) AS coefficient
FROM deg d LEFT JOIN cnt c ON c.id = d.id
""",
        # k-core: Spark peels to fixpoint; the oracle unrolls 5 peel
        # rounds (idempotent past the fixpoint — measured depth is 2).
        # Coreness: h-index recurrence unrolled 7 rounds (converges
        # in 4; the recurrence is a no-op at the fixpoint).
        "kcore_purchase": k_core_sql(PURCHASE_EDGES_SQL, k=25, n_rounds=5),
        "score_trade_nation": s_core_sql(TRADE_NATION_W_SQL, s=2500.0, n_rounds=6),
        "coreness_purchase": core_numbers_sql(PURCHASE_EDGES_SQL, n_rounds=7),
        # onion peel: measured depth 5 on the nation graph; extra
        # rounds peel the empty set (idempotent)
        "onion_trade_nation": onion_layers_sql(TRADE_NATION_SQL, n_rounds=10),
        # HyperBall registers are deterministic integers from the
        # cross-engine hash, so the oracle replays the exact recurrence
        # and estimator (unrolled; max-merge is idempotent past
        # saturation, and the engine fills post-saturation snapshots)
        "anf_purchase": anf_sql(PURCHASE_EDGES_SQL, max_t=3, m=16, seed=0),
        # same registers, then the growth-ring fold in t order on both
        # engines (left-assoc float sum — order-identical)
        "hyperball_harmonic_purchase": hyperball_harmonic_sql(
            PURCHASE_EDGES_SQL, max_t=3, m=16, seed=0
        ),
        "degree_weighted_cosupplier": _degree_weighted_sql_wrapped(),
        "degrees_purchase": f"""
WITH edges AS ({PURCHASE_EDGES_SQL})
SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src
""",
        "degree_histogram_purchase": f"""
WITH edges AS ({PURCHASE_EDGES_SQL}),
deg AS (SELECT src, COUNT(*) AS degree FROM edges GROUP BY src)
SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
""",
        **_paths_oracles(),
        **_pipeline_oracles(),
    }


def _minplus_doubling(seed_cte: str, rounds: int, final_select: str) -> str:
    """Unrolled min-plus matrix doubling: m{k} holds shortest distances
    over paths of <= 2^k edges, so `rounds` covers 2^rounds-edge paths —
    EXACT (not hop-bounded) for any graph whose shortest paths use
    fewer edges. Weights here are integer-valued doubles, so the
    re-associated sums are IEEE-exact and match the engine bit-for-bit.
    """
    parts = [seed_cte]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
m{k} AS MATERIALIZED (
  SELECT a.src AS src, b.dst AS dst, MIN(a.d + b.d) AS d
  FROM m{k-1} a JOIN m{k-1} b ON a.dst = b.src
  GROUP BY 1, 2)"""
        )
    parts.append(final_select)
    return "".join(parts)


def _delta_sssp_sql(edge_sql: str, rounds: int = 7) -> str:
    seed = f"""
WITH e AS ({edge_sql}),
sym AS (SELECT src, dst, weight FROM e UNION ALL SELECT dst, src, weight FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
m0 AS MATERIALIZED (
  SELECT src, dst, MIN(weight) AS d FROM sym GROUP BY 1, 2
  UNION ALL SELECT id, id, CAST(0.0 AS DOUBLE) FROM nodes)"""
    final = f"""
SELECT dst AS id, ROUND(d, 6) AS dist
FROM m{rounds} WHERE src = (SELECT MIN(src) FROM e)"""
    return _minplus_doubling(seed, rounds, final)


def _apsp_weighted_sql(
    edge_sql: str, rounds: int = 5, source_pred: str | None = None
) -> str:
    seed = f"""
WITH e AS ({edge_sql}),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
m0 AS MATERIALIZED (
  SELECT src, dst, MIN(weight) AS d FROM e GROUP BY 1, 2
  UNION ALL SELECT id, id, CAST(0.0 AS DOUBLE) FROM nodes)"""
    extra = f" AND {source_pred}" if source_pred else ""
    final = f"""
SELECT src AS source, dst AS target, ROUND(d, 6) AS distance
FROM m{rounds} WHERE src != dst{extra}"""
    return _minplus_doubling(seed, rounds, final)


def _mst_minimax_sql(edge_sql: str, rounds: int = 7) -> str:
    """Canonical-Kruskal MSF membership: order edges totally by
    (weight, src, dst); an edge is in the MSF iff no path of strictly
    earlier edges connects its endpoints, i.e. iff the minimax edge
    order over all endpoint paths equals the edge's own order. The
    minimax closure is computed by (min, max)-semiring doubling —
    2^rounds-edge paths, exhaustive for n <= 2^rounds + 1 nodes.
    edge_count and total_weight are invariant across all MSFs (ties
    included), so this checks the engine's Borůvka output exactly."""
    parts = [
        f"""
WITH e AS ({edge_sql}),
ek AS (SELECT src, dst, weight,
              ROW_NUMBER() OVER (ORDER BY weight, src, dst) AS ok FROM e),
sym AS (SELECT src, dst, ok FROM ek UNION ALL SELECT dst, src, ok FROM ek),
nodes AS (SELECT DISTINCT src AS id FROM sym),
b0 AS MATERIALIZED (
  SELECT src, dst, MIN(ok) AS k FROM sym GROUP BY 1, 2
  UNION ALL SELECT id, id, CAST(0 AS BIGINT) FROM nodes)"""
    ]
    for k in range(1, rounds + 1):
        parts.append(
            f""",
b{k} AS MATERIALIZED (
  SELECT a.src AS src, b.dst AS dst, MIN(GREATEST(a.k, b.k)) AS k
  FROM b{k-1} a JOIN b{k-1} b ON a.dst = b.src
  GROUP BY 1, 2)"""
        )
    parts.append(
        f"""
SELECT CAST(COUNT(*) AS BIGINT) AS edge_count,
       ROUND(SUM(ek.weight), 6) AS total_weight
FROM ek JOIN b{rounds} m ON m.src = ek.src AND m.dst = ek.dst AND m.k = ek.ok"""
    )
    return "".join(parts)


def _kspanning_sql(edge_sql: str, k: int, rounds: int = 7) -> str:
    """k-spanning-tree clusters, fully in SQL:

      1. canonical-Kruskal MSF membership exactly as _mst_minimax_sql
         (edge in tree iff its (weight,src,dst) order equals the
         minimax order over all endpoint paths) — under a strict total
         order the MSF is unique, so this is edge-for-edge the
         engine's Borůvka output, ties included;
      2. cut the k-1 tree edges lexicographically largest in
         (weight, src, dst) — the engine's kmin cut order;
      3. min-id cluster labels via reachability doubling over the kept
         tree edges (2^rounds-step closure; exhaustive for tree paths
         up to 2^rounds edges — fine for sf0.01's ~100-node graphs).
    """
    parts = [
        f"""
WITH e AS ({edge_sql}),
ek AS (SELECT src, dst, weight,
              ROW_NUMBER() OVER (ORDER BY weight, src, dst) AS ok FROM e),
sym AS (SELECT src, dst, ok FROM ek UNION ALL SELECT dst, src, ok FROM ek),
nodes AS (SELECT DISTINCT src AS id FROM sym),
b0 AS MATERIALIZED (
  SELECT src, dst, MIN(ok) AS k FROM sym GROUP BY 1, 2
  UNION ALL SELECT id, id, CAST(0 AS BIGINT) FROM nodes)"""
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f""",
b{i} AS MATERIALIZED (
  SELECT a.src AS src, b.dst AS dst, MIN(GREATEST(a.k, b.k)) AS k
  FROM b{i-1} a JOIN b{i-1} b ON a.dst = b.src
  GROUP BY 1, 2)"""
        )
    parts.append(
        f""",
tree AS MATERIALIZED (
  SELECT ek.src, ek.dst, ek.weight
  FROM ek JOIN b{rounds} m ON m.src = ek.src AND m.dst = ek.dst AND m.k = ek.ok),
cut AS (SELECT src, dst FROM tree ORDER BY weight DESC, src DESC, dst DESC LIMIT {k - 1}),
kept AS (
  SELECT t.src, t.dst FROM tree t
  WHERE NOT EXISTS (SELECT 1 FROM cut c WHERE c.src = t.src AND c.dst = t.dst)),
r0 AS MATERIALIZED (
  SELECT src, dst FROM kept
  UNION ALL SELECT dst, src FROM kept
  UNION ALL SELECT id, id FROM nodes)"""
    )
    for i in range(1, rounds + 1):
        parts.append(
            f""",
r{i} AS MATERIALIZED (
  SELECT DISTINCT a.src AS src, b.dst AS dst
  FROM r{i-1} a JOIN r{i-1} b ON a.dst = b.src)"""
        )
    parts.append(
        f"""
SELECT src AS id, MIN(dst) AS cluster FROM r{rounds} GROUP BY 1"""
    )
    return "".join(parts)


def _brandes_sql(edge_sql: str, max_level: int = 8) -> str:
    """Unrolled two-pass Brandes on the undirected graph: recursive BFS
    for levels, per-level sigma CTEs forward, per-level delta CTEs
    backward — the exact recurrence the engine evaluates
    (linkgraph/betweenness.py), with the BOTH-direction 0.5 scale."""
    parts = [
        f"""
WITH RECURSIVE
e0 AS ({edge_sql}),
sym AS MATERIALIZED (
  -- explicit DISTINCT: inside WITH RECURSIVE, DuckDB does not apply
  -- UNION's dedup between branches of a non-recursive CTE
  SELECT DISTINCT src, dst
  FROM (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)),
nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.id WHERE b.dist < {max_level}),
d AS MATERIALIZED (SELECT source, id, MIN(dist) AS dist FROM bfs GROUP BY 1, 2),
sig0 AS MATERIALIZED (SELECT id AS source, id, CAST(1 AS DOUBLE) AS sigma FROM nodes)"""
    ]
    for l in range(1, max_level + 1):
        parts.append(
            f""",
sig{l} AS MATERIALIZED (
  SELECT p.source, s.dst AS id, CAST(SUM(p.sigma) AS DOUBLE) AS sigma
  FROM sig{l-1} p JOIN sym s ON s.src = p.id
  JOIN d dv ON dv.source = p.source AND dv.id = s.dst
  WHERE dv.dist = {l}
  GROUP BY 1, 2)"""
        )
    parts.append(
        f""",
del{max_level} AS MATERIALIZED (SELECT source, id, sigma, CAST(0 AS DOUBLE) AS delta FROM sig{max_level})"""
    )
    for l in range(max_level - 1, -1, -1):
        parts.append(
            f""",
del{l} AS MATERIALIZED (
  SELECT g.source, g.id, g.sigma, g.sigma * COALESCE(c.t, 0.0) AS delta
  FROM sig{l} g LEFT JOIN (
    SELECT w.source, s.src AS id, SUM((1.0 + w.delta) / w.sigma) AS t
    FROM del{l+1} w JOIN sym s ON s.dst = w.id
    GROUP BY 1, 2) c
  ON c.source = g.source AND c.id = g.id)"""
        )
    alldel = " UNION ALL ".join(
        f"SELECT * FROM del{l}" for l in range(0, max_level + 1)
    )
    parts.append(
        f""",
alldel AS ({alldel})
SELECT n.id AS id, ROUND(0.5 * COALESCE(s.c, 0.0), 6) AS centrality
FROM nodes n LEFT JOIN (
  SELECT id, SUM(delta) AS c FROM alldel WHERE id != source GROUP BY id) s
ON s.id = n.id"""
    )
    return "".join(parts)


def _brandes_edge_sql(edge_sql: str, max_level: int = 8) -> str:
    """Edge-betweenness twin of _brandes_sql: the same unrolled
    forward sigma / backward delta DP, but each level additionally
    emits per-arc credits sigma_v * (1 + delta_w) / sigma_w for arcs
    between consecutive BFS levels; both orientations collapse onto
    the canonical pair with the 0.5 undirected scale."""
    base = _brandes_sql(edge_sql, max_level=max_level)
    # keep everything up to (and excluding) the final alldel SELECT
    head = base[: base.index(",\nalldel AS (")]
    parts = [head]
    for l in range(0, max_level):
        parts.append(
            f""",
ed{l} AS MATERIALIZED (
  SELECT g.source, g.id AS v, w.id AS w,
         g.sigma * (1.0 + w.delta) / w.sigma AS c
  FROM sig{l} g JOIN sym s ON s.src = g.id
  JOIN del{l+1} w ON w.source = g.source AND w.id = s.dst)"""
        )
    alled = " UNION ALL ".join(f"SELECT * FROM ed{l}" for l in range(0, max_level))
    parts.append(
        f""",
alled AS ({alled})
SELECT LEAST(v, w) AS src, GREATEST(v, w) AS dst,
       ROUND(0.5 * SUM(c), 6) AS centrality
FROM alled GROUP BY 1, 2"""
    )
    return "".join(parts)


def _girvan_newman_sql(edge_sql: str, k: int, max_level: int = 8) -> str:
    """Girvan-Newman one-round twin: the edge-betweenness DP oracle,
    the identical (centrality DESC, src, dst) top-k cut, then min-label
    components by recursive reachability over the surviving edges —
    isolated nodes keep their own id as the community label."""
    eb = _brandes_edge_sql(edge_sql, max_level=max_level)
    return f"""
WITH RECURSIVE
eb AS MATERIALIZED ({eb}),
topk AS (SELECT src, dst FROM eb ORDER BY centrality DESC, src, dst LIMIT {k}),
und AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
        FROM ({edge_sql}) WHERE src != dst),
uni AS (
  -- explicit outer DISTINCT: inside WITH RECURSIVE, DuckDB does not
  -- dedup UNION between branches of a non-recursive CTE
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM und UNION ALL SELECT dst FROM und)),
rem AS (SELECT und.* FROM und ANTI JOIN topk USING (src, dst)),
sym AS (SELECT src AS x, dst AS y FROM rem UNION ALL SELECT dst, src FROM rem),
reach(a, b) AS (
  SELECT x, x FROM (SELECT DISTINCT x FROM sym)
  UNION
  SELECT r.a, sym.y FROM reach r JOIN sym ON sym.x = r.b
),
comp AS (SELECT a AS id, MIN(b) AS comp FROM reach GROUP BY a)
SELECT u.id, COALESCE(c.comp, u.id) AS comp
FROM uni u LEFT JOIN comp c ON c.id = u.id
"""


def _paths_oracles() -> dict[str, str]:
    from linkgraph.paths import (
        eccentricity_sql,
        graph_diameter_sql,
        landmark_estimate_sql,
    )
    from linkgraph.simrank import simrank_sampled_sql, simrank_sql
    from linkgraph.labelprop import seeded_label_spread_sql
    from linkgraph.temporal import temporal_pagerank_sql
    from linkgraph.girth import girth_sql
    from linkgraph.triads import triad_census_sql
    from linkgraph.embeddings import sgns_embeddings_sql
    from linkgraph.localcom import local_community_sweep_sql, ppr_batch_sql
    from linkgraph.mst import steiner_backbone_sql
    from linkgraph.percolation import clique_percolation_sql
    from linkgraph.influence import influence_maximization_sql
    from linkgraph.graphs import (
        configuration_model_sql,
        forest_fire_sample_sql,
        motif_significance_sql,
        robustness_curve_sql,
        sparsify_local_degree_sql,
    )

    sssp_sql = f"""
WITH RECURSIVE
e AS ({COSUPPLIER_EDGES_SQL}),
sym AS (SELECT src, dst, weight FROM e UNION ALL SELECT dst, src, weight FROM e),
walk(id, dist, hops) AS (
  SELECT (SELECT MIN(src) FROM e), CAST(0.0 AS DOUBLE), 0
  UNION ALL
  SELECT s.dst, w.dist + s.weight, w.hops + 1
  FROM walk w JOIN sym s ON s.src = w.id WHERE w.hops < 2
)
SELECT id, ROUND(MIN(dist), 6) AS dist FROM walk GROUP BY id
"""
    bfs_base = f"""
e AS ({TRADE_NATION_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.id WHERE b.dist < 8
),
best AS (SELECT source, id, MIN(dist) AS dist FROM bfs GROUP BY source, id)
"""
    apsp_sql = f"""
WITH RECURSIVE
e AS ({TRADE_NATION_SQL}),
nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM nodes
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN e s ON s.src = b.id WHERE b.dist < 8
)
SELECT source, id AS target, CAST(MIN(dist) AS DOUBLE) AS distance
FROM bfs GROUP BY source, id HAVING source != id
"""
    closeness_sql = f"""
WITH RECURSIVE {bfs_base}
SELECT b.source AS id,
       CAST(SUM(b.dist) AS DOUBLE) AS farness,
       CAST(COUNT(*) - 1 AS BIGINT) AS reached,
       ROUND(CASE WHEN SUM(b.dist) > 0
             THEN ((SELECT COUNT(*) FROM nodes) - 1) / CAST(SUM(b.dist) AS DOUBLE)
             ELSE 0.0 END, 6) AS closeness
FROM best b GROUP BY b.source
"""
    closeness_wf_sql = f"""
WITH RECURSIVE {bfs_base}
SELECT b.source AS id,
       CAST(SUM(b.dist) AS DOUBLE) AS farness,
       CAST(COUNT(*) - 1 AS BIGINT) AS reached,
       ROUND(CASE WHEN SUM(b.dist) > 0
             THEN (CAST(COUNT(*) - 1 AS DOUBLE) * CAST(COUNT(*) - 1 AS DOUBLE))
                  / (CAST((SELECT COUNT(*) FROM nodes) - 1 AS DOUBLE)
                     * CAST(SUM(b.dist) AS DOUBLE))
             ELSE 0.0 END, 6) AS closeness
FROM best b GROUP BY b.source
"""
    harmonic_sql = f"""
WITH RECURSIVE {bfs_base}
SELECT nd.id AS id,
       CAST(COALESCE(h.reached, 0) AS BIGINT) AS reached,
       ROUND(COALESCE(h.harm, 0.0), 6) AS harmonic,
       ROUND(COALESCE(h.harm, 0.0) / ((SELECT COUNT(*) FROM nodes) - 1), 6) AS normalized
FROM nodes nd LEFT JOIN (
  SELECT source AS id, COUNT(*) AS reached, SUM(1.0 / dist) AS harm
  FROM best WHERE dist > 0 GROUP BY source) h ON h.id = nd.id
"""
    # sampled-source estimators: the SAME recursive BFS restricted to
    # the sampled source set (id % 3 == 0), scale = n / |S| applied in
    # the same association order as the engine (scale * sum, then
    # divides) so doubles stay bit-identical pre-round
    sampled_bfs_base = f"""
e AS ({TRADE_NATION_SQL}),
sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
nodes AS (SELECT DISTINCT src AS id FROM sym),
srcs AS (SELECT id FROM nodes WHERE id % 3 = 0),
bfs(source, id, dist) AS (
  SELECT id, id, 0 FROM srcs
  UNION
  SELECT b.source, s.dst, b.dist + 1
  FROM bfs b JOIN sym s ON s.src = b.id WHERE b.dist < 8
),
best AS (SELECT source, id, MIN(dist) AS dist FROM bfs GROUP BY source, id),
scale AS (SELECT (SELECT COUNT(*) FROM nodes) / (SELECT COUNT(*) FROM srcs) AS sc)
"""
    closeness_sampled_sql = f"""
WITH RECURSIVE {sampled_bfs_base},
agg AS (
  SELECT id,
         (SELECT sc FROM scale) * CAST(SUM(dist) AS DOUBLE) AS farness,
         COUNT(CASE WHEN dist > 0 THEN 1 END) AS reached
  FROM best GROUP BY id)
SELECT n.id AS id,
       ROUND(COALESCE(a.farness, 0.0), 6) AS farness,
       CAST(COALESCE(a.reached, 0) AS BIGINT) AS reached,
       ROUND(CASE WHEN COALESCE(a.farness, 0.0) > 0
             THEN ((SELECT COUNT(*) FROM nodes) - 1) / a.farness
             ELSE 0.0 END, 6) AS closeness
FROM nodes n LEFT JOIN agg a ON a.id = n.id
"""
    harmonic_sampled_sql = f"""
WITH RECURSIVE {sampled_bfs_base},
agg AS (
  SELECT id, COUNT(*) AS reached, SUM(1.0 / dist) AS harm
  FROM best WHERE dist > 0 GROUP BY id)
SELECT n.id AS id,
       CAST(COALESCE(a.reached, 0) AS BIGINT) AS reached,
       ROUND((SELECT sc FROM scale) * COALESCE(a.harm, 0.0), 6) AS harmonic,
       ROUND(((SELECT sc FROM scale) * COALESCE(a.harm, 0.0))
             / ((SELECT COUNT(*) FROM nodes) - 1), 6) AS normalized
FROM nodes n LEFT JOIN agg a ON a.id = n.id
"""
    scc_sql = f"""
WITH RECURSIVE
e AS ({RETURNS_DIGRAPH_SQL}),
nodes AS (SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
reach(a, b) AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
),
mutual AS (
  SELECT n.id AS a, n.id AS b FROM nodes n
  UNION
  SELECT r1.a, r1.b FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
)
SELECT a AS id, MIN(b) AS scc FROM mutual GROUP BY a
"""
    sp_pair_sql = _delta_sssp_sql(COSUPPLIER_EDGES_SQL).replace(
        "SELECT dst AS id, ROUND(d, 6) AS dist",
        "SELECT ROUND(d, 6) AS total_cost",
    ) + "\n  AND dst = (SELECT MAX(dst) FROM e)"
    return {
        "sssp_hops2_cosupplier": sssp_sql,
        "sp_pair_cosupplier": sp_pair_sql,
        "astar_trade_nation": _astar_nation_sql(),
        "yen3_trade_nation": _yen_nation_sql(),
        "luby_mis_purchase": _luby_purchase_sql(),
        "wl_refine_cosupplier": _wl_cosupplier_sql(),
        "wl_refine_sum_purchase": _wl_sum_purchase_sql(),
        "balanced_partition_purchase": _bpart_purchase_sql(),
        "balanced_partition_cosupplier": _bpart_cosupplier_sql(),
        "balanced_partition_weighted_cosupplier": _bpart_weighted_cosupplier_sql(),
        "path_cooc_synth": _path_cooc_synth_sql(),
        "spectral_split_cosupplier": _spectral_cosupplier_sql(),
        "wcc_path_cooc_synth": _wcc_path_cooc_sql(),
        "affinity_levels_cosupplier": _affinity_cosupplier_sql(),
        "coloring_jp_nation": _jp_nation_sql(),
        "sssp_delta_cosupplier": _delta_sssp_sql(COSUPPLIER_EDGES_SQL),
        "apsp_nation": apsp_sql,
        "bfs_trade_nation": _bfs_nation_sql(),
        "graphlets_trade_nation": _graphlets_nation_sql(),
        "dfs_trade_nation": _dfs_nation_sql(),
        "apsp_weighted_nation": _apsp_weighted_sql(TRADE_NATION_W_SQL),
        "apsp_weighted_sampled_nation": _apsp_weighted_sql(
            TRADE_NATION_W_SQL, source_pred="src % 3 = 0"
        ),
        "closeness_nation": closeness_sql,
        "closeness_wf_nation": closeness_wf_sql,
        "landmark_est_nation": landmark_estimate_sql(
            TRADE_NATION_SQL,
            "id % 3 = 0",
            """SELECT a.id AS src, b.id AS dst FROM nodes a JOIN nodes b
               ON a.id % 5 = 0 AND a.id < b.id""",
            max_hops=8,
        ),
        "eccentricity_nation": eccentricity_sql(TRADE_NATION_SQL, max_hops=8),
        "diameter_nation": graph_diameter_sql(TRADE_NATION_SQL, max_hops=8),
        "closeness_sampled_nation": closeness_sampled_sql,
        "harmonic_nation": harmonic_sql,
        "dangalchev_nation": f"""
WITH RECURSIVE {bfs_base}
SELECT nd.id AS id,
       CAST(COALESCE(h.reached, 0) AS BIGINT) AS reached,
       ROUND(COALESCE(h.dang, 0.0), 6) AS dangalchev
FROM nodes nd LEFT JOIN (
  SELECT source AS id, COUNT(*) AS reached,
         SUM(1.0 / (CAST(1 AS BIGINT) << dist)) AS dang
  FROM best WHERE dist > 0 GROUP BY source) h ON h.id = nd.id
""",
        "harmonic_sampled_nation": harmonic_sampled_sql,
        "scc_returns": scc_sql,
        "bowtie_returns": _bowtie_returns_sql(),
        "topo_levels_orderchain": _topo_orderchain_sql(),
        "condensation_returns": _condensation_returns_sql(),
        "condensation_levels_returns": _condensation_levels_returns_sql(),
        "bridges_nation_supplier": _bridges_sql_wrapped(),
        "articulation_nation_supplier": _articulation_sql_wrapped(),
        "earliest_arrival_returns": _earliest_arrival_sql_wrapped(),
        "temporal_closeness_returns": _temporal_closeness_sql_wrapped(),
        "temporal_pr_returns": temporal_pagerank_sql(
            TEMPORAL_RETURNS_SQL, n_windows=8
        ),
        "earliest_arrival_weighted_returns": _earliest_arrival_weighted_sql_wrapped(),
        "latest_departure_returns": _latest_departure_sql_wrapped(),
        "matching_cosupplier": _matching_sql_wrapped(),
        "densest_purchase": _densest_sql_wrapped(),
        "mst_cosupplier": _mst_minimax_sql(COSUPPLIER_EDGES_SQL),
        "kspanning_cosupplier": _kspanning_sql(COSUPPLIER_EDGES_SQL, k=4),
        "eigenvector_purchase": _eigenvector_sql_wrapped(),
        "fastrp_purchase": _fastrp_sql_wrapped(),
        "feature_prop_purchase": _feature_prop_sql_wrapped(),
        "fastrp_knn_purchase": _fastrp_knn_sql_wrapped(),
        "katz_purchase": _katz_sql_wrapped(),
        "hits_purchase": _hits_sql_wrapped(),
        "salsa_purchase": _salsa_sql_wrapped(),
        "assortativity_purchase": _assortativity_sql_wrapped(),
        "attr_assortativity_cosupplier": _attr_assortativity_sql_wrapped(),
        "sparsify_cosupplier": sparsify_local_degree_sql(COSUPPLIER_EDGES_SQL),
        "configmodel_trade_nation": configuration_model_sql(
            TRADE_NATION_SQL, seed=11
        ),
        "robustness_trade_nation": robustness_curve_sql(
            TRADE_NATION_SQL, steps=4, frac_per_step=0.12
        ),
        "motifsig_trade_nation": motif_significance_sql(
            TRADE_NATION_SQL, n_samples=3
        ),
        "forestfire_purchase": forest_fire_sample_sql(
            PURCHASE_EDGES_SQL, [1, 7], p_num=1, p_den=3, max_rounds=5
        ),
        "richclub_cosupplier": _richclub_sql_wrapped(),
        "reciprocity_trade_nation": _reciprocity_sql_wrapped(),
        "pagerank_coproject": _pagerank_sql(
            iters=5,
            weighted=True,
            edge_sql="""
SELECT node1 AS src, node2 AS dst, CAST(weight AS DOUBLE) AS weight FROM (
  SELECT a.l_suppkey AS node1, b.l_suppkey AS node2, COUNT(*) AS weight
  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
  JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2)
""",
        ),
        "induced_subgraph_cosupplier": _induced_sql_wrapped(),
        "coproject_cosupplier": """
SELECT a.l_suppkey AS node1, b.l_suppkey AS node2, COUNT(*) AS weight
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b
  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
GROUP BY 1, 2
""",
        # deterministic random walks — the module's own SQL generator
        # unrolls one window-argmin CTE per step
        "walks_cosupplier": _walks_sql_wrapped(),
        "walk_sequences_cosupplier": _walk_sequences_sql(),
        "node2vec_cosupplier": _node2vec_sql_wrapped(),
        "weighted_walks_cosupplier": _weighted_walks_sql_wrapped(),
        # node similarity — co-neighbor join + degree join, DuckDB's
        # integer `/` is float division so no casts needed; rank is a
        # legal alias (matches the pagerank oracle's usage)
        "linkpred_auc_purchase": _linkpred_auc_sql_wrapped(),
        "linkpred_purchase_topn": f"""
WITH e AS ({PURCHASE_EDGES_SQL}),
nbr0 AS (SELECT DISTINCT src, nbr FROM (
           SELECT src, dst AS nbr FROM e
           UNION ALL SELECT dst AS src, src AS nbr FROM e)
         WHERE src <> nbr),
keep AS (SELECT nbr FROM (SELECT nbr, COUNT(*) AS f FROM nbr0 GROUP BY nbr)
         WHERE f <= 50),
nbr AS (SELECT nbr0.* FROM nbr0 JOIN keep USING (nbr)),
deg AS (SELECT src, COUNT(*) AS deg FROM nbr0 GROUP BY src),
wn AS (SELECT nbr.src, nbr.nbr,
              CASE WHEN d.deg > 1 THEN 1.0 / ln(d.deg) ELSE 0.0 END AS w
       FROM nbr JOIN deg d ON d.src = nbr.nbr),
cand AS (SELECT a.src AS node1, b.src AS node2, SUM(a.w) AS raw
         FROM wn a JOIN nbr b ON a.nbr = b.nbr AND a.src < b.src
         GROUP BY 1, 2),
ex AS (SELECT src AS node1, nbr AS node2 FROM nbr0 WHERE src < nbr),
sc AS (SELECT c.node1, c.node2, ROUND(c.raw, 6) AS score
       FROM cand c ANTI JOIN ex ON c.node1 = ex.node1 AND c.node2 = ex.node2)
SELECT node1, node2, score FROM sc
ORDER BY score DESC, node1 ASC, node2 ASC LIMIT 100
""",
        "nodesim_pearson_cosupplier": _weighted_nodesim_sql_wrapped("pearson"),
        "nodesim_euclidean_cosupplier": _weighted_nodesim_sql_wrapped("euclidean"),
        "nodesim_lsh_suppliers": _nodesim_lsh_sql_wrapped(),
        "nodesim_suppliers_jaccard": f"""
WITH e AS ({PURCHASE_EDGES_SQL}),
nbr AS (SELECT DISTINCT e.dst AS src, e.src AS nbr FROM e),
deg AS (SELECT src, COUNT(*) AS deg FROM nbr GROUP BY src),
cm AS (SELECT a.src AS node1, b.src AS node2, COUNT(*) AS common
       FROM nbr a JOIN nbr b ON a.nbr = b.nbr AND a.src < b.src
       GROUP BY 1, 2),
sc AS (SELECT node1, node2,
              ROUND(cm.common / (d1.deg + d2.deg - cm.common), 6) AS similarity
       FROM cm JOIN deg d1 ON d1.src = cm.node1
               JOIN deg d2 ON d2.src = cm.node2)
SELECT node1, node2, similarity FROM sc WHERE similarity >= 0.24
""",
        "nodesim_topk_cosupplier": f"""
WITH ce AS ({COSUPPLIER_EDGES_SQL}),
nbr AS (SELECT DISTINCT src, nbr FROM (
          SELECT src, dst AS nbr FROM ce
          UNION ALL SELECT dst AS src, src AS nbr FROM ce)
        WHERE src <> nbr),
deg AS (SELECT src, COUNT(*) AS deg FROM nbr GROUP BY src),
cm AS (SELECT a.src AS node1, b.src AS node2, COUNT(*) AS common
       FROM nbr a JOIN nbr b ON a.nbr = b.nbr AND a.src < b.src
       GROUP BY 1, 2),
sc AS (SELECT node1, node2,
              ROUND(cm.common / sqrt(d1.deg * d2.deg), 6) AS similarity
       FROM cm JOIN deg d1 ON d1.src = cm.node1
               JOIN deg d2 ON d2.src = cm.node2),
sym AS (SELECT node1 AS node, node2 AS other, similarity FROM sc
        UNION ALL
        SELECT node2 AS node, node1 AS other, similarity FROM sc),
rk AS (SELECT node, other, similarity,
              ROW_NUMBER() OVER (PARTITION BY node
                                 ORDER BY similarity DESC, other ASC) AS rank
       FROM sym)
SELECT node, other, similarity, rank FROM rk WHERE rank <= 3
""",
        "numeric_guards_orders": """
WITH v AS (
  SELECT o_orderkey AS id,
         CASE WHEN o_orderkey % 5 = 0 THEN CAST('Infinity' AS DOUBLE)
              WHEN o_orderkey % 5 = 1 THEN CAST('-Infinity' AS DOUBLE)
              WHEN o_orderkey % 5 = 2 THEN CAST('NaN' AS DOUBLE)
              WHEN o_orderkey % 5 = 3 THEN NULL
              ELSE o_totalprice END AS x
  FROM orders)
SELECT id,
       (x IS NOT NULL AND NOT isnan(x) AND NOT isinf(x)) AS finite,
       (x IS NOT NULL AND isinf(x)) AS infinite
FROM v""",
        "betweenness_nation": _brandes_sql(TRADE_NATION_SQL),
        "simrank_trade_nation": simrank_sql(
            TRADE_NATION_SQL, direction="OUTGOING", iterations=4
        ),
        "localcom_trade_nation": local_community_sweep_sql(
            TRADE_NATION_SQL, seed_node=0, iterations=6
        ),
        "simrank_sampled_trade_nation": simrank_sampled_sql(
            TRADE_NATION_SQL, 0, walk_length=4, walks_per_node=8,
            direction="BOTH",
        ),
        "girth_trade_nation": girth_sql(TRADE_NATION_SQL, max_hops=4),
        "triads_trade_nation": triad_census_sql(TRADE_NATION_SQL),
        "sgns_trade_nation": sgns_embeddings_sql(
            TRADE_NATION_SQL, dim=4, walk_length=3, walks_per_node=3,
            window=2, negatives=2, epochs=2, lr=0.2,
        ),
        "labelspread_trade_nation": seeded_label_spread_sql(
            TRADE_NATION_SQL,
            "SELECT * FROM (VALUES (0, 0), (12, 1), (24, 2)) s(id, label)",
            iterations=4,
        ),
        "percolation_trade_nation": clique_percolation_sql(TRADE_NATION_SQL),
        "ppr_batch_trade_nation": ppr_batch_sql(
            TRADE_NATION_SQL, [0, 5, 10], iterations=6, direction="OUTGOING"
        ),
        "steiner_trade_nation": steiner_backbone_sql(
            TRADE_NATION_W_SQL, [0, 3, 7, 12, 18], max_hops=6
        ),
        "influence_trade_nation": influence_maximization_sql(
            TRADE_NATION_SQL, k=3, n_samples=24, p_num=1, p_den=4, max_hops=8
        ),
        "edge_betweenness_nation": _brandes_edge_sql(TRADE_NATION_SQL),
        "girvan_newman_nation": _girvan_newman_sql(TRADE_NATION_SQL, k=30),
        "wcc_sqlproj_nation": _wcc_reach_sql(TRADE_NATION_SQL),
    }


def _pipeline_oracles() -> dict[str, str]:
    from linkgraph.pipeline.events import windowed_anomalies_sql
    from linkgraph.pipeline.dedup import (
        fuzzy_dup_pairs_sql,
        EXACT_DEDUP_SQL,
        containment_pairs_sql,
        jaccard_pairs_df_capped_sql,
        jaccard_pairs_sql,
        near_dup_clusters_sql,
        pick_canonical_sql,
        simhash_pairs_sql,
        simhash_table_sql,
        source_overlap_sql,
    )
    from linkgraph.pipeline.multimodal import asset_features_sql, video_frames_sql
    from linkgraph.pipeline.prep import corpus_prep_sql
    from linkgraph.pipeline.simsearch import (
        ann_ivf_topk_sql,
        ann_lsh_topk_sql,
        embedding_covariance_sql,
        kmeans_clusters_sql,
        cosine_topk_sql,
        near_dup_pairs_sql,
        pq_encode_sql,
        quantize_embeddings_sql,
        semantic_dedup_pairs_sql,
    )
    from linkgraph.pipeline.text import (
        LANGUAGE_ID_SQL,
        NORMALIZE_TEXT_SQL,
        QUALITY_SCORES_SQL,
        REPETITION_SCORES_SQL,
        DUPLICATE_STRUCTURE_SQL,
        c4_clean_sql,
        gopher_quality_sql,
        SOURCE_MIX_SQL,
        TOKEN_STATS_SQL,
        fingerprints_sql,
        bm25_search_sql,
        ngram_lm_sql,
        pmi_collocations_sql,
        perplexity_scores_sql,
        redact_pii_sql,
        winnow_fingerprints_sql,
        tfidf_topk_sql,
        vocab_stats_sql,
        zipf_fit_sql,
    )
    from linkgraph.pipeline.curate import (
        chunk_documents_sql,
        corpus_shuffle_sql,
        bloom_decontaminate_sql,
        decontaminate_sql,
        dsir_sample_sql,
        dsir_scores_sql,
        line_dedup_sql,
        pack_sequences_sql,
        quota_sample_sql,
        stratified_sample_sql,
    )

    return {
        "dedup_exact": EXACT_DEDUP_SQL,
        "dup_spans_documents": _dup_spans_sql_wrapped(),
        "cross_contamination_minhash": _cross_contamination_sql_wrapped(),
        "source_overlap_documents": source_overlap_sql(),
        "multimodal_ahash": _ahash_sql_wrapped(),
        "multimodal_ahash_pairs": _ahash_pairs_sql_wrapped(),
        "dedup_jaccard_pairs": jaccard_pairs_sql(n=3, threshold=0.8),
        "dedup_jaccard_df_capped": jaccard_pairs_df_capped_sql(
            n=3, threshold=0.8, df_cap=50
        ),
        # prefix filtering is lossless — its oracle IS the brute SQL
        "dedup_jaccard_prefix": jaccard_pairs_sql(n=3, threshold=0.8),
        # LSH banding at 32 hashes / 8 bands has ~1e-9 miss probability
        # for the >=0.8-Jaccard pairs in this corpus, so the verified
        # LSH output equals the brute-force oracle (and the candidate
        # verification step guarantees precision).
        "dedup_minhash_lsh": jaccard_pairs_sql(n=3, threshold=0.8),
        # clusters over the same (LSH == brute-force here) pair set
        "dedup_near_dup_clusters": near_dup_clusters_sql(
            jaccard_pairs_sql(n=3, threshold=0.8)
        ),
        "dedup_report_docs": _dedup_report_sql_wrapped(),
        # representative pick over the same cluster oracle
        "dedup_canonical_pick": pick_canonical_sql(
            jaccard_pairs_sql(n=3, threshold=0.8)
        ),
        # SemDeDup is deterministic (stride centroids, argmax round-6
        # assignment) => exact cluster-bounded oracle
        "sim_semantic_dedup": semantic_dedup_pairs_sql(
            dim=64, n_clusters=16, threshold=0.4
        ),
        # composed pipeline: same stage SQL, same joins
        "curate_chunk_documents": chunk_documents_sql(chunk_len=64, stride=48),
        "pipeline_corpus_prep": corpus_prep_sql(
            jaccard_pairs_sql(n=3, threshold=0.8), min_quality=0.5
        ),
        "pipeline_corpus_prep_lm": f"""
WITH base AS ({corpus_prep_sql(jaccard_pairs_sql(n=3, threshold=0.8), min_quality=0.5)}),
ppl AS ({perplexity_scores_sql(n=2, k=1.0)})
SELECT base.*, ppl.cross_entropy
FROM base JOIN ppl ON ppl.doc_id = base.doc_id
""",
        "simhash_table": simhash_table_sql(bits=32),
        "simhash_pairs": simhash_pairs_sql(bits=32, max_hamming=3),
        "text_token_stats": TOKEN_STATS_SQL,
        "text_quality_scores": QUALITY_SCORES_SQL,
        "text_language_id": LANGUAGE_ID_SQL,
        "text_fingerprints": fingerprints_sql(k=16),
        "text_ngram_novelty": _ngram_novelty_sql_wrapped(),
        "text_repetition": REPETITION_SCORES_SQL,
        "text_dup_structure": DUPLICATE_STRUCTURE_SQL,
        "text_c4_clean": c4_clean_sql(),
        "text_gopher_quality": gopher_quality_sql(),
        "quality_classifier_docs": _quality_classifier_sql(),
        "classifier_calibration_docs": _calibration_report_sql(),
        "dbh_partition_cosupplier": _dbh_partition_sql(),
        "text_vocab_topk": vocab_stats_sql(k=20),
        # rounded-ln integer regression moments => exact at 6 decimals
        "text_zipf_fit": zipf_fit_sql(top_ranks=500),
        "text_bpe_merges": _bpe_sql_wrapped(),
        "text_bpe_census": _bpe_census_sql_wrapped(),
        "text_bpe_tokenize": _bpe_tokenize_sql_wrapped(),
        "text_countmin_topk": _countmin_sql_wrapped(),
        "text_hll_distinct": _hll_sql_wrapped(),
        "text_length_quantiles": _length_quantiles_sql_wrapped(),
        "text_normalize": NORMALIZE_TEXT_SQL,
        "text_source_mix": SOURCE_MIX_SQL,
        "dedup_containment_pairs": containment_pairs_sql(n=3, threshold=0.8),
        "curate_decontaminate": decontaminate_sql("doc_id % 29 = 0", n=8),
        "contamination_report_docs": _contamination_report_sql(),
        "curate_bloom_decontaminate": bloom_decontaminate_sql(
            "doc_id % 29 = 0", n=8, m_bits=1 << 18, k_hashes=3
        ),
        "curate_dsir_scores": dsir_scores_sql("source = 'src0'", n=2, buckets=1009),
        "curate_dsir_sample": dsir_sample_sql(
            "source = 'src0'", 100, n=2, buckets=1009, seed=7
        ),
        "curate_stratified_sample": stratified_sample_sql(
            _STRAT_RATES, default_rate=0.1, seed=7
        ),
        "curate_quota_sample": quota_sample_sql(quota=25, by="lang", seed=7),
        "curate_corpus_shuffle": corpus_shuffle_sql(n_shards=8, seed=7),
        "curate_pack_sequences": pack_sequences_sql(seq_len=128, n_shards=8, seed=7),
        "curate_line_dedup": line_dedup_sql(max_df=390, sep=" "),
        "text_tfidf_topk": tfidf_topk_sql(k=5),
        "text_ngram_lm": ngram_lm_sql(n=2, min_count=5),
        "text_pmi_collocations": pmi_collocations_sql(top_k=20, min_count=5),
        "text_perplexity": perplexity_scores_sql(n=2, k=1.0),
        "text_winnow_fingerprints": winnow_fingerprints_sql(k=8, w=16),
        "dedup_fuzzy_pairs": fuzzy_dup_pairs_sql(k=8, w=16, max_dist=40),
        "text_bm25_search": bm25_search_sql("table scan merge", top_n=20),
        "text_redact_pii": redact_pii_sql(text_expr="text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 or +1 555-000-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"),
        "sim_cosine_topk": cosine_topk_sql(dim=64, k=5),
        "sim_embedding_near_dup": near_dup_pairs_sql(dim=64, threshold=0.4),
        # LSH path verified against the SAME brute-force oracle: the
        # banding (r=2, b=32) miss probability at cosine 0.4 is ~8.5e-8
        # per pair, and the in-bucket verify keeps precision exact
        "sim_near_dup_lsh": near_dup_pairs_sql(dim=64, threshold=0.4),
        # sim_ann_lsh_topk: approximate in RECALL, deterministic in
        # OUTPUT at pinned n_planes — exact oracle over the same
        # inlined plane literals (engine-exact sign bits)
        "sim_ann_lsh_topk": ann_lsh_topk_sql(dim=64, k=5, n_planes=11),
        # sim_ann_ivf_topk: deterministic IVF => exact oracle
        "sim_ann_ivf_topk": ann_ivf_topk_sql(dim=64, k=5, n_centroids=16, n_probe=4),
        "mmr_select_embeddings": _mmr_embeddings_sql(),
        "kmeans_parallel_init_embeddings": _kmeans_parallel_sql(),
        "sim_kmeans_assign": kmeans_clusters_sql(dim=64, n_clusters=16, iters=2),
        "sim_kcenter_select": _kcenter_sql_wrapped(),
        # covariance: x6 integer moments + DECIMAL(38,0) numerator,
        # one shared double-division sequence => exact at 9 decimals
        "sim_embed_covariance": embedding_covariance_sql(dim=64),
        # int8 quantization: min/max are order-free, all arithmetic
        # explicitly double-promoted => exact
        "sim_quantize_embeddings": quantize_embeddings_sql(),
        "sim_pq_encode": pq_encode_sql(dim=64, m=8, n_centroids=16),
        "multimodal_features": asset_features_sql(n_features=4),
        # video decode stub: the UDTF-shaped mapInPandas chunking is
        # oracle-exact — byte slicing reproduced in hex-string space
        # (this DuckDB build lacks blob substring/sha256(BLOB))
        "multimodal_video_frames": video_frames_sql(frames=4),
        # event analytics — window/agg SQL mirrors. Epochs use
        # floor() (DuckDB CAST(double AS BIGINT) ROUNDS; Spark
        # unix_timestamp floors); window-SUM session indexes CAST back
        # to BIGINT (DuckDB SUM(int) -> HUGEINT -> float64 in pandas).
        "events_sessionize": _EVENTS_SESSIONIZE_SQL,
        "events_session_stats": _EVENTS_SESSION_STATS_SQL,
        "events_anomalies": windowed_anomalies_sql(bucket="hour", z_thresh=1.5),
        "events_windowed_counts": """
SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_funnel": """
WITH s1 AS (SELECT user_id, MIN(epoch(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, s1.t1, MIN(epoch(e.ts)) AS t2
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'click' AND epoch(e.ts) > s1.t1
       GROUP BY e.user_id, s1.t1),
s3 AS (SELECT e.user_id, MIN(epoch(e.ts)) AS t3
       FROM events e JOIN s2 ON e.user_id = s2.user_id
       WHERE e.event_type = 'purchase' AND epoch(e.ts) > s2.t2
       GROUP BY e.user_id)
SELECT 1 AS step_index, 'view' AS step, COUNT(*) AS users FROM s1
UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
""",
        "events_retention": """
WITH cohort AS (SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
                FROM events GROUP BY user_id),
active AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day
           FROM events)
SELECT CAST(floor(epoch(c.cohort_day)) AS BIGINT) AS cohort_day,
       CAST(date_diff('day', c.cohort_day, a.active_day) AS BIGINT) AS day_offset,
       COUNT(DISTINCT a.user_id) AS users
FROM active a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
""",
        "events_top_paths": f"""
WITH {_EVENTS_SESS_CORE},
p AS (SELECT user_id, session_idx,
             array_to_string((list(event_type ORDER BY ts, event_id))[1:10],
                             '>') AS path
      FROM labeled GROUP BY 1, 2)
SELECT path, COUNT(*) AS n_sessions FROM p GROUP BY path
ORDER BY n_sessions DESC, path ASC LIMIT 20
""",
        "events_coactivity_graph": """
WITH nbr AS (SELECT DISTINCT user_id AS src,
                    CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS nbr
             FROM events),
pairs AS (SELECT a.src AS node1, b.src AS node2, COUNT(*) AS weight
          FROM nbr a JOIN nbr b ON a.nbr = b.nbr AND a.src < b.src
          GROUP BY 1, 2)
SELECT node1, node2, weight FROM pairs WHERE weight >= 3
""",
        "events_transitions": """
WITH pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events),
cnt AS (SELECT from_type, to_type, COUNT(*) AS n
        FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2)
SELECT from_type, to_type, n,
       ROUND(n / SUM(n) OVER (PARTITION BY from_type), 6) AS p
FROM cnt
""",
        "events_props_stats": """
SELECT event_type,
       COUNT(*) AS n,
       COUNT(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS n_with_field,
       ROUND(SUM(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS sum_field,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_field
FROM events GROUP BY event_type
""",
    }
