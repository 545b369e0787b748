"""linkgraph — a PySpark-native link-graph analytics engine.

Brand-new engine (NOT a port) re-creating the query capabilities of the
reference `mknblch/neo4j-graph-algorithms` (see SURVEY.md; the local
reference snapshot is empty, citations use the `pub:` convention of
SURVEY.md §0): PageRank, union-find connected components, label
propagation, triangle count / clustering coefficient — re-expressed as
Spark DataFrame plans (gather-scatter joins + aggregations) instead of
the reference's shared-memory Java arrays.

Data model (SURVEY.md §1.4):
  edges  DataFrame(src: long, dst: long [, weight: double])
  nodes  DataFrame(id: long, key: string [, ...props])
"""

from linkgraph.session import get_spark
from linkgraph.ids import dense_ids, edges_from_pairs
from linkgraph.pagerank import pagerank, PageRankResult
from linkgraph.components import connected_components, canonical_components, ComponentsResult
from linkgraph.labelprop import (
    label_propagation,
    seeded_label_spread,
    seeded_label_spread_sql,
    LabelPropagationResult,
)
from linkgraph.triangles import balanced_triads, triangle_count, TriangleResult
from linkgraph.csr import pagerank_csr, triangle_count_csr
from linkgraph.scc import strongly_connected_components, SccResult
from linkgraph.paths import (
    shortest_path_pair,
    sssp,
    sssp_delta_stepping,
    ms_bfs_distances,
    ms_relax_distances,
    closeness_centrality,
    harmonic_centrality,
    dangalchev_centrality,
    all_shortest_paths_stream,
    SsspResult,
)
from linkgraph.mst import (
    minimum_spanning_forest,
    minimum_spanning_tree,
    k_spanning_tree,
    steiner_backbone,
    steiner_backbone_sql,
    MstResult,
    KSpanningResult,
    SteinerResult,
)
from linkgraph.betweenness import (
    betweenness_centrality,
    edge_betweenness,
    girvan_newman_split,
    BetweennessResult,
    EdgeBetweennessResult,
)
from linkgraph.kcore import (
    k_core,
    core_numbers,
    onion_layers,
    KCoreResult,
    CorenessResult,
)
from linkgraph.simrank import (
    simrank,
    simrank_sampled,
    simrank_sampled_sql,
    simrank_sql,
    SimRankResult,
)
from linkgraph.localcom import (
    local_community_sweep,
    local_community_sweep_sql,
    ppr_batch,
    ppr_batch_sql,
    LocalCommunityResult,
)
from linkgraph.percolation import (
    clique_percolation,
    clique_percolation_sql,
    PercolationResult,
)
from linkgraph.influence import (
    influence_maximization,
    influence_maximization_sql,
    InfluenceResult,
)
from linkgraph.anf import (
    anf,
    AnfResult,
    effective_diameter,
    hyperball_harmonic,
    neighborhood_function,
)
from linkgraph.registry import algo_list, is_finite, is_infinite
from linkgraph.io import edges_from_sql, iceberg_available, read_table, write_results
from linkgraph.checkpoint import TerminatedError, TerminationFlag
from linkgraph.graphs import (
    degree_assortativity,
    sparsify_local_degree,
    configuration_model,
    robustness_curve,
    motif_significance,
    forest_fire_sample,
    graphlet_counts,
    degree_centrality,
    degree_histogram,
    induced_subgraph,
    sample_edges,
)
from linkgraph.eigenvector import eigenvector_centrality, hits, katz_centrality
from linkgraph.embeddings import (
    fastrp_embeddings,
    fastrp_knn,
    sgns_embeddings,
    sgns_embeddings_sql,
)
from linkgraph.similarity import (
    link_prediction_auc,
    link_prediction_auc_sql,
    node_similarity_lsh,
    bipartite_projection,
    link_prediction,
    node_similarity,
    node_similarity_topk,
)
from linkgraph.walks import (
    node2vec_walks,
    random_walks,
    walks_as_sequences,
)
from linkgraph.community import (
    LouvainResult,
    community_stats,
    louvain,
    louvain_local_move,
    modularity,
    refine_communities,
)
from linkgraph.infomap import (
    InfomapResult,
    infomap,
    infomap_local_move,
    map_equation,
)
from linkgraph.traversal import (
    bfs_stream,
    dfs_stream,
)
from linkgraph.articlerank import (
    ArticleRankResult,
    article_rank,
)
from linkgraph.coloring import (
    ColoringResult,
    jones_plassmann,
    luby_mis,
)
from linkgraph.kpaths import (
    AStarResult,
    YenResult,
    astar_path,
    yen_k_shortest,
)
from linkgraph.truss import (
    TrussResult,
    edge_support,
    k_truss,
)
from linkgraph.loader import GraphCatalog, LinkGraph
from linkgraph.densest import densest_subgraph, DensestResult
from linkgraph.dag import (
    CycleError,
    condensation,
    is_dag,
    topological_levels,
)
from linkgraph.bridges import articulation_points, bridges
from linkgraph.girth import girth, girth_sql, GirthResult
from linkgraph.triads import triad_census, triad_census_sql, TRIAD_NAMES
from linkgraph.temporal import (
    earliest_arrival,
    latest_departure,
    temporal_pagerank,
    temporal_pagerank_sql,
)
from linkgraph.matching import maximal_matching, MatchingResult

__all__ = [
    "get_spark",
    "dense_ids",
    "edges_from_pairs",
    "pagerank",
    "pagerank_csr",
    "PageRankResult",
    "connected_components",
    "canonical_components",
    "ComponentsResult",
    "label_propagation",
    "seeded_label_spread",
    "seeded_label_spread_sql",
    "LabelPropagationResult",
    "triangle_count",
    "balanced_triads",
    "triangle_count_csr",
    "TriangleResult",
    "strongly_connected_components",
    "SccResult",
    "simrank",
    "simrank_sql",
    "simrank_sampled",
    "simrank_sampled_sql",
    "SimRankResult",
    "local_community_sweep",
    "local_community_sweep_sql",
    "LocalCommunityResult",
    "ppr_batch",
    "ppr_batch_sql",
    "clique_percolation",
    "clique_percolation_sql",
    "PercolationResult",
    "onion_layers",
    "influence_maximization",
    "influence_maximization_sql",
    "InfluenceResult",
    "topological_levels",
    "condensation",
    "is_dag",
    "CycleError",
    "bridges",
    "articulation_points",
    "girth",
    "girth_sql",
    "GirthResult",
    "triad_census",
    "triad_census_sql",
    "TRIAD_NAMES",
    "earliest_arrival",
    "latest_departure",
    "temporal_pagerank",
    "temporal_pagerank_sql",
    "maximal_matching",
    "MatchingResult",
    "node_similarity_lsh",
    "densest_subgraph",
    "DensestResult",
    "shortest_path_pair",
    "sssp",
    "sssp_delta_stepping",
    "ms_bfs_distances",
    "edges_from_sql",
    "iceberg_available",
    "read_table",
    "degree_histogram",
    "LinkGraph",
    "GraphCatalog",
    "TerminationFlag",
    "TerminatedError",
    "write_results",
    "ms_relax_distances",
    "closeness_centrality",
    "harmonic_centrality",
    "dangalchev_centrality",
    "all_shortest_paths_stream",
    "SsspResult",
    "minimum_spanning_forest",
    "minimum_spanning_tree",
    "k_spanning_tree",
    "MstResult",
    "KSpanningResult",
    "steiner_backbone",
    "steiner_backbone_sql",
    "SteinerResult",
    "betweenness_centrality",
    "edge_betweenness",
    "EdgeBetweennessResult",
    "girvan_newman_split",
    "k_core",
    "core_numbers",
    "KCoreResult",
    "CorenessResult",
    "anf",
    "AnfResult",
    "neighborhood_function",
    "effective_diameter",
    "hyperball_harmonic",
    "BetweennessResult",
    "algo_list",
    "is_finite",
    "is_infinite",
    "degree_assortativity",
    "graphlet_counts",
    "degree_centrality",
    "induced_subgraph",
    "sample_edges",
    "sparsify_local_degree",
    "configuration_model",
    "robustness_curve",
    "motif_significance",
    "forest_fire_sample",
    "eigenvector_centrality",
    "katz_centrality",
    "fastrp_embeddings",
    "fastrp_knn",
    "sgns_embeddings",
    "sgns_embeddings_sql",
    "hits",
    "node_similarity",
    "node_similarity_topk",
    "bipartite_projection",
    "link_prediction",
    "link_prediction_auc",
    "link_prediction_auc_sql",
    "random_walks",
    "node2vec_walks",
    "walks_as_sequences",
    "modularity",
    "community_stats",
    "louvain",
    "louvain_local_move",
    "refine_communities",
    "InfomapResult",
    "infomap",
    "infomap_local_move",
    "map_equation",
    "bfs_stream",
    "dfs_stream",
    "LouvainResult",
    "edge_support",
    "k_truss",
    "TrussResult",
    "article_rank",
    "ArticleRankResult",
    "astar_path",
    "AStarResult",
    "yen_k_shortest",
    "YenResult",
    "luby_mis",
    "jones_plassmann",
    "ColoringResult",
]
