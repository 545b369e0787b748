"""Procedure registry + numeric guard helpers.

algo.list analog (pub:algo/.../ListProc.java) and the isFinite /
isInfinite user functions (pub:algo/.../IsFiniteFunc.java,
SURVEY.md §2.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name -> (callable path, reference procedure, oracle-checkable)
PROCEDURES = {
    "pagerank": ("linkgraph.pagerank.pagerank", "algo.pageRank[.stream]", True),
    "pagerank_csr": ("linkgraph.csr.pagerank_csr", "algo.pageRank (CSR kernel path)", True),
    "connected_components": ("linkgraph.components.connected_components", "algo.unionFind[.stream]", True),
    "label_propagation": ("linkgraph.labelprop.label_propagation", "algo.labelPropagation", True),
    "triangle_count": ("linkgraph.triangles.triangle_count", "algo.triangleCount[.stream], algo.triangle.stream", True),
    "triangle_count_csr": ("linkgraph.csr.triangle_count_csr", "algo.triangleCount (CSR kernel path)", True),
    "strongly_connected_components": ("linkgraph.scc.strongly_connected_components", "algo.scc(.*)", True),
    "sssp": ("linkgraph.paths.sssp", "algo.shortestPath[.stream]", True),
    "sssp_delta_stepping": ("linkgraph.paths.sssp_delta_stepping", "algo.shortestPath.deltaStepping[.stream]", True),
    "all_shortest_paths_stream": ("linkgraph.paths.all_shortest_paths_stream", "algo.allShortestPaths.stream", True),
    "closeness_centrality": ("linkgraph.paths.closeness_centrality", "algo.closeness[.stream]", True),
    "harmonic_centrality": ("linkgraph.paths.harmonic_centrality", "algo.closeness.harmonic (lineage)", True),
    "shortest_path_pair": ("linkgraph.paths.shortest_path_pair", "algo.shortestPath (start/end pair)", True),
    "ms_bfs_distances": ("linkgraph.paths.ms_bfs_distances", "MultiSourceBFS (core util)", True),
    "bfs_stream": ("linkgraph.traversal.bfs_stream", "algo.bfs.stream", True),
    "dfs_stream": ("linkgraph.traversal.dfs_stream", "algo.dfs.stream", True),
    "minimum_spanning_forest": ("linkgraph.mst.minimum_spanning_forest", "algo.mst", False),
    "k_spanning_tree": ("linkgraph.mst.k_spanning_tree", "algo.spanningTree.kmin/.kmax", True),
    "betweenness_centrality": ("linkgraph.betweenness.betweenness_centrality", "algo.betweenness[.stream] (sampled: RA-Brandes lineage)", False),
    "infomap": ("linkgraph.infomap.infomap_local_move", "algo.infoMap (local-move sweep)", True),
    "infomap_multilevel": ("linkgraph.infomap.infomap", "algo.infoMap", False),
    "k_core": ("linkgraph.kcore.k_core", "(engine extension: iterative peeling)", True),
    "core_numbers": ("linkgraph.kcore.core_numbers", "(engine extension: h-index coreness)", True),
    "anf": ("linkgraph.anf.anf", "(engine extension: HyperBall neighborhood function)", True),
    "hyperball_harmonic": ("linkgraph.anf.hyperball_harmonic", "algo.closeness.harmonic (HyperBall sketch path)", True),
    "exact_dedup": ("linkgraph.pipeline.dedup.exact_dedup", "(pipeline extension)", True),
    "jaccard_pairs": ("linkgraph.pipeline.dedup.jaccard_pairs", "(pipeline extension)", True),
    "jaccard_pairs_df_capped": ("linkgraph.pipeline.dedup.jaccard_pairs_df_capped", "(pipeline extension)", True),
    "near_dup_clusters": ("linkgraph.pipeline.dedup.near_dup_clusters", "(pipeline extension)", True),
    "minhash_lsh_pairs": ("linkgraph.pipeline.dedup.minhash_lsh_pairs", "(pipeline extension)", True),
    "simhash_pairs": ("linkgraph.pipeline.dedup.simhash_pairs", "(pipeline extension)", True),
    "token_stats": ("linkgraph.pipeline.text.token_stats", "(pipeline extension)", True),
    "quality_scores": ("linkgraph.pipeline.text.quality_scores", "(pipeline extension)", True),
    "language_id": ("linkgraph.pipeline.text.language_id", "(pipeline extension)", True),
    "fingerprints": ("linkgraph.pipeline.text.fingerprints", "(pipeline extension)", True),
    "cosine_topk": ("linkgraph.pipeline.simsearch.cosine_topk", "(pipeline extension)", True),
    "ann_lsh_topk": ("linkgraph.pipeline.simsearch.ann_lsh_topk", "(pipeline extension)", False),
    "ann_ivf_topk": ("linkgraph.pipeline.simsearch.ann_ivf_topk", "(pipeline extension)", True),
    "near_dup_pairs": ("linkgraph.pipeline.simsearch.near_dup_pairs", "(pipeline extension)", True),
    "near_dup_pairs_lsh": ("linkgraph.pipeline.simsearch.near_dup_pairs_lsh", "(pipeline extension)", True),
    "jaccard_prefix_pairs": ("linkgraph.pipeline.dedup.jaccard_prefix_pairs", "(pipeline extension: exact AllPairs/PPJoin)", True),
    "kcenter_select": ("linkgraph.pipeline.simsearch.kcenter_select", "(pipeline extension: Gonzalez coreset)", True),
    "bpe_learn": ("linkgraph.pipeline.text.bpe_learn", "(pipeline extension: tokenizer training)", True),
    "bpe_tokenize": ("linkgraph.pipeline.text.bpe_tokenize", "(pipeline extension)", True),
    "countmin_sketch": ("linkgraph.pipeline.text.countmin_sketch", "(pipeline extension)", True),
    "hll_distinct": ("linkgraph.pipeline.text.hll_distinct", "(pipeline extension)", True),
    "length_quantiles": ("linkgraph.pipeline.text.length_quantiles", "(pipeline extension)", True),
    "propagate_features": ("linkgraph.embeddings.propagate_features", "(engine extension: SGC feature smoothing)", True),
    "attr_assortativity": ("linkgraph.graphs.attr_assortativity", "(engine extension: Newman 2003 mixing)", True),
    "contract_graph": ("linkgraph.community.contract_graph", "(engine extension: multilevel contraction)", True),
    "asset_features": ("linkgraph.pipeline.multimodal.asset_features", "(pipeline extension)", True),
    "decode_media": ("linkgraph.pipeline.multimodal.decode_media", "(pipeline extension)", False),
    "wl_refinement": ("linkgraph.wl.wl_refinement", "(engine extension: 1-WL color refinement)", True),
    "balanced_partition": ("linkgraph.partition.balanced_partition", "(engine extension: Spinner-lineage balanced LPA)", True),
    "spectral_bipartition": ("linkgraph.spectral.spectral_bipartition", "(engine extension: Fiedler sign split)", True),
    "affinity_clustering": ("linkgraph.affinity.affinity_clustering", "(engine extension: Boruvka HAC levels)", True),
    "path_cooccurrence_edges": ("linkgraph.ingest.path_cooccurrence_edges", "(engine extension: north-star path co-occurrence scan)", True),
    "mmr_select": ("linkgraph.pipeline.simsearch.mmr_select", "(pipeline extension: MMR diverse top-k)", True),
    "train_quality_classifier": ("linkgraph.pipeline.classifier.train_quality_classifier", "(pipeline extension: trained quality filter)", True),
    "approx_triangle_count": ("linkgraph.triangles.approx_triangle_count", "(engine extension: Doulion sampled triangles)", True),
    "effective_size": ("linkgraph.graphs.effective_size", "(engine extension: Burt structural holes)", True),
    "powerlaw_fit": ("linkgraph.graphs.powerlaw_fit", "(engine extension: CSN degree-distribution MLE)", True),
    "bowtie_decomposition": ("linkgraph.bowtie.bowtie_decomposition", "(engine extension: Broder web bow-tie macro-structure)", True),
    "degree_knn": ("linkgraph.graphs.degree_knn", "(engine extension: k_nn(k) degree-mixing profile)", True),
    "dedup_report": ("linkgraph.pipeline.dedup.dedup_report", "(pipeline extension: corpus dedup report)", True),
    "contamination_report": ("linkgraph.pipeline.curate.contamination_report", "(pipeline extension: per-source contamination card)", True),
    "streaming_components": ("linkgraph.streaming.ComponentMaintainer", "(streaming extension: incremental union-find maintenance)", False),
    "edge_partition_dbh": ("linkgraph.partition.edge_partition_dbh", "(engine extension: DBH vertex-cut placement)", True),
    "calibration_report": ("linkgraph.pipeline.classifier.calibration_report", "(pipeline extension: classifier reliability table)", True),
    "clustering_by_degree": ("linkgraph.graphs.clustering_by_degree", "(engine extension: c(k) closure profile)", True),
    "mixing_plan": ("linkgraph.pipeline.curate.mixing_plan", "(pipeline extension: data-mixture sampling plan)", True),
    "kmeans_parallel_init": ("linkgraph.pipeline.simsearch.kmeans_parallel_init", "(pipeline extension: Bahmani scalable k-means init)", True),
    "ifub_diameter": ("linkgraph.paths.ifub_diameter", "(engine extension: iFUB exact diameter, few-BFS path)", True),
    "temporal_closeness": ("linkgraph.temporal.temporal_closeness", "(engine extension: time-respecting harmonic closeness)", True),
}


def algo_list() -> list[dict]:
    """algo.list analog: enumerate registered procedures."""
    return [
        {"name": k, "impl": v[0], "reference_procedure": v[1], "oracle": v[2]}
        for k, v in sorted(PROCEDURES.items())
    ]


def is_finite(col: Column | str) -> Column:
    """algo.isFinite analog (true for non-null, non-NaN, non-inf)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ~F.isnan(c) & (F.abs(c) != F.lit(float("inf")))


def is_infinite(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & (F.abs(c) == F.lit(float("inf")))
