"""Training-data pipeline operators over document / embedding tables.

Beyond the reference's graph procedures, a 100TB link-graph corpus
needs corpus-preparation operators: deduplication (exact, MinHash+LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language id, quality
scoring, token stats, fingerprinting) and multimodal column plumbing.

Design rules (same as the graph engine):
  * JVM-side Catalyst expressions wherever the semantics allow — every
    deterministic operator here has a DuckDB-checkable SQL oracle;
  * pandas/Arrow UDFs (vectorized numpy) only where built-ins can't
    express it (ANN signatures, fake media decode) — never per-row
    Python;
  * cross-engine determinism via a stable md5-prefix hash (see
    linkgraph.pipeline.hashing) instead of engine-specific hash64s.
"""

from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql
from linkgraph.pipeline.dedup import (
    auto_simhash_params,
    containment_pairs,
    cross_minhash_pairs,
    source_overlap,
    source_overlap_sql,
    duplicate_spans,
    exact_dedup,
    fuzzy_decontaminate,
    near_dup_clusters,
    fuzzy_dup_pairs,
    jaccard_pairs,
    jaccard_pairs_df_capped,
    jaccard_prefix_pairs,
    jaccard_prefix_pairs_sql,
    minhash_lsh_pairs,
    pick_canonical,
    simhash_table,
    simhash_pairs,
)
from linkgraph.pipeline.prep import corpus_prep
from linkgraph.pipeline.curate import (
    corpus_shuffle,
    bloom_decontaminate,
    decontaminate,
    dsir_sample,
    dsir_scores,
    pack_sequences,
    chunk_documents,
    quota_sample,
    stratified_sample,
)
from linkgraph.pipeline.classifier import (
    train_quality_classifier,
    train_quality_classifier_sql,
)
from linkgraph.pipeline.text import (
    bpe_learn,
    bpe_learn_sql,
    bpe_token_census,
    bpe_token_census_sql,
    bpe_tokenize,
    bpe_tokenize_sql,
    countmin_estimate,
    countmin_estimate_sql,
    countmin_sketch,
    countmin_sketch_sql,
    hll_distinct,
    hll_distinct_sql,
    length_quantiles,
    length_quantiles_sql,
    ngram_novelty,
    token_stats,
    quality_scores,
    language_id,
    fingerprints,
    winnow_fingerprints,
    normalize_text,
    pmi_collocations,
    c4_clean,
    gopher_quality,
    duplicate_structure_stats,
    repetition_scores,
    source_mix,
    vocab_stats,
    zipf_fit,
    zipf_fit_sql,
)
from linkgraph.pipeline.simsearch import (
    ann_ivf_topk,
    ann_lsh_topk,
    auto_n_clusters,
    auto_n_planes,
    cosine_topk,
    kcenter_select,
    kcenter_select_sql,
    embedding_covariance,
    embedding_covariance_sql,
    pca_project,
    kmeans_clusters,
    near_dup_pairs,
    near_dup_pairs_lsh,
    semantic_cluster_assign,
    semantic_dedup_pairs,
)
from linkgraph.pipeline.multimodal import (
    synth_assets,
    asset_features,
    decode_media,
    decode_png,
    decode_wav_pcm16,
    encode_png,
    encode_wav_pcm16,
)
from linkgraph.pipeline.events import (
    funnel,
    props_stats,
    retention_cohorts,
    session_stats,
    sessionize,
    windowed_anomalies,
    windowed_counts,
)

__all__ = [
    "stable_hash64", "stable_hash64_sql",
    "exact_dedup", "fuzzy_dup_pairs", "jaccard_pairs", "jaccard_pairs_df_capped",
    "jaccard_prefix_pairs", "jaccard_prefix_pairs_sql", "minhash_lsh_pairs",
    "simhash_table", "simhash_pairs", "near_dup_clusters", "pick_canonical",
    "semantic_dedup_pairs", "semantic_cluster_assign", "corpus_prep",
    "decontaminate", "bloom_decontaminate", "dsir_scores", "dsir_sample",
    "stratified_sample", "quota_sample",
    "corpus_shuffle", "pack_sequences", "chunk_documents",
    "bpe_learn", "bpe_learn_sql", "bpe_token_census", "bpe_token_census_sql", "bpe_tokenize", "bpe_tokenize_sql",
    "countmin_sketch", "countmin_sketch_sql", "countmin_estimate", "countmin_estimate_sql",
    "hll_distinct", "hll_distinct_sql", "length_quantiles", "length_quantiles_sql",
    "token_stats", "quality_scores", "language_id", "fingerprints",
    "winnow_fingerprints",
    "repetition_scores", "duplicate_structure_stats", "c4_clean", "gopher_quality", "vocab_stats", "containment_pairs",
    "zipf_fit", "zipf_fit_sql",
    "pmi_collocations",
    "normalize_text", "source_mix",
    "cosine_topk", "near_dup_pairs", "near_dup_pairs_lsh",
    "ann_ivf_topk", "ann_lsh_topk", "auto_n_clusters", "auto_n_planes",
    "kcenter_select", "kcenter_select_sql",
    "embedding_covariance", "embedding_covariance_sql", "pca_project",
    "kmeans_clusters",
    "auto_simhash_params",
    "synth_assets", "asset_features", "decode_media",
    "encode_wav_pcm16", "decode_wav_pcm16", "encode_png", "decode_png",
    "sessionize", "session_stats", "windowed_counts", "windowed_anomalies",
    "funnel", "retention_cohorts", "props_stats",
    "train_quality_classifier", "train_quality_classifier_sql",
]
