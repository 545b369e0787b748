"""End-to-end corpus preparation — the composed pipeline a
training-data run actually executes, as ONE lazy Spark plan.

Stages (all existing oracle'd operators, composed):

  1. near-dup clustering: MinHash-LSH candidate pairs -> transitive
     clusters via connected_components. Exact duplicates are
     Jaccard-1.0 near-dups, so this single step subsumes exact dedup.
  2. canonical pick: keep ONE representative per cluster
     (longest by n_chars, ties -> lowest doc_id).
  3. quality gate: drop survivors whose composite quality score is
     below ``min_quality``.
  4. token accounting: whitespace token counts for the kept rows
     (what a downstream tokenizer-budget planner consumes).

Scale shape (100TB): the only super-linear stage is the LSH
candidate self-join, bounded by banding; clustering is the WCC delta
iteration (O(diameter) rounds over shrinking frontiers); the pick is
one shuffle keyed by cluster; quality/token scoring are shuffle-free
JVM-side maps; the final assembly is doc_id equi-joins that AQE
plans as broadcasts once the keep+quality filters cut the row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches
from linkgraph.pipeline.dedup import (
    minhash_lsh_pairs,
    near_dup_clusters,
    pick_canonical,
    pick_canonical_sql,
)
from linkgraph.pipeline.text import (
    QUALITY_SCORES_SQL,
    TOKEN_STATS_SQL,
    quality_scores,
    token_stats,
)


def corpus_prep(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    min_quality: float = 0.5,
) -> DataFrame:
    """Near-dup-dedup + quality-gate + token-count a document corpus.

    Returns one row per SURVIVING document:
    (doc_id, lang, n_tokens, quality).
    """
    pairs = minhash_lsh_pairs(docs, n=n, threshold=threshold)
    keep = pick_canonical(near_dup_clusters(pairs, docs), docs)
    q = quality_scores(docs).select("doc_id", "quality")
    t = token_stats(docs).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens")
    )
    out = (
        keep.filter("keep")
        .select("doc_id")
        .join(q, "doc_id")
        .filter(F.col("quality") >= min_quality)
        .join(t, "doc_id")
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_tokens", "quality")
    )
    # propagate the LSH stage's persisted intermediates (shingle +
    # banded-key caches) so release_caches(result) frees them — they
    # would otherwise leak one pair of cached tables per call
    return attach_caches(out, getattr(pairs, "_linkgraph_caches", []))


def corpus_prep_sql(
    pairs_sql: str,
    min_quality: float = 0.5,
) -> str:
    """Oracle: the recursive-reach pick composed with the quality and
    token-stat SQL — the same stages over the same tables."""
    return f"""
WITH pick AS ({pick_canonical_sql(pairs_sql)}),
q AS ({QUALITY_SCORES_SQL}),
t AS ({TOKEN_STATS_SQL})
SELECT p.doc_id, d.lang, CAST(t.n_tokens AS BIGINT) AS n_tokens, q.quality
FROM pick p
JOIN q ON q.doc_id = p.doc_id
JOIN t ON t.doc_id = p.doc_id
JOIN documents d ON d.doc_id = p.doc_id
WHERE p.keep AND q.quality >= {min_quality}
"""
