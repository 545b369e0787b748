"""Node similarity over neighbor sets (Jaccard / overlap / cosine).

Lineage: the neo4j-graph-algorithms similarity procedures
(``algo.similarity.jaccard`` / the later ``gds.nodeSimilarity``) —
SURVEY.md §2.2 notes the similarity family as the natural extension of
the inventoried operator set. Two nodes are similar when their
neighbor sets overlap; the procedure emits scored pairs above a
cutoff, optionally the top-k per node (the ``topK`` contract).

Spark-first shape (100 TB):

  * Candidate pairs come from the classic co-neighbor self-join —
    ``nbr(a, w) ⋈ nbr(b, w)`` on the shared neighbor ``w`` — which is
    a single shuffle keyed by ``w`` followed by one pair-keyed partial
    aggregation. No crossJoin anywhere: nodes with disjoint
    neighborhoods never meet.
  * The scale hazard is the hub FEATURE: a shared neighbor of degree f
    fans out f²/2 candidate rows (same defect class as
    `pipeline/dedup.py#jaccard_pairs_df_capped`'s hyper-common
    shingle). ``feature_cap`` drops shared-neighbor keys whose fan-in
    exceeds the cap BEFORE the self-join; set sizes are then computed
    over the same capped feature universe so every metric stays a
    true similarity over the filtered bipartite graph
    (self-consistent, deterministic, SQL-reproducible) rather than a
    mixed-universe ratio. Production guidance is the dedup module's:
    a neighbor shared by millions of nodes carries no discriminative
    signal but dominates the join cost.
  * ``top_k`` ranks with one window over the symmetrized pair table —
    partitioned by node, so the sort is per-node local after a single
    hash shuffle.
  * Degree frames are |V|-sized; their joins broadcast under AQE on
    small graphs and sort-merge co-partitioned at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["node_similarity", "node_similarity_topk", "bipartite_projection", "link_prediction"]

_METRICS = ("jaccard", "overlap", "cosine")


def _neighbor_table(
    edges: DataFrame, direction: str, feature_cap: int | None,
    drop_self: bool = True,
) -> DataFrame:
    """Distinct (src, nbr) rows per the direction contract.

    BOTH unions the two orientations before the distinct — parallel
    edges and reciprocal pairs collapse to one feature row, matching
    the set semantics of every metric here. ``drop_self`` removes
    src == nbr rows (self-loops) — right for node similarity within
    one id space, wrong for bipartite projection where the two sides
    are different entity spaces whose ids may coincide numerically.
    """
    e = edges.select("src", "dst")
    if direction == "OUTGOING":
        nbr = e.select(F.col("src"), F.col("dst").alias("nbr"))
    elif direction == "INCOMING":
        nbr = e.select(F.col("dst").alias("src"), F.col("src").alias("nbr"))
    elif direction == "BOTH":
        nbr = e.select("src", F.col("dst").alias("nbr")).unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("nbr"))
        )
    else:
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    if drop_self:
        nbr = nbr.filter(F.col("src") != F.col("nbr"))
    nbr = nbr.distinct()
    if feature_cap is not None:
        keep = (
            nbr.groupBy("nbr")
            .agg(F.count("*").alias("fan_in"))
            .filter(F.col("fan_in") <= feature_cap)
            .select("nbr")
        )
        nbr = nbr.join(keep, "nbr")
    return nbr


def _sim_expr(metric: str):
    i, c1, c2 = F.col("common"), F.col("deg1"), F.col("deg2")
    if metric == "jaccard":
        return i / (c1 + c2 - i)
    if metric == "overlap":
        return i / F.least(c1, c2)
    if metric == "cosine":
        return i / F.sqrt(c1 * c2)
    raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")


def node_similarity(
    edges: DataFrame,
    metric: str = "jaccard",
    direction: str = "OUTGOING",
    min_similarity: float = 0.0,
    degree_cutoff: int = 1,
    feature_cap: int | None = None,
) -> DataFrame:
    """Scored neighbor-set similarity pairs ``(node1 < node2, similarity)``.

    ``degree_cutoff`` is the reference's degreeCutoff contract: nodes
    with fewer than that many (capped-universe) neighbors emit no
    pairs. Pairs with empty intersections are never materialized.
    Similarity is rounded to 6 decimals (cross-engine float contract).
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    nbr = _neighbor_table(edges, direction, feature_cap)
    deg = nbr.groupBy("src").agg(F.count("*").alias("deg"))
    if degree_cutoff > 1:
        deg = deg.filter(F.col("deg") >= degree_cutoff)
        nbr = nbr.join(deg.select("src"), "src")
    a = nbr.select(F.col("src").alias("node1"), "nbr")
    b = nbr.select(F.col("src").alias("node2"), "nbr")
    common = (
        a.join(b, "nbr")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count("*").alias("common"))
    )
    scored = (
        common.join(
            deg.select(F.col("src").alias("node1"), F.col("deg").alias("deg1")),
            "node1",
        )
        .join(
            deg.select(F.col("src").alias("node2"), F.col("deg").alias("deg2")),
            "node2",
        )
        .select(
            "node1",
            "node2",
            F.round(_sim_expr(metric), 6).alias("similarity"),
        )
    )
    return scored.filter(F.col("similarity") >= min_similarity)


def node_similarity_topk(
    edges: DataFrame,
    k: int,
    metric: str = "jaccard",
    direction: str = "OUTGOING",
    min_similarity: float = 0.0,
    degree_cutoff: int = 1,
    feature_cap: int | None = None,
) -> DataFrame:
    """The reference ``topK`` contract: each node's k most similar
    peers as directed rows ``(node, other, similarity)``.

    Deterministic rank order: similarity descending, then ``other``
    ascending — ties always resolve the same way on every engine.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pairs = node_similarity(
        edges,
        metric=metric,
        direction=direction,
        min_similarity=min_similarity,
        degree_cutoff=degree_cutoff,
        feature_cap=feature_cap,
    )
    sym = pairs.select(
        F.col("node1").alias("node"), F.col("node2").alias("other"), "similarity"
    ).unionByName(
        pairs.select(
            F.col("node2").alias("node"), F.col("node1").alias("other"), "similarity"
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.col("similarity").desc(), F.col("other").asc()
    )
    return (
        sym.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("node", "other", "similarity", "rank")
    )


def bipartite_projection(
    edges: DataFrame,
    direction: str = "OUTGOING",
    min_common: int = 1,
    feature_cap: int | None = None,
) -> DataFrame:
    """Co-occurrence projection of a bipartite edge table: one row
    ``(node1 < node2, weight)`` per pair sharing at least
    ``min_common`` neighbors, weight = the shared-neighbor count.

    This is the operator behind every "co-X" graph (co-supplier via
    shared orders, co-author via shared papers, co-click via shared
    sessions) — the engine's own cosupplier fixture graph is exactly
    this projection of (supplier -> order) edges, and the driver
    oracle pins that equality against the independent SQL
    formulation (SURVEY.md §2.3 graph construction).

    Scale: the projection is quadratic in each FEATURE's fan-in (an
    order shared by f suppliers emits f²/2 pairs) — the same hazard
    and the same knob as `node_similarity`: run `degree_histogram` on
    the reversed edges first, then set ``feature_cap`` to drop
    hyper-shared features, which cost the most and distinguish the
    least. One co-neighbor shuffle + one pair-keyed partial
    aggregation; no crossJoin.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    # drop_self=False: the two sides are separate entity spaces, so a
    # numeric coincidence between a node id and a feature id is NOT a
    # self-loop and must keep its feature row
    nbr = _neighbor_table(edges, direction, feature_cap, drop_self=False)
    a = nbr.select(F.col("src").alias("node1"), "nbr")
    b = nbr.select(F.col("src").alias("node2"), "nbr")
    pairs = (
        a.join(b, "nbr")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.count("*").alias("weight"))
    )
    if min_common > 1:
        pairs = pairs.filter(F.col("weight") >= min_common)
    return pairs


_LP_METHODS = ("common_neighbors", "jaccard", "adamic_adar", "resource_allocation")


def link_prediction(
    edges: DataFrame,
    method: str = "adamic_adar",
    top_n: int | None = None,
    min_score: float = 0.0,
    feature_cap: int | None = None,
) -> DataFrame:
    """Link prediction over the undirected graph (Liben-Nowell &
    Kleinberg 2003): score NON-adjacent pairs by their common
    neighborhood — ``common_neighbors`` |Γ(u)∩Γ(v)|, ``jaccard``,
    ``adamic_adar`` Σ 1/ln(deg(w)), ``resource_allocation``
    Σ 1/deg(w). Returns (node1 < node2, score rounded 6), optionally
    the global ``top_n`` (score desc, pair asc — deterministic).

    Plan: ONE co-neighbor self-join generates candidates (only pairs
    with ≥1 common neighbor exist — no |V|² anywhere), the per-common-
    neighbor weights ride the same shuffle (Adamic-Adar's 1/ln(deg w)
    joins the degree frame BEFORE the pair aggregation, so the score
    is a plain SUM with map-side combine), and existing edges leave
    via one anti-join. ``feature_cap`` prunes CANDIDATE GENERATION
    only — a hub's f²/2 fan-out is the cost hazard and its near-zero
    per-pair weight the least signal — while degrees and per-neighbor
    weights always use the TRUE (uncapped) degree, so capping drops
    low-value terms from the sum without distorting the surviving
    ones (unlike `node_similarity`, whose metrics must stay ratios
    within one universe). The top-n is a distributed TakeOrdered.
    """
    if method not in _LP_METHODS:
        raise ValueError(f"method must be one of {_LP_METHODS}, got {method!r}")
    nbr_full = _neighbor_table(edges, "BOTH", None)
    deg = nbr_full.groupBy("src").agg(F.count("*").alias("deg"))
    nbr = nbr_full
    if feature_cap is not None:
        keep = (
            nbr_full.groupBy("nbr")
            .agg(F.count("*").alias("fan_in"))
            .filter(F.col("fan_in") <= feature_cap)
            .select("nbr")
        )
        nbr = nbr_full.join(keep, "nbr")
    wnbr = nbr.join(
        deg.select(F.col("src").alias("nbr"), F.col("deg").alias("wdeg")), "nbr"
    )
    if method == "adamic_adar":
        wexpr = F.when(F.col("wdeg") > 1, 1.0 / F.log(F.col("wdeg"))).otherwise(
            F.lit(0.0)
        )
    elif method == "resource_allocation":
        wexpr = 1.0 / F.col("wdeg")
    else:
        wexpr = F.lit(1.0)
    a = wnbr.select(F.col("src").alias("node1"), "nbr", wexpr.alias("w"))
    b = wnbr.select(F.col("src").alias("node2"), "nbr")
    cand = (
        a.join(b, "nbr")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.sum("w").alias("raw"), F.count("*").alias("common"))
    )
    existing = nbr_full.select(
        F.col("src").alias("node1"), F.col("nbr").alias("node2")
    ).filter(F.col("node1") < F.col("node2"))
    cand = cand.join(existing, ["node1", "node2"], "left_anti")
    if method == "jaccard":
        cand = (
            cand.join(
                deg.select(F.col("src").alias("node1"), F.col("deg").alias("d1")),
                "node1",
            )
            .join(
                deg.select(F.col("src").alias("node2"), F.col("deg").alias("d2")),
                "node2",
            )
            .select(
                "node1",
                "node2",
                (F.col("common") / (F.col("d1") + F.col("d2") - F.col("common"))).alias(
                    "raw"
                ),
            )
        )
    out = cand.select(
        "node1", "node2", F.round(F.col("raw"), 6).alias("score")
    ).filter(F.col("score") >= min_score)
    if top_n is not None:
        out = out.orderBy(
            F.col("score").desc(), F.col("node1").asc(), F.col("node2").asc()
        ).limit(top_n)
    return out
