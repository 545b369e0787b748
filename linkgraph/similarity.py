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

__all__ = [
    "node_similarity",
    "node_similarity_topk",
    "bipartite_projection",
    "link_prediction",
    "weighted_node_similarity",
    "weighted_node_similarity_sql",
]

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


# --------------------------------------------------------------------------
# Weighted similarity (algo.similarity.euclidean / algo.similarity.pearson)
# --------------------------------------------------------------------------

_WEIGHTED_METRICS = ("euclidean", "pearson")
_W_SCALE = 1_000_000  # 6-decimal fixed point: exact integer arithmetic


def _weighted_neighbor_table(
    edges: DataFrame, direction: str, feature_cap: int | None
) -> DataFrame:
    """(src, nbr, w6) — weighted feature vectors in 6-decimal fixed
    point. Parallel edges SUM their weights (exact in the scaled
    integer domain); self-loops drop; ``feature_cap`` prunes hub
    features exactly as `_neighbor_table` does."""
    w6 = F.round(F.coalesce(F.col("weight"), F.lit(1.0)) * _W_SCALE, 0).cast("long")
    e = edges.select("src", "dst", w6.alias("w6"))
    if direction == "OUTGOING":
        nbr = e.select("src", F.col("dst").alias("nbr"), "w6")
    elif direction == "INCOMING":
        nbr = e.select(F.col("dst").alias("src"), F.col("src").alias("nbr"), "w6")
    elif direction == "BOTH":
        nbr = e.select("src", F.col("dst").alias("nbr"), "w6").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("nbr"), "w6")
        )
    else:
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    nbr = (
        nbr.filter(F.col("src") != F.col("nbr"))
        .groupBy("src", "nbr")
        .agg(F.sum("w6").alias("w6"))
    )
    if feature_cap is not None:
        keep = (
            nbr.groupBy("nbr")
            .agg(F.count("*").alias("fan_in"))
            .filter(F.col("fan_in") <= feature_cap)
            .select("nbr")
        )
        nbr = nbr.join(keep, "nbr")
    return nbr


def weighted_node_similarity(
    edges: DataFrame,
    metric: str = "pearson",
    direction: str = "OUTGOING",
    degree_cutoff: int = 1,
    feature_cap: int | None = None,
) -> DataFrame:
    """Weighted-vector similarity pairs — the reference's
    ``algo.similarity.euclidean`` / ``algo.similarity.pearson``
    procedures (the SimilarityProc family sibling of the set-based
    metrics above; SURVEY.md §2.2 similarity lineage).

    Each node's vector is its weighted (capped-universe) feature row
    set with missing features = 0 over the GLOBAL feature dimension n
    (the reference materializes dense per-category weight lists; the
    sparse identity ``||a-b||^2 = q_a + q_b - 2<a,b>`` and the
    n-dimensional Pearson moments make that dense semantics computable
    from sparse rows). Emits ``(node1 < node2, distance)`` for
    euclidean (smaller = more similar) or ``(node1 < node2, pearson)``.

    CANDIDATE CONTRACT (documented deviation from the reference's
    all-pairs loop): only pairs sharing >= 1 feature are emitted —
    the same never-materialize-empty-intersections rule as
    `node_similarity`, which is what keeps the operator a single
    co-feature shuffle instead of a crossJoin at 100 TB. Pearson rows
    whose variance denominator is 0 (constant vector over the n-dim
    dense semantics) are dropped (correlation undefined).

    EXACTNESS: weights live in 6-decimal fixed point (BIGINT); every
    aggregate (dot, sums, sums of squares) is an exact integer in
    DECIMAL(38,0) / HUGEINT, and only the FINAL expression casts to
    double — both engines see identical inputs and the identical
    IEEE expression tree, so the rounded score is value-exact.
    """
    if metric not in _WEIGHTED_METRICS:
        raise ValueError(f"metric must be one of {_WEIGHTED_METRICS}, got {metric!r}")
    nbr = _weighted_neighbor_table(edges, direction, feature_cap)
    stats = nbr.groupBy("src").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("w6").cast("decimal(38,0)")).alias("s"),
        # cast BEFORE the multiply: a long*long product wraps silently
        # past 2^63 (weights ~3100 after the 1e6 scale), while the
        # decimal product stays exact — the twin's HUGEINT domain
        F.sum(F.col("w6").cast("decimal(19,0)") * F.col("w6")).alias("q"),
    )
    # the dense feature dimension is a property of the CAPPED universe,
    # not of which nodes clear degree_cutoff — fix n before filtering
    # (the SQL twin counts the unfiltered nbr CTE)
    n_frame = nbr.select(F.countDistinct("nbr").alias("n"))
    if degree_cutoff > 1:
        stats = stats.filter(F.col("cnt") >= degree_cutoff)
        nbr = nbr.join(stats.select("src"), "src")
    a = nbr.select(F.col("src").alias("node1"), "nbr", F.col("w6").alias("w1"))
    b = nbr.select(F.col("src").alias("node2"), "nbr", F.col("w6").alias("w2"))
    dots = (
        a.join(b, "nbr")
        .filter(F.col("node1") < F.col("node2"))
        .groupBy("node1", "node2")
        .agg(F.sum(F.col("w1").cast("decimal(19,0)") * F.col("w2")).alias("dot"))
    )
    joined = dots.join(
        stats.select(
            F.col("src").alias("node1"),
            F.col("s").alias("s1"),
            F.col("q").alias("q1"),
        ),
        "node1",
    ).join(
        stats.select(
            F.col("src").alias("node2"),
            F.col("s").alias("s2"),
            F.col("q").alias("q2"),
        ),
        "node2",
    )
    if metric == "euclidean":
        diff = (
            F.col("q1").cast("double")
            + F.col("q2").cast("double")
            - 2.0 * F.col("dot").cast("double")
        )
        return joined.select(
            "node1",
            "node2",
            F.round(F.sqrt(diff) / F.lit(float(_W_SCALE)), 6).alias("distance"),
        )
    # pearson over the global dense dimension n (one-row broadcast)
    jn = joined.crossJoin(F.broadcast(n_frame))
    nd = F.col("n").cast("double")
    num = nd * F.col("dot").cast("double") - F.col("s1").cast("double") * F.col("s2").cast("double")
    v1 = nd * F.col("q1").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double")
    v2 = nd * F.col("q2").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double")
    return (
        jn.filter((v1 > 0) & (v2 > 0))
        .select(
            "node1",
            "node2",
            F.round(num / (F.sqrt(v1) * F.sqrt(v2)), 6).alias("pearson"),
        )
    )


def _weighted_nbr_sql(edge_sql: str, direction: str, feature_cap: int | None) -> str:
    w6 = "CAST(ROUND(COALESCE(weight, 1.0) * 1000000) AS BIGINT)"
    if direction == "OUTGOING":
        sel = f"SELECT src, dst AS nbr, {w6} AS w6 FROM e"
    elif direction == "INCOMING":
        sel = f"SELECT dst AS src, src AS nbr, {w6} AS w6 FROM e"
    elif direction == "BOTH":
        sel = (f"SELECT src, dst AS nbr, {w6} AS w6 FROM e "
               f"UNION ALL SELECT dst AS src, src AS nbr, {w6} AS w6 FROM e")
    else:
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    base = (f"SELECT src, nbr, SUM(w6) AS w6 FROM ({sel}) "
            f"WHERE src <> nbr GROUP BY src, nbr")
    if feature_cap is None:
        return base
    # nbr0 is a CTE injected by weighted_node_similarity_sql so the
    # grouped derivation is evaluated once, not inlined twice
    return (f"SELECT t.* FROM nbr0 t JOIN ("
            f"SELECT nbr FROM nbr0 GROUP BY nbr HAVING COUNT(*) <= {feature_cap}"
            f") k ON k.nbr = t.nbr")


def weighted_node_similarity_sql(
    edge_sql: str,
    metric: str = "pearson",
    direction: str = "OUTGOING",
    degree_cutoff: int = 1,
    feature_cap: int | None = None,
) -> str:
    """DuckDB twin of `weighted_node_similarity` (value-exact: integer
    fixed-point aggregates, one final double expression)."""
    if metric not in _WEIGHTED_METRICS:
        raise ValueError(f"metric must be one of {_WEIGHTED_METRICS}, got {metric!r}")
    cutoff = f"HAVING COUNT(*) >= {degree_cutoff}" if degree_cutoff > 1 else ""
    if feature_cap is not None:
        base_cte = (f"nbr0 AS MATERIALIZED ("
                    f"{_weighted_nbr_sql(edge_sql, direction, None)}),\n")
    else:
        base_cte = ""
    head = f"""
WITH e AS ({edge_sql}),
{base_cte}nbr AS ({_weighted_nbr_sql(edge_sql, direction, feature_cap)}),
stats AS (SELECT src, COUNT(*) AS cnt, SUM(w6) AS s,
                 SUM(CAST(w6 AS HUGEINT) * w6) AS q
          FROM nbr GROUP BY src {cutoff}),
dots AS (SELECT a.src AS node1, b.src AS node2,
                SUM(CAST(a.w6 AS HUGEINT) * b.w6) AS dot
         FROM nbr a JOIN nbr b ON a.nbr = b.nbr AND a.src < b.src
         JOIN stats sa ON sa.src = a.src
         JOIN stats sb ON sb.src = b.src
         GROUP BY a.src, b.src),
j AS (SELECT d.node1, d.node2, d.dot,
             s1.s AS s1, s1.q AS q1, s2.s AS s2, s2.q AS q2
      FROM dots d JOIN stats s1 ON s1.src = d.node1
                  JOIN stats s2 ON s2.src = d.node2)"""
    if metric == "euclidean":
        return f"""{head}
SELECT node1, node2,
       ROUND(sqrt(CAST(q1 AS DOUBLE) + CAST(q2 AS DOUBLE)
                  - 2.0 * CAST(dot AS DOUBLE)) / 1000000.0, 6) AS distance
FROM j
"""
    return f"""{head},
nn AS (SELECT COUNT(DISTINCT nbr) AS n FROM nbr)
SELECT node1, node2,
       ROUND((CAST(n AS DOUBLE) * CAST(dot AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE)
                       - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6) AS pearson
FROM j CROSS JOIN nn
WHERE CAST(n AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) > 0
  AND CAST(n AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) > 0
"""


# ------------------------------------------------- LSH-accelerated pairs

def node_similarity_lsh(
    edges: DataFrame,
    metric: str = "jaccard",
    direction: str = "OUTGOING",
    num_hashes: int = 32,
    bands: int = 8,
    min_similarity: float = 0.5,
    degree_cutoff: int = 1,
    feature_cap: int | None = None,
) -> DataFrame:
    """MinHash-banded node similarity — the 100TB path for all-pairs
    neighbor-set similarity.

    The exact :func:`node_similarity` shuffles one row per shared
    neighbor (the co-neighbor join) — on a power-law graph a single
    popular neighbor fans into millions of candidate pairs even after
    ``feature_cap``. This variant banding-buckets the md5 MinHash
    signature of each neighbor set (the dedup.minhash_lsh_pairs
    machinery applied to adjacency): only band-colliding node pairs
    are verified, with EXACT similarity on the full neighbor sets.

    Output is recall-bounded by the standard banding curve (a pair
    with Jaccard s collides with probability 1-(1-s^r)^b; at the
    32/8 defaults >=0.8-similar pairs are found with probability
    ~1-1e-9, dissimilar pairs almost never) and fully DETERMINISTIC —
    signatures derive from the cross-engine md5 hash, so the DuckDB
    twin reproduces the result row-for-row including which candidates
    the bands surfaced. Verified pairs below ``min_similarity`` are
    dropped.
    """
    if metric not in _METRICS:
        raise ValueError(f"metric must be one of {_METRICS}, got {metric!r}")
    from linkgraph.pipeline.hashing import stable_hash64

    r = num_hashes // bands
    nbr0 = _neighbor_table(edges, direction, feature_cap).persist()
    nbr = nbr0
    deg = nbr.groupBy("src").agg(F.count("*").alias("deg"))
    if degree_cutoff > 1:
        deg = deg.filter(F.col("deg") >= degree_cutoff)
        nbr = nbr.join(deg.select("src"), "src")
    feats = nbr.select("src", F.col("nbr").cast("string").alias("f"))
    sig = feats.groupBy("src").agg(
        *[
            F.min(stable_hash64(F.col("f"), salt=i)).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    band_structs = []
    for b in range(bands):
        cols = [F.col(f"h{i}").cast("string") for i in range(b * r, (b + 1) * r)]
        band_structs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws(",", *cols)).alias("bkey"),
            )
        )
    banded = sig.select(
        "src", F.explode(F.array(*band_structs)).alias("bk")
    ).select(
        "src", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    ).persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .filter(F.col("x.src") < F.col("y.src"))
        .select(F.col("x.src").alias("node1"), F.col("y.src").alias("node2"))
        .distinct()
    )
    a = nbr.select(F.col("src").alias("node1"), "nbr")
    b2 = nbr.select(F.col("src").alias("node2"), "nbr")
    common = (
        cand.join(a, "node1")
        .join(b2, ["node2", "nbr"])
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
        .select("node1", "node2", F.round(_sim_expr(metric), 6).alias("similarity"))
        .filter(F.col("similarity") >= min_similarity)
    )
    from linkgraph.checkpoint import attach_caches

    # nbr0 is the PERSISTED handle (nbr may be a derived filter view)
    return attach_caches(scored, [nbr0, banded])


def node_similarity_lsh_sql(
    nbr_sql: str,
    metric: str = "jaccard",
    num_hashes: int = 32,
    bands: int = 8,
    min_similarity: float = 0.5,
) -> str:
    """DuckDB twin of the FULL LSH path (signatures, band keys,
    candidate join, exact verify) — value-exact because every hash is
    the cross-engine md5 derivation. ``nbr_sql`` must yield distinct
    (src, nbr) rows matching the engine's direction contract."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    r = num_hashes // bands
    mins = ",\n         ".join(
        f"MIN({stable_hash64_sql('CAST(nbr AS VARCHAR)', salt=i)}) AS h{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT src, {b} AS band, md5("
        + " || ',' || ".join(
            f"CAST(h{i} AS VARCHAR)" for i in range(b * r, (b + 1) * r)
        )
        + ") AS bkey FROM sig"
        for b in range(bands)
    )
    if metric == "jaccard":
        expr = "cm.common / (d1.deg + d2.deg - cm.common)"
    elif metric == "overlap":
        expr = "cm.common / LEAST(d1.deg, d2.deg)"
    elif metric == "cosine":
        expr = "cm.common / sqrt(d1.deg * d2.deg)"
    else:
        raise ValueError(metric)
    return f"""
WITH
nbr AS MATERIALIZED ({nbr_sql}),
deg AS (SELECT src, COUNT(*) AS deg FROM nbr GROUP BY src),
sig AS MATERIALIZED (
  SELECT src, {mins}
  FROM nbr GROUP BY src),
banded AS MATERIALIZED (
{band_rows}),
cand AS (
  SELECT DISTINCT x.src AS node1, y.src AS node2
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bkey = y.bkey AND x.src < y.src),
cm AS (
  SELECT c.node1, c.node2, COUNT(*) AS common
  FROM cand c JOIN nbr a ON a.src = c.node1
              JOIN nbr b ON b.src = c.node2 AND b.nbr = a.nbr
  GROUP BY 1, 2)
SELECT cm.node1, cm.node2, ROUND({expr}, 6) AS similarity
FROM cm JOIN deg d1 ON d1.src = cm.node1
        JOIN deg d2 ON d2.src = cm.node2
WHERE ROUND({expr}, 6) >= {min_similarity}
"""


def link_prediction_auc(
    edges: DataFrame,
    method: str = "adamic_adar",
    holdout_den: int = 5,
    neg_draws: int = 256,
    seed: int = 0,
    feature_cap: int | None = None,
) -> DataFrame:
    """Hold-out AUC evaluation of `link_prediction` — the standard
    Liben-Nowell & Kleinberg protocol run deterministically END-TO-END:

    * TEST positives = undirected edges whose 60-bit pair hash lands
      in residue 0 mod ``holdout_den`` (an exact 1/holdout_den split);
      the remaining edges are the training graph;
    * negatives = ``neg_draws`` hash-drawn node pairs (over the sorted
      node index) that are non-edges of the FULL graph and not test
      positives, deduplicated — a deterministic stand-in for uniform
      non-edge sampling;
    * every pool pair takes its trained score (absent candidates score
      0 — no common neighbor in the training graph), and AUC uses the
      exact MIDRANK statistic: with scores tied at 6 decimals,
      2·Σ midrank is an integer, so
      AUC = (2·Σ midrank_pos − P(P+1)) / (2·P·N) is ONE exact
      rational division, rounded 6.

    Returns one row (positives, negatives, auc); auc is NULL when
    either side of the pool is empty (disclosed, not defaulted).

    Scale notes (100TB): the split and the negative draw are pure
    hash expressions on the edge/node tables; scoring is one
    `link_prediction` run on the training graph (its co-neighbor
    shuffle); the ranking window runs over the POOL only (holdout +
    draws — a knob, not the graph)."""
    if holdout_den < 2:
        raise ValueError(f"holdout_den must be >= 2: got {holdout_den}")
    if neg_draws < 1:
        raise ValueError(f"neg_draws must be >= 1: got {neg_draws}")
    from linkgraph.pipeline.hashing import stable_hash64

    spark = edges.sparkSession
    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    hsplit = stable_hash64(
        F.concat_ws("|", F.col("a"), F.col("b")), salt=f"lp-split-{seed}"
    )
    und = und.withColumn("is_test", F.pmod(hsplit, F.lit(holdout_den)) == 0)
    test_pos = und.filter("is_test").select("a", "b")
    train = und.filter(~F.col("is_test")).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    scores = link_prediction(
        train, method=method, min_score=-1.0, feature_cap=feature_cap
    ).select(F.col("node1").alias("a"), F.col("node2").alias("b"), "score")
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    from linkgraph.ids import distributed_rank

    # exact ROW_NUMBER-by-id indexing without a single-task sort —
    # range-partitioned rank + broadcast offsets (ids.py), value-equal
    # to the SQL twin's global window
    _idx_full = distributed_rank(nodes, [("id", "asc")], name="_rn")
    indexed = _idx_full.select(
        "id", (F.col("_rn") - 1).cast("long").alias("idx")
    )
    n = indexed.count()
    draws = spark.range(neg_draws).select(F.col("id").alias("m"))
    ha = stable_hash64(F.col("m").cast("string"), salt=f"lp-nega-{seed}")
    hb = stable_hash64(F.col("m").cast("string"), salt=f"lp-negb-{seed}")
    cand = (
        draws.select(
            F.pmod(ha, F.lit(n)).alias("ia"), F.pmod(hb, F.lit(n)).alias("ib")
        )
        .join(indexed.select(F.col("idx").alias("ia"), F.col("id").alias("na")),
              "ia")
        .join(indexed.select(F.col("idx").alias("ib"), F.col("id").alias("nb")),
              "ib")
        .filter(F.col("na") != F.col("nb"))
        .select(F.least("na", "nb").alias("a"), F.greatest("na", "nb").alias("b"))
        .distinct()
        .join(und.select("a", "b"), ["a", "b"], "left_anti")
    )
    pool = (
        test_pos.withColumn("label", F.lit(1))
        .unionByName(cand.withColumn("label", F.lit(0)))
        .join(scores, ["a", "b"], "left")
        .select("label", F.coalesce(F.col("score"), F.lit(0.0)).alias("s"))
    )
    # global RANK over score, distributed the same way (ties never
    # straddle range partitions, so tie semantics are exact)
    _rank_full = distributed_rank(pool, [("s", "asc")], name="rmin", mode="rank")
    ranked = _rank_full.select(
        "label", "s", F.col("rmin").cast("long").alias("rmin"),
        F.count("*").over(Window.partitionBy("s")).cast("long").alias("ties"),
    )
    # 2*midrank = 2*rmin + ties - 1 (integer)
    agg = ranked.agg(
        F.sum(F.when(F.col("label") == 1,
                     2 * F.col("rmin") + F.col("ties") - 1)).alias("num2"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("p"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("nn"),
    )
    from linkgraph.checkpoint import attach_caches

    out = agg.select(
        F.col("p").cast("long").alias("positives"),
        F.col("nn").cast("long").alias("negatives"),
        F.when(
            (F.col("p") > 0) & (F.col("nn") > 0),
            F.round(
                (F.col("num2") - F.col("p") * (F.col("p") + 1)).cast("double")
                / (2 * F.col("p") * F.col("nn")).cast("double"),
                6,
            ),
        ).alias("auc"),
    )
    # the two rank passes persist their range-parted frames — hand the
    # caches up for release_caches hygiene once the 1-row result is read
    return attach_caches(
        out,
        getattr(_idx_full, "_linkgraph_caches", [])
        + getattr(_rank_full, "_linkgraph_caches", []),
    )


def link_prediction_auc_sql(
    edges_sql: str,
    method: str = "adamic_adar",
    holdout_den: int = 5,
    neg_draws: int = 256,
    seed: int = 0,
) -> str:
    """DuckDB twin of `link_prediction_auc` (methods: adamic_adar,
    common_neighbors, resource_allocation): identical hash split,
    training-graph scoring, hash-drawn negatives, midrank AUC."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    if method == "adamic_adar":
        w = "CASE WHEN d.deg > 1 THEN 1.0 / ln(d.deg) ELSE 0.0 END"
    elif method == "resource_allocation":
        w = "1.0 / d.deg"
    elif method == "common_neighbors":
        w = "1.0"
    else:
        raise ValueError(f"twin supports aa/cn/ra, got {method!r}")
    hs = stable_hash64_sql("a || '|' || b", salt=f"lp-split-{seed}")
    ha = stable_hash64_sql("CAST(m AS VARCHAR)", salt=f"lp-nega-{seed}")
    hb = stable_hash64_sql("CAST(m AS VARCHAR)", salt=f"lp-negb-{seed}")
    return f"""
WITH e0 AS ({edges_sql}),
und AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM e0 WHERE src <> dst),
split AS (SELECT a, b, ({hs}) % {holdout_den} = 0 AS is_test FROM und),
test_pos AS (SELECT a, b FROM split WHERE is_test),
train AS (SELECT a AS src, b AS dst FROM split WHERE NOT is_test),
nbr AS (SELECT DISTINCT src, nbr FROM (
          SELECT src, dst AS nbr FROM train
          UNION ALL SELECT dst, src FROM train) WHERE src <> nbr),
deg AS (SELECT src, COUNT(*) AS deg FROM nbr GROUP BY src),
wn AS (SELECT nbr.src, nbr.nbr, {w} AS w
       FROM nbr JOIN deg d ON d.src = nbr.nbr),
cand AS (SELECT x.src AS a, y.src AS b, SUM(x.w) AS raw
         FROM wn x JOIN nbr y ON x.nbr = y.nbr AND x.src < y.src
         GROUP BY 1, 2),
ex AS (SELECT src AS a, nbr AS b FROM nbr WHERE src < nbr),
sc AS (SELECT c.a, c.b, ROUND(c.raw, 6) AS score
       FROM cand c ANTI JOIN ex ON c.a = ex.a AND c.b = ex.b),
nodes AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM e0 UNION ALL SELECT dst FROM e0)),
indexed AS (SELECT id,
  CAST(ROW_NUMBER() OVER (ORDER BY id ASC) - 1 AS BIGINT) AS idx FROM nodes),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
draws AS (SELECT CAST(range AS BIGINT) AS m FROM range(0, {neg_draws})),
negc AS (
  SELECT DISTINCT LEAST(ia.id, ib.id) AS a, GREATEST(ia.id, ib.id) AS b
  FROM draws CROSS JOIN nn
  JOIN indexed ia ON ia.idx = ({ha}) % nn.n
  JOIN indexed ib ON ib.idx = ({hb}) % nn.n
  WHERE ia.id <> ib.id),
neg AS (SELECT n.a, n.b FROM negc n
        ANTI JOIN und u ON u.a = n.a AND u.b = n.b),
pool AS (
  SELECT 1 AS label, COALESCE(sc.score, 0.0) AS s
  FROM test_pos p LEFT JOIN sc ON sc.a = p.a AND sc.b = p.b
  UNION ALL
  SELECT 0, COALESCE(sc.score, 0.0)
  FROM neg LEFT JOIN sc ON sc.a = neg.a AND sc.b = neg.b),
ranked AS (SELECT label, s,
  CAST(RANK() OVER (ORDER BY s ASC) AS BIGINT) AS rmin,
  CAST(COUNT(*) OVER (PARTITION BY s) AS BIGINT) AS ties FROM pool)
SELECT
  CAST(SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS positives,
  CAST(SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS negatives,
  CASE WHEN SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) > 0
        AND SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) > 0
  THEN ROUND(
    CAST(SUM(CASE WHEN label = 1 THEN 2 * rmin + ties - 1 END)
         - SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
           * (SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END) + 1) AS DOUBLE)
    / CAST(2 * SUM(CASE WHEN label = 1 THEN 1 ELSE 0 END)
           * SUM(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS DOUBLE), 6)
  ELSE NULL END AS auc
FROM ranked
"""
