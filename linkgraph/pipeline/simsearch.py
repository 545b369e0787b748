"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline (fully JVM-side,
DuckDB-oracle-checkable); the scale path is LSH-bucketed ANN with a
vectorized numpy signature kernel (mapInPandas — Arrow batches, no
per-row Python).

Float parity trick: both engines evaluate the SAME left-associated
explicit sum over element_at/list_extract (1-based) with elementwise
CAST to DOUBLE, so the dot/norm arithmetic is bit-identical and the
6-decimal rounding of the driver's value-hash can't flip.

Scale design (100TB): brute force is O(n^2) — only for tests and
per-bucket reranking. The ANN path shuffles once on the 16-bit LSH
bucket (65k buckets, uniformly distributed by construction) and
reranks inside buckets; multi-probe (flip one bit) bounds recall loss.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches as _attach_caches


def _dot_sql(a: str, b: str, dim: int, extract: str) -> str:
    terms = " + ".join(
        f"CAST({extract}({a}, {i}) AS DOUBLE) * CAST({extract}({b}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"(0.0 + {terms})"


def _cosine_sql(a: str, b: str, dim: int, extract: str) -> str:
    return (
        f"({_dot_sql(a, b, dim, extract)} / "
        f"(sqrt({_dot_sql(a, a, dim, extract)}) * sqrt({_dot_sql(b, b, dim, extract)})))"
    )


def cosine_expr_spark(a: str, b: str, dim: int):
    return F.expr(_cosine_sql(a, b, dim, "element_at"))


def cosine_expr_duckdb(a: str, b: str, dim: int) -> str:
    return _cosine_sql(a, b, dim, "list_extract")


def _dim(emb: DataFrame, col: str) -> int:
    row = emb.select(F.size(col).alias("d")).first()
    if row is None:
        raise ValueError(
            f"cannot infer vector dim: table has no rows (column {col!r})"
        )
    return row["d"]


def cosine_topk(
    emb: DataFrame, k: int = 5, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Brute-force cosine top-k neighbors per vector.

    Returns (vec_id, neighbor_id, sim, rank); rank by
    (round(sim, 6) DESC, neighbor_id ASC) — deterministic, engine-stable.
    """
    dim = _dim(emb, vec_col)
    a = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("eb"))
    sim = F.round(cosine_expr_spark("ea", "eb", dim), 6).alias("sim")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", sim)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", "rank")
    )


def cosine_topk_sql(dim: int, k: int = 5, table: str = "embeddings") -> str:
    cos = cosine_expr_duckdb("a.embedding", "b.embedding", dim)
    return f"""
WITH pairs AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS sim
  FROM {table} a JOIN {table} b ON a.vec_id != b.vec_id),
ranked AS (
  SELECT vec_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM pairs)
SELECT vec_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


def near_dup_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Vector pairs with rounded cosine >= threshold (embedding
    near-dup detector). Returns (id1, id2, sim), id1 < id2."""
    dim = _dim(emb, vec_col)
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("ea"))
    b = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("eb"))
    sim = F.round(cosine_expr_spark("ea", "eb", dim), 6).alias("sim")
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", sim)
        .filter(F.col("sim") >= threshold)
    )


def near_dup_pairs_sql(dim: int, threshold: float = 0.4, table: str = "embeddings") -> str:
    cos = cosine_expr_duckdb("a.embedding", "b.embedding", dim)
    return f"""
SELECT a.vec_id AS id1, b.vec_id AS id2, ROUND({cos}, 6) AS sim
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE ROUND({cos}, 6) >= {threshold}
"""


def near_dup_pairs_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    rows_per_band: int = 2,
    bands: int = 32,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs via banded random-hyperplane LSH +
    exact in-bucket cosine verification — the production path for the
    ``near_dup_pairs`` contract (same output: (id1, id2, sim), id1 <
    id2, rounded cosine >= threshold).

    Precision is EXACT (every candidate is re-verified with the true
    cosine); recall is the banding bound: a pair at angle theta
    collides in a band with p^r, p = 1 - theta/pi, and is missed with
    (1 - p^r)^b. Defaults (r=2, b=32) give per-pair miss ~8.5e-8 at
    cosine 0.4 — below any realistic corpus size, which is why the
    brute-force SQL oracle is a valid driver check. For high-threshold
    dedup (cosine >= 0.9, p ~ 0.86) raise ``rows_per_band`` to ~8-16
    and keep b*p^r >= ~5: wider bands shrink the candidate set
    quadratically while the verify step keeps precision exact.

    Scale shape (100TB): one shuffle keyed (band, bucket) for candidate
    generation — the O(n^2) pair space is never enumerated; only
    colliding pairs reach the cosine verification join. The kernel
    emits ALL band keys as one array column in a single Arrow pass
    (posexplode fans it to (vec_id, band, bkey) rows JVM-side), so the
    corpus is matmul'd exactly once per plan instance — never the
    bands-way union fan that re-evaluated the kernel per band; the
    self-join's two sides then share one shuffle via Spark's
    ReuseExchange (identical exchange subtrees), asserted in
    tests/test_plans.py.
    """
    n_planes = rows_per_band * bands
    dim = _dim(emb, vec_col)
    planes = _planes(dim, n_planes, seed)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bits = (M @ planes) > 0
            keys = np.empty((len(pdf), bands), dtype=np.int64)
            for b in range(bands):
                chunk = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
                keys[:, b] = (
                    chunk.astype(np.int64)
                    << np.arange(rows_per_band, dtype=np.int64)
                ).sum(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col].to_numpy(), "bkeys": list(keys)}
            )

    sig = emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, bkeys array<long>"
    )
    # persist the banded keys BEFORE the self-join: without it the two
    # join sides only share the kernel via ReuseExchange, which AQE
    # breaks when it broadcasts the build side (the corpus scan +
    # matmul then runs once per side — measured in the round-3 plan);
    # the cache makes the Arrow kernel run exactly once under ANY join
    # strategy. Tiny table: (vec_id, band, bkey) x bands rows per
    # vector, no embedding column.
    banded = sig.select(
        "vec_id", F.posexplode("bkeys").alias("band", "bkey")
    ).persist()
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bkey"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id1"), F.col("y.vec_id").alias("id2"))
        .distinct()
    )
    a = emb.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("ea"))
    bb = emb.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("eb"))
    sim = F.round(cosine_expr_spark("ea", "eb", dim), 6).alias("sim")
    out = (
        cand.join(a, "id1")
        .join(bb, "id2")
        .select("id1", "id2", sim)
        .filter(F.col("sim") >= threshold)
    )
    # the banded cache stays live for the returned (lazy) plan; cached
    # blocks are LRU-evictable (recomputable), so pressure self-heals,
    # but loop callers should release explicitly once consumed
    return _attach_caches(out, [banded])


# ----------------------------------------------------------- ANN (IVF)
#
# Shared deterministic centroid-assignment contract (used by both
# ann_ivf_topk and semantic_dedup_pairs — ONE implementation so the
# two operators and their SQL oracles cannot silently diverge):
# rank-stride centroid sampling in id order (no RNG), assignment by
# argmax round-6 cosine with centroid-id tie-break, optional
# deterministic Lloyd refinement.

def _vec_norm(col: str, dim: int):
    return F.sqrt(F.expr(_dot_sql(col, col, dim, "element_at")))


def _stride_centroids(
    emb: DataFrame, n_centroids: int, id_col: str, vec_col: str,
    n: int | None = None,
) -> DataFrame:
    """Every ceil(n/n_centroids)-th vector in id order as (cent_id,
    cvec). The global id rank runs through ``ids.distributed_rank``
    (range-partitioned + broadcast offsets — value-identical to the
    global ROW_NUMBER, no single-task sort), over the ID COLUMN ONLY;
    the wide embedding column never enters the rank — the n_centroids
    vectors are fetched by an equi-join."""
    from linkgraph.checkpoint import release_caches
    from linkgraph.ids import distributed_rank

    if n is None:
        n = emb.count()
    stride = max(1, -(-n // n_centroids))  # ceil(n / n_centroids)
    ranked_ids = distributed_rank(
        emb.select(F.col(id_col).alias("cent_id")), [("cent_id", "asc")],
        name="rn",
    )
    picked = (
        ranked_ids.filter((F.col("rn") - 1) % stride == 0)
        .drop("rn")
        .join(
            emb.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cvec")),
            "cent_id",
        )
    )
    # n_centroids survivors — materialize them off the rank cache,
    # then free it (centroid frames are broadcast downstream)
    picked = picked.localCheckpoint(eager=True)
    release_caches(ranked_ids)
    return picked


def _ranked_centroid_scores(
    vecs: DataFrame, centroids: DataFrame, dim: int
) -> DataFrame:
    """(vid, v, vnorm) x broadcast centroids -> + (cent_id, csim,
    crank): round-6 cosine per (vector, centroid), ranked per vector
    by (csim DESC, cent_id ASC). crank=1 is the assignment. Norms are
    precomputed per row; the factored dot/(vnorm*cnorm) is the
    identical IEEE expression tree as sqrt-in-place, so the SQL
    oracles are unaffected."""
    cents_n = centroids.withColumn("cnorm", _vec_norm("cvec", dim))
    scored = vecs.join(F.broadcast(cents_n)).select(
        "vid", "v", "vnorm", "cent_id",
        F.round(
            F.expr(_dot_sql("v", "cvec", dim, "element_at"))
            / (F.col("vnorm") * F.col("cnorm")), 6,
        ).alias("csim"),
    )
    w = Window.partitionBy("vid").orderBy(F.desc("csim"), F.asc("cent_id"))
    return scored.withColumn("crank", F.row_number().over(w))


def _lloyd_refine(
    vecs: DataFrame, centroids: DataFrame, dim: int, iters: int
) -> DataFrame:
    """Deterministic Lloyd refinement: assign by the shared argmax
    contract, recompute centroids as element-wise cluster means; empty
    clusters keep their previous vector. No RNG anywhere."""
    for _ in range(max(0, iters)):
        assigned = _ranked_centroid_scores(vecs, centroids, dim).filter(
            F.col("crank") == 1
        )
        means = assigned.groupBy("cent_id").agg(
            F.array(
                *[F.avg(F.element_at("v", i + 1)) for i in range(dim)]
            ).alias("mvec")
        )
        centroids = (
            centroids.join(means, "cent_id", "left")
            .select("cent_id", F.coalesce("mvec", "cvec").alias("cvec"))
        )
    return centroids


def kmeans_clusters(
    emb: DataFrame,
    n_clusters: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic distributed k-means over an embedding column:
    rank-stride seeding in id order (the shared IVF/SemDeDup centroid
    contract — no RNG), then ``iters`` Lloyd rounds of argmax-cosine
    assignment + INTEGER-EXACT centroid means, then a final
    assignment. Returns (vec_id, cluster, csim) with cluster = the
    seeding centroid's vector id and csim the round-6 cosine to the
    final centroid.

    Cross-engine exactness of an ITERATIVE float algorithm (the same
    move as FastRP/ANF): member coordinates are quantized to 6-decimal
    fixed point ONCE per round (ROUND(x * 1e6) as int64 — identical
    half-away-from-zero rounding on both engines), summed in the
    integer domain (order-free, exact), and the mean is the exact
    rational (CAST(s AS DOUBLE) / 1e6) / count — so every centroid
    coordinate is bit-identical on Spark and DuckDB and the unrolled
    SQL twin (kmeans_clusters_sql) is value-exact, not approximate.
    Empty clusters keep their previous centroid (the _lloyd_refine
    contract).

    Scale shape (100TB): centroids are a broadcast-sized table
    (n_clusters ~ sqrt(n)); each round is ONE broadcast join + argmax
    window partitioned by vector id + ONE map-side-combinable
    aggregate of dim int64 sums — no |n|x|n| pair blowup anywhere;
    cost is O(iters * n * k * dim) flops, all JVM-side codegen.
    The per-round sums stay exact while |cluster| * 1e6 * max|x|
    < 2^63 (~9e12 rows per cluster at |x| <= 1) — beyond that, cast
    the sum column to decimal(38, 0) (the weighted-similarity
    playbook).
    """
    if iters < 0:
        raise ValueError(f"iters must be >= 0, got {iters}")
    dim = _dim(emb, vec_col)
    n = emb.count()
    vecs = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("vnorm", _vec_norm("v", dim))
    cents = _stride_centroids(emb, n_clusters, id_col, vec_col, n)
    for _ in range(iters):
        assigned = _ranked_centroid_scores(vecs, cents, dim).filter(
            F.col("crank") == 1
        )
        sums = assigned.groupBy("cent_id").agg(
            F.count("*").alias("cnt"),
            *[
                F.sum(
                    F.round(
                        F.element_at("v", i + 1).cast("double")
                        * F.lit(1_000_000.0),
                        0,
                    ).cast("long")
                ).alias(f"s{i}")
                for i in range(dim)
            ],
        )
        mvec = F.array(
            *[
                (F.col(f"s{i}").cast("double") / F.lit(1_000_000.0)) / F.col("cnt")
                for i in range(dim)
            ]
        )
        cents = (
            cents.join(sums, "cent_id", "left")
            .select(
                "cent_id",
                F.when(F.col("cnt").isNull(), F.col("cvec"))
                .otherwise(mvec)
                .alias("cvec"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        _ranked_centroid_scores(vecs, cents, dim)
        .filter(F.col("crank") == 1)
        .select(
            F.col("vid").alias("vec_id"),
            F.col("cent_id").alias("cluster"),
            "csim",
        )
    )


def kmeans_clusters_sql(
    dim: int, n_clusters: int = 16, iters: int = 2, table: str = "embeddings"
) -> str:
    """Exact DuckDB oracle for `kmeans_clusters` — the ann_ivf_topk_sql
    seeding/assignment CTEs with the Lloyd rounds unrolled; centroid
    means go through the same 6-decimal integer domain, so every round
    is value-exact (see kmeans_clusters)."""
    parts = [
        f"WITH n AS (SELECT COUNT(*) AS n FROM {table})",
        f"""ranked AS (
  SELECT vec_id AS cent_id, embedding,
         ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
  FROM {table})""",
        f"""c0 AS (
  SELECT cent_id, embedding AS cvec FROM ranked
  WHERE (rn - 1) % (SELECT CAST(CEIL(n / {n_clusters}.0) AS BIGINT) FROM n) = 0)""",
    ]
    for t in range(1, iters + 1):
        cos = cosine_expr_duckdb("v.embedding", "c.cvec", dim)
        sum_cols = ", ".join(
            f"SUM(CAST(ROUND(CAST(list_extract(vv, {i + 1}) AS DOUBLE)"
            f" * 1000000.0) AS BIGINT)) AS s{i}"
            for i in range(dim)
        )
        mean_list = ", ".join(
            f"(CAST(m.s{i} AS DOUBLE) / 1000000.0) / m.cnt" for i in range(dim)
        )
        parts.append(
            f"""a{t} AS MATERIALIZED (
  SELECT * FROM (
    SELECT v.vec_id AS vid, v.embedding AS vv, c.cent_id,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY ROUND({cos}, 6) DESC, c.cent_id ASC) AS crank
    FROM {table} v CROSS JOIN c{t - 1} c) WHERE crank = 1)"""
        )
        parts.append(
            f"""m{t} AS MATERIALIZED (
  SELECT cent_id, COUNT(*) AS cnt, {sum_cols} FROM a{t} GROUP BY cent_id)"""
        )
        parts.append(
            f"""c{t} AS MATERIALIZED (
  SELECT c.cent_id,
         CASE WHEN m.cnt IS NULL THEN c.cvec
              ELSE list_value({mean_list}) END AS cvec
  FROM c{t - 1} c LEFT JOIN m{t} m ON m.cent_id = c.cent_id)"""
        )
    cos_f = cosine_expr_duckdb("v.embedding", "c.cvec", dim)
    return (
        ",\n".join(parts)
        + f"""
SELECT vid AS vec_id, cent_id AS cluster, csim FROM (
  SELECT v.vec_id AS vid, c.cent_id,
         ROUND({cos_f}, 6) AS csim,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY ROUND({cos_f}, 6) DESC, c.cent_id ASC) AS crank
  FROM {table} v CROSS JOIN c{iters} c) WHERE crank = 1
"""
    )


def ann_ivf_topk(
    emb: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: inverted-file partitioning by
    nearest centroid, query probes the ``n_probe`` nearest lists,
    exact cosine rerank inside probed lists.

    Centroids are data-sampled deterministically — every
    ceil(n/n_centroids)-th vector in vec_id order (rank-stride
    sampling, no RNG) — so the whole operator is deterministic and,
    unlike the hyperplane-LSH path, has an EXACT SQL oracle
    (ann_ivf_topk_sql): both engines compute the same centroid set,
    the same argmax-cosine assignment (round-6 sim, centroid-id
    tie-break), the same probed lists, the same rerank.

    Scale shape (100TB): centroids are a broadcast-sized table (choose
    n_centroids ~ sqrt(n)); assignment is one broadcast join + argmax
    (no shuffle of the vector table beyond the final per-list
    grouping); search touches n_probe/n_centroids of the corpus per
    query. Vector and centroid NORMS are precomputed once per row
    (never re-expanded per scored pair — at sqrt(n) centroids the
    inline expansion costs dim extra multiplies per (vector, centroid)
    pair); the factored dot/(vnorm*cnorm) is the identical IEEE
    expression tree, so the SQL oracle is unaffected.

    ``kmeans_iters > 0`` runs that many deterministic Lloyd
    refinements of the rank-stride seed (assign by argmax round-6
    cosine with centroid-id tie-break, recompute centroids as
    element-wise cluster means, empty clusters keep their previous
    vector) before the search — same seed, same result, no RNG; the
    search plan (assignment/probe contract) is unchanged. The exact
    SQL oracle covers kmeans_iters=0; the refined path is
    recall-tested against the rank-stride baseline in pytest.

    Returns (vec_id, neighbor_id, sim, rank).
    """
    dim = _dim(emb, vec_col)
    centroids = _stride_centroids(emb, n_centroids, id_col, vec_col)
    vecs = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("vnorm", _vec_norm("v", dim))
    centroids = _lloyd_refine(vecs, centroids, dim, kmeans_iters)

    # assignment + probes in one broadcast join: rank centroids per
    # vector by (round-6 cosine DESC, cent_id ASC) — rank 1 is the
    # vector's inverted list, ranks 1..n_probe are its query probes
    ranked_cents = _ranked_centroid_scores(vecs, centroids, dim)
    assign = ranked_cents.filter(F.col("crank") == 1).select(
        F.col("vid").alias("neighbor_id"), F.col("v").alias("eb"),
        F.col("vnorm").alias("nb"), "cent_id",
    )
    probes = ranked_cents.filter(F.col("crank") <= n_probe).select(
        F.col("vid").alias("vec_id"), F.col("v").alias("ea"),
        F.col("vnorm").alias("na"), "cent_id",
    )

    sim = F.round(
        F.expr(_dot_sql("ea", "eb", dim, "element_at")) / (F.col("na") * F.col("nb")), 6
    ).alias("sim")
    cands = (
        probes.join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", sim)
    )
    wk = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", "rank")
    )


def ann_ivf_topk_sql(
    dim: int, k: int = 5, n_centroids: int = 16, n_probe: int = 4,
    table: str = "embeddings",
) -> str:
    """Exact DuckDB oracle for ann_ivf_topk — same centroid sampling,
    assignment, probing, and rerank (IVF here is deterministic)."""
    cos_assign = cosine_expr_duckdb("v.embedding", "c.embedding", dim)
    cos_rerank = cosine_expr_duckdb("p.ea", "a.eb", dim)
    return f"""
WITH n AS (SELECT COUNT(*) AS n FROM {table}),
ranked AS (
  SELECT vec_id AS cent_id, embedding,
         ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
  FROM {table}),
centroids AS (
  SELECT cent_id, embedding FROM ranked
  WHERE (rn - 1) % (SELECT CAST(CEIL(n / {n_centroids}.0) AS BIGINT) FROM n) = 0),
scored AS (
  SELECT v.vec_id AS vid, v.embedding AS vv, c.cent_id,
         ROUND({cos_assign}, 6) AS csim,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY ROUND({cos_assign}, 6) DESC, c.cent_id ASC) AS crank
  FROM {table} v CROSS JOIN centroids c),
assign AS (SELECT vid AS neighbor_id, vv AS eb, cent_id FROM scored WHERE crank = 1),
probes AS (SELECT vid AS vec_id, vv AS ea, cent_id FROM scored WHERE crank <= {n_probe}),
cands AS (
  SELECT p.vec_id, a.neighbor_id, ROUND({cos_rerank}, 6) AS sim
  FROM probes p JOIN assign a ON a.cent_id = p.cent_id
  WHERE p.vec_id != a.neighbor_id),
rr AS (
  SELECT vec_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM cands)
SELECT vec_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM rr WHERE rank <= {k}
"""


# ----------------------------------------------------------- ANN (LSH)

def _planes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random-hyperplane matrix (dim x n_planes)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes)).astype(np.float64)


def _signature_sql(
    dim: int, n_planes: int, seed: int, vec: str, extract: str
) -> str:
    """Bucket expression: sign bits under the deterministic hyperplane
    matrix, INLINED as double literals (repr() round-trips IEEE
    doubles through both SQL parsers). The dot products are the same
    left-associated explicit sums as the cosine expressions, so Spark
    and DuckDB compute bit-identical doubles — identical SIGNS — and
    the bucket assignment is engine-exact, which is what makes
    ann_lsh_topk SQL-oracle-able."""
    planes = _planes(dim, n_planes, seed)
    bits = []
    for i in range(n_planes):
        terms = " + ".join(
            f"CAST({extract}({vec}, {j + 1}) AS DOUBLE) * {planes[j, i]!r}"
            for j in range(dim)
        )
        bits.append(f"CASE WHEN (0.0 + {terms}) > 0 THEN {1 << i} ELSE 0 END")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def lsh_signatures(
    emb: DataFrame, n_planes: int = 16, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    max_sql_terms: int = 2048,
) -> DataFrame:
    """(vec_id, bucket): sign-bit signature under deterministic random
    hyperplanes.

    Two physical paths, same buckets:

    * ``dim * n_planes <= max_sql_terms``: ONE generated JVM-side
      expression (plane matrix inlined as double literals — no Python
      in the path, whole-stage codegen, SQL-oracle-able).
    * above the threshold: a vectorized Arrow kernel (mapInPandas
      numpy matmul) — the generated expression at realistic embedding
      dims (384-1536 x n_planes) is 10^4-10^5 terms, past Janino's
      64KB method limit, while the kernel is one BLAS matmul per
      batch. Signs agree between the paths for any dot product not
      within ~1e-16*norm of zero (asserted cross-path at dim 256 in
      tests/test_pipeline.py).
    """
    dim = _dim(emb, vec_col)
    if dim * n_planes <= max_sql_terms:
        return emb.select(
            F.col(id_col).alias("vec_id"),
            F.expr(_signature_sql(dim, n_planes, seed, vec_col, "element_at")).alias("bucket"),
        )
    planes = _planes(dim, n_planes, seed)
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            bucket = ((M @ planes) > 0).astype(np.int64) @ weights
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(), "bucket": bucket})

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, bucket long"
    )


def auto_n_planes(n_vectors: int) -> int:
    """Plane count scaling with corpus size: ~log2(n) + 2 sign bits
    puts bucket count at ~4n, keeping expected in-bucket occupancy
    O(1) — in-bucket candidate generation is quadratic per bucket, so
    a FIXED plane count stops scaling the moment n outgrows 2^planes
    (the round-1 4k-bucket defect)."""
    import math

    return max(8, int(math.ceil(math.log2(max(n_vectors, 2)))) + 2)


def ann_lsh_topk(
    emb: DataFrame, k: int = 5, n_planes: int | None = None, seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: LSH bucket -> exact rerank in bucket.

    n_planes: None (default) derives the signature width from the
    corpus size via auto_n_planes so bucket count tracks n.
    multiprobe: also probe the n_planes single-bit-flip neighbor
    buckets of each query (classic multi-probe LSH — recovers most of
    the recall the hard bucket boundary loses). Approximate in RECALL
    but deterministic in OUTPUT: with a pinned n_planes the exact
    result is SQL-oracle-checkable (ann_lsh_topk_sql — the signature
    expression is engine-exact); tests additionally measure recall vs
    cosine_topk. The signature auto-routes to the Arrow matmul kernel
    above lsh_signatures' dim*n_planes threshold, so the operator
    survives realistic embedding dims (384-1536) where the generated
    SQL expression would blow past codegen limits.
    """
    if n_planes is None:
        n_planes = auto_n_planes(emb.count())
    dim = _dim(emb, vec_col)
    sig = lsh_signatures(emb, n_planes, seed, id_col, vec_col)
    data = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("eb")
    ).join(sig.select(F.col("vec_id").alias("neighbor_id"), "bucket"), "neighbor_id")

    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        queries = (
            emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("ea"))
            .join(sig, "vec_id")
            .select("vec_id", "ea", F.explode(probes).alias("bucket"))
        )
    else:
        queries = emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("ea")).join(
            sig, "vec_id"
        )

    sim = F.round(cosine_expr_spark("ea", "eb", dim), 6).alias("sim")
    cands = (
        queries.join(data, "bucket")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", sim)
        .dropDuplicates(["vec_id", "neighbor_id"])
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", "rank")
    )


def ann_lsh_topk_sql(
    dim: int, k: int = 5, n_planes: int = 11, seed: int = 42,
    table: str = "embeddings",
) -> str:
    """Exact DuckDB oracle for ann_lsh_topk(multiprobe=True) at a
    PINNED n_planes: the engine-exact signature expression
    (_signature_sql) reproduces the same buckets, the probe set is the
    same n_planes single-bit flips, and the rerank is the shared
    cross-engine cosine — so the approximate operator's exact output
    (not just its recall) is oracle-checkable."""
    sig_expr = _signature_sql(dim, n_planes, seed, "embedding", "list_extract")
    cos = cosine_expr_duckdb("a.embedding", "b.embedding", dim)
    probes = "\n  UNION ALL ".join(
        ["SELECT vec_id, bucket FROM sig"]
        + [f"SELECT vec_id, xor(bucket, {1 << i}) FROM sig" for i in range(n_planes)]
    )
    return f"""
WITH sig AS MATERIALIZED (
  SELECT vec_id, {sig_expr} AS bucket FROM {table}),
probes AS (
  {probes}),
cand AS (
  SELECT DISTINCT q.vec_id AS vec_id, d.vec_id AS neighbor_id
  FROM probes q JOIN sig d ON q.bucket = d.bucket AND q.vec_id != d.vec_id),
scored AS (
  SELECT c.vec_id, c.neighbor_id, ROUND({cos}, 6) AS sim
  FROM cand c
  JOIN {table} a ON a.vec_id = c.vec_id
  JOIN {table} b ON b.vec_id = c.neighbor_id),
ranked AS (
  SELECT vec_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT vec_id, neighbor_id, sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ------------------------------------------------ semantic dedup (SemDeDup)

def auto_n_clusters(n_vectors: int, target_occupancy: int = 256) -> int:
    """Cluster count scaling with corpus size: n / target_occupancy
    keeps the expected in-cluster pair work (occupancy² per cluster)
    CONSTANT per vector as n grows — a fixed n_clusters stops scaling
    the moment clusters outgrow memory (same defect class as the
    round-1 fixed LSH plane count)."""
    return max(1, -(-n_vectors // target_occupancy))


def _assigned_members(
    emb: DataFrame,
    n_clusters: int | str,
    kmeans_iters: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vid, v, vnorm, cent_id): every vector with its assigned
    cluster under the shared deterministic contract (the helpers above
    — same code path ann_ivf_topk uses)."""
    dim = _dim(emb, vec_col)
    n = emb.count()
    if n_clusters == "auto":
        n_clusters = auto_n_clusters(n)
    centroids = _stride_centroids(emb, n_clusters, id_col, vec_col, n=n)
    vecs = emb.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("vnorm", _vec_norm("v", dim))
    centroids = _lloyd_refine(vecs, centroids, dim, kmeans_iters)
    return (
        _ranked_centroid_scores(vecs, centroids, dim)
        .filter(F.col("crank") == 1)
        .select("vid", "v", "vnorm", "cent_id")
    )


def semantic_cluster_assign(
    emb: DataFrame,
    n_clusters: int | str = 16,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster): the cluster assignment semantic_dedup_pairs
    dedups within — exposed so callers (and tests) can reconstruct the
    cluster-bounded contract independently of the pair join."""
    return _assigned_members(emb, n_clusters, kmeans_iters, id_col, vec_col).select(
        F.col("vid").alias("vec_id"), F.col("cent_id").alias("cluster")
    )


def semantic_dedup_pairs(
    emb: DataFrame,
    n_clusters: int | str = 16,
    threshold: float = 0.4,
    kmeans_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540, public): cluster the embedding space, then emit
    near-duplicate pairs ONLY within each cluster — the defining
    SemDeDup trade: the O(n^2) global pair space shrinks to
    O(sum |cluster_i|^2) and cross-cluster pairs are by-construction
    out of contract (not a recall bug; the oracle checks the same
    cluster-bounded semantics).

    Deterministic contract (shared with ann_ivf_topk): centroids are
    rank-stride sampled in vec_id order (no RNG), assignment is argmax
    round-6 cosine with centroid-id tie-break, in-cluster similarity is
    the exact shared-IEEE cosine rounded to 6 decimals. kmeans_iters=0
    (the SQL-oracle'd default) uses the raw stride seed; > 0 runs
    deterministic Lloyd refinements (recall-tested in pytest, not
    SQL-expressible).

    Scale shape (100TB): centroids are a broadcast-sized table (choose
    n_clusters ~ n / target cluster occupancy); assignment is one
    broadcast join + argmax, and the corpus shuffles ONCE keyed by
    cluster id for the self-join. The assigned (id, vec, norm, cluster)
    table is persisted before the self-join so the assignment subtree
    evaluates exactly once under any join strategy (the round-3 LSH
    lesson — AQE broadcasting one side otherwise re-runs it per side).

    Returns (id1, id2, cluster, sim) with id1 < id2 and
    round(sim, 6) >= threshold. ``n_clusters="auto"`` derives the
    cluster count from the corpus size via auto_n_clusters (pin an
    explicit value when the SQL oracle must reproduce the run).
    """
    dim = _dim(emb, vec_col)
    members = _assigned_members(emb, n_clusters, kmeans_iters, id_col, vec_col).persist()

    a = members.select(
        F.col("vid").alias("id1"), F.col("v").alias("ea"),
        F.col("vnorm").alias("na"), "cent_id",
    )
    b = members.select(
        F.col("vid").alias("id2"), F.col("v").alias("eb"),
        F.col("vnorm").alias("nb"), "cent_id",
    )
    sim = F.round(
        F.expr(_dot_sql("ea", "eb", dim, "element_at")) / (F.col("na") * F.col("nb")), 6
    ).alias("sim")
    out = (
        a.join(b, "cent_id")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.col("cent_id").alias("cluster"), sim)
        .filter(F.col("sim") >= threshold)
    )
    return _attach_caches(out, [members])


def semantic_dedup_pairs_sql(
    dim: int, n_clusters: int = 16, threshold: float = 0.4,
    table: str = "embeddings",
) -> str:
    """Exact DuckDB oracle for semantic_dedup_pairs(kmeans_iters=0) —
    same stride centroids, same argmax assignment, same in-cluster
    rounded cosine (the factored dot/(norm*norm) is the identical IEEE
    expression tree as sqrt-in-place, per the ann_ivf_topk parity
    argument)."""
    cos_assign = cosine_expr_duckdb("v.embedding", "c.embedding", dim)
    cos_pair = cosine_expr_duckdb("a.vv", "b.vv", dim)
    return f"""
WITH n AS (SELECT COUNT(*) AS n FROM {table}),
ranked AS (
  SELECT vec_id AS cent_id, embedding,
         ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
  FROM {table}),
centroids AS (
  SELECT cent_id, embedding FROM ranked
  WHERE (rn - 1) % (SELECT CAST(CEIL(n / {n_clusters}.0) AS BIGINT) FROM n) = 0),
scored AS (
  SELECT v.vec_id AS vid, v.embedding AS vv, c.cent_id,
         ROW_NUMBER() OVER (PARTITION BY v.vec_id
                            ORDER BY ROUND({cos_assign}, 6) DESC, c.cent_id ASC) AS crank
  FROM {table} v CROSS JOIN centroids c),
members AS (SELECT vid, vv, cent_id FROM scored WHERE crank = 1)
SELECT a.vid AS id1, b.vid AS id2, a.cent_id AS cluster,
       ROUND({cos_pair}, 6) AS sim
FROM members a JOIN members b ON a.cent_id = b.cent_id AND a.vid < b.vid
WHERE ROUND({cos_pair}, 6) >= {threshold}
"""


def quantize_embeddings(emb: DataFrame, col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Int8 scalar quantization of an embedding column — the storage/
    ANN compression pass (4x smaller than float32; the standard
    pre-step for product-quantized indexes).

    Per-dimension corpus min/max define the scale; output is the
    relational long form ``(vec_id, dim, qval ∈ [-128, 127], dq)``
    with ``dq`` the dequantized double (rounded 6) so reconstruction
    error is directly queryable. Constant dimensions quantize to 0.

    Cross-engine exactness: FLOAT inputs are explicitly CAST to
    DOUBLE before any arithmetic (promotion points would otherwise
    differ), min/max are order-free (no float sums anywhere), and the
    quantizer rounds a non-negative value (Spark HALF_UP == DuckDB
    half-away for non-negatives).

    Scale shape: one posexplode + a groupBy over ``dim`` keys
    (map-side partial min/max collapse each split to |dim| rows) +
    one broadcast join of the |dim|-row stats frame. No shuffle of
    the corpus itself beyond the explode's narrow lineage.
    """
    ex = emb.select(
        F.col(id_col), F.posexplode(F.col(col)).alias("pos", "v")
    ).select(id_col, (F.col("pos") + 1).alias("dim"), "v")
    stats = ex.groupBy("dim").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    vd = F.col("v").cast("double")
    mnd = F.col("mn").cast("double")
    mxd = F.col("mx").cast("double")
    qval = (
        F.when(
            mxd > mnd,
            (F.round((vd - mnd) * (F.lit(255.0) / (mxd - mnd)))).cast("long") - 128,
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    out = ex.join(F.broadcast(stats), "dim").select(
        id_col, "dim", qval.alias("qval"), "mn", "mx"
    )
    dq = F.when(
        F.col("mx").cast("double") > F.col("mn").cast("double"),
        F.col("mn").cast("double")
        + (F.col("qval") + 128)
        * ((F.col("mx").cast("double") - F.col("mn").cast("double")) / F.lit(255.0)),
    ).otherwise(F.col("mn").cast("double"))
    return out.select(id_col, "dim", "qval", F.round(dq, 6).alias("dq"))


def quantize_embeddings_sql(table: str = "embeddings") -> str:
    """DuckDB twin of `quantize_embeddings` — identical double
    promotions, round-then-cast (DuckDB CAST(double AS BIGINT) rounds,
    so the explicit ROUND keeps both engines integral first)."""
    return f"""
WITH ex AS (SELECT vec_id, unnest(embedding) AS v,
                   unnest(generate_series(1, len(embedding))) AS dim
            FROM {table}),
st AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim),
q AS (SELECT e.vec_id, e.dim, s.mn, s.mx,
             CASE WHEN CAST(s.mx AS DOUBLE) > CAST(s.mn AS DOUBLE)
                  THEN CAST(ROUND((CAST(e.v AS DOUBLE) - CAST(s.mn AS DOUBLE))
                                  * (255.0 / (CAST(s.mx AS DOUBLE) - CAST(s.mn AS DOUBLE))))
                            AS BIGINT) - 128
                  ELSE 0 END AS qval
      FROM ex e JOIN st s USING (dim))
SELECT vec_id, dim, qval,
       ROUND(CASE WHEN CAST(mx AS DOUBLE) > CAST(mn AS DOUBLE)
                  THEN CAST(mn AS DOUBLE) + (qval + 128)
                       * ((CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE)) / 255.0)
                  ELSE CAST(mn AS DOUBLE) END, 6) AS dq
FROM q
"""


def _sq_l2_expr(a: str, b: str, lo: int, hi: int):
    """Left-assoc squared-L2 over elements lo..hi (1-based, inclusive)
    — fixed addition order keeps both engines bit-identical."""
    e = None
    for i in range(lo, hi + 1):
        t = F.element_at(F.col(a), i).cast("double") - F.element_at(
            F.col(b), i
        ).cast("double")
        term = t * t
        e = term if e is None else e + term
    return e


def pq_encode(
    emb: DataFrame,
    m: int = 8,
    n_centroids: int = 16,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encoding (Jégou et al. 2011, TPAMI —
    "Product Quantization for Nearest Neighbor Search"): split each
    vector into ``m`` subvectors, assign every subvector to its
    nearest codebook entry, emit ``(vec_id, subspace, code, dist)``.
    m·log2(k) bits per vector — the standard compressed-index layout
    at 100 TB ANN scale (one byte per subspace at k=256).

    Codebooks are deterministic: the rank-stride corpus rows (the
    shared contract with `ann_ivf_topk` / SemDeDup) provide the
    subvector codebook for every subspace; assignment is argmin
    squared L2 with the fixed left-assoc term order, rounded to 6
    before ranking (ties -> lowest code), so the DuckDB oracle
    replays every code exactly.

    Scale: one broadcast of the k-row codebook against the corpus
    (no shuffle of the corpus), the m per-subspace distances computed
    in one pass per (vector, centroid) row, argmin as a pair-keyed
    partial aggregation.
    """
    dim = _dim(emb, col)
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim ({dim}), got m={m}")
    sub = dim // m
    cents = _stride_centroids(emb, n_centroids, id_col, col)
    cents = cents.withColumn(
        "code", F.row_number().over(Window.orderBy("cent_id")) - 1
    ).select("code", "cvec")
    joined = emb.select(id_col, col).crossJoin(F.broadcast(cents))
    per_sub = F.array(
        *[
            F.struct(
                F.lit(s).cast("long").alias("subspace"),
                F.round(
                    _sq_l2_expr(col, "cvec", s * sub + 1, (s + 1) * sub), 6
                ).alias("dist"),
            )
            for s in range(m)
        ]
    )
    exploded = joined.select(
        id_col, "code", F.explode(per_sub).alias("sd")
    ).select(id_col, "code", F.col("sd.subspace").alias("subspace"), F.col("sd.dist").alias("dist"))
    best = (
        exploded.groupBy(id_col, "subspace")
        .agg(
            F.min(
                F.struct(F.col("dist").alias("d"), F.col("code").alias("c"))
            ).alias("b")
        )
        .select(
            id_col,
            "subspace",
            F.col("b.c").cast("long").alias("code"),
            F.col("b.d").alias("dist"),
        )
    )
    return best


def pq_encode_sql(
    dim: int,
    m: int = 8,
    n_centroids: int = 16,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of `pq_encode` — same rank-stride codebook, the
    same left-assoc squared-L2 expansion, ROW_NUMBER argmin."""
    if m < 1 or dim % m != 0:
        raise ValueError(f"m must divide dim ({dim}), got m={m}")
    sub = dim // m

    def sq(lo: int, hi: int) -> str:
        terms = [
            f"(CAST(v.embedding[{i}] AS DOUBLE) - CAST(c.cvec[{i}] AS DOUBLE))"
            f" * (CAST(v.embedding[{i}] AS DOUBLE) - CAST(c.cvec[{i}] AS DOUBLE))"
            for i in range(lo, hi + 1)
        ]
        out = terms[0]
        for t in terms[1:]:
            out = f"({out} + {t})"
        return out

    branches = "\nUNION ALL ".join(
        f"SELECT vec_id, code, CAST({s} AS BIGINT) AS subspace, "
        f"ROUND({sq(s * sub + 1, (s + 1) * sub)}, 6) AS dist "
        f"FROM {table} v CROSS JOIN cents c"
        for s in range(m)
    )
    return f"""
WITH n AS (SELECT COUNT(*) AS n FROM {table}),
ranked AS (SELECT vec_id AS cent_id, embedding,
                  ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
           FROM {table}),
cents AS (SELECT ROW_NUMBER() OVER (ORDER BY cent_id) - 1 AS code,
                 embedding AS cvec
          FROM ranked
          WHERE (rn - 1) % (SELECT CAST(CEIL(n / {n_centroids}.0) AS BIGINT) FROM n) = 0),
d AS ({branches}),
rk AS (SELECT vec_id, subspace, code, dist,
              ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
                                 ORDER BY dist ASC, code ASC) AS rn
       FROM d)
SELECT vec_id, subspace, CAST(code AS BIGINT) AS code, dist
FROM rk WHERE rn = 1
"""


# --------------------------------------------- greedy k-center selection

def _dist2_sql(a: str, b: str, dim: int, extract: str) -> str:
    """Squared L2 between two int64-quantized vectors — pure int64
    arithmetic, exact and order-free on both engines."""
    terms = " + ".join(
        f"({extract}({a}, {i}) - {extract}({b}, {i})) * "
        f"({extract}({a}, {i}) - {extract}({b}, {i}))"
        for i in range(1, dim + 1)
    )
    return f"(0 + {terms})"


def kcenter_select(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
) -> DataFrame:
    """Greedy k-center / farthest-point selection (Gonzalez 1985) —
    the diversity-sampling step of training-data curation (pick the k
    most mutually-distant exemplars; a 2-approximation of the optimal
    covering radius). Returns the selection sequence
    (sel_order, vec_id, d2) where d2 is the point's squared L2
    distance — in 1e-6-quantized integer units² — to the nearest
    previously-selected center at the moment it was chosen (0 for the
    seed, the min-id vector). Any drift anywhere in the distance field
    reorders the sequence, so the oracle compare is strict.

    Exactness: coordinates are quantized once (ROUND(x*1e6) int64);
    every distance is an int64 sum of squared diffs — no float
    accumulation anywhere, so Spark and the unrolled DuckDB twin agree
    bit-for-bit, ties broken by (d2 DESC, id ASC).

    Spark-first shape (100TB): the greedy is inherently sequential in
    k — each round is ONE distributed TakeOrdered argmax over the
    cached quantized table, then the 1-row winner (the only
    driver-side material, the size-gated-collect pattern of mst/ivf)
    is inlined as literals into the next round's min-distance update
    (Θ(nk) total work, the algorithm's lower bound; everything stays
    whole-stage codegen). Keep k modest (coreset sizes, <= a few
    hundred) — beyond that, switch to the kmeans_clusters +
    per-cluster quota_sample composition.

    Degenerate input (k > number of DISTINCT points): once every
    point coincides with a center the farthest distance is 0 and the
    argmax deterministically re-picks the min-id point — duplicated
    trailing selections, identical on both engines.

    Resumable (each round scans the full corpus — at coreset k this
    is a long-running selection): with ``checkpoint_dir`` every
    ``checkpoint_every``-th round writes the distance field AND the
    cumulative pick sequence durably; ``resume=True`` re-enters at the
    last durable round (including to EXTEND k), guarded by a corpus
    fingerprint (bit_xor of per-id xxhash64 + row count).
    """
    import json as _json

    from linkgraph.checkpoint import SuperstepLoop

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dim = _dim(emb, vec_col)
    spark = emb.sparkSession
    q = _kcenter_quantized(emb, id_col, vec_col).persist()
    context = {}
    if checkpoint_dir:
        fp = q.agg(
            F.expr("bit_xor(xxhash64(id))").alias("fp"), F.count("*").alias("n")
        ).first()
        context = {"corpus_fp": fp["fp"], "n_vectors": fp["n"]}
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="kcenter",
        context=context, max_steps=k,
    )

    def _d2_lit(cvec: list[int]):
        terms = " + ".join(
            f"(element_at(qv, {i}) - {cvec[i - 1]}L) * "
            f"(element_at(qv, {i}) - {cvec[i - 1]}L)"
            for i in range(1, dim + 1)
        )
        return F.expr(f"(0L + {terms})")

    picks: list[tuple[int, int, int]] = []
    start = 0
    state = None
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            start, state = resumed
            if loop.last_context and context and loop.last_context != context:
                raise ValueError(
                    "kcenter resume mismatch: the embedding corpus differs "
                    f"from the checkpointed one ({loop.last_context} != {context})"
                )
            picks = [tuple(x) for x in _json.loads(loop.last_metrics["picks_json"])]
    if state is None:
        seed = q.orderBy(F.asc("id")).first()
        picks = [(0, seed["id"], 0)]
        state = loop.advance(
            0,
            q.select("id", "qv", _d2_lit(list(seed["qv"])).alias("dmin")),
            force_checkpoint=bool(checkpoint_dir),
            metrics={"picks_json": _json.dumps(picks)},
        )
    for r in range(start + 1, k):
        nxt = _kcenter_argmax(state).first()
        picks.append((r, nxt["id"], nxt["dmin"]))
        # advance EVERY round (incl. the last): the durable state must
        # carry this pick's distance update or a resumed EXTENSION of k
        # would select against stale distances
        state = loop.advance(
            r,
            state.select(
                "id", "qv", F.least("dmin", _d2_lit(list(nxt["qv"]))).alias("dmin")
            ),
            metrics={"picks_json": _json.dumps(picks)},
        )
    state.unpersist()
    q.unpersist()
    return spark.createDataFrame(
        picks, "sel_order long, vec_id long, d2 long"
    )


def _kcenter_quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, qv) — the 1e-6-quantized int64 vector table."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({vec_col}, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT))"
        ).alias("qv"),
    )


def _kcenter_argmax(state: DataFrame) -> DataFrame:
    """The per-round farthest-point argmax (1 row): must plan as a
    distributed TakeOrdered, never a global sort — plan-tested."""
    return state.orderBy(F.desc("dmin"), F.asc("id")).limit(1)


def kcenter_select_sql(dim: int, k: int = 8, table: str = "embeddings") -> str:
    """Unrolled DuckDB twin of ``kcenter_select`` — identical int64
    distance field, argmax, and tie-breaks per round."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    d2 = _dist2_sql("s.qv", "c.qv", dim, "list_extract")
    ctes = [
        (
            "q AS (SELECT vec_id AS id, "
            "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv "
            f"FROM {table})"
        ),
        "c0 AS MATERIALIZED (SELECT id, qv FROM q ORDER BY id LIMIT 1)",
        f"s0 AS MATERIALIZED (SELECT s.id, s.qv, {d2} AS dmin FROM q s, c0 c)",
    ]
    picks = ["SELECT CAST(0 AS BIGINT) AS sel_order, id AS vec_id, CAST(0 AS BIGINT) AS d2 FROM c0"]
    for r in range(1, k):
        ctes.append(
            f"c{r} AS MATERIALIZED (SELECT id, qv, dmin FROM s{r - 1} ORDER BY dmin DESC, id LIMIT 1)"
        )
        ctes.append(
            f"s{r} AS MATERIALIZED (SELECT s.id, s.qv, LEAST(s.dmin, {d2}) AS dmin "
            f"FROM s{r - 1} s, c{r} c)"
        )
        picks.append(
            f"SELECT CAST({r} AS BIGINT), id, CAST(dmin AS BIGINT) FROM c{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(picks)


def embedding_covariance(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Sample covariance matrix of an embedding column, LONG format
    (i, j, cov) with 1-based dims and i <= j (arrays are unsortable in
    the oracle comparator — the fastrp/propagate_features contract).

    The PCA/whitening front door for embedding curation: feed the
    matrix to `pca_project` (driver-side eigendecomposition — d x d is
    tiny even when n is 10^12).

    Cross-engine exactness: components quantize ONCE to x6 =
    ROUND(v * 1e6) BIGINT; Σx_i, Σx_i·x_j are integer sums;
    cov = (n·Σxy − Σx·Σy) / (n(n−1)) de-scaled by 1e12, computed as
    DECIMAL(38,0) numerator then ONE double division sequence
    (/(n(n-1)) then /1e12, 9-decimal round) — identical IEEE ops in
    DuckDB (`embedding_covariance_sql`).

    Scale notes (100TB): the d(d+1)/2 per-row products are generated
    JVM-side by one nested transform over the array (no join, no
    UDF) and fall into ONE map-side-combined groupBy(i, j) — the
    shuffle moves exactly d(d+1)/2 partial-sum rows per task, not
    per document. Marginals ride the diagonal of the same aggregate
    (j = i pairs), so ONE pass over the corpus total."""
    dim = _dim(emb, vec_col)
    x6 = F.expr(
        f"transform({vec_col}, v -> "
        "CAST(ROUND(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))"
    )
    pairs = (
        emb.select(x6.alias("x6"))
        .select(
            F.explode(
                F.flatten(
                    F.expr(
                        "transform(x6, (xi, i) -> "
                        "transform(slice(x6, i + 1, size(x6) - i), "
                        "(xj, jr) -> struct(CAST(i + 1 AS BIGINT) AS i, "
                        "CAST(i + 1 + jr AS BIGINT) AS j, xi * xj AS p, "
                        "xi AS xi)))"
                    )
                )
            ).alias("t")
        )
        .select("t.i", "t.j", "t.p", "t.xi")
    )
    # accumulate straight into DECIMAL(38,0): a LongType sum of
    # per-row xi*xj products (<= 1e12 each) would overflow int64
    # around ~9e6 rows, far below the advertised corpus scale, while
    # the DuckDB twin sums into HUGEINT
    sums = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("sp"),
        # Σx_i rides along: each (i, j) group holds one xi per row, but
        # only the diagonal group (j = i) is a clean per-dim marginal
        F.sum(
            F.when(F.col("j") == F.col("i"), F.col("xi"))
            .cast("decimal(38,0)")
        ).alias("sxd"),
    )
    n = emb.count()
    if n < 2:
        raise ValueError(f"covariance needs >= 2 rows, got {n}")
    marg = sums.filter(F.col("i") == F.col("j")).select(
        F.col("i").alias("d"), F.col("sxd").alias("sx")
    )
    dec = "decimal(38,0)"
    num = (
        F.lit(n).cast(dec) * F.col("sp").cast(dec)
        - F.col("sx_i").cast(dec) * F.col("sx_j").cast(dec)
    )
    return (
        sums.join(F.broadcast(marg.select(F.col("d").alias("i"),
                                          F.col("sx").alias("sx_i"))), "i")
        .join(F.broadcast(marg.select(F.col("d").alias("j"),
                                      F.col("sx").alias("sx_j"))), "j")
        .select(
            "i", "j",
            F.round(
                num.cast("double")
                / F.lit(int(n) * (int(n) - 1)).cast("double")
                / F.lit(1_000_000_000_000.0),
                9,
            ).alias("cov"),
        )
    )


def embedding_covariance_sql(dim: int, table: str = "embeddings") -> str:
    """DuckDB twin of `embedding_covariance` (1-based list indexing;
    HUGEINT sums cast through DECIMAL(38,0))."""
    return f"""
WITH x AS (
  SELECT list_transform(embedding,
         v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS x6
  FROM {table}),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
idx AS (SELECT CAST(range AS BIGINT) + 1 AS i FROM range(0, {dim})),
pairs AS (
  SELECT d1.i AS i, d2.i AS j,
         CAST(SUM(x.x6[d1.i] * x.x6[d2.i]) AS DECIMAL(38,0)) AS sp
  FROM x, idx d1, idx d2 WHERE d2.i >= d1.i
  GROUP BY d1.i, d2.i),
marg AS (
  SELECT d1.i AS d, CAST(SUM(x.x6[d1.i]) AS DECIMAL(38,0)) AS sx
  FROM x, idx d1 GROUP BY d1.i)
SELECT p.i, p.j,
       ROUND(CAST(CAST(n.n AS DECIMAL(38,0)) * p.sp - mi.sx * mj.sx AS DOUBLE)
             / CAST(n.n * (n.n - 1) AS DOUBLE)
             / 1000000000000.0, 9) AS cov
FROM pairs p
JOIN marg mi ON mi.d = p.i
JOIN marg mj ON mj.d = p.j
CROSS JOIN n
"""


def pca_project(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project embeddings onto their top-k principal components.

    Covariance comes from `embedding_covariance` (one distributed
    pass); the d x d eigendecomposition runs DRIVER-SIDE via numpy
    (d is the embedding width — tiny regardless of corpus size), with
    a deterministic sign fix (largest-|.| loading made positive,
    min-index tie-break). The projection itself is a JVM-side
    expression over the centered vector — component weights are
    inlined literals (the LSH-planes pattern), no UDF.

    Returns LONG format (vec_id, component, value) with component in
    [1, k] and value rounded to 6. Library operator: the eigvec step
    is numpy's LAPACK — deterministic for a fixed input but not
    SQL-reproducible, so correctness is pytest-gated (vs numpy PCA,
    orthonormality, explained-variance ordering) rather than
    DuckDB-oracled."""
    import numpy as np

    dim = _dim(emb, vec_col)
    if not (1 <= k <= dim):
        raise ValueError(f"k must be in [1, {dim}]: got {k}")
    cov_rows = embedding_covariance(emb, id_col=id_col, vec_col=vec_col).collect()
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(-vals, kind="stable")[:k]
    comps = []
    for c in order:
        v = vecs[:, c]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        comps.append(v)
    # per-dim means for centering, from the exact x6 INTEGER sums —
    # a float F.sum over raw doubles would be partition-order
    # dependent and could flip a 6-decimal rounding boundary between
    # otherwise-identical runs
    n = emb.count()
    x6_expr = F.expr(
        f"transform({vec_col}, v -> "
        "CAST(ROUND(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))"
    )
    sums = (
        emb.select(F.posexplode(x6_expr).alias("d", "v"))
        .groupBy("d")
        .agg(F.sum("v").cast("long").alias("s"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in sums:
        mean[r["d"]] = r["s"] / n / 1e6
    projs = []
    for ci, v in enumerate(comps, start=1):
        # float(): numpy >= 2.0 repr()s scalars as 'np.float64(x)',
        # which F.expr cannot parse
        terms = " + ".join(
            f"(CAST({vec_col}[{d}] AS DOUBLE) - ({float(mean[d])!r}))"
            f" * ({float(v[d])!r})"
            for d in range(dim)
        )
        projs.append(
            F.round(F.expr(terms), 6).alias(f"c{ci}")
        )
    wide = emb.select(F.col(id_col).alias("vec_id"), *projs)
    stack = ", ".join(f"CAST({ci} AS BIGINT), c{ci}" for ci in range(1, k + 1))
    return wide.selectExpr(
        "vec_id", f"stack({k}, {stack}) AS (component, value)"
    )


# --------------------------------------------------------------- MMR

def _qnorm_expr(vec_col: str, dim: int, extract: str) -> str:
    """Quantized-NORMALIZED vector: round(x_i/||x|| * 1e6) as int64.

    The norm is one sqrt of an index-ordered float sum — the identical
    expression tree on both engines, so every component (and every
    int64 dot product downstream) is bit-exact cross-engine."""
    sq = " + ".join(
        f"CAST({extract}({vec_col}, {i}) AS DOUBLE) * "
        f"CAST({extract}({vec_col}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    comps = ", ".join(
        f"CAST(ROUND(CAST({extract}({vec_col}, {i}) AS DOUBLE) / "
        f"sqrt(0.0 + {sq}) * 1000000, 0) AS BIGINT)"
        for i in range(1, dim + 1)
    )
    arr = "array" if extract == "element_at" else "list_value"
    return f"{arr}({comps})"


def _idot_sql(a: str, b: str, dim: int, extract: str) -> str:
    """int64 dot of two quantized vectors (~cosine * 1e12) — order-free."""
    terms = " + ".join(
        f"{extract}({a}, {i}) * {extract}({b}, {i})" for i in range(1, dim + 1)
    )
    return f"(0 + {terms})"


def _idot_lit(qn_col: str, vec: list[int], dim: int) -> "F.Column":
    terms = " + ".join(
        f"element_at({qn_col}, {i}) * {vec[i - 1]}L" for i in range(1, dim + 1)
    )
    return F.expr(f"(0L + {terms})")


def mmr_select(
    emb: DataFrame,
    k: int = 8,
    lambda_pct: int = 70,
    query_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diverse top-k selection (Carbonell &
    Goldstein SIGIR'98 — public result): greedily pick the k items
    maximizing  lambda*rel(item) - (1-lambda)*max_sim(item, selected),
    the standard redundancy-penalized retrieval / training-data
    subset-selection step (relevant AND mutually diverse).

    Engine discipline (the kcenter_select pattern): vectors are
    normalized then quantized once (round(x/||x||*1e6) int64), so
    relevance and pairwise similarity are int64 dot products
    (~cosine*1e12) and the MMR score
    ``lambda_pct*rel - (100-lambda_pct)*smax`` is pure integer
    arithmetic — bit-exact in Spark, DuckDB (``mmr_select_sql``) and
    Python; ties broken by id ASC. ``max_sim`` over the empty selected
    set is 0 (the classic convention), so round 0 is the pure
    relevance argmax. Relevance is the dot with the ``query_id``
    vector (default: the min-id vector); the query item itself is
    excluded from selection. Zero vectors are dropped (undefined
    cosine).

    Spark-first shape (100TB): sequential in k by nature — per round
    ONE distributed TakeOrdered argmax over the pinned quantized
    corpus; the 1-row winner is inlined as literals into the next
    round's ``smax`` update (Θ(nk) total, everything whole-stage
    codegen; keep k modest — selection-set sizes, not corpus sizes).

    Returns (sel_order, vec_id, mmr_score) with the integer score in
    lambda-scaled 1e-12-cosine units.
    """
    from linkgraph.checkpoint import pin_table as _pin, release_state as _rel

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lambda_pct <= 100:
        raise ValueError(f"lambda_pct must be in [0, 100], got {lambda_pct}")
    dim = _dim(emb, vec_col)
    spark = emb.sparkSession
    sq = " + ".join(
        f"CAST(element_at({vec_col}, {i}) AS DOUBLE) * "
        f"CAST(element_at({vec_col}, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    qn = (
        emb.filter(F.expr(f"(0.0 + {sq}) > 0"))
        .select(
            F.col(id_col).alias("id"),
            F.expr(_qnorm_expr(vec_col, dim, "element_at")).alias("qn"),
        )
    )
    if query_id is None:
        row = qn.orderBy(F.asc("id")).first()
    else:
        row = qn.filter(F.col("id") == query_id).first()
    if row is None:
        raise ValueError(
            f"query vector not found (query_id={query_id!r}, empty or "
            "all-zero corpus?)"
        )
    qvec = list(row["qn"])
    state = _pin(
        qn.filter(F.col("id") != row["id"])
        .select(
            "id", "qn",
            _idot_lit("qn", qvec, dim).alias("rel"),
            F.lit(0).cast("long").alias("smax"),
        )
    )
    lam, mu = lambda_pct, 100 - lambda_pct
    picks: list[tuple[int, int, int]] = []
    picked: list[int] = []
    for r in range(k):
        nxt = (
            state.filter(~F.col("id").isin(picked) if picked else F.lit(True))
            .withColumn("score", F.lit(lam) * F.col("rel") - F.lit(mu) * F.col("smax"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(1)
            .first()
        )
        if nxt is None:
            break  # corpus exhausted before k
        picks.append((r, nxt["id"], nxt["score"]))
        picked.append(nxt["id"])
        if r < k - 1:
            new_state = _pin(
                state.select(
                    "id", "qn", "rel",
                    F.greatest(
                        "smax", _idot_lit("qn", list(nxt["qn"]), dim)
                    ).alias("smax"),
                )
            )
            _rel(state)
            state = new_state
    _rel(state)
    return spark.createDataFrame(picks, "sel_order long, vec_id long, mmr_score long")


def mmr_select_sql(
    dim: int,
    k: int = 8,
    lambda_pct: int = 70,
    query_id: int | None = None,
    table: str = "embeddings",
) -> str:
    """Unrolled DuckDB twin of ``mmr_select`` — identical quantized
    vectors, integer scores and tie-breaks per round."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0 <= lambda_pct <= 100:
        raise ValueError(f"lambda_pct must be in [0, 100], got {lambda_pct}")
    lam, mu = lambda_pct, 100 - lambda_pct
    sq = " + ".join(
        f"CAST(list_extract(embedding, {i}) AS DOUBLE) * "
        f"CAST(list_extract(embedding, {i}) AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    qexpr = (
        f"(SELECT MIN(vec_id) FROM {table} WHERE (0.0 + {sq}) > 0)"
        if query_id is None else str(query_id)
    )
    dot = _idot_sql("s.qn", "c.qn", dim, "list_extract")
    ctes = [
        (
            f"q AS (SELECT vec_id AS id, "
            f"{_qnorm_expr('embedding', dim, 'list_extract')} AS qn "
            f"FROM {table} WHERE (0.0 + {sq}) > 0)"
        ),
        f"qv AS MATERIALIZED (SELECT id, qn FROM q WHERE id = {qexpr})",
        (
            f"s0 AS MATERIALIZED (SELECT s.id, s.qn, {dot} AS rel, "
            f"CAST(0 AS BIGINT) AS smax "
            f"FROM q s, qv c WHERE s.id <> c.id)"
        ),
    ]
    picks = []
    for r in range(k):
        prev_picks = (
            " AND id NOT IN (" + ", ".join(f"(SELECT id FROM p{j})" for j in range(r)) + ")"
            if r else ""
        )
        ctes.append(
            f"p{r} AS MATERIALIZED (SELECT id, qn, "
            f"{lam} * rel - {mu} * smax AS score FROM s{r}"
            f" WHERE TRUE{prev_picks}"
            f" ORDER BY score DESC, id ASC LIMIT 1)"
        )
        picks.append(
            f"SELECT CAST({r} AS BIGINT) AS sel_order, id AS vec_id, "
            f"CAST(score AS BIGINT) AS mmr_score FROM p{r}"
        )
        if r < k - 1:
            ctes.append(
                f"s{r + 1} AS MATERIALIZED (SELECT s.id, s.qn, s.rel, "
                f"GREATEST(s.smax, {dot}) AS smax FROM s{r} s, p{r} c)"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(picks)


# ----------------------------------------------------------- k-means||

def kmeans_parallel_init(
    emb: DataFrame,
    k: int = 8,
    l: int | None = None,
    rounds: int = 3,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic k-means‖ center initialization (Bahmani et al.
    VLDB 2012, "Scalable k-means++" — public result): instead of k
    sequential k-means++ passes, each of ``rounds`` rounds samples
    ~``l`` points in PARALLEL with probability min(1, l·d²(x)/φ)
    (φ = Σd² the current cost), then the oversampled candidate set is
    reduced to k centers by a weighted greedy pass. The 100TB init
    path for ``kmeans_clusters``: O(rounds) scans instead of O(k).

    Engine determinism (the kcenter integer discipline + hash coins):
    vectors quantize once to int64 micro-units, every d² and φ is
    exact integer arithmetic (φ summed in DECIMAL(38,0)); the sampling
    coin is ``stable_hash64(id|round)/2^60 < l·d²/φ`` evaluated in
    doubles built from exact integers — the identical expression both
    engines, so selection is bit-reproducible. Candidate weights =
    |points whose argmin candidate is c| (ties → smaller candidate
    id). The final reduction is the deterministic weighted
    farthest-first analog of kmeans++: start at the max-weight
    candidate, then repeatedly take argmax of w_c·d²(c, chosen)
    (ties → id) — driver-side over the ≤ 1+l·rounds candidates (the
    IVF-centroid size-gated-collect pattern).

    Returns (rank, vec_id, weight) of the k chosen centers — feed the
    vectors back as fixed centroids / seeds. φ = 0 (every point
    coincides with a center) stops sampling early; raises when fewer
    than k distinct candidates were drawn (raise ``l``/``rounds``).
    Replayed exactly by ``kmeans_parallel_init_sql``.
    """
    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1, got {k}, {rounds}")
    l = 2 * k if l is None else l
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")
    from linkgraph.checkpoint import pin_table, release_state
    from linkgraph.pipeline.hashing import stable_hash64

    dim = _dim(emb, vec_col)
    q = pin_table(_kcenter_quantized(emb, id_col, vec_col))
    seed_row = q.orderBy(F.asc("id")).first()
    if seed_row is None:
        raise ValueError("kmeans_parallel_init: empty corpus")
    centers: dict[int, list[int]] = {int(seed_row["id"]): list(seed_row["qv"])}

    def _d2_lit(cvec: list[int]):
        terms = " + ".join(
            f"(element_at(qv, {i}) - {cvec[i - 1]}L) * "
            f"(element_at(qv, {i}) - {cvec[i - 1]}L)"
            for i in range(1, dim + 1)
        )
        return F.expr(f"(0L + {terms})")

    state = pin_table(
        q.select("id", "qv", _d2_lit(list(seed_row["qv"])).alias("dmin"))
    )
    for r in range(1, rounds + 1):
        phi = int(
            state.agg(
                F.sum(F.col("dmin").cast("decimal(38,0)")).alias("s")
            ).first()["s"] or 0
        )
        if phi == 0:
            break
        phi_d = float(phi)
        h = stable_hash64(F.col("id").cast("string"), salt=f"kmpar-{seed}-{r}")
        picked = (
            state.filter(
                (h.cast("double") / F.lit(float(1 << 60)))
                < (F.lit(float(l)) * F.col("dmin").cast("double")
                   / F.lit(phi_d))
            )
            .select("id", "qv")
            .collect()
        )
        new = [(int(p["id"]), list(p["qv"])) for p in picked
               if int(p["id"]) not in centers]
        if not new:
            continue
        for cid, qv in new:
            centers[cid] = qv
        nc = state.sparkSession.createDataFrame(
            [(cid, qv) for cid, qv in new], "cid long, qc array<bigint>"
        )
        d2c = " + ".join(
            f"(element_at(qv, {i}) - element_at(qc, {i})) * "
            f"(element_at(qv, {i}) - element_at(qc, {i}))"
            for i in range(1, dim + 1)
        )
        upd = (
            state.crossJoin(F.broadcast(nc))
            .select("id", "qv", "dmin", F.expr(f"(0L + {d2c})").alias("d2"))
            .groupBy("id", "qv", "dmin")
            .agg(F.min("d2").alias("d2n"))
            .select("id", "qv", F.least("dmin", "d2n").alias("dmin"))
        )
        new_state = pin_table(upd)
        release_state(state)
        state = new_state
    # candidate weights: argmin candidate per point (d2 ASC, cid ASC)
    cand = state.sparkSession.createDataFrame(
        [(cid, qv) for cid, qv in sorted(centers.items())],
        "cid long, qc array<bigint>",
    )
    d2c = " + ".join(
        f"(element_at(qv, {i}) - element_at(qc, {i})) * "
        f"(element_at(qv, {i}) - element_at(qc, {i}))"
        for i in range(1, dim + 1)
    )
    w = Window.partitionBy("id").orderBy(F.asc("d2"), F.asc("cid"))
    weights = {
        int(r_["cid"]): int(r_["w"])
        for r_ in (
            q.crossJoin(F.broadcast(cand))
            .select("id", F.col("cid"), F.expr(f"(0L + {d2c})").alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .groupBy("cid").agg(F.count("*").alias("w"))
            .collect()
        )
    }
    release_state(state)
    release_state(q)
    if len(centers) < k:
        raise ValueError(
            f"kmeans_parallel_init drew only {len(centers)} candidates for "
            f"k={k} — raise l ({l}) or rounds ({rounds})."
        )
    # deterministic weighted farthest-first reduction to k
    def _pd2(a: list[int], b: list[int]) -> int:
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    first = max(weights.items(), key=lambda t: (t[1], -t[0]))[0] \
        if weights else min(centers)
    chosen = [first]
    dmin = {cid: _pd2(qv, centers[first]) for cid, qv in centers.items()}
    while len(chosen) < k:
        nxt = max(
            ((cid, weights.get(cid, 0) * dmin[cid]) for cid in centers
             if cid not in chosen),
            key=lambda t: (t[1], -t[0]),
        )[0]
        chosen.append(nxt)
        for cid, qv in centers.items():
            d = _pd2(qv, centers[nxt])
            if d < dmin[cid]:
                dmin[cid] = d
    return emb.sparkSession.createDataFrame(
        [(i, cid, weights.get(cid, 0)) for i, cid in enumerate(chosen)],
        "rank long, vec_id long, weight long",
    )


def kmeans_parallel_init_sql(
    dim: int,
    k: int = 8,
    l: int | None = None,
    rounds: int = 3,
    seed: int = 0,
    table: str = "embeddings",
) -> str:
    """Unrolled DuckDB twin of ``kmeans_parallel_init`` — identical
    integer distances, DECIMAL cost, double coin comparisons, weights
    and greedy reduction."""
    from linkgraph.pipeline.hashing import stable_hash64_sql

    if k < 1 or rounds < 1:
        raise ValueError(f"k and rounds must be >= 1, got {k}, {rounds}")
    l = 2 * k if l is None else l
    if l < 1:
        raise ValueError(f"l must be >= 1, got {l}")

    def d2(a: str, b: str) -> str:
        terms = " + ".join(
            f"(list_extract({a}, {i}) - list_extract({b}, {i})) * "
            f"(list_extract({a}, {i}) - list_extract({b}, {i}))"
            for i in range(1, dim + 1)
        )
        return f"(0 + {terms})"

    ctes = [
        (
            "q AS (SELECT vec_id AS id, "
            "list_transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS qv "
            f"FROM {table})"
        ),
        "c0 AS MATERIALIZED (SELECT id, qv FROM q ORDER BY id LIMIT 1)",
        f"s0 AS MATERIALIZED (SELECT s.id, s.qv, {d2('s.qv', 'c.qv')} AS dmin FROM q s, c0 c)",
        "cset0 AS MATERIALIZED (SELECT id AS cid, qv AS qc FROM c0)",
    ]
    two60 = float(1 << 60)
    for r in range(1, rounds + 1):
        p = r - 1
        h = stable_hash64_sql("CAST(id AS VARCHAR)", salt=f"kmpar-{seed}-{r}")
        ctes.append(
            f"phi{r} AS MATERIALIZED (SELECT "
            f"SUM(CAST(dmin AS DECIMAL(38,0))) AS phi FROM s{p})"
        )
        ctes.append(
            f"""pick{r} AS MATERIALIZED (SELECT id, qv FROM s{p}, phi{r}
  WHERE COALESCE(phi, 0) > 0
    AND CAST({h} AS DOUBLE) / {two60!r}
        < {float(l)!r} * CAST(dmin AS DOUBLE) / CAST(phi AS DOUBLE)
    AND id NOT IN (SELECT cid FROM cset{p}))"""
        )
        ctes.append(
            f"cset{r} AS MATERIALIZED (SELECT * FROM cset{p} "
            f"UNION ALL SELECT id, qv FROM pick{r})"
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (SELECT s.id, s.qv,
  LEAST(s.dmin, COALESCE(mn.d2, s.dmin)) AS dmin
  FROM s{p} s LEFT JOIN (
    SELECT s2.id, MIN({d2('s2.qv', 'p2.qv')}) AS d2
    FROM s{p} s2, pick{r} p2 GROUP BY s2.id) mn ON mn.id = s.id)"""
        )
        last = r
    ctes.append(
        f"""wts AS MATERIALIZED (SELECT c.cid, c.qc, COALESCE(w.w, 0) AS w
  FROM cset{last} c LEFT JOIN (
    SELECT cid, COUNT(*) AS w FROM (
      SELECT a.id, a.cid, ROW_NUMBER() OVER (PARTITION BY a.id
        ORDER BY a.d2 ASC, a.cid ASC) AS rn
      FROM (SELECT s.id, t.cid, {d2('s.qv', 't.qc')} AS d2
            FROM q s, cset{last} t) a)
    WHERE rn = 1 GROUP BY cid) w ON w.cid = c.cid)"""
    )
    ctes.append(
        "g0 AS MATERIALIZED (SELECT cid FROM wts ORDER BY w DESC, cid ASC LIMIT 1)"
    )
    ctes.append(
        f"""d0 AS MATERIALIZED (SELECT t.cid, t.qc, t.w, {d2('t.qc', 'g.qc')} AS dmin
  FROM wts t, (SELECT qc FROM wts WHERE cid = (SELECT cid FROM g0)) g)"""
    )
    sel = ["SELECT CAST(0 AS BIGINT) AS rank, cid AS vec_id, "
           "CAST(w AS BIGINT) AS weight FROM d0 WHERE cid = (SELECT cid FROM g0)"]
    for j in range(1, k):
        prev = " AND ".join(
            f"cid <> (SELECT cid FROM g{i})" for i in range(j)
        )
        ctes.append(
            f"""g{j} AS MATERIALIZED (SELECT cid FROM d{j - 1}
  WHERE {prev} ORDER BY w * dmin DESC, cid ASC LIMIT 1)"""
        )
        ctes.append(
            f"""d{j} AS MATERIALIZED (SELECT t.cid, t.qc, t.w,
  LEAST(t.dmin, {d2('t.qc', 'g.qc')}) AS dmin
  FROM d{j - 1} t, (SELECT qc FROM d{j - 1}
                    WHERE cid = (SELECT cid FROM g{j})) g)"""
        )
        sel.append(
            f"SELECT CAST({j} AS BIGINT), cid, CAST(w AS BIGINT) FROM d{j} "
            f"WHERE cid = (SELECT cid FROM g{j})"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sel)
