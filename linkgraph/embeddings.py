"""FastRP graph embeddings — deterministic, integer-exact variant.

Lineage: Chen et al., "Fast and Accurate Network Embeddings via Very
Sparse Random Projection" (CIKM 2019) — the algorithm the graph-
algorithms reference family later ships as ``gds.fastRP``. An
embedding is a weighted sum of powers of the adjacency matrix applied
to a very sparse random node-signature matrix:

    emb = sum_t  w_t * A^t R,   R[i, j] in {-1, 0, +1}

This module implements the DETERMINISTIC INTEGER variant:

  * R is derived from the cross-engine md5 hash
    (`pipeline/hashing.stable_hash64`): component j of node i is
    +1 / -1 / 0 with probability 1/6 / 1/6 / 2/3 (the paper's s = 3
    sparse projection, unscaled — the sqrt(3) scale is a constant
    factor that L2 normalization removes anyway).
  * Iterations multiply by the UNNORMALIZED adjacency A and combine
    with INTEGER weights, so every intermediate value is a BIGINT and
    the embedding is bit-reproducible on any engine — the same trick
    that makes `linkgraph/anf.py`'s sketches value-exact. (The paper
    normalizes by degree each step for spectral stability; with 2-3
    iterations the unnormalized power sum preserves the same weighted
    path-count geometry, and the final per-node L2 normalization
    removes the global magnitude. Documented deviation.)
  * The final L2 norm folds x*x over the embedding ARRAY left-to-right
    in Spark and as an integer SUM in SQL — both exact, so the
    normalized components are identical doubles in both engines.

Spark-first shape (100 TB):

  * One ``groupBy(dst)`` shuffle per iteration with ``dim``
    map-side-combinable SUM aggregates over array slots — the hub-safe
    layout from `linkgraph/anf.py` (a power-law hub never concentrates
    rows in one task beyond what partial aggregation already
    collapsed).
  * The per-iteration accumulator rides the node frame: two co-keyed
    joins on ``id`` per superstep (agg result + carried acc), both
    sort-merge co-partitioned on the same key at scale.
  * ``fastrp_knn`` broadcasts the (small) query side and computes
    integer dot products with a single pass over the corpus — no
    crossJoin, no shuffle beyond the final per-query top-k
    (TakeOrdered-style window over |queries| * k candidates).

No reference file:line cites — `/root/reference/` is provisioned empty
(SURVEY.md §0); FastRP is an engine extension beyond the inventoried
§2 procedures, composing with `pipeline/simsearch.py` consumers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

__all__ = [
    "fastrp_embeddings", "fastrp_knn", "fastrp_sql", "fastrp_knn_sql",
    "propagate_features", "propagate_features_sql",
]

_DIRECTIONS = ("OUTGOING", "INCOMING", "BOTH")


def _message_pairs(edges: DataFrame, direction: str) -> DataFrame:
    """Distinct (u, v) message pairs: v gathers from u. Self-loops are
    dropped (simple-graph contract, as in `linkgraph/similarity.py`)."""
    e = edges.select("src", "dst")
    if direction == "OUTGOING":
        p = e.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    elif direction == "INCOMING":
        p = e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    elif direction == "BOTH":
        p = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
            e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
    else:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    return p.filter(F.col("u") != F.col("v")).distinct()


def _check_params(dim: int, iterations: int, weights: list[int] | None) -> list[int]:
    if dim < 1:
        raise ValueError(f"dim must be >= 1, got {dim}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    w = list(weights) if weights is not None else [1] * iterations
    if len(w) != iterations:
        raise ValueError(f"need {iterations} weights, got {len(w)}")
    if not all(isinstance(x, int) for x in w):
        raise ValueError("weights must be ints (integer-exact contract); "
                         f"got {w!r}")
    return w


def _init_state(edges: DataFrame, direction: str, dim: int, seed: int):
    """(pairs, state) where state = (id, vec array<long>, acc array<long>)."""
    pairs = _message_pairs(edges, direction)
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    comps = []
    for j in range(dim):
        h = stable_hash64(F.col("id").cast("string"), salt=f"fastrp-{seed}-{j}")
        comps.append(
            F.when(h % 6 == 0, F.lit(1))
            .when(h % 6 == 1, F.lit(-1))
            .otherwise(F.lit(0))
            .cast("long")
        )
    zero = F.array(*[F.lit(0).cast("long") for _ in range(dim)])
    return pairs, nodes.select("id", F.array(*comps).alias("vec"), zero.alias("acc"))


def _fastrp_state(
    edges: DataFrame,
    dim: int,
    iterations: int,
    weights: list[int] | None,
    direction: str,
    seed: int,
) -> DataFrame:
    """(id, acc array<long>) — the exact integer embedding."""
    w = _check_params(dim, iterations, weights)
    pairs, state = _init_state(edges, direction, dim, seed)
    for wt in w:
        msgs = pairs.join(
            state.select(F.col("id").alias("u"), "vec"), "u"
        ).select(F.col("v").alias("id"), "vec")
        agg = msgs.groupBy("id").agg(
            *[F.sum(F.element_at("vec", j + 1)).alias(f"s{j}") for j in range(dim)]
        )
        joined = state.select("id", "acc").join(agg, "id", "left")
        newvec = F.array(
            *[F.coalesce(F.col(f"s{j}"), F.lit(0)).cast("long") for j in range(dim)]
        )
        state = joined.select("id", newvec.alias("vec"), "acc").select(
            "id",
            "vec",
            F.zip_with("acc", "vec", lambda a, x: a + F.lit(wt) * x).alias("acc"),
        )
    return state.select("id", "acc")


def fastrp_embeddings(
    edges: DataFrame,
    dim: int = 8,
    iterations: int = 2,
    weights: list[int] | None = None,
    direction: str = "BOTH",
    seed: int = 42,
) -> DataFrame:
    """Relational long-form embeddings: (id, d, v, nv).

    ``v`` is the exact BIGINT component of ``sum_t w_t * (A^t R)[id]``;
    ``nv`` is the L2-normalized double, rounded to 6 decimals (0.0 for
    all-zero vectors). Long form keeps the oracle comparable row-wise
    (arrays don't sort in the driver's pandas compare — same choice as
    `pipeline/simsearch.py#quantize_embeddings`).
    """
    state = _fastrp_state(edges, dim, iterations, weights, direction, seed)
    # fold in DECIMAL(38,0), casting each element BEFORE the multiply:
    # a long*long square wraps silently past 2^63 (components reach
    # ~1e12 on mega-hub graphs at the advertised scale) while the
    # decimal product stays exact — the twin's HUGEINT domain
    sumsq = F.aggregate(
        "acc",
        F.lit(0).cast("decimal(38,0)"),
        lambda a, x: a + x.cast("decimal(19,0)") * x,
    ).cast("double")
    wide = state.select("id", "acc", F.sqrt(sumsq).alias("nrm"))
    return wide.select(
        "id",
        F.posexplode("acc").alias("d", "v"),
        "nrm",
    ).select(
        "id",
        F.col("d").cast("int").alias("d"),
        "v",
        F.round(
            F.when(F.col("nrm") == 0, F.lit(0.0)).otherwise(F.col("v") / F.col("nrm")),
            6,
        ).alias("nv"),
    )


def fastrp_knn(
    edges: DataFrame,
    query_mod: int,
    k: int = 5,
    dim: int = 8,
    iterations: int = 2,
    weights: list[int] | None = None,
    direction: str = "BOTH",
    seed: int = 42,
) -> DataFrame:
    """Top-k cosine neighbors per query node over the FastRP space:
    (query_id, neighbor_id, cosine, rk).

    Queries are the nodes with ``id % query_mod == 0`` (a deterministic
    small set — the stand-in for a user-supplied query list, which the
    planner BROADCASTs against the corpus). The dot product folds the
    two integer arrays left-to-right (exact); cosine is ranked on the
    ROUNDED score with an id tie-break (the `pipeline/text.py#tfidf_topk`
    rank-what-you-emit contract). Zero-vector nodes are excluded from
    both sides (cosine undefined).
    """
    if query_mod < 1:
        raise ValueError(f"query_mod must be >= 1, got {query_mod}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    state = _fastrp_state(edges, dim, iterations, weights, direction, seed)
    sumsq = F.aggregate(
        "acc",
        F.lit(0).cast("decimal(38,0)"),
        lambda a, x: a + x.cast("decimal(19,0)") * x,
    )
    emb = state.select("id", "acc", F.sqrt(sumsq.cast("double")).alias("nrm")).filter(
        F.col("nrm") > 0
    )
    q = emb.select(
        F.col("id").alias("query_id"),
        F.col("acc").alias("qacc"),
        F.col("nrm").alias("qnrm"),
    ).filter(F.col("query_id") % query_mod == 0)
    c = emb.select(
        F.col("id").alias("neighbor_id"),
        F.col("acc").alias("cacc"),
        F.col("nrm").alias("cnrm"),
    )
    dot = F.aggregate(
        F.zip_with("qacc", "cacc", lambda a, b: a.cast("decimal(19,0)") * b),
        F.lit(0).cast("decimal(38,0)"),
        lambda a, x: a + x,
    ).cast("double")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot / (F.col("qnrm") * F.col("cnrm")), 6).alias("cosine"),
        )
    )
    win = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rk").cast("int").alias("rk"))
    )


# --------------------------------------------------------------------------
# DuckDB SQL twins
# --------------------------------------------------------------------------


def _pairs_sql(direction: str) -> str:
    if direction == "OUTGOING":
        inner = "SELECT src AS u, dst AS v FROM e"
    elif direction == "INCOMING":
        inner = "SELECT dst AS u, src AS v FROM e"
    elif direction == "BOTH":
        inner = ("SELECT src AS u, dst AS v FROM e "
                 "UNION ALL SELECT dst AS u, src AS v FROM e")
    else:
        raise ValueError(f"direction must be one of {_DIRECTIONS}, got {direction!r}")
    return f"SELECT DISTINCT u, v FROM ({inner}) WHERE u <> v"


def _fastrp_ctes(
    edge_sql: str, dim: int, iterations: int, weights: list[int] | None,
    direction: str, seed: int,
) -> str:
    """Shared WITH-body: CTEs e, pairs, nodes, dims, x0..xL, emb."""
    w = _check_params(dim, iterations, weights)
    h = stable_hash64_sql(
        "CAST(id AS VARCHAR) || '#fastrp-" + f"{seed}-' || CAST(d AS VARCHAR)"
    )
    # stable_hash64_sql appends nothing here: the salt suffix is baked
    # into the expression so it varies with the dim column d, exactly
    # matching the per-j literal salt on the Spark side.
    layers = []
    prev = "x0"
    for t in range(1, iterations + 1):
        layers.append(f"""
x{t} AS (SELECT nd.id, nd.d, CAST(COALESCE(m.s, 0) AS BIGINT) AS v
         FROM (SELECT id, d FROM nodes CROSS JOIN dims) nd
         LEFT JOIN (SELECT p.v AS id, x.d, SUM(x.v) AS s
                    FROM pairs p JOIN {prev} x ON x.id = p.u
                    GROUP BY p.v, x.d) m
         ON m.id = nd.id AND m.d = nd.d)""")
        prev = f"x{t}"
    combo = " + ".join(f"{w[t - 1]} * x{t}.v" for t in range(1, iterations + 1))
    joins = " ".join(
        f"JOIN x{t} ON x{t}.id = x1.id AND x{t}.d = x1.d"
        for t in range(2, iterations + 1)
    )
    return f"""e AS ({edge_sql}),
pairs AS ({_pairs_sql(direction)}),
nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
dims AS (SELECT CAST(unnest(range(0, {dim})) AS INT) AS d),
x0 AS (SELECT id, d,
              CAST(CASE ({h}) % 6 WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS BIGINT) AS v
       FROM nodes CROSS JOIN dims),
{",".join(layers)},
emb AS (SELECT x1.id, x1.d, CAST({combo} AS BIGINT) AS v FROM x1 {joins})"""


def fastrp_sql(
    edge_sql: str, dim: int = 8, iterations: int = 2,
    weights: list[int] | None = None, direction: str = "BOTH", seed: int = 42,
) -> str:
    """DuckDB twin of `fastrp_embeddings` — value-exact (integer path
    counts; the only float op is the final norm division, computed from
    identical exact integers on both engines)."""
    ctes = _fastrp_ctes(edge_sql, dim, iterations, weights, direction, seed)
    return f"""
WITH {ctes},
nrm AS (SELECT id, sqrt(CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE)) AS nrm FROM emb GROUP BY id)
SELECT emb.id, emb.d, emb.v,
       ROUND(CASE WHEN nrm.nrm = 0 THEN 0.0 ELSE emb.v / nrm.nrm END, 6) AS nv
FROM emb JOIN nrm ON nrm.id = emb.id
"""


def fastrp_knn_sql(
    edge_sql: str, query_mod: int, k: int = 5, dim: int = 8,
    iterations: int = 2, weights: list[int] | None = None,
    direction: str = "BOTH", seed: int = 42,
) -> str:
    """DuckDB twin of `fastrp_knn`."""
    ctes = _fastrp_ctes(edge_sql, dim, iterations, weights, direction, seed)
    return f"""
WITH {ctes},
nrm AS (SELECT id, sqrt(CAST(SUM(CAST(v AS HUGEINT) * v) AS DOUBLE)) AS nrm FROM emb GROUP BY id
        HAVING SUM(CAST(v AS HUGEINT) * v) > 0),
dot AS (SELECT q.id AS query_id, c.id AS neighbor_id,
               CAST(SUM(eq.v * ec.v) AS DOUBLE) AS dp
        FROM nrm q JOIN nrm c ON c.id <> q.id
        JOIN emb eq ON eq.id = q.id
        JOIN emb ec ON ec.id = c.id AND ec.d = eq.d
        WHERE q.id % {query_mod} = 0
        GROUP BY q.id, c.id),
scored AS (SELECT dot.query_id, dot.neighbor_id,
                  ROUND(dot.dp / (q.nrm * c.nrm), 6) AS cosine
           FROM dot JOIN nrm q ON q.id = dot.query_id
                    JOIN nrm c ON c.id = dot.neighbor_id)
SELECT query_id, neighbor_id, cosine,
       CAST(rk AS INT) AS rk
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id ASC) AS rk
      FROM scored)
WHERE rk <= {k}
"""


# --------------------------------------------- k-hop feature propagation

def propagate_features(
    edges: DataFrame,
    features: DataFrame,
    dim: int,
    rounds: int = 2,
    direction: str = "BOTH",
    id_col: str = "id",
    vec_col: str = "features",
    exploded: bool = False,
) -> DataFrame:
    """K-hop neighborhood feature smoothing — the graph-native feature
    engineering step GNN pipelines run before training (SGC, Wu et al.
    ICML 2019: collapse k propagation layers into one precomputed
    smoothing pass; also the "feature propagation" imputation shape of
    Rossi et al. 2022).

    Each round replaces every featured node's vector with the mean of
    its CLOSED neighborhood (itself + feature-bearing neighbors):

        h_{r+1}(i) = round6( (h_r(i) + sum_{j in N(i)} h_r(j))
                             / (1 + |N_feat(i)|) )

    Nodes without an input feature row don't contribute and aren't
    imputed (documented contract — they stay absent); isolated nodes
    keep their vector. Returns (id, features: array<double>) with
    6-decimal components.

    Cross-engine exactness of an ITERATIVE float pass (the FastRP /
    kmeans move): components are quantized ONCE to 6-decimal fixed
    point (ROUND(x*1e6) as int64 — half-away-from-zero on both
    engines), every neighborhood sum is an int64 aggregate
    (order-free, exact), and the mean re-rounds the exact-double
    rational back into the integer domain, so round-r state is
    bit-identical on Spark and DuckDB and the unrolled SQL twin
    (``propagate_features_sql``) is value-exact.

    Spark-first shape (100 TB): per round ONE ``groupBy(node)``
    shuffle carrying ``dim`` map-side-combinable int64 SUMs plus a
    count (the hub-safe FastRP layout — a power-law hub's neighborhood
    collapses in partial aggregation before it can concentrate in one
    task), then a co-keyed left join back onto the carried state. Sums
    stay exact while deg * 1e6 * max|x| < 2^63 (~9e12 neighbor-units);
    beyond that cast the sums to decimal(38,0).
    """
    d = direction.upper()
    if d not in _DIRECTIONS:
        raise ValueError(f"bad direction {direction}")
    if rounds < 0 or dim < 1:
        raise ValueError(f"rounds must be >= 0 and dim >= 1, got {rounds}, {dim}")
    first = features.select(F.size(vec_col).alias("d")).first()
    if first is not None and first["d"] != dim:
        raise ValueError(
            f"features column {vec_col!r} has dim {first['d']}, expected {dim}"
            " — a mismatched dim would silently propagate nulls"
        )
    vcols = [f"v{k}" for k in range(dim)]
    state = features.select(
        F.col(id_col).alias("id"),
        *[
            F.round(F.element_at(F.col(vec_col), k + 1) * 1_000_000, 0)
            .cast("long")
            .alias(vcols[k])
            for k in range(dim)
        ],
    )
    if d == "OUTGOING":
        pairs = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
    elif d == "INCOMING":
        pairs = edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
    else:
        pairs = edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr")).union(
            edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr"))
        )
    for _ in range(rounds):
        nbr = pairs.join(
            state.select(F.col("id").alias("nbr"), *vcols), "nbr"
        )
        agg = nbr.groupBy(F.col("node").alias("id")).agg(
            *[F.sum(c).alias(f"s_{c}") for c in vcols],
            F.count("*").alias("cnt"),
        )
        state = state.join(agg, "id", "left").select(
            "id",
            *[
                F.round(
                    (F.col(c) + F.coalesce(F.col(f"s_{c}"), F.lit(0)))
                    / (F.lit(1) + F.coalesce(F.col("cnt"), F.lit(0))),
                    0,
                )
                .cast("long")
                .alias(c)
                for c in vcols
            ],
        )
    if exploded:
        # long format (id, d, value) — the FastRP oracle convention
        # (sortable by the driver's value-hash compare)
        return state.select(
            "id",
            F.posexplode(
                F.array(*[(F.col(c) / 1_000_000).cast("double") for c in vcols])
            ).alias("d", "value"),
        )
    return state.select(
        "id",
        F.array(*[(F.col(c) / 1_000_000).cast("double") for c in vcols]).alias(
            "features"
        ),
    )


def propagate_features_sql(
    edge_sql: str,
    features_sql: str,
    dim: int,
    rounds: int = 2,
    direction: str = "BOTH",
    exploded: bool = False,
) -> str:
    """Unrolled-round DuckDB twin of ``propagate_features`` —
    value-exact (see the operator docstring's integer-domain
    argument). ``features_sql`` must yield (id, f0..f{dim-1})."""
    d = direction.upper()
    vcols = [f"v{k}" for k in range(dim)]
    quant = ", ".join(
        f"CAST(ROUND(f{k} * 1000000, 0) AS BIGINT) AS v{k}" for k in range(dim)
    )
    if d == "OUTGOING":
        und = f"SELECT src AS node, dst AS nbr FROM ({edge_sql})"
    elif d == "INCOMING":
        und = f"SELECT dst AS node, src AS nbr FROM ({edge_sql})"
    else:
        und = (
            f"SELECT src AS node, dst AS nbr FROM ({edge_sql}) "
            f"UNION ALL SELECT dst, src FROM ({edge_sql})"
        )
    ctes = [f"feat0 AS (SELECT id, {quant} FROM ({features_sql}))", f"und AS ({und})"]
    for r in range(rounds):
        sums = ", ".join(f"SUM(f.{c}) AS s_{c}" for c in vcols)
        news = ", ".join(
            f"CAST(ROUND((s.{c} + COALESCE(a.s_{c}, 0)) / (1 + COALESCE(a.cnt, 0)), 0) AS BIGINT) AS {c}"
            for c in vcols
        )
        ctes.append(
            f"agg{r + 1} AS (SELECT u.node AS id, {sums}, COUNT(*) AS cnt "
            f"FROM und u JOIN feat{r} f ON f.id = u.nbr GROUP BY u.node)"
        )
        ctes.append(
            f"feat{r + 1} AS (SELECT s.id, {news} "
            f"FROM feat{r} s LEFT JOIN agg{r + 1} a ON a.id = s.id)"
        )
    if exploded:
        body = " UNION ALL ".join(
            f"SELECT id, {k} AS d, v{k} / 1000000.0 AS value FROM feat{rounds}"
            for k in range(dim)
        )
        return "WITH " + ",\n".join(ctes) + "\n" + body
    arr = ", ".join(f"{c} / 1000000.0" for c in vcols)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, [{arr}] AS features FROM feat{rounds}"
    )


def sgns_embeddings(
    edges: DataFrame,
    dim: int = 8,
    walk_length: int = 4,
    walks_per_node: int = 4,
    window: int = 2,
    negatives: int = 2,
    epochs: int = 3,
    lr: float = 0.1,
    seed: int = 0,
    direction: str = "BOTH",
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    resume: bool = False,
) -> DataFrame:
    """Skip-gram-with-negative-sampling node embeddings (word2vec /
    DeepWalk-SGNS, Mikolov et al. 2013, Perozzi et al. KDD'14 — public
    results) trained END-TO-END in the engine, deterministically:

    * the corpus is `linkgraph.walks.random_walks`' hash-argmin walks;
      (center, context) pairs come from the +-``window`` co-occurrence
      self-join, aggregated with multiplicities;
    * negatives are hash-drawn per positive pair
      (H(center|ctx|j) % n over the sorted node index) — the unigram
      sampler's deterministic stand-in;
    * training is FULL-BATCH synchronous gradient descent (epochs
      driver rounds): per triple sigma = ROUND(sigmoid(u·v), 7) (the
      rounded-ln discipline applied to exp), coefficient
      ROUND(lr·(label−sigma)·1e9) as BIGINT x multiplicity, and every
      per-component gradient is one half-up integer division summed in
      an order-free int64 aggregate — so the iterative float
      nonlinearity is still value-exact cross-engine, and the DuckDB
      twin (`sgns_embeddings_sql`) reproduces the trained vectors
      hash-exact. Hogwild-style asynchronous SGD trains faster but is
      run-to-run irreproducible — full-batch is the deliberate trade.

    Input vectors init hash-uniform in ±0.5/dim; output (context)
    vectors init 0 (the word2vec convention — epoch-1 gradients are
    then exactly the positive pulls). Returns LONG format
    (id, d, value), value = input-vector component rounded 6.

    Scale notes (100TB): per epoch TWO groupBy aggregates of dim
    map-side-combinable int64 sums (center grads, context grads — the
    propagate_features layout) + two co-keyed joins to update the
    pinned vector tables; the triple table is positives x (1 +
    negatives) rows built once. Int64 gradient terms hold while
    lr·cnt·max|v6| < ~9e9 units (raise to DECIMAL beyond). The node
    index is one global rank window (the zipWithIndex disclosure)."""
    from linkgraph.walks import random_walks
    from linkgraph.pipeline.hashing import stable_hash64
    from linkgraph.checkpoint import SuperstepLoop, pin_table, release_state

    if dim < 1 or window < 1 or negatives < 0 or epochs < 0:
        raise ValueError(
            f"bad hyperparameters dim={dim} window={window} "
            f"negatives={negatives} epochs={epochs}"
        )
    spark = edges.sparkSession
    walks = random_walks(
        edges, walk_length, walks_per_node=walks_per_node, seed=seed,
        direction=direction,
    )
    wa = walks.select("start", "walk_no", F.col("step").alias("sa"),
                      F.col("node").alias("center"))
    wb = walks.select("start", "walk_no", F.col("step").alias("sb"),
                      F.col("node").alias("ctx"))
    pos = (
        wa.join(wb, ["start", "walk_no"])
        .filter(
            (F.abs(F.col("sa") - F.col("sb")) >= 1)
            & (F.abs(F.col("sa") - F.col("sb")) <= window)
            & (F.col("center") != F.col("ctx"))
        )
        .groupBy("center", "ctx")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    from linkgraph.checkpoint import release_caches
    from linkgraph.ids import distributed_rank

    # exact ROW_NUMBER-by-id indexing without a single-task sort
    # (range-partitioned rank + broadcast offsets, ids.py) — value-
    # equal to the SQL twin's global window
    _idx_full = distributed_rank(nodes, [("id", "asc")], name="_rn")
    indexed = pin_table(
        _idx_full.select("id", (F.col("_rn") - 1).cast("long").alias("idx"))
    )
    release_caches(_idx_full)  # pinned copy taken
    n = indexed.count()
    negs = None
    for j in range(1, negatives + 1):
        hj = stable_hash64(
            F.concat_ws("|", F.col("center"), F.col("ctx"), F.lit(j)),
            salt=f"sgns-neg-{seed}",
        )
        nj = (
            pos.select("center", "ctx", "cnt", F.pmod(hj, F.lit(n)).alias("idx"))
            .join(indexed, "idx")
            .select("center", F.col("id").alias("other"), "cnt",
                    F.lit(0).alias("label"))
        )
        negs = nj if negs is None else negs.unionByName(nj)
    triples = pos.select(
        "center", F.col("ctx").alias("other"), "cnt", F.lit(1).alias("label")
    )
    if negs is not None:
        triples = triples.unionByName(negs)
    triples = pin_table(triples)

    vcols = [f"v{k}" for k in range(dim)]
    b6 = 500_000 // dim
    cen = pin_table(
        nodes.select(
            "id",
            *[
                (F.pmod(
                    stable_hash64(
                        F.concat_ws("|", F.col("id"), F.lit(k)),
                        salt=f"sgns-in-{seed}",
                    ),
                    F.lit(2 * b6 + 1),
                ) - F.lit(b6)).cast("long").alias(vcols[k])
                for k in range(dim)
            ],
        )
    )
    ctxv = pin_table(
        nodes.select("id", *[F.lit(0).cast("long").alias(c) for c in vcols])
    )
    # epoch-granular durable resume: both vector tables ride ONE
    # state frame (side 0 = input/center, side 1 = context), validated
    # against the triple-table fingerprint + hyperparameters
    params = {
        "dim": dim, "walk_length": walk_length,
        "walks_per_node": walks_per_node, "window": window,
        "negatives": negatives, "lr": repr(float(lr)), "seed": seed,
        "direction": direction,
    }
    fp = (
        int(triples.agg(
            F.expr("bit_xor(xxhash64(center, other, cnt, label))")
            .alias("f")).first()["f"] or 0)
        if checkpoint_dir else None
    )
    loop = SuperstepLoop(
        spark, checkpoint_dir, every=checkpoint_every, name="sgns",
        max_steps=epochs, context={"corpus_fp": fp, "params": params},
    )
    start = 0
    if resume and checkpoint_dir:
        resumed = loop.resume()
        if resumed is not None:
            rec_fp = loop.last_context.get("corpus_fp")
            rec = loop.last_context.get("params")
            if (rec_fp is not None and int(rec_fp) != fp) or (
                rec is not None and rec != params
            ):
                raise ValueError(
                    "sgns_embeddings resume mismatch: corpus fingerprint "
                    f"or hyperparameters differ ({rec_fp} != {fp} or "
                    f"{rec!r} != {params!r})."
                )
            start, state = resumed
            release_state(cen)
            release_state(ctxv)
            cen = pin_table(
                state.filter(F.col("side") == 0).select("id", *vcols)
            )
            ctxv = pin_table(
                state.filter(F.col("side") == 1).select("id", *vcols)
            )
    for _ep in range(start, epochs):
        t = (
            triples.join(
                cen.select(F.col("id").alias("center"),
                           *[F.col(c).alias(f"c{k}")
                             for k, c in enumerate(vcols)]),
                "center",
            )
            .join(
                ctxv.select(F.col("id").alias("other"),
                            *[F.col(c).alias(f"o{k}")
                              for k, c in enumerate(vcols)]),
                "other",
            )
        )
        dot = sum(F.col(f"c{k}") * F.col(f"o{k}") for k in range(dim))
        # word2vec's MAX_EXP clip: saturate the sigmoid argument at
        # +-6 so a diverging dot product cannot blow up exp/gradients
        x = F.greatest(
            F.least(dot.cast("double") / F.lit(1e12), F.lit(6.0)),
            F.lit(-6.0),
        )
        sig7 = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-x)), 7)
        coef9 = (
            F.round(F.lit(float(lr)) * (F.col("label") - sig7) * F.lit(1e9), 0)
            .cast("long") * F.col("cnt")
        )
        t = t.withColumn("coef9", coef9)
        gc = t.groupBy(F.col("center").alias("id")).agg(*[
            F.sum(F.expr(
                f"(2 * coef9 * o{k} + CASE WHEN coef9 * o{k} >= 0 THEN "
                f"1000000000 ELSE -1000000000 END) DIV 2000000000"
            )).cast("long").alias(f"g{k}")
            for k in range(dim)
        ])
        go = t.groupBy(F.col("other").alias("id")).agg(*[
            F.sum(F.expr(
                f"(2 * coef9 * c{k} + CASE WHEN coef9 * c{k} >= 0 THEN "
                f"1000000000 ELSE -1000000000 END) DIV 2000000000"
            )).cast("long").alias(f"g{k}")
            for k in range(dim)
        ])
        # component clamp at +-8.0: bounded state under any lr /
        # epoch schedule (full-batch GD can oscillate), keeping every
        # gradient product inside int64
        clamp = 8_000_000
        new_cen = pin_table(
            cen.join(gc, "id", "left").select(
                "id",
                *[F.greatest(
                    F.least(
                        (F.col(c) + F.coalesce(F.col(f"g{k}"), F.lit(0))),
                        F.lit(clamp),
                    ),
                    F.lit(-clamp),
                ).cast("long").alias(c)
                  for k, c in enumerate(vcols)],
            )
        )
        new_ctx = pin_table(
            ctxv.join(go, "id", "left").select(
                "id",
                *[F.greatest(
                    F.least(
                        (F.col(c) + F.coalesce(F.col(f"g{k}"), F.lit(0))),
                        F.lit(clamp),
                    ),
                    F.lit(-clamp),
                ).cast("long").alias(c)
                  for k, c in enumerate(vcols)],
            )
        )
        new_cen.count()
        new_ctx.count()
        if checkpoint_dir:
            both = new_cen.select(
                F.lit(0).alias("side"), "id", *vcols
            ).unionByName(
                new_ctx.select(F.lit(1).alias("side"), "id", *vcols)
            )
            loop.advance(_ep + 1, both, metrics={"epoch": _ep + 1},
                         force_checkpoint=True)
        release_state(cen)
        release_state(ctxv)
        cen, ctxv = new_cen, new_ctx
    out = cen.select(
        "id",
        F.posexplode(
            F.array(*[F.round(F.col(c) / 1_000_000.0, 6) for c in vcols])
        ).alias("d", "value"),
    )
    release_state(triples)
    release_state(indexed)
    release_state(ctxv)
    return out


def sgns_embeddings_sql(
    edge_sql: str,
    dim: int = 8,
    walk_length: int = 4,
    walks_per_node: int = 4,
    window: int = 2,
    negatives: int = 2,
    epochs: int = 3,
    lr: float = 0.1,
    seed: int = 0,
    direction: str = "BOTH",
) -> str:
    """DuckDB twin of `sgns_embeddings`: the walks oracle + identical
    pair/negative construction and the SAME unrolled full-batch
    rounds — ROUND(sigmoid, 7), ROUND(lr·err·1e9) BIGINT coefficient,
    half-away-from-zero integer gradient divisions (Spark DIV and
    DuckDB // both truncate toward zero, verified), order-free sums."""
    from linkgraph.walks import random_walks_sql
    from linkgraph.pipeline.hashing import stable_hash64_sql

    walks = random_walks_sql(
        edge_sql, walk_length, walks_per_node=walks_per_node, seed=seed,
        direction=direction,
    )
    ks = range(dim)
    b6 = 500_000 // dim
    lrr = repr(float(lr))
    def _init_col(k):
        h = stable_hash64_sql(f"id || '|' || {k}", salt=f"sgns-in-{seed}")
        return (f"CAST(({h}) % {2 * b6 + 1} - {b6} AS BIGINT) AS v{k}")

    init_cols = ", ".join(_init_col(k) for k in ks)
    parts = [
        f"WITH eraw0 AS ({edge_sql})",
        f"walks AS MATERIALIZED ({walks})",
        """pos AS MATERIALIZED (
  SELECT a.node AS center, b.node AS ctx, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM walks a JOIN walks b
    ON a.start = b.start AND a.walk_no = b.walk_no
   AND abs(a.step - b.step) BETWEEN 1 AND {w}
   AND a.node <> b.node
  GROUP BY 1, 2)""".replace("{w}", str(window)),
        """nodes AS (SELECT DISTINCT id FROM (
  SELECT src AS id FROM eraw0 UNION ALL SELECT dst FROM eraw0))""",
        """indexed AS MATERIALIZED (SELECT id,
  CAST(ROW_NUMBER() OVER (ORDER BY id ASC) - 1 AS BIGINT) AS idx FROM nodes)""",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
    ]
    neg_selects = []
    for j in range(1, negatives + 1):
        h = stable_hash64_sql(
            "p.center || '|' || p.ctx || '|' || " + str(j),
            salt=f"sgns-neg-{seed}",
        )
        neg_selects.append(
            f"""SELECT p.center, ix.id AS other, p.cnt, 0 AS label
  FROM pos p CROSS JOIN nn
  JOIN indexed ix ON ix.idx = ({h}) % nn.n"""
        )
    triples = (
        "SELECT center, ctx AS other, cnt, 1 AS label FROM pos"
        + ("\n  UNION ALL " + "\n  UNION ALL ".join(neg_selects)
           if neg_selects else "")
    )
    parts.append(f"triples AS MATERIALIZED ({triples})")
    parts.append(f"cen0 AS MATERIALIZED (SELECT id, {init_cols} FROM nodes)")
    zero_cols = ", ".join(f"CAST(0 AS BIGINT) AS v{k}" for k in ks)
    parts.append(f"ctx0 AS MATERIALIZED (SELECT id, {zero_cols} FROM nodes)")
    for t in range(epochs):
        dot = " + ".join(f"ci.v{k} * oi.v{k}" for k in ks)
        cvals = ", ".join(f"ci.v{k} AS c{k}" for k in ks)
        ovals = ", ".join(f"oi.v{k} AS o{k}" for k in ks)
        parts.append(
            f"""tr{t} AS MATERIALIZED (
  SELECT q.center, q.other,
         CAST(ROUND(({lrr} * (CAST(q.label AS DOUBLE) - q.sig7))
                    * 1000000000.0) AS BIGINT) * q.cnt AS coef9,
         {", ".join(f"q.c{k}" for k in ks)},
         {", ".join(f"q.o{k}" for k in ks)}
  FROM (
    SELECT tp.center, tp.other, tp.cnt, tp.label, {cvals}, {ovals},
           ROUND(1.0 / (1.0 + exp(-(GREATEST(LEAST(
                 CAST(({dot}) AS DOUBLE) / 1000000000000.0, 6.0),
                 -6.0)))), 7) AS sig7
    FROM triples tp
    JOIN cen{t} ci ON ci.id = tp.center
    JOIN ctx{t} oi ON oi.id = tp.other) q)"""
        )
        gsum_c = ", ".join(
            f"CAST(SUM((2 * coef9 * o{k} + CASE WHEN coef9 * o{k} >= 0"
            f" THEN 1000000000 ELSE -1000000000 END) // 2000000000)"
            f" AS BIGINT) AS g{k}"
            for k in ks
        )
        gsum_o = ", ".join(
            f"CAST(SUM((2 * coef9 * c{k} + CASE WHEN coef9 * c{k} >= 0"
            f" THEN 1000000000 ELSE -1000000000 END) // 2000000000)"
            f" AS BIGINT) AS g{k}"
            for k in ks
        )
        parts.append(
            f"gc{t} AS (SELECT center AS id, {gsum_c} FROM tr{t}"
            " GROUP BY center)"
        )
        parts.append(
            f"go{t} AS (SELECT other AS id, {gsum_o} FROM tr{t}"
            " GROUP BY other)"
        )
        upd_c = ", ".join(
            f"CAST(GREATEST(LEAST(c.v{k} + COALESCE(g.g{k}, 0), 8000000),"
            f" -8000000) AS BIGINT) AS v{k}" for k in ks
        )
        upd_o = upd_c
        parts.append(
            f"cen{t + 1} AS MATERIALIZED (SELECT c.id, {upd_c}"
            f" FROM cen{t} c LEFT JOIN gc{t} g ON g.id = c.id)"
        )
        parts.append(
            f"ctx{t + 1} AS MATERIALIZED (SELECT c.id, {upd_o}"
            f" FROM ctx{t} c LEFT JOIN go{t} g ON g.id = c.id)"
        )
    finals = "\nUNION ALL ".join(
        f"SELECT id, CAST({k} AS INTEGER) AS d,"
        f" ROUND(CAST(v{k} AS DOUBLE) / 1000000.0, 6) AS value"
        f" FROM cen{epochs}"
        for k in ks
    )
    return ",\n".join(parts) + "\n" + finals
