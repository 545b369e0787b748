"""Deterministic random walks — the DeepWalk/node2vec corpus generator.

Random-walk corpora (Perozzi et al. 2014, DeepWalk, arXiv:1403.6652;
Grover & Leskovec 2016, node2vec) are how a link graph becomes
training data for embedding models — the operator that bridges the
graph engine and the training-data pipeline. The reference engine's
procedure family stops at analytics; this is the engine-extension
counterpart that emits sequences.

Determinism contract: "random" choices are pseudorandom via the
cross-engine md5 hash (`pipeline/hashing.py`), keyed by
(start, walk_no, step, candidate, seed). The walk set is a pure
function of (graph, walk_length, walks_per_node, seed) — identical
across runs, partitionings, cluster sizes, AND engines, so an exact
DuckDB oracle replays every step. Changing ``seed`` yields an
independent walk family; in expectation over seeds each step is
uniform over the neighbor set (hash-argmin over candidates), the same
guarantee seeded `rand()`-per-row sampling gives without its
task-ordering nondeterminism.

Scale shape (100 TB): each step is ONE shuffle — the frontier joins
the edge table on the current node, then a (start, walk_no)-keyed
argmin picks the successor. Frontier size is bounded by
|nodes| × walks_per_node forever (walks never branch), so step cost is
flat regardless of walk_length; each round's frontier is persisted so
the chain replays nothing. Hub nodes fan out into the argmin's partial
aggregation (map-side combine collapses each partition to one
candidate per walk) — no hub ever concentrates in a single task
beyond its frontier share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import attach_caches
from linkgraph.pipeline.hashing import stable_hash64, stable_hash64_sql

__all__ = ["random_walks", "walks_as_sequences", "random_walks_sql"]


def _choice_hash(seed: int):
    return stable_hash64(
        F.concat_ws(
            "|",
            F.col("start"),
            F.col("walk_no"),
            F.col("step"),
            F.col("dst"),
        ),
        salt=seed,
    )


def random_walks(
    edges: DataFrame,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> DataFrame:
    """Per-step walk rows ``(start, walk_no, step, node)``.

    Step 0 is the start node itself; each later step moves to the
    neighbor minimizing the keyed hash (ties — a 2^-60 hash collision —
    break on the node id, so the choice is a total order either way).
    Walks stop early at dead ends (no outgoing neighbor under
    ``direction``), so a row's absence IS the termination signal.

    ``walks_per_node`` starts that many independent walks per node
    (walk_no 0..w-1), the DeepWalk corpus contract.
    """
    if walk_length < 0:
        raise ValueError(f"walk_length must be >= 0, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    e = edges.select("src", "dst")
    if direction == "BOTH":
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif direction == "INCOMING":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    elif direction != "OUTGOING":
        raise ValueError(f"direction must be OUTGOING/INCOMING/BOTH, got {direction!r}")
    e = e.distinct()
    nodes = e.select(F.col("src").alias("node")).unionByName(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    cur = nodes.select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1))).alias("walk_no"),
        F.lit(0).alias("step"),
        "node",
    )
    step0 = cur
    caches = []
    for t in range(1, walk_length + 1):
        nxt = (
            cur.join(e, cur.node == e.src)
            .withColumn("step", F.lit(t))
            .groupBy("start", "walk_no")
            .agg(
                F.min_by(
                    F.col("dst"),
                    F.struct(
                        _choice_hash(seed).alias("h"), F.col("dst").alias("d")
                    ),
                ).alias("node")
            )
            .select("start", "walk_no", F.lit(t).alias("step"), "node")
            .persist()
        )
        caches.append(nxt)
        cur = nxt
    out = step0
    for f in caches:
        out = out.unionByName(f)
    return attach_caches(out, caches)


def walks_as_sequences(walks: DataFrame, sep: str = " ") -> DataFrame:
    """Collapse per-step rows into one training sequence per walk:
    ``(start, walk_no, length, sequence)`` with nodes joined by
    ``sep`` in step order (array_sort on (step, node) structs — no
    window, one aggregation)."""
    return (
        walks.groupBy("start", "walk_no")
        .agg(
            F.count("*").alias("length"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("step", F.col("node")))
                    ),
                    lambda s: s["node"].cast("string"),
                ),
                sep,
            ).alias("sequence"),
        )
    )


def random_walks_sql(
    edge_sql: str,
    walk_length: int,
    walks_per_node: int = 1,
    seed: int = 0,
    direction: str = "OUTGOING",
) -> str:
    """DuckDB oracle: replays every hash-argmin step exactly.

    One CTE per step (walk count is bounded, so the unrolled plan is
    linear in walk_length); ROW_NUMBER ordered by (hash, dst) is the
    same total order as the engine's struct min_by.
    """
    if direction == "BOTH":
        universe = (
            f"SELECT DISTINCT src, dst FROM (SELECT src, dst FROM eraw "
            f"UNION ALL SELECT dst AS src, src AS dst FROM eraw)"
        )
    elif direction == "INCOMING":
        universe = "SELECT DISTINCT dst AS src, src AS dst FROM eraw"
    else:
        universe = "SELECT DISTINCT src, dst FROM eraw"
    h = stable_hash64_sql(
        "concat_ws('|', s.start, s.walk_no, {t}, e.dst)", salt=seed
    )
    parts = [
        f"WITH eraw AS ({edge_sql})",
        f"e AS ({universe})",
        "nodes AS (SELECT DISTINCT node FROM "
        "(SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e))",
        "s0 AS (SELECT node AS start, w.walk_no, 0 AS step, node FROM nodes, "
        f"(SELECT UNNEST(range({walks_per_node})) AS walk_no) w)",
    ]
    for t in range(1, walk_length + 1):
        parts.append(
            f"s{t} AS (SELECT start, walk_no, {t} AS step, dst AS node FROM ("
            f"SELECT s.start, s.walk_no, e.dst, "
            f"ROW_NUMBER() OVER (PARTITION BY s.start, s.walk_no "
            f"ORDER BY {h.format(t=t)}, e.dst) AS rn "
            f"FROM s{t - 1} s JOIN e ON s.node = e.src) WHERE rn = 1)"
        )
    union = "\nUNION ALL ".join(
        f"SELECT start, walk_no, step, node FROM s{t}"
        for t in range(walk_length + 1)
    )
    return ",\n".join(parts) + "\n" + union
