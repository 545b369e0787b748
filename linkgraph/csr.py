"""Per-partition CSR adjacency-block kernels (pandas/Arrow UDFs).

Second execution path for the hot algorithms (north star: "materializes
per-partition CSR adjacency blocks in pandas/Arrow UDFs"), mirroring
the reference's adjacency-array layout
(pub:core/.../heavyweight/AdjacencyMatrix.java — per-node int[] arrays;
pub:algo/.../impl/PageRank.java#ComputeStep — per-target-partition
delta buffers; SURVEY.md §1.4, §4).

Shape of the PageRank kernel:

  * the static edge table is hash-bucketed by ``src`` into B blocks
    (``block = pmod(hash(src), B)``) — the Spark analog of the
    reference's node-range ComputeSteps;
  * per superstep, each block COGROUPs with the rank state bucketed the
    same way and runs a numpy scatter kernel: ranks gathered onto
    sources, contributions accumulated into a dense per-block delta
    buffer with ``np.add.at`` over factorized dst codes (exactly the
    ComputeStep float[] delta-buffer idea, vectorized);
  * each block emits ONE partial row per distinct dst it touches —
    a salted two-phase aggregation: phase 1 inside the Arrow kernel
    (salt = src block), phase 2 a tiny JVM-side ``groupBy(dst).sum``.
    Power-law in-degree hubs therefore ship <= B partial rows per
    superstep instead of one row per in-edge: this IS the explicit
    skew handling the north rule demands, on top of AQE.

All kernels are vectorized pandas/Arrow (zero per-row Python UDFs,
per BASELINE.json input_hint).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.checkpoint import SuperstepLoop
from linkgraph.pagerank import PageRankResult, _node_universe
from linkgraph.triangles import TriangleResult, oriented_edges


# --------------------------------------------------------------- pagerank

def _scatter_kernel(edges_pdf: pd.DataFrame, ranks_pdf: pd.DataFrame) -> pd.DataFrame:
    """One CSR-block superstep: gather ranks on src, scatter to dst.

    edges_pdf: (src, dst, share) — the block's adjacency, CSR-grouped
    by factorized src/dst codes. ranks_pdf: (id, rank) for exactly the
    src ids hashed into this block.
    Returns per-block partial sums (dst, c) — one row per distinct dst.
    """
    if edges_pdf.empty:
        return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                             "c": pd.Series([], dtype="float64")})
    # CSR gather: map block-local src codes -> rank vector
    src_codes, src_ids = pd.factorize(edges_pdf["src"], sort=True)
    rank_vec = (
        ranks_pdf.set_index("id")["rank"]
        .reindex(src_ids)
        .fillna(0.0)
        .to_numpy(dtype=np.float64)
    )
    contrib = rank_vec[src_codes] * edges_pdf["share"].to_numpy(dtype=np.float64)
    # CSR scatter: dense per-block delta buffer (ComputeStep analog)
    dst_codes, dst_ids = pd.factorize(edges_pdf["dst"], sort=True)
    buf = np.zeros(len(dst_ids), dtype=np.float64)
    np.add.at(buf, dst_codes, contrib)
    return pd.DataFrame({"dst": dst_ids.astype("int64"), "c": buf})


def pagerank_csr(
    edges: DataFrame,
    nodes: DataFrame | None = None,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float | None = None,
    weighted: bool = False,
    num_blocks: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
) -> PageRankResult:
    """PageRank via per-partition CSR-block Arrow kernels.

    Semantics identical to linkgraph.pagerank.pagerank (reference
    formula, SURVEY.md §2.1); tests assert cross-path equality at
    1e-12. Prefer this path when the Python-side batch win matters;
    prefer the pure-DataFrame path when the cluster is JVM-bound.
    """
    spark = edges.sparkSession
    t0 = time.time()
    d = float(damping)
    B = num_blocks or max(8, spark.sparkContext.defaultParallelism)

    base = _node_universe(edges, nodes).persist()
    n_nodes = base.count()

    if weighted:
        w = F.coalesce(F.col("weight"), F.lit(1.0))
        deg = edges.groupBy("src").agg(F.sum(w).alias("outdeg"))
        e = edges.select("src", "dst", w.alias("w"))
        edges_pre = e.join(deg, "src").select(
            "src", "dst", (F.col("w") / F.col("outdeg")).alias("share")
        )
    else:
        deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        edges_pre = edges.join(deg, "src").select(
            "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("share")
        )
    block = F.pmod(F.hash("src"), F.lit(B)).alias("block")
    edges_b = edges_pre.select(block, "src", "dst", "share").persist()
    n_edges = edges_b.count()
    t_load = time.time() - t0

    loop = SuperstepLoop(spark, checkpoint_dir, every=checkpoint_every, name="pagerank_csr")
    ranks = base.select("id", F.lit(1.0 - d).alias("rank"))
    ranks = loop.advance(0, ranks, force_checkpoint=bool(checkpoint_dir))

    eg = edges_b.groupBy("block")
    converged = False
    delta = None
    it = 0
    t1 = time.time()
    for it in range(1, max_iter + 1):
        ranks_b = ranks.select(
            F.pmod(F.hash("id"), F.lit(B)).alias("block"), "id", "rank"
        )
        partials = eg.cogroup(ranks_b.groupBy("block")).applyInPandas(
            lambda e, r: _scatter_kernel(e, r), schema="dst long, c double"
        )
        sums = partials.groupBy("dst").agg(F.sum("c").alias("s"))
        new_ranks = base.join(sums, base.id == sums.dst, "left").select(
            base.id.alias("id"),
            (F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"),
        )
        if tol is not None:
            pre = new_ranks.persist()
            delta = (
                pre.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d"))
                .first()["d"]
            )
            new_ranks = loop.advance(it, pre, metrics={"linf_delta": delta})
            if new_ranks is not pre:
                pre.unpersist()  # free the delta-probe cache (leak per checkpoint)
            if delta < tol:
                converged = True
                ranks = new_ranks
                break
        else:
            new_ranks = loop.advance(it, new_ranks)
        ranks = new_ranks

    stats = {
        "nodes": n_nodes,
        "edges": n_edges,
        "iterations": it,
        "damping": d,
        "blocks": B,
        "load_s": round(t_load, 4),
        "compute_s": round(time.time() - t1, 4),
        "converged": converged,
        "linf_delta": delta,
        "path": "csr",
    }
    base.unpersist()
    edges_b.unpersist()
    return PageRankResult(scores=ranks, iterations=it, converged=converged, delta=delta, stats=stats)


# --------------------------------------------------------------- triangles

def _intersect_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
    """Close wedges by sorted-adjacency intersection (binary-search
    analog of AdjacencyMatrix#binarySearch exists(v,w), SURVEY.md §2.1).

    pdf rows: (lo, hi, adj_lo, adj_hi) — one per oriented edge, with the
    out-adjacency arrays (sorted) of both endpoints. Emits the triangle
    triples (u, v, w) = (lo, hi, member of adj_lo ∩ adj_hi).
    """
    us, vs, ws = [], [], []
    for lo, hi, a, b in zip(
        pdf["lo"].to_numpy(), pdf["hi"].to_numpy(), pdf["adj_lo"], pdf["adj_hi"]
    ):
        if a is None or b is None or len(a) == 0 or len(b) == 0:
            continue
        common = np.intersect1d(
            np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64),
            assume_unique=True,
        )
        if common.size:
            us.append(np.full(common.size, lo, dtype=np.int64))
            vs.append(np.full(common.size, hi, dtype=np.int64))
            ws.append(common)
    if not us:
        return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                             "v": pd.Series([], dtype="int64"),
                             "w": pd.Series([], dtype="int64")})
    return pd.DataFrame({
        "u": np.concatenate(us), "v": np.concatenate(vs), "w": np.concatenate(ws)
    })


def triangle_count_csr(
    edges: DataFrame,
    nodes: DataFrame | None = None,
) -> TriangleResult:
    """Triangle counting via per-partition sorted-adjacency intersection.

    Same outputs as linkgraph.triangles.triangle_count; tests assert
    cross-path equality. Degree-ordered orientation bounds adjacency
    sizes per corner (every wedge charged to its lowest-degree corner),
    so `adj` arrays stay small even on power-law graphs.
    """
    t0 = time.time()
    org, deg, _n_oriented = oriented_edges(edges)

    adj = org.groupBy(F.col("lo").alias("id")).agg(
        F.array_sort(F.collect_list("hi")).alias("adj")
    )
    pairs = (
        org.join(adj.select(F.col("id").alias("lo"), F.col("adj").alias("adj_lo")), "lo")
        .join(adj.select(F.col("id").alias("hi"), F.col("adj").alias("adj_hi")), "hi")
        .select("lo", "hi", "adj_lo", "adj_hi")
    )
    tri = pairs.mapInPandas(
        lambda it: (_intersect_kernel(pdf) for pdf in it),
        schema="u long, v long, w long",
    )
    # canonicalize triple ordering to (a<b<c) to match the DF path
    triples = tri.select(
        F.least("u", "v", "w").alias("node_a"),
        F.expr(
            "filter(array(u, v, w), x -> x != least(u, v, w) and x != greatest(u, v, w))"
        )[0].alias("node_b"),
        F.greatest("u", "v", "w").alias("node_c"),
    ).persist()
    n_tri = triples.count()

    corners = (
        triples.select(F.col("node_a").alias("id"))
        .union(triples.select("node_b"))
        .union(triples.select("node_c"))
        .groupBy("id")
        .agg(F.count("*").alias("triangles"))
    )
    universe = deg if nodes is None else nodes.select("id").join(deg, "id", "left")
    counts = (
        universe.join(corners, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("triangles"), F.lit(0)).alias("triangles"),
            F.coalesce(F.col("deg"), F.lit(0)).alias("degree"),
        )
        .withColumn(
            "coefficient",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
        )
    ).persist()
    agg = counts.agg(
        F.count("*").alias("n"), F.avg("coefficient").alias("avg_c")
    ).first()
    stats = {
        "nodeCount": agg["n"],
        "triangleCount": n_tri,
        "averageClusteringCoefficient": agg["avg_c"],
        "compute_s": round(time.time() - t0, 4),
        "path": "csr",
    }
    org.unpersist()
    deg.unpersist()
    return TriangleResult(
        counts=counts,
        triangles=triples,
        triangle_count=n_tri,
        avg_coefficient=agg["avg_c"],
        node_count=agg["n"],
        stats=stats,
    )
