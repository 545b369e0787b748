#!/usr/bin/env python
"""Benchmark harness — driver contract (one JSON line on stdout).

Runs the engine's headline queries on ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``local[$SPARK_GRAFT_CPUS]`` and prints

  {"metric": "pagerank_edges_per_sec", "value": N, "unit": "...",
   "queries": {"q1": sec, ...}, "sf": ...}

The headline metric follows BASELINE.json: PageRank throughput in
edges/sec (edges * iterations / compute seconds) on the link graph.
The N-vs-4N scaling-efficiency evidence lives in tools/scaling_bench.py
-> BENCH/BASELINE.md (run the same job at local[8] and local[32]).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from linkgraph.session import get_spark
from linkgraph import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
)
from linkgraph.graphs import cosupplier_edges, purchase_edges
from linkgraph.ingest import derive_graph
from linkgraph.synth import generate_source_table

PR_ITERS = 20


def _run(df):
    """Force full execution without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def bench_queries(spark, sf_dir: str, scale: float) -> tuple[dict, dict]:
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    # q1 — PageRank, 20 fixed iterations (reference default) on the
    # customer->supplier purchase graph. Headline metric source.
    t0 = time.time()
    edges = purchase_edges(spark, sf_dir)
    res = pagerank(edges, damping=0.85, max_iter=PR_ITERS)
    _run(res.scores)
    timings["q1_pagerank20_purchase"] = round(time.time() - t0, 3)
    extra["pr_edges"] = res.stats["edges"]
    extra["pr_compute_s"] = res.stats["compute_s"]
    extra["pagerank_edges_per_sec"] = round(
        res.stats["edges"] * PR_ITERS / max(res.stats["compute_s"], 1e-9), 1
    )

    # q2 — connected components to fixpoint (min-id propagation)
    t0 = time.time()
    cc = connected_components(purchase_edges(spark, sf_dir))
    _run(cc.components)
    timings["q2_wcc_purchase"] = round(time.time() - t0, 3)
    extra["wcc_iterations"] = cc.iterations

    # q3 — label propagation, 5 supersteps, weighted co-supplier graph
    t0 = time.time()
    lp = label_propagation(cosupplier_edges(spark, sf_dir), direction="BOTH", max_iter=5)
    _run(lp.labels)
    timings["q3_labelprop5_cosupplier"] = round(time.time() - t0, 3)

    # q4 — triangle count + clustering coefficients, co-supplier graph
    t0 = time.time()
    tc = triangle_count(cosupplier_edges(spark, sf_dir))
    _run(tc.counts)
    timings["q4_triangles_cosupplier"] = round(time.time() - t0, 3)
    extra["triangle_count"] = tc.triangle_count

    # q5 — north-star end-to-end: synth source-code table -> Arrow-UDF
    # import extraction -> dense ids -> file-level link graph -> PageRank.
    t0 = time.time()
    n_files = max(2_000, int(200_000 * scale))
    source = generate_source_table(
        spark, repos=max(20, n_files // 200), files_per_repo=200, seed=42
    )
    nodes, file_edges, _repo_edges = derive_graph(source)
    pr2 = pagerank(file_edges, nodes=nodes.select("id"), damping=0.85, max_iter=10)
    _run(pr2.scores)
    timings["q5_synth_ingest_pagerank10"] = round(time.time() - t0, 3)
    extra["synth_files"] = n_files
    extra["synth_edges"] = pr2.stats["edges"]
    extra["synth_pagerank_edges_per_sec"] = round(
        pr2.stats["edges"] * 10 / max(pr2.stats["compute_s"], 1e-9), 1
    )

    return timings, extra


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    scale = float(m.group(1).rstrip(".")) if m else 0.1

    spark = get_spark("linkgraph-bench", cores=cpus)
    t_all = time.time()
    timings, extra = bench_queries(spark, sf_dir, scale)
    total = round(time.time() - t_all, 3)

    out = {
        "metric": "pagerank_edges_per_sec",
        "value": extra["pagerank_edges_per_sec"],
        "unit": "edges/sec",
        "queries": timings,
        "sf": scale,
        "total_sec": total,
        "cpus": cpus,
        "detail": extra,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
