"""Resumability: a run killed at superstep k and resumed from the
checkpoint manifest finishes equal to an uninterrupted run within
float round-off (<=1e-12 — parquet round-trips IEEE doubles exactly,
but the cross-partition merge order of partial sums is shuffle-fetch-
dependent, so the last ulp can differ). SURVEY.md §5.5; north_rule
"resumable from checkpoint with per-partition lineage + metrics"."""

import json
import os

import numpy as np

from linkgraph import edges_from_pairs, pagerank
from tests.fixtures import PAGERANK_WIKI_EDGES, PAGERANK_WIKI_ISOLATED


def test_pagerank_resume_bit_identical(spark, tmp_path):
    nodes, edges = edges_from_pairs(
        spark, PAGERANK_WIKI_EDGES, extra_keys=PAGERANK_WIKI_ISOLATED
    )
    full = pagerank(edges, nodes=nodes, damping=0.85, max_iter=12)
    want = {r["id"]: r["rank"] for r in full.scores.collect()}

    ckpt = str(tmp_path / "pr_ckpt")
    # "killed" run: stops after 6 supersteps, durable every 3
    pagerank(edges, nodes=nodes, damping=0.85, max_iter=6,
             checkpoint_dir=ckpt, checkpoint_every=3)
    manifest = os.path.join(ckpt, "pagerank_manifest.jsonl")
    assert os.path.exists(manifest)
    lines = [json.loads(l) for l in open(manifest) if l.strip()]
    assert lines, "manifest must have durable checkpoints"
    # per-partition lineage recorded
    assert all("partitions" in l and l["partitions"] for l in lines)

    # resumed run continues from the manifest to iteration 12
    res = pagerank(edges, nodes=nodes, damping=0.85, max_iter=12,
                   checkpoint_dir=ckpt, checkpoint_every=3, resume=True)
    got = {r["id"]: r["rank"] for r in res.scores.collect()}
    assert got.keys() == want.keys()
    for k in want:
        assert np.isclose(got[k], want[k], rtol=0, atol=1e-12), (k, got[k], want[k])


def test_manifest_metrics_recorded(spark, tmp_path):
    nodes, edges = edges_from_pairs(spark, PAGERANK_WIKI_EDGES)
    ckpt = str(tmp_path / "pr_tol")
    pagerank(edges, nodes=nodes, damping=0.85, max_iter=30, tol=1e-4,
             checkpoint_dir=ckpt, checkpoint_every=5)
    manifest = os.path.join(ckpt, "pagerank_manifest.jsonl")
    lines = [json.loads(l) for l in open(manifest) if l.strip()]
    deltas = [l["metrics"].get("linf_delta") for l in lines if "linf_delta" in l["metrics"]]
    assert deltas and deltas[-1] is not None
