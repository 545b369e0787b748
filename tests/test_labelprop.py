"""Label-propagation parity (FIXTURES.md §3) + pandas oracle (§3b)."""

import pandas as pd

from linkgraph import edges_from_pairs, label_propagation
from tests.fixtures import (
    LABELPROP_CLIQUES_EDGES,
    LABELPROP_CLIQUES_SEEDS,
    LABELPROP_EDGES,
    LABELPROP_SEEDS,
)


def _with_seeds(spark, nodes, seeds):
    seed_df = spark.createDataFrame(
        [(k, v) for k, v in seeds.items()], "key string, partition long"
    )
    return nodes.join(seed_df, "key", "left").select("id", "key", "partition")


def test_labelprop_weighted_one_iteration(spark):
    nodes, edges = edges_from_pairs(spark, LABELPROP_EDGES)
    seeded = _with_seeds(spark, nodes, LABELPROP_SEEDS)
    res = label_propagation(edges, nodes=seeded, direction="INCOMING", max_iter=1)
    got = {
        r["key"]: r["label"]
        for r in res.labels.join(nodes, "id").select("key", "label").collect()
    }
    assert got["C"] == 42  # votes at C: 42 -> 2.0 beats 52 -> 1.0
    assert got["A"] == 52 and got["B"] == 42  # no incoming edges: keep seeds


def _pandas_sync_lpa(edge_keys, seeds, keys, max_iter=50):
    """Pure-pandas oracle for the documented spec: synchronous, BOTH
    direction, min-label tie-break (FIXTURES.md §3b)."""
    labels = {k: seeds.get(k, None) for k in keys}
    ids = {k: i for i, k in enumerate(sorted(keys))}
    labels = {k: (seeds[k] if k in seeds else ids[k]) for k in keys}
    nbrs = {k: [] for k in keys}
    for a, b in edge_keys:
        nbrs[a].append(b)
        nbrs[b].append(a)
    for _ in range(max_iter):
        new = {}
        for k in keys:
            if not nbrs[k]:
                new[k] = labels[k]
                continue
            votes = {}
            for r in nbrs[k]:
                votes[labels[r]] = votes.get(labels[r], 0.0) + 1.0
            best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[k] = best
        if new == labels:
            break
        labels = new
    return labels, ids


def test_labelprop_cliques_matches_pandas_oracle(spark):
    keys = sorted({k for e in LABELPROP_CLIQUES_EDGES for k in e})
    nodes, edges = edges_from_pairs(spark, LABELPROP_CLIQUES_EDGES)
    seeded = _with_seeds(spark, nodes, LABELPROP_CLIQUES_SEEDS)
    res = label_propagation(edges, nodes=seeded, direction="BOTH", max_iter=50)
    got = {
        r["key"]: r["label"]
        for r in res.labels.join(nodes, "id").select("key", "label").collect()
    }
    expected, ids = _pandas_sync_lpa(LABELPROP_CLIQUES_EDGES, LABELPROP_CLIQUES_SEEDS, keys)
    # dense ids are assigned sorted-by-key in edges_from_pairs(ordered=True),
    # so unseeded oracle ids align with engine ids
    assert got == expected
    # communities separate the two cliques
    assert len({got[k] for k in ["p0", "p1", "p2"]}) == 1
    assert len({got[k] for k in ["q0", "q1", "q2"]}) == 1


def test_labelprop_hub_split_equals_plain(spark):
    """hub_cap routes hub-nbr vote rows onto the broadcast-label path;
    the vote sums (and therefore the argmax labels) are identical to
    the plain join — SUM is split-invariant. Star fixture forces the
    hub down the hot path; multi-iteration so split state feeds the
    next round's probe too."""
    pairs = [("hub", f"n{i}") for i in range(40)] + [
        (f"n{i}", f"n{(i + 1) % 40}") for i in range(40)
    ] + [("x", "y")]
    _nodes, edges = edges_from_pairs(spark, pairs)
    plain = {
        (r["id"], r["label"])
        for r in label_propagation(
            edges, direction="BOTH", max_iter=3
        ).labels.collect()
    }
    res = label_propagation(edges, direction="BOTH", max_iter=3, hub_cap=20)
    assert res.stats["hub_split"] == 1  # only the hub exceeds nbr-degree 20
    assert {(r["id"], r["label"]) for r in res.labels.collect()} == plain

    # auto mode: engages on the skewed star, stays exact; off on a ring
    auto = label_propagation(edges, direction="BOTH", max_iter=3, hub_cap="auto")
    assert {(r["id"], r["label"]) for r in auto.labels.collect()} == plain
    ring = [(str(i), str((i + 1) % 12)) for i in range(12)]
    _n2, ring_edges = edges_from_pairs(spark, ring)
    off = label_propagation(ring_edges, direction="BOTH", max_iter=2, hub_cap="auto")
    assert off.stats["hub_split"] == 0
