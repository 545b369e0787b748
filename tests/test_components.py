"""Connected-components parity with UnionFindTest fixtures (FIXTURES.md §2)."""

from linkgraph import canonical_components, connected_components, edges_from_pairs
from tests.fixtures import (
    UNIONFIND_EDGES,
    UNIONFIND_ISOLATED,
    UNIONFIND_SETS,
    UNIONFIND_THRESHOLD_EDGES,
    UNIONFIND_THRESHOLD_SETS,
)


def test_unionfind_sets(spark):
    nodes, edges = edges_from_pairs(spark, UNIONFIND_EDGES, extra_keys=UNIONFIND_ISOLATED)
    res = connected_components(edges, nodes=nodes)
    assert res.set_count == 6
    canon = canonical_components(res.components, nodes)
    got = {r["key"]: r["set_key"] for r in canon.collect()}
    assert got == UNIONFIND_SETS


def test_unionfind_threshold(spark):
    nodes, edges = edges_from_pairs(spark, UNIONFIND_THRESHOLD_EDGES)
    res = connected_components(edges, nodes=nodes, threshold=0.5)
    assert res.set_count == 2
    canon = canonical_components(res.components, nodes)
    got = {r["key"]: r["set_key"] for r in canon.collect()}
    assert got == UNIONFIND_THRESHOLD_SETS


def test_components_comp_is_min_dense_id(spark):
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    res = connected_components(edges, nodes=nodes)
    ids = {r["key"]: r["id"] for r in nodes.collect()}
    comp = {r["id"]: r["comp"] for r in res.components.collect()}
    assert comp[ids["a"]] == comp[ids["b"]] == comp[ids["c"]] == min(ids["a"], ids["b"], ids["c"])
    assert comp[ids["x"]] == comp[ids["y"]] == min(ids["x"], ids["y"])


def test_star_algorithm_matches_minlabel(spark):
    from tests.fixtures import UNIONFIND_EDGES, UNIONFIND_ISOLATED
    from linkgraph import connected_components, edges_from_pairs
    nodes, edges = edges_from_pairs(spark, UNIONFIND_EDGES, extra_keys=UNIONFIND_ISOLATED)
    a = connected_components(edges, nodes=nodes)
    b = connected_components(edges, nodes=nodes, algorithm="star")
    ra = sorted(map(tuple, a.components.collect()))
    rb = sorted(map(tuple, b.components.collect()))
    assert ra == rb
    assert a.set_count == b.set_count == 6


def test_star_algorithm_long_chain_few_rounds(spark):
    from linkgraph import connected_components, edges_from_pairs
    chain = [(f"c{i:03d}", f"c{i+1:03d}") for i in range(60)]
    nodes, edges = edges_from_pairs(spark, chain)
    res = connected_components(edges, nodes=nodes, algorithm="star")
    assert res.set_count == 1
    # O(log n) rounds — a 61-node chain must NOT take ~60 rounds
    assert res.iterations <= 12, res.iterations


def test_star_cc_mega_hub(spark):
    """100k-degree hub: the join-based large/small-star must not build
    whole-neighborhood arrays (round-1 collect_set defect)."""
    from pyspark.sql import functions as F
    hub = spark.range(1, 100_001).select(
        F.lit(0).alias("src"), F.col("id").alias("dst")
    )
    res = connected_components(hub, algorithm="star", max_iter=10)
    assert res.set_count == 1
    assert res.components.filter(F.col("comp") != 0).count() == 0


def test_wcc_hub_split_equals_plain(spark):
    """hub_cap splits hub-src edges onto the broadcast-label path;
    the label fixpoint is identical to the plain join (MIN is
    split-invariant). Star fixture forces the hub down the hot path."""
    from linkgraph import connected_components
    from linkgraph.ids import edges_from_pairs

    pairs = [("hub", f"n{i}") for i in range(40)] + [("x", "y")]
    _nodes, edges = edges_from_pairs(spark, pairs)
    plain = {
        (r["id"], r["comp"])
        for r in connected_components(edges).components.collect()
    }
    res = connected_components(edges, hub_cap=4)
    assert res.stats["hub_split"] == 1  # only the hub exceeds deg 4
    split = {(r["id"], r["comp"]) for r in res.components.collect()}
    assert plain == split

    # auto mode: engages on the skewed star, stays off on a uniform ring
    auto = connected_components(edges, hub_cap="auto")
    assert {(r["id"], r["comp"]) for r in auto.components.collect()} == plain
    ring = [(str(i), str((i + 1) % 12)) for i in range(12)]
    _n2, ring_edges = edges_from_pairs(spark, ring)
    off = connected_components(ring_edges, hub_cap="auto")
    assert off.stats["hub_split"] == 0


def test_frontier_delta_iteration_equals_full(spark):
    """Delta iteration (frontier=True, the default) and full
    propagation return identical components in the same number of
    rounds — the frontier only skips provably no-op join probes.
    Long-chain fixture: the frontier stays interesting for many
    rounds; star fixture: it collapses after round 1."""
    from linkgraph import connected_components
    from linkgraph.ids import edges_from_pairs

    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(12)]
    star = [("hub", f"s{i}") for i in range(8)]
    _nodes, edges = edges_from_pairs(spark, chain + star + [("q1", "q2")])
    delta = connected_components(edges)
    full = connected_components(edges, frontier=False)
    a = {(r["id"], r["comp"]) for r in delta.components.collect()}
    b = {(r["id"], r["comp"]) for r in full.components.collect()}
    assert a == b
    assert delta.set_count == full.set_count == 3
    assert delta.iterations == full.iterations
