"""SSSP / delta-stepping / MS-BFS / closeness / APSP-stream / MST /
SCC tests — hand-derived goldens on small fixtures (reference test
style, SURVEY.md §5)."""

import numpy as np
from pyspark.sql import functions as F

from linkgraph import (
    all_shortest_paths_stream,
    closeness_centrality,
    edges_from_pairs,
    minimum_spanning_forest,
    ms_bfs_distances,
    sssp,
    sssp_delta_stepping,
    strongly_connected_components,
)

# weighted digraph (classic Dijkstra example): shortest 0->4 = 7 via 0-2-1-4?
#   0->1 w4, 0->2 w1, 2->1 w2, 1->3 w1, 2->3 w5, 3->4 w3
W_EDGES = [
    ("0", "1", 4.0), ("0", "2", 1.0), ("2", "1", 2.0),
    ("1", "3", 1.0), ("2", "3", 5.0), ("3", "4", 3.0),
]
W_DIST_FROM_0 = {"0": 0.0, "1": 3.0, "2": 1.0, "3": 4.0, "4": 7.0}


def _dist_by_key(nodes, res_df):
    return {r["key"]: r["dist"] for r in res_df.join(nodes, "id").collect()}


def test_sssp_weighted_golden(spark):
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    src = nodes.filter(F.col("key") == "0").first()["id"]
    res = sssp(edges, src, weighted=True)
    got = _dist_by_key(nodes, res.distances)
    assert got == W_DIST_FROM_0


def test_delta_stepping_matches_sssp(spark):
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    src = nodes.filter(F.col("key") == "0").first()["id"]
    a = _dist_by_key(nodes, sssp(edges, src).distances)
    b = _dist_by_key(nodes, sssp_delta_stepping(edges, src, delta=2.0).distances)
    assert a == b


def test_sssp_max_hops_contract(spark):
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    src = nodes.filter(F.col("key") == "0").first()["id"]
    got = _dist_by_key(nodes, sssp(edges, src, max_hops=1).distances)
    # one relax round: only direct neighbors
    assert got == {"0": 0.0, "1": 4.0, "2": 1.0}


def test_ms_bfs_and_closeness_path_graph(spark):
    # path a-b-c (undirected): closeness(b)=(3-1)/2=1.0, a=c=(2)/3
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c")])
    d = ms_bfs_distances(edges, direction="BOTH")
    assert d.count() == 9  # 3 sources x 3 reached
    clo = {
        r["key"]: r["closeness"]
        for r in closeness_centrality(edges, direction="BOTH").join(nodes, "id").collect()
    }
    assert np.isclose(clo["b"], 1.0)
    assert np.isclose(clo["a"], 2 / 3)
    assert np.isclose(clo["c"], 2 / 3)


def test_apsp_stream_unweighted(spark):
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c")])
    rows = all_shortest_paths_stream(edges, direction="OUTGOING").collect()
    # a->b=1, a->c=2, b->c=1 (directed)
    got = {(r["source"], r["target"]): r["distance"] for r in rows}
    key = {r["key"]: r["id"] for r in nodes.collect()}
    a, b, c = key["a"], key["b"], key["c"]
    assert got == {(a, b): 1.0, (a, c): 2.0, (b, c): 1.0}


def test_mst_golden(spark):
    # square + diagonal, distinct weights: MST = {ab(1), bc(2), ad(3)}
    nodes, edges = edges_from_pairs(
        spark, [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 4.0), ("a", "d", 3.0), ("a", "c", 5.0)]
    )
    res = minimum_spanning_forest(edges)
    assert res.edge_count == 3
    assert np.isclose(res.total_weight, 6.0)
    keyed = {
        tuple(sorted((r["sk"], r["dk"]))): r["weight"]
        for r in res.tree_edges
        .join(nodes.select(F.col("id").alias("src"), F.col("key").alias("sk")), "src")
        .join(nodes.select(F.col("id").alias("dst"), F.col("key").alias("dk")), "dst")
        .collect()
    }
    assert keyed == {("a", "b"): 1.0, ("b", "c"): 2.0, ("a", "d"): 3.0}


def test_mst_forest_disconnected(spark):
    nodes, edges = edges_from_pairs(spark, [("a", "b", 1.0), ("x", "y", 2.0)])
    res = minimum_spanning_forest(edges)
    assert res.edge_count == 2
    assert np.isclose(res.total_weight, 3.0)


def test_k_spanning_tree_golden(spark):
    """algo.spanningTree.kmin/.kmax contract on the MST golden fixture.

    MST = {ab(1), bc(2), ad(3)}; kmin k=2 cuts ad(3) -> {a,b,c} | {d};
    kmin k=3 also cuts bc(2) -> {a,b} | {c} | {d}. Maximum spanning
    tree = {ac(5), cd(4), bc(2)}; kmax k=2 cuts bc(2) -> {a,c,d} | {b}.
    """
    from linkgraph import k_spanning_tree

    nodes, edges = edges_from_pairs(
        spark,
        [("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 4.0), ("a", "d", 3.0), ("a", "c", 5.0)],
    )
    key = {r["key"]: r["id"] for r in nodes.collect()}

    def clusters(res):
        byc = {}
        for r in res.assignment.collect():
            byc.setdefault(r["cluster"], set()).add(r["id"])
        return {frozenset(v) for v in byc.values()}

    def s(*keys):
        return frozenset(key[k] for k in keys)

    r2 = k_spanning_tree(edges, k=2, mode="kmin")
    assert clusters(r2) == {s("a", "b", "c"), s("d")}
    assert r2.removed_edges.count() == 1
    r3 = k_spanning_tree(edges, k=3, mode="kmin")
    assert clusters(r3) == {s("a", "b"), s("c"), s("d")}
    rx = k_spanning_tree(edges, k=2, mode="kmax")
    assert clusters(rx) == {s("a", "c", "d"), s("b")}
    # k=1 is the identity cut: one cluster per forest component
    r1 = k_spanning_tree(edges, k=1, mode="kmin")
    assert clusters(r1) == {s("a", "b", "c", "d")}
    with pytest.raises(ValueError):
        k_spanning_tree(edges, k=0)
    with pytest.raises(ValueError):
        k_spanning_tree(edges, k=2, mode="bogus")


def test_k_spanning_tree_start_node(spark):
    """Reference contract: start_node restricts to its component, so a
    second component's nodes don't appear and the cut stays local."""
    from linkgraph import k_spanning_tree

    nodes, edges = edges_from_pairs(
        spark, [("a", "b", 1.0), ("b", "c", 5.0), ("x", "y", 2.0)]
    )
    key = {r["key"]: r["id"] for r in nodes.collect()}
    res = k_spanning_tree(edges, k=2, mode="kmin", start_node=key["a"])
    got = {r["id"]: r["cluster"] for r in res.assignment.collect()}
    assert set(got) == {key["a"], key["b"], key["c"]}
    assert got[key["a"]] == got[key["b"]] != got[key["c"]]


import pytest


@pytest.mark.parametrize("local_threshold", [0, 500_000])
def test_scc_two_cycles_and_bridge(spark, local_threshold):
    # cycle {a,b,c}, cycle {d,e}, bridge c->d, tail d->f
    # local_threshold=0 forces the distributed trim+FW-BW path;
    # 500k exercises the in-driver Tarjan fallback — same contract
    nodes, edges = edges_from_pairs(
        spark,
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "e"), ("e", "d"), ("c", "d"), ("d", "f")],
    )
    res = strongly_connected_components(edges, local_threshold=local_threshold)
    got = {r["key"]: r["scc"] for r in res.components.join(nodes, "id").collect()}
    key = {r["key"]: r["id"] for r in nodes.collect()}
    assert got["a"] == got["b"] == got["c"] == min(key["a"], key["b"], key["c"])
    assert got["d"] == got["e"] == min(key["d"], key["e"])
    assert got["f"] == key["f"]
    assert res.set_count == 3


def test_scc_dag_all_singletons(spark):
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("a", "c")])
    res = strongly_connected_components(edges, local_threshold=0)
    assert res.set_count == 3
    got = {r["key"]: r["scc"] for r in res.components.join(nodes, "id").collect()}
    key = {r["key"]: r["id"] for r in nodes.collect()}
    assert got == {k: key[k] for k in "abc"}


def test_betweenness_path_graph(spark):
    from linkgraph.betweenness import betweenness_centrality
    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c")])
    res = betweenness_centrality(edges, direction="BOTH")
    got = {r["key"]: r["centrality"] for r in res.scores.join(nodes, "id").collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 0.0}


def test_betweenness_star(spark):
    from linkgraph.betweenness import betweenness_centrality
    nodes, edges = edges_from_pairs(spark, [("c", "l1"), ("c", "l2"), ("c", "l3")])
    res = betweenness_centrality(edges, direction="BOTH")
    got = {r["key"]: r["centrality"] for r in res.scores.join(nodes, "id").collect()}
    # center mediates all C(3,2)=3 leaf pairs
    assert got == {"c": 3.0, "l1": 0.0, "l2": 0.0, "l3": 0.0}


def test_betweenness_diamond_split_paths(spark):
    from linkgraph.betweenness import betweenness_centrality
    # a->b->d, a->c->d (directed): sigma(a,d)=2, delta(b)=delta(c)=0.5
    nodes, edges = edges_from_pairs(
        spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
    )
    res = betweenness_centrality(edges, direction="OUTGOING")
    got = {r["key"]: r["centrality"] for r in res.scores.join(nodes, "id").collect()}
    assert got["b"] == 0.5 and got["c"] == 0.5
    assert got["a"] == 0.0 and got["d"] == 0.0


def test_betweenness_sampled_rescale(spark):
    """RA-Brandes estimator: sampled scores = raw partial sums * n/|S|;
    on the star fixture leaf-only sources carry ALL dependency mass, so
    raw(leaves) equals the exact score and rescaled = exact * n/|S|."""
    from linkgraph.betweenness import betweenness_centrality
    nodes, edges = edges_from_pairs(spark, [("c", "l1"), ("c", "l2"), ("c", "l3")])
    leaves = nodes.filter(F.col("key") != "c").select("id")
    raw = betweenness_centrality(
        edges, sources=leaves, direction="BOTH", rescale=False
    )
    got_raw = {r["key"]: r["centrality"] for r in raw.scores.join(nodes, "id").collect()}
    assert got_raw == {"c": 3.0, "l1": 0.0, "l2": 0.0, "l3": 0.0}
    scaled = betweenness_centrality(
        edges, sources=leaves, direction="BOTH", rescale=True
    )
    got = {r["key"]: r["centrality"] for r in scaled.scores.join(nodes, "id").collect()}
    assert abs(got["c"] - 3.0 * 4 / 3) < 1e-9


def test_weighted_apsp_batched_matches_per_source(spark):
    """ms_relax_distances (one batched job per round) must equal the
    per-source sssp fixpoint."""
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    out = all_shortest_paths_stream(edges, weighted=True, direction="OUTGOING")
    got = {(r["source"], r["target"]): r["distance"] for r in out.collect()}
    expect = {}
    for row in nodes.collect():
        s = row["id"]
        for r in sssp(edges, s, weighted=True).distances.collect():
            if r["id"] != s:
                expect[(s, r["id"])] = r["dist"]
    assert got == expect


def test_mst_start_node_contract(spark):
    """Prim-contract wrapper: tree of the start node's component only."""
    from linkgraph import minimum_spanning_tree
    # two components: square a-b-c-d (weights 1,2,3,4 -> tree 1+2+3)
    # and pair x-y (weight 9)
    nodes, edges = edges_from_pairs(spark, [
        ("a", "b", 1.0), ("b", "c", 2.0), ("c", "d", 3.0), ("d", "a", 4.0),
        ("x", "y", 9.0),
    ])
    ids = {r["key"]: r["id"] for r in nodes.collect()}
    res = minimum_spanning_tree(edges, ids["a"])
    assert res.edge_count == 3 and res.total_weight == 6.0
    res2 = minimum_spanning_tree(edges, ids["x"])
    assert res2.edge_count == 1 and res2.total_weight == 9.0


def test_shortest_path_pair_golden(spark):
    """Reference algo.shortestPath(start, end): path rows + total cost
    on the classic Dijkstra fixture (unique path 0-2-1-3-4, cost 7)."""
    from linkgraph import shortest_path_pair
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    ids = {r["key"]: r["id"] for r in nodes.collect()}
    path, cost = shortest_path_pair(edges, ids["0"], ids["4"])
    assert cost == 7.0
    rows = sorted(path.collect(), key=lambda r: r["step"])
    key_of = {v: k for k, v in ids.items()}
    assert [key_of[r["id"]] for r in rows] == ["0", "2", "1", "3", "4"]
    assert [r["cost"] for r in rows] == [0.0, 1.0, 3.0, 4.0, 7.0]
    # unreachable target -> empty path, None cost
    p2, c2 = shortest_path_pair(edges, ids["4"], ids["0"])
    assert c2 is None and p2.count() == 0


def test_termination_flag_stops_loop_resumably(spark, tmp_path):
    from linkgraph import TerminatedError, TerminationFlag, pagerank
    import pytest as _pytest
    nodes, edges = edges_from_pairs(spark, W_EDGES)
    flag = TerminationFlag()
    flag.set()
    with _pytest.raises(TerminatedError):
        pagerank(edges, max_iter=5, termination=flag,
                 checkpoint_dir=str(tmp_path / "ck"))


def test_betweenness_frees_cached_state(spark):
    """Forward levels and superseded seen/delta checkpoints must be
    freed as the backward sweep consumes them — exact mode at 100x
    otherwise pins O(depth * reached) cached rows (round-1 finding)."""
    from linkgraph.betweenness import betweenness_centrality
    sc = spark.sparkContext
    spark.catalog.clearCache()
    before = len(sc._jsc.getPersistentRDDs())
    nodes, edges = edges_from_pairs(
        spark, [(str(i), str(i + 1)) for i in range(12)]  # 13-node path
    )
    res = betweenness_centrality(edges, direction="BOTH")
    res.scores.count()
    after = len(sc._jsc.getPersistentRDDs())
    # allowed residue: the acc checkpoint that scores derive from, the
    # node-universe persist, and the fixture's own persisted nodes df —
    # NOT the ~13 forward levels + 13 seen/delta chains the old code kept
    assert after - before <= 5, f"leaked {after - before} cached RDDs"


def test_harmonic_centrality_golden(spark):
    """Path a-b-c plus disconnected pair d-e (harmonic is defined on
    disconnected graphs — the reason the lineage added it):
    h(a)=1+1/2, h(b)=2, h(d)=1; normalized divides by n-1=4."""
    from linkgraph import harmonic_centrality

    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    got = {
        r["key"]: (r["reached"], r["harmonic"], r["normalized"])
        for r in harmonic_centrality(edges, direction="BOTH").join(nodes, "id").collect()
    }
    assert got["a"] == (2, 1.5, 1.5 / 4)
    assert got["b"] == (2, 2.0, 2.0 / 4)
    assert got["c"] == (2, 1.5, 1.5 / 4)
    assert got["d"] == (1, 1.0, 1.0 / 4)
    assert got["e"] == (1, 1.0, 1.0 / 4)


def test_sampled_closeness_full_sources_equals_exact(spark):
    """Sampled estimator with S = all nodes reduces to exact closeness
    (scale n/|S| = 1): same farness/reached/closeness per node."""
    from linkgraph import closeness_centrality

    nodes, edges = edges_from_pairs(
        spark, [("a", "b"), ("b", "c"), ("c", "d"), ("b", "d")]
    )
    exact = {
        r["id"]: (r["farness"], r["reached"], round(r["closeness"], 9))
        for r in closeness_centrality(edges, direction="BOTH").collect()
    }
    allsrc = nodes.select("id")
    sampled = {
        r["id"]: (r["farness"], r["reached"], round(r["closeness"], 9))
        for r in closeness_centrality(
            edges, direction="BOTH", sources=allsrc
        ).collect()
    }
    assert exact == sampled


def test_sampled_harmonic_full_sources_equals_exact(spark):
    from linkgraph import harmonic_centrality

    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("d", "e")])
    exact = {
        r["id"]: (r["reached"], round(r["harmonic"], 9), round(r["normalized"], 9))
        for r in harmonic_centrality(edges, direction="BOTH").collect()
    }
    sampled = {
        r["id"]: (r["reached"], round(r["harmonic"], 9), round(r["normalized"], 9))
        for r in harmonic_centrality(
            edges, direction="BOTH", sources=nodes.select("id")
        ).collect()
    }
    assert exact == sampled


def test_sampled_closeness_scale_factor(spark):
    """Path a-b-c with S={a}: scale = 3/1; farness_hat(b) = 3 * d(b,a)
    = 3, closeness(b) = 2/3."""
    from linkgraph import closeness_centrality

    nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c")])
    src = nodes.filter(F.col("key") == "a").select("id")
    got = {
        r["key"]: (r["farness"], r["reached"], round(r["closeness"], 9))
        for r in closeness_centrality(edges, direction="BOTH", sources=src)
        .join(nodes, "id").collect()
    }
    assert got["a"] == (0.0, 0, 0.0)  # only own 0-distance sampled
    assert got["b"] == (3.0, 1, round(2.0 / 3.0, 9))
    assert got["c"] == (6.0, 1, round(2.0 / 6.0, 9))


def test_exact_mode_warns_above_gate(spark):
    """closeness / harmonic / weighted-APSP share betweenness's
    exact-mode gate: sources=None over more than exact_warn_nodes
    nodes emits the O(n^2)-state warning."""
    import warnings as w

    import pytest

    from linkgraph import (
        all_shortest_paths_stream,
        closeness_centrality,
        harmonic_centrality,
    )

    _nodes, edges = edges_from_pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.warns(UserWarning, match="sources="):
        closeness_centrality(edges, exact_warn_nodes=2)
    with pytest.warns(UserWarning, match="sources="):
        harmonic_centrality(edges, exact_warn_nodes=2)
    with pytest.warns(UserWarning, match="sources="):
        all_shortest_paths_stream(edges, weighted=True, exact_warn_nodes=2)
    # sampled mode must NOT warn
    with w.catch_warnings():
        w.simplefilter("error")
        closeness_centrality(
            edges, sources=edges.select(F.col("src").alias("id")).distinct(),
            exact_warn_nodes=2,
        ).count()


def test_path_reconstruction_pointer_doubling_rounds(spark):
    """Reconstruction of a 32-edge pred chain takes O(log L) doubling
    rounds (7 for L=32), not one round per hop."""
    import math

    from linkgraph.paths import _reconstruct_path

    rows = [(i, float(i), i - 1 if i > 0 else None) for i in range(33)]
    dist = spark.createDataFrame(rows, "id long, dist double, pred long")
    path, total, rounds = _reconstruct_path(dist, 32)
    assert total == 32.0
    assert [p[0] for p in path] == list(range(33))  # steps source->target
    assert [p[1] for p in path] == list(range(33))  # chain ids in order
    assert rounds <= math.ceil(math.log2(34)) + 1, rounds

    # unreachable target: no distance row
    none_path, none_total, _ = _reconstruct_path(dist, 999)
    assert none_path is None and none_total is None


def test_pair_bidirectional_fewer_rounds_on_chain(spark):
    """Bidirectional search stops at the meet instead of relaxing to
    global convergence: on a 24-edge chain with the target mid-chain
    (d(s,t) = 12 edges) the unidirectional path runs 24(+1) rounds
    (source eccentricity), the bidirectional one ~12-14 total. The
    path and cost are identical (unique-path fixture)."""
    from linkgraph import shortest_path_pair
    from linkgraph.paths import _pair_bidirectional

    chain = [(f"c{i:02d}", f"c{i + 1:02d}", float(1 + (i % 3))) for i in range(24)]
    nodes, edges = edges_from_pairs(spark, chain)
    ids = {r["key"]: r["id"] for r in nodes.collect()}
    s, t = ids["c00"], ids["c12"]

    uni_path, uni_cost = shortest_path_pair(
        edges, s, t, weighted=True, direction="OUTGOING", bidirectional=False
    )
    bi_path, bi_cost = shortest_path_pair(
        edges, s, t, weighted=True, direction="OUTGOING"
    )
    assert bi_cost == uni_cost
    assert [tuple(r) for r in bi_path.collect()] == [tuple(r) for r in uni_path.collect()]
    stats = _pair_bidirectional.last_stats
    # d(s,t) = 12 edges: the meet needs F+B >= 12; termination follows
    # within a couple of rounds — far under the 24(+1) rounds the
    # unidirectional relax pays to drain the frontier past the target
    assert stats["rounds_total"] <= 16, stats
    assert stats["rounds_forward"] >= 2 and stats["rounds_backward"] >= 2, stats


def test_pair_bidirectional_unreachable_and_trivial(spark):
    """Disconnected pair returns (empty path, None); source == target
    returns the single-row zero-cost path."""
    from linkgraph import shortest_path_pair

    pairs = [("a", "b"), ("x", "y")]
    nodes, edges = edges_from_pairs(spark, pairs)
    ids = {r["key"]: r["id"] for r in nodes.collect()}
    path, cost = shortest_path_pair(edges, ids["a"], ids["x"])
    assert cost is None and path.count() == 0
    path2, cost2 = shortest_path_pair(edges, ids["a"], ids["a"])
    assert cost2 == 0.0
    assert [tuple(r) for r in path2.collect()] == [(0, ids["a"], 0.0)]


def test_dangalchev_golden_and_domain(spark):
    import pytest as _pt

    from linkgraph.paths import dangalchev_centrality

    # path 1-2-3 undirected: c(2) = 2*(1/2) = 1.0; c(1) = 1/2 + 1/4
    e = spark.createDataFrame([(1, 2, 1.0), (2, 3, 1.0)],
                              "src long, dst long, weight double")
    got = {r.id: (r.reached, r.dangalchev)
           for r in dangalchev_centrality(e, direction="BOTH").collect()}
    assert got[2] == (2, 1.0)
    assert got[1] == (2, 0.75)
    assert got[3] == (2, 0.75)
    with _pt.raises(ValueError, match="62"):
        dangalchev_centrality(e, max_hops=63)


def test_closeness_wf_disconnected(spark):
    import pytest as _pt

    # K2 {a,b} plus path c-d-e-f-g (n=7).  Raw closeness rewards the
    # tiny component (a: farness 1 -> (n-1)/1 = 6.0, the global max);
    # WF scales by reached/(n-1) so the path's center e (reached 4,
    # farness 6) outranks a: WF(e) = 16/36 = 0.444 > WF(a) = 1/6.
    nodes, edges = edges_from_pairs(
        spark, [("a", "b"), ("c", "d"), ("d", "e"), ("e", "f"), ("f", "g")]
    )
    raw = {
        r["key"]: (r["reached"], r["closeness"])
        for r in closeness_centrality(edges, direction="BOTH")
        .join(nodes, "id").collect()
    }
    wf = {
        r["key"]: (r["reached"], r["closeness"])
        for r in closeness_centrality(edges, direction="BOTH", wf=True)
        .join(nodes, "id").collect()
    }
    assert raw["a"] == (1, 6.0)                      # raw: K2 wins
    assert raw["e"][1] == np.float64(1.0)            # (7-1)/6
    assert wf["a"] == (1, 1 / 6)
    assert np.isclose(wf["e"][1], 16 / 36)
    assert wf["e"][1] > wf["a"][1]                   # WF flips the order
    # connected graph: WF == raw * reached/(n-1) == raw (all reached)
    nodes2, edges2 = edges_from_pairs(spark, [("a", "b"), ("b", "c")])
    r0 = {r["key"]: r["closeness"] for r in
          closeness_centrality(edges2, direction="BOTH").join(nodes2, "id").collect()}
    r1 = {r["key"]: r["closeness"] for r in
          closeness_centrality(edges2, direction="BOTH", wf=True).join(nodes2, "id").collect()}
    assert r0 == r1
    # sampled + wf is a contract violation
    with _pt.raises(ValueError, match="exact-mode only"):
        closeness_centrality(
            edges, direction="BOTH", wf=True,
            sources=edges.select(F.col("src").alias("id")).limit(1),
        )


def test_landmark_estimate_upper_bound_and_exactness(spark):
    import random as _random

    from linkgraph.paths import landmark_estimate, landmark_index

    rng = _random.Random(61)
    pairs_e = [(a, b) for a, b in {(rng.randrange(14), rng.randrange(14)) for _ in range(35)} if a != b]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs_e], "src long, dst long, weight double"
    )
    true_d = {
        (r.source, r.id): r.dist
        for r in ms_bfs_distances(e, direction="BOTH", max_hops=14).collect()
    }
    nodes = sorted({x for p in pairs_e for x in p})
    lms = spark.createDataFrame([(n,) for n in nodes if n % 3 == 0], "id long")
    idx = landmark_index(e, lms, direction="BOTH", max_hops=14)
    qp = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], "src long, dst long"
    )
    est = {(r.src, r.dst): (r.d_est, r.via) for r in landmark_estimate(idx, qp).collect()}
    for (s, t), (d_est, via) in est.items():
        assert d_est >= true_d[(s, t)], (s, t)          # admissible upper bound
        assert true_d[(s, via)] + true_d[(via, t)] == d_est
    # a landmark IS exact for pairs through it: query (l, x) pairs
    for (s, t), (d_est, _) in est.items():
        if s % 3 == 0 or t % 3 == 0:                    # endpoint is a landmark
            assert d_est == true_d[(s, t)], (s, t)


def test_landmark_index_directed_orientations(spark):
    from linkgraph.paths import landmark_index

    # directed chain 1 -> 2 -> 3; landmark {2}: d_to(1,2)=1 (1->2),
    # d_from(2,3)=1 (2->3); 3 cannot reach 2 (d_to null), 2 cannot
    # reach 1 (d_from null)
    e = spark.createDataFrame([(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double")
    lms = spark.createDataFrame([(2,)], "id long")
    idx = {r.id: (r.d_to, r.d_from) for r in
           landmark_index(e, lms, direction="OUTGOING", max_hops=5).collect()}
    assert idx[2] == (0, 0)
    assert idx[1] == (1, None)
    assert idx[3] == (None, 1)


def test_eccentricity_and_diameter(spark):
    # path a-b-c-d: ecc = 3,2,2,3; diameter 3, radius 2,
    # peripheral {a,d}, central {b,c}
    nodes, edges = edges_from_pairs(
        spark, [("a", "b"), ("b", "c"), ("c", "d")]
    )
    from linkgraph.paths import eccentricity, graph_diameter

    got = {
        r["key"]: (r["ecc"], r["reached"])
        for r in eccentricity(edges, direction="BOTH").join(nodes, "id").collect()
    }
    assert got == {"a": (3, 3), "b": (2, 3), "c": (2, 3), "d": (3, 3)}
    row = graph_diameter(edges, direction="BOTH").first()
    assert (row.diameter, row.radius, row.n_peripheral, row.n_central) == (3, 2, 2, 2)
    # max_hops clamps the metric (hop-bounded contract)
    row = graph_diameter(edges, direction="BOTH", max_hops=2).first()
    assert (row.diameter, row.radius) == (2, 2)
    # disconnected: per-component fold (K2 + isolated pair)
    _, e2 = edges_from_pairs(spark, [("a", "b"), ("x", "y")])
    row = graph_diameter(e2, direction="BOTH").first()
    assert (row.diameter, row.radius, row.n_peripheral, row.n_central) == (1, 1, 4, 4)
