"""Edge betweenness (Girvan-Newman scores) vs a pure-python Brandes."""

import random
from collections import deque

import pytest

from linkgraph.betweenness import edge_betweenness


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _brute_edge_bc(pairs):
    """Textbook Brandes with edge accumulation, undirected, 0.5 scale."""
    adj = {}
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    bc = {e: 0.0 for e in und}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v, -2) == dist[w] - 1:
                    c = sigma[v] / sigma[w] * (1.0 + delta[w])
                    bc[(min(v, w), max(v, w))] += c
                    delta[v] += c
    return {e: 0.5 * v for e, v in bc.items()}


def test_path_graph_golden(spark):
    # P4: 0-1-2-3; middle edge carries the most pairs
    res = edge_betweenness(_edges(spark, [(0, 1), (1, 2), (2, 3)]))
    got = {(r.src, r.dst): r.centrality for r in res.scores.collect()}
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_star_graph_golden(spark):
    # K1,3: every spoke carries its leaf's pairs to the other 2 leaves
    res = edge_betweenness(_edges(spark, [(0, 1), (0, 2), (0, 3)]))
    got = {(r.src, r.dst): r.centrality for r in res.scores.collect()}
    assert got == {(0, 1): 3.0, (0, 2): 3.0, (0, 3): 3.0}


@pytest.mark.parametrize("seed", [1, 2])
def test_random_graph_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    pairs = []
    for _ in range(20):
        a, b = rng.randrange(10), rng.randrange(10)
        if a != b:
            pairs.append((a, b))
    want = _brute_edge_bc(pairs)
    res = edge_betweenness(_edges(spark, pairs))
    got = {(r.src, r.dst): r.centrality for r in res.scores.collect()}
    assert set(got) == set(want)
    for e in want:
        assert abs(got[e] - want[e]) < 1e-9, (e, got[e], want[e])


def test_sampled_sources_unbiased_form(spark):
    # sampling ALL nodes as explicit sources must equal exact mode
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    e = _edges(spark, pairs)
    exact = {
        (r.src, r.dst): r.centrality
        for r in edge_betweenness(e).scores.collect()
    }
    nodes = spark.createDataFrame([(i,) for i in range(4)], "id long")
    sampled = {
        (r.src, r.dst): r.centrality
        for r in edge_betweenness(e, sources=nodes).scores.collect()
    }
    assert exact.keys() == sampled.keys()
    for k in exact:
        assert abs(exact[k] - sampled[k]) < 1e-9


def test_directed_mode(spark):
    # directed path 0->1->2: arc (0,1) on paths 0->1, 0->2; arc (1,2)
    # on 1->2, 0->2
    res = edge_betweenness(_edges(spark, [(0, 1), (1, 2)]), direction="OUTGOING")
    got = {(r.src, r.dst): r.centrality for r in res.scores.collect()}
    assert got == {(0, 1): 2.0, (1, 2): 2.0}


def test_girvan_newman_splits_barbell(spark):
    from linkgraph.betweenness import girvan_newman_split

    # two triangles joined by one edge: cutting the top-1 edge (the
    # bridge carries all cross pairs) splits into the two triangles
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    got = {
        r.id: r.comp
        for r in girvan_newman_split(_edges(spark, pairs), k=1).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_girvan_newman_isolates_become_singletons(spark):
    from linkgraph.betweenness import girvan_newman_split

    # path 0-1: cutting its only edge isolates both endpoints
    got = {
        r.id: r.comp
        for r in girvan_newman_split(_edges(spark, [(0, 1)]), k=1).collect()
    }
    assert got == {0: 0, 1: 1}
