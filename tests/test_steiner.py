"""Steiner backbone tests: path golden, KMB python replication, the
2-approx bound vs brute-force optimum, disconnected terminals, the
DuckDB twin, and validation."""

import heapq
import itertools
import random

import pytest

from linkgraph.mst import steiner_backbone, steiner_backbone_sql


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def _values_sql(rows):
    vals = ", ".join(f"({a}, {b}, {w})" for a, b, w in rows)
    return f"SELECT * FROM (VALUES {vals}) AS t(src, dst, weight)"


def _collect(res):
    return sorted(tuple(r) for r in res.backbone.collect())


def _dijkstra(adj, s):
    dist = {s: 0.0}
    pq = [(0.0, s)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def _adj(rows):
    adj = {}
    for a, b, w in rows:
        if a == b:
            continue
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    return adj


def _brute_kmb(rows, terminals):
    """Independent KMB steps 1-3: dijkstra closure + canonical kruskal."""
    adj = _adj(rows)
    closure = []
    for t1, t2 in itertools.combinations(sorted(terminals), 2):
        d = _dijkstra(adj, t1).get(t2)
        if d is not None:
            closure.append((d, t1, t2))
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    tree = []
    for w, a, b in sorted(closure):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            tree.append((a, b, round(w, 6)))
    return sorted(tree)


def test_path_golden(spark):
    rows = [(i, i + 1, 1.0) for i in range(4)]
    res = steiner_backbone(_edges(spark, rows), [0, 2, 4], max_hops=6)
    assert _collect(res) == [(0, 2, 2.0), (2, 4, 2.0)]
    assert res.total_weight == pytest.approx(4.0)


def test_random_vs_brute_kmb(spark):
    rng = random.Random(17)
    rows = [(a, b, float(rng.randrange(1, 10)))
            for a, b in {(rng.randrange(13), rng.randrange(13))
                         for _ in range(40)} if a != b]
    T = sorted({a for a, _, _ in rows})[:5]
    res = steiner_backbone(_edges(spark, rows), T, max_hops=12)
    assert _collect(res) == _brute_kmb(rows, T)


def _brute_optimal_steiner(rows, terminals):
    """Exact optimum on tiny graphs: min spanning-tree weight of the
    cheapest connected induced supergraph of the terminals."""
    adj = _adj(rows)
    nodes = sorted(adj)
    extra = [n for n in nodes if n not in terminals]
    best = float("inf")
    for r in range(len(extra) + 1):
        for S in itertools.combinations(extra, r):
            keep = set(terminals) | set(S)
            sub = [(w, a, b) for a, b, w in rows
                   if a in keep and b in keep and a != b]
            parent = {}

            def find(x):
                parent.setdefault(x, x)
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            tot, joined = 0.0, 0
            for w, a, b in sorted(sub):
                if find(a) != find(b):
                    parent[find(a)] = find(b)
                    tot += w
                    joined += 1
            roots = {find(t) for t in terminals}
            if len(roots) == 1 and tot < best:
                best = tot
    return best


def test_two_approx_bound(spark):
    rng = random.Random(29)
    rows = [(a, b, float(rng.randrange(1, 8)))
            for a, b in {(rng.randrange(9), rng.randrange(9))
                         for _ in range(26)} if a != b]
    T = sorted({a for a, _, _ in rows})[:4]
    res = steiner_backbone(_edges(spark, rows), T, max_hops=10)
    opt = _brute_optimal_steiner(rows, T)
    assert opt < float("inf")
    assert res.total_weight <= 2 * opt + 1e-9
    assert res.total_weight >= opt - 1e-9


def test_disconnected_terminals_give_forest(spark):
    rows = [(0, 1, 1.0), (1, 2, 1.0), (5, 6, 1.0)]
    res = steiner_backbone(_edges(spark, rows), [0, 2, 5, 6], max_hops=6)
    got = _collect(res)
    # (0,2) reachable at dist 2; (5,6) at 1; no cross edges
    assert got == [(0, 2, 2.0), (5, 6, 1.0)]


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(41)
    rows = [(a, b, float(rng.randrange(1, 9)))
            for a, b in {(rng.randrange(11), rng.randrange(11))
                         for _ in range(36)} if a != b]
    T = sorted({a for a, _, _ in rows})[:4]
    res = steiner_backbone(_edges(spark, rows), T, max_hops=8)
    got = _collect(res)
    duck = duckdb.connect().execute(
        steiner_backbone_sql(_values_sql(rows), T, max_hops=8)
    ).fetchall()
    assert got == sorted(duck)


def test_validates_arguments(spark):
    e = _edges(spark, [(0, 1, 1.0)])
    with pytest.raises(ValueError, match=">= 2 terminals"):
        steiner_backbone(e, [0])
    with pytest.raises(ValueError, match="distinct"):
        steiner_backbone(e, [0, 0])
