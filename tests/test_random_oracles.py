"""Randomized cross-validation: seeded random graphs checked against
INDEPENDENT pure-python oracles (union-find, Kosaraju, brute triangle
enumeration, Kruskal, numpy power iteration) — none shares code with
the engine paths it checks. Complements the hand-derived fixtures
(reference-test parity) with adversarial structure the fixtures don't
have: random digraphs with cycles, self-parallel edges, zero weights,
equal-cost path ties.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph import (
    connected_components,
    minimum_spanning_forest,
    pagerank,
    shortest_path_pair,
    strongly_connected_components,
    triangle_count,
)


def _random_edges(spark, seed, n_nodes=40, n_edges=120, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    w = np.round(rng.uniform(0.0, 4.0, n_edges), 2) if weighted else np.ones(n_edges)
    rows = [
        (int(s), int(d), float(x)) for s, d, x in zip(src, dst, w) if s != d
    ]
    return rows, spark.createDataFrame(rows, "src long, dst long, weight double")


# ------------------------------------------------------------- WCC

def _py_union_find(rows, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d, _ in rows:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # canonical: min member id per set
    comp = {}
    for v in {x for r in rows for x in r[:2]}:
        comp.setdefault(find(v), []).append(v)
    return {v: min(ms) for ms in comp.values() for v in ms}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_wcc_random_vs_union_find(spark, seed):
    rows, edges = _random_edges(spark, seed)
    want = _py_union_find(rows, 40)
    for kwargs in ({}, {"algorithm": "star"}, {"frontier": False}, {"hub_cap": 3}):
        got = {
            r["id"]: r["comp"]
            for r in connected_components(edges, **kwargs).components.collect()
        }
        assert got == want, kwargs


# ------------------------------------------------------------- SCC

def _py_kosaraju(rows):
    nodes = sorted({x for r in rows for x in r[:2]})
    adj, radj = {v: [] for v in nodes}, {v: [] for v in nodes}
    for s, d, _ in rows:
        adj[s].append(d)
        radj[d].append(s)
    order, seen = [], set()
    for v in nodes:
        if v in seen:
            continue
        stack = [(v, iter(adj[v]))]
        seen.add(v)
        while stack:
            u, it = stack[-1]
            adv = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(adj[w])))
                    adv = True
                    break
            if not adv:
                order.append(u)
                stack.pop()
    comp, assigned = {}, set()
    for v in reversed(order):
        if v in assigned:
            continue
        members, stack = [], [v]
        assigned.add(v)
        while stack:
            u = stack.pop()
            members.append(u)
            for w in radj[u]:
                if w not in assigned:
                    assigned.add(w)
                    stack.append(w)
        m = min(members)
        for u in members:
            comp[u] = m
    return comp


@pytest.mark.parametrize("seed", [4, 5])
def test_scc_random_vs_kosaraju(spark, seed):
    rows, edges = _random_edges(spark, seed, n_nodes=25, n_edges=60)
    want = _py_kosaraju(rows)
    for lt in (0, 500_000):  # distributed FW-BW AND driver-Tarjan path
        got = {
            r["id"]: r["scc"]
            for r in strongly_connected_components(
                edges, local_threshold=lt
            ).components.collect()
        }
        assert got == want, f"local_threshold={lt}"


# -------------------------------------------------------- triangles

@pytest.mark.parametrize("seed", [6, 7])
def test_triangles_random_vs_brute(spark, seed):
    rows, edges = _random_edges(spark, seed, n_nodes=20, n_edges=80)
    und = {frozenset(r[:2]) for r in rows}
    adj = {}
    for e in und:
        a, b = sorted(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tris = {
        (a, b, c)
        for i, a in enumerate(nodes)
        for b in sorted(adj[a])
        if b > a
        for c in sorted(adj[a] & adj[b])
        if c > b
    }
    res = triangle_count(edges)
    assert res.triangle_count == len(tris)
    got = {tuple(r) for r in res.triangles.collect()}
    assert got == tris
    res.release()


# -------------------------------------------------------------- MST

def _py_kruskal_weight(rows):
    best = {}
    for s, d, w in rows:
        k = frozenset((s, d))
        if k not in best or w < best[k]:
            best[k] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    total = n = 0
    for k, w in sorted(best.items(), key=lambda kv: (kv[1], sorted(kv[0]))):
        a, b = sorted(k)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            total += w
            n += 1
    return round(total, 6), n


@pytest.mark.parametrize("seed", [8, 9])
def test_mst_random_vs_kruskal(spark, seed):
    rows, edges = _random_edges(spark, seed, n_nodes=25, n_edges=70, weighted=True)
    want_total, want_n = _py_kruskal_weight(rows)
    res = minimum_spanning_forest(edges)
    assert res.edge_count == want_n
    assert round(res.total_weight, 6) == want_total


def _py_kspan_clusters(rows, k, mode="kmin"):
    """Canonical-Kruskal forest under the strict (weight, src, dst)
    total order (kmax: (-weight, src, dst)), cut the k-1 edges largest
    (kmin) / smallest (kmax) in that order, return the cluster sets —
    the same determinism contract linkgraph.mst.k_spanning_tree states."""
    best = {}
    for s, d, w in rows:
        a, b = min(s, d), max(s, d)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent.setdefault(parent[x], parent[x])
            x = parent[x]
        return x

    sign = 1 if mode == "kmin" else -1
    tree = []
    for (a, b), w in sorted(best.items(), key=lambda kv: (sign * kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
            tree.append((w, a, b))
    # engine cut order: kmin removes the lexicographically largest
    # (w, src, dst) tuples, kmax the smallest
    ordered = sorted(tree, key=lambda t: (t[0], t[1], t[2]), reverse=(mode == "kmin"))
    cut = {(a, b) for w, a, b in ordered[: k - 1]}
    parent.clear()
    nodes = {x for a, b in best for x in (a, b)}
    for w, a, b in tree:
        if (a, b) not in cut:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    byroot = {}
    for v in nodes:
        byroot.setdefault(find(v), set()).add(v)
    return {frozenset(s) for s in byroot.values()}


@pytest.mark.parametrize("seed,k,mode", [(21, 3, "kmin"), (22, 5, "kmin"), (23, 3, "kmax")])
def test_k_spanning_random_vs_python(spark, seed, k, mode):
    from linkgraph import k_spanning_tree

    rows, edges = _random_edges(spark, seed, n_nodes=20, n_edges=45, weighted=True)
    want = _py_kspan_clusters(rows, k, mode)
    res = k_spanning_tree(edges, k=k, mode=mode)
    byc = {}
    for r in res.assignment.collect():
        byc.setdefault(r["cluster"], set()).add(r["id"])
    assert {frozenset(s) for s in byc.values()} == want


# --------------------------------------------------------- pagerank

@pytest.mark.parametrize("seed", [10])
def test_pagerank_random_vs_numpy_power_iteration(spark, seed):
    rows, _ = _random_edges(spark, seed, n_nodes=30, n_edges=90)
    # distinct edges: the numpy oracle models simple-graph adjacency
    rows = sorted({(s, d) for s, d, _ in rows})
    rows = [(s, d, 1.0) for s, d in rows]
    n = 30
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    nodes_df = spark.createDataFrame([(i,) for i in range(n)], "id long")
    out = {}
    for s, d, _ in rows:
        out.setdefault(s, set()).add(d)
    out = {k: sorted(v) for k, v in out.items()}
    deg = {k: len(v) for k, v in out.items()}
    # reference semantics: non-normalized fixed point,
    # pr = (1-d) + d * sum(pr[u]/outdeg[u])
    pr = np.full(n, 1.0 - 0.85)
    for _ in range(30):
        nxt = np.full(n, 1.0 - 0.85)
        for u, vs in out.items():
            share = 0.85 * pr[u] / deg[u]
            for v in vs:
                nxt[v] += share
        pr = nxt
    got = {
        r["id"]: r["rank"]
        for r in pagerank(
            edges, nodes=nodes_df, damping=0.85, max_iter=30
        ).scores.collect()
    }
    for i in range(n):
        assert np.isclose(got[i], pr[i], atol=1e-9), (i, got[i], pr[i])


# -------------------------------------- bidirectional pair search

@pytest.mark.parametrize("seed", [11, 12, 13])
def test_pair_bidirectional_random_equals_unidirectional(spark, seed):
    """The mu <= minf + minb termination bound must be exact on random
    weighted digraphs — including zero-weight edges and equal-cost
    ties, the adversarial cases for early-stopping proofs. Compares
    total cost (path choice may differ among equal-cost paths)."""
    rng = np.random.default_rng(seed)
    n_nodes = 18
    src = rng.integers(0, n_nodes, 60)
    dst = rng.integers(0, n_nodes, 60)
    w = np.round(rng.uniform(0.0, 3.0, 60), 1)  # zero weights possible
    rows = [(int(s), int(d), float(x)) for s, d, x in zip(src, dst, w) if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    pairs = rng.integers(0, n_nodes, (3, 2))
    for s, t in pairs:
        s, t = int(s), int(t)
        _p1, c_uni = shortest_path_pair(
            edges, s, t, weighted=True, bidirectional=False
        )
        _p2, c_bi = shortest_path_pair(edges, s, t, weighted=True)
        if c_uni is None:
            assert c_bi is None, (s, t, c_bi)
        else:
            assert c_bi is not None and np.isclose(c_bi, c_uni, atol=1e-9), (
                s, t, c_uni, c_bi,
            )


# ------------------------------------------------------ betweenness

def _py_brandes(rows, directed_both=True):
    """Textbook Brandes (unweighted BFS) with BOTH-direction halving —
    independent of the engine's level-synchronous formulation."""
    from collections import deque

    nodes = sorted({x for r in rows for x in r[:2]})
    adj = {v: set() for v in nodes}
    for s, d, _ in rows:
        adj[s].add(d)
        adj[d].add(s)
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        sigma = {v: 0.0 for v in nodes}
        dist = {v: -1 for v in nodes}
        preds = {v: [] for v in nodes}
        sigma[s], dist[s] = 1.0, 0
        order, q = [], deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in sorted(adj[v]):
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in nodes}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: bc[v] / 2.0 for v in nodes}  # BOTH counts each pair twice


@pytest.mark.parametrize("seed", [14, 15])
def test_betweenness_random_vs_python_brandes(spark, seed):
    rows, edges = _random_edges(spark, seed, n_nodes=14, n_edges=30)
    from linkgraph.betweenness import betweenness_centrality

    want = _py_brandes(rows)
    got = {
        r["id"]: r["centrality"]
        for r in betweenness_centrality(edges, direction="BOTH").scores.collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert np.isclose(got[k], want[k], atol=1e-9), (k, got[k], want[k])


# ----------------------------------------------- closeness/harmonic

def _py_bfs_dists(rows, s):
    from collections import deque

    adj = {}
    for a, b, _ in rows:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist, q = {s: 0}, deque([s])
    while q:
        v = q.popleft()
        for w in adj.get(v, ()):
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    return dist


@pytest.mark.parametrize("seed", [16])
def test_closeness_harmonic_random_vs_python_bfs(spark, seed):
    rows, edges = _random_edges(spark, seed, n_nodes=16, n_edges=34)
    from linkgraph.paths import closeness_centrality, harmonic_centrality

    nodes = sorted({x for r in rows for x in r[:2]})
    n = len(nodes)
    want = {}
    for v in nodes:
        dist = _py_bfs_dists(rows, v)
        far = float(sum(dist.values()))
        reach = len(dist) - 1
        harm = sum(1.0 / d for d in dist.values() if d > 0)
        # engine contracts: closeness = (n-1)/farness (0 if farness 0);
        # harmonic raw sum + normalized = harmonic/(n-1)
        want[v] = (
            far, reach, ((n - 1) / far) if far > 0 else 0.0, harm, harm / (n - 1)
        )
    got_c = {
        r["id"]: (r["farness"], r["reached"], r["closeness"])
        for r in closeness_centrality(edges, direction="BOTH").collect()
    }
    got_h = {
        r["id"]: (r["reached"], r["harmonic"], r["normalized"])
        for r in harmonic_centrality(edges, direction="BOTH").collect()
    }
    for v in nodes:
        far, reach, clo, harm, norm = want[v]
        assert got_c[v][1] == reach, (v, got_c[v], reach)
        assert np.isclose(got_c[v][0], far, atol=1e-9), (v, got_c[v], far)
        assert np.isclose(got_c[v][2], clo, atol=1e-9), (v, got_c[v], clo)
        assert got_h[v][0] == reach
        assert np.isclose(got_h[v][1], harm, atol=1e-9), (v, got_h[v], harm)
        assert np.isclose(got_h[v][2], norm, atol=1e-9), (v, got_h[v], norm)


# ------------------------------------------------ delta vs BF SSSP

@pytest.mark.parametrize("seed", [17, 18])
def test_delta_stepping_random_equals_sssp(spark, seed):
    """Two independent engine paths (bucketed delta-stepping vs plain
    Bellman-Ford relax) must agree exactly on random weighted graphs."""
    from linkgraph import sssp, sssp_delta_stepping

    rows, edges = _random_edges(spark, seed, n_nodes=16, n_edges=40, weighted=True)
    src = min(x for r in rows for x in r[:2])
    a = {
        (r["id"], round(r["dist"], 9))
        for r in sssp(edges, src, weighted=True).distances.collect()
    }
    b = {
        (r["id"], round(r["dist"], 9))
        for r in sssp_delta_stepping(edges, src, delta=1.0).distances.collect()
    }
    assert a == b


# ------------------------------------------------------------------ LPA

def _py_lpa(rows, iters, direction="BOTH"):
    """Synchronous LPA replica: votes[label(nbr)] += w, argmax with
    (vote desc, label asc) tie-break, simultaneous update — the
    engine's documented contract (linkgraph/labelprop.py)."""
    pairs = []
    for s, d, w in rows:
        if direction in ("OUTGOING", "BOTH"):
            pairs.append((s, d, w))
        if direction in ("INCOMING", "BOTH"):
            pairs.append((d, s, w))
    nodes = sorted({x for r in rows for x in r[:2]})
    label = {v: v for v in nodes}
    for _ in range(iters):
        votes = {}
        for n, nb, w in pairs:
            votes.setdefault(n, {})
            lab = label[nb]
            votes[n][lab] = votes[n].get(lab, 0.0) + w
        label = {
            v: (max(votes[v].items(), key=lambda kv: (kv[1], -kv[0]))[0]
                if v in votes else label[v])
            for v in nodes
        }
    return label


@pytest.mark.parametrize("seed,direction", [(24, "BOTH"), (25, "OUTGOING")])
def test_lpa_random_vs_python(spark, seed, direction):
    """Integer-valued weights keep every vote sum IEEE-exact (sum order
    can't flip an argmax), so engine and replica match label-for-label
    — including tie groups, which the hand fixtures avoid."""
    from linkgraph import label_propagation

    rng = np.random.default_rng(seed)
    n_nodes, n_edges = 18, 45
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    w = rng.integers(1, 5, n_edges).astype(float)
    rows = [(int(s), int(d), float(x)) for s, d, x in zip(src, dst, w) if s != d]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    for iters in (1, 3):
        want = _py_lpa(rows, iters, direction)
        for kwargs in ({}, {"hub_cap": 3}):
            res = label_propagation(
                edges, direction=direction, max_iter=iters, **kwargs
            )
            got = {r["id"]: r["label"] for r in res.labels.collect()}
            assert got == want, (iters, direction, kwargs)
