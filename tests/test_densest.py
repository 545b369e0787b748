"""Densest subgraph via parallel peeling (linkgraph/densest.py)."""

import random

from linkgraph.densest import densest_subgraph, densest_subgraph_sql


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _density(pairs, nodes):
    und = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    sub = [e for e in und if e[0] in nodes and e[1] in nodes]
    return len(sub) / len(nodes)


def test_finds_planted_clique_at_small_eps(spark):
    # K6 on 0..5 plus a pendant path 5-10-11-12-13-14
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    path = [(5, 10), (10, 11), (11, 12), (12, 13), (13, 14)]
    res = densest_subgraph(_edges(spark, clique + path), eps=0.1)
    got = {r.id for r in res.members.collect()}
    assert got == set(range(6))
    assert abs(res.density - 2.5) < 1e-12


def test_approximation_guarantee(spark):
    rng = random.Random(17)
    pairs = [(rng.randrange(20), rng.randrange(20)) for _ in range(60)]
    pairs = [(a, b) for a, b in pairs if a != b]
    # optimum is at least the best single round seen by exhaustive
    # Charikar peel (one node at a time) in python
    und = sorted({(min(a, b), max(a, b)) for a, b in pairs})
    nodes = {x for e in und for x in e}
    best_opt = 0.0
    cur = set(nodes)
    edges_left = list(und)
    while cur:
        best_opt = max(best_opt, len(edges_left) / len(cur))
        deg = {v: 0 for v in cur}
        for a, b in edges_left:
            deg[a] += 1
            deg[b] += 1
        victim = min(cur, key=lambda v: (deg[v], v))
        cur.discard(victim)
        edges_left = [e for e in edges_left if victim not in e]
    eps = 0.3
    res = densest_subgraph(_edges(spark, pairs), eps=eps)
    members = {r.id for r in res.members.collect()}
    got_density = _density(pairs, members)
    assert abs(got_density - res.density) < 1e-12
    assert got_density >= best_opt / (2 * (1 + eps)) - 1e-12


def test_duckdb_twin(spark):
    import duckdb

    rng = random.Random(23)
    pairs = [(rng.randrange(16), rng.randrange(16)) for _ in range(50)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges(spark, pairs)
    res = densest_subgraph(e, eps=0.5)
    assert res.rounds <= 16
    got = {r.id for r in res.members.collect()}
    con = duckdb.connect()
    con.register("dedges", e.toPandas())
    want = {
        r[0]
        for r in con.execute(
            densest_subgraph_sql("SELECT src, dst FROM dedges", eps=0.5, rounds=16)
        ).fetchall()
    }
    assert got == want
